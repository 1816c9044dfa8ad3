"""Sharded FORA pipeline: shard_map over the ('graph', 'query') mesh.

Parallel decomposition (SURVEY.md Sec. 2.3):

  * 'query' axis — data parallelism over batched sources (embarrassingly
    parallel; replaces the reference's sequential batch loop).
  * 'graph' axis — rows (nodes) sharded; the push superstep is a local
    gather + segment_sum over the shard's in-edges, preceded by an
    all_gather of the per-row contribution vector over ICI (the frontier
    exchange).  Walk lanes run shard-local from the shard's own residues
    (so FORA+ index lookups never leave the shard — the Ulysses/EP-style
    locality trick), and endpoint mass is combined with one
    psum_scatter back to row owners.
  * top-k — per-shard top-k of owned rows, then an all_gather of k
    candidates per shard and a final top-k of G*k (k is small).

Collectives used: all_gather / psum_scatter / psum over 'graph' — all XLA
collectives riding ICI; nothing crosses 'query'.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ResolvedConfig
from ..graph.csr import CSRGraph, DeviceGraph
from ..ops import walk as walk_ops
from . import partition as part
from .mesh import GRAPH_AXIS, QUERY_AXIS, shard_map

P = jax.sharding.PartitionSpec


class ShardedTopkResult(NamedTuple):
    values: jnp.ndarray    # [B, k] f32, descending
    node_ids: jnp.ndarray  # [B, k] i32, global ids
    push_iters: jnp.ndarray  # [] i32
    walk_overflow: jnp.ndarray  # [B] bool


def _shard_fora_topk(
    # dynamic args (order matters; see in_specs in make_sharded_topk_fn)
    sources,          # [Bq] i32, sharded over 'query'
    key,              # key, replicated
    in_src,           # [m_loc] i32 (global, padded-src=0)
    in_dst,           # [m_loc] i32 (local, pad=n_loc)
    deg_loc,          # [n_loc] i32
    out_indptr,       # [n_pad+1] i32 replicated
    out_indices,      # [m] i32 replicated
    out_deg,          # [n_pad] i32 replicated
    idx_edge_src,     # [e_loc_total] i32 local src, pad=n_loc (or dummy)
    idx_edge_dst,     # [e_loc_total] i32 global dst, pad=n_pad (or dummy)
    idx_counts_cum,   # [n_loc, Q] i32 (or dummy)
    idx_edge_mult,    # [e_loc_total] f32 duplicate-merge multiplicity,
    #                   pad=0 (or dummy; see index/build.py)
    *, rcfg: ResolvedConfig, n_loc: int, num_lanes_loc: int, k: int,
    use_index: bool, index_has_mult: bool = False, index_depth: int = 0,
    index_bucket_offsets=None, pallas_ring: bool = False,
    pallas_interpret: bool = False, n_graph_shards: int = 1,
    ragged_cap: int = 0,
):
    from ..ops import ring as ring_ops

    def frontier_all_gather(v):
        if pallas_ring:
            return ring_ops.ring_all_gather(v, GRAPH_AXIS, n_graph_shards,
                                            interpret=pallas_interpret)
        return jax.lax.all_gather(v, GRAPH_AXIS, axis=0, tiled=True)

    def mass_reduce_scatter(v):
        if pallas_ring:
            return ring_ops.ring_reduce_scatter(v, GRAPH_AXIS, n_graph_shards,
                                                interpret=pallas_interpret)
        return jax.lax.psum_scatter(v, GRAPH_AXIS, scatter_dimension=0,
                                    tiled=True)
    g_id = jax.lax.axis_index(GRAPH_AXIS)
    Bq = sources.shape[0]
    row0 = g_id * n_loc

    deg_f = deg_loc.astype(jnp.float32)[:, None]              # [n_loc, 1]
    dangling = deg_f == 0.0
    rmax, alpha = rcfg.rmax, rcfg.alpha
    if use_index:
        # per-node coverage threshold (see ops/push.py forward_push_from):
        # the index supplies counts_cum[:, depth] samples per owned row, so
        # push may stop at r_v <= count_v/omega_unit — never tighter than
        # rmax*deg_v, looser on the low-degree tail.
        thr = (idx_counts_cum[:, index_depth].astype(jnp.float32)
               / jnp.float32(rcfg.omega_unit))[:, None]
    else:
        thr = rmax * deg_f

    # --- init: one-hot residue on the owning shard ---
    local = sources - row0
    own = jnp.logical_and(local >= 0, local < n_loc)
    r0 = jnp.zeros((n_loc, Bq), jnp.float32).at[
        jnp.where(own, local, 0), jnp.arange(Bq)].add(
        jnp.where(own, 1.0, 0.0))
    p0 = jnp.zeros((n_loc, Bq), jnp.float32)

    def frontier_count(r):
        return jax.lax.psum(jnp.sum((r > thr).astype(jnp.int32)),
                            GRAPH_AXIS)

    def cond(st):
        p, r, it, flag = st
        return jnp.logical_and(it < rcfg.max_push_iters, flag > 0)

    n_pad_g = n_loc * n_graph_shards

    def ragged_frontier_exchange(contrib):
        """SURVEY Sec. 2.3 EP-style residual routing, fixed-capacity form
        (Sec. 7.3: "ragged_all_to_all or fixed-capacity buckets").

        Once the frontier decays, most rows contribute nothing; instead of
        all-gathering the dense [n_loc, Bq] block, compact the <= cap
        active rows to (global id, value-row) pairs, exchange only those,
        and scatter into the full buffer.  Comm bytes drop from
        n_pad * Bq to G * cap * Bq.  Supersteps whose global per-shard
        frontier exceeds cap fall back to the dense exchange; the branch
        is chosen by a pmax so every shard takes the same collective.
        """
        row_active = jnp.any(contrib != 0.0, axis=1)           # [n_loc]
        cnt = jnp.sum(row_active.astype(jnp.int32))
        cnt_max = jax.lax.pmax(cnt, GRAPH_AXIS)

        def ragged(c):
            idx = jnp.nonzero(row_active, size=ragged_cap,
                              fill_value=n_loc)[0]              # [cap]
            c_pad = jnp.concatenate(
                [c, jnp.zeros((1, c.shape[1]), c.dtype)], axis=0)
            vals = c_pad[idx]                                   # [cap, Bq]
            gids = jnp.where(idx < n_loc, idx + row0, n_pad_g)  # pad slot
            all_ids = jax.lax.all_gather(gids, GRAPH_AXIS, axis=0,
                                         tiled=True)            # [G*cap]
            all_vals = jax.lax.all_gather(vals, GRAPH_AXIS, axis=0,
                                          tiled=True)           # [G*cap, Bq]
            full = jnp.zeros((n_pad_g + 1, c.shape[1]), c.dtype)
            full = full.at[all_ids].add(all_vals,
                                        indices_are_sorted=False,
                                        unique_indices=False)
            return full[:n_pad_g]

        return jax.lax.cond(cnt_max <= ragged_cap, ragged,
                            frontier_all_gather, contrib)

    def body(st):
        p, r, it, _ = st
        active = r > thr
        ar = jnp.where(active, r, 0.0)
        p = p + jnp.where(dangling, ar, alpha * ar)
        contrib = jnp.where(dangling, 0.0,
                            (1.0 - alpha) * ar / jnp.maximum(deg_f, 1.0))
        # frontier exchange: every shard needs contributions of all rows
        if ragged_cap > 0:
            contrib_full = ragged_frontier_exchange(contrib)   # [n_pad, Bq]
        else:
            contrib_full = frontier_all_gather(contrib)        # [n_pad, Bq]
        vals = contrib_full[in_src]                            # [m_loc, Bq]
        delta = jax.ops.segment_sum(vals, in_dst, num_segments=n_loc + 1,
                                    indices_are_sorted=True)[:n_loc]
        r = jnp.where(active, 0.0, r) + delta
        return (p, r, it + 1, frontier_count(r))

    p, r, iters, _ = jax.lax.while_loop(
        cond, body, (p0, r0, jnp.zeros((), jnp.int32), frontier_count(r0)))

    # --- walk phase: shard-local residues feed either the local slice of
    # the multi-resolution index (SpMV over index edges, endpoint mass
    # psum_scattered to row owners) or shard-local raw walk lanes ---
    n_pad = out_deg.shape[0]
    overflow = jnp.zeros((Bq,), bool)
    if use_index:
        from ..index.build import NUM_BUCKETS
        inv_cnt = 1.0 / jnp.maximum(
            idx_counts_cum[:, index_depth], 1).astype(jnp.float32)
        rw = r * inv_cnt[:, None]                           # [n_loc, Bq]
        rw_pad = jnp.concatenate([rw, jnp.zeros((1, Bq), rw.dtype)], axis=0)
        contrib_all = jnp.zeros((n_pad + 1, Bq), jnp.float32)
        for q in range(index_depth, NUM_BUCKETS):
            lo = int(index_bucket_offsets[q])
            hi = int(index_bucket_offsets[q + 1])
            if hi == lo:
                continue
            vals = rw_pad[idx_edge_src[lo:hi]]              # [E_q, Bq]
            if index_has_mult:
                vals = vals * idx_edge_mult[lo:hi][:, None]
            contrib_all = contrib_all + jax.ops.segment_sum(
                vals, idx_edge_dst[lo:hi], num_segments=n_pad + 1,
                indices_are_sorted=True)
        contrib_all = contrib_all[:n_pad]
    else:
        alloc = walk_ops.allocate_walks(r, rcfg.omega_unit, num_lanes_loc)
        walk_graph = DeviceGraph(out_indptr=out_indptr,
                                 out_indices=out_indices,
                                 in_src=in_src, in_dst=in_dst,  # unused
                                 out_deg=out_deg)
        endpoints = walk_ops.run_walks(
            walk_graph, alloc.start + row0,
            jax.random.fold_in(key, g_id), alpha=alpha,
            max_hops=rcfg.max_walk_hops)
        contrib_all = walk_ops.accumulate_endpoints(endpoints, alloc.weight,
                                                    n_pad)  # [n_pad, Bq]
        overflow = alloc.overflow

    walk_loc = mass_reduce_scatter(contrib_all)
    ppr_loc = p + walk_loc                                    # [n_loc, Bq]

    # --- top-k merge: k local candidates -> all_gather -> global top-k ---
    lvals, lids = jax.lax.top_k(ppr_loc.T, k)                 # [Bq, k]
    gids = lids + row0
    cand_v = jax.lax.all_gather(lvals, GRAPH_AXIS, axis=1, tiled=True)
    cand_i = jax.lax.all_gather(gids, GRAPH_AXIS, axis=1, tiled=True)
    fvals, sel = jax.lax.top_k(cand_v, k)
    fids = jnp.take_along_axis(cand_i, sel, axis=1)

    overflow = jax.lax.psum(overflow.astype(jnp.int32), GRAPH_AXIS) > 0
    return fvals, fids, iters, overflow


class ShardedForaEngine:
    """Holds device-placed sharded graph (+ index) and the jitted topk fn.

    ``batch`` is the global batch; it must divide evenly by the mesh's
    'query' axis.
    """

    def __init__(self, g: CSRGraph, mesh: jax.sharding.Mesh,
                 rcfg: ResolvedConfig, *, k: Optional[int] = None,
                 index=None, num_lanes: Optional[int] = None,
                 max_lanes: int = 1 << 23, lane_slack: float = 2.0,
                 pallas_ring: bool = False, pallas_interpret: bool = False,
                 ragged_exchange: bool = False,
                 ragged_capacity_frac: float = 0.125):
        if ragged_exchange and pallas_ring:
            raise ValueError("ragged_exchange uses XLA all_gather; "
                             "not combinable with pallas_ring")
        self.mesh = mesh
        self.rcfg = rcfg
        self.k = k if k is not None else rcfg.k
        G = mesh.shape[GRAPH_AXIS]
        pg = part.partition_rows(g, G)
        self.pg = pg

        if num_lanes is None:
            num_lanes = walk_ops.walk_lane_budget(
                rcfg.omega_unit, rcfg.rmax, rcfg.m, rcfg.n, cap=max_lanes)
        # per-shard lanes: balanced share plus slack for row skew
        self.num_lanes_loc = max(
            1024, int(num_lanes * lane_slack / G) // 1024 * 1024)

        def put(x, spec):
            return jax.device_put(x, jax.sharding.NamedSharding(mesh, spec))

        gspec, rep = P(GRAPH_AXIS), P()
        self._args = [
            put(pg.in_src_global, gspec), put(pg.in_dst_local, gspec),
            put(pg.out_deg_sharded, gspec),
            put(pg.out_indptr, rep), put(pg.out_indices, rep),
            put(pg.out_deg, rep),
        ]
        self.use_index = index is not None
        index_depth = 0
        bucket_offsets = None
        index_has_mult = False
        if self.use_index:
            pi = part.partition_index(index, G, pg.n_loc)
            index_depth = index.depth_for(rcfg.omega_unit, rcfg.rmax)
            bucket_offsets = pi.bucket_local_offsets
            index_has_mult = pi.edge_mult is not None
            self._args += [put(pi.edge_src_local, gspec),
                           put(pi.edge_dst, gspec),
                           put(pi.counts_cum, gspec),
                           put(pi.edge_mult if index_has_mult
                               else np.zeros(G, dtype=np.float32), gspec)]
        else:
            dummy = np.zeros(G, dtype=np.int32)
            self._args += [put(dummy, gspec)] * 2 + [
                put(np.zeros((G, 1), dtype=np.int32), gspec),
                put(np.zeros(G, dtype=np.float32), gspec)]

        fn = functools.partial(
            _shard_fora_topk, rcfg=rcfg, n_loc=pg.n_loc,
            num_lanes_loc=self.num_lanes_loc, k=self.k,
            use_index=self.use_index, index_has_mult=index_has_mult,
            index_depth=index_depth,
            index_bucket_offsets=bucket_offsets, pallas_ring=pallas_ring,
            pallas_interpret=pallas_interpret, n_graph_shards=G,
            ragged_cap=(max(64, int(pg.n_loc * ragged_capacity_frac)
                            // 8 * 8) if ragged_exchange else 0))
        mapped = shard_map(
            fn, mesh,
            in_specs=(P(QUERY_AXIS), P(), gspec, gspec, gspec,
                      rep, rep, rep, gspec, gspec, gspec, gspec),
            out_specs=(P(QUERY_AXIS), P(QUERY_AXIS), P(), P(QUERY_AXIS)))
        self._jitted = jax.jit(mapped)
        self._src_sharding = jax.sharding.NamedSharding(mesh, P(QUERY_AXIS))

    def topk(self, sources, key) -> ShardedTopkResult:
        sources = jax.device_put(jnp.asarray(sources, jnp.int32),
                                 self._src_sharding)
        v, i, it, ov = self._jitted(sources, key, *self._args)
        return ShardedTopkResult(values=v, node_ids=i, push_iters=it,
                                 walk_overflow=ov)
