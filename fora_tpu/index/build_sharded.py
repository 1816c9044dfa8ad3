"""FORA+ index build with the out-CSR row-sharded over the mesh.

Breaks the replicated-CSR memory wall (SURVEY.md Sec. 5.7): the
single-device builder (build.py) holds the full out-CSR in one device's
HBM, which caps graph size at Twitter/Friendster scale.  Here each 'graph'
shard holds only ITS rows' CSR slice (~m/G edges), and the lockstep walk
advances cross-shard with ONE psum per hop:

  * lane state (current node per walk lane) is replicated — it is tiny
    (4 B/lane) next to the CSR it replaces;
  * the RNG is counter-based (threefry keyed per (chunk, hop)), so every
    shard generates the IDENTICAL uniform stream for all lanes and the
    geometric lengths — no RNG state is exchanged;
  * each hop, the shard that owns a lane's current row samples its next
    node from the local CSR slice; non-owners contribute 0 and a psum
    combines (each lane has exactly one owner) — the EP-style "route the
    lane to the data" pattern with the routing collapsed into one
    collective, no capacity bounds, no skew failure mode (a hub shard
    computes more gathers but the wire volume is the fixed [W] psum);
  * the uniform stream, hop order, and update rule mirror
    ops/walk.run_walks exactly, so endpoints — and therefore the packed
    index — are BIT-IDENTICAL to the single-device build.

Weighted graphs ride along: each shard holds its slice of the alias
tables (aligned with its CSR slice) and the alias acceptance stream is
generated identically everywhere.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ResolvedConfig
from ..graph.csr import CSRGraph
from ..ops import walk as walk_ops
from ..parallel.mesh import GRAPH_AXIS, shard_map
from . import build as ib

P = jax.sharding.PartitionSpec


def _shard_csr(g: CSRGraph, n_shards: int, row_multiple: int = 8):
    """Row-shard the out-CSR: per shard, a localized indptr slice and its
    contiguous out_indices (+ alias) slice, padded to common shapes."""
    n = g.n
    n_loc = -(-math.ceil(n / n_shards) // row_multiple) * row_multiple
    indptr = np.asarray(g.out_indptr, dtype=np.int64)
    bounds = [indptr[min(s * n_loc, n)] for s in range(n_shards + 1)]
    m_loc = max(1, max(int(bounds[s + 1] - bounds[s])
                       for s in range(n_shards)))

    indptr_loc = np.zeros((n_shards, n_loc + 1), dtype=np.int32)
    indices_loc = np.zeros((n_shards, m_loc), dtype=np.int32)
    deg_loc = np.zeros((n_shards, n_loc), dtype=np.int32)
    ap_loc = (np.ones((n_shards, m_loc), dtype=np.float32)
              if g.weighted else None)
    ao_loc = (np.zeros((n_shards, m_loc), dtype=np.int32)
              if g.weighted else None)
    if g.weighted:
        from ..graph.alias import build_alias
        alias = build_alias(g, weights=g.out_w)
    for s in range(n_shards):
        row0, row1 = s * n_loc, min((s + 1) * n_loc, n)
        lo, hi = int(bounds[s]), int(bounds[s + 1])
        if row1 > row0:
            sl = indptr[row0: row1 + 1] - lo
            indptr_loc[s, : row1 - row0 + 1] = sl
            indptr_loc[s, row1 - row0 + 1:] = sl[-1]
            deg_loc[s, : row1 - row0] = np.asarray(
                g.out_deg[row0:row1])
        indices_loc[s, : hi - lo] = np.asarray(g.out_indices[lo:hi])
        if g.weighted:
            ap_loc[s, : hi - lo] = alias.prob[lo:hi]
            ao_loc[s, : hi - lo] = alias.other[lo:hi]
    return n_loc, indptr_loc, indices_loc, deg_loc, ap_loc, ao_loc


def _sharded_walk_kernel(starts, key, indptr_loc, indices_loc, deg_loc,
                         alias_p, alias_o, *, alpha, max_hops, n_loc,
                         use_alias):
    """One shard's view of the length-SCHEDULED lockstep walk; mirrors
    run_walks_scheduled draw-for-draw (bit-identical endpoint stream
    for equal key/chunk — the builder-equality contract).  Returns
    (endpoints, ok)."""
    return walk_ops.sharded_lockstep_walk_scheduled(
        starts, key, indptr_loc, indices_loc, deg_loc, alias_p, alias_o,
        alpha=alpha, max_hops=max_hops, n_loc=n_loc, use_alias=use_alias,
        axis_name=GRAPH_AXIS)


def _sharded_walk_kernel_plain(starts, key, indptr_loc, indices_loc,
                               deg_loc, alias_p, alias_o, *, alpha,
                               max_hops, n_loc, use_alias):
    """Plain full-width fallback (width-bound overflow; run_walks twin)."""
    s = starts.reshape(-1, 128)          # run_walks lane layout
    return walk_ops.sharded_lockstep_walk(
        s, key, indptr_loc, indices_loc, deg_loc, alias_p, alias_o,
        alpha=alpha, max_hops=max_hops, n_loc=n_loc, use_alias=use_alias,
        axis_name=GRAPH_AXIS).reshape(-1)


def build_walk_index_sharded(g: CSRGraph, mesh: jax.sharding.Mesh,
                             rcfg: ResolvedConfig, key: jax.Array, *,
                             max_per_node: Optional[int] = None,
                             chunk: int = 1 << 21,
                             checkpoint_dir: Optional[str] = None
                             ) -> ib.WalkIndex:
    """build_walk_index with the out-CSR sharded over mesh's 'graph' axis.

    Output is bit-identical to the single-device builder for the same
    (graph, rcfg, key, chunk) — tested — so indexes are interchangeable
    and the crash-resume checkpoints share the same manifest format.
    """
    G = mesh.shape[GRAPH_AXIS]
    n = g.n
    deg = np.asarray(g.out_deg)
    counts = ib.index_counts(deg, rcfg, max_per_node)
    total = int(counts.sum())
    if total + n >= 2**31:
        raise ValueError("walk index exceeds int32 range; cap max_per_node")

    n_loc, indptr_loc, indices_loc, deg_loc, ap, ao = _shard_csr(g, G)
    gspec = jax.sharding.NamedSharding(mesh, P(GRAPH_AXIS))

    def put(x):
        return jax.device_put(x.reshape(G * x.shape[1], *x.shape[2:]),
                              gspec)

    args = [put(indptr_loc), put(indices_loc), put(deg_loc)]
    use_alias = ap is not None
    args += [put(ap), put(ao)] if use_alias else [
        jax.device_put(np.zeros(G, np.float32), gspec),
        jax.device_put(np.zeros(G, np.int32), gspec)]

    kern = functools.partial(_sharded_walk_kernel, alpha=rcfg.alpha,
                             max_hops=rcfg.max_walk_hops, n_loc=n_loc,
                             use_alias=use_alias)
    kern_plain = functools.partial(_sharded_walk_kernel_plain,
                                   alpha=rcfg.alpha,
                                   max_hops=rcfg.max_walk_hops, n_loc=n_loc,
                                   use_alias=use_alias)
    gs = P(GRAPH_AXIS)
    specs = (P(), P(), gs, gs, gs, gs, gs)
    jitted = jax.jit(shard_map(kern, mesh, in_specs=specs,
                               out_specs=(P(), P())))
    jitted_plain = jax.jit(shard_map(kern_plain, mesh, in_specs=specs,
                                     out_specs=P()))

    def run(s_chunk, chunk_key):
        return jitted(s_chunk, chunk_key, *args)

    def run_plain(s_chunk, chunk_key):
        return jitted_plain(s_chunk, chunk_key, *args)

    from .store import graph_fingerprint
    endpoints = ib.run_walk_chunks(
        run, counts, total, key, chunk=chunk,
        checkpoint_dir=checkpoint_dir, run_fallback=run_plain,
        # same manifest (incl. kernel id) as the single-device builder:
        # checkpoints are interchangeable across builders
        fingerprint={"alpha": rcfg.alpha, "max_hops": rcfg.max_walk_hops,
                     "kernel": "scheduled-v1",
                     "graph_sha": graph_fingerprint(g)})
    return ib.pack_index(endpoints, counts, deg, rcfg)


def sharded_build_bytes(g: CSRGraph, n_shards: int) -> dict:
    """Per-shard device bytes of the sharded build vs the replicated one —
    the memory-wall arithmetic (SURVEY.md Sec. 5.7)."""
    n_loc, indptr_loc, indices_loc, deg_loc, ap, ao = _shard_csr(g, n_shards)
    per_shard = (indptr_loc.nbytes + indices_loc.nbytes + deg_loc.nbytes)
    if ap is not None:
        per_shard += ap.nbytes + ao.nbytes
    per_shard //= n_shards
    full = (g.out_indptr.nbytes + g.out_indices.nbytes + g.out_deg.nbytes)
    if g.weighted:
        full += 2 * g.out_indices.nbytes
    return {"per_shard_bytes": per_shard, "replicated_bytes": full,
            "ratio": per_shard / max(full, 1)}
