"""Host-side row partitioning for the sharded engine.

The graph's rows (nodes) are split into G contiguous equal ranges (padded to
a common n_loc); each graph shard owns

  * the in-edges whose destination falls in its rows (push phase), with
    destination ids localized and source ids kept global — padded to a
    common m_loc across shards;
  * its slice of degrees / walk-index rows.

The walk CSR (out_indptr/out_indices) stays replicated in v1: walks
traverse arbitrary rows, and the replicated-CSR + lane-parallel design
keeps every hop local (SURVEY.md Sec. 2.3 — the row-sharded walk state
with per-hop all-to-all routing is the later scale-out variant).

All per-shard arrays are returned flat with a leading G*size axis so
``shard_map`` specs can be a plain P('graph').
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional

import numpy as np

from ..graph.csr import CSRGraph


class PartitionedGraph(NamedTuple):
    """Host-side numpy arrays, ready for device_put with a ('graph',) mesh
    axis on the leading dimension (flat: shard g owns slice [g*k, (g+1)*k))."""

    n_shards: int
    n_loc: int            # rows per shard (padded)
    m_loc: int            # in-edges per shard (padded)
    in_src_global: np.ndarray   # [G * m_loc] i32, pad -> n_pad (zero slot)
    in_dst_local: np.ndarray    # [G * m_loc] i32, pad -> n_loc (dropped seg)
    out_deg_sharded: np.ndarray  # [G * n_loc] i32 (pad rows: 0)
    # replicated walk-side arrays
    out_indptr: np.ndarray      # [n_pad + 1] i32 (pad rows: empty)
    out_indices: np.ndarray     # [m] i32
    out_deg: np.ndarray         # [n_pad] i32

    @property
    def n_pad(self) -> int:
        return self.n_shards * self.n_loc


def partition_rows(g: CSRGraph, n_shards: int,
                   row_multiple: int = 8) -> PartitionedGraph:
    n = g.n
    n_loc = math.ceil(n / n_shards)
    n_loc = -(-n_loc // row_multiple) * row_multiple
    n_pad = n_shards * n_loc

    in_dst = np.asarray(g.in_dst, dtype=np.int64)
    in_src = np.asarray(g.in_src, dtype=np.int64)
    shard_of_edge = in_dst // n_loc
    counts = np.bincount(shard_of_edge, minlength=n_shards)
    m_loc = int(counts.max()) if g.m else 1

    src_flat = np.full(n_shards * m_loc, n_pad, dtype=np.int32)  # pad: zero slot
    dst_flat = np.full(n_shards * m_loc, n_loc, dtype=np.int32)  # pad: dropped
    # in-edges are dst-sorted, so each shard's edges are contiguous
    edge_start = np.zeros(n_shards + 1, dtype=np.int64)
    np.cumsum(counts, out=edge_start[1:])
    for s in range(n_shards):
        lo, hi = edge_start[s], edge_start[s + 1]
        k = hi - lo
        src_flat[s * m_loc: s * m_loc + k] = in_src[lo:hi]
        dst_flat[s * m_loc: s * m_loc + k] = in_dst[lo:hi] - s * n_loc

    deg = np.zeros(n_pad, dtype=np.int32)
    deg[:n] = np.asarray(g.out_deg)
    indptr = np.zeros(n_pad + 1, dtype=np.int32)
    indptr[: n + 1] = np.asarray(g.out_indptr)
    indptr[n + 1:] = indptr[n]

    return PartitionedGraph(
        n_shards=n_shards, n_loc=n_loc, m_loc=m_loc,
        in_src_global=src_flat, in_dst_local=dst_flat,
        out_deg_sharded=deg.copy(),   # same values, consumed sharded
        out_indptr=indptr, out_indices=np.asarray(g.out_indices),
        out_deg=deg,
    )


class PartitionedIndex(NamedTuple):
    """FORA+ walk index rows sharded like the graph rows; offsets rebased
    per shard; endpoint pools padded to a common length."""

    e_loc: int
    endpoints: np.ndarray  # [G * e_loc] i32
    offsets: np.ndarray    # [G * n_loc] i32 (local into shard's pool)
    counts: np.ndarray     # [G * n_loc] i32


def partition_index(endpoints: np.ndarray, offsets: np.ndarray,
                    counts: np.ndarray, n_shards: int, n_loc: int
                    ) -> PartitionedIndex:
    endpoints = np.asarray(endpoints)
    offsets = np.asarray(offsets).astype(np.int64)
    counts = np.asarray(counts).astype(np.int64)
    n = offsets.shape[0]
    n_pad = n_shards * n_loc

    pool_sizes = []
    for s in range(n_shards):
        lo, hi = s * n_loc, min((s + 1) * n_loc, n)
        pool_sizes.append(int(counts[lo:hi].sum()) if hi > lo else 0)
    e_loc = max(max(pool_sizes), 1)

    e_flat = np.zeros(n_shards * e_loc, dtype=np.int32)
    o_flat = np.zeros(n_pad, dtype=np.int32)
    c_flat = np.zeros(n_pad, dtype=np.int32)
    for s in range(n_shards):
        lo, hi = s * n_loc, min((s + 1) * n_loc, n)
        if hi <= lo:
            continue
        base = int(offsets[lo])
        size = pool_sizes[s]
        e_flat[s * e_loc: s * e_loc + size] = endpoints[base: base + size]
        o_flat[s * n_loc: s * n_loc + (hi - lo)] = (offsets[lo:hi] - base)
        c_flat[s * n_loc: s * n_loc + (hi - lo)] = counts[lo:hi]
    return PartitionedIndex(e_loc=e_loc, endpoints=e_flat,
                            offsets=o_flat, counts=c_flat)
