"""Graph substrate: CSR / ELL packing and the on-device graph pytree.

The reference keeps the graph as ``vector<vector<int>>`` adjacency lists
[R: graph.h — reconstruction, SURVEY.md Sec. 2.1].  The TPU-native layout is
flat, static-shaped arrays:

  * out-CSR  (``out_indptr``, ``out_indices``)  — walk-phase neighbor sampling
  * in-edge list sorted by destination (``in_src``, ``in_dst``) — push phase
    as a gather + sorted ``segment_sum`` (a dense masked SpMV superstep)
  * degrees — the push threshold is ``r[v] > rmax * out_deg[v]``

All index arrays are int32 (graphs up to 2^31 edges per shard); values f32.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import numpy as np

try:  # jax is optional at build time (the CSR packer is pure numpy)
    import jax.numpy as jnp
except Exception:  # pragma: no cover
    jnp = None


class CSRGraph(NamedTuple):
    """Host-side (numpy) packed graph. Static shapes; device copy via to_device().

    ``n`` and ``m`` are derivable from array shapes, so the device pytree
    carries no static metadata.
    """

    out_indptr: np.ndarray   # [n+1] int32, CSR row pointers over out-edges
    out_indices: np.ndarray  # [m]   int32, destination of each out-edge (sorted by src)
    in_src: np.ndarray       # [m]   int32, source of each in-edge (sorted by dst)
    in_dst: np.ndarray       # [m]   int32, destination of each in-edge (ascending)
    out_deg: np.ndarray      # [n]   int32
    in_deg: np.ndarray       # [n]   int32

    @property
    def n(self) -> int:
        return int(self.out_indptr.shape[0] - 1)

    @property
    def m(self) -> int:
        return int(self.out_indices.shape[0])


class DeviceGraph(NamedTuple):
    """Device-side graph pytree (all jnp arrays; no static fields).

    ``in_w`` (optional, [m_u] f32): duplicate-edge multiplicities.  When set,
    ``in_src``/``in_dst`` hold the UNIQUE (src, dst) pairs and each push
    superstep multiplies the gathered contribution by ``in_w`` — the same
    lossless duplicate-merge the FORA+ index uses (multigraph semantics are
    preserved exactly; out-CSR/degrees keep full multiplicity for walks).
    Shrinks the hot random row-gather by the graph's parallel-edge fraction.
    """

    out_indptr: "jnp.ndarray"   # [n+1] i32
    out_indices: "jnp.ndarray"  # [m] i32
    in_src: "jnp.ndarray"       # [m or m_u] i32
    in_dst: "jnp.ndarray"       # [m or m_u] i32
    out_deg: "jnp.ndarray"      # [n] i32
    in_w: "jnp.ndarray" = None  # [m_u] f32 multiplicity, or None

    @property
    def n(self) -> int:
        return self.out_indptr.shape[0] - 1

    @property
    def m(self) -> int:
        return self.out_indices.shape[0]


def from_edges(src: np.ndarray, dst: np.ndarray, n: int,
               dedup: bool = False) -> CSRGraph:
    """Pack an edge list into CSR + dst-sorted in-edge form.

    Self-loops and parallel edges are kept (the reference treats graph.txt
    verbatim); set ``dedup`` to drop exact duplicate edges.
    """
    src = np.asarray(src, dtype=np.int64)
    dst = np.asarray(dst, dtype=np.int64)
    if src.shape != dst.shape:
        raise ValueError("src/dst shape mismatch")
    if src.size and (src.min() < 0 or src.max() >= n or dst.min() < 0 or dst.max() >= n):
        raise ValueError("edge endpoint out of range")
    if dedup and src.size:
        key = src * n + dst
        _, keep = np.unique(key, return_index=True)
        src, dst = src[keep], dst[keep]

    m = src.size
    # sort by src for out-CSR
    order = np.argsort(src, kind="stable")
    s_src, s_dst = src[order], dst[order]
    out_deg = np.bincount(s_src, minlength=n).astype(np.int64)
    out_indptr = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(out_deg, out=out_indptr[1:])
    # sort by dst for the push-phase segment_sum
    order_in = np.argsort(dst, kind="stable")
    in_src, in_dst = src[order_in], dst[order_in]
    in_deg = np.bincount(dst, minlength=n).astype(np.int64)

    if m >= 2**31:
        raise ValueError("graph shard exceeds int32 index range; shard first")
    return CSRGraph(
        out_indptr=out_indptr.astype(np.int32),
        out_indices=s_dst.astype(np.int32),
        in_src=in_src.astype(np.int32),
        in_dst=in_dst.astype(np.int32),
        out_deg=out_deg.astype(np.int32),
        in_deg=in_deg.astype(np.int32),
    )


def to_device(g: CSRGraph, merge_duplicate_edges: bool = False) -> DeviceGraph:
    """Copy to device.  ``merge_duplicate_edges`` collapses parallel in-edges
    into unique (src, dst) pairs with an ``in_w`` multiplicity column (see
    DeviceGraph) — only worthwhile for multigraphs (e.g. raw RMAT output);
    simple graphs get ``in_w=None`` and the unmodified edge list."""
    in_src, in_dst, in_w = g.in_src, g.in_dst, None
    if merge_duplicate_edges and g.m:
        # in-edges are dst-sorted; a stable (dst, src) sort keeps dst order,
        # so the merged list still satisfies sorted-segment_sum's contract
        key = g.in_dst.astype(np.int64) * g.n + g.in_src
        order = np.argsort(key, kind="stable")
        ks = key[order]
        first = np.ones(ks.size, bool)
        first[1:] = ks[1:] != ks[:-1]
        if not first.all():
            starts = np.nonzero(first)[0]
            counts = np.diff(np.append(starts, ks.size))
            in_src = g.in_src[order][starts]
            in_dst = g.in_dst[order][starts]
            in_w = counts.astype(np.float32)
    return DeviceGraph(
        out_indptr=jnp.asarray(g.out_indptr),
        out_indices=jnp.asarray(g.out_indices),
        in_src=jnp.asarray(in_src),
        in_dst=jnp.asarray(in_dst),
        out_deg=jnp.asarray(g.out_deg),
        in_w=None if in_w is None else jnp.asarray(in_w),
    )


# ---------------------------------------------------------------------------
# ELL packing (for the Pallas push kernel): pad rows of the *in*-adjacency to
# a fixed width; hub rows (in_deg > width) are split into multiple ELL rows
# that all accumulate into the same destination node.
# ---------------------------------------------------------------------------

class ELLGraph(NamedTuple):
    """Padded in-adjacency. Row i of ``cols`` holds up to W in-neighbors of
    node ``row_node[i]``; padding slots hold sentinel ``n`` (callers gather
    from a contrib array padded with one trailing zero)."""

    cols: np.ndarray      # [rows, W] int32, in-neighbor (src) ids, pad = n
    row_node: np.ndarray  # [rows]    int32, destination node of this ELL row
    n: int
    width: int

    @property
    def rows(self) -> int:
        return int(self.cols.shape[0])


def pack_ell(g: CSRGraph, width: int = 128, row_multiple: int = 8) -> ELLGraph:
    """Pack the dst-sorted in-edge list into split-row ELL blocks.

    Hub destinations with in_deg > width become ceil(in_deg/width) rows. The
    total row count is padded to ``row_multiple`` (TPU sublane alignment);
    padding rows point at node n-1 with zero valid columns (harmless: they
    accumulate zeros).
    """
    n = g.n
    in_deg = g.in_deg.astype(np.int64)
    rows_per_node = np.maximum(1, -(-in_deg // width))  # ceil, min 1 row
    total_rows = int(rows_per_node.sum())
    padded_rows = -(-total_rows // row_multiple) * row_multiple

    cols = np.full((padded_rows, width), n, dtype=np.int32)
    row_node = np.full(padded_rows, max(n - 1, 0), dtype=np.int32)

    row_start = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(rows_per_node, out=row_start[1:])
    # in-edges are sorted by dst: node v's in-neighbors are
    # in_src[in_indptr[v]:in_indptr[v+1]]
    in_indptr = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(in_deg, out=in_indptr[1:])

    # vectorized fill: for each edge e (dst-sorted), its position within its
    # dst's run is e - in_indptr[dst[e]]; row = row_start[dst] + pos // width,
    # col = pos % width.
    if g.m:
        dst = g.in_dst.astype(np.int64)
        pos = np.arange(g.m, dtype=np.int64) - in_indptr[dst]
        r = row_start[dst] + pos // width
        c = pos % width
        cols[r, c] = g.in_src
    node_ids = np.repeat(np.arange(n, dtype=np.int32), rows_per_node)
    row_node[: total_rows] = node_ids
    return ELLGraph(cols=cols, row_node=row_node, n=n, width=width)


def ell_padding_waste(e: ELLGraph, m: int) -> float:
    """Fraction of ELL slots that are padding (SURVEY 7.3: cap ~2x blowup)."""
    slots = e.cols.size
    return 1.0 - (m / slots) if slots else 0.0
