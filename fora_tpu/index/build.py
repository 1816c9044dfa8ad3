"""FORA+ precomputed walk index: offline builder.

Reproduces the reference's ``build`` action [R: build.h — reconstruction,
SURVEY.md Sec. 3.3]: for every node v, pre-run K_v alpha-terminating walks
and store their endpoints in a flat array with per-node offsets, so the
query-time walk phase becomes table lookups.

Sizing contract (SURVEY.md Sec. 2.2): at push termination
r[v] <= rmax * out_deg[v], so a query at guarantee level delta demands at
most ceil(rmax * out_deg[v] * omega_unit) + 1 walks from v.  The index is
built for the smallest delta it must serve (default: the config's delta,
i.e. 1/n), which also covers every coarser top-k refinement level.

The builder is the query-time walk engine run offline in lane-chunks — the
same vectorized kernel, so index and on-the-fly walks have identical
statistics by construction.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ResolvedConfig
from ..graph.csr import DeviceGraph
from ..ops import walk as walk_ops


class WalkIndex(NamedTuple):
    """Flat endpoint pool. Node v's endpoints:
    ``endpoints[offsets[v] : offsets[v] + counts[v]]``."""

    endpoints: jnp.ndarray  # [total] i32
    offsets: jnp.ndarray    # [n] i32
    counts: jnp.ndarray     # [n] i32


def index_counts(out_deg: np.ndarray, rcfg: ResolvedConfig,
                 max_per_node: Optional[int] = None) -> np.ndarray:
    """K_v = ceil(rmax * deg_v * omega_unit) + 1 walks per node (0 for
    dangling nodes: their walks always end at themselves — served
    analytically at query time)."""
    deg = np.asarray(out_deg, dtype=np.float64)
    k = np.ceil(rcfg.rmax * deg * rcfg.omega_unit).astype(np.int64) + 1
    k[deg == 0] = 0
    if max_per_node is not None:
        k = np.minimum(k, max_per_node)
    return k


def build_walk_index(graph: DeviceGraph, rcfg: ResolvedConfig,
                     key: jax.Array, *, max_per_node: Optional[int] = None,
                     chunk: int = 1 << 22) -> WalkIndex:
    """Run all index walks in lane-chunks of ``chunk`` on device."""
    n = graph.n
    counts = index_counts(np.asarray(graph.out_deg), rcfg, max_per_node)
    offsets = np.zeros(n, dtype=np.int64)
    np.cumsum(counts[:-1], out=offsets[1:])
    total = int(counts.sum())
    if total >= 2**31:
        raise ValueError(
            f"walk index ({total} endpoints) exceeds int32 range; shard the "
            "graph rows first (fora_tpu.parallel) or cap max_per_node")

    starts = np.repeat(np.arange(n, dtype=np.int32), counts)
    endpoints = np.empty(total, dtype=np.int32)

    run = jax.jit(
        lambda s, k: walk_ops.run_walks(
            graph, s[:, None], k, alpha=rcfg.alpha,
            max_hops=rcfg.max_walk_hops)[:, 0],
        donate_argnums=(0,))
    n_chunks = max(1, math.ceil(total / chunk))
    for i in range(n_chunks):
        lo, hi = i * chunk, min((i + 1) * chunk, total)
        pad = chunk - (hi - lo)
        s = np.pad(starts[lo:hi], (0, pad))
        out = np.asarray(run(jnp.asarray(s), jax.random.fold_in(key, i)))
        endpoints[lo:hi] = out[: hi - lo]

    return WalkIndex(endpoints=jnp.asarray(endpoints),
                     offsets=jnp.asarray(offsets.astype(np.int32)),
                     counts=jnp.asarray(counts.astype(np.int32)))


def index_nbytes(counts: np.ndarray) -> int:
    return int(counts.sum()) * 4 + counts.size * 8
