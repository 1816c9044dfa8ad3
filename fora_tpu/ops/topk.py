"""On-device top-k selection.

Replaces the reference's host-side indexed binary heap [R: heap.h —
reconstruction, SURVEY.md Sec. 2.1 native-code checklist item 5] with
``jax.lax.top_k``; the sharded variant (fora_tpu/parallel) merges per-shard
candidates with one all_gather of 2k entries per shard.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def topk_nodes(ppr: jnp.ndarray, k: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """ppr: [n, B] node-major -> (values [B, k] desc, node ids [B, k])."""
    vals, idx = topk_rows_chunked(ppr, k)
    return vals, idx


def local_topk_candidates(ppr_shard: jnp.ndarray, k: int, row_offset: jnp.ndarray
                          ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-shard candidates with globalized node ids (for the sharded merge)."""
    vals, idx = jax.lax.top_k(ppr_shard.T, k)
    return vals, idx + row_offset


def topk_rows_chunked(ppr: jnp.ndarray, k: int, *extra,
                      chunk: int = 1 << 19):
    """Node-chunked top-k over a node-major [n, B] estimate.

    ``lax.top_k(ppr.T, k)`` materializes the full [B, n] transpose plus
    key/value sort buffers — at LiveJournal scale (n=4.2M, B=128) that is
    ~2 GB per copy, which blows the refinement loop's HBM budget (measured
    runtime OOM on v5e).  Instead: statically unrolled top-k per
    ``chunk``-row slab (the same candidates-then-merge pattern as the
    sharded engine's per-shard top-k), so peak extra memory is one
    [B, chunk] transpose.

    ``extra``: additional [n, B] arrays gathered at the winning rows
    (e.g. the settled push mass p for the confidence bounds) — gathered
    per slab, so their [B, n] transposes are never built either.

    Returns (vals [B, k] desc, global row ids [B, k], *extra_at [B, k]).
    """
    n = ppr.shape[0]
    if n <= chunk:
        vals, idx = jax.lax.top_k(ppr.T, min(k, n))
        outs = [jnp.take_along_axis(e.T, idx, axis=1) for e in extra]
        return (vals, idx, *outs)
    kk = min(k, chunk)
    cand_v, cand_i, cand_e = [], [], [[] for _ in extra]
    for lo in range(0, n, chunk):
        hi = min(lo + chunk, n)
        v, i = jax.lax.top_k(ppr[lo:hi].T, min(kk, hi - lo))
        cand_v.append(v)
        cand_i.append(i + lo)
        for j, e in enumerate(extra):
            cand_e[j].append(jnp.take_along_axis(e[lo:hi].T, i, axis=1))
    cv = jnp.concatenate(cand_v, axis=1)          # [B, n_slabs * kk]
    ci = jnp.concatenate(cand_i, axis=1)
    vals, sel = jax.lax.top_k(cv, k)
    idx = jnp.take_along_axis(ci, sel, axis=1)
    outs = [jnp.take_along_axis(jnp.concatenate(ce, axis=1), sel, axis=1)
            for ce in cand_e]
    return (vals, idx, *outs)
