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
    vals, idx = jax.lax.top_k(ppr.T, k)
    return vals, idx


def local_topk_candidates(ppr_shard: jnp.ndarray, k: int, row_offset: jnp.ndarray
                          ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-shard candidates with globalized node ids (for the sharded merge)."""
    vals, idx = jax.lax.top_k(ppr_shard.T, k)
    return vals, idx + row_offset
