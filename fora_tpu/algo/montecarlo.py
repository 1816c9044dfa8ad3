"""Pure Monte-Carlo SSPPR — competitor baseline (reference ``--algo
montecarlo`` [R: algo.h montecarlo_query — reconstruction, SURVEY.md
Sec. 2.1]).

omega = (2 eps/3 + 2) ln(2/p_f) / (eps^2 delta) walks from the source
itself (rsum = 1 case of the FORA bound); estimate = endpoint frequencies.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import ResolvedConfig
from ..graph.csr import DeviceGraph
from ..ops import walk as walk_ops


def montecarlo_query(graph: DeviceGraph, sources: jnp.ndarray, key: jax.Array,
                     *, rcfg: ResolvedConfig,
                     num_walks: int) -> jnp.ndarray:
    """[n, B] estimate from ``num_walks`` source-rooted walks per query
    (plain lockstep kernel — the scheduled variant below is the default
    query path)."""
    B = sources.shape[0]
    start = jnp.broadcast_to(sources[None, :], (num_walks, B))
    endpoints = walk_ops.run_walks(graph, start, key,
                                   alpha=rcfg.alpha,
                                   max_hops=rcfg.max_walk_hops)
    w = jnp.full((num_walks, B), 1.0 / num_walks, jnp.float32)
    return walk_ops.accumulate_endpoints(endpoints, w, graph.n)


def montecarlo_query_scheduled(graph: DeviceGraph, sources: jnp.ndarray,
                               key: jax.Array, *, rcfg: ResolvedConfig,
                               num_walks: int):
    """montecarlo_query on the length-scheduled walk kernel (~10x fewer
    hop-gather elements; ops/walk.run_walks_scheduled).  The scheduled
    kernel returns endpoints in original lane order, so the flat [W*B]
    lanes reshape straight back to [W, B].  Returns (estimate, ok)."""
    B = sources.shape[0]
    start = jnp.broadcast_to(sources[None, :],
                             (num_walks, B)).reshape(-1)
    ep, ok = walk_ops.run_walks_scheduled(graph, start, key,
                                          alpha=rcfg.alpha,
                                          max_hops=rcfg.max_walk_hops)
    w = jnp.full((num_walks, B), 1.0 / num_walks, jnp.float32)
    return walk_ops.accumulate_endpoints(ep.reshape(num_walks, B), w,
                                         graph.n), ok


def make_montecarlo_fn(graph: DeviceGraph, rcfg: ResolvedConfig,
                       max_walks: int = 1 << 22):
    import functools

    import numpy as np
    num_walks = min(int(rcfg.omega_unit) + 1, max_walks)
    # graph passes as a jit argument, not a closure constant (see
    # make_fora_param_fn docstring)
    impl = jax.jit(functools.partial(montecarlo_query_scheduled, rcfg=rcfg,
                                     num_walks=num_walks))
    plain = jax.jit(functools.partial(montecarlo_query, rcfg=rcfg,
                                      num_walks=num_walks))

    def fn(sources, key):
        est, ok = impl(graph, sources, key)
        if not bool(np.asarray(ok)):   # schedule overflow: plain kernel
            est = plain(graph, sources, key)
        return est

    return fn
