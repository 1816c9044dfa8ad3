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
    """[n, B] estimate from ``num_walks`` source-rooted walks per query."""
    B = sources.shape[0]
    start = jnp.broadcast_to(sources[None, :], (num_walks, B))
    endpoints = walk_ops.run_walks(graph, start, key,
                                   alpha=rcfg.alpha,
                                   max_hops=rcfg.max_walk_hops)
    w = jnp.full((num_walks, B), 1.0 / num_walks, jnp.float32)
    return walk_ops.accumulate_endpoints(endpoints, w, graph.n)


def make_montecarlo_fn(graph: DeviceGraph, rcfg: ResolvedConfig,
                       max_walks: int = 1 << 22):
    import functools
    num_walks = min(int(rcfg.omega_unit) + 1, max_walks)
    # graph passes as a jit argument, not a closure constant (see
    # make_fora_param_fn docstring)
    impl = jax.jit(functools.partial(montecarlo_query, rcfg=rcfg,
                                     num_walks=num_walks))

    def fn(sources, key):
        return impl(graph, sources, key)

    return fn
