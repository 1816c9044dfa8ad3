"""FORA two-phase SSPPR queries, batched over sources.

The estimator contract [R: algo.h fora_query_basic / compute_ppr_with_fwdidx
— reconstruction; paper-backed per SURVEY.md Sec. 2.2]:

  1. forward push to ``r[v] <= rmax * out_deg[v]``, yielding settled mass p
     and residue r with invariant  pi_s = p + sum_v r[v] * pi_v;
  2. for each v with r[v] > 0, run omega_v = ceil(r[v] * omega_unit)
     alpha-terminating walks from v, each adding r[v]/omega_v to its
     endpoint's estimate;
  3. pi_hat = p + walk contributions.

This yields the (eps, delta, p_f) relative-error guarantee with
omega_unit = (2 eps/3 + 2) ln(2/p_f) / (eps^2 delta).

Everything here is jit-compiled with a leading query-batch axis; arrays are
node-major [n, B] internally.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..config import ResolvedConfig
from ..graph.csr import DeviceGraph
from ..ops import push as push_ops
from ..ops import walk as walk_ops


class ForaResult(NamedTuple):
    ppr: jnp.ndarray        # [n, B] f32 estimate
    push_iters: jnp.ndarray  # [] i32
    rsum: jnp.ndarray       # [B] f32 residue mass after push
    walk_total: jnp.ndarray  # [B] i32 walks demanded
    walk_overflow: jnp.ndarray  # [B] bool static-lane budget exceeded


def fora_query(graph: DeviceGraph, sources: jnp.ndarray, key: jax.Array, *,
               rcfg: ResolvedConfig, num_lanes: int,
               rmax=None, omega_unit=None,
               index_endpoints: Optional[jnp.ndarray] = None,
               index_offsets: Optional[jnp.ndarray] = None,
               index_counts: Optional[jnp.ndarray] = None) -> ForaResult:
    """Batched FORA estimate. sources: [B] i32; returns node-major ppr.

    ``rmax``/``omega_unit`` may be traced scalars (they enter elementwise
    math only), so one compiled program serves every delta level of the
    top-k refinement — only ``num_lanes`` is shape-defining.  They default
    to the rcfg constants.

    When ``index_*`` is given (FORA+ walk index, SURVEY.md Sec. 2.1), the
    walk phase becomes endpoint-table lookups: lane j of node v reads
    endpoint (j mod count_v) from v's precomputed pool.
    """
    if rmax is None:
        rmax = rcfg.rmax
    if omega_unit is None:
        omega_unit = rcfg.omega_unit
    st = push_ops.forward_push(graph, sources, rmax=rmax,
                               alpha=rcfg.alpha,
                               max_iters=rcfg.max_push_iters)
    alloc = walk_ops.allocate_walks(st.r, omega_unit, num_lanes)

    if index_endpoints is not None:
        # FORA+: lane j for node v -> precomputed endpoint[offset_v + j % K_v]
        cnt = index_counts[alloc.start]
        j = jnp.where(cnt > 0, alloc.walk_idx % jnp.maximum(cnt, 1), 0)
        endpoints = index_endpoints[index_offsets[alloc.start] + j]
        # nodes with an empty pool (cnt == 0) fall back to "stay at v":
        endpoints = jnp.where(cnt > 0, endpoints, alloc.start)
    else:
        endpoints = walk_ops.run_walks(graph, alloc.start, key,
                                       alpha=rcfg.alpha,
                                       max_hops=rcfg.max_walk_hops)

    contrib = walk_ops.accumulate_endpoints(endpoints, alloc.weight, graph.n)
    return ForaResult(ppr=st.p + contrib, push_iters=st.iters,
                      rsum=jnp.sum(st.r, axis=0), walk_total=alloc.total,
                      walk_overflow=alloc.overflow)


def make_fora_fn(graph: DeviceGraph, rcfg: ResolvedConfig,
                 num_lanes: Optional[int] = None, max_lanes: int = 1 << 23,
                 index=None):
    """Build a jitted ``(sources, key) -> ForaResult`` for one config."""
    if num_lanes is None:
        num_lanes = walk_ops.walk_lane_budget(
            rcfg.omega_unit, rcfg.rmax, rcfg.m, rcfg.n, cap=max_lanes)
    param = make_fora_param_fn(graph, rcfg, num_lanes, index=index)

    def fn(sources, key):
        return param(sources, key, jnp.float32(rcfg.rmax),
                     jnp.float32(rcfg.omega_unit))

    return fn


def make_fora_param_fn(graph: DeviceGraph, rcfg: ResolvedConfig,
                       num_lanes: int, index=None):
    """Jitted ``(sources, key, rmax, omega_unit) -> ForaResult`` with the
    guarantee parameters as runtime scalars (one compile per lane bucket)."""
    kw = {}
    if index is not None:
        kw = dict(index_endpoints=index.endpoints, index_offsets=index.offsets,
                  index_counts=index.counts)

    @jax.jit
    def fn(sources, key, rmax, omega_unit):
        return fora_query(graph, sources, key, rcfg=rcfg,
                          num_lanes=num_lanes, rmax=rmax,
                          omega_unit=omega_unit, **kw)

    return fn
