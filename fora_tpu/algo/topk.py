"""Top-k PPR with iterative guarantee refinement.

Reproduces the reference's trial-and-error delta-halving loop [R:
query.h/algo.h topk — reconstruction; TODS'19 Sec. 5 per SURVEY.md Sec. 2.2]:
start with a coarse guarantee threshold delta_0 ~ 1/k, run FORA, and accept
once the k-th largest estimate clears the current threshold — at that point
every top-k node sits in the region where the (eps, delta_i) relative-error
guarantee applies.  Otherwise halve delta (tightening rmax and omega) and
rerun.

Acceptance test: kth_ppr >= (1 + eps) * delta_i. If pi_hat_k passes, then
pi_k >= pi_hat_k/(1+eps) >= delta_i, so all of the top-k carry relative
error <= eps w.p. 1 - p_f.

The delta schedule is static (delta_0 / 2^i, bounded by 1/n), so each level
compiles once and is reused across queries; a whole batch advances levels
together, with per-query acceptance masking (finished queries keep their
accepted result).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ResolvedConfig
from ..graph.csr import DeviceGraph
from ..ops import topk as topk_ops
from . import fora


class TopkResult(NamedTuple):
    node_ids: np.ndarray    # [B, k] i32, descending by estimate
    values: np.ndarray      # [B, k] f32
    levels_used: int        # delta-halving rounds executed
    accepted: np.ndarray    # [B] bool — guarantee test passed (vs maxed out)


def delta_schedule(rcfg: ResolvedConfig, k: int) -> list:
    """delta_0 = 1/k, halved down to the final guarantee delta (>= 1/n)."""
    floor_delta = max(rcfg.delta, 1.0 / rcfg.n)
    deltas = []
    d = 1.0 / max(k, 2)
    while d > floor_delta:
        deltas.append(d)
        d /= 2.0
    deltas.append(floor_delta)
    return deltas


class TopkRunner:
    """Compiles one FORA fn per delta level; drives the refinement loop.

    The level loop lives on the host (it is a few iterations and each level
    is a differently-shaped compiled program), but each level's query is a
    single jit call — no host work in the hot path.
    """

    def __init__(self, graph: DeviceGraph, rcfg: ResolvedConfig,
                 k: Optional[int] = None, max_lanes: int = 1 << 23,
                 index=None):
        self.graph = graph
        self.k = k if k is not None else rcfg.k
        self.rcfg = rcfg
        self.deltas = delta_schedule(rcfg, self.k)
        self._fns = {}
        self._max_lanes = max_lanes
        self._index = index

    def _fn(self, level: int):
        if level not in self._fns:
            rc = self.rcfg.with_delta(self.deltas[level])
            self._fns[level] = fora.make_fora_fn(
                self.graph, rc, max_lanes=self._max_lanes, index=self._index)
        return self._fns[level]

    def query(self, sources: jnp.ndarray, key: jax.Array) -> TopkResult:
        B, k, eps = sources.shape[0], self.k, self.rcfg.epsilon
        best_vals = jnp.zeros((B, k), jnp.float32)
        best_idx = jnp.zeros((B, k), jnp.int32)
        accepted = jnp.zeros((B,), bool)
        levels = 0
        for level, d in enumerate(self.deltas):
            levels = level + 1
            res = self._fn(level)(sources, jax.random.fold_in(key, level))
            vals, idx = topk_ops.topk_nodes(res.ppr, k)
            newly = jnp.logical_and(~accepted, vals[:, -1] >= (1 + eps) * d)
            take = jnp.logical_or(newly, jnp.logical_and(~accepted,
                                                         level == len(self.deltas) - 1))
            best_vals = jnp.where(take[:, None], vals, best_vals)
            best_idx = jnp.where(take[:, None], idx, best_idx)
            accepted = jnp.logical_or(accepted, newly)
            if bool(jnp.all(accepted)):
                break
        return TopkResult(node_ids=np.asarray(best_idx),
                          values=np.asarray(best_vals),
                          levels_used=levels,
                          accepted=np.asarray(accepted))
