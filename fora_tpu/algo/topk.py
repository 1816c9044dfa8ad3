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


def delta_schedule(rcfg: ResolvedConfig, k: int, stride: float = 2.0) -> list:
    """delta_0 = 1/k, divided by ``stride`` per level down to the final
    guarantee delta (>= 1/n).  The reference halves (stride 2); stride 4
    matches the index bucket granularity and halves the level count at the
    cost of at most one over-fine level."""
    floor_delta = max(rcfg.delta, 1.0 / rcfg.n)
    deltas = []
    d = 1.0 / max(k, 2)
    while d > floor_delta:
        deltas.append(d)
        d /= stride
    deltas.append(floor_delta)
    return deltas


class TopkRunner:
    """Drives the delta-halving refinement loop over jitted FORA calls.

    The guarantee parameters (rmax, omega_unit) enter the compiled program
    as runtime scalars, so levels share compilations; only the walk-lane
    count is shape-defining and is bucketed to powers of four — a ~14-level
    schedule compiles 3-4 programs, not 14.
    """

    LANE_BUCKETS = (1 << 12, 1 << 14, 1 << 16, 1 << 18, 1 << 20, 1 << 22)

    def __init__(self, graph: DeviceGraph, rcfg: ResolvedConfig,
                 k: Optional[int] = None, max_lanes: int = 1 << 23,
                 index=None, delta_stride: float = 2.0):
        self.graph = graph
        self.k = k if k is not None else rcfg.k
        self.rcfg = rcfg
        self.deltas = delta_schedule(rcfg, self.k, stride=delta_stride)
        self._fns = {}
        self._max_lanes = max_lanes
        self._index = index
        # per level: (compile key, rmax, omega_unit); the compile key is the
        # index depth (FORA+ mode) or the walk-lane bucket (raw-walk mode)
        self._levels = []
        for d in self.deltas:
            rc = rcfg.with_delta(d)
            if index is not None:
                key = index.depth_for(rc.omega_unit)
            else:
                from ..ops.walk import walk_lane_budget
                need = walk_lane_budget(rc.omega_unit, rc.rmax, rc.m, rc.n,
                                        cap=max_lanes)
                key = min(next((b for b in self.LANE_BUCKETS if b >= need),
                               max_lanes), max_lanes)
            self._levels.append((key, rc.rmax, rc.omega_unit))

    def _fn(self, key: int):
        if key not in self._fns:
            if self._index is not None:
                self._fns[key] = fora.make_fora_param_fn(
                    self.graph, self.rcfg, 0, index=self._index,
                    index_depth=key)
            else:
                self._fns[key] = fora.make_fora_param_fn(
                    self.graph, self.rcfg, key)
        return self._fns[key]

    def query(self, sources: jnp.ndarray, key: jax.Array) -> TopkResult:
        B, k, eps = sources.shape[0], self.k, self.rcfg.epsilon
        best_vals = jnp.zeros((B, k), jnp.float32)
        best_idx = jnp.zeros((B, k), jnp.int32)
        accepted = jnp.zeros((B,), bool)
        levels = 0
        for level, d in enumerate(self.deltas):
            levels = level + 1
            ckey, rmax, omega_unit = self._levels[level]
            res = self._fn(ckey)(sources, jax.random.fold_in(key, level),
                                 jnp.float32(rmax), jnp.float32(omega_unit))
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

    def query_pool(self, sources: np.ndarray, key: jax.Array,
                   batch: int) -> TopkResult:
        """Level-pipelined batching over a pool of queries.

        ``query`` advances a whole batch to deeper levels until EVERY query
        accepts, so one straggler drags the full batch through the most
        expensive levels.  Here accepted queries exit at their level and
        only the stragglers re-batch deeper: amortized cost per query is
        sum_l P(reach level l) * cost_l — the batched analog of the
        reference's per-query early exit.
        """
        sources = np.asarray(sources)
        n_q = len(sources)
        k, eps = self.k, self.rcfg.epsilon
        out_ids = np.zeros((n_q, k), np.int32)
        out_vals = np.zeros((n_q, k), np.float32)
        out_levels = np.zeros(n_q, np.int32)
        accepted = np.zeros(n_q, bool)
        pending = np.arange(n_q)
        for level, d in enumerate(self.deltas):
            if len(pending) == 0:
                break
            ckey, rmax, omega_unit = self._levels[level]
            fn = self._fn(ckey)
            last = level == len(self.deltas) - 1
            next_pending = []
            for lo in range(0, len(pending), batch):
                chunk = pending[lo: lo + batch]
                pad = batch - len(chunk)
                src = np.concatenate(
                    [sources[chunk], np.repeat(sources[chunk[-1:]], pad)])
                res = fn(jnp.asarray(src, jnp.int32),
                         jax.random.fold_in(key, level * 10007 + lo),
                         jnp.float32(rmax), jnp.float32(omega_unit))
                vals, idx = topk_ops.topk_nodes(res.ppr, k)
                vals = np.asarray(vals)[: len(chunk)]
                idx = np.asarray(idx)[: len(chunk)]
                ok = vals[:, -1] >= (1 + eps) * d
                take = np.logical_or(ok, last)
                sel = chunk[take]
                out_ids[sel] = idx[take]
                out_vals[sel] = vals[take]
                out_levels[sel] = level + 1
                accepted[sel] = ok[take]
                next_pending.extend(chunk[~take])
            pending = np.asarray(next_pending, dtype=np.int64)
        return TopkResult(node_ids=out_ids, values=out_vals,
                          levels_used=int(out_levels.max(initial=0)),
                          accepted=accepted)
