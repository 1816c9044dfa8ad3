"""FORA+ walk-index tests: sizing, build statistics, serialization round-trip,
compat checking, and indexed-query accuracy (SURVEY.md Sec. 2.1 / 5.4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fora_tpu import index as widx
from fora_tpu.algo import exact, fora
from fora_tpu.config import ForaConfig
from fora_tpu.eval import metrics
from fora_tpu.graph import generators, to_device
from fora_tpu.ops import topk as topk_ops


def _setup(eps=0.5):
    g = generators.karate_club()
    dg = to_device(g)
    rcfg = ForaConfig(epsilon=eps).resolved(g.n, g.m)
    return g, dg, rcfg


def test_index_counts_cover_demand():
    """K_v must cover the worst-case query demand ceil(rmax*deg*omega)+..."""
    g, dg, rcfg = _setup()
    counts = widx.index_counts(np.asarray(g.out_deg), rcfg)
    deg = np.asarray(g.out_deg, dtype=np.float64)
    demand = np.ceil(rcfg.rmax * deg * rcfg.omega_unit)
    assert np.all(counts[deg > 0] >= demand[deg > 0])
    assert np.all(counts[deg == 0] == 0)


def test_index_endpoint_statistics():
    """Pooled index endpoints from node v estimate pi_v."""
    g, dg, rcfg = _setup()
    # enlarge the pool for a tight statistical check
    big = ForaConfig(epsilon=0.5, walk_multiplier=50.0).resolved(g.n, g.m)
    idx = widx.build_walk_index(dg, big, jax.random.key(0), chunk=1 << 14)
    counts = np.asarray(idx.counts)
    offs = np.asarray(idx.offsets)
    ends = np.asarray(idx.endpoints)
    v = 0
    pool = ends[offs[v]: offs[v] + counts[v]]
    freq = np.bincount(pool, minlength=g.n) / len(pool)
    pi = exact.exact_ppr_dense(g, v)
    assert np.abs(freq - pi).sum() < 4.0 / np.sqrt(len(pool)) * np.sqrt(g.n)


def test_indexed_query_matches_guarantee():
    g, dg, rcfg = _setup()
    idx = widx.build_walk_index(dg, rcfg, jax.random.key(1))
    fn = fora.make_fora_fn(dg, rcfg, index=idx)
    res = fn(jnp.array([0, 33]), jax.random.key(2))
    ppr = np.asarray(res.ppr, dtype=np.float64)
    for b, s in enumerate([0, 33]):
        pi = exact.exact_ppr_dense(g, s)
        assert metrics.max_relative_error(ppr[:, b], pi, rcfg.delta) <= 0.6
        _, ids = topk_ops.topk_nodes(res.ppr, 5)
        assert metrics.precision_at_k(np.asarray(ids[b]),
                                      exact.exact_topk(g, s, 5)[0]) >= 0.8


def test_index_store_roundtrip(tmp_path):
    g, dg, rcfg = _setup()
    idx = widx.build_walk_index(dg, rcfg, jax.random.key(3))
    widx.save(idx, rcfg, str(tmp_path / "idx"))
    idx2 = widx.load(str(tmp_path / "idx"), rcfg)
    assert np.array_equal(np.asarray(idx.endpoints), np.asarray(idx2.endpoints))
    assert np.array_equal(np.asarray(idx.offsets), np.asarray(idx2.offsets))
    assert np.array_equal(np.asarray(idx.counts), np.asarray(idx2.counts))


def test_index_store_row_range(tmp_path):
    g, dg, rcfg = _setup()
    idx = widx.build_walk_index(dg, rcfg, jax.random.key(4))
    widx.save(idx, rcfg, str(tmp_path / "idx"))
    lo, hi = 10, 20
    part = widx.load(str(tmp_path / "idx"), row_range=(lo, hi))
    full_off = np.asarray(idx.offsets)
    full_cnt = np.asarray(idx.counts)
    for v in range(lo, hi):
        a = np.asarray(idx.endpoints)[full_off[v]: full_off[v] + full_cnt[v]]
        o = np.asarray(part.offsets)[v - lo]
        b = np.asarray(part.endpoints)[o: o + np.asarray(part.counts)[v - lo]]
        assert np.array_equal(a, b)


def test_index_compat_rejects_coarser(tmp_path):
    g, dg, rcfg = _setup()
    idx = widx.build_walk_index(dg, rcfg, jax.random.key(5))
    widx.save(idx, rcfg, str(tmp_path / "idx"))
    finer = ForaConfig(epsilon=0.25).resolved(g.n, g.m)  # needs more walks
    with pytest.raises(ValueError, match="too coarse"):
        widx.load(str(tmp_path / "idx"), finer)
    other_graph = ForaConfig(epsilon=0.5).resolved(g.n + 1, g.m)
    with pytest.raises(ValueError, match="different graph"):
        widx.load(str(tmp_path / "idx"), other_graph)
