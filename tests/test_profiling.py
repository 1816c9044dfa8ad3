"""Roofline accounting and measurement helper tests (SURVEY.md Sec. 5.1)."""

import jax.numpy as jnp

from fora_tpu.utils import profiling


def test_spmv_roofline_accounting():
    r = profiling.SpmvRoofline(edges=1_000_000, batch=128, nodes=65536)
    # indices + gathered rows + accumulator traffic
    expected = 1_000_000 * 8 + 1_000_000 * 128 * 4 + 2 * 65536 * 128 * 4
    assert r.bytes_moved == expected
    assert r.light_speed_secs(bw=1e12) == expected / 1e12
    assert r.efficiency(measured_secs=expected / 1e12, bw=1e12) == 1.0


def test_measure_blocks_and_returns_median():
    def f(x):
        return x * 2.0

    t = profiling.measure(f, jnp.ones((256, 256)), reps=3)
    assert 0 <= t < 5.0


def test_device_hbm_bw_fallback():
    assert profiling.device_hbm_bw() > 0
