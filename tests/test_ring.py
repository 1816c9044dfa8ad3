"""Pallas ring-collective tests in interpreter mode on the CPU mesh —
the semaphore-ordering validation SURVEY.md Sec. 5.2 calls for."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fora_tpu.ops import ring
from fora_tpu.parallel.mesh import shard_map

P = jax.sharding.PartitionSpec


def _mesh(g):
    return jax.sharding.Mesh(np.asarray(jax.devices()[:g]), ("x",))


@pytest.mark.parametrize("g", [2, 4, 8])
def test_ring_reduce_scatter_matches_psum_scatter(g):
    mesh = _mesh(g)
    n_loc, B = 16, 8
    x = jax.random.normal(jax.random.key(0), (g * g * n_loc, B))

    ours = shard_map(
        lambda v: ring.ring_reduce_scatter(v, "x", g, interpret=True),
        mesh, in_specs=P("x"), out_specs=P("x"))(x)
    ref = shard_map(
        lambda v: jax.lax.psum_scatter(v, "x", scatter_dimension=0,
                                       tiled=True),
        mesh, in_specs=P("x"), out_specs=P("x"))(x)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=1e-5)


@pytest.mark.parametrize("g", [2, 4])
def test_ring_all_gather_matches_all_gather(g):
    mesh = _mesh(g)
    n_loc, B = 8, 4
    x = jax.random.normal(jax.random.key(1), (g * n_loc, B))

    ours = shard_map(
        lambda v: ring.ring_all_gather(v, "x", g, interpret=True),
        mesh, in_specs=P("x"), out_specs=P(None))(x)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(x), atol=1e-6)


def test_ring_single_device_identity():
    x = jnp.ones((4, 4))
    assert ring.ring_reduce_scatter(x, "x", 1) is x
    assert ring.ring_all_gather(x, "x", 1) is x
