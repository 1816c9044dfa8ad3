"""Pallas ring collectives composed into a push-like exchange pipeline.

jax's interpret-mode discharge for remote DMA supports only single-axis
meshes (mosaic TPU lowering handles the 2-D ('graph','query') mesh via
dict device ids), so this validates the engine's exchange pattern —
frontier all_gather + endpoint reduce_scatter — on a 1-axis mesh and
checks it against the XLA collectives it replaces.
"""

import jax
import jax.numpy as jnp
import numpy as np

from fora_tpu.ops import ring
from fora_tpu.parallel.mesh import shard_map

P = jax.sharding.PartitionSpec


def test_ring_exchange_pipeline_matches_xla():
    """One push-like superstep: gather full contribs, each shard produces
    mass for all rows, reduce-scatter back to owners."""
    G, n_loc, B = 8, 16, 4
    mesh = jax.sharding.Mesh(np.asarray(jax.devices()[:G]), ("x",))
    contrib = jax.random.normal(jax.random.key(0), (G * n_loc, B))

    def step(c_loc, use_ring):
        if use_ring:
            full = ring.ring_all_gather(c_loc, "x", G, interpret=True)
        else:
            full = jax.lax.all_gather(c_loc, "x", axis=0, tiled=True)
        # toy "walk phase": every shard contributes its view shifted by one
        produced = jnp.roll(full, 1, axis=0) * 0.5
        if use_ring:
            return ring.ring_reduce_scatter(produced, "x", G, interpret=True)
        return jax.lax.psum_scatter(produced, "x", scatter_dimension=0,
                                    tiled=True)

    ring_out = shard_map(lambda c: step(c, True), mesh,
                         in_specs=P("x"), out_specs=P("x"))(contrib)
    xla_out = shard_map(lambda c: step(c, False), mesh,
                        in_specs=P("x"), out_specs=P("x"))(contrib)
    np.testing.assert_allclose(np.asarray(ring_out), np.asarray(xla_out),
                               rtol=1e-5, atol=1e-5)
