"""Test harness: run everything on a virtual 8-device CPU mesh.

SURVEY.md Sec. 4 (distributed-without-a-cluster): the sharded shard_map
code paths run on one host over 8 virtual CPU devices.

The image's sitecustomize imports jax and pins ``jax_platforms=axon,cpu``
at interpreter start (so plain env vars are too late), but the backend
itself initializes lazily — overriding via jax.config here, before any
test touches a device, reliably lands tests on the 8-CPU mesh.
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
