"""Worker script for the 2-process multi-host test (not a pytest module).

Usage: python tests/multihost_driver.py <process_id> <num_processes> <port>

Each process contributes 4 virtual CPU devices; the global 8-device mesh
runs the sharded top-k pipeline; process 0 checks precision vs the oracle
and prints MULTIHOST_OK.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def main():
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    from fora_tpu.parallel import multihost
    multihost.init(f"localhost:{port}", nproc, pid, local_cpu_devices=4)

    import jax
    import jax.numpy as jnp
    import numpy as np
    from fora_tpu.algo import exact
    from fora_tpu.config import ForaConfig
    from fora_tpu.eval import metrics
    from fora_tpu.graph import generators
    from fora_tpu.parallel import ShardedForaEngine, make_mesh

    assert len(jax.devices()) == 4 * nproc, jax.devices()

    g = generators.erdos_renyi(300, 3000, seed=21)
    rcfg = ForaConfig(epsilon=0.5).resolved(g.n, g.m)
    # 'graph' axis spans both processes (the DCN axis in a real pod)
    mesh = make_mesh(4 * nproc, 1)
    eng = ShardedForaEngine(g, mesh, rcfg, k=10)
    sources = np.array([3, 17, 42, 99, 123, 200, 250, 287])
    res = eng.topk(jnp.asarray(sources), jax.random.key(1))
    ids = multihost.gather_to_host(res.node_ids)[: len(sources)]

    if pid == 0:
        exact_ids = np.stack([exact.exact_topk(g, int(s), 10)[0]
                              for s in sources])
        prec = metrics.batch_precision_at_k(ids, exact_ids)
        assert prec >= 0.85, prec
        print(f"MULTIHOST_OK precision={prec:.3f}", flush=True)


if __name__ == "__main__":
    main()
