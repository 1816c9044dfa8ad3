"""Measured floor for any Pallas gather-based push kernel on this chip.

The question VERDICT round-1 item 7 asks: can a Pallas kernel over the ELL
layout beat XLA's random row-gather (the measured push ceiling, ~30-37 GB/s
effective)?  Any such kernel reduces to one of two primitives:

  A. per-row DMA HBM->VMEM for each referenced contrib row — measured in
     round 1 at 15 GB/s (per-row descriptor overhead; XLA wins 2.5x);
  B. per-edge dynamic reads from a VMEM-RESIDENT tile of contrib rows
     (the "hot rows in VMEM" hybrid — VMEM is 16 MB/core, so a [h, 128]
     f32 tile caps h at ~16K rows, covering only the hottest sources).

This probe measures B directly: a kernel whose grid walks edge chunks,
each chunk's src/dst indices scalar-prefetched, accumulating
``acc[dst] += tile[src]`` with per-edge dynamic VMEM indexing.  The metric
is edges/second — compare against XLA's measured full-graph gather rate
(~51M edges/s at B=128 on the judged graph).  If the VMEM loop cannot
beat that by a wide margin ON ITS CACHED FRACTION, the hybrid cannot win
overall (it still pays XLA rates for the cold majority), and the ELL
Pallas push is retired with numbers (see ARCHITECTURE.md).

Usage: python scripts/pallas_gather_probe.py  (real TPU; one compile)
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H = 8192          # VMEM-resident rows (8192 x 128 f32 = 4 MB)
B = 128           # batch width (one f32 VREG row per edge)
CHUNK = 2048      # edges per grid step
N_DST = 4096      # accumulator rows (fits VMEM: 2 MB)


def kernel(src_ref, dst_ref, tile_ref, acc_ref):
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    def body(i, _):
        s = src_ref[i]
        d = dst_ref[i]
        acc_ref[pl.ds(d, 1), :] += tile_ref[pl.ds(s, 1), :]
        return 0

    jax.lax.fori_loop(0, CHUNK, body, 0)


def main():
    jax.config.update("jax_compilation_cache_dir",
                      str(Path("bench_data/jaxcache")))
    e_total = 1 << 18   # 256K edges (probe scale)
    rng = np.random.default_rng(0)
    src = rng.integers(0, H, e_total).astype(np.int32)
    dst = rng.integers(0, N_DST, e_total).astype(np.int32)
    tile = rng.random((H, B), np.float32)

    grid = e_total // CHUNK
    call = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((CHUNK,), lambda i: (i,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((CHUNK,), lambda i: (i,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((H, B), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((N_DST, B), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N_DST, B), jnp.float32),
    )
    run = jax.jit(lambda s, d, t: call(s, d, t))
    args = (jnp.asarray(src), jnp.asarray(dst), jnp.asarray(tile))
    out = run(*args)
    out.block_until_ready()
    t0 = time.time()
    reps = 3
    for _ in range(reps):
        out = run(*args)
    out.block_until_ready()
    dt = (time.time() - t0) / reps
    rate = e_total / dt
    print(f"VMEM per-edge accumulate: {dt*1e3:.1f} ms for {e_total} edges "
          f"-> {rate/1e6:.1f} M edges/s "
          f"({rate*B*4/1e9:.1f} GB/s effective row traffic)")
    # correctness spot check vs numpy
    want = np.zeros((N_DST, B), np.float32)
    np.add.at(want, dst, tile[src])
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-4)
    print("correctness OK")


if __name__ == "__main__":
    main()
