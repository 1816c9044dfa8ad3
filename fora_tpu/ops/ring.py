"""Pallas ring collectives over the 'graph' mesh axis.

The sharded pipeline's two exchanges (SURVEY.md Sec. 2.3 / 5.8) are a
frontier all_gather and an endpoint-mass reduce_scatter over ICI.  XLA's
collectives handle both; these Pallas kernels provide the ring variants
with explicit neighbor RDMA (``pltpu.make_async_remote_copy`` + DMA
semaphores — the SNIPPETS.md [1] skeleton), which (a) exercise the
comm-fusion path the M5/M6 scale-out work builds on, and (b) can overlap
reduction compute with the next hop's transfer.

Ring reduce-scatter of x[G * n_loc, B] over axis name ``axis``:
device g ends with  sum_h x_h[g * n_loc : (g+1) * n_loc]  after G-1 hops,
passing partial sums left-to-right.  At step s, device g sends the partial
for block (g - s - 1) mod G to its right neighbor, which adds its own
contribution and forwards.

Verified against jax.lax.psum_scatter in interpreter mode on the CPU mesh
(tests/test_ring.py) — the semaphore-ordering test SURVEY Sec. 5.2 calls
for.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ring_reduce_scatter_kernel(x_ref, out_ref, comm_buf, send_sem, recv_sem,
                                *, axis: str, num_devices: int, n_loc: int,
                                scalar_id: bool):
    my_id = jax.lax.axis_index(axis)
    right = jax.lax.rem(my_id + 1, num_devices)
    # interpret-mode discharge mishandles dict/tuple ids on a 1-D mesh
    # (tuple == tracer); scalar + MESH works there, dict is required for
    # multi-axis meshes on real hardware.
    rid = right if scalar_id else {axis: right}

    # running partial for the block we will forward next lives in comm_buf
    # slot [phase]; double-buffered so a receive never clobbers the block
    # being sent.
    def block(i):
        b = jax.lax.rem(i, num_devices)
        return x_ref[pl.ds(b * n_loc, n_loc), :]

    # step 0: send my contribution for block (my_id - 1)
    first_blk = jax.lax.rem(my_id - 1 + num_devices, num_devices)
    comm_buf[0] = x_ref[pl.ds(first_blk * n_loc, n_loc), :]

    def body(step, _):
        send_slot = jax.lax.rem(step, 2)
        recv_slot = jax.lax.rem(step + 1, 2)
        rdma = pltpu.make_async_remote_copy(
            src_ref=comm_buf.at[send_slot],
            dst_ref=comm_buf.at[recv_slot],
            send_sem=send_sem.at[send_slot],
            recv_sem=recv_sem.at[recv_slot],
            device_id=rid,
            device_id_type=pltpu.DeviceIdType.MESH,
        )
        rdma.start()
        rdma.wait()
        # received: partial for block (my_id - step - 2); accumulate into
        # the recv slot — that slot is what the NEXT step forwards
        blk = jax.lax.rem(my_id - step - 2 + 2 * num_devices, num_devices)
        comm_buf[recv_slot] = (comm_buf[recv_slot]
                               + x_ref[pl.ds(blk * n_loc, n_loc), :])
        return 0

    jax.lax.fori_loop(0, num_devices - 1, body, 0)
    # the last iteration (step = G-2) accumulated into slot (G-1) % 2
    out_ref[:, :] = comm_buf[(num_devices - 1) % 2]


def ring_reduce_scatter(x: jnp.ndarray, axis: str, num_devices: int,
                        interpret: bool = False) -> jnp.ndarray:
    """Per-shard body (call inside shard_map): x is the local [G*n_loc, B]
    full-length partial; returns this shard's [n_loc, B] reduced block."""
    total, B = x.shape
    assert total % num_devices == 0
    n_loc = total // num_devices
    if num_devices == 1:
        return x

    kernel = functools.partial(
        _ring_reduce_scatter_kernel, axis=axis,
        num_devices=num_devices, n_loc=n_loc, scalar_id=interpret)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_loc, B), x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, n_loc, B), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, collective_id=13),
        interpret=interpret,
    )(x)


def _ring_all_gather_kernel(x_ref, out_ref, send_sem, recv_sem,
                            *, axis: str, num_devices: int, n_loc: int,
                            scalar_id: bool):
    my_id = jax.lax.axis_index(axis)
    right = jax.lax.rem(my_id + 1, num_devices)
    rid = right if scalar_id else {axis: right}
    out_ref[pl.ds(my_id * n_loc, n_loc), :] = x_ref[:, :]

    def body(step, _):
        # forward the block that arrived previously (my own at step 0)
        src_blk = jax.lax.rem(my_id - step + num_devices, num_devices)
        dst_blk = src_blk  # lands at the same global slot on the neighbor
        rdma = pltpu.make_async_remote_copy(
            src_ref=out_ref.at[pl.ds(src_blk * n_loc, n_loc), :],
            dst_ref=out_ref.at[pl.ds(dst_blk * n_loc, n_loc), :],
            send_sem=send_sem.at[jax.lax.rem(step, 2)],
            recv_sem=recv_sem.at[jax.lax.rem(step, 2)],
            device_id=rid,
            device_id_type=pltpu.DeviceIdType.MESH,
        )
        rdma.start()
        rdma.wait()
        return 0

    jax.lax.fori_loop(0, num_devices - 1, body, 0)


def ring_all_gather(x: jnp.ndarray, axis: str, num_devices: int,
                    interpret: bool = False) -> jnp.ndarray:
    """Per-shard body (call inside shard_map): x [n_loc, B] local block ->
    [G*n_loc, B] gathered (ring, G-1 neighbor hops)."""
    n_loc, B = x.shape
    if num_devices == 1:
        return x
    kernel = functools.partial(
        _ring_all_gather_kernel, axis=axis,
        num_devices=num_devices, n_loc=n_loc, scalar_id=interpret)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((num_devices * n_loc, B), x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, collective_id=14),
        interpret=interpret,
    )(x)
