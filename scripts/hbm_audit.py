"""AOT HBM audit for the refinement-loop programs at judged scale.

Round-4 pinned the judged metric at B=128 because B=256 OOMed v5e's
16 GB; round 5 restructured the superstep (gather_scatter_add in-place
residue accumulation), the bucket SpMV (scatter into the donated contrib)
and the accept (split p/contrib, no materialized ppr) to drop two whole
[n, B] buffers.  This script PROVES the fit without touching the chip:
XLA:TPU compiles the exact programs against a hardware-free v5e topology
(jax.experimental.topologies, same as tests/test_aot_lowering.py) and
reports the compiler's own buffer-assignment peak (memory_analysis).

Usage:  python scripts/hbm_audit.py [B ...]    (default: 128 256)

Shapes mirror the judged-scale bench: n = 2^22, merged-unique in-edges
(~63.8M), hub split H = 2^17, FORA+ index 162M edges (the real
rmat22x16s7 bucket sizes).
"""

import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", False)

N = 1 << 22
M_TAIL = 55_000_000          # merged-unique tail in-edges (approx real)
M_HUB = 9_000_000            # hub-partition in-edges
H = 1 << 17
# real judged-scale index bucket sizes (bench_data meta.json)
BUCKETS = [116286289, 31255197, 7886719, 1873508, 387205, 72411, 14226,
           4194946]
GATHER_CHUNK = 1 << 20

f32 = jnp.float32
i32 = jnp.int32


def sds(shape, dtype):
    return jax.ShapeDtypeStruct(shape, dtype)


def one_device_mesh():
    from jax.experimental import topologies
    t = topologies.get_topology_desc("v5e:2x4", platform="tpu")
    return jax.sharding.Mesh(np.array(t.devices[:1]), ("d",))


def graph_struct():
    from fora_tpu.graph.csr import DeviceGraph
    return DeviceGraph(
        out_indptr=sds((N + 1,), i32),
        out_indices=sds((M_TAIL + M_HUB,), i32),
        in_src=sds((M_TAIL,), i32),
        in_dst=sds((M_TAIL,), i32),
        out_deg=sds((N,), i32),
        in_w=sds((M_TAIL,), f32),
        hub_ids=sds((H,), i32),
        hub_src_local=sds((M_HUB,), i32),
        hub_dst=sds((M_HUB,), i32),
        hub_w=sds((M_HUB,), f32),
    )


def report(tag, compiled):
    ma = compiled.memory_analysis()
    gb = 1 / (1 << 30)
    args = ma.argument_size_in_bytes
    out = ma.output_size_in_bytes
    alias = ma.alias_size_in_bytes
    temp = ma.temp_size_in_bytes
    peak = args + out + temp - alias
    print(f"{tag}: args {args*gb:.2f}G out {out*gb:.2f}G "
          f"alias {alias*gb:.2f}G temp {temp*gb:.2f}G "
          f"-> peak {peak*gb:.2f}G"
          + ("  ** OVER 15.75G **" if peak * gb > 15.75 else "  (fits)"))
    return peak * gb


def audit(B):
    from fora_tpu.ops import push as push_ops
    mesh = one_device_mesh()
    rep = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())

    def tjit(fn, donate=()):
        # in/out shardings pin the compile to the XLA:TPU pipeline of the
        # hardware-free topology (a bare jit().lower() compiles for the
        # CPU backend, whose float-normalization and buffer assignment
        # have nothing to do with the chip)
        return jax.jit(fn, in_shardings=rep, out_shardings=rep,
                       donate_argnums=donate)

    g = graph_struct()
    state = push_ops.PushState(p=sds((N, B), f32), r=sds((N, B), f32),
                               iters=sds((), i32))

    print(f"=== B={B} ===")
    # 1a. the while-loop push program (small-state path)
    def push_fn(gx, st, rmax, thr, max_iters):
        return push_ops.forward_push_from(
            gx, st, rmax=rmax, alpha=0.2, max_iters=max_iters,
            max_chunk=GATHER_CHUNK, thr=thr)

    push = tjit(push_fn, donate=(1,))
    low = push.lower(g, state, sds((), f32), sds((N,), f32),
                     sds((), i32))
    peak = report("push(while)", low.compile())

    # 1b. the host-stepped split superstep (large-state path, what the
    # judged scale actually runs; optional bf16 gather operand) — mirrors
    # StagedForaPrograms._step_a/_step_b exactly
    for gd in (None, jnp.bfloat16):
        cd = f32 if gd is None else jnp.bfloat16

        def step_a(gx, p, r, thr, _gd=gd):
            deg = gx.out_deg.astype(jnp.float32)[:, None]
            dangling = deg == 0.0
            active = r > thr[:, None]
            ar = jnp.where(active, r, 0.0)
            p = p + jnp.where(dangling, ar, 0.2 * ar)
            contrib = jnp.where(dangling, 0.0,
                                0.8 * ar / jnp.maximum(deg, 1e-30))
            if _gd is not None:
                contrib = contrib.astype(_gd)
            return p, contrib

        def step_b(gx, r, contrib, thr):
            r = jnp.where(r > thr[:, None], 0.0, r)
            r = push_ops.gather_scatter_add(
                r, contrib, gx.in_src, gx.in_dst, max_chunk=GATHER_CHUNK,
                edge_w=gx.in_w)
            r = push_ops.gather_scatter_add(
                r, contrib[gx.hub_ids], gx.hub_src_local, gx.hub_dst,
                max_chunk=GATHER_CHUNK, edge_w=gx.hub_w)
            return r, jnp.any(r > thr[:, None])

        tag = "bf16" if gd is not None else "f32"
        alow = tjit(step_a, donate=(1,)).lower(
            g, sds((N, B), f32), sds((N, B), f32), sds((N,), f32))
        peak = max(peak, report(f"stepA({tag})", alow.compile()))
        blow = tjit(step_b, donate=(1, 2)).lower(
            g, sds((N, B), f32), sds((N, B), cd), sds((N,), f32))
        peak = max(peak, report(f"stepB({tag})", blow.compile()))

    # 1c. the PAIRED superstep at half-width blocks (the push_pair mode:
    # two [N, B/2] blocks, gather at width B) — judged-scale config
    if B % 2 == 0:
        w = B // 2
        for gd in (None, jnp.bfloat16):
            cd = f32 if gd is None else jnp.bfloat16

            def step_a_pair(gx, pA, pB, rA, rB, thr, _gd=gd):
                deg = gx.out_deg.astype(jnp.float32)[:, None]
                dangling = deg == 0.0
                thr2 = thr[:, None]

                def half(p, r):
                    active = r > thr2
                    ar = jnp.where(active, r, 0.0)
                    p = p + jnp.where(dangling, ar, 0.2 * ar)
                    c = jnp.where(dangling, 0.0,
                                  0.8 * ar / jnp.maximum(deg, 1e-30))
                    if _gd is not None:
                        c = c.astype(_gd)
                    return p, c

                pA, cA = half(pA, rA)
                pB, cB = half(pB, rB)
                ww = rA.shape[1]
                contrib = jnp.zeros((rA.shape[0], 2 * ww), cA.dtype)
                contrib = jax.lax.dynamic_update_slice(contrib, cA, (0, 0))
                contrib = jax.lax.dynamic_update_slice(contrib, cB, (0, ww))
                return pA, pB, contrib

            def step_b_pair(gx, rA, rB, contrib, thr):
                thr2 = thr[:, None]
                rA = jnp.where(rA > thr2, 0.0, rA)
                rB = jnp.where(rB > thr2, 0.0, rB)
                rA, rB = push_ops.gather_scatter_add_pair(
                    rA, rB, contrib, gx.in_src, gx.in_dst,
                    max_chunk=GATHER_CHUNK, edge_w=gx.in_w)
                rA, rB = push_ops.gather_scatter_add_pair(
                    rA, rB, contrib[gx.hub_ids], gx.hub_src_local,
                    gx.hub_dst, max_chunk=GATHER_CHUNK, edge_w=gx.hub_w)
                cont = jnp.logical_or(jnp.any(rA > thr2),
                                      jnp.any(rB > thr2))
                return rA, rB, cont

            tag = "bf16" if gd is not None else "f32"
            alow = tjit(step_a_pair, donate=(1, 2)).lower(
                g, sds((N, w), f32), sds((N, w), f32), sds((N, w), f32),
                sds((N, w), f32), sds((N,), f32))
            peak = max(peak, report(f"pairA({tag})", alow.compile()))
            blow = tjit(step_b_pair, donate=(1, 2, 3)).lower(
                g, sds((N, w), f32), sds((N, w), f32), sds((N, B), cd),
                sds((N,), f32))
            peak = max(peak, report(f"pairB({tag})", blow.compile()))

    # 2. one bucket SpMV (the largest bucket), contrib donated
    def bucket(src, dst, mult, r, inv_cnt, contrib):
        return push_ops.gather_scatter_add(
            contrib, r, src, dst, max_chunk=GATHER_CHUNK,
            edge_w=mult, src_w=inv_cnt)

    E0 = BUCKETS[0]
    blow = tjit(bucket, donate=(5,)).lower(
        sds((E0,), i32), sds((E0,), i32), sds((E0,), f32),
        sds((N, B), f32), sds((N,), f32), sds((N, B), f32))
    peak = max(peak, report("bucket0", blow.compile()))

    # 2b. half-walk bucket SpMV: column-windowed gather from the full-
    # width residue into a half-width accumulator (the piece that lets a
    # single 256-wide block fit; walk_contrib_cols)
    if B % 2 == 0:
        w = B // 2

        def bucket_cols(src, dst, mult, r, inv_cnt, contrib):
            return push_ops.gather_scatter_add(
                contrib, r, src, dst, max_chunk=GATHER_CHUNK,
                edge_w=mult, src_w=inv_cnt, col=(0, w))

        clow = tjit(bucket_cols, donate=(5,)).lower(
            sds((E0,), i32), sds((E0,), i32), sds((E0,), f32),
            sds((N, B), f32), sds((N,), f32), sds((N, w), f32))
        peak = max(peak, report("bucket0_cols", clow.compile()))

    # 3. the split accept (p, contrib) -> topk+bounds, contrib donated
    from fora_tpu.algo import bounds
    import functools as _ft
    acc = tjit(_ft.partial(bounds._topk_with_bounds_split, k=50, t=38.0,
                           eps=0.5), donate=(1,))
    alow = acc.lower(sds((N, B), f32), sds((N, B), f32), sds((), f32))
    peak = max(peak, report("accept", alow.compile()))

    # 3b. half-walk accept: p full-width, contrib half, column window
    if B % 2 == 0:
        w = B // 2
        acc2 = tjit(_ft.partial(bounds._topk_with_bounds_split, k=50,
                                t=38.0, eps=0.5, cols=(0, w)), donate=(1,))
        alow2 = acc2.lower(sds((N, B), f32), sds((N, w), f32),
                           sds((), f32))
        peak = max(peak, report("accept_cols", alow2.compile()))

    # resident outside the program: graph+index arrays + the pool state
    resident = (4 * (N + 1) + 4 * (M_TAIL + M_HUB)      # indptr+indices
                + 12 * M_TAIL + 4 * N + 12 * M_HUB + 4 * H
                + 12 * sum(BUCKETS) + 4 * N * 8 + 4 * N) / (1 << 30)
    print(f"resident graph+index ~{resident:.2f}G; worst program peak "
          f"{peak:.2f}G; NOTE peak already counts state args")
    del mesh
    return peak


if __name__ == "__main__":
    for b in [int(x) for x in (sys.argv[1:] or ["128", "256"])]:
        audit(b)
