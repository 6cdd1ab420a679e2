"""Find the env delta that makes the real kernel's loop 45x slower than the
stripped copy loop: ref sizes, SMEM scratch, initial DMA, grid/BlockSpecs,
scalar prefetch.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/kernel_op_costs7.py
"""
import os, time, functools
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_tpucomp"))
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpucomp.kernels import lz_pallas as L

print("devices", jax.devices(), flush=True)
ROWW = 128


def run(f):
    jax.device_get(f())
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        r = f()
    jax.device_get(r)
    return (time.perf_counter() - t0) / reps


def copy_body(vin, out_ref, iters, smem=None):
    """The w_full copy loop body from costs6 (190 ns/it there)."""
    x0 = L._u(vin[0:8, :] if vin.ndim == 2 else vin[0, 0:8, :])

    def rd16(r0):
        return L._u(vin[pl.ds(r0, 16), :] if vin.ndim == 2 else vin[0, pl.ds(r0, 16), :])

    def st8(r, x):
        if out_ref.ndim == 2:
            out_ref[pl.ds(r, 8), :] = x
        else:
            out_ref[0, pl.ds(r, 8), :] = x

    def body_fn(c):
        p, o, rem, src, x, hlo = c
        rem = jnp.where(rem == 0, 4096, rem)
        h = o - hlo
        g = jnp.minimum(rem, L.TB - h)
        W = L._read_win(rd16, (src - h + L.LEAD * 512) & 32767)
        m = L._byte_mask_tile(h, g)
        x = (x & ~m) | (W & m)
        o, rem, src = o + g, rem - g, src + g

        def flush(args):
            x, hlo = args
            st8(8 + ((hlo >> 9) & 255), x)
            return jnp.zeros((8, ROWW), jnp.uint32), hlo + L.TB

        x, hlo = jax.lax.cond(o - hlo >= L.TB, lambda: flush((x, hlo)), lambda: (x, hlo))
        return (p, o, rem, src, x, hlo)

    init = (jnp.int32(0), jnp.int32(0), jnp.int32(0), jnp.int32(0), x0, jnp.int32(0))
    c = jax.lax.while_loop(lambda c: c[1] < iters * L.TB, body_fn, init)
    if out_ref.ndim == 2:
        out_ref[0:8, :] = c[4] + L._u(jnp.zeros((8, ROWW), jnp.int32) + c[1])
    else:
        out_ref[0, 0:8, :] = c[4] + L._u(jnp.zeros((8, ROWW), jnp.int32) + c[1])


N1, N2 = 2_000, 16_000


def bench(name, mk):
    try:
        t1 = run(mk(N1))
        t2 = run(mk(N2))
        per = (t2 - t1) / (N2 - N1) * 1e9
        print(f"{name:52s} {per:9.1f} ns/it  (call {t1*1e3:.1f}/{t2*1e3:.1f} ms)", flush=True)
    except Exception as e:
        msg = str(e).splitlines()
        key = next((l for l in msg if "Mosaic" in l or "Not implemented" in l), msg[0] if msg else "?")
        print(f"{name:52s} FAIL {key[:120]}", flush=True)


def mk_base(in_rows, out_rows, with_smem=False, with_dma=False):
    def mk(iters):
        scratch = []
        if with_smem:
            scratch = [pltpu.SMEM((128, ROWW), jnp.int32), pltpu.SemaphoreType.DMA]

        def kernel(vin_ref, out_ref, *sc):
            if with_dma:
                cp = pltpu.make_async_copy(vin_ref.at[pl.ds(8, 128)], sc[0], sc[1])
                cp.start()
                cp.wait()
            copy_body(vin_ref, out_ref, iters)

        vin = jnp.arange(in_rows * ROWW, dtype=jnp.int32).reshape(in_rows, ROWW)
        call = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((out_rows, ROWW), jnp.uint32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=scratch,
        )
        jf = jax.jit(lambda v: call(v))
        return lambda: jf(vin)

    return mk


def mk_grid(b, in_rows, out_rows):
    def mk(iters):
        def kernel(size_ref, vin_ref, out_ref):
            copy_body(vin_ref, out_ref, iters)

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b,),
            in_specs=[pl.BlockSpec((1, in_rows, ROWW), lambda i, s: (i, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, out_rows, ROWW), lambda i, s: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
        )
        vin = jnp.arange(b * in_rows * ROWW, dtype=jnp.int32).reshape(b, in_rows, ROWW)
        call = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((b, out_rows, ROWW), jnp.uint32),
            compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
        )
        jf = jax.jit(lambda s, v: call(s, v))
        sizes = jnp.zeros((b,), jnp.int32)
        return lambda: jf(sizes, vin)

    return mk


if not os.environ.get("ROUND2"):
    bench("base 256in/512out", mk_base(256, 512))
    bench("big refs 2048in/2048out", mk_base(2048, 2048))
    bench("base + smem scratch", mk_base(256, 512, with_smem=True))
    bench("base + smem + dma stage", mk_base(256, 512, with_smem=True, with_dma=True))
    bench("grid b=1, blocked specs 256/512", mk_grid(1, 256, 512))
    bench("grid b=4, blocked specs 256/512", mk_grid(4, 256, 512))
    print("DONE", flush=True)


# --- round 2: inner while_loop nested in cond (the LSIC shape) -------------
def mk_inner(kind):
    def mk(iters):
        def kernel(vin_ref, out_ref):
            def rd16(r0):
                return L._u(vin_ref[pl.ds(r0, 16), :])

            x0 = L._u(vin_ref[0:8, :])

            def body_fn(c):
                p, o, rem, src, x, hlo = c
                rem = jnp.where(rem == 0, 4096, rem)
                h = o - hlo
                g = jnp.minimum(rem, L.TB - h)
                # parse-like cond wrapping an inner while (never taken)
                if kind == "dead_inner_vec":
                    def lsic():
                        def step(s):
                            q, acc, go = s
                            W = L._read_win(rd16, q & 32767)
                            d = L._first_diff_tile(W, W ^ 1)
                            return q + d, acc + d, acc < 0

                        q, acc, _ = jax.lax.while_loop(
                            lambda s: s[2], step, (p, jnp.int32(0), jnp.bool_(True))
                        )
                        return acc

                    extra = jax.lax.cond(g > L.TB, lsic, lambda: jnp.int32(0))
                    o = o + extra * 0
                elif kind == "dead_inner_scalar":
                    def lsic():
                        def step(s):
                            q, acc = s
                            return q + 1, acc + q

                        q, acc = jax.lax.while_loop(
                            lambda s: s[1] < 0, step, (p, jnp.int32(-5))
                        )
                        return acc

                    extra = jax.lax.cond(g > L.TB, lsic, lambda: jnp.int32(0))
                    o = o + extra * 0
                elif kind == "taken_inner_vec_once":
                    def step(s):
                        q, acc, go = s
                        W = L._read_win(rd16, q & 32767)
                        d = L._first_diff_tile(W, W)
                        return q + 1, acc + (d >= L.TB).astype(jnp.int32), acc < 1

                    q, acc, _ = jax.lax.while_loop(
                        lambda s: s[2], step, (p, jnp.int32(1), jnp.bool_(True))
                    )
                    o = o + acc * 0
                W = L._read_win(rd16, (src - h + L.LEAD * 512) & 32767)
                m = L._byte_mask_tile(h, g)
                x = (x & ~m) | (W & m)
                o, rem, src = o + g, rem - g, src + g

                def flush(args):
                    x, hlo = args
                    out_ref[pl.ds(8 + ((hlo >> 9) & 255), 8), :] = x
                    return jnp.zeros((8, ROWW), jnp.uint32), hlo + L.TB

                x, hlo = jax.lax.cond(
                    o - hlo >= L.TB, lambda: flush((x, hlo)), lambda: (x, hlo)
                )
                return (p, o, rem, src, x, hlo)

            init = (jnp.int32(0), jnp.int32(0), jnp.int32(0), jnp.int32(0),
                    x0, jnp.int32(0))
            c = jax.lax.while_loop(lambda c: c[1] < iters * L.TB, body_fn, init)
            out_ref[0:8, :] = c[4] + L._u(jnp.zeros((8, ROWW), jnp.int32) + c[1])

        vin = jnp.arange(256 * ROWW, dtype=jnp.int32).reshape(256, ROWW)
        call = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((512, ROWW), jnp.uint32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        jf = jax.jit(lambda v: call(v))
        return lambda: jf(vin)

    return mk


if os.environ.get("ROUND2"):
    bench("copy + DEAD cond(inner vec while)", mk_inner("dead_inner_vec"))
    bench("copy + DEAD cond(inner scalar while)", mk_inner("dead_inner_scalar"))
    bench("copy + inner vec while taken 1x", mk_inner("taken_inner_vec_once"))
    print("DONE2", flush=True)
