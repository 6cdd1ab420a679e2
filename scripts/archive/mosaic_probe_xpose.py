"""Probe Mosaic capabilities needed to kill the cascaded wrapper transforms:

1. semantics: u8 (32,128) tile -> pltpu.bitcast to u32: which byte goes where?
2. can pallas read u8 refs at all / DMA them?
3. cost of in-kernel transposes: jnp.swapaxes on (32,32)/(32,128)/(128,128),
   pltpu.repeat, and an MXU-based 16-bit-split transpose.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/mosaic_probe_xpose.py
"""
import os, time, functools
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_tpucomp"))
import jax, numpy as np, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

print("devices", jax.devices(), flush=True)


def try_call(name, fn):
    try:
        r = fn()
        print(f"{name}: OK", flush=True)
        return r
    except Exception as e:
        key = next((l for l in str(e).splitlines() if "Mosaic" in l or "NotImplemented" in l or "error" in l.lower()), str(e).splitlines()[0] if str(e) else "?")
        print(f"{name}: FAIL {key[:130]}", flush=True)
        return None


# ---- 1. u8 -> u32 bitcast semantics ---------------------------------------
def k_bitcast(x_ref, o_ref):
    x = x_ref[:]                       # (32,128) u8
    o_ref[:] = pltpu.bitcast(x, jnp.uint32)

by = jnp.asarray((np.arange(32 * 128) % 251).astype(np.uint8).reshape(32, 128))

r = try_call("bitcast u8(32,128)->u32", lambda: jax.jit(lambda v: pl.pallas_call(
    k_bitcast,
    out_shape=jax.ShapeDtypeStruct((8, 128), jnp.uint32),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
)(v))(by))
if r is not None:
    w = np.asarray(r)
    src = np.asarray(by).astype(np.uint32)
    # hypothesis A: compact rows — word(s,l) = bytes of rows 4s..4s+3, lane l
    hA = src[0::4, :] | (src[1::4, :] << 8) | (src[2::4, :] << 16) | (src[3::4, :] << 24)
    # hypothesis B: interleaved — word(s,l) = rows s, s+8, s+16, s+24
    hB = src[0:8, :] | (src[8:16, :] << 8) | (src[16:24, :] << 16) | (src[24:32, :] << 24)
    print("  hypothesis A (rows 4s..4s+3):", bool((w == hA).all()), flush=True)
    print("  hypothesis B (rows s,s+8,s+16,s+24):", bool((w == hB).all()), flush=True)
    if not (w == hA).all() and not (w == hB).all():
        print("  sample w[0,:4]:", w[0, :4], "src col0 rows0-7:", src[:8, 0], flush=True)

# ---- 2. transposes --------------------------------------------------------
def mk_loop(op, iters):
    def kernel(x_ref, o_ref):
        x0 = x_ref[:].astype(jnp.int32)

        def body(c):
            i, x = c
            return (i + 1, op(x) + i)

        i, x = jax.lax.while_loop(lambda c: c[0] < iters, body, (jnp.int32(0), x0))
        o_ref[:] = x[:8, :128] + i

    def run(v):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(v)

    return jax.jit(run)


def slope(name, op, shape):
    v = jnp.asarray(np.arange(np.prod(shape), dtype=np.int32).reshape(shape))
    try:
        f1, f2 = mk_loop(op, 20_000), mk_loop(op, 100_000)
        jax.block_until_ready(f1(v)); jax.block_until_ready(f2(v))
        def t(f):
            t0 = time.perf_counter()
            for _ in range(3):
                r = f(v)
            jax.block_until_ready(r)
            return (time.perf_counter() - t0) / 3
        per = (t(f2) - t(f1)) / 80_000 * 1e9
        print(f"{name:46s} {per:8.1f} ns/it", flush=True)
    except Exception as e:
        key = next((l for l in str(e).splitlines() if "Mosaic" in l or "NotImplemented" in l), str(e).splitlines()[0] if str(e) else "?")
        print(f"{name:46s} FAIL {key[:120]}", flush=True)


def sq_tr(x):  # square transpose keeps carry shape
    return jnp.swapaxes(x, 0, 1)


def tr2(x):  # (32,128): transpose both ways to keep shape
    return jnp.swapaxes(jnp.swapaxes(x, 0, 1), 0, 1)


def rep4(x):
    y = pltpu.repeat(x[:, :32], 4, axis=1)
    return y


eye16 = None
def mxu_tr(x):
    # 32x32 transpose via MXU: split 16-bit halves, f32 matmuls with I
    I = jnp.eye(32, dtype=jnp.float32)
    lo = (x & 0xFFFF).astype(jnp.float32)
    hi = ((x >> 16) & 0xFFFF).astype(jnp.float32)
    tlo = jax.lax.dot_general(I, lo, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    thi = jax.lax.dot_general(I, hi, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    # note: I @ x is identity; real transpose contracts dim1 of both:
    tlo = jax.lax.dot_general(I, lo, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    thi = jax.lax.dot_general(I, hi, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    return (tlo.astype(jnp.int32) | (thi.astype(jnp.int32) << 16))


slope("swapaxes (32,32)", sq_tr, (32, 32))
slope("swapaxes (128,128)", sq_tr, (128, 128))
slope("swapaxes (32,128) x2", tr2, (32, 128))
slope("pltpu.repeat 4x of (32,32)->(32,128)", rep4, (32, 128))
slope("MXU 16bit-split transpose (32,32)", mxu_tr, (32, 32))
slope("MXU 16bit-split transpose (128,128)", mxu_tr, (128, 128))
print("DONE", flush=True)
