"""Composite-op costs for the v2 LZ granule machinery (slope-based, jitted).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/kernel_op_costs4.py
"""
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_tpucomp"))
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpucomp.kernels import lz_pallas as L

print("devices", jax.devices(), flush=True)
ROWW = 128
N1, N2 = 16_000, 128_000


def run(f):
    jax.device_get(f())
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        r = f()
    jax.device_get(r)
    return (time.perf_counter() - t0) / reps


def bench(name, body_fn):
    def mk(iters):
        def kernel(vin_ref, out_ref):
            def body(i, c):
                x, s = c
                return body_fn(i, x, s, vin_ref)

            x, s = jax.lax.fori_loop(
                0, iters, body, (L._u(vin_ref[0:8, :]), jnp.int32(1))
            )
            out_ref[0:8, :] = (x + s).astype(jnp.int32)

        vin = jnp.arange(256 * ROWW, dtype=jnp.int32).reshape(256, ROWW)
        call = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, ROWW), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        jf = jax.jit(lambda v: call(v))
        return lambda: jf(vin)

    try:
        t1 = run(mk(N1))
        t2 = run(mk(N2))
        per = (t2 - t1) / (N2 - N1) * 1e9
        print(f"{name:36s} {per:9.1f} ns/op   (call {t1*1e3:.1f} / {t2*1e3:.1f} ms)", flush=True)
    except Exception as e:
        msg = str(e).splitlines()
        key = next((l for l in msg if "Mosaic" in l or "Not implemented" in l), msg[0] if msg else "?")
        print(f"{name:36s} FAIL {key[:120]}", flush=True)


def get16(v):
    def get(r0):
        return L._u(v[pl.ds(r0, 16), :])

    return get


def b_read16(i, x, s, v):
    t = get16(v)((s * 13 + 1) & 63)
    return x + t[0:8], (s * 5 + 1) & 0x7FFF


def b_roll_fresh16(i, x, s, v):
    t = get16(v)((s * 13 + 1) & 63)
    r = pltpu.roll(t, (-(s & 127)) % ROWW, axis=1)
    return x + r[0:8], (s * 5 + 1) & 0x7FFF


def b_align16(i, x, s, v):
    t = get16(v)((s * 13 + 1) & 63)
    r = L._align16(t, s & 127, s & 3)
    return x + r, (s * 5 + 1) & 0x7FFF


def b_read_win(i, x, s, v):
    r = L._read_win(get16(v), s & 32767)
    return x + r, (s * 5 + 1) & 0x7FFF


def b_rot_tile(i, x, s, v):
    return L._rot_tile(x, s & 4095), (s * 5 + 1) & 0x7FFF


def b_rot_words(i, x, s, v):
    return L._rot_words(x, s & 1023), (s * 5 + 1) & 0x7FFF


def b_mask(i, x, s, v):
    m = L._byte_mask_tile(s & 4095, (s * 3) & 4095)
    return x & m, (s * 5 + 1) & 0x7FFF


def b_splice(i, x, s, v):
    w = L._read_win(get16(v), s & 32767)
    m = L._byte_mask_tile(s & 4095, 64)
    return (x & ~m) | (w & m), (s * 5 + 1) & 0x7FFF


def b_fill(i, x, s, v):
    return L._fill_tile(x, (s & 4095) | 1), (s * 5 + 1) & 0x7FFF


def b_fill_splat(i, x, s, v):
    return L._fill_tile(x, 1 << (s & 1)), (s * 5 + 1) & 0x7FFF


def b_cond_readwin(i, x, s, v):
    w = jax.lax.cond(
        (s & 1) == 0,
        lambda: L._read_win(get16(v), s & 32767),
        lambda: L._rot_tile(x, s & 4095),
    )
    return x + w, (s * 5 + 1) & 0x7FFF


def b_nested_cond(i, x, s, v):
    def direct():
        def lit():
            return L._read_win(get16(v), s & 32767)

        def mat():
            return jax.lax.cond(
                (s & 2) == 0,
                lambda: L._rot_tile(x, s & 4095),
                lambda: L._read_win(get16(v), (s * 3) & 32767),
            )

        return jax.lax.cond((s & 1) == 0, lit, mat)

    def filled():
        P = jax.lax.cond(
            (s & 2) == 0,
            lambda: L._rot_tile(x, s & 4095),
            lambda: L._read_win(get16(v), s & 32767),
        )
        F = L._fill_tile(P, ((s & 4095) | 1))
        return L._rot_tile(F, (L.TB - (s & 4095)) % L.TB)

    w = jax.lax.cond((s & 7) == 7, filled, direct)
    m = L._byte_mask_tile(s & 4095, 64)
    return (x & ~m) | (w & m), (s * 5 + 1) & 0x7FFF


bench("dyn 16-row read", b_read16)
bench("roll on fresh 16-row read", b_roll_fresh16)
bench("_align16 (fresh read)", b_align16)
bench("_read_win", b_read_win)
bench("_rot_tile", b_rot_tile)
bench("_rot_words", b_rot_words)
bench("_byte_mask_tile", b_mask)
bench("read_win+mask splice", b_splice)
bench("_fill_tile general", b_fill)
bench("_fill_tile splat", b_fill_splat)
bench("cond(read_win, rot_tile)", b_cond_readwin)
bench("nested-cond move (1/8 fill)", b_nested_cond)
print("DONE", flush=True)
