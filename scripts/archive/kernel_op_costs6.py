"""while_loop vs fori_loop and carry-shape effects (slope-based, jitted).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/kernel_op_costs6.py
"""
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_tpucomp"))
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpucomp.kernels import lz_pallas as L

print("devices", jax.devices(), flush=True)
ROWW = 128
N1, N2 = 8_000, 64_000


def run(f):
    jax.device_get(f())
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        r = f()
    jax.device_get(r)
    return (time.perf_counter() - t0) / reps


def bench(name, make_kernel):
    try:
        t1 = run(make_kernel(N1))
        t2 = run(make_kernel(N2))
        per = (t2 - t1) / (N2 - N1) * 1e9
        print(f"{name:46s} {per:9.1f} ns/it  (call {t1*1e3:.1f}/{t2*1e3:.1f} ms)", flush=True)
    except Exception as e:
        msg = str(e).splitlines()
        key = next((l for l in msg if "Mosaic" in l or "Not implemented" in l), msg[0] if msg else "?")
        print(f"{name:46s} FAIL {key[:120]}", flush=True)


def mk(iters, kind):
    def kernel(vin_ref, out_ref):
        x0 = L._u(vin_ref[0:8, :])

        if kind == "w_small":
            def cond(c):
                return c[1] < iters

            def body(c):
                x, s = c
                return x + 1, s + 1

            x, s = jax.lax.while_loop(cond, body, (x0, jnp.int32(0)))
        elif kind == "w_big":
            def cond(c):
                return c[1] < iters

            def body(c):
                a, s, b, cc, d, x, e = c
                return a + 1, s + 1, b + s, cc ^ s, d | 1, x + 1, e + 2

            a, s, b, cc, d, x, e = jax.lax.while_loop(
                cond, body,
                (jnp.int32(0), jnp.int32(0), jnp.int32(0), jnp.int32(0),
                 jnp.int32(0), x0, jnp.int32(0)),
            )
        elif kind in ("w_readwin", "w_full", "f_full"):
            def body_fn(c):
                p, o, rem, src, x, hlo = c
                rem = jnp.where(rem == 0, 4096, rem)
                h = o - hlo
                g = jnp.minimum(rem, L.TB - h)
                W = L._read_win(
                    lambda r0: L._u(vin_ref[pl.ds(r0, 16), :]),
                    (src - h + L.LEAD * 512) & 32767,
                )
                m = L._byte_mask_tile(h, g)
                x = (x & ~m) | (W & m)
                o, rem, src = o + g, rem - g, src + g
                if kind == "w_readwin":
                    # no store: just recycle the window so g never hits 0
                    hlo = jnp.where(o - hlo >= L.TB, hlo + L.TB, hlo)
                else:
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
            if kind == "f_full":
                p, o, rem, src, x, hlo = jax.lax.fori_loop(
                    0, iters, lambda i, c: body_fn(c), init
                )
            else:
                def cond(c):
                    return c[1] < iters * L.TB

                p, o, rem, src, x, hlo = jax.lax.while_loop(cond, body_fn, init)
            s = o
        out_ref[0:8, :] = x + L._u(jnp.zeros((8, ROWW), jnp.int32) + s)

    vin = jnp.arange(256 * ROWW, dtype=jnp.int32).reshape(256, ROWW)
    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((512, ROWW), jnp.uint32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    jf = jax.jit(lambda v: call(v))
    return lambda: jf(vin)


bench("while, (tile,scalar) carry, add", lambda n: mk(n, "w_small"))
bench("while, 7-item carry, adds", lambda n: mk(n, "w_big"))
bench("while, read_win+splice, no store", lambda n: mk(n, "w_readwin"))
bench("while, read_win+splice+flush", lambda n: mk(n, "w_full"))
bench("fori,  read_win+splice+flush", lambda n: mk(n, "f_full"))
print("DONE", flush=True)
