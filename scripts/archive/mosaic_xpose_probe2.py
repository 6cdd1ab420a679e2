"""Can Mosaic lower 2D transposes inside a Pallas TPU kernel, and how fast?

Probes jnp transposes of (128,32)->(32,128), (128,128), (256,256) i32 and
a full [32, L] <-> row-major relayout kernel built on them.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/mosaic_xpose_probe2.py
"""
import os, time, functools
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_tpucomp"))
import jax, numpy as np, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

print("devices", jax.devices(), flush=True)
rng = np.random.default_rng(0)


def run(name, shape_in, shape_out, kernel, reps_inner=1, check=None):
    x = jnp.asarray(rng.integers(0, 1 << 30, shape_in, np.int64).astype(np.int32))
    try:
        f = jax.jit(pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(shape_out, jnp.int32),
        ))
        out = f(x)
        jax.device_get(out.ravel()[:1])
        if check is not None and not check(np.asarray(x), np.asarray(out)):
            print(f"{name}: WRONG RESULT", flush=True)
            return
        t0 = time.perf_counter()
        for _ in range(10):
            out = f(x)
        jax.device_get(out.ravel()[:1])
        dt = (time.perf_counter() - t0) / 10
        nb = x.size * 4 * reps_inner
        print(f"{name}: {dt*1e6:9.1f} us  ({nb*10/ (dt*10) /1e9:6.2f} GB/s)", flush=True)
    except Exception as e:
        lines = str(e).splitlines()
        key = next((l for l in lines if "Mosaic" in l or "NotImplemented" in l or "nsupported" in l), lines[0] if lines else "?")
        print(f"{name}: FAIL {key[:120]}", flush=True)


def k_t(x_ref, o_ref):
    o_ref[...] = x_ref[...].T


run("T (128,32)->(32,128)", (128, 32), (32, 128), k_t,
    check=lambda x, o: (o == x.T).all())
run("T (32,128)->(128,32)", (32, 128), (128, 32), k_t,
    check=lambda x, o: (o == x.T).all())
run("T (128,128)", (128, 128), (128, 128), k_t,
    check=lambda x, o: (o == x.T).all())
run("T (512,512)", (512, 512), (512, 512), k_t,
    check=lambda x, o: (o == x.T).all())


# full relayout: words row-major [R, 128] -> cm [32, R*4]
# cm[s, l] = flat word 32*l + s;  per 128-lane group g: out[s, 128g+c] =
# in[32g + (c>>2), 32*(c&3) + s]
def mk_relayout(R):
    G = R // 32

    def kernel(x_ref, o_ref):
        for g in range(G):
            blk = x_ref[pl.ds(32 * g, 32), :]          # (32,128)
            t = blk.reshape(128, 32).T                  # hmm: reshape on regs
            o_ref[:, pl.ds(128 * g, 128)] = t

    return kernel


R = 1152
def np_check(x, o):
    w = x.reshape(-1)
    exp = w.reshape(-1, 32).T  # [32, R*4]
    return (o == exp).all()

run(f"relayout [{R},128]->[32,{R*4}]", (R, 128), (32, R * 4), mk_relayout(R),
    check=np_check)
print("DONE", flush=True)
