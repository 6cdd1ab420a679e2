"""Which loop-body feature kills cross-grid-cell overlap?
Variants x grid sizes; each body ~= 3000 dependent steps."""
import functools, os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_tpucomp"))
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ITERS = 3000

def mk_kernel(variant):
    def kernel(x_ref, o_ref):
        v0 = x_ref[0].astype(jnp.int32) + pl.program_id(0)

        def chain(v):
            return pltpu.roll(v, 1, axis=1) * 3 + 1

        if variant == "fori":
            v = jax.lax.fori_loop(0, ITERS, lambda i, v: chain(v), v0)
        elif variant == "while":
            def cond(c): return c[0] < ITERS
            def body(c): return (c[0] + 1, chain(c[1]))
            _, v = jax.lax.while_loop(cond, body, (jnp.int32(0), v0))
        elif variant == "rmw":
            def body(i, v):
                r = jnp.sum(jnp.where((jax.lax.broadcasted_iota(jnp.int32, (1,128), 1) == 0), v[0:1], 0), dtype=jnp.int32) & 7
                cur = o_ref[0, pl.ds(r, 1), :].astype(jnp.int32)
                o_ref[0, pl.ds(r, 1), :] = (cur + v[0:1]).astype(o_ref.dtype)
                return chain(v)
            v = jax.lax.fori_loop(0, ITERS // 4, body, v0)
        elif variant == "rmw_while":
            def cond(c): return c[0] < ITERS // 4
            def body(c):
                i, v = c
                r = jnp.sum(jnp.where((jax.lax.broadcasted_iota(jnp.int32, (1,128), 1) == 0), v[0:1], 0), dtype=jnp.int32) & 7
                cur = o_ref[0, pl.ds(r, 1), :].astype(jnp.int32)
                o_ref[0, pl.ds(r, 1), :] = (cur + v[0:1]).astype(o_ref.dtype)
                return (i + 1, chain(v))
            _, v = jax.lax.while_loop(cond, body, (jnp.int32(0), v0))
        o_ref[0] = v
    return kernel

@functools.partial(jax.jit, static_argnames=("grid", "variant"))
def run(x, grid, variant):
    return pl.pallas_call(
        mk_kernel(variant),
        grid=(grid,),
        in_specs=[pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((grid, 8, 128), jnp.int32),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel",)),
    )(x)

print("devices", jax.devices(), flush=True)
for variant in ("fori", "while", "rmw", "rmw_while"):
    base = None
    for grid in (1, 2, 4):
        x = jnp.zeros((grid, 8, 128), jnp.int32)
        out = run(x, grid, variant); jax.device_get(out[0, 0, 0])
        t0 = time.perf_counter()
        for _ in range(30):
            out = run(x, grid, variant)
        jax.device_get(out[0, 0, 0])
        dt = (time.perf_counter() - t0) / 30
        if base is None: base = dt
        print(f"OVERLAP {variant:9s} grid={grid}: {dt*1e6:8.1f} us (x{dt/base:.2f})", flush=True)
print("DONE", flush=True)
