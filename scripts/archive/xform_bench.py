"""Micro-bench of the decode-wrapper data transforms (u8<->u32 + transpose).

Variants:
  inV0: bytes_to_units_le (4 strided u8 reads + shifts) + reshape/transpose
  inV1: lax.bitcast_convert_type + reshape/transpose
  outV0: transpose + units_to_bytes_le (shift/stack)
  outV1: transpose + bitcast u32->u8x4

Also checks bitcast little-endianness vs the shift path.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/xform_bench.py
"""
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_tpucomp"))
import jax, numpy as np, jax.numpy as jnp
from tpucomp.utils import bits

print("devices", jax.devices(), flush=True)
B, CMAX = 256, 131848
L_INW = 1152
SUB = 32
rng = np.random.default_rng(0)
comp = jnp.asarray(rng.integers(0, 256, (B, CMAX), dtype=np.uint8))
PAD = L_INW * SUB * 4 - CMAX


@jax.jit
def in_v0(c):
    cw = jnp.concatenate([c, jnp.zeros((B, PAD), jnp.uint8)], axis=1)
    w = bits.bytes_to_units_le(cw, 4).astype(jnp.uint32)
    return w.reshape(B, L_INW, SUB).transpose(0, 2, 1)


@jax.jit
def in_v1(c):
    cw = jnp.concatenate([c, jnp.zeros((B, PAD), jnp.uint8)], axis=1)
    w = jax.lax.bitcast_convert_type(cw.reshape(B, -1, 4), jnp.uint32)
    return w.reshape(B, L_INW, SUB).transpose(0, 2, 1)


L_OUT = 640
CAP = 16384
out = jnp.asarray(rng.integers(-(2**31), 2**31 - 1, (B, SUB, L_OUT), dtype=np.int64).astype(np.int32))


@jax.jit
def out_v0(o):
    elems = o.transpose(0, 2, 1).reshape(B, -1)[:, :CAP]
    return bits.units_to_bytes_le(elems.astype(jnp.uint32))


@jax.jit
def out_v1(o):
    elems = o.transpose(0, 2, 1).reshape(B, -1)[:, :CAP]
    return jax.lax.bitcast_convert_type(elems.astype(jnp.uint32), jnp.uint8).reshape(B, -1)


# correctness: bitcast == shift path (little-endian)
a = np.asarray(in_v0(comp[:2, :]))
bvar = np.asarray(in_v1(comp[:2, :]))
print("in bitcast LE match:", bool((a == bvar).all()), flush=True)
c0 = np.asarray(out_v0(out[:2]))
c1 = np.asarray(out_v1(out[:2]))
print("out bitcast LE match:", bool((c0 == c1).all()), flush=True)


def tput(name, fn, arg, nbytes, reps=24):  # sync-amortized
    r = fn(arg)
    jax.device_get(r.ravel()[:2])
    t0 = time.perf_counter()
    for _ in range(reps):
        r = fn(arg)
    jax.device_get(r.ravel()[:2])
    dt = (time.perf_counter() - t0) / reps
    print(f"XFORM {name}: {dt*1e3:7.2f} ms ({nbytes/1e9/dt:6.1f} GB/s)", flush=True)


tput("inV0 ", in_v0, comp, B * CMAX)
tput("inV1 ", in_v1, comp, B * CMAX)
tput("outV0", out_v0, out, B * CAP * 4)
tput("outV1", out_v1, out, B * CAP * 4)
print("DONE", flush=True)
