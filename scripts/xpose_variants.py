"""Find the fastest XLA formulation of the cascaded wrapper transposes.

Decode input: bytes[bp, l_inw*32*4] -> words_cm[bp, 32, l_inw]
  (word j of partition at [j % 32, j // 32])
Decode output: out[bp, 32, l_out] -> elems row-major [bp, l_out*32]

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/xpose_variants.py
"""
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_tpucomp"))
import jax, numpy as np, jax.numpy as jnp

print("devices", jax.devices(), flush=True)
B, LW = 256, 1152  # 256 partitions x 1152x32 words = 37.7 MB
SUB = 32
rng = np.random.default_rng(0)
by = jnp.asarray(rng.integers(0, 256, (B, LW * SUB * 4), np.int64).astype(np.uint8))
cm = jnp.asarray(rng.integers(0, 1 << 30, (B, SUB, LW), np.int64).astype(np.int32))


def tm(name, f, *a):
    r = f(*a)
    jax.device_get(np.asarray(r).ravel()[:2] if not isinstance(r, jax.Array) else r.ravel()[:2])
    t0 = time.perf_counter()
    for _ in range(4):
        r = f(*a)
    jax.device_get(r.ravel()[:2])
    dt = (time.perf_counter() - t0) / 4
    mb = B * LW * SUB * 4 / 1e6
    print(f"{name}: {dt*1e3:7.2f} ms  ({mb/1e3/dt:6.2f} GB/s)", flush=True)
    return r


@jax.jit
def in_v1(by):  # current: bitcast words, then transpose
    w = jax.lax.bitcast_convert_type(by.reshape(B, LW * SUB, 4), jnp.int32)
    return w.reshape(B, LW, SUB).transpose(0, 2, 1)


@jax.jit
def in_v2(by):  # byte-level transpose then bitcast
    t = by.reshape(B, LW, SUB, 4).transpose(0, 2, 1, 3)
    return jax.lax.bitcast_convert_type(t, jnp.int32)


@jax.jit
def in_v3(by):  # grouped: transpose within 128-lane groups
    w = jax.lax.bitcast_convert_type(by.reshape(B, LW * SUB, 4), jnp.int32)
    return (
        w.reshape(B, LW // 128, 128, SUB).transpose(0, 3, 1, 2).reshape(B, SUB, LW)
    )


r1 = tm("in  v1 bitcast+xpose ", in_v1, by)
r2 = tm("in  v2 bytexpose+cast", in_v2, by)
r3 = tm("in  v3 grouped xpose ", in_v3, by)
print("in  v2==v1:", bool((r1 == r2).all()), " v3==v1:", bool((r1 == r3).all()), flush=True)


@jax.jit
def out_v1(cm):  # current: transpose then flatten
    return cm.transpose(0, 2, 1).reshape(B, LW * SUB)


@jax.jit
def out_v2(cm):  # byte-level via bitcast first
    t = jax.lax.bitcast_convert_type(cm, jnp.uint8)  # [B, SUB, LW, 4]
    return jax.lax.bitcast_convert_type(
        t.transpose(0, 2, 1, 3).reshape(B, LW * SUB, 4), jnp.int32
    ).reshape(B, LW * SUB)


@jax.jit
def out_v3(cm):
    return (
        cm.reshape(B, SUB, LW // 128, 128).transpose(0, 2, 3, 1).reshape(B, LW * SUB)
    )


o1 = tm("out v1 xpose+flatten ", out_v1, cm)
o2 = tm("out v2 byte-level    ", out_v2, cm)
o3 = tm("out v3 grouped       ", out_v3, cm)
print("out v2==v1:", bool((o1 == o2).all()), " v3==v1:", bool((o1 == o3).all()), flush=True)
print("DONE", flush=True)


# matmul-based transposes: contraction with a 32x32 one-hot is exact for
# byte planes (one nonzero term per output), and the MXU may beat the
# vector-unit transpose at these awkward shapes
I32 = jnp.eye(SUB, dtype=jnp.bfloat16)


@jax.jit
def in_v4(by):  # bf16 one-hot einsum per byte plane, then bitcast
    x = by.reshape(B, LW, SUB, 4)
    planes = [x[..., t].astype(jnp.bfloat16) for t in range(4)]
    outs = [
        jnp.einsum("bls,ks->bkl", p, I32, preferred_element_type=jnp.float32)
        .astype(jnp.uint8) for p in planes
    ]
    w = outs[0].astype(jnp.uint32)
    for t in range(1, 4):
        w = w | (outs[t].astype(jnp.uint32) << (8 * t))
    return w.astype(jnp.int32)


I32i = jnp.eye(SUB, dtype=jnp.int8)


@jax.jit
def in_v5(by):  # int8 one-hot einsum per byte plane
    x = by.reshape(B, LW, SUB, 4)
    outs = [
        jax.lax.dot_general(
            x[..., t].astype(jnp.int8), I32i,
            (((2,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).transpose(0, 2, 1)  # [B, LW, 32] -> [B, 32, LW]
        for t in range(4)
    ]
    w = outs[0].astype(jnp.uint32) & 0xFF
    for t in range(1, 4):
        w = w | ((outs[t].astype(jnp.uint32) & 0xFF) << (8 * t))
    return w.astype(jnp.int32)


r4 = tm("in  v4 bf16 einsum   ", in_v4, by)
print("in  v4==v1:", bool((r1 == r4).all()), flush=True)
r5 = tm("in  v5 int8 dot      ", in_v5, by)
print("in  v5==v1:", bool((r1 == r5).all()), flush=True)


@jax.jit
def in_v6(by):  # 32 strided slices + stack
    w = jax.lax.bitcast_convert_type(by.reshape(B, LW * SUB, 4), jnp.int32)
    w = w.reshape(B, LW, SUB)
    return jnp.stack([w[:, :, s] for s in range(SUB)], axis=1)


r6 = tm("in  v6 slices+stack  ", in_v6, by)
print("in  v6==v1:", bool((r1 == r6).all()), flush=True)


@jax.jit
def out_v6(cm):  # inverse: interleave 32 slices
    return jnp.stack([cm[:, s, :] for s in range(SUB)], axis=2).reshape(B, LW * SUB)


o6 = tm("out v6 slices+stack  ", out_v6, cm)
print("out v6==v1:", bool((o1 == o6).all()), flush=True)
