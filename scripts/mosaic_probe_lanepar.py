"""Capability+cost probe for a LANE-PARALLEL LZ decode: 128 chunks in 128
lanes, per-lane stream positions, sublane gathers into interleaved streams.

Questions:
  P1: take_along_axis(x, idx, axis=0) on (8,128) / (16,128) / (32,128)
      with arbitrary traced per-lane idx -- lowers? cost?
  P2: gather over a tall (256,128) window via 8x (32,128) gathers + select
  P3: dynamic-sublane VMEM read of a (32,128) window at a traced row offset
  P4: per-lane byte extraction chain (word gather + shift) throughput
Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/mosaic_probe_lanepar.py
"""
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_tpucomp"))
import functools
import jax, numpy as np, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

print("devices", jax.devices(), flush=True)
R, L = 512, 128  # interleaved stream buffer: word j of chunk c at [j, c]


def run(name, kernel, reps_inner, x, idx):
    try:
        f = jax.jit(pl.pallas_call(
            kernel,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, L), jnp.int32),
        ))
        out = f(x, idx)
        jax.device_get(out.ravel()[:1])
        t0 = time.perf_counter()
        for _ in range(20):
            out = f(x, idx)
        jax.device_get(out.ravel()[:1])
        dt = (time.perf_counter() - t0) / 20
        print(f"P {name}: {dt*1e6/reps_inner:8.3f} us/op  (total {dt*1e3:.2f} ms)", flush=True)
    except Exception as e:
        lines = str(e).splitlines()
        key = next((l for l in lines if "Mosaic" in l or "NotImplemented" in l or "Unsupported" in l), lines[0] if lines else "?")
        print(f"P {name}: FAIL {key[:140]}", flush=True)


rng = np.random.default_rng(0)
x = jnp.asarray(rng.integers(0, 2**31, (R, L), np.int64).astype(np.int32))
idx = jnp.asarray(rng.integers(0, 8, (1, L), np.int64).astype(np.int32))


def k_gather(n, rows, x_ref, i_ref, o_ref):
    idx = i_ref[0:1, :] & (rows - 1)
    acc = jnp.zeros((1, L), jnp.int32)
    w = x_ref[0:rows, :]

    def body(t, carry):
        acc, idx = carry
        bi = jnp.broadcast_to((idx + t) & (rows - 1), w.shape)
        g = jnp.take_along_axis(w, bi, axis=0)[0:1]
        return acc + g, idx + 1

    acc, _ = jax.lax.fori_loop(0, n, body, (acc, idx))
    o_ref[...] = jnp.broadcast_to(acc, (8, L))


for rows in (8, 16, 32):
    run(f"P1 gather ({rows},{L})", functools.partial(k_gather, 512, rows), 512, x, idx)


def k_tall(n, x_ref, i_ref, o_ref):
    # gather over 256 rows: 8 gathers over 32-row windows + masked accumulate
    idx = i_ref[0:1, :] & 255
    acc = jnp.zeros((1, L), jnp.int32)

    def body(t, carry):
        acc, idx = carry
        cur = (idx + t) & 255
        g = jnp.zeros((1, L), jnp.int32)
        for wi in range(8):
            w = x_ref[wi * 32 : (wi + 1) * 32, :]
            gw = jnp.take_along_axis(w, jnp.broadcast_to(cur & 31, w.shape), axis=0)[0:1]
            g = jnp.where((cur >> 5) == wi, gw, g)
        return acc + g, idx + 1

    acc, _ = jax.lax.fori_loop(0, n, body, (acc, idx))
    o_ref[...] = jnp.broadcast_to(acc, (8, L))


run("P2 tall-256 gather", functools.partial(k_tall, 64), 64, x, idx)


def k_dynread(n, x_ref, i_ref, o_ref):
    # dynamic-sublane window read + gather within it
    idx = i_ref[0:1, :] & 31
    acc = jnp.zeros((1, L), jnp.int32)

    def body(t, carry):
        acc, idx = carry
        w = x_ref[pl.ds(jnp.sum(idx[0, 0:1]) & 255, 32), :]
        g = jnp.take_along_axis(w, jnp.broadcast_to((idx + t) & 31, w.shape), axis=0)[0:1]
        return acc + g, idx

    acc, _ = jax.lax.fori_loop(0, n, body, (acc, idx))
    o_ref[...] = jnp.broadcast_to(acc, (8, L))


run("P3 dyn window + gather", functools.partial(k_dynread, 256), 256, x, idx)


def k_parse(n, x_ref, i_ref, o_ref):
    # mock per-lane parse step: word gather, byte extract, branchless update
    idx = i_ref[0:1, :] & 31
    p = idx * 3
    acc = jnp.zeros((1, L), jnp.int32)
    w32 = x_ref[0:32, :]

    def body(t, carry):
        acc, p = carry
        wq = jnp.take_along_axis(w32, jnp.broadcast_to((p >> 2) & 31, w32.shape), axis=0)[0:1]
        tok = (wq >> (8 * (p & 3))) & 0xFF
        lnib = tok >> 4
        mnib = tok & 15
        adv = 3 + lnib + jnp.where(mnib == 15, 2, 1)
        return acc + tok, p + (adv & 63)

    acc, _ = jax.lax.fori_loop(0, n, body, (acc, p))
    o_ref[...] = jnp.broadcast_to(acc, (8, L))


run("P4 mock parse step", functools.partial(k_parse, 512), 512, x, idx)
print("DONE", flush=True)
