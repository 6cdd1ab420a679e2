"""Bisect the v2 decode kernel's per-iteration blowup.

Builds the decode loop up in stages on synthetic state (no real parse data
needed; correctness not asserted here — only timing):
  S0  copy-loop: literal move (read_win + splice + flush) only
  S1  + parse cond (synthetic scalar parse, no SMEM)
  S2  + match/fill cond tree (never taken)
  S3  + second unrolled move
  S4  + SMEM parse loads (byte_at) + LSIC while loops
  S5  full real kernel on random data (reference point)

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/lz4_dec_bisect.py
"""
import os, time, functools
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_tpucomp"))
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpucomp.kernels import lz_pallas as L

print("devices", jax.devices(), flush=True)
ROWW = 128
TB, LEAD = L.TB, L.LEAD
OUT_B = 1 << 20  # 1MB of output per call -> 256 granules


def mk(stage):
    rw = LEAD + 2048 + 16  # 1MB + slack of stream rows

    def kernel(wv_ref, out_ref, ws_ref, sem):
        if stage >= 4:
            cp = pltpu.make_async_copy(wv_ref.at[pl.ds(LEAD, 512)], ws_ref, sem)
            cp.start()
            cp.wait()

        def byte_at(q):
            qc = jnp.clip(q, 0, 512 * ROWW - 1) >> 2
            w = ws_ref[qc >> 7, qc & (ROWW - 1)]
            return (w >> (8 * (q & 3))) & 0xFF

        def get16(ref):
            def get(r0):
                return L._u(ref[pl.ds(r0, 16), :])

            return get

        def cond(c):
            return c[1] < OUT_B

        def move(o, rem_lit, lit_src, head, head_lo):
            h = o - head_lo
            g = jnp.minimum(jnp.minimum(rem_lit, TB - h), TB)
            g = jnp.where(g > 0, g, 0)
            if stage >= 2:
                def direct():
                    def lit():
                        return L._read_win(get16(wv_ref), lit_src - h + LEAD * 512)

                    def mat():
                        def mh():
                            return L._rot_tile(head, (lit_src - head_lo - h) % TB)

                        def mv():
                            return L._read_win(get16(out_ref), lit_src - h + LEAD * 512)

                        return jax.lax.cond(o > OUT_B, mh, mv)

                    return jax.lax.cond(rem_lit > 0, lit, mat)

                def filled():
                    P = jax.lax.cond(
                        o > OUT_B,
                        lambda: L._rot_tile(head, (lit_src - head_lo) % TB),
                        lambda: L._read_win(get16(out_ref), lit_src + LEAD * 512),
                    )
                    F = L._fill_tile(P, jnp.maximum(o - lit_src, 1))
                    return L._rot_tile(F, (TB - h) % TB)

                W = jax.lax.cond(o > 2 * OUT_B, filled, direct)
            else:
                W = L._read_win(get16(wv_ref), lit_src - h + LEAD * 512)
            m = L._byte_mask_tile(h, g)
            head = (head & ~m) | (W & m)
            o = o + g
            rem_lit = rem_lit - g
            lit_src = lit_src + g

            def flush(args):
                head, head_lo = args
                out_ref[pl.ds(LEAD + (head_lo >> 9), 8), :] = head
                return jnp.zeros((8, ROWW), jnp.uint32), head_lo + TB

            head, head_lo = jax.lax.cond(
                o - head_lo >= TB, lambda: flush((head, head_lo)),
                lambda: (head, head_lo),
            )
            return o, rem_lit, lit_src, head, head_lo

        def body(c):
            p, o, rem_lit, lit_src, head, head_lo = c
            if stage >= 1:
                def parse():
                    if stage >= 4:
                        t = byte_at(p)

                        def lsic(q0):
                            def wc(s):
                                q, acc = s
                                return (byte_at(q) == 255) & (q < 1 << 20)

                            def wb(s):
                                q, acc = s
                                return q + 1, acc + 255

                            q, acc = jax.lax.while_loop(wc, wb, (q0, jnp.int32(0)))
                            return q + 1, acc + byte_at(q)

                        qe, ext = jax.lax.cond(
                            t == 255, lambda: lsic(p + 1),
                            lambda: (p + 1, jnp.int32(0)),
                        )
                        nl = 4096 + (t & 0)
                        return qe + 1, nl, qe
                    return p + 7, jnp.int32(4096), p + 1

                np_, nl, nls = jax.lax.cond(
                    rem_lit == 0, parse, lambda: (p, rem_lit, lit_src)
                )
                rem_lit = jnp.where(rem_lit == 0, nl, rem_lit)
                lit_src = jnp.where(lit_src == 0, nls, lit_src)
                p = np_
            else:
                rem_lit = jnp.where(rem_lit == 0, 4096, rem_lit)
            o, rem_lit, lit_src, head, head_lo = move(o, rem_lit, lit_src, head, head_lo)
            if stage >= 3:
                o, rem_lit, lit_src, head, head_lo = move(
                    o, rem_lit, lit_src, head, head_lo
                )
            return (p, o, rem_lit, lit_src, head, head_lo)

        init = (jnp.int32(0), jnp.int32(0), jnp.int32(0), jnp.int32(0),
                jnp.zeros((8, ROWW), jnp.uint32), jnp.int32(0))
        c = jax.lax.while_loop(cond, body, init)
        out_ref[0:1, :] = L._u(jnp.zeros((1, ROWW), jnp.int32) + c[1])

    rt = LEAD + 2048 + 24
    vin = jnp.arange(rw * ROWW, dtype=jnp.int32).reshape(rw, ROWW)
    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((rt, ROWW), jnp.uint32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SMEM((512, ROWW), jnp.int32), pltpu.SemaphoreType.DMA],
    )
    jf = jax.jit(lambda v: call(v))
    return lambda: jf(vin)


for stage in range(5):
    try:
        f = mk(stage)
        jax.device_get(f())
        reps = 5
        t0 = time.perf_counter()
        for _ in range(reps):
            r = f()
        jax.device_get(r)
        dt = (time.perf_counter() - t0) / reps
        per_gran = dt / (OUT_B // TB) * 1e9
        print(f"S{stage}: {dt*1e3:7.2f} ms/call  {per_gran:8.0f} ns/granule  "
              f"{OUT_B/1e9/dt:6.2f} GB/s", flush=True)
    except Exception as e:
        msg = str(e).splitlines()
        key = next((l for l in msg if "Mosaic" in l or "Not implemented" in l), msg[0] if msg else "?")
        print(f"S{stage}: FAIL {key[:150]}", flush=True)
print("DONE", flush=True)
