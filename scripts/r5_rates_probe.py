"""Round-5 probe 2: true device-side rates, decoupled from dispatch latency.

The r5_fastpath_probe "roofline" of ~25 GB/s for a plain slice copy is
suspicious: the harness dispatches one jitted call per iteration and each
host->device dispatch costs ~2.5 ms through the axon tunnel, so any op
faster than ~2.5 ms/64 MB reads as ~25 GB/s regardless of device speed.

This probe scales the work per dispatch (256 MB) and varies iters to
separate device time from dispatch overhead, for:
  - slice copy at byte offset 8 (the fallback fast-path shape, misaligned)
  - slice copy at offset 0 (aligned control)
  - identity copy (no slice)
  - current cascaded encode/decode on an ALL-FALLBACK corpus (random bytes)
  - current cascaded encode/decode on an ALL-PIPELINE corpus (structured)
The last two give the per-class cost split that routing arithmetic needs.
"""

from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_tpucomp"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tpucomp.codecs import cascaded as cc
from tpucomp.core.options import CascadedOpts


def rate(fn, *args, total_bytes, iters=8, label=""):
    out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[-1].ravel()[-1])
    for it in (iters, 4 * iters):
        t0 = time.perf_counter()
        for _ in range(it):
            out = fn(*args)
        jax.device_get(jax.tree_util.tree_leaves(out)[-1].ravel()[-1])
        dt = (time.perf_counter() - t0) / it
        print(f"  {label}: iters={it:3d}  {dt*1e3:8.3f} ms  "
              f"{total_bytes/1e9/dt:8.2f} GB/s")
    return out


def main():
    opts = CascadedOpts()
    chunk = 64 * 1024
    tile = 128
    nt = 32                      # 32 tiles x 8 MB = 256 MB per dispatch
    total = nt * tile * chunk
    rng = np.random.default_rng(7)

    # all-fallback corpus: random bytes
    rand = rng.integers(0, 256, size=total, dtype=np.uint8)
    # all-pipeline corpus: slowly-varying int32 columns with runs
    n = total // 4
    base = np.repeat(rng.integers(0, 1000, size=n // 64 + 1), 64)[:n]
    run = (base + rng.integers(0, 3, size=n)).astype(np.int32)
    struct = run.view(np.uint8)

    l = jnp.full((tile,), chunk, jnp.int32)
    enc_all = jax.jit(lambda ts: jax.lax.map(lambda t: cc.compress(t, l, opts), ts))
    dec_all = jax.jit(lambda cs, ss: jax.lax.map(
        lambda a: cc.decompress(a[0], a[1], opts, chunk), (cs, ss)))

    for name, buf in (("rand(all-fb)", rand), ("struct(all-pipe)", struct)):
        tiles = jnp.asarray(buf.reshape(nt, tile, chunk))
        print(f"== {name} 256MB ==")
        comps = rate(enc_all, tiles, total_bytes=total, label="enc")
        fbfrac = float((np.asarray(comps[0][:, :, :3]).sum(-1) == 0).mean())
        print(f"  fb fraction: {fbfrac:.4f}  ratio={total/float(np.asarray(comps[1]).sum()):.3f}")
        outs = rate(dec_all, comps[0], comps[1], total_bytes=total, label="dec")
        ok = bool((np.asarray(outs[0]).reshape(-1) == buf).all())
        print(f"  roundtrip ok={ok}")
        if name.startswith("rand"):
            pmax = comps[0].shape[-1]
            cp = jax.jit(lambda cs: jax.lax.map(lambda c: c[:, 8:8 + chunk], cs))
            rate(cp, comps[0], total_bytes=total, label="slice@8 ")
            cp0 = jax.jit(lambda cs: jax.lax.map(lambda c: c[:, :chunk], cs))
            rate(cp0, comps[0], total_bytes=total, label="slice@0 ")
            ident = jax.jit(lambda ts: jax.lax.map(lambda t: t + jnp.uint8(1), ts))
            rate(ident, tiles, total_bytes=total, label="ident+1 ")
            # int32-word view of the same misaligned slice
            cpw = jax.jit(lambda cs: jax.lax.map(
                lambda c: jax.lax.bitcast_convert_type(
                    c.reshape(tile, -1, 4), jnp.int32)[:, 2:2 + chunk // 4],
                cs))
            rate(cpw, comps[0], total_bytes=total, label="word@2  ")


if __name__ == "__main__":
    main()
