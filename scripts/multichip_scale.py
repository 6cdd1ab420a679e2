"""Multi-device scaling harness on the virtual CPU mesh.

Measures per-device GB/s and scaling efficiency for the sharded cascaded
codec at 1 / n/2 / n devices over a >= 64 MB chunk batch, with the
ordered-gather correctness assertion intact.  Absolute numbers are
meaningless (CPU backend); the *ratio* across device counts exposes the
sharding/collective overhead structure (VERDICT.md round-1 item 9).

Writes MULTICHIP_SCALING.json at the repo root (committed; echoed by
__graft_entry__.dryrun_multichip so the driver's record carries it).

Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 \
     PYTHONPATH=/root/repo:/root/.axon_site python scripts/multichip_scale.py
"""

import json
import os
import sys
import time

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tpucomp.core.chunking import ChunkBatch
from tpucomp.core.options import CascadedOpts
from tpucomp.core.types import Status
from tpucomp.lowlevel.cascaded import CODEC
from tpucomp.parallel import sharding as sh

TOTAL_MB = int(os.environ.get("SCALE_MB", "64"))
CHUNK = 64 * 1024


def run(n_dev: int, data, lengths) -> dict:
    mesh = sh.make_mesh(jax.devices()[:n_dev])
    opts = CascadedOpts()
    batch = ChunkBatch(data, lengths)
    total = int(lengths.sum())

    # warm (compile)
    comp = sh.sharded_compress(CODEC, batch, mesh, opts)
    jax.block_until_ready(comp.data)
    t0 = time.perf_counter()
    comp = sh.sharded_compress(CODEC, batch, mesh, opts)
    jax.block_until_ready(comp.data)
    enc_s = time.perf_counter() - t0

    out, statuses = sh.sharded_decompress(CODEC, comp, CHUNK, mesh, opts, gather=True)
    jax.block_until_ready(out.data)
    t0 = time.perf_counter()
    out, statuses = sh.sharded_decompress(CODEC, comp, CHUNK, mesh, opts, gather=True)
    jax.block_until_ready(out.data)
    dec_s = time.perf_counter() - t0

    st = np.asarray(jax.device_get(statuses))
    assert (st == int(Status.SUCCESS)).all()
    got = np.asarray(jax.device_get(out.data))
    assert (got == np.asarray(jax.device_get(data))).all(), "ordered gather mismatch"

    gb = total / 1e9
    return {
        "devices": n_dev,
        "total_mb": total // 2**20,
        "enc_gbps": round(gb / enc_s, 5),
        "dec_gbps": round(gb / dec_s, 5),
        "enc_gbps_per_dev": round(gb / enc_s / n_dev, 5),
        "dec_gbps_per_dev": round(gb / dec_s / n_dev, 5),
        "ordered_gather_ok": True,
    }


def main():
    n = len(jax.devices())
    print(f"devices: {n} ({jax.devices()[0].platform})", flush=True)
    b = TOTAL_MB * 2**20 // CHUNK
    rng = np.random.default_rng(0)
    raw = (
        np.repeat(rng.integers(0, 50, b * CHUNK // 4), rng.integers(1, 9, b * CHUNK // 4))
        .astype(np.int32)
        .tobytes()[: b * CHUNK]
    )
    data = jnp.asarray(np.frombuffer(raw, np.uint8).reshape(b, CHUNK))
    lengths = jnp.full((b,), CHUNK, jnp.int32)

    rows = []
    for nd in sorted({1, max(1, n // 2), n}):
        r = run(nd, data, lengths)
        print(json.dumps(r), flush=True)
        rows.append(r)

    base = rows[0]
    for r in rows:
        r["enc_scaling_eff"] = round(r["enc_gbps"] / (base["enc_gbps"] * r["devices"]), 3)
        r["dec_scaling_eff"] = round(r["dec_gbps"] / (base["dec_gbps"] * r["devices"]), 3)

    out = {
        "harness": "virtual CPU mesh (absolute GB/s not meaningful; ratios expose sharding overhead)",
        "codec": "cascaded default opts, 64KB chunks",
        "rows": rows,
    }
    path = os.path.join(os.path.dirname(__file__), "..", "MULTICHIP_SCALING.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", os.path.abspath(path), flush=True)


if __name__ == "__main__":
    main()
