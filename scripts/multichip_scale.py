"""Multi-device scaling harness on the virtual CPU mesh.

Measures per-device GB/s and scaling efficiency for the sharded cascaded
AND lz4 codecs (BASELINE config 5 names both) over a >= 64 MB chunk batch,
with the ordered-gather correctness assertion intact.  Absolute numbers are
meaningless (CPU backend); the *ratio* across device counts exposes the
sharding/collective overhead structure.

Two scaling modes per codec:

  - strong: fixed total bytes, 1 / n/2 / n devices (the round-1..3 rows)
  - weak:   fixed bytes PER DEVICE, 1 / 2 / 4 / n devices -- separates the
    fixed dispatch/gather overhead from real sharding cost (VERDICT r3 #4)

Host-core caveat (the round-3 "efficiency collapse" diagnosis): this host
has a small fixed number of physical cores (os.cpu_count()), and the
virtual 8-device mesh oversubscribes them.  Aggregate speedup over 1
device therefore saturates at ~#cores for ANY device count >= #cores, so
"scaling efficiency" at 8 virtual devices is bounded by cores/8 even with
zero sharding overhead.  Each row records the absolute aggregate speedup
(the honest signal) alongside the per-device efficiency; the json carries
host_cores so readers can apply the bound.

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
from tpucomp.lowlevel.cascaded import CODEC as CASCADED
from tpucomp.lowlevel.lz4 import CODEC as LZ4
from tpucomp.parallel import sharding as sh

CHUNK = 64 * 1024
REPS = 3


def make_data(total_mb: int):
    b = total_mb * 2**20 // CHUNK
    rng = np.random.default_rng(0)
    raw = (
        np.repeat(rng.integers(0, 50, b * CHUNK // 4), rng.integers(1, 9, b * CHUNK // 4))
        .astype(np.int32)
        .tobytes()[: b * CHUNK]
    )
    data = jnp.asarray(np.frombuffer(raw, np.uint8).reshape(b, CHUNK))
    lengths = jnp.full((b,), CHUNK, jnp.int32)
    return data, lengths


def run(codec, opts, n_dev: int, data, lengths) -> dict:
    mesh = sh.make_mesh(jax.devices()[:n_dev])
    batch = ChunkBatch(data, lengths)
    total = int(lengths.sum())

    def enc():
        c = sh.sharded_compress(codec, batch, mesh, opts)
        jax.block_until_ready(c.data)
        return c

    comp = enc()  # warm (compile)
    t0 = time.perf_counter()
    for _ in range(REPS):
        comp = enc()
    enc_s = (time.perf_counter() - t0) / REPS

    def dec(gather):
        o, st = sh.sharded_decompress(codec, comp, CHUNK, mesh, opts, gather=gather)
        jax.block_until_ready(o.data)
        return o, st

    out, statuses = dec(True)  # warm
    t0 = time.perf_counter()
    for _ in range(REPS):
        out, statuses = dec(True)
    dec_s = (time.perf_counter() - t0) / REPS

    # gather-cost split: the same decompress leaving outputs row-sharded
    dec(False)
    t0 = time.perf_counter()
    for _ in range(REPS):
        dec(False)
    dec_nog_s = (time.perf_counter() - t0) / REPS

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
        "dec_gbps_nogather": round(gb / dec_nog_s, 5),
        "enc_gbps_per_dev": round(gb / enc_s / n_dev, 5),
        "dec_gbps_per_dev": round(gb / dec_s / n_dev, 5),
        "ordered_gather_ok": True,
    }


def annotate(rows, key_enc="enc_gbps", key_dec="dec_gbps"):
    base = rows[0]
    for r in rows:
        r["enc_speedup"] = round(r[key_enc] / base[key_enc], 2)
        r["dec_speedup"] = round(r[key_dec] / base[key_dec], 2)
        r["enc_scaling_eff"] = round(r[key_enc] / (base[key_enc] * r["devices"]), 3)
        r["dec_scaling_eff"] = round(r[key_dec] / (base[key_dec] * r["devices"]), 3)
    return rows


def main():
    n = len(jax.devices())
    cores = os.cpu_count()
    print(f"devices: {n} ({jax.devices()[0].platform}), host cores: {cores}", flush=True)

    codecs = {
        # (codec, opts, strong_total_mb, weak_mb_per_dev)
        # lz4's dense XLA formulation is slow on the CPU backend; smaller
        # footprints keep the harness bounded -- the RATIO is the signal
        "cascaded": (CASCADED, CascadedOpts(), 64, 32),
        "lz4": (LZ4, None, 8, 4),
    }

    doc = {
        "harness": "virtual CPU mesh (absolute GB/s not meaningful; ratios expose "
                   "sharding overhead).  host_cores bounds aggregate speedup: "
                   "virtual devices beyond the core count oversubscribe, so "
                   "scaling_eff at 8 devices caps at host_cores/8 even with zero "
                   "sharding cost -- read enc/dec_speedup against host_cores.",
        "host_cores": cores,
        "codecs": {},
    }

    for name, (codec, opts, strong_mb, weak_per_dev) in codecs.items():
        strong_rows = []
        data, lengths = make_data(strong_mb)
        for nd in sorted({1, max(1, n // 2), n}):
            r = run(codec, opts, nd, data, lengths)
            print(name, "strong", json.dumps(r), flush=True)
            strong_rows.append(r)
        annotate(strong_rows)

        weak_rows = []
        for nd in sorted({1, 2, max(1, n // 2), n}):
            data, lengths = make_data(weak_per_dev * nd)
            r = run(codec, opts, nd, data, lengths)
            r["mb_per_dev"] = weak_per_dev
            # weak-scaling efficiency: time should stay flat as devices and
            # data grow together => eff = T1/Tn = per-dev rate ratio
            print(name, "weak", json.dumps(r), flush=True)
            weak_rows.append(r)
        base = weak_rows[0]
        for r in weak_rows:
            r["enc_weak_eff"] = round(r["enc_gbps_per_dev"] / base["enc_gbps_per_dev"], 3)
            r["dec_weak_eff"] = round(r["dec_gbps_per_dev"] / base["dec_gbps_per_dev"], 3)

        doc["codecs"][name] = {"strong": strong_rows, "weak": weak_rows}

    # merge over the existing doc: preserve every section this harness does
    # not own (multihost rows from multihost_scale.py, the committed
    # diagnosis, any future keys) rather than allow-listing known ones
    path = os.path.join(os.path.dirname(__file__), "..", "MULTICHIP_SCALING.json")
    if os.path.exists(path):
        try:
            old = json.load(open(path))
            for key, val in old.items():
                if key not in ("harness", "host_cores", "codecs"):
                    doc[key] = val
        except Exception:
            pass
    with open(path, "w") as f:
        json.dump(doc, f, indent=1)
    print("wrote", os.path.abspath(path), flush=True)


if __name__ == "__main__":
    main()
