"""Command-line file compression tool.

    python -m tpucomp.cli compress   -f lz4|snappy|cascaded IN OUT
    python -m tpucomp.cli decompress IN OUT
    python -m tpucomp.cli info       IN

Artifacts are the self-describing HLIF format, so ``decompress`` and
``info`` auto-detect the codec (create_manager).
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def _managers():
    from tpucomp.highlevel.manager import CascadedManager, LZ4Manager, SnappyManager

    return {"lz4": LZ4Manager, "snappy": SnappyManager, "cascaded": CascadedManager}


def cmd_compress(args) -> int:
    import jax

    payload = open(args.input, "rb").read()
    mgr = _managers()[args.format](uncomp_chunk_size=args.chunk_size)
    t0 = time.perf_counter()
    artifact, size = mgr.compress(payload)
    data = np.asarray(jax.device_get(artifact[:size]))
    dt = time.perf_counter() - t0
    open(args.output, "wb").write(data.tobytes())
    print(
        f"{args.input}: {len(payload)} -> {size} bytes "
        f"({len(payload)/max(size,1):.2f}x) in {dt:.2f}s [{args.format}]"
    )
    return 0


def cmd_decompress(args) -> int:
    import jax
    import jax.numpy as jnp

    from tpucomp.core.types import Status
    from tpucomp.highlevel.manager import create_manager

    blob = np.frombuffer(open(args.input, "rb").read(), np.uint8)
    artifact = jnp.asarray(blob)
    mgr = create_manager(artifact)
    t0 = time.perf_counter()
    out, statuses = mgr.decompress(artifact)
    data = np.asarray(jax.device_get(out))
    dt = time.perf_counter() - t0
    st = np.asarray(jax.device_get(statuses))
    if (st != int(Status.SUCCESS)).any():
        bad = int((st != int(Status.SUCCESS)).sum())
        print(f"error: {bad} chunk(s) failed to decompress", file=sys.stderr)
        return 1
    open(args.output, "wb").write(data.tobytes())
    print(f"{args.input}: {blob.size} -> {data.size} bytes in {dt:.2f}s")
    return 0


def cmd_info(args) -> int:
    from tpucomp.highlevel import headers as hdr

    blob = open(args.input, "rb").read(hdr.COMMON_HEADER_SIZE + 24)
    common = hdr.CommonHeader.unpack(blob)
    names = {
        v: k[len("FORMAT_"):].lower()
        for k, v in vars(hdr).items()
        if k.startswith("FORMAT_") and isinstance(v, int)
    }
    print(f"format:            {names.get(common.format, common.format)}")
    print(f"version:           {common.major_version}.{common.minor_version}")
    print(f"uncompressed:      {common.decomp_data_size} bytes")
    print(f"compressed data:   {common.comp_data_size} bytes (+{common.comp_data_offset} header)")
    print(f"chunks:            {common.num_chunks} x {common.uncomp_chunk_size}")
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="tpucomp")
    sub = p.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("compress")
    c.add_argument("-f", "--format", choices=["lz4", "snappy", "cascaded"], default="lz4")
    c.add_argument("-c", "--chunk-size", type=int, default=65536)
    c.add_argument("input")
    c.add_argument("output")
    c.set_defaults(fn=cmd_compress)

    d = sub.add_parser("decompress")
    d.add_argument("input")
    d.add_argument("output")
    d.set_defaults(fn=cmd_decompress)

    i = sub.add_parser("info")
    i.add_argument("input")
    i.set_defaults(fn=cmd_info)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
