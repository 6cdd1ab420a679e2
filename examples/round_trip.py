import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

"""End-to-end examples: low-level batch API, high-level manager, sharding.

Run: python examples/round_trip.py
"""

import numpy as np

from tpucomp import (
    CascadedOpts,
    LZ4Manager,
    cascaded_codec,
    create_manager,
    lz4_codec,
    pack_chunks,
    unpack_chunks,
)


def lowlevel_example():
    chunks = [(b"the quick brown fox " * 300)[:4096]] * 16
    batch = pack_chunks(chunks)
    comp = lz4_codec.compress(batch)
    out, statuses = lz4_codec.decompress(comp, out_capacity=batch.capacity)
    assert unpack_chunks(out) == chunks
    total = int(np.asarray(comp.lengths).sum())
    print(f"lz4 low-level: {sum(map(len, chunks))} -> {total} bytes")


def cascaded_example():
    cols = np.repeat(np.arange(1000, dtype=np.int32), 16)
    batch = pack_chunks([cols.tobytes()])
    comp = cascaded_codec.compress(batch, CascadedOpts())
    out, statuses = cascaded_codec.decompress(comp, batch.capacity)
    assert unpack_chunks(out)[0] == cols.tobytes()
    print(f"cascaded: {cols.nbytes} -> {int(np.asarray(comp.lengths)[0])} bytes")


def manager_example():
    payload = (b"self-describing artifact " * 4000)[:80_000]
    mgr = LZ4Manager(uncomp_chunk_size=16384)
    artifact, size = mgr.compress(payload)
    data, statuses = create_manager(artifact).decompress(artifact)
    assert np.asarray(data).tobytes() == payload
    print(f"manager: {len(payload)} -> {size} bytes, auto-detected format")


def sharding_example():
    import jax

    from tpucomp.parallel import sharding as sh

    mesh = sh.make_mesh()
    chunks = [bytes(np.random.default_rng(i).integers(0, 8, 2048, dtype=np.uint8)) for i in range(16)]
    batch = pack_chunks(chunks)
    comp = sh.sharded_compress(lz4_codec, batch, mesh, gather=True)
    out, statuses = sh.sharded_decompress(lz4_codec, comp, batch.capacity, mesh, gather=True)
    assert unpack_chunks(out) == chunks
    print(f"sharded over {mesh.devices.size} device(s): OK")


if __name__ == "__main__":
    lowlevel_example()
    cascaded_example()
    manager_example()
    sharding_example()
