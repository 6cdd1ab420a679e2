"""Randomized garbage-input parity: Pallas kernels vs the XLA paths.

The targeted kernel suites pin byte identity on valid and hand-corrupted
streams; this adds breadth on RANDOM garbage and random truncations --
the decode kernels must produce exactly the XLA paths' (data, lengths,
statuses) triple for any input, never crash, and never claim SUCCESS on
bytes the reference-validated XLA decoder rejects (reference OOB_CHECKING
obligations, src/LZ4Kernels.hiph:1004-1096, src/CascadedKernels.hiph:
1268-1433).  Runs in interpret mode on the CPU suite.
"""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))

import tpucomp.config as cfg
from tpucomp.codecs import cascaded as cc_xla
from tpucomp.codecs import lz4 as lz4_xla
from tpucomp.codecs import snappy as snp_xla
from tpucomp.core.options import CascadedOpts
from tpucomp.kernels import cascaded_pallas as ckp
from tpucomp.kernels import lz_pallas as lzp
from tpucomp.kernels import snappy_pallas as snp

CAP = 2048


def _garbage_batch(rng, b, cmax, valid_fn):
    """Mix of pure garbage, truncated-valid, and bit-flipped-valid streams."""
    comps = np.zeros((b, cmax), np.uint8)
    sizes = np.zeros((b,), np.int32)
    for i in range(b):
        kind = rng.integers(0, 3)
        if kind == 0:
            n = int(rng.integers(1, cmax + 1))
            comps[i, :n] = rng.integers(0, 256, n)
            sizes[i] = n
        else:
            raw = rng.integers(0, 64, CAP, dtype=np.uint8).tobytes()
            v = valid_fn(raw)
            n = min(len(v), cmax)
            comps[i, :n] = np.frombuffer(v[:n], np.uint8)
            if kind == 1:
                sizes[i] = max(1, n // int(rng.integers(2, 5)))  # truncation
            else:
                k = int(rng.integers(0, max(1, n - 1)))
                comps[i, k] ^= 1 << int(rng.integers(0, 8))  # bit flip
                sizes[i] = n
    return comps, sizes


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_lz_kernels_garbage_parity(seed):
    rng = np.random.default_rng(100 + seed)
    from oracles.lz4_oracle import lz4_compress_oracle
    from oracles.snappy_oracle import snappy_compress_oracle

    for name, mod, xla, enc in (
        ("lz4", lzp, lz4_xla, lambda r: lz4_compress_oracle(r, max_match=1 << 30)),
        ("snappy", snp, snp_xla, snappy_compress_oracle),
    ):
        comps, sizes = _garbage_batch(rng, 8, CAP + 600, enc)
        cj, sj = jnp.asarray(comps), jnp.asarray(sizes)
        gd, gl, gs = map(np.asarray, mod.decompress(cj, sj, CAP, interpret=True))
        cfg.use_pallas_kernels = False
        try:
            rd, rl, rs = map(np.asarray, xla.decompress(cj, sj, out_capacity=CAP))
        finally:
            cfg.use_pallas_kernels = None
        np.testing.assert_array_equal(gs, rs, err_msg=f"{name} statuses")
        np.testing.assert_array_equal(gl, rl, err_msg=f"{name} lengths")
        np.testing.assert_array_equal(gd, rd, err_msg=f"{name} data")


@pytest.mark.parametrize("seed", [0, 1])
def test_cascaded_kernel_garbage_parity(seed):
    rng = np.random.default_rng(200 + seed)
    opts = CascadedOpts(chunk_size=4096)
    cap = 8192

    def enc(raw):
        d = np.frombuffer(raw[: cap // 2].ljust(cap, b"\0"), np.uint8)[None, :]
        cfg.use_pallas_kernels = False
        try:
            c, s = cc_xla.compress(jnp.asarray(d), jnp.asarray([cap], dtype=jnp.int32), opts)
        finally:
            cfg.use_pallas_kernels = None
        return np.asarray(c)[0, : int(np.asarray(s)[0])].tobytes()

    cmax = cc_xla.partition_output_max(cap, opts)
    comps, sizes = _garbage_batch(rng, 6, cmax, enc)
    cj, sj = jnp.asarray(comps), jnp.asarray(sizes)
    gd, gl, gs = map(np.asarray, ckp.decompress(cj, sj, opts, cap, interpret=True))
    cfg.use_pallas_kernels = False
    try:
        rd, rl, rs = map(np.asarray, cc_xla.decompress(cj, sj, opts, cap))
    finally:
        cfg.use_pallas_kernels = None
    np.testing.assert_array_equal(gs, rs, err_msg="cascaded statuses")
    np.testing.assert_array_equal(gl, rl, err_msg="cascaded lengths")
    np.testing.assert_array_equal(gd, rd, err_msg="cascaded data")
