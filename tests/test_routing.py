"""Raw-fallback encode fast-path tests (round 5).

The fast path must be invisible: identical bytes/sizes whether a kernel
cell takes the certain-fallback raw emit or the full pipeline.  Safety
hinges on the classifier (codecs/cascaded.py _fallback_certain) never
producing a false positive -- a partition flagged fallback that the
pipeline would actually compress would change emitted bytes.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from tpucomp.codecs import cascaded as cc
from tpucomp.core.options import CascadedOpts
from tpucomp.core.types import DataType

SUPPORTED = [
    (1, 0, True),
    (1, 1, True),
    (2, 0, True),
    (2, 1, True),
    (0, 1, True),
    (0, 2, True),
    (0, 0, False),
]


def _corpora(rng, b, c):
    """Partition batches spanning raw, compressible, and boundary regimes."""
    out = []
    # incompressible
    out.append(rng.integers(0, 256, (b, c), dtype=np.uint8))
    # highly structured int32 runs
    base = np.repeat(rng.integers(0, 100, (b, c // 128)), 32, axis=1).astype(np.int32)
    out.append(base.view(np.uint8).reshape(b, -1)[:, :c])
    # boundary straddlers: noisy ramps with per-row noise amplitude so some
    # rows compress marginally and some fall back by a hair
    n = c // 4
    amp = rng.integers(1, 2**28, (b, 1))
    ramp = (
        np.cumsum(rng.integers(-2, 3, (b, n)), axis=1)
        + (rng.integers(0, amp + 1, (b, n)) - amp // 2)
    ).astype(np.int32)
    out.append(ramp.view(np.uint8))
    # text-like bytes
    words = rng.integers(97, 122, (64, 8), dtype=np.uint8)
    idx = rng.integers(0, 64, (b, c // 8))
    out.append(words[idx].reshape(b, -1)[:, :c])
    return out


@pytest.mark.parametrize("nr,nd,bp", SUPPORTED)
@pytest.mark.parametrize("dt", [DataType.UCHAR, DataType.SHORT, DataType.INT])
def test_routing_flags_never_false_positive(rng, nr, nd, bp, dt):
    if 0 < nr < nd:
        pytest.skip("invalid layer combo")
    opts = CascadedOpts(chunk_size=1024, type=dt, num_rles=nr, num_deltas=nd, use_bp=bp)
    b, c = 24, 4096
    lengths = jnp.full((b,), c, jnp.int32)
    for data in _corpora(rng, b, c):
        dj = jnp.asarray(data)
        flags = np.asarray(cc._fallback_certain(dj, lengths, opts))
        comp, sizes = cc._compress_xla(dj, lengths, opts)
        comp = np.asarray(comp)
        actual_fb = comp[:, :3].sum(-1) == 0
        assert not (flags & ~actual_fb).any(), "classifier produced a false fallback"


def test_routing_flag_coverage_on_random(rng):
    """On incompressible data the classifier should flag (nearly) every
    partition -- this guards against silent coverage regressions."""
    opts = CascadedOpts()
    b, c = 16, 64 * 1024
    data = jnp.asarray(rng.integers(0, 256, (b, c), dtype=np.uint8))
    lengths = jnp.full((b,), c, jnp.int32)
    flags = np.asarray(cc._fallback_certain(data, lengths, opts))
    assert flags.all()


@pytest.mark.parametrize("b", [8, 11])
def test_kernel_flag_cond_bit_identical(rng, b):
    """Pallas encode (interpret) with the certain-fallback fast cells ON
    must emit the XLA path's exact bytes -- including rows with zero,
    truncating, and non-multiple lengths."""
    from tpucomp.kernels import cascaded_pallas as cp

    opts = CascadedOpts(chunk_size=1024)
    c = 8 * 1024
    for data in _corpora(rng, b, c):
        dj = jnp.asarray(data)
        lengths = np.full((b,), c, np.int32)
        lengths[1] = 0
        lengths[2] = 1000  # truncating, sub-chunk
        lengths[3] = 4097  # non-multiple of width
        lj = jnp.asarray(lengths)
        comp0, sizes0 = cc._compress_xla(dj, lj, opts)
        comp1, sizes1 = cp._compress_jit(dj, lj, opts, True, True)
        assert (np.asarray(sizes0) == np.asarray(sizes1)).all()
        assert (np.asarray(comp0) == np.asarray(comp1)).all()


def test_routed_roundtrip_mixed_batch(rng):
    """A batch interleaving fallback and pipeline partitions round-trips
    through the routed path."""
    opts = CascadedOpts()
    b, c = 32, 16 * 1024
    data = np.zeros((b, c), np.uint8)
    for i in range(b):
        if i % 3 == 0:
            col = np.repeat(rng.integers(0, 50, c // 4 // 16 + 1), 16)[: c // 4]
            data[i] = col.astype(np.int32).view(np.uint8)
        else:
            data[i] = rng.integers(0, 256, c, dtype=np.uint8)
    lj = jnp.full((b,), c, jnp.int32)
    comp, sizes = cc.compress(jnp.asarray(data), lj, opts)
    out, olens, stats = cc.decompress(comp, sizes, opts, c)
    assert (np.asarray(stats) == 0).all()
    assert (np.asarray(olens) == c).all()
    assert (np.asarray(out) == data).all()


def test_decode_identity_skip_bit_identical(rng):
    """Pallas decode (interpret) must match the XLA path exactly on
    pure-pipe partitions (where the r5 all-ones-counts identity skip
    fires), on runs data (where it must NOT fire), and on corrupt
    variants that straddle the detection condition."""
    from tpucomp.kernels import cascaded_pallas as cp

    opts = CascadedOpts(chunk_size=1024)
    b, c = 10, 8192
    n = c // 4
    # pure-pipe: noisy ramp compressible via delta+bitpack, no runs
    ramp = (
        np.cumsum(rng.integers(-2, 3, (b, n)), axis=1) * 64
        + rng.integers(0, 64, (b, n))
    ).astype(np.int32)
    runs = (
        np.repeat(rng.integers(0, 50, (b, n // 8)), 8, axis=1).astype(np.int32)
    )
    lj = jnp.full((b,), c, jnp.int32)
    for data in (ramp.view(np.uint8), runs.view(np.uint8)):
        comp, sizes = cc._compress_xla(jnp.asarray(data), lj, opts)
        comp = np.asarray(comp).copy()
        sizes = np.asarray(sizes).copy()
        assert (comp[:, :3].sum(-1) != 0).all()  # all pipeline-encoded
        comp[1, 40] ^= 0xA5  # corrupt a blob byte
        sizes[2] = 16        # truncate
        cj, sj = jnp.asarray(comp), jnp.asarray(sizes)
        o_xla = cc._decompress_xla(cj, sj, opts, c)
        o_pl = cp.decompress(cj, sj, opts, c, interpret=True)
        for name, a, bb in zip(("data", "len", "status"), o_xla, o_pl):
            assert (np.asarray(a) == np.asarray(bb)).all(), name
