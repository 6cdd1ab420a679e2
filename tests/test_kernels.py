"""Pallas kernel tests (interpret mode on CPU).

Validates the kernels against the dense-XLA reference paths; the TPU
compile/perf validation runs separately on hardware.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from tpucomp.kernels import bitpack_pallas as kbp


@pytest.mark.parametrize("bw_profile", ["mixed", "zero", "full"])
def test_pack_words_matches_reference(rng, bw_profile):
    b, e = 8, 256
    if bw_profile == "zero":
        bws = np.zeros(b, np.int32)
    elif bw_profile == "full":
        bws = np.full(b, 32, np.int32)
    else:
        bws = rng.integers(0, 33, b).astype(np.int32)
    ns = rng.integers(1, e + 1, b).astype(np.int32)
    u = np.zeros((b, e), np.uint32)
    for i in range(b):
        if bws[i]:
            hi = (1 << int(bws[i])) - 1
            u[i, : ns[i]] = rng.integers(0, 256, (ns[i], 4), dtype=np.uint8).view("<u4")[:, 0] & hi

    words = np.asarray(kbp.pack_words(jnp.asarray(u), jnp.asarray(ns), jnp.asarray(bws), interpret=True))

    # reference: python bit accumulator
    for i in range(b):
        acc = 0
        for k in range(ns[i]):
            acc |= int(u[i, k]) << (k * int(bws[i]))
        nw = (int(ns[i]) * int(bws[i]) + 31) // 32
        exp = np.frombuffer(acc.to_bytes(e * 4, "little"), "<u4")
        np.testing.assert_array_equal(words[i, :nw], exp[:nw], err_msg=f"row {i} bw={bws[i]}")

    # unpack round-trips
    out = np.asarray(kbp.unpack_words(jnp.asarray(words), jnp.asarray(bws), interpret=True))
    for i in range(b):
        if bws[i]:
            np.testing.assert_array_equal(out[i, : ns[i]], u[i, : ns[i]], err_msg=f"row {i}")


@pytest.mark.parametrize("width", [1, 2])
def test_unpack_narrow_element_streams(rng, width):
    """Narrow-element bitstreams unpack through the u32-word kernel (the
    caller reinterprets the byte stream as u32 words)."""
    import jax.numpy as jnp

    b, e = 4, 128
    tbits = width * 8
    udtype = np.dtype(f"u{width}")
    bws = rng.integers(1, tbits + 1, b).astype(np.int32)
    vals = np.zeros((b, e), udtype)
    words = np.zeros((b, e), np.uint32)
    for i in range(b):
        hi = (1 << int(bws[i])) - 1
        v = rng.integers(0, hi + 1, e).astype(udtype)
        vals[i] = v
        acc = 0
        for k in range(e):
            acc |= int(v[k]) << (k * int(bws[i]))
        words[i] = np.frombuffer(acc.to_bytes(e * 4, "little"), "<u4")
    out = np.asarray(kbp.unpack_words(jnp.asarray(words), jnp.asarray(bws), interpret=True))
    np.testing.assert_array_equal(out.astype(udtype), vals)


def test_pallas_integration_in_cascaded(rng, monkeypatch):
    """The config flags route the XLA cascaded codec's bitpack through the
    standalone Pallas kernels (interpret mode here); outputs must stay
    bit-identical.  The fused cascaded kernel is forced off so the XLA
    path (which hosts the bitpack dispatch) is the one exercised."""
    import jax.numpy as jnp

    from tpucomp import config as tc_config
    from tpucomp.codecs import cascaded as cc
    from tpucomp.core.options import CascadedOpts
    from tpucomp.kernels import cascaded_pallas as cp

    opts = CascadedOpts(chunk_size=512)
    x = np.repeat(rng.integers(0, 30, 200), rng.integers(1, 6, 200))[:256].astype(np.int32)
    data = np.zeros((1, 1024), np.uint8)
    data[0, : x.nbytes] = x.view(np.uint8)
    lengths = np.array([x.nbytes], np.int32)

    comp0, sizes0 = cc.compress(jnp.asarray(data), jnp.asarray(lengths), opts)
    try:
        monkeypatch.setattr(tc_config, "use_pallas_kernels", True)
        monkeypatch.setattr(tc_config, "BITPACK_STANDALONE_PALLAS", True)
        monkeypatch.setattr(cp, "supports", lambda *a, **k: False)
        monkeypatch.setattr(cp, "supports_decode", lambda *a, **k: False)
        cc._compress_xla.clear_cache()
        cc._decompress_xla.clear_cache()
        comp1, sizes1 = cc.compress(jnp.asarray(data), jnp.asarray(lengths), opts)
        np.testing.assert_array_equal(np.asarray(sizes1), np.asarray(sizes0))
        np.testing.assert_array_equal(np.asarray(comp1), np.asarray(comp0))
        out, lens, stats = cc.decompress(comp1, sizes1, opts, 1024)
        assert np.asarray(stats)[0] == 0
        assert np.asarray(out)[0, : np.asarray(lens)[0]].tobytes() == x.tobytes()
    finally:
        cc._compress_xla.clear_cache()
        cc._decompress_xla.clear_cache()
