"""CLI round-trip coverage: compress -> info -> decompress through
tpucomp.cli.main(argv), per format, plus the corrupt-artifact error path.

The reference ships no CLI (its offline tooling is the share/ Python
scripts); this is part of tpucomp's Ls offline tier (SURVEY.md, PARITY.md).
"""

import numpy as np
import pytest

from tpucomp import cli


@pytest.fixture
def payload(rng):
    vals = np.repeat(rng.integers(0, 9, 5000), rng.integers(1, 9, 5000))[:16000]
    return vals.astype(np.uint8).tobytes() + b"tail" * 7


@pytest.mark.parametrize("fmt", ["lz4", "snappy", "cascaded"])
def test_cli_round_trip(tmp_path, payload, fmt, capsys):
    src = tmp_path / "in.bin"
    art = tmp_path / "out.tpc"
    dst = tmp_path / "back.bin"
    src.write_bytes(payload)
    assert cli.main(["compress", "-f", fmt, "-c", "4096", str(src), str(art)]) == 0
    assert cli.main(["info", str(art)]) == 0
    out = capsys.readouterr().out
    assert fmt in out and f"{len(payload)} bytes" in out
    assert cli.main(["decompress", str(art), str(dst)]) == 0
    assert dst.read_bytes()[: len(payload)] == payload


def test_cli_decompress_corrupt(tmp_path, payload, capsys, rng):
    src = tmp_path / "in.bin"
    art = tmp_path / "out.tpc"
    src.write_bytes(payload)
    assert cli.main(["compress", "-f", "lz4", str(src), str(art)]) == 0
    blob = bytearray(art.read_bytes())
    # scribble over the compressed data region, keep the header sane
    blob[len(blob) // 2 :] = rng.integers(0, 256, len(blob) - len(blob) // 2).astype(
        np.uint8
    ).tobytes()
    art.write_bytes(bytes(blob))
    dst = tmp_path / "back.bin"
    assert cli.main(["decompress", str(art), str(dst)]) == 1
    assert "failed to decompress" in capsys.readouterr().err
