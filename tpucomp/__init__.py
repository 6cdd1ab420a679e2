"""tpucomp — TPU-native batched lossless compression.

A brand-new JAX/XLA/Pallas framework with the capabilities of hipCOMP-core
(nvCOMP 2.2 lineage): the batched LZ4, Snappy, and Cascaded (RLE + Delta +
BitPack) codec suite, the low-level batch API (sizing queries, async
compress/decompress, per-chunk statuses), and a self-describing high-level
manager format — re-designed for TPU hardware rather than ported from HIP.

Parity map: see PARITY.md.  Reference survey: SURVEY.md.
Version mirrors the reference library version (include/hipcomp.h:64-66).
"""

import jax as _jax

# The codec suite operates on u64 words / 64-bit element types
# (HIPCOMP_TYPE_LONGLONG et al.), which require x64 mode.  Enable it at
# import time, before any array is created.
_jax.config.update("jax_enable_x64", True)

__version__ = "2.2.0"

from tpucomp.core.types import DataType, Status  # noqa: E402
from tpucomp.core.options import (  # noqa: E402
    CascadedOpts,
    LZ4Opts,
    SnappyOpts,
)
from tpucomp.core.chunking import ChunkBatch, pack_chunks, unpack_chunks  # noqa: E402

__all__ = [
    "DataType",
    "Status",
    "CascadedOpts",
    "LZ4Opts",
    "SnappyOpts",
    "ChunkBatch",
    "pack_chunks",
    "unpack_chunks",
    "__version__",
]
