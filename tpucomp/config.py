"""Runtime configuration flags.

``use_pallas_kernels``: route hot stages through the Pallas TPU kernels in
tpucomp.kernels instead of the dense-XLA formulations.

  - None (default): auto -- enabled on TPU backends once the kernel set is
    validated on hardware (currently resolves to False; flip
    PALLAS_VALIDATED after on-chip validation)
  - True / False: force
"""

from __future__ import annotations

use_pallas_kernels: bool | None = None

# Flipped when the kernels have passed on-hardware validation; keeps the
# auto mode safe on platforms where Mosaic lowering is untested.
# r2: fused cascaded compress+decompress validated byte-identical on a real
# v5e across layer configs, dtypes, and corrupt streams
# (scripts/casc_decode_hw.py), enc 2.08 GB/s dec 0.60 GB/s at 17 MB tiles.
PALLAS_VALIDATED = True



# Round-5 raw-fallback fast-path routing (codecs/cascaded.py): block-level
# lax.cond dispatch of certain-fallback partitions around the pipeline.
#   - None (default): enabled (all paths emit identical bytes; the router
#     only changes which path computes them)
#   - True / False: force (False restores single-dispatch, useful for A/B)
use_fastpath_routing: bool | None = None


def routing_enabled() -> bool:
    if use_fastpath_routing is not None:
        return use_fastpath_routing
    return True


def pallas_enabled() -> bool:
    if use_pallas_kernels is not None:
        return use_pallas_kernels
    if not PALLAS_VALIDATED:
        return False
    import jax

    return jax.default_backend() == "tpu"
