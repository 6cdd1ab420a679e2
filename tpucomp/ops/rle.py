"""Run-length-encode stage.

TPU-native re-expression of RunLengthEncodeGPU (reference
src/RunLengthEncodeGPU.hip:167-560) and the fused cascaded RLE blocks
(reference src/CascadedKernels.hiph:129-305).  Semantics match the reference:

  - values are the element of each run, counts are the run lengths
  - counts are uint16 (so inputs must hold < 65536 elements)
  - encode formulation: run *ends* are marked, end positions + 1 are
    adjacent-differenced to form counts (reference
    src/CascadedKernels.hiph:233-241)

Dense, gather-only formulation (cumsum + searchsorted; no scatters), so it
maps well onto the VPU.  Functions operate on a single fixed-size buffer
``x[E]`` with a traced valid count ``n``; batch via ``jax.vmap``.
"""

from __future__ import annotations

import jax.numpy as jnp

from tpucomp.utils import bits

RUN_DTYPE = jnp.uint16


def rle_encode(x, n):
    """Encode the valid prefix of ``x`` into runs.

    Returns (vals[E] like x, counts[E] uint16, num_runs int32).  Entries past
    ``num_runs`` are zero.
    """
    e = x.shape[-1]
    i = jnp.arange(e, dtype=jnp.int32)
    nxt = jnp.roll(x, -1)
    is_end = jnp.where(i == n - 1, True, (i < n - 1) & (x != nxt))
    ends, num_runs = bits.segment_positions(is_end, e)

    vals = x[ends]
    idx1 = (ends + 1).astype(jnp.int32)
    counts = (idx1 - jnp.roll(idx1, 1).at[0].set(0)).astype(RUN_DTYPE)

    run_valid = i < num_runs
    vals = jnp.where(run_valid, vals, 0).astype(x.dtype)
    counts = jnp.where(run_valid, counts, 0).astype(RUN_DTYPE)
    return vals, counts, num_runs


def rle_decode(vals, counts, num_runs, out_elements: int | None = None):
    """Expand runs back into elements.

    Returns (x[out_elements], total int32).  Mirrors block_rle_decompress
    (reference src/CascadedKernels.hiph:260-305).
    """
    e = vals.shape[-1] if out_elements is None else out_elements
    i = jnp.arange(vals.shape[-1], dtype=jnp.int32)
    c = jnp.where(i < num_runs, counts.astype(jnp.int32), 0)
    inc = jnp.cumsum(c)
    total = inc[-1]
    # starts[r] = sum(c[:r]); output position j belongs to run
    # searchsorted(inc, j, 'right'): first run whose inclusive end exceeds j.
    j = jnp.arange(e, dtype=jnp.int32)
    run_idx = jnp.searchsorted(inc, j, side="right").astype(jnp.int32)
    run_idx = jnp.minimum(run_idx, vals.shape[-1] - 1)
    x = jnp.where(j < total, vals[run_idx], 0).astype(vals.dtype)
    return x, total
