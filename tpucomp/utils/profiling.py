"""First-class timing and throughput instrumentation.

The reference ships no in-tree profiling (SURVEY.md §5); throughput is the
project north star, so walls and traces are built in here.  Through remote
device tunnels ``block_until_ready`` can return before execution finishes,
so ``wall`` forces completion with a tiny ``device_get``.
"""

from __future__ import annotations

import contextlib
import dataclasses
import time
from typing import Callable

import jax
import jax.numpy as jnp


def force(tree) -> None:
    """Force real completion of every array in ``tree``."""
    leaves = [x for x in jax.tree.leaves(tree) if hasattr(x, "dtype")]
    if leaves:
        jax.device_get(jnp.sum(leaves[-1].ravel()[:1]))


@dataclasses.dataclass
class WallResult:
    seconds: float
    bytes_processed: int = 0

    @property
    def gbps(self) -> float:
        return self.bytes_processed / 1e9 / self.seconds if self.seconds else 0.0


def wall(fn: Callable, *args, iters: int = 3, warmup: int = 1, bytes_processed: int = 0,
         **kwargs) -> WallResult:
    """Steady-state wall time of ``fn(*args)`` with forced completion."""
    out = None
    for _ in range(max(warmup, 1)):
        out = fn(*args, **kwargs)
    force(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kwargs)
    force(out)
    return WallResult((time.perf_counter() - t0) / iters, bytes_processed)


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace scope (view in TensorBoard / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    """Named region in profiler traces."""
    with jax.profiler.TraceAnnotation(name):
        yield
