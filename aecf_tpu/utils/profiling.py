"""Profiling and tracing hooks (SURVEY.md §5 — absent in the reference;
TPU-native addition built on jax.profiler)."""

from __future__ import annotations

import contextlib
import time
from typing import Iterator

import jax

__all__ = ["trace", "named_scope", "StepTimer"]


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/aecf_trace") -> Iterator[None]:
    """Capture an xprof/TensorBoard-viewable profiler trace."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


named_scope = jax.named_scope  # annotate regions inside jitted functions


class StepTimer:
    """Wall-clock step timing with warmup discard and device sync.

    Blocks on ready (`block_until_ready`) so async dispatch doesn't hide
    device time — use for benchmarking, not in the hot training loop.
    """

    def __init__(self, warmup: int = 3):
        self.warmup = warmup
        self.times: list[float] = []
        self._seen = 0

    @contextlib.contextmanager
    def step(self, result_to_block_on=None) -> Iterator[None]:
        start = time.perf_counter()
        yield
        if result_to_block_on is not None:
            jax.block_until_ready(result_to_block_on)
        elapsed = time.perf_counter() - start
        self._seen += 1
        if self._seen > self.warmup:
            self.times.append(elapsed)

    def record(self, fn, *args, **kwargs):
        with self.step() as _:
            out = fn(*args, **kwargs)
            jax.block_until_ready(out)
        return out

    @property
    def mean_s(self) -> float:
        return sum(self.times) / len(self.times) if self.times else float("nan")

    @property
    def p50_s(self) -> float:
        if not self.times:
            return float("nan")
        s = sorted(self.times)
        return s[len(s) // 2]
