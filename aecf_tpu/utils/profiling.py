"""Profiling and tracing hooks (SURVEY.md §5 — absent in the reference;
TPU-native addition built on jax.profiler)."""

from __future__ import annotations

import contextlib
import time
from typing import Iterator

import jax
import jax.numpy as jnp

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


class _StepHandle:
    """Set ``result`` inside ``StepTimer.step()`` so the timer can
    synchronize on the step's OUTPUT before stopping the clock."""

    __slots__ = ("result",)

    def __init__(self):
        self.result = None


class StepTimer:
    """Wall-clock step timing with warmup discard and device sync.

    Usage::

        timer = StepTimer()
        for _ in range(n):
            with timer.step() as s:
                s.result = train_step(...)

    Assigning ``s.result`` lets the timer synchronize on the body's
    output before the clock stops (a ``result_to_block_on`` argument
    could only receive a PREVIOUS step's value — context-manager
    arguments are evaluated at entry).  Without it, only host-side
    dispatch time is measured, which for async jax is near-zero and
    meaningless.

    ``sync='fetch'`` (default) fetches one scalar element of the result —
    the only synchronization that is reliable through remote-dispatch
    transports, where ``block_until_ready`` can return before the device
    finishes; it costs one host↔device round trip per step.
    ``sync='block'`` uses ``block_until_ready`` only.  Per-step numbers
    include that round trip — for RTT-corrected long-window throughput
    use ``bench.ab_train_windows``.
    """

    def __init__(self, warmup: int = 3, *, sync: str = "fetch"):
        if sync not in ("fetch", "block"):
            raise ValueError(f"sync must be 'fetch' or 'block', got {sync!r}")
        self.warmup = warmup
        self.sync = sync
        self.times: list[float] = []
        self._seen = 0

    def _sync(self, result) -> None:
        jax.block_until_ready(result)
        if self.sync == "fetch":
            # one-element fetch from the first NON-EMPTY array leaf:
            # forces completion through transports where
            # block_until_ready returns early.  leaves[0] alone would
            # silently skip the fetch when it happens to be a Python
            # scalar (and crash on a zero-size array).
            for leaf in jax.tree_util.tree_leaves(result):
                if getattr(leaf, "size", 0):
                    float(jnp.reshape(leaf, (-1,))[0])
                    break

    @contextlib.contextmanager
    def step(self) -> Iterator[_StepHandle]:
        handle = _StepHandle()
        start = time.perf_counter()
        yield handle
        if handle.result is not None:
            self._sync(handle.result)
        elapsed = time.perf_counter() - start
        self._seen += 1
        if self._seen > self.warmup:
            self.times.append(elapsed)

    def record(self, fn, *args, **kwargs):
        with self.step() as s:
            out = fn(*args, **kwargs)
            s.result = out
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
