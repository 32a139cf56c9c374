"""Profiling-hooks tests: trace capture and step timing."""

import glob
import os

import jax
import jax.numpy as jnp

from aecf_tpu.utils import StepTimer, named_scope, trace


def test_trace_writes_profile(tmp_path):
    log_dir = str(tmp_path / "trace")
    with trace(log_dir):

        @jax.jit
        def f(x):
            with named_scope("fusion_block"):
                return (x @ x.T).sum()

        jax.block_until_ready(f(jnp.ones((32, 32))))
    files = [
        p
        for p in glob.glob(os.path.join(log_dir, "**", "*"), recursive=True)
        if os.path.isfile(p)
    ]
    assert files, "no trace files written"
    assert any(os.path.getsize(p) > 0 for p in files)


def test_step_timer():
    t = StepTimer(warmup=2)

    @jax.jit
    def f(x):
        return x * 2

    r = jnp.ones((8,))
    for _ in range(6):
        with t.step() as s:
            r = f(r)
            s.result = r  # sync on the BODY's output, not a stale input
    assert len(t.times) == 4  # 6 - warmup 2
    assert t.mean_s > 0 and t.p50_s > 0


def test_step_timer_record_and_sync_modes():
    @jax.jit
    def f(x):
        return x + 1

    for sync in ("fetch", "block"):
        t = StepTimer(warmup=0, sync=sync)
        out = t.record(f, jnp.zeros((4,)))
        assert float(out[0]) == 1.0
        assert len(t.times) == 1 and t.times[0] > 0
    import pytest

    with pytest.raises(ValueError, match="sync"):
        StepTimer(sync="nope")
