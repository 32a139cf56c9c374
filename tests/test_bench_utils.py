"""Unit tests for the shared benchmark-measurement helpers in bench.py.

The timed A/B sections themselves need the real chip (benchmarks/suite.py
--only ...), but the window discipline — alternation order, RTT
subtraction with its 90% clamp, None-chunk skipping, carry advancement —
is plain Python and load-bearing (CLAUDE.md "Measurement discipline"):
every suite A/B and the tile sweeps ride this one loop.
"""

from __future__ import annotations

import sys

import jax.numpy as jnp


def _fake_chunk(calls):
    def chunk(p, s, start):
        calls.append((float(p), float(s), int(start)))
        return p + 1, s + 1, jnp.float32(0.5)

    return chunk


def test_ab_train_windows_alternates_and_advances():
    from bench import ab_train_windows

    calls_a, calls_b = [], []
    chunks = {
        "a": (_fake_chunk(calls_a), jnp.float32(0), jnp.float32(0)),
        "b": (_fake_chunk(calls_b), jnp.float32(0), jnp.float32(0)),
        "failed": None,  # failed compile in a sweep: skipped, not crashed
    }
    K, rounds = 10, 3
    res = ab_train_windows(chunks, batch=4, steps_per_call=K,
                           rounds=rounds, rtt_s=0.0)

    assert set(res) == {"a", "b"}  # None entry skipped
    assert len(res["a"]) == len(res["b"]) == rounds
    assert all(v > 0 for v in res["a"] + res["b"])
    # each label timed once per round (alternating windows), with the
    # carry advanced between windows and the step counter at r*K
    assert [c[2] for c in calls_a] == [K, 2 * K, 3 * K]
    assert [c[0] for c in calls_a] == [0.0, 1.0, 2.0]
    # the advanced carry is written back into chunks
    assert float(chunks["a"][1]) == rounds


def test_ab_train_windows_rtt_clamp():
    """RTT larger than the window must not produce negative/absurd
    samples/s: the subtraction clamps at 90% of the raw window."""
    from bench import ab_train_windows

    chunks = {"x": (_fake_chunk([]), jnp.float32(0), jnp.float32(0))}
    res = ab_train_windows(chunks, batch=8, steps_per_call=2,
                           rounds=2, rtt_s=1e9)
    assert all(v > 0 for v in res["x"])


def test_suite_rejects_unknown_only_section():
    """A typo'd --only must fail loudly instead of writing an artifact
    that silently measured nothing (round-4 review finding)."""
    import subprocess

    proc = subprocess.run(
        [sys.executable, "benchmarks/suite.py", "--only", "serving-frozen"],
        capture_output=True, text=True, cwd="/root/repo", timeout=300,
    )
    assert proc.returncode != 0
    assert "not a section" in (proc.stderr + proc.stdout)
