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


def test_xla_pool_cost_model_matches_xla_cost_analysis():
    """The analytic flop model for the XLA-dispatched pool path must match
    XLA's own post-fusion count — that agreement is the evidence the
    heads8 roofline entry cites.  Checked against a freshly compiled
    build_chunk step (K=1, CPU) rather than hardcoded numbers."""
    import jax.numpy as jnp

    from bench import build_chunk, xla_pool_step_cost_model

    B, M, E, H = 256, 3, 128, 4
    chunk, p, s = build_chunk(B, M, E, H, "xla", 1)
    ca = chunk.lower(p, s, jnp.int32(0)).compile().cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    flops_xla = float(ca.get("flops", float("nan")))
    if flops_xla != flops_xla:  # cost_analysis may omit keys
        import pytest

        pytest.skip("cost_analysis omitted flops on this backend")
    flops_model, bytes_lb = xla_pool_step_cost_model(
        B, M, E, H, kv_grad=False
    )
    assert abs(flops_model - flops_xla) / flops_xla < 0.02
    # byte lower bound: strictly below XLA's overcounting bytes-accessed
    # and at least the two mandatory kv passes
    assert bytes_lb >= 2 * B * M * E * 4
    # kv_grad adds exactly the d_kv GEMM flops + its write
    f2, b2 = xla_pool_step_cost_model(B, M, E, H, kv_grad=True)
    assert f2 - flops_model == 2 * 2 * M * B * E * E
    assert b2 - bytes_lb == B * M * E * 4


def test_xla_pool_roofline_flags():
    from bench import xla_pool_roofline

    B, M, E, H = 4096, 3, 512, 8
    # plausible throughput: physical entry, no flags
    rl = xla_pool_roofline(16e6, B, M, E, H, kv_grad=False)
    assert 0 < rl["mfu"] <= 1.0 and 0 < rl["hbm_frac"] <= 1.0
    assert "model_exceeds_roofline" not in rl
    assert rl["model"] == "analytic-mxu-bound"
    # absurd throughput: must come back flagged, never silently >1.0
    rl = xla_pool_roofline(1e9, B, M, E, H, kv_grad=False)
    assert rl["model_exceeds_roofline"]
    # sub-floor step time: flagged dispatch_bound
    rl = xla_pool_roofline(1e9, 64, M, E, H, kv_grad=False)
    assert rl["dispatch_bound"]


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


def test_build_chunk_trajectory_parity_across_impls():
    """The three build_chunk impls (xla autodiff, two-pass pallas
    kernels, one-pass fused-step kernel) run the identical protocol:
    a 6-step SGD chunk must produce the same loss sequence and final
    params to f32 tolerance.  Hermetic: training=False (gradients are
    mask-draw-independent, quirks Q1/Q2) + Pallas interpreter — this is
    the multi-step lockstep the docs cite for the bench's '--impl auto'
    dispatch being trajectory-neutral."""
    import jax
    import numpy as np

    from bench import build_chunk

    B, M, E, H, K = 64, 3, 64, 1, 6
    finals = {}
    losses = {}
    for impl in ("xla", "pallas", "fused-step"):
        c, p, s = build_chunk(
            B, M, E, H, impl, K, precision="highest",
            training=False, interpret=True,
        )
        # run two chunks so the scan carry (params+opt) chains
        p, s, loss0 = c(p, s, jnp.int32(0))
        p, s, loss1 = c(p, s, jnp.int32(K))
        finals[impl] = p
        losses[impl] = (float(loss0), float(loss1))
    for impl in ("pallas", "fused-step"):
        np.testing.assert_allclose(
            losses[impl], losses["xla"], rtol=2e-5,
            err_msg=f"{impl} loss trajectory diverged from xla",
        )
        for x, y in zip(
            jax.tree_util.tree_leaves(finals[impl]),
            jax.tree_util.tree_leaves(finals["xla"]),
        ):
            np.testing.assert_allclose(
                np.asarray(x), np.asarray(y), atol=2e-5,
                err_msg=f"{impl} final params diverged from xla",
            )
