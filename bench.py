#!/usr/bin/env python3
"""Headline benchmark: fused fusion-pool fwd+bwd throughput on one chip.

Default config is the north star (BASELINE.md): embed_dim=512, 3 modalities,
batch 4096, 1 head — full forward+backward+SGD step with curriculum masking
and entropy loss, the same protocol as the measured PyTorch-CPU baseline
(8,884 samples/s single-thread).

Methodology notes:
  * Steps are chained on-device with ``lax.scan`` (K steps per dispatch):
    the axon TPU tunnel has variable per-dispatch latency (0.2-4 ms), which
    would otherwise swamp a ~300 us step.
  * The loss is ``(out²).mean() + entropy_loss`` rather than the baseline
    harness's ``out.sum()`` — XLA algebraically collapses sum-of-matmul,
    which would flatter the XLA path; the quadratic loss keeps the full
    backward honest (and is strictly MORE work than the baseline measured,
    so ``vs_baseline`` is conservative).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "samples/sec", "vs_baseline": N}

Flags:
  --quick                 fewer steps (CI smoke)
  --impl                  xla | pallas | auto   (auto: pallas on TPU)
  --config                north-star | quickstart | large | heads8
  --batch/--embed/--modalities/--heads   manual override
"""

from __future__ import annotations

import argparse
import json
import math
import sys
import time

import jax
import jax.numpy as jnp

CONFIGS = {
    # name: (batch, modalities, embed, heads, torch_cpu_baseline_sps)
    # Baselines: measured PyTorch-CPU throughput of the reference
    # implementation per config (BASELINE.md table).
    "north-star": (4096, 3, 512, 1, 8884.0),
    "quickstart": (32, 2, 512, 1, 5059.0),
    "large": (8192, 4, 1024, 1, 1515.0),
    "heads8": (4096, 3, 512, 8, 8620.0),
}


# Measurement core lives in the package (aecf_tpu/measure.py) so deployed
# users get the same discipline; re-exported here for the suite/profile
# tools and tests that do `from bench import ...`.
from aecf_tpu.measure import (  # noqa: E402,F401
    ab_train_windows,
    build_chunk,
    cached_tunnel_rtt,
    measure_tunnel_rtt,
    net_window,
)
from aecf_tpu.measure import (  # noqa: E402
    enable_persistent_cache as _enable_persistent_cache,
)


def enable_persistent_cache():
    """Package cache helper pinned to the repo's own warmed .jax_cache
    (bench/suite/profile runs must hit the programs warmed during the
    round, not a cold user cache)."""
    import os

    here = os.path.dirname(os.path.abspath(__file__))
    _enable_persistent_cache(os.path.join(here, ".jax_cache"))


# TPU v5e (the bench chip) peak specs, for roofline/MFU reporting.
# 197 TFLOP/s bf16 MXU, 819 GB/s HBM BW (public v5e datasheet numbers).
V5E_PEAK_FLOPS = 197e12
V5E_PEAK_HBM_BYTES = 819e9


def step_cost_model(batch, modalities, embed, heads, *, kv_grad,
                    feat_bytes=4):
    """Analytic (flops, hbm_bytes) per full train step on the FUSED path.

    Only valid for pallas-dispatched configs — the XLA path's per-sample
    K/V projection GEMMs cost ~(4M+4)·B·E² fwd, ~3.5x this model.

    Model of what actually executes per step (shared-query kernel fwd +
    fused bwd + XLA loss/optimizer glue); used to turn measured samples/s
    into MFU and HBM-bandwidth fractions so "is it actually fast" is a
    number in every bench artifact, not a docs aside.

    FLOPs (MACs × 2):
      fwd GEMMs: 2·B·E² (H=1: one fused W_vo GEMM) or 4·B·E² (H>1: Wv + Wo)
      bwd GEMMs: 2× the forward GEMM cost (d_mix and accumulator GEMMs)
      VPU scores/softmax/entropy/mask chains: ~14·B·M·E fwd+bwd combined
    HBM bytes (the usual bottleneck at these shapes):
      kv read twice (fwd + bwd): 2·B·M·E·feat_bytes
      d_kv write (only when kv_grad): B·M·E·feat_bytes
      out write (fwd) + out read (loss bwd): 2·B·E·4 — the quadratic
        loss's d_out is fused by XLA into the backward's input read, so
        it does not round-trip HBM separately
      side outputs w/mw/ent/rate + d_w: ~(5M+4)·B·4
      resident weights per kernel launch ≈ 2·E²·4 each (fwd, bwd)
      optimizer: read params+grads, write params: 3 × 4E² × 4
    """
    gemm = 1 if heads == 1 else 2
    fwd_gemm_flops = 2 * batch * embed * embed * gemm
    flops = 3 * fwd_gemm_flops + 14 * batch * modalities * embed
    kv_bytes = batch * modalities * embed * feat_bytes
    bytes_accessed = (
        2 * kv_bytes
        + (kv_bytes if kv_grad else 0)
        + 2 * batch * embed * 4
        + (5 * modalities + 4) * batch * 4
        + 2 * (2 * embed * embed * 4)
        + 3 * (4 * embed * embed) * 4
    )
    return flops, bytes_accessed


def fused_step_cost_model(batch, modalities, embed, heads, *, kv_grad,
                          feat_bytes=4):
    """Analytic (flops, hbm_bytes) per train step on the ONE-PASS fused
    step (``kernels.fused_pool_train_step``): forward, in-register loss,
    and backward accumulators in a single kv read.  vs the two-pass model
    (:func:`step_cost_model`): one kv stream instead of two, no pooled-out
    HBM round-trip (the loss and its d_out never leave VMEM), one resident
    weight-block launch instead of two.

    FLOPs match the kernel's ``pl.CostEstimate``: 6·B·E² GEMM MACs×2 is
    already folded in (fwd mix GEMM + d_mix GEMM + G accumulator GEMM) +
    ~24·B·M·E VPU chain fwd+bwd.
    HBM bytes:
      kv read once: B·M·E·feat_bytes  (+ d_kv write when kv_grad)
      padding-bias rows streamed in: B·M·4
      w/mw/entropy/rate side outputs: (2M+2)·B·4
      resident W_vo read + G/du/dvec accumulator writes: ~2·E²·4
      XLA weight-grad epilogue GEMM operands (E×E): ~6·E²·4
      optimizer read params+grads, write params: 3 × 4E² × 4
    """
    flops = 6 * batch * embed * embed + 24 * batch * modalities * embed
    kv_bytes = batch * modalities * embed * feat_bytes
    bytes_accessed = (
        kv_bytes
        + (kv_bytes if kv_grad else 0)
        + batch * modalities * 4
        + (2 * modalities + 2) * batch * 4
        + 2 * embed * embed * 4
        + 6 * embed * embed * 4
        + 3 * (4 * embed * embed) * 4
    )
    return flops, bytes_accessed


def _resident_e_cap():
    from aecf_tpu.kernels.shared_query import _RESIDENT_E_CAP

    return _RESIDENT_E_CAP


# Below ~30us/step the measurement reflects scan/launch overheads and
# XLA's small-batch optimizations (notably: the params+optimizer carry can
# be VMEM-promoted across the scan, so the all-HBM byte model overcounts),
# not the roofline.  Entries under this floor are flagged, not trusted.
DISPATCH_FLOOR_S = 30e-6


def roofline(samples_per_sec, batch, modalities, embed, heads, *,
             kv_grad, feat_bytes=4, impl="pallas"):
    """{'mfu': ..., 'hbm_frac': ...} at a measured throughput (v5e peaks).

    Entries are flagged rather than silently published when the model
    cannot be physical (round-3 verdict Weak #1): ``dispatch_bound`` when
    the config's modeled-or-measured step sits under the measurement
    floor, ``model_exceeds_roofline`` when the measured throughput
    implies >1.0 of a peak — both mean "this number is a diagnostic, not
    a utilization claim".
    """
    cost_model = (
        fused_step_cost_model
        if impl == "fused-step"
        else streamed_step_cost_model
        if embed > _resident_e_cap()
        else step_cost_model
    )
    flops, bytes_accessed = cost_model(
        batch, modalities, embed, heads,
        kv_grad=kv_grad, feat_bytes=feat_bytes,
    )
    steps_per_sec = samples_per_sec / batch
    mfu = flops * steps_per_sec / V5E_PEAK_FLOPS
    hbm_frac = bytes_accessed * steps_per_sec / V5E_PEAK_HBM_BYTES
    out = {
        "mfu": round(mfu, 4),
        "hbm_frac": round(hbm_frac, 4),
        "flops_per_step": flops,
        "hbm_bytes_per_step": bytes_accessed,
    }
    if cost_model is streamed_step_cost_model:
        out["model"] = "streamed-analytic"
    elif cost_model is fused_step_cost_model:
        out["model"] = "fused-step-analytic"
    t_min = max(
        flops / V5E_PEAK_FLOPS, bytes_accessed / V5E_PEAK_HBM_BYTES
    )
    measured_step = 1.0 / steps_per_sec
    if t_min < DISPATCH_FLOOR_S or measured_step < DISPATCH_FLOOR_S:
        out["dispatch_bound"] = True
        out["note"] = (
            "step below the ~30us measurement floor: throughput reflects "
            "scan/launch overheads and XLA small-batch optimizations "
            "(params+optimizer carry VMEM-promoted across the scan), not "
            "the roofline"
        )
    if hbm_frac > 1.0 or mfu > 1.0:
        out["model_exceeds_roofline"] = True
        out.setdefault(
            "note",
            "measured throughput exceeds the analytic all-HBM byte "
            "model's bound — the model overcounts for this config (XLA "
            "keeps part of the working set in VMEM); treat the fraction "
            "as model error, not utilization",
        )
    return out


def xla_cost_per_step(jitted, args):
    """(bytes/step, flops/step) from XLA's post-optimization cost
    analysis of a jitted K-step scan chunk.

    cost_analysis counts a While body ONCE regardless of trip count
    (verified on-chip: K=4 and K=400 chunks report identical totals), so
    the totals ARE per-step numbers for a scan-of-train-steps chunk — do
    not divide by K.  Custom-call (Pallas) ops contribute their
    ``pl.CostEstimate`` flops AND their operand/output bytes; bytes are
    summed per op, so values shared between ops (e.g. kv read by both the
    fwd and bwd kernel) count once per consumer — an upper-ish estimate
    of HBM traffic, not a lower bound."""
    ca = jitted.lower(*args).compile().cost_analysis()
    if isinstance(ca, list):  # older jax returns [dict]
        ca = ca[0]
    return (
        float(ca.get("bytes accessed", float("nan"))),
        float(ca.get("flops", float("nan"))),
    )


def xla_roofline(samples_per_sec, batch, jitted, args):
    """Roofline for XLA-dispatched configs (round-3 verdict Weak #5):
    the cost model is XLA's own post-fusion analysis of the compiled
    step, so heads>2 configs get an mfu/hbm_frac instead of 'n/a'."""
    bytes_per_step, flops_per_step = xla_cost_per_step(jitted, args)
    if math.isnan(bytes_per_step) or math.isnan(flops_per_step):
        # cost_analysis can omit keys (jax version / backend dependent);
        # report that instead of crashing after the measured run.
        return {
            "model": "xla-cost-analysis",
            "note": "cost_analysis omitted flops/bytes for this program; "
            "roofline unavailable",
        }
    steps_per_sec = samples_per_sec / batch
    mfu = flops_per_step * steps_per_sec / V5E_PEAK_FLOPS
    hbm_frac = bytes_per_step * steps_per_sec / V5E_PEAK_HBM_BYTES
    out = {
        "model": "xla-cost-analysis",
        "mfu": round(mfu, 4),
        "hbm_frac": round(hbm_frac, 4),
        "flops_per_step": round(flops_per_step),
        "hbm_bytes_per_step": round(bytes_per_step),
    }
    measured_step = 1.0 / steps_per_sec
    if measured_step < DISPATCH_FLOOR_S:
        out["dispatch_bound"] = True
    if hbm_frac > 1.0 or mfu > 1.0:
        out["model_exceeds_roofline"] = True
        out["note"] = (
            "XLA's bytes-accessed overcounts fused reuse for this "
            "config; treat as model error, not utilization"
        )
    return out


def xla_pool_step_cost_model(batch, modalities, embed, heads, *,
                             kv_grad, feat_bytes=4):
    """Analytic (flops, mandatory_hbm_bytes) per full train step on the
    XLA-dispatched pool path (``attention_pool_core`` + curriculum mask +
    quadratic/entropy loss + SGD — the exact ``build_chunk`` ``impl='xla'``
    step).

    FLOP side (exact — validated against XLA's post-fusion cost analysis,
    which reports 38.79e9 for heads8 vs 38.82e9 here, 0.07%):
      fwd GEMM MACs   (2M+2)·B·E²  — q/k/v in-proj (T=1, S=M) + out-proj
      bwd GEMM MACs   (2M+4)·B·E²  — dW for all four + d_context + d_query
                      (+2M·B·E² more when kv_grad: d_kv through Wk/Wv)
      attention contractions  6·B·M·E MACs fwd+bwd (scores, context)
      VPU mask/softmax/entropy chain ~14·B·M·E flops
    ``heads`` does not appear: the per-head GEMMs partition E exactly.

    Byte side is a fusion-independent LOWER BOUND ("mandatory traffic"),
    not a materialization model: XLA's fusion choices for the B·M·E
    intermediates (k/v projections, their gradients) are opaque and a
    count-every-operand model provably exceeds the physical roofline at
    the measured step time, i.e. overcounts (that is exactly what XLA's
    own bytes-accessed does here — kept alongside as a flagged
    cross-check).  What MUST cross HBM regardless of fusion:
      kv read fwd + read again bwd (dW_k/dW_v):  2·B·M·E·feat_bytes
      (+ d_kv write when kv_grad)
      out write + loss-bwd read:                  2·B·E·4
      w/mw/entropy/rate side outputs:             ~(5M+4)·B·4
      proj weights read fwd + bwd:                2·4E²·4
      optimizer param/grad streams (SGD):         3·4E²·4
    Configs this models are MXU-bound (t_flops > t_bytes under both this
    bound and XLA's overcount), so mfu is the utilization claim and
    hbm_frac is context.
    """
    macs_gemm = (4 * modalities + 6) * batch * embed * embed
    if kv_grad:
        macs_gemm += 2 * modalities * batch * embed * embed
    macs_attn = 6 * batch * modalities * embed
    flops = 2 * (macs_gemm + macs_attn) + 14 * batch * modalities * embed
    kv_bytes = batch * modalities * embed * feat_bytes
    bytes_mandatory = (
        2 * kv_bytes
        + (kv_bytes if kv_grad else 0)
        + 2 * batch * embed * 4
        + (5 * modalities + 4) * batch * 4
        + 2 * (4 * embed * embed) * 4
        + 3 * (4 * embed * embed) * 4
    )
    return flops, bytes_mandatory


def xla_pool_roofline(samples_per_sec, batch, modalities, embed, heads, *,
                      kv_grad, feat_bytes=4):
    """Roofline for XLA-dispatched pool configs (heads8) from the analytic
    model above: exact GEMM flops, mandatory-traffic byte lower bound.
    Replaces the bytes-overcounting ``xla_roofline`` entry as the primary
    number (round-4 ROADMAP item); callers keep ``xla_roofline`` nested as
    a cross-check."""
    flops, bytes_lb = xla_pool_step_cost_model(
        batch, modalities, embed, heads,
        kv_grad=kv_grad, feat_bytes=feat_bytes,
    )
    steps_per_sec = samples_per_sec / batch
    mfu = flops * steps_per_sec / V5E_PEAK_FLOPS
    hbm_frac = bytes_lb * steps_per_sec / V5E_PEAK_HBM_BYTES
    out = {
        "model": "analytic-mxu-bound",
        "mfu": round(mfu, 4),
        "hbm_frac": round(hbm_frac, 4),
        "flops_per_step": flops,
        "hbm_bytes_per_step": bytes_lb,
        "note": "flops exact (matches XLA cost analysis to <0.1%); "
        "hbm_bytes is the fusion-independent mandatory-traffic lower "
        "bound — this config is MXU-bound, mfu is the utilization claim",
    }
    if 1.0 / steps_per_sec < DISPATCH_FLOOR_S:
        out["dispatch_bound"] = True
    if mfu > 1.0 or hbm_frac > 1.0:
        out["model_exceeds_roofline"] = True
    return out


def streamed_step_cost_model(batch, modalities, embed, heads, *,
                             kv_grad, feat_bytes=4):
    """Analytic (flops, hbm_bytes) per train step on the STREAMED split
    (H ≤ 2, E > resident cap): Pallas one-pass-over-kv mix kernel + XLA
    context GEMMs, with the streamed backward (one kv pass, d_mix/G
    GEMMs in XLA).

    HBM terms: kv read twice (fwd + bwd kernels); the (B, H·E) mix
    round-trips twice (kernel write → GEMM read; d_mix GEMM write →
    kernel read); out/d_out once each; optional d_kv write; context
    weights (W_vo at H=1, Wv+Wo at H=2) read in fwd and bwd GEMMs plus
    the weight-grad GEMM outputs; optimizer read+read+write.
    """
    H = heads
    kv_bytes = batch * modalities * embed * feat_bytes
    mix_bytes = batch * H * embed * 4
    out_bytes = batch * embed * 4
    w_ctx = embed * embed * 4 * (1 if H == 1 else 2)
    gemm_flops = 2 * batch * embed * embed * (
        (1 + 2) if H == 1 else (2 + 5)  # fwd + bwd GEMM passes
    )
    if H == 1:
        gemm_flops += 2 * embed ** 3  # W_vo = Wo @ Wv precompute
    flops = gemm_flops + (14 + 6 * H) * batch * modalities * embed
    bytes_accessed = (
        2 * kv_bytes
        + (kv_bytes if kv_grad else 0)
        + 4 * mix_bytes
        + 2 * out_bytes
        + (5 * modalities + 4) * batch * 4
        + 3 * w_ctx  # fwd GEMM read + bwd GEMM read + grad write
        + 3 * (4 * embed * embed) * 4  # optimizer
    )
    return flops, bytes_accessed


def resolve_impl(heads: int, embed: int) -> str:
    """Auto-dispatch for the benched train step: the one-pass fused step
    kernel where it covers the config (H=1 resident shapes — measured
    1.55x the two-pass kernels at north star, benchmarks/step_ab.py;
    identical parameter trajectory, tests/test_train_step_kernel.py),
    else the library's own forward/backward dispatch rule (capability
    gate ∧ measured perf preference) so numbers reflect what
    ops.fusion_pool actually runs."""
    from aecf_tpu.kernels import (
        prefers_fused,
        supports_fused,
        supports_fused_step,
    )

    if jax.default_backend() != "tpu":
        return "xla"
    if supports_fused_step(heads, embed):
        return "fused-step"
    return "pallas" if (
        supports_fused(
            tgt_len=1, num_heads=heads, embed_dim=embed, shared_query=True
        )
        and prefers_fused(num_heads=heads)
    ) else "xla"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--impl", default="auto",
                    choices=["auto", "xla", "pallas", "fused-step"])
    ap.add_argument("--config", default="north-star", choices=CONFIGS)
    ap.add_argument("--batch", type=int)
    ap.add_argument("--embed", type=int)
    ap.add_argument("--modalities", type=int)
    ap.add_argument("--heads", type=int)
    ap.add_argument(
        "--features-dtype", default="float32",
        choices=["float32", "bfloat16"],
        help="kv feature storage dtype (bf16 halves the memory-bound "
        "roofline; params/weights/entropy stay f32)",
    )
    ap.add_argument(
        "--precision", default="default", choices=["default", "highest"],
        help="MXU precision of the big GEMMs. 'default' (headline) is "
        "single-pass bf16-input f32-accumulate — the standard TPU "
        "training configuration; 'highest' is multi-pass full-f32, the "
        "library API default chosen for torch-f32 parity "
        "(ops.fusion_pool precision=).  The suite's precision_ab section "
        "measures the gap.",
    )
    ap.add_argument(
        "--kv-grad", action="store_true",
        help="also compute/write the d_kv feature cotangent. Off by "
        "default to match the measured torch-CPU baseline protocol "
        "(benchmarks/baseline_torch.py feeds modal = torch.randn(...) "
        "without requires_grad, so torch autograd never computes d_kv "
        "either); enable when modelling trainable encoders under the pool.",
    )
    args = ap.parse_args()
    enable_persistent_cache()

    batch, modalities, embed, heads, baseline_sps = CONFIGS[args.config]
    overridden = any(
        v is not None and v != base
        for v, base in (
            (args.batch, batch), (args.embed, embed),
            (args.modalities, modalities), (args.heads, heads),
        )
    )
    if overridden:
        # a shape flag changes the workload: the named config's torch-CPU
        # baseline no longer measures the same thing — report no ratio
        # rather than a misleading one
        baseline_sps = None
    batch = args.batch or batch
    embed = args.embed or embed
    modalities = args.modalities or modalities
    heads = args.heads or heads

    impl = args.impl
    if impl == "auto":
        impl = resolve_impl(heads, embed)

    K = 10 if args.quick else 150
    rounds = 3 if args.quick else 6

    chunk, params, opt_state = build_chunk(
        batch, modalities, embed, heads, impl, K,
        features_dtype=args.features_dtype, kv_grad=args.kv_grad,
        precision=args.precision,
    )
    params, opt_state, loss = chunk(params, opt_state, jnp.int32(0))
    float(loss)  # compile + warmup (value fetch: the only reliable sync through the tunnel)

    import statistics

    # Fixed per-fetch transport cost — subtracted from every timed window.
    rtt = cached_tunnel_rtt()

    def window_sps(elapsed, steps):
        return batch * steps / net_window(elapsed, rtt)

    # Auto-size each timed window to >= max(50ms, 20×RTT) — the rule
    # aecf_tpu/tune.py already applies (round-4 verdict Weak #4: a ~12ms
    # K=150 window in a 28ms-RTT phase is dominated by the subtraction
    # and its noise, and short-window spread members implied >1.0 of the
    # chip's HBM peak).  K is compiled into the chunk's scan, so windows
    # grow by chaining MULTIPLE chunk calls with one final fetch (the
    # intermediate calls queue asynchronously), not by recompiling.
    calls_per_window = 1
    if not args.quick:
        calib = float("inf")
        for r in (1, 2):
            t0 = time.perf_counter()
            params, opt_state, loss = chunk(
                params, opt_state, jnp.int32(r * K)
            )
            float(loss)
            calib = min(calib, time.perf_counter() - t0)
        per_step = net_window(calib, rtt) / K
        target = max(0.05, 20.0 * rtt)
        calls_per_window = max(1, math.ceil(target / (per_step * K)))

    start = 3  # calibration consumed chunk starts 0..2
    steps_per_window = K * calls_per_window

    def timed_window(start, n_calls):
        nonlocal params, opt_state
        t0 = time.perf_counter()
        for j in range(n_calls):
            params, opt_state, loss = chunk(
                params, opt_state, jnp.int32((start + j) * K)
            )
        float(loss)  # value fetch forces device sync (block_until_ready does not through the tunnel)
        return time.perf_counter() - t0

    # Per-round timing (one fetch per window) ...
    round_sps = []
    for _ in range(rounds):
        elapsed = timed_window(start, calls_per_window)
        start += calls_per_window
        round_sps.append(window_sps(elapsed, steps_per_window))

    # ... plus one aggregate window (rounds windows' worth of steps,
    # single fetch), the most RTT-robust estimate.
    elapsed = timed_window(start, rounds * calls_per_window)
    aggregate_sps = window_sps(elapsed, rounds * steps_per_window)

    # Physicality guard on every reported member (round-4 verdict Weak
    # #4): a window whose throughput implies more than the chip's HBM
    # bandwidth or peak FLOP/s through the config's own analytic cost
    # model is a measurement artifact (an RTT-subtraction residual), not
    # a chip number — flag it and keep it out of the spread statistics.
    feat_bytes = 2 if args.features_dtype == "bfloat16" else 4
    if impl == "fused-step":
        _f, _b = fused_step_cost_model(
            batch, modalities, embed, heads, kv_grad=args.kv_grad,
            feat_bytes=feat_bytes,
        )
    elif impl == "pallas":
        _model = (
            streamed_step_cost_model
            if embed > _resident_e_cap()
            else step_cost_model
        )
        _f, _b = _model(
            batch, modalities, embed, heads, kv_grad=args.kv_grad,
            feat_bytes=feat_bytes,
        )
    else:
        _f, _b = xla_pool_step_cost_model(
            batch, modalities, embed, heads, kv_grad=args.kv_grad,
            feat_bytes=feat_bytes,
        )

    def physical(sps):
        steps = sps / batch
        return (
            _b * steps <= V5E_PEAK_HBM_BYTES
            and _f * steps <= V5E_PEAK_FLOPS
        )

    kept_sps = [s for s in round_sps if physical(s)]
    flagged = [round(s, 1) for s in round_sps if not physical(s)]
    if not kept_sps:  # every window flagged — report them, but say so
        kept_sps = round_sps

    # Headline = the aggregate window: with many windows' worth of steps
    # it is long enough that the (subtracted) RTT and its estimation noise
    # are a small fraction; short per-round windows after subtraction are
    # high-variance and reported only as spread.
    samples_per_sec = aggregate_sps
    result = {
        "metric": (
            f"fusion fwd+bwd samples/sec/chip "
            f"(B={batch}, M={modalities}, E={embed}, H={heads}, "
            f"impl={impl}, feats={args.features_dtype}, "
            f"kv_grad={args.kv_grad}, prec={args.precision}, "
            f"{jax.default_backend()})"
        ),
        "value": round(samples_per_sec, 1),
        "unit": "samples/sec",
        "vs_baseline": (
            round(samples_per_sec / baseline_sps, 2)
            if baseline_sps
            else None
        ),
        # The tunnel to the chip has phase-dependent dispatch latency
        # (docs/experiments.md): the spread shows how trustworthy the
        # best-window headline is for this particular run.
        "spread": {
            "median": round(statistics.median(kept_sps), 1),
            "min": round(min(kept_sps), 1),
            "max": round(max(kept_sps), 1),
            "rounds": len(round_sps),
            "aggregate": round(aggregate_sps, 1),
            "tunnel_rtt_ms": round(rtt * 1e3, 2),
            "steps_per_window": steps_per_window,
            "calls_per_window": calls_per_window,
            "median_vs_baseline": (
                round(statistics.median(kept_sps) / baseline_sps, 2)
                if baseline_sps
                else None
            ),
        },
    }
    if flagged:
        result["spread"]["superphysical_members"] = flagged
        result["spread"]["superphysical_note"] = (
            "windows implying > physical HBM/MXU peak through the "
            "config's cost model; measurement artifacts (RTT-subtraction "
            "residual), excluded from the spread statistics"
        )
    if not physical(aggregate_sps):
        result["spread"]["aggregate_superphysical"] = True
    if jax.default_backend() == "tpu" and impl in ("pallas", "fused-step"):
        # Roofline/MFU at the measured throughput — "is it actually fast"
        # as a number: fraction of v5e bf16 peak FLOP/s and of HBM
        # bandwidth implied by the analytic per-step cost model (the
        # resident fused model at E ≤ cap, the streamed-split model
        # above it — roofline() picks).  Entries carry dispatch_bound/
        # model_exceeds_roofline flags when the number is a diagnostic
        # rather than a utilization claim.
        result["roofline"] = roofline(
            samples_per_sec, batch, modalities, embed, heads,
            kv_grad=args.kv_grad,
            feat_bytes=2 if args.features_dtype == "bfloat16" else 4,
            impl=impl,
        )
    elif jax.default_backend() == "tpu" and impl == "xla":
        # XLA-dispatched configs (e.g. heads8): primary roofline from the
        # analytic MXU-bound model (exact GEMM flops + mandatory-traffic
        # byte lower bound — same as suite.py); XLA's own cost analysis
        # stays nested as a cross-check (its bytes-accessed overcounts
        # fused reuse ~2x).
        result["roofline"] = xla_pool_roofline(
            samples_per_sec, batch, modalities, embed, heads,
            kv_grad=args.kv_grad,
            feat_bytes=2 if args.features_dtype == "bfloat16" else 4,
        )
        result["roofline"]["xla_cost_analysis"] = xla_roofline(
            samples_per_sec, batch, chunk,
            (params, opt_state, jnp.int32(0)),
        )
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
