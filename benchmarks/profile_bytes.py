#!/usr/bin/env python3
"""Measured HBM-traffic decomposition for the fused fusion-pool step.

The analytic roofline (bench.step_cost_model) says the north-star step is
85-95% HBM-bound and that the kv stream dominates — which predicts bf16
feature storage should win ~1.3x.  Round 2/3 measured bf16 as a wash.
This tool measures where the time actually goes so that contradiction is
resolved with numbers instead of a model (round-3 verdict Weak #1/#2):

  1. ``read_bw``   — a minimal Pallas kernel that streams the exact same
     flattened (B, M*E) kv layout tile-by-tile and reduces it: the
     achievable HBM read bandwidth for this layout, f32 vs bf16.
  2. ``fwd``       — the fused forward alone (training=True), f32 vs bf16.
  3. ``step``      — the full train step (fwd+bwd+SGD), f32 vs bf16.
  4. ``compiled``  — XLA's own post-fusion cost analysis (bytes + flops per
     step) for each variant: an independent byte count to hold the
     analytic model against.

All timings are within-run alternating windows with the tunnel RTT
subtracted (CLAUDE.md measurement discipline).  Output: one JSON blob.

Usage: python benchmarks/profile_bytes.py [--quick] [--config north-star|large]
"""

from __future__ import annotations

import argparse
import functools
import json
import math
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CONFIGS = {
    "north-star": (4096, 3, 512, 1),
    "large": (8192, 4, 1024, 1),
}


def _rtt():
    from bench import cached_tunnel_rtt

    return cached_tunnel_rtt()


def _net(elapsed):
    from bench import net_window

    return net_window(elapsed, _rtt())


def _time_windows(chunks, rounds):
    """Alternate over {name: (callable, state)} chunks; callable(state) ->
    new state whose fetch forces sync.  Returns {name: [window_secs]},
    where each window is normalized to ONE chunk call's worth of time.

    RTT-adaptive (bench.py's rule): each timed window chains enough
    chunk calls to clear max(50ms, 20×RTT) with a single fetch — a
    window smaller than the (subtracted) RTT measures clamp artifacts,
    not the chip (bit this tool in a 62ms-RTT phase: 400-step windows
    reported 3TB/s)."""
    rtt = _rtt()
    target = max(0.05, 20.0 * rtt)
    # calibrate the fastest chunk to pick one shared calls-per-window
    calib = float("inf")
    for m in chunks:
        fn, st = chunks[m]
        t0 = time.perf_counter()
        st = fn(st)
        float(st)
        calib = min(calib, _net(time.perf_counter() - t0))
        chunks[m] = (fn, st)
    import math as _math

    cpw = max(1, _math.ceil(target / max(calib, 1e-6)))
    res = {m: [] for m in chunks}
    for _ in range(rounds):
        for m in chunks:
            fn, st = chunks[m]
            t0 = time.perf_counter()
            for _j in range(cpw):
                st = fn(st)
            float(st)  # value fetch: the only reliable sync through the tunnel
            res[m].append(_net(time.perf_counter() - t0) / cpw)
            chunks[m] = (fn, st)
    return res


# ---------------------------------------------------------------------------
# 1. Pure read-bandwidth probe
# ---------------------------------------------------------------------------


def _read_kernel(i_ref, x_ref, o_ref):
    # One pass over the tile; the scalar operand makes each scan iteration
    # non-hoistable.  f32 accumulate like the real kernels.
    o_ref[...] = (
        x_ref[...].astype(jnp.float32).sum(axis=-1, keepdims=True)
        + i_ref[0].astype(jnp.float32)
    )


def read_bw_chunk(x_flat, K):
    """K chained passes over ``x_flat`` (B, ME); returns secs/pass model
    input — the measured wall time divides by K outside."""
    B, ME = x_flat.shape
    TB = min(512, B)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B // TB,),
        in_specs=[
            pl.BlockSpec((TB, ME), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM)
        ],
        out_specs=[
            pl.BlockSpec((TB, 1), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM)
        ],
    )

    def one(acc, i):
        out = pl.pallas_call(
            _read_kernel,
            grid_spec=grid_spec,
            out_shape=(jax.ShapeDtypeStruct((B, 1), jnp.float32),),
        )(i.reshape(1), x_flat)[0]
        return acc + out[0, 0], 0.0

    @jax.jit
    def chunk(acc):
        acc, _ = jax.lax.scan(one, acc, jnp.arange(K, dtype=jnp.int32))
        return acc

    return chunk


# ---------------------------------------------------------------------------
# 2. Forward-only probe (training forward, no backward)
# ---------------------------------------------------------------------------


def fwd_chunk(params, query, kv, K):
    from aecf_tpu.kernels import fused_fusion_pool_shared

    def one(acc, i):
        rng = jax.random.fold_in(jax.random.key(42), i)
        out, w, mw, info = fused_fusion_pool_shared(
            params, query, kv, num_heads=1, rng=rng, training=True,
            base_mask_prob=0.15, precision="default", kv_grad=False,
        )
        # sequential carry so XLA can't hoist the body
        return acc + out[0, 0, 0] + info["entropy"][0, 0], 0.0

    @jax.jit
    def chunk(acc):
        acc, _ = jax.lax.scan(one, acc, jnp.arange(K, dtype=jnp.int32))
        return acc

    return chunk


# ---------------------------------------------------------------------------
# 4. Compiled (post-fusion) cost analysis
# ---------------------------------------------------------------------------


def compiled_cost(jitted, args):
    """(bytes/step, flops/step) as XLA's post-optimization cost analysis
    reports them — see bench.xla_cost_per_step for the While-body /
    Pallas-bytes caveats (single source of truth)."""
    from bench import xla_cost_per_step

    return xla_cost_per_step(jitted, args)


def _round_or_none(x):
    """cost_analysis can omit keys (NaN sentinel); keep the artifact
    JSON-valid instead of crashing round() after the measured run."""
    return None if math.isnan(x) else round(x)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--config", default="north-star", choices=CONFIGS)
    ap.add_argument("--impl", default="pallas",
                    choices=["pallas", "fused-step"],
                    help="step family for the 'step' phase: two-pass "
                    "kernels or the one-pass fused train step")
    ap.add_argument("--json", default=None)
    ap.add_argument(
        "--phases", default="read,fwd,step",
        help="comma-separated subset of read,fwd,step",
    )
    args = ap.parse_args()
    phases = set(args.phases.split(","))
    unknown = phases - {"read", "fwd", "step"}
    if unknown:
        # a typo'd phase would otherwise be skipped silently, exiting 0
        # with a partial artifact the user believes was re-measured
        raise SystemExit(f"unknown --phases {sorted(unknown)}; "
                         "choose from read,fwd,step")

    from bench import enable_persistent_cache

    enable_persistent_cache()

    B, M, E, H = CONFIGS[args.config]
    from bench import build_chunk
    from aecf_tpu.core.init import (
        init_attention_pool_params,
        init_fusion_query,
    )

    # Windows must dwarf the ~25ms tunnel RTT: at ~140us/step, K=600 gives
    # ~85ms windows — the subtracted-RTT residual is then a small fraction.
    K_read = 20 if args.quick else 600
    K_fwd = 20 if args.quick else 500
    K_step = 20 if args.quick else 400
    rounds = 3 if args.quick else 6

    out = {
        "config": f"B={B},M={M},E={E},H={H}",
        "impl": args.impl,
        "tunnel_rtt_ms": round(_rtt() * 1e3, 2),
        "peak_hbm_gbps": 819.0,
    }

    params = init_attention_pool_params(jax.random.key(0), E)
    query = init_fusion_query(jax.random.key(1), E)

    # ---- 1. read bandwidth ------------------------------------------------
    if "read" in phases:
        chunks = {}
        for name, dtype in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
            print(f"compiling read_bw {name}...", file=sys.stderr, flush=True)
            kv = jax.random.normal(
                jax.random.key(2), (B, M * E)
            ).astype(dtype)
            fn = read_bw_chunk(kv, K_read)
            acc = fn(jnp.float32(0))
            float(acc)
            chunks[name] = (fn, acc)
        windows = _time_windows(chunks, rounds)
        out["read_bw"] = {}
        for name, dtype in (("f32", 4), ("bf16", 2)):
            per_pass = statistics.median(windows[name]) / K_read
            gbps = B * M * E * dtype / per_pass / 1e9
            out["read_bw"][name] = {
                "bytes_per_pass": B * M * E * dtype,
                "us_per_pass": round(per_pass * 1e6, 2),
                "achieved_gbps": round(gbps, 1),
                "frac_of_peak": round(gbps / 819.0, 3),
            }
        print(f"read_bw: {out['read_bw']}", file=sys.stderr, flush=True)

    # ---- 2. forward only --------------------------------------------------
    if "fwd" in phases:
        chunks = {}
        fwd_fns = {}
        for name, dtype in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
            print(f"compiling fwd {name}...", file=sys.stderr, flush=True)
            kv = jax.random.normal(jax.random.key(2), (B, M, E)).astype(dtype)
            fn = fwd_chunk(params, query, kv, K_fwd)
            acc = fn(jnp.float32(0))
            float(acc)
            chunks[name] = (fn, acc)
            fwd_fns[name] = fn
        windows = _time_windows(chunks, rounds)
        out["fwd"] = {}
        for name in ("f32", "bf16"):
            per_step = statistics.median(windows[name]) / K_fwd
            out["fwd"][name] = {"us_per_step": round(per_step * 1e6, 2)}
        out["fwd"]["bf16_speedup"] = round(
            out["fwd"]["f32"]["us_per_step"]
            / out["fwd"]["bf16"]["us_per_step"], 3
        )

        # compiled byte/flop counts for the already-compiled forward chunks
        for name in ("f32", "bf16"):
            b, f = compiled_cost(fwd_fns[name], (jnp.float32(0),))
            out["fwd"][name]["compiled_bytes_per_step"] = _round_or_none(b)
            out["fwd"][name]["compiled_flops_per_step"] = _round_or_none(f)
        print(f"fwd: {out['fwd']}", file=sys.stderr, flush=True)

    # ---- 3. full train step ----------------------------------------------
    if "step" not in phases:
        print(json.dumps(out, indent=2))
        if args.json:
            with open(args.json, "w") as f:
                json.dump(out, f, indent=2)
        return
    chunks = {}
    built = {}
    for name, dt in (("f32", "float32"), ("bf16", "bfloat16")):
        print(f"compiling step {name}...", file=sys.stderr, flush=True)
        c, p, s = build_chunk(B, M, E, H, args.impl, K_step,
                              features_dtype=dt, kv_grad=False)
        p, s, loss = c(p, s, jnp.int32(0))
        float(loss)
        built[name] = (c, p, s)
        chunks[name] = built[name]

    # RTT-adaptive windows, normalized per chunk call (see _time_windows)
    rtt0 = _rtt()
    calib = float("inf")
    for m in chunks:
        c, p, s = chunks[m]
        t0 = time.perf_counter()
        p, s, loss = c(p, s, jnp.int32(0))
        float(loss)
        calib = min(calib, _net(time.perf_counter() - t0))
        chunks[m] = (c, p, s)
    cpw = max(1, math.ceil(max(0.05, 20.0 * rtt0) / max(calib, 1e-6)))
    res = {m: [] for m in chunks}
    for _ in range(rounds):
        for m in chunks:
            c, p, s = chunks[m]
            t0 = time.perf_counter()
            for _j in range(cpw):
                p, s, loss = c(p, s, jnp.int32(0))
            float(loss)
            res[m].append(_net(time.perf_counter() - t0) / cpw)
            chunks[m] = (c, p, s)
    out["step"] = {}
    for name in ("f32", "bf16"):
        per_step = statistics.median(res[name]) / K_step
        out["step"][name] = {"us_per_step": round(per_step * 1e6, 2)}
    out["step"]["bf16_speedup"] = round(
        out["step"]["f32"]["us_per_step"]
        / out["step"]["bf16"]["us_per_step"], 3
    )
    for name in ("f32", "bf16"):
        c, p, s = built[name]
        b, f = compiled_cost(c, (p, s, jnp.int32(0)))
        out["step"][name]["compiled_bytes_per_step"] = _round_or_none(b)
        out["step"][name]["compiled_flops_per_step"] = _round_or_none(f)

    # analytic model for reference (matched to the measured impl), plus
    # the pure-stream floor: analytic mandatory bytes at this run's OWN
    # measured read bandwidth — the "how far from speed-of-light" number
    # (round-4 verdict Weak #3).
    from bench import fused_step_cost_model, step_cost_model

    model = (
        fused_step_cost_model if args.impl == "fused-step"
        else step_cost_model
    )
    for name, fb in (("f32", 4), ("bf16", 2)):
        fl, by = model(B, M, E, H, kv_grad=False, feat_bytes=fb)
        out["step"][name]["analytic_bytes_per_step"] = by
        out["step"][name]["analytic_flops_per_step"] = fl
        bw = (
            out.get("read_bw", {}).get(name, {}).get("achieved_gbps")
        )
        if bw:
            floor_us = by / (bw * 1e9) * 1e6
            out["step"][name]["stream_floor_us"] = round(floor_us, 2)
            out["step"][name]["us_over_floor"] = round(
                out["step"][name]["us_per_step"] - floor_us, 2
            )

    print(json.dumps(out, indent=2))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
