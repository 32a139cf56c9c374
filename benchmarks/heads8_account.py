#!/usr/bin/env python3
"""Account for heads8's MXU idle fraction with measurements, not
adjectives (round-4 verdict Weak #6).

The heads8 config (B=4096, M=3, E=512, H=8) dispatches to XLA and runs
at mfu≈0.61 under the analytic MXU-bound model — 39% of the MXU idle.
This tool decomposes that number on-chip:

  1. ``gemm_ceiling`` — a scan-chained pure GEMM of the exact shape the
     pool's projections run ((B, E) @ (E, E), default precision): the
     MFU the MXU can reach AT THIS SHAPE with nothing else in the
     program.  XLA pool GEMMs cannot beat this; the gap between it and
     1.0 is the shape/pipeline ceiling, not our structure.
  2. ``fwd`` — the XLA pool forward alone (attention_pool_core +
     curriculum mask): measured time vs its GEMM-flops prediction at
     the measured ceiling.
  3. ``step`` — the full train step (fwd+bwd+SGD, build_chunk 'xla'):
     same comparison with the backward's GEMM flops included.
  4. optionally a ``jax.profiler`` device trace (--trace DIR) for
     offline inspection; trace capture through the axon tunnel may be
     unsupported — its success/failure is recorded in the output either
     way.

The decomposition each phase reports: measured_us, gemm_us_at_ceiling
(its GEMM flops at the phase-1 ceiling), and slack_us — time not
explained by GEMMs at the achievable rate (VPU chains, layout changes,
fusion boundaries).  Writes/merges docs/artifacts/heads8_account.json.

Usage: python benchmarks/heads8_account.py [--quick] [--trace DIR]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import jax
import jax.numpy as jnp

B, M, E, H = 4096, 3, 512, 8
PEAK = 197e12  # v5e bf16 MXU peak FLOP/s


def _windows(fn, state, K, rounds, rtt):
    """Median net time for ONE chained-K chunk call; fetch-synced.

    RTT-adaptive (bench.py's rule): chains enough calls per timed
    window to clear max(50ms, 20×RTT) — a sub-RTT window measures the
    subtraction clamp, not the chip (first run of this tool in a 46ms
    phase reported a 1.41 'mfu')."""
    import math

    from bench import net_window

    t0 = time.perf_counter()
    state, fetch = fn(state)
    float(fetch)
    calib = net_window(time.perf_counter() - t0, rtt)
    cpw = max(1, math.ceil(max(0.05, 20.0 * rtt) / max(calib, 1e-6)))
    times = []
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _j in range(cpw):
            state, fetch = fn(state)
        float(fetch)
        times.append(
            net_window(time.perf_counter() - t0, rtt) / cpw
        )
    return statistics.median(times), state


def gemm_ceiling(K, rounds, rtt):
    """Chained (B, E) @ (E, E) GEMM at default precision — the MXU rate
    actually achievable at the pool's projection shape."""
    W = jax.random.normal(jax.random.key(0), (E, E)) * (E ** -0.5)
    x0 = jax.random.normal(jax.random.key(1), (B, E))

    @jax.jit
    def chunk(x):
        def body(x, _):
            return jnp.matmul(x, W, preferred_element_type=jnp.float32), None

        x, _ = jax.lax.scan(body, x, None, length=K)
        return x

    x = chunk(x0)
    float(x[0, 0])

    def call(x):
        x = chunk(x)
        return x, x[0, 0]

    t, _ = _windows(call, x, K, rounds, rtt)
    flops = 2.0 * B * E * E * K
    return {
        "us_per_gemm": round(t / K * 1e6, 2),
        "mfu": round(flops / t / PEAK, 4),
    }


def fwd_chunk(K, rounds, rtt):
    from aecf_tpu.core.attention import attention_pool_core
    from aecf_tpu.core.init import (
        init_attention_pool_params,
        init_fusion_query,
    )
    from aecf_tpu.core.masking import curriculum_mask

    params = init_attention_pool_params(jax.random.key(0), E)
    query = init_fusion_query(jax.random.key(1), E)
    kv = jax.random.normal(jax.random.key(2), (B, M, E))

    @jax.jit
    def chunk(acc):
        def body(acc, i):
            q = jnp.broadcast_to(query, (B, 1, E))
            out, w = attention_pool_core(
                params, q, kv + acc * 0.0, kv, num_heads=H,
                need_weights=True,
            )
            mw, info = curriculum_mask(
                w, key=jax.random.fold_in(jax.random.key(9), i),
                training=True,
            )
            return acc + out.mean() + mw.mean(), None

        acc, _ = jax.lax.scan(body, acc, jnp.arange(K))
        return acc

    acc = chunk(jnp.float32(0))
    float(acc)

    def call(acc):
        acc = chunk(acc)
        return acc, acc

    t, _ = _windows(call, acc, K, rounds, rtt)
    macs = (2 * M + 2) * B * E * E + 2 * B * M * E
    return {"us_per_step": round(t / K * 1e6, 2), "gemm_flops": 2 * macs}


def step_chunk(K, rounds, rtt):
    from bench import build_chunk

    c, p, s = build_chunk(B, M, E, H, "xla", K)
    p, s, loss = c(p, s, jnp.int32(0))
    float(loss)

    def call(state):
        p, s = state
        p, s, loss = c(p, s, jnp.int32(0))
        return (p, s), loss

    t, _ = _windows(call, (p, s), K, rounds, rtt)
    macs = (4 * M + 6) * B * E * E + 6 * B * M * E
    return {"us_per_step": round(t / K * 1e6, 2), "gemm_flops": 2 * macs}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--trace", default=None,
                    help="directory for a jax.profiler device trace of "
                    "one step chunk (absence of xplane output is "
                    "recorded, not fatal)")
    ap.add_argument(
        "--out", default=os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "docs", "artifacts", "heads8_account.json",
        )
    )
    args = ap.parse_args()

    from bench import cached_tunnel_rtt, enable_persistent_cache

    enable_persistent_cache()
    if jax.default_backend() != "tpu":
        print("needs the real chip", file=sys.stderr)
        return 1
    rtt = cached_tunnel_rtt()
    K = 40 if args.quick else 400
    rounds = 3 if args.quick else 6

    out = {
        "config": f"B={B},M={M},E={E},H={H}",
        "tunnel_rtt_ms": round(rtt * 1e3, 2),
    }
    print("measuring gemm ceiling...", file=sys.stderr, flush=True)
    out["gemm_ceiling"] = gemm_ceiling(
        K * 4 if not args.quick else K, rounds, rtt
    )
    print(json.dumps(out["gemm_ceiling"]), flush=True)
    print("measuring fwd...", file=sys.stderr, flush=True)
    out["fwd"] = fwd_chunk(K, rounds, rtt)
    print("measuring step...", file=sys.stderr, flush=True)
    out["step"] = step_chunk(K, rounds, rtt)

    # decomposition: GEMM time at the measured shape ceiling vs measured
    ceil_rate = out["gemm_ceiling"]["mfu"] * PEAK
    for phase in ("fwd", "step"):
        d = out[phase]
        gemm_us = d["gemm_flops"] / ceil_rate * 1e6
        d["gemm_us_at_ceiling"] = round(gemm_us, 2)
        d["slack_us"] = round(d["us_per_step"] - gemm_us, 2)
        d["slack_frac"] = round(d["slack_us"] / d["us_per_step"], 3)
        d["mfu"] = round(
            d["gemm_flops"] / (d["us_per_step"] * 1e-6) / PEAK, 4
        )

    if args.trace:
        from bench import build_chunk

        c, p, s = build_chunk(B, M, E, H, "xla", 40)
        p, s, loss = c(p, s, jnp.int32(0))
        float(loss)
        try:
            with jax.profiler.trace(args.trace):
                p, s, loss = c(p, s, jnp.int32(0))
                float(loss)
            produced = []
            for root, _dirs, files in os.walk(args.trace):
                produced += [f for f in files if f.endswith(".pb")
                             or "xplane" in f]
            out["trace"] = {
                "dir": args.trace,
                "files": produced[:8],
                "device_trace_captured": bool(produced),
            }
        except Exception as e:  # tunnel backends may not support tracing
            out["trace"] = {"error": str(e)[:300]}

    # merge-write
    prev = {}
    if os.path.exists(args.out):
        try:
            with open(args.out) as f:
                prev = json.load(f)
        except (json.JSONDecodeError, OSError):
            pass
    prev.update(out)
    with open(args.out, "w") as f:
        json.dump(prev, f, indent=1)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
