#!/usr/bin/env python3
"""One-pass fused train step vs the two-pass kernels, on the real chip.

A/Bs ``build_chunk(impl='fused-step')`` (kernels.fused_pool_train_step:
forward + in-register loss + backward accumulators in ONE kv read) against
``impl='pallas'`` (two-pass: forward kernel + custom_vjp backward kernel,
kv read twice + pooled-out HBM round-trip) on the identical protocol
(quadratic + entropy loss, SGD).  The parameter trajectories match to f32
tolerance (tests/test_train_step_kernel.py); this measures what the fusion
BUYS: the analytic models say ~84MB -> ~40MB mandatory HBM traffic per
north-star step on a memory-bound kernel.

Within-run alternating windows, RTT-subtracted (aecf_tpu/measure.py);
writes docs/artifacts/step_ab.json.

Usage:  python benchmarks/step_ab.py [--quick] [--configs north-star large ...]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from bench import CONFIGS, enable_persistent_cache


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument(
        "--configs", nargs="+", default=["north-star", "large"],
        choices=list(CONFIGS),
    )
    ap.add_argument(
        "--features-dtype", default="float32",
        choices=["float32", "bfloat16", "int8"],
    )
    ap.add_argument("--kv-grad", action="store_true")
    ap.add_argument(
        "--out", default=os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "docs", "artifacts", "step_ab.json",
        )
    )
    args = ap.parse_args()
    enable_persistent_cache()

    from bench import ab_train_windows, build_chunk, cached_tunnel_rtt

    if jax.default_backend() != "tpu":
        print("needs the real chip (fused kernels)", file=sys.stderr)
        return 1

    K = 20 if args.quick else 150
    rounds = 3 if args.quick else 8
    calls_per_window = 1 if args.quick else 10
    rtt = cached_tunnel_rtt()

    run_id = f"rtt={rtt * 1e3:.2f}ms pid={os.getpid()}"
    sections = {}
    for name in args.configs:
        batch, modalities, embed, heads, _ = CONFIGS[name]
        chunks = {}
        for impl in ("pallas", "fused-step"):
            # The warm/trace call sits INSIDE the try: coverage gates can
            # fire at build time (supports_fused_step) OR at trace time
            # (e.g. int8 × kv_grad is rejected when the kernel traces), and
            # either should record a skipped impl, not crash the run.
            try:
                c, p, s = build_chunk(
                    batch, modalities, embed, heads, impl, K,
                    features_dtype=args.features_dtype,
                    kv_grad=args.kv_grad,
                )
                p, s, loss = c(p, s, jnp.int32(0))
                float(loss)  # compile + warm (value fetch = reliable sync)
            except ValueError as e:  # coverage gate (build or trace time)
                print(f"{name}/{impl}: {e}", file=sys.stderr)
                continue
            chunks[impl] = (c, p, s)

        def call(state, r):
            c, p, s = state
            for j in range(calls_per_window):
                p, s, loss = c(
                    p, s, jnp.int32((r * calls_per_window + j) * K)
                )
            return (c, p, s), loss

        res = ab_train_windows(
            chunks, batch, K * calls_per_window, rounds, rtt, call=call
        )
        medians = {m: statistics.median(v) for m, v in res.items()}
        section = {
            "config": {
                "batch": batch, "modalities": modalities, "embed": embed,
                "heads": heads, "features_dtype": args.features_dtype,
                "kv_grad": args.kv_grad, "steps_per_call": K,
                "calls_per_window": calls_per_window, "rounds": rounds,
            },
            "samples_per_sec_median": {
                m: round(v, 1) for m, v in medians.items()
            },
            "samples_per_sec_best": {
                m: round(max(v), 1) for m, v in res.items()
            },
            "windows": {m: [round(x, 1) for x in v] for m, v in res.items()},
        }
        if "pallas" in medians and "fused-step" in medians:
            section["fused_step_speedup_median"] = round(
                medians["fused-step"] / medians["pallas"], 3
            )
            section["fused_step_speedup_best"] = round(
                max(res["fused-step"]) / max(res["pallas"]), 3
            )
        section["run"] = run_id
        key = name
        if args.features_dtype != "float32":
            key += f"+{args.features_dtype}"
        if args.kv_grad:
            key += "+kv_grad"
        sections[key] = section
        print(json.dumps({key: section["samples_per_sec_median"]}))

    # Merge into the existing artifact (suite.py --only style): a partial
    # rerun updates only the sections it measured, so the file stays
    # reproducible by the tool that produces it.  When the merged file
    # holds sections from different runs, say so — cross-process
    # comparisons are meaningless on the tunnel (CLAUDE.md).
    out = {"tunnel_rtt_ms": round(rtt * 1e3, 2), "sections": sections}
    if os.path.exists(args.out):
        try:
            with open(args.out) as f:
                prev = json.load(f)
            merged = dict(prev.get("sections", {}))
            merged.update(sections)
            out["sections"] = merged
        except (json.JSONDecodeError, OSError):
            pass
    runs = {s.get("run", "unknown") for s in out["sections"].values()}
    if len(runs) > 1:
        out["note"] = (
            "sections were measured in SEPARATE processes (see per-"
            "section 'run'); within-section speedups are within-run and "
            "trustworthy, cross-section throughput comparisons are not "
            "(tunnel dispatch latency varies by process phase)"
        )
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(
        {
            name: s.get("fused_step_speedup_median")
            for name, s in sections.items()
        }
    ))
    return 0


if __name__ == "__main__":
    sys.exit(main())
