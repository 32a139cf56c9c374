#!/usr/bin/env python3
"""Product-path A/B: make_pool_scan_train_step impl='fused-step' vs the
two-pass kernel route, on the real chip.

This measures what the round-5 productization buys A LIBRARY USER (not
the bench harness): the X3 protocol — features → pool → trainable BCE
head → AdamW — through ``aecf_tpu.train.make_pool_scan_train_step``,
dispatching to the one-pass fused train-step kernel
(``impl='fused-step'``, head fused into the same kv pass) vs the
two-pass kernels behind autodiff (``impl='pallas'``).  Also runs the
head-less quadratic protocol for continuity with benchmarks/step_ab.py.

Within-run alternating windows, RTT-subtracted, ≥max(50ms, 20×RTT) per
window (chained chunk calls — the batches are staged once and reused, so
the measurement is chip time, not host staging).  Merges sections into
docs/artifacts/pool_step_ab.json.

Usage: python benchmarks/pool_step_ab.py [--quick] [--configs north-star large]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import statistics
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import jax
import jax.numpy as jnp

from bench import CONFIGS, enable_persistent_cache

C_CLASSES = 14  # the xray protocol's label width


def stage_batches(batch, modalities, embed, K, *, head):
    """Stage K copies of one batch on device ONCE (the chunk's per-step
    rng folds the global step counter, so every step still draws fresh
    masks).  PACKED (K, B, M·E) and 4-D
    (K, B, M, E) for the general per-step path (each impl is measured on
    its best available staging; the staged addressing IS part of the
    fused kernel's advantage)."""
    kv = jax.random.normal(
        jax.random.key(2), (batch, modalities * embed)
    )
    kv_packed = jax.device_put(jnp.broadcast_to(kv, (K,) + kv.shape) + 0.0)
    kv_4d = jax.device_put(
        kv_packed.reshape(K, batch, modalities, embed) + 0.0
    )
    lab_k = None
    if head:
        lab = (
            jax.random.uniform(jax.random.key(3), (batch, C_CLASSES))
            < 0.2
        ).astype(jnp.float32)
        lab_k = jax.device_put(
            jnp.broadcast_to(lab, (K,) + lab.shape) + 0.0
        )
    return kv_packed, kv_4d, lab_k


def build_product_chunk(embed, impl, *, head, precision="default"):
    """(chunk, state) for a K-step scan chunk through the PRODUCT
    builder."""
    import optax

    from aecf_tpu.train import (
        TrainState,
        init_pool_classifier_params,
        make_pool_scan_train_step,
    )

    params = init_pool_classifier_params(
        jax.random.key(0), embed, C_CLASSES if head else None
    )
    opt = optax.adamw(1e-4, weight_decay=0.01)
    state = TrainState(
        params, opt.init(params), jnp.zeros((), jnp.int32)
    )
    chunk = make_pool_scan_train_step(
        opt, impl=impl, precision=precision, donate=False,
        entropy_coeff=1.0,
    )
    return chunk, state


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument(
        "--configs", nargs="+", default=["north-star", "large"],
        choices=list(CONFIGS),
    )
    ap.add_argument("--precision", default="default",
                    choices=["default", "highest"])
    ap.add_argument(
        "--out", default=os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "docs", "artifacts", "pool_step_ab.json",
        )
    )
    args = ap.parse_args()
    enable_persistent_cache()

    from bench import cached_tunnel_rtt, net_window

    if jax.default_backend() != "tpu":
        print("needs the real chip", file=sys.stderr)
        return 1

    rounds = 3 if args.quick else 6
    rtt = cached_tunnel_rtt()
    run_id = f"rtt={rtt * 1e3:.2f}ms pid={os.getpid()}"

    sections = {}
    for name in args.configs:
        batch, modalities, embed, heads, _ = CONFIGS[name]
        if heads != 1:
            continue
        # staged-batch K: enough steps per dispatch to amortize, capped
        # so one staging (shared by both impls) stays ~<=2GB of HBM
        batch_bytes = batch * modalities * embed * 4
        K = 8 if args.quick else max(4, min(48, int(2e9 // batch_bytes)))
        for head in (True, False):
            kv_packed, kv_4d, lab_k = stage_batches(
                batch, modalities, embed, K, head=head
            )
            chunks = {}
            for impl in ("pallas", "fused-step"):
                # each impl on its best staging (measured): fused-step
                # wants packed (zero-copy in-kernel addressing); the
                # general path wants 4-D (its per-step slice copy then
                # absorbs the layout conversion — feeding it packed
                # costs an extra whole-array unpack per call)
                kv_k = kv_packed if impl == "fused-step" else kv_4d
                try:
                    c, st = build_product_chunk(
                        embed, impl, head=head, precision=args.precision,
                    )
                    rng = jax.random.key(42)
                    st, losses, _ = c(st, kv_k, lab_k, rng)
                    float(losses[-1])  # compile + warm
                except ValueError as e:
                    print(f"{name}/{impl}: {e}", file=sys.stderr)
                    continue
                chunks[impl] = (c, st, kv_k, lab_k, rng)

            if not chunks:
                continue

            # auto-size windows: chain chunk calls until the window
            # clears max(50ms, 20×RTT) — bench.py's rule
            calib = float("inf")
            for impl, (c, st, kv_k, lab_k, rng) in chunks.items():
                t0 = time.perf_counter()
                st, losses, _ = c(st, kv_k, lab_k, rng)
                float(losses[-1])
                calib = min(calib, time.perf_counter() - t0)
                chunks[impl] = (c, st, kv_k, lab_k, rng)
            per_call = net_window(calib, rtt)
            target = max(0.05, 20.0 * rtt)
            cpw = max(1, math.ceil(target / per_call))

            res = {m: [] for m in chunks}
            for _ in range(rounds):
                for m in res:
                    c, st, kv_k, lab_k, rng = chunks[m]
                    t0 = time.perf_counter()
                    for _j in range(cpw):
                        st, losses, _ = c(st, kv_k, lab_k, rng)
                    float(losses[-1])
                    elapsed = time.perf_counter() - t0
                    res[m].append(
                        batch * K * cpw / net_window(elapsed, rtt)
                    )
                    chunks[m] = (c, st, kv_k, lab_k, rng)

            med = {m: statistics.median(v) for m, v in res.items()}
            key = name + ("+head" if head else "")
            section = {
                "config": {
                    "batch": batch, "modalities": modalities,
                    "embed": embed, "num_classes":
                        C_CLASSES if head else None,
                    "precision": args.precision, "optimizer": "adamw",
                    "steps_per_call": K, "calls_per_window": cpw,
                    "rounds": rounds,
                },
                "samples_per_sec_median": {
                    m: round(v, 1) for m, v in med.items()
                },
                "windows": {
                    m: [round(x, 1) for x in v] for m, v in res.items()
                },
                "run": run_id,
            }
            if "pallas" in med and "fused-step" in med:
                section["fused_step_speedup_median"] = round(
                    med["fused-step"] / med["pallas"], 3
                )
            sections[key] = section
            print(json.dumps({key: section.get(
                "fused_step_speedup_median",
                section["samples_per_sec_median"],
            )}), flush=True)

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
    runs = {s.get("run", "?") for s in out["sections"].values()}
    if len(runs) > 1:
        out["note"] = (
            "sections from separate processes; compare speedups within "
            "sections only"
        )
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
