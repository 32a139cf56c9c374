#!/usr/bin/env python3
"""Gradient-accumulation overhead A/B on the real chip.

Measures the full north-star train step (fused path, curriculum masking +
entropy loss + SGD) at a FIXED global batch while scanning it as 1, 2, 4,
or 8 microbatches via :func:`aecf_tpu.train.accumulate_grads` — the same
helper ``make_train_step(accum_steps=)`` uses.  The update math is
identical by construction (tests/test_trainer.py::TestGradAccum); this
pins what the feature COSTS: more, smaller kernel launches over the same
total bytes, plus the grads-accumulator carry.

Within-run alternating windows, RTT-subtracted (aecf_tpu/measure.py);
writes docs/artifacts/accum_ab.json.

Usage:  python benchmarks/accum_ab.py [--quick] [--batch N --embed E ...]
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

from bench import enable_persistent_cache  # repo-pinned cache dir


def build_accum_chunk(batch, modalities, embed, heads, accum, steps_per_call):
    """build_chunk's protocol (full fwd+bwd+SGD, fused path) with the batch
    scanned as ``accum`` microbatches per step via accumulate_grads."""
    import optax

    from aecf_tpu.core.init import (
        init_attention_pool_params,
        init_fusion_query,
    )
    from aecf_tpu.core.masking import entropy_loss
    from aecf_tpu.kernels import fused_fusion_pool_shared
    from aecf_tpu.train import accumulate_grads

    params = {
        "pool": init_attention_pool_params(jax.random.key(0), embed),
        "query": init_fusion_query(jax.random.key(1), embed),
    }
    opt = optax.sgd(1e-3)
    opt_state = opt.init(params)
    modal = jax.random.normal(
        jax.random.key(2), (batch, modalities, embed)
    )
    micro = modal.reshape(accum, batch // accum, modalities, embed)

    def loss_on(p, kv, rng):
        out, w, mw, info = fused_fusion_pool_shared(
            p["pool"], p["query"], kv, num_heads=heads, rng=rng,
            training=True, base_mask_prob=0.15, kv_grad=False,
        )
        loss = (out * out).mean() + entropy_loss(
            info["entropy"], seq_len=modalities
        )
        return loss, info

    def one_step(carry, i):
        params, opt_state = carry
        rng = jax.random.fold_in(jax.random.key(42), i)
        if accum == 1:
            (loss, _), grads = jax.value_and_grad(
                lambda p: loss_on(p, modal, rng), has_aux=True
            )(params)
        else:
            loss, _, grads = accumulate_grads(
                loss_on, params, (micro,), rng, accum
            )
        updates, opt_state = opt.update(grads, opt_state, params)
        return (optax.apply_updates(params, updates), opt_state), loss

    @jax.jit
    def chunk(params, opt_state, start):
        (params, opt_state), losses = jax.lax.scan(
            one_step, (params, opt_state),
            start + jnp.arange(steps_per_call),
        )
        return params, opt_state, losses[-1]

    return chunk, params, opt_state


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--modalities", type=int, default=3)
    ap.add_argument("--embed", type=int, default=512)
    ap.add_argument("--heads", type=int, default=1)
    ap.add_argument("--accum", type=int, nargs="+", default=[1, 2, 4, 8])
    ap.add_argument(
        "--out", default=os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "docs", "artifacts", "accum_ab.json",
        )
    )
    args = ap.parse_args()
    enable_persistent_cache()

    from bench import ab_train_windows, cached_tunnel_rtt

    if jax.default_backend() != "tpu":
        print("needs the real chip (fused path)", file=sys.stderr)
        return 1

    K = 20 if args.quick else 150
    rounds = 3 if args.quick else 8
    # Chain several chunk dispatches per timed window (single fetch at the
    # end): K=150 at ~125us/step is ~19ms, i.e. LESS than one tunnel RTT —
    # the subtraction would dominate the window.  calls_per_window grows
    # the window to >= 20x RTT without recompiling a longer scan.
    calls_per_window = 1 if args.quick else 10

    chunks = {}
    for k in args.accum:
        if args.batch % k:
            print(f"skip accum={k}: {args.batch} not divisible")
            continue
        c, p, s = build_accum_chunk(
            args.batch, args.modalities, args.embed, args.heads, k, K
        )
        p, s, loss = c(p, s, jnp.int32(0))
        float(loss)  # compile + warm (value fetch = the only reliable sync)
        chunks[f"accum{k}"] = (c, p, s)

    rtt = cached_tunnel_rtt()

    def call(state, r):
        c, p, s = state
        for j in range(calls_per_window):
            p, s, loss = c(
                p, s, jnp.int32((r * calls_per_window + j) * K)
            )
        return (c, p, s), loss

    res = ab_train_windows(
        chunks, args.batch, K * calls_per_window, rounds, rtt, call=call
    )
    medians = {m: statistics.median(v) for m, v in res.items()}
    base = medians.get("accum1")
    out = {
        "config": {
            "batch": args.batch, "modalities": args.modalities,
            "embed": args.embed, "heads": args.heads,
            "steps_per_call": K, "calls_per_window": calls_per_window,
            "rounds": rounds,
            "tunnel_rtt_ms": round(rtt * 1e3, 2),
        },
        "samples_per_sec_median": {
            m: round(v, 1) for m, v in medians.items()
        },
        "windows": {m: [round(x, 1) for x in v] for m, v in res.items()},
        "relative_to_accum1": {
            m: round(v / base, 4) for m, v in medians.items()
        } if base else None,
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    tmp = args.out + ".tmp"
    with open(tmp, "w") as f:
        json.dump(out, f, indent=1)
    os.replace(tmp, args.out)
    print(json.dumps(out["samples_per_sec_median"]))
    if base:
        print(json.dumps(out["relative_to_accum1"]))
    return 0


if __name__ == "__main__":
    sys.exit(main())
