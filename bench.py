#!/usr/bin/env python3
"""Headline benchmark: fused fusion-pool fwd+bwd throughput on one chip.

North-star config (BASELINE.md): embed_dim=512, 3 modalities, batch 4096,
1 head, full forward+backward+SGD step with entropy loss — the same protocol
as the measured PyTorch-CPU baseline (8,884 samples/s single-thread).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "samples/sec", "vs_baseline": N}

Flags:
  --quick       fewer timed iters (CI smoke)
  --impl        xla | pallas | auto (default auto)
  --batch/--embed/--modalities/--heads   override the config
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp

BASELINE_SAMPLES_PER_SEC = 8884.0  # PyTorch-CPU reference (BASELINE.md)


def build_step(embed, modalities, heads, impl):
    import optax

    from aecf_tpu.core.attention import attention_pool_core
    from aecf_tpu.core.init import (
        init_attention_pool_params,
        init_fusion_query,
    )
    from aecf_tpu.core.masking import curriculum_mask, entropy_loss

    key = jax.random.key(0)
    pool_params = init_attention_pool_params(key, embed)
    query = init_fusion_query(jax.random.key(1), embed)
    params = {"pool": pool_params, "query": query}
    opt = optax.sgd(1e-3)
    opt_state = opt.init(params)

    if impl == "pallas":
        from aecf_tpu.kernels import fused_fusion_pool as fused

    def step(params, opt_state, modal_batch, rng):
        B = modal_batch.shape[0]

        def loss_fn(p):
            q = jnp.broadcast_to(p["query"], (B, 1, embed))
            if impl == "pallas":
                out, weights, masked, info = fused(
                    p["pool"], q, modal_batch, num_heads=heads, rng=rng,
                    training=True,
                )
            else:
                out, weights = attention_pool_core(
                    p["pool"], q, modal_batch, modal_batch,
                    num_heads=heads, need_weights=True,
                )
                masked, info = curriculum_mask(
                    weights, key=rng, training=True, base_mask_prob=0.15
                )
            loss = out.sum() + entropy_loss(info["entropy"], seq_len=modalities)
            return loss, info

        (loss, info), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    return jax.jit(step, donate_argnums=(0, 1)), params, opt_state


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--impl", default="auto",
                    choices=["auto", "xla", "pallas"])
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--embed", type=int, default=512)
    ap.add_argument("--modalities", type=int, default=3)
    ap.add_argument("--heads", type=int, default=1)
    args = ap.parse_args()

    impl = args.impl
    if impl == "auto":
        on_tpu = jax.default_backend() == "tpu"
        if on_tpu:
            try:
                from aecf_tpu.kernels import fused_fusion_pool  # noqa: F401

                impl = "pallas"
            except ImportError:
                impl = "xla"
        else:
            impl = "xla"

    step, params, opt_state = build_step(
        args.embed, args.modalities, args.heads, impl
    )
    modal = jax.random.normal(
        jax.random.key(2), (args.batch, args.modalities, args.embed)
    )

    # Iteration counts sized for stable amortized timing: one step is
    # ~100-200us on a v5e chip, so short runs are dominated by dispatch
    # jitter.
    warmup = 5 if args.quick else 10
    iters = 20 if args.quick else 100

    rngs = [jax.random.key(100 + i) for i in range(warmup + iters)]
    for i in range(warmup):
        params, opt_state, loss = step(params, opt_state, modal, rngs[i])
    jax.block_until_ready(loss)

    t0 = time.perf_counter()
    for i in range(iters):
        params, opt_state, loss = step(
            params, opt_state, modal, rngs[warmup + i]
        )
    jax.block_until_ready(loss)
    elapsed = time.perf_counter() - t0

    samples_per_sec = args.batch * iters / elapsed
    result = {
        "metric": (
            f"fusion fwd+bwd samples/sec/chip "
            f"(B={args.batch}, M={args.modalities}, E={args.embed}, "
            f"H={args.heads}, impl={impl}, {jax.default_backend()})"
        ),
        "value": round(samples_per_sec, 1),
        "unit": "samples/sec",
        "vs_baseline": round(samples_per_sec / BASELINE_SAMPLES_PER_SEC, 2),
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
