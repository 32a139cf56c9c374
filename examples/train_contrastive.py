#!/usr/bin/env python3
"""Large-batch contrastive fusion with data parallelism — BASELINE config #5.

4 modalities, embed_dim 1024, global batch 8192, sharded over a ``('data',)``
mesh (v5e-8 in production; any device count works, including the 8-virtual-
CPU test mesh).  Per-instance entropy gating: every sample's fusion weights
get their own entropy-adaptive Bernoulli mask (the curriculum path), and the
contrastive InfoNCE objective aligns the fused embedding with a held-out
target projection of the same sample across the global batch.

Run (virtual 8-device mesh on CPU):
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python examples/train_contrastive.py --platform cpu --global-batch 512
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--global-batch", type=int, default=8192)
    ap.add_argument("--embed", type=int, default=1024)
    ap.add_argument("--modalities", type=int, default=4)
    ap.add_argument("--temperature", type=float, default=0.1)
    ap.add_argument("--platform", choices=["cpu", "tpu"])
    args = ap.parse_args(argv)

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import jax.numpy as jnp
    import numpy as np
    import optax
    from jax.sharding import PartitionSpec as P

    from aecf_tpu.core.init import (
        init_attention_pool_params,
        init_fusion_query,
    )
    from aecf_tpu.models.layers import init_linear, linear
    from aecf_tpu.ops import fusion_pool
    from aecf_tpu.parallel import data_mesh, replicate, shard_batch

    n_dev = len(jax.devices())
    B = args.global_batch - args.global_batch % n_dev
    M, E = args.modalities, args.embed
    mesh = data_mesh(n_dev)
    print(f"devices={n_dev} global_batch={B} M={M} E={E}")

    key = jax.random.key(0)
    ks = jax.random.split(key, 4)
    params = {
        "pool": init_attention_pool_params(ks[0], E),
        "query": init_fusion_query(ks[1], E),
        "proj": init_linear(ks[2], E, 256),
        "target_proj": init_linear(ks[3], E, 256),
    }
    opt = optax.adamw(3e-4)
    opt_state = opt.init(params)

    def local_step(params, opt_state, modal, target, rng):
        axis_size = jax.lax.axis_size("data")
        shard_rng = jax.random.fold_in(rng, jax.lax.axis_index("data"))

        def loss_fn(p):
            # Per-instance entropy gating: curriculum masking with the
            # sample's own entropy-adaptive keep-prob.
            fused, w, mw, info = fusion_pool(
                p["pool"], p["query"], modal,
                rng=shard_rng, training=True, base_mask_prob=0.15,
                # modal is input data (pre-extracted features), not an
                # encoder output: skip the d_kv cotangent — a third of
                # the fused backward's HBM traffic at this shape.
                kv_grad=False,
            )
            z = linear(p["proj"], fused.squeeze(1))
            t = linear(p["target_proj"], target)
            z = z / (jnp.linalg.norm(z, axis=-1, keepdims=True) + 1e-8)
            t = t / (jnp.linalg.norm(t, axis=-1, keepdims=True) + 1e-8)
            # Global-batch InfoNCE: gather targets from every shard so
            # negatives span the full batch (the point of large-batch
            # contrastive training) — one ICI all-gather.
            t_all = jax.lax.all_gather(t, "data").reshape(
                -1, t.shape[-1]
            )
            logits = z @ t_all.T / args.temperature  # (local_B, global_B)
            local_b = z.shape[0]
            offset = jax.lax.axis_index("data") * local_b
            labels = offset + jnp.arange(local_b)
            loss = optax.softmax_cross_entropy_with_integer_labels(
                logits, labels
            ).mean()
            return loss / axis_size, info

        (scaled_loss, info), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        loss = jax.lax.psum(scaled_loss, "data")
        info = jax.tree.map(
            lambda x: jax.lax.pmean(jnp.mean(x), "data"), info
        )
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss, info

    from functools import partial

    step = jax.jit(
        partial(jax.shard_map,
                mesh=mesh,
                in_specs=(P(), P(), P("data"), P("data"), P()),
                out_specs=(P(), P(), P(), P()))(local_step),
        donate_argnums=(0, 1),
    )

    rng_np = np.random.default_rng(0)
    base = rng_np.normal(size=(B, E)).astype(np.float32)
    modal_np = (
        base[:, None, :]
        + 0.5 * rng_np.normal(size=(B, M, E)).astype(np.float32)
    )
    target_np = base + 0.3 * rng_np.normal(size=(B, E)).astype(np.float32)

    params = replicate(mesh, params)
    opt_state = replicate(mesh, opt_state)
    modal, target = shard_batch(
        mesh, (jnp.asarray(modal_np), jnp.asarray(target_np))
    )

    for i in range(args.steps):
        params, opt_state, loss, info = step(
            params, opt_state, modal, target, jax.random.key(i)
        )
        if i % 10 == 0 or i == args.steps - 1:
            print(
                f"step {i}: infonce={float(loss):.4f} "
                f"entropy={float(info['entropy']):.4f} "
                f"mask_rate={float(info['mask_rate']):.4f}",
                flush=True,
            )

    # Retrieval eval — the deleted COCO experiments' protocol
    # (recall@K of fused embedding vs its paired target projection).
    from aecf_tpu.ops import fusion_pool as _fp
    from aecf_tpu.train import recall_at_k

    n_eval = min(1024, B)
    fused_eval, _, _, _ = _fp(
        jax.device_get(params["pool"]), jax.device_get(params["query"]),
        jnp.asarray(modal_np[:n_eval]), training=False,
    )
    z = linear(jax.device_get(params["proj"]), fused_eval.squeeze(1))
    t_emb = linear(
        jax.device_get(params["target_proj"]),
        jnp.asarray(target_np[:n_eval]),
    )
    r = recall_at_k(np.asarray(z), np.asarray(t_emb))
    print("retrieval recall@K (fused → paired target, "
          f"N={n_eval}): " + "  ".join(f"R@{k}={v:.3f}" for k, v in r.items()))
    print("done")


if __name__ == "__main__":
    main()
