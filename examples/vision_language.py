#!/usr/bin/env python3
"""VisionLanguageModel end-to-end: train with entropy regularization, then a
missing-modality inference sweep — BASELINE.json config #4.

Mirrors the reference's documented integration (README.md:162-208): project
img(2048)/txt(768) to 512, AECF-fuse, classify; training adds
``0.01 * entropy_loss(info['entropy'])`` (monitoring-only by default — quirk
Q2).  The sweep evaluates every modality subset with absent modalities
zeroed.

Run: python examples/vision_language.py [--steps 200] [--platform cpu]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--classes", type=int, default=20)
    ap.add_argument("--platform", choices=["cpu", "tpu"])
    args = ap.parse_args(argv)

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import jax.numpy as jnp
    import optax

    from aecf_tpu.core.masking import entropy_loss
    from aecf_tpu.data import make_synthetic_clip_features
    from aecf_tpu.models import VisionLanguageModel
    from aecf_tpu.train import (
        TrainState,
        bce_with_logits_loss,
        missing_modality_sweep,
    )

    # Synthetic img/txt features with cross-modal label structure.
    train, val = make_synthetic_clip_features(
        n_train=4096,
        n_val=1024,
        image_dim=2048,
        text_dim=768,
        num_classes=args.classes,
    )
    model = VisionLanguageModel(num_classes=args.classes, hidden_dim=512)
    params = model.init(jax.random.key(0))
    opt = optax.adamw(1e-3, weight_decay=0.01)
    state = TrainState(params, opt.init(params), jnp.zeros((), jnp.int32))

    @jax.jit
    def step(state, img, txt, lab, rng):
        def loss_fn(p):
            logits, info = model.apply(
                p, img, txt, training=True, rng=rng, return_info=True
            )
            # README.md:206-208 pattern (entropy detached by default, Q2).
            loss = bce_with_logits_loss(logits, lab) + 0.01 * entropy_loss(
                info["entropy"], seq_len=2
            )
            return loss, info

        (loss, info), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        upd, opt_state = opt.update(grads, state.opt_state, state.params)
        return (
            TrainState(
                optax.apply_updates(state.params, upd),
                opt_state,
                state.step + 1,
            ),
            loss,
            info,
        )

    n = train["image"].shape[0]
    rng = np.random.default_rng(0)
    for i in range(args.steps):
        sel = rng.integers(0, n, size=args.batch)
        state, loss, info = step(
            state,
            jnp.asarray(train["image"][sel]),
            jnp.asarray(train["text"][sel]),
            jnp.asarray(train["label"][sel]),
            jax.random.key(i),
        )
        if i % 50 == 0 or i == args.steps - 1:
            print(
                f"step {i}: loss={float(loss):.4f} "
                f"entropy={float(info['entropy'].mean()):.4f} "
                f"mask_rate={float(info['mask_rate'].mean()):.4f}",
                flush=True,
            )

    predict = jax.jit(
        lambda img, txt: model.apply(
            state.params, img, txt, training=False
        )
    )
    results = missing_modality_sweep(
        lambda image, text: predict(jnp.asarray(image), jnp.asarray(text)),
        {"image": val["image"], "text": val["text"]},
        val["label"],
        batch_size=256,
    )
    print("\nmissing-modality inference sweep:")
    for subset, metrics in results.items():
        print(
            f"  present={'+'.join(subset):13s} "
            f"mAP={metrics['map']:.4f} macroF1={metrics['macro_f1']:.4f} "
            f"ECE={metrics['ece']:.4f} Brier={metrics['brier']:.4f}"
        )


if __name__ == "__main__":
    main()
