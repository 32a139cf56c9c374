#!/usr/bin/env python3
"""The reference X3 training protocol on the product fast path.

Frozen CLIP-style features → fusion pool → trainable linear head → BCE —
the reference's headline training loop (train_xrays_example.py:372-377)
— driven through ``aecf_tpu.train.make_pool_train_step``:

* On TPU (H=1, resident E) every step runs the ONE-PASS fused train-step
  kernel: loss, gradients (head included) and the gate-info side outputs
  in a single read of the feature stream.
* On CPU (or non-qualifying configs) the SAME code autodiffs through
  ``ops.fusion_pool`` — identical parameter trajectory to f32 tolerance
  (tests/test_pool_step.py), so this example runs anywhere.

The loop itself is :func:`aecf_tpu.train.fit` via ``as_fit_step`` — the
elastic checkpoint/resume loop, fed by the pure-function-of-step batcher.

Run:  python examples/train_pool_fused.py [--steps 200] [--platform cpu]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--embed", type=int, default=512)
    ap.add_argument("--classes", type=int, default=14)
    ap.add_argument("--rows", type=int, default=2048)
    ap.add_argument("--platform", choices=["cpu", "tpu"])
    ap.add_argument("--checkpoint-dir", default=None)
    args = ap.parse_args(argv)

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import numpy as np
    import optax

    from aecf_tpu.train import (
        as_fit_step,
        evaluate_model,
        fit,
        init_pool_classifier_params,
        make_epoch_batch_fn,
        make_pool_train_step,
    )

    E, C = args.embed, args.classes
    rs = np.random.default_rng(0)
    # stand-in for pre-extracted CLIP features (the reference protocol
    # trains on frozen .npz feature stores; see
    # examples/extract_clip_features.py for producing real ones)
    latent = rs.normal(size=(args.rows, 8)).astype(np.float32)
    img = (latent @ rs.normal(size=(8, E)) * 0.3
           + rs.normal(size=(args.rows, E)) * 0.1).astype(np.float32)
    txt = (latent @ rs.normal(size=(8, E)) * 0.3
           + rs.normal(size=(args.rows, E)) * 0.1).astype(np.float32)
    lab = (latent @ rs.normal(size=(8, C)) > 0.5).astype(np.float32)

    params = init_pool_classifier_params(jax.random.key(0), E, C)
    opt = optax.adamw(1e-3, weight_decay=0.01)
    # training=True: curriculum masking draws on (the default); the
    # builder routes to the fused kernel on TPU, XLA elsewhere.
    step = as_fit_step(
        make_pool_train_step(opt, impl="auto", entropy_coeff=0.0)
    )
    batch_fn = make_epoch_batch_fn(
        {"image": img, "text": txt, "label": lab}, args.batch, seed=0
    )
    state, history = fit(
        None, opt, params, batch_fn,
        num_steps=args.steps, rng=jax.random.key(1),
        step_fn=step, log_every=max(1, args.steps // 5),
        checkpoint_dir=args.checkpoint_dir,
    )

    # eval through the same pooled head (full-modality)
    import jax.numpy as jnp

    from aecf_tpu.ops import fusion_pool

    @jax.jit
    def predict(p, images, texts):
        kv = jnp.stack([images, texts], axis=1)
        out, _w, _mw, _info = fusion_pool(
            p["pool"], p["query"], kv, num_heads=1, training=False,
        )
        logits = out[:, 0, :] @ p["head"]["w"] + p["head"]["b"]
        return logits

    m, f1, _ = evaluate_model(
        predict, state.params, img, txt, lab, "none", args.batch
    )
    print(
        f"final: loss {history['loss'][-1]:.4f}  "
        f"mAP {m:.4f}  macro-F1 {f1:.4f}"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
