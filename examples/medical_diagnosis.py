#!/usr/bin/env python3
"""MedicalDiagnosisModel: 3-modality fusion with graceful missing modalities.

The reference's medical integration pattern (README.md:213-267): image(1024)
/ lab(50) / clinical(200) encoders → 512, AECF fusion with higher masking
(mask_prob=0.25, 8 heads) for robustness, 10 disease classes.  Any subset of
modalities may be passed at inference — absent ones are padded out of the
attention, so weights renormalize over what is present.

Run: python examples/medical_diagnosis.py [--platform cpu]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=150)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--platform", choices=["cpu", "tpu"])
    args = ap.parse_args(argv)

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import jax.numpy as jnp
    import optax

    from aecf_tpu.models import MedicalDiagnosisModel
    from aecf_tpu.train import TrainState, bce_with_logits_loss

    model = MedicalDiagnosisModel()
    params = model.init(jax.random.key(0))

    # Synthetic multi-disease data: disease prototypes in each modality.
    rng = np.random.default_rng(0)
    n, c = 4096, model.num_classes
    labels = (rng.random((n, c)) < 0.15).astype(np.float32)
    protos = {
        "image": rng.normal(size=(c, 1024)).astype(np.float32),
        "lab": rng.normal(size=(c, 50)).astype(np.float32),
        "clinical": rng.normal(size=(c, 200)).astype(np.float32),
    }
    feats = {
        k: labels @ p + 0.5 * rng.normal(size=(n, p.shape[1])).astype(
            np.float32
        )
        for k, p in protos.items()
    }

    opt = optax.adamw(1e-3)
    state = TrainState(params, opt.init(params), jnp.zeros((), jnp.int32))

    @jax.jit
    def step(state, image, lab, clinical, y, rng):
        def loss_fn(p):
            logits = model.apply(
                p, image=image, lab=lab, clinical=clinical,
                training=True, rng=rng,
            )
            return bce_with_logits_loss(logits, y)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        upd, opt_state = opt.update(grads, state.opt_state, state.params)
        return (
            TrainState(
                optax.apply_updates(state.params, upd),
                opt_state,
                state.step + 1,
            ),
            loss,
        )

    for i in range(args.steps):
        sel = rng.integers(0, n, size=args.batch)
        state, loss = step(
            state,
            jnp.asarray(feats["image"][sel]),
            jnp.asarray(feats["lab"][sel]),
            jnp.asarray(feats["clinical"][sel]),
            jnp.asarray(labels[sel]),
            jax.random.key(i),
        )
        if i % 50 == 0 or i == args.steps - 1:
            print(f"step {i}: loss={float(loss):.4f}", flush=True)

    # Graceful missing-modality inference: any subset works.
    val = slice(0, 256)
    from aecf_tpu.train.metrics import (
        _sigmoid,
        brier_score,
        calculate_metrics,
        expected_calibration_error,
    )

    combos = [
        ("image+lab+clinical", dict(
            image=feats["image"][val], lab=feats["lab"][val],
            clinical=feats["clinical"][val])),
        ("image only", dict(image=feats["image"][val])),
        ("lab+clinical", dict(
            lab=feats["lab"][val], clinical=feats["clinical"][val])),
    ]
    print("\nmissing-modality inference (absent = not passed at all):")
    for name, kwargs in combos:
        logits = model.apply(
            state.params, **{k: jnp.asarray(v) for k, v in kwargs.items()}
        )
        m, f1, _ = calculate_metrics(np.asarray(logits), labels[val])
        probs = _sigmoid(np.asarray(logits, np.float64))
        ece = expected_calibration_error(probs, labels[val])
        br = brier_score(probs, labels[val])
        print(f"  {name:20s} mAP={m:.4f} macroF1={f1:.4f} "
              f"ECE={ece:.4f} Brier={br:.4f}")


if __name__ == "__main__":
    main()
