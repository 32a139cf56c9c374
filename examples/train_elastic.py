#!/usr/bin/env python3
"""Elastic training on preemptible TPUs: checkpoint/resume × DP × chunks.

The reference trains in one uninterrupted process and saves only final
weights (train_xrays_example.py:766-772).  On preemptible TPU capacity the
TPU-native pattern is the :func:`aecf_tpu.train.fit` loop: periodic orbax
checkpoints of the full TrainState, resume-from-latest on restart, with the
data stream and RNG keys re-derived from the step counter so the resumed
run reproduces the uninterrupted one exactly — composed here with

  * a data-parallel mesh (``--mesh dp``: batch sharded over all devices,
    gradient all-reduce compiled by XLA),
  * gradient accumulation (``--accum k``: microbatched updates for batches
    beyond device memory),
  * compiled multi-step chunks (``--scan-chunk K``: K optimizer updates
    per dispatch; keys fold the global step, so chunked and unchunked
    checkpoints resume into each other at any alignment).

``--preempt-at N`` simulates a preemption: the process trains to step N,
"dies", and a second fit() call resumes from the latest checkpoint and
finishes — the printed final loss is identical to an uninterrupted run.

Run:  python examples/train_elastic.py --steps 60 --preempt-at 25
      python examples/train_elastic.py --mesh dp --scan-chunk 10 --accum 2
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import optax

from aecf_tpu.data import make_synthetic_clip_features
from aecf_tpu.models import XrayAECFModel
from aecf_tpu.train import fit


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--hidden", type=int, default=64)
    ap.add_argument("--classes", type=int, default=8)
    ap.add_argument("--scan-chunk", type=int, default=1)
    ap.add_argument("--accum", type=int, default=1)
    ap.add_argument("--save-every", type=int, default=5)
    ap.add_argument(
        "--ckpt-dir", default=None,
        help="checkpoint directory (default: a fresh temp dir)",
    )
    ap.add_argument(
        "--mesh", choices=["none", "dp"], default="none",
        help="'dp': shard the batch over all visible devices",
    )
    ap.add_argument(
        "--preempt-at", type=int, default=0,
        help="simulate preemption: train to this step, then resume in a "
        "second fit() call",
    )
    ap.add_argument(
        "--cpu", action="store_true",
        help="force the CPU backend (quick dry runs on a TPU-attached "
        "host; must be the first jax use in the process)",
    )
    args = ap.parse_args(argv)
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    ckpt_dir = args.ckpt_dir or tempfile.mkdtemp(prefix="aecf_elastic_")

    train_data, _ = make_synthetic_clip_features(
        n_train=1024,
        n_val=64,
        image_dim=args.hidden,
        text_dim=args.hidden,
        num_classes=args.classes,
        seed=0,
    )
    img, txt, lab = (
        train_data["image"], train_data["text"], train_data["label"]
    )

    def batch_fn(step):
        # pure function of the step index — a resumed run replays the
        # exact stream (the fit() resume contract).  This samples with
        # replacement; for the standard epoch-shuffled schedule in the
        # same pure form, use train.make_epoch_batch_fn(data, batch).
        sel = np.random.default_rng(step).integers(
            0, img.shape[0], size=args.batch
        )
        return img[sel], txt[sel], lab[sel]

    model = XrayAECFModel(
        image_dim=args.hidden,
        text_dim=args.hidden,
        hidden_dim=args.hidden,
        num_classes=args.classes,
    )
    params = model.init(jax.random.key(0))
    optimizer = optax.adamw(1e-3, weight_decay=0.01)

    def apply_fn(p, i, t, rng):
        return model.apply(
            p, i, t, training=True, rng=rng,
            curriculum_enabled=True, missing_modality_training=True,
            return_info=True,
        )

    mesh = None
    if args.mesh == "dp":
        from aecf_tpu.parallel import data_mesh

        n = len(jax.devices())
        if args.batch % n:
            raise SystemExit(
                f"--batch {args.batch} must divide over {n} devices"
            )
        mesh = data_mesh(n)
        print(f"data-parallel over {n} devices", flush=True)

    fit_kwargs = dict(
        rng=jax.random.key(1),
        checkpoint_dir=ckpt_dir,
        save_every=args.save_every,
        log_every=max(args.steps // 6, 1),
        mesh=mesh,
        accum_steps=args.accum,
        scan_chunk=args.scan_chunk,
    )

    if args.preempt_at:
        print(f"--- phase 1: training to step {args.preempt_at}, "
              f"then 'preemption' ---", flush=True)
        fit(apply_fn, optimizer, params, batch_fn,
            num_steps=args.preempt_at, **fit_kwargs)
        print(f"--- preempted at step {args.preempt_at}; restarting and "
              f"resuming from {ckpt_dir} ---", flush=True)

    state, history = fit(
        apply_fn, optimizer, params, batch_fn,
        num_steps=args.steps, **fit_kwargs,
    )
    assert int(state.step) == args.steps, int(state.step)

    summary = {
        "final_step": int(state.step),
        "checkpoint_dir": ckpt_dir,
        "resumed": bool(args.preempt_at),
        "scan_chunk": args.scan_chunk,
        "accum_steps": args.accum,
        "mesh": args.mesh,
        "loss_first": history["loss"][0] if history["loss"] else None,
        "loss_last": history["loss"][-1] if history["loss"] else None,
        "entropy_last": (
            history["entropy"][-1] if history.get("entropy") else None
        ),
    }
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
