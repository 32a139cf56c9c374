#!/usr/bin/env python3
"""End-to-end migration from the PyTorch reference to aecf_tpu.

The runnable version of docs/migration.md "Checkpoints": a reference-style
model (learnable fusion query + ``nn.MultiheadAttention`` pooling + linear
classifier — the stack the reference delegates its heavy math to,
aecf/AECFLayer.py:399-407, :515-521) is trained in torch and saved with
``torch.save(model.state_dict())`` exactly like the reference experiment does
(xrays/train_xrays_example.py:766-772).  Then:

1. the ``.pth`` is converted to aecf_tpu params (``contrib.torch_compat``,
   numpy-level — torch is needed once, to unpickle);
2. eval logits are verified to match torch;
3. training CONTINUES in aecf_tpu with the same AdamW(lr, wd) + BCE recipe
   (``train.make_train_step``), picking the loss up where torch left it —
   with curriculum masking turned on, which the torch checkpoint never had
   (it changes stats/regularization only, not outputs — reference quirk Q1);
4. the result is persisted with ``train.save_params`` (orbax).

Run: python examples/migrate_from_torch.py [--torch-steps 30] [--jax-steps 30]
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

E, M, C = 64, 2, 8  # embed dim, modalities, classes


def _make_data(n, seed):
    rng = np.random.default_rng(seed)
    img = rng.normal(size=(n, E)).astype(np.float32)
    txt = rng.normal(size=(n, E)).astype(np.float32)
    w = rng.normal(size=(E, C)).astype(np.float32)
    lab = ((img + txt) @ w > 0).astype(np.float32)
    return img, txt, lab


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--torch-steps", type=int, default=30)
    ap.add_argument("--jax-steps", type=int, default=30)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--platform", choices=["cpu", "tpu"])
    ap.add_argument(
        "--checkpoint", default=None,
        help=".pth path (default: a temp file this script creates)",
    )
    args = ap.parse_args(argv)

    import torch

    # ---- phase 1: the "legacy" torch training run --------------------------
    class TorchFusionClassifier(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.fusion_query = torch.nn.Parameter(
                torch.randn(1, 1, E) * (2.0 / E) ** 0.5
            )
            self.attention = torch.nn.MultiheadAttention(
                E, 1, batch_first=True
            )
            self.classifier = torch.nn.Linear(E, C)

        def forward(self, img, txt):
            kv = torch.stack([img, txt], dim=1)  # (B, M, E)
            q = self.fusion_query.expand(kv.shape[0], -1, -1)
            out, _ = self.attention(q, kv, kv, need_weights=False)
            return self.classifier(out.squeeze(1))

    torch.manual_seed(0)
    model = TorchFusionClassifier()
    opt = torch.optim.AdamW(model.parameters(), lr=args.lr, weight_decay=0.01)
    criterion = torch.nn.BCEWithLogitsLoss()
    img, txt, lab = _make_data(4096, seed=1)

    rng = np.random.default_rng(2)
    torch_losses = []
    for _ in range(args.torch_steps):
        sel = rng.integers(0, len(img), size=args.batch)
        ti, tt, tl = (
            torch.tensor(x[sel]) for x in (img, txt, lab)
        )
        opt.zero_grad()
        loss = criterion(model(ti, tt), tl)
        loss.backward()
        opt.step()
        torch_losses.append(float(loss.detach()))
    print(
        f"torch: {args.torch_steps} AdamW steps, "
        f"loss {torch_losses[0]:.4f} -> {torch_losses[-1]:.4f}"
    )

    ckpt = args.checkpoint or os.path.join(
        tempfile.mkdtemp(prefix="aecf_migrate_"), "model.pth"
    )
    torch.save(model.state_dict(), ckpt)
    print(f"torch: saved state_dict -> {ckpt}")

    # ---- phase 2: convert the checkpoint -----------------------------------
    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import jax.numpy as jnp
    import optax

    from aecf_tpu import ops
    from aecf_tpu.contrib.torch_compat import (
        attention_pool_params_from_state_dict,
        fusion_query_from_state_dict,
    )
    from aecf_tpu.models.layers import LinearParams, linear
    from aecf_tpu.train import (
        TrainState,
        bce_with_logits_loss,
        make_train_step,
        save_params,
    )

    sd = {k: v.numpy() for k, v in torch.load(ckpt, weights_only=True).items()}
    params = {
        "pool": attention_pool_params_from_state_dict(sd),
        "query": fusion_query_from_state_dict(sd),
        "cls": LinearParams(
            weight=jnp.array(sd["classifier.weight"]),
            bias=jnp.array(sd["classifier.bias"]),
        ),
    }
    print("converted: pool + fusion_query + classifier")

    # ---- phase 3: verify parity on held-out data ---------------------------
    def apply_fn(p, images, texts, rng_key, *, training=False):
        kv = jnp.stack([images, texts], axis=1)
        # The unexpanded (1,1,E) query rides the shared-query fused kernel
        # on TPU; training=True adds curriculum masking (stats/regularizer
        # only — reference quirk Q1 keeps outputs identical).
        out, _, _, info = ops.fusion_pool(
            p["pool"], p["query"], kv,
            rng=rng_key, training=training,
        )
        return linear(p["cls"], out[:, 0, :]), info

    vi, vt, vl = _make_data(512, seed=3)
    with torch.no_grad():
        torch_logits = model(torch.tensor(vi), torch.tensor(vt)).numpy()
    jax_logits = np.asarray(
        jax.jit(lambda p, a, b: apply_fn(p, a, b, None)[0])(
            params, jnp.asarray(vi), jnp.asarray(vt)
        )
    )
    max_diff = float(np.abs(jax_logits - torch_logits).max())
    # f32 parity on CPU; TPU default-precision GEMMs land ~1e-3 of torch-f32
    tol = 1e-4 if jax.default_backend() == "cpu" else 5e-3
    assert max_diff < tol, f"parity failed: {max_diff} >= {tol}"
    print(f"parity: max |jax - torch| = {max_diff:.2e} on 512 held-out rows")

    # ---- phase 4: continue training in aecf_tpu ----------------------------
    optimizer = optax.adamw(args.lr, weight_decay=0.01)
    step = make_train_step(
        lambda p, a, b, k: apply_fn(p, a, b, k, training=True), optimizer
    )
    state = TrainState(
        params, optimizer.init(params), jnp.zeros((), jnp.int32)
    )
    jax_losses = []
    for i in range(args.jax_steps):
        sel = rng.integers(0, len(img), size=args.batch)
        state, loss, info = step(
            state,
            jnp.asarray(img[sel]),
            jnp.asarray(txt[sel]),
            jnp.asarray(lab[sel]),
            jax.random.key(i),
        )
        jax_losses.append(float(loss))
    print(
        f"aecf_tpu: {args.jax_steps} more AdamW steps (curriculum ON), "
        f"loss {jax_losses[0]:.4f} -> {jax_losses[-1]:.4f} "
        f"(mask_rate {float(info['mask_rate'].mean()):.3f})"
    )
    assert jax_losses[0] < torch_losses[0], (
        "continued run should start from the torch-trained loss level"
    )
    assert jax_losses[-1] < jax_losses[0], "continued training must descend"

    # ---- phase 5: persist the migrated + fine-tuned params -----------------
    out_dir = os.path.join(os.path.dirname(ckpt), "aecf_tpu_params")
    save_params(out_dir, state.params)
    print(f"saved migrated params -> {out_dir}")
    print("MIGRATION OK")


if __name__ == "__main__":
    main()
