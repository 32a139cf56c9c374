"""Multi-step AdamW training-trajectory lockstep against torch.

Single-call parity (forward values, gradients) is covered by
tests/test_attention.py and the golden suite; this file pins the full
TRAINING DYNAMICS: starting from byte-identical parameters (imported from a
live torch model via ``contrib.torch_compat``), K AdamW steps of the
reference protocol — AdamW(lr, wd=0.01) + BCEWithLogits on a pooled
classifier (xrays/train_xrays_example.py:312-327) — must produce the same
per-step loss trajectory and the same final parameters in torch and in
``make_train_step``.  This catches anything single-call tests can't: optimizer
formula drift (bias correction, eps placement, decoupled weight decay),
loss-reduction mismatches, and gradient errors too small to see in one step
but compounding over a trajectory.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
import torch

from aecf_tpu.contrib.torch_compat import (
    attention_pool_params_from_state_dict,
    fusion_query_from_state_dict,
)
from aecf_tpu.core.attention import attention_pool_core
from aecf_tpu.models.layers import LinearParams, linear
from aecf_tpu.train.trainer import TrainState, make_train_step

E, H, M, B, C = 32, 2, 3, 16, 5
LR, WD, STEPS = 1e-3, 0.01, 8


class TorchPoolClassifier(torch.nn.Module):
    """query → MultimodalAttentionPool-equivalent → Linear classifier —
    the L3 integration contract (reference README.md:180-208) in torch."""

    def __init__(self):
        super().__init__()
        self.fusion_query = torch.nn.Parameter(torch.randn(1, 1, E) * 0.02)
        self.attention = torch.nn.MultiheadAttention(E, H, batch_first=True)
        self.classifier = torch.nn.Linear(E, C)

    def forward(self, kv):
        q = self.fusion_query.expand(kv.shape[0], -1, -1)
        out, _ = self.attention(q, kv, kv, need_weights=False)
        return self.classifier(out.squeeze(1))


def _jax_params_from_torch(model: TorchPoolClassifier):
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    return {
        "pool": attention_pool_params_from_state_dict(sd),
        "query": fusion_query_from_state_dict(sd),
        # jnp.array (copying): detach().numpy() shares storage with the live
        # torch tensors, and jnp.asarray would alias it on CPU jax — torch's
        # in-place optimizer updates would then mutate these params.
        "cls": LinearParams(
            weight=jnp.array(sd["classifier.weight"]),
            bias=jnp.array(sd["classifier.bias"]),
        ),
    }


def _apply(params, images, texts, rng):
    del rng
    # (B, M, E) stack arrives pre-split as two "modalities" + their mean, so
    # the harness's (images, texts) batch contract carries M=3 modalities.
    kv = jnp.stack([images, texts, 0.5 * (images + texts)], axis=1)
    q = jnp.broadcast_to(params["query"], (kv.shape[0], 1, E))
    out, _ = attention_pool_core(
        params["pool"], q, kv, kv, num_heads=H, need_weights=False
    )
    return linear(params["cls"], out[:, 0, :]), {}


def _torch_batches(images, texts, labels):
    kv = np.stack([images, texts, 0.5 * (images + texts)], axis=1)
    return (
        torch.tensor(kv, dtype=torch.float32),
        torch.tensor(labels, dtype=torch.float32),
    )


@pytest.mark.parametrize("rotate_batches", [False, True])
def test_adamw_trajectory_matches_torch(rotate_batches):
    torch.manual_seed(0)
    model = TorchPoolClassifier()
    params = _jax_params_from_torch(model)

    rng = np.random.default_rng(1)
    n_batches = 3 if rotate_batches else 1
    batches = [
        (
            rng.normal(size=(B, E)).astype(np.float32),
            rng.normal(size=(B, E)).astype(np.float32),
            rng.integers(0, 2, size=(B, C)).astype(np.float32),
        )
        for _ in range(n_batches)
    ]

    # --- torch trajectory --------------------------------------------------
    opt = torch.optim.AdamW(model.parameters(), lr=LR, weight_decay=WD)
    criterion = torch.nn.BCEWithLogitsLoss()
    torch_losses = []
    for s in range(STEPS):
        kv, lab = _torch_batches(*batches[s % n_batches])
        opt.zero_grad()
        loss = criterion(model(kv), lab)
        loss.backward()
        opt.step()
        torch_losses.append(float(loss.detach()))

    # --- aecf_tpu trajectory ------------------------------------------------
    optimizer = optax.adamw(LR, weight_decay=WD)
    step = make_train_step(_apply, optimizer, donate=False)
    state = TrainState(params, optimizer.init(params), jnp.zeros((), jnp.int32))
    key = jax.random.key(0)  # unused by _apply; the step signature needs one
    jax_losses = []
    for s in range(STEPS):
        img, txt, lab = batches[s % n_batches]
        state, loss, _ = step(
            state, jnp.asarray(img), jnp.asarray(txt), jnp.asarray(lab), key
        )
        jax_losses.append(float(loss))

    # Per-step losses track torch through the whole trajectory …
    np.testing.assert_allclose(jax_losses, torch_losses, rtol=0, atol=1e-5)
    # … and the final parameters coincide (drift compounds over 8 updates;
    # 1e-5 leaves no room for optimizer-formula or gradient discrepancies).
    final_sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    final = state.params
    np.testing.assert_allclose(
        final["pool"].in_proj_weight, final_sd["attention.in_proj_weight"],
        atol=1e-5,
    )
    np.testing.assert_allclose(
        final["pool"].in_proj_bias, final_sd["attention.in_proj_bias"],
        atol=1e-5,
    )
    np.testing.assert_allclose(
        final["pool"].out_proj_weight, final_sd["attention.out_proj.weight"],
        atol=1e-5,
    )
    np.testing.assert_allclose(
        final["pool"].out_proj_bias, final_sd["attention.out_proj.bias"],
        atol=1e-5,
    )
    np.testing.assert_allclose(
        final["query"][0, 0], final_sd["fusion_query"][0, 0], atol=1e-5
    )
    np.testing.assert_allclose(
        final["cls"].weight, final_sd["classifier.weight"], atol=1e-5
    )
    np.testing.assert_allclose(
        final["cls"].bias, final_sd["classifier.bias"], atol=1e-5
    )
    # The trajectory actually moved (a vacuous match would pass trivially).
    assert abs(jax_losses[-1] - jax_losses[0]) > 1e-4
