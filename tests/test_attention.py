"""Golden parity of the attention-pool math against torch.nn.MultiheadAttention.

The reference delegates ALL heavy math to torch MHA (aecf/AECFLayer.py:515-521);
our core must match it to 1e-5 given identical parameters.  torch-cpu is in
the image, so parity is checked live by copying our packed params into a torch
module — no golden files needed.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from aecf_tpu.core.attention import (
    AttentionPoolParams,
    attention_pool_core,
    scaled_dot_product_attention,
)
from aecf_tpu.core.init import init_attention_pool_params

ATOL = 1e-5 if jax.default_backend() == "cpu" else 2e-4  # TPU transcendentals


def make_params(key, embed_dim, bias=True):
    return init_attention_pool_params(key, embed_dim, bias=bias)


def to_torch_mha(params: AttentionPoolParams, embed_dim, num_heads, bias):
    mha = torch.nn.MultiheadAttention(
        embed_dim, num_heads, bias=bias, batch_first=True
    )
    with torch.no_grad():
        mha.in_proj_weight.copy_(torch.tensor(np.asarray(params.in_proj_weight)))
        mha.out_proj.weight.copy_(
            torch.tensor(np.asarray(params.out_proj_weight))
        )
        if bias:
            mha.in_proj_bias.copy_(torch.tensor(np.asarray(params.in_proj_bias)))
            mha.out_proj.bias.copy_(
                torch.tensor(np.asarray(params.out_proj_bias))
            )
    mha.eval()
    return mha


@pytest.mark.parametrize("num_heads", [1, 4, 8])
@pytest.mark.parametrize("bias", [True, False])
def test_matches_torch_mha(num_heads, bias):
    E, B, S, T = 64, 5, 3, 2
    key = jax.random.key(0)
    kp, kq, kk, kv = jax.random.split(key, 4)
    params = make_params(kp, E, bias=bias)
    q = jax.random.normal(kq, (B, T, E))
    k = jax.random.normal(kk, (B, S, E))
    v = jax.random.normal(kv, (B, S, E))

    out, weights = attention_pool_core(
        params, q, k, v, num_heads=num_heads, need_weights=True
    )

    mha = to_torch_mha(params, E, num_heads, bias)
    tq, tk, tv = (
        torch.tensor(np.asarray(x), dtype=torch.float32) for x in (q, k, v)
    )
    with torch.no_grad():
        t_out, t_weights = mha(
            tq, tk, tv, need_weights=True, average_attn_weights=True
        )

    np.testing.assert_allclose(out, t_out.numpy(), atol=ATOL)
    np.testing.assert_allclose(weights, t_weights.numpy(), atol=ATOL)


def test_matches_torch_mha_key_padding_mask():
    E, B, S = 32, 4, 5
    key = jax.random.key(1)
    kp, kq, kk = jax.random.split(key, 3)
    params = make_params(kp, E)
    q = jax.random.normal(kq, (B, 1, E))
    k = jax.random.normal(kk, (B, S, E))
    kpm = jnp.array(
        [[False, False, True, False, True]] * B
    )

    out, weights = attention_pool_core(
        params, q, k, k, num_heads=4, key_padding_mask=kpm, need_weights=True
    )

    mha = to_torch_mha(params, E, 4, True)
    tq = torch.tensor(np.asarray(q))
    tk = torch.tensor(np.asarray(k))
    with torch.no_grad():
        t_out, t_weights = mha(
            tq,
            tk,
            tk,
            key_padding_mask=torch.tensor(np.asarray(kpm)),
            need_weights=True,
        )
    np.testing.assert_allclose(out, t_out.numpy(), atol=ATOL)
    np.testing.assert_allclose(weights, t_weights.numpy(), atol=ATOL)
    # Padded positions get zero weight.
    np.testing.assert_allclose(weights[:, :, 2], 0.0, atol=ATOL)
    np.testing.assert_allclose(weights[:, :, 4], 0.0, atol=ATOL)


def test_matches_torch_mha_attn_mask():
    E, B, S, T = 32, 3, 4, 2
    key = jax.random.key(2)
    kp, kq, kk = jax.random.split(key, 3)
    params = make_params(kp, E)
    q = jax.random.normal(kq, (B, T, E))
    k = jax.random.normal(kk, (B, S, E))
    am = jnp.array(
        [[False, True, False, False], [False, False, False, True]]
    )  # (T, S) bool, True = disallow

    out, weights = attention_pool_core(
        params, q, k, k, num_heads=2, attn_mask=am, need_weights=True
    )

    mha = to_torch_mha(params, E, 2, True)
    with torch.no_grad():
        t_out, t_weights = mha(
            torch.tensor(np.asarray(q)),
            torch.tensor(np.asarray(k)),
            torch.tensor(np.asarray(k)),
            attn_mask=torch.tensor(np.asarray(am)),
            need_weights=True,
        )
    np.testing.assert_allclose(out, t_out.numpy(), atol=ATOL)
    np.testing.assert_allclose(weights, t_weights.numpy(), atol=ATOL)


def test_weights_rows_sum_to_one():
    E = 16
    params = make_params(jax.random.key(3), E)
    q = jax.random.normal(jax.random.key(4), (2, 1, E))
    k = jax.random.normal(jax.random.key(5), (2, 3, E))
    _, weights = attention_pool_core(params, q, k, k, num_heads=1)
    np.testing.assert_allclose(weights.sum(-1), 1.0, rtol=1e-6)


def test_need_weights_false_returns_none():
    E = 16
    params = make_params(jax.random.key(3), E)
    q = jax.random.normal(jax.random.key(4), (2, 1, E))
    k = jax.random.normal(jax.random.key(5), (2, 3, E))
    out, weights = attention_pool_core(
        params, q, k, k, num_heads=1, need_weights=False
    )
    assert weights is None
    assert out.shape == (2, 1, E)


def test_fast_path_sdpa_matches_numpy():
    # Independent ground truth: softmax(q kᵀ / √E) v in numpy.
    E, B, S, T = 8, 2, 3, 1
    rng = np.random.default_rng(0)
    q = rng.normal(size=(B, T, E)).astype(np.float32)
    k = rng.normal(size=(B, S, E)).astype(np.float32)
    v = rng.normal(size=(B, S, E)).astype(np.float32)

    scores = np.einsum("bte,bse->bts", q, k) / math.sqrt(E)
    e = np.exp(scores - scores.max(-1, keepdims=True))
    attn = e / e.sum(-1, keepdims=True)
    expected = np.einsum("bts,bse->bte", attn, v)

    got = scaled_dot_product_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    np.testing.assert_allclose(got, expected, atol=ATOL)


def test_gradients_flow_and_match_torch():
    """fwd+bwd parity: gradients w.r.t. params match torch autograd."""
    E, B, S = 16, 3, 3
    key = jax.random.key(7)
    kp, kq, kk = jax.random.split(key, 3)
    params = make_params(kp, E)
    q = jax.random.normal(kq, (B, 1, E))
    k = jax.random.normal(kk, (B, S, E))

    def loss_fn(p):
        out, _ = attention_pool_core(p, q, k, k, num_heads=2, need_weights=False)
        return (out**2).sum()

    grads = jax.grad(loss_fn)(params)

    mha = to_torch_mha(params, E, 2, True)
    mha.train()
    tq = torch.tensor(np.asarray(q), requires_grad=False)
    tk = torch.tensor(np.asarray(k), requires_grad=False)
    t_out, _ = mha(tq, tk, tk, need_weights=False)
    (t_out**2).sum().backward()

    g_atol = 1e-4 if jax.default_backend() == "cpu" else 5e-4
    np.testing.assert_allclose(
        grads.in_proj_weight, mha.in_proj_weight.grad.numpy(), atol=g_atol
    )
    np.testing.assert_allclose(
        grads.out_proj_weight, mha.out_proj.weight.grad.numpy(), atol=g_atol
    )
    np.testing.assert_allclose(
        grads.in_proj_bias, mha.in_proj_bias.grad.numpy(), atol=g_atol
    )
    np.testing.assert_allclose(
        grads.out_proj_bias, mha.out_proj.bias.grad.numpy(), atol=g_atol
    )
