"""ops.fusion_pool dispatch semantics (CPU: xla fallback paths)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aecf_tpu.core.attention import attention_pool_core
from aecf_tpu.core.init import init_attention_pool_params, init_fusion_query
from aecf_tpu.core.masking import curriculum_mask
from aecf_tpu.ops import fusion_pool

KEY = jax.random.key(0)


@pytest.fixture(scope="module")
def setup():
    E, M, B = 16, 3, 8
    params = init_attention_pool_params(KEY, E)
    query = init_fusion_query(jax.random.key(1), E)
    kv = jax.random.normal(jax.random.key(2), (B, M, E))
    return params, query, kv, E, M, B


def test_auto_on_cpu_is_xla_and_matches_core(setup):
    params, query, kv, E, M, B = setup
    out, w, mw, info = fusion_pool(
        params, query, kv, rng=jax.random.key(3), training=True
    )
    q_full = jnp.broadcast_to(query, (B, 1, E))
    out_ref, w_ref = attention_pool_core(
        params, q_full, kv, kv, num_heads=1, need_weights=True
    )
    np.testing.assert_allclose(out, out_ref, atol=1e-6)
    np.testing.assert_allclose(w, w_ref, atol=1e-6)
    assert set(info) == {"entropy", "mask_rate", "target_entropy"}
    # masked weights are detached
    assert mw.shape == (B, 1, M)


def test_padding_mask_xla_path(setup):
    params, query, kv, E, M, B = setup
    kpm = jnp.zeros((B, M), bool).at[:, 1].set(True)
    out, w, _, _ = fusion_pool(
        params, query, kv, training=False, key_padding_mask=kpm
    )
    np.testing.assert_allclose(np.asarray(w[:, :, 1]), 0.0, atol=1e-7)
    np.testing.assert_allclose(np.asarray(w.sum(-1)), 1.0, rtol=1e-5)


def test_per_row_query_supported(setup):
    params, _, kv, E, M, B = setup
    q = jax.random.normal(jax.random.key(5), (B, 1, E))
    out, w, _, _ = fusion_pool(params, q, kv, training=False)
    out_ref, w_ref = attention_pool_core(
        params, q, kv, kv, num_heads=1, need_weights=True
    )
    np.testing.assert_allclose(out, out_ref, atol=1e-6)


def test_generic_kernel_padding_matches_oracle(setup):
    """Per-row queries + key_padding_mask run through the generic fused
    kernel (interpret mode) and match the XLA oracle."""
    from aecf_tpu.kernels import fused_fusion_pool

    params, _, kv, E, M, B = setup
    q = jax.random.normal(jax.random.key(5), (B, 1, E))
    kpm = jnp.zeros((B, M), bool).at[:, 1].set(True)
    out_k, w_k, _, _ = fused_fusion_pool(
        params, q, kv, training=False, key_padding_mask=kpm, interpret=True
    )
    with jax.default_matmul_precision("highest"):
        out_o, w_o = attention_pool_core(
            params, q, kv, kv, num_heads=1, key_padding_mask=kpm,
            need_weights=True,
        )
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_o), atol=1e-5)
    np.testing.assert_allclose(np.asarray(w_k), np.asarray(w_o), atol=1e-5)
    np.testing.assert_allclose(np.asarray(w_k[:, :, 1]), 0.0, atol=1e-7)


def test_generic_kernel_bf16_features(setup):
    """bf16 feature storage on the generic kernel: f32-math weights stay
    within bf16-input tolerance of the f32 oracle."""
    from aecf_tpu.kernels import fused_fusion_pool

    params, _, kv, E, M, B = setup
    q = jax.random.normal(jax.random.key(5), (B, 1, E))
    out_k, w_k, _, _ = fused_fusion_pool(
        params,
        q.astype(jnp.bfloat16),
        kv.astype(jnp.bfloat16),
        training=False,
        interpret=True,
    )
    assert out_k.dtype == jnp.float32
    with jax.default_matmul_precision("highest"):
        out_o, w_o = attention_pool_core(
            params, q, kv, kv, num_heads=1, need_weights=True
        )
    np.testing.assert_allclose(
        np.asarray(out_k), np.asarray(out_o), atol=5e-2, rtol=5e-2
    )
    np.testing.assert_allclose(np.asarray(w_k.sum(-1)), 1.0, rtol=1e-5)


def test_masked_weights_match_core_masking(setup):
    params, query, kv, E, M, B = setup
    rng = jax.random.key(9)
    # implementation='xla' explicitly: the pallas kernel draws from the
    # in-kernel TPU PRNG, a different stream than jax.random.bernoulli
    # (docs/prng.md) — this test pins the XLA path's rng equivalence.
    out, w, mw, info = fusion_pool(
        params, query, kv, rng=rng, training=True, base_mask_prob=0.9,
        implementation="xla",
    )
    # The xla path must implement masking exactly as curriculum_mask: the
    # rng is consumed identically.
    mw_ref, info_ref = curriculum_mask(
        w, key=rng, training=True, base_mask_prob=0.9
    )
    np.testing.assert_allclose(mw, mw_ref, atol=1e-7)
    np.testing.assert_allclose(info["entropy"], info_ref["entropy"], atol=1e-7)


def test_unknown_implementation_raises():
    import pytest

    from aecf_tpu import ops
    from aecf_tpu.core.init import (
        init_attention_pool_params,
        init_fusion_query,
    )

    params = init_attention_pool_params(jax.random.key(0), 32)
    query = init_fusion_query(jax.random.key(1), 32)
    kv = jax.random.normal(jax.random.key(2), (4, 3, 32))
    with pytest.raises(ValueError, match="unknown implementation"):
        ops.fusion_pool(params, query, kv, implementation="typo")
