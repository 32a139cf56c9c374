"""Module-API tests: MultimodalAttentionPool behavior contract.

Covers constructor validation, info-dict key sets, the Q1 quirk (masking does
not change the output), rematerialization, and functional dispatch
(reference aecf/AECFLayer.py:322-552, :584-727).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import aecf_tpu
from aecf_tpu import (
    CurriculumMasking,
    MultimodalAttentionPool,
    create_fusion_pool,
    multimodal_attention_pool,
)
from aecf_tpu.core.attention import scaled_dot_product_attention

KEY = jax.random.key(0)


class TestConstructorValidation:
    def test_embed_dim_positive(self):
        with pytest.raises(ValueError, match="embed_dim"):
            MultimodalAttentionPool(embed_dim=0)

    def test_num_heads_positive(self):
        with pytest.raises(ValueError, match="num_heads"):
            MultimodalAttentionPool(embed_dim=8, num_heads=0)

    def test_divisibility(self):
        with pytest.raises(ValueError, match="divisible"):
            MultimodalAttentionPool(embed_dim=10, num_heads=3)

    def test_dropout_range(self):
        with pytest.raises(ValueError, match="dropout"):
            MultimodalAttentionPool(embed_dim=8, dropout=1.5)

    def test_precision_validated(self):
        with pytest.raises(ValueError, match="precision"):
            MultimodalAttentionPool(embed_dim=8, precision="fast")


def test_precision_knob_plumbs_both_paths():
    """precision= is the documented training-speed knob (docs/design.md
    "Precision policy"): 'default' opts into 1-pass bf16-input GEMMs.  On
    CPU both settings are plain f32, so outputs must agree exactly —
    this checks the plumbing (constructor → XLA context / fused kernel
    arg), not the TPU numerics (suite precision_ab_* measures those)."""
    q = jax.random.normal(jax.random.key(1), (4, 1, 32))
    kv = jax.random.normal(jax.random.key(2), (4, 3, 32))
    base = MultimodalAttentionPool(embed_dim=32, key=KEY).eval()
    fast = MultimodalAttentionPool(
        embed_dim=32, key=KEY, precision="default"
    ).eval()
    assert fast.precision == "default"
    np.testing.assert_allclose(
        np.asarray(base(q, kv)), np.asarray(fast(q, kv)), rtol=1e-6
    )
    # flows through create_fusion_pool's **kwargs too
    _, pool = create_fusion_pool(32, 3, key=KEY, precision="default")
    assert pool.precision == "default"


def test_precision_high_never_reaches_fused_kernels():
    """The fused kernels implement exactly 'default'/'highest'; 'high'
    must route to the XLA path (module gate + ops gate) or raise at the
    kernel boundary — never silently degrade to 1-pass bf16."""
    from aecf_tpu import ops
    from aecf_tpu.core.init import (
        init_attention_pool_params,
        init_fusion_query,
    )
    from aecf_tpu.kernels import fused_fusion_pool_shared

    q = jax.random.normal(jax.random.key(1), (1, 1, 32))
    kv = jax.random.normal(jax.random.key(2), (4, 3, 32))

    # module gate: 'high' disqualifies the pallas path even when forced
    pool = MultimodalAttentionPool(
        embed_dim=32, key=KEY, precision="high", implementation="pallas"
    ).eval()
    assert not pool._pallas_supported(q, True, None, None, False, None)
    out = pool(jnp.broadcast_to(q, (4, 1, 32)), kv)  # runs via XLA
    assert out.shape == (4, 1, 32)

    # kernel boundary: explicit 'high' is rejected, not degraded
    params = init_attention_pool_params(jax.random.key(0), 32)
    query = init_fusion_query(jax.random.key(1), 32)
    with pytest.raises(ValueError, match="precision"):
        fused_fusion_pool_shared(
            params, query, kv, precision="high", interpret=True
        )

    # ops gate: auto dispatch with 'high' lands on the XLA branch
    # (on CPU auto is XLA anyway; assert the call succeeds and matches
    # the 'highest' output exactly — both are plain f32 on CPU)
    hi = ops.fusion_pool(params, query, kv, precision="highest",
                         training=False)[0]
    h = ops.fusion_pool(params, query, kv, precision="high",
                        training=False)[0]
    np.testing.assert_allclose(np.asarray(hi), np.asarray(h), rtol=1e-6)


class TestForwardValidation:
    def setup_method(self):
        self.pool = MultimodalAttentionPool(embed_dim=8, key=KEY).eval()

    def test_rejects_2d(self):
        q = jnp.zeros((2, 8))
        k = jnp.zeros((2, 3, 8))
        with pytest.raises(ValueError, match="3D"):
            self.pool(q, k)

    def test_rejects_zero_src_len(self):
        q = jnp.zeros((2, 1, 8))
        k = jnp.zeros((2, 0, 8))
        with pytest.raises(ValueError, match="zero"):
            self.pool(q, k)

    def test_rejects_mismatched_key(self):
        q = jnp.zeros((2, 1, 8))
        k = jnp.zeros((3, 2, 8))
        with pytest.raises(ValueError, match="incompatible|mismatch"):
            self.pool(q, k)

    def test_rejects_mismatched_value(self):
        q = jnp.zeros((2, 1, 8))
        k = jnp.zeros((2, 3, 8))
        v = jnp.zeros((2, 4, 8))
        with pytest.raises(ValueError, match="Value"):
            self.pool(q, k, v)

    def test_rejects_non_array(self):
        with pytest.raises(TypeError):
            self.pool("not an array", jnp.zeros((2, 3, 8)))


class TestForward:
    def test_output_shape_and_value_defaults_to_key(self):
        pool = MultimodalAttentionPool(embed_dim=16, key=KEY).eval()
        q = jax.random.normal(jax.random.key(1), (4, 1, 16))
        k = jax.random.normal(jax.random.key(2), (4, 3, 16))
        out1 = pool(q, k)
        out2 = pool(q, k, k)
        assert out1.shape == (4, 1, 16)
        np.testing.assert_array_equal(out1, out2)

    def test_return_info_without_masking(self):
        pool = MultimodalAttentionPool(embed_dim=16, key=KEY).eval()
        q = jax.random.normal(jax.random.key(1), (4, 1, 16))
        k = jax.random.normal(jax.random.key(2), (4, 3, 16))
        out, info = pool(q, k, return_info=True)
        assert set(info) == {"attention_weights"}
        assert info["attention_weights"].shape == (4, 1, 3)

    def test_no_info_requested_returns_tensor(self):
        pool = MultimodalAttentionPool(embed_dim=16, key=KEY).eval()
        q = jax.random.normal(jax.random.key(1), (4, 1, 16))
        k = jax.random.normal(jax.random.key(2), (4, 3, 16))
        out = pool(q, k)
        assert isinstance(out, jax.Array)

    def test_training_info_keyset_with_masking(self):
        masking = CurriculumMasking(base_mask_prob=0.5)
        pool = MultimodalAttentionPool(
            embed_dim=16, curriculum_masking=masking, key=KEY
        ).train()
        q = jax.random.normal(jax.random.key(1), (4, 1, 16))
        k = jax.random.normal(jax.random.key(2), (4, 3, 16))
        out, info = pool(q, k, return_info=True, rng=jax.random.key(3))
        assert set(info) == {
            "entropy",
            "mask_rate",
            "target_entropy",
            "attention_weights",
            "masked_attention_weights",
        }
        assert out.shape == (4, 1, 16)

    def test_eval_info_keyset_with_masking(self):
        masking = CurriculumMasking(base_mask_prob=0.5)
        pool = MultimodalAttentionPool(
            embed_dim=16, curriculum_masking=masking, key=KEY
        ).eval()
        q = jax.random.normal(jax.random.key(1), (4, 1, 16))
        k = jax.random.normal(jax.random.key(2), (4, 3, 16))
        _, info = pool(q, k, return_info=True)
        # Eval: no target_entropy (reference AECFLayer.py:150-156).
        assert set(info) == {
            "entropy",
            "mask_rate",
            "attention_weights",
            "masked_attention_weights",
        }
        np.testing.assert_array_equal(info["mask_rate"], 0.0)

    def test_q1_masking_does_not_change_output(self):
        """Reference quirk Q1 (SURVEY.md §2.5): masked weights are NEVER
        applied to the output — identical params+inputs give identical outputs
        with and without curriculum masking."""
        q = jax.random.normal(jax.random.key(1), (4, 1, 16))
        k = jax.random.normal(jax.random.key(2), (4, 3, 16))
        plain = MultimodalAttentionPool(embed_dim=16, key=KEY).train()
        masked = MultimodalAttentionPool(
            embed_dim=16,
            curriculum_masking=CurriculumMasking(base_mask_prob=0.9),
            key=KEY,
        ).train()
        out_plain = plain(q, k)
        out_masked, info = masked(
            q, k, return_info=True, rng=jax.random.key(9)
        )
        np.testing.assert_allclose(out_plain, out_masked, atol=1e-6)
        assert float(info["mask_rate"].mean()) > 0  # masking did happen

    def test_masked_attention_weights_detached(self):
        masking = CurriculumMasking(base_mask_prob=0.5)
        pool = MultimodalAttentionPool(
            embed_dim=8, curriculum_masking=masking, key=KEY
        ).train()

        def f(q):
            _, info = pool(
                q,
                jnp.ones((2, 3, 8)),
                return_info=True,
                rng=jax.random.key(0),
            )
            return info["masked_attention_weights"].sum()

        g = jax.grad(f)(jax.random.normal(jax.random.key(1), (2, 1, 8)))
        np.testing.assert_array_equal(g, 0.0)

    def test_attention_weights_carry_gradient(self):
        masking = CurriculumMasking(base_mask_prob=0.5)
        pool = MultimodalAttentionPool(
            embed_dim=8, curriculum_masking=masking, key=KEY
        ).train()

        def f(q):
            _, info = pool(
                q,
                jax.random.normal(jax.random.key(2), (2, 3, 8)),
                return_info=True,
                rng=jax.random.key(0),
            )
            return (info["attention_weights"] ** 2).sum()

        g = jax.grad(f)(jax.random.normal(jax.random.key(1), (2, 1, 8)))
        assert jnp.abs(g).max() > 0

    def test_requires_rng_for_training_masking(self):
        masking = CurriculumMasking()
        pool = MultimodalAttentionPool(
            embed_dim=8, curriculum_masking=masking, key=KEY
        ).train()
        q = jnp.ones((2, 1, 8))
        k = jnp.ones((2, 3, 8))
        with pytest.raises(ValueError, match="rng"):
            pool(q, k)

    def test_batch_first_false(self):
        pool_bf = MultimodalAttentionPool(embed_dim=16, key=KEY).eval()
        pool_sf = MultimodalAttentionPool(
            embed_dim=16, batch_first=False, key=KEY, params=pool_bf.params
        ).eval()
        q = jax.random.normal(jax.random.key(1), (4, 1, 16))
        k = jax.random.normal(jax.random.key(2), (4, 3, 16))
        out_bf = pool_bf(q, k)
        out_sf = pool_sf(jnp.swapaxes(q, 0, 1), jnp.swapaxes(k, 0, 1))
        np.testing.assert_allclose(
            out_bf, jnp.swapaxes(out_sf, 0, 1), atol=1e-6
        )

    def test_use_checkpoint_same_values_and_grads(self):
        pool = MultimodalAttentionPool(embed_dim=16, key=KEY).train()
        q = jax.random.normal(jax.random.key(1), (4, 1, 16))
        k = jax.random.normal(jax.random.key(2), (4, 3, 16))

        def loss(params, ckpt):
            pool.params = params
            out = pool(q, k, use_checkpoint=ckpt)
            return (out**2).sum()

        p = pool.params
        g_plain = jax.grad(loss)(p, False)
        g_ckpt = jax.grad(loss)(p, True)
        np.testing.assert_allclose(
            g_plain.in_proj_weight, g_ckpt.in_proj_weight, atol=1e-6
        )

    def test_works_under_jit(self):
        masking = CurriculumMasking(base_mask_prob=0.3)
        pool = MultimodalAttentionPool(
            embed_dim=16, curriculum_masking=masking, key=KEY
        ).train()

        @jax.jit
        def step(q, k, rng):
            return pool(q, k, return_info=True, rng=rng)

        q = jax.random.normal(jax.random.key(1), (4, 1, 16))
        k = jax.random.normal(jax.random.key(2), (4, 3, 16))
        out, info = step(q, k, jax.random.key(5))
        assert out.shape == (4, 1, 16)
        assert jnp.isfinite(info["entropy"]).all()

    def test_repr(self):
        pool = MultimodalAttentionPool(embed_dim=8, key=KEY)
        assert "embed_dim=8" in repr(pool)
        assert "curriculum_masking=False" in repr(pool)


class TestFunctional:
    def test_fast_path_is_projection_free_sdpa(self):
        q = jax.random.normal(jax.random.key(1), (4, 1, 16))
        k = jax.random.normal(jax.random.key(2), (4, 3, 16))
        out = multimodal_attention_pool(q, k, training=False)
        np.testing.assert_allclose(
            out, scaled_dot_product_attention(q, k, k), atol=1e-6
        )

    def test_slow_path_uses_fresh_module(self):
        # Q3: fresh random init per call — different init keys differ.
        q = jax.random.normal(jax.random.key(1), (4, 1, 16))
        k = jax.random.normal(jax.random.key(2), (4, 3, 16))
        out_a = multimodal_attention_pool(
            q, k, num_heads=2, init_key=jax.random.key(10)
        )
        out_b = multimodal_attention_pool(
            q, k, num_heads=2, init_key=jax.random.key(11)
        )
        assert not np.allclose(out_a, out_b)
        # Same init key → deterministic.
        out_c = multimodal_attention_pool(
            q, k, num_heads=2, init_key=jax.random.key(10)
        )
        np.testing.assert_array_equal(out_a, out_c)

    def test_training_flag_routes_to_slow_path(self):
        q = jax.random.normal(jax.random.key(1), (2, 1, 8))
        k = jax.random.normal(jax.random.key(2), (2, 3, 8))
        out_fast = multimodal_attention_pool(q, k, training=False)
        out_slow = multimodal_attention_pool(
            q, k, training=True, init_key=jax.random.key(0)
        )
        assert not np.allclose(out_fast, out_slow)


class TestCreateFusionPool:
    def test_validation(self):
        with pytest.raises(ValueError, match="embed_dim"):
            create_fusion_pool(0, 2)
        with pytest.raises(ValueError, match="embed_dim"):
            create_fusion_pool(5.0, 2)
        with pytest.raises(ValueError, match="num_modalities"):
            create_fusion_pool(8, 0)
        with pytest.raises(ValueError, match="mask_prob"):
            create_fusion_pool(8, 2, mask_prob=0.0)

    def test_shapes_and_wiring(self):
        query, pool = create_fusion_pool(32, 3, mask_prob=0.25, key=KEY)
        assert query.shape == (1, 1, 32)
        assert pool.curriculum_masking is not None
        assert pool.curriculum_masking.base_mask_prob == 0.25
        assert pool.num_heads == 1  # default

    def test_query_init_scale(self):
        # N(0, √(2/E)) — check std on a big sample.
        query, _ = create_fusion_pool(4096, 2, key=KEY)
        std = float(jnp.std(query))
        assert abs(std - (2.0 / 4096) ** 0.5) < 0.1 * (2.0 / 4096) ** 0.5

    def test_end_to_end_usage(self):
        query, pool = create_fusion_pool(16, 3, key=KEY)
        pool.train()
        modalities = jax.random.normal(jax.random.key(1), (8, 3, 16))
        q = jnp.broadcast_to(query, (8, 1, 16))
        out, info = pool(
            q, modalities, return_info=True, rng=jax.random.key(2)
        )
        fused = out.squeeze(1)
        assert fused.shape == (8, 16)
        loss = pool.curriculum_masking.entropy_loss(info["entropy"])
        assert jnp.isfinite(loss)

    def test_kwargs_forwarding(self):
        _, pool = create_fusion_pool(32, 2, num_heads=8, key=KEY)
        assert pool.num_heads == 8


def test_package_exports():
    assert aecf_tpu.__version__ == "0.1.0"
    assert set(aecf_tpu.__all__) == {
        "CurriculumMasking",
        "MultimodalAttentionPool",
        "multimodal_attention_pool",
        "create_fusion_pool",
    }


def test_batch_first_false_stays_eligible_for_fused_dispatch(monkeypatch):
    """The shared-kv identity must be captured BEFORE the seq-first
    layout swap: swapaxes makes `value is key` False, which silently
    routed every batch_first=False caller off the fused kernels."""
    pool = MultimodalAttentionPool(
        64, num_heads=1, batch_first=False, implementation="pallas"
    )
    pool.eval()
    called = {}

    def fake_pallas_forward(params, query, kv, **kw):
        called["yes"] = True
        return jnp.zeros((kv.shape[0], 1, 64))

    monkeypatch.setattr(pool, "_pallas_forward", fake_pallas_forward)
    q = jnp.ones((1, 2, 64))   # (T=1, B=2, E) seq-first
    kv = jnp.ones((3, 2, 64))  # (S=3, B=2, E)
    pool(q, kv)  # value defaults to key
    assert called.get("yes"), "fused dispatch not taken for batch_first=False"


def test_multi_query_falls_back_to_xla_and_matches_oracle():
    """T>1 (multi-query pooling, reference AECFLayer.py:515-534) is
    outside the fused kernels' contract: the dispatch gate must route it
    to the XLA path silently — identical output to an explicit
    implementation='xla' pool, no kernel-boundary error."""
    cm = dict(base_mask_prob=0.3, entropy_target=0.6, min_active=1)
    forced = MultimodalAttentionPool(
        32, num_heads=2, implementation="pallas",
        curriculum_masking=CurriculumMasking(**cm), key=KEY,
    ).train()
    oracle = MultimodalAttentionPool(
        32, num_heads=2, implementation="xla",
        curriculum_masking=CurriculumMasking(**cm),
        params=forced.params,
    ).train()
    q = jax.random.normal(jax.random.key(1), (4, 3, 32))  # T=3
    kv = jax.random.normal(jax.random.key(2), (4, 5, 32))

    assert not forced._pallas_supported(q, True, None, None, False, None)
    rng = jax.random.key(7)
    out_f, info_f = forced(q, kv, rng=rng, return_info=True)
    out_x, info_x = oracle(q, kv, rng=rng, return_info=True)
    assert out_f.shape == (4, 3, 32)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_x))
    assert set(info_f) == set(info_x)
    # head-averaged weights keep the reference's (B, T, S) contract
    assert info_f["attention_weights"].shape == (4, 3, 5)


def test_detach_info_false_grads_finite_with_padding_mask():
    """detach_info=False routes to the XLA path where a -inf padded slot
    yields an exact-zero weight; the entropy term's gradient must stay
    finite (analytic xlogy JVP) instead of poisoning every param grad."""
    pool = MultimodalAttentionPool(
        32,
        num_heads=2,
        curriculum_masking=CurriculumMasking(detach_info=False),
    )
    q = jnp.ones((4, 1, 32))
    kv = jax.random.normal(jax.random.key(0), (4, 3, 32))
    mask = jnp.zeros((4, 3), bool).at[:, 2].set(True)  # pad last slot

    def loss(params):
        out, info = pool(
            q, kv, key_padding_mask=mask, params=params,
            rng=jax.random.key(1), return_info=True,
        )
        return jnp.mean(out**2) + jnp.mean(info["entropy"])

    g = jax.grad(loss)(pool.params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(bool(jnp.isfinite(x).all()) for x in leaves)
