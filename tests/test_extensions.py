"""Opt-in idiomatic extensions (SURVEY.md §2.5 build decision):
apply_masking_to_output and non-detached entropy.  Defaults must preserve
reference parity (quirks Q1/Q2); the flags flip them deliberately.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aecf_tpu import CurriculumMasking, MultimodalAttentionPool
from aecf_tpu.core.attention import apply_pooled_weights
from aecf_tpu.core.masking import curriculum_mask

KEY = jax.random.key(0)


class TestNonDetachedEntropy:
    def test_default_detached(self):
        def loss(w):
            _, info = curriculum_mask(
                w, training=True, mask_override=jnp.ones_like(w)
            )
            return info["entropy"].sum()

        g = jax.grad(loss)(jax.nn.softmax(jax.random.normal(KEY, (4, 3))))
        np.testing.assert_array_equal(g, 0.0)

    def test_opt_in_flows_gradient(self):
        def loss(w):
            _, info = curriculum_mask(
                w,
                training=True,
                mask_override=jnp.ones_like(w),
                detach_info=False,
            )
            return info["entropy"].sum()

        g = jax.grad(loss)(jax.nn.softmax(jax.random.normal(KEY, (4, 3))))
        assert jnp.abs(g).max() > 0
        assert jnp.isfinite(g).all()

    def test_module_flag(self):
        m = CurriculumMasking(detach_info=False)

        def loss(w):
            _, info = m(w, mask_override=jnp.ones_like(w))
            return (info["entropy"] ** 2).sum()

        g = jax.grad(loss)(jax.nn.softmax(jax.random.normal(KEY, (4, 3))))
        assert jnp.abs(g).max() > 0

    def test_entropy_regularizer_actually_trains(self):
        """With detach_info=False the entropy_loss term drives the weights
        toward the target entropy."""
        from aecf_tpu.core.masking import entropy_loss

        logits = jnp.array([[4.0, 0.0, 0.0]])  # low entropy start

        def loss(logits):
            w = jax.nn.softmax(logits)
            _, info = curriculum_mask(
                w,
                training=True,
                mask_override=jnp.ones_like(w),
                detach_info=False,
            )
            return entropy_loss(info["entropy"], seq_len=3)

        for _ in range(50):
            logits = logits - 0.5 * jax.grad(loss)(logits)
        final_entropy = float(
            -jnp.sum(
                jax.scipy.special.xlogy(
                    jax.nn.softmax(logits), jax.nn.softmax(logits)
                )
            )
        )
        assert abs(final_entropy - np.log(3) * 0.7) < 0.05


class TestApplyMaskingToOutput:
    def _pools(self, **kwargs):
        masking = CurriculumMasking(base_mask_prob=0.9)
        return MultimodalAttentionPool(
            16,
            curriculum_masking=masking,
            key=KEY,
            implementation="xla",
            **kwargs,
        ).train()

    def test_default_q1_preserved(self):
        pool = self._pools()
        q = jax.random.normal(jax.random.key(1), (4, 1, 16))
        kv = jax.random.normal(jax.random.key(2), (4, 3, 16))
        out_masked, _ = pool(q, kv, return_info=True, rng=jax.random.key(3))
        pool_plain = MultimodalAttentionPool(
            16, key=KEY, params=pool.params, implementation="xla"
        ).train()
        np.testing.assert_allclose(
            out_masked, pool_plain(q, kv), atol=1e-6
        )

    def test_opt_in_changes_output(self):
        pool = self._pools(apply_masking_to_output=True)
        q = jax.random.normal(jax.random.key(1), (4, 1, 16))
        kv = jax.random.normal(jax.random.key(2), (4, 3, 16))
        out, info = pool(q, kv, return_info=True, rng=jax.random.key(3))
        # Output must equal applying the masked weights to the values.
        expected = apply_pooled_weights(
            pool.params,
            info["masked_attention_weights"],
            kv,
            num_heads=1,
        )
        np.testing.assert_allclose(out, expected, atol=1e-6)
        # And differ from the unmasked output (mask_rate > 0 here).
        plain = MultimodalAttentionPool(
            16, key=KEY, params=pool.params, implementation="xla"
        ).train()(q, kv)
        assert not np.allclose(out, plain, atol=1e-6)

    def test_eval_masked_output_equals_plain(self):
        # Eval: masking passes weights through, so applying them gives the
        # same output.
        pool = self._pools(apply_masking_to_output=True).eval()
        q = jax.random.normal(jax.random.key(1), (4, 1, 16))
        kv = jax.random.normal(jax.random.key(2), (4, 3, 16))
        out, _ = pool(q, kv, return_info=True)
        plain = MultimodalAttentionPool(
            16, key=KEY, params=pool.params, implementation="xla"
        ).eval()(q, kv)
        np.testing.assert_allclose(out, plain, atol=1e-6)

    def test_multihead_uniform_head_application(self):
        pool = MultimodalAttentionPool(
            16,
            num_heads=4,
            curriculum_masking=CurriculumMasking(base_mask_prob=0.9),
            key=KEY,
            implementation="xla",
            apply_masking_to_output=True,
        ).train()
        q = jax.random.normal(jax.random.key(1), (4, 1, 16))
        kv = jax.random.normal(jax.random.key(2), (4, 3, 16))
        out, info = pool(q, kv, return_info=True, rng=jax.random.key(3))
        expected = apply_pooled_weights(
            pool.params,
            info["masked_attention_weights"],
            kv,
            num_heads=4,
        )
        np.testing.assert_allclose(out, expected, atol=1e-6)


class TestPallasDispatchGates:
    """Configs whose semantics the fused kernels can't honor must fall back
    to the XLA path (otherwise e.g. the kernel's stop_gradient on entropy
    would silently zero the trainable-entropy extension's gradient on TPU)."""

    def _gate(self, pool, q, kv):
        return pool._pallas_supported(
            q, True, None, None, False, None
        )

    def test_detach_info_false_disables_pallas(self):
        q = jnp.zeros((4, 1, 16))
        kv = jnp.zeros((4, 3, 16))
        base = dict(key=KEY)
        pool = MultimodalAttentionPool(
            16, curriculum_masking=CurriculumMasking(), **base
        )
        assert self._gate(pool, q, kv)
        pool_nd = MultimodalAttentionPool(
            16,
            curriculum_masking=CurriculumMasking(detach_info=False),
            **base,
        )
        assert not self._gate(pool_nd, q, kv)

    def test_apply_masking_to_output_disables_pallas(self):
        q = jnp.zeros((4, 1, 16))
        kv = jnp.zeros((4, 3, 16))
        pool = MultimodalAttentionPool(
            16,
            curriculum_masking=CurriculumMasking(),
            key=KEY,
            apply_masking_to_output=True,
        )
        assert not self._gate(pool, q, kv)
