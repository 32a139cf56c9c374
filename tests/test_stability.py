"""Numerical-stability stress tests: extreme magnitudes, degenerate rows,
adversarial inputs through the full stack (the reference's 'robustness'
claims, README.md:330-335, pushed harder than its validation snippet)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aecf_tpu import CurriculumMasking, MultimodalAttentionPool
from aecf_tpu.core.masking import curriculum_mask, entropy_loss

KEY = jax.random.key(0)


class TestMaskingStress:
    @pytest.mark.parametrize(
        "weights",
        [
            [[1e30, 1e30, 1e30]],  # huge but finite
            [[1e-30, 1e-30, 1e-30]],  # tiny positive (sum < eps → uniform)
            [[0.0, 1e-40, 0.0]],  # subnormal-ish
            [[0.5, jnp.nan, 0.5]],  # partial NaN (scrub path)
            [[jnp.inf, -jnp.inf, jnp.nan]],  # all non-finite
            [[1.0] + [0.0] * 7],  # L=8 one-hot
            # NOTE: negative weights are out of contract (inputs must be
            # probability rows, reference docstring AECFLayer.py:134-135);
            # the reference itself NaNs on them, so we don't test them.
        ],
    )
    def test_training_path_always_finite(self, weights):
        w = jnp.asarray(weights, jnp.float32)
        out, info = curriculum_mask(
            w, key=KEY, training=True, min_active=2
        )
        assert jnp.isfinite(out).all()
        for v in info.values():
            assert jnp.isfinite(v).all()

    def test_gradient_finite_on_stress_inputs(self):
        def loss(w):
            out, _ = curriculum_mask(
                w, training=True, mask_override=jnp.ones_like(w)
            )
            return out.sum()

        for w in (
            jnp.asarray([[1e30, 1e30, 1e30]]),
            jnp.asarray([[0.0, 0.0, 0.0]]),
            jnp.asarray([[1e-30, 1e-30, 1e-30]]),
        ):
            g = jax.grad(loss)(w)
            assert jnp.isfinite(g).all(), w

    def test_entropy_loss_extreme(self):
        # The reference scrubs nan→0, +inf→1, -inf→0 (AECFLayer.py:296);
        # huge *finite* values still overflow the square in both
        # implementations (out of contract — entropy from the pipeline is
        # clamped to [0, log L]).
        h = jnp.asarray([jnp.nan, jnp.inf, -jnp.inf, 0.5])
        v = entropy_loss(h, seq_len=4)
        assert jnp.isfinite(v)

    def test_large_seq_len(self):
        # L = 512 "modalities" — beyond the workload but must not break.
        w = jax.nn.softmax(jax.random.normal(KEY, (4, 512)))
        out, info = curriculum_mask(w, key=KEY, training=True, min_active=8)
        np.testing.assert_allclose(out.sum(-1), 1.0, rtol=1e-4)
        assert float(info["entropy"].max()) <= np.log(512) + 1e-4


class TestPoolStress:
    def test_huge_activations(self):
        pool = MultimodalAttentionPool(
            16,
            curriculum_masking=CurriculumMasking(),
            key=KEY,
            implementation="xla",
        ).train()
        q = jnp.full((2, 1, 16), 1e3)
        kv = jnp.full((2, 3, 16), -1e3)
        out, info = pool(q, kv, return_info=True, rng=jax.random.key(1))
        assert jnp.isfinite(out).all()
        assert jnp.isfinite(info["entropy"]).all()

    def test_saturated_softmax(self):
        # One modality dominating by 1e4 in score space → one-hot weights,
        # entropy 0, minimal masking.
        pool = MultimodalAttentionPool(
            8,
            curriculum_masking=CurriculumMasking(base_mask_prob=1.0),
            key=KEY,
            implementation="xla",
        ).train()
        kv = jnp.stack(
            [jnp.full((4, 8), 100.0), jnp.zeros((4, 8)), jnp.zeros((4, 8))],
            axis=1,
        )
        q = jnp.ones((4, 1, 8))
        out, info = pool(q, kv, return_info=True, rng=jax.random.key(1))
        assert jnp.isfinite(out).all()
        w = info["attention_weights"]
        np.testing.assert_allclose(np.asarray(w.sum(-1)), 1.0, rtol=1e-5)

    def test_batch_one(self):
        pool = MultimodalAttentionPool(8, key=KEY).eval()
        out = pool(jnp.ones((1, 1, 8)), jnp.ones((1, 2, 8)))
        assert out.shape == (1, 1, 8)
