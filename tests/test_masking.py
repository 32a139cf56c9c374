"""Unit tests for the curriculum-masking semantics contract (SURVEY.md §2.5).

Each numbered behavior of the reference CurriculumMasking.forward
(aecf/AECFLayer.py:130-283) gets a direct test; cross-framework golden parity
via mask injection lives in test_golden_parity.py.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aecf_tpu.core.masking import (
    EPS,
    compute_entropy,
    curriculum_mask,
    entropy_loss,
)
from aecf_tpu.nn import CurriculumMasking


KEY = jax.random.key(42)


class TestComputeEntropy:
    def test_uniform_is_log_l(self):
        w = jnp.full((4, 5), 0.2)
        np.testing.assert_allclose(
            compute_entropy(w), math.log(5), rtol=1e-6
        )

    def test_onehot_is_zero(self):
        w = jnp.array([[1.0, 0.0, 0.0]])
        np.testing.assert_allclose(compute_entropy(w), 0.0, atol=1e-7)

    def test_xlogy_zero_semantics(self):
        # 0 * log(0) must contribute 0, not NaN.
        w = jnp.array([[0.5, 0.5, 0.0]])
        np.testing.assert_allclose(
            compute_entropy(w), math.log(2), rtol=1e-6
        )

    def test_clamped_to_valid_range(self):
        # Unnormalized weights can push raw entropy outside [0, log L].
        w = jnp.array([[10.0, 10.0]])  # raw entropy negative
        h = compute_entropy(w)
        assert (h >= 0).all() and (h <= math.log(2) + 1e-6).all()


class TestEvalPath:
    def test_weights_unchanged_and_keyset(self):
        w = jax.nn.softmax(jax.random.normal(KEY, (8, 4)))
        out, info = curriculum_mask(w, training=False)
        np.testing.assert_array_equal(out, w)
        # Eval info has exactly entropy + mask_rate, NO target_entropy
        # (reference AECFLayer.py:150-156, verified at runtime in SURVEY).
        assert set(info) == {"entropy", "mask_rate"}
        np.testing.assert_array_equal(info["mask_rate"], 0.0)

    def test_eval_no_normalization(self):
        # Eval computes entropy on the raw weights — no scrub, no renorm.
        w = jnp.array([[2.0, 2.0]])  # unnormalized
        out, info = curriculum_mask(w, training=False)
        np.testing.assert_array_equal(out, w)
        # raw entropy = -2*(2*ln2) = -2.77 → clamped to 0
        np.testing.assert_allclose(info["entropy"], 0.0, atol=1e-6)


class TestTrainingPath:
    def test_trivial_seq_len_early_return(self):
        w = jnp.ones((3, 1))
        out, info = curriculum_mask(w, key=KEY, training=True)
        np.testing.assert_array_equal(out, w)
        assert set(info) == {"entropy", "mask_rate", "target_entropy"}
        for v in info.values():
            np.testing.assert_array_equal(v, 0.0)

    def test_training_keyset(self):
        w = jax.nn.softmax(jax.random.normal(KEY, (8, 4)))
        _, info = curriculum_mask(w, key=KEY, training=True)
        assert set(info) == {"entropy", "mask_rate", "target_entropy"}

    def test_target_entropy_value(self):
        w = jax.nn.softmax(jax.random.normal(KEY, (8, 4)))
        _, info = curriculum_mask(
            w, key=KEY, training=True, entropy_target=0.7
        )
        np.testing.assert_allclose(
            info["target_entropy"], math.log(4) * 0.7, rtol=1e-6
        )

    def test_nonfinite_scrubbed(self):
        w = jnp.array([[jnp.nan, 0.5, 0.5], [jnp.inf, 0.25, 0.25]])
        out, info = curriculum_mask(w, key=KEY, training=True, min_active=3)
        assert jnp.isfinite(out).all()
        assert jnp.isfinite(info["entropy"]).all()
        # Row 0: nan→0, renorm → [0, .5, .5]; min_active=3 keeps all.
        np.testing.assert_allclose(out[0], [0.0, 0.5, 0.5], atol=1e-6)

    def test_degenerate_row_goes_uniform(self):
        w = jnp.array([[0.0, 0.0, 0.0], [0.6, 0.2, 0.2]])
        out, info = curriculum_mask(w, key=KEY, training=True, min_active=3)
        # min_active=3=L forces the full mask, so output == normalized input.
        np.testing.assert_allclose(out[0], [1 / 3, 1 / 3, 1 / 3], rtol=1e-6)
        np.testing.assert_allclose(out[1], [0.6, 0.2, 0.2], rtol=1e-6)
        np.testing.assert_allclose(
            info["entropy"][0], math.log(3), rtol=1e-6
        )

    def test_unnormalized_rows_renormalized(self):
        w = jnp.array([[2.0, 6.0]])
        out, _ = curriculum_mask(w, key=KEY, training=True, min_active=2)
        np.testing.assert_allclose(out[0], [0.25, 0.75], rtol=1e-6)

    def test_rows_sum_to_one(self):
        w = jax.nn.softmax(jax.random.normal(KEY, (64, 4)))
        out, _ = curriculum_mask(
            w, key=KEY, training=True, base_mask_prob=0.9
        )
        np.testing.assert_allclose(out.sum(-1), 1.0, rtol=1e-5)

    def test_min_active_whole_row_replacement(self):
        # keep_prob ≈ 0 via base_mask_prob=1 and uniform weights (H = ln L):
        # every row fails min_active, so the mask is wholly replaced by the
        # top-k indicator — exactly the top-2 weights survive at 0.5 weight
        # ratio-preserved (verified against reference empirically, SURVEY §2.5
        # step 8).
        w = jnp.tile(jnp.array([[0.1, 0.4, 0.2, 0.3]]), (16, 1))
        # Force all-dropped Bernoulli mask via override of zeros.
        override = jnp.zeros_like(w)
        out, info = curriculum_mask(
            w,
            training=True,
            min_active=2,
            mask_override=override,
        )
        expected = jnp.tile(jnp.array([[0.0, 4 / 7, 0.0, 3 / 7]]), (16, 1))
        np.testing.assert_allclose(out, expected, rtol=1e-6)
        np.testing.assert_allclose(info["mask_rate"], 0.5, rtol=1e-6)

    def test_min_active_tie_break_first_occurrence(self):
        w = jnp.array([[0.25, 0.25, 0.25, 0.25]])
        out, _ = curriculum_mask(
            w,
            training=True,
            min_active=2,
            mask_override=jnp.zeros_like(w),
        )
        # Ties resolve to the lowest indices (torch.topk order).
        np.testing.assert_allclose(out[0], [0.5, 0.5, 0.0, 0.0], rtol=1e-6)

    def test_min_active_does_not_touch_satisfied_rows(self):
        w = jnp.tile(jnp.array([[0.5, 0.3, 0.2]]), (4, 1))
        override = jnp.array(
            [
                [1.0, 1.0, 0.0],  # satisfied
                [0.0, 0.0, 1.0],  # satisfied (1 >= min_active=1)
                [0.0, 0.0, 0.0],  # needs replacement → top-1 = idx 0
                [1.0, 1.0, 1.0],
            ]
        )
        out, _ = curriculum_mask(
            w, training=True, min_active=1, mask_override=override
        )
        np.testing.assert_allclose(out[0], [0.625, 0.375, 0.0], rtol=1e-6)
        np.testing.assert_allclose(out[1], [0.0, 0.0, 1.0], rtol=1e-6)
        np.testing.assert_allclose(out[2], [1.0, 0.0, 0.0], rtol=1e-6)
        np.testing.assert_allclose(out[3], [0.5, 0.3, 0.2], rtol=1e-6)

    def test_min_active_capped_at_seq_len(self):
        w = jax.nn.softmax(jax.random.normal(KEY, (4, 3)))
        out, info = curriculum_mask(
            w, key=KEY, training=True, min_active=10
        )
        # effective_min_active = 3 = L → everything survives.
        np.testing.assert_allclose(out.sum(-1), 1.0, rtol=1e-5)
        np.testing.assert_array_equal(info["mask_rate"], 0.0)

    def test_mask_rate_statistics(self):
        # With uniform weights, H/Hmax = 1 → p_mask = base_mask_prob exactly.
        base = 0.3
        w = jnp.full((4096, 4), 0.25)
        _, info = curriculum_mask(
            w,
            key=jax.random.key(7),
            training=True,
            base_mask_prob=base,
            min_active=1,
        )
        # min_active=1 replacement slightly lowers the observed rate; with
        # L=4, P(all dropped) = base^4 ≈ 0.8% → loose bound.
        assert abs(float(info["mask_rate"].mean()) - base) < 0.02

    def test_entropy_and_mask_rate_are_detached(self):
        def loss(w):
            _, info = curriculum_mask(
                w, training=True, mask_override=jnp.ones_like(w)
            )
            return info["entropy"].sum() + info["mask_rate"].sum()

        w = jax.nn.softmax(jax.random.normal(KEY, (4, 3)))
        g = jax.grad(loss)(w)
        np.testing.assert_array_equal(g, 0.0)

    def test_masked_weights_carry_gradient(self):
        def loss(w):
            out, _ = curriculum_mask(
                w, training=True, mask_override=jnp.ones_like(w)
            )
            return (out**2).sum()

        w = jax.nn.softmax(jax.random.normal(KEY, (4, 3)))
        g = jax.grad(loss)(w)
        assert jnp.abs(g).max() > 0
        assert jnp.isfinite(g).all()

    def test_gradient_finite_on_degenerate_rows(self):
        def loss(w):
            out, _ = curriculum_mask(
                w, training=True, mask_override=jnp.ones_like(w)
            )
            return out.sum()

        w = jnp.array([[0.0, 0.0, 0.0], [jnp.nan, 1.0, 1.0]])
        g = jax.grad(loss)(w)
        assert jnp.isfinite(g).all()

    def test_requires_key_in_training(self):
        w = jnp.full((2, 3), 1 / 3)
        with pytest.raises(ValueError, match="key"):
            curriculum_mask(w, training=True)

    def test_jit_and_traced_mask_prob(self):
        # base_mask_prob as a traced scalar must not recompile per value.
        @jax.jit
        def f(w, p, key):
            return curriculum_mask(
                w, key=key, training=True, base_mask_prob=p
            )

        w = jnp.full((8, 4), 0.25)
        out1, _ = f(w, 0.1, KEY)
        out2, _ = f(w, 0.9, KEY)
        assert out1.shape == out2.shape == w.shape

    def test_higher_entropy_masks_more(self):
        key = jax.random.key(3)
        low_h = jnp.tile(jnp.array([[0.97, 0.01, 0.01, 0.01]]), (8192, 1))
        high_h = jnp.full((8192, 4), 0.25)
        _, info_low = curriculum_mask(
            low_h, key=key, training=True, base_mask_prob=0.5
        )
        _, info_high = curriculum_mask(
            high_h, key=key, training=True, base_mask_prob=0.5
        )
        assert float(info_high["mask_rate"].mean()) > float(
            info_low["mask_rate"].mean()
        )


class TestEntropyLoss:
    def test_matches_formula(self):
        h = jnp.array([0.5, 0.6])
        target = math.log(3) * 0.7
        expected = np.mean((np.array([0.5, 0.6]) - target) ** 2)
        np.testing.assert_allclose(
            entropy_loss(h, seq_len=3, entropy_target=0.7),
            expected,
            rtol=1e-6,
        )

    def test_nan_scrub_semantics(self):
        h = jnp.array([jnp.nan, jnp.inf, -jnp.inf, 0.5])
        # nan→0, +inf→1, -inf→0 (reference AECFLayer.py:296).
        scrubbed = np.array([0.0, 1.0, 0.0, 0.5])
        target = math.log(2) * 0.7
        expected = np.mean((scrubbed - target) ** 2)
        np.testing.assert_allclose(
            entropy_loss(h, seq_len=2, entropy_target=0.7),
            expected,
            rtol=1e-6,
        )

    def test_seq_len_one_targets_zero(self):
        h = jnp.array([0.3])
        np.testing.assert_allclose(
            entropy_loss(h, seq_len=1), 0.09, rtol=1e-6
        )


class TestCurriculumMaskingModule:
    def test_constructor_validation(self):
        with pytest.raises(ValueError, match="base_mask_prob"):
            CurriculumMasking(base_mask_prob=0.0)
        with pytest.raises(ValueError, match="base_mask_prob"):
            CurriculumMasking(base_mask_prob=1.5)
        with pytest.raises(ValueError, match="entropy_target"):
            CurriculumMasking(entropy_target=0.0)
        with pytest.raises(ValueError, match="min_active"):
            CurriculumMasking(min_active=0)

    def test_defaults(self):
        m = CurriculumMasking()
        assert m.base_mask_prob == 0.15
        assert m.entropy_target == 0.7
        assert m.min_active == 1
        assert m.training

    def test_last_seq_len_cache(self):
        m = CurriculumMasking()
        assert m._last_seq_len == 2  # reference default
        w = jnp.full((4, 5), 0.2)
        m(w, rng=KEY)
        assert m._last_seq_len == 5
        # entropy_loss now targets log(5) * 0.7
        h = jnp.array([1.0])
        np.testing.assert_allclose(
            m.entropy_loss(h),
            (1.0 - math.log(5) * 0.7) ** 2,
            rtol=1e-6,
        )

    def test_eval_does_not_update_cache(self):
        m = CurriculumMasking().eval()
        m(jnp.full((4, 5), 0.2))
        assert m._last_seq_len == 2

    def test_train_eval_switch(self):
        m = CurriculumMasking()
        w = jax.nn.softmax(jax.random.normal(KEY, (4, 3)))
        m.eval()
        out, info = m(w)
        np.testing.assert_array_equal(out, w)
        assert "target_entropy" not in info
        m.train()
        out, info = m(w, rng=KEY)
        assert "target_entropy" in info

    def test_repr(self):
        m = CurriculumMasking(base_mask_prob=0.2)
        assert "base_mask_prob=0.2" in repr(m)

    def test_readme_extreme_distribution_validation(self):
        # README.md:300-317 "performance validation" contract.
        m = CurriculumMasking()
        extreme = jnp.array([[1.0, 0.0, 0.0], [0.33, 0.33, 0.34]])
        masked, _ = m(extreme, rng=KEY)
        assert jnp.isfinite(masked).all()


class TestMaskProbSchedule:
    """First-class schedule= API (jit-native equivalent of the reference's
    CustomCurriculumMasking subclass pattern, README.md:341-351)."""

    def test_schedule_drives_mask_prob(self):
        from aecf_tpu import CurriculumMasking

        sched = lambda step: jnp.where(step < 10, 0.01, 0.95)
        m = CurriculumMasking(schedule=sched)
        w = jnp.full((4096, 4), 0.25)  # max entropy -> p_mask == base
        _, info_lo = m(w, rng=jax.random.key(0), step=0)
        _, info_hi = m(w, rng=jax.random.key(0), step=50)
        assert float(info_lo["mask_rate"].mean()) < 0.05
        assert float(info_hi["mask_rate"].mean()) > 0.5

    def test_schedule_requires_step(self):
        from aecf_tpu import CurriculumMasking

        m = CurriculumMasking(schedule=lambda s: 0.5)
        with pytest.raises(ValueError, match="step"):
            m(jnp.full((2, 3), 1 / 3), rng=jax.random.key(0))

    def test_single_compilation_across_schedule_values(self):
        from aecf_tpu import CurriculumMasking

        m = CurriculumMasking(
            schedule=lambda step: jnp.clip(0.05 + 0.01 * step, 0.0, 1.0)
        )

        @jax.jit
        def f(w, key, step):
            return m(w, rng=key, step=step)

        w = jnp.full((8, 4), 0.25)
        for s in range(6):
            f(w, jax.random.key(s), jnp.asarray(s))
        assert f._cache_size() == 1

    def test_pool_forwards_step(self):
        from aecf_tpu import CurriculumMasking, MultimodalAttentionPool

        pool = MultimodalAttentionPool(
            16,
            curriculum_masking=CurriculumMasking(
                schedule=lambda step: jnp.where(step < 5, 0.01, 0.95)
            ),
            key=jax.random.key(0),
            implementation="xla",
        ).train()
        q = jax.random.normal(jax.random.key(1), (512, 1, 16))
        kv = jax.random.normal(jax.random.key(2), (512, 3, 16))

        @jax.jit
        def run(step):
            _, info = pool(
                q, kv, return_info=True, rng=jax.random.key(3), step=step
            )
            return info["mask_rate"].mean()

        lo = float(run(jnp.asarray(0)))
        hi = float(run(jnp.asarray(100)))
        assert lo < hi
        assert run._cache_size() == 1

    def test_optax_schedule_interops(self):
        import optax

        from aecf_tpu import CurriculumMasking

        m = CurriculumMasking(
            schedule=optax.linear_schedule(
                init_value=0.05, end_value=0.5, transition_steps=100
            )
        )
        w = jnp.full((4096, 4), 0.25)
        _, early = m(w, rng=jax.random.key(0), step=0)
        _, late = m(w, rng=jax.random.key(0), step=100)
        assert float(early["mask_rate"].mean()) < float(
            late["mask_rate"].mean()
        )


def test_scheduled_module_eval_needs_no_step():
    """Train-then-evaluate with a schedule= must not demand step= at eval
    (mask prob is unused on the eval path)."""
    import jax
    import jax.numpy as jnp

    from aecf_tpu.nn import CurriculumMasking, create_fusion_pool

    sched = lambda step: 0.1 + 0.01 * jnp.asarray(step, jnp.float32)  # noqa: E731
    cm = CurriculumMasking(schedule=sched).train()
    w = jax.nn.softmax(
        jax.random.normal(jax.random.key(0), (4, 1, 3)), axis=-1
    )
    cm(w, rng=jax.random.key(1), step=7)  # train path needs step
    cm.eval()
    masked, info = cm(w)  # eval: no step, no rng — must not raise
    assert jnp.allclose(masked, w)

    # end-to-end through the pool module
    query, pool = create_fusion_pool(32, 3, key=jax.random.key(2))
    pool.curriculum_masking.schedule = sched
    pool.train()
    kv = jax.random.normal(jax.random.key(3), (4, 3, 32))
    pool(jnp.broadcast_to(query, (4, 1, 32)), kv,
         rng=jax.random.key(4), step=3)
    pool.eval()
    out = pool(jnp.broadcast_to(query, (4, 1, 32)), kv)  # no step
    assert out.shape == (4, 1, 32)


def test_scheduled_module_training_still_requires_step():
    import jax
    import jax.numpy as jnp
    import pytest

    from aecf_tpu.nn import CurriculumMasking

    cm = CurriculumMasking(schedule=lambda s: 0.1).train()
    w = jax.nn.softmax(
        jax.random.normal(jax.random.key(0), (4, 1, 3)), axis=-1
    )
    with pytest.raises(ValueError, match="step"):
        cm(w, rng=jax.random.key(1))


class TestEntropyGradient:
    def test_finite_at_exact_zero_weight(self):
        """xlogy autodiff at w=0 is log(0)=-inf → NaN; the analytic JVP
        must give a finite gradient (a -inf key_padding_mask slot makes
        exact zeros routine)."""
        w = jnp.array([[0.5, 0.5, 0.0]])
        g = jax.grad(lambda x: compute_entropy(x).sum())(w)
        assert np.isfinite(np.asarray(g)).all(), g

    def test_forward_matches_xlogy_exactly(self):
        """The custom JVP must not perturb the forward value (goldens are
        bit-for-bit)."""
        rng = np.random.default_rng(0)
        w = rng.dirichlet(np.ones(5), size=16).astype(np.float32)
        w[0, :2] = [1.0, 0.0]  # include exact zeros
        w[0, 2:] = 0.0
        from jax.scipy.special import xlogy

        want = np.clip(
            -np.asarray(xlogy(w, w)).sum(-1), 0.0, math.log(5)
        )
        np.testing.assert_array_equal(
            np.asarray(compute_entropy(jnp.asarray(w))), want
        )

    def test_interior_gradient_matches_autodiff_formula(self):
        w = jnp.asarray(
            np.random.default_rng(1).dirichlet(np.ones(4), size=8),
            jnp.float32,
        )
        g = jax.grad(lambda x: compute_entropy(x).sum())(w)
        want = -(np.log(np.asarray(w)) + 1.0)
        np.testing.assert_allclose(np.asarray(g), want, rtol=1e-5)
