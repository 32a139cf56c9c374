"""Property-based invariants of the curriculum-masking core (hypothesis).

The golden suite pins exact reference values; these pin the CONTRACT over
the whole input space — arbitrary shapes, degenerate rows, non-finite
values — the way the reference's README "performance validation" snippet
samples extreme distributions (reference README.md:300-317), but
exhaustively.  Invariants follow SURVEY.md §2.5 steps 1-11.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from aecf_tpu.core.masking import curriculum_mask, entropy_loss

# CPU suite budget: modest example counts, no deadline (first call jits).
COMMON = dict(deadline=None, max_examples=40)


def _weights(draw, B, T, L, mode):
    shape = (B, T, L)
    if mode == "softmax":
        logits = draw(
            st.lists(
                st.floats(-20, 20),
                min_size=B * T * L,
                max_size=B * T * L,
            )
        )
        w = jax.nn.softmax(
            jnp.asarray(logits, jnp.float32).reshape(shape), axis=-1
        )
        return w
    # Weights are attention-weight-like: non-negative.  (Negative weights
    # produce NaN entropy in the REFERENCE too — torch.xlogy(-1, -1) is
    # NaN — so they are outside the behavioral contract.)  "dirty" adds
    # NaN/±Inf, which the scrub replaces with zeros (AECFLayer.py:173-176).
    elem = st.floats(0.0, 5.0)
    if mode == "dirty":
        elem = st.one_of(
            elem,
            st.just(float("nan")),
            st.just(float("inf")),
            st.just(float("-inf")),
        )
    vals = draw(
        st.lists(elem, min_size=B * T * L, max_size=B * T * L)
    )
    return jnp.asarray(vals, jnp.float32).reshape(shape)


@st.composite
def mask_case(draw, mode):
    B = draw(st.integers(1, 6))
    T = draw(st.integers(1, 2))
    L = draw(st.integers(1, 6))
    w = _weights(draw, B, T, L, mode)
    return (
        w,
        draw(st.floats(0.01, 1.0)),  # base_mask_prob
        draw(st.floats(0.01, 1.0)),  # entropy_target
        draw(st.integers(1, 8)),  # min_active
        draw(st.integers(0, 2**31 - 1)),  # seed
    )


class TestTrainingInvariants:
    @settings(**COMMON)
    @given(case=mask_case("softmax"))
    def test_softmax_rows(self, case):
        w, p, t, k, seed = case
        L = w.shape[-1]
        out, info = curriculum_mask(
            w, key=jax.random.key(seed), training=True,
            base_mask_prob=p, entropy_target=t, min_active=k,
        )
        out = np.asarray(out)
        assert np.isfinite(out).all()
        # masked+renormalized rows still sum to 1 (or pass through at L=1)
        np.testing.assert_allclose(out.sum(-1), 1.0, atol=1e-5)
        # survivors are a subset scaling-up of the input: zeros only where
        # the mask hit; no negative weights from non-negative input
        assert (out >= -1e-7).all()
        if L > 1:
            ent = np.asarray(info["entropy"])
            assert (ent >= -1e-6).all() and (ent <= math.log(L) + 1e-5).all()
            rate = np.asarray(info["mask_rate"])
            assert (rate >= -1e-7).all() and (rate <= 1.0 + 1e-7).all()
            # min_active: every row keeps at least min(k, L) entries,
            # or all L (the degenerate-row fallback returns the full
            # row).  Per-row form — a global `.any()` disjunct would be
            # vacuously satisfied by any one fallback row in the batch.
            kept = (out > 0).sum(-1)
            assert ((kept >= min(k, L)) | (kept == L)).all()
            assert set(np.asarray(info["target_entropy"]).ravel()) == {
                np.float32(math.log(L) * np.float32(t))
            }
        # entropy_loss is finite and non-negative for any entropy input
        loss = entropy_loss(info["entropy"], seq_len=L, entropy_target=t)
        assert np.isfinite(float(loss)) and float(loss) >= 0.0

    @settings(**COMMON)
    @given(case=mask_case("uniformish"))
    def test_arbitrary_finite_rows(self, case):
        """Rows that don't sum to 1 (negative entries, zero rows): the
        normalize → mask → renormalize chain must still produce finite
        outputs and a valid info dict (reference steps 2-3, 9)."""
        w, p, t, k, seed = case
        out, info = curriculum_mask(
            w, key=jax.random.key(seed), training=True,
            base_mask_prob=p, entropy_target=t, min_active=k,
        )
        assert np.isfinite(np.asarray(out)).all()
        for v in info.values():
            assert np.isfinite(np.asarray(v)).all()

    @settings(**COMMON)
    @given(case=mask_case("dirty"))
    def test_nan_inf_scrubbed(self, case):
        """NaN/Inf inputs are scrubbed to zeros before normalization
        (reference AECFLayer.py:173-176) — outputs are always finite.
        EXCEPT at L == 1: the early return (AECFLayer.py:160-167) comes
        BEFORE the scrub, so a NaN single-modality row passes through as
        NaN in the reference too — parity means preserving that."""
        w, p, t, k, seed = case
        out, info = curriculum_mask(
            w, key=jax.random.key(seed), training=True,
            base_mask_prob=p, entropy_target=t, min_active=k,
        )
        if w.shape[-1] <= 1:
            np.testing.assert_array_equal(np.asarray(out), np.asarray(w))
            return
        assert np.isfinite(np.asarray(out)).all()
        for key_, v in info.items():
            assert np.isfinite(np.asarray(v)).all(), key_

    @settings(**COMMON)
    @given(case=mask_case("softmax"))
    def test_determinism_and_key_sensitivity(self, case):
        w, p, t, k, seed = case
        kw = dict(
            training=True, base_mask_prob=p, entropy_target=t, min_active=k
        )
        a, _ = curriculum_mask(w, key=jax.random.key(seed), **kw)
        b, _ = curriculum_mask(w, key=jax.random.key(seed), **kw)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestEvalInvariants:
    @settings(**COMMON)
    @given(case=mask_case("softmax"))
    def test_eval_passthrough(self, case):
        """Eval returns weights UNchanged — no normalization, no scrub —
        with info exactly {entropy, mask_rate} and mask_rate == 0
        (reference AECFLayer.py:150-156)."""
        w, p, t, k, _ = case
        out, info = curriculum_mask(
            w, training=False,
            base_mask_prob=p, entropy_target=t, min_active=k,
        )
        np.testing.assert_array_equal(np.asarray(out), np.asarray(w))
        assert set(info) == {"entropy", "mask_rate"}
        assert float(np.abs(np.asarray(info["mask_rate"])).max()) == 0.0
