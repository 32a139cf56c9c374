"""Tests for missing-modality sweeps and debug utilities."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aecf_tpu.train import missing_modality_sweep, modality_subsets
from aecf_tpu.utils import assert_finite, debug_nans, tree_finite_report


class TestModalitySubsets:
    def test_two_modalities(self):
        subs = modality_subsets(["image", "text"])
        assert subs == [("image", "text"), ("image",), ("text",)]

    def test_three_modalities_count(self):
        assert len(modality_subsets(["a", "b", "c"])) == 7


class TestMissingModalitySweep:
    def test_sweep_shapes_and_degradation(self):
        """A predictor that only uses modality 'a' must degrade when 'a'
        is dropped and be unaffected when 'b' is."""
        rng = np.random.default_rng(0)
        n, c = 200, 4
        labels = (rng.random((n, c)) < 0.4).astype(np.float32)
        a = labels @ rng.normal(size=(c, 16)).astype(np.float32)
        b = rng.normal(size=(n, 8)).astype(np.float32)
        w = rng.normal(size=(16, c)).astype(np.float32) * 0.0
        # perfect linear head on modality a:
        w = np.linalg.lstsq(a, labels * 8 - 4, rcond=None)[0]

        def predict(a, b):
            return a @ w

        out = missing_modality_sweep(
            predict, {"a": a, "b": b}, labels, batch_size=64
        )
        assert set(out) == {("a", "b"), ("a",), ("b",)}
        assert out[("a", "b")]["map"] == pytest.approx(out[("a",)]["map"])
        assert out[("b",)]["map"] < out[("a",)]["map"]
        assert len(out[("a",)]["per_label_f1"]) == c

    def test_ragged_batches(self):
        labels = np.eye(3, dtype=np.float32)[np.arange(10) % 3]
        x = labels * 5

        def predict(x):
            return x

        out = missing_modality_sweep(predict, {"x": x}, labels, batch_size=4)
        assert out[("x",)]["map"] == pytest.approx(1.0)


class TestDebugUtils:
    def test_assert_finite_passes(self):
        assert_finite({"a": jnp.ones(3), "b": jnp.zeros((2, 2))})

    def test_assert_finite_raises_with_path(self):
        with pytest.raises(FloatingPointError, match="b"):
            assert_finite(
                {"a": jnp.ones(3), "b": jnp.array([1.0, jnp.nan])}
            )

    def test_tree_finite_report(self):
        rep = tree_finite_report(
            {"x": jnp.array([1.0, jnp.inf]), "y": jnp.ones(2)}
        )
        assert rep["['x']"][0] == 0.5
        assert rep["['y']"] == (1.0, 1.0)

    def test_debug_nans_context(self):
        with debug_nans(True):
            with pytest.raises((FloatingPointError, Exception)):
                jax.jit(lambda x: jnp.log(x) * 0 + jnp.sqrt(x))(
                    jnp.array(-1.0)
                ).block_until_ready()
        # restored afterwards
        assert not jax.config.jax_debug_nans
