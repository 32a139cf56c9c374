"""Model-family tests: shapes, presence routing, missing-modality semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aecf_tpu.models import (
    MedicalDiagnosisModel,
    MultiScaleFusion,
    VisionLanguageModel,
    XrayAECFModel,
    XrayBaselineModel,
)

KEY = jax.random.key(0)


class TestVisionLanguage:
    def setup_method(self):
        self.model = VisionLanguageModel(num_classes=10)
        self.params = self.model.init(KEY)

    def test_forward_shapes(self):
        img = jax.random.normal(jax.random.key(1), (4, 2048))
        txt = jax.random.normal(jax.random.key(2), (4, 768))
        logits = self.model.apply(self.params, img, txt)
        assert logits.shape == (4, 10)

    def test_training_with_info_and_entropy_loss(self):
        img = jax.random.normal(jax.random.key(1), (4, 2048))
        txt = jax.random.normal(jax.random.key(2), (4, 768))
        logits, info = self.model.apply(
            self.params,
            img,
            txt,
            training=True,
            rng=jax.random.key(3),
            return_info=True,
        )
        assert set(info) == {
            "entropy",
            "mask_rate",
            "target_entropy",
            "attention_weights",
            "masked_attention_weights",
        }
        assert info["attention_weights"].shape == (4, 1, 2)

    def test_jit_grad(self):
        img = jax.random.normal(jax.random.key(1), (4, 2048))
        txt = jax.random.normal(jax.random.key(2), (4, 768))

        @jax.jit
        def loss(params):
            logits = self.model.apply(params, img, txt)
            return (logits**2).mean()

        g = jax.grad(loss)(self.params)
        assert jnp.isfinite(g.fusion_query).all()
        assert jnp.abs(g.pool.in_proj_weight).max() > 0


class TestMedical:
    def setup_method(self):
        self.model = MedicalDiagnosisModel()
        self.params = self.model.init(KEY)

    def test_all_modalities(self):
        logits = self.model.apply(
            self.params,
            image=jnp.ones((2, 1024)),
            lab=jnp.ones((2, 50)),
            clinical=jnp.ones((2, 200)),
        )
        assert logits.shape == (2, 10)

    def test_missing_modalities_graceful(self):
        # Any subset works; absent slots are padded out of attention.
        l1 = self.model.apply(self.params, image=jnp.ones((2, 1024)))
        l2 = self.model.apply(
            self.params, lab=jnp.ones((2, 50)), clinical=jnp.ones((2, 200))
        )
        assert jnp.isfinite(l1).all() and jnp.isfinite(l2).all()

    def test_absent_modality_gets_zero_weight(self):
        _, info = self.model.apply(
            self.params,
            image=jax.random.normal(jax.random.key(1), (3, 1024)),
            lab=jax.random.normal(jax.random.key(2), (3, 50)),
            return_info=True,
        )
        w = info["attention_weights"]  # (3, 1, 3)
        np.testing.assert_allclose(w[:, :, 2], 0.0, atol=1e-6)
        np.testing.assert_allclose(w.sum(-1), 1.0, rtol=1e-5)

    def test_no_modalities_raises(self):
        with pytest.raises(ValueError, match="At least one"):
            self.model.apply(self.params)

    def test_masking_runs_whenever_training(self):
        """Masking must not be gated on return_info (reference module
        semantics): training with info requested reports a live mask, and
        training WITHOUT info still wires the training path — observable via
        the mandatory curriculum rng."""
        kwargs = dict(
            image=jax.random.normal(jax.random.key(1), (4, 1024)),
            lab=jax.random.normal(jax.random.key(2), (4, 50)),
            clinical=jax.random.normal(jax.random.key(3), (4, 200)),
        )
        _, info = self.model.apply(
            self.params, **kwargs,
            training=True, rng=jax.random.key(4), return_info=True,
        )
        assert float(info["mask_rate"].sum()) > 0.0
        assert "target_entropy" in info
        # return_info=False keeps the training path active: the masking rng
        # is still required (it would be silently unused under the old
        # `training and return_info` gating).
        with pytest.raises(ValueError):
            self.model.apply(self.params, **kwargs, training=True)
        logits = self.model.apply(
            self.params, **kwargs, training=True, rng=jax.random.key(4)
        )
        assert bool(jnp.isfinite(logits).all())


class TestMultiScale:
    def test_per_scale_fusion(self):
        model = MultiScaleFusion(dims=(32, 64))
        params = model.init(KEY)
        mods = [
            jax.random.normal(jax.random.key(1), (4, 2, 32)),
            jax.random.normal(jax.random.key(2), (4, 2, 64)),
        ]
        outs = model.apply(params, mods)
        assert outs[0].shape == (4, 32)
        assert outs[1].shape == (4, 64)

    def test_scale_count_mismatch(self):
        model = MultiScaleFusion(dims=(32, 64))
        params = model.init(KEY)
        with pytest.raises(ValueError, match="scales"):
            model.apply(params, [jnp.ones((2, 2, 32))])

    def test_per_scale_curriculum_info(self):
        """Each scale carries its own masking (README create_fusion_pool
        pattern): training info has the full key-set, eval drops
        target_entropy, and masking stats differ across scales."""
        model = MultiScaleFusion(dims=(32, 64), mask_prob=0.9)
        params = model.init(KEY)
        mods = [
            jax.random.normal(jax.random.key(1), (4, 2, 32)),
            jax.random.normal(jax.random.key(2), (4, 2, 64)),
        ]
        outs, infos = model.apply(
            params, mods, training=True, rng=jax.random.key(3),
            return_info=True,
        )
        assert len(infos) == 2
        for info in infos:
            assert set(info) == {
                "entropy", "mask_rate", "target_entropy",
                "attention_weights", "masked_attention_weights",
            }
            assert bool(jnp.isfinite(info["entropy"]).all())
        assert float(sum(i["mask_rate"].sum() for i in infos)) > 0.0
        # eval path: no target_entropy, zero mask rate
        _, einfos = model.apply(params, mods, return_info=True)
        for info in einfos:
            assert "target_entropy" not in info
            assert float(info["mask_rate"].sum()) == 0.0

    def test_masking_does_not_change_output(self):
        """Reference quirk Q1 holds per scale: outputs are identical with
        masking active vs eval mode."""
        model = MultiScaleFusion(dims=(32, 64), mask_prob=0.9)
        params = model.init(KEY)
        mods = [
            jax.random.normal(jax.random.key(1), (4, 2, 32)),
            jax.random.normal(jax.random.key(2), (4, 2, 64)),
        ]
        outs_train, _ = model.apply(
            params, mods, training=True, rng=jax.random.key(3),
            return_info=True,
        )
        outs_eval = model.apply(params, mods)
        for a, b in zip(outs_train, outs_eval):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    def test_training_requires_rng(self):
        model = MultiScaleFusion(dims=(32,))
        params = model.init(KEY)
        with pytest.raises(ValueError, match="rng"):
            model.apply(params, [jnp.ones((2, 2, 32))], training=True)


class TestXrayModels:
    def setup_method(self):
        self.baseline = XrayBaselineModel(num_classes=15)
        self.aecf = XrayAECFModel(num_classes=15)
        self.bparams = self.baseline.init(KEY)
        self.aparams = self.aecf.init(jax.random.key(1))

    def test_shapes(self):
        img = jax.random.normal(jax.random.key(2), (8, 512))
        txt = jax.random.normal(jax.random.key(3), (8, 512))
        assert self.baseline.apply(self.bparams, img, txt).shape == (8, 15)
        assert self.aecf.apply(self.aparams, img, txt).shape == (8, 15)

    def test_presence_routing_baseline(self):
        """Zeroed modalities route through the single-modality projections —
        rows with only images must be insensitive to text values."""
        img = jax.random.normal(jax.random.key(2), (4, 512))
        zeros = jnp.zeros((4, 512))
        out_a = self.baseline.apply(self.bparams, img, zeros)
        # Different (still zero-presence) text must give identical logits.
        out_b = self.baseline.apply(self.bparams, img, zeros * 2)
        np.testing.assert_array_equal(out_a, out_b)

    def test_presence_routing_differs_from_fusion(self):
        img = jax.random.normal(jax.random.key(2), (4, 512))
        txt = jax.random.normal(jax.random.key(3), (4, 512))
        both = self.aecf.apply(self.aparams, img, txt)
        img_only = self.aecf.apply(self.aparams, img, jnp.zeros_like(txt))
        assert not np.allclose(both, img_only)

    def test_all_missing_rows_zero_features(self):
        out = self.baseline.apply(
            self.bparams, jnp.zeros((2, 512)), jnp.zeros((2, 512))
        )
        # fused=0 → classifier applied to zeros → all rows identical.
        np.testing.assert_allclose(out[0], out[1], atol=1e-6)

    def test_curriculum_info(self):
        img = jax.random.normal(jax.random.key(2), (8, 512))
        txt = jax.random.normal(jax.random.key(3), (8, 512))
        logits, info = self.aecf.apply(
            self.aparams,
            img,
            txt,
            training=True,
            rng=jax.random.key(4),
            curriculum_enabled=True,
            return_info=True,
        )
        assert "entropy" in info and "mask_rate" in info
        assert "fusion_row_mask" in info
        assert bool(info["fusion_row_mask"].all())

    def test_no_curriculum_no_mask_stats(self):
        img = jax.random.normal(jax.random.key(2), (8, 512))
        txt = jax.random.normal(jax.random.key(3), (8, 512))
        _, info = self.aecf.apply(
            self.aparams,
            img,
            txt,
            training=True,
            rng=jax.random.key(4),
            curriculum_enabled=False,
            return_info=True,
        )
        assert "entropy" not in info
        assert "attention_weights" in info

    def test_missing_modality_simulation(self):
        key = jax.random.key(7)
        img = jnp.ones((512, 512))
        txt = jnp.ones((512, 512))
        m_img, m_txt = self.aecf.simulate_missing_modalities(key, img, txt)
        img_dropped = np.asarray(jnp.all(m_img == 0, axis=1))
        txt_dropped = np.asarray(jnp.all(m_txt == 0, axis=1))
        # Never both dropped (reference guarantee, :166-170).
        assert not (img_dropped & txt_dropped).any()
        # Drop rates near missing_prob=0.3.
        assert 0.2 < img_dropped.mean() < 0.4
        assert 0.2 < txt_dropped.mean() < 0.4

    def test_query_init_scale(self):
        # fusion_query ~ randn * 0.02 (reference :139).
        model = XrayAECFModel(hidden_dim=4096)
        params = model.init(jax.random.key(0))
        std = float(jnp.std(params.fusion_query))
        assert abs(std - 0.02) < 0.005
