"""Trainer-harness tests: train step descends, eval sweeps, tiny experiment."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from aecf_tpu.data import make_synthetic_clip_features
from aecf_tpu.models import XrayAECFModel, XrayBaselineModel
from aecf_tpu.train import (
    ExperimentConfig,
    TrainState,
    bce_with_logits_loss,
    evaluate_model,
    make_scan_train_step,
    make_train_step,
    mask_modality,
    train_parallel_experiment,
)


def test_bce_matches_torch_formula():
    logits = jnp.array([[0.5, -1.0], [2.0, 0.0]])
    labels = jnp.array([[1.0, 0.0], [0.0, 1.0]])
    # BCEWithLogits: max(x,0) - x*z + log(1+exp(-|x|)), mean.
    x, z = np.asarray(logits), np.asarray(labels)
    want = np.mean(np.maximum(x, 0) - x * z + np.log1p(np.exp(-np.abs(x))))
    rtol = 1e-6 if jax.default_backend() == "cpu" else 2e-5  # TPU sigmoid/log
    np.testing.assert_allclose(bce_with_logits_loss(logits, labels), want, rtol=rtol)


def test_mask_modality():
    img, txt = np.ones((2, 4)), np.ones((2, 4))
    mi, mt = mask_modality(img, txt, "images")
    assert (mi == 0).all() and (mt == 1).all()
    mi, mt = mask_modality(img, txt, "texts")
    assert (mi == 1).all() and (mt == 0).all()
    mi, mt = mask_modality(img, txt, "none")
    assert (mi == 1).all() and (mt == 1).all()


def test_train_step_descends():
    model = XrayAECFModel(image_dim=32, text_dim=32, hidden_dim=16, num_classes=5)
    params = model.init(jax.random.key(0))
    opt = optax.adamw(1e-3)
    state = TrainState(params, opt.init(params), jnp.zeros((), jnp.int32))

    def apply_fn(params, images, texts, rng):
        return model.apply(
            params, images, texts, training=True, rng=rng,
            curriculum_enabled=True, return_info=True,
        )

    step = make_train_step(apply_fn, opt)
    img = jax.random.normal(jax.random.key(1), (16, 32))
    txt = jax.random.normal(jax.random.key(2), (16, 32))
    lab = (jax.random.uniform(jax.random.key(3), (16, 5)) < 0.3).astype(
        jnp.float32
    )
    losses = []
    for i in range(15):
        state, loss, info = step(state, img, txt, lab, jax.random.key(i))
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    assert int(state.step) == 15


class TestGradAccum:
    """Gradient accumulation: same update math, microbatch-sized memory."""

    def _setup(self, batch=16):
        model = XrayAECFModel(
            image_dim=12, text_dim=12, hidden_dim=8, num_classes=4
        )
        params = model.init(jax.random.key(0))
        img = jax.random.normal(jax.random.key(1), (batch, 12))
        txt = jax.random.normal(jax.random.key(2), (batch, 12))
        lab = (
            jax.random.uniform(jax.random.key(3), (batch, 4)) < 0.3
        ).astype(jnp.float32)
        return model, params, img, txt, lab

    def test_accum_matches_single_step(self):
        """accum_steps=4 == accum_steps=1 on a deterministic apply: mean of
        equal-microbatch mean losses is the full-batch mean, so loss,
        grads, and the SGD update must agree to reassociation noise."""
        model, params, img, txt, lab = self._setup()
        opt = optax.sgd(0.1)

        def apply_fn(p, i, t, rng):
            return model.apply(p, i, t, training=False, return_info=True)

        new_states, losses, infos = [], [], []
        for k in (1, 4):
            state = TrainState(
                params, opt.init(params), jnp.zeros((), jnp.int32)
            )
            step = make_train_step(
                apply_fn, opt, donate=False, accum_steps=k
            )
            s, l, info = step(state, img, txt, lab, jax.random.key(9))
            new_states.append(s)
            losses.append(float(l))
            infos.append(info)
        np.testing.assert_allclose(losses[0], losses[1], rtol=1e-6)
        for a, b in zip(
            jax.tree.leaves(new_states[0].params),
            jax.tree.leaves(new_states[1].params),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-6, rtol=1e-5
            )
        # Per-sample info contract survives the microbatch scan: leaves are
        # re-flattened to full-batch layout in original row order.
        w1 = np.asarray(infos[0]["attention_weights"])
        w4 = np.asarray(infos[1]["attention_weights"])
        assert w1.shape == w4.shape
        np.testing.assert_allclose(w1, w4, atol=1e-6)

    def test_accum_with_curriculum_rng_path(self):
        """The rng-consuming path (curriculum masking + missing-modality
        sim) traces and descends under the microbatch scan."""
        model, params, img, txt, lab = self._setup()
        opt = optax.adamw(1e-3)
        state = TrainState(
            params, opt.init(params), jnp.zeros((), jnp.int32)
        )

        def apply_fn(p, i, t, rng):
            return model.apply(
                p, i, t, training=True, rng=rng,
                curriculum_enabled=True, missing_modality_training=True,
                return_info=True,
            )

        step = make_train_step(apply_fn, opt, accum_steps=2)
        losses = []
        for i in range(12):
            state, loss, info = step(state, img, txt, lab, jax.random.key(i))
            losses.append(float(loss))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0]
        assert int(state.step) == 12
        # entropy is per-sample → flattened back to the full batch
        assert np.asarray(info["entropy"]).shape[0] == img.shape[0]

    def test_indivisible_batch_rejected(self):
        model, params, img, txt, lab = self._setup(batch=10)
        opt = optax.sgd(0.1)
        state = TrainState(
            params, opt.init(params), jnp.zeros((), jnp.int32)
        )

        def apply_fn(p, i, t, rng):
            return model.apply(p, i, t, training=False, return_info=True)

        step = make_train_step(apply_fn, opt, accum_steps=4)
        with pytest.raises(ValueError, match="not divisible"):
            step(state, img, txt, lab, jax.random.key(0))

    def test_bad_accum_steps_rejected(self):
        with pytest.raises(ValueError, match="accum_steps"):
            make_train_step(lambda *a: None, optax.sgd(0.1), accum_steps=0)

    @pytest.mark.parametrize("batch,k", [(12, 3), (8, 8), (6, 2)])
    def test_accum_parity_edge_shapes(self, batch, k):
        """k == B (microbatch of one sample) and odd divisors keep exact
        parity with the plain step on a linear model."""
        W = jax.random.normal(jax.random.key(0), (5, 3)) * 0.1
        V = jax.random.normal(jax.random.key(1), (4, 3)) * 0.1
        params = {"W": W, "V": V}
        opt = optax.sgd(0.05)

        def apply_fn(p, i, t, rng):
            return i @ p["W"] + t @ p["V"], {"probe": (i @ p["W"])}

        img = jax.random.normal(jax.random.key(2), (batch, 5))
        txt = jax.random.normal(jax.random.key(3), (batch, 4))
        lab = (
            jax.random.uniform(jax.random.key(4), (batch, 3)) < 0.5
        ).astype(jnp.float32)
        outs = []
        for kk in (1, k):
            state = TrainState(
                params, opt.init(params), jnp.zeros((), jnp.int32)
            )
            step = make_train_step(
                apply_fn, opt, donate=False, accum_steps=kk
            )
            s, loss, info = step(state, img, txt, lab, jax.random.key(7))
            outs.append((s, float(loss), np.asarray(info["probe"])))
        np.testing.assert_allclose(outs[0][1], outs[1][1], rtol=1e-6)
        np.testing.assert_allclose(outs[0][2], outs[1][2], atol=1e-6)
        for a, b in zip(
            jax.tree.leaves(outs[0][0].params),
            jax.tree.leaves(outs[1][0].params),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-6
            )


class TestScanTrainStep:
    """Compiled multi-step chunk: K steps per dispatch via lax.scan."""

    def _setup(self, K=5, batch=8):
        model = XrayAECFModel(
            image_dim=12, text_dim=12, hidden_dim=8, num_classes=4
        )
        params = model.init(jax.random.key(0))

        def apply_fn(p, i, t, rng):
            return model.apply(
                p, i, t, training=True, rng=rng,
                curriculum_enabled=True, return_info=True,
            )

        img = jax.random.normal(jax.random.key(1), (K, batch, 12))
        txt = jax.random.normal(jax.random.key(2), (K, batch, 12))
        lab = (
            jax.random.uniform(jax.random.key(3), (K, batch, 4)) < 0.3
        ).astype(jnp.float32)
        return apply_fn, params, img, txt, lab

    def test_scan_chunk_matches_sequential_steps(self):
        """One K-step scan dispatch == K sequential make_train_step calls
        fed fold_in(rng, i) — including the curriculum RNG draws (both
        paths consume identical keys), so parity is exact up to float
        reassociation between the two compiled programs."""
        K = 5
        apply_fn, params, img, txt, lab = self._setup(K=K)
        opt = optax.sgd(0.1)
        rng = jax.random.key(9)

        state = TrainState(params, opt.init(params), jnp.zeros((), jnp.int32))
        chunk = make_scan_train_step(apply_fn, opt, donate=False)
        state_scan, losses, infos = chunk(state, img, txt, lab, rng)
        assert losses.shape == (K,)
        assert np.asarray(infos["entropy"]).shape == (K,)

        state_seq = TrainState(
            params, opt.init(params), jnp.zeros((), jnp.int32)
        )
        step = make_train_step(apply_fn, opt, donate=False)
        seq_losses = []
        for i in range(K):
            state_seq, loss, _ = step(
                state_seq, img[i], txt[i], lab[i],
                jax.random.fold_in(rng, i),
            )
            seq_losses.append(float(loss))
        np.testing.assert_allclose(
            np.asarray(losses), np.asarray(seq_losses), rtol=1e-6
        )
        assert int(state_scan.step) == int(state_seq.step) == K
        for a, b in zip(
            jax.tree.leaves(state_scan.params),
            jax.tree.leaves(state_seq.params),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-6, rtol=1e-5
            )

    def test_scan_chunks_chain_across_dispatches(self):
        """Two 2-step chunks == one 4-step chunk == 4 sequential steps:
        keys derive from the global state.step, so feeding a chunk's
        returned state into the next chunk continues the exact key
        stream (the property fit(scan_chunk=) relies on)."""
        K = 4
        apply_fn, params, img, txt, lab = self._setup(K=K)
        opt = optax.sgd(0.1)
        rng = jax.random.key(9)
        chunk = make_scan_train_step(apply_fn, opt, donate=False)

        state_a = TrainState(
            params, opt.init(params), jnp.zeros((), jnp.int32)
        )
        state_a, losses_a, _ = chunk(state_a, img, txt, lab, rng)

        state_b = TrainState(
            params, opt.init(params), jnp.zeros((), jnp.int32)
        )
        state_b, l0, _ = chunk(
            state_b, img[:2], txt[:2], lab[:2], rng
        )
        state_b, l1, _ = chunk(
            state_b, img[2:], txt[2:], lab[2:], rng
        )
        np.testing.assert_allclose(
            np.asarray(losses_a),
            np.concatenate([np.asarray(l0), np.asarray(l1)]),
            rtol=1e-6,
        )
        assert int(state_b.step) == K
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-6, rtol=1e-5
            ),
            state_a.params,
            state_b.params,
        )

    def test_scan_chunk_composes_with_accum(self):
        apply_fn, params, img, txt, lab = self._setup(K=3, batch=8)
        opt = optax.adamw(1e-3)
        state = TrainState(params, opt.init(params), jnp.zeros((), jnp.int32))
        chunk = make_scan_train_step(apply_fn, opt, accum_steps=2)
        state, losses, infos = chunk(state, img, txt, lab, jax.random.key(0))
        assert losses.shape == (3,) and np.isfinite(np.asarray(losses)).all()
        assert int(state.step) == 3


def test_evaluate_model_handles_ragged_batches():
    model = XrayBaselineModel(image_dim=8, text_dim=8, hidden_dim=4, num_classes=3)
    params = model.init(jax.random.key(0))
    predict = jax.jit(lambda p, i, t: model.apply(p, i, t, training=False))
    n = 10  # not a multiple of batch_size=4
    img = np.random.default_rng(0).normal(size=(n, 8)).astype(np.float32)
    txt = np.random.default_rng(1).normal(size=(n, 8)).astype(np.float32)
    lab = (np.random.default_rng(2).random((n, 3)) < 0.5).astype(np.float32)
    m, f1, per = evaluate_model(predict, params, img, txt, lab, "none", batch_size=4)
    assert 0.0 <= m <= 1.0
    assert per.shape == (3,)


def test_evaluate_model_single_compiled_shape_when_pad_exceeds_tail():
    """pad > rows-in-final-batch (n=10, batch=8 → tail 2, pad 6) must
    still pad to exactly batch_size: zeros_like(bi[:pad]) used to yield
    only tail-many pad rows, silently adding a second compiled shape."""
    model = XrayBaselineModel(image_dim=8, text_dim=8, hidden_dim=4, num_classes=3)
    params = model.init(jax.random.key(0))
    seen_shapes = []

    def predict(p, i, t):
        seen_shapes.append(i.shape)
        return model.apply(p, i, t, training=False)

    n = 10
    img = np.random.default_rng(0).normal(size=(n, 8)).astype(np.float32)
    txt = np.random.default_rng(1).normal(size=(n, 8)).astype(np.float32)
    lab = (np.random.default_rng(2).random((n, 3)) < 0.5).astype(np.float32)
    m, f1, per = evaluate_model(predict, params, img, txt, lab, "none", batch_size=8)
    assert set(seen_shapes) == {(8, 8)}, seen_shapes
    assert 0.0 <= m <= 1.0 and per.shape == (3,)


def test_tiny_parallel_experiment_runs():
    """2-epoch end-to-end experiment on synthetic data with curriculum
    activation at epoch 1 — the integration smoke of the reference's
    train_both_models protocol."""
    train, val = make_synthetic_clip_features(
        n_train=96, n_val=48, image_dim=16, text_dim=16, num_classes=5
    )
    baseline = XrayBaselineModel(image_dim=16, text_dim=16, hidden_dim=8, num_classes=5)
    aecf = XrayAECFModel(image_dim=16, text_dim=16, hidden_dim=8, num_classes=5)
    cfg = ExperimentConfig(
        epochs=2, batch_size=32, curriculum_epoch=1, eval_batch_size=48
    )
    results = train_parallel_experiment(
        baseline, aecf, train, val, cfg, verbose=False
    )
    for track in ("baseline", "aecf"):
        assert len(results[track]["train_loss"]) == 2
        assert len(results[track]["val_full_map"]) == 2
        assert len(results[track]["val_no_images_f1_per_label"]) == 2
    # Epoch 0: curriculum off → gate entropy 0; epoch 1: on → entropy > 0.
    assert results["aecf"]["gate_entropy"][0] == 0.0
    assert results["aecf"]["gate_entropy"][1] > 0.0
    assert results["aecf"]["mask_rate"][1] >= 0.0
    assert "_states" in results


class TestFusionRowsMean:
    """Gate-stat aggregation parity: the reference logs entropy/mask_rate
    over ONLY the both-present sub-batch (it runs the fusion pool on
    those rows alone, train_xrays_example.py:211-225, :380-383); dense
    TPU compute must recover that statistic via info['fusion_row_mask']."""

    def test_subbatch_mean_and_edge_cases(self):
        from aecf_tpu.train.trainer import _fusion_rows_mean

        x = jnp.array([[1.0], [2.0], [3.0], [4.0]])
        row = jnp.array([True, False, True, False])
        assert _fusion_rows_mean(x, row) == 2.0  # rows 0 and 2
        assert _fusion_rows_mean(x, None) == 2.5  # no mask → full mean
        assert _fusion_rows_mean(x, jnp.zeros(4, bool)) is None  # no fused rows

    def test_matches_reference_subbatch_forward(self):
        """The masked mean over a full-batch dense forward equals the
        entropy mean of a forward run on ONLY the both-present rows —
        exactly the statistic the reference computes via sub-batch
        indexing.  Eval mode: entropy is pre-mask and row-local, so the
        two forwards see identical per-row weights."""
        from aecf_tpu.train.trainer import _fusion_rows_mean

        model = XrayAECFModel(
            image_dim=12, text_dim=12, hidden_dim=8, num_classes=3
        )
        params = model.init(jax.random.key(0))
        rng = np.random.default_rng(7)
        img = rng.normal(size=(6, 12)).astype(np.float32)
        txt = rng.normal(size=(6, 12)).astype(np.float32)
        txt[1] = 0.0  # rows 1, 4 lose the text modality
        txt[4] = 0.0

        _, info = model.apply(
            params, jnp.asarray(img), jnp.asarray(txt),
            training=False, curriculum_enabled=True, return_info=True,
        )
        row = np.asarray(info["fusion_row_mask"])
        np.testing.assert_array_equal(row, [1, 0, 1, 1, 0, 1])

        _, sub_info = model.apply(
            params, jnp.asarray(img[row]), jnp.asarray(txt[row]),
            training=False, curriculum_enabled=True, return_info=True,
        )
        got = _fusion_rows_mean(info["entropy"], info["fusion_row_mask"])
        want = float(sub_info["entropy"].mean())
        np.testing.assert_allclose(got, want, rtol=1e-6)
        # and it differs from the naive full-batch mean (the old skew)
        assert abs(got - float(info["entropy"].mean())) > 1e-9
