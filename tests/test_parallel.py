"""Multi-device tests on the 8-virtual-CPU mesh (SURVEY.md §4c).

Checks the DP step's collectives produce exactly the single-device result,
and that sharded training runs end-to-end.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from aecf_tpu.core import AttentionPoolParams
from aecf_tpu.models import XrayAECFModel
from aecf_tpu.parallel import (
    data_mesh,
    data_model_mesh,
    make_dp_train_step,
    make_tp_train_step,
    replicate,
    shard_batch,
    shard_params_tp,
    tp_param_specs,
)
from aecf_tpu.train import TrainState, make_train_step

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


def _setup(batch=32):
    model = XrayAECFModel(
        image_dim=32, text_dim=32, hidden_dim=16, num_classes=5
    )
    params = model.init(jax.random.key(0))
    opt = optax.adamw(1e-3)
    state = TrainState(params, opt.init(params), jnp.zeros((), jnp.int32))
    img = jax.random.normal(jax.random.key(1), (batch, 32))
    txt = jax.random.normal(jax.random.key(2), (batch, 32))
    lab = (
        jax.random.uniform(jax.random.key(3), (batch, 5)) < 0.3
    ).astype(jnp.float32)
    return model, opt, state, img, txt, lab


def test_mesh_construction():
    mesh = data_mesh(8)
    assert mesh.axis_names == ("data",)
    mesh2 = data_model_mesh(8, model_parallelism=2)
    assert mesh2.devices.shape == (4, 2)


def test_dp_step_matches_single_device():
    """pmean-of-shard-grads == full-batch grads ⇒ identical update.

    Deterministic apply (no dropout/masking randomness) so the only
    difference is the collective path.  SGD, not AdamW: Adam's step-1 update
    is ~sign(g), which amplifies float-reordering noise on near-zero grads
    into O(lr) param flips and makes exact comparison meaningless.
    """
    model, _, _, img, txt, lab = _setup()
    opt = optax.sgd(0.1)
    params = model.init(jax.random.key(0))
    state = TrainState(params, opt.init(params), jnp.zeros((), jnp.int32))
    mesh = data_mesh(8)

    def apply_fn(params, images, texts, rng):
        logits = model.apply(params, images, texts, training=False)
        return logits, {}

    dp_step = make_dp_train_step(apply_fn, opt, mesh)
    single_step = make_train_step(apply_fn, opt)

    rng = jax.random.key(9)
    # Single-device step first: the DP step donates its state and
    # replicate() may alias buffers on the virtual-CPU mesh.
    new_single, loss_single, _ = single_step(state, img, txt, lab, rng)
    params2 = model.init(jax.random.key(0))
    state2 = TrainState(params2, opt.init(params2), jnp.zeros((), jnp.int32))
    state_dp = replicate(mesh, state2)
    batch = shard_batch(mesh, (img, txt, lab))
    new_dp, loss_dp, _ = dp_step(state_dp, *batch, rng)

    np.testing.assert_allclose(
        float(loss_dp), float(loss_single), rtol=1e-6
    )
    # With SGD the param delta is linear in the grads, so only float
    # summation-order noise remains.
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, atol=1e-5),
        new_dp.params,
        new_single.params,
    )


def test_dp_training_descends():
    model, opt, state, img, txt, lab = _setup(batch=64)
    mesh = data_mesh(8)

    def apply_fn(params, images, texts, rng):
        return (
            model.apply(
                params,
                images,
                texts,
                training=True,
                rng=rng,
                curriculum_enabled=True,
                missing_modality_training=True,
                return_info=True,
            )
        )

    dp_step = make_dp_train_step(apply_fn, opt, mesh)
    state = replicate(mesh, state)
    batch = shard_batch(mesh, (img, txt, lab))

    losses = []
    for i in range(10):
        state, loss, info = dp_step(state, *batch, jax.random.key(i))
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    assert np.isfinite(losses).all()
    assert "entropy" in info


def test_dp_accum_matches_dp_single():
    """DP × gradient accumulation: scanning each shard as 2 microbatches
    must reproduce the plain DP update (deterministic apply + SGD)."""
    model, _, _, img, txt, lab = _setup(batch=64)
    opt = optax.sgd(0.1)
    mesh = data_mesh(8)

    def apply_fn(params, images, texts, rng):
        logits = model.apply(params, images, texts, training=False)
        return logits, {}

    results = []
    for k in (1, 2):
        params = model.init(jax.random.key(0))
        state = replicate(
            mesh,
            TrainState(params, opt.init(params), jnp.zeros((), jnp.int32)),
        )
        step = make_dp_train_step(
            apply_fn, opt, mesh, donate=False, accum_steps=k
        )
        batch = shard_batch(mesh, (img, txt, lab))
        new, loss, _ = step(state, *batch, jax.random.key(9))
        results.append((new, float(loss)))
    np.testing.assert_allclose(results[0][1], results[1][1], rtol=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5
        ),
        results[0][0].params,
        results[1][0].params,
    )


def test_dp_scan_chunk_matches_sequential_dp_steps():
    """One K-step DP scan dispatch == K sequential make_dp_train_step
    calls fed fold_in(rng, i): identical keys reach every shard (the scan
    folds step-major, then shard), so parity holds including the
    curriculum RNG path."""
    from aecf_tpu.parallel import make_dp_scan_train_step

    K, batch = 3, 32
    model = XrayAECFModel(
        image_dim=32, text_dim=32, hidden_dim=16, num_classes=5
    )
    opt = optax.sgd(0.1)
    mesh = data_mesh(8)

    def apply_fn(params, images, texts, rng):
        return model.apply(
            params, images, texts, training=True, rng=rng,
            curriculum_enabled=True, return_info=True,
        )

    img = jax.random.normal(jax.random.key(1), (K, batch, 32))
    txt = jax.random.normal(jax.random.key(2), (K, batch, 32))
    lab = (
        jax.random.uniform(jax.random.key(3), (K, batch, 5)) < 0.3
    ).astype(jnp.float32)
    rng = jax.random.key(9)

    from jax.sharding import NamedSharding, PartitionSpec as P

    params = model.init(jax.random.key(0))
    state = replicate(
        mesh, TrainState(params, opt.init(params), jnp.zeros((), jnp.int32))
    )
    chunk = make_dp_scan_train_step(apply_fn, opt, mesh, donate=False)
    staged = jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P(None, "data"))),
        (img, txt, lab),
    )
    state_scan, losses, infos = chunk(state, *staged, rng)
    assert losses.shape == (K,)
    assert np.asarray(infos["entropy"]).shape == (K,)

    state_seq = replicate(
        mesh, TrainState(params, opt.init(params), jnp.zeros((), jnp.int32))
    )
    step = make_dp_train_step(apply_fn, opt, mesh, donate=False)
    seq_losses = []
    for i in range(K):
        batch_i = shard_batch(mesh, (img[i], txt[i], lab[i]))
        state_seq, loss, _ = step(
            state_seq, *batch_i, jax.random.fold_in(rng, i)
        )
        seq_losses.append(float(loss))
    np.testing.assert_allclose(
        np.asarray(losses), np.asarray(seq_losses), rtol=1e-6
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6
        ),
        state_scan.params,
        state_seq.params,
    )


def test_tp_accum_matches_tp_single():
    """DP × TP × gradient accumulation on a (4, 2) mesh reproduces the
    non-accumulated TP update."""
    model = XrayAECFModel(
        image_dim=32, text_dim=32, hidden_dim=16, num_classes=5, num_heads=2
    )
    img = jax.random.normal(jax.random.key(1), (32, 32))
    txt = jax.random.normal(jax.random.key(2), (32, 32))
    lab = (
        jax.random.uniform(jax.random.key(3), (32, 5)) < 0.3
    ).astype(jnp.float32)
    opt = optax.sgd(0.1)
    mesh = data_model_mesh(8, model_parallelism=2)

    def apply_fn(params, images, texts, rng):
        logits = model.apply(params, images, texts, training=False)
        return logits, {}

    results = []
    for k in (1, 2):
        params = shard_params_tp(mesh, model.init(jax.random.key(0)))
        state = TrainState(
            params, opt.init(params), jnp.zeros((), jnp.int32)
        )
        step = make_tp_train_step(
            apply_fn, opt, mesh, donate=False, accum_steps=k
        )
        new, loss, _ = step(state, img, txt, lab, jax.random.key(9))
        results.append((new, float(loss)))
    np.testing.assert_allclose(results[0][1], results[1][1], rtol=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5
        ),
        results[0][0].params,
        results[1][0].params,
    )


def test_tp_scan_chunk_matches_sequential_tp_steps():
    """One K-step GSPMD TP scan dispatch == K sequential
    make_tp_train_step calls fed fold_in(rng, i): the chunk folds the
    global state.step, so a fresh state consumes identical keys — and
    the curriculum RNG path is live (training=True apply)."""
    from aecf_tpu.parallel import make_tp_scan_train_step

    K, batch = 3, 32
    model = XrayAECFModel(
        image_dim=32, text_dim=32, hidden_dim=16, num_classes=5,
        num_heads=2,
    )
    opt = optax.sgd(0.1)
    mesh = data_model_mesh(8, model_parallelism=2)

    def apply_fn(params, images, texts, rng):
        return model.apply(
            params, images, texts, training=True, rng=rng,
            curriculum_enabled=True, return_info=True,
        )

    img = jax.random.normal(jax.random.key(1), (K, batch, 32))
    txt = jax.random.normal(jax.random.key(2), (K, batch, 32))
    lab = (
        jax.random.uniform(jax.random.key(3), (K, batch, 5)) < 0.3
    ).astype(jnp.float32)
    rng = jax.random.key(9)

    params = shard_params_tp(mesh, model.init(jax.random.key(0)))
    state = TrainState(params, opt.init(params), jnp.zeros((), jnp.int32))
    chunk = make_tp_scan_train_step(apply_fn, opt, mesh, donate=False)
    state_scan, losses, infos = chunk(state, img, txt, lab, rng)
    assert losses.shape == (K,)
    assert np.asarray(infos["entropy"]).shape == (K,)
    # params stay head-sharded through the scan
    assert len(
        state_scan.params.pool.in_proj_weight.sharding.device_set
    ) == 8

    params2 = shard_params_tp(mesh, model.init(jax.random.key(0)))
    state_seq = TrainState(
        params2, opt.init(params2), jnp.zeros((), jnp.int32)
    )
    step = make_tp_train_step(apply_fn, opt, mesh, donate=False)
    seq_losses = []
    for i in range(K):
        state_seq, loss, _ = step(
            state_seq, img[i], txt[i], lab[i], jax.random.fold_in(rng, i)
        )
        seq_losses.append(float(loss))
    np.testing.assert_allclose(
        np.asarray(losses), np.asarray(seq_losses), rtol=1e-5
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5
        ),
        state_scan.params,
        state_seq.params,
    )


def test_tp_scan_chunk_composes_with_accum():
    """TP scan chunk × gradient accumulation reproduces the
    non-accumulated chunk (deterministic apply + SGD, so the only
    degree of freedom is the accumulation split + its in-body
    microbatch sharding constraint)."""
    from aecf_tpu.parallel import make_tp_scan_train_step

    K, batch = 2, 32
    model = XrayAECFModel(
        image_dim=32, text_dim=32, hidden_dim=16, num_classes=5,
        num_heads=2,
    )
    opt = optax.sgd(0.1)
    mesh = data_model_mesh(8, model_parallelism=2)

    def apply_fn(params, images, texts, rng):
        logits = model.apply(params, images, texts, training=False)
        return logits, {}

    img = jax.random.normal(jax.random.key(1), (K, batch, 32))
    txt = jax.random.normal(jax.random.key(2), (K, batch, 32))
    lab = (
        jax.random.uniform(jax.random.key(3), (K, batch, 5)) < 0.3
    ).astype(jnp.float32)

    results = []
    for k in (1, 2):
        params = shard_params_tp(mesh, model.init(jax.random.key(0)))
        state = TrainState(
            params, opt.init(params), jnp.zeros((), jnp.int32)
        )
        chunk = make_tp_scan_train_step(
            apply_fn, opt, mesh, donate=False, accum_steps=k
        )
        state, losses, _ = chunk(state, img, txt, lab, jax.random.key(9))
        assert losses.shape == (K,)
        assert int(state.step) == K
        results.append((state, np.asarray(losses)))
    np.testing.assert_allclose(results[0][1], results[1][1], rtol=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5
        ),
        results[0][0].params,
        results[1][0].params,
    )


def test_tp_param_specs_structure():
    """Spec tree mirrors the param tree: pools head-sharded, rest replicated."""
    from jax.sharding import PartitionSpec as P

    model, _, state, *_ = _setup()
    specs = tp_param_specs(state.params)
    assert specs.pool.in_proj_weight == P("model", None)
    assert specs.pool.out_proj_weight == P(None, "model")
    assert specs.pool.in_proj_bias == P("model")
    assert specs.pool.out_proj_bias == P()
    assert specs.classifier_out.weight == P()
    # same structure ⇒ usable directly as a device_put / in_shardings tree
    assert jax.tree.structure(specs, is_leaf=lambda x: isinstance(x, type(P()))) \
        == jax.tree.structure(state.params)
    # biasless pools put None in the bias slots to keep structures aligned
    biasless = AttentionPoolParams(
        in_proj_weight=jnp.zeros((12, 4)), out_proj_weight=jnp.zeros((4, 4))
    )
    s = tp_param_specs(biasless)
    assert s.in_proj_bias is None and s.out_proj_bias is None


def test_tp_step_matches_single_device():
    """GSPMD head-sharded step == unsharded step (values, not layout).

    Deterministic apply + SGD for the same reasons as the DP parity test.
    num_heads=2 divides the model axis so Q/K/V shards align with heads.
    """
    model = XrayAECFModel(
        image_dim=32, text_dim=32, hidden_dim=16, num_classes=5, num_heads=2
    )
    img = jax.random.normal(jax.random.key(1), (32, 32))
    txt = jax.random.normal(jax.random.key(2), (32, 32))
    lab = (
        jax.random.uniform(jax.random.key(3), (32, 5)) < 0.3
    ).astype(jnp.float32)
    opt = optax.sgd(0.1)

    def apply_fn(params, images, texts, rng):
        logits = model.apply(params, images, texts, training=False)
        return logits, {}

    params = model.init(jax.random.key(0))
    state = TrainState(params, opt.init(params), jnp.zeros((), jnp.int32))
    single_step = make_train_step(apply_fn, opt)
    new_single, loss_single, _ = single_step(
        state, img, txt, lab, jax.random.key(9)
    )

    mesh = data_model_mesh(8, model_parallelism=2)
    params2 = shard_params_tp(mesh, model.init(jax.random.key(0)))
    state2 = TrainState(
        params2, opt.init(params2), jnp.zeros((), jnp.int32)
    )
    tp_step = make_tp_train_step(apply_fn, opt, mesh)
    new_tp, loss_tp, _ = tp_step(state2, img, txt, lab, jax.random.key(9))

    np.testing.assert_allclose(float(loss_tp), float(loss_single), rtol=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), b, atol=1e-5),
        new_tp.params,
        new_single.params,
    )
    # the pool weights actually live sharded over the model axis
    assert len(new_tp.params.pool.in_proj_weight.sharding.device_set) == 8


def test_tp_dp_combined_training_descends():
    """DP × TP on a (4, 2) mesh: full training step with curriculum on."""
    model = XrayAECFModel(
        image_dim=32, text_dim=32, hidden_dim=16, num_classes=5, num_heads=2
    )
    img = jax.random.normal(jax.random.key(1), (64, 32))
    txt = jax.random.normal(jax.random.key(2), (64, 32))
    lab = (
        jax.random.uniform(jax.random.key(3), (64, 5)) < 0.3
    ).astype(jnp.float32)
    opt = optax.adamw(1e-3)
    mesh = data_model_mesh(8, model_parallelism=2)
    params = shard_params_tp(mesh, model.init(jax.random.key(0)))
    state = TrainState(params, opt.init(params), jnp.zeros((), jnp.int32))

    def apply_fn(params, images, texts, rng):
        return model.apply(
            params,
            images,
            texts,
            training=True,
            rng=rng,
            curriculum_enabled=True,
            missing_modality_training=True,
            return_info=True,
        )

    tp_step = make_tp_train_step(apply_fn, opt, mesh)
    losses = []
    for i in range(10):
        state, loss, info = tp_step(state, img, txt, lab, jax.random.key(i))
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    assert np.isfinite(losses).all()
    assert info["entropy"].shape == () and bool(jnp.isfinite(info["entropy"]))


def test_dp_info_is_global_mean():
    model, opt, state, img, txt, lab = _setup()
    mesh = data_mesh(8)

    def apply_fn(params, images, texts, rng):
        return model.apply(
            params,
            images,
            texts,
            training=True,
            rng=rng,
            curriculum_enabled=True,
            return_info=True,
        )

    dp_step = make_dp_train_step(apply_fn, opt, mesh)
    state = replicate(mesh, state)
    batch = shard_batch(mesh, (img, txt, lab))
    _, _, info = dp_step(state, *batch, jax.random.key(0))
    assert info["entropy"].shape == ()
    assert jnp.isfinite(info["entropy"])


def test_dp_eval_step_matches_single_device():
    from aecf_tpu.parallel import make_dp_eval_step

    model, _, state, img, txt, lab = _setup(batch=32)
    mesh = data_mesh(8)

    def apply(params, batch):
        return model.apply(params, batch["image"], batch["text"],
                           training=False)

    eval_step = make_dp_eval_step(apply, mesh)
    batch = {"image": img, "text": txt}
    out_dp = eval_step(replicate(mesh, state.params),
                       shard_batch(mesh, batch))
    out_1d = apply(state.params, batch)
    # output stays batch-sharded over the mesh
    assert any(
        getattr(s, "spec", None) is not None
        for s in [out_dp.sharding]
    )
    np.testing.assert_allclose(
        np.asarray(out_dp), np.asarray(out_1d), atol=1e-5
    )


def test_dp_eval_step_feeds_sweep():
    """DP inference composes with the missing-modality sweep."""
    from aecf_tpu.parallel import make_dp_eval_step
    from aecf_tpu.train.sweeps import missing_modality_sweep

    model, _, state, img, txt, lab = _setup(batch=32)
    mesh = data_mesh(8)
    params = replicate(mesh, state.params)

    def apply(p, batch):
        return model.apply(p, batch["image"], batch["text"], training=False)

    eval_step = make_dp_eval_step(apply, mesh)

    def predict(image, text):
        return np.asarray(eval_step(
            params, shard_batch(mesh, {"image": image, "text": text})
        ))

    res = missing_modality_sweep(
        predict,
        {"image": np.asarray(img), "text": np.asarray(txt)},
        np.asarray(lab),
        batch_size=32,
    )
    assert len(res) == 3  # (image,text), (image,), (text,)
    for row in res.values():
        assert np.isfinite(row["map"]) and 0.0 <= row["ece"] <= 1.0


def test_maybe_initialize_distributed_error_handling(monkeypatch):
    """Re-initialization is tolerated; a coordinator failure must RAISE —
    swallowing it would leave every host silently training alone."""
    from aecf_tpu.parallel import maybe_initialize_distributed

    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "127.0.0.1:1")

    def raise_reinit(**kw):
        raise RuntimeError(
            "distributed.initialize should only be called once."
        )

    monkeypatch.setattr(jax.distributed, "initialize", raise_reinit)
    maybe_initialize_distributed()  # tolerated

    def raise_unreachable(**kw):
        raise RuntimeError("DEADLINE_EXCEEDED: barrier timed out")

    monkeypatch.setattr(jax.distributed, "initialize", raise_unreachable)
    with pytest.raises(RuntimeError, match="DEADLINE"):
        maybe_initialize_distributed()
