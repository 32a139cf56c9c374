"""Checkpoint/resume round-trip tests (orbax)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from aecf_tpu.models import VisionLanguageModel
from aecf_tpu.train import (
    CheckpointManager,
    TrainState,
    load_params,
    make_train_step,
    save_params,
)


@pytest.fixture
def model_and_params():
    model = VisionLanguageModel(
        img_dim=16, txt_dim=16, hidden_dim=8, num_classes=4
    )
    return model, model.init(jax.random.key(0))


def test_params_roundtrip(tmp_path, model_and_params):
    model, params = model_and_params
    path = str(tmp_path / "params")
    save_params(path, params)
    abstract = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), params
    )
    restored = load_params(path, abstract)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(a, b), params, restored
    )


def test_manager_save_restore_resume(tmp_path, model_and_params):
    model, params = model_and_params
    opt = optax.adamw(1e-3)
    state = TrainState(params, opt.init(params), jnp.zeros((), jnp.int32))

    def apply_fn(p, img, txt, rng):
        return model.apply(p, img, txt, training=False), {}

    step = make_train_step(apply_fn, opt, donate=False)
    img = jax.random.normal(jax.random.key(1), (8, 16))
    txt = jax.random.normal(jax.random.key(2), (8, 16))
    lab = jnp.zeros((8, 4))

    mgr = CheckpointManager(
        str(tmp_path / "ckpt"), save_interval_steps=1, max_to_keep=2
    )
    for i in range(3):
        state, loss, _ = step(state, img, txt, lab, jax.random.key(i))
        mgr.save(int(state.step), state)
    mgr.wait()

    assert mgr.latest_step() == 3
    abstract = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), state
    )
    restored = mgr.restore(abstract)
    assert int(restored.step) == 3
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(a, b),
        state.params,
        restored.params,
    )

    # Resume: one more step from the restored state reproduces training
    # from the live state.
    next_live, _, _ = step(state, img, txt, lab, jax.random.key(9))
    next_restored, _, _ = step(restored, img, txt, lab, jax.random.key(9))
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, atol=1e-7),
        next_live.params,
        next_restored.params,
    )
    mgr.close()


def test_restore_empty_returns_none(tmp_path, model_and_params):
    _, params = model_and_params
    mgr = CheckpointManager(str(tmp_path / "empty"))
    abstract = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), params
    )
    assert mgr.restore(abstract) is None
    mgr.close()
