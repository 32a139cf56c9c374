"""Elastic fit(): checkpoint/resume reproduces uninterrupted training."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from aecf_tpu.models import XrayAECFModel
from aecf_tpu.train.fit import fit


def setup():
    model = XrayAECFModel(
        image_dim=16, text_dim=16, hidden_dim=8, num_classes=4
    )
    params = model.init(jax.random.key(0))
    opt = optax.adamw(1e-3)

    def apply_fn(p, img, txt, rng):
        return model.apply(
            p, img, txt, training=True, rng=rng,
            curriculum_enabled=True, return_info=True,
        )

    rng_np = np.random.default_rng(0)
    img = rng_np.normal(size=(64, 16)).astype(np.float32)
    txt = rng_np.normal(size=(64, 16)).astype(np.float32)
    lab = (rng_np.random((64, 4)) < 0.3).astype(np.float32)

    def batch_fn(step):
        sel = np.random.default_rng(step).integers(0, 64, size=16)
        return img[sel], txt[sel], lab[sel]

    return apply_fn, opt, params, batch_fn


def test_fit_runs_and_counts_steps(tmp_path):
    apply_fn, opt, params, batch_fn = setup()
    state, _ = fit(
        apply_fn, opt, params, batch_fn,
        num_steps=5, rng=jax.random.key(1),
    )
    assert int(state.step) == 5


def test_fit_accum_steps(tmp_path):
    """accum_steps= plumbs through to the default step builder."""
    apply_fn, opt, params, batch_fn = setup()
    state, _ = fit(
        apply_fn, opt, params, batch_fn,
        num_steps=3, rng=jax.random.key(1), accum_steps=4,
    )
    assert int(state.step) == 3
    assert all(
        bool(jnp.isfinite(x).all()) for x in jax.tree.leaves(state.params)
    )


def test_resume_matches_uninterrupted(tmp_path):
    apply_fn, opt, params, batch_fn = setup()

    # Uninterrupted 8-step run.
    full_state, _ = fit(
        apply_fn, opt, params, batch_fn,
        num_steps=8, rng=jax.random.key(1),
    )

    # Interrupted: 4 steps with checkpoints, then a fresh fit() resumes.
    ckpt = str(tmp_path / "elastic")
    fit(
        apply_fn, opt, params, batch_fn,
        num_steps=4, rng=jax.random.key(1),
        checkpoint_dir=ckpt, save_every=1,
    )
    resumed_state, _ = fit(
        apply_fn, opt, params, batch_fn,
        num_steps=8, rng=jax.random.key(1),
        checkpoint_dir=ckpt, save_every=1,
    )
    assert int(resumed_state.step) == 8
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, atol=1e-6),
        full_state.params,
        resumed_state.params,
    )


def test_dp_fit_resume_matches_uninterrupted(tmp_path):
    """Elastic checkpoints × data parallelism: the preemptible-TPU pattern.
    A DP run interrupted at step 4 and resumed reproduces the
    uninterrupted DP run exactly."""
    import pytest

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    from aecf_tpu.parallel import data_mesh

    apply_fn, opt, params, batch_fn = setup()
    mesh = data_mesh(8)

    full_state, _ = fit(
        apply_fn, opt, params, batch_fn,
        num_steps=8, rng=jax.random.key(1), mesh=mesh,
    )

    ckpt = str(tmp_path / "elastic_dp")
    fit(
        apply_fn, opt, params, batch_fn,
        num_steps=4, rng=jax.random.key(1),
        checkpoint_dir=ckpt, save_every=1, mesh=mesh,
    )
    resumed_state, _ = fit(
        apply_fn, opt, params, batch_fn,
        num_steps=8, rng=jax.random.key(1),
        checkpoint_dir=ckpt, save_every=1, mesh=mesh,
    )
    assert int(resumed_state.step) == 8
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6
        ),
        full_state.params,
        resumed_state.params,
    )


def test_tp_fit_resume_matches_uninterrupted(tmp_path):
    """Elastic checkpoints × DP × TP: a ('data','model') mesh run
    interrupted at step 4 and resumed reproduces the uninterrupted run;
    restored params land back in the head-sharded layout."""
    import pytest

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    from aecf_tpu.parallel import data_model_mesh

    apply_fn, opt, params, batch_fn = setup()
    mesh = data_model_mesh(8, model_parallelism=2)

    full_state, _ = fit(
        apply_fn, opt, params, batch_fn,
        num_steps=8, rng=jax.random.key(1), mesh=mesh,
    )
    # the pool weights actually live sharded over the model axis
    assert len(full_state.params.pool.in_proj_weight.sharding.device_set) == 8

    ckpt = str(tmp_path / "elastic_tp")
    fit(
        apply_fn, opt, params, batch_fn,
        num_steps=4, rng=jax.random.key(1),
        checkpoint_dir=ckpt, save_every=1, mesh=mesh,
    )
    resumed_state, _ = fit(
        apply_fn, opt, params, batch_fn,
        num_steps=8, rng=jax.random.key(1),
        checkpoint_dir=ckpt, save_every=1, mesh=mesh,
    )
    assert int(resumed_state.step) == 8
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6
        ),
        full_state.params,
        resumed_state.params,
    )
    # and matches the plain single-device run to tolerance (GSPMD TP is a
    # layout, not different math)
    single_state, _ = fit(
        apply_fn, opt, params, batch_fn,
        num_steps=8, rng=jax.random.key(1),
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5
        ),
        full_state.params,
        single_state.params,
    )


def test_fit_scan_chunk_matches_single_step():
    """fit(scan_chunk=K) reproduces the unchunked loop exactly — the
    chunk folds the global state.step into the RNG, so every update
    consumes the same key as the per-step loop, including a partial
    tail chunk (num_steps=7, K=3 → chunks 3+3+1)."""
    apply_fn, opt, params, batch_fn = setup()
    single_state, _ = fit(
        apply_fn, opt, params, batch_fn,
        num_steps=7, rng=jax.random.key(1),
    )
    chunked_state, _ = fit(
        apply_fn, opt, params, batch_fn,
        num_steps=7, rng=jax.random.key(1), scan_chunk=3,
    )
    assert int(chunked_state.step) == 7
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6
        ),
        single_state.params,
        chunked_state.params,
    )


def test_fit_scan_chunk_misaligned_resume_matches_uninterrupted(tmp_path):
    """Chunked resume parity at ANY alignment: an interrupted run
    checkpointed at step 4 under scan_chunk=2 and resumed under
    scan_chunk=3 (misaligned with both the checkpoint and num_steps)
    reproduces the uninterrupted UNCHUNKED run — the global-step RNG
    fold makes chunking a pure dispatch-batching choice."""
    apply_fn, opt, params, batch_fn = setup()
    full_state, _ = fit(
        apply_fn, opt, params, batch_fn,
        num_steps=8, rng=jax.random.key(1),
    )
    ckpt = str(tmp_path / "elastic_chunked")
    fit(
        apply_fn, opt, params, batch_fn,
        num_steps=4, rng=jax.random.key(1),
        checkpoint_dir=ckpt, save_every=2, scan_chunk=2,
    )
    resumed_state, _ = fit(
        apply_fn, opt, params, batch_fn,
        num_steps=8, rng=jax.random.key(1),
        checkpoint_dir=ckpt, save_every=2, scan_chunk=3,
    )
    assert int(resumed_state.step) == 8
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6
        ),
        full_state.params,
        resumed_state.params,
    )


def test_dp_fit_scan_chunk_matches_single_step():
    """DP fit with compiled chunks == DP fit stepping singly."""
    import pytest

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    from aecf_tpu.parallel import data_mesh

    apply_fn, opt, params, batch_fn = setup()
    mesh = data_mesh(8)
    single_state, _ = fit(
        apply_fn, opt, params, batch_fn,
        num_steps=6, rng=jax.random.key(1), mesh=mesh,
    )
    chunked_state, _ = fit(
        apply_fn, opt, params, batch_fn,
        num_steps=6, rng=jax.random.key(1), mesh=mesh, scan_chunk=3,
    )
    assert int(chunked_state.step) == 6
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6
        ),
        single_state.params,
        chunked_state.params,
    )


def test_fit_scan_chunk_history_and_rejections():
    import pytest

    apply_fn, opt, params, batch_fn = setup()
    # history cadence matches the unchunked loop's log_every semantics
    _, history = fit(
        apply_fn, opt, params, batch_fn,
        num_steps=6, rng=jax.random.key(1), log_every=2, scan_chunk=4,
    )
    assert history["step"] == [0, 2, 4]
    assert len(history["loss"]) == 3
    assert "entropy" in history and all(
        np.isfinite(v) for v in history["entropy"]
    )
    # incompatible knobs fail loudly
    with pytest.raises(ValueError, match="step_fn"):
        fit(
            apply_fn, opt, params, batch_fn,
            num_steps=2, rng=jax.random.key(1), scan_chunk=2,
            step_fn=lambda *a: None,
        )
    with pytest.raises(ValueError, match="scan_chunk must be"):
        fit(
            apply_fn, opt, params, batch_fn,
            num_steps=2, rng=jax.random.key(1), scan_chunk=0,
        )


def test_tp_fit_scan_chunk_matches_single_step():
    """DP × TP fit with compiled chunks == DP × TP fit stepping singly
    (the GSPMD chunk folds the global state.step, same as the per-step
    TP path)."""
    import pytest

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    from aecf_tpu.parallel import data_model_mesh

    apply_fn, opt, params, batch_fn = setup()
    mesh = data_model_mesh(8, model_parallelism=2)
    single_state, _ = fit(
        apply_fn, opt, params, batch_fn,
        num_steps=6, rng=jax.random.key(1), mesh=mesh,
    )
    chunked_state, _ = fit(
        apply_fn, opt, params, batch_fn,
        num_steps=6, rng=jax.random.key(1), mesh=mesh, scan_chunk=3,
    )
    assert int(chunked_state.step) == 6
    # chunked params stay in the head-sharded TP layout
    assert len(
        chunked_state.params.pool.in_proj_weight.sharding.device_set
    ) == 8
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5
        ),
        single_state.params,
        chunked_state.params,
    )


def test_fit_history_carries_info_metrics():
    apply_fn, opt, params, batch_fn = setup()
    _, history = fit(
        apply_fn, opt, params, batch_fn,
        num_steps=4, rng=jax.random.key(1), log_every=2,
    )
    assert history["step"] == [0, 2]
    assert len(history["loss"]) == 2
    # the info-dict observability contract surfaces in history
    assert "entropy" in history and "mask_rate" in history
    assert all(np.isfinite(v) for v in history["entropy"])


def test_elastic_example_end_to_end(tmp_path, capsys):
    """examples/train_elastic.py: the preemptible-TPU recipe (fit +
    checkpoint/resume x DP x scan chunks x accumulation) runs end-to-end
    with a simulated preemption and finishes at the requested step."""
    import importlib.util
    import json
    import os

    import pytest

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")

    spec = importlib.util.spec_from_file_location(
        "train_elastic",
        os.path.join(
            os.path.dirname(__file__), "..", "examples", "train_elastic.py"
        ),
    )
    ex = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ex)

    rc = ex.main([
        "--steps", "10", "--preempt-at", "4", "--scan-chunk", "3",
        "--accum", "2", "--save-every", "2", "--mesh", "dp",
        "--batch", "32", "--hidden", "16", "--classes", "4",
        "--ckpt-dir", str(tmp_path / "ckpt"),
    ])
    assert rc == 0
    out = capsys.readouterr().out
    summary = json.loads(out.strip().splitlines()[-1])
    assert summary["final_step"] == 10
    assert summary["resumed"] is True
    assert summary["mesh"] == "dp"
    assert np.isfinite(summary["loss_last"])


def test_pure_tp_fit_matches_single_device():
    """fit() on a pure-TP mesh (no 'data' axis): the batch is replicated
    (make_tp_train_step's data_axis=None mode) — this used to crash on a
    hardcoded PartitionSpec('data')."""
    import pytest

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    from aecf_tpu.parallel import make_mesh

    apply_fn, opt, params, batch_fn = setup()
    mesh = make_mesh((8,), ("model",))
    tp_state, _ = fit(
        apply_fn, opt, params, batch_fn,
        num_steps=4, rng=jax.random.key(1), mesh=mesh,
    )
    single_state, _ = fit(
        apply_fn, opt, params, batch_fn,
        num_steps=4, rng=jax.random.key(1),
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5
        ),
        tp_state.params,
        single_state.params,
    )


def test_make_epoch_batch_fn_matches_batchloader_contract():
    """make_epoch_batch_fn is the BatchLoader numpy-backend schedule as a
    pure function of step: same seed => identical batches, epoch by epoch
    (that equivalence is what lets a loader recipe become an elastic fit
    run), and calls are order-independent (the resume contract)."""
    from aecf_tpu.data import BatchLoader
    from aecf_tpu.train import make_epoch_batch_fn

    rng = np.random.default_rng(3)
    data = {
        "image": rng.normal(size=(50, 6)).astype(np.float32),
        "text": rng.normal(size=(50, 6)).astype(np.float32),
        "label": (rng.random((50, 3)) < 0.5).astype(np.float32),
    }
    batch_fn = make_epoch_batch_fn(data, batch_size=16, seed=7)
    loader = BatchLoader(
        data, batch_size=16, epochs=2, seed=7, backend="numpy"
    )
    for step, expected in enumerate(loader):
        got = batch_fn(step)
        assert len(got) == 3
        for g, e in zip(got, expected):
            np.testing.assert_array_equal(g, e)

    # pure function of step: out-of-order and repeated calls agree
    for step in (5, 0, 5, 3):
        for g, e in zip(batch_fn(step), batch_fn(step)):
            np.testing.assert_array_equal(g, e)

    # canonical triple order regardless of insertion order
    scrambled = {"label": data["label"], "text": data["text"],
                 "image": data["image"]}
    fn2 = make_epoch_batch_fn(scrambled, batch_size=16, seed=7)
    for g, e in zip(fn2(0), batch_fn(0)):
        np.testing.assert_array_equal(g, e)

    # no-shuffle mode preserves row order
    fn3 = make_epoch_batch_fn(data, batch_size=16, seed=7, shuffle=False)
    np.testing.assert_array_equal(fn3(0)[0], data["image"][:16])

    import pytest

    with pytest.raises(ValueError, match="row mismatch"):
        make_epoch_batch_fn(
            {"image": data["image"], "label": data["label"][:10]},
            batch_size=8,
        )
    with pytest.raises(ValueError, match="exceeds"):
        make_epoch_batch_fn(data, batch_size=64)
    with pytest.raises(ValueError, match="at least one"):
        make_epoch_batch_fn({}, batch_size=8)


def test_fit_with_epoch_batch_fn_resumes(tmp_path):
    """fit() driven by make_epoch_batch_fn: a preempted+resumed run equals
    the uninterrupted one (the helper's purity makes the stream replay)."""
    from aecf_tpu.train import make_epoch_batch_fn

    apply_fn, opt, params, _ = setup()
    rng_np = np.random.default_rng(1)
    data = {
        "image": rng_np.normal(size=(64, 16)).astype(np.float32),
        "text": rng_np.normal(size=(64, 16)).astype(np.float32),
        "label": (rng_np.random((64, 4)) < 0.3).astype(np.float32),
    }
    batch_fn = make_epoch_batch_fn(data, batch_size=16, seed=5)

    full_state, _ = fit(
        apply_fn, opt, params, batch_fn,
        num_steps=6, rng=jax.random.key(2),
    )
    ckpt = str(tmp_path / "ck")
    fit(
        apply_fn, opt, params, batch_fn,
        num_steps=3, rng=jax.random.key(2),
        checkpoint_dir=ckpt, save_every=3,
    )
    resumed_state, _ = fit(
        apply_fn, opt, params, batch_fn,
        num_steps=6, rng=jax.random.key(2),
        checkpoint_dir=ckpt, save_every=3,
    )
    assert int(resumed_state.step) == 6
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6
        ),
        full_state.params,
        resumed_state.params,
    )
