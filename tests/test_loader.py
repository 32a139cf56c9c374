"""Native + numpy batch-loader tests."""

import numpy as np
import pytest

from aecf_tpu.data.loader import (
    BatchLoader,
    native_available,
    quantize_rows,
)


def make_data(n=100, d=8, c=3):
    rng = np.random.default_rng(0)
    return {
        "image": rng.normal(size=(n, d)).astype(np.float32),
        "text": rng.normal(size=(n, d)).astype(np.float32),
        "label": (rng.random((n, c)) < 0.3).astype(np.float32),
    }


BACKENDS = ["numpy"] + (["native"] if native_available() else [])


@pytest.mark.parametrize("backend", BACKENDS)
class TestBatchLoader:
    def test_shapes_and_count(self, backend):
        data = make_data(n=100)
        loader = BatchLoader(
            data, batch_size=32, epochs=2, backend=backend
        )
        batches = list(loader)
        # drop_last: 3 per epoch × 2 epochs
        assert len(batches) == len(loader) == 6
        for img, txt, lab in batches:
            assert img.shape == (32, 8)
            assert txt.shape == (32, 8)
            assert lab.shape == (32, 3)

    def test_rows_track_together(self, backend):
        """A batch's image/text/label rows must come from the same source
        rows — catch gather misalignment."""
        data = make_data(n=64)
        # Make rows identifiable: image row i = i, text row i = -i.
        data["image"][:, 0] = np.arange(64)
        data["text"][:, 0] = -np.arange(64)
        loader = BatchLoader(
            data, batch_size=16, epochs=1, backend=backend, seed=3
        )
        for img, txt, _ in loader:
            np.testing.assert_array_equal(img[:, 0], -txt[:, 0])

    def test_epoch_covers_all_rows(self, backend):
        data = make_data(n=64)
        data["image"][:, 0] = np.arange(64)
        loader = BatchLoader(
            data, batch_size=16, epochs=1, backend=backend, seed=1
        )
        seen = np.concatenate([img[:, 0].copy() for img, _, _ in loader])
        assert sorted(seen.tolist()) == list(range(64))

    def test_deterministic_given_seed(self, backend):
        data = make_data(n=48)
        a = [
            img.copy()
            for img, _, _ in BatchLoader(
                data, batch_size=16, epochs=2, backend=backend, seed=7
            )
        ]
        b = [
            img.copy()
            for img, _, _ in BatchLoader(
                data, batch_size=16, epochs=2, backend=backend, seed=7
            )
        ]
        for x, y in zip(a, b):
            np.testing.assert_array_equal(x, y)

    def test_epochs_shuffle_differently(self, backend):
        data = make_data(n=64)
        data["image"][:, 0] = np.arange(64)
        loader = BatchLoader(
            data, batch_size=64, epochs=2, backend=backend, seed=2
        )
        epochs = [img[:, 0].copy() for img, _, _ in loader]
        assert not np.array_equal(epochs[0], epochs[1])

    def test_no_shuffle_preserves_order(self, backend):
        data = make_data(n=32)
        data["image"][:, 0] = np.arange(32)
        loader = BatchLoader(
            data, batch_size=16, epochs=1, shuffle=False, backend=backend
        )
        seen = np.concatenate([img[:, 0].copy() for img, _, _ in loader])
        np.testing.assert_array_equal(seen, np.arange(32))


@pytest.mark.skipif(
    not native_available(), reason="g++/native pipeline unavailable"
)
def test_native_matches_numpy_row_multiset():
    """Backends shuffle differently but must deliver the same multiset of
    rows per epoch."""
    data = make_data(n=96)
    data["image"][:, 0] = np.arange(96)
    rows = {
        backend: sorted(
            np.concatenate(
                [
                    img[:, 0].copy()
                    for img, _, _ in BatchLoader(
                        data, batch_size=32, epochs=1, backend=backend
                    )
                ]
            ).tolist()
        )
        for backend in ("numpy", "native")
    }
    assert rows["numpy"] == rows["native"]


def test_constructor_validation_is_backend_independent():
    """Shape problems must fail at construction for BOTH backends: the
    C++ pipeline indexes every array by the image's row count, so a
    shorter text buffer would be read out of bounds."""
    data = make_data(n=20)
    bad = dict(data, text=data["text"][:10])
    with pytest.raises(ValueError, match="row mismatch"):
        BatchLoader(bad, batch_size=4)
    bad1d = dict(data, label=data["label"][:, 0])
    with pytest.raises(ValueError, match="must be 2-D"):
        BatchLoader(bad1d, batch_size=4)
    with pytest.raises(ValueError, match="backend"):
        BatchLoader(data, batch_size=4, backend="natve")  # typo'd


@pytest.mark.skipif(
    not native_available(), reason="g++/native pipeline unavailable"
)
def test_native_batches_safe_to_retain_by_default():
    """Default (copy_out=True) batches must stay valid after iteration —
    the ring-buffer slots are reused ``prefetch`` acquires later, and a
    consumer that retains batches (or hands them to CPU jax, whose
    jnp.asarray aliases aligned host buffers) must not see them rewritten.
    copy_out=False is the documented expert mode that DOES yield transient
    views."""
    data = make_data(n=96)
    data["image"][:, 0] = np.arange(96)
    data["text"][:, 0] = -np.arange(96)

    retained = list(
        BatchLoader(
            data, batch_size=8, epochs=2, backend="native", seed=9,
            prefetch=2,
        )
    )
    assert len(retained) == 24
    for img, txt, _ in retained:  # rows still track after full iteration
        np.testing.assert_array_equal(img[:, 0], -txt[:, 0])
    # every retained batch owns its memory
    assert all(b.base is None for batch in retained for b in batch)

    # expert mode yields views (no per-batch allocation)…
    loader = BatchLoader(
        data, batch_size=8, epochs=1, backend="native", seed=9,
        copy_out=False,
    )
    it = iter(loader)  # views die with the generator (ring buffer freed)
    img, txt, _ = next(it)
    assert img.base is not None
    # …that are correct when consumed immediately
    np.testing.assert_array_equal(img[:, 0], -txt[:, 0])
    it.close()


@pytest.mark.skipif(
    not native_available(), reason="g++/native pipeline unavailable"
)
def test_native_acquire_after_end_of_stream_returns_zero():
    """The EOS sentinel is terminal: a consumer that re-acquires after
    rows==0 (generic retry logic against the C ABI) must get 0 again
    immediately, not block forever on a dead worker."""
    import ctypes

    from aecf_tpu.data.loader import _load_lib

    lib = _load_lib()
    assert lib.aecf_batcher_abi() == 2
    arr = np.arange(32, dtype=np.float32).reshape(8, 4).copy()
    ptrs = (ctypes.c_void_p * 1)(arr.ctypes.data_as(ctypes.c_void_p))
    row_bytes = (ctypes.c_int64 * 1)(4 * arr.itemsize)
    h = lib.aecf_batcher_create(ptrs, row_bytes, 1, 8, 4, 1, 2, 0, 0, 1)
    assert h
    out = (ctypes.c_void_p * 1)()
    ep = ctypes.c_int64()

    def acquire():
        return lib.aecf_batcher_acquire(h, out, ctypes.byref(ep))

    seen = 0
    while acquire():
        seen += 1
    assert seen == 2  # 8 rows / batch 4, drop_last
    for _ in range(3):
        assert acquire() == 0
    lib.aecf_batcher_destroy(ctypes.c_void_p(h))


# ---- generic streams / dtypes (ABI v2) -------------------------------------


@pytest.mark.parametrize("backend", BACKENDS)
class TestGenericStreams:
    def test_arbitrary_stream_names_and_count(self, backend):
        rng = np.random.default_rng(0)
        data = {
            "feat": rng.normal(size=(40, 6)).astype(np.float32),
            "aux": rng.normal(size=(40, 2)).astype(np.float32),
        }
        loader = BatchLoader(data, batch_size=8, backend=backend)
        assert loader.stream_names == ("feat", "aux")
        for feat, aux in loader:
            assert feat.shape == (8, 6) and aux.shape == (8, 2)

    def test_dtypes_preserved_and_rows_track(self, backend):
        """int8 store + f32 scales + bf16 table gather the SAME rows,
        each at its own dtype — the quantized-feature-store contract."""
        import ml_dtypes

        n = 48
        ids = np.arange(n)
        q = np.zeros((n, 4), np.int8)
        q[:, 0] = (ids % 127).astype(np.int8)
        scales = (ids[:, None] + 1).astype(np.float32)
        bf = np.zeros((n, 3), ml_dtypes.bfloat16)
        bf[:, 0] = ids.astype(ml_dtypes.bfloat16)
        loader = BatchLoader(
            {"q": q, "scale": scales, "bf": bf},
            batch_size=16,
            backend=backend,
            seed=5,
        )
        total = 0
        for bq, bs, bbf in loader:
            assert bq.dtype == np.int8
            assert bs.dtype == np.float32
            assert bbf.dtype == ml_dtypes.bfloat16
            row_ids = (bs[:, 0] - 1).astype(np.int64)
            np.testing.assert_array_equal(
                bq[:, 0], (row_ids % 127).astype(np.int8)
            )
            np.testing.assert_array_equal(
                bbf[:, 0].astype(np.float32),
                row_ids.astype(ml_dtypes.bfloat16).astype(np.float32),
            )
            total += len(bq)
        assert total == n

    def test_float64_downcast_and_canonical_triple_order(self, backend):
        data = {
            # scrambled insertion order: the canonical key set must still
            # yield (image, text, label) for reference-protocol compat
            "label": np.ones((16, 2), np.float64),
            "image": np.full((16, 3), 2.0, np.float32),
            "text": np.full((16, 4), 3.0, np.float32),
        }
        loader = BatchLoader(
            data, batch_size=8, shuffle=False, backend=backend
        )
        img, txt, lab = next(iter(loader))
        assert img.shape[1] == 3 and txt.shape[1] == 4 and lab.shape[1] == 2
        assert lab.dtype == np.float32  # f64 downcast


def test_quantize_rows_roundtrip():
    rng = np.random.default_rng(0)
    table = rng.normal(size=(64, 32)).astype(np.float32) * 5.0
    table[7] = 0.0  # all-zero row: scale must stay finite
    q, scales = quantize_rows(table)
    assert q.dtype == np.int8 and scales.shape == (64, 1)
    deq = q.astype(np.float32) * scales
    err = np.abs(deq - table).max(axis=1)
    # symmetric absmax int8: error bounded by scale/2 per row
    assert np.all(err <= scales[:, 0] * 0.5 + 1e-7)
    np.testing.assert_array_equal(q[7], 0)
    assert scales[7, 0] == 1.0
    with pytest.raises(ValueError, match="2-D"):
        quantize_rows(table[:, :, None])


def test_quantize_rows_matches_kernel_quantizer():
    """quantize_rows on a 2-D table == kernels.quantize_features on the
    same data viewed as (B, 1, E) — one quantization scheme everywhere."""
    import jax.numpy as jnp

    from aecf_tpu.kernels import quantize_features

    rng = np.random.default_rng(1)
    table = rng.normal(size=(32, 16)).astype(np.float32)
    q, scales = quantize_rows(table)
    qk, sk = quantize_features(jnp.asarray(table)[:, None, :])
    np.testing.assert_array_equal(q, np.asarray(qk)[:, 0, :])
    np.testing.assert_allclose(scales[:, 0], np.asarray(sk)[:, 0])


def test_empty_data_rejected():
    with pytest.raises(ValueError, match="at least one stream"):
        BatchLoader({}, batch_size=4)


def test_int8_feature_store_end_to_end():
    """The full quantized-store pipeline: quantize_rows tables ->
    BatchLoader streams (int8 + scales + labels share one shuffle) ->
    ops.fusion_pool(kv_scales=) training via the q8 custom_vjp.  The
    int8-store loss trajectory must fall and track the f32-store run
    (quantization error lives in the data, not the gradient path)."""
    import jax
    import jax.numpy as jnp
    import optax

    from aecf_tpu import ops
    from aecf_tpu.core.init import (
        init_attention_pool_params,
        init_fusion_query,
    )

    rng = np.random.default_rng(0)
    N, E = 128, 64
    img = rng.normal(size=(N, E)).astype(np.float32)
    txt = rng.normal(size=(N, E)).astype(np.float32)
    w_true = rng.normal(size=(E,)).astype(np.float32)
    lab = ((img + txt) @ w_true > 0).astype(np.float32)[:, None]

    params0 = {
        "pool": init_attention_pool_params(jax.random.key(0), E),
        "query": init_fusion_query(jax.random.key(1), E),
        "head": rng.normal(size=(E, 1)).astype(np.float32) * 0.1,
    }
    tx = optax.adam(3e-3)

    def run(streams, quantized):
        @jax.jit
        def step(p, s, batch, rng_key):
            if quantized:
                iq, isc, tq, tsc, y = batch
                kv = jnp.stack([iq, tq], axis=1)
                scales = jnp.concatenate([isc, tsc], axis=1)
            else:
                bi, bt, y = batch
                kv = jnp.stack([bi, bt], axis=1)
                scales = None

            def loss_fn(p):
                out, _, _, _ = ops.fusion_pool(
                    p["pool"], p["query"], kv, rng=rng_key,
                    training=True, kv_grad=False, kv_scales=scales,
                )
                logits = out[:, 0, :] @ p["head"]
                return optax.sigmoid_binary_cross_entropy(
                    logits, y
                ).mean()

            loss, g = jax.value_and_grad(loss_fn)(p)
            u, s = tx.update(g, s, p)
            return optax.apply_updates(p, u), s, loss

        p, s = params0, tx.init(params0)
        losses = []
        loader = BatchLoader(
            streams, batch_size=32, epochs=8, seed=11, backend="numpy"
        )
        for i, batch in enumerate(loader):
            batch = tuple(jnp.asarray(b) for b in batch)
            p, s, loss = step(p, s, batch, jax.random.key(i))
            losses.append(float(loss))
        return losses

    losses_f32 = run({"image": img, "text": txt, "label": lab}, False)
    iq, isc = quantize_rows(img)
    tq, tsc = quantize_rows(txt)
    losses_q8 = run(
        {"image_q": iq, "image_scale": isc, "text_q": tq,
         "text_scale": tsc, "label": lab},
        True,
    )
    # both trajectories train...
    assert losses_f32[-1] < 0.8 * losses_f32[0]
    assert losses_q8[-1] < 0.8 * losses_q8[0]
    # ...and the int8 store tracks the f32 one
    assert abs(losses_q8[-1] - losses_f32[-1]) < 0.1 * losses_f32[0]
