"""Native + numpy batch-loader tests."""

import numpy as np
import pytest

from aecf_tpu.data.loader import BatchLoader, native_available


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
def test_native_acquire_after_end_of_stream_returns_zero():
    """The EOS sentinel is terminal: a consumer that re-acquires after
    rows==0 (generic retry logic against the C ABI) must get 0 again
    immediately, not block forever on a dead worker."""
    import ctypes

    from aecf_tpu.data.loader import _load_lib

    lib = _load_lib()
    fp = ctypes.POINTER(ctypes.c_float)
    arr = np.arange(32, dtype=np.float32).reshape(8, 4).copy()
    h = lib.aecf_batcher_create(
        arr.ctypes.data_as(fp), arr.ctypes.data_as(fp),
        arr.ctypes.data_as(fp), 8, 4, 4, 4, 4, 1, 2, 0, 0, 1,
    )
    assert h
    ip, tp, lp = fp(), fp(), fp()
    ep = ctypes.c_int64()

    def acquire():
        return lib.aecf_batcher_acquire(
            h, ctypes.byref(ip), ctypes.byref(tp), ctypes.byref(lp),
            ctypes.byref(ep),
        )

    seen = 0
    while acquire():
        seen += 1
    assert seen == 2  # 8 rows / batch 4, drop_last
    for _ in range(3):
        assert acquire() == 0
    lib.aecf_batcher_destroy(ctypes.c_void_p(h))
