"""Serving-layer tests: bucketed jit caching, padding, missing modalities."""

import jax
import numpy as np
import pytest

from aecf_tpu.models import VisionLanguageModel
from aecf_tpu.serve import FusionPredictor, pad_to_bucket


def test_pad_to_bucket():
    assert pad_to_bucket(1, (32, 256)) == 32
    assert pad_to_bucket(32, (32, 256)) == 32
    assert pad_to_bucket(33, (32, 256)) == 256
    assert pad_to_bucket(999, (32, 256)) == 256


@pytest.fixture(scope="module")
def predictor():
    model = VisionLanguageModel(
        img_dim=32, txt_dim=16, hidden_dim=8, num_classes=5
    )
    params = model.init(jax.random.key(0))

    def apply_fn(p, image, text):
        return model.apply(p, image, text, training=False)

    return FusionPredictor(
        apply_fn,
        params,
        modality_names=("image", "text"),
        buckets=(8, 32),
        apply_sigmoid=True,
    )


def test_ragged_batch_matches_unpadded(predictor):
    rng = np.random.default_rng(0)
    img = rng.normal(size=(5, 32)).astype(np.float32)
    txt = rng.normal(size=(5, 16)).astype(np.float32)
    out5 = predictor(image=img, text=txt)
    assert out5.shape == (5, 5)
    # Same rows inside a bigger batch give identical outputs (padding must
    # not leak into real rows).
    img2 = np.concatenate([img, rng.normal(size=(30, 32)).astype(np.float32)])
    txt2 = np.concatenate([txt, rng.normal(size=(30, 16)).astype(np.float32)])
    out35 = predictor(image=img2, text=txt2)
    np.testing.assert_allclose(out35[:5], out5, atol=1e-6)


def test_chunking_beyond_max_bucket(predictor):
    rng = np.random.default_rng(1)
    img = rng.normal(size=(70, 32)).astype(np.float32)
    txt = rng.normal(size=(70, 16)).astype(np.float32)
    out = predictor(image=img, text=txt)
    assert out.shape == (70, 5)
    assert np.isfinite(out).all()
    assert (out >= 0).all() and (out <= 1).all()  # sigmoid


def test_missing_modality_zeroed(predictor):
    rng = np.random.default_rng(2)
    img = rng.normal(size=(4, 32)).astype(np.float32)
    txt = rng.normal(size=(4, 16)).astype(np.float32)
    predictor(image=img, text=txt)  # teach it the text dim
    out_missing = predictor(image=img)
    out_zeroed = predictor(image=img, text=np.zeros_like(txt))
    np.testing.assert_allclose(out_missing, out_zeroed, atol=1e-6)


def test_errors(predictor):
    with pytest.raises(ValueError, match="At least one"):
        predictor()
    with pytest.raises(ValueError, match="unknown"):
        predictor(audio=np.zeros((2, 4), np.float32))
    with pytest.raises(ValueError, match="batch mismatch"):
        predictor(
            image=np.zeros((2, 32), np.float32),
            text=np.zeros((3, 16), np.float32),
        )
