"""Torch-checkpoint converter (contrib/torch_compat.py) golden round-trip.

The golden blob (tests/golden/torch_ckpt_golden.npz, produced by
tests/golden/generate.py from the live reference) carries a reference pool's
state_dict under TORCH's own random init plus its outputs on fixed inputs.
Converted params must reproduce those outputs — proving a real torch
checkpoint drops into this framework 1:1.  Torch-free at test time.
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from aecf_tpu import CurriculumMasking, MultimodalAttentionPool
from aecf_tpu.contrib.torch_compat import (
    attention_pool_params_from_state_dict,
    attention_pool_state_dict,
    fusion_query_from_state_dict,
)

GOLDEN = os.path.join(
    os.path.dirname(__file__), "golden", "torch_ckpt_golden.npz"
)
ATOL = 1e-5


@pytest.fixture(scope="module")
def golden():
    if not os.path.exists(GOLDEN):
        pytest.skip("torch ckpt golden missing — run tests/golden/generate.py")
    g = np.load(GOLDEN)
    sd = {k[len("sd.") :]: g[k] for k in g.files if k.startswith("sd.")}
    return g, sd


def _pool(sd, g, training):
    params = attention_pool_params_from_state_dict(sd)
    pool = MultimodalAttentionPool(
        embed_dim=params.out_proj_weight.shape[0],
        num_heads=int(g["num_heads"]),
        curriculum_masking=CurriculumMasking(
            base_mask_prob=0.5, entropy_target=0.7, min_active=1
        ),
        params=params,
        implementation="xla",
    )
    return pool.train(training)


def test_converted_params_reproduce_eval_output(golden):
    g, sd = golden
    pool = _pool(sd, g, training=False)
    out = pool(jnp.asarray(g["q"]), jnp.asarray(g["kv"]))
    np.testing.assert_allclose(np.asarray(out), g["out_eval"], atol=ATOL)


def test_converted_params_reproduce_train_output(golden):
    g, sd = golden
    pool = _pool(sd, g, training=True)
    out, info = pool(
        jnp.asarray(g["q"]),
        jnp.asarray(g["kv"]),
        return_info=True,
        mask_override=jnp.asarray(g["mask"]),
    )
    np.testing.assert_allclose(np.asarray(out), g["out_train"], atol=ATOL)
    np.testing.assert_allclose(
        np.asarray(info["masked_attention_weights"]),
        g["info_train_masked"],
        atol=ATOL,
    )
    np.testing.assert_allclose(
        np.asarray(info["entropy"]), g["info_train_entropy"], atol=ATOL
    )


def test_state_dict_round_trip(golden):
    g, sd = golden
    params = attention_pool_params_from_state_dict(sd)
    exported = attention_pool_state_dict(params)
    params2 = attention_pool_params_from_state_dict(exported)
    for a, b in zip(
        (params.in_proj_weight, params.in_proj_bias,
         params.out_proj_weight, params.out_proj_bias),
        (params2.in_proj_weight, params2.in_proj_bias,
         params2.out_proj_weight, params2.out_proj_bias),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # export carries the reference's _eps buffer for strict load_state_dict
    assert "curriculum_masking._eps" in exported
    # and the original torch key-set (minus the buffer) is exactly covered
    assert set(exported) - {"curriculum_masking._eps"} == set(sd) - {
        "curriculum_masking._eps"
    }


def test_prefixed_model_state_dict():
    """A whole-model flat state_dict with a nested pool + fusion query."""
    rng = np.random.default_rng(0)
    E = 8
    sd = {
        "encoder.weight": rng.normal(size=(E, E)).astype(np.float32),
        "fusion_pool.attention.in_proj_weight": rng.normal(
            size=(3 * E, E)
        ).astype(np.float32),
        "fusion_pool.attention.in_proj_bias": rng.normal(size=(3 * E,)).astype(
            np.float32
        ),
        "fusion_pool.attention.out_proj.weight": rng.normal(
            size=(E, E)
        ).astype(np.float32),
        "fusion_pool.attention.out_proj.bias": rng.normal(size=(E,)).astype(
            np.float32
        ),
        "fusion_query": rng.normal(size=(1, 1, E)).astype(np.float32),
    }
    params = attention_pool_params_from_state_dict(sd, prefix="fusion_pool.")
    assert params.in_proj_weight.shape == (3 * E, E)
    q = fusion_query_from_state_dict(sd)
    assert q.shape == (1, 1, E)


def test_conversion_copies_out_of_live_torch_storage():
    """Converted params must NOT alias the source buffers.

    ``tensor.detach().numpy()`` shares storage with the live torch tensor and
    CPU jax's ``jnp.asarray`` zero-copy aliases suitably aligned host
    buffers, so a non-copying conversion would let an in-place torch update
    (``optimizer.step()``) silently mutate the converted params.  Regression
    for the fix in contrib/torch_compat.py (full training-dynamics version:
    tests/test_torch_trajectory.py)."""
    torch = pytest.importorskip("torch")
    E = 16
    mha = torch.nn.MultiheadAttention(E, 2, batch_first=True)
    query = torch.nn.Parameter(torch.randn(1, 1, E))
    sd = {
        **{
            f"attention.{k}": v.detach().numpy()
            for k, v in mha.state_dict().items()
        },
        "fusion_query": query.detach().numpy(),
    }
    params = attention_pool_params_from_state_dict(sd)
    q = fusion_query_from_state_dict(sd)
    before = np.array(params.in_proj_weight), np.array(q)
    with torch.no_grad():
        mha.in_proj_weight.add_(100.0)
        query.add_(100.0)
    np.testing.assert_array_equal(np.asarray(params.in_proj_weight), before[0])
    np.testing.assert_array_equal(np.asarray(q), before[1])


def test_biasless_and_errors():
    E = 4
    rng = np.random.default_rng(1)
    sd = {
        "attention.in_proj_weight": rng.normal(size=(3 * E, E)).astype(
            np.float32
        ),
        "attention.out_proj.weight": rng.normal(size=(E, E)).astype(
            np.float32
        ),
    }
    params = attention_pool_params_from_state_dict(sd)
    assert params.in_proj_bias is None and params.out_proj_bias is None
    with pytest.raises(KeyError, match="in_proj_weight"):
        attention_pool_params_from_state_dict({}, prefix="nope.")
    bad = dict(sd, **{"attention.in_proj_weight": np.zeros((5, E), np.float32)})
    with pytest.raises(ValueError, match="inconsistent"):
        attention_pool_params_from_state_dict(bad)
    with pytest.raises(ValueError, match="query"):
        fusion_query_from_state_dict({"fusion_query": np.zeros((2, 2, E))})
