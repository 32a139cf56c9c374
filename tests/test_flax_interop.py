"""Flax linen interop tests: param handling, RNG collections, parity with
the core path, gradient flow through linen training."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

flax = pytest.importorskip("flax")

from aecf_tpu.contrib.flax_linen import FusionPool, MultimodalAttentionPool
from aecf_tpu.core.attention import attention_pool_core
from aecf_tpu.core.masking import curriculum_mask


def test_fusion_pool_shapes_and_info():
    fusion = FusionPool(embed_dim=16, mask_prob=0.5)
    mods = jax.random.normal(jax.random.key(0), (8, 3, 16))
    vars_ = fusion.init(
        {"params": jax.random.key(1), "curriculum": jax.random.key(2)},
        mods,
        training=True,
        return_info=True,
    )
    out, info = fusion.apply(
        vars_,
        mods,
        training=True,
        return_info=True,
        rngs={"curriculum": jax.random.key(3)},
    )
    assert out.shape == (8, 16)
    assert set(info) == {
        "entropy",
        "mask_rate",
        "target_entropy",
        "attention_weights",
        "masked_attention_weights",
    }


def test_eval_no_rng_needed():
    fusion = FusionPool(embed_dim=16)
    mods = jax.random.normal(jax.random.key(0), (4, 2, 16))
    vars_ = fusion.init(jax.random.key(1), mods)
    out = fusion.apply(vars_, mods)
    assert out.shape == (4, 16)


def test_matches_core_path():
    """linen wrapper == direct core call with the same params."""
    fusion = FusionPool(embed_dim=16, implementation="xla")
    mods = jax.random.normal(jax.random.key(0), (4, 3, 16))
    vars_ = fusion.init(jax.random.key(1), mods)
    out = fusion.apply(vars_, mods)

    pool_params = vars_["params"]["pool"]["pool"]
    query = vars_["params"]["fusion_query"]
    q_full = jnp.broadcast_to(query, (4, 1, 16))
    expected, _ = attention_pool_core(
        pool_params, q_full, mods, mods, num_heads=1, need_weights=True
    )
    np.testing.assert_allclose(out, expected.squeeze(1), atol=1e-6)


def test_trains_under_optax():
    fusion = FusionPool(embed_dim=16, mask_prob=0.3)
    mods = jax.random.normal(jax.random.key(0), (16, 3, 16))
    target = jax.random.normal(jax.random.key(1), (16, 16))
    vars_ = fusion.init(
        {"params": jax.random.key(2), "curriculum": jax.random.key(3)},
        mods,
        training=True,
        return_info=True,
    )
    params = vars_["params"]
    opt = optax.adam(1e-2)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, rng):
        def loss_fn(p):
            out, info = fusion.apply(
                {"params": p},
                mods,
                training=True,
                return_info=True,
                rngs={"curriculum": rng},
            )
            return ((out - target) ** 2).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        upd, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, upd), opt_state, loss

    losses = []
    for i in range(20):
        params, opt_state, loss = step(params, opt_state, jax.random.key(i))
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.7


def test_pool_module_with_external_query():
    pool = MultimodalAttentionPool(embed_dim=8, masking=False)
    q = jax.random.normal(jax.random.key(0), (4, 1, 8))
    kv = jax.random.normal(jax.random.key(1), (4, 3, 8))
    vars_ = pool.init(jax.random.key(2), q, kv)
    out = pool.apply(vars_, q, kv)
    assert out.shape == (4, 1, 8)
