"""dm-haiku interop tests: param handling, RNG threading, parity with the
core path, gradient flow through haiku training (mirrors
tests/test_flax_interop.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

hk = pytest.importorskip("haiku")

from aecf_tpu.contrib.haiku import FusionPool, MultimodalAttentionPool
from aecf_tpu.core.attention import AttentionPoolParams, attention_pool_core


def test_fusion_pool_shapes_and_info():
    def fwd(mods, training=False, return_info=False):
        return FusionPool(16, mask_prob=0.5)(
            mods, training=training, return_info=return_info
        )

    f = hk.transform(fwd)
    mods = jax.random.normal(jax.random.key(0), (8, 3, 16))
    params = f.init(jax.random.key(1), mods, training=True, return_info=True)
    out, info = f.apply(
        params, jax.random.key(2), mods, training=True, return_info=True
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
    def fwd(mods):
        return FusionPool(16)(mods)

    f = hk.without_apply_rng(hk.transform(fwd))
    mods = jax.random.normal(jax.random.key(0), (4, 2, 16))
    params = f.init(jax.random.key(1), mods)
    out = f.apply(params, mods)
    assert out.shape == (4, 16)


def test_matches_core_path():
    """haiku params fed into the pure core produce the same output."""

    def fwd(q, kv):
        return MultimodalAttentionPool(16, masking=False)(q, kv)

    f = hk.without_apply_rng(hk.transform(fwd))
    q = jax.random.normal(jax.random.key(1), (4, 1, 16))
    kv = jax.random.normal(jax.random.key(2), (4, 3, 16))
    params = f.init(jax.random.key(0), q, kv)
    out = f.apply(params, q, kv)

    (scope,) = [k for k in params if "multimodal_attention_pool" in k]
    leaves = params[scope]
    core_params = AttentionPoolParams(
        in_proj_weight=leaves["in_proj_weight"],
        out_proj_weight=leaves["out_proj_weight"],
        in_proj_bias=leaves["in_proj_bias"],
        out_proj_bias=leaves["out_proj_bias"],
    )
    expected, _ = attention_pool_core(
        core_params, q, kv, kv, num_heads=1, need_weights=False
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(expected), atol=1e-6
    )


def test_trains_under_optax():
    def fwd(mods, training=False):
        return FusionPool(16, mask_prob=0.3)(mods, training=training)

    f = hk.transform(fwd)
    mods = jax.random.normal(jax.random.key(0), (16, 3, 16))
    target = jax.random.normal(jax.random.key(1), (16, 16))
    params = f.init(jax.random.key(2), mods, training=True)
    opt = optax.adamw(3e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, rng):
        def loss_fn(p):
            out = f.apply(p, rng, mods, training=True)
            return jnp.mean((out - target) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for i in range(20):
        params, opt_state, loss = step(
            params, opt_state, jax.random.key(10 + i)
        )
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.9
    assert np.isfinite(losses).all()


def test_single_modality_trains_without_crash():
    """M=1 stacks: masking is a no-op and must not demand a curriculum key
    (the flax equivalent crashed on TPU before the M<=1 routing fix)."""

    def fwd(mods, training=False):
        return FusionPool(16)(mods, training=training)

    f = hk.transform(fwd)
    mods = jax.random.normal(jax.random.key(0), (4, 1, 16))
    params = f.init(jax.random.key(1), mods, training=True)
    out = f.apply(params, jax.random.key(2), mods, training=True)
    assert out.shape == (4, 16)


def test_haiku_init_seed_matches_core_init():
    """All four pool params come from ONE template built with ONE rng draw,
    so a haiku init is reproducible against the pure-core initializer."""
    import haiku as hk

    from aecf_tpu.contrib.haiku import MultimodalAttentionPool

    E = 32

    def fwd(q, kv):
        return MultimodalAttentionPool(E, name="pool")(q, kv)

    f = hk.transform(fwd)
    q = jnp.zeros((2, 1, E))
    kv = jnp.zeros((2, 3, E))
    params = f.init(jax.random.key(7), q, kv)
    leaves = params["pool"]
    # deterministic: re-running init reproduces every leaf
    params2 = f.init(jax.random.key(7), q, kv)["pool"]
    for k in leaves:
        np.testing.assert_array_equal(leaves[k], params2[k])
    # direct invariant: the template is built exactly once per init
    import aecf_tpu.contrib.haiku as hk_mod

    calls = []
    orig = hk_mod.init_attention_pool_params

    def counting(*a, **kw):
        calls.append(1)
        return orig(*a, **kw)

    hk_mod.init_attention_pool_params = counting
    try:
        f.init(jax.random.key(9), q, kv)
    finally:
        hk_mod.init_attention_pool_params = orig
    assert len(calls) == 1, f"template built {len(calls)}x, want 1"
