"""Parameter initializers matching the reference's distributions.

The reference inherits torch's ``nn.MultiheadAttention._reset_parameters``:
xavier-uniform on the packed ``in_proj_weight``, zero in-proj bias, torch
Linear default (uniform ``±1/√E``) on the out-projection weight, zero out-proj
bias.  ``create_fusion_pool`` draws the fusion query from ``N(0, √(2/E))``
(reference AECFLayer.py:714-716).  Exact bitstreams can't match across
frameworks; distributions and shapes do.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from .attention import AttentionPoolParams

__all__ = ["init_attention_pool_params", "init_fusion_query"]


def init_attention_pool_params(
    key: jax.Array,
    embed_dim: int,
    bias: bool = True,
    dtype: jnp.dtype = jnp.float32,
) -> AttentionPoolParams:
    """Initialize packed-projection attention params, torch-style."""
    k_in, k_out = jax.random.split(key)

    # xavier_uniform_ on (3E, E): fan_in=E, fan_out=3E.
    bound_in = math.sqrt(6.0 / (embed_dim + 3 * embed_dim))
    in_proj_weight = jax.random.uniform(
        k_in, (3 * embed_dim, embed_dim), dtype, -bound_in, bound_in
    )

    # torch Linear default: kaiming_uniform(a=√5) ⇒ uniform(±1/√fan_in).
    bound_out = 1.0 / math.sqrt(embed_dim)
    out_proj_weight = jax.random.uniform(
        k_out, (embed_dim, embed_dim), dtype, -bound_out, bound_out
    )

    in_proj_bias = jnp.zeros((3 * embed_dim,), dtype) if bias else None
    out_proj_bias = jnp.zeros((embed_dim,), dtype) if bias else None

    return AttentionPoolParams(
        in_proj_weight=in_proj_weight,
        out_proj_weight=out_proj_weight,
        in_proj_bias=in_proj_bias,
        out_proj_bias=out_proj_bias,
    )


def init_fusion_query(
    key: jax.Array, embed_dim: int, dtype: jnp.dtype = jnp.float32
) -> jax.Array:
    """Learnable fusion query ``(1, 1, E) ~ N(0, √(2/E))``."""
    std = math.sqrt(2.0 / embed_dim)
    return std * jax.random.normal(key, (1, 1, embed_dim), dtype)
