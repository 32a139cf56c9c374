"""Small building blocks shared by the model families.

Pure functions over explicit param pytrees — no framework modules.  Matches
torch defaults where the reference relies on them (Linear init: kaiming
uniform ``±1/√fan_in`` weight + uniform bias, used implicitly throughout
xrays/train_xrays_example.py).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp

__all__ = ["LinearParams", "init_linear", "linear", "mlp_encoder", "dropout"]


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class LinearParams:
    weight: jax.Array  # (out, in) — torch layout
    bias: Optional[jax.Array] = None  # (out,)


def init_linear(
    key: jax.Array,
    in_dim: int,
    out_dim: int,
    bias: bool = True,
    dtype: jnp.dtype = jnp.float32,
) -> LinearParams:
    """torch nn.Linear default init: uniform ``±1/√in_dim`` for both."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(in_dim)
    weight = jax.random.uniform(kw, (out_dim, in_dim), dtype, -bound, bound)
    b = (
        jax.random.uniform(kb, (out_dim,), dtype, -bound, bound)
        if bias
        else None
    )
    return LinearParams(weight=weight, bias=b)


def linear(params: LinearParams, x: jax.Array) -> jax.Array:
    y = x @ params.weight.T
    return y if params.bias is None else y + params.bias


def dropout(
    x: jax.Array,
    rate: float,
    key: Optional[jax.Array],
    training: bool,
) -> jax.Array:
    """Inverted dropout; identity in eval or when no key is supplied."""
    if not training or rate <= 0.0 or key is None:
        return x
    keep = jax.random.bernoulli(key, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0)


def mlp_encoder(
    params: LinearParams,
    x: jax.Array,
    *,
    drop_rate: float = 0.1,
    key: Optional[jax.Array] = None,
    training: bool = False,
) -> jax.Array:
    """``Linear → ReLU → Dropout`` — the per-modality encoder pattern used by
    every reference model (train_xrays_example.py:51-61, README.md:225-239)."""
    h = jax.nn.relu(linear(params, x))
    return dropout(h, drop_rate, key, training)
