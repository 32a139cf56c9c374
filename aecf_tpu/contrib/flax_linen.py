"""Flax linen interop: AECF fusion as `nn.Module`s.

For codebases built on flax — wraps the pure core (and the fused TPU
kernels via :func:`aecf_tpu.ops.fusion_pool`) in linen modules with
standard param/RNG handling.  Randomness for the curriculum Bernoulli draw
comes from the ``'curriculum'`` RNG collection.

Example::

    fusion = FusionPool(embed_dim=512, num_heads=1, mask_prob=0.15)
    vars_ = fusion.init(jax.random.key(0), modalities)
    out, info = fusion.apply(
        vars_, modalities, training=True,
        rngs={"curriculum": jax.random.key(1)},
    )
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax

from ..core.attention import AttentionPoolParams
from ..core.init import init_attention_pool_params, init_fusion_query
from ..ops import fusion_pool

__all__ = ["FusionPool", "MultimodalAttentionPool"]


def _pool_param_init(bias: bool):
    def init(key, embed_dim):
        return init_attention_pool_params(key, embed_dim, bias=bias)

    return init


class MultimodalAttentionPool(nn.Module):
    """linen version of the pool: query supplied by the caller.

    ``__call__(query, key_value, *, training, return_info)`` — mirrors the
    reference forward contract; ``query`` may be ``(B, 1, E)`` or a shared
    ``(1, 1, E)`` (fused-kernel fast path on TPU).
    """

    embed_dim: int
    num_heads: int = 1
    bias: bool = True
    mask_prob: float = 0.15
    entropy_target: float = 0.7
    min_active: int = 1
    masking: bool = True
    implementation: str = "auto"

    @nn.compact
    def __call__(
        self,
        query: jax.Array,
        key_value: jax.Array,
        *,
        training: bool = False,
        return_info: bool = False,
    ):
        wrapped = self.param(
            "pool", _pool_param_init(self.bias), self.embed_dim
        )
        params = (
            wrapped
            if isinstance(wrapped, AttentionPoolParams)
            else AttentionPoolParams(**wrapped)
        )
        rng = None
        if training and self.masking and key_value.shape[1] > 1:
            rng = self.make_rng("curriculum")
        out, weights, masked, mask_info = fusion_pool(
            params,
            query,
            key_value,
            num_heads=self.num_heads,
            rng=rng,
            training=training and self.masking,
            base_mask_prob=self.mask_prob,
            entropy_target=self.entropy_target,
            min_active=self.min_active,
            implementation=self.implementation,
        )
        if not return_info:
            return out
        info: Dict[str, Any] = dict(mask_info)
        info["attention_weights"] = weights
        info["masked_attention_weights"] = masked
        return out, info


class FusionPool(nn.Module):
    """create_fusion_pool as a single linen module: owns the learnable
    fusion query and pools ``(B, M, E)`` modalities to ``(B, E)``."""

    embed_dim: int
    num_heads: int = 1
    mask_prob: float = 0.15
    entropy_target: float = 0.7
    min_active: int = 1
    implementation: str = "auto"

    @nn.compact
    def __call__(
        self,
        modalities: jax.Array,  # (B, M, E)
        *,
        training: bool = False,
        return_info: bool = False,
    ):
        query = self.param(
            "fusion_query",
            lambda key: init_fusion_query(key, self.embed_dim),
        )
        pool = MultimodalAttentionPool(
            embed_dim=self.embed_dim,
            num_heads=self.num_heads,
            mask_prob=self.mask_prob,
            entropy_target=self.entropy_target,
            min_active=self.min_active,
            implementation=self.implementation,
            name="pool",
        )
        result = pool(
            query,
            modalities,
            training=training,
            return_info=return_info,
        )
        if return_info:
            out, info = result
            return out.squeeze(1), info
        return result.squeeze(1)
