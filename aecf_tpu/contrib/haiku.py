"""dm-haiku interop: AECF fusion as ``hk.Module``s.

Mirror of :mod:`aecf_tpu.contrib.flax_linen` for codebases built on haiku —
wraps the pure core (and the fused TPU kernels via
:func:`aecf_tpu.ops.fusion_pool`) with standard ``hk.get_parameter`` /
``hk.next_rng_key`` handling.  Curriculum randomness draws from the
transform's RNG (pass a key to ``apply`` when ``training=True``).

Example::

    def fwd(modalities, training=False, return_info=False):
        return FusionPool(512)(modalities, training=training,
                               return_info=return_info)

    f = hk.transform(fwd)
    params = f.init(jax.random.key(0), modalities)
    out, info = f.apply(params, jax.random.key(1), modalities,
                        training=True, return_info=True)
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import haiku as hk
import jax

from ..core.attention import AttentionPoolParams
from ..core.init import init_attention_pool_params, init_fusion_query
from ..ops import fusion_pool

__all__ = ["FusionPool", "MultimodalAttentionPool"]


def _get_pool_params(embed_dim: int, bias: bool) -> AttentionPoolParams:
    """Register the packed attention params as individual hk parameters
    (haiku params must be arrays, not dataclass pytrees)."""

    # One RNG draw, one template, shared by all four initializers — so a
    # haiku-initialized pool seed-matches init_attention_pool_params(key, E)
    # (and init work isn't quadrupled).  Built lazily: at apply time no
    # initializer runs and no key is consumed.
    cache: Dict[str, AttentionPoolParams] = {}

    def from_template(field):
        def init(shape, dtype):
            if "template" not in cache:
                key = hk.maybe_next_rng_key()
                if key is None:  # value comes from params, not init
                    key = jax.random.key(0)
                cache["template"] = init_attention_pool_params(
                    key, embed_dim, bias=bias
                )
            return getattr(cache["template"], field)

        return init

    E = embed_dim
    in_w = hk.get_parameter(
        "in_proj_weight", (3 * E, E), init=from_template("in_proj_weight")
    )
    out_w = hk.get_parameter(
        "out_proj_weight", (E, E), init=from_template("out_proj_weight")
    )
    in_b = out_b = None
    if bias:
        in_b = hk.get_parameter(
            "in_proj_bias", (3 * E,), init=from_template("in_proj_bias")
        )
        out_b = hk.get_parameter(
            "out_proj_bias", (E,), init=from_template("out_proj_bias")
        )
    return AttentionPoolParams(
        in_proj_weight=in_w,
        out_proj_weight=out_w,
        in_proj_bias=in_b,
        out_proj_bias=out_b,
    )


class MultimodalAttentionPool(hk.Module):
    """haiku version of the pool: query supplied by the caller.

    ``__call__(query, key_value, *, training, return_info)`` mirrors the
    reference forward contract; ``query`` may be ``(B, 1, E)`` or a shared
    ``(1, 1, E)`` (fused-kernel fast path on TPU).
    """

    def __init__(
        self,
        embed_dim: int,
        num_heads: int = 1,
        bias: bool = True,
        mask_prob: float = 0.15,
        entropy_target: float = 0.7,
        min_active: int = 1,
        masking: bool = True,
        implementation: str = "auto",
        name: Optional[str] = None,
    ):
        super().__init__(name=name)
        self.embed_dim = embed_dim
        self.num_heads = num_heads
        self.bias = bias
        self.mask_prob = mask_prob
        self.entropy_target = entropy_target
        self.min_active = min_active
        self.masking = masking
        self.implementation = implementation

    def __call__(
        self,
        query: jax.Array,
        key_value: jax.Array,
        *,
        training: bool = False,
        return_info: bool = False,
    ):
        params = _get_pool_params(self.embed_dim, self.bias)
        rng = None
        if training and self.masking and key_value.shape[1] > 1:
            rng = hk.next_rng_key()
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


class FusionPool(hk.Module):
    """create_fusion_pool as a single haiku module: owns the learnable
    fusion query and pools ``(B, M, E)`` modalities to ``(B, E)``."""

    def __init__(
        self,
        embed_dim: int,
        num_heads: int = 1,
        mask_prob: float = 0.15,
        entropy_target: float = 0.7,
        min_active: int = 1,
        implementation: str = "auto",
        name: Optional[str] = None,
    ):
        super().__init__(name=name)
        self.embed_dim = embed_dim
        self.num_heads = num_heads
        self.mask_prob = mask_prob
        self.entropy_target = entropy_target
        self.min_active = min_active
        self.implementation = implementation

    def __call__(
        self,
        modalities: jax.Array,  # (B, M, E)
        *,
        training: bool = False,
        return_info: bool = False,
    ):
        def q_init(shape, dtype):
            key = hk.maybe_next_rng_key()
            if key is None:
                key = jax.random.key(0)
            return init_fusion_query(key, self.embed_dim)

        query = hk.get_parameter(
            "fusion_query", (1, 1, self.embed_dim), init=q_init
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
            query, modalities, training=training, return_info=return_info
        )
        if return_info:
            out, info = result
            return out.squeeze(1), info
        return result.squeeze(1)
