"""MultiScaleFusion — per-scale fusion pools (README.md:355-368 pattern).

The reference sketches a ModuleList of ``create_fusion_pool(dim, 2)[1]`` over
several feature dims.  Functional equivalent: one pool per scale, each with
its own query, applied to 2-modality stacks at that scale.
"""

from __future__ import annotations

import dataclasses
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..core.attention import AttentionPoolParams, attention_pool_core
from ..core.init import init_attention_pool_params, init_fusion_query

__all__ = ["MultiScaleFusion", "MultiScaleFusionParams"]


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class MultiScaleFusionParams:
    queries: List[jax.Array]
    pools: List[AttentionPoolParams]


@dataclasses.dataclass(frozen=True)
class MultiScaleFusion:
    dims: Tuple[int, ...] = (256, 512, 1024)
    mask_prob: float = 0.15

    def init(self, key: jax.Array) -> MultiScaleFusionParams:
        keys = jax.random.split(key, 2 * len(self.dims))
        queries, pools = [], []
        for i, dim in enumerate(self.dims):
            queries.append(init_fusion_query(keys[2 * i], dim))
            pools.append(init_attention_pool_params(keys[2 * i + 1], dim))
        return MultiScaleFusionParams(queries=queries, pools=pools)

    def apply(
        self,
        params: MultiScaleFusionParams,
        scale_modalities: Sequence[jax.Array],  # each (B, M, dim_i)
    ) -> List[jax.Array]:
        """Fuse each scale independently; returns per-scale (B, dim_i)."""
        if len(scale_modalities) != len(self.dims):
            raise ValueError(
                f"expected {len(self.dims)} scales, got {len(scale_modalities)}"
            )
        outs = []
        for query, pool, mods, dim in zip(
            params.queries, params.pools, scale_modalities, self.dims
        ):
            B = mods.shape[0]
            q = jnp.broadcast_to(query, (B, 1, dim))
            pooled, _ = attention_pool_core(
                pool, q, mods, mods, num_heads=1, need_weights=False
            )
            outs.append(pooled.squeeze(1))
        return outs
