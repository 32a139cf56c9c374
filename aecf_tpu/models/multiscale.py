"""MultiScaleFusion — per-scale fusion pools (README.md:355-368 pattern).

The reference sketches a ModuleList of ``create_fusion_pool(dim, 2)[1]`` over
several feature dims — each scale gets its own learnable query AND its own
``CurriculumMasking`` (create_fusion_pool always attaches one,
AECFLayer.py:719-726).  Functional equivalent: one pool per scale fused via
:func:`aecf_tpu.ops.fusion_pool` (shared-query Pallas kernel on TPU, XLA
oracle elsewhere), with per-scale curriculum masking and info dicts.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp

from ..core.attention import AttentionPoolParams
from ..core.init import init_attention_pool_params, init_fusion_query
from ..ops import fusion_pool

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
    entropy_target: float = 0.7
    min_active: int = 1

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
        *,
        training: bool = False,
        rng: Optional[jax.Array] = None,
        return_info: bool = False,
    ) -> Union[
        List[jax.Array], Tuple[List[jax.Array], List[Dict[str, Any]]]
    ]:
        """Fuse each scale independently with per-scale curriculum masking.

        Returns per-scale pooled features ``[(B, dim_i), ...]``; with
        ``return_info=True`` also a per-scale list of info dicts (same key
        contract as ``MultimodalAttentionPool``: ``entropy``/``mask_rate``
        (+ ``target_entropy`` in training) plus ``attention_weights`` and
        detached ``masked_attention_weights``).  Masking follows reference
        quirk Q1 — observability/regularization only, outputs unchanged.
        """
        if len(scale_modalities) != len(self.dims):
            raise ValueError(
                f"expected {len(self.dims)} scales, got {len(scale_modalities)}"
            )
        if training and rng is None:
            raise ValueError(
                "training-mode curriculum masking needs an `rng=` key"
            )
        scale_keys = (
            jax.random.split(rng, len(self.dims))
            if rng is not None
            else (None,) * len(self.dims)
        )

        outs: List[jax.Array] = []
        infos: List[Dict[str, Any]] = []
        for query, pool, mods, k in zip(
            params.queries, params.pools, scale_modalities, scale_keys
        ):
            pooled, weights, masked_weights, mask_info = fusion_pool(
                pool,
                query,
                mods,
                num_heads=1,
                rng=k,
                training=training,
                base_mask_prob=self.mask_prob,
                entropy_target=self.entropy_target,
                min_active=self.min_active,
            )
            outs.append(pooled.squeeze(1))
            if return_info:
                info: Dict[str, Any] = dict(mask_info)
                info["attention_weights"] = weights
                info["masked_attention_weights"] = masked_weights
                infos.append(info)
        if return_info:
            return outs, infos
        return outs
