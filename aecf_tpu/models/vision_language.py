"""VisionLanguageModel — the canonical L3 integration pattern.

Re-implements the reference's documented integration contract
(README.md:162-208): project each modality to a shared space, stack on axis 1,
pool with the learnable fusion query, squeeze, classify; training adds
``0.01 * entropy_loss(info['entropy'])`` to the task loss.

Pure-functional: ``VisionLanguageModel`` holds static config;
``init(key) -> params``; ``apply(params, img, txt, ...)`` is jit/shard_map
ready.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple, Union

import jax
import jax.numpy as jnp

from ..core.attention import AttentionPoolParams
from ..core.init import init_attention_pool_params, init_fusion_query
from ..ops import fusion_pool
from .layers import LinearParams, init_linear, linear

__all__ = ["VisionLanguageModel", "VisionLanguageParams"]


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class VisionLanguageParams:
    img_proj: LinearParams
    txt_proj: LinearParams
    fusion_query: jax.Array  # (1, 1, H)
    pool: AttentionPoolParams
    classifier: LinearParams


@dataclasses.dataclass(frozen=True)
class VisionLanguageModel:
    """img(2048) + txt(768) → hidden(512) fusion + classifier.

    Matches BASELINE.json config #4 defaults.
    """

    img_dim: int = 2048
    txt_dim: int = 768
    hidden_dim: int = 512
    num_classes: int = 1000
    mask_prob: float = 0.15
    num_heads: int = 1
    entropy_target: float = 0.7
    min_active: int = 1

    def init(self, key: jax.Array) -> VisionLanguageParams:
        k1, k2, k3, k4, k5 = jax.random.split(key, 5)
        return VisionLanguageParams(
            img_proj=init_linear(k1, self.img_dim, self.hidden_dim),
            txt_proj=init_linear(k2, self.txt_dim, self.hidden_dim),
            fusion_query=init_fusion_query(k3, self.hidden_dim),
            pool=init_attention_pool_params(k4, self.hidden_dim),
            classifier=init_linear(k5, self.hidden_dim, self.num_classes),
        )

    def apply(
        self,
        params: VisionLanguageParams,
        image_feats: jax.Array,  # (B, img_dim)
        text_feats: jax.Array,  # (B, txt_dim)
        *,
        training: bool = False,
        rng: Optional[jax.Array] = None,
        return_info: bool = False,
        use_checkpoint: bool = False,
    ) -> Union[jax.Array, Tuple[jax.Array, Dict[str, Any]]]:
        img = linear(params.img_proj, image_feats)
        txt = linear(params.txt_proj, text_feats)
        modalities = jnp.stack([img, txt], axis=1)  # (B, 2, H)

        # The unexpanded (1,1,E) query routes through the shared-query
        # fused kernel on TPU (aecf_tpu.ops.fusion_pool dispatch).
        def fuse(pool_params, query, kv):
            return fusion_pool(
                pool_params,
                query,
                kv,
                num_heads=self.num_heads,
                rng=rng,
                training=training,
                base_mask_prob=self.mask_prob,
                entropy_target=self.entropy_target,
                min_active=self.min_active,
            )

        if use_checkpoint and training:
            fuse = jax.checkpoint(fuse)
        pooled, weights, masked_weights, mask_info = fuse(
            params.pool, params.fusion_query, modalities
        )
        logits = linear(params.classifier, pooled.squeeze(1))

        if return_info:
            info: Dict[str, Any] = dict(mask_info)
            info["attention_weights"] = weights
            info["masked_attention_weights"] = masked_weights
            return logits, info
        return logits
