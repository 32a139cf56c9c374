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

from ..core.attention import AttentionPoolParams, attention_pool_core
from ..core.init import init_attention_pool_params, init_fusion_query
from ..core.masking import curriculum_mask
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
        B = image_feats.shape[0]
        img = linear(params.img_proj, image_feats)
        txt = linear(params.txt_proj, text_feats)
        modalities = jnp.stack([img, txt], axis=1)  # (B, 2, H)
        query = jnp.broadcast_to(
            params.fusion_query, (B, 1, self.hidden_dim)
        )

        def attend(q, kv):
            return attention_pool_core(
                params.pool,
                q,
                kv,
                kv,
                num_heads=self.num_heads,
                need_weights=True,
            )

        if use_checkpoint and training:
            attend = jax.checkpoint(attend)
        pooled, weights = attend(query, modalities)

        masked_weights, mask_info = curriculum_mask(
            weights,
            key=rng,
            training=training,
            base_mask_prob=self.mask_prob,
            entropy_target=self.entropy_target,
            min_active=self.min_active,
        )
        logits = linear(params.classifier, pooled.squeeze(1))

        if return_info:
            info: Dict[str, Any] = dict(mask_info)
            info["attention_weights"] = weights
            info["masked_attention_weights"] = jax.lax.stop_gradient(
                masked_weights
            )
            return logits, info
        return logits
