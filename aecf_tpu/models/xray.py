"""X-ray experiment models: concat-fusion baseline vs AECF attention fusion.

Re-implements the reference experiment models
(xrays/train_xrays_example.py:42-237) TPU-first:

* The reference routes rows through three code paths with boolean advanced
  indexing (``indices = torch.where(both_present)[0]`` — :92-104, :211-234),
  which is dynamic-shape-hostile to XLA.  Here every row flows through all
  three paths densely and the result is selected with presence masks — same
  values, static shapes, MXU-friendly batched GEMMs.
* Missing-modality simulation (:156-177) keeps the reference's exact
  semantics (independent Bernoulli(0.3) drops per modality, coin-flip rescue
  when both drop) as a branchless where-chain.
* The curriculum toggle (:179-187) is a static flag on ``apply`` — flipping
  it at the activation epoch re-traces once, instead of hot-swapping modules.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple, Union

import jax
import jax.numpy as jnp

from ..core.attention import AttentionPoolParams
from ..core.init import init_attention_pool_params
from ..ops import fusion_pool
from .layers import LinearParams, dropout, init_linear, linear, mlp_encoder

__all__ = [
    "XrayBaselineModel",
    "XrayBaselineParams",
    "XrayAECFModel",
    "XrayAECFParams",
    "PRESENCE_EPS",
]

# Presence = ‖features‖ > 1e-6 (reference train_xrays_example.py:81-82).
PRESENCE_EPS = 1e-6


def _presence(x: jax.Array) -> jax.Array:
    return jnp.linalg.norm(x, axis=1) > PRESENCE_EPS


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class XrayBaselineParams:
    image_encoder: LinearParams
    text_encoder: LinearParams
    image_proj: LinearParams
    text_proj: LinearParams
    classifier_hidden: LinearParams
    classifier_out: LinearParams


@dataclasses.dataclass(frozen=True)
class XrayBaselineModel:
    """Concat-fusion control model (reference train_xrays_example.py:42-106)."""

    image_dim: int = 512
    text_dim: int = 512
    num_classes: int = 80
    hidden_dim: int = 256

    name = "Concat_Baseline"

    def init(self, key: jax.Array) -> XrayBaselineParams:
        ks = jax.random.split(key, 6)
        h = self.hidden_dim
        return XrayBaselineParams(
            image_encoder=init_linear(ks[0], self.image_dim, h),
            text_encoder=init_linear(ks[1], self.text_dim, h),
            image_proj=init_linear(ks[2], h, 2 * h),
            text_proj=init_linear(ks[3], h, 2 * h),
            classifier_hidden=init_linear(ks[4], 2 * h, h),
            classifier_out=init_linear(ks[5], h, self.num_classes),
        )

    def _classify(self, params, fused, key, training):
        h = jax.nn.relu(linear(params.classifier_hidden, fused))
        h = dropout(h, 0.1, key, training)
        return linear(params.classifier_out, h)

    def apply(
        self,
        params: XrayBaselineParams,
        image_features: jax.Array,
        text_features: jax.Array,
        *,
        training: bool = False,
        rng: Optional[jax.Array] = None,
    ) -> jax.Array:
        k_img = k_txt = k_cls = None
        if rng is not None:
            k_img, k_txt, k_cls = jax.random.split(rng, 3)

        img = mlp_encoder(
            params.image_encoder, image_features, key=k_img, training=training
        )
        txt = mlp_encoder(
            params.text_encoder, text_features, key=k_txt, training=training
        )

        img_present = _presence(image_features)
        txt_present = _presence(text_features)
        both = img_present & txt_present
        only_img = img_present & ~txt_present
        only_txt = ~img_present & txt_present

        # Dense compute + masked select (vs reference's boolean indexing).
        concat = jnp.concatenate([img, txt], axis=-1)
        img_only = linear(params.image_proj, img)
        txt_only = linear(params.text_proj, txt)

        fused = jnp.where(
            both[:, None],
            concat,
            jnp.where(
                only_img[:, None],
                img_only,
                jnp.where(only_txt[:, None], txt_only, 0.0),
            ),
        )
        return self._classify(params, fused, k_cls, training)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class XrayAECFParams:
    image_encoder: LinearParams
    text_encoder: LinearParams
    pool: AttentionPoolParams
    fusion_query: jax.Array  # (1, 1, H)
    image_proj: LinearParams
    text_proj: LinearParams
    fusion_proj: LinearParams
    classifier_hidden: LinearParams
    classifier_out: LinearParams


@dataclasses.dataclass(frozen=True)
class XrayAECFModel:
    """AECF model with controllable curriculum masking
    (reference train_xrays_example.py:108-237).

    ``curriculum_enabled`` / ``missing_modality_training`` are per-call static
    flags on :meth:`apply` — the functional equivalent of the reference's
    ``toggle_curriculum`` hot-swap (:179-187).
    """

    image_dim: int = 512
    text_dim: int = 512
    num_classes: int = 80
    hidden_dim: int = 256
    num_heads: int = 4
    base_mask_prob: float = 0.15
    entropy_target: float = 0.7
    min_active: int = 1
    missing_prob: float = 0.3

    name = "AECF_Model"

    def init(self, key: jax.Array) -> XrayAECFParams:
        ks = jax.random.split(key, 9)
        h = self.hidden_dim
        # fusion_query ~ randn * 0.02 (reference :139), unlike
        # create_fusion_pool's N(0, √(2/E)).
        fusion_query = 0.02 * jax.random.normal(ks[3], (1, 1, h))
        return XrayAECFParams(
            image_encoder=init_linear(ks[0], self.image_dim, h),
            text_encoder=init_linear(ks[1], self.text_dim, h),
            pool=init_attention_pool_params(ks[2], h),
            fusion_query=fusion_query,
            image_proj=init_linear(ks[4], h, 2 * h),
            text_proj=init_linear(ks[5], h, 2 * h),
            fusion_proj=init_linear(ks[6], h, 2 * h),
            classifier_hidden=init_linear(ks[7], 2 * h, h),
            classifier_out=init_linear(ks[8], h, self.num_classes),
        )

    # -- missing-modality simulation (reference :156-177) ---------------------
    def simulate_missing_modalities(
        self,
        key: jax.Array,
        image_features: jax.Array,
        text_features: jax.Array,
    ) -> Tuple[jax.Array, jax.Array]:
        B = image_features.shape[0]
        k1, k2, k3 = jax.random.split(key, 3)
        mask_image = jax.random.uniform(k1, (B,)) < self.missing_prob
        mask_text = jax.random.uniform(k2, (B,)) < self.missing_prob
        # Coin-flip rescue where both would drop (reference :166-170).
        both_masked = mask_image & mask_text
        keep_image = jax.random.uniform(k3, (B,)) > 0.5
        mask_image = jnp.where(both_masked, ~keep_image, mask_image)
        mask_text = jnp.where(both_masked, keep_image, mask_text)
        image_features = jnp.where(mask_image[:, None], 0.0, image_features)
        text_features = jnp.where(mask_text[:, None], 0.0, text_features)
        return image_features, text_features

    def apply(
        self,
        params: XrayAECFParams,
        image_features: jax.Array,
        text_features: jax.Array,
        *,
        training: bool = False,
        rng: Optional[jax.Array] = None,
        curriculum_enabled: bool = False,
        missing_modality_training: bool = False,
        return_info: bool = False,
    ) -> Union[jax.Array, Tuple[jax.Array, Dict[str, Any]]]:
        B = image_features.shape[0]
        h = self.hidden_dim
        info: Dict[str, Any] = {}

        k_missing = k_img = k_txt = k_mask = k_cls = None
        if rng is not None:
            k_missing, k_img, k_txt, k_mask, k_cls = jax.random.split(rng, 5)

        if training and missing_modality_training:
            if k_missing is None:
                raise ValueError(
                    "missing_modality_training needs an `rng=` key"
                )
            image_features, text_features = self.simulate_missing_modalities(
                k_missing, image_features, text_features
            )

        img = mlp_encoder(
            params.image_encoder, image_features, key=k_img, training=training
        )
        txt = mlp_encoder(
            params.text_encoder, text_features, key=k_txt, training=training
        )

        img_present = _presence(image_features)
        txt_present = _presence(text_features)
        both = img_present & txt_present
        only_img = img_present & ~txt_present
        only_txt = ~img_present & txt_present

        # Attention fusion path — computed densely for every row; the
        # unexpanded query routes through the shared-query fused kernel on
        # TPU.  Masking runs only when the curriculum is enabled (the
        # reference's hot-swapped curriculum_masking module, :179-187).
        modalities = jnp.stack([img, txt], axis=1)  # (B, 2, H)
        attn_out, weights, masked_weights, mask_info = fusion_pool(
            params.pool,
            params.fusion_query,
            modalities,
            num_heads=self.num_heads,
            rng=k_mask,
            training=training and curriculum_enabled,
            base_mask_prob=self.base_mask_prob,
            entropy_target=self.entropy_target,
            min_active=self.min_active,
        )

        if curriculum_enabled:
            info.update(mask_info)
            info["attention_weights"] = weights
            if return_info:
                info["masked_attention_weights"] = masked_weights
        elif return_info:
            info["attention_weights"] = weights
        if return_info:
            # The reference computes fusion stats only over both-present rows
            # (sub-batch indexing, :211-225); dense compute covers every row,
            # so expose the row mask for parity-correct aggregation.
            info["fusion_row_mask"] = both

        multimodal = linear(params.fusion_proj, attn_out.squeeze(1))
        img_only = linear(params.image_proj, img)
        txt_only = linear(params.text_proj, txt)

        fused = jnp.where(
            both[:, None],
            multimodal,
            jnp.where(
                only_img[:, None],
                img_only,
                jnp.where(only_txt[:, None], txt_only, 0.0),
            ),
        )

        hidden = jax.nn.relu(linear(params.classifier_hidden, fused))
        hidden = dropout(hidden, 0.1, k_cls, training)
        logits = linear(params.classifier_out, hidden)
        return (logits, info) if return_info else logits
