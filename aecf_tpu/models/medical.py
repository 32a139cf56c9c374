"""MedicalDiagnosisModel — the 3-modality L3 integration pattern.

Re-implements the reference's documented medical example (README.md:213-267):
image(1024)/lab(50)/clinical(200) encoders → 512, AECF fusion with
``mask_prob=0.25, num_heads=8``, 10-class head.  The reference stacks only
the *provided* modalities (variable count) — dynamic shapes.  TPU-first
redesign: always stack all three slots and mask absent ones with
``key_padding_mask``, which reproduces "attend only to present modalities"
with static shapes.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple, Union

import jax
import jax.numpy as jnp

from ..core.attention import AttentionPoolParams
from ..core.init import init_attention_pool_params, init_fusion_query
from ..ops import fusion_pool
from .layers import LinearParams, init_linear, linear, mlp_encoder

__all__ = ["MedicalDiagnosisModel", "MedicalDiagnosisParams"]


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class MedicalDiagnosisParams:
    image_encoder: LinearParams
    lab_encoder: LinearParams
    clinical_encoder: LinearParams
    fusion_query: jax.Array
    pool: AttentionPoolParams
    classifier: LinearParams


@dataclasses.dataclass(frozen=True)
class MedicalDiagnosisModel:
    image_dim: int = 1024
    lab_dim: int = 50
    clinical_dim: int = 200
    hidden_dim: int = 512
    num_classes: int = 10
    mask_prob: float = 0.25  # higher masking for medical robustness
    num_heads: int = 8
    entropy_target: float = 0.7
    min_active: int = 1

    def init(self, key: jax.Array) -> MedicalDiagnosisParams:
        ks = jax.random.split(key, 6)
        h = self.hidden_dim
        return MedicalDiagnosisParams(
            image_encoder=init_linear(ks[0], self.image_dim, h),
            lab_encoder=init_linear(ks[1], self.lab_dim, h),
            clinical_encoder=init_linear(ks[2], self.clinical_dim, h),
            fusion_query=init_fusion_query(ks[3], h),
            pool=init_attention_pool_params(ks[4], h),
            classifier=init_linear(ks[5], h, self.num_classes),
        )

    def apply(
        self,
        params: MedicalDiagnosisParams,
        image: Optional[jax.Array] = None,
        lab: Optional[jax.Array] = None,
        clinical: Optional[jax.Array] = None,
        *,
        training: bool = False,
        rng: Optional[jax.Array] = None,
        return_info: bool = False,
    ) -> Union[jax.Array, Tuple[jax.Array, Dict[str, Any]]]:
        provided = [x for x in (image, lab, clinical) if x is not None]
        if not provided:
            raise ValueError("At least one modality must be provided")
        B = provided[0].shape[0]
        h = self.hidden_dim

        k_enc = k_mask = None
        if rng is not None:
            k_enc, k_mask = jax.random.split(rng)
        enc_keys = (
            jax.random.split(k_enc, 3) if k_enc is not None else (None,) * 3
        )

        # Static 3-slot layout; absent modalities are zero-filled and padded
        # out of the attention (key_padding_mask), so weights renormalize over
        # the present slots — semantically "stack available modalities".
        slots = []
        padding = []
        for x, enc, kk in (
            (image, params.image_encoder, enc_keys[0]),
            (lab, params.lab_encoder, enc_keys[1]),
            (clinical, params.clinical_encoder, enc_keys[2]),
        ):
            if x is None:
                slots.append(jnp.zeros((B, h)))
                padding.append(jnp.ones((B,), dtype=bool))
            else:
                slots.append(
                    mlp_encoder(enc, x, key=kk, training=training)
                )
                padding.append(jnp.zeros((B,), dtype=bool))
        modalities = jnp.stack(slots, axis=1)  # (B, 3, H)
        key_padding_mask = jnp.stack(padding, axis=1)  # (B, 3)

        # Shared-query fused kernel on TPU (padding-aware); XLA elsewhere.
        pooled, weights, masked_weights, mask_info = fusion_pool(
            params.pool,
            params.fusion_query,
            modalities,
            num_heads=self.num_heads,
            rng=k_mask,
            # Masking runs whenever training, like the reference module —
            # NOT gated on return_info (info is just the observability view).
            training=training,
            base_mask_prob=self.mask_prob,
            entropy_target=self.entropy_target,
            min_active=self.min_active,
            key_padding_mask=key_padding_mask,
        )

        logits = linear(params.classifier, pooled.squeeze(1))

        if return_info:
            info: Dict[str, Any] = dict(mask_info)
            info["attention_weights"] = weights
            info["masked_attention_weights"] = masked_weights
            return logits, info
        return logits
