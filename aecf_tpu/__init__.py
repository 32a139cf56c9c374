"""AECF-TPU: Adaptive Entropy-gated Contrastive Fusion, rebuilt TPU-native.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the
reference AECF library (leochlon/aecf): entropy-driven curriculum masking for
multimodal attention fusion, with a fused Pallas TPU kernel for the whole
fusion path and shard_map data parallelism for scale-out.

Public API (parity with reference aecf/__init__.py:8-21):
    CurriculumMasking, MultimodalAttentionPool,
    multimodal_attention_pool, create_fusion_pool

Lower layers:
    aecf_tpu.core      — pure functions (jit/vmap/shard_map-ready oracle)
    aecf_tpu.kernels   — fused Pallas TPU kernels
    aecf_tpu.models    — integration model families
    aecf_tpu.train     — optax trainer, metrics, orbax checkpointing
    aecf_tpu.parallel  — device-mesh sharding helpers
    aecf_tpu.data      — pathology mining + synthetic feature pipelines
"""

from .nn import (
    CurriculumMasking,
    MultimodalAttentionPool,
    create_fusion_pool,
    multimodal_attention_pool,
)

__version__ = "0.1.0"
__all__ = [
    "CurriculumMasking",
    "MultimodalAttentionPool",
    "multimodal_attention_pool",
    "create_fusion_pool",
]
