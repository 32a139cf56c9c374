"""Fused Pallas TPU kernels — the framework's native compute path."""

from .fused_pool import fused_fusion_pool, prefers_fused, supports_fused
from .shared_query import fused_fusion_pool_shared, quantize_features
from .train_step import (
    fused_pool_head_train_step,
    fused_pool_train_step,
    step_tile,
    supports_fused_step,
)

__all__ = [
    "fused_fusion_pool",
    "fused_fusion_pool_shared",
    "fused_pool_train_step",
    "fused_pool_head_train_step",
    "supports_fused",
    "supports_fused_step",
    "prefers_fused",
    "quantize_features",
]
