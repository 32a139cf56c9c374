"""Fused Pallas TPU kernels — the framework's native compute path."""

from .fused_pool import fused_fusion_pool, supports_fused

__all__ = ["fused_fusion_pool", "supports_fused"]
