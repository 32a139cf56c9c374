"""Functional entry points: ``multimodal_attention_pool`` and
``create_fusion_pool``.

Mirrors reference aecf/AECFLayer.py:584-727 including the fast/slow dispatch
(:637-640) and the Q3 quirk: the slow path constructs a *fresh,
randomly-initialized* module per call (:643-652), so its outputs are
untrained — kept for parity, with explicit ``init_key`` control added for
reproducibility.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax

from ..core.attention import scaled_dot_product_attention
from ..core.init import init_fusion_query
from .modules import CurriculumMasking, MultimodalAttentionPool, _next_default_key

__all__ = ["multimodal_attention_pool", "create_fusion_pool"]


def multimodal_attention_pool(
    query: jax.Array,
    key: jax.Array,
    value: Optional[jax.Array] = None,
    embed_dim: Optional[int] = None,
    num_heads: int = 1,
    dropout: float = 0.0,
    curriculum_masking: Optional[CurriculumMasking] = None,
    training: bool = False,
    *,
    init_key: Optional[jax.Array] = None,
    rng: Optional[jax.Array] = None,
) -> jax.Array:
    """Functional multimodal attention pooling with a projection-free fast path.

    Fast path (eval ∧ no masking ∧ dropout=0 ∧ single head — reference
    AECFLayer.py:637-640): plain scaled dot-product attention, no projections.
    Anything else constructs a fresh ``MultimodalAttentionPool`` per call
    (reference quirk Q3); pass ``init_key`` to pin its random init and ``rng``
    for training-mode randomness.

    Example (mirrors reference AECFLayer.py:615-624):

    >>> import jax, jax.numpy as jnp
    >>> q = jnp.ones((2, 1, 64))
    >>> kv = jnp.ones((2, 3, 64))
    >>> multimodal_attention_pool(q, kv).shape          # fast path
    (2, 1, 64)
    >>> out = multimodal_attention_pool(
    ...     q, kv, training=True, init_key=jax.random.key(0),
    ...     rng=jax.random.key(1))                       # fresh-module path
    >>> out.shape
    (2, 1, 64)
    """
    if embed_dim is None:
        embed_dim = query.shape[-1]
    if value is None:
        value = key

    if (
        not training
        and curriculum_masking is None
        and dropout == 0.0
        and num_heads == 1
    ):
        return scaled_dot_product_attention(query, key, value)

    pool = MultimodalAttentionPool(
        embed_dim=embed_dim,
        num_heads=num_heads,
        dropout=dropout,
        curriculum_masking=curriculum_masking,
        batch_first=True,
        key=init_key,
    )
    pool.train(training)
    return pool(query, key, value, rng=rng)


def create_fusion_pool(
    embed_dim: int,
    num_modalities: int,
    mask_prob: float = 0.15,
    *,
    key: Optional[jax.Array] = None,
    **kwargs,
) -> Tuple[jax.Array, MultimodalAttentionPool]:
    """Factory for ``(fusion_query, attention_pool)`` (reference
    AECFLayer.py:655-727).

    ``fusion_query`` is a ``(1, 1, E)`` array drawn from ``N(0, √(2/E))`` —
    register it as a trainable leaf in your model's param pytree.
    ``num_modalities`` is validation-only, as in the reference (:708).

    Example (mirrors reference AECFLayer.py:688-698):

    >>> import jax, jax.numpy as jnp
    >>> query, pool = create_fusion_pool(64, 3, key=jax.random.key(0))
    >>> query.shape
    (1, 1, 64)
    >>> kv = jnp.ones((2, 3, 64))
    >>> q = jnp.broadcast_to(query, (2, 1, 64))
    >>> out, info = pool.eval()(q, kv, return_info=True)
    >>> out.shape
    (2, 1, 64)
    >>> sorted(info)                    # eval: no target_entropy key
    ['attention_weights', 'entropy', 'mask_rate', 'masked_attention_weights']
    >>> out, info = pool.train()(q, kv, rng=jax.random.key(1),
    ...                          return_info=True)
    >>> sorted(info)                    # training adds target_entropy
    ['attention_weights', 'entropy', 'mask_rate', 'masked_attention_weights', 'target_entropy']
    """
    if not isinstance(embed_dim, int) or embed_dim <= 0:
        raise ValueError(
            f"embed_dim must be a positive integer, got {embed_dim}"
        )
    if not isinstance(num_modalities, int) or num_modalities <= 0:
        raise ValueError(
            f"num_modalities must be a positive integer, got {num_modalities}"
        )
    if not isinstance(mask_prob, (int, float)) or not 0.0 < mask_prob <= 1.0:
        raise ValueError(f"mask_prob must be in (0, 1], got {mask_prob}")

    if key is None:
        key = _next_default_key()
    k_query, k_pool = jax.random.split(key)

    fusion_query = init_fusion_query(k_query, embed_dim)
    curriculum_masking = CurriculumMasking(base_mask_prob=mask_prob)
    attention_pool = MultimodalAttentionPool(
        embed_dim=embed_dim,
        curriculum_masking=curriculum_masking,
        key=k_pool,
        **kwargs,
    )
    return fusion_query, attention_pool
