"""Cross-attention pooling — pure-functional core.

TPU-native re-implementation of the attention math the reference delegates to
``nn.MultiheadAttention`` (reference: aecf/AECFLayer.py:399-407, :515-521).
The parameterization mirrors torch's packed layout — ``in_proj_weight``
``(3E, E)``, ``out_proj_weight`` ``(E, E)`` — so checkpoints can be converted
1:1, but the computation is expressed as plain einsums that XLA tiles straight
onto the MXU.  No Python branching on traced values anywhere.

Shapes follow the reference convention: with ``batch_first=True`` query is
``(B, T, E)``, key/value are ``(B, S, E)``; output matches the query shape and
the returned attention weights are head-averaged ``(B, T, S)`` (the reference
always calls with ``average_attn_weights=True``, AECFLayer.py:521).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

__all__ = [
    "AttentionPoolParams",
    "AttentionPoolConfig",
    "attention_pool_core",
    "apply_pooled_weights",
    "scaled_dot_product_attention",
]


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class AttentionPoolParams:
    """Parameters in torch ``nn.MultiheadAttention`` packed layout.

    ``in_proj_weight`` rows ``[0:E]``/``[E:2E]``/``[2E:3E]`` are the Q/K/V
    projections; projections compute ``x @ W.T + b`` (torch Linear
    convention).
    """

    in_proj_weight: jax.Array  # (3E, E)
    out_proj_weight: jax.Array  # (E, E)
    in_proj_bias: Optional[jax.Array] = None  # (3E,)
    out_proj_bias: Optional[jax.Array] = None  # (E,)


@dataclasses.dataclass(frozen=True)
class AttentionPoolConfig:
    """Static attention-pool configuration (reference AECFLayer.py:371-391)."""

    embed_dim: int
    num_heads: int = 1
    dropout: float = 0.0
    bias: bool = True
    batch_first: bool = True

    def __post_init__(self):
        if self.embed_dim <= 0:
            raise ValueError(f"embed_dim must be positive, got {self.embed_dim}")
        if self.num_heads <= 0:
            raise ValueError(f"num_heads must be positive, got {self.num_heads}")
        if self.embed_dim % self.num_heads != 0:
            raise ValueError(
                f"embed_dim ({self.embed_dim}) must be divisible by "
                f"num_heads ({self.num_heads})"
            )
        if not 0.0 <= self.dropout <= 1.0:
            raise ValueError(f"dropout must be in [0, 1], got {self.dropout}")

    @property
    def head_dim(self) -> int:
        return self.embed_dim // self.num_heads


def _merge_masks(
    scores: jax.Array,
    key_padding_mask: Optional[jax.Array],
    attn_mask: Optional[jax.Array],
) -> jax.Array:
    """Apply torch-style masks to ``(B, H, T, S)`` scores.

    Boolean masks: ``True`` means *disallow* (torch convention).  Float masks
    are added to the scores.  ``attn_mask`` may be ``(T, S)`` or ``(B, T, S)``.
    ``key_padding_mask`` is ``(B, S)`` with ``True`` marking padding
    (reference forward signature, AECFLayer.py:414-415).
    """
    neg_inf = jnp.asarray(float("-inf"), scores.dtype)
    if attn_mask is not None:
        if attn_mask.ndim == 2:
            am = attn_mask[None, None, :, :]
        elif attn_mask.ndim == 3:
            am = attn_mask[:, None, :, :]
        else:
            raise ValueError(f"attn_mask must be 2D or 3D, got {attn_mask.ndim}D")
        if jnp.issubdtype(am.dtype, jnp.bool_):
            scores = jnp.where(am, neg_inf, scores)
        else:
            scores = scores + am.astype(scores.dtype)
    if key_padding_mask is not None:
        kpm = key_padding_mask[:, None, None, :]  # (B,1,1,S)
        if jnp.issubdtype(kpm.dtype, jnp.bool_):
            scores = jnp.where(kpm, neg_inf, scores)
        else:
            scores = scores + kpm.astype(scores.dtype)
    return scores


def attention_pool_core(
    params: AttentionPoolParams,
    query: jax.Array,
    key: jax.Array,
    value: jax.Array,
    *,
    num_heads: int,
    key_padding_mask: Optional[jax.Array] = None,
    attn_mask: Optional[jax.Array] = None,
    dropout_rate: float = 0.0,
    dropout_key: Optional[jax.Array] = None,
    need_weights: bool = True,
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """Multi-head cross-attention with packed projections, batch-first.

    Computes ``softmax(QKᵀ/√d)V`` through the in/out projection GEMMs and
    returns ``(output (B,T,E), head-averaged weights (B,T,S) | None)``.

    All heavy math is three GEMM groups (in-proj, score/context contractions,
    out-proj) that XLA maps onto the MXU; the fused single-kernel Pallas
    version lives in ``aecf_tpu.kernels``.
    """
    B, T, E = query.shape
    S = key.shape[1]
    H = num_heads
    Dh = E // H

    w_q, w_k, w_v = jnp.split(params.in_proj_weight, 3, axis=0)
    if params.in_proj_bias is not None:
        b_q, b_k, b_v = jnp.split(params.in_proj_bias, 3, axis=0)
    else:
        b_q = b_k = b_v = None

    def proj(x, w, b):
        y = jnp.einsum("bse,fe->bsf", x, w)
        return y if b is None else y + b

    q = proj(query, w_q, b_q).reshape(B, T, H, Dh)
    k = proj(key, w_k, b_k).reshape(B, S, H, Dh)
    v = proj(value, w_v, b_v).reshape(B, S, H, Dh)

    scale = jnp.asarray(Dh, q.dtype) ** -0.5
    scores = jnp.einsum("bthd,bshd->bhts", q * scale, k)
    scores = _merge_masks(scores, key_padding_mask, attn_mask)
    attn = jax.nn.softmax(scores, axis=-1)

    if dropout_rate > 0.0 and dropout_key is not None:
        keep = jax.random.bernoulli(dropout_key, 1.0 - dropout_rate, attn.shape)
        attn = jnp.where(keep, attn / (1.0 - dropout_rate), 0.0)

    context = jnp.einsum("bhts,bshd->bthd", attn, v).reshape(B, T, E)
    out = jnp.einsum("bte,fe->btf", context, params.out_proj_weight)
    if params.out_proj_bias is not None:
        out = out + params.out_proj_bias

    if need_weights:
        # average_attn_weights=True always (reference AECFLayer.py:521).
        avg_weights = jnp.mean(attn, axis=1)  # (B, T, S)
        return out, avg_weights
    return out, None


def apply_pooled_weights(
    params: AttentionPoolParams,
    weights: jax.Array,  # (B, T, S) — e.g. masked head-averaged weights
    value: jax.Array,  # (B, S, E)
    *,
    num_heads: int,
) -> jax.Array:
    """Compute the pool output from externally supplied attention weights.

    Used by the opt-in ``apply_masking_to_output`` extension (SURVEY.md §2.5
    build decision): the reference never applies masked weights to its
    output (quirk Q1); this helper computes
    ``(weights · V_proj) @ out_proj`` with the given head-shared weights —
    exact for single-head pools, and for multi-head pools applies the
    head-averaged weights uniformly across heads (documented semantic).
    """
    B, T, E = weights.shape[0], weights.shape[1], value.shape[2]
    H = num_heads
    Dh = E // H
    _, _, w_v = jnp.split(params.in_proj_weight, 3, axis=0)
    v = jnp.einsum("bse,fe->bsf", value, w_v)
    if params.in_proj_bias is not None:
        v = v + params.in_proj_bias[2 * E :]
    v = v.reshape(B, -1, H, Dh)
    context = jnp.einsum("bts,bshd->bthd", weights, v).reshape(B, T, E)
    out = jnp.einsum("bte,fe->btf", context, params.out_proj_weight)
    if params.out_proj_bias is not None:
        out = out + params.out_proj_bias
    return out


def scaled_dot_product_attention(
    query: jax.Array,
    key: jax.Array,
    value: jax.Array,
    scale: Optional[float] = None,
) -> jax.Array:
    """Projection-free single-head SDPA fast path.

    Mirrors the reference's ``_scaled_dot_product_attention``
    (AECFLayer.py:556-581): ``softmax(q kᵀ · scale) v`` with
    ``scale = E^-1/2`` by default.  Note this path has *no* projections, so it
    is intentionally not numerically equivalent to the module path (reference
    quirk Q3, SURVEY.md §2.5).
    """
    if scale is None:
        scale = query.shape[-1] ** -0.5
    scores = jnp.einsum("bte,bse->bts", query, key) * scale
    attn = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bts,bse->bte", attn, value)
