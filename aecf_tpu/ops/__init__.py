"""Op-level API: backend-dispatched building blocks.

``fusion_pool`` is the one-call fusion op used by the model families — it
picks the fused Pallas kernel on TPU when the config qualifies and falls
back to the XLA oracle path otherwise, so model code stays
backend-agnostic.  The lower layers remain directly importable:
:mod:`aecf_tpu.core` (pure math) and :mod:`aecf_tpu.kernels` (Pallas).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.attention import (
    AttentionPoolParams,
    attention_pool_core,
    scaled_dot_product_attention,
)
from ..core.masking import compute_entropy, curriculum_mask, entropy_loss
from ..kernels import (
    fused_fusion_pool,
    fused_fusion_pool_shared,
    prefers_fused,
    supports_fused,
)

__all__ = [
    "fusion_pool",
    "attention_pool_core",
    "scaled_dot_product_attention",
    "curriculum_mask",
    "compute_entropy",
    "entropy_loss",
    "fused_fusion_pool",
    "fused_fusion_pool_shared",
    "supports_fused",
]


def fusion_pool(
    params: AttentionPoolParams,
    query: jax.Array,  # (1, 1, E) shared or (B, 1, E) per-row
    kv: jax.Array,  # (B, M, E)
    *,
    num_heads: int = 1,
    rng: Optional[jax.Array] = None,
    training: bool = False,
    base_mask_prob: jax.typing.ArrayLike = 0.15,
    entropy_target: jax.typing.ArrayLike = 0.7,
    min_active: int = 1,
    key_padding_mask: Optional[jax.Array] = None,
    implementation: str = "auto",
    precision: str = "highest",
    kv_grad: bool = True,
    kv_scales: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array, jax.Array, Dict[str, jax.Array]]:
    """Fused attention-pool + curriculum masking with backend dispatch.

    Returns ``(out (B,1,E), weights (B,1,M), masked (B,1,M), info)``.
    ``implementation='auto'`` uses the Pallas kernels on TPU (shared-query
    variant when ``query`` is the unexpanded ``(1,1,E)`` parameter);
    ``'xla'`` forces the oracle path.  ``key_padding_mask (B, M)`` (True =
    padded slot) is supported on every path.

    ``kv_grad=False`` declares the features non-differentiable (frozen
    CLIP-style inputs): the fused backward skips the ``(B, M, E)`` d_kv
    write — a third of its HBM traffic — and ``kv`` is stop-gradiented.

    int8 features: pass ``kv`` as int8 with ``kv_scales (B, M)`` (see
    :func:`aecf_tpu.kernels.quantize_features`) — quarters the kv HBM
    stream, serving and training (gradients flow to params/query only;
    int8 features are frozen by construction).  The shared-query kernel
    dequantizes per tile in VMEM; non-kernel paths dequantize in XLA,
    which fuses the multiply into consumers so HBM still sees int8 reads.
    """
    if implementation not in ("auto", "xla", "pallas"):
        raise ValueError(
            f"unknown implementation {implementation!r} "
            "(expected 'auto', 'xla', or 'pallas')"
        )
    q8 = kv.dtype == jnp.int8
    if q8 and kv_scales is None:
        raise ValueError(
            "int8 kv requires kv_scales (see quantize_features)"
        )
    if kv_scales is not None and not q8:
        raise ValueError(
            f"kv_scales passed with {kv.dtype} kv — quantized dispatch "
            "needs int8 features (see quantize_features)"
        )
    B = kv.shape[0]
    E = query.shape[-1]
    if not kv_grad and not q8:
        # Before dispatch so every backend honors it (the generic per-row
        # kernel has no kv_grad fast path; its d_kv is computed then
        # dropped here, still correct).
        kv = jax.lax.stop_gradient(kv)
    impl = implementation
    if impl == "auto":
        impl = (
            "pallas"
            if (
                jax.default_backend() == "tpu"
                and supports_fused(
                    tgt_len=query.shape[1], num_heads=num_heads, embed_dim=E,
                    shared_query=query.shape[0] == 1,
                )
                # Measured perf boundary: XLA batches H>2 heads better
                # than the per-head kernel GEMMs (see prefers_fused).
                and prefers_fused(num_heads=num_heads)
                and query.dtype == jnp.float32
                # The fused kernels implement exactly "highest"/"default";
                # "high" would silently degrade to 1-pass bf16 there while
                # the XLA branch honors it — keep "high" on XLA.
                and precision != "high"
                # M<=1 masking is an early-return no-op that needs no rng;
                # route it to XLA so training an M=1 stack without a
                # curriculum key works identically on all backends.
                and kv.shape[1] > 1
            )
            else "xla"
        )

    if impl == "pallas" and q8 and query.shape[0] != 1:
        # The generic per-row kernel has no quantized variant: dequantize
        # up front (correct, just without the int8-bandwidth win).
        kv = kv.astype(jnp.float32) * kv_scales[..., None]
        q8 = False
        kv = jax.lax.stop_gradient(kv)  # int8 features are frozen

    if impl == "pallas":
        if query.shape[0] == 1:
            return fused_fusion_pool_shared(
                params,
                query,
                kv,
                num_heads=num_heads,
                rng=rng,
                training=training,
                base_mask_prob=base_mask_prob,
                entropy_target=entropy_target,
                min_active=min_active,
                key_padding_mask=key_padding_mask,
                precision=precision,
                kv_grad=kv_grad and not q8,
                kv_scales=kv_scales if q8 else None,
            )
        return fused_fusion_pool(
            params,
            query,
            kv,
            num_heads=num_heads,
            rng=rng,
            training=training,
            base_mask_prob=base_mask_prob,
            entropy_target=entropy_target,
            min_active=min_active,
            key_padding_mask=key_padding_mask,
        )

    if q8:
        # XLA oracle path: dequantize explicitly; XLA fuses the multiply
        # into the projection GEMMs, so HBM reads stay int8.
        kv = jax.lax.stop_gradient(
            kv.astype(jnp.float32) * kv_scales[..., None]
        )

    q_full = (
        jnp.broadcast_to(query, (B, query.shape[1], E))
        if query.shape[0] == 1
        else query
    )
    # Honor the requested matmul precision on the fallback too: on TPU, f32
    # dots otherwise default to bf16 MXU passes, which would make
    # implementation='xla' silently less precise than the pallas path.
    # NOTE (round 3): an algebraically-restructured shared-query XLA path
    # (u-vector scores ± mix-before-V-projection — the Pallas kernel's
    # rewrites as einsums, halving GEMM FLOPs at H=8) was built, verified,
    # measured 0.74-0.78x the naive path at H=8 within-run, and deleted:
    # the rewrite's skinny (N=H·M / N=Dh) contractions underfill the MXU
    # worse than the naive path's fat E×E projections, and fewer FLOPs
    # lose to lower utilization.  H > 2 stays on attention_pool_core.
    with jax.default_matmul_precision(precision):
        out, weights = attention_pool_core(
            params,
            q_full,
            kv,
            kv,
            num_heads=num_heads,
            key_padding_mask=key_padding_mask,
            need_weights=True,
        )
    masked, info = curriculum_mask(
        weights,
        key=rng,
        training=training,
        base_mask_prob=base_mask_prob,
        entropy_target=entropy_target,
        min_active=min_active,
    )
    return out, weights, jax.lax.stop_gradient(masked), info
