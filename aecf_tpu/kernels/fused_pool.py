"""Fused Pallas TPU kernel for the whole AECF fusion path.

One kernel pass per batch tile computes what the reference spreads over
~10 chained torch ops + an ATen attention call (aecf/AECFLayer.py:515-521
followed by :158-283):

    Q/K/V projections → scores → softmax → head-average →
    entropy → adaptive keep-prob → in-kernel Bernoulli draw (TPU PRNG) →
    min_active top-k replacement → renormalize → weighted sum (unmasked
    attention, quirk Q1) → output projection

emitting ``(output, attention_weights, masked_weights, entropy, mask_rate)``
in a single HBM round-trip.  The GEMMs ride the MXU; everything between them
stays in VMEM registers instead of bouncing through HBM.

Scope:
  * query length T == 1 (the pooling use case — query is the fusion token);
  * ``key_padding_mask`` supported (additive score bias, like the shared
    kernel); no dropout, no ``attn_mask`` (those configs dispatch to the
    XLA path, which is the numerics oracle);
  * bf16 feature storage supported (halves HBM traffic); all in-kernel math
    is f32 (weights/entropy bit-compatible with the oracle to ~1e-6).

Backward: custom_vjp with an XLA einsum backward (matmuls are already
speed-of-light under XLA; the win of the fused kernel is the forward's
elementwise/RNG chain and HBM traffic).  Per the reference's gradient
structure (SURVEY.md §3.2), the masking outputs carry no gradients —
cotangents flow only through ``output`` and ``attention_weights``.
"""

from __future__ import annotations

import functools
import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.attention import AttentionPoolParams

from . import tiles
from .shared_query import (
    _draw_seed_words,
    _mask_and_renorm,
    _pad_bias_rows,
    _pick_tile,
)

__all__ = ["fused_fusion_pool", "supports_fused"]


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def supports_fused(
    *,
    tgt_len: int,
    num_heads: int,
    embed_dim: int,
    dropout: float = 0.0,
    has_masks: bool = False,
    shared_query: bool = False,
) -> bool:
    """Config gate for the fused kernels; unsupported shapes use the XLA
    path.

    The resident-weight kernels keep (E, E) context weights in VMEM and
    cap at E=1024.  The shared-query H≤2 path additionally has a
    streamed split (Pallas one-pass-over-kv + XLA E×E GEMMs, no (E, E)
    matrix in VMEM) lifting the cap to E=8192 — pass ``shared_query=True``
    when the query is the unexpanded ``(1, 1, E)`` fusion parameter.
    """
    from .shared_query import _RESIDENT_E_CAP, _STREAMED_E_CAP

    e_cap = (
        _STREAMED_E_CAP
        if shared_query and num_heads <= 2
        else _RESIDENT_E_CAP
    )
    return (
        tgt_len == 1
        and dropout == 0.0
        and not has_masks
        and embed_dim % num_heads == 0
        and embed_dim <= e_cap
    )


def prefers_fused(*, num_heads: int) -> bool:
    """Performance preference (vs capability — :func:`supports_fused`).

    Measured within-run on v5e (full train step, B=4096/M=3/E=512):
    the fused kernel wins 2.0x at H=1 and 1.2x at H=2, ties at H=4, and
    LOSES 2x at H=8 — per-head Dh=E/H GEMMs underfill the 128x128 MXU
    while XLA batches heads into efficient einsums.  The same H<=2
    boundary holds beyond the resident cap: the streamed split wins
    3.91x (H=1) and 2.59x (H=2 with its one-pass multi-head backward,
    round 4; docs/artifacts/bench_suite.json streamed_*_ab) at E=2048
    vs the XLA fallback.  Auto dispatch routes H>2 to
    the XLA path; ``implementation='pallas'`` still forces the kernel.
    """
    return num_heads <= 2


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------


def _fusion_kernel(
    # scalar-prefetch operands (SMEM)
    seed_ref,  # (2,) int32 seed words
    mask_prob_ref,  # (1,) float32
    # tensor operands (VMEM)
    q_ref,  # (TB, E)
    kv_ref,  # (TB, M, E)
    pad_ref,  # (TB, M)  additive score bias (0 or -1e30 for padded slots)
    wq_ref,  # (E, E)
    wk_ref,  # (E, E)
    wv_ref,  # (E, E)
    wo_ref,  # (E, E)
    bqkv_ref,  # (3, E)   q/k/v biases (zeros when bias=False)
    bo_ref,  # (1, E)
    # outputs (VMEM)
    out_ref,  # (TB, E)
    w_ref,  # (TB, M)   head-averaged attention weights
    mw_ref,  # (TB, M)   masked+renormalized weights
    ent_ref,  # (TB, 1)
    rate_ref,  # (TB, 1)
    *,
    num_heads: int,
    min_active: int,
    training: bool,
    seq_len: int,
):
    TB, E = q_ref.shape
    M = kv_ref.shape[1]
    H = num_heads
    Dh = E // H
    f32 = jnp.float32

    # ---- projections (MXU) --------------------------------------------------
    # bf16 feature storage supported; all math runs f32 in VMEM.
    q = q_ref[:].astype(f32)
    kv = kv_ref[:].astype(f32).reshape(TB * M, E)
    qp = (
        jnp.dot(q, wq_ref[:].T, preferred_element_type=f32,
                 precision=lax.Precision.HIGHEST)
        + bqkv_ref[0, :]
    )
    kp = (
        jnp.dot(kv, wk_ref[:].T, preferred_element_type=f32,
                 precision=lax.Precision.HIGHEST)
        + bqkv_ref[1, :]
    ).reshape(TB, M, E)
    vp = (
        jnp.dot(kv, wv_ref[:].T, preferred_element_type=f32,
                 precision=lax.Precision.HIGHEST)
        + bqkv_ref[2, :]
    ).reshape(TB, M, E)

    # ---- per-head scores + softmax + context (VPU; M tiny, H static) -------
    # Head loop is unrolled at trace time; lane-slicing per head avoids
    # lane-dim reshapes that Mosaic relayouts poorly.
    scale = Dh ** -0.5
    w_acc = jnp.zeros((TB, M), f32)
    ctx_parts = []
    for h in range(H):
        qh = qp[:, h * Dh : (h + 1) * Dh]  # (TB, Dh)
        kh = kp[:, :, h * Dh : (h + 1) * Dh]  # (TB, M, Dh)
        vh = vp[:, :, h * Dh : (h + 1) * Dh]  # (TB, M, Dh)
        s = (qh[:, None, :] * kh).sum(axis=-1) * scale + pad_ref[:]  # (TB, M)
        smax = s.max(axis=-1, keepdims=True)
        e = jnp.exp(s - smax)
        a = e / e.sum(axis=-1, keepdims=True)  # softmax over M
        w_acc = w_acc + a
        ctx_parts.append((a[:, :, None] * vh).sum(axis=1))  # (TB, Dh)

    # head-averaged weights — what curriculum masking sees (AECFLayer.py:521)
    w = w_acc * (1.0 / H)
    w_ref[:] = w

    # ---- entropy (xlogy semantics, clamped to [0, log M]) -------------------
    max_entropy = math.log(seq_len)
    plogp = jnp.where(w > 0, w * jnp.log(jnp.maximum(w, 1e-38)), 0.0)
    entropy = jnp.clip(-plogp.sum(axis=-1, keepdims=True), 0.0, max_entropy)
    ent_ref[:] = entropy

    if not training or seq_len <= 1:
        # Eval path: weights pass through, no masking.
        mw_ref[:] = w
        rate_ref[:] = jnp.zeros((TB, 1), f32)
    else:
        # Bernoulli → min_active top-k → renormalize: the ONE shared
        # in-kernel masking chain (shared_query._mask_and_renorm, also
        # used by the streamed mix kernel) — a numerics/PRNG fix there
        # must not leave this kernel silently divergent.
        mw, rate = _mask_and_renorm(
            w, entropy, max_entropy, mask_prob_ref[0], seed_ref,
            min_active=min_active, seq_len=seq_len,
        )
        mw_ref[:] = mw
        rate_ref[:] = rate

    # ---- context with UNMASKED per-head attention (quirk Q1) + out-proj ----
    ctx = (
        ctx_parts[0]
        if H == 1
        else jnp.concatenate(ctx_parts, axis=-1)
    )  # (TB, E)
    out_ref[:] = (
        jnp.dot(ctx, wo_ref[:].T, preferred_element_type=f32,
                 precision=lax.Precision.HIGHEST) + bo_ref[0, :]
    )


def _forward_pallas(
    params: AttentionPoolParams,
    query2d: jax.Array,  # (B, E)
    kv: jax.Array,  # (B, M, E)
    seed: jax.Array,  # () int32
    mask_prob: jax.Array,  # () float32
    key_padding_mask: Optional[jax.Array],  # (B, M) bool, True = padded
    *,
    num_heads: int,
    min_active: int,
    training: bool,
    interpret: bool = False,
):
    B, E = query2d.shape
    M = kv.shape[1]
    pad_bias = _pad_bias_rows(key_padding_mask, B, M)

    # Batch tiling: weights stay resident (constant index maps); activations
    # stream.  TB sized to keep the tile working set within VMEM; the
    # unrolled head loop adds ~H/2 extra (TB, E) temporaries.  Same
    # env-override > tile-table > default resolution as every other launch
    # site (the generic kernel carries a per-row query, so its working set
    # — and its table key — differ from the shared-query forward's).
    TB = _pick_tile(
        256 if E <= 512 else 128, "AECF_FWD_TB", B, num_heads=num_heads,
        site=tiles.site_key(
            "fwd_generic", M=M, E=E, H=num_heads, kv_dtype=kv.dtype.name
        ),
    )
    B_pad = _round_up(B, TB)
    if B_pad != B:
        pad = B_pad - B
        query2d = jnp.pad(query2d, ((0, pad), (0, 0)))
        kv = jnp.pad(kv, ((0, pad), (0, 0), (0, 0)))
        pad_bias = jnp.pad(pad_bias, ((0, pad), (0, 0)))

    wq, wk, wv = jnp.split(params.in_proj_weight, 3, axis=0)
    if params.in_proj_bias is not None:
        bqkv = params.in_proj_bias.reshape(3, E)
    else:
        bqkv = jnp.zeros((3, E), jnp.float32)
    bo = (
        params.out_proj_bias.reshape(1, E)
        if params.out_proj_bias is not None
        else jnp.zeros((1, E), jnp.float32)
    )

    grid = (B_pad // TB,)
    kernel = functools.partial(
        _fusion_kernel,
        num_heads=num_heads,
        min_active=min_active,
        training=training,
        seq_len=M,
    )

    flops = 2 * B_pad * E * E * (2 * M + 2) + 3 * B_pad * M * E
    out_shapes = (
        jax.ShapeDtypeStruct((B_pad, E), jnp.float32),  # out
        jax.ShapeDtypeStruct((B_pad, M), jnp.float32),  # weights
        jax.ShapeDtypeStruct((B_pad, M), jnp.float32),  # masked
        jax.ShapeDtypeStruct((B_pad, 1), jnp.float32),  # entropy
        jax.ShapeDtypeStruct((B_pad, 1), jnp.float32),  # mask_rate
    )

    # Index maps receive (grid_idx, *scalar_prefetch_refs).
    tile = lambda i, *_: (i, 0)  # noqa: E731
    whole = lambda i, *_: (0, 0)  # noqa: E731
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TB, E), tile, memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (TB, M, E), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((TB, M), tile, memory_space=pltpu.VMEM),
            pl.BlockSpec((E, E), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec((E, E), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec((E, E), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec((E, E), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec((3, E), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, E), whole, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TB, E), tile, memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, M), tile, memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, M), tile, memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, 1), tile, memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, 1), tile, memory_space=pltpu.VMEM),
        ],
    )

    out, w, mw, ent, rate = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=4 * (B_pad * E * (M + 2) + 4 * E * E),
            transcendentals=B_pad * M * 2,
        ),
        interpret=interpret,
    )(
        seed.reshape(2).astype(jnp.int32),
        mask_prob.reshape(1).astype(jnp.float32),
        query2d,
        kv,
        pad_bias,
        wq,
        wk,
        wv,
        params.out_proj_weight,
        bqkv,
        bo,
    )
    return (
        out[:B],
        w[:B],
        mw[:B],
        ent[:B, 0],
        rate[:B, 0],
    )


# ---------------------------------------------------------------------------
# custom_vjp wrapper: forward = Pallas kernel, backward = XLA einsums
# ---------------------------------------------------------------------------


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9)
)
def _fused_core(
    params, query2d, kv, seed, mask_prob, key_padding_mask,
    num_heads, min_active, training, interpret,
):
    return _forward_pallas(
        params,
        query2d,
        kv,
        seed,
        mask_prob,
        key_padding_mask,
        num_heads=num_heads,
        min_active=min_active,
        training=training,
        interpret=interpret,
    )


def _fused_fwd(
    params, query2d, kv, seed, mask_prob, key_padding_mask,
    num_heads, min_active, training, interpret,
):
    outs = _forward_pallas(
        params,
        query2d,
        kv,
        seed,
        mask_prob,
        key_padding_mask,
        num_heads=num_heads,
        min_active=min_active,
        training=training,
        interpret=interpret,
    )
    # outs[1] (head-averaged weights) rides along so the backward can fold
    # an entropy cotangent into d_w — eval entropy is not detached in the
    # reference (AECFLayer.py:150-156).
    return outs, (params, query2d, kv, key_padding_mask, outs[1])


def _fused_bwd(num_heads, min_active, training, interpret, residuals, cots):
    from .shared_query import _fold_entropy_cotangent

    params, q, kv, key_padding_mask, w_res = residuals
    residuals = (params, q, kv, key_padding_mask)
    d_out, d_w, _d_mw, _d_ent, _d_rate = cots
    d_w = _fold_entropy_cotangent(d_w, _d_ent, w_res, kv.shape[1])
    cots = (d_out, d_w, _d_mw, None, _d_rate)
    # f32 MXU passes throughout: the fused forward runs at HIGHEST precision,
    # and mixed-precision fwd/bwd would silently degrade gradient parity
    # with the fp32 oracle to ~1e-3.
    with jax.default_matmul_precision("highest"):
        return _fused_bwd_impl(num_heads, residuals, cots)


def _fused_bwd_impl(num_heads, residuals, cots):
    params, q, kv, key_padding_mask = residuals
    d_out, d_w, _d_mw, _d_ent, _d_rate = cots
    B, E = q.shape
    M = kv.shape[1]
    H = num_heads
    Dh = E // H

    q_dtype, kv_dtype = q.dtype, kv.dtype
    q = q.astype(jnp.float32)
    kv = kv.astype(jnp.float32)

    wq, wk, wv = jnp.split(params.in_proj_weight, 3, axis=0)
    if params.in_proj_bias is not None:
        bq, bk, bv = jnp.split(params.in_proj_bias, 3)
    else:
        bq = bk = bv = 0.0

    # Recompute the forward attention (rematerialization — cheaper than
    # saving the big projected tensors).
    qp = q @ wq.T + bq  # (B, E)
    kp = (kv.reshape(B * M, E) @ wk.T + bk).reshape(B, M, E)
    vp = (kv.reshape(B * M, E) @ wv.T + bv).reshape(B, M, E)
    scale = Dh ** -0.5
    qh = qp.reshape(B, H, Dh)
    kh = kp.reshape(B, M, H, Dh)
    vh = vp.reshape(B, M, H, Dh)
    scores = jnp.einsum("bhd,bmhd->bhm", qh, kh) * scale
    if key_padding_mask is not None:
        scores = jnp.where(key_padding_mask[:, None, :], -1e30, scores)
    attn = jax.nn.softmax(scores, axis=-1)  # (B, H, M)

    ctx = jnp.einsum("bhm,bmhd->bhd", attn, vh).reshape(B, E)

    # out = ctx @ Wo.T + bo
    d_ctx = d_out @ params.out_proj_weight  # (B, E)
    dWo = d_out.T @ ctx
    dbo = d_out.sum(0) if params.out_proj_bias is not None else None

    d_ctx_h = d_ctx.reshape(B, H, Dh)
    d_attn = jnp.einsum("bhd,bmhd->bhm", d_ctx_h, vh)
    d_vh = jnp.einsum("bhm,bhd->bmhd", attn, d_ctx_h)

    # cotangent into the head-averaged weights output
    if d_w is not None:
        d_attn = d_attn + d_w[:, None, :] / H

    # softmax backward
    d_scores = attn * (
        d_attn - (attn * d_attn).sum(axis=-1, keepdims=True)
    )
    d_qh = jnp.einsum("bhm,bmhd->bhd", d_scores, kh) * scale
    d_kh = jnp.einsum("bhm,bhd->bmhd", d_scores, qh) * scale

    d_qp = d_qh.reshape(B, E)
    d_kp = d_kh.reshape(B, M, E)
    d_vp = d_vh.reshape(B, M, E)

    kv2 = kv.reshape(B * M, E)
    d_q = d_qp @ wq
    dWq = d_qp.T @ q
    d_kv = (d_kp.reshape(B * M, E) @ wk + d_vp.reshape(B * M, E) @ wv).reshape(
        B, M, E
    )
    dWk = d_kp.reshape(B * M, E).T @ kv2
    dWv = d_vp.reshape(B * M, E).T @ kv2

    d_in_proj_weight = jnp.concatenate([dWq, dWk, dWv], axis=0)
    if params.in_proj_bias is not None:
        d_in_proj_bias = jnp.concatenate(
            [d_qp.sum(0), d_kp.sum((0, 1)), d_vp.sum((0, 1))]
        )
    else:
        d_in_proj_bias = None

    d_params = AttentionPoolParams(
        in_proj_weight=d_in_proj_weight,
        out_proj_weight=dWo,
        in_proj_bias=d_in_proj_bias,
        out_proj_bias=dbo,
    )
    return (
        d_params,
        d_q.astype(q_dtype),
        d_kv.astype(kv_dtype),
        None,
        None,
        None,
    )


_fused_core.defvjp(_fused_fwd, _fused_bwd)


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------


def fused_fusion_pool(
    params: AttentionPoolParams,
    query: jax.Array,  # (B, 1, E)
    kv: jax.Array,  # (B, M, E)
    *,
    num_heads: int = 1,
    rng: Optional[jax.Array] = None,
    training: bool = False,
    base_mask_prob: jax.typing.ArrayLike = 0.15,
    entropy_target: jax.typing.ArrayLike = 0.7,
    min_active: int = 1,
    key_padding_mask: Optional[jax.Array] = None,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array, Dict[str, jax.Array]]:
    """Fused forward of the full fusion path.

    Returns ``(output (B,1,E), attention_weights (B,1,M),
    masked_weights (B,1,M), info)`` with the same info key-set contract as
    :func:`aecf_tpu.core.masking.curriculum_mask`.  ``output`` and
    ``attention_weights`` are differentiable; masking outputs are detached
    (the reference's gradient structure, SURVEY.md §3.2).
    """
    B, T, E = query.shape
    M = kv.shape[1]
    if T != 1:
        raise ValueError(f"fused kernel requires tgt_len == 1, got {T}")

    # M<=1 masking is an early-return no-op (reference AECFLayer.py:160-167),
    # so no randomness is consumed and no key is required.
    if training and rng is None and kv.shape[1] > 1:
        raise ValueError(
            "fused_fusion_pool(training=True) needs an `rng=` key"
        )
    seed = _draw_seed_words(rng)

    out, w, mw, ent, rate = _fused_core(
        params,
        query[:, 0, :],
        kv,
        seed,
        jnp.asarray(base_mask_prob, jnp.float32),
        key_padding_mask,
        num_heads,
        min_active,
        training,
        interpret,
    )

    weights = w[:, None, :]
    masked = lax.stop_gradient(mw[:, None, :])
    entropy = lax.stop_gradient(ent[:, None])
    mask_rate = lax.stop_gradient(rate[:, None])
    if training and M > 1:
        info = {
            "entropy": entropy,
            "mask_rate": mask_rate,
            "target_entropy": jnp.full_like(
                entropy,
                math.log(M) * jnp.asarray(entropy_target, jnp.float32),
            ),
        }
    elif training:
        zeros = jnp.zeros_like(entropy)
        info = {
            "entropy": zeros,
            "mask_rate": zeros,
            "target_entropy": zeros,
        }
    else:
        info = {"entropy": ent[:, None], "mask_rate": mask_rate}
    return out[:, None, :], weights, masked, info
