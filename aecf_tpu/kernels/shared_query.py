"""Shared-query fused fusion kernel — the speed-of-light path.

Every reference flow expands one learnable ``(1, 1, E)`` fusion query across
the batch (README.md:180-208, create_fusion_pool contract, AECFLayer.py
examples).  That structure lets the whole attention pool be algebraically
restructured — a rewrite XLA cannot do because it spans a softmax:

  *  scores:   s_h[b,m] = scale · (qp_h · (kv[b,m] Wk_hᵀ + bk_h))
                        = kv[b,m] · u_h + c_h
     with u_h = scale·(qp_h @ Wk_h) and c_h = scale·(qp_h · bk_h) computed
     ONCE per step — the per-sample K and Q projection GEMMs (the bulk of
     the FLOPs, 2·B·M·E² of the naive path) disappear entirely.
  *  value path: because softmax weights sum to 1,
         ctx_h = Σ_m a_h[b,m]·(kv[b,m] Wv_hᵀ + bv_h)
               = (Σ_m a_h[b,m]·kv[b,m]) Wv_hᵀ + bv_h = mix_h Wv_hᵀ + bv_h
     so the V projection runs on the M-times-smaller *mixed* tensor.
     For H == 1 the V and output projections additionally fuse into a
     single precomputed ``W_vo = Wo @ Wv`` GEMM.

Per-step GEMM cost drops from ``(2M+2)·B·E²`` to ``B·E²`` (H=1) or
``2·B·E²`` (H>1); the scores/softmax/entropy/Bernoulli chain is pure VPU
arithmetic on f32 — attention weights and entropy keep full fp32 parity
regardless of the MXU precision chosen for the context GEMM.

Numerical note: reassociating ``(kv·Wkᵀ)·qp → kv·(Wkᵀ·qp)`` changes the f32
summation order, so weights match the naive oracle to ~1e-6, not bitwise.
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
from ..core.masking import EPS
from . import tiles

__all__ = ["fused_fusion_pool_shared", "quantize_features"]


# Single-buffer budget for the TB-scaled blocks of a streamed launch.
# Calibrated to the measured E=2048/M=3 boundary: TB=128 (7.0MB of
# blocks, ~14MB double-buffered) exceeds the 16MB scoped-vmem budget on
# v5e; TB=64 (3.5MB) fits.  5MB leaves ~6MB of double-buffered headroom
# for the whole-block operands (u, accumulators) and Mosaic scratch.
_VMEM_ROW_BUDGET = 5 * (1 << 20)


def _pick_tile(
    default: int,
    env: str,
    B: int,
    *,
    num_heads: int = 1,
    row_bytes: Optional[int] = None,
    site: Optional[str] = None,
) -> int:
    """Batch-tile selection, shared by every launch site: env override
    (``AECF_FWD_TB``/``AECF_BWD_TB`` for A/B sweeps) > per-device tile
    table (:mod:`tiles` — winners measured by ``benchmarks/autotune.py``)
    > measured v5e default with per-head VMEM scaling (the unrolled head
    loop holds ~H/2 extra (TB, E) temporaries), clamped to the padded
    batch.

    ``row_bytes`` (streamed launch sites): bytes of TB-scaled block per
    batch row.  The default is clamped so the single-buffered blocks stay
    under :data:`_VMEM_ROW_BUDGET` — at the E=8192 cap the 1/E default
    formulas alone would floor at 32 rows and overflow scoped vmem when
    d_kv tiles are also resident.  Env overrides and table entries get
    NEITHER the VMEM clamp nor the per-head rescale (sweeps intentionally
    probe limits and must measure the exact tile they name; table entries
    compiled on this device kind when measured; Mosaic rejects over-budget
    tiles with an explicit error).

    ``site`` is the :func:`tiles.site_key` of the launch site — the table
    key, and the label under which the chosen tile is recorded when the
    autotuner is tracing."""
    import os

    raw = os.environ.get(env)
    if raw:
        try:
            tb = int(raw)
        except ValueError:
            raise ValueError(
                f"{env}={raw!r} is not an integer batch-tile size"
            ) from None
        if tb < 8:
            # TB=0 would divide by zero in the grid computation; tiles
            # below the (8, 128) f32 sublane tile are never valid.
            raise ValueError(f"{env}={raw!r}: batch tile must be >= 8")
        # Env overrides are honored VERBATIM (modulo the batch clamp):
        # rescaling them per head would make a sweep record "TB=256"
        # datapoints that actually measured TB=64.
        tb = min(tb, _round_up(B, 8))
        tiles.record(site, tb, "env")
        return tb
    if site is not None:
        measured = tiles.lookup(site)
        if measured is not None:
            tb = min(measured, _round_up(B, 8))
            tiles.record(site, tb, "table")
            return tb
    tb = default
    if row_bytes is not None:
        tb = min(tb, max(8, _VMEM_ROW_BUDGET // row_bytes // 8 * 8))
    if num_heads > 2:
        tb = max(64, tb // (num_heads // 2))
    tb = min(tb, _round_up(B, 8))
    tiles.record(site, tb, "default")
    return tb


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# ---------------------------------------------------------------------------
# Driver prologue helpers
#
# Every forward/backward driver used to repeat a ~20-line unpack/pad/
# precision prologue; the copies drifted (a backward once recomputed u
# under a HIGHEST context while the forward ran it at default precision,
# skewing gradients at ~bf16 error).  These helpers are the single copy.
# Pure code motion: each traces exactly the ops the inline copies traced,
# so compiled programs (and their persistent-cache keys) are unchanged.
# ---------------------------------------------------------------------------


def _ctx_prec(precision: str) -> str:
    """``jax.default_matmul_precision`` mode for the public precision
    string — the ONE translation point.  The forward and every backward
    remat must run qp/u/c under the same mode or recomputed softmax
    inputs (and every gradient behind them) drift from the returned
    primal at ~bf16 error."""
    return "highest" if precision == "highest" else "default"


def _dot_prec(precision: str):
    """Per-dot ``precision=`` override matching :func:`_ctx_prec`."""
    return lax.Precision.HIGHEST if precision == "highest" else None


def _split_params(params: AttentionPoolParams, E: int):
    """The parameter unpack every driver repeats: per-projection weight
    rows, the bias triple (zeros when ``bias=False`` — the kernels always
    add biases so the no-bias config costs nothing extra), ``W_o``, and
    whether a real input bias exists (grads for synthesized zeros are
    dropped by ``_assemble_d_params``)."""
    wq, wk, wv = jnp.split(params.in_proj_weight, 3, axis=0)
    has_bias = params.in_proj_bias is not None
    if has_bias:
        bq, bk, bv = jnp.split(params.in_proj_bias, 3)
    else:
        bq = bk = bv = jnp.zeros((E,), jnp.float32)
    return wq, wk, wv, bq, bk, bv, params.out_proj_weight, has_bias


def _score_uc_1d(qrow, wq, bq, wk, bk, E: int, precision: str):
    """H == 1 remat of :func:`_prep`'s score vector/offset: ``qp`` (E,),
    ``u = scale·(qp @ W_k)`` (E,), scalar ``c`` — under the SAME precision
    context as the forward (see :func:`_ctx_prec`)."""
    scale = E ** -0.5  # H == 1 ⇒ Dh == E
    with jax.default_matmul_precision(_ctx_prec(precision)):
        qp = qrow @ wq.T + bq  # (E,)
        # wk rows are output features f: u_e = scale · Σ_f qp_f · wk[f, e]
        u = scale * (qp @ wk)  # (E,)
        c = scale * (qp * bk).sum()
    return qp, u, c, scale


def _pad_bias_rows(key_padding_mask, B: int, M: int, base=None):
    """(B, M) additive score bias: 0 for live slots, -1e30 for padded
    ones.  ``base`` (H == 1 backwards) folds the scalar score offset c in
    instead of zeros — padded slots overwrite it with -1e30 either way."""
    if base is None:
        if key_padding_mask is None:
            return jnp.zeros((B, M), jnp.float32)
        return jnp.where(
            key_padding_mask, jnp.float32(-1e30), jnp.float32(0.0)
        )
    if key_padding_mask is None:
        return base
    return jnp.where(key_padding_mask, jnp.float32(-1e30), base)


def _pad_rows(B: int, TB: int, *arrays):
    """Tile-align the batch: zero-pad each ``(B, cols)`` operand to
    ``B_pad = round_up(B, TB)`` rows.  Returns ``(B_pad, *padded)``.
    Zero rows are inert in every kernel (they contribute zero to each
    whole-block accumulator output, and tile outputs are sliced back to
    ``[:B]``)."""
    B_pad = _round_up(B, TB)
    if B_pad == B:
        return (B_pad, *arrays)
    return (
        B_pad,
        *(jnp.pad(a, ((0, B_pad - B), (0, 0))) for a in arrays),
    )


def _kv_tile_slices(kv_ref, scales_ref, M: int, E: int):
    """Length-M list of f32 ``(TB, E)`` feature slices from a flattened
    ``(TB, M*E)`` tile — shared by every forward AND backward kernel so
    the dequant semantics cannot diverge.  ``scales_ref`` (``(TB, M)``
    per-(row, modality) scales) dequantizes int8 tiles in VMEM; ``None``
    (f32/bf16 storage) just upcasts.  M is tiny (2-4 modalities): callers
    unroll it so every op is a clean 2-D array with native (8, 128)
    tiling — 3-D broadcast-reduce chains cost Mosaic relayouts."""
    if scales_ref is None:
        return [
            kv_ref[:, m * E : (m + 1) * E].astype(jnp.float32)
            for m in range(M)
        ]
    return [
        kv_ref[:, m * E : (m + 1) * E].astype(jnp.float32)
        * scales_ref[:, m : m + 1]
        for m in range(M)
    ]


# E cap of the resident-weight kernels: they keep the full (E, E) context
# weights in VMEM.  Above this, H == 1 switches to the streamed split
# (_forward_streamed / _bwd_streamed: Pallas one-pass-over-kv + XLA E×E
# GEMMs), which holds no (E, E) matrix in VMEM at all.
_RESIDENT_E_CAP = 1024
# Streamed-path cap: the kv tile (TB·M·E·itemsize, double-buffered) is
# the only E-scaling VMEM term; TB floors at the (8, 128) sublane tile.
_STREAMED_E_CAP = 8192
# Below the resident cap, H == 2 TRAINING also prefers the streamed
# split from this E up (see _vjp_wants_streamed); eval keeps resident.
_STREAMED_H2_MIN_E = 512


def _vjp_wants_streamed(num_heads: int, E: int) -> bool:
    """Dispatch of the DIFFERENTIABLE forward (the custom_vjp fwd rules).

    Above the resident cap the streamed split is the only fused option
    (H ≤ 2).  Below it, H == 2 with E ≥ 512 ALSO routes to the streamed
    split when gradients are being taken: its one-pass multi-head Pallas
    backward reads kv once where the resident path's XLA einsum backward
    reads it 4×.  Measured within-run (round 4, full train step):
    streamed 1.16×/1.37× resident at E=512/1024 with kv_grad=False and
    1.03×/1.18× with kv_grad=True (2.2–2.5× at E=2048 where both heads
    stream).  The EVAL primal dispatch is unchanged — the resident
    kernel wins the gradient-free forward decisively (streamed measured
    0.62–0.64× resident at the same shapes), and eval consumes no RNG so
    resident-vs-streamed is a pure numerical-tolerance asymmetry (the
    remat kind custom_vjp allows).  The TRAINING primal follows THIS
    function too (`_shared_core` streams when it returns True): the two
    kernels fold different tile grids into the in-kernel PRNG, so a
    resident primal would draw a different Bernoulli mask than the
    streamed vjp forward for the same rng — f(x) and value_and_grad(f)(x)
    must see identical draws.  ``AECF_H2_STREAM=0`` restores the
    resident dispatch everywhere for within-run A/Bs (read at trace
    time, like ``AECF_SHARED_BWD``).
    """
    import os

    if num_heads > 2:
        return False
    if E > _RESIDENT_E_CAP:
        return True
    if num_heads != 2 or E < _STREAMED_H2_MIN_E:
        return False
    return os.environ.get("AECF_H2_STREAM", "auto") != "0"


def _stream_mix_dtype(precision: str):
    """Storage dtype of the streamed split's ``mix``/``d_mix`` HBM
    round-trips (kernel -> XLA GEMM -> kernel).  bf16 halves those bytes
    (~4·B·H·E·4/step, the largest non-kv term of the streamed step) at
    bf16 cost on the softmax-backward inputs — and is the DEFAULT at
    ``precision='default'``, where the MXU truncates GEMM inputs to bf16
    anyway (measured within-run: full step 1.22x at the H=2 E=1024
    stream, 1.08x at H=1 E=2048 — suite streamed_mix_ab sections).
    'highest' keeps f32 round-trips for torch-f32 parity.
    ``AECF_STREAM_MIX=bf16|f32`` overrides either way, read at trace
    time like AECF_H2_STREAM."""
    import os

    env = os.environ.get("AECF_STREAM_MIX")
    if env == "bf16":
        return jnp.bfloat16
    if env in ("f32", "0"):
        return jnp.float32
    return jnp.bfloat16 if precision == "default" else jnp.float32


def _draw_seed_words(rng: Optional[jax.Array]) -> jax.Array:
    """(2,) int32 seed material for the in-kernel TPU PRNG.

    Two independent 32-bit words give ~2^64 distinct step streams; the
    kernels fold ``pl.program_id`` into both words with distinct odd
    multipliers before ``pltpu.prng_seed`` (Mosaic accepts at most two
    seed words) — so neither nearby step seeds (s vs s+1) nor nearby
    tiles share a Bernoulli stream.  The previous single-word
    ``seed + program_id`` scheme let two steps whose seeds differed by
    k < grid-size share all but k tile streams (~150 expected collided
    step pairs per 100k-step run); hashing removes the adjacency overlap
    and the 64-bit width pushes full-stream collisions past birthday range.
    """
    if rng is None:
        return jnp.zeros((2,), jnp.int32)
    return lax.bitcast_convert_type(
        jax.random.bits(rng, (2,), dtype=jnp.uint32), jnp.int32
    )


def _mask_and_renorm(
    w, entropy, max_entropy, mask_prob, seed_ref, *, min_active, seq_len
):
    """Shared in-kernel masking chain: Bernoulli → min_active → renorm.

    Returns (masked_weights, mask_rate).  ``w`` is (TB, M) f32.
    ``seed_ref`` holds two int32 seed words; the tile id is folded into
    BOTH words with distinct odd multipliers (Mosaic caps ``prng_seed``
    at two words, so the fold happens here).  Two (step, tile) pairs then
    share a stream only if both 32-bit words collide simultaneously —
    nearby step seeds or nearby tiles share nothing (see
    ``_draw_seed_words``).
    """
    TB, M = w.shape
    f32 = jnp.float32
    norm_entropy = jnp.clip(entropy / max_entropy, 0.0, 1.0)
    keep_prob = jnp.clip(1.0 - mask_prob * norm_entropy, 0.0, 1.0)
    pid = pl.program_id(0)
    # int32 two's-complement values of 0x9E3779B9 / 0x85EBCA6B
    # (golden-ratio Weyl increment; murmur3 c2) — wrapping mul is fine.
    w0 = seed_ref[0] + pid * jnp.int32(-1640531527)
    w1 = seed_ref[1] ^ (pid * jnp.int32(-2048144789))
    pltpu.prng_seed(w0, w1)
    bits = pltpu.bitcast(pltpu.prng_random_bits((TB, M)), jnp.uint32)
    bits24 = pltpu.bitcast(bits >> 8, jnp.int32)
    uniform = bits24.astype(f32) * (1.0 / (1 << 24))
    mask = (uniform < keep_prob).astype(f32)

    eff = min(min_active, seq_len)
    needs_more = mask.sum(axis=-1, keepdims=True) < eff
    col = lax.broadcasted_iota(jnp.int32, (TB, M), 1)
    work = w
    indicator = jnp.zeros((TB, M), f32)
    for _ in range(eff):
        mx = work.max(axis=-1, keepdims=True)
        is_max = work == mx
        first_idx = jnp.where(is_max, col, M).min(axis=-1, keepdims=True)
        first = (col == first_idx).astype(f32)
        indicator = jnp.maximum(indicator, first)
        work = jnp.where(first > 0, -jnp.inf, work)
    mask = jnp.where(needs_more, indicator, mask)

    masked = w * mask
    msum = masked.sum(axis=-1, keepdims=True)
    valid = msum > EPS
    mw = jnp.where(valid, masked / jnp.where(valid, msum, 1.0), w)
    rate = 1.0 - mask.mean(axis=-1, keepdims=True)
    return mw, rate


def _weights_entropy_mask(
    kv_slices, seed_ref, mask_prob_ref, u_ref, c_ref, pad_ref,
    w_ref, mw_ref, ent_ref, rate_ref,
    *, num_heads, min_active, training, seq_len,
):
    """In-kernel scores → softmax → entropy → masking chain, writing the
    four side outputs; returns the per-head attention rows (the part of
    the fused forward that needs exactly one pass over the kv tile).
    Shared by the resident-weight kernel and the streamed ``mix`` kernel
    (E > 1024)."""
    TB, M = pad_ref.shape
    f32 = jnp.float32
    H = num_heads

    # ---- per-head scores via the precomputed u/c vectors (pure VPU) ---------
    # Build the (TB, M) score matrix by broadcast-select instead of
    # concatenating (TB, 1) columns — Mosaic cannot concat vectors whose
    # sublane offsets differ ("offset mismatch on non-concat dimension").
    col = lax.broadcasted_iota(jnp.int32, (TB, M), 1)
    w_acc = jnp.zeros((TB, M), f32)
    heads = []
    for h in range(H):
        u_h = u_ref[h, :]  # (E,)
        s = jnp.zeros((TB, M), f32)
        for m, kv_m in enumerate(kv_slices):
            s_m = (kv_m * u_h).sum(axis=-1, keepdims=True)  # (TB, 1)
            s = s + jnp.where(col == m, s_m, 0.0)
        s = s + c_ref[0, h] + pad_ref[:]  # (TB, M)
        smax = s.max(axis=-1, keepdims=True)
        e = jnp.exp(s - smax)
        a = e / e.sum(axis=-1, keepdims=True)  # (TB, M)
        heads.append(a)
        w_acc = w_acc + a
    w = w_acc * (1.0 / H)
    w_ref[:] = w

    # ---- entropy -------------------------------------------------------------
    max_entropy = math.log(seq_len) if seq_len > 1 else 0.0
    plogp = jnp.where(w > 0, w * jnp.log(jnp.maximum(w, 1e-38)), 0.0)
    entropy = jnp.clip(
        -plogp.sum(axis=-1, keepdims=True), 0.0, max_entropy
    )
    ent_ref[:] = entropy

    if not training or seq_len <= 1:
        mw_ref[:] = w
        rate_ref[:] = jnp.zeros((TB, 1), f32)
    else:
        mw, rate = _mask_and_renorm(
            w,
            entropy,
            max_entropy,
            mask_prob_ref[0],
            seed_ref,
            min_active=min_active,
            seq_len=seq_len,
        )
        mw_ref[:] = mw
        rate_ref[:] = rate
    return heads


def _shared_body(
    kv_slices,  # list of M (TB, E) f32 arrays
    seed_ref,
    mask_prob_ref,
    u_ref,  # (H, E)    score vectors (scale folded in)
    c_ref,  # (1, H)    score offsets (scale folded in)
    pad_ref,  # (TB, M)  additive score bias (0 or -1e30 for padded slots)
    wctx_ref,  # (E, E)  H==1: W_vo = Wo @ Wv ; H>1: Wv
    wo_ref,  # (E, E)   H>1 only (unused for H==1)
    bctx_ref,  # (1, E)  H==1: Wo@bv + bo ; H>1: bv
    bo_ref,  # (1, E)   H>1 only
    out_ref,  # (TB, E)
    w_ref,  # (TB, M)
    mw_ref,  # (TB, M)
    ent_ref,  # (TB, 1)
    rate_ref,  # (TB, 1)
    *,
    num_heads: int,
    min_active: int,
    training: bool,
    seq_len: int,
    mxu_precision,
):
    """Kernel body shared by the f32/bf16 and int8 entry points."""
    TB, M = pad_ref.shape
    E = kv_slices[0].shape[-1]
    H = num_heads
    Dh = E // H
    f32 = jnp.float32

    heads = _weights_entropy_mask(
        kv_slices, seed_ref, mask_prob_ref, u_ref, c_ref, pad_ref,
        w_ref, mw_ref, ent_ref, rate_ref,
        num_heads=num_heads, min_active=min_active, training=training,
        seq_len=seq_len,
    )

    # ---- mix → context GEMM(s) (quirk Q1: unmasked per-head attention) ------
    def mixed(a):
        # Σ_m a[:, m]·kv[:, m, :] as M unrolled (TB, E) fmas.
        acc = a[:, 0:1] * kv_slices[0]
        for m in range(1, M):
            acc = acc + a[:, m : m + 1] * kv_slices[m]
        return acc

    if H == 1:
        out_ref[:] = (
            jnp.dot(
                mixed(heads[0]),
                wctx_ref[:].T,
                preferred_element_type=f32,
                precision=mxu_precision,
            )
            + bctx_ref[0, :]
        )
    else:
        ctx_parts = []
        for h in range(H):
            wv_h = wctx_ref[h * Dh : (h + 1) * Dh, :]  # (Dh, E)
            ctx_parts.append(
                jnp.dot(
                    mixed(heads[h]),
                    wv_h.T,
                    preferred_element_type=f32,
                    precision=mxu_precision,
                )
            )
        ctx = jnp.concatenate(ctx_parts, axis=-1) + bctx_ref[0, :]
        out_ref[:] = (
            jnp.dot(
                ctx,
                wo_ref[:].T,
                preferred_element_type=f32,
                precision=mxu_precision,
            )
            + bo_ref[0, :]
        )


def _shared_kernel(
    seed_ref, mask_prob_ref,
    kv_ref,  # (TB, M*E) f32 or bf16 — flattened: the tiny M dim would be
    #          sublane-padded to 8 (f32) / 16 (bf16) as a block dimension,
    #          inflating the VMEM tile 2-4x; lane-slicing avoids it
    u_ref, c_ref, pad_ref, wctx_ref, wo_ref, bctx_ref, bo_ref,
    out_ref, w_ref, mw_ref, ent_ref, rate_ref,
    **static_kw,
):
    TB, M = pad_ref.shape
    E = kv_ref.shape[1] // M
    # bf16 feature storage halves HBM traffic; all math stays f32 in VMEM.
    kv_slices = _kv_tile_slices(kv_ref, None, M, E)
    _shared_body(
        kv_slices, seed_ref, mask_prob_ref, u_ref, c_ref, pad_ref,
        wctx_ref, wo_ref, bctx_ref, bo_ref,
        out_ref, w_ref, mw_ref, ent_ref, rate_ref, **static_kw,
    )


def _shared_kernel_q8(
    seed_ref, mask_prob_ref,
    kv_ref,  # (TB, M*E) int8 — flattened so lane-slicing avoids the
    #          (32, 128) int8 sublane tile blowing up a tiny M dimension
    scales_ref,  # (TB, M) f32 per-(row, modality) dequant scales
    u_ref, c_ref, pad_ref, wctx_ref, wo_ref, bctx_ref, bo_ref,
    out_ref, w_ref, mw_ref, ent_ref, rate_ref,
    **static_kw,
):
    M = pad_ref.shape[1]
    E = kv_ref.shape[1] // M
    # int8 features quarter the kv HBM traffic; dequantize per slice in
    # VMEM (f32 math throughout, like the bf16 path).
    kv_slices = _kv_tile_slices(kv_ref, scales_ref, M, E)
    _shared_body(
        kv_slices, seed_ref, mask_prob_ref, u_ref, c_ref, pad_ref,
        wctx_ref, wo_ref, bctx_ref, bo_ref,
        out_ref, w_ref, mw_ref, ent_ref, rate_ref,
        **static_kw,
    )


def quantize_features(kv: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Per-(row, modality) symmetric int8 quantization of ``(B, M, E)``
    features: returns ``(kv_int8, scales (B, M))`` for the quantized
    serving path of :func:`fused_fusion_pool_shared`."""
    absmax = jnp.abs(kv).max(axis=-1)  # (B, M)
    scales = jnp.where(absmax > 0, absmax / 127.0, 1.0).astype(jnp.float32)
    q = jnp.clip(
        jnp.round(kv / scales[..., None]), -127, 127
    ).astype(jnp.int8)
    return q, scales


def _prep(
    params: AttentionPoolParams,
    qrow: jax.Array,
    num_heads: int,
    precision: str = "highest",
):
    """Per-step precompute (tiny XLA GEMVs): qp, score vectors, fused ctx
    weights."""
    E = qrow.shape[-1]
    H = num_heads
    Dh = E // H
    wq, wk, wv, bq, bk, bv, _wo, _ = _split_params(params, E)
    bo = (
        params.out_proj_bias
        if params.out_proj_bias is not None
        else jnp.zeros((E,), jnp.float32)
    )
    scale = Dh ** -0.5

    # qp/u/c must honor the requested precision like everything else:
    # the backwards recompute u under the same context (_ctx_prec), and a
    # default (bf16-pass) u here against a HIGHEST u there would make
    # gradients inconsistent with the returned primal at ~bf16 error.
    with jax.default_matmul_precision(_ctx_prec(precision)):
        qp = qrow @ wq.T + bq  # (E,)
        qph = qp.reshape(H, Dh)
        wkh = wk.reshape(H, Dh, E)
        u = scale * jnp.einsum("hd,hde->he", qph, wkh)  # (H, E)
        c = scale * (qph * bk.reshape(H, Dh)).sum(-1)  # (H,)

    if H == 1:
        # The weight-fusion GEMM must run at the requested precision — a
        # bf16 W_vo would poison the f32 context GEMM's output parity.
        prec = _dot_prec(precision)
        wctx = jnp.matmul(
            params.out_proj_weight, wv, precision=prec
        )  # W_vo (E, E)
        bctx = params.out_proj_weight @ bv + bo
        # wo/bo are unused for H == 1 (fused into W_vo) — pass minimal
        # dummy tiles, NOT (E, E) zeros: a zeros (E, E) block still
        # occupies E²·4 of VMEM (4MB at E=1024) as a resident input.
        wo = jnp.zeros((8, 128), jnp.float32)
        bo_k = jnp.zeros((1, 128), jnp.float32)
    else:
        wctx = wv
        bctx = bv
        wo = params.out_proj_weight
        bo_k = bo.reshape(1, E)
    return u, c.reshape(1, H), wctx, wo, bctx.reshape(1, E), bo_k


def _forward(
    params,
    qrow,  # (E,)
    kv,  # (B, M, E)
    seed,
    mask_prob,
    key_padding_mask=None,  # (B, M) bool, True = padded slot
    *,
    num_heads,
    min_active,
    training,
    precision,
    interpret=False,
):
    B, M, E = kv.shape
    if num_heads <= 2 and E > _RESIDENT_E_CAP:
        return _forward_streamed(
            params, qrow, kv, seed, mask_prob, key_padding_mask,
            min_active=min_active, training=training,
            precision=precision, interpret=interpret,
            num_heads=num_heads,
        )[:5]
    u, c, wctx, wo, bctx, bo_k = _prep(params, qrow, num_heads, precision)
    pad_bias = _pad_bias_rows(key_padding_mask, B, M)

    # Tile size vs the 16MB scoped-vmem budget.  The live set scales with
    # the kv tile (TB·M·E·4, double-buffered) plus per-head temporaries.
    # With the flattened (TB, M·E) layout TB=512 fits at E=512 (+3%
    # within-run over 384; pre-flattening it overflowed) and 256 edges 192
    # at E=1024.  Dropping the dummy (E, E) wo block (round 3) freed 4MB:
    # TB=384 now compiles at E=1024 but measures even with 256 within-run
    # (16.4M both, B=8192/M=4), so 256 stays the default.
    TB = _pick_tile(
        512 if E <= 512 else 256, "AECF_FWD_TB", B, num_heads=num_heads,
        site=tiles.site_key(
            "fwd_resident", M=M, E=E, H=num_heads, kv_dtype=kv.dtype.name
        ),
    )
    # kv lane-sliced in-kernel from the flattened (B, M*E) layout
    B_pad, kv_flat, pad_bias = _pad_rows(
        B, TB, kv.reshape(B, M * E), pad_bias
    )

    mxu_precision = _dot_prec(precision)
    kernel = functools.partial(
        _shared_kernel,
        num_heads=num_heads,
        min_active=min_active,
        training=training,
        seq_len=M,
        mxu_precision=mxu_precision,
    )
    tile = lambda i, *_: (i, 0)  # noqa: E731
    whole = lambda i, *_: (0, 0)  # noqa: E731
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B_pad // TB,),
        in_specs=[
            pl.BlockSpec((TB, M * E), tile, memory_space=pltpu.VMEM),
            pl.BlockSpec((num_heads, E), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, num_heads), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, M), tile, memory_space=pltpu.VMEM),
            pl.BlockSpec((E, E), whole, memory_space=pltpu.VMEM),
            # wo/bo shapes follow the arrays: dummy (8, 128)/(1, 128)
            # tiles for H == 1 (unused — fused into W_vo), real (E, E)/
            # (1, E) blocks for H > 1.
            pl.BlockSpec(wo.shape, whole, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, E), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec(bo_k.shape, whole, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TB, E), tile, memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, M), tile, memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, M), tile, memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, 1), tile, memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, 1), tile, memory_space=pltpu.VMEM),
        ],
    )
    gemm_flops = 2 * B_pad * E * E * (1 if num_heads == 1 else 2)
    out, w, mw, ent, rate = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((B_pad, E), jnp.float32),
            jax.ShapeDtypeStruct((B_pad, M), jnp.float32),
            jax.ShapeDtypeStruct((B_pad, M), jnp.float32),
            jax.ShapeDtypeStruct((B_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((B_pad, 1), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=gemm_flops + 6 * B_pad * M * E,
            bytes_accessed=4 * (B_pad * E * (M + 1) + 2 * E * E),
            transcendentals=B_pad * M * 2,
        ),
        interpret=interpret,
    )(
        seed.reshape(2).astype(jnp.int32),
        mask_prob.reshape(1).astype(jnp.float32),
        kv_flat,
        u,
        c,
        pad_bias,
        wctx,
        wo,
        bctx,
        bo_k,
    )
    return out[:B], w[:B], mw[:B], ent[:B, 0], rate[:B, 0]


def _mix_kernel(
    seed_ref, mask_prob_ref,
    kv_ref,  # (TB, M*E) f32/bf16 — or int8 when ``quantized`` (flattened)
    *refs,  # [scales_ref (TB, M) when quantized] + u, c, pad + 5 outputs
    quantized: bool = False,
    num_heads: int = 1,
    **static_kw,
):
    """Streamed-path kernel (E > 1024): everything that needs the kv tile
    — scores, softmax, entropy, Bernoulli mask, and the attention mix —
    in one pass, WITHOUT any (E, E) matrix in VMEM.  The context GEMM(s)
    (``out = mix @ W_voᵀ + b`` for H == 1; per-head V-proj + out-proj for
    H == 2) run in XLA afterwards, which tiles large GEMMs optimally;
    streaming weight chunks per batch tile in-kernel would re-read E²·4
    bytes per tile instead.  For H > 1 the per-head mixes land lane-sliced
    in a (TB, H·E) output.  ``quantized`` adds a per-(row, modality)
    dequant multiply on the int8 kv slices — one kernel body so the two
    paths cannot diverge."""
    if quantized:
        (scales_ref, u_ref, c_ref, pad_ref,
         mix_ref, w_ref, mw_ref, ent_ref, rate_ref) = refs
    else:
        scales_ref = None
        (u_ref, c_ref, pad_ref,
         mix_ref, w_ref, mw_ref, ent_ref, rate_ref) = refs
    TB, M = pad_ref.shape
    E = kv_ref.shape[1] // M
    kv_slices = _kv_tile_slices(kv_ref, scales_ref, M, E)
    heads = _weights_entropy_mask(
        kv_slices, seed_ref, mask_prob_ref, u_ref, c_ref, pad_ref,
        w_ref, mw_ref, ent_ref, rate_ref, num_heads=num_heads, **static_kw,
    )
    for h, a in enumerate(heads):
        acc = a[:, 0:1] * kv_slices[0]
        for m in range(1, M):
            acc = acc + a[:, m : m + 1] * kv_slices[m]
        # mix may be stored bf16 (AECF_STREAM_MIX=bf16): halves the
        # kernel<->XLA-GEMM round-trip bytes; math above stays f32
        mix_ref[:, h * E : (h + 1) * E] = acc.astype(mix_ref.dtype)


def _forward_streamed(
    params,
    qrow,  # (E,)
    kv,  # (B, M, E)
    seed,
    mask_prob,
    key_padding_mask=None,
    *,
    min_active,
    training,
    precision,
    interpret=False,
    kv_scales=None,  # (B, M) f32 — int8 kv dequant scales (q8 path)
    num_heads=1,
):
    """Forward for E beyond the resident-weight kernel's VMEM cap (H ≤ 2).

    Returns ``(out, w, mw, ent, rate, mix)`` — ``mix`` is also an output
    so the streamed backwards can reuse it without re-reading kv (H == 1:
    the ``G = d_outᵀ @ mix`` GEMM; H == 2: the per-head dWv/ctx GEMMs).
    With int8 ``kv`` + ``kv_scales`` the kernel dequantizes in VMEM; the
    q8 training path differentiates through this via ``_shared_core_q8``'s
    custom_vjp (quantized backwards re-read kv as int8, kv itself frozen).
    """
    B, M, E = kv.shape
    H = num_heads
    u, c, wctx, wo, bctx, bo_k = _prep(params, qrow, H, precision)
    pad_bias = _pad_bias_rows(key_padding_mask, B, M)

    # No (E, E) block in VMEM — the working set is the double-buffered kv
    # tile (TB·M·E·4) plus the (TB, H·E) mix output.  TB=256 exceeds VMEM
    # at E=2048/M=3 (remote-compile failure); 128 fits and passes
    # on-chip, halving with E from there.  H == 2 doubles the mix tile, so
    # its default halves again.  Non-power-of-two E would give odd
    # defaults (E=1536 → 170): align down to the (8, 128) f32 sublane
    # tile.
    TB = _pick_tile(
        max(32, (1 << 18) // (E * H) // 8 * 8), "AECF_FWD_TB", B,
        row_bytes=E * (M * kv.dtype.itemsize + 4 * H),
        site=tiles.site_key(
            "fwd_streamed", M=M, E=E, H=H, kv_dtype=kv.dtype.name
        ),
    )
    q8 = kv_scales is not None
    B_pad, kv_flat, pad_bias, *opt = _pad_rows(
        B, TB, kv.reshape(B, M * E), pad_bias,
        *([kv_scales] if q8 else []),
    )
    if q8:
        (kv_scales,) = opt

    kernel = functools.partial(
        _mix_kernel,
        quantized=q8,
        num_heads=H,
        min_active=min_active,
        training=training,
        seq_len=M,
    )
    tile = lambda i, *_: (i, 0)  # noqa: E731
    whole = lambda i, *_: (0, 0)  # noqa: E731
    scales_specs = (
        [pl.BlockSpec((TB, M), tile, memory_space=pltpu.VMEM)] if q8 else []
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B_pad // TB,),
        in_specs=[
            pl.BlockSpec((TB, M * E), tile, memory_space=pltpu.VMEM),
        ] + scales_specs + [
            pl.BlockSpec((H, E), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, M), tile, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TB, H * E), tile, memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, M), tile, memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, M), tile, memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, 1), tile, memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, 1), tile, memory_space=pltpu.VMEM),
        ],
    )
    operands = [kv_flat] + ([kv_scales] if q8 else []) + [u, c, pad_bias]
    mix_dtype = _stream_mix_dtype(precision)
    mix, w, mw, ent, rate = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((B_pad, H * E), mix_dtype),
            jax.ShapeDtypeStruct((B_pad, M), jnp.float32),
            jax.ShapeDtypeStruct((B_pad, M), jnp.float32),
            jax.ShapeDtypeStruct((B_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((B_pad, 1), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=(6 + 2 * H) * B_pad * M * E,
            bytes_accessed=B_pad * E * (M * kv.dtype.itemsize + 4 * H),
            transcendentals=B_pad * M * 2,
        ),
        interpret=interpret,
    )(
        seed.reshape(2).astype(jnp.int32),
        mask_prob.reshape(1).astype(jnp.float32),
        *operands,
    )
    mix = mix[:B]
    # Context GEMM(s) in XLA (it tiles E×E GEMMs optimally at any size).
    prec = _dot_prec(precision)
    if H == 1:
        out = (
            jnp.matmul(mix, wctx.T, precision=prec,
                       preferred_element_type=jnp.float32)
            + bctx[0]
        )
    else:
        # wctx = Wv; per-head V-proj on the mixed tensor, then out-proj.
        Dh = E // H
        ctx = jnp.einsum(
            "bhe,hde->bhd",
            mix.reshape(B, H, E),
            wctx.reshape(H, Dh, E),
            precision=prec,
            preferred_element_type=jnp.float32,
        ).reshape(B, E) + bctx[0]
        out = (
            jnp.matmul(ctx, wo.T, precision=prec,
                       preferred_element_type=jnp.float32)
            + bo_k[0]
        )
    return out, w[:B], mw[:B], ent[:B, 0], rate[:B, 0], mix


def _forward_q8(
    params,
    qrow,  # (E,)
    kv_q8,  # (B, M, E) int8
    scales,  # (B, M) f32
    seed,
    mask_prob,
    key_padding_mask=None,
    *,
    num_heads,
    min_active,
    training,
    precision,
    interpret=False,
):
    """int8-feature forward primitive.  Inference calls it directly;
    training reaches it through ``_shared_core_q8``'s custom_vjp (grads
    flow to params/query, kv stays frozen int8 — see _shared_q8_bwd)."""
    B, M, E = kv_q8.shape
    u, c, wctx, wo, bctx, bo_k = _prep(params, qrow, num_heads, precision)
    pad_bias = _pad_bias_rows(key_padding_mask, B, M)

    # int8 kv tiles are 4x smaller than f32, so the q8 path affords a
    # larger batch tile at E=1024 than the f32 forward: 384 measured +8%
    # over 192 within-run (eval fwd, B=8192/M=4/E=1024).
    TB = _pick_tile(
        384, "AECF_FWD_TB", B, num_heads=num_heads,
        site=tiles.site_key(
            "fwd_resident", M=M, E=E, H=num_heads, kv_dtype="int8"
        ),
    )
    B_pad, kv_flat, scales, pad_bias = _pad_rows(
        B, TB, kv_q8.reshape(B, M * E), scales, pad_bias
    )

    mxu_precision = _dot_prec(precision)
    kernel = functools.partial(
        _shared_kernel_q8,
        num_heads=num_heads,
        min_active=min_active,
        training=training,
        seq_len=M,
        mxu_precision=mxu_precision,
    )
    tile = lambda i, *_: (i, 0)  # noqa: E731
    whole = lambda i, *_: (0, 0)  # noqa: E731
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B_pad // TB,),
        in_specs=[
            pl.BlockSpec((TB, M * E), tile, memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, M), tile, memory_space=pltpu.VMEM),
            pl.BlockSpec((num_heads, E), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, num_heads), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, M), tile, memory_space=pltpu.VMEM),
            pl.BlockSpec((E, E), whole, memory_space=pltpu.VMEM),
            # wo/bo shapes follow the arrays: dummy (8, 128)/(1, 128)
            # tiles for H == 1 (unused — fused into W_vo), real (E, E)/
            # (1, E) blocks for H > 1.
            pl.BlockSpec(wo.shape, whole, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, E), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec(bo_k.shape, whole, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TB, E), tile, memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, M), tile, memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, M), tile, memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, 1), tile, memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, 1), tile, memory_space=pltpu.VMEM),
        ],
    )
    gemm_flops = 2 * B_pad * E * E * (1 if num_heads == 1 else 2)
    out, w, mw, ent, rate = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((B_pad, E), jnp.float32),
            jax.ShapeDtypeStruct((B_pad, M), jnp.float32),
            jax.ShapeDtypeStruct((B_pad, M), jnp.float32),
            jax.ShapeDtypeStruct((B_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((B_pad, 1), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=gemm_flops + 7 * B_pad * M * E,
            bytes_accessed=B_pad * M * E + 4 * (B_pad * E + 2 * E * E),
            transcendentals=B_pad * M * 2,
        ),
        interpret=interpret,
    )(
        seed.reshape(2).astype(jnp.int32),
        mask_prob.reshape(1).astype(jnp.float32),
        kv_flat,
        scales,
        u,
        c,
        pad_bias,
        wctx,
        wo,
        bctx,
        bo_k,
    )
    return out[:B], w[:B], mw[:B], ent[:B, 0], rate[:B, 0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10, 11))
def _shared_core(
    params, qrow, kv, seed, mask_prob, key_padding_mask,
    num_heads, min_active, training, precision, interpret, kv_grad,
):
    # TRAINING must draw the same in-kernel Bernoulli mask whether or not
    # the call is differentiated: _shared_fwd streams on
    # _vjp_wants_streamed configs (a different tile grid seeds a
    # different PRNG stream), so the training primal streams there too.
    # Gradient-free EVAL keeps the resident kernel below the cap — no RNG
    # is consumed, so the asymmetry is a pure numerical tolerance.
    if training and _vjp_wants_streamed(num_heads, kv.shape[-1]):
        return tuple(_forward_streamed(
            params, qrow, kv, seed, mask_prob, key_padding_mask,
            min_active=min_active, training=training,
            precision=precision, interpret=interpret,
            num_heads=num_heads,
        )[:5])
    return _forward(
        params, qrow, kv, seed, mask_prob, key_padding_mask,
        num_heads=num_heads, min_active=min_active, training=training,
        precision=precision, interpret=interpret,
    )


def _shared_fwd(
    params, qrow, kv, seed, mask_prob, key_padding_mask,
    num_heads, min_active, training, precision, interpret, kv_grad,
):
    # outs[1] (the head-averaged weights, (B, M)) rides along as a residual
    # so the backward can fold an entropy cotangent into d_w — eval-mode
    # entropy is NOT detached in the reference (AECFLayer.py:150-156) and
    # must carry gradient on the kernel path too.  (B, M) f32: negligible
    # next to the (B, M, E) kv residual.  The streamed path (E > cap, or
    # H == 2 at E ≥ 512 — see _vjp_wants_streamed) additionally saves its
    # mix output for the backward's G GEMM.
    if _vjp_wants_streamed(num_heads, kv.shape[-1]):
        *outs, mix = _forward_streamed(
            params, qrow, kv, seed, mask_prob, key_padding_mask,
            min_active=min_active, training=training,
            precision=precision, interpret=interpret,
            num_heads=num_heads,
        )
        # mix rides along for the streamed backward: the H == 1 variant's
        # G GEMM and the H == 2 variant's per-head dWv/ctx GEMMs both need
        # it (recomputing it would cost another kv pass).
        return tuple(outs), (
            params, qrow, kv, key_padding_mask, outs[1], mix
        )
    outs = _forward(
        params, qrow, kv, seed, mask_prob, key_padding_mask,
        num_heads=num_heads, min_active=min_active, training=training,
        precision=precision, interpret=interpret,
    )
    return outs, (params, qrow, kv, key_padding_mask, outs[1], None)


def _fold_entropy_cotangent(d_w, d_ent, w, seq_len):
    """Route an entropy cotangent into the weights cotangent.

    The kernels compute ``ent = clip(-Σ w·log w, 0, ln L)`` from the
    head-averaged weights ``w`` in their epilogue; autodiff of that exact
    formula (cheap (B, M) elementwise XLA) turns ``d_ent`` into an
    additional ``d_w`` term, after which the existing attention backward
    handles everything.  Closes the round-2 verdict's Weak #2: eval-mode
    ``grad(loss(info['entropy']))`` was silently zero on the fused path.
    """
    if d_ent is None:
        return d_w
    max_entropy = math.log(seq_len) if seq_len > 1 else 0.0

    # Analytic jacobian, NOT jax.vjp of the kernel formula: autodiffing
    # ``log(maximum(w, 1e-38))`` produces ``1/1e-38`` factors, and 1e-38
    # is SUBNORMAL in f32 — XLA flushes it to zero, so the reciprocal is
    # inf and ``0 · inf = NaN`` poisons every gradient downstream even
    # when d_ent itself is all-zero (padded slots have w == 0 exactly).
    # ∂ent/∂w_m = -(log w_m + 1) for w_m > 0 (zero-slot weights carry no
    # entropy and get zero gradient), gated by the clip interval.
    safe_w = jnp.maximum(w, 1e-30)  # normal f32: reciprocal stays finite
    dplogp = jnp.where(w > 0, jnp.log(safe_w) + 1.0, 0.0)  # (B, M)
    ent_raw = -jnp.where(w > 0, w * jnp.log(safe_w), 0.0).sum(
        axis=-1, keepdims=True
    )
    inside = (ent_raw >= 0.0) & (ent_raw <= max_entropy)
    extra = jnp.where(inside, -d_ent[:, None], 0.0) * dplogp
    return extra if d_w is None else d_w + extra


def _tile_softmax_bwd(kv_slices, u, bias, d_mix, d_w, *, want_dkv, a=None):
    """Per-tile score-recompute → softmax → softmax-backward → d_kv/du
    chain shared by all three backward kernels (resident ``_bwd_kernel``,
    streamed ``_bwd_kernel_streamed``, and each head of
    ``_bwd_kernel_streamed_mh``) — the backward mirror of the forward's
    shared ``_weights_entropy_mask`` body, so a numerical fix lands in
    one place.

    Inputs are f32 tile values: ``kv_slices`` is a length-M list of
    (TB, E) feature slices, ``u`` the (E,) score vector, ``bias`` the
    (TB, M) additive score bias (pad mask + score offset c, pre-folded by
    the caller), ``d_mix`` (TB, E), ``d_w`` the (TB, M) cotangent on this
    head's weights (callers fold head-averaging scale in).  Returns
    ``(a, d_s, du_acc, dkv_terms)``: softmax weights, score cotangent,
    ``Σ_b d_s·kv`` as (1, E), and a length-M list of per-modality d_kv
    tiles (``None`` when ``want_dkv`` is False — frozen-feature callers
    skip the work entirely).

    ``a``: precomputed (TB, M) softmax weights.  The fused TRAIN-STEP
    kernel (:mod:`train_step`) already holds them in-register from its
    own forward pass and skips the score recompute (``bias`` is then used
    for its shape only).  Backward-only callers leave it ``None`` — that
    path traces exactly the ops it always did.
    """
    TB, M = bias.shape
    f32 = jnp.float32
    col = lax.broadcasted_iota(jnp.int32, (TB, M), 1)

    if a is None:
        s = jnp.zeros((TB, M), f32)
        d_a = jnp.zeros((TB, M), f32)
        for m, kv_m in enumerate(kv_slices):
            s_m = (kv_m * u).sum(axis=-1, keepdims=True)
            da_m = (d_mix * kv_m).sum(axis=-1, keepdims=True)
            s = s + jnp.where(col == m, s_m, 0.0)
            d_a = d_a + jnp.where(col == m, da_m, 0.0)
        s = s + bias
        smax = s.max(axis=-1, keepdims=True)
        e = jnp.exp(s - smax)
        a = e / e.sum(axis=-1, keepdims=True)  # (TB, M)
    else:
        d_a = jnp.zeros((TB, M), f32)
        for m, kv_m in enumerate(kv_slices):
            da_m = (d_mix * kv_m).sum(axis=-1, keepdims=True)
            d_a = d_a + jnp.where(col == m, da_m, 0.0)

    d_a = d_a + d_w
    d_s = a * (d_a - (a * d_a).sum(axis=-1, keepdims=True))  # (TB, M)

    E = kv_slices[0].shape[1]
    du_acc = jnp.zeros((1, E), f32)
    dkv_terms = [] if want_dkv else None
    for m, kv_m in enumerate(kv_slices):
        ds_m = d_s[:, m : m + 1]
        if want_dkv:
            dkv_terms.append(a[:, m : m + 1] * d_mix + ds_m * u)
        du_acc = du_acc + (ds_m * kv_m).sum(axis=0, keepdims=True)
    return a, d_s, du_acc, dkv_terms


def _bwd_kernel(
    kv_ref,  # (TB, M*E) — flattened, lane-sliced (see _shared_kernel doc)
    *refs,  # [scales_ref (TB, M) when quantized] + dout, dw, bias, u,
    #         wvo + out refs ([dkv_ref when want_dkv] + g/du/dvec accs)
    mxu_precision,
    want_dkv: bool = True,
    quantized: bool = False,
):
    """Fused backward for the H==1 shared-query pool.

    One pass over each kv tile computes d_kv and the three reduction
    accumulators; the XLA backward's separate d_ctx/dWo/d_mix/dWv GEMMs
    collapse to TWO per-tile GEMMs:
      d_mix = d_out @ W_vo          (since out = mix @ W_voᵀ + b)
      G    += d_outᵀ @ mix          (contract over the batch tile)
    with dWo = G·Wvᵀ + Σd_out ⊗ bv and dWv = Woᵀ·G reconstructed outside
    (two E×E GEMMs once per step, not per tile).

    ``want_dkv=False`` drops the d_kv tile output entirely — when the
    caller does not differentiate w.r.t. the features (the torch-baseline
    protocol: frozen/input features, only params trained), the 25MB/step
    d_kv write is a third of the backward's HBM traffic for nothing.

    ``quantized`` reads int8 kv tiles with a per-(row, modality) dequant
    in VMEM (int8 training path — always frozen features, so callers pass
    ``want_dkv=False``); same slice helper as the forward kernels.
    """
    if quantized:
        scales_ref, *refs = refs
    else:
        scales_ref = None
    dout_ref, dw_ref, bias_ref, u_ref, wvo_ref, *out_refs = refs
    if want_dkv:
        dkv_ref, g_ref, du_ref, dvec_ref = out_refs
    else:
        g_ref, du_ref, dvec_ref = out_refs
        dkv_ref = None
    TB, M = dw_ref.shape
    E = kv_ref.shape[1] // M
    f32 = jnp.float32
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        g_ref[:] = jnp.zeros((E, E), f32)
        du_ref[:] = jnp.zeros((1, E), f32)
        dvec_ref[:] = jnp.zeros((2, E), f32)

    kv_slices = _kv_tile_slices(kv_ref, scales_ref, M, E)
    d_out = dout_ref[:]
    u = u_ref[0, :]

    # out = mix @ W_voᵀ + b  ⇒  d_mix = d_out @ W_vo (first MXU GEMM)
    d_mix = jnp.dot(
        d_out, wvo_ref[:], preferred_element_type=f32,
        precision=mxu_precision,
    )

    # H == 1: head-average is identity, so dw passes through unscaled.
    a, d_s, du_acc, dkv_terms = _tile_softmax_bwd(
        kv_slices, u, bias_ref[:], d_mix, dw_ref[:], want_dkv=want_dkv
    )

    mix = a[:, 0:1] * kv_slices[0]
    for m in range(1, M):
        mix = mix + a[:, m : m + 1] * kv_slices[m]

    # second MXU GEMM: G += d_outᵀ @ mix (contract over the batch tile)
    g_ref[:] += lax.dot_general(
        d_out, mix,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=f32,
        precision=mxu_precision,
    )

    if want_dkv:
        for m in range(M):
            # d_kv is stored in the feature dtype (bf16 features ⇒ bf16
            # cotangent written directly — halves the d_kv HBM traffic).
            dkv_ref[:, m * E : (m + 1) * E] = dkv_terms[m].astype(
                dkv_ref.dtype
            )
    du_ref[:] += du_acc
    # Row 0 ← Σ_b d_out; row 1, col 0 ← Σ d_s.  Built by broadcast-select
    # (Mosaic cannot concat offset-mismatched vectors).
    row = lax.broadcasted_iota(jnp.int32, (2, E), 0)
    colE = lax.broadcasted_iota(jnp.int32, (2, E), 1)
    dvec_ref[:] += jnp.where(
        row == 0,
        d_out.sum(axis=0, keepdims=True),
        jnp.where(colE == 0, d_s.sum(), 0.0),
    )


# The H > 1 Pallas backward (_bwd_kernel_mh/_bwd_pallas_mh, ~330 LoC) was
# implemented, value-verified, and DELETED after within-run A/B measured it
# slower than the XLA einsum backward at every head count on v5e
# (B=4096, M=3, E=512, RTT-subtracted windows, round 3):
#   H=2: 0.71x   H=4: 0.58x   H=8: 0.80x (round-2 artifact)
# XLA batches the per-head GEMMs better than the per-tile kernel at these
# shapes, and at H=2 (Dh=256, no MXU underfill) the kernel still loses to
# VMEM-pressure-limited tiles — the deficit is structural, not underfill.
# A framework should not carry a kernel that never dispatches; git history
# (round 2) has the implementation if larger-Dh shapes ever warrant a
# re-evaluation.


def _out_vproj_bwd(d_out, mixh, wvh, wo, bv, has_out_bias, prec=None):
    """Backward through ``ctx = Σ_h mix_h·Wv_h + bv; out = ctx@Woᵀ+bo``
    (the XLA out/V-projection prologue shared by ``_bwd_streamed_mh`` and
    ``_shared_bwd_impl``).  ``mixh`` is (B, H, E), ``wvh`` (H, Dh, E).
    Returns ``(d_mix (B, H, E), dWo, dbo, dWv, d_bv)``."""
    B = d_out.shape[0]
    H, Dh, E = wvh.shape
    ctx = jnp.einsum(
        "bhe,hde->bhd", mixh, wvh, precision=prec
    ).reshape(B, E) + bv
    d_ctx = jnp.matmul(d_out, wo, precision=prec)  # (B, E)
    dWo = jnp.matmul(d_out.T, ctx, precision=prec)
    dbo = d_out.sum(0) if has_out_bias else None
    d_ctx_h = d_ctx.reshape(B, H, Dh)
    d_mix = jnp.einsum("bhd,hde->bhe", d_ctx_h, wvh, precision=prec)
    dWv = jnp.einsum(
        "bhd,bhe->hde", d_ctx_h, mixh, precision=prec
    ).reshape(E, E)
    d_bv = d_ctx.sum(0)
    return d_mix, dWo, dbo, dWv, d_bv


def _g_epilogue(G, dsum_out, wv, wo, bv, has_out_bias):
    """Reconstruct (dWo, dWv, d_bv, dbo) from the fused-backward G
    accumulator (``G = Σ_b d_out ⊗ mix``) — the H == 1 trick shared by
    ``_bwd_pallas`` and ``_bwd_streamed``: two E×E GEMMs once per step
    instead of per tile."""
    dWo = G @ wv.T + jnp.outer(dsum_out, bv)
    dWv = wo.T @ G
    d_bv = dsum_out @ wo
    dbo = dsum_out if has_out_bias else None
    return dWo, dWv, d_bv, dbo


def _query_path_grads(scale, qph, wkh, bk, du, dc, wq, qrow, has_bias):
    """Query/key-projection backward shared by every backward variant:
    ``u_h = scale·(qp_h @ Wk_h)``, ``c_h = scale·(qp_h · bk_h)`` ⇒
    grads for qp, Wk, bk, Wq, and the query row.  ``qph`` (H, Dh),
    ``du`` (H, E), ``dc`` (H,).  H == 1 callers pass 1-row reshapes."""
    H, Dh = qph.shape
    E = wkh.shape[2]
    bkh = bk.reshape(H, Dh)
    d_qph = scale * (
        jnp.einsum("he,hde->hd", du, wkh) + dc[:, None] * bkh
    )
    dWk = (scale * jnp.einsum("hd,he->hde", qph, du)).reshape(H * Dh, E)
    d_bk = (scale * dc[:, None] * qph).reshape(H * Dh) if has_bias else None
    d_qp = d_qph.reshape(H * Dh)
    dWq = jnp.outer(d_qp, qrow)
    d_qrow = d_qp @ wq
    return d_qp, dWk, d_bk, dWq, d_qrow


def _assemble_d_params(dWq, dWk, dWv, dWo, d_qp, d_bk, d_bv, dbo, has_bias):
    """Pack the per-projection grads into AttentionPoolParams (the
    reference's packed in_proj layout, AECFLayer.py:409-547)."""
    d_in_proj_bias = (
        jnp.concatenate([d_qp, d_bk, d_bv]) if has_bias else None
    )
    return AttentionPoolParams(
        in_proj_weight=jnp.concatenate([dWq, dWk, dWv], axis=0),
        out_proj_weight=dWo,
        in_proj_bias=d_in_proj_bias,
        out_proj_bias=dbo,
    )


def _bwd_pallas(residuals, cots, *, precision, interpret, want_dkv=True,
                kv_scales=None):
    """Pallas backward (H == 1): one kv read, two GEMMs per tile.

    ``kv_scales`` (int8 training path): kv is int8, dequantized per tile
    in VMEM — the backward's kv re-read drops to a quarter of the f32
    bytes.  int8 features are frozen by construction, so quantized
    callers always pass ``want_dkv=False``."""
    q8 = kv_scales is not None
    assert not (q8 and want_dkv), "int8 features are frozen: no d_kv"
    params, qrow, kv, key_padding_mask = residuals
    d_out, d_w, _d_mw, _d_ent, _d_rate = cots
    B, M, E = kv.shape
    kv_dtype = kv.dtype
    f32 = jnp.float32

    wq, wk, wv, bq, bk, bv, wo, has_bias = _split_params(params, E)
    prec = _dot_prec(precision)
    # _score_uc_1d remats qp/u/c under the SAME precision context as
    # _prep — the forward's u and this remat's u must be the same numbers
    # or the recomputed softmax (and every grad behind it) drifts from
    # the returned primal at ~bf16 error.
    qp, u, c, scale = _score_uc_1d(qrow, wq, bq, wk, bk, E, precision)
    wvo = jnp.matmul(wo, wv, precision=prec)  # (E, E)

    bias = _pad_bias_rows(
        key_padding_mask, B, M, base=jnp.full((B, M), c, f32)
    )
    if d_w is None:
        d_w = jnp.zeros((B, M), f32)

    # Measured with flattened (TB, M*E) tiles: 192 beats 128 by ~5% at
    # E=1024 and 256 still exceeds VMEM (remote-compile failure).  Without
    # the d_kv output tile (want_dkv=False) 256 wins at every E and
    # dtype once windows are long enough to dwarf the tunnel RTT
    # (K=2000 paired A/Bs, docs/artifacts/sweep_bwd_tb256_e512.json:
    # f32 +3.5% 12/15 paired rounds, bf16 +4.4% 8/9, int8 +1.0% 7/9 at
    # E=512; 256 was already +8% at E=1024).  The earlier "512 +6% at
    # E=512" was a K=120 short-window measurement — RTT noise, retracted.
    # EXCEPTION: bf16 kv at E=1024 admits 384 (+32% within-run; tiles are
    # half the bytes; 512 exceeds VMEM — sweep_bf16_large.json).  With
    # want_dkv the d_kv OUTPUT tile doubles the (TB, M*E) residency, so
    # bf16 does NOT admit larger tiles: at E=1024 256/384 still exceed
    # VMEM and at E=512 the 256 default beats 384/512 by 10-23%
    # within-run (sweep_bf16_dkv_e{512,1024}.json) — the want_dkv branch
    # stays dtype-independent by measurement, not omission.
    bwd_site = tiles.site_key(
        "bwd_resident", M=M, E=E, H=1, kv_dtype=kv.dtype.name,
        want_dkv=want_dkv,
    )
    if want_dkv:
        TB = _pick_tile(
            256 if E <= 512 else 192, "AECF_BWD_TB", B, site=bwd_site
        )
    elif E > 512 and kv.dtype.itemsize == 2:
        TB = _pick_tile(384, "AECF_BWD_TB", B, site=bwd_site)
    else:
        # int8 does NOT admit a larger tile at E=1024 despite its 4x
        # smaller kv blocks — swept within-run (sweep_q8_bwd_e1024.json):
        # 256 beats 512 by 17% and 384 by 40%; 768 fails remote compile.
        # The f32 d_out/d_mix tiles dominate the budget, so the f32
        # defaults carry over.
        TB = _pick_tile(256, "AECF_BWD_TB", B, site=bwd_site)
    B_pad, kv_flat, d_out, d_w, bias, *opt = _pad_rows(
        B, TB, kv.reshape(B, M * E), d_out, d_w, bias,
        *([kv_scales] if q8 else []),
    )
    if q8:
        (kv_scales,) = opt

    mxu_precision = prec
    kernel = functools.partial(
        _bwd_kernel, mxu_precision=mxu_precision, want_dkv=want_dkv,
        quantized=q8,
    )
    tile = lambda i: (i, 0)  # noqa: E731
    whole = lambda i: (0, 0)  # noqa: E731
    scales_specs = (
        [pl.BlockSpec((TB, M), tile, memory_space=pltpu.VMEM)] if q8 else []
    )
    dkv_specs = (
        [pl.BlockSpec((TB, M * E), tile, memory_space=pltpu.VMEM)]
        if want_dkv else []
    )
    dkv_shapes = (
        # d_kv in the feature dtype — written once, at bf16 half-traffic
        # when features are bf16 (no f32 detour through HBM).
        [jax.ShapeDtypeStruct((B_pad, M * E), kv_dtype)] if want_dkv else []
    )
    outs = pl.pallas_call(
        kernel,
        grid=(B_pad // TB,),
        in_specs=[
            pl.BlockSpec((TB, M * E), tile, memory_space=pltpu.VMEM),
        ] + scales_specs + [
            pl.BlockSpec((TB, E), tile, memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, M), tile, memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, M), tile, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, E), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec((E, E), whole, memory_space=pltpu.VMEM),
        ],
        out_specs=dkv_specs + [
            pl.BlockSpec((E, E), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, E), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec((2, E), whole, memory_space=pltpu.VMEM),
        ],
        out_shape=tuple(dkv_shapes) + (
            jax.ShapeDtypeStruct((E, E), f32),
            jax.ShapeDtypeStruct((1, E), f32),
            jax.ShapeDtypeStruct((2, E), f32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B_pad * E * E + 10 * B_pad * M * E,
            bytes_accessed=(
                (2 if want_dkv else 1) * B_pad * M * E * kv_dtype.itemsize
                + 4 * (2 * B_pad * E + 2 * E * E)
            ),
            transcendentals=B_pad * M,
        ),
        interpret=interpret,
    )(
        kv_flat,
        *([kv_scales] if q8 else []),
        d_out, d_w, bias, u.reshape(1, E), wvo,
    )

    if want_dkv:
        d_kv, G, du, dvec = outs
        d_kv = d_kv[:B].reshape(B, M, E)
    else:
        G, du, dvec = outs
        d_kv = jnp.zeros((B, M, E), kv_dtype)
    du = du[0]
    dsum_out = dvec[0]
    dc = dvec[1, 0]

    # ---- reconstruct weight grads from the fused accumulators ----------------
    with jax.default_matmul_precision(_ctx_prec(precision)):
        dWo, dWv, d_bv, dbo = _g_epilogue(
            G, dsum_out, wv, wo, bv, params.out_proj_bias is not None
        )
        d_qp, dWk, d_bk, dWq, d_qrow = _query_path_grads(
            scale, qp.reshape(1, E), wk.reshape(1, E, E), bk,
            du.reshape(1, E), dc.reshape(1), wq, qrow, has_bias,
        )

    d_params = _assemble_d_params(
        dWq, dWk, dWv, dWo, d_qp, d_bk, d_bv, dbo, has_bias
    )
    return d_params, d_qrow, d_kv.astype(kv_dtype), None, None, None


def _bwd_kernel_streamed(
    kv_ref,  # (TB, M*E) — flattened, lane-sliced
    *refs,  # [scales_ref (TB, M) when quantized] + dmix, dw, bias, u +
    #         out refs ([dkv_ref when want_dkv] + du/dc accumulator)
    want_dkv: bool = True,
    quantized: bool = False,
):
    """Streamed-path backward: one pass over each kv tile, no (E, E)
    matrix in VMEM.  The two E×E GEMMs of the fused backward (d_mix and
    G) run in XLA outside; this kernel recomputes the softmax from
    (kv, u), runs the softmax backward, writes d_kv, and accumulates
    du = Σ d_s·kv and dc = Σ d_s.  ``quantized``: int8 kv tiles with the
    per-(row, modality) dequant in VMEM (frozen features ⇒ no d_kv)."""
    if quantized:
        scales_ref, *refs = refs
    else:
        scales_ref = None
    dmix_ref, dw_ref, bias_ref, u_ref, *out_refs = refs
    if want_dkv:
        dkv_ref, acc_ref = out_refs
    else:
        (acc_ref,) = out_refs
        dkv_ref = None
    TB, M = dw_ref.shape
    E = kv_ref.shape[1] // M
    f32 = jnp.float32
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc_ref[:] = jnp.zeros((2, E), f32)

    kv_slices = _kv_tile_slices(kv_ref, scales_ref, M, E)
    _a, d_s, du_acc, dkv_terms = _tile_softmax_bwd(
        kv_slices, u_ref[0, :], bias_ref[:],
        dmix_ref[:].astype(jnp.float32), dw_ref[:],
        want_dkv=want_dkv,
    )
    if want_dkv:
        for m in range(M):
            dkv_ref[:, m * E : (m + 1) * E] = dkv_terms[m].astype(
                dkv_ref.dtype
            )
    # Row 0 ← du; row 1, col 0 ← Σ d_s (broadcast-select; Mosaic cannot
    # concat offset-mismatched vectors).
    row = lax.broadcasted_iota(jnp.int32, (2, E), 0)
    colE = lax.broadcasted_iota(jnp.int32, (2, E), 1)
    acc_ref[:] += jnp.where(
        row == 0, du_acc, jnp.where(colE == 0, d_s.sum(), 0.0)
    )


def _bwd_kernel_streamed_mh(
    kv_ref,  # (TB, M*E) — flattened, lane-sliced
    *refs,  # [scales_ref (TB, M) when quantized] + dmix (TB, H*E), dw,
    #         pad, u (H, E), c (1, H) + outs ([dkv_ref] + acc (H+1, E))
    num_heads: int,
    want_dkv: bool = True,
    quantized: bool = False,
):
    """H ≥ 2 streamed backward: one pass over each kv tile recomputes the
    per-head softmax, runs the softmax backward, writes d_kv (summed over
    heads), and accumulates du_h = Σ d_s_h·kv (rows 0..H-1) and
    dc_h = Σ d_s_h (row H, col h).  The XLA einsum backward re-reads kv
    three times (scores, d_a, du einsums) plus once more for d_kv; this
    reads it once.  ``quantized``: int8 kv tiles, dequant in VMEM
    (frozen features ⇒ no d_kv)."""
    if quantized:
        scales_ref, *refs = refs
    else:
        scales_ref = None
    dmix_ref, dw_ref, pad_ref, u_ref, c_ref, *out_refs = refs
    if want_dkv:
        dkv_ref, acc_ref = out_refs
    else:
        (acc_ref,) = out_refs
        dkv_ref = None
    TB, M = dw_ref.shape
    E = kv_ref.shape[1] // M
    H = num_heads
    f32 = jnp.float32
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc_ref[:] = jnp.zeros((H + 1, E), f32)

    kv_slices = _kv_tile_slices(kv_ref, scales_ref, M, E)
    dkv_acc = [jnp.zeros((TB, E), f32) for _ in range(M)] if want_dkv else None
    du_rows = []
    dc_vals = []
    dw_h = dw_ref[:] * (1.0 / H)  # head-average cotangent
    for h in range(H):
        _a, d_s, du_acc, dkv_terms = _tile_softmax_bwd(
            kv_slices, u_ref[h, :], c_ref[0, h] + pad_ref[:],
            dmix_ref[:, h * E : (h + 1) * E].astype(jnp.float32),
            dw_h, want_dkv=want_dkv,
        )
        if want_dkv:
            for m in range(M):
                dkv_acc[m] = dkv_acc[m] + dkv_terms[m]
        du_rows.append(du_acc)
        dc_vals.append(d_s.sum())

    if want_dkv:
        for m in range(M):
            dkv_ref[:, m * E : (m + 1) * E] = dkv_acc[m].astype(
                dkv_ref.dtype
            )
    # Accumulator rows: h → du_h; row H col h → dc_h (broadcast-select —
    # Mosaic cannot concat offset-mismatched vectors).
    row = lax.broadcasted_iota(jnp.int32, (H + 1, E), 0)
    colE = lax.broadcasted_iota(jnp.int32, (H + 1, E), 1)
    upd = jnp.zeros((H + 1, E), f32)
    for h in range(H):
        upd = upd + jnp.where(row == h, du_rows[h], 0.0)
        upd = upd + jnp.where(
            (row == H) & (colE == h), dc_vals[h], 0.0
        )
    acc_ref[:] += upd


def _bwd_streamed_mh(residuals, cots, mix, *, num_heads, precision,
                     interpret, want_dkv=True, kv_scales=None):
    """Backward for the streamed H ≥ 2 path: per-head V/out GEMMs in XLA,
    one-pass-over-kv Pallas kernel for softmax backward + d_kv + du/dc.

    ``kv_scales``: int8 kv (training path), dequantized per tile in
    VMEM; int8 features are frozen so ``want_dkv`` must be False."""
    q8 = kv_scales is not None
    assert not (q8 and want_dkv), "int8 features are frozen: no d_kv"
    params, qrow, kv, key_padding_mask = residuals
    d_out, d_w, _d_mw, _d_ent, _d_rate = cots
    B, M, E = kv.shape
    H = num_heads
    Dh = E // H
    kv_dtype = kv.dtype
    f32 = jnp.float32

    wq, wk, wv, bq, bk, bv, wo, has_bias = _split_params(params, E)
    scale = Dh ** -0.5

    prec = _dot_prec(precision)
    # remat of _prep's qp/u/c under the SAME precision context (_ctx_prec)
    with jax.default_matmul_precision(_ctx_prec(precision)):
        qp = qrow @ wq.T + bq  # (E,)
        qph = qp.reshape(H, Dh)
        wkh = wk.reshape(H, Dh, E)
        wvh = wv.reshape(H, Dh, E)
        u = scale * jnp.einsum("hd,hde->he", qph, wkh)  # (H, E)
        c = scale * (qph * bk.reshape(H, Dh)).sum(-1)  # (H,)

        # ---- out/V-projection backward (XLA GEMMs) ----------------------
        d_mix, dWo, dbo, dWv, d_bv = _out_vproj_bwd(
            d_out, mix.reshape(B, H, E), wvh, wo, bv,
            params.out_proj_bias is not None, prec,
        )
        d_mix = d_mix.reshape(B, H * E)
    d_mix = d_mix.astype(_stream_mix_dtype(precision))  # see helper

    pad_bias = _pad_bias_rows(key_padding_mask, B, M)
    if d_w is None:
        d_w = jnp.zeros((B, M), f32)

    # Working set: kv tile + (TB, H·E) d_mix in, d_kv tile out when
    # requested — the H·E d_mix tile halves the H==1 defaults again.
    TB = _pick_tile(
        max(32, (1 << 18) // (E * (H if not want_dkv else 2 * H))
            // 8 * 8),
        "AECF_BWD_TB", B,
        row_bytes=E * (
            kv_dtype.itemsize * M * (2 if want_dkv else 1) + 4 * H
        ),
        site=tiles.site_key(
            "bwd_streamed", M=M, E=E, H=H, kv_dtype=kv_dtype.name,
            want_dkv=want_dkv,
        ),
    )
    B_pad, kv_flat, d_mix, d_w, pad_bias, *opt = _pad_rows(
        B, TB, kv.reshape(B, M * E), d_mix, d_w, pad_bias,
        *([kv_scales] if q8 else []),
    )
    if q8:
        (kv_scales,) = opt

    kernel = functools.partial(
        _bwd_kernel_streamed_mh, num_heads=H, want_dkv=want_dkv,
        quantized=q8,
    )
    tile = lambda i: (i, 0)  # noqa: E731
    whole = lambda i: (0, 0)  # noqa: E731
    scales_specs = (
        [pl.BlockSpec((TB, M), tile, memory_space=pltpu.VMEM)] if q8 else []
    )
    dkv_specs = (
        [pl.BlockSpec((TB, M * E), tile, memory_space=pltpu.VMEM)]
        if want_dkv else []
    )
    dkv_shapes = (
        [jax.ShapeDtypeStruct((B_pad, M * E), kv_dtype)] if want_dkv else []
    )
    outs = pl.pallas_call(
        kernel,
        grid=(B_pad // TB,),
        in_specs=[
            pl.BlockSpec((TB, M * E), tile, memory_space=pltpu.VMEM),
        ] + scales_specs + [
            pl.BlockSpec((TB, H * E), tile, memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, M), tile, memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, M), tile, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, E), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H), whole, memory_space=pltpu.VMEM),
        ],
        out_specs=dkv_specs + [
            pl.BlockSpec((H + 1, E), whole, memory_space=pltpu.VMEM),
        ],
        out_shape=tuple(dkv_shapes) + (
            jax.ShapeDtypeStruct((H + 1, E), f32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=(8 + 6 * H) * B_pad * M * E,
            bytes_accessed=B_pad * E * (
                M * kv_dtype.itemsize * (2 if want_dkv else 1) + 4 * H
            ),
            transcendentals=B_pad * M * H,
        ),
        interpret=interpret,
    )(
        kv_flat,
        *([kv_scales] if q8 else []),
        d_mix, d_w, pad_bias, u, c.reshape(1, H),
    )

    if want_dkv:
        d_kv, acc = outs
        d_kv = d_kv[:B].reshape(B, M, E)
    else:
        (acc,) = outs
        d_kv = jnp.zeros((B, M, E), kv_dtype)
    du = acc[:H]  # (H, E)
    dc = acc[H, :H]  # (H,)

    with jax.default_matmul_precision(_ctx_prec(precision)):
        d_qp, dWk, d_bk, dWq, d_qrow = _query_path_grads(
            scale, qph, wkh, bk, du, dc, wq, qrow, has_bias
        )

    d_params = _assemble_d_params(
        dWq, dWk, dWv, dWo, d_qp, d_bk, d_bv, dbo, has_bias
    )
    return d_params, d_qrow, d_kv.astype(kv_dtype), None, None, None


def _bwd_streamed(residuals, cots, mix, *, precision, interpret,
                  want_dkv=True, kv_scales=None):
    """Backward for the streamed H == 1 path (E > resident cap).

    ``kv_scales``: int8 kv (training path), dequantized per tile in
    VMEM; int8 features are frozen so ``want_dkv`` must be False."""
    q8 = kv_scales is not None
    assert not (q8 and want_dkv), "int8 features are frozen: no d_kv"
    params, qrow, kv, key_padding_mask = residuals
    d_out, d_w, _d_mw, _d_ent, _d_rate = cots
    B, M, E = kv.shape
    kv_dtype = kv.dtype
    f32 = jnp.float32

    wq, wk, wv, bq, bk, bv, wo, has_bias = _split_params(params, E)
    prec = _dot_prec(precision)
    # _score_uc_1d remats qp/u/c under the SAME precision context as
    # _prep (see _bwd_pallas): the remat u must equal the forward's u.
    qp, u, c, scale = _score_uc_1d(qrow, wq, bq, wk, bk, E, precision)
    wvo = jnp.matmul(wo, wv, precision=prec)  # (E, E)

    # ---- the two E×E GEMMs, in XLA (optimal tiling at any E) ---------------
    with jax.default_matmul_precision(_ctx_prec(precision)):
        d_mix = jnp.matmul(d_out, wvo, precision=prec)  # (B, E)
        G = jnp.matmul(d_out.T, mix, precision=prec)  # (E, E)
    d_mix = d_mix.astype(_stream_mix_dtype(precision))  # see helper
    dsum_out = d_out.sum(axis=0)  # (E,)

    bias = _pad_bias_rows(
        key_padding_mask, B, M, base=jnp.full((B, M), c, f32)
    )
    if d_w is None:
        d_w = jnp.zeros((B, M), f32)

    # Working set: kv tile + (TB, E) d_mix in, d_kv tile out (when
    # requested), all double-buffered.  TB=128 with d_kv exceeds VMEM at
    # E=2048/M=3; 64 fits and passes on-chip.  Defaults aligned to the
    # 8-row sublane tile (see the forward's note).
    TB = _pick_tile(
        max(32, (1 << 18) // E // 8 * 8) if not want_dkv
        else max(32, (1 << 17) // E // 8 * 8),
        "AECF_BWD_TB", B,
        row_bytes=E * (
            kv_dtype.itemsize * M * (2 if want_dkv else 1) + 4
        ),
        site=tiles.site_key(
            "bwd_streamed", M=M, E=E, H=1, kv_dtype=kv_dtype.name,
            want_dkv=want_dkv,
        ),
    )
    B_pad, kv_flat, d_mix, d_w, bias, *opt = _pad_rows(
        B, TB, kv.reshape(B, M * E), d_mix, d_w, bias,
        *([kv_scales] if q8 else []),
    )
    if q8:
        (kv_scales,) = opt

    kernel = functools.partial(
        _bwd_kernel_streamed, want_dkv=want_dkv, quantized=q8
    )
    tile = lambda i: (i, 0)  # noqa: E731
    whole = lambda i: (0, 0)  # noqa: E731
    scales_specs = (
        [pl.BlockSpec((TB, M), tile, memory_space=pltpu.VMEM)] if q8 else []
    )
    dkv_specs = (
        [pl.BlockSpec((TB, M * E), tile, memory_space=pltpu.VMEM)]
        if want_dkv else []
    )
    dkv_shapes = (
        [jax.ShapeDtypeStruct((B_pad, M * E), kv_dtype)] if want_dkv else []
    )
    outs = pl.pallas_call(
        kernel,
        grid=(B_pad // TB,),
        in_specs=[
            pl.BlockSpec((TB, M * E), tile, memory_space=pltpu.VMEM),
        ] + scales_specs + [
            pl.BlockSpec((TB, E), tile, memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, M), tile, memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, M), tile, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, E), whole, memory_space=pltpu.VMEM),
        ],
        out_specs=dkv_specs + [
            pl.BlockSpec((2, E), whole, memory_space=pltpu.VMEM),
        ],
        out_shape=tuple(dkv_shapes) + (
            jax.ShapeDtypeStruct((2, E), f32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=12 * B_pad * M * E,
            bytes_accessed=B_pad * E * (
                M * kv_dtype.itemsize * (2 if want_dkv else 1) + 4
            ),
            transcendentals=B_pad * M,
        ),
        interpret=interpret,
    )(
        kv_flat,
        *([kv_scales] if q8 else []),
        d_mix, d_w, bias, u.reshape(1, E),
    )

    if want_dkv:
        d_kv, acc = outs
        d_kv = d_kv[:B].reshape(B, M, E)
    else:
        (acc,) = outs
        d_kv = jnp.zeros((B, M, E), kv_dtype)
    du = acc[0]
    dc = acc[1, 0]

    # ---- reconstruct weight grads (same algebra as _bwd_pallas) -------------
    with jax.default_matmul_precision(_ctx_prec(precision)):
        dWo, dWv, d_bv, dbo = _g_epilogue(
            G, dsum_out, wv, wo, bv, params.out_proj_bias is not None
        )
        d_qp, dWk, d_bk, dWq, d_qrow = _query_path_grads(
            scale, qp.reshape(1, E), wk.reshape(1, E, E), bk,
            du.reshape(1, E), dc.reshape(1), wq, qrow, has_bias,
        )

    d_params = _assemble_d_params(
        dWq, dWk, dWv, dWo, d_qp, d_bk, d_bv, dbo, has_bias
    )
    return d_params, d_qrow, d_kv.astype(kv_dtype), None, None, None


def _shared_bwd(
    num_heads, min_active, training, precision, interpret, kv_grad,
    residuals, cots,
):
    # H == 1 (every reference flow; north-star + large configs): fused
    # Pallas backward — one kv read, two per-tile GEMMs, measured 1.46x the
    # XLA backward at E=1024/M=4 (docs/artifacts/bench_suite.json).
    # H > 1 RESIDENT configs use the XLA einsum backward — a resident
    # Pallas mh variant was built, verified, measured slower at EVERY head
    # count, and deleted (see the measurement note above _bwd_pallas); the
    # STREAMED H == 2 path (E > cap) has its own one-pass multi-head
    # Pallas backward (_bwd_streamed_mh), where the kv re-reads it saves
    # are 4x larger.  Interpret mode runs the Pallas
    # paths hermetically on CPU.  AECF_SHARED_BWD=xla|pallas overrides
    # (A/B; 'pallas' applies to H == 1 only).
    import os

    params, qrow, kv, key_padding_mask, w_res, mix_res = residuals
    residuals = (params, qrow, kv, key_padding_mask)
    d_out, d_w, _d_mw, _d_ent, _d_rate = cots
    d_w = _fold_entropy_cotangent(d_w, _d_ent, w_res, kv.shape[1])
    cots = (d_out, d_w, _d_mw, None, _d_rate)

    override = os.environ.get("AECF_SHARED_BWD", "auto")
    if mix_res is not None and override != "xla":
        # Streamed path (H ≤ 2, E > resident cap): XLA E×E GEMMs + a
        # one-pass-over-kv Pallas kernel; no (E, E) matrix in VMEM.
        # AECF_SHARED_BWD=xla still forces the plain XLA backward (A/B).
        if num_heads == 1:
            return _bwd_streamed(
                residuals, cots, mix_res, precision=precision,
                interpret=interpret, want_dkv=kv_grad,
            )
        return _bwd_streamed_mh(
            residuals, cots, mix_res, num_heads=num_heads,
            precision=precision, interpret=interpret, want_dkv=kv_grad,
        )
    use_pallas = num_heads == 1 and (
        interpret or jax.default_backend() == "tpu"
    )
    if override == "xla":
        use_pallas = False
    elif override == "pallas":
        use_pallas = num_heads == 1
    if use_pallas:
        return _bwd_pallas(
            residuals, cots, precision=precision, interpret=interpret,
            want_dkv=kv_grad,
        )
    with jax.default_matmul_precision(_ctx_prec(precision)):
        return _shared_bwd_impl(
            num_heads, residuals, cots, kv_grad=kv_grad
        )


def _shared_bwd_impl(num_heads, residuals, cots, kv_grad=True):
    params, qrow, kv, key_padding_mask = residuals
    d_out, d_w, _d_mw, _d_ent, _d_rate = cots
    B, M, E = kv.shape
    H = num_heads
    Dh = E // H

    wq, wk, wv, bq, bk, bv, wo, has_bias = _split_params(params, E)
    scale = Dh ** -0.5

    # ---- recompute forward (remat) -----------------------------------------
    kv_dtype = kv.dtype
    kv = kv.astype(jnp.float32)
    qp = qrow @ wq.T + bq  # (E,)
    qph = qp.reshape(H, Dh)
    wkh = wk.reshape(H, Dh, E)
    u = scale * jnp.einsum("hd,hde->he", qph, wkh)  # (H, E)
    c = scale * (qph * bk.reshape(H, Dh)).sum(-1)  # (H,)

    s = jnp.einsum("bme,he->bhm", kv, u) + c[None, :, None]  # (B, H, M)
    if key_padding_mask is not None:
        s = jnp.where(key_padding_mask[:, None, :], -1e30, s)
    a = jax.nn.softmax(s, axis=-1)  # (B, H, M)
    mix = jnp.einsum("bhm,bme->bhe", a, kv)  # (B, H, E)
    wvh = wv.reshape(H, Dh, E)

    # ---- out/V-projection backward ----------------------------------------
    d_mix, dWo, dbo, dWv, d_bv = _out_vproj_bwd(
        d_out, mix, wvh, wo, bv, params.out_proj_bias is not None
    )

    d_a = jnp.einsum("bhe,bme->bhm", d_mix, kv)
    if d_w is not None:
        d_a = d_a + d_w[:, None, :] / H
    d_s = a * (d_a - (a * d_a).sum(axis=-1, keepdims=True))  # (B, H, M)

    if kv_grad:
        d_kv = jnp.einsum("bhm,bhe->bme", a, d_mix) + jnp.einsum(
            "bhm,he->bme", d_s, u
        )
    else:
        d_kv = jnp.zeros((B, M, E), jnp.float32)
    d_u = jnp.einsum("bhm,bme->he", d_s, kv)  # (H, E)
    d_c = d_s.sum((0, 2))  # (H,)

    d_qp, dWk, d_bk, dWq, d_qrow = _query_path_grads(
        scale, qph, wkh, bk, d_u, d_c, wq, qrow, has_bias
    )

    d_params = _assemble_d_params(
        dWq, dWk, dWv, dWo, d_qp, d_bk, d_bv, dbo, has_bias
    )
    return d_params, d_qrow, d_kv.astype(kv_dtype), None, None, None


_shared_core.defvjp(_shared_fwd, _shared_bwd)


def _q8_dispatch(params, qrow, kv_q8, kv_scales, seed, mask_prob,
                 key_padding_mask, num_heads, min_active, training,
                 precision, interpret, differentiable=False):
    """Quantized forward dispatch shared by the q8 primal and its vjp
    forward: resident int8 kernel at E ≤ cap, streamed split (H ≤ 2)
    above it — and, when ``differentiable`` (the vjp forward), H == 2 at
    E ≥ 512 streams below the cap too (same measured boundary as the f32
    path, ``_vjp_wants_streamed``).  Returns ``(outs, mix-or-None)`` —
    the streamed backward reuses ``mix`` so it never re-reads kv for the
    G GEMM."""
    streamed = (
        _vjp_wants_streamed(num_heads, kv_q8.shape[-1])
        if differentiable
        else kv_q8.shape[-1] > _RESIDENT_E_CAP
    )
    if streamed and num_heads <= 2:
        *outs, mix = _forward_streamed(
            params, qrow, kv_q8, seed, mask_prob, key_padding_mask,
            min_active=min_active, training=training, precision=precision,
            interpret=interpret, kv_scales=kv_scales, num_heads=num_heads,
        )
        return tuple(outs), mix
    outs = _forward_q8(
        params, qrow, kv_q8, kv_scales, seed, mask_prob, key_padding_mask,
        num_heads=num_heads, min_active=min_active, training=training,
        precision=precision, interpret=interpret,
    )
    return outs, None


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11))
def _shared_core_q8(
    params, qrow, kv_q8, kv_scales, seed, mask_prob, key_padding_mask,
    num_heads, min_active, training, precision, interpret,
):
    """int8-feature shared-query pool, differentiable w.r.t. params and
    the query row.

    int8 features are frozen by construction (quantization is not
    differentiable), so this is the kv_grad=False contract with the kv
    stream at a QUARTER of the f32 bytes in both passes — on a path the
    roofline shows 85-94% HBM-bound, that is the dominant stream in the
    forward AND in the backward's dW_k/dW_v re-read."""
    # differentiable=training: the training primal uses the vjp forward's
    # streamed boundary so Bernoulli draws are identical whether or not
    # the call is differentiated (see _shared_core); eval keeps the
    # resident int8 kernel below the cap (no RNG consumed).
    outs, _ = _q8_dispatch(
        params, qrow, kv_q8, kv_scales, seed, mask_prob, key_padding_mask,
        num_heads, min_active, training, precision, interpret,
        differentiable=training,
    )
    return outs


def _shared_q8_fwd(
    params, qrow, kv_q8, kv_scales, seed, mask_prob, key_padding_mask,
    num_heads, min_active, training, precision, interpret,
):
    outs, mix = _q8_dispatch(
        params, qrow, kv_q8, kv_scales, seed, mask_prob, key_padding_mask,
        num_heads, min_active, training, precision, interpret,
        differentiable=True,
    )
    # outs[1] (head-averaged weights) rides along for the entropy
    # cotangent fold, exactly like _shared_fwd.
    return outs, (
        params, qrow, kv_q8, kv_scales, key_padding_mask, outs[1], mix
    )


def _shared_q8_bwd(
    num_heads, min_active, training, precision, interpret,
    residuals, cots,
):
    """q8 backward: same dispatch shape as _shared_bwd with kv_grad
    pinned False — Pallas kernels re-read kv as int8 (quarter bytes);
    the resident H > 1 fallback dequantizes in XLA, where the dequant
    fuses into the einsum consumers so HBM still sees int8 reads."""
    import os

    (params, qrow, kv_q8, kv_scales, key_padding_mask,
     w_res, mix_res) = residuals
    d_out, d_w, _d_mw, d_ent, _d_rate = cots
    d_w = _fold_entropy_cotangent(d_w, d_ent, w_res, kv_q8.shape[1])
    cots = (d_out, d_w, _d_mw, None, _d_rate)
    res4 = (params, qrow, kv_q8, key_padding_mask)

    override = os.environ.get("AECF_SHARED_BWD", "auto")
    if override != "xla" and mix_res is not None:
        if num_heads == 1:
            d_params, d_qrow, *_ = _bwd_streamed(
                res4, cots, mix_res, precision=precision,
                interpret=interpret, want_dkv=False, kv_scales=kv_scales,
            )
        else:
            d_params, d_qrow, *_ = _bwd_streamed_mh(
                res4, cots, mix_res, num_heads=num_heads,
                precision=precision, interpret=interpret,
                want_dkv=False, kv_scales=kv_scales,
            )
    elif (
        override != "xla"
        and num_heads == 1
        and (interpret or jax.default_backend() == "tpu")
    ):
        d_params, d_qrow, *_ = _bwd_pallas(
            res4, cots, precision=precision, interpret=interpret,
            want_dkv=False, kv_scales=kv_scales,
        )
    else:
        kv = kv_q8.astype(jnp.float32) * kv_scales[:, :, None]
        with jax.default_matmul_precision(_ctx_prec(precision)):
            d_params, d_qrow, *_ = _shared_bwd_impl(
                num_heads, (params, qrow, kv, key_padding_mask), cots,
                kv_grad=False,
            )
    # int8 kv and its scales are non-differentiable inputs: None
    # cotangents (like seed/mask_prob), never a fake d_kv.
    return d_params, d_qrow, None, None, None, None, None


_shared_core_q8.defvjp(_shared_q8_fwd, _shared_q8_bwd)


def fused_fusion_pool_shared(
    params: AttentionPoolParams,
    query: jax.Array,  # (1, 1, E) — the unexpanded fusion query
    kv: jax.Array,  # (B, M, E)
    *,
    num_heads: int = 1,
    rng: Optional[jax.Array] = None,
    training: bool = False,
    base_mask_prob: jax.typing.ArrayLike = 0.15,
    entropy_target: jax.typing.ArrayLike = 0.7,
    min_active: int = 1,
    key_padding_mask: Optional[jax.Array] = None,
    precision: str = "default",
    kv_scales: Optional[jax.Array] = None,
    kv_grad: bool = True,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array, Dict[str, jax.Array]]:
    """Fused fusion pool for a batch-shared query.

    Same return contract as :func:`fused_fusion_pool` — ``(out (B,1,E),
    weights (B,1,M), masked (B,1,M), info)``.  ``query`` must be the
    *unexpanded* ``(1, 1, E)`` fusion-query parameter; its gradient comes
    back in that shape (sum over the batch), exactly what broadcasting
    would produce.

    ``precision``: "default" (bf16 MXU passes on the context GEMM — fastest;
    weights/entropy are f32-exact either way) or "highest" (full f32 MXU,
    output parity ~1e-6 with the fp32 oracle).

    Quantized path: pass ``kv`` as int8 with ``kv_scales (B, M)`` (see
    :func:`quantize_features`) — quarters the kv HBM traffic at the
    memory-bound shapes, serving AND training.  int8 features are frozen
    by construction (the reference's own protocol trains the pool on
    pre-extracted CLIP features): gradients flow to ``params`` and
    ``query``, never to ``kv``, and the backward re-reads the kv stream
    as int8 too.  Storage quantization changes numerics (~1e-2 relative
    on outputs) — opt-in, like bf16 features.

    ``kv_grad=False`` declares that the caller never differentiates w.r.t.
    ``kv`` (frozen/pre-extracted features — the reference's own training
    protocol feeds CLIP features straight into the pool).  The fused
    Pallas backward then skips computing AND writing the ``(B, M, E)``
    d_kv cotangent — a third of the backward's HBM traffic at the
    memory-bound shapes — and returns zeros for it.  Do not set this when
    trainable encoders feed the pool.
    """
    if query.shape[:2] != (1, 1):
        raise ValueError(
            f"shared-query kernel expects query (1, 1, E), got {query.shape}"
        )
    if precision not in ("default", "highest"):
        # The kernels implement exactly these two modes; accepting e.g.
        # "high" here would silently run "default" while the XLA dispatch
        # honors it (the nn/ops gates route "high" to XLA for this reason).
        raise ValueError(
            f"fused kernels support precision 'default' or 'highest', got "
            f"{precision!r} — use the XLA path for other modes"
        )
    M = kv.shape[1]
    E = kv.shape[-1]
    # Capability caps, for EVERY kv dtype (the int8 path used to be the
    # only one that failed cleanly; f32/bf16 would sail into an opaque
    # Mosaic scoped-vmem error instead):
    if E > _STREAMED_E_CAP:
        raise ValueError(
            f"embed_dim {E} exceeds the streamed-split cap "
            f"E={_STREAMED_E_CAP} (the kv tile floors at the (8, 128) "
            "sublane tile); use the XLA path"
        )
    if E > _RESIDENT_E_CAP and num_heads > 2:
        # Above the resident cap only the streamed split (H ≤ 2) avoids
        # keeping an (E, E) context block resident in VMEM.
        raise ValueError(
            f"E={E} above the resident cap E={_RESIDENT_E_CAP} needs "
            "num_heads<=2 (the streamed split); use the XLA path for "
            "H > 2"
        )
    # M<=1 masking is an early-return no-op (reference AECFLayer.py:160-167),
    # so no randomness is consumed and no key is required.
    if training and rng is None and M > 1:
        raise ValueError(
            "fused_fusion_pool_shared(training=True) needs an `rng=` key"
        )
    seed = _draw_seed_words(rng)

    if kv.dtype == jnp.int8:
        if kv_scales is None:
            raise ValueError(
                "int8 kv requires kv_scales (see quantize_features)"
            )
        # Differentiable core (round 4): gradients flow to params and the
        # query; the int8 features themselves are frozen by construction
        # (kv_grad is implicitly False — the backward re-reads kv as int8
        # and never materializes a d_kv).
        out, w, mw, ent, rate = _shared_core_q8(
            params,
            query[0, 0, :],
            kv,
            kv_scales,
            seed,
            jnp.asarray(base_mask_prob, jnp.float32),
            key_padding_mask,
            num_heads,
            min_active,
            training,
            precision,
            interpret,
        )
        return _package_outputs(
            out, w, mw, ent, rate, training=training, M=M,
            entropy_target=entropy_target,
        )

    if kv_scales is not None:
        # int8 without scales raises above; make the inverse misuse loud
        # too instead of silently serving the unquantized path.
        raise ValueError(
            f"kv_scales passed with {kv.dtype} kv — quantized serving "
            "needs int8 features (see quantize_features)"
        )
    out, w, mw, ent, rate = _shared_core(
        params,
        query[0, 0, :],
        kv if kv_grad else lax.stop_gradient(kv),
        seed,
        jnp.asarray(base_mask_prob, jnp.float32),
        key_padding_mask,
        num_heads,
        min_active,
        training,
        precision,
        interpret,
        kv_grad,
    )

    return _package_outputs(
        out, w, mw, ent, rate, training=training, M=M,
        entropy_target=entropy_target,
    )


def _package_outputs(out, w, mw, ent, rate, *, training, M, entropy_target):
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
        info = {"entropy": zeros, "mask_rate": zeros, "target_entropy": zeros}
    else:
        info = {"entropy": ent[:, None], "mask_rate": mask_rate}
    return out[:, None, :], weights, masked, info
