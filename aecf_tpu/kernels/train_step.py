"""One-pass fused TRAIN STEP for the H == 1 shared-query fusion pool.

The two-pass training step (forward kernel + custom_vjp backward kernel)
reads the ``(B, M, E)`` feature stream TWICE and round-trips the pooled
output and its cotangent through HBM between the kernels.  On the
memory-bound benchmark shapes (BASELINE.md north star: B=4096, M=3,
E=512) those streams are most of the step's mandatory traffic:

    two-pass:   kv read ×2 (50MB) + out write/read (17MB) + glue ≈ 84MB
    fused step: kv read ×1 (25MB)                         + glue ≈ 40MB

This is possible because of the reference's own semantics (SURVEY §2.5):

  * **Q1** — curriculum masking never touches the output; the pooled
    output flows through the UNMASKED attention weights
    (AECFLayer.py:526-541), so the backward needs no mask and no RNG.
  * **Q2** — ``info['entropy']`` is detached in training
    (AECFLayer.py:277-281), so the entropy regularizer contributes no
    gradient.

Hence for any ROW-LOCAL loss on the pooled output — one whose value and
``d_out`` for a row depend only on that row, e.g. the benchmark protocol's
``(out²).mean()`` or a frozen-head BCE — the entire step collapses into
ONE pass over each kv tile:

    scores → softmax → entropy → Bernoulli/min_active chain (side outputs)
    mix → out GEMM → in-register loss + analytic d_out
    d_mix GEMM → softmax backward → G/du/dΣ accumulators [→ d_kv]

with the same whole-block accumulators as the two-pass backward
(``_bwd_kernel``); the tiny E×E weight-gradient reconstruction stays in
XLA (``_g_epilogue`` / ``_query_path_grads``).

This function computes gradients DIRECTLY (it is not meant to be
differentiated); weights/entropy/mask info are returned as values, as the
detached reference contract prescribes.  Losses that need gradients
through the attention weights or the (eval-mode) entropy must use the
two-pass path.  Draws come from the same hashed (seed, tile) PRNG scheme
as the forward kernel — with equal batch tiles (``AECF_STEP_TB`` ==
``AECF_FWD_TB``) the Bernoulli masks are bit-identical to the two-pass
step's.
"""

from __future__ import annotations

import functools
import math
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.attention import AttentionPoolParams
from . import tiles
from .shared_query import (
    _RESIDENT_E_CAP,
    _assemble_d_params,
    _round_up,
    _ctx_prec,
    _dot_prec,
    _draw_seed_words,
    _g_epilogue,
    _kv_tile_slices,
    _pad_bias_rows,
    _pad_rows,
    _pick_tile,
    _query_path_grads,
    _score_uc_1d,
    _split_params,
    _tile_softmax_bwd,
    _weights_entropy_mask,
)

__all__ = [
    "fused_pool_train_step",
    "fused_pool_head_train_step",
    "supports_fused_step",
    "step_tile",
]


def supports_fused_step(num_heads: int, embed_dim: int) -> bool:
    """True when :func:`fused_pool_train_step` covers the config: the
    H == 1 resident-weight kernel (one (E, E) context block in VMEM)."""
    return num_heads == 1 and embed_dim <= _RESIDENT_E_CAP


def step_tile(
    batch: int,
    modalities: int,
    embed: int,
    *,
    kv_dtype: str = "float32",
    kv_grad: bool = False,
) -> int:
    """The batch tile :func:`fused_pool_train_step` will use for this
    config — env override > tile table > swept default (same resolution
    as every launch site).  Public so staged-batch callers can check
    ``batch % step_tile(...) == 0`` before choosing the staged path.

    Defaults were swept on-chip (K=2000 windows,
    docs/artifacts/sweep_step_tb_*.json): TB=256 wins at BOTH E=512
    (unanimous vs 128/192/384/512) and E=1024 (6/7 paired windows,
    +4.8% over the old 128) for the no-d_kv step.  With the d_kv tile
    ALSO resident the VMEM limit drops (measured: TB=256+d_kv at E=512
    exceeds the 16MB scoped budget by ~0.7MB), so kv_grad defaults sit
    one/two notches lower."""
    site = tiles.site_key(
        "step_resident", M=modalities, E=embed, H=1, kv_dtype=kv_dtype,
        want_dkv=kv_grad,
    )
    if kv_grad:
        default_tb = 128 if embed <= 512 else 64
    else:
        default_tb = 256
    return _pick_tile(default_tb, "AECF_STEP_TB", batch, site=site)


def _step_kernel(
    seed_ref, mask_prob_ref,
    off_ref,  # (1,) tile offset (staged-batch addressing; index maps
    #           consume it — unused in the body: PRNG folds and row
    #           validity are per-step-local by design)
    kv_ref,  # (TB, M*E) — flattened, lane-sliced (see _shared_kernel doc)
    *refs,  # [scales_ref when quantized] + u, c, pad, wvo, bctx
    #         + [whead, bhead when with_head] + extra tiles
    #         + w/mw/ent/rate tiles + [dkv tile] + g/du/dvec accumulators
    #         + [dwh/dbh accumulators when with_head]
    min_active: int,
    training: bool,
    seq_len: int,
    mxu_precision,
    b_real: int,
    tb: int,
    row_loss: Callable,
    n_extras: int,
    want_dkv: bool,
    quantized: bool,
    with_head: bool,
):
    if quantized:
        scales_ref, *refs = refs
    else:
        scales_ref = None
    u_ref, c_ref, pad_ref, wvo_ref, bctx_ref = refs[:5]
    refs = refs[5:]
    if with_head:
        whead_ref, bhead_ref, *refs = refs
    extra_refs = refs[:n_extras]
    out_refs = refs[n_extras:]
    w_ref, mw_ref, ent_ref, rate_ref = out_refs[:4]
    out_refs = out_refs[4:]
    if want_dkv:
        dkv_ref, *out_refs = out_refs
    else:
        dkv_ref = None
    g_ref, du_ref, dvec_ref = out_refs[:3]
    if with_head:
        dwh_ref, dbh_ref = out_refs[3:]
    TB, M = pad_ref.shape
    E = kv_ref.shape[1] // M
    f32 = jnp.float32
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        g_ref[:] = jnp.zeros((E, E), f32)
        du_ref[:] = jnp.zeros((1, E), f32)
        dvec_ref[:] = jnp.zeros((3, E), f32)
        if with_head:
            dwh_ref[:] = jnp.zeros(dwh_ref.shape, f32)
            dbh_ref[:] = jnp.zeros(dbh_ref.shape, f32)

    kv_slices = _kv_tile_slices(kv_ref, scales_ref, M, E)

    # ---- forward: scores → softmax → entropy → mask chain (side outputs)
    heads = _weights_entropy_mask(
        kv_slices, seed_ref, mask_prob_ref, u_ref, c_ref, pad_ref,
        w_ref, mw_ref, ent_ref, rate_ref,
        num_heads=1, min_active=min_active, training=training,
        seq_len=seq_len,
    )
    a = heads[0]  # (TB, M) unmasked softmax weights (quirk Q1)
    mix = a[:, 0:1] * kv_slices[0]
    for m in range(1, M):
        mix = mix + a[:, m : m + 1] * kv_slices[m]
    out = (
        jnp.dot(
            mix, wvo_ref[:].T,
            preferred_element_type=f32, precision=mxu_precision,
        )
        + bctx_ref[0, :]
    )  # (TB, E)

    # ---- in-register row-local loss + analytic d_out --------------------
    # Zero-padded batch rows are NOT inert here (their softmax is uniform
    # and out == bctx), so both the loss contribution and d_out must be
    # masked to the real batch; everything downstream of d_out then
    # vanishes for padded rows exactly as in the two-pass backward.
    rowi = i * tb + lax.broadcasted_iota(jnp.int32, (TB, 1), 0)
    valid = rowi < b_real
    extras = [er[:] for er in extra_refs]
    if with_head:
        # Trainable linear head INSIDE the single kv pass: logits =
        # out @ W_head + b_head, row-local loss on logits (default: BCE —
        # the reference X3 protocol, train_xrays_example.py:372-377),
        # d_out = d_logits @ W_headᵀ in-register, and the head's own
        # weight gradient accumulated per tile like the G accumulator.
        logits = (
            jnp.dot(
                out, whead_ref[:],
                preferred_element_type=f32, precision=mxu_precision,
            )
            + bhead_ref[0, :]
        )  # (TB, Cp)
        loss_rows, d_logits = row_loss(logits, *extras)
        # padded-row d_logits must vanish BEFORE the head GEMMs: padded
        # rows have out == bctx (nonzero), so dwh would pick them up.
        d_logits = jnp.where(valid, d_logits, 0.0)
        loss_contrib = jnp.where(valid, loss_rows, 0.0).sum()
        d_out = jnp.dot(
            d_logits, whead_ref[:].T,
            preferred_element_type=f32, precision=mxu_precision,
        )  # (TB, E)
        dwh_ref[:] += lax.dot_general(
            out, d_logits,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=f32,
            precision=mxu_precision,
        )  # (E, Cp) += outᵀ @ d_logits
        dbh_ref[:] += d_logits.sum(axis=0, keepdims=True)
    else:
        loss_rows, d_out = row_loss(out, *extras)  # (TB, 1), (TB, E)
        d_out = jnp.where(valid, d_out, 0.0)
        loss_contrib = jnp.where(valid, loss_rows, 0.0).sum()

    # ---- backward: same per-tile GEMMs/accumulators as _bwd_kernel ------
    d_mix = jnp.dot(
        d_out, wvo_ref[:],
        preferred_element_type=f32, precision=mxu_precision,
    )
    # a is in-register from the forward above — no score recompute.
    # d_w is zero by the Q1/Q2 contract (losses on `out` only).
    _, d_s, du_acc, dkv_terms = _tile_softmax_bwd(
        kv_slices, u_ref[0, :], pad_ref[:], d_mix,
        jnp.zeros((TB, M), f32), want_dkv=want_dkv, a=a,
    )
    g_ref[:] += lax.dot_general(
        d_out, mix,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=f32,
        precision=mxu_precision,
    )
    if want_dkv:
        for m in range(M):
            dkv_ref[:, m * E : (m + 1) * E] = dkv_terms[m].astype(
                dkv_ref.dtype
            )
    du_ref[:] += du_acc
    # Row 0 ← Σ_b d_out; row 1, col 0 ← Σ d_s; row 2, col 0 ← Σ row loss.
    # Broadcast-select (Mosaic cannot concat offset-mismatched vectors).
    row3 = lax.broadcasted_iota(jnp.int32, (3, E), 0)
    colE = lax.broadcasted_iota(jnp.int32, (3, E), 1)
    dvec_ref[:] += jnp.where(
        row3 == 0,
        d_out.sum(axis=0, keepdims=True),
        jnp.where(
            (row3 == 1) & (colE == 0),
            d_s.sum(),
            jnp.where((row3 == 2) & (colE == 0), loss_contrib, 0.0),
        ),
    )


def fused_pool_train_step(
    params: AttentionPoolParams,
    query: jax.Array,  # (1, 1, E) — the unexpanded fusion query
    kv: jax.Array,  # (B, M, E) f32 / bf16 / int8 (with kv_scales)
    *,
    rng: Optional[jax.Array],
    training: bool = True,
    base_mask_prob: jax.typing.ArrayLike = 0.15,
    entropy_target: jax.typing.ArrayLike = 0.7,
    min_active: int = 1,
    key_padding_mask: Optional[jax.Array] = None,
    precision: str = "default",
    kv_grad: bool = False,
    kv_scales: Optional[jax.Array] = None,
    row_loss: Optional[Callable[..., Tuple[jax.Array, jax.Array]]] = None,
    row_extras: Tuple[jax.Array, ...] = (),
    head_w: Optional[jax.Array] = None,
    head_b: Optional[jax.Array] = None,
    labels: Optional[jax.Array] = None,
    loss_scale: float = 1.0,
    row_offset: Optional[jax.typing.ArrayLike] = None,
    batch_rows: Optional[int] = None,
    interpret: bool = False,
) -> Tuple[Any, ...]:
    """One-pass fused training step: loss + gradients in a single kv read.

    Returns ``(loss_pool, d_params, d_query, d_kv, info)``:

    * ``loss_pool`` — scalar Σ over rows of ``row_loss``'s per-row value
      (for the default quadratic loss this IS ``(out²).mean()``).  Add
      detached regularizers (e.g. ``entropy_loss(info['entropy'])``)
      outside; they carry no gradient by the reference contract (Q2).
    * ``d_params`` / ``d_query`` — gradients of ``loss_pool`` w.r.t. the
      pool parameters and the ``(1, 1, E)`` query (batch-summed), equal to
      ``jax.grad`` of the two-pass step to f32 tolerance.
    * ``d_kv`` — feature cotangent when ``kv_grad=True``, else ``None``
      (frozen features, the reference training protocol).
    * ``info`` — the training info contract (``entropy`` / ``mask_rate`` /
      ``target_entropy`` as (B, 1) values, plus ``attention_weights`` and
      ``masked_attention_weights`` (B, 1, M)); all detached values, per
      quirks Q1/Q2.

    ``row_loss(out_tile, *extra_tiles) -> (loss_rows (TB, 1), d_out
    (TB, E))`` must be a row-local traceable function (each row's
    value/gradient depends only on that row).  Python scalars may be
    closed over; TENSORS may not (Pallas kernels take data through refs)
    — per-row tensors such as labels or targets go in ``row_extras``
    (each ``(B, K_i)``), which stream into the kernel tile-aligned with
    ``out`` and arrive as ``(TB, K_i)`` arguments.  ``None`` selects the
    benchmark protocol's quadratic mean ``(out²).mean()``.

    ``head_w`` (E, C) turns on the TRAINABLE LINEAR HEAD inside the same
    single kv pass (the reference X3 protocol: frozen features → pool →
    linear classifier → BCE, train_xrays_example.py:372-377): logits =
    out @ head_w + head_b are formed in-register, the loss acts on the
    LOGITS (default: numerically-stable mean BCE-with-logits against
    ``labels`` (B, C)), and the return gains a head-gradient element:
    ``(loss, d_params, d_query, d_head, d_kv, info)`` with ``d_head =
    {'w': (E, C), 'b': (C,) | None}``.  C is lane-padded to 128 inside
    the kernel; padded columns are masked out of the loss and gradients.
    With ``head_w``, a supplied ``row_loss`` acts on the logits tile
    instead (``(logits (TB, Cp), *extras) -> (loss_rows, d_logits)``) —
    extras then start with the padded labels tile when ``labels`` is
    given.  See :func:`fused_pool_head_train_step` for the product-shaped
    wrapper.

    ``loss_scale`` multiplies the DEFAULT losses' mean normalizer (both
    the quadratic and the BCE head loss) — data-parallel callers pass
    ``1/axis_size`` so that psum'ing the per-shard grads reconstructs the
    global-batch-mean gradient exactly.

    ``row_offset``/``batch_rows`` — STAGED-BATCH ADDRESSING for compiled
    multi-step chunks: ``kv`` (and labels / extras / scales / the padding
    mask) may hold ``S`` steps' batches stacked on axis 0
    (``(S·B, ...)``); the kernel then DMA's its tiles directly from
    ``row_offset`` (a traced multiple of ``batch_rows``) via a
    scalar-prefetch tile offset in the input index maps.  Without this, a
    ``lax.scan`` over staged batches must MATERIALIZE each step's slice
    as a copy (XLA cannot fuse a dynamic-slice into a custom-call
    operand) — measured at ~52µs/step at the north star, ~2/3 of the
    kernel's own time.  Constraints: ``batch_rows`` must divide the
    staged rows and be a multiple of the batch tile (no row padding in
    this mode).  Draws/gradients/info are IDENTICAL to the equivalent
    unstaged call — the tile grid, PRNG folds and row-validity logic are
    all per-step-local.

    ``training=False`` skips the Bernoulli draw entirely (no RNG needed;
    info follows the eval key contract) — the GRADIENTS are identical
    either way because masking never touches the output (Q1); this is how
    the CPU interpreter covers the step's math (the TPU PRNG has no
    interpret lowering), and a deterministic no-curriculum step for
    callers that want one.

    Coverage: H == 1, ``E <= _RESIDENT_E_CAP`` (the resident-weight
    kernel); raise-and-fallback otherwise.  Cites the two-pass pieces it
    fuses: ``_forward`` (shared_query.py) + ``_bwd_kernel`` +
    ``_g_epilogue``/``_query_path_grads``.
    """
    if query.shape[:2] != (1, 1):
        raise ValueError(
            f"shared-query step expects query (1, 1, E), got {query.shape}"
        )
    if kv.ndim == 2:
        # Pre-flattened (B_rows, M*E) — the staged-scan form: callers
        # hoist the reshape OUT of their scan body (a reshape feeding a
        # custom call cannot fuse, so XLA materializes ~the full staged
        # array per step otherwise — measured 853 vs 133 MB/step).
        E = query.shape[-1]
        if kv.shape[1] % E:
            raise ValueError(
                f"2-D kv columns {kv.shape[1]} not a multiple of "
                f"embed dim {E}"
            )
        B_rows, M = kv.shape[0], kv.shape[1] // E
        kv_preflat = True
    else:
        B_rows, M, E = kv.shape  # staged mode: B_rows = S·B stacked steps
        kv_preflat = False
    staged = row_offset is not None
    if staged:
        if batch_rows is None:
            raise ValueError("row_offset requires batch_rows")
        if B_rows % batch_rows:
            raise ValueError(
                f"staged kv rows {B_rows} not a multiple of "
                f"batch_rows={batch_rows}"
            )
        B = batch_rows
    else:
        if batch_rows is not None and batch_rows != B_rows:
            raise ValueError(
                "batch_rows without row_offset must match kv.shape[0]"
            )
        B = B_rows
    if E > _RESIDENT_E_CAP:
        raise ValueError(
            f"fused_pool_train_step covers E <= {_RESIDENT_E_CAP} "
            f"(resident-weight kernel), got E={E}; use the two-pass path"
        )
    if precision not in ("default", "highest"):
        raise ValueError(
            f"fused kernels support precision 'default' or 'highest', got "
            f"{precision!r} — use the XLA path for other modes"
        )
    q8 = kv.dtype == jnp.int8
    if q8:
        if kv_scales is None:
            raise ValueError(
                "int8 kv requires kv_scales (see quantize_features)"
            )
        if kv_grad:
            raise ValueError("int8 features are frozen: kv_grad=False only")
    elif kv_scales is not None:
        raise ValueError(
            f"kv_scales passed with {kv.dtype} kv — the quantized step "
            "needs int8 features (see quantize_features)"
        )
    if training and rng is None and M > 1:
        raise ValueError(
            "fused_pool_train_step(training=True) needs an `rng=` key"
        )
    seed = _draw_seed_words(rng)
    mask_prob = jnp.asarray(base_mask_prob, jnp.float32)

    qrow = query[0, 0, :]
    wq, wk, wv, bq, bk, bv, wo, has_bias = _split_params(params, E)
    prec = _dot_prec(precision)
    qp, u, c, scale = _score_uc_1d(qrow, wq, bq, wk, bk, E, precision)
    bo = (
        params.out_proj_bias
        if params.out_proj_bias is not None
        else jnp.zeros((E,), jnp.float32)
    )
    wvo = jnp.matmul(wo, wv, precision=prec)  # (E, E)
    bctx = (wo @ bv + bo).reshape(1, E)

    with_head = head_w is not None
    if with_head:
        if head_w.ndim != 2 or head_w.shape[0] != E:
            raise ValueError(
                f"head_w must be (E, C) with E={E}, got {head_w.shape}"
            )
        C = head_w.shape[1]
        if head_b is not None and head_b.shape != (C,):
            raise ValueError(
                f"head_b must be ({C},), got {head_b.shape}"
            )
        if labels is None and row_loss is None:
            raise ValueError(
                "head_w without labels needs a custom row_loss on logits"
            )
        Cp_head = _round_up(C, 128)
        if labels is not None and labels.shape not in (
            (B_rows, C), (B_rows, Cp_head),
        ):
            raise ValueError(
                f"labels must be ({B_rows}, {C}) — or ({B_rows}, "
                f"{Cp_head}) pre-lane-padded by a staged caller — got "
                f"{getattr(labels, 'shape', None)}"
            )
        # Lane-pad the class dim: zero-padded W_head/b_head columns give
        # logit 0 there, and the loss masks them (BCE(0, 0) = ln 2 is NOT
        # inert) — gradients at padded columns are exactly zero, sliced
        # off on return.
        Cp = _round_up(C, 128)
        whead_p = jnp.pad(
            head_w.astype(jnp.float32), ((0, 0), (0, Cp - C))
        )
        bhead_row = jnp.pad(
            (
                head_b.astype(jnp.float32)
                if head_b is not None
                else jnp.zeros((C,), jnp.float32)
            ),
            (0, Cp - C),
        ).reshape(1, Cp)
        if labels is not None:
            if labels.shape[1] == Cp:
                # pre-padded by a staged caller (pad hoisted out of its
                # scan — a per-step pad feeding a custom call would
                # materialize the full staged labels every step)
                labels_p = labels.astype(jnp.float32)
            else:
                labels_p = jnp.pad(
                    labels.astype(jnp.float32), ((0, 0), (0, Cp - C))
                )
            row_extras = (labels_p,) + tuple(row_extras)
        if row_loss is None:
            inv = loss_scale / (B * C)

            def row_loss(logits, y):  # stable mean BCE-with-logits
                colv = (
                    lax.broadcasted_iota(jnp.int32, logits.shape, 1) < C
                )
                bce = (
                    jnp.maximum(logits, 0.0)
                    - logits * y
                    + jnp.log1p(jnp.exp(-jnp.abs(logits)))
                )
                loss_rows = jnp.where(colv, bce, 0.0).sum(
                    axis=-1, keepdims=True
                ) * inv
                d_logits = jnp.where(
                    colv, (jax.nn.sigmoid(logits) - y) * inv, 0.0
                )
                return loss_rows, d_logits

    elif row_loss is None:
        inv = loss_scale / (B * E)
        row_loss = lambda out: (  # noqa: E731 — the protocol quadratic
            (out * out).sum(axis=-1, keepdims=True) * inv,
            out * (2.0 * inv),
        )

    for i, ex in enumerate(row_extras):
        if ex.ndim != 2 or ex.shape[0] != B_rows:
            raise ValueError(
                f"row_extras[{i}] must be ({B_rows}, K), got {ex.shape}"
            )
    # Synthesized zero pad-bias stays PER-STEP sized with a local tile
    # map even in staged mode (a staged-size zeros operand would be
    # materialized per scan step); only a real staged padding mask needs
    # the offset map.
    pad_staged = staged and key_padding_mask is not None
    pad_bias = _pad_bias_rows(
        key_padding_mask, B_rows if pad_staged else B, M
    )
    TB = step_tile(
        B, M, E, kv_dtype=kv.dtype.name, kv_grad=kv_grad
    )
    if staged:
        # No row padding in staged mode — tiles address the stacked
        # array directly, so the per-step batch must tile evenly.
        if B % TB:
            raise ValueError(
                f"staged step needs batch_rows={B} divisible by the "
                f"batch tile {TB} (override with AECF_STEP_TB or use "
                "the unstaged per-step call)"
            )
        B_pad = B
        kv_flat = kv if kv_preflat else kv.reshape(B_rows, M * E)
        tile_off = (
            jnp.asarray(row_offset, jnp.int32).reshape(1) // TB
        )
    else:
        B_pad, kv_flat, pad_bias, *opt = _pad_rows(
            B, TB, kv if kv_preflat else kv.reshape(B, M * E), pad_bias,
            *([kv_scales] if q8 else []),
            *row_extras,
        )
        if q8:
            kv_scales, *opt = opt
        row_extras = tuple(opt)
        tile_off = jnp.zeros((1,), jnp.int32)

    kernel = functools.partial(
        _step_kernel,
        min_active=min_active,
        training=training,
        seq_len=M,
        mxu_precision=prec,
        b_real=B,
        tb=TB,
        row_loss=row_loss,
        n_extras=len(row_extras),
        want_dkv=kv_grad,
        quantized=q8,
        with_head=with_head,
    )
    # Input tiles DMA from the (possibly offset) position in the staged
    # array — the third prefetch scalar is the tile offset (zero when
    # unstaged); output tiles are always per-step local.
    tile = lambda i, seed, mp, off: (off[0] + i, 0)  # noqa: E731
    out_tile = lambda i, *_: (i, 0)  # noqa: E731
    whole = lambda i, *_: (0, 0)  # noqa: E731
    f32 = jnp.float32
    scales_specs = (
        [pl.BlockSpec((TB, M), tile, memory_space=pltpu.VMEM)] if q8 else []
    )
    dkv_specs = (
        [pl.BlockSpec((TB, M * E), out_tile, memory_space=pltpu.VMEM)]
        if kv_grad else []
    )
    dkv_shapes = (
        [jax.ShapeDtypeStruct((B_pad, M * E), kv.dtype)] if kv_grad else []
    )
    head_in_specs = (
        [
            pl.BlockSpec((E, Cp), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Cp), whole, memory_space=pltpu.VMEM),
        ]
        if with_head else []
    )
    head_out_specs = (
        [
            pl.BlockSpec((E, Cp), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Cp), whole, memory_space=pltpu.VMEM),
        ]
        if with_head else []
    )
    head_out_shapes = (
        [
            jax.ShapeDtypeStruct((E, Cp), f32),
            jax.ShapeDtypeStruct((1, Cp), f32),
        ]
        if with_head else []
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B_pad // TB,),
        in_specs=[
            pl.BlockSpec((TB, M * E), tile, memory_space=pltpu.VMEM),
        ] + scales_specs + [
            pl.BlockSpec((1, E), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (TB, M), tile if pad_staged else out_tile,
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((E, E), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, E), whole, memory_space=pltpu.VMEM),
        ] + head_in_specs + [
            pl.BlockSpec((TB, ex.shape[1]), tile, memory_space=pltpu.VMEM)
            for ex in row_extras
        ],
        out_specs=[
            pl.BlockSpec((TB, M), out_tile, memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, M), out_tile, memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, 1), out_tile, memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, 1), out_tile, memory_space=pltpu.VMEM),
        ] + dkv_specs + [
            pl.BlockSpec((E, E), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, E), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec((3, E), whole, memory_space=pltpu.VMEM),
        ] + head_out_specs,
    )
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=tuple(
            [
                jax.ShapeDtypeStruct((B_pad, M), f32),
                jax.ShapeDtypeStruct((B_pad, M), f32),
                jax.ShapeDtypeStruct((B_pad, 1), f32),
                jax.ShapeDtypeStruct((B_pad, 1), f32),
            ]
            + dkv_shapes
            + [
                jax.ShapeDtypeStruct((E, E), f32),
                jax.ShapeDtypeStruct((1, E), f32),
                jax.ShapeDtypeStruct((3, E), f32),
            ]
            + head_out_shapes
        ),
        cost_estimate=pl.CostEstimate(
            # fwd GEMM + d_mix GEMM + G GEMM, plus the VPU chains
            # (+ logits/d_out/dwh GEMMs and the label stream when a head
            # is fused in)
            flops=(
                6 * B_pad * E * E + 24 * B_pad * M * E
                + (6 * B_pad * E * Cp if with_head else 0)
            ),
            bytes_accessed=(
                (2 if kv_grad else 1) * B_pad * M * E * kv.dtype.itemsize
                + 4 * (2 * B_pad * M + 2 * B_pad + 3 * E * E)
                + (4 * (B_pad * Cp + 3 * E * Cp) if with_head else 0)
            ),
            transcendentals=B_pad * M * 2 + (B_pad * (Cp if with_head else 0)),
        ),
        interpret=interpret,
    )(
        seed.reshape(2).astype(jnp.int32),
        mask_prob.reshape(1),
        tile_off,
        kv_flat,
        *([kv_scales] if q8 else []),
        u.reshape(1, E),
        c.reshape(1, 1),
        pad_bias,
        wvo,
        bctx,
        *([whead_p, bhead_row] if with_head else []),
        *row_extras,
    )
    w, mw, ent, rate = outs[:4]
    outs = outs[4:]
    if kv_grad:
        d_kv, *outs = outs
        d_kv = d_kv[:B].reshape(B, M, E).astype(kv.dtype)
    else:
        d_kv = None
    G, du, dvec = outs[:3]
    if with_head:
        d_head = {
            "w": outs[3][:, :C],
            "b": outs[4][0, :C] if head_b is not None else None,
        }
    du = du[0]
    dsum_out = dvec[0]
    dc = dvec[1, 0]
    loss_pool = dvec[2, 0]

    # ---- weight grads from the fused accumulators (same as _bwd_pallas) --
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
    d_query = d_qrow.reshape(1, 1, E)

    ent = ent[:B]
    rate = rate[:B]
    if training and M > 1:
        info: Dict[str, Any] = {
            "entropy": ent,
            "mask_rate": rate,
            "target_entropy": jnp.full_like(
                ent, math.log(M) * jnp.asarray(entropy_target, jnp.float32)
            ),
        }
    elif training:
        zeros = jnp.zeros_like(ent)
        info = {
            "entropy": zeros,
            "mask_rate": zeros,
            "target_entropy": zeros,
        }
    else:
        # Eval key contract (reference AECFLayer.py:150-156): no
        # target_entropy; mask_rate zeros (no draw happened).
        info = {"entropy": ent, "mask_rate": rate}
    info["attention_weights"] = w[:B, None, :]
    info["masked_attention_weights"] = mw[:B, None, :]
    if with_head:
        return loss_pool, d_params, d_query, d_head, d_kv, info
    return loss_pool, d_params, d_query, d_kv, info


def fused_pool_head_train_step(
    params: AttentionPoolParams,
    query: jax.Array,
    head: Dict[str, Optional[jax.Array]],
    kv: jax.Array,
    labels: jax.Array,
    **kwargs,
) -> Tuple[jax.Array, Dict[str, Any], Optional[jax.Array], Dict[str, Any]]:
    """Product-shaped wrapper of the one-pass step with a trainable head.

    ``head = {'w': (E, C), 'b': (C,) | None}`` — the linear classifier of
    the reference X3 protocol (frozen features → pool → head → BCE,
    train_xrays_example.py:372-377).  Returns ``(loss, grads, d_kv,
    info)`` where ``grads = {'pool': AttentionPoolParams cotangent,
    'query': (1, 1, E), 'head': {'w', 'b'}}`` — a pytree aligned with the
    ``{'pool', 'query', 'head'}`` parameter dict the train-step builders
    use, ready for ``optimizer.update``.  All of
    :func:`fused_pool_train_step`'s keyword options pass through
    (``head_loss=`` may come in as ``row_loss`` acting on logits).
    """
    loss, d_params, d_query, d_head, d_kv, info = fused_pool_train_step(
        params, query, kv,
        head_w=head["w"], head_b=head.get("b"), labels=labels, **kwargs,
    )
    if head.get("b") is None:
        d_head = {"w": d_head["w"]}
    grads = {"pool": d_params, "query": d_query, "head": d_head}
    return loss, grads, d_kv, info
