"""Pool-protocol train-step builders: the product path to the one-pass
fused train-step kernel.

The reference's headline training protocol (X3, SURVEY §2.2;
train_xrays_example.py:372-377) is frozen pre-extracted features →
fusion pool → linear classifier → BCE.  For H == 1 resident configs that
whole step collapses into ONE pass over the features
(:func:`aecf_tpu.kernels.fused_pool_train_step` — measured 1.55× the
two-pass kernels at the north star, benchmarks/step_ab.py); these
builders make that kernel the path a LIBRARY user's training actually
runs, not just the bench's:

* :func:`make_pool_train_step` — jitted ``(state, kv, labels, rng) ->
  (state, loss, info)``; dispatches to the one-pass kernel when the
  config qualifies, else autodiffs through :func:`aecf_tpu.ops.fusion_pool`
  (which itself picks the two-pass kernels or XLA).  Both paths run the
  identical protocol and produce the same parameter trajectory to f32
  tolerance (tests/test_pool_step.py pins 12-step AdamW lockstep).
* :func:`make_pool_scan_train_step` — the K-steps-per-dispatch chunk
  form (one host sync per K updates; see
  :func:`aecf_tpu.train.make_scan_train_step` for the discipline).
* ``mesh=`` on either builder turns it data-parallel: the batch shards
  over ``axis_name``, the kernel computes per-shard grads of the
  globally-scaled loss (``loss_scale=1/axis_size``), and one ``psum``
  reconstructs the exact global-batch-mean gradient — the direct-grad
  mirror of :func:`aecf_tpu.parallel.make_dp_train_step`'s autodiff
  contract.
* :func:`as_fit_step` / :func:`as_fit_chunk` — adapters to
  :func:`aecf_tpu.train.fit`'s ``(state, images, texts, labels, rng)``
  batch protocol (two feature streams stack into the (B, 2, E) kv).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax

from ..core.init import init_attention_pool_params, init_fusion_query
from ..core.masking import entropy_loss
from ..kernels import (
    fused_pool_head_train_step,
    fused_pool_train_step,
    step_tile,
    supports_fused_step,
)
from .trainer import TrainState

__all__ = [
    "init_pool_classifier_params",
    "make_pool_train_step",
    "make_pool_scan_train_step",
    "as_fit_step",
    "as_fit_chunk",
]


def init_pool_classifier_params(
    key: jax.Array,
    embed_dim: int,
    num_classes: Optional[int] = None,
    *,
    bias: bool = True,
    head_bias: bool = True,
) -> Dict[str, Any]:
    """``{'pool', 'query'[, 'head']}`` parameter pytree for the pool
    protocol — the shape every builder in this module trains.

    The head follows torch ``nn.Linear`` default init (uniform
    ``±1/√E``), matching the reference X3 classifier
    (train_xrays_example.py:372-377); ``num_classes=None`` omits it
    (pool-only training, the benchmark protocol)."""
    kp, kq, kw, kb = jax.random.split(key, 4)
    params: Dict[str, Any] = {
        "pool": init_attention_pool_params(kp, embed_dim, bias=bias),
        "query": init_fusion_query(kq, embed_dim),
    }
    if num_classes is not None:
        bound = 1.0 / math.sqrt(embed_dim)
        head: Dict[str, jax.Array] = {
            "w": jax.random.uniform(
                kw, (embed_dim, num_classes), jnp.float32, -bound, bound
            )
        }
        if head_bias:
            head["b"] = jax.random.uniform(
                kb, (num_classes,), jnp.float32, -bound, bound
            )
        params["head"] = head
    return params


def _validate_impl(impl):
    if impl not in ("auto", "fused-step", "pallas", "xla"):
        raise ValueError(
            f"unknown impl {impl!r} (expected 'auto', 'fused-step', "
            "'pallas', or 'xla')"
        )


def _resolve_impl(impl, num_heads, embed_dim, interpret):
    if impl == "auto":
        if supports_fused_step(num_heads, embed_dim) and (
            jax.default_backend() == "tpu" or interpret
        ):
            return "fused-step"
        return "auto"  # let ops.fusion_pool dispatch per its own gates
    return impl


def _make_local_step(
    *,
    num_heads,
    impl,
    precision,
    base_mask_prob,
    entropy_target,
    min_active,
    entropy_coeff,
    training,
    interpret,
):
    """``(params, kv, labels, rng, loss_scale) -> (loss, info, grads)``
    — the impl-dispatched core shared by every builder/wrapper here.
    ``loss_scale`` scales the mean-loss normalizer (DP shards pass
    ``1/axis_size`` and psum)."""

    def local_step(params, kv, labels, rng, loss_scale,
                   row_offset=None, batch_rows=None):
        # E comes from the query param: kv may arrive PACKED 2-D
        # ((S·B, M·E), the staged-scan form) where shape[-1] is M·E
        E = params["query"].shape[-1]
        if kv.ndim == 2:
            M = kv.shape[1] // E
        else:
            M = kv.shape[1]
        use = _resolve_impl(impl, num_heads, E, interpret)
        head = params.get("head")
        if kv.ndim == 2 and use != "fused-step":
            raise ValueError(
                "packed 2-D kv (staged-scan form) requires the "
                "fused-step path; pass (B, M, E) for other impls"
            )
        if use == "fused-step":
            if num_heads != 1:
                raise ValueError(
                    "impl='fused-step' covers num_heads=1 only"
                )
            if interpret and training and M > 1:
                raise ValueError(
                    "the fused step's TPU PRNG has no interpret "
                    "lowering; build with training=False for hermetic "
                    "CPU runs (gradients are identical — quirk Q1)"
                )
            kwargs = dict(
                rng=rng,
                training=training,
                base_mask_prob=base_mask_prob,
                entropy_target=entropy_target,
                min_active=min_active,
                precision=precision,
                kv_grad=False,
                loss_scale=loss_scale,
                row_offset=row_offset,
                batch_rows=batch_rows,
                interpret=interpret,
            )
            if head is not None:
                loss, grads, _, info = fused_pool_head_train_step(
                    params["pool"], params["query"], head, kv, labels,
                    **kwargs,
                )
            else:
                loss, d_pool, d_query, _, info = fused_pool_train_step(
                    params["pool"], params["query"], kv, **kwargs
                )
                grads = {"pool": d_pool, "query": d_query}
            if entropy_coeff and "entropy" in info:
                # Detached VALUE by the reference contract (quirk Q2):
                # training entropy carries no gradient, so adding it
                # outside the kernel yields exactly the autodiff path's
                # update.
                loss = loss + entropy_coeff * loss_scale * entropy_loss(
                    info["entropy"], seq_len=M
                )
            return loss, info, grads

        from ..ops import fusion_pool

        def loss_fn(p):
            out, w, mw, info = fusion_pool(
                p["pool"], p["query"], kv,
                num_heads=num_heads,
                rng=rng,
                training=training,
                base_mask_prob=base_mask_prob,
                entropy_target=entropy_target,
                min_active=min_active,
                implementation="auto" if use == "auto" else use,
                precision=precision,
                kv_grad=False,
            )
            pooled = out[:, 0, :]
            h = p.get("head")
            if h is not None:
                logits = pooled @ h["w"]
                if h.get("b") is not None:
                    logits = logits + h["b"]
                loss = (
                    optax.sigmoid_binary_cross_entropy(
                        logits, labels
                    ).mean()
                    * loss_scale
                )
            else:
                loss = (pooled * pooled).mean() * loss_scale
            if entropy_coeff and "entropy" in info:
                loss = loss + entropy_coeff * loss_scale * entropy_loss(
                    info["entropy"], seq_len=M
                )
            # match the fused path's info contract (it folds the weights
            # into info; fusion_pool returns them separately)
            info = dict(info)
            info["attention_weights"] = w
            info["masked_attention_weights"] = mw
            return loss, info

        (loss, info), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        return loss, info, grads

    return local_step


def _accumulate(local_step, params, kv, labels, rng, loss_scale,
                accum_steps):
    """Microbatch the local step: scan ``accum_steps`` equal slices,
    mean the loss/grads (equal microbatches of a mean loss == full-batch
    mean).  Each slice folds its index into ``rng`` (i.i.d. draws)."""
    B = kv.shape[0]
    if B % accum_steps:
        raise ValueError(
            f"batch size {B} is not divisible by accum_steps="
            f"{accum_steps}"
        )
    micro = B // accum_steps
    kv_m = kv.reshape((accum_steps, micro) + kv.shape[1:])
    lab_m = (
        labels.reshape((accum_steps, micro) + labels.shape[1:])
        if labels is not None
        else None
    )

    def body(gsum, xs):
        kv_i, lab_i, idx = xs
        loss, info, g = local_step(
            params, kv_i, lab_i, jax.random.fold_in(rng, idx), loss_scale
        )
        return jax.tree.map(jnp.add, gsum, g), (loss, info)

    zeros = jax.tree.map(jnp.zeros_like, params)
    xs = (kv_m, lab_m, jnp.arange(accum_steps))
    gsum, (losses, infos) = jax.lax.scan(body, zeros, xs)
    grads = jax.tree.map(lambda g: g / accum_steps, gsum)
    # microbatches partition the batch in order — flatten per-sample
    # info leaves back to the full-batch layout (see trainer._unstack_info)
    infos = jax.tree.map(
        lambda x: (
            x.reshape((x.shape[0] * x.shape[1],) + tuple(x.shape[2:]))
            if x.ndim >= 2
            else x
        ),
        infos,
    )
    return losses.mean(), infos, grads


def make_pool_train_step(
    optimizer: optax.GradientTransformation,
    *,
    num_heads: int = 1,
    impl: str = "auto",
    precision: str = "highest",
    base_mask_prob: float = 0.15,
    entropy_target: float = 0.7,
    min_active: int = 1,
    entropy_coeff: float = 0.0,
    training: bool = True,
    accum_steps: int = 1,
    donate: bool = True,
    mesh: Optional[Any] = None,
    axis_name: str = "data",
    interpret: bool = False,
) -> Callable:
    """Build a jitted pool-protocol training step ``(state, kv, labels,
    rng) -> (state, loss, info)``.

    ``state.params`` is the :func:`init_pool_classifier_params` pytree:
    with a ``'head'`` the loss is mean BCE-with-logits on the classifier
    (the reference X3 protocol — pass ``labels (B, C)``); without one it
    is the benchmark protocol's quadratic ``(out²).mean()`` (pass
    ``labels=None``).  ``entropy_coeff`` adds the (detached, quirk Q2)
    entropy regularizer VALUE.

    ``impl='auto'`` dispatches qualifying configs (H == 1, resident E,
    TPU) to the ONE-PASS fused train-step kernel — loss, gradients and
    info in a single read of the features — and everything else to
    autodiff through :func:`aecf_tpu.ops.fusion_pool`.  The parameter
    trajectory is impl-independent to f32 tolerance (tested); gradients
    are mask-draw-independent by the reference's own semantics (Q1/Q2).

    ``mesh=`` makes the step data-parallel over ``axis_name``: batch
    arrays shard on axis 0, params/opt-state replicate, and per-shard
    gradients of the ``1/axis_size``-scaled loss are psum'd into the
    exact global-batch-mean update.  ``accum_steps`` microbatches within
    each shard.  ``training=False`` builds the draw-free deterministic
    step (identical gradients — Q1), which is also how the Pallas
    interpreter covers the fused path hermetically on CPU
    (``interpret=True``).
    """
    if accum_steps < 1:
        raise ValueError(f"accum_steps must be >= 1, got {accum_steps}")
    _validate_impl(impl)
    local_step = _make_local_step(
        num_heads=num_heads, impl=impl, precision=precision,
        base_mask_prob=base_mask_prob, entropy_target=entropy_target,
        min_active=min_active, entropy_coeff=entropy_coeff,
        training=training, interpret=interpret,
    )

    def _update(state, loss, info, grads):
        updates, opt_state = optimizer.update(
            grads, state.opt_state, state.params
        )
        params = optax.apply_updates(state.params, updates)
        return (
            TrainState(
                params=params, opt_state=opt_state, step=state.step + 1
            ),
            loss,
            info,
        )

    if mesh is None:

        def step(state, kv, labels, rng):
            if accum_steps == 1:
                loss, info, grads = local_step(
                    state.params, kv, labels, rng, 1.0
                )
            else:
                loss, info, grads = _accumulate(
                    local_step, state.params, kv, labels, rng, 1.0,
                    accum_steps,
                )
            return _update(state, loss, info, grads)

        return jax.jit(step, donate_argnums=(0,) if donate else ())

    from jax.sharding import PartitionSpec as P

    # check_vma=False: (a) pallas_call out_shapes carry no vma
    # annotation, which the checked mode rejects inside shard_map;
    # (b) legacy semantics do NOT auto-psum the replicated-params
    # cotangent, so BOTH the direct-grad kernel path and the autodiff
    # fallback produce per-shard grads of the 1/axis_size-scaled loss
    # and the explicit psum below is the single, uniform reduction.
    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(axis_name), P(axis_name), P()),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    def sharded_step(state, kv, labels, rng):
        axis_size = jax.lax.axis_size(axis_name)
        shard_rng = jax.random.fold_in(
            rng, jax.lax.axis_index(axis_name)
        )
        scale = 1.0 / axis_size
        if accum_steps == 1:
            loss, info, grads = local_step(
                state.params, kv, labels, shard_rng, scale
            )
        else:
            loss, info, grads = _accumulate(
                local_step, state.params, kv, labels, shard_rng, scale,
                accum_steps,
            )
        grads = jax.tree.map(
            lambda g: jax.lax.psum(g, axis_name), grads
        )
        loss = jax.lax.psum(loss, axis_name)
        info = jax.tree.map(
            lambda x: jax.lax.pmean(jnp.mean(x), axis_name), info
        )
        return _update(state, loss, info, grads)

    return jax.jit(
        sharded_step, donate_argnums=(0,) if donate else ()
    )


def make_pool_scan_train_step(
    optimizer: optax.GradientTransformation,
    *,
    mesh: Optional[Any] = None,
    axis_name: str = "data",
    donate: bool = True,
    accum_steps: int = 1,
    **builder_kwargs,
) -> Callable:
    """Multi-step pool-protocol chunk: ``(state, kv, labels, rng) ->
    (state, losses, infos)`` with a leading ``(K, B, ...)`` steps axis —
    K updates per dispatch/host sync (the library form of the
    measurement discipline; see :func:`make_scan_train_step`).

    Step ``i`` consumes ``fold_in(rng, state.step)`` — the GLOBAL
    counter — so chunks chain and checkpoints resume exactly like
    sequential :func:`make_pool_train_step` calls (the
    :func:`aecf_tpu.train.fit` parity contract).  ``infos`` are per-step
    means.  With ``mesh=`` the batch axis (axis 1) shards over
    ``axis_name`` and each step psums as in the single-step builder.

    Batches may be staged PACKED — ``kv (K, B, M·E)`` (modalities
    concatenated on the last axis) — which takes the zero-copy staged
    kernel path: the one-pass kernel DMA's each step's tiles directly
    from the stacked array via an in-kernel offset, instead of the scan
    materializing a per-step slice for the custom call (measured 75 vs
    156 µs/step at the north star; a 4-D ``(K, B, M, E)`` staging is
    ALSO slower because XLA assigns it a sublane-padding-avoiding entry
    layout and copies the whole array per call).  Packed staging
    requires the fused-step dispatch and a tile-divisible per-step
    batch (``kernels.step_tile``); ``(K, B, M, E)`` input keeps the
    general per-step path for everything else.
    """
    num_heads = builder_kwargs.pop("num_heads", 1)
    impl = builder_kwargs.pop("impl", "auto")
    _validate_impl(impl)
    interpret = builder_kwargs.pop("interpret", False)
    local_step = _make_local_step(
        num_heads=num_heads,
        impl=impl,
        precision=builder_kwargs.pop("precision", "highest"),
        base_mask_prob=builder_kwargs.pop("base_mask_prob", 0.15),
        entropy_target=builder_kwargs.pop("entropy_target", 0.7),
        min_active=builder_kwargs.pop("min_active", 1),
        entropy_coeff=builder_kwargs.pop("entropy_coeff", 0.0),
        training=builder_kwargs.pop("training", True),
        interpret=interpret,
    )
    if builder_kwargs:
        raise TypeError(
            f"unknown builder kwargs: {sorted(builder_kwargs)}"
        )
    if accum_steps < 1:
        raise ValueError(f"accum_steps must be >= 1, got {accum_steps}")

    def one(state, kv_i, lab_i, rng, scale, axis=None,
            row_offset=None, batch_rows=None):
        step_rng = jax.random.fold_in(rng, state.step)
        if axis is not None:
            step_rng = jax.random.fold_in(
                step_rng, jax.lax.axis_index(axis)
            )
        if accum_steps == 1:
            loss, info, grads = local_step(
                state.params, kv_i, lab_i, step_rng, scale,
                row_offset=row_offset, batch_rows=batch_rows,
            )
        else:
            loss, info, grads = _accumulate(
                local_step, state.params, kv_i, lab_i, step_rng, scale,
                accum_steps,
            )
        if axis is not None:
            grads = jax.tree.map(lambda g: jax.lax.psum(g, axis), grads)
            loss = jax.lax.psum(loss, axis)
            info = jax.tree.map(
                lambda x: jax.lax.pmean(jnp.mean(x), axis), info
            )
        updates, opt_state = optimizer.update(
            grads, state.opt_state, state.params
        )
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            params=params, opt_state=opt_state, step=state.step + 1
        )
        return new_state, (loss, jax.tree.map(jnp.mean, info))

    def _staged_ok(kv, E):
        # staged addressing: PACKED (K, B, M·E) batches only — a 4-D
        # (K, B, M, E) jit parameter gets a sublane-padding-avoiding
        # entry layout from XLA ({3,1,2,0}) and a full relayout copy per
        # chunk call (measured 271 vs 75 us/step at the north star), so
        # 4-D input keeps the per-step slicing path.  Also requires the
        # fused-step impl, single-microbatch, and a tile-divisible
        # per-step batch (same tile resolution the kernel will use).
        if kv.ndim != 3 or accum_steps != 1:
            return False
        K_steps, Bstep, ME = kv.shape
        M = ME // E
        if M * E != ME:
            return False
        if _resolve_impl(impl, num_heads, E, interpret) != "fused-step":
            return False
        return Bstep % step_tile(
            Bstep, M, E, kv_dtype=kv.dtype.name, kv_grad=False
        ) == 0

    def _scan_steps(state, kv, labels, rng, scale, axis=None):
        """Scan K updates; staged in-kernel addressing when possible —
        a lax.scan slice feeding a Pallas operand must otherwise be
        MATERIALIZED per step (measured ~52us at the north star, ~2/3 of
        the one-pass kernel's own time)."""
        E_q = state.params["query"].shape[-1]
        if kv.ndim == 3 and not _staged_ok(kv, E_q):
            # packed but not eligible for in-kernel addressing: unpack
            # to 4-D and take the general per-step path below.  (This
            # costs a whole-array materialization per chunk call —
            # callers on the general path should stage 4-D, whose
            # layout conversion folds into the per-step slice copy; the
            # unpack here is a compatibility ramp, not the fast path.)
            M_q = kv.shape[2] // E_q
            if M_q * E_q != kv.shape[2]:
                raise ValueError(
                    f"packed kv columns {kv.shape[2]} not a multiple "
                    f"of embed dim {E_q}"
                )
            kv = kv.reshape(kv.shape[:2] + (M_q, E_q))
        if kv.ndim == 3:
            # hoist the flatten/pad OUT of the scan body: a reshape or
            # pad feeding a Pallas operand inside the scan cannot fuse,
            # so XLA would materialize the full staged array per step
            # (measured 853 vs 133 MB/step at the north star)
            K_steps, Bstep = kv.shape[0], kv.shape[1]
            kv_flat = kv.reshape(K_steps * Bstep, kv.shape[2])
            lab_flat = None
            if labels is not None:
                C = labels.shape[-1]
                lab_flat = labels.reshape(K_steps * Bstep, C).astype(
                    jnp.float32
                )
                Cp = -(-C // 128) * 128
                if Cp != C:
                    lab_flat = jnp.pad(lab_flat, ((0, 0), (0, Cp - C)))

            def body(state, i):
                return one(
                    state, kv_flat, lab_flat, rng, scale, axis=axis,
                    row_offset=i * Bstep, batch_rows=Bstep,
                )

            return jax.lax.scan(body, state, jnp.arange(K_steps))

        def body(state, xs):
            kv_i, lab_i = xs
            return one(state, kv_i, lab_i, rng, scale, axis=axis)

        return jax.lax.scan(body, state, (kv, labels))

    if mesh is None:

        def chunk(state, kv, labels, rng):
            state, (losses, infos) = _scan_steps(
                state, kv, labels, rng, 1.0
            )
            return state, losses, infos

        return jax.jit(chunk, donate_argnums=(0,) if donate else ())

    from jax.sharding import PartitionSpec as P

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(None, axis_name), P(None, axis_name), P()),
        out_specs=(P(), P(), P()),
        check_vma=False,  # see make_pool_train_step's DP note
    )
    def sharded_chunk(state, kv, labels, rng):
        scale = 1.0 / jax.lax.axis_size(axis_name)
        state, (losses, infos) = _scan_steps(
            state, kv, labels, rng, scale, axis=axis_name
        )
        return state, losses, infos

    return jax.jit(
        sharded_chunk, donate_argnums=(0,) if donate else ()
    )


def as_fit_step(pool_step: Callable) -> Callable:
    """Adapt a :func:`make_pool_train_step` step to
    :func:`aecf_tpu.train.fit`'s ``(state, images, texts, labels, rng)``
    batch protocol: the two ``(B, E)`` feature streams stack into the
    ``(B, 2, E)`` kv (the X3 shape — image + text CLIP features)."""

    def step(state, images, texts, labels, rng):
        return pool_step(
            state, jnp.stack([images, texts], axis=1), labels, rng
        )

    return step


def as_fit_chunk(pool_chunk: Callable) -> Callable:
    """:func:`as_fit_step` for the scan-chunk form (leading K axis).

    The two ``(K, B, E)`` streams CONCATENATE on the last axis into the
    PACKED ``(K, B, 2·E)`` staged form — byte-identical to stacking
    modalities, and the zero-copy layout the staged kernel path wants
    (a 4-D staged jit parameter costs a full relayout copy per chunk
    call; see ``make_pool_scan_train_step``)."""

    def chunk(state, images, texts, labels, rng):
        return pool_chunk(
            state, jnp.concatenate([images, texts], axis=-1), labels, rng
        )

    return chunk
