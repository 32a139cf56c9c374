"""Tensor parallelism: head-sharded attention pooling over a GSPMD mesh.

The reference is single-device (SURVEY.md §2.4) — TP is new TPU-native
capability, optional headroom for large embed dims.  The scheme is the
standard Megatron column→row split expressed purely through shardings; XLA
inserts the collectives (an ICI all-reduce on the out-projection's partial
sums), no manual comm code:

* ``in_proj_weight (3E, E)`` sharded on axis 0 (output features): each
  device owns a contiguous slice of the packed Q/K/V projection rows.
  Because the layout is torch-packed (Q, K, V stacked — kept for
  checkpoint parity), a contiguous split only aligns with the Q/K/V
  sub-matrices when the model-axis size is a multiple of 3 (e.g. 3
  devices ⇒ exactly one sub-matrix each); otherwise a shard straddles a
  boundary and XLA inserts resharding around the ``jnp.split`` — values
  are correct either way (GSPMD), the collectives just aren't zero.  At
  AECF scale (E ≤ 1024) this costs little; a layout with separate Q/K/V
  leaves would trade checkpoint parity for strict locality.
* ``out_proj_weight (E, E)`` sharded on axis 1 (the contraction dim, torch
  ``x @ W.T`` convention): each device contracts its local context slice and
  the partial outputs are psum'd by XLA.
* biases: ``in_proj_bias`` sharded to match its weight rows;
  ``out_proj_bias`` replicated (added once after the reduce).

Everything that is not an attention pool (encoders, classifier, queries)
stays replicated — at AECF scale (E ≤ 1024) TP exists for the fusion layer's
projection GEMMs, which is where the model's FLOPs live (SURVEY.md §3.1).

Composes with data parallelism on a 2-D ``('data', 'model')`` mesh
(``data_model_mesh``): batch sharded over ``data``, pool weights over
``model``; grad reduction over ``data`` is likewise inserted by XLA since
this path is plain GSPMD jit (no shard_map).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.attention import AttentionPoolParams
from ..train.trainer import TrainState, bce_with_logits_loss

__all__ = [
    "attention_pool_pspecs",
    "tp_param_specs",
    "shard_params_tp",
    "make_tp_train_step",
    "make_tp_scan_train_step",
]


def attention_pool_pspecs(
    params: Optional[AttentionPoolParams] = None, *, model_axis: str = "model"
) -> AttentionPoolParams:
    """PartitionSpecs for one attention pool, head-sharded over ``model_axis``.

    Returns an ``AttentionPoolParams`` whose array slots hold
    ``PartitionSpec``s (bias slots are ``None`` wherever ``params`` has no
    bias, so the spec tree's structure matches the param tree's).
    """
    has_in_bias = params is None or params.in_proj_bias is not None
    has_out_bias = params is None or params.out_proj_bias is not None
    return AttentionPoolParams(
        in_proj_weight=P(model_axis, None),
        out_proj_weight=P(None, model_axis),
        in_proj_bias=P(model_axis) if has_in_bias else None,
        out_proj_bias=P() if has_out_bias else None,
    )


def tp_param_specs(params: Any, *, model_axis: str = "model") -> Any:
    """PartitionSpec pytree for a model's params: every
    ``AttentionPoolParams`` subtree head-sharded, all other leaves replicated.

    The result has the same pytree structure as ``params`` and can be passed
    to :func:`shard_params_tp`, ``jax.device_put``, or ``jit``'s
    ``in_shardings``.
    """

    def is_pool_or_none(x):
        return isinstance(x, AttentionPoolParams) or x is None

    def spec_for(x):
        if x is None:
            return None
        if isinstance(x, AttentionPoolParams):
            return attention_pool_pspecs(x, model_axis=model_axis)
        return P()

    return jax.tree.map(spec_for, params, is_leaf=is_pool_or_none)


def shard_params_tp(
    mesh: Mesh, params: Any, *, model_axis: str = "model"
) -> Any:
    """Device-put ``params`` with tensor-parallel shardings over ``mesh``.

    Attention-pool weights land head-sharded on the ``model_axis``; every
    other leaf is replicated.  For collective-free Q/K/V projections the
    mesh's model-axis size should divide each pool's ``num_heads`` (GSPMD is
    value-correct regardless — misaligned splits just cost extra comm).
    """
    specs = tp_param_specs(params, model_axis=model_axis)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )


def make_tp_train_step(
    apply_fn: Callable[..., Any],
    optimizer: optax.GradientTransformation,
    mesh: Mesh,
    *,
    data_axis: Optional[str] = "data",
    loss_fn: Callable[
        [jax.Array, jax.Array], jax.Array
    ] = bce_with_logits_loss,
    donate: bool = True,
    accum_steps: int = 1,
) -> Callable:
    """Build a jitted GSPMD ``(state, images, texts, labels, rng) ->
    (state, loss, info)`` train step for TP (optionally TP × DP) params.

    ``state.params`` must already carry committed shardings (see
    :func:`shard_params_tp`); jit propagates them through the step and XLA
    inserts the TP collectives.  When ``data_axis`` names an axis of
    ``mesh``, batch inputs are additionally constrained to shard over it
    (DP × TP on a 2-D mesh); pass ``data_axis=None`` for pure TP.

    ``apply_fn(params, images, texts, rng) -> (logits, info)`` sees the
    global (logical) batch — unlike the shard_map DP step there is no
    per-shard view, so loss scaling and RNG folding need no special care.

    ``donate=False`` keeps the input state buffers alive — required when
    an ASYNC checkpoint save may still be reading them while the next
    step runs (the :func:`aecf_tpu.train.fit` elastic loop).

    ``accum_steps > 1`` gradient-accumulates: the (global) batch is scanned
    as ``accum_steps`` equal microbatches — each still sharded over
    ``data_axis`` — with one optimizer update at the end.  The batch size
    must divide evenly.
    """
    if accum_steps < 1:
        raise ValueError(f"accum_steps must be >= 1, got {accum_steps}")
    if data_axis is not None and data_axis in mesh.axis_names:
        batch_sharding = NamedSharding(mesh, P(data_axis))
        micro_sharding = NamedSharding(mesh, P(None, data_axis))
    else:
        batch_sharding = micro_sharding = None

    loss_on = _make_tp_loss_on(apply_fn, loss_fn)

    @partial(jax.jit, donate_argnums=(0,) if donate else ())
    def tp_step(state, images, texts, labels, rng):
        if batch_sharding is not None:
            images, texts, labels = (
                jax.lax.with_sharding_constraint(x, batch_sharding)
                for x in (images, texts, labels)
            )
        state, loss, info = _tp_grad_update(
            state, images, texts, labels, rng,
            loss_on=loss_on, optimizer=optimizer,
            accum_steps=accum_steps, micro_sharding=micro_sharding,
        )
        return state, loss, jax.tree.map(jnp.mean, info)

    return tp_step


def _make_tp_loss_on(apply_fn, loss_fn):
    def loss_on(params, images, texts, labels, rng_):
        logits, info = apply_fn(params, images, texts, rng_)
        return loss_fn(logits, labels), info

    return loss_on


def _tp_grad_update(state, images, texts, labels, step_rng, *, loss_on,
                    optimizer, accum_steps, micro_sharding):
    """One GSPMD (state, batch, rng) -> (state, loss, info) update — the
    shared body of make_tp_train_step and make_tp_scan_train_step (the
    TP analogue of trainer._grad_step)."""
    if accum_steps == 1:
        (loss, info), grads = jax.value_and_grad(
            lambda p: loss_on(p, images, texts, labels, step_rng),
            has_aux=True,
        )(state.params)
    else:
        from ..train.trainer import _split_microbatches, accumulate_grads

        mbs = _split_microbatches((images, texts, labels), accum_steps)
        if micro_sharding is not None:
            # Keep each scanned microbatch sharded over the data axis
            # (the reshape would otherwise let GSPMD re-lay the leading
            # accum axis across devices).
            mbs = tuple(
                jax.lax.with_sharding_constraint(x, micro_sharding)
                for x in mbs
            )
        loss, info, grads = accumulate_grads(
            loss_on, state.params, mbs, step_rng, accum_steps
        )
    updates, opt_state = optimizer.update(
        grads, state.opt_state, state.params
    )
    params = optax.apply_updates(state.params, updates)
    return (
        TrainState(params=params, opt_state=opt_state, step=state.step + 1),
        loss,
        info,
    )


def make_tp_scan_train_step(
    apply_fn: Callable[..., Any],
    optimizer: optax.GradientTransformation,
    mesh: Mesh,
    *,
    data_axis: Optional[str] = "data",
    loss_fn: Callable[
        [jax.Array, jax.Array], jax.Array
    ] = bce_with_logits_loss,
    donate: bool = True,
    accum_steps: int = 1,
) -> Callable:
    """TP (optionally DP × TP) MULTI-step chunk: ``(state, images, texts,
    labels, rng) -> (state, losses, infos)`` with batch arrays staged
    ``(K, B, ...)`` and the K updates run as one on-device ``lax.scan`` —
    the GSPMD form of :func:`aecf_tpu.train.make_scan_train_step`: one
    dispatch and one host sync per K updates, XLA inserting the TP
    collectives inside the scan body.

    Each update consumes ``fold_in(rng, state.step)`` (the GLOBAL update
    counter), so parity with K sequential :func:`make_tp_train_step`
    calls fed ``fold_in(rng, i)`` is exact for a fresh state and chunks
    CHAIN across dispatches — the property :func:`aecf_tpu.train.fit`
    relies on for chunked training with exact resume parity.  When
    ``data_axis`` names a mesh axis, the staged arrays are constrained to
    shard over it on the BATCH axis (axis 1; the steps axis stays
    replicated).  ``accum_steps`` microbatches each step's ``(B, ...)``
    slice.  ``losses`` is the per-step ``(K,)`` vector; ``infos`` leaves
    are per-step means.
    """
    if accum_steps < 1:
        raise ValueError(f"accum_steps must be >= 1, got {accum_steps}")
    if data_axis is not None and data_axis in mesh.axis_names:
        # (K, B, ...) staged arrays AND the in-body (accum, micro, ...)
        # microbatch splits shard their axis 1 over the data axis — one
        # spec serves both (steps/accum axis replicated).
        chunk_sharding = NamedSharding(mesh, P(None, data_axis))
    else:
        chunk_sharding = None

    loss_on = _make_tp_loss_on(apply_fn, loss_fn)

    @partial(jax.jit, donate_argnums=(0,) if donate else ())
    def tp_chunk(state, images, texts, labels, rng):
        if chunk_sharding is not None:
            images, texts, labels = (
                jax.lax.with_sharding_constraint(x, chunk_sharding)
                for x in (images, texts, labels)
            )

        def body(state, xs):
            img, txt, lab = xs
            # global-step fold: chunks chain (see docstring)
            state, loss, info = _tp_grad_update(
                state, img, txt, lab,
                jax.random.fold_in(rng, state.step),
                loss_on=loss_on, optimizer=optimizer,
                accum_steps=accum_steps, micro_sharding=chunk_sharding,
            )
            return state, (loss, jax.tree.map(jnp.mean, info))

        state, (losses, infos) = jax.lax.scan(
            body, state, (images, texts, labels)
        )
        return state, losses, infos

    return tp_chunk
