"""Data-parallel training over a device mesh (shard_map + psum-mean).

BASELINE.json config #5 path: global batch sharded over the ``('data',)``
axis, per-device grads reduced with an ICI all-reduce (``jax.lax.pmean``),
replicated optimizer update.  The reference has NO distributed code
(SURVEY.md §2.4) — this layer is new TPU-native capability, not a port.

Design notes:
* params/opt state are replicated (``P()``); batch arrays are sharded on
  axis 0 (``P('data')``).
* under shard_map's varying-manual-axes semantics (jax>=0.9,
  ``check_vma=True``), the backward pass of a *replicated* input is
  automatically psum'd across the mesh to keep its cotangent replicated —
  so the grad of a per-shard loss arrives already summed over shards.
  Scaling the local loss by ``1/num_shards`` therefore yields exactly the
  global-batch-mean gradient with a single compiler-inserted ICI
  all-reduce; adding an explicit ``pmean`` would be a silent no-op on an
  already-invariant value (and an 8x-too-large gradient without the
  scaling — covered by tests/test_parallel.py's single-device parity
  check).
* each shard folds the data-axis index into its PRNG key, so dropout /
  missing-modality draws are i.i.d. across shards while the update stays
  identical on every device.
* works on any mesh: real TPU slice, multi-host, or the 8-virtual-CPU test
  mesh.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..train.trainer import TrainState, bce_with_logits_loss

__all__ = [
    "make_dp_train_step",
    "make_dp_scan_train_step",
    "make_dp_eval_step",
    "shard_batch",
    "replicate",
]


def shard_batch(mesh: Mesh, batch: Any, *, axis_name: str = "data") -> Any:
    """Device-put a pytree of host arrays with batch-axis sharding.

    ``axis_name`` matches the step builders' parameter so the helper pair
    composes on meshes with non-default axis names."""
    sharding = NamedSharding(mesh, P(axis_name))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate(mesh: Mesh, tree: Any) -> Any:
    """Device-put a pytree fully replicated over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def make_dp_eval_step(
    apply_fn: Callable[..., Any],
    mesh: Mesh,
    *,
    axis_name: str = "data",
) -> Callable:
    """Build a jitted data-parallel inference step.

    ``apply_fn(params, batch) -> out`` where ``batch`` is any pytree with
    the batch dimension on axis 0.  Pure GSPMD: params replicated, batch
    sharded over ``axis_name``; the fusion forward is row-parallel, so XLA
    partitions it with zero collectives.  Output keeps the batch sharding
    (fetch or ``jax.device_get`` gathers it).  Pairs with
    :func:`aecf_tpu.train.sweeps.missing_modality_sweep` for eval sweeps
    over datasets larger than one chip's HBM.
    """
    params_sh = NamedSharding(mesh, P())
    batch_sh = NamedSharding(mesh, P(axis_name))

    @partial(jax.jit, in_shardings=(params_sh, batch_sh))
    def eval_step(params, batch):
        return apply_fn(params, batch)

    return eval_step


def make_dp_train_step(
    apply_fn: Callable[..., Any],
    optimizer: optax.GradientTransformation,
    mesh: Mesh,
    *,
    axis_name: str = "data",
    loss_fn: Callable[
        [jax.Array, jax.Array], jax.Array
    ] = bce_with_logits_loss,
    donate: bool = True,
    accum_steps: int = 1,
) -> Callable:
    """Build a jitted data-parallel ``(state, images, texts, labels, rng) ->
    (state, loss, info)`` step.

    ``apply_fn(params, images, texts, rng) -> (logits, info)`` sees only the
    local batch shard; ``loss_fn(logits, labels)`` must be a mean over the
    local shard (default: BCE-with-logits).  Returned loss/info scalars are
    global (pmean'd).

    ``accum_steps > 1`` gradient-accumulates *within each shard* (the local
    shard is scanned as ``accum_steps`` microbatches before the single
    global grad reduction + update) — DP × accumulation for global batches
    larger than ``num_devices`` × per-device memory.  The local shard size
    must divide evenly.
    """
    if accum_steps < 1:
        raise ValueError(f"accum_steps must be >= 1, got {accum_steps}")

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(axis_name), P(axis_name), P(axis_name), P()),
        out_specs=(P(), P(), P()),
    )
    def sharded_step(state, images, texts, labels, rng):
        # Decorrelate per-shard randomness; keep the update deterministic.
        axis_size = jax.lax.axis_size(axis_name)
        shard_rng = jax.random.fold_in(
            rng, jax.lax.axis_index(axis_name)
        )

        def local_loss_on(params, images, texts, labels, rng_):
            logits, info = apply_fn(params, images, texts, rng_)
            # local_mean / num_shards: the auto-inserted psum on the
            # replicated-params cotangent then reconstructs the exact
            # global-batch-mean gradient.
            local = loss_fn(logits, labels) / axis_size
            return local, info

        if accum_steps == 1:
            (scaled_loss, info), grads = jax.value_and_grad(
                lambda p: local_loss_on(
                    p, images, texts, labels, shard_rng
                ),
                has_aux=True,
            )(state.params)
        else:
            from ..train.trainer import (
                _split_microbatches,
                accumulate_grads,
            )

            mbs = _split_microbatches(
                (images, texts, labels), accum_steps
            )
            scaled_loss, info, grads = accumulate_grads(
                local_loss_on, state.params, mbs, shard_rng, accum_steps
            )
        # grads are already globally reduced (see module docstring).
        loss = jax.lax.psum(scaled_loss, axis_name)  # global mean loss
        info = jax.tree.map(
            lambda x: jax.lax.pmean(jnp.mean(x), axis_name), info
        )

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

    # donate=False keeps the caller's state buffers alive (e.g. fit() reuses
    # init_params across runs; device_put may alias rather than copy, so a
    # donated alias would delete the caller's arrays).
    return jax.jit(
        sharded_step, donate_argnums=(0,) if donate else ()
    )


def make_dp_scan_train_step(
    apply_fn: Callable[..., Any],
    optimizer: optax.GradientTransformation,
    mesh: Mesh,
    *,
    axis_name: str = "data",
    loss_fn: Callable[
        [jax.Array, jax.Array], jax.Array
    ] = bce_with_logits_loss,
    donate: bool = True,
    accum_steps: int = 1,
) -> Callable:
    """Data-parallel MULTI-step chunk: ``(state, images, texts, labels,
    rng) -> (state, losses, infos)`` where batch arrays carry a leading
    steps axis ``(K, B, ...)`` (sharded over ``axis_name`` on the BATCH
    axis, axis 1) and the K updates run as one on-device ``lax.scan`` —
    the DP form of :func:`aecf_tpu.train.make_scan_train_step`: one
    dispatch and one host sync cover K steps × ``num_devices`` shards,
    with the grad all-reduce inside the scan body.

    Each update on shard ``s`` consumes
    ``fold_in(fold_in(rng, state.step), s)`` — the GLOBAL update counter,
    not the position within the chunk — so for a fresh state step ``i``
    sees exactly what K sequential :func:`make_dp_train_step` calls fed
    ``fold_in(rng, i)`` see (parity is tested), and chunks CHAIN: feeding
    the returned state into another chunk continues the same key stream
    (the property :func:`aecf_tpu.train.fit` relies on for chunked
    training with exact resume parity).  ``losses`` is the per-step
    global-mean ``(K,)`` vector; ``infos`` leaves are per-step global
    means.  ``accum_steps`` microbatches each shard slice within each
    step.
    """
    if accum_steps < 1:
        raise ValueError(f"accum_steps must be >= 1, got {accum_steps}")

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(
            P(), P(None, axis_name), P(None, axis_name),
            P(None, axis_name), P(),
        ),
        out_specs=(P(), P(), P()),
    )
    def sharded_chunk(state, images, texts, labels, rng):
        axis_size = jax.lax.axis_size(axis_name)
        shard_idx = jax.lax.axis_index(axis_name)

        def local_loss_on(params, img, txt, lab, rng_):
            logits, info = apply_fn(params, img, txt, rng_)
            # local_mean / num_shards + the auto-inserted psum on the
            # replicated-params cotangent == global-batch-mean gradient
            # (see make_dp_train_step).
            return loss_fn(logits, lab) / axis_size, info

        def body(state, xs):
            img, txt, lab = xs
            # global-step-major fold: identical keys to sequential dp
            # steps fed fold_in(rng, step), and chunks chain (docstring)
            step_rng = jax.random.fold_in(
                jax.random.fold_in(rng, state.step), shard_idx
            )
            if accum_steps == 1:
                (scaled_loss, info), grads = jax.value_and_grad(
                    lambda p: local_loss_on(p, img, txt, lab, step_rng),
                    has_aux=True,
                )(state.params)
            else:
                from ..train.trainer import (
                    _split_microbatches,
                    accumulate_grads,
                )

                mbs = _split_microbatches((img, txt, lab), accum_steps)
                scaled_loss, info, grads = accumulate_grads(
                    local_loss_on, state.params, mbs, step_rng,
                    accum_steps,
                )
            loss = jax.lax.psum(scaled_loss, axis_name)
            info = jax.tree.map(
                lambda x: jax.lax.pmean(jnp.mean(x), axis_name), info
            )
            updates, opt_state = optimizer.update(
                grads, state.opt_state, state.params
            )
            params = optax.apply_updates(state.params, updates)
            return (
                TrainState(
                    params=params, opt_state=opt_state,
                    step=state.step + 1,
                ),
                (loss, info),
            )

        state, (losses, infos) = jax.lax.scan(
            body, state, (images, texts, labels)
        )
        return state, losses, infos

    return jax.jit(
        sharded_chunk, donate_argnums=(0,) if donate else ()
    )
