"""Elastic training loop: periodic checkpoints + resume-from-latest.

The reference has no failure handling (SURVEY.md §5); this is the TPU-native
pattern for preemptible capacity: every ``save_every`` steps the full
TrainState (params + optimizer + step counter) is checkpointed; a restarted
process calls the same :func:`fit` and continues from the latest checkpoint,
with the data stream and PRNG keys re-derived from the step counter so the
resumed run reproduces the uninterrupted one.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .checkpointing import CheckpointManager
from .trainer import TrainState, make_scan_train_step, make_train_step

__all__ = ["fit", "make_epoch_batch_fn"]


def make_epoch_batch_fn(
    data: Dict[str, np.ndarray],
    batch_size: int,
    *,
    seed: int = 0,
    shuffle: bool = True,
) -> Callable[[int], Tuple[np.ndarray, ...]]:
    """Epoch-shuffled batching as a PURE function of the step index.

    :func:`fit`'s resume contract requires ``batch_fn(step)`` to depend on
    nothing but ``step`` (a restarted run must replay the same stream).
    This builds the standard epoch-shuffled without-replacement schedule in
    that form: step ``s`` belongs to epoch ``s // (n // batch_size)``, whose
    row order is ``default_rng(seed + epoch).permutation(n)`` — the SAME
    shuffle contract as ``data.BatchLoader``'s numpy backend, so a loader
    recipe converts to an elastic ``fit`` run with identical batches
    (drop_last semantics; the ragged tail never appears, keeping one
    compiled shape).

    ``data`` maps stream names to arrays sharing a row count; batches are
    tuples in dict insertion order, with the canonical
    ``{image, text, label}`` key set always yielding in that order (the
    ``BatchLoader`` convention).
    """
    if not data:
        raise ValueError("data must contain at least one stream")
    names = list(data.keys())
    if set(names) == {"image", "text", "label"}:
        names = ["image", "text", "label"]
    arrays = [np.asarray(data[name]) for name in names]
    n = arrays[0].shape[0]
    for name, arr in zip(names, arrays):
        if arr.shape[0] != n:
            raise ValueError(
                f"row mismatch: {name} has {arr.shape[0]} rows, "
                f"{names[0]} has {n}"
            )
    per_epoch = n // batch_size
    if per_epoch < 1:
        raise ValueError(
            f"batch_size {batch_size} exceeds the {n} available rows"
        )

    # Memoize the current epoch's permutation: steps arrive sequentially,
    # so caching one epoch turns the per-step host cost from an O(n log n)
    # reshuffle into an O(batch) gather.  Pure memoization — batch_fn(step)
    # still depends on nothing but `step`.
    cached: Tuple[Optional[int], Optional[np.ndarray]] = (None, None)

    def batch_fn(step: int) -> Tuple[np.ndarray, ...]:
        nonlocal cached
        epoch, pos = divmod(step, per_epoch)
        if cached[0] != epoch:
            if shuffle:
                idx = np.random.default_rng(seed + epoch).permutation(n)
            else:
                idx = np.arange(n)
            cached = (epoch, idx)
        sel = cached[1][pos * batch_size : (pos + 1) * batch_size]
        return tuple(a[sel] for a in arrays)

    return batch_fn


def fit(
    apply_fn: Callable[..., Any],
    optimizer: optax.GradientTransformation,
    init_params: Any,
    batch_fn: Callable[[int], Tuple[np.ndarray, np.ndarray, np.ndarray]],
    *,
    num_steps: int,
    rng: jax.Array,
    checkpoint_dir: Optional[str] = None,
    save_every: int = 100,
    log_every: int = 0,
    step_fn: Optional[Callable] = None,
    mesh: Optional[Any] = None,
    accum_steps: int = 1,
    scan_chunk: int = 1,
) -> Tuple[TrainState, Dict[str, list]]:
    """Train for ``num_steps`` with checkpoint/resume.

    ``batch_fn(step) -> (images, texts, labels)`` must be a pure function of
    the step index (so a resumed run replays the same stream).  Returns the
    final state and a history dict.  If ``checkpoint_dir`` holds a previous
    run's checkpoints, training resumes after its latest step.

    ``mesh=`` turns the loop data-parallel (preemptible-TPU pattern:
    elastic checkpoints × DP): the default step becomes
    :func:`aecf_tpu.parallel.make_dp_train_step`, the state is replicated
    and every batch sharded over the ``'data'`` axis.  Resume parity holds
    because per-shard RNG derives from (rng, step, shard index) only.

    A mesh with a ``'model'`` axis runs DP × TP instead (elastic
    checkpoints × tensor parallelism): params are head-sharded via
    :func:`aecf_tpu.parallel.shard_params_tp`, the step is
    :func:`make_tp_train_step`, and checkpoints restore straight into
    the sharded layout (the abstract restore tree carries shardings).

    ``accum_steps > 1`` turns on gradient accumulation in whichever
    default step the loop builds (single-device, DP, or TP) — each
    ``batch_fn`` batch is scanned as that many microbatches with one
    optimizer update, so batches larger than device memory keep the same
    update math.  Ignored when an explicit ``step_fn`` is supplied.

    ``scan_chunk=K > 1`` runs the loop in compiled MULTI-step chunks
    (:func:`make_scan_train_step` / ``make_dp_scan_train_step``): K
    batches are staged at once and the K updates run as a single
    on-device ``lax.scan`` — one dispatch and one host sync per K steps,
    which removes the per-step dispatch latency from the training loop
    (the dominant cost for sub-millisecond steps; see docs/design.md
    "Measurement discipline").  The update math and RNG stream are
    IDENTICAL to the unchunked loop at every step — keys derive from the
    global ``state.step``, not the chunk position — so checkpoints taken
    under any chunking resume exactly into any other (parity is tested,
    including misaligned resume).  Trade-offs: K batches are staged in
    device memory at once; checkpoints and history/log entries land at
    chunk boundaries (choose ``save_every`` a multiple of K for an exact
    cadence); a final partial chunk compiles a second program.  Requires
    the default step builders (incompatible with ``step_fn=``).  Works
    single-device, DP (shard_map), and TP / DP × TP (GSPMD) alike.
    """
    if scan_chunk < 1:
        raise ValueError(f"scan_chunk must be >= 1, got {scan_chunk}")
    tp = mesh is not None and "model" in getattr(mesh, "axis_names", ())
    if scan_chunk > 1 and step_fn is not None:
        raise ValueError(
            "scan_chunk > 1 builds its own multi-step chunk and cannot "
            "wrap a custom step_fn; pass scan_chunk=1 (or build a "
            "chunked step_fn yourself with make_scan_train_step)"
        )
    if tp:
        from ..parallel.tensor_parallel import shard_params_tp

        # Shard BEFORE optimizer.init so the optimizer state inherits the
        # same layout (zeros_like preserves shardings).
        init_params = shard_params_tp(mesh, init_params)
    state = TrainState(
        init_params,
        optimizer.init(init_params),
        jnp.zeros((), jnp.int32),
    )
    if tp:
        # optimizer.init's zeros_like leaves inherit the params'
        # shardings, but freshly created scalars (e.g. adamw's `count`)
        # are committed to a single device — mixing them with 8-device
        # params in one jit is an error.  Replicate every leaf that is
        # not already laid out on this mesh.
        from jax.sharding import NamedSharding, PartitionSpec

        def _commit(x):
            sh = getattr(x, "sharding", None)
            if isinstance(sh, NamedSharding) and sh.mesh == mesh:
                return x
            return jax.device_put(x, NamedSharding(mesh, PartitionSpec()))

        state = jax.tree.map(_commit, state)
    manager = None
    start_step = 0
    if checkpoint_dir is not None:
        manager = CheckpointManager(
            checkpoint_dir, save_interval_steps=save_every
        )
        abstract = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(
                x.shape, x.dtype, sharding=getattr(x, "sharding", None)
            ),
            state,
        )
        restored = manager.restore(abstract)
        if restored is not None:
            state = restored
            start_step = int(state.step)

    chunk_fn = None
    if scan_chunk > 1:
        if tp:
            from ..parallel import make_tp_scan_train_step

            chunk_fn = make_tp_scan_train_step(
                apply_fn, optimizer, mesh, donate=False,
                accum_steps=accum_steps,
            )
        elif mesh is not None:
            from ..parallel import make_dp_scan_train_step

            chunk_fn = make_dp_scan_train_step(
                apply_fn, optimizer, mesh, donate=False,
                accum_steps=accum_steps,
            )
        else:
            chunk_fn = make_scan_train_step(
                apply_fn, optimizer, donate=False, accum_steps=accum_steps
            )
    elif step_fn is None:
        if tp:
            from ..parallel.tensor_parallel import make_tp_train_step

            # donate=False: async checkpoint saves may still read the
            # previous state's buffers while the next step runs.
            step_fn = make_tp_train_step(
                apply_fn, optimizer, mesh, donate=False,
                accum_steps=accum_steps,
            )
        elif mesh is not None:
            from ..parallel import make_dp_train_step

            step_fn = make_dp_train_step(
                apply_fn, optimizer, mesh, donate=False,
                accum_steps=accum_steps,
            )
        else:
            step_fn = make_train_step(
                apply_fn, optimizer, donate=False, accum_steps=accum_steps
            )
    if mesh is not None:
        from ..parallel import replicate, shard_batch

        if not tp:
            state = replicate(mesh, state)

    history: Dict[str, list] = {"loss": [], "step": []}

    if chunk_fn is not None:
        # Compiled multi-step chunks: K updates per dispatch.  Keys derive
        # from the global state.step inside the chunk, so this loop is
        # step-for-step identical to the unchunked one below regardless of
        # how start_step aligns with the chunk size.
        step_idx = start_step
        while step_idx < num_steps:
            k = min(scan_chunk, num_steps - step_idx)
            staged = [batch_fn(s) for s in range(step_idx, step_idx + k)]
            arrays = tuple(
                np.stack([np.asarray(b[j]) for b in staged])
                for j in range(3)
            )
            if mesh is not None:
                # steps axis replicated, batch axis (1) sharded over
                # 'data' (a pure-TP mesh with no 'data' axis replicates)
                from jax.sharding import NamedSharding, PartitionSpec

                spec = (
                    PartitionSpec(None, "data")
                    if "data" in mesh.axis_names
                    else PartitionSpec()
                )
                sh = NamedSharding(mesh, spec)
                batch = tuple(jax.device_put(x, sh) for x in arrays)
            else:
                batch = tuple(jnp.asarray(x) for x in arrays)
            state, losses, infos = chunk_fn(state, *batch, rng)
            if manager is not None:
                manager.save(step_idx + k, state)
            if log_every:
                hits = [
                    j for j in range(k)
                    if (step_idx + j) % log_every == 0
                ]
                if hits:
                    losses_np = np.asarray(losses)
                    infos_np = {
                        kk: np.asarray(v) for kk, v in (infos or {}).items()
                    }
                    for j in hits:
                        history["loss"].append(float(losses_np[j]))
                        history["step"].append(step_idx + j)
                        for kk, v in infos_np.items():
                            history.setdefault(kk, []).append(float(v[j]))
                        print(
                            f"step {step_idx + j}: "
                            f"loss={float(losses_np[j]):.4f}",
                            flush=True,
                        )
            step_idx += k
        return _finalize(manager, num_steps, state), history

    for step_idx in range(start_step, num_steps):
        images, texts, labels = batch_fn(step_idx)
        step_rng = jax.random.fold_in(rng, step_idx)
        if mesh is not None and not tp:
            # shard straight from host memory — staging the global batch on
            # one device first would defeat batch-larger-than-a-chip DP
            batch = shard_batch(mesh, (images, texts, labels))
        elif tp:
            # DP×TP: shard over 'data' straight from host memory —
            # jnp.asarray would stage the whole global batch on one device
            # first, defeating batch-larger-than-a-chip DP.  A pure-TP
            # mesh (no 'data' axis) replicates the batch, matching
            # make_tp_train_step's data_axis=None mode.
            batch = tuple(np.asarray(x) for x in (images, texts, labels))
            if "data" in mesh.axis_names:
                batch = shard_batch(mesh, batch)
            else:
                batch = replicate(mesh, batch)
        else:
            batch = (jnp.asarray(images), jnp.asarray(texts),
                     jnp.asarray(labels))
        state, loss, info = step_fn(state, *batch, step_rng)
        if manager is not None:
            manager.save(step_idx + 1, state)
        if log_every and (step_idx % log_every == 0):
            history["loss"].append(float(loss))
            history["step"].append(step_idx)
            # Harvest the info-dict observability contract (entropy,
            # mask_rate, …) the way the reference's harness does per epoch.
            for k, v in (info or {}).items():
                history.setdefault(k, []).append(float(jnp.mean(v)))
            print(f"step {step_idx}: loss={float(loss):.4f}", flush=True)

    return _finalize(manager, num_steps, state), history


def _finalize(manager, num_steps, state):
    """Shared end-of-training checkpoint epilogue (both loop shapes):
    guarantee a terminal checkpoint, drain async saves, release."""
    if manager is not None:
        if manager.latest_step() != num_steps:
            manager.save(num_steps, state, force=True)
        manager.wait()
        manager.close()
    return state
