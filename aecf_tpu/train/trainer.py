"""Training harness: optax AdamW + BCE, curriculum activation scheduling,
masked-modality eval sweeps.

TPU-native re-implementation of the reference experiment harness
(xrays/train_xrays_example.py:239-427): same protocol — AdamW(lr=1e-4,
wd=0.01), BCEWithLogits, curriculum + missing-modality simulation activating
at a configured epoch, per-epoch eval under ``none/images/texts`` masking —
but the step is a single jitted pure function and the curriculum toggle swaps
between two pre-jitted step functions instead of hot-swapping module state
(the reference's ``toggle_curriculum``, :179-187), so there is exactly one
retrace per phase, not per epoch.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..core.masking import entropy_loss
from .metrics import calculate_metrics

__all__ = [
    "TrainState",
    "bce_with_logits_loss",
    "accumulate_grads",
    "make_train_step",
    "make_scan_train_step",
    "mask_modality",
    "evaluate_model",
    "ExperimentConfig",
    "train_parallel_experiment",
]


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jax.Array


def bce_with_logits_loss(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Mean binary cross-entropy on logits (torch BCEWithLogitsLoss default)."""
    return optax.sigmoid_binary_cross_entropy(logits, labels).mean()


def _split_microbatches(arrays: Tuple[jax.Array, ...], accum_steps: int):
    """Reshape batch-axis-0 arrays to ``(accum_steps, B/accum_steps, ...)``.

    Trace-time error when the batch does not divide evenly — silent
    truncation would change the effective batch size.
    """
    batch = arrays[0].shape[0]
    if batch % accum_steps:
        raise ValueError(
            f"batch size {batch} is not divisible by accum_steps="
            f"{accum_steps}"
        )
    micro = batch // accum_steps
    return tuple(
        x.reshape((accum_steps, micro) + tuple(x.shape[1:])) for x in arrays
    )


def _unstack_info(info: Any) -> Any:
    """Restore the per-sample info contract after a microbatch scan.

    Scan stacks each info leaf to ``(accum_steps, micro, ...)``; collapsing
    the first two axes recovers the exact full-batch leaf (microbatches
    partition the batch in order).  Per-microbatch scalars (ndim < 2 after
    stacking) are left stacked."""
    return jax.tree.map(
        lambda x: (
            x.reshape((x.shape[0] * x.shape[1],) + tuple(x.shape[2:]))
            if x.ndim >= 2
            else x
        ),
        info,
    )


def accumulate_grads(
    loss_fn: Callable[..., Tuple[jax.Array, Any]],
    params: Any,
    microbatches: Tuple[jax.Array, ...],
    rng: jax.Array,
    accum_steps: int,
):
    """Scan ``loss_fn(params, *microbatch, rng_i) -> (loss, info)`` over
    microbatches, averaging loss and grads.

    Returns ``(loss, info, grads)`` where ``loss``/``grads`` equal the
    full-batch mean-reduced values exactly (equal-sized microbatches of a
    mean-reduced loss), and ``info`` leaves are re-flattened to the
    full-batch layout.  Each microbatch ``i`` sees
    ``jax.random.fold_in(rng, i)``, so masking/dropout draws are i.i.d.
    across microbatches (the draws differ from a single full-batch call —
    same distribution, different stream).  Carry cost: one grads-shaped
    accumulator (the point of accumulation: activation memory scales with
    the microbatch, not the batch).
    """

    def body(gsum, xs):
        *micro, idx = xs
        (loss, info), g = jax.value_and_grad(loss_fn, has_aux=True)(
            params, *micro, jax.random.fold_in(rng, idx)
        )
        return jax.tree.map(jnp.add, gsum, g), (loss, info)

    zeros = jax.tree.map(jnp.zeros_like, params)
    gsum, (losses, infos) = jax.lax.scan(
        body, zeros, (*microbatches, jnp.arange(accum_steps))
    )
    grads = jax.tree.map(lambda g: g / accum_steps, gsum)
    return losses.mean(), _unstack_info(infos), grads


def make_train_step(
    apply_fn: Callable[..., Any],
    optimizer: optax.GradientTransformation,
    *,
    entropy_coeff: float = 0.0,
    entropy_seq_len: int = 2,
    donate: bool = True,
    accum_steps: int = 1,
) -> Callable:
    """Build a jitted ``(state, images, texts, labels, rng) -> (state, loss,
    info)`` step.

    ``apply_fn(params, images, texts, rng) -> (logits, info)`` must be pure.
    ``entropy_coeff > 0`` adds ``coeff * entropy_loss(info['entropy'])``
    (README.md:206-208 pattern).  Note the reference detaches entropy in
    training (quirk Q2) so this term is monitoring-only by default — we keep
    that contract because ``info['entropy']`` comes out of
    ``curriculum_mask`` already stop-gradiented.

    ``accum_steps > 1`` runs gradient accumulation: the batch is split into
    ``accum_steps`` equal microbatches scanned with one optimizer update at
    the end — identical update math (mean of equal-microbatch mean losses ==
    full-batch mean) with activation memory scaled by the microbatch, for
    batches larger than HBM allows.  Batch size must divide evenly; each
    microbatch folds its index into ``rng`` (same distribution as one
    full-batch draw, different stream).  Per-sample ``info`` leaves come
    back full-batch-shaped.
    """
    if accum_steps < 1:
        raise ValueError(f"accum_steps must be >= 1, got {accum_steps}")

    loss_on = _make_loss_on(apply_fn, entropy_coeff, entropy_seq_len)

    def step(state: TrainState, images, texts, labels, rng):
        return _grad_step(
            state, images, texts, labels, rng,
            loss_on=loss_on, optimizer=optimizer, accum_steps=accum_steps,
        )

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def _make_loss_on(apply_fn, entropy_coeff, entropy_seq_len):
    """The train-step loss: BCE + optional entropy regularizer
    (README.md:206-208 pattern; see make_train_step's docstring)."""

    def loss_on(params, images, texts, labels, rng):
        logits, info = apply_fn(params, images, texts, rng)
        loss = bce_with_logits_loss(logits, labels)
        if entropy_coeff and "entropy" in info:
            loss = loss + entropy_coeff * entropy_loss(
                info["entropy"], seq_len=entropy_seq_len
            )
        return loss, info

    return loss_on


def _grad_step(state, images, texts, labels, rng, *, loss_on, optimizer,
               accum_steps):
    """One (state, batch, rng) -> (state, loss, info) update — the shared
    body of make_train_step and make_scan_train_step."""
    if accum_steps == 1:
        (loss, info), grads = jax.value_and_grad(
            lambda p: loss_on(p, images, texts, labels, rng),
            has_aux=True,
        )(state.params)
    else:
        mbs = _split_microbatches((images, texts, labels), accum_steps)
        loss, info, grads = accumulate_grads(
            loss_on, state.params, mbs, rng, accum_steps
        )
    updates, opt_state = optimizer.update(
        grads, state.opt_state, state.params
    )
    params = optax.apply_updates(state.params, updates)
    new_state = TrainState(
        params=params, opt_state=opt_state, step=state.step + 1
    )
    return new_state, loss, info


def make_scan_train_step(
    apply_fn: Callable[..., Any],
    optimizer: optax.GradientTransformation,
    *,
    entropy_coeff: float = 0.0,
    entropy_seq_len: int = 2,
    donate: bool = True,
    accum_steps: int = 1,
) -> Callable:
    """Build a jitted MULTI-step training chunk: ``(state, images, texts,
    labels, rng) -> (state, losses, info)`` where the batch arrays carry a
    leading steps axis ``(K, B, ...)`` and the K steps run as one
    ``lax.scan`` on-device — one dispatch, one host sync, K optimizer
    updates.

    This is the library form of the measurement discipline every benchmark
    in this repo follows (docs/design.md "Measurement discipline"): when
    the step time is comparable to the host→device dispatch latency, a
    host loop measures (and pays) the transport, not the chip.  Chaining
    steps on-device amortizes it by K.  The trade: K batches must be
    staged in device memory up front, and per-sample ``info`` is reduced
    to per-step means (a ``(K, ...)`` leaf per entry) so the carry stays
    small.

    Each update consumes ``jax.random.fold_in(rng, state.step)`` — the
    GLOBAL update counter, not the position within the chunk — so for a
    fresh state step ``i`` sees ``fold_in(rng, i)``, identical to K
    sequential :func:`make_train_step` calls fed those keys (parity is
    tested), and feeding the returned state into another chunk CONTINUES
    the same key stream: N chunks of K steps ≡ one chunk of N·K steps ≡
    N·K sequential steps.  That chaining property is what lets
    :func:`aecf_tpu.train.fit` run chunked with exact resume parity at
    any chunk alignment.  ``losses`` is the per-step ``(K,)`` vector;
    fetch ``losses[-1]`` (or anything) to synchronize.  ``accum_steps``
    composes: each of the K steps microbatches its ``(B, ...)`` slice.
    """
    if accum_steps < 1:
        raise ValueError(f"accum_steps must be >= 1, got {accum_steps}")

    loss_on = _make_loss_on(apply_fn, entropy_coeff, entropy_seq_len)

    def chunk(state: TrainState, images, texts, labels, rng):
        def body(state, xs):
            img, txt, lab = xs
            # global-step fold: chunks chain (see docstring)
            state, loss, info = _grad_step(
                state, img, txt, lab,
                jax.random.fold_in(rng, state.step),
                loss_on=loss_on, optimizer=optimizer,
                accum_steps=accum_steps,
            )
            # per-step scalar observability: mean over every non-step axis
            return state, (loss, jax.tree.map(jnp.mean, info))

        state, (losses, infos) = jax.lax.scan(
            body, state, (images, texts, labels)
        )
        return state, losses, infos

    return jax.jit(chunk, donate_argnums=(0,) if donate else ())


def mask_modality(
    images: np.ndarray, texts: np.ndarray, mask_type: str = "none"
) -> Tuple[np.ndarray, np.ndarray]:
    """Zero one modality for eval sweeps (reference :252-258)."""
    if mask_type == "images":
        return np.zeros_like(images), texts
    if mask_type == "texts":
        return images, np.zeros_like(texts)
    return images, texts


def _iter_batches(n: int, batch_size: int, *, shuffle: bool, seed: int):
    idx = np.arange(n)
    if shuffle:
        np.random.default_rng(seed).shuffle(idx)
    for start in range(0, n, batch_size):
        yield idx[start : start + batch_size]


def evaluate_model(
    predict_fn: Callable[[Any, jax.Array, jax.Array], jax.Array],
    params: Any,
    images: np.ndarray,
    texts: np.ndarray,
    labels: np.ndarray,
    mask_type: str = "none",
    batch_size: int = 64,
) -> Tuple[float, float, np.ndarray]:
    """Masked eval sweep → (mAP, macro F1, per-label F1) (reference :297-310).

    ``predict_fn`` should be pre-jitted; ragged final batches are padded to
    ``batch_size`` to keep a single compiled shape.
    """
    images, texts = mask_modality(images, texts, mask_type)
    n = images.shape[0]
    preds = []
    for sel in _iter_batches(n, batch_size, shuffle=False, seed=0):
        bi, bt = images[sel], texts[sel]
        pad = batch_size - len(sel)
        if pad:
            # explicit (pad, d) zeros: zeros_like(bi[:pad]) silently yields
            # fewer rows when pad > len(sel), breaking the single compiled
            # shape this padding exists to guarantee
            bi = np.concatenate([bi, np.zeros((pad, bi.shape[1]), bi.dtype)])
            bt = np.concatenate([bt, np.zeros((pad, bt.shape[1]), bt.dtype)])
        logits = np.asarray(predict_fn(params, jnp.asarray(bi), jnp.asarray(bt)))
        preds.append(logits[: len(sel)])
    return calculate_metrics(np.concatenate(preds), labels)


@dataclasses.dataclass(frozen=True)
class ExperimentConfig:
    """Hyperparameters of the parallel baseline-vs-AECF experiment
    (reference defaults: epochs=60 :755, batch=64 :247, lr=1e-4 :312,
    weight_decay=0.01 :324-325, curriculum activation at epoch 40 :344-349).
    """

    epochs: int = 60
    batch_size: int = 64
    lr: float = 1e-4
    weight_decay: float = 0.01
    curriculum_epoch: int = 40
    seed: int = 0
    eval_batch_size: int = 64


def _fusion_rows_mean(x, row_mask):
    """Sub-batch mean over both-present rows, matching the reference's
    indexing: the reference runs the fusion pool only on rows where both
    modalities are present (train_xrays_example.py:211-225), so its logged
    gate stats (``aecf_info['entropy'].mean()``, :380-383) cover exactly
    those rows.  Dense TPU compute runs the pool over every row;
    ``info['fusion_row_mask']`` (models/xray.py) recovers the sub-batch.
    Returns None when no row fused — the reference then records nothing
    for the batch (``info`` is never updated when ``both_present.any()``
    is False)."""
    if row_mask is None:
        return float(jnp.mean(x))
    rows = int(jnp.sum(row_mask))
    if rows == 0:
        return None
    per_row = x.size // row_mask.size
    m = row_mask.reshape(row_mask.shape + (1,) * (x.ndim - row_mask.ndim))
    return float(jnp.sum(jnp.where(m, x, 0.0)) / (rows * per_row))


def train_parallel_experiment(
    baseline_model,
    aecf_model,
    train_data: Dict[str, np.ndarray],
    val_data: Dict[str, np.ndarray],
    config: ExperimentConfig = ExperimentConfig(),
    *,
    verbose: bool = True,
) -> Dict[str, Dict[str, list]]:
    """Train baseline and AECF models in lockstep with curriculum activation.

    Mirrors reference ``train_both_models`` (train_xrays_example.py:312-427):
    identical optimizer/criterion/schedule, identical results-dict schema
    (so the analysis/plotting layer is drop-in).
    """
    key = jax.random.key(config.seed)
    k_base, k_aecf, k_train = jax.random.split(key, 3)

    optimizer = optax.adamw(
        config.lr, weight_decay=config.weight_decay
    )

    base_params = baseline_model.init(k_base)
    aecf_params = aecf_model.init(k_aecf)
    base_state = TrainState(
        base_params, optimizer.init(base_params), jnp.zeros((), jnp.int32)
    )
    aecf_state = TrainState(
        aecf_params, optimizer.init(aecf_params), jnp.zeros((), jnp.int32)
    )

    def base_apply(params, images, texts, rng):
        logits = baseline_model.apply(
            params, images, texts, training=True, rng=rng
        )
        return logits, {}

    def make_aecf_apply(curriculum: bool):
        def apply(params, images, texts, rng):
            return aecf_model.apply(
                params,
                images,
                texts,
                training=True,
                rng=rng,
                curriculum_enabled=curriculum,
                missing_modality_training=curriculum,
                return_info=True,
            )

        return apply

    base_step = make_train_step(base_apply, optimizer)
    aecf_step_pre = make_train_step(make_aecf_apply(False), optimizer)
    aecf_step_post = make_train_step(make_aecf_apply(True), optimizer)

    base_predict = jax.jit(
        lambda p, i, t: baseline_model.apply(p, i, t, training=False)
    )
    aecf_predict = jax.jit(
        lambda p, i, t: aecf_model.apply(p, i, t, training=False)
    )

    def empty_track():
        return {
            "train_loss": [],
            "val_full_map": [],
            "val_full_f1": [],
            "val_full_f1_per_label": [],
            "val_no_images_map": [],
            "val_no_images_f1": [],
            "val_no_images_f1_per_label": [],
            "val_no_texts_map": [],
            "val_no_texts_f1": [],
            "val_no_texts_f1_per_label": [],
        }

    results: Dict[str, Dict[str, list]] = {
        "baseline": empty_track(),
        "aecf": {**empty_track(), "gate_entropy": [], "mask_rate": []},
    }

    tr_img, tr_txt, tr_lab = (
        train_data["image"],
        train_data["text"],
        train_data["label"],
    )
    n_train = tr_img.shape[0]

    for epoch in range(config.epochs):
        curriculum_on = epoch >= config.curriculum_epoch
        if epoch == config.curriculum_epoch and verbose:
            print(f"EPOCH {epoch + 1}: activating curriculum masking")
        aecf_step = aecf_step_post if curriculum_on else aecf_step_pre

        base_losses, aecf_losses = [], []
        epoch_entropies, epoch_mask_rates = [], []
        epoch_key = jax.random.fold_in(k_train, epoch)

        for bi, sel in enumerate(
            _iter_batches(
                n_train,
                config.batch_size,
                shuffle=True,
                seed=config.seed + epoch,
            )
        ):
            if len(sel) < config.batch_size:
                continue  # drop ragged tail batch (keeps one compiled shape)
            images = jnp.asarray(tr_img[sel])
            texts = jnp.asarray(tr_txt[sel])
            labels = jnp.asarray(tr_lab[sel])
            bkey = jax.random.fold_in(epoch_key, bi)
            kb, ka = jax.random.split(bkey)

            base_state, base_loss, _ = base_step(
                base_state, images, texts, labels, kb
            )
            aecf_state, aecf_loss, info = aecf_step(
                aecf_state, images, texts, labels, ka
            )
            base_losses.append(float(base_loss))
            aecf_losses.append(float(aecf_loss))
            # Gate stats over both-present rows only (reference :380-383
            # sees only the fused sub-batch; see _fusion_rows_mean).
            row_mask = info.get("fusion_row_mask")
            for key_, sink in (
                ("entropy", epoch_entropies),
                ("mask_rate", epoch_mask_rates),
            ):
                if key_ in info:
                    v = _fusion_rows_mean(info[key_], row_mask)
                    if v is not None:
                        sink.append(v)

        # Per-epoch masked eval sweeps (reference :386-392).
        epoch_evals = {}
        for name, predict, params in (
            ("baseline", base_predict, base_state.params),
            ("aecf", aecf_predict, aecf_state.params),
        ):
            for mask_type, tag in (
                ("none", "full"),
                ("images", "no_images"),
                ("texts", "no_texts"),
            ):
                m, f1, per_label = evaluate_model(
                    predict,
                    params,
                    val_data["image"],
                    val_data["text"],
                    val_data["label"],
                    mask_type,
                    config.eval_batch_size,
                )
                results[name][f"val_{tag}_map"].append(m)
                results[name][f"val_{tag}_f1"].append(f1)
                results[name][f"val_{tag}_f1_per_label"].append(per_label)
                epoch_evals[(name, tag)] = (m, f1)

        results["baseline"]["train_loss"].append(
            float(np.mean(base_losses)) if base_losses else 0.0
        )
        results["aecf"]["train_loss"].append(
            float(np.mean(aecf_losses)) if aecf_losses else 0.0
        )
        results["aecf"]["gate_entropy"].append(
            float(np.mean(epoch_entropies)) if epoch_entropies else 0.0
        )
        results["aecf"]["mask_rate"].append(
            float(np.mean(epoch_mask_rates)) if epoch_mask_rates else 0.0
        )

        if verbose:
            bm, bf = epoch_evals[("baseline", "full")]
            am, af = epoch_evals[("aecf", "full")]
            print(
                f"Epoch {epoch + 1:2d}: "
                f"Baseline mAP={bm:.4f}, F1={bf:.4f} | "
                f"AECF mAP={am:.4f}, F1={af:.4f}, "
                f"Entropy={results['aecf']['gate_entropy'][-1]:.4f}"
            )

    # Final states returned alongside metrics for persistence.
    results["_states"] = {"baseline": base_state, "aecf": aecf_state}
    return results
