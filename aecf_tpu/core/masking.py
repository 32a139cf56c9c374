"""Entropy-driven curriculum masking — pure-functional core.

TPU-native re-implementation of the reference CurriculumMasking semantics
(reference: aecf/AECFLayer.py:33-319).  Everything here is a pure function of
``(weights, prng key, config scalars)`` so it jits, vmaps, shard_maps and
differentiates cleanly.  The branchy host-side control flow of the reference
(``if not isfinite(...).all()``, ``if needs_more.any()`` — AECFLayer.py:173,
:211) is rewritten as branchless ``where`` chains that are value-identical on
the branch boundaries, which is what XLA wants.

Semantics contract (see SURVEY.md §2.5, steps 1-11):

1.  ``L <= 1`` in training → early return, all-zero info.
2.  Non-finite elements are replaced with 0 before anything else.
3.  Rows with ``sum < 1e-8`` become uniform ``1/L``; others are renormalized.
4.  Entropy ``H = -Σ w·log w`` (xlogy semantics, ``0·log 0 = 0``) clamped to
    ``[0, log L]``.
5.  ``p_mask = base_mask_prob · clamp(H/log L, 0, 1)`` — high entropy ⇒ more
    masking.
6.  One i.i.d. Bernoulli draw with per-row keep-prob ``clamp(1-p_mask, 0, 1)``.
7.  Rows with fewer than ``min(min_active, L)`` survivors get their mask
    *wholly replaced* by a top-k-by-weight indicator (first-occurrence tie
    order, matching torch.topk).
8.  Mask + renormalize; rows whose masked sum ``<= 1e-8`` fall back to the
    normalized input weights.
9.  ``mask_rate = 1 - mean(mask)`` per row.
10. info carries detached ``entropy`` / ``mask_rate`` and
    ``target_entropy = log(L) · entropy_target``  (training only).

Eval path (reference AECFLayer.py:150-156): weights pass through untouched
(no scrubbing, no normalization); info has ``entropy`` (not detached) and
``mask_rate = 0`` — and **no** ``target_entropy`` key.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

__all__ = [
    "CurriculumMaskingConfig",
    "compute_entropy",
    "curriculum_mask",
    "entropy_loss",
    "EPS",
]

# Matches the reference's registered `_eps` buffer (AECFLayer.py:96).
EPS = 1e-8


@dataclasses.dataclass(frozen=True)
class CurriculumMaskingConfig:
    """Static configuration for curriculum masking.

    ``base_mask_prob`` and ``entropy_target`` may be overridden per-call with
    traced scalars (so schedules don't recompile); these are the defaults and
    carry the constructor validation of the reference (AECFLayer.py:84-89).
    """

    base_mask_prob: float = 0.15
    entropy_target: float = 0.7
    min_active: int = 1

    def __post_init__(self):
        if not 0.0 < self.base_mask_prob <= 1.0:
            raise ValueError(
                f"base_mask_prob must be in (0, 1], got {self.base_mask_prob}"
            )
        if not 0.0 < self.entropy_target <= 1.0:
            raise ValueError(
                f"entropy_target must be in (0, 1], got {self.entropy_target}"
            )
        if self.min_active < 1:
            raise ValueError(f"min_active must be >= 1, got {self.min_active}")


@jax.custom_jvp
def _neg_sum_xlogy(weights: jax.Array) -> jax.Array:
    return -jnp.sum(jax.scipy.special.xlogy(weights, weights), axis=-1)


@_neg_sum_xlogy.defjvp
def _neg_sum_xlogy_jvp(primals, tangents):
    (w,), (dw,) = primals, tangents
    # d/dw[-w·log w] = -(log w + 1), thresholded at 1e-30 (a NORMAL f32 —
    # XLA flushes subnormals, so a smaller floor autodiffs to 1/0 = inf and
    # 0·inf = NaN even under a zero cotangent; see CLAUDE.md).  Without
    # this, any exact-zero weight (e.g. a -inf key_padding_mask slot) makes
    # the detach_info=False entropy gradient poison EVERY parameter grad.
    g = -(jnp.log(jnp.maximum(w, 1e-30)) + 1.0)
    return _neg_sum_xlogy(w), jnp.sum(g * dw, axis=-1)


def compute_entropy(weights: jax.Array) -> jax.Array:
    """Shannon entropy over the last axis, clamped to ``[0, log L]``.

    ``xlogy`` semantics: ``0 * log(0) == 0`` (reference AECFLayer.py:113-128).
    The forward value is exactly ``-Σ xlogy(w, w)``; only the gradient is
    analytic (finite at ``w == 0``).
    """
    entropy = _neg_sum_xlogy(weights)
    max_entropy = math.log(weights.shape[-1])
    return jnp.clip(entropy, 0.0, max_entropy)


def _top_k_indicator(weights: jax.Array, k: int) -> jax.Array:
    """One-hot union of the top-``k`` elements per row (ties → lowest index).

    ``lax.top_k`` breaks ties by taking the lower index first, matching
    torch.topk's first-occurrence order (reference AECFLayer.py:213).
    """
    seq_len = weights.shape[-1]
    _, top_idx = lax.top_k(weights, k)  # (..., k)
    positions = jnp.arange(seq_len)
    # (..., k, L) -> any over k -> (..., L)
    indicator = jnp.any(top_idx[..., :, None] == positions, axis=-2)
    return indicator.astype(weights.dtype)


def curriculum_mask(
    weights: jax.Array,
    *,
    key: Optional[jax.Array] = None,
    training: bool = False,
    base_mask_prob: jax.typing.ArrayLike = 0.15,
    entropy_target: jax.typing.ArrayLike = 0.7,
    min_active: int = 1,
    mask_override: Optional[jax.Array] = None,
    detach_info: bool = True,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Apply entropy-driven curriculum masking to attention weights.

    Args:
      weights: ``(..., L)`` attention weights, nominally summing to 1 on the
        last axis.
      key: PRNG key consumed by the single Bernoulli draw.  Required when
        ``training=True`` unless ``mask_override`` is given.
      training: eval mode returns weights unchanged (reference
        AECFLayer.py:150-156).
      base_mask_prob: may be a traced scalar — schedules (the reference's
        CustomCurriculumMasking subclass pattern, README.md:341-351) must not
        retrigger compilation.
      entropy_target: may be a traced scalar.
      min_active: static minimum number of surviving elements per row.
      mask_override: optional pre-drawn keep-mask of ``weights.shape`` —
        replaces the Bernoulli draw.  This is the cross-framework parity hook:
        PyTorch MT19937/Philox and JAX threefry cannot produce identical
        streams, so bit-for-bit tests inject the mask.
      detach_info: reference default True — info entropy/mask_rate are
        stop-gradiented (quirk Q2: the documented ``0.01·entropy_loss``
        regularizer is monitoring-only).  ``False`` is the opt-in idiomatic
        extension that lets the entropy regularizer actually backpropagate
        into the attention weights.

    Returns:
      ``(masked_weights, info)`` where info follows the reference key-set
      contract exactly (SURVEY.md §2.5 steps 10-11).
    """
    seq_len = weights.shape[-1]
    dtype = weights.dtype
    batch_shape = weights.shape[:-1]

    if not training:
        entropy = compute_entropy(weights)
        return weights, {
            "entropy": entropy,
            "mask_rate": jnp.zeros(batch_shape, dtype=dtype),
        }

    if seq_len <= 1:
        zeros = jnp.zeros(batch_shape, dtype=dtype)
        return weights, {
            "entropy": zeros,
            "mask_rate": zeros,
            "target_entropy": zeros,
        }

    # -- Step 2: scrub non-finite values (branchless; identity when finite). --
    finite = jnp.isfinite(weights)
    weights = jnp.where(finite, weights, jnp.zeros((), dtype))

    # -- Step 3: normalize, with uniform fallback for degenerate rows. --------
    weight_sums = jnp.sum(weights, axis=-1, keepdims=True)
    needs_norm = weight_sums < EPS
    safe_sums = jnp.where(needs_norm, jnp.ones((), dtype), weight_sums)
    uniform = jnp.asarray(1.0 / seq_len, dtype)
    weights = jnp.where(needs_norm, uniform, weights / safe_sums)

    # -- Steps 4-5: entropy → adaptive mask probability. ----------------------
    entropy = compute_entropy(weights)
    max_entropy = math.log(float(seq_len))
    norm_entropy = jnp.clip(entropy / max_entropy, 0.0, 1.0)
    adaptive_prob = jnp.asarray(base_mask_prob, dtype) * norm_entropy
    keep_prob = jnp.clip(1.0 - adaptive_prob[..., None], 0.0, 1.0)

    # -- Step 6: the single Bernoulli draw (reference AECFLayer.py:204). ------
    if mask_override is not None:
        mask = mask_override.astype(dtype)
    else:
        if key is None:
            raise ValueError(
                "curriculum_mask(training=True) needs a PRNG `key` "
                "(or a `mask_override`)."
            )
        mask = jax.random.bernoulli(
            key, jnp.broadcast_to(keep_prob, weights.shape)
        ).astype(dtype)

    # -- Step 7: min_active constraint — whole-row replacement. ---------------
    effective_min_active = min(int(min_active), seq_len)
    active_count = jnp.sum(mask, axis=-1)
    needs_more = active_count < effective_min_active
    min_mask = _top_k_indicator(weights, effective_min_active)
    mask = jnp.where(needs_more[..., None], min_mask, mask)

    # -- Step 8: mask, renormalize, degenerate-row fallback. ------------------
    masked_weights = weights * mask
    weight_sum = jnp.sum(masked_weights, axis=-1, keepdims=True)
    valid = weight_sum > EPS
    safe_weight_sum = jnp.where(valid, weight_sum, jnp.ones((), dtype))
    final_weights = jnp.where(valid, masked_weights / safe_weight_sum, weights)

    # -- Steps 9-10: info assembly. -------------------------------------------
    mask_rate = 1.0 - jnp.mean(mask, axis=-1)
    detach = lax.stop_gradient if detach_info else (lambda x: x)
    info = {
        "entropy": detach(entropy),
        "mask_rate": lax.stop_gradient(mask_rate),  # not differentiable
        "target_entropy": jnp.full_like(
            entropy, max_entropy * jnp.asarray(entropy_target, dtype)
        ),
    }
    return final_weights, info


def entropy_loss(
    entropy: jax.Array,
    seq_len: int = 2,
    entropy_target: jax.typing.ArrayLike = 0.7,
) -> jax.Array:
    """MSE between observed entropy and ``log(seq_len) * entropy_target``.

    Reference: AECFLayer.py:285-314.  ``seq_len`` plays the role of the
    reference's ``_last_seq_len`` cache (default 2 when masking never ran).
    Non-finite entropies are scrubbed with ``nan→0, +inf→1, -inf→0``.
    """
    entropy = jnp.nan_to_num(entropy, nan=0.0, posinf=1.0, neginf=0.0)
    max_entropy = math.log(float(seq_len)) if seq_len > 1 else 0.0
    target = max_entropy * jnp.asarray(entropy_target, entropy.dtype)
    diff = entropy - target
    return jnp.clip(jnp.mean(diff * diff), min=0.0)
