"""Module-level API mirroring the reference's public surface.

``CurriculumMasking`` and ``MultimodalAttentionPool`` here are thin stateful
wrappers over the pure functions in :mod:`aecf_tpu.core` — they hold parameter
pytrees and train/eval mode, nothing else.  The hot path stays pure, so the
same objects work inside ``jit`` / ``shard_map`` (pass ``rng`` explicitly) and
their ``params`` attribute slots straight into optax.

Reference API being mirrored: aecf/AECFLayer.py classes ``CurriculumMasking``
(:33-319) and ``MultimodalAttentionPool`` (:322-552), including constructor
validation, train/eval behavior, info-dict key sets, and the reference quirks
documented in SURVEY.md §2.5 (Q1: masked weights are *not* applied to the
output by default; Q2: info entropy is detached in training).  Idiomatic
opt-in extensions are clearly flagged.
"""

from __future__ import annotations

import itertools
from typing import Any, Callable, Dict, Optional, Tuple, Union

import jax
import jax.numpy as jnp

from ..core.attention import (
    AttentionPoolConfig,
    AttentionPoolParams,
    attention_pool_core,
)
from ..core.init import init_attention_pool_params
from ..core.masking import curriculum_mask, entropy_loss

__all__ = ["CurriculumMasking", "MultimodalAttentionPool"]

# Deterministic per-process default seeds for modules constructed without an
# explicit key (drop-in ergonomics; serious use passes `key=`).
_DEFAULT_SEEDS = itertools.count()


def _next_default_key() -> jax.Array:
    return jax.random.key(next(_DEFAULT_SEEDS))


class CurriculumMasking:
    """Entropy-driven curriculum masking (reference AECFLayer.py:33-319).

    Stateless apart from train/eval mode and the ``_last_seq_len`` cache the
    reference keeps for ``entropy_loss`` (AECFLayer.py:99, :187).  The cache
    updates at trace time (sequence length is static under jit), which matches
    the reference behavior for any fixed-shape program.

    ``base_mask_prob`` / ``entropy_target`` are read at call time and may be
    reassigned with traced scalars — the reference's subclass-scheduling
    pattern (README.md:341-351) works without recompilation if you store a
    jnp scalar.

    First-class schedules: pass ``schedule=`` a callable ``step -> prob``
    (any optax schedule works) and provide the current ``step`` at call time
    (``masking(w, rng=k, step=state.step)``; the pool forwards its own
    ``step=`` kwarg).  ``step`` is a traced scalar, so sweeping the schedule
    never recompiles — this is the jit-native equivalent of the reference's
    mutate-``base_mask_prob``-per-step subclass (README.md:341-351), which
    relies on Python-side state that cannot live inside a compiled graph.

    Example (mirrors reference AECFLayer.py:65-69):

    >>> import jax, jax.numpy as jnp
    >>> masking = CurriculumMasking(base_mask_prob=0.15)
    >>> w = jnp.full((4, 3), 1 / 3)               # uniform ⇒ max entropy
    >>> masked, info = masking(w, rng=jax.random.key(0))
    >>> masked.shape
    (4, 3)
    >>> sorted(info)
    ['entropy', 'mask_rate', 'target_entropy']
    >>> bool(jnp.allclose(masked.sum(-1), 1.0))    # rows stay normalized
    True
    """

    def __init__(
        self,
        base_mask_prob: float = 0.15,
        entropy_target: float = 0.7,
        min_active: int = 1,
        *,
        detach_info: bool = True,
        schedule: Optional[Callable[[jax.typing.ArrayLike], jax.Array]] = None,
    ):
        if not 0.0 < base_mask_prob <= 1.0:
            raise ValueError(
                f"base_mask_prob must be in (0, 1], got {base_mask_prob}"
            )
        if not 0.0 < entropy_target <= 1.0:
            raise ValueError(
                f"entropy_target must be in (0, 1], got {entropy_target}"
            )
        if min_active < 1:
            raise ValueError(f"min_active must be >= 1, got {min_active}")

        self.base_mask_prob = base_mask_prob
        self.entropy_target = entropy_target
        self.min_active = min_active
        # Extension (SURVEY.md §2.5 build decision): detach_info=False makes
        # info['entropy'] differentiable so the documented entropy
        # regularizer actually trains; the reference default detaches (Q2).
        self.detach_info = detach_info
        self.schedule = schedule
        self.training = True
        self._last_seq_len = 2  # reference default (AECFLayer.py:99)

    # -- torch-style mode switches -------------------------------------------
    def train(self, mode: bool = True) -> "CurriculumMasking":
        self.training = mode
        return self

    def eval(self) -> "CurriculumMasking":
        return self.train(False)

    # -- schedule --------------------------------------------------------------
    def mask_prob_at(
        self, step: Optional[jax.typing.ArrayLike] = None
    ) -> jax.typing.ArrayLike:
        """Effective mask prob: ``schedule(step)`` when scheduled, else
        ``base_mask_prob``.  Works with traced ``step`` scalars (no
        recompilation across schedule values).  Eval mode ignores the mask
        prob entirely, so a scheduled module needs no ``step=`` there."""
        if self.schedule is None:
            return self.base_mask_prob
        if step is None:
            if not self.training:
                return self.base_mask_prob  # unused on the eval path
            raise ValueError(
                "this CurriculumMasking has a schedule= — pass the current "
                "`step=` at call time"
            )
        return self.schedule(step)

    # -- forward --------------------------------------------------------------
    def __call__(
        self,
        weights: jax.Array,
        *,
        rng: Optional[jax.Array] = None,
        mask_override: Optional[jax.Array] = None,
        step: Optional[jax.typing.ArrayLike] = None,
    ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
        if self.training and weights.shape[-1] > 1:
            self._last_seq_len = int(weights.shape[-1])
        return curriculum_mask(
            weights,
            key=rng,
            training=self.training,
            base_mask_prob=self.mask_prob_at(step),
            entropy_target=self.entropy_target,
            min_active=self.min_active,
            mask_override=mask_override,
            detach_info=self.detach_info,
        )

    def compute_entropy(self, weights: jax.Array) -> jax.Array:
        from ..core.masking import compute_entropy

        return compute_entropy(weights)

    # Alias kept for reference API parity (AECFLayer.py:113).
    compute_entropy_fused = compute_entropy

    def entropy_loss(self, entropy: jax.Array) -> jax.Array:
        return entropy_loss(
            entropy,
            seq_len=self._last_seq_len,
            entropy_target=self.entropy_target,
        )

    def extra_repr(self) -> str:
        return (
            f"base_mask_prob={self.base_mask_prob}, "
            f"entropy_target={self.entropy_target}, "
            f"min_active={self.min_active}"
        )

    def __repr__(self) -> str:
        return f"{type(self).__name__}({self.extra_repr()})"


class MultimodalAttentionPool:
    """Cross-attention pooling with optional curriculum masking.

    Mirrors reference ``MultimodalAttentionPool`` (AECFLayer.py:322-552).
    Differences forced by JAX:

    * parameters are an explicit pytree at ``self.params`` (optax-ready);
    * training-mode calls that need randomness (curriculum Bernoulli draw,
      dropout) take an explicit ``rng=`` key;
    * ``use_checkpoint`` maps to ``jax.checkpoint`` (rematerialization) around
      the attention computation, the TPU equivalent of
      ``torch.utils.checkpoint`` (reference AECFLayer.py:500-512).

    ``implementation`` selects the compute path: ``"xla"`` (fused-by-XLA
    einsums, the oracle), ``"pallas"`` (single fused TPU kernel), or
    ``"auto"`` (pallas on TPU when the config is supported).

    Example (mirrors reference AECFLayer.py:357-368):

    >>> import jax, jax.numpy as jnp
    >>> pool = MultimodalAttentionPool(
    ...     64, curriculum_masking=CurriculumMasking(),
    ...     key=jax.random.key(0))
    >>> q = jnp.ones((2, 1, 64))
    >>> kv = jnp.ones((2, 3, 64))
    >>> out, info = pool.train()(q, kv, rng=jax.random.key(1),
    ...                          return_info=True)
    >>> out.shape, info["attention_weights"].shape
    ((2, 1, 64), (2, 1, 3))
    >>> pool.eval()(q, kv).shape                    # eval: no rng needed
    (2, 1, 64)
    """

    def __init__(
        self,
        embed_dim: int,
        num_heads: int = 1,
        dropout: float = 0.0,
        bias: bool = True,
        curriculum_masking: Optional[CurriculumMasking] = None,
        batch_first: bool = True,
        dtype: jnp.dtype = jnp.float32,
        *,
        key: Optional[jax.Array] = None,
        params: Optional[AttentionPoolParams] = None,
        implementation: str = "auto",
        apply_masking_to_output: bool = False,
        precision: str = "highest",
    ):
        self.config = AttentionPoolConfig(
            embed_dim=embed_dim,
            num_heads=num_heads,
            dropout=dropout,
            bias=bias,
            batch_first=batch_first,
        )
        self.embed_dim = embed_dim
        self.num_heads = num_heads
        self.batch_first = batch_first
        self.curriculum_masking = curriculum_masking
        # Extension (SURVEY.md §2.5 build decision): when True, the output
        # is recomputed from the masked weights. The reference NEVER does
        # this (quirk Q1) — default False preserves parity.
        self.apply_masking_to_output = apply_masking_to_output
        self.training = True
        if implementation not in ("auto", "xla", "pallas"):
            raise ValueError(f"unknown implementation {implementation!r}")
        self.implementation = implementation
        # MXU matmul precision for the pool's GEMMs.  "highest" (default)
        # runs f32 dots as 3-pass MXU sequences and is bit-for-bit with
        # the torch-f32 reference on both dispatch paths — the parity-
        # first contract.  "default" opts into 1-pass bf16-input GEMMs: a
        # measured 2.1x (fused north star) / 4.8x (heads8 XLA) step-time
        # win at ~1e-3 relative output error (docs/design.md "Precision
        # policy"; suite precision_ab_* sections keep the gap measured).
        # The per-row-query fused kernel (batch query, H<=2) always
        # computes in-kernel dots at HIGHEST regardless — numerically
        # stronger than requested, never weaker.
        if precision not in ("default", "high", "highest"):
            raise ValueError(
                f"precision must be 'default', 'high', or 'highest', "
                f"got {precision!r}"
            )
        self.precision = precision

        if params is None:
            params = init_attention_pool_params(
                key if key is not None else _next_default_key(),
                embed_dim,
                bias=bias,
                dtype=dtype,
            )
        self.params = params

    # -- torch-style mode switches -------------------------------------------
    def train(self, mode: bool = True) -> "MultimodalAttentionPool":
        self.training = mode
        if self.curriculum_masking is not None:
            self.curriculum_masking.train(mode)
        return self

    def eval(self) -> "MultimodalAttentionPool":
        return self.train(False)

    # -- validation (reference AECFLayer.py:449-498) --------------------------
    def _validate(self, query, key, value):
        for name, t in (("query", query), ("key", key), ("value", value)):
            if not isinstance(t, (jax.Array, jnp.ndarray)) and not hasattr(
                t, "shape"
            ):
                raise TypeError(f"Expected {name} to be an array, got {type(t)}")
            if t.ndim != 3:
                raise ValueError(
                    f"Expected 3D {name} tensor with "
                    f"batch_first={self.batch_first}, got {t.ndim}D"
                )
        if self.batch_first:
            batch_size, _, embed_dim = query.shape
            src_len = key.shape[1]
            if src_len == 0:
                raise ValueError("Key sequence length cannot be zero")
            # Extension over the reference: a batch-1 query broadcasts over
            # the key batch (the shared-fusion-query pattern) — this is also
            # the fast path for the shared-query Pallas kernel.
            if (
                key.shape[0] != batch_size and batch_size != 1
            ) or key.shape[2] != embed_dim:
                raise ValueError(
                    f"Key shape {key.shape} incompatible with query shape "
                    f"{query.shape}"
                )
            if (
                value.shape[0] != key.shape[0]
                or value.shape[1] != key.shape[1]
                or value.shape[2] != embed_dim
            ):
                raise ValueError(
                    f"Value shape {value.shape} incompatible with key shape "
                    f"{key.shape}"
                )
        else:
            _, batch_size, embed_dim = query.shape
            src_len = key.shape[0]
            if src_len == 0:
                raise ValueError("Key sequence length cannot be zero")
            if key.shape[1] != batch_size or key.shape[2] != embed_dim:
                raise ValueError(
                    f"Shape mismatch: query {query.shape}, key {key.shape}"
                )
            if (
                value.shape[0] != src_len
                or value.shape[1] != batch_size
                or value.shape[2] != embed_dim
            ):
                raise ValueError(
                    f"Value shape {value.shape} incompatible with key shape "
                    f"{key.shape}"
                )

    # -- forward --------------------------------------------------------------
    def __call__(
        self,
        query: jax.Array,
        key: jax.Array,
        value: Optional[jax.Array] = None,
        key_padding_mask: Optional[jax.Array] = None,
        attn_mask: Optional[jax.Array] = None,
        return_info: bool = False,
        use_checkpoint: bool = False,
        *,
        rng: Optional[jax.Array] = None,
        mask_override: Optional[jax.Array] = None,
        params: Optional[AttentionPoolParams] = None,
        step: Optional[jax.typing.ArrayLike] = None,
    ) -> Union[jax.Array, Tuple[jax.Array, Dict[str, Any]]]:
        # Functional override: inside jit/grad, pass `params=` instead of
        # assigning `self.params` (attribute mutation under trace leaks
        # tracers into the module and poisons later calls).
        if params is None:
            params = self.params
        if value is None:
            value = key
        self._validate(query, key, value)

        # Capture BEFORE any layout change: swapaxes produces two distinct
        # arrays, so testing `value is key` afterwards would silently
        # route every batch_first=False caller off the fused kernels.
        shared_kv = value is key

        if not self.batch_first:
            query = jnp.swapaxes(query, 0, 1)
            key = jnp.swapaxes(key, 0, 1)
            value = jnp.swapaxes(value, 0, 1)

        need_weights = self.curriculum_masking is not None or return_info

        mask_rng = dropout_rng = None
        if rng is not None:
            mask_rng, dropout_rng = jax.random.split(rng)
        dropout_active = self.training and self.config.dropout > 0.0
        if dropout_active and dropout_rng is None:
            raise ValueError(
                "Training-mode dropout needs an explicit `rng=` key."
            )

        # ---- fused Pallas dispatch ------------------------------------------
        impl = self.implementation
        if impl == "auto":
            from ..kernels import prefers_fused

            # prefers_fused: measured perf boundary — XLA batches H>2 heads
            # better than the per-head kernel GEMMs. 'pallas' still forces.
            impl = (
                "pallas"
                if jax.default_backend() == "tpu"
                and prefers_fused(num_heads=self.num_heads)
                else "xla"
            )
        if impl == "pallas" and self._pallas_supported(
            query,
            shared_kv,
            key_padding_mask,
            attn_mask,
            dropout_active,
            mask_override,
        ):
            return self._pallas_forward(
                params,
                query,
                key,
                return_info=return_info,
                mask_rng=mask_rng,
                step=step,
                key_padding_mask=key_padding_mask,
            )

        def attend(q, k, v):
            return attention_pool_core(
                params,
                q,
                k,
                v,
                num_heads=self.num_heads,
                key_padding_mask=key_padding_mask,
                attn_mask=attn_mask,
                dropout_rate=self.config.dropout if dropout_active else 0.0,
                dropout_key=dropout_rng if dropout_active else None,
                need_weights=need_weights,
            )

        if use_checkpoint and self.training:
            # TPU-native gradient checkpointing: rematerialize the attention
            # computation in the backward pass instead of saving activations
            # (replaces torch.utils.checkpoint, reference AECFLayer.py:500-512).
            attend = jax.checkpoint(attend)

        # Honor self.precision (default "highest": on TPU, f32 dots
        # otherwise run single-pass bf16 MXU, and auto-dispatch would
        # silently change numerics between fused and fallback configs —
        # same fix as ops.fusion_pool's xla branch).
        with jax.default_matmul_precision(self.precision):
            attn_output, attn_weights = attend(query, key, value)

        info: Dict[str, Any] = {}
        if self.curriculum_masking is not None and attn_weights is not None:
            pooled_weights = attn_weights  # already head-averaged (B, T, S)
            if (
                self.curriculum_masking.training
                and pooled_weights.shape[-1] > 1
                and mask_rng is None
                and mask_override is None
            ):
                raise ValueError(
                    "Training-mode curriculum masking needs an explicit "
                    "`rng=` key (or a `mask_override`)."
                )
            masked_weights, mask_info = self.curriculum_masking(
                pooled_weights,
                rng=mask_rng,
                mask_override=mask_override,
                step=step,
            )
            if self.apply_masking_to_output:
                from ..core.attention import apply_pooled_weights

                # same precision context as attend(): this opt-in output
                # recomputation is always on the XLA path and its three
                # einsum GEMMs would otherwise run single-pass bf16
                with jax.default_matmul_precision(self.precision):
                    attn_output = apply_pooled_weights(
                        params,
                        masked_weights,
                        value,
                        num_heads=self.num_heads,
                    )
            info.update(mask_info)
            # Grad-carrying raw weights (reference AECFLayer.py:538).
            info["attention_weights"] = pooled_weights
            if return_info:
                # Reference quirk Q1: masked weights are observability only —
                # they are detached and NOT applied to the output
                # (AECFLayer.py:526-541).
                info["masked_attention_weights"] = jax.lax.stop_gradient(
                    masked_weights
                )
        elif return_info and attn_weights is not None:
            info["attention_weights"] = attn_weights

        if not self.batch_first:
            attn_output = jnp.swapaxes(attn_output, 0, 1)

        if return_info:
            return attn_output, info
        return attn_output

    # -- fused-kernel path -----------------------------------------------------
    def _pallas_supported(
        self,
        query,
        shared_kv,
        key_padding_mask,
        attn_mask,
        dropout_active,
        mask_override,
    ) -> bool:
        """Config gate: unsupported shapes silently use the XLA oracle path."""
        return (
            query.shape[1] == 1
            and attn_mask is None
            and not dropout_active
            and mask_override is None
            and shared_kv
            and query.dtype == jnp.float32
            # Resident-weight kernels cap at _RESIDENT_E_CAP; the
            # shared-query H<=2 dispatch (query.shape[0] == 1) has a
            # streamed split that lifts the cap to _STREAMED_E_CAP.
            and self._embed_dim_supported(query)
            # The fused kernels implement exactly two precision modes
            # ("highest" = 3-pass parity, "default" = 1-pass bf16);
            # "high" would silently degrade to "default" there while the
            # XLA path honors it — route it to XLA so auto-dispatch never
            # changes numerics vs what the user asked for.
            and self.precision != "high"
            and not self.apply_masking_to_output
            # detach_info=False (trainable entropy) needs the XLA path: the
            # fused kernels stop_gradient their entropy output, which would
            # silently zero the entropy regularizer's gradient on TPU.
            and (
                self.curriculum_masking is None
                or self.curriculum_masking.detach_info
            )
        )

    def _embed_dim_supported(self, query) -> bool:
        """Kernel E-cap check, delegated to the kernels' own capability
        gate so module dispatch cannot drift from ops.fusion_pool's."""
        from ..kernels.fused_pool import supports_fused

        return supports_fused(
            tgt_len=1,
            num_heads=self.num_heads,
            embed_dim=self.embed_dim,
            shared_query=query.shape[0] == 1,
        )

    def _pallas_forward(
        self, params, query, kv, *, return_info, mask_rng, step=None,
        key_padding_mask=None,
    ):
        """Forward through the fused TPU kernel; same info contract as the
        XLA path.  ``use_checkpoint`` is moot here — the kernel's custom_vjp
        already rematerializes instead of saving activations."""
        from ..kernels import fused_fusion_pool, fused_fusion_pool_shared

        cm = self.curriculum_masking
        masking_training = cm is not None and cm.training
        M = kv.shape[1]
        if masking_training and M > 1 and mask_rng is None:
            raise ValueError(
                "Training-mode curriculum masking needs an explicit "
                "`rng=` key (or a `mask_override`)."
            )
        kwargs = dict(
            num_heads=self.num_heads,
            rng=mask_rng,
            training=masking_training,
            base_mask_prob=cm.mask_prob_at(step) if cm else 0.15,
            entropy_target=cm.entropy_target if cm else 0.7,
            min_active=cm.min_active if cm else 1,
            key_padding_mask=key_padding_mask,
        )
        if query.shape[0] == 1 and kv.shape[0] >= 1:
            out, weights, masked, mask_info = fused_fusion_pool_shared(
                params, query, kv, precision=self.precision, **kwargs
            )
        else:
            out, weights, masked, mask_info = fused_fusion_pool(
                params, query, kv, **kwargs
            )

        if masking_training and M > 1:
            cm._last_seq_len = int(M)

        info: Dict[str, Any] = {}
        if cm is not None:
            info.update(mask_info)
            info["attention_weights"] = weights
            if return_info:
                info["masked_attention_weights"] = masked
        elif return_info:
            info["attention_weights"] = weights

        if not self.batch_first:
            out = jnp.swapaxes(out, 0, 1)
        if return_info:
            return out, info
        return out

    def extra_repr(self) -> str:
        return (
            f"embed_dim={self.embed_dim}, num_heads={self.num_heads}, "
            f"batch_first={self.batch_first}, "
            f"curriculum_masking={self.curriculum_masking is not None}"
        )

    def __repr__(self) -> str:
        return f"{type(self).__name__}({self.extra_repr()})"
