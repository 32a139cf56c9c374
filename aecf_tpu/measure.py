"""On-device measurement discipline: RTT-corrected alternating windows.

TPU chips are often reached through a dispatch transport with variable
latency (the development environment's tunnel varies 0.2-35ms between
process phases), where naive per-step timing measures the transport, not
the chip.  These helpers encode the rules every benchmark, sweep and
autotune run in this repo follows (docs/design.md "Measurement
discipline"):

* chain steps on-device with ``lax.scan`` so one dispatch covers a whole
  window (:func:`build_chunk`);
* synchronize by FETCHING a value — ``block_until_ready`` does not
  reliably synchronize through the tunnel;
* measure the transport's round-trip with a trivial dispatch+fetch and
  subtract it from every window (:func:`measure_tunnel_rtt`,
  :func:`net_window`);
* compare implementations only within one process via alternating
  windows, never across processes (:func:`ab_train_windows`).

Used by the repo-root ``bench.py`` (which re-exports them for its own
callers) and by :mod:`aecf_tpu.tune`, the packaged tile autotuner.
"""

from __future__ import annotations

import statistics
import time

import jax
import jax.numpy as jnp

__all__ = [
    "build_chunk",
    "measure_tunnel_rtt",
    "cached_tunnel_rtt",
    "net_window",
    "ab_train_windows",
    "enable_persistent_cache",
]


def build_chunk(batch, modalities, embed, heads, impl, steps_per_call,
                features_dtype="float32", kv_grad=False,
                precision="default", training=True, interpret=False):
    """A jitted K-step training chunk over the fusion pool: full
    forward+backward+SGD with curriculum masking and entropy loss (the
    reference benchmark protocol, BASELINE.md).  Returns
    ``(chunk_fn, params, opt_state)``; ``chunk_fn(params, opt_state,
    start)`` runs ``steps_per_call`` sequentially-carried steps and
    returns the advanced state plus the last loss (fetch it to sync).

    The loss is ``(out²).mean() + entropy_loss`` rather than ``out.sum()``
    — XLA algebraically collapses sum-of-matmul, which would flatter the
    XLA path; the quadratic loss keeps the full backward honest.

    ``impl`` is ``"xla"`` (reference-shaped einsum path), ``"pallas"``
    (two-pass fused fwd + custom_vjp bwd kernels), or ``"fused-step"``
    (the one-pass :func:`~aecf_tpu.kernels.fused_pool_train_step` — loss,
    gradients and side info in a single kv read; H == 1 resident configs
    only).  All three run the identical protocol and produce the same
    parameter trajectory to f32 tolerance — pinned as a multi-step SGD
    lockstep across impls by tests/test_bench_utils.py (hermetically:
    ``training=False`` + ``interpret=True``, valid because gradients are
    mask-draw-independent — reference quirks Q1/Q2).

    ``training=False`` builds the draw-free step (identical gradients,
    no RNG consumed); ``interpret=True`` runs the kernels through the
    Pallas interpreter for CPU-hermetic checks of the kernel impls.
    """
    import optax

    from .core.attention import attention_pool_core
    from .core.init import init_attention_pool_params, init_fusion_query
    from .core.masking import curriculum_mask, entropy_loss
    if impl == "pallas":
        from .kernels import fused_fusion_pool_shared
    elif impl == "fused-step":
        from .kernels import fused_pool_train_step, supports_fused_step

        if not supports_fused_step(heads, embed):
            raise ValueError(
                f"impl='fused-step' covers H=1, resident E only "
                f"(got heads={heads}, embed={embed})"
            )

    params = {
        "pool": init_attention_pool_params(jax.random.key(0), embed),
        "query": init_fusion_query(jax.random.key(1), embed),
    }
    opt = optax.sgd(1e-3)
    opt_state = opt.init(params)

    def one_step(carry, i):
        params, opt_state = carry
        rng = jax.random.fold_in(jax.random.key(42), i)

        if impl == "fused-step":
            # One-pass kernel: gradients computed directly (not via
            # jax.grad); the entropy regularizer is added as a detached
            # VALUE, exactly the gradient the two-pass path yields (Q2:
            # training entropy is detached, so it contributes none).
            loss_pool, d_pool, d_query, _, info = fused_pool_train_step(
                params["pool"], params["query"], modal, rng=rng,
                training=training, base_mask_prob=0.15,
                precision=precision, kv_grad=kv_grad,
                kv_scales=kv_scales, interpret=interpret,
            )
            loss = loss_pool + entropy_loss(
                info["entropy"], seq_len=modalities
            )
            grads = {"pool": d_pool, "query": d_query}
            updates, opt_state = opt.update(grads, opt_state, params)
            return (optax.apply_updates(params, updates), opt_state), loss

        def loss_fn(p):
            if impl == "pallas":
                out, w, mw, info = fused_fusion_pool_shared(
                    p["pool"], p["query"], modal, num_heads=heads,
                    rng=rng, training=training, base_mask_prob=0.15,
                    precision=precision, kv_grad=kv_grad,
                    kv_scales=kv_scales, interpret=interpret,
                )
            else:
                q = jnp.broadcast_to(p["query"], (batch, 1, embed))
                # same context the library's xla dispatch uses — the
                # backward einsums inherit the traced precision
                with jax.default_matmul_precision(precision):
                    out, w = attention_pool_core(
                        p["pool"], q, modal, modal, num_heads=heads,
                        need_weights=True,
                    )
                mw, info = curriculum_mask(
                    w, key=rng, training=training, base_mask_prob=0.15
                )
            # Detach the entropy term explicitly: in TRAINING mode
            # curriculum_mask already detaches it (quirk Q2 — this is a
            # no-op there, the benched program is unchanged), but in the
            # hermetic eval-mode chunk the library's eval entropy is
            # differentiable (round-2 fix) while the fused-step kernel's
            # is a direct value — without this the impls' trajectories
            # legitimately diverge in eval mode only.
            loss = (out * out).mean() + entropy_loss(
                jax.lax.stop_gradient(info["entropy"]),
                seq_len=modalities,
            )
            return loss, info

        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return (optax.apply_updates(params, updates), opt_state), loss

    modal = jax.random.normal(
        jax.random.key(2), (batch, modalities, embed)
    )
    kv_scales = None
    if features_dtype == "int8":
        # int8 feature storage (training path): quantized once up front
        # like a pre-extracted feature store; the kernel dequantizes per
        # tile in VMEM and re-reads kv as int8 in the backward (features
        # frozen by construction = kv_grad=False).
        if impl not in ("pallas", "fused-step"):
            raise ValueError(
                "int8 features bench requires impl='pallas' or 'fused-step'"
            )
        from .kernels import quantize_features

        modal, kv_scales = quantize_features(modal)
    else:
        modal = modal.astype(features_dtype)

    @jax.jit
    def chunk(params, opt_state, start):
        (params, opt_state), losses = jax.lax.scan(
            one_step, (params, opt_state), start + jnp.arange(steps_per_call)
        )
        return params, opt_state, losses[-1]

    return chunk, params, opt_state


def measure_tunnel_rtt(samples: int = 6) -> float:
    """Median round-trip of a trivial dispatch+fetch — the fixed transport
    cost the tunnel adds to every timed window (pure infrastructure, not
    chip time; subtract it from benchmark windows)."""

    @jax.jit
    def _nop(x):
        return x + 1.0

    z = jnp.float32(0)
    float(_nop(z))
    rtts = []
    for _ in range(samples):
        t0 = time.perf_counter()
        z = _nop(z)
        float(z)
        rtts.append(time.perf_counter() - t0)
    return statistics.median(rtts)


_CACHED_RTT = None


def cached_tunnel_rtt():
    """:func:`measure_tunnel_rtt`, measured once per process and reused —
    every window-timing helper must subtract the same fixed transport
    cost or A/B ratios pick up cross-measurement RTT drift."""
    global _CACHED_RTT
    if _CACHED_RTT is None:
        _CACHED_RTT = measure_tunnel_rtt()
    return _CACHED_RTT


def net_window(elapsed, rtt_s):
    """RTT-corrected window length: never subtract more than 90% of the
    raw window (RTT-estimate noise floor).  THE one clamp rule — suite,
    tile sweeps and byte profiles all ride this."""
    return max(elapsed - rtt_s, 0.1 * elapsed)


def ab_train_windows(chunks, batch, steps_per_call, rounds, rtt_s, *,
                     call=None):
    """Alternating timed windows over pre-warmed chunks — the only
    within-run measurement the tunnel's phase-dependent dispatch latency
    doesn't poison (docs/design.md "Measurement discipline").

    ``chunks`` maps label -> chunk state; ``None`` values are skipped
    (failed compiles in sweeps).  The default state convention is the
    :func:`build_chunk` train triple ``(chunk_fn, params, opt_state)``;
    pass ``call(state, window_index) -> (new_state, value_to_fetch)`` for
    other shapes (e.g. eval chunks carrying a bare accumulator).  Callers
    must warm each chunk (one call + value fetch) at build time, BEFORE
    any env-var kernel knobs are restored — compilation happens on that
    first call.  Each timed window runs ``steps_per_call``
    sequentially-carried steps and syncs by fetching a value; the fixed
    tunnel RTT is subtracted, clamped to at most 90% of the window
    (RTT-estimate noise floor).  Mutates ``chunks`` with the advanced
    state and returns {label: [samples/s per window]}.
    """
    if call is None:
        def call(state, r):
            c, p, s = state
            p, s, loss = c(p, s, jnp.int32(r * steps_per_call))
            return (c, p, s), loss

    res = {m: [] for m, v in chunks.items() if v is not None}
    for r in range(1, rounds + 1):
        for m in res:
            t0 = time.perf_counter()
            state, fetch = call(chunks[m], r)
            float(fetch)  # value fetch: reliable sync through the tunnel
            elapsed = time.perf_counter() - t0
            res[m].append(
                batch * steps_per_call / net_window(elapsed, rtt_s)
            )
            chunks[m] = state
    return res


def enable_persistent_cache(cache_dir=None):
    """Persistent compilation cache (works for remote-compiled TPU
    executables too — measured: a cached training chunk loads in seconds
    vs 10-25 minutes of remote compile in bad tunnel phases).

    ``cache_dir`` defaults to ``$AECF_CACHE_DIR`` if set, else
    ``~/.cache/aecf_tpu/jax_cache``.  The repo-root ``bench.py`` pins the
    repo's own warmed cache instead.
    """
    import os

    if cache_dir is None:
        cache_dir = os.environ.get("AECF_CACHE_DIR") or os.path.join(
            os.path.expanduser("~"), ".cache", "aecf_tpu", "jax_cache"
        )
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
