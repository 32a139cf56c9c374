#!/usr/bin/env python3
"""AECF benchmark suite — throughput + parity across the BASELINE configs.

Re-creates the capability of the reference's deleted
``test_suite/aecf_benchmark_suite.py`` (README.md:281, PYPI_READY.md:50-59):
one command that measures every BASELINE.json config and checks numerics
against the oracle.

Configs (BASELINE.json):
  #1 README quick-start      — B=32,   M=2, E=512,  H=1
  #2 functional + masking    — B=256,  M=3, E=512,  H=1 (mask_prob=0.15)
  #3 X-ray experiment        — exercised by examples/train_xrays.py
  #4 VisionLanguage pattern  — B=256, img2048+txt768 → 512
  #5 large contrastive       — B=8192, M=4, E=1024, H=1 (single-chip slice;
     the multi-chip version is exercised by __graft_entry__.dryrun_multichip)

Usage: python benchmarks/suite.py [--quick] [--json out.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


_ANNOUNCED = False


def tunnel_rtt():
    """Process-cached transport cost (bench.cached_tunnel_rtt), announced
    once."""
    global _ANNOUNCED
    from bench import cached_tunnel_rtt

    rtt = cached_tunnel_rtt()
    if not _ANNOUNCED:
        _ANNOUNCED = True
        print(f"tunnel rtt: {rtt * 1e3:.1f}ms (subtracted from windows)",
              flush=True)
    return rtt


def _net(elapsed):
    from bench import net_window

    return net_window(elapsed, tunnel_rtt())


def throughput(batch, modalities, embed, heads, impl, quick):
    """Returns (samples/sec, (jitted_chunk, args, K)) — the compiled chunk
    rides along so the caller can attach XLA cost-analysis rooflines."""
    from bench import build_chunk

    K = 10 if quick else 60
    rounds = 2 if quick else 4
    chunk, params, opt_state = build_chunk(
        batch, modalities, embed, heads, impl, K
    )
    args0 = (params, opt_state, jnp.int32(0))
    params, opt_state, loss = chunk(params, opt_state, jnp.int32(0))
    float(loss)  # value fetch: reliable sync through the tunnel
    t0 = time.perf_counter()
    for r in range(1, rounds + 1):
        params, opt_state, loss = chunk(params, opt_state, jnp.int32(r * K))
    float(loss)  # value fetch: reliable sync through the tunnel
    sps = batch * rounds * K / _net(time.perf_counter() - t0)
    return sps, (chunk, args0, K)


def parity_check(retries: int = 2):
    """Numerics gate: fused kernel vs fp32 oracle at 1e-5 (BASELINE.json).

    Retries on failure (recording every attempt): one suite run observed a
    NaN/garbage comparison immediately after the sustained throughput
    configs that was unreproducible in isolation or in the on-chip test
    suite — consistent with a transient device/tunnel glitch, not kernel
    numerics.  A persistent failure still fails the gate.
    """
    attempts = []
    for _ in range(retries + 1):
        r = _parity_once()
        attempts.append(r)
        if r.get("pass_1e-5") or "skipped" in r:
            if len(attempts) > 1:
                r = dict(r, flaky_attempts=attempts[:-1])
            return r
    return dict(attempts[-1], flaky_attempts=attempts[:-1])


def _parity_once():
    from aecf_tpu.core.attention import attention_pool_core
    from aecf_tpu.core.init import (
        init_attention_pool_params,
        init_fusion_query,
    )

    if jax.default_backend() != "tpu":
        return {"skipped": "no TPU"}  # before the oracle compile: on a
        # 1-vCPU box compiles dominate, don't pay one to skip
    E, M, B = 256, 3, 128
    params = init_attention_pool_params(jax.random.key(0), E)
    query = init_fusion_query(jax.random.key(1), E)
    kv = jax.random.normal(jax.random.key(2), (B, M, E))
    with jax.default_matmul_precision("highest"):
        out_o, w_o = attention_pool_core(
            params,
            jnp.broadcast_to(query, (B, 1, E)),
            kv,
            kv,
            num_heads=1,
            need_weights=True,
        )
    from aecf_tpu.kernels import fused_fusion_pool_shared

    out_k, w_k, _, info = fused_fusion_pool_shared(
        params, query, kv, training=False, precision="highest"
    )
    return {
        "out_maxdiff": float(jnp.abs(out_k - out_o).max()),
        "weights_maxdiff": float(jnp.abs(w_k - w_o).max()),
        "pass_1e-5": bool(
            jnp.abs(out_k - out_o).max() < 1e-5
            and jnp.abs(w_k - w_o).max() < 1e-5
        ),
    }


def bwd_ab(quick):
    """Within-run A/B of the shared kernel's backward at the compute-bound
    config (E=1024, M=4): XLA einsum backward vs the fused Pallas backward.
    Alternating timed windows in the same process — the only measurement
    the tunnel's phase-dependent dispatch latency doesn't poison."""
    import statistics

    from bench import build_chunk

    B, M, E, H = 8192, 4, 1024, 1
    # Long windows: each pays one tunnel RTT (up to ~35ms in bad phases) —
    # K must be large enough that compute dominates or the ratio compresses
    # toward 1.
    K = 20 if quick else 80
    rounds = 3 if quick else 5

    chunks = {}
    try:
        for mode in ("xla", "pallas"):
            os.environ["AECF_SHARED_BWD"] = mode
            # kv_grad=True: full-cotangent backward, comparable per round.
            c, p, s = build_chunk(B, M, E, H, "pallas", K, kv_grad=True)
            p, s, loss = c(p, s, jnp.int32(0))
            float(loss)  # value fetch: reliable sync through the tunnel
            chunks[mode] = (c, p, s)
    finally:
        # section() swallows exceptions by design — a compile failure must
        # not leak the forced backward into every later A/B section
        os.environ.pop("AECF_SHARED_BWD", None)

    from bench import ab_train_windows

    res = ab_train_windows(chunks, B, K, rounds, tunnel_rtt())
    med = {m: statistics.median(v) for m, v in res.items()}
    return {
        "config": f"B={B},M={M},E={E},H={H}",
        "xla_bwd_median_sps": round(med["xla"], 1),
        "pallas_bwd_median_sps": round(med["pallas"], 1),
        "xla_bwd_best_sps": round(max(res["xla"]), 1),
        "pallas_bwd_best_sps": round(max(res["pallas"]), 1),
        "speedup_median": round(med["pallas"] / med["xla"], 3),
        "speedup_best": round(max(res["pallas"]) / max(res["xla"]), 3),
    }


def kv_grad_ab(quick, B=4096, M=3, E=512, H=1):
    """Within-run A/B of kv_grad=True (full d_kv cotangent) vs kv_grad=False
    (frozen-features protocol — the torch baseline's: modal has no
    requires_grad).  Skipping the (B, M, E) d_kv write removes a third of
    the backward's HBM traffic at memory-bound shapes."""
    import statistics

    from bench import build_chunk

    # The north-star step is ~140µs: K must be large enough that the
    # window dwarfs the ~25ms tunnel RTT or the subtracted residual is
    # noise-dominated (observed 1.1-1.8x swings at K=80).
    K = 40 if quick else 300
    rounds = 3 if quick else 5

    chunks = {}
    for grad_kv in (True, False):
        c, p, s = build_chunk(B, M, E, H, "pallas", K, kv_grad=grad_kv)
        p, s, loss = c(p, s, jnp.int32(0))
        float(loss)  # value fetch: reliable sync through the tunnel
        chunks[grad_kv] = (c, p, s)

    from bench import ab_train_windows

    res = ab_train_windows(chunks, B, K, rounds, tunnel_rtt())
    med = {m: statistics.median(v) for m, v in res.items()}
    return {
        "config": f"B={B},M={M},E={E},H={H}",
        "kv_grad_median_sps": round(med[True], 1),
        "no_kv_grad_median_sps": round(med[False], 1),
        "kv_grad_best_sps": round(max(res[True]), 1),
        "no_kv_grad_best_sps": round(max(res[False]), 1),
        "speedup_median": round(med[False] / med[True], 3),
        "speedup_best": round(max(res[False]) / max(res[True]), 3),
    }


def features_dtype_ab(quick, B=4096, M=3, E=512, H=1, impl="pallas"):
    """Within-run A/B of f32 vs bf16 feature storage on the full train
    step (kv_grad=False).  Rounds 2-3 called bf16 a wash from short
    windows; benchmarks/profile_bytes.py showed that was RTT noise —
    with >=50ms windows bf16 wins ~1.14x at the north star (fwd alone
    1.17x; the pure kv read halves exactly).  This keeps the measurement
    in the suite artifact (round-3 verdict Next #1).  ``impl=`` selects
    the step family: 'pallas' (two-pass, the historical protocol) or
    'fused-step' (the one-pass kernel, where kv is a larger fraction of
    the remaining bytes so the bf16 win should compound — round-4
    verdict Weak #3)."""
    import statistics

    from bench import build_chunk

    # Same window discipline as kv_grad_ab: the ~120us step needs K large
    # enough that the window dwarfs the ~25ms tunnel RTT.
    K = 40 if quick else 400
    rounds = 3 if quick else 6

    chunks = {}
    for dt in ("float32", "bfloat16"):
        c, p, s = build_chunk(B, M, E, H, impl, K,
                              features_dtype=dt, kv_grad=False)
        p, s, loss = c(p, s, jnp.int32(0))
        float(loss)  # value fetch: reliable sync through the tunnel
        chunks[dt] = (c, p, s)

    from bench import ab_train_windows

    res = ab_train_windows(chunks, B, K, rounds, tunnel_rtt())
    med = {m: statistics.median(v) for m, v in res.items()}
    return {
        "config": f"B={B},M={M},E={E},H={H},impl={impl},kv_grad=False",
        "f32_median_sps": round(med["float32"], 1),
        "bf16_median_sps": round(med["bfloat16"], 1),
        "bf16_speedup_median": round(med["bfloat16"] / med["float32"], 3),
        "bf16_speedup_best": round(
            max(res["bfloat16"]) / max(res["float32"]), 3
        ),
    }


def features_q8_ab(quick, B=4096, M=3, E=512, H=1, impl="pallas"):
    """Within-run A/B of f32 vs int8 feature storage on the full train
    step (round 4: the q8 custom_vjp makes int8 a TRAINING option, not
    just serving).  The kv stream — dominant in both passes at these
    memory-bound shapes — drops to a quarter of the f32 bytes; features
    are frozen by construction, the exact kv_grad=False protocol.
    Same >=50ms-window discipline as features_dtype_ab."""
    import statistics

    from bench import ab_train_windows, build_chunk

    K = 40 if quick else 400
    rounds = 3 if quick else 6

    chunks = {}
    for dt in ("float32", "int8"):
        c, p, s = build_chunk(B, M, E, H, impl, K,
                              features_dtype=dt, kv_grad=False)
        p, s, loss = c(p, s, jnp.int32(0))
        float(loss)  # value fetch: reliable sync through the tunnel
        chunks[dt] = (c, p, s)

    res = ab_train_windows(chunks, B, K, rounds, tunnel_rtt())
    med = {m: statistics.median(v) for m, v in res.items()}
    return {
        "config": f"B={B},M={M},E={E},H={H},impl={impl},kv_grad=False",
        "f32_median_sps": round(med["float32"], 1),
        "int8_median_sps": round(med["int8"], 1),
        "int8_speedup_median": round(med["int8"] / med["float32"], 3),
        "int8_speedup_best": round(
            max(res["int8"]) / max(res["float32"]), 3
        ),
    }


def streamed_mix_ab(quick, B=4096, M=4, E=2048, H=1):
    """Within-run A/B of AECF_STREAM_MIX=bf16 (round 5): the streamed
    split's mix/d_mix kernel<->XLA round-trips stored bf16 vs f32.  The
    analytic bound is ~1.15x at E=2048/H=1 (mix terms ~4·B·H·E·4 of a
    ~670MB step); measured here so the knob's value is a number.  Env is
    read at trace time (like AECF_SHARED_BWD) and restored either way."""
    import statistics

    from bench import ab_train_windows, build_chunk

    K = 10 if quick else 60
    rounds = 3 if quick else 5

    chunks = {}
    try:
        for mode in ("f32", "bf16"):
            if mode == "bf16":
                os.environ["AECF_STREAM_MIX"] = "bf16"
            else:
                os.environ.pop("AECF_STREAM_MIX", None)
            c, p, s = build_chunk(B, M, E, H, "pallas", K, kv_grad=False)
            p, s, loss = c(p, s, jnp.int32(0))
            float(loss)  # value fetch: reliable sync through the tunnel
            chunks[mode] = (c, p, s)
    finally:
        os.environ.pop("AECF_STREAM_MIX", None)

    res = ab_train_windows(chunks, B, K, rounds, tunnel_rtt())
    med = {m: statistics.median(v) for m, v in res.items()}
    return {
        "config": f"B={B},M={M},E={E},H={H},kv_grad=False",
        "f32_median_sps": round(med["f32"], 1),
        "bf16_mix_median_sps": round(med["bf16"], 1),
        "bf16_mix_speedup_median": round(med["bf16"] / med["f32"], 3),
        "bf16_mix_speedup_best": round(
            max(res["bf16"]) / max(res["f32"]), 3
        ),
    }


def streamed_e2048_ab(quick, B=4096, M=4, E=2048, H=1):
    """Within-run A/B at E=2048 (beyond the resident-weight kernels' VMEM
    cap): the streamed split (Pallas one-pass-over-kv + XLA E×E GEMMs) vs
    the full XLA fallback.  Round-2 verdict Next #3's 'done' gate."""
    import statistics

    from bench import build_chunk

    K = 20 if quick else 60
    rounds = 3 if quick else 5

    chunks = {}
    for impl in ("xla", "pallas"):
        c, p, s = build_chunk(B, M, E, H, impl, K, kv_grad=False)
        p, s, loss = c(p, s, jnp.int32(0))
        float(loss)  # value fetch: reliable sync through the tunnel
        chunks[impl] = (c, p, s)

    from bench import ab_train_windows

    res = ab_train_windows(chunks, B, K, rounds, tunnel_rtt())
    med = {m: statistics.median(v) for m, v in res.items()}
    return {
        "config": f"B={B},M={M},E={E},H={H},kv_grad=False",
        "xla_median_sps": round(med["xla"], 1),
        "streamed_median_sps": round(med["pallas"], 1),
        "xla_best_sps": round(max(res["xla"]), 1),
        "streamed_best_sps": round(max(res["pallas"]), 1),
        "speedup_median": round(med["pallas"] / med["xla"], 3),
        "speedup_best": round(max(res["pallas"]) / max(res["xla"]), 3),
    }


def h2_belowcap_stream_ab(quick, B=8192, M=4, E=1024, H=2,
                          kv_grad=False):
    """Within-run A/B of the H=2 BELOW-CAP differentiable dispatch
    (round 4): resident fused forward + XLA einsum backward
    (AECF_H2_STREAM=0) vs the streamed split (one-pass two-head mix
    kernel forward + one-pass multi-head Pallas backward).  The streamed
    backward reads kv once where the XLA einsum backward reads it 4x,
    which dominates at these memory-bound shapes even though the
    resident forward alone is faster — so `_vjp_wants_streamed` routes
    H=2, E>=512 training through the streamed split while eval keeps
    the resident kernel."""
    import statistics

    from bench import ab_train_windows, build_chunk

    K = 20 if quick else 80
    rounds = 3 if quick else 5

    chunks = {}
    prior = os.environ.get("AECF_H2_STREAM")  # restore, don't clobber: a
    # caller-exported knob must keep governing the rest of the suite run
    try:
        for mode in ("resident", "streamed"):
            os.environ["AECF_H2_STREAM"] = "0" if mode == "resident" else "auto"
            c, p, s = build_chunk(B, M, E, H, "pallas", K, kv_grad=kv_grad)
            p, s, loss = c(p, s, jnp.int32(0))
            float(loss)  # value fetch: reliable sync through the tunnel
            chunks[mode] = (c, p, s)
    finally:
        if prior is None:
            os.environ.pop("AECF_H2_STREAM", None)
        else:
            os.environ["AECF_H2_STREAM"] = prior

    res = ab_train_windows(chunks, B, K, rounds, tunnel_rtt())
    med = {m: statistics.median(v) for m, v in res.items()}
    return {
        "config": f"B={B},M={M},E={E},H={H},kv_grad={kv_grad}",
        "resident_median_sps": round(med["resident"], 1),
        "streamed_median_sps": round(med["streamed"], 1),
        "resident_best_sps": round(max(res["resident"]), 1),
        "streamed_best_sps": round(max(res["streamed"]), 1),
        "speedup_median": round(med["streamed"] / med["resident"], 3),
        "speedup_best": round(max(res["streamed"]) / max(res["resident"]), 3),
    }


def precision_ab(quick, B=4096, M=3, E=512, H=1):
    """Within-run A/B of MXU precision for the big GEMMs: 'default'
    (one bf16-input f32-accumulate pass — the standard TPU training
    configuration and the bench headline) vs 'highest' (multi-pass full
    f32 — the library API default, chosen for torch-f32 parity).  Keeps
    the cost of the parity mode measured, not assumed.

    PROTOCOL NOTE (round 4→5): dispatch follows ``resolve_impl``, so
    since the one-pass step kernel landed this section measures the
    precision gap on ``impl='fused-step'`` for qualifying configs (H=1
    resident), where it previously measured the two-pass kernels —
    compare across rounds per-impl, not per-section-name."""
    import statistics

    from bench import ab_train_windows, build_chunk, resolve_impl

    impl = resolve_impl(H, E)
    K = 40 if quick else 300
    rounds = 3 if quick else 5

    chunks = {}
    for prec in ("default", "highest"):
        c, p, s = build_chunk(B, M, E, H, impl, K, kv_grad=False,
                              precision=prec)
        p, s, loss = c(p, s, jnp.int32(0))
        float(loss)  # value fetch: reliable sync through the tunnel
        chunks[prec] = (c, p, s)

    res = ab_train_windows(chunks, B, K, rounds, tunnel_rtt())
    med = {m: statistics.median(v) for m, v in res.items()}
    return {
        "config": f"B={B},M={M},E={E},H={H},impl={impl},kv_grad=False",
        "default_median_sps": round(med["default"], 1),
        "highest_median_sps": round(med["highest"], 1),
        "highest_cost_median": round(med["default"] / med["highest"], 3),
        "highest_cost_best": round(
            max(res["default"]) / max(res["highest"]), 3
        ),
    }


def eval_forward_ab(quick, B=8192, M=4, E=1024):
    """Serving-path throughput: eval forward, f32 vs int8-quantized kv,
    within-run alternating windows at the memory-bound config."""
    import statistics

    from aecf_tpu.core.init import (
        init_attention_pool_params,
        init_fusion_query,
    )
    from aecf_tpu.kernels import fused_fusion_pool_shared, quantize_features

    params = init_attention_pool_params(jax.random.key(0), E)
    query = init_fusion_query(jax.random.key(1), E)
    kv = jax.random.normal(jax.random.key(2), (B, M, E))
    q8, scales = quantize_features(kv)

    K = 20 if quick else 80
    rounds = 3 if quick else 5

    def chunk_for(feats, fscales):
        def one(acc, _):
            out, _, _, _ = fused_fusion_pool_shared(
                params, query, feats, training=False, kv_scales=fscales
            )
            # sequential carry so XLA can't hoist the body out of the scan
            return acc + out[:1, 0, :1].sum(), 0.0

        @jax.jit
        def chunk(acc):
            acc, _ = jax.lax.scan(one, acc, jnp.arange(K))
            return acc

        return chunk

    chunks = {
        "f32": (chunk_for(kv, None), jnp.float32(0)),
        "int8": (chunk_for(q8, scales), jnp.float32(0)),
    }
    for m, (c, acc) in chunks.items():
        acc = c(acc)
        float(acc)  # value fetch: reliable sync through the tunnel
        chunks[m] = (c, acc)

    from bench import ab_train_windows

    def eval_call(state, _r):
        c, acc = state
        acc = c(acc)
        return (c, acc), acc

    res = ab_train_windows(chunks, B, K, rounds, tunnel_rtt(),
                           call=eval_call)
    med = {m: statistics.median(v) for m, v in res.items()}
    return {
        "config": f"B={B},M={M},E={E},H=1 eval fwd",
        "f32_median_sps": round(med["f32"], 1),
        "int8_median_sps": round(med["int8"], 1),
        "int8_speedup_median": round(med["int8"] / med["f32"], 3),
    }


def serving_frozen_bench(quick):
    """Frozen-export serving perf (round-3 verdict Weak #6): per-bucket
    latency/throughput of ``load_exported_predictor`` StableHLO artifacts
    next to the live jit predictor, plus MicroBatcher saturation
    throughput over the frozen path.  Latencies include one host→device
    transfer + fetch per call (that IS the serving cost); the
    RTT-subtracted column removes the tunnel's fixed per-call transport
    so the numbers transfer to a locally-attached chip."""
    import statistics
    import tempfile
    import threading

    from aecf_tpu.models import VisionLanguageModel
    from aecf_tpu.serve import (
        FusionPredictor,
        MicroBatcher,
        export_predictor,
        load_exported_predictor,
    )

    model = VisionLanguageModel(num_classes=1000)
    params = model.init(jax.random.key(0))
    live = FusionPredictor(
        lambda p, image, text: model.apply(p, image, text, training=False),
        params,
        modality_names=("image", "text"),
        buckets=(32, 256, 1024),
    )
    rng = np.random.default_rng(0)
    img = rng.normal(size=(1024, 2048)).astype(np.float32)
    txt = rng.normal(size=(1024, 768)).astype(np.float32)
    live(image=img[:8], text=txt[:8])  # seed dims + warm smallest bucket

    results = {"config": "VisionLanguageModel img2048+txt768->512, C=1000"}
    reps = 3 if quick else 10
    with tempfile.TemporaryDirectory() as d:
        export_predictor(live, f"{d}/frozen.npz")
        frozen = load_exported_predictor(f"{d}/frozen.npz")

        results["buckets"] = {}
        for b in (32, 256, 1024):
            entry = {}
            for name, pred in (("live", live), ("frozen", frozen)):
                pred(image=img[:b], text=txt[:b])  # warm this bucket
                ts = []
                for _ in range(reps):
                    t0 = time.perf_counter()
                    pred(image=img[:b], text=txt[:b])
                    ts.append(time.perf_counter() - t0)
                med = statistics.median(ts)
                net = max(med - tunnel_rtt(), 0.1 * med)
                entry[name] = {
                    "latency_ms": round(med * 1e3, 2),
                    "latency_ms_minus_rtt": round(net * 1e3, 2),
                    "samples_per_sec": round(b / net, 1),
                }
            entry["frozen_vs_live"] = round(
                entry["live"]["latency_ms_minus_rtt"]
                / max(entry["frozen"]["latency_ms_minus_rtt"], 1e-9),
                3,
            )
            results["buckets"][str(b)] = entry

        # MicroBatcher saturation over the frozen path: many concurrent
        # small requests coalesced into bucket-sized device calls.
        mb = MicroBatcher(frozen, max_batch=256, max_wait_ms=2.0)
        calls_before = frozen.calls
        n_threads = 16
        per_thread = 5 if quick else 20
        rows_per_req = 4

        completed = [0] * n_threads
        failures: list = []

        def worker(i):
            lo = (i * rows_per_req) % 512
            for _ in range(per_thread):
                # count what actually ran: join() returns normally even
                # when a worker died, and throughput computed from the
                # PLANNED row count would silently inflate the artifact
                try:
                    mb(
                        image=img[lo : lo + rows_per_req],
                        text=txt[lo : lo + rows_per_req],
                    )
                    completed[i] += 1
                except Exception as e:  # noqa: BLE001 — artifact boundary
                    failures.append(f"{type(e).__name__}: {str(e)[:120]}")

        threads = [
            threading.Thread(target=worker, args=(i,))
            for i in range(n_threads)
        ]
        t0 = time.perf_counter()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        elapsed = time.perf_counter() - t0
        mb.stop()
        done_requests = sum(completed)
        total_rows = done_requests * rows_per_req
        results["microbatcher_frozen"] = {
            "total_rows": total_rows,
            "requests": done_requests,
            "device_calls": frozen.calls - calls_before,
            "samples_per_sec": round(total_rows / elapsed, 1),
            "coalescing": round(
                done_requests / max(frozen.calls - calls_before, 1), 1
            ),
        }
        if failures:
            results["microbatcher_frozen"]["failed_requests"] = len(failures)
            results["microbatcher_frozen"]["failures"] = failures[:5]
    return results


def vlm_roofline(sps, B, params):
    """Analytic roofline for the whole-model VLM config (round-4 ROADMAP
    item: XLA's cost_analysis overcounts fused reuse ~3.7x here, so the
    artifact carried a flagged entry; this replaces it with a physical
    byte model).

    At B=256 with ~3M params the step is OPTIMIZER-bound: AdamW traffic
    (read + write of p/m/v — 6 f32 streams over every param; grads are
    intermediates of the same scan body, fused into the update rather
    than round-tripping HBM) dominates bytes; activations (B x 512)
    are noise.  GEMM flops are approximated as one
    (B, d_in)x(d_in, d_out) per 2-D weight per sample, x3 for
    fwd + both backward GEMMs (the pool's kv projections run on M=2
    rows, slightly undercounted — flops are nowhere near the bound
    here, mfu ~0.02)."""
    from bench import (
        DISPATCH_FLOOR_S,
        V5E_PEAK_FLOPS,
        V5E_PEAK_HBM_BYTES,
    )

    leaves = jax.tree_util.tree_leaves(params)
    n_params = sum(x.size for x in leaves)
    gemm_macs = sum(B * x.size for x in leaves if x.ndim == 2)
    flops = 3 * 2 * gemm_macs
    bytes_accessed = (
        6 * 4 * n_params          # AdamW: read + write p, m, v
        + 2 * 4 * B * (2048 + 768)  # inputs read fwd + bwd
        + 3 * 4 * B * 1000          # logits w + loss-bwd r + d_logits w
    )
    steps_per_sec = sps / B
    mfu = flops * steps_per_sec / V5E_PEAK_FLOPS
    hbm_frac = bytes_accessed * steps_per_sec / V5E_PEAK_HBM_BYTES
    out = {
        "model": "analytic-optimizer-bound",
        "mfu": round(mfu, 4),
        "hbm_frac": round(hbm_frac, 4),
        "flops_per_step": flops,
        "hbm_bytes_per_step": bytes_accessed,
        "params": int(n_params),
    }
    if 1.0 / steps_per_sec < DISPATCH_FLOOR_S:
        out["dispatch_bound"] = True
    if mfu > 1.0 or hbm_frac > 1.0:
        out["model_exceeds_roofline"] = True
    return out


def vlm_throughput(quick):
    """Config #4: full VisionLanguageModel train step."""
    import optax

    from aecf_tpu.models import VisionLanguageModel
    from aecf_tpu.train import TrainState, bce_with_logits_loss

    B = 256
    model = VisionLanguageModel(num_classes=1000)
    params = model.init(jax.random.key(0))
    opt = optax.adamw(1e-4)
    state = TrainState(params, opt.init(params), jnp.zeros((), jnp.int32))
    img = jax.random.normal(jax.random.key(1), (B, 2048))
    txt = jax.random.normal(jax.random.key(2), (B, 768))
    lab = (
        jax.random.uniform(jax.random.key(3), (B, 1000)) < 0.01
    ).astype(jnp.float32)

    K = 10 if quick else 25

    def one(carry, i):
        state = carry
        rng = jax.random.fold_in(jax.random.key(7), i)

        def loss_fn(p):
            logits, info = model.apply(
                p, img, txt, training=True, rng=rng, return_info=True
            )
            return bce_with_logits_loss(logits, lab), info

        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        upd, opt_state = opt.update(grads, state.opt_state, state.params)

        return (
            TrainState(
                optax.apply_updates(state.params, upd),
                opt_state,
                state.step + 1,
            ),
            loss,
        )

    @jax.jit
    def chunk(state):
        state, losses = jax.lax.scan(one, state, jnp.arange(K))
        return state, losses[-1]

    state, loss = chunk(state)
    float(loss)  # value fetch: reliable sync through the tunnel
    rounds = 2 if quick else 4
    t0 = time.perf_counter()
    for _ in range(rounds):
        state, loss = chunk(state)
    float(loss)  # value fetch: reliable sync through the tunnel
    sps = B * rounds * K / _net(time.perf_counter() - t0)
    return sps, (chunk, (state,), B)


def _write_json_atomic(path, obj):
    """tmp + os.replace: a kill mid-dump must not truncate an artifact
    holding hours of already-measured sections (the same pattern as
    loader.build_native)."""
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(obj, f, indent=2)
    os.replace(tmp, path)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--json", default=None)
    ap.add_argument("--impl", default="auto",
                    choices=["auto", "xla", "pallas", "fused-step"])
    ap.add_argument("--only", default=None, metavar="SECTION",
                    help="run a single TPU A/B section (e.g. "
                         "serving_frozen) and skip the config sweep")
    args = ap.parse_args()

    # keep in sync with the section(...) calls + the vlm branch below; a
    # typo'd --only would otherwise run nothing and exit 0 with an
    # artifact the user believes was re-measured.
    known_sections = {
        "vlm_B256",
        "shared_bwd_ab_large",
        "kv_grad_ab_north_star",
        "kv_grad_ab_large",
        "features_dtype_ab_north_star",
        "features_dtype_ab_large",
        "features_q8_ab_north_star",
        "features_q8_ab_large",
        "features_dtype_ab_fused_north_star",
        "features_dtype_ab_fused_large",
        "features_q8_ab_fused_north_star",
        "eval_fwd_ab_large",
        "eval_fwd_ab_e2048",
        "precision_ab_north_star",
        "precision_ab_heads8",
        "streamed_e2048_ab",
        "streamed_mix_ab_e2048",
        "streamed_mix_ab_h2_e1024",
        "streamed_h2_e2048_ab",
        "h2_belowcap_stream_ab_e512",
        "h2_belowcap_stream_ab_e1024",
        "serving_frozen",
        # config names re-run just that config's sps + roofline
        "quickstart_B32_M2_E512",
        "masking_B256_M3_E512",
        "north_star_B4096_M3_E512",
        "heads8_B4096_M3_E512",
        "large_B8192_M4_E1024",
    }
    if args.only and args.only not in known_sections:
        raise SystemExit(
            f"--only {args.only!r} is not a section; "
            f"choose from {sorted(known_sections)}"
        )

    from bench import enable_persistent_cache, resolve_impl

    enable_persistent_cache()

    results = {"backend": jax.default_backend(), "impl": args.impl}

    if args.only and jax.default_backend() != "tpu":
        raise SystemExit("--only runs TPU A/B sections; needs the chip")
    if args.only and args.json and os.path.exists(args.json):
        # merge the single re-run section into the existing artifact
        # instead of clobbering the other sections
        with open(args.json) as f:
            prev = json.load(f)
        prev.update(results)
        results = prev

    all_configs = [
        ("quickstart_B32_M2_E512", 32, 2, 512, 1),
        ("masking_B256_M3_E512", 256, 3, 512, 1),
        ("north_star_B4096_M3_E512", 4096, 3, 512, 1),
        ("heads8_B4096_M3_E512", 4096, 3, 512, 8),
        ("large_B8192_M4_E1024", 8192, 4, 1024, 1),
    ]
    if args.only:
        # a config name as --only re-runs just that config (measured sps
        # + roofline) and merges it into the artifact like any section
        configs = [c for c in all_configs if c[0] == args.only]
    else:
        configs = all_configs
    if not args.only:  # keep a merged artifact's config sweep intact
        results["impl_per_config"] = {}
        results["roofline_per_config"] = {}
    for name, B, M, E, H in configs:
        # per-config auto dispatch (heads8 routes to XLA — measured faster)
        impl = args.impl if args.impl != "auto" else resolve_impl(H, E)
        try:
            sps, (chunk, args0, K) = throughput(
                B, M, E, H, impl, args.quick
            )
        except ValueError as e:
            # a forced --impl (e.g. fused-step) can miss a config's
            # coverage gate; record the skip instead of crashing the sweep
            results[name] = f"skipped ({e})"
            print(f"{name}: skipped ({e})", flush=True)
            continue
        results[name] = round(sps, 1)
        results.setdefault("impl_per_config", {})[name] = impl
        print(f"{name}: {sps:,.0f} samples/s ({impl})", flush=True)
        if jax.default_backend() == "tpu":
            try:
                if impl in ("pallas", "fused-step"):
                    # MFU + HBM-bandwidth fraction at the measured
                    # throughput, from the analytic fused-path cost model
                    # (bench.roofline picks the streamed-analytic model
                    # itself for E above the resident cap, and the
                    # one-pass fused-step model for impl='fused-step').
                    # Sub-floor or model-exceeding configs come back
                    # FLAGGED (round-3 verdict Weak #1), never silently
                    # >1.0.
                    from bench import roofline

                    results.setdefault("roofline_per_config", {})[
                        name
                    ] = roofline(sps, B, M, E, H, kv_grad=False, impl=impl)
                else:
                    # XLA-dispatched pool configs (heads8): analytic
                    # roofline — exact GEMM flops + mandatory-traffic byte
                    # lower bound (round-4 ROADMAP item: XLA's
                    # bytes-accessed overcounts fused reuse ~2x here, so
                    # its entry shipped flagged).  XLA's own post-fusion
                    # count stays nested as an independent cross-check.
                    from bench import xla_pool_roofline, xla_roofline

                    rl = xla_pool_roofline(
                        sps, B, M, E, H, kv_grad=False
                    )
                    rl["xla_cost_analysis"] = xla_roofline(
                        sps, B, chunk, args0
                    )
                    results.setdefault("roofline_per_config", {})[
                        name
                    ] = rl
            except Exception as e:  # keep the measured sps either way
                results.setdefault("roofline_per_config", {})[
                    name
                ] = {"error": repr(e)}

    if not args.only or args.only == "vlm_B256":
        vlm_sps, (vlm_chunk, vlm_args, vlm_B) = vlm_throughput(args.quick)
        results["vlm_B256"] = round(vlm_sps, 1)
        print(f"vlm_B256: {results['vlm_B256']:,.0f} samples/s", flush=True)
        if jax.default_backend() == "tpu":
            # whole-model config: roofline from XLA's post-fusion cost
            # analysis, same as the other XLA-dispatched configs — no
            # config reports a throughput without a roofline context.
            # Fault-isolated like the per-config rooflines: keep the
            # measured sps even if cost_analysis raises.
            try:
                from bench import xla_roofline

                rl = vlm_roofline(vlm_sps, vlm_B, vlm_args[0].params)
                # keep XLA's own post-fusion count alongside as an
                # independent (overcounting, flagged) cross-check
                rl["xla_cost_analysis"] = xla_roofline(
                    vlm_sps, vlm_B, vlm_chunk, vlm_args
                )
                results.setdefault("roofline_per_config", {})[
                    "vlm_B256"
                ] = rl
            except Exception as e:
                results.setdefault("roofline_per_config", {})[
                    "vlm_B256"
                ] = {"error": repr(e)}

    if not args.only:
        results["parity"] = parity_check()
        print(f"parity: {results['parity']}", flush=True)

    if jax.default_backend() == "tpu":
        # Each section is fault-isolated: a failure records an error entry
        # instead of losing the hours of already-measured sections (tunnel
        # compiles can take 10+ min per fresh program in bad phases).
        def section(key, fn, *a, **k):
            if args.only and key != args.only:
                return
            try:
                results[key] = fn(*a, **k)
            except Exception as e:  # noqa: BLE001 — artifact boundary
                results[key] = {
                    "error": f"{type(e).__name__}: {str(e)[:300]}"
                }
            print(f"{key}: {results[key]}", flush=True)
            if args.json:  # checkpoint partial results
                _write_json_atomic(args.json, results)

        section("shared_bwd_ab_large", bwd_ab, args.quick)
        section("kv_grad_ab_north_star", kv_grad_ab, args.quick)
        # E=1024: kv is a larger traffic fraction, so the d_kv skip is a
        # real win here (1.37x) while it is phase noise at the north star
        # (three-run finding, ROADMAP round 4).
        section(
            "kv_grad_ab_large", kv_grad_ab, args.quick,
            B=8192, M=4, E=1024,
        )
        section(
            "features_dtype_ab_north_star", features_dtype_ab, args.quick
        )
        # bf16 at the large config: regression until round 4's dtype-aware
        # backward tile (TB=384) — kept in the artifact so it can't rot.
        section(
            "features_dtype_ab_large", features_dtype_ab, args.quick,
            B=8192, M=4, E=1024,
        )
        # int8 feature storage on the TRAINING path (round 4): quarter
        # kv bytes in both passes, grads to params/query only.
        section(
            "features_q8_ab_north_star", features_q8_ab, args.quick
        )
        # one-pass step × storage dtype (round-4 verdict Weak #3): kv is
        # ~54% of the fused step's remaining bytes, so the bf16/int8
        # wins should compound there
        section(
            "features_dtype_ab_fused_north_star", features_dtype_ab,
            args.quick, impl="fused-step",
        )
        section(
            "features_dtype_ab_fused_large", features_dtype_ab,
            args.quick, B=8192, M=4, E=1024, impl="fused-step",
        )
        section(
            "features_q8_ab_fused_north_star", features_q8_ab,
            args.quick, impl="fused-step",
        )
        section(
            "features_q8_ab_large", features_q8_ab, args.quick,
            B=8192, M=4, E=1024,
        )
        section("eval_fwd_ab_large", eval_forward_ab, args.quick)
        # precision: the headline runs 'default' (1-pass bf16-input GEMMs);
        # the library API default is 'highest' (torch-f32 parity) — keep
        # the gap measured on both dispatch paths.
        section("precision_ab_north_star", precision_ab, args.quick)
        section("precision_ab_heads8", precision_ab, args.quick, H=8)
        # serving beyond the resident cap: int8 through the streamed split
        section(
            "eval_fwd_ab_e2048", eval_forward_ab, args.quick,
            B=4096, M=4, E=2048,
        )
        section("streamed_e2048_ab", streamed_e2048_ab, args.quick)
        section("streamed_mix_ab_e2048", streamed_mix_ab, args.quick)
        # the H=2 below-cap stream (the default H=2 training dispatch)
        section(
            "streamed_mix_ab_h2_e1024", streamed_mix_ab, args.quick,
            B=8192, M=4, E=1024, H=2,
        )
        # H=2 streamed boundary — measured, not assumed (round-3 verdict
        # Weak #4): two-head mix kernel + XLA V/out GEMMs vs full XLA.
        section("streamed_h2_e2048_ab", streamed_e2048_ab, args.quick, H=2)
        # H=2 BELOW the resident cap: the round-4 dispatch refinement
        # routes the differentiable forward through the streamed split
        # from E=512 up (backward reads kv once vs 4x) — keep both sides
        # of _vjp_wants_streamed's boundary measured.
        section(
            "h2_belowcap_stream_ab_e512", h2_belowcap_stream_ab,
            args.quick, B=4096, M=3, E=512,
        )
        section(
            "h2_belowcap_stream_ab_e1024", h2_belowcap_stream_ab,
            args.quick,
        )
        section("serving_frozen", serving_frozen_bench, args.quick)

    if args.json:
        _write_json_atomic(args.json, results)
        print(f"wrote {args.json}")


if __name__ == "__main__":
    main()
