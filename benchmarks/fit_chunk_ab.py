#!/usr/bin/env python3
"""A/B: fit() per-step wall time, single-step loop vs scan_chunk=K.

The chunked elastic loop exists to amortize host->device dispatch latency
(one dispatch + one host sync per K updates instead of per update) — this
measures how much that buys end-to-end ON THE PRODUCT PATH (fit() itself,
including host batch staging), not in a synthetic harness.

Unlike the kernel benchmarks, wall time per step IS the honest metric
here: the host loop's transport cost is exactly what scan_chunk removes,
so no RTT subtraction is applied — the tunnel RTT is reported alongside
for context (the win scales with it; on a real co-located host the RTT
term is ~100x smaller and the win correspondingly bounded by dispatch
overhead, not tunnel latency).

Alternating rounds within one process (the only comparison the tunnel
supports — CLAUDE.md); prints one JSON line.

Usage: python benchmarks/fit_chunk_ab.py [--steps 96] [--chunk 32]
       [--batch 4096] [--embed 512] [--rounds 3]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=96)
    ap.add_argument("--chunk", type=int, default=32)
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--embed", type=int, default=512)
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()

    import bench  # noqa: F401  (repo root: enables the pinned cache)

    bench.enable_persistent_cache()

    import jax
    import optax

    from aecf_tpu.models import XrayAECFModel
    from aecf_tpu.train import fit

    B, E = args.batch, args.embed
    # XrayAECFModel: 2 modality encoders (image+text) feeding the fusion
    # pool — the closest product-path model to the pool protocol.
    model = XrayAECFModel(
        image_dim=E, text_dim=E, hidden_dim=E, num_classes=14
    )
    params = model.init(jax.random.key(0))
    opt = optax.adamw(1e-4, weight_decay=0.01)

    def apply_fn(p, img, txt, rng):
        return model.apply(
            p, img, txt, training=True, rng=rng,
            curriculum_enabled=True, return_info=True,
        )

    rs = np.random.default_rng(0)
    IMG = rs.normal(size=(B, E)).astype(np.float32)
    TXT = rs.normal(size=(B, E)).astype(np.float32)
    LAB = (rs.random((B, 14)) < 0.2).astype(np.float32)

    def batch_fn(step):
        # fixed arrays: batch staging cost stays, data-gen cost doesn't
        return IMG, TXT, LAB

    def run(scan_chunk):
        t0 = time.perf_counter()
        state, _ = fit(
            apply_fn, opt, params, batch_fn,
            num_steps=args.steps, rng=jax.random.key(7),
            scan_chunk=scan_chunk,
        )
        # fit() itself does not fetch without log_every; force the final
        # sync the way any caller consuming the state would.
        float(jax.tree.leaves(state.params)[0].ravel()[0])
        return time.perf_counter() - t0

    # compile both programs before timing
    run(1)
    run(args.chunk)

    rtt = bench.cached_tunnel_rtt()
    single_s, chunked_s = [], []
    for _ in range(args.rounds):
        single_s.append(run(1))
        chunked_s.append(run(args.chunk))

    med_single = statistics.median(single_s)
    med_chunked = statistics.median(chunked_s)
    out = {
        "metric": (
            f"fit() per-step wall ms (B={B}, E={E}, M=2, "
            f"steps={args.steps}, {jax.default_backend()})"
        ),
        "single_step_ms": round(med_single / args.steps * 1e3, 3),
        "scan_chunk_ms": round(med_chunked / args.steps * 1e3, 3),
        "scan_chunk": args.chunk,
        "speedup": round(med_single / med_chunked, 2),
        "tunnel_rtt_ms": round(rtt * 1e3, 2),
        "rounds": args.rounds,
        "spread": {
            "single_s": [round(s, 3) for s in single_s],
            "chunked_s": [round(s, 3) for s in chunked_s],
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
