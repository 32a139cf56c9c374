#!/usr/bin/env python3
"""Batch-tile sweep for the kernels (AECF_FWD_TB / AECF_BWD_TB / AECF_STEP_TB).

Round-3 verdict Next #3: the streamed-path tiles were swept on-chip at
E=2048 only; this sweeps any config within one process (alternating
windows, RTT subtracted) so defaults at E=4096+ are measured, not assumed.

Each candidate pair builds a fresh train-step chunk with the env override
set at TRACE time (the tile is read inside pallas lowering), then the
candidates alternate timed windows.

Usage:
  python benchmarks/tile_sweep.py --batch 1024 --embed 4096 \
      --fwd-tiles 32,64,128 --bwd-tiles 32,64,128
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--modalities", type=int, default=3)
    ap.add_argument("--embed", type=int, default=4096)
    ap.add_argument("--heads", type=int, default=1)
    ap.add_argument("--fwd-tiles", default="32,64,128")
    ap.add_argument("--bwd-tiles", default="default")
    ap.add_argument("--step-tiles", default="default",
                    help="AECF_STEP_TB candidates (impl='fused-step')")
    ap.add_argument("--impl", default="pallas",
                    choices=["pallas", "fused-step"])
    ap.add_argument("--kv-grad", action="store_true")
    ap.add_argument("--features-dtype", default="float32",
                    choices=["float32", "bfloat16", "int8"])
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    from bench import (
        ab_train_windows,
        build_chunk,
        enable_persistent_cache,
        measure_tunnel_rtt,
    )

    enable_persistent_cache()

    B, M, E, H, K = (
        args.batch, args.modalities, args.embed, args.heads, args.steps
    )
    fwd_tiles = args.fwd_tiles.split(",")
    bwd_tiles = args.bwd_tiles.split(",")
    step_tiles = args.step_tiles.split(",")
    if args.impl == "fused-step":
        # one kernel, one knob: sweep AECF_STEP_TB on the step-tile axis
        fwd_tiles, bwd_tiles = ["default"], ["default"]
    else:
        step_tiles = ["default"]

    rtt = measure_tunnel_rtt()
    print(f"tunnel rtt {rtt*1e3:.1f}ms", file=sys.stderr, flush=True)

    chunks = {}
    for ft in fwd_tiles:
      for bt in bwd_tiles:
        for st in step_tiles:
            name = (f"step={st}" if args.impl == "fused-step"
                    else f"fwd={ft},bwd={bt}")
            for env, val in (("AECF_FWD_TB", ft), ("AECF_BWD_TB", bt),
                             ("AECF_STEP_TB", st)):
                if val == "default":
                    os.environ.pop(env, None)
                else:
                    os.environ[env] = val
            print(f"compiling {name}...", file=sys.stderr, flush=True)
            try:
                c, p, s = build_chunk(
                    B, M, E, H, args.impl, K, kv_grad=args.kv_grad,
                    features_dtype=args.features_dtype,
                )
                p, s, loss = c(p, s, jnp.int32(0))
                float(loss)
            except Exception as e:  # noqa: BLE001 — sweep records failures
                print(f"{name}: FAILED ({type(e).__name__}: "
                      f"{str(e)[:200]})", flush=True)
                chunks[name] = None
                continue
            chunks[name] = (c, p, s)
    for env in ("AECF_FWD_TB", "AECF_BWD_TB", "AECF_STEP_TB"):
        os.environ.pop(env, None)

    res = ab_train_windows(chunks, B, K, args.rounds, rtt)

    out = {
        "config": (
            f"B={B},M={M},E={E},H={H},impl={args.impl},"
            f"kv_grad={args.kv_grad},"
            f"feats={args.features_dtype},K={K}"
        ),
        "tunnel_rtt_ms": round(rtt * 1e3, 2),
        "median_sps": {
            m: round(statistics.median(v), 1) for m, v in res.items()
        },
        "failed": [m for m, v in chunks.items() if v is None],
    }
    print(json.dumps(out, indent=2))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
