#!/usr/bin/env python3
"""Reproduce the PyTorch-CPU baseline numbers in BASELINE.md.

Runs the ORIGINAL reference implementation (not this framework) under the
documented harness: MultimodalAttentionPool + CurriculumMasking(0.15) in
train mode, full fwd+bwd (``loss = out.sum() + entropy_loss``), SGD step,
5 warmup + 20 timed iters.  Expects the reference package at
``/root/reference`` (or ``AECF_REFERENCE_PATH``); this is a measurement
tool, not a dependency — the framework never imports the reference.

Usage: python benchmarks/baseline_torch.py [--threads 1]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REFERENCE = os.environ.get("AECF_REFERENCE_PATH", "/root/reference")

CONFIGS = [
    ("north_star", 4096, 3, 512, 1),
    ("quickstart", 32, 2, 512, 1),
    ("large", 8192, 4, 1024, 1),
    ("heads8", 4096, 3, 512, 8),
]


def measure(torch, pool_cls, masking_cls, B, M, E, H, warmup=5, iters=20):
    torch.manual_seed(0)
    masking = masking_cls(base_mask_prob=0.15)
    pool = pool_cls(
        embed_dim=E, num_heads=H, curriculum_masking=masking,
        batch_first=True,
    )
    pool.train()
    query = torch.nn.Parameter(torch.randn(1, 1, E) * 0.02)
    modal = torch.randn(B, M, E)
    opt = torch.optim.SGD(list(pool.parameters()) + [query], lr=1e-3)

    def step():
        opt.zero_grad()
        out, info = pool(
            query.expand(B, -1, -1), modal, return_info=True
        )
        loss = out.sum() + masking.entropy_loss(info["entropy"])
        loss.backward()
        opt.step()

    for _ in range(warmup):
        step()
    t0 = time.perf_counter()
    for _ in range(iters):
        step()
    dt = (time.perf_counter() - t0) / iters
    return B / dt, dt * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--threads", type=int, default=1)
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    if not os.path.isdir(REFERENCE):
        print(f"reference not found at {REFERENCE}; set AECF_REFERENCE_PATH")
        return 1
    sys.path.insert(0, REFERENCE)

    import torch

    torch.set_num_threads(args.threads)
    from aecf import CurriculumMasking, MultimodalAttentionPool

    results = {"torch": torch.__version__, "threads": args.threads}
    for name, B, M, E, H in CONFIGS:
        sps, ms = measure(
            torch, MultimodalAttentionPool, CurriculumMasking, B, M, E, H
        )
        results[name] = {"samples_per_sec": round(sps, 1),
                         "ms_per_iter": round(ms, 1)}
        print(f"{name} (B={B},M={M},E={E},H={H}): "
              f"{sps:,.0f} samples/s ({ms:.1f} ms/iter)", flush=True)

    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=2)
    return 0


if __name__ == "__main__":
    sys.exit(main())
