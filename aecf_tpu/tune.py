"""On-device batch-tile autotuner — writes the per-device tile table.

The kernel batch-tile defaults were measured on TPU v5e; on another TPU
generation (different VMEM budget, different compute/bandwidth ratio) they
may be off.  This tool measures the winners *on the local device* for one
training config and records them in the per-device-kind tile table
(:mod:`aecf_tpu.kernels.tiles`), which every launch site consults at trace
time — so one autotune run makes the library self-tuned on that hardware
with no code changes.

Method (the repo's measurement discipline, :mod:`aecf_tpu.measure`):
  1. Trace the train step once with tile recording on to discover which
     launch sites the config exercises and their current defaults.
  2. Coordinate descent over the two tile knobs: sweep AECF_FWD_TB
     candidates (bwd at default), pick the winner by median samples/s over
     alternating within-run windows (tunnel RTT subtracted) PLUS a paired
     per-round majority, then sweep AECF_BWD_TB with the fwd winner pinned.
     Candidates that fail to compile (Mosaic VMEM rejection) are recorded
     and skipped.  With ``--impl fused-step`` the one-pass train-step
     kernel's single AECF_STEP_TB knob is swept instead.
  3. Winners that beat the default by more than ``--margin`` are written
     to the table under the exact site keys recorded in step 1.

Usage (installed package)::

  python -m aecf_tpu.tune --batch 4096 --modalities 3 --embed 512 \
      [--heads 1] [--kv-grad] [--features-dtype float32|bfloat16|int8] \
      [--steps 60 --rounds 7] [--margin 0.03] [--out PATH] [--dry-run]

(In the development repo, ``benchmarks/autotune.py`` is a thin wrapper
that pins the repo's warmed compile cache first.)
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
from typing import Dict, List, Optional

__all__ = [
    "candidate_tiles",
    "pick_winner",
    "main",
]


def candidate_tiles(default: int, batch: int) -> List[int]:
    """Candidate batch tiles around a measured default: {1/2, 3/4, 1, 3/2,
    2}x, aligned down to the 8-row sublane tile, clamped to the padded
    batch, deduplicated ascending.  The default itself is always included
    (it is the baseline the margin rule compares against)."""
    pad_b = (batch + 7) // 8 * 8
    cands = set()
    for scaled in (
        default // 2, 3 * default // 4, default, 3 * default // 2,
        2 * default,
    ):
        cands.add(max(8, min(scaled // 8 * 8, pad_b)))
    cands.add(min(default, pad_b))
    return sorted(cands)


def pick_winner(
    medians: Dict[int, float], default: int, margin: float,
    rounds_by_tb: Optional[Dict[int, List[float]]] = None,
) -> int:
    """The tile to record: the best-measured candidate, but only if it
    beats the default by more than ``margin`` (fractional) — within-noise
    differences keep the default, so re-running the tuner is idempotent.

    When ``rounds_by_tb`` (per-candidate per-round samples/s, round
    indices aligned because ``ab_train_windows`` alternates candidates
    within each round) is given, the candidate must ALSO beat the default
    in a strict majority of paired rounds.  A median-only rule crowned a
    winner on tunnel phase drift once: two back-to-back sweeps measured
    256-vs-512 at +1.6% and +4.2% — the same within-noise difference on
    either side of the margin.  Pairing is robust to that drift because
    both tiles see each phase.

    If the default itself failed to MEASURE (it compiled during discovery,
    so any failure here is a transient tunnel/compile flake), keep the
    default with a warning rather than crowning a candidate the margin
    rule never vetted."""
    import warnings

    if not medians:
        raise ValueError("no candidate produced a measurement")
    best = max(medians, key=lambda t: medians[t])
    base = medians.get(default)
    if base is None:
        warnings.warn(
            f"default tile {default} failed to measure (transient compile "
            f"flake?); keeping it unvetted — re-run to sweep against it",
            stacklevel=2,
        )
        return default
    if medians[best] <= base * (1.0 + margin):
        return default
    if rounds_by_tb is not None:
        pairs = list(zip(rounds_by_tb[best], rounds_by_tb[default]))
        wins = sum(1 for cand, dflt in pairs if cand > dflt)
        if 2 * wins <= len(pairs):
            return default
    return best


def _sites_for(log, prefix: str) -> Dict[str, int]:
    """Recorded (site_key -> chosen tile) for one env kind, deduped."""
    out: Dict[str, int] = {}
    for key, tb, _src in log:
        if key.startswith(prefix):
            out[key] = tb
    return out


def _build(args, fwd_env: Optional[str], bwd_env: Optional[str],
           step_env: Optional[str] = None):
    """Build + warm one train chunk with the tile env knobs pinned at
    TRACE time (restored afterwards).  Returns the chunk state or None on
    compile failure (recorded by the caller)."""
    import jax.numpy as jnp

    from .measure import build_chunk

    saved = {}
    for env, val in (
        ("AECF_FWD_TB", fwd_env),
        ("AECF_BWD_TB", bwd_env),
        ("AECF_STEP_TB", step_env),
    ):
        saved[env] = os.environ.pop(env, None)
        if val is not None:
            os.environ[env] = val
    try:
        c, p, s = build_chunk(
            args.batch, args.modalities, args.embed, args.heads,
            getattr(args, "impl", "pallas"), args.steps,
            kv_grad=args.kv_grad,
            features_dtype=args.features_dtype,
        )
        p, s, loss = c(p, s, jnp.int32(0))
        float(loss)  # warm: compile + one fetch-sync
        return (c, p, s)
    except Exception as e:  # noqa: BLE001 — sweeps record failures
        print(
            f"  fwd={fwd_env},bwd={bwd_env},step={step_env}: FAILED "
            f"({type(e).__name__}: {str(e)[:160]})",
            file=sys.stderr, flush=True,
        )
        return None
    finally:
        for env, old in saved.items():
            if old is None:
                os.environ.pop(env, None)
            else:
                os.environ[env] = old


def _sweep_kind(args, kind: str, default: int, pinned_fwd: Optional[int],
                rtt: float) -> Dict:
    """Sweep one env kind's candidates; returns the sweep record."""
    from .measure import ab_train_windows

    cands = candidate_tiles(default, args.batch)
    print(f"sweeping {kind}: candidates {cands} (default {default})",
          file=sys.stderr, flush=True)
    chunks = {}
    for tb in cands:
        fwd_env = bwd_env = step_env = None
        if kind == "AECF_FWD_TB":
            fwd_env = str(tb)
        elif kind == "AECF_BWD_TB":
            fwd_env = None if pinned_fwd is None else str(pinned_fwd)
            bwd_env = str(tb)
        else:  # AECF_STEP_TB — the one-pass fused step's single knob
            step_env = str(tb)
        print(f"  compiling {kind}={tb}...", file=sys.stderr, flush=True)
        chunks[tb] = _build(args, fwd_env, bwd_env, step_env)

    res = ab_train_windows(
        chunks, args.batch, args.steps, args.rounds, rtt
    )
    medians = {tb: statistics.median(v) for tb, v in res.items()}
    winner = pick_winner(medians, default, args.margin, res)
    rec = {
        "default": default,
        "candidates": cands,
        "failed": [tb for tb, c in chunks.items() if c is None],
        "median_sps": {str(tb): round(v, 1) for tb, v in medians.items()},
        "winner": winner,
    }
    if default in res:
        rec["paired_wins_vs_default"] = {
            str(tb): sum(1 for c, d in zip(v, res[default]) if c > d)
            for tb, v in res.items() if tb != default
        }
    return rec


def main(argv: Optional[List[str]] = None):
    ap = argparse.ArgumentParser(
        prog="python -m aecf_tpu.tune",
        description="Measure batch-tile winners on the local device and "
        "record them in the per-device tile table."
    )
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--modalities", type=int, default=3)
    ap.add_argument("--embed", type=int, default=512)
    ap.add_argument("--heads", type=int, default=1)
    ap.add_argument("--kv-grad", action="store_true")
    ap.add_argument("--impl", default="pallas",
                    choices=["pallas", "fused-step"],
                    help="'pallas' tunes the two-pass kernels "
                    "(AECF_FWD_TB/AECF_BWD_TB); 'fused-step' tunes the "
                    "one-pass train-step kernel's AECF_STEP_TB")
    ap.add_argument("--features-dtype", default="float32",
                    choices=["float32", "bfloat16", "int8"])
    ap.add_argument("--steps", type=int, default=60,
                    help="scan-chained steps per timed window (auto-grown "
                    "until the window dwarfs the tunnel RTT; see "
                    "--max-steps)")
    ap.add_argument("--max-steps", type=int, default=2000,
                    help="cap on the auto-grown window length")
    ap.add_argument("--rounds", type=int, default=7,
                    help="alternating windows per candidate (odd keeps "
                    "the paired majority rule decisive)")
    ap.add_argument("--margin", type=float, default=0.03,
                    help="fractional win required to displace the default")
    ap.add_argument("--out", default=None,
                    help="table path (default: tiles.table_path())")
    ap.add_argument("--dry-run", action="store_true",
                    help="measure and print, write nothing")
    args = ap.parse_args(argv)

    from .measure import enable_persistent_cache, measure_tunnel_rtt

    enable_persistent_cache()

    from .kernels import tiles

    rtt = measure_tunnel_rtt()
    print(f"tunnel rtt {rtt*1e3:.1f}ms", file=sys.stderr, flush=True)

    # Step 1: discovery trace — which sites fire, at which defaults.
    tiles.start_recording()
    base = _build(args, None, None)
    log = tiles.stop_recording()
    if base is None:
        print("baseline config failed to compile; nothing to tune",
              file=sys.stderr)
        sys.exit(1)
    fwd_sites = _sites_for(log, "fwd_")
    bwd_sites = _sites_for(log, "bwd_")
    step_sites = _sites_for(log, "step_")
    print(f"sites: fwd={fwd_sites} bwd={bwd_sites} step={step_sites}",
          file=sys.stderr, flush=True)

    # Auto-size the timed window: every window pays one tunnel RTT
    # (0.2-35ms by phase), and net_window can only subtract the *median*
    # RTT — a window that doesn't dwarf the RTT measures transport noise,
    # not tiles (a 60-step north-star window is ~8ms vs ~30ms RTT and the
    # sweep medians come out 2x apart on identical kernels).  Grow K until
    # the estimated window is >= max(50ms, 20x RTT), like the suite's
    # K=300-400 A/B sections.
    import time as _time

    import jax.numpy as _jnp

    from .measure import net_window

    elapsed = float("inf")
    for r in (1, 2):  # two timings, take the faster (phase noise)
        c, p, s = base
        t0 = _time.perf_counter()
        p, s, loss = c(p, s, _jnp.int32(r * args.steps))
        float(loss)
        elapsed = min(elapsed, _time.perf_counter() - t0)
        base = (c, p, s)
    per_step = net_window(elapsed, rtt) / args.steps
    target = max(0.05, 20.0 * rtt)
    want = int(target / per_step) + 1
    if want > args.steps:
        # Grow only: an explicit --steps larger than --max-steps stands.
        args.steps = max(args.steps, min(want, args.max_steps))
        print(
            f"window auto-size: ~{per_step*1e6:.0f}us/step -> "
            f"K={args.steps} (~{per_step*args.steps*1e3:.0f}ms windows "
            f"vs {rtt*1e3:.1f}ms RTT)",
            file=sys.stderr, flush=True,
        )

    sweeps: Dict[str, Dict] = {}
    entries: Dict[str, int] = {}
    pinned_fwd = None
    kinds = (
        (("AECF_STEP_TB", step_sites),)
        if args.impl == "fused-step"
        else (("AECF_FWD_TB", fwd_sites), ("AECF_BWD_TB", bwd_sites))
    )
    for kind, sites in kinds:
        if not sites:
            continue
        defaults = sorted(set(sites.values()))
        if len(defaults) > 1:
            print(
                f"warning: {kind} covers {len(sites)} sites with distinct "
                f"defaults {defaults}; sweeping around the largest — only "
                "sites sharing that default get table entries (the winner "
                "was never measured against the others' clamped/rescaled "
                "defaults)",
                file=sys.stderr,
            )
        rec = _sweep_kind(args, kind, defaults[-1], pinned_fwd, rtt)
        sweeps[kind] = rec
        if kind == "AECF_FWD_TB":
            pinned_fwd = rec["winner"]
        for site, tb_default in sites.items():
            # Write only where the winner actually displaced THIS site's
            # default — a site whose default differs (VMEM clamp, per-head
            # rescale) was not measured by this sweep, and table entries
            # bypass those clamps.
            if tb_default == defaults[-1] and rec["winner"] != tb_default:
                entries[site] = rec["winner"]

    out = {
        "config": (
            f"B={args.batch},M={args.modalities},E={args.embed},"
            f"H={args.heads},impl={args.impl},kv_grad={args.kv_grad},"
            f"feats={args.features_dtype},K={args.steps}"
        ),
        "tunnel_rtt_ms": round(rtt * 1e3, 2),
        "sites": {**fwd_sites, **bwd_sites, **step_sites},
        "sweeps": sweeps,
        "new_entries": entries,
    }
    if entries and not args.dry_run:
        out["table_path"] = tiles.update_table(entries, args.out)
    else:
        # None both when defaults are already optimal and on --dry-run —
        # consumers read table_path to mean "was anything written".
        out["table_path"] = None
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
