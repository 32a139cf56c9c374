#!/usr/bin/env python3
"""Mine and display single-pathology X-ray cases from a report parquet.

Re-implements the reference's visualization scripts
(xrays/extract_xray_pathologies.py:87-201 and
show_multiple_pathology_examples.py:87-174) on top of the shared miner in
:mod:`aecf_tpu.data.pathology` (the reference duplicates the mining code in
both scripts; here it lives once in the library).

Two layouts:
  * ``--layout row``  — one example per pathology in a 1×N strip;
  * ``--layout grid`` — N×K grid with ``--examples-per`` cases each.

The source parquet (columns: ``image`` JPEG bytes, ``findings``,
``impression``) is not distributed with the reference snapshot
(.MISSING_LARGE_BLOBS); point ``--parquet`` at your copy, or pass
``--synthetic N`` to drive the full mining → selection → grid-rendering
path on N generated records (tiny JPEGs + report text with positive and
negated pathology mentions) — no dataset needed.
"""

from __future__ import annotations

import argparse
import io
import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from aecf_tpu.data import find_single_pathology_cases, load_xray_parquet

DEFAULT_PATHOLOGIES = ["Pneumothorax", "Effusion", "Atelectasis", "Edema"]


def synthetic_records(n, pathologies, seed=0):
    """Generate n synthetic report records with JPEG chest-film stand-ins.

    Roughly a third mention exactly one pathology positively, a third
    mention one but negated ("no evidence of ..."), and a third mention two
    — so the miner's single-pathology and negation filters are both
    exercised (the viewers in the reference run on exactly this record
    shape, extract_xray_pathologies.py:87-127).
    """
    import io as _io
    import random

    import numpy as np
    from PIL import Image

    rng = random.Random(seed)
    nprng = np.random.default_rng(seed)
    records = []
    for i in range(n):
        arr = (nprng.random((48, 48)) * 255).astype("uint8")
        buf = _io.BytesIO()
        Image.fromarray(arr, mode="L").save(buf, format="JPEG")
        kind = i % 3
        p = rng.choice(pathologies)
        if kind == 0:
            findings = f"There is a moderate {p.lower()} on the left."
            impression = f"Findings consistent with {p.lower()}."
        elif kind == 1:
            findings = f"No evidence of {p.lower()}. Lungs are clear."
            impression = "No acute cardiopulmonary abnormality."
        else:
            q = rng.choice([x for x in pathologies if x != p])
            findings = f"Both {p.lower()} and {q.lower()} are present."
            impression = f"{p} with associated {q.lower()}."
        records.append(
            {
                "image": buf.getvalue(),
                "findings": findings,
                "impression": impression,
            }
        )
    return records


def select_distinct(cases, pathologies, per_pathology):
    """Pick up to ``per_pathology`` non-overlapping examples per pathology."""
    used = set()
    selected = {}
    for p in pathologies:
        picks = []
        for case in cases[p]:
            if case["index"] not in used:
                picks.append(case)
                used.add(case["index"])
            if len(picks) >= per_pathology:
                break
        selected[p] = picks
    return selected


def render(selected, pathologies, per_pathology, out_path, layout="row"):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from PIL import Image

    if layout == "row":
        # --layout row: one example per pathology in a 1×N strip (the
        # documented reference visualization), not an N×1 column.
        # Keyed on the FLAG, not per_pathology==1: --layout grid
        # --examples-per 1 must still render an N×1 grid.
        rows, cols = 1, len(pathologies)
        cells = [(0, c, p, 0) for c, p in enumerate(pathologies)]
    else:
        rows, cols = len(pathologies), max(1, per_pathology)
        cells = [
            (r, c, p, c)
            for r, p in enumerate(pathologies)
            for c in range(cols)
        ]
    fig, axes = plt.subplots(
        rows, cols, figsize=(4 * cols, 4 * rows), squeeze=False
    )
    for r, c, p, pick_idx in cells:
        ax = axes[r][c]
        ax.axis("off")
        picks = selected[p]
        if pick_idx >= len(picks):
            continue
        case = picks[pick_idx]
        if case["image_data"] is not None:
            img = Image.open(io.BytesIO(case["image_data"]))
            ax.imshow(img, cmap="gray")
        snippet = (case["impression"] or "")[:60]
        ax.set_title(f"{p} (#{case['index']})\n{snippet}", fontsize=8)
    plt.tight_layout()
    plt.savefig(out_path, dpi=120, bbox_inches="tight")
    print(f"saved {out_path}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--parquet", default="xray.parquet")
    ap.add_argument(
        "--pathologies", nargs="+", default=DEFAULT_PATHOLOGIES
    )
    ap.add_argument("--layout", choices=["row", "grid"], default="row")
    ap.add_argument("--examples-per", type=int, default=3)
    ap.add_argument("--out", default="pathology_examples.png")
    ap.add_argument(
        "--synthetic",
        type=int,
        default=0,
        metavar="N",
        help="generate N synthetic records instead of reading --parquet",
    )
    args = ap.parse_args()

    if args.synthetic:
        records = synthetic_records(args.synthetic, args.pathologies)
        print(f"generated {len(records)} synthetic cases")
    else:
        records = load_xray_parquet(args.parquet)
        print(f"loaded {len(records)} X-ray cases")
    cases = find_single_pathology_cases(
        records, args.pathologies, verbose=True
    )
    for p in args.pathologies:
        n = len(cases[p])
        print(f"{p}: {n} single-pathology cases")
        if n:
            ex = cases[p][0]
            print(f"  example #{ex['index']}: {ex['impression'][:100]}")

    per = 1 if args.layout == "row" else args.examples_per
    selected = select_distinct(cases, args.pathologies, per)
    render(selected, args.pathologies, per, args.out, layout=args.layout)


if __name__ == "__main__":
    main()
