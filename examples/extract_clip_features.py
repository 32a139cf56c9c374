#!/usr/bin/env python3
"""CLIP feature extraction: xray.parquet → .npz consumable by train_xrays.py.

Closes the reference's pipeline gap: its trainer loads pre-extracted CLIP
features (``xray_train_clip_feats.pt`` / ``xray_validation_clip_feats.pt``,
reference xrays/train_xrays_example.py:241-242) but the extraction script was
never in the repo (SURVEY.md §2.2 note).  This one produces ``.npz`` files
with ``image (N, D_img)``, ``text (N, D_txt)``, ``label (N, P)`` arrays that
``examples/train_xrays.py --train-feats/--val-feats`` consumes directly.

Labels come from the pathology miner (positive regex mention with negation
filtering — the same contract as the reference's data scripts), multi-hot
over ``XRAY_PATHOLOGY_NAMES``.

Model weights: pass ``--model <name-or-local-path>`` for a real CLIP (needs
the weights cached or reachable); ``--random-init`` builds the architecture
from config with random weights — no download — which validates the whole
pipeline end-to-end (and is what the hermetic test uses).  ``--synthetic N``
generates records when no parquet exists (this snapshot ships none).

Usage:
  python examples/extract_clip_features.py --synthetic 256 --random-init \
      --out-train /tmp/train.npz --out-val /tmp/val.npz
  python examples/train_xrays.py --train-feats /tmp/train.npz \
      --val-feats /tmp/val.npz
"""

from __future__ import annotations

import argparse
import io
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from aecf_tpu.data import (  # noqa: E402
    XRAY_PATHOLOGY_NAMES,
    check_pathology_presence,
    load_xray_parquet,
)


def build_clip(model_name: str, random_init: bool):
    """CLIP model + processor (torch CPU — extraction is offline tooling;
    the training path stays JAX/TPU)."""
    from transformers import CLIPConfig, CLIPModel, CLIPProcessor

    if random_init:
        config = CLIPConfig()
        model = CLIPModel(config)
        try:
            # random-init is the offline pipeline-validation mode: use a
            # locally cached processor if one exists, but never hit the
            # hub (otherwise this retries network fetches for ~40s on
            # airgapped boxes before falling back anyway).
            processor = CLIPProcessor.from_pretrained(
                model_name, local_files_only=True
            )
        except Exception:
            # Fully offline: stock image-processor defaults + a minimal
            # byte-level tokenizer stand-in is NOT available without files,
            # so fall back to a whitespace bag-of-words hash (documented
            # pipeline-validation mode).
            processor = None
        return model, processor
    model = CLIPModel.from_pretrained(model_name)
    processor = CLIPProcessor.from_pretrained(model_name)
    return model, processor


def hashed_text_batch(texts, vocab=49408, length=77):
    """Offline tokenizer stand-in: stable hash per whitespace token.

    crc32, not the built-in hash(): hash(str) is salted per process
    (PYTHONHASHSEED), which would make features extracted in different
    runs mutually incompatible."""
    import zlib

    import torch

    ids = np.ones((len(texts), length), dtype=np.int64)
    for i, t in enumerate(texts):
        toks = [
            zlib.crc32(w.encode()) % (vocab - 2) + 2
            for w in t.lower().split()
        ][: length - 2]
        ids[i, 1 : 1 + len(toks)] = toks
        ids[i, 0] = 0
    return {
        "input_ids": torch.tensor(ids),
        "attention_mask": torch.tensor((ids != 1).astype(np.int64)),
    }


def extract(records, model, processor, batch_size=32):
    import torch
    from PIL import Image

    img_feats, txt_feats, labels = [], [], []
    model.eval()
    for start in range(0, len(records), batch_size):
        chunk = records[start : start + batch_size]
        images = [
            Image.open(io.BytesIO(r["image"])).convert("RGB") for r in chunk
        ]
        texts = [f"{r['findings']} {r['impression']}" for r in chunk]
        with torch.no_grad():
            if processor is not None:
                enc = processor(
                    images=images,
                    text=texts,
                    return_tensors="pt",
                    padding=True,
                    truncation=True,
                )
                imgs = model.get_image_features(pixel_values=enc["pixel_values"])
                txts = model.get_text_features(
                    input_ids=enc["input_ids"],
                    attention_mask=enc["attention_mask"],
                )
            else:
                arr = np.stack(
                    [
                        np.asarray(im.resize((224, 224)), dtype=np.float32)
                        / 255.0
                        for im in images
                    ]
                ).transpose(0, 3, 1, 2)
                imgs = model.get_image_features(
                    pixel_values=torch.tensor(arr)
                )
                txts = model.get_text_features(**hashed_text_batch(texts))
        img_feats.append(imgs.numpy())
        txt_feats.append(txts.numpy())
        for r in chunk:
            text = f"{r['findings']} {r['impression']}".lower()
            labels.append(
                [
                    float(check_pathology_presence(text, p))
                    for p in XRAY_PATHOLOGY_NAMES
                ]
            )
        print(f"  extracted {start + len(chunk)}/{len(records)}", flush=True)
    return (
        np.concatenate(img_feats),
        np.concatenate(txt_feats),
        np.asarray(labels, np.float32),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--parquet", default="xray.parquet")
    ap.add_argument("--synthetic", type=int, default=0, metavar="N")
    ap.add_argument("--model", default="openai/clip-vit-base-patch32")
    ap.add_argument("--random-init", action="store_true")
    ap.add_argument("--val-fraction", type=float, default=0.2)
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--out-train", default="xray_train_clip_feats.npz")
    ap.add_argument("--out-val", default="xray_val_clip_feats.npz")
    args = ap.parse_args()

    if args.synthetic:
        from show_pathologies import synthetic_records

        records = synthetic_records(
            args.synthetic, XRAY_PATHOLOGY_NAMES[:6]
        )
        print(f"generated {len(records)} synthetic records")
    else:
        df = load_xray_parquet(args.parquet)
        records = [row for _, row in df.iterrows()]
        print(f"loaded {len(records)} records")

    model, processor = build_clip(args.model, args.random_init)
    image, text, label = extract(
        records, model, processor, batch_size=args.batch_size
    )
    n_val = max(1, int(len(records) * args.val_fraction))
    split = len(records) - n_val
    np.savez(args.out_train, image=image[:split], text=text[:split],
             label=label[:split])
    np.savez(args.out_val, image=image[split:], text=text[split:],
             label=label[split:])
    print(
        f"wrote {args.out_train} ({split} rows) and {args.out_val} "
        f"({n_val} rows); image {image.shape[1]}-d, text {text.shape[1]}-d, "
        f"{label.shape[1]} labels"
    )


if __name__ == "__main__":
    main()
