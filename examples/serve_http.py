#!/usr/bin/env python3
"""Serve a fusion model over HTTP and round-trip a prediction.

Starts a :class:`aecf_tpu.serving_http.PredictionServer` around a
VisionLanguageModel predictor, issues JSON and binary-npz requests against
it (including a missing-modality request), and prints the results.  Pass
``--keep-serving`` to leave the server up for external clients.

``--frozen`` demonstrates the full production deployment story: the
predictor is exported to a self-contained StableHLO artifact
(``export_predictor``), re-loaded (as a deployment host with no model code
would), and the SERVER runs on the frozen programs.

Run:  python examples/serve_http.py [--port 8000] [--keep-serving] [--frozen]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--port", type=int, default=0)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--keep-serving", action="store_true")
    ap.add_argument("--frozen", action="store_true",
                    help="export → reload → serve the frozen artifact")
    args = ap.parse_args(argv)

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from aecf_tpu.models import VisionLanguageModel
    from aecf_tpu.serve import FusionPredictor
    from aecf_tpu.serving_http import PredictionServer, predict_remote

    model = VisionLanguageModel(num_classes=14)
    params = model.init(jax.random.key(0))

    def apply_fn(p, image, text):
        return model.apply(p, image, text, training=False)

    predictor = FusionPredictor(
        apply_fn, params, modality_names=("image", "text"),
        buckets=(32, 256),
    )
    if args.frozen:
        import tempfile

        from aecf_tpu.serve import (
            export_predictor,
            load_exported_predictor,
        )

        path = os.path.join(tempfile.mkdtemp(), "fusion_frozen.npz")
        export_predictor(
            predictor, path,
            feature_dims={"image": 2048, "text": 768},
        )
        size_mb = os.path.getsize(path) / 1e6
        predictor = load_exported_predictor(path)
        print(f"serving FROZEN artifact {path} ({size_mb:.1f} MB, "
              "no model code on the serving path)")
    server = PredictionServer(predictor, port=args.port).start()
    url = f"http://127.0.0.1:{server.port}"
    print(f"serving on {url}")

    rng = np.random.default_rng(0)
    img = rng.normal(size=(4, 2048)).astype(np.float32)
    txt = rng.normal(size=(4, 768)).astype(np.float32)

    probs = predict_remote(url, image=img, text=txt)  # binary npz
    print(f"binary npz: probs {probs.shape}, row0 max {probs[0].max():.3f}")
    probs_json = predict_remote(url, binary=False, image=img, text=txt)
    print(f"json      : max |Δ| vs binary "
          f"{np.abs(probs - probs_json).max():.2e}")
    probs_missing = predict_remote(url, image=img)  # text served missing
    print(f"image-only: probs {probs_missing.shape} (text zeroed)")

    if args.keep_serving:
        print("serving until interrupted...")
        try:
            server._thread.join()
        except KeyboardInterrupt:
            pass
    server.stop()
    print("ok")


if __name__ == "__main__":
    main()
