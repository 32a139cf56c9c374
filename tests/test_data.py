"""Data pipeline tests: pathology mining semantics + synthetic features."""

import numpy as np

from aecf_tpu.data import (
    check_pathology_presence,
    find_single_pathology_cases,
    make_synthetic_clip_features,
)


class TestPathologyMiner:
    def test_positive_mention(self):
        assert check_pathology_presence(
            "there is a large pleural effusion on the left", "effusion"
        )

    def test_simple_negation(self):
        assert not check_pathology_presence(
            "no effusion is seen", "effusion"
        )

    def test_negation_phrases(self):
        for neg in [
            "without evidence of",
            "negative for",
            "rule out",
            "ruled out",
            "free of",
            "clear of",
            "absence of",
        ]:
            text = f"the lungs are {neg} pneumothorax today"
            assert not check_pathology_presence(text, "pneumothorax"), neg

    def test_negation_out_of_reach(self):
        # Negation more than 50 chars before the mention doesn't count.
        filler = "x" * 60
        text = f"no {filler} effusion present"
        assert check_pathology_presence(text, "effusion")

    def test_negation_after_mention_ignored(self):
        assert check_pathology_presence(
            "effusion is present; no pneumothorax", "effusion"
        )

    def test_word_boundary(self):
        assert not check_pathology_presence(
            "cardiomegalyish silhouette", "cardiomegaly"
        )

    def test_negated_then_far_positive_mention(self):
        # Both mentions within 50 chars of the leading "no" → negated
        # (matches the reference's window semantics).
        near = "no effusion on the right. there is a left effusion."
        assert not check_pathology_presence(near, "effusion")
        # Second mention beyond the 50-char negation reach → positive.
        far = (
            "no effusion on the right side was identified previously. "
            "however today there is a moderate left-sided effusion."
        )
        assert check_pathology_presence(far, "effusion")

    def test_case_insensitive(self):
        assert check_pathology_presence("Large EFFUSION noted", "Effusion")

    def test_find_single_pathology_cases(self):
        records = [
            {"findings": "large effusion", "impression": "effusion",
             "image": b"a"},
            {"findings": "effusion and edema", "impression": "both",
             "image": b"b"},
            {"findings": "no effusion no edema", "impression": "clear",
             "image": b"c"},
            {"findings": "mild edema", "impression": "edema", "image": b"d"},
        ]
        out = find_single_pathology_cases(records, ["effusion", "edema"])
        assert [c["index"] for c in out["effusion"]] == [0]
        assert [c["index"] for c in out["edema"]] == [3]


class TestSyntheticFeatures:
    def test_layout(self):
        train, val = make_synthetic_clip_features(
            n_train=128, n_val=32, num_classes=15
        )
        assert train["image"].shape == (128, 512)
        assert train["text"].shape == (128, 512)
        assert train["label"].shape == (128, 15)
        assert val["image"].shape == (32, 512)
        assert train["image"].dtype == np.float32

    def test_every_row_has_a_label(self):
        train, _ = make_synthetic_clip_features(n_train=256, n_val=8)
        assert (train["label"].sum(1) >= 1).all()

    def test_unit_norm_features(self):
        train, _ = make_synthetic_clip_features(n_train=64, n_val=8)
        np.testing.assert_allclose(
            np.linalg.norm(train["image"], axis=1), 1.0, rtol=1e-4
        )

    def test_deterministic(self):
        a, _ = make_synthetic_clip_features(n_train=32, n_val=8, seed=5)
        b, _ = make_synthetic_clip_features(n_train=32, n_val=8, seed=5)
        np.testing.assert_array_equal(a["image"], b["image"])

    def test_labels_are_learnable_from_features(self):
        """Ridge-probe sanity: features must carry strong label signal
        (probe mAP far above chance), so the experiment's masked-modality
        sweeps measure something real."""
        from aecf_tpu.train.metrics import macro_map

        train, val = make_synthetic_clip_features(n_train=2048, n_val=512)
        x = np.concatenate([train["image"], train["text"]], axis=1)
        y = train["label"] * 2 - 1
        lam = 10.0
        w = np.linalg.solve(x.T @ x + lam * np.eye(x.shape[1]), x.T @ y)
        xv = np.concatenate([val["image"], val["text"]], axis=1)
        probe_map = macro_map(val["label"], xv @ w)
        chance = val["label"].mean()
        assert probe_map > 3 * chance, (
            f"synthetic features not learnable: mAP={probe_map:.3f} "
            f"vs chance={chance:.3f}"
        )

    def test_single_modality_weaker_than_both(self):
        from aecf_tpu.train.metrics import macro_map

        train, val = make_synthetic_clip_features(n_train=2048, n_val=512)
        lam = 10.0

        def probe(cols_train, cols_val):
            y = train["label"] * 2 - 1
            w = np.linalg.solve(
                cols_train.T @ cols_train + lam * np.eye(cols_train.shape[1]),
                cols_train.T @ y,
            )
            return macro_map(val["label"], cols_val @ w)

        both = probe(
            np.concatenate([train["image"], train["text"]], 1),
            np.concatenate([val["image"], val["text"]], 1),
        )
        img_only = probe(train["image"], val["image"])
        assert both > img_only, (both, img_only)


class TestPathologyViewerSynthetic:
    """X7's rendering path, driven end-to-end on generated records —
    the real xray.parquet is stripped from the reference snapshot too."""

    def test_mine_select_render(self, tmp_path):
        import importlib.util
        import os

        spec = importlib.util.spec_from_file_location(
            "show_pathologies",
            os.path.join(
                os.path.dirname(__file__), "..", "examples",
                "show_pathologies.py",
            ),
        )
        viewer = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(viewer)

        from aecf_tpu.data import find_single_pathology_cases

        paths = ["Pneumothorax", "Effusion"]
        records = viewer.synthetic_records(60, paths, seed=1)
        assert all(r["image"][:2] == b"\xff\xd8" for r in records)  # JPEG
        cases = find_single_pathology_cases(records, paths)
        # positive single mentions survive; negated and dual mentions do not
        assert all(len(cases[p]) > 0 for p in paths)
        total = sum(len(v) for v in cases.values())
        assert total < len(records)  # negation/dual filters dropped some

        selected = viewer.select_distinct(cases, paths, 2)
        out = tmp_path / "grid.png"
        viewer.render(selected, paths, 2, str(out))
        assert out.exists() and out.stat().st_size > 1000


class TestClipExtractor:
    """The feature-extraction pipeline gap-closer: synthetic records →
    CLIP features → the train_xrays .npz contract. Tiny random-init config
    keeps it hermetic (no weight downloads)."""

    def test_extract_produces_npz_contract(self):
        import importlib.util
        import os

        from transformers import CLIPConfig, CLIPModel

        spec = importlib.util.spec_from_file_location(
            "extract_clip_features",
            os.path.join(
                os.path.dirname(__file__), "..", "examples",
                "extract_clip_features.py",
            ),
        )
        ex = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(ex)
        spec2 = importlib.util.spec_from_file_location(
            "show_pathologies",
            os.path.join(
                os.path.dirname(__file__), "..", "examples",
                "show_pathologies.py",
            ),
        )
        viewer = importlib.util.module_from_spec(spec2)
        spec2.loader.exec_module(viewer)

        from aecf_tpu.data import XRAY_PATHOLOGY_NAMES

        config = CLIPConfig(
            text_config={"hidden_size": 32, "intermediate_size": 37,
                         "num_attention_heads": 4, "num_hidden_layers": 2,
                         "projection_dim": 16},
            vision_config={"hidden_size": 32, "intermediate_size": 37,
                           "num_attention_heads": 4, "num_hidden_layers": 2,
                           "image_size": 224, "patch_size": 32,
                           "projection_dim": 16},
            projection_dim=16,
        )
        model = CLIPModel(config)
        records = viewer.synthetic_records(10, XRAY_PATHOLOGY_NAMES[:4])
        image, text, label = ex.extract(
            records, model, processor=None, batch_size=4
        )
        assert image.shape == (10, 16) and text.shape == (10, 16)
        assert label.shape == (10, len(XRAY_PATHOLOGY_NAMES))
        assert label.max() <= 1.0 and label.sum() > 0  # some positives mined
