"""Generate golden parity files from the reference implementation.

Dev-time tool — runs the ORIGINAL reference library (expected at
/root/reference, or set AECF_REFERENCE_PATH) and records input/output pairs
for CurriculumMasking under an injected Bernoulli mask (monkeypatching
torch.bernoulli), because PyTorch and JAX PRNG streams cannot match natively.
"Bit-for-bit under a fixed PRNG" is therefore defined as fixed-mask injection
parity (SURVEY.md §4 test plan, item b).

The resulting .npz files are committed; tests/test_golden_parity.py consumes
them without needing torch or the reference present.

Usage:  python tests/golden/generate.py   (no PYTHONPATH needed)
"""

import os
import sys

import numpy as np
import torch

REFERENCE = os.environ.get("AECF_REFERENCE_PATH", "/root/reference")
sys.path.insert(0, REFERENCE)
# Repo root on the path at module top, BEFORE any file is overwritten: in
# script mode sys.path[0] is tests/golden, so the aecf_tpu imports further
# down would otherwise fail AFTER main() already rewrote the first .npz,
# leaving an internally inconsistent golden corpus.
sys.path.insert(
    0,
    os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))),
)

from aecf import CurriculumMasking  # noqa: E402  (the reference package)

OUT = os.path.join(os.path.dirname(__file__), "curriculum_golden.npz")


def run_case(weights, mask, base_mask_prob, entropy_target, min_active, training):
    m = CurriculumMasking(
        base_mask_prob=base_mask_prob,
        entropy_target=entropy_target,
        min_active=min_active,
    )
    m.train(training)
    w = torch.tensor(weights)
    orig_bernoulli = torch.bernoulli
    try:
        if mask is not None:
            torch.bernoulli = lambda p: torch.tensor(mask, dtype=p.dtype)
        out, info = m(w)
    finally:
        torch.bernoulli = orig_bernoulli
    rec = {"out": out.detach().numpy()}
    for k, v in info.items():
        rec[f"info_{k}"] = v.detach().numpy()
    # entropy_loss on the produced entropy (exercises _last_seq_len cache).
    rec["entropy_loss"] = m.entropy_loss(info["entropy"]).item()
    rec["last_seq_len"] = np.array(m._last_seq_len)
    return rec


def generate_composed_pool_golden():
    """End-to-end MultimodalAttentionPool + CurriculumMasking golden:
    our init params copied into the reference module, fixed Bernoulli mask
    injected, full (output, info) recorded."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    from aecf import MultimodalAttentionPool as RefPool
    from aecf_tpu.core.init import init_attention_pool_params

    out_path = os.path.join(
        os.path.dirname(__file__), "pool_golden.npz"
    )
    E, M, B, H = 32, 3, 6, 4
    params = init_attention_pool_params(jax.random.key(0), E)
    rng = np.random.default_rng(7)
    q = rng.normal(size=(B, 1, E)).astype(np.float32)
    kv = rng.normal(size=(B, M, E)).astype(np.float32)
    mask = (rng.random((B, 1, M)) > 0.5).astype(np.float32)

    from aecf import CurriculumMasking as RefMasking

    pool = RefPool(
        embed_dim=E,
        num_heads=H,
        curriculum_masking=RefMasking(
            base_mask_prob=0.4, entropy_target=0.6, min_active=2
        ),
        batch_first=True,
    )
    with torch.no_grad():
        pool.attention.in_proj_weight.copy_(
            torch.tensor(np.asarray(params.in_proj_weight))
        )
        pool.attention.in_proj_bias.copy_(
            torch.tensor(np.asarray(params.in_proj_bias))
        )
        pool.attention.out_proj.weight.copy_(
            torch.tensor(np.asarray(params.out_proj_weight))
        )
        pool.attention.out_proj.bias.copy_(
            torch.tensor(np.asarray(params.out_proj_bias))
        )
    pool.train()
    orig = torch.bernoulli
    try:
        torch.bernoulli = lambda p: torch.tensor(mask, dtype=p.dtype)
        with torch.no_grad():
            out, info = pool(
                torch.tensor(q), torch.tensor(kv), return_info=True
            )
    finally:
        torch.bernoulli = orig

    blob = {
        "q": q,
        "kv": kv,
        "mask": mask,
        "in_proj_weight": np.asarray(params.in_proj_weight),
        "in_proj_bias": np.asarray(params.in_proj_bias),
        "out_proj_weight": np.asarray(params.out_proj_weight),
        "out_proj_bias": np.asarray(params.out_proj_bias),
        "out": out.numpy(),
    }
    for k, v in info.items():
        blob[f"info_{k}"] = v.detach().numpy()
    np.savez(out_path, **blob)
    print(f"wrote {out_path} (info keys: {sorted(info)})")


def main():
    rng = np.random.default_rng(1234)
    cases = {}

    def softmax(x):
        e = np.exp(x - x.max(-1, keepdims=True))
        return (e / e.sum(-1, keepdims=True)).astype(np.float32)

    # Case 1: generic batch, partial mask, min_active=1.
    w1 = softmax(rng.normal(size=(16, 4)))
    m1 = (rng.random((16, 4)) > 0.4).astype(np.float32)
    cases["c1"] = (w1, m1, 0.3, 0.7, 1, True)

    # Case 2: all-dropped rows trigger min_active=2 top-k replacement.
    w2 = softmax(rng.normal(size=(8, 5)))
    m2 = np.zeros((8, 5), dtype=np.float32)
    cases["c2"] = (w2, m2, 0.9, 0.5, 2, True)

    # Case 3: degenerate rows — zeros, NaN, Inf, unnormalized.
    w3 = np.stack(
        [
            np.array([0.0, 0.0, 0.0], dtype=np.float32),
            np.array([np.nan, 0.5, 0.5], dtype=np.float32),
            np.array([np.inf, 0.25, 0.25], dtype=np.float32),
            np.array([2.0, 6.0, 2.0], dtype=np.float32),
        ]
    )
    m3 = np.ones((4, 3), dtype=np.float32)
    cases["c3"] = (w3, m3, 0.15, 0.7, 1, True)

    # Case 4: eval path (no mask injection needed).
    w4 = softmax(rng.normal(size=(6, 3)))
    cases["c4"] = (w4, None, 0.15, 0.7, 1, False)

    # Case 5: 3-D weights (B, T, S) as produced by the attention pool.
    w5 = softmax(rng.normal(size=(4, 2, 3)))
    m5 = (rng.random((4, 2, 3)) > 0.5).astype(np.float32)
    cases["c5"] = (w5, m5, 0.5, 0.9, 1, True)

    # Case 6: near-ties in top-k (distinct values — torch.topk tie order on
    # exact ties is implementation-defined and differs CPU vs CUDA, so exact
    # ties are excluded from the golden contract; see
    # tests/test_masking.py::test_min_active_tie_break_first_occurrence for
    # our deterministic lowest-index behavior).
    w6 = np.array(
        [
            [0.2500001, 0.25, 0.2499999, 0.25],
            [0.1, 0.5, 0.15, 0.25],
            [0.4, 0.1, 0.4000001, 0.0999999],
        ],
        dtype=np.float32,
    )
    w6 = w6 / w6.sum(-1, keepdims=True)
    m6 = np.zeros((3, 4), dtype=np.float32)
    cases["c6"] = (w6, m6, 1.0, 0.7, 2, True)

    blob = {}
    for name, (w, mask, bmp, et, ma, training) in cases.items():
        rec = run_case(w, mask, bmp, et, ma, training)
        blob[f"{name}_weights"] = w
        if mask is not None:
            blob[f"{name}_mask"] = mask
        blob[f"{name}_base_mask_prob"] = np.array(bmp)
        blob[f"{name}_entropy_target"] = np.array(et)
        blob[f"{name}_min_active"] = np.array(ma)
        blob[f"{name}_training"] = np.array(training)
        for k, v in rec.items():
            blob[f"{name}_{k}"] = v

    np.savez(OUT, **blob)
    print(f"wrote {OUT} with {len(cases)} cases")


def generate_torch_ckpt_golden():
    """Golden for the torch-checkpoint converter (contrib/torch_compat.py):
    a reference pool with TORCH's own random init, its state_dict persisted
    as npz, plus eval and injected-mask train outputs on fixed inputs.  Also
    dev-time-checks the export direction: our state_dict round-trips through
    ``load_state_dict(strict=True)`` on a fresh reference pool.
    """
    from aecf import CurriculumMasking as RefMasking
    from aecf import MultimodalAttentionPool as RefPool

    out_path = os.path.join(
        os.path.dirname(__file__), "torch_ckpt_golden.npz"
    )
    E, M, B, H = 24, 3, 5, 3
    torch.manual_seed(123)
    pool = RefPool(
        embed_dim=E,
        num_heads=H,
        curriculum_masking=RefMasking(
            base_mask_prob=0.5, entropy_target=0.7, min_active=1
        ),
        batch_first=True,
    )
    rng = np.random.default_rng(11)
    q = rng.normal(size=(B, 1, E)).astype(np.float32)
    kv = rng.normal(size=(B, M, E)).astype(np.float32)
    mask = (rng.random((B, 1, M)) > 0.4).astype(np.float32)

    pool.eval()
    with torch.no_grad():
        out_eval, info_eval = pool(
            torch.tensor(q), torch.tensor(kv), return_info=True
        )
    pool.train()
    orig = torch.bernoulli
    try:
        torch.bernoulli = lambda p: torch.tensor(mask, dtype=p.dtype)
        with torch.no_grad():
            out_train, info_train = pool(
                torch.tensor(q), torch.tensor(kv), return_info=True
            )
    finally:
        torch.bernoulli = orig

    blob = {"q": q, "kv": kv, "mask": mask,
            "out_eval": out_eval.numpy(), "out_train": out_train.numpy(),
            "info_train_masked": info_train["masked_attention_weights"].numpy(),
            "info_train_entropy": info_train["entropy"].numpy(),
            "num_heads": np.array(H)}
    for k, v in pool.state_dict().items():
        blob[f"sd.{k}"] = v.numpy()
    np.savez(out_path, **blob)

    # Export direction: our converter's state_dict must strict-load back
    # into a fresh reference pool and reproduce the same eval output.
    # (repo root is on sys.path at module top)
    from aecf_tpu.contrib.torch_compat import (
        attention_pool_params_from_state_dict,
        attention_pool_state_dict,
    )

    np_sd = {k: v.numpy() for k, v in pool.state_dict().items()}
    params = attention_pool_params_from_state_dict(np_sd)
    exported = attention_pool_state_dict(params)
    torch.manual_seed(999)
    pool2 = RefPool(
        embed_dim=E, num_heads=H,
        curriculum_masking=RefMasking(base_mask_prob=0.5),
        batch_first=True,
    )
    pool2.load_state_dict(
        {k: torch.tensor(v) for k, v in exported.items()}, strict=True
    )
    pool2.eval()
    with torch.no_grad():
        out2 = pool2(torch.tensor(q), torch.tensor(kv))
    np.testing.assert_allclose(out2.numpy(), out_eval.numpy(), atol=1e-6)
    print(f"wrote {out_path}; export round-trip through torch verified")


def generate_random_pool_goldens(n_cases: int = 24):
    """Randomized config sweep vs the live reference (round-3 verdict
    Next #6): N pool configs spanning H ∈ {1,2,4,8}, bias on/off,
    batch_first both, M ∈ 2-6, tgt_len T ∈ {1,2,3}, odd batches,
    with/without key_padding_mask, value≠key, train (injected Bernoulli
    mask) and eval — each with the reference's exact outputs recorded.
    The fixed goldens above pin one corner (H=4, bias on, T=1); a
    systematic torch-vs-JAX divergence hiding in any other corner gets
    caught here.  T>1 exercises the reference's multi-query pooling:
    head-averaged weights come back (B, T, S) and the masking chain runs
    over every query row (AECFLayer.py:515-534).  Contract anchor: the
    reference forward, AECFLayer.py:409-547.
    """
    import json

    from aecf import CurriculumMasking as RefMasking
    from aecf import MultimodalAttentionPool as RefPool

    out_path = os.path.join(
        os.path.dirname(__file__), "pool_random_golden.npz"
    )
    rng = np.random.default_rng(20260817)
    blob = {}
    case_meta = []
    for i in range(n_cases):
        H = int(rng.choice([1, 2, 4, 8]))
        Dh = int(rng.choice([4, 8, 16]))
        E = H * Dh
        M = int(rng.integers(2, 7))
        T = int(rng.choice([1, 1, 2, 3]))  # tgt_len; T=1 stays dominant
        B = int(rng.choice([3, 5, 7, 9, 11, 13, 17]))
        bias = bool(rng.random() < 0.5)
        batch_first = bool(rng.random() < 0.5)
        use_pad = bool(rng.random() < 0.4)
        sep_value = bool(rng.random() < 0.25)
        training = bool(rng.random() < 0.8)
        base_mask_prob = float(np.round(rng.uniform(0.1, 0.9), 3))
        entropy_target = float(np.round(rng.uniform(0.4, 0.9), 3))
        min_active = int(rng.integers(1, min(M, 2) + 1))

        torch.manual_seed(1000 + i)  # torch's own init — not ours
        pool = RefPool(
            embed_dim=E,
            num_heads=H,
            bias=bias,
            batch_first=batch_first,
            curriculum_masking=RefMasking(
                base_mask_prob=base_mask_prob,
                entropy_target=entropy_target,
                min_active=min_active,
            ),
        )
        pool.train(training)

        q = rng.normal(size=(B, T, E)).astype(np.float32)
        kv = rng.normal(size=(B, M, E)).astype(np.float32)
        value = (
            rng.normal(size=(B, M, E)).astype(np.float32)
            if sep_value else None
        )
        pad = None
        if use_pad:
            pad = rng.random((B, M)) < 0.3
            pad[:, 0] = False  # never fully-padded rows
        mask = (
            (rng.random((B, T, M)) > 0.5).astype(np.float32)
            if training else None
        )

        def tt(x, bf=batch_first):
            t = torch.tensor(x)
            return t if bf else t.transpose(0, 1).contiguous()

        t_args = [tt(q), tt(kv)]
        t_kw = {"return_info": True}
        if value is not None:
            t_args.append(tt(value))
        if pad is not None:
            t_kw["key_padding_mask"] = torch.tensor(pad)

        orig = torch.bernoulli
        try:
            if mask is not None:
                torch.bernoulli = lambda p: torch.tensor(
                    mask, dtype=p.dtype
                )
            with torch.no_grad():
                out, info = pool(*t_args, **t_kw)
        finally:
            torch.bernoulli = orig

        name = f"r{i}"
        case_meta.append(
            {
                "name": name, "E": E, "H": H, "M": M, "B": B, "T": T,
                "bias": bias, "batch_first": batch_first,
                "use_pad": use_pad, "sep_value": sep_value,
                "training": training,
                "base_mask_prob": base_mask_prob,
                "entropy_target": entropy_target,
                "min_active": min_active,
            }
        )
        blob[f"{name}_q"] = q
        blob[f"{name}_kv"] = kv
        if value is not None:
            blob[f"{name}_value"] = value
        if pad is not None:
            blob[f"{name}_pad"] = pad
        if mask is not None:
            blob[f"{name}_mask"] = mask
        for k, v in pool.state_dict().items():
            blob[f"{name}_sd.{k}"] = v.numpy()
        blob[f"{name}_out"] = out.numpy()
        for k, v in info.items():
            blob[f"{name}_info_{k}"] = v.detach().numpy()

    blob["cases"] = np.frombuffer(
        json.dumps(case_meta).encode(), dtype=np.uint8
    )
    np.savez(out_path, **blob)
    print(f"wrote {out_path} with {n_cases} randomized cases")


if __name__ == "__main__":
    main()
    generate_composed_pool_golden()
    generate_torch_ckpt_golden()
    generate_random_pool_goldens()
