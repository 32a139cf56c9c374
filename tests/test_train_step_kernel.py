"""Fused one-pass train-step kernel vs the two-pass value_and_grad path.

The fused step computes gradients directly (no autodiff), so these tests
pin it against ``jax.value_and_grad`` of the exact same loss through the
two-pass kernel path (forward kernel + custom_vjp backward), hermetically
via the Pallas interpreter.  Gradients are mask-independent (quirk Q1) so
``training=False`` covers the full math on CPU; the TPU-gated suite
(tests/test_kernels.py) covers the training draws on hardware.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aecf_tpu.core.init import init_attention_pool_params, init_fusion_query
from aecf_tpu.kernels import (
    fused_fusion_pool_shared,
    fused_pool_head_train_step,
    fused_pool_train_step,
    quantize_features,
    supports_fused_step,
)


def _setup(E=64, M=3, B=100, bias=True, seed=0, dtype=jnp.float32):
    params = init_attention_pool_params(jax.random.key(seed), E, bias=bias)
    query = init_fusion_query(jax.random.key(seed + 1), E)
    kv = jax.random.normal(jax.random.key(seed + 2), (B, M, E)).astype(dtype)
    return params, query, kv


def _two_pass(params, query, kv, *, kv_grad=False, kpm=None,
              kv_scales=None):
    """Loss value + grads via autodiff through the two-pass kernel path."""

    def loss_fn(p, q, feats):
        out, _w, _mw, _info = fused_fusion_pool_shared(
            p, q, feats, num_heads=1, training=False, interpret=True,
            precision="highest", kv_grad=kv_grad, key_padding_mask=kpm,
            kv_scales=kv_scales,
        )
        return (out * out).mean()

    return jax.value_and_grad(loss_fn, argnums=(0, 1, 2))(params, query, kv)


def _assert_tree_close(a, b, atol=1e-5):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=atol)


class TestFusedStepInterpret:
    def test_supports_gate(self):
        assert supports_fused_step(1, 512)
        assert supports_fused_step(1, 1024)
        assert not supports_fused_step(2, 512)
        assert not supports_fused_step(1, 2048)

    @pytest.mark.parametrize("bias", [True, False])
    @pytest.mark.parametrize("kv_grad", [False, True])
    def test_grads_match_two_pass(self, bias, kv_grad):
        params, query, kv = _setup(bias=bias)
        loss_o, (dp_o, dq_o, dkv_o) = _two_pass(
            params, query, kv, kv_grad=kv_grad
        )
        loss_k, dp_k, dq_k, dkv_k, info = fused_pool_train_step(
            params, query, kv, rng=None, training=False,
            precision="highest", kv_grad=kv_grad, interpret=True,
        )
        np.testing.assert_allclose(loss_k, loss_o, rtol=1e-6)
        _assert_tree_close(dp_k, dp_o)
        np.testing.assert_allclose(dq_k, dq_o, atol=1e-5)
        if kv_grad:
            np.testing.assert_allclose(dkv_k, dkv_o, atol=1e-5)
        else:
            assert dkv_k is None
            np.testing.assert_allclose(np.asarray(dkv_o), 0.0, atol=0)
        # eval info key contract (no draw happened)
        assert set(info) == {
            "entropy", "mask_rate",
            "attention_weights", "masked_attention_weights",
        }
        np.testing.assert_allclose(np.asarray(info["mask_rate"]), 0.0)

    def test_odd_batch_padding_is_masked(self):
        # B=100 pads to the tile multiple; padded rows have out == bctx
        # (nonzero!), so an unmasked loss would be wrong.  Compare the
        # loss against the two-pass value, which only ever sees B rows.
        params, query, kv = _setup(B=100)
        loss_o, (dp_o, dq_o, _) = _two_pass(params, query, kv)
        loss_k, dp_k, dq_k, _, _ = fused_pool_train_step(
            params, query, kv, rng=None, training=False,
            precision="highest", interpret=True,
        )
        np.testing.assert_allclose(loss_k, loss_o, rtol=1e-6)
        _assert_tree_close(dp_k, dp_o)
        np.testing.assert_allclose(dq_k, dq_o, atol=1e-5)

    def test_key_padding_mask(self):
        params, query, kv = _setup()
        kpm = jax.random.uniform(jax.random.key(7), (kv.shape[0], 3)) < 0.25
        kpm = kpm.at[:, 0].set(False)  # keep one live slot per row
        loss_o, (dp_o, dq_o, _) = _two_pass(params, query, kv, kpm=kpm)
        loss_k, dp_k, dq_k, _, _ = fused_pool_train_step(
            params, query, kv, rng=None, training=False,
            precision="highest", key_padding_mask=kpm, interpret=True,
        )
        np.testing.assert_allclose(loss_k, loss_o, rtol=1e-6)
        _assert_tree_close(dp_k, dp_o)
        np.testing.assert_allclose(dq_k, dq_o, atol=1e-5)

    def test_bf16_features(self):
        params, query, kv = _setup(dtype=jnp.bfloat16)
        loss_o, (dp_o, dq_o, _) = _two_pass(params, query, kv)
        loss_k, dp_k, dq_k, _, _ = fused_pool_train_step(
            params, query, kv, rng=None, training=False,
            precision="highest", interpret=True,
        )
        np.testing.assert_allclose(loss_k, loss_o, rtol=1e-5)
        _assert_tree_close(dp_k, dp_o, atol=1e-4)
        np.testing.assert_allclose(dq_k, dq_o, atol=1e-4)

    def test_int8_features(self):
        params, query, kv = _setup()
        kv_q8, scales = quantize_features(kv)
        loss_o, (dp_o, dq_o) = jax.value_and_grad(
            lambda p, q: (fused_fusion_pool_shared(
                p, q, kv_q8, kv_scales=scales, num_heads=1,
                training=False, interpret=True, precision="highest",
            )[0] ** 2).mean(),
            argnums=(0, 1),
        )(params, query)
        loss_k, dp_k, dq_k, dkv_k, _ = fused_pool_train_step(
            params, query, kv_q8, kv_scales=scales, rng=None,
            training=False, precision="highest", interpret=True,
        )
        np.testing.assert_allclose(loss_k, loss_o, rtol=1e-6)
        _assert_tree_close(dp_k, dp_o)
        np.testing.assert_allclose(dq_k, dq_o, atol=1e-5)
        assert dkv_k is None

    def test_custom_row_loss_with_extras(self):
        # A row-local loss through the callback hook: per-row L2 pull
        # toward per-row targets with per-row weights, both streamed in
        # via row_extras (tensors cannot be closed over in a Pallas
        # kernel); matches autodiff of the same formula two-pass.
        params, query, kv = _setup()
        B, _, E = kv.shape
        targets = jax.random.normal(jax.random.key(9), (B, E))
        wrow = jax.random.uniform(jax.random.key(10), (B, 1)) + 0.5
        inv = 1.0 / (B * E)
        loss_o, (dp_o, dq_o, _) = jax.value_and_grad(
            lambda p, q, f: (wrow * (fused_fusion_pool_shared(
                p, q, f, num_heads=1, training=False, interpret=True,
                precision="highest", kv_grad=False,
            )[0][:, 0, :] - targets) ** 2).mean(),
            argnums=(0, 1, 2),
        )(params, query, kv)
        row_loss = lambda out, tgt, w: (  # noqa: E731
            (w * (out - tgt) ** 2).sum(axis=-1, keepdims=True) * inv,
            w * (out - tgt) * (2.0 * inv),
        )
        loss_k, dp_k, dq_k, _, _ = fused_pool_train_step(
            params, query, kv, rng=None, training=False,
            precision="highest", row_loss=row_loss,
            row_extras=(targets, wrow), interpret=True,
        )
        np.testing.assert_allclose(loss_k, loss_o, rtol=1e-6)
        _assert_tree_close(dp_k, dp_o)
        np.testing.assert_allclose(dq_k, dq_o, atol=1e-5)

        with pytest.raises(ValueError, match="row_extras"):
            fused_pool_train_step(
                params, query, kv, rng=None, training=False,
                row_loss=row_loss, row_extras=(targets[: B - 1], wrow),
                interpret=True,
            )

    def test_single_modality_training_needs_no_rng(self):
        # M == 1: masking is the reference early-return no-op — no RNG is
        # consumed, so training mode runs in the interpreter too.
        params, query, kv = _setup(M=1)
        loss_o, (dp_o, dq_o, _) = _two_pass(params, query, kv)
        loss_k, dp_k, dq_k, _, info = fused_pool_train_step(
            params, query, kv, rng=None, training=True,
            precision="highest", interpret=True,
        )
        np.testing.assert_allclose(loss_k, loss_o, rtol=1e-6)
        _assert_tree_close(dp_k, dp_o)
        np.testing.assert_allclose(dq_k, dq_o, atol=1e-5)
        assert set(info) >= {"entropy", "mask_rate", "target_entropy"}
        np.testing.assert_allclose(np.asarray(info["entropy"]), 0.0)

    def test_info_matches_two_pass_eval(self):
        params, query, kv = _setup()
        _out, w, mw, info_o = fused_fusion_pool_shared(
            params, query, kv, num_heads=1, training=False,
            interpret=True, precision="highest",
        )
        _loss, _dp, _dq, _dkv, info_k = fused_pool_train_step(
            params, query, kv, rng=None, training=False,
            precision="highest", interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(info_k["entropy"][:, 0]),
            np.asarray(info_o["entropy"][:, 0]),
            atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(info_k["attention_weights"]), np.asarray(w),
            atol=1e-6,
        )

    def test_loss_scale(self):
        # loss_scale multiplies the default losses' normalizer linearly
        # (the DP builders pass 1/axis_size and psum).
        params, query, kv = _setup()
        loss1, dp1, dq1, _, _ = fused_pool_train_step(
            params, query, kv, rng=None, training=False,
            precision="highest", interpret=True,
        )
        loss2, dp2, dq2, _, _ = fused_pool_train_step(
            params, query, kv, rng=None, training=False,
            precision="highest", loss_scale=0.25, interpret=True,
        )
        np.testing.assert_allclose(loss2, 0.25 * loss1, rtol=1e-6)
        _assert_tree_close(
            dp2, jax.tree.map(lambda x: 0.25 * x, dp1), atol=1e-7
        )
        np.testing.assert_allclose(dq2, 0.25 * dq1, atol=1e-7)

    def test_validation(self):
        params, query, kv = _setup()
        with pytest.raises(ValueError, match="query"):
            fused_pool_train_step(
                params, jnp.zeros((2, 1, 64)), kv, rng=None,
                training=False, interpret=True,
            )
        with pytest.raises(ValueError, match="E <= "):
            fused_pool_train_step(
                init_attention_pool_params(jax.random.key(0), 2048),
                init_fusion_query(jax.random.key(1), 2048),
                jnp.zeros((8, 3, 2048)), rng=None, training=False,
                interpret=True,
            )
        with pytest.raises(ValueError, match="rng"):
            fused_pool_train_step(
                params, query, kv, rng=None, training=True,
                interpret=True,
            )
        with pytest.raises(ValueError, match="precision"):
            fused_pool_train_step(
                params, query, kv, rng=None, training=False,
                precision="high", interpret=True,
            )
        with pytest.raises(ValueError, match="kv_scales"):
            fused_pool_train_step(
                params, query, kv, rng=None, training=False,
                kv_scales=jnp.ones((kv.shape[0], 3)), interpret=True,
            )
        q8, scales = quantize_features(kv)
        with pytest.raises(ValueError, match="kv_scales"):
            fused_pool_train_step(
                params, query, q8, rng=None, training=False,
                interpret=True,
            )
        with pytest.raises(ValueError, match="frozen"):
            fused_pool_train_step(
                params, query, q8, kv_scales=scales, kv_grad=True,
                rng=None, training=False, interpret=True,
            )


class TestFusedHeadStep:
    """Trainable-linear-head one-pass step (the reference X3 protocol:
    frozen features → pool → linear head → BCE,
    train_xrays_example.py:372-377) vs autodiff through the two-pass
    kernel path + an XLA head."""

    def _oracle(self, params, query, wh, bh, kv, labels, *, kv_grad=True):
        import optax

        def loss_fn(p, q, w, b, feats):
            out, _w, _mw, _info = fused_fusion_pool_shared(
                p, q, feats, num_heads=1, training=False, interpret=True,
                precision="highest", kv_grad=kv_grad,
            )
            logits = out[:, 0, :] @ w
            if b is not None:
                logits = logits + b
            return optax.sigmoid_binary_cross_entropy(
                logits, labels
            ).mean()

        argnums = (0, 1, 2, 4) if bh is None else (0, 1, 2, 3, 4)
        return jax.value_and_grad(loss_fn, argnums=argnums)(
            params, query, wh, bh, kv
        )

    def _head_setup(self, E=64, M=3, B=100, C=14, bias=True):
        params, query, kv = _setup(E=E, M=M, B=B)
        wh = jax.random.normal(jax.random.key(20), (E, C)) * 0.1
        bh = (
            jax.random.normal(jax.random.key(21), (C,)) * 0.1
            if bias else None
        )
        labels = (
            jax.random.uniform(jax.random.key(22), (B, C)) < 0.3
        ).astype(jnp.float32)
        return params, query, kv, wh, bh, labels

    @pytest.mark.parametrize("bias", [True, False])
    @pytest.mark.parametrize("kv_grad", [False, True])
    def test_bce_head_matches_autodiff(self, bias, kv_grad):
        params, query, kv, wh, bh, labels = self._head_setup(bias=bias)
        if bias:
            loss_o, (dp_o, dq_o, dw_o, db_o, dkv_o) = self._oracle(
                params, query, wh, bh, kv, labels, kv_grad=kv_grad
            )
        else:
            loss_o, (dp_o, dq_o, dw_o, dkv_o) = self._oracle(
                params, query, wh, None, kv, labels, kv_grad=kv_grad
            )
        head = {"w": wh, "b": bh}
        loss_k, grads, dkv_k, info = fused_pool_head_train_step(
            params, query, head, kv, labels, rng=None, training=False,
            precision="highest", kv_grad=kv_grad, interpret=True,
        )
        np.testing.assert_allclose(loss_k, loss_o, rtol=1e-6)
        _assert_tree_close(grads["pool"], dp_o, atol=1e-6)
        np.testing.assert_allclose(grads["query"], dq_o, atol=1e-6)
        np.testing.assert_allclose(grads["head"]["w"], dw_o, atol=1e-6)
        if bias:
            np.testing.assert_allclose(
                grads["head"]["b"], db_o, atol=1e-6
            )
        else:
            assert "b" not in grads["head"]
        if kv_grad:
            np.testing.assert_allclose(
                np.asarray(dkv_k), np.asarray(dkv_o), atol=1e-6
            )
        else:
            assert dkv_k is None
        # info contract still comes out of the same single pass
        assert "entropy" in info and "attention_weights" in info

    def test_wide_head_lane_padding(self):
        # C=130 > one 128-lane tile: padded columns must stay inert in
        # both the loss (BCE(0,0)=ln2 is NOT zero) and every gradient.
        params, query, kv, wh, bh, labels = self._head_setup(C=130)
        loss_o, (dp_o, dq_o, dw_o, db_o, _) = self._oracle(
            params, query, wh, bh, kv, labels
        )
        loss_k, grads, _, _ = fused_pool_head_train_step(
            params, query, {"w": wh, "b": bh}, kv, labels, rng=None,
            training=False, precision="highest", interpret=True,
        )
        np.testing.assert_allclose(loss_k, loss_o, rtol=1e-6)
        np.testing.assert_allclose(grads["head"]["w"], dw_o, atol=1e-6)
        np.testing.assert_allclose(grads["head"]["b"], db_o, atol=1e-6)
        _assert_tree_close(grads["pool"], dp_o, atol=1e-6)

    def test_custom_logit_loss(self):
        # row_loss acts on the LOGITS tile when a head is fused in
        # (extras start with the padded labels tile).
        params, query, kv, wh, bh, labels = self._head_setup(C=14)
        B, C = labels.shape
        inv = 1.0 / (B * C)

        def loss_fn(p, q, w, b):
            out, _w, _mw, _info = fused_fusion_pool_shared(
                p, q, kv, num_heads=1, training=False, interpret=True,
                precision="highest",
            )
            logits = out[:, 0, :] @ w + b
            return ((logits - labels) ** 2).mean()

        loss_o, (dp_o, dq_o, dw_o, db_o) = jax.value_and_grad(
            loss_fn, argnums=(0, 1, 2, 3)
        )(params, query, wh, bh)

        def logit_l2(logits, y):
            import jax.numpy as jnp
            from jax import lax

            colv = lax.broadcasted_iota(jnp.int32, logits.shape, 1) < C
            d = jnp.where(colv, logits - y, 0.0)
            return (d * d).sum(axis=-1, keepdims=True) * inv, d * (
                2.0 * inv
            )

        loss_k, grads, _, _ = fused_pool_head_train_step(
            params, query, {"w": wh, "b": bh}, kv, labels, rng=None,
            training=False, precision="highest", row_loss=logit_l2,
            interpret=True,
        )
        np.testing.assert_allclose(loss_k, loss_o, rtol=1e-6)
        np.testing.assert_allclose(grads["head"]["w"], dw_o, atol=1e-6)
        np.testing.assert_allclose(grads["head"]["b"], db_o, atol=1e-6)
        _assert_tree_close(grads["pool"], dp_o, atol=1e-6)
        np.testing.assert_allclose(grads["query"], dq_o, atol=1e-6)

    def test_head_validation(self):
        params, query, kv = _setup()
        E = kv.shape[-1]
        with pytest.raises(ValueError, match="head_w"):
            fused_pool_train_step(
                params, query, kv, rng=None, training=False,
                head_w=jnp.zeros((E + 1, 4)),
                labels=jnp.zeros((kv.shape[0], 4)), interpret=True,
            )
        with pytest.raises(ValueError, match="labels"):
            fused_pool_train_step(
                params, query, kv, rng=None, training=False,
                head_w=jnp.zeros((E, 4)),
                labels=jnp.zeros((kv.shape[0], 5)), interpret=True,
            )
        with pytest.raises(ValueError, match="head_b"):
            fused_pool_train_step(
                params, query, kv, rng=None, training=False,
                head_w=jnp.zeros((E, 4)), head_b=jnp.zeros((5,)),
                labels=jnp.zeros((kv.shape[0], 4)), interpret=True,
            )
        with pytest.raises(ValueError, match="labels"):
            fused_pool_train_step(
                params, query, kv, rng=None, training=False,
                head_w=jnp.zeros((E, 4)), interpret=True,
            )


class TestStagedAddressing:
    """Staged-batch addressing (row_offset/batch_rows): the kernel DMA's
    tiles straight from a stacked (S·B, ...) array — results must be
    BIT-identical to the equivalent per-step calls (scan-chunk builders
    rely on this to avoid the ~52µs/step slice materialization)."""

    def test_staged_equals_unstaged(self):
        E, M, B, S, C = 64, 3, 64, 3, 6
        params, query, _ = _setup(E=E, M=M, B=B)
        kv_all = jax.random.normal(jax.random.key(2), (S * B, M, E))
        wh = jax.random.normal(jax.random.key(3), (E, C)) * 0.1
        bh = jnp.zeros((C,))
        lab_all = (
            jax.random.uniform(jax.random.key(4), (S * B, C)) < 0.3
        ).astype(jnp.float32)
        for s in range(S):
            sl = slice(s * B, (s + 1) * B)
            loss_u, gr_u, _, info_u = fused_pool_head_train_step(
                params, query, {"w": wh, "b": bh}, kv_all[sl],
                lab_all[sl], rng=None, training=False,
                precision="highest", interpret=True,
            )
            loss_s, gr_s, _, info_s = fused_pool_head_train_step(
                params, query, {"w": wh, "b": bh}, kv_all, lab_all,
                rng=None, training=False, precision="highest",
                interpret=True, row_offset=jnp.int32(s * B),
                batch_rows=B,
            )
            np.testing.assert_array_equal(
                np.asarray(loss_s), np.asarray(loss_u)
            )
            for a, b in zip(
                jax.tree_util.tree_leaves(gr_s),
                jax.tree_util.tree_leaves(gr_u),
            ):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
            np.testing.assert_array_equal(
                np.asarray(info_s["entropy"]),
                np.asarray(info_u["entropy"]),
            )

    def test_staged_validation(self):
        params, query, kv = _setup()
        B = kv.shape[0]
        with pytest.raises(ValueError, match="batch_rows"):
            fused_pool_train_step(
                params, query, kv, rng=None, training=False,
                row_offset=jnp.int32(0), interpret=True,
            )
        with pytest.raises(ValueError, match="multiple"):
            fused_pool_train_step(
                params, query, kv, rng=None, training=False,
                row_offset=jnp.int32(0), batch_rows=B - 1,
                interpret=True,
            )

    def test_step_tile_resolution(self, monkeypatch):
        from aecf_tpu.kernels import step_tile

        assert step_tile(4096, 3, 512) == 256
        assert step_tile(8192, 4, 1024) == 256
        assert step_tile(4096, 3, 512, kv_grad=True) == 128
        assert step_tile(64, 3, 64) == 64  # batch clamp
        monkeypatch.setenv("AECF_STEP_TB", "96")
        assert step_tile(4096, 3, 512) == 96
