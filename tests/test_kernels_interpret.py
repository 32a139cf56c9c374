"""Hermetic kernel-logic tests via the Pallas interpreter (CPU suite).

The training path needs the TPU PRNG (prng_seed has no interpret lowering),
so only eval-path logic runs here; tests/test_kernels.py covers the rest on
real hardware.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aecf_tpu.core.attention import attention_pool_core
from aecf_tpu.core.init import init_attention_pool_params, init_fusion_query


class TestInterpretModeCPU:
    """Hermetic kernel-logic checks via the Pallas interpreter — run in the
    default CPU suite.  The training path needs the TPU PRNG (no interpret
    lowering for prng_seed), so only eval is covered here; TPU-gated tests
    below cover the rest on hardware."""

    @pytest.mark.parametrize("num_heads", [1, 4])
    def test_shared_eval_interpret_matches_oracle(self, num_heads):
        from aecf_tpu.kernels import fused_fusion_pool_shared

        E, M, B = 64, 3, 16
        params = init_attention_pool_params(jax.random.key(0), E)
        query = init_fusion_query(jax.random.key(1), E)
        kv = jax.random.normal(jax.random.key(2), (B, M, E))
        out_k, w_k, mw, info = fused_fusion_pool_shared(
            params, query, kv, num_heads=num_heads, training=False,
            interpret=True, precision="highest",
        )
        with jax.default_matmul_precision("highest"):
            out_o, w_o = attention_pool_core(
                params,
                jnp.broadcast_to(query, (B, 1, E)),
                kv,
                kv,
                num_heads=num_heads,
                need_weights=True,
            )
        np.testing.assert_allclose(out_k, out_o, atol=1e-5)
        np.testing.assert_allclose(w_k, w_o, atol=1e-5)
        np.testing.assert_allclose(mw, w_k, atol=1e-7)  # eval passthrough
        assert set(info) == {"entropy", "mask_rate"}

    def test_shared_eval_interpret_padding(self):
        from aecf_tpu.kernels import fused_fusion_pool_shared

        E, M, B = 64, 3, 16
        params = init_attention_pool_params(jax.random.key(0), E)
        query = init_fusion_query(jax.random.key(1), E)
        kv = jax.random.normal(jax.random.key(2), (B, M, E))
        kpm = jnp.zeros((B, M), bool).at[:, 2].set(True)
        _, w_k, _, _ = fused_fusion_pool_shared(
            params, query, kv, training=False, key_padding_mask=kpm,
            interpret=True,
        )
        np.testing.assert_allclose(np.asarray(w_k[:, :, 2]), 0.0, atol=1e-7)
        np.testing.assert_allclose(np.asarray(w_k.sum(-1)), 1.0, rtol=1e-5)




class TestPallasBackwardInterpret:
    """The fused Pallas backward (H==1) vs the XLA einsum backward — exact
    same cotangent contract, hermetically via the interpreter."""

    def _residuals(self, bias=True, mask=False):
        E, M, B = 64, 3, 40
        params = init_attention_pool_params(jax.random.key(0), E, bias=bias)
        qrow = init_fusion_query(jax.random.key(1), E)[0, 0]
        kv = jax.random.normal(jax.random.key(2), (B, M, E))
        kpm = (
            jax.random.uniform(jax.random.key(5), (B, M)) < 0.2
            if mask
            else None
        )
        cots = (
            jax.random.normal(jax.random.key(3), (B, E)),
            jax.random.normal(jax.random.key(4), (B, M)) * 0.1,
            jnp.zeros((B, M)),
            jnp.zeros((B,)),
            jnp.zeros((B,)),
        )
        return (params, qrow, kv, kpm), cots

    @pytest.mark.parametrize("bias,mask", [(True, False), (True, True),
                                           (False, False)])
    def test_bwd_matches_xla_impl(self, bias, mask):
        from aecf_tpu.kernels import shared_query as sq

        residuals, cots = self._residuals(bias=bias, mask=mask)
        ref = sq._shared_bwd_impl(1, residuals, cots)
        got = sq._bwd_pallas(
            residuals, cots, precision="highest", interpret=True
        )
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-5
            ),
            ref[:3],
            got[:3],
        )

    def test_end_to_end_grads_match_oracle(self):
        """jax.grad through the full custom_vjp (interpret fwd + interpret
        Pallas bwd) vs the XLA oracle."""
        from aecf_tpu.kernels import fused_fusion_pool_shared

        E, M, B = 64, 3, 24
        params = init_attention_pool_params(jax.random.key(0), E)
        query = init_fusion_query(jax.random.key(1), E)
        kv = jax.random.normal(jax.random.key(2), (B, M, E))

        def loss_k(p, qq, x):
            o, w, _, _ = fused_fusion_pool_shared(
                p, qq, x, training=False, interpret=True,
                precision="highest",
            )
            return (o * o).mean() + (w * w).sum()

        def loss_o(p, qq, x):
            with jax.default_matmul_precision("highest"):
                o, w = attention_pool_core(
                    p, jnp.broadcast_to(qq, (B, 1, E)), x, x, num_heads=1,
                    need_weights=True,
                )
            return (o * o).mean() + (w * w).sum()

        gk = jax.grad(loss_k, argnums=(0, 1, 2))(params, query, kv)
        go = jax.grad(loss_o, argnums=(0, 1, 2))(params, query, kv)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-5
            ),
            gk,
            go,
        )


@pytest.mark.parametrize("E_streamed", [2048, 4096], scope="class")
class TestStreamedE2048Interpret:
    """E > 1024 shared-query path (streamed split: Pallas one-pass-over-kv
    + XLA E×E GEMMs) — round-2 verdict Next #3.  Hermetic at E=2048/4096
    with a small batch; on-chip parity + A/B live in tests/test_kernels.py
    and benchmarks/suite.py."""

    @pytest.fixture(autouse=True)
    def _set_e(self, E_streamed):
        self.E = E_streamed

    def _setup(self, B=16, M=3):
        params = init_attention_pool_params(jax.random.key(0), self.E)
        query = init_fusion_query(jax.random.key(1), self.E)
        kv = jax.random.normal(jax.random.key(2), (B, M, self.E))
        return params, query, kv

    def test_eval_forward_matches_oracle(self):
        from aecf_tpu.kernels import fused_fusion_pool_shared

        params, query, kv = self._setup()
        B = kv.shape[0]
        out_k, w_k, mw, info = fused_fusion_pool_shared(
            params, query, kv, training=False, interpret=True,
            precision="highest",
        )
        with jax.default_matmul_precision("highest"):
            out_o, w_o = attention_pool_core(
                params, jnp.broadcast_to(query, (B, 1, self.E)), kv, kv,
                num_heads=1, need_weights=True,
            )
        np.testing.assert_allclose(out_k, out_o, atol=2e-4)
        np.testing.assert_allclose(w_k, w_o, atol=1e-5)
        np.testing.assert_allclose(mw, w_k, atol=1e-7)

    def test_padding(self):
        from aecf_tpu.kernels import fused_fusion_pool_shared

        params, query, kv = self._setup()
        B, M = kv.shape[:2]
        kpm = jnp.zeros((B, M), bool).at[:, 2].set(True)
        _, w_k, _, _ = fused_fusion_pool_shared(
            params, query, kv, training=False, key_padding_mask=kpm,
            interpret=True,
        )
        np.testing.assert_allclose(np.asarray(w_k[:, :, 2]), 0.0, atol=1e-7)
        np.testing.assert_allclose(np.asarray(w_k.sum(-1)), 1.0, rtol=1e-5)

    @pytest.mark.parametrize("kv_grad", [True, False])
    def test_end_to_end_grads_match_oracle(self, kv_grad):
        from aecf_tpu.kernels import fused_fusion_pool_shared

        params, query, kv = self._setup(B=12)
        B = kv.shape[0]

        def loss_k(p, qq, x):
            o, w, _, _ = fused_fusion_pool_shared(
                p, qq, x, training=False, interpret=True,
                precision="highest", kv_grad=kv_grad,
            )
            return (o * o).mean() + (w * w).sum()

        def loss_o(p, qq, x):
            with jax.default_matmul_precision("highest"):
                o, w = attention_pool_core(
                    p, jnp.broadcast_to(qq, (B, 1, self.E)), x, x,
                    num_heads=1, need_weights=True,
                )
            return (o * o).mean() + (w * w).sum()

        gk = jax.grad(loss_k, argnums=(0, 1, 2))(params, query, kv)
        go = jax.grad(loss_o, argnums=(0, 1, 2))(params, query, kv)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=2e-4
            ),
            (gk[0], gk[1]),
            (go[0], go[1]),
        )
        if kv_grad:
            np.testing.assert_allclose(
                np.asarray(gk[2]), np.asarray(go[2]), atol=2e-4
            )
        else:
            np.testing.assert_allclose(np.asarray(gk[2]), 0.0, atol=0)

    def test_training_mode_interpret_has_no_prng_lowering(self):
        # The streamed kernel draws the in-kernel TPU PRNG in training;
        # interpret mode has no lowering for it (same as the resident
        # path) — this pins that the eval/grad coverage above is the
        # hermetic boundary, and training E=2048 is TPU-gated.
        from aecf_tpu.kernels import fused_fusion_pool_shared

        params, query, kv = self._setup(B=8)
        with pytest.raises(Exception):
            jax.block_until_ready(
                fused_fusion_pool_shared(
                    params, query, kv, training=True,
                    rng=jax.random.key(0), interpret=True,
                )[0]
            )

    def test_supports_fused_streamed_gate(self):
        from aecf_tpu.kernels import supports_fused

        assert supports_fused(
            tgt_len=1, num_heads=1, embed_dim=2048, shared_query=True
        )
        assert not supports_fused(tgt_len=1, num_heads=1, embed_dim=2048)
        # H == 2 streams too (round-3 verdict Next #4); H > 2 does not.
        assert supports_fused(
            tgt_len=1, num_heads=2, embed_dim=2048, shared_query=True
        )
        assert not supports_fused(
            tgt_len=1, num_heads=4, embed_dim=2048, shared_query=True
        )
        assert not supports_fused(
            tgt_len=1, num_heads=1, embed_dim=16384, shared_query=True
        )

    def test_capability_caps_fail_loudly_every_dtype(self):
        """Unsupported shape/head combinations must raise a clear
        ValueError for EVERY kv dtype — f32/bf16 used to sail past the
        caps into an opaque Mosaic scoped-vmem failure while only int8
        failed cleanly (review round 4)."""
        from aecf_tpu.kernels import fused_fusion_pool_shared
        from aecf_tpu.kernels.shared_query import (
            _RESIDENT_E_CAP,
            _STREAMED_E_CAP,
        )

        def call(E, H, dtype=jnp.float32):
            params = init_attention_pool_params(jax.random.key(0), E)
            query = init_fusion_query(jax.random.key(1), E)
            kv = jnp.zeros((4, 3, E), dtype)
            return fused_fusion_pool_shared(
                params, query, kv, num_heads=H, training=False,
                interpret=True,
            )

        # H > 2 above the resident cap: no streamed variant exists
        with pytest.raises(ValueError, match="num_heads<=2"):
            call(_RESIDENT_E_CAP * 2, 4)
        with pytest.raises(ValueError, match="num_heads<=2"):
            call(_RESIDENT_E_CAP * 2, 4, jnp.bfloat16)
        # beyond the documented streamed cap: fail, don't guess a tile
        with pytest.raises(ValueError, match="streamed-split cap"):
            call(_STREAMED_E_CAP * 2, 1)
        # at the caps themselves nothing raises (shape checks only:
        # interpret-mode eval executes the E=2048 H<=2 streamed path)
        out, *_ = call(_RESIDENT_E_CAP * 2, 2)
        assert out.shape == (4, 1, _RESIDENT_E_CAP * 2)

    def test_eval_forward_h2_matches_oracle(self):
        """Two-head streamed split (round-3 verdict Next #4): per-head
        mixes from the Pallas kernel, V/out projections in XLA."""
        from aecf_tpu.kernels import fused_fusion_pool_shared

        params, query, kv = self._setup(B=12)
        B = kv.shape[0]
        out_k, w_k, mw, info = fused_fusion_pool_shared(
            params, query, kv, num_heads=2, training=False,
            interpret=True, precision="highest",
        )
        with jax.default_matmul_precision("highest"):
            out_o, w_o = attention_pool_core(
                params, jnp.broadcast_to(query, (B, 1, self.E)), kv, kv,
                num_heads=2, need_weights=True,
            )
        np.testing.assert_allclose(out_k, out_o, atol=2e-4)
        np.testing.assert_allclose(w_k, w_o, atol=1e-5)
        np.testing.assert_allclose(mw, w_k, atol=1e-7)

    @pytest.mark.parametrize("kv_grad", [True, False])
    def test_h2_grads_match_oracle(self, kv_grad):
        """H == 2 streamed forward + streamed multi-head Pallas backward
        (one kv pass; the XLA einsum backward reads kv 4x) end to end."""
        from aecf_tpu.kernels import fused_fusion_pool_shared

        params, query, kv = self._setup(B=8)
        B = kv.shape[0]

        def loss_k(p, qq, x):
            o, w, _, _ = fused_fusion_pool_shared(
                p, qq, x, num_heads=2, training=False, interpret=True,
                precision="highest", kv_grad=kv_grad,
            )
            return (o * o).mean() + (w * w).sum()

        def loss_o(p, qq, x):
            with jax.default_matmul_precision("highest"):
                o, w = attention_pool_core(
                    p, jnp.broadcast_to(qq, (B, 1, self.E)), x, x,
                    num_heads=2, need_weights=True,
                )
            return (o * o).mean() + (w * w).sum()

        gk = jax.grad(loss_k, argnums=(0, 1, 2))(params, query, kv)
        go = jax.grad(loss_o, argnums=(0, 1, 2))(params, query, kv)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=2e-4
            ),
            (gk[0], gk[1]),
            (go[0], go[1]),
        )
        if kv_grad:
            np.testing.assert_allclose(
                np.asarray(gk[2]), np.asarray(go[2]), atol=2e-4
            )
        else:
            np.testing.assert_allclose(np.asarray(gk[2]), 0.0, atol=0)


class TestH2BelowCapStreamedVJP:
    """Round-4 dispatch refinement: at H == 2 with 512 ≤ E ≤ 1024 the
    DIFFERENTIABLE forward (custom_vjp fwd) routes through the streamed
    split — its one-pass multi-head Pallas backward reads kv once where
    the resident path's XLA einsum backward reads it 4× (measured
    1.16-1.37× on the full train step).  The primal (eval/serving)
    dispatch keeps the resident kernel, which wins the gradient-free
    forward.  These tests pin the gate and grad parity on both sides of
    the AECF_H2_STREAM knob."""

    def test_vjp_wants_streamed_gate(self, monkeypatch):
        from aecf_tpu.kernels import shared_query as sq

        monkeypatch.delenv("AECF_H2_STREAM", raising=False)
        # H == 1: resident below the cap, streamed above — unchanged.
        assert not sq._vjp_wants_streamed(1, 512)
        assert not sq._vjp_wants_streamed(1, 1024)
        assert sq._vjp_wants_streamed(1, 2048)
        # H == 2: streams from E == 512 up.
        assert not sq._vjp_wants_streamed(2, 256)
        assert sq._vjp_wants_streamed(2, 512)
        assert sq._vjp_wants_streamed(2, 1024)
        assert sq._vjp_wants_streamed(2, 2048)
        # H > 2 never streams (no multi-head mix kernel beyond 2).
        assert not sq._vjp_wants_streamed(4, 2048)
        assert not sq._vjp_wants_streamed(8, 512)
        # The A/B knob restores the resident dispatch below the cap only;
        # above the cap streaming is the only fused option.
        monkeypatch.setenv("AECF_H2_STREAM", "0")
        assert not sq._vjp_wants_streamed(2, 512)
        assert not sq._vjp_wants_streamed(2, 1024)
        assert sq._vjp_wants_streamed(2, 2048)

    @pytest.mark.parametrize("E", [512, 1024])
    @pytest.mark.parametrize("kv_grad", [True, False])
    def test_h2_belowcap_grads_match_oracle(self, E, kv_grad):
        from aecf_tpu.kernels import fused_fusion_pool_shared

        M, B = 3, 8
        params = init_attention_pool_params(jax.random.key(0), E)
        query = init_fusion_query(jax.random.key(1), E)
        kv = jax.random.normal(jax.random.key(2), (B, M, E))

        def loss_k(p, qq, x):
            o, w, _, info = fused_fusion_pool_shared(
                p, qq, x, num_heads=2, training=False, interpret=True,
                precision="highest", kv_grad=kv_grad,
            )
            # entropy term exercises the cotangent fold on the streamed
            # residuals (outs[1] rides along on both dispatch arms)
            return (
                (o * o).mean() + (w * w).sum()
                + 0.1 * jnp.sum(info["entropy"])
            )

        def loss_o(p, qq, x):
            from aecf_tpu.core.masking import compute_entropy

            with jax.default_matmul_precision("highest"):
                o, w = attention_pool_core(
                    p, jnp.broadcast_to(qq, (B, 1, E)), x, x,
                    num_heads=2, need_weights=True,
                )
            return (
                (o * o).mean() + (w * w).sum()
                + 0.1 * jnp.sum(compute_entropy(w))
            )

        gk = jax.grad(loss_k, argnums=(0, 1, 2))(params, query, kv)
        go = jax.grad(loss_o, argnums=(0, 1, 2))(params, query, kv)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=2e-4
            ),
            (gk[0], gk[1]),
            (go[0], go[1]),
        )
        if kv_grad:
            np.testing.assert_allclose(
                np.asarray(gk[2]), np.asarray(go[2]), atol=2e-4
            )
        else:
            np.testing.assert_allclose(np.asarray(gk[2]), 0.0, atol=0)

    def test_h2_stream_knob_off_matches_default(self, monkeypatch):
        """AECF_H2_STREAM=0 (resident vjp) and the default (streamed vjp)
        must produce the same gradients — the dispatch is a pure perf
        choice, not a numerics choice."""
        from aecf_tpu.kernels import fused_fusion_pool_shared

        E, M, B = 512, 3, 8
        params = init_attention_pool_params(jax.random.key(0), E)
        query = init_fusion_query(jax.random.key(1), E)
        kv = jax.random.normal(jax.random.key(2), (B, M, E))

        def loss(p, qq, x):
            o, w, _, _ = fused_fusion_pool_shared(
                p, qq, x, num_heads=2, training=False, interpret=True,
                precision="highest",
            )
            return (o * o).mean() + (w * w).sum()

        monkeypatch.delenv("AECF_H2_STREAM", raising=False)
        g_stream = jax.grad(loss, argnums=(0, 1, 2))(params, query, kv)
        monkeypatch.setenv("AECF_H2_STREAM", "0")
        g_resident = jax.grad(loss, argnums=(0, 1, 2))(params, query, kv)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5
            ),
            g_stream,
            g_resident,
        )

    def test_q8_h2_belowcap_grads_match_dequant_oracle(self):
        """The q8 vjp forward rides the same below-cap H == 2 streamed
        boundary (``_q8_dispatch(differentiable=True)``)."""
        from aecf_tpu.kernels import fused_fusion_pool_shared, quantize_features

        E, M, B = 1024, 3, 8
        params = init_attention_pool_params(jax.random.key(0), E)
        query = init_fusion_query(jax.random.key(1), E)
        kv = jax.random.normal(jax.random.key(2), (B, M, E))
        q8, scales = quantize_features(kv)
        deq = q8.astype(jnp.float32) * scales[..., None]

        def loss_q(p, qq):
            out, w, _, _ = fused_fusion_pool_shared(
                p, qq, q8, kv_scales=scales, num_heads=2,
                training=False, precision="highest", interpret=True,
            )
            return jnp.sum(out**2) + jnp.sum(w)

        def loss_o(p, qq):
            out, w, _, _ = fused_fusion_pool_shared(
                p, qq, jax.lax.stop_gradient(deq), num_heads=2,
                training=False, precision="highest", interpret=True,
                kv_grad=False,
            )
            return jnp.sum(out**2) + jnp.sum(w)

        gq = jax.grad(loss_q, argnums=(0, 1))(params, query)
        go = jax.grad(loss_o, argnums=(0, 1))(params, query)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5
            ),
            gq,
            go,
        )


class TestEvalEntropyGradient:
    """Round-2 verdict Weak #2: eval-mode ``info['entropy']`` is NOT
    detached in the reference (AECFLayer.py:150-156); gradients through it
    must agree between the fused kernels and the XLA oracle instead of
    silently vanishing on the kernel path."""

    def _setup(self):
        E, M, B = 64, 3, 24
        params = init_attention_pool_params(jax.random.key(0), E)
        query = init_fusion_query(jax.random.key(1), E)
        kv = jax.random.normal(jax.random.key(2), (B, M, E))
        return E, M, B, params, query, kv

    def _oracle_grads(self, params, query, kv, B, E):
        from aecf_tpu.core.masking import compute_entropy

        def loss_o(p, qq, x):
            with jax.default_matmul_precision("highest"):
                _, w = attention_pool_core(
                    p, jnp.broadcast_to(qq, (B, 1, E)), x, x,
                    num_heads=1, need_weights=True,
                )
            return (compute_entropy(w) ** 2).mean()

        return jax.grad(loss_o, argnums=(0, 1, 2))(params, query, kv)

    @pytest.mark.parametrize("bwd", ["pallas", "xla"])
    def test_shared_eval_entropy_grad_matches_oracle(self, bwd, monkeypatch):
        from aecf_tpu.kernels import fused_fusion_pool_shared

        monkeypatch.setenv("AECF_SHARED_BWD", bwd)
        E, M, B, params, query, kv = self._setup()

        def loss_k(p, qq, x):
            _, _, _, info = fused_fusion_pool_shared(
                p, qq, x, training=False, interpret=True,
                precision="highest",
            )
            return (info["entropy"] ** 2).mean()

        gk = jax.grad(loss_k, argnums=(0, 1, 2))(params, query, kv)
        go = self._oracle_grads(params, query, kv, B, E)
        # the gradient must be nonzero (the old behavior was silent zero)
        assert float(jnp.abs(gk[2]).max()) > 0
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-5
            ),
            gk,
            go,
        )

    def test_generic_eval_entropy_grad_matches_oracle(self):
        from aecf_tpu.kernels import fused_fusion_pool

        E, M, B, params, query, kv = self._setup()
        q_full = jnp.broadcast_to(query, (B, 1, E))

        def loss_k(p, x):
            _, _, _, info = fused_fusion_pool(
                p, q_full, x, training=False, interpret=True
            )
            return (info["entropy"] ** 2).mean()

        gk = jax.grad(loss_k, argnums=(0, 1))(params, kv)
        go = self._oracle_grads(params, query, kv, B, E)
        assert float(jnp.abs(gk[1]).max()) > 0
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-5
            ),
            (gk[0], gk[1]),
            (go[0], go[2]),
        )


class TestQuantizedFeaturesInterpret:
    """int8 kv serving path: quantize → fused kernel → near-oracle output."""

    def test_quantize_round_trip(self):
        from aecf_tpu.kernels import quantize_features

        kv = jax.random.normal(jax.random.key(0), (8, 3, 64))
        q8, scales = quantize_features(kv)
        assert q8.dtype == jnp.int8 and scales.shape == (8, 3)
        deq = q8.astype(jnp.float32) * scales[..., None]
        assert float(jnp.abs(deq - kv).max()) < 0.05
        # zero rows quantize without dividing by zero
        q0, s0 = quantize_features(jnp.zeros((2, 3, 64)))
        assert float(jnp.abs(q0).max()) == 0.0 and np.isfinite(s0).all()

    def test_q8_matches_oracle_within_quant_tolerance(self):
        from aecf_tpu.kernels import fused_fusion_pool_shared, quantize_features

        E, M, B = 64, 3, 24
        params = init_attention_pool_params(jax.random.key(0), E)
        query = init_fusion_query(jax.random.key(1), E)
        kv = jax.random.normal(jax.random.key(2), (B, M, E))
        q8, scales = quantize_features(kv)
        out_q, w_q, mw_q, info = fused_fusion_pool_shared(
            params, query, q8, kv_scales=scales, training=False,
            interpret=True, precision="highest",
        )
        with jax.default_matmul_precision("highest"):
            out_o, w_o = attention_pool_core(
                params, jnp.broadcast_to(query, (B, 1, E)), kv, kv,
                num_heads=1, need_weights=True,
            )
        assert float(jnp.abs(out_q - out_o).max()) < 0.1
        assert float(jnp.abs(w_q - w_o).max()) < 0.02
        np.testing.assert_allclose(np.asarray(w_q.sum(-1)), 1.0, rtol=1e-5)
        assert set(info) == {"entropy", "mask_rate"}

    def test_q8_streamed_e2048_matches_oracle(self):
        """int8 kv above the resident cap routes through the streamed
        split (dequant in the mix kernel, E×E GEMM in XLA)."""
        from aecf_tpu.kernels import (
            fused_fusion_pool_shared,
            quantize_features,
        )

        E, M, B = 2048, 3, 12
        params = init_attention_pool_params(jax.random.key(0), E)
        query = init_fusion_query(jax.random.key(1), E)
        kv = jax.random.normal(jax.random.key(2), (B, M, E))
        q8, scales = quantize_features(kv)
        out_q, w_q, mw_q, info = fused_fusion_pool_shared(
            params, query, q8, kv_scales=scales, training=False,
            interpret=True, precision="highest",
        )
        with jax.default_matmul_precision("highest"):
            out_o, w_o = attention_pool_core(
                params, jnp.broadcast_to(query, (B, 1, E)), kv, kv,
                num_heads=1, need_weights=True,
            )
        assert float(jnp.abs(out_q - out_o).max()) < 0.3  # quant noise @E=2048
        assert float(jnp.abs(w_q - w_o).max()) < 0.02
        np.testing.assert_allclose(np.asarray(w_q.sum(-1)), 1.0, rtol=1e-5)
        assert set(info) == {"entropy", "mask_rate"}

    def test_q8_streamed_h2_matches_oracle(self):
        """int8 kv through the two-head streamed split (H ≤ 2 since
        round 4; H > 2 still raises below)."""
        from aecf_tpu.kernels import (
            fused_fusion_pool_shared,
            quantize_features,
        )

        E, M, B = 2048, 3, 8
        params = init_attention_pool_params(jax.random.key(0), E)
        query = init_fusion_query(jax.random.key(1), E)
        kv = jax.random.normal(jax.random.key(2), (B, M, E))
        q8, scales = quantize_features(kv)
        out_q, w_q, _, _ = fused_fusion_pool_shared(
            params, query, q8, kv_scales=scales, num_heads=2,
            training=False, interpret=True, precision="highest",
        )
        with jax.default_matmul_precision("highest"):
            out_o, w_o = attention_pool_core(
                params, jnp.broadcast_to(query, (B, 1, E)), kv, kv,
                num_heads=2, need_weights=True,
            )
        assert float(jnp.abs(out_q - out_o).max()) < 0.3
        assert float(jnp.abs(w_q - w_o).max()) < 0.02

    def test_q8_streamed_h_gt2_raises(self):
        from aecf_tpu.kernels import (
            fused_fusion_pool_shared,
            quantize_features,
        )

        E, M, B = 2048, 4, 8
        params = init_attention_pool_params(jax.random.key(0), E)
        query = init_fusion_query(jax.random.key(1), E)
        q8, scales = quantize_features(
            jax.random.normal(jax.random.key(2), (B, M, E))
        )
        with pytest.raises(ValueError, match="num_heads<=2"):
            fused_fusion_pool_shared(
                params, query, q8, kv_scales=scales, num_heads=4,
                training=False, interpret=True,
            )

    def test_int8_requires_scales(self):
        from aecf_tpu.kernels import fused_fusion_pool_shared, quantize_features

        E, M, B = 64, 3, 8
        params = init_attention_pool_params(jax.random.key(0), E)
        query = init_fusion_query(jax.random.key(1), E)
        q8, _ = quantize_features(
            jax.random.normal(jax.random.key(2), (B, M, E))
        )
        with pytest.raises(ValueError, match="kv_scales"):
            fused_fusion_pool_shared(
                params, query, q8, training=False, interpret=True
            )


class TestKvGradSkip:
    """kv_grad=False: the fused backward skips the d_kv write (a third of
    its HBM traffic) without touching any other cotangent."""

    def _setup(self):
        E, M, B = 64, 3, 40
        params = init_attention_pool_params(jax.random.key(0), E)
        qrow = init_fusion_query(jax.random.key(1), E)[0, 0]
        kv = jax.random.normal(jax.random.key(2), (B, M, E))
        cots = (
            jax.random.normal(jax.random.key(3), (B, E)),
            jax.random.normal(jax.random.key(4), (B, M)) * 0.1,
            jnp.zeros((B, M)),
            jnp.zeros((B,)),
            jnp.zeros((B,)),
        )
        return (params, qrow, kv, None), cots

    def test_bwd_pallas_no_dkv_matches_param_grads(self):
        from aecf_tpu.kernels import shared_query as sq

        residuals, cots = self._setup()
        full = sq._bwd_pallas(
            residuals, cots, precision="highest", interpret=True
        )
        slim = sq._bwd_pallas(
            residuals, cots, precision="highest", interpret=True,
            want_dkv=False,
        )
        # d_params and d_qrow identical; d_kv becomes zeros.
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-6
            ),
            full[:2],
            slim[:2],
        )
        assert float(jnp.abs(slim[2]).max()) == 0.0
        assert float(jnp.abs(full[2]).max()) > 0.0

    def test_end_to_end_kv_grad_false_param_grads_unchanged(self):
        """jax.grad over params/query through the public entry with
        kv_grad=False equals the kv_grad=True grads exactly."""
        from aecf_tpu.kernels import fused_fusion_pool_shared

        E, M, B = 64, 3, 24
        params = init_attention_pool_params(jax.random.key(0), E)
        query = init_fusion_query(jax.random.key(1), E)
        kv = jax.random.normal(jax.random.key(2), (B, M, E))

        def loss(p, qq, grad_kv):
            o, w, _, _ = fused_fusion_pool_shared(
                p, qq, kv, training=False, interpret=True,
                precision="highest", kv_grad=grad_kv,
            )
            return (o * o).mean() + (w * w).sum()

        g_full = jax.grad(loss, argnums=(0, 1))(params, query, True)
        g_slim = jax.grad(loss, argnums=(0, 1))(params, query, False)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-6
            ),
            g_full,
            g_slim,
        )

    def test_ops_kv_grad_false_stops_feature_grad(self):
        """ops.fusion_pool(kv_grad=False): d_kv is exactly zero on the XLA
        path (stop_gradient), param grads unchanged."""
        from aecf_tpu import ops

        E, M, B = 32, 3, 8
        params = init_attention_pool_params(jax.random.key(0), E)
        query = init_fusion_query(jax.random.key(1), E)
        kv = jax.random.normal(jax.random.key(2), (B, M, E))

        def loss(p, x, grad_kv):
            o, _, _, _ = ops.fusion_pool(
                p, query, x, implementation="xla", kv_grad=grad_kv
            )
            return (o * o).mean()

        gp_full, gkv_full = jax.grad(loss, argnums=(0, 1))(params, kv, True)
        gp_slim, gkv_slim = jax.grad(loss, argnums=(0, 1))(params, kv, False)
        assert float(jnp.abs(gkv_slim).max()) == 0.0
        assert float(jnp.abs(gkv_full).max()) > 0.0
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-6
            ),
            gp_full,
            gp_slim,
        )


def test_pick_tile_env_validation(monkeypatch):
    """AECF_FWD_TB/AECF_BWD_TB misuse must fail loudly naming the variable,
    not ZeroDivisionError in the grid computation (round-2 advisor)."""
    from aecf_tpu.kernels.shared_query import _pick_tile

    monkeypatch.setenv("AECF_FWD_TB", "0")
    with pytest.raises(ValueError, match="AECF_FWD_TB"):
        _pick_tile(512, "AECF_FWD_TB", 1024)
    monkeypatch.setenv("AECF_FWD_TB", "banana")
    with pytest.raises(ValueError, match="AECF_FWD_TB"):
        _pick_tile(512, "AECF_FWD_TB", 1024)
    monkeypatch.setenv("AECF_FWD_TB", "256")
    assert _pick_tile(512, "AECF_FWD_TB", 1024) == 256
    # overrides are honored VERBATIM: the H>2 rescale and the VMEM clamp
    # apply only to defaults, or sweeps would record tiles they never ran
    assert _pick_tile(512, "AECF_FWD_TB", 1024, num_heads=8) == 256
    assert _pick_tile(
        512, "AECF_FWD_TB", 1024, row_bytes=1 << 20
    ) == 256
    monkeypatch.setenv("AECF_FWD_TB", "8")
    assert _pick_tile(512, "AECF_FWD_TB", 1024, num_heads=4) == 8
    monkeypatch.delenv("AECF_FWD_TB")
    assert _pick_tile(512, "AECF_FWD_TB", 1024) == 512
    # defaults DO get the per-head rescale
    assert _pick_tile(512, "AECF_FWD_TB", 1024, num_heads=8) == 128


def test_pick_tile_vmem_clamp(monkeypatch):
    """Streamed launch sites pass row_bytes so the batch tile shrinks to
    fit scoped vmem at the E cap — the 1/E default formulas floor at 32
    rows, which overflows the 16MB budget at E=8192 when the d_kv tile is
    also resident (round-4 review #3)."""
    from aecf_tpu.kernels.shared_query import (
        _VMEM_ROW_BUDGET,
        _pick_tile,
    )

    monkeypatch.delenv("AECF_BWD_TB", raising=False)
    B, M = 1 << 16, 4
    for E, H, want_dkv in [
        (8192, 1, True), (8192, 2, True), (8192, 2, False),
        (4096, 1, True), (2048, 2, True),
    ]:
        row = E * (4 * M * (2 if want_dkv else 1) + 4 * H)
        default = max(
            32, (1 << 18) // (E * (H if not want_dkv else 2 * H)) // 8 * 8
        )
        tb = _pick_tile(default, "AECF_BWD_TB", B, row_bytes=row)
        assert tb * row <= _VMEM_ROW_BUDGET, (E, H, want_dkv, tb)
        assert tb >= 8 and tb % 8 == 0
    # benched shapes keep their measured defaults (clamp only ever lowers)
    assert _pick_tile(
        64, "AECF_BWD_TB", B, row_bytes=2048 * (4 * 3 * 2 + 4)
    ) == 64
    assert _pick_tile(
        128, "AECF_FWD_TB", B, row_bytes=2048 * (4 * 4 + 4)
    ) == 128
    # env override is NOT clamped — sweeps probe the limit on purpose
    monkeypatch.setenv("AECF_BWD_TB", "256")
    assert _pick_tile(
        32, "AECF_BWD_TB", B, row_bytes=8192 * (4 * 4 * 2 + 4)
    ) == 256


def test_kv_scales_with_float_kv_raises():
    """Scales without int8 kv must be loud, not silently unquantized."""
    from aecf_tpu.core.init import (
        init_attention_pool_params,
        init_fusion_query,
    )
    from aecf_tpu.kernels import fused_fusion_pool_shared

    E, M, B = 64, 3, 8
    params = init_attention_pool_params(jax.random.key(0), E)
    query = init_fusion_query(jax.random.key(1), E)
    kv = jax.random.normal(jax.random.key(2), (B, M, E))
    with pytest.raises(ValueError, match="int8"):
        fused_fusion_pool_shared(
            params, query, kv, kv_scales=jnp.ones((B, M)),
            training=False, interpret=True,
        )


class TestQ8TrainingInterpret:
    """int8-feature TRAINING path (round 4): the q8 custom_vjp flows
    gradients to params and the query while re-reading kv as int8.
    Oracle = the f32 kernel path on the DEQUANTIZED features with
    kv_grad=False — quantization lives in the data, so the grads must
    match to f32 tolerance, not quant tolerance."""

    def _setup(self, E, M=3, B=16):
        from aecf_tpu.kernels import quantize_features

        params = init_attention_pool_params(jax.random.key(0), E)
        query = init_fusion_query(jax.random.key(1), E)
        kv = jax.random.normal(jax.random.key(2), (B, M, E))
        q8, scales = quantize_features(kv)
        deq = q8.astype(jnp.float32) * scales[..., None]
        return params, query, q8, scales, deq

    @pytest.mark.parametrize(
        "E,H",
        [
            (64, 1),     # resident H=1  -> quantized _bwd_pallas
            (64, 2),     # resident H=2  -> XLA dequant fallback
            (64, 4),     # resident H=4  -> XLA dequant fallback
            (2048, 1),   # streamed H=1  -> quantized _bwd_kernel_streamed
            (2048, 2),   # streamed H=2  -> quantized _bwd_kernel_streamed_mh
        ],
    )
    def test_q8_grads_match_dequant_oracle(self, E, H):
        from aecf_tpu.kernels import fused_fusion_pool_shared

        B = 8 if E > 1024 else 16
        params, query, q8, scales, deq = self._setup(E, B=B)

        def loss_q(p, qq):
            out, w, _, info = fused_fusion_pool_shared(
                p, qq, q8, kv_scales=scales, num_heads=H,
                training=False, precision="highest", interpret=True,
            )
            # entropy term exercises the eval-entropy cotangent fold on
            # the q8 path too (reference AECFLayer.py:150-156 semantics)
            return (
                jnp.sum(out**2) + jnp.sum(w) + 0.1 * jnp.sum(info["entropy"])
            )

        def loss_o(p, qq):
            out, w, _, info = fused_fusion_pool_shared(
                p, qq, jax.lax.stop_gradient(deq), num_heads=H,
                training=False, precision="highest", interpret=True,
                kv_grad=False,
            )
            return (
                jnp.sum(out**2) + jnp.sum(w) + 0.1 * jnp.sum(info["entropy"])
            )

        gq = jax.grad(loss_q, argnums=(0, 1))(params, query)
        go = jax.grad(loss_o, argnums=(0, 1))(params, query)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5
            ),
            gq,
            go,
        )

    def test_q8_forced_xla_backward_matches(self, monkeypatch):
        """AECF_SHARED_BWD=xla A/B override reaches the q8 path too: the
        XLA-dequant backward must equal the quantized Pallas backward."""
        from aecf_tpu.kernels import fused_fusion_pool_shared

        params, query, q8, scales, _ = self._setup(64)

        def loss(p, qq):
            out, w, _, _ = fused_fusion_pool_shared(
                p, qq, q8, kv_scales=scales, training=False,
                precision="highest", interpret=True,
            )
            return jnp.sum(out**2) + jnp.sum(w)

        g_pallas = jax.grad(loss, argnums=(0, 1))(params, query)
        monkeypatch.setenv("AECF_SHARED_BWD", "xla")
        g_xla = jax.grad(loss, argnums=(0, 1))(params, query)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5
            ),
            g_pallas,
            g_xla,
        )

    def test_ops_fusion_pool_q8_validation_and_xla_path(self):
        """Op-level int8: misuse is loud on every backend, and the XLA
        fallback dequantizes (grads flow to params, output near-oracle)."""
        from aecf_tpu import ops
        from aecf_tpu.kernels import quantize_features

        E, M, B = 32, 3, 8
        params = init_attention_pool_params(jax.random.key(0), E)
        query = init_fusion_query(jax.random.key(1), E)
        kv = jax.random.normal(jax.random.key(2), (B, M, E))
        q8, scales = quantize_features(kv)

        with pytest.raises(ValueError, match="kv_scales"):
            ops.fusion_pool(params, query, q8, implementation="xla")
        with pytest.raises(ValueError, match="int8"):
            ops.fusion_pool(
                params, query, kv, kv_scales=scales, implementation="xla"
            )

        def loss(p):
            out, _, _, _ = ops.fusion_pool(
                p, query, q8, kv_scales=scales, implementation="xla",
                precision="highest",
            )
            return jnp.sum(out**2)

        g = jax.grad(loss)(params)
        assert float(jnp.abs(g.in_proj_weight).max()) > 0.0
        out_q8, _, _, _ = ops.fusion_pool(
            params, query, q8, kv_scales=scales, implementation="xla",
            precision="highest",
        )
        out_f32, _, _, _ = ops.fusion_pool(
            params, query, kv, implementation="xla", precision="highest"
        )
        assert float(jnp.abs(out_q8 - out_f32).max()) < 0.1

    def test_q8_descent(self):
        """A few SGD steps on the q8 kernel path must reduce the loss —
        the end-to-end 'can you actually train on int8 features' check."""
        from aecf_tpu.kernels import fused_fusion_pool_shared

        params, query, q8, scales, _ = self._setup(64)

        def loss(p, qq):
            out, w, _, _ = fused_fusion_pool_shared(
                p, qq, q8, kv_scales=scales, training=False,
                precision="highest", interpret=True,
            )
            return jnp.mean(out**2)

        l0 = float(loss(params, query))
        p, q = params, query
        for _ in range(5):
            gp, gq = jax.grad(loss, argnums=(0, 1))(p, q)
            p = jax.tree.map(lambda a, b: a - 0.1 * b, p, gp)
            q = q - 0.1 * gq
        assert float(loss(p, q)) < l0


def test_stream_mix_bf16_knob(monkeypatch):
    """bf16 mix/d_mix round-trips (the DEFAULT at precision='default';
    AECF_STREAM_MIX=f32 forces them off): gradients must stay within
    bf16 tolerance of the f32 round-trip."""
    import numpy as np

    from aecf_tpu.core.init import (
        init_attention_pool_params,
        init_fusion_query,
    )
    from aecf_tpu.kernels import fused_fusion_pool_shared

    E, M, B = 2048, 3, 32
    params = init_attention_pool_params(jax.random.key(0), E)
    query = init_fusion_query(jax.random.key(1), E)
    kv = jax.random.normal(jax.random.key(2), (B, M, E))

    def loss(p, q):
        out, _w, _mw, _info = fused_fusion_pool_shared(
            p, q, kv, num_heads=1, training=False, interpret=True,
            precision="default",
        )
        return (out * out).mean()

    monkeypatch.setenv("AECF_STREAM_MIX", "f32")
    g0 = jax.grad(loss, argnums=(0, 1))(params, query)
    monkeypatch.setenv("AECF_STREAM_MIX", "bf16")
    g1 = jax.grad(loss, argnums=(0, 1))(params, query)
    for a, b in zip(
        jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)
    ):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(a).max(), 1e-12)
        np.testing.assert_allclose(a / scale, b / scale, atol=2e-2)
