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


