"""Torch-checkpoint interop: reference ``state_dict`` ↔ ``AttentionPoolParams``.

The reference persists plain ``torch.save(model.state_dict())`` blobs
(reference xrays/train_xrays_example.py:766-772); the pool's parameters live
under ``<prefix>attention.in_proj_weight`` / ``attention.in_proj_bias`` /
``attention.out_proj.weight`` / ``attention.out_proj.bias`` (the packed
``nn.MultiheadAttention`` layout, reference aecf/AECFLayer.py:399-407), plus
a ``curriculum_masking._eps`` buffer that carries no information (fixed
1e-8).  ``AttentionPoolParams`` deliberately mirrors that packed layout
(aecf_tpu/core/attention.py), so conversion is pure relabeling — numpy-level,
no torch dependency at runtime.

Typical use (unpickling the ``.pth`` itself needs torch, one time)::

    sd = torch.load("aecf_model.pth", map_location="cpu")
    np_sd = {k: v.numpy() for k, v in sd.items()}
    params = attention_pool_params_from_state_dict(np_sd, prefix="fusion_pool.")
    query = fusion_query_from_state_dict(np_sd, key="fusion_query")

The reverse direction (:func:`attention_pool_state_dict`) emits numpy arrays
under the same keys so a torch user can ``load_state_dict`` our weights.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Optional

import jax.numpy as jnp
import numpy as np

from ..core.attention import AttentionPoolParams

__all__ = [
    "attention_pool_params_from_state_dict",
    "fusion_query_from_state_dict",
    "attention_pool_state_dict",
]


def _get(sd: Mapping[str, Any], key: str) -> np.ndarray:
    if key not in sd:
        present = ", ".join(sorted(sd)[:20])
        raise KeyError(
            f"state_dict has no entry {key!r}; present keys include: {present}"
        )
    return np.asarray(sd[key])


def attention_pool_params_from_state_dict(
    state_dict: Mapping[str, Any],
    *,
    prefix: str = "",
    dtype: Optional[jnp.dtype] = None,
) -> AttentionPoolParams:
    """Build ``AttentionPoolParams`` from a reference torch ``state_dict``.

    ``prefix`` addresses the pool inside a larger model's flat key space —
    e.g. ``prefix="fusion_pool."`` reads
    ``fusion_pool.attention.in_proj_weight`` etc.  Values may be numpy
    arrays, anything ``np.asarray`` accepts (including CPU torch tensors),
    or 0-d entries loaded from ``.npz``.  Missing bias keys yield
    ``None`` bias slots (``bias=False`` pools).
    """
    p = f"{prefix}attention."
    w_in = _get(state_dict, f"{p}in_proj_weight")
    w_out = _get(state_dict, f"{p}out_proj.weight")
    E = w_out.shape[0]
    if w_in.shape != (3 * E, E):
        raise ValueError(
            f"in_proj_weight shape {w_in.shape} inconsistent with "
            f"out_proj.weight {w_out.shape}; expected ({3 * E}, {E})"
        )

    def maybe(key):
        return (
            np.asarray(state_dict[key]) if key in state_dict else None
        )

    b_in = maybe(f"{p}in_proj_bias")
    b_out = maybe(f"{p}out_proj.bias")
    # jnp.array, not jnp.asarray: asarray zero-copy ALIASES suitably aligned
    # host buffers on CPU jax, and tensor.detach().numpy() shares storage
    # with the live torch tensor — an aliased conversion would let a later
    # in-place torch update (optimizer.step) silently mutate these params
    # (regression: tests/test_torch_trajectory.py).
    cast = (lambda x: jnp.array(x, dtype)) if dtype else jnp.array
    return AttentionPoolParams(
        in_proj_weight=cast(w_in),
        out_proj_weight=cast(w_out),
        in_proj_bias=cast(b_in) if b_in is not None else None,
        out_proj_bias=cast(b_out) if b_out is not None else None,
    )


def fusion_query_from_state_dict(
    state_dict: Mapping[str, Any],
    *,
    key: str = "fusion_query",
    dtype: Optional[jnp.dtype] = None,
) -> jnp.ndarray:
    """Read a learnable fusion query parameter, normalized to ``(1, 1, E)``.

    The reference stores it as ``(1, 1, E)`` (create_fusion_pool,
    AECFLayer.py:714-716) or ``(1, 1, h)`` (xray AECFModel); 1-D/2-D
    variants are reshaped.
    """
    q = _get(state_dict, key)
    if q.ndim == 1:
        q = q[None, None, :]
    elif q.ndim == 2:
        q = q[None]
    if q.ndim != 3 or q.shape[:2] != (1, 1):
        raise ValueError(f"cannot interpret query of shape {q.shape}")
    # jnp.array (copying) — see attention_pool_params_from_state_dict.
    return jnp.array(q, dtype) if dtype else jnp.array(q)


def attention_pool_state_dict(
    params: AttentionPoolParams,
    *,
    prefix: str = "",
    query: Optional[jnp.ndarray] = None,
    query_key: str = "fusion_query",
    include_eps_buffer: bool = True,
) -> Dict[str, np.ndarray]:
    """Export params as a torch-layout ``state_dict`` of numpy arrays.

    A torch user can feed the result (tensorified) to
    ``MultimodalAttentionPool.load_state_dict``.  ``include_eps_buffer``
    emits the reference's ``curriculum_masking._eps`` registered buffer so
    ``load_state_dict(strict=True)`` succeeds on masking-enabled pools.
    """
    p = f"{prefix}attention."
    sd: Dict[str, np.ndarray] = {
        f"{p}in_proj_weight": np.asarray(params.in_proj_weight),
        f"{p}out_proj.weight": np.asarray(params.out_proj_weight),
    }
    if params.in_proj_bias is not None:
        sd[f"{p}in_proj_bias"] = np.asarray(params.in_proj_bias)
    if params.out_proj_bias is not None:
        sd[f"{p}out_proj.bias"] = np.asarray(params.out_proj_bias)
    if include_eps_buffer:
        sd[f"{prefix}curriculum_masking._eps"] = np.asarray(
            1e-8, dtype=np.float32
        )
    if query is not None:
        sd[query_key] = np.asarray(query)
    return sd
