"""Multi-axis rotary position embeddings for the FLUX DiT.

TPU-native re-design of the reference's rope (``modules/flux_model.py:49-92``): instead of
materializing (seq, dim/2, 2, 2) rotation matrices and doing gather-style elementwise
products, we precompute fp32 cos/sin tables of shape (seq, head_dim/2) once per
resolution bucket and apply the rotation as two fused multiplies on the (even, odd)
channel pairs — the form XLA fuses straight into the surrounding attention ops.

Semantics match the reference exactly: per axis i, frequencies are
``1 / theta**(arange(0, axes_dim[i], 2) / axes_dim[i])``, tables are concatenated over
axes along the feature dimension, and rotation operates on interleaved pairs
(x[2k], x[2k+1]).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp


def rope_cos_sin(pos: jnp.ndarray, dim: int, theta: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """cos/sin tables for one position axis (reference ``rope``, flux_model.py:49-57).

    Args:
      pos: (..., n) positions (any real dtype; computed in fp32).
      dim: even number of channels this axis covers.
    Returns:
      (cos, sin), each (..., n, dim // 2) fp32.
    """
    assert dim % 2 == 0, f"rope dim must be even, got {dim}"
    scale = jnp.arange(0, dim, 2, dtype=jnp.float32) / dim
    omega = 1.0 / (theta**scale)
    out = pos.astype(jnp.float32)[..., None] * omega  # (..., n, dim/2)
    return jnp.cos(out), jnp.sin(out)


def embed_nd_cos_sin(
    ids: jnp.ndarray, axes_dim: Sequence[int], theta: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Concatenated multi-axis rope tables (reference ``EmbedND``, flux_model.py:68-92).

    Args:
      ids: (..., n, n_axes) positions — FLUX uses 3 axes with dims (16, 56, 56).
    Returns:
      (cos, sin), each (..., n, sum(axes_dim) // 2) fp32. Unlike the reference (which
      casts the table to model dtype at flux_model.py:86), tables stay fp32; the rotation
      below runs in fp32 and casts back, which only improves fidelity.
    """
    n_axes = ids.shape[-1]
    assert n_axes == len(axes_dim)
    cos_parts, sin_parts = [], []
    for i in range(n_axes):
        c, s = rope_cos_sin(ids[..., i], axes_dim[i], theta)
        cos_parts.append(c)
        sin_parts.append(s)
    return jnp.concatenate(cos_parts, axis=-1), jnp.concatenate(sin_parts, axis=-1)


def apply_rope(
    xq: jnp.ndarray,
    xk: jnp.ndarray,
    cos: jnp.ndarray,
    sin: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Rotate q/k by the rope tables (reference ``apply_rope``, flux_model.py:60-65).

    Args:
      xq, xk: (..., seq, head_dim) with head_dim even; rotation pairs are interleaved
        channels (x[2k], x[2k+1]), matching the reference's reshape(..., -1, 1, 2).
      cos, sin: broadcastable to (..., seq, head_dim // 2).
    """

    def rot(x):
        orig_dtype = x.dtype
        x = x.astype(jnp.float32)
        even = x[..., 0::2]
        odd = x[..., 1::2]
        out_even = cos * even - sin * odd
        out_odd = sin * even + cos * odd
        return jnp.stack([out_even, out_odd], axis=-1).reshape(x.shape).astype(orig_dtype)

    return rot(xq), rot(xk)
