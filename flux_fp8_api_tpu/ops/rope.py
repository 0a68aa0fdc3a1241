"""Multi-axis rotary position embeddings for the FLUX DiT.

TPU-native re-design of the reference's rope (``modules/flux_model.py:49-92``). The
reference materializes (seq, dim/2, 2, 2) rotation matrices and rotates *interleaved*
channel pairs (x[2k], x[2k+1]) — on TPU that means strided access along the 128-lane
axis (cross-lane shuffles every pair). Instead we rotate **half-split** pairs
(x[k], x[k + d/2]) with full-width vector ops:

    out = x ⊙ [cos; cos] + rotate_half(x) ⊙ [sin; sin],
    rotate_half(x) = concat(−x[d/2:], x[:d/2])

Equivalence: a per-pair 2D rotation is an orthogonal transform; attention consumes q/k
only through inner products q·k, which are invariant to *which* fixed pairing the
channels use as long as q and k share it and pair j uses the same angle ωⱼ. The
half-split pairing uses exactly the reference's angle set per axis, so attention
outputs are identical (up to float reassociation) while every op stays unstrided.

Tables are fp32, built once per (resolution, txt_len) bucket; per axis i the
frequencies are ``1 / theta**(arange(0, axes_dim[i], 2) / axes_dim[i])`` and axes
concatenate along the feature dimension — matching EmbedND (flux_model.py:68-92).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp


def deinterleave_permutation(head_dim: int):
    """Channel permutation mapping the reference's interleaved rope pairs onto the
    half-split layout: channel 2j → j, channel 2j+1 → j + head_dim/2.

    Applied once at checkpoint load to the q/k output channels of every qkv kernel
    (+ biases and qk-norm scales). With both q and k permuted identically, attention
    scores equal the interleaved reference's, and v/proj are untouched, so model
    outputs are unchanged — the permutation just buys unstrided rope at runtime.
    """
    import numpy as np

    perm = np.empty(head_dim, dtype=np.int64)
    half = head_dim // 2
    perm[np.arange(half)] = np.arange(0, head_dim, 2)  # new ch j ← old 2j
    perm[np.arange(half, head_dim)] = np.arange(1, head_dim, 2)  # new j+half ← old 2j+1
    return perm


def rope_cos_sin(pos: jnp.ndarray, dim: int, theta: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """cos/sin tables for one position axis (reference ``rope``, flux_model.py:49-57).

    Args:
      pos: (..., n) positions (computed in fp32).
      dim: even number of channels this axis covers.
    Returns:
      (cos, sin), each (..., n, dim // 2) fp32 — one angle per rotation pair.
    """
    assert dim % 2 == 0, f"rope dim must be even, got {dim}"
    scale = jnp.arange(0, dim, 2, dtype=jnp.float32) / dim
    omega = 1.0 / (theta**scale)
    out = pos.astype(jnp.float32)[..., None] * omega  # (..., n, dim/2)
    return jnp.cos(out), jnp.sin(out)


def embed_nd_cos_sin(
    ids: jnp.ndarray, axes_dim: Sequence[int], theta: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Concatenated multi-axis rope tables in half-split layout.

    Args:
      ids: (..., n, n_axes) positions — FLUX uses 3 axes with dims (16, 56, 56).
    Returns:
      (cos, sin), each (..., n, sum(axes_dim)) fp32 — full head_dim width: for each
      axis the per-pair angles appear twice (once per half), laid out so that
      :func:`apply_rope`'s global half-split pairing rotates pair (k, k + D/2) with
      the angle the reference's interleaved pairing gives pair k.
    """
    n_axes = ids.shape[-1]
    assert n_axes == len(axes_dim)
    cos_parts, sin_parts = [], []
    for i in range(n_axes):
        c, s = rope_cos_sin(ids[..., i], axes_dim[i], theta)
        cos_parts.append(c)
        sin_parts.append(s)
    # first-half angles for all axes, then the duplicate half
    cos_half = jnp.concatenate(cos_parts, axis=-1)
    sin_half = jnp.concatenate(sin_parts, axis=-1)
    return (
        jnp.concatenate([cos_half, cos_half], axis=-1),
        jnp.concatenate([sin_half, sin_half], axis=-1),
    )


def apply_rope(
    xq: jnp.ndarray,
    xk: jnp.ndarray,
    cos: jnp.ndarray,
    sin: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Rotate q/k by half-split pairs: out = x·cos + rotate_half(x)·sin.

    Args:
      xq, xk: (..., seq, head_dim), head_dim even.
      cos, sin: broadcastable to (..., seq, head_dim) (full width, duplicated halves).

    Attention scores match the reference's interleaved apply_rope
    (flux_model.py:60-65) exactly — see module docstring for why the pairing is free.
    """

    def rot(x):
        orig_dtype = x.dtype
        x = x.astype(jnp.float32)
        half = x.shape[-1] // 2
        rotated = jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)
        return (x * cos + rotated * sin).astype(orig_dtype)

    return rot(xq), rot(xk)
