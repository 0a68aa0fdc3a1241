"""Latent 2×2 patchify/unpatchify and position-id grids.

Reference semantics:
- pack: ``flux_pipeline.py:268-278`` — (B, C, H, W) latents → (B, (H/2)(W/2), C*4)
  via 2×2 unfold, channel-major within each patch (c, ph, pw ordering).
- img_ids: ``flux_pipeline.py:280-292`` — (axis0=0, row, col) grid flattened row-major.
- unpack: ``flux_pipeline.py:440-448`` — the exact inverse rearrange.

TPU note: these run once per request outside the denoise loop; plain reshape/transpose
lowers to free layout changes under XLA, no kernel needed.
"""

from __future__ import annotations

import jax.numpy as jnp


def pack_latents(x: jnp.ndarray) -> jnp.ndarray:
    """(B, C, H, W) → (B, (H/2)*(W/2), C*4), patch channel order (c, ph, pw)."""
    b, c, h, w = x.shape
    assert h % 2 == 0 and w % 2 == 0, f"latent dims must be even, got {h}x{w}"
    x = x.reshape(b, c, h // 2, 2, w // 2, 2)
    x = x.transpose(0, 2, 4, 1, 3, 5)  # b, h/2, w/2, c, ph, pw
    return x.reshape(b, (h // 2) * (w // 2), c * 4)


def unpack_latents(x: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
    """(B, (h w), (c ph pw)) → (B, C, H, W) with h=ceil(height/16), w=ceil(width/16)
    (reference ``unpack``, flux_pipeline.py:440-448)."""
    b, seq, feat = x.shape
    h = -(-height // 16)
    w = -(-width // 16)
    c = feat // 4
    assert seq == h * w, f"sequence {seq} != {h}*{w}"
    x = x.reshape(b, h, w, c, 2, 2)
    x = x.transpose(0, 3, 1, 4, 2, 5)  # b, c, h, ph, w, pw
    return x.reshape(b, c, h * 2, w * 2)


def make_img_ids(h_latent: int, w_latent: int, batch: int) -> jnp.ndarray:
    """(B, (h/2)(w/2), 3) position ids: (0, row, col) (flux_pipeline.py:280-292)."""
    h2, w2 = h_latent // 2, w_latent // 2
    ids = jnp.zeros((h2, w2, 3), dtype=jnp.float32)
    ids = ids.at[..., 1].set(jnp.arange(h2, dtype=jnp.float32)[:, None])
    ids = ids.at[..., 2].set(jnp.arange(w2, dtype=jnp.float32)[None, :])
    ids = ids.reshape(1, h2 * w2, 3)
    return jnp.broadcast_to(ids, (batch, h2 * w2, 3))


def make_txt_ids(seq_len: int, batch: int) -> jnp.ndarray:
    """Zero text position ids (reference ``flux_emphasis.py:433-439``)."""
    return jnp.zeros((batch, seq_len, 3), dtype=jnp.float32)
