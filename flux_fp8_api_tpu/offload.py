"""Streamed (double-buffered) CPU-offload denoise.

The reference's 24GB offload plan moves the flow model incrementally — block by
block as compute reaches it (``float8_quantize.py:427-446``, per-stage moves at
``flux_pipeline.py:624-656``). The first TPU port round-tripped the entire 12GB
flow tree in one ``device_put`` per generate, fully serializing transfer and
compute. This module is the TPU-native version of the reference's idea:

- top-level params (embedders, final layer — a few MB) stay resident on device;
- the depth-stacked double/single blocks live on the host, pre-split into
  per-block slices (~200MB each);
- a host loop dispatches one jitted apply per block, always issuing the
  ``device_put`` for block *i+1* (wrapping across steps) before the compute of
  block *i* — JAX dispatch is asynchronous, so the host→HBM copy of the next
  slice runs while the chip computes the current one. Peak HBM for flow weights
  is two block slices instead of 12GB, and at PCIe-class link rates the
  transfer time hides behind compute.

The per-block jits (one for double blocks, one for singles) compile once each —
every block shares shapes — so the structure costs depth-many dispatches per
step, not depth-many compiles.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp

from .models.flux import (
    FluxStatic,
    _double_block,
    _mlp_embedder,
    _single_block,
    _Tape,
    embed_nd_cos_sin,
    layer_norm,
    modulate,
    silu,
    timestep_embedding,
)


def make_stream_fns(cfg: FluxStatic) -> Dict[str, Any]:
    """The four jitted pieces of one streamed denoise step. ``cfg`` is closed over
    (hashable static); every fn is shape-polymorphic only through recompilation,
    exactly like the fused-scan serving path's buckets."""
    dtype = cfg.dtype

    @jax.jit
    def pre(tops, img, img_ids, txt, txt_ids, t_vec, y, g_vec):
        """Embedders + rope tables: everything before the block stacks."""
        tape = _Tape(False)
        img_e = tape.lin("img_in", tops["img_in"], img.astype(dtype), dtype)
        vec = _mlp_embedder(
            tape, "time_in", tops["time_in"],
            timestep_embedding(t_vec, 256).astype(dtype), dtype,
        )
        if cfg.guidance_embed:
            vec = vec + _mlp_embedder(
                tape, "guidance_in", tops["guidance_in"],
                timestep_embedding(g_vec, 256).astype(dtype), dtype,
            )
        vec = vec + _mlp_embedder(tape, "vector_in", tops["vector_in"], y.astype(dtype), dtype)
        txt_e = tape.lin("txt_in", tops["txt_in"], txt.astype(dtype), dtype)
        ids = jnp.concatenate([txt_ids, img_ids], axis=1)
        cos, sin = embed_nd_cos_sin(ids, cfg.axes_dim, cfg.theta)
        return img_e, txt_e, silu(vec), cos[:, :, None, :], sin[:, :, None, :]

    @jax.jit
    def double(blk, img_e, txt_e, vec_silu, cos, sin):
        return _double_block(cfg, blk, img_e, txt_e, vec_silu, cos, sin, _Tape(False))

    @jax.jit
    def single(blk, x, vec_silu, cos, sin):
        return _single_block(cfg, blk, x, vec_silu, cos, sin, _Tape(False))

    @jax.jit
    def final(tops, x, vec_silu, img_prev, t_curr, t_prev):
        """Final adaLN projection + the Euler update for this step."""
        tape = _Tape(False)
        fl = tops["final_layer"]
        img_tok = x[:, x.shape[1] - img_prev.shape[1] :]
        mod = tape.lin("final_layer.adaln", fl["adaln"], vec_silu, dtype)
        f_shift, f_scale = jnp.split(mod[:, None, :], 2, axis=-1)
        img_tok = modulate(layer_norm(img_tok), f_shift, f_scale)
        pred = tape.lin("final_layer.linear", fl["linear"], img_tok, dtype)
        return img_prev + (t_prev - t_curr).astype(img_prev.dtype) * pred

    return {"pre": pre, "double": double, "single": single, "final": final}


def split_flow_params(params: Dict[str, Any]):
    """Host flow tree → (tops, per-double-block slices, per-single-block slices).

    The slices are plain per-block pytrees (depth axis stripped), each one
    ``device_put``-able independently; ``None`` leaves (e.g. a schnell tree's
    ``guidance_in``) pass through as empty subtrees."""
    tops = {k: v for k, v in params.items() if k not in ("double_blocks", "single_blocks")}

    def slices(stack) -> List:
        depth = jax.tree.leaves(stack)[0].shape[0]
        return [jax.tree.map(lambda x: x[i], stack) for i in range(depth)]

    return tops, slices(params["double_blocks"]), slices(params["single_blocks"])


def streamed_denoise(
    fns: Dict[str, Any],
    tops_dev,
    dbl_slices: List,
    sgl_slices: List,
    device,
    img: jnp.ndarray,
    img_ids: jnp.ndarray,
    txt: jnp.ndarray,
    txt_ids: jnp.ndarray,
    y: jnp.ndarray,
    timesteps,
    guidance: float,
    cfg: FluxStatic,
    progress: bool = False,
) -> jnp.ndarray:
    """Run the full denoise loop with per-block double-buffered weight streaming.

    Matches :func:`..sampling._denoise_scan` numerically (same ops, different jit
    boundaries — float reassociation only; tests pin the closeness)."""
    b = img.shape[0]
    g_vec = (
        jnp.full((b,), guidance, jnp.float32) if cfg.guidance_embed else None
    )
    ts = jnp.asarray(timesteps, jnp.float32)
    pairs = list(zip(ts[:-1], ts[1:]))
    slices = dbl_slices + sgl_slices
    n = len(slices)
    n_dbl = len(dbl_slices)

    def put(i):
        return jax.device_put(slices[i], device)

    steps = pairs
    if progress:
        try:
            from tqdm import tqdm

            steps = tqdm(pairs, desc="denoise (streamed offload)")
        except ImportError:
            pass

    buf = put(0)
    for step_idx, (t_curr, t_prev) in enumerate(steps):
        t_vec = jnp.full((b,), t_curr, jnp.float32)
        img_e, txt_e, vec_silu, cos, sin = fns["pre"](
            tops_dev, img, img_ids, txt, txt_ids, t_vec, y, g_vec
        )
        x = None
        last_step = step_idx == len(pairs) - 1
        for j in range(n):
            cur = buf
            # prefetch the next slice (wrapping into the next step) BEFORE
            # dispatching this block's compute commits the host thread — both
            # dispatches are async, so the copy overlaps the matmuls
            if not (last_step and j == n - 1):
                buf = put((j + 1) % n)
            if j < n_dbl:
                img_e, txt_e = fns["double"](cur, img_e, txt_e, vec_silu, cos, sin)
                if j == n_dbl - 1:
                    x = jnp.concatenate([txt_e, img_e], axis=1)
            else:
                x = fns["single"](cur, x, vec_silu, cos, sin)
        img = fns["final"](tops_dev, x, vec_silu, img, t_curr, t_prev)
    return img
