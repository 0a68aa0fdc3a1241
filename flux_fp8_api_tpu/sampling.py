"""Denoise-step construction: jitted Euler step and fused scan loop.

The reference's hot loop (flux_pipeline.py:628-651) calls 57 separately-compiled torch
blocks per step; here one ``jax.jit`` covers the full model forward + Euler update —
whole-step compilation is the TPU analog of ``compile_blocks``+``compile_extras``
(flux_pipeline.py:224-231). Two drive modes:

- :func:`make_denoise_step`: per-step jit, host loop (tqdm it/s like the reference);
- :func:`make_denoise_scan`: the whole T-step loop fused under one jit via ``lax.scan``
  with parameter-donation — the fastest serving mode (no per-step dispatch).

Compiled functions cache per (batch, seq, steps) — the resolution-bucket analog of
torch dynamo's per-shape recompiles (flux_pipeline.py:27-28).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict

import jax
import jax.numpy as jnp

from .models.flux import FluxStatic, flux_apply


@partial(jax.jit, static_argnames=("cfg", "stack_runner"))
def _denoise_step(params, cfg: FluxStatic, img, img_ids, txt, txt_ids, vec, t_curr, t_prev, guidance, stack_runner=None):
    """One Euler step: img += (t_prev - t_curr) · v(img, t_curr) (flux_pipeline.py:632-651)."""
    b = img.shape[0]
    t_vec = jnp.full((b,), t_curr, cfg.dtype)
    g_vec = jnp.full((b,), guidance, cfg.dtype) if cfg.guidance_embed else None
    pred = flux_apply(
        params, cfg, img, img_ids, txt, txt_ids, t_vec, vec, g_vec,
        stack_runner=stack_runner,
    )
    return img + (t_prev - t_curr).astype(img.dtype) * pred


@partial(jax.jit, static_argnames=("cfg",))
def _denoise_step_collect(params, cfg: FluxStatic, img, img_ids, txt, txt_ids, vec, t_curr, t_prev, guidance):
    """Euler step that also returns the per-layer input amaxes (calibration trials)."""
    b = img.shape[0]
    t_vec = jnp.full((b,), t_curr, cfg.dtype)
    g_vec = jnp.full((b,), guidance, cfg.dtype) if cfg.guidance_embed else None
    pred, amaxes = flux_apply(
        params, cfg, img, img_ids, txt, txt_ids, t_vec, vec, g_vec, collect_amax=True
    )
    return img + (t_prev - t_curr).astype(img.dtype) * pred, amaxes


def make_denoise_step(cfg: FluxStatic, collect_amax: bool = False, stack_runner=None):
    """Bind the static model config; returns step(params, img, …, t_curr, t_prev, guidance)."""
    if collect_amax:
        fn = _denoise_step_collect
        if stack_runner is not None:
            raise ValueError("collect_amax requires the default scan runner")

        def step(params, img, img_ids, txt, txt_ids, vec, t_curr, t_prev, guidance):
            return fn(
                params, cfg, img, img_ids, txt, txt_ids, vec,
                jnp.asarray(t_curr, jnp.float32), jnp.asarray(t_prev, jnp.float32),
                jnp.asarray(guidance, jnp.float32),
            )

        return step

    def step(params, img, img_ids, txt, txt_ids, vec, t_curr, t_prev, guidance):
        return _denoise_step(
            params, cfg, img, img_ids, txt, txt_ids, vec,
            jnp.asarray(t_curr, jnp.float32), jnp.asarray(t_prev, jnp.float32),
            jnp.asarray(guidance, jnp.float32),
            stack_runner=stack_runner,
        )

    return step


@partial(jax.jit, static_argnames=("cfg", "stack_runner"), donate_argnames=("img",))
def _denoise_scan(params, cfg: FluxStatic, img, img_ids, txt, txt_ids, vec, timesteps, guidance, stack_runner=None):
    """All steps fused: scan over (t_curr, t_prev) pairs; donated latent buffer."""
    b = img.shape[0]
    g_vec = jnp.full((b,), guidance, cfg.dtype) if cfg.guidance_embed else None
    pairs = jnp.stack([timesteps[:-1], timesteps[1:]], axis=1)  # (T, 2)

    def body(img, pair):
        t_curr, t_prev = pair[0], pair[1]
        t_vec = jnp.full((b,), t_curr, cfg.dtype)
        pred = flux_apply(
            params, cfg, img, img_ids, txt, txt_ids, t_vec, vec, g_vec,
            stack_runner=stack_runner,
        )
        return img + (t_prev - t_curr).astype(img.dtype) * pred, None

    img, _ = jax.lax.scan(body, img, pairs)
    return img


def denoise(
    params: Dict[str, Any],
    cfg: FluxStatic,
    img: jnp.ndarray,
    img_ids: jnp.ndarray,
    txt: jnp.ndarray,
    txt_ids: jnp.ndarray,
    vec: jnp.ndarray,
    timesteps,
    guidance: float,
    fused: bool = True,
    progress: bool = False,
    stack_runner=None,
) -> jnp.ndarray:
    """Run the full denoise loop. ``fused=True`` uses the scan kernel; otherwise a host
    loop over the per-step jit with an optional tqdm bar (the reference's it/s metric,
    flux_pipeline.py:628-630). ``stack_runner`` plugs a block-stack strategy into
    ``flux_apply`` (e.g. :func:`~.parallel.pp.make_pp_runner` for pp serving)."""
    if fused:
        return _denoise_scan(
            params, cfg, img, img_ids, txt, txt_ids, vec,
            jnp.asarray(timesteps, jnp.float32), jnp.asarray(guidance, jnp.float32),
            stack_runner=stack_runner,
        )
    step = make_denoise_step(cfg, stack_runner=stack_runner)
    iterator = zip(timesteps[:-1], timesteps[1:])
    if progress:
        from tqdm import tqdm

        iterator = tqdm(list(iterator))
    for t_curr, t_prev in iterator:
        img = step(params, img, img_ids, txt, txt_ids, vec, t_curr, t_prev, guidance)
    return img
