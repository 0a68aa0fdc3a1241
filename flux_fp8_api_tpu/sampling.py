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

import dataclasses
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from .models.flux import FluxStatic, flux_apply, flux_cache_indicator


@dataclasses.dataclass(frozen=True)
class CacheConfig:
    """Opt-in timestep residual cache for the fused denoise scan (a TPU-side speedup
    the reference does not have — its loop always runs the full model,
    flux_pipeline.py:628-651).

    Consecutive flow-matching steps produce highly correlated velocity predictions;
    skipped steps reuse the previous model output (``img += dt · cached_pred``) and a
    ``lax.cond`` keeps the full model out of the executed path (XLA conditionals run
    only the taken branch on TPU). Two policies:

    - ``mode="interval"`` (FORA-style): recompute every ``interval``-th step.
    - ``mode="dynamic"`` (TeaCache-style): recompute when the accumulated relative L1
      drift of the block-0 modulated input (models/flux.py flux_cache_indicator)
      exceeds ``threshold`` since the last eval. ``coefficients`` optionally rescales
      the per-step drift with a polynomial (jnp.polyval order — highest degree first);
      TeaCache publishes fitted coefficients for FLUX real weights.

    ``order`` picks what a skipped step uses (orthogonal to the skip policy):
    0 reuses the last evaluated velocity verbatim; 1 (TaylorSeer-style) linearly
    extrapolates it in t from the finite difference of the last two evals —
    ``v(t) ≈ v(t_k) + (t - t_k) · (v(t_k) - v(t_{k-1})) / (t_k - t_{k-1})`` — one
    extra latent-sized axpy per skipped step for strictly more signal (exact when
    the velocity is linear in t, which flow-matching trajectories approach away
    from the schedule ends).

    ``warmup`` first steps and ``tail`` last steps always evaluate (the ends of the
    schedule move fastest and set composition/detail). Fidelity is measured against
    the uncached same-tier output — see docs/PERF.md step-cache table.
    """

    mode: str = "none"  # "none" | "interval" | "dynamic"
    interval: int = 2
    threshold: float = 0.25
    warmup: int = 2
    tail: int = 1
    order: int = 0  # 0 = reuse last eval; 1 = linear extrapolation in t
    coefficients: Optional[Tuple[float, ...]] = None

    def __post_init__(self):
        if self.mode not in ("none", "interval", "dynamic"):
            raise ValueError(f"cache mode must be none|interval|dynamic, got {self.mode!r}")
        if self.interval < 1:
            raise ValueError(f"cache interval must be >= 1, got {self.interval}")
        if self.warmup < 1:
            raise ValueError(f"cache warmup must be >= 1 (step 0 has nothing cached), got {self.warmup}")
        if self.tail < 0 or self.threshold < 0:
            raise ValueError("cache tail and threshold must be >= 0")
        if self.order not in (0, 1):
            raise ValueError(f"cache order must be 0 or 1, got {self.order}")

    @classmethod
    def parse(cls, spec) -> "CacheConfig":
        """Coerce None | CacheConfig | dict (HTTP request body) to a CacheConfig."""
        if spec is None:
            return cls(mode="none")
        if isinstance(spec, cls):
            return spec
        if isinstance(spec, dict):
            known = {f.name for f in dataclasses.fields(cls)}
            bad = set(spec) - known
            if bad:
                raise ValueError(f"unknown cache option(s): {sorted(bad)}")
            spec = dict(spec)
            if "coefficients" in spec and spec["coefficients"] is not None:
                spec["coefficients"] = tuple(float(c) for c in spec["coefficients"])
            for k in ("interval", "warmup", "tail", "order"):
                if k in spec:
                    spec[k] = int(spec[k])
            if "threshold" in spec:
                spec["threshold"] = float(spec["threshold"])
            return cls(**spec)
        raise TypeError(f"cache must be None, CacheConfig or dict, got {type(spec)}")


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


@partial(jax.jit, static_argnames=("cfg", "cache"), donate_argnames=("img",))
def _denoise_scan_cached(
    params, cfg: FluxStatic, cache: CacheConfig, img, img_ids, txt, txt_ids, vec, timesteps, guidance
):
    """Euler scan with the step cache: each step either evaluates the model (and
    refreshes the cached velocity) or reuses it, decided on-device inside the scan so
    the whole loop stays one jit. Returns ``(img, n_evals)`` — the number of real
    model evaluations (int32 device scalar) for the it/s-equivalent metric."""
    b = img.shape[0]
    g_vec = jnp.full((b,), guidance, cfg.dtype) if cfg.guidance_embed else None
    pairs = jnp.stack([timesteps[:-1], timesteps[1:]], axis=1)  # (T, 2)
    n_steps = pairs.shape[0]

    def model(img, t_curr):
        t_vec = jnp.full((b,), t_curr, cfg.dtype)
        return flux_apply(params, cfg, img, img_ids, txt, txt_ids, t_vec, vec, g_vec)

    dynamic = cache.mode == "dynamic"
    first_order = cache.order == 1

    def body(carry, x):
        if first_order:
            # order=1 carries the last TWO evaluated velocities (f32 — the finite
            # difference of two close bf16 velocities would lose most of its bits)
            # plus their timesteps and an eval counter (the slope is only valid
            # once two evals exist).
            img, prev_ind, accum, cached_pred, prev_pred, t_last, t_prev_last, k_evals, n_evals = carry
        else:
            img, prev_ind, accum, cached_pred, n_evals = carry
        pair, i = x
        t_curr, t_prev = pair[0], pair[1]
        forced = (i < cache.warmup) | (i >= n_steps - cache.tail)
        if dynamic:
            t_vec = jnp.full((b,), t_curr, cfg.dtype)
            ind = flux_cache_indicator(params, cfg, img, t_vec, vec, g_vec).astype(
                jnp.float32
            )
            rel = jnp.mean(jnp.abs(ind - prev_ind)) / (
                jnp.mean(jnp.abs(prev_ind)) + 1e-8
            )
            if cache.coefficients is not None:
                rel = jnp.polyval(jnp.asarray(cache.coefficients, jnp.float32), rel)
            accum = accum + jnp.abs(rel)
            recompute = forced | (accum >= cache.threshold)
        else:
            ind = prev_ind
            recompute = forced | (jnp.mod(i, cache.interval) == 0)

        if first_order:
            def _eval(img):
                new = model(img, t_curr).astype(jnp.float32)
                return (new, jnp.zeros_like(accum), new, cached_pred, t_curr,
                        t_last, k_evals + 1)

            def _skip(img):
                denom = jnp.where(k_evals >= 2, t_last - t_prev_last, 1.0)
                slope = jnp.where(
                    k_evals >= 2, (cached_pred - prev_pred) / denom,
                    jnp.zeros_like(cached_pred),
                )
                pred = cached_pred + (t_curr - t_last) * slope
                return pred, accum, cached_pred, prev_pred, t_last, t_prev_last, k_evals

            pred, accum, cached_pred, prev_pred, t_last, t_prev_last, k_evals = (
                jax.lax.cond(recompute, _eval, _skip, img)
            )
            img = img + (t_prev - t_curr).astype(img.dtype) * pred.astype(img.dtype)
            carry = (img, ind, accum, cached_pred, prev_pred, t_last, t_prev_last,
                     k_evals, n_evals + recompute.astype(jnp.int32))
            return carry, None

        pred, accum = jax.lax.cond(
            recompute,
            lambda img: (model(img, t_curr), jnp.zeros_like(accum)),
            lambda img: (cached_pred, accum),
            img,
        )
        img = img + (t_prev - t_curr).astype(img.dtype) * pred
        return (img, ind, accum, pred, n_evals + recompute.astype(jnp.int32)), None

    ind0 = (
        jnp.zeros((b, img.shape[1], cfg.hidden_size), jnp.float32)
        if dynamic
        else jnp.zeros(())
    )
    if first_order:
        zero_v = jnp.zeros(img.shape, jnp.float32)
        carry0 = (
            img, ind0, jnp.zeros((), jnp.float32), zero_v, zero_v,
            jnp.zeros((), jnp.float32), jnp.zeros((), jnp.float32),
            jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32),
        )
        (img, *_, n_evals), _ = jax.lax.scan(body, carry0, (pairs, jnp.arange(n_steps)))
        return img, n_evals
    carry0 = (img, ind0, jnp.zeros((), jnp.float32), jnp.zeros_like(img), jnp.zeros((), jnp.int32))
    (img, _, _, _, n_evals), _ = jax.lax.scan(body, carry0, (pairs, jnp.arange(n_steps)))
    return img, n_evals


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
    cache: Optional[CacheConfig] = None,
    stats: Optional[Dict[str, Any]] = None,
) -> jnp.ndarray:
    """Run the full denoise loop. ``fused=True`` uses the scan kernel; otherwise a host
    loop over the per-step jit with an optional tqdm bar (the reference's it/s metric,
    flux_pipeline.py:628-630). ``stack_runner`` plugs a block-stack strategy into
    ``flux_apply`` (e.g. :func:`~.parallel.pp.make_pp_runner` for pp serving).

    ``cache`` (a :class:`CacheConfig` with mode != "none") turns on the timestep
    residual cache — fused-scan only (the skip decision lives on device; a host loop
    would pay a ~32ms tunnel fetch per step), incompatible with a ``stack_runner``
    (collectives inside the skip conditional). When active, ``stats`` (if given)
    receives ``stats["model_evals"]`` as an int32 device scalar."""
    if cache is not None and cache.mode != "none":
        if not fused:
            raise ValueError("the step cache requires the fused scan (fused=True)")
        if stack_runner is not None:
            raise ValueError("the step cache requires the default scan runner")
        img, n_evals = _denoise_scan_cached(
            params, cfg, cache, img, img_ids, txt, txt_ids, vec,
            jnp.asarray(timesteps, jnp.float32), jnp.asarray(guidance, jnp.float32),
        )
        if stats is not None:
            stats["model_evals"] = n_evals
        return img
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
