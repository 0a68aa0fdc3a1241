"""Flow-matching training step, sharded over a (dp, tp) mesh.

The reference is inference-only; this is the TPU-native framework's scaling extension:
a rectified-flow training objective (the one FLUX models are trained with — predict the
velocity (noise − data) at an interpolated latent) jitted over a Mesh so data-parallel
gradient all-reduces and tensor-parallel activation collectives ride ICI via GSPMD.

Used by ``__graft_entry__.dryrun_multichip`` to validate the multi-chip shardings
compile and execute.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict

import jax
import jax.numpy as jnp

from ..models.flux import FluxStatic, flux_apply
from ..ops.packing import make_img_ids, make_txt_ids


def sample_timesteps(key: jax.Array, batch: int, image_seq_len: int, t_sampling: str):
    """Draw per-example flow times t ∈ (0,1) under the chosen density.

    "uniform": t ~ U(0,1). "logit_normal": t = σ(N(0,1)) warped by the sampler's
    own resolution shift (ops/schedule.py:time_shift with σ=1, mu from
    ``get_lin_function(image_seq_len)``) — the SD3/FLUX training density."""
    if t_sampling == "logit_normal":
        import math

        from ..ops.schedule import get_lin_function

        t = jax.nn.sigmoid(jax.random.normal(key, (batch,), jnp.float32))
        em = math.exp(get_lin_function()(image_seq_len))  # static at trace time
        return em * t / (em * t + (1.0 - t))  # time_shift(mu, 1, t) in jax form
    if t_sampling == "uniform":
        return jax.random.uniform(key, (batch,), jnp.float32)
    raise ValueError(f"unknown t_sampling {t_sampling!r} (uniform|logit_normal)")


def flow_matching_loss(
    params: Dict[str, Any],
    cfg: FluxStatic,
    batch: Dict[str, jnp.ndarray],
    key: jax.Array,
    t_sampling: str = "uniform",
    stack_runner=None,
) -> jnp.ndarray:
    """Rectified-flow MSE: x_t = (1-t)·x₀ + t·ε, target v = ε − x₀.

    ``t_sampling``: "uniform" draws t ~ U(0,1); "logit_normal" draws
    t = σ(N(0,1)) warped by the same resolution-aware shift the sampler's
    schedule uses (ops/schedule.py:time_shift with σ=1, mu from the image seq
    length) — the SD3/FLUX training density, which concentrates steps where the
    velocity target is hardest instead of wasting batches near t≈0/1."""
    x0 = batch["latents"]  # (B, L, C) packed clean latents
    txt = batch["txt"]
    y = batch["y"]
    b = x0.shape[0]
    k_t, k_eps = jax.random.split(key)
    t = sample_timesteps(k_t, b, x0.shape[1], t_sampling)
    eps = jax.random.normal(k_eps, x0.shape, jnp.float32).astype(x0.dtype)
    t_b = t.astype(x0.dtype)[:, None, None]
    x_t = (1.0 - t_b) * x0 + t_b * eps

    img_ids = batch["img_ids"]
    txt_ids = batch["txt_ids"]
    guidance = jnp.full((b,), 1.0, jnp.float32) if cfg.guidance_embed else None
    pred = flux_apply(
        params, cfg, x_t, img_ids, txt, txt_ids, t, y, guidance,
        stack_runner=stack_runner,
    )
    target = eps - x0
    return jnp.mean((pred.astype(jnp.float32) - target.astype(jnp.float32)) ** 2)


def sgd_update(params, grads, lr: float = 1e-4):
    """Minimal optimizer for the dry-run path (:func:`make_train_step` with an
    optax transform is the real-training entry)."""
    return jax.tree.map(
        lambda p, g: p - lr * g.astype(p.dtype) if g is not None else p, params, grads
    )


def make_optax_train_step(
    cfg: FluxStatic, optimizer, remat: bool = True, t_sampling: str = "uniform"
):
    """Train step with a real optimizer: → (init_fn, step_fn) where
    ``init_fn(params) -> opt_state`` and
    ``step_fn(params, opt_state, batch, key) -> (params, opt_state, loss)``.

    ``optimizer`` is any optax GradientTransformation (e.g.
    ``optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(1e-4))``). The step
    jits with params AND opt_state donated — Adam's two moment trees triple the
    param memory, so in-place buffer reuse matters at 12B scale. Sharding flows
    from the argument placements exactly like :func:`make_train_step`; optax's
    moment trees inherit the grads' shardings (same tree structure), so dp/tp
    layouts carry into the optimizer state with no extra annotations."""
    import dataclasses

    cfg = dataclasses.replace(
        cfg, use_pallas=False, attn_shard_axes=None, attn_seq_axis=None, remat=remat
    )

    @partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, batch, key):
        loss, grads = jax.value_and_grad(flow_matching_loss)(
            params, cfg, batch, key, t_sampling
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        import optax

        return optax.apply_updates(params, updates), opt_state, loss

    return optimizer.init, step


def make_train_step(cfg: FluxStatic, remat: bool = True):
    """→ jitted step(params, batch, key) → (params, loss). Sharding comes from the
    argument placements (GSPMD propagates from param/batch shardings).

    Training always uses the XLA attention path: the Pallas serving kernel has no
    VJP, so differentiating a ``use_pallas=True`` (or shard_map-attention) cfg would
    crash at trace time — the GSPMD-partitioned XLA attention is differentiable and
    shards the same way.

    ``remat`` (default on) rematerializes each block under backprop
    (``jax.checkpoint`` on the scan bodies): activations of the 19+38 block stacks
    are recomputed instead of stored — at flux-dev scale storing them costs
    ~57 · (B, 4608, 3072) bf16 ≈ 1.6GB·B beside 24GB of bf16 params+grads, so the
    recompute (one extra forward) is what makes training reachable at all on
    16GB-HBM chips. Identical numerics either way (same ops, same order)."""
    import dataclasses

    cfg = dataclasses.replace(
        cfg, use_pallas=False, attn_shard_axes=None, attn_seq_axis=None, remat=remat
    )

    @partial(jax.jit, static_argnames=(), donate_argnums=(0,))
    def step(params, batch, key):
        loss, grads = jax.value_and_grad(flow_matching_loss)(params, cfg, batch, key)
        return sgd_update(params, grads), loss

    return step


def make_dummy_batch(cfg: FluxStatic, batch: int, h_latent: int, w_latent: int, txt_len: int, key):
    ks = jax.random.split(key, 3)
    seq = (h_latent // 2) * (w_latent // 2)
    return {
        "latents": jax.random.normal(ks[0], (batch, seq, cfg.in_channels), jnp.float32).astype(cfg.dtype),
        "txt": jax.random.normal(ks[1], (batch, txt_len, cfg.context_in_dim), jnp.float32).astype(cfg.dtype),
        "y": jax.random.normal(ks[2], (batch, cfg.vec_in_dim), jnp.float32).astype(cfg.dtype),
        "img_ids": make_img_ids(h_latent, w_latent, batch),
        "txt_ids": make_txt_ids(txt_len, batch),
    }


# --------------------------------------------------------------- checkpoint/resume
#
# The reference has no training and therefore no resume story (SURVEY.md §5 row 4);
# with a train step in the framework, resume becomes part of the surface. Orbax is
# the TPU-native checkpointer: it writes each leaf as a sharded tensorstore array
# (every host saves only its shards — no 36GB gather at 12B params + Adam moments)
# and restores onto whatever mesh layout the template carries.


def save_train_state(path, params, opt_state, step: int, overwrite: bool = False) -> None:
    """Write {params, opt_state, step} to ``path`` (a directory) via orbax.

    Works for single-device and mesh-sharded trees alike; each call is a fresh
    atomic directory write. ``overwrite=True`` replaces an existing checkpoint at
    the same path (the single-rolling-checkpoint pattern the LoRA trainer uses)."""
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(
            path, {"params": params, "opt_state": opt_state, "step": step}, force=overwrite
        )


def restore_train_state(path, params_template, opt_state_template):
    """→ (params, opt_state, step) restored from ``path``.

    Templates are matching pytrees — concrete arrays or jax.ShapeDtypeStructs
    carrying ``sharding`` — that tell orbax each leaf's dtype/shape/layout, so a
    checkpoint written on one mesh restores directly onto another (or onto one
    device) without a resharding pass."""
    import orbax.checkpoint as ocp

    def as_abstract(tree):
        return jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=getattr(x, "sharding", None))
            if hasattr(x, "shape")
            else x,
            tree,
        )

    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(
            path,
            {
                "params": as_abstract(params_template),
                "opt_state": as_abstract(opt_state_template),
                "step": 0,
            },
        )
    return restored["params"], restored["opt_state"], restored["step"]


# ----------------------------------------------------------- LoRA fine-tuning (QLoRA)


def make_lora_train_step(
    cfg: FluxStatic, optimizer, remat: bool = True, t_sampling: str = "uniform"
):
    """QLoRA-style adapter training: frozen (typically quantized) base, gradients
    only into the rank-r adapters → (init_fn, step_fn) with
    ``step_fn(adapters, opt_state, base_params, batch, key) ->
    (adapters, opt_state, loss)``.

    This is the configuration that makes *training flux-dev on one 16GB chip*
    possible at all: the base stays int8/fp8/int4 (6-12GB, byte-identical
    throughout), adapters+moments are ~300MB at rank 16, and ``remat`` recomputes
    block activations. Forwards run the differentiable dequantize path
    (``FluxStatic.dequant_linears`` — the serving paths' activation round/cast has
    no gradient); adapters apply as the ``(x@A)@B`` side branch in linear_apply.
    Only ``adapters`` and ``opt_state`` are donated — the frozen base buffers are
    reused across every step by construction.

    The result of training round-trips into serving via
    ``lora.save_lora_adapters`` (kohya-format export) → ``pipeline.load_lora``."""
    import dataclasses

    cfg = dataclasses.replace(
        cfg,
        use_pallas=False,
        attn_shard_axes=None,
        attn_seq_axis=None,
        remat=remat,
        dequant_linears=True,
    )

    def loss_fn(adapters, base_params, batch, key):
        from ..lora import merge_lora_adapters

        return flow_matching_loss(
            merge_lora_adapters(base_params, adapters), cfg, batch, key, t_sampling
        )

    @partial(jax.jit, donate_argnums=(0, 1))
    def step(adapters, opt_state, base_params, batch, key):
        loss, grads = jax.value_and_grad(loss_fn)(adapters, base_params, batch, key)
        updates, opt_state = optimizer.update(grads, opt_state, adapters)
        import optax

        return optax.apply_updates(adapters, updates), opt_state, loss

    return optimizer.init, step
