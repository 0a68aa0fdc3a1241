"""Streamed (double-buffered) CPU-offload denoise.

The reference's 24GB offload plan moves the flow model incrementally — block by
block as compute reaches it (``float8_quantize.py:427-446``, per-stage moves at
``flux_pipeline.py:624-656``). The first TPU port round-tripped the entire 12GB
flow tree in one ``device_put`` per generate, fully serializing transfer and
compute. This module is the TPU-native version of the reference's idea:

- top-level params (embedders, final layer — a few MB) stay resident on device;
- the depth-stacked double/single blocks live on the host, sliced lazily per
  block at put time (~200MB transient each — the stacked tree stays the only
  persistent host copy);
- a host loop dispatches one jitted apply per block; during the FIRST denoise
  step it issues the ``device_put`` for block *i+1* before dispatching block
  *i*'s compute — JAX dispatch is asynchronous, so each host→HBM copy overlaps
  the previous block's matmuls. Transferred slices are RETAINED on device, so
  steps 2..N run fully resident (zero transfer), and every device reference is
  dropped when the loop returns — the HBM is free for the text encoders / VAE
  again without any device→host copy, because the host tree was never replaced.

Versus the whole-tree round trip this (a) hides the 12GB host→HBM time behind
step 1's compute instead of serializing it before the loop, and (b) eliminates
the 12GB device→host return copy outright (weights don't change; re-pointing at
the kept host tree is free). Re-streaming every step (true 2-slice peak) was
considered and rejected: at PCIe-class rates a 12GB flow re-transfer costs
~0.75s/step against ~0.32s of compute — strictly transfer-bound.

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


class LazyBlockSlices:
    """Per-block views over a depth-stacked pytree, materialized on demand.

    ``[i]`` computes ``tree.map(x[i])`` fresh each call — one transient per-block
    copy (~200MB at flux-dev scale) that dies after its ``device_put`` — instead of
    materializing depth-many slice copies up front, which would hold a second
    ~12GB image of the flow in host RAM beside the stacked tree for the pipeline's
    lifetime. Slicing happens only under step 1's puts, where the host→HBM
    transfer itself dominates."""

    def __init__(self, stack):
        self._stack = stack
        self._depth = jax.tree.leaves(stack)[0].shape[0]

    def __len__(self) -> int:
        return self._depth

    def __getitem__(self, i: int):
        if not 0 <= i < self._depth:
            raise IndexError(i)
        return jax.tree.map(lambda x: x[i], self._stack)


def split_flow_params(params: Dict[str, Any]):
    """Host flow tree → (tops, per-double-block slices, per-single-block slices).

    The slices are lazy per-block pytrees (depth axis stripped), each one
    ``device_put``-able independently; ``None`` leaves (e.g. a schnell tree's
    ``guidance_in``) pass through as empty subtrees."""
    tops = {k: v for k, v in params.items() if k not in ("double_blocks", "single_blocks")}
    return (
        tops,
        LazyBlockSlices(params["double_blocks"]),
        LazyBlockSlices(params["single_blocks"]),
    )


def slice_nbytes(slices: "LazyBlockSlices") -> int:
    """Bytes of ONE per-block slice (stack bytes / depth) — the unit the
    ``retain_bytes`` budget is charged in."""
    return sum(x.nbytes for x in jax.tree.leaves(slices._stack)) // len(slices)


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
    retain_bytes: Optional[int] = None,
    sync_every: int = 8,
) -> jnp.ndarray:
    """Run the full denoise loop with per-block weight streaming: step 1 overlaps
    each block's host→HBM copy with the previous block's compute (double-buffered
    prefetch), later steps run device-resident, and all device weight references
    die with this frame — no return transfer.

    ``retain_bytes`` caps how much block weight stays resident between steps:
    ``None`` (default) retains everything — right whenever the tree fits HBM beside
    the activations. A finite budget retains the leading blocks up to the cap and
    re-streams the rest every step (prefetched one block ahead, dropped right after
    their compute dispatch — a rolling ~2-slice window). This is how a tree LARGER
    than the chip's HBM runs at all (e.g. the 24GB bf16 flux-dev ground truth for
    the fidelity gate on a 16GB chip): transfer-bound, but correct and bounded.

    ``sync_every`` is HOST-memory backpressure: JAX dispatch is fully async, so
    with nothing ever blocking, the host loop enqueues every ``device_put`` of
    every step up front and each one pins its transient host slice until the
    transfer executes — on a slow link the backlog grows to (steps × streamed
    bytes) and OOMs the HOST (measured: a 24GB-tree/8-step run was oom-killed at
    119GB RSS). After every ``sync_every`` dispatched puts, a 1-element fetch of
    the newest activation forces the queue to drain to the compute frontier,
    bounding the pinned backlog to ~``sync_every`` slices. Steps that issue no
    puts (fully-retained steady state — the production serving path) never sync
    and pay zero overhead; a sync costs one link round-trip (~32ms here), well
    under the transfer time it bounds.

    Matches :func:`..sampling._denoise_scan` numerically (same ops, different jit
    boundaries — float reassociation only; tests pin the closeness)."""
    b = img.shape[0]
    g_vec = (
        jnp.full((b,), guidance, jnp.float32) if cfg.guidance_embed else None
    )
    ts = jnp.asarray(timesteps, jnp.float32)
    pairs = list(zip(ts[:-1], ts[1:]))
    n_dbl = len(dbl_slices)
    n = n_dbl + len(sgl_slices)

    def slice_at(j: int):
        return dbl_slices[j] if j < n_dbl else sgl_slices[j - n_dbl]

    steps = pairs
    if progress:
        try:
            from tqdm import tqdm

            steps = tqdm(pairs, desc="denoise (streamed offload)")
        except ImportError:
            pass

    # which blocks stay resident between steps: all of them (retain_bytes=None), or
    # the leading prefix whose cumulative slice bytes fit the budget
    if retain_bytes is None:
        retained = [True] * n
    else:
        db, sb = slice_nbytes(dbl_slices), slice_nbytes(sgl_slices)
        retained, cum = [], 0
        for j in range(n):
            cum += db if j < n_dbl else sb
            retained.append(cum <= retain_bytes)

    # device-resident copies, filled by the prefetch chain (during step 1 for
    # retained blocks, every step for streamed ones) and dropped when this
    # function returns
    dev: List = [None] * n
    puts_since_sync = 0
    for t_curr, t_prev in steps:
        t_vec = jnp.full((b,), t_curr, jnp.float32)
        img_e, txt_e, vec_silu, cos, sin = fns["pre"](
            tops_dev, img, img_ids, txt, txt_ids, t_vec, y, g_vec
        )
        x = None
        if dev[0] is None:
            dev[0] = jax.device_put(slice_at(0), device)
            puts_since_sync += 1
        for j in range(n):
            # prefetch the next slice BEFORE dispatching this block's compute —
            # both are async, so the copy overlaps the matmuls (every step for
            # streamed blocks; once for retained ones)
            if j + 1 < n and dev[j + 1] is None:
                dev[j + 1] = jax.device_put(slice_at(j + 1), device)
                puts_since_sync += 1
            if j < n_dbl:
                img_e, txt_e = fns["double"](dev[j], img_e, txt_e, vec_silu, cos, sin)
                if j == n_dbl - 1:
                    x = jnp.concatenate([txt_e, img_e], axis=1)
            else:
                x = fns["single"](dev[j], x, vec_silu, cos, sin)
            if not retained[j]:
                # compute is dispatched — JAX keeps the buffer alive until it
                # completes; dropping the reference frees the HBM right after
                dev[j] = None
            if sync_every and puts_since_sync >= sync_every:
                # drain the dispatch queue to the compute frontier so pinned
                # host slices can't pile up (see docstring; block_until_ready
                # is a no-op through the tunnel — fetch a value instead)
                cur = img_e if j < n_dbl else x
                jax.device_get(cur[:1, :1, :1])
                puts_since_sync = 0
        img = fns["final"](tops_dev, x, vec_silu, img, t_curr, t_prev)
    return img
