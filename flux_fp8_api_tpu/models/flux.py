"""FLUX.1 flow transformer, TPU-native.

Redesign of the reference's ``modules/flux_model.py`` (Flux/DoubleStreamBlock/
SingleStreamBlock/Modulation/LastLayer, :260-716) as a parameter pytree + pure apply
function:

- the 19 double and 38 single blocks are *stacked* along a leading depth axis and run
  under ``jax.lax.scan`` — one compiled block body per stack instead of the reference's
  57 separately ``torch.compile``'d modules (flux_pipeline.py:224-231), which is what
  makes whole-step jit compile times tractable at 12B params;
- quantized linears are :class:`~..ops.quant.Linear` leaves; the quantization *tier*
  (which layers are fp8/int8 vs float) is a partition over the tree
  (:func:`quantize_flux_tree`) reproducing the reference's rules: ``final_layer`` never
  quantized (float8_quantize.py:476), modulation gated by ``quantize_modulation``
  (float8_quantize.py:346), embedders gated by ``quantize_flow_embedder_layers``
  (float8_quantize.py:447-475);
- fp8 input-scale calibration is functional: ``collect_amax=True`` makes the apply
  return a pytree of per-layer (per-block) input amaxes instead of mutating counters
  (reference float8_quantize.py:220-246).

Layout: sequences are (B, L, D); attention runs BTNH (see ops/attention.py).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.attention import attention
from ..ops.math import (
    clamp_policy,
    gelu_tanh,
    layer_norm,
    modulate,
    rms_norm,
    silu,
    timestep_embedding,
)
from ..ops.quant import (
    Linear,
    linear_apply,
    quantize_linear_fp8,
    quantize_linear_int4,
    quantize_linear_int8,
)
from ..ops.rope import embed_nd_cos_sin
from ..utils.config import FluxParams, ModelSpec


@dataclasses.dataclass(frozen=True)
class FluxStatic:
    """Hashable static model config for jit (derived from FluxParams + ModelSpec)."""

    in_channels: int
    vec_in_dim: int
    context_in_dim: int
    hidden_size: int
    mlp_hidden: int
    num_heads: int
    depth: int
    depth_single_blocks: int
    axes_dim: Tuple[int, ...]
    theta: int
    qkv_bias: bool
    guidance_embed: bool
    compute_dtype: str = "bfloat16"  # "float16" turns on the ±32000 clamps
    use_pallas: bool = True
    # mesh axes to shard the attention kernel's folded batch·head axis over
    # (ops/attention.py shard_map path); None = single-chip / GSPMD-only
    attn_shard_axes: Optional[Tuple[str, ...]] = None
    # mesh axis for sequence/context parallelism: q rows shard, kv gathered
    attn_seq_axis: Optional[str] = None
    # fused qkv/linear1/linear2 channel layout: "flat" (reference K-major order —
    # the single-chip default; measured fastest, 3.138 it/s @1024² int8 v5e) or
    # "grouped" (head-major per-head groups — applied at shard time under tensor
    # parallelism so tp shards never cross q/k/v/mlp boundaries; see
    # utils/checkpoint.py relayout_flux_tree). cfg and params must agree.
    fused_layout: str = "flat"
    # rematerialize block activations under autodiff (jax.checkpoint on the scan
    # bodies): backprop recomputes each block's forward instead of storing ~57
    # blocks of (B, L, hidden) activations — the standard memory/FLOPs trade for
    # training 12B-scale models on 16GB chips. Inference-only paths are unaffected
    # (checkpoint is an autodiff construct; the primal computation is unchanged).
    remat: bool = False
    # route quantized-activation kinds (fp8/int8/int4) through an on-the-fly
    # weight-dequantize + bf16 matmul instead of the serving quantize path — the
    # differentiable QLoRA training forward (the serving paths round/cast
    # activations to int8/e5m2, which has no gradient wrt x). Inference configs
    # keep this off.
    dequant_linears: bool = False

    @classmethod
    def from_params(
        cls, p: FluxParams, compute_dtype: str = "bfloat16", use_pallas: bool = True
    ) -> "FluxStatic":
        head_dim = p.hidden_size // p.num_heads
        if p.hidden_size % p.num_heads != 0:
            raise ValueError(
                f"Hidden size {p.hidden_size} must be divisible by num_heads {p.num_heads}"
            )
        if sum(p.axes_dim) != head_dim:
            raise ValueError(f"Got {p.axes_dim} but expected positional dim {head_dim}")
        mlp_hidden = int(p.hidden_size * p.mlp_ratio)
        if mlp_hidden % p.num_heads != 0:
            # the head-major grouped linear1/linear2 layout slices the mlp width per
            # head (see _single_block / utils/checkpoint.py qkv_out_permutation)
            raise ValueError(
                f"mlp width {mlp_hidden} must be divisible by num_heads {p.num_heads}"
            )
        return cls(
            in_channels=p.in_channels,
            vec_in_dim=p.vec_in_dim,
            context_in_dim=p.context_in_dim,
            hidden_size=p.hidden_size,
            mlp_hidden=int(p.hidden_size * p.mlp_ratio),
            num_heads=p.num_heads,
            depth=p.depth,
            depth_single_blocks=p.depth_single_blocks,
            axes_dim=tuple(p.axes_dim),
            theta=p.theta,
            qkv_bias=p.qkv_bias,
            guidance_embed=p.guidance_embed,
            compute_dtype=compute_dtype,
            use_pallas=use_pallas,
        )

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @property
    def dtype(self) -> jnp.dtype:
        return jnp.dtype({"bfloat16": jnp.bfloat16, "float16": jnp.float16, "float32": jnp.float32}[self.compute_dtype])

    @property
    def do_clamp(self) -> bool:
        return self.compute_dtype == "float16"


# ------------------------------------------------------------------------- param init


def _init_linear(key, in_f: int, out_f: int, dtype, bias: bool = True) -> Linear:
    kw, kb = jax.random.split(key)
    # kaiming-uniform fan_in, matching torch nn.Linear defaults closely enough for
    # random-init tests/benchmarks (real weights come from checkpoints).
    bound = (1.0 / in_f) ** 0.5
    kernel = jax.random.uniform(kw, (in_f, out_f), jnp.float32, -bound * 3**0.5, bound * 3**0.5)
    b = jax.random.uniform(kb, (out_f,), jnp.float32, -bound, bound) if bias else None
    return Linear(
        kernel=kernel.astype(dtype),
        bias=b.astype(dtype) if b is not None else None,
        kind="float",
    )


def _init_mlp_embedder(key, in_dim: int, hidden: int, dtype) -> Dict[str, Linear]:
    k1, k2 = jax.random.split(key)
    return {
        "in_layer": _init_linear(k1, in_dim, hidden, dtype),
        "out_layer": _init_linear(k2, hidden, hidden, dtype),
    }


def _init_double_block(key, cfg: FluxStatic, dtype) -> Dict[str, Any]:
    ks = jax.random.split(key, 12)
    hs, mh = cfg.hidden_size, cfg.mlp_hidden
    return {
        "img_mod_lin": _init_linear(ks[0], hs, 6 * hs, dtype),
        "txt_mod_lin": _init_linear(ks[1], hs, 6 * hs, dtype),
        "img_attn_qkv": _init_linear(ks[2], hs, 3 * hs, dtype, bias=cfg.qkv_bias),
        "img_attn_proj": _init_linear(ks[3], hs, hs, dtype),
        "txt_attn_qkv": _init_linear(ks[4], hs, 3 * hs, dtype, bias=cfg.qkv_bias),
        "txt_attn_proj": _init_linear(ks[5], hs, hs, dtype),
        "img_mlp_0": _init_linear(ks[6], hs, mh, dtype),
        "img_mlp_2": _init_linear(ks[7], mh, hs, dtype),
        "txt_mlp_0": _init_linear(ks[8], hs, mh, dtype),
        "txt_mlp_2": _init_linear(ks[9], mh, hs, dtype),
        "img_attn_qnorm": jnp.ones((cfg.head_dim,), dtype),
        "img_attn_knorm": jnp.ones((cfg.head_dim,), dtype),
        "txt_attn_qnorm": jnp.ones((cfg.head_dim,), dtype),
        "txt_attn_knorm": jnp.ones((cfg.head_dim,), dtype),
    }


def _init_single_block(key, cfg: FluxStatic, dtype) -> Dict[str, Any]:
    ks = jax.random.split(key, 3)
    hs, mh = cfg.hidden_size, cfg.mlp_hidden
    return {
        "linear1": _init_linear(ks[0], hs, 3 * hs + mh, dtype),
        "linear2": _init_linear(ks[1], hs + mh, hs, dtype),
        "mod_lin": _init_linear(ks[2], hs, 3 * hs, dtype),
        "qnorm": jnp.ones((cfg.head_dim,), dtype),
        "knorm": jnp.ones((cfg.head_dim,), dtype),
    }


def init_flux_params(key, cfg: FluxStatic, dtype=None) -> Dict[str, Any]:
    """Random-init parameter tree (float kind). Double/single blocks are stacked along
    a leading depth axis, ready for lax.scan."""
    dtype = dtype or cfg.dtype
    keys = jax.random.split(key, 9)
    hs = cfg.hidden_size

    def stack_blocks(init_fn, n, key):
        blocks = [init_fn(k, cfg, dtype) for k in jax.random.split(key, n)]
        return jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *blocks)

    tree = {
        "img_in": _init_linear(keys[0], cfg.in_channels, hs, dtype),
        "txt_in": _init_linear(keys[1], cfg.context_in_dim, hs, dtype),
        "time_in": _init_mlp_embedder(keys[2], 256, hs, dtype),
        "vector_in": _init_mlp_embedder(keys[3], cfg.vec_in_dim, hs, dtype),
        "guidance_in": (
            _init_mlp_embedder(keys[4], 256, hs, dtype) if cfg.guidance_embed else None
        ),
        "double_blocks": stack_blocks(_init_double_block, cfg.depth, keys[5]),
        "single_blocks": stack_blocks(_init_single_block, cfg.depth_single_blocks, keys[6]),
        "final_layer": {
            "linear": _init_linear(keys[7], hs, cfg.in_channels, dtype),
            "adaln": _init_linear(keys[8], hs, 2 * hs, dtype),
        },
    }
    return tree


# ------------------------------------------------------------------- tier quantization

# Leaves of the flux tree that hold Linear layers, grouped by tier rule.
EMBEDDER_PATHS = ("img_in", "txt_in", "time_in", "vector_in", "guidance_in")
MODULATION_LEAF_NAMES = ("img_mod_lin", "txt_mod_lin", "mod_lin")


def quantize_flux_tree(
    tree: Dict[str, Any],
    quantize_modulation: bool = True,
    quantize_flow_embedder_layers: bool = False,
    kind: str = "fp8",
) -> Dict[str, Any]:
    """Partition the param tree into {quantized, float} per the reference's tier rules
    (float8_quantize.py:320-369,395-496) and quantize the selected Linear leaves.

    - ``final_layer`` is never quantized (float8_quantize.py:476);
    - modulation linears follow ``quantize_modulation`` (default True, ~2GB saved);
    - img_in/txt_in/time_in/vector_in/guidance_in follow ``quantize_flow_embedder_layers``
      (default False, ~512MB saved);
    - qkv/proj/mlp/linear1/linear2 always quantize.

    ``kind``: "fp8" (parity tier), "int8" (TPU speed tier), or "int4" (the reference's
    gigaquant memory tier, config-dev-gigaquant.json — 12B flow in ~6GB).
    """
    qfn = {
        "fp8": quantize_linear_fp8,
        "int8": quantize_linear_int8,
        "int4": quantize_linear_int4,
    }[kind]

    # per-leaf jits (cached by shape): the f32 upcast stays fused inside each call —
    # eagerly, single_blocks.linear1 alone would stage a ~10GB f32 intermediate at
    # flux-dev scale on the quantize-on-load path (CLAUDE.md multi-GB-init rule)
    _q_jit = jax.jit(lambda k, b: qfn(k.astype(jnp.float32), b))
    _q_jit_nb = jax.jit(lambda k: qfn(k.astype(jnp.float32), None))
    _qs_jit = jax.jit(jax.vmap(lambda k, b: qfn(k.astype(jnp.float32), b)))
    _qs_jit_nb = jax.jit(jax.vmap(lambda k: qfn(k.astype(jnp.float32), None)))

    def quant(lin: Linear) -> Linear:
        if lin.kind != "float":
            return lin
        if lin.bias is not None:
            return _q_jit(lin.kernel, lin.bias)
        return _q_jit_nb(lin.kernel)

    def quant_stacked(lin: Linear) -> Linear:
        """Per-block scales for depth-stacked leaves: each of the reference's 57 blocks
        owns its own per-tensor amax/scale (one F8Linear each), so quantize vmapped
        over the leading depth axis rather than with one scale for the whole stack."""
        if lin.kind != "float":
            return lin
        if lin.bias is not None:
            return _qs_jit(lin.kernel, lin.bias)
        return _qs_jit_nb(lin.kernel)

    out = dict(tree)
    for name in EMBEDDER_PATHS:
        sub = tree.get(name)
        if sub is None or not quantize_flow_embedder_layers:
            continue
        if isinstance(sub, Linear):
            out[name] = quant(sub)
        else:
            out[name] = {k: quant(v) for k, v in sub.items()}

    def quant_block_dict(blocks: Dict[str, Any]) -> Dict[str, Any]:
        new = {}
        for k, v in blocks.items():
            if not isinstance(v, Linear):
                new[k] = v
            elif k in MODULATION_LEAF_NAMES and not quantize_modulation:
                new[k] = v
            else:
                new[k] = quant_stacked(v)
        return new

    out["double_blocks"] = quant_block_dict(tree["double_blocks"])
    out["single_blocks"] = quant_block_dict(tree["single_blocks"])
    # final_layer stays float
    return out


# ------------------------------------------------------------------------------ apply


class _Tape:
    """Collects per-layer input amaxes during calibration passes."""

    def __init__(self, collect: bool, dequant: bool = False):
        self.collect = collect
        self.dequant = dequant
        self.amaxes: Dict[str, jnp.ndarray] = {}

    def lin(self, name: str, lin: Linear, x: jnp.ndarray, dtype) -> jnp.ndarray:
        out, amax = linear_apply(
            lin, x, dtype, collect_amax=self.collect, dequant=self.dequant
        )
        if self.collect:
            self.amaxes[name] = amax
        return out


def _mlp_embedder(tape: _Tape, name: str, p: Dict[str, Linear], x, dtype):
    """out_layer(silu(in_layer(x))) (reference MLPEmbedder, flux_model.py:119-155)."""
    h = tape.lin(f"{name}.in_layer", p["in_layer"], x, dtype)
    return tape.lin(f"{name}.out_layer", p["out_layer"], silu(h), dtype)


def _split_qkv(qkv: jnp.ndarray, num_heads: int, layout: str = "flat"):
    """(B, L, 3D) → three (B, L, N, H) tensors.

    layout="flat": reference K-major channel order (3, heads, head_dim) — the
    single-chip default (contiguous q/k/v slabs; measured fastest fusion).
    layout="grouped": HEAD-MAJOR order (head, {q,k,v}, head_dim) — used under
    tensor parallelism, where a contiguous tp shard of the out axis holds whole
    heads with their full q/k/v, so the reshape propagates the sharding straight
    onto the head axis with zero resharding (utils/checkpoint.py
    relayout_flux_tree applies the weight permutation at shard time)."""
    b, l, d3 = qkv.shape
    if layout == "flat":
        # reference K-major reshape (flux_model.py:222-225); contiguous q/k/v slabs
        qkv = qkv.reshape(b, l, 3, num_heads, d3 // (3 * num_heads))
        return qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    qkv = qkv.reshape(b, l, num_heads, 3, d3 // (3 * num_heads))
    return qkv[:, :, :, 0], qkv[:, :, :, 1], qkv[:, :, :, 2]


def _double_block(cfg: FluxStatic, blk, img, txt, vec_silu, cos, sin, tape: _Tape):
    """One DoubleStreamBlock (reference flux_model.py:356-400)."""
    dtype = cfg.dtype
    n = cfg.num_heads
    txt_len = txt.shape[1]

    img_mod = tape.lin("img_mod_lin", blk["img_mod_lin"], vec_silu, dtype)[:, None, :]
    txt_mod = tape.lin("txt_mod_lin", blk["txt_mod_lin"], vec_silu, dtype)[:, None, :]
    (i_shift1, i_scale1, i_gate1, i_shift2, i_scale2, i_gate2) = jnp.split(img_mod, 6, axis=-1)
    (t_shift1, t_scale1, t_gate1, t_shift2, t_scale2, t_gate2) = jnp.split(txt_mod, 6, axis=-1)

    img_modulated = modulate(layer_norm(img), i_shift1, i_scale1)
    img_q, img_k, img_v = _split_qkv(
        tape.lin("img_attn_qkv", blk["img_attn_qkv"], img_modulated, dtype), n,
        cfg.fused_layout,
    )
    img_q = rms_norm(img_q, blk["img_attn_qnorm"])
    img_k = rms_norm(img_k, blk["img_attn_knorm"])

    txt_modulated = modulate(layer_norm(txt), t_shift1, t_scale1)
    txt_q, txt_k, txt_v = _split_qkv(
        tape.lin("txt_attn_qkv", blk["txt_attn_qkv"], txt_modulated, dtype), n,
        cfg.fused_layout,
    )
    txt_q = rms_norm(txt_q, blk["txt_attn_qnorm"])
    txt_k = rms_norm(txt_k, blk["txt_attn_knorm"])

    # joint attention over concat(txt, img) sequence (flux_model.py:380-385)
    q = jnp.concatenate([txt_q, img_q], axis=1)
    k = jnp.concatenate([txt_k, img_k], axis=1)
    v = jnp.concatenate([txt_v, img_v], axis=1)
    attn = attention(q, k, v, cos, sin, use_pallas=cfg.use_pallas,
                     shard_axes=cfg.attn_shard_axes, seq_axis=cfg.attn_seq_axis)
    txt_attn, img_attn = attn[:, :txt_len], attn[:, txt_len:]

    img = img + i_gate1 * tape.lin("img_attn_proj", blk["img_attn_proj"], img_attn, dtype)
    img_mlp_in = modulate(layer_norm(img), i_shift2, i_scale2)
    img_mlp = tape.lin(
        "img_mlp_2",
        blk["img_mlp_2"],
        gelu_tanh(tape.lin("img_mlp_0", blk["img_mlp_0"], img_mlp_in, dtype)),
        dtype,
    )
    img = img + i_gate2 * img_mlp

    txt = txt + t_gate1 * tape.lin("txt_attn_proj", blk["txt_attn_proj"], txt_attn, dtype)
    txt_mlp_in = modulate(layer_norm(txt), t_shift2, t_scale2)
    txt_mlp = tape.lin(
        "txt_mlp_2",
        blk["txt_mlp_2"],
        gelu_tanh(tape.lin("txt_mlp_0", blk["txt_mlp_0"], txt_mlp_in, dtype)),
        dtype,
    )
    txt = txt + t_gate2 * txt_mlp

    img = clamp_policy(img, cfg.do_clamp)
    txt = clamp_policy(txt, cfg.do_clamp)
    return img, txt


def _single_block(cfg: FluxStatic, blk, x, vec_silu, cos, sin, tape: _Tape):
    """One SingleStreamBlock (reference flux_model.py:467-485)."""
    dtype = cfg.dtype
    n = cfg.num_heads
    hs, mh = cfg.hidden_size, cfg.mlp_hidden

    mod = tape.lin("mod_lin", blk["mod_lin"], vec_silu, dtype)[:, None, :]
    shift, scale, gate = jnp.split(mod, 3, axis=-1)
    x_mod = modulate(layer_norm(x), shift, scale)

    # In the "grouped" (tensor-parallel) layout linear1's out-axis is grouped per
    # head — [q_n | k_n | v_n | mlp_n] — so a tp shard of the out axis carries
    # whole heads plus their matching mlp slices (utils/checkpoint.py
    # relayout_flux_tree); "flat" keeps the reference's contiguous [qkv | mlp].
    b, l = x_mod.shape[:2]
    hd = cfg.head_dim
    g = mh // n  # mlp channels per head group
    if cfg.fused_layout == "flat":
        lin1 = tape.lin("linear1", blk["linear1"], x_mod, dtype)
        q, k, v = _split_qkv(lin1[..., : 3 * hs], n, "flat")
        mlp = lin1[..., 3 * hs :]
    else:
        lin1 = tape.lin("linear1", blk["linear1"], x_mod, dtype).reshape(
            b, l, n, 3 * hd + g
        )
        qkv = lin1[..., : 3 * hd].reshape(b, l, n, 3, hd)
        q, k, v = qkv[..., 0, :], qkv[..., 1, :], qkv[..., 2, :]
        mlp = lin1[..., 3 * hd :]  # (B, L, N, g)
    q = rms_norm(q, blk["qnorm"])
    k = rms_norm(k, blk["knorm"])
    attn = attention(q, k, v, cos, sin, use_pallas=cfg.use_pallas,
                     shard_axes=cfg.attn_shard_axes, seq_axis=cfg.attn_seq_axis)

    if cfg.fused_layout == "flat":
        x2 = jnp.concatenate([attn, gelu_tanh(mlp)], axis=-1)
    else:
        # linear2's in-axis is grouped like linear1's out-axis — [attn_n |
        # gelu(mlp)_n] per head (utils/checkpoint.py linear2_in_permutation) —
        # so its row-parallel shard consumes exactly what its heads produced.
        x2 = jnp.concatenate(
            [attn.reshape(b, l, n, hd), gelu_tanh(mlp)], axis=-1
        ).reshape(b, l, n * (hd + g))
    out = tape.lin("linear2", blk["linear2"], x2, dtype)
    return clamp_policy(x + gate * out, cfg.do_clamp)


def max_logit_bound(params: Dict[str, Any], cfg: FluxStatic) -> float:
    """Static upper bound on any attention |logit| this parameter tree can produce.

    FLUX RMS-norms q and k per head before rope (ops/math.py:rms_norm), so
    |q|₂ ≤ √head_dim · max|qnorm_scale| regardless of the qkv weights, and rope is
    orthogonal — hence |q·k / √d| ≤ √d · max|qs| · max|ks|. The bound depends ONLY
    on the qk-norm scale parameters (LoRA fuses touch linears, never these), which
    makes the max-free attention kernel's safety (ops/attention_kernel.py
    MAX_SAFE_LOGIT) checkable once at load time. Joint attention mixes the img and
    txt streams, so cross-stream scale products are included.
    """
    db, sb = params["double_blocks"], params["single_blocks"]
    pairs = [
        (db["img_attn_qnorm"], db["img_attn_knorm"]),
        (db["txt_attn_qnorm"], db["txt_attn_knorm"]),
        (db["img_attn_qnorm"], db["txt_attn_knorm"]),
        (db["txt_attn_qnorm"], db["img_attn_knorm"]),
        (sb["qnorm"], sb["knorm"]),
    ]

    @jax.jit
    def bound(pairs):
        def mx(a):
            return jnp.max(jnp.abs(a.astype(jnp.float32)))

        return jnp.max(jnp.stack([mx(q) * mx(k) for q, k in pairs]))

    return float(bound(pairs)) * (cfg.head_dim**0.5)


def flux_cond_vec(
    params: Dict[str, Any],
    cfg: FluxStatic,
    timesteps: jnp.ndarray,
    y: jnp.ndarray,
    guidance: Optional[jnp.ndarray] = None,
    tape: Optional[_Tape] = None,
):
    """The per-step conditioning vector (reference flux_model.py:683-691):
    time_in(t_emb) [+ guidance_in(g_emb)] + vector_in(y). Factored out of
    :func:`flux_apply` so the step-cache indicator (sampling.py CacheConfig,
    mode="dynamic") can form the block-0 modulated input without running the
    full model."""
    dtype = cfg.dtype
    tape = tape or _Tape(False, cfg.dequant_linears)
    vec = _mlp_embedder(
        tape, "time_in", params["time_in"], timestep_embedding(timesteps, 256).astype(dtype), dtype
    )
    if cfg.guidance_embed:
        if guidance is None:
            raise ValueError("Didn't get guidance strength for guidance distilled model.")
        vec = vec + _mlp_embedder(
            tape,
            "guidance_in",
            params["guidance_in"],
            timestep_embedding(guidance, 256).astype(dtype),
            dtype,
        )
    return vec + _mlp_embedder(tape, "vector_in", params["vector_in"], y.astype(dtype), dtype)


def flux_cache_indicator(
    params: Dict[str, Any],
    cfg: FluxStatic,
    img: jnp.ndarray,
    timesteps: jnp.ndarray,
    y: jnp.ndarray,
    guidance: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Block-0 img-stream modulated input — the step-cache change indicator.

    The first double block's ``modulate(layer_norm(img_in(img)), shift1, scale1)``
    captures how much both the latent *and* the timestep conditioning moved between
    consecutive denoise steps, without running any of the 57 blocks (the TeaCache
    observation: this tensor's relative L1 drift tracks the drift of the full model
    output). Cost per step: img_in (L·64·hidden), the three conditioning MLPs and one
    modulation linear — ~0.1% of a model eval. Used by sampling.py's
    ``CacheConfig(mode="dynamic")`` scan; a feature the reference does not have
    (its loop always evaluates, flux_pipeline.py:628-651).
    """
    dtype = cfg.dtype
    tape = _Tape(False, cfg.dequant_linears)
    h = tape.lin("img_in", params["img_in"], img.astype(dtype), dtype)
    vec = flux_cond_vec(params, cfg, timesteps, y, guidance, tape=tape)
    # depth-slice block 0 of the stacked tree (every leaf carries a leading depth axis)
    blk0 = jax.tree.map(lambda a: a[0], params["double_blocks"])
    img_mod = tape.lin("img_mod_lin", blk0["img_mod_lin"], silu(vec), dtype)[:, None, :]
    shift1, scale1 = jnp.split(img_mod, 6, axis=-1)[:2]
    return modulate(layer_norm(h), shift1, scale1)


def flux_apply(
    params: Dict[str, Any],
    cfg: FluxStatic,
    img: jnp.ndarray,
    img_ids: jnp.ndarray,
    txt: jnp.ndarray,
    txt_ids: jnp.ndarray,
    timesteps: jnp.ndarray,
    y: jnp.ndarray,
    guidance: Optional[jnp.ndarray] = None,
    collect_amax: bool = False,
    stack_runner=None,
):
    """Full forward (reference ``Flux.forward``, flux_model.py:672-716).

    Args:
      img: (B, L_img, in_channels) packed latents.
      img_ids / txt_ids: (B, L, 3) position ids.
      txt: (B, L_txt, context_in_dim) T5 embeddings.
      timesteps: (B,). y: (B, vec_in_dim) CLIP vector. guidance: (B,) or None.
      collect_amax: also return the pytree of per-linear input amaxes (calibration).
      stack_runner: optional strategy for running the two block stacks —
        ``runner(body, carry, blocks, extras) -> (carry, ys)`` where
        ``body(carry, blk, extras) -> (carry, y)``. None = lax.scan (single-chip
        and dp/tp/sp meshes); :func:`~..parallel.pp.make_pp_runner` pipelines the
        stacks over a "pp" mesh axis.

    Returns:
      (B, L_img, in_channels) prediction — or (pred, amax_tree) when collect_amax.
    """
    if img.ndim != 3 or txt.ndim != 3:
        raise ValueError("Input img and txt tensors must have 3 dimensions.")
    if collect_amax and stack_runner is not None:
        # calibration is a single-chip protocol (pipeline.py freezes scales before
        # mesh serving); a pipelined runner drops the per-block amax outputs
        raise ValueError("collect_amax requires the default scan runner")
    dtype = cfg.dtype
    tape = _Tape(collect_amax, cfg.dequant_linears)
    txt_len = txt.shape[1]

    img = tape.lin("img_in", params["img_in"], img.astype(dtype), dtype)
    vec = flux_cond_vec(params, cfg, timesteps, y, guidance, tape=tape)
    txt = tape.lin("txt_in", params["txt_in"], txt.astype(dtype), dtype)

    # rope tables over the joint (txt, img) sequence, fp32, shaped (B, L, 1, H/2)
    ids = jnp.concatenate([txt_ids, img_ids], axis=1)
    cos, sin = embed_nd_cos_sin(ids, cfg.axes_dim, cfg.theta)
    cos, sin = cos[:, :, None, :], sin[:, :, None, :]

    vec_silu = silu(vec)  # every Modulation starts with SiLU(vec) (flux_model.py:252)

    # Block-stack bodies take the per-example conditioning ("extras") explicitly so a
    # stack_runner can re-slice it per microbatch (parallel/pp.py pipelines the stacks
    # over a "pp" mesh axis); the default runner is the plain lax.scan used everywhere
    # else, with extras closed over exactly as before.
    extras = (vec_silu, cos, sin)

    def double_body(carry, blk, ex):
        vs, cos_e, sin_e = ex
        img, txt = carry
        block_tape = _Tape(collect_amax, cfg.dequant_linears)
        img, txt = _double_block(cfg, blk, img, txt, vs, cos_e, sin_e, block_tape)
        return (img, txt), (block_tape.amaxes if collect_amax else None)

    def single_body(x, blk, ex):
        vs, cos_e, sin_e = ex
        block_tape = _Tape(collect_amax, cfg.dequant_linears)
        x = _single_block(cfg, blk, x, vs, cos_e, sin_e, block_tape)
        return x, (block_tape.amaxes if collect_amax else None)

    def _scan_runner(body, carry, blocks, ex):
        f = lambda c, b: body(c, b, ex)
        if cfg.remat:
            # per-block rematerialization: the scan stores only each block's INPUT
            # for the backward pass and recomputes the block body (parallel/train.py)
            f = jax.checkpoint(f)
        return jax.lax.scan(f, carry, blocks)

    runner = stack_runner or _scan_runner

    (img, txt), double_amaxes = runner(
        double_body, (img, txt), params["double_blocks"], extras
    )

    x = jnp.concatenate([txt, img], axis=1)

    x, single_amaxes = runner(single_body, x, params["single_blocks"], extras)

    img = x[:, txt_len:]

    # final adaLN projection (reference LastLayer, flux_model.py:488-503); chunk order
    # is (shift, scale) — note: *not* the Modulation ordering.
    fl = params["final_layer"]
    mod = tape.lin("final_layer.adaln", fl["adaln"], vec_silu, dtype)
    f_shift, f_scale = jnp.split(mod[:, None, :], 2, axis=-1)
    img = modulate(layer_norm(img), f_shift, f_scale)
    img = tape.lin("final_layer.linear", fl["linear"], img, dtype)

    if collect_amax:
        amaxes = dict(tape.amaxes)
        amaxes["double_blocks"] = double_amaxes  # each leaf: (depth,)
        amaxes["single_blocks"] = single_amaxes
        return img, amaxes
    return img
