"""LoRA hot-load/unload for the flow transformer, pure-functional.

Reimplements the reference's ``lora_loading.py`` for the pytree world:

- **two input formats** (lora_loading.py:580-605): diffusers checkpoints
  (``transformer.*`` keys, converted by :func:`convert_diffusers_to_bfl` — including the
  q/k/v(/mlp) concatenation into the fused qkv / linear1 layers with zero-fill for
  missing members, lora_loading.py:142-401) and kohya (``lora_unet_*``, string remap,
  :func:`convert_kohya_to_bfl`, lora_loading.py:435-463);
- **delta math** (lora_loading.py:509-544): fp32 ``scale · B @ A`` with alpha/rank
  scaling and the uneven-rank chunked fuse;
- **fuse into quantized weights** (lora_loading.py:615-689): dequantize the fp8/int8
  slice (``float8_data · scale_reciprocal``), add the delta, re-quantize deriving a
  fresh weight scale while keeping the tuned input scale (float8_quantize.py:209-212);
- **registry semantics** (flux_model.py:621-670): dedupe by path/name, rescale =
  unfuse at the old scale then fuse at the new one; unfuse = fuse at ``-scale`` (same
  arithmetic as the reference's subtract path).

Because blocks are depth-stacked for ``lax.scan``, a key like
``double_blocks.3.img_attn.qkv`` addresses slice 3 of one stacked Linear leaf; updates
go through ``.at[i].set`` so only that slice requantizes.
"""

from __future__ import annotations

import dataclasses
import re
from typing import Any, Dict, List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from .models.flux import FluxStatic
from .utils.logging import logger
from .ops.quant import (
    Linear,
    dequantize_kernel,
    quantize_linear_fp8,
    quantize_linear_int4,
    quantize_linear_int8,
    with_kernel,
)
from .utils.safetensors_io import load_safetensors

_PATH_SPLIT = re.compile(r"/|\\")


@dataclasses.dataclass
class LoraWeights:
    """reference LoraWeights (lora_loading.py:21-32)."""

    weights: Dict[str, np.ndarray]
    path: str
    name: Optional[str] = None
    scale: float = 1.0

    def __post_init__(self):
        if not self.name:
            self.name = _PATH_SPLIT.split(str(self.path))[-1]


# ---------------------------------------------------------------- format conversion


def _move(out, sd, src_stub: str, dst_stub: str):
    """Move every key sharing src_stub's module prefix (lora_A/B/alpha variants) into
    the BFL namespace (reference convert_if_lora_exists, lora_loading.py:42-60)."""
    stub = src_stub.replace(".weight", "")
    hits = [k for k in list(sd.keys()) if stub in k]
    for k in hits:
        out[k.replace(stub, dst_stub.replace(".weight", ""))] = sd.pop(k)


def _pop_pair(sd, prefix: str):
    a = sd.pop(f"{prefix}.lora_A.weight", None)
    b = sd.pop(f"{prefix}.lora_B.weight", None)
    return a, b


def _zeros_like_pair(shape_a, shape_b, dtype):
    return np.zeros(shape_a, dtype), np.zeros(shape_b, dtype)


def convert_diffusers_to_bfl(
    sd: Dict[str, np.ndarray],
    num_layers: int = 19,
    num_single_layers: int = 38,
    has_guidance: bool = True,
    prefix: str = "transformer.",
) -> Dict[str, np.ndarray]:
    """diffusers ``transformer.*`` LoRA → BFL key space
    (reference lora_loading.py:62-432)."""
    sd = dict(sd)
    out: Dict[str, np.ndarray] = {}

    _move(out, sd, f"{prefix}time_text_embed.timestep_embedder.linear_1.weight", "time_in.in_layer.weight")
    _move(out, sd, f"{prefix}time_text_embed.timestep_embedder.linear_2.weight", "time_in.out_layer.weight")
    _move(out, sd, f"{prefix}time_text_embed.text_embedder.linear_1.weight", "vector_in.in_layer.weight")
    _move(out, sd, f"{prefix}time_text_embed.text_embedder.linear_2.weight", "vector_in.out_layer.weight")
    if has_guidance:
        _move(out, sd, f"{prefix}time_text_embed.guidance_embedder.linear_1.weight", "guidance_in.in_layer.weight")
        _move(out, sd, f"{prefix}time_text_embed.guidance_embedder.linear_2.weight", "guidance_in.out_layer.weight")
    _move(out, sd, f"{prefix}context_embedder.weight", "txt_in.weight")
    _move(out, sd, f"{prefix}x_embedder.weight", "img_in.weight")

    for i in range(num_layers):
        bp = f"{prefix}transformer_blocks.{i}."
        _move(out, sd, f"{bp}norm1.linear.weight", f"double_blocks.{i}.img_mod.lin.weight")
        _move(out, sd, f"{bp}norm1_context.linear.weight", f"double_blocks.{i}.txt_mod.lin.weight")

        # fused qkv: concat q/k/v lora factors along the out axis of B and the rank
        # axis of A stays per-member → concat along dim 0 of both, zero-filling any
        # missing member (lora_loading.py:142-260)
        for members, target in (
            (("to_q", "to_k", "to_v"), f"double_blocks.{i}.img_attn.qkv"),
            (("add_q_proj", "add_k_proj", "add_v_proj"), f"double_blocks.{i}.txt_attn.qkv"),
        ):
            pairs = {m: _pop_pair(sd, f"{bp}attn.{m}") for m in members}
            present = [p for p in pairs.values() if p[0] is not None]
            if present:
                sa, sb = present[0][0].shape, present[0][1].shape
                dt = present[0][0].dtype
                a_parts, b_parts = [], []
                for m in members:
                    a, b = pairs[m]
                    if a is None:
                        a, b = _zeros_like_pair(sa, sb, dt)
                    a_parts.append(np.asarray(a))
                    b_parts.append(np.asarray(b))
                out[f"{target}.lora_A.weight"] = np.concatenate(a_parts, axis=0)
                out[f"{target}.lora_B.weight"] = np.concatenate(b_parts, axis=0)

        _move(out, sd, f"{bp}attn.norm_q.weight", f"double_blocks.{i}.img_attn.norm.query_norm.scale")
        _move(out, sd, f"{bp}attn.norm_k.weight", f"double_blocks.{i}.img_attn.norm.key_norm.scale")
        _move(out, sd, f"{bp}attn.norm_added_q.weight", f"double_blocks.{i}.txt_attn.norm.query_norm.scale")
        _move(out, sd, f"{bp}attn.norm_added_k.weight", f"double_blocks.{i}.txt_attn.norm.key_norm.scale")
        _move(out, sd, f"{bp}ff.net.0.proj.weight", f"double_blocks.{i}.img_mlp.0.weight")
        _move(out, sd, f"{bp}ff.net.2.weight", f"double_blocks.{i}.img_mlp.2.weight")
        _move(out, sd, f"{bp}ff_context.net.0.proj.weight", f"double_blocks.{i}.txt_mlp.0.weight")
        _move(out, sd, f"{bp}ff_context.net.2.weight", f"double_blocks.{i}.txt_mlp.2.weight")
        _move(out, sd, f"{bp}attn.to_out.0.weight", f"double_blocks.{i}.img_attn.proj.weight")
        _move(out, sd, f"{bp}attn.to_add_out.weight", f"double_blocks.{i}.txt_attn.proj.weight")

    for i in range(num_single_layers):
        bp = f"{prefix}single_transformer_blocks.{i}."
        _move(out, sd, f"{bp}norm.linear.weight", f"single_blocks.{i}.modulation.lin.weight")
        # fused linear1 = q|k|v|mlp_in (lora_loading.py:330-401)
        members = ("attn.to_q", "attn.to_k", "attn.to_v", "proj_mlp")
        pairs = {m: _pop_pair(sd, f"{bp}{m}") for m in members}
        present = [p for p in pairs.values() if p[0] is not None]
        if present:
            sa, sb = present[0][0].shape, present[0][1].shape
            dt = present[0][0].dtype
            # linear1's members are HETEROGENEOUS: q/k/v out = hidden but proj_mlp
            # out = 4·hidden, so missing members must zero-fill with THEIR out dim —
            # the reference reuses the last present member's shape
            # (lora_loading.py:375-401), which makes an attention-only (or mlp-only)
            # LoRA produce a mis-sized lora_B that crashes the fuse. Infer hidden
            # from whichever member is present.
            hidden = (
                pairs["proj_mlp"][1].shape[0] // 4
                if pairs["attn.to_q"][0] is None
                and pairs["attn.to_k"][0] is None
                and pairs["attn.to_v"][0] is None
                else next(
                    pairs[m][1].shape[0]
                    for m in ("attn.to_q", "attn.to_k", "attn.to_v")
                    if pairs[m][0] is not None
                )
            )
            a_parts, b_parts = [], []
            for m in members:
                a, b = pairs[m]
                if a is None:
                    out_dim = 4 * hidden if m == "proj_mlp" else hidden
                    a, b = _zeros_like_pair(sa, (out_dim,) + sb[1:], dt)
                a_parts.append(np.asarray(a))
                b_parts.append(np.asarray(b))
            out[f"single_blocks.{i}.linear1.lora_A.weight"] = np.concatenate(a_parts, axis=0)
            out[f"single_blocks.{i}.linear1.lora_B.weight"] = np.concatenate(b_parts, axis=0)
        _move(out, sd, f"{bp}proj_out.weight", f"single_blocks.{i}.linear2.weight")

    _move(out, sd, f"{prefix}proj_out.weight", "final_layer.linear.weight")
    _move(out, sd, f"{prefix}norm_out.linear.weight", "final_layer.adaLN_modulation.1.weight")
    return out


def convert_kohya_to_bfl(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """kohya ``lora_unet_*`` LoRA → BFL key space (reference lora_loading.py:435-463)."""
    return {
        k.replace("lora_unet_", "")
        .replace("double_blocks_", "double_blocks.")
        .replace("single_blocks_", "single_blocks.")
        .replace("_img_attn_", ".img_attn.")
        .replace("_txt_attn_", ".txt_attn.")
        .replace("_img_mod_", ".img_mod.")
        .replace("_txt_mod_", ".txt_mod.")
        .replace("_img_mlp_", ".img_mlp.")
        .replace("_txt_mlp_", ".txt_mlp.")
        .replace("_linear1", ".linear1")
        .replace("_linear2", ".linear2")
        .replace("_modulation_", ".modulation.")
        .replace("lora_up", "lora_B")
        .replace("lora_down", "lora_A"): v
        for k, v in sd.items()
        if "lora" in k
    }


def resolve_lora_state_dict(
    sd: Dict[str, np.ndarray], has_guidance: bool = True
) -> Tuple[List[str], Dict[str, np.ndarray]]:
    """Normalize either format into BFL key space and list the touched modules
    (reference lora_loading.py:580-605)."""
    if any(k.startswith("transformer.") for k in sd):
        sd = convert_diffusers_to_bfl(sd, 19, 38, has_guidance=has_guidance)
    else:
        sd = convert_kohya_to_bfl(sd)
    return _module_keys(sd), sd


# ------------------------------------------------------------------------ delta math


def calculate_lora_delta(
    lora_A: np.ndarray,
    lora_B: np.ndarray,
    alpha: Optional[float],
    lora_scale: float = 1.0,
) -> np.ndarray:
    """fp32 ``scale · B @ A`` with alpha/rank scaling + uneven-rank chunked fuse
    (reference calculate_lora_weight, lora_loading.py:509-544). Torch layout in,
    returns (out, in)."""
    A = np.asarray(lora_A, np.float32)
    B = np.asarray(lora_B, np.float32)
    rank = B.shape[1]
    # alpha ships as a 0-d scalar in most files but (1,) in some exporters
    alpha = rank if alpha is None else float(np.asarray(alpha).reshape(-1)[0])
    if alpha != rank:
        A = A * (alpha / rank)
    if A.shape[0] != rank:  # uneven rank (fused-qkv concat): chunk A and sum
        rank_diff = A.shape[0] // rank
        delta = np.zeros((B.shape[0], A.shape[1]), np.float32)
        for chunk in np.split(A, rank_diff, axis=0):
            delta = delta + lora_scale * (B @ chunk)
        return delta
    return lora_scale * (B @ A)


def _get_lora_factors(sd: Dict[str, np.ndarray], key: str):
    a = sd.get(f"{key}.lora_A.weight")
    b = sd.get(f"{key}.lora_B.weight")
    alpha = sd.get(f"{key}.alpha")
    if a is None or b is None:
        return None
    return a, b, alpha


# -------------------------------------------------------------------- tree addressing

_STACKED_LEAF_BY_BFL = {
    "img_mod.lin": "img_mod_lin",
    "txt_mod.lin": "txt_mod_lin",
    "img_attn.qkv": "img_attn_qkv",
    "img_attn.proj": "img_attn_proj",
    "txt_attn.qkv": "txt_attn_qkv",
    "txt_attn.proj": "txt_attn_proj",
    "img_mlp.0": "img_mlp_0",
    "img_mlp.2": "img_mlp_2",
    "txt_mlp.0": "txt_mlp_0",
    "txt_mlp.2": "txt_mlp_2",
    "linear1": "linear1",
    "linear2": "linear2",
    "modulation.lin": "mod_lin",
}
_TOP_PATHS = {
    "img_in": ("img_in",),
    "txt_in": ("txt_in",),
    "time_in.in_layer": ("time_in", "in_layer"),
    "time_in.out_layer": ("time_in", "out_layer"),
    "vector_in.in_layer": ("vector_in", "in_layer"),
    "vector_in.out_layer": ("vector_in", "out_layer"),
    "guidance_in.in_layer": ("guidance_in", "in_layer"),
    "guidance_in.out_layer": ("guidance_in", "out_layer"),
    "final_layer.linear": ("final_layer", "linear"),
    "final_layer.adaLN_modulation.1": ("final_layer", "adaln"),
}


def _requantize_slice(lin: Linear, idx: Optional[int], new_kernel: jnp.ndarray) -> Linear:
    """Write a fused float kernel back into a (possibly stacked, possibly quantized)
    Linear, re-deriving the weight scale for that slice only while keeping the tuned
    input scale (reference set_weight_tensor, float8_quantize.py:209-212)."""
    if lin.kind == "float":
        if idx is None:
            return dataclasses.replace(lin, kernel=new_kernel.astype(lin.kernel.dtype))
        return dataclasses.replace(
            lin, kernel=lin.kernel.at[idx].set(new_kernel.astype(lin.kernel.dtype))
        )
    if idx is None:
        return with_kernel(lin, new_kernel)
    qfn = {
        "fp8": quantize_linear_fp8,
        "int8": quantize_linear_int8,
        "int4": quantize_linear_int4,
    }[lin.kind]
    fresh = qfn(new_kernel, None if lin.bias is None else lin.bias[idx])
    return dataclasses.replace(
        lin,
        q=lin.q.at[idx].set(fresh.q),
        w_scale=lin.w_scale.at[idx].set(fresh.w_scale),
        w_scale_inv=lin.w_scale_inv.at[idx].set(fresh.w_scale_inv),
    )


# jitted per (leaf shape, kind): the dequant f32 intermediate and the .at[idx].set
# copy stay inside one executable instead of N eager tunnel dispatches per touched
# slice (~32ms floor each, CLAUDE.md) with N full-leaf copies at 12B scale.
@jax.jit
def _fuse_slice_jit(lin: Linear, idx, delta_T):
    return _requantize_slice(lin, idx, _dequant_slice(lin, idx) + delta_T)


@jax.jit
def _fuse_whole_jit(lin: Linear, delta_T):
    return _requantize_slice(lin, None, _dequant_slice(lin, None) + delta_T)


def _dequant_slice(lin: Linear, idx: Optional[int]) -> jnp.ndarray:
    """fp32 (in, out) kernel of one slice (reference extract_weight_from_linear,
    lora_loading.py:615-631)."""
    sliced = lin if idx is None else jax.tree.map(lambda x: x[idx], lin)
    return dequantize_kernel(sliced)


# ------------------------------------------------------------------------- fuse/unfuse


def fuse_lora(
    params: Dict[str, Any],
    cfg: FluxStatic,
    lora_sd: Dict[str, np.ndarray],
    keys: List[str],
    lora_scale: float,
) -> Dict[str, Any]:
    """Fuse every LoRA-touched module: W ← W + scaleᐧB@A (reference
    apply_lora_to_model, lora_loading.py:634-693). Negative scale unfuses."""
    from .utils.checkpoint import (
        grouped_qkv_permutation,
        linear2_in_permutation,
        qkv_out_permutation,
    )

    qkv_perm = qkv_out_permutation(cfg.hidden_size, cfg.head_dim)
    lin1_perm = qkv_out_permutation(cfg.hidden_size, cfg.head_dim, extra=cfg.mlp_hidden)
    grouped = cfg.fused_layout == "grouped"
    if grouped:
        # under tensor parallelism the runtime layout composes the rope
        # deinterleave with the shard-time head-major regroup
        # (utils/checkpoint.py relayout_flux_tree): perm_total = flat[grouped]
        qkv_perm = qkv_perm[grouped_qkv_permutation(cfg.hidden_size, cfg.head_dim)]
        lin1_perm = lin1_perm[
            grouped_qkv_permutation(cfg.hidden_size, cfg.head_dim, extra=cfg.mlp_hidden)
        ]
    lin2_perm = linear2_in_permutation(cfg.hidden_size, cfg.head_dim, cfg.mlp_hidden)

    params = dict(params)
    stacked_updates: Dict[str, Linear] = {}
    for key in keys:
        factors = _get_lora_factors(lora_sd, key)
        if factors is None:
            continue  # plain-weight keys (e.g. qk-norm scales) are skipped, like the
            # reference's get_lora_for_key → None path (lora_loading.py:686)
        delta_T = jnp.asarray(calculate_lora_delta(*factors, lora_scale=lora_scale).T)
        # LoRA deltas arrive in the checkpoint's interleaved rope layout; runtime
        # weights are deinterleaved (utils/checkpoint.py) — permute to match.
        if key.endswith((".img_attn.qkv", ".txt_attn.qkv")) and delta_T.shape[-1] == 3 * cfg.hidden_size:
            delta_T = delta_T[..., qkv_perm]
        elif key.endswith(".linear1") and delta_T.shape[-1] == 3 * cfg.hidden_size + cfg.mlp_hidden:
            delta_T = delta_T[..., lin1_perm]
        elif (
            grouped
            and key.endswith(".linear2")
            and delta_T.shape[-2] == cfg.hidden_size + cfg.mlp_hidden
        ):
            # linear2's grouped-runtime IN-axis is head-grouped; the flat layout
            # matches the checkpoint order and needs no permutation
            delta_T = delta_T[..., lin2_perm, :]

        m = re.match(r"(double_blocks|single_blocks)\.(\d+)\.(.+)", key)
        if m:
            stack_name, idx, bfl_leaf = m.group(1), int(m.group(2)), m.group(3)
            leaf_name = _STACKED_LEAF_BY_BFL.get(bfl_leaf)
            if leaf_name is None:
                continue
            lin = stacked_updates.get(f"{stack_name}.{leaf_name}")
            if lin is None:
                lin = params[stack_name][leaf_name]
            stacked_updates[f"{stack_name}.{leaf_name}"] = _fuse_slice_jit(
                lin, jnp.int32(idx), delta_T
            )
        else:
            path = _TOP_PATHS.get(key)
            if path is None:
                continue
            node = params
            for p in path[:-1]:
                node = node[p]
                if node is None:  # e.g. guidance_in on schnell (no guidance embed)
                    break
            if node is None:
                continue
            lin = node[path[-1]]
            if lin is None or not isinstance(lin, Linear):
                continue
            # rebuild nested dicts immutably
            params = _set_path(params, path, _fuse_whole_jit(lin, delta_T))

    for flat, lin in stacked_updates.items():
        stack_name, leaf_name = flat.split(".")
        params[stack_name] = {**params[stack_name], leaf_name: lin}
    return params


def _set_path(tree: Dict[str, Any], path: Tuple[str, ...], value) -> Dict[str, Any]:
    if len(path) == 1:
        return {**tree, path[0]: value}
    return {**tree, path[0]: _set_path(tree[path[0]], path[1:], value)}


# ----------------------------------------------------------------- pipeline registry


def get_lora_weights(lora_path) -> Tuple[Union[Dict, LoraWeights], bool]:
    """reference lora_loading.py:608-612."""
    if isinstance(lora_path, (dict, LoraWeights)):
        return lora_path, True
    return load_safetensors(str(lora_path)), False


def _module_keys(sd: Dict[str, np.ndarray]) -> List[str]:
    return sorted(
        {
            k.replace(".lora_A.weight", "").replace(".lora_B.weight", "")
            .replace(".lora_A", "").replace(".lora_B", "").replace(".alpha", "")
            for k in sd
        }
    )


def _needs_conversion(sd: Dict[str, np.ndarray]) -> bool:
    return any(k.startswith(("transformer.", "lora_unet_")) for k in sd)


def _resolve(lora_input, has_guidance: bool):
    """→ (module keys, BFL-space state dict). Pre-resolved dicts/LoraWeights pass
    through (reference apply_lora_to_model's three branches, lora_loading.py:634-676) —
    but unlike the reference, a dict still in diffusers/kohya key space is detected and
    converted rather than silently fusing nothing."""
    weights, already_loaded = get_lora_weights(lora_input)
    if isinstance(weights, LoraWeights):
        weights = weights.weights
    if _needs_conversion(weights):
        return resolve_lora_state_dict(weights, has_guidance)
    return _module_keys(weights), weights


def pipeline_load_lora(
    params: Dict[str, Any],
    cfg: FluxStatic,
    registry: List[LoraWeights],
    lora_path,
    scale: float,
    name: Optional[str] = None,
) -> Tuple[Dict[str, Any], List[LoraWeights]]:
    """Flux.load_lora semantics (flux_model.py:631-653): dedupe by path/name; same
    scale → no-op; different scale → unfuse old, fuse new."""
    ident = lora_path if isinstance(lora_path, str) else (name or "<dict>")
    existing = next((l for l in registry if l.path == ident or l.name == ident), None)
    if existing is not None:
        if existing.scale == scale:
            logger.warning(f"Lora {existing.name} already loaded with same scale - ignoring!")
            return params, registry
        keys = _module_keys(existing.weights)
        params = fuse_lora(params, cfg, existing.weights, keys, -existing.scale)
        params = fuse_lora(params, cfg, existing.weights, keys, scale)
        existing.scale = scale
        return params, registry
    keys, sd = _resolve(lora_path, cfg.guidance_embed)
    logger.info(f"Loading LoRA weights for {ident} (scale={scale}, {len(keys)} modules)")
    params = fuse_lora(params, cfg, sd, keys, scale)
    registry = registry + [LoraWeights(sd, ident, name, scale)]
    logger.success("Lora applied")
    return params, registry


def pipeline_unload_lora(
    params: Dict[str, Any],
    cfg: FluxStatic,
    registry: List[LoraWeights],
    path_or_identifier: str,
) -> Tuple[Dict[str, Any], List[LoraWeights]]:
    """Flux.unload_lora semantics (flux_model.py:655-670)."""
    for i, lora in enumerate(registry):
        if lora.path == path_or_identifier or lora.name == path_or_identifier:
            keys = _module_keys(lora.weights)
            params = fuse_lora(params, cfg, lora.weights, keys, -lora.scale)
            logger.info("Successfully removed lora from module.")
            return params, registry[:i] + registry[i + 1 :]
    logger.warning(
        f"Couldn't remove lora {path_or_identifier} as it wasn't found fused to the model!"
    )
    return params, registry


# --------------------------------------------------- trainable adapters (QLoRA-style)
#
# The reference can only CONSUME LoRAs (fuse into weights); it has no way to make one.
# With a train step in the framework (parallel/train.py), producing LoRAs becomes part
# of the surface — and on a 16GB-HBM chip it is the only way to train flux-dev at all:
# full fine-tuning needs ~72GB (bf16 params+grads+Adam moments) while a frozen
# int8/fp8/int4 base (6-12GB) + bf16 rank-r adapters (~100MB at r=16) + rematerialized
# activations fits one chip. This is the QLoRA recipe mapped onto our leaves: the
# quantized base stays byte-identical, adapters ride the Linear.lora_a/lora_b fields
# (applied as an additive side branch in ops/quant.py linear_apply), and training
# forwards run the differentiable dequantize path (FluxStatic.dequant_linears).
#
# Trained adapters export to a standard kohya-format ``lora_unet_*`` safetensors dict
# (convert_kohya_to_bfl's input space, which the reference also loads,
# lora_loading.py:435-463) — so a LoRA trained here serves here AND on the reference.

DEFAULT_ADAPTER_TARGETS: Dict[str, Tuple[str, ...]] = {
    "double_blocks": (
        "img_attn_qkv", "txt_attn_qkv", "img_attn_proj", "txt_attn_proj",
        "img_mlp_0", "img_mlp_2", "txt_mlp_0", "txt_mlp_2",
    ),
    "single_blocks": ("linear1", "linear2"),
}


def init_lora_adapters(
    params: Dict[str, Any],
    rank: int,
    key,
    targets: Optional[Dict[str, Tuple[str, ...]]] = None,
    dtype=jnp.bfloat16,
) -> Dict[str, Any]:
    """→ adapter pytree ``{stack: {leaf: {"a": (D, in, r), "b": (D, r, out)}}}``.

    A is kaiming-style normal (std 1/√in), B zeros — so the merged model is exactly
    the base model at step 0 (standard LoRA init). The alpha/rank scale is folded
    into the parametrization (runtime applies ``(x@A)@B`` unscaled; export writes
    ``alpha=rank`` so every consumer applies scale 1.0). Stacked along the block
    depth axis, adapters unstack through the same ``lax.scan`` as the base leaves."""
    targets = DEFAULT_ADAPTER_TARGETS if targets is None else targets
    adapters: Dict[str, Any] = {}
    for stack, names in targets.items():
        sub = {}
        for name in names:
            lin = params[stack][name]
            depth = (lin.kernel if lin.kernel is not None else lin.q).shape[0]
            in_f, out_f = lin.in_features, lin.out_features
            key, ka = jax.random.split(key)
            a = jax.random.normal(ka, (depth, in_f, rank), jnp.float32) * (in_f**-0.5)
            sub[name] = {
                "a": a.astype(dtype),
                "b": jnp.zeros((depth, rank, out_f), dtype),
            }
        adapters[stack] = sub
    return adapters


def merge_lora_adapters(params: Dict[str, Any], adapters: Dict[str, Any]) -> Dict[str, Any]:
    """Attach adapters onto the matching Linear leaves (pure; base arrays shared, not
    copied). The merged tree runs through flux_apply like any other — linear_apply
    adds the low-rank branch wherever lora_a is set."""
    out = dict(params)
    for stack, sub in adapters.items():
        blk = dict(out[stack])
        for name, ab in sub.items():
            blk[name] = dataclasses.replace(blk[name], lora_a=ab["a"], lora_b=ab["b"])
        out[stack] = blk
    return out


def export_lora_adapters(
    adapters: Dict[str, Any], cfg: FluxStatic
) -> Dict[str, np.ndarray]:
    """Trained adapters → kohya-format (``lora_unet_*``) state dict.

    Runtime weights live in the deinterleaved (and, under tp, head-major grouped)
    rope layout while LoRA files are interchange artifacts in the checkpoint's
    interleaved flat layout — this inverts exactly the permutations fuse_lora
    applies at load (qkv/linear1 out-axis; linear2 in-axis when grouped), so
    load(export(adapters)) reproduces the trained model bit-for-bit modulo requant.

    Keys/layouts are torch-convention: ``lora_down.weight`` (r, in),
    ``lora_up.weight`` (out, r), ``alpha`` = rank (scale 1.0)."""
    from .utils.checkpoint import (
        grouped_qkv_permutation,
        linear2_in_permutation,
        qkv_out_permutation,
    )

    qkv_perm = qkv_out_permutation(cfg.hidden_size, cfg.head_dim)
    lin1_perm = qkv_out_permutation(cfg.hidden_size, cfg.head_dim, extra=cfg.mlp_hidden)
    grouped = cfg.fused_layout == "grouped"
    if grouped:
        qkv_perm = qkv_perm[grouped_qkv_permutation(cfg.hidden_size, cfg.head_dim)]
        lin1_perm = lin1_perm[
            grouped_qkv_permutation(cfg.hidden_size, cfg.head_dim, extra=cfg.mlp_hidden)
        ]
    inv_qkv = np.argsort(qkv_perm)
    inv_lin1 = np.argsort(lin1_perm)
    inv_lin2_in = (
        np.argsort(linear2_in_permutation(cfg.hidden_size, cfg.head_dim, cfg.mlp_hidden))
        if grouped
        else None
    )

    bfl_by_leaf = {v: k for k, v in _STACKED_LEAF_BY_BFL.items()}
    sd: Dict[str, np.ndarray] = {}
    for stack, sub in adapters.items():
        for name, ab in sub.items():
            a = np.asarray(jnp.asarray(ab["a"], jnp.float32))  # (D, in, r)
            b = np.asarray(jnp.asarray(ab["b"], jnp.float32))  # (D, r, out)
            if name in ("img_attn_qkv", "txt_attn_qkv"):
                b = b[..., inv_qkv]
            elif name == "linear1":
                b = b[..., inv_lin1]
            elif name == "linear2" and inv_lin2_in is not None:
                a = a[:, inv_lin2_in, :]
            bfl_leaf = bfl_by_leaf[name].replace(".", "_")
            for i in range(a.shape[0]):
                stem = f"lora_unet_{stack}_{i}_{bfl_leaf}"
                sd[f"{stem}.lora_down.weight"] = np.ascontiguousarray(a[i].T)  # (r, in)
                sd[f"{stem}.lora_up.weight"] = np.ascontiguousarray(b[i].T)  # (out, r)
                sd[f"{stem}.alpha"] = np.float32(a.shape[-1])
    return sd


def save_lora_adapters(path: str, adapters: Dict[str, Any], cfg: FluxStatic) -> None:
    """Export + write to a safetensors file any FLUX LoRA consumer can load."""
    from .utils.safetensors_io import save_safetensors

    save_safetensors(str(path), export_lora_adapters(adapters, cfg))
