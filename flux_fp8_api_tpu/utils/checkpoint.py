"""Checkpoint loading/saving: BFL safetensors → param pytrees, prequantized export.

Replaces the reference's meta-device + ``load_state_dict(assign=True)`` protocol
(util.py:240-256, flux_model.py:718-734, float8_quantize.py:91-193) with explicit key
mapping into the framework's pytree layout:

- torch linear weights (out, in) transpose to JAX (in, out) kernels;
- torch conv weights OIHW transpose to HWIO (NHWC model);
- per-block tensors stack along a leading depth axis (lax.scan layout);
- reference *prequantized* checkpoints (``float8_data`` + scale buffers per F8Linear)
  are detected and loaded directly into fp8 Linear leaves;
- our own prequantized export writes the stacked pytree as one safetensors file with a
  ``linears`` metadata map (~50% smaller than bf16 and skips calibration on reload,
  matching the reference's prequantized workflow, README.md:186-192).
"""

from __future__ import annotations

import json
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.flux import FluxStatic, init_flux_params
from ..ops.quant import Linear
from ..ops.rope import deinterleave_permutation
from ..utils.config import AutoEncoderParams
from .safetensors_io import SafetensorsFile, save_safetensors

# ------------------------------------------------------------------ flux (BFL format)

_DOUBLE_KEYMAP = {
    "img_mod_lin": "img_mod.lin",
    "txt_mod_lin": "txt_mod.lin",
    "img_attn_qkv": "img_attn.qkv",
    "img_attn_proj": "img_attn.proj",
    "txt_attn_qkv": "txt_attn.qkv",
    "txt_attn_proj": "txt_attn.proj",
    "img_mlp_0": "img_mlp.0",
    "img_mlp_2": "img_mlp.2",
    "txt_mlp_0": "txt_mlp.0",
    "txt_mlp_2": "txt_mlp.2",
}
_DOUBLE_NORMMAP = {
    "img_attn_qnorm": "img_attn.norm.query_norm.scale",
    "img_attn_knorm": "img_attn.norm.key_norm.scale",
    "txt_attn_qnorm": "txt_attn.norm.query_norm.scale",
    "txt_attn_knorm": "txt_attn.norm.key_norm.scale",
}
_SINGLE_KEYMAP = {
    "linear1": "linear1",
    "linear2": "linear2",
    "mod_lin": "modulation.lin",
}
_SINGLE_NORMMAP = {
    "qnorm": "norm.query_norm.scale",
    "knorm": "norm.key_norm.scale",
}
_TOP_LINEARS = {
    "img_in": "img_in",
    "txt_in": "txt_in",
}
_MLP_EMBEDDERS = ("time_in", "vector_in", "guidance_in")


def _get_linear(sd, torch_prefix: str, dtype) -> Linear:
    """Load one linear; handles both float and reference-prequantized layouts."""
    f8_key = f"{torch_prefix}.float8_data"
    if f8_key in sd:
        # reference prequantized F8Linear serialization (float8_quantize.py:91-193)
        q = jnp.asarray(np.asarray(sd.get(f8_key)).transpose(1, 0))  # (out,in)→(in,out)
        w_scale = jnp.asarray(np.asarray(sd.get(f"{torch_prefix}.scale")), jnp.float32).reshape(())
        bias_key = f"{torch_prefix}.bias"
        # SafetensorsFile.get raises on missing keys (unlike dict.get) — guard for
        # bias-less exported variants
        bias = sd.get(bias_key) if bias_key in sd else None
        in_scale_key = f"{torch_prefix}.input_scale"
        has_in = in_scale_key in sd
        in_scale = (
            jnp.asarray(np.asarray(sd.get(in_scale_key)), jnp.float32).reshape(())
            if has_in
            else jnp.float32(1.0)
        )
        return Linear(
            q=q,
            w_scale=w_scale,
            w_scale_inv=1.0 / w_scale,
            in_scale=in_scale,
            in_scale_inv=1.0 / in_scale,
            bias=jnp.asarray(np.asarray(bias), dtype) if bias is not None else None,
            kind="fp8",
        )
    w = np.asarray(sd.get(f"{torch_prefix}.weight"))
    bias_key = f"{torch_prefix}.bias"
    b = np.asarray(sd.get(bias_key)) if bias_key in sd else None
    return Linear(
        kernel=jnp.asarray(w.transpose(1, 0), dtype),
        bias=jnp.asarray(b, dtype) if b is not None else None,
        kind="float",
    )


def load_flux_checkpoint(
    path_or_file, cfg: FluxStatic, dtype: Optional[jnp.dtype] = None
) -> Dict[str, Any]:
    """BFL flux safetensors → stacked param pytree (reference load_flow_model,
    util.py:240-256). Detects reference-prequantized files automatically. Accepts a
    path or an already-open SafetensorsFile (one header parse for the multi-GB
    file, shared with the caller's format detection)."""
    dtype = dtype or cfg.dtype
    sd = _as_stf(path_or_file)

    def stack(leaves):
        return jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *leaves)

    doubles = []
    for i in range(cfg.depth):
        p = f"double_blocks.{i}."
        blk: Dict[str, Any] = {
            ours: _get_linear(sd, p + theirs, dtype) for ours, theirs in _DOUBLE_KEYMAP.items()
        }
        for ours, theirs in _DOUBLE_NORMMAP.items():
            blk[ours] = jnp.asarray(np.asarray(sd.get(p + theirs)), dtype)
        doubles.append(blk)

    singles = []
    for i in range(cfg.depth_single_blocks):
        p = f"single_blocks.{i}."
        blk = {
            ours: _get_linear(sd, p + theirs, dtype) for ours, theirs in _SINGLE_KEYMAP.items()
        }
        for ours, theirs in _SINGLE_NORMMAP.items():
            blk[ours] = jnp.asarray(np.asarray(sd.get(p + theirs)), dtype)
        singles.append(blk)

    tree: Dict[str, Any] = {
        name: _get_linear(sd, theirs, dtype) for name, theirs in _TOP_LINEARS.items()
    }
    for name in _MLP_EMBEDDERS:
        if name == "guidance_in" and not cfg.guidance_embed:
            tree[name] = None
            continue
        tree[name] = {
            "in_layer": _get_linear(sd, f"{name}.in_layer", dtype),
            "out_layer": _get_linear(sd, f"{name}.out_layer", dtype),
        }
    tree["double_blocks"] = stack(doubles)
    tree["single_blocks"] = stack(singles)
    tree["final_layer"] = {
        "linear": _get_linear(sd, "final_layer.linear", dtype),
        "adaln": _get_linear(sd, "final_layer.adaLN_modulation.1", dtype),
    }
    # checkpoints store the interleaved rope layout; runtime uses half-split
    return deinterleave_flux_tree(tree, cfg)


def qkv_out_permutation(hidden_size: int, head_dim: int, extra: int = 0) -> np.ndarray:
    """Output-axis permutation for a fused qkv(+mlp) kernel that converts the
    checkpoint's interleaved rope channel layout into the runtime's half-split layout
    (see ops/rope.py): q and k sections permute per-head, v (and any mlp tail) stay.

    ``extra``: width of a trailing non-attention section (single-block linear1's
    mlp_in part).
    """
    head_perm = deinterleave_permutation(head_dim)
    n_heads = hidden_size // head_dim
    sec = np.concatenate([h * head_dim + head_perm for h in range(n_heads)])
    return np.concatenate(
        [
            sec,  # q
            hidden_size + sec,  # k
            np.arange(2 * hidden_size, 3 * hidden_size),  # v untouched
            np.arange(3 * hidden_size, 3 * hidden_size + extra),  # mlp tail untouched
        ]
    )


def _permute_linear_out(lin: Linear, perm: np.ndarray) -> Linear:
    """Permute a Linear's output channels (kernel/q columns, bias, per-channel scales)."""
    import dataclasses

    def pcols(a):
        return None if a is None else a[..., perm]

    return dataclasses.replace(
        lin,
        kernel=pcols(lin.kernel),
        q=pcols(lin.q),
        bias=pcols(lin.bias),
        w_scale=lin.w_scale if lin.w_scale is None or lin.w_scale.shape[-1] != len(perm) else pcols(lin.w_scale),
        w_scale_inv=lin.w_scale_inv
        if lin.w_scale_inv is None or lin.w_scale_inv.shape[-1] != len(perm)
        else pcols(lin.w_scale_inv),
    )


def deinterleave_flux_tree(tree: Dict[str, Any], cfg: FluxStatic) -> Dict[str, Any]:
    """Apply the rope deinterleave permutation to every q/k-producing kernel and the
    qk-norm scales. Model outputs are mathematically unchanged (test_ops.py proves
    score equivalence); rope then runs with full-width vector ops."""
    hd = cfg.head_dim
    head_perm = jnp.asarray(deinterleave_permutation(hd))
    qkv_perm = jnp.asarray(qkv_out_permutation(cfg.hidden_size, hd))
    lin1_perm = jnp.asarray(qkv_out_permutation(cfg.hidden_size, hd, extra=cfg.mlp_hidden))

    out = dict(tree)
    db = dict(tree["double_blocks"])
    for name in ("img_attn_qkv", "txt_attn_qkv"):
        db[name] = _permute_linear_out(db[name], qkv_perm)
    for name in ("img_attn_qnorm", "img_attn_knorm", "txt_attn_qnorm", "txt_attn_knorm"):
        db[name] = db[name][..., head_perm]
    out["double_blocks"] = db
    sb = dict(tree["single_blocks"])
    sb["linear1"] = _permute_linear_out(sb["linear1"], lin1_perm)
    for name in ("qnorm", "knorm"):
        sb[name] = sb[name][..., head_perm]
    out["single_blocks"] = sb
    return out


def _as_stf(path_or_file) -> SafetensorsFile:
    """Accept a path or an already-open SafetensorsFile — the loader parses the
    multi-GB file's header once and hands it to both detectors."""
    return path_or_file if isinstance(path_or_file, SafetensorsFile) else SafetensorsFile(path_or_file)


def is_prequantized_reference_file(path_or_file) -> bool:
    f = _as_stf(path_or_file)
    return any(k.endswith(".float8_data") for k in f.keys())


def reference_prequant_has_input_scales(path_or_file) -> bool:
    """True when every F8Linear in a reference-prequantized checkpoint also ships its
    tuned ``input_scale``. The reference re-runs amax calibration when input scales are
    absent (float8_quantize.py:154-185) — we mirror that by reporting the flow as
    *not* prequantized so the pipeline's calibration pass runs."""
    f = _as_stf(path_or_file)
    keys = set(f.keys())
    f8_prefixes = [k[: -len(".float8_data")] for k in keys if k.endswith(".float8_data")]
    return all(f"{p}.input_scale" in keys for p in f8_prefixes)


# ----------------------------------------------------------------------- autoencoder


def load_ae_checkpoint(path: str, cfg: AutoEncoderParams, dtype=jnp.bfloat16) -> Dict[str, Any]:
    """BFL ae.sft → NHWC param pytree (reference load_autoencoder, util.py:278-295).

    Conv kernels OIHW → HWIO; GroupNorm weight/bias pass through.
    """
    sd = SafetensorsFile(path)

    def conv(prefix):
        w = np.asarray(sd.get(f"{prefix}.weight"))
        out = {"kernel": jnp.asarray(w.transpose(2, 3, 1, 0), dtype)}
        if f"{prefix}.bias" in sd:
            out["bias"] = jnp.asarray(np.asarray(sd.get(f"{prefix}.bias")), dtype)
        return out

    def gn(prefix):
        return {
            "weight": jnp.asarray(np.asarray(sd.get(f"{prefix}.weight")), dtype),
            "bias": jnp.asarray(np.asarray(sd.get(f"{prefix}.bias")), dtype),
        }

    def resnet(prefix, has_nin):
        p = {
            "norm1": gn(f"{prefix}.norm1"),
            "conv1": conv(f"{prefix}.conv1"),
            "norm2": gn(f"{prefix}.norm2"),
            "conv2": conv(f"{prefix}.conv2"),
        }
        if has_nin:
            p["nin_shortcut"] = conv(f"{prefix}.nin_shortcut")
        return p

    def attn(prefix):
        return {
            "norm": gn(f"{prefix}.norm"),
            **{n: conv(f"{prefix}.{n}") for n in ("q", "k", "v", "proj_out")},
        }

    n_res = len(cfg.ch_mult)

    def has(key):
        return key in sd

    enc: Dict[str, Any] = {"conv_in": conv("encoder.conv_in")}
    enc["down"] = []
    for i in range(n_res):
        level: Dict[str, Any] = {"block": []}
        for j in range(cfg.num_res_blocks):
            pre = f"encoder.down.{i}.block.{j}"
            level["block"].append(resnet(pre, has(f"{pre}.nin_shortcut.weight")))
        if has(f"encoder.down.{i}.downsample.conv.weight"):
            level["downsample"] = {"conv": conv(f"encoder.down.{i}.downsample.conv")}
        enc["down"].append(level)
    enc["mid"] = {
        "block_1": resnet("encoder.mid.block_1", has("encoder.mid.block_1.nin_shortcut.weight")),
        "attn_1": attn("encoder.mid.attn_1"),
        "block_2": resnet("encoder.mid.block_2", has("encoder.mid.block_2.nin_shortcut.weight")),
    }
    enc["norm_out"] = gn("encoder.norm_out")
    enc["conv_out"] = conv("encoder.conv_out")

    dec: Dict[str, Any] = {"conv_in": conv("decoder.conv_in")}
    dec["mid"] = {
        "block_1": resnet("decoder.mid.block_1", has("decoder.mid.block_1.nin_shortcut.weight")),
        "attn_1": attn("decoder.mid.attn_1"),
        "block_2": resnet("decoder.mid.block_2", has("decoder.mid.block_2.nin_shortcut.weight")),
    }
    dec["up"] = []
    for i in range(n_res):
        level = {"block": []}
        for j in range(cfg.num_res_blocks + 1):
            pre = f"decoder.up.{i}.block.{j}"
            level["block"].append(resnet(pre, has(f"{pre}.nin_shortcut.weight")))
        if has(f"decoder.up.{i}.upsample.conv.weight"):
            level["upsample"] = {"conv": conv(f"decoder.up.{i}.upsample.conv")}
        dec["up"].append(level)
    dec["norm_out"] = gn("decoder.norm_out")
    dec["conv_out"] = conv("decoder.conv_out")

    return {"encoder": enc, "decoder": dec}


# ------------------------------------------------------- prequantized export (ours)

PREQUANT_FORMAT = "flux-fp8-api-tpu/prequant-v1"
_LINEAR_FIELDS = ("kernel", "q", "w_scale", "w_scale_inv", "in_scale", "in_scale_inv", "bias")


def _flatten(tree, prefix=""):
    """Walk the param tree yielding (dotted_path, leaf)."""
    if isinstance(tree, Linear):
        yield prefix.rstrip("."), tree
    elif isinstance(tree, dict):
        for k, v in tree.items():
            yield from _flatten(v, f"{prefix}{k}.")
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            yield from _flatten(v, f"{prefix}{i}.")
    elif tree is not None:
        yield prefix.rstrip("."), tree


def save_prequantized(path: str, params: Dict[str, Any], extra_meta: Optional[Dict[str, str]] = None) -> None:
    """Serialize a (quantized, calibrated) flux pytree — fp8/int8 data + all scales —
    so reload skips both quantization and calibration (the reference's prequantized
    workflow: float8_quantize.py:91-193, README.md:186-192)."""
    tensors: Dict[str, np.ndarray] = {}
    linears: Dict[str, str] = {}
    for path_key, leaf in _flatten(params):
        if isinstance(leaf, Linear):
            linears[path_key] = leaf.kind
            for f in _LINEAR_FIELDS:
                v = getattr(leaf, f)
                if v is not None:
                    tensors[f"{path_key}.{f}"] = np.asarray(jax.device_get(v))
        else:
            tensors[path_key] = np.asarray(jax.device_get(leaf))
    meta = {"format": PREQUANT_FORMAT, "linears": json.dumps(linears)}
    if extra_meta:
        meta.update(extra_meta)
    save_safetensors(path, tensors, metadata=meta)


def load_prequantized(path_or_file, cfg: FluxStatic) -> Dict[str, Any]:
    """Reload a :func:`save_prequantized` checkpoint into the stacked pytree layout."""
    f = _as_stf(path_or_file)
    if f.metadata.get("format") != PREQUANT_FORMAT:
        raise ValueError(f"{f.path} is not a {PREQUANT_FORMAT} checkpoint")
    linears = json.loads(f.metadata["linears"])

    # build a skeleton with the right STRUCTURE only — eval_shape allocates nothing
    # (an eager init_flux_params would put ~24GB of random bf16 on the device before
    # a single checkpoint byte is read, OOMing the 16GB chip on the serving-restart
    # path; CLAUDE.md's multi-GB-init rule)
    skeleton = jax.eval_shape(
        lambda: init_flux_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16)
    )

    def rebuild(subtree, prefix=""):
        if isinstance(subtree, Linear):
            key = prefix.rstrip(".")
            kind = linears[key]
            fields = {}
            for fld in _LINEAR_FIELDS:
                name = f"{key}.{fld}"
                fields[fld] = jnp.asarray(f.get(name)) if name in f else None
            return Linear(kind=kind, **fields)
        if isinstance(subtree, dict):
            return {k: rebuild(v, f"{prefix}{k}.") for k, v in subtree.items()}
        if subtree is None:
            return None
        return jnp.asarray(f.get(prefix.rstrip(".")))

    return rebuild(skeleton)
