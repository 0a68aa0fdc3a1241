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
from ..utils.logging import logger
from .safetensors_io import SafetensorsFile, save_safetensors


class LoadReport:
    """Missing/unexpected-key accounting for tolerant (strict=False) checkpoint
    loading — the reference loads with ``strict=False`` and prints warnings
    (util.py:225-237 ``print_load_warning``, flux_model.py:730-733) where a bare
    KeyError would crash on real-world checkpoint variants (extra EMA keys, a
    missing bias). Loaders record every key they consume and every expected key
    they found absent; :meth:`finish` warns (default) or raises (strict=True)."""

    def __init__(self, name: str):
        self.name = name
        self.missing: list = []
        self.unexpected: list = []
        self._consumed: set = set()

    def consume(self, key: str) -> None:
        self._consumed.add(key)

    def has(self, sd, key: str) -> bool:
        """Membership probe that records hits as consumed."""
        present = key in sd
        if present:
            self._consumed.add(key)
        return present

    def miss(self, key: str) -> None:
        self.missing.append(key)

    @staticmethod
    def fetch(sd_get, name: str, shape, fill: float = 0.0, report=None):
        """Tolerant tensor fetch shared by the T5/CLIP loaders: ``sd_get(name)``
        with consumption recorded; a KeyError becomes a recorded miss + a fill of
        the expected shape when a report is given (reference strict=False analog,
        util.py:225-237), and re-raises otherwise."""
        try:
            arr = np.asarray(sd_get(name))
            if report is not None:
                report.consume(name)
            return arr
        except KeyError:
            if report is None:
                raise
            report.miss(name)
            return np.full(shape, fill, np.float32)

    @staticmethod
    def _fmt(keys, cap: int = 12) -> str:
        keys = sorted(keys)
        tail = f" … +{len(keys) - cap} more" if len(keys) > cap else ""
        return f"{keys[:cap]}{tail}"

    def finish(self, all_keys, strict: bool = False) -> "LoadReport":
        self.unexpected = sorted(set(all_keys) - self._consumed)
        if self.missing:
            msg = f"{self.name}: missing keys (zero/identity-initialized): {self._fmt(self.missing)}"
            if strict:
                raise KeyError(msg)
            logger.warning(msg)
        if self.unexpected:
            msg = f"{self.name}: unexpected keys (ignored): {self._fmt(self.unexpected)}"
            if strict:
                raise KeyError(msg)
            logger.warning(msg)
        return self

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


def _get_linear(
    sd, torch_prefix: str, dtype, expected: Optional[Linear] = None,
    report: Optional[LoadReport] = None,
) -> Linear:
    """Load one linear; handles both float and reference-prequantized layouts.

    With ``report`` (+ ``expected``, a Linear of ShapeDtypeStructs from the init
    skeleton) the load is tolerant: a missing weight/bias becomes zeros of the
    expected shape and is recorded, mirroring the reference's strict=False load
    (util.py:240-256). Without a report, missing mandatory keys raise KeyError."""

    def have(key: str) -> bool:
        return report.has(sd, key) if report is not None else key in sd

    bias_key = f"{torch_prefix}.bias"
    f8_key = f"{torch_prefix}.float8_data"
    if have(f8_key):
        # reference prequantized F8Linear serialization (float8_quantize.py:91-193)
        q = jnp.asarray(np.asarray(sd.get(f8_key)).transpose(1, 0))  # (out,in)→(in,out)
        scale_key = f"{torch_prefix}.scale"
        if have(scale_key):
            w_scale = jnp.asarray(np.asarray(sd.get(scale_key)), jnp.float32).reshape(())
        elif report is not None:
            report.miss(scale_key)
            w_scale = jnp.float32(1.0)
        else:
            raise KeyError(scale_key)
        # consume the serialization's derived/placeholder keys so they don't show
        # up as "unexpected": reciprocals and the 1-element freed-weight stub
        for aux in (".scale_reciprocal", ".input_scale_reciprocal", ".weight"):
            have(f"{torch_prefix}{aux}")
        bias = sd.get(bias_key) if have(bias_key) else None
        if bias is None and report is not None and expected is not None and expected.bias is not None:
            report.miss(bias_key)
            bias = np.zeros(expected.bias.shape, np.float32)
        in_scale_key = f"{torch_prefix}.input_scale"
        in_scale = (
            jnp.asarray(np.asarray(sd.get(in_scale_key)), jnp.float32).reshape(())
            if have(in_scale_key)
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
    w_key = f"{torch_prefix}.weight"
    if have(w_key):
        kernel = jnp.asarray(np.asarray(sd.get(w_key)).transpose(1, 0), dtype)
    elif report is not None and expected is not None:
        report.miss(w_key)
        kernel = jnp.zeros(expected.kernel.shape, dtype)
    else:
        raise KeyError(w_key)
    if have(bias_key):
        b = jnp.asarray(np.asarray(sd.get(bias_key)), dtype)
    elif report is not None and expected is not None and expected.bias is not None:
        report.miss(bias_key)
        b = jnp.zeros(expected.bias.shape, dtype)
    else:
        b = None
    return Linear(kernel=kernel, bias=b, kind="float")


def _unstack_struct(lin: Linear) -> Linear:
    """Per-block expected shapes from a depth-stacked skeleton Linear (drop the
    leading depth axis of each ShapeDtypeStruct field)."""

    def drop(s):
        return None if s is None else jax.ShapeDtypeStruct(s.shape[1:], s.dtype)

    return Linear(kernel=drop(lin.kernel), bias=drop(lin.bias), kind="float")


def load_flux_checkpoint(
    path_or_file,
    cfg: FluxStatic,
    dtype: Optional[jnp.dtype] = None,
    strict: bool = False,
) -> Dict[str, Any]:
    """BFL flux safetensors → stacked param pytree (reference load_flow_model,
    util.py:240-256). Detects reference-prequantized files automatically. Accepts a
    path or an already-open SafetensorsFile (one header parse for the multi-GB
    file, shared with the caller's format detection).

    Like the reference (``strict=False`` + ``print_load_warning``, util.py:225-237),
    the load tolerates checkpoint variants: missing linears/biases zero-initialize,
    missing qk-norm scales become identity, extra keys are ignored — each with a
    warning naming the keys. ``strict=True`` raises instead."""
    dtype = dtype or cfg.dtype
    sd = _as_stf(path_or_file)
    report = LoadReport(f"flux checkpoint {getattr(sd, 'path', '')}")
    # expected leaf shapes without allocating anything (eval_shape)
    skeleton = jax.eval_shape(lambda: init_flux_params(jax.random.PRNGKey(0), cfg, dtype))

    def stack(leaves):
        return jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *leaves)

    def norm(key: str) -> jnp.ndarray:
        if report.has(sd, key):
            return jnp.asarray(np.asarray(sd.get(key)), dtype)
        report.miss(key)
        return jnp.ones((cfg.head_dim,), dtype)  # identity qk-norm

    doubles = []
    for i in range(cfg.depth):
        p = f"double_blocks.{i}."
        blk: Dict[str, Any] = {
            ours: _get_linear(
                sd, p + theirs, dtype,
                expected=_unstack_struct(skeleton["double_blocks"][ours]),
                report=report,
            )
            for ours, theirs in _DOUBLE_KEYMAP.items()
        }
        for ours, theirs in _DOUBLE_NORMMAP.items():
            blk[ours] = norm(p + theirs)
        doubles.append(blk)

    singles = []
    for i in range(cfg.depth_single_blocks):
        p = f"single_blocks.{i}."
        blk = {
            ours: _get_linear(
                sd, p + theirs, dtype,
                expected=_unstack_struct(skeleton["single_blocks"][ours]),
                report=report,
            )
            for ours, theirs in _SINGLE_KEYMAP.items()
        }
        for ours, theirs in _SINGLE_NORMMAP.items():
            blk[ours] = norm(p + theirs)
        singles.append(blk)

    tree: Dict[str, Any] = {
        name: _get_linear(sd, theirs, dtype, expected=skeleton[name], report=report)
        for name, theirs in _TOP_LINEARS.items()
    }
    for name in _MLP_EMBEDDERS:
        if name == "guidance_in" and not cfg.guidance_embed:
            tree[name] = None
            continue
        tree[name] = {
            layer: _get_linear(
                sd, f"{name}.{layer}", dtype, expected=skeleton[name][layer], report=report
            )
            for layer in ("in_layer", "out_layer")
        }
    tree["double_blocks"] = stack(doubles)
    tree["single_blocks"] = stack(singles)
    tree["final_layer"] = {
        "linear": _get_linear(
            sd, "final_layer.linear", dtype,
            expected=skeleton["final_layer"]["linear"], report=report,
        ),
        "adaln": _get_linear(
            sd, "final_layer.adaLN_modulation.1", dtype,
            expected=skeleton["final_layer"]["adaln"], report=report,
        ),
    }
    report.finish(sd.keys(), strict=strict)
    # checkpoints store the interleaved rope layout; runtime uses half-split
    return deinterleave_flux_tree(tree, cfg)


def qkv_out_permutation(hidden_size: int, head_dim: int, extra: int = 0) -> np.ndarray:
    """Output-axis permutation for a fused qkv(+mlp) kernel that converts the
    checkpoint's interleaved rope channel layout into the runtime's half-split
    ("flat") layout (see ops/rope.py): q and k sections permute per-head, v (and any
    mlp tail) stay. K-major channel order is preserved — the tensor-parallel
    head-major regroup is a separate, shard-time relayout (:func:`relayout_flux_tree`).

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


def grouped_qkv_permutation(hidden_size: int, head_dim: int, extra: int = 0) -> np.ndarray:
    """Flat→grouped output-axis permutation for a fused qkv(+mlp) kernel: the flat
    K-major order (3, heads, head_dim) regroups to HEAD-MAJOR per-head groups
    [q_n | k_n | v_n (| mlp_n)] — with ``extra`` (single-block linear1's mlp_in
    tail) the mlp channels are sliced per head too. A contiguous tensor-parallel
    shard of the grouped axis then carries whole heads (plus their mlp slices), so
    GSPMD runs Megatron column parallelism with zero weight resharding between the
    GEMM and the per-head attention split (parallel/mesh.py). Applied at shard
    time by :func:`relayout_flux_tree`; single-chip serving keeps the flat layout
    (measured faster fusion — see docs/PERF.md)."""
    n_heads = hidden_size // head_dim
    g = 0
    if extra:
        if extra % n_heads:
            raise ValueError(f"mlp width {extra} must divide across {n_heads} heads")
        g = extra // n_heads
    idx = np.arange(head_dim)
    groups = []
    for n in range(n_heads):
        base = n * head_dim
        parts = [base + idx, hidden_size + base + idx, 2 * hidden_size + base + idx]
        if extra:
            parts.append(3 * hidden_size + n * g + np.arange(g))  # mlp_n
        groups.append(np.concatenate(parts))
    return np.concatenate(groups)


def linear2_in_permutation(hidden_size: int, head_dim: int, mlp_hidden: int) -> np.ndarray:
    """Flat→grouped input-axis permutation for single-block linear2: the flat
    concat [attn (hidden) | mlp (mlp_hidden)] becomes per-head groups
    [attn_n (head_dim) | mlp_n (mlp_hidden/heads)], matching linear1's grouped
    out-axis — a row-parallel tp shard of linear2 then consumes exactly the
    activations its own heads produced (zero resharding, parallel/mesh.py)."""
    n_heads = hidden_size // head_dim
    if mlp_hidden % n_heads:
        raise ValueError(f"mlp width {mlp_hidden} must divide across {n_heads} heads")
    g = mlp_hidden // n_heads
    groups = []
    for n in range(n_heads):
        groups.append(
            np.concatenate(
                [n * head_dim + np.arange(head_dim), hidden_size + n * g + np.arange(g)]
            )
        )
    return np.concatenate(groups)


def relayout_flux_tree(tree: Dict[str, Any], cfg: FluxStatic, inverse: bool = False) -> Dict[str, Any]:
    """Relayout the fused qkv/linear1/linear2 channel axes between the "flat"
    (single-chip) and "grouped" (tensor-parallel head-major) layouts — a pure
    permutation, outputs mathematically unchanged. ``inverse=True`` converts
    grouped→flat (used when exporting a prequantized checkpoint from a meshed
    pipeline: files always store the flat layout). Works on float and quantized
    leaves; the matching model flag is ``FluxStatic.fused_layout``."""
    hd = cfg.head_dim
    qkv_perm = grouped_qkv_permutation(cfg.hidden_size, hd)
    lin1_perm = grouped_qkv_permutation(cfg.hidden_size, hd, extra=cfg.mlp_hidden)
    lin2_perm = linear2_in_permutation(cfg.hidden_size, hd, cfg.mlp_hidden)
    if inverse:
        qkv_perm, lin1_perm, lin2_perm = (
            np.argsort(qkv_perm), np.argsort(lin1_perm), np.argsort(lin2_perm)
        )
    qkv_perm, lin1_perm, lin2_perm = (
        jnp.asarray(qkv_perm), jnp.asarray(lin1_perm), jnp.asarray(lin2_perm)
    )

    out = dict(tree)
    db = dict(tree["double_blocks"])
    for name in ("img_attn_qkv", "txt_attn_qkv"):
        db[name] = _permute_linear_out(db[name], qkv_perm)
    out["double_blocks"] = db
    sb = dict(tree["single_blocks"])
    sb["linear1"] = _permute_linear_out(sb["linear1"], lin1_perm)
    sb["linear2"] = _permute_linear_in(sb["linear2"], lin2_perm)
    out["single_blocks"] = sb
    return out


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


def _permute_linear_in(lin: Linear, perm: np.ndarray) -> Linear:
    """Permute a Linear's input channels (kernel/q rows). Per-out-channel scales,
    bias and input scales are untouched — only the contraction order changes.

    int4's half-split in-axis packs two rows per byte, so it can't be row-permuted
    in place: it round-trips dequantize → permute → requantize via
    ops.quant.with_kernel (exact — per-out-channel scales are row-independent —
    and keeps the tuned input scales). Blockwise weight-only kinds (wo_*) are
    rejected loudly: their blocked in-axis can't be permuted in place either, and
    with_kernel refuses to requantize them — flow trees (the only relayout
    targets) never carry wo_* leaves."""
    import dataclasses

    from ..ops.quant import dequantize_kernel, with_kernel

    if lin.kind.startswith("wo_"):
        raise ValueError(
            f"in-axis permutation of a weight-only ({lin.kind}) leaf is not "
            "supported — weight-only tiers are text-encoder-only"
        )
    if lin.q is not None and lin.kind == "int4":

        def roundtrip(l):
            return with_kernel(l, dequantize_kernel(l)[perm, :], l.bias)

        return jax.vmap(roundtrip)(lin) if lin.q.ndim == 3 else roundtrip(lin)

    def prows(a):
        return None if a is None else a[..., perm, :]

    return dataclasses.replace(lin, kernel=prows(lin.kernel), q=prows(lin.q))


def deinterleave_flux_tree(tree: Dict[str, Any], cfg: FluxStatic) -> Dict[str, Any]:
    """Apply the rope deinterleave permutation to every q/k-producing kernel and the
    qk-norm scales, producing the runtime "flat" layout. Model outputs are
    mathematically unchanged (test_ops.py proves score equivalence); rope then runs
    with full-width vector ops. The tensor-parallel "grouped" relayout is separate
    (:func:`relayout_flux_tree`, applied at shard time)."""
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


def load_ae_checkpoint(
    path: str, cfg: AutoEncoderParams, dtype=jnp.bfloat16, strict: bool = False
) -> Dict[str, Any]:
    """BFL ae.sft → NHWC param pytree (reference load_autoencoder, util.py:278-295).

    Conv kernels OIHW → HWIO; GroupNorm weight/bias pass through. Tolerant like the
    reference's strict=False load: missing biases/norm affines degrade to identity
    with a warning, extra keys are ignored with a warning; missing conv *weights*
    (shape unrecoverable) raise one aggregate KeyError naming every absent tensor
    instead of a bare KeyError on the first.
    """
    sd = SafetensorsFile(path)
    report = LoadReport(f"ae checkpoint {path}")
    fatal: list = []

    def conv(prefix):
        wk, bk = f"{prefix}.weight", f"{prefix}.bias"
        if report.has(sd, wk):
            w = np.asarray(sd.get(wk))
            out = {"kernel": jnp.asarray(w.transpose(2, 3, 1, 0), dtype)}
        else:
            fatal.append(wk)
            return {"kernel": None}
        if report.has(sd, bk):
            out["bias"] = jnp.asarray(np.asarray(sd.get(bk)), dtype)
        else:
            report.miss(bk)  # absent bias == zero bias; warn and continue
        return out

    def gn(prefix):
        wk, bk = f"{prefix}.weight", f"{prefix}.bias"
        hw, hb = report.has(sd, wk), report.has(sd, bk)
        if not hw and not hb:
            fatal.extend([wk, bk])  # no tensor to infer the channel count from
            return {"weight": None, "bias": None}
        w = jnp.asarray(np.asarray(sd.get(wk)), dtype) if hw else None
        b = jnp.asarray(np.asarray(sd.get(bk)), dtype) if hb else None
        if w is None:
            report.miss(wk)
            w = jnp.ones_like(b)
        if b is None:
            report.miss(bk)
            b = jnp.zeros_like(w)
        return {"weight": w, "bias": b}

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

    if fatal:
        raise KeyError(
            f"ae checkpoint {path}: missing tensors whose shapes cannot be inferred: "
            f"{sorted(set(fatal))}"
        )
    report.finish(sd.keys(), strict=strict)
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
