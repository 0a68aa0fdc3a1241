"""Quantized-linear parameter leaves and per-tensor scale math.

This is the TPU-native redesign of the reference's ``F8Linear`` (float8_quantize.py:30-317).
The reference mutates an nn.Module in place (quantize-on-load, 12 stateful amax trials,
`torch._scaled_mm` forward). Here a linear layer is an immutable pytree node
(:class:`Linear`) holding either a float kernel or quantized data + scales, and the
forward is a pure function (:func:`linear_apply`) the whole model jits through — the
calibration state lives *outside* the graph (see :mod:`..calibration`).

Scale semantics match the reference exactly:
- ``amax_to_scale(amax, max_val) = clamp(max_val / clamp(amax, 1e-12), max=max_val)``
  (float8_quantize.py:214-215),
- ``to_fp8_saturated(x, scale, max_val) = clamp(x * scale, -max_val, max_val)``
  (float8_quantize.py:217-218),
- weights quantize to ``float8_e4m3fn`` (max 448), activations to ``float8_e5m2``
  (max 57344) (float8_quantize.py:39-43),
- matmul epilogue multiplies by both scale reciprocals and adds bias
  (``torch._scaled_mm`` call, float8_quantize.py:284-292).

TPU mapping: v5e/v5p MXUs have no fp8 feed, so the ``fp8`` kind stores e4m3/e5m2 bytes
(halving HBM traffic and making 12B params fit one chip) and computes the dot in
bf16×bf16→fp32 — *more* accurate than the reference's `use_fast_accum` path, same
quantization error. The ``int8`` kind is the TPU-native speed tier: the int8 MXU runs at
~1.6× bf16 throughput, with per-output-channel weight scales + the same per-tensor
input-scale calibration protocol.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

# fp8 formats mirroring the reference's choices (float8_quantize.py:39,43)
WEIGHT_F8_DTYPE = jnp.float8_e4m3fn
INPUT_F8_DTYPE = jnp.float8_e5m2
F8_WEIGHT_MAX = float(jnp.finfo(WEIGHT_F8_DTYPE).max)  # 448.0
F8_INPUT_MAX = float(jnp.finfo(INPUT_F8_DTYPE).max)  # 57344.0
INT8_MAX = 127.0


def amax_to_scale(amax: jnp.ndarray, max_val: float) -> jnp.ndarray:
    """float8_quantize.py:214-215. The ``clamp(max=max_val)`` guard is part of the
    reference's fp8 semantics (it bounds the scale so tiny-amax tensors don't produce
    astronomically large multipliers); it is correct for fp8 because fp8 formats span
    ±448/±57344, but must NOT be used for int8 (see :func:`int8_amax_to_scale`)."""
    return jnp.minimum(max_val / jnp.maximum(amax.astype(jnp.float32), 1e-12), max_val)


def int8_amax_to_scale(amax: jnp.ndarray) -> jnp.ndarray:
    """Unclamped symmetric int8 scale: 127 / amax. int8's range is only ±127, so the
    fp8-style scale clamp would cap small-magnitude tensors (e.g. 0.03-std weights) at
    scale 127 and throw away most of the 8 bits."""
    return INT8_MAX / jnp.maximum(amax.astype(jnp.float32), 1e-12)


def to_fp8_saturated(x: jnp.ndarray, scale: jnp.ndarray, max_val: float) -> jnp.ndarray:
    """Scale into the fp8 domain and saturate (float8_quantize.py:217-218).

    Returns the scaled/clamped values still in the input dtype; callers cast to the fp8
    storage dtype.
    """
    return jnp.clip(x * scale, -max_val, max_val)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "kernel", "q", "w_scale", "w_scale_inv", "in_scale", "in_scale_inv", "bias",
        "lora_a", "lora_b",
    ],
    meta_fields=["kind"],
)
@dataclasses.dataclass
class Linear:
    """A linear layer's parameters as a pytree node.

    kind="float": only ``kernel`` (in, out) [+ bias] are set.
    kind="fp8":   ``q`` (in, out) e4m3, scalar ``w_scale``/``in_scale`` (+ reciprocals).
    kind="int8":  ``q`` (in, out) int8, per-out-channel ``w_scale`` (out,), scalar
                  ``in_scale``.

    Kernels are stored (in_features, out_features) — JAX convention, contiguous for
    ``x @ W`` on the MXU — transposed from torch's (out, in) at checkpoint load.

    ``lora_a`` (in, r) / ``lora_b`` (r, out) are *live* low-rank adapters applied as
    an additive side branch in :func:`linear_apply` — the QLoRA-style training path
    (lora.py init/merge, parallel/train.py make_lora_train_step), where the frozen
    quantized base stays untouched and only a/b carry gradients. Serving params keep
    them None (LoRAs fuse into the weights instead, lora.py:fuse_lora — the
    reference's apply_lora_to_model semantics, lora_loading.py:634-693).
    """

    kernel: Optional[jnp.ndarray] = None
    q: Optional[jnp.ndarray] = None
    w_scale: Optional[jnp.ndarray] = None
    w_scale_inv: Optional[jnp.ndarray] = None
    in_scale: Optional[jnp.ndarray] = None
    in_scale_inv: Optional[jnp.ndarray] = None
    bias: Optional[jnp.ndarray] = None
    lora_a: Optional[jnp.ndarray] = None
    lora_b: Optional[jnp.ndarray] = None
    kind: str = "float"

    @property
    def in_features(self) -> int:
        arr = self.kernel if self.kernel is not None else self.q
        packed_rows = {"int4": 2, "wo_int4": 2, "wo_int2": 4}  # rows per packed byte
        return arr.shape[-2] * packed_rows.get(self.kind, 1)

    @property
    def out_features(self) -> int:
        arr = self.kernel if self.kernel is not None else self.q
        return arr.shape[-1]


def quantize_linear_fp8(kernel: jnp.ndarray, bias: Optional[jnp.ndarray]) -> Linear:
    """Float kernel → fp8 Linear (reference ``quantize_weight``, float8_quantize.py:195-207).

    ``in_scale`` starts at 1.0 (uncalibrated); calibration replaces it. The reference's
    uncalibrated path instead *measures* each input during trials — we reproduce that
    protocol in :mod:`..calibration` by running amax collection before freezing scales.
    """
    amax = jnp.max(jnp.abs(kernel)).astype(jnp.float32)
    scale = amax_to_scale(amax, F8_WEIGHT_MAX)
    q = to_fp8_saturated(kernel.astype(jnp.float32), scale, F8_WEIGHT_MAX).astype(
        WEIGHT_F8_DTYPE
    )
    one = jnp.float32(1.0)
    return Linear(
        q=q,
        w_scale=scale,
        w_scale_inv=1.0 / scale,
        in_scale=one,
        in_scale_inv=one,
        bias=bias,
        kind="fp8",
    )


def quantize_linear_int8(kernel: jnp.ndarray, bias: Optional[jnp.ndarray]) -> Linear:
    """Float kernel → int8 Linear with per-output-channel weight scales.

    TPU-native tier (no reference analog for the flow model): symmetric int8, round-to-
    nearest-even, scales chosen so each output channel's amax maps to 127.
    """
    amax = jnp.max(jnp.abs(kernel.astype(jnp.float32)), axis=-2)  # (out,)
    scale = int8_amax_to_scale(amax)
    q = jnp.round(
        jnp.clip(kernel.astype(jnp.float32) * scale[None, :], -INT8_MAX, INT8_MAX)
    ).astype(jnp.int8)
    one = jnp.float32(1.0)
    return Linear(
        q=q,
        w_scale=scale,
        w_scale_inv=1.0 / scale,
        in_scale=one,
        in_scale_inv=one,
        bias=bias,
        kind="int8",
    )


INT4_MAX = 7.0


def quantize_linear_int4(kernel: jnp.ndarray, bias: Optional[jnp.ndarray]) -> Linear:
    """Float kernel → packed int4 Linear, per-output-channel scales — the reference's
    gigaquant flow tier (configs/config-dev-gigaquant.json ``flow_quantization_dtype:
    qint4`` via quanto).

    TPU mapping: int4 values live on the int8 grid, so the matmul unpacks nibbles to
    int8 and runs the full-speed int8 MXU path with the same per-channel epilogue —
    no codebook (vs bnb nf4), half the HBM footprint of fp8/int8 (12B flow → ~6GB).
    HALF-SPLIT packing: row i's nibble shares a byte with row i + in/2 (low/high) —
    offset-binary (q+7 ∈ [0, 14]). Unpacking is then two contiguous block reads + a
    concat instead of an even/odd interleave, which XLA would lower to a costly
    sublane shuffle (measured 1.80 vs 3.1 it/s @1024² with interleaved packing).
    """
    # 2D only: the packing slices axis 0 as the in-axis — a depth-stacked kernel
    # would silently pack along depth and corrupt weights (stacked leaves go
    # through vmap, see quantize_flux_tree)
    assert kernel.ndim == 2, f"expected (in, out) kernel, got {kernel.shape} — vmap stacked leaves"
    in_f = kernel.shape[-2]
    assert in_f % 2 == 0, f"in_features {in_f} must be even for int4 packing"
    k32 = kernel.astype(jnp.float32)
    amax = jnp.max(jnp.abs(k32), axis=-2)  # (out,)
    scale = INT4_MAX / jnp.maximum(amax, 1e-12)
    q = jnp.round(jnp.clip(k32 * scale[None, :], -INT4_MAX, INT4_MAX)).astype(jnp.int32)
    q = (q + 7).astype(jnp.uint8)
    packed = q[: in_f // 2, :] | (q[in_f // 2 :, :] << jnp.uint8(4))
    one = jnp.float32(1.0)
    return Linear(
        q=packed,
        w_scale=scale,
        w_scale_inv=1.0 / scale,
        in_scale=one,
        in_scale_inv=one,
        bias=bias,
        kind="int4",
    )


def _unpack_int4(packed: jnp.ndarray) -> jnp.ndarray:
    """(..., in/2, out) half-split packed nibbles → (..., in, out) int8 in [-7, 7]."""
    low = (packed & jnp.uint8(0xF)).astype(jnp.int8) - jnp.int8(7)
    high = (packed >> jnp.uint8(4)).astype(jnp.int8) - jnp.int8(7)
    return jnp.concatenate([low, high], axis=-2)


def fp8_to_int8_compute(lin: Linear, calibrated: Optional[bool] = None) -> Linear:
    """fp8 leaf → int8-compute leaf: the TPU ``use_fast_accum`` analog.

    v5e/v5p MXUs have no fp8 feed: the exact fp8 path upcasts both operands to bf16
    (bf16 throughput) *and* pays a VPU saturate-cast per activation — all cost, no
    speedup (measured 1.88 vs 2.64 it/s @1024²). The reference itself trades
    accumulation precision for speed in exactly this tier (``use_fast_accum=True`` in
    its ``torch._scaled_mm`` call, float8_quantize.py:284-292); the TPU-native
    equivalent is the int8 MXU (~1.6× bf16 throughput):

    - weight: re-grid the *e4m3 values* (per-tensor scaled) onto per-out-channel
      symmetric int8 — a finer grid than e4m3's for most channels, so the tier keeps
      e4m3's representation error, not int8-from-float error;
    - activations: per-tensor int8 instead of e5m2 — one cheap round instead of a
      saturate-cast, feeding the fast MXU path;
    - a calibrated e5m2 input scale (57344/amax) converts to the int8 law
      (127/amax) by the ratio of the two grids; uncalibrated (1.0) stays 1.0 so the
      calibration protocol proceeds under the int8 law.

    CLAMP CAVEAT: ``amax_to_scale`` clamps the e5m2 scale at 57344, so a layer whose
    activation amax was < 1 stores scale 57344 and the true amax is unrecoverable —
    the grid-ratio conversion then caps the int8 scale at 127 (fixed-point step 1/127
    where e5m2's float grid kept relative precision). Loaders detect clamped scales
    with :func:`tree_has_clamped_input_scales` and re-run calibration under the int8
    law instead of trusting the conversion (utils/loader.py).

    Checkpoints keep e4m3 storage; this runs at load (see utils/loader.py, gated on
    ``ModelSpec.fp8_fast_accum``). Works on stacked (leading depth axis) and plain
    leaves; int8/float/weight-only leaves pass through unchanged.
    """
    if lin.kind != "fp8":
        return lin
    wsi = lin.w_scale_inv.astype(jnp.float32)
    q32 = lin.q.astype(jnp.float32)
    # per-out-channel amax of the dequantized kernel = per-channel max|q| · w_scale⁻¹
    amax = jnp.max(jnp.abs(q32), axis=-2) * wsi[..., None]  # (..., out)
    scale = INT8_MAX / jnp.maximum(amax, 1e-12)
    factor = wsi.reshape(wsi.shape + (1, 1)) * scale[..., None, :]
    qi = jnp.round(jnp.clip(q32 * factor, -INT8_MAX, INT8_MAX)).astype(jnp.int8)
    in_scale = lin.in_scale.astype(jnp.float32)
    if calibrated is True:
        in8 = in_scale * (INT8_MAX / F8_INPUT_MAX)
    elif calibrated is False:
        # ones_like, not a scalar: depth-stacked block leaves carry a (depth,)
        # in_scale and lax.scan needs that leading axis preserved
        in8 = jnp.ones_like(in_scale)
    else:
        # heuristic fallback for callers that can't know (e.g. synthetic bench
        # trees): scale==1.0 reads as "never calibrated". A truly calibrated scale
        # of exactly 1.0 (activation amax exactly F8_INPUT_MAX) would be
        # misclassified — load paths pass `calibrated` explicitly to avoid this.
        in8 = jnp.where(in_scale == 1.0, 1.0, in_scale * (INT8_MAX / F8_INPUT_MAX))
    return Linear(
        q=qi,
        w_scale=scale,
        w_scale_inv=1.0 / scale,
        in_scale=in8,
        in_scale_inv=1.0 / in8,
        bias=lin.bias,
        kind="int8",
    )


@jax.jit
def _any_scale_clamped(scales):
    return jnp.max(jnp.stack([jnp.max(s.astype(jnp.float32)) for s in scales])) >= F8_INPUT_MAX


def tree_has_clamped_input_scales(tree) -> bool:
    """True when any fp8 leaf's calibrated input scale sits at the e5m2 clamp
    (activation amax < 1 — see fp8_to_int8_compute's clamp caveat). The per-leaf
    maxes run INSIDE one jitted reduction (module-level jit, cached per tree
    structure) — one dispatch + one scalar fetch through the ~32ms/call tunnel."""
    scales = tuple(
        l.in_scale
        for l in jax.tree.leaves(tree, is_leaf=lambda x: isinstance(x, Linear))
        if isinstance(l, Linear) and l.kind == "fp8" and l.in_scale is not None
    )
    if not scales:
        return False
    return bool(_any_scale_clamped(scales))


def tree_fp8_to_int8_compute(tree, calibrated: Optional[bool] = None):
    """Convert every fp8 Linear leaf of a param tree to int8 compute (jitted per leaf
    so the dequant staging stays fused — at 12B params an eager f32 intermediate per
    leaf would blow the 16GB chip). ``calibrated`` pins the input-scale law
    conversion when the caller knows (see fp8_to_int8_compute)."""
    conv = jax.jit(partial(fp8_to_int8_compute, calibrated=calibrated))

    def walk(t):
        if isinstance(t, Linear):
            return conv(t) if t.kind == "fp8" else t
        if isinstance(t, dict):
            return {k: walk(v) for k, v in t.items()}
        if isinstance(t, (list, tuple)):
            return type(t)(walk(v) for v in t)
        return t

    return walk(tree)


def dequantize_kernel(lin: Linear) -> jnp.ndarray:
    """Recover the float kernel (reference ``extract_weight_from_linear``,
    lora_loading.py:615-631: ``float8_data * scale_reciprocal``). fp32 output."""
    if lin.kind == "float":
        return lin.kernel.astype(jnp.float32)
    if lin.kind == "fp8":
        return lin.q.astype(jnp.float32) * lin.w_scale_inv
    if lin.kind in ("int8", "wo_fp8", "wo_int8"):
        return lin.q.astype(jnp.float32) * lin.w_scale_inv[None, :]
    if lin.kind == "int4":
        return _unpack_int4(lin.q).astype(jnp.float32) * lin.w_scale_inv[None, :]
    if lin.kind in ("wo_int4", "wo_int2"):
        bits = 4 if lin.kind == "wo_int4" else 2
        return _blockwise_dequantize(lin.q, lin.w_scale_inv, bits, jnp.float32)
    raise ValueError(f"unknown Linear kind {lin.kind}")


def with_kernel(lin: Linear, kernel: jnp.ndarray, bias: Optional[jnp.ndarray] = None) -> Linear:
    """Re-quantize a (possibly LoRA-fused) float kernel into the same kind/in_scale
    (reference ``set_weight_tensor``, float8_quantize.py:209-212: re-derives the weight
    scale from the new amax but keeps the tuned input scale)."""
    bias = lin.bias if bias is None else bias
    if lin.kind == "float":
        return dataclasses.replace(lin, kernel=kernel.astype(lin.kernel.dtype), bias=bias)
    if lin.kind == "fp8":
        fresh = quantize_linear_fp8(kernel, bias)
    elif lin.kind == "int8":
        fresh = quantize_linear_int8(kernel, bias)
    elif lin.kind == "int4":
        fresh = quantize_linear_int4(kernel, bias)
    elif lin.kind.startswith("wo_"):
        raise ValueError(
            f"re-quantizing a weight-only ({lin.kind}) leaf is not supported — "
            "weight-only tiers are load-time only (text encoders)"
        )
    else:
        raise ValueError(f"unknown Linear kind {lin.kind}")
    return dataclasses.replace(
        fresh, in_scale=lin.in_scale, in_scale_inv=lin.in_scale_inv
    )


def with_input_scale(lin: Linear, amax: jnp.ndarray) -> Linear:
    """Set the tuned input scale from a calibrated running amax
    (reference ``quantize_input`` freeze path, float8_quantize.py:238-246)."""
    if lin.kind == "fp8":
        scale = amax_to_scale(jnp.asarray(amax), F8_INPUT_MAX)
    elif lin.kind in ("int8", "int4"):
        # both feed int8-quantized activations to the MXU → same 127/amax law
        scale = int8_amax_to_scale(jnp.asarray(amax))
    else:  # float and weight-only kinds don't quantize activations
        return lin
    return dataclasses.replace(lin, in_scale=scale, in_scale_inv=1.0 / scale)


# ----------------------------------------------------------- weight-only quantization
#
# TPU-native replacements for the reference's text-encoder quantization backends
# (conditioner.py:17-35): quanto qfloat8 → "wo_fp8", bnb int8 → "wo_int8",
# bnb nf4 → "wo_int4" (symmetric blockwise int4 — same memory tier; we trade nf4's
# codebook for MXU-friendly symmetric levels), quanto qint2 → "wo_int2".
# Weight-only = activations stay in compute dtype; dequantize happens at the matmul.

WO_BLOCK = 64  # block size along in_features for int4/int2 blockwise scales


def quantize_linear_wo_fp8(kernel: jnp.ndarray, bias) -> Linear:
    """Per-out-channel e4m3 weight-only quantization."""
    k32 = kernel.astype(jnp.float32)
    amax = jnp.max(jnp.abs(k32), axis=-2)  # (out,)
    scale = amax_to_scale(amax, F8_WEIGHT_MAX)
    q = jnp.clip(k32 * scale[None, :], -F8_WEIGHT_MAX, F8_WEIGHT_MAX).astype(WEIGHT_F8_DTYPE)
    return Linear(q=q, w_scale=scale, w_scale_inv=1.0 / scale, bias=bias, kind="wo_fp8")


def quantize_linear_wo_int8(kernel: jnp.ndarray, bias) -> Linear:
    """Per-out-channel symmetric int8 weight-only quantization."""
    k32 = kernel.astype(jnp.float32)
    amax = jnp.max(jnp.abs(k32), axis=-2)
    scale = int8_amax_to_scale(amax)
    q = jnp.round(jnp.clip(k32 * scale[None, :], -INT8_MAX, INT8_MAX)).astype(jnp.int8)
    return Linear(q=q, w_scale=scale, w_scale_inv=1.0 / scale, bias=bias, kind="wo_int8")


def _blockwise_quantize(kernel: jnp.ndarray, bits: int):
    """(in, out) → packed uint8 + per-(block, out) fp32 reciprocal scales.

    Block size is WO_BLOCK when it divides in_features, else the whole column (small
    layers); dequant infers the block from the shapes.
    """
    in_f, out_f = kernel.shape
    block = WO_BLOCK if in_f % WO_BLOCK == 0 else in_f
    per_byte_req = 8 // bits
    assert in_f % per_byte_req == 0, f"in_features {in_f} not packable at {bits} bits"
    qmax = 2 ** (bits - 1) - 1  # 7 for int4, 1 for int2
    k32 = kernel.astype(jnp.float32).reshape(in_f // block, block, out_f)
    amax = jnp.max(jnp.abs(k32), axis=1)  # (nblocks, out)
    scale = qmax / jnp.maximum(amax, 1e-12)
    q = jnp.round(jnp.clip(k32 * scale[:, None, :], -qmax, qmax)).astype(jnp.int32)
    q = (q + qmax).astype(jnp.uint8).reshape(in_f, out_f)  # offset-binary [0, 2^bits-2]
    per_byte = 8 // bits
    q = q.reshape(in_f // per_byte, per_byte, out_f)
    packed = jnp.zeros((in_f // per_byte, out_f), jnp.uint8)
    for j in range(per_byte):
        packed = packed | (q[:, j, :] << jnp.uint8(j * bits))
    return packed, (1.0 / scale)


def _blockwise_dequantize(packed: jnp.ndarray, scale_inv: jnp.ndarray, bits: int, dtype):
    """Unpack + scale staying in 8/16-bit intermediates: at T5-XXL sizes an int32/f32
    staging copy of a (4096, 10240) kernel costs 168MB per buffer — enough to tip a
    16GB chip that's also holding the 12GB flow model."""
    per_byte = 8 // bits
    qmax = 2 ** (bits - 1) - 1
    mask = jnp.uint8(2**bits - 1)
    in_packed, out_f = packed.shape
    parts = [
        ((packed >> jnp.uint8(j * bits)) & mask).astype(jnp.int8) - jnp.int8(qmax)
        for j in range(per_byte)
    ]
    q = jnp.stack(parts, axis=1).reshape(in_packed * per_byte, out_f)
    nblocks = scale_inv.shape[-2]
    k16 = q.reshape(nblocks, -1, out_f).astype(dtype) * scale_inv[..., :, None, :].astype(dtype)
    return k16.reshape(in_packed * per_byte, out_f)


def quantize_linear_wo_int4(kernel: jnp.ndarray, bias) -> Linear:
    packed, scale_inv = _blockwise_quantize(kernel, 4)
    return Linear(q=packed, w_scale_inv=scale_inv, bias=bias, kind="wo_int4")


def quantize_linear_wo_int2(kernel: jnp.ndarray, bias) -> Linear:
    packed, scale_inv = _blockwise_quantize(kernel, 2)
    return Linear(q=packed, w_scale_inv=scale_inv, bias=bias, kind="wo_int2")


WO_QUANTIZERS = {
    "qfloat8": quantize_linear_wo_fp8,
    "qint8": quantize_linear_wo_int8,
    "qint4": quantize_linear_wo_int4,
    "qint2": quantize_linear_wo_int2,
}


def quantize_stacked_weight_only(blocks: dict, tier: str) -> dict:
    """Apply a weight-only tier to every depth-stacked float Linear leaf of an
    encoder blocks dict (shared by the T5 and CLIP loaders — the reference
    quantizes the whole HF module via quanto/bnb, conditioner.py:56-70)."""
    qfn = WO_QUANTIZERS[tier]

    def quant_stacked(lin: Linear) -> Linear:
        if lin.kind != "float":
            return lin
        if lin.bias is not None:
            return jax.vmap(qfn)(lin.kernel, lin.bias)
        return jax.vmap(lambda k: qfn(k, None))(lin.kernel)

    return {k: (quant_stacked(v) if isinstance(v, Linear) else v) for k, v in blocks.items()}




# ------------------------------------------------------------------------------ forward


def linear_apply(
    lin: Linear,
    x: jnp.ndarray,
    compute_dtype: jnp.dtype = jnp.bfloat16,
    collect_amax: bool = False,
    dequant: bool = False,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Apply a linear layer; optionally also return max|x| for scale calibration.

    The quantized paths mirror ``F8Linear.forward`` (float8_quantize.py:272-296):
    saturate-cast the input with the current input scale, low-precision dot, multiply by
    both scale reciprocals, add bias. Accumulation is fp32 (vs the reference's
    `use_fast_accum=True` reduced-precision accumulate — strictly tighter numerics).

    ``dequant=True`` routes the quantized-*activation* kinds (fp8/int8/int4) through
    an on-the-fly weight-dequantize + bf16 matmul instead — the QLoRA-style training
    forward. The serving kinds round/cast activations to int8/e5m2, which has a
    zero/undefined gradient wrt x, so backprop through a frozen quantized base needs
    this differentiable path; it is also what QLoRA itself does (dequantize NF4 →
    bf16 GEMM). Weight-only kinds already compute this way.

    ``lin.lora_a``/``lora_b`` (when set) add the low-rank side branch
    ``(x @ A) @ B`` — gradients reach A/B regardless of the base kind.

    Returns (out, amax) with amax=None unless ``collect_amax``.
    """
    amax = jnp.max(jnp.abs(x)).astype(jnp.float32) if collect_amax else None
    out = _linear_base(lin, x, compute_dtype, dequant)
    if lin.lora_a is not None:
        h = jnp.dot(
            x.astype(compute_dtype),
            lin.lora_a.astype(compute_dtype),
            preferred_element_type=jnp.float32,
        ).astype(compute_dtype)
        delta = jnp.dot(
            h, lin.lora_b.astype(compute_dtype), preferred_element_type=jnp.float32
        )
        out = out + delta.astype(out.dtype)
    return out, amax


def _linear_base(
    lin: Linear, x: jnp.ndarray, compute_dtype: jnp.dtype, dequant: bool
) -> jnp.ndarray:
    if dequant and lin.kind in ("fp8", "int8", "int4"):
        # differentiable QLoRA forward: dequantized weights, full-precision
        # activations. (in,out)·(out,) broadcasting covers both the fp8 scalar and
        # the int8/int4 per-out-channel w_scale_inv layouts.
        q = _unpack_int4(lin.q) if lin.kind == "int4" else lin.q
        k = q.astype(compute_dtype) * lin.w_scale_inv.astype(compute_dtype)
        out = jnp.dot(x.astype(compute_dtype), k, preferred_element_type=jnp.float32)
        if lin.bias is not None:
            out = out + lin.bias.astype(jnp.float32)
        return out.astype(compute_dtype)

    if lin.kind == "float":
        out = jnp.dot(
            x.astype(compute_dtype),
            lin.kernel.astype(compute_dtype),
            preferred_element_type=jnp.float32,
        )
        if lin.bias is not None:
            out = out + lin.bias.astype(jnp.float32)
        return out.astype(compute_dtype)

    if lin.kind == "fp8":
        x8 = to_fp8_saturated(x.astype(jnp.float32), lin.in_scale, F8_INPUT_MAX).astype(
            INPUT_F8_DTYPE
        )
        # v5e MXU has no fp8 feed: promote both operands to bf16 (exact — bf16 ⊇ fp8
        # in exponent range and e4m3/e5m2 mantissas fit bf16's 8 bits).
        out = jnp.dot(
            x8.astype(jnp.bfloat16),
            lin.q.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
        out = out * (lin.in_scale_inv * lin.w_scale_inv)
        if lin.bias is not None:
            out = out + lin.bias.astype(jnp.float32)
        return out.astype(compute_dtype)

    if lin.kind == "int8":
        # quantize the activation in bf16: products ≤127 in magnitude are exactly
        # representable post-round, and the 2-byte intermediates halve HBM transients
        # vs an f32 staging buffer (the Pallas kernel fuses this entirely in VMEM).
        sc = lin.in_scale.astype(jnp.bfloat16)
        x8 = jnp.round(
            jnp.clip(x.astype(jnp.bfloat16) * sc, -INT8_MAX, INT8_MAX)
        ).astype(jnp.int8)
        out = jax.lax.dot_general(
            x8,
            lin.q,
            (((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        # dequantize by the reciprocal of the scale ACTUALLY applied (bf16-rounded):
        # using the stored f32 in_scale_inv would leave a systematic bf16(s)/s gain
        # of up to ~0.2% on every layer
        out = out.astype(jnp.float32) * ((1.0 / sc.astype(jnp.float32)) * lin.w_scale_inv)
        if lin.bias is not None:
            out = out + lin.bias.astype(jnp.float32)
        return out.astype(compute_dtype)

    if lin.kind == "int4":
        # gigaquant flow tier: nibble-unpack onto the int8 grid (values already in
        # [-7, 7]) and take the exact int8 MXU path — same activation quantize, same
        # per-channel epilogue. The unpack is one cheap VPU pass; HBM kernel reads
        # halve vs int8/fp8.
        sc = lin.in_scale.astype(jnp.bfloat16)
        x8 = jnp.round(
            jnp.clip(x.astype(jnp.bfloat16) * sc, -INT8_MAX, INT8_MAX)
        ).astype(jnp.int8)
        out = jax.lax.dot_general(
            x8,
            _unpack_int4(lin.q),
            (((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        out = out.astype(jnp.float32) * ((1.0 / sc.astype(jnp.float32)) * lin.w_scale_inv)
        if lin.bias is not None:
            out = out + lin.bias.astype(jnp.float32)
        return out.astype(compute_dtype)

    if lin.kind in ("wo_fp8", "wo_int8"):
        # weight-only: dequantize the kernel into the compute dtype, full-precision
        # activations (reference quanto/bnb tiers for T5/CLIP, conditioner.py:17-35).
        k = lin.q.astype(compute_dtype) * lin.w_scale_inv.astype(compute_dtype)[None, :]
        out = jnp.dot(x.astype(compute_dtype), k, preferred_element_type=jnp.float32)
        if lin.bias is not None:
            out = out + lin.bias.astype(jnp.float32)
        return out.astype(compute_dtype)

    if lin.kind in ("wo_int4", "wo_int2"):
        bits = 4 if lin.kind == "wo_int4" else 2
        k = _blockwise_dequantize(lin.q, lin.w_scale_inv, bits, compute_dtype)
        out = jnp.dot(x.astype(compute_dtype), k, preferred_element_type=jnp.float32)
        if lin.bias is not None:
            out = out + lin.bias.astype(jnp.float32)
        return out.astype(compute_dtype)

    raise ValueError(f"unknown Linear kind {lin.kind}")
