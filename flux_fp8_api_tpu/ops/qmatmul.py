"""Pallas MXU kernels for quantized matmuls — the TPU-native `torch._scaled_mm`.

The reference's hot op is cuBLASLt's fp8 GEMM with fused scale epilogue
(float8_quantize.py:284-292). Here the analog is a Pallas kernel that keeps the
low-precision dot's accumulator in VMEM and applies the dequant scales + bias in the
epilogue, writing bf16 straight to HBM — XLA's generic path round-trips an int32/f32
accumulator buffer (hundreds of MB per layer at FLUX sizes) through HBM instead.

Two operand modes, mirroring :mod:`.quant`'s Linear kinds:
- int8 × int8 → int32 acc (the v5e MXU's 2× throughput path), per-out-channel weight
  scales + per-tensor input scale;
- e5m2 × e4m3 (stored fp8, upcast to bf16 in VMEM — v5e has no fp8 MXU feed) → f32 acc,
  per-tensor scales.

Activations are pre-quantized by the caller (one fused elementwise op); the kernel's
job is the matmul + epilogue fusion. Tiles are (TM=512, TN=512, TK≤1536) — all FLUX
layer shapes divide these; callers fall back to the XLA path otherwise.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TM = 512
TN = 512


def _pick_tk(K: int) -> int:
    for tk in (1536, 1280, 1024, 768, 512, 384, 256):
        if K % tk == 0:
            return tk
    return 0


def supports(M: int, K: int, N: int) -> bool:
    return M % TM == 0 and N % TN == 0 and _pick_tk(K) > 0


def _qmm_kernel_int8(x_ref, q_ref, wsi_ref, isi_ref, bias_ref, o_ref, acc_ref):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jax.lax.dot_general(
        x_ref[:], q_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )

    @pl.when(k == pl.num_programs(2) - 1)
    def _():
        scale = wsi_ref[:] * isi_ref[0]  # (1, TN) f32 ⊙ scalar
        out = acc_ref[:].astype(jnp.float32) * scale
        o_ref[:] = (out + bias_ref[:].astype(jnp.float32)).astype(o_ref.dtype)


def _qmm_kernel_fp8(x_ref, q_ref, wsi_ref, isi_ref, bias_ref, o_ref, acc_ref):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # v5e MXU takes bf16 — the e5m2/e4m3 → bf16 upcasts are exact
    acc_ref[:] += jax.lax.dot_general(
        x_ref[:].astype(jnp.bfloat16),
        q_ref[:].astype(jnp.bfloat16),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(k == pl.num_programs(2) - 1)
    def _():
        out = acc_ref[:] * (wsi_ref[:] * isi_ref[0])
        o_ref[:] = (out + bias_ref[:].astype(jnp.float32)).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("out_dtype", "kernel_kind")
)
def quantized_matmul(
    x8: jnp.ndarray,
    q: jnp.ndarray,
    w_scale_inv: jnp.ndarray,
    in_scale_inv: jnp.ndarray,
    bias: jnp.ndarray,
    out_dtype=jnp.bfloat16,
    kernel_kind: str = "int8",
) -> jnp.ndarray:
    """(M, K) quantized activations × (K, N) quantized weights → (M, N) out_dtype.

    w_scale_inv: (N,) f32 (int8 per-channel) or broadcastable scalar reshaped by the
    caller to (N,). in_scale_inv: () f32. bias: (N,) (zeros if the layer has none).
    """
    M, K = x8.shape
    K2, N = q.shape
    assert K == K2
    tk = _pick_tk(K)
    grid = (M // TM, N // TN, K // tk)
    acc_dtype = jnp.int32 if kernel_kind == "int8" else jnp.float32
    kern = _qmm_kernel_int8 if kernel_kind == "int8" else _qmm_kernel_fp8

    wsi2d = w_scale_inv.reshape(1, N).astype(jnp.float32)
    bias2d = bias.reshape(1, N)
    isi = in_scale_inv.reshape(1).astype(jnp.float32)

    flops = 2 * M * K * N
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TM, tk), lambda m, n, k: (m, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((tk, TN), lambda m, n, k: (k, n), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TN), lambda m, n, k: (0, n), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, TN), lambda m, n, k: (0, n), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TM, TN), lambda m, n, k: (m, n), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        scratch_shapes=[pltpu.VMEM((TM, TN), acc_dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=M * K + K * N + 2 * M * N, transcendentals=0
        ),
    )(x8, q, wsi2d, isi, bias2d)
