"""Pallas fused quantized matmul: exactness vs the XLA reference path (interpret mode
on CPU; kernel-speed comparisons live in the TPU bench history)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flux_fp8_api_tpu.ops import qmatmul


def _pallas_interpret(x8, q, wsi, isi, bias, kind):
    # route through pallas_call in interpret mode by monkeypatching is unnecessary:
    # quantized_matmul exposes no interpret flag (it's a serving kernel), so test the
    # kernel math through pl.pallas_call directly.
    import functools

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    M, K = x8.shape
    _, N = q.shape
    tk = qmatmul._pick_tk(K)
    kern = qmatmul._qmm_kernel_int8 if kind == "int8" else qmatmul._qmm_kernel_fp8
    acc_dtype = jnp.int32 if kind == "int8" else jnp.float32
    return pl.pallas_call(
        kern,
        grid=(M // qmatmul.TM, N // qmatmul.TN, K // tk),
        in_specs=[
            pl.BlockSpec((qmatmul.TM, tk), lambda m, n, k: (m, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((tk, qmatmul.TN), lambda m, n, k: (k, n), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, qmatmul.TN), lambda m, n, k: (0, n), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, qmatmul.TN), lambda m, n, k: (0, n), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (qmatmul.TM, qmatmul.TN), lambda m, n, k: (m, n), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((qmatmul.TM, qmatmul.TN), acc_dtype)],
        interpret=True,
    )(x8, q, wsi.reshape(1, N).astype(jnp.float32), isi.reshape(1), bias.reshape(1, N))


class TestQuantizedMatmul:
    def test_supports(self):
        assert qmatmul.supports(4608, 3072, 21504)
        assert qmatmul.supports(512, 1536, 512)
        assert not qmatmul.supports(100, 3072, 512)  # M not tile-aligned
        assert not qmatmul.supports(512, 3100, 512)  # K has no tile divisor

    def test_int8_exact_vs_xla(self):
        M, K, N = 512, 1024, 512
        x8 = jax.random.randint(jax.random.PRNGKey(0), (M, K), -127, 128, dtype=jnp.int8)
        q = jax.random.randint(jax.random.PRNGKey(1), (K, N), -127, 128, dtype=jnp.int8)
        wsi = jnp.full((N,), 1e-4, jnp.float32)
        isi = jnp.float32(1 / 30.0)
        bias = jnp.full((N,), 0.25, jnp.bfloat16)
        out = _pallas_interpret(x8, q, wsi, isi, bias, "int8")
        ref = (
            jax.lax.dot_general(x8, q, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
            .astype(jnp.float32)
            * (wsi * isi)
            + 0.25
        ).astype(jnp.bfloat16)
        # int32 accumulation is exact; the f32 scale epilogue may differ by one bf16
        # ulp in multiply association on rounding-boundary elements
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32), rtol=0.01, atol=1e-3
        )

    def test_fp8_close_vs_xla(self):
        M, K, N = 512, 512, 512
        x8 = (jax.random.normal(jax.random.PRNGKey(0), (M, K)) * 20).astype(jnp.float8_e5m2)
        q = (jax.random.normal(jax.random.PRNGKey(1), (K, N)) * 20).astype(jnp.float8_e4m3fn)
        wsi = jnp.full((N,), 1e-2, jnp.float32)
        isi = jnp.float32(1 / 20.0)
        bias = jnp.zeros((N,), jnp.bfloat16)
        out = _pallas_interpret(x8, q, wsi, isi, bias, "fp8")
        ref = (
            jnp.dot(
                x8.astype(jnp.bfloat16), q.astype(jnp.bfloat16), preferred_element_type=jnp.float32
            )
            * (wsi * isi)
        ).astype(jnp.bfloat16)
        rel = float(
            jnp.linalg.norm(out.astype(jnp.float32) - ref.astype(jnp.float32))
            / jnp.linalg.norm(ref.astype(jnp.float32))
        )
        assert rel < 1e-2, rel
