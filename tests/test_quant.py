"""Golden-tensor tests for the fp8/int8 quantized-linear leaves (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flux_fp8_api_tpu.ops import quant
from flux_fp8_api_tpu.ops.quant import (
    F8_INPUT_MAX,
    F8_WEIGHT_MAX,
    Linear,
    amax_to_scale,
    dequantize_kernel,
    linear_apply,
    quantize_linear_fp8,
    quantize_linear_int8,
    to_fp8_saturated,
    with_input_scale,
    with_kernel,
)


class TestScaleMath:
    def test_amax_to_scale_formula(self):
        # scale = clamp(max_val / clamp(amax, 1e-12), max=max_val) — float8_quantize.py:214-215
        np.testing.assert_allclose(float(amax_to_scale(jnp.float32(2.0), 448.0)), 224.0)
        # tiny amax clamps the scale at max_val
        np.testing.assert_allclose(float(amax_to_scale(jnp.float32(0.0), 448.0)), 448.0)
        np.testing.assert_allclose(
            float(amax_to_scale(jnp.float32(1e-20), 448.0)), 448.0
        )

    def test_fp8_constants(self):
        assert F8_WEIGHT_MAX == 448.0  # e4m3fn max
        assert F8_INPUT_MAX == 57344.0  # e5m2 max

    def test_saturation(self):
        x = jnp.array([10.0, -10.0])
        out = to_fp8_saturated(x, jnp.float32(100.0), 448.0)
        np.testing.assert_allclose(np.asarray(out), [448.0, -448.0])


class TestFp8Linear:
    def test_quantize_roundtrip_error_bound(self):
        key = jax.random.PRNGKey(0)
        w = jax.random.normal(key, (64, 32)) * 0.05
        lin = quantize_linear_fp8(w, None)
        assert lin.q.dtype == jnp.float8_e4m3fn
        deq = dequantize_kernel(lin)
        # e4m3 has 3 mantissa bits → relative error ≤ 2^-4 per element after scaling
        err = np.abs(np.asarray(deq) - np.asarray(w))
        assert err.max() <= float(jnp.max(jnp.abs(w))) * 2**-4 + 1e-8

    def test_weight_scale_maps_amax_to_fp8_max(self):
        w = jnp.array([[0.5, -2.0], [1.0, 0.25]])
        lin = quantize_linear_fp8(w, None)
        np.testing.assert_allclose(float(lin.w_scale), 448.0 / 2.0)
        # the amax element hits the format max exactly
        assert float(jnp.max(jnp.abs(lin.q.astype(jnp.float32)))) == 448.0

    def test_forward_matches_float_closely(self):
        key = jax.random.PRNGKey(1)
        k1, k2, k3 = jax.random.split(key, 3)
        w = jax.random.normal(k1, (128, 64)) * 0.02
        b = jax.random.normal(k2, (64,)) * 0.01
        x = jax.random.normal(k3, (4, 128))
        flin = Linear(kernel=w, bias=b, kind="float")
        qlin = quantize_linear_fp8(w, b)
        qlin = with_input_scale(qlin, jnp.max(jnp.abs(x)))
        ref, _ = linear_apply(flin, x, jnp.float32)
        out, _ = linear_apply(qlin, x, jnp.float32)
        rel = np.linalg.norm(np.asarray(out - ref)) / np.linalg.norm(np.asarray(ref))
        # e5m2 activations have 2 mantissa bits → ~6% vector error on random gaussians;
        # this matches the reference's e5m2-input scheme (float8_quantize.py:43).
        assert rel < 0.10, f"fp8 rel error too high: {rel}"

    def test_collect_amax(self):
        w = jnp.ones((8, 4))
        x = jnp.array([[1.0, -3.0, 2.0, 0.0, 0.0, 0.0, 0.0, 0.5]])
        lin = quantize_linear_fp8(w, None)
        _, amax = linear_apply(lin, x, jnp.float32, collect_amax=True)
        np.testing.assert_allclose(float(amax), 3.0)

    def test_with_kernel_requantizes_but_keeps_input_scale(self):
        w = jnp.ones((4, 4)) * 0.5
        lin = with_input_scale(quantize_linear_fp8(w, None), jnp.float32(2.0))
        old_in_scale = float(lin.in_scale)
        lin2 = with_kernel(lin, jnp.ones((4, 4)) * 4.0)
        assert float(lin2.in_scale) == old_in_scale
        np.testing.assert_allclose(float(lin2.w_scale), 448.0 / 4.0)
        np.testing.assert_allclose(np.asarray(dequantize_kernel(lin2)), 4.0, rtol=1e-6)


class TestInt8Linear:
    def test_per_channel_scales(self):
        w = jnp.array([[1.0, 10.0], [-2.0, 5.0]])  # (in=2, out=2), col amaxes 2, 10
        lin = quantize_linear_int8(w, None)
        np.testing.assert_allclose(np.asarray(lin.w_scale), [127.0 / 2.0, 127.0 / 10.0])
        np.testing.assert_allclose(
            np.asarray(lin.q), [[64, 127], [-127, 64]], atol=1
        )

    def test_forward_matches_float_closely(self):
        key = jax.random.PRNGKey(2)
        k1, k2 = jax.random.split(key)
        w = jax.random.normal(k1, (256, 128)) * 0.03
        x = jax.random.normal(k2, (8, 256))
        flin = Linear(kernel=w, bias=None, kind="float")
        qlin = with_input_scale(quantize_linear_int8(w, None), jnp.max(jnp.abs(x)))
        ref, _ = linear_apply(flin, x, jnp.float32)
        out, _ = linear_apply(qlin, x, jnp.float32)
        rel = np.linalg.norm(np.asarray(out - ref)) / np.linalg.norm(np.asarray(ref))
        assert rel < 0.02, f"int8 rel error too high: {rel}"


class TestPytree:
    def test_linear_is_jittable_pytree(self):
        w = jnp.ones((4, 4))
        lin = quantize_linear_fp8(w, jnp.zeros(4))

        @jax.jit
        def f(lin, x):
            return linear_apply(lin, x, jnp.float32)[0]

        out = f(lin, jnp.ones((1, 4)))
        assert out.shape == (1, 4)

    def test_stacked_linears_scan(self):
        # Linear leaves stacked on a depth axis must slice correctly under lax.scan
        def mk(i):
            return quantize_linear_fp8(jnp.full((4, 4), 0.1 * (i + 1)), None)

        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *[mk(i) for i in range(3)])
        assert stacked.q.shape == (3, 4, 4)

        def body(x, lin):
            out, _ = linear_apply(lin, x, jnp.float32)
            return out, jnp.sum(out)

        x, sums = jax.lax.scan(body, jnp.ones((1, 4)), stacked)
        assert x.shape == (1, 4)
        assert sums.shape == (3,)


class TestFp8FastAccum:
    """fp8 tier executed on the int8 MXU (ops/quant.py:fp8_to_int8_compute — the TPU
    analog of the reference's use_fast_accum, float8_quantize.py:284-292)."""

    def _fp8_leaf(self, key=0, in_f=64, out_f=48):
        k = jax.random.normal(jax.random.PRNGKey(key), (in_f, out_f)) * 0.02
        b = jnp.zeros((out_f,))
        return k, quantize_linear_fp8(k, b)

    def test_kernel_error_bounded_by_int8_grid(self):
        from flux_fp8_api_tpu.ops.quant import fp8_to_int8_compute

        k, lin8 = self._fp8_leaf()
        lin_i = fp8_to_int8_compute(lin8)
        assert lin_i.kind == "int8" and lin_i.q.dtype == jnp.int8
        # int8 re-grid of the e4m3 values: per-channel error ≤ half an int8 step
        k_fp8 = dequantize_kernel(lin8)
        k_int8 = dequantize_kernel(lin_i)
        step = np.asarray(lin_i.w_scale_inv)  # dequant step per channel
        err = np.abs(np.asarray(k_int8 - k_fp8))
        assert (err <= 0.5 * step[None, :] + 1e-9).all()
        # and the total error vs the float kernel stays fp8-tier-like
        rel = float(jnp.linalg.norm(k_int8 - k) / jnp.linalg.norm(k))
        rel_fp8 = float(jnp.linalg.norm(k_fp8 - k) / jnp.linalg.norm(k))
        assert rel < 1.5 * rel_fp8 + 0.01

    def test_uncalibrated_input_scale_stays_one(self):
        from flux_fp8_api_tpu.ops.quant import fp8_to_int8_compute

        _, lin8 = self._fp8_leaf()
        lin_i = fp8_to_int8_compute(lin8)
        np.testing.assert_array_equal(np.asarray(lin_i.in_scale), 1.0)

    def test_calibrated_input_scale_converts_law(self):
        from flux_fp8_api_tpu.ops.quant import fp8_to_int8_compute

        _, lin8 = self._fp8_leaf()
        lin8 = with_input_scale(lin8, jnp.float32(3.0))  # e5m2 law: 57344/3
        lin_i = fp8_to_int8_compute(lin8)
        # int8 law for the same amax: 127/3
        np.testing.assert_allclose(np.asarray(lin_i.in_scale), 127.0 / 3.0, rtol=1e-6)

    def test_forward_no_worse_than_exact_fp8(self):
        """Against the float ground truth, int8 compute must be at least as accurate
        as the exact e5m2×e4m3 path (int8's 127-level activation grid beats e5m2's
        2 mantissa bits for everything but near-zero values)."""
        from flux_fp8_api_tpu.ops.quant import fp8_to_int8_compute

        k, lin8 = self._fp8_leaf()
        lin8 = with_input_scale(lin8, jnp.float32(3.0))
        lin_i = fp8_to_int8_compute(lin8)
        x = jax.random.normal(jax.random.PRNGKey(7), (16, 64))
        truth = x @ k

        def rel(lin):
            out, _ = linear_apply(lin, x)
            return float(
                jnp.linalg.norm(out.astype(jnp.float32) - truth) / jnp.linalg.norm(truth)
            )

        rel_fp8, rel_i8 = rel(lin8), rel(lin_i)
        assert rel_i8 <= rel_fp8 * 1.05, (rel_i8, rel_fp8)
        assert rel_i8 < 0.10, rel_i8

    def test_stacked_leaves(self):
        from flux_fp8_api_tpu.ops.quant import fp8_to_int8_compute

        ks = jax.random.normal(jax.random.PRNGKey(1), (3, 32, 24)) * 0.02
        bs = jnp.zeros((3, 24))
        stacked = jax.vmap(quantize_linear_fp8)(ks, bs)
        lin_i = fp8_to_int8_compute(stacked)
        assert lin_i.q.shape == (3, 32, 24)
        assert lin_i.w_scale.shape == (3, 24)  # per-block, per-out-channel
        ref = jax.vmap(dequantize_kernel)(stacked)
        got = dequantize_kernel(lin_i) if lin_i.q.ndim == 2 else (
            lin_i.q.astype(jnp.float32) * lin_i.w_scale_inv[..., None, :]
        )
        rel = float(jnp.linalg.norm(got - ref) / jnp.linalg.norm(ref))
        assert rel < 0.01

    def test_non_fp8_passthrough(self):
        from flux_fp8_api_tpu.ops.quant import fp8_to_int8_compute, tree_fp8_to_int8_compute

        k = jax.random.normal(jax.random.PRNGKey(2), (8, 8))
        f = Linear(kernel=k, kind="float")
        assert fp8_to_int8_compute(f) is f
        i8 = quantize_linear_int8(k, None)
        assert fp8_to_int8_compute(i8) is i8
        tree = {"a": f, "nested": {"b": quantize_linear_fp8(k, None)}}
        out = tree_fp8_to_int8_compute(tree)
        assert out["a"] is f and out["nested"]["b"].kind == "int8"


class TestInt4Linear:
    """Packed int4 flow tier — the reference's gigaquant flow
    (config-dev-gigaquant.json: flow_quantization_dtype qint4 via quanto)."""

    def test_exact_roundtrip_on_grid(self):
        from flux_fp8_api_tpu.ops.quant import quantize_linear_int4

        # values that are exact multiples of amax/7 recover exactly
        # every column contains a ±7 so the quantization grid is exactly value/7
        grid = jnp.array([[-7, 3, 0], [7, -7, 2], [1, 1, -2], [-4, 0, 7]], jnp.float32) * 0.05
        lin = quantize_linear_int4(grid, None)
        assert lin.kind == "int4" and lin.q.dtype == jnp.uint8
        assert lin.q.shape == (2, 3)  # two rows per byte
        np.testing.assert_allclose(np.asarray(dequantize_kernel(lin)), np.asarray(grid), rtol=1e-6)

    def test_quantize_error_bound(self):
        from flux_fp8_api_tpu.ops.quant import quantize_linear_int4

        w = jax.random.normal(jax.random.PRNGKey(0), (256, 128)) * 0.03
        lin = quantize_linear_int4(w, None)
        dk = dequantize_kernel(lin)
        rel = np.linalg.norm(np.asarray(dk - w)) / np.linalg.norm(np.asarray(w))
        assert rel < 0.16, rel  # ~12% expected for per-channel int4 on normal weights

    def test_forward_matches_dequantized_matmul(self):
        from flux_fp8_api_tpu.ops.quant import quantize_linear_int4

        k1, k2 = jax.random.split(jax.random.PRNGKey(3))
        w = jax.random.normal(k1, (64, 32)) * 0.05
        x = jax.random.normal(k2, (4, 64))
        bias = jnp.ones((32,), jnp.float32)
        qlin = with_input_scale(quantize_linear_int4(w, bias), jnp.max(jnp.abs(x)))
        out, _ = linear_apply(qlin, x, jnp.float32)
        # reference computation: int8-quantized activations × dequantized int4 weights
        xs = float(qlin.in_scale)
        x8 = jnp.round(jnp.clip(x * xs, -127, 127))
        ref = (x8 @ np.asarray(dequantize_kernel(qlin)) / xs) + 1.0
        rel = np.linalg.norm(np.asarray(out - ref)) / np.linalg.norm(np.asarray(ref))
        assert rel < 0.02, rel

    def test_with_kernel_requantizes_keeping_input_scale(self):
        from flux_fp8_api_tpu.ops.quant import quantize_linear_int4

        w = jax.random.normal(jax.random.PRNGKey(4), (32, 16)) * 0.05
        lin = with_input_scale(quantize_linear_int4(w, None), jnp.float32(3.0))
        fused = with_kernel(lin, w * 2.0)
        assert fused.kind == "int4"
        np.testing.assert_allclose(np.asarray(fused.in_scale), np.asarray(lin.in_scale))
        rel = np.linalg.norm(np.asarray(dequantize_kernel(fused) - w * 2.0)) / np.linalg.norm(
            np.asarray(w * 2.0)
        )
        assert rel < 0.16

    def test_flux_tree_int4_forward_finite_and_close(self):
        from flux_fp8_api_tpu.models.flux import flux_apply, quantize_flux_tree

        from .helpers import tiny_flux, tiny_inputs

        cfg, params = tiny_flux()
        ref = flux_apply(params, cfg, **tiny_inputs()).astype(jnp.float32)
        q4 = quantize_flux_tree(params, kind="int4")
        assert q4["double_blocks"]["img_attn_qkv"].kind == "int4"
        out = flux_apply(q4, cfg, **tiny_inputs()).astype(jnp.float32)
        assert bool(jnp.all(jnp.isfinite(out)))
        rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
        assert rel < 0.6, rel  # gigaquant tier: coarse but sane on random weights
