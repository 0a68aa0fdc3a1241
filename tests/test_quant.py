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
