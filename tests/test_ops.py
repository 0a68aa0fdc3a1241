"""Unit tests for the core math ops, against hand-derived values and reference formulas
(SURVEY.md §7 build step 2)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flux_fp8_api_tpu.ops import packing, rope, schedule
from flux_fp8_api_tpu.ops.math import (
    layer_norm,
    modulate,
    rms_norm,
    timestep_embedding,
)


class TestSchedule:
    def test_time_shift_endpoints(self):
        # t=1 → exp(mu)/(exp(mu)+0) = 1 for any mu
        assert schedule.time_shift(0.7, 1.0, 1.0) == pytest.approx(1.0)
        # mu=0, t=0.5 → 1/(1+1) = 0.5
        assert schedule.time_shift(0.0, 1.0, 0.5) == pytest.approx(0.5)
        # hand-computed: mu=1, sigma=1, t=0.25 → e/(e+3)
        assert schedule.time_shift(1.0, 1.0, 0.25) == pytest.approx(
            math.e / (math.e + 3.0)
        )

    def test_lin_function(self):
        f = schedule.get_lin_function(y1=0.5, y2=1.15)
        assert f(256) == pytest.approx(0.5)
        assert f(4096) == pytest.approx(1.15)
        # midpoint
        assert f((256 + 4096) / 2) == pytest.approx((0.5 + 1.15) / 2)

    def test_schedule_no_shift(self):
        ts = schedule.get_schedule(4, 1024, shift=False)
        assert ts == pytest.approx([1.0, 0.75, 0.5, 0.25, 0.0])

    def test_schedule_shift_monotone_and_endpoints(self):
        ts = schedule.get_schedule(28, 4096, shift=True)
        assert len(ts) == 29
        assert ts[0] == pytest.approx(1.0)
        assert ts[-1] == pytest.approx(0.0)
        assert all(a > b for a, b in zip(ts[:-1], ts[1:]))
        # shift=True with large seq favors high timesteps: midpoint above linear
        assert ts[14] > 0.5

    def test_schedule_shift_matches_reference_formula(self):
        # mu at seq_len 4096 is exactly max_shift=1.15 per the lin function
        ts = schedule.get_schedule(2, 4096, shift=True)
        mu = 1.15
        t = 0.5
        expected = math.exp(mu) / (math.exp(mu) + (1 / t - 1))
        assert ts[1] == pytest.approx(expected, rel=1e-6)


class TestTimestepEmbedding:
    def test_shape_and_values(self):
        t = jnp.array([0.5])
        emb = timestep_embedding(t, 8)
        assert emb.shape == (1, 8)
        # time_factor=1000: args[0] = 500 * 1.0 → cos(500), sin(500). fp32 argument
        # reduction of 500 rad costs ~1e-5 accuracy — use atol accordingly.
        np.testing.assert_allclose(emb[0, 0], math.cos(500.0), atol=1e-4)
        np.testing.assert_allclose(emb[0, 4], math.sin(500.0), atol=1e-4)
        # frequency k: exp(-ln(10000) * k / half)
        freq1 = math.exp(-math.log(10000) * 1 / 4)
        np.testing.assert_allclose(emb[0, 1], math.cos(500.0 * freq1), atol=1e-4)

    def test_odd_dim_zero_pad(self):
        emb = timestep_embedding(jnp.array([0.1]), 7)
        assert emb.shape == (1, 7)
        assert emb[0, -1] == 0.0


class TestNorms:
    def test_rms_norm_hand_value(self):
        x = jnp.array([[3.0, 4.0]])  # rms = sqrt(12.5)
        out = rms_norm(x, jnp.ones(2))
        np.testing.assert_allclose(
            np.asarray(out), np.array([[3.0, 4.0]]) / math.sqrt(12.5 + 1e-6), rtol=1e-6
        )

    def test_rms_norm_fp32_internally(self):
        # bf16 input with large values: fp32 compute keeps scale-invariance exact
        x = (jnp.ones((1, 256)) * 300.0).astype(jnp.bfloat16)
        out = rms_norm(x, jnp.ones(256))
        assert out.dtype == jnp.bfloat16
        np.testing.assert_allclose(np.asarray(out, np.float32), 1.0, rtol=1e-2)

    def test_layer_norm(self):
        x = jnp.array([[1.0, 2.0, 3.0, 4.0]])
        out = np.asarray(layer_norm(x))
        np.testing.assert_allclose(out.mean(), 0.0, atol=1e-6)
        np.testing.assert_allclose(out.std(), 1.0, rtol=1e-3)

    def test_modulate(self):
        x = jnp.ones((1, 2, 3))
        out = modulate(x, shift=jnp.full((1, 1, 3), 0.5), scale=jnp.full((1, 1, 3), 2.0))
        np.testing.assert_allclose(np.asarray(out), 3.5)


class TestRope:
    def test_rope_zero_position_is_identity(self):
        cos, sin = rope.rope_cos_sin(jnp.zeros((4,)), 16, 10000)
        np.testing.assert_allclose(np.asarray(cos), 1.0)
        np.testing.assert_allclose(np.asarray(sin), 0.0)

    def test_rope_frequencies(self):
        pos = jnp.array([2.0])
        dim, theta = 8, 10000
        cos, sin = rope.rope_cos_sin(pos, dim, theta)
        # omega_k = theta^(-2k/dim)
        for k in range(4):
            omega = theta ** (-2 * k / dim)
            np.testing.assert_allclose(cos[0, k], math.cos(2 * omega), rtol=1e-5)
            np.testing.assert_allclose(sin[0, k], math.sin(2 * omega), rtol=1e-5)

    def test_apply_rope_rotation_norm_preserving(self):
        key = jax.random.PRNGKey(0)
        q = jax.random.normal(key, (1, 6, 2, 16))
        ids = jnp.broadcast_to(jnp.arange(6.0)[None, :, None], (1, 6, 1))
        cos, sin = rope.embed_nd_cos_sin(ids, (16,), 10000)
        cos, sin = cos[:, :, None, :], sin[:, :, None, :]
        q_rot, _ = rope.apply_rope(q, q, cos, sin)
        # rotation preserves the full-vector norm
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(q_rot), axis=-1),
            np.linalg.norm(np.asarray(q), axis=-1),
            rtol=1e-5,
        )

    def test_apply_rope_hand_value(self):
        # half-split pair (x0, x1) = (1, 0) rotated by angle a → (cos a, sin a)
        x = jnp.array([[[[1.0, 0.0]]]])  # (1,1,1,2): pair is (ch0, ch1) via halves
        a = 0.3
        cos = jnp.full((1, 1, 1, 2), math.cos(a))
        sin = jnp.full((1, 1, 1, 2), math.sin(a))
        out, _ = rope.apply_rope(x, x, cos, sin)
        np.testing.assert_allclose(
            np.asarray(out)[0, 0, 0], [math.cos(a), math.sin(a)], rtol=1e-6
        )

    def test_embed_nd_concat(self):
        ids = jnp.zeros((1, 5, 3))
        cos, sin = rope.embed_nd_cos_sin(ids, (16, 56, 56), 10000)
        assert cos.shape == (1, 5, 128)  # full head_dim width (duplicated halves)
        assert sin.shape == (1, 5, 128)

    def test_attention_scores_match_interleaved_reference_after_permutation(self):
        """Half-split rope + the deinterleave channel permutation must produce the
        same q·kᵀ scores as the reference's interleaved-pair rotation
        (flux_model.py:49-65) on the *unpermuted* channels."""
        key = jax.random.PRNGKey(3)
        kq, kk = jax.random.split(key)
        seq, dim = 7, 16
        q = jax.random.normal(kq, (seq, dim))
        k = jax.random.normal(kk, (seq, dim))
        pos = jnp.arange(seq, dtype=jnp.float32)

        # deinterleave permutation: channel 2j → j, 2j+1 → j + dim/2
        perm = rope.deinterleave_permutation(dim)
        q_p, k_p = q[:, perm], k[:, perm]

        ids = pos[None, :, None]
        cos, sin = rope.embed_nd_cos_sin(ids, (dim,), 10000)
        q_ours, k_ours = rope.apply_rope(q_p[None], k_p[None], cos, sin)
        scores_ours = np.asarray(q_ours[0] @ k_ours[0].T)

        # reference: interleaved (x[2j], x[2j+1]) pairs with the same angles
        c_half, s_half = rope.rope_cos_sin(pos, dim, 10000)  # (seq, dim/2)
        c_half, s_half = np.asarray(c_half), np.asarray(s_half)

        def rot_interleaved(x):
            x = np.asarray(x)
            even, odd = x[..., 0::2], x[..., 1::2]
            out = np.empty_like(x)
            out[..., 0::2] = c_half * even - s_half * odd
            out[..., 1::2] = s_half * even + c_half * odd
            return out

        scores_ref = rot_interleaved(q) @ rot_interleaved(k).T
        np.testing.assert_allclose(scores_ours, scores_ref, rtol=1e-4, atol=1e-4)


class TestPacking:
    def test_pack_unpack_roundtrip(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 8, 12))
        packed = packing.pack_latents(x)
        assert packed.shape == (2, 4 * 6, 64)
        # unpack expects pixel-space height/width = latent*8
        unpacked = packing.unpack_latents(packed, 8 * 8, 12 * 8)
        np.testing.assert_allclose(np.asarray(unpacked), np.asarray(x))

    def test_pack_channel_order(self):
        # One 2x2 patch, 2 channels: packed order must be (c, ph, pw)
        x = jnp.arange(8.0).reshape(1, 2, 2, 2)  # c0: [[0,1],[2,3]], c1: [[4,5],[6,7]]
        packed = packing.pack_latents(x)
        np.testing.assert_allclose(
            np.asarray(packed)[0, 0], [0, 1, 2, 3, 4, 5, 6, 7]
        )

    def test_img_ids(self):
        ids = packing.make_img_ids(4, 6, 2)  # latent 4x6 → grid 2x3
        assert ids.shape == (2, 6, 3)
        np.testing.assert_allclose(np.asarray(ids[0, :, 0]), 0.0)
        np.testing.assert_allclose(np.asarray(ids[0, :, 1]), [0, 0, 0, 1, 1, 1])
        np.testing.assert_allclose(np.asarray(ids[0, :, 2]), [0, 1, 2, 0, 1, 2])


class TestAttentionBlockChooser:
    """ops/attention._pick_blocks: measured table for serving shapes, exact square
    divisors elsewhere, tail-masked fallback only when nothing divides."""

    def test_measured_serving_shapes(self):
        from flux_fp8_api_tpu.ops.attention import _pick_blocks

        assert _pick_blocks(4608) == (768, 1536, False)  # 1024x1024
        assert _pick_blocks(3392) == (848, 1696, False)  # 1024x720
        assert _pick_blocks(2816) == (1408, 2816, True)  # 768x768 (full-kv const wins)

    def test_schnell_and_512_shapes_pinned(self):
        from flux_fp8_api_tpu.ops.attention import _pick_blocks

        assert _pick_blocks(4352) == (1088, 2176, False)  # schnell 1024x1024
        assert _pick_blocks(2560) == (640, 1280, False)   # schnell 768x768
        assert _pick_blocks(1536) == (512, 1536, False)   # 512x512

    def test_square_divisor_fallback(self):
        from flux_fp8_api_tpu.ops.attention import _pick_blocks

        bq, bkv, const = _pick_blocks(3584)  # 1024x768 + 512 txt: unmeasured shape
        assert bq == bkv == 896 and 3584 % bq == 0 and const is False

    def test_masked_fallback_when_nothing_divides(self):
        from flux_fp8_api_tpu.ops.attention import _pick_blocks

        assert _pick_blocks(4104) == (456, 456, False)  # 8*513: largest square divisor
        assert _pick_blocks(37) == (512, 512, False)    # prime-ish tiny: tail masking
