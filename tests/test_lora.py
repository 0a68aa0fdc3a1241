"""LoRA subsystem tests: format conversion, delta math, fuse/unfuse roundtrips,
registry semantics, fp8 interaction."""

import jax
import jax.numpy as jnp
import numpy as np

from flux_fp8_api_tpu import lora
from flux_fp8_api_tpu.models.flux import flux_apply, quantize_flux_tree
from flux_fp8_api_tpu.ops.quant import dequantize_kernel

from .helpers import TINY_FLUX_PARAMS, tiny_flux, tiny_inputs

HS = TINY_FLUX_PARAMS.hidden_size
RANK = 4


def make_kohya_lora(seed=0, scale_alpha=None):
    """Synthetic kohya-format LoRA touching double & single blocks (tiny config)."""
    rng = np.random.RandomState(seed)
    sd = {}

    def add(stub, inf, outf):
        sd[f"lora_unet_{stub}.lora_down.weight"] = rng.randn(RANK, inf).astype(np.float32) * 0.05
        sd[f"lora_unet_{stub}.lora_up.weight"] = rng.randn(outf, RANK).astype(np.float32) * 0.05
        if scale_alpha is not None:
            sd[f"lora_unet_{stub}.alpha"] = np.float32(scale_alpha)

    add("double_blocks_0_img_attn_proj", HS, HS)
    add("double_blocks_1_txt_attn_proj", HS, HS)
    add("single_blocks_0_linear2", HS + 4 * HS, HS)
    return sd


def make_diffusers_lora(seed=0):
    """Synthetic diffusers-format LoRA with separate q/k/v factors (tests the
    fused-qkv concat + zero-fill path) and one missing member."""
    rng = np.random.RandomState(seed)
    sd = {}

    def add(stub, inf, outf, rank=RANK):
        sd[f"transformer.{stub}.lora_A.weight"] = rng.randn(rank, inf).astype(np.float32) * 0.05
        sd[f"transformer.{stub}.lora_B.weight"] = rng.randn(outf, rank).astype(np.float32) * 0.05

    add("transformer_blocks.0.attn.to_q", HS, HS)
    add("transformer_blocks.0.attn.to_k", HS, HS)
    # to_v intentionally missing → zero-fill
    add("transformer_blocks.0.attn.to_out.0", HS, HS)
    add("single_transformer_blocks.1.attn.to_q", HS, HS)
    add("single_transformer_blocks.1.attn.to_k", HS, HS)
    add("single_transformer_blocks.1.attn.to_v", HS, HS)
    add("single_transformer_blocks.1.proj_mlp", HS, 4 * HS)
    return sd


class TestConversion:
    def test_kohya_keys(self):
        keys, sd = lora.resolve_lora_state_dict(make_kohya_lora())
        assert "double_blocks.0.img_attn.proj" in keys
        assert "single_blocks.0.linear2" in keys
        assert "double_blocks.0.img_attn.proj.lora_A.weight" in sd

    def test_diffusers_qkv_concat_with_zero_fill(self):
        keys, sd = lora.resolve_lora_state_dict(make_diffusers_lora())
        assert "double_blocks.0.img_attn.qkv" in keys
        a = sd["double_blocks.0.img_attn.qkv.lora_A.weight"]
        b = sd["double_blocks.0.img_attn.qkv.lora_B.weight"]
        assert a.shape == (3 * RANK, HS)
        assert b.shape == (3 * HS, RANK)
        # missing to_v → third chunk of A is zero
        np.testing.assert_array_equal(a[2 * RANK :], 0.0)

    def test_diffusers_single_block_linear1(self):
        keys, sd = lora.resolve_lora_state_dict(make_diffusers_lora())
        assert "single_blocks.1.linear1" in keys
        b = sd["single_blocks.1.linear1.lora_B.weight"]
        assert b.shape == (3 * HS + 4 * HS, RANK)


class TestDeltaMath:
    def test_plain_delta(self):
        A = np.random.RandomState(0).randn(RANK, 8).astype(np.float32)
        B = np.random.RandomState(1).randn(6, RANK).astype(np.float32)
        delta = lora.calculate_lora_delta(A, B, None, 2.0)
        np.testing.assert_allclose(delta, 2.0 * B @ A, rtol=1e-6)

    def test_alpha_scaling(self):
        A = np.ones((RANK, 8), np.float32)
        B = np.ones((6, RANK), np.float32)
        d1 = lora.calculate_lora_delta(A, B, RANK, 1.0)
        d2 = lora.calculate_lora_delta(A, B, RANK / 2, 1.0)
        np.testing.assert_allclose(d2, d1 / 2, rtol=1e-6)

    def test_uneven_rank_chunked(self):
        # A has 3x the rank rows (fused qkv concat); delta = sum of B @ chunks
        A = np.random.RandomState(0).randn(3 * RANK, 8).astype(np.float32)
        B = np.random.RandomState(1).randn(6, RANK).astype(np.float32)
        delta = lora.calculate_lora_delta(A, B, None, 1.0)
        expect = sum(B @ c for c in np.split(A, 3, axis=0))
        np.testing.assert_allclose(delta, expect, rtol=1e-5)


class TestFuseUnfuse:
    def test_float_fuse_changes_output_unfuse_restores(self):
        cfg, params = tiny_flux()
        inp = tiny_inputs()
        ref = flux_apply(params, cfg, **inp).astype(jnp.float32)

        p2, reg = lora.pipeline_load_lora(params, cfg, [], make_kohya_lora(), scale=1.0, name="test")
        assert len(reg) == 1
        out_fused = flux_apply(p2, cfg, **inp).astype(jnp.float32)
        assert float(jnp.max(jnp.abs(out_fused - ref))) > 1e-4

        p3, reg = lora.pipeline_unload_lora(p2, cfg, reg, "test")
        assert len(reg) == 0
        out_restored = flux_apply(p3, cfg, **inp).astype(jnp.float32)
        np.testing.assert_allclose(np.asarray(out_restored), np.asarray(ref), atol=1e-4)

    def test_fuse_exact_weight_math(self):
        cfg, params = tiny_flux()
        sd = make_kohya_lora()
        keys, bfl = lora.resolve_lora_state_dict(sd)
        w_before = np.asarray(params["double_blocks"]["img_attn_proj"].kernel[0])
        p2 = lora.fuse_lora(params, cfg, bfl, keys, 0.7)
        w_after = np.asarray(p2["double_blocks"]["img_attn_proj"].kernel[0])
        delta = lora.calculate_lora_delta(
            bfl["double_blocks.0.img_attn.proj.lora_A.weight"],
            bfl["double_blocks.0.img_attn.proj.lora_B.weight"],
            None,
            0.7,
        )
        np.testing.assert_allclose(w_after, w_before + delta.T, atol=1e-5)
        # untouched slice 1 unchanged
        np.testing.assert_array_equal(
            np.asarray(p2["double_blocks"]["img_attn_proj"].kernel[1]),
            np.asarray(params["double_blocks"]["img_attn_proj"].kernel[1]),
        )

    def test_fp8_fuse_requantizes_slice(self):
        cfg, params = tiny_flux()
        qparams = quantize_flux_tree(params)
        sd = make_kohya_lora()
        keys, bfl = lora.resolve_lora_state_dict(sd)
        before = qparams["double_blocks"]["img_attn_proj"]
        p2 = lora.fuse_lora(qparams, cfg, bfl, keys, 1.0)
        after = p2["double_blocks"]["img_attn_proj"]
        # fused slice changed, untouched slice identical
        assert float(jnp.max(jnp.abs(
            dequantize_kernel(jax.tree.map(lambda x: x[0], after))
            - dequantize_kernel(jax.tree.map(lambda x: x[0], before))
        ))) > 1e-4
        np.testing.assert_array_equal(np.asarray(after.q[1]), np.asarray(before.q[1]))
        # input scale preserved (not re-calibrated)
        np.testing.assert_array_equal(np.asarray(after.in_scale), np.asarray(before.in_scale))

    def test_fp8_fuse_unfuse_roundtrip_within_quant_noise(self):
        cfg, params = tiny_flux()
        qparams = quantize_flux_tree(params)
        inp = tiny_inputs()
        ref = flux_apply(qparams, cfg, **inp).astype(jnp.float32)
        p2, reg = lora.pipeline_load_lora(qparams, cfg, [], make_kohya_lora(), 1.0, "l1")
        p3, reg = lora.pipeline_unload_lora(p2, cfg, reg, "l1")
        out = flux_apply(p3, cfg, **inp).astype(jnp.float32)
        rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
        # two requantization cycles (fuse + unfuse) each add ~e4m3 rounding noise
        assert rel < 0.08, f"fp8 fuse/unfuse roundtrip err {rel}"


class TestRegistry:
    def test_same_scale_is_noop(self):
        cfg, params = tiny_flux()
        sd = make_kohya_lora()
        p2, reg = lora.pipeline_load_lora(params, cfg, [], sd, 1.0, "x")
        p3, reg2 = lora.pipeline_load_lora(p2, cfg, reg, sd, 1.0, "x")
        assert p3 is p2 and len(reg2) == 1

    def test_rescale(self):
        cfg, params = tiny_flux()
        inp = tiny_inputs()
        sd = make_kohya_lora()
        # load at 2.0 directly vs load at 1.0 then rescale to 2.0 — must match
        pa, _ = lora.pipeline_load_lora(params, cfg, [], sd, 2.0, "x")
        pb, reg = lora.pipeline_load_lora(params, cfg, [], dict(sd), 1.0, "x")
        pb, reg = lora.pipeline_load_lora(pb, cfg, reg, dict(sd), 2.0, "x")
        assert reg[0].scale == 2.0
        oa = flux_apply(pa, cfg, **inp).astype(jnp.float32)
        ob = flux_apply(pb, cfg, **inp).astype(jnp.float32)
        np.testing.assert_allclose(np.asarray(oa), np.asarray(ob), atol=1e-4)

    def test_unload_unknown_is_noop(self):
        cfg, params = tiny_flux()
        p2, reg = lora.pipeline_unload_lora(params, cfg, [], "nope")
        assert p2 is params and reg == []

    def test_int4_fuse_unfuse_roundtrip_within_quant_noise(self):
        """LoRA into the gigaquant (packed int4) tier: dequant→fuse→requant must keep
        packing/scales consistent and round-trip within int4 noise."""
        cfg, params = tiny_flux()
        qparams = quantize_flux_tree(params, kind="int4")
        inp = tiny_inputs()
        ref = flux_apply(qparams, cfg, **inp).astype(jnp.float32)
        p2, reg = lora.pipeline_load_lora(qparams, cfg, [], make_kohya_lora(), 1.0, "l1")
        assert p2["double_blocks"]["img_attn_proj"].kind == "int4"
        mid = flux_apply(p2, cfg, **inp).astype(jnp.float32)
        assert float(jnp.linalg.norm(mid - ref)) > 0  # the fuse did something
        p3, reg = lora.pipeline_unload_lora(p2, cfg, reg, "l1")
        out = flux_apply(p3, cfg, **inp).astype(jnp.float32)
        rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
        # int4's grid is 16x coarser than e4m3's mantissa — allow more requant noise
        assert rel < 0.35, f"int4 fuse/unfuse roundtrip err {rel}"


class TestHeterogeneousZeroFill:
    """single-block linear1 members are q/k/v (out=hidden) + proj_mlp (out=4*hidden):
    missing members must zero-fill with THEIR out dim, not the first present one's
    (the reference reuses the last-present shape, lora_loading.py:375-401, which
    makes attention-only LoRAs — a common peft target_modules choice — crash)."""

    def _attn_only_lora(self):
        rng = np.random.RandomState(3)
        sd = {}
        for m in ("to_q", "to_k", "to_v"):
            sd[f"transformer.single_transformer_blocks.0.attn.{m}.lora_A.weight"] = (
                rng.randn(RANK, HS).astype(np.float32) * 0.05
            )
            sd[f"transformer.single_transformer_blocks.0.attn.{m}.lora_B.weight"] = (
                rng.randn(HS, RANK).astype(np.float32) * 0.05
            )
        return sd

    def test_attention_only_single_block_shapes(self):
        keys, sd = lora.resolve_lora_state_dict(self._attn_only_lora())
        b = sd["single_blocks.0.linear1.lora_B.weight"]
        assert b.shape == (3 * HS + 4 * HS, RANK)  # mlp rows zero-filled at 4*hidden
        assert np.all(b[3 * HS :] == 0)

    def test_attention_only_fuses_and_runs(self):
        cfg, params = tiny_flux()
        p2, reg = lora.pipeline_load_lora(params, cfg, [], self._attn_only_lora(), 1.0, "a")
        out = flux_apply(p2, cfg, **tiny_inputs())
        assert bool(jnp.all(jnp.isfinite(out.astype(jnp.float32))))

    def test_mlp_only_single_block(self):
        rng = np.random.RandomState(4)
        sd = {
            "transformer.single_transformer_blocks.0.proj_mlp.lora_A.weight":
                rng.randn(RANK, HS).astype(np.float32) * 0.05,
            "transformer.single_transformer_blocks.0.proj_mlp.lora_B.weight":
                rng.randn(4 * HS, RANK).astype(np.float32) * 0.05,
        }
        keys, out = lora.resolve_lora_state_dict(sd)
        b = out["single_blocks.0.linear1.lora_B.weight"]
        assert b.shape == (3 * HS + 4 * HS, RANK)
        assert np.all(b[: 3 * HS] == 0)  # attn rows zero-filled at hidden each


class TestSchnellGuidanceLora:
    def test_guidance_keys_skipped_on_schnell_tree(self):
        """BFL-space LoRA touching guidance_in must be skipped (not crash) when the
        model has no guidance embedder."""
        import dataclasses as dc

        from .helpers import TINY_FLUX_PARAMS
        from flux_fp8_api_tpu.models.flux import FluxStatic, init_flux_params

        p = TINY_FLUX_PARAMS.model_copy(update={"guidance_embed": False})
        cfg = FluxStatic.from_params(p, use_pallas=False)
        params = init_flux_params(jax.random.PRNGKey(0), cfg, jnp.float32)
        assert params["guidance_in"] is None
        rng = np.random.RandomState(5)
        sd = {
            "guidance_in.in_layer.lora_A.weight": rng.randn(RANK, 256).astype(np.float32),
            "guidance_in.in_layer.lora_B.weight": rng.randn(64, RANK).astype(np.float32),
        }
        keys = ["guidance_in.in_layer"]
        p2 = lora.fuse_lora(params, cfg, sd, keys, 1.0)
        assert p2["guidance_in"] is None
