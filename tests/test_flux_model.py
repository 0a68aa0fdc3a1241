"""Tiny-config Flux DiT tests: shapes, determinism, quantization tiers, calibration."""

import jax
import jax.numpy as jnp
import numpy as np

from flux_fp8_api_tpu.calibration import apply_input_scales, merge_amax
from flux_fp8_api_tpu.models.flux import (
    FluxStatic,
    flux_apply,
    quantize_flux_tree,
)
from flux_fp8_api_tpu.ops.quant import Linear

from .helpers import TINY_FLUX_PARAMS, tiny_flux, tiny_inputs


class TestForward:
    def test_output_shape(self):
        cfg, params = tiny_flux()
        inp = tiny_inputs()
        out = flux_apply(params, cfg, **inp)
        assert out.shape == inp["img"].shape
        assert out.dtype == jnp.bfloat16

    def test_deterministic(self):
        cfg, params = tiny_flux()
        inp = tiny_inputs()
        o1 = flux_apply(params, cfg, **inp)
        o2 = flux_apply(params, cfg, **inp)
        np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))

    def test_jit_compiles(self):
        cfg, params = tiny_flux()
        inp = tiny_inputs(batch=2)
        jitted = jax.jit(flux_apply, static_argnames=("cfg", "collect_amax"))
        out = jitted(params, cfg=cfg, **inp)
        assert out.shape == inp["img"].shape

    def test_timestep_affects_output(self):
        cfg, params = tiny_flux()
        inp = tiny_inputs()
        o1 = flux_apply(params, cfg, **inp)
        inp2 = dict(inp, timesteps=jnp.full((1,), 0.9))
        o2 = flux_apply(params, cfg, **inp2)
        assert float(jnp.max(jnp.abs(o1.astype(jnp.float32) - o2.astype(jnp.float32)))) > 1e-3

    def test_guidance_required_when_embedded(self):
        cfg, params = tiny_flux()
        inp = tiny_inputs()
        inp["guidance"] = None
        try:
            flux_apply(params, cfg, **inp)
            raised = False
        except ValueError:
            raised = True
        assert raised

    def test_fp16_clamp_policy(self):
        cfg, params = tiny_flux(compute_dtype="float16")
        assert cfg.do_clamp
        inp = tiny_inputs()
        out = flux_apply(params, cfg, **inp)
        assert out.dtype == jnp.float16


class TestQuantizationTiers:
    def test_default_tier_partition(self):
        _, params = tiny_flux()
        q = quantize_flux_tree(params)  # defaults: modulation yes, embedders no
        # final layer never quantized (float8_quantize.py:476)
        assert q["final_layer"]["linear"].kind == "float"
        assert q["final_layer"]["adaln"].kind == "float"
        # embedders stay float by default
        assert q["img_in"].kind == "float"
        assert q["time_in"]["in_layer"].kind == "float"
        # attention/mlp quantize
        assert q["double_blocks"]["img_attn_qkv"].kind == "fp8"
        assert q["single_blocks"]["linear1"].kind == "fp8"
        # modulation quantizes by default
        assert q["double_blocks"]["img_mod_lin"].kind == "fp8"

    def test_no_modulation_tier(self):
        _, params = tiny_flux()
        q = quantize_flux_tree(params, quantize_modulation=False)
        assert q["double_blocks"]["img_mod_lin"].kind == "float"
        assert q["single_blocks"]["mod_lin"].kind == "float"
        assert q["double_blocks"]["img_attn_qkv"].kind == "fp8"

    def test_embedder_tier(self):
        _, params = tiny_flux()
        q = quantize_flux_tree(params, quantize_flow_embedder_layers=True)
        assert q["img_in"].kind == "fp8"
        assert q["time_in"]["in_layer"].kind == "fp8"
        assert q["guidance_in"]["out_layer"].kind == "fp8"

    def test_stacked_q_shapes(self):
        _, params = tiny_flux()
        q = quantize_flux_tree(params)
        qkv = q["double_blocks"]["img_attn_qkv"]
        assert qkv.q.shape == (TINY_FLUX_PARAMS.depth, 64, 192)
        assert qkv.q.dtype == jnp.float8_e4m3fn
        assert qkv.w_scale.shape == (TINY_FLUX_PARAMS.depth,)

    def test_int8_tier(self):
        _, params = tiny_flux()
        q = quantize_flux_tree(params, kind="int8")
        lin = q["single_blocks"]["linear1"]
        assert lin.kind == "int8"
        assert lin.q.dtype == jnp.int8
        # per-out-channel scales, stacked over depth
        assert lin.w_scale.shape == (TINY_FLUX_PARAMS.depth_single_blocks, 64 * 3 + 256)


class TestQuantizedForwardAndCalibration:
    def _calibrated(self, kind="fp8", trials=4):
        cfg, params = tiny_flux()
        qparams = quantize_flux_tree(params, kind=kind)
        inp = tiny_inputs()
        running = None
        for t in range(trials):
            inp_t = dict(inp, timesteps=jnp.full((1,), 1.0 - t / trials))
            _, amaxes = flux_apply(qparams, cfg, **inp_t, collect_amax=True)
            running = merge_amax(running, amaxes)
        qparams = apply_input_scales(qparams, running)
        return cfg, params, qparams, inp

    def test_calibration_sets_scales(self):
        cfg, params, qparams, inp = self._calibrated()
        qkv = qparams["double_blocks"]["img_attn_qkv"]
        # scales must differ per block and no longer be the 1.0 placeholder
        s = np.asarray(qkv.in_scale)
        assert s.shape == (TINY_FLUX_PARAMS.depth,)
        assert not np.allclose(s, 1.0)
        # float leaves untouched
        assert qparams["final_layer"]["linear"].kind == "float"

    def test_fp8_output_close_to_float(self):
        cfg, params, qparams, inp = self._calibrated("fp8")
        ref = flux_apply(params, cfg, **inp).astype(jnp.float32)
        out = flux_apply(qparams, cfg, **inp).astype(jnp.float32)
        rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
        assert rel < 0.15, f"fp8 flux output rel err {rel}"

    def test_int8_output_close_to_float(self):
        cfg, params, qparams, inp = self._calibrated("int8")
        ref = flux_apply(params, cfg, **inp).astype(jnp.float32)
        out = flux_apply(qparams, cfg, **inp).astype(jnp.float32)
        rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
        assert rel < 0.10, f"int8 flux output rel err {rel}"

    def test_amax_tree_structure(self):
        cfg, params = tiny_flux()
        qparams = quantize_flux_tree(params)
        inp = tiny_inputs()
        _, amaxes = flux_apply(qparams, cfg, **inp, collect_amax=True)
        assert amaxes["double_blocks"]["img_attn_qkv"].shape == (TINY_FLUX_PARAMS.depth,)
        assert amaxes["single_blocks"]["linear1"].shape == (
            TINY_FLUX_PARAMS.depth_single_blocks,
        )
        assert amaxes["img_in"].shape == ()


class TestMaxLogitBound:
    def test_unit_scales_bound_is_sqrt_head_dim(self):
        from flux_fp8_api_tpu.models.flux import max_logit_bound

        cfg, params = tiny_flux()
        b = max_logit_bound(params, cfg)
        assert abs(b - cfg.head_dim**0.5) < 1e-4  # all scales init to 1

    def test_inflated_scales_raise_bound(self):
        from flux_fp8_api_tpu.models.flux import max_logit_bound

        cfg, params = tiny_flux()
        params["single_blocks"]["qnorm"] = params["single_blocks"]["qnorm"] * 40.0
        b = max_logit_bound(params, cfg)
        assert b > 40 * cfg.head_dim**0.5 * 0.9


class TestPipelineLogitGuard:
    def test_adversarial_norm_scales_force_xla_attention(self):
        """A checkpoint whose qk-norm scales could overflow the max-free kernel's
        exp must auto-fall back to XLA attention at load (no NaN images)."""
        from flux_fp8_api_tpu.ops.attention_kernel import MAX_SAFE_LOGIT

        from .test_pipeline import make_pipeline

        pipe = make_pipeline(use_pallas=True)
        assert pipe.model_cfg.use_pallas  # sane scales keep the kernel

        import jax.numpy as jnp

        from flux_fp8_api_tpu.models.autoencoder import init_autoencoder_params
        from flux_fp8_api_tpu.pipeline import FluxPipeline
        from .helpers import TINY_AE_PARAMS, tiny_flux, tiny_spec, tiny_text_encoders

        cfg, params = tiny_flux(use_pallas=True)
        params["single_blocks"]["qnorm"] = params["single_blocks"]["qnorm"] * 100.0
        clip, t5 = tiny_text_encoders()
        ae = init_autoencoder_params(jax.random.PRNGKey(5), TINY_AE_PARAMS)
        pipe = FluxPipeline(
            name="flux-dev", clip=clip, t5=t5, model=params, model_cfg=cfg, ae=ae,
            config=tiny_spec(text_enc_max_length=32, num_scale_trials=3),
            prequantized=False,
        )
        assert not pipe.model_cfg.use_pallas
