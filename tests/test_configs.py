"""Config preset matrix: every shipped JSON parses and resolves (reference ships 11
hardware-tier presets; ours live in configs/)."""

import json
from pathlib import Path

import pytest

from flux_fp8_api_tpu.pipeline import FluxPipeline
from flux_fp8_api_tpu.utils.config import (
    ModelSpec,
    ModelVersion,
    into_device,
    into_dtype,
    load_config,
    load_config_from_path,
)

CONFIG_DIR = Path(__file__).parent.parent / "configs"
ALL_CONFIGS = sorted(CONFIG_DIR.glob("*.json"))


class TestConfigMatrix:
    @pytest.mark.parametrize("path", ALL_CONFIGS, ids=lambda p: p.name)
    def test_parses(self, path):
        spec = load_config_from_path(str(path))
        assert spec.params.hidden_size % spec.params.num_heads == 0
        assert sum(spec.params.axes_dim) == spec.params.hidden_size // spec.params.num_heads
        into_dtype(spec.flow_dtype)
        into_device(spec.flux_device)

    def test_reference_config_json_loads(self, tmp_path):
        """A verbatim reference config (cuda devices, stray keys) must parse —
        util.py:38-79 field compatibility."""
        ref = {
            "version": "flux-dev",
            "params": {
                "in_channels": 64, "vec_in_dim": 768, "context_in_dim": 4096,
                "hidden_size": 3072, "mlp_ratio": 4.0, "num_heads": 24, "depth": 19,
                "depth_single_blocks": 38, "axes_dim": [16, 56, 56], "theta": 10000,
                "qkv_bias": True, "guidance_embed": True,
            },
            "ae_params": {
                "resolution": 256, "in_channels": 3, "ch": 128, "out_ch": 3,
                "ch_mult": [1, 2, 4, 4], "num_res_blocks": 2, "z_channels": 16,
                "scale_factor": 0.3611, "shift_factor": 0.1159,
            },
            "ckpt_path": "/big/flux1-dev.sft",
            "ae_path": "/big/ae.sft",
            "repo_id": "black-forest-labs/FLUX.1-dev",
            "repo_flow": "flux1-dev.sft",
            "repo_ae": "ae.sft",
            "text_enc_max_length": 512,
            "text_enc_path": "city96/t5-v1_1-xxl-encoder-bf16",
            "text_enc_device": "cuda:1",
            "ae_device": "cuda:1",
            "flux_device": "cuda:0",
            "flow_dtype": "float16",
            "ae_dtype": "bfloat16",
            "text_enc_dtype": "bfloat16",
            "text_enc_quantization_dtype": "qfloat8",
            "ae_quantization_dtype": "qfloat8",
            "compile_extras": True,
            "compile_blocks": True,
            # the reference's own configs carry these misnamed keys, silently
            # ignored by pydantic (SURVEY.md §5 footgun note)
            "offload_ae": False,
            "offload_text_enc": False,
            "offload_flow": False,
        }
        p = tmp_path / "ref.json"
        p.write_text(json.dumps(ref))
        spec = load_config_from_path(str(p))
        assert spec.flow_dtype == "float16"
        # cuda devices map onto available hardware
        into_device(spec.flux_device)

    def test_cli_load_config_parity(self):
        spec = load_config(
            ModelVersion.flux_schnell,
            quant_text_enc="qint4",
            offload_flow=True,
            quantize_modulation=False,
        )
        assert spec.text_enc_max_length == 256
        assert not spec.params.guidance_embed
        assert str(spec.text_enc_quantization_dtype) == "qint4"
        assert spec.offload_flow and not spec.quantize_modulation


class TestPrequantizedPipeline:
    def test_save_then_load_via_config(self, tmp_path):
        from .test_pipeline import decode_jpeg, make_pipeline
        from .helpers import tiny_spec

        pipe = make_pipeline(quant_kind="fp8")
        pipe.compile()  # calibrate so scales are saved
        ref_img = decode_jpeg(
            pipe.generate(prompt="a cat", width=64, height=64, num_steps=2, seed=9, silent=True)
        )
        ckpt = str(tmp_path / "prequant.safetensors")
        pipe.save_prequantized(ckpt)

        spec = tiny_spec(
            version=pipe.config.version,
            ckpt_path=ckpt,
            prequantized_flow=True,
            text_enc_max_length=32,
            fp8_fast_accum=False,  # byte-exact fp8 round trip is what's under test
        )
        pipe2 = FluxPipeline.load_pipeline_from_config(spec)
        assert not pipe2._needs_calibration  # scales shipped in the checkpoint
        out = pipe2.generate(prompt="a cat", width=64, height=64, num_steps=2, seed=9, silent=True)
        img = decode_jpeg(out)
        assert img.shape == ref_img.shape
        # weights + scales identical; text encoders are random-init per pipeline, so
        # images differ — but the flow params must match bit-exactly
        import numpy as np

        np.testing.assert_array_equal(
            np.asarray(pipe.model_params["double_blocks"]["img_attn_qkv"].q),
            np.asarray(pipe2.model_params["double_blocks"]["img_attn_qkv"].q),
        )
        np.testing.assert_array_equal(
            np.asarray(pipe.model_params["double_blocks"]["img_attn_qkv"].in_scale),
            np.asarray(pipe2.model_params["double_blocks"]["img_attn_qkv"].in_scale),
        )

    def test_fast_accum_reload_converts_to_int8_compute(self, tmp_path):
        """With fp8_fast_accum (the TPU default) a saved fp8 checkpoint reloads as
        int8-compute leaves, scales converted to the int8 law."""
        from .test_pipeline import make_pipeline
        from .helpers import tiny_spec

        pipe = make_pipeline(quant_kind="fp8")
        pipe.compile()
        ckpt = str(tmp_path / "prequant.safetensors")
        pipe.save_prequantized(ckpt)

        spec = tiny_spec(
            version=pipe.config.version,
            ckpt_path=ckpt,
            prequantized_flow=True,
            text_enc_max_length=32,
            fp8_fast_accum=True,
        )
        pipe2 = FluxPipeline.load_pipeline_from_config(spec)
        assert not pipe2._needs_calibration
        leaf = pipe2.model_params["double_blocks"]["img_attn_qkv"]
        assert leaf.kind == "int8"
        import numpy as np

        # e5m2-law input scale (57344/amax) converted to int8 law (127/amax)
        np.testing.assert_allclose(
            np.asarray(leaf.in_scale),
            np.asarray(pipe.model_params["double_blocks"]["img_attn_qkv"].in_scale)
            * (127.0 / 57344.0),
            rtol=1e-6,
        )
        out = pipe2.generate(prompt="a cat", width=64, height=64, num_steps=1, seed=9, silent=True)
        from .test_pipeline import decode_jpeg

        assert decode_jpeg(out).shape == (64, 64, 3)

    def test_save_uncalibrated_raises(self):
        from .test_pipeline import make_pipeline

        pipe = make_pipeline(quant_kind="fp8")
        try:
            pipe.save_prequantized("/tmp/should_not_exist.safetensors")
            raised = False
        except RuntimeError:
            raised = True
        assert raised


class TestUnsupportedFlowTier:
    def test_qint2_flow_raises_loudly(self):
        """An unmapped flow tier must raise at load, not silently skip quantization
        (a 24GB bf16 flow would OOM the 16GB chip far from the misconfigured field)."""
        import pytest

        from flux_fp8_api_tpu.utils.loader import load_flow_model

        from .helpers import tiny_spec

        with pytest.raises(ValueError, match="qint2"):
            load_flow_model(tiny_spec(flow_quantization_dtype="qint2"))
