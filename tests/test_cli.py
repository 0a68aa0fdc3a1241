"""CLI flag parity with the reference launcher (reference main.py:6-148).

The flag *semantics* are part of the API surface: someone porting a launch command
from the reference must get identical behavior — in particular the inverted offload
switches (-OA/-OT disable offload, which defaults ON; reference main.py:105-120).
"""

from flux_fp8_api_tpu.main import parse_args
from flux_fp8_api_tpu.utils.config import ModelVersion, QuantizationDtype, load_config


class TestOffloadFlagSemantics:
    def test_defaults_match_reference(self):
        args = parse_args([])
        assert args.offload_flow is False  # -OF is opt-in (main.py:97-104)
        assert args.offload_ae is True  # default ON (main.py:105-112)
        assert args.offload_text_enc is True  # default ON (main.py:113-120)
        assert args.quantize_modulation is True
        assert args.quant_text_enc == "qfloat8"
        assert args.quant_ae is False

    def test_short_flags_invert(self):
        args = parse_args(["-OF", "-OA", "-OT", "-nqfm"])
        assert args.offload_flow is True
        assert args.offload_ae is False  # -OA *disables* ae offload
        assert args.offload_text_enc is False  # -OT *disables* text-enc offload
        assert args.quantize_modulation is False

    def test_long_flags(self):
        args = parse_args(
            ["--offload-flow", "--no-offload-ae", "--no-offload-text-enc",
             "--no-quantize-flow-modulation"]
        )
        assert args.offload_flow and not args.offload_ae and not args.offload_text_enc
        assert not args.quantize_modulation

    def test_quant_flags_match_reference_spelling(self):
        # reference uses -qT / -qA (main.py:81-96)
        args = parse_args(["-qT", "qint4", "-qA"])
        assert args.quant_text_enc == "qint4"
        assert args.quant_ae is True


class TestQuantSpelling:
    def test_load_config_accepts_reference_float8_spelling(self):
        """The reference maps only the literal "float8" (util.py:203-208) while its own
        CLI sends "qfloat8" — we accept both so either spelling quantizes T5."""
        for spelling in ("float8", "qfloat8"):
            spec = load_config(ModelVersion.flux_dev, quant_text_enc=spelling)
            assert spec.text_enc_quantization_dtype == QuantizationDtype.qfloat8

    def test_bf16_disables_text_enc_quant(self):
        spec = load_config(ModelVersion.flux_dev, quant_text_enc=None)
        assert spec.text_enc_quantization_dtype is None


class TestMeshFlag:
    def test_parse_mesh(self):
        from flux_fp8_api_tpu.main import parse_mesh

        assert parse_mesh("dp=1,tp=4") == {"dp": 1, "tp": 4}
        assert list(parse_mesh("tp=2,dp=4")) == ["tp", "dp"]  # axis order kept

    def test_parse_mesh_rejects_garbage(self):
        import pytest

        from flux_fp8_api_tpu.main import parse_mesh

        with pytest.raises(SystemExit):
            parse_mesh("dp:1")
        with pytest.raises(SystemExit):
            parse_mesh("dp=one")

    def test_flag_reaches_args(self):
        args = parse_args(["--mesh", "dp=1,tp=2"])
        assert args.mesh == "dp=1,tp=2"
        assert parse_args([]).mesh is None


class TestSavePrequantizedFlag:
    def test_cli_exports_and_reloads_prequantized_checkpoint(self, tmp_path):
        """--save-prequantized: calibrate → export → exit; the file round-trips
        through the -PF load path with calibration skipped (scales ship in the
        checkpoint — reference float8_quantize.py:91-193 dual-path load)."""
        import json

        import numpy as np
        from PIL import Image

        cfg = json.loads(open("configs/config-tiny-cpu.json").read())
        cfg["flow_quantization_dtype"] = "qfloat8"
        cfg["num_scale_trials"] = 2
        cfg["warmup_resolutions"] = [[64, 64]]
        cfg["warmup_steps"] = 2
        cfg_path = tmp_path / "cfg.json"
        cfg_path.write_text(json.dumps(cfg))
        out = tmp_path / "prequant.safetensors"

        from flux_fp8_api_tpu.main import main

        main(["--config-path", str(cfg_path), "--save-prequantized", str(out)])
        assert out.exists() and out.stat().st_size > 0

        cfg["ckpt_path"] = str(out)
        cfg["prequantized_flow"] = True
        cfg2 = tmp_path / "cfg2.json"
        cfg2.write_text(json.dumps(cfg))

        from flux_fp8_api_tpu.pipeline import FluxPipeline

        pipe = FluxPipeline.load_pipeline_from_config_path(str(cfg2))
        assert not pipe._needs_calibration  # scales came from the file
        buf = pipe.generate(prompt="x", width=64, height=64, num_steps=1, seed=0, silent=True)
        img = np.array(Image.open(buf))
        assert img.shape == (64, 64, 3)
