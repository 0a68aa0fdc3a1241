"""Gradio UI helpers (the UI itself needs the gradio wheel, absent on TPU images —
the pure logic is tested here; build_ui raises a clear ImportError without it)."""

import json

import numpy as np
import pytest
from PIL import Image

from flux_fp8_api_tpu.main_gr import (
    RESOLUTION_PRESETS,
    attach_metadata,
    build_ui,
    gr,
    resolve_seed,
    settings_record,
)


class TestSeedResolution:
    def test_blank_and_minus_one_mean_random(self):
        assert resolve_seed("") is None
        assert resolve_seed("  ") is None
        assert resolve_seed("-1") is None
        assert resolve_seed(None) is None

    def test_numeric(self):
        assert resolve_seed("42") == 42
        assert resolve_seed(0) == 0

    def test_garbage_falls_back_to_random(self):
        assert resolve_seed("not a seed") is None


class TestSettingsRecord:
    def test_roundtrip_and_types(self):
        rec = settings_record("a cat", 1024.0, 768.0, 28.0, 3.5, 7)
        assert rec == {
            "prompt": "a cat", "width": 1024, "height": 768,
            "num_steps": 28, "guidance": 3.5, "seed": 7,
        }
        assert "strength" not in rec
        rec2 = settings_record("a cat", 64, 64, 2, 3.5, 7, strength=0.8)
        assert rec2["strength"] == 0.8

    def test_attach_metadata_survives_png_roundtrip(self):
        """The metadata must live in the saved FILE's tEXt chunk, not just the
        in-memory info dict (PIL drops .info on save without an explicit PngInfo)."""
        import os

        im = Image.fromarray(np.zeros((8, 8, 3), np.uint8))
        rec = settings_record("x", 64, 64, 2, 3.5, 1)
        path = attach_metadata(im, rec)
        try:
            reloaded = Image.open(path)
            assert json.loads(reloaded.info["parameters"]) == rec
        finally:
            os.unlink(path)


class TestPresets:
    def test_all_presets_are_multiples_of_16(self):
        for name, wh in RESOLUTION_PRESETS.items():
            if wh is None:
                continue
            w, h = wh
            assert w % 16 == 0 and h % 16 == 0, name


@pytest.mark.skipif(gr is not None, reason="gradio installed: gate not reachable")
def test_build_ui_without_gradio_raises_clear_error():
    with pytest.raises(ImportError, match="gradio is not installed"):
        build_ui(pipeline=None)
