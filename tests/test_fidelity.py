"""fp8/int8 vs float fidelity harness (BASELINE north star: SSIM ≥ 0.95)."""

import numpy as np
import pytest
from PIL import Image

from flux_fp8_api_tpu.utils.fidelity import psnr, ssim

from .test_pipeline import decode_jpeg, make_pipeline


class TestSSIMMetric:
    def test_identical_is_one(self):
        img = (np.random.RandomState(0).rand(64, 64, 3) * 255).astype(np.uint8)
        assert ssim(img, img) == pytest.approx(1.0)

    def test_noise_degrades(self):
        rng = np.random.RandomState(0)
        img = (rng.rand(64, 64) * 255).astype(np.float64)
        noisy = img + rng.randn(64, 64) * 40
        s = ssim(img, noisy)
        assert 0.0 < s < 0.9

    def test_shifted_mean_mostly_preserved(self):
        img = (np.random.RandomState(0).rand(64, 64) * 200).astype(np.float64)
        s = ssim(img, img + 5.0)
        assert s > 0.95  # small brightness shift barely affects SSIM

    def test_psnr(self):
        img = np.zeros((16, 16))
        assert psnr(img, img) == float("inf")
        assert psnr(img, img + 16.0) == pytest.approx(24.08, abs=0.1)


class TestQuantFidelity:
    """fp8/int8 pipelines vs the float pipeline, same seed — the SSIM gate from
    BASELINE.json, on the tiny random-init model (real-weight fidelity is gated the
    same way once checkpoints are present)."""

    GEN = dict(prompt="a photo of a cat", width=64, height=64, num_steps=4, seed=123, silent=True)

    def _image(self, quant_kind):
        pipe = make_pipeline(quant_kind=quant_kind)
        if quant_kind:
            pipe.compile()  # calibrate + freeze scales before the measured image
        return decode_jpeg(pipe.generate(**self.GEN)).astype(np.float64)

    def test_fp8_ssim(self):
        ref = self._image(None)
        out = self._image("fp8")
        s = ssim(ref, out)
        assert s >= 0.90, f"fp8 SSIM {s}"  # random-init tiny model; real weights ≥0.95

    def test_int8_ssim(self):
        ref = self._image(None)
        out = self._image("int8")
        s = ssim(ref, out)
        assert s >= 0.90, f"int8 SSIM {s}"

    def test_fp8_fast_accum_ssim(self):
        """The shipped fp8 tier (fp8_fast_accum: e4m3 → int8 MXU compute) must clear
        the same fidelity gate as the exact-fp8 and int8 tiers."""
        from flux_fp8_api_tpu.ops.quant import tree_fp8_to_int8_compute

        ref = self._image(None)
        pipe = make_pipeline(quant_kind="fp8")
        pipe.model_params = tree_fp8_to_int8_compute(pipe.model_params)
        pipe.compile()  # calibrates under the int8 law
        out = decode_jpeg(pipe.generate(**self.GEN)).astype(np.float64)
        s = ssim(ref, out)
        assert s >= 0.90, f"fp8 fast-accum SSIM {s}"

    def test_int4_ssim_gigaquant(self):
        """The gigaquant tier is explicitly a quality-for-memory trade (reference
        README calls it 'worse quality'); gate it loosely — sane, recognizable
        images, well below the fp8/int8 bar."""
        ref = self._image(None)
        out = self._image("int4")
        s = ssim(ref, out)
        assert s >= 0.5, f"int4 SSIM {s}"
