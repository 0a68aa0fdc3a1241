"""End-to-end LoRA trainer CLI: images+captions dir → train → kohya file → reload.

Covers train_lora.py's full surface on the tiny CPU config: dataset listing (caption
conventions), VAE/T5/CLIP pre-encode through the pipeline's own jits, the QLoRA train
loop, and that the written file round-trips into pipeline.load_lora.
"""

import os

import jax
import numpy as np
import pytest
from PIL import Image

from flux_fp8_api_tpu.train_lora import list_examples, train

CONFIG = os.path.join(os.path.dirname(__file__), "..", "configs", "config-tiny-cpu.json")


@pytest.fixture(scope="module")
def dataset_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("lora_data")
    rng = np.random.default_rng(0)
    for i, stem in enumerate(["red_fox", "blue_bird"]):
        arr = rng.integers(0, 255, (80, 96, 3), dtype=np.uint8)
        Image.fromarray(arr).save(d / f"{stem}.png")
    # one explicit caption file, one filename-stem fallback
    (d / "red_fox.txt").write_text("a (red:1.2) fox in snow")
    return str(d)


class TestDatasetListing:
    def test_caption_sources(self, dataset_dir):
        pairs = list_examples(dataset_dir)
        assert len(pairs) == 2
        by_stem = {os.path.basename(p): c for p, c in pairs}
        assert by_stem["blue_bird.png"] == "blue bird"  # filename fallback
        assert by_stem["red_fox.png"] == "a (red:1.2) fox in snow"  # .txt wins

    def test_empty_dir_raises(self, tmp_path):
        with pytest.raises(ValueError, match="no images"):
            list_examples(str(tmp_path))


class TestTrainerCli:
    def test_train_and_reload(self, dataset_dir, tmp_path):
        out = str(tmp_path / "tiny_lora.safetensors")
        result = train([
            "--config-path", CONFIG,
            "--data-dir", dataset_dir,
            "--output", out,
            "--rank", "2",
            "--steps", "3",
            "--lr", "1e-3",
            "--batch-size", "2",
            "--width", "64",
            "--height", "64",
            "--save-every", "2",
        ])
        assert result == out and os.path.exists(out)

        # the exported file loads through the serving LoRA path and changes pixels
        from flux_fp8_api_tpu.pipeline import FluxPipeline

        pipe = FluxPipeline.load_pipeline_from_config_path(CONFIG)
        img_before = pipe.generate(
            prompt="a red fox", width=64, height=64, num_steps=1, seed=7, silent=True
        )
        b_before = img_before.getvalue() if hasattr(img_before, "getvalue") else img_before
        pipe.load_lora(out, scale=1.0)
        img_after = pipe.generate(
            prompt="a red fox", width=64, height=64, num_steps=1, seed=7, silent=True
        )
        b_after = img_after.getvalue() if hasattr(img_after, "getvalue") else img_after
        assert b_before != b_after  # trained (nonzero-b after 3 steps) adapters took effect

    def test_resume_and_validation(self, tmp_path):
        """--state-dir resumes exactly (step counter restored, loop continues from
        it); --val-every reports a held-out loss. Uses a 5-image set so the
        validation holdout engages."""
        rng = np.random.default_rng(1)
        d = tmp_path / "data"
        d.mkdir()
        for i in range(5):
            arr = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
            Image.fromarray(arr).save(d / f"item_{i}.png")
        out = str(tmp_path / "lora.safetensors")
        state = str(tmp_path / "state")
        common = [
            "--config-path", CONFIG, "--data-dir", str(d), "--output", out,
            "--rank", "2", "--lr", "1e-3", "--width", "64", "--height", "64",
            "--state-dir", state, "--val-every", "2",
        ]
        train(common + ["--steps", "2", "--save-every", "2"])
        assert os.path.isdir(state)
        # resume: start_step=2 == steps → loop is skipped, artifacts rewritten
        train(common + ["--steps", "2"])
        assert os.path.exists(out)

    def test_resume_mid_epoch_matches_uninterrupted(self, tmp_path):
        """Interrupt-and-resume ≡ uninterrupted (VERDICT r3 item 9): a run
        checkpointed MID-epoch (cursor inside the permutation, before the
        reshuffle) and resumed must produce the same adapters as one straight
        run — the trainer fast-forwards the data order and PRNG stream to the
        restored step, so resume is a continuation, not a replay."""
        rng = np.random.default_rng(2)
        d = tmp_path / "data"
        d.mkdir()
        for i in range(3):  # n=3, bs=1 → epoch = 3 steps; checkpoint at 2 is mid-epoch
            arr = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
            Image.fromarray(arr).save(d / f"item_{i}.png")
        common = [
            "--config-path", CONFIG, "--data-dir", str(d),
            "--rank", "2", "--lr", "1e-3", "--width", "64", "--height", "64",
            "--batch-size", "1",
        ]
        out_a = str(tmp_path / "straight.safetensors")
        train(common + ["--output", out_a, "--steps", "4"])  # crosses the reshuffle

        out_b = str(tmp_path / "resumed.safetensors")
        state = str(tmp_path / "state")
        train(common + ["--output", out_b, "--steps", "2", "--state-dir", state])
        train(common + ["--output", out_b, "--steps", "4", "--state-dir", state])

        from flux_fp8_api_tpu.utils.safetensors_io import SafetensorsFile

        fa, fb = SafetensorsFile(out_a), SafetensorsFile(out_b)
        assert set(fa.keys()) == set(fb.keys()) and len(list(fa.keys())) > 0
        for k in fa.keys():
            np.testing.assert_allclose(
                np.asarray(fa.get(k), np.float32), np.asarray(fb.get(k), np.float32),
                atol=1e-6, rtol=1e-6, err_msg=k,
            )
