"""End-to-end pipeline tests on the tiny config (SURVEY.md §7 step 5: the minimum
CPU-runnable slice — schnell-like 4-step low-res generation)."""

import io

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from flux_fp8_api_tpu.models.autoencoder import init_autoencoder_params
from flux_fp8_api_tpu.models.flux import quantize_flux_tree
from flux_fp8_api_tpu.pipeline import FluxPipeline
from flux_fp8_api_tpu.utils.config import ModelVersion

from .helpers import (
    TINY_AE_PARAMS,
    tiny_flux,
    tiny_spec,
    tiny_text_encoders,
)


def make_pipeline(quant_kind=None, version=ModelVersion.flux_dev, **spec_overrides):
    cfg, params = tiny_flux(
        compute_dtype=spec_overrides.get("flow_dtype", "bfloat16"),
        use_pallas=spec_overrides.get("use_pallas", False),
    )
    if quant_kind:
        params = quantize_flux_tree(params, kind=quant_kind)
    clip, t5 = tiny_text_encoders()
    ae = init_autoencoder_params(jax.random.PRNGKey(5), TINY_AE_PARAMS)
    spec_overrides.setdefault("text_enc_max_length", 32)
    spec_overrides.setdefault("num_scale_trials", 3)
    spec = tiny_spec(version=version, **spec_overrides)
    return FluxPipeline(
        name=str(version.value),
        clip=clip,
        t5=t5,
        model=params,
        model_cfg=cfg,
        ae=ae,
        config=spec,
        prequantized=False,
    )


def decode_jpeg(buf: io.BytesIO) -> np.ndarray:
    return np.array(Image.open(buf))


class TestGenerate:
    def test_float_generate_returns_jpeg(self):
        pipe = make_pipeline()
        out = pipe.generate(
            prompt="a photo of a cat", width=64, height=64, num_steps=2, seed=7, silent=True
        )
        img = decode_jpeg(out)
        assert img.shape == (64, 64, 3)
        assert img.dtype == np.uint8

    def test_device_uint8_decode_matches_host_normalization(self):
        """vae_decode emits uint8 from the decode jit; its floor-based [-1,1]→byte
        formula must byte-match ImageEncoder's host numpy truncation on every float,
        including out-of-range values and exact byte boundaries."""
        pipe = make_pipeline()
        latents = jax.random.normal(
            jax.random.PRNGKey(3), (1, 16, pipe.config.params.in_channels), jnp.float32
        )
        assert pipe.vae_decode(latents, 64, 64).dtype == np.uint8

        # the exact device formula (pipeline.py _jit_ae_decode) vs the host one
        # (image_encoder.py), on boundary-heavy inputs
        f = np.concatenate(
            [
                np.linspace(-1.5, 1.5, 4001, dtype=np.float32),
                (np.arange(256, dtype=np.float32) / 127.5) - 1.0,  # exact byte points
            ]
        )
        dev = np.asarray(
            jnp.floor(
                jnp.clip((jnp.clip(jnp.asarray(f), -1.0, 1.0) + 1.0) * 127.5, 0.0, 255.0)
            ).astype(jnp.uint8)
        )
        host = np.clip((np.clip(f, -1.0, 1.0) + 1.0) * 127.5, 0, 255).astype(np.uint8)
        np.testing.assert_array_equal(dev, host)

    def test_seed_determinism_and_return_seed(self):
        pipe = make_pipeline()
        out1, seed1 = pipe.generate(
            prompt="a cat", width=64, height=64, num_steps=2, seed=42, silent=True, return_seed=True
        )
        out2, seed2 = pipe.generate(
            prompt="a cat", width=64, height=64, num_steps=2, seed=42, silent=True, return_seed=True
        )
        assert seed1 == seed2 == 42
        np.testing.assert_array_equal(decode_jpeg(out1), decode_jpeg(out2))

    def test_different_seeds_differ(self):
        pipe = make_pipeline()
        a = decode_jpeg(pipe.generate(prompt="a cat", width=64, height=64, num_steps=2, seed=1, silent=True))
        b = decode_jpeg(pipe.generate(prompt="a cat", width=64, height=64, num_steps=2, seed=2, silent=True))
        assert np.abs(a.astype(int) - b.astype(int)).max() > 0

    def test_string_seed(self):
        pipe = make_pipeline()
        _, seed = pipe.generate(
            prompt="a cat", width=64, height=64, num_steps=2, seed="123", silent=True, return_seed=True
        )
        assert seed == 123

    def test_dimension_snapping(self):
        pipe = make_pipeline()
        out = pipe.generate(prompt="x", width=70, height=70, num_steps=1, seed=0, silent=True)
        img = decode_jpeg(out)
        assert img.shape == (64, 64, 3)  # snapped to multiple of 16

    def test_schnell_forces_4_steps(self):
        pipe = make_pipeline(version=ModelVersion.flux_schnell)
        # num_steps=50 must be forced down to 4 (flux_pipeline.py:583); just verify
        # it completes quickly and returns an image.
        out = pipe.generate(prompt="a cat", width=64, height=64, num_steps=50, seed=0, silent=True)
        assert decode_jpeg(out).shape == (64, 64, 3)

    def test_num_images(self):
        pipe = make_pipeline()
        out = pipe.generate(prompt="a cat", width=64, height=64, num_steps=1, seed=0, silent=True, num_images=2)
        img = decode_jpeg(out)
        assert img.shape == (128, 64, 3)  # vstacked

    def test_img2img(self):
        pipe = make_pipeline()
        init = (np.random.RandomState(0).rand(80, 80, 3) * 255).astype(np.uint8)
        out = pipe.generate(
            prompt="a cat", width=64, height=64, num_steps=4, seed=0,
            init_image=init, strength=0.5, silent=True,
        )
        assert decode_jpeg(out).shape == (64, 64, 3)

    def test_img2img_strength_zero_steps(self):
        # strength 1.0 → full denoise from pure noise mixed at t=1
        pipe = make_pipeline()
        init = np.zeros((64, 64, 3), np.uint8)
        out = pipe.generate(
            prompt="a cat", width=64, height=64, num_steps=2, seed=0,
            init_image=init, strength=1.0, silent=True,
        )
        assert decode_jpeg(out).shape == (64, 64, 3)


class TestCalibrationInPipeline:
    def test_fp8_pipeline_calibrates_then_freezes(self):
        pipe = make_pipeline(quant_kind="fp8")
        assert pipe._needs_calibration
        pipe.generate(prompt="a cat", width=64, height=64, num_steps=4, seed=0, silent=True)
        assert not pipe._needs_calibration  # 4 steps ≥ num_scale_trials=3
        scales = np.asarray(
            pipe.model_params["double_blocks"]["img_attn_qkv"].in_scale
        )
        assert not np.allclose(scales, 1.0)
        # post-freeze generation uses the fused path and still works
        out = pipe.generate(prompt="a cat", width=64, height=64, num_steps=2, seed=0, silent=True)
        assert decode_jpeg(out).shape == (64, 64, 3)

    def test_compile_runs_warmup(self):
        pipe = make_pipeline(quant_kind="fp8")
        pipe.compile()
        assert not pipe._needs_calibration

    def test_int4_pipeline_calibrates_and_generates(self):
        """gigaquant flow tier (reference config-dev-gigaquant.json qint4): the same
        calibration protocol runs, scales freeze, and images come out finite."""
        pipe = make_pipeline(quant_kind="int4")
        assert pipe._needs_calibration
        out = pipe.generate(prompt="a cat", width=64, height=64, num_steps=4, seed=0, silent=True)
        assert not pipe._needs_calibration
        assert pipe.model_params["double_blocks"]["img_attn_qkv"].kind == "int4"
        scales = np.asarray(pipe.model_params["double_blocks"]["img_attn_qkv"].in_scale)
        assert not np.allclose(scales, 1.0)
        assert decode_jpeg(out).shape == (64, 64, 3)

    def test_compile_calibrates_fully_when_trials_exceed_recipe(self):
        """num_scale_trials > one warmup generate's steps: compile() must loop until
        the scales actually freeze, else phase 2 warms the calibration path instead
        of the fused serving scan."""
        pipe = make_pipeline(quant_kind="fp8", num_scale_trials=20)  # recipe = 12 steps
        pipe.compile()
        assert not pipe._needs_calibration
        assert pipe._trials_done >= 20


class TestServingPrecompile:
    """compile() must precompile the serving buckets so a -C server's first request
    pays zero compile (reference flux_pipeline.py:179-231 warms before traffic)."""

    def test_warmed_bucket_hits_jit_cache(self):
        from flux_fp8_api_tpu.sampling import _denoise_scan

        pipe = make_pipeline(
            quant_kind="fp8",
            warmup_resolutions=[[64, 64]],
            warmup_steps=2,
        )
        pipe.compile()
        assert not pipe._needs_calibration
        cached = _denoise_scan._cache_size()
        # first "request" at the warmed bucket: no new compilation
        pipe.generate(prompt="a cat", width=64, height=64, num_steps=2, seed=1, silent=True)
        assert _denoise_scan._cache_size() == cached
        # a different bucket does compile fresh (sanity that the counter moves)
        pipe.generate(prompt="a cat", width=96, height=96, num_steps=2, seed=1, silent=True)
        assert _denoise_scan._cache_size() > cached

    def test_warmup_precompiles_interactive_path(self):
        """warmup also compiles the per-step (non-silent/tqdm) jit for each bucket,
        so the first interactive generate after "-C" pays no compile (VERDICT r2
        item 8)."""
        from flux_fp8_api_tpu.sampling import _denoise_step

        pipe = make_pipeline(flow_dtype="float32")  # float: no calibration steps
        pipe.warmup([(64, 64)], num_steps=2)
        cached = _denoise_step._cache_size()
        assert cached > 0
        pipe.generate(prompt="a cat", width=64, height=64, num_steps=2, seed=1, silent=False)
        assert _denoise_step._cache_size() == cached
        # and the fused (silent) bucket was warmed too, as before
        from flux_fp8_api_tpu.sampling import _denoise_scan

        scans = _denoise_scan._cache_size()
        pipe.generate(prompt="a cat", width=64, height=64, num_steps=2, seed=1, silent=True)
        assert _denoise_scan._cache_size() == scans

    def test_bare_compile_only_calibrates(self):
        from flux_fp8_api_tpu.sampling import _denoise_scan

        before = _denoise_scan._cache_size()
        pipe = make_pipeline(quant_kind="fp8")  # no buckets, no compile flags
        pipe.compile()
        assert not pipe._needs_calibration
        # calibration uses the per-step path; no fused serving bucket was compiled
        assert _denoise_scan._cache_size() == before


class TestOffload:
    def test_offload_flags_roundtrip(self):
        pipe = make_pipeline(
            offload_flow=True, offload_vae=True, offload_text_encoder=True
        )
        out = pipe.generate(prompt="a cat", width=64, height=64, num_steps=1, seed=0, silent=True)
        assert decode_jpeg(out).shape == (64, 64, 3)
        # flow params returned to host after generate
        leaf = pipe.model_params["img_in"].kernel
        assert list(leaf.devices())[0].platform == "cpu"


class TestStreamedOffload:
    """Per-block double-buffered weight streaming (offload.py, VERDICT r2 item 5)."""

    def test_streamed_generate_matches_resident(self):
        kwargs = dict(prompt="a cat", width=64, height=64, num_steps=2, seed=3, silent=True)
        # f32 flow so the only difference vs the fused scan is jit-boundary
        # reassociation; no calibration (float kind) → streaming from generate #1
        ref = decode_jpeg(make_pipeline(flow_dtype="float32").generate(**kwargs))
        pipe = make_pipeline(flow_dtype="float32", offload_flow=True)
        out = decode_jpeg(pipe.generate(**kwargs))
        assert pipe._stream_state is not None  # streaming path actually ran
        # weights never moved: the stacked tree stayed host-resident
        leaf = pipe.model_params["double_blocks"]["img_attn_qkv"].kernel
        assert list(leaf.devices())[0].platform == "cpu"
        assert np.mean(np.abs(out.astype(np.int16) - ref.astype(np.int16))) < 0.5

    def test_quantized_calibrates_whole_tree_then_streams(self):
        pipe = make_pipeline(quant_kind="fp8", offload_flow=True, num_scale_trials=2)
        kwargs = dict(prompt="a cat", width=64, height=64, num_steps=3, seed=0, silent=True)
        pipe.generate(**kwargs)  # calibration: legacy whole-tree round trip
        assert not pipe._needs_calibration
        assert pipe._stream_state is None
        pipe.generate(**kwargs)  # frozen: streams
        assert pipe._stream_state is not None

    def test_retain_budget_matches_full_retention(self):
        """retain_bytes caps resident block weights (the oversized-tree mode the
        full-scale bf16 fidelity ground truth runs through): a zero budget
        (re-stream everything, every step) and a mid budget (retain a prefix)
        must both produce the retain-all result bit-for-bit — same jits, same
        values, only the device_put schedule differs."""
        from flux_fp8_api_tpu import offload as offload_mod

        pipe = make_pipeline(flow_dtype="float32")
        cfg = pipe.model_cfg
        fns = offload_mod.make_stream_fns(cfg)
        tops, dbl, sgl = offload_mod.split_flow_params(pipe.model_params)
        dev = jax.devices()[0]
        tops_dev = jax.device_put(tops, dev)
        b, tokens = 1, 16
        img = jax.random.normal(jax.random.PRNGKey(0), (b, tokens, cfg.in_channels), jnp.float32)
        from flux_fp8_api_tpu.ops.packing import make_img_ids, make_txt_ids

        img_ids = make_img_ids(8, 8, b)  # (8/2)(8/2) = 16 ids = `tokens`
        txt = jax.random.normal(jax.random.PRNGKey(1), (b, 8, cfg.context_in_dim), jnp.float32)
        txt_ids = make_txt_ids(8, b)
        y = jax.random.normal(jax.random.PRNGKey(2), (b, cfg.vec_in_dim), jnp.float32)
        ts = jnp.linspace(1.0, 0.0, 3, jnp.float32)

        def run(retain_bytes):
            return np.asarray(
                offload_mod.streamed_denoise(
                    fns, tops_dev, dbl, sgl, dev,
                    jnp.array(img, copy=True), img_ids, txt, txt_ids, y, ts, 3.5,
                    cfg, retain_bytes=retain_bytes,
                ),
                np.float32,
            )

        ref = run(None)
        one_slice = offload_mod.slice_nbytes(dbl)
        np.testing.assert_array_equal(run(0), ref)
        np.testing.assert_array_equal(run(2 * one_slice + 1), ref)

    def test_sync_backpressure_is_value_neutral(self):
        """sync_every drains the dispatch queue with 1-element fetches to bound
        host RSS on oversized trees (measured: a 24GB/8-step ground-truth run was
        oom-killed at 119GB without it); the fetches must not change a single bit
        vs the unsynced schedule."""
        from flux_fp8_api_tpu import offload as offload_mod

        pipe = make_pipeline(flow_dtype="float32")
        cfg = pipe.model_cfg
        fns = offload_mod.make_stream_fns(cfg)
        tops, dbl, sgl = offload_mod.split_flow_params(pipe.model_params)
        dev = jax.devices()[0]
        tops_dev = jax.device_put(tops, dev)
        b = 1
        img = jax.random.normal(jax.random.PRNGKey(0), (b, 16, cfg.in_channels), jnp.float32)
        from flux_fp8_api_tpu.ops.packing import make_img_ids, make_txt_ids

        img_ids = make_img_ids(8, 8, b)
        txt = jax.random.normal(jax.random.PRNGKey(1), (b, 8, cfg.context_in_dim), jnp.float32)
        txt_ids = make_txt_ids(8, b)
        y = jax.random.normal(jax.random.PRNGKey(2), (b, cfg.vec_in_dim), jnp.float32)
        ts = jnp.linspace(1.0, 0.0, 3, jnp.float32)

        def run(sync_every):
            # retain_bytes=0 re-streams every block every step → maximum puts →
            # the sync path actually fires (sync_every=2 syncs mid-block-loop)
            return np.asarray(
                offload_mod.streamed_denoise(
                    fns, tops_dev, dbl, sgl, dev,
                    jnp.array(img, copy=True), img_ids, txt, txt_ids, y, ts, 3.5,
                    cfg, retain_bytes=0, sync_every=sync_every,
                ),
                np.float32,
            )

        np.testing.assert_array_equal(run(2), run(0))

    def test_offload_retain_gb_config_streams(self):
        pipe = make_pipeline(
            flow_dtype="float32", offload_flow=True, offload_retain_gb=0.0
        )
        kwargs = dict(prompt="a cat", width=64, height=64, num_steps=2, seed=3, silent=True)
        ref = decode_jpeg(make_pipeline(flow_dtype="float32").generate(**kwargs))
        out = decode_jpeg(pipe.generate(**kwargs))
        assert pipe._stream_state is not None
        assert np.mean(np.abs(out.astype(np.int16) - ref.astype(np.int16))) < 0.5

    def test_lora_invalidates_stream_state(self, tmp_path):
        from flux_fp8_api_tpu.utils.safetensors_io import save_safetensors

        from .test_lora import make_kohya_lora

        pipe = make_pipeline(flow_dtype="float32", offload_flow=True)
        kwargs = dict(prompt="x", width=64, height=64, num_steps=1, seed=1, silent=True)
        pipe.generate(**kwargs)
        assert pipe._stream_state is not None
        path = str(tmp_path / "l.safetensors")
        save_safetensors(path, make_kohya_lora())
        pipe.load_lora(path, scale=1.0)
        assert pipe._stream_state is None  # rebuilt (with the fused delta) next run
        pipe.generate(**kwargs)
        assert pipe._stream_state is not None

    def test_stream_flow_offload_false_restores_round_trip(self):
        pipe = make_pipeline(flow_dtype="float32", offload_flow=True, stream_flow_offload=False)
        pipe.generate(prompt="x", width=64, height=64, num_steps=1, seed=1, silent=True)
        assert pipe._stream_state is None
        leaf = pipe.model_params["img_in"].kernel
        assert list(leaf.devices())[0].platform == "cpu"


class TestLoadFromConfig:
    def test_load_pipeline_from_config_path(self, tmp_path):
        spec = tiny_spec(text_enc_max_length=32, flow_quantization_dtype=None)
        p = tmp_path / "config.json"
        p.write_text(spec.model_dump_json())
        pipe = FluxPipeline.load_pipeline_from_config_path(str(p))
        out = pipe.generate(prompt="a photo", width=64, height=64, num_steps=1, seed=0, silent=True)
        assert decode_jpeg(out).shape == (64, 64, 3)

    def test_kwargs_override(self, tmp_path):
        spec = tiny_spec(text_enc_max_length=32, flow_quantization_dtype=None)
        p = tmp_path / "config.json"
        p.write_text(spec.model_dump_json())
        pipe = FluxPipeline.load_pipeline_from_config_path(str(p), offload_vae=True)
        assert pipe.offload_vae


class TestCompilationCache:
    def test_cache_dir_populated(self, tmp_path):
        """compilation_cache_dir → persistent XLA executable cache (restart skips
        the serving-bucket compile; the inductor-cache analog)."""
        import jax as _jax

        cache = str(tmp_path / "xla-cache")
        try:
            pipe = make_pipeline(compilation_cache_dir=cache)
            assert _jax.config.jax_compilation_cache_dir == cache
            pipe.generate(prompt="a cat", width=64, height=64, num_steps=2, seed=0, silent=True)
            import os

            entries = os.listdir(cache)
            assert entries, "compilation cache dir stayed empty"
        finally:
            _jax.config.update("jax_compilation_cache_dir", None)


class TestMultiPrompt:
    def test_distinct_prompts_encode_separately(self):
        """A list of distinct prompts must produce distinct images per row —
        previously row 0's prompt was silently used for the whole batch."""
        pipe = make_pipeline()
        out = pipe.generate(
            prompt=["a red cat", "a blue dog"], width=64, height=64,
            num_steps=2, seed=9, silent=True,
        )
        img = decode_jpeg(out)  # num_images stack vertically
        assert img.shape == (128, 64, 3)
        top, bottom = img[:64].astype(np.int16), img[64:].astype(np.int16)
        assert np.abs(top - bottom).mean() > 1.0  # different prompts → different rows

    def test_prompt_count_mismatch_raises(self):
        pipe = make_pipeline()
        try:
            pipe.generate(prompt=["a", "b", "c"], width=64, height=64,
                          num_steps=1, seed=0, silent=True, num_images=2)
            raised = False
        except ValueError:
            raised = True
        assert raised


class TestZeroScaleTrials:
    def test_num_scale_trials_zero_skips_calibration(self):
        """num_scale_trials=0 must mean 'no calibration', not an infinite
        compile() loop (the freeze condition trials_done < 0 was unreachable)."""
        pipe = make_pipeline(quant_kind="int8", num_scale_trials=0)
        assert not pipe._needs_calibration
        pipe.compile()  # must return, not spin
        out = pipe.generate(prompt="a cat", width=64, height=64, num_steps=1, seed=0, silent=True)
        assert decode_jpeg(out).shape == (64, 64, 3)


class TestHubIdFallback:
    """Reference-shipped configs point text encoders at HF hub repos
    (config-dev.json: city96/t5-v1_1-xxl-encoder-bf16, openai/clip-vit-large-patch14).
    No hub access here → both must warn and degrade to random towers, for ANY
    org/name id, instead of FileNotFoundError deep in from_pretrained."""

    def test_hub_ids_degrade_to_random_towers(self):
        from flux_fp8_api_tpu.utils.loader import load_text_encoders

        from .helpers import tiny_spec

        spec = tiny_spec(
            clip_path="laion/CLIP-ViT-L-14",
            text_enc_path="city96/t5-v1_1-xxl-encoder-bf16",
        )
        clip, t5 = load_text_encoders(spec)
        out = t5(["a cat"])
        assert out.shape[0] == 1

    def test_local_like_missing_path_still_raises(self, tmp_path):
        from flux_fp8_api_tpu.utils.loader import load_text_encoders

        from .helpers import tiny_spec

        spec = tiny_spec(text_enc_path=str(tmp_path / "nonexistent_dir"))
        try:
            load_text_encoders(spec)
            raised = False
        except (FileNotFoundError, OSError):
            raised = True
        assert raised


class TestConditioningCache:
    """prompt→(vec, txt) LRU (ModelSpec.cond_cache_size): repeated prompts skip the
    text encoders entirely. The reference re-encodes every request
    (flux_pipeline.py:525-560) — this is a TPU-stack extra."""

    def _count_encodes(self, monkeypatch):
        import flux_fp8_api_tpu.pipeline as pl

        calls = {"n": 0}
        real = pl.get_weighted_text_embeddings

        def counting(*a, **kw):
            calls["n"] += 1
            return real(*a, **kw)

        monkeypatch.setattr(pl, "get_weighted_text_embeddings", counting)
        return calls

    def test_repeated_prompt_hits_and_output_identical(self, monkeypatch):
        pipe = make_pipeline()
        calls = self._count_encodes(monkeypatch)
        out1 = pipe.generate(prompt="same cat", width=64, height=64, num_steps=2,
                             seed=7, silent=True)
        out2 = pipe.generate(prompt="same cat", width=64, height=64, num_steps=2,
                             seed=7, silent=True)
        assert calls["n"] == 1  # second request never touched the encoders
        assert out1.getvalue() == out2.getvalue()
        assert pipe.cond_cache_hits == 1 and pipe.cond_cache_misses == 1
        # exposed via timings → both servers' /metrics pick it up
        assert pipe.timings["cond_cache_hits"] == 1

    def test_distinct_prompts_miss(self, monkeypatch):
        pipe = make_pipeline()
        calls = self._count_encodes(monkeypatch)
        pipe.embed_text("cat")
        pipe.embed_text("dog")
        pipe.embed_text("cat")
        assert calls["n"] == 2
        assert pipe.cond_cache_hits == 1 and pipe.cond_cache_misses == 2

    def test_cached_broadcast_matches_uncached_batch(self):
        """prepare's cached N=1-encode+repeat must equal the old
        num_images_per_prompt=bs encode (emphasis.py repeats N=1 internally too)."""
        pipe_c = make_pipeline()
        pipe_u = make_pipeline(cond_cache_size=0)
        img = jnp.zeros((2, pipe_c.config.params.in_channels // 4, 16, 16),
                        pipe_c.dtype)
        _, _, vec_c, txt_c, _ = pipe_c.prepare(img, "a (fluffy:1.3) cat")
        _, _, vec_u, txt_u, _ = pipe_u.prepare(img, "a (fluffy:1.3) cat")
        assert vec_c.shape[0] == 2 and txt_c.shape[0] == 2
        np.testing.assert_array_equal(np.asarray(vec_c), np.asarray(vec_u))
        np.testing.assert_array_equal(np.asarray(txt_c), np.asarray(txt_u))

    def test_distinct_prompt_batch_rows_dedup(self, monkeypatch):
        pipe = make_pipeline()
        calls = self._count_encodes(monkeypatch)
        img = jnp.zeros((3, pipe.config.params.in_channels // 4, 16, 16), pipe.dtype)
        _, _, vec, txt, _ = pipe.prepare(img, ["cat", "dog", "cat"])
        assert calls["n"] == 2  # "cat" encoded once, reused for row 2
        assert vec.shape[0] == 3 and txt.shape[0] == 3
        np.testing.assert_array_equal(np.asarray(txt)[0], np.asarray(txt)[2])
        assert not np.array_equal(np.asarray(txt)[0], np.asarray(txt)[1])

    def test_size_zero_disables(self, monkeypatch):
        pipe = make_pipeline(cond_cache_size=0)
        calls = self._count_encodes(monkeypatch)
        pipe.embed_text("cat")
        pipe.embed_text("cat")
        assert calls["n"] == 2
        assert len(pipe._cond_cache) == 0

    def test_lru_evicts_oldest(self, monkeypatch):
        pipe = make_pipeline(cond_cache_size=2)
        calls = self._count_encodes(monkeypatch)
        pipe.embed_text("a")
        pipe.embed_text("b")
        pipe.embed_text("a")   # refresh a → b is now LRU
        pipe.embed_text("c")   # evicts b
        assert len(pipe._cond_cache) == 2
        pipe.embed_text("a")   # hit
        pipe.embed_text("b")   # miss (was evicted)
        assert calls["n"] == 4  # a, b, c, b-again

    def test_full_hit_skips_offload_round_trip(self, monkeypatch):
        pipe = make_pipeline(offload_text_encoder=True)
        moves = {"n": 0}
        real_to_device = pipe.t5.to_device

        def counting_to_device():
            moves["n"] += 1
            return real_to_device()

        monkeypatch.setattr(pipe.t5, "to_device", counting_to_device)
        pipe.embed_text("cat")
        assert moves["n"] == 1
        pipe.embed_text("cat")  # full hit: encoders never move
        assert moves["n"] == 1

    def test_num_images_repeat(self):
        pipe = make_pipeline()
        vec, txt = pipe.embed_text("cat", num_images=3)
        assert vec.shape[0] == 3 and txt.shape[0] == 3
        np.testing.assert_array_equal(np.asarray(txt)[0], np.asarray(txt)[2])
