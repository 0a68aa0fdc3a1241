"""Edge-path coverage: long prompts, BREAK, b64 init images, calibration spanning
multiple generates, concurrent server access."""

import base64
import io
import threading

import jax.numpy as jnp
import numpy as np
from PIL import Image

from flux_fp8_api_tpu import emphasis

from .helpers import tiny_text_encoders
from .test_pipeline import decode_jpeg, make_pipeline


class TestLongPrompts:
    def test_clip_chunking_over_77_tokens(self):
        clip, t5 = tiny_text_encoders()
        long_prompt = " ".join(["a photo of a cat"] * 40)  # ≫77 tokens
        pooled, txt = emphasis.get_weighted_text_embeddings(
            clip, t5, long_prompt, t5_length=32
        )
        assert pooled.shape[0] == 1
        assert txt.shape == (1, 32, t5.config.d_model)
        assert bool(jnp.all(jnp.isfinite(txt.astype(jnp.float32))))

    def test_break_keyword(self):
        clip, t5 = tiny_text_encoders()
        pooled, txt = emphasis.get_weighted_text_embeddings(
            clip, t5, "a cat BREAK a dog", t5_length=32
        )
        assert bool(jnp.all(jnp.isfinite(txt.astype(jnp.float32))))

    def test_empty_prompt(self):
        clip, t5 = tiny_text_encoders()
        pooled, txt = emphasis.get_weighted_text_embeddings(clip, t5, "", t5_length=32)
        assert pooled.shape[0] == 1


class TestInitImageFormats:
    def _pipe(self):
        return make_pipeline()

    def test_b64_init_image(self):
        pipe = self._pipe()
        img = Image.fromarray(
            (np.random.RandomState(0).rand(64, 64, 3) * 255).astype(np.uint8)
        )
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        b64 = "data:image/png;base64," + base64.b64encode(buf.getvalue()).decode()
        out = pipe.generate(
            prompt="a cat", width=64, height=64, num_steps=2, seed=0,
            init_image=b64, strength=0.5, silent=True,
        )
        assert decode_jpeg(out).shape == (64, 64, 3)

    def test_pil_init_image(self):
        pipe = self._pipe()
        img = Image.fromarray(
            (np.random.RandomState(1).rand(100, 80, 3) * 255).astype(np.uint8)
        )
        out = pipe.generate(
            prompt="a cat", width=64, height=64, num_steps=2, seed=0,
            init_image=img, strength=0.5, silent=True,
        )
        assert decode_jpeg(out).shape == (64, 64, 3)

    def test_path_init_image(self, tmp_path):
        pipe = self._pipe()
        p = str(tmp_path / "init.png")
        Image.fromarray(
            (np.random.RandomState(2).rand(64, 64, 3) * 255).astype(np.uint8)
        ).save(p)
        out = pipe.generate(
            prompt="a cat", width=64, height=64, num_steps=2, seed=0,
            init_image=p, strength=0.5, silent=True,
        )
        assert decode_jpeg(out).shape == (64, 64, 3)


class TestCalibrationAcrossGenerates:
    def test_trials_span_multiple_requests(self):
        # num_scale_trials=3 but each generate runs only 2 steps → freeze happens
        # mid-second-generate, mirroring the reference's cross-call trial counters
        pipe = make_pipeline(quant_kind="fp8")
        assert pipe.config.num_scale_trials == 3
        pipe.generate(prompt="a", width=64, height=64, num_steps=2, seed=0, silent=True)
        assert pipe._needs_calibration  # 2 of 3 trials done
        assert pipe._trials_done == 2
        pipe.generate(prompt="a", width=64, height=64, num_steps=2, seed=0, silent=True)
        assert not pipe._needs_calibration
        assert pipe._trials_done == 3


class TestServerConcurrency:
    def test_concurrent_generates_serialize(self):
        from flux_fp8_api_tpu.server import PipelineServer

        pipe = make_pipeline()
        # warm the compile so the race window is the actual generate
        pipe.generate(prompt="w", width=64, height=64, num_steps=1, seed=0, silent=True)
        srv = PipelineServer(pipe, host="127.0.0.1", port=8973)
        results = []

        def call():
            code, ctype, payload, headers = _post_local(
                srv, {"prompt": "x", "width": 64, "height": 64, "num_steps": 1}
            )
            assert "x-seed" in headers
            results.append((code, len(payload)))

        threads = [threading.Thread(target=call) for _ in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert len(results) == 4
        assert all(code == 200 and n > 100 for code, n in results)
        assert srv.metrics["requests"] == 4


def _post_local(srv, body):
    """Exercise the handler directly (no socket) — tests the lock, not HTTP."""
    return srv.handle_generate(body)
