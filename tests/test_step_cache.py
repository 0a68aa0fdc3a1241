"""Step-cache tests (sampling.CacheConfig): the timestep residual cache — a TPU-side
speedup the reference does not have (its loop always evaluates the full model,
flux_pipeline.py:628-651). Equivalence checks run in float32 with both sides jitted
(CLAUDE.md: bf16 eager-vs-jit fusion noise is ~1e-2 and tests nothing)."""

import jax.numpy as jnp
import numpy as np
import pytest

from flux_fp8_api_tpu.models.flux import flux_cache_indicator
from flux_fp8_api_tpu.sampling import CacheConfig, denoise

from .helpers import tiny_flux, tiny_inputs


def _setup(n_steps=6, compute_dtype="float32"):
    cfg, params = tiny_flux(compute_dtype=compute_dtype)
    inp = tiny_inputs()
    timesteps = np.linspace(1.0, 0.0, n_steps + 1).tolist()
    return cfg, params, inp, timesteps


def _run(cfg, params, inp, timesteps, cache=None, stats=None, **kw):
    # the fused scans donate the latent buffer — copy so inp survives reuse
    return denoise(
        params, cfg, jnp.array(inp["img"], copy=True), inp["img_ids"], inp["txt"],
        inp["txt_ids"], inp["y"], timesteps, 3.5, fused=kw.pop("fused", True),
        cache=cache, stats=stats, **kw,
    )


class TestCacheConfig:
    def test_parse_none_and_passthrough(self):
        assert CacheConfig.parse(None).mode == "none"
        c = CacheConfig(mode="interval", interval=3)
        assert CacheConfig.parse(c) is c

    def test_parse_dict_coerces_types(self):
        c = CacheConfig.parse(
            {"mode": "dynamic", "threshold": "0.3", "warmup": "2", "tail": 1,
             "coefficients": [1, 0]}
        )
        assert c.mode == "dynamic" and c.threshold == 0.3 and c.warmup == 2
        assert c.coefficients == (1.0, 0.0)

    def test_parse_rejects_unknown_keys(self):
        with pytest.raises(ValueError, match="unknown cache option"):
            CacheConfig.parse({"mode": "interval", "intreval": 2})

    def test_validation(self):
        with pytest.raises(ValueError, match="mode"):
            CacheConfig(mode="always")
        with pytest.raises(ValueError, match="interval"):
            CacheConfig(mode="interval", interval=0)
        with pytest.raises(ValueError, match="warmup"):
            CacheConfig(mode="interval", warmup=0)
        with pytest.raises(ValueError):
            CacheConfig(mode="dynamic", threshold=-1.0)
        with pytest.raises(ValueError, match="order"):
            CacheConfig(mode="interval", order=2)
        with pytest.raises(TypeError):
            CacheConfig.parse("dynamic")

    def test_parse_coerces_order(self):
        c = CacheConfig.parse({"mode": "interval", "interval": 3, "order": "1"})
        assert c.order == 1


class TestCachedScan:
    def test_interval_1_matches_uncached(self):
        """interval=1 evaluates every step: bit-for-bit the plain fused scan's math
        (same jitted euler update), and n_evals counts every step."""
        cfg, params, inp, ts = _setup(n_steps=6)
        base = _run(cfg, params, inp, ts)
        stats = {}
        cached = _run(
            cfg, params, inp, ts,
            cache=CacheConfig(mode="interval", interval=1, warmup=1, tail=0),
            stats=stats,
        )
        assert int(stats["model_evals"]) == 6
        np.testing.assert_allclose(
            np.asarray(cached, np.float32), np.asarray(base, np.float32),
            rtol=0, atol=2e-5,
        )

    def test_dynamic_threshold_zero_matches_uncached(self):
        cfg, params, inp, ts = _setup(n_steps=5)
        base = _run(cfg, params, inp, ts)
        stats = {}
        cached = _run(
            cfg, params, inp, ts,
            cache=CacheConfig(mode="dynamic", threshold=0.0, warmup=1, tail=0),
            stats=stats,
        )
        assert int(stats["model_evals"]) == 5
        np.testing.assert_allclose(
            np.asarray(cached, np.float32), np.asarray(base, np.float32),
            rtol=0, atol=2e-5,
        )

    def test_dynamic_huge_threshold_only_forced_steps(self):
        """An unreachable threshold leaves only the forced warmup+tail evals."""
        cfg, params, inp, ts = _setup(n_steps=8)
        stats = {}
        out = _run(
            cfg, params, inp, ts,
            cache=CacheConfig(mode="dynamic", threshold=1e9, warmup=2, tail=1),
            stats=stats,
        )
        assert int(stats["model_evals"]) == 3  # steps {0, 1, 7}
        assert np.isfinite(np.asarray(out, np.float32)).all()

    def test_interval_eval_count(self):
        """interval=2, warmup=2, tail=1 over 8 steps: evals at {0,1,7} (forced) ∪
        {0,2,4,6} (interval) = 6."""
        cfg, params, inp, ts = _setup(n_steps=8)
        stats = {}
        out = _run(
            cfg, params, inp, ts,
            cache=CacheConfig(mode="interval", interval=2, warmup=2, tail=1),
            stats=stats,
        )
        assert int(stats["model_evals"]) == 6
        assert out.shape == inp["img"].shape

    def test_dynamic_accumulates_drift(self):
        """A moderate threshold on the tiny model must land strictly between the
        forced floor and all-steps: the indicator drift actually gates evals."""
        cfg, params, inp, ts = _setup(n_steps=10)
        floor = 3  # warmup=2 + tail=1
        evals = {}
        for thr in (0.05, 1e9):
            stats = {}
            _run(
                cfg, params, inp, ts,
                cache=CacheConfig(mode="dynamic", threshold=thr, warmup=2, tail=1),
                stats=stats,
            )
            evals[thr] = int(stats["model_evals"])
        assert evals[1e9] == floor
        assert floor < evals[0.05] <= 10

    def test_order1_interval_1_matches_uncached(self):
        """order=1 with interval=1 never skips, so extrapolation is dead code and
        the output must match the plain fused scan exactly (f32 compute)."""
        cfg, params, inp, ts = _setup(n_steps=6)
        base = _run(cfg, params, inp, ts)
        stats = {}
        cached = _run(
            cfg, params, inp, ts,
            cache=CacheConfig(mode="interval", interval=1, warmup=1, tail=0, order=1),
            stats=stats,
        )
        assert int(stats["model_evals"]) == 6
        np.testing.assert_allclose(
            np.asarray(cached, np.float32), np.asarray(base, np.float32),
            rtol=0, atol=2e-5,
        )

    def test_order1_matches_host_reference(self):
        """The order-1 scan implements exactly the documented policy: replicate it in
        a host loop (per-step jitted model evals + numpy extrapolation) and compare."""
        import jax
        from flux_fp8_api_tpu.models.flux import flux_apply

        cfg, params, inp, ts = _setup(n_steps=8)
        cache = CacheConfig(mode="interval", interval=3, warmup=2, tail=1, order=1)

        @jax.jit
        def pred_fn(img, t_curr):
            b = img.shape[0]
            t_vec = jnp.full((b,), t_curr, cfg.dtype)
            g_vec = jnp.full((b,), 3.5, cfg.dtype) if cfg.guidance_embed else None
            return flux_apply(
                params, cfg, img, inp["img_ids"], inp["txt"], inp["txt_ids"],
                t_vec, inp["y"], g_vec,
            )

        img = np.asarray(inp["img"], np.float32)
        n = len(ts) - 1
        cached = prev = None
        t_last = t_prev_last = None
        evals = 0
        for i, (t_curr, t_prev) in enumerate(zip(ts[:-1], ts[1:])):
            forced = i < cache.warmup or i >= n - cache.tail
            if forced or i % cache.interval == 0:
                prev, t_prev_last = cached, t_last
                cached, t_last = np.asarray(pred_fn(img, t_curr), np.float32), t_curr
                evals += 1
                pred = cached
            elif prev is not None:
                slope = (cached - prev) / (t_last - t_prev_last)
                pred = cached + (t_curr - t_last) * slope
            else:
                pred = cached
            img = img + (t_prev - t_curr) * pred

        stats = {}
        out = _run(cfg, params, inp, ts, cache=cache, stats=stats)
        assert int(stats["model_evals"]) == evals
        np.testing.assert_allclose(np.asarray(out, np.float32), img, rtol=0, atol=3e-5)

    def test_order1_differs_from_order0_when_skipping(self):
        """With real skips after >=2 evals, the extrapolated trajectory must actually
        diverge from plain reuse (the slope term is live), and stay finite."""
        cfg, params, inp, ts = _setup(n_steps=8)
        outs = {}
        for order in (0, 1):
            stats = {}
            outs[order] = np.asarray(_run(
                cfg, params, inp, ts,
                cache=CacheConfig(mode="interval", interval=3, warmup=2, tail=1, order=order),
                stats=stats,
            ), np.float32)
            assert int(stats["model_evals"]) == 5
        assert np.isfinite(outs[1]).all()
        assert np.max(np.abs(outs[1] - outs[0])) > 1e-6

    def test_order1_dynamic_mode(self):
        """order composes with the dynamic policy (decision path untouched)."""
        cfg, params, inp, ts = _setup(n_steps=8)
        stats = {}
        out = _run(
            cfg, params, inp, ts,
            cache=CacheConfig(mode="dynamic", threshold=1e9, warmup=2, tail=1, order=1),
            stats=stats,
        )
        assert int(stats["model_evals"]) == 3
        assert np.isfinite(np.asarray(out, np.float32)).all()

    def test_requires_fused_and_default_runner(self):
        cfg, params, inp, ts = _setup(n_steps=2)
        cache = CacheConfig(mode="interval")
        with pytest.raises(ValueError, match="fused"):
            _run(cfg, params, inp, ts, cache=cache, fused=False)
        with pytest.raises(ValueError, match="runner"):
            _run(cfg, params, inp, ts, cache=cache, stack_runner=object())


class TestIndicator:
    def test_shape_and_time_sensitivity(self):
        """The block-0 modulated input: (B, L_img, hidden), deterministic, and it
        must move when the timestep moves (that's the signal the dynamic mode
        thresholds on)."""
        cfg, params = tiny_flux(compute_dtype="float32")
        inp = tiny_inputs()
        t1 = jnp.full((1,), 0.9)
        t2 = jnp.full((1,), 0.1)
        a = flux_cache_indicator(params, cfg, inp["img"], t1, inp["y"], inp["guidance"])
        b = flux_cache_indicator(params, cfg, inp["img"], t1, inp["y"], inp["guidance"])
        c = flux_cache_indicator(params, cfg, inp["img"], t2, inp["y"], inp["guidance"])
        assert a.shape == (1, inp["img"].shape[1], cfg.hidden_size)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert float(jnp.max(jnp.abs(a - c))) > 1e-4


class TestPipelineCache:
    def _pipe(self, **kw):
        from .test_pipeline import make_pipeline

        return make_pipeline(**kw)

    def test_generate_reports_model_evals(self):
        pipe = self._pipe(flow_dtype="float32")  # float: no calibration trials
        pipe.generate(
            prompt="a cat", width=64, height=64, num_steps=6, seed=1, silent=True,
            cache={"mode": "interval", "interval": 2, "warmup": 2, "tail": 1},
        )
        evals = pipe.timings["cache_model_evals"]
        assert 0 < evals < 6
        # an uncached generate clears the stale counter
        pipe.generate(
            prompt="a cat", width=64, height=64, num_steps=2, seed=1, silent=True
        )
        assert "cache_model_evals" not in pipe.timings

    def test_cache_ignored_during_calibration(self):
        pipe = self._pipe(quant_kind="fp8")  # calibration trials pending
        out = pipe.generate(
            prompt="a cat", width=64, height=64, num_steps=2, seed=1, silent=True,
            cache={"mode": "interval", "interval": 2},
        )
        assert out.getvalue()[:2] == b"\xff\xd8"  # still a JPEG
        assert "cache_model_evals" not in pipe.timings

    def test_cache_forces_fused_in_interactive_mode(self):
        pipe = self._pipe(flow_dtype="float32")
        pipe.generate(
            prompt="a cat", width=64, height=64, num_steps=4, seed=1, silent=False,
            cache={"mode": "interval", "interval": 1, "warmup": 1, "tail": 0},
        )
        assert pipe.timings["cache_model_evals"] == 4

    def test_bad_cache_spec_raises(self):
        pipe = self._pipe(flow_dtype="float32")
        with pytest.raises(ValueError, match="unknown cache option"):
            pipe.generate(
                prompt="a cat", width=64, height=64, num_steps=2, seed=1,
                silent=True, cache={"mode": "interval", "bogus": 1},
            )


class TestCacheUnderMesh:
    """The cached scan under mesh serving: GSPMD partitions the lax.cond (XLA
    predicates/hoists collectives inside conditionals), and the shard_map Pallas
    attention composes with it. Slow-marked (conftest) — smoke covers single-device."""

    def test_tp2_matches_single_device_cached(self):
        from .test_pipeline import decode_jpeg, make_pipeline

        kwargs = dict(
            prompt="a cat", width=64, height=64, num_steps=6, seed=11, silent=True,
            cache={"mode": "interval", "interval": 2, "warmup": 2, "tail": 1},
        )
        single = make_pipeline(flow_dtype="float32", ae_dtype="float32")
        ref = decode_jpeg(single.generate(**kwargs))
        pipe = make_pipeline(
            mesh={"dp": 1, "tp": 2}, flow_dtype="float32", ae_dtype="float32"
        )
        out = decode_jpeg(pipe.generate(**kwargs))
        assert pipe.timings["cache_model_evals"] == single.timings["cache_model_evals"] == 5
        # f32 compute: only reduction-order noise between single-device and tp
        assert np.mean(np.abs(out.astype(np.int16) - ref.astype(np.int16))) < 1.0

    def test_dynamic_cache_with_shard_map_pallas(self, monkeypatch):
        import flux_fp8_api_tpu.ops.attention as attn_mod

        from .test_pipeline import decode_jpeg, make_pipeline

        monkeypatch.setattr(attn_mod, "FORCE_PALLAS_INTERPRET", True)
        pipe = make_pipeline(
            mesh={"dp": 1, "tp": 2}, flow_dtype="float32", ae_dtype="float32",
            use_pallas=True,
        )
        out = decode_jpeg(pipe.generate(
            prompt="a cat", width=64, height=64, num_steps=4, seed=11, silent=True,
            cache={"mode": "dynamic", "threshold": 0.4, "warmup": 2, "tail": 1},
        ))
        assert out.shape == (64, 64, 3)
        assert 3 <= pipe.timings["cache_model_evals"] <= 4


class TestUiCachePresets:
    """Both UI twins (gradio main_gr.py, stdlib webui.py) expose the same measured
    step-cache presets; every preset must parse via CacheConfig."""

    def test_gradio_choices_parse(self):
        from flux_fp8_api_tpu.main_gr import STEP_CACHE_CHOICES

        parsed = [CacheConfig.parse(v) for v in STEP_CACHE_CHOICES.values()]
        assert parsed[0].mode == "none"  # first entry is the default: off
        assert {c.mode for c in parsed} == {"none", "dynamic", "interval"}

    def test_webui_js_matches_gradio_presets(self):
        from flux_fp8_api_tpu.main_gr import STEP_CACHE_CHOICES
        from flux_fp8_api_tpu.webui import _PAGE

        by_mode = {
            c["mode"]: c for c in STEP_CACHE_CHOICES.values() if c is not None
        }
        dyn, itv = by_mode["dynamic"], by_mode["interval"]
        assert f'{{ mode: "dynamic", threshold: {dyn["threshold"]} }}' in _PAGE
        assert f'{{ mode: "interval", interval: {itv["interval"]} }}' in _PAGE


class TestServerCache:
    def test_handler_rejects_bad_cache_with_400(self):
        from flux_fp8_api_tpu.server import PipelineServer

        srv = PipelineServer(pipeline=None)
        status, ctype, payload, headers = srv.handle_generate(
            {"prompt": "x", "cache": {"mode": "nope"}}
        )
        assert status == 400
        assert b"cache mode" in payload

    def test_handler_passes_parsed_cache(self):
        from .test_pipeline import make_pipeline
        from flux_fp8_api_tpu.server import PipelineServer

        pipe = make_pipeline(flow_dtype="float32")
        srv = PipelineServer(pipeline=pipe)
        status, ctype, payload, headers = srv.handle_generate(
            {"prompt": "a cat", "width": 64, "height": 64, "num_steps": 4,
             "seed": 3, "cache": {"mode": "interval", "interval": 1,
                                  "warmup": 1, "tail": 0}}
        )
        assert status == 200
        assert pipe.timings["cache_model_evals"] == 4
        assert srv.last_timings["cache_model_evals"] == 4
