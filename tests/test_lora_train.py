"""QLoRA-style adapter training: frozen quantized base + trainable rank-r adapters.

The reference can only consume LoRAs (lora_loading.py fuse path); producing them is a
framework extension. These tests pin the full loop: init → merged==base → train (loss
decreases, base bytes untouched) → export (kohya format) → fuse back → same outputs,
in both fused layouts and under a mesh.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from flux_fp8_api_tpu.lora import (
    export_lora_adapters,
    fuse_lora,
    init_lora_adapters,
    merge_lora_adapters,
    resolve_lora_state_dict,
    save_lora_adapters,
)
from flux_fp8_api_tpu.models.flux import FluxStatic, flux_apply, init_flux_params, quantize_flux_tree
from flux_fp8_api_tpu.parallel.mesh import batch_sharding, flux_param_shardings, make_mesh
from flux_fp8_api_tpu.parallel.train import make_dummy_batch, make_lora_train_step
from flux_fp8_api_tpu.utils.checkpoint import relayout_flux_tree
from flux_fp8_api_tpu.utils.config import FluxParams

PARAMS = FluxParams(
    in_channels=16, vec_in_dim=64, context_in_dim=96, hidden_size=128,
    mlp_ratio=4.0, num_heads=4, depth=2, depth_single_blocks=2,
    axes_dim=[8, 12, 12], theta=10_000, qkv_bias=True, guidance_embed=True,
)


def _cfg(**kw):
    cfg = FluxStatic.from_params(PARAMS, compute_dtype="float32", use_pallas=False)
    return dataclasses.replace(cfg, **kw) if kw else cfg


def _fwd(params, cfg, batch):
    b = batch["latents"].shape[0]
    t = jnp.full((b,), 0.5, jnp.float32)
    g = jnp.full((b,), 1.0, jnp.float32)
    return flux_apply(
        params, cfg, batch["latents"], batch["img_ids"], batch["txt"],
        batch["txt_ids"], t, batch["y"], g,
    )


def _random_adapters(params, rank=4, seed=7, scale=0.02):
    ad = init_lora_adapters(params, rank=rank, key=jax.random.PRNGKey(1), dtype=jnp.float32)
    return jax.tree.map(
        lambda x: jax.random.normal(jax.random.PRNGKey(seed), x.shape, jnp.float32) * scale,
        ad,
    )


class TestAdapterBasics:
    def test_init_is_identity(self):
        """B=0 at init → the merged model IS the base model, bit-for-bit."""
        cfg = _cfg()
        params = init_flux_params(jax.random.PRNGKey(0), cfg, jnp.float32)
        adapters = init_lora_adapters(params, rank=4, key=jax.random.PRNGKey(1), dtype=jnp.float32)
        batch = make_dummy_batch(cfg, 1, 8, 8, 16, jax.random.PRNGKey(2))
        base = _fwd(params, cfg, batch)
        merged = _fwd(merge_lora_adapters(params, adapters), cfg, batch)
        np.testing.assert_array_equal(np.asarray(base), np.asarray(merged))

    def test_adapter_shapes_respect_packed_kinds(self):
        """in_features on an int4-packed base leaf is the TRUE in width (the packed
        q array has in/2 rows) — adapters must use it, not the storage shape."""
        cfg = _cfg()
        params = init_flux_params(jax.random.PRNGKey(0), cfg, jnp.float32)
        q = quantize_flux_tree(params, cfg, kind="int4")
        ad = init_lora_adapters(q, rank=4, key=jax.random.PRNGKey(1))
        a = ad["double_blocks"]["img_attn_qkv"]["a"]
        assert a.shape == (cfg.depth, cfg.hidden_size, 4)

    def test_dequant_training_forward_tracks_float_base(self):
        """The differentiable dequant forward ≈ the full-precision forward: its only
        error source is the int8 WEIGHT quantization (activations stay exact) —
        unlike the serving path it needs no input-scale calibration to be faithful."""
        cfg = _cfg()
        params = init_flux_params(jax.random.PRNGKey(0), cfg, jnp.float32)
        q = quantize_flux_tree(params, cfg, kind="int8")
        batch = make_dummy_batch(cfg, 1, 8, 8, 16, jax.random.PRNGKey(2))
        full = _fwd(params, cfg, batch)
        training = _fwd(q, dataclasses.replace(cfg, dequant_linears=True), batch)
        rel = float(jnp.max(jnp.abs(full - training)) / (jnp.max(jnp.abs(full)) + 1e-9))
        assert rel < 0.05, rel


class TestLoraTraining:
    def test_loss_decreases_and_base_frozen_int8(self):
        cfg = _cfg()
        params = init_flux_params(jax.random.PRNGKey(0), cfg, jnp.float32)
        base = quantize_flux_tree(params, cfg, kind="int8")
        base_bytes = np.asarray(base["double_blocks"]["img_attn_qkv"].q).copy()
        adapters = init_lora_adapters(base, rank=4, key=jax.random.PRNGKey(1), dtype=jnp.float32)
        batch = make_dummy_batch(cfg, 2, 8, 8, 16, jax.random.PRNGKey(2))

        init_fn, step = make_lora_train_step(cfg, optax.adamw(1e-3))
        opt_state = init_fn(adapters)
        losses = []
        for _ in range(5):
            adapters, opt_state, loss = step(adapters, opt_state, base, batch, jax.random.PRNGKey(10))
            losses.append(float(loss))
        assert losses[-1] < losses[0], losses
        # gradients reached both stacks through the frozen quantized base
        assert float(jnp.max(jnp.abs(adapters["double_blocks"]["img_attn_qkv"]["b"]))) > 0
        assert float(jnp.max(jnp.abs(adapters["single_blocks"]["linear2"]["b"]))) > 0
        # the base never changed (frozen by construction — not donated, not updated)
        np.testing.assert_array_equal(
            np.asarray(base["double_blocks"]["img_attn_qkv"].q), base_bytes
        )

    def test_lora_train_under_mesh(self):
        """dp×tp mesh: base sharded Megatron-style, adapters replicated, batch over
        dp — the step compiles and the loss matches the single-device step."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        cfg = _cfg()
        params = init_flux_params(jax.random.PRNGKey(0), cfg, jnp.float32)
        base = quantize_flux_tree(params, cfg, kind="int8")
        adapters = init_lora_adapters(base, rank=4, key=jax.random.PRNGKey(1), dtype=jnp.float32)
        batch = make_dummy_batch(cfg, 2, 8, 8, 16, jax.random.PRNGKey(2))
        init_fn, step = make_lora_train_step(cfg, optax.sgd(1e-3))
        _, _, loss_1dev = step(
            jax.tree.map(jnp.copy, adapters), init_fn(adapters), base, batch, jax.random.PRNGKey(10)
        )

        mesh = make_mesh({"dp": 2, "tp": 2}, jax.devices()[:4])
        base_m = jax.tree.map(
            lambda x, s: jax.device_put(x, s), base, flux_param_shardings(base, mesh),
            is_leaf=lambda x: x is None,
        )
        rep = NamedSharding(mesh, P())
        adapters_m = jax.device_put(adapters, rep)
        batch_m = jax.device_put(batch, batch_sharding(mesh))
        opt_m = init_fn(adapters_m)
        adapters_m, opt_m, loss_mesh = step(
            adapters_m, opt_m, base_m, batch_m, jax.device_put(jax.random.PRNGKey(10), rep)
        )
        assert np.isfinite(float(loss_mesh))
        np.testing.assert_allclose(float(loss_mesh), float(loss_1dev), rtol=2e-4)


class TestExportRoundTrip:
    @pytest.mark.parametrize("layout", ["flat", "grouped"])
    def test_export_fuse_matches_merged(self, layout):
        """load(export(adapters)) == merged runtime model, in both fused layouts —
        pins the inverse rope/head-major permutations on qkv/linear1 out and
        linear2 in axes."""
        cfg0 = _cfg()
        params = init_flux_params(jax.random.PRNGKey(0), cfg0, jnp.float32)
        if layout == "grouped":
            cfg = dataclasses.replace(cfg0, fused_layout="grouped")
            params = relayout_flux_tree(params, cfg0)
        else:
            cfg = cfg0
        adapters = _random_adapters(params)
        batch = make_dummy_batch(cfg, 1, 8, 8, 16, jax.random.PRNGKey(2))
        out_merged = _fwd(merge_lora_adapters(params, adapters), cfg, batch)

        sd = export_lora_adapters(adapters, cfg)
        keys, bfl = resolve_lora_state_dict(sd, has_guidance=True)
        out_fused = _fwd(fuse_lora(params, cfg, bfl, keys, 1.0), cfg, batch)
        np.testing.assert_allclose(
            np.asarray(out_fused), np.asarray(out_merged), atol=2e-5, rtol=1e-4
        )

    def test_exported_file_loads_from_disk(self, tmp_path):
        """save_lora_adapters writes a safetensors file the normal LoRA load path
        (and any kohya consumer) accepts."""
        from flux_fp8_api_tpu.lora import pipeline_load_lora

        cfg = _cfg()
        params = init_flux_params(jax.random.PRNGKey(0), cfg, jnp.float32)
        adapters = _random_adapters(params)
        path = tmp_path / "trained_lora.safetensors"
        save_lora_adapters(str(path), adapters, cfg)

        batch = make_dummy_batch(cfg, 1, 8, 8, 16, jax.random.PRNGKey(2))
        out_merged = _fwd(merge_lora_adapters(params, adapters), cfg, batch)
        fused, registry = pipeline_load_lora(params, cfg, [], str(path), 1.0)
        assert len(registry) == 1
        out_fused = _fwd(fused, cfg, batch)
        np.testing.assert_allclose(
            np.asarray(out_fused), np.asarray(out_merged), atol=2e-5, rtol=1e-4
        )

    def test_export_into_quantized_base(self):
        """Adapters trained on an int8 base fuse back into that base via the normal
        dequant→add→requant path; with calibrated input scales the serving outputs
        track the merged model within the requantization error."""
        from flux_fp8_api_tpu.calibration import apply_input_scales
        from flux_fp8_api_tpu.models.flux import flux_apply

        cfg = _cfg()
        params = init_flux_params(jax.random.PRNGKey(0), cfg, jnp.float32)
        base = quantize_flux_tree(params, cfg, kind="int8")
        batch = make_dummy_batch(cfg, 1, 8, 8, 16, jax.random.PRNGKey(2))
        t = jnp.full((1,), 0.5, jnp.float32)
        g = jnp.full((1,), 1.0, jnp.float32)
        _, amaxes = flux_apply(
            base, cfg, batch["latents"], batch["img_ids"], batch["txt"],
            batch["txt_ids"], t, batch["y"], g, collect_amax=True,
        )
        base = apply_input_scales(base, amaxes)

        adapters = _random_adapters(base)
        out_merged = _fwd(merge_lora_adapters(base, adapters), cfg, batch)
        sd = export_lora_adapters(adapters, cfg)
        keys, bfl = resolve_lora_state_dict(sd, has_guidance=True)
        out_fused = _fwd(fuse_lora(base, cfg, bfl, keys, 1.0), cfg, batch)
        rel = float(
            jnp.max(jnp.abs(out_fused - out_merged)) / (jnp.max(jnp.abs(out_merged)) + 1e-9)
        )
        assert rel < 0.05, rel


class TestTimestepSampling:
    def test_logit_normal_matches_schedule_shift(self):
        """sample_timesteps('logit_normal') == time_shift(mu(seq), 1, sigmoid(u)) —
        the training density reuses the sampler's own resolution warp
        (ops/schedule.py), so train-time t statistics match serving schedules."""
        from flux_fp8_api_tpu.ops.schedule import get_lin_function, time_shift
        from flux_fp8_api_tpu.parallel.train import sample_timesteps

        key = jax.random.PRNGKey(3)
        seq = 1024
        t = np.asarray(sample_timesteps(key, 4096, seq, "logit_normal"))
        raw = jax.nn.sigmoid(jax.random.normal(key, (4096,), jnp.float32))
        expect = time_shift(get_lin_function()(seq), 1.0, np.asarray(raw))
        np.testing.assert_allclose(t, expect, rtol=2e-5)
        assert 0.0 < t.min() and t.max() < 1.0
        # the shift (mu(1024) > 0) pushes mass toward t=1 vs the raw sigmoid draw
        assert t.mean() > float(np.asarray(raw).mean())

    def test_uniform_and_unknown(self):
        from flux_fp8_api_tpu.parallel.train import sample_timesteps

        t = np.asarray(sample_timesteps(jax.random.PRNGKey(0), 512, 256, "uniform"))
        assert 0.0 <= t.min() and t.max() < 1.0 and 0.3 < t.mean() < 0.7
        with pytest.raises(ValueError):
            sample_timesteps(jax.random.PRNGKey(0), 4, 256, "nope")

    def test_train_step_with_logit_normal(self):
        """A lora train step built with t_sampling='logit_normal' runs and learns."""
        cfg = _cfg()
        key = jax.random.PRNGKey(11)
        params = quantize_flux_tree(init_flux_params(key, cfg, jnp.float32), "int8")
        adapters = init_lora_adapters(params, rank=2, key=jax.random.PRNGKey(1))
        init_fn, step = make_lora_train_step(
            cfg, optax.adamw(1e-3), t_sampling="logit_normal"
        )
        opt_state = init_fn(adapters)
        batch = make_dummy_batch(cfg, 2, 8, 8, 16, jax.random.PRNGKey(2))
        losses = []
        for i in range(6):
            adapters, opt_state, loss = step(
                adapters, opt_state, params, batch, jax.random.PRNGKey(100 + i)
            )
            losses.append(float(loss))
        assert np.isfinite(losses).all()
        assert min(losses[3:]) < losses[0]
