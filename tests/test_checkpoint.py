"""Checkpoint IO tests: pure-python safetensors, BFL key mapping, prequantized formats."""

import json

import jax
import jax.numpy as jnp
import ml_dtypes
import numpy as np

from flux_fp8_api_tpu.calibration import apply_input_scales, merge_amax
from flux_fp8_api_tpu.models.flux import FluxStatic, flux_apply, quantize_flux_tree
from flux_fp8_api_tpu.utils.checkpoint import (
    is_prequantized_reference_file,
    load_flux_checkpoint,
    load_prequantized,
    save_prequantized,
)
from flux_fp8_api_tpu.utils.safetensors_io import (
    SafetensorsFile,
    load_safetensors,
    save_safetensors,
)

from .helpers import TINY_FLUX_PARAMS, tiny_flux, tiny_inputs


class TestSafetensorsIO:
    def test_roundtrip_dtypes(self, tmp_path):
        path = str(tmp_path / "x.safetensors")
        tensors = {
            "a": np.arange(12, dtype=np.float32).reshape(3, 4),
            "b": np.ones((2, 2), dtype=ml_dtypes.bfloat16) * 1.5,
            "c": (np.ones((4,), dtype=np.float32) * 0.25).astype(ml_dtypes.float8_e4m3fn),
            "d": np.array([-3, 7], dtype=np.int8),
        }
        save_safetensors(path, tensors, metadata={"hello": "world"})
        f = SafetensorsFile(path)
        assert f.metadata["hello"] == "world"
        loaded = load_safetensors(path)
        for k in tensors:
            np.testing.assert_array_equal(loaded[k], tensors[k])
            assert loaded[k].dtype == tensors[k].dtype


def _synthetic_bfl_checkpoint(path: str, seed=0):
    """Build a torch-layout (out,in) BFL flux checkpoint for the tiny config."""
    rng = np.random.RandomState(seed)
    p = TINY_FLUX_PARAMS
    hs, mh = p.hidden_size, int(p.hidden_size * p.mlp_ratio)
    hd = hs // p.num_heads
    sd = {}

    def lin(name, inf, outf):
        sd[f"{name}.weight"] = rng.randn(outf, inf).astype(np.float32) * 0.02
        sd[f"{name}.bias"] = rng.randn(outf).astype(np.float32) * 0.01

    lin("img_in", p.in_channels, hs)
    lin("txt_in", p.context_in_dim, hs)
    for e, ind in (("time_in", 256), ("vector_in", p.vec_in_dim), ("guidance_in", 256)):
        lin(f"{e}.in_layer", ind, hs)
        lin(f"{e}.out_layer", hs, hs)
    for i in range(p.depth):
        pre = f"double_blocks.{i}"
        lin(f"{pre}.img_mod.lin", hs, 6 * hs)
        lin(f"{pre}.txt_mod.lin", hs, 6 * hs)
        lin(f"{pre}.img_attn.qkv", hs, 3 * hs)
        lin(f"{pre}.img_attn.proj", hs, hs)
        lin(f"{pre}.txt_attn.qkv", hs, 3 * hs)
        lin(f"{pre}.txt_attn.proj", hs, hs)
        lin(f"{pre}.img_mlp.0", hs, mh)
        lin(f"{pre}.img_mlp.2", mh, hs)
        lin(f"{pre}.txt_mlp.0", hs, mh)
        lin(f"{pre}.txt_mlp.2", mh, hs)
        for s in ("img_attn", "txt_attn"):
            sd[f"{pre}.{s}.norm.query_norm.scale"] = np.ones(hd, np.float32)
            sd[f"{pre}.{s}.norm.key_norm.scale"] = np.ones(hd, np.float32)
    for i in range(p.depth_single_blocks):
        pre = f"single_blocks.{i}"
        lin(f"{pre}.linear1", hs, 3 * hs + mh)
        lin(f"{pre}.linear2", hs + mh, hs)
        lin(f"{pre}.modulation.lin", hs, 3 * hs)
        sd[f"{pre}.norm.query_norm.scale"] = np.ones(hd, np.float32)
        sd[f"{pre}.norm.key_norm.scale"] = np.ones(hd, np.float32)
    lin("final_layer.linear", hs, p.in_channels)
    lin("final_layer.adaLN_modulation.1", hs, 2 * hs)
    save_safetensors(path, sd)
    return sd


class TestFluxCheckpoint:
    def test_bfl_load_and_forward(self, tmp_path):
        path = str(tmp_path / "flux.safetensors")
        sd = _synthetic_bfl_checkpoint(path)
        cfg = FluxStatic.from_params(TINY_FLUX_PARAMS, use_pallas=False)
        tree = load_flux_checkpoint(path, cfg)
        # kernel must be the transposed torch weight
        np.testing.assert_allclose(
            np.asarray(tree["img_in"].kernel, np.float32),
            sd["img_in.weight"].T,
            rtol=1e-2,
        )
        # stacked block shapes
        assert tree["double_blocks"]["img_attn_qkv"].kernel.shape == (
            TINY_FLUX_PARAMS.depth,
            64,
            192,
        )
        out = flux_apply(tree, cfg, **tiny_inputs())
        assert out.shape == (1, 16, 16)
        assert bool(jnp.all(jnp.isfinite(out.astype(jnp.float32))))

    def test_not_prequantized_detection(self, tmp_path):
        path = str(tmp_path / "flux.safetensors")
        _synthetic_bfl_checkpoint(path)
        assert not is_prequantized_reference_file(path)


class TestPrequantized:
    def test_save_load_roundtrip(self, tmp_path):
        cfg, params = tiny_flux()
        qparams = quantize_flux_tree(params)
        inp = tiny_inputs()
        _, amaxes = flux_apply(qparams, cfg, **inp, collect_amax=True)
        qparams = apply_input_scales(qparams, merge_amax(None, amaxes))
        ref_out = flux_apply(qparams, cfg, **inp)

        path = str(tmp_path / "prequant.safetensors")
        save_prequantized(path, qparams, extra_meta={"quantize_modulation": "true"})
        reloaded = load_prequantized(path, cfg)

        # identical bytes → identical output
        out = flux_apply(reloaded, cfg, **inp)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref_out))
        # scales survived
        np.testing.assert_array_equal(
            np.asarray(reloaded["double_blocks"]["img_attn_qkv"].in_scale),
            np.asarray(qparams["double_blocks"]["img_attn_qkv"].in_scale),
        )

    def test_prequant_is_smaller_than_float(self, tmp_path):
        import os

        cfg, params = tiny_flux()
        qparams = quantize_flux_tree(params)
        fpath = str(tmp_path / "float.safetensors")
        qpath = str(tmp_path / "quant.safetensors")
        save_prequantized(fpath, jax.tree.map(
            lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, params
        ))
        save_prequantized(qpath, jax.tree.map(
            lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, qparams
        ))
        # fp8 data is half the bf16 size for the quantized majority of weights
        assert os.path.getsize(qpath) < 0.75 * os.path.getsize(fpath)
