"""End-to-end serving benchmark: images/min including T5 encode + denoise + VAE decode.

The BASELINE metric names both the denoise it/s (bench.py) and e2e images/min incl.
T5+VAE. This drives the full FluxPipeline on one v5e, random-init (no weights ship in
this image; wall clock doesn't depend on values). Two single-chip memory plans:

- ``--t5-bits 2`` (default, resident): T5-XXL wo_int2 (~1.4GB) beside the 12GB fp8
  flow — the only everything-resident plan that fits one 16GB v5e.
- ``--t5-bits 4 --offload``: the reference's 24GB-GPU quality tier
  (config-dev-offload-1-4090.json: qint4 T5 + offload_text_encoder/offload_vae) on a
  16GB chip — T5-XXL wo_int4 (~2.9GB incl. scales) lives on host and round-trips per
  request. NOTE: through this dev tunnel host↔device runs at ~15MB/s (vs ~10GB/s PCIe
  on a real TPU-VM), so the offload transfer dominates the measured wall clock; the
  JSON breaks out prepare/denoise/decode so the link-bound component is explicit.
  Resident wo_int4 OOMs: 12GB flow + 2.9GB T5 + CLIP/VAE + activations > 16GB HBM.
- ``--flow int4 --t5-bits 4`` (gigaquant-resident): the int4 flow tier (~6GB) frees
  enough HBM that T5-XXL wo_int4 fits *resident* — no offload round-trips, so it
  trades flow-weight precision (fp8→int4) for T5 precision (int2→int4) at roughly
  the same images/min as the all-resident default.

Usage: python bench_e2e.py [width height steps] [--t5-bits {2,4}] [--flow {fp8,int4}]
       [--offload] [--schnell] [--cache SPEC] [--repeat-prompt] → one JSON line.
       --schnell switches to the 4-step flux-schnell arch (no guidance embed, 256 T5
       tokens). --cache turns on the step cache (sampling.CacheConfig): SPEC is a JSON
       dict or one of the UI preset shorthands interval4 / interval3 / dynamic
       (docs/PERF.md table). Iterations use distinct prompts by default so the
       conditioning LRU can't inflate the headline; --repeat-prompt measures the
       repeated-prompt (seed-sweep) steady state instead, labeled as such.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from bench import random_quantized_flux
from flux_fp8_api_tpu.models.autoencoder import init_autoencoder_params
from flux_fp8_api_tpu.models.clip import CLIPConfig, init_clip_params
from flux_fp8_api_tpu.models.conditioner import TextEncoder
from flux_fp8_api_tpu.models.flux import FluxStatic
from flux_fp8_api_tpu.models.t5 import T5Config
from flux_fp8_api_tpu.ops.quant import Linear
from flux_fp8_api_tpu.pipeline import FluxPipeline
from flux_fp8_api_tpu.utils.config import AutoEncoderParams, FluxParams, ModelSpec, ModelVersion
from flux_fp8_api_tpu.utils.loader import _toy_tokenizer


def random_wo_t5(cfg: T5Config, key, bits: int = 2) -> dict:
    """T5-XXL-shaped params with blockwise weight-only linears built directly on
    device (per-leaf jits: eager ops and whole-model jits are both pathological
    through the dev tunnel). bits=2 is the reference's qint2 gigaquant tier — with
    the fp8 flow resident (12GB) it is the T5 size that shares one 16GB chip."""
    from functools import partial

    counter = [0]
    per_byte = 8 // bits
    kind = f"wo_int{bits}"

    def nk():
        counter[0] += 1
        return jax.random.fold_in(key, counter[0])

    @partial(jax.jit, static_argnums=(1, 2))
    def wo(key, inf, outf):
        packed = jax.random.bits(key, (cfg.num_layers, inf // per_byte, outf), jnp.uint8)
        nblocks = inf // 64 if inf % 64 == 0 else 1
        scale_inv = jnp.full((cfg.num_layers, nblocks, outf), 2e-2, jnp.float32)
        return Linear(q=packed, w_scale_inv=scale_inv, kind=kind)

    inner = cfg.num_heads * cfg.d_kv
    blocks = {
        "q": wo(nk(), cfg.d_model, inner),
        "k": wo(nk(), cfg.d_model, inner),
        "v": wo(nk(), cfg.d_model, inner),
        "o": wo(nk(), inner, cfg.d_model),
        "ln1": jnp.ones((cfg.num_layers, cfg.d_model), jnp.bfloat16),
        "wi_0": wo(nk(), cfg.d_model, cfg.d_ff),
        "wi_1": wo(nk(), cfg.d_model, cfg.d_ff),
        "wo": wo(nk(), cfg.d_ff, cfg.d_model),
        "ln2": jnp.ones((cfg.num_layers, cfg.d_model), jnp.bfloat16),
    }
    emb = jax.jit(lambda k: jax.random.normal(k, (cfg.vocab_size, cfg.d_model), jnp.bfloat16) * 0.02)
    return {
        "shared": emb(nk()),
        "rel_bias": jax.random.normal(nk(), (cfg.relative_attention_num_buckets, cfg.num_heads), jnp.bfloat16) * 0.02,
        "blocks": blocks,
        "final_ln": jnp.ones((cfg.d_model,), jnp.bfloat16),
    }


def random_wo8_clip(cfg: CLIPConfig, key) -> dict:
    """CLIP-L text tower with wo_int8 linears, built with per-leaf jits."""
    from functools import partial

    counter = [0]

    def nk():
        counter[0] += 1
        return jax.random.fold_in(key, counter[0])

    @partial(jax.jit, static_argnums=(1, 2))
    def wo8(key, inf, outf):
        bits = jax.random.bits(key, (cfg.num_layers, inf, outf), jnp.uint8)
        q = jax.lax.bitcast_convert_type(bits, jnp.int8)
        scale = jnp.full((cfg.num_layers, outf), 2e-2, jnp.float32)
        return Linear(q=q, w_scale=1.0 / scale, w_scale_inv=scale,
                      bias=jnp.zeros((cfg.num_layers, outf), jnp.bfloat16), kind="wo_int8")

    d, m = cfg.hidden_size, cfg.intermediate_size

    def lnp():
        return {"weight": jnp.ones((cfg.num_layers, d), jnp.bfloat16),
                "bias": jnp.zeros((cfg.num_layers, d), jnp.bfloat16)}

    emb = jax.jit(lambda k: jax.random.normal(k, (cfg.vocab_size, d), jnp.bfloat16) * 0.02)
    pos = jax.jit(lambda k: jax.random.normal(k, (cfg.max_position_embeddings, d), jnp.bfloat16) * 0.02)
    return {
        "token_embedding": emb(nk()),
        "position_embedding": pos(nk()),
        "blocks": {
            "q_proj": wo8(nk(), d, d), "k_proj": wo8(nk(), d, d),
            "v_proj": wo8(nk(), d, d), "out_proj": wo8(nk(), d, d),
            "layer_norm1": lnp(), "fc1": wo8(nk(), d, m), "fc2": wo8(nk(), m, d),
            "layer_norm2": lnp(),
        },
        "final_layer_norm": {"weight": jnp.ones((d,), jnp.bfloat16), "bias": jnp.zeros((d,), jnp.bfloat16)},
    }


def main():
    argv = list(sys.argv[1:])
    t5_bits = 2
    if "--t5-bits" in argv:
        i = argv.index("--t5-bits")
        t5_bits = int(argv[i + 1])
        del argv[i : i + 2]
    flow_kind = "fp8"
    if "--flow" in argv:
        i = argv.index("--flow")
        flow_kind = argv[i + 1]
        del argv[i : i + 2]
        if flow_kind not in ("fp8", "fp8_exact", "int8", "int4"):
            raise SystemExit(f"--flow {flow_kind}: expected fp8|fp8_exact|int8|int4")
    cache = None
    cache_name = "off"
    if "--cache" in argv:
        i = argv.index("--cache")
        cache_name = argv[i + 1]
        del argv[i : i + 2]
        shorthands = {
            "interval4": {"mode": "interval", "interval": 4},
            "interval3": {"mode": "interval", "interval": 3},
            "dynamic": {"mode": "dynamic", "threshold": 0.4},
        }
        cache = shorthands.get(cache_name) or json.loads(cache_name)
    # --repeat-prompt: reuse one prompt across iterations → the conditioning LRU
    # serves every request after the first (the repeated-prompt steady state, e.g.
    # seed sweeps). Labeled in the metric name; the default is distinct prompts.
    repeat_prompt = "--repeat-prompt" in argv
    if repeat_prompt:
        argv.remove("--repeat-prompt")
    offload = "--offload" in argv
    if offload:
        argv.remove("--offload")
    schnell = "--schnell" in argv
    if schnell:
        argv.remove("--schnell")
    width = int(argv[0]) if len(argv) > 0 else 1024
    height = int(argv[1]) if len(argv) > 1 else 1024
    steps = int(argv[2]) if len(argv) > 2 else 28

    flux_params = FluxParams(
        in_channels=64, vec_in_dim=768, context_in_dim=4096, hidden_size=3072,
        mlp_ratio=4.0, num_heads=24, depth=19, depth_single_blocks=38,
        axes_dim=[16, 56, 56], theta=10_000, qkv_bias=True,
        guidance_embed=not schnell,  # schnell has no guidance embedding
    )
    ae_params = AutoEncoderParams(
        resolution=1024, in_channels=3, ch=128, out_ch=3, ch_mult=[1, 2, 4, 4],
        num_res_blocks=2, z_channels=16, scale_factor=0.3611, shift_factor=0.1159,
    )
    version = ModelVersion.flux_schnell if schnell else ModelVersion.flux_dev
    spec = ModelSpec(
        version=version, params=flux_params, ae_params=ae_params,
        text_enc_max_length=256 if schnell else 512, num_scale_trials=6,
        offload_text_encoder=offload, offload_vae=offload,
    )
    if schnell:
        steps = 4  # pipeline forces it; reflect in the metric label too
    cfg = FluxStatic.from_params(flux_params)
    print("building models...", file=sys.stderr)
    t0 = time.perf_counter()
    flow = random_quantized_flux(cfg, jax.random.PRNGKey(0), kind=flow_kind)
    print(f"flow built {time.perf_counter()-t0:.0f}s", file=sys.stderr)
    # jit the eager inits: each eager op is a tunnel round-trip on this dev TPU
    ae = jax.jit(lambda k: init_autoencoder_params(k, ae_params, jnp.bfloat16))(
        jax.random.PRNGKey(1)
    )
    print(f"ae built {time.perf_counter()-t0:.0f}s", file=sys.stderr)

    t5_cfg = T5Config()  # T5-XXL defaults
    clip_cfg = CLIPConfig()  # ViT-L text tower defaults
    if offload:
        # build the offloaded encoders ON the host: building 2.9GB of T5 beside the
        # 12GB resident flow would OOM the 16GB chip before the move-to-host
        with jax.default_device(jax.devices("cpu")[0]):
            t5_params = random_wo_t5(t5_cfg, jax.random.PRNGKey(2), bits=t5_bits)
            clip_params = random_wo8_clip(clip_cfg, jax.random.PRNGKey(3))
    else:
        t5_params = random_wo_t5(t5_cfg, jax.random.PRNGKey(2), bits=t5_bits)
        clip_params = random_wo8_clip(clip_cfg, jax.random.PRNGKey(3))
    print(f"t5 built {time.perf_counter()-t0:.0f}s", file=sys.stderr)
    t5 = TextEncoder(
        "t5", t5_params, t5_cfg, _toy_tokenizer("t5"),
        max_length=spec.text_enc_max_length, offload=offload,
    )
    clip = TextEncoder(
        "clip", clip_params,
        clip_cfg, _toy_tokenizer("clip"), max_length=77, offload=offload,
    )
    print(f"clip built {time.perf_counter()-t0:.0f}s", file=sys.stderr)

    pipe = FluxPipeline(
        name=str(version.value), clip=clip, t5=t5, model=flow, model_cfg=cfg, ae=ae,
        config=spec, prequantized=True,  # bench scales are pre-set; skip calibration
    )

    prompt = "a (beautiful:1.2) photograph of a mountain lake at dawn, mist over the water"
    t0 = time.perf_counter()
    pipe.generate(
        prompt=prompt, width=width, height=height, num_steps=steps, seed=1,
        silent=True, cache=cache,
    )
    warm = time.perf_counter() - t0
    print(f"warmup (compiles): {warm:.1f}s", file=sys.stderr)

    n = 1 if offload else 3  # offload runs are host-link-bound; one run is exact enough
    t0 = time.perf_counter()
    for i in range(n):
        # distinct prompt per iteration: the conditioning LRU (on by default) would
        # otherwise skip T5 after warmup and overstate images/min vs the reference,
        # which re-encodes every request — this keeps the headline the distinct-
        # prompt worst case (and comparable with rounds 1-4, measured pre-cache).
        out = pipe.generate(
            prompt=prompt if repeat_prompt else f"{prompt}, variant {i}",
            width=width, height=height,
            num_steps=steps, seed=100 + i, silent=True, cache=cache,
        )
    dt = (time.perf_counter() - t0) / n
    jpeg_bytes = len(out.getvalue())

    plan = f"T5-XXL wo_int{t5_bits}" + (" offloaded" if offload else "")
    flavor = "flux-schnell" if schnell else "flux-dev"
    cache_tag = "" if cache is None else f" + cache {cache_name}"
    if repeat_prompt:
        cache_tag += " (repeated prompt: cond-cache steady state)"
    print(
        json.dumps(
            {
                "metric": f"e2e images/min @{width}x{height} {flavor} {flow_kind} + {plan} + CLIP wo_int8 + VAE, {steps} steps{cache_tag} (TPU v5e)",
                "value": round(60.0 / dt, 3),
                "unit": "images/min",
                "detail": {
                    "seconds_per_image": round(dt, 2),
                    "prepare_seconds": round(pipe.timings.get("prepare_seconds", 0), 2),
                    "denoise_seconds": round(pipe.timings.get("denoise_seconds", 0), 2),
                    "decode_seconds": round(pipe.timings.get("decode_seconds", 0), 2),
                    "jpeg_bytes": jpeg_bytes,
                    "warmup_s": round(warm, 1),
                    "offload": offload,
                    "cache": cache,
                    "cache_model_evals": pipe.timings.get("cache_model_evals"),
                    # 0 hits proves the headline is the distinct-prompt worst case
                    "cond_cache_hits": pipe.cond_cache_hits,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
