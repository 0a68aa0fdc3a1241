"""Benchmark: denoise-loop it/s, flux-dev architecture, fp8, 1024x1024, batch 1.

Mirrors the reference's headline metric (README.md:14-45: tqdm rate over the denoise
loop, flux_pipeline.py:628-651). Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "it/s", "vs_baseline": N}
vs_baseline is against the reference's best published number (11.5 it/s, H100 +
torch.compile) — note the target hardware here is a single TPU v5e (~197 bf16 TFLOP/s
peak vs H100's ~989), so parity is a hardware-bound stretch; the number reported is
honest wall-clock on this chip.

Timing note: through the axon tunnel ``block_until_ready`` does not block — every
measurement fetches a scalar to force execution.
"""

import json
import math
import sys
import time

import jax
import jax.numpy as jnp

from flux_fp8_api_tpu.models.flux import FluxStatic
from flux_fp8_api_tpu.ops.packing import make_img_ids, make_txt_ids
from flux_fp8_api_tpu.ops.quant import Linear
from flux_fp8_api_tpu.sampling import _denoise_scan
from flux_fp8_api_tpu.utils.config import FluxParams

BASELINE_ITS = 11.5  # reference README.md:25 — H100, compile on, 1024x1024


def random_quantized_flux(cfg: FluxStatic, key, kind="fp8"):
    """Build the quantized param tree directly (no bf16 staging — 12B bf16 params
    would not fit the 16GB chip; speed does not depend on weight values).

    kind="fp8" is the SHIPPED qfloat8 tier: e4m3 leaves converted to int8 MXU compute
    at load (ModelSpec.fp8_fast_accum default, ops/quant.py:fp8_to_int8_compute).
    kind="fp8_exact" measures the bit-faithful e5m2×e4m3 path (fp8_fast_accum=false).
    """
    fast_accum = kind == "fp8"
    if kind == "fp8_exact":
        kind = "fp8"
    wdtype = jnp.float8_e4m3fn if kind == "fp8" else jnp.int8
    if fast_accum:
        from flux_fp8_api_tpu.ops.quant import fp8_to_int8_compute

        convert = jax.jit(fp8_to_int8_compute)
    counter = [0]

    def nk():
        counter[0] += 1
        return jax.random.fold_in(key, counter[0])

    from functools import partial

    @partial(jax.jit, static_argnums=(1, 2, 3))
    def _qlin_impl(key, shape_in, shape_out, stacked):
        # jitted per-leaf so RNG staging buffers stay internal — dispatched eagerly
        # on this backend the intermediates become module outputs and the combined
        # init graph overflows the 16GB chip
        lead = (stacked,) if stacked else ()
        if kind == "fp8":
            q = (jax.random.normal(key, (*lead, shape_in, shape_out), jnp.bfloat16) * 48.0).astype(wdtype)
            w_scale = jnp.full(lead or (), 2000.0, jnp.float32)
        elif kind == "int4":
            q = jax.random.bits(key, (*lead, shape_in // 2, shape_out), jnp.uint8)
            # keep nibbles in the valid offset-binary range [0, 14]
            q = jnp.where((q & 0xF) == 0xF, q - 1, q)
            q = jnp.where((q >> 4) == 0xF, q - 16, q)
            w_scale = jnp.full((*lead, shape_out), 350.0, jnp.float32)
        else:
            bits = jax.random.bits(key, (*lead, shape_in, shape_out), jnp.uint8)
            q = jax.lax.bitcast_convert_type(bits, jnp.int8)
            w_scale = jnp.full((*lead, shape_out), 6000.0, jnp.float32)
        in_scale = jnp.full(lead or (), 800.0, jnp.float32)
        return Linear(
            q=q, w_scale=w_scale, w_scale_inv=1.0 / w_scale,
            in_scale=in_scale, in_scale_inv=1.0 / in_scale,
            bias=jnp.zeros((*lead, shape_out), jnp.bfloat16), kind=kind,
        )

    def qlin(shape_in, shape_out, stacked=None):
        leaf = _qlin_impl(nk(), shape_in, shape_out, stacked)
        jax.block_until_ready(leaf.q)  # serialize leaf builds to bound peak HBM
        if fast_accum:
            leaf = convert(leaf)
            jax.block_until_ready(leaf.q)
        return leaf

    def flin(shape_in, shape_out, stacked=None):
        lead = (stacked,) if stacked else ()
        return Linear(
            kernel=jax.random.normal(nk(), (*lead, shape_in, shape_out), jnp.bfloat16) * 0.02,
            bias=jnp.zeros((*lead, shape_out), jnp.bfloat16), kind="float",
        )

    hs, mh, hd = cfg.hidden_size, cfg.mlp_hidden, cfg.head_dim
    d, ds = cfg.depth, cfg.depth_single_blocks
    return {
        "img_in": flin(cfg.in_channels, hs),
        "txt_in": flin(cfg.context_in_dim, hs),
        "time_in": {"in_layer": flin(256, hs), "out_layer": flin(hs, hs)},
        "vector_in": {"in_layer": flin(cfg.vec_in_dim, hs), "out_layer": flin(hs, hs)},
        "guidance_in": {"in_layer": flin(256, hs), "out_layer": flin(hs, hs)},
        "double_blocks": {
            "img_mod_lin": qlin(hs, 6 * hs, d),
            "txt_mod_lin": qlin(hs, 6 * hs, d),
            "img_attn_qkv": qlin(hs, 3 * hs, d),
            "txt_attn_qkv": qlin(hs, 3 * hs, d),
            "img_attn_proj": qlin(hs, hs, d),
            "txt_attn_proj": qlin(hs, hs, d),
            "img_mlp_0": qlin(hs, mh, d),
            "img_mlp_2": qlin(mh, hs, d),
            "txt_mlp_0": qlin(hs, mh, d),
            "txt_mlp_2": qlin(mh, hs, d),
            "img_attn_qnorm": jnp.ones((d, hd), jnp.bfloat16),
            "img_attn_knorm": jnp.ones((d, hd), jnp.bfloat16),
            "txt_attn_qnorm": jnp.ones((d, hd), jnp.bfloat16),
            "txt_attn_knorm": jnp.ones((d, hd), jnp.bfloat16),
        },
        "single_blocks": {
            "linear1": qlin(hs, 3 * hs + mh, ds),
            "linear2": qlin(hs + mh, hs, ds),
            "mod_lin": qlin(hs, 3 * hs, ds),
            "qnorm": jnp.ones((ds, hd), jnp.bfloat16),
            "knorm": jnp.ones((ds, hd), jnp.bfloat16),
        },
        "final_layer": {
            "linear": flin(hs, cfg.in_channels),
            "adaln": flin(hs, 2 * hs),
        },
    }


def flux_dev_params_cfg(guidance_embed: bool = True) -> FluxParams:
    """The flux-dev 12B architecture (flux-schnell differs only by
    guidance_embed=False — reference util.py configs)."""
    return FluxParams(
        in_channels=64, vec_in_dim=768, context_in_dim=4096, hidden_size=3072,
        mlp_ratio=4.0, num_heads=24, depth=19, depth_single_blocks=38,
        axes_dim=[16, 56, 56], theta=10_000, qkv_bias=True,
        guidance_embed=guidance_embed,
    )


def measure_denoise(cfg, params, width, height, num_steps, batch=1, txt_len=512):
    """(it/s, seconds_per_run, compile_plus_first_run_s) for the fused-scan
    denoise at one resolution — the reference's headline metric (tqdm rate over
    flux_pipeline.py:628-651). One warm run compiles, the second is timed; the
    clock stops on a value fetch (block_until_ready is a no-op through the axon
    tunnel)."""
    b = batch
    h_lat, w_lat = 2 * math.ceil(height / 16), 2 * math.ceil(width / 16)
    img = jax.random.normal(
        jax.random.PRNGKey(1), (b, (h_lat // 2) * (w_lat // 2), cfg.in_channels), jnp.bfloat16
    )
    img_ids = make_img_ids(h_lat, w_lat, b)
    txt = jax.random.normal(jax.random.PRNGKey(2), (b, txt_len, cfg.context_in_dim), jnp.bfloat16)
    txt_ids = make_txt_ids(txt_len, b)
    vec = jax.random.normal(jax.random.PRNGKey(3), (b, cfg.vec_in_dim), jnp.bfloat16)
    ts = jnp.linspace(1.0, 0.0, num_steps + 1, dtype=jnp.float32)
    guidance = jnp.float32(3.5) if cfg.guidance_embed else None

    def run():
        # _denoise_scan donates the latent buffer — hand it a fresh copy per run
        img_in = jnp.array(img, copy=True)
        out = _denoise_scan(params, cfg, img_in, img_ids, txt, txt_ids, vec, ts, guidance)
        return float(jnp.sum(out.astype(jnp.float32)))  # fetch forces execution

    t0 = time.perf_counter()
    run()
    compile_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    run()
    dt = time.perf_counter() - t0
    return num_steps / dt, dt, compile_s


def main():
    # usage: bench.py [fp8|fp8_exact|int8|int4] [width] [height] [steps] [batch] —
    # defaults mirror the reference's headline row (README.md:25: 1024x1024, bs=1)
    kind = sys.argv[1] if len(sys.argv) > 1 else "fp8"
    width = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    height = int(sys.argv[3]) if len(sys.argv) > 3 else 1024
    num_steps = int(sys.argv[4]) if len(sys.argv) > 4 else 28
    batch = int(sys.argv[5]) if len(sys.argv) > 5 else 1

    cfg = FluxStatic.from_params(
        flux_dev_params_cfg(), use_pallas=jax.default_backend() == "tpu"
    )
    params = random_quantized_flux(cfg, jax.random.PRNGKey(0), kind=kind)
    its, dt, compile_s = measure_denoise(cfg, params, width, height, num_steps, batch)

    print(
        json.dumps(
            {
                "metric": f"denoise it/s @{width}x{height} flux-dev {kind} bs={batch} ({num_steps} steps, fused scan, TPU v5e)",
                "value": round(its, 3),
                "unit": "it/s",
                "vs_baseline": round(its / BASELINE_ITS, 4),
                "detail": {
                    "seconds_per_image_denoise": round(dt, 2),
                    "compile_plus_first_run_s": round(compile_s, 1),
                    "backend": jax.default_backend(),
                    # headline stays uncached (the reference's loop always evaluates);
                    # the opt-in step cache reaches 9.60 it/s-effective @1024² at
                    # SSIM 0.985 (interval=4) — measured in BENCH_CACHE_r5.json.
                    "step_cache_best_see": "BENCH_CACHE_r5.json",
                },
            }
        )
    )


if __name__ == "__main__":
    main()
