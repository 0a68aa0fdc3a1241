"""Step-cache bench: speed and fidelity of sampling.CacheConfig at flux-dev scale.

For each cache policy, runs the full fused denoise (@width x height, fp8 tier,
random quantized weights — no checkpoints ship in this image) and reports:
  - effective it/s (schedule steps / wall seconds — skipped steps are free), and
  - SSIM of the cached output vs the UNCACHED same-tier output (the cache-induced
    error alone, same grayscale-latent proxy as bench_fidelity.py).

The reference has no step cache (its loop always evaluates,
flux_pipeline.py:628-651) — this measures a TPU-stack extra over parity. interval
mode is weight-independent; dynamic thresholds are calibrated on random weights
here and would need re-tuning on real checkpoints (same caveat as the fidelity
gate, FIDELITY_full_r4.json).

Usage: python bench_cache.py [width height steps]   (defaults 1024 1024 28)
Prints one JSON line per policy + a summary line.
BENCH_TINY=1 runs a hidden-64 arch on CPU — the plumbing test's fast path.
"""

import json
import math
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from bench import flux_dev_params_cfg, random_quantized_flux
from bench_fidelity import latent_image
from flux_fp8_api_tpu.models.flux import FluxStatic
from flux_fp8_api_tpu.ops.packing import make_img_ids, make_txt_ids
from flux_fp8_api_tpu.sampling import CacheConfig, _denoise_scan, _denoise_scan_cached
from flux_fp8_api_tpu.utils.config import FluxParams
from flux_fp8_api_tpu.utils.fidelity import ssim

TINY = os.environ.get("BENCH_TINY") == "1"

POLICIES = [
    ("interval2", CacheConfig(mode="interval", interval=2, warmup=2, tail=1)),
    ("interval3", CacheConfig(mode="interval", interval=3, warmup=2, tail=1)),
    ("dynamic.2", CacheConfig(mode="dynamic", threshold=0.2, warmup=2, tail=1)),
    ("dynamic.4", CacheConfig(mode="dynamic", threshold=0.4, warmup=2, tail=1)),
    # order=1 (TaylorSeer-style linear extrapolation): same eval counts, strictly
    # more signal per skipped step — and it may hold SSIM at sparser intervals.
    ("interval3+o1", CacheConfig(mode="interval", interval=3, warmup=2, tail=1, order=1)),
    ("interval4", CacheConfig(mode="interval", interval=4, warmup=2, tail=1)),
    ("interval4+o1", CacheConfig(mode="interval", interval=4, warmup=2, tail=1, order=1)),
    ("interval5+o1", CacheConfig(mode="interval", interval=5, warmup=2, tail=1, order=1)),
    ("dynamic.4+o1", CacheConfig(mode="dynamic", threshold=0.4, warmup=2, tail=1, order=1)),
]

# BENCH_POLICIES=name1,name2 restricts the sweep (the uncached baseline always runs)
# — lets a follow-up measure new rows without re-paying the full table's compiles.
_ONLY = os.environ.get("BENCH_POLICIES")
if _ONLY:
    _names = {s.strip() for s in _ONLY.split(",")}
    POLICIES = [p for p in POLICIES if p[0] in _names]


def main():
    width = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    height = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    num_steps = int(sys.argv[3]) if len(sys.argv) > 3 else 28
    txt_len = 512

    if TINY:
        jax.config.update("jax_platforms", "cpu")
        width, height, num_steps, txt_len = 256, 256, 8, 16
        params_cfg = FluxParams(
            in_channels=64, vec_in_dim=64, context_in_dim=64, hidden_size=64,
            mlp_ratio=4.0, num_heads=2, depth=1, depth_single_blocks=2,
            axes_dim=[8, 12, 12], theta=10_000, qkv_bias=True, guidance_embed=True,
        )
    else:
        params_cfg = flux_dev_params_cfg()
    cfg = FluxStatic.from_params(
        params_cfg, use_pallas=jax.default_backend() == "tpu"
    )
    params = random_quantized_flux(cfg, jax.random.PRNGKey(0), kind="fp8")

    h_lat, w_lat = 2 * math.ceil(height / 16), 2 * math.ceil(width / 16)
    img = jax.random.normal(
        jax.random.PRNGKey(1), (1, (h_lat // 2) * (w_lat // 2), cfg.in_channels), jnp.bfloat16
    )
    img_ids = make_img_ids(h_lat, w_lat, 1)
    txt = jax.random.normal(jax.random.PRNGKey(2), (1, txt_len, cfg.context_in_dim), jnp.bfloat16)
    txt_ids = make_txt_ids(txt_len, 1)
    vec = jax.random.normal(jax.random.PRNGKey(3), (1, cfg.vec_in_dim), jnp.bfloat16)
    ts = jnp.linspace(1.0, 0.0, num_steps + 1, dtype=jnp.float32)
    guidance = jnp.float32(3.5)

    def run_uncached():
        out = _denoise_scan(
            params, cfg, jnp.array(img, copy=True), img_ids, txt, txt_ids, vec, ts, guidance
        )
        _ = float(jnp.sum(out.astype(jnp.float32)))  # fetch forces execution
        return out

    def run_cached(cache):
        out, n = _denoise_scan_cached(
            params, cfg, cache, jnp.array(img, copy=True), img_ids, txt, txt_ids,
            vec, ts, guidance,
        )
        _ = float(jnp.sum(out.astype(jnp.float32)))
        return out, int(n)

    # uncached baseline: warm (compile) + timed run
    run_uncached()
    t0 = time.perf_counter()
    ref_out = run_uncached()
    base_dt = time.perf_counter() - t0
    ref_img = latent_image(ref_out, h_lat, w_lat)
    base_its = num_steps / base_dt
    print(json.dumps({
        "policy": "uncached", "evals": num_steps, "seconds": round(base_dt, 2),
        "it_per_s_effective": round(base_its, 3), "ssim_vs_uncached": 1.0,
    }), flush=True)

    rows = []
    for name, cache in POLICIES:
        run_cached(cache)  # compile
        t0 = time.perf_counter()
        out, n_evals = run_cached(cache)
        dt = time.perf_counter() - t0
        row = {
            "policy": name, "evals": n_evals, "seconds": round(dt, 2),
            "it_per_s_effective": round(num_steps / dt, 3),
            "ssim_vs_uncached": round(ssim(ref_img, latent_image(out, h_lat, w_lat)), 4),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    best = max((r for r in rows if r["ssim_vs_uncached"] >= 0.95),
               key=lambda r: r["it_per_s_effective"], default=None)
    print(json.dumps({
        "metric": f"step-cache best @{width}x{height} fp8 ({num_steps} steps, ssim>=0.95)",
        "value": best["it_per_s_effective"] if best else None,
        "unit": "it/s-effective",
        "vs_uncached": round(best["it_per_s_effective"] / base_its, 3) if best else None,
        "detail": {"uncached_it_per_s": round(base_its, 3), "rows": rows},
    }))


if __name__ == "__main__":
    main()
