"""Resolution + tier benchmark table, ONE driver-consumable JSON line.

The reference's README publishes its headline it/s across three resolutions
(reference README.md:14-45); this emits the equivalent table for the TPU build in
a single artifact instead of prose (VERDICT r4 #4), and fills the tier-table gaps
(#8: int8 @768² was an extrapolation, int4 @1024×720 was unmeasured).

Rows (default):
    fp8  @1024x1024 28 steps   — the headline (matches bench.py)
    fp8  @768x768   28
    fp8  @1024x720  28
    fp8  @1024x1024  4 steps, schnell arch (no guidance embed, 256 T5 tokens)
    int8 @768x768   28
    int4 @1024x720  28

One process: the fp8 tree is built once and reused across its rows; tier trees
are built after the previous tree is freed (12GB quantized params beside 16GB
HBM — two trees never coexist). Usage:

    python bench_all.py            # full table (TPU, ~20-40 min)
    python bench_all.py --out F    # also write the JSON line to F
    BENCH_TINY=1 python bench_all.py   # hidden-64 arch on CPU (plumbing test)

Prints ONE JSON line:
    {"metric": ..., "value": <headline fp8@1024² it/s>, "unit": "it/s",
     "vs_baseline": ..., "detail": {"rows": [...]}}
"""

import gc
import json
import os
import sys
import time

import jax

from bench import BASELINE_ITS, flux_dev_params_cfg, measure_denoise, random_quantized_flux
from flux_fp8_api_tpu.models.flux import FluxStatic
from flux_fp8_api_tpu.utils.config import FluxParams

TINY = os.environ.get("BENCH_TINY") == "1"

# (tier, width, height, steps, schnell)
DEFAULT_ROWS = [
    ("fp8", 1024, 1024, 28, False),
    ("fp8", 768, 768, 28, False),
    ("fp8", 1024, 720, 28, False),
    ("fp8", 1024, 1024, 4, True),
    ("int8", 768, 768, 28, False),
    ("int4", 1024, 720, 28, False),
]


def _params_cfg(schnell: bool) -> FluxParams:
    if TINY:
        return FluxParams(
            in_channels=64, vec_in_dim=64, context_in_dim=64, hidden_size=64,
            mlp_ratio=4.0, num_heads=2, depth=1, depth_single_blocks=2,
            axes_dim=[8, 12, 12], theta=10_000, qkv_bias=True,
            guidance_embed=not schnell,
        )
    return flux_dev_params_cfg(guidance_embed=not schnell)


def main():
    if TINY:
        jax.config.update("jax_platforms", "cpu")
    argv = sys.argv[1:]
    out_path = None
    if "--out" in argv:
        i = argv.index("--out")
        out_path = argv[i + 1]
        del argv[i : i + 2]
    rows = DEFAULT_ROWS[:1] if TINY else DEFAULT_ROWS

    results = []
    tree = None
    tree_key = None  # (tier, schnell) the current tree was built for
    for tier, width, height, steps, schnell in rows:
        if TINY:
            width, height, steps = 256, 256, 2
        cfg = FluxStatic.from_params(
            _params_cfg(schnell), use_pallas=jax.default_backend() == "tpu"
        )
        # schnell reuses the dev tree: the only difference is that flux_apply
        # never touches the (tiny) guidance_in leaves when guidance_embed=False
        if tree_key != (tier,):
            tree = None
            gc.collect()  # free the previous 12GB tree BEFORE building the next
            t0 = time.perf_counter()
            tree = random_quantized_flux(cfg, jax.random.PRNGKey(0), kind=tier)
            print(
                f"# built {tier} tree in {time.perf_counter() - t0:.0f}s",
                file=sys.stderr, flush=True,
            )
            tree_key = (tier,)
        txt_len = 256 if schnell else 512
        its, dt, compile_s = measure_denoise(
            cfg, tree, width, height, steps, batch=1, txt_len=txt_len
        )
        row = {
            "tier": tier,
            "resolution": f"{width}x{height}",
            "steps": steps,
            "model": "flux-schnell" if schnell else "flux-dev",
            "it_s": round(its, 3),
            "s_per_image_denoise": round(dt, 2),
            "compile_s": round(compile_s, 1),
        }
        results.append(row)
        print(f"# {row}", file=sys.stderr, flush=True)

    headline = results[0]["it_s"]
    line = json.dumps(
        {
            "metric": (
                "denoise it/s table (headline: flux-dev fp8 @1024x1024 bs=1, "
                f"fused scan, {jax.default_backend()})"
            ),
            "value": headline,
            "unit": "it/s",
            "vs_baseline": round(headline / BASELINE_ITS, 4),
            "detail": {"rows": results, "baseline_it_s": BASELINE_ITS},
        }
    )
    if out_path:
        tmp = out_path + ".tmp"
        with open(tmp, "w") as f:
            f.write(line + "\n")
        os.replace(tmp, out_path)
    print(line, flush=True)


if __name__ == "__main__":
    main()
