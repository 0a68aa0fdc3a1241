"""Mid-size fp8/int8/int4-vs-float SSIM on the real TPU (VERDICT r1 weak #8).

The CPU test suite gates SSIM on a tiny (hidden 64) random model; quantization error
can behave differently at depth/width, so this runs the same gate at hidden 1536 /
12 blocks / 512x512 — big enough for scale effects, small enough that the FLOAT
reference tree (bf16, ~1.4GB) still fits beside the quantized ones on a 16GB chip.

Weights are random-init (no checkpoints ship in this image; the BASELINE >=0.95 SSIM
claim on real weights remains flagged in README). Prints ONE JSON line.

Usage: python bench_fidelity.py [width height steps]
"""

import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

from flux_fp8_api_tpu.models.flux import FluxStatic, flux_apply, init_flux_params, quantize_flux_tree
from flux_fp8_api_tpu.ops.packing import make_img_ids, make_txt_ids
from flux_fp8_api_tpu.ops.quant import tree_fp8_to_int8_compute
from flux_fp8_api_tpu.sampling import _denoise_scan
from flux_fp8_api_tpu.utils.config import FluxParams
from flux_fp8_api_tpu.utils.fidelity import ssim


def latent_image(x, h_lat, w_lat):
    """Unpacked latent -> (H, W) uint8-range grayscale proxy for SSIM: channel-mean,
    then min-max to [0, 255]. Avoids entangling the comparison with a random VAE."""
    from flux_fp8_api_tpu.ops.packing import unpack_latents

    lat = unpack_latents(x.astype(jnp.float32), h_lat * 8, w_lat * 8)  # (B,16,h,w)
    img = np.asarray(jnp.mean(lat[0], axis=0))
    lo, hi = float(img.min()), float(img.max())
    return (img - lo) / max(hi - lo, 1e-9) * 255.0


def main():
    width = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    height = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    params_cfg = FluxParams(
        in_channels=64, vec_in_dim=768, context_in_dim=4096, hidden_size=1536,
        mlp_ratio=4.0, num_heads=12, depth=4, depth_single_blocks=8,
        axes_dim=[16, 56, 56], theta=10_000, qkv_bias=True, guidance_embed=True,
    )
    cfg = FluxStatic.from_params(params_cfg, use_pallas=jax.default_backend() == "tpu")
    fparams = jax.jit(
        lambda k: init_flux_params(k, cfg, jnp.bfloat16), static_argnums=()
    )(jax.random.PRNGKey(0))
    jax.block_until_ready(fparams["double_blocks"]["img_attn_qkv"].kernel)

    b = 1
    h_lat, w_lat = height // 8, width // 8
    img0 = jax.random.normal(
        jax.random.PRNGKey(1), (b, (h_lat // 2) * (w_lat // 2), 64), jnp.bfloat16
    )
    img_ids = make_img_ids(h_lat, w_lat, b)
    txt = jax.random.normal(jax.random.PRNGKey(2), (b, 256, 4096), jnp.bfloat16)
    txt_ids = make_txt_ids(256, b)
    vec = jax.random.normal(jax.random.PRNGKey(3), (b, 768), jnp.bfloat16)
    ts = jnp.linspace(1.0, 0.0, steps + 1, dtype=jnp.float32)
    g = jnp.float32(3.5)

    def calibrated(tree):
        """One amax-collect pass + scale write: the num_scale_trials protocol's
        steady state, without dragging the pipeline in."""
        from flux_fp8_api_tpu.calibration import apply_input_scales, merge_amax

        _, amaxes = flux_apply(
            tree, cfg, img0, img_ids, txt, txt_ids, jnp.full((b,), 0.5, jnp.float32),
            vec, jnp.full((b,), 3.5, jnp.float32), collect_amax=True,
        )
        return apply_input_scales(tree, merge_amax(None, amaxes))

    def denoise(tree):
        out = _denoise_scan(
            tree, cfg, jnp.array(img0, copy=True), img_ids, txt, txt_ids, vec, ts, g
        )
        return latent_image(out, h_lat, w_lat)

    ref = denoise(fparams)
    results = {}
    for tier in ("fp8", "fp8_fast_accum", "int8", "int4"):
        qtree = quantize_flux_tree(fparams, kind=("fp8" if tier == "fp8_fast_accum" else tier))
        qtree = calibrated(qtree)
        if tier == "fp8_fast_accum":
            qtree = tree_fp8_to_int8_compute(qtree)
        results[tier] = round(float(ssim(ref, denoise(qtree))), 4)
        del qtree

    print(
        json.dumps(
            {
                "metric": f"SSIM vs bf16, hidden-1536 12-block flux @{width}x{height}/{steps} steps, random-init (TPU)",
                "value": results["fp8_fast_accum"],
                "unit": "ssim",
                "detail": results,
            }
        )
    )


if __name__ == "__main__":
    main()
