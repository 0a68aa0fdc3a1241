"""QLoRA LoRA-training throughput at flux-dev scale on the real chip.

Measures the adapter train step (parallel/train.py:make_lora_train_step) with a
frozen quantized 12B base — the configuration that makes training possible at all on
16GB HBM (full bf16 fine-tuning needs ~72GB). Prints one JSON line like bench.py.

    python bench_train.py [int8|fp8|int4] [width] [height] [rank] [batch]

Steps/s is measured over a scan-free loop of real step() calls (each step is one jit
with donated adapters+opt_state; the per-call tunnel floor ~32ms is <5% of a
multi-second step, so per-call timing is fine here — unlike kernel ablations).
"""

import json
import sys
import time

import jax
import jax.numpy as jnp


def main():
    kind = sys.argv[1] if len(sys.argv) > 1 else "int8"
    width = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    height = int(sys.argv[3]) if len(sys.argv) > 3 else 512
    rank = int(sys.argv[4]) if len(sys.argv) > 4 else 16
    batch = int(sys.argv[5]) if len(sys.argv) > 5 else 1

    import optax

    from bench import random_quantized_flux  # jit-per-leaf init (no HBM blowup)
    from flux_fp8_api_tpu.lora import init_lora_adapters
    from flux_fp8_api_tpu.models.flux import FluxStatic
    from flux_fp8_api_tpu.parallel.train import make_dummy_batch, make_lora_train_step
    from flux_fp8_api_tpu.utils.config import FluxParams

    params_cfg = FluxParams(
        in_channels=64, vec_in_dim=768, context_in_dim=4096, hidden_size=3072,
        mlp_ratio=4.0, num_heads=24, depth=19, depth_single_blocks=38,
        axes_dim=[16, 56, 56], theta=10_000, qkv_bias=True, guidance_embed=True,
    )
    cfg = FluxStatic.from_params(params_cfg, use_pallas=False)
    params = random_quantized_flux(cfg, jax.random.PRNGKey(0), kind=kind)
    adapters = init_lora_adapters(params, rank=rank, key=jax.random.PRNGKey(1))
    init_fn, step = make_lora_train_step(
        cfg, optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(1e-4))
    )
    opt_state = init_fn(adapters)
    b = make_dummy_batch(
        cfg, batch, height // 8, width // 8, 512, jax.random.PRNGKey(2)
    )

    t0 = time.time()
    adapters, opt_state, loss = step(adapters, opt_state, params, b, jax.random.PRNGKey(3))
    compile_s = time.time() - t0
    _ = float(loss)  # force (block_until_ready is a no-op through the tunnel)

    n = 6
    t0 = time.time()
    for i in range(n):
        adapters, opt_state, loss = step(
            adapters, opt_state, params, b, jax.random.PRNGKey(4 + i)
        )
        last = float(loss)
    dt = (time.time() - t0) / n
    print(json.dumps({
        "metric": f"qlora train step s @{width}x{height} flux-dev {kind} base rank{rank} bs={batch} (TPU v5e)",
        "value": round(dt, 3),
        "unit": "s/step",
        "detail": {
            "steps_per_s": round(1.0 / dt, 3),
            "compile_plus_first_step_s": round(compile_s, 1),
            "final_loss": round(last, 4),
            "backend": jax.default_backend(),
        },
    }))


if __name__ == "__main__":
    main()
