"""LoRA fine-tuning CLI: images + captions in, kohya-format LoRA safetensors out.

The reference has no trainer — its users produce LoRAs in external CUDA stacks
(kohya/SimpleTuner) and hot-load the file through ``/lora``. Here the framework closes
the loop itself, on the same chip that serves: the flow stays in the config's
(typically quantized) form as a frozen base, rank-r adapters train QLoRA-style
(parallel/train.py:make_lora_train_step), and the export (lora.py:save_lora_adapters)
is a standard ``lora_unet_*`` file any FLUX stack — including the reference — loads.

    python -m flux_fp8_api_tpu.train_lora --config-path configs/config-dev-int8.json \
        --data-dir ./my_dataset --rank 16 --steps 1000 --lr 1e-4 \
        --width 512 --height 512 --output my_lora.safetensors

Dataset layout: a directory of images (png/jpg/jpeg/webp); each image's caption comes
from a same-stem ``.txt`` file when present, else from the filename stem (underscores
→ spaces) — the common kohya folder convention.

Everything before the train loop reuses the serving pipeline's own components: the
VAE encode jit (with the config's dtype policy), the weighted T5/CLIP embedding path
(including prompt emphasis syntax in captions), and the resize-center-crop geometry —
so training sees exactly the distribution serving will.
"""

from __future__ import annotations

import argparse
import os
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .utils.logging import logger

_IMAGE_EXTS = (".png", ".jpg", ".jpeg", ".webp", ".bmp")


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Train a FLUX LoRA on a frozen (quantized) base")
    p.add_argument("--config-path", type=str, required=True,
                   help="ModelSpec JSON — the same config files serving uses; the "
                        "flow loads in its configured quantization and stays frozen")
    p.add_argument("--data-dir", type=str, required=True,
                   help="Directory of images; captions from same-stem .txt files "
                        "(else the filename stem)")
    p.add_argument("--output", type=str, required=True,
                   help="Output .safetensors path (kohya lora_unet_* format)")
    p.add_argument("--rank", type=int, default=16)
    p.add_argument("--steps", type=int, default=1000)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--height", type=int, default=512)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--save-every", type=int, default=0,
                   help="Also export every N steps (0 = only at the end)")
    p.add_argument("--no-remat", action="store_true",
                   help="Disable per-block gradient rematerialization (faster per "
                        "step, ~1.6GB·batch more activation memory at dev scale)")
    p.add_argument("--state-dir", type=str, default=None,
                   help="Orbax train-state directory: {adapters, opt_state, step} "
                        "saved alongside every export and restored at startup when "
                        "present — interrupted runs resume exactly")
    p.add_argument("--val-every", type=int, default=0,
                   help="Every N steps, report loss on a held-out example (needs "
                        ">=4 examples; 0 = off). Uses a FIXED timestep/noise draw so "
                        "the number is comparable across evals")
    p.add_argument("--t-sampling", choices=["logit_normal", "uniform"],
                   default="logit_normal",
                   help="Timestep density: logit_normal (default; SD3/FLUX training "
                        "density, resolution-shifted like the sampler schedule) or "
                        "uniform")
    return p.parse_args(argv)


def list_examples(data_dir: str) -> List[Tuple[str, str]]:
    """→ [(image_path, caption)] following the kohya folder convention."""
    pairs = []
    for name in sorted(os.listdir(data_dir)):
        stem, ext = os.path.splitext(name)
        if ext.lower() not in _IMAGE_EXTS:
            continue
        img_path = os.path.join(data_dir, name)
        txt_path = os.path.join(data_dir, stem + ".txt")
        if os.path.exists(txt_path):
            with open(txt_path, "r", encoding="utf-8") as f:
                caption = f.read().strip()
        else:
            caption = stem.replace("_", " ")
        pairs.append((img_path, caption))
    if not pairs:
        raise ValueError(f"no images found under {data_dir} (looked for {_IMAGE_EXTS})")
    return pairs


def encode_dataset(pipe, pairs, width: int, height: int, key) -> Dict[str, np.ndarray]:
    """Pre-encode every example once (latents via the VAE, text via T5/CLIP) into
    host-RAM numpy — LoRA datasets are small, and caching beats re-encoding every
    epoch. Returns stacked {latents (N,L,64), txt, y, img_ids, txt_ids}."""
    from PIL import Image

    latents, txts, vecs = [], [], []
    caption_cache: Dict[str, Tuple[np.ndarray, np.ndarray]] = {}
    for i, (img_path, caption) in enumerate(pairs):
        img = np.asarray(Image.open(img_path).convert("RGB"), np.uint8)
        arr = pipe.resize_center_crop(img, height, width)
        nhwc = (arr.astype(np.float32) / 127.5 - 1.0)[None]
        key, k_ae = jax.random.split(key)
        z = pipe._jit_ae_encode(
            pipe.ae_params, jnp.asarray(nhwc, pipe.ae_dtype), k_ae
        )  # (1, h, w, 16)
        z = jnp.transpose(z, (0, 3, 1, 2))  # NCHW
        from .ops.packing import pack_latents

        latents.append(np.asarray(pack_latents(z.astype(jnp.float32))))
        if caption not in caption_cache:
            vec, txt = pipe.embed_text(caption)
            caption_cache[caption] = (np.asarray(vec, np.float32), np.asarray(txt, np.float32))
        vec, txt = caption_cache[caption]
        vecs.append(vec)
        txts.append(txt)
        if (i + 1) % 25 == 0:
            logger.info(f"encoded {i + 1}/{len(pairs)} examples")

    from .ops.packing import make_img_ids, make_txt_ids

    lat = np.concatenate(latents, axis=0)
    txt = np.concatenate(txts, axis=0)
    n = lat.shape[0]
    return {
        "latents": lat,
        "txt": txt,
        "y": np.concatenate(vecs, axis=0),
        "img_ids": np.asarray(make_img_ids(height // 8, width // 8, n)),
        "txt_ids": np.asarray(make_txt_ids(txt.shape[1], n)),
    }


def train(argv=None) -> Optional[str]:
    args = parse_args(argv)
    import optax

    from .lora import init_lora_adapters, save_lora_adapters
    from .parallel.train import make_lora_train_step
    from .pipeline import FluxPipeline

    if args.width % 16 or args.height % 16:
        raise ValueError("width/height must be multiples of 16 (2x2-packed 8x VAE latents)")

    pipe = FluxPipeline.load_pipeline_from_config_path(args.config_path)
    cfg = pipe.model_cfg
    base = pipe.model_params
    if pipe.offload_flow:
        # training runs the flow every step — park it on device for the whole run
        base = jax.device_put(base, pipe.device_flux)

    key = jax.random.PRNGKey(args.seed)
    key, k_data, k_init = jax.random.split(key, 3)
    pairs = list_examples(args.data_dir)
    logger.info(f"{len(pairs)} training examples; encoding at {args.width}x{args.height}")
    data = encode_dataset(pipe, pairs, args.width, args.height, k_data)
    n = data["latents"].shape[0]

    # hold out one example for validation when asked and the set is big enough
    val_idx = None
    if args.val_every and n >= 4:
        val_idx = n - 1
        n -= 1
    elif args.val_every:
        logger.warning("--val-every needs >=4 examples; validation disabled")

    adapters = init_lora_adapters(base, rank=args.rank, key=k_init)
    init_fn, step = make_lora_train_step(
        cfg, optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(args.lr)),
        remat=not args.no_remat, t_sampling=args.t_sampling,
    )
    opt_state = init_fn(adapters)

    start_step = 0
    if args.state_dir and os.path.isdir(args.state_dir):
        from .parallel.train import restore_train_state

        adapters, opt_state, start_step = restore_train_state(
            os.path.abspath(args.state_dir), adapters, opt_state
        )
        logger.info(f"resumed train state from {args.state_dir} @ step {start_step}")

    val_loss_fn = None
    if val_idx is not None:
        from .parallel.train import flow_matching_loss as _fml
        import dataclasses as _dc

        vcfg = _dc.replace(
            cfg, use_pallas=False, attn_shard_axes=None, attn_seq_axis=None,
            dequant_linears=True,
        )
        from .lora import merge_lora_adapters

        vbatch = {k: jnp.asarray(v[val_idx:val_idx + 1]) for k, v in data.items()}
        vkey = jax.random.PRNGKey(args.seed + 1)  # FIXED t/noise draw across evals

        @jax.jit
        def val_loss_fn(adapters):
            return _fml(
                merge_lora_adapters(base, adapters), vcfg, vbatch, vkey, args.t_sampling
            )

    bs = max(1, min(args.batch_size, n))
    rng = np.random.default_rng(args.seed)
    order = rng.permutation(n)
    cursor = 0
    # Fast-forward the data order and PRNG stream to the restored step so a
    # resumed run draws the same (batch, noise, timestep) sequence an
    # uninterrupted one would — resume is a continuation, not a replay.
    for _ in range(start_step):
        if cursor + bs > n:
            order = rng.permutation(n)
            cursor = 0
        cursor += bs
        key, _ = jax.random.split(key)
    ema_loss = None
    for it in range(start_step, args.steps):
        if cursor + bs > n:
            order = rng.permutation(n)
            cursor = 0
        idx = order[cursor:cursor + bs]
        cursor += bs
        batch = {k: jnp.asarray(v[idx]) for k, v in data.items()}
        key, k_step = jax.random.split(key)
        adapters, opt_state, loss = step(adapters, opt_state, base, batch, k_step)
        loss_val = float(loss)
        ema_loss = loss_val if ema_loss is None else 0.98 * ema_loss + 0.02 * loss_val
        if (it + 1) % 10 == 0 or it == start_step:
            logger.info(f"step {it + 1}/{args.steps}  loss {loss_val:.4f}  ema {ema_loss:.4f}")
        if val_loss_fn is not None and args.val_every and (it + 1) % args.val_every == 0:
            logger.info(f"step {it + 1}  val loss {float(val_loss_fn(adapters)):.4f}")
        if args.save_every and (it + 1) % args.save_every == 0:
            save_lora_adapters(args.output, adapters, cfg)
            if args.state_dir:
                from .parallel.train import save_train_state

                save_train_state(
                    os.path.abspath(args.state_dir), adapters, opt_state, it + 1,
                    overwrite=True,
                )
            logger.info(f"checkpointed adapters to {args.output} @ step {it + 1}")

    save_lora_adapters(args.output, adapters, cfg)
    if args.state_dir:
        from .parallel.train import save_train_state

        save_train_state(
            os.path.abspath(args.state_dir), adapters, opt_state, args.steps, overwrite=True
        )
    ema_note = f", final ema loss {ema_loss:.4f}" if ema_loss is not None else ""
    logger.success(
        f"LoRA (rank {args.rank}, {args.steps} steps{ema_note}) "
        f"written to {args.output} — load with pipeline.load_lora or the /lora endpoint"
    )
    return args.output


if __name__ == "__main__":
    train()
