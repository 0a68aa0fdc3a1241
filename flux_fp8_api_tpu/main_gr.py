"""Gradio front-end for the TPU pipeline.

Covers the reference's UI capability surface (prompt box, img2img with noising
strength, resolution/steps/guidance/seed controls, optional metadata embedding,
used-seed readback — reference ``main_gr.py:1-132``) with this framework's own
layout: two task tabs (text-to-image / image-to-image) instead of a visibility-
toggled checkbox, resolution presets next to the sliders, and a settings readback
panel so every generation is reproducible.

gradio isn't baked into the TPU image — the import is gated with a clear message
(the stdlib/FastAPI server in main.py is the always-available front-end).
"""

from __future__ import annotations

import json
import os
from typing import Optional

from PIL import Image

try:
    import gradio as gr
except ImportError:  # pragma: no cover
    gr = None

RESOLUTION_PRESETS = {
    "square 1024 (1:1)": (1024, 1024),
    "portrait 832×1216 (2:3)": (832, 1216),
    "landscape 1216×832 (3:2)": (1216, 832),
    "wide 1344×768 (16:9)": (1344, 768),
    "custom": None,
}

_STEP_LIMITS = (1, 50)
_SIZE_LIMITS = (128, 4096)  # multiples of 16 enforced by the pipeline

# Step-cache presets (sampling.CacheConfig) — the measured sweet spots from
# bench_cache.py / docs/PERF.md; mirrored by webui.py's select.
STEP_CACHE_CHOICES = {
    "off — every step evaluated (full quality)": None,
    "dynamic ≈2× faster (SSIM 0.996 vs uncached)": {"mode": "dynamic", "threshold": 0.4},
    "interval 4 ≈3× faster (SSIM 0.985 vs uncached)": {"mode": "interval", "interval": 4},
}


def resolve_seed(raw) -> Optional[int]:
    """UI seed field → pipeline seed: blank/-1 mean 'pick one for me'."""
    if raw is None:
        return None
    text = str(raw).strip()
    if text in ("", "-1"):
        return None
    try:
        return int(text)
    except ValueError:
        return None  # garbage input falls back to a random seed, like the API


def settings_record(prompt, width, height, steps, guidance, seed, strength=None) -> dict:
    """The reproducibility record shown in the UI and embedded as image metadata."""
    rec = {
        "prompt": prompt,
        "width": int(width),
        "height": int(height),
        "num_steps": int(steps),
        "guidance": float(guidance),
        "seed": int(seed),
    }
    if strength is not None:
        rec["strength"] = float(strength)
    return rec


def attach_metadata(image: Image.Image, record: dict) -> str:
    """Write the image to a PNG whose tEXt chunk carries the generation settings
    (the A1111-style ``parameters`` key) and return its path.

    PIL does NOT persist ``image.info`` on save — PNG text chunks must go through an
    explicit ``PngInfo`` — and Gradio re-encodes PIL return values (stripping chunks),
    so the only way the metadata survives to the user's download is to hand Gradio a
    finished file path.
    """
    import tempfile

    from PIL.PngImagePlugin import PngInfo

    meta = PngInfo()
    meta.add_text("parameters", json.dumps(record))
    f = tempfile.NamedTemporaryFile(suffix=".png", delete=False)
    image.save(f, format="PNG", pnginfo=meta)
    f.close()
    # bound the temp-dir footprint: a long-running server would otherwise leak one
    # PNG per generation. Keep a window of recent files (Gradio may still be
    # streaming the last few) and unlink the oldest beyond it.
    _TEMP_PNGS.append(f.name)
    while len(_TEMP_PNGS) > 16:
        stale = _TEMP_PNGS.pop(0)
        try:
            os.unlink(stale)
        except OSError:
            pass
    return f.name


_TEMP_PNGS: list = []


def build_ui(pipeline):
    """Assemble the Blocks app around an already-loaded FluxPipeline."""
    if gr is None:
        raise ImportError(
            "gradio is not installed in this environment; use the HTTP server "
            "(python -m flux_fp8_api_tpu.main) instead, or pip install gradio."
        )

    schnell = str(pipeline.config.version) == "flux-schnell"
    default_steps = 4 if schnell else 28

    def run(prompt, preset, width, height, steps, guidance, seed_text, embed_meta,
            cache_choice="off", source_image=None, strength=0.75):
        if RESOLUTION_PRESETS.get(preset):
            width, height = RESOLUTION_PRESETS[preset]
        jpeg, used_seed = pipeline.generate(
            prompt=prompt,
            width=int(width),
            height=int(height),
            num_steps=int(steps),
            guidance=float(guidance),
            seed=resolve_seed(seed_text),
            init_image=source_image,
            strength=float(strength),
            silent=True,
            return_seed=True,
            cache=STEP_CACHE_CHOICES.get(cache_choice),
        )
        img = Image.open(jpeg)
        rec = settings_record(
            prompt, width, height, steps, guidance, used_seed,
            strength if source_image is not None else None,
        )
        if embed_meta:
            img = attach_metadata(img, rec)
        return img, json.dumps(rec, indent=2)

    def shared_controls():
        preset = gr.Dropdown(
            list(RESOLUTION_PRESETS), value="square 1024 (1:1)", label="Resolution"
        )
        with gr.Row():
            width = gr.Slider(*_SIZE_LIMITS, value=1024, step=16, label="Width (custom)")
            height = gr.Slider(*_SIZE_LIMITS, value=1024, step=16, label="Height (custom)")
        steps = gr.Slider(*_STEP_LIMITS, value=default_steps, step=1, label="Denoise steps",
                          interactive=not schnell)
        guidance = gr.Slider(1.0, 10.0, value=3.5, step=0.1, label="Guidance scale",
                             interactive=not schnell)
        seed_text = gr.Textbox(value="", label="Seed (blank or -1 = random)")
        embed_meta = gr.Checkbox(value=True, label="Embed settings in image metadata")
        cache_choice = gr.Dropdown(
            list(STEP_CACHE_CHOICES), value=next(iter(STEP_CACHE_CHOICES)),
            label="Step cache (speed ↔ fidelity)",
        )
        return preset, width, height, steps, guidance, seed_text, embed_meta, cache_choice

    with gr.Blocks(title="flux-fp8-api-tpu") as app:
        gr.Markdown(
            f"## flux-fp8-api-tpu — {pipeline.config.version} on "
            f"{pipeline.device_flux.platform}"
        )
        with gr.Tab("Text to image"):
            t_prompt = gr.Textbox(label="Prompt", lines=3,
                                  placeholder="describe the image to generate…")
            t_ctl = shared_controls()
            t_go = gr.Button("Generate", variant="primary")
            t_img = gr.Image(label="Result")
            t_rec = gr.Code(label="Generation settings", language="json")
            t_go.click(run, inputs=[t_prompt, *t_ctl], outputs=[t_img, t_rec])

        with gr.Tab("Image to image", interactive=not schnell):
            i_prompt = gr.Textbox(label="Prompt", lines=3)
            i_source = gr.Image(label="Source image", type="numpy")
            i_strength = gr.Slider(0.0, 1.0, value=0.75, step=0.05,
                                   label="Noising strength (1 = ignore source)")
            i_ctl = shared_controls()
            i_go = gr.Button("Generate from image", variant="primary")
            i_img = gr.Image(label="Result")
            i_rec = gr.Code(label="Generation settings", language="json")
            i_go.click(run, inputs=[i_prompt, *i_ctl, i_source, i_strength],
                       outputs=[i_img, i_rec])
    return app


def create_demo(config_path: str):
    """Load the pipeline from a config JSON and return the Blocks app."""
    from .pipeline import FluxPipeline

    # the UI calls generate(silent=True): skip the interactive per-step precompile
    return build_ui(
        FluxPipeline.load_pipeline_from_config_path(
            config_path, precompile_interactive=False
        )
    )


def main(argv=None):
    import argparse

    parser = argparse.ArgumentParser(description="flux-fp8-api-tpu Gradio UI")
    parser.add_argument("--config", type=str, default="configs/config-dev.json")
    parser.add_argument("--share", action="store_true", help="Expose a public link")
    args = parser.parse_args(argv)
    create_demo(args.config).launch(share=args.share)


if __name__ == "__main__":
    main()
