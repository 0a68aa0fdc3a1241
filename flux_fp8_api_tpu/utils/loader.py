"""Model-bundle construction from a ModelSpec (reference ``util.py:82-95,225-333``).

Builds the flow transformer / VAE / CLIP / T5 from checkpoint paths when present, or
random-init when absent (benchmarks and tests run without FLUX weights — the image has
no network egress). Applies the quantization tiers from the spec.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ..models.autoencoder import init_autoencoder_params
from ..models.clip import CLIPConfig, init_clip_params
from ..models.conditioner import TextEncoder, apply_quantization
from ..models.flux import FluxStatic, init_flux_params, quantize_flux_tree
from ..ops.quant import tree_fp8_to_int8_compute, tree_has_clamped_input_scales
from ..models.t5 import T5Config, init_t5_params
from ..utils.logging import logger
from ..utils.checkpoint import (
    is_prequantized_reference_file,
    load_ae_checkpoint,
    load_flux_checkpoint,
    load_prequantized,
    reference_prequant_has_input_scales,
)
from ..utils.config import ModelSpec, QuantizationDtype, into_device, into_dtype
from ..utils.safetensors_io import SafetensorsFile

FLOW_QUANT_KINDS = {
    QuantizationDtype.qfloat8.value: "fp8",
    QuantizationDtype.qint8.value: "int8",
    # reference gigaquant flow tier (config-dev-gigaquant.json: qint4 via quanto) →
    # packed int4 weights executed on the int8 MXU (ops/quant.py:quantize_linear_int4)
    QuantizationDtype.qint4.value: "int4",
}


@dataclasses.dataclass
class LoadedModels:
    """reference LoadedModels (util.py:298-308)."""

    flow: Dict[str, Any]
    flow_cfg: FluxStatic
    flow_prequantized: bool
    ae: Dict[str, Any]
    clip: TextEncoder
    t5: TextEncoder
    config: ModelSpec


def flow_quant_kind(config: ModelSpec) -> Optional[str]:
    tier = config.flow_quantization_dtype
    if tier is None:
        return None
    name = str(tier.value if hasattr(tier, "value") else tier)
    if name in ("bfloat16", "bf16", "float16", "fp16"):
        return None  # explicit full-precision tiers
    kind = FLOW_QUANT_KINDS.get(name)
    if kind is None:
        # silently skipping quantization would place a ~24GB bf16 flow on a 16GB
        # chip (OOM far from the misconfigured field) or benchmark full precision
        # while claiming a quantized tier
        raise ValueError(
            f"flow_quantization_dtype={name!r} is not a supported flow tier "
            f"(supported: {sorted(FLOW_QUANT_KINDS)}, or bf16/fp16 for none)"
        )
    return kind


def load_flow_model(config: ModelSpec, use_pallas: Optional[bool] = None):
    """→ (params, FluxStatic, prequantized: bool). Mirrors util.py:240-256 plus the
    quantize-on-load step (float8_quantize.py:395-496) as a tree partition."""
    cfg = FluxStatic.from_params(
        config.params,
        compute_dtype=config.flow_dtype,
        use_pallas=config.use_pallas if use_pallas is None else use_pallas,
    )
    kind = flow_quant_kind(config)

    def fast_accum(params, calibrated: bool):
        """qfloat8 tier + fp8_fast_accum → execute on the int8 MXU (the reference's
        use_fast_accum analog, see ops/quant.py:fp8_to_int8_compute). e4m3 storage is
        unchanged on disk; conversion happens here, once, at load. ``calibrated``
        pins the e5m2→int8 input-scale law conversion (the load path always knows —
        never rely on the ==1.0 heuristic, which misreads a tuned scale of exactly
        1.0 as uncalibrated)."""
        if kind == "fp8" and config.fp8_fast_accum:
            return tree_fp8_to_int8_compute(params, calibrated=calibrated)
        return params

    def clamped(params) -> bool:
        """Calibrated e5m2 scales at the 57344 clamp can't convert to the int8 law
        (amax unrecoverable — ops/quant.py fp8_to_int8_compute's clamp caveat);
        detect them and re-run calibration instead of shipping a 127-capped scale."""
        if not (kind == "fp8" and config.fp8_fast_accum):
            return False
        if tree_has_clamped_input_scales(params):
            logger.warning(
                "prequantized input scales sit at the e5m2 clamp (activation amax "
                "< 1 for some layer): re-running calibration under the int8 law"
            )
            return True
        return False

    if config.ckpt_path:
        f = SafetensorsFile(config.ckpt_path)
        if f.metadata.get("format") == "flux-fp8-api-tpu/prequant-v1":
            params = load_prequantized(f, cfg)
            has_scales = not clamped(params)
            return fast_accum(params, calibrated=has_scales), cfg, has_scales
        prequant_ref = is_prequantized_reference_file(f)
        params = load_flux_checkpoint(f, cfg)
        if prequant_ref:
            # reference-style prequantized: fp8 leaves already built by the loader.
            # Tuned input scales shipped → fully prequantized (skip calibration);
            # absent → the reference re-runs the amax trials
            # (float8_quantize.py:139-185), so report not-prequantized and let the
            # pipeline calibrate the fp8 leaves it got.
            has_scales = reference_prequant_has_input_scales(f)
            if has_scales:
                has_scales = not clamped(params)
            return fast_accum(params, calibrated=has_scales), cfg, has_scales
    else:
        params = init_flux_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16)
    if kind is not None:
        # Reached with float leaves: either prequantized_flow is false, or it was
        # claimed but the file matched neither prequant format. The reference's
        # F8Linear quantizes raw float weights on load either way
        # (float8_quantize.py:91-193 dual path) — silently keeping bf16 would put
        # a ~24GB flow on a 16GB chip, OOMing far from the misconfigured field.
        if config.prequantized_flow:
            logger.warning(
                "prequantized_flow=true but the checkpoint is a plain float file "
                "(neither prequant format matched): quantizing at load instead"
            )
        params = quantize_flux_tree(
            params,
            quantize_modulation=config.quantize_modulation,
            quantize_flow_embedder_layers=config.quantize_flow_embedder_layers,
            kind=kind,
        )
        params = fast_accum(params, calibrated=False)
    return params, cfg, False


def flux_from_pretrained(config_path: str, **overrides):
    """Standalone flow-model load from a config file, without building the pipeline —
    the reference's ``Flux.from_pretrained`` (flux_model.py:718-734: config →
    meta-device ctor → safetensors assign). Returns ``(params, FluxStatic,
    prequantized)``; ``overrides`` patch ModelSpec fields (e.g. ``ckpt_path=...``)
    the same way the pipeline classmethods do.
    """
    from .config import load_config_from_path

    config = load_config_from_path(config_path)
    if overrides:
        # re-validate rather than model_copy(update=...): the latter skips pydantic
        # validation, so a typo'd field name ("ckpt" for "ckpt_path") would silently
        # load random-init weights, and enum-typed values would stay raw strings
        unknown = set(overrides) - set(ModelSpec.model_fields)
        if unknown:
            raise ValueError(f"unknown ModelSpec override(s): {sorted(unknown)}")
        config = ModelSpec.model_validate({**config.model_dump(), **overrides})
    return load_flow_model(config)


def load_autoencoder(config: ModelSpec):
    dtype = into_dtype(config.ae_dtype)
    if config.ae_path:
        params = load_ae_checkpoint(config.ae_path, config.ae_params, dtype)
    else:
        params = init_autoencoder_params(jax.random.PRNGKey(1), config.ae_params, dtype)
    if config.ae_quantization_dtype is not None:
        # The reference routes this through recursive_swap_linears (util.py:288-291),
        # which finds no nn.Linear in the conv-only AE — a silent no-op for every
        # value. Here the flag does what its name promises: weight-only e4m3 on the
        # conv kernels. fp8 is the only implemented conv tier; other requested values
        # (e.g. the reference gigaquant config's qint4) map onto it with a warning
        # rather than crashing on reference config files.
        from ..models.autoencoder import quantize_ae_params

        tier = str(
            config.ae_quantization_dtype.value
            if hasattr(config.ae_quantization_dtype, "value")
            else config.ae_quantization_dtype
        )
        if tier != "qfloat8":
            logger.warning(
                f"ae_quantization_dtype={tier}: only qfloat8 is implemented for the "
                "conv AE; applying weight-only fp8 instead"
            )
        # config-compat deviation (PARITY.md): reference-shipped configs that set
        # this flag (gigaquant/offload tiers) silently no-op there, so the same
        # JSON produces slightly different pixels here — say so at load time
        logger.info(
            "quantizing AE conv kernels to weight-only fp8 (ae_quantization_dtype "
            f"= {tier}; NOTE: the reference silently ignores this flag, "
            "util.py:288-291 — pixels will differ slightly from it)"
        )
        params = quantize_ae_params(params)
    return params


def _looks_like_hub_id(path) -> bool:
    """True for HF-hub ids ("org/name") that don't exist on disk. The reference's
    shipped configs point text encoders at hub repos (config-dev.json:
    city96/t5-v1_1-xxl-encoder-bf16, openai/clip-vit-large-patch14); this image has
    no hub access, so those route to the warn-and-random-tower fallback instead of
    a FileNotFoundError deep inside from_pretrained."""
    import re
    from pathlib import Path

    p = str(path)
    return not Path(p).exists() and re.fullmatch(r"[\w.\-]+/[\w.\-]+", p) is not None


def load_text_encoders(config: ModelSpec):
    """→ (clip, t5) TextEncoders (reference util.py:259-275)."""
    dtype = config.text_enc_dtype
    device = into_device(config.text_enc_device)
    offload = config.offload_text_encoder
    if config.clip_path and not _looks_like_hub_id(config.clip_path):
        clip = TextEncoder.from_pretrained(
            "clip",
            config.clip_path,
            max_length=77,
            dtype=dtype,
            quantization_dtype=config.clip_quantization_dtype,
            tokenizer_path=config.clip_tokenizer_path,
            device=device,
            offload=offload,
        )
    else:
        if config.clip_path:
            logger.warning(
                f"clip_path={config.clip_path!r} is a hub id, not a local path "
                "(no hub access in this environment): using a RANDOM-weight toy "
                "CLIP — generated images will not follow prompts"
            )
        clip = _random_clip(config, device, offload)
    if config.text_enc_path and _looks_like_hub_id(config.text_enc_path):
        logger.warning(
            f"text_enc_path={config.text_enc_path!r} is a hub id, not a local path "
            "(no hub access in this environment): using a RANDOM-weight toy T5 — "
            "generated images will not follow prompts"
        )
        t5 = _random_t5(config, device, offload)
    elif config.text_enc_path:
        t5 = TextEncoder.from_pretrained(
            "t5",
            config.text_enc_path,
            max_length=config.text_enc_max_length,
            dtype=dtype,
            quantization_dtype=config.text_enc_quantization_dtype,
            tokenizer_path=config.t5_tokenizer_path,
            device=device,
            offload=offload,
            stream=config.stream_text_encoder,
        )
    else:
        t5 = _random_t5(config, device, offload)
    return clip, t5


def _toy_tokenizer(style: str):
    """Hub-free fallback tokenizer for random-init runs (tests/benches)."""
    from tokenizers import Tokenizer, models, pre_tokenizers
    from tokenizers.processors import TemplateProcessing
    from transformers import PreTrainedTokenizerFast

    vocab = {"<pad>": 0, "<bos>": 1, "<eos>": 2, "<unk>": 3}
    for i in range(4, 256):
        vocab[f"tok{i}"] = i
    for w in "a an the of on in photo image test beautiful cat dog house hill sun sky red blue".split():
        vocab.setdefault(w, len(vocab))
    tok = Tokenizer(models.WordLevel(vocab, unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    if style == "clip":
        tok.post_processor = TemplateProcessing(
            single="<bos> $A <eos>", special_tokens=[("<bos>", 1), ("<eos>", 2)]
        )
    else:
        tok.post_processor = TemplateProcessing(single="$A <eos>", special_tokens=[("<eos>", 2)])
    fast = PreTrainedTokenizerFast(
        tokenizer_object=tok,
        bos_token="<bos>" if style == "clip" else None,
        eos_token="<eos>",
        unk_token="<unk>",
        pad_token="<eos>" if style == "clip" else "<pad>",
    )
    fast.model_max_length = 77
    return fast


def _random_clip(config: ModelSpec, device, offload):
    cfg = CLIPConfig(
        vocab_size=512,
        hidden_size=config.params.vec_in_dim,
        intermediate_size=4 * config.params.vec_in_dim,
        num_layers=2,
        num_heads=8,
        eos_token_id=2,
    )
    params = apply_quantization(
        "clip", init_clip_params(jax.random.PRNGKey(2), cfg, jnp.bfloat16), config.clip_quantization_dtype
    )
    return TextEncoder("clip", params, cfg, _toy_tokenizer("clip"), max_length=77,
                       dtype=into_dtype(config.text_enc_dtype), device=device, offload=offload)


def _random_t5(config: ModelSpec, device, offload):
    cfg = T5Config(
        vocab_size=512,
        d_model=config.params.context_in_dim,
        d_ff=2 * config.params.context_in_dim,
        num_layers=2,
        num_heads=8,
        d_kv=config.params.context_in_dim // 8,
    )
    params = apply_quantization(
        "t5", init_t5_params(jax.random.PRNGKey(3), cfg, jnp.bfloat16), config.text_enc_quantization_dtype
    )
    return TextEncoder("t5", params, cfg, _toy_tokenizer("t5"), max_length=config.text_enc_max_length,
                       dtype=into_dtype(config.text_enc_dtype), device=device, offload=offload,
                       stream=config.stream_text_encoder)


def load_models_from_config(config: ModelSpec) -> LoadedModels:
    """reference util.py:325-333."""
    clip, t5 = load_text_encoders(config)
    flow, flow_cfg, prequant = load_flow_model(config)
    # with a real checkpoint the loader's detection is authoritative (a reference
    # prequantized file missing input_scale must NOT skip calibration even when the
    # config claims prequantized_flow); without one, honor the config flag.
    return LoadedModels(
        flow=flow,
        flow_cfg=flow_cfg,
        flow_prequantized=prequant if config.ckpt_path else config.prequantized_flow,
        ae=load_autoencoder(config),
        clip=clip,
        t5=t5,
        config=config,
    )
