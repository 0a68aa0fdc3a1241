"""Configuration schema for the TPU-native FLUX fp8 stack.

Mirrors the public config surface of the reference (``util.py:24-79`` — ``ModelVersion``,
``QuantizationDtype``, ``ModelSpec``; ``util.py:122-222`` — ``load_config`` /
``load_config_from_path``), re-targeted at JAX/TPU:

- device strings accept ``tpu``/``tpu:N``/``cpu`` (and map legacy ``cuda:N`` from
  reference JSON configs onto TPU devices so the reference's config files load as-is);
- dtype strings resolve to jnp dtypes, with an explicit "clamp" policy bit replacing the
  reference's implicit ``dtype == float16 ⇒ clamp ±32000`` rule
  (``modules/flux_model.py:349,397-399``).
"""

from __future__ import annotations

import json
from enum import Enum
from pathlib import Path
from typing import Any, List, Optional

import jax
import jax.numpy as jnp
from pydantic import BaseModel, ConfigDict


class StrEnum(str, Enum):
    def __str__(self) -> str:  # pragma: no cover
        return str(self.value)


class ModelVersion(StrEnum):
    flux_dev = "flux-dev"
    flux_schnell = "flux-schnell"


class QuantizationDtype(StrEnum):
    """Quantization tiers (reference ``util.py:29-35``).

    ``qfloat8`` is the flagship tier: e4m3 weights × e5m2 activations with per-tensor
    scales. ``qint8`` on TPU is a *compute* tier (int8 MXU matmul at ~1.6× bf16
    throughput), not just weight-only like the reference's bitsandbytes int8.
    """

    qfloat8 = "qfloat8"
    qint2 = "qint2"
    qint4 = "qint4"
    qint8 = "qint8"
    bfloat16 = "bfloat16"
    float16 = "float16"


class FluxParams(BaseModel):
    """Flow-transformer hyperparameters (reference ``modules/flux_model.py:24-36``)."""

    in_channels: int
    vec_in_dim: int
    context_in_dim: int
    hidden_size: int
    mlp_ratio: float
    num_heads: int
    depth: int
    depth_single_blocks: int
    axes_dim: List[int]
    theta: int
    qkv_bias: bool
    guidance_embed: bool


class AutoEncoderParams(BaseModel):
    """VAE hyperparameters (reference ``modules/autoencoder.py:7-16``)."""

    resolution: int
    in_channels: int
    ch: int
    out_ch: int
    ch_mult: List[int]
    num_res_blocks: int
    z_channels: int
    scale_factor: float
    shift_factor: float


class ModelSpec(BaseModel):
    """Full pipeline configuration — JSON-compatible with the reference's configs.

    Field-for-field parity with reference ``util.py:38-79`` (including its deprecated
    fields, kept so reference JSON files parse), plus TPU-specific extensions at the
    bottom.
    """

    version: ModelVersion
    params: FluxParams
    ae_params: AutoEncoderParams
    ckpt_path: Optional[str] = None
    clip_path: Optional[str] = "openai/clip-vit-large-patch14"
    ae_path: Optional[str] = None
    repo_id: Optional[str] = None
    repo_flow: Optional[str] = None
    repo_ae: Optional[str] = None
    text_enc_max_length: int = 512
    text_enc_path: Optional[str] = None
    text_enc_device: Optional[str] = "tpu:0"
    ae_device: Optional[str] = "tpu:0"
    flux_device: Optional[str] = "tpu:0"
    flow_dtype: str = "bfloat16"
    ae_dtype: str = "bfloat16"
    text_enc_dtype: str = "bfloat16"
    # unused / deprecated fields kept for reference-JSON compatibility (util.py:57-62)
    num_to_quant: Optional[int] = 20
    quantize_extras: bool = False
    compile_extras: bool = False
    compile_blocks: bool = False
    flow_quantization_dtype: Optional[QuantizationDtype] = QuantizationDtype.qfloat8
    text_enc_quantization_dtype: Optional[QuantizationDtype] = QuantizationDtype.qfloat8
    ae_quantization_dtype: Optional[QuantizationDtype] = None
    clip_quantization_dtype: Optional[QuantizationDtype] = None
    offload_text_encoder: bool = False
    offload_vae: bool = False
    offload_flow: bool = False
    # TPU extra: when offload_flow is set, stream the flow weights per-block with
    # double-buffered host→HBM copies under the denoise loop (offload.py — the
    # analog of the reference's incremental per-block moves,
    # float8_quantize.py:427-446) instead of round-tripping the whole 12GB tree.
    # False restores the whole-tree round trip (calibration and mesh serving
    # always use it).
    stream_flow_offload: bool = True
    # HBM budget (GiB) for blocks RETAINED on device between denoise steps when
    # streaming. None retains everything (right whenever the quantized tree fits a
    # 16GB chip). A finite budget keeps the leading blocks resident up to the cap
    # and re-streams the rest every step — how a flow LARGER than HBM (e.g. 24GB
    # bf16 flux-dev) runs on one chip at all: transfer-bound but correct.
    offload_retain_gb: Optional[float] = None
    # Same idea for the offloaded T5-XXL: stream its 24 stacked blocks host→HBM one
    # layer ahead of compute (models/t5.py t5_encode_streamed) instead of moving the
    # whole 4.7B tree before each encode and back after. No-op unless
    # offload_text_encoder is set; CLIP (123M) always moves whole-tree.
    stream_text_encoder: bool = True
    prequantized_flow: bool = False
    # Improved precision via not quantizing the modulation linear layers
    quantize_modulation: bool = True
    # Improved precision via not quantizing the flow embedder layers
    quantize_flow_embedder_layers: bool = False

    # ------------------------------------------------------------------ TPU extensions
    # Tokenizer paths must be local (the TPU image has no network egress). When None we
    # fall back to `clip_path` / `text_enc_path` which may be HF-style directories.
    clip_tokenizer_path: Optional[str] = None
    t5_tokenizer_path: Optional[str] = None
    # Number of calibration forward passes used to tune fp8 input scales. Mirrors the
    # reference's `num_scale_trials=12` running-max amax protocol
    # (float8_quantize.py:42,220-246).
    num_scale_trials: int = 12
    # Mesh shape for multi-chip sharding, e.g. {"dp": 1, "tp": 4}. None = single chip.
    # Supported serving axes: dp (batch), tp (Megatron within-block), sp (sequence) —
    # freely composable — or pp (GPipe over the depth-stacked block axis, parallel/pp.py)
    # which composes only with dp (FluxPipeline validates and raises otherwise).
    mesh: Optional[dict] = None
    # Microbatch count M for pp serving (bubble fraction (S-1)/(M+S-1)); the per-dp
    # batch must divide into M. Serving batches are usually 1 → default M=1 (pp then
    # buys memory scaling — 1/S of the block weights per chip — not throughput).
    pp_microbatches: int = 1
    # Serving buckets precompiled by compile(): list of [width, height] pairs (the AOT
    # analog of the reference's torch.compile warmup, flux_pipeline.py:179-231) and the
    # step count they compile for (jit caches key on (resolution, steps)). None →
    # the API defaults: 720×1024 at 24 steps (4 for schnell).
    warmup_resolutions: Optional[List[List[int]]] = None
    warmup_steps: Optional[int] = None
    # Also precompile the interactive (tqdm per-step) denoise path per bucket, so the
    # first non-silent generate after compile() doesn't pause. Servers only ever call
    # generate(silent=True), so main.py/main_gr.py turn this off — each interactive
    # precompile is a second whole-model compile per bucket.
    precompile_interactive: bool = True
    # Use Pallas kernels for the hot ops where available (falls back to XLA on CPU).
    use_pallas: bool = True
    # Execute the qfloat8 flow tier on the int8 MXU (the TPU analog of the reference's
    # `use_fast_accum=True`, float8_quantize.py:284-292): e4m3 weights are re-gridded
    # per-out-channel to int8 at load, activations quantize to int8 instead of e5m2.
    # v5e has no fp8 MXU, so the exact path runs at bf16 speed plus cast overhead
    # (~29% slower than this for no accuracy gain). False = bit-faithful fp8 semantics.
    fp8_fast_accum: bool = True
    # LRU size of the prompt→(CLIP vec, T5 txt) conditioning cache: repeated prompts
    # skip both text encoders entirely (and, under offload_text_encoder, skip the
    # host→device round trip — the dominant per-request cost of the offload plans).
    # Entries are device-resident post-cast (~4MB each at 512 T5 tokens). 0 disables.
    # The reference re-encodes every request (flux_pipeline.py:525-560).
    cond_cache_size: int = 8
    # Persistent XLA compilation cache directory. A flux-dev serving bucket takes
    # 20-60s to compile on one v5e; with this set, restarts reload the compiled
    # executable from disk instead (the torch.compile / inductor cache analog,
    # reference flux_pipeline.py:24-28 dynamo cache knobs).
    compilation_cache_dir: Optional[str] = None

    model_config: ConfigDict = {
        "arbitrary_types_allowed": True,
        "use_enum_values": True,
        # Reference configs carry stray keys (e.g. `offload_ae` in config-dev.json that
        # pydantic silently drops); stay permissive so those files load unchanged.
        "extra": "ignore",
    }


# --------------------------------------------------------------------------- resolution


def into_dtype(dtype: Any) -> jnp.dtype:
    """Resolve a config dtype string to a jnp dtype (reference ``util.py:98-108``).

    ``float16`` is honored (with the reference's ±32000 clamp policy applied by the
    model); TPU-native configs should prefer ``bfloat16``.
    """
    if isinstance(dtype, jnp.dtype):
        return dtype
    if hasattr(dtype, "dtype"):
        return jnp.dtype(dtype.dtype)
    mapping = {
        "float16": jnp.float16,
        "bfloat16": jnp.bfloat16,
        "float32": jnp.float32,
    }
    if str(dtype) in mapping:
        return jnp.dtype(mapping[str(dtype)])
    raise ValueError(f"Invalid dtype: {dtype}")


def into_device(device: Any) -> jax.Device:
    """Resolve a config device string to a jax.Device (reference ``util.py:111-119``).

    ``cuda:N`` strings from reference JSON files map to ``tpu:N`` (clamped to the number
    of chips actually present, so the reference's 2-GPU configs run on one chip).
    ``cpu`` selects the host platform — used by the offload tiers.
    """
    if isinstance(device, jax.Device):
        return device
    name = str(device or "tpu:0").lower()
    if name.startswith("cuda"):
        name = name.replace("cuda", "tpu")
    platform, _, index = name.partition(":")
    idx = int(index) if index else 0
    if platform in ("tpu", "gpu"):
        accel = [d for d in jax.devices() if d.platform != "cpu"]
        if accel:
            return accel[min(idx, len(accel) - 1)]
        platform = "cpu"  # CPU-only environment (tests): everything maps to host
    cpus = jax.devices("cpu")
    return cpus[min(idx, len(cpus) - 1)]


# ----------------------------------------------------------------------------- loaders


def load_config_from_path(path: str) -> ModelSpec:
    """JSON file → ModelSpec (reference ``util.py:216-222``)."""
    p = Path(path)
    if not p.exists():
        raise ValueError(f"Path {path} does not exist")
    if not p.is_file():
        raise ValueError(f"Path {path} is not a file")
    return ModelSpec(**json.loads(p.read_text()))


def _default_flux_params(version: ModelVersion) -> FluxParams:
    return FluxParams(
        in_channels=64,
        vec_in_dim=768,
        context_in_dim=4096,
        hidden_size=3072,
        mlp_ratio=4.0,
        num_heads=24,
        depth=19,
        depth_single_blocks=38,
        axes_dim=[16, 56, 56],
        theta=10_000,
        qkv_bias=True,
        guidance_embed=version == ModelVersion.flux_dev,
    )


def _default_ae_params() -> AutoEncoderParams:
    return AutoEncoderParams(
        resolution=256,
        in_channels=3,
        ch=128,
        out_ch=3,
        ch_mult=[1, 2, 4, 4],
        num_res_blocks=2,
        z_channels=16,
        scale_factor=0.3611,
        shift_factor=0.1159,
    )


def load_config(
    name: ModelVersion = ModelVersion.flux_dev,
    flux_path: Optional[str] = None,
    ae_path: Optional[str] = None,
    text_enc_path: Optional[str] = None,
    text_enc_device: Optional[str] = None,
    ae_device: Optional[str] = None,
    flux_device: Optional[str] = None,
    flow_dtype: str = "bfloat16",
    ae_dtype: str = "bfloat16",
    text_enc_dtype: str = "bfloat16",
    num_to_quant: Optional[int] = 20,
    compile_extras: bool = False,
    compile_blocks: bool = False,
    offload_text_enc: bool = False,
    offload_ae: bool = False,
    offload_flow: bool = False,
    quant_text_enc: Optional[str] = None,
    quant_ae: bool = False,
    prequantized_flow: bool = False,
    quantize_modulation: bool = True,
    quantize_flow_embedder_layers: bool = False,
    **extra,
) -> ModelSpec:
    """Build a ModelSpec from CLI-style arguments (reference ``util.py:122-213``)."""
    name = ModelVersion(name)
    return ModelSpec(
        version=name,
        repo_id=(
            "black-forest-labs/FLUX.1-dev"
            if name == ModelVersion.flux_dev
            else "black-forest-labs/FLUX.1-schnell"
        ),
        repo_flow=(
            "flux1-dev.sft" if name == ModelVersion.flux_dev else "flux1-schnell.sft"
        ),
        repo_ae="ae.sft",
        ckpt_path=flux_path,
        params=_default_flux_params(name),
        ae_path=ae_path,
        ae_params=_default_ae_params(),
        text_enc_path=text_enc_path,
        text_enc_device=text_enc_device or "tpu:0",
        ae_device=ae_device or "tpu:0",
        flux_device=flux_device or "tpu:0",
        flow_dtype=flow_dtype,
        ae_dtype=ae_dtype,
        text_enc_dtype=text_enc_dtype,
        text_enc_max_length=512 if name == ModelVersion.flux_dev else 256,
        num_to_quant=num_to_quant,
        compile_extras=compile_extras,
        compile_blocks=compile_blocks,
        offload_flow=offload_flow,
        offload_text_encoder=offload_text_enc,
        offload_vae=offload_ae,
        text_enc_quantization_dtype={
            "float8": QuantizationDtype.qfloat8,
            "qfloat8": QuantizationDtype.qfloat8,
            "qint2": QuantizationDtype.qint2,
            "qint4": QuantizationDtype.qint4,
            "qint8": QuantizationDtype.qint8,
        }.get(quant_text_enc, None),
        ae_quantization_dtype=QuantizationDtype.qfloat8 if quant_ae else None,
        prequantized_flow=prequantized_flow,
        quantize_modulation=quantize_modulation,
        quantize_flow_embedder_layers=quantize_flow_embedder_layers,
        **extra,
    )
