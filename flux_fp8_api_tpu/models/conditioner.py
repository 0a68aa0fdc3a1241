"""Text-encoder wrapper: tokenizer + JAX encoder + weight-only quant tier + offload.

The TPU analog of the reference's ``HFEmbedder`` (modules/conditioner.py:38-117): wraps
either the CLIP or T5 encoder with its tokenizer, resolves the quantization tier
(conditioner.py:17-35's quanto/bnb table → our wo_* kinds), and implements the
offload dance as explicit host↔device ``jax.device_put`` (reference ``offload()/cuda()``
at conditioner.py:95-100).

Checkpoints load from local HF-style directories (config.json + model.safetensors,
optionally sharded via model.safetensors.index.json) — the image has no network egress,
so `from_pretrained` takes paths, never hub ids.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.config import QuantizationDtype, into_dtype
from ..utils.safetensors_io import SafetensorsFile
from .clip import CLIPConfig, clip_encode, load_clip_checkpoint, quantize_clip_params
from .t5 import T5Config, load_t5_checkpoint, quantize_t5_params, t5_encode


def _hf_state_dict_getter(model_dir: Path) -> Callable[[str], np.ndarray]:
    """Return sd_get(name) over a (possibly sharded) HF safetensors directory.

    The getter exposes ``sd_get.all_keys`` (every tensor name available) so
    loaders can report unexpected keys for the tolerant-load surface."""
    index = model_dir / "model.safetensors.index.json"
    if index.exists():
        weight_map: Dict[str, str] = json.loads(index.read_text())["weight_map"]
        files: Dict[str, SafetensorsFile] = {}

        def get(name: str) -> np.ndarray:
            fname = weight_map.get(name)
            if fname is None:
                raise KeyError(name)
            if fname not in files:
                files[fname] = SafetensorsFile(str(model_dir / fname))
            return files[fname].get(name)

        get.all_keys = set(weight_map)
        return get
    candidates = sorted(model_dir.glob("*.safetensors"))
    if not candidates:
        raise FileNotFoundError(f"no safetensors files in {model_dir}")
    shards = [SafetensorsFile(str(c)) for c in candidates]

    def get(name: str) -> np.ndarray:
        for s in shards:
            if name in s:
                return s.get(name)
        raise KeyError(name)

    get.all_keys = set().union(*(set(s.keys()) for s in shards))
    return get


class TextEncoder:
    """One text encoder (CLIP or T5) with its tokenizer.

    kind="clip" → __call__ returns the pooled vector (reference output_key
    "pooler_output", conditioner.py:87); kind="t5" → last_hidden_state.
    """

    def __init__(
        self,
        kind: str,
        params: Dict[str, Any],
        config,
        tokenizer,
        max_length: int,
        dtype=jnp.bfloat16,
        device: Optional[jax.Device] = None,
        offload: bool = False,
        stream: bool = False,
    ):
        assert kind in ("clip", "t5")
        self.kind = kind
        self.config = config
        self.tokenizer = tokenizer
        self.max_length = max_length
        self.dtype = jnp.dtype(dtype)
        self.device = device
        self.offload = offload
        # streamed offload (T5 only — CLIP is 123M, a whole-tree move is already
        # cheap): params stay host-resident and the block stack streams per layer
        # at encode time (models/t5.py t5_encode_streamed), double-buffered like
        # the flow's offload.py. to_device()/to_host() become no-ops.
        self.stream = bool(stream and offload and kind == "t5")
        host = jax.devices("cpu")[0]
        if offload:
            self.params = jax.device_put(params, host)
        elif device is not None:
            self.params = jax.device_put(params, device)
        else:
            self.params = params
        self._jit_encode = jax.jit(self._encode_ids_impl)
        self._mesh_shardings = None  # set by shard(); reused across offload cycles
        self._stream_fns = None  # built lazily on the first streamed encode

    # ---------------------------------------------------------------- device moves
    def shard(self, mesh, tp_axis: str = "tp"):
        """Shard the encoder Megatron-style over a tp mesh (parallel/mesh.py
        encoder_param_shardings) — T5-XXL's 4.7B params split across chips instead
        of replicating, with GSPMD inserting the two per-block all-reduces. An
        offloaded encoder records the shardings and applies them at each
        :meth:`to_device`; the host copy stays un-sharded."""
        from ..parallel.mesh import encoder_param_shardings

        self._mesh_shardings = encoder_param_shardings(self.params, mesh, tp_axis)
        if not self.offload:
            self.params = jax.tree.map(
                lambda x, s: x if s is None else jax.device_put(x, s),
                self.params,
                self._mesh_shardings,
                is_leaf=lambda x: x is None,
            )

    def to_device(self):
        """Host → accelerator (reference HFEmbedder.cuda(), conditioner.py:98-100);
        onto the mesh instead when :meth:`shard` was called. A streaming encoder
        no-ops — its weights flow per block inside :meth:`encode_ids`."""
        if self.stream and self._mesh_shardings is None:
            return
        if self._mesh_shardings is not None:
            self.params = jax.tree.map(
                lambda x, s: x if s is None else jax.device_put(x, s),
                self.params,
                self._mesh_shardings,
                is_leaf=lambda x: x is None,
            )
        elif self.device is not None:
            self.params = jax.device_put(self.params, self.device)

    def to_host(self):
        """Accelerator → host (reference HFEmbedder.offload(), conditioner.py:95-97).
        A streaming encoder no-ops: its host tree never moved, and the per-block
        device slices already died inside the encode."""
        if self.stream and self._mesh_shardings is None:
            return
        self.params = jax.device_put(self.params, jax.devices("cpu")[0])

    # --------------------------------------------------------------------- encoding
    def _encode_ids_impl(self, params, input_ids):
        if self.kind == "clip":
            _, pooled = clip_encode(params, self.config, input_ids, self.dtype)
            return pooled
        return t5_encode(params, self.config, input_ids, self.dtype)

    def encode_ids(self, input_ids: jnp.ndarray) -> jnp.ndarray:
        """(B, L) ids → pooled (clip) or last_hidden_state (t5)."""
        if self.stream and self._mesh_shardings is None:
            from .t5 import make_t5_stream_fns, t5_encode_streamed

            if self._stream_fns is None:
                self._stream_fns = make_t5_stream_fns(self.config, self.dtype)
            device = self.device if self.device is not None else jax.devices()[0]
            return t5_encode_streamed(
                self.params, self.config, jnp.asarray(input_ids), device,
                self.dtype, fns=self._stream_fns,
            )
        if self._mesh_shardings is not None:
            # ids replicate onto the mesh — jit rejects mixed mesh/single-device args
            from jax.sharding import NamedSharding, PartitionSpec

            some = next(
                s for s in jax.tree.leaves(self._mesh_shardings) if s is not None
            )
            input_ids = jax.device_put(
                input_ids, NamedSharding(some.mesh, PartitionSpec())
            )
        return self._jit_encode(self.params, input_ids)

    def __call__(self, texts: List[str]) -> jnp.ndarray:
        """Tokenize (pad to max_length, no attention mask — reference
        conditioner.py:102-117) and encode."""
        batch = self.tokenizer(
            texts,
            truncation=True,
            max_length=self.max_length,
            padding="max_length",
            return_tensors="np",
        )
        return self.encode_ids(jnp.asarray(batch.input_ids))

    # ---------------------------------------------------------------------- loading
    @classmethod
    def from_pretrained(
        cls,
        kind: str,
        model_path: str,
        max_length: int,
        dtype="bfloat16",
        quantization_dtype: Optional[str] = None,
        tokenizer_path: Optional[str] = None,
        device: Optional[jax.Device] = None,
        offload: bool = False,
        stream: bool = False,
    ) -> "TextEncoder":
        from transformers import AutoTokenizer

        model_dir = Path(model_path)
        hf_cfg = json.loads((model_dir / "config.json").read_text())
        # T5 encoder repos sometimes nest the text config; CLIP ships CLIPTextConfig
        # either top-level or under "text_config".
        if "text_config" in hf_cfg:
            hf_cfg = {**hf_cfg, **hf_cfg["text_config"]}
        sd_get = _hf_state_dict_getter(model_dir)
        jdtype = into_dtype(dtype)
        # tolerant (strict=False) load: missing tensors zero/identity-fill and
        # extra keys are ignored, each with a warning naming the keys — the
        # reference's print_load_warning surface (util.py:225-237)
        from ..utils.checkpoint import LoadReport

        report = LoadReport(f"{kind} checkpoint {model_path}")
        if kind == "clip":
            config = CLIPConfig.from_hf_config(hf_cfg)
            params = load_clip_checkpoint(sd_get, config, jdtype, report=report)
        else:
            config = T5Config.from_hf_config(hf_cfg)
            params = load_t5_checkpoint(sd_get, config, jdtype, report=report)
        report.finish(sd_get.all_keys)
        params = apply_quantization(kind, params, quantization_dtype)
        tokenizer = AutoTokenizer.from_pretrained(tokenizer_path or model_path)
        return cls(
            kind,
            params,
            config,
            tokenizer,
            max_length=max_length,
            dtype=jdtype,
            device=device,
            offload=offload,
            stream=stream,
        )


def apply_quantization(kind: str, params: Dict[str, Any], quantization_dtype) -> Dict[str, Any]:
    """Map the reference's tier names onto the weight-only quantizers
    (conditioner.py:17-35: qfloat8→quanto fp8, qint8→bnb int8, qint4→bnb nf4,
    qint2→quanto int2)."""
    if quantization_dtype is None:
        return params
    tier = str(
        quantization_dtype.value
        if isinstance(quantization_dtype, QuantizationDtype)
        else quantization_dtype
    )
    if tier in ("bfloat16", "float16"):
        return params
    if kind == "clip":
        return quantize_clip_params(params, tier)
    return quantize_t5_params(params, tier)
