"""CLIP text encoder (CLIPTextModel, ViT-L/14 text tower), TPU-native.

The reference wraps HF's torch ``CLIPTextModel`` behind ``HFEmbedder``
(modules/conditioner.py:38-94, output_key="pooler_output") — FLUX only consumes the
pooled vector (flux_emphasis.py:416-418). Faithful HF semantics:

- learned absolute position embeddings (77 positions);
- causal attention mask;
- quick_gelu activation (``x * sigmoid(1.702 x)``);
- LayerNorm eps 1e-5 with affine params, fp32 internally;
- pooler_output = final_layer_norm(hidden)[batch, position of eos token] — we locate
  the *first* eos per row, matching HF's eos-position pooling for this tokenizer.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.quant import Linear, quantize_stacked_weight_only, linear_apply


@dataclasses.dataclass(frozen=True)
class CLIPConfig:
    vocab_size: int = 49408
    hidden_size: int = 768
    intermediate_size: int = 3072
    num_layers: int = 12
    num_heads: int = 12
    max_position_embeddings: int = 77
    layer_norm_eps: float = 1e-5
    eos_token_id: int = 49407

    @classmethod
    def from_hf_config(cls, cfg: Dict[str, Any]) -> "CLIPConfig":
        return cls(
            vocab_size=cfg["vocab_size"],
            hidden_size=cfg["hidden_size"],
            intermediate_size=cfg["intermediate_size"],
            num_layers=cfg["num_hidden_layers"],
            num_heads=cfg["num_attention_heads"],
            max_position_embeddings=cfg["max_position_embeddings"],
            layer_norm_eps=cfg.get("layer_norm_eps", 1e-5),
            eos_token_id=cfg.get("eos_token_id", 49407),
        )


def _ln(x: jnp.ndarray, p: Dict[str, jnp.ndarray], eps: float) -> jnp.ndarray:
    orig = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    x32 = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return (x32 * p["weight"].astype(jnp.float32) + p["bias"].astype(jnp.float32)).astype(orig)


def _quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    return x * jax.nn.sigmoid(1.702 * x)


def _clip_attention(blk, x, cfg: CLIPConfig, dtype):
    b, l, d = x.shape
    h = cfg.num_heads
    hd = d // h

    def heads(t):
        return t.reshape(b, l, h, hd)

    q = heads(linear_apply(blk["q_proj"], x, dtype)[0]) * (hd**-0.5)
    k = heads(linear_apply(blk["k_proj"], x, dtype)[0])
    v = heads(linear_apply(blk["v_proj"], x, dtype)[0])
    scores = jnp.einsum("blhd,bmhd->bhlm", q.astype(jnp.float32), k.astype(jnp.float32))
    causal = jnp.triu(jnp.full((l, l), -jnp.inf, jnp.float32), k=1)
    probs = jax.nn.softmax(scores + causal, axis=-1).astype(dtype)
    out = jnp.einsum("bhlm,bmhd->blhd", probs, v).reshape(b, l, d)
    return linear_apply(blk["out_proj"], out, dtype)[0]


def _clip_block(blk, x, cfg: CLIPConfig, dtype):
    x = x + _clip_attention(blk, _ln(x, blk["layer_norm1"], cfg.layer_norm_eps), cfg, dtype)
    h = _ln(x, blk["layer_norm2"], cfg.layer_norm_eps)
    h = linear_apply(blk["fc2"], _quick_gelu(linear_apply(blk["fc1"], h, dtype)[0]), dtype)[0]
    return x + h


def clip_encode(
    params: Dict[str, Any],
    cfg: CLIPConfig,
    input_ids: jnp.ndarray,
    dtype=jnp.bfloat16,
):
    """(B, L) ids → (last_hidden_state (B, L, D), pooler_output (B, D))."""
    b, l = input_ids.shape
    x = params["token_embedding"].astype(dtype)[input_ids]
    x = x + params["position_embedding"].astype(dtype)[None, :l]

    def body(x, blk):
        return _clip_block(blk, x, cfg, dtype), None

    x, _ = jax.lax.scan(body, x, params["blocks"])
    x = _ln(x, params["final_layer_norm"], cfg.layer_norm_eps)

    # pooled = hidden at the first eos position per row (HF CLIPTextModel pooling).
    # LEGACY QUIRK (HF modeling_clip.py): openai-era configs — including the
    # canonical FLUX.1 text_encoder's config.json — ship "eos_token_id": 2 while the
    # tokenizer's real EOS id is 49407. HF keeps a workaround: when config eos is 2,
    # pool at argmax(input_ids) instead (EOS is the LARGEST id in the CLIP vocab, so
    # the plain argmax finds its first occurrence). Without this, `ids == 2` never
    # matches, argmax over all-False returns 0, and pooling silently returns the BOS
    # embedding for every prompt. Gated on the openai vocab size so tiny test
    # vocabs whose REAL eos id is 2 keep exact-match pooling.
    if cfg.eos_token_id == 2 and cfg.vocab_size >= 49408:
        eos_pos = jnp.argmax(input_ids, axis=-1)
    else:
        eos_pos = jnp.argmax((input_ids == cfg.eos_token_id).astype(jnp.int32), axis=-1)
    pooled = x[jnp.arange(b), eos_pos]
    return x, pooled


# --------------------------------------------------------------------- init / loading


def init_clip_params(key, cfg: CLIPConfig, dtype=jnp.float32) -> Dict[str, Any]:
    ks = jax.random.split(key, cfg.num_layers + 3)

    def lin(key, i, o):
        k1, k2 = jax.random.split(key)
        return Linear(
            kernel=jax.random.normal(k1, (i, o), jnp.float32).astype(dtype) * 0.02,
            bias=jnp.zeros((o,), dtype),
            kind="float",
        )

    def lnp():
        return {"weight": jnp.ones((cfg.hidden_size,), dtype), "bias": jnp.zeros((cfg.hidden_size,), dtype)}

    def block(key):
        kk = jax.random.split(key, 6)
        d, m = cfg.hidden_size, cfg.intermediate_size
        return {
            "q_proj": lin(kk[0], d, d),
            "k_proj": lin(kk[1], d, d),
            "v_proj": lin(kk[2], d, d),
            "out_proj": lin(kk[3], d, d),
            "layer_norm1": lnp(),
            "fc1": lin(kk[4], d, m),
            "fc2": lin(kk[5], m, d),
            "layer_norm2": lnp(),
        }

    blocks = [block(ks[i]) for i in range(cfg.num_layers)]
    return {
        "token_embedding": jax.random.normal(ks[-1], (cfg.vocab_size, cfg.hidden_size), jnp.float32).astype(dtype) * 0.02,
        "position_embedding": jax.random.normal(ks[-2], (cfg.max_position_embeddings, cfg.hidden_size), jnp.float32).astype(dtype) * 0.02,
        "blocks": jax.tree.map(lambda *xs: jnp.stack(xs), *blocks),
        "final_layer_norm": lnp(),
    }


def quantize_clip_params(params: Dict[str, Any], tier: str) -> Dict[str, Any]:
    """Weight-only tier over block linears (reference clip_quantization_dtype,
    util.py:65 + conditioner.py:56-70)."""
    out = dict(params)
    out["blocks"] = quantize_stacked_weight_only(params["blocks"], tier)
    return out


def load_clip_checkpoint(sd_get, cfg: CLIPConfig, dtype=jnp.bfloat16, report=None) -> Dict[str, Any]:
    """HF CLIPTextModel state dict → pytree. ``sd_get(name) -> np.ndarray``.

    With a ``report`` (utils.checkpoint.LoadReport) missing tensors zero-fill
    (norm weights → ones) with the key recorded — shapes all derive from ``cfg``
    (reference strict=False analog, util.py:225-237)."""

    from ..utils.checkpoint import LoadReport

    def fetch(name, shape, fill=0.0):
        return LoadReport.fetch(sd_get, name, shape, fill, report)

    def lin(name, out_f, in_f):
        w = fetch(f"{name}.weight", (out_f, in_f))
        b = fetch(f"{name}.bias", (out_f,))
        return Linear(kernel=jnp.asarray(w.transpose(1, 0), dtype), bias=jnp.asarray(b, dtype), kind="float")

    def lnp(name):
        return {
            "weight": jnp.asarray(fetch(f"{name}.weight", (cfg.hidden_size,), fill=1.0), dtype),
            "bias": jnp.asarray(fetch(f"{name}.bias", (cfg.hidden_size,)), dtype),
        }

    h, inter = cfg.hidden_size, cfg.intermediate_size
    blocks = []
    for i in range(cfg.num_layers):
        p = f"text_model.encoder.layers.{i}."
        blocks.append(
            {
                "q_proj": lin(p + "self_attn.q_proj", h, h),
                "k_proj": lin(p + "self_attn.k_proj", h, h),
                "v_proj": lin(p + "self_attn.v_proj", h, h),
                "out_proj": lin(p + "self_attn.out_proj", h, h),
                "layer_norm1": lnp(p + "layer_norm1"),
                "fc1": lin(p + "mlp.fc1", inter, h),
                "fc2": lin(p + "mlp.fc2", h, inter),
                "layer_norm2": lnp(p + "layer_norm2"),
            }
        )
    return {
        "token_embedding": jnp.asarray(
            fetch("text_model.embeddings.token_embedding.weight", (cfg.vocab_size, h)),
            dtype,
        ),
        "position_embedding": jnp.asarray(
            fetch(
                "text_model.embeddings.position_embedding.weight",
                (cfg.max_position_embeddings, h),
            ),
            dtype,
        ),
        "blocks": jax.tree.map(lambda *xs: jnp.stack(xs), *blocks),
        "final_layer_norm": lnp("text_model.final_layer_norm"),
    }
