"""T5 v1.1 encoder (T5EncoderModel), TPU-native.

The reference wraps HF's torch ``T5EncoderModel`` behind ``HFEmbedder``
(modules/conditioner.py:38-117) with quanto/bnb weight-only quantization. Here the
encoder is implemented directly in JAX — a param pytree with the 24 blocks stacked for
``lax.scan`` and :class:`~..ops.quant.Linear` leaves so the weight-only tiers
(wo_fp8/int8/int4/int2) drop in per-leaf.

Faithful to HF T5 v1.1 semantics (verified against transformers' modeling_t5):
- T5LayerNorm = RMS (no mean subtraction, no bias), fp32 internally;
- no embedding scaling and no 1/sqrt(d) attention scaling (folded into init);
- gated-gelu FF: ``wo(gelu_new(wi_0(x)) * wi_1(x))``;
- bidirectional relative position bias (32 buckets, max distance 128), computed once in
  block 0 and shared by all blocks;
- the reference passes no attention mask (conditioner.py:102-117 pads to max_length and
  attends over padding) — we reproduce exactly that: full attention, no mask.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.quant import Linear, quantize_stacked_weight_only, linear_apply


@dataclasses.dataclass(frozen=True)
class T5Config:
    vocab_size: int = 32128
    d_model: int = 4096
    d_ff: int = 10240
    num_layers: int = 24
    num_heads: int = 64
    d_kv: int = 64
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    layer_norm_epsilon: float = 1e-6

    @classmethod
    def from_hf_config(cls, cfg: Dict[str, Any]) -> "T5Config":
        return cls(
            vocab_size=cfg["vocab_size"],
            d_model=cfg["d_model"],
            d_ff=cfg["d_ff"],
            num_layers=cfg["num_layers"],
            num_heads=cfg["num_heads"],
            d_kv=cfg["d_kv"],
            relative_attention_num_buckets=cfg.get("relative_attention_num_buckets", 32),
            relative_attention_max_distance=cfg.get("relative_attention_max_distance", 128),
            layer_norm_epsilon=cfg.get("layer_norm_epsilon", 1e-6),
        )


def _t5_layer_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float) -> jnp.ndarray:
    """T5LayerNorm: RMS-only, fp32 variance, weight applied in input dtype."""
    orig = x.dtype
    x32 = x.astype(jnp.float32)
    var = jnp.mean(x32 * x32, axis=-1, keepdims=True)
    return (weight.astype(jnp.float32) * x32 * jax.lax.rsqrt(var + eps)).astype(orig)


def relative_position_bucket(
    relative_position: jnp.ndarray, num_buckets: int = 32, max_distance: int = 128
) -> jnp.ndarray:
    """HF T5's bidirectional bucket function (modeling_t5._relative_position_bucket)."""
    num_buckets = num_buckets // 2
    ret = (relative_position > 0).astype(jnp.int32) * num_buckets
    n = jnp.abs(relative_position)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_if_large = max_exact + (
        jnp.log(n.astype(jnp.float32) / max_exact + 1e-6)
        / np.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(jnp.int32)
    val_if_large = jnp.minimum(val_if_large, num_buckets - 1)
    return ret + jnp.where(is_small, n, val_if_large)


def compute_position_bias(rel_bias_table: jnp.ndarray, seq_len: int, cfg: T5Config) -> jnp.ndarray:
    """(1, heads, L, L) fp32 additive attention bias from the learned bucket table."""
    ctx = jnp.arange(seq_len)[:, None]
    mem = jnp.arange(seq_len)[None, :]
    buckets = relative_position_bucket(
        mem - ctx,
        cfg.relative_attention_num_buckets,
        cfg.relative_attention_max_distance,
    )
    bias = rel_bias_table.astype(jnp.float32)[buckets]  # (L, L, heads)
    return bias.transpose(2, 0, 1)[None]


def _t5_attention(blk, x, position_bias, cfg: T5Config, dtype):
    b, l, _ = x.shape
    h, dk = cfg.num_heads, cfg.d_kv

    def heads(t):
        return t.reshape(b, l, h, dk)

    q = heads(linear_apply(blk["q"], x, dtype)[0])
    k = heads(linear_apply(blk["k"], x, dtype)[0])
    v = heads(linear_apply(blk["v"], x, dtype)[0])
    # no 1/sqrt(d) scaling — T5 semantics. fp32 logits + softmax.
    scores = jnp.einsum("blhd,bmhd->bhlm", q.astype(jnp.float32), k.astype(jnp.float32))
    scores = scores + position_bias
    probs = jax.nn.softmax(scores, axis=-1).astype(dtype)
    out = jnp.einsum("bhlm,bmhd->blhd", probs, v).reshape(b, l, h * dk)
    return linear_apply(blk["o"], out, dtype)[0]


def _t5_block(blk, x, position_bias, cfg: T5Config, dtype):
    h = _t5_layer_norm(x, blk["ln1"], cfg.layer_norm_epsilon)
    x = x + _t5_attention(blk, h, position_bias, cfg, dtype)
    h = _t5_layer_norm(x, blk["ln2"], cfg.layer_norm_epsilon)
    gate = jax.nn.gelu(linear_apply(blk["wi_0"], h, dtype)[0], approximate=True)
    ff = linear_apply(blk["wo"], gate * linear_apply(blk["wi_1"], h, dtype)[0], dtype)[0]
    return x + ff


def t5_encode(
    params: Dict[str, Any],
    cfg: T5Config,
    input_ids: jnp.ndarray,
    dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """(B, L) token ids → (B, L, d_model) last_hidden_state."""
    x = params["shared"].astype(dtype)[input_ids]
    position_bias = compute_position_bias(params["rel_bias"], input_ids.shape[1], cfg)

    def body(x, blk):
        return _t5_block(blk, x, position_bias, cfg, dtype), None

    x, _ = jax.lax.scan(body, x, params["blocks"])
    return _t5_layer_norm(x, params["final_ln"], cfg.layer_norm_epsilon)


# ------------------------------------------------------------------ streamed offload


def make_t5_stream_fns(cfg: T5Config, dtype):
    """The three jitted pieces of a streamed (block-by-block offloaded) T5 encode —
    the text-encoder analog of offload.py's flow stream fns. One ``block`` jit
    serves every layer (all 24 T5-XXL blocks share shapes), so the structure costs
    depth-many dispatches, not depth-many compiles."""

    @jax.jit
    def pre(shared, rel_bias, input_ids):
        x = shared.astype(dtype)[input_ids]
        return x, compute_position_bias(rel_bias, input_ids.shape[1], cfg)

    @jax.jit
    def block(blk, x, position_bias):
        return _t5_block(blk, x, position_bias, cfg, dtype)

    @jax.jit
    def post(final_ln, x):
        return _t5_layer_norm(x, final_ln, cfg.layer_norm_epsilon)

    return {"pre": pre, "block": block, "post": post}


def t5_encode_streamed(
    params: Dict[str, Any],
    cfg: T5Config,
    input_ids: jnp.ndarray,
    device,
    dtype=jnp.bfloat16,
    fns=None,
) -> jnp.ndarray:
    """:func:`t5_encode` with the block stack streamed host→device per layer.

    The reference's 24GB offload plan moves the WHOLE T5 to the GPU before encoding
    and back after (flux_pipeline.py:293-311 per-stage moves) — at T5-XXL scale
    that serializes a multi-GB transfer against zero compute. Here the stacked
    ``blocks`` tree stays host-resident; each layer's slice is ``device_put``
    issued one layer AHEAD of the compute that needs it (JAX dispatch is async, so
    the copy overlaps the previous layer's matmuls), and device references die as
    soon as the layer is consumed — peak HBM is two block slices plus activations,
    and there is no device→host return copy at all. Unlike the flow's streamed
    denoise (offload.py), nothing is retained: an encode touches each block once
    per request, so retention buys nothing and would squat HBM the flow needs.

    Numerically identical ops to :func:`t5_encode` modulo jit boundaries (same
    fusion-noise caveat as the flow stream fns; tests pin the closeness).
    """
    from ..offload import LazyBlockSlices

    fns = fns or make_t5_stream_fns(cfg, dtype)
    slices = LazyBlockSlices(params["blocks"])
    tops = jax.device_put(
        {k: params[k] for k in ("shared", "rel_bias", "final_ln")}, device
    )
    x, position_bias = fns["pre"](
        tops["shared"], tops["rel_bias"], jax.device_put(input_ids, device)
    )
    n = len(slices)
    nxt = jax.device_put(slices[0], device)
    for j in range(n):
        # prefetch layer j+1 BEFORE dispatching layer j's compute — both are
        # async, so the host→HBM copy rides under the matmuls
        cur, nxt = nxt, (jax.device_put(slices[j + 1], device) if j + 1 < n else None)
        x = fns["block"](cur, x, position_bias)
    return fns["post"](tops["final_ln"], x)


# --------------------------------------------------------------------- init / loading


def init_t5_params(key, cfg: T5Config, dtype=jnp.float32) -> Dict[str, Any]:
    ks = jax.random.split(key, cfg.num_layers + 2)

    def lin(key, i, o):
        return Linear(kernel=jax.random.normal(key, (i, o), jnp.float32).astype(dtype) * 0.02, kind="float")

    def block(key):
        kk = jax.random.split(key, 7)
        inner = cfg.num_heads * cfg.d_kv
        return {
            "q": lin(kk[0], cfg.d_model, inner),
            "k": lin(kk[1], cfg.d_model, inner),
            "v": lin(kk[2], cfg.d_model, inner),
            "o": lin(kk[3], inner, cfg.d_model),
            "ln1": jnp.ones((cfg.d_model,), dtype),
            "wi_0": lin(kk[4], cfg.d_model, cfg.d_ff),
            "wi_1": lin(kk[5], cfg.d_model, cfg.d_ff),
            "wo": lin(kk[6], cfg.d_ff, cfg.d_model),
            "ln2": jnp.ones((cfg.d_model,), dtype),
        }

    blocks = [block(ks[i]) for i in range(cfg.num_layers)]
    return {
        "shared": jax.random.normal(ks[-1], (cfg.vocab_size, cfg.d_model), jnp.float32).astype(dtype) * 0.02,
        "rel_bias": jax.random.normal(
            ks[-2], (cfg.relative_attention_num_buckets, cfg.num_heads), jnp.float32
        ).astype(dtype) * 0.02,
        "blocks": jax.tree.map(lambda *xs: jnp.stack(xs), *blocks),
        "final_ln": jnp.ones((cfg.d_model,), dtype),
    }


def quantize_t5_params(params: Dict[str, Any], tier: str) -> Dict[str, Any]:
    """Apply a weight-only tier ('qfloat8'/'qint8'/'qint4'/'qint2') to all block linears
    (the reference quantizes the whole HF module via quanto/bnb, conditioner.py:56-70)."""
    out = dict(params)
    out["blocks"] = quantize_stacked_weight_only(params["blocks"], tier)
    return out


def load_t5_checkpoint(sd_get, cfg: T5Config, dtype=jnp.bfloat16, report=None) -> Dict[str, Any]:
    """HF T5EncoderModel state dict → pytree. ``sd_get(name) -> np.ndarray``.

    HF key layout: shared.weight, encoder.block.{i}.layer.0.SelfAttention.{q,k,v,o}.weight,
    …layer.0.layer_norm.weight, …layer.1.DenseReluDense.{wi_0,wi_1,wo}.weight,
    …layer.1.layer_norm.weight, encoder.final_layer_norm.weight, and the block-0
    relative_attention_bias.

    With a ``report`` (utils.checkpoint.LoadReport) the load is tolerant: every
    shape is derivable from ``cfg``, so missing tensors zero-fill (norms → ones)
    with the key recorded instead of raising (reference strict=False analog,
    util.py:225-237).
    """
    inner = cfg.num_heads * cfg.d_kv

    from ..utils.checkpoint import LoadReport

    def fetch(name, shape, fill=0.0):
        return LoadReport.fetch(sd_get, name, shape, fill, report)

    def lin(name, out_f, in_f):
        w = fetch(name, (out_f, in_f))
        return Linear(kernel=jnp.asarray(w.transpose(1, 0), dtype), kind="float")

    def ln(name):
        return jnp.asarray(fetch(name, (cfg.d_model,), fill=1.0), dtype)

    d, ff = cfg.d_model, cfg.d_ff
    blocks = []
    for i in range(cfg.num_layers):
        p = f"encoder.block.{i}."
        blocks.append(
            {
                "q": lin(p + "layer.0.SelfAttention.q.weight", inner, d),
                "k": lin(p + "layer.0.SelfAttention.k.weight", inner, d),
                "v": lin(p + "layer.0.SelfAttention.v.weight", inner, d),
                "o": lin(p + "layer.0.SelfAttention.o.weight", d, inner),
                "ln1": ln(p + "layer.0.layer_norm.weight"),
                "wi_0": lin(p + "layer.1.DenseReluDense.wi_0.weight", ff, d),
                "wi_1": lin(p + "layer.1.DenseReluDense.wi_1.weight", ff, d),
                "wo": lin(p + "layer.1.DenseReluDense.wo.weight", d, ff),
                "ln2": ln(p + "layer.1.layer_norm.weight"),
            }
        )
    return {
        "shared": jnp.asarray(fetch("shared.weight", (cfg.vocab_size, d)), dtype),
        "rel_bias": jnp.asarray(
            fetch(
                "encoder.block.0.layer.0.SelfAttention.relative_attention_bias.weight",
                (cfg.relative_attention_num_buckets, cfg.num_heads),
            ),
            dtype,
        ),
        "blocks": jax.tree.map(lambda *xs: jnp.stack(xs), *blocks),
        "final_ln": ln("encoder.final_layer_norm.weight"),
    }
