"""FLUX VAE (AutoEncoder), TPU-native.

Functional re-implementation of the reference's ``modules/autoencoder.py`` (Encoder
:123-200, Decoder :203-283, AttnBlock :23-52, ResnetBlock :55-92, DiagonalGaussian
:286-298, AutoEncoder :301-336) as a parameter pytree + pure encode/decode:

- layout is **NHWC** end-to-end — the TPU-native conv layout (XLA tiles NHWC convs onto
  the MXU directly; torch's NCHW would force transposes per conv). Conv kernels are
  stored HWIO; the checkpoint loader transposes from torch's OIHW once at load;
- GroupNorm is computed in fp32 and cast back (the ae runs under bf16 — reference
  autocasts decode to bf16 at flux_pipeline.py:431-433);
- the mid AttnBlock reuses the framework's SDPA over (H·W) tokens;
- ``DiagonalGaussian`` takes an explicit PRNG key (pure; the reference uses global
  ``torch.randn_like``).

The param tree mirrors the torch module paths (``encoder.down.0.block.1.conv1`` …) so
checkpoint key mapping is mechanical.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ..utils.config import AutoEncoderParams


def _conv(p: Dict[str, jnp.ndarray], x: jnp.ndarray, stride: int = 1, padding="SAME") -> jnp.ndarray:
    """NHWC conv with HWIO kernel; fp32 accumulate.

    Kernels may be weight-only-quantized e4m3 (see :func:`quantize_ae_params`):
    dequantize in compute dtype with the per-out-channel scale — XLA fuses the
    multiply into the conv's input.
    """
    kernel = p["kernel"]
    if kernel.dtype == jnp.float8_e4m3fn:
        kernel = kernel.astype(x.dtype) * p["kscale_inv"].astype(x.dtype)
    out = jax.lax.conv_general_dilated(
        x,
        kernel.astype(x.dtype),
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    if "bias" in p:
        out = out + p["bias"].astype(jnp.float32)
    return out.astype(x.dtype)


def _group_norm(p: Dict[str, jnp.ndarray], x: jnp.ndarray, groups: int = 32, eps: float = 1e-6) -> jnp.ndarray:
    """GroupNorm(32) over channels (NHWC), fp32 internally (reference nn.GroupNorm)."""
    orig_dtype = x.dtype
    b, h, w, c = x.shape
    x32 = x.astype(jnp.float32).reshape(b, h, w, groups, c // groups)
    mean = jnp.mean(x32, axis=(1, 2, 4), keepdims=True)
    var = jnp.var(x32, axis=(1, 2, 4), keepdims=True)
    x32 = (x32 - mean) * jax.lax.rsqrt(var + eps)
    x32 = x32.reshape(b, h, w, c)
    return (x32 * p["weight"].astype(jnp.float32) + p["bias"].astype(jnp.float32)).astype(orig_dtype)


def _swish(x: jnp.ndarray) -> jnp.ndarray:
    return x * jax.nn.sigmoid(x)


def _resnet_block(p: Dict[str, Any], x: jnp.ndarray) -> jnp.ndarray:
    """reference ResnetBlock (autoencoder.py:55-92)."""
    h = _conv(p["conv1"], _swish(_group_norm(p["norm1"], x)))
    h = _conv(p["conv2"], _swish(_group_norm(p["norm2"], h)))
    if "nin_shortcut" in p:
        x = _conv(p["nin_shortcut"], x)
    return x + h


def _attn_block(p: Dict[str, Any], x: jnp.ndarray) -> jnp.ndarray:
    """reference AttnBlock (autoencoder.py:23-52): 1×1-conv qkv + SDPA over hw tokens.

    At 1024² images the mid block sees 128×128 = 16k tokens — naive SDPA would
    materialize a 16k×16k fp32 logit matrix (1GB). Above 4096 tokens the query axis is
    chunked so the peak transient stays bounded.
    """
    h = _group_norm(p["norm"], x)
    q, k, v = (_conv(p[n], h) for n in ("q", "k", "v"))
    b, hh, ww, c = q.shape
    l = hh * ww
    q, k, v = (t.reshape(b, l, c).astype(jnp.float32) for t in (q, k, v))
    scale = c**-0.5

    # largest divisor of l ≤ 2048: every resolution gets a bounded transient (a fixed
    # candidate list missed e.g. 1024×720's l=11520 and fell back to the naive path's
    # ~531MB logit matrix). Floor at 256: an l = small·prime would otherwise
    # degenerate to a scan of thousands of tiny steps — the naive path's transient
    # at such l (< 8·4096) is modest anyway.
    chunk = next((c for c in range(2048, 255, -1) if l % c == 0), None)
    if l <= 4096 or chunk is None:
        logits = jnp.einsum("blc,bmc->blm", q, k) * scale
        out = jnp.einsum("blm,bmc->blc", jax.nn.softmax(logits, axis=-1), v)
    else:

        def one_chunk(q_chunk):
            logits = jnp.einsum("bqc,bmc->bqm", q_chunk, k) * scale
            return jnp.einsum("bqm,bmc->bqc", jax.nn.softmax(logits, axis=-1), v)

        q_chunks = q.reshape(b, l // chunk, chunk, c).transpose(1, 0, 2, 3)
        out = jax.lax.map(one_chunk, q_chunks)  # (n_chunks, b, chunk, c)
        out = out.transpose(1, 0, 2, 3).reshape(b, l, c)

    out = out.astype(x.dtype).reshape(b, hh, ww, c)
    return x + _conv(p["proj_out"], out)


def _downsample(p: Dict[str, Any], x: jnp.ndarray) -> jnp.ndarray:
    """stride-2 conv with the reference's asymmetric (0,1,0,1) pad (autoencoder.py:95-107)."""
    x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
    return _conv(p["conv"], x, stride=2, padding="VALID")


def _upsample(p: Dict[str, Any], x: jnp.ndarray) -> jnp.ndarray:
    """nearest ×2 + 3×3 conv (autoencoder.py:110-120)."""
    x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
    return _conv(p["conv"], x)


def encoder_apply(p: Dict[str, Any], x: jnp.ndarray, cfg: AutoEncoderParams) -> jnp.ndarray:
    """reference Encoder.forward (autoencoder.py:179-200). x: (B, H, W, in_ch) → (B, h, w, 2·z)."""
    h = _conv(p["conv_in"], x)
    n_res = len(cfg.ch_mult)
    for i_level in range(n_res):
        down = p["down"][i_level]
        for i_block in range(cfg.num_res_blocks):
            h = _resnet_block(down["block"][i_block], h)
        if i_level != n_res - 1:
            h = _downsample(down["downsample"], h)
    h = _resnet_block(p["mid"]["block_1"], h)
    h = _attn_block(p["mid"]["attn_1"], h)
    h = _resnet_block(p["mid"]["block_2"], h)
    return _conv(p["conv_out"], _swish(_group_norm(p["norm_out"], h)))


def decoder_apply(p: Dict[str, Any], z: jnp.ndarray, cfg: AutoEncoderParams) -> jnp.ndarray:
    """reference Decoder.forward (autoencoder.py:263-283). z: (B, h, w, z_ch) → (B, H, W, out_ch)."""
    h = _conv(p["conv_in"], z)
    h = _resnet_block(p["mid"]["block_1"], h)
    h = _attn_block(p["mid"]["attn_1"], h)
    h = _resnet_block(p["mid"]["block_2"], h)
    n_res = len(cfg.ch_mult)
    for i_level in reversed(range(n_res)):
        up = p["up"][i_level]
        for i_block in range(cfg.num_res_blocks + 1):
            h = _resnet_block(up["block"][i_block], h)
        if i_level != 0:
            h = _upsample(up["upsample"], h)
    return _conv(p["conv_out"], _swish(_group_norm(p["norm_out"], h)))


def diagonal_gaussian_sample(z: jnp.ndarray, key: Optional[jax.Array]) -> jnp.ndarray:
    """reference DiagonalGaussian (autoencoder.py:286-298); channels-last chunk.
    key=None returns the mean (deterministic encode)."""
    mean, logvar = jnp.split(z, 2, axis=-1)
    if key is None:
        return mean
    std = jnp.exp(0.5 * logvar.astype(jnp.float32)).astype(mean.dtype)
    return mean + std * jax.random.normal(key, mean.shape, mean.dtype)


def ae_encode(
    params: Dict[str, Any],
    cfg: AutoEncoderParams,
    x: jnp.ndarray,
    key: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """x (B, H, W, in_ch) in [-1, 1] → latent (B, H/8, W/8, z); applies the
    scale/shift normalization (reference AutoEncoder.encode, autoencoder.py:326-328)."""
    z = diagonal_gaussian_sample(encoder_apply(params["encoder"], x, cfg), key)
    return cfg.scale_factor * (z - cfg.shift_factor)


def ae_decode(params: Dict[str, Any], cfg: AutoEncoderParams, z: jnp.ndarray) -> jnp.ndarray:
    """latent (B, h, w, z) → image (B, H, W, out_ch) (reference AutoEncoder.decode,
    autoencoder.py:330-332)."""
    z = z / cfg.scale_factor + cfg.shift_factor
    return decoder_apply(params["decoder"], z, cfg)


# ---------------------------------------------------------------- weight-only quant


def quantize_ae_params(params: Dict[str, Any]) -> Dict[str, Any]:
    """Weight-only e4m3 quantization of every conv kernel, per-out-channel scales.

    Implements what the reference's ``ae_quantization_dtype`` *advertises*
    (util.py:288-291) — there the flag silently no-ops because
    ``recursive_swap_linears`` finds no nn.Linear in the conv-only AE. Activations
    stay in compute dtype; :func:`_conv` dequantizes at use. Halves AE param memory.
    """

    def q(node):
        if isinstance(node, dict) and "kernel" in node and node["kernel"].ndim == 4:
            k32 = node["kernel"].astype(jnp.float32)
            amax = jnp.max(jnp.abs(k32), axis=(0, 1, 2))  # (out,)
            scale = jnp.minimum(448.0 / jnp.maximum(amax, 1e-12), 448.0)
            out = dict(node)
            out["kernel"] = jnp.clip(k32 * scale, -448.0, 448.0).astype(jnp.float8_e4m3fn)
            out["kscale_inv"] = (1.0 / scale).astype(jnp.float32)
            return out
        if isinstance(node, dict):
            return {k: q(v) for k, v in node.items()}
        if isinstance(node, list):
            return [q(v) for v in node]
        return node

    return q(params)


# ------------------------------------------------------------------------- param init


def _init_conv(key, kh, kw, cin, cout, dtype) -> Dict[str, jnp.ndarray]:
    k1, k2 = jax.random.split(key)
    fan_in = kh * kw * cin
    std = (2.0 / fan_in) ** 0.5
    return {
        "kernel": (jax.random.normal(k1, (kh, kw, cin, cout)) * std).astype(dtype),
        "bias": jnp.zeros((cout,), dtype),
    }


def _init_gn(c, dtype) -> Dict[str, jnp.ndarray]:
    return {"weight": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype)}


def _init_resnet(key, cin, cout, dtype) -> Dict[str, Any]:
    ks = jax.random.split(key, 3)
    p = {
        "norm1": _init_gn(cin, dtype),
        "conv1": _init_conv(ks[0], 3, 3, cin, cout, dtype),
        "norm2": _init_gn(cout, dtype),
        "conv2": _init_conv(ks[1], 3, 3, cout, cout, dtype),
    }
    if cin != cout:
        p["nin_shortcut"] = _init_conv(ks[2], 1, 1, cin, cout, dtype)
    return p


def _init_attn(key, c, dtype) -> Dict[str, Any]:
    ks = jax.random.split(key, 4)
    return {
        "norm": _init_gn(c, dtype),
        "q": _init_conv(ks[0], 1, 1, c, c, dtype),
        "k": _init_conv(ks[1], 1, 1, c, c, dtype),
        "v": _init_conv(ks[2], 1, 1, c, c, dtype),
        "proj_out": _init_conv(ks[3], 1, 1, c, c, dtype),
    }


def init_autoencoder_params(key, cfg: AutoEncoderParams, dtype=jnp.float32) -> Dict[str, Any]:
    """Random-init params with the reference's exact channel plan
    (Encoder autoencoder.py:123-177, Decoder :203-261)."""
    ke, kd = jax.random.split(key)
    ch, n_res = cfg.ch, len(cfg.ch_mult)
    in_ch_mult = (1,) + tuple(cfg.ch_mult)

    # encoder
    keys = iter(jax.random.split(ke, 64))
    enc: Dict[str, Any] = {"conv_in": _init_conv(next(keys), 3, 3, cfg.in_channels, ch, dtype)}
    down = []
    block_in = ch
    for i_level in range(n_res):
        block_in = ch * in_ch_mult[i_level]
        block_out = ch * cfg.ch_mult[i_level]
        level: Dict[str, Any] = {"block": []}
        for _ in range(cfg.num_res_blocks):
            level["block"].append(_init_resnet(next(keys), block_in, block_out, dtype))
            block_in = block_out
        if i_level != n_res - 1:
            level["downsample"] = {"conv": _init_conv(next(keys), 3, 3, block_in, block_in, dtype)}
        down.append(level)
    enc["down"] = down
    enc["mid"] = {
        "block_1": _init_resnet(next(keys), block_in, block_in, dtype),
        "attn_1": _init_attn(next(keys), block_in, dtype),
        "block_2": _init_resnet(next(keys), block_in, block_in, dtype),
    }
    enc["norm_out"] = _init_gn(block_in, dtype)
    enc["conv_out"] = _init_conv(next(keys), 3, 3, block_in, 2 * cfg.z_channels, dtype)

    # decoder
    keys = iter(jax.random.split(kd, 64))
    block_in = ch * cfg.ch_mult[n_res - 1]
    dec: Dict[str, Any] = {"conv_in": _init_conv(next(keys), 3, 3, cfg.z_channels, block_in, dtype)}
    dec["mid"] = {
        "block_1": _init_resnet(next(keys), block_in, block_in, dtype),
        "attn_1": _init_attn(next(keys), block_in, dtype),
        "block_2": _init_resnet(next(keys), block_in, block_in, dtype),
    }
    up: list = [None] * n_res
    for i_level in reversed(range(n_res)):
        block_out = ch * cfg.ch_mult[i_level]
        level = {"block": []}
        for _ in range(cfg.num_res_blocks + 1):
            level["block"].append(_init_resnet(next(keys), block_in, block_out, dtype))
            block_in = block_out
        if i_level != 0:
            level["upsample"] = {"conv": _init_conv(next(keys), 3, 3, block_in, block_in, dtype)}
        up[i_level] = level
    dec["up"] = up
    dec["norm_out"] = _init_gn(block_in, dtype)
    dec["conv_out"] = _init_conv(next(keys), 3, 3, block_in, cfg.out_ch, dtype)

    return {"encoder": enc, "decoder": dec}
