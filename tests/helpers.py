"""Shared tiny-model fixtures (SURVEY.md §4: scaled-down Flux for CPU-runnable e2e)."""

import jax
import jax.numpy as jnp

from flux_fp8_api_tpu.models.flux import FluxStatic, init_flux_params
from flux_fp8_api_tpu.utils.config import (
    AutoEncoderParams,
    FluxParams,
    ModelSpec,
    ModelVersion,
)

TINY_FLUX_PARAMS = FluxParams(
    in_channels=16,  # latent C=4, 2x2 packed
    vec_in_dim=32,
    context_in_dim=48,
    hidden_size=64,
    mlp_ratio=4.0,
    num_heads=4,  # head_dim 16
    depth=2,
    depth_single_blocks=3,
    axes_dim=[4, 6, 6],
    theta=10_000,
    qkv_bias=True,
    guidance_embed=True,
)

# ch must stay a multiple of 32: the VAE's GroupNorm(32) matches the reference exactly
# (autoencoder.py:28,62) and FLUX's real ch is 128. Four levels keep the real VAE's
# ×8 spatial factor, which the pipeline's latent geometry assumes.
TINY_AE_PARAMS = AutoEncoderParams(
    resolution=64,
    in_channels=3,
    ch=32,
    out_ch=3,
    ch_mult=[1, 1, 2, 2],
    num_res_blocks=1,
    z_channels=4,
    scale_factor=0.3611,
    shift_factor=0.1159,
)


def tiny_spec(**overrides) -> ModelSpec:
    defaults = dict(
        version=ModelVersion.flux_dev,
        params=TINY_FLUX_PARAMS,
        ae_params=TINY_AE_PARAMS,
        ckpt_path=None,
        ae_path=None,
        repo_id=None,
        repo_flow=None,
        repo_ae=None,
        text_enc_path=None,
        flux_device="cpu",
        ae_device="cpu",
        text_enc_device="cpu",
        flow_dtype="bfloat16",
        use_pallas=False,
    )
    defaults.update(overrides)
    return ModelSpec(**defaults)


def tiny_flux(key=None, compute_dtype="bfloat16", use_pallas=False):
    cfg = FluxStatic.from_params(
        TINY_FLUX_PARAMS, compute_dtype=compute_dtype, use_pallas=use_pallas
    )
    params = init_flux_params(key or jax.random.PRNGKey(0), cfg, jnp.float32)
    return cfg, params


def toy_tokenizer(style: str = "clip", vocab_words=None):
    """In-memory word-level tokenizer (no hub access in this image).

    style="clip": BOS+EOS framing, like CLIPTokenizer.
    style="t5": EOS-only framing, like T5Tokenizer.
    """
    from tokenizers import Tokenizer, models, pre_tokenizers
    from tokenizers.processors import TemplateProcessing
    from transformers import PreTrainedTokenizerFast

    words = vocab_words or [
        "a", "an", "the", "cat", "dog", "house", "hill", "on", "red", "blue",
        "beautiful", "important", "word", "sun", "sky", "photo", "of", "test",
        "image", "normal", "text", ".", ",",
    ]
    vocab = {"<pad>": 0, "<bos>": 1, "<eos>": 2, "<unk>": 3}
    for w in words:
        vocab[w] = len(vocab)
    tok = Tokenizer(models.WordLevel(vocab, unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    if style == "clip":
        tok.post_processor = TemplateProcessing(
            single="<bos> $A <eos>", special_tokens=[("<bos>", 1), ("<eos>", 2)]
        )
    else:
        tok.post_processor = TemplateProcessing(
            single="$A <eos>", special_tokens=[("<eos>", 2)]
        )
    fast = PreTrainedTokenizerFast(
        tokenizer_object=tok,
        bos_token="<bos>" if style == "clip" else None,
        eos_token="<eos>",
        unk_token="<unk>",
        pad_token="<eos>",  # CLIP pads with eos; T5 uses <pad> but eos works for tests
    )
    fast.model_max_length = 77
    return fast


def tiny_text_encoders():
    """Tiny CLIP+T5 TextEncoder pair with toy tokenizers for emphasis/pipeline tests."""
    import jax

    from flux_fp8_api_tpu.models.clip import CLIPConfig, init_clip_params
    from flux_fp8_api_tpu.models.conditioner import TextEncoder
    from flux_fp8_api_tpu.models.t5 import T5Config, init_t5_params

    clip_cfg = CLIPConfig(
        vocab_size=64,
        hidden_size=TINY_FLUX_PARAMS.vec_in_dim,
        intermediate_size=64,
        num_layers=2,
        num_heads=2,
        max_position_embeddings=77,
        eos_token_id=2,
    )
    t5_cfg = T5Config(
        vocab_size=64, d_model=TINY_FLUX_PARAMS.context_in_dim, d_ff=96,
        num_layers=2, num_heads=3, d_kv=16,
    )
    clip = TextEncoder(
        "clip",
        init_clip_params(jax.random.PRNGKey(10), clip_cfg),
        clip_cfg,
        toy_tokenizer("clip"),
        max_length=77,
    )
    t5 = TextEncoder(
        "t5",
        init_t5_params(jax.random.PRNGKey(11), t5_cfg),
        t5_cfg,
        toy_tokenizer("t5"),
        max_length=32,
    )
    return clip, t5


def tiny_inputs(key=None, batch=1, h_latent=8, w_latent=8, txt_len=16):
    """Packed-latent inputs for the tiny flux (latent HxW → seq (h/2)(w/2))."""
    from flux_fp8_api_tpu.ops.packing import make_img_ids, make_txt_ids

    key = key or jax.random.PRNGKey(42)
    ks = jax.random.split(key, 3)
    seq = (h_latent // 2) * (w_latent // 2)
    img = jax.random.normal(ks[0], (batch, seq, TINY_FLUX_PARAMS.in_channels))
    txt = jax.random.normal(ks[1], (batch, txt_len, TINY_FLUX_PARAMS.context_in_dim))
    y = jax.random.normal(ks[2], (batch, TINY_FLUX_PARAMS.vec_in_dim))
    return dict(
        img=img,
        img_ids=make_img_ids(h_latent, w_latent, batch),
        txt=txt,
        txt_ids=make_txt_ids(txt_len, batch),
        timesteps=jnp.full((batch,), 0.5),
        y=y,
        guidance=jnp.full((batch,), 3.5),
    )
