"""Max-free qk-norm attention kernel: correctness vs naive softmax (interpret mode
on CPU; the compiled kernel runs in the TPU benchmarks)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flux_fp8_api_tpu.ops.attention_kernel import (
    MAX_SAFE_LOGIT,
    qknorm_attention,
    qknorm_attention_checked,
)


def _naive(q, k, v, scale):
    s = jnp.einsum("hld,hmd->hlm", q.astype(jnp.float32), k.astype(jnp.float32)) * scale
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("hlm,hmd->hld", p, v.astype(jnp.float32))


def _normed(key, shape):
    x = jax.random.normal(key, shape, jnp.float32)
    return x / jnp.sqrt(jnp.mean(x * x, -1, keepdims=True))


class TestQKNormAttention:
    def test_matches_naive_softmax(self):
        h, l, d = 2, 512, 32
        ks = jax.random.split(jax.random.PRNGKey(0), 3)
        q, k = _normed(ks[0], (h, l, d)), _normed(ks[1], (h, l, d))
        v = jax.random.normal(ks[2], (h, l, d), jnp.float32)
        scale = d**-0.5
        ref = _naive(q, k, v, scale)
        out = qknorm_attention(q, k, v, scale, block_q=128, block_kv=256, interpret=True)
        # p is cast to bf16 for the AV matmul (MXU feed) → ~0.2% vector error
        rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
        assert rel < 5e-3, rel

    def test_bf16_inputs(self):
        h, l, d = 1, 256, 32
        ks = jax.random.split(jax.random.PRNGKey(1), 3)
        q, k = (_normed(ks[0], (h, l, d)).astype(jnp.bfloat16),
                _normed(ks[1], (h, l, d)).astype(jnp.bfloat16))
        v = jax.random.normal(ks[2], (h, l, d), jnp.bfloat16)
        scale = d**-0.5
        ref = _naive(q, k, v, scale)
        out = qknorm_attention(q, k, v, scale, block_q=128, block_kv=128, interpret=True)
        rel = float(
            jnp.linalg.norm(out.astype(jnp.float32) - ref) / jnp.linalg.norm(ref)
        )
        assert rel < 0.02, rel

    def test_shift_invariance(self):
        """The constant SHIFT must cancel exactly in the normalization: outputs are
        scale-invariant to it (softmax(x) == softmax(x - c))."""
        h, l, d = 1, 128, 32
        ks = jax.random.split(jax.random.PRNGKey(2), 3)
        q, k = _normed(ks[0], (h, l, d)), _normed(ks[1], (h, l, d))
        v = jax.random.normal(ks[2], (h, l, d), jnp.float32)
        # amplify logits toward the documented bound — still finite & correct
        out = qknorm_attention(q * 3, k * 3, v, d**-0.5, block_q=128, block_kv=128, interpret=True)
        ref = _naive(q * 3, k * 3, v, d**-0.5)
        assert bool(jnp.all(jnp.isfinite(out)))
        rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
        assert rel < 5e-3, rel


class TestFusedRope:
    """RoPE fused into the kernel must match rope-then-attend exactly (the rotation
    happens in f32 registers either way, then casts to the MXU feed dtype)."""

    def _inputs(self, h=2, l=256, d=32, key=5):
        from flux_fp8_api_tpu.ops.rope import embed_nd_cos_sin

        ks = jax.random.split(jax.random.PRNGKey(key), 4)
        q = _normed(ks[0], (h, l, d))
        k = _normed(ks[1], (h, l, d))
        v = jax.random.normal(ks[2], (h, l, d), jnp.float32)
        ids = jnp.stack(
            [jnp.zeros((l,)), jnp.arange(l) // 16, jnp.arange(l) % 16], axis=-1
        )[None]
        cos, sin = embed_nd_cos_sin(ids, (8, 12, 12), 10_000)  # (1, l, 32)
        return q, k, v, cos[0], sin[0]

    def test_matches_unfused(self):
        from flux_fp8_api_tpu.ops.rope import apply_rope

        q, k, v, cos, sin = self._inputs()
        scale = 32**-0.5
        qr, kr = apply_rope(q, k, cos[None], sin[None])
        ref = qknorm_attention(qr, kr, v, scale, block_q=128, block_kv=128, interpret=True)
        out = qknorm_attention(
            q, k, v, scale, block_q=128, block_kv=128, interpret=True, cos=cos, sin=sin
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)

    def test_fused_rope_with_tail_padding(self):
        from flux_fp8_api_tpu.ops.rope import apply_rope

        q, k, v, cos, sin = self._inputs(l=200)
        scale = 32**-0.5
        qr, kr = apply_rope(q, k, cos[None], sin[None])
        ref = qknorm_attention(qr, kr, v, scale, block_q=128, block_kv=128, interpret=True)
        out = qknorm_attention(
            q, k, v, scale, block_q=128, block_kv=128, interpret=True, cos=cos, sin=sin
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)

    def test_const_tables_matches_streamed_tables(self):
        """The VMEM-resident whole-table path (default at serving lengths) and the
        per-block streamed-table fallback (very long sequences) are the same math —
        outputs must match bit-for-bit, including with tail padding."""
        for l in (256, 200):
            q, k, v, cos, sin = self._inputs(l=l)
            scale = 32**-0.5
            kw = dict(block_q=128, block_kv=128, interpret=True, cos=cos, sin=sin)
            const = qknorm_attention(q, k, v, scale, const_tables=True, **kw)
            streamed = qknorm_attention(q, k, v, scale, const_tables=False, **kw)
            np.testing.assert_array_equal(np.asarray(const), np.asarray(streamed))

    def test_const_tables_rectangular_sp_shard(self):
        """Const tables on the sequence-parallel shape (lq < lkv, separate q-side
        tables covering only this shard's rows) — the in-kernel dynamic row slice
        must index q tables by the q grid position and k tables by the kv position,
        which square tests cannot distinguish."""
        lkv, lq = 256, 128  # one sp=2 shard: q rows [128, 256) of the joint seq
        q_full, k, v, cos, sin = self._inputs(l=lkv)
        q = q_full[:, lq:, :]
        cos_q, sin_q = cos[lq:], sin[lq:]
        scale = 32**-0.5
        kw = dict(
            block_q=64, block_kv=128, interpret=True,
            cos=cos, sin=sin, cos_q=cos_q, sin_q=sin_q,
        )
        const = qknorm_attention(q, k, v, scale, const_tables=True, **kw)
        streamed = qknorm_attention(q, k, v, scale, const_tables=False, **kw)
        np.testing.assert_array_equal(np.asarray(const), np.asarray(streamed))
        # and both equal the corresponding rows of the full unsharded call
        full = qknorm_attention(
            q_full, k, v, scale, block_q=64, block_kv=128, interpret=True,
            cos=cos, sin=sin,
        )
        np.testing.assert_allclose(
            np.asarray(const), np.asarray(full)[:, lq:], rtol=2e-5, atol=2e-5
        )

    def test_fused_rope_with_stats(self):
        q, k, v, cos, sin = self._inputs()
        out, m = qknorm_attention(
            q, k, v, 32**-0.5, block_q=128, block_kv=128, interpret=True,
            cos=cos, sin=sin, return_max_logit=True,
        )
        assert bool(jnp.all(jnp.isfinite(out)))
        assert float(m) > 0


class TestMaxLogitGuard:
    """The guard rail for the max-free softmax: qk-norm bounds |logit|, but LoRA fuses
    or unusual checkpoints can inflate the norm scales past exp's f32 range — the
    stats build must expose that instead of silently producing NaN images."""

    def _qkv(self, amp=1.0, h=1, l=256, d=32, key=3):
        ks = jax.random.split(jax.random.PRNGKey(key), 3)
        q = _normed(ks[0], (h, l, d)) * amp
        k = _normed(ks[1], (h, l, d)) * amp
        v = jax.random.normal(ks[2], (h, l, d), jnp.float32)
        return q, k, v

    def test_stats_build_matches_serving_build(self):
        q, k, v = self._qkv()
        scale = 32**-0.5
        out_plain = qknorm_attention(q, k, v, scale, block_q=128, block_kv=128, interpret=True)
        out_stats, m = qknorm_attention(
            q, k, v, scale, block_q=128, block_kv=128, interpret=True, return_max_logit=True
        )
        np.testing.assert_array_equal(np.asarray(out_plain), np.asarray(out_stats))
        # reported max must equal the actual max |q·k|·scale
        s = jnp.einsum("hld,hmd->hlm", q, k) * scale
        np.testing.assert_allclose(float(m), float(jnp.max(jnp.abs(s))), rtol=1e-5)

    def test_max_logit_tracks_tail_padding(self):
        # non-block-aligned length: pad columns are zeros and must not affect the max
        q, k, v = self._qkv(l=200)
        scale = 32**-0.5
        _, m = qknorm_attention(
            q, k, v, scale, block_q=128, block_kv=128, interpret=True, return_max_logit=True
        )
        s = jnp.einsum("hld,hmd->hlm", q, k) * scale
        np.testing.assert_allclose(float(m), float(jnp.max(jnp.abs(s))), rtol=1e-5)

    def test_checked_passes_for_qknormed_inputs(self):
        q, k, v = self._qkv()
        out = qknorm_attention_checked(q, k, v, 32**-0.5, block_q=128, block_kv=128, interpret=True)
        assert bool(jnp.all(jnp.isfinite(out)))

    def test_checked_raises_on_adversarial_scales(self):
        # simulate qk-norm scale weights inflated by a pathological LoRA fuse: |q|,|k|
        # grow ~60×, logits ≈ 60²·√d·scale ≫ MAX_SAFE_LOGIT
        q, k, v = self._qkv(amp=60.0)
        with pytest.raises(FloatingPointError, match="safe bound"):
            qknorm_attention_checked(q, k, v, 32**-0.5, block_q=128, block_kv=128, interpret=True)
        # and the unchecked serving build would indeed have overflowed — the guard is
        # detecting a real failure mode, not a false alarm
        _, m = qknorm_attention(
            q, k, v, 32**-0.5, block_q=128, block_kv=128, interpret=True, return_max_logit=True
        )
        assert float(m) > MAX_SAFE_LOGIT


class TestRectangularQ:
    """Lq != Lkv: each device's q shard against full kv (sequence parallelism)."""

    def test_q_shard_matches_full_rows(self):
        h, l, d = 2, 512, 32
        ks = jax.random.split(jax.random.PRNGKey(3), 3)
        q, k = _normed(ks[0], (h, l, d)), _normed(ks[1], (h, l, d))
        v = jax.random.normal(ks[2], (h, l, d), jnp.float32)
        scale = d**-0.5
        full = qknorm_attention(q, k, v, scale, block_q=128, block_kv=256, interpret=True)
        shard = qknorm_attention(
            q[:, 128:384], k, v, scale, block_q=128, block_kv=256, interpret=True
        )
        np.testing.assert_allclose(np.asarray(shard), np.asarray(full[:, 128:384]), rtol=1e-6)

    def test_q_shard_with_rope_tables(self):
        """cos_q/sin_q carry the shard's positions; must match the full fused run."""
        h, l, d = 2, 384, 32
        ks = jax.random.split(jax.random.PRNGKey(4), 5)
        q, k = _normed(ks[0], (h, l, d)), _normed(ks[1], (h, l, d))
        v = jax.random.normal(ks[2], (h, l, d), jnp.float32)
        ang = jax.random.uniform(ks[3], (l, d // 2), jnp.float32, 0, 3.14)
        cos = jnp.repeat(jnp.cos(ang), 2, -1)
        sin = jnp.repeat(jnp.sin(ang), 2, -1)
        scale = d**-0.5
        full = qknorm_attention(
            q, k, v, scale, block_q=128, block_kv=128, interpret=True, cos=cos, sin=sin
        )
        shard = qknorm_attention(
            q[:, 128:256], k, v, scale, block_q=128, block_kv=128, interpret=True,
            cos=cos, sin=sin, cos_q=cos[128:256], sin_q=sin[128:256],
        )
        np.testing.assert_allclose(np.asarray(shard), np.asarray(full[:, 128:256]), rtol=1e-6)

    def test_q_shard_with_kv_tail_masking(self):
        """Non-aligned kv length still masks correctly when q is a shard."""
        h, l, d = 2, 300, 32
        ks = jax.random.split(jax.random.PRNGKey(5), 3)
        q, k = _normed(ks[0], (h, l, d)), _normed(ks[1], (h, l, d))
        v = jax.random.normal(ks[2], (h, l, d), jnp.float32)
        scale = d**-0.5
        full = qknorm_attention(q, k, v, scale, block_q=128, block_kv=128, interpret=True)
        shard = qknorm_attention(
            q[:, 100:200], k, v, scale, block_q=128, block_kv=128, interpret=True
        )
        np.testing.assert_allclose(np.asarray(shard), np.asarray(full[:, 100:200]), rtol=1e-6)


class TestFuzzShapes:
    """Property check across random (lq, lkv, block, rope) combos — guards the
    rectangular/padding/masking generalizations against shape edge cases."""

    def test_random_configs_match_naive(self):
        rng = np.random.RandomState(11)
        for trial in range(6):
            h = int(rng.choice([1, 2]))
            d = int(rng.choice([16, 32]))
            lkv = int(rng.choice([96, 160, 256, 300]))
            lq = int(rng.choice([lkv, 64, 120]))
            bq = int(rng.choice([64, 128]))
            bkv = int(rng.choice([64, 128, 256]))
            ks = jax.random.split(jax.random.PRNGKey(100 + trial), 4)
            q = _normed(ks[0], (h, lq, d))
            k = _normed(ks[1], (h, lkv, d))
            v = jax.random.normal(ks[2], (h, lkv, d), jnp.float32)
            scale = d**-0.5
            use_rope = trial % 2 == 0
            kw = {}
            qr, kr = q, k
            if use_rope:
                ang = jax.random.uniform(ks[3], (max(lq, lkv), d // 2), jnp.float32, 0, 3.14)
                cos = jnp.repeat(jnp.cos(ang), 2, -1)
                sin = jnp.repeat(jnp.sin(ang), 2, -1)
                kw = dict(cos=cos[:lkv], sin=sin[:lkv], cos_q=cos[:lq], sin_q=sin[:lq])

                def rot(x, c, s):
                    half = d // 2
                    rotated = jnp.concatenate([-x[..., half:], x[..., :half]], -1)
                    return x * c + rotated * s

                qr = rot(q, cos[:lq], sin[:lq])
                kr = rot(k, cos[:lkv], sin[:lkv])
            ref = _naive(qr, kr, v, scale)
            out = qknorm_attention(
                q if use_rope else qr, k if use_rope else kr, v, scale,
                block_q=bq, block_kv=bkv, interpret=True, **kw,
            )
            rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
            assert rel < 5e-3, (trial, h, d, lq, lkv, bq, bkv, use_rope, rel)


class TestUnderflowRows:
    def test_all_negative_logit_rows_emit_zero_not_nan(self):
        """A q row whose logits ALL underflow exp(s - SHIFT) must produce 0, not
        0/0 = NaN — the one-sided |logit| guard can't exclude this case."""
        h, l, d = 1, 128, 32
        # construct q,k so every logit is ~-90 (within MAX_SAFE_LOGIT on magnitude)
        q = jnp.ones((h, l, d), jnp.float32)
        k = -jnp.ones((h, l, d), jnp.float32) * (90.0 / d)
        v = jnp.ones((h, l, d), jnp.float32)
        out = qknorm_attention(q, k, v, 1.0, block_q=128, block_kv=128, interpret=True)
        assert bool(jnp.all(jnp.isfinite(out))), "underflowed rows must not NaN"
        np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)


class TestBlockAutotuner:
    """Warmup-time (block_q, block_kv) autotuning (VERDICT r2 item 3)."""

    def _clear(self):
        import flux_fp8_api_tpu.ops.attention as attn

        attn._TUNED_BLOCKS.clear()
        attn._TUNED_MARGINS.clear()
        return attn

    def test_candidates_divide_or_mask(self):
        from flux_fp8_api_tpu.ops.attention import candidate_blocks

        # the shipped Gradio presets the measured table does NOT pin
        for l in (4464, 4544, 4608, 2816, 3000, 1024):
            cands = candidate_blocks(l)
            assert cands, l
            for bq, bkv in cands:
                assert bq % 8 == 0 and bkv % 8 == 0
                assert (l % bq == 0 and l % bkv == 0) or (bq, bkv) == (512, 512), (l, bq, bkv)
        # prime-ish lengths fall back to the masked pair
        assert candidate_blocks(4099) == [(512, 512)]

    def test_registered_blocks_take_effect_after_measured_table(self):
        attn = self._clear()
        try:
            # unpinned length: heuristic → largest square divisor (4464/4544 are
            # pinned since the round-3 autotune run, so use 4000 here)
            assert attn._pick_blocks(4000) == (1000, 1000, False)
            attn.register_tuned_blocks(4000, (1000, 2000))
            assert attn._pick_blocks(4000) == (1000, 2000, False)
            # 3-element registrations carry the const_tables flag
            attn.register_tuned_blocks(4000, (1000, 2000, True))
            assert attn._pick_blocks(4000) == (1000, 2000, True)
            # the hand-measured table stays authoritative over tuned entries
            attn.register_tuned_blocks(4608, (1152, 1152))
            assert attn._pick_blocks(4608) == (768, 1536, False)
        finally:
            attn._TUNED_BLOCKS.clear()

    def test_persistence_roundtrip(self, tmp_path):
        attn = self._clear()
        path = str(tmp_path / "attn_blocks.json")
        try:
            # unpinned lengths (4464/4544 moved into the measured table in round 4)
            attn.register_tuned_blocks(4004, (572, 1001))
            attn.register_tuned_blocks(4040, (1010, 2020, True))
            attn.save_tuned_blocks(path)
            attn._TUNED_BLOCKS.clear()
            assert attn.load_tuned_blocks(path) == 2
            assert attn._pick_blocks(4040) == (1010, 2020, True)
            assert attn._pick_blocks(4004) == (572, 1001, False)
            # corrupt file → ignored, 0 entries
            with open(path, "w") as f:
                f.write("{not json")
            attn._TUNED_BLOCKS.clear()
            assert attn.load_tuned_blocks(path) == 0
            # VALID json that isn't an object (no .items()) → also ignored
            for payload in ('[1, 2]', '"x"', '{"4464": 7}'):
                with open(path, "w") as f:
                    f.write(payload)
                assert attn.load_tuned_blocks(path) == 0
            assert attn.load_tuned_blocks(str(tmp_path / "missing.json")) == 0
            # save is best-effort: creates missing parents, swallows unwritable paths
            attn.register_tuned_blocks(4000, (1000, 1000))
            nested = str(tmp_path / "new" / "dir" / "attn_blocks.json")
            attn.save_tuned_blocks(nested)
            attn._TUNED_BLOCKS.clear()
            assert attn.load_tuned_blocks(nested) == 1
            attn.save_tuned_blocks(str(tmp_path))  # a directory: OSError, no raise
        finally:
            attn._TUNED_BLOCKS.clear()

    def test_autotune_measures_and_registers(self):
        attn = self._clear()
        try:
            timings = attn.autotune_blocks(
                1024, folded_heads=2, head_dim=64, dtype=jnp.float32,
                iters=2, interpret=True,
            )
            from flux_fp8_api_tpu.ops.attention import _norm_entry

            # every block candidate measured streamed + ONE const-tables re-probe
            normed = {_norm_entry(c) for c in attn.candidate_blocks(1024)}
            assert normed <= set(timings)
            # streamed winner re-probed const (+ a full-kv const variant when the
            # winner's kv block isn't already full-kv)
            assert 1 <= sum(1 for c in timings if c[2]) <= 2
            assert all(t > 0 for t in timings.values())
            assert attn._pick_blocks(1024) == min(timings, key=timings.get)
            # already-tuned length: no re-measure
            assert attn.autotune_blocks(1024, interpret=True) == {}
            # measured-table length: never re-measured
            assert attn.autotune_blocks(4608, interpret=True) == {}
        finally:
            attn._TUNED_BLOCKS.clear()

    def test_autotune_rescores_top2_best_of_two(self, monkeypatch):
        """Noise-hardening (VERDICT r4 weak #5): the top-2 candidates are measured
        twice and scored best-of-2, so a winner whose single first run was
        noise-inflated still wins on the re-measure."""
        attn = self._clear()
        # candidate_blocks(1024) → [(1024,1024), (512,1024)]; scripted timings:
        # first pass has B ahead of A, the re-measure reveals A is truly faster.
        script = {
            (1024, 1024, False): [1.30e-3, 1.00e-3],
            (512, 1024, False): [1.20e-3, 1.40e-3],
            (512, 1024, True): [1.50e-3],
        }
        calls = {}

        def fake_benchmark(l, blocks, *a, **kw):
            cand = attn._norm_entry(blocks)
            calls[cand] = calls.get(cand, 0) + 1
            return script[cand][calls[cand] - 1]

        monkeypatch.setattr(attn, "benchmark_blocks", fake_benchmark)
        try:
            timings = attn.autotune_blocks(1024, interpret=True)
            # top-2 measured twice, the const probe once
            assert calls == {(1024, 1024, False): 2, (512, 1024, False): 2,
                             (512, 1024, True): 1}
            # best-of-2 scores: A=1.00, B=1.20 → A wins with a 0.20ms margin
            assert attn._pick_blocks(1024) == (1024, 1024, False)
            assert timings[(1024, 1024, False)] == 1.00e-3
            assert abs(attn._TUNED_MARGINS[1024] - 0.20) < 1e-6
        finally:
            self._clear()

    def test_sub_noise_margin_cannot_evict_persisted_entry(self):
        """A winner inside the ±0.15ms noise floor never replaces a DIFFERENT
        persisted entry; a clear winner does (VERDICT r4 weak #5)."""
        attn = self._clear()
        try:
            attn.register_tuned_blocks(4000, (1000, 2000))
            attn.register_tuned_blocks(4000, (1000, 1000), margin_ms=0.05)
            assert attn._pick_blocks(4000) == (1000, 2000, False)  # refused
            attn.register_tuned_blocks(4000, (1000, 1000), margin_ms=0.30)
            assert attn._pick_blocks(4000) == (1000, 1000, False)  # clear win
            # re-registering the SAME entry records the margin regardless
            attn.register_tuned_blocks(4000, (1000, 1000), margin_ms=0.01)
            assert attn._TUNED_MARGINS[4000] == 0.01
            # rect table: same contract
            attn.register_tuned_blocks_rect(512, 1024, (256, 512))
            attn.register_tuned_blocks_rect(512, 1024, (512, 512), margin_ms=0.02)
            assert attn._pick_blocks_rect(512, 1024) == (256, 512, False)
            attn.register_tuned_blocks_rect(512, 1024, (512, 512), margin_ms=1.0)
            assert attn._pick_blocks_rect(512, 1024) == (512, 512, False)
        finally:
            attn._TUNED_BLOCKS.clear()
            attn._TUNED_BLOCKS_RECT.clear()
            attn._TUNED_MARGINS.clear()
            attn._TUNED_MARGINS_RECT.clear()

    def test_margins_roundtrip_persistence(self, tmp_path):
        attn = self._clear()
        path = str(tmp_path / "attn_blocks.json")
        try:
            attn.register_tuned_blocks(4004, (572, 1001), margin_ms=0.42)
            attn.register_tuned_blocks(4040, (1010, 2020, True))  # no margin: legacy
            attn.save_tuned_blocks(path)
            attn._TUNED_BLOCKS.clear()
            attn._TUNED_MARGINS.clear()
            assert attn.load_tuned_blocks(path) == 2
            assert attn._TUNED_MARGINS == {4004: 0.42}
            assert attn._pick_blocks(4004) == (572, 1001, False)
            assert attn._pick_blocks(4040) == (1010, 2020, True)
        finally:
            self._clear()

    def test_const_probes_respect_vmem_budget(self):
        """Advisor r4: at extreme joint lengths (UI allows 4096×4096 → L≈66k) the
        whole f32 rope tables cannot be VMEM-resident — the const probes must be
        skipped, not crash warmup."""
        from flux_fp8_api_tpu.ops.attention import _const_probes

        # serving-scale shape: both probes present (winner-const + full-kv)
        probes = _const_probes((768, 1536, False), 4608, 4608, 128)
        assert probes == [(768, 1536, True), (768, 4608, True)]
        # 4096×4096 UI request: (lq+lkv)·d·4·2 ≈ 135MB > 80MB budget → no probes
        assert _const_probes((512, 512, False), 66048, 66048, 128) == []

    def test_safe_benchmark_treats_compile_failure_as_inf(self, monkeypatch):
        import flux_fp8_api_tpu.ops.attention as attn

        class XlaRuntimeError(Exception):
            pass

        def boom(*a, **kw):
            raise XlaRuntimeError("Mosaic failed: scoped vmem limit exceeded")

        monkeypatch.setattr(attn, "benchmark_blocks", boom)
        assert attn._safe_benchmark(1024, (512, 512), 2, 64, jnp.float32, 2, True) == float("inf")

        def real_bug(*a, **kw):
            raise TypeError("wrong arity")

        monkeypatch.setattr(attn, "benchmark_blocks", real_bug)
        with pytest.raises(TypeError):
            attn._safe_benchmark(1024, (512, 512), 2, 64, jnp.float32, 2, True)


class TestMeshLocalAutotuner:
    """Mesh-aware autotune (VERDICT r3 weak #3): per-shard (post-shard_map) kernel
    shapes get their own measured block table instead of silently reusing the
    single-chip entries."""

    def _clear(self):
        import flux_fp8_api_tpu.ops.attention as attn

        attn._TUNED_BLOCKS.clear()
        attn._TUNED_BLOCKS_RECT.clear()
        attn._TUNED_MARGINS.clear()
        attn._TUNED_MARGINS_RECT.clear()
        return attn

    def test_rect_candidates_divide_or_mask(self):
        from flux_fp8_api_tpu.ops.attention import candidate_blocks_rect

        for lq, lkv in ((2304, 4608), (1696, 3392), (4608, 4608), (1024, 4096)):
            cands = candidate_blocks_rect(lq, lkv)
            assert cands, (lq, lkv)
            for bq, bkv in cands:
                assert bq % 8 == 0 and bkv % 8 == 0
                assert (lq % bq == 0 and lkv % bkv == 0) or (bq, bkv) == (512, 512)
        # nothing divides → masked fallback
        assert candidate_blocks_rect(4099, 8198) == [(512, 512)]

    def test_local_entries_win_over_heuristics_and_tables(self):
        attn = self._clear()
        try:
            # rect: heuristic divisors before tuning
            assert attn._pick_blocks_rect(2304, 4608) == (768, 1536, False)
            attn.register_tuned_blocks_rect(2304, 4608, (576, 2304))
            assert attn._pick_blocks_rect(2304, 4608) == (576, 2304, False)
            # square local shape: a rect entry beats even the hand-measured table
            # (it was measured at the LOCAL head count, which the table wasn't)
            assert attn._pick_blocks_rect(4608, 4608) == (768, 1536, False)
            attn.register_tuned_blocks_rect(4608, 4608, (1152, 1152))
            assert attn._pick_blocks_rect(4608, 4608) == (1152, 1152, False)
        finally:
            self._clear()

    def test_autotune_local_measures_and_registers(self):
        attn = self._clear()
        try:
            timings = attn.autotune_blocks_local(
                512, 1024, folded_heads=2, head_dim=64, dtype=jnp.float32,
                iters=2, interpret=True,
            )
            from flux_fp8_api_tpu.ops.attention import _norm_entry

            normed = {_norm_entry(c) for c in attn.candidate_blocks_rect(512, 1024)}
            assert normed <= set(timings)
            assert 1 <= sum(1 for c in timings if c[2]) <= 2
            assert all(t > 0 for t in timings.values())
            assert attn._pick_blocks_rect(512, 1024) == min(timings, key=timings.get)
            # already-registered shape: no re-measure
            assert attn.autotune_blocks_local(512, 1024, 2, interpret=True) == {}
        finally:
            self._clear()

    def test_persistence_roundtrip_with_rect_entries(self, tmp_path):
        attn = self._clear()
        path = str(tmp_path / "attn_blocks.json")
        try:
            attn.register_tuned_blocks(4000, (1000, 2000))
            attn.register_tuned_blocks_rect(2304, 4608, (576, 2304))
            attn.save_tuned_blocks(path)
            self._clear()
            assert attn.load_tuned_blocks(path) == 2
            assert attn._pick_blocks(4000) == (1000, 2000, False)
            assert attn._pick_blocks_rect(2304, 4608) == (576, 2304, False)
        finally:
            self._clear()


class TestBareTwoDotCeilingKernel:
    """The ceiling-measurement kernel in ablate_attention.py must actually compute
    (QK^T)V with the serving kernel's blocking — otherwise its time bounds nothing.
    (The PERF.md round-5 MXU-ceiling table is only meaningful if this holds.)"""

    def test_matches_einsum(self):
        from ablate_attention import _bare_two_dot

        h, l, d = 2, 256, 32
        ks = jax.random.split(jax.random.PRNGKey(3), 3)
        q = jax.random.normal(ks[0], (h, l, d), jnp.bfloat16)
        k = jax.random.normal(ks[1], (h, l, d), jnp.bfloat16)
        v = jax.random.normal(ks[2], (h, l, d), jnp.bfloat16)
        out = _bare_two_dot(q, k, v, block_q=128, block_kv=128, interpret=True)
        s = jnp.einsum("hqd,hkd->hqk", q.astype(jnp.float32), k.astype(jnp.float32))
        ref = jnp.einsum("hqk,hkd->hqd", s.astype(jnp.bfloat16).astype(jnp.float32),
                         v.astype(jnp.float32))
        assert out.shape == (h, l, d)
        err = jnp.max(jnp.abs(out.astype(jnp.float32) - ref)) / jnp.max(jnp.abs(ref))
        assert float(err) < 0.05  # bf16 dot accumulation vs f32 einsum
