"""Max-free qk-norm attention kernel: correctness vs naive softmax (interpret mode
on CPU; the compiled kernel runs in the TPU benchmarks)."""

import jax
import jax.numpy as jnp
import numpy as np

from flux_fp8_api_tpu.ops.attention_kernel import qknorm_attention


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
