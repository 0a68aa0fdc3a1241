"""Core elementwise / normalization math for the FLUX DiT, as pure jnp functions.

Each function documents the reference behavior it reproduces (file:line in
/root/reference) and any deliberate TPU-side deviation.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def timestep_embedding(
    t: jnp.ndarray, dim: int, max_period: int = 10000, time_factor: float = 1000.0
) -> jnp.ndarray:
    """Sinusoidal timestep embedding (reference ``modules/flux_model.py:95-116``).

    Args:
      t: (N,) fractional timesteps.
    Returns:
      (N, dim) fp32 embeddings: [cos(args), sin(args)] with zero-pad for odd dim.
    """
    t = time_factor * t.astype(jnp.float32)
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = t[:, None] * freqs[None]
    embedding = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        embedding = jnp.concatenate(
            [embedding, jnp.zeros_like(embedding[:, :1])], axis=-1
        )
    return embedding


def rms_norm(x: jnp.ndarray, scale: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """RMSNorm computed in fp32 then cast back (reference ``flux_model.py:158-164``).

    The fp32 compute is load-bearing for fp8 fidelity — q/k norms feed attention and the
    reference deliberately upcasts (`x.float()`).
    """
    orig_dtype = x.dtype
    x32 = x.astype(jnp.float32)
    var = jnp.mean(x32 * x32, axis=-1, keepdims=True)
    normed = x32 * jax.lax.rsqrt(var + eps)
    return (normed * scale.astype(jnp.float32)).astype(orig_dtype)


def layer_norm(x: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """LayerNorm with no affine params (reference uses
    ``nn.LayerNorm(hidden, elementwise_affine=False, eps=1e-6)`` throughout the DiT,
    e.g. flux_model.py:282,459). Computed in fp32 for stability, cast back.
    """
    orig_dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    return ((x32 - mean) * jax.lax.rsqrt(var + eps)).astype(orig_dtype)


def gelu_tanh(x: jnp.ndarray) -> jnp.ndarray:
    """GELU with tanh approximation (reference ``nn.GELU(approximate="tanh")``,
    flux_model.py:300,462)."""
    return jax.nn.gelu(x, approximate=True)


def silu(x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.silu(x)


def modulate(x: jnp.ndarray, shift: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    """adaLN modulation ``(1 + scale) * x + shift`` (reference flux_model.py:367,371).

    shift/scale are (B, 1, D) per-sample vectors broadcast over the sequence.
    """
    return (1.0 + scale) * x + shift


def clamp_policy(x: jnp.ndarray, do_clamp: bool) -> jnp.ndarray:
    """fp16-only ±32000 activation clamp (reference flux_model.py:397-399,481-483).

    Applied at double/single block outputs when the compute dtype is float16; bf16 runs
    unclamped (reference README.md:90-93).
    """
    if do_clamp:
        return jnp.clip(x, -32000.0, 32000.0)
    return x
