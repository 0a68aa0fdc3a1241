"""Custom Pallas attention kernel exploiting FLUX's qk-normalization.

Generic flash attention is VPU-bound at FLUX shapes (head_dim 128, 4.6k tokens): the
running-max tracking and accumulator rescaling cost more vector ops than the exp
itself, capping JAX's flash/splash kernels at ~24% of the chip's matmul roofline here.

FLUX applies RMSNorm to q and k per head (flux_model.py:167-176) before rope (an
orthogonal rotation), so per-head |q|₂ = |k|₂ = √d · |scale-weights| and the logits
``q·k / √d`` are bounded by √d·c² (≈ tens for learned scales c of O(1)) — comfortably
inside f32/bf16 exp range. That makes the *max-free* online softmax safe:

    p = exp(s − SHIFT);  out = Σ p·v / Σ p

with a constant SHIFT (any constant cancels in the normalization — it only controls
the magnitude range). No running max, no accumulator rescaling: one exp + one add per
logit of VPU work, the rest is MXU.

Guard rail: the max-free trick is only safe while qk-norm keeps |logit| below
``MAX_SAFE_LOGIT`` (exp(100 − SHIFT) is still finite in f32; beyond that exp overflows
to inf and the output goes NaN with no diagnostic). The bound is static in the
qk-norm *scale parameters* alone (|q|₂ ≤ √d·max|scale| whatever the qkv weights, rope
is orthogonal, and LoRA fuses touch only linears), so ``FluxPipeline`` checks
``models.flux.max_logit_bound`` once per checkpoint and auto-falls back to XLA
attention when it exceeds the safe bound. For measured (not bounded) logits, a stats
build of the kernel tracks ``max |logit|`` per (head, q-block) and
:func:`qknorm_attention_checked` raises loudly when exceeded. The serving kernel
stays max-free (zero extra VPU work). For non-qk-normed use cases, fall back to
``ops.attention.attention_core``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# exp(s - SHIFT): keeps p ≤ e^(bound-SHIFT); with |s| ≲ 60 this stays finite in f32
# while the normalization cancels the constant exactly. The underflow side (a q row
# whose logits ALL sit below SHIFT-88 → den 0) is handled by the den clamp in the
# kernel epilogue: such rows emit 0, never NaN.
SHIFT = 20.0

# f32 exp overflows past ~88; with SHIFT subtracted first, |logit| ≤ 100 leaves an
# 8-unit margin. Checked wrappers raise above this.
MAX_SAFE_LOGIT = 100.0


def _rope_rotate(x_ref, cos, sin, out_dtype):
    """Half-split rope on a (block, d) tile, fully in VMEM registers (see ops/rope.py
    for the layout argument). f32 rotate, cast to the MXU feed dtype."""
    x = x_ref[0].astype(jnp.float32)
    half = x.shape[-1] // 2
    rotated = jnp.concatenate([-x[:, half:], x[:, :half]], axis=1)
    return (x * cos + rotated * sin).astype(out_dtype)


def _attn_kernel(
    *refs, sm_scale: float, block_q: int, block_kv: int, valid_len: int,
    track_max: bool = False, fuse_rope: bool = False, ablate_exp: bool = False,
    const_tables: bool = False,
):
    # refs = (q, k, v, [cos_q, sin_q, cos_k, sin_k,] o, [m,] acc, den)
    q_ref, k_ref, v_ref = refs[:3]
    idx = 3
    if fuse_rope:
        cos_q_ref, sin_q_ref, cos_k_ref, sin_k_ref = refs[idx : idx + 4]
        idx += 4
    o_ref = refs[idx]
    m_ref = refs[idx + 1] if track_max else None
    acc_ref, den_ref = refs[-2], refs[-1]
    kv_idx = pl.program_id(2)

    @pl.when(kv_idx == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        den_ref[:] = jnp.zeros_like(den_ref)
        if track_max:
            m_ref[:] = jnp.zeros_like(m_ref)

    if fuse_rope:
        if const_tables:
            # whole-table refs, fetched ONCE per call (constant index map): slice
            # this step's rows in VMEM. Per-block table specs re-DMA (block, d)
            # f32 cos/sin from HBM on every grid step. Whether residency wins is
            # SHAPE-DEPENDENT (−0.15ms at L=2816 on top of the full-kv-block win,
            # a loss at L=1536/2560) — the block tables / autotuner pick it per
            # shape from measurement (docs/PERF.md round-4 const-tables sweep).
            q_row = pl.program_id(1) * block_q
            kv_row = kv_idx * block_kv
            cq = cos_q_ref[pl.ds(q_row, block_q), :]
            sq = sin_q_ref[pl.ds(q_row, block_q), :]
            ck = cos_k_ref[pl.ds(kv_row, block_kv), :]
            sk = sin_k_ref[pl.ds(kv_row, block_kv), :]
        else:
            cq, sq = cos_q_ref[:], sin_q_ref[:]
            ck, sk = cos_k_ref[:], sin_k_ref[:]
        q = _rope_rotate(q_ref, cq, sq, q_ref.dtype)
        k = _rope_rotate(k_ref, ck, sk, k_ref.dtype)
    else:
        q = q_ref[0]  # (bq, d)
        k = k_ref[0]  # (bkv, d)
    v = v_ref[0]  # (bkv, d)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    if track_max:
        # max |logit| over this (q-block, kv-block) tile; pad columns contribute 0.
        # Broadcast into a full (8, 128) register tile — Mosaic VMEM blocks must tile
        # (8, 128); the wrapper reduces it back to one scalar.
        mval = jnp.max(jnp.abs(s)) * abs(sm_scale)
        m_ref[0, 0] = jnp.maximum(m_ref[0, 0], jnp.full((8, 128), mval, jnp.float32))
    if ablate_exp:
        # ceiling-measurement build (docs/PERF.md ablation): identical kernel with
        # the transcendental removed — same matmuls, masks, accumulators, epilogue.
        # Wall-clock delta vs the exp build IS the transcendental cost; NEVER
        # serve with this (outputs are not a softmax).
        p = s * sm_scale - SHIFT  # (bq, bkv) f32
    else:
        p = jnp.exp(s * sm_scale - SHIFT)  # (bq, bkv) f32

    def accumulate(p):
        den_ref[:] += jnp.sum(p, axis=1, keepdims=True)
        acc_ref[:] += jax.lax.dot_general(
            p.astype(jnp.bfloat16), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    if valid_len % block_kv != 0:
        # non-block-aligned sequence: only the tail block pays the pad-column mask
        tail_idx = valid_len // block_kv

        @pl.when(kv_idx == tail_idx)
        def _():
            col = jax.lax.broadcasted_iota(jnp.int32, p.shape, 1) + kv_idx * block_kv
            accumulate(jnp.where(col < valid_len, p, 0.0))

        @pl.when(kv_idx != tail_idx)
        def _():
            accumulate(p)
    else:
        accumulate(p)

    @pl.when(kv_idx == pl.num_programs(2) - 1)
    def _():
        # den can underflow to 0 when EVERY logit in a q row sits below SHIFT-88
        # (exp flushes to zero) — a one-sided |logit| bound doesn't exclude that.
        # Clamp so such rows produce 0 (acc is 0 too) instead of 0/0 = NaN.
        o_ref[0] = (acc_ref[:] / jnp.maximum(den_ref[:], 1e-30)).astype(o_ref.dtype)


def _vmem_estimate(
    lq: int, lkv: int, block_q: int, block_kv: int, d: int,
    const_tables: bool, fuse_rope: bool,
) -> int:
    """Rough per-core VMEM bytes for one kernel instance: rope tables (whole,
    fp32, when const; double-buffered per-block otherwise), double-buffered
    q/k/v/out bf16 blocks, the f32 scores tile, and the f32 accumulator scratch.
    Used only to decide whether Mosaic's default scoped-VMEM limit suffices —
    intentionally conservative (2× buffering on every streamed operand)."""
    est = 0
    if fuse_rope:
        if const_tables:
            est += (lq + lkv) * d * 4 * 2  # whole cos/sin, fetched once
        else:
            est += (block_q + block_kv) * d * 4 * 2 * 2  # per-step, double-buffered
    est += (block_q + 2 * block_kv) * d * 2 * 2  # q/k/v blocks, double-buffered
    est += block_q * d * 2 * 2  # out block
    est += block_q * block_kv * 4  # scores tile (f32)
    est += block_q * d * 4 + block_q * 4  # acc + den scratch
    return est


@functools.partial(
    jax.jit,
    static_argnames=(
        "sm_scale", "block_q", "block_kv", "interpret", "return_max_logit",
        "ablate_exp", "const_tables",
    ),
)
def qknorm_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    sm_scale: float,
    block_q: int = 512,
    block_kv: int = 1024,
    interpret: bool = False,
    return_max_logit: bool = False,
    cos: jnp.ndarray = None,
    sin: jnp.ndarray = None,
    cos_q: jnp.ndarray = None,
    sin_q: jnp.ndarray = None,
    ablate_exp: bool = False,
    const_tables: bool = None,
) -> jnp.ndarray:
    """(H, Lq, D) q × (H, Lkv, D) k/v → (H, Lq, D) attention output (batch folded
    into heads). Lq == Lkv in single-chip serving; they differ under sequence/context
    parallelism, where each device holds a q shard against the full kv.

    Lengths that don't divide the blocks are zero-padded; the kernel masks the padded
    key columns in the tail kv block (padded *query* rows produce garbage rows that
    are sliced away — they never mix into valid outputs).

    ``cos``/``sin`` ((Lkv, D) fp32, half-split layout — ops/rope.py) fuse the RoPE
    rotation into the kernel: q/k tiles rotate in VMEM registers as they stream in,
    removing the separate XLA rope pass (two full q/k HBM round trips per attention).
    ``cos_q``/``sin_q`` ((Lq, D)) override the q-side tables when the q rows cover
    different positions than the kv rows (sequence-parallel shards); they default to
    ``cos``/``sin``. The rotation recomputes per (q-block, kv-block) revisit — a few
    µs of VPU against the exp-bound softmax.

    ``return_max_logit=True`` selects the stats build, which additionally returns the
    scalar ``max |q·k·sm_scale|`` over the whole attention — the guard-rail input for
    :func:`qknorm_attention_checked`. The serving build carries no tracking cost.

    ``ablate_exp=True`` is the ceiling-measurement build (exp replaced by identity,
    everything else byte-identical): its wall-clock delta vs the serving build is the
    VPU transcendental cost, the remainder above the matmul roofline is scheduling/
    memory slack. Measurement only — outputs are not a softmax.
    """
    h, lq, d = q.shape
    lkv = k.shape[1]
    fuse_rope = cos is not None
    if fuse_rope:
        cos_q = cos if cos_q is None else cos_q
        sin_q = sin if sin_q is None else sin_q
    valid_q = lq
    valid_len = lkv
    pad_q = (-lq) % block_q
    if pad_q:
        zeros = jnp.zeros((h, pad_q, d), q.dtype)
        q = jnp.concatenate([q, zeros], axis=1)
        if fuse_rope:
            cos_q = jnp.concatenate([cos_q, jnp.ones((pad_q, d), cos_q.dtype)], axis=0)
            sin_q = jnp.concatenate([sin_q, jnp.zeros((pad_q, d), sin_q.dtype)], axis=0)
        lq = lq + pad_q
    pad_kv = (-lkv) % block_kv
    if pad_kv:
        zeros = jnp.zeros((h, pad_kv, d), k.dtype)
        k = jnp.concatenate([k, zeros], axis=1)
        v = jnp.concatenate([v, zeros], axis=1)
        if fuse_rope:
            # identity rotation on pad rows (their k are zero anyway)
            cos = jnp.concatenate([cos, jnp.ones((pad_kv, d), cos.dtype)], axis=0)
            sin = jnp.concatenate([sin, jnp.zeros((pad_kv, d), sin.dtype)], axis=0)
        lkv = lkv + pad_kv
    grid = (h, lq // block_q, lkv // block_kv)
    # const_tables=True keeps the whole rope tables VMEM-resident (fetched once
    # per call — constant index map) instead of streaming (block, d) slices per
    # grid step. Measured shape-dependent on v5e: part of the −36% win at L=2816
    # (with a full-kv block), a LOSS at L=1536/2560 — so the default is streamed
    # and the per-shape measured tables / warmup autotuner (ops/attention.py)
    # decide. Callers passing explicit blocks get the conservative default too.
    if const_tables is None:
        const_tables = False
    const_tables = bool(fuse_rope and const_tables)
    kern = functools.partial(
        _attn_kernel,
        sm_scale=sm_scale,
        block_q=block_q,
        block_kv=block_kv,
        valid_len=valid_len,
        track_max=return_max_logit,
        fuse_rope=fuse_rope,
        ablate_exp=ablate_exp,
        const_tables=const_tables,
    )
    in_specs = [
        pl.BlockSpec((1, block_q, d), lambda h, i, j: (h, i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_kv, d), lambda h, i, j: (h, j, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_kv, d), lambda h, i, j: (h, j, 0), memory_space=pltpu.VMEM),
    ]
    operands = [q, k, v]
    if fuse_rope:
        if const_tables:
            in_specs += [
                pl.BlockSpec((lq, d), lambda h, i, j: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((lq, d), lambda h, i, j: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((lkv, d), lambda h, i, j: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((lkv, d), lambda h, i, j: (0, 0), memory_space=pltpu.VMEM),
            ]
        else:
            in_specs += [
                pl.BlockSpec((block_q, d), lambda h, i, j: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((block_q, d), lambda h, i, j: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((block_kv, d), lambda h, i, j: (j, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((block_kv, d), lambda h, i, j: (j, 0), memory_space=pltpu.VMEM),
            ]
        operands += [
            cos_q.astype(jnp.float32), sin_q.astype(jnp.float32),
            cos.astype(jnp.float32), sin.astype(jnp.float32),
        ]
    out_shape = [jax.ShapeDtypeStruct((h, lq, d), q.dtype)]
    out_specs = [
        pl.BlockSpec((1, block_q, d), lambda h, i, j: (h, i, 0), memory_space=pltpu.VMEM)
    ]
    if return_max_logit:
        # stats ride a full (8, 128) VMEM tile per (head, q-block) — Mosaic's minimum
        # f32 tile; ~4KB/head of waste, reduced to one scalar by the wrapper
        out_shape.append(jax.ShapeDtypeStruct((h, lq // block_q, 8, 128), jnp.float32))
        out_specs.append(
            pl.BlockSpec((1, 1, 8, 128), lambda h, i, j: (h, i, 0, 0), memory_space=pltpu.VMEM)
        )
    res = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((block_q, d), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            # Mosaic's default scoped-VMEM limit is 16MB; resident rope tables
            # (~9.4MB f32 at L=4608) and/or full-kv blocks can exceed it. v5e has
            # 128MB VMEM; 80MB leaves headroom for XLA's buffers around the call.
            # Raised ONLY when the estimate below says the default won't fit: a
            # larger limit changes Mosaic's double-buffering decisions and was
            # measured to cost up to +60% on small configs that fit the default
            # (L=1536 const-tables: 1.83ms at 80MB vs 1.13 streamed at default).
            **(
                {"vmem_limit_bytes": 80 * 1024 * 1024}
                if _vmem_estimate(lq, lkv, block_q, block_kv, d, const_tables, fuse_rope)
                > 14 * 1024 * 1024
                else {}
            ),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * h * lq * lkv * d,
            bytes_accessed=h * (lq + lkv) * d * 4,
            transcendentals=0 if ablate_exp else h * lq * lkv,
        ),
        interpret=interpret,
    )(*operands)
    if return_max_logit:
        out, m = res
        out = out[:, :valid_q] if pad_q else out
        return out, jnp.max(m)
    out = res[0]
    return out[:, :valid_q] if pad_q else out


def qknorm_attention_checked(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    sm_scale: float,
    block_q: int = 512,
    block_kv: int = 1024,
    interpret: bool = False,
) -> jnp.ndarray:
    """Guard-railed wrapper: runs the stats build and raises ``FloatingPointError``
    when ``max |logit|`` exceeds ``MAX_SAFE_LOGIT`` (the regime where the max-free
    softmax would overflow exp to inf → NaN images with no diagnostic).

    This fetches a scalar per call (host sync), so it is for validation moments —
    after a LoRA fuse or loading an unusual checkpoint — not the serving hot loop.
    """
    out, m = qknorm_attention(
        q, k, v, sm_scale,
        block_q=block_q, block_kv=block_kv, interpret=interpret, return_max_logit=True,
    )
    m_val = float(m)
    if not (m_val <= MAX_SAFE_LOGIT):
        raise FloatingPointError(
            f"qk-norm attention logits reached |{m_val:.1f}| > safe bound "
            f"{MAX_SAFE_LOGIT}: the max-free softmax would overflow. Check qk-norm "
            "scale weights (LoRA fuse / checkpoint), or fall back to "
            "ops.attention.attention_core."
        )
    return out
