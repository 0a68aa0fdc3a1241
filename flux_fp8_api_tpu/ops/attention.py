"""Joint-sequence attention for the FLUX DiT.

Replaces the reference's RoPE + ``F.scaled_dot_product_attention`` pair
(``modules/flux_model.py:41-45``) with a TPU-native stack:

- layout is BTNH (batch, seq, heads, head_dim) end-to-end — the MXU-friendly layout JAX
  attention kernels expect, avoiding the reference's permute-to-BNLH-and-back dance;
- RoPE is applied from precomputed fp32 cos/sin tables (see :mod:`.rope`);
- the attention core dispatches to a Pallas flash kernel on TPU (tiled online-softmax,
  no L×L materialization) and to XLA SDPA elsewhere (CPU tests).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .rope import apply_rope


def _sdpa_xla(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Reference-semantics SDPA in fp32 softmax, BTNH layout.

    float16 upcasts to fp32 (XLA:CPU lacks an f16×f16→f32 dot; fp32 softmax also
    strictly dominates the reference's fp16-SDPA numerics)."""
    dtype = q.dtype
    if dtype == jnp.float16:
        q, k, v = q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32)
    return jax.nn.dot_product_attention(q, k, v, implementation="xla").astype(dtype)


# Measured-fastest (block_q, block_kv, const_tables) per joint sequence length —
# TPU v5e, rope fused, 24 folded heads (ablations in CLAUDE.md round-2 notes +
# round-4 const-tables sweep). The ranking is not monotone in block size (e.g. at
# L=2816 square 704² beats 704×1408, while at L=4608 rectangular 768×1536 beats
# 1152²), so the common serving shapes are pinned here. The third element picks
# whether the rope tables ride a constant index map (whole-table VMEM-resident,
# fetched once per call) or stream per grid step — also shape-dependent: the
# resident tables bought −0.6 ms/call at L=2816 but lost slightly at L=3392.
_QKNORM_BLOCKS_MEASURED = {
    4608: (768, 1536, False),  # 1024×1024 + 512 txt  2.61 ms (full-kv const (1536,4608,T): 2.69)
    3392: (848, 1696, False),  # 1024×720  + 512      1.94 ms (const probes 1.97-2.16: all lose)
    2816: (1408, 2816, True),  # 768×768   + 512      1.67 ms (was 2.62 @(704,704) streamed −36%;
                               #   full-kv block kills the per-q-block k/v re-DMA −0.76ms,
                               #   resident tables another −0.15; 2816² measured 1.63 = tie,
                               #   half-q keeps the f32 scores tile at 16MB not 32)
    4352: (1088, 2176, False), # 1024×1024 + 256 (schnell)  2.60 (full-kv const 2.69)
    2560: (640, 1280, False),  # 768×768   + 256 (schnell)  1.50 (full-kv probes 1.70-1.72)
    1536: (512, 1536, False),  # 512×512   + 512            1.13 (const 1.33)
    # UI presets, autotuner-measured on v5e (round 3 + round-4 const sweep):
    4464: (744, 4464, True),   # 832×1216/1216×832 + 512    2.81 ms (streamed (744,1488): 3.09)
    4544: (1136, 4544, True),  # 1344×768  + 512            2.79 ms (streamed (1136,2272): 2.95)
}


# Runtime-tuned (block_q, block_kv) per joint seq — filled by
# :func:`autotune_blocks` at pipeline warmup for shapes the measured table doesn't
# pin (e.g. UI presets 832×1216 → L=4464), persisted beside the XLA compile cache
# (pipeline.py). The hand-measured table stays authoritative where it has entries.
_TUNED_BLOCKS = {}

# Mesh-local tuned blocks, keyed (lq, lkv) — filled by :func:`autotune_blocks_local`
# at MESH warmup (pipeline.py): under shard_map the kernel traces with per-device
# shapes (lq = l/sp, fewer folded heads), where the single-chip tables don't apply.
# Entries here win over everything: they only exist when this process measured them
# at exactly these local shapes.
_TUNED_BLOCKS_RECT = {}

# Winning margin (ms, runner-up minus winner, best-of-2 scored) recorded beside each
# autotuned entry, persisted in attn_blocks.json as the entry's 4th element. A margin
# below NOISE_FLOOR_MS means the pick is within measurement noise — such a winner
# never evicts a previously persisted different entry (see register_tuned_blocks).
_TUNED_MARGINS = {}
_TUNED_MARGINS_RECT = {}

# Only within-run deltas above this are trustworthy (CLAUDE.md noise rules: per-call
# run-to-run noise ~±0.1ms; cross-run ±0.2-0.4ms — the autotuner always compares
# within one process, so the within-run floor applies).
NOISE_FLOOR_MS = 0.15


def _norm_entry(blocks):
    """(bq, bkv[, const]) → canonical (bq, bkv, const) 3-tuple (const defaults
    False — the behavior every pre-round-4 persisted table encoded)."""
    const = bool(blocks[2]) if len(blocks) > 2 else False
    return int(blocks[0]), int(blocks[1]), const


def register_tuned_blocks(l: int, blocks, margin_ms: float = None) -> None:
    """Register an autotuned entry. When ``margin_ms`` is given and an entry for
    ``l`` already exists (e.g. loaded from a persisted attn_blocks.json), a
    DIFFERENT winner only replaces it when the margin clears NOISE_FLOOR_MS — a
    noise-lucky single run must not evict a previously persisted pick (VERDICT r4
    weak #5). Registrations without a margin (file loads, tests) always win."""
    l = int(l)
    new = _norm_entry(blocks)
    old = _TUNED_BLOCKS.get(l)
    if (
        old is not None and new != old
        and margin_ms is not None and margin_ms < NOISE_FLOOR_MS
    ):
        return
    _TUNED_BLOCKS[l] = new
    if margin_ms is not None:
        _TUNED_MARGINS[l] = round(float(margin_ms), 3)


def register_tuned_blocks_rect(lq: int, lkv: int, blocks, margin_ms: float = None) -> None:
    key = (int(lq), int(lkv))
    new = _norm_entry(blocks)
    old = _TUNED_BLOCKS_RECT.get(key)
    if (
        old is not None and new != old
        and margin_ms is not None and margin_ms < NOISE_FLOOR_MS
    ):
        return
    _TUNED_BLOCKS_RECT[key] = new
    if margin_ms is not None:
        _TUNED_MARGINS_RECT[key] = round(float(margin_ms), 3)


def _pick_blocks(l: int):
    """(block_q, block_kv, const_tables) for a joint seq of length l: measured
    table first; then the warmup-autotuned table; else the largest square divisor
    ≤1280 (multiple of 8 — every ablated shape ran within a few % of its best
    there, and exact division beats tail masking); else (512, 512) + in-kernel
    tail masking. Untable'd shapes default const_tables=False (streamed rope
    tables) — the measured sweep shows residency is not uniformly a win."""
    if l in _QKNORM_BLOCKS_MEASURED:
        return _QKNORM_BLOCKS_MEASURED[l]
    if l in _TUNED_BLOCKS:
        return _TUNED_BLOCKS[l]
    for d in range(1280, 255, -8):
        if l % d == 0:
            return d, d, False
    return 512, 512, False


def _largest_divisor(l: int, cap: int) -> int:
    for d in range(cap, 7, -8):
        if l % d == 0:
            return d
    # nothing divides: fall back to an ALIGNED block — the kernel zero-pads q rows
    # and tail-masks kv columns, but an unaligned block shape itself would not tile
    # onto Mosaic's (8, 128) VMEM layout on real TPU
    return 512


def _pick_blocks_rect(lq: int, lkv: int):
    """(block_q, block_kv, const_tables) for a rectangular (sequence-parallel)
    call: q rows are a shard, kv is the full sequence. Mesh-local measured entries
    win; square lengths otherwise defer to the single-chip tables."""
    if (lq, lkv) in _TUNED_BLOCKS_RECT:
        return _TUNED_BLOCKS_RECT[(lq, lkv)]
    if lq == lkv:
        return _pick_blocks(lq)
    return _largest_divisor(lq, 768), _largest_divisor(lkv, 1536), False

# Test/dev escape hatch: take the Pallas branch in interpret mode off-TPU, so the
# shard_map tensor-parallel path is exercisable on the virtual CPU mesh (conftest).
# Production never sets this; on TPU the kernel compiles for real.
FORCE_PALLAS_INTERPRET = False


def attention_core(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    use_pallas: bool = True,
    cos: jnp.ndarray = None,
    sin: jnp.ndarray = None,
    shard_axes=None,
    seq_axis=None,
) -> jnp.ndarray:
    """Softmax attention over the full (txt+img) joint sequence, optionally with the
    RoPE rotation fused in.

    Dispatch: FLUX q/k are RMS-normed, so the max-free qk-norm Pallas kernel
    (ops/attention_kernel.py) is the default on TPU; falls back to XLA SDPA off-TPU.

    ROPE CONTRACT: when ``cos``/``sin`` are given, the fused TPU path applies batch
    row 0's tables to EVERY batch row — valid because FLUX's ``make_img_ids`` /
    ``make_txt_ids`` emit one shared positional grid per batch. A caller batching
    rows with *different* positional ids must pre-rotate with :func:`apply_rope`
    and call this without cos/sin (the off-TPU fallback below is per-row correct).

    Args:
      q, k, v: (B, L, N, H).
      cos, sin: optional rope tables — (B, L, 1, H) as built by the model, or
        already-2D (L, H).
      shard_axes: mesh-axis names (e.g. ``("dp", "tp")``) to shard the folded
        batch·head axis over via ``jax.shard_map``, keeping the Pallas kernel on the
        fast path under tensor parallelism (GSPMD cannot partition a custom call on
        its own). Requires an ambient mesh (``jax.set_mesh``) and B·N divisible by
        the product of the named axis sizes; each device runs the unmodified kernel
        on its local heads — attention has no cross-head math, so no collectives.
      seq_axis: mesh-axis name (e.g. ``"sp"``) for sequence/context parallelism: q is
        sharded along L, each device runs its q shard against the FULL kv (XLA
        all-gathers k/v at the shard_map boundary when they arrive L-sharded). The
        max-free kernel needs no online-softmax rebasing across shards because every
        device sees all keys for its queries. Composes with ``shard_axes``. Requires
        L divisible by the sp axis size.
    Returns:
      (B, L, N, H) in q.dtype.
    """
    b, l, n, h = q.shape
    sm_scale = 1.0 / (h**0.5)
    interpret = FORCE_PALLAS_INTERPRET
    if use_pallas and (jax.default_backend() == "tpu" or interpret):
        from .attention_kernel import qknorm_attention

        # fold batch into heads: (B, L, N, H) → (B*N, L, H)
        qh, kh, vh = (x.transpose(0, 2, 1, 3).reshape(b * n, l, h) for x in (q, k, v))
        cos2d = sin2d = None
        if cos is not None:
            cos2d = cos[0, :, 0, :] if cos.ndim == 4 else cos
            sin2d = sin[0, :, 0, :] if sin.ndim == 4 else sin

        def run(qh, kh, vh, cosq, sinq, cosk, sink):
            # block choice from LOCAL shapes: under shard_map the mapped fn traces
            # with per-device shards, so lq here is l/sp and lkv the full l
            bq, bkv, const = _pick_blocks_rect(qh.shape[1], kh.shape[1])
            rope = {}
            if cosk is not None:
                rope = dict(cos=cosk, sin=sink, cos_q=cosq, sin_q=sinq)
            return qknorm_attention(
                qh, kh, vh, sm_scale, block_q=bq, block_kv=bkv,
                const_tables=const, interpret=interpret, **rope,
            )

        if shard_axes or seq_axis:
            from jax.sharding import PartitionSpec as P

            head = tuple(shard_axes) if shard_axes else None
            q_spec = P(head, seq_axis)   # q (and out): heads over tp/dp, rows over sp
            kv_spec = P(head)            # kv: full sequence on every device
            qrope_spec, krope_spec = P(seq_axis), P()
            args = (qh, kh, vh)
            specs = (q_spec, kv_spec, kv_spec)
            if cos2d is None:
                fn = lambda q_, k_, v_: run(q_, k_, v_, None, None, None, None)
            else:
                fn = run
                args += (cos2d, sin2d, cos2d, sin2d)
                specs += (qrope_spec, qrope_spec, krope_spec, krope_spec)
            out = jax.shard_map(
                fn,
                in_specs=specs,
                out_specs=q_spec,
                check_vma=False,  # pallas_call outputs carry no vma info
            )(*args)
        else:
            out = run(qh, kh, vh, cos2d, sin2d, cos2d, sin2d)
        return out.reshape(b, n, l, h).transpose(0, 2, 1, 3).astype(q.dtype)
    if cos is not None:
        q, k = apply_rope(q, k, cos, sin)
    return _sdpa_xla(q, k, v)


def attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    cos: jnp.ndarray,
    sin: jnp.ndarray,
    use_pallas: bool = True,
    shard_axes=None,
    seq_axis=None,
) -> jnp.ndarray:
    """RoPE + SDPA + head merge (reference ``attention``, flux_model.py:41-45).

    On the TPU/Pallas path the rope rotation is *fused into the attention kernel*
    (SURVEY.md §2.3 row 2): q/k rotate in VMEM as tiles stream in, instead of a
    separate XLA pass writing rotated q/k back to HBM first. See
    :func:`attention_core` for the batch-shared rope-table contract.

    Args:
      q, k, v: (B, L, N, H).
      cos, sin: rope tables, (B, L, 1, H) or (L, H) — identical across batch rows.
    Returns:
      (B, L, N*H) — heads merged, matching the reference's reshape.
    """
    b, l, n, h = q.shape
    x = attention_core(
        q, k, v, use_pallas=use_pallas, cos=cos, sin=sin,
        shard_axes=shard_axes, seq_axis=seq_axis,
    )
    return x.reshape(b, l, n * h)


# --------------------------------------------------------------------- autotuning


def candidate_blocks(l: int, max_candidates: int = 4):
    """Candidate (block_q, block_kv) pairs for a joint seq the measured table
    doesn't pin, derived from the patterns that table's winners follow (square,
    and rectangular with kv 2-3× q — docs/PERF.md block-size ablations):
    the largest square divisor ≤1280, that divisor with a 2×/3× kv where they
    still divide ``l`` (kv ≤ 2304), a half-q rectangle, and the masked (512, 512)
    fallback when nothing divides. All multiples of 8 (Mosaic (8, 128) tiling)."""
    sq = next((d for d in range(1280, 255, -8) if l % d == 0), None)
    cands = []
    if sq is not None:
        cands.append((sq, sq))
        for mult in (2, 3):
            if sq * mult <= 2304 and l % (sq * mult) == 0:
                cands.append((sq, sq * mult))
        bq = next((d for d in range(768, 255, -8) if l % d == 0), None)
        if bq is not None and bq != sq:
            cands.append((bq, sq))
            if sq * 2 <= 2304 and l % (sq * 2) == 0:
                cands.append((bq, sq * 2))
    else:
        cands.append((512, 512))  # tail-masked
    return cands[:max_candidates]


def benchmark_blocks(
    l: int,
    blocks,
    folded_heads: int = 24,
    head_dim: int = 128,
    dtype=jnp.bfloat16,
    iters: int = 24,
    interpret: bool = False,
    lkv: int = None,
    fuse_rope: bool = True,
    ablate_exp: bool = False,
):
    """Per-call seconds for one (block_q, block_kv) candidate at joint seq ``l``,
    measured exactly the way the model calls the kernel (rope fused, folded
    batch·head axis). ``lkv`` (default ``l``) makes the call rectangular — the
    shape a sequence-parallel shard sees (q rows = local shard, kv = full seq).

    ``fuse_rope=False`` drops the in-kernel rotation, ``ablate_exp=True`` swaps the
    exp for identity (ceiling-measurement build) — the two knobs behind the
    docs/PERF.md exp-cost/slack ablation table.

    Tunnel-safe timing (CLAUDE.md): the per-dispatch floor through the axon tunnel
    is ~32ms, so the kernel runs ``iters`` times under one jitted ``lax.scan`` with
    the output carried back into q (nothing hoists), and the clock stops on a value
    fetch — ``block_until_ready`` is a no-op through the tunnel."""
    import time

    from .attention_kernel import qknorm_attention

    lkv = l if lkv is None else int(lkv)
    bq, bkv, const = _norm_entry(blocks)
    sm_scale = 1.0 / (head_dim**0.5)
    ks = jax.random.split(jax.random.PRNGKey(17), 3)
    q = jax.random.normal(ks[0], (folded_heads, l, head_dim), dtype)
    k = jax.random.normal(ks[1], (folded_heads, lkv, head_dim), dtype)
    v = jax.random.normal(ks[2], (folded_heads, lkv, head_dim), dtype)
    # rope tables: values are irrelevant to timing, unit-magnitude keeps exp safe
    def rope(n):
        t = jnp.linspace(0.0, 1.0, n * head_dim, dtype=jnp.float32).reshape(n, head_dim)
        return jnp.cos(t), jnp.sin(t)

    cos_q, sin_q = rope(l)
    cos_k, sin_k = rope(lkv)

    @jax.jit
    def bench(q, k, v, cos_q, sin_q, cos_k, sin_k):
        def body(carry, _):
            rope_kw = (
                dict(cos=cos_k, sin=sin_k, cos_q=cos_q, sin_q=sin_q)
                if fuse_rope
                else {}
            )
            o = qknorm_attention(
                carry, k, v, sm_scale, block_q=bq, block_kv=bkv,
                const_tables=const, interpret=interpret,
                ablate_exp=ablate_exp, **rope_kw,
            )
            return o.astype(carry.dtype), None

        out, _ = jax.lax.scan(body, q, None, length=iters)
        return out

    args = (q, k, v, cos_q, sin_q, cos_k, sin_k)
    float(jnp.sum(bench(*args)))  # compile + first run
    t0 = time.perf_counter()
    float(jnp.sum(bench(*args)))  # timed: value fetch ends the clock
    return (time.perf_counter() - t0) / iters


def _safe_benchmark(l, cand, folded_heads, head_dim, dtype, iters, interpret, lkv=None):
    """benchmark_blocks, but a probe that fails to COMPILE (e.g. a const-tables
    candidate whose resident rope tables bust the Mosaic VMEM limit at an extreme
    UI size) scores +inf instead of crashing warmup (advisor r4). Only Mosaic /
    XLA lowering errors are swallowed — real bugs (TypeError etc.) still raise."""
    try:
        return benchmark_blocks(
            l, cand, folded_heads, head_dim, dtype, iters, interpret, lkv=lkv
        )
    except Exception as e:  # jaxlib wraps Mosaic failures in XlaRuntimeError
        name = type(e).__name__
        if name in ("XlaRuntimeError", "MosaicError") or "RESOURCE_EXHAUSTED" in str(e):
            return float("inf")
        raise


def _const_probes(best, lq: int, lkv: int, head_dim: int):
    """VMEM-resident-rope-table probe candidates seeded from the streamed winner:
    the winner's blocks with const_tables=True, and its full-kv variant
    (block_kv = lkv — kills the per-q-block k/v re-DMA; the round-4 sweep's
    winners at L=2816/4464/4544 all have this shape). The effect is
    shape-dependent (−36% at L=2816, lose at L=3392/2560), so it must be
    measured, not assumed. Guards (advisor r4): a probe is skipped when its
    _vmem_estimate exceeds the 80MB raised Mosaic limit — at huge joint lengths
    (UI allows up to 4096×4096 → L≈66k) the whole (lq+lkv)·d f32 tables alone
    cannot be VMEM-resident, and the probe would crash warmup, not lose it."""
    from .attention_kernel import _vmem_estimate

    budget = 80 * 1024 * 1024
    probes = []
    if _vmem_estimate(lq, lkv, best[0], best[1], head_dim, True, True) <= budget:
        probes.append((best[0], best[1], True))
    # full-kv block must itself be Mosaic-tileable ((8, 128) VMEM tiles) and keep
    # the f32 scores tile from crowding VMEM (≤ 32MB of the 80MB raised limit)
    if (
        best[1] != lkv
        and lkv % 8 == 0
        and best[0] * lkv * 4 <= 32 * 1024 * 1024
        and _vmem_estimate(lq, lkv, best[0], lkv, head_dim, True, True) <= budget
    ):
        probes.append((best[0], lkv, True))
    return probes


def _rerank_top2(timings, measure, log=None):
    """Noise-harden the pick (VERDICT r4 weak #5): re-measure the two fastest
    candidates and score each best-of-2 (min of its runs — the minimum is the
    noise-robust statistic for a timing floor). A single noise-lucky run can no
    longer pin a loser. Returns (best, margin_ms, scores) where margin_ms is
    runner-up minus winner on the best-of-2 scores."""
    order = sorted(timings, key=timings.get)[:2]
    scores = dict(timings)
    for cand in order:
        if scores[cand] == float("inf"):
            continue
        t2 = measure(cand)
        scores[cand] = min(scores[cand], t2)
        if log is not None:
            log(f"autotune re-measure {cand} → {t2 * 1e3:.2f} ms/call (best-of-2)")
    best = min(scores, key=scores.get)
    rest = [v for c, v in scores.items() if c != best]
    margin_ms = (min(rest) - scores[best]) * 1e3 if rest else float("inf")
    return best, margin_ms, scores


def autotune_blocks(
    l: int,
    folded_heads: int = 24,
    head_dim: int = 128,
    dtype=jnp.bfloat16,
    iters: int = 24,
    interpret: bool = False,
    log=None,
):
    """Measure every candidate block pair for joint seq ``l`` on the current device
    and register the winner in the tuned table (the inductor-autotune analog,
    SURVEY.md §2.3 torch.compile row). The top-2 candidates are re-measured and
    scored best-of-2 before pinning, and the winning margin is recorded beside the
    entry (persisted to attn_blocks.json). Returns {(bq, bkv): seconds} for
    logging / persistence. No-op (returns existing entry) if ``l`` is already
    pinned."""
    if l in _QKNORM_BLOCKS_MEASURED or l in _TUNED_BLOCKS:
        return {}

    def measure(cand):
        return _safe_benchmark(l, cand, folded_heads, head_dim, dtype, iters, interpret)

    timings = {}
    for cand in candidate_blocks(l):
        cand = _norm_entry(cand)
        timings[cand] = measure(cand)
        if log is not None:
            log(f"autotune L={l}: blocks {cand} → {timings[cand] * 1e3:.2f} ms/call")
    best = min(timings, key=timings.get)
    for cand in _const_probes(best, l, l, head_dim):
        timings[cand] = measure(cand)
        if log is not None:
            log(f"autotune L={l}: blocks {cand} → {timings[cand] * 1e3:.2f} ms/call")
    best, margin_ms, scores = _rerank_top2(timings, measure, log)
    timings.update(scores)  # returned timings reflect the best-of-2 scores
    register_tuned_blocks(l, best, margin_ms=margin_ms)
    if log is not None:
        log(f"autotune L={l}: picked {best} (margin {margin_ms:.2f} ms)")
    return timings


def candidate_blocks_rect(lq: int, lkv: int, max_candidates: int = 4):
    """Candidate (block_q, block_kv) pairs for a mesh-local (post-shard_map) call:
    q rows are the sp shard (lq = l/sp), kv the full sequence. Derived from the
    single-chip winners' patterns (kv 1-3× q, exact division beats masking):
    the largest divisors of each side, a double-kv rectangle, and a half-q
    variant. Falls back to the masked (512, 512) when nothing divides."""
    dq = next((d for d in range(min(768, lq), 255, -8) if lq % d == 0), None)
    dkv = next((d for d in range(min(1536, lkv), 255, -8) if lkv % d == 0), None)
    if dq is None or dkv is None:
        return [(512, 512)]
    cands = [(dq, dkv)]
    if dkv * 2 <= 2304 and lkv % (dkv * 2) == 0:
        cands.append((dq, dkv * 2))
    half = next((d for d in range(min(512, lq), 255, -8) if lq % d == 0), None)
    if half is not None and half != dq:
        cands.append((half, dkv))
    if lq == lkv and (dq, dq) not in cands and lq % dq == 0:
        cands.append((dq, dq))
    return cands[:max_candidates]


def autotune_blocks_local(
    lq: int,
    lkv: int,
    folded_heads: int,
    head_dim: int = 128,
    dtype=jnp.bfloat16,
    iters: int = 24,
    interpret: bool = False,
    log=None,
):
    """Measure candidate block pairs at a MESH-LOCAL kernel shape and register the
    winner in the rect table (VERDICT r3 weak #3: single-chip timings don't
    transfer to shards — per-shard shapes get their own measurement).

    Under shard_map every device traces and runs the kernel at identical local
    shapes, and in the single-process GSPMD runtime one measurement IS the
    rendezvous — every shard picks the same winner because the pick happens once,
    at trace time, from this table. (A future multi-process runtime would broadcast
    the winner from process 0 before registering.) Returns {(bq, bkv): seconds};
    no-op when the shape is already registered."""
    if (lq, lkv) in _TUNED_BLOCKS_RECT:
        return {}

    def measure(cand):
        return _safe_benchmark(
            lq, cand, folded_heads, head_dim, dtype, iters, interpret, lkv=lkv
        )

    timings = {}
    for cand in candidate_blocks_rect(lq, lkv):
        cand = _norm_entry(cand)
        timings[cand] = measure(cand)
        if log is not None:
            log(
                f"autotune local ({lq}x{lkv}, {folded_heads} heads): "
                f"blocks {cand} → {timings[cand] * 1e3:.2f} ms/call"
            )
    # winner re-probed with VMEM-resident rope tables + its full-kv variant
    # (see autotune_blocks — the same shape-dependence applies to local shapes)
    best = min(timings, key=timings.get)
    for cand in _const_probes(best, lq, lkv, head_dim):
        timings[cand] = measure(cand)
        if log is not None:
            log(
                f"autotune local ({lq}x{lkv}, {folded_heads} heads): "
                f"blocks {cand} → {timings[cand] * 1e3:.2f} ms/call"
            )
    best, margin_ms, scores = _rerank_top2(timings, measure, log)
    timings.update(scores)  # returned timings reflect the best-of-2 scores
    register_tuned_blocks_rect(lq, lkv, best, margin_ms=margin_ms)
    if log is not None:
        log(f"autotune local ({lq}x{lkv}): picked {best} (margin {margin_ms:.2f} ms)")
    return timings


def save_tuned_blocks(path: str) -> None:
    """Persist the autotuned tables (JSON) — lives beside the XLA compile cache so a
    server restart reuses both the executables and the block choices. Square entries
    key on "L", mesh-local rect entries on "LQxLKV". Best-effort: an unwritable path
    must not abort a warmup whose compiles all succeeded (the table just gets
    re-measured next boot)."""
    import json
    import os

    try:
        parent = os.path.dirname(path)
        if parent:
            os.makedirs(parent, exist_ok=True)
        # Entries: [block_q, block_kv, const_tables, margin_ms] — margin_ms is the
        # best-of-2 winning margin recorded at tune time (may be absent on old
        # files). Loaders accept the pre-round-4 2-element form too (const
        # defaults False).
        def entry(b, margin):
            e = list(b)
            if margin is not None:
                e.append(margin)
            return e

        data = {
            str(l): entry(b, _TUNED_MARGINS.get(l))
            for l, b in sorted(_TUNED_BLOCKS.items())
        }
        data.update(
            {
                f"{lq}x{lkv}": entry(b, _TUNED_MARGINS_RECT.get((lq, lkv)))
                for (lq, lkv), b in sorted(_TUNED_BLOCKS_RECT.items())
            }
        )
        with open(path, "w") as f:
            json.dump(data, f)
    except OSError:
        pass


def load_tuned_blocks(path: str) -> int:
    """Load a persisted tuned table; unknown/corrupt files are ignored (the
    autotuner just re-measures). Returns the number of entries loaded."""
    import json
    import os

    if not os.path.exists(path):
        return 0
    try:
        with open(path) as f:
            data = json.load(f)
        for key, b in data.items():
            margin = float(b[3]) if len(b) > 3 else None
            if "x" in key:
                lq, lkv = key.split("x")
                register_tuned_blocks_rect(int(lq), int(lkv), b)
                if margin is not None:
                    _TUNED_MARGINS_RECT[(int(lq), int(lkv))] = margin
            else:
                register_tuned_blocks(int(key), b)
                if margin is not None:
                    _TUNED_MARGINS[int(key)] = margin
        return len(data)
    except (ValueError, KeyError, IndexError, TypeError, AttributeError, OSError):
        # AttributeError: valid JSON that isn't an object (e.g. a list) has no .items()
        return 0
