"""Attention ceiling ablation (VERDICT r3 #3): pin how much of the kernel's
wall-clock is irreducible transcendental (exp) throughput vs scheduling/memory
slack, at the serving shapes.

Four builds of the SAME kernel are timed per joint seq length (tunnel-safe
lax.scan timing, ops/attention.py benchmark_blocks):

    full        — serving build: rope fused, exp softmax
    no_exp      — exp → identity, rope fused       (delta vs full = exp cost)
    no_rope     — exp softmax, rope not fused      (delta vs full = rope cost)
    matmul_only — both off: the kernel is just QK^T + PV + accumulate/epilogue

and compared against the bf16 matmul roofline for the two dots
(4·h·l·lkv·d FLOPs at the measured 181 TFLOP/s sustained):

    exp cost   = full − no_exp
    slack      = matmul_only − roofline        (scheduling/memory, not math)
    attained % = roofline / full

Prints one JSON line per L plus a markdown table for docs/PERF.md.

Usage: python ablate_attention.py [L ...]   (default: the serving seq lengths)
"""

import functools
import json
import sys

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flux_fp8_api_tpu.ops.attention import _pick_blocks, benchmark_blocks
from flux_fp8_api_tpu.ops.attention_kernel import _vmem_estimate

BF16_TFLOPS = 181.0  # measured sustained on this v5e (CLAUDE.md)
HEADS, HEAD_DIM = 24, 128
CALLS_PER_STEP = 19 + 38  # one joint attention per double + single block


# --------------------------------------------------- bare two-dot ceiling kernel
#
# VERDICT r4 #3: the "analytic roofline" (4·h·l²·d at 181 TFLOP/s) assumes the MXU
# sustains full rate on these exact contractions, which d=128 dots with a (bq, bkv)
# f32 intermediate may simply not attain. This kernel IS the attainable ceiling:
# the same grid, block specs, and accumulator as the serving kernel, but the body
# is ONLY the two dots (QK^T then P·V) — no softmax, no rope, no masking, no
# normalization epilogue. Whatever it measures is what these contractions can do
# on this chip with this blocking; the serving kernel's gap to IT (not to the
# analytic number) is the real slack.


def _bare_kernel(q_ref, k_ref, v_ref, o_ref, acc_ref):
    kv_idx = pl.program_id(2)

    @pl.when(kv_idx == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    s = jax.lax.dot_general(
        q_ref[0], k_ref[0], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    acc_ref[:] += jax.lax.dot_general(
        s.astype(jnp.bfloat16), v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(kv_idx == pl.num_programs(2) - 1)
    def _():
        o_ref[0] = acc_ref[:].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q", "block_kv", "interpret"))
def _bare_two_dot(q, k, v, block_q, block_kv, interpret=False):
    h, lq, d = q.shape
    lkv = k.shape[1]
    grid = (h, lq // block_q, lkv // block_kv)
    return pl.pallas_call(
        _bare_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda h, i, j: (h, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_kv, d), lambda h, i, j: (h, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_kv, d), lambda h, i, j: (h, j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, d), lambda h, i, j: (h, i, 0), memory_space=pltpu.VMEM)
        ],
        out_shape=[jax.ShapeDtypeStruct((h, lq, d), q.dtype)],
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            # fairness: same conditional Mosaic VMEM raise as the serving kernel
            # (attention_kernel.py:326-331) — e.g. the (1408, 2816) scores tile is
            # ~16MB, over the 16MB default; without the raise the bare kernel is
            # handicapped vs the serving kernel it is supposed to be a ceiling for
            **(
                {"vmem_limit_bytes": 80 * 1024 * 1024}
                if _vmem_estimate(lq, lkv, block_q, block_kv, d, False, False)
                > 14 * 1024 * 1024
                else {}
            ),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * h * lq * lkv * d,
            bytes_accessed=h * (lq + lkv) * d * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(q, k, v)[0]


def bare_two_dot_ms(l, blocks, heads=HEADS, head_dim=HEAD_DIM, iters=24):
    """Per-call ms of the bare two-dot kernel at ``blocks`` — timed with the same
    scan discipline as benchmark_blocks (one jit, carry dependence, value fetch;
    per-dispatch has a ~32ms tunnel floor). ``l`` must divide both blocks (the
    bare kernel has no masking — pass the serving blocks, which do divide)."""
    import time

    bq, bkv = int(blocks[0]), int(blocks[1])
    assert l % bq == 0 and l % bkv == 0, (l, bq, bkv)
    ks = jax.random.split(jax.random.PRNGKey(17), 3)
    q = jax.random.normal(ks[0], (heads, l, head_dim), jnp.bfloat16)
    k = jax.random.normal(ks[1], (heads, l, head_dim), jnp.bfloat16)
    v = jax.random.normal(ks[2], (heads, l, head_dim), jnp.bfloat16)

    @jax.jit
    def bench(q, k, v):
        def body(carry, _):
            o = _bare_two_dot(carry, k, v, bq, bkv)
            return o.astype(carry.dtype), None

        out, _ = jax.lax.scan(body, q, None, length=iters)
        return out

    float(jnp.sum(bench(q, k, v)))  # compile + first run
    t0 = time.perf_counter()
    float(jnp.sum(bench(q, k, v)))
    return (time.perf_counter() - t0) / iters * 1e3


def ablate(l: int, iters: int = 24):
    bq, bkv, const = _pick_blocks(l)
    blocks = (bq, bkv, const)
    kw = dict(folded_heads=HEADS, head_dim=HEAD_DIM, iters=iters)
    t = {
        "full": benchmark_blocks(l, blocks, **kw),
        "no_exp": benchmark_blocks(l, blocks, ablate_exp=True, **kw),
        "no_rope": benchmark_blocks(l, blocks, fuse_rope=False, **kw),
        "matmul_only": benchmark_blocks(
            l, blocks, fuse_rope=False, ablate_exp=True, **kw
        ),
    }
    flops = 4 * HEADS * l * l * HEAD_DIM
    roofline = flops / (BF16_TFLOPS * 1e12)
    # the MEASURED ceiling: the bare two-dot kernel at the same blocks (needs
    # exact division — the serving blocks all divide; skip otherwise)
    bare_ms = (
        bare_two_dot_ms(l, (bq, bkv)) if (l % bq == 0 and l % bkv == 0) else None
    )
    return {
        "L": l,
        "blocks": [bq, bkv],
        "const_tables": const,
        "ms": {k: round(v * 1e3, 3) for k, v in t.items()},
        "roofline_ms": round(roofline * 1e3, 3),
        "bare_two_dot_ms": round(bare_ms, 3) if bare_ms is not None else None,
        "exp_cost_ms": round((t["full"] - t["no_exp"]) * 1e3, 3),
        "rope_cost_ms": round((t["full"] - t["no_rope"]) * 1e3, 3),
        "slack_ms": round((t["matmul_only"] - roofline) * 1e3, 3),
        "attained_pct": round(100.0 * roofline / t["full"], 1),
        "attained_vs_bare_pct": (
            round(100.0 * bare_ms / (t["full"] * 1e3), 1) if bare_ms is not None else None
        ),
        "per_step_ms": round(t["full"] * 1e3 * CALLS_PER_STEP, 1),
    }


def main():
    ls = [int(a) for a in sys.argv[1:]] or [2816, 3392, 4608]
    print(f"backend={jax.default_backend()}", file=sys.stderr)
    rows = [ablate(l) for l in ls]
    for r in rows:
        print(json.dumps(r))
    print("\n| L | blocks | full ms | exp cost | rope cost | matmul-only | bare two-dot | analytic roofline | attained vs bare % |")
    print("|---|---|---|---|---|---|---|---|---|")
    for r in rows:
        print(
            f"| {r['L']} | {tuple(r['blocks'])} | {r['ms']['full']} | {r['exp_cost_ms']} "
            f"| {r['rope_cost_ms']} | {r['ms']['matmul_only']} | {r['bare_two_dot_ms']} "
            f"| {r['roofline_ms']} | {r['attained_vs_bare_pct']} |"
        )


if __name__ == "__main__":
    main()
