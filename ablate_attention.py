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

import json
import sys

import jax

from flux_fp8_api_tpu.ops.attention import _pick_blocks, benchmark_blocks

BF16_TFLOPS = 181.0  # measured sustained on this v5e (CLAUDE.md)
HEADS, HEAD_DIM = 24, 128
CALLS_PER_STEP = 19 + 38  # one joint attention per double + single block


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
    return {
        "L": l,
        "blocks": [bq, bkv],
        "const_tables": const,
        "ms": {k: round(v * 1e3, 3) for k, v in t.items()},
        "roofline_ms": round(roofline * 1e3, 3),
        "exp_cost_ms": round((t["full"] - t["no_exp"]) * 1e3, 3),
        "rope_cost_ms": round((t["full"] - t["no_rope"]) * 1e3, 3),
        "slack_ms": round((t["matmul_only"] - roofline) * 1e3, 3),
        "attained_pct": round(100.0 * roofline / t["full"], 1),
        "per_step_ms": round(t["full"] * 1e3 * CALLS_PER_STEP, 1),
    }


def main():
    ls = [int(a) for a in sys.argv[1:]] or [2816, 3392, 4608]
    print(f"backend={jax.default_backend()}", file=sys.stderr)
    rows = [ablate(l) for l in ls]
    for r in rows:
        print(json.dumps(r))
    print("\n| L | blocks | full ms | exp cost | rope cost | matmul-only | roofline | slack | attained % |")
    print("|---|---|---|---|---|---|---|---|---|")
    for r in rows:
        print(
            f"| {r['L']} | {tuple(r['blocks'])} | {r['ms']['full']} | {r['exp_cost_ms']} "
            f"| {r['rope_cost_ms']} | {r['ms']['matmul_only']} | {r['roofline_ms']} "
            f"| {r['slack_ms']} | {r['attained_pct']} |"
        )


if __name__ == "__main__":
    main()
