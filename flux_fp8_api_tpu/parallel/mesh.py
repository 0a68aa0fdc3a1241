"""Device mesh + sharding rules for multi-chip scaling.

The reference has no collective parallelism at all (SURVEY.md §2.2) — its only
"distribution" is per-model device placement. This module is the TPU-native expansion
path: a ``jax.sharding.Mesh`` with (dp, tp) axes and GSPMD sharding rules over the flux
param pytree, so ``jit`` partitions the whole denoise/train step across chips with XLA
inserting the all-reduces over ICI.

Tensor-parallel layout (Megatron-style, per transformer block):
- column-parallel (out-features sharded over tp): qkv projections, mlp up-projections,
  modulation linears, single-block linear1;
- row-parallel (in-features sharded over tp): attention proj, mlp down-projections,
  single-block linear2 — XLA inserts one psum per block pair;
- everything tiny (norms, embedders, final layer) replicated;
- batch over dp for both inference and training (grads all-reduce over dp).

LAYOUT: under tp the fused qkv and linear1 out-axes run HEAD-MAJOR — channels
grouped per head as [q_n | k_n | v_n (| mlp_n)] and linear2's in-axis grouped to
match (utils/checkpoint.py grouped_qkv_permutation / linear2_in_permutation,
applied at shard time by the pipeline via relayout_flux_tree; single-chip keeps
the flat reference layout, measured faster fusion) — so a contiguous tp
shard of those axes carries whole heads plus their mlp slices. GSPMD then runs
the Megatron ideal with no weight resharding: the only per-block collectives are
one all-reduce after each row-parallel GEMM (proj / mlp_down / linear2) plus a
tiny (B, 6·hs) all-gather of each modulation vector (modulation stays
column-sharded for its ~2.6GB/chip of weights; its M=batch GEMM output is KBs).
tests/test_parallel.py pins the exact HLO collective budget so a layout
regression cannot land silently.

AXES: expert parallelism (ep) has no target — FLUX is dense, no MoE anywhere in the
family. Pipeline parallelism (pp) is implemented (parallel/pp.py: GPipe-as-SPMD over
the depth-stacked block axis, shard_map + ppermute, differentiable) but is a
TRAINING axis, not a serving one: dp/tp/sp scale the three real serving resources
(throughput, memory, sequence) over ICI where FLUX's 4.6k-token steps live, and
GPipe bubbles cost (S−1)/(M+S−1) on a serving workload whose natural microbatch
count is 1. A stack pipelines only when the pp size divides its depth — flux-dev's
single stack (38 = 2·19) shards on pp ∈ {2, 19, 38}; the prime 19-deep double stack
falls back to a replicated scan (``flux_param_shardings(pp_axis=...)`` applies the
same rule to the param placement). The reference's coarse analog (per-model device
placement) is implemented as such (pipeline.py device fields).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.quant import Linear

# stacked-block Linear leaves → ("col" | "row" | "rep")
_BLOCK_LINEAR_KIND = {
    "img_mod_lin": "col",
    "txt_mod_lin": "col",
    "img_attn_qkv": "col",
    "txt_attn_qkv": "col",
    "img_attn_proj": "row",
    "txt_attn_proj": "row",
    "img_mlp_0": "col",
    "img_mlp_2": "row",
    "txt_mlp_0": "col",
    "txt_mlp_2": "row",
    "linear1": "col",
    "linear2": "row",
    "mod_lin": "col",
}


def make_mesh(shape: Dict[str, int], devices=None) -> Mesh:
    """Build a Mesh from an axis-name→size dict, e.g. {"dp": 2, "tp": 4}."""
    devices = devices if devices is not None else jax.devices()
    sizes = list(shape.values())
    n = int(np.prod(sizes))
    if n > len(devices):
        raise ValueError(f"mesh {shape} needs {n} devices, have {len(devices)}")
    dev_array = np.asarray(devices[:n]).reshape(sizes)
    return Mesh(dev_array, tuple(shape.keys()))


def _linear_spec(kind: str, stacked: bool, tp: Optional[str], pp: Optional[str] = None):
    """PartitionSpecs for one Linear leaf's fields. kernel/q layout is (in, out)
    (+ leading depth when stacked; the depth axis shards over ``pp`` when given —
    pipeline stages each hold their contiguous slice of the block stack)."""
    lead = (pp,) if stacked else ()
    if tp is None or kind == "rep":
        kspec = P(*lead, None, None)
        ospec = P(*lead, None)
    elif kind == "col":
        kspec = P(*lead, None, tp)
        ospec = P(*lead, tp)  # bias and per-out-channel scales follow out-features
    else:  # row
        kspec = P(*lead, tp, None)
        ospec = P(*lead, None)
    scalar = P(*lead) if stacked else P()
    return {
        "kernel": kspec,
        "q": kspec,
        "bias": ospec,
        # per-tensor scales are scalars (or (depth,) when stacked); per-out-channel
        # int8 weight scales follow the out axis
        "w_scale": ospec if kind == "col" else scalar,
        "w_scale_inv": ospec if kind == "col" else scalar,
        "in_scale": scalar,
        "in_scale_inv": scalar,
    }


def flux_param_shardings(
    params: Dict[str, Any],
    mesh: Mesh,
    tp_axis: Optional[str] = "tp",
    pp_axis: Optional[str] = None,
) -> Dict[str, Any]:
    """Sharding pytree matching a flux param tree (works for float and quantized).

    ``pp_axis``: shard each block stack's leading depth axis over this mesh axis
    (pipeline parallelism, parallel/pp.py) — applied per stack only when the pp size
    divides that stack's depth (the 19-deep double stack falls back to replicated on
    even pp sizes; the 38-deep single stack pipelines)."""
    tp = tp_axis if (tp_axis and tp_axis in mesh.axis_names) else None
    pp = pp_axis if (pp_axis and pp_axis in mesh.axis_names and mesh.shape[pp_axis] > 1) else None

    def ns(spec: P) -> NamedSharding:
        return NamedSharding(mesh, spec)

    def shard_linear(lin: Linear, kind: str, stacked: bool, lead: Optional[str] = None) -> Linear:
        specs = _linear_spec(kind, stacked, tp, lead)

        def pick(field, val):
            if val is None:
                return None
            arr_spec = specs[field]
            # per-tensor scales on quantized leaves are scalar/(depth,) arrays; an
            # int8 col-parallel leaf has (out,)-shaped w_scale that follows "out"
            if field in ("w_scale", "w_scale_inv") and val.ndim != len(arr_spec):
                arr_spec = P(*([None] * val.ndim))
            if field == "bias" and val.ndim != len(arr_spec):
                arr_spec = P(*([None] * val.ndim))
            return ns(arr_spec)

        import dataclasses

        return dataclasses.replace(
            lin,
            kernel=pick("kernel", lin.kernel),
            q=pick("q", lin.q),
            bias=pick("bias", lin.bias),
            w_scale=pick("w_scale", lin.w_scale),
            w_scale_inv=pick("w_scale_inv", lin.w_scale_inv),
            in_scale=pick("in_scale", lin.in_scale),
            in_scale_inv=pick("in_scale_inv", lin.in_scale_inv),
        )

    def replicated_like(tree):
        return jax.tree.map(
            lambda x: ns(P(*([None] * x.ndim))),
            tree,
            is_leaf=lambda x: x is None,
        )

    out: Dict[str, Any] = {}
    for name in ("img_in", "txt_in", "time_in", "vector_in", "guidance_in", "final_layer"):
        sub = params.get(name)
        if sub is None:
            out[name] = None
        elif isinstance(sub, Linear):
            out[name] = shard_linear(sub, "rep", stacked=False)
        else:
            out[name] = {
                k: (shard_linear(v, "rep", stacked=False) if isinstance(v, Linear) else replicated_like(v))
                for k, v in sub.items()
            }
    for stack in ("double_blocks", "single_blocks"):
        blocks = params[stack]
        depth = jax.tree.leaves(blocks)[0].shape[0]
        lead = pp if (pp and depth % mesh.shape[pp] == 0) else None

        def stacked_like(tree, lead=lead):
            return jax.tree.map(
                lambda x: ns(P(lead, *([None] * (x.ndim - 1)))),
                tree,
                is_leaf=lambda x: x is None,
            )

        out[stack] = {
            k: (
                shard_linear(v, _BLOCK_LINEAR_KIND.get(k, "rep"), stacked=True, lead=lead)
                if isinstance(v, Linear)
                else stacked_like(v)
            )
            for k, v in blocks.items()
        }
    return out


def shard_flux_params(
    params: Dict[str, Any], mesh: Mesh, tp_axis: str = "tp", pp_axis: Optional[str] = None
):
    """Place a param tree onto the mesh per the TP rules."""
    shardings = flux_param_shardings(params, mesh, tp_axis, pp_axis)
    return jax.tree.map(
        lambda x, s: x if s is None else jax.device_put(x, s),
        params,
        shardings,
        is_leaf=lambda x: x is None,
    )


def batch_sharding(mesh: Mesh, dp_axis: str = "dp") -> NamedSharding:
    """Inputs: batch over dp, everything else replicated."""
    dp = dp_axis if dp_axis in mesh.axis_names else None
    return NamedSharding(mesh, P(dp))


# ------------------------------------------------------------- text encoders (tp)
#
# T5-XXL is 4.7B params — by far the largest non-flow model — and the reference can
# only place it whole on one GPU (per-model device fields, util.py:51-53). Under a
# tp mesh we run it Megatron-style like the flux blocks: q/k/v and the gated-FF
# up-projections column-parallel, o and the FF down-projection row-parallel (one
# all-reduce per block for each), everything tiny replicated. CLIP (123M) shares the
# same rule table (its leaf names don't collide with T5's); sharding it mostly buys
# uniformity, but the guard below replicates any field a given tp size doesn't
# divide, so it is always safe to apply.

_ENC_BLOCK_LINEAR_KIND = {
    # T5 (models/t5.py blocks)
    "q": "col",
    "k": "col",
    "v": "col",
    "o": "row",
    "wi_0": "col",
    "wi_1": "col",
    "wo": "row",
    # CLIP (models/clip.py blocks)
    "q_proj": "col",
    "k_proj": "col",
    "v_proj": "col",
    "out_proj": "row",
    "fc1": "col",
    "fc2": "row",
}


def _enc_linear_shardings(lin: Linear, kind: str, mesh: Mesh, tp: str) -> Linear:
    """Per-field NamedShardings for one depth-stacked encoder Linear leaf.

    Weight-only kinds differ from the flux leaves in their scale layouts:
    per-out-channel (depth, out) for wo_fp8/wo_int8, blockwise (depth, in/B, out)
    for wo_int4/wo_int2 — blockwise scales shard WITH the kernel's in-axis on row
    leaves. Any field whose sharded dim the tp size doesn't divide is replicated
    (GSPMD reshards on the fly; correctness never depends on the annotation).
    wo_int4/int2 row-sharding is clean because their packing is contiguous along
    in (rows p·per_byte..p·per_byte+per_byte-1 per packed row) — unlike the flow's
    half-split "int4" kind, which never appears on encoder leaves."""
    size = mesh.shape[tp]

    def ns(spec: P) -> NamedSharding:
        return NamedSharding(mesh, spec)

    def guarded(arr, spec: P):
        if arr is None:
            return None
        for dim, axis in zip(arr.shape, spec):
            if axis is not None and dim % size != 0:
                return ns(P(*([None] * arr.ndim)))
        return ns(spec)

    def rep(a):
        return None if a is None else ns(P(*([None] * a.ndim)))
    if kind == "col":
        kq = P(None, None, tp)
        bias = P(None, tp)
        # (depth, out) per-out-channel scales follow out; (depth, nblocks, out) too
        sc2, sc3 = P(None, tp), P(None, None, tp)
    else:  # row
        kq = P(None, tp, None)
        bias = P(None, None)
        # per-out-channel scales are out-indexed → replicate; blockwise scales are
        # in-indexed → shard with the kernel rows
        sc2, sc3 = P(None, None), P(None, tp, None)

    def scale_spec(a):
        return None if a is None else guarded(a, sc2 if a.ndim == 2 else sc3)

    import dataclasses

    return dataclasses.replace(
        lin,
        kernel=guarded(lin.kernel, kq),
        q=guarded(lin.q, kq),
        bias=guarded(lin.bias, bias),
        w_scale=scale_spec(lin.w_scale),
        w_scale_inv=scale_spec(lin.w_scale_inv),
        in_scale=rep(lin.in_scale),
        in_scale_inv=rep(lin.in_scale_inv),
    )


def encoder_param_shardings(
    params: Dict[str, Any], mesh: Mesh, tp_axis: str = "tp"
) -> Dict[str, Any]:
    """Sharding pytree for a T5 or CLIP param tree (models/t5.py / models/clip.py):
    Megatron col/row over the stacked ``blocks`` Linear leaves, everything else
    (embeddings, norms, pooled head) replicated. Works for float and every
    weight-only tier."""
    tp = tp_axis if (tp_axis and tp_axis in mesh.axis_names) else None

    def replicated_like(tree):
        return jax.tree.map(
            lambda x: NamedSharding(mesh, P(*([None] * x.ndim))),
            tree,
            is_leaf=lambda x: x is None,
        )

    if tp is None or mesh.shape[tp] == 1:
        return replicated_like(params)

    out = {k: replicated_like(v) for k, v in params.items() if k != "blocks"}
    out["blocks"] = {
        k: (
            _enc_linear_shardings(v, _ENC_BLOCK_LINEAR_KIND[k], mesh, tp)
            if isinstance(v, Linear) and k in _ENC_BLOCK_LINEAR_KIND
            else replicated_like(v)
        )
        for k, v in params["blocks"].items()
    }
    return out


def shard_encoder_params(params: Dict[str, Any], mesh: Mesh, tp_axis: str = "tp"):
    """Place a T5/CLIP param tree onto the mesh per the encoder TP rules."""
    shardings = encoder_param_shardings(params, mesh, tp_axis)
    return jax.tree.map(
        lambda x, s: x if s is None else jax.device_put(x, s),
        params,
        shardings,
        is_leaf=lambda x: x is None,
    )
