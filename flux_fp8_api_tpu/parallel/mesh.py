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


def _linear_spec(kind: str, stacked: bool, tp: Optional[str]):
    """PartitionSpecs for one Linear leaf's fields. kernel/q layout is (in, out)
    (+ leading depth when stacked)."""
    lead = (None,) if stacked else ()
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
    params: Dict[str, Any], mesh: Mesh, tp_axis: Optional[str] = "tp"
) -> Dict[str, Any]:
    """Sharding pytree matching a flux param tree (works for float and quantized)."""
    tp = tp_axis if (tp_axis and tp_axis in mesh.axis_names) else None

    def ns(spec: P) -> NamedSharding:
        return NamedSharding(mesh, spec)

    def shard_linear(lin: Linear, kind: str, stacked: bool) -> Linear:
        specs = _linear_spec(kind, stacked, tp)

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
        out[stack] = {
            k: (
                shard_linear(v, _BLOCK_LINEAR_KIND.get(k, "rep"), stacked=True)
                if isinstance(v, Linear)
                else replicated_like(v)
            )
            for k, v in blocks.items()
        }
    return out


def shard_flux_params(params: Dict[str, Any], mesh: Mesh, tp_axis: str = "tp"):
    """Place a param tree onto the mesh per the TP rules."""
    shardings = flux_param_shardings(params, mesh, tp_axis)
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
