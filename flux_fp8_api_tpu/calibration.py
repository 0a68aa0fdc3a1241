"""Functional fp8/int8 input-scale calibration.

The reference's F8Linear mutates Python state across 12 forward passes: each call
records max|x| into ``input_amax_trials``, recomputes ``input_scale`` from the running
max, and freezes after ``num_scale_trials`` (float8_quantize.py:42,72-76,220-246). That
mutation cannot live inside a jitted TPU graph, so here calibration is an explicit
*state-out* protocol:

1. run the apply with ``collect_amax=True`` → pytree of per-layer (per-block) amaxes;
2. fold it into a running elementwise max across trials (host-side, tiny);
3. after N trials (or at freeze time), write tuned input scales into the param tree via
   :func:`~.ops.quant.with_input_scale`.

The resulting scales are identical to the reference's: ``amax_to_scale(max over trials)``.
One deliberate divergence: the reference quantizes *during* trials with the evolving
scale (its warmup images are throwaway); we run trials un-frozen the same way — outputs
during calibration use in_scale=1.0-or-current, and serving always happens after freeze.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from .ops.quant import Linear, with_input_scale


def merge_amax(
    running: Optional[Dict[str, Any]], new: Dict[str, Any]
) -> Dict[str, Any]:
    """Elementwise running max across calibration trials (float8_quantize.py:225-237)."""
    if running is None:
        return new
    return jax.tree.map(jnp.maximum, running, new)


def apply_input_scales(params: Dict[str, Any], amaxes: Dict[str, Any]) -> Dict[str, Any]:
    """Write tuned input scales into every quantized Linear leaf of the flux tree.

    ``amaxes`` follows the naming emitted by ``flux_apply(collect_amax=True)``:
    top-level keys like ``"img_in"`` / ``"time_in.in_layer"`` / ``"final_layer.linear"``,
    plus ``"double_blocks"``/``"single_blocks"`` dicts whose leaves are (depth,) arrays
    aligned with the stacked block params.
    """

    def walk(subtree, prefix: str):
        if isinstance(subtree, Linear):
            key = prefix.rstrip(".")
            amax = _lookup(amaxes, key)
            if amax is None or subtree.kind == "float":
                return subtree
            return with_input_scale(subtree, amax)
        if isinstance(subtree, dict):
            return {k: walk(v, f"{prefix}{k}.") for k, v in subtree.items()}
        return subtree

    out = dict(params)
    for name in ("img_in", "txt_in", "time_in", "vector_in", "guidance_in", "final_layer"):
        if params.get(name) is not None:
            out[name] = walk(params[name], f"{name}.")

    for stack in ("double_blocks", "single_blocks"):
        blocks = params[stack]
        stack_amax = amaxes.get(stack, {}) or {}
        new_blocks = {}
        for k, v in blocks.items():
            if isinstance(v, Linear) and v.kind != "float" and k in stack_amax:
                new_blocks[k] = with_input_scale(v, stack_amax[k])
            else:
                new_blocks[k] = v
        out[stack] = new_blocks
    return out


def _lookup(amaxes: Dict[str, Any], dotted: str):
    if dotted in amaxes:
        return amaxes[dotted]
    return None


# Jitted per-trial scale-write. Eagerly, apply_input_scales issues ~3 tiny dispatches
# per quantized leaf (~70 total at flux-dev scale) every calibration trial; under jit
# it is ONE dispatch, and donating the param tree lets XLA alias the multi-GB q/kernel
# arrays straight through (only the scalar scales are computed), so no copy of the
# 12GB tree ever materializes. Structures are constant across trials → compiled once.
apply_input_scales_jit = jax.jit(apply_input_scales, donate_argnums=0)
merge_amax_jit = jax.jit(merge_amax)
