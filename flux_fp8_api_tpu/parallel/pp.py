"""Pipeline parallelism (pp) over the depth-stacked block axis.

The reference has no collective parallelism at all (SURVEY.md §2.2); dp/tp/sp are the
axes that pay on ICI for FLUX serving (parallel/mesh.py rationale). pp is the fourth
axis, for the regime the others don't reach: multi-pod/DCN *training*, where stage
boundaries cross the slow links and only activations (not weight gradients) must move
per microbatch.

TPU-native formulation — GPipe as SPMD, not as a scheduler: the model's blocks are
already stacked on a leading depth axis for ``lax.scan`` (models/flux.py), so a
pipeline stage is simply a contiguous slice of that axis. Under ``jax.shard_map`` over
a "pp" mesh axis each device holds ``depth/S`` blocks and scans them; microbatches
rotate stage-to-stage with ``lax.ppermute`` inside a ``lax.scan`` over the
``M + S - 1`` pipeline ticks (bubble fraction (S-1)/(M+S-1), the GPipe schedule).
Note the SPMD formulation trades GPipe's *idle* bubbles for *discarded compute* of
the same size: during warm-up/drain ticks every stage still runs a full (remat'd)
block scan on clipped microbatch indices and the results are provably dropped —
the (S-1)/(M+S-1) fraction is redundant FLOPs here, not idle time.
Because every collective here is a jax primitive, the backward pipeline needs no
hand-written schedule: ``jax.grad`` differentiates through shard_map/ppermute and the
transpose runs the reverse rotation automatically.

Stage partition rule: a stack pipelines only when S divides its depth; otherwise it
falls back to a plain replicated scan. flux-dev's single stack (38 = 2·19) pipelines
on S ∈ {2, 19, 38}; its 19-deep double stack is prime and stays replicated on even S
— exactly the trade documented in parallel/mesh.py. Toy/test configs with even depths
pipeline both stacks.

This module plugs into the model as a ``stack_runner`` (models/flux.py:flux_apply) —
the forward is otherwise byte-identical, so pp composes with dp (batch axis) and with
quantized Linear leaves without touching the block math.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def _tree_index(tree, i):
    return jax.tree.map(
        lambda a: jax.lax.dynamic_index_in_dim(a, i, 0, keepdims=False), tree
    )


def make_pp_runner(
    mesh: Mesh,
    num_microbatches: int,
    pp_axis: str = "pp",
    dp_axis: Optional[str] = None,
    remat: bool = False,
):
    """→ a ``stack_runner`` for :func:`~..models.flux.flux_apply` that runs each block
    stack as a GPipe pipeline over ``mesh``'s pp axis.

    Args:
      num_microbatches: M — the (per-dp-shard) batch splits into M microbatches that
        flow through the stages; requires ``batch/dp % M == 0``. Bubble fraction is
        (S-1)/(M+S-1): M=1 degenerates to sequential stages, larger M amortizes.
      dp_axis: optional data-parallel axis; the batch dim of activations/conditioning
        is sharded over it inside the same shard_map (no cross-dp communication — dp
        gradient all-reduces happen outside, via GSPMD, as usual).
      remat: rematerialize each block body under autodiff (the pp analog of
        ``FluxStatic.remat``, which only affects the default scan runner).

    Constraints: calibration (``collect_amax``) is a single-chip protocol and is not
    supported under pp; tp is not composed with pp (they shard the same resource —
    see parallel/mesh.py for why tp wins inside a pod) — enforced: any non-trivial
    mesh axis besides ``pp_axis``/``dp_axis`` raises.
    """
    if pp_axis not in mesh.axis_names:
        raise ValueError(f"mesh {mesh.axis_names} has no {pp_axis!r} axis")
    # tp/sp cannot compose with pp: the shard_map below declares blocks as
    # P(pp, None, ...), so a tree that is ALSO tp-sharded would be silently
    # all-gathered over tp at every tick — correct outputs, hidden 12B-scale
    # memory/bandwidth blowup. Refuse instead of degrading.
    other = [
        a
        for a in mesh.axis_names
        if a not in (pp_axis, dp_axis) and mesh.shape[a] > 1
    ]
    if other:
        raise ValueError(
            f"pp composes only with dp; mesh has non-trivial axes {other} "
            "(tp/sp shard the same weights the pp shard_map declares replicated)"
        )
    S = mesh.shape[pp_axis]
    M = int(num_microbatches)
    if M < 1:
        raise ValueError("num_microbatches must be >= 1")
    dp = mesh.shape[dp_axis] if dp_axis and dp_axis in mesh.axis_names else 1

    def runner(body, carry, blocks, extras):
        block_fn = jax.checkpoint(body) if remat else body
        depth = jax.tree.leaves(blocks)[0].shape[0]
        if S == 1 or depth % S != 0:
            # no uniform stage partition (e.g. flux-dev's 19 doubles on S=2):
            # plain scan with the stack replicated over pp
            return jax.lax.scan(lambda c, b: block_fn(c, b, extras), carry, blocks)

        batch = jax.tree.leaves(carry)[0].shape[0]
        if (batch // dp) % M != 0 or batch % dp != 0:
            raise ValueError(
                f"batch {batch} must split into dp={dp} shards of M={M} microbatches"
            )
        mb = batch // dp // M

        def spec_b(a):
            return P(dp_axis if dp > 1 else None, *([None] * (a.ndim - 1)))

        def spec_pp(a):
            return P(pp_axis, *([None] * (a.ndim - 1)))

        def piped(blocks_l, carry_l, extras_l):
            sidx = jax.lax.axis_index(pp_axis)

            def split(a):
                return a.reshape(M, mb, *a.shape[1:])

            xs = jax.tree.map(split, carry_l)  # (M, mb, ...) inputs, stage-0 feed
            exs = jax.tree.map(split, extras_l)  # per-microbatch conditioning
            # the tick body makes the carry pp-varying (each stage computes its own
            # activations), so the initial zeros must carry the same vma type
            pvary = lambda a: jax.lax.pcast(a, (pp_axis,), to="varying")
            state = jax.tree.map(lambda a: pvary(jnp.zeros_like(a[0])), xs)
            out = jax.tree.map(lambda a: pvary(jnp.zeros_like(a)), xs)
            perm = [(i, (i + 1) % S) for i in range(S)]

            def tick(c, t):
                state, out = c
                # stage 0 injects microbatch t; stages s>0 consume what stage s-1
                # ppermuted last tick (= microbatch t-s). Clipped indices outside
                # [0, M) are warm-up/drain bubbles whose results are never written.
                inject = _tree_index(xs, jnp.clip(t, 0, M - 1))
                cur = jax.tree.map(
                    lambda i_, s_: jnp.where(sidx == 0, i_, s_), inject, state
                )
                ex = _tree_index(exs, jnp.clip(t - sidx, 0, M - 1))
                y, _ = jax.lax.scan(
                    lambda cc, blk: block_fn(cc, blk, ex), cur, blocks_l
                )
                m = t - (S - 1)  # microbatch leaving the last stage this tick
                widx = jnp.clip(m, 0, M - 1)
                write = jnp.logical_and(sidx == S - 1, m >= 0)

                def upd(buf, y_leaf):
                    old = jax.lax.dynamic_index_in_dim(buf, widx, 0, keepdims=False)
                    return jax.lax.dynamic_update_index_in_dim(
                        buf, jnp.where(write, y_leaf, old), widx, 0
                    )

                out = jax.tree.map(upd, out, y)
                state = jax.tree.map(
                    lambda a: jax.lax.ppermute(a, pp_axis, perm), y
                )
                return (state, out), None

            (_, out), _ = jax.lax.scan(
                tick, (state, out), jnp.arange(M + S - 1)
            )
            # only the last stage wrote non-zeros → psum replicates the result over
            # pp (activations, not weights — the cheap direction)
            out = jax.tree.map(lambda a: jax.lax.psum(a, pp_axis), out)
            return jax.tree.map(lambda a: a.reshape(M * mb, *a.shape[2:]), out)

        out_carry = jax.shard_map(
            piped,
            mesh=mesh,
            in_specs=(
                jax.tree.map(spec_pp, blocks),
                jax.tree.map(spec_b, carry),
                jax.tree.map(spec_b, extras),
            ),
            out_specs=jax.tree.map(spec_b, carry),
        )(blocks, carry, extras)
        return out_carry, None

    return runner


def make_pp_train_step(
    cfg,
    mesh: Mesh,
    num_microbatches: int,
    optimizer=None,
    pp_axis: str = "pp",
    dp_axis: Optional[str] = "dp",
    remat: bool = True,
    t_sampling: str = "uniform",
):
    """Pipeline-parallel flow-matching train step over a (dp, pp) mesh.

    → ``step(params, batch, key) -> (params, loss)`` (SGD) or, with an optax
    ``optimizer``, ``(init_fn, step_fn)`` where
    ``step_fn(params, opt_state, batch, key) -> (params, opt_state, loss)``.

    Params are placed with ``shard_flux_params(..., pp_axis=...)`` — each stage holds
    its depth slice of the stacks (1/S of the block weights per device); the forward
    pipelines microbatches through the stages and ``jax.grad`` runs the reverse
    pipeline through the ppermute transposes. Stage-local block grads land sharded
    exactly like their params, so the optimizer update is also 1/S per device.
    """
    import dataclasses

    from .train import flow_matching_loss

    cfg = dataclasses.replace(
        cfg, use_pallas=False, attn_shard_axes=None, attn_seq_axis=None, remat=False
    )
    runner = make_pp_runner(
        mesh, num_microbatches, pp_axis=pp_axis, dp_axis=dp_axis, remat=remat
    )

    def loss_fn(params, batch, key):
        return flow_matching_loss(
            params, cfg, batch, key, t_sampling, stack_runner=runner
        )

    if optimizer is None:
        from .train import sgd_update

        @partial(jax.jit, donate_argnums=(0,))
        def step(params, batch, key):
            loss, grads = jax.value_and_grad(loss_fn)(params, batch, key)
            return sgd_update(params, grads), loss

        return step

    @partial(jax.jit, donate_argnums=(0, 1))
    def opt_step(params, opt_state, batch, key):
        import optax

        loss, grads = jax.value_and_grad(loss_fn)(params, batch, key)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    return optimizer.init, opt_step
