"""Pipeline parallelism (F5) — GPipe-style stage partitioning via shard_map.

SURVEY.md §2.2 ranks PP lowest-priority for a 2-8 block recsys encoder (depth
is small); it exists as a config option for completeness. Design:

- encoder blocks are already *stacked* (models/encoder.py); sharding their
  leading axis over a ``stage`` mesh axis gives each device a contiguous
  slice of layers — no parameter surgery;
- the batch is split into ``num_microbatches`` microbatches; a classic GPipe
  schedule runs ``M + S - 1`` ticks, each device applying its blocks to the
  microbatch currently resident and ``ppermute``-ing activations to the next
  stage each tick;
- bubbles cost (S-1)/(M+S-1); pick M >= 4*S for >75% utilization.

The block body is passed in (the encoder's ``block_body``), so PP composes
with any block type. Gradients flow through ppermute/scan automatically.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def pipelined_scan(mesh: Mesh, axis: str, block_fn: Callable,
                   stacked_params, x: jnp.ndarray,
                   num_microbatches: int) -> jnp.ndarray:
    """Run ``lax.scan(block_fn)`` over stage-sharded stacked block params
    with a GPipe microbatch schedule.

    block_fn(x_mb, block_params) -> x_mb (one block applied to one
    microbatch). stacked_params leaves have leading dim num_blocks
    (sharded over ``axis``); x [B, ...] with B % num_microbatches == 0.
    """
    S = mesh.shape[axis]
    M = num_microbatches
    B = x.shape[0]
    assert B % M == 0, f"batch {B} not divisible by microbatches {M}"
    mb = B // M
    xs = x.reshape(M, mb, *x.shape[1:])

    def per_device(local_blocks, xs_local):
        # local_blocks: this stage's slice of the stacked params
        # xs_local: full microbatch stack (replicated over the stage axis)
        stage = jax.lax.axis_index(axis)
        n_ticks = M + S - 1
        perm = [(i, i + 1) for i in range(S - 1)]

        def apply_blocks(act):
            def body(a, bp):
                return block_fn(a, bp), None

            out, _ = jax.lax.scan(body, act, local_blocks)
            return out

        def tick(carry, t):
            outputs, current = carry
            # stage 0 ingests microbatch t (if any are left)
            feed = jnp.clip(t, 0, M - 1)
            current = jnp.where(stage == 0, xs_local[feed], current)
            # active when this stage holds microbatch (t - stage) in [0, M)
            mb_idx = t - stage
            active = jnp.logical_and(mb_idx >= 0, mb_idx < M)
            processed = apply_blocks(current)
            processed = jnp.where(active, processed, current)
            # last stage banks its finished microbatch
            outputs = jnp.where(
                jnp.logical_and(stage == S - 1, active),
                jax.lax.dynamic_update_index_in_dim(
                    outputs, processed, jnp.clip(mb_idx, 0, M - 1), 0),
                outputs)
            # rotate activations toward the next stage
            nxt = jax.lax.ppermute(processed, axis, perm)
            return (outputs, nxt), None

        outputs = jnp.zeros_like(xs_local)
        current = jnp.zeros_like(xs_local[0])
        (outputs, _), _ = jax.lax.scan(tick, (outputs, current),
                                       jnp.arange(n_ticks))
        # every stage but the last holds zeros; psum broadcasts the result
        outputs = jnp.where(stage == S - 1, outputs,
                            jnp.zeros_like(outputs))
        return jax.lax.psum(outputs, axis)

    other_axes = [a for a in mesh.axis_names if a != axis]
    fn = jax.shard_map(
        per_device, mesh=mesh,
        in_specs=(P(axis), P(*[None] * xs.ndim)),
        out_specs=P(*[None] * xs.ndim),
        check_vma=False,
    )
    out = fn(stacked_params, xs)
    return out.reshape(B, *x.shape[1:])
