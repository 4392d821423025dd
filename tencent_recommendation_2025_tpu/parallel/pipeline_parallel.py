"""Pipeline parallelism (F5) — ring-sharded GPipe over a ``pipe`` mesh axis.

SURVEY.md §2.2 ranks PP lowest-priority for a 2-8 block recsys encoder (depth
is small); it exists for completeness — but as a *real* feature: unlike a
naive shard_map GPipe that replicates the full microbatch stack on every
stage, everything here is sharded over the ``pipe`` axis so per-device
activation memory is O(M/S) microbatches, not O(M):

- encoder blocks are already *stacked* (models/encoder.py); sharding their
  leading axis over ``pipe`` gives each device a contiguous slice of layers —
  no parameter surgery, and zero weight communication;
- the microbatch stack is sharded **cyclically** over stages (microbatch
  ``i`` starts on stage ``i % S``) and the whole input buffer rotates one
  hop toward stage 0 per tick, so stage 0 always finds microbatch ``t`` in
  its local shard at slot ``t // S`` on tick ``t``;
- activations ``ppermute`` one hop toward the *next* stage per tick (the
  classic GPipe conveyor, ``M + S - 1`` ticks, bubble ``(S-1)/(M+S-1)``);
- finished microbatches are banked into an output ring buffer that rotates
  alongside; one fix-up rotation after the schedule leaves output microbatch
  ``i`` on stage ``i % S`` — the same layout the inputs had, so the caller's
  reassembly is a pure reshape (no collective).

The activation is a **pytree** (e.g. ``{"x": [B, L, D], "tt": [B, L]}``) so
per-token side inputs like the padding mask ride the conveyor with the
hidden states. An optional ``data_axis`` composes with data parallelism:
each (pipe, data) device column runs its own batch slice through the ring.

Gradients flow through ppermute/scan/dynamic_update automatically — this is
a plain differentiable function, usable under ``jax.grad`` and remat.

Replaces single-device depth iteration in the reference
(``model/BaseLine/model.py:336-350``) at multi-chip scale.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def pipelined_scan(mesh: Mesh, axis: str, block_fn: Callable,
                   stacked_params: Any, x: Any, num_microbatches: int,
                   data_axis: Optional[str] = None) -> Any:
    """Run ``lax.scan(block_fn)`` over stage-sharded stacked block params
    with a ring-sharded GPipe microbatch schedule.

    ``block_fn(act, block_params) -> act`` applies ONE block to one
    microbatch activation pytree. ``stacked_params`` leaves have leading dim
    num_blocks (sharded over ``axis``); ``x`` is a pytree of ``[B, ...]``
    leaves with ``B % num_microbatches == 0`` and
    ``num_microbatches % mesh.shape[axis] == 0``.
    """
    S = mesh.shape[axis]
    M = num_microbatches
    leaves = jax.tree.leaves(x)
    B = leaves[0].shape[0]
    assert M % S == 0, f"microbatches {M} not divisible by stages {S}"
    assert B % M == 0, f"batch {B} not divisible by microbatches {M}"
    mb = B // M
    m_local = M // S

    # cyclic layout: Y[s, j] = microbatch j*S + s  -> leading dim sharded
    # over the pipe axis puts microbatch i on stage i % S at slot i // S
    def to_ring(a):
        return (a.reshape(m_local, S, mb, *a.shape[1:]).swapaxes(0, 1))

    def from_ring(a):
        return a.swapaxes(0, 1).reshape(B, *a.shape[3:])

    xs = jax.tree.map(to_ring, x)

    def per_device(local_blocks, local_xs):
        # local_xs: pytree of [1, m_local, mb, ...] — squeeze the stage dim
        local_xs = jax.tree.map(lambda a: a[0], local_xs)
        stage = jax.lax.axis_index(axis)
        n_ticks = M + S - 1
        up = [(s, (s + 1) % S) for s in range(S)]      # activations forward
        down = [(s, (s - 1) % S) for s in range(S)]    # buffers toward 0

        def rot(tree, perm):
            return jax.tree.map(lambda a: jax.lax.ppermute(a, axis, perm),
                                tree)

        def apply_blocks(act):
            def body(a, bp):
                return block_fn(a, bp), None

            out, _ = jax.lax.scan(body, act, local_blocks)
            return out

        def tick(carry, t):
            inbuf, outbuf, current = carry
            # stage 0 ingests microbatch t, resident at local slot t // S
            slot = jnp.clip(t // S, 0, m_local - 1)
            feed = jax.tree.map(
                lambda b: jax.lax.dynamic_index_in_dim(b, slot, 0,
                                                       keepdims=False),
                inbuf)
            ingest = jnp.logical_and(stage == 0, t < M)
            current = jax.tree.map(
                lambda f, c: jnp.where(ingest, f, c), feed, current)
            # stage s is active when it holds microbatch t - s in [0, M)
            mb_idx = t - stage
            active = jnp.logical_and(mb_idx >= 0, mb_idx < M)
            processed = apply_blocks(current)
            processed = jax.tree.map(
                lambda p, c: jnp.where(active, p.astype(c.dtype), c),
                processed, current)
            # last stage banks microbatch mb_idx at slot mb_idx // S; the
            # buffer keeps rotating, so earlier writes have moved off this
            # shard by the time the same slot index is written again
            oslot = jnp.clip(mb_idx // S, 0, m_local - 1)
            bank = jnp.logical_and(stage == S - 1, active)
            outbuf = jax.tree.map(
                lambda ob, p: jnp.where(
                    bank,
                    jax.lax.dynamic_update_index_in_dim(ob, p, oslot, 0),
                    ob),
                outbuf, processed)
            return (rot(inbuf, down), rot(outbuf, down),
                    rot(processed, up)), None

        outbuf0 = jax.tree.map(jnp.zeros_like, local_xs)
        current0 = jax.tree.map(lambda a: jnp.zeros_like(a[0]), local_xs)
        (_, outbuf, _), _ = jax.lax.scan(
            tick, (local_xs, outbuf0, current0), jnp.arange(n_ticks))
        # written microbatch i has rotated down M - i times by the end:
        # it sits on stage (i - 1) % S — one up-rotation restores the
        # input's cyclic layout (stage i % S, slot i // S)
        outbuf = rot(outbuf, up)
        return jax.tree.map(lambda a: a[None], outbuf)

    def ring_spec(a):
        # [S, m_local, mb, ...]: stages over `axis`, batch over `data_axis`
        rest = (None,) * (a.ndim - 3)
        return P(axis, None, data_axis, *rest)

    blocks_specs = jax.tree.map(lambda a: P(axis), stacked_params)
    xs_specs = jax.tree.map(ring_spec, xs)
    fn = jax.shard_map(per_device, mesh=mesh,
                       in_specs=(blocks_specs, xs_specs),
                       out_specs=xs_specs, check_vma=False)
    out = fn(stacked_params, xs)
    return jax.tree.map(from_ring, out)
