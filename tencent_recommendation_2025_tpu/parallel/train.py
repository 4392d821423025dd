"""Sharded training: mesh-aware state init + jitted step (F1/F2/F3/F4 glue).

Builds on the single-device trainer: parameters are placed with the partition
rules (DP gradients psum'd by XLA, TP projections split over ``model``, tables
row-sharded over (data, model) — the EP layout), the batch shards over
``data``, and when the mesh has a ``seq`` axis the encoder routes attention
through the ring kernels. One ``jax.jit`` compiles the whole SPMD step.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import Config
from ..models.baseline import SeqRecModel
from ..train.trainer import (TrainState, compute_loss, make_optimizer)
from . import partition


def init_sharded_state(model: SeqRecModel, cfg: Config, mesh: Mesh,
                       seed: Optional[int] = None) -> Tuple[TrainState, Any]:
    """Initialize params on host, place sharded, init optimizer on the sharded
    params (moments inherit shardings via zeros_like)."""
    tx = make_optimizer(cfg)
    params = model.init(jax.random.key(seed if seed is not None
                                       else cfg.train.seed))
    params = partition.shard_params(mesh, params)
    opt_state = jax.jit(tx.init)(params)
    step = jax.device_put(jnp.zeros((), jnp.int32),
                          NamedSharding(mesh, P()))
    return TrainState(params=params, opt_state=opt_state, step=step), tx


def shard_batch(mesh: Mesh, batch) -> Any:
    return jax.device_put(batch, partition.batch_shardings(mesh, batch))


def shard_tables(mesh: Mesh, tables) -> Any:
    """Static item/mm tables row-shard over (data, model) like the learned
    tables (XLA compiles their gathers into collectives)."""
    n = int(np.prod([mesh.shape[a] for a in partition.TABLE_AXES]))

    def put(leaf):
        if getattr(leaf, "ndim", 0) == 2 and leaf.shape[0] > 64:
            rows = leaf.shape[0]
            padded = n * (-(-rows // n))
            if padded != rows:
                leaf = jnp.pad(leaf, ((0, padded - rows), (0, 0)))
            return jax.device_put(
                leaf, NamedSharding(mesh, P(partition.TABLE_AXES, None)))
        if getattr(leaf, "ndim", 0) >= 1:
            return jax.device_put(leaf, NamedSharding(mesh, P()))
        return leaf

    return jax.tree.map(put, tables)


def make_sharded_train_step(model: SeqRecModel, tx, cfg: Config, mesh: Mesh):
    """Same semantics as trainer.make_train_step, compiled over the mesh."""
    import optax

    def step_fn(state: TrainState, batch, mm_tables, item_tables, rng):
        rng = jax.random.fold_in(rng, state.step)

        def loss_fn(params):
            return compute_loss(model, params, batch, mm_tables, item_tables,
                                cfg, train=True, rng=rng, mesh=mesh)

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), metrics

    return jax.jit(step_fn, donate_argnums=(0,))
