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
    params (moments inherit shardings via zeros_like). With sparse tables the
    optimizer state splits like trainer.init_state does."""
    tx = make_optimizer(cfg)
    params = model.init(jax.random.key(seed if seed is not None
                                       else cfg.train.seed))
    params = partition.shard_params(mesh, params)
    sparse = tuple(cfg.train.sparse_tables)
    if sparse:
        from ..ops.sparse_table import init_table_opt

        dense = {k: v for k, v in params.items() if k not in sparse}
        opt_state = {
            "dense": jax.jit(tx.init)(dense),
            # moments place explicitly row-sharded: a packed table's [V]
            # accumulator is fresh zeros (no sharding to inherit from a
            # column slice), and the step's shard_map expects P(TABLE_AXES)
            "tables": {n: {k: _shard_table_moment(mesh, v)
                           for k, v in jax.jit(
                lambda t: init_table_opt(t, cfg.train.table_optimizer,
                                         cfg.train.table_moments_dtype,
                                         dim=cfg.model.hidden_units)
            )(params[n]).items()} for n in sparse},
        }
    else:
        opt_state = jax.jit(tx.init)(params)
    step = jax.device_put(jnp.zeros((), jnp.int32),
                          NamedSharding(mesh, P()))
    return TrainState(params=params, opt_state=opt_state, step=step), tx


def shard_batch(mesh: Mesh, batch) -> Any:
    return jax.device_put(batch, partition.batch_shardings(mesh, batch))


def _walk_opt_state(node, param_treedef, on_params, on_leaf):
    """Apply on_params to param-structured subtrees of an optax state tree,
    on_leaf elsewhere (scalars like counts)."""
    if jax.tree.structure(node) == param_treedef:
        return on_params(node)
    if isinstance(node, tuple) and type(node) is not tuple:  # NamedTuple
        return type(node)(*[_walk_opt_state(f, param_treedef, on_params,
                                            on_leaf) for f in node])
    if isinstance(node, (tuple, list)):
        return type(node)(_walk_opt_state(f, param_treedef, on_params,
                                          on_leaf) for f in node)
    if isinstance(node, dict):
        return {k: _walk_opt_state(v, param_treedef, on_params, on_leaf)
                for k, v in node.items()}
    return on_leaf(node)


def _is_sparse_opt(opt_state) -> bool:
    return isinstance(opt_state, dict) and set(opt_state) == {"dense",
                                                              "tables"}


def _shard_table_moment(mesh: Mesh, v):
    """Row-shard (and row-pad) a sparse-table optimizer moment: [V, D] mu/nu
    or [V] adagrad accumulator."""
    n = int(np.prod([mesh.shape[a] for a in partition.TABLE_AXES]))
    rows = v.shape[0]
    padded = n * (-(-rows // n))
    if padded != rows:
        pad = [(0, padded - rows)] + [(0, 0)] * (v.ndim - 1)
        v = jnp.pad(v, pad)
    spec = P(partition.TABLE_AXES, *([None] * (v.ndim - 1)))
    return jax.device_put(v, NamedSharding(mesh, spec))


def shard_existing_state(mesh: Mesh, state: TrainState) -> TrainState:
    """Place an existing (host / single-device) TrainState onto the mesh —
    the resume path: checkpoint restores into an unsharded template, then
    lands here. Optimizer moments shard (and row-pad) like their params."""
    params = partition.shard_params(mesh, state.params)
    repl = lambda l: jax.device_put(l, NamedSharding(mesh, P()))  # noqa: E731
    if _is_sparse_opt(state.opt_state):
        dense_params = {k: v for k, v in state.params.items()
                        if k not in state.opt_state["tables"]}
        dtree = jax.tree.structure(dense_params)
        opt_state = {
            "dense": _walk_opt_state(
                state.opt_state["dense"], dtree,
                on_params=lambda p: partition.shard_params(mesh, p),
                on_leaf=repl),
            "tables": {n: {k: _shard_table_moment(mesh, v)
                           for k, v in m.items()}
                       for n, m in state.opt_state["tables"].items()},
        }
    else:
        opt_state = _walk_opt_state(
            state.opt_state, jax.tree.structure(state.params),
            on_params=lambda p: partition.shard_params(mesh, p),
            on_leaf=repl)
    step = jax.device_put(state.step, NamedSharding(mesh, P()))
    return TrainState(params=params, opt_state=opt_state, step=step)


def unpad_state(state: TrainState, params_template) -> TrainState:
    """Strip the table-row shard padding from params AND optimizer moments so
    checkpoints keep the logical (mesh-independent) shapes.
    ``params_template`` only needs shapes (e.g. from jax.eval_shape)."""
    params = partition.unpad_like(state.params, params_template)
    tdict = params_template if isinstance(params_template, dict) else None
    if _is_sparse_opt(state.opt_state):
        dense_template = {k: v for k, v in tdict.items()
                          if k not in state.opt_state["tables"]}
        dtree = jax.tree.structure(dense_template)
        opt_state = {
            "dense": _walk_opt_state(
                state.opt_state["dense"], dtree,
                on_params=lambda p: partition.unpad_like(p, dense_template),
                on_leaf=lambda l: l),
            # moments cut to their table's shard-pad-free length. Unpacked
            # templates (2-D [V, D]): every moment (mu/nu [V, D], acc [V])
            # shares the leading dim V. PACKED templates (3-D [G, 8, 128])
            # never gain shard padding, and the [V] adagrad accumulator's
            # leading dim is rows not groups — cut only same-ndim moments.
            "tables": {n: {k: (v[: tdict[n].shape[0]]
                               if tdict[n].ndim == 2
                               or v.ndim == tdict[n].ndim else v)
                           for k, v in m.items()}
                       for n, m in state.opt_state["tables"].items()},
        }
    else:
        opt_state = _walk_opt_state(
            state.opt_state, jax.tree.structure(state.params),
            on_params=lambda p: partition.unpad_like(p, params_template),
            on_leaf=lambda l: l)
    return TrainState(params=params, opt_state=opt_state, step=state.step)


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
    """The SAME step as trainer.make_train_step (incl. the sparse-table
    branch), compiled over the mesh — sharded inputs make XLA emit the
    collectives; ``mesh`` additionally routes ring attention and the
    sharding-constraint hints in the loss path."""
    from ..train.trainer import make_train_step

    return make_train_step(model, tx, cfg, mesh=mesh)
