"""Training driver (C11): jitted train/eval steps + epoch loop.

The reference's loop (``model/BaseLine/main.py:154-269``) re-done for XLA:
the whole step — feature lookup, both towers, encoder, loss, backward, AdamW
update — is ONE jitted function; no per-feature H2D copies, no host sync
inside the step. AMP becomes bf16 compute dtype inside the model; GradScaler
is unnecessary (bf16 needs no loss scaling).
"""

from __future__ import annotations

import dataclasses
import time
from functools import partial
from typing import Any, Dict, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import Config
from ..data.featurizer import ItemFeatureTables
from ..models.baseline import SeqRecModel
from ..ops import losses as L
from . import telemetry as T
from .checkpoint import save_checkpoint


@dataclasses.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jnp.ndarray

    def tree_flatten(self):  # pragma: no cover - registered below
        return (self.params, self.opt_state, self.step), None


jax.tree_util.register_pytree_node(
    TrainState,
    lambda s: ((s.params, s.opt_state, s.step), None),
    lambda _, c: TrainState(*c),
)


def make_optimizer(cfg: Config) -> optax.GradientTransformation:
    t = cfg.train
    if t.weight_decay > 0.0:
        return optax.adamw(t.lr, b1=t.adam_b1, b2=t.adam_b2,
                           weight_decay=t.weight_decay)
    return optax.adam(t.lr, b1=t.adam_b1, b2=t.adam_b2)


def device_tables(item_tables: ItemFeatureTables) -> Dict[str, Any]:
    """Put the static item-feature + mm tables on device once."""
    return {
        "sparse": jnp.asarray(item_tables.sparse),
        "array": jnp.asarray(item_tables.array),
        "mm": {k: jnp.asarray(v) for k, v in item_tables.mm.items()},
    }


def compute_loss(model: SeqRecModel, params, batch, mm_tables, item_tables,
                 cfg: Config, train: bool, rng,
                 mesh=None) -> Tuple[jnp.ndarray, Dict]:
    if cfg.train.loss_type == "sampled_softmax":
        rng, neg_rng = jax.random.split(rng) if rng is not None \
            else (None, jax.random.key(0))
        log_feats = model.log2feats(params, batch, mm_tables, train=train,
                                    rng=rng, mesh=mesh)
        pos_embs = model.item_embeddings(params, batch["pos"],
                                         batch["pos_item_sparse"],
                                         batch["pos_item_array"], mm_tables)
        n = cfg.train.num_sampled_negatives
        neg_ids = jax.random.randint(neg_rng, (n,), 1, model.itemnum + 1)
        neg_sparse = jnp.take(item_tables["sparse"], neg_ids, axis=0, mode="clip")
        neg_array = jnp.take(item_tables["array"], neg_ids, axis=0, mode="clip")
        neg_embs = model.item_embeddings(params, neg_ids, neg_sparse,
                                         neg_array, mm_tables)
        loss_mask = batch["next_token_type"] == 1
        if "sample_valid" in batch:
            loss_mask &= batch["sample_valid"][:, None] > 0
        loss = L.sampled_softmax_loss(log_feats, pos_embs, neg_embs, neg_ids,
                                      batch["pos"], loss_mask, model.itemnum)
        return loss, {"loss": loss}
    pos_logits, neg_logits, loss_mask = model.logits(
        params, batch, mm_tables, item_tables, train=train, rng=rng, mesh=mesh)
    bce = L.reference_bce_loss(pos_logits, neg_logits, loss_mask)
    loss = bce
    if cfg.train.l2_emb > 0.0:
        loss = loss + L.l2_emb_penalty(params["item_emb"], cfg.train.l2_emb)
    return loss, {"loss": loss, "bce": bce}


def make_train_step(model: SeqRecModel, tx: optax.GradientTransformation,
                    cfg: Config, mesh=None):
    def step_fn(state: TrainState, batch, mm_tables, item_tables, rng):
        rng = jax.random.fold_in(rng, state.step)

        def loss_fn(params):
            return compute_loss(model, params, batch, mm_tables, item_tables,
                                cfg, train=True, rng=rng, mesh=mesh)

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        gleaves = [jnp.abs(g).max() for g in jax.tree.leaves(grads)]
        gmeans = [jnp.abs(g).mean() for g in jax.tree.leaves(grads)]
        metrics = dict(metrics)
        metrics["grad_max"] = jnp.max(jnp.stack(gleaves))
        metrics["grad_mean"] = jnp.mean(jnp.stack(gmeans))
        return TrainState(params, opt_state, state.step + 1), metrics

    return jax.jit(step_fn, donate_argnums=(0,))


def make_eval_step(model: SeqRecModel, cfg: Config):
    def step_fn(params, batch, mm_tables, item_tables):
        loss, metrics = compute_loss(model, params, batch, mm_tables,
                                     item_tables, cfg, train=False, rng=None)
        return metrics

    return jax.jit(step_fn)


def init_state(model: SeqRecModel, tx, seed: int) -> TrainState:
    params = model.init(jax.random.key(seed))
    return TrainState(params=params, opt_state=tx.init(params),
                      step=jnp.zeros((), jnp.int32))


def train_loop(model: SeqRecModel, cfg: Config, train_loader, valid_loader,
               item_tables: ItemFeatureTables,
               log_dir: Optional[str] = None,
               tb_dir: Optional[str] = None,
               ckpt_dir: Optional[str] = None,
               state: Optional[TrainState] = None,
               num_epochs: Optional[int] = None,
               verbose: bool = True) -> TrainState:
    """The reference epoch loop (main.py:154-269): train epochs with per-step
    telemetry, full validation pass per epoch, checkpoint per epoch."""
    tx = make_optimizer(cfg)
    if state is None:
        state = init_state(model, tx, cfg.train.seed)
    tables = device_tables(item_tables)
    mm_tables = tables["mm"]
    train_step = make_train_step(model, tx, cfg)
    eval_step = make_eval_step(model, cfg)
    rng = jax.random.key(cfg.train.seed + 1)

    epochs = num_epochs or cfg.train.num_epochs
    jlog = T.JsonlLogger(log_dir)
    tb = T.TBWriter(tb_dir)
    timer = T.StepTimer(total_steps=len(train_loader) * epochs)

    from ..data.pipeline import prefetch_to_device

    # O1's per-step validation scalars (BaseLineO1/main.py:191-203): a fixed
    # held-out batch scored every grad_log_every steps
    probe_batch = None
    if valid_loader is not None and len(valid_loader) > 0:
        probe_batch = jax.device_put(next(iter(valid_loader.epoch(0))))

    # Metrics stay on device and are fetched in batches every ``log_every``
    # steps — a per-step ``float(loss)`` would force a host<->device sync
    # per step and serialize the pipeline (the reference syncs every step,
    # ``main.py:206``; on TPU that can dominate step time).
    pending = []  # (record-dict-without-loss, device metrics)

    def flush(epoch):
        if not pending:
            return
        fetched = jax.device_get([m for _, m in pending])
        for (rec, _), m in zip(pending, fetched):
            loss = float(m["loss"])
            gs = rec["global_step"]
            rec["loss"] = loss
            jlog.write(rec)
            tb.scalar("Loss/train", loss, gs)
            tb.scalar("Performance/step_time", rec["step_time"], gs)
            tb.scalar("Performance/steps_per_second",
                      rec["steps_per_second"], gs)
            tb.scalar("Performance/examples_per_second_per_chip",
                      rec["steps_per_second"] * cfg.train.batch_size /
                      max(1, jax.device_count()), gs)
            if gs % cfg.train.grad_log_every == 0:
                # O1 telemetry set (BaseLineO1/main.py:296-314)
                tb.scalar("Gradient/max", float(m["grad_max"]), gs)
                tb.scalar("Gradient/mean", float(m["grad_mean"]), gs)
                tb.scalar("LearningRate/base", cfg.train.lr, gs)
        last_rec, last_m = pending[-1]
        if verbose:
            print(f"  epoch {epoch} step {last_rec['step'] + 1}/"
                  f"{len(train_loader)} "
                  f"loss {float(fetched[-1]['loss']):.4f} "
                  f"{last_rec['steps_per_second']:.2f} steps/s "
                  f"ETA {T.format_time(last_rec['estimated_remaining_time'])}")
        pending.clear()

    for epoch in range(1, epochs + 1):
        for step, batch in enumerate(
                prefetch_to_device(train_loader.epoch(epoch))):
            t0 = time.time()
            state, metrics = train_step(state, batch, mm_tables, tables, rng)
            rec = timer.tick(time.time() - t0)
            rec.update({"global_step": timer.global_step, "epoch": epoch,
                        "step": step})
            pending.append((rec, metrics))
            if (step + 1) % cfg.train.log_every == 0:
                flush(epoch)
            if probe_batch is not None and \
                    timer.global_step % cfg.train.grad_log_every == 0:
                vm = eval_step(state.params, probe_batch, mm_tables, tables)
                tb.scalar("Valid/loss", float(vm["loss"]), timer.global_step)
        flush(epoch)

        # validation pass (reference main.py:233-262)
        vstart = time.time()
        vloss, vsteps = 0.0, 0
        if valid_loader is not None:
            for batch in prefetch_to_device(valid_loader.epoch(0)):
                m = eval_step(state.params, batch, mm_tables, tables)
                vloss += float(m["loss"])
                vsteps += 1
        valid_loss = vloss / max(1, vsteps)
        vtime = time.time() - vstart
        tb.scalar("Loss/valid", valid_loss, timer.global_step)
        tb.scalar("Performance/validation_time", vtime, epoch)
        if verbose:
            print(f"epoch {epoch}: valid_loss {valid_loss:.4f} "
                  f"({T.format_time(vtime)})")
        if ckpt_dir:
            save_checkpoint(ckpt_dir, state, timer.global_step, valid_loss)

    jlog.close()
    tb.close()
    return state
