"""The full sequence-recommender model (reference ``BaselineModel`` role).

Functional re-design of ``model/BaseLine/model.py:81-433``: a static
:class:`SeqRecModel` descriptor (config + schema + vocab layout) with pure
methods over a parameter pytree. Entry points mirror the reference API:

- :meth:`forward`  — train-time pos/neg logits (``model.py:352-384``)
- :meth:`predict`  — last-position query vectors (``model.py:386-400``)
- :meth:`encode_items` — candidate-corpus item tower (``model.py:402-433``)

Everything is jittable with static shapes; multimodal vectors come from
device-resident tables (see models/embedding.py).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp

import contextvars

from ..config import ModelConfig
from ..data.featurizer import FusedVocab
from ..data.schema import FeatureSchema
from . import embedding as E
from . import encoder as ENC

#: Trace-scoped collector for EP a2a overflow counts (see ep_overflow_scope).
_EP_OVERFLOW_ACC: contextvars.ContextVar = contextvars.ContextVar(
    "ep_overflow_acc", default=None)


class ep_overflow_scope:
    """Collect the a2a bucket-overflow counts ``_ep_override`` emits during
    one loss trace, TRACE-PURELY: the accumulator lives in a context
    variable (per-thread, save/restore nesting), never on the shared frozen
    model object — two concurrent traces of the same ``SeqRecModel`` (train
    + eval jit on different threads, async eval) each see their own scope.
    ``counts`` holds the appended JAX values; sum it after the bracketed
    forward (trainer.compute_loss)."""

    def __enter__(self):
        self.counts = []
        self._token = _EP_OVERFLOW_ACC.set(self.counts)
        return self

    def __exit__(self, *exc):
        _EP_OVERFLOW_ACC.reset(self._token)
        return False


@dataclasses.dataclass(frozen=True)
class SeqRecModel:
    cfg: ModelConfig
    schema: FeatureSchema
    fused: FusedVocab
    usernum: int
    itemnum: int

    # ---- init ----------------------------------------------------------
    def init(self, key) -> Dict:
        k1, k2 = jax.random.split(key)
        params = E.init_embedding_params(k1, self.cfg, self.schema,
                                         self.fused, self.usernum,
                                         self.itemnum)
        params.update(ENC.init_encoder_params(k2, self.cfg))
        return params

    # ---- towers --------------------------------------------------------
    def _ep_override(self, params: Mapping, ids: jnp.ndarray,
                     mesh) -> Optional[jnp.ndarray]:
        """Explicit EP lookup for the DENSE mesh path: exchange only the ids
        each table shard owns via all-to-all (parallel/sharded_embedding.
        sharded_lookup_a2a) instead of XLA default SPMD.

        Measured (benchmarks/ep_ab.py, 8-dev mesh, 1M x 64 table, 16K ids):
        XLA's default gather transpose all-reduces the FULL dense table
        gradient (268 MB — 26.8 GB at the 100M-row target) and moves 4.2 MB
        forward; the a2a moves 1.06 MB each way and 8x less backward.
        Applies when the table is a plain array (sparse training gathers
        rows host-planned instead) on a data-only mesh; other meshes keep
        XLA SPMD (the a2a exchanges over ``data`` alone).

        Ids that overflow a shard's static bucket (capacity_factor 2.0)
        come back as ZERO embeddings and drop their table gradient, so the
        overflow count is appended to the enclosing
        :class:`ep_overflow_scope` (a context-var accumulator — trace-pure,
        no mutation of this shared frozen model) — trainer.compute_loss
        surfaces the sum as the ``ep_overflow`` step metric (alert on
        > 0)."""
        from ..ops.sparse_table import GatheredRows, is_packed

        tbl = params["item_emb"]
        if (mesh is None or isinstance(tbl, GatheredRows) or is_packed(tbl)
                or mesh.shape.get("data", 1) <= 1
                or any(mesh.shape.get(a, 1) != 1
                       for a in ("model", "seq", "pipe"))):
            return None
        from ..parallel.sharded_embedding import sharded_lookup_a2a

        emb, ovf = sharded_lookup_a2a(mesh, tbl, ids, return_overflow=True)
        acc = _EP_OVERFLOW_ACC.get()
        if acc is not None:
            acc.append(ovf)
        return emb.astype(jnp.dtype(self.cfg.dtype))

    def item_embeddings(self, params: Mapping, ids: jnp.ndarray,
                        item_sparse: jnp.ndarray, item_array: jnp.ndarray,
                        mm_tables: Mapping[str, jnp.ndarray],
                        mm_override: Optional[Mapping[str, jnp.ndarray]] = None,
                        lookup_site: Optional[str] = None,
                        mesh=None) -> jnp.ndarray:
        """Item tower on explicit ids+features (include_user=False path).

        ``mm_override`` supplies explicit multimodal vectors (candidate corpus
        cold items); otherwise vectors are gathered from ``mm_tables`` by id.
        ``lookup_site`` names the call site for sparse-training lookup plans.
        ``mesh`` routes the id-embedding gather through the explicit EP
        all-to-all on dense data-parallel meshes (see _ep_override).
        """
        mm_vecs = mm_override if mm_override is not None else \
            E.gather_mm(mm_tables, ids, self.schema,
                        dtype=jnp.dtype(self.cfg.dtype))
        return E.item_tower(params, ids, item_sparse, item_array, mm_vecs,
                            self.fused, self.schema, self.cfg,
                            lookup_site=lookup_site,
                            item_emb_override=self._ep_override(params, ids,
                                                                mesh))

    def dedup_spreads(self, params: Mapping, batch: Mapping,
                      mm_tables: Mapping[str, jnp.ndarray], mesh=None):
        """Tower-dedup candidate embeddings (``train.tower_dedup``).

        Runs the item tower ONCE on the batch's unique candidate ids
        (``dedup_uids`` + features, host-gathered by
        trainer.augment_batch_dedup) and spreads the [cap, D] outputs to
        each consumer site by its host plan — forward a gather, backward
        the scatter-free cumsum segment-sum (ops/sparse_table.
        planned_lookup). Returns (it_seq [B, L, D], pos_last [B, 1, D],
        negs [B, L, D] or [N, D] per loss type).

        STACKED mode (``dedup_uids`` [S, cap], pure data-parallel meshes):
        the tower broadcasts over the shard dim (id-emb lookups ride the
        explicit a2a, which shard_maps ids over ``data`` dim 0 already) and
        the spreads vmap over it, so every gather/cumsum stays shard-local;
        spread outputs merge the shard dim back into batch rows. Shared
        sampled-softmax negatives have no stacked plan — ``negs`` returns
        None and the caller towers them directly (trainer._compute_loss)."""
        from ..ops.sparse_table import planned_lookup

        uids = batch["dedup_uids"]
        stacked = uids.ndim == 2
        if mesh is not None and mesh.shape.get("data", 1) > 1 and not stacked:
            raise ValueError(
                "tower-dedup on a data>1 mesh requires the STACKED [S, cap] "
                "plan (augment_batch_dedup(n_data_shards=S)) — a 1-D plan "
                "would spread through replicated gathers against sharded "
                "batch rows")
        tu = self.item_embeddings(
            params, uids, batch["dedup_sparse"],
            batch["dedup_array"], mm_tables, lookup_site="dedup", mesh=mesh)

        def cons(x):
            if mesh is None:
                return x
            from jax.sharding import NamedSharding, PartitionSpec as P

            spec = (("pipe", "data"),) + (None,) * (x.ndim - 1)
            return jax.lax.with_sharding_constraint(
                x, NamedSharding(mesh, P(*spec)))

        def spread(site):
            if f"dedup_{site}_idx" not in batch:
                return None
            args = (batch[f"dedup_{site}_idx"],
                    batch[f"dedup_{site}_perm"],
                    batch[f"dedup_{site}_starts"],
                    batch[f"dedup_{site}_ends"])
            if not stacked:
                return planned_lookup(tu, *args)
            out = jax.vmap(planned_lookup)(tu, *args)   # [S, B/S, ..., D]
            return cons(out.reshape((-1,) + out.shape[2:]))

        return spread("seq"), spread("pos_last"), spread("negs")

    # ---- encoder (log2feats) ------------------------------------------
    def log2feats(self, params: Mapping, batch: Mapping,
                  mm_tables: Mapping[str, jnp.ndarray],
                  train: bool = False,
                  rng: Optional[jax.Array] = None, mesh=None,
                  pp_microbatches: int = 8,
                  return_item_tower: bool = False,
                  item_tower_override: Optional[jnp.ndarray] = None):
        if item_tower_override is None:
            seq_ids = jnp.where(batch["token_type"] == 1, batch["seq"], 0)
            ep = self._ep_override(params, seq_ids, mesh)
        else:
            ep = None   # the pre-computed tower already did its lookup
        fused_out = E.fuse_sequence(
            params, batch, mm_tables, self.fused, self.schema, self.cfg,
            item_emb_override=ep, return_item_tower=return_item_tower,
            item_tower_override=item_tower_override)
        fused_emb, it_seq = fused_out if return_item_tower \
            else (fused_out, None)
        enc_rng = None
        if rng is not None:
            rng, enc_rng = jax.random.split(rng)
        out = ENC.encode(params, fused_emb, batch["seq"],
                         batch["token_type"], params["pos_emb"], self.cfg,
                         train=train, rng=enc_rng, mesh=mesh,
                         pp_microbatches=pp_microbatches)
        return (out, it_seq) if return_item_tower else out

    # ---- training forward ---------------------------------------------
    def forward(self, params: Mapping, batch: Mapping,
                mm_tables: Mapping[str, jnp.ndarray],
                item_tables: Mapping[str, jnp.ndarray],
                train: bool = True, rng: Optional[jax.Array] = None,
                mesh=None, pp_microbatches: int = 8
                ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Returns (log_feats [B,L,D], pos_embs, neg_embs).

        Negative-item features are gathered on device from the static item
        tables by id (the host never materializes them — cf. reference
        ``dataset.py:159`` which does dict lookups per position).

        The POSITIVES' tower is the sequence item tower shifted by one:
        ``pos[idx] == seq[idx+1]`` with identical packed features by
        construction (data/dataset.TrainSampler — pos and the next seq slot
        pack the same record), so ``pos_embs[:, :-1] = it_seq[:, 1:]`` and
        only the final target column runs its own tower; positions whose
        next token is not an item are masked by the loss anyway. Halves the
        candidate-tower work vs running pos+neg as one batch (and quarters
        the reference's two separate full feat2emb passes,
        ``model.py:376-377``).
        """
        if "dedup_uids" in batch:
            # tower-dedup path (train.tower_dedup): one tower on the unique
            # candidate ids serves the seq site, the positives (shifted), the
            # final-target column, AND the negatives — spread by host plans
            it_seq, pos_last, neg_embs = self.dedup_spreads(
                params, batch, mm_tables, mesh=mesh)
            log_feats = self.log2feats(
                params, batch, mm_tables, train=train, rng=rng, mesh=mesh,
                pp_microbatches=pp_microbatches,
                item_tower_override=it_seq)
            pos_embs = jnp.concatenate([it_seq[:, 1:], pos_last], axis=1)
            return log_feats, pos_embs, neg_embs
        log_feats, it_seq = self.log2feats(
            params, batch, mm_tables, train=train, rng=rng, mesh=mesh,
            pp_microbatches=pp_microbatches, return_item_tower=True)
        last = slice(-1, None)
        pos_last = self.item_embeddings(
            params, batch["pos"][:, last],
            batch["pos_item_sparse"][:, last],
            batch["pos_item_array"][:, last], mm_tables,
            lookup_site="pos_last", mesh=mesh)
        pos_embs = jnp.concatenate(
            [it_seq[:, 1:].astype(pos_last.dtype), pos_last], axis=1)
        neg_sparse = jnp.take(item_tables["sparse"], batch["neg"], axis=0,
                              mode="clip")
        neg_array = jnp.take(item_tables["array"], batch["neg"], axis=0,
                             mode="clip")
        ids, sparse, array = batch["neg"], neg_sparse, neg_array
        if mesh is not None:
            # keep the candidate-tower path in the batch layout — without
            # the hint the SPMD partitioner re-shards the ids through a full
            # rematerialization (replicate-then-split)
            from jax.sharding import NamedSharding, PartitionSpec as P

            def cons(x, *spec):
                return jax.lax.with_sharding_constraint(
                    x, NamedSharding(mesh, P(*spec)))

            ids = cons(ids, ("pipe", "data"), "seq")
            sparse = cons(sparse, ("pipe", "data"), "seq")
            array = cons(array, ("pipe", "data"), "seq")
        neg_embs = self.item_embeddings(params, ids, sparse, array,
                                        mm_tables, lookup_site="posneg",
                                        mesh=mesh)
        if mesh is not None:
            neg_embs = cons(neg_embs, ("pipe", "data"), "seq")
        return log_feats, pos_embs, neg_embs

    def logits(self, params: Mapping, batch: Mapping,
               mm_tables: Mapping[str, jnp.ndarray],
               item_tables: Mapping[str, jnp.ndarray],
               train: bool = True, rng: Optional[jax.Array] = None,
               mesh=None, pp_microbatches: int = 8
               ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """(pos_logits, neg_logits, loss_mask) as in reference forward
        (``model.py:373-384``): dot products masked to next-item positions."""
        log_feats, pos_embs, neg_embs = self.forward(
            params, batch, mm_tables, item_tables, train=train, rng=rng,
            mesh=mesh, pp_microbatches=pp_microbatches)
        loss_mask = (batch["next_token_type"] == 1)
        if "sample_valid" in batch:
            loss_mask = jnp.logical_and(loss_mask,
                                        batch["sample_valid"][:, None] > 0)
        pos_logits = jnp.sum(log_feats * pos_embs, axis=-1)
        neg_logits = jnp.sum(log_feats * neg_embs, axis=-1)
        m = loss_mask.astype(pos_logits.dtype)
        return pos_logits * m, neg_logits * m, loss_mask

    # ---- inference -----------------------------------------------------
    def predict(self, params: Mapping, batch: Mapping,
                mm_tables: Mapping[str, jnp.ndarray]) -> jnp.ndarray:
        """Query vectors: encoding of the last position [B, D]
        (reference ``model.py:386-400``)."""
        log_feats = self.log2feats(params, batch, mm_tables, train=False)
        return log_feats[:, -1, :]

    def encode_items(self, params: Mapping, ids: jnp.ndarray,
                     item_sparse: jnp.ndarray, item_array: jnp.ndarray,
                     mm_vecs: Mapping[str, jnp.ndarray]) -> jnp.ndarray:
        """Candidate-corpus encoder (reference ``save_item_emb`` compute):
        plain item tower over [N] candidates with explicit mm vectors."""
        return self.item_embeddings(params, ids, item_sparse, item_array,
                                    mm_tables={}, mm_override=mm_vecs)
