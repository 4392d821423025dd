"""Row-sharded embedding tables with explicit cross-shard lookup (F3).

The reference keeps every table on one device (``model.py:115-117,158-167``).
Here large tables (item ids, the fused feature vocab — the 100M-row target of
BASELINE.json configs[4]) are **row-sharded** over the flattened
(data, model) mesh axes, and lookups run under ``shard_map`` with static
shapes:

1. ``all_gather`` the local ids over the batch (data) axis — every shard sees
   the global id list (ints: cheap);
2. each shard gathers rows it owns from its local slice, zeros elsewhere
   (one ``take`` + mask — no host loops, no dynamic shapes);
3. ``psum_scatter`` over the data axis sums shard contributions and hands
   each data-rank back exactly its own batch rows; a ``psum`` over the model
   axis first combines shards that live on the same data-rank.

The transpose (gradient) is automatic under shard_map: take's transpose is a
scatter-add into the owning shard, psum_scatter's is all_gather — i.e. the
sparse-gradient combine falls out of differentiation instead of hand-written
NCCL code.

Padding-id semantics match ``embedding.masked_take``: row 0 contributes zeros
via the ``(id != 0)`` mask.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def num_table_shards(mesh: Mesh, axes: Tuple[str, ...] = ("data", "model")
                     ) -> int:
    return int(np.prod([mesh.shape[a] for a in axes]))


def pad_rows(table: jnp.ndarray, n_shards: int) -> jnp.ndarray:
    """Pad the row count to a multiple of n_shards (padding rows are never
    addressed: ids are < true row count)."""
    rows = table.shape[0]
    padded = n_shards * (-(-rows // n_shards))
    if padded != rows:
        table = jnp.pad(table, ((0, padded - rows), (0, 0)))
    return table


def shard_table(mesh: Mesh, table: jnp.ndarray,
                axes: Tuple[str, ...] = ("data", "model")) -> jnp.ndarray:
    """Place a [V, D] table row-sharded over the given mesh axes."""
    t = pad_rows(table, num_table_shards(mesh, axes))
    return jax.device_put(t, NamedSharding(mesh, P(axes, None)))


def sharded_lookup(mesh: Mesh, table: jnp.ndarray, ids: jnp.ndarray,
                   mask_zero: bool = True) -> jnp.ndarray:
    """Differentiable sharded lookup: table [V, D] sharded P(('data','model')),
    ids [B, ...] sharded P('data'). Returns [B, ..., D] sharded P('data').

    Works for any mesh including trivial (1,1,1).
    """
    n_data = mesh.shape["data"]
    n_model = mesh.shape["model"]
    n_shards = n_data * n_model
    V = table.shape[0]
    rows_per_shard = -(-V // n_shards)

    def local_fn(tbl, local_ids):
        # tbl: [rows_per_shard, D] this shard's rows
        # local_ids: [B_loc, ...] this data-rank's ids (replicated over model)
        di = jax.lax.axis_index("data")
        mi = jax.lax.axis_index("model")
        shard_idx = di * n_model + mi
        lo = shard_idx * rows_per_shard

        # 1) everyone sees the global id list
        gids = jax.lax.all_gather(local_ids, "data", tiled=True)  # [B_glob,...]
        # 2) gather owned rows, zero elsewhere
        rel = gids - lo
        owned = (rel >= 0) & (rel < rows_per_shard)
        if mask_zero:
            owned = owned & (gids != 0)
        rel = jnp.clip(rel, 0, rows_per_shard - 1)
        emb = jnp.take(tbl, rel, axis=0)
        emb = emb * owned[..., None].astype(emb.dtype)
        # 3) combine shards: psum over model (same data-rank), then
        #    reduce-scatter over data returns each rank its own batch rows
        emb = jax.lax.psum(emb, "model")
        emb = jax.lax.psum_scatter(emb, "data", scatter_dimension=0,
                                   tiled=True)
        return emb

    in_specs = (P(("data", "model"), None), P("data"))
    out_specs = P("data")
    fn = jax.shard_map(local_fn, mesh=mesh, in_specs=in_specs,
                       out_specs=out_specs, check_vma=False)
    table = pad_rows(table, n_shards)
    return fn(table, ids)


def dense_lookup_oracle(table: jnp.ndarray, ids: jnp.ndarray,
                        mask_zero: bool = True) -> jnp.ndarray:
    """Single-device reference semantics (== embedding.masked_take)."""
    emb = jnp.take(table, ids, axis=0)
    if mask_zero:
        emb = emb * (ids != 0)[..., None].astype(emb.dtype)
    return emb


# ---------------------------------------------------------------------------
# All-to-all variant: exchange only the ids each shard owns instead of
# all-gathering the full [B_glob, ..., D] payload sum. Wins when
# B_glob*L >> capacity per shard; requires a static per-shard capacity.
# ---------------------------------------------------------------------------

def sharded_lookup_a2a(mesh: Mesh, table: jnp.ndarray, ids: jnp.ndarray,
                       capacity_factor: float = 4.0,
                       mask_zero: bool = True,
                       return_overflow: bool = False):
    """All-to-all id-exchange lookup over the ``data`` axis (model must be 1).

    Each data-rank sorts its ids into per-owner buckets of static capacity
    ``ceil(n_local / n_shards * capacity_factor)`` (overflow ids fall back to
    zero vectors — caller picks capacity), all-to-alls the buckets, gathers
    locally, and all-to-alls the embeddings back.

    Capacity pressure comes from REPEATED ids (each occurrence takes a
    bucket slot; ownership is contiguous-range, so a hot item concentrates
    on one shard) — padding ids are excluded from bucketing entirely under
    ``mask_zero``. The default factor 4 tolerates up to half of a rank's
    real ids landing on one owner; the exchanged payload stays ~100x under
    XLA default SPMD's full-table-gradient all-reduce (benchmarks/ep_ab.py),
    and overflow is observable (``ep_overflow`` metric, alert on > 0).

    With ``return_overflow`` the call also returns the GLOBAL count of ids
    that overflowed their bucket (and therefore returned zero vectors) — a
    runtime signal for under-sized ``capacity_factor``; log it, alert on >0.
    """
    n_data = mesh.shape["data"]
    assert mesh.shape["model"] == 1, "a2a path assumes model axis of size 1"
    V = table.shape[0]
    rows_per_shard = -(-V // n_data)
    orig_shape = ids.shape

    def local_fn(tbl, local_ids):
        di = jax.lax.axis_index("data")
        flat = local_ids.reshape(-1)
        n_local = flat.shape[0]
        cap = int(np.ceil(n_local / n_data * capacity_factor))
        # padding ids (0) route to the SENDING shard: recsys batches are
        # full of them and they'd all bucket at shard 0 (owner of row 0),
        # overflowing its capacity and silently zeroing real low ids; the
        # output for id 0 is masked regardless of which shard served it
        owner = jnp.clip(flat // rows_per_shard, 0, n_data - 1)
        owner = jnp.where(flat == 0, di, owner)
        real = flat != 0

        # stable bucket-position of each id within its owner group; with
        # mask_zero, padding ids skip bucketing entirely (their output is
        # masked to zero regardless) so they neither consume capacity nor
        # count as overflow — recsys batches are MOSTLY padding lanes
        onehot = jax.nn.one_hot(owner, n_data, dtype=jnp.int32)  # [n, S]
        if mask_zero:
            onehot = onehot * real[:, None].astype(jnp.int32)
        pos_in_owner = jnp.cumsum(onehot, axis=0) - 1             # [n, S]
        my_pos = jnp.take_along_axis(pos_in_owner, owner[:, None],
                                     axis=1)[:, 0]                 # [n]
        ok = my_pos < cap
        if mask_zero:
            ok = jnp.logical_and(ok, real)

        # scatter ids into [S, cap] send buckets; overflow ids go to the
        # out-of-range column `cap` so mode="drop" actually discards them
        # (cap-1 is in range and would clobber a legitimately bucketed id)
        buckets = jnp.zeros((n_data, cap), dtype=flat.dtype)
        buckets = buckets.at[owner, jnp.where(ok, my_pos, cap)].set(
            flat, mode="drop")
        # exchange: row s of my buckets goes to shard s
        recv = jax.lax.all_to_all(buckets, "data", split_axis=0,
                                  concat_axis=0, tiled=True)  # [S*cap]? -> [S, cap]
        recv = recv.reshape(n_data, cap)
        # local gather of owned rows
        lo = di * rows_per_shard
        rel = jnp.clip(recv - lo, 0, rows_per_shard - 1)
        emb = jnp.take(tbl, rel, axis=0)                      # [S, cap, D]
        if mask_zero:
            emb = emb * (recv != 0)[..., None].astype(emb.dtype)
        # send embeddings back
        back = jax.lax.all_to_all(emb, "data", split_axis=0, concat_axis=0,
                                  tiled=True).reshape(n_data, cap, -1)
        # un-bucket: each id reads its row from [owner, my_pos]
        got = back[owner, jnp.where(ok, my_pos, 0)]
        got = jnp.where(ok[:, None], got, 0.0)
        # overflow = REAL ids that didn't fit their bucket (zero embeddings,
        # dropped grads); padding ids are excluded — zeros are their answer
        n_over = jax.lax.psum(jnp.sum(jnp.logical_and(~ok, real)), "data")
        return got.reshape(*local_ids.shape, -1), n_over[None]

    fn = jax.shard_map(local_fn, mesh=mesh,
                       in_specs=(P(("data", "model"), None), P("data")),
                       out_specs=(P("data"), P()), check_vma=False)
    emb, n_over = fn(pad_rows(table, n_data), ids)
    if return_overflow:
        return emb, n_over[0]
    return emb
