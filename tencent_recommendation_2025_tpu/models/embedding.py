"""Embedding tables and feature-fusion towers (C3 + C4 of SURVEY.md §2.1).

TPU-first redesign of the reference's table layer
(``model/BaseLine/model.py:115-167,226-310``):

- the 18+ per-feature ``nn.Embedding`` tables collapse into **one fused table**
  addressed by per-feature row offsets (data/featurizer.FusedVocab), so every
  token's sparse+array features are fetched by a single gather — one big,
  MXU/HBM-friendly lookup instead of a python loop of small ones;
- torch's ``padding_idx=0`` becomes a functional mask: looked-up rows are
  multiplied by ``(id != 0)`` so padding contributes exactly zero embedding and
  zero gradient;
- multimodal vectors are **not** packed on the host per step; they live in
  dense id-indexed device tables and are gathered here by item id.

Parameter tree (plain pytree of jnp arrays; all float32, compute casts to the
config dtype):

    item_emb   [I+1, D]      user_emb [U+1, D]     pos_emb [2*maxlen+1, D]
    fused_feat [R, D]        mm_proj  {fid: {w,b}} itemdnn/userdnn {w,b}
"""

from __future__ import annotations

import functools
import math
from typing import Dict, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from ..data import schema as S
from ..data.featurizer import FusedVocab, ItemFeatureTables
from ..data.schema import FeatureSchema


# ---------------------------------------------------------------------------
# Initializers (reference main.py:95-111: xavier-normal for >=2-D, zeros for
# 1-D, padding row 0 zeroed on every table)
# ---------------------------------------------------------------------------

def xavier_normal(key, shape, dtype=jnp.float32):
    assert len(shape) >= 2, "xavier init is for >=2-D params"
    fan_in = int(np.prod(shape[:-1]))
    fan_out = shape[-1]
    std = math.sqrt(2.0 / (fan_in + fan_out))
    return jax.random.normal(key, shape, dtype) * std


def _emb_init(key, rows, dim, dtype=jnp.float32):
    # generate directly in the target dtype: a giant-f32-then-cast would
    # transiently hold BOTH copies (fatal at 50M+ rows on one chip)
    w = xavier_normal(key, (rows, dim), jnp.dtype(dtype))
    return w.at[0].set(0.0)  # padding row zeroed (reference main.py:106-111)


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4))
def _packed_emb_init(key, packed_shape, rows, dim, dtype):
    """Init a PACKED [V/R, 8, 128] table in place (no [V, D] staging —
    generating then repacking would transiently hold two giant copies).
    xavier std comes from the LOGICAL (rows, dim) fan. Row 0 (padding id)
    AND the <=31 physical pad rows beyond ``rows`` zero out — eval's
    l2_emb_penalty norms the raw array, so 'pad rows are never read' must
    actually hold.

    MUST run under jit: eager execution materializes each broadcasted_iota
    as its own [V/R, 8, 128] int32 program output — 25.6 GB at 100M rows,
    an instant OOM (measured: 'arguments 23.84G of 15.75G hbm'); fused,
    the only allocation is the table itself."""
    std = (2.0 / (rows + dim)) ** 0.5
    w = jax.random.normal(key, packed_shape, jnp.dtype(dtype)) * std
    per = 128 // dim                 # rows per sublane
    R = 8 * per
    # logical row of element [g, s, l] = g*R + s*per + l//dim
    g = jax.lax.broadcasted_iota(jnp.int32, packed_shape, 0)
    s = jax.lax.broadcasted_iota(jnp.int32, packed_shape, 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, packed_shape, 2)
    row = g * R + s * per + lane // dim
    keep = jnp.logical_and(row > 0, row < rows)
    return jnp.where(keep, w, 0).astype(jnp.dtype(dtype))


def linear_init(key, d_in, d_out):
    return {"w": xavier_normal(key, (d_in, d_out)),
            "b": jnp.zeros((d_out,), jnp.float32)}


def linear(p, x):
    return x @ p["w"] + p["b"]


def layernorm_init(dim, scale_init: float):
    """Reference init zeroes 1-D params *including LayerNorm scales*
    (main.py:95-102) — a faithful quirk behind ``reference_init``; sane mode
    uses scale 1."""
    return {"scale": jnp.full((dim,), scale_init, jnp.float32),
            "bias": jnp.zeros((dim,), jnp.float32)}


def layernorm(p, x, eps: float = 1e-8):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


# ---------------------------------------------------------------------------
# Tower dims (reference model.py:129-136)
# ---------------------------------------------------------------------------

def tower_dims(cfg: ModelConfig, schema: FeatureSchema) -> Tuple[int, int]:
    D = cfg.hidden_units
    userdim = D * (len(S.USER_SPARSE_IDS) + 1 + len(S.USER_ARRAY_IDS)) \
        + len(S.USER_CONTINUAL_IDS)
    itemdim = D * (len(S.ITEM_SPARSE_IDS) + 1 + len(S.ITEM_ARRAY_IDS)) \
        + len(S.ITEM_CONTINUAL_IDS) + D * len(schema.mm_emb_ids)
    return userdim, itemdim


def init_embedding_params(key, cfg: ModelConfig, schema: FeatureSchema,
                          fused: FusedVocab, usernum: int, itemnum: int
                          ) -> Dict:
    keys = jax.random.split(key, 8)
    userdim, itemdim = tower_dims(cfg, schema)
    D = cfg.hidden_units
    from ..ops.sparse_table import packed_table_shape

    # big tables are STORED PACKED [V/R, 8, 128] (tile-compact layout):
    # any XLA op on a huge [V, 64] table stages a lane-padded 2x copy of
    # the whole thing — see ops/sparse_table.packed_table_shape
    packed = packed_table_shape(itemnum + 1, D) \
        if getattr(cfg, "pack_big_tables", True) else None
    params = {
        "item_emb": _packed_emb_init(keys[0], packed, itemnum + 1, D,
                                     jnp.dtype(cfg.table_dtype))
        if packed is not None else
        _emb_init(keys[0], itemnum + 1, D,
                  dtype=jnp.dtype(cfg.table_dtype)),
        "user_emb": _emb_init(keys[1], usernum + 1, D),
        "pos_emb": _emb_init(keys[2], 2 * cfg.maxlen + 1, D),
        "fused_feat": _emb_init(keys[3], fused.total_rows, D),
        "itemdnn": linear_init(keys[4], itemdim, D),
        "userdnn": linear_init(keys[5], userdim, D),
        "mm_proj": {},
    }
    mm_keys = jax.random.split(keys[6], max(1, len(schema.mm_emb_ids)))
    for i, fid in enumerate(schema.mm_emb_ids):
        params["mm_proj"][fid] = linear_init(mm_keys[i],
                                             schema.item_emb_dims[fid], D)
    return params


# ---------------------------------------------------------------------------
# Lookups
# ---------------------------------------------------------------------------

# one-hot-matmul thresholds: tiny vocabularies run the WHOLE lookup as
# one-hot matmuls (the gather runs at ~10 GB/s effective on v5e — DMA
# row-granularity bound — while a [tokens, vocab] @ [vocab, D] matmul is
# MXU-cheap); mid-size vocabs keep the gather forward but take the one-hot
# backward; large ones fall back to XLA gather/scatter entirely.
ONEHOT_FWD_MAX_VOCAB = 1024
ONEHOT_BWD_MAX_VOCAB = 16384


def _maybe_sizes(fused: "FusedVocab", fids):
    """(static offsets, static sizes) for the one-hot backward, or None."""
    sizes = fused.group_sizes(fids)
    if sizes and max(sizes) <= ONEHOT_BWD_MAX_VOCAB:
        offs = tuple(fused.offsets[fused.slot(f)] for f in fids)
        return offs, sizes
    return None


def _onehot_full_lookup(table, ids, offsets_t, sizes_t, dtype):
    """Whole lookup as per-feature one-hot matmuls (forward AND backward are
    MXU matmuls; autodiff supplies the transpose). ids [..., F] -> [..., F, D].
    Slots sharing an offset (array-capacity slots) batch into one matmul."""
    D = table.shape[-1]
    if dtype is not None:
        table = table.astype(dtype)
    F = len(offsets_t)
    *lead, _ = ids.shape
    flat = ids.reshape(-1, F)
    groups = {}
    for f in range(F):
        groups.setdefault((offsets_t[f], sizes_t[f]), []).append(f)
    cols = [None] * F
    for (offset, vocab), fs in groups.items():
        sl = table[offset + 1: offset + 1 + vocab]        # [vocab, D]
        ids_cat = jnp.concatenate([flat[:, f] for f in fs])
        onehot = jax.nn.one_hot(ids_cat - 1, vocab, dtype=sl.dtype)
        onehot = onehot * (ids_cat > 0)[:, None].astype(sl.dtype)
        out = onehot @ sl                                  # [n*|fs|, D]
        parts = jnp.split(out, len(fs), axis=0)
        for f, part in zip(fs, parts):
            cols[f] = part
    stacked = jnp.stack(cols, axis=1)                      # [n, F, D]
    return stacked.reshape(*lead, F, D)

def masked_take(table: jnp.ndarray, ids: jnp.ndarray,
                dtype=None, site=None, dim=None) -> jnp.ndarray:
    """``table[ids] * (ids != 0)`` — the padding_idx-0 contract.

    mode='clip': out-of-range ids clamp to the last row instead of jnp's
    default fill-with-NaN (torch would raise; clamping keeps the step alive
    and the dataset layer is responsible for id validity).

    ``dtype``: cast the TABLE before the gather — the gathered activations
    (the big buffers: [B, L, F, D]) come out in compute precision instead of
    f32, halving their HBM footprint/traffic; casting the table itself is a
    few MB.

    ``table`` may also be an :class:`ops.sparse_table.GatheredRows` — the
    sparse-training stand-in holding only the step's touched rows — in which
    case ids resolve by searchsorted against the gathered prefix and the
    gradient lands on the [K, D] rows instead of the [V, D] table.
    """
    from ..ops.sparse_table import GatheredRows, is_packed, row_take

    if isinstance(table, GatheredRows):
        emb = table.lookup(ids, site=site)
        if dtype is not None:
            emb = emb.astype(dtype)
        return emb * (ids != 0)[..., None].astype(emb.dtype)
    if is_packed(table):
        # packed big table (see ops/sparse_table.packed_table_shape): the
        # width is not recoverable from the packed shape — callers pass
        # ``dim`` (= cfg.hidden_units for item_emb, the only packed table)
        emb = row_take(table, ids, dim=dim)
        if dtype is not None:
            emb = emb.astype(dtype)
        return emb * (ids != 0)[..., None].astype(emb.dtype)
    if dtype is not None:
        table = table.astype(dtype)
    return _zero_safe_take(table, ids)


@jax.custom_vjp
def _zero_safe_take(table, ids):
    """``take * (ids != 0)`` whose backward DROPS padding-id contributions.

    Recsys batches are full of id-0 lanes (padding, masked token types) and
    XLA's take-transpose is a scatter-add that SERIALIZES on duplicate
    indices on TPU — ~131K collisions on row 0 measured 14.4 ms of the user
    tower's 15.1 ms backward at the flagship shape. Those contributions are
    exactly zero (the mask above) and the reference's padding_idx=0 contract
    freezes row 0 anyway (torch nn.Embedding zeroes its grad), so the
    backward scatters only id>0 lanes (row-0 grad is identically 0)."""
    emb = jnp.take(table, ids, axis=0, mode="clip")
    return emb * (ids != 0)[..., None].astype(emb.dtype)


def _zst_fwd(table, ids):
    # the table rides along only for its shape/dtype (same pattern as
    # _fl_fwd); residuals must be JAX types
    return _zero_safe_take(table, ids), (table, ids)


def _zst_bwd(res, cot):
    table, ids = res
    V = table.shape[0]
    ok = ids != 0
    safe = jnp.where(ok, ids, V)        # out of range -> mode="drop"
    cot = cot * ok[..., None].astype(cot.dtype)
    dtable = jnp.zeros(table.shape, cot.dtype).at[safe].add(cot, mode="drop")
    return dtable.astype(table.dtype), None


_zero_safe_take.defvjp(_zst_fwd, _zst_bwd)


def fused_feature_lookup(fused_table: jnp.ndarray, ids: jnp.ndarray,
                         offsets: jnp.ndarray, dtype=None,
                         vocab_sizes=None) -> jnp.ndarray:
    """ids [..., F] with per-slot offsets [F] -> embeddings [..., F, D].

    Row = offset[f] + id when id > 0, the shared zero row otherwise.

    With ``vocab_sizes`` = (static offsets, static sizes) tuples, the
    gradient uses the one-hot-matmul path instead of XLA scatter-add, and
    tiny vocabularies run the forward as one-hot matmuls too.
    """
    if vocab_sizes is not None:
        off_t, sizes_t = vocab_sizes
        if max(sizes_t) <= ONEHOT_FWD_MAX_VOCAB:
            return _onehot_full_lookup(fused_table, ids, tuple(off_t),
                                       tuple(sizes_t), dtype)
        return _fused_lookup_onehot_bwd(
            fused_table, ids, offsets, tuple(off_t), tuple(sizes_t),
            str(dtype) if dtype is not None else None)
    global_ids = jnp.where(ids > 0, ids + offsets, 0)
    return masked_take(fused_table, global_ids, dtype=dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _fused_lookup_onehot_bwd(fused_table, ids, offsets, offsets_t,
                             sizes_t, dtype_str):
    """Forward = the fast gather; backward computes the table gradient as
    per-feature one-hot matmuls written at *static* row offsets.

    XLA's take-transpose is a scatter-add, which serializes badly on TPU
    (millions of conflicting 64-wide updates); ``onehot^T @ cotangent`` is an
    MXU matmul per feature and the concat offsets are static, so the whole
    table gradient assembles without any dynamic scatter. Worth it only for
    modest vocabularies (FLOPs scale with vocab * tokens * D).
    """
    dtype = jnp.dtype(dtype_str) if dtype_str else None
    global_ids = jnp.where(ids > 0, ids + offsets, 0)
    return masked_take(fused_table, global_ids, dtype=dtype)


def _fl_fwd(fused_table, ids, offsets, offsets_t, sizes_t, dtype_str):
    out = _fused_lookup_onehot_bwd(fused_table, ids, offsets, offsets_t,
                                   sizes_t, dtype_str)
    # the table rides along only for its (possibly shard-padded) shape/dtype;
    # residuals must be JAX types, and keeping the reference costs nothing
    return out, (fused_table, ids)


def _fl_bwd(offsets_t, sizes_t, dtype_str, res, cot):
    table, ids = res
    table_shape, table_dtype = table.shape, table.dtype
    F = len(offsets_t)
    flat_ids = ids.reshape(-1, F)
    flat_cot = cot.reshape(-1, F, cot.shape[-1]).astype(jnp.float32)

    # several slots may address the SAME feature rows (array features repeat
    # an offset once per capacity slot) — concatenate their ids/cotangents
    # and do ONE one-hot matmul per distinct feature (keeps the graph small)
    groups = {}
    for f in range(F):
        groups.setdefault((offsets_t[f], sizes_t[f]), []).append(f)
    per_offset = {}
    for (offset, vocab), fs in groups.items():
        ids_cat = jnp.concatenate([flat_ids[:, f] for f in fs])
        cot_cat = jnp.concatenate([flat_cot[:, f, :] for f in fs])
        onehot = jax.nn.one_hot(ids_cat - 1, vocab,
                                dtype=jnp.float32)          # id v -> col v-1
        onehot = onehot * (ids_cat > 0)[:, None]
        per_offset[(offset, vocab)] = onehot.T @ cot_cat    # [vocab, D]

    # assemble rows in offset order; gaps (padding slots) get zeros
    pieces = [jnp.zeros((1, cot.shape[-1]), jnp.float32)]   # shared row 0
    row = 1
    for (offset, vocab), dslice in sorted(per_offset.items()):
        gap = offset + 1 - row
        if gap > 0:
            pieces.append(jnp.zeros((gap, cot.shape[-1]), jnp.float32))
        pieces.append(dslice)
        row = offset + 1 + vocab
    if table_shape[0] > row:
        pieces.append(jnp.zeros((table_shape[0] - row, cot.shape[-1]),
                                jnp.float32))
    dtable = jnp.concatenate(pieces, axis=0).astype(table_dtype)
    return dtable, None, None


_fused_lookup_onehot_bwd.defvjp(_fl_fwd, _fl_bwd)


def _array_feature_lookup(table, ids, fused: "FusedVocab", fids, dtype):
    """Array features [..., F, CAP] -> per-feature summed embeddings
    [..., F, D]. The (F, CAP) axes flatten into F*CAP lookup slots (repeating
    each feature's offset CAP times) so the one-hot backward applies — array
    lookups carry the most ids of any tower input (F*CAP per token)."""
    *lead, F, CAP = ids.shape
    flat = ids.reshape(*lead, F * CAP)
    offs = tuple(fused.offsets[fused.slot(f)] for f in fids)
    sizes = fused.group_sizes(fids)
    off_rep = jnp.asarray(np.repeat(np.asarray(offs), CAP), jnp.int32)
    static = ((tuple(np.repeat(np.asarray(offs), CAP).tolist()),
               tuple(np.repeat(np.asarray(sizes), CAP).tolist()))
              if max(sizes) <= ONEHOT_BWD_MAX_VOCAB else None)
    emb = fused_feature_lookup(table, flat, off_rep, dtype=dtype,
                               vocab_sizes=static)
    return emb.reshape(*lead, F, CAP, -1).sum(axis=-2)


# ---------------------------------------------------------------------------
# Towers (reference feat2emb, model.py:226-310)
# ---------------------------------------------------------------------------

def item_tower(params: Mapping, ids: jnp.ndarray,
               item_sparse: jnp.ndarray, item_array: jnp.ndarray,
               mm_vecs: Mapping[str, jnp.ndarray],
               fused: FusedVocab, schema: FeatureSchema,
               cfg: ModelConfig,
               item_emb_override: Optional[jnp.ndarray] = None,
               lookup_site: Optional[str] = None) -> jnp.ndarray:
    """Item-token embedding: id emb ++ sparse ++ array-sum ++ mm-proj -> DNN.

    Feature concat order matches the reference's ``item_feat_list`` build
    (id emb, then ITEM_SPARSE order, ITEM_ARRAY order, continual, mm order).
    ``item_emb_override`` lets the sharded-table layer substitute a
    pre-gathered id embedding. ``lookup_site`` names this call site for the
    sparse-training lookup plans (ops/sparse_table.GatheredRows).
    """
    dtype = jnp.dtype(cfg.dtype)
    id_emb = item_emb_override if item_emb_override is not None \
        else masked_take(params["item_emb"], ids, dtype=dtype,
                         site=lookup_site, dim=cfg.hidden_units)
    feats = [id_emb.astype(dtype)]

    if fused.n_item_sparse:
        off = jnp.asarray([fused.offsets[fused.slot(f)]
                           for f in S.ITEM_SPARSE_IDS], jnp.int32)
        sp = fused_feature_lookup(params["fused_feat"], item_sparse, off,
                                  dtype=dtype,
                                  vocab_sizes=_maybe_sizes(fused, S.ITEM_SPARSE_IDS))
        feats.append(sp.reshape(*sp.shape[:-2], -1))
    if fused.n_item_array:
        ar = _array_feature_lookup(params["fused_feat"], item_array, fused,
                                   S.ITEM_ARRAY_IDS, dtype)
        feats.append(ar.reshape(*ar.shape[:-2], -1))
    for fid in schema.mm_emb_ids:
        v = mm_vecs[fid].astype(dtype)
        proj = {"w": params["mm_proj"][fid]["w"].astype(dtype),
                "b": params["mm_proj"][fid]["b"].astype(dtype)}
        feats.append(linear(proj, v))

    x = jnp.concatenate(feats, axis=-1)
    dnn = {"w": params["itemdnn"]["w"].astype(dtype),
           "b": params["itemdnn"]["b"].astype(dtype)}
    return jax.nn.relu(linear(dnn, x))


def user_tower(params: Mapping, ids: jnp.ndarray,
               user_sparse: jnp.ndarray, user_array: jnp.ndarray,
               fused: FusedVocab, cfg: ModelConfig,
               lookup_site: Optional[str] = None) -> jnp.ndarray:
    dtype = jnp.dtype(cfg.dtype)
    feats = [masked_take(params["user_emb"], ids, dtype=dtype,
                         site=lookup_site, dim=cfg.hidden_units)]
    if fused.n_user_sparse:
        off = jnp.asarray([fused.offsets[fused.slot(f)]
                           for f in S.USER_SPARSE_IDS], jnp.int32)
        sp = fused_feature_lookup(params["fused_feat"], user_sparse, off,
                                  dtype=dtype,
                                  vocab_sizes=_maybe_sizes(fused, S.USER_SPARSE_IDS))
        feats.append(sp.reshape(*sp.shape[:-2], -1))
    if fused.n_user_array:
        ar = _array_feature_lookup(params["fused_feat"], user_array, fused,
                                   S.USER_ARRAY_IDS, dtype)
        feats.append(ar.reshape(*ar.shape[:-2], -1))
    x = jnp.concatenate(feats, axis=-1)
    dnn = {"w": params["userdnn"]["w"].astype(dtype),
           "b": params["userdnn"]["b"].astype(dtype)}
    return jax.nn.relu(linear(dnn, x))


def gather_mm(mm_tables: Mapping[str, jnp.ndarray], ids: jnp.ndarray,
              schema: FeatureSchema, dtype=None) -> Dict[str, jnp.ndarray]:
    """Device-side gather of frozen multimodal vectors by item id.

    Replaces the reference's per-step host packing of [B, L, mm_dim] arrays
    (``model.py:281-299``). id 0 (padding / user tokens / cold items) hits the
    zero row, matching ``fill_missing_feat``'s zero default.
    """
    return {fid: jnp.take(mm_tables[fid].astype(dtype) if dtype is not None
                          else mm_tables[fid], ids, axis=0, mode="clip")
            for fid in schema.mm_emb_ids}


def fuse_sequence(params: Mapping, batch: Mapping, mm_tables: Mapping,
                  fused: FusedVocab, schema: FeatureSchema,
                  cfg: ModelConfig,
                  item_emb_override: Optional[jnp.ndarray] = None,
                  return_item_tower: bool = False,
                  item_tower_override: Optional[jnp.ndarray] = None):
    """The include_user=True fusion (reference model.py:302-310): run both
    towers on the full sequence and add them. Token disambiguation multiplies
    ids by the type mask before lookup (reference model.py:239-243).
    ``item_emb_override``: pre-gathered id embeddings for the item tokens
    (the explicit EP lookup path — models/baseline._ep_override).
    ``item_tower_override``: the WHOLE item tower pre-computed [B, L, D]
    (the tower-dedup spread — models/baseline.dedup_spreads); the
    per-position feature arrays are not touched in that case (the dedup'd
    batch ships without them)."""
    seq = batch["seq"]
    tt = batch["token_type"]
    user_ids = jnp.where(tt == 2, seq, 0)
    if item_tower_override is not None:
        it = item_tower_override.astype(jnp.dtype(cfg.dtype))
    else:
        item_ids = jnp.where(tt == 1, seq, 0)
        mm_vecs = gather_mm(mm_tables, item_ids, schema,
                            dtype=jnp.dtype(cfg.dtype))
        it = item_tower(params, item_ids, batch["seq_item_sparse"],
                        batch["seq_item_array"], mm_vecs, fused, schema, cfg,
                        lookup_site="seq",
                        item_emb_override=item_emb_override)
    # user tokens are SPARSE (the TencentGR layout carries ONE user-profile
    # record per sequence — reference dataset.py:115-121): run the user
    # tower on the first MAX_USER_TOKENS_PER_ROW gathered positions per row
    # instead of all [B, L] (its backward at [B, L] measured 15 ms of the
    # flagship step), and broadcast the all-zero-input constant elsewhere —
    # EXACT because user features are zero-filled at non-user positions
    # (dataset.py:144-153) and the samplers enforce the token cap loudly.
    from ..config import MAX_USER_TOKENS_PER_ROW as K

    B, L = seq.shape
    dtype = jnp.dtype(cfg.dtype)
    is_u = tt == 2
    # earliest K user positions per row (top_k of a descending-iota score)
    score = jnp.where(is_u,
                      -jax.lax.broadcasted_iota(jnp.int32, (B, L), 1),
                      jnp.full((B, L), -L - 1, jnp.int32))
    _, posk = jax.lax.top_k(score, K)                      # [B, K]
    validk = jnp.take_along_axis(is_u, posk, axis=1)       # [B, K]
    rows = jnp.arange(B)[:, None]
    vk = validk.astype(jnp.int32)
    uk = user_ids[rows, posk] * vk
    spk = batch["seq_user_sparse"][rows, posk] * vk[..., None]
    ark = batch["seq_user_array"][rows, posk] * vk[..., None, None]
    utk = user_tower(params, uk, spk, ark, fused, cfg,
                     lookup_site="user")                   # [B, K, D]
    zshape = lambda t: jnp.zeros((1, 1) + t.shape[2:], t.dtype)  # noqa: E731
    const = user_tower(params, zshape(uk), zshape(spk), zshape(ark),
                       fused, cfg)                         # [1, 1, D]
    onehot = jnp.logical_and(
        posk[:, :, None] == jax.lax.broadcasted_iota(jnp.int32, (1, 1, L), 2),
        validk[:, :, None]).astype(dtype)                  # [B, K, L]
    ut = const + jnp.einsum("bkl,bkd->bld", onehot,
                            (utk - const).astype(dtype))
    if return_item_tower:
        # the positives' tower reuses this (models/baseline.forward):
        # pos[idx] == seq[idx+1] with identical features by construction
        return it + ut, it
    return it + ut
