"""Sparse embedding-table training: dedup'd row gather + row-sparse updates.

The reference trains its tables densely — ``nn.Embedding`` produces a dense
gradient and AdamW touches every row every step
(``model/BaseLine/model.py:115-117``, ``main.py:131``). At the north-star
100M-row table (BASELINE.json configs[4]) that is ~75 GB of optimizer traffic
per step. TPU-native replacement (the "gather-train" pattern; all shapes
static for XLA):

1. collect every item id the step touches, ``jnp.unique(ids, size=K,
   fill_value=V)`` — K is the static touch capacity, the sentinel V sorts
   after every real id so the unique prefix stays sorted;
2. gather those K rows once; the loss is differentiated w.r.t. the gathered
   ``rows`` [K, D] (dense but tiny), never the [V, D] table;
3. lookups inside the model resolve ids against the gathered rows via
   ``searchsorted`` (:class:`GatheredRows` slots into ``masked_take``);
4. the optimizer updates only the K touched rows: moments are gathered,
   updated, and scattered back — per-step cost O(K·D), independent of V.

Row optimizers:

- ``lazy_adam`` — Adam with the global step count as t for touched rows
  (torch.optim.SparseAdam semantics); moments are [V, D] in HBM but only K
  rows move per step;
- ``rowwise_adagrad`` — per-ROW accumulator [V] (the production recsys
  choice, cf. TPU embedding APIs): 4 bytes/row of optimizer state, so a
  100M-row table carries 0.4 GB of state instead of 51 GB.

Storage: tables >= TABLE_PACK_MIN_ROWS are PACKED [V/R, 8, 128]
(packed_table_shape) — the compact-layout fix that keeps every table touch
copy-free — and update via whole-group writes planned on the host
(host_group_plan) and executed by the aliased Pallas DMA scatter
(pallas_group_scatter). Smaller tables stay [V, D] with XLA row scatters.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax
import jax.numpy as jnp


@jax.custom_vjp
def planned_lookup(rows, idx, perm, starts, ends):
    """rows[idx] with a host-precomputed segment-sum backward.

    The naive transpose of a duplicate-index gather is a scatter-add, which
    SERIALIZES on TPU (measured ~60s for 393K colliding rows). Here the host
    supplies ``perm`` (stable argsort of the flattened idx) and per-slot
    segment boundaries ``starts``/``ends``; the backward is then
    gather -> cumsum -> two gathers + subtract — no scatter anywhere:

        x = cot[perm];  c = [0; cumsum(x)];  drows[k] = c[ends[k]] - c[starts[k]]
    """
    return jnp.take(rows, jnp.clip(idx, 0, rows.shape[0] - 1), axis=0)


def _pl_fwd(rows, idx, perm, starts, ends):
    return planned_lookup(rows, idx, perm, starts, ends), (idx, perm, starts,
                                                           ends)


def _pl_bwd(res, cot):
    # gather -> cumsum -> boundary gathers: all measured fast on v5e
    # (~10-20ms at [393K, 64]); a scatter-add here would serialize
    idx, perm, starts, ends = res
    D = cot.shape[-1]
    x = jnp.take(cot.reshape(-1, D).astype(jnp.float32), perm, axis=0)
    c = jnp.concatenate([jnp.zeros((1, D), jnp.float32),
                         jnp.cumsum(x, axis=0)], axis=0)
    drows = jnp.take(c, ends, axis=0) - jnp.take(c, starts, axis=0)
    # primal rows may be low-precision (bf16 tower outputs on the dedup
    # path); custom_vjp cotangents must match the primal aval
    return drows.astype(cot.dtype), None, None, None, None


planned_lookup.defvjp(_pl_fwd, _pl_bwd)


def build_lookup_plan(uids_np, ids_np):
    """HOST-side plan for one lookup site: positions of ``ids`` in the
    sorted ``uids`` plus the segment-sum schedule for the backward."""
    import numpy as np

    uids_np = np.asarray(uids_np)
    ids_np = np.asarray(ids_np)
    idx = np.searchsorted(uids_np, ids_np).astype(np.int32)
    idx = np.minimum(idx, len(uids_np) - 1)
    flat = idx.reshape(-1)
    perm = np.argsort(flat, kind="stable").astype(np.int32)
    counts = np.bincount(flat, minlength=len(uids_np)).astype(np.int32)
    ends = np.cumsum(counts).astype(np.int32)
    starts = (ends - counts).astype(np.int32)
    return {"idx": idx, "perm": perm, "starts": starts, "ends": ends}


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class GatheredRows:
    """A table stand-in holding only the step's touched rows.

    ``uids`` [K] sorted unique ids (sentinel-padded with the row count);
    ``rows`` [K, D] the gathered embedding rows. ``embedding.masked_take``
    detects this type and resolves ids against the gathered prefix — every
    model call site works unchanged, and autodiff produces a [K, D] gradient.

    ``plans`` maps a lookup-site name ("seq"/"posneg"/"pos_last"/"negs") to a
    host-precomputed plan (build_lookup_plan): resolved positions plus a
    scatter-free backward schedule. Sites without a plan fall back to
    on-device searchsorted + scatter-add backward (fine on CPU, slow on TPU).
    """

    uids: jnp.ndarray
    rows: jnp.ndarray
    plans: dict = dataclasses.field(default_factory=dict)

    def tree_flatten(self):
        return (self.uids, self.rows, self.plans), None

    @classmethod
    def tree_unflatten(cls, _, children):
        return cls(*children)

    @property
    def shape(self):  # row-dim queries (e.g. l2 penalty) see the gathered view
        return self.rows.shape

    def lookup(self, ids: jnp.ndarray, site=None) -> jnp.ndarray:
        """rows for ``ids`` [...] -> [..., D]; caller applies padding mask."""
        plan = self.plans.get(site) if site is not None else None
        if plan is not None and tuple(plan["idx"].shape) == tuple(ids.shape):
            return planned_lookup(self.rows, plan["idx"], plan["perm"],
                                  plan["starts"], plan["ends"])
        idx = jnp.searchsorted(self.uids, ids)
        idx = jnp.clip(idx, 0, self.rows.shape[0] - 1)
        return jnp.take(self.rows, idx, axis=0)


def unique_touched(ids: jnp.ndarray, capacity: int, vocab_rows: int
                   ) -> jnp.ndarray:
    """Sorted unique ids with static size ``capacity``; padding uses the
    sentinel ``vocab_rows`` (> any real id) so the result stays sorted and
    sentinel rows scatter out of range (mode='drop').

    NOTE: on-device sort/unique of a few-hundred-K int array measures in the
    tens of SECONDS on TPU (sort is the pathology, measured 2026-08-17).
    This function is the jit-side fallback; the product path precomputes the
    dedup on the HOST in the input pipeline (:func:`host_unique_touched`),
    where it costs ~10 ms and the prefetcher hides it entirely.
    """
    return jnp.unique(ids.reshape(-1), size=capacity,
                      fill_value=jnp.asarray(vocab_rows, ids.dtype))


def host_unique_touched(ids_np, capacity: int, vocab_rows: int):
    """Host (numpy) twin of :func:`unique_touched` — run it in the data
    pipeline and ship ``touched_uids`` with the batch."""
    import numpy as np

    u = np.unique(np.asarray(ids_np).reshape(-1))
    out = np.full((capacity,), vocab_rows, dtype=np.int32)
    out[: min(len(u), capacity)] = u[:capacity]
    return out


def gather_rows(table: jnp.ndarray, uids: jnp.ndarray,
                dim: int = None) -> GatheredRows:
    rows = row_take(table, uids, dim=dim)
    # sentinel lanes read a clipped row; zero them so they contribute nothing
    vocab = table_rows(table, rows.shape[-1])
    rows = rows * (uids < vocab)[:, None].astype(rows.dtype)
    return GatheredRows(uids=uids, rows=rows)


# ---------------------------------------------------------------------------
# Row-sparse optimizer states + updates
# ---------------------------------------------------------------------------

def init_table_opt(table: jnp.ndarray, kind: str,
                   moments_dtype="float32", dim: int = None) -> Dict:
    """``dim`` (the embedding width) is required for packed tables — the
    packed shape alone doesn't determine the logical row count."""
    if kind == "lazy_adam":
        dt = jnp.dtype(moments_dtype)
        # moments mirror the table's storage (incl. the packed view)
        return {"mu": jnp.zeros_like(table, dtype=dt),
                "nu": jnp.zeros_like(table, dtype=dt)}
    if kind == "rowwise_adagrad":
        if is_packed(table):
            # a plain [V] per-row vector: 1-D arrays don't lane-pad, so
            # the accumulator needs no packing of its own
            return {"acc": jnp.zeros((table_rows(table, dim),),
                                     jnp.float32)}
        # zeros_like a column slice (not a fresh zeros) so the accumulator
        # inherits the table's row sharding when init runs under jit
        return {"acc": jnp.zeros_like(table[:, 0], dtype=jnp.float32)}
    raise ValueError(f"unknown table optimizer {kind!r}")


def compute_row_update(table: jnp.ndarray, opt: Dict, uids: jnp.ndarray,
                       drows: jnp.ndarray, *, kind: str, lr,
                       step: jnp.ndarray, b1: float = 0.9, b2: float = 0.98,
                       eps: float = 1e-8, weight_decay: float = 0.0,
                       rows0: jnp.ndarray = None
                       ) -> Tuple[jnp.ndarray, Dict]:
    """Row math only (GATHERS, no scatters): new values for the rows in
    ``uids`` from their gradient ``drows`` [K, D]. Returns
    (new_rows [K, D], new opt-state rows dict).

    ``step`` is the 1-based global step used for Adam bias correction
    (torch SparseAdam semantics: touched rows correct with the global t).

    Tables may be packed [V/R, 8, 128] (see packed_table_shape) — row
    gathers route through :func:`row_take`. Pass ``rows0`` (the forward's
    gathered rows) to skip a second table gather.
    """
    f32 = jnp.float32
    g = drows.astype(f32)
    D = drows.shape[-1]
    # rows0 (the forward's gathered rows) skips a second table gather
    rows = (rows0 if rows0 is not None
            else row_take(table, uids, dim=D)).astype(f32)
    ok = (uids < table_rows(table, D))[:, None].astype(f32)
    g = g * ok

    if kind == "lazy_adam":
        mu_r = row_take(opt["mu"], uids, dim=D).astype(f32)
        nu_r = row_take(opt["nu"], uids, dim=D).astype(f32)
        mu_r = b1 * mu_r + (1 - b1) * g
        nu_r = b2 * nu_r + (1 - b2) * g * g
        t = step.astype(f32)
        mu_hat = mu_r / (1 - b1 ** t)
        nu_hat = nu_r / (1 - b2 ** t)
        upd = mu_hat / (jnp.sqrt(nu_hat) + eps)
        if weight_decay:
            upd = upd + weight_decay * rows
        new_rows = rows - lr * upd * ok
        opt_rows = {"mu": mu_r.astype(opt["mu"].dtype),
                    "nu": nu_r.astype(opt["nu"].dtype)}
    elif kind == "rowwise_adagrad":
        acc_r = jnp.take(opt["acc"], uids, mode="clip")
        acc_r = acc_r + jnp.mean(g * g, axis=-1)
        scale = jax.lax.rsqrt(acc_r + eps)[:, None]
        upd = g * scale
        if weight_decay:
            upd = upd + weight_decay * rows
        new_rows = rows - lr * upd * ok
        opt_rows = {"acc": acc_r}
    else:
        raise ValueError(f"unknown table optimizer {kind!r}")
    return new_rows.astype(table.dtype), opt_rows


# Huge learned tables are stored PACKED: [V, D] viewed as [V/R, 8, 128]
# write groups (R = 8*128/D rows). The packed shape's canonical TPU layout
# is compact — every XLA op on a [V, 64] table (gather, scatter, even
# reshape) first converts it to the lane-padded T(8,128) layout, staging a
# 2x-expanded copy of the WHOLE table (11.9 GB at 50M bf16 rows — OOM on
# one 16 GB chip; measured). Packed, the same program runs copy-free.
# Threshold: the layout copies are bandwidth-cheap (~12 ms at 10M f32),
# and the grouped gather/merge/scatter costs ~77 ms more per step at the
# flagship's 393K touched rows — so packing only pays where the 2x copy
# no longer FITS. 30M rows is where f32 stops fitting a 16 GB chip.
TABLE_PACK_MIN_ROWS = 30_000_000
_PAD_ROWS = 256     # lcm of the group sizes at D | 128 (R <= 16) TIMES the
#                     max supported table-shard count (16): a packed table's
#                     group dim must divide evenly over the mesh's table
#                     axes so per-shard slices stay whole packed groups
#                     (sharded_gather_rows / sharded_apply_row_update)
_SCATTER_NSEM = 8     # outstanding group-DMAs per sub-chunk
_SCATTER_CSC = 1024   # group ids streamed to SMEM per scalar DMA (one
#                       tile-exact (8, 128) int32 block, 4 KB): scalar-
#                       PREFETCHING the whole id list overflows the 1 MB
#                       SMEM at the flagship's 393K touched rows, and any
#                       finer HBM slice trips Mosaic's (8, 128) tiling


def is_packed(table) -> bool:
    """True for a packed [V/R, 8, 128] table view."""
    return getattr(table, "ndim", 0) == 3 and table.shape[1:] == (8, 128)


def table_rows(table: jnp.ndarray, dim: int) -> int:
    """Logical row count of a table of ``dim``-wide rows (packed or not)."""
    if is_packed(table):
        return table.shape[0] * (8 * 128 // dim)
    return table.shape[0]


def padded_table_rows(rows: int) -> int:
    """Physical row count for a learned table of ``rows`` logical rows:
    big tables pad to a multiple of 32 so they pack into whole [8, 128]
    groups for any supported (dtype, D). The <=31 pad rows are never read
    — every consumer gathers by explicit id <= itemnum."""
    if rows >= TABLE_PACK_MIN_ROWS:
        return -(-rows // _PAD_ROWS) * _PAD_ROWS
    return rows


def scatter_group_rows(dtype, dim: int):
    """Rows per packed [8, 128] group: 8 sublanes x 128 lanes folded over
    ``dim``-wide rows. None when ``dim`` doesn't divide 128 (no packing).
    8 sublanes suffice for bf16 too — Mosaic gives 3-D HBM refs a flexible
    (1, 128) tiling (probed on v5e: f32 and bf16 S=8 groups both compile
    and run; bf16 S=16 moves 2x the bytes for no win)."""
    del dtype
    if dim > 128 or 128 % dim:
        return None
    return 8 * (128 // dim)


def packed_table_shape(rows: int, dim: int):
    """Packed storage shape for a big table, or None to store [rows, dim].

    Packing is what makes 50M+ x 64 rows trainable AND servable on one
    chip: [V/R, 8, 128]'s canonical layout is compact, so gathers and
    scatters stay copy-free, while ANY XLA op on a [V, 64] table stages a
    lane-padded 2x copy of the whole thing (measured 11.9 GB at 50M bf16
    rows — OOM)."""
    R = scatter_group_rows(None, dim)
    if R is None or rows < TABLE_PACK_MIN_ROWS:
        return None
    rows = padded_table_rows(rows)
    assert rows % R == 0
    return (rows // R, 8, 128)


def row_take(table: jnp.ndarray, ids: jnp.ndarray, dim: int = None
             ) -> jnp.ndarray:
    """``table[ids]`` for 1-D state, [V, D] tables, or packed
    [V/R, 8, 128] tables (mode='clip' everywhere; jnp's NaN-fill default
    is never acceptable on tables). Packed extraction is a dim-0 block
    gather + two in-register slot selects — no padded-layout staging."""
    if not is_packed(table):
        return jnp.take(table, ids, axis=0, mode="clip")
    assert dim is not None and dim <= 128 and 128 % dim == 0
    per = 128 // dim                     # rows per sublane
    R = 8 * per
    flat = ids.reshape(-1)
    blocks = jnp.take(table, flat // R, axis=0, mode="clip")   # [N, 8, 128]
    sub = (flat % R) // per
    picked = jnp.take_along_axis(blocks, sub[:, None, None],
                                 axis=1, mode="clip")          # [N, 1, 128]
    halves = picked.reshape(-1, per, dim)
    rows = jnp.take_along_axis(halves, (flat % per)[:, None, None],
                               axis=1, mode="clip")            # [N, 1, dim]
    return rows.reshape(*ids.shape, dim)


def host_group_plan(uids_np, vocab_rows: int, group_rows: int) -> Dict:
    """HOST-side write plan for the aliased group scatter.

    ``uids_np`` is the sorted unique id list (sentinel ``vocab_rows``
    padding at the tail, as produced by :func:`host_unique_touched`).
    Returns, with R = group_rows and K = len(uids) rounded up to the DMA
    chunk:

    - ``groups`` [K] int32 — unique touched R-row group indices, sentinel
      ``vocab_rows // R`` padding (kernel skips those);
    - ``slot_src`` [K, R] int32 — for each group, per-slot source row in
      the step's new-row tensor, or K for slots the step did not touch
      (those keep their old table value);
    - ``uid_pos`` [len(uids)] int32 — each uid's row in the gathered group
      buffer viewed [K*R, D] (gidx*R + slot; sentinels point at row 0 and
      must be masked by the caller).
    """
    import numpy as np

    uids = np.asarray(uids_np)
    K = -(-len(uids) // _SCATTER_CSC) * _SCATTER_CSC
    R = group_rows
    nG = vocab_rows // R
    real = uids < vocab_rows           # sentinels sort last -> real prefix
    gr = uids[real] // R
    first = np.ones(len(gr), bool)
    first[1:] = gr[1:] != gr[:-1]
    groups_u = gr[first]
    groups = np.full((K,), nG, np.int32)
    groups[: len(groups_u)] = groups_u
    slot_src = np.full((K, R), K, np.int32)
    gidx = np.cumsum(first) - 1        # group index of each real uid
    slot = uids[real] % R
    slot_src[gidx, slot] = np.arange(len(gr), dtype=np.int32)
    uid_pos = np.zeros((len(uids),), np.int32)
    uid_pos[: len(gr)] = gidx.astype(np.int32) * R + slot.astype(np.int32)
    return {"groups": groups, "slot_src": slot_src, "uid_pos": uid_pos}


def pallas_group_scatter(table3: jnp.ndarray, groups: jnp.ndarray,
                         arranged: jnp.ndarray,
                         interpret: bool = False) -> jnp.ndarray:
    """In-place aligned-group scatter: ``table3[groups[j]] = arranged[j]``
    (sentinel groups skipped) with ``input_output_aliases`` on the table.

    Why not ``table.at[uids].set``: inside a program that also GATHERS the
    same buffer, XLA copy-insertion stages a full [V, D] table copy — and
    the HLO temp takes the padded tile layout (2x expansion for D=64), so a
    50M x 64 bf16 table costs 6 GB (argument) + 12 GB (staged copy) and
    blows the single-chip HBM. Here the table stays in HBM
    (``memory_space=HBM``); the kernel DMAs one tile-exact [S, 128] group
    per touched group straight into the aliased buffer — no staged copy,
    O(G*R*D) bytes moved, _SCATTER_NSEM copies in flight.

    Shapes: table3 [V/R, S, 128] (the padded table viewed in write groups,
    R rows of width D folded into S sublanes x 128 lanes — see
    scatter_group_rows), groups [K] int32 unique (host_group_plan),
    arranged [K, S, 128] the merged new content per group. Finer slices are
    NOT an option (probed on v5e): Mosaic lane-pads D<128 refs to 128 and
    rejects sub-tile slices even in HBM — only the leading dim of a 3-D
    tile-exact ref slices freely. Group ids stream HBM -> SMEM in
    _SCATTER_CSC-id chunks rather than scalar-prefetching: the whole list
    (393K int32 at the flagship) overflows the 1 MB SMEM."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    K = groups.shape[0]
    nG = table3.shape[0]
    assert K % _SCATTER_CSC == 0, (K, _SCATTER_CSC)
    assert arranged.shape[0] == K and arranged.shape[1:] == table3.shape[1:]
    groups3d = groups.astype(jnp.int32).reshape(K // _SCATTER_CSC, 8, 128)

    def kernel(g3d_ref, arr_ref, tbl_ref, out_ref, gbuf, gsem, dsem):
        del tbl_ref  # same buffer as out_ref (aliased)

        def chunk(c, carry):
            cp = pltpu.make_async_copy(g3d_ref.at[pl.ds(c, 1)], gbuf, gsem)
            cp.start()
            cp.wait()

            def sub(t, carry2):
                # start NSEM copies, then wait them — keeps NSEM DMAs in
                # flight; groups are unique so no same-destination hazard
                for s in range(_SCATTER_NSEM):
                    idx = t * _SCATTER_NSEM + s
                    g = gbuf[0, idx // 128, idx % 128]
                    j = c * _SCATTER_CSC + idx

                    @pl.when(g < nG)
                    def _():
                        pltpu.make_async_copy(arr_ref.at[pl.ds(j, 1)],
                                              out_ref.at[pl.ds(g, 1)],
                                              dsem.at[s]).start()
                for s in range(_SCATTER_NSEM):
                    idx = t * _SCATTER_NSEM + s
                    g = gbuf[0, idx // 128, idx % 128]
                    j = c * _SCATTER_CSC + idx

                    @pl.when(g < nG)
                    def _():
                        pltpu.make_async_copy(arr_ref.at[pl.ds(j, 1)],
                                              out_ref.at[pl.ds(g, 1)],
                                              dsem.at[s]).wait()
                return carry2

            jax.lax.fori_loop(0, _SCATTER_CSC // _SCATTER_NSEM, sub, 0)
            return carry

        jax.lax.fori_loop(0, K // _SCATTER_CSC, chunk, 0)

    return pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM),   # groups3d
                  pl.BlockSpec(memory_space=pltpu.HBM),   # arranged
                  pl.BlockSpec(memory_space=pltpu.HBM)],  # table
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=[pltpu.SMEM((1, 8, 128), jnp.int32),
                        pltpu.SemaphoreType.DMA,
                        pltpu.SemaphoreType.DMA((_SCATTER_NSEM,))],
        out_shape=jax.ShapeDtypeStruct(table3.shape, table3.dtype),
        # operand order: 0=groups3d, 1=arranged, 2=table -> alias table
        input_output_aliases={2: 0},
        interpret=interpret,
    )(groups3d, arranged.astype(table3.dtype), table3)


def pallas_group_gather(table3: jnp.ndarray, groups: jnp.ndarray,
                        interpret: bool = False) -> jnp.ndarray:
    """Group gather twin of :func:`pallas_group_scatter`:
    ``out[j] = table3[groups[j]]`` (sentinel groups skipped — their output
    blocks stay uninitialized and must never be read).

    NOT on the product path: with the table STORED packed, a plain XLA
    dim-0 gather is copy-free and measured faster on v5e at 50M rows
    (29.6 ms vs 43.9 ms full-step with this kernel). Kept as the fallback
    for environments where the XLA gather regresses, and as the measured
    record of that comparison."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    K = groups.shape[0]
    nG = table3.shape[0]
    assert K % _SCATTER_CSC == 0, (K, _SCATTER_CSC)
    groups3d = groups.astype(jnp.int32).reshape(K // _SCATTER_CSC, 8, 128)

    def kernel(g3d_ref, tbl_ref, out_ref, gbuf, gsem, dsem):
        def chunk(c, carry):
            cp = pltpu.make_async_copy(g3d_ref.at[pl.ds(c, 1)], gbuf, gsem)
            cp.start()
            cp.wait()

            def sub(t, carry2):
                for s in range(_SCATTER_NSEM):
                    idx = t * _SCATTER_NSEM + s
                    g = gbuf[0, idx // 128, idx % 128]
                    j = c * _SCATTER_CSC + idx

                    @pl.when(g < nG)
                    def _():
                        pltpu.make_async_copy(tbl_ref.at[pl.ds(g, 1)],
                                              out_ref.at[pl.ds(j, 1)],
                                              dsem.at[s]).start()
                for s in range(_SCATTER_NSEM):
                    idx = t * _SCATTER_NSEM + s
                    g = gbuf[0, idx // 128, idx % 128]
                    j = c * _SCATTER_CSC + idx

                    @pl.when(g < nG)
                    def _():
                        pltpu.make_async_copy(tbl_ref.at[pl.ds(g, 1)],
                                              out_ref.at[pl.ds(j, 1)],
                                              dsem.at[s]).wait()
                return carry2

            jax.lax.fori_loop(0, _SCATTER_CSC // _SCATTER_NSEM, sub, 0)
            return carry

        jax.lax.fori_loop(0, K // _SCATTER_CSC, chunk, 0)

    return pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM),   # groups3d
                  pl.BlockSpec(memory_space=pltpu.HBM)],  # table
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=[pltpu.SMEM((1, 8, 128), jnp.int32),
                        pltpu.SemaphoreType.DMA,
                        pltpu.SemaphoreType.DMA((_SCATTER_NSEM,))],
        out_shape=jax.ShapeDtypeStruct((K,) + table3.shape[1:],
                                       table3.dtype),
        interpret=interpret,
    )(groups3d, table3)


def gather_rows_grouped(table3: jnp.ndarray, uids: jnp.ndarray,
                        group_plan: Dict, dim: int, plans: Dict = None
                        ) -> Tuple[GatheredRows, jnp.ndarray]:
    """(GatheredRows for ``uids``, gathered group buffer [K, 8, 128]) from
    a PACKED table.

    The group buffer is one XLA dim-0 gather on the packed table (probed
    on v5e at 50M rows: copy-free and faster than a Pallas DMA gather);
    touched rows extract from it with a cheap second gather over [K*R, D].
    Returns the buffer too — it is exactly the "old" content
    :func:`group_scatter_apply` needs for its merge."""
    assert is_packed(table3), table3.shape
    group_buf = jnp.take(table3, group_plan["groups"], axis=0,
                         mode="clip")                       # [K, 8, 128]
    flat = group_buf.reshape(-1, dim)
    rows = jnp.take(flat, group_plan["uid_pos"], axis=0, mode="clip")
    rows = rows * (uids < table_rows(table3, dim))[:, None].astype(
        rows.dtype)
    return GatheredRows(uids=uids, rows=rows, plans=plans or {}), group_buf


_SCATTER_CHUNK_GROUPS = 65536   # bound the merge temporaries (picked/old/
#                                 arranged) to ~chunk x 2KB instead of
#                                 O(K) — matters when the table itself
#                                 already fills most of HBM (100M rows)


def group_scatter_apply(buf3: jnp.ndarray, vals: jnp.ndarray,
                        group_plan: Dict, old3: jnp.ndarray = None,
                        interpret: bool = False,
                        use_pallas: bool = None) -> jnp.ndarray:
    """``buf[uids] = vals`` on a PACKED buffer, as whole-group writes:
    build each touched group's merged [R, D] content (new rows at touched
    slots, old rows elsewhere — a plain gather+where, no row scatter),
    then write whole groups — via the aliased Pallas DMA kernel on TPU
    (measured 12 ms faster than the XLA group scatter at the flagship's
    393K touched rows), or an XLA dim-0 scatter elsewhere.

    Pass ``old3`` (the group buffer from :func:`gather_rows_grouped`)
    whenever the groups were already gathered this step. The merge runs in
    _SCATTER_CHUNK_GROUPS-sized chunks, each scattering through its own
    aliased kernel call, so peak temporaries stay O(chunk) not O(K)."""
    assert is_packed(buf3), buf3.shape
    groups, slot_src = group_plan["groups"], group_plan["slot_src"]
    K, R = slot_src.shape
    D = vals.shape[-1]
    assert R * D == 8 * 128, (R, D)
    vals_ext = jnp.concatenate(
        [vals.astype(buf3.dtype), jnp.zeros((1, D), buf3.dtype)])
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    step = max(_SCATTER_CSC,
               min(K, -(-_SCATTER_CHUNK_GROUPS // _SCATTER_CSC)
                   * _SCATTER_CSC))
    for lo in range(0, K, step):
        hi = min(lo + step, K)
        g = groups[lo:hi]
        ss = slot_src[lo:hi]
        picked = jnp.take(vals_ext, jnp.minimum(ss, K), axis=0,
                          mode="clip")                      # [k, R, D]
        old = old3[lo:hi] if old3 is not None \
            else jnp.take(buf3, g, axis=0, mode="clip")     # [k, 8, 128]
        touched = (ss < K)[..., None]
        arranged = jnp.where(touched, picked,
                             old.reshape(hi - lo, R, D)) \
            .reshape(hi - lo, 8, 128)
        if use_pallas:
            buf3 = pallas_group_scatter(buf3, g, arranged,
                                        interpret=interpret)
        else:
            buf3 = buf3.at[g].set(arranged, mode="drop")
    return buf3


def scatter_row_update(table: jnp.ndarray, opt: Dict, uids: jnp.ndarray,
                       new_rows: jnp.ndarray, opt_rows: Dict,
                       group_plan: Dict = None, table_old3=None
                       ) -> Tuple[jnp.ndarray, Dict]:
    """Scatter-only companion of :func:`compute_row_update` (donated
    buffers alias in place; sentinel uids drop out of range).

    PACKED buffers require a host ``group_plan`` whose R matches their
    fold and scatter whole [8, 128] groups (group_scatter_apply); plain
    2-D/1-D buffers use the XLA row scatter."""

    def one(buf, vals, old3=None):
        if is_packed(buf):
            assert group_plan is not None and \
                group_plan["slot_src"].shape[1] * vals.shape[-1] == 8 * 128, \
                "packed tables need a matching host group plan to scatter"
            return group_scatter_apply(buf, vals, group_plan, old3=old3)
        return buf.at[uids].set(vals, mode="drop")

    table = one(table, new_rows, old3=table_old3)
    opt = {k: one(opt[k], v) for k, v in opt_rows.items()}
    return table, opt


def apply_row_update(table: jnp.ndarray, opt: Dict, uids: jnp.ndarray,
                     drows: jnp.ndarray, group_plan: Dict = None,
                     rows0: jnp.ndarray = None, table_old3=None,
                     **kw) -> Tuple[jnp.ndarray, Dict]:
    """compute + scatter in one program. Big tables with a host
    ``group_plan`` scatter through the aliased Pallas kernel (no staged
    [V, D] copy); everything else through the XLA scatter. Pass ``rows0``
    and ``table_old3`` from :func:`gather_rows_grouped` so the table is
    never XLA-gathered."""
    new_rows, opt_rows = compute_row_update(table, opt, uids, drows,
                                            rows0=rows0, **kw)
    return scatter_row_update(table, opt, uids, new_rows, opt_rows,
                              group_plan=group_plan, table_old3=table_old3)


# ---------------------------------------------------------------------------
# Packed tables UNDER A MESH: per-shard packed slices via shard_map (F3).
#
# A mesh row-shards tables over partition.TABLE_AXES. For packed storage the
# GROUP dim shards instead — each shard's local [G/S, 8, 128] slice is itself
# a compact-layout packed table, so the copy-free property holds per shard
# (an unpacked [V/S, D] shard still stages the lane-padded 2x copy on every
# XLA touch — the round-2 layout finding, BASELINE.md). The touched-row
# exchange is EXPLICIT: each shard gathers its local rows, an all-gather over
# the table axes rebuilds the replicated [K, D] working set (owner-blocked;
# a host-planned permutation restores global uid order), and the update
# scatters per shard through the same aliased Pallas group-DMA kernel the
# single-chip path uses (XLA row scatter off-TPU). Replaces the reference's
# single-device nn.Embedding (model/BaseLine/model.py:115-117,158-167) at
# the sharded 100M-row target (BASELINE.json configs[4]).
# ---------------------------------------------------------------------------

def mesh_table_shards(mesh) -> int:
    """Number of table-row shards of a mesh (product over TABLE_AXES)."""
    from ..parallel.partition import TABLE_AXES

    n = 1
    for a in TABLE_AXES:
        n *= mesh.shape.get(a, 1)
    return n


def shard_capacity(cap: int, n_shards: int, slack: float = 1.35) -> int:
    """Static per-shard touched-row capacity: ceil(cap/S) with ``slack``
    headroom for hash imbalance, rounded to the scatter DMA chunk. With
    uniformly distributed ids the max shard load concentrates at
    cap/S + O(sqrt(cap/S)); 1.35x makes overflow astronomically unlikely —
    host_shard_plan still checks and raises rather than dropping rows."""
    if n_shards <= 1:
        return -(-cap // _SCATTER_CSC) * _SCATTER_CSC
    per = int(-(-cap // n_shards) * slack)
    return -(-per // _SCATTER_CSC) * _SCATTER_CSC


def host_shard_plan(uids_np, vocab_rows: int, group_rows: int,
                    n_shards: int, cap_per_shard: int) -> Dict:
    """HOST-side per-shard plan for a packed table row-sharded over
    ``n_shards`` (uids sorted unique, sentinel ``vocab_rows`` tail).

    With S = n_shards, Kp = cap_per_shard, R = group_rows, K = len(uids):

    - ``lids``     [S, Kp] int32 — LOCAL row ids per shard (sentinel =
      rows-per-shard, out of local range);
    - ``gpos``     [S, Kp] int32 — each local row's position in the GLOBAL
      uid order (sentinel K — callers append a zero row);
    - ``groups``   [S, Kp] int32 — local touched group ids (sentinel = local
      group count, skipped by the scatter);
    - ``slot_src`` [S, Kp, R] int32 — per group slot, row in the shard's
      LOCAL new-rows tensor [Kp, D] (sentinel Kp = keep old value);
    - ``pos``      [K] int32 — each uid's row in the all-gathered
      owner-blocked buffer [S*Kp, D].

    Raises on per-shard capacity overflow (raise ``shard_capacity`` slack).
    """
    import numpy as np

    uids = np.asarray(uids_np)
    K = len(uids)
    Kp = int(cap_per_shard)
    assert vocab_rows % n_shards == 0, (vocab_rows, n_shards)
    rps = vocab_rows // n_shards
    assert rps % group_rows == 0, (rps, group_rows)
    nGl = rps // group_rows
    real = uids < vocab_rows
    owner = np.minimum(uids // rps, n_shards - 1)
    lids = np.full((n_shards, Kp), rps, np.int32)
    gpos = np.full((n_shards, Kp), K, np.int32)
    groups = np.full((n_shards, Kp), nGl, np.int32)
    slot_src = np.full((n_shards, Kp, group_rows), Kp, np.int32)
    pos = np.zeros((K,), np.int32)
    for s in range(n_shards):
        sel = np.nonzero(real & (owner == s))[0]
        n = len(sel)
        if n > Kp:
            raise ValueError(
                f"table shard {s} touched {n} rows > per-shard capacity "
                f"{Kp}. Shard ownership is contiguous-range "
                f"(uid // rows_per_shard), so id layouts that cluster hot "
                f"rows into one range can exceed the uniform-spread "
                f"headroom — raise train.sparse_shard_slack by at least "
                f"{n / max(Kp, 1):.2f}x its current value (default 1.35)")
        lu = (uids[sel] - s * rps).astype(np.int32)
        lids[s, :n] = lu
        gpos[s, :n] = sel
        pos[sel] = s * Kp + np.arange(n, dtype=np.int32)
        gr = lu // group_rows
        first = np.ones(n, bool)
        first[1:] = gr[1:] != gr[:-1]
        groups[s, : int(first.sum())] = gr[first]
        gidx = np.cumsum(first) - 1
        slot_src[s, gidx, lu % group_rows] = np.arange(n, dtype=np.int32)
    return {"lids": lids, "gpos": gpos, "groups": groups,
            "slot_src": slot_src, "pos": pos}


def _table_specs(mesh):
    from jax.sharding import PartitionSpec as P

    from ..parallel.partition import TABLE_AXES

    return TABLE_AXES, P(TABLE_AXES), P()


def sharded_gather_rows(mesh, table3, uids, shard_plan: Dict, dim: int,
                        plans: Dict = None) -> GatheredRows:
    """GatheredRows for ``uids`` from a PACKED table sharded over the mesh's
    table axes: per-shard local row extraction + one all-gather of [Kp, D]
    row blocks (NOT whole [Kp, 8, 128] groups — R-times less ICI traffic),
    then the host-planned permutation back to global uid order."""
    axes, p_tbl, p_rep = _table_specs(mesh)
    S = mesh_table_shards(mesh)
    vocab = table_rows(table3, dim)
    assert vocab % S == 0, (vocab, S)
    rps = vocab // S

    def local(tbl, lids2):
        lids = lids2[0]
        rows = row_take(tbl, lids, dim=dim)
        rows = rows * (lids < rps)[:, None].astype(rows.dtype)
        return jax.lax.all_gather(rows, axes, tiled=True)   # [S*Kp, D]

    rows_cat = jax.shard_map(local, mesh=mesh, in_specs=(p_tbl, p_tbl),
                             out_specs=p_rep, check_vma=False)(
        table3, shard_plan["lids"])
    rows = jnp.take(rows_cat, shard_plan["pos"], axis=0)
    rows = rows * (uids < vocab)[:, None].astype(rows.dtype)
    return GatheredRows(uids=uids, rows=rows, plans=plans or {})


def sharded_apply_row_update(mesh, table3, opt: Dict, uids, drows,
                             shard_plan: Dict, rows0, *, kind: str, lr,
                             step, weight_decay: float = 0.0,
                             eps: float = 1e-8, dim: int = None,
                             interpret: bool = False,
                             **_unused) -> Tuple[jnp.ndarray, Dict]:
    """Row-sparse update of a mesh-sharded PACKED table: each shard computes
    its own rows' update (rowwise-Adagrad) from the replicated [K, D]
    gradient and scatters whole groups into its local packed slice via the
    aliased Pallas kernel (XLA dim-0 scatter off-TPU). The [V] accumulator
    shards alongside and updates with a local row scatter."""
    assert kind == "rowwise_adagrad", (
        "sharded packed tables support rowwise_adagrad (the production "
        f"choice at packed scale); got {kind!r}")
    axes, p_tbl, p_rep = _table_specs(mesh)
    S = mesh_table_shards(mesh)
    f32 = jnp.float32
    D = drows.shape[-1]
    vocab = table_rows(table3, dim or D)
    rps = vocab // S
    vals_ext = jnp.concatenate([drows.astype(f32), jnp.zeros((1, D), f32)])
    rows_ext = jnp.concatenate([rows0.astype(f32), jnp.zeros((1, D), f32)])
    use_pallas = jax.default_backend() == "tpu"

    def local(tbl, acc, lids2, gpos2, groups2, slot_src2, vals_e, rows_e,
              lr_s):
        lids, gpos = lids2[0], gpos2[0]
        ok = (lids < rps).astype(f32)[:, None]
        g = jnp.take(vals_e, gpos, axis=0) * ok
        rows = jnp.take(rows_e, gpos, axis=0)
        acc_r = jnp.take(acc, jnp.minimum(lids, rps - 1))
        acc_r = acc_r + jnp.mean(g * g, axis=-1)
        upd = g * jax.lax.rsqrt(acc_r + eps)[:, None]
        if weight_decay:
            upd = upd + weight_decay * rows
        new_rows = (rows - lr_s * upd) * ok
        plan = {"groups": groups2[0], "slot_src": slot_src2[0]}
        tbl = group_scatter_apply(tbl, new_rows.astype(tbl.dtype), plan,
                                  old3=None, interpret=interpret,
                                  use_pallas=use_pallas)
        acc = acc.at[lids].set(acc_r, mode="drop")
        return tbl, acc

    new_table, new_acc = jax.shard_map(
        local, mesh=mesh,
        in_specs=(p_tbl, p_tbl, p_tbl, p_tbl, p_tbl, p_tbl, p_rep, p_rep,
                  p_rep),
        out_specs=(p_tbl, p_tbl), check_vma=False)(
        table3, opt["acc"], shard_plan["lids"], shard_plan["gpos"],
        shard_plan["groups"], shard_plan["slot_src"], vals_ext, rows_ext,
        jnp.asarray(lr, f32))
    return new_table, {"acc": new_acc}
