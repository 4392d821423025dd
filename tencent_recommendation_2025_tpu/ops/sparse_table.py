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
    return drows, None, None, None, None


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

    ``plans`` maps a lookup-site name ("seq"/"posneg"/"pos"/"negs") to a
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


def gather_rows(table: jnp.ndarray, uids: jnp.ndarray) -> GatheredRows:
    rows = jnp.take(table, uids, axis=0, mode="clip")
    # sentinel lanes read the last row; zero them so they contribute nothing
    rows = rows * (uids < table.shape[0])[:, None].astype(rows.dtype)
    return GatheredRows(uids=uids, rows=rows)


# ---------------------------------------------------------------------------
# Row-sparse optimizer states + updates
# ---------------------------------------------------------------------------

def init_table_opt(table: jnp.ndarray, kind: str,
                   moments_dtype="float32") -> Dict:
    if kind == "lazy_adam":
        dt = jnp.dtype(moments_dtype)
        return {"mu": jnp.zeros_like(table, dtype=dt),
                "nu": jnp.zeros_like(table, dtype=dt)}
    if kind == "rowwise_adagrad":
        # zeros_like a column slice (not a fresh zeros) so the accumulator
        # inherits the table's row sharding when init runs under jit
        return {"acc": jnp.zeros_like(table[:, 0], dtype=jnp.float32)}
    raise ValueError(f"unknown table optimizer {kind!r}")


def compute_row_update(table: jnp.ndarray, opt: Dict, uids: jnp.ndarray,
                       drows: jnp.ndarray, *, kind: str, lr,
                       step: jnp.ndarray, b1: float = 0.9, b2: float = 0.98,
                       eps: float = 1e-8, weight_decay: float = 0.0
                       ) -> Tuple[jnp.ndarray, Dict]:
    """Row math only (GATHERS, no scatters): new values for the rows in
    ``uids`` from their gradient ``drows`` [K, D]. Returns
    (new_rows [K, D], new opt-state rows dict).

    ``step`` is the 1-based global step used for Adam bias correction
    (torch SparseAdam semantics: touched rows correct with the global t).

    Split from :func:`scatter_row_update` deliberately: XLA inserts a FULL
    COPY of any donated buffer that is both gathered and scattered inside one
    program (measured: a [V, D] temp per moment table — the exact dense-
    update cost this module exists to avoid). Run the math in the grad
    program and the scatters in a second, scatter-only program where the
    donated tables alias in place (temp = 0).
    """
    f32 = jnp.float32
    g = drows.astype(f32)
    rows = jnp.take(table, uids, axis=0, mode="clip").astype(f32)
    ok = (uids < table.shape[0])[:, None].astype(f32)
    g = g * ok

    if kind == "lazy_adam":
        mu_r = jnp.take(opt["mu"], uids, axis=0, mode="clip").astype(f32)
        nu_r = jnp.take(opt["nu"], uids, axis=0, mode="clip").astype(f32)
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


def scatter_row_update(table: jnp.ndarray, opt: Dict, uids: jnp.ndarray,
                       new_rows: jnp.ndarray, opt_rows: Dict
                       ) -> Tuple[jnp.ndarray, Dict]:
    """Scatter-only companion of :func:`compute_row_update` — run it in its
    own jit with ``table``/``opt`` DONATED so every scatter aliases in place
    (sentinel uids drop out of range)."""
    table = table.at[uids].set(new_rows, mode="drop")
    opt = {k: opt[k].at[uids].set(v, mode="drop")
           for k, v in opt_rows.items()}
    return table, opt


def apply_row_update(table: jnp.ndarray, opt: Dict, uids: jnp.ndarray,
                     drows: jnp.ndarray, **kw) -> Tuple[jnp.ndarray, Dict]:
    """compute + scatter in one program — fine for tests/small tables; at
    scale use the two-program split (see compute_row_update's docstring)."""
    new_rows, opt_rows = compute_row_update(table, opt, uids, drows, **kw)
    return scatter_row_update(table, opt, uids, new_rows, opt_rows)
