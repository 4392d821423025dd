"""Training objectives: parity BCE (C7) and sampled softmax with logQ (F9).

BCE matches the reference loss block (``model/BaseLine/main.py:173-190``):
mean BCE-with-logits over positions whose next token is an item, positives
labeled 1 and the single uniform negative labeled 0, plus BaseLine's explicit
``l2_emb * ||item_emb||`` (L2 norm, *not* squared — a faithful quirk,
``main.py:184-185``).

Sampled softmax is the north-star upgrade: softmax CE over
[positive | shared uniform negatives] with the logQ correction
``logit_j - log(Q(j))`` so the sampled distribution is an unbiased estimate of
full softmax (Bengio & Senécal, 2008). Negatives are shared across the batch
(one draw per step), which turns scoring into one [B*L, D] x [D, N] matmul —
MXU-shaped.
"""

from __future__ import annotations

from typing import Mapping, Optional, Tuple

import jax
import jax.numpy as jnp


def bce_with_logits(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Elementwise stable binary cross-entropy with logits."""
    return jnp.maximum(logits, 0) - logits * labels + \
        jnp.log1p(jnp.exp(-jnp.abs(logits)))


def reference_bce_loss(pos_logits: jnp.ndarray, neg_logits: jnp.ndarray,
                       loss_mask: jnp.ndarray) -> jnp.ndarray:
    """mean BCE(pos,1) + mean BCE(neg,0) over masked positions
    (reference main.py:180-182 index-select then mean)."""
    m = loss_mask.astype(jnp.float32)
    n = jnp.maximum(m.sum(), 1.0)
    pos = (bce_with_logits(pos_logits.astype(jnp.float32),
                           jnp.ones_like(pos_logits, jnp.float32)) * m).sum() / n
    neg = (bce_with_logits(neg_logits.astype(jnp.float32),
                           jnp.zeros_like(neg_logits, jnp.float32)) * m).sum() / n
    return pos + neg


def l2_emb_penalty(item_emb, l2_emb: float) -> jnp.ndarray:
    """BaseLine's ``l2_emb * torch.norm(item_emb)`` — L2 norm, not squared.

    Under sparse-table training the penalty applies to the step's touched
    rows only (a :class:`ops.sparse_table.GatheredRows`) — the sparse analog,
    matching torch SparseAdam-style practice.
    """
    from .sparse_table import GatheredRows

    if isinstance(item_emb, GatheredRows):
        item_emb = item_emb.rows
    return l2_emb * jnp.sqrt(jnp.sum(item_emb.astype(jnp.float32) ** 2))


def sampled_softmax_loss(query: jnp.ndarray, pos_emb: jnp.ndarray,
                         neg_embs: jnp.ndarray, neg_ids: jnp.ndarray,
                         pos_ids: jnp.ndarray, loss_mask: jnp.ndarray,
                         num_items: int,
                         temperature: float = 1.0,
                         neg_logq: Optional[jnp.ndarray] = None
                         ) -> jnp.ndarray:
    """Sampled softmax with logQ correction and accidental-hit masking.

    query    [B, L, D]   — encoder outputs at prediction positions
    pos_emb  [B, L, D]   — positive item embeddings
    neg_embs [N, D]      — shared negatives (one set per step)
    neg_ids  [N], pos_ids [B, L] — for accidental-hit masking
    loss_mask [B, L] bool
    neg_logq [N] f32     — per-candidate log sampling probability. ``None``
                           means all-uniform: logQ = -log(num_items), a
                           constant. Mixed candidate sets (uniform +
                           in-batch, Mixed Negative Sampling style) pass
                           each candidate's logQ under ITS OWN sampling
                           mechanism.

    Candidates with id <= 0 (padding slots from static-shape in-batch
    selection) are masked out entirely, like accidental hits. The positive
    is not sampled, so it gets no correction (corrected = logit - log Q
    applies to sampled candidates only).
    """
    f32 = jnp.float32
    q = query.astype(f32) / temperature
    pos_logit = jnp.sum(q * pos_emb.astype(f32), axis=-1)          # [B, L]
    neg_logit = jnp.einsum("bld,nd->bln", q, neg_embs.astype(f32))  # [B, L, N]
    if neg_logq is None:
        neg_logq = jnp.full((neg_ids.shape[0],),
                            -jnp.log(jnp.asarray(num_items, f32)), f32)
    neg_logit = neg_logit - neg_logq[None, None, :]
    # accidental hits (a negative equal to the positive) and padding-slot
    # candidates are removed from every row's softmax
    hit = (neg_ids[None, None, :] == pos_ids[..., None]) \
        | (neg_ids <= 0)[None, None, :]
    neg_logit = jnp.where(hit, jnp.finfo(f32).min, neg_logit)

    logits = jnp.concatenate([pos_logit[..., None], neg_logit], axis=-1)
    logprobs = jax.nn.log_softmax(logits, axis=-1)
    nll = -logprobs[..., 0]
    m = loss_mask.astype(f32)
    return (nll * m).sum() / jnp.maximum(m.sum(), 1.0)


def inbatch_candidates(pos_ids: jnp.ndarray, pos_embs: jnp.ndarray,
                       loss_mask: jnp.ndarray, n: int, rng
                       ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Select ``n`` in-batch negative candidates from the batch's positives
    (F9's in-batch half — SURVEY §2.2): uniformly sampled valid positions of
    ``pos_ids`` [B, L], reusing the ALREADY-COMPUTED positive tower outputs
    ``pos_embs`` [B, L, D] (zero extra tower cost, unlike the uniform set).

    Returns (ids [n], embs [n, D], logq [n]). The logQ correction is the
    EXACT per-candidate sampling probability of this mechanism: drawing one
    uniformly-random valid position yields item j with probability
    count_batch(j) / n_valid — the empirical in-batch frequency, which is
    itself an unbiased estimate of the item's data frequency (the
    frequency-corrected estimator of Mixed Negative Sampling / in-batch
    softmax literature). Slots that land on invalid positions get id 0 and
    are masked out by :func:`sampled_softmax_loss`.
    """
    f32 = jnp.float32
    flat_ids = pos_ids.reshape(-1)                        # [B*L]
    flat_valid = loss_mask.reshape(-1)
    D = pos_embs.shape[-1]
    idx = jax.random.randint(rng, (n,), 0, flat_ids.shape[0])
    cand_ids = jnp.where(flat_valid[idx], flat_ids[idx], 0)
    cand_embs = pos_embs.reshape(-1, D)[idx]
    # per-candidate batch count (valid positions only) -> empirical q
    match = (flat_ids[None, :] == cand_ids[:, None]) & flat_valid[None, :]
    counts = match.sum(axis=1).astype(f32)                # [n]
    n_valid = jnp.maximum(flat_valid.sum().astype(f32), 1.0)
    logq = jnp.log(jnp.maximum(counts, 1.0)) - jnp.log(n_valid)
    return cand_ids, cand_embs, logq
