"""RQ-VAE semantic-ID pipeline driver (BASELINE.json configs[2]).

Stage 1 — tokenizer: train the RQ-VAE (models/rqvae.py) on item
representations (multimodal content vectors, optionally concatenated with
trained item-tower embeddings), then emit ``[num_items, L]`` semantic ids.

Stage 2 — generative-retrieval head: train per-level code classifiers on
(query vector, positive item's semantic id) pairs from the sequence model,
so retrieval can decode code-by-code instead of scoring the full corpus.

Everything is jitted; item batches are static-shape slices.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import RQVAEConfig
from ..models import rqvae as R


@dataclasses.dataclass
class RQVAEResult:
    params: Dict
    semantic_ids: np.ndarray          # [num_items+1, L] (row 0 = padding)
    final_losses: Dict[str, float]


def train_rqvae(item_reprs: np.ndarray, cfg: RQVAEConfig,
                num_steps: int = 2000, batch_size: int = 1024,
                seed: int = 0, verbose: bool = False) -> RQVAEResult:
    """item_reprs [N, D_in] (row per item id, row 0 = padding, ignored)."""
    n, d_in = item_reprs.shape
    params = R.init_rqvae_params(jax.random.key(seed), cfg, d_in)
    tx = optax.adam(cfg.lr)
    opt = tx.init(params)
    reprs = jnp.asarray(item_reprs, jnp.float32)

    @jax.jit
    def step(params, opt, key):
        idx = jax.random.randint(key, (batch_size,), 1, n)
        x = jnp.take(reprs, idx, axis=0)

        def loss_fn(p):
            _, z, _, codes, losses = R.rqvae_forward(p, x, cfg)
            return losses["loss"], (z, codes, losses)

        (_, (z, codes, losses)), g = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt = tx.update(g, opt)
        params = optax.apply_updates(params, updates)
        params = R.ema_codebook_update(params, z, codes, cfg)
        return params, opt, losses

    key = jax.random.key(seed + 1)
    losses = None
    for i in range(num_steps):
        key, k = jax.random.split(key)
        params, opt, losses = step(params, opt, k)
        if verbose and (i + 1) % 200 == 0:
            print(f"  rqvae step {i + 1}: "
                  f"recon {float(losses['recon']):.4f} "
                  f"commit {float(losses['commit']):.4f}")

    tokenize = jax.jit(lambda x: R.tokenize(params, x))
    ids = []
    bs = 8192
    for s in range(0, n, bs):
        ids.append(np.asarray(tokenize(reprs[s:s + bs])))
    semantic_ids = np.concatenate(ids, axis=0)
    semantic_ids[0] = 0
    return RQVAEResult(params=params, semantic_ids=semantic_ids,
                       final_losses={k: float(v) for k, v in losses.items()})


def train_genret_head(rq: RQVAEResult, queries: np.ndarray,
                      pos_item_ids: np.ndarray, cfg: RQVAEConfig,
                      num_steps: int = 1000, batch_size: int = 1024,
                      seed: int = 0) -> Dict:
    """queries [M, Dq] with aligned positive item ids [M]."""
    gp = R.init_genret_params(jax.random.key(seed), cfg, queries.shape[1])
    tx = optax.adam(1e-3)
    opt = tx.init(gp)
    q = jnp.asarray(queries, jnp.float32)
    codes_all = jnp.asarray(rq.semantic_ids, jnp.int32)
    pos = jnp.asarray(pos_item_ids, jnp.int32)
    m = q.shape[0]

    @jax.jit
    def step(gp, opt, key):
        idx = jax.random.randint(key, (min(batch_size, m),), 0, m)
        qb = jnp.take(q, idx, axis=0)
        codes = jnp.take(codes_all, jnp.take(pos, idx), axis=0)
        loss, g = jax.value_and_grad(
            lambda p: R.genret_loss(p, rq.params, qb, codes, cfg))(gp)
        updates, opt = tx.update(g, opt)
        return optax.apply_updates(gp, updates), opt, loss

    key = jax.random.key(seed + 2)
    for _ in range(num_steps):
        key, k = jax.random.split(key)
        gp, opt, loss = step(gp, opt, k)
    return {"params": gp, "final_loss": float(loss)}


def genret_retrieve(gp: Dict, rq: RQVAEResult, queries: np.ndarray,
                    cfg: RQVAEConfig, k: int = 10, batch: int = 1024,
                    method: str = "exact",
                    beam_width: int = 32) -> np.ndarray:
    """Top-k item ids per query from the generative decode head.

    method:
    - "exact": teacher-forced log-likelihood of every candidate's semantic
      id (genret_score_items_exact) — the gold scoring;
    - "beam": beam-search decode (no per-candidate scoring; true generative
      retrieval), beams mapped back to items; slots beams don't cover fill
      from the exact scorer;
    - "flat": round-1's argmax-context approximation (kept for comparison).
    """
    codes = jnp.asarray(rq.semantic_ids[1:], jnp.int32)  # skip padding row
    out = []
    scorers = {
        "exact": lambda q: R.genret_score_items_exact(gp, rq.params, q,
                                                      codes, cfg),
        "flat": lambda q: R.genret_score_items(gp, rq.params, q, codes, cfg),
    }
    score = jax.jit(scorers["exact" if method == "beam" else method])
    decode = jax.jit(lambda q: R.genret_beam_decode(gp, rq.params, q, cfg,
                                                    beam_width)) \
        if method == "beam" else None
    for s in range(0, len(queries), batch):
        q = jnp.asarray(queries[s:s + batch], jnp.float32)
        if method == "beam":
            bc, bs = decode(q)
            idx = R.beam_retrieve(bc, bs, rq.semantic_ids[1:], k)
            if (idx < 0).any():  # beams covered < k items: fill by scoring
                _, fill = jax.lax.top_k(score(q), k)
                fill = np.asarray(fill)
                for b, row in enumerate(idx):
                    missing = row < 0
                    if missing.any():
                        pool = [f for f in fill[b] if f not in set(row)]
                        row[missing] = pool[: missing.sum()]
        else:
            _, idx = jax.lax.top_k(score(q), k)
            idx = np.asarray(idx)
        out.append(idx + 1)  # back to 1-based item ids
    return np.concatenate(out, axis=0)
