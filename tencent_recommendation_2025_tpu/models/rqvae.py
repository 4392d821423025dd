"""RQ-VAE semantic-ID tokenizer + generative-retrieval head (F8).

Absent from the reference (SURVEY.md §2.2); new TPU-first design following the
residual-quantization VAE of Tiger/RQ-VAE generative retrieval (Rajput et al.,
2023): an MLP encoder maps item representations (content embeddings and/or
trained item-tower vectors) to a latent, which is quantized by L levels of
residual nearest-codebook lookup; an MLP decoder reconstructs the input.

TPU notes:
- nearest-code search is a batched ``argmin ||r - c||^2`` implemented as one
  matmul per level (``||r||^2 - 2 r·C + ||C||^2``) — MXU-shaped, vectorized
  over the whole item batch; a Pallas variant lives in ops (round 2);
- straight-through estimator for the encoder gradient; codebooks train by
  EMA (K-means style), the standard stable recipe;
- the tokenizer emits ``[num_items, L]`` semantic ids; the generative decode
  head predicts level-wise code logits autoregressively from a query vector
  and scores candidates by matched-prefix log-likelihood.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Mapping, Tuple

import jax
import jax.numpy as jnp

from ..config import RQVAEConfig
from .embedding import linear, linear_init


# ---------------------------------------------------------------------------
# Model
# ---------------------------------------------------------------------------

def init_rqvae_params(key, cfg: RQVAEConfig, input_dim: int) -> Dict:
    ks = jax.random.split(key, 6)
    enc, dims = [], [input_dim, *cfg.enc_hidden, cfg.code_dim]
    for i in range(len(dims) - 1):
        enc.append(linear_init(jax.random.fold_in(ks[0], i), dims[i], dims[i + 1]))
    dec, ddims = [], [cfg.code_dim, *reversed(cfg.enc_hidden), input_dim]
    for i in range(len(ddims) - 1):
        dec.append(linear_init(jax.random.fold_in(ks[1], i), ddims[i], ddims[i + 1]))
    codebooks = jax.random.normal(ks[2], (cfg.num_levels, cfg.codebook_size,
                                          cfg.code_dim)) * 0.1
    return {
        "enc": enc, "dec": dec, "codebooks": codebooks,
        # EMA statistics for codebook updates
        "ema_counts": jnp.ones((cfg.num_levels, cfg.codebook_size)),
        "ema_sums": codebooks.copy(),
    }


def _mlp(layers, x, final_act=False):
    for i, p in enumerate(layers):
        x = linear(p, x)
        if i < len(layers) - 1 or final_act:
            x = jax.nn.relu(x)
    return x


def nearest_code(residual: jnp.ndarray, codebook: jnp.ndarray) -> jnp.ndarray:
    """argmin_j ||r - c_j||^2 over [N, d] residuals and [C, d] codes via one
    matmul: ||r||^2 is constant in j, so argmin(||c||^2 - 2 r·c)."""
    dots = residual @ codebook.T                     # [N, C]
    c2 = jnp.sum(codebook ** 2, axis=-1)             # [C]
    return jnp.argmin(c2[None, :] - 2.0 * dots, axis=-1)


def quantize(params: Mapping, z: jnp.ndarray
             ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Residual quantization. z [N, d] -> (z_q [N, d], codes [N, L])."""
    codebooks = params["codebooks"]
    L = codebooks.shape[0]
    residual = z
    z_q = jnp.zeros_like(z)
    codes = []
    for l in range(L):
        idx = nearest_code(residual, codebooks[l])
        c = jnp.take(codebooks[l], idx, axis=0)
        codes.append(idx)
        z_q = z_q + c
        residual = residual - c
    return z_q, jnp.stack(codes, axis=-1)


def rqvae_forward(params: Mapping, x: jnp.ndarray, cfg: RQVAEConfig):
    """Returns (recon, z, z_q, codes, losses dict)."""
    z = _mlp(params["enc"], x)
    z_q, codes = quantize(params, z)
    # straight-through: decoder sees z + sg(z_q - z)
    z_st = z + jax.lax.stop_gradient(z_q - z)
    recon = _mlp(params["dec"], z_st)
    recon_loss = jnp.mean(jnp.sum((recon - x) ** 2, axis=-1))
    commit = jnp.mean(jnp.sum((z - jax.lax.stop_gradient(z_q)) ** 2, axis=-1))
    loss = recon_loss + cfg.commit_beta * commit
    return recon, z, z_q, codes, {"loss": loss, "recon": recon_loss,
                                  "commit": commit}


def ema_codebook_update(params: Dict, z: jnp.ndarray, codes: jnp.ndarray,
                        cfg: RQVAEConfig) -> Dict:
    """K-means-style EMA codebook update (no gradient through codebooks)."""
    decay = cfg.ema_decay
    codebooks = params["codebooks"]
    counts, sums = params["ema_counts"], params["ema_sums"]
    residual = z
    new_cb, new_counts, new_sums = [], [], []
    for l in range(cfg.num_levels):
        onehot = jax.nn.one_hot(codes[:, l], cfg.codebook_size, dtype=z.dtype)
        cnt = onehot.sum(axis=0)                      # [C]
        s = onehot.T @ residual                       # [C, d]
        c_new = decay * counts[l] + (1 - decay) * cnt
        s_new = decay * sums[l] + (1 - decay) * s
        cb = s_new / jnp.maximum(c_new[:, None], 1e-5)
        new_cb.append(cb)
        new_counts.append(c_new)
        new_sums.append(s_new)
        residual = residual - jnp.take(codebooks[l], codes[:, l], axis=0)
    return {**params, "codebooks": jnp.stack(new_cb),
            "ema_counts": jnp.stack(new_counts),
            "ema_sums": jnp.stack(new_sums)}


def tokenize(params: Mapping, x: jnp.ndarray) -> jnp.ndarray:
    """Item representations [N, input_dim] -> semantic ids [N, L]."""
    z = _mlp(params["enc"], x)
    _, codes = quantize(params, z)
    return codes


# ---------------------------------------------------------------------------
# Generative-retrieval decode head
# ---------------------------------------------------------------------------

def init_genret_params(key, cfg: RQVAEConfig, query_dim: int) -> Dict:
    """Per-level classifiers over codebook entries, conditioned on the query
    vector and the (teacher-forced) embeddings of previous-level codes."""
    ks = jax.random.split(key, cfg.num_levels)
    heads = []
    for l in range(cfg.num_levels):
        in_dim = query_dim + l * cfg.code_dim
        heads.append(linear_init(ks[l], in_dim, cfg.codebook_size))
    return {"heads": heads}


def genret_logits(gparams: Mapping, rq_params: Mapping, query: jnp.ndarray,
                  codes: jnp.ndarray, cfg: RQVAEConfig):
    """Teacher-forced level logits. query [B, Dq], codes [B, L] ->
    list of [B, C] logits per level."""
    codebooks = rq_params["codebooks"]
    out = []
    ctx = query
    for l in range(cfg.num_levels):
        out.append(linear(gparams["heads"][l], ctx))
        prev = jnp.take(codebooks[l], codes[:, l], axis=0)
        ctx = jnp.concatenate([ctx, prev], axis=-1)
    return out


def genret_loss(gparams: Mapping, rq_params: Mapping, query: jnp.ndarray,
                codes: jnp.ndarray, cfg: RQVAEConfig) -> jnp.ndarray:
    logits = genret_logits(gparams, rq_params, query, codes, cfg)
    loss = 0.0
    for l, lg in enumerate(logits):
        lp = jax.nn.log_softmax(lg, axis=-1)
        loss = loss - jnp.mean(jnp.take_along_axis(
            lp, codes[:, l:l + 1], axis=-1))
    return loss / cfg.num_levels


def genret_score_items(gparams: Mapping, rq_params: Mapping,
                       query: jnp.ndarray, item_codes: jnp.ndarray,
                       cfg: RQVAEConfig) -> jnp.ndarray:
    """Fast approximate scoring: log-likelihood of each item's semantic id
    with the level context following the ARGMAX code (exact only for items
    on the dominant beam). query [B, Dq], item_codes [N, L] -> [B, N].
    Use :func:`genret_score_items_exact` or :func:`genret_beam_decode` for
    real generative retrieval."""
    codebooks = rq_params["codebooks"]
    B = query.shape[0]
    N = item_codes.shape[0]
    scores = jnp.zeros((B, N), jnp.float32)
    ctx = query
    for l in range(cfg.num_levels):
        logits = linear(gparams["heads"][l], ctx)          # [B, C]
        lp = jax.nn.log_softmax(logits, axis=-1)
        scores = scores + lp[:, item_codes[:, l]]
        if l + 1 < cfg.num_levels:
            best = jnp.argmax(logits, axis=-1)
            prev = jnp.take(codebooks[l], best, axis=0)
            ctx = jnp.concatenate([ctx, prev], axis=-1)
    return scores


def genret_score_items_exact(gparams: Mapping, rq_params: Mapping,
                             query: jnp.ndarray, item_codes: jnp.ndarray,
                             cfg: RQVAEConfig,
                             chunk_n: int = 4096) -> jnp.ndarray:
    """EXACT autoregressive log-likelihood of every candidate's semantic id:
    each item's level-l context carries the item's OWN previous codes
    (teacher forcing), not the argmax beam.

    The level head is linear, so its logits split into a query part and a
    prev-codes part: logits[b, n] = query_b @ Wq + prev_n @ Wp + bias — two
    small matmuls per level instead of a [B, N, ctx] blowup; only the
    [B, n_chunk, C] log-softmax materializes, chunked over candidates.
    query [B, Dq], item_codes [N, L] -> [B, N].
    """
    codebooks = rq_params["codebooks"]
    B, Dq = query.shape
    N, L = item_codes.shape
    d = cfg.code_dim

    out = []
    for s in range(0, N, chunk_n):
        codes = item_codes[s:s + chunk_n]                  # [n, L]
        n = codes.shape[0]
        scores = jnp.zeros((B, n), jnp.float32)
        prev_feat = jnp.zeros((n, 0), query.dtype)
        for l in range(cfg.num_levels):
            w = gparams["heads"][l]["w"]                   # [Dq + l*d, C]
            bq = query @ w[:Dq] + gparams["heads"][l]["b"]  # [B, C]
            bp = prev_feat @ w[Dq:]                        # [n, C]
            logits = bq[:, None, :] + bp[None, :, :]       # [B, n, C]
            lp = jax.nn.log_softmax(logits, axis=-1)
            scores = scores + jnp.take_along_axis(
                lp, jnp.broadcast_to(codes[None, :, l:l + 1],
                                     (B, n, 1)), axis=-1)[..., 0]
            if l + 1 < cfg.num_levels:
                emb = jnp.take(codebooks[l], codes[:, l], axis=0)  # [n, d]
                prev_feat = jnp.concatenate([prev_feat, emb], axis=-1)
        out.append(scores)
    return jnp.concatenate(out, axis=1)


def genret_beam_decode(gparams: Mapping, rq_params: Mapping,
                       query: jnp.ndarray, cfg: RQVAEConfig,
                       beam_width: int = 10
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Beam-search decode over level-wise codes — real generative retrieval
    (no candidate corpus needed at decode time).

    query [B, Dq] -> (codes [B, W, L], log-prob scores [B, W]), beams sorted
    best-first. Static shapes throughout: level 0 takes top-W codes, each
    later level expands W beams x C codes and re-selects top W.
    """
    codebooks = rq_params["codebooks"]
    B, Dq = query.shape
    C = cfg.codebook_size
    W = min(beam_width, C)

    lp0 = jax.nn.log_softmax(linear(gparams["heads"][0], query), axis=-1)
    scores, code0 = jax.lax.top_k(lp0, W)                  # [B, W]
    codes = code0[..., None]                               # [B, W, 1]
    ctx = jnp.concatenate(
        [jnp.broadcast_to(query[:, None], (B, W, Dq)),
         jnp.take(codebooks[0], code0, axis=0)], axis=-1)  # [B, W, Dq+d]

    for l in range(1, cfg.num_levels):
        logits = linear(gparams["heads"][l], ctx)          # [B, W, C]
        lp = jax.nn.log_softmax(logits, axis=-1)
        cand = scores[..., None] + lp                      # [B, W, C]
        scores, flat = jax.lax.top_k(cand.reshape(B, W * C), W)
        parent = flat // C                                 # [B, W]
        code = flat % C
        codes = jnp.concatenate(
            [jnp.take_along_axis(codes, parent[..., None], axis=1),
             code[..., None]], axis=-1)
        if l + 1 < cfg.num_levels:
            ctx = jnp.concatenate(
                [jnp.take_along_axis(ctx, parent[..., None], axis=1),
                 jnp.take(codebooks[l], code, axis=0)], axis=-1)
    return codes, scores


def beam_retrieve(beam_codes, beam_scores, item_codes, k: int = 10):
    """Map decoded beams back to candidate items (host-side): items whose
    semantic id equals a beam inherit that beam's score (ties broken by
    item order); returns [B, k] candidate indices, -1 where beams cover
    fewer than k items. beam_codes [B, W, L] / item_codes [N, L] numpy."""
    import numpy as np

    beam_codes = np.asarray(beam_codes)
    item_codes = np.asarray(item_codes)
    index = {}
    for n, c in enumerate(map(tuple, item_codes.tolist())):
        index.setdefault(c, []).append(n)
    B, W, L = beam_codes.shape
    out = np.full((B, k), -1, np.int64)
    for b in range(B):
        hits = []
        for w in range(W):
            for n in index.get(tuple(beam_codes[b, w].tolist()), []):
                hits.append(n)
                if len(hits) >= k:
                    break
            if len(hits) >= k:
                break
        out[b, :len(hits)] = hits[:k]
    return out
