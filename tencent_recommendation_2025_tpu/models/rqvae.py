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
    """Score every candidate item by the log-likelihood of its semantic id
    under the decode head (flat scoring — beam search arrives with the Pallas
    decode kernel). query [B, Dq], item_codes [N, L] -> [B, N]."""
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
            # expected next context: use the per-item true code embedding is
            # item-dependent; flat scoring approximates ctx with the argmax
            # code embedding (exact for the dominant beam).
            best = jnp.argmax(logits, axis=-1)
            prev = jnp.take(codebooks[l], best, axis=0)
            ctx = jnp.concatenate([ctx, prev], axis=-1)
    return scores
