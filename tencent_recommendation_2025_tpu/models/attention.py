"""Softmax multi-head attention (C1 parity path) — XLA implementation.

Functionally equivalent to the reference ``FlashMultiHeadAttention``
(``model/BaseLine/model.py:10-62``): separate Q/K/V/O projections with bias,
boolean mask, scale 1/sqrt(head_dim), optional attention-weight dropout.

Differences by design:
- masked softmax is *safe*: fully-masked query rows output zeros instead of
  NaN (torch's CUDA flash kernel does the same; the math path would NaN);
- compute runs in the config dtype (bf16 on TPU) with fp32 softmax
  accumulation, and XLA fuses the whole block;
- large-shape configs route to the fused Pallas kernel in
  ops/flash_attention.py (selected by the encoder).
"""

from __future__ import annotations

from typing import Mapping, Optional

import jax
import jax.numpy as jnp

from .embedding import linear_init


def init_mha_params(key, d_model: int):
    ks = jax.random.split(key, 4)
    return {"q": linear_init(ks[0], d_model, d_model),
            "k": linear_init(ks[1], d_model, d_model),
            "v": linear_init(ks[2], d_model, d_model),
            "o": linear_init(ks[3], d_model, d_model)}


def _split_heads(x, num_heads):
    b, l, d = x.shape
    return x.reshape(b, l, num_heads, d // num_heads).transpose(0, 2, 1, 3)


def _merge_heads(x):
    b, h, l, hd = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, l, h * hd)


def safe_masked_softmax(scores: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Softmax over the last axis where ``mask`` is True; all-masked rows -> 0."""
    neg = jnp.finfo(scores.dtype).min
    masked = jnp.where(mask, scores, neg)
    m = jnp.max(masked, axis=-1, keepdims=True)
    e = jnp.exp(masked - jax.lax.stop_gradient(m)) * mask.astype(scores.dtype)
    s = jnp.sum(e, axis=-1, keepdims=True)
    return e / jnp.maximum(s, jnp.asarray(1e-30, scores.dtype))


def mha(params: Mapping, x: jnp.ndarray, mask: jnp.ndarray, num_heads: int,
        dropout_rate: float = 0.0, train: bool = False,
        dropout_key: Optional[jax.Array] = None,
        core=None) -> jnp.ndarray:
    """Self-attention. ``x`` [B, L, D]; ``mask`` [B, L, L] bool (True=attend).

    ``core`` optionally replaces the dense attention inner loop with a fused /
    distributed implementation: ``core(q, k, v) -> out`` over [B, H, L, hd]
    (used for the Pallas flash kernel and the sequence-parallel ring —
    attention-weight dropout is skipped on those paths).
    """
    dtype = x.dtype
    d_model = x.shape[-1]
    head_dim = d_model // num_heads

    def proj(p, v):
        return v @ p["w"].astype(dtype) + p["b"].astype(dtype)

    q = _split_heads(proj(params["q"], x), num_heads)
    k = _split_heads(proj(params["k"], x), num_heads)
    v = _split_heads(proj(params["v"], x), num_heads)

    if core is not None:
        out = core(q, k, v)
    else:
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        scores = scores * (head_dim ** -0.5)
        probs = safe_masked_softmax(scores, mask[:, None, :, :])
        if train and dropout_rate > 0.0 and dropout_key is not None:
            keep = jax.random.bernoulli(dropout_key, 1.0 - dropout_rate,
                                        probs.shape)
            probs = probs * keep / (1.0 - dropout_rate)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(dtype), v,
                         preferred_element_type=jnp.float32).astype(dtype)
    return proj(params["o"], _merge_heads(out))
