"""HSTU-style pointwise-gated attention block (F7 of SURVEY.md §2.2).

The north-star block replacing softmax MHA: a Hierarchical Sequential
Transduction Unit in the style of "Actions Speak Louder than Words" (Zhai et
al., 2024). Nothing like it exists in the reference (its blocks are plain
softmax MHA, ``model/BaseLine/model.py:10-62``); this is a new TPU-first
design:

- one packed projection ``D -> 4D`` produces U (gate), V, Q, K; SiLU applied
  pointwise to all four — a single MXU matmul;
- attention weights are **pointwise**: ``silu(QK^T / sqrt(d) + rab) * mask / L``
  — no softmax, no row reductions, which is exactly what makes the fused
  Pallas kernel (ops/hstu_attention.py) cheap;
- ``rab`` is a learned relative-position bias over clamped causal distance
  buckets, computed per (q-k) distance — never materialized as [L, L] per
  batch;
- output is ``f2(LayerNorm(A @ V) * U)`` with a residual connection.

The XLA path below is the numerical oracle; the encoder swaps in the Pallas
kernel for large shapes.
"""

from __future__ import annotations

from typing import Mapping, Optional

import jax
import jax.numpy as jnp

from .embedding import layernorm, layernorm_init, linear_init, xavier_normal

try:  # public home moved across jax versions
    from jax.ad_checkpoint import checkpoint_name as _checkpoint_name
except Exception:  # pragma: no cover
    from jax._src.ad_checkpoint import checkpoint_name as _checkpoint_name


def init_hstu_params(key, d_model: int, num_heads: int,
                     rel_pos_buckets: int = 128):
    ks = jax.random.split(key, 4)
    return {
        "uvqk": {"w": xavier_normal(ks[0], (d_model, 4 * d_model)),
                 "b": jnp.zeros((4 * d_model,), jnp.float32)},
        "out": linear_init(ks[1], d_model, d_model),
        "attn_ln": layernorm_init(d_model, 1.0),
        # [num_heads, rel_pos_buckets] learned bias over clamped (q-k) distance
        "rab": jax.random.normal(ks[2], (num_heads, rel_pos_buckets),
                                 jnp.float32) * 0.02,
    }


def rel_pos_bias(rab: jnp.ndarray, seq_len: int) -> jnp.ndarray:
    """[H, buckets] -> [H, L, L] causal distance bias (distance clamped)."""
    buckets = rab.shape[-1]
    q = jax.lax.broadcasted_iota(jnp.int32, (seq_len, seq_len), 0)
    k = jax.lax.broadcasted_iota(jnp.int32, (seq_len, seq_len), 1)
    dist = jnp.clip(q - k, 0, buckets - 1)
    return jnp.take(rab, dist, axis=-1)  # [H, L, L]


def hstu_block(params: Mapping, x: jnp.ndarray, mask: jnp.ndarray,
               num_heads: int, dropout_rate: float = 0.0,
               train: bool = False,
               dropout_key: Optional[jax.Array] = None,
               core=None) -> jnp.ndarray:
    """x [B, L, D]; mask [B, L, L] bool (True = attend). Returns the block
    output *without* the residual (the encoder owns residual wiring).

    ``core(q, k, v, rab) -> av`` over [B, H, L, hd] optionally replaces the
    dense pointwise-attention inner loop (Pallas fused kernel / SP ring).
    """
    dtype = x.dtype
    B, L, D = x.shape
    hd = D // num_heads

    w = params["uvqk"]["w"].astype(dtype)
    b = params["uvqk"]["b"].astype(dtype)
    uvqk = x @ w + b
    if not (core is not None and getattr(core, "fused_silu", False)):
        uvqk = jax.nn.silu(uvqk)
    u, v, q, k = jnp.split(uvqk, 4, axis=-1)
    if core is not None and getattr(core, "fused_silu", False):
        # kernel applies SiLU to q/k/v on load; only the gate needs it here
        u = jax.nn.silu(u)

    def heads(t):
        return t.reshape(B, L, num_heads, hd).transpose(0, 2, 1, 3)

    if core is not None and getattr(core, "packed", False):
        # fused Pallas kernel consumes the head-packed [B, L, D] layout
        # directly — no transposes on the hot path. The output is
        # checkpoint-named so the encoder's remat policy can SAVE it (16MB
        # per block) instead of re-running the kernel in the backward pass.
        av = _checkpoint_name(core(q, k, v, params["rab"]), "hstu_av")
        ln = {"scale": params["attn_ln"]["scale"].astype(dtype),
              "bias": params["attn_ln"]["bias"].astype(dtype)}
        gated = layernorm(ln, av) * u
        if train and dropout_rate > 0.0 and dropout_key is not None:
            keep = jax.random.bernoulli(dropout_key, 1.0 - dropout_rate,
                                        gated.shape)
            gated = gated * keep / (1.0 - dropout_rate)
        wo = {"w": params["out"]["w"].astype(dtype),
              "b": params["out"]["b"].astype(dtype)}
        return gated @ wo["w"] + wo["b"]

    qh, kh, vh = heads(q), heads(k), heads(v)
    if core is not None:
        av = core(qh, kh, vh, params["rab"])
    else:
        scores = jnp.einsum("bhqd,bhkd->bhqk", qh, kh,
                            preferred_element_type=jnp.float32)
        scores = scores * (hd ** -0.5)
        scores = scores + rel_pos_bias(params["rab"], L)[None]
        attn = jax.nn.silu(scores) * mask[:, None].astype(jnp.float32)
        attn = attn / jnp.asarray(L, jnp.float32)  # pointwise 1/n norm
        av = jnp.einsum("bhqk,bhkd->bhqd", attn.astype(dtype), vh,
                        preferred_element_type=jnp.float32).astype(dtype)
    av = av.transpose(0, 2, 1, 3).reshape(B, L, D)

    ln = {"scale": params["attn_ln"]["scale"].astype(dtype),
          "bias": params["attn_ln"]["bias"].astype(dtype)}
    gated = layernorm(ln, av) * u
    if train and dropout_rate > 0.0 and dropout_key is not None:
        keep = jax.random.bernoulli(dropout_key, 1.0 - dropout_rate,
                                    gated.shape)
        gated = gated * keep / (1.0 - dropout_rate)
    wo = {"w": params["out"]["w"].astype(dtype),
          "b": params["out"]["b"].astype(dtype)}
    return gated @ wo["w"] + wo["b"]
