"""Fused softmax-MHA Pallas kernel — the parity path's attention (C1).

The reference gets FlashAttention via torch SDPA
(``model/BaseLine/model.py:39-43``); this is the TPU equivalent for the
``block_type="mha"`` encoder: causal + key-padding masked softmax attention
computed blockwise without materializing any [L, L] tensor in HBM.

Same v4 layout as ops/hstu_attention.py: tensors travel head-packed
[B, L, D], grid is (B,), and the q-block loop is a static python unroll —
each q block's key range is complete within its (causal-trimmed) stripe, so
the softmax is exact per stripe with NO online-LSE state. Backward recomputes
the probabilities flash-style and applies the softmax VJP
(ds = p * (dp - rowsum(dp * p))) per stripe.

Safe-softmax semantics match ``models.attention.safe_masked_softmax``:
fully-masked query rows (left padding) output zeros, not NaN.

Coverage: 256 <= L <= 1024, L % 128 == 0 (whole-seq VMEM budget, like the
HSTU whole-seq variant). Longer single-chip MHA falls back to dense XLA;
multi-chip shards L via ring attention.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .hstu_attention import BLK, _diag_causal

MAX_FLASH_L = 1024


def _stripe_softmax(s, m):
    """Safe masked softmax over the key axis of one stripe.

    s [BLK, ks] f32 scores, m [BLK, ks] f32 0/1 mask. All-masked rows -> 0.
    """
    neg = jnp.finfo(jnp.float32).min
    masked = jnp.where(m > 0, s, neg)
    mx = jnp.max(masked, axis=-1, keepdims=True)
    e = jnp.exp(masked - mx) * m
    z = jnp.sum(e, axis=-1, keepdims=True)
    return e / jnp.maximum(z, 1e-30)


def _fwd_kernel(q_ref, k_ref, v_ref, valid_ref, o_ref, *,
                scale: float, num_heads: int, n_blocks: int):
    # Matmul operands stay in the input dtype (bf16 on the product path)
    # with f32 accumulation; softmax math runs in f32.
    f32 = jnp.float32
    cdt = q_ref.dtype
    q = (q_ref[0].astype(f32) * scale).astype(cdt)      # [L, D]
    k = k_ref[0]
    v = v_ref[0]
    D = q.shape[-1]
    hd = D // num_heads
    kv_ok = (valid_ref[0] != 0)                         # [1, L]

    for qb in range(n_blocks):
        ks = (qb + 1) * BLK
        qsl = slice(qb * BLK, (qb + 1) * BLK)
        m = jnp.logical_and(_diag_causal(qb + 1),
                            kv_ok[:, :ks]).astype(f32)
        outs = []
        for h in range(num_heads):
            sl = slice(h * hd, (h + 1) * hd)
            s = jax.lax.dot_general(q[qsl, sl], k[:ks, sl],
                                    (((1,), (1,)), ((), ())),
                                    preferred_element_type=f32)
            p = _stripe_softmax(s, m).astype(cdt)
            outs.append(jax.lax.dot_general(p, v[:ks, sl],
                                            (((1,), (0,)), ((), ())),
                                            preferred_element_type=f32))
        o_ref[0, qsl, :] = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, do_ref, valid_ref,
                dq_ref, dk_ref, dv_ref, dk_acc, dv_acc, *,
                scale: float, num_heads: int, n_blocks: int):
    f32 = jnp.float32
    cdt = q_ref.dtype
    q = (q_ref[0].astype(f32) * scale).astype(cdt)
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    D = q.shape[-1]
    hd = D // num_heads
    kv_ok = (valid_ref[0] != 0)

    dk_acc[...] = jnp.zeros_like(dk_acc)
    dv_acc[...] = jnp.zeros_like(dv_acc)

    for qb in range(n_blocks):
        ks = (qb + 1) * BLK
        qsl = slice(qb * BLK, (qb + 1) * BLK)
        m = jnp.logical_and(_diag_causal(qb + 1),
                            kv_ok[:, :ks]).astype(f32)
        dqs = []
        for h in range(num_heads):
            sl = slice(h * hd, (h + 1) * hd)
            s = jax.lax.dot_general(q[qsl, sl], k[:ks, sl],
                                    (((1,), (1,)), ((), ())),
                                    preferred_element_type=f32)
            p = _stripe_softmax(s, m)
            # dv += p^T @ do
            dv_acc[:ks, sl] += jax.lax.dot_general(
                p.astype(cdt), do[qsl, sl], (((0,), (0,)), ((), ())),
                preferred_element_type=f32)
            dp = jax.lax.dot_general(do[qsl, sl], v[:ks, sl],
                                     (((1,), (1,)), ((), ())),
                                     preferred_element_type=f32)
            ds = (p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
                  ).astype(cdt)
            dqs.append(jax.lax.dot_general(ds, k[:ks, sl],
                                           (((1,), (0,)), ((), ())),
                                           preferred_element_type=f32))
            dk_acc[:ks, sl] += jax.lax.dot_general(
                ds, q[qsl, sl], (((0,), (0,)), ((), ())),
                preferred_element_type=f32)
        dq_ref[0, qsl, :] = (jnp.concatenate(dqs, axis=-1) * scale
                             ).astype(dq_ref.dtype)

    dk_ref[0] = dk_acc[...].astype(dk_ref.dtype)
    dv_ref[0] = dv_acc[...].astype(dv_ref.dtype)


def _pallas_fwd(q, k, v, valid3, scale, num_heads, interpret):
    B, L, D = q.shape
    nq = L // BLK
    return pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, num_heads=num_heads,
                          n_blocks=nq),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, L, D), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, L, D), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, L, D), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, 1, L), lambda b: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, L, D), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, L, D), q.dtype),
        interpret=interpret,
    )(q, k, v, valid3)


def _pallas_bwd(q, k, v, do, valid3, scale, num_heads, interpret):
    B, L, D = q.shape
    nq = L // BLK
    return pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale, num_heads=num_heads,
                          n_blocks=nq),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, L, D), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, L, D), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, L, D), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, L, D), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, 1, L), lambda b: (b, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, L, D), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, L, D), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, L, D), lambda b: (b, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, L, D), q.dtype),
            jax.ShapeDtypeStruct((B, L, D), q.dtype),
            jax.ShapeDtypeStruct((B, L, D), q.dtype),
        ],
        scratch_shapes=[pltpu.VMEM((L, D), jnp.float32),
                        pltpu.VMEM((L, D), jnp.float32)],
        interpret=interpret,
    )(q, k, v, do, valid3)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _flash_core(q, k, v, valid3, scale, num_heads, interpret):
    return _pallas_fwd(q, k, v, valid3, scale, num_heads, interpret)


def _core_fwd(q, k, v, valid3, scale, num_heads, interpret):
    out = _flash_core(q, k, v, valid3, scale, num_heads, interpret)
    return out, (q, k, v, valid3)


def _core_bwd(scale, num_heads, interpret, res, g):
    q, k, v, valid3 = res
    dq, dk, dv = _pallas_bwd(q, k, v, g, valid3, scale, num_heads, interpret)
    return dq, dk, dv, None


_flash_core.defvjp(_core_fwd, _core_bwd)


def flash_mha_packed(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                     valid: jnp.ndarray, num_heads: int,
                     interpret: bool = False) -> jnp.ndarray:
    """Head-packed causal flash MHA: q/k/v [B, L, D] (D = H*hd, L % 128 == 0,
    L <= MAX_FLASH_L); valid [B, L] key-padding. Returns [B, L, D]."""
    hd = q.shape[-1] // num_heads
    valid3 = valid.astype(jnp.int32)[:, None, :]
    return _flash_core(q, k, v, valid3, hd ** -0.5, num_heads, interpret)


def flash_mha(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
              valid: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """[B, H, L, hd] interface (transposes into the packed layout)."""
    B, H, L, hd = q.shape

    def pack(t):
        return t.transpose(0, 2, 1, 3).reshape(B, L, H * hd)

    out = flash_mha_packed(pack(q), pack(k), pack(v), valid, H, interpret)
    return out.reshape(B, L, H, hd).transpose(0, 2, 1, 3)
