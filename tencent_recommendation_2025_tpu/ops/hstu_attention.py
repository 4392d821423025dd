"""Fused HSTU pointwise-gated attention — Pallas TPU kernels (F7).

Computes, without materializing any [L, L] tensor in HBM:

    S[b,h,q,k] = (Q·K^T) * hd^-0.5 + rab[h, clip(q-k, 0, buckets-1)]
    A = silu(S) * causal_mask * key_valid / seq_len
    O = A @ V

Pointwise SiLU attention has no softmax state, so both forward and backward
are plain blockwise accumulations — the backward needs no saved activations
(S is recomputed per block from Q/K, flash-style).

Relative-position bias without gathers: distances clip at ``buckets-1``, so
for block pairs further than ``n_near`` blocks below the diagonal the bias
tile is *constant*; the kernel receives ``n_near + 1`` precomputed [BLK, BLK]
tiles per head (near-diagonal Toeplitz tiles + one constant far tile), built
differentiably in XLA — rab's gradient flows back through the tile precompute
(take-transpose scatter-add + broadcast-sum) from the tile-gradient the
backward kernel accumulates.

Layout: grid (B, H, L/BLK) with one [BLK, hd] output tile per step; K/V rows
for the current (b, h) live whole in VMEM (512KB at L=1024, hd≤128).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLK = 128


def _n_near(buckets: int) -> int:
    """Number of sub-diagonal block slots whose bias tile is non-constant."""
    return min(8, (buckets - 2 + BLK - 1) // BLK + 1)


def _bias_tiles(rab: jnp.ndarray) -> jnp.ndarray:
    """rab [H, buckets] -> tiles [H, n_near+1, BLK, BLK].

    Slot s < n_near: Toeplitz tile for block-diagonal offset s; the last slot
    is the constant far tile (all distances clipped to buckets-1).
    Differentiable XLA precompute; tiny (3 tiles for buckets=128).
    """
    H, buckets = rab.shape
    nn = _n_near(buckets)
    iq = jax.lax.broadcasted_iota(jnp.int32, (BLK, BLK), 0)
    ik = jax.lax.broadcasted_iota(jnp.int32, (BLK, BLK), 1)
    tiles = []
    for s in range(nn):
        dist = jnp.clip(s * BLK + iq - ik, 0, buckets - 1)
        tiles.append(jnp.take(rab, dist, axis=1))      # [H, BLK, BLK]
    far = jnp.broadcast_to(rab[:, buckets - 1][:, None, None],
                           (H, BLK, BLK))
    tiles.append(far)
    return jnp.stack(tiles, axis=1)


def _fwd_kernel(q_ref, k_ref, v_ref, valid_ref, tiles_ref, o_ref, *,
                seq_len: int, n_tiles: int, scale: float):
    qb = pl.program_id(2)
    f32 = jnp.float32
    q = q_ref[0, 0].astype(f32) * scale                  # [BLK, hd]
    hd = q.shape[-1]

    iq = jax.lax.broadcasted_iota(jnp.int32, (BLK, BLK), 0)
    ik = jax.lax.broadcasted_iota(jnp.int32, (BLK, BLK), 1)

    def body(kb, acc):
        k = k_ref[0, 0, pl.ds(kb * BLK, BLK), :].astype(f32)
        v = v_ref[0, 0, pl.ds(kb * BLK, BLK), :].astype(f32)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=f32)
        slot = jnp.minimum(qb - kb, n_tiles - 1)
        s = s + tiles_ref[0, slot]
        causal = (qb * BLK + iq) >= (kb * BLK + ik)
        kv_ok = valid_ref[0, 0, pl.ds(kb * BLK, BLK)] != 0
        mask = jnp.logical_and(causal, kv_ok[None, :])
        a = jax.nn.silu(s) * mask.astype(f32) / seq_len
        return acc + jax.lax.dot_general(a, v, (((1,), (0,)), ((), ())),
                                         preferred_element_type=f32)

    acc = jax.lax.fori_loop(0, qb + 1, body,
                            jnp.zeros((BLK, hd), f32))
    o_ref[0, 0] = acc.astype(o_ref.dtype)


def _dq_kernel(q_ref, k_ref, v_ref, do_ref, valid_ref, tiles_ref,
               dq_ref, *, seq_len: int, n_tiles: int, scale: float):
    qb = pl.program_id(2)
    f32 = jnp.float32
    q = q_ref[0, 0].astype(f32) * scale
    do = do_ref[0, 0].astype(f32)
    hd = q.shape[-1]
    iq = jax.lax.broadcasted_iota(jnp.int32, (BLK, BLK), 0)
    ik = jax.lax.broadcasted_iota(jnp.int32, (BLK, BLK), 1)

    def body(kb, acc):
        k = k_ref[0, 0, pl.ds(kb * BLK, BLK), :].astype(f32)
        v = v_ref[0, 0, pl.ds(kb * BLK, BLK), :].astype(f32)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=f32)
        slot = jnp.minimum(qb - kb, n_tiles - 1)
        s = s + tiles_ref[0, slot]
        causal = (qb * BLK + iq) >= (kb * BLK + ik)
        kv_ok = valid_ref[0, 0, pl.ds(kb * BLK, BLK)] != 0
        m = jnp.logical_and(causal, kv_ok[None, :]).astype(f32) / seq_len
        da = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=f32)
        sig = jax.nn.sigmoid(s)
        ds = da * (sig * (1.0 + s * (1.0 - sig))) * m
        return acc + jax.lax.dot_general(ds, k, (((1,), (0,)), ((), ())),
                                         preferred_element_type=f32)

    acc = jax.lax.fori_loop(0, qb + 1, body, jnp.zeros((BLK, hd), f32))
    dq_ref[0, 0] = (acc * scale).astype(dq_ref.dtype)


def _dkv_kernel(q_ref, k_ref, v_ref, do_ref, valid_ref, tiles_ref,
                dk_ref, dv_ref, dtiles_ref, *,
                seq_len: int, n_tiles: int, scale: float, n_blocks: int):
    # grid (H, B, NK) so the dtiles accumulator (constant per h) is revisited
    # in consecutive steps
    b = pl.program_id(1)
    kb = pl.program_id(2)
    f32 = jnp.float32
    k = k_ref[0, 0].astype(f32)
    v = v_ref[0, 0].astype(f32)
    hd = k.shape[-1]
    iq = jax.lax.broadcasted_iota(jnp.int32, (BLK, BLK), 0)
    ik = jax.lax.broadcasted_iota(jnp.int32, (BLK, BLK), 1)
    kv_ok = valid_ref[0, 0, pl.ds(kb * BLK, BLK)] != 0

    @pl.when(jnp.logical_and(b == 0, kb == 0))
    def _():
        dtiles_ref[...] = jnp.zeros_like(dtiles_ref)

    def body(qb, carry):
        dk_acc, dv_acc = carry
        q = q_ref[0, 0, pl.ds(qb * BLK, BLK), :].astype(f32) * scale
        do = do_ref[0, 0, pl.ds(qb * BLK, BLK), :].astype(f32)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=f32)
        slot = jnp.minimum(qb - kb, n_tiles - 1)
        s = s + tiles_ref[0, slot]
        causal = (qb * BLK + iq) >= (kb * BLK + ik)
        m = jnp.logical_and(causal, kv_ok[None, :]).astype(f32) / seq_len
        a = jax.nn.silu(s) * m
        dv_acc = dv_acc + jax.lax.dot_general(
            a, do, (((0,), (0,)), ((), ())), preferred_element_type=f32)
        da = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=f32)
        sig = jax.nn.sigmoid(s)
        ds = da * (sig * (1.0 + s * (1.0 - sig))) * m
        dk_acc = dk_acc + jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())), preferred_element_type=f32)
        dtiles_ref[0, slot] += ds
        return dk_acc, dv_acc

    z = jnp.zeros((BLK, hd), f32)
    dk_acc, dv_acc = jax.lax.fori_loop(kb, n_blocks, body, (z, z))
    dk_ref[0, 0] = dk_acc.astype(dk_ref.dtype)
    dv_ref[0, 0] = dv_acc.astype(dv_ref.dtype)


def _pallas_fwd(q, k, v, valid3, tiles, seq_len, scale, interpret):
    B, H, L, hd = q.shape
    nq = L // BLK
    nt = tiles.shape[1]
    kern = functools.partial(_fwd_kernel, seq_len=seq_len, n_tiles=nt,
                             scale=scale)
    return pl.pallas_call(
        kern,
        grid=(B, H, nq),
        in_specs=[
            pl.BlockSpec((1, 1, BLK, hd), lambda b, h, qb: (b, h, qb, 0)),
            pl.BlockSpec((1, 1, L, hd), lambda b, h, qb: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, L, hd), lambda b, h, qb: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, L), lambda b, h, qb: (b, 0, 0)),
            pl.BlockSpec((1, nt, BLK, BLK), lambda b, h, qb: (h, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, BLK, hd),
                               lambda b, h, qb: (b, h, qb, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, L, hd), q.dtype),
        interpret=interpret,
    )(q, k, v, valid3, tiles)


def _pallas_bwd(q, k, v, do, valid3, tiles, seq_len, scale, interpret):
    B, H, L, hd = q.shape
    nq = L // BLK
    nt = tiles.shape[1]
    dq = pl.pallas_call(
        functools.partial(_dq_kernel, seq_len=seq_len, n_tiles=nt,
                          scale=scale),
        grid=(B, H, nq),
        in_specs=[
            pl.BlockSpec((1, 1, BLK, hd), lambda b, h, qb: (b, h, qb, 0)),
            pl.BlockSpec((1, 1, L, hd), lambda b, h, qb: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, L, hd), lambda b, h, qb: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, BLK, hd), lambda b, h, qb: (b, h, qb, 0)),
            pl.BlockSpec((1, 1, L), lambda b, h, qb: (b, 0, 0)),
            pl.BlockSpec((1, nt, BLK, BLK), lambda b, h, qb: (h, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, BLK, hd),
                               lambda b, h, qb: (b, h, qb, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, L, hd), q.dtype),
        interpret=interpret,
    )(q, k, v, do, valid3, tiles)

    dk, dv, dtiles = pl.pallas_call(
        functools.partial(_dkv_kernel, seq_len=seq_len, n_tiles=nt,
                          scale=scale, n_blocks=nq),
        grid=(H, B, nq),
        in_specs=[
            pl.BlockSpec((1, 1, L, hd), lambda h, b, kb: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, BLK, hd), lambda h, b, kb: (b, h, kb, 0)),
            pl.BlockSpec((1, 1, BLK, hd), lambda h, b, kb: (b, h, kb, 0)),
            pl.BlockSpec((1, 1, L, hd), lambda h, b, kb: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, L), lambda h, b, kb: (b, 0, 0)),
            pl.BlockSpec((1, nt, BLK, BLK), lambda h, b, kb: (h, 0, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, BLK, hd), lambda h, b, kb: (b, h, kb, 0)),
            pl.BlockSpec((1, 1, BLK, hd), lambda h, b, kb: (b, h, kb, 0)),
            pl.BlockSpec((1, nt, BLK, BLK), lambda h, b, kb: (h, 0, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, L, hd), q.dtype),
            jax.ShapeDtypeStruct((B, H, L, hd), q.dtype),
            jax.ShapeDtypeStruct((H, nt, BLK, BLK), jnp.float32),
        ],
        interpret=interpret,
    )(q, k, v, do, valid3, tiles)
    return dq, dk, dv, dtiles


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _hstu_attn_core(q, k, v, valid3, rab, seq_len, interpret):
    tiles = _bias_tiles(rab)
    scale = q.shape[-1] ** -0.5
    return _pallas_fwd(q, k, v, valid3, tiles, seq_len, scale, interpret)


def _core_fwd(q, k, v, valid3, rab, seq_len, interpret):
    out = _hstu_attn_core(q, k, v, valid3, rab, seq_len, interpret)
    return out, (q, k, v, valid3, rab)


def _core_bwd(seq_len, interpret, res, g):
    q, k, v, valid3, rab = res
    tiles = _bias_tiles(rab)
    scale = q.shape[-1] ** -0.5
    dq, dk, dv, dtiles = _pallas_bwd(q, k, v, g, valid3, tiles, seq_len,
                                     scale, interpret)
    # route tile grads back to rab through the differentiable precompute
    _, vjp = jax.vjp(_bias_tiles, rab)
    (drab,) = vjp(dtiles)
    return dq, dk, dv, None, drab


_hstu_attn_core.defvjp(_core_fwd, _core_bwd)


def hstu_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                   valid: jnp.ndarray, rab: jnp.ndarray, seq_len: int,
                   interpret: bool = False) -> jnp.ndarray:
    """Fused HSTU attention. q/k/v [B, H, L, hd] (L % 128 == 0);
    valid [B, L] bool/int; rab [H, buckets]. Matches
    models/hstu.py's dense path to fp tolerance."""
    valid3 = valid.astype(jnp.int32)[:, None, :]
    return _hstu_attn_core(q, k, v, valid3, rab, seq_len, interpret)


def hstu_attention_oracle(q, k, v, valid, rab, seq_len):
    """Dense XLA reference for tests (same math as models/hstu.py)."""
    from ..models.hstu import rel_pos_bias

    B, H, L, hd = q.shape
    f32 = jnp.float32
    s = jnp.einsum("bhqd,bhkd->bhqk", q.astype(f32), k.astype(f32))
    s = s * (hd ** -0.5) + rel_pos_bias(rab, L)[None]
    iq = jax.lax.broadcasted_iota(jnp.int32, (L, L), 0)
    ik = jax.lax.broadcasted_iota(jnp.int32, (L, L), 1)
    mask = (iq >= ik)[None] & (valid != 0)[:, None, :]
    a = jax.nn.silu(s) * mask[:, None].astype(f32) / seq_len
    return jnp.einsum("bhqk,bhkd->bhqd", a, v.astype(f32)).astype(q.dtype)
