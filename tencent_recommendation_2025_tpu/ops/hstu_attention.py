"""Fused HSTU pointwise-gated attention — Pallas TPU kernels (F7).

Computes, without materializing any [L, L] tensor in HBM:

    S[b,h,q,k] = (Q_h·K_h^T) * hd^-0.5 + rab[h, clip(q-k, 0, buckets-1)]
    A = silu(S) * causal_mask * key_valid / seq_len
    O_h = A @ V_h

Pointwise SiLU attention has no softmax state, so forward and backward are
plain blockwise accumulations — backward saves nothing and recomputes S
(flash-style).

Performance design (v4) — at recsys shapes (D=64, hd=16) these kernels are
instruction/grid-overhead-bound, not FLOP-bound, so the layout minimizes op
count and grid steps:
- tensors travel **head-packed** [B, L, D] (D = H*hd), the natural layout out
  of the uvqk projection — no transposes on the hot path;
- grid is just (B,): one step owns a whole sequence; the q-block loop is a
  *static python unroll*, so every score stripe has a static causal-trimmed
  width ((qb+1)*BLK keys) — no masked-FLOP waste beyond the diagonal block
  and no dynamic control flow;
- relative-position bias without gathers: distances clip at ``buckets-1`` so
  only ``n_near`` sub-diagonal [BLK, BLK] tiles are non-constant; tiles are
  precomputed differentiably in XLA and selected with *static* slot indices
  inside the unrolled loops. rab's gradient flows back through the precompute
  from the tile-gradients the backward kernel accumulates;
- backward is ONE kernel producing dq, dk, dv and the bias-tile gradient in
  a single pass over the stripes (dk/dv accumulate into VMEM scratch);
- **matmul operands keep the input dtype** (bf16 on the product path) with
  f32 accumulation via ``preferred_element_type`` — a Mosaic f32 matmul is
  a multi-pass MXU operation, several-x slower than single-pass bf16;
  silu/mask/bias math runs in f32 regardless.
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


def _n_near(buckets: int, blk: int = BLK) -> int:
    """Number of sub-diagonal block slots whose bias tile is non-constant.

    Capped at 8 slots; configs needing more (buckets > 7*blk + 2) would
    silently substitute the far-constant tile for mid-range distances, so
    they fail loudly here instead.
    """
    needed = (buckets - 2 + blk - 1) // blk + 1
    if needed > 8:
        raise ValueError(
            f"hstu_rel_pos_buckets={buckets} needs {needed} non-constant "
            f"bias tile slots but the kernel supports at most 8 "
            f"(buckets <= {7 * blk + 2}); use fewer buckets or the dense "
            f"XLA path")
    return needed


MASK_NEG = -1e4  # additive logit mask: silu(-1e4) == dsilu(-1e4) == 0 in f32


def _bias_tiles(rab: jnp.ndarray, blk: int = BLK,
                causal_diag: bool = False) -> jnp.ndarray:
    """rab [H, buckets] -> tiles [H, n_near+1, blk, blk].

    Slot s < n_near: Toeplitz tile for block-diagonal offset s; the last slot
    is the constant far tile (all distances clipped to buckets-1).
    Differentiable XLA precompute; tiny (3 tiles for buckets=128).

    ``causal_diag``: fold the causal mask into the slot-0 (diagonal) tile as
    an additive ``MASK_NEG`` on the strict upper triangle — silu/dsilu of a
    ``-1e4`` logit are exactly zero in f32, so kernels using these tiles need
    NO per-stripe multiplicative mask (off-diagonal blocks of a causal stripe
    are fully visible by construction). The constant offset doesn't touch the
    rab gradient path.
    """
    H, buckets = rab.shape
    nn = _n_near(buckets, blk)
    iq = jax.lax.broadcasted_iota(jnp.int32, (blk, blk), 0)
    ik = jax.lax.broadcasted_iota(jnp.int32, (blk, blk), 1)
    tiles = []
    for s in range(nn):
        dist = jnp.clip(s * blk + iq - ik, 0, buckets - 1)
        tiles.append(jnp.take(rab, dist, axis=1))      # [H, blk, blk]
    far = jnp.broadcast_to(rab[:, buckets - 1][:, None, None],
                           (H, blk, blk))
    tiles.append(far)
    if causal_diag:
        tiles[0] = tiles[0] + jnp.where(iq >= ik, 0.0, MASK_NEG)
    return jnp.stack(tiles, axis=1)


def _chunk_blk(L: int, H: int, buckets: int) -> int:
    """Block size for the chunked-KV variant: 256 when it divides L and the
    in-VMEM bias-tile stack (plus the dq kernel's accumulated tile
    gradients, both [H, nt, blk, blk] f32) fits, else 128.

    256 measured 3.5x faster than 128 at L=4096 (6.0 vs 20.8 ms fwd+bwd,
    B=32, H=1 — 4x fewer grid steps, MXU-shaped [256, hd] x [hd, 256]
    matmuls). 512 measured 19x SLOWER than 256 (116 ms): the [blk, blk] f32
    intermediates (s/da/ds/mask ~1MB each) blow vector-register budget and
    Mosaic spills — don't raise this without re-measuring."""
    for blk in (256, 128):
        if L % blk != 0:
            continue
        nt = _n_near(buckets, blk) + 1
        if 2 * H * nt * blk * blk * 4 <= 8 * 1024 * 1024:
            return blk
    return BLK


def _dsilu(s):
    sig = jax.nn.sigmoid(s)
    return sig * (1.0 + s * (1.0 - sig))


def _stripe_bias(tiles_ref, h, qb, n_kb, n_tiles):
    """Static [BLK, n_kb*BLK] bias stripe for query block qb. Indexes the
    tiles REF with static indices (Mosaic lowers static ref indexing as
    slices; indexing a loaded 4-D value would emit an unsupported gather)."""
    parts = []
    for kb in range(n_kb):
        slot = min(qb - kb, n_tiles - 1)
        parts.append(tiles_ref[h, slot])
    return jnp.concatenate(parts, axis=1)


def _diag_causal(n_kb):
    """[BLK, n_kb*BLK] bool: causal structure of a stripe whose last block is
    the diagonal (earlier blocks fully visible)."""
    iq = jax.lax.broadcasted_iota(jnp.int32, (BLK, n_kb * BLK), 0)
    ik = jax.lax.broadcasted_iota(jnp.int32, (BLK, n_kb * BLK), 1)
    return (iq + (n_kb - 1) * BLK) >= ik


def _load_qkv(q_ref, k_ref, v_ref, scale, silu_qkv):
    """Load q/k/v (whole block), optionally applying SiLU in-kernel.

    With ``silu_qkv`` the caller passes PRE-activation projections and the
    block skips its [B, L, 3D] silu pass entirely — the activation runs here
    on VMEM-resident data (one fused VPU op per operand, no HBM round trip).
    Matmul operands stay in the input dtype (bf16 on the product path — a
    Mosaic f32 matmul is a multi-pass MXU op) with f32 accumulation."""
    f32 = jnp.float32
    cdt = q_ref.dtype
    if silu_qkv:
        q = (jax.nn.silu(q_ref[0].astype(f32)) * scale).astype(cdt)
        k = jax.nn.silu(k_ref[0].astype(f32)).astype(cdt)
        v = jax.nn.silu(v_ref[0].astype(f32)).astype(cdt)
    else:
        q = (q_ref[0].astype(f32) * scale).astype(cdt)
        k = k_ref[0]
        v = v_ref[0]
    return q, k, v


def _fwd_kernel(q_ref, k_ref, v_ref, valid_ref, tiles_ref, o_ref, *,
                seq_len: int, n_tiles: int, scale: float, num_heads: int,
                n_blocks: int, silu_qkv: bool):
    f32 = jnp.float32
    cdt = q_ref.dtype
    q, k, v = _load_qkv(q_ref, k_ref, v_ref, scale, silu_qkv)
    D = q.shape[-1]
    hd = D // num_heads
    kv_ok = (valid_ref[0] != 0)                         # [1, L] (stay 2-D)

    for qb in range(n_blocks):
        ks = (qb + 1) * BLK                              # static stripe width
        qsl = slice(qb * BLK, (qb + 1) * BLK)
        m = jnp.logical_and(_diag_causal(qb + 1),
                            kv_ok[:, :ks]).astype(f32) / seq_len
        outs = []
        for h in range(num_heads):
            sl = slice(h * hd, (h + 1) * hd)
            s = jax.lax.dot_general(q[qsl, sl], k[:ks, sl],
                                    (((1,), (1,)), ((), ())),
                                    preferred_element_type=f32)  # [BLK, ks]
            s = s + _stripe_bias(tiles_ref, h, qb, qb + 1, n_tiles)
            a = (jax.nn.silu(s) * m).astype(cdt)
            outs.append(jax.lax.dot_general(a, v[:ks, sl],
                                            (((1,), (0,)), ((), ())),
                                            preferred_element_type=f32))
        o_ref[0, qsl, :] = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, do_ref, valid_ref, tiles_ref,
                dq_ref, dk_ref, dv_ref, dtiles_ref,
                dk_acc, dv_acc, *,
                seq_len: int, n_tiles: int, scale: float, n_blocks: int,
                num_heads: int, silu_qkv: bool):
    """One pass: dq written per q block; dk/dv accumulated in VMEM scratch;
    bias-tile gradients accumulated across the (B,) grid. With ``silu_qkv``
    the gradients chain through the in-kernel SiLU (dsilu of the
    pre-activation refs multiplied at the output writes)."""
    b = pl.program_id(0)
    f32 = jnp.float32
    cdt = q_ref.dtype
    q, k, v = _load_qkv(q_ref, k_ref, v_ref, scale, silu_qkv)
    do = do_ref[0]
    D = q.shape[-1]
    hd = D // num_heads
    kv_ok = (valid_ref[0] != 0)                         # [1, L] (stay 2-D)

    @pl.when(b == 0)
    def _():
        dtiles_ref[...] = jnp.zeros_like(dtiles_ref)

    dk_acc[...] = jnp.zeros_like(dk_acc)
    dv_acc[...] = jnp.zeros_like(dv_acc)

    for qb in range(n_blocks):
        ks = (qb + 1) * BLK
        qsl = slice(qb * BLK, (qb + 1) * BLK)
        m = jnp.logical_and(_diag_causal(qb + 1),
                            kv_ok[:, :ks]).astype(f32) / seq_len
        dqs = []
        for h in range(num_heads):
            sl = slice(h * hd, (h + 1) * hd)
            s = jax.lax.dot_general(q[qsl, sl], k[:ks, sl],
                                    (((1,), (1,)), ((), ())),
                                    preferred_element_type=f32)
            s = s + _stripe_bias(tiles_ref, h, qb, qb + 1, n_tiles)
            a = (jax.nn.silu(s) * m).astype(cdt)
            # dv[:ks] += a^T @ do_blk
            dv_acc[:ks, sl] += jax.lax.dot_general(
                a, do[qsl, sl], (((0,), (0,)), ((), ())),
                preferred_element_type=f32)
            da = jax.lax.dot_general(do[qsl, sl], v[:ks, sl],
                                     (((1,), (1,)), ((), ())),
                                     preferred_element_type=f32)
            ds = da * _dsilu(s) * m                     # [BLK, ks] f32
            ds_c = ds.astype(cdt)
            dqs.append(jax.lax.dot_general(ds_c, k[:ks, sl],
                                           (((1,), (0,)), ((), ())),
                                           preferred_element_type=f32))
            dk_acc[:ks, sl] += jax.lax.dot_general(
                ds_c, q[qsl, sl], (((0,), (0,)), ((), ())),
                preferred_element_type=f32)
            for kb in range(qb + 1):                    # static slots
                slot = min(qb - kb, n_tiles - 1)
                dtiles_ref[h, slot] += ds[:, kb * BLK:(kb + 1) * BLK]
        dq_blk = jnp.concatenate(dqs, axis=-1) * scale
        if silu_qkv:
            dq_blk = dq_blk * _dsilu(q_ref[0, qsl, :].astype(f32))
        dq_ref[0, qsl, :] = dq_blk.astype(dq_ref.dtype)

    dk_out = dk_acc[...]
    dv_out = dv_acc[...]
    if silu_qkv:
        dk_out = dk_out * _dsilu(k_ref[0].astype(f32))
        dv_out = dv_out * _dsilu(v_ref[0].astype(f32))
    dk_ref[0] = dk_out.astype(dk_ref.dtype)
    dv_ref[0] = dv_out.astype(dv_ref.dtype)




# ---------------------------------------------------------------------------
# Long-sequence variant (chunked KV): K/V stream through VMEM in [BLK, D]
# tiles on a (B, nq, nk) / (B, nk, nq) grid — VMEM use is flat in L (the
# round-1 variant loaded whole [L, D] K/V blocks and capped at L=2048 on
# v5e's scoped VMEM). Fully-above-diagonal (kb > qb) tiles skip compute via
# pl.when. Backward runs as TWO passes (dq+bias-grad over q-major order,
# dk/dv over k-major order) — the standard flash-bwd decomposition; S is
# recomputed per pass.
# ---------------------------------------------------------------------------

MAX_WHOLESEQ_L = 1024


def _use_long(L: int, D: int) -> bool:
    """Whole-seq vs chunked-KV dispatch, D-aware: the whole-seq kernels hold
    [L, D] q/k/v(/do) plus f32 stripe transients in VMEM, so the L ceiling
    scales ~1/D. Probed on v5e 2026-08-20 (via the fused-block twin of this
    kernel): D=64 fits at L=1024; D=128 at L=1024 needs 20.9 MB scoped VMEM
    against the 16 MB Mosaic limit. Tests monkeypatch MAX_WHOLESEQ_L, so
    read it dynamically."""
    return L * max(D, 64) > MAX_WHOLESEQ_L * 64


def _chunk_mask(qb, kb, valid_ref, seq_len):
    f32 = jnp.float32
    blk = valid_ref.shape[-1]  # chunk block size (from the block spec)
    iq = qb * blk + jax.lax.broadcasted_iota(jnp.int32, (blk, blk), 0)
    ik = kb * blk + jax.lax.broadcasted_iota(jnp.int32, (blk, blk), 1)
    kv_ok = valid_ref[0] != 0                            # [1, blk]
    return jnp.logical_and(iq >= ik, kv_ok).astype(f32) / seq_len


def _fwd_kernel_chunk(q_ref, k_ref, v_ref, valid_ref, tiles_ref, o_ref,
                      acc_ref, *, seq_len, n_tiles, scale, num_heads,
                      n_k_blocks, silu_qkv):
    qb = pl.program_id(1)
    kb = pl.program_id(2)
    f32 = jnp.float32

    @pl.when(kb == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    @pl.when(kb <= qb)
    def _():
        q, k, v = _load_qkv(q_ref, k_ref, v_ref, scale, silu_qkv)
        cdt = q_ref.dtype
        D = q.shape[-1]
        hd = D // num_heads
        m = _chunk_mask(qb, kb, valid_ref, seq_len)
        slot = jnp.clip(qb - kb, 0, n_tiles - 1)
        for h in range(num_heads):
            sl = slice(h * hd, (h + 1) * hd)
            s = jax.lax.dot_general(q[:, sl], k[:, sl],
                                    (((1,), (1,)), ((), ())),
                                    preferred_element_type=f32)
            a = (jax.nn.silu(s + tiles_ref[h, slot]) * m).astype(cdt)
            acc_ref[:, sl] += jax.lax.dot_general(
                a, v[:, sl], (((1,), (0,)), ((), ())),
                preferred_element_type=f32)

    @pl.when(kb == n_k_blocks - 1)
    def _():
        o_ref[0] = acc_ref[...].astype(o_ref.dtype)


def _dq_kernel_chunk(q_ref, k_ref, v_ref, do_ref, valid_ref, tiles_ref,
                     dq_ref, dtiles_ref, dq_acc, *,
                     seq_len, n_tiles, scale, num_heads, n_k_blocks,
                     silu_qkv):
    b = pl.program_id(0)
    qb = pl.program_id(1)
    kb = pl.program_id(2)
    f32 = jnp.float32

    @pl.when(jnp.logical_and(b == 0, jnp.logical_and(qb == 0, kb == 0)))
    def _():
        dtiles_ref[...] = jnp.zeros_like(dtiles_ref)

    @pl.when(kb == 0)
    def _():
        dq_acc[...] = jnp.zeros_like(dq_acc)

    @pl.when(kb <= qb)
    def _():
        q, k, v = _load_qkv(q_ref, k_ref, v_ref, scale, silu_qkv)
        cdt = q_ref.dtype
        do = do_ref[0]
        D = q.shape[-1]
        hd = D // num_heads
        m = _chunk_mask(qb, kb, valid_ref, seq_len)
        slot = jnp.clip(qb - kb, 0, n_tiles - 1)
        for h in range(num_heads):
            sl = slice(h * hd, (h + 1) * hd)
            s = jax.lax.dot_general(q[:, sl], k[:, sl],
                                    (((1,), (1,)), ((), ())),
                                    preferred_element_type=f32)
            s = s + tiles_ref[h, slot]
            da = jax.lax.dot_general(do[:, sl], v[:, sl],
                                     (((1,), (1,)), ((), ())),
                                     preferred_element_type=f32)
            ds = da * _dsilu(s) * m                      # [BLK, BLK] f32
            dq_acc[:, sl] += jax.lax.dot_general(
                ds.astype(cdt), k[:, sl], (((1,), (0,)), ((), ())),
                preferred_element_type=f32)
            dtiles_ref[h, slot] += ds

    @pl.when(kb == n_k_blocks - 1)
    def _():
        dq_out = dq_acc[...] * scale
        if silu_qkv:
            dq_out = dq_out * _dsilu(q_ref[0].astype(f32))
        dq_ref[0] = dq_out.astype(dq_ref.dtype)


def _dkdv_kernel_chunk(q_ref, k_ref, v_ref, do_ref, valid_ref, tiles_ref,
                       dk_ref, dv_ref, dk_acc, dv_acc, *,
                       seq_len, n_tiles, scale, num_heads, n_q_blocks,
                       silu_qkv):
    kb = pl.program_id(1)
    qb = pl.program_id(2)
    f32 = jnp.float32

    @pl.when(qb == 0)
    def _():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    @pl.when(qb >= kb)
    def _():
        q, k, v = _load_qkv(q_ref, k_ref, v_ref, scale, silu_qkv)
        cdt = q_ref.dtype
        do = do_ref[0]
        D = q.shape[-1]
        hd = D // num_heads
        m = _chunk_mask(qb, kb, valid_ref, seq_len)
        slot = jnp.clip(qb - kb, 0, n_tiles - 1)
        for h in range(num_heads):
            sl = slice(h * hd, (h + 1) * hd)
            s = jax.lax.dot_general(q[:, sl], k[:, sl],
                                    (((1,), (1,)), ((), ())),
                                    preferred_element_type=f32)
            s = s + tiles_ref[h, slot]
            a = (jax.nn.silu(s) * m).astype(cdt)
            dv_acc[:, sl] += jax.lax.dot_general(
                a, do[:, sl], (((0,), (0,)), ((), ())),
                preferred_element_type=f32)
            da = jax.lax.dot_general(do[:, sl], v[:, sl],
                                     (((1,), (1,)), ((), ())),
                                     preferred_element_type=f32)
            ds = (da * _dsilu(s) * m).astype(cdt)
            dk_acc[:, sl] += jax.lax.dot_general(
                ds, q[:, sl], (((0,), (0,)), ((), ())),
                preferred_element_type=f32)

    @pl.when(qb == n_q_blocks - 1)
    def _():
        dk_out = dk_acc[...]
        dv_out = dv_acc[...]
        if silu_qkv:
            dk_out = dk_out * _dsilu(k_ref[0].astype(f32))
            dv_out = dv_out * _dsilu(v_ref[0].astype(f32))
        dk_ref[0] = dk_out.astype(dk_ref.dtype)
        dv_ref[0] = dv_out.astype(dv_ref.dtype)


def _pallas_fwd_long(q, k, v, valid3, tiles, seq_len, scale, num_heads,
                     interpret, silu_qkv):
    B, L, D = q.shape
    blk = tiles.shape[-1]  # chunk block size (tiles built at _chunk_blk)
    nq = L // blk
    nt = tiles.shape[1]
    H = tiles.shape[0]
    return pl.pallas_call(
        functools.partial(_fwd_kernel_chunk, seq_len=seq_len, n_tiles=nt,
                          scale=scale, num_heads=num_heads, n_k_blocks=nq,
                          silu_qkv=silu_qkv),
        grid=(B, nq, nq),
        in_specs=[
            pl.BlockSpec((1, blk, D), lambda b, qb, kb: (b, qb, 0)),
            pl.BlockSpec((1, blk, D), lambda b, qb, kb: (b, kb, 0)),
            pl.BlockSpec((1, blk, D), lambda b, qb, kb: (b, kb, 0)),
            pl.BlockSpec((1, 1, blk), lambda b, qb, kb: (b, 0, kb)),
            pl.BlockSpec((H, nt, blk, blk), lambda b, qb, kb: (0, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, blk, D), lambda b, qb, kb: (b, qb, 0)),
        out_shape=jax.ShapeDtypeStruct((B, L, D), q.dtype),
        scratch_shapes=[pltpu.VMEM((blk, D), jnp.float32)],
        interpret=interpret,
    )(q, k, v, valid3, tiles)


def _pallas_bwd_long(q, k, v, do, valid3, tiles, seq_len, scale, num_heads,
                     interpret, silu_qkv):
    B, L, D = q.shape
    blk = tiles.shape[-1]
    nq = L // blk
    nt = tiles.shape[1]
    H = tiles.shape[0]
    dq, dtiles = pl.pallas_call(
        functools.partial(_dq_kernel_chunk, seq_len=seq_len, n_tiles=nt,
                          scale=scale, num_heads=num_heads, n_k_blocks=nq,
                          silu_qkv=silu_qkv),
        grid=(B, nq, nq),
        in_specs=[
            pl.BlockSpec((1, blk, D), lambda b, qb, kb: (b, qb, 0)),
            pl.BlockSpec((1, blk, D), lambda b, qb, kb: (b, kb, 0)),
            pl.BlockSpec((1, blk, D), lambda b, qb, kb: (b, kb, 0)),
            pl.BlockSpec((1, blk, D), lambda b, qb, kb: (b, qb, 0)),
            pl.BlockSpec((1, 1, blk), lambda b, qb, kb: (b, 0, kb)),
            pl.BlockSpec((H, nt, blk, blk), lambda b, qb, kb: (0, 0, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, blk, D), lambda b, qb, kb: (b, qb, 0)),
            pl.BlockSpec((H, nt, blk, blk), lambda b, qb, kb: (0, 0, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, L, D), q.dtype),
            jax.ShapeDtypeStruct((H, nt, blk, blk), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((blk, D), jnp.float32)],
        interpret=interpret,
    )(q, k, v, do, valid3, tiles)
    dk, dv = pl.pallas_call(
        functools.partial(_dkdv_kernel_chunk, seq_len=seq_len, n_tiles=nt,
                          scale=scale, num_heads=num_heads, n_q_blocks=nq,
                          silu_qkv=silu_qkv),
        grid=(B, nq, nq),
        in_specs=[
            pl.BlockSpec((1, blk, D), lambda b, kb, qb: (b, qb, 0)),
            pl.BlockSpec((1, blk, D), lambda b, kb, qb: (b, kb, 0)),
            pl.BlockSpec((1, blk, D), lambda b, kb, qb: (b, kb, 0)),
            pl.BlockSpec((1, blk, D), lambda b, kb, qb: (b, qb, 0)),
            pl.BlockSpec((1, 1, blk), lambda b, kb, qb: (b, 0, kb)),
            pl.BlockSpec((H, nt, blk, blk), lambda b, kb, qb: (0, 0, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, blk, D), lambda b, kb, qb: (b, kb, 0)),
            pl.BlockSpec((1, blk, D), lambda b, kb, qb: (b, kb, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, L, D), q.dtype),
            jax.ShapeDtypeStruct((B, L, D), q.dtype),
        ],
        scratch_shapes=[pltpu.VMEM((blk, D), jnp.float32),
                        pltpu.VMEM((blk, D), jnp.float32)],
        interpret=interpret,
    )(q, k, v, do, valid3, tiles)
    return dq, dk, dv, dtiles


def _pallas_fwd(q, k, v, valid3, tiles, seq_len, scale, num_heads,
                interpret, silu_qkv):
    B, L, D = q.shape
    if _use_long(L, D):
        return _pallas_fwd_long(q, k, v, valid3, tiles, seq_len, scale,
                                num_heads, interpret, silu_qkv)
    nq = L // BLK
    nt = tiles.shape[1]
    H = tiles.shape[0]
    return pl.pallas_call(
        functools.partial(_fwd_kernel, seq_len=seq_len, n_tiles=nt,
                          scale=scale, num_heads=num_heads, n_blocks=nq,
                          silu_qkv=silu_qkv),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, L, D), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, L, D), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, L, D), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, 1, L), lambda b: (b, 0, 0)),
            pl.BlockSpec((H, nt, BLK, BLK), lambda b: (0, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, L, D), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, L, D), q.dtype),
        interpret=interpret,
    )(q, k, v, valid3, tiles)


def _pallas_bwd(q, k, v, do, valid3, tiles, seq_len, scale, num_heads,
                interpret, silu_qkv):
    B, L, D = q.shape
    if _use_long(L, D):
        return _pallas_bwd_long(q, k, v, do, valid3, tiles, seq_len, scale,
                                num_heads, interpret, silu_qkv)
    nq = L // BLK
    nt = tiles.shape[1]
    H = tiles.shape[0]
    dq, dk, dv, dtiles = pl.pallas_call(
        functools.partial(_bwd_kernel, seq_len=seq_len, n_tiles=nt,
                          scale=scale, n_blocks=nq, num_heads=num_heads,
                          silu_qkv=silu_qkv),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, L, D), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, L, D), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, L, D), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, L, D), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, 1, L), lambda b: (b, 0, 0)),
            pl.BlockSpec((H, nt, BLK, BLK), lambda b: (0, 0, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, L, D), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, L, D), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, L, D), lambda b: (b, 0, 0)),
            pl.BlockSpec((H, nt, BLK, BLK), lambda b: (0, 0, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, L, D), q.dtype),
            jax.ShapeDtypeStruct((B, L, D), q.dtype),
            jax.ShapeDtypeStruct((B, L, D), q.dtype),
            jax.ShapeDtypeStruct((H, nt, BLK, BLK), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((L, D), jnp.float32),
                        pltpu.VMEM((L, D), jnp.float32)],
        interpret=interpret,
    )(q, k, v, do, valid3, tiles)
    return dq, dk, dv, dtiles


def _tile_blk(L: int, H: int, buckets: int, D: int = 64) -> int:
    """Bias-tile block size: whole-seq stripes use BLK; the chunked-KV
    variant (_use_long) uses the larger _chunk_blk."""
    return _chunk_blk(L, H, buckets) if _use_long(L, D) else BLK


def _bias_tiles_transpose(dtiles: jnp.ndarray, buckets: int) -> jnp.ndarray:
    """Analytic transpose of _bias_tiles: tile grads [H, nt, blk, blk] ->
    drab [H, buckets].

    ``jax.vjp(_bias_tiles)`` would emit a scatter-add with blk*blk duplicate
    indices per tile (only ``buckets`` distinct values) — TPU serializes
    colliding scatter updates, measured SECONDS per call at blk=256. Each
    Toeplitz tile's bucket gradient is a sum over its diagonals instead:
    flip columns, pad each row by blk+1 and re-reshape so row i shifts left
    by i (the standard diagonal-extraction trick), then column-sum — O(blk^2)
    vector adds plus a tiny [2*blk]->[buckets] indexed add with static
    indices."""
    H, nt, blk, _ = dtiles.shape
    drab = jnp.zeros((H, buckets), dtiles.dtype)
    offs = np.arange(2 * blk) - (blk - 1)           # i - j per output column
    for s in range(nt - 1):
        M = dtiles[:, s][:, :, ::-1]                # flip j: antidiag = diag
        A = jnp.pad(M, ((0, 0), (0, 0), (0, blk + 1)))
        Bv = A.reshape(H, -1)[:, : 2 * blk * blk].reshape(H, blk, 2 * blk)
        S = Bv.sum(axis=1)                          # [H, 2blk] diagonal sums
        dist = np.clip(s * blk + offs, 0, buckets - 1)
        drab = drab.at[:, dist].add(S)
    # far slot: every position reads rab[buckets-1]
    drab = drab.at[:, buckets - 1].add(dtiles[:, nt - 1].sum(axis=(1, 2)))
    return drab


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _hstu_attn_core(q, k, v, valid3, rab, seq_len, num_heads, interpret,
                    silu_qkv):
    tiles = _bias_tiles(rab, _tile_blk(q.shape[1], rab.shape[0],
                                       rab.shape[1], q.shape[-1]))
    hd = q.shape[-1] // num_heads
    return _pallas_fwd(q, k, v, valid3, tiles, seq_len, hd ** -0.5,
                       num_heads, interpret, silu_qkv)


def _core_fwd(q, k, v, valid3, rab, seq_len, num_heads, interpret,
              silu_qkv):
    out = _hstu_attn_core(q, k, v, valid3, rab, seq_len, num_heads,
                          interpret, silu_qkv)
    return out, (q, k, v, valid3, rab)


def _core_bwd(seq_len, num_heads, interpret, silu_qkv, res, g):
    q, k, v, valid3, rab = res
    blk = _tile_blk(q.shape[1], rab.shape[0], rab.shape[1], q.shape[-1])
    tiles = _bias_tiles(rab, blk)
    hd = q.shape[-1] // num_heads
    dq, dk, dv, dtiles = _pallas_bwd(q, k, v, g, valid3, tiles, seq_len,
                                     hd ** -0.5, num_heads, interpret,
                                     silu_qkv)
    # route tile grads back to rab via the analytic Toeplitz transpose
    # (autodiff through _bias_tiles emits a duplicate-heavy scatter-add
    # that TPU serializes — seconds per call at blk>=256)
    drab = _bias_tiles_transpose(dtiles, rab.shape[1])
    return dq, dk, dv, None, drab


_hstu_attn_core.defvjp(_core_fwd, _core_bwd)


def hstu_attention_packed(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                          valid: jnp.ndarray, rab: jnp.ndarray,
                          seq_len: int, num_heads: int,
                          interpret: bool = False,
                          silu_qkv: bool = False) -> jnp.ndarray:
    """Head-packed fused HSTU attention: q/k/v [B, L, D] with D = H*hd
    (L % 128 == 0); valid [B, L]; rab [H, buckets]. Returns [B, L, D].

    ``silu_qkv``: q/k/v are PRE-activation projections and SiLU runs inside
    the kernel (saves the [B, L, 3D] elementwise pass + its remat recompute;
    gradients chain through dsilu in the kernel epilogues)."""
    valid3 = valid.astype(jnp.int32)[:, None, :]
    return _hstu_attn_core(q, k, v, valid3, rab, seq_len, num_heads,
                           interpret, silu_qkv)


def hstu_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                   valid: jnp.ndarray, rab: jnp.ndarray, seq_len: int,
                   interpret: bool = False,
                   silu_qkv: bool = False) -> jnp.ndarray:
    """[B, H, L, hd] interface (transposes into the packed layout)."""
    B, H, L, hd = q.shape

    def pack(t):
        return t.transpose(0, 2, 1, 3).reshape(B, L, H * hd)

    out = hstu_attention_packed(pack(q), pack(k), pack(v), valid, rab,
                                seq_len, H, interpret, silu_qkv)
    return out.reshape(B, L, H, hd).transpose(0, 2, 1, 3)


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
