"""Fully-fused HSTU block — one Pallas kernel per direction (F7 follow-up).

Round-2 roofline (BASELINE.md): with attention already fused, the flagship
step is VPU-bound — ~60 of 100 ms are unfused elementwise passes (2 LNs,
SiLU gating, dropout mask+mul, residuals, bf16<->f32 casts) over
[B*L, D] activations, paid 3x (fwd + remat recompute + bwd). This kernel
removes them by running the ENTIRE block on VMEM-resident data:

    h    = LN(x; ln1)                       # block attn_ln
    uvqk = silu(h @ Wuvqk + b)              # one MXU matmul, D -> 4D
    u, v, q, k = split(uvqk)
    av   = (silu(q k^T * sc + rab) * mask / L) @ v   # stripe loop, same
                                                     # math as ops/hstu_attention.py
    g    = dropout(LN(av; ln2) * u)
    y    = x + g @ Wo + bo
    h2   = LN(y; ln3)                       # block ffn_ln
    x1, x3 = split(h2 @ W13)                # SwiGLU (C2b)
    out  = y + dropout(silu(x1) * x3) @ W2

TRANSPOSED LAYOUT (round 4): the kernel runs on [D, L] activations, not
[L, D]. At the flagship D=64 the minor dim of every [L, D] array is
lane-padded 64->128 (Mosaic T(8,128) tiling), so HALF of every VPU pass
and half of every MXU output tile with N=D was wasted by construction —
the round-3 roofline's "D=64 fills only half the 128-lane MXU output".
With activations [D, L] (L a multiple of 128):

  * every elementwise pass packs VREG lanes fully (2x VPU throughput);
  * the attention stripe matmuls ALL fill the output lanes: fwd
    s^T = k q^T is [ks, BLK] (N=128) and av^T = v^T a^T is [hd, BLK]
    via a K=ks contraction; bwd dq^T/dk^T/dv^T come out [hd, *] through
    K=128/ks contractions instead of the old N=64 half-lane products;
  * weight matmuls become W^T @ act with N=L (full);
  * VMEM residents shrink 2x (no lane padding on [D, L] f32 scratch).

There are NO transposes inside the kernel — the bias tiles are passed
pre-transposed, kv padding becomes a [L, 1] column add, LN reduces over
sublanes, and dq/dk/dv are produced transposed by construction. The
encoder transposes [B, L, D] -> [B, D, L] ONCE outside its lax.scan over
blocks (models/encoder.encode), so chained blocks pay no per-block
relayout either.

The backward direction is ONE kernel: it recomputes the forward
intermediates in VMEM (in-kernel rematerialization — only the attention
output ``av`` is saved from the forward, the round-2 finding that re-running
the attention stripes costs real wall clock), regenerates the dropout masks
from the same per-(batch row, site) PRNG seeds, and produces dx plus every
weight gradient, accumulated across the (B,) grid into revisited output
blocks (the same pattern as the bias-tile gradients in ops/hstu_attention).

Numerics: matmul operands are the input dtype (bf16 on the product path)
with f32 accumulation; ALL elementwise math (LN stats, silu, gating,
residuals) runs in f32 — slightly tighter than the unfused bf16 XLA path.
LN eps matches models/embedding.layernorm (1e-8). Dropout keep masks come
from the in-kernel PRNG (pltpu.prng_seed / prng_random_bits), reseeded per
(seed, 2*batch row + site) so forward and backward regenerate identical
masks (Mosaic caps prng_seed at TWO values — probed on v5e).

Replaces the per-op chain around the reference's SDPA block
(model/BaseLine/model.py:337-350) which is structurally unfusable in eager
torch; here the whole block is one kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .hstu_attention import (BLK, MASK_NEG, _bias_tiles,
                             _bias_tiles_transpose, _dsilu)

# stripe q-block width. 128 measured best on v5e in BOTH layouts: at 256
# the flagship block measured fwd+bwd 3.99 vs 3.26 ms pre-transpose
# (2026-08-18) and 3.40 vs 2.68 ms in the transposed layout (2026-08-19,
# fwd 1.90 vs 1.08) — the [ks, 256] f32 stripe intermediates pressure the
# vector registers, the same failure mode as the chunked kernel's 512 block
FB_BLK = BLK

# --- chunked variant (L > FB_WHOLESEQ_MAX) -------------------------------
# The whole-seq kernels materialize [4D, L] / [2F, L] f32 intermediates;
# at L=2048 the backward needs 20.7 MB of scoped VMEM (probed on v5e,
# 2026-08-19) against the 16 MB limit — and in-kernel PYTHON chunk loops do
# NOT fix it (Mosaic stack allocation does not reliably reuse slots across
# unrolled iterations: a fully chunk-looped single backward kernel still
# needed 21-22 MB, and even the attention stripe loop alone needed 18 MB —
# probed 2026-08-20). So beyond FB_WHOLESEQ_MAX every loop becomes a GRID
# dimension across a pipeline of pallas_calls staging through HBM:
#   fwd:  pre (B, nc) -> attention (B, n_qb, n_kb) -> post (B, nc)
#   bwd:  gate/FFN (B, nc) -> dq (B, n_qb, n_kb) + dk/dv (B, n_kb, n_qb)
#         -> projection/LN1 (B, nc)
# The attention stages mirror ops/hstu_attention's chunked-KV grid design
# (above-diagonal tiles skipped via pl.when, dynamic rel-pos tile slot) in
# the TRANSPOSED layout. Staging q/k/v + stage-boundary grads through HBM
# costs ~1 GB of traffic per block backward at B=128/L=2048 (~1 ms at v5e
# HBM bandwidth) against a provably chunk-sized Mosaic stack per kernel.
# Numerics contract (f32 elementwise, bf16 matmul operands, PRNG dropout)
# is identical to the whole-seq kernels.
FB_WHOLESEQ_MAX = 1024   # whole-seq kernel ceiling (== hstu MAX_WHOLESEQ_L)
FB_CHUNK = 512           # L-chunk width for the projection/FFN grid stages
FB_ATTN_BLK = 256        # attention tile width, forward stage
FB_ATTN_BLK_BWD = 512    # attention tile width, backward dq/dkdv passes
MAX_CHUNKED_L = 16384    # probed ceiling for the chunked variant on v5e
#                          (round 5: full train steps measured at L=8192 —
#                          569.7K tok/s, 230.1 ms @ B=16 — and L=16384 —
#                          348.9K tok/s, 375.7 ms @ B=8; VMEM stays flat,
#                          the O(L^2) attention grid dominates growth.
#                          Beyond this, shard L over the seq axis — the
#                          ring-fused path reuses these kernels per shard)


def wholeseq_max_l(D: int) -> int:
    """Whole-seq kernel ceiling as a function of model width.

    The whole-seq kernels' scoped-VMEM transients scale ~D*L ([4D, L] /
    [2F, L] staging), so the L ceiling halves per D doubling. Probed on
    v5e (2026-08-20): D=64 fits at L=1024 (= FB_WHOLESEQ_MAX, round 4);
    D=128 at L=1024 needs 20.93 MB scoped VMEM against the 16 MB Mosaic
    limit — the same +25-30%-over-limit signature as D=64 at L=2048.
    Above the ceiling the chunked pipeline takes over: it needs a chunk
    width from _chunk_of (FB_CHUNK with 256/128 fallbacks, D-capped), and
    fused_block_supported gates the rare L values where no width divides
    (any L % FB_BLK != 0)."""
    return FB_WHOLESEQ_MAX * 64 // max(D, 64)


# Widest model the CHUNKED kernels accept: the attention stages' minimum
# tile is FB_BLK=128 wide and stage transients scale ~D*blk, so beyond
# D = 64*FB_ATTN_BLK_BWD/FB_BLK = 256 even the narrowest tile exceeds the
# probed D=64 VMEM budget — the gate falls back to the unfused XLA path.
MAX_FUSED_D = 64 * FB_ATTN_BLK_BWD // FB_BLK

_EPS = 1e-8  # models/embedding.layernorm default


def _ln_fwd_t(xf, g_col, b_col):
    """f32 LN over the SUBLANE (feature) axis of a [D, L] activation;
    params as [D, 1] columns. Returns (out, xhat, rstd[1, L])."""
    mu = jnp.mean(xf, axis=0, keepdims=True)
    var = jnp.mean((xf - mu) * (xf - mu), axis=0, keepdims=True)
    rstd = jax.lax.rsqrt(var + _EPS)
    xhat = (xf - mu) * rstd
    return xhat * g_col + b_col, xhat, rstd


def _ln_bwd_t(dy, xhat, rstd, g_col):
    """dx for y = xhat*g + b in [D, L] layout; (dgamma, dbeta) are [D, 1]
    lane-sums."""
    dxhat = dy * g_col
    m1 = jnp.mean(dxhat, axis=0, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=0, keepdims=True)
    dx = rstd * (dxhat - m1 - xhat * m2)
    return (dx, jnp.sum(dy * xhat, axis=1, keepdims=True),
            jnp.sum(dy, axis=1, keepdims=True))


def _keep_mask(shape, rate):
    """0-or-1/(1-rate) f32 keep mask from the seeded in-kernel PRNG."""
    thr = jnp.uint32(int(rate * (2.0 ** 32)))
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    return (bits >= thr).astype(jnp.float32) / (1.0 - rate)


def _dot(a, b, dims):
    return jax.lax.dot_general(a, b, (dims, ((), ())),
                               preferred_element_type=jnp.float32)


def _stripe_bias_t(tilest_ref, h, qb, n_kb, n_tiles):
    """Static [n_kb*BLK, BLK] TRANSPOSED bias stripe for query block qb
    ([k, q]-indexed, matching s^T). ``tilest_ref`` holds the bias tiles
    pre-transposed per tile (XLA-side ``tiles.transpose(0, 1, 3, 2)``), so
    this is pure static ref slicing + sublane concatenation."""
    parts = []
    for kb in range(n_kb):
        slot = min(qb - kb, n_tiles - 1)
        parts.append(tilest_ref[h, slot])
    return jnp.concatenate(parts, axis=0)


def _attn_fwd_stripes_t(qt, kt, vt, kvn, tilest_ref, avt_acc, *,
                        n_tiles, num_heads, n_blocks):
    """Whole-seq stripe loop in transposed layout, writing the attention
    output (transposed, [D, L]) into the avt_acc VMEM scratch.

    Per (q-block, head): s^T = k q^T is a [ks, BLK] product (output lanes
    FULL at any head dim — the old layout's av had N=hd<=64 half-lane
    outputs), and av^T = v^T @ silu(s^T) contracts over ks with a [hd, BLK]
    output. Masking is ADDITIVE: the causal upper triangle rides the slot-0
    bias tile and key padding is ``kvn`` ([L, 1] f32, 0 valid / MASK_NEG
    padded) broadcast-added down each stripe's lanes — silu/dsilu(-1e4) == 0
    exactly. The 1/seq_len factor is pre-folded into ``vt`` by the caller."""
    D = qt.shape[0]
    hd = D // num_heads
    blk = tilest_ref.shape[-1]
    for qb in range(n_blocks):
        ks = (qb + 1) * blk
        qsl = slice(qb * blk, (qb + 1) * blk)
        for h in range(num_heads):
            sl = slice(h * hd, (h + 1) * hd)
            st = _dot(kt[sl, :ks], qt[sl, qsl], ((0,), (0,)))   # [ks, blk]
            st = st + (_stripe_bias_t(tilest_ref, h, qb, qb + 1, n_tiles)
                       + kvn[:ks])
            at = jax.nn.silu(st).astype(qt.dtype)
            avt_acc[sl, qsl] = _dot(vt[sl, :ks], at, ((1,), (0,)))


def _attn_bwd_stripes_t(qt, kt, vt, davt, kvn, tilest_ref, dtilest_ref,
                        dkt_acc, dvt_acc, *, n_tiles, num_heads,
                        n_blocks, scale):
    """Stripe backward in transposed layout: returns dq^T ([D, L] f32,
    includes *scale, i.e. the gradient w.r.t. the UNSCALED q projection);
    dk^T/dv^T accumulate into VMEM scratch; TRANSPOSED bias-tile grads
    accumulate into the revisited dtilest output ref (un-transposed by the
    XLA caller — a tiny [H, nt, blk, blk] op).

    Every matmul here fills the output lanes: dv^T and dk^T contract over
    the BLK=128 q dim, dq^T and da^T over ks/hd — the old layout paid N=64
    on all three. Same additive-mask scheme as the forward: ds is exactly
    zero at masked positions (dsilu(-1e4) == 0), so dk/dtiles need no mask
    factor; vt is pre-scaled by 1/seq_len, making the returned dv^T the
    gradient w.r.t. the SCALED v (caller multiplies by 1/seq_len once)."""
    cdt = qt.dtype
    D = qt.shape[0]
    hd = D // num_heads
    blk = tilest_ref.shape[-1]
    dkt_acc[...] = jnp.zeros_like(dkt_acc)
    dvt_acc[...] = jnp.zeros_like(dvt_acc)
    dqt_cols = []
    for qb in range(n_blocks):
        ks = (qb + 1) * blk
        qsl = slice(qb * blk, (qb + 1) * blk)
        dqts = []
        for h in range(num_heads):
            sl = slice(h * hd, (h + 1) * hd)
            dot_b = davt[sl, qsl].astype(cdt)                   # [hd, blk]
            st = _dot(kt[sl, :ks], qt[sl, qsl], ((0,), (0,)))   # [ks, blk]
            st = st + (_stripe_bias_t(tilest_ref, h, qb, qb + 1, n_tiles)
                       + kvn[:ks])
            at = jax.nn.silu(st).astype(cdt)
            dvt_acc[sl, :ks] += _dot(dot_b, at, ((1,), (1,)))   # [hd, ks]
            dat = _dot(vt[sl, :ks], dot_b, ((0,), (0,)))        # [ks, blk]
            dst = dat * _dsilu(st)
            dst_c = dst.astype(cdt)
            dqts.append(_dot(kt[sl, :ks], dst_c, ((1,), (0,))))  # [hd, blk]
            dkt_acc[sl, :ks] += _dot(qt[sl, qsl], dst_c,
                                     ((1,), (1,)))               # [hd, ks]
            for kb in range(qb + 1):
                slot = min(qb - kb, n_tiles - 1)
                dtilest_ref[h, slot] += dst[kb * blk:(kb + 1) * blk, :]
        dqt_cols.append(jnp.concatenate(dqts, axis=0) * scale)
    return jnp.concatenate(dqt_cols, axis=1)


def _kvn_col(valid_ref):
    """Additive key-padding column for one k block: 0 valid / MASK_NEG
    padded ([blk, 1] f32 — one broadcast add per tile instead of a ~7-pass
    iota mask build+multiply; silu/dsilu(-1e4) == 0 exactly in f32).
    Causality needs no per-tile mask: blocks strictly below the diagonal
    are fully visible, kb > qb is skipped by pl.when, and the DIAGONAL
    (qb == kb) resolves to tile slot 0, whose causal upper triangle is
    pre-folded as MASK_NEG by _bias_tiles(causal_diag=True)."""
    return jnp.where(valid_ref[0] != 0, 0.0, MASK_NEG)




# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------

def _fwd_kernel(seed_ref, xt_ref, valid_ref, lnt_ref, wuvqk_ref, buvqkt_ref,
                wo_ref, bot_ref, w13_ref, w2_ref, tilest_ref,
                outt_ref, avt_ref, avt_acc, *,
                seq_len, n_tiles, num_heads, n_blocks, scale, rate, train):
    f32 = jnp.float32
    b = pl.program_id(0)
    xt16 = xt_ref[0]                                  # [D, L] compute dtype
    cdt = xt16.dtype
    xf = xt16.astype(f32)
    D = xf.shape[0]
    kvn = jnp.where(valid_ref[0] != 0, 0.0, MASK_NEG)     # [L, 1] f32
    drop = train and rate > 0.0                       # python-static

    # --- attention half ---
    h1, _, _ = _ln_fwd_t(xf, lnt_ref[:, 0:1], lnt_ref[:, 1:2])
    uvqkt = _dot(wuvqk_ref[...], h1.astype(cdt), ((0,), (0,))) \
        + buvqkt_ref[:, 0:1]
    uvqkt = jax.nn.silu(uvqkt)                        # [4D, L] f32
    ut = uvqkt[:D]
    vt = (uvqkt[D:2 * D] * (1.0 / seq_len)).astype(cdt)
    qt = (uvqkt[2 * D:3 * D] * scale).astype(cdt)
    kt = uvqkt[3 * D:].astype(cdt)
    _attn_fwd_stripes_t(qt, kt, vt, kvn, tilest_ref, avt_acc,
                        n_tiles=n_tiles,
                        num_heads=num_heads, n_blocks=n_blocks)
    avt = avt_acc[...]                                # [D, L] f32
    avt_ref[0] = avt.astype(cdt)                      # residual for backward

    g, _, _ = _ln_fwd_t(avt, lnt_ref[:, 2:3], lnt_ref[:, 3:4])
    g = g * ut
    if drop:
        pltpu.prng_seed(seed_ref[0], 2 * b)
        g = g * _keep_mask(g.shape, rate)
    yt = xf + _dot(wo_ref[...], g.astype(cdt), ((0,), (0,))) + bot_ref[:, 0:1]

    # --- FFN half (SwiGLU) ---
    h2, _, _ = _ln_fwd_t(yt, lnt_ref[:, 4:5], lnt_ref[:, 5:6])
    x13t = _dot(w13_ref[...], h2.astype(cdt), ((0,), (0,)))      # [2F, L]
    F = x13t.shape[0] // 2
    f = jax.nn.silu(x13t[:F]) * x13t[F:]
    if drop:
        pltpu.prng_seed(seed_ref[0], 2 * b + 1)
        f = f * _keep_mask(f.shape, rate)
    outt = yt + _dot(w2_ref[...], f.astype(cdt), ((0,), (0,)))
    outt_ref[0] = outt.astype(outt_ref.dtype)


# ---------------------------------------------------------------------------
# backward kernel
# ---------------------------------------------------------------------------

def _bwd_kernel(seed_ref, xt_ref, valid_ref, lnt_ref, wuvqk_ref, buvqkt_ref,
                wo_ref, bot_ref, w13_ref, w2_ref, tilest_ref, avt_ref,
                doutt_ref,
                dxt_ref, dlnt_ref, dwuvqk_ref, dbuvqkt_ref, dwo_ref, dbot_ref,
                dw13_ref, dw2_ref, dtilest_ref,
                dkt_acc, dvt_acc, *,
                seq_len, n_tiles, num_heads, n_blocks, scale, rate, train):
    f32 = jnp.float32
    b = pl.program_id(0)
    xt16 = xt_ref[0]
    cdt = xt16.dtype
    xf = xt16.astype(f32)
    D = xf.shape[0]
    kvn = jnp.where(valid_ref[0] != 0, 0.0, MASK_NEG)     # [L, 1] f32
    doutt = doutt_ref[0].astype(f32)                  # [D, L]
    drop = train and rate > 0.0

    @pl.when(b == 0)
    def _():
        dlnt_ref[...] = jnp.zeros_like(dlnt_ref)
        dwuvqk_ref[...] = jnp.zeros_like(dwuvqk_ref)
        dbuvqkt_ref[...] = jnp.zeros_like(dbuvqkt_ref)
        dwo_ref[...] = jnp.zeros_like(dwo_ref)
        dbot_ref[...] = jnp.zeros_like(dbot_ref)
        dw13_ref[...] = jnp.zeros_like(dw13_ref)
        dw2_ref[...] = jnp.zeros_like(dw2_ref)
        dtilest_ref[...] = jnp.zeros_like(dtilest_ref)

    # ---- recompute forward intermediates (av is loaded, not recomputed) ---
    h1, xhat1, rstd1 = _ln_fwd_t(xf, lnt_ref[:, 0:1], lnt_ref[:, 1:2])
    h1t_16 = h1.astype(cdt)
    uvqk_pre = _dot(wuvqk_ref[...], h1t_16, ((0,), (0,))) + buvqkt_ref[:, 0:1]
    uvqkt = jax.nn.silu(uvqk_pre)
    ut = uvqkt[:D]
    vt = (uvqkt[D:2 * D] * (1.0 / seq_len)).astype(cdt)
    qt = (uvqkt[2 * D:3 * D] * scale).astype(cdt)
    kt = uvqkt[3 * D:].astype(cdt)
    avt = avt_ref[0].astype(f32)
    av_ln, xhat2, rstd2 = _ln_fwd_t(avt, lnt_ref[:, 2:3], lnt_ref[:, 3:4])
    g = av_ln * ut
    keep1 = keep2 = None
    if drop:
        pltpu.prng_seed(seed_ref[0], 2 * b)
        keep1 = _keep_mask(g.shape, rate)
        g = g * keep1
    gt16 = g.astype(cdt)
    yt = xf + _dot(wo_ref[...], gt16, ((0,), (0,))) + bot_ref[:, 0:1]
    h2, xhat3, rstd3 = _ln_fwd_t(yt, lnt_ref[:, 4:5], lnt_ref[:, 5:6])
    h2t_16 = h2.astype(cdt)
    x13t = _dot(w13_ref[...], h2t_16, ((0,), (0,)))
    F = x13t.shape[0] // 2
    x1, x3 = x13t[:F], x13t[F:]
    silu_x1 = jax.nn.silu(x1)
    f = silu_x1 * x3
    if drop:
        pltpu.prng_seed(seed_ref[0], 2 * b + 1)
        keep2 = _keep_mask(f.shape, rate)
        f = f * keep2
    ft16 = f.astype(cdt)

    # ---- gradients ----
    doutt16 = doutt.astype(cdt)
    # out = y + W2^T f   (transposed view of out = y + f @ W2)
    dw2_ref[...] += _dot(ft16, doutt16, ((1,), (1,)))            # [F, D]
    dft = _dot(w2_ref[...], doutt16, ((1,), (0,)))               # [F, L]
    if drop:
        dft = dft * keep2
    dx1 = dft * x3 * _dsilu(x1)
    dx3 = dft * silu_x1
    dx13t = jnp.concatenate([dx1, dx3], axis=0).astype(cdt)      # [2F, L]
    dw13_ref[...] += _dot(h2t_16, dx13t, ((1,), (1,)))           # [D, 2F]
    dh2t = _dot(w13_ref[...], dx13t, ((1,), (0,)))               # [D, L]
    dy_ln, dg_c, db_c = _ln_bwd_t(dh2t, xhat3, rstd3, lnt_ref[:, 4:5])
    dlnt_ref[:, 4:5] += dg_c
    dlnt_ref[:, 5:6] += db_c
    dyt = doutt + dy_ln

    # y = xf + Wo^T g + bo
    dyt16 = dyt.astype(cdt)
    dwo_ref[...] += _dot(gt16, dyt16, ((1,), (1,)))              # [D, D]
    dbot_ref[:, 0:1] += jnp.sum(dyt, axis=1, keepdims=True)
    dgt = _dot(wo_ref[...], dyt16, ((1,), (0,)))                 # [D, L]
    if drop:
        dgt = dgt * keep1
    dut = dgt * av_ln
    dav_ln = dgt * ut
    davt, dg_c, db_c = _ln_bwd_t(dav_ln, xhat2, rstd2, lnt_ref[:, 2:3])
    dlnt_ref[:, 2:3] += dg_c
    dlnt_ref[:, 3:4] += db_c

    dqt = _attn_bwd_stripes_t(qt, kt, vt, davt, kvn, tilest_ref, dtilest_ref,
                              dkt_acc, dvt_acc, n_tiles=n_tiles,
                              num_heads=num_heads, n_blocks=n_blocks,
                              scale=scale)
    # dvt_acc holds the gradient w.r.t. the 1/seq_len-scaled v
    duvqkt = jnp.concatenate(
        [dut, dvt_acc[...] * (1.0 / seq_len), dqt, dkt_acc[...]],
        axis=0) * _dsilu(uvqk_pre)
    duvqkt16 = duvqkt.astype(cdt)
    dwuvqk_ref[...] += _dot(h1t_16, duvqkt16, ((1,), (1,)))      # [D, 4D]
    dbuvqkt_ref[:, 0:1] += jnp.sum(duvqkt, axis=1, keepdims=True)
    dh1t = _dot(wuvqk_ref[...], duvqkt16, ((1,), (0,)))          # [D, L]
    dx_ln, dg_c, db_c = _ln_bwd_t(dh1t, xhat1, rstd1, lnt_ref[:, 0:1])
    dlnt_ref[:, 0:1] += dg_c
    dlnt_ref[:, 1:2] += db_c
    dxt_ref[0] = (dyt + dx_ln).astype(dxt_ref.dtype)


# ---------------------------------------------------------------------------
# chunked kernels (L > FB_WHOLESEQ_MAX): same operands/outputs as the
# whole-seq kernels, VMEM bounded ~flat in L (see the module docstring of
# the FB_CHUNK constants)
# ---------------------------------------------------------------------------

def _proj_chunk(xt_ref, csl, lnt_ref, wuvqk_ref, buvqkt_ref, cdt):
    """LN1 + uvqk projection + silu for one L-chunk (every caller — forward
    pre stage and the backward's recompute — needs the full uvqk).
    Returns (uvqk_f32, h1, xhat1, rstd1)."""
    f32 = jnp.float32
    xf = xt_ref[0, :, csl].astype(f32)
    h1, xhat1, rstd1 = _ln_fwd_t(xf, lnt_ref[:, 0:1], lnt_ref[:, 1:2])
    uvqk = jax.nn.silu(
        _dot(wuvqk_ref[...], h1.astype(cdt), ((0,), (0,)))
        + buvqkt_ref[:, 0:1])
    return uvqk, h1, xhat1, rstd1


def _fwd_pre_kernel_chunk(seed_ref, xt_ref, lnt_ref, wuvqk_ref, buvqkt_ref,
                          qt_ref, kt_ref, vt_ref, ut_ref, *, seq_len, scale,
                          chunk):
    """Chunked forward stage 1, grid (B, n_chunks): LN1 + uvqk projection +
    silu for one L-chunk; q (pre-scaled), k, v (1/L-scaled) and the u gate
    staged to HBM for the attention and post stages."""
    cdt = xt_ref.dtype
    D = xt_ref.shape[1]
    uvqk, _, _, _ = _proj_chunk(xt_ref, slice(0, chunk), lnt_ref, wuvqk_ref,
                                buvqkt_ref, cdt)
    ut_ref[0] = uvqk[:D]
    vt_ref[0] = (uvqk[D:2 * D] * (1.0 / seq_len)).astype(cdt)
    qt_ref[0] = (uvqk[2 * D:3 * D] * scale).astype(cdt)
    kt_ref[0] = uvqk[3 * D:].astype(cdt)


def _fwd_attn_kernel_chunk(seed_ref, qt_ref, kt_ref, vt_ref, valid_ref,
                           tilest_ref, avt_ref, acc_ref, *, n_tiles,
                           num_heads, n_k_blocks):
    """Chunked forward stage 2, grid (B, n_qb, n_kb) — transposed analog of
    ops/hstu_attention._fwd_kernel_chunk: VMEM flat in L, above-diagonal
    tiles skipped via pl.when, rel-pos bias via a DYNAMIC tile slot
    (tilest_ref[h, slot] — static h reduces the ref to 3-D, whose leading
    dim supports dynamic indexing)."""
    qb = pl.program_id(1)
    kb = pl.program_id(2)

    @pl.when(kb == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    @pl.when(kb <= qb)
    def _():
        cdt = qt_ref.dtype
        D = qt_ref.shape[1]
        hd = D // num_heads
        kvn = _kvn_col(valid_ref)
        slot = jnp.clip(qb - kb, 0, n_tiles - 1)
        for h in range(num_heads):
            sl = slice(h * hd, (h + 1) * hd)
            st = _dot(kt_ref[0, sl], qt_ref[0, sl], ((0,), (0,)))
            st = st + (tilest_ref[h, slot] + kvn)
            at = jax.nn.silu(st).astype(cdt)
            acc_ref[sl] += _dot(vt_ref[0, sl], at, ((1,), (0,)))

    @pl.when(kb == n_k_blocks - 1)
    def _():
        avt_ref[0] = acc_ref[...].astype(avt_ref.dtype)


def _fwd_post_kernel_chunk(seed_ref, xt_ref, avt_ref, ut_ref, lnt_ref,
                           wo_ref, bot_ref, w13_ref, w2_ref, outt_ref, *,
                           rate, train, chunk, n_chunks):
    """Chunked forward stage 3, grid (B, n_chunks): LN2 gate + out-proj +
    residual + LN3 + SwiGLU FFN + residual for one L-chunk. Dropout masks
    come from the in-kernel PRNG seeded per (batch row, site, chunk) — the
    backward gate stage reseeds identically."""
    f32 = jnp.float32
    b = pl.program_id(0)
    c = pl.program_id(1)
    cdt = xt_ref.dtype
    drop = train and rate > 0.0
    av = avt_ref[0].astype(f32)
    g, _, _ = _ln_fwd_t(av, lnt_ref[:, 2:3], lnt_ref[:, 3:4])
    g = g * ut_ref[0]
    if drop:
        pltpu.prng_seed(seed_ref[0], 2 * b * n_chunks + c)
        g = g * _keep_mask(g.shape, rate)
    yt = xt_ref[0].astype(f32) + _dot(wo_ref[...], g.astype(cdt),
                                      ((0,), (0,))) + bot_ref[:, 0:1]
    h2, _, _ = _ln_fwd_t(yt, lnt_ref[:, 4:5], lnt_ref[:, 5:6])
    x13 = _dot(w13_ref[...], h2.astype(cdt), ((0,), (0,)))
    F = x13.shape[0] // 2
    f = jax.nn.silu(x13[:F]) * x13[F:]
    if drop:
        pltpu.prng_seed(seed_ref[0], (2 * b + 1) * n_chunks + c)
        f = f * _keep_mask(f.shape, rate)
    outt_ref[0] = (yt + _dot(w2_ref[...], f.astype(cdt),
                             ((0,), (0,)))).astype(outt_ref.dtype)


def _bwd_dq_kernel_chunk(seed_ref, qt_ref, kt_ref, vt_ref, davt_ref,
                         valid_ref, tilest_ref, dqt_ref, dtilest_ref,
                         dq_acc, *, n_tiles, num_heads, n_k_blocks, scale):
    """Chunked attention backward, q-major pass (grid (B, n_qb, n_kb)):
    dq^T per q block + TRANSPOSED bias-tile grads, S recomputed per tile
    (the standard flash-bwd decomposition, transposed)."""
    b = pl.program_id(0)
    qb = pl.program_id(1)
    kb = pl.program_id(2)

    @pl.when(jnp.logical_and(b == 0, jnp.logical_and(qb == 0, kb == 0)))
    def _():
        dtilest_ref[...] = jnp.zeros_like(dtilest_ref)

    @pl.when(kb == 0)
    def _():
        dq_acc[...] = jnp.zeros_like(dq_acc)

    @pl.when(kb <= qb)
    def _():
        cdt = qt_ref.dtype
        D = qt_ref.shape[1]
        hd = D // num_heads
        kvn = _kvn_col(valid_ref)
        slot = jnp.clip(qb - kb, 0, n_tiles - 1)
        for h in range(num_heads):
            sl = slice(h * hd, (h + 1) * hd)
            st = _dot(kt_ref[0, sl], qt_ref[0, sl], ((0,), (0,))) \
                + (tilest_ref[h, slot] + kvn)
            dot_b = davt_ref[0, sl].astype(cdt)           # [hd, blk_q]
            dat = _dot(vt_ref[0, sl], dot_b, ((0,), (0,)))
            dst = dat * _dsilu(st)                        # [blk_k, blk_q]
            dq_acc[sl] += _dot(kt_ref[0, sl], dst.astype(cdt), ((1,), (0,)))
            dtilest_ref[h, slot] += dst

    @pl.when(kb == n_k_blocks - 1)
    def _():
        dqt_ref[0] = (dq_acc[...] * scale).astype(dqt_ref.dtype)


def _bwd_dkdv_kernel_chunk(seed_ref, qt_ref, kt_ref, vt_ref, davt_ref,
                           valid_ref, tilest_ref, dkt_ref, dvt_ref,
                           dk_acc, dv_acc, *, n_tiles, num_heads,
                           n_q_blocks):
    """Chunked attention backward, k-major pass (grid (B, n_kb, n_qb)):
    dk^T/dv^T per k block."""
    kb = pl.program_id(1)
    qb = pl.program_id(2)

    @pl.when(qb == 0)
    def _():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    @pl.when(qb >= kb)
    def _():
        cdt = qt_ref.dtype
        D = qt_ref.shape[1]
        hd = D // num_heads
        kvn = _kvn_col(valid_ref)
        slot = jnp.clip(qb - kb, 0, n_tiles - 1)
        for h in range(num_heads):
            sl = slice(h * hd, (h + 1) * hd)
            st = _dot(kt_ref[0, sl], qt_ref[0, sl], ((0,), (0,))) \
                + (tilest_ref[h, slot] + kvn)
            dot_b = davt_ref[0, sl].astype(cdt)           # [hd, blk_q]
            at = jax.nn.silu(st).astype(cdt)
            dv_acc[sl] += _dot(dot_b, at, ((1,), (1,)))   # [hd, blk_k]
            dat = _dot(vt_ref[0, sl], dot_b, ((0,), (0,)))
            dst = (dat * _dsilu(st)).astype(cdt)
            dk_acc[sl] += _dot(qt_ref[0, sl], dst, ((1,), (1,)))

    @pl.when(qb == n_q_blocks - 1)
    def _():
        dkt_ref[0] = dk_acc[...].astype(dkt_ref.dtype)
        dvt_ref[0] = dv_acc[...].astype(dvt_ref.dtype)



def _bwd_gate_kernel_chunk(seed_ref, xt_ref, avt_ref, doutt_ref, lnt_ref,
                           wuvqk_ref, buvqkt_ref, wo_ref, bot_ref, w13_ref,
                           w2_ref,
                           qt_ref, kt_ref, vt_ref, davt_ref, dyt_ref,
                           dut_ref, dlnt25_ref, dwo_ref, dbot_ref, dw13_ref,
                           dw2_ref, *,
                           seq_len, num_heads, scale, rate, train, chunk,
                           n_chunks):
    """Backward stage 1, grid (B, n_chunks) — ONE chunk per grid step so the
    Mosaic stack never holds more than one chunk\'s transients (the single
    whole-row kernel needed 21-22 MB scoped VMEM at L=2048 regardless of
    chunk size — probed on v5e 2026-08-20 — so the chunk loop must be a
    GRID dim, not an unrolled python loop).

    Recomputes the projection for its chunk (q/k/v staged to HBM for stage
    2), then runs the gate + out-proj + FFN forward recompute and their
    backward: emits dyt (residual grad into stage 3), dut (u-gate grad),
    davt (attention-output grad into stage 2), and accumulates the
    gate/FFN-side weight grads (wo, bo, w13, w2, LN2/LN3 — ``dlnt25``)."""
    f32 = jnp.float32
    b = pl.program_id(0)
    c = pl.program_id(1)
    cdt = xt_ref.dtype
    D = xt_ref.shape[1]
    drop = train and rate > 0.0
    nc = n_chunks

    @pl.when(jnp.logical_and(b == 0, c == 0))
    def _():
        dlnt25_ref[...] = jnp.zeros_like(dlnt25_ref)
        dwo_ref[...] = jnp.zeros_like(dwo_ref)
        dbot_ref[...] = jnp.zeros_like(dbot_ref)
        dw13_ref[...] = jnp.zeros_like(dw13_ref)
        dw2_ref[...] = jnp.zeros_like(dw2_ref)

    csl = slice(0, chunk)
    uvqk, _, _, _ = _proj_chunk(xt_ref, csl, lnt_ref, wuvqk_ref,
                                buvqkt_ref, cdt)
    u = uvqk[:D]
    qt_ref[0] = (uvqk[2 * D:3 * D] * scale).astype(cdt)
    kt_ref[0] = uvqk[3 * D:].astype(cdt)
    vt_ref[0] = (uvqk[D:2 * D] * (1.0 / seq_len)).astype(cdt)

    av = avt_ref[0].astype(f32)
    av_ln, xhat2, rstd2 = _ln_fwd_t(av, lnt_ref[:, 2:3], lnt_ref[:, 3:4])
    g = av_ln * u
    keep1 = keep2 = None
    if drop:
        pltpu.prng_seed(seed_ref[0], 2 * b * nc + c)
        keep1 = _keep_mask(g.shape, rate)
        g = g * keep1
    gt16 = g.astype(cdt)
    yt = xt_ref[0].astype(f32) + _dot(wo_ref[...], gt16, ((0,), (0,))) \
        + bot_ref[:, 0:1]
    h2, xhat3, rstd3 = _ln_fwd_t(yt, lnt_ref[:, 4:5], lnt_ref[:, 5:6])
    h2t_16 = h2.astype(cdt)
    x13 = _dot(w13_ref[...], h2t_16, ((0,), (0,)))
    F = x13.shape[0] // 2
    x1, x3 = x13[:F], x13[F:]
    silu_x1 = jax.nn.silu(x1)
    f = silu_x1 * x3
    if drop:
        pltpu.prng_seed(seed_ref[0], (2 * b + 1) * nc + c)
        keep2 = _keep_mask(f.shape, rate)
        f = f * keep2
    ft16 = f.astype(cdt)

    doutt = doutt_ref[0].astype(f32)
    doutt16 = doutt.astype(cdt)
    dw2_ref[...] += _dot(ft16, doutt16, ((1,), (1,)))
    dft = _dot(w2_ref[...], doutt16, ((1,), (0,)))
    if drop:
        dft = dft * keep2
    dx1 = dft * x3 * _dsilu(x1)
    dx3 = dft * silu_x1
    dx13 = jnp.concatenate([dx1, dx3], axis=0).astype(cdt)
    dw13_ref[...] += _dot(h2t_16, dx13, ((1,), (1,)))
    dh2t = _dot(w13_ref[...], dx13, ((1,), (0,)))
    dy_ln, dg_c, db_c = _ln_bwd_t(dh2t, xhat3, rstd3, lnt_ref[:, 4:5])
    dlnt25_ref[:, 2:3] += dg_c
    dlnt25_ref[:, 3:4] += db_c
    dyt = doutt + dy_ln
    dyt_ref[0] = dyt

    dyt16 = dyt.astype(cdt)
    dwo_ref[...] += _dot(gt16, dyt16, ((1,), (1,)))
    dbot_ref[:, 0:1] += jnp.sum(dyt, axis=1, keepdims=True)
    dgt = _dot(wo_ref[...], dyt16, ((1,), (0,)))
    if drop:
        dgt = dgt * keep1
    dut_ref[0] = dgt * av_ln
    dav_ln = dgt * u
    davt, dg_c, db_c = _ln_bwd_t(dav_ln, xhat2, rstd2, lnt_ref[:, 2:3])
    dlnt25_ref[:, 0:1] += dg_c
    dlnt25_ref[:, 1:2] += db_c
    davt_ref[0] = davt


def _bwd_proj_kernel_chunk(seed_ref, xt_ref, dyt_ref, dut_ref, dqt_ref,
                           dkt_ref, dvt_ref, lnt_ref, wuvqk_ref, buvqkt_ref,
                           dxt_ref, dlnt01_ref, dwuvqk_ref, dbuvqkt_ref, *,
                           seq_len, chunk):
    """Backward stage 3, grid (B, n_chunks): chain the parked dq/dk/dv/du
    through silu(uvqk) and LN1, accumulate dwuvqk/dbuvqk/LN1 grads, emit
    dx = dyt (residual) + LN1 backward."""
    f32 = jnp.float32
    b = pl.program_id(0)
    c = pl.program_id(1)
    cdt = xt_ref.dtype

    @pl.when(jnp.logical_and(b == 0, c == 0))
    def _():
        dlnt01_ref[...] = jnp.zeros_like(dlnt01_ref)
        dwuvqk_ref[...] = jnp.zeros_like(dwuvqk_ref)
        dbuvqkt_ref[...] = jnp.zeros_like(dbuvqkt_ref)

    xf = xt_ref[0].astype(f32)
    h1, xhat1, rstd1 = _ln_fwd_t(xf, lnt_ref[:, 0:1], lnt_ref[:, 1:2])
    h1t_16 = h1.astype(cdt)
    uvqk_pre = _dot(wuvqk_ref[...], h1t_16, ((0,), (0,))) + buvqkt_ref[:, 0:1]
    duvqk = jnp.concatenate(
        [dut_ref[0], dvt_ref[0] * (1.0 / seq_len), dqt_ref[0], dkt_ref[0]],
        axis=0) * _dsilu(uvqk_pre)
    duvqk16 = duvqk.astype(cdt)
    dwuvqk_ref[...] += _dot(h1t_16, duvqk16, ((1,), (1,)))
    dbuvqkt_ref[:, 0:1] += jnp.sum(duvqk, axis=1, keepdims=True)
    dh1t = _dot(wuvqk_ref[...], duvqk16, ((1,), (0,)))
    dx_ln, dg_c, db_c = _ln_bwd_t(dh1t, xhat1, rstd1, lnt_ref[:, 0:1])
    dlnt01_ref[:, 0:1] += dg_c
    dlnt01_ref[:, 1:2] += db_c
    dxt_ref[0] = (dyt_ref[0] + dx_ln).astype(dxt_ref.dtype)


# ---------------------------------------------------------------------------
# pallas_call plumbing + custom VJP
# ---------------------------------------------------------------------------

def _full(shape):
    # index maps under PrefetchScalarGridSpec receive (grid idx, scalar ref)
    return pl.BlockSpec(shape, lambda b, s: tuple(0 for _ in shape))


def _batch(shape):
    return pl.BlockSpec(shape, lambda b, s: (b, 0, 0))


def _specs(L, D, F, H, nt):
    """Input specs shared by both kernels (x/valid are per-batch blocks,
    weights are whole-array blocks revisited every grid step)."""
    return [
        _batch((1, D, L)),                                       # x^T
        _batch((1, L, 1)),                                       # valid col
        _full((D, 6)),                                           # ln pack^T
        _full((D, 4 * D)),                                       # wuvqk
        _full((4 * D, 1)),                                       # buvqk^T
        _full((D, D)),                                           # wo
        _full((D, 1)),                                           # bo^T
        _full((D, 2 * F)),                                       # w13
        _full((F, D)),                                           # w2
        _full((H, nt, FB_BLK, FB_BLK)),                          # bias tiles^T
    ]


@functools.partial(jax.custom_vjp, nondiff_argnums=(11, 12, 13, 14))
def _fused_block_core(xt, valid3, rab, lnt, wuvqk, buvqkt, wo, bot, w13, w2,
                      seed1, num_heads, rate, train, interpret):
    out, _ = _fused_fwd_call(xt, valid3, rab, lnt, wuvqk, buvqkt, wo, bot,
                             w13, w2, seed1, num_heads, rate, train,
                             interpret)
    return out


def _tiles_t(rab, blk: int = FB_BLK):
    """Pre-transposed bias tiles ([k, q]-indexed per tile) for the
    transposed stripe loops. Tiny differentiable XLA precompute."""
    return _bias_tiles(rab, blk, causal_diag=True).transpose(0, 1, 3, 2)


def _attn_blk(L: int, bwd: bool = False, D: int = 64) -> int:
    """Attention tile width for the chunked (gridded) kernels. Directions
    tune independently (each builds its own bias tiles): A/B on v5e at
    B=128/L=2048 measured fwd 7.2 ms @256 vs 8.2 @512 (the [blk, blk] silu
    pass dominates fwd and 512 spills), but bwd 8.2 ms @512 vs 13.3 @256
    (two recompute passes amortize the per-step overhead better at 512).
    Falls back toward FB_BLK when the preferred width doesn't divide L.

    Width is also D-capped: the stage transients scale ~D*blk, and the
    backward at D=128 with the 512 tile needs 16.56 MB scoped VMEM against
    the 16 MB Mosaic limit (probed on v5e 2026-08-20) — so widths keep
    D*blk <= 64*512, i.e. the probed D=64 budget."""
    cands = (FB_ATTN_BLK_BWD, FB_ATTN_BLK, FB_BLK) if bwd \
        else (FB_ATTN_BLK, FB_BLK)
    for blk in cands:
        if L % blk == 0 and D * blk <= 64 * FB_ATTN_BLK_BWD:
            return blk
    return FB_BLK


def _cblk(D, CH):
    """[1, D, CH] L-chunk block on a (B, n_chunks) grid."""
    return pl.BlockSpec((1, D, CH), lambda b, c, s: (b, 0, c))


def _cfull(shape):
    """Whole-array block revisited on a (B, n_chunks) grid."""
    return pl.BlockSpec(shape, lambda b, c, s: tuple(0 for _ in shape))


def _fused_fwd_call(xt, valid3, rab, lnt, wuvqk, buvqkt, wo, bot, w13, w2,
                    seed1, num_heads, rate, train, interpret):
    B, D, L = xt.shape
    F = w2.shape[0]
    hd = D // num_heads
    if L > wholeseq_max_l(D):
        return _fwd_call_chunk(xt, valid3, rab, lnt, wuvqk, buvqkt, wo, bot,
                               w13, w2, seed1, num_heads, rate, train,
                               interpret)
    tilest = _tiles_t(rab)
    H, nt = tilest.shape[0], tilest.shape[1]
    kw = dict(seq_len=L, n_tiles=nt, num_heads=num_heads,
              n_blocks=L // FB_BLK, scale=hd ** -0.5, rate=rate, train=train)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(B,),
        in_specs=_specs(L, D, F, H, nt),
        out_specs=[_batch((1, D, L)), _batch((1, D, L))],
        scratch_shapes=[pltpu.VMEM((D, L), jnp.float32)],
    )
    out, avt = pl.pallas_call(
        functools.partial(_fwd_kernel, **kw),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((B, D, L), xt.dtype),
                   jax.ShapeDtypeStruct((B, D, L), xt.dtype)],
        interpret=interpret,
    )(seed1, xt, valid3, lnt, wuvqk, buvqkt, wo, bot, w13, w2, tilest)
    return out, avt


def _fwd_call_chunk(xt, valid3, rab, lnt, wuvqk, buvqkt, wo, bot, w13, w2,
                    seed1, num_heads, rate, train, interpret):
    """Three-stage chunked forward (see the FB_CHUNK comment)."""
    B, D, L = xt.shape
    F = w2.shape[0]
    hd = D // num_heads
    cdt = xt.dtype
    f32 = jnp.float32
    CH = _chunk_of(L, D)
    nc = L // CH
    blk = _attn_blk(L, D=D)
    nqb = L // blk
    tilest = _tiles_t(rab, blk)
    H, nt = tilest.shape[0], tilest.shape[1]

    gs_pre = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(B, nc),
        in_specs=[_cblk(D, CH), _cfull((D, 6)), _cfull((D, 4 * D)),
                  _cfull((4 * D, 1))],
        out_specs=[_cblk(D, CH)] * 4,
    )
    qt, kt, vt, ut = pl.pallas_call(
        functools.partial(_fwd_pre_kernel_chunk, seq_len=L,
                          scale=hd ** -0.5, chunk=CH),
        grid_spec=gs_pre,
        out_shape=[jax.ShapeDtypeStruct((B, D, L), cdt)] * 3
        + [jax.ShapeDtypeStruct((B, D, L), f32)],
        interpret=interpret,
    )(seed1, xt, lnt, wuvqk, buvqkt)

    gs_attn = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(B, nqb, nqb),
        in_specs=[
            pl.BlockSpec((1, D, blk), lambda b, qb, kb, s: (b, 0, qb)),  # q
            pl.BlockSpec((1, D, blk), lambda b, qb, kb, s: (b, 0, kb)),  # k
            pl.BlockSpec((1, D, blk), lambda b, qb, kb, s: (b, 0, kb)),  # v
            pl.BlockSpec((1, blk, 1), lambda b, qb, kb, s: (b, kb, 0)),
            pl.BlockSpec((H, nt, blk, blk),
                         lambda b, qb, kb, s: (0, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, D, blk),
                               lambda b, qb, kb, s: (b, 0, qb)),
        scratch_shapes=[pltpu.VMEM((D, blk), f32)],
    )
    avt = pl.pallas_call(
        functools.partial(_fwd_attn_kernel_chunk, n_tiles=nt,
                          num_heads=num_heads, n_k_blocks=nqb),
        grid_spec=gs_attn,
        out_shape=jax.ShapeDtypeStruct((B, D, L), cdt),
        interpret=interpret,
    )(seed1, qt, kt, vt, valid3, tilest)

    gs_post = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(B, nc),
        in_specs=[_cblk(D, CH), _cblk(D, CH), _cblk(D, CH),
                  _cfull((D, 6)), _cfull((D, D)), _cfull((D, 1)),
                  _cfull((D, 2 * F)), _cfull((F, D))],
        out_specs=_cblk(D, CH),
    )
    out = pl.pallas_call(
        functools.partial(_fwd_post_kernel_chunk, rate=rate, train=train,
                          chunk=CH, n_chunks=nc),
        grid_spec=gs_post,
        out_shape=jax.ShapeDtypeStruct((B, D, L), cdt),
        interpret=interpret,
    )(seed1, xt, avt, ut, lnt, wo, bot, w13, w2)
    return out, avt


def _core_fwd(xt, valid3, rab, lnt, wuvqk, buvqkt, wo, bot, w13, w2,
              seed1, num_heads, rate, train, interpret):
    out, avt = _fused_fwd_call(xt, valid3, rab, lnt, wuvqk, buvqkt, wo, bot,
                               w13, w2, seed1, num_heads, rate, train,
                               interpret)
    return out, (xt, valid3, rab, lnt, wuvqk, buvqkt, wo, bot, w13, w2,
                 seed1, avt)


def _bwd_call_chunk(xt, valid3, lnt, wuvqk, buvqkt, wo, bot, w13, w2,
                    seed1, avt, dout, tilest, num_heads, rate, train,
                    interpret):
    """Three-stage chunked backward (L > FB_WHOLESEQ_MAX): gate/FFN per
    (batch, chunk) grid step, attention stripes per batch row, projection/
    LN1 per (batch, chunk). q/k/v and the stage-boundary grads ride HBM
    ([B, D, L] staging arrays, ~0.5 GB at B=128/L=2048 — freed after use);
    the payoff is a provably chunk-sized Mosaic stack per kernel."""
    B, D, L = xt.shape
    F = w2.shape[0]
    H, nt = tilest.shape[0], tilest.shape[1]
    hd = D // num_heads
    CH = _chunk_of(L, D)
    nc = L // CH
    f32 = jnp.float32
    cdt = xt.dtype

    def cblk():
        return pl.BlockSpec((1, D, CH), lambda b, c, s: (b, 0, c))

    def full2(shape):
        return pl.BlockSpec(shape, lambda b, c, s: tuple(0 for _ in shape))

    gs1 = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(B, nc),
        in_specs=[cblk(), cblk(), cblk(),            # x, av, dout
                  full2((D, 6)), full2((D, 4 * D)), full2((4 * D, 1)),
                  full2((D, D)), full2((D, 1)), full2((D, 2 * F)),
                  full2((F, D))],
        out_specs=[cblk()] * 6 + [full2((D, 4)), full2((D, D)),
                                  full2((D, 1)), full2((D, 2 * F)),
                                  full2((F, D))],
    )
    outs1 = pl.pallas_call(
        functools.partial(_bwd_gate_kernel_chunk, seq_len=L,
                          num_heads=num_heads, scale=hd ** -0.5, rate=rate,
                          train=train, chunk=CH, n_chunks=nc),
        grid_spec=gs1,
        out_shape=[
            jax.ShapeDtypeStruct((B, D, L), cdt),    # q^T (scaled)
            jax.ShapeDtypeStruct((B, D, L), cdt),    # k^T
            jax.ShapeDtypeStruct((B, D, L), cdt),    # v^T (1/L-scaled)
            jax.ShapeDtypeStruct((B, D, L), f32),    # dav^T
            jax.ShapeDtypeStruct((B, D, L), f32),    # dy^T
            jax.ShapeDtypeStruct((B, D, L), f32),    # du^T
            jax.ShapeDtypeStruct((D, 4), f32),       # dlnt cols 2..5
            jax.ShapeDtypeStruct((D, D), f32),       # dwo
            jax.ShapeDtypeStruct((D, 1), f32),       # dbo^T
            jax.ShapeDtypeStruct((D, 2 * F), f32),   # dw13
            jax.ShapeDtypeStruct((F, D), f32),       # dw2
        ],
        interpret=interpret,
    )(seed1, xt, avt, dout, lnt, wuvqk, buvqkt, wo, bot, w13, w2)
    qt, kt, vt, davt, dyt, dut, dlnt25, dwo, dbot, dw13, dw2 = outs1

    blk = tilest.shape[-1]
    nqb = L // blk

    def qmaj(which):
        return pl.BlockSpec((1, D, blk),
                            (lambda b, qb, kb, s: (b, 0, qb)) if which == "q"
                            else (lambda b, qb, kb, s: (b, 0, kb)))

    gs_dq = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(B, nqb, nqb),
        in_specs=[qmaj("q"), qmaj("k"), qmaj("k"), qmaj("q"),  # q k v dav
                  pl.BlockSpec((1, blk, 1), lambda b, qb, kb, s: (b, kb, 0)),
                  pl.BlockSpec((H, nt, blk, blk),
                               lambda b, qb, kb, s: (0, 0, 0, 0))],
        out_specs=[qmaj("q"),
                   pl.BlockSpec((H, nt, blk, blk),
                                lambda b, qb, kb, s: (0, 0, 0, 0))],
        scratch_shapes=[pltpu.VMEM((D, blk), f32)],
    )
    dqt, dtilest = pl.pallas_call(
        functools.partial(_bwd_dq_kernel_chunk, n_tiles=nt,
                          num_heads=num_heads, n_k_blocks=nqb,
                          scale=hd ** -0.5),
        grid_spec=gs_dq,
        out_shape=[jax.ShapeDtypeStruct((B, D, L), f32),
                   jax.ShapeDtypeStruct((H, nt, blk, blk), f32)],
        interpret=interpret,
    )(seed1, qt, kt, vt, davt, valid3, tilest)

    def kmaj(which):
        return pl.BlockSpec((1, D, blk),
                            (lambda b, kb, qb, s: (b, 0, qb)) if which == "q"
                            else (lambda b, kb, qb, s: (b, 0, kb)))

    gs_dkdv = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(B, nqb, nqb),
        in_specs=[kmaj("q"), kmaj("k"), kmaj("k"), kmaj("q"),  # q k v dav
                  pl.BlockSpec((1, blk, 1), lambda b, kb, qb, s: (b, kb, 0)),
                  pl.BlockSpec((H, nt, blk, blk),
                               lambda b, kb, qb, s: (0, 0, 0, 0))],
        out_specs=[kmaj("k"), kmaj("k")],
        scratch_shapes=[pltpu.VMEM((D, blk), f32),
                        pltpu.VMEM((D, blk), f32)],
    )
    dkt, dvt = pl.pallas_call(
        functools.partial(_bwd_dkdv_kernel_chunk, n_tiles=nt,
                          num_heads=num_heads, n_q_blocks=nqb),
        grid_spec=gs_dkdv,
        out_shape=[jax.ShapeDtypeStruct((B, D, L), f32),
                   jax.ShapeDtypeStruct((B, D, L), f32)],
        interpret=interpret,
    )(seed1, qt, kt, vt, davt, valid3, tilest)

    gs3 = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(B, nc),
        in_specs=[cblk()] * 6 + [full2((D, 6)), full2((D, 4 * D)),
                                 full2((4 * D, 1))],
        out_specs=[cblk(), full2((D, 2)), full2((D, 4 * D)),
                   full2((4 * D, 1))],
    )
    outs3 = pl.pallas_call(
        functools.partial(_bwd_proj_kernel_chunk, seq_len=L, chunk=CH),
        grid_spec=gs3,
        out_shape=[jax.ShapeDtypeStruct((B, D, L), cdt),
                   jax.ShapeDtypeStruct((D, 2), f32),
                   jax.ShapeDtypeStruct((D, 4 * D), f32),
                   jax.ShapeDtypeStruct((4 * D, 1), f32)],
        interpret=interpret,
    )(seed1, xt, dyt, dut, dqt, dkt, dvt, lnt, wuvqk, buvqkt)
    dxt, dlnt01, dwuvqk, dbuvqkt = outs3
    dlnt = jnp.concatenate([dlnt01, dlnt25], axis=1)
    return (dxt, dlnt, dwuvqk, dbuvqkt, dwo, dbot, dw13, dw2, dtilest)


def _core_bwd(num_heads, rate, train, interpret, res, dout):
    xt, valid3, rab, lnt, wuvqk, buvqkt, wo, bot, w13, w2, seed1, avt = res
    B, D, L = xt.shape
    F = w2.shape[0]
    hd = D // num_heads
    if L > wholeseq_max_l(D):
        tilest = _tiles_t(rab, _attn_blk(L, bwd=True, D=D))
        outs = _bwd_call_chunk(xt, valid3, lnt, wuvqk, buvqkt, wo, bot, w13,
                               w2, seed1, avt, dout, tilest, num_heads,
                               rate, train, interpret)
        dxt, dlnt, dwuvqk, dbuvqkt, dwo, dbot, dw13, dw2, dtilest = outs
        drab = _bias_tiles_transpose(dtilest.transpose(0, 1, 3, 2),
                                     rab.shape[1])
        return (dxt, None, drab, dlnt, dwuvqk, dbuvqkt, dwo, dbot, dw13,
                dw2, None)
    tilest = _tiles_t(rab)
    H, nt = tilest.shape[0], tilest.shape[1]
    in_specs = _specs(L, D, F, H, nt) + [
        _batch((1, D, L)),                                       # av^T
        _batch((1, D, L)),                                       # dout^T
    ]
    kw = dict(seq_len=L, n_tiles=nt, num_heads=num_heads,
              n_blocks=L // FB_BLK, scale=hd ** -0.5, rate=rate, train=train)
    kernel = functools.partial(_bwd_kernel, **kw)
    scratch = [pltpu.VMEM((D, L), jnp.float32),
               pltpu.VMEM((D, L), jnp.float32)]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(B,),
        in_specs=in_specs,
        out_specs=[
            _batch((1, D, L)),                                   # dx^T
            _full((D, 6)), _full((D, 4 * D)), _full((4 * D, 1)),
            _full((D, D)), _full((D, 1)), _full((D, 2 * F)),
            _full((F, D)), _full((H, nt, FB_BLK, FB_BLK)),
        ],
        scratch_shapes=scratch,
    )
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, D, L), xt.dtype),
            jax.ShapeDtypeStruct((D, 6), jnp.float32),
            jax.ShapeDtypeStruct((D, 4 * D), jnp.float32),
            jax.ShapeDtypeStruct((4 * D, 1), jnp.float32),
            jax.ShapeDtypeStruct((D, D), jnp.float32),
            jax.ShapeDtypeStruct((D, 1), jnp.float32),
            jax.ShapeDtypeStruct((D, 2 * F), jnp.float32),
            jax.ShapeDtypeStruct((F, D), jnp.float32),
            jax.ShapeDtypeStruct((H, nt, FB_BLK, FB_BLK), jnp.float32),
        ],
        interpret=interpret,
    )(seed1, xt, valid3, lnt, wuvqk, buvqkt, wo, bot, w13, w2, tilest,
      avt, dout)
    dxt, dlnt, dwuvqk, dbuvqkt, dwo, dbot, dw13, dw2, dtilest = outs
    # the kernel accumulated [k, q]-indexed tile grads; un-transpose (tiny)
    drab = _bias_tiles_transpose(dtilest.transpose(0, 1, 3, 2), rab.shape[1])
    return (dxt, None, drab, dlnt, dwuvqk, dbuvqkt, dwo, dbot, dw13, dw2,
            None)


_fused_block_core.defvjp(_core_fwd, _core_bwd)


def fused_block_supported(cfg, L: int, backend: str) -> bool:
    """Static gate for the fused whole-block kernel (mirrors the shape rules
    of models/encoder.make_attention_cores)."""
    from .hstu_attention import _n_near
    if not (getattr(cfg, "fused_block", False) and backend == "tpu"):
        return False
    if cfg.block_type != "hstu" or cfg.ffn_type != "swiglu":
        return False
    if cfg.hidden_units > MAX_FUSED_D:
        return False
    # L <= wholeseq_max_l(D) runs the whole-seq kernels; beyond that, the
    # chunked kernels (VMEM ~flat in L, D-scaled ceiling) up to the probed
    # MAX_CHUNKED_L
    if not (256 <= L and L % FB_BLK == 0):
        return False
    if L > wholeseq_max_l(cfg.hidden_units) and not (
            L <= MAX_CHUNKED_L
            and _chunk_of(L, cfg.hidden_units) is not None):
        return False
    if cfg.hidden_units % cfg.num_heads != 0:
        return False
    # transposed layout slices heads along sublanes — keep them tile-aligned
    if (cfg.hidden_units // cfg.num_heads) % 8 != 0:
        return False
    try:
        _n_near(cfg.hstu_rel_pos_buckets, BLK)
    except ValueError:
        return False
    return True


def _block_operands(bp, cdt):
    """Kernel-ready (transposed) parameter pack from the encoder's per-block
    param subtree."""
    f32 = jnp.float32
    lnt = jnp.stack([
        bp["attn_ln"]["scale"].astype(f32), bp["attn_ln"]["bias"].astype(f32),
        bp["hstu"]["attn_ln"]["scale"].astype(f32),
        bp["hstu"]["attn_ln"]["bias"].astype(f32),
        bp["ffn_ln"]["scale"].astype(f32), bp["ffn_ln"]["bias"].astype(f32),
    ], axis=1)                                                   # [D, 6]
    return (bp["hstu"]["rab"], lnt,
            bp["hstu"]["uvqk"]["w"].astype(cdt),
            bp["hstu"]["uvqk"]["b"].astype(f32)[:, None],        # [4D, 1]
            bp["hstu"]["out"]["w"].astype(cdt),
            bp["hstu"]["out"]["b"].astype(f32)[:, None],         # [D, 1]
            bp["ffn"]["w13"].astype(cdt), bp["ffn"]["w2"].astype(cdt))


def fused_hstu_block_t(xt, bp, token_type, seed, num_heads: int,
                       dropout_rate: float = 0.0, train: bool = False,
                       interpret: bool = False):
    """One full HSTU block (pre-norm, SwiGLU FFN), fused, on TRANSPOSED
    activations.

    ``xt`` [B, D, L] compute-dtype; ``bp`` is the encoder's per-block param
    subtree ({attn_ln, ffn_ln, ffn{w13,w2}, hstu{uvqk,out,attn_ln,rab}});
    ``token_type`` [B, L] (0 = padding key); ``seed`` int32 scalar/0-d array
    driving the in-kernel dropout PRNG. Returns xt + block(xt)^T — unlike
    models/hstu.hstu_block the kernel owns the residual wiring. The encoder
    transposes once OUTSIDE its scan over blocks, so block chains stay in
    [B, D, L] end to end."""
    rab, lnt, wuvqk, buvqkt, wo, bot, w13, w2 = _block_operands(bp, xt.dtype)
    valid3 = (token_type != 0).astype(jnp.int32)[:, :, None]     # [B, L, 1]
    seed1 = jnp.reshape(seed, (1,)).astype(jnp.int32)
    return _fused_block_core(
        xt, valid3, rab, lnt, wuvqk, buvqkt, wo, bot, w13, w2,
        seed1, num_heads, float(dropout_rate), bool(train), bool(interpret))


def fused_hstu_block(x, bp, token_type, seed, num_heads: int,
                     dropout_rate: float = 0.0, train: bool = False,
                     interpret: bool = False):
    """[B, L, D] convenience wrapper around :func:`fused_hstu_block_t`
    (oracle tests / single-block callers). Pays two XLA relayouts per call;
    the encoder's scan path uses the transposed API directly instead."""
    xt = jnp.swapaxes(x, 1, 2)
    outt = fused_hstu_block_t(xt, bp, token_type, seed, num_heads,
                              dropout_rate, train, interpret)
    return jnp.swapaxes(outt, 1, 2)


# ---------------------------------------------------------------------------
# ring-SP per-shard units (round 5, VERDICT r4 item 4)
#
# The seq>1 multi-chip path used to run UNFUSED per-shard blocks — exactly
# the long-context configs that need the fused kernels most trained at the
# ~4%-MFU unfused operating point. These units re-package the chunked stage
# kernels as three independently-differentiable pieces that
# parallel/ring_fused.py composes inside a shard_map over ("data", "seq"):
#
#   ring_pre_proj   — LN1 + uvqk projection + silu on the LOCAL [B, D, L/S]
#                     shard (fwd = _fwd_pre_kernel_chunk; bwd =
#                     _bwd_proj_kernel_chunk with a zero residual slot);
#   ring_pair_attn  — ONE (q-shard, kv-shard) attention pair with a runtime
#                     GLOBAL block offset (the kv shard rotates around the
#                     ring via ppermute; HSTU silu attention is additive, so
#                     per-pair partial sums are exact — no LSE state);
#   ring_post_gate  — LN2 gate + out-proj + residual + LN3 + SwiGLU FFN on
#                     the local shard (fwd = _fwd_post_kernel_chunk; bwd =
#                     _bwd_gate_kernel_chunk, whose projection recompute
#                     also re-derives u so the unit needs no saved u).
#
# The ring loop itself is plain JAX (ppermute differentiates to the inverse
# rotation), so jax.grad composes the three custom VJPs without a
# hand-written whole-ring backward. The global L keeps the HSTU 1/L scaling
# and the rel-pos tile slots exact: slot = (qb - kb) + off where
# off = (q_shard - kv_shard) * blocks_per_shard is a runtime scalar riding
# the kernels' scalar-prefetch operand next to the dropout seed.
# ---------------------------------------------------------------------------

def _chunk_of(Lc: int, D: int = 64):
    """Projection/FFN chunk width for a (shard-)length Lc at model width D.

    The chunk-stage transients scale ~D*CH ([4D, CH] / [2F, CH] f32):
    probed on v5e 2026-08-20, CH=512 fits D<=128 but at D=256 the backward
    gate/FFN stage needs 17.52 MB against the 16 MB Mosaic limit — so the
    width keeps D*CH <= 128*FB_CHUNK (the probed D=128 budget)."""
    for c in (FB_CHUNK, 256, 128):
        if Lc % c == 0 and D * c <= 128 * FB_CHUNK:
            return c
    return None


def ring_fused_supported(cfg, L: int, n_seq: int, backend: str) -> bool:
    """Gate for the per-shard fused path on a ``seq``-sharded mesh: the
    fused-block shape rules applied to the LOCAL shard length L / n_seq."""
    from .hstu_attention import _n_near
    if not (getattr(cfg, "fused_block", False) and backend == "tpu"):
        return False
    if cfg.block_type != "hstu" or cfg.ffn_type != "swiglu":
        return False
    if L % n_seq:
        return False
    if cfg.hidden_units > MAX_FUSED_D:
        return False
    Lc = L // n_seq
    if Lc < 256 or Lc % FB_BLK or _chunk_of(Lc, cfg.hidden_units) is None:
        return False
    if cfg.hidden_units % cfg.num_heads or \
            (cfg.hidden_units // cfg.num_heads) % 8:
        return False
    try:
        _n_near(cfg.hstu_rel_pos_buckets, _attn_blk(Lc, D=cfg.hidden_units))
    except ValueError:
        return False
    return True


def _pair_attn_fwd_kernel(s_ref, qt_ref, kt_ref, vt_ref, valid_ref,
                          tilest_ref, avt_ref, acc_ref, *, n_tiles,
                          num_heads, n_k_blocks):
    """One (q-shard, kv-shard) pair of _fwd_attn_kernel_chunk: the global
    block distance is d = qb - kb + off_tokens/blk (s_ref[1] carries the
    shard offset in TOKENS so forward and backward can tile at different
    widths; possibly negative — a future kv shard is fully masked and
    skipped)."""
    qb = pl.program_id(1)
    kb = pl.program_id(2)
    d = qb - kb + s_ref[1] // qt_ref.shape[2]

    @pl.when(kb == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    @pl.when(d >= 0)
    def _():
        cdt = qt_ref.dtype
        D = qt_ref.shape[1]
        hd = D // num_heads
        kvn = _kvn_col(valid_ref)
        slot = jnp.clip(d, 0, n_tiles - 1)
        for h in range(num_heads):
            sl = slice(h * hd, (h + 1) * hd)
            st = _dot(kt_ref[0, sl], qt_ref[0, sl], ((0,), (0,)))
            st = st + (tilest_ref[h, slot] + kvn)
            at = jax.nn.silu(st).astype(cdt)
            acc_ref[sl] += _dot(vt_ref[0, sl], at, ((1,), (0,)))

    @pl.when(kb == n_k_blocks - 1)
    def _():
        avt_ref[0] = acc_ref[...]


def _pair_dq_kernel(s_ref, qt_ref, kt_ref, vt_ref, davt_ref, valid_ref,
                    tilest_ref, dqt_ref, dtilest_ref, dq_acc, *, n_tiles,
                    num_heads, n_k_blocks):
    """Pair backward, q-major: dq^T w.r.t. the SCALED q (no trailing *scale
    — the scale chain lives in ring_pre_proj's vjp) + transposed tile
    grads."""
    b = pl.program_id(0)
    qb = pl.program_id(1)
    kb = pl.program_id(2)
    d = qb - kb + s_ref[1] // qt_ref.shape[2]

    @pl.when(jnp.logical_and(b == 0, jnp.logical_and(qb == 0, kb == 0)))
    def _():
        dtilest_ref[...] = jnp.zeros_like(dtilest_ref)

    @pl.when(kb == 0)
    def _():
        dq_acc[...] = jnp.zeros_like(dq_acc)

    @pl.when(d >= 0)
    def _():
        cdt = qt_ref.dtype
        D = qt_ref.shape[1]
        hd = D // num_heads
        kvn = _kvn_col(valid_ref)
        slot = jnp.clip(d, 0, n_tiles - 1)
        for h in range(num_heads):
            sl = slice(h * hd, (h + 1) * hd)
            st = _dot(kt_ref[0, sl], qt_ref[0, sl], ((0,), (0,))) \
                + (tilest_ref[h, slot] + kvn)
            dot_b = davt_ref[0, sl].astype(cdt)
            dat = _dot(vt_ref[0, sl], dot_b, ((0,), (0,)))
            dst = dat * _dsilu(st)
            dq_acc[sl] += _dot(kt_ref[0, sl], dst.astype(cdt), ((1,), (0,)))
            dtilest_ref[h, slot] += dst

    @pl.when(kb == n_k_blocks - 1)
    def _():
        dqt_ref[0] = dq_acc[...]


def _pair_dkdv_kernel(s_ref, qt_ref, kt_ref, vt_ref, davt_ref, valid_ref,
                      tilest_ref, dkt_ref, dvt_ref, dk_acc, dv_acc, *,
                      n_tiles, num_heads, n_q_blocks):
    """Pair backward, k-major: dk^T/dv^T for the local kv shard against ONE
    (rotated-in) q shard."""
    kb = pl.program_id(1)
    qb = pl.program_id(2)
    d = qb - kb + s_ref[1] // qt_ref.shape[2]

    @pl.when(qb == 0)
    def _():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    @pl.when(d >= 0)
    def _():
        cdt = qt_ref.dtype
        D = qt_ref.shape[1]
        hd = D // num_heads
        kvn = _kvn_col(valid_ref)
        slot = jnp.clip(d, 0, n_tiles - 1)
        for h in range(num_heads):
            sl = slice(h * hd, (h + 1) * hd)
            st = _dot(kt_ref[0, sl], qt_ref[0, sl], ((0,), (0,))) \
                + (tilest_ref[h, slot] + kvn)
            dot_b = davt_ref[0, sl].astype(cdt)
            at = jax.nn.silu(st).astype(cdt)
            dv_acc[sl] += _dot(dot_b, at, ((1,), (1,)))
            dat = _dot(vt_ref[0, sl], dot_b, ((0,), (0,)))
            dst = (dat * _dsilu(st)).astype(cdt)
            dk_acc[sl] += _dot(qt_ref[0, sl], dst, ((1,), (1,)))

    @pl.when(qb == n_q_blocks - 1)
    def _():
        dkt_ref[0] = dk_acc[...]
        dvt_ref[0] = dv_acc[...]


def _pair_specs(D, blk, H, nt, kmajor=False):
    """Block specs for a pair-attention grid. q-major grids iterate
    (B, n_qb, n_kb); k-major (B, n_kb, n_qb)."""
    if kmajor:
        qix = lambda b, kb, qb, s: (b, 0, qb)      # noqa: E731
        kix = lambda b, kb, qb, s: (b, 0, kb)      # noqa: E731
        vix = lambda b, kb, qb, s: (b, kb, 0)      # noqa: E731
        tix = lambda b, kb, qb, s: (0, 0, 0, 0)    # noqa: E731
    else:
        qix = lambda b, qb, kb, s: (b, 0, qb)      # noqa: E731
        kix = lambda b, qb, kb, s: (b, 0, kb)      # noqa: E731
        vix = lambda b, qb, kb, s: (b, kb, 0)      # noqa: E731
        tix = lambda b, qb, kb, s: (0, 0, 0, 0)    # noqa: E731
    return (pl.BlockSpec((1, D, blk), qix), pl.BlockSpec((1, D, blk), kix),
            pl.BlockSpec((1, blk, 1), vix),
            pl.BlockSpec((H, nt, blk, blk), tix))


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def ring_pair_attn(qt, kt, vt, valid3, rab, off_tokens, num_heads,
                   interpret):
    """Partial HSTU attention of the local q shard against ONE kv shard.

    ``qt`` [B, D, Lq] (pre-scaled), ``kt``/``vt`` [B, D, Lk] (v 1/L-scaled),
    ``valid3`` [B, Lk, 1] int32 kv-validity, ``rab`` [H, buckets] the
    rel-pos bias table (bias tiles build INSIDE each direction so forward
    and backward tile at their measured-best widths — the chunked path's
    fwd 256 / bwd 512 finding; the drab path is the scatter-free Toeplitz
    transpose), ``off_tokens`` runtime global offset in TOKENS
    (q_shard_start - kv_shard_start). Returns the f32 partial [B, D, Lq] —
    ring steps sum exactly (silu attention has no softmax state).
    """
    out, _ = _rpa_fwd(qt, kt, vt, valid3, rab, off_tokens, num_heads,
                      interpret)
    return out


def _rpa_fwd(qt, kt, vt, valid3, rab, off_tokens, num_heads, interpret):
    B, D, Lq = qt.shape
    Lk = kt.shape[2]
    blk = _attn_blk(min(Lq, Lk), D=D)
    tilest = _tiles_t(rab, blk)
    H, nt = tilest.shape[0], tilest.shape[1]
    nqb, nkb = Lq // blk, Lk // blk
    s = jnp.stack([jnp.int32(0), jnp.asarray(off_tokens, jnp.int32)])
    qs, ks, vs, ts = _pair_specs(D, blk, H, nt)
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(B, nqb, nkb),
        in_specs=[qs, ks, ks, vs, ts],
        out_specs=pl.BlockSpec((1, D, blk), lambda b, qb, kb, s: (b, 0, qb)),
        scratch_shapes=[pltpu.VMEM((D, blk), jnp.float32)],
    )
    out = pl.pallas_call(
        functools.partial(_pair_attn_fwd_kernel, n_tiles=nt,
                          num_heads=num_heads, n_k_blocks=nkb),
        grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((B, D, Lq), jnp.float32),
        interpret=interpret,
    )(s, qt, kt, vt, valid3, tilest)
    return out, (qt, kt, vt, valid3, rab, off_tokens)


def _rpa_bwd(num_heads, interpret, res, dav):
    qt, kt, vt, valid3, rab, off_tokens = res
    B, D, Lq = qt.shape
    Lk = kt.shape[2]
    # Backward tiles at the FORWARD width: the chunked single-device
    # kernels measured bwd@512 1.6x better than @256, but in the PAIR
    # structure the wide tiles LOSE — measured on v5e at B=32/Lc=2048
    # (2026-08-20): block fwd+bwd 12.29 ms with bwd@512 vs 10.91 ms at the
    # shared 256 width (per-pair grids are shorter and half the pairs'
    # tiles sit above the causal skip, so there is less per-step overhead
    # to amortize and the [blk, blk] recompute spill costs win out).
    blk = _attn_blk(min(Lq, Lk), D=D)
    tilest = _tiles_t(rab, blk)
    H, nt = tilest.shape[0], tilest.shape[1]
    nqb, nkb = Lq // blk, Lk // blk
    s = jnp.stack([jnp.int32(0), jnp.asarray(off_tokens, jnp.int32)])
    cdt = qt.dtype

    qs, ks, vs, ts = _pair_specs(D, blk, H, nt)
    gs_dq = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(B, nqb, nkb),
        in_specs=[qs, ks, ks, qs, vs, ts],
        out_specs=[pl.BlockSpec((1, D, blk),
                                lambda b, qb, kb, s: (b, 0, qb)), ts],
        scratch_shapes=[pltpu.VMEM((D, blk), jnp.float32)],
    )
    dqt, dtilest = pl.pallas_call(
        functools.partial(_pair_dq_kernel, n_tiles=nt, num_heads=num_heads,
                          n_k_blocks=nkb),
        grid_spec=gs_dq,
        out_shape=[jax.ShapeDtypeStruct((B, D, Lq), jnp.float32),
                   jax.ShapeDtypeStruct((H, nt, blk, blk), jnp.float32)],
        interpret=interpret,
    )(s, qt, kt, vt, dav, valid3, tilest)

    qs2, ks2, vs2, ts2 = _pair_specs(D, blk, H, nt, kmajor=True)
    gs_dkdv = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(B, nkb, nqb),
        in_specs=[qs2, ks2, ks2, qs2, vs2, ts2],
        out_specs=[pl.BlockSpec((1, D, blk),
                                lambda b, kb, qb, s: (b, 0, kb))] * 2,
        scratch_shapes=[pltpu.VMEM((D, blk), jnp.float32)] * 2,
    )
    dkt, dvt = pl.pallas_call(
        functools.partial(_pair_dkdv_kernel, n_tiles=nt,
                          num_heads=num_heads, n_q_blocks=nqb),
        grid_spec=gs_dkdv,
        out_shape=[jax.ShapeDtypeStruct((B, D, Lk), jnp.float32)] * 2,
        interpret=interpret,
    )(s, qt, kt, vt, dav, valid3, tilest)
    drab = _bias_tiles_transpose(dtilest.transpose(0, 1, 3, 2),
                                 rab.shape[1])
    return (dqt.astype(cdt), dkt.astype(cdt), dvt.astype(cdt), None,
            drab, None)


ring_pair_attn.defvjp(_rpa_fwd, _rpa_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def ring_pre_proj(xt, lnt, wuvqk, buvqkt, seq_len, num_heads, interpret):
    """LN1 + uvqk projection + silu on the local shard: returns
    (q^T pre-scaled, k^T, v^T 1/seq_len-scaled, u^T f32). ``seq_len`` is the
    GLOBAL L (the HSTU 1/L normalization is global)."""
    outs, _ = _rpp_fwd(xt, lnt, wuvqk, buvqkt, seq_len, num_heads, interpret)
    return outs


def _rpp_fwd(xt, lnt, wuvqk, buvqkt, seq_len, num_heads, interpret):
    B, D, Lc = xt.shape
    CH = _chunk_of(Lc, D)
    nc = Lc // CH
    hd = D // num_heads
    cdt = xt.dtype
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(B, nc),
        in_specs=[_cblk(D, CH), _cfull((D, 6)), _cfull((D, 4 * D)),
                  _cfull((4 * D, 1))],
        out_specs=[_cblk(D, CH)] * 4,
    )
    seed1 = jnp.zeros((1,), jnp.int32)
    outs = pl.pallas_call(
        functools.partial(_fwd_pre_kernel_chunk, seq_len=seq_len,
                          scale=hd ** -0.5, chunk=CH),
        grid_spec=gs,
        out_shape=[jax.ShapeDtypeStruct((B, D, Lc), cdt)] * 3
        + [jax.ShapeDtypeStruct((B, D, Lc), jnp.float32)],
        interpret=interpret,
    )(seed1, xt, lnt, wuvqk, buvqkt)
    return tuple(outs), (xt, lnt, wuvqk, buvqkt)


def _rpp_bwd(seq_len, num_heads, interpret, res, cots):
    xt, lnt, wuvqk, buvqkt = res
    dqt, dkt, dvt, dut = cots
    B, D, Lc = xt.shape
    CH = _chunk_of(Lc, D)
    nc = Lc // CH
    hd = D // num_heads
    f32 = jnp.float32
    # _bwd_proj_kernel_chunk's slots: dq = grad w.r.t. silu output
    # (= scale * d(q_scaled)); dv = d(v_scaled) (the kernel applies 1/L);
    # the residual slot dyt is zero — the post unit owns the residual path.
    dqt = dqt.astype(f32) * (hd ** -0.5)
    zeros = jnp.zeros((B, D, Lc), f32)
    seed1 = jnp.zeros((1,), jnp.int32)
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(B, nc),
        in_specs=[_cblk(D, CH)] * 6 + [_cfull((D, 6)), _cfull((D, 4 * D)),
                                       _cfull((4 * D, 1))],
        out_specs=[_cblk(D, CH), _cfull((D, 2)), _cfull((D, 4 * D)),
                   _cfull((4 * D, 1))],
    )
    dxt, dlnt01, dwuvqk, dbuvqkt = pl.pallas_call(
        functools.partial(_bwd_proj_kernel_chunk, seq_len=seq_len, chunk=CH),
        grid_spec=gs,
        out_shape=[jax.ShapeDtypeStruct((B, D, Lc), xt.dtype),
                   jax.ShapeDtypeStruct((D, 2), f32),
                   jax.ShapeDtypeStruct((D, 4 * D), f32),
                   jax.ShapeDtypeStruct((4 * D, 1), f32)],
        interpret=interpret,
    )(seed1, xt, zeros, dut.astype(f32), dqt, dkt.astype(f32),
      dvt.astype(f32), lnt, wuvqk, buvqkt)
    dlnt = jnp.concatenate([dlnt01, jnp.zeros((D, 4), f32)], axis=1)
    return dxt, dlnt, dwuvqk, dbuvqkt


ring_pre_proj.defvjp(_rpp_fwd, _rpp_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(11, 12, 13, 14, 15))
def ring_post_gate(xt, avt, ut, lnt, wuvqk, buvqkt, wo, bot, w13, w2,
                   seedv, seq_len, num_heads, rate, train, interpret):
    """LN2 gate + out-proj + residual + LN3 + SwiGLU FFN + residual on the
    local shard. ``seedv``: runtime int32 dropout seed (fold the shard
    indices in — every (data, seq) shard must draw distinct masks).
    ``wuvqk``/``buvqkt`` feed the backward's projection recompute only
    (zero cotangent here; ring_pre_proj owns their gradients)."""
    out, _ = _rpg_fwd(xt, avt, ut, lnt, wuvqk, buvqkt, wo, bot, w13, w2,
                      seedv, seq_len, num_heads, rate, train, interpret)
    return out


def _rpg_fwd(xt, avt, ut, lnt, wuvqk, buvqkt, wo, bot, w13, w2, seedv,
             seq_len, num_heads, rate, train, interpret):
    B, D, Lc = xt.shape
    F = w2.shape[0]
    CH = _chunk_of(Lc, D)
    nc = Lc // CH
    cdt = xt.dtype
    seed1 = jnp.reshape(seedv, (1,)).astype(jnp.int32)
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(B, nc),
        in_specs=[_cblk(D, CH), _cblk(D, CH), _cblk(D, CH),
                  _cfull((D, 6)), _cfull((D, D)), _cfull((D, 1)),
                  _cfull((D, 2 * F)), _cfull((F, D))],
        out_specs=_cblk(D, CH),
    )
    out = pl.pallas_call(
        functools.partial(_fwd_post_kernel_chunk, rate=rate, train=train,
                          chunk=CH, n_chunks=nc),
        grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((B, D, Lc), cdt),
        interpret=interpret,
    )(seed1, xt, avt.astype(cdt), ut, lnt, wo, bot, w13, w2)
    return out, (xt, avt, lnt, wuvqk, buvqkt, wo, bot, w13, w2, seed1)


def _rpg_bwd(seq_len, num_heads, rate, train, interpret, res, dout):
    xt, avt, lnt, wuvqk, buvqkt, wo, bot, w13, w2, seed1 = res
    B, D, Lc = xt.shape
    F = w2.shape[0]
    CH = _chunk_of(Lc, D)
    nc = Lc // CH
    hd = D // num_heads
    f32 = jnp.float32
    cdt = xt.dtype
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(B, nc),
        in_specs=[_cblk(D, CH), _cblk(D, CH), _cblk(D, CH),
                  _cfull((D, 6)), _cfull((D, 4 * D)), _cfull((4 * D, 1)),
                  _cfull((D, D)), _cfull((D, 1)), _cfull((D, 2 * F)),
                  _cfull((F, D))],
        out_specs=[_cblk(D, CH)] * 6 + [_cfull((D, 4)), _cfull((D, D)),
                                        _cfull((D, 1)), _cfull((D, 2 * F)),
                                        _cfull((F, D))],
    )
    outs = pl.pallas_call(
        functools.partial(_bwd_gate_kernel_chunk, seq_len=seq_len,
                          num_heads=num_heads, scale=hd ** -0.5, rate=rate,
                          train=train, chunk=CH, n_chunks=nc),
        grid_spec=gs,
        out_shape=[
            jax.ShapeDtypeStruct((B, D, Lc), cdt),   # q^T recompute (unused)
            jax.ShapeDtypeStruct((B, D, Lc), cdt),   # k^T recompute (unused)
            jax.ShapeDtypeStruct((B, D, Lc), cdt),   # v^T recompute (unused)
            jax.ShapeDtypeStruct((B, D, Lc), f32),   # dav^T
            jax.ShapeDtypeStruct((B, D, Lc), f32),   # dy^T (residual dx)
            jax.ShapeDtypeStruct((B, D, Lc), f32),   # du^T
            jax.ShapeDtypeStruct((D, 4), f32),       # dlnt cols 2..5
            jax.ShapeDtypeStruct((D, D), f32),
            jax.ShapeDtypeStruct((D, 1), f32),
            jax.ShapeDtypeStruct((D, 2 * F), f32),
            jax.ShapeDtypeStruct((F, D), f32),
        ],
        interpret=interpret,
    )(seed1, xt, avt.astype(cdt), dout, lnt, wuvqk, buvqkt, wo, bot, w13,
      w2)
    _, _, _, davt, dyt, dut, dlnt25, dwo, dbot, dw13, dw2 = outs
    dlnt = jnp.concatenate([jnp.zeros((D, 2), f32), dlnt25], axis=1)
    return (dyt.astype(cdt), davt.astype(avt.dtype), dut, dlnt, None, None,
            dwo, dbot, dw13, dw2, None)


ring_post_gate.defvjp(_rpg_fwd, _rpg_bwd)
