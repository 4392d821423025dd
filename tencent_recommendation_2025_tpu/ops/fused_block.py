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
                             _bias_tiles_transpose, _dsilu, _stripe_bias)

# stripe q-block width. 128 measured best on v5e: 256 halves the stripe
# count but one flagship block fwd+bwd measured 3.99 ms vs 3.26 ms at 128
# (2026-08-18) — the [256, L] f32 stripe intermediates pressure the vector
# registers, the same failure mode as the chunked kernel's 512 block
FB_BLK = BLK

_EPS = 1e-8  # models/embedding.layernorm default


def _ln_fwd(xf, g_row, b_row):
    """f32 LN (params as [1, D] rows) returning (out, xhat, rstd)."""
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) * (xf - mu), axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + _EPS)
    xhat = (xf - mu) * rstd
    return xhat * g_row + b_row, xhat, rstd


def _ln_bwd(dy, xhat, rstd, g_row):
    """dx for y = xhat*g + b; (dgamma, dbeta) as [1, D] row-sums."""
    dxhat = dy * g_row
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dx = rstd * (dxhat - m1 - xhat * m2)
    return (dx, jnp.sum(dy * xhat, axis=0, keepdims=True),
            jnp.sum(dy, axis=0, keepdims=True))


def _keep_mask(shape, rate):
    """0-or-1/(1-rate) f32 keep mask from the seeded in-kernel PRNG."""
    thr = jnp.uint32(int(rate * (2.0 ** 32)))
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    return (bits >= thr).astype(jnp.float32) / (1.0 - rate)


def _dot(a, b, dims):
    return jax.lax.dot_general(a, b, (dims, ((), ())),
                               preferred_element_type=jnp.float32)


def _attn_fwd_stripes(q16, k16, v16, kv_neg, tiles_ref, av_acc, *,
                      n_tiles, num_heads, n_blocks):
    """The whole-seq stripe loop, writing the attention output into the
    av_acc VMEM scratch.

    Masking is ADDITIVE (round-4 rewrite): the causal upper triangle rides
    the slot-0 bias tile (``_bias_tiles(causal_diag=True)``) and key padding
    is ``kv_neg`` ([1, L] f32, 0 valid / MASK_NEG padded) broadcast-added to
    every stripe — silu/dsilu of -1e4 are exactly 0, so the old per-stripe
    iota/compare/and/cast/mul mask passes vanish. The 1/seq_len factor is
    pre-folded into ``v16`` by the caller."""
    D = q16.shape[-1]
    hd = D // num_heads
    blk = tiles_ref.shape[-1]
    for qb in range(n_blocks):
        ks = (qb + 1) * blk
        qsl = slice(qb * blk, (qb + 1) * blk)
        for h in range(num_heads):
            sl = slice(h * hd, (h + 1) * hd)
            s = _dot(q16[qsl, sl], k16[:ks, sl], ((1,), (1,)))
            s = s + (_stripe_bias(tiles_ref, h, qb, qb + 1, n_tiles)
                     + kv_neg[:, :ks])
            a = jax.nn.silu(s).astype(q16.dtype)
            av_acc[qsl, sl] = _dot(a, v16[:ks, sl], ((1,), (0,)))


def _attn_bwd_stripes(q16, k16, v16, dav, kv_neg, tiles_ref, dtiles_ref,
                      dk_acc, dv_acc, *, n_tiles, num_heads,
                      n_blocks, scale):
    """Stripe backward: returns dq (f32, includes *scale, i.e. the gradient
    w.r.t. the UNSCALED q projection); dk/dv accumulate into VMEM scratch;
    bias-tile grads accumulate into the revisited dtiles output ref.

    Same additive-mask scheme as the forward: ds is exactly zero at masked
    positions (dsilu(-1e4) == 0), so dk/dtiles need no mask factor; v16 is
    pre-scaled by 1/seq_len, making the returned dv the gradient w.r.t. the
    SCALED v (caller multiplies by 1/seq_len once)."""
    cdt = q16.dtype
    D = q16.shape[-1]
    hd = D // num_heads
    blk = tiles_ref.shape[-1]
    dk_acc[...] = jnp.zeros_like(dk_acc)
    dv_acc[...] = jnp.zeros_like(dv_acc)
    dq_rows = []
    for qb in range(n_blocks):
        ks = (qb + 1) * blk
        qsl = slice(qb * blk, (qb + 1) * blk)
        dqs = []
        for h in range(num_heads):
            sl = slice(h * hd, (h + 1) * hd)
            do_b = dav[qsl, sl].astype(cdt)
            s = _dot(q16[qsl, sl], k16[:ks, sl], ((1,), (1,)))
            s = s + (_stripe_bias(tiles_ref, h, qb, qb + 1, n_tiles)
                     + kv_neg[:, :ks])
            a = jax.nn.silu(s).astype(cdt)
            dv_acc[:ks, sl] += _dot(a, do_b, ((0,), (0,)))
            da = _dot(do_b, v16[:ks, sl], ((1,), (1,)))
            ds = da * _dsilu(s)
            ds_c = ds.astype(cdt)
            dqs.append(_dot(ds_c, k16[:ks, sl], ((1,), (0,))))
            dk_acc[:ks, sl] += _dot(ds_c, q16[qsl, sl], ((0,), (0,)))
            for kb in range(qb + 1):
                slot = min(qb - kb, n_tiles - 1)
                dtiles_ref[h, slot] += ds[:, kb * blk:(kb + 1) * blk]
        dq_rows.append(jnp.concatenate(dqs, axis=-1) * scale)
    return jnp.concatenate(dq_rows, axis=0)


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------

def _fwd_kernel(seed_ref, x_ref, valid_ref, ln_ref, wuvqk_ref, buvqk_ref,
                wo_ref, bo_ref, w13_ref, w2_ref, tiles_ref,
                out_ref, av_ref, av_acc, *,
                seq_len, n_tiles, num_heads, n_blocks, scale, rate, train):
    f32 = jnp.float32
    b = pl.program_id(0)
    x16 = x_ref[0]                                    # [L, D] compute dtype
    cdt = x16.dtype
    xf = x16.astype(f32)
    D = xf.shape[-1]
    kv_neg = jnp.where(valid_ref[0] != 0, 0.0, MASK_NEG)  # [1, L] f32
    drop = train and rate > 0.0                       # python-static

    # --- attention half ---
    h1, _, _ = _ln_fwd(xf, ln_ref[0:1, :], ln_ref[1:2, :])
    uvqk = _dot(h1.astype(cdt), wuvqk_ref[...], ((1,), (0,))) \
        + buvqk_ref[0:1, :]
    uvqk = jax.nn.silu(uvqk)                          # [L, 4D] f32
    u = uvqk[:, :D]
    v16 = (uvqk[:, D:2 * D] * (1.0 / seq_len)).astype(cdt)
    q16 = (uvqk[:, 2 * D:3 * D] * scale).astype(cdt)
    k16 = uvqk[:, 3 * D:].astype(cdt)
    _attn_fwd_stripes(q16, k16, v16, kv_neg, tiles_ref, av_acc,
                      n_tiles=n_tiles,
                      num_heads=num_heads, n_blocks=n_blocks)
    av = av_acc[...]                                  # [L, D] f32
    av_ref[0] = av.astype(cdt)                        # residual for backward

    g, _, _ = _ln_fwd(av, ln_ref[2:3, :], ln_ref[3:4, :])
    g = g * u
    if drop:
        pltpu.prng_seed(seed_ref[0], 2 * b)
        g = g * _keep_mask(g.shape, rate)
    y = xf + _dot(g.astype(cdt), wo_ref[...], ((1,), (0,))) + bo_ref[0:1, :]

    # --- FFN half (SwiGLU) ---
    h2, _, _ = _ln_fwd(y, ln_ref[4:5, :], ln_ref[5:6, :])
    x13 = _dot(h2.astype(cdt), w13_ref[...], ((1,), (0,)))
    F = x13.shape[-1] // 2
    f = jax.nn.silu(x13[:, :F]) * x13[:, F:]
    if drop:
        pltpu.prng_seed(seed_ref[0], 2 * b + 1)
        f = f * _keep_mask(f.shape, rate)
    out = y + _dot(f.astype(cdt), w2_ref[...], ((1,), (0,)))
    out_ref[0] = out.astype(out_ref.dtype)


# ---------------------------------------------------------------------------
# backward kernel
# ---------------------------------------------------------------------------

def _bwd_kernel(seed_ref, x_ref, valid_ref, ln_ref, wuvqk_ref, buvqk_ref,
                wo_ref, bo_ref, w13_ref, w2_ref, tiles_ref, av_ref, dout_ref,
                dx_ref, dln_ref, dwuvqk_ref, dbuvqk_ref, dwo_ref, dbo_ref,
                dw13_ref, dw2_ref, dtiles_ref,
                dk_acc, dv_acc, *,
                seq_len, n_tiles, num_heads, n_blocks, scale, rate, train):
    f32 = jnp.float32
    b = pl.program_id(0)
    x16 = x_ref[0]
    cdt = x16.dtype
    xf = x16.astype(f32)
    D = xf.shape[-1]
    kv_neg = jnp.where(valid_ref[0] != 0, 0.0, MASK_NEG)  # [1, L] f32
    dout = dout_ref[0].astype(f32)
    drop = train and rate > 0.0

    @pl.when(b == 0)
    def _():
        dln_ref[...] = jnp.zeros_like(dln_ref)
        dwuvqk_ref[...] = jnp.zeros_like(dwuvqk_ref)
        dbuvqk_ref[...] = jnp.zeros_like(dbuvqk_ref)
        dwo_ref[...] = jnp.zeros_like(dwo_ref)
        dbo_ref[...] = jnp.zeros_like(dbo_ref)
        dw13_ref[...] = jnp.zeros_like(dw13_ref)
        dw2_ref[...] = jnp.zeros_like(dw2_ref)
        dtiles_ref[...] = jnp.zeros_like(dtiles_ref)

    # ---- recompute forward intermediates (av is loaded, not recomputed) ---
    h1, xhat1, rstd1 = _ln_fwd(xf, ln_ref[0:1, :], ln_ref[1:2, :])
    h1_16 = h1.astype(cdt)
    uvqk_pre = _dot(h1_16, wuvqk_ref[...], ((1,), (0,))) + buvqk_ref[0:1, :]
    uvqk = jax.nn.silu(uvqk_pre)
    u = uvqk[:, :D]
    v16 = (uvqk[:, D:2 * D] * (1.0 / seq_len)).astype(cdt)
    q16 = (uvqk[:, 2 * D:3 * D] * scale).astype(cdt)
    k16 = uvqk[:, 3 * D:].astype(cdt)
    av = av_ref[0].astype(f32)
    av_ln, xhat2, rstd2 = _ln_fwd(av, ln_ref[2:3, :], ln_ref[3:4, :])
    g = av_ln * u
    keep1 = keep2 = None
    if drop:
        pltpu.prng_seed(seed_ref[0], 2 * b)
        keep1 = _keep_mask(g.shape, rate)
        g = g * keep1
    g16 = g.astype(cdt)
    y = xf + _dot(g16, wo_ref[...], ((1,), (0,))) + bo_ref[0:1, :]
    h2, xhat3, rstd3 = _ln_fwd(y, ln_ref[4:5, :], ln_ref[5:6, :])
    h2_16 = h2.astype(cdt)
    x13 = _dot(h2_16, w13_ref[...], ((1,), (0,)))
    F = x13.shape[-1] // 2
    x1, x3 = x13[:, :F], x13[:, F:]
    silu_x1 = jax.nn.silu(x1)
    f = silu_x1 * x3
    if drop:
        pltpu.prng_seed(seed_ref[0], 2 * b + 1)
        keep2 = _keep_mask(f.shape, rate)
        f = f * keep2
    f16 = f.astype(cdt)

    # ---- gradients ----
    dout16 = dout.astype(cdt)
    # out = y + f @ w2
    dw2_ref[...] += _dot(f16, dout16, ((0,), (0,)))
    df = _dot(dout16, w2_ref[...], ((1,), (1,)))
    if drop:
        df = df * keep2
    dx1 = df * x3 * _dsilu(x1)
    dx3 = df * silu_x1
    dx13 = jnp.concatenate([dx1, dx3], axis=-1).astype(cdt)
    dw13_ref[...] += _dot(h2_16, dx13, ((0,), (0,)))
    dh2 = _dot(dx13, w13_ref[...], ((1,), (1,)))
    dy_ln, dg_r, db_r = _ln_bwd(dh2, xhat3, rstd3, ln_ref[4:5, :])
    dln_ref[4:5, :] += dg_r
    dln_ref[5:6, :] += db_r
    dy = dout + dy_ln

    # y = xf + g @ wo + bo
    dy16 = dy.astype(cdt)
    dwo_ref[...] += _dot(g16, dy16, ((0,), (0,)))
    dbo_ref[0:1, :] += jnp.sum(dy, axis=0, keepdims=True)
    dg = _dot(dy16, wo_ref[...], ((1,), (1,)))
    if drop:
        dg = dg * keep1
    du = dg * av_ln
    dav_ln = dg * u
    dav, dg_r, db_r = _ln_bwd(dav_ln, xhat2, rstd2, ln_ref[2:3, :])
    dln_ref[2:3, :] += dg_r
    dln_ref[3:4, :] += db_r

    dq = _attn_bwd_stripes(q16, k16, v16, dav, kv_neg, tiles_ref, dtiles_ref,
                           dk_acc, dv_acc, n_tiles=n_tiles,
                           num_heads=num_heads, n_blocks=n_blocks,
                           scale=scale)
    # dv_acc holds the gradient w.r.t. the 1/seq_len-scaled v
    duvqk = jnp.concatenate(
        [du, dv_acc[...] * (1.0 / seq_len), dq, dk_acc[...]],
        axis=-1) * _dsilu(uvqk_pre)
    duvqk16 = duvqk.astype(cdt)
    dwuvqk_ref[...] += _dot(h1_16, duvqk16, ((0,), (0,)))
    dbuvqk_ref[0:1, :] += jnp.sum(duvqk, axis=0, keepdims=True)
    dh1 = _dot(duvqk16, wuvqk_ref[...], ((1,), (1,)))
    dx_ln, dg_r, db_r = _ln_bwd(dh1, xhat1, rstd1, ln_ref[0:1, :])
    dln_ref[0:1, :] += dg_r
    dln_ref[1:2, :] += db_r
    dx_ref[0] = (dy + dx_ln).astype(dx_ref.dtype)


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
        _batch((1, L, D)),                                       # x
        _batch((1, 1, L)),                                       # valid
        _full((6, D)),                                           # ln pack
        _full((D, 4 * D)),                                       # wuvqk
        _full((1, 4 * D)),                                       # buvqk
        _full((D, D)),                                           # wo
        _full((1, D)),                                           # bo
        _full((D, 2 * F)),                                       # w13
        _full((F, D)),                                           # w2
        _full((H, nt, FB_BLK, FB_BLK)),                          # bias tiles
    ]


@functools.partial(jax.custom_vjp, nondiff_argnums=(11, 12, 13, 14))
def _fused_block_core(x, valid3, rab, ln, wuvqk, buvqk, wo, bo, w13, w2,
                      seed1, num_heads, rate, train, interpret):
    out, _ = _fused_fwd_call(x, valid3, rab, ln, wuvqk, buvqk, wo, bo,
                             w13, w2, seed1, num_heads, rate, train,
                             interpret)
    return out


def _fused_fwd_call(x, valid3, rab, ln, wuvqk, buvqk, wo, bo, w13, w2,
                    seed1, num_heads, rate, train, interpret):
    B, L, D = x.shape
    F = w2.shape[0]
    tiles = _bias_tiles(rab, FB_BLK, causal_diag=True)
    H, nt = tiles.shape[0], tiles.shape[1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(B,),
        in_specs=_specs(L, D, F, H, nt),
        out_specs=[_batch((1, L, D)), _batch((1, L, D))],
        scratch_shapes=[pltpu.VMEM((L, D), jnp.float32)],
    )
    hd = D // num_heads
    out, av = pl.pallas_call(
        functools.partial(_fwd_kernel, seq_len=L, n_tiles=nt,
                          num_heads=num_heads, n_blocks=L // FB_BLK,
                          scale=hd ** -0.5, rate=rate, train=train),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((B, L, D), x.dtype),
                   jax.ShapeDtypeStruct((B, L, D), x.dtype)],
        interpret=interpret,
    )(seed1, x, valid3, ln, wuvqk, buvqk, wo, bo, w13, w2, tiles)
    return out, av


def _core_fwd(x, valid3, rab, ln, wuvqk, buvqk, wo, bo, w13, w2,
              seed1, num_heads, rate, train, interpret):
    out, av = _fused_fwd_call(x, valid3, rab, ln, wuvqk, buvqk, wo, bo,
                              w13, w2, seed1, num_heads, rate, train,
                              interpret)
    return out, (x, valid3, rab, ln, wuvqk, buvqk, wo, bo, w13, w2,
                 seed1, av)


def _core_bwd(num_heads, rate, train, interpret, res, dout):
    x, valid3, rab, ln, wuvqk, buvqk, wo, bo, w13, w2, seed1, av = res
    B, L, D = x.shape
    F = w2.shape[0]
    tiles = _bias_tiles(rab, FB_BLK, causal_diag=True)
    H, nt = tiles.shape[0], tiles.shape[1]
    in_specs = _specs(L, D, F, H, nt) + [
        _batch((1, L, D)),                                       # av
        _batch((1, L, D)),                                       # dout
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(B,),
        in_specs=in_specs,
        out_specs=[
            _batch((1, L, D)),                                   # dx
            _full((6, D)), _full((D, 4 * D)), _full((1, 4 * D)),
            _full((D, D)), _full((1, D)), _full((D, 2 * F)),
            _full((F, D)), _full((H, nt, FB_BLK, FB_BLK)),
        ],
        scratch_shapes=[pltpu.VMEM((L, D), jnp.float32),
                        pltpu.VMEM((L, D), jnp.float32)],
    )
    hd = D // num_heads
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, seq_len=L, n_tiles=nt,
                          num_heads=num_heads, n_blocks=L // FB_BLK,
                          scale=hd ** -0.5, rate=rate, train=train),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, L, D), x.dtype),
            jax.ShapeDtypeStruct((6, D), jnp.float32),
            jax.ShapeDtypeStruct((D, 4 * D), jnp.float32),
            jax.ShapeDtypeStruct((1, 4 * D), jnp.float32),
            jax.ShapeDtypeStruct((D, D), jnp.float32),
            jax.ShapeDtypeStruct((1, D), jnp.float32),
            jax.ShapeDtypeStruct((D, 2 * F), jnp.float32),
            jax.ShapeDtypeStruct((F, D), jnp.float32),
            jax.ShapeDtypeStruct((H, nt, FB_BLK, FB_BLK), jnp.float32),
        ],
        interpret=interpret,
    )(seed1, x, valid3, ln, wuvqk, buvqk, wo, bo, w13, w2, tiles, av, dout)
    dx, dln, dwuvqk, dbuvqk, dwo, dbo, dw13, dw2, dtiles = outs
    drab = _bias_tiles_transpose(dtiles, rab.shape[1])
    return (dx, None, drab, dln, dwuvqk, dbuvqk, dwo, dbo, dw13, dw2, None)


_fused_block_core.defvjp(_core_fwd, _core_bwd)


def fused_block_supported(cfg, L: int, backend: str) -> bool:
    """Static gate for the fused whole-block kernel (mirrors the shape rules
    of models/encoder.make_attention_cores)."""
    from .hstu_attention import MAX_WHOLESEQ_L, _n_near
    if not (getattr(cfg, "fused_block", False) and backend == "tpu"):
        return False
    if cfg.block_type != "hstu" or cfg.ffn_type != "swiglu":
        return False
    # L=2048 probed on v5e (2026-08-19): Mosaic compile fails reproducibly
    # (the whole-seq residents — uvqk [L, 4D], x13 [L, 2F], stripes —
    # overflow VMEM); longer sequences run the chunked attention kernel +
    # XLA elementwise instead
    if not (256 <= L <= MAX_WHOLESEQ_L and L % FB_BLK == 0):
        return False
    if cfg.hidden_units % cfg.num_heads != 0:
        return False
    try:
        _n_near(cfg.hstu_rel_pos_buckets, BLK)
    except ValueError:
        return False
    return True


def fused_hstu_block(x, bp, token_type, seed, num_heads: int,
                     dropout_rate: float = 0.0, train: bool = False,
                     interpret: bool = False):
    """One full HSTU block (pre-norm, SwiGLU FFN), fused.

    ``x`` [B, L, D] compute-dtype; ``bp`` is the encoder's per-block param
    subtree ({attn_ln, ffn_ln, ffn{w13,w2}, hstu{uvqk,out,attn_ln,rab}});
    ``token_type`` [B, L] (0 = padding key); ``seed`` int32 scalar/0-d array
    driving the in-kernel dropout PRNG. Returns x + block(x) — unlike
    models/hstu.hstu_block the kernel owns the residual wiring.
    """
    f32 = jnp.float32
    cdt = x.dtype
    ln = jnp.stack([
        bp["attn_ln"]["scale"].astype(f32), bp["attn_ln"]["bias"].astype(f32),
        bp["hstu"]["attn_ln"]["scale"].astype(f32),
        bp["hstu"]["attn_ln"]["bias"].astype(f32),
        bp["ffn_ln"]["scale"].astype(f32), bp["ffn_ln"]["bias"].astype(f32),
    ])
    valid3 = (token_type != 0).astype(jnp.int32)[:, None, :]
    seed1 = jnp.reshape(seed, (1,)).astype(jnp.int32)
    return _fused_block_core(
        x, valid3, bp["hstu"]["rab"], ln,
        bp["hstu"]["uvqk"]["w"].astype(cdt),
        bp["hstu"]["uvqk"]["b"].astype(f32)[None, :],
        bp["hstu"]["out"]["w"].astype(cdt),
        bp["hstu"]["out"]["b"].astype(f32)[None, :],
        bp["ffn"]["w13"].astype(cdt), bp["ffn"]["w2"].astype(cdt),
        seed1, num_heads, float(dropout_rate), bool(train), bool(interpret))
