"""Sequence encoder (C6): fused embeddings -> N blocks -> final LayerNorm.

Reproduces the reference ``log2feats`` semantics
(``model/BaseLine/model.py:312-350``): sqrt(D) scaling, learned absolute
positions ``1..L`` zeroed on padding ids, embedding dropout, causal ∧
key-padding mask, ``norm_first`` pre-LN or post-LN residual wiring, final
LayerNorm(eps=1e-8).

FFN variants:
- ``relu``: two pointwise linears + ReLU — the reference's Conv1d(k=1)
  sandwich (``model.py:65-78``) is exactly a per-token linear, so it is one
  here (a Conv1d with kernel 1 has no cross-token taps);
- ``swiglu``: LLaMA-style packed SwiGLU with the 2/3 rule and
  ``multiple_of`` rounding (BaseLineO1 ``model.py:103-165``).
"""

from __future__ import annotations

from typing import Dict, Mapping, Optional

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from .attention import init_mha_params, mha
from .embedding import layernorm, layernorm_init, linear_init
from .hstu import hstu_block, init_hstu_params


# ---------------------------------------------------------------------------
# FFNs
# ---------------------------------------------------------------------------

def swiglu_hidden_dim(d_model: int, mult: float, multiple_of: int) -> int:
    """BaseLineO1's hidden sizing: 2/3 rule then round up to multiple_of
    (``BaseLineO1/model.py:120-131``)."""
    hidden = int(2 * (d_model * mult) / 3)
    return multiple_of * (-(-hidden // multiple_of))


def init_ffn_params(key, cfg: ModelConfig) -> Dict:
    D = cfg.hidden_units
    if cfg.ffn_type == "swiglu":
        H = swiglu_hidden_dim(D, cfg.ffn_hidden_mult, cfg.ffn_multiple_of)
        ks = jax.random.split(key, 2)
        return {  # bias-free packed w13 (D -> 2H) and w2 (H -> D)
            "w13": linear_init(ks[0], D, 2 * H)["w"],
            "w2": linear_init(ks[1], H, D)["w"],
        }
    ks = jax.random.split(key, 2)
    return {"fc1": linear_init(ks[0], D, D), "fc2": linear_init(ks[1], D, D)}


def ffn(params: Mapping, x: jnp.ndarray, cfg: ModelConfig,
        train: bool = False, dropout_key: Optional[jax.Array] = None
        ) -> jnp.ndarray:
    dtype = x.dtype

    def drop(v, key):
        if train and cfg.dropout_rate > 0.0 and key is not None:
            keep = jax.random.bernoulli(key, 1.0 - cfg.dropout_rate, v.shape)
            return v * keep / (1.0 - cfg.dropout_rate)
        return v

    if "w13" in params:
        x13 = x @ params["w13"].astype(dtype)
        x1, x3 = jnp.split(x13, 2, axis=-1)
        h = jax.nn.silu(x1) * x3
        h = drop(h, dropout_key)
        return h @ params["w2"].astype(dtype)
    k1 = k2 = None
    if dropout_key is not None:
        k1, k2 = jax.random.split(dropout_key)
    h = x @ params["fc1"]["w"].astype(dtype) + params["fc1"]["b"].astype(dtype)
    h = jax.nn.relu(drop(h, k1))
    h = h @ params["fc2"]["w"].astype(dtype) + params["fc2"]["b"].astype(dtype)
    return drop(h, k2)


# ---------------------------------------------------------------------------
# Blocks + encoder
# ---------------------------------------------------------------------------

def init_block_params(key, cfg: ModelConfig) -> Dict:
    ks = jax.random.split(key, 4)
    ln_scale = 0.0 if cfg.reference_init else 1.0
    p = {
        "attn_ln": layernorm_init(cfg.hidden_units, ln_scale),
        "ffn_ln": layernorm_init(cfg.hidden_units, ln_scale),
        "ffn": init_ffn_params(ks[1], cfg),
    }
    if cfg.block_type == "hstu":
        p["hstu"] = init_hstu_params(ks[0], cfg.hidden_units, cfg.num_heads,
                                     cfg.hstu_rel_pos_buckets)
    else:
        p["attn"] = init_mha_params(ks[0], cfg.hidden_units)
    return p


def init_encoder_params(key, cfg: ModelConfig) -> Dict:
    """Blocks are stored STACKED (every leaf gains a leading [num_blocks]
    axis) so the encoder can ``lax.scan`` over them — one compiled block body
    (and one Pallas kernel instance) regardless of depth, instead of
    ``num_blocks`` unrolled copies. Cuts XLA/Mosaic compile time ~linearly in
    depth."""
    ks = jax.random.split(key, cfg.num_blocks + 1)
    ln_scale = 0.0 if cfg.reference_init else 1.0
    per_block = [init_block_params(ks[i], cfg) for i in range(cfg.num_blocks)]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *per_block)
    return {
        "blocks": stacked,
        "last_ln": layernorm_init(cfg.hidden_units, ln_scale),
    }


@jax.custom_vjp
def _positional_take(pos_table, seq_ids):
    """Positional lookup 1..L zeroed on padding ids (reference
    model.py:326-328) with a SCATTER-FREE backward.

    The naive take-transpose scatter-adds B duplicate updates per position
    row, which TPU serializes. But position l maps to row l+1 exactly (or
    the padding row 0), so the table gradient is a batch-sum written at a
    static row slice — no scatter. Row 0 stays zero (padding_idx=0, as the
    reference's pos_emb)."""
    poss = jax.lax.broadcasted_iota(jnp.int32, seq_ids.shape, 1) + 1
    poss = poss * (seq_ids != 0)
    return jnp.take(pos_table, poss, axis=0)


def _pt_fwd(pos_table, seq_ids):
    return _positional_take(pos_table, seq_ids), (pos_table, seq_ids)


def _pt_bwd(res, cot):
    pos_table, seq_ids = res
    valid = (seq_ids != 0)[..., None].astype(jnp.float32)
    summed = (cot.astype(jnp.float32) * valid).sum(axis=0)     # [L, D]
    dtable = jnp.zeros(pos_table.shape, jnp.float32)
    dtable = jax.lax.dynamic_update_slice(dtable, summed, (1, 0))
    return dtable.astype(pos_table.dtype), None


_positional_take.defvjp(_pt_fwd, _pt_bwd)


def attention_mask(seq_ids: jnp.ndarray, token_type: jnp.ndarray
                   ) -> jnp.ndarray:
    """[B, L, L] bool: causal (tril) ∧ key-not-padding
    (reference model.py:331-335 — keys masked where token_type == 0)."""
    L = seq_ids.shape[1]
    q = jax.lax.broadcasted_iota(jnp.int32, (L, L), 0)
    k = jax.lax.broadcasted_iota(jnp.int32, (L, L), 1)
    causal = (k <= q)[None]
    key_ok = (token_type != 0)[:, None, :]
    return jnp.logical_and(causal, key_ok)


def make_attention_cores(cfg: ModelConfig, token_type: jnp.ndarray,
                         mesh=None):
    """Select the attention inner-loop implementation.

    - ``mesh`` with a non-trivial ``seq`` axis -> sequence-parallel ring
      attention (parallel/ring_attention.py);
    - TPU backend with flash-worthy shapes -> fused Pallas kernels (ops/);
    - otherwise the dense XLA path (core=None).

    Returns (mha_core, hstu_core) or (None, None).
    """
    L = token_type.shape[1]
    if mesh is not None and mesh.shape.get("seq", 1) > 1:
        from ..parallel import ring_attention as RA

        valid = token_type != 0
        hd = cfg.hidden_units // cfg.num_heads

        def mha_core(q, k, v):
            return RA.ring_attention(mesh, q, k, v, valid)

        def hstu_core(q, k, v, rab):
            return RA.ring_hstu_attention(mesh, q, k, v, valid, rab,
                                          hd ** -0.5, seq_len=L)

        return mha_core, hstu_core
    # fused-kernel coverage: the whole-sequence variant up to L=1024, the
    # chunked-KV variant beyond that (VMEM flat in L — K/V stream in [128, D]
    # tiles); multi-chip runs shard L over the seq axis (ring attention).
    if cfg.use_flash_attention and 256 <= L and L % 128 == 0 \
            and jax.default_backend() == "tpu":
        from ..ops import hstu_attention as HK

        valid = token_type != 0

        def hstu_core(q, k, v, rab):
            return HK.hstu_attention_packed(q, k, v, valid, rab, seq_len=L,
                                            num_heads=cfg.num_heads)

        hstu_core.packed = True  # consumes [B, L, D], not [B, H, L, hd]

        mha_core = None
        # flash-MHA whole-seq VMEM budget, D-aware like the HSTU twin
        # (hstu_attention._use_long): the [L, D] whole-seq tiles scale
        # ~D*L against the probed D=64/L=1024 ceiling
        if L * max(cfg.hidden_units, 64) <= 1024 * 64:
            from ..ops import flash_attention as FA

            def mha_core(q, k, v):
                return FA.flash_mha(q, k, v, valid)

        return mha_core, hstu_core
    return None, None


def _fb_interpret() -> bool:
    """Interpret-mode fused-block kernels off-TPU: the product gate
    (fused_block_supported) requires backend == 'tpu', so this only fires
    in tests that monkeypatch the gate to validate fused wiring on the
    fake CPU mesh."""
    return jax.default_backend() != "tpu"


def encode(params: Mapping, fused_emb: jnp.ndarray, seq_ids: jnp.ndarray,
           token_type: jnp.ndarray, pos_table: jnp.ndarray,
           cfg: ModelConfig, train: bool = False,
           rng: Optional[jax.Array] = None, mesh=None,
           pp_microbatches: int = 8) -> jnp.ndarray:
    """fused_emb [B, L, D] (output of embedding.fuse_sequence) -> [B, L, D].

    With a mesh whose ``pipe`` axis is >1, the block stack runs as a
    ring-sharded GPipe schedule (parallel/pipeline_parallel.py) over
    ``pp_microbatches`` microbatches; otherwise a single lax.scan."""
    dtype = jnp.dtype(cfg.dtype)
    B, L, D = fused_emb.shape
    x = fused_emb.astype(dtype) * jnp.asarray(D ** 0.5, dtype)
    x = x + _positional_take(pos_table, seq_ids).astype(dtype)

    use_dropout = train and cfg.dropout_rate > 0.0 and rng is not None
    if use_dropout:
        rng, ekey = jax.random.split(rng)
        keep = jax.random.bernoulli(ekey, 1.0 - cfg.dropout_rate, x.shape)
        x = x * keep / (1.0 - cfg.dropout_rate)
    block_keys = (jax.random.split(rng, (cfg.num_blocks, 2)) if use_dropout
                  else jnp.zeros((cfg.num_blocks, 2), jnp.uint32))

    def run_block(x, bp, keys, mask, mha_core, hstu_core):
        ka = keys[0] if use_dropout else None
        kf = keys[1] if use_dropout else None
        if cfg.block_type == "hstu":
            # HSTU block is pre-norm by design: x + block(LN(x))
            h = layernorm(_cast_ln(bp["attn_ln"], dtype), x)
            x = x + hstu_block(bp["hstu"], h, mask, cfg.num_heads,
                               cfg.dropout_rate, train, ka, core=hstu_core)
            h = layernorm(_cast_ln(bp["ffn_ln"], dtype), x)
            x = x + ffn(bp["ffn"], h, cfg, train, kf)
        elif cfg.norm_first:
            h = layernorm(_cast_ln(bp["attn_ln"], dtype), x)
            x = x + mha(bp["attn"], h, mask, cfg.num_heads,
                        cfg.dropout_rate, train, ka, core=mha_core)
            h = layernorm(_cast_ln(bp["ffn_ln"], dtype), x)
            x = x + ffn(bp["ffn"], h, cfg, train, kf)
        else:  # post-LN (reference default wiring, model.py:343-346)
            a = mha(bp["attn"], x, mask, cfg.num_heads,
                    cfg.dropout_rate, train, ka, core=mha_core)
            x = layernorm(_cast_ln(bp["attn_ln"], dtype), x + a)
            f = ffn(bp["ffn"], x, cfg, train, kf)
            x = layernorm(_cast_ln(bp["ffn_ln"], dtype), x + f)
        return x

    # rematerialize block internals in backward EXCEPT the fused attention
    # output ("hstu_av", named in models/hstu.py): uvqk/FFN recompute is one
    # cheap matmul each, but re-running the attention kernel costs real wall
    # clock; saving av is 16MB/block
    remat = (lambda f: jax.checkpoint(
        f, policy=jax.checkpoint_policies.save_only_these_names("hstu_av"))
        ) if cfg.remat_blocks and train else (lambda f: f)

    if mesh is not None and mesh.shape.get("pipe", 1) > 1:
        # ring-sharded GPipe: token_type rides the conveyor with the hidden
        # states so each stage rebuilds its mask / fused-kernel closure from
        # its resident microbatch
        from ..ops.fused_block import fused_block_supported, fused_hstu_block
        from ..parallel.pipeline_parallel import pipelined_scan

        S = mesh.shape["pipe"]
        assert cfg.num_blocks % S == 0, \
            f"num_blocks {cfg.num_blocks} not divisible by pipe stages {S}"

        # fused whole-block kernel inside each pipeline stage: valid when the
        # stage itself isn't sharded over seq/model (block weights and the
        # microbatch's full L are stage-local). Round-4 lift of the
        # "fused block turns off whenever pipe > 1" gate (VERDICT r3 item 2).
        pp_fused = (all(mesh.shape.get(ax, 1) == 1 for ax in ("seq", "model"))
                    and fused_block_supported(cfg, L, jax.default_backend()))

        def pp_block_body(act, scanned):
            bp, keys = scanned
            xa, tt = act["x"], act["tt"]
            if use_dropout:
                # ADVICE r4: fold the microbatch id (riding the conveyor —
                # rows of a microbatch share it) into the per-block keys.
                # Without it every microbatch reuses the block's key and the
                # kernel PRNG seeds by in-microbatch row index, so row i of
                # every microbatch draws an identical dropout mask.
                mb = act["mb"][0]
                keys = (jax.random.fold_in(keys[0], mb),
                        jax.random.fold_in(keys[1], mb))
            if pp_fused:
                seed = (jax.random.randint(keys[0], (), 0, 2 ** 31 - 1,
                                           dtype=jnp.int32)
                        if use_dropout else jnp.int32(0))
                x2 = fused_hstu_block(xa, bp, tt, seed, cfg.num_heads,
                                      cfg.dropout_rate, use_dropout,
                                      interpret=_fb_interpret())
                return dict(act, x=x2)
            mha_c, hstu_c = make_attention_cores(cfg, tt, mesh=None)
            need_mask = (cfg.block_type == "hstu" and hstu_c is None) or \
                (cfg.block_type != "hstu" and mha_c is None)
            m = attention_mask(tt, tt) if need_mask else None
            return dict(act, x=run_block(xa, bp, keys, m, mha_c, hstu_c))

        data_axis = "data" if mesh.shape.get("data", 1) > 1 else None
        # the fused kernel is its own custom_vjp with in-kernel remat —
        # wrapping it in jax.checkpoint would re-run the forward kernel
        pp_body = pp_block_body if pp_fused else remat(pp_block_body)
        act0 = {"x": x, "tt": token_type}
        if use_dropout:
            act0["mb"] = (jnp.arange(B, dtype=jnp.int32)
                          * pp_microbatches) // B
        out = pipelined_scan(mesh, "pipe", pp_body,
                             (params["blocks"], block_keys),
                             act0,
                             num_microbatches=pp_microbatches,
                             data_axis=data_axis)
        return layernorm(_cast_ln(params["last_ln"], dtype), out["x"])

    # per-shard FUSED blocks on seq-sharded (ring) meshes: pre/attention/
    # post Pallas stages on each [B, D, L/S] shard with K/V rotating
    # between attention pairs (parallel/ring_fused.py) — the long-context
    # multi-chip configs no longer fall back to the unfused ~4%-MFU path
    if (mesh is not None and mesh.shape.get("seq", 1) > 1
            and all(mesh.shape.get(ax, 1) == 1 for ax in ("pipe", "model"))):
        from ..ops.fused_block import ring_fused_supported

        if ring_fused_supported(cfg, L, mesh.shape["seq"],
                                jax.default_backend()):
            from ..parallel.ring_fused import ring_fused_encode

            seeds = (jax.random.randint(rng, (cfg.num_blocks,), 0,
                                        2 ** 31 - 1, dtype=jnp.int32)
                     if use_dropout
                     else jnp.zeros((cfg.num_blocks,), jnp.int32))
            x = ring_fused_encode(mesh, params["blocks"], x, token_type,
                                  seeds, cfg, use_dropout,
                                  interpret=_fb_interpret())
            return layernorm(_cast_ln(params["last_ln"], dtype), x)

    # fully-fused whole-block kernel (ops/fused_block.py): the entire HSTU
    # block (LNs, projections, attention stripes, gating, dropout, SwiGLU
    # FFN, residuals) runs on VMEM-resident data — removes the ~60 ms of
    # unfused VPU elementwise the round-2 roofline identified. The kernel is
    # its own custom_vjp with in-kernel rematerialization, so the outer
    # jax.checkpoint wrapper is skipped (it would re-run the forward kernel).
    from ..ops.fused_block import fused_block_supported

    mesh_trivial = mesh is None or all(
        mesh.shape.get(ax, 1) == 1 for ax in ("seq", "pipe", "model"))
    if mesh_trivial and fused_block_supported(
            cfg, L, jax.default_backend()):
        from ..ops.fused_block import fused_hstu_block_t

        seeds = (jax.random.randint(rng, (cfg.num_blocks,), 0, 2 ** 31 - 1,
                                    dtype=jnp.int32)
                 if use_dropout else jnp.zeros((cfg.num_blocks,), jnp.int32))

        def fused_body(xt, scanned):
            bp, sd = scanned
            return fused_hstu_block_t(xt, bp, token_type, sd, cfg.num_heads,
                                      cfg.dropout_rate, use_dropout,
                                      interpret=_fb_interpret()), None

        # the kernel runs on [B, D, L] activations (full VREG lanes at
        # D=64 — see ops/fused_block.py); transpose ONCE around the whole
        # block chain, not per block
        xt = jnp.swapaxes(x, 1, 2)
        xt, _ = jax.lax.scan(fused_body, xt, (params["blocks"], seeds))
        x = jnp.swapaxes(xt, 1, 2)
        return layernorm(_cast_ln(params["last_ln"], dtype), x)

    mha_core, hstu_core = make_attention_cores(cfg, token_type, mesh)
    # the dense path needs the [B, L, L] mask; fused/ring cores build their
    # masking internally from token_type
    need_dense_mask = (cfg.block_type == "hstu" and hstu_core is None) or \
        (cfg.block_type != "hstu" and mha_core is None)
    mask = attention_mask(seq_ids, token_type) if need_dense_mask else None

    def block_body(x, scanned):
        bp, keys = scanned
        return run_block(x, bp, keys, mask, mha_core, hstu_core), None

    x, _ = jax.lax.scan(remat(block_body), x,
                        (params["blocks"], block_keys))
    return layernorm(_cast_ln(params["last_ln"], dtype), x)


def _cast_ln(p, dtype):
    return {"scale": p["scale"].astype(dtype), "bias": p["bias"].astype(dtype)}
