"""Real-TPU validation of the Pallas kernels (CLAUDE.md requires a HW run
before relying on them; interpret-mode tests cover numerics on CPU).

Checks, each vs the dense XLA oracle on-chip:
1. chunked-KV HSTU kernel at L=4096 (fwd + grads) — the long-L variant;
2. flash softmax-MHA at L=1024 (fwd + grads);
3. whole-seq HSTU at L=1024 (regression guard).

Prints one JSON line per check with max relative error and timing.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def rel_err(a, b):
    a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
    denom = np.maximum(np.abs(b).max(), 1e-6)
    return float(np.abs(a - b).max() / denom)


def main():
    import jax
    import jax.numpy as jnp

    cache = Path(__file__).resolve().parents[1] / ".jax_cache"
    try:
        jax.config.update("jax_compilation_cache_dir", str(cache))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from tencent_recommendation_2025_tpu.ops import flash_attention as FA
    from tencent_recommendation_2025_tpu.ops import hstu_attention as HK

    rng = np.random.default_rng(0)

    def inputs(B, H, L, hd):
        q = jnp.asarray(rng.standard_normal((B, H, L, hd)) * 0.5, jnp.float32)
        k = jnp.asarray(rng.standard_normal((B, H, L, hd)) * 0.5, jnp.float32)
        v = jnp.asarray(rng.standard_normal((B, H, L, hd)) * 0.5, jnp.float32)
        rab = jnp.asarray(rng.standard_normal((H, 128)) * 0.1, jnp.float32)
        valid = np.ones((B, L), bool)
        valid[0, : L // 8] = False
        return q, k, v, jnp.asarray(valid), rab

    def check_hstu(name, B, H, L, hd, dtype=None):
        q, k, v, valid, rab = inputs(B, H, L, hd)
        cot = jnp.asarray(rng.standard_normal(q.shape) * 0.1, jnp.float32)
        ftol, gtol = (2e-3, 5e-3) if dtype is None else (3e-2, 5e-2)

        def cast(t):
            return t if dtype is None else t.astype(dtype)

        def f_kernel(q, k, v, rab):
            out = HK.hstu_attention(cast(q), cast(k), cast(v), valid, rab,
                                    seq_len=L).astype(jnp.float32)
            return (out * cot).sum()

        def f_oracle(q, k, v, rab):
            return (HK.hstu_attention_oracle(q, k, v, valid, rab,
                                             seq_len=L) * cot).sum()

        out = jax.jit(lambda *a: HK.hstu_attention(
            cast(a[0]), cast(a[1]), cast(a[2]), valid, rab,
            seq_len=L))(q, k, v)
        ref = jax.jit(lambda *a: HK.hstu_attention_oracle(
            *a, valid, rab, seq_len=L))(q, k, v)
        fwd_err = rel_err(out, ref)
        gk = jax.jit(jax.grad(f_kernel, argnums=(0, 1, 2, 3)))(q, k, v, rab)
        go = jax.jit(jax.grad(f_oracle, argnums=(0, 1, 2, 3)))(q, k, v, rab)
        gerr = max(rel_err(a, b) for a, b in zip(gk, go))
        t0 = time.perf_counter()
        for _ in range(5):
            s = jax.jit(f_kernel)(q, k, v, rab)
        float(s)
        dt = (time.perf_counter() - t0) / 5
        print(json.dumps({"check": name, "fwd_rel_err": round(fwd_err, 6),
                          "grad_rel_err": round(gerr, 6),
                          "fwd_ms": round(dt * 1000, 1),
                          "ok": bool(fwd_err < ftol and gerr < gtol)}),
              flush=True)

    # 1) chunked-KV long variant at L=4096 (MAX_WHOLESEQ_L=1024 routes it)
    check_hstu("hstu_chunked_L4096", B=2, H=4, L=4096, hd=16)
    # 3) whole-seq regression at L=1024
    check_hstu("hstu_wholeseq_L1024", B=4, H=4, L=1024, hd=16)
    # bf16 product-path variants (matmuls run single-pass bf16 on the MXU)
    check_hstu("hstu_wholeseq_L1024_bf16", B=4, H=4, L=1024, hd=16,
               dtype=jnp.bfloat16)
    check_hstu("hstu_chunked_L4096_bf16", B=2, H=4, L=4096, hd=16,
               dtype=jnp.bfloat16)

    # 4) fused whole-block kernel (ops/fused_block.py) vs the XLA block
    from tencent_recommendation_2025_tpu.config import ModelConfig
    from tencent_recommendation_2025_tpu.models import encoder as ENC
    from tencent_recommendation_2025_tpu.models.embedding import layernorm
    from tencent_recommendation_2025_tpu.models.hstu import hstu_block
    from tencent_recommendation_2025_tpu.ops import fused_block as FB

    def check_fused_block(name, B, L, D, H, dtype):
        cfg = ModelConfig(hidden_units=D, num_heads=H, block_type="hstu",
                          ffn_type="swiglu", dtype="float32",
                          dropout_rate=0.0, reference_init=False)
        params = ENC.init_block_params(jax.random.key(7), cfg)
        x = jnp.asarray(rng.standard_normal((B, L, D)) * 0.5, jnp.float32)
        tt = np.ones((B, L), np.int32)
        tt[0, : L // 8] = 0
        tt = jnp.asarray(tt)
        cot = jnp.asarray(rng.standard_normal((B, L, D)) * 0.1, jnp.float32)
        ftol, gtol = (2e-3, 5e-3) if dtype == jnp.float32 else (3e-2, 8e-2)

        def oracle(x, params):
            mask = ENC.attention_mask(tt, tt)
            o = x + hstu_block(params["hstu"], layernorm(params["attn_ln"], x),
                               mask, H)
            return o + ENC.ffn(params["ffn"], layernorm(params["ffn_ln"], o),
                               cfg)

        def f_fused(x, params):
            out = FB.fused_hstu_block(x.astype(dtype), params, tt,
                                      jnp.int32(0), H).astype(jnp.float32)
            return (out * cot).sum()

        def f_oracle(x, params):
            return (oracle(x, params) * cot).sum()

        out = jax.jit(lambda x, p: FB.fused_hstu_block(
            x.astype(dtype), p, tt, jnp.int32(0), H))(x, params)
        ref = jax.jit(oracle)(x, params)
        fwd_err = rel_err(out, ref)
        gf = jax.jit(jax.grad(f_fused, argnums=(0, 1)))(x, params)
        go = jax.jit(jax.grad(f_oracle, argnums=(0, 1)))(x, params)
        gerr = max(rel_err(a, b) for a, b in
                   zip(jax.tree.leaves(gf), jax.tree.leaves(go)))
        print(json.dumps({"check": name, "fwd_rel_err": round(fwd_err, 6),
                          "grad_rel_err": round(gerr, 6),
                          "ok": bool(fwd_err < ftol and gerr < gtol)}),
              flush=True)

    check_fused_block("fused_block_L1024_f32", B=4, L=1024, D=64, H=1,
                      dtype=jnp.float32)
    check_fused_block("fused_block_L1024_bf16", B=4, L=1024, D=64, H=1,
                      dtype=jnp.bfloat16)
    check_fused_block("fused_block_L256_H4_bf16", B=2, L=256, D=64, H=4,
                      dtype=jnp.bfloat16)
    # round-4 CHUNKED variant (L > FB_WHOLESEQ_MAX routes the staged
    # grid-dim pipeline — fwd pre/attn/post, bwd gate/dq/dkdv/proj)
    check_fused_block("fused_block_chunked_L2048_f32", B=2, L=2048, D=64,
                      H=1, dtype=jnp.float32)
    check_fused_block("fused_block_chunked_L2048_bf16", B=2, L=2048, D=64,
                      H=1, dtype=jnp.bfloat16)

    # 5) in-kernel dropout PRNG: deterministic per seed, distinct across
    # seeds, backward regenerates the identical mask (grad of a linear
    # function through dropout equals the mask pattern applied to cot)
    cfgd = ModelConfig(hidden_units=64, num_heads=1, block_type="hstu",
                       ffn_type="swiglu", dtype="float32",
                       dropout_rate=0.5, reference_init=False)
    pd = ENC.init_block_params(jax.random.key(3), cfgd)
    xd = jnp.asarray(rng.standard_normal((2, 256, 64)) * 0.5, jnp.float32)
    ttd = jnp.asarray(np.ones((2, 256), np.int32))

    def run_drop(seed):
        return jax.jit(lambda x, p: FB.fused_hstu_block(
            x, p, ttd, jnp.int32(seed), 1, dropout_rate=0.5,
            train=True))(xd, pd)

    o1, o2, o3 = run_drop(42), run_drop(42), run_drop(43)
    det = bool(np.array_equal(np.asarray(o1), np.asarray(o2)))
    diff = not np.allclose(np.asarray(o1), np.asarray(o3))
    print(json.dumps({"check": "fused_block_dropout_prng",
                      "deterministic": det, "seed_sensitive": bool(diff),
                      "ok": bool(det and diff)}), flush=True)

    # 2) flash MHA at L=1024
    q, k, v, valid, _ = inputs(2, 4, 1024, 16)
    cot = jnp.asarray(rng.standard_normal(q.shape) * 0.1, jnp.float32)
    from tencent_recommendation_2025_tpu.models.attention import (
        safe_masked_softmax)

    def mha_oracle(q, k, v):
        B, H, L, hd = q.shape
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                       preferred_element_type=jnp.float32) * (hd ** -0.5)
        iq = jax.lax.broadcasted_iota(jnp.int32, (L, L), 0)
        ik = jax.lax.broadcasted_iota(jnp.int32, (L, L), 1)
        mask = (iq >= ik)[None] & (valid != 0)[:, None, :]
        p = safe_masked_softmax(s, mask[:, None])
        return jnp.einsum("bhqk,bhkd->bhqd", p, v.astype(jnp.float32))

    def f_k(q, k, v):
        return (FA.flash_mha(q, k, v, valid) * cot).sum()

    def f_o(q, k, v):
        return (mha_oracle(q, k, v) * cot).sum()

    out = jax.jit(lambda *a: FA.flash_mha(*a, valid))(q, k, v)
    ref = jax.jit(mha_oracle)(q, k, v)
    fwd_err = rel_err(out, ref)
    gk = jax.jit(jax.grad(f_k, argnums=(0, 1, 2)))(q, k, v)
    go = jax.jit(jax.grad(f_o, argnums=(0, 1, 2)))(q, k, v)
    gerr = max(rel_err(a, b) for a, b in zip(gk, go))
    print(json.dumps({"check": "flash_mha_L1024",
                      "fwd_rel_err": round(fwd_err, 6),
                      "grad_rel_err": round(gerr, 6),
                      "ok": bool(fwd_err < 2e-3 and gerr < 5e-3)}),
          flush=True)


if __name__ == "__main__":
    main()
