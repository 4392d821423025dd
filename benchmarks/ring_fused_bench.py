"""Single-chip perf proxy for the ring-fused seq-parallel block (round 5).

Real multi-chip hardware is unavailable here, so this measures the PER-
DEVICE compute of one HSTU block under an S=2 ring at global L = 2 * Lc,
simulating the heavier device (si=1, which attends to both kv shards):

- FUSED:   ring_pre_proj -> 2x ring_pair_attn (token offsets Lc and 0) ->
           ring_post_gate (parallel/ring_fused.py's per-shard pipeline;
           the ppermute hop is not measurable on one chip and is the same
           [B, D, Lc] payload either way);
- UNFUSED: the previous product path for seq>1 meshes — dense XLA
           elementwise (LN/gate/FFN via models/hstu.hstu_block) around the
           ring attention einsums (parallel/ring_attention.py's local body),
           under jax.checkpoint like the unfused encoder.

Prints one JSON line per variant (fwd+bwd, slope-timed) plus the ratio.
"""

import functools
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    cache = Path(__file__).resolve().parents[1] / ".jax_cache"
    try:
        jax.config.update("jax_compilation_cache_dir", str(cache))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    jax.config.update("jax_default_prng_impl", "rbg")

    from tencent_recommendation_2025_tpu.config import ModelConfig
    from tencent_recommendation_2025_tpu.models import encoder as ENC
    from tencent_recommendation_2025_tpu.models.embedding import layernorm
    from tencent_recommendation_2025_tpu.models.hstu import hstu_block
    from tencent_recommendation_2025_tpu.ops import fused_block as FB

    B, D, H, Lc, S = 32, 64, 1, 2048, 2
    L = Lc * S
    cdt = jnp.bfloat16
    cfg = ModelConfig(hidden_units=D, num_heads=H, block_type="hstu",
                      ffn_type="swiglu", dtype="bfloat16",
                      dropout_rate=0.0, reference_init=False)
    bp = ENC.init_block_params(jax.random.key(0), cfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, Lc, D)) * 0.1, cdt)
    tt = np.ones((B, Lc), np.int32)
    tt[:, :5] = 0
    tt = jnp.asarray(tt)
    valid3 = (tt != 0).astype(jnp.int32)[:, :, None]
    cot = jnp.asarray(rng.standard_normal((B, Lc, D)), cdt)

    # ---- fused per-shard pipeline (device si=1 of the S=2 ring) ----------
    def fused_block(xt, bp):
        rab, lnt, wuvqk, buvqkt, wo, bot, w13, w2 = FB._block_operands(
            bp, cdt)
        q, k, v, u = FB.ring_pre_proj(xt, lnt, wuvqk, buvqkt, L, H, False)
        acc = FB.ring_pair_attn(q, k, v, valid3, rab,
                                jnp.int32(Lc), H, False)
        acc = acc + FB.ring_pair_attn(q, k, v, valid3, rab,
                                      jnp.int32(0), H, False)
        return FB.ring_post_gate(xt, acc.astype(cdt), u, lnt, wuvqk,
                                 buvqkt, wo, bot, w13, w2, jnp.int32(0),
                                 L, H, 0.0, False, False)

    @jax.jit
    def fused_step(x, bp):
        def f(x, bp):
            xt = jnp.swapaxes(x, 1, 2)
            out = jnp.swapaxes(fused_block(xt, bp), 1, 2)
            return jnp.sum(out.astype(jnp.float32)
                           * cot.astype(jnp.float32))

        l, (gx, gp) = jax.value_and_grad(f, argnums=(0, 1))(x, bp)
        return l, gx

    # ---- unfused per-shard body (the previous seq>1 product path) --------
    f32 = jnp.float32
    scale = (D // H) ** -0.5
    buckets = cfg.hstu_rel_pos_buckets
    iota = jnp.arange(Lc)

    def ring_core(q, k, v, rab):
        # parallel/ring_attention.ring_hstu_attention's local loop body for
        # si=1: kv shards src=1 (diagonal) then src=0 (full lower block)
        q_pos = Lc + iota
        ok = (tt != 0)
        acc = jnp.zeros(q.shape, f32)
        for src in (1, 0):
            k_pos = src * Lc + iota
            s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                           preferred_element_type=f32) * scale
            dist = jnp.clip(q_pos[:, None] - k_pos[None, :], 0, buckets - 1)
            s = s + jnp.take(rab, dist, axis=-1)[None]
            mask = (q_pos[:, None] >= k_pos[None, :])[None] \
                & ok[:, None, :]
            a = jax.nn.silu(s) * mask[:, None].astype(f32) / float(L)
            acc = acc + jnp.einsum("bhqk,bhkd->bhqd", a, v.astype(f32))
        return acc.astype(q.dtype)

    def unfused_block(x, bp):
        h = layernorm({k: v.astype(cdt) for k, v in bp["attn_ln"].items()},
                      x)
        x = x + hstu_block(bp["hstu"], h, None, H, core=ring_core)
        h = layernorm({k: v.astype(cdt) for k, v in bp["ffn_ln"].items()},
                      x)
        return x + ENC.ffn(bp["ffn"], h, cfg)

    @jax.jit
    def unfused_step(x, bp):
        def f(x, bp):
            out = jax.checkpoint(unfused_block)(x, bp)
            return jnp.sum(out.astype(jnp.float32)
                           * cot.astype(jnp.float32))

        l, (gx, gp) = jax.value_and_grad(f, argnums=(0, 1))(x, bp)
        return l, gx

    def slope(step):
        out = None
        for _ in range(6):
            out = step(x, bp)
        float(out[0])
        t0 = time.perf_counter()
        for _ in range(4):
            out = step(x, bp)
        float(out[0])
        t_small = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(14):
            out = step(x, bp)
        float(out[0])
        return (time.perf_counter() - t0 - t_small) / 10

    # HW numerics: both variants compute the SAME per-shard math — pin the
    # ring kernels' on-hardware forward against the XLA oracle (bf16 band)
    out_f = jnp.swapaxes(fused_block(jnp.swapaxes(x, 1, 2), bp), 1, 2)
    out_u = unfused_block(x, bp)
    err = float(jnp.max(jnp.abs(out_f.astype(f32) - out_u.astype(f32)))
                / (jnp.max(jnp.abs(out_u.astype(f32))) + 1e-9))
    print(json.dumps({"metric": "ring_fused_hw_fwd_rel_err",
                      "value": round(err, 5)}), flush=True)
    assert err < 3e-2, f"ring-fused HW forward mismatch: rel err {err}"

    t_unfused = slope(unfused_step)
    t_fused = slope(fused_step)
    for name, t in (("unfused", t_unfused), ("fused", t_fused)):
        print(json.dumps({
            "metric": f"ring_shard_block_{name}_fwdbwd",
            "value": round(t * 1e3, 3), "unit": "ms",
            "B": B, "Lc": Lc, "S": S, "L_global": L,
        }), flush=True)
    print(json.dumps({
        "metric": "ring_fused_speedup_vs_unfused",
        "value": round(t_unfused / t_fused, 3), "unit": "x",
        "tokens_per_s_per_chip_fused_8blk":
            round(B * Lc / (8 * t_fused)),
        "tokens_per_s_per_chip_unfused_8blk":
            round(B * Lc / (8 * t_unfused)),
    }), flush=True)


if __name__ == "__main__":
    main()
