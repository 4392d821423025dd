"""A/B microbench for the fused whole-block HSTU kernel (ops/fused_block.py)
at flagship shapes — the round-4 MXU-fill work needs per-variant numbers.

Times ONE block's forward and forward+backward (grad wrt x and params),
slope-timed with scalar fetches (axon discipline, see BASELINE.md). Prints
one JSON line per stage plus the derived effective TFLOP/s for the
attention-stripe math so kernel variants can be compared directly.

Usage:  python benchmarks/fused_block_bench.py [B] [L] [H]
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def timeit(fn, args, iters=10, warmup=6):
    import jax

    def fetch(out):
        np.asarray(jax.tree.leaves(out)[0]).ravel()[0]

    out = None
    for _ in range(warmup):
        out = fn(*args)
    fetch(out)
    t0 = time.perf_counter()
    for _ in range(4):
        out = fn(*args)
    fetch(out)
    t_small = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(4 + iters):
        out = fn(*args)
    fetch(out)
    return (time.perf_counter() - t0 - t_small) / iters


def main():
    import jax
    import jax.numpy as jnp

    cache_dir = Path(__file__).resolve().parents[1] / ".jax_cache"
    try:
        jax.config.update("jax_compilation_cache_dir", str(cache_dir))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    jax.config.update("jax_default_prng_impl", "rbg")

    from tencent_recommendation_2025_tpu.config import ModelConfig
    from tencent_recommendation_2025_tpu.models import encoder as ENC
    from tencent_recommendation_2025_tpu.ops import fused_block as FB

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    L = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    H = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    D = 64
    cfg = ModelConfig(hidden_units=D, num_heads=H, block_type="hstu",
                      ffn_type="swiglu", hstu_rel_pos_buckets=128,
                      dtype="bfloat16", dropout_rate=0.01,
                      reference_init=False)
    params = ENC.init_block_params(jax.random.key(0), cfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, L, D)) * 0.5, jnp.bfloat16)
    tt = np.ones((B, L), np.int32)
    tt[:, :7] = 0
    tt = jnp.asarray(tt)
    seed = jnp.int32(123)

    @jax.jit
    def fwd(x, params):
        out = FB.fused_hstu_block(x, params, tt, seed, cfg.num_heads,
                                  cfg.dropout_rate, train=True)
        return out.astype(jnp.float32).sum()

    @jax.jit
    def grad(x, params):
        def f(x, p):
            out = FB.fused_hstu_block(x, p, tt, seed, cfg.num_heads,
                                      cfg.dropout_rate, train=True)
            return out.astype(jnp.float32).sum()
        gx, gp = jax.grad(f, argnums=(0, 1))(x, params)
        return gx.astype(jnp.float32).sum() + gp["hstu"]["rab"].sum()

    t_fwd = timeit(fwd, (x, params))
    t_grad = timeit(grad, (x, params))

    # attention stripe FLOPs (s + av, causal): 2 matmuls * 2 FLOP/MAC
    attn_flops_fwd = 2 * 2 * B * (L * (L + FB.FB_BLK) // 2) * D
    # bwd re-does s and adds dv/da/dq/dk (5 stripe matmuls) on top of fwd
    attn_flops_bwd = attn_flops_fwd * 5 / 2
    out = {
        "B": B, "L": L, "H": H,
        "fwd_ms": round(t_fwd * 1e3, 3),
        "grad_ms": round(t_grad * 1e3, 3),
        "bwd_ms": round((t_grad - t_fwd) * 1e3, 3),
        "attn_tflops_fwd_upper": round(attn_flops_fwd / t_fwd / 1e12, 1),
        "full_step_equiv_8blk_ms": round(t_grad * 8 * 1e3, 1),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
