"""Kernel-only timing of the fused HSTU attention at flagship shapes.

Axon measurement discipline (BASELINE.md): a single dispatch costs
~30-40 ms of tunnel latency, so the iteration loop must run INSIDE one jit
(lax.fori_loop with the output chained into the next input); wall-clock is
then slope-timed over two iteration counts and only a scalar is fetched.

Prints one JSON line per (variant, dtype) with ms/call and effective
TFLOP/s against the causal-pair FLOP model.
"""

import json
import sys
import time
from functools import partial
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

    from tencent_recommendation_2025_tpu.ops import hstu_attention as HK

    B, L, D = 128, 1024, 64
    rng = np.random.default_rng(0)
    valid = jnp.asarray(np.ones((B, L), bool))

    def bench(name, dtype, grad, H):
        hd = D // H
        rab = jnp.asarray(
            rng.standard_normal((H, 128)).astype(np.float32) * 0.1)
        # causal-pair FLOPs: QK + AV = 2*(2*hd) per (q,k,h) pair — scales
        # with D = H*hd, so every H value below does IDENTICAL total FLOPs
        pairs = L * (L + 1) / 2 * B * H
        fwd_flops = pairs * 2 * 2 * hd
        bwd_flops = fwd_flops * 2.5  # 5 matmuls in bwd vs 2 in fwd
        q0 = jnp.asarray(rng.standard_normal((B, L, D)), dtype) * 0.3
        k0 = jnp.asarray(rng.standard_normal((B, L, D)), dtype) * 0.3
        v0 = jnp.asarray(rng.standard_normal((B, L, D)), dtype) * 0.3

        if grad:
            def g(q, k, v, rab):
                return (HK.hstu_attention_packed(
                    q, k, v, valid, rab, seq_len=L, num_heads=H)
                    .astype(jnp.float32) ** 2).sum()

            def one(_, carry):
                q, k, v = carry
                dq, dk, dv = jax.grad(g, argnums=(0, 1, 2))(q, k, v, rab)
                return (q + dq.astype(dtype) * 1e-6,
                        k + dk.astype(dtype) * 1e-6,
                        v + dv.astype(dtype) * 1e-6)

            @partial(jax.jit, static_argnums=0)
            def run(iters, q, k, v):
                q, k, v = jax.lax.fori_loop(0, iters, one, (q, k, v))
                return q.astype(jnp.float32).sum()

            fl = fwd_flops * 2 + bwd_flops  # grad = fwd + recompute + bwd
        else:
            def one(_, q):
                o = HK.hstu_attention_packed(q, k0, v0, valid, rab,
                                             seq_len=L, num_heads=H)
                return o.astype(dtype)  # chain: output feeds next q

            @partial(jax.jit, static_argnums=0)
            def run(iters, q, k, v):
                return jax.lax.fori_loop(0, iters, one, q) \
                    .astype(jnp.float32).sum()

            fl = fwd_flops

        def timed(iters):
            float(run(iters, q0, k0, v0))  # warm (compile both counts first)
            t0 = time.perf_counter()
            float(run(iters, q0, k0, v0))
            return time.perf_counter() - t0

        n1, n2 = 4, (24 if grad else 64)  # slope window >> tunnel jitter
        timed(n1), timed(n2)  # ensure caches hot
        dt = (timed(n2) - timed(n1)) / (n2 - n1)
        print(json.dumps({"bench": name, "H": H,
                          "ms": round(dt * 1000, 2),
                          "tflops_eff": round(fl / dt / 1e12, 2)}),
              flush=True)

    heads = [int(h) for h in (sys.argv[1:] or ["4", "2", "1"])]
    for H in heads:
        for name, dtype, grad in (("fwd_bf16", jnp.bfloat16, False),
                                  ("fwdbwd_bf16", jnp.bfloat16, True)):
            try:
                bench(name, dtype, grad, H)
            except Exception as e:  # f32 bwd exceeds scoped VMEM at L=1024
                print(json.dumps({"bench": name, "H": H,
                                  "error": str(e).split("\n")[0][:160]}),
                      flush=True)


if __name__ == "__main__":
    main()
