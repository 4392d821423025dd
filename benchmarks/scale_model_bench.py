"""Scale-model full-train-step bench: the flagship pipeline at larger D.

BASELINE.md's round-5 roofline concludes the flagship's 0.0635 MFU is the
MODEL's ceiling (D=64 fills half the MXU contraction depth; per-token VPU
machinery dominates), and claims "the framework's ceiling rises with the
model". This bench substantiates that claim with measurements: the same
train step (fused HSTU blocks, bf16, rbg PRNG, tower dedup off so the
FLOP model is exact) at D in {64, 128, 256}.

Usage: python benchmarks/scale_model_bench.py [D] [H] [B] [L]
Defaults: D=256 H=2 B=64 L=1024.

MFU accounting matches bench.py: XLA cost_analysis (which excludes Pallas
kernel bodies) + analytic attention-kernel FLOPs (causal (q,k) pairs,
QK+AV fwd, ~2x bwd).
"""
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import numpy as np


def main():
    D = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    H = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    B = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    L = int(sys.argv[4]) if len(sys.argv) > 4 else 1024

    import jax
    root = Path(__file__).resolve().parents[1]
    jax.config.update("jax_compilation_cache_dir", str(root / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_default_prng_impl", "rbg")

    import __graft_entry__ as G
    from tencent_recommendation_2025_tpu.config import MeshConfig
    from tencent_recommendation_2025_tpu.parallel import mesh as M
    from tencent_recommendation_2025_tpu.parallel import train as PT

    cfg, schema, fused, model = G._make_synthetic_setup(
        maxlen=L - 1, hidden=D, num_blocks=8, num_heads=H,
        block_type="hstu", itemnum=100_000, usernum=10_000)
    rng = np.random.default_rng(0)
    batch = G._make_batch(rng, B, L, schema, model.itemnum, model.usernum)
    tables = G._make_tables(rng, model.itemnum, schema)
    mesh = M.build_mesh(MeshConfig(data=jax.device_count()))
    state, tx = PT.init_sharded_state(model, cfg, mesh)
    batch = PT.shard_batch(mesh, batch)
    tables = PT.shard_tables(mesh, tables)
    step = PT.make_sharded_train_step(model, tx, cfg, mesh)
    key = jax.random.key(0)
    for _ in range(6):
        state, m = step(state, batch, tables["mm"], tables, key)
    jax.block_until_ready(m["loss"])

    def timed(n):
        nonlocal state
        t0 = time.perf_counter()
        for _ in range(n):
            state, m = step(state, batch, tables["mm"], tables, key)
        jax.block_until_ready(m["loss"])
        return time.perf_counter() - t0

    a, b = timed(4), timed(14)
    dt = (b - a) / 10

    flops = 0.0
    try:
        an = step.lower(state, batch, tables["mm"], tables,
                        key).compile().cost_analysis()
        if isinstance(an, list):
            an = an[0]
        flops = float(an.get("flops", 0.0))
    except Exception:
        pass
    hd, blocks = D // H, 8
    pairs = L * (L + 1) / 2 * B
    attn_flops = pairs * H * (2 * 2 * hd) * blocks * 3  # fwd + ~2x bwd
    total = flops + attn_flops
    peak = 197e12  # v5e bf16
    mfu = total / dt / (peak * jax.device_count())
    print(json.dumps({
        "metric": f"scale_model_D{D}_train_step",
        "value": round(B / dt / jax.device_count(), 1),
        "unit": "examples/s/chip",
        "step_ms": round(dt * 1e3, 1), "mfu": round(mfu, 4),
        "step_flops_g": round(total / 1e9, 1),
        "D": D, "H": H, "B": B, "L": L,
        "vs_baseline": round(mfu / 0.0635, 2),  # flagship D=64 MFU
    }), flush=True)


main()
