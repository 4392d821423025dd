"""EP lookup A/B (VERDICT r2 item 3): explicit all-to-all vs explicit
all-gather+psum_scatter vs XLA default SPMD, on the 8-device CPU mesh.

CPU wall time does not model ICI, but the COLLECTIVE STRUCTURE of the
compiled program does: this script compiles forward and grad of each
variant and reports every collective op with its payload bytes, plus
indicative wall time. Decision criteria: collective bytes per step (the
ICI cost) and whether XLA's default choice degenerates (full-table
all-gather or full-payload all-reduce).

Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
     python benchmarks/ep_ab.py
"""

import json
import os
import re
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np

_DTYPE_BYTES = {"f32": 4, "bf16": 2, "s32": 4, "u32": 4, "f16": 2, "s64": 8,
                "u64": 8, "pred": 1, "s8": 1, "u8": 1}

_COLLECTIVES = ("all-gather", "all-reduce", "all-to-all", "reduce-scatter",
                "collective-permute")


def collective_stats(compiled) -> dict:
    """Parse the optimized HLO for collective ops and their payload bytes."""
    txt = compiled.as_text()
    stats = {}
    for line in txt.splitlines():
        m = re.search(r"=\s*(\([^)]*\)|\S+)\s+(" + "|".join(_COLLECTIVES) +
                      r")(?:-start)?\(", line)
        if not m:
            continue
        shapes, op = m.group(1), m.group(2)
        byts = 0
        for sm in re.finditer(r"(\w+)\[([\d,]*)\]", shapes):
            dt, dims = sm.group(1), sm.group(2)
            n = 1
            for d in dims.split(","):
                if d:
                    n *= int(d)
            byts += n * _DTYPE_BYTES.get(dt, 4)
        k = stats.setdefault(op, {"count": 0, "bytes": 0})
        k["count"] += 1
        k["bytes"] += byts
    return stats


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")
    from jax.sharding import NamedSharding, PartitionSpec as P

    from tencent_recommendation_2025_tpu.parallel import sharded_embedding as SE
    from tencent_recommendation_2025_tpu.parallel.mesh import build_mesh
    from tencent_recommendation_2025_tpu.config import MeshConfig

    mesh = build_mesh(MeshConfig(data=8))
    V, D = 1_048_576, 64
    B, L = 64, 256                      # ids per step ~ the flagship's order
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.standard_normal((V, D)) * 0.02, jnp.float32)
    table_sh = SE.shard_table(mesh, table)
    ids = jnp.asarray(rng.integers(1, V, (B, L)), jnp.int32)
    ids_sh = jax.device_put(ids, NamedSharding(mesh, P(("pipe", "data"))))
    cot = jnp.asarray(rng.standard_normal((B, L, D)) * 0.1, jnp.float32)
    cot_sh = jax.device_put(cot, NamedSharding(mesh, P(("pipe", "data"))))

    def spmd_default(tbl, ids):
        emb = jnp.take(tbl, ids, axis=0)
        return emb * (ids != 0)[..., None].astype(emb.dtype)

    variants = {
        "xla_spmd_default": lambda t, i: spmd_default(t, i),
        "explicit_ag_psum": lambda t, i: SE.sharded_lookup(mesh, t, i),
        "explicit_a2a": lambda t, i: SE.sharded_lookup_a2a(mesh, t, i),
    }

    out_sh = NamedSharding(mesh, P(("pipe", "data")))
    results = {}
    for name, fn in variants.items():
        def loss(t, i):
            return (fn(t, i) * cot_sh).sum()

        fwd = jax.jit(fn, out_shardings=out_sh)
        gradf = jax.jit(jax.grad(loss, argnums=0))
        try:
            cf = fwd.lower(table_sh, ids_sh).compile()
            cg = gradf.lower(table_sh, ids_sh).compile()
        except Exception as e:
            results[name] = {"error": str(e)[:200]}
            continue
        # indicative wall time (CPU): 3 warmups then 10 iters
        o = None
        for _ in range(3):
            o = fwd(table_sh, ids_sh)
        jax.block_until_ready(o)
        t0 = time.perf_counter()
        for _ in range(10):
            o = fwd(table_sh, ids_sh)
        jax.block_until_ready(o)
        fwd_ms = (time.perf_counter() - t0) / 10 * 1e3
        for _ in range(2):
            g = gradf(table_sh, ids_sh)
        jax.block_until_ready(g)
        t0 = time.perf_counter()
        for _ in range(5):
            g = gradf(table_sh, ids_sh)
        jax.block_until_ready(g)
        grad_ms = (time.perf_counter() - t0) / 5 * 1e3
        # correctness vs the dense oracle
        want = np.asarray(spmd_default(table, ids))
        ok = np.allclose(np.asarray(o), want, rtol=1e-5, atol=1e-6)
        results[name] = {
            "fwd_collectives": collective_stats(cf),
            "grad_collectives": collective_stats(cg),
            "fwd_ms_cpu": round(fwd_ms, 2),
            "grad_ms_cpu": round(grad_ms, 2),
            "matches_oracle": bool(ok),
        }

    print(json.dumps({"shape": {"V": V, "D": D, "ids": B * L,
                                "mesh": dict(mesh.shape)},
                      "variants": results}, indent=1))


if __name__ == "__main__":
    main()
