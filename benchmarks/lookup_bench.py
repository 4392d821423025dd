"""Embedding-lookup bandwidth microbench (the BASELINE.json "lookup GB/s").

Measures the fused-table gather (one `take` for all sparse features) at
flagship shapes, and the sharded shard_map lookup when >1 device is present.
Prints one JSON line per measurement.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from tencent_recommendation_2025_tpu.models.embedding import masked_take

    rng = np.random.default_rng(0)
    V, D = 2_000_000, 64
    table = jnp.asarray(rng.standard_normal((V, D)), jnp.float32)
    for n_ids in (128 * 1024 * 18,):      # B*L*(sparse slots) at flagship
        # iterations form a DEPENDENCY CHAIN (each draw perturbed by the
        # previous sum) so the runtime cannot elide, cache, or reorder any
        # gather; one device sync at the end
        ids0 = jnp.asarray(rng.integers(1, V - 2, (n_ids,)), jnp.int32)

        @jax.jit
        def f(t, ids, carry):
            s = masked_take(t, ids, dtype=jnp.bfloat16).astype(jnp.float32).sum()
            bump = (s.astype(jnp.int32) & 1)
            return jnp.clip(ids + bump, 1, V - 1), carry + s

        # axon's block_until_ready is NOT a timing barrier — fetch the
        # scalar (float()) to sync, and slope-time two iteration counts so
        # the fetch/dispatch constant cancels
        def run(iters):
            ids, carry = ids0, jnp.float32(0)
            t0 = time.perf_counter()
            for _ in range(iters):
                ids, carry = f(table, ids, carry)
            float(carry)
            return time.perf_counter() - t0

        run(4)  # warm/compile
        n1, n2 = 4, 24
        run(n1)
        dt = (run(n2) - run(n1)) / (n2 - n1)
        gb = n_ids * D * 2 / 1e9          # bf16 payload out
        print(json.dumps({
            "metric": "fused_lookup_bandwidth",
            "value": round(gb / dt, 2),
            "unit": "GB/s",
            "n_ids": n_ids,
            "ms": round(dt * 1000, 2),
        }))


if __name__ == "__main__":
    main()
