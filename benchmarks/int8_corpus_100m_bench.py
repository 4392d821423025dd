"""Single-chip serving over a 100M-item corpus via the int8 quantized path.

An f32 100M x 64 corpus is 25.6 GB — it does not fit one v5e HBM (16 GB)
and the round-3 serving design sharded it across chips. The int8 corpus
(retrieval/mips.py::quantize_corpus_int8) is 6.4 GB + 0.4 GB scales:
resident on ONE chip with room for the scoring machinery. This bench
generates the corpus codes directly on device (no 6.4 GB host transfer),
runs blocked ``topk_mips_int8`` top-10, and reports queries/s.

Reference counterpart: the external CPU FAISS HNSW binary at efS=640
(model/BaseLine/infer.py:213-225) — approximate, host-side, corpus on disk.
This path scores every item exactly (int8-quantized dot products) on the
MXU integer pipeline.

HBM budget at the defaults (Q=1024, block_n=262144): 6.8 GB corpus +
~1 GB score transients. Run standalone (fresh process) on the chip.
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

    from tencent_recommendation_2025_tpu.retrieval import mips as MIPS

    D, Q, BLOCK = 64, 1024, 4_194_304
    # block-aligned row count (~100.7M): topk_mips_int8 pads ragged corpora
    # to a block multiple, which at this scale is a transient 6.4 GB copy
    # alongside the resident original — aligned N avoids it entirely.
    # 4M-row blocks are the swept optimum (see topk_mips_int8 docstring)
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 24 * BLOCK

    @jax.jit
    def make_corpus(key):
        # [D, N] transposed codes — an [N, 64] int8 array lane-pads 2x
        # (T(32,128) tiles) and OOMs HBM at N=100M (probed; see
        # quantize_corpus_int8)
        k1, k2 = jax.random.split(key)
        codes_t = jax.random.randint(k1, (D, N), -127, 128, dtype=jnp.int8)
        scales = jax.random.uniform(k2, (N,), jnp.float32, 0.5, 1.5) / 127.0
        return codes_t, scales

    codes, scales = make_corpus(jax.random.key(0))
    jax.block_until_ready(codes)

    rng = np.random.default_rng(1)
    queries = jnp.asarray(rng.standard_normal((Q, D)).astype(np.float32))

    @partial(jax.jit, static_argnums=3)
    def run(queries, codes, scales, iters):
        def body(c, _):
            s, _i = MIPS.topk_mips_int8(queries + c * 0.0, codes, scales,
                                        k=10, block_n=BLOCK)
            return s.max(), None

        s, _ = jax.lax.scan(body, jnp.float32(0), None, length=iters)
        return s

    float(run(queries, codes, scales, 1))
    float(run(queries, codes, scales, 3))
    t0 = time.perf_counter()
    float(run(queries, codes, scales, 1))
    dt1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(run(queries, codes, scales, 3))
    dt3 = time.perf_counter() - t0
    per_call = (dt3 - dt1) / 2
    print(json.dumps({
        "metric": "int8_corpus_100m_top10",
        "value": round(Q / per_call, 1),
        "unit": "queries/s/chip",
        "corpus_rows": N, "ms_per_batch": round(per_call * 1e3, 1),
        "queries_per_batch": Q,
        "corpus_gb": round(N * D / 1e9, 1),
    }), flush=True)


main()
