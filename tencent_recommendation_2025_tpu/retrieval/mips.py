"""Exact MIPS top-k retrieval on device (F10 primary path).

The reference shells out to a C++ FAISS HNSW binary for approximate top-10
(``model/BaseLine/infer.py:213-225``). On TPU, exact maximum-inner-product
search over a ≤100M x 64 corpus is a dense matmul — the MXU's home turf — so
the *primary* serving path is exact: blocked ``[Q, D] x [D, N]`` scoring with
a running top-k merge (no [Q, N] materialization), and a sharded variant that
scores per-device corpus shards and merges with one all-gather of k winners
per shard (see parallel/). The C++ HNSW tool (retrieval/ann) remains as the
reference-contract parity path.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("k", "block_n"))
def topk_mips(queries: jnp.ndarray, corpus: jnp.ndarray, k: int = 10,
              block_n: int = 65536) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact top-k inner-product search.

    queries [Q, D], corpus [N, D] -> (scores [Q, k], indices [Q, k]).
    The corpus axis is processed in blocks with a running top-k so peak
    memory is O(Q * (k + block_n)) instead of O(Q * N).
    """
    Q, D = queries.shape
    N = corpus.shape[0]
    block_n = min(block_n, max(k, N))
    n_blocks = -(-N // block_n)
    pad_n = n_blocks * block_n
    if pad_n != N:
        corpus = jnp.pad(corpus, ((0, pad_n - N), (0, 0)))
    corpus_blocks = corpus.reshape(n_blocks, block_n, -1)

    neg_inf = jnp.finfo(jnp.float32).min
    init_scores = jnp.full((Q, k), neg_inf, jnp.float32)
    init_idx = jnp.zeros((Q, k), jnp.int32)

    def body(carry, blk):
        best_s, best_i = carry
        block, b = blk
        s = jnp.einsum("qd,nd->qn", queries, block,
                       preferred_element_type=jnp.float32)
        base = b * block_n
        idx = jax.lax.broadcasted_iota(jnp.int32, (Q, block_n), 1) + base
        valid = idx < N
        s = jnp.where(valid, s, neg_inf)
        cat_s = jnp.concatenate([best_s, s], axis=1)
        cat_i = jnp.concatenate([best_i, idx], axis=1)
        new_s, pos = jax.lax.top_k(cat_s, k)
        new_i = jnp.take_along_axis(cat_i, pos, axis=1)
        return (new_s, new_i), None

    (scores, indices), _ = jax.lax.scan(
        body, (init_scores, init_idx),
        (corpus_blocks, jnp.arange(n_blocks)))
    return scores, indices


def retrieve_topk(query_embs: np.ndarray, corpus_embs: np.ndarray,
                  corpus_ids: np.ndarray, k: int = 10,
                  query_batch: int = 4096) -> np.ndarray:
    """Host wrapper: batch queries, map indices back to corpus ids.

    Returns [Q, k] of ``corpus_ids`` dtype (e.g. uint64 retrieval ids).
    """
    corpus = jnp.asarray(corpus_embs, jnp.float32)
    out = []
    for s in range(0, len(query_embs), query_batch):
        q = jnp.asarray(query_embs[s:s + query_batch], jnp.float32)
        _, idx = topk_mips(q, corpus, k=k)
        out.append(np.asarray(idx))
    idx = np.concatenate(out, axis=0)
    return np.asarray(corpus_ids)[idx]
