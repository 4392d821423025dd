"""End-to-end RQ-VAE semantic-ID pipeline: tokenizer + decode-head retrieval
beats random on structured data (BASELINE.json configs[2] slice)."""

import numpy as np

from tencent_recommendation_2025_tpu.config import RQVAEConfig
from tencent_recommendation_2025_tpu.train.rqvae_trainer import (
    RQVAEResult, genret_retrieve, train_genret_head, train_rqvae)


def test_semantic_id_pipeline_end_to_end():
    rng = np.random.default_rng(0)
    cfg = RQVAEConfig(num_levels=2, codebook_size=16, code_dim=8,
                      enc_hidden=(32,), lr=3e-3)
    # items live in 8 latent clusters
    n_items, d = 257, 24
    centers = rng.standard_normal((8, d)) * 3
    assign = rng.integers(0, 8, n_items)
    reprs = centers[assign] + 0.15 * rng.standard_normal((n_items, d))
    reprs[0] = 0

    rq = train_rqvae(reprs.astype(np.float32), cfg, num_steps=400,
                     batch_size=128)
    assert rq.semantic_ids.shape == (n_items, 2)
    assert rq.final_losses["recon"] < 1.0

    # same-cluster items should share level-0 codes far above chance
    same = 0
    tot = 0
    for c in range(8):
        ids = np.nonzero(assign == c)[0]
        ids = ids[ids > 0]
        if len(ids) < 2:
            continue
        codes = rq.semantic_ids[ids, 0]
        vals, counts = np.unique(codes, return_counts=True)
        same += counts.max()
        tot += len(ids)
    assert same / tot > 0.8

    # queries = noisy versions of their positive item's representation
    m = 512
    pos = rng.integers(1, n_items, m)
    queries = reprs[pos] + 0.1 * rng.standard_normal((m, d))
    head = train_genret_head(rq, queries.astype(np.float32), pos, cfg,
                             num_steps=400, batch_size=256)

    top = genret_retrieve(head["params"], rq, queries[:64].astype(np.float32),
                          cfg, k=10)
    # retrieved items should mostly be in the query's cluster
    hit = np.mean([assign[top[i]].tolist().count(assign[pos[i]]) / 10
                   for i in range(64)])
    assert hit > 0.5, hit
