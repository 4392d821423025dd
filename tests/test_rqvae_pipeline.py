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

    # TRUE generative retrieval: beam-search decode, beams mapped to items —
    # must match the exact scorer's cluster quality
    top_b = genret_retrieve(head["params"], rq,
                            queries[:64].astype(np.float32), cfg, k=10,
                            method="beam", beam_width=16)
    hit_b = np.mean([assign[top_b[i]].tolist().count(assign[pos[i]]) / 10
                     for i in range(64)])
    assert hit_b > 0.5, hit_b


def test_beam_decode_consistency():
    """Beam scores are self-consistent with the exact scorer, sorted
    best-first, and the top beam is the joint argmax on a brute-forceable
    code space."""
    import jax
    import jax.numpy as jnp

    from tencent_recommendation_2025_tpu.models import rqvae as R

    rng = np.random.default_rng(4)
    cfg = RQVAEConfig(num_levels=3, codebook_size=8, code_dim=4,
                      enc_hidden=(16,))
    rq_params = R.init_rqvae_params(jax.random.key(0), cfg, input_dim=12)
    gp = R.init_genret_params(jax.random.key(1), cfg, query_dim=12)
    # make the heads non-trivial
    gp = jax.tree.map(lambda x: x + 0.3 * jnp.asarray(
        rng.standard_normal(x.shape), x.dtype), gp)
    q = jnp.asarray(rng.standard_normal((5, 12)), jnp.float32)

    W = 8
    codes, scores = R.genret_beam_decode(gp, rq_params, q, cfg, beam_width=W)
    assert codes.shape == (5, W, 3) and scores.shape == (5, W)
    s = np.asarray(scores)
    assert (np.diff(s, axis=1) <= 1e-6).all()  # sorted best-first

    # self-consistency: each beam's score == exact log-likelihood of its code
    for b in range(5):
        exact = R.genret_score_items_exact(gp, rq_params, q[b:b + 1],
                                           codes[b], cfg)
        np.testing.assert_allclose(s[b], np.asarray(exact)[0], rtol=1e-4,
                                   atol=1e-4)

    # brute force on a 2-level space where W=C beam search is provably
    # exhaustive: the top beam must equal the joint argmax exactly
    import itertools

    cfg2 = RQVAEConfig(num_levels=2, codebook_size=8, code_dim=4,
                       enc_hidden=(16,))
    rq2 = R.init_rqvae_params(jax.random.key(2), cfg2, input_dim=12)
    gp2 = R.init_genret_params(jax.random.key(3), cfg2, query_dim=12)
    gp2 = jax.tree.map(lambda x: x + 0.3 * jnp.asarray(
        rng.standard_normal(x.shape), x.dtype), gp2)
    codes2, scores2 = R.genret_beam_decode(gp2, rq2, q, cfg2, beam_width=8)
    all_codes = jnp.asarray(list(itertools.product(range(8), repeat=2)),
                            jnp.int32)
    full = np.asarray(R.genret_score_items_exact(gp2, rq2, q, all_codes,
                                                 cfg2))
    np.testing.assert_allclose(np.asarray(scores2)[:, 0], full.max(axis=1),
                               rtol=1e-5, atol=1e-5)


def test_semantic_serving_file_contract(tmp_path):
    """--ann_method semantic end-to-end on disk: artifacts saved by the
    cli.semantic helper, query.fbin/embedding.fbin/id.u64bin in, the
    reference's id100.u64bin out (retrieval ids from the candidate set),
    cluster quality matching the in-memory beam retriever."""
    from tencent_recommendation_2025_tpu.config import RetrievalConfig
    from tencent_recommendation_2025_tpu.data import formats
    from tencent_recommendation_2025_tpu.retrieval import semantic_serve as SS

    rng = np.random.default_rng(7)
    cfg = RQVAEConfig(num_levels=2, codebook_size=16, code_dim=8,
                      enc_hidden=(32,), lr=3e-3)
    n_items, d = 257, 24
    centers = rng.standard_normal((8, d)) * 3
    assign = rng.integers(0, 8, n_items)
    reprs = centers[assign] + 0.15 * rng.standard_normal((n_items, d))
    reprs[0] = 0
    rq = train_rqvae(reprs.astype(np.float32), cfg, num_steps=400,
                     batch_size=128)
    m = 512
    pos = rng.integers(1, n_items, m)
    queries = (reprs[pos] + 0.1 * rng.standard_normal((m, d))).astype(
        np.float32)
    head = train_genret_head(rq, queries, pos, cfg, num_steps=400,
                             batch_size=256)

    # artifacts round-trip through the checkpoint layout
    art = SS.save_semantic_artifacts(tmp_path, rq.params, head["params"],
                                     cfg, input_dim=d, query_dim=d)
    assert art.exists()
    rq_l, head_l, cfg_l = SS.load_semantic_artifacts(tmp_path)
    for a, b in zip(__import__("jax").tree.leaves(rq_l),
                    __import__("jax").tree.leaves(rq.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # serving corpus: the real items (row 0 dropped), retrieval ids offset
    # so ids != row indices (catches index/id mixups)
    result_dir = tmp_path / "result"
    result_dir.mkdir()
    rid = (np.arange(1, n_items, dtype=np.uint64) + 1000)
    formats.save_emb(reprs[1:].astype(np.float32),
                     result_dir / "embedding.fbin")
    formats.save_emb(rid.reshape(-1, 1), result_dir / "id.u64bin")
    formats.save_emb(queries[:64], result_dir / "query.fbin")

    out = SS.run_semantic_ann(result_dir, tmp_path,
                              RetrievalConfig(top_k=10), beam_width=16)
    got = formats.read_result_ids(out)
    assert got.shape == (64, 10)
    assert set(np.unique(got)) <= set(rid.tolist())
    # retrieved items should mostly share the query's cluster
    hit = np.mean([assign[got[i] - 1000].tolist().count(assign[pos[i]]) / 10
                   for i in range(64)])
    assert hit > 0.5, hit
