"""Distributed exact top-k MIPS (VERDICT r1 item 6): per-device corpus
shards + local blocked top-k + one k-winner all-gather must equal the
single-device result. Serving counterpart of the reference's external FAISS
binary (``model/BaseLine/infer.py:213-225``)."""

import jax
import numpy as np
import pytest


def test_sharded_matches_single_device():
    from jax.sharding import Mesh

    from tencent_recommendation_2025_tpu.retrieval.mips import (
        sharded_topk_mips, topk_mips)

    rng = np.random.default_rng(0)
    Q, N, D, k = 32, 1003, 16, 10  # N not divisible by 8: padding path
    q = rng.standard_normal((Q, D)).astype(np.float32)
    c = rng.standard_normal((N, D)).astype(np.float32)

    s1, i1 = topk_mips(jax.numpy.asarray(q), jax.numpy.asarray(c), k=k)
    mesh = Mesh(np.asarray(jax.devices()).reshape(-1), ("corpus",))
    s2, i2 = sharded_topk_mips(mesh, jax.numpy.asarray(q),
                               jax.numpy.asarray(c), k=k)

    np.testing.assert_allclose(np.asarray(s2), np.asarray(s1), rtol=1e-5,
                               atol=1e-5)
    # continuous random scores: ties have measure zero -> indices equal
    np.testing.assert_array_equal(np.asarray(i2), np.asarray(i1))
    assert np.asarray(i2).max() < N


def test_sharded_small_corpus_k_exceeds_shard():
    """Per-shard rows < k: winners must still merge to the true global
    top-k (each shard returns k padded candidates)."""
    from jax.sharding import Mesh

    from tencent_recommendation_2025_tpu.retrieval.mips import (
        sharded_topk_mips, topk_mips)

    rng = np.random.default_rng(1)
    Q, N, D, k = 4, 37, 8, 10  # 37 rows over 8 shards -> 5 rows/shard < k
    q = rng.standard_normal((Q, D)).astype(np.float32)
    c = rng.standard_normal((N, D)).astype(np.float32)
    s1, i1 = topk_mips(jax.numpy.asarray(q), jax.numpy.asarray(c), k=k)
    mesh = Mesh(np.asarray(jax.devices()).reshape(-1), ("corpus",))
    s2, i2 = sharded_topk_mips(mesh, jax.numpy.asarray(q),
                               jax.numpy.asarray(c), k=k)
    np.testing.assert_allclose(np.asarray(s2), np.asarray(s1), rtol=1e-5,
                               atol=1e-5)
    np.testing.assert_array_equal(np.asarray(i2), np.asarray(i1))


def test_retrieve_topk_auto_mesh():
    """The host wrapper auto-shards when >1 device is visible and maps back
    to corpus ids correctly."""
    from tencent_recommendation_2025_tpu.retrieval.mips import retrieve_topk

    rng = np.random.default_rng(2)
    N, D, k = 500, 8, 5
    q = rng.standard_normal((17, D)).astype(np.float32)
    c = rng.standard_normal((N, D)).astype(np.float32)
    ids = rng.integers(10**6, 10**9, N).astype(np.uint64)
    got = retrieve_topk(q, c, ids, k=k)
    # oracle
    scores = q @ c.T
    want = ids[np.argsort(-scores, axis=1)[:, :k]]
    np.testing.assert_array_equal(got, want)


def test_topk_mips_approx_matches_exact_on_cpu():
    """The approx_max_k path's plumbing (block winners + exact merge, index
    mapping, padding) — on CPU approx_max_k lowers to exact top_k, so the
    result must equal the exact path bit-for-bit."""
    import numpy as np
    from tencent_recommendation_2025_tpu.retrieval.mips import (
        topk_mips, topk_mips_approx)

    rng = np.random.default_rng(5)
    q = rng.standard_normal((64, 16)).astype(np.float32)
    c = rng.standard_normal((3000, 16)).astype(np.float32)
    es, ei = topk_mips(q, c, k=10)
    as_, ai = topk_mips_approx(q, c, k=10, block_n=1024)
    np.testing.assert_array_equal(np.asarray(ei), np.asarray(ai))
    np.testing.assert_allclose(np.asarray(es), np.asarray(as_), rtol=1e-6)


def test_sharded_topk_mips_approx_matches_exact():
    """approx=True through the sharded path (per-shard approx_max_k, exact
    cross-shard merge) == the exact sharded result on CPU (where
    approx_max_k lowers exactly), including the padded-tail masking."""
    import jax
    import numpy as np
    from jax.sharding import Mesh
    from tencent_recommendation_2025_tpu.retrieval.mips import (
        sharded_topk_mips)

    mesh = Mesh(np.asarray(jax.devices()).reshape(-1), ("corpus",))
    rng = np.random.default_rng(9)
    q = rng.standard_normal((32, 16)).astype(np.float32)
    c = rng.standard_normal((1003, 16)).astype(np.float32)  # uneven shards
    es, ei = sharded_topk_mips(mesh, q, c, k=10)
    as_, ai = sharded_topk_mips(mesh, q, c, k=10, approx=True)
    np.testing.assert_array_equal(np.asarray(ei), np.asarray(ai))


def test_int8_quantized_mips_recall():
    """int8 corpus path: per-row symmetric quantization round-trips within
    1/127 relative, and top-10 recall vs exact f32 stays high on random
    embeddings (the serving bench measures it on the real distribution)."""
    import numpy as np
    from tencent_recommendation_2025_tpu.retrieval.mips import (
        quantize_corpus_int8, topk_mips, topk_mips_int8)

    rng = np.random.default_rng(11)
    c = rng.standard_normal((4000, 16)).astype(np.float32)
    codes, scales = quantize_corpus_int8(c)
    assert np.asarray(codes).dtype == np.int8
    assert codes.shape == (16, 4000)  # [D, N]: int8 lane-padding trap
    deq = np.asarray(codes).T.astype(np.float32) \
        * np.asarray(scales)[:, None]
    np.testing.assert_allclose(deq, c, atol=np.abs(c).max() / 127 + 1e-6)
    # zero rows: scale 1, codes 0
    codes0, scales0 = quantize_corpus_int8(np.zeros((3, 16), np.float32))
    assert np.all(np.asarray(codes0) == 0) and np.all(
        np.asarray(scales0) == 1.0)

    q = rng.standard_normal((128, 16)).astype(np.float32)
    _, ei = topk_mips(q, c, k=10)
    _, qi = topk_mips_int8(q, codes, scales, k=10, block_n=1024,
                           approx=False)
    ei, qi = np.asarray(ei), np.asarray(qi)
    recall = np.mean([len(set(ei[i]) & set(qi[i])) / 10
                      for i in range(len(ei))])
    assert recall >= 0.95, recall


def test_int8_retrieve_topk_host_wrapper():
    import numpy as np
    from tencent_recommendation_2025_tpu.retrieval.mips import retrieve_topk

    rng = np.random.default_rng(12)
    c = rng.standard_normal((500, 16)).astype(np.float32)
    q = c[:40] * 3.0
    ids = (np.arange(500, dtype=np.uint64) + 7) * 11
    got = retrieve_topk(q, c, ids, k=5, mesh=None, quantize=True)
    exact = retrieve_topk(q, c, ids, k=5, mesh=None)
    assert got.shape == (40, 5) and got.dtype == np.uint64
    # quantized ranking tracks exact f32 (ties/near-ties may reorder)
    overlap = np.mean([len(set(got[i]) & set(exact[i])) / 5
                       for i in range(len(got))])
    assert overlap >= 0.9, overlap


def test_sharded_int8_matches_single_device():
    """int8 sharded over the 8-device mesh == the single-device int8 result
    (uneven shard tail + per-shard local pad both exercised), and the
    retrieve_topk wrapper routes quantize=True through the sharded path."""
    import jax
    import numpy as np
    from jax.sharding import Mesh
    from tencent_recommendation_2025_tpu.retrieval.mips import (
        quantize_corpus_int8, retrieve_topk, sharded_topk_mips_int8,
        topk_mips_int8)

    mesh = Mesh(np.asarray(jax.devices()).reshape(-1), ("corpus",))
    rng = np.random.default_rng(21)
    c = rng.standard_normal((1003, 16)).astype(np.float32)  # uneven shards
    q = rng.standard_normal((32, 16)).astype(np.float32)
    codes, scales = quantize_corpus_int8(c)
    ss, si = sharded_topk_mips_int8(mesh, q, (codes, scales), k=10,
                                    block_n=128)
    ds, di = topk_mips_int8(q, codes, scales, k=10, block_n=128,
                            approx=False)
    np.testing.assert_array_equal(np.asarray(si), np.asarray(di))
    np.testing.assert_allclose(np.asarray(ss), np.asarray(ds), rtol=1e-6)

    ids = np.arange(1003, dtype=np.uint64) * 3 + 5
    got = retrieve_topk(q, c, ids, k=10, mesh=mesh, quantize=True)
    np.testing.assert_array_equal(got, np.asarray(ids)[np.asarray(di)])


def test_sharded_int8_pad_rows_never_displace_negative_scores():
    """Round-5 review repro: global-tail pad rows have scale ~0 and score
    ~0; with a query whose TRUE best inner products are all negative and
    live on the last shard, the pads must not displace them from the local
    top-k (they must rank -inf BEFORE the per-shard ranking)."""
    import jax
    import numpy as np
    from jax.sharding import Mesh
    from tencent_recommendation_2025_tpu.retrieval.mips import (
        sharded_topk_mips_int8, topk_mips_int8, quantize_corpus_int8)

    mesh = Mesh(np.asarray(jax.devices()).reshape(-1), ("corpus",))
    rng = np.random.default_rng(33)
    N, D = 1003, 16  # 8 shards -> rows=126, 5 pad rows on the last shard
    c = -np.abs(rng.standard_normal((N, D))).astype(np.float32)
    q = np.abs(rng.standard_normal((4, D))).astype(np.float32)  # all neg
    codes, scales = quantize_corpus_int8(c)
    ss, si = sharded_topk_mips_int8(mesh, q, (codes, scales), k=10,
                                    block_n=128)
    ds, di = topk_mips_int8(q, codes, scales, k=10, block_n=128,
                            approx=False)
    np.testing.assert_array_equal(np.asarray(si), np.asarray(di))
    assert np.asarray(si).max() < N
    assert float(np.asarray(ss).max()) < 0  # no zero-score pad leaked
