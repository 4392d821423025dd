"""C++ HNSW tool: CLI/file contract + recall against exact MIPS."""

import numpy as np
import pytest

from tencent_recommendation_2025_tpu.config import RetrievalConfig
from tencent_recommendation_2025_tpu.data import formats
from tencent_recommendation_2025_tpu.retrieval.ann import binary_path, run_ann


@pytest.fixture(scope="module")
def tool():
    p = binary_path(build=True)
    if p is None:
        pytest.skip("native toolchain unavailable")
    return p


def test_hnsw_recall_vs_exact(tool, tmp_path):
    rng = np.random.default_rng(0)
    n, d, nq, k = 2000, 32, 64, 10
    base = rng.standard_normal((n, d)).astype(np.float32)
    ids = (np.arange(n, dtype=np.uint64) + 1000).reshape(-1, 1)
    queries = rng.standard_normal((nq, d)).astype(np.float32)
    formats.save_emb(base, tmp_path / "embedding.fbin")
    formats.save_emb(ids, tmp_path / "id.u64bin")
    formats.save_emb(queries, tmp_path / "query.fbin")

    out = run_ann(tmp_path, RetrievalConfig(method="hnsw", top_k=k,
                                            hnsw_m=16,
                                            hnsw_ef_construction=200,
                                            hnsw_ef_search=200))
    got = formats.read_result_ids(out)
    assert got.shape == (nq, k)

    # exact reference
    scores = queries @ base.T
    exact = ids[np.argsort(-scores, axis=1)[:, :k], 0]
    recall = np.mean([len(set(got[i]) & set(exact[i])) / k
                      for i in range(nq)])
    assert recall > 0.9, f"HNSW recall too low: {recall}"


def test_hnsw_result_header(tool, tmp_path):
    rng = np.random.default_rng(1)
    base = rng.standard_normal((50, 8)).astype(np.float32)
    ids = np.arange(50, dtype=np.uint64).reshape(-1, 1)
    queries = rng.standard_normal((3, 8)).astype(np.float32)
    formats.save_emb(base, tmp_path / "embedding.fbin")
    formats.save_emb(ids, tmp_path / "id.u64bin")
    formats.save_emb(queries, tmp_path / "query.fbin")
    out = run_ann(tmp_path, RetrievalConfig(method="hnsw", top_k=10))
    import struct
    rows, k = struct.unpack("<II", out.read_bytes()[:8])
    assert (rows, k) == (3, 10)
