"""L0 binary-format round-trip tests (golden semantics of reference
``dataset.py:421-434`` and ``infer.py:51-65``)."""

import struct

import numpy as np

from tencent_recommendation_2025_tpu.data import formats


def test_fbin_roundtrip(tmp_path):
    x = np.random.default_rng(0).standard_normal((17, 8)).astype(np.float32)
    p = tmp_path / "e.fbin"
    formats.save_emb(x, p)
    y = formats.load_fbin(p)
    np.testing.assert_array_equal(x, y)
    # header contract: two little-endian uint32 then raw float32 raster
    raw = p.read_bytes()
    rows, cols = struct.unpack("<II", raw[:8])
    assert (rows, cols) == (17, 8)
    assert len(raw) == 8 + 17 * 8 * 4


def test_u64bin_roundtrip(tmp_path):
    ids = np.arange(23, dtype=np.uint64).reshape(-1, 1)
    p = tmp_path / "id.u64bin"
    formats.save_emb(ids, p)
    y = formats.load_u64bin(p)
    np.testing.assert_array_equal(ids, y)


def test_result_ids_roundtrip(tmp_path):
    ids = np.random.default_rng(1).integers(0, 1000, (5, 10)).astype(np.uint64)
    p = tmp_path / "id100.u64bin"
    formats.save_result_ids(ids, p)
    y = formats.read_result_ids(p)
    np.testing.assert_array_equal(ids, y)
    rows, k = struct.unpack("<II", p.read_bytes()[:8])
    assert (rows, k) == (5, 10)
