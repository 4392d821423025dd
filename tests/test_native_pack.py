"""C++ dataprep_tool output == Python PackedCache, field for field."""

import numpy as np
import pytest

from tencent_recommendation_2025_tpu.data import native_pack as NP
from tencent_recommendation_2025_tpu.data.cached_dataset import PackedCache
from tencent_recommendation_2025_tpu.data.dataset import TrainSampler


@pytest.fixture(scope="module")
def sampler(small_setup):
    return TrainSampler(small_setup["data"], small_setup["schema"],
                        maxlen=small_setup["model"].cfg.maxlen)


def test_tool_builds(tmp_path):
    assert NP.tool_path() is not None, "dataprep_tool failed to build"


def test_native_fields_match_python(sampler, tmp_path):
    py = PackedCache(sampler, num_workers=4)
    nat = NP.build_packed_cache_native(sampler, tmp_path / "cache",
                                       threads=4)
    assert set(py.fields) == set(nat.fields)
    for name, arr in py.fields.items():
        np.testing.assert_array_equal(arr, nat.fields[name], err_msg=name)


def test_native_seen_sets_match_python(sampler, tmp_path):
    py = PackedCache(sampler, num_workers=4)
    nat = NP.build_packed_cache_native(sampler, tmp_path / "cache",
                                       threads=4)
    assert len(py.seen_sets) == len(nat.seen_sets)
    for u, (a, b) in enumerate(zip(py.seen_sets, nat.seen_sets)):
        assert a == b, f"user {u}"
    np.testing.assert_array_equal(np.asarray(py.seen_sets.offs),
                                  np.asarray(nat.seen_sets.offs))
    np.testing.assert_array_equal(np.asarray(py.seen_sets.vals),
                                  np.asarray(nat.seen_sets.vals))
    np.testing.assert_array_equal(py.neg_ok, nat.neg_ok)


def test_native_cache_is_reused(sampler, tmp_path):
    """A consistent on-disk cache is loaded, not re-packed — the point of
    the persistent layout (cli.train keys the dir by maxlen)."""
    import os

    nat1 = NP.build_packed_cache_native(sampler, tmp_path / "cache",
                                        threads=4)
    stamp = os.stat(tmp_path / "cache" / "seq.bin").st_mtime_ns
    nat2 = NP.build_packed_cache_native(sampler, tmp_path / "cache",
                                        threads=4)
    assert os.stat(tmp_path / "cache" / "seq.bin").st_mtime_ns == stamp
    for name in nat1.fields:
        np.testing.assert_array_equal(nat1.fields[name], nat2.fields[name])


def test_native_cache_batches(sampler, tmp_path):
    """The loaded cache drives the normal batching path (negatives valid)."""
    nat = NP.build_packed_cache_native(sampler, tmp_path / "cache",
                                       threads=4)
    rng = np.random.default_rng(0)
    uids = np.arange(min(8, len(nat)))
    batch = nat.batch(uids, 8, rng)
    need = batch["pos"][: len(uids)] > 0
    neg = batch["neg"][: len(uids)]
    assert np.all(neg[need] > 0)
    for u, row in zip(uids, range(len(uids))):
        bad = set(neg[row][need[row]].tolist()) & nat.seen_sets[u]
        assert not bad, f"negative collided with seen items for user {u}"
