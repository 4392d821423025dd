"""PackedCache == per-epoch TrainSampler on fixed fields + valid negatives."""

import numpy as np

from tencent_recommendation_2025_tpu.data.cached_dataset import (
    CachedTrainLoader, PackedCache)
from tencent_recommendation_2025_tpu.data.dataset import TrainSampler


def test_cache_matches_sampler_fixed_fields(small_setup):
    sampler = TrainSampler(small_setup["data"], small_setup["schema"],
                           maxlen=20)
    cache = PackedCache(sampler, num_workers=4)
    rng = np.random.default_rng(0)
    for uid in range(0, len(sampler), 7):
        s = sampler.sample(uid, rng)
        np.testing.assert_array_equal(cache.fields["seq"][uid], s.seq)
        np.testing.assert_array_equal(cache.fields["pos"][uid], s.pos)
        np.testing.assert_array_equal(cache.fields["seq_item_sparse"][uid],
                                      s.seq_item_sparse)
        np.testing.assert_array_equal(cache.fields["pos_item_sparse"][uid],
                                      s.pos_item_sparse)


def test_vectorized_negatives_are_valid(small_setup):
    sampler = TrainSampler(small_setup["data"], small_setup["schema"],
                           maxlen=20)
    cache = PackedCache(sampler, num_workers=4)
    rng = np.random.default_rng(1)
    uids = np.arange(min(16, len(cache)))
    neg = cache.sample_negatives(uids, rng)
    pos = cache.fields["pos"][uids]
    assert np.array_equal(neg > 0, pos > 0)
    for b, uid in enumerate(uids):
        seen = cache.seen_sets[uid]
        for l in np.nonzero(neg[b])[0]:
            n = int(neg[b, l])
            assert n not in seen
            assert cache.neg_ok[n]


def test_cached_loader_batches(small_setup):
    sampler = TrainSampler(small_setup["data"], small_setup["schema"],
                           maxlen=20)
    cache = PackedCache(sampler, num_workers=4)
    loader = CachedTrainLoader(cache, np.arange(len(cache)), batch_size=8,
                               seed=0)
    batches = list(loader.epoch(0))
    assert len(batches) == len(loader)
    b0 = batches[0]
    assert b0["seq"].shape[0] == 8 and "neg" in b0 and "sample_valid" in b0
    # determinism per (seed, epoch)
    b0b = next(iter(loader.epoch(0)))
    np.testing.assert_array_equal(b0["neg"], b0b["neg"])
    # different epochs -> different negatives
    b1 = next(iter(loader.epoch(1)))
    assert not np.array_equal(b0["neg"], b1["neg"])
