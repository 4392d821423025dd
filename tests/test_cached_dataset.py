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


def test_negative_rejection_uses_full_history(small_setup):
    """The rejection set is the reference's ``ts`` (the WHOLE
    ext_user_sequence, dataset.py:137-141), not the maxlen window — with a
    tiny window, pre-window items must still never be drawn as negatives."""
    sampler = TrainSampler(small_setup["data"], small_setup["schema"],
                           maxlen=3)          # force windows << history
    cache = PackedCache(sampler, num_workers=4)
    widened = 0
    for uid in range(len(cache)):
        s, full_seen = sampler.sample(uid, np.random.default_rng((0, uid)),
                                      return_seen=True)
        window = set(s.seq[s.token_type == 1].tolist()) \
            | set(s.pos[s.pos > 0].tolist())
        window -= {0}
        assert cache.seen_sets[uid] == frozenset(full_seen) - {0}
        widened += len((frozenset(full_seen) - {0}) - window)
    assert widened > 0, "fixture too short to exercise pre-window history"

    rng = np.random.default_rng(2)
    uids = np.arange(len(cache))
    neg = cache.sample_negatives(uids, rng)
    for b, uid in enumerate(uids):
        for l in np.nonzero(neg[b])[0]:
            assert int(neg[b, l]) not in cache.seen_sets[uid]


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


def test_pooled_prep_matches_serial(small_setup):
    """epoch(prep=...) runs prep on the worker pool; results must equal the
    serial generator wrapping (the pre-round-5 wiring) batch for batch."""
    import dataclasses
    import types

    from tencent_recommendation_2025_tpu.train.trainer import (
        augment_batch_dedup)

    sampler = TrainSampler(small_setup["data"], small_setup["schema"],
                           maxlen=20)
    cache = PackedCache(sampler, num_workers=4)
    cfg = small_setup["cfg"]
    cfg = cfg.replace(train=dataclasses.replace(
        cfg.train, batch_size=8, tower_dedup=True))
    t = small_setup["tables"]
    feats = types.SimpleNamespace(sparse=t.sparse, array=t.array)
    itemnum = small_setup["data"].itemnum

    def prep(b, i):
        return augment_batch_dedup(b, cfg, feats, itemnum,
                                   step_key=(0, 97, 0, i), n_data_shards=1)

    loader = CachedTrainLoader(cache, np.arange(len(cache)), batch_size=8,
                               seed=0, num_workers=4)
    pooled = list(loader.epoch(0, prep=prep))
    serial = [prep(b, i) for i, b in enumerate(loader.epoch(0))]
    assert len(pooled) == len(serial) > 1
    for bp, bs in zip(pooled, serial):
        assert set(bp) == set(bs)
        for k in bp:
            np.testing.assert_array_equal(bp[k], bs[k], err_msg=k)
