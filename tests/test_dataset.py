"""Dataset-semantics tests replicating the reference's sampling invariants
(SURVEY.md §3.3) on the synthetic fixture."""

import numpy as np

from tencent_recommendation_2025_tpu.data import schema as S
from tencent_recommendation_2025_tpu.data.dataset import TestSampler, TrainSampler
from tencent_recommendation_2025_tpu.data.pipeline import (
    TestLoader, TrainLoader, collate_train, train_val_split)
from tencent_recommendation_2025_tpu.data.readers import TencentGRData
from tencent_recommendation_2025_tpu.data.schema import FeatureSchema


def _sampler(small_setup):
    return TrainSampler(small_setup["data"], small_setup["schema"], maxlen=20)


def test_train_sample_invariants(small_setup):
    sampler = _sampler(small_setup)
    rng = np.random.default_rng(0)
    for uid in range(len(sampler)):
        s = sampler.sample(uid, rng)
        L = sampler.L
        assert s.seq.shape == (L,)
        # prediction only where next token is an item (next_token_type==1)
        pred = s.pos > 0
        assert np.all(s.next_token_type[pred] == 1)
        # negatives exist exactly where positives do, differ from positives,
        # and never collide with the user's seen items
        assert np.array_equal(s.neg > 0, pred)
        seen = set(s.seq[s.token_type == 1].tolist()) | set(s.pos[pred].tolist())
        for n in s.neg[pred]:
            assert n not in seen
        # left padding: once a token appears, no later gaps
        nz = np.nonzero(s.token_type)[0]
        if len(nz):
            assert np.all(s.token_type[nz[0]:] != 0)
        # user tokens appear before item tokens (prepended in ext sequence)
        tt = s.token_type[s.token_type != 0]
        if 2 in tt:
            first_item = np.argmax(tt == 1) if (tt == 1).any() else len(tt)
            assert np.all(tt[:first_item] != 1) or first_item == 0
        # item features zero at non-item tokens
        assert np.all(s.seq_item_sparse[s.token_type != 1] == 0)
        assert np.all(s.seq_user_sparse[s.token_type != 2] == 0)


def test_next_shift_alignment(small_setup):
    """pos[idx] equals the sequence token at idx+1 when that token is an
    in-window item (next-token prediction)."""
    sampler = _sampler(small_setup)
    s = sampler.sample(0, np.random.default_rng(1))
    for idx in range(sampler.L - 1):
        if s.pos[idx] > 0 and s.token_type[idx + 1] == 1:
            assert s.pos[idx] == s.seq[idx + 1]


def test_neg_sampling_rejects_featureless(small_setup):
    sampler = _sampler(small_setup)
    # forge: mark half the items featureless
    sampler._neg_ok[:] = False
    sampler._neg_ok[1:10] = True
    rng = np.random.default_rng(2)
    for _ in range(50):
        n = sampler._random_neq(set(), rng)
        assert 1 <= n < 10


def test_determinism(small_setup):
    sampler = _sampler(small_setup)
    a = sampler.sample(3, np.random.default_rng(9))
    b = sampler.sample(3, np.random.default_rng(9))
    np.testing.assert_array_equal(a.neg, b.neg)
    np.testing.assert_array_equal(a.seq, b.seq)


def test_collate_pads_batch(small_setup):
    sampler = _sampler(small_setup)
    rng = np.random.default_rng(0)
    samples = [sampler.sample(i, rng) for i in range(3)]
    batch = collate_train(samples, batch_size=8)
    assert batch["seq"].shape == (8, sampler.L)
    assert batch["sample_valid"].tolist() == [1, 1, 1, 0, 0, 0, 0, 0]
    assert np.all(batch["seq"][3:] == 0)


def test_split_and_loader(small_setup):
    sampler = _sampler(small_setup)
    tr, va = train_val_split(len(sampler), 0.1, seed=0)
    assert len(tr) + len(va) == len(sampler)
    assert len(set(tr) & set(va)) == 0
    loader = TrainLoader(sampler, tr, batch_size=8, seed=0)
    batches = list(loader.epoch(0))
    assert len(batches) == len(loader)
    # epoch determinism
    b2 = list(loader.epoch(0))
    np.testing.assert_array_equal(batches[0]["neg"], b2[0]["neg"])


def test_test_sampler(small_setup):
    data = TencentGRData(small_setup["dir"], mm_emb_ids=("81",), split="test")
    sampler = TestSampler(data, small_setup["schema"], maxlen=20)
    s = sampler.sample(0)
    assert s.user_id.startswith("user_")
    assert s.seq.shape == (21,)
    loader = TestLoader(sampler, batch_size=8)
    total = 0
    for batch, user_ids, n_valid in loader:
        assert batch["seq"].shape[0] == 8
        total += n_valid
    assert total == len(sampler)


def test_cold_start_inference(tmp_path):
    """Unseen items (reid > itemnum) zero their id but keep (cleaned)
    features; string feature values become 0 (reference dataset.py:309-364)."""
    from tencent_recommendation_2025_tpu.data import synthetic

    d = synthetic.generate(tmp_path / "cold", num_users=12, num_items=50,
                           seed=3, cold_start=True)
    data = TencentGRData(d, mm_emb_ids=("81",), split="test")
    sampler = TestSampler(data, FeatureSchema.from_indexer(data.indexer,
                                                           ("81",)),
                          maxlen=20)
    saw_cold = False
    for uid in range(len(sampler)):
        s = sampler.sample(uid)
        assert np.all(s.seq <= data.itemnum), "cold ids must be zeroed"
        assert np.all(s.seq_item_sparse >= 0)
        raw = data.seq.load_user(uid)
        if any(r[1] and r[1] > data.itemnum for r in raw):
            saw_cold = True
    assert saw_cold


def test_prefetch_producer_cancels_on_early_exit():
    """Closing the prefetch generator (epoch break / preemption / crash)
    stops the producer thread instead of leaving it blocked on the full
    queue pinning device batches — a supervisor-restart loop would leak
    one thread + buffered batches per restart otherwise."""
    import threading
    import time

    import numpy as np

    from tencent_recommendation_2025_tpu.data.pipeline import (
        prefetch_to_device)

    before = threading.active_count()
    consumed = {"n": 0}

    def src():
        for i in range(100):
            consumed["n"] = i + 1
            yield np.zeros((4,))

    it = prefetch_to_device(src(), device_put=lambda x: x)
    next(it)
    it.close()                      # early consumer exit
    deadline = time.time() + 3
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before, "producer thread leaked"
    assert consumed["n"] < 100, "producer drained the source after close"
