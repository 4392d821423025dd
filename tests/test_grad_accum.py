"""Gradient accumulation (train.grad_accum_steps): G strided microbatches
inside one jitted step must reproduce the monolithic step EXACTLY — the
weighted (masked-position-count) combine makes mean-normalized losses and
their grads identical, not approximately mean-of-means."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tencent_recommendation_2025_tpu.data.dataset import TrainSampler
from tencent_recommendation_2025_tpu.data.pipeline import (TrainLoader,
                                                           train_val_split)
from tencent_recommendation_2025_tpu.train.trainer import (
    device_tables, init_state, make_optimizer, make_train_step)


def _one_batch(small_setup, cfg, seed=0):
    sampler = TrainSampler(small_setup["data"], small_setup["schema"],
                           small_setup["model"].cfg.maxlen)
    tr, _ = train_val_split(len(sampler), 0.1, 0)
    loader = TrainLoader(sampler, tr, cfg.train.batch_size, seed=seed)
    return next(iter(loader.epoch(0)))


def _cfg(small_setup, **kw):
    base = small_setup["cfg"]
    # dropout off: G>1 folds the rng per microbatch by design, so dropout
    # streams differ from the monolithic step (masks are still valid)
    model = dataclasses.replace(base.model, dropout_rate=0.0)
    return base.replace(
        model=model,
        train=dataclasses.replace(base.train, lr=1e-2, weight_decay=0.0,
                                  **kw))


def _run(small_setup, cfg, batch, extra_sites=()):
    model = small_setup["model"].__class__(
        cfg=cfg.model, schema=small_setup["schema"],
        fused=small_setup["fused"], usernum=small_setup["model"].usernum,
        itemnum=small_setup["model"].itemnum)
    tables = device_tables(small_setup["tables"])
    tx = make_optimizer(cfg)
    state = init_state(model, tx, cfg.train.seed, cfg=cfg)
    step = make_train_step(model, tx, cfg)
    state, m = step(state, jax.device_put(batch), tables["mm"], tables,
                    jax.random.key(7))
    return state, m


@pytest.mark.parametrize("loss_type", ["bce", "sampled_softmax"])
def test_accum_matches_monolithic(small_setup, loss_type):
    kw = dict(loss_type=loss_type)
    if loss_type == "sampled_softmax":
        # N == B on purpose: the shared negative list must NOT be split
        # across microbatches (it is shared by key, not by shape — the
        # flagship defaults have N == B == 128)
        kw["num_sampled_negatives"] = small_setup["cfg"].train.batch_size
    cfg1 = _cfg(small_setup, grad_accum_steps=1, **kw)
    cfg2 = _cfg(small_setup, grad_accum_steps=2, **kw)
    batch = _one_batch(small_setup, cfg1)
    if loss_type == "sampled_softmax":
        # shared negatives must match across variants (G=1 samples on
        # device with the un-folded rng)
        n = small_setup["cfg"].train.batch_size
        batch = dict(batch,
                     sampled_neg_ids=np.arange(1, n + 1, dtype=np.int32))

    s1, m1 = _run(small_setup, cfg1, batch)
    s2, m2 = _run(small_setup, cfg2, batch)
    assert float(m1["loss"]) == pytest.approx(float(m2["loss"]), rel=1e-6)
    for k in s1.params:
        for a, b in zip(jax.tree.leaves(s1.params[k]),
                        jax.tree.leaves(s2.params[k])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-7, err_msg=k)


def test_accum_with_l2_penalty_exact(small_setup):
    """The BaseLine l2-norm penalty is constant per microbatch — the
    weighted combine reproduces it (and its gradient) exactly."""
    cfg1 = _cfg(small_setup, grad_accum_steps=1, l2_emb=1e-3)
    cfg2 = _cfg(small_setup, grad_accum_steps=4, l2_emb=1e-3)
    batch = _one_batch(small_setup, cfg1)
    s1, m1 = _run(small_setup, cfg1, batch)
    s2, m2 = _run(small_setup, cfg2, batch)
    assert float(m1["loss"]) == pytest.approx(float(m2["loss"]), rel=1e-6)
    np.testing.assert_allclose(np.asarray(s1.params["item_emb"]),
                               np.asarray(s2.params["item_emb"]),
                               rtol=1e-5, atol=1e-7)


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 fake devices")
def test_accum_on_dp_mesh(small_setup):
    """Strided microbatch split keeps every data shard busy per microbatch;
    the sharded accumulated step matches the monolithic sharded step."""
    from tencent_recommendation_2025_tpu.config import MeshConfig
    from tencent_recommendation_2025_tpu.parallel import train as PT
    from tencent_recommendation_2025_tpu.parallel.mesh import build_mesh

    # each microbatch's rows must divide the data axis (the EP a2a shards
    # them): B=32, G=2 -> 16 rows per microbatch over 8 shards
    cfg1 = _cfg(small_setup, grad_accum_steps=1, batch_size=32)
    cfg2 = _cfg(small_setup, grad_accum_steps=2, batch_size=32)
    batch = _one_batch(small_setup, cfg1)
    mesh = build_mesh(MeshConfig(data=8))
    outs = {}
    for name, cfg in (("g1", cfg1), ("g2", cfg2)):
        cfg = cfg.replace(mesh=MeshConfig(data=8))
        model = small_setup["model"]
        state, tx = PT.init_sharded_state(model, cfg, mesh)
        tables = PT.shard_tables(mesh,
                                 device_tables(small_setup["tables"]))
        step = PT.make_sharded_train_step(model, tx, cfg, mesh)
        state, m = step(state, PT.shard_batch(mesh, batch), tables["mm"],
                        tables, jax.random.key(7))
        outs[name] = (state, float(m["loss"]))
    assert outs["g1"][1] == pytest.approx(outs["g2"][1], rel=1e-5)
    np.testing.assert_allclose(
        np.asarray(outs["g1"][0].params["itemdnn"]["w"]),
        np.asarray(outs["g2"][0].params["itemdnn"]["w"]),
        rtol=1e-5, atol=1e-6)


def test_accum_guards(small_setup):
    cfg = _cfg(small_setup, grad_accum_steps=2, tower_dedup=True)
    with pytest.raises(AssertionError, match="tower_dedup"):
        make_train_step(small_setup["model"], make_optimizer(cfg), cfg)
    cfg = _cfg(small_setup, grad_accum_steps=2,
               sparse_tables=("item_emb",))
    with pytest.raises(AssertionError, match="dense"):
        make_train_step(small_setup["model"], make_optimizer(cfg), cfg)
