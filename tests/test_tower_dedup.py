"""Tower dedup (``train.tower_dedup``): one item tower on the batch's unique
candidate ids + host-planned spreads must reproduce the per-position towers
EXACTLY — losses, gradients, and whole train steps. The reference runs three
full per-position feat2emb passes per step
(``model/BaseLine/model.py:352-384``); this path exists to beat that, so its
contract is bit-level equivalence with the dense layout, not approximation.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tencent_recommendation_2025_tpu.train.trainer import (
    augment_batch_dedup, augment_batch_sparse, compute_loss, device_tables,
    init_state, make_optimizer, make_train_step, tower_dedup_capacity)


def _one_batch(small_setup, cfg, seed=0):
    from tencent_recommendation_2025_tpu.data.dataset import TrainSampler
    from tencent_recommendation_2025_tpu.data.pipeline import (
        TrainLoader, train_val_split)

    sampler = TrainSampler(small_setup["data"], small_setup["schema"],
                           small_setup["model"].cfg.maxlen)
    tr, _ = train_val_split(len(sampler), 0.1, 0)
    loader = TrainLoader(sampler, tr, cfg.train.batch_size, seed=seed)
    return next(iter(loader.epoch(0)))


def _cfgs(small_setup, **train_kw):
    """(dense_cfg, dedup_cfg) over the same model; wd=l2=0 so steps match."""
    base = small_setup["cfg"]
    tr = dataclasses.replace(base.train, lr=1e-2, l2_emb=0.0,
                             weight_decay=0.0, **train_kw)
    return (base.replace(train=tr),
            base.replace(train=dataclasses.replace(tr, tower_dedup=True)))


def test_batch_features_are_id_functions(small_setup):
    """The invariant the dedup path relies on (and the real pipeline holds by
    construction): per-position item features in a batch equal the
    ItemFeatureTables rows of their ids — features are a function of the
    item id (reference ``dataset.py:130-160`` looks them up per id too)."""
    dense_cfg, _ = _cfgs(small_setup)
    batch = _one_batch(small_setup, dense_cfg)
    t = small_setup["tables"]
    item_ids = np.where(np.asarray(batch["token_type"]) == 1,
                        np.asarray(batch["seq"]), 0)
    np.testing.assert_array_equal(np.asarray(batch["seq_item_sparse"]),
                                  t.sparse[item_ids])
    np.testing.assert_array_equal(np.asarray(batch["seq_item_array"]),
                                  t.array[item_ids])
    pos = np.asarray(batch["pos"])
    np.testing.assert_array_equal(np.asarray(batch["pos_item_sparse"]),
                                  t.sparse[pos])
    np.testing.assert_array_equal(np.asarray(batch["pos_item_array"]),
                                  t.array[pos])


def test_dedup_loss_and_grads_match_dense(small_setup):
    dense_cfg, dedup_cfg = _cfgs(small_setup)
    model = small_setup["model"]
    tables = device_tables(small_setup["tables"])
    params = model.init(jax.random.key(0))
    batch = _one_batch(small_setup, dense_cfg)
    aug = augment_batch_dedup(batch, dedup_cfg, small_setup["tables"],
                              model.itemnum)
    # the dedup'd batch ships WITHOUT the per-position feature copies
    for k in ("seq_item_sparse", "seq_item_array", "pos_item_sparse",
              "pos_item_array"):
        assert k not in aug
    for train, rng in ((False, None), (True, jax.random.key(3))):
        def loss_of(b, cfg):
            return lambda p: compute_loss(model, p, b, tables["mm"], tables,
                                          cfg, train, rng)[0]
        ld, gd = jax.value_and_grad(loss_of(batch, dense_cfg))(params)
        lq, gq = jax.value_and_grad(loss_of(aug, dedup_cfg))(params)
        assert float(ld) == pytest.approx(float(lq), rel=1e-6)
        for (kp, dl), (_, ql) in zip(
                jax.tree_util.tree_leaves_with_path(gd),
                jax.tree_util.tree_leaves_with_path(gq)):
            np.testing.assert_allclose(np.asarray(dl), np.asarray(ql),
                                       rtol=1e-4, atol=1e-6,
                                       err_msg=jax.tree_util.keystr(kp))


def test_dedup_train_step_matches_dense(small_setup):
    dense_cfg, dedup_cfg = _cfgs(small_setup)
    model = small_setup["model"]
    tables = device_tables(small_setup["tables"])
    batch = _one_batch(small_setup, dense_cfg)
    key = jax.random.key(7)

    outs = {}
    for name, cfg, b in (
            ("dense", dense_cfg, batch),
            ("dedup", dedup_cfg, augment_batch_dedup(
                batch, dedup_cfg, small_setup["tables"], model.itemnum))):
        tx = make_optimizer(cfg)
        state = init_state(model, tx, cfg.train.seed, cfg=cfg)
        step = make_train_step(model, tx, cfg)
        state, metrics = step(state, jax.device_put(b), tables["mm"],
                              tables, key)
        outs[name] = (state, float(metrics["loss"]))
    assert outs["dense"][1] == pytest.approx(outs["dedup"][1], rel=1e-6)
    d, q = outs["dense"][0].params, outs["dedup"][0].params
    for k in d:
        for dl, ql in zip(jax.tree.leaves(d[k]), jax.tree.leaves(q[k])):
            np.testing.assert_allclose(np.asarray(dl), np.asarray(ql),
                                       rtol=2e-4, atol=1e-6, err_msg=k)


def test_dedup_sampled_softmax_matches(small_setup):
    """Sampled-softmax + in-batch negatives path through dedup_spreads."""
    dense_cfg, dedup_cfg = _cfgs(small_setup, loss_type="sampled_softmax",
                                 num_sampled_negatives=16,
                                 num_inbatch_negatives=8)
    model = small_setup["model"]
    tables = device_tables(small_setup["tables"])
    params = model.init(jax.random.key(0))
    batch = _one_batch(small_setup, dense_cfg)
    aug = augment_batch_dedup(batch, dedup_cfg, small_setup["tables"],
                              model.itemnum, step_key=(0, 5))
    # same negatives on the dense side (the dedup prep pre-samples them)
    dense_batch = dict(batch, sampled_neg_ids=aug["sampled_neg_ids"])
    rng = jax.random.key(11)

    def loss_of(b, cfg):
        return lambda p: compute_loss(model, p, b, tables["mm"], tables,
                                      cfg, True, rng)[0]
    ld, gd = jax.value_and_grad(loss_of(dense_batch, dense_cfg))(params)
    lq, gq = jax.value_and_grad(loss_of(aug, dedup_cfg))(params)
    assert float(ld) == pytest.approx(float(lq), rel=1e-6)
    for dl, ql in zip(jax.tree.leaves(gd), jax.tree.leaves(gq)):
        np.testing.assert_allclose(np.asarray(dl), np.asarray(ql),
                                   rtol=1e-4, atol=1e-6)


def test_dedup_with_sparse_table_matches_dense(small_setup):
    """tower_dedup composes with sparse item_emb training: the sparse prep
    keys its lookup plan on the dedup'd id column (site 'dedup')."""
    dense_cfg, dedup_cfg = _cfgs(small_setup)
    sparse_dedup_cfg = dedup_cfg.replace(train=dataclasses.replace(
        dedup_cfg.train, sparse_tables=("item_emb",)))
    model = small_setup["model"]
    tables = device_tables(small_setup["tables"])
    batch = _one_batch(small_setup, dense_cfg)
    key = jax.random.key(7)

    aug = augment_batch_dedup(batch, sparse_dedup_cfg,
                              small_setup["tables"], model.itemnum)
    aug = augment_batch_sparse(aug, sparse_dedup_cfg, model.itemnum, (0, 5))
    assert "dedup" in aug["sparse_plans"]
    assert set(aug["sparse_plans"]) == {"dedup"}

    outs = {}
    for name, cfg, b in (("dense", dense_cfg, batch),
                         ("sparse+dedup", sparse_dedup_cfg, aug)):
        tx = make_optimizer(cfg)
        state = init_state(model, tx, cfg.train.seed, cfg=cfg)
        step = make_train_step(model, tx, cfg)
        state, metrics = step(state, jax.device_put(b), tables["mm"],
                              tables, key)
        outs[name] = (state, float(metrics["loss"]))
    assert outs["dense"][1] == pytest.approx(outs["sparse+dedup"][1],
                                             rel=1e-6)
    d, q = outs["dense"][0].params, outs["sparse+dedup"][0].params
    for k in d:
        for dl, ql in zip(jax.tree.leaves(d[k]), jax.tree.leaves(q[k])):
            np.testing.assert_allclose(np.asarray(dl), np.asarray(ql),
                                       rtol=2e-4, atol=1e-6, err_msg=k)


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 fake devices")
def test_dedup_stacked_dp_matches_dense(small_setup):
    """STACKED data-parallel dedup (dedup_uids [S, cap], vmapped tower +
    spreads, a2a id-emb lookups) on an 8-device data mesh == the
    single-device dense-layout loss/grads."""
    from tencent_recommendation_2025_tpu.config import MeshConfig
    from tencent_recommendation_2025_tpu.parallel import mesh as M
    from tencent_recommendation_2025_tpu.parallel import partition

    dense_cfg, dedup_cfg = _cfgs(small_setup)
    model = small_setup["model"]
    tables = device_tables(small_setup["tables"])
    params = model.init(jax.random.key(0))
    batch = _one_batch(small_setup, dense_cfg)
    mesh = M.build_mesh(MeshConfig(data=8))

    def loss_fn(cfg, mesh_):
        def f(p, b):
            return compute_loss(model, p, b, tables["mm"], tables, cfg,
                                False, None, mesh=mesh_)[0]
        return f

    l_ref, g_ref = jax.value_and_grad(loss_fn(dense_cfg, None))(params,
                                                                batch)

    aug = augment_batch_dedup(batch, dedup_cfg, small_setup["tables"],
                              model.itemnum, n_data_shards=8)
    assert aug["dedup_uids"].ndim == 2 and aug["dedup_uids"].shape[0] == 8
    params_sh = partition.shard_params(mesh, params)
    batch_sh = jax.device_put(aug, partition.batch_shardings(mesh, aug))
    l_sh, g_sh = jax.jit(jax.value_and_grad(loss_fn(dedup_cfg, mesh)))(
        params_sh, batch_sh)
    np.testing.assert_allclose(float(l_sh), float(l_ref), rtol=2e-5)
    g_sh = partition.unpad_like(g_sh, g_ref)
    for (kp, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(g_sh),
            jax.tree_util.tree_leaves_with_path(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3,
                                   atol=2e-5,
                                   err_msg=jax.tree_util.keystr(kp))


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 fake devices")
def test_dedup_stacked_ss_negs_fallback(small_setup):
    """Stacked sampled-softmax mode ships NO negs plan (shared negatives
    tower directly) and still matches the dense path."""
    from tencent_recommendation_2025_tpu.config import MeshConfig
    from tencent_recommendation_2025_tpu.parallel import mesh as M
    from tencent_recommendation_2025_tpu.parallel import partition

    dense_cfg, dedup_cfg = _cfgs(small_setup, loss_type="sampled_softmax",
                                 num_sampled_negatives=16)
    model = small_setup["model"]
    tables = device_tables(small_setup["tables"])
    params = model.init(jax.random.key(0))
    batch = _one_batch(small_setup, dense_cfg)
    mesh = M.build_mesh(MeshConfig(data=8))
    aug = augment_batch_dedup(batch, dedup_cfg, small_setup["tables"],
                              model.itemnum, step_key=(0, 9),
                              n_data_shards=8)
    assert "dedup_negs_idx" not in aug
    dense_batch = dict(batch, sampled_neg_ids=aug["sampled_neg_ids"])

    def loss_fn(cfg, mesh_):
        def f(p, b):
            return compute_loss(model, p, b, tables["mm"], tables, cfg,
                                False, None, mesh=mesh_)[0]
        return f

    l_ref = loss_fn(dense_cfg, None)(params, dense_batch)
    params_sh = partition.shard_params(mesh, params)
    batch_sh = jax.device_put(aug, partition.batch_shardings(mesh, aug))
    l_sh = jax.jit(loss_fn(dedup_cfg, mesh))(params_sh, batch_sh)
    np.testing.assert_allclose(float(l_sh), float(l_ref), rtol=2e-5)


def test_dedup_capacity_overflow_falls_back(small_setup, capsys):
    """Capacity overflow DEGRADES TO NEUTRAL (round-4 weak #4): the batch
    ships un-dedup'd — per-position features intact, no dedup keys — with a
    rate-limited warning, and the dense trace trains it exactly. A
    production 10M-vocab run with the flagship defaults must survive
    mostly-unique batches, not crash mid-epoch."""
    from tencent_recommendation_2025_tpu.train import trainer as TR

    dense_cfg, dedup_cfg = _cfgs(small_setup)
    tiny = dedup_cfg.replace(train=dataclasses.replace(
        dedup_cfg.train, tower_dedup_cap_frac=1e-4))
    batch = _one_batch(small_setup, dense_cfg)
    TR._DEDUP_FALLBACKS["n"] = 0
    out = augment_batch_dedup(batch, tiny, small_setup["tables"],
                              small_setup["model"].itemnum)
    assert "dedup_uids" not in out
    assert "seq_item_sparse" in out and "pos_item_sparse" in out
    assert "tower-dedup fallback #1" in capsys.readouterr().out
    # second overflow is silent (rate-limited)
    augment_batch_dedup(batch, tiny, small_setup["tables"],
                        small_setup["model"].itemnum)
    assert "fallback" not in capsys.readouterr().out

    # the fallback batch trains through the dense trace bit-for-bit
    model = small_setup["model"]
    tables = device_tables(small_setup["tables"])
    key = jax.random.key(7)
    outs = {}
    for name, b in (("dense", batch), ("fallback", out)):
        tx = make_optimizer(tiny)
        state = init_state(model, tx, tiny.train.seed, cfg=tiny)
        state, m = make_train_step(model, tx, tiny)(
            state, jax.device_put(b), tables["mm"], tables, key)
        outs[name] = float(m["loss"])
    assert outs["dense"] == pytest.approx(outs["fallback"], rel=1e-6)


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 fake devices")
def test_dedup_stacked_with_sparse_table_matches_dense(small_setup):
    """STACKED dedup x sparse item_emb on an 8-device data mesh (round-4
    verdict item 5b — the sharded_multihost operating point): the full
    sharded gather-train step with the stacked tower + spreads matches the
    single-device dense step, loss and updated table contents."""
    from tencent_recommendation_2025_tpu.config import MeshConfig
    from tencent_recommendation_2025_tpu.ops import sparse_table as ST
    from tencent_recommendation_2025_tpu.parallel import train as PT
    from tencent_recommendation_2025_tpu.parallel.mesh import build_mesh

    dense_cfg, dedup_cfg = _cfgs(small_setup)
    sp_cfg = dedup_cfg.replace(
        mesh=MeshConfig(data=8),
        train=dataclasses.replace(dedup_cfg.train,
                                  sparse_tables=("item_emb",)))
    model = small_setup["model"]
    tables = device_tables(small_setup["tables"])
    batch = _one_batch(small_setup, dense_cfg)
    key = jax.random.key(7)

    tx = make_optimizer(dense_cfg)
    s0 = init_state(model, tx, dense_cfg.train.seed, cfg=dense_cfg)
    s0, m0 = make_train_step(model, tx, dense_cfg)(
        s0, jax.device_put(batch), tables["mm"], tables, key)

    mesh = build_mesh(sp_cfg.mesh)
    aug = augment_batch_dedup(batch, sp_cfg, small_setup["tables"],
                              model.itemnum, n_data_shards=8)
    aug = augment_batch_sparse(aug, sp_cfg, model.itemnum, (0, 5),
                               n_table_shards=ST.mesh_table_shards(mesh))
    assert aug["dedup_uids"].ndim == 2 and "dedup" in aug["sparse_plans"]
    state, tx_m = PT.init_sharded_state(model, sp_cfg, mesh)
    stables = PT.shard_tables(mesh, tables)
    step_m = PT.make_sharded_train_step(model, tx_m, sp_cfg, mesh)
    state, m = step_m(state, PT.shard_batch(mesh, aug), stables["mm"],
                      stables, key)
    assert float(m["loss"]) == pytest.approx(float(m0["loss"]), rel=1e-5)
    V = model.itemnum + 1
    np.testing.assert_allclose(
        np.asarray(state.params["item_emb"])[:V],
        np.asarray(s0.params["item_emb"]), rtol=2e-3, atol=2e-5)


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 fake devices")
def test_dedup_stacked_sparse_with_tp_matches_dense(small_setup):
    """The sharded_multihost preset SHAPE (data x model mesh + sparse
    item_emb): stacked dedup composes with TP'd tower weights — the [S, cap]
    plan stacks over DATA shards while XLA SPMD shards the tower matmuls
    over model. Full sharded step == single-device dense step."""
    from tencent_recommendation_2025_tpu.config import MeshConfig
    from tencent_recommendation_2025_tpu.ops import sparse_table as ST
    from tencent_recommendation_2025_tpu.parallel import train as PT
    from tencent_recommendation_2025_tpu.parallel.mesh import build_mesh

    dense_cfg, dedup_cfg = _cfgs(small_setup)
    sp_cfg = dedup_cfg.replace(
        mesh=MeshConfig(data=4, model=2),
        train=dataclasses.replace(dedup_cfg.train,
                                  sparse_tables=("item_emb",)))
    model = small_setup["model"]
    tables = device_tables(small_setup["tables"])
    batch = _one_batch(small_setup, dense_cfg)
    key = jax.random.key(7)

    tx = make_optimizer(dense_cfg)
    s0 = init_state(model, tx, dense_cfg.train.seed, cfg=dense_cfg)
    s0, m0 = make_train_step(model, tx, dense_cfg)(
        s0, jax.device_put(batch), tables["mm"], tables, key)

    mesh = build_mesh(sp_cfg.mesh)
    aug = augment_batch_dedup(batch, sp_cfg, small_setup["tables"],
                              model.itemnum, n_data_shards=4)
    aug = augment_batch_sparse(aug, sp_cfg, model.itemnum, (0, 5),
                               n_table_shards=ST.mesh_table_shards(mesh))
    assert aug["dedup_uids"].shape[0] == 4
    state, tx_m = PT.init_sharded_state(model, sp_cfg, mesh)
    stables = PT.shard_tables(mesh, tables)
    step_m = PT.make_sharded_train_step(model, tx_m, sp_cfg, mesh)
    state, m = step_m(state, PT.shard_batch(mesh, aug), stables["mm"],
                      stables, key)
    assert float(m["loss"]) == pytest.approx(float(m0["loss"]), rel=1e-5)
    V = model.itemnum + 1
    np.testing.assert_allclose(
        np.asarray(state.params["item_emb"])[:V],
        np.asarray(s0.params["item_emb"]), rtol=2e-3, atol=2e-5)


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 fake devices")
def test_stacked_partition_rejects_flat_plan(small_setup):
    """ADVICE r4: a single-device 1-D dedup plan on a data>1 mesh must fail
    loudly at sharding time, not silently spread along the capacity dim."""
    from tencent_recommendation_2025_tpu.config import MeshConfig
    from tencent_recommendation_2025_tpu.parallel import partition
    from tencent_recommendation_2025_tpu.parallel.mesh import build_mesh

    dense_cfg, dedup_cfg = _cfgs(small_setup)
    batch = _one_batch(small_setup, dense_cfg)
    flat = augment_batch_dedup(batch, dedup_cfg, small_setup["tables"],
                               small_setup["model"].itemnum)  # 1-D plan
    mesh = build_mesh(MeshConfig(data=8))
    with pytest.raises(ValueError, match="stacked tower-dedup"):
        partition.batch_shardings(mesh, flat)


def test_tower_dedup_capacity_clamps():
    from tencent_recommendation_2025_tpu.config import (Config, ModelConfig,
                                                        TrainConfig)

    cfg = Config(model=ModelConfig(maxlen=127),
                 train=TrainConfig(batch_size=4, tower_dedup=True))
    # stream = 2*B*L + B = 1028; frac 0.75 -> 771 -> rounded to 776
    assert tower_dedup_capacity(cfg, itemnum=10**6) == 776
    # vocab clamp: unique ids can't exceed itemnum+1
    assert tower_dedup_capacity(cfg, itemnum=100) <= 104
    assert tower_dedup_capacity(cfg, itemnum=100) % 8 == 0
