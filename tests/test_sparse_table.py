"""Sparse embedding-table training (ops/sparse_table.py): the gather-train
pattern must reproduce dense training exactly where they overlap, touch only
the dedup'd rows, and run sharded. Replaces the reference's dense
nn.Embedding + AdamW table update (``model/BaseLine/model.py:115-117``,
``main.py:131``) with an O(touched-rows) step."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tencent_recommendation_2025_tpu.ops import sparse_table as ST


def test_gathered_rows_lookup_matches_dense():
    rng = np.random.default_rng(0)
    V, D = 1000, 16
    table = jnp.asarray(rng.standard_normal((V, D)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, V, (4, 37)), jnp.int32)
    ids = ids.at[0, :5].set(0)  # padding lanes
    uids = ST.unique_touched(ids, capacity=ids.size, vocab_rows=V)
    g = ST.gather_rows(table, uids)

    from tencent_recommendation_2025_tpu.models.embedding import masked_take

    got = masked_take(g, ids)
    want = masked_take(table, ids)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want))


def test_lazy_adam_matches_numpy_sparse_adam():
    """apply_row_update(lazy_adam) vs a numpy SparseAdam oracle, 3 steps with
    different touched sets."""
    rng = np.random.default_rng(1)
    V, D = 64, 8
    table = rng.standard_normal((V, D)).astype(np.float32)
    mu = np.zeros_like(table)
    nu = np.zeros_like(table)
    # copies: jnp.asarray can be ZERO-COPY on CPU, and the numpy oracle
    # mutates its arrays in place — aliasing would corrupt the jax side
    jt = jnp.array(table, copy=True)
    jopt = {"mu": jnp.array(mu, copy=True), "nu": jnp.array(nu, copy=True)}
    lr, b1, b2, eps = 1e-2, 0.9, 0.98, 1e-8

    for t in range(1, 4):
        touched = rng.choice(V, size=10, replace=False)
        grads_raw = rng.standard_normal((10, D)).astype(np.float32)
        order = np.argsort(touched)
        uids_np, grads = touched[order], grads_raw[order]
        # numpy oracle (torch SparseAdam semantics: global t for touched rows)
        for u, g in zip(uids_np, grads):
            mu[u] = b1 * mu[u] + (1 - b1) * g
            nu[u] = b2 * nu[u] + (1 - b2) * g * g
            mhat = mu[u] / (1 - b1 ** t)
            nhat = nu[u] / (1 - b2 ** t)
            table[u] -= lr * mhat / (np.sqrt(nhat) + eps)
        # kernel under test (pad uids to capacity 16 with the sentinel)
        uids = jnp.asarray(np.concatenate([uids_np,
                                           np.full(6, V)]), jnp.int32)
        drows = jnp.asarray(np.concatenate([grads, np.zeros((6, D),
                                                            np.float32)]))
        jt, jopt = ST.apply_row_update(jt, jopt, uids, drows,
                                       kind="lazy_adam", lr=lr,
                                       step=jnp.asarray(t), b1=b1, b2=b2,
                                       eps=eps)
    np.testing.assert_allclose(np.asarray(jt), table, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(jopt["mu"]), mu, rtol=1e-5,
                               atol=1e-6)


@pytest.fixture(scope="module")
def sparse_setup(small_setup):
    """Two configs over the same model: dense vs sparse item_emb training
    (wd=0, l2=0 so the overlap is exact)."""
    from tencent_recommendation_2025_tpu.config import TrainConfig

    base = small_setup["cfg"]
    tr = TrainConfig(batch_size=8, lr=1e-2, l2_emb=0.0, weight_decay=0.0)
    dense_cfg = base.replace(train=tr)
    sparse_cfg = base.replace(train=dataclasses.replace(
        tr, sparse_tables=("item_emb",)))
    return dense_cfg, sparse_cfg


def _one_batch(small_setup, cfg, seed=0):
    from tencent_recommendation_2025_tpu.data.dataset import TrainSampler
    from tencent_recommendation_2025_tpu.data.pipeline import (TrainLoader,
                                                               train_val_split)

    sampler = TrainSampler(small_setup["data"], small_setup["schema"],
                           small_setup["model"].cfg.maxlen)
    tr, _ = train_val_split(len(sampler), 0.1, 0)
    loader = TrainLoader(sampler, tr, cfg.train.batch_size, seed=seed)
    return next(iter(loader.epoch(0)))


def test_sparse_step_matches_dense_step(small_setup, sparse_setup):
    """Step 1 from identical init: loss identical, ALL params match the dense
    step (untouched rows have zero grad and zero moments at t=1, so dense
    Adam leaves them unchanged too)."""
    from tencent_recommendation_2025_tpu.train.trainer import (
        device_tables, init_state, make_optimizer, make_train_step)

    dense_cfg, sparse_cfg = sparse_setup
    model = small_setup["model"]
    tables = device_tables(small_setup["tables"])
    batch = jax.device_put(_one_batch(small_setup, dense_cfg))
    key = jax.random.key(7)

    outs = {}
    for name, cfg in (("dense", dense_cfg), ("sparse", sparse_cfg)):
        tx = make_optimizer(cfg)
        state = init_state(model, tx, cfg.train.seed, cfg=cfg)
        step = make_train_step(model, tx, cfg)
        state, metrics = step(state, batch, tables["mm"], tables, key)
        outs[name] = (state, float(metrics["loss"]))

    assert outs["dense"][1] == pytest.approx(outs["sparse"][1], rel=1e-6)
    d, s = outs["dense"][0].params, outs["sparse"][0].params
    for k in d:
        for dl, sl in zip(jax.tree.leaves(d[k]), jax.tree.leaves(s[k])):
            np.testing.assert_allclose(np.asarray(dl), np.asarray(sl),
                                       rtol=2e-4, atol=1e-6, err_msg=k)


def test_sparse_untouched_rows_frozen(small_setup, sparse_setup):
    """Across several steps, rows never referenced by any batch stay
    bit-identical to their init values (the O(touched) guarantee)."""
    from tencent_recommendation_2025_tpu.train.trainer import (
        device_tables, init_state, make_optimizer, make_train_step)

    _, sparse_cfg = sparse_setup
    model = small_setup["model"]
    tables = device_tables(small_setup["tables"])
    tx = make_optimizer(sparse_cfg)
    state = init_state(model, tx, sparse_cfg.train.seed, cfg=sparse_cfg)
    init_table = np.asarray(state.params["item_emb"]).copy()
    step = make_train_step(model, tx, sparse_cfg)
    key = jax.random.key(3)

    touched = set()
    for i in range(3):
        batch = _one_batch(small_setup, sparse_cfg, seed=i)
        touched |= set(np.asarray(batch["seq"]).ravel().tolist())
        touched |= set(np.asarray(batch["pos"]).ravel().tolist())
        touched |= set(np.asarray(batch["neg"]).ravel().tolist())
        state, m = step(state, jax.device_put(batch), tables["mm"], tables,
                        key)
        assert np.isfinite(float(m["loss"]))

    final = np.asarray(state.params["item_emb"])
    untouched = sorted(set(range(final.shape[0])) - touched)
    assert untouched, "fixture too small: every row touched"
    np.testing.assert_array_equal(final[untouched], init_table[untouched])
    # and the lazy-Adam moments of untouched rows never moved either
    mu = np.asarray(state.opt_state["tables"]["item_emb"]["mu"])
    np.testing.assert_array_equal(mu[untouched], 0.0)
    # touched rows DID move
    moved = sorted(t for t in touched if t > 0)
    assert np.abs(final[moved] - init_table[moved]).max() > 0


def test_planned_lookup_gradient_matches_scatter_add():
    """The scatter-free segment-sum backward == the naive scatter-add
    transpose (host plan vs autodiff of take)."""
    rng = np.random.default_rng(3)
    K, N, D = 50, 200, 8
    rows = jnp.asarray(rng.standard_normal((K, D)), jnp.float32)
    idx_np = rng.integers(0, K, (4, 50)).astype(np.int32)  # duplicates
    uids_np = np.arange(K)
    plan = ST.build_lookup_plan(uids_np, idx_np)  # uids == identity here
    cot = jnp.asarray(rng.standard_normal((4, 50, D)), jnp.float32)

    def f_planned(r):
        return (ST.planned_lookup(r, jnp.asarray(plan["idx"]),
                                  jnp.asarray(plan["perm"]),
                                  jnp.asarray(plan["starts"]),
                                  jnp.asarray(plan["ends"])) * cot).sum()

    def f_naive(r):
        return (jnp.take(r, jnp.asarray(idx_np), axis=0) * cot).sum()

    g_p = jax.grad(f_planned)(rows)
    g_n = jax.grad(f_naive)(rows)
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_n), rtol=1e-5,
                               atol=1e-5)


def test_host_augmented_batch_matches_device_dedup(small_setup, sparse_setup):
    """The host-precomputed touched_uids path (the fast TPU path — device
    sort is pathologically slow) must produce the same step as the jit-side
    jnp.unique fallback."""
    from tencent_recommendation_2025_tpu.train.trainer import (
        augment_batch_sparse, device_tables, init_state, make_optimizer,
        make_train_step, sparse_touch_capacity)

    _, sparse_cfg = sparse_setup
    model = small_setup["model"]
    tables = device_tables(small_setup["tables"])
    batch = _one_batch(small_setup, sparse_cfg)
    aug = augment_batch_sparse(batch, sparse_cfg, model.itemnum, (0, 5))
    assert aug["touched_uids"].shape == (sparse_touch_capacity(sparse_cfg),)
    key = jax.random.key(9)

    outs = []
    for b in (batch, aug):
        tx = make_optimizer(sparse_cfg)
        state = init_state(model, tx, sparse_cfg.train.seed, cfg=sparse_cfg)
        step = make_train_step(model, tx, sparse_cfg)
        state, m = step(state, jax.device_put(b), tables["mm"], tables, key)
        outs.append((float(m["loss"]), np.asarray(state.params["item_emb"])))
    assert outs[0][0] == pytest.approx(outs[1][0], rel=1e-6)
    np.testing.assert_allclose(outs[0][1], outs[1][1], rtol=1e-6, atol=1e-7)


def test_rowwise_adagrad_trains(small_setup, sparse_setup):
    from tencent_recommendation_2025_tpu.train.trainer import (
        device_tables, init_state, make_optimizer, make_train_step)

    _, sparse_cfg = sparse_setup
    cfg = sparse_cfg.replace(train=dataclasses.replace(
        sparse_cfg.train, table_optimizer="rowwise_adagrad"))
    model = small_setup["model"]
    tables = device_tables(small_setup["tables"])
    tx = make_optimizer(cfg)
    state = init_state(model, tx, cfg.train.seed, cfg=cfg)
    assert set(state.opt_state["tables"]["item_emb"]) == {"acc"}
    step = make_train_step(model, tx, cfg)
    key = jax.random.key(3)
    batch = jax.device_put(_one_batch(small_setup, cfg))
    losses = []
    for _ in range(8):
        state, m = step(state, batch, tables["mm"], tables, key)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]


def test_sparse_sharded_step(small_setup, sparse_setup):
    """The sparse branch composes with the mesh: one sharded step on the
    8-device mesh, table + moments stay row-sharded, loss finite and equal
    to the single-device sparse step."""
    import __graft_entry__  # noqa: F401  (repo root already on sys.path)
    from tencent_recommendation_2025_tpu.config import MeshConfig
    from tencent_recommendation_2025_tpu.parallel import train as PT
    from tencent_recommendation_2025_tpu.parallel.mesh import build_mesh
    from tencent_recommendation_2025_tpu.train.trainer import (
        device_tables, init_state, make_optimizer, make_train_step)

    _, sparse_cfg = sparse_setup
    cfg = sparse_cfg.replace(mesh=MeshConfig(data=8))
    model = small_setup["model"]
    batch = _one_batch(small_setup, cfg)
    key = jax.random.key(11)

    # single-device reference
    tx = make_optimizer(cfg)
    s0 = init_state(model, tx, cfg.train.seed, cfg=cfg)
    m0 = make_train_step(model, tx, cfg)(
        s0, jax.device_put(batch), device_tables(small_setup["tables"])["mm"],
        device_tables(small_setup["tables"]), key)[1]

    mesh = build_mesh(cfg.mesh)
    state, tx = PT.init_sharded_state(model, cfg, mesh)
    tables = PT.shard_tables(mesh, device_tables(small_setup["tables"]))
    step = PT.make_sharded_train_step(model, tx, cfg, mesh)
    state, metrics = step(state, PT.shard_batch(mesh, batch), tables["mm"],
                          tables, key)
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["loss"]) == pytest.approx(float(m0["loss"]),
                                                   rel=1e-5)
    assert len(state.params["item_emb"].sharding.device_set) == 8
    mu = state.opt_state["tables"]["item_emb"]["mu"]
    assert len(mu.sharding.device_set) == 8


def test_bf16_master_table_trains(small_setup, sparse_setup):
    """table_dtype=bfloat16: the learned item_emb masters in bf16 (halves
    the single-chip table + staged-copy footprint); rowwise-Adagrad math
    stays f32 and the loss still decreases."""
    from tencent_recommendation_2025_tpu.models.baseline import SeqRecModel
    from tencent_recommendation_2025_tpu.train.trainer import (
        device_tables, init_state, make_optimizer, make_train_step)

    _, sparse_cfg = sparse_setup
    cfg = sparse_cfg.replace(
        model=dataclasses.replace(sparse_cfg.model, table_dtype="bfloat16"),
        train=dataclasses.replace(sparse_cfg.train,
                                  table_optimizer="rowwise_adagrad"))
    model = SeqRecModel(cfg=cfg.model, schema=small_setup["schema"],
                        fused=small_setup["fused"],
                        usernum=small_setup["data"].usernum,
                        itemnum=small_setup["data"].itemnum)
    tables = device_tables(small_setup["tables"])
    tx = make_optimizer(cfg)
    state = init_state(model, tx, cfg.train.seed, cfg=cfg)
    assert state.params["item_emb"].dtype == jnp.bfloat16
    step = make_train_step(model, tx, cfg)
    key = jax.random.key(4)
    batch = jax.device_put(_one_batch(small_setup, cfg))
    losses = []
    for _ in range(8):
        state, m = step(state, batch, tables["mm"], tables, key)
        losses.append(float(m["loss"]))
    assert state.params["item_emb"].dtype == jnp.bfloat16
    assert losses[-1] < losses[0]


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("use_pallas", [False, True])
def test_group_scatter_apply_matches_xla(dtype, use_pallas):
    """Packed group scatter (host plan -> merged [R, D] blocks ->
    whole-group writes, XLA and interpret-Pallas variants) ==
    .at[uids].set(mode='drop') on the unpacked view; sentinel uids
    skipped; untouched slots of touched groups keep their old values.
    (The real-TPU Pallas validation runs in the sparse bench.)"""
    rng = np.random.default_rng(6)
    V, D, K = 512, 64, 24          # V % 32 == 0; several uids share a group
    R = ST.scatter_group_rows(dtype, D)
    assert R == 16
    table = jnp.asarray(rng.standard_normal((V, D)), dtype)
    packed = table.reshape(V // R, 8, 128)
    assert ST.is_packed(packed) and ST.table_rows(packed, D) == V
    vals = jnp.asarray(rng.standard_normal((K, D)), dtype)
    uids = np.full((K,), V, np.int64)          # sentinel-filled
    real = np.sort(rng.choice(V, size=17, replace=False))
    uids[:17] = real                           # sorted unique prefix
    plan = ST.host_group_plan(uids, V, R)
    assert plan["groups"].shape[0] % 8 == 0
    assert plan["slot_src"].shape == (plan["groups"].shape[0], R)
    want = np.asarray(table.at[jnp.asarray(uids)].set(vals, mode="drop"))
    got3 = ST.group_scatter_apply(
        packed, vals, {k: jnp.asarray(v) for k, v in plan.items()},
        use_pallas=use_pallas, interpret=True)
    got = np.asarray(got3).reshape(V, D)
    np.testing.assert_allclose(got.astype(np.float32),
                               want.astype(np.float32), rtol=1e-6)


def test_row_take_packed_matches_unpacked():
    """row_take on the packed [V/R, 8, 128] view == plain row gather."""
    rng = np.random.default_rng(11)
    V, D = 2048, 64
    table = jnp.asarray(rng.standard_normal((V, D)), jnp.float32)
    packed = table.reshape(V // 16, 8, 128)
    ids = jnp.asarray(rng.integers(0, V, size=(7, 33)))
    np.testing.assert_allclose(
        np.asarray(ST.row_take(packed, ids, dim=D)),
        np.asarray(jnp.take(table, ids, axis=0)), rtol=1e-6)


def test_gather_rows_grouped_and_scatter_roundtrip():
    """Group gather == gather_rows on the touched uids, and the full
    grouped update (gather -> new rows -> scatter reusing the gathered
    buffer as old content) == the XLA row-scatter oracle."""
    rng = np.random.default_rng(8)
    V, D = 1024, 64
    table = jnp.asarray(rng.standard_normal((V, D)), jnp.float32)
    R = ST.scatter_group_rows(table.dtype, D)
    packed = table.reshape(V // R, 8, 128)
    uids_np = np.full((40,), V, np.int64)
    uids_np[:23] = np.sort(rng.choice(V, size=23, replace=False))
    uids = jnp.asarray(uids_np)
    plan = {k: jnp.asarray(v)
            for k, v in ST.host_group_plan(uids_np, V, R).items()}

    gathered, group_buf = ST.gather_rows_grouped(packed, uids, plan, dim=D)
    want_rows = ST.gather_rows(table, uids).rows
    np.testing.assert_allclose(np.asarray(gathered.rows),
                               np.asarray(want_rows), rtol=1e-6)

    vals = jnp.asarray(rng.standard_normal((40, D)), jnp.float32)
    got3 = ST.group_scatter_apply(packed, vals, plan, old3=group_buf,
                                  use_pallas=True, interpret=True)
    want = table.at[uids].set(vals, mode="drop")
    np.testing.assert_allclose(np.asarray(got3).reshape(V, D),
                               np.asarray(want), rtol=1e-6)


@pytest.mark.parametrize("table_dtype,table_optimizer",
                         [("float32", "rowwise_adagrad"),
                          ("bfloat16", "rowwise_adagrad"),
                          ("float32", "lazy_adam")])
def test_packed_table_step_matches_unpacked(small_setup, sparse_setup,
                                            monkeypatch, table_dtype,
                                            table_optimizer):
    """The full product step on a PACKED table (host group plan -> grouped
    gather -> GatheredRows loss -> grouped scatter) reproduces the
    unpacked XLA-scatter step exactly, loss and table contents both —
    f32 and the 50M-config bf16 master table."""
    from tencent_recommendation_2025_tpu.train.trainer import (
        augment_batch_sparse, device_tables, init_state, make_optimizer,
        make_train_step)

    _, sparse_cfg = sparse_setup
    cfg = sparse_cfg.replace(
        model=dataclasses.replace(sparse_cfg.model, table_dtype=table_dtype),
        train=dataclasses.replace(
            sparse_cfg.train, table_optimizer=table_optimizer))
    from tencent_recommendation_2025_tpu.models.baseline import SeqRecModel

    base = small_setup["model"]
    model = SeqRecModel(cfg=cfg.model, schema=small_setup["schema"],
                        fused=small_setup["fused"],
                        usernum=base.usernum, itemnum=base.itemnum)
    tables = device_tables(small_setup["tables"])
    batch = _one_batch(small_setup, cfg)
    key = jax.random.key(12)
    D = cfg.model.hidden_units
    V = model.itemnum + 1

    # unpacked baseline
    tx = make_optimizer(cfg)
    state_u = init_state(model, tx, cfg.train.seed, cfg=cfg)
    table0 = np.asarray(state_u.params["item_emb"])
    aug_u = jax.device_put(augment_batch_sparse(batch, cfg, model.itemnum,
                                                (0, 7)))
    step_u = make_train_step(model, tx, cfg)
    losses_u = []
    for _ in range(3):
        state_u, m = step_u(state_u, aug_u, tables["mm"], tables, key)
        losses_u.append(float(m["loss"]))

    # packed twin: same initial table, padded + packed
    monkeypatch.setattr(ST, "TABLE_PACK_MIN_ROWS", 1)
    Vp = ST.padded_table_rows(V)
    R = ST.scatter_group_rows(table0.dtype, D)
    padded = np.zeros((Vp, D), table0.dtype)
    padded[:V] = table0
    packed = jnp.asarray(padded).reshape(Vp // R, 8, 128)
    state_p = init_state(model, tx, cfg.train.seed, cfg=cfg)
    params = dict(state_p.params)
    assert ST.is_packed(params["item_emb"])   # init packs under the patch
    params["item_emb"] = packed               # align contents with baseline
    opt = dict(state_p.opt_state)
    state_p = type(state_p)(params, opt, state_p.step)
    aug_p = jax.device_put(augment_batch_sparse(batch, cfg, model.itemnum,
                                                (0, 7)))
    assert "scatter_groups" in aug_p
    step_p = make_train_step(model, tx, cfg)
    losses_p = []
    for _ in range(3):
        state_p, m = step_p(state_p, aug_p, tables["mm"], tables, key)
        losses_p.append(float(m["loss"]))

    np.testing.assert_allclose(losses_p, losses_u, rtol=1e-6)
    got = np.asarray(state_p.params["item_emb"]).reshape(Vp, D)[:V]
    np.testing.assert_allclose(got, np.asarray(state_u.params["item_emb"]),
                               rtol=1e-6, atol=1e-7)


def test_packed_table_inference_matches_unpacked(small_setup, sparse_setup):
    """The EVAL/serving path (masked_take -> row_take on a packed table,
    no GatheredRows) produces identical encodings to the unpacked table."""
    from tencent_recommendation_2025_tpu.train.trainer import (
        device_tables, init_state, make_optimizer)

    _, sparse_cfg = sparse_setup
    model = small_setup["model"]
    tables = device_tables(small_setup["tables"])
    batch = jax.device_put(_one_batch(small_setup, sparse_cfg))
    tx = make_optimizer(sparse_cfg)
    state = init_state(model, tx, sparse_cfg.train.seed, cfg=sparse_cfg)
    D = sparse_cfg.model.hidden_units
    V = model.itemnum + 1
    want = np.asarray(model.predict(state.params, batch, tables["mm"]))

    R = ST.scatter_group_rows(jnp.float32, D)
    Vp = -(-V // 32) * 32
    table0 = np.asarray(state.params["item_emb"])
    padded = np.zeros((Vp, D), table0.dtype)
    padded[:V] = table0
    params = dict(state.params)
    params["item_emb"] = jnp.asarray(padded).reshape(Vp // R, 8, 128)
    got = np.asarray(model.predict(params, batch, tables["mm"]))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_group_scatter_apply_chunked(monkeypatch):
    """The chunked merge (one aliased kernel call per chunk, bounding the
    temporaries) == the XLA row-scatter oracle across chunk boundaries."""
    monkeypatch.setattr(ST, "_SCATTER_CHUNK_GROUPS", 1024)
    rng = np.random.default_rng(17)
    V, D = 64 * 512, 64            # room for >1024 distinct groups
    R = ST.scatter_group_rows(jnp.float32, D)
    table = jnp.asarray(rng.standard_normal((V, D)), jnp.float32)
    packed = table.reshape(V // R, 8, 128)
    n_real = 1500                  # spans two 1024-group chunks
    uids_np = np.sort(rng.choice(V, size=n_real, replace=False))
    uids_full = np.full((n_real + 36,), V, np.int64)
    uids_full[:n_real] = uids_np
    vals = jnp.asarray(rng.standard_normal((len(uids_full), D)), jnp.float32)
    plan = {k: jnp.asarray(v)
            for k, v in ST.host_group_plan(uids_full, V, R).items()}
    assert plan["groups"].shape[0] > 1024    # really multi-chunk
    got3 = ST.group_scatter_apply(packed, vals, plan, use_pallas=True,
                                  interpret=True)
    want = table.at[jnp.asarray(uids_full)].set(vals, mode="drop")
    np.testing.assert_allclose(np.asarray(got3).reshape(V, D),
                               np.asarray(want), rtol=1e-6)


def test_pallas_group_gather_matches_take():
    """The fallback Pallas DMA group gather (not on the product path — XLA
    dim-0 take measured faster on HW) == jnp.take on real groups; sentinel
    groups' output blocks are skipped (never read)."""
    rng = np.random.default_rng(13)
    nG, S = 64, 8
    table3 = jnp.asarray(rng.standard_normal((nG, S, 128)), jnp.float32)
    K = 1024                                   # one SMEM id chunk
    groups = np.full((K,), nG, np.int32)
    real = rng.choice(nG, size=20, replace=False).astype(np.int32)
    groups[:20] = real
    out = np.asarray(ST.pallas_group_gather(table3, jnp.asarray(groups),
                                            interpret=True))
    want = np.asarray(jnp.take(table3, jnp.asarray(real), axis=0))
    np.testing.assert_allclose(out[:20], want, rtol=1e-6)


def test_packed_table_requires_sparse_and_no_mesh(small_setup, sparse_setup,
                                                  monkeypatch):
    """Guards: packed-scale tables must train sparsely, and the mesh-sharded
    packed path supports the rowwise-Adagrad optimizer only."""
    from tencent_recommendation_2025_tpu.train.trainer import (
        make_optimizer, make_train_step)

    monkeypatch.setattr(ST, "TABLE_PACK_MIN_ROWS", 1)
    dense_cfg, sparse_cfg = sparse_setup
    model = small_setup["model"]
    tx = make_optimizer(dense_cfg)
    with pytest.raises(AssertionError, match="sparse"):
        make_train_step(model, tx, dense_cfg)
    from jax.sharding import Mesh
    mesh = Mesh(np.array(jax.devices()[:2]).reshape(2), ("data",))
    lazy_cfg = sparse_cfg.replace(train=dataclasses.replace(
        sparse_cfg.train, table_optimizer="lazy_adam"))
    with pytest.raises(AssertionError, match="rowwise_adagrad"):
        make_train_step(model, tx, lazy_cfg, mesh=mesh)


def test_sharded_packed_step_matches_single_device(small_setup, sparse_setup,
                                                   monkeypatch):
    """A PACKED table sharded over the 8-device mesh — per-shard packed
    [G/S, 8, 128] slices, shard_map local gather + explicit all-gather over
    the table axes, per-shard group scatter (ops/sparse_table.
    sharded_gather_rows / sharded_apply_row_update) — reproduces the
    single-device packed step exactly: losses and final table contents.
    The 100M-row sharded target's mechanism (BASELINE.json configs[4]),
    replacing the reference's single-device nn.Embedding
    (model/BaseLine/model.py:115-117) at mesh scale."""
    import __graft_entry__  # noqa: F401
    from tencent_recommendation_2025_tpu.config import MeshConfig
    from tencent_recommendation_2025_tpu.models.baseline import SeqRecModel
    from tencent_recommendation_2025_tpu.parallel import train as PT
    from tencent_recommendation_2025_tpu.parallel.mesh import build_mesh
    from tencent_recommendation_2025_tpu.train.trainer import (
        augment_batch_sparse, device_tables, init_state, make_optimizer,
        make_train_step)

    monkeypatch.setattr(ST, "TABLE_PACK_MIN_ROWS", 1)
    _, sparse_cfg = sparse_setup
    cfg = sparse_cfg.replace(train=dataclasses.replace(
        sparse_cfg.train, table_optimizer="rowwise_adagrad"))
    base = small_setup["model"]
    model = SeqRecModel(cfg=cfg.model, schema=small_setup["schema"],
                        fused=small_setup["fused"],
                        usernum=base.usernum, itemnum=base.itemnum)
    tables = device_tables(small_setup["tables"])
    batch = _one_batch(small_setup, cfg)
    key = jax.random.key(23)

    # single-device packed baseline
    tx = make_optimizer(cfg)
    state_1 = init_state(model, tx, cfg.train.seed, cfg=cfg)
    assert ST.is_packed(state_1.params["item_emb"])
    table0 = np.asarray(state_1.params["item_emb"])
    aug_1 = jax.device_put(augment_batch_sparse(batch, cfg, model.itemnum,
                                                (0, 7)))
    step_1 = make_train_step(model, tx, cfg)
    losses_1 = []
    for _ in range(3):
        state_1, m = step_1(state_1, aug_1, tables["mm"], tables, key)
        losses_1.append(float(m["loss"]))

    # mesh twin: same init (init_sharded_state uses the same seed)
    mcfg = cfg.replace(mesh=MeshConfig(data=8))
    mesh = build_mesh(mcfg.mesh)
    state_m, tx_m = PT.init_sharded_state(model, mcfg, mesh)
    assert ST.is_packed(state_m.params["item_emb"])
    np.testing.assert_array_equal(np.asarray(state_m.params["item_emb"]),
                                  table0)
    aug_m = augment_batch_sparse(batch, mcfg, model.itemnum, (0, 7),
                                 n_table_shards=ST.mesh_table_shards(mesh))
    assert "tshard_lids" in aug_m
    stables = PT.shard_tables(mesh, tables)
    step_m = PT.make_sharded_train_step(model, tx_m, mcfg, mesh)
    losses_m = []
    for _ in range(3):
        state_m, m = step_m(state_m, PT.shard_batch(mesh, aug_m),
                            stables["mm"], stables, key)
        losses_m.append(float(m["loss"]))

    np.testing.assert_allclose(losses_m, losses_1, rtol=1e-5)
    # table stayed sharded over 8 devices, per-shard slices packed
    assert len(state_m.params["item_emb"].sharding.device_set) == 8
    np.testing.assert_allclose(np.asarray(state_m.params["item_emb"]),
                               np.asarray(state_1.params["item_emb"]),
                               rtol=1e-5, atol=1e-6)
    acc_m = state_m.opt_state["tables"]["item_emb"]["acc"]
    np.testing.assert_allclose(
        np.asarray(acc_m),
        np.asarray(state_1.opt_state["tables"]["item_emb"]["acc"]),
        rtol=1e-5, atol=1e-7)


def test_host_shard_plan_contract():
    """Per-shard plan: local ids/groups per owner shard, slot_src points at
    the shard's LOCAL new-rows tensor, pos rebuilds global uid order from
    the owner-blocked all-gather."""
    V, R, S = 64 * 32, 16, 4                  # 2048 rows, 512/shard
    uids = np.array([0, 5, 511, 512, 513, 1030, 2000, V, V, V], np.int64)
    cap = ST.shard_capacity(len(uids), S, slack=1.0)
    plan = ST.host_shard_plan(uids, V, R, S, cap)
    rps = V // S
    # owners: 0,0,0 | 1,1 | 2 | 3
    assert list(plan["lids"][0][:3]) == [0, 5, 511]
    assert list(plan["lids"][1][:2]) == [0, 1]
    assert list(plan["lids"][2][:1]) == [1030 - 2 * rps]
    assert list(plan["lids"][3][:1]) == [2000 - 3 * rps]
    assert (plan["lids"][0][3:] == rps).all()
    # gpos maps back to the global uid order
    assert list(plan["gpos"][0][:3]) == [0, 1, 2]
    assert list(plan["gpos"][1][:2]) == [3, 4]
    assert plan["gpos"][2][0] == 5 and plan["gpos"][3][0] == 6
    # pos: uid i lives at owner*cap + local_rank
    want_pos = [0, 1, 2, cap, cap + 1, 2 * cap, 3 * cap]
    assert list(plan["pos"][:7]) == want_pos
    # slot_src: shard 0 group 0 slots 0 and 5 -> local rows 0 and 1
    ss0 = plan["slot_src"][0]
    assert ss0[0, 0] == 0 and ss0[0, 5] == 1
    nGl = rps // R
    assert (plan["groups"][0][:2] < nGl).all()
    # overflow raises rather than dropping rows, and the message points at
    # the config knob (ownership is contiguous-range, so clustered id
    # layouts can overload one shard — ADVICE r3)
    with pytest.raises(ValueError, match="train.sparse_shard_slack"):
        ST.host_shard_plan(np.arange(cap + 1, dtype=np.int64), V, R, 1, cap)


def test_host_group_plan_contract():
    """groups are unique + sentinel-padded; slot_src points each touched
    (group, slot) at its uid's position; untouched slots carry K."""
    V, R = 64 * 32, 16
    uids = np.array([0, 1, 17, 18, 31, 900, V, V, V, V], np.int64)
    plan = ST.host_group_plan(uids, V, R)
    K = plan["groups"].shape[0]
    nG = V // R
    real_groups = plan["groups"][plan["groups"] < nG]
    assert list(real_groups) == [0, 1, 56]     # 0//16, 17//16, 900//16
    assert (plan["groups"][3:] == nG).all()
    ss = plan["slot_src"]
    assert ss[0, 0] == 0 and ss[0, 1] == 1 and ss[1, 1] == 2 \
        and ss[1, 2] == 3 and ss[1, 15] == 4 and ss[2, 900 % 16] == 5
    touched = ss < K
    assert touched.sum() == 6                  # exactly the 6 real uids


def test_multi_table_sparse_matches_dense(small_setup, sparse_setup):
    """sparse_tables=('item_emb','user_emb') (VERDICT r3 item 5): step-1
    loss and BOTH tables match the dense step, via the jit-side dedup
    fallback AND the host-augmented (@user_emb-suffixed plans) path; the
    step emits the MEASURED dedup'd touched-row count."""
    from tencent_recommendation_2025_tpu.train.trainer import (
        augment_batch_sparse, device_tables, init_state, make_optimizer,
        make_train_step)

    dense_cfg, _ = sparse_setup
    multi_cfg = dense_cfg.replace(train=dataclasses.replace(
        dense_cfg.train, sparse_tables=("item_emb", "user_emb")))
    model = small_setup["model"]
    tables = device_tables(small_setup["tables"])
    raw = _one_batch(small_setup, dense_cfg)
    aug = augment_batch_sparse(raw, multi_cfg, model.itemnum, (0, 11),
                               usernum=model.usernum)
    assert "touched_uids@user_emb" in aug and "sparse_plans@user_emb" in aug
    key = jax.random.key(7)

    outs = {}
    for name, cfg, batch in (("dense", dense_cfg, raw),
                             ("fallback", multi_cfg, raw),
                             ("augmented", multi_cfg, aug)):
        tx = make_optimizer(cfg)
        state = init_state(model, tx, cfg.train.seed, cfg=cfg)
        step = make_train_step(model, tx, cfg)
        state, metrics = step(state, jax.device_put(batch), tables["mm"],
                              tables, key)
        outs[name] = (state, metrics)

    loss_d = float(outs["dense"][1]["loss"])
    for variant in ("fallback", "augmented"):
        state, metrics = outs[variant]
        assert float(metrics["loss"]) == pytest.approx(loss_d, rel=1e-6)
        for tbl in ("item_emb", "user_emb", "userdnn"):
            got = state.params[tbl]
            want = outs["dense"][0].params[tbl]
            np.testing.assert_allclose(
                np.asarray(jax.tree.leaves(got)[0]),
                np.asarray(jax.tree.leaves(want)[0]),
                rtol=2e-6, atol=2e-7, err_msg=f"{variant}:{tbl}")

    # measured touched-rows telemetry == the true dedup'd count (item+user)
    item_ids = np.concatenate([
        np.where(raw["token_type"] == 1, raw["seq"], 0).reshape(-1),
        np.asarray(raw["pos"]).reshape(-1),
        np.asarray(raw["neg"]).reshape(-1)])
    user_ids = np.where(raw["token_type"] == 2, raw["seq"], 0).reshape(-1)
    want_rows = np.unique(item_ids).size + np.unique(user_ids).size
    assert int(outs["augmented"][1]["touched_rows"]) == want_rows
    assert int(outs["fallback"][1]["touched_rows"]) == want_rows


def test_user_only_sparse_runs(small_setup, sparse_setup):
    """sparse_tables=('user_emb',) alone also trains (item stays dense)."""
    from tencent_recommendation_2025_tpu.train.trainer import (
        device_tables, init_state, make_optimizer, make_train_step)

    dense_cfg, _ = sparse_setup
    cfg = dense_cfg.replace(train=dataclasses.replace(
        dense_cfg.train, sparse_tables=("user_emb",)))
    model = small_setup["model"]
    tables = device_tables(small_setup["tables"])
    batch = jax.device_put(_one_batch(small_setup, cfg))
    tx = make_optimizer(cfg)
    state = init_state(model, tx, cfg.train.seed, cfg=cfg)
    step = make_train_step(model, tx, cfg)
    state, metrics = step(state, batch, tables["mm"], tables,
                          jax.random.key(1))
    assert np.isfinite(float(metrics["loss"]))
    assert int(metrics["touched_rows"]) > 0
