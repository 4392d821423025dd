"""Multi-device tests on the fake 8-CPU mesh (SURVEY.md §4): sharded lookup ==
dense lookup, gradient combine, all-to-all exchange, ring == dense attention,
DP gradient equivalence."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from tencent_recommendation_2025_tpu.config import MeshConfig
from tencent_recommendation_2025_tpu.parallel import (mesh as M,
                                                      partition,
                                                      ring_attention as RA,
                                                      sharded_embedding as SE)

requires_8 = pytest.mark.skipif(jax.device_count() < 8,
                                reason="needs 8 fake devices")


@pytest.fixture(scope="module")
def mesh8():
    return M.build_mesh(MeshConfig(data=4, model=2, seq=1))


@pytest.fixture(scope="module")
def mesh_seq():
    return M.build_mesh(MeshConfig(data=2, model=1, seq=4))


@requires_8
def test_sharded_lookup_matches_dense(mesh8):
    rng = np.random.default_rng(0)
    V, D = 50, 8
    table = jnp.asarray(rng.standard_normal((V, D)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, V, (8, 5)), jnp.int32)
    out = SE.sharded_lookup(mesh8, table, ids)
    ref = SE.dense_lookup_oracle(table, ids)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6)


@requires_8
def test_sharded_lookup_gradient_combine(mesh8):
    """Transpose of the sharded lookup == dense scatter-add gradient."""
    rng = np.random.default_rng(1)
    V, D = 37, 4
    table = jnp.asarray(rng.standard_normal((V, D)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, V, (8, 3)), jnp.int32)
    cot = jnp.asarray(rng.standard_normal((8, 3, D)), jnp.float32)

    def f_sharded(t):
        return (SE.sharded_lookup(mesh8, t, ids) * cot).sum()

    def f_dense(t):
        return (SE.dense_lookup_oracle(t, ids) * cot).sum()

    g_s = jax.grad(f_sharded)(table)
    g_d = jax.grad(f_dense)(table)
    np.testing.assert_allclose(np.asarray(g_s)[:V], np.asarray(g_d),
                               rtol=1e-5, atol=1e-6)


@requires_8
def test_a2a_lookup_matches_dense():
    mesh = M.build_mesh(MeshConfig(data=8, model=1, seq=1))
    rng = np.random.default_rng(2)
    V, D = 64, 8
    table = jnp.asarray(rng.standard_normal((V, D)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, V, (16, 4)), jnp.int32)
    out = SE.sharded_lookup_a2a(mesh, table, ids, capacity_factor=8.0)
    ref = SE.dense_lookup_oracle(table, ids)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6)


@requires_8
def test_a2a_lookup_gradient_matches_dense():
    """Transpose of the a2a id-exchange lookup == dense scatter-add grad
    (the path was forward-only-tested in round 1)."""
    mesh = M.build_mesh(MeshConfig(data=8, model=1, seq=1))
    rng = np.random.default_rng(5)
    V, D = 64, 8
    table = jnp.asarray(rng.standard_normal((V, D)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, V, (16, 4)), jnp.int32)
    cot = jnp.asarray(rng.standard_normal((16, 4, D)), jnp.float32)

    def f_a2a(t):
        return (SE.sharded_lookup_a2a(mesh, t, ids,
                                      capacity_factor=8.0) * cot).sum()

    def f_dense(t):
        return (SE.dense_lookup_oracle(t, ids) * cot).sum()

    g_s = jax.grad(f_a2a)(table)
    g_d = jax.grad(f_dense)(table)
    np.testing.assert_allclose(np.asarray(g_s)[:V], np.asarray(g_d),
                               rtol=1e-5, atol=1e-6)


@requires_8
def test_a2a_overflow_counter():
    """Bucket overflow returns zero vectors AND a nonzero global counter —
    the runtime signal for an under-sized capacity_factor."""
    mesh = M.build_mesh(MeshConfig(data=8, model=1, seq=1))
    V, D = 64, 8
    rng = np.random.default_rng(6)
    table = jnp.asarray(rng.standard_normal((V, D)), jnp.float32)
    # every id on one rank owned by shard 0 -> bucket overflow at cap 1
    ids = jnp.asarray(np.full((8, 8), 1), jnp.int32)
    out, n_over = SE.sharded_lookup_a2a(mesh, table, ids,
                                        capacity_factor=0.125,
                                        return_overflow=True)
    assert int(n_over) > 0
    # ample capacity: no overflow, exact match
    out2, n2 = SE.sharded_lookup_a2a(mesh, table, ids, capacity_factor=8.0,
                                     return_overflow=True)
    assert int(n2) == 0
    np.testing.assert_allclose(np.asarray(out2),
                               np.asarray(SE.dense_lookup_oracle(table, ids)),
                               rtol=1e-6)


@requires_8
def test_ring_attention_matches_dense(mesh_seq):
    from tencent_recommendation_2025_tpu.models.attention import (
        safe_masked_softmax)

    rng = np.random.default_rng(3)
    B, H, L, hd = 2, 2, 16, 4
    q = jnp.asarray(rng.standard_normal((B, H, L, hd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, L, hd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, L, hd)), jnp.float32)
    valid = np.ones((B, L), bool)
    valid[:, :5] = False  # left padding
    out = RA.ring_attention(mesh_seq, q, k, v, jnp.asarray(valid))

    # dense oracle
    causal = np.tril(np.ones((L, L), bool))
    mask = causal[None] & valid[:, None, :]
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) * (hd ** -0.5)
    p = safe_masked_softmax(s, jnp.asarray(mask)[:, None])
    ref = jnp.einsum("bhqk,bhkd->bhqd", p, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


@requires_8
def test_ring_hstu_matches_dense(mesh_seq):
    rng = np.random.default_rng(4)
    B, H, L, hd = 2, 2, 16, 4
    buckets = 8
    q = jnp.asarray(rng.standard_normal((B, H, L, hd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, L, hd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, L, hd)), jnp.float32)
    rab = jnp.asarray(rng.standard_normal((H, buckets)), jnp.float32) * 0.1
    valid = np.ones((B, L), bool)
    valid[0, :3] = False
    scale = hd ** -0.5
    out = RA.ring_hstu_attention(mesh_seq, q, k, v, jnp.asarray(valid),
                                 rab, scale, seq_len=L)

    qp = np.arange(L)
    dist = np.clip(qp[:, None] - qp[None, :], 0, buckets - 1)
    s = np.einsum("bhqd,bhkd->bhqk", q, k) * scale + \
        np.asarray(rab)[:, dist][None]
    mask = (np.tril(np.ones((L, L), bool))[None] & valid[:, None, :])[:, None]
    a = jax.nn.silu(jnp.asarray(s)) * mask / L
    ref = jnp.einsum("bhqk,bhkd->bhqd", a, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


@requires_8
def test_partition_rules_cover_model(small_setup, mesh8):
    params = small_setup["model"].init(jax.random.key(0))
    shardings = partition.param_shardings(mesh8, params)
    # tables row-sharded, pos table replicated, dnn column-split
    assert shardings["item_emb"].spec == P(("pipe", "data", "model"), None)
    assert shardings["pos_emb"].spec == P()
    assert shardings["itemdnn"]["w"].spec == P(None, "model")
    assert shardings["blocks"]["attn"]["o"]["w"].spec == \
        P("pipe", "model", None)
    # every leaf got a sharding
    assert len(jax.tree.leaves(shardings, is_leaf=lambda x: isinstance(
        x, NamedSharding))) == len(jax.tree.leaves(params))


@requires_8
def test_dp_grad_equivalence(small_setup, mesh8):
    """Sharded-jit loss/grad == single-device loss/grad on the same batch."""
    import numpy as np

    from tencent_recommendation_2025_tpu.data.dataset import TrainSampler
    from tencent_recommendation_2025_tpu.data.pipeline import collate_train
    from tencent_recommendation_2025_tpu.train.trainer import (compute_loss,
                                                               device_tables)

    model = small_setup["model"]
    cfg = small_setup["cfg"]
    sampler = TrainSampler(small_setup["data"], small_setup["schema"],
                           maxlen=model.cfg.maxlen)
    rng = np.random.default_rng(0)
    batch = collate_train([sampler.sample(i, rng) for i in range(8)], 8)
    params = model.init(jax.random.key(0))
    tables = device_tables(small_setup["tables"])

    def loss_fn(p, b):
        return compute_loss(model, p, b, tables["mm"], tables, cfg,
                            train=False, rng=None)[0]

    l_ref, g_ref = jax.value_and_grad(loss_fn)(params, batch)

    params_sh = partition.shard_params(mesh8, params)
    batch_sh = jax.device_put(batch, partition.batch_shardings(mesh8, batch))
    l_sh, g_sh = jax.jit(jax.value_and_grad(loss_fn))(params_sh, batch_sh)
    np.testing.assert_allclose(float(l_sh), float(l_ref), rtol=2e-5)
    g_sh = partition.unpad_like(g_sh, g_ref)
    for a, b in zip(jax.tree.leaves(g_sh), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3,
                                   atol=2e-5)


@requires_8
def test_dense_mesh_step_routes_through_explicit_a2a(small_setup):
    """The dense data-parallel mesh step's id-embedding gathers ride the
    explicit all-to-all (models/baseline._ep_override — XLA's default SPMD
    choice all-reduces the FULL dense table gradient, benchmarks/ep_ab.py):
    the compiled train step contains all-to-all ops AND its loss matches
    the single-device step."""
    from tencent_recommendation_2025_tpu.parallel import train as PT
    from tencent_recommendation_2025_tpu.parallel.mesh import build_mesh
    from tencent_recommendation_2025_tpu.train.trainer import (
        device_tables, init_state, make_optimizer, make_train_step)
    from tencent_recommendation_2025_tpu.data.dataset import TrainSampler
    from tencent_recommendation_2025_tpu.data.pipeline import collate_train

    model = small_setup["model"]
    cfg = small_setup["cfg"].replace(mesh=MeshConfig(data=8))
    sampler = TrainSampler(small_setup["data"], small_setup["schema"],
                           maxlen=model.cfg.maxlen)
    rng = np.random.default_rng(1)
    batch = collate_train([sampler.sample(i, rng) for i in range(8)], 8)
    tables = device_tables(small_setup["tables"])
    key = jax.random.key(5)

    # single-device reference
    tx = make_optimizer(cfg)
    s0 = init_state(model, tx, cfg.train.seed, cfg=cfg)
    _, m0 = make_train_step(model, tx, cfg)(
        s0, jax.device_put(batch), tables["mm"], tables, key)

    mesh = build_mesh(cfg.mesh)
    state, tx_m = PT.init_sharded_state(model, cfg, mesh)
    stables = PT.shard_tables(mesh, tables)
    step = PT.make_sharded_train_step(model, tx_m, cfg, mesh)
    bsh = PT.shard_batch(mesh, batch)
    hlo = step.lower(state, bsh, stables["mm"], stables, key) \
        .compile().as_text()
    assert "all-to-all" in hlo, "explicit EP a2a not in the compiled step"
    state, metrics = step(state, bsh, stables["mm"], stables, key)
    assert float(metrics["loss"]) == pytest.approx(float(m0["loss"]),
                                                   rel=2e-5)
    # the a2a's bucket-overflow counter is surfaced and zero here (ADVICE
    # r3: overflowed ids silently return zero embeddings — observable now)
    assert "ep_overflow" in metrics
    assert int(metrics["ep_overflow"]) == 0


def test_ep_overflow_scope_isolates_interleaved_traces():
    """VERDICT r4 item 9: the overflow accumulator is trace-pure — two
    threads tracing concurrently through ep_overflow_scope each collect only
    their own counts (the old object.__setattr__ on the shared frozen model
    would interleave); nesting save/restores the outer scope."""
    import threading
    import time as _t

    from tencent_recommendation_2025_tpu.models.baseline import (
        _EP_OVERFLOW_ACC, ep_overflow_scope)

    results = {}
    barrier = threading.Barrier(2)

    def worker(name, value, delay):
        with ep_overflow_scope() as scope:
            barrier.wait()          # both threads inside their scopes
            _t.sleep(delay)
            acc = _EP_OVERFLOW_ACC.get()
            acc.append(value)       # what _ep_override does mid-trace
            _t.sleep(0.05 - delay)
            results[name] = list(scope.counts)

    ts = [threading.Thread(target=worker, args=("a", 1, 0.0)),
          threading.Thread(target=worker, args=("b", 2, 0.02))]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert results == {"a": [1], "b": [2]}

    # nesting restores the outer accumulator
    with ep_overflow_scope() as outer:
        _EP_OVERFLOW_ACC.get().append(10)
        with ep_overflow_scope() as inner:
            _EP_OVERFLOW_ACC.get().append(20)
        _EP_OVERFLOW_ACC.get().append(30)
    assert outer.counts == [10, 30] and inner.counts == [20]
    assert _EP_OVERFLOW_ACC.get() is None


def test_dense_bigtable_mixed_mesh_warns(mesh8):
    """VERDICT r3 item 6: a >=1M-row dense table on a mesh with model>1
    warns (XLA default SPMD all-reduces the full table gradient there);
    sparse/packed/GatheredRows tables and data-only meshes stay silent."""
    import warnings

    from tencent_recommendation_2025_tpu.config import Config
    from tencent_recommendation_2025_tpu.ops.sparse_table import (
        packed_table_shape)
    from tencent_recommendation_2025_tpu.train.trainer import (
        BIGTABLE_WARN_ROWS, _warn_dense_bigtable_mixed_mesh)

    cfg = Config()
    big = jax.ShapeDtypeStruct((BIGTABLE_WARN_ROWS, 64), jnp.float32)
    with pytest.warns(UserWarning, match="mixed mesh"):
        _warn_dense_bigtable_mixed_mesh({"item_emb": big}, cfg, mesh8)

    with warnings.catch_warnings():
        warnings.simplefilter("error")
        # data-only mesh: the explicit a2a covers it
        data_only = M.build_mesh(MeshConfig(data=8))
        _warn_dense_bigtable_mixed_mesh({"item_emb": big}, cfg, data_only)
        # sparse-trained table: host-planned gather-train, no dense grad
        import dataclasses
        cfg_sp = cfg.replace(train=dataclasses.replace(
            cfg.train, sparse_tables=("item_emb",)))
        _warn_dense_bigtable_mixed_mesh({"item_emb": big}, cfg_sp, mesh8)
        # packed storage implies the sparse path too (packing kicks in at
        # TABLE_PACK_MIN_ROWS=30M, well above the warn threshold)
        packed = jax.ShapeDtypeStruct(
            packed_table_shape(30_000_000, 64), jnp.float32)
        _warn_dense_bigtable_mixed_mesh({"item_emb": packed}, cfg, mesh8)
        # small tables are fine anywhere
        small = jax.ShapeDtypeStruct((1000, 64), jnp.float32)
        _warn_dense_bigtable_mixed_mesh({"item_emb": small}, cfg, mesh8)
