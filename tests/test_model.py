"""Model-layer unit tests with numpy oracles (SURVEY.md §4 plan)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tencent_recommendation_2025_tpu.config import ModelConfig
from tencent_recommendation_2025_tpu.models import embedding as E
from tencent_recommendation_2025_tpu.models import encoder as ENC
from tencent_recommendation_2025_tpu.models.attention import (
    init_mha_params, mha, safe_masked_softmax)
from tencent_recommendation_2025_tpu.models.hstu import (
    hstu_block, init_hstu_params, rel_pos_bias)


def test_masked_take_padding_zero():
    table = jnp.asarray(np.random.default_rng(0).standard_normal((10, 4)))
    ids = jnp.asarray([[0, 1, 2], [3, 0, 9]])
    out = E.masked_take(table, ids)
    np.testing.assert_allclose(out[0, 0], np.zeros(4))
    np.testing.assert_allclose(out[1, 1], np.zeros(4))
    np.testing.assert_allclose(np.asarray(out[0, 1]), np.asarray(table[1]))


def test_masked_take_zero_grad_to_padding_row():
    table = jnp.ones((5, 3))
    ids = jnp.asarray([0, 1, 0, 2])

    def f(t):
        return E.masked_take(t, ids).sum()

    g = jax.grad(f)(table)
    np.testing.assert_allclose(np.asarray(g[0]), np.zeros(3))
    np.testing.assert_allclose(np.asarray(g[1]), np.ones(3))


def test_fused_lookup_matches_per_feature():
    """Fused-table lookup == looking up separate per-feature tables."""
    rng = np.random.default_rng(1)
    vocab = {"a": 5, "b": 7}
    offsets = np.array([0, 6])  # a: rows 1..5, b: rows 7..13
    total = 14
    table = rng.standard_normal((total, 4)).astype(np.float32)
    ids = rng.integers(0, 5, (3, 2, 2)).astype(np.int32)  # [..., F=2]
    out = E.fused_feature_lookup(jnp.asarray(table), jnp.asarray(ids),
                                 jnp.asarray(offsets, jnp.int32))
    for f in range(2):
        for idx in np.ndindex(3, 2):
            v = ids[idx][f]
            expect = np.zeros(4) if v == 0 else table[offsets[f] + v]
            np.testing.assert_allclose(np.asarray(out[idx][f]), expect,
                                       rtol=1e-6)


def test_safe_masked_softmax_all_masked_rows():
    scores = jnp.asarray(np.random.default_rng(2).standard_normal((2, 4, 4)),
                         jnp.float32)
    mask = jnp.zeros((2, 4, 4), bool).at[:, 2:, :2].set(True)
    p = safe_masked_softmax(scores, mask)
    assert not np.any(np.isnan(np.asarray(p)))
    np.testing.assert_allclose(np.asarray(p[:, :2]).sum(), 0.0)
    np.testing.assert_allclose(np.asarray(p[:, 2:]).sum(-1), 1.0, rtol=1e-6)


def test_mha_matches_numpy_oracle():
    """MHA == explicit per-head numpy attention."""
    rng = np.random.default_rng(3)
    B, L, D, H = 2, 5, 8, 2
    params = init_mha_params(jax.random.key(0), D)
    x = rng.standard_normal((B, L, D)).astype(np.float32)
    mask = np.tril(np.ones((L, L), bool))[None].repeat(B, 0)
    out = mha(params, jnp.asarray(x), jnp.asarray(mask), H)

    def lin(p, v):
        return v @ np.asarray(p["w"]) + np.asarray(p["b"])

    q = lin(params["q"], x).reshape(B, L, H, D // H).transpose(0, 2, 1, 3)
    k = lin(params["k"], x).reshape(B, L, H, D // H).transpose(0, 2, 1, 3)
    v = lin(params["v"], x).reshape(B, L, H, D // H).transpose(0, 2, 1, 3)
    s = q @ k.transpose(0, 1, 3, 2) / np.sqrt(D // H)
    s = np.where(mask[:, None], s, -1e30)
    p = np.exp(s - s.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    o = (p @ v).transpose(0, 2, 1, 3).reshape(B, L, D)
    expect = lin(params["o"], o)
    np.testing.assert_allclose(np.asarray(out), expect, rtol=2e-4, atol=2e-5)


def test_hstu_block_causality_and_shapes():
    B, L, D, H = 2, 6, 16, 4
    params = init_hstu_params(jax.random.key(1), D, H)
    x = jnp.asarray(np.random.default_rng(4).standard_normal((B, L, D)),
                    jnp.float32)
    tril = np.tril(np.ones((L, L), bool))[None].repeat(B, 0)
    out = hstu_block(params, x, jnp.asarray(tril), H)
    assert out.shape == (B, L, D)
    # causality: output at position t must not change when future tokens do
    x2 = x.at[:, -1, :].set(0.0)
    out2 = hstu_block(params, x2, jnp.asarray(tril), H)
    np.testing.assert_allclose(np.asarray(out[:, :-1]),
                               np.asarray(out2[:, :-1]), rtol=1e-5, atol=1e-6)


def test_rel_pos_bias_bucketing():
    rab = jnp.asarray(np.arange(2 * 4, dtype=np.float32).reshape(2, 4))
    b = rel_pos_bias(rab, 6)
    assert b.shape == (2, 6, 6)
    # distance 0 on the diagonal; clamped at buckets-1 far below it
    np.testing.assert_allclose(np.asarray(b[0, 3, 3]), 0.0)
    np.testing.assert_allclose(np.asarray(b[0, 5, 0]), 3.0)  # clamp(5, 3)


def test_swiglu_hidden_dim_o1_rule():
    # D=64, mult 4 -> 2/3*256 = 170.67 -> round to 256 (BaseLineO1 sizing)
    assert ENC.swiglu_hidden_dim(64, 4.0, 256) == 256
    assert ENC.swiglu_hidden_dim(512, 4.0, 256) == 1536


def test_encoder_shapes_and_padding_positions(small_setup):
    model = small_setup["model"]
    cfg = model.cfg
    params = model.init(jax.random.key(0))
    # pos ids are zeroed where seq id is 0 => padding rows get pos row 0 (zeros)
    B, L = 2, cfg.maxlen + 1
    fused_emb = jnp.zeros((B, L, cfg.hidden_units))
    seq_ids = jnp.zeros((B, L), jnp.int32)
    tt = jnp.zeros((B, L), jnp.int32)
    out = ENC.encode(params, fused_emb, seq_ids, tt, params["pos_emb"],
                     cfg, train=False)
    assert out.shape == (B, L, cfg.hidden_units)
    assert not np.any(np.isnan(np.asarray(out)))


def test_full_forward_and_logits(small_setup):
    import numpy as np

    from tencent_recommendation_2025_tpu.data.dataset import TrainSampler
    from tencent_recommendation_2025_tpu.data.pipeline import collate_train
    from tencent_recommendation_2025_tpu.train.trainer import device_tables

    model = small_setup["model"]
    sampler = TrainSampler(small_setup["data"], small_setup["schema"],
                           maxlen=model.cfg.maxlen)
    rng = np.random.default_rng(0)
    batch = collate_train([sampler.sample(i, rng) for i in range(4)], 4)
    params = model.init(jax.random.key(0))
    tables = device_tables(small_setup["tables"])
    pos_l, neg_l, mask = model.logits(params, batch, tables["mm"], tables,
                                      train=False)
    assert pos_l.shape == (4, model.cfg.maxlen + 1)
    # logits masked outside prediction positions
    m = np.asarray(mask)
    np.testing.assert_allclose(np.asarray(pos_l)[~m], 0.0)
    assert not np.any(np.isnan(np.asarray(pos_l)))


def test_onehot_bwd_matches_scatter_grad():
    """fused_feature_lookup's one-hot-matmul backward == take's scatter-add."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(7)
    offsets = (0, 6, 14)
    sizes = (5, 7, 4)
    total = 20
    table = jnp.asarray(rng.standard_normal((total, 8)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, 5, (4, 3, 3)), jnp.int32)  # [..., F=3]
    off = jnp.asarray(offsets, jnp.int32)
    cot = jnp.asarray(rng.standard_normal((4, 3, 3, 8)), jnp.float32)

    def f_onehot(t):
        return (E.fused_feature_lookup(t, ids, off,
                                       vocab_sizes=(offsets, sizes)) * cot).sum()

    def f_plain(t):
        return (E.fused_feature_lookup(t, ids, off) * cot).sum()

    g1 = jax.grad(f_onehot)(table)
    g2 = jax.grad(f_plain)(table)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-5,
                               atol=1e-6)


def test_onehot_bwd_repeated_offsets_matches():
    """Array-feature flattening repeats offsets; grouped grads must match."""
    import jax

    rng = np.random.default_rng(8)
    offsets = (0, 0, 0, 6, 6)      # feature A x3 capacity slots, B x2
    sizes = (5, 5, 5, 4, 4)
    table = jnp.asarray(rng.standard_normal((11, 4)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, 5, (6, 5)), jnp.int32)
    off = jnp.asarray(offsets, jnp.int32)
    cot = jnp.asarray(rng.standard_normal((6, 5, 4)), jnp.float32)

    def f_onehot(t):
        return (E.fused_feature_lookup(t, ids, off,
                                       vocab_sizes=(offsets, sizes)) * cot).sum()

    def f_plain(t):
        return (E.fused_feature_lookup(t, ids, off) * cot).sum()

    g1 = jax.grad(f_onehot)(table)
    g2 = jax.grad(f_plain)(table)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-5,
                               atol=1e-6)


def test_compact_user_tower_matches_full(small_setup):
    """fuse_sequence's gathered-K user tower (compute on the first
    MAX_USER_TOKENS_PER_ROW user-token positions, broadcast the
    zero-input constant elsewhere) == running the user tower at every
    position — outputs AND gradients, on real sampler batches."""
    import jax
    import jax.numpy as jnp

    from tencent_recommendation_2025_tpu.data.dataset import TrainSampler
    from tencent_recommendation_2025_tpu.data.pipeline import collate_train
    from tencent_recommendation_2025_tpu.models import embedding as E

    model = small_setup["model"]
    cfg = model.cfg
    sampler = TrainSampler(small_setup["data"], small_setup["schema"],
                           maxlen=cfg.maxlen)
    rng = np.random.default_rng(3)
    batch = collate_train([sampler.sample(i, rng) for i in range(8)], 8)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    params = model.init(jax.random.key(2))
    tables = small_setup["tables"]
    mm = {k: jnp.asarray(v) for k, v in tables.mm.items()}

    def full_reference(p):
        """The pre-optimization wiring: towers at every position."""
        seq, tt = batch["seq"], batch["token_type"]
        item_ids = jnp.where(tt == 1, seq, 0)
        user_ids = jnp.where(tt == 2, seq, 0)
        mm_vecs = E.gather_mm(mm, item_ids, small_setup["schema"],
                              dtype=jnp.dtype(cfg.dtype))
        it = E.item_tower(p, item_ids, batch["seq_item_sparse"],
                          batch["seq_item_array"], mm_vecs,
                          small_setup["fused"], small_setup["schema"], cfg)
        ut = E.user_tower(p, user_ids, batch["seq_user_sparse"],
                          batch["seq_user_array"], small_setup["fused"], cfg)
        return it + ut

    got = E.fuse_sequence(params, batch, mm, small_setup["fused"],
                          small_setup["schema"], cfg)
    want = full_reference(params)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=2e-2, atol=1e-5)  # bf16 compute

    cot = jnp.asarray(np.random.default_rng(5).standard_normal(got.shape),
                      jnp.float32)
    g_new = jax.grad(lambda p: (E.fuse_sequence(
        p, batch, mm, small_setup["fused"], small_setup["schema"], cfg)
        .astype(jnp.float32) * cot).sum())(params)
    g_old = jax.grad(lambda p: (full_reference(p).astype(jnp.float32)
                                * cot).sum())(params)
    for path, a in jax.tree_util.tree_leaves_with_path(g_new):
        b = dict(jax.tree_util.tree_leaves_with_path(g_old))[path]
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-2, atol=2e-3,
            err_msg=jax.tree_util.keystr(path))


def test_user_token_cap_guard():
    """A sequence with more user-profile tokens than the cap fails loudly
    at the sampler (the device fast path would silently drop them)."""
    from tencent_recommendation_2025_tpu.data.dataset import (
        _build_ext_sequence)

    recs = [[7, 0, {"103": 1}, None, None, 0]] * 3 \
        + [[0, 5, None, {"100": 2}, 1, 0]]
    with pytest.raises(ValueError, match="MAX_USER_TOKENS_PER_ROW"):
        _build_ext_sequence(recs, test_mode=False, itemnum=10)


def test_pos_tower_reuse_matches_direct(small_setup):
    """forward()'s positives tower (seq item tower shifted by one + final
    column) == running the item tower directly on batch['pos'] at every
    loss-masked position."""
    import jax
    import jax.numpy as jnp

    from tencent_recommendation_2025_tpu.data.dataset import TrainSampler
    from tencent_recommendation_2025_tpu.data.pipeline import collate_train
    from tencent_recommendation_2025_tpu.train.trainer import device_tables

    model = small_setup["model"]
    sampler = TrainSampler(small_setup["data"], small_setup["schema"],
                           maxlen=model.cfg.maxlen)
    rng = np.random.default_rng(11)
    batch = collate_train([sampler.sample(i, rng) for i in range(8)], 8)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    params = model.init(jax.random.key(0))
    tables = device_tables(small_setup["tables"])

    _, pos_embs, _ = model.forward(params, batch, tables["mm"], tables,
                                   train=False)
    direct = model.item_embeddings(params, batch["pos"],
                                   batch["pos_item_sparse"],
                                   batch["pos_item_array"], tables["mm"])
    mask = np.asarray(batch["next_token_type"] == 1)
    got = np.asarray(pos_embs, np.float32)[mask]
    want = np.asarray(direct, np.float32)[mask]
    assert mask.sum() > 50
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=1e-5)
