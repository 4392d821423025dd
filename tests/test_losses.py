"""Loss-math oracles: reference BCE semantics and sampled-softmax logQ."""

import jax
import jax.numpy as jnp
import numpy as np

from tencent_recommendation_2025_tpu.ops import losses as L


def test_bce_matches_numpy():
    rng = np.random.default_rng(0)
    pos = rng.standard_normal((4, 6)).astype(np.float32)
    neg = rng.standard_normal((4, 6)).astype(np.float32)
    mask = rng.random((4, 6)) < 0.5
    got = float(L.reference_bce_loss(jnp.asarray(pos), jnp.asarray(neg),
                                     jnp.asarray(mask)))

    def bce(x, y):
        p = 1 / (1 + np.exp(-x))
        return -(y * np.log(p + 1e-12) + (1 - y) * np.log(1 - p + 1e-12))

    n = mask.sum()
    want = bce(pos[mask], 1).mean() + bce(neg[mask], 0).mean() \
        if n else 0.0
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_l2_penalty_is_unsquared_norm():
    """BaseLine applies l2_emb * ||W|| (torch.norm), NOT ||W||^2
    (reference main.py:184-185)."""
    w = jnp.asarray(np.full((3, 4), 2.0, np.float32))
    got = float(L.l2_emb_penalty(w, 0.5))
    np.testing.assert_allclose(got, 0.5 * np.sqrt(12 * 4.0), rtol=1e-6)


def test_sampled_softmax_logq_and_accidental_hits():
    rng = np.random.default_rng(1)
    B, Lq, D, N = 2, 3, 8, 5
    num_items = 100
    q = rng.standard_normal((B, Lq, D)).astype(np.float32)
    pe = rng.standard_normal((B, Lq, D)).astype(np.float32)
    ne = rng.standard_normal((N, D)).astype(np.float32)
    neg_ids = np.asarray([3, 7, 7, 9, 11], np.int32)
    pos_ids = np.full((B, Lq), 7, np.int32)   # ids 1 and 2 collide
    mask = np.ones((B, Lq), bool)

    got = float(L.sampled_softmax_loss(
        jnp.asarray(q), jnp.asarray(pe), jnp.asarray(ne),
        jnp.asarray(neg_ids), jnp.asarray(pos_ids), jnp.asarray(mask),
        num_items))

    # numpy oracle
    logq = -np.log(num_items)
    pos_logit = (q * pe).sum(-1)                      # [B, L]
    neg_logit = q @ ne.T - logq                       # [B, L, N]
    neg_logit[:, :, [1, 2]] = np.finfo(np.float32).min  # accidental hits
    logits = np.concatenate([pos_logit[..., None], neg_logit], -1)
    m = logits.max(-1, keepdims=True)
    lse = m[..., 0] + np.log(np.exp(logits - m).sum(-1))
    nll = (lse - pos_logit).mean()
    np.testing.assert_allclose(got, nll, rtol=1e-5)


def test_sampled_softmax_grad_flows():
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.standard_normal((2, 3, 4)), jnp.float32)
    pe = jnp.asarray(rng.standard_normal((2, 3, 4)), jnp.float32)
    ne = jnp.asarray(rng.standard_normal((6, 4)), jnp.float32)
    mask = jnp.ones((2, 3), bool)

    def f(q):
        return L.sampled_softmax_loss(
            q, pe, ne, jnp.arange(1, 7, dtype=jnp.int32),
            jnp.full((2, 3), 99, jnp.int32), mask, 1000)

    g = jax.grad(f)(q)
    assert float(jnp.abs(g).max()) > 0
    assert not np.any(np.isnan(np.asarray(g)))


def test_inbatch_candidates_logq_oracle():
    """In-batch selection: ids/embs come from the batch's positives at the
    sampled positions; logQ is the empirical batch frequency; invalid
    positions become id-0 padding slots."""
    rng = np.random.default_rng(3)
    B, Lq, D, N = 3, 4, 8, 16
    pos_ids = np.asarray(rng.integers(1, 6, (B, Lq)), np.int32)
    pos_embs = rng.standard_normal((B, Lq, D)).astype(np.float32)
    mask = rng.random((B, Lq)) < 0.7
    mask[0, 0] = True   # ensure at least one valid
    key = jax.random.key(0)

    ids, embs, logq = L.inbatch_candidates(
        jnp.asarray(pos_ids), jnp.asarray(pos_embs), jnp.asarray(mask),
        N, key)
    ids, embs, logq = map(np.asarray, (ids, embs, logq))

    flat_ids = pos_ids.reshape(-1)
    flat_mask = mask.reshape(-1)
    flat_embs = pos_embs.reshape(-1, D)
    n_valid = flat_mask.sum()
    for j in range(N):
        if ids[j] == 0:
            continue  # invalid-position slot (masked in the loss)
        # the id must exist among valid positives, emb must be its tower out
        rows = np.where((flat_ids == ids[j]) & flat_mask)[0]
        assert rows.size > 0
        assert any(np.allclose(embs[j], flat_embs[r]) for r in rows)
        want_logq = np.log(rows.size) - np.log(n_valid)
        np.testing.assert_allclose(logq[j], want_logq, rtol=1e-5)


def test_sampled_softmax_mixed_logq_and_padding_slots():
    """Mixed uniform + in-batch candidate set: per-candidate logq vector is
    honored and id<=0 slots drop out of the softmax entirely."""
    rng = np.random.default_rng(4)
    B, Lq, D, N = 2, 3, 8, 5
    q = rng.standard_normal((B, Lq, D)).astype(np.float32)
    pe = rng.standard_normal((B, Lq, D)).astype(np.float32)
    ne = rng.standard_normal((N, D)).astype(np.float32)
    neg_ids = np.asarray([3, 0, 9, 7, 11], np.int32)   # slot 1 is padding
    logq = np.asarray([-2.0, -1.0, -3.0, -0.5, -4.0], np.float32)
    pos_ids = np.full((B, Lq), 7, np.int32)            # slot 3 collides
    mask = np.ones((B, Lq), bool)

    got = float(L.sampled_softmax_loss(
        jnp.asarray(q), jnp.asarray(pe), jnp.asarray(ne),
        jnp.asarray(neg_ids), jnp.asarray(pos_ids), jnp.asarray(mask),
        100, neg_logq=jnp.asarray(logq)))

    pos_logit = (q * pe).sum(-1)
    neg_logit = q @ ne.T - logq[None, None, :]
    neg_logit[:, :, [1, 3]] = np.finfo(np.float32).min
    logits = np.concatenate([pos_logit[..., None], neg_logit], -1)
    m = logits.max(-1, keepdims=True)
    lse = m[..., 0] + np.log(np.exp(logits - m).sum(-1))
    nll = (lse - pos_logit).mean()
    np.testing.assert_allclose(got, nll, rtol=1e-5)
