"""RQ-VAE semantic-ID tokenizer tests: codebook argmin vs numpy oracle,
training convergence, straight-through gradients, decode-head learning."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from tencent_recommendation_2025_tpu.config import RQVAEConfig
from tencent_recommendation_2025_tpu.models import rqvae as R


def test_nearest_code_matches_numpy():
    rng = np.random.default_rng(0)
    res = rng.standard_normal((40, 8)).astype(np.float32)
    cb = rng.standard_normal((16, 8)).astype(np.float32)
    got = np.asarray(R.nearest_code(jnp.asarray(res), jnp.asarray(cb)))
    want = np.argmin(((res[:, None] - cb[None]) ** 2).sum(-1), axis=1)
    np.testing.assert_array_equal(got, want)


def test_quantize_residual_structure():
    cfg = RQVAEConfig(num_levels=3, codebook_size=8, code_dim=4)
    params = R.init_rqvae_params(jax.random.key(0), cfg, input_dim=16)
    z = jnp.asarray(np.random.default_rng(1).standard_normal((10, 4)),
                    jnp.float32)
    z_q, codes = R.quantize(params, z)
    assert codes.shape == (10, 3)
    # z_q equals the sum of the selected codebook vectors
    cb = np.asarray(params["codebooks"])
    manual = sum(cb[l][np.asarray(codes)[:, l]] for l in range(3))
    np.testing.assert_allclose(np.asarray(z_q), manual, rtol=1e-6)


def test_straight_through_gradient():
    cfg = RQVAEConfig(num_levels=2, codebook_size=8, code_dim=4,
                      enc_hidden=(8,))
    params = R.init_rqvae_params(jax.random.key(0), cfg, input_dim=6)
    x = jnp.asarray(np.random.default_rng(2).standard_normal((5, 6)),
                    jnp.float32)

    def loss(p):
        return R.rqvae_forward(p, x, cfg)[4]["loss"]

    g = jax.grad(loss)(params)
    # encoder gets gradient (through the straight-through path)
    assert float(jnp.abs(g["enc"][0]["w"]).max()) > 0
    # codebooks get NO gradient (EMA-updated)
    np.testing.assert_allclose(np.asarray(g["codebooks"]), 0.0)


def test_rqvae_trains_and_reconstructs():
    cfg = RQVAEConfig(num_levels=2, codebook_size=32, code_dim=8,
                      enc_hidden=(32,), lr=3e-3)
    rng = np.random.default_rng(3)
    # clusterable data: 8 centers + noise
    centers = rng.standard_normal((8, 12)) * 3
    x = np.concatenate([c + 0.1 * rng.standard_normal((32, 12))
                        for c in centers]).astype(np.float32)
    x = jnp.asarray(x)
    params = R.init_rqvae_params(jax.random.key(0), cfg, input_dim=12)
    tx = optax.adam(cfg.lr)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        def loss_fn(p):
            _, z, _, codes, losses = R.rqvae_forward(p, x, cfg)
            return losses["loss"], (z, codes, losses)

        (_, (z, codes, losses)), g = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt = tx.update(g, opt)
        params = optax.apply_updates(params, updates)
        params = R.ema_codebook_update(params, z, codes, cfg)
        return params, opt, losses

    first = None
    for i in range(300):
        params, opt, losses = step(params, opt)
        if first is None:
            first = float(losses["recon"])
    final = float(losses["recon"])
    assert final < first * 0.1, (first, final)

    codes = R.tokenize(params, x)
    assert codes.shape == (x.shape[0], 2)
    # semantic ids should separate the clusters: same-center rows share codes
    c0 = np.asarray(codes[:32, 0])
    assert len(np.unique(c0)) <= 4  # cluster 0 maps to few codes


def test_genret_head_learns():
    cfg = RQVAEConfig(num_levels=2, codebook_size=8, code_dim=4,
                      enc_hidden=(16,))
    rng = np.random.default_rng(4)
    params = R.init_rqvae_params(jax.random.key(0), cfg, input_dim=6)
    # synthetic: codes are a linear function of the query (learnable by the
    # per-level linear heads)
    qn = rng.standard_normal((64, 10)).astype(np.float32)
    w_true = rng.standard_normal((10, 8)).astype(np.float32)
    q = jnp.asarray(qn)
    codes = jnp.asarray(
        np.stack([np.argmax(qn @ w_true, 1),
                  np.argmax(-(qn @ w_true), 1)], axis=1), jnp.int32)
    gp = R.init_genret_params(jax.random.key(1), cfg, query_dim=10)
    tx = optax.adam(1e-2)
    opt = tx.init(gp)

    @jax.jit
    def step(gp, opt):
        loss, g = jax.value_and_grad(
            lambda p: R.genret_loss(p, params, q, codes, cfg))(gp)
        updates, opt = tx.update(g, opt)
        return optax.apply_updates(gp, updates), opt, loss

    l0 = None
    for _ in range(200):
        gp, opt, loss = step(gp, opt)
        if l0 is None:
            l0 = float(loss)
    assert float(loss) < l0 * 0.5

    scores = R.genret_score_items(gp, params, q, codes, cfg)
    assert scores.shape == (64, 64)
