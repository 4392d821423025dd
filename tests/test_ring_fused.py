"""Per-shard fused blocks on seq-sharded meshes (parallel/ring_fused.py):
the ring of pair-attention Pallas kernels + fused pre/post stages must
reproduce the dense single-device encoder EXACTLY (fwd + grads) — the same
contract the unfused ring path pins in test_parallel."""

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tencent_recommendation_2025_tpu.config import MeshConfig, ModelConfig
from tencent_recommendation_2025_tpu.models import encoder as ENC
from tencent_recommendation_2025_tpu.ops import fused_block as FB
from tencent_recommendation_2025_tpu.parallel.mesh import build_mesh

requires_8 = pytest.mark.skipif(jax.device_count() < 8,
                                reason="needs 8 fake devices")


def _setup(L, D=32, B=4, nb=2, seed=0, H=1):
    cfg = ModelConfig(hidden_units=D, num_blocks=nb, num_heads=H,
                      maxlen=L - 1, block_type="hstu", ffn_type="swiglu",
                      dtype="float32", reference_init=False,
                      dropout_rate=0.0)
    rng = np.random.default_rng(seed)
    params = ENC.init_encoder_params(jax.random.key(seed), cfg)
    pos_table = jnp.asarray(
        rng.standard_normal((2 * L + 1, D)).astype(np.float32) * 0.02)
    fused_emb = jnp.asarray(
        rng.standard_normal((B, L, D)).astype(np.float32) * 0.1)
    seq_ids = rng.integers(1, 50, (B, L)).astype(np.int32)
    tt = np.ones((B, L), np.int32)
    # left padding of varying width per row (mask exactness across shards)
    for i in range(B):
        tt[i, : (i * 7) % (L // 2)] = 0
    seq_ids = seq_ids * (tt != 0)
    return cfg, params, fused_emb, jnp.asarray(seq_ids), jnp.asarray(tt), \
        pos_table


def _force_tpu_gate(monkeypatch):
    real = FB.ring_fused_supported
    monkeypatch.setattr(
        FB, "ring_fused_supported",
        lambda cfg, L, S, backend: real(cfg, L, S, "tpu"))


@requires_8
@pytest.mark.parametrize("L,S,H", [(512, 2, 1), (1024, 4, 1),
                                   (512, 2, 2)])   # H=2: the head loop
def test_ring_fused_encode_matches_dense(monkeypatch, L, S, H):
    _force_tpu_gate(monkeypatch)
    monkeypatch.setattr(FB, "FB_ATTN_BLK", 128)   # >1 block per shard
    cfg, params, emb, seq_ids, tt, pos = _setup(L, H=H)
    mesh = build_mesh(MeshConfig(data=2, seq=S),
                      devices=jax.devices()[: 2 * S])

    def run(mesh_):
        def f(p, e):
            out = ENC.encode(p, e, seq_ids, tt, pos, cfg, train=False,
                             mesh=mesh_)
            # weighted sum => nontrivial cotangents per position
            w = jnp.arange(out.size, dtype=out.dtype).reshape(out.shape)
            return jnp.sum(out * w) * 1e-6, out

        (loss, out), grads = jax.value_and_grad(f, argnums=(0, 1),
                                                has_aux=True)(params, emb)
        return loss, out, grads

    l_ref, out_ref, g_ref = run(None)
    l_sh, out_sh, g_sh = run(mesh)

    np.testing.assert_allclose(np.asarray(out_sh), np.asarray(out_ref),
                               rtol=2e-5, atol=2e-6)
    # the loss sums ~B*L*D near-cancelling terms to a near-zero scalar —
    # relative tolerance is meaningless there; the element-wise out/grad
    # checks above/below carry the exactness contract
    np.testing.assert_allclose(float(l_sh), float(l_ref), rtol=1e-3,
                               atol=1e-5)
    for (kp, a), (_, b) in zip(jax.tree_util.tree_leaves_with_path(g_sh),
                               jax.tree_util.tree_leaves_with_path(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3,
                                   atol=2e-5,
                                   err_msg=jax.tree_util.keystr(kp))


def test_ring_post_gate_dropout_prng():
    """The post unit's in-kernel dropout PRNG: same seed reproduces,
    different seed differs, eval ignores dropout. (Tested OUTSIDE the
    shard_map: pltpu.prng_seed has no interpret lowering under shard_map's
    manual axes on CPU — the sharded dropout path is validated on HW; the
    seed itself folds the shard indices in plain XLA, covered here by the
    distinct-seed case.)"""
    from tencent_recommendation_2025_tpu.ops.fused_block import (
        _block_operands, ring_post_gate, ring_pre_proj)

    cfg = ModelConfig(hidden_units=32, num_heads=1, block_type="hstu",
                      ffn_type="swiglu", dtype="float32",
                      reference_init=False)
    bp = ENC.init_block_params(jax.random.key(0), cfg)
    rng = np.random.default_rng(1)
    B, D, Lc = 2, 32, 256
    xt = jnp.asarray(rng.standard_normal((B, D, Lc)).astype(np.float32))
    rab, lnt, wuvqk, buvqkt, wo, bot, w13, w2 = _block_operands(
        bp, jnp.float32)
    q, k, v, u = ring_pre_proj(xt, lnt, wuvqk, buvqkt, Lc, 1, True)
    avt = jnp.asarray(rng.standard_normal((B, D, Lc)).astype(np.float32))

    def post(seed, train):
        return ring_post_gate(xt, avt, u, lnt, wuvqk, buvqkt, wo, bot, w13,
                              w2, jnp.int32(seed), Lc, 1, 0.5, train, True)

    try:
        o5a = post(5, True)
    except NotImplementedError as e:  # same skip as test_fused_block
        pytest.skip(f"in-kernel PRNG unsupported in interpret mode: {e}")
    o5b, o6 = post(5, True), post(6, True)
    np.testing.assert_array_equal(np.asarray(o5a), np.asarray(o5b))
    assert not np.allclose(np.asarray(o5a), np.asarray(o6))
    oe = post(5, False)
    assert not np.allclose(np.asarray(o5a), np.asarray(oe))


def test_ring_fused_supported_gate():
    cfg = ModelConfig(hidden_units=64, num_heads=1, block_type="hstu",
                      ffn_type="swiglu")
    assert FB.ring_fused_supported(cfg, 1024, 2, "tpu")
    assert FB.ring_fused_supported(cfg, 4096, 4, "tpu")
    assert not FB.ring_fused_supported(cfg, 1024, 2, "cpu")
    assert not FB.ring_fused_supported(cfg, 1024, 8, "tpu")   # Lc 128 < 256
    assert not FB.ring_fused_supported(cfg, 1000, 2, "tpu")   # not /S/128
    assert not FB.ring_fused_supported(
        dataclasses.replace(cfg, block_type="mha"), 1024, 2, "tpu")
    assert not FB.ring_fused_supported(
        dataclasses.replace(cfg, ffn_type="relu"), 1024, 2, "tpu")
