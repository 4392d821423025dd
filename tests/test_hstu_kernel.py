"""Fused HSTU Pallas kernel vs dense oracle (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tencent_recommendation_2025_tpu.ops import hstu_attention as HK


def _inputs(B=2, H=2, L=256, hd=16, buckets=128, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((B, H, L, hd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, L, hd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, L, hd)), jnp.float32)
    rab = jnp.asarray(rng.standard_normal((H, buckets)), jnp.float32) * 0.1
    valid = np.ones((B, L), bool)
    valid[0, :17] = False   # left padding
    return q, k, v, jnp.asarray(valid), rab


def test_forward_matches_oracle():
    q, k, v, valid, rab = _inputs()
    out = HK.hstu_attention(q, k, v, valid, rab, seq_len=q.shape[2],
                            interpret=True)
    ref = HK.hstu_attention_oracle(q, k, v, valid, rab, seq_len=q.shape[2])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_forward_small_buckets():
    # buckets < BLK: the far-constant path dominates
    q, k, v, valid, rab = _inputs(L=384, buckets=16, seed=1)
    out = HK.hstu_attention(q, k, v, valid, rab, seq_len=q.shape[2],
                            interpret=True)
    ref = HK.hstu_attention_oracle(q, k, v, valid, rab, seq_len=q.shape[2])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_forward_large_buckets():
    # buckets > 2*BLK: several near tiles
    q, k, v, valid, rab = _inputs(L=512, buckets=384, seed=2)
    out = HK.hstu_attention(q, k, v, valid, rab, seq_len=q.shape[2],
                            interpret=True)
    ref = HK.hstu_attention_oracle(q, k, v, valid, rab, seq_len=q.shape[2])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_gradients_match_oracle():
    q, k, v, valid, rab = _inputs(B=1, H=2, L=256, seed=3)
    L = q.shape[2]
    cot = jnp.asarray(
        np.random.default_rng(9).standard_normal(q.shape), jnp.float32)

    def f_kernel(q, k, v, rab):
        return (HK.hstu_attention(q, k, v, valid, rab, seq_len=L,
                                  interpret=True) * cot).sum()

    def f_oracle(q, k, v, rab):
        return (HK.hstu_attention_oracle(q, k, v, valid, rab,
                                         seq_len=L) * cot).sum()

    gk = jax.grad(f_kernel, argnums=(0, 1, 2, 3))(q, k, v, rab)
    go = jax.grad(f_oracle, argnums=(0, 1, 2, 3))(q, k, v, rab)
    for a, b, name in zip(gk, go, ("dq", "dk", "dv", "drab")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5, err_msg=name)


def test_long_variant_many_tiles(monkeypatch):
    """Chunked-KV kernels at many k-tiles with multi-tile bias buckets —
    the L=4096-class shape, interpret-scale (the lowered-cap trick makes
    every tile boundary and bias slot-clip path fire)."""
    monkeypatch.setattr(HK, "MAX_WHOLESEQ_L", 128)
    q, k, v, valid, rab = _inputs(B=2, H=2, L=640, buckets=384, seed=7)
    L = q.shape[2]
    out = HK.hstu_attention(q, k, v, valid, rab, seq_len=L, interpret=True)
    ref = HK.hstu_attention_oracle(q, k, v, valid, rab, seq_len=L)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)

    cot = jnp.asarray(
        np.random.default_rng(8).standard_normal(q.shape), jnp.float32)

    def f_kernel(q, k, v, rab):
        return (HK.hstu_attention(q, k, v, valid, rab, seq_len=L,
                                  interpret=True) * cot).sum()

    def f_oracle(q, k, v, rab):
        return (HK.hstu_attention_oracle(q, k, v, valid, rab,
                                         seq_len=L) * cot).sum()

    gk = jax.grad(f_kernel, argnums=(0, 1, 2, 3))(q, k, v, rab)
    go = jax.grad(f_oracle, argnums=(0, 1, 2, 3))(q, k, v, rab)
    for a, b, name in zip(gk, go, ("dq", "dk", "dv", "drab")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5, err_msg=name)


def test_long_variant_matches_oracle(monkeypatch):
    """The blocked long-L kernels == oracle (forced via a lowered cap)."""
    monkeypatch.setattr(HK, "MAX_WHOLESEQ_L", 128)  # forces the long path
    q, k, v, valid, rab = _inputs(B=1, H=2, L=384, seed=5)
    L = q.shape[2]
    out = HK.hstu_attention(q, k, v, valid, rab, seq_len=L, interpret=True)
    ref = HK.hstu_attention_oracle(q, k, v, valid, rab, seq_len=L)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)

    cot = jnp.asarray(
        np.random.default_rng(6).standard_normal(q.shape), jnp.float32)

    def f_kernel(q, k, v, rab):
        return (HK.hstu_attention(q, k, v, valid, rab, seq_len=L,
                                  interpret=True) * cot).sum()

    def f_oracle(q, k, v, rab):
        return (HK.hstu_attention_oracle(q, k, v, valid, rab,
                                         seq_len=L) * cot).sum()

    gk = jax.grad(f_kernel, argnums=(0, 1, 2, 3))(q, k, v, rab)
    go = jax.grad(f_oracle, argnums=(0, 1, 2, 3))(q, k, v, rab)
    for a, b, name in zip(gk, go, ("dq", "dk", "dv", "drab")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5, err_msg=name)


def _max_rel_err(a, b):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    return float(np.abs(a - b).max() / max(np.abs(b).max(), 1e-6))


def test_bf16_inputs_match_f32_oracle():
    """bf16 inputs take the fast path (matmul operands stay bf16, f32
    accumulation); output must track the f32 oracle within bf16 rounding."""
    q, k, v, valid, rab = _inputs(B=1, H=2, L=256, seed=4)
    L = q.shape[2]
    qb, kb, vb = (t.astype(jnp.bfloat16) for t in (q, k, v))
    out = HK.hstu_attention(qb, kb, vb, valid, rab, seq_len=L,
                            interpret=True)
    assert out.dtype == jnp.bfloat16
    ref = HK.hstu_attention_oracle(q, k, v, valid, rab, seq_len=L)
    assert _max_rel_err(out, ref) < 3e-2

    cot = jnp.asarray(
        np.random.default_rng(11).standard_normal(q.shape), jnp.float32)

    def f_kernel(q, k, v, rab):
        return (HK.hstu_attention(q.astype(jnp.bfloat16),
                                  k.astype(jnp.bfloat16),
                                  v.astype(jnp.bfloat16), valid, rab,
                                  seq_len=L, interpret=True)
                .astype(jnp.float32) * cot).sum()

    def f_oracle(q, k, v, rab):
        return (HK.hstu_attention_oracle(q, k, v, valid, rab,
                                         seq_len=L) * cot).sum()

    gk = jax.grad(f_kernel, argnums=(0, 1, 2, 3))(q, k, v, rab)
    go = jax.grad(f_oracle, argnums=(0, 1, 2, 3))(q, k, v, rab)
    for a, b, name in zip(gk, go, ("dq", "dk", "dv", "drab")):
        assert _max_rel_err(a, b) < 5e-2, name


def test_bf16_long_variant(monkeypatch):
    """Chunked-KV path under bf16 inputs (cap lowered to route L=512)."""
    monkeypatch.setattr(HK, "MAX_WHOLESEQ_L", 256)
    q, k, v, valid, rab = _inputs(B=1, H=2, L=512, seed=5)
    L = q.shape[2]
    out = HK.hstu_attention(q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
                            v.astype(jnp.bfloat16), valid, rab, seq_len=L,
                            interpret=True)
    ref = HK.hstu_attention_oracle(q, k, v, valid, rab, seq_len=L)
    assert _max_rel_err(out, ref) < 3e-2


def test_bias_tiles_transpose_matches_vjp():
    """Analytic Toeplitz transpose == autodiff vjp of _bias_tiles."""
    rng = np.random.default_rng(7)
    for blk, buckets, H in ((128, 128, 2), (256, 128, 1), (128, 300, 1)):
        rab = jnp.asarray(rng.standard_normal((H, buckets)), jnp.float32)
        nt = HK._n_near(buckets, blk) + 1
        dtiles = jnp.asarray(
            rng.standard_normal((H, nt, blk, blk)), jnp.float32)
        _, vjp = jax.vjp(lambda r: HK._bias_tiles(r, blk), rab)
        (want,) = vjp(dtiles)
        got = HK._bias_tiles_transpose(dtiles, buckets)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-4,
                                   err_msg=f"blk={blk} buckets={buckets}")


def test_silu_qkv_fused_matches_oracle():
    """silu_qkv=True on pre-activation q/k/v == oracle on silu(q/k/v),
    with gradients w.r.t. the PRE-activation inputs (dsilu chained in the
    kernel epilogues)."""
    q, k, v, valid, rab = _inputs(B=1, H=2, L=256, seed=9)
    L = q.shape[2]
    out = HK.hstu_attention(q, k, v, valid, rab, seq_len=L, interpret=True,
                            silu_qkv=True)
    ref = HK.hstu_attention_oracle(jax.nn.silu(q), jax.nn.silu(k),
                                   jax.nn.silu(v), valid, rab, seq_len=L)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-3, atol=2e-4)

    cot = jnp.asarray(
        np.random.default_rng(13).standard_normal(q.shape), jnp.float32)

    def f_kernel(q, k, v, rab):
        return (HK.hstu_attention(q, k, v, valid, rab, seq_len=L,
                                  interpret=True, silu_qkv=True) * cot).sum()

    def f_oracle(q, k, v, rab):
        return (HK.hstu_attention_oracle(
            jax.nn.silu(q), jax.nn.silu(k), jax.nn.silu(v), valid, rab,
            seq_len=L) * cot).sum()

    gk = jax.grad(f_kernel, argnums=(0, 1, 2, 3))(q, k, v, rab)
    go = jax.grad(f_oracle, argnums=(0, 1, 2, 3))(q, k, v, rab)
    for a, b, name in zip(gk, go, ("dq", "dk", "dv", "drab")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-4, err_msg=name)


def test_silu_qkv_fused_long_variant(monkeypatch):
    """Fused-silu path through the chunked-KV kernels (grads included)."""
    monkeypatch.setattr(HK, "MAX_WHOLESEQ_L", 256)
    q, k, v, valid, rab = _inputs(B=1, H=2, L=512, seed=10)
    L = q.shape[2]
    cot = jnp.asarray(
        np.random.default_rng(14).standard_normal(q.shape), jnp.float32)

    def f_kernel(q, k, v, rab):
        return (HK.hstu_attention(q, k, v, valid, rab, seq_len=L,
                                  interpret=True, silu_qkv=True) * cot).sum()

    def f_oracle(q, k, v, rab):
        return (HK.hstu_attention_oracle(
            jax.nn.silu(q), jax.nn.silu(k), jax.nn.silu(v), valid, rab,
            seq_len=L) * cot).sum()

    gk = jax.grad(f_kernel, argnums=(0, 1, 2, 3))(q, k, v, rab)
    go = jax.grad(f_oracle, argnums=(0, 1, 2, 3))(q, k, v, rab)
    for a, b, name in zip(gk, go, ("dq", "dk", "dv", "drab")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-4, err_msg=name)


def test_use_long_dispatch_is_d_aware():
    """Whole-seq vs chunked-KV dispatch scales ~1/D (probed on v5e: D=64
    fits L=1024, D=128 at L=1024 needs 20.9 MB scoped VMEM vs the 16 MB
    limit); small test D's clamp to the D=64 budget so the monkeypatched
    ceilings keep their old meaning."""
    assert not HK._use_long(1024, 64)
    assert HK._use_long(2048, 64)
    assert HK._use_long(1024, 128)
    assert not HK._use_long(512, 128)
    assert HK._use_long(512, 256)
    assert not HK._use_long(1024, 16)  # clamps to the D=64 budget
