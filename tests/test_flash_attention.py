"""Fused softmax-MHA Pallas kernel vs the dense safe-masked-softmax oracle
(interpret mode on CPU). Counterpart of the reference's SDPA path
(``model/BaseLine/model.py:39-43``)."""

import jax
import jax.numpy as jnp
import numpy as np

from tencent_recommendation_2025_tpu.models.attention import (
    safe_masked_softmax)
from tencent_recommendation_2025_tpu.ops import flash_attention as FA


def _inputs(B=2, H=2, L=256, hd=16, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((B, H, L, hd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, L, hd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, L, hd)), jnp.float32)
    valid = np.ones((B, L), bool)
    valid[0, :37] = False  # left padding incl. fully-masked early query rows
    return q, k, v, jnp.asarray(valid)


def _oracle(q, k, v, valid):
    B, H, L, hd = q.shape
    f32 = jnp.float32
    s = jnp.einsum("bhqd,bhkd->bhqk", q.astype(f32),
                   k.astype(f32)) * (hd ** -0.5)
    iq = jax.lax.broadcasted_iota(jnp.int32, (L, L), 0)
    ik = jax.lax.broadcasted_iota(jnp.int32, (L, L), 1)
    mask = (iq >= ik)[None] & (valid != 0)[:, None, :]
    p = safe_masked_softmax(s, mask[:, None])
    return jnp.einsum("bhqk,bhkd->bhqd", p, v.astype(f32)).astype(q.dtype)


def test_forward_matches_oracle():
    q, k, v, valid = _inputs()
    out = FA.flash_mha(q, k, v, valid, interpret=True)
    ref = _oracle(q, k, v, valid)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)
    # fully-masked query rows are exactly zero (safe-softmax contract)
    assert np.abs(np.asarray(out)[0, :, :37]).max() == 0.0


def test_gradients_match_oracle():
    q, k, v, valid = _inputs(B=1, L=384, seed=3)
    cot = jnp.asarray(
        np.random.default_rng(9).standard_normal(q.shape), jnp.float32)

    def f_kernel(q, k, v):
        return (FA.flash_mha(q, k, v, valid, interpret=True) * cot).sum()

    def f_oracle(q, k, v):
        return (_oracle(q, k, v, valid) * cot).sum()

    gk = jax.grad(f_kernel, argnums=(0, 1, 2))(q, k, v)
    go = jax.grad(f_oracle, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gk, go, ("dq", "dk", "dv")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5, err_msg=name)


def test_bf16_inputs_match_f32_oracle():
    """bf16 fast path (matmuls in bf16, f32 softmax/accumulation)."""
    q, k, v, valid = _inputs(B=1, L=256, seed=5)
    out = FA.flash_mha(q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
                       v.astype(jnp.bfloat16), valid, interpret=True)
    assert out.dtype == jnp.bfloat16
    ref = _oracle(q, k, v, valid)
    a = np.asarray(out, np.float32)
    b = np.asarray(ref, np.float32)
    assert float(np.abs(a - b).max() / max(np.abs(b).max(), 1e-6)) < 3e-2
