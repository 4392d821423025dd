"""Sequence-parallel ring attention (F4, SURVEY.md §5 long-context).

The reference materializes a full [L, L] mask and runs dense attention
(``model.py:331-335``) — fine at maxlen=101, impossible at the north-star
seq-1024+ multi-chip configs. Here the L axis shards over the ``seq`` mesh
axis; queries stay put while K/V blocks rotate around the ring via
``ppermute`` (one ICI hop per step), with:

- **softmax path**: online log-sum-exp merging (flash-attention style), so
  numerics match dense attention to fp tolerance;
- **HSTU path**: pointwise SiLU attention needs no softmax state — partial
  ``A @ V`` blocks just add, making the ring trivially exact;
- causality and key-padding enforced from *global* positions computed per
  block — no [L, L] materialization anywhere.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def _block_mask(q_pos, k_pos, key_ok):
    """[B?, Lq, Lk] causal & key-valid mask from global positions."""
    causal = q_pos[:, None] >= k_pos[None, :]
    return causal[None] & key_ok[:, None, :]


def _ring_softmax_body(q, kv_mask_ok, scale, n_seq, lc, si, k0, v0):
    """Online-softmax accumulation over ring steps. Shapes per device:
    q [B, H, Lc, hd]; k0/v0 same; kv_mask_ok [B, Lc] bool."""
    B, H, Lc, hd = q.shape
    f32 = jnp.float32
    q_pos = si * lc + jax.lax.broadcasted_iota(jnp.int32, (Lc, 1), 0)[:, 0]

    m = jnp.full((B, H, Lc, 1), jnp.finfo(f32).min, f32)
    l = jnp.zeros((B, H, Lc, 1), f32)
    acc = jnp.zeros((B, H, Lc, hd), f32)
    k_cur, v_cur, ok_cur = k0, v0, kv_mask_ok

    perm = [(i, (i + 1) % n_seq) for i in range(n_seq)]
    for step in range(n_seq):
        src = (si - step) % n_seq
        k_pos = src * lc + jax.lax.broadcasted_iota(jnp.int32, (Lc, 1), 0)[:, 0]
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k_cur,
                       preferred_element_type=f32) * scale
        mask = _block_mask(q_pos, k_pos, ok_cur)[:, None]  # [B,1,Lq,Lk]
        s = jnp.where(mask, s, jnp.finfo(f32).min)
        m_new = jnp.maximum(m, s.max(axis=-1, keepdims=True))
        p = jnp.exp(s - m_new) * mask.astype(f32)
        corr = jnp.exp(m - m_new)
        acc = acc * corr + jnp.einsum("bhqk,bhkd->bhqd", p,
                                      v_cur.astype(f32))
        l = l * corr + p.sum(axis=-1, keepdims=True)
        m = m_new
        if step + 1 < n_seq:
            k_cur = jax.lax.ppermute(k_cur, "seq", perm)
            v_cur = jax.lax.ppermute(v_cur, "seq", perm)
            ok_cur = jax.lax.ppermute(ok_cur, "seq", perm)
    return acc / jnp.maximum(l, 1e-30)


def ring_attention(mesh: Mesh, q: jnp.ndarray, k: jnp.ndarray,
                   v: jnp.ndarray, kv_valid: jnp.ndarray,
                   scale: Optional[float] = None) -> jnp.ndarray:
    """Causal softmax attention with L sharded over the ``seq`` axis.

    q/k/v [B, H, L, hd] sharded P(None, None, 'seq', None) on L;
    kv_valid [B, L] bool (True = real token). Returns [B, H, L, hd].
    """
    n_seq = mesh.shape["seq"]
    L = q.shape[2]
    lc = L // n_seq
    scale = scale if scale is not None else q.shape[-1] ** -0.5

    def local(qc, kc, vc, okc):
        si = jax.lax.axis_index("seq")
        out = _ring_softmax_body(qc, okc, scale, n_seq, lc, si, kc, vc)
        return out.astype(qc.dtype)

    spec4 = P("data", None, "seq", None)
    spec2 = P("data", "seq")
    fn = jax.shard_map(local, mesh=mesh,
                       in_specs=(spec4, spec4, spec4, spec2),
                       out_specs=spec4, check_vma=False)
    return fn(q, k, v, kv_valid)


def ring_hstu_attention(mesh: Mesh, q: jnp.ndarray, k: jnp.ndarray,
                        v: jnp.ndarray, kv_valid: jnp.ndarray,
                        rab: jnp.ndarray, scale: float,
                        seq_len: int) -> jnp.ndarray:
    """HSTU pointwise attention with L sharded over ``seq``.

    Pointwise SiLU weights mean partial sums are exact — each ring step adds
    its block's ``silu(qk*scale + rab) * mask / L @ v``. ``rab`` is the
    [H, buckets] learned distance-bias table (models/hstu.py); bias is
    computed per block from global positions.
    """
    n_seq = mesh.shape["seq"]
    L = q.shape[2]
    lc = L // n_seq
    buckets = rab.shape[-1]
    f32 = jnp.float32

    def local(qc, kc, vc, okc, rab_full):
        si = jax.lax.axis_index("seq")
        B, H, Lc, hd = qc.shape
        q_pos = si * lc + jax.lax.broadcasted_iota(jnp.int32, (Lc, 1), 0)[:, 0]
        acc = jnp.zeros((B, H, Lc, hd), f32)
        k_cur, v_cur, ok_cur = kc, vc, okc
        perm = [(i, (i + 1) % n_seq) for i in range(n_seq)]
        for step in range(n_seq):
            src = (si - step) % n_seq
            k_pos = src * lc + \
                jax.lax.broadcasted_iota(jnp.int32, (Lc, 1), 0)[:, 0]
            s = jnp.einsum("bhqd,bhkd->bhqk", qc, k_cur,
                           preferred_element_type=f32) * scale
            dist = jnp.clip(q_pos[:, None] - k_pos[None, :], 0, buckets - 1)
            s = s + jnp.take(rab_full, dist, axis=-1)[None]
            mask = _block_mask(q_pos, k_pos, ok_cur)[:, None]
            a = jax.nn.silu(s) * mask.astype(f32) / jnp.asarray(seq_len, f32)
            acc = acc + jnp.einsum("bhqk,bhkd->bhqd", a, v_cur.astype(f32))
            if step + 1 < n_seq:
                k_cur = jax.lax.ppermute(k_cur, "seq", perm)
                v_cur = jax.lax.ppermute(v_cur, "seq", perm)
                ok_cur = jax.lax.ppermute(ok_cur, "seq", perm)
        return acc.astype(qc.dtype)

    spec4 = P("data", None, "seq", None)
    spec2 = P("data", "seq")
    fn = jax.shard_map(local, mesh=mesh,
                       in_specs=(spec4, spec4, spec4, spec2, P(None, None)),
                       out_specs=spec4, check_vma=False)
    return fn(q, k, v, kv_valid, rab)
