"""GPipe-style pipeline parallelism == sequential scan (fake 4-stage mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from tencent_recommendation_2025_tpu.parallel.pipeline_parallel import (
    pipelined_scan)

requires_8 = pytest.mark.skipif(jax.device_count() < 8,
                                reason="needs 8 fake devices")


@requires_8
def test_pipeline_matches_sequential():
    # 4-stage mesh over a dedicated axis
    mesh = Mesh(np.asarray(jax.devices()[:4]).reshape(4), ("stage",))
    rng = np.random.default_rng(0)
    NB, B, D = 8, 16, 32
    blocks = {"w": jnp.asarray(rng.standard_normal((NB, D, D)) * 0.1,
                               jnp.float32),
              "b": jnp.asarray(rng.standard_normal((NB, D)) * 0.1,
                               jnp.float32)}
    x = jnp.asarray(rng.standard_normal((B, D)), jnp.float32)

    def block_fn(a, bp):
        return jnp.tanh(a @ bp["w"] + bp["b"])

    # sequential oracle
    def body(a, bp):
        return block_fn(a, bp), None

    ref, _ = jax.lax.scan(body, x, blocks)

    out = pipelined_scan(mesh, "stage", block_fn, blocks, x,
                         num_microbatches=8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5,
                               atol=1e-6)


@requires_8
def test_pipeline_gradients_flow():
    mesh = Mesh(np.asarray(jax.devices()[:2]).reshape(2), ("stage",))
    rng = np.random.default_rng(1)
    NB, B, D = 4, 8, 16
    blocks = {"w": jnp.asarray(rng.standard_normal((NB, D, D)) * 0.1,
                               jnp.float32)}
    x = jnp.asarray(rng.standard_normal((B, D)), jnp.float32)

    def block_fn(a, bp):
        return jnp.tanh(a @ bp["w"])

    def loss_pp(blocks):
        return pipelined_scan(mesh, "stage", block_fn, blocks, x,
                              num_microbatches=4).sum()

    def loss_seq(blocks):
        def body(a, bp):
            return block_fn(a, bp), None

        out, _ = jax.lax.scan(body, x, blocks)
        return out.sum()

    g_pp = jax.grad(loss_pp)(blocks)
    g_seq = jax.grad(loss_seq)(blocks)
    np.testing.assert_allclose(np.asarray(g_pp["w"]), np.asarray(g_seq["w"]),
                               rtol=1e-4, atol=1e-6)
