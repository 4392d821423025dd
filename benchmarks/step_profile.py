"""Where does the flagship train step's time go? (VERDICT r1 item 4)

Times jitted sub-stages of the flagship step in isolation with dependency-
chained iterations (axon's block_until_ready is not a timing barrier — chain
state through each call and fetch a value at the end). Also prints the XLA
cost-analysis FLOP count per stage so MFU per stage is visible.

Stages:
  full_step        — the real train step (grad + optimizer)
  loss_fwd         — loss forward only
  encoder_fwd      — fuse_sequence + encode (the transformer stack)
  towers_fwd       — pos/neg item tower only
  attn_fwd         — fused HSTU attention kernel alone (8 calls like 8 blocks)
  attn_grad        — kernel fwd+bwd
  opt_update       — optax update alone on the same param tree
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def timeit(fn, args, iters=10, warmup=6):
    """Slope-timed (two window sizes, value-fetch sync): leftover remote
    compiles inside a timed loop read as 30x-slower stages otherwise."""
    import jax

    def fetch(out):
        np.asarray(jax.tree.leaves(out)[0]).ravel()[0]

    out = None
    for _ in range(warmup):
        out = fn(*args)
    fetch(out)
    t0 = time.perf_counter()
    for _ in range(4):
        out = fn(*args)
    fetch(out)
    t_small = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(4 + iters):
        out = fn(*args)
    fetch(out)
    return (time.perf_counter() - t0 - t_small) / iters


def flops_of(fn, *args):
    import jax

    try:
        c = jax.jit(fn).lower(*args).compile()
        an = c.cost_analysis()
        if isinstance(an, list):
            an = an[0]
        return float(an.get("flops", 0.0))
    except Exception:
        return 0.0


def main():
    import jax
    import jax.numpy as jnp

    cache_dir = Path(__file__).resolve().parents[1] / ".jax_cache"
    try:
        jax.config.update("jax_compilation_cache_dir", str(cache_dir))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    jax.config.update("jax_default_prng_impl", "rbg")

    import __graft_entry__ as G
    from tencent_recommendation_2025_tpu.models import embedding as E
    from tencent_recommendation_2025_tpu.models import encoder as ENC
    from tencent_recommendation_2025_tpu.train.trainer import (
        compute_loss, init_state, make_optimizer, make_train_step)

    H = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    B, L = 128, 1024
    cfg, schema, fused, model = G._make_synthetic_setup(
        maxlen=L - 1, hidden=64, num_blocks=8, num_heads=H,
        block_type="hstu", itemnum=100_000, usernum=10_000)
    rng = np.random.default_rng(0)
    tables, tables_np = G._make_tables(rng, model.itemnum, schema,
                                       with_np=True)
    batch = G._make_batch(rng, B, L, schema, model.itemnum, model.usernum,
                          tables_np=tables_np)
    import os

    if os.environ.get("STEP_PROFILE_DEDUP", "0") == "1":
        # profile the tower-dedup product path (flagship preset default)
        import dataclasses
        import types

        from tencent_recommendation_2025_tpu.train.trainer import (
            augment_batch_dedup)

        cfg = cfg.replace(train=dataclasses.replace(
            cfg.train, batch_size=B, tower_dedup=True))
        batch = augment_batch_dedup(
            batch, cfg, types.SimpleNamespace(sparse=tables_np["sparse"],
                                              array=tables_np["array"]),
            model.itemnum)
    batch = jax.device_put(batch)
    tx = make_optimizer(cfg)
    state = init_state(model, tx, cfg.train.seed, cfg=cfg)
    key = jax.random.key(0)

    results = {}

    # ---- full step (non-donated so we can reuse state) ----
    step = make_train_step(model, tx, cfg)
    # sacrificial DEEP copy for the donated step (device_put of an
    # already-committed array aliases, and donation would delete `state`)
    s2 = jax.tree.map(jnp.copy, state)
    for _ in range(6):
        s2, metrics = step(s2, batch, tables["mm"], tables, key)
    float(metrics["loss"])
    t0 = time.perf_counter()
    for _ in range(4):
        s2, metrics = step(s2, batch, tables["mm"], tables, key)
    float(metrics["loss"])
    t_small = time.perf_counter() - t0
    iters = 10
    t0 = time.perf_counter()
    for _ in range(4 + iters):
        s2, metrics = step(s2, batch, tables["mm"], tables, key)
    float(metrics["loss"])
    results["full_step"] = (time.perf_counter() - t0 - t_small) / iters

    params = state.params

    # ---- loss forward ----
    @jax.jit
    def loss_fwd(params, batch):
        loss, _ = compute_loss(model, params, batch, tables["mm"], tables,
                               cfg, train=True, rng=key)
        return loss

    results["loss_fwd"] = timeit(loss_fwd, (params, batch))

    # ---- loss grad (no optimizer) ----
    @jax.jit
    def loss_grad(params, batch):
        def f(p):
            return compute_loss(model, p, batch, tables["mm"], tables,
                                cfg, train=True, rng=key)[0]
        return jax.grad(f)(params)["item_emb"].sum()

    results["loss_grad"] = timeit(loss_grad, (params, batch))

    # ---- encoder forward ----
    @jax.jit
    def encoder_fwd(params, batch):
        if "dedup_uids" in batch:
            it_seq, _, _ = model.dedup_spreads(params, batch, tables["mm"])
            return model.log2feats(params, batch, tables["mm"], train=True,
                                   rng=key,
                                   item_tower_override=it_seq).sum()
        return model.log2feats(params, batch, tables["mm"], train=True,
                               rng=key).sum()

    results["encoder_fwd"] = timeit(encoder_fwd, (params, batch))

    # ---- towers (the candidate-tower half of forward) ----
    if "dedup_uids" in batch:
        @jax.jit
        def towers_fwd(params, batch):
            it_seq, pos_last, negs = model.dedup_spreads(params, batch,
                                                         tables["mm"])
            return (it_seq.astype(jnp.float32).sum()
                    + pos_last.astype(jnp.float32).sum()
                    + negs.astype(jnp.float32).sum())
    else:
        @jax.jit
        def towers_fwd(params, batch):
            neg_sparse = jnp.take(tables["sparse"], batch["neg"], axis=0,
                                  mode="clip")
            neg_array = jnp.take(tables["array"], batch["neg"], axis=0,
                                 mode="clip")
            ids = jnp.concatenate([batch["pos"], batch["neg"]], axis=0)
            sparse = jnp.concatenate([batch["pos_item_sparse"], neg_sparse],
                                     axis=0)
            array = jnp.concatenate([batch["pos_item_array"], neg_array],
                                    axis=0)
            return model.item_embeddings(params, ids, sparse, array,
                                         tables["mm"]).sum()

    results["towers_fwd"] = timeit(towers_fwd, (params, batch))

    # ---- fused attention kernel alone (x8 = encoder depth) ----
    from tencent_recommendation_2025_tpu.ops.hstu_attention import (
        hstu_attention_packed)

    qkv = jnp.asarray(rng.standard_normal((3, B, L, 64)), jnp.bfloat16)
    valid = jnp.asarray(np.ones((B, L)), jnp.int32)
    rab = jnp.asarray(rng.standard_normal((H, 128)), jnp.float32)

    @jax.jit
    def attn_fwd(qkv, rab):
        o = qkv[0]
        for _ in range(8):
            o = hstu_attention_packed(o, qkv[1], qkv[2], valid, rab,
                                      seq_len=L, num_heads=H)
        return o.sum()

    results["attn_fwd_x8"] = timeit(attn_fwd, (qkv, rab))

    @jax.jit
    def attn_grad(qkv, rab):
        def f(q, k, v, r):
            o = q
            for _ in range(8):
                o = hstu_attention_packed(o, k, v, valid, r, seq_len=L,
                                          num_heads=H)
            return o.astype(jnp.float32).sum()
        g = jax.grad(f, argnums=(0, 3))(qkv[0], qkv[1], qkv[2], rab)
        return g[0].astype(jnp.float32).sum() + g[1].sum()

    results["attn_grad_x8"] = timeit(attn_grad, (qkv, rab))

    # ---- optimizer update alone ----
    @jax.jit
    def opt_update(params):
        grads = jax.tree.map(lambda p: p * 1e-3, params)
        updates, _ = tx.update(grads, state.opt_state, params)
        import optax
        return optax.apply_updates(params, updates)["item_emb"].sum()

    results["opt_update"] = timeit(opt_update, (params,))

    fl = {
        "loss_fwd": flops_of(lambda p, b: loss_fwd(p, b), params, batch),
    }
    peak = 197e12  # v5e bf16
    out = {k: {"ms": round(v * 1000, 2)} for k, v in results.items()}
    if fl.get("loss_fwd"):
        out["loss_fwd"]["mfu_est"] = round(
            fl["loss_fwd"] / results["loss_fwd"] / peak, 4)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
