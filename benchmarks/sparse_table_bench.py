"""North-star-scale sparse-table training bench (VERDICT r1 item 2).

Trains ONE flagship train step with a multi-million-row ``item_emb`` on a
single chip — possible only because the sparse-table path's per-step cost is
O(touched rows): the dense counterpart (reference ``nn.Embedding`` + AdamW,
``model/BaseLine/model.py:115-117``) would move the entire [V, D] table plus
two moment tables through the optimizer every step (~75 GB at 100M rows).

Prints one JSON line per config: steps/s, touched rows, and the equivalent
dense optimizer traffic that the sparse update avoids.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def bench_config(itemnum, table_optimizer, batch=128, maxlen=1023, iters=10,
                 table_dtype="float32"):
    import jax
    import jax.numpy as jnp

    import __graft_entry__ as G
    from tencent_recommendation_2025_tpu.config import TrainConfig
    import dataclasses

    cfg, schema, fused, model = G._make_synthetic_setup(
        maxlen=maxlen, hidden=64, num_blocks=8, num_heads=1,
        block_type="hstu", itemnum=itemnum)
    if table_dtype != "float32":
        from tencent_recommendation_2025_tpu.models.baseline import SeqRecModel
        mcfg = dataclasses.replace(cfg.model, table_dtype=table_dtype)
        cfg = cfg.replace(model=mcfg)
        model = SeqRecModel(cfg=mcfg, schema=schema, fused=fused,
                            usernum=model.usernum, itemnum=model.itemnum)
    cfg = cfg.replace(train=dataclasses.replace(
        cfg.train, batch_size=batch, l2_emb=0.0, weight_decay=0.0,
        sparse_tables=("item_emb",), table_optimizer=table_optimizer,
        # bf16 moments halve both storage and the staged update copies —
        # 10M-row lazy Adam fits one v5e (f32 moments would OOM)
        table_moments_dtype="bfloat16"))
    rng = np.random.default_rng(0)
    L = maxlen + 1
    b = G._make_batch(rng, batch, L, schema, model.itemnum, model.usernum)
    tables = G._make_tables(rng, min(itemnum, 200_000), schema)
    # feature tables stay small (ids clip); the LEARNED table is the giant one

    from tencent_recommendation_2025_tpu.train.trainer import (
        augment_batch_sparse, init_state, make_optimizer, make_train_step)

    # host-side dedup (the product pipeline does this on the prefetch thread)
    b = augment_batch_sparse(b, cfg, model.itemnum, (0, 1))
    b_dev = jax.device_put(b)

    tx = make_optimizer(cfg)
    state = init_state(model, tx, cfg.train.seed, cfg=cfg)
    step = make_train_step(model, tx, cfg)
    key = jax.random.key(0)

    # slope timing: donated-state recompiles can land as late as call 4-6,
    # and one leftover remote compile inside a timed loop reads as a
    # 30x-slower step — time two window sizes and difference them
    for _ in range(6):
        state, metrics = step(state, b_dev, tables["mm"], tables, key)
    float(metrics["loss"])
    t0 = time.perf_counter()
    for _ in range(4):
        state, metrics = step(state, b_dev, tables["mm"], tables, key)
    loss = float(metrics["loss"])  # value fetch = real sync
    t_small = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(4 + iters):
        state, metrics = step(state, b_dev, tables["mm"], tables, key)
    loss = float(metrics["loss"])
    dt = (time.perf_counter() - t0 - t_small) / iters

    touched = 3 * batch * L
    d = 64
    moments = 2 if table_optimizer == "lazy_adam" else 0.016
    dense_gb = itemnum * d * 4 * (2 + 2 * moments) / 1e9  # r/w table+moments
    sparse_gb = touched * d * 4 * (2 + 2 * moments) / 1e9
    return {
        "metric": f"sparse_table_step_{itemnum // 1_000_000}M_{table_optimizer}"
                  + ("_bf16table" if table_dtype != "float32" else ""),
        "value": round(batch / dt, 2),
        "unit": "examples/s/chip",
        "step_ms": round(dt * 1000, 1),
        "loss": round(loss, 4),
        "touched_rows_cap": touched,
        "optimizer_traffic_gb_sparse": round(sparse_gb, 3),
        "optimizer_traffic_gb_dense_equiv": round(dense_gb, 1),
    }


def main():
    import jax

    cache = Path(__file__).resolve().parents[1] / ".jax_cache"
    try:
        jax.config.update("jax_compilation_cache_dir", str(cache))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    # rowwise_adagrad is the at-scale optimizer (231 ms/step @10M, 274 @20M
    # measured on v5e); lazy_adam's staged moment copies are pathological
    # beyond ~1M rows (129 s/step @8M f32) — small-table/test use only
    configs = [(10_000_000, "rowwise_adagrad", "float32")]
    if "--big" in sys.argv:
        # >=30M-row tables store PACKED [V/16, 8, 128] (copy-free
        # layout) and scatter via the aliased Pallas group kernel; 50M
        # additionally needs the bf16 master table to fit 16G HBM
        configs += [(20_000_000, "rowwise_adagrad", "float32"),
                    (50_000_000, "rowwise_adagrad", "bfloat16")]
    if "--100m" in sys.argv:
        # the full north-star table (BASELINE.json configs[4]): 12.8 GB
        # bf16 packed + 0.4 GB rowwise-adagrad state on one 16 GB v5e.
        # B=64: at B=128 the step working set (touched-group gather buffer
        # 0.8 GB + tower/encoder activations ~2 GB) pushes past 15.75 GB
        # usable HBM (measured OOM in jit(step_fn)); halving B halves it
        configs = [(100_000_000, "rowwise_adagrad", "bfloat16", 64)]
    for cfg_row in configs:
        itemnum, opt, tdt = cfg_row[:3]
        batch = cfg_row[3] if len(cfg_row) > 3 else 128
        try:
            print(json.dumps(bench_config(itemnum, opt, table_dtype=tdt,
                                          batch=batch)),
                  flush=True)
        except Exception as e:  # OOM on small chips: report, keep going
            print(json.dumps({"metric": f"sparse_table_step_{itemnum}",
                              "error": f"{type(e).__name__}: {e}"[:300]}),
                  flush=True)


if __name__ == "__main__":
    main()
