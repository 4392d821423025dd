"""Long-sequence full-train-step bench: flagship encoder at L=4096
(chunked-KV attention kernel path), slope-timed on the real chip.
Round-3 reading: 199.6 ms/step at B=32 (656.7K tokens/s).
"""
import json, sys, time
sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parents[1]))
import numpy as np

def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", str(__import__("pathlib").Path(__file__).resolve().parents[1] / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_default_prng_impl", "rbg")
    import __graft_entry__ as G
    from tencent_recommendation_2025_tpu.parallel import mesh as M
    from tencent_recommendation_2025_tpu.parallel import train as PT
    from tencent_recommendation_2025_tpu.config import MeshConfig

    B, L = 32, 4096
    cfg, schema, fused, model = G._make_synthetic_setup(
        maxlen=L - 1, hidden=64, num_blocks=8, num_heads=1,
        block_type="hstu", itemnum=100_000, usernum=10_000)
    rng = np.random.default_rng(0)
    batch = G._make_batch(rng, B, L, schema, model.itemnum, model.usernum)
    tables = G._make_tables(rng, model.itemnum, schema)
    mesh = M.build_mesh(MeshConfig(data=jax.device_count()))
    state, tx = PT.init_sharded_state(model, cfg, mesh)
    batch = PT.shard_batch(mesh, batch)
    tables = PT.shard_tables(mesh, tables)
    step = PT.make_sharded_train_step(model, tx, cfg, mesh)
    key = jax.random.key(0)
    for _ in range(6):
        state, m = step(state, batch, tables["mm"], tables, key)
    jax.block_until_ready(m["loss"])
    def t(n):
        nonlocal state
        t0 = time.perf_counter()
        for _ in range(n):
            state, m = step(state, batch, tables["mm"], tables, key)
        jax.block_until_ready(m["loss"])
        return time.perf_counter() - t0
    a = t(4); b = t(14)
    ms = (b - a) / 10 * 1e3
    print(json.dumps({"metric": "longseq_L4096_train_step", "step_ms":
                      round(ms, 1), "tokens_per_s": round(B * L / ms * 1e3),
                      "B": B, "L": L}))

main()
