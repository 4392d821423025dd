"""Multi-host sharded training template (BASELINE.json configs[4]).

Run one copy per host (v5e slice or fake mesh):

    python examples/multihost_train.py --coordinator host0:1234 \
        --num_processes 4 --process_id $RANK --data_dir /data/TencentGR

Single-process smoke (8 fake devices):

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/multihost_train.py --fake --steps 3

The mesh is (data, model, seq); tables row-shard over (data, model); each
host feeds only its slice of the user index space.
"""

import argparse
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", default=None)
    ap.add_argument("--num_processes", type=int, default=1)
    ap.add_argument("--process_id", type=int, default=0)
    ap.add_argument("--data_dir", default=None)
    ap.add_argument("--fake", action="store_true",
                    help="force CPU with fake devices (works multi-process "
                         "too: each process gets --local_devices fake chips "
                         "and collectives ride Gloo)")
    ap.add_argument("--local_devices", type=int, default=8,
                    help="fake devices PER PROCESS under --fake")
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--mesh_model", type=int, default=2)
    ap.add_argument("--mesh_seq", type=int, default=1)
    ap.add_argument("--ckpt_dir", default=None,
                    help="save a per-shard checkpoint at the end (multi-"
                         "process: every process writes its owned shards; "
                         "shared filesystem assumed) and restore-verify")
    args = ap.parse_args()

    if args.fake:
        os.environ["JAX_PLATFORMS"] = "cpu"
        # force OUR device count even when the caller env (e.g. pytest's
        # conftest) already set one — under --num_processes the per-process
        # count decides the global mesh size
        flags = [f for f in os.environ.get("XLA_FLAGS", "").split()
                 if "host_platform_device_count" not in f]
        flags.append("--xla_force_host_platform_device_count="
                     f"{args.local_devices}")
        os.environ["XLA_FLAGS"] = " ".join(flags)

    import jax

    if args.fake:
        jax.config.update("jax_platforms", "cpu")

    from tencent_recommendation_2025_tpu.config import MeshConfig, PRESETS
    from tencent_recommendation_2025_tpu.parallel import mesh as M
    from tencent_recommendation_2025_tpu.parallel import train as PT

    M.initialize_distributed(args.coordinator, args.num_processes,
                             args.process_id)
    n = jax.device_count()
    mesh = M.build_mesh(MeshConfig(data=n // (args.mesh_model * args.mesh_seq),
                                   model=args.mesh_model, seq=args.mesh_seq))
    print(f"[host {jax.process_index()}/{jax.process_count()}] mesh "
          f"{dict(mesh.shape)} over {n} devices")

    cfg = PRESETS["sharded_multihost"]()

    if args.data_dir:
        # real data path: per-host loaders + sharded step
        from tencent_recommendation_2025_tpu.data.cached_dataset import (
            CachedTrainLoader, PackedCache)
        from tencent_recommendation_2025_tpu.data.dataset import TrainSampler
        from tencent_recommendation_2025_tpu.data.featurizer import (
            FusedVocab, build_item_tables)
        from tencent_recommendation_2025_tpu.data.pipeline import (
            train_val_split)
        from tencent_recommendation_2025_tpu.data.readers import TencentGRData
        from tencent_recommendation_2025_tpu.data.schema import FeatureSchema
        from tencent_recommendation_2025_tpu.models.baseline import SeqRecModel
        from tencent_recommendation_2025_tpu.train.trainer import device_tables

        data = TencentGRData(args.data_dir,
                             mm_emb_ids=cfg.features.mm_emb_ids)
        schema = FeatureSchema.from_indexer(data.indexer,
                                            cfg.features.mm_emb_ids)
        fused = FusedVocab.build(schema)
        tables = device_tables(build_item_tables(
            data.item_feat_dict, data.itemnum, schema, data.mm_emb_dict,
            data.indexer_i_rev))
        model = SeqRecModel(cfg=cfg.model, schema=schema, fused=fused,
                            usernum=data.usernum, itemnum=data.itemnum)
        sampler = TrainSampler(data, schema, cfg.model.maxlen)
        cache = PackedCache(sampler)
        tr, _ = train_val_split(len(sampler), cfg.train.valid_fraction,
                                cfg.train.seed)
        loader = CachedTrainLoader(cache, tr, cfg.train.batch_size,
                                   host_id=jax.process_index(),
                                   num_hosts=jax.process_count())
        batches = loader.epoch(0)
    else:
        # synthetic shapes (smoke / bring-up)
        import numpy as np

        import __graft_entry__ as G

        L = 128 * max(1, args.mesh_seq)
        cfg2, schema, fused, model = G._make_synthetic_setup(
            maxlen=L - 1, hidden=64, num_blocks=4, num_heads=2,
            block_type="hstu", itemnum=5000, usernum=512)
        cfg = cfg2.replace(mesh=cfg.mesh)
        rng = np.random.default_rng(0)
        B = 4 * mesh.shape["data"]
        tables = PT.shard_tables(mesh, G._make_tables(rng, model.itemnum,
                                                      schema))
        batches = (G._make_batch(rng, B, L, schema, model.itemnum,
                                 model.usernum) for _ in range(args.steps))

    state, tx = PT.init_sharded_state(model, cfg, mesh)
    step = PT.make_sharded_train_step(model, tx, cfg, mesh)
    key = jax.random.key(0)

    t0 = time.time()
    for i, batch in enumerate(batches):
        if i >= args.steps:
            break
        batch = PT.shard_batch(mesh, batch)
        state, metrics = step(state, batch, tables["mm"], tables, key)
        if i == 0:
            jax.block_until_ready(metrics["loss"])
            t0 = time.time()  # exclude compile
    jax.block_until_ready(metrics["loss"])
    dt = time.time() - t0
    n_steps = max(1, i)
    print(f"[host {jax.process_index()}] {n_steps} steps in {dt:.2f}s "
          f"({n_steps / dt:.2f} steps/s), loss={float(metrics['loss']):.4f}")

    if args.ckpt_dir:
        # per-shard checkpoint across processes: each process writes only
        # the shard extents it canonically owns (train/checkpoint.py) —
        # non-addressable shards never touch this host. Then restore
        # shard-direct onto the same mesh and verify a param checksum.
        import jax.numpy as jnp

        from tencent_recommendation_2025_tpu.train import checkpoint as CK

        path = CK.save_checkpoint(args.ckpt_dir, state,
                                  global_step=n_steps,
                                  valid_loss=float(metrics["loss"]))
        shardings = {p: l.sharding for p, l in
                     CK._flatten_with_paths(state)
                     if hasattr(l, "sharding")}
        restored, meta = CK.load_checkpoint(path, state, shardings=shardings)
        a = jax.jit(lambda p: sum(jnp.sum(jnp.abs(x.astype(jnp.float32)))
                                  for x in jax.tree.leaves(p)),
                    out_shardings=jax.NamedSharding(
                        mesh, jax.sharding.PartitionSpec()))
        s0, s1 = float(a(state.params)), float(a(restored.params))
        print(f"[host {jax.process_index()}] ckpt saved {path.name}: "
              f"param |sum| {s0:.4f} -> restored {s1:.4f} "
              f"({'OK' if abs(s0 - s1) < 1e-3 * max(1.0, abs(s0)) else 'MISMATCH'})")


if __name__ == "__main__":
    main()
