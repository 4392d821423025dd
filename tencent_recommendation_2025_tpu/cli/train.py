"""Train driver — the reference ``main.py`` contract, TPU-native.

Same argparse surface (reference ``model/BaseLine/main.py:17-48``) plus
framework flags, same env-var directory contract (``TRAIN_DATA_PATH``,
``TRAIN_LOG_PATH``, ``TRAIN_TF_EVENTS_PATH``, ``TRAIN_CKPT_PATH``,
``main.py:52-57``), same outputs (JSONL train.log, TensorBoard events,
per-epoch checkpoints named ``global_step{N}.valid_loss={v}``).

The accel flags differ by design: AMP/TF32/cuDNN toggles become the bf16
compute dtype (on by default); ``torch.compile`` is simply XLA.

Usage:
    TRAIN_DATA_PATH=... TRAIN_CKPT_PATH=... python -m \
        tencent_recommendation_2025_tpu.cli.train --preset baseline
"""

from __future__ import annotations

import argparse
import dataclasses
import os
from pathlib import Path


def get_args(argv=None):
    p = argparse.ArgumentParser()
    # reference train params (main.py:21-44)
    p.add_argument("--batch_size", default=None, type=int)
    p.add_argument("--lr", default=None, type=float)
    p.add_argument("--maxlen", default=None, type=int)
    p.add_argument("--hidden_units", default=None, type=int)
    p.add_argument("--num_blocks", default=None, type=int)
    p.add_argument("--num_epochs", default=None, type=int)
    p.add_argument("--num_heads", default=None, type=int)
    p.add_argument("--dropout_rate", default=None, type=float)
    p.add_argument("--l2_emb", default=None, type=float)
    p.add_argument("--device", default=None, type=str,
                   help="'cpu' forces the CPU backend (the axon TPU plugin "
                        "ignores JAX_PLATFORMS alone); other values are "
                        "accepted for reference compatibility (JAX owns "
                        "placement)")
    p.add_argument("--inference_only", action="store_true")
    p.add_argument("--state_dict_path", default=None, type=str,
                   help="checkpoint dir (or file) to resume from")
    p.add_argument("--norm_first", action="store_true")
    p.add_argument("--mm_emb_id", nargs="+", default=["81"], type=str,
                   choices=[str(s) for s in range(81, 87)])
    # framework flags
    p.add_argument("--preset", default="baseline",
                   choices=["baseline", "baseline_o1", "hstu_mini",
                            "hstu_flagship", "sampled_softmax_dp",
                            "sharded_multihost"])
    p.add_argument("--block_type", default=None, choices=["mha", "hstu"])
    p.add_argument("--loss_type", default=None,
                   choices=["bce", "sampled_softmax"])
    p.add_argument("--num_inbatch_negatives", default=None, type=int,
                   help="in-batch negatives for sampled softmax (F9); "
                        "0 = shared-uniform only")
    p.add_argument("--grad_accum_steps", default=None, type=int,
                   help="accumulate gradients over G strided microbatches "
                        "inside one step (exact weighted combine; dense "
                        "tables only) — effective batch at ~1/G activation "
                        "memory")
    p.add_argument("--eval_retrieval_users", default=None, type=int,
                   help="epoch-end HR@10/NDCG@10 over up to N validation "
                        "users (full-corpus item-tower encode + approx "
                        "MIPS); 0 = off. Single-process non-mesh runs")
    p.add_argument("--dtype", default=None, choices=["float32", "bfloat16"])
    p.add_argument("--mesh_data", default=None, type=int)
    p.add_argument("--mesh_model", default=None, type=int)
    p.add_argument("--mesh_seq", default=None, type=int)
    p.add_argument("--mesh_pipe", default=None, type=int)
    p.add_argument("--pp_microbatches", default=None, type=int)
    p.add_argument("--num_workers", default=8, type=int)
    p.add_argument("--seed", default=None, type=int)
    p.add_argument("--profile_steps", default=0, type=int,
                   help="capture a jax.profiler trace (TensorBoard-viewable) "
                        "around N train steps; written under "
                        "TRAIN_LOG_PATH/profile")
    p.add_argument("--profile_start", default=4, type=int,
                   help="1-based step the profile window starts at "
                        "(default skips the compile-laden first steps)")
    p.add_argument("--loader", default="auto",
                   choices=["auto", "native", "cached", "streaming"],
                   help="native: C++ dataprep_tool packs users to disk "
                        "(threaded, reusable across runs); cached: python "
                        "pack, vectorized negatives; streaming: threaded "
                        "per-epoch sampling; auto: native when the tool "
                        "builds, else cached, below 2M users")
    return p.parse_args(argv)


def build_config(args):
    from ..config import PRESETS

    cfg = PRESETS[args.preset]()
    model_over = {k: getattr(args, k) for k in
                  ("hidden_units", "num_blocks", "num_heads", "maxlen",
                   "dropout_rate", "block_type", "dtype")
                  if getattr(args, k) is not None}
    if args.norm_first:
        model_over["norm_first"] = True
    train_over = {k: getattr(args, k) for k in
                  ("batch_size", "lr", "num_epochs", "l2_emb", "loss_type",
                   "seed", "num_inbatch_negatives", "grad_accum_steps",
                   "eval_retrieval_users")
                  if getattr(args, k) is not None}
    mesh_over = {}
    for ax in ("data", "model", "seq", "pipe"):
        v = getattr(args, f"mesh_{ax}")
        if v is not None:
            mesh_over[ax] = v
    if args.pp_microbatches is not None:
        mesh_over["pp_microbatches"] = args.pp_microbatches
    cfg = cfg.replace(
        model=dataclasses.replace(cfg.model, **model_over),
        train=dataclasses.replace(cfg.train, **train_over),
        mesh=dataclasses.replace(cfg.mesh, **mesh_over),
        features=dataclasses.replace(cfg.features,
                                     mm_emb_ids=tuple(args.mm_emb_id)),
    )
    return cfg


def main(argv=None):
    args = get_args(argv)
    cfg = build_config(args)

    # Decide the mesh BEFORE constructing the model. Packed big-table
    # storage STAYS on under a mesh: the group dim shards over the table
    # axes and each device's [G/S, 8, 128] slice keeps the compact layout
    # (ops/sparse_table.sharded_gather_rows / sharded_apply_row_update) —
    # an unpacked [V/S, D] shard would re-stage the lane-padded 2x copy on
    # every touch (the round-2 layout finding).
    import jax

    if args.device == "cpu":
        # the sandbox's axon plugin ignores JAX_PLATFORMS=cpu — the config
        # update is required too (tests/conftest.py does the same)
        jax.config.update("jax_platforms", "cpu")

    # counter-based RBG PRNG, matching bench.py: threefry dropout-mask
    # generation is pure VPU work and measures at ~10% of the flagship step
    # — the product CLI must run the same PRNG the benchmarks run
    jax.config.update("jax_default_prng_impl", "rbg")

    mesh = None
    want = cfg.mesh.pipe * cfg.mesh.data * cfg.mesh.model * cfg.mesh.seq
    if want > 1:
        if jax.device_count() >= \
                cfg.mesh.pipe * cfg.mesh.model * cfg.mesh.seq and \
                jax.device_count() > 1:
            from ..parallel.mesh import build_mesh

            mesh = build_mesh(cfg.mesh)
            print(f"mesh: {dict(mesh.shape)} over "
                  f"{jax.device_count()} devices")
        else:
            print(f"WARNING: preset wants {want} devices but only "
                  f"{jax.device_count()} present — training single-device")

    from ..config import EnvPaths
    from ..data.dataset import TrainSampler
    from ..data.featurizer import FusedVocab, build_item_tables
    from ..data.pipeline import TrainLoader, train_val_split
    from ..data.readers import TencentGRData
    from ..data.schema import FeatureSchema
    from ..models.baseline import SeqRecModel
    from ..train import checkpoint as CK
    from ..train.trainer import init_state, make_optimizer, train_loop
    from ..utils.sysinfo import print_system_info

    env = EnvPaths.from_env()
    assert env.train_data_path, "TRAIN_DATA_PATH must be set"

    print("System info:")
    print_system_info()

    data = TencentGRData(env.train_data_path,
                         mm_emb_ids=cfg.features.mm_emb_ids)
    schema = FeatureSchema.from_indexer(data.indexer,
                                        cfg.features.mm_emb_ids,
                                        cfg.features.array_cap)
    fused = FusedVocab.build(schema)
    tables = build_item_tables(data.item_feat_dict, data.itemnum, schema,
                               data.mm_emb_dict, data.indexer_i_rev)
    model = SeqRecModel(cfg=cfg.model, schema=schema, fused=fused,
                        usernum=data.usernum, itemnum=data.itemnum)

    sampler = TrainSampler(data, schema, cfg.model.maxlen)
    tr_idx, va_idx = train_val_split(len(sampler),
                                     cfg.train.valid_fraction,
                                     cfg.train.seed)
    import jax
    # auto: prefer the native C++ cache at ANY scale (its fields are
    # memmapped — the host never holds the full arrays), python PackedCache
    # (in-RAM) up to 2M users, streaming TrainLoader as the last resort.
    # Measured on the flagship shapes (benchmarks/pipeline_bench.py): the
    # streaming python sampler sustains ~340 samples/s/host vs the chip's
    # 3365 ex/s consumption — cached paths are the product path.
    use_cached = args.loader in ("cached", "native", "auto")
    cache = None
    if use_cached:
        from ..data.cached_dataset import CachedTrainLoader, PackedCache

        if args.loader != "cached":
            # native C++ pack (auto falls back to python if make fails)
            from ..data import native_pack as NP

            if NP.tool_path() is not None:
                # data path may be read-only; stage the cache next to ckpts
                cache_dir = Path(env.train_ckpt_path or ".") \
                    / f"packed_cache_maxlen{cfg.model.maxlen}"
                try:
                    cache = NP.build_packed_cache_native(
                        sampler, cache_dir, threads=args.num_workers)
                    print(f"native dataprep cache at {cache_dir}")
                except Exception as e:
                    if args.loader == "native":
                        raise
                    print(f"native dataprep unavailable ({e}); "
                          "falling back to python pack")
        if cache is None:
            if args.loader == "auto" and len(sampler) > 2_000_000:
                use_cached = False  # in-RAM python pack too big: stream
            else:
                cache = PackedCache(sampler, num_workers=args.num_workers)
    if use_cached:
        train_loader = CachedTrainLoader(cache, tr_idx, cfg.train.batch_size,
                                         seed=cfg.train.seed,
                                         host_id=jax.process_index(),
                                         num_hosts=jax.process_count(),
                                         num_workers=min(args.num_workers, 8))
        valid_loader = CachedTrainLoader(cache, va_idx, cfg.train.batch_size,
                                         seed=cfg.train.seed, shuffle=False)
    else:
        train_loader = TrainLoader(sampler, tr_idx, cfg.train.batch_size,
                                   seed=cfg.train.seed,
                                   num_workers=args.num_workers,
                                   host_id=jax.process_index(),
                                   num_hosts=jax.process_count())
        valid_loader = TrainLoader(sampler, va_idx, cfg.train.batch_size,
                                   seed=cfg.train.seed, shuffle=False,
                                   num_workers=args.num_workers)

    state = None
    start_epoch = 0
    skip_steps = 0
    if args.state_dict_path:
        tx = make_optimizer(cfg)
        template = init_state(model, tx, cfg.train.seed, cfg=cfg)
        state, meta = CK.load_checkpoint(args.state_dict_path, template,
                                         model_config=cfg.model)
        # the reference parses epoch= from the filename and runs only the
        # REMAINING epochs (main.py:118-127); our meta carries it directly,
        # plus the mid-epoch batch offset for preemption checkpoints
        start_epoch = int(meta.get("epoch", 0))
        skip_steps = int(meta.get("epoch_step", 0))
        print(f"resumed from {args.state_dict_path} "
              f"(step {meta.get('global_step')}, {start_epoch}/"
              f"{cfg.train.num_epochs} epochs done"
              + (f", +{skip_steps} steps into the next" if skip_steps
                 else "") + ")")

    if args.inference_only:
        print("inference_only: skipping training")
        return None

    # (mesh was decided at the top of main, before model construction —
    # the sharded path replaces the reference's single-device main.py:32)
    profile_dir = None
    if args.profile_steps:
        profile_dir = str(Path(env.train_log_path or ".") / "profile")
    state = train_loop(model, cfg, train_loader, valid_loader, tables,
                       log_dir=env.train_log_path,
                       tb_dir=env.train_tf_events_path,
                       ckpt_dir=env.train_ckpt_path, state=state,
                       start_epoch=start_epoch, skip_steps=skip_steps,
                       mesh=mesh,
                       profile_steps=args.profile_steps,
                       profile_dir=profile_dir,
                       profile_start=args.profile_start)
    print("Done")
    return state


if __name__ == "__main__":
    main()
