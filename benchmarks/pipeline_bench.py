"""Host input-pipeline throughput bench (SURVEY.md hard part #2).

The reference spends its train step inside python featurization
(model/BaseLine/model.py:186-224 `feat2tensor` on the hot path —
SURVEY.md §3.1 "HOT"); the TPU build moves ALL of it to the host pipeline
and must sustain more samples/s than the device consumes (flagship:
3365 ex/s/chip at B=128, L=1024 — BASELINE.md round 5). This bench
measures every host path on the flagship shapes (maxlen=1023):

  1. streaming TrainLoader (threaded per-epoch sampling, the >2M-user path)
  2. PackedCache build (one-time) + CachedTrainLoader epochs
  3. native C++ dataprep cache build (data/native_pack.py), if the tool builds
  4. the dedup + sparse host prep that rides the prefetch thread

Prints one JSON line per measurement; `headroom` = samples/s divided by the
flagship's device consumption rate.

Runs entirely on the host — no accelerator needed:
    JAX_PLATFORMS=cpu python benchmarks/pipeline_bench.py [num_users]
"""
import json
import sys
import tempfile
import time
import types
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import numpy as np

FLAGSHIP_EX_PER_S = 3365.0  # BASELINE.md round-5 flagship consumption
MAXLEN = 1023               # flagship L=1024
B = 128


def emit(metric, samples_per_s, **kw):
    print(json.dumps({
        "metric": metric, "value": round(samples_per_s, 1),
        "unit": "samples/s/host",
        "headroom": round(samples_per_s / FLAGSHIP_EX_PER_S, 2), **kw,
    }), flush=True)


def main():
    import jax

    # host-only bench: never touch the axon tunnel (CLAUDE.md: the plugin
    # ignores JAX_PLATFORMS — must also set it via jax.config)
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass

    from tencent_recommendation_2025_tpu.config import PRESETS
    from tencent_recommendation_2025_tpu.data import synthetic
    from tencent_recommendation_2025_tpu.data.cached_dataset import (
        CachedTrainLoader, PackedCache)
    from tencent_recommendation_2025_tpu.data.dataset import TrainSampler
    from tencent_recommendation_2025_tpu.data.featurizer import (
        FusedVocab, build_item_tables)
    from tencent_recommendation_2025_tpu.data.pipeline import (
        TrainLoader, train_val_split)
    from tencent_recommendation_2025_tpu.data.readers import TencentGRData
    from tencent_recommendation_2025_tpu.data.schema import FeatureSchema

    num_users = int(sys.argv[1]) if len(sys.argv) > 1 else 4000
    tmp = Path(tempfile.mkdtemp(prefix="pipe_bench_"))
    data_dir = tmp / "data"
    t0 = time.perf_counter()
    synthetic.generate(data_dir, num_users=num_users, num_items=20_000,
                       min_seq=20, max_seq=200, seed=7)
    gen_s = time.perf_counter() - t0

    data = TencentGRData(data_dir, mm_emb_ids=("81",))
    schema = FeatureSchema.from_indexer(data.indexer, ("81",), 8)
    sampler = TrainSampler(data, schema, MAXLEN)
    tr_idx, _ = train_val_split(len(sampler), 0.1, 0)
    n_train = len(tr_idx)
    print(json.dumps({"metric": "pipeline_fixture", "users": num_users,
                      "train_users": n_train, "maxlen": MAXLEN,
                      "gen_s": round(gen_s, 1)}), flush=True)

    # 1. streaming loader: one full epoch, wall-clocked ------------------
    tl = TrainLoader(sampler, tr_idx, B, seed=0, num_workers=8)
    t0 = time.perf_counter()
    n = sum(int(b["sample_valid"].sum()) for b in tl.epoch(0))
    dt = time.perf_counter() - t0
    emit("pipeline_streaming_loader", n / dt, epoch_s=round(dt, 2))

    # 2. python packed cache: build once, then epochs are memmap slicing -
    t0 = time.perf_counter()
    cache = PackedCache(sampler, num_workers=16)
    build_s = time.perf_counter() - t0
    cl = CachedTrainLoader(cache, tr_idx, B, seed=0)
    t0 = time.perf_counter()
    n = sum(int(b["sample_valid"].sum()) for b in cl.epoch(0))
    dt = time.perf_counter() - t0
    emit("pipeline_cached_loader", n / dt, epoch_s=round(dt, 2),
         build_s=round(build_s, 1),
         build_samples_per_s=round(len(sampler) / build_s, 1))

    # 3. native C++ dataprep ---------------------------------------------
    from tencent_recommendation_2025_tpu.data import native_pack as NP

    if NP.tool_path() is not None:
        t0 = time.perf_counter()
        ncache = NP.build_packed_cache_native(sampler, tmp / "native_cache",
                                              threads=8)
        nbuild_s = time.perf_counter() - t0
        ncl = CachedTrainLoader(ncache, tr_idx, B, seed=0)
        t0 = time.perf_counter()
        n = sum(int(b["sample_valid"].sum()) for b in ncl.epoch(0))
        dt = time.perf_counter() - t0
        emit("pipeline_native_cached_loader", n / dt, epoch_s=round(dt, 2),
             build_s=round(nbuild_s, 1),
             build_samples_per_s=round(len(sampler) / nbuild_s, 1))
    else:
        print(json.dumps({"metric": "pipeline_native_cached_loader",
                          "error": "native tool unavailable"}), flush=True)

    # 4. host prep (tower dedup + sparse plans) on the cached stream -----
    from tencent_recommendation_2025_tpu.train.trainer import (
        augment_batch_dedup, augment_batch_sparse)

    cfg = PRESETS["hstu_flagship"]()
    import dataclasses
    cfg = cfg.replace(
        model=dataclasses.replace(cfg.model, maxlen=MAXLEN),
        train=dataclasses.replace(cfg.train, batch_size=B, tower_dedup=True,
                                  sparse_tables=("item_emb",)))
    tables = build_item_tables(data.item_feat_dict, data.itemnum, schema,
                               data.mm_emb_dict, data.indexer_i_rev)
    item_feats = types.SimpleNamespace(sparse=tables.sparse,
                                       array=tables.array)
    def prep(b, i):
        b = augment_batch_dedup(b, cfg, item_feats, data.itemnum,
                                step_key=(0, 97, 1, i), n_data_shards=1)
        return augment_batch_sparse(b, cfg, data.itemnum, (0, 97, 1, i),
                                    n_table_shards=1, usernum=data.usernum)

    # prep rides the loader's worker pool (the product wiring:
    # trainer.epoch_batches hands it over via supports_prep)
    t0 = time.perf_counter()
    n = sum(int(b["sample_valid"].sum()) for b in cl.epoch(1, prep=prep))
    dt = time.perf_counter() - t0
    emit("pipeline_cached_loader_with_prep", n / dt, epoch_s=round(dt, 2))


main()
