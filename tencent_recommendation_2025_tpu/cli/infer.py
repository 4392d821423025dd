"""Inference driver — the reference ``infer.py`` contract, TPU-native.

Pipeline (reference ``infer.py:140-235``): rebuild the model from the test
dataset's stats, load the newest checkpoint under ``MODEL_OUTPUT_PATH``,
encode all test users to ``query.fbin``, build the candidate corpus from
``predict_set.jsonl`` (cold-start fill + mm attach +
``retrive_id2creative_id.json``), run ANN (on-device exact MIPS by default,
the C++ HNSW tool with the reference's flags via ``--ann_method hnsw``),
decode ``id100.u64bin`` to per-user top-10 creative ids.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
from pathlib import Path

import numpy as np


def get_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch_size", default=128, type=int)
    p.add_argument("--maxlen", default=None, type=int)
    p.add_argument("--hidden_units", default=None, type=int)
    p.add_argument("--num_blocks", default=None, type=int)
    p.add_argument("--num_heads", default=None, type=int)
    p.add_argument("--dropout_rate", default=None, type=float)
    p.add_argument("--device", default=None, type=str,
                   help="'cpu' forces the CPU backend (the axon TPU plugin "
                        "ignores JAX_PLATFORMS alone)")
    p.add_argument("--mm_emb_id", nargs="+", default=["81"], type=str,
                   choices=[str(s) for s in range(81, 87)])
    p.add_argument("--preset", default="baseline")
    p.add_argument("--block_type", default=None, choices=["mha", "hstu"])
    p.add_argument("--dtype", default=None, choices=["float32", "bfloat16"])
    p.add_argument("--norm_first", action="store_true")
    p.add_argument("--ann_method", default="exact",
               choices=["exact", "approx", "int8", "hnsw", "semantic"])
    p.add_argument("--beam_width", default=32, type=int,
                   help="beam width for --ann_method semantic")
    p.add_argument("--num_workers", default=8, type=int)
    return p.parse_args(argv)


def infer(argv=None):
    args = get_args(argv)

    from ..config import MM_EMB_DIMS, EnvPaths, PRESETS, RetrievalConfig
    from ..data import formats
    from ..data.dataset import TestSampler
    from ..data.featurizer import (FusedVocab, build_item_tables,
                                   pack_item_feat)
    from ..data.pipeline import TestLoader
    from ..data.readers import TencentGRData
    from ..data.schema import FeatureSchema
    from ..models.baseline import SeqRecModel
    from ..retrieval.ann import run_ann
    from ..train import checkpoint as CK
    from ..train.trainer import device_tables, init_state, make_optimizer

    import jax

    if args.device == "cpu":
        # the axon plugin ignores JAX_PLATFORMS=cpu; the config update is
        # required too (tests/conftest.py does the same)
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    env = EnvPaths.from_env()
    assert env.eval_data_path, "EVAL_DATA_PATH must be set"
    assert env.eval_result_path, "EVAL_RESULT_PATH must be set"
    result_dir = Path(env.eval_result_path)
    result_dir.mkdir(parents=True, exist_ok=True)

    cfg = PRESETS[args.preset]()
    over = {k: getattr(args, k) for k in
            ("hidden_units", "num_blocks", "num_heads", "maxlen",
             "dropout_rate", "block_type", "dtype")
            if getattr(args, k) is not None}
    if args.norm_first:
        over["norm_first"] = True
    cfg = cfg.replace(
        model=dataclasses.replace(cfg.model, **over),
        features=dataclasses.replace(cfg.features,
                                     mm_emb_ids=tuple(args.mm_emb_id)))

    data = TencentGRData(env.eval_data_path,
                         mm_emb_ids=cfg.features.mm_emb_ids, split="test")
    schema = FeatureSchema.from_indexer(data.indexer,
                                        cfg.features.mm_emb_ids,
                                        cfg.features.array_cap)
    fused = FusedVocab.build(schema)
    tables = build_item_tables(data.item_feat_dict, data.itemnum, schema,
                               data.mm_emb_dict, data.indexer_i_rev)
    model = SeqRecModel(cfg=cfg.model, schema=schema, fused=fused,
                        usernum=data.usernum, itemnum=data.itemnum)

    # newest checkpoint under MODEL_OUTPUT_PATH (reference infer.py:14-20)
    assert env.model_output_path, "MODEL_OUTPUT_PATH must be set"
    ckpt = CK.latest_checkpoint(env.model_output_path)
    assert ckpt is not None, f"no checkpoint under {env.model_output_path}"
    template = init_state(model, make_optimizer(cfg), cfg.train.seed, cfg=cfg)
    state, meta = CK.load_checkpoint(ckpt, template, model_config=cfg.model)
    params = state.params
    print(f"loaded {ckpt} (meta {meta})")

    dtabs = device_tables(tables)
    predict = jax.jit(lambda p, b: model.predict(p, b, dtabs["mm"]))

    sampler = TestSampler(data, schema, cfg.model.maxlen)
    loader = TestLoader(sampler, args.batch_size,
                        num_workers=args.num_workers)
    queries, user_list = [], []
    for batch, uids, n_valid in loader:
        q = predict(params, jax.device_put(batch))
        queries.append(np.asarray(q, np.float32)[:n_valid])
        user_list += uids[:n_valid]
    query_embs = np.concatenate(queries, axis=0)

    # candidate corpus (reference get_candidate_emb, infer.py:89-137)
    cand_path = Path(env.eval_data_path) / "predict_set.jsonl"
    item_ids, retrieval_ids, features, creative_ids = [], [], [], []
    retrieve_id2creative_id = {}
    with open(cand_path) as f:
        for line in f:
            rec = json.loads(line)
            cid, rid = rec["creative_id"], rec["retrieval_id"]
            item_ids.append(data.indexer["i"].get(cid, 0))
            retrieval_ids.append(rid)
            creative_ids.append(cid)
            features.append(rec["features"])
            retrieve_id2creative_id[rid] = cid

    n = len(item_ids)
    ids = np.asarray(item_ids, np.int32)
    sp = np.stack([pack_item_feat(f, schema)[0] for f in features])
    ar = np.stack([pack_item_feat(f, schema)[1] for f in features])
    mm_vecs = {}
    for fid in schema.mm_emb_ids:
        dim = MM_EMB_DIMS[fid]
        m = np.zeros((n, dim), np.float32)
        store = data.mm_emb_dict.get(fid, {})
        for i, cid in enumerate(creative_ids):
            v = store.get(cid)
            if isinstance(v, np.ndarray):
                m[i] = v
        mm_vecs[fid] = m

    # Scanned jit over fixed-size batches, dispatched in SUPER-CHUNKS of
    # SB scan blocks: a python loop of per-batch dispatches pays the
    # dispatch/tunnel latency per batch (~200 round trips at a 200K
    # corpus), but one scan over the WHOLE corpus stages every input —
    # including the high-dim mm vectors (ids 82-86: 1024-4096 f32 dims) —
    # in HBM at once, multiple GB at 200K+ items. SB blocks per dispatch
    # bounds device residency to one chunk's inputs + outputs (~0.5 GB
    # worst case) while keeping dispatches rare (7 at a 200K corpus).
    bs = 1024
    SB = 32                                   # scan blocks per dispatch
    nb = -(-n // bs)
    nb_pad = -(-nb // SB) * SB
    pad = nb_pad * bs - n

    def padb(x):
        return np.concatenate(
            [x, np.zeros((pad, *x.shape[1:]), x.dtype)]) if pad else x

    ids_b = padb(ids).reshape(nb_pad, bs)
    sp_b = padb(sp).reshape(nb_pad, bs, *sp.shape[1:])
    ar_b = padb(ar).reshape(nb_pad, bs, *ar.shape[1:])
    mm_b = {k: padb(v).reshape(nb_pad, bs, *v.shape[1:])
            for k, v in mm_vecs.items()}

    @jax.jit
    def encode_chunk(p, ids_c, sp_c, ar_c, mm_c):
        def body(_, xs):
            i, s, a, m = xs
            return None, model.encode_items(p, i, s, a, m)

        _, embs = jax.lax.scan(body, None, (ids_c, sp_c, ar_c, mm_c))
        return embs.reshape(SB * bs, -1)

    chunks = []
    for o in range(0, nb_pad, SB):
        sl = slice(o, o + SB)
        chunks.append(np.asarray(encode_chunk(
            params, ids_b[sl], sp_b[sl], ar_b[sl],
            {k: v[sl] for k, v in mm_b.items()}), np.float32))
    corpus = np.concatenate(chunks, axis=0)[:n]

    formats.save_emb(corpus, result_dir / "embedding.fbin")
    formats.save_emb(np.asarray(retrieval_ids, np.uint64).reshape(-1, 1),
                     result_dir / "id.u64bin")
    formats.save_emb(query_embs, result_dir / "query.fbin")
    with open(result_dir / "retrive_id2creative_id.json", "w") as f:
        json.dump(retrieve_id2creative_id, f)

    rcfg = dataclasses.replace(cfg.retrieval, method=args.ann_method)
    if args.ann_method == "semantic":
        # generative retrieval over the same file contract: beam-decode
        # semantic ids through the cli.semantic artifacts
        from ..retrieval.semantic_serve import run_semantic_ann

        out = run_semantic_ann(result_dir, env.model_output_path, rcfg,
                               beam_width=args.beam_width)
    else:
        out = run_ann(result_dir, rcfg)
    top10s_retrieved = formats.read_result_ids(out)
    top10s = [[retrieve_id2creative_id.get(int(r), 0) for r in row]
              for row in top10s_retrieved]
    return top10s, user_list


def main(argv=None):
    top10s, users = infer(argv)
    print(f"retrieved top-10 for {len(users)} users")

    # self-eval when the fixture carries ground truth
    from ..config import EnvPaths
    from ..retrieval.evaluator import hr_ndcg_at_k

    env = EnvPaths.from_env()
    gt_path = Path(env.eval_data_path) / "ground_truth.json"
    if gt_path.exists():
        gt = json.loads(gt_path.read_text())
        m = hr_ndcg_at_k(dict(zip(users, top10s)), gt, k=10)
        print(f"HR@10={m['hr']:.4f} NDCG@10={m['ndcg']:.4f} n={m['n']}")


if __name__ == "__main__":
    main()
