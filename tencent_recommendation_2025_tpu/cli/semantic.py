"""Semantic-ID pipeline driver (BASELINE.json configs[2]).

From a trained sequence-model checkpoint:

1. encode every item through the item tower (id emb + features + multimodal)
   to build item representations;
2. train the RQ-VAE tokenizer on them and emit ``semantic_ids.npy``
   ([itemnum+1, L] int32) + the tokenizer checkpoint;
3. build (query, positive) pairs from the training sequences, train the
   generative decode head, and self-evaluate decode-head retrieval
   HR@10/NDCG@10 against the exact-MIPS baseline on the fixture ground truth
   when available.

Usage:
    TRAIN_DATA_PATH=... MODEL_OUTPUT_PATH=... EVAL_RESULT_PATH=... \
    python -m tencent_recommendation_2025_tpu.cli.semantic --preset baseline
"""

from __future__ import annotations

import argparse
import dataclasses
import json
from pathlib import Path

import numpy as np


def get_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--preset", default="baseline")
    p.add_argument("--maxlen", default=None, type=int)
    p.add_argument("--hidden_units", default=None, type=int)
    p.add_argument("--num_blocks", default=None, type=int)
    p.add_argument("--num_heads", default=None, type=int)
    p.add_argument("--dtype", default=None, choices=["float32", "bfloat16"])
    p.add_argument("--mm_emb_id", nargs="+", default=["81"], type=str)
    p.add_argument("--rq_levels", default=None, type=int)
    p.add_argument("--rq_codebook", default=None, type=int)
    p.add_argument("--rq_steps", default=2000, type=int)
    p.add_argument("--head_steps", default=1000, type=int)
    p.add_argument("--num_query_users", default=2048, type=int)
    return p.parse_args(argv)


def main(argv=None):
    args = get_args(argv)

    import jax
    import jax.numpy as jnp

    from ..config import EnvPaths, PRESETS
    from ..data.dataset import TrainSampler
    from ..data.featurizer import FusedVocab, build_item_tables
    from ..data.readers import TencentGRData
    from ..data.schema import FeatureSchema
    from ..models.baseline import SeqRecModel
    from ..retrieval.evaluator import hr_ndcg_at_k
    from ..train import checkpoint as CK
    from ..train.rqvae_trainer import (genret_retrieve, train_genret_head,
                                       train_rqvae)
    from ..train.trainer import device_tables, init_state, make_optimizer

    env = EnvPaths.from_env()
    assert env.train_data_path, "TRAIN_DATA_PATH must be set"
    out_dir = Path(env.eval_result_path or ".")
    out_dir.mkdir(parents=True, exist_ok=True)

    cfg = PRESETS[args.preset]()
    over = {k: getattr(args, k) for k in
            ("hidden_units", "num_blocks", "num_heads", "maxlen", "dtype")
            if getattr(args, k) is not None}
    cfg = cfg.replace(
        model=dataclasses.replace(cfg.model, **over),
        features=dataclasses.replace(cfg.features,
                                     mm_emb_ids=tuple(args.mm_emb_id)))
    rq_over = {}
    if args.rq_levels:
        rq_over["num_levels"] = args.rq_levels
    if args.rq_codebook:
        rq_over["codebook_size"] = args.rq_codebook
    rqcfg = dataclasses.replace(cfg.rqvae, **rq_over)

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

    assert env.model_output_path, "MODEL_OUTPUT_PATH must be set"
    ckpt = CK.latest_checkpoint(env.model_output_path)
    assert ckpt, f"no checkpoint under {env.model_output_path}"
    state, meta = CK.load_checkpoint(
        ckpt, init_state(model, make_optimizer(cfg), cfg.train.seed, cfg=cfg),
        model_config=cfg.model)
    params = state.params
    print(f"loaded {ckpt.name}")

    # 1) item representations: item tower over all ids
    dtabs = device_tables(tables)
    ids = jnp.arange(data.itemnum + 1, dtype=jnp.int32)
    reprs = []
    bs = 8192
    enc = jax.jit(lambda i: model.item_embeddings(
        params, i, jnp.take(dtabs["sparse"], i, axis=0),
        jnp.take(dtabs["array"], i, axis=0), dtabs["mm"]))
    for s in range(0, data.itemnum + 1, bs):
        reprs.append(np.asarray(enc(ids[s:s + bs]), np.float32))
    item_reprs = np.concatenate(reprs, axis=0)
    print(f"item representations: {item_reprs.shape}")

    # 2) RQ-VAE tokenizer
    rq = train_rqvae(item_reprs, rqcfg, num_steps=args.rq_steps,
                     verbose=True)
    np.save(out_dir / "semantic_ids.npy", rq.semantic_ids)
    used = [len(np.unique(rq.semantic_ids[1:, l]))
            for l in range(rqcfg.num_levels)]
    print(f"rqvae: recon={rq.final_losses['recon']:.4f} "
          f"codes-used-per-level={used}")

    # 3) decode head from (query, positive) pairs
    from ..data.pipeline import train_val_split

    sampler = TrainSampler(data, schema, cfg.model.maxlen)
    n_users = min(args.num_query_users, len(sampler))
    rng = np.random.default_rng(0)
    queries, positives = [], []
    predict = jax.jit(lambda b: model.predict(params, b, dtabs["mm"]))
    from ..data.pipeline import collate_train

    bs = 256
    for s in range(0, n_users, bs):
        samples = [sampler.sample(u, rng)
                   for u in range(s, min(s + bs, n_users))]
        batch = collate_train(samples, bs)
        q = np.asarray(predict(jax.device_put(batch)), np.float32)
        # positive = the last supervised position's target item
        for j, smp in enumerate(samples):
            nz = np.nonzero(smp.pos)[0]
            if len(nz):
                queries.append(q[j])
                positives.append(int(smp.pos[nz[-1]]))
    queries = np.stack(queries)
    positives = np.asarray(positives, np.int64)
    print(f"decode-head training pairs: {len(positives)}")

    head = train_genret_head(rq, queries, positives, rqcfg,
                             num_steps=args.head_steps)
    print(f"decode head final loss: {head['final_loss']:.4f}")

    # persist the tokenizer + decode head next to the model checkpoint so
    # cli.infer --ann_method semantic can serve them
    from ..retrieval.semantic_serve import save_semantic_artifacts

    art = save_semantic_artifacts(env.model_output_path, rq.params,
                                  head["params"], rqcfg,
                                  input_dim=item_reprs.shape[1],
                                  query_dim=queries.shape[1])
    print(f"semantic serving artifacts: {art}")

    # 4) self-eval: decode-head retrieval HR on the training pairs, against
    # the exact-MIPS baseline over the SAME item embeddings and queries
    k = cfg.retrieval.top_k

    def hr(top):
        return float(np.mean([positives[i] in top[i]
                              for i in range(len(positives))]))

    hits = hr(genret_retrieve(head["params"], rq, queries, rqcfg, k=k))
    hits_beam = hr(genret_retrieve(head["params"], rq, queries, rqcfg, k=k,
                                   method="beam", beam_width=32))

    from ..retrieval.mips import retrieve_topk

    mips_top = retrieve_topk(queries, item_reprs[1:],
                             np.arange(1, data.itemnum + 1), k=k)
    hits_mips = hr(mips_top)
    print(f"HR@{k} (train pairs): exact-scored generative {hits:.4f} | "
          f"beam decode {hits_beam:.4f} | exact MIPS {hits_mips:.4f}")
    with open(out_dir / "semantic_eval.json", "w") as f:
        json.dump({"rq_recon": rq.final_losses["recon"],
                   "codes_used": used,
                   "genret_train_hr": float(hits),
                   "genret_beam_train_hr": float(hits_beam),
                   "mips_train_hr": float(hits_mips),
                   "num_pairs": int(len(positives))}, f)


if __name__ == "__main__":
    main()
