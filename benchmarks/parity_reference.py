"""Head-to-head parity: the actual reference (torch, CPU) vs this engine.

Imports the reference's own modules from ``/root/reference`` (read-only, no
code copied) and drives them with a minimal harness mirroring its train loop
(``model/BaseLine/main.py:154-269``): same synthetic TencentGR fixture, same
split seed discipline, same config (D, blocks, heads, lr, epochs). Both
sides then encode queries + the candidate corpus and are scored with the same
HR@10/NDCG@10 evaluator against the fixture's held-out ground truth.

Usage:
    python benchmarks/parity_reference.py [--epochs 3] [--users 128]

Prints one JSON line per engine plus the deltas.
"""

import argparse
import json
import os
import sys
import types
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
REFERENCE = Path(os.environ.get("REFERENCE_DIR", "/root/reference"))


def run_reference(data_dir, cfg, seed=42, variant="BaseLine"):
    """Train + evaluate the reference BaselineModel via its own classes."""
    sys.path.insert(0, str(REFERENCE / "model" / variant))
    import importlib
    import subprocess

    import numpy as np
    import torch

    torch.manual_seed(seed)
    np.random.seed(seed)

    if variant == "BaseLineO1":
        # BaseLineO1/dataset.py pip-installs orjson at import time
        # (dataset.py:12-22); no network here — make the call fail fast so it
        # takes its stdlib-json fallback. (We run their code, never copy it.)
        def _deny(cmd, *a, **k):
            raise subprocess.CalledProcessError(1, cmd)

        subprocess.check_call = _deny
    for mod in ("dataset", "model"):
        sys.modules.pop(mod, None)
    ref_dataset = importlib.import_module("dataset")
    ref_model = importlib.import_module("model")

    args = types.SimpleNamespace(
        batch_size=cfg["batch_size"], lr=cfg["lr"], maxlen=cfg["maxlen"],
        hidden_units=cfg["hidden"], num_blocks=cfg["blocks"],
        num_epochs=cfg["epochs"], num_heads=cfg["heads"],
        dropout_rate=0.01, l2_emb=0.0, device="cpu", inference_only=False,
        state_dict_path=None, norm_first=False, mm_emb_id=["81"],
        num_workers=0,
    )
    ds = ref_dataset.MyDataset(str(data_dir), args)
    loader = torch.utils.data.DataLoader(
        ds, batch_size=args.batch_size, shuffle=True,
        collate_fn=ds.collate_fn)
    model = ref_model.BaselineModel(ds.usernum, ds.itemnum,
                                    ds.feat_statistics, ds.feature_types,
                                    args).to("cpu")
    # the reference's init loop (main.py:95-111)
    for _, param in model.named_parameters():
        try:
            if param.dim() >= 2:
                torch.nn.init.xavier_normal_(param.data)
            elif param.dim() == 1:
                torch.nn.init.constant_(param.data, 0.0)
        except Exception:
            pass
    model.pos_emb.weight.data[0, :] = 0
    model.item_emb.weight.data[0, :] = 0
    model.user_emb.weight.data[0, :] = 0
    for k in model.sparse_emb:
        model.sparse_emb[k].weight.data[0, :] = 0

    bce = torch.nn.BCEWithLogitsLoss(reduction="mean")
    opt = torch.optim.AdamW(model.parameters(), lr=args.lr,
                            betas=(0.9, 0.98))
    model.train()
    last_loss = None
    for epoch in range(args.num_epochs):
        for batch in loader:
            seq, pos, neg, token_type, next_token_type, next_action_type, \
                seq_feat, pos_feat, neg_feat = batch
            opt.zero_grad()
            pos_logits, neg_logits = model(
                seq, pos, neg, token_type, next_token_type,
                next_action_type, seq_feat, pos_feat, neg_feat)
            idx = np.where(next_token_type == 1)
            loss = bce(pos_logits[idx], torch.ones_like(pos_logits[idx]))
            loss = loss + bce(neg_logits[idx],
                              torch.zeros_like(neg_logits[idx]))
            loss.backward()
            opt.step()
            last_loss = float(loss)

    # inference: queries from predict_seq via their test dataset
    test_ds = ref_dataset.MyTestDataset(str(data_dir), args)
    test_loader = torch.utils.data.DataLoader(
        test_ds, batch_size=args.batch_size, shuffle=False,
        collate_fn=test_ds.collate_fn)
    model.eval()
    queries, users = [], []
    with torch.inference_mode():
        for seq, token_type, seq_feat, user_id in test_loader:
            q = model.predict(seq, seq_feat, token_type)
            queries.append(q.numpy())
            users += list(user_id)
    queries = np.concatenate(queries)

    # candidate corpus through their item tower (save_item_emb compute path)
    cand = [json.loads(l) for l in open(Path(data_dir) / "predict_set.jsonl")]
    feats = []
    item_ids = []
    for rec in cand:
        f = dict(rec["features"])
        cid = rec["creative_id"]
        item_ids.append(ds.indexer["i"].get(cid, 0))
        for fid in ds.feature_types["item_emb"]:
            if cid in ds.mm_emb_dict[fid]:
                f[fid] = ds.mm_emb_dict[fid][cid]
            else:
                f[fid] = np.zeros(32, np.float32)
        # missing sparse fill
        for fid in ds.feature_types["item_sparse"]:
            f.setdefault(fid, 0)
        feats.append(f)
    with torch.inference_mode():
        seq_t = torch.tensor(item_ids).unsqueeze(0)
        emb = model.feat2emb(seq_t, [np.array(feats, dtype=object)],
                             include_user=False).squeeze(0).numpy()

    sys.path.pop(0)
    return queries, emb, users, [c["creative_id"] for c in cand], last_loss


def run_ours(data_dir, cfg, seed=42, variant="BaseLine"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from tencent_recommendation_2025_tpu.config import (Config, ModelConfig,
                                                        TrainConfig)
    from tencent_recommendation_2025_tpu.data.cached_dataset import (
        CachedTrainLoader, PackedCache)
    from tencent_recommendation_2025_tpu.data.dataset import (TestSampler,
                                                              TrainSampler)
    from tencent_recommendation_2025_tpu.data.featurizer import (
        FusedVocab, build_item_tables, pack_item_feat)
    from tencent_recommendation_2025_tpu.data.pipeline import TestLoader
    from tencent_recommendation_2025_tpu.data.readers import TencentGRData
    from tencent_recommendation_2025_tpu.data.schema import FeatureSchema
    from tencent_recommendation_2025_tpu.models.baseline import SeqRecModel
    from tencent_recommendation_2025_tpu.train.trainer import (device_tables,
                                                               train_loop)
    import jax.numpy as jnp
    import json as _json

    c = Config(
        model=ModelConfig(hidden_units=cfg["hidden"], num_blocks=cfg["blocks"],
                          num_heads=cfg["heads"], maxlen=cfg["maxlen"],
                          dtype="float32",
                          ffn_type="swiglu" if variant == "BaseLineO1"
                          else "relu"),
        train=TrainConfig(batch_size=cfg["batch_size"], lr=cfg["lr"],
                          num_epochs=cfg["epochs"], seed=seed,
                          valid_fraction=0.0,
                          l2_emb=0.0,
                          weight_decay=0.01 if variant == "BaseLineO1"
                          else 0.0),
    )
    data = TencentGRData(data_dir, mm_emb_ids=("81",))
    schema = FeatureSchema.from_indexer(data.indexer, ("81",))
    fused = FusedVocab.build(schema)
    tables = build_item_tables(data.item_feat_dict, data.itemnum, schema,
                               data.mm_emb_dict, data.indexer_i_rev)
    model = SeqRecModel(cfg=c.model, schema=schema, fused=fused,
                        usernum=data.usernum, itemnum=data.itemnum)
    sampler = TrainSampler(data, schema, c.model.maxlen)
    cache = PackedCache(sampler)
    loader = CachedTrainLoader(cache, np.arange(len(sampler)),
                               c.train.batch_size, seed=seed)
    state = train_loop(model, c, loader, None, tables, verbose=False)

    test_data = TencentGRData(data_dir, mm_emb_ids=("81",), split="test")
    ts = TestSampler(test_data, schema, c.model.maxlen)
    dtabs = device_tables(tables)
    queries, users = [], []
    for batch, uids, n_valid in TestLoader(ts, batch_size=cfg["batch_size"]):
        q = model.predict(state.params, jax.device_put(batch), dtabs["mm"])
        queries.append(np.asarray(q, np.float32)[:n_valid])
        users += uids[:n_valid]
    queries = np.concatenate(queries)

    cand = [_json.loads(l) for l in open(Path(data_dir) / "predict_set.jsonl")]
    ids = np.array([data.indexer["i"].get(x["creative_id"], 0)
                    for x in cand], np.int32)
    sp = np.stack([pack_item_feat(x["features"], schema)[0] for x in cand])
    ar = np.stack([pack_item_feat(x["features"], schema)[1] for x in cand])
    mm = {"81": jnp.asarray(np.stack([tables.mm["81"][i] for i in ids]))}
    emb = np.asarray(model.encode_items(state.params, jnp.asarray(ids),
                                        jnp.asarray(sp), jnp.asarray(ar),
                                        mm), np.float32)
    return queries, emb, users, [x["creative_id"] for x in cand], None


def evaluate(queries, corpus, users, creative_ids, data_dir, k=10):
    import numpy as np

    from tencent_recommendation_2025_tpu.retrieval.evaluator import (
        hr_ndcg_at_k)

    scores = queries @ corpus.T
    top = np.argsort(-scores, axis=1)[:, :k]
    topids = {u: [creative_ids[j] for j in row]
              for u, row in zip(users, top)}
    gt = json.loads((Path(data_dir) / "ground_truth.json").read_text())
    return hr_ndcg_at_k(topids, gt, k=k)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--users", type=int, default=96)
    ap.add_argument("--items", type=int, default=150)
    ap.add_argument("--out", default=None)
    ap.add_argument("--variant", default="both",
                    choices=["BaseLine", "BaseLineO1", "both"])
    args = ap.parse_args()

    import tempfile

    from tencent_recommendation_2025_tpu.data import synthetic

    data_dir = synthetic.generate(
        tempfile.mkdtemp(prefix="parity_") + "/data",
        num_users=args.users, num_items=args.items, seed=11)

    cfg = {"batch_size": 16, "lr": 1e-2, "maxlen": 24, "hidden": 32,
           "blocks": 2, "heads": 2, "epochs": args.epochs}

    results = {}
    for variant in (["BaseLine", "BaseLineO1"] if args.variant == "both"
                    else [args.variant]):
        q_r, c_r, u_r, ids_r, _ = run_reference(data_dir, cfg,
                                                variant=variant)
        m_ref = evaluate(q_r, c_r, u_r, ids_r, data_dir)
        print(json.dumps({"engine": f"reference_{variant}_torch_cpu",
                          **m_ref}))

        q_o, c_o, u_o, ids_o, _ = run_ours(data_dir, cfg, variant=variant)
        m_ours = evaluate(q_o, c_o, u_o, ids_o, data_dir)
        print(json.dumps({"engine": f"tpu_engine_{variant}", **m_ours}))

        delta = {"hr_delta": m_ours["hr"] - m_ref["hr"],
                 "ndcg_delta": m_ours["ndcg"] - m_ref["ndcg"]}
        print(json.dumps({"variant": variant, "parity": delta}))
        results[variant] = {"reference": m_ref, "ours": m_ours,
                            "delta": delta}
    if args.out:
        Path(args.out).write_text(json.dumps({"results": results,
                                              "config": cfg}))


if __name__ == "__main__":
    main()
