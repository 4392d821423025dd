"""End-to-end smoke: synthetic data -> train -> retrieve -> eval (CPU, ~1 min)."""
import json, os, sys, tempfile, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np

from tencent_recommendation_2025_tpu.config import Config, ModelConfig, TrainConfig
from tencent_recommendation_2025_tpu.data import synthetic, formats
from tencent_recommendation_2025_tpu.data.readers import TencentGRData
from tencent_recommendation_2025_tpu.data.schema import FeatureSchema
from tencent_recommendation_2025_tpu.data.featurizer import FusedVocab, build_item_tables, pack_item_feat
from tencent_recommendation_2025_tpu.data.dataset import TrainSampler, TestSampler
from tencent_recommendation_2025_tpu.data.pipeline import TrainLoader, TestLoader, train_val_split
from tencent_recommendation_2025_tpu.models.baseline import SeqRecModel
from tencent_recommendation_2025_tpu.train.trainer import train_loop, device_tables
from tencent_recommendation_2025_tpu.train.checkpoint import latest_checkpoint, load_checkpoint
from tencent_recommendation_2025_tpu.retrieval.ann import run_ann
from tencent_recommendation_2025_tpu.retrieval.evaluator import hr_ndcg_at_k
from tencent_recommendation_2025_tpu.config import RetrievalConfig
import jax.numpy as jnp

root = tempfile.mkdtemp(prefix="e2e_")
data_dir = synthetic.generate(f"{root}/data", num_users=48, num_items=120, seed=3)
print("[1] synthetic data at", data_dir)

cfg = Config(model=ModelConfig(hidden_units=32, num_blocks=2, num_heads=2, maxlen=16,
                               dtype="float32"),
             train=TrainConfig(batch_size=16, num_epochs=2, lr=1e-2))
data = TencentGRData(data_dir, mm_emb_ids=("81",))
schema = FeatureSchema.from_indexer(data.indexer, ("81",))
fused = FusedVocab.build(schema)
tables = build_item_tables(data.item_feat_dict, data.itemnum, schema,
                           data.mm_emb_dict, data.indexer_i_rev)
model = SeqRecModel(cfg=cfg.model, schema=schema, fused=fused,
                    usernum=data.usernum, itemnum=data.itemnum)
sampler = TrainSampler(data, schema, cfg.model.maxlen)
tr, va = train_val_split(len(sampler), 0.1, cfg.train.seed)
tl = TrainLoader(sampler, tr, cfg.train.batch_size, seed=0)
vl = TrainLoader(sampler, va, cfg.train.batch_size, seed=0, shuffle=False)
t0 = time.time()
state = train_loop(model, cfg, tl, vl, tables,
                   log_dir=f"{root}/logs", tb_dir=None, ckpt_dir=f"{root}/ckpt",
                   verbose=False)
print(f"[2] trained 2 epochs in {time.time()-t0:.1f}s; train.log lines:",
      sum(1 for _ in open(f"{root}/logs/train.log")))

ck = latest_checkpoint(f"{root}/ckpt")
print("[3] checkpoint dir:", ck.name)
restored, meta = load_checkpoint(ck, state)
print("    restored meta:", meta)

# inference: encode test users -> query.fbin; candidates -> embedding.fbin
test_data = TencentGRData(data_dir, mm_emb_ids=("81",), split="test")
ts = TestSampler(test_data, schema, cfg.model.maxlen)
loader = TestLoader(ts, batch_size=16)
dtabs = device_tables(tables)
queries, users = [], []
for batch, uids, n_valid in loader:
    q = model.predict(restored.params, jax.device_put(batch), dtabs["mm"])
    queries.append(np.asarray(q)[:n_valid]); users += uids[:n_valid]
queries = np.concatenate(queries).astype(np.float32)

# candidate corpus from predict_set.jsonl
cand = [json.loads(l) for l in open(data_dir/"predict_set.jsonl")]
ids = np.array([data.indexer["i"].get(c["creative_id"], 0) for c in cand], np.int32)
rids = np.array([c["retrieval_id"] for c in cand], np.uint64)
sp = np.stack([pack_item_feat(c["features"], schema)[0] for c in cand])
ar = np.stack([pack_item_feat(c["features"], schema)[1] for c in cand])
mm = {"81": np.stack([np.asarray(tables.mm["81"][i]) for i in ids])}
embs = np.asarray(model.encode_items(restored.params, jnp.asarray(ids), jnp.asarray(sp),
                                     jnp.asarray(ar), {k: jnp.asarray(v) for k, v in mm.items()}))
res = f"{root}/result"; os.makedirs(res, exist_ok=True)
formats.save_emb(embs.astype(np.float32), f"{res}/embedding.fbin")
formats.save_emb(rids.reshape(-1,1), f"{res}/id.u64bin")
formats.save_emb(queries, f"{res}/query.fbin")
out = run_ann(res, RetrievalConfig(method="exact"))
top = formats.read_result_ids(out)
print("[4] retrieval:", top.shape, "result file", out.name)

rid2cid = {c["retrieval_id"]: c["creative_id"] for c in cand}
topids = {u: [rid2cid[int(r)] for r in row] for u, row in zip(users, top)}
gt = json.load(open(data_dir/"ground_truth.json"))
m = hr_ndcg_at_k(topids, gt, k=10)
print("[5] eval:", m)
assert m["n"] > 0 and m["hr"] > 0.0, "expected some hits on tiny corpus"
print("E2E OK")
