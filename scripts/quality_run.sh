#!/usr/bin/env bash
# Standing per-round QUALITY RITUAL (BASELINE.md quality ledger): synthetic
# 2000-user / 5000-item fixture (seed 21) -> full cli.train -> cli.infer ->
# HR@10 / NDCG@10 self-eval, on whatever accelerator is available (the real
# chip under axon; pass --device cpu in EXTRA args for CPU).
#
# Usage:
#   scripts/quality_run.sh WORKDIR PRESET [extra cli.train args...]
# Env:
#   QUAL_TAG  - suffix for the run dir (A/B variants of one preset)
#   QUAL_ANN  - cli.infer --ann_method (default exact)
#
# Round-3/4 bands on this fixture (run variance ~±1pp):
#   hstu_flagship      HR@10 0.3340 / NDCG 0.1863
#   sampled_softmax_dp HR@10 0.3050 / NDCG 0.2032  (round-3, inbatch=0)
set -euo pipefail

REPO_DIR="$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd)"
export PYTHONPATH="${REPO_DIR}${PYTHONPATH:+:${PYTHONPATH}}"
# persistent compile cache: the flagship step compiles for minutes through
# the remote Mosaic compiler; cached re-runs start in seconds
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-$REPO_DIR/.jax_cache}"

WORK="$1"; PRESET="$2"; shift 2
DATA="$WORK/data"
RUN="$WORK/${PRESET}${QUAL_TAG:-}"
mkdir -p "$RUN"

if [[ ! -f "$DATA/seq.jsonl" ]]; then
  python - "$DATA" <<'EOF'
import sys
from pathlib import Path

from tencent_recommendation_2025_tpu.data import synthetic

d = Path(sys.argv[1])
d.mkdir(parents=True, exist_ok=True)
synthetic.generate(d, num_users=2000, num_items=5000, min_seq=20,
                   max_seq=120, seed=21)
print(f"fixture at {d}")
EOF
fi

TRAIN_DATA_PATH="$DATA" TRAIN_LOG_PATH="$RUN/logs" \
TRAIN_TF_EVENTS_PATH="$RUN/tb" TRAIN_CKPT_PATH="$RUN/ckpt" \
  python -u -m tencent_recommendation_2025_tpu.cli.train \
    --preset "$PRESET" --maxlen 255 --num_epochs 2 "$@" \
    2>&1 | tee "$RUN/train.out"

EVAL_DATA_PATH="$DATA" EVAL_RESULT_PATH="$RUN/result" \
MODEL_OUTPUT_PATH="$RUN/ckpt" \
  python -u -m tencent_recommendation_2025_tpu.cli.infer \
    --preset "$PRESET" --maxlen 255 --ann_method "${QUAL_ANN:-exact}" \
    2>&1 | tee "$RUN/infer.out"

grep -h "HR@10" "$RUN/infer.out" | tail -1
