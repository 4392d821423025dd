#!/usr/bin/env bash
# Inference entry script (reference infer flow: EVAL_DATA_PATH /
# EVAL_RESULT_PATH / MODEL_OUTPUT_PATH env contract).
set -euo pipefail

if [[ -n "${RUNTIME_SCRIPT_DIR:-}" ]]; then
  cd "${RUNTIME_SCRIPT_DIR}"
fi

REPO_DIR="$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd)"
export PYTHONPATH="${REPO_DIR}${PYTHONPATH:+:${PYTHONPATH}}"

exec python -u -m tencent_recommendation_2025_tpu.cli.infer "$@"
