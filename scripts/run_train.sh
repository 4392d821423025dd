#!/usr/bin/env bash
# Train entry script (reference model/BaseLine/run.sh contract: cd into
# RUNTIME_SCRIPT_DIR if set, launch the train driver with full acceleration —
# which for this engine is simply the default bf16+XLA path).
set -euo pipefail

if [[ -n "${RUNTIME_SCRIPT_DIR:-}" ]]; then
  cd "${RUNTIME_SCRIPT_DIR}"
fi

REPO_DIR="$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd)"
export PYTHONPATH="${REPO_DIR}${PYTHONPATH:+:${PYTHONPATH}}"

exec python -u -m tencent_recommendation_2025_tpu.cli.train "$@"
