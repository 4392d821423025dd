"""C++ HNSW ANN tool wrapper — the reference-contract serving path (C15).

The reference invokes an external FAISS binary with file-based I/O
(``model/BaseLine/infer.py:213-225``). Our native equivalent lives in
``native/hnsw`` (from-scratch C++ HNSW, no FAISS dependency) and speaks the
same CLI contract:

    hnsw_tool --dataset_vector_file_path=... --dataset_id_file_path=...
              --query_vector_file_path=... --result_id_file_path=...
              --query_ann_top_k=10 --faiss_M=64 --faiss_ef_construction=1280
              --query_ef_search=640 --faiss_metric_type=0

This wrapper builds the binary on demand (make) and falls back to the exact
on-device MIPS path when no native toolchain is available.
"""

from __future__ import annotations

import os
import subprocess
from pathlib import Path
from typing import Optional

from ...config import RetrievalConfig
from ...data import formats

_NATIVE_DIR = Path(__file__).resolve().parents[3] / "native" / "hnsw"
_BINARY = _NATIVE_DIR / "hnsw_tool"


def binary_path(build: bool = True) -> Optional[Path]:
    """Return the tool path, building it with make if needed."""
    if _BINARY.exists():
        return _BINARY
    if not build:
        return None
    try:
        subprocess.run(["make", "-C", str(_NATIVE_DIR)], check=True,
                       capture_output=True)
    except Exception:
        return None
    return _BINARY if _BINARY.exists() else None


def run_ann(result_dir, cfg: RetrievalConfig = RetrievalConfig(),
            dataset_file="embedding.fbin", id_file="id.u64bin",
            query_file="query.fbin", result_file="id100.u64bin") -> Path:
    """Run the ANN search with the reference's file contract; falls back to
    exact MIPS when the native tool is unavailable."""
    result_dir = Path(result_dir)
    out = result_dir / result_file
    tool = binary_path() if cfg.method == "hnsw" else None
    if tool is not None:
        cmd = [
            str(tool),
            f"--dataset_vector_file_path={result_dir / dataset_file}",
            f"--dataset_id_file_path={result_dir / id_file}",
            f"--query_vector_file_path={result_dir / query_file}",
            f"--result_id_file_path={out}",
            f"--query_ann_top_k={cfg.top_k}",
            f"--faiss_M={cfg.hnsw_m}",
            f"--faiss_ef_construction={cfg.hnsw_ef_construction}",
            f"--query_ef_search={cfg.hnsw_ef_search}",
            f"--faiss_metric_type={cfg.metric_type}",
        ]
        subprocess.run(cmd, check=True)
        return out
    # exact fallback (and the primary TPU path): on-device MIPS;
    # method="approx" rides the hardware approx_max_k (16x faster at
    # measured recall 1.0 — the TPU-native analog of the reference's
    # approximate HNSW serving); method="int8" quantizes the corpus to
    # int8 + per-row scales (4x smaller — the single-chip route when the
    # f32 corpus exceeds HBM, e.g. 100M x 64)
    from ..mips import retrieve_topk

    corpus = formats.load_fbin(result_dir / dataset_file)
    ids = formats.load_u64bin(result_dir / id_file)[:, 0]
    queries = formats.load_fbin(result_dir / query_file)
    top = retrieve_topk(queries, corpus, ids, k=cfg.top_k,
                        approx=(cfg.method == "approx"),
                        quantize=(cfg.method == "int8"))
    formats.save_result_ids(top, out)
    return out
