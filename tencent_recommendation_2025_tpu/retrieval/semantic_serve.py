"""Generative (semantic-ID) serving: query.fbin -> id100.u64bin (F8 serving).

Serves the reference's retrieval file contract
(``model/BaseLine/infer.py:211-234``: query vectors in, top-k retrieval ids
out) with BEAM-SEARCH GENERATIVE retrieval instead of vector ANN:

1. the serving corpus embeddings tokenize through the trained RQ-VAE
   (``models/rqvae.tokenize``) — candidates are coded on the fly, so items
   unseen at tokenizer-training time still serve;
2. queries beam-decode level-wise semantic codes through the decode head
   (``genret_beam_decode``), beams map back to candidate rows;
3. top-k slots the beams don't cover fill from the exact teacher-forced
   scorer (``genret_score_items_exact``) — the same fill rule as
   ``train.rqvae_trainer.genret_retrieve``.

Artifacts (RQ-VAE params + decode head + dims) are written by
``cli.semantic`` under ``MODEL_OUTPUT_PATH/semantic`` via the standard
checkpoint layout and loaded here with config verification.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Tuple

import numpy as np

from ..config import RetrievalConfig, RQVAEConfig
from ..data import formats

SEMANTIC_SUBDIR = "semantic"


def save_semantic_artifacts(model_output_path, rq_params, head_params,
                            rqcfg: RQVAEConfig, input_dim: int,
                            query_dim: int) -> Path:
    """Persist the tokenizer + decode head next to the model checkpoint."""
    import dataclasses

    from ..train import checkpoint as CK

    art_dir = Path(model_output_path) / SEMANTIC_SUBDIR
    return CK.save_checkpoint(
        art_dir, {"rq": rq_params, "head": head_params}, global_step=0,
        extra_meta={"rqvae_config": dataclasses.asdict(rqcfg),
                    "input_dim": int(input_dim),
                    "query_dim": int(query_dim)})


def load_semantic_artifacts(model_output_path) -> Tuple[dict, dict,
                                                        RQVAEConfig]:
    import jax

    from ..models import rqvae as R
    from ..train import checkpoint as CK

    art_dir = Path(model_output_path) / SEMANTIC_SUBDIR
    ck = CK.latest_checkpoint(art_dir)
    assert ck is not None, (
        f"no semantic artifacts under {art_dir} — run cli.semantic on this "
        "checkpoint first (--ann_method semantic serves its outputs)")
    meta = json.loads((ck / CK.META_FILE).read_text())
    rqcfg = RQVAEConfig(**meta["rqvae_config"])
    template = {
        "rq": R.init_rqvae_params(jax.random.key(0), rqcfg,
                                  meta["input_dim"]),
        "head": R.init_genret_params(jax.random.key(0), rqcfg,
                                     meta["query_dim"]),
    }
    state, _ = CK.load_checkpoint(ck, template)
    return state["rq"], state["head"], rqcfg


def run_semantic_ann(result_dir, model_output_path,
                     cfg: RetrievalConfig = RetrievalConfig(),
                     beam_width: int = 32,
                     dataset_file="embedding.fbin", id_file="id.u64bin",
                     query_file="query.fbin",
                     result_file="id100.u64bin") -> Path:
    """Drop-in twin of ``retrieval.ann.run_ann`` for the generative path:
    same on-disk inputs, same ``id100.u64bin`` output of retrieval ids."""
    import jax
    import jax.numpy as jnp

    from ..models import rqvae as R

    result_dir = Path(result_dir)
    out = result_dir / result_file
    corpus = formats.load_fbin(result_dir / dataset_file)
    ids = formats.load_u64bin(result_dir / id_file)[:, 0]
    queries = formats.load_fbin(result_dir / query_file)
    rq_params, head, rqcfg = load_semantic_artifacts(model_output_path)

    # 1) tokenize the serving corpus (works for tokenizer-unseen items)
    tok = jax.jit(lambda x: R.tokenize(rq_params, x))
    cand_codes = []
    for s in range(0, len(corpus), 8192):
        cand_codes.append(np.asarray(tok(jnp.asarray(
            corpus[s:s + 8192], jnp.float32))))
    cand_codes = np.concatenate(cand_codes, axis=0)

    # 2) beam decode + 3) exact-scored fill (genret_retrieve's rule)
    k = cfg.top_k
    decode = jax.jit(lambda q: R.genret_beam_decode(head, rq_params, q,
                                                    rqcfg, beam_width))
    score = jax.jit(lambda q: R.genret_score_items_exact(
        head, rq_params, q, jnp.asarray(cand_codes, jnp.int32), rqcfg))
    rows = []
    for s in range(0, len(queries), 1024):
        q = jnp.asarray(queries[s:s + 1024], jnp.float32)
        bc, bs = decode(q)
        idx = R.beam_retrieve(bc, bs, cand_codes, k)
        if (idx < 0).any():
            _, fill = jax.lax.top_k(score(q), min(k, len(cand_codes)))
            fill = np.asarray(fill)
            for b, row in enumerate(idx):
                missing = row < 0
                if missing.any():
                    pool = [f for f in fill[b] if f not in set(row)]
                    pool += [0] * int(missing.sum())      # degenerate corpus
                    row[missing] = pool[: int(missing.sum())]
        rows.append(idx)
    top_rows = np.concatenate(rows, axis=0)
    formats.save_result_ids(ids[np.maximum(top_rows, 0)], out)
    return out
