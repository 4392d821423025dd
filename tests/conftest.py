"""Test harness: force an 8-fake-device CPU platform (SURVEY.md §4).

Multi-device tests run on a virtual CPU mesh
(``--xla_force_host_platform_device_count=8``); TPU parity is covered by the
driver's real-chip bench and compile checks.
"""

import os

# The sandbox pre-sets JAX_PLATFORMS=axon (remote-TPU tunnel with seconds of
# per-dispatch latency) and the axon plugin ignores the env var — the config
# update below is what actually forces CPU. Env set too for subprocesses.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np
import pytest


@pytest.fixture(scope="session")
def synth_dir(tmp_path_factory):
    """A session-scoped synthetic mini-TencentGR dataset."""
    from tencent_recommendation_2025_tpu.data import synthetic

    d = tmp_path_factory.mktemp("tencentgr_mini")
    synthetic.generate(d, num_users=32, num_items=100, min_seq=5, max_seq=20,
                       mm_emb_ids=("81",), seed=7)
    return d


@pytest.fixture(scope="session")
def small_setup(synth_dir):
    """Data + schema + model + tables for a small config."""
    from tencent_recommendation_2025_tpu.config import Config, ModelConfig, TrainConfig
    from tencent_recommendation_2025_tpu.data.featurizer import (
        FusedVocab, build_item_tables)
    from tencent_recommendation_2025_tpu.data.readers import TencentGRData
    from tencent_recommendation_2025_tpu.data.schema import FeatureSchema
    from tencent_recommendation_2025_tpu.models.baseline import SeqRecModel

    cfg = Config(
        model=ModelConfig(hidden_units=32, num_blocks=2, num_heads=2,
                          maxlen=20, dtype="float32"),
        train=TrainConfig(batch_size=8, num_epochs=1),
    )
    data = TencentGRData(synth_dir, mm_emb_ids=("81",))
    schema = FeatureSchema.from_indexer(data.indexer, mm_emb_ids=("81",),
                                        array_cap=8)
    fused = FusedVocab.build(schema)
    tables = build_item_tables(data.item_feat_dict, data.itemnum, schema,
                               data.mm_emb_dict, data.indexer_i_rev)
    model = SeqRecModel(cfg=cfg.model, schema=schema, fused=fused,
                        usernum=data.usernum, itemnum=data.itemnum)
    return {"cfg": cfg, "data": data, "schema": schema, "fused": fused,
            "tables": tables, "model": model, "dir": synth_dir}
