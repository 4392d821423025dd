"""The multi-device presets must actually train sharded from the product CLI
(VERDICT round-1 item 1): ``cli.train --preset sampled_softmax_dp`` on the
8-fake-device CPU mesh builds the mesh from cfg.mesh, routes through
trainer.setup_training -> parallel.train, and leaves state sharded over all
devices. Checkpoints keep logical shapes (restorable into an unsharded
template). Replaces the reference's single-device driver
(``model/BaseLine/main.py:32,51-275``)."""

import numpy as np


def test_cli_train_sharded(synth_dir, tmp_path, monkeypatch):
    import jax

    from tencent_recommendation_2025_tpu.cli import train as cli_train

    assert jax.device_count() == 8
    monkeypatch.setenv("TRAIN_DATA_PATH", str(synth_dir))
    monkeypatch.setenv("TRAIN_LOG_PATH", str(tmp_path / "logs"))
    monkeypatch.delenv("TRAIN_TF_EVENTS_PATH", raising=False)
    monkeypatch.setenv("TRAIN_CKPT_PATH", str(tmp_path / "ckpt"))

    state = cli_train.main([
        "--preset", "sampled_softmax_dp", "--num_epochs", "1",
        "--batch_size", "8", "--hidden_units", "32", "--num_blocks", "2",
        "--num_heads", "2", "--maxlen", "20", "--num_workers", "2"])
    assert state is not None

    # the learned tables must actually live sharded across all 8 devices
    # (the EP layout: rows over the flattened (data, model) axes)
    assert len(state.params["item_emb"].sharding.device_set) == 8
    assert not state.params["item_emb"].sharding.is_fully_replicated

    # checkpoints keep logical (mesh-independent) shapes: restore into an
    # UNsharded template must pass the strict shape guard
    from tencent_recommendation_2025_tpu.config import PRESETS
    from tencent_recommendation_2025_tpu.data.featurizer import (
        FusedVocab, build_item_tables)
    from tencent_recommendation_2025_tpu.data.readers import TencentGRData
    from tencent_recommendation_2025_tpu.data.schema import FeatureSchema
    from tencent_recommendation_2025_tpu.models.baseline import SeqRecModel
    from tencent_recommendation_2025_tpu.train.checkpoint import (
        latest_checkpoint, load_checkpoint)
    from tencent_recommendation_2025_tpu.train.trainer import (
        init_state, make_optimizer)

    cfg = cli_train.build_config(cli_train.get_args([
        "--preset", "sampled_softmax_dp", "--num_epochs", "1",
        "--batch_size", "8", "--hidden_units", "32", "--num_blocks", "2",
        "--num_heads", "2", "--maxlen", "20"]))
    data = TencentGRData(synth_dir, mm_emb_ids=cfg.features.mm_emb_ids)
    schema = FeatureSchema.from_indexer(data.indexer,
                                        cfg.features.mm_emb_ids,
                                        cfg.features.array_cap)
    model = SeqRecModel(cfg=cfg.model, schema=schema,
                        fused=FusedVocab.build(schema),
                        usernum=data.usernum, itemnum=data.itemnum)
    ck = latest_checkpoint(tmp_path / "ckpt")
    assert ck is not None
    template = init_state(model, make_optimizer(cfg), cfg.train.seed, cfg=cfg)
    restored, meta = load_checkpoint(ck, template)
    assert restored.params["item_emb"].shape == (data.itemnum + 1, 32)
    assert np.isfinite(np.asarray(restored.params["item_emb"])).all()
    assert int(restored.step) > 0


def test_cli_build_config_round5_overrides():
    """Round-5 CLI flags reach the config tree."""
    from tencent_recommendation_2025_tpu.cli.train import (build_config,
                                                           get_args)

    args = get_args(["--preset", "baseline", "--grad_accum_steps", "2",
                     "--num_inbatch_negatives", "8", "--profile_steps", "3",
                     "--profile_start", "5",
                     "--eval_retrieval_users", "512"])
    cfg = build_config(args)
    assert cfg.train.grad_accum_steps == 2
    assert cfg.train.num_inbatch_negatives == 8
    assert args.profile_steps == 3 and args.profile_start == 5
    assert cfg.train.eval_retrieval_users == 512
