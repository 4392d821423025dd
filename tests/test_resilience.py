"""Checkpoint/resume semantics + supervisor restart with fault injection
(SURVEY.md §5 failure detection / elastic recovery)."""

import numpy as np
import pytest

from tencent_recommendation_2025_tpu.data.dataset import TrainSampler
from tencent_recommendation_2025_tpu.data.pipeline import (TrainLoader,
                                                           train_val_split)
from tencent_recommendation_2025_tpu.train import checkpoint as CK
from tencent_recommendation_2025_tpu.train.supervisor import (FaultInjected,
                                                              run_supervised)
from tencent_recommendation_2025_tpu.train.trainer import (
    device_tables, init_state, make_optimizer, make_train_step)

import jax


def _setup(small_setup):
    model = small_setup["model"]
    cfg = small_setup["cfg"]
    sampler = TrainSampler(small_setup["data"], small_setup["schema"],
                           maxlen=model.cfg.maxlen)
    tr, _ = train_val_split(len(sampler), 0.1, 0)
    loader = TrainLoader(sampler, tr, cfg.train.batch_size, seed=0)
    tables = device_tables(small_setup["tables"])
    tx = make_optimizer(cfg)
    step = make_train_step(model, tx, cfg)
    return model, cfg, loader, tables, tx, step


def test_checkpoint_resume_continues_exactly(small_setup, tmp_path):
    """Training 4 steps straight == training 2, checkpointing, resuming 2."""
    model, cfg, loader, tables, tx, step = _setup(small_setup)
    rng = jax.random.key(7)
    batches = list(loader.epoch(0))[:4]

    s_full = init_state(model, tx, cfg.train.seed)
    for b in batches:
        s_full, _ = step(s_full, b, tables["mm"], tables, rng)

    s_a = init_state(model, tx, cfg.train.seed)
    for b in batches[:2]:
        s_a, _ = step(s_a, b, tables["mm"], tables, rng)
    CK.save_checkpoint(tmp_path, s_a, global_step=2, valid_loss=0.5)

    template = init_state(model, tx, cfg.train.seed)
    s_b, meta = CK.load_checkpoint(CK.latest_checkpoint(tmp_path), template)
    assert meta["global_step"] == 2
    for b in batches[2:]:
        s_b, _ = step(s_b, b, tables["mm"], tables, rng)

    for a, b in zip(jax.tree.leaves(s_full.params), jax.tree.leaves(s_b.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6,
                                   atol=1e-7)


def test_atomic_checkpoint_ignores_tmp(tmp_path, small_setup):
    model, cfg, loader, tables, tx, step = _setup(small_setup)
    s = init_state(model, tx, cfg.train.seed)
    CK.save_checkpoint(tmp_path, s, global_step=5)
    # simulate a crash mid-write: a stale .tmp dir must not be picked up
    (tmp_path / "global_step9.valid_loss=0.0000.tmp").mkdir()
    latest = CK.latest_checkpoint(tmp_path)
    assert latest.name.startswith("global_step5")


def test_supervisor_restarts_from_checkpoint(small_setup, tmp_path):
    model, cfg, loader, tables, tx, step = _setup(small_setup)
    rng = jax.random.key(7)
    batches = list(loader.epoch(0))[:4]
    template = init_state(model, tx, cfg.train.seed)
    calls = {"n": 0}

    def train_fn(resume, attempt):
        calls["n"] += 1
        state = resume if resume is not None \
            else init_state(model, tx, cfg.train.seed)
        start = int(np.asarray(state.step))
        for i, b in enumerate(batches[start:], start=start):
            if attempt == 0 and i == 2:
                raise FaultInjected("injected host failure at step 2")
            state, _ = step(state, b, tables["mm"], tables, rng)
            CK.save_checkpoint(tmp_path, state, global_step=i + 1)
        return state

    final = run_supervised(train_fn, tmp_path, template, max_restarts=2,
                           verbose=False)
    assert calls["n"] == 2                       # crashed once, restarted once
    assert int(np.asarray(final.step)) == 4

    # matches an uninterrupted run
    s_full = init_state(model, tx, cfg.train.seed)
    for b in batches:
        s_full, _ = step(s_full, b, tables["mm"], tables, rng)
    for a, b in zip(jax.tree.leaves(s_full.params),
                    jax.tree.leaves(final.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6,
                                   atol=1e-7)


def test_async_save_and_kill_during_save(small_setup, tmp_path):
    """Async save produces a loadable checkpoint; a crash mid-write (fault
    hook) leaves only a .tmp staging dir that latest_checkpoint ignores, so
    recovery proceeds from the previous complete checkpoint."""
    model, cfg, loader, tables, tx, step = _setup(small_setup)
    s = init_state(model, tx, cfg.train.seed)

    h = CK.save_checkpoint_async(tmp_path, s, global_step=3, valid_loss=0.9,
                                 model_config=model.cfg)
    path = h.result()
    assert path.name.startswith("global_step3")
    restored, meta = CK.load_checkpoint(path, init_state(model, tx,
                                                         cfg.train.seed),
                                        model_config=model.cfg)
    assert meta["model_config"]["hidden_units"] == model.cfg.hidden_units
    np.testing.assert_array_equal(np.asarray(restored.params["item_emb"]),
                                  np.asarray(s.params["item_emb"]))

    # crash after 2 leaf files: no step-7 checkpoint may appear
    with pytest.raises(RuntimeError, match="injected"):
        CK.save_checkpoint(tmp_path, s, global_step=7, _fault_after_files=2)
    latest = CK.latest_checkpoint(tmp_path)
    assert latest is not None and latest.name.startswith("global_step3")


def test_load_rejects_config_skew(small_setup, tmp_path):
    """The reference's train/infer config-skew landmine (BaseLineO1 hidden 64
    train vs 128 infer) fails loudly naming the skewed field."""
    import dataclasses

    model, cfg, loader, tables, tx, step = _setup(small_setup)
    s = init_state(model, tx, cfg.train.seed)
    CK.save_checkpoint(tmp_path, s, global_step=1, model_config=model.cfg)
    skewed = dataclasses.replace(model.cfg, hidden_units=128)
    with pytest.raises(ValueError, match="hidden_units"):
        CK.load_checkpoint(CK.latest_checkpoint(tmp_path),
                           init_state(model, tx, cfg.train.seed),
                           model_config=skewed)


def test_load_rejects_structure_change(small_setup, tmp_path):
    """A pytree structure change (extra param) is caught by the tree-path
    manifest even when no shape differs."""
    model, cfg, loader, tables, tx, step = _setup(small_setup)
    s = init_state(model, tx, cfg.train.seed)
    CK.save_checkpoint(tmp_path, s, global_step=1)
    from tencent_recommendation_2025_tpu.train.trainer import TrainState

    bigger = TrainState(params={**s.params, "new_head": s.params["item_emb"]},
                        opt_state=s.opt_state, step=s.step)
    with pytest.raises(ValueError, match="structure mismatch"):
        CK.load_checkpoint(CK.latest_checkpoint(tmp_path), bigger)


def test_checkpoint_converts_between_table_layouts(tmp_path):
    """A big table checkpointed in one STORAGE layout restores into the
    other: mesh runs save logical [V, D] (pack_big_tables=False), single-
    chip runs store packed [V/16, 8, 128] — contents must transfer both
    ways (plus the 1-D rowwise accumulator across the pad rows)."""
    import dataclasses
    import jax.numpy as jnp
    from tencent_recommendation_2025_tpu.config import ModelConfig

    rng = np.random.default_rng(3)
    V, D = 100, 64                     # packs to (8, 8, 128) = 128 rows
    table = rng.standard_normal((V, D)).astype(np.float32)
    cfg_u = ModelConfig(pack_big_tables=False)
    cfg_p = dataclasses.replace(cfg_u, pack_big_tables=True)

    state_u = {"item_emb": jnp.asarray(table), "acc": jnp.ones((V,))}
    CK.save_checkpoint(tmp_path / "u", state_u, global_step=1,
                       model_config=cfg_u)
    target_p = {"item_emb": jnp.zeros((8, 8, 128)),
                "acc": jnp.zeros((128,))}
    got_p, _ = CK.load_checkpoint(CK.latest_checkpoint(tmp_path / "u"),
                                  target_p, model_config=cfg_p)
    unpacked = np.asarray(got_p["item_emb"]).reshape(128, D)
    np.testing.assert_allclose(unpacked[:V], table)
    assert (unpacked[V:] == 0).all()
    assert (np.asarray(got_p["acc"])[:V] == 1).all()

    CK.save_checkpoint(tmp_path / "p", got_p, global_step=1,
                       model_config=cfg_p)
    got_u, _ = CK.load_checkpoint(CK.latest_checkpoint(tmp_path / "p"),
                                  state_u, model_config=cfg_u)
    np.testing.assert_allclose(np.asarray(got_u["item_emb"]), table)
    assert (np.asarray(got_u["acc"]) == 1).all()


def test_layout_conversion_rejects_genuine_skew(tmp_path):
    """_convert_layout only bridges the pad-row/packing boundary — truly
    different shapes still raise the architecture-skew error."""
    import jax.numpy as jnp

    state = {"item_emb": jnp.zeros((100, 64)), "acc": jnp.zeros((100,))}
    CK.save_checkpoint(tmp_path, state, global_step=1)
    ckpt = CK.latest_checkpoint(tmp_path)
    with pytest.raises(ValueError, match="shape"):
        CK.load_checkpoint(ckpt, {"item_emb": jnp.zeros((16, 8, 128)),
                                  "acc": jnp.zeros((100,))})  # 2x rows
    with pytest.raises(ValueError, match="shape"):
        CK.load_checkpoint(ckpt, {"item_emb": jnp.zeros((100, 64)),
                                  "acc": jnp.zeros((160,))})  # diff >= 32
    # a 1-D accumulator whose surplus rows carry TRAINED data (genuine
    # vocab skew, not shard padding) still fails loudly
    CK.save_checkpoint(tmp_path / "acc1", {"acc": jnp.ones((108,))},
                       global_step=1)
    with pytest.raises(ValueError, match="NOT all zero"):
        CK.load_checkpoint(CK.latest_checkpoint(tmp_path / "acc1"),
                           {"acc": jnp.zeros((100,))})
    # mesh shard-count padding (5001 -> 5008 on 8 shards) converts — the
    # round-5 sharded_multihost restore bug: rowwise-Adagrad state saved
    # mesh-padded must restore into the single-device template
    padded = jnp.concatenate([jnp.ones((100,)), jnp.zeros((4,))])
    CK.save_checkpoint(tmp_path / "acc2", {"acc": padded}, global_step=1)
    got, _ = CK.load_checkpoint(CK.latest_checkpoint(tmp_path / "acc2"),
                                {"acc": jnp.zeros((100,))})
    assert (np.asarray(got["acc"]) == 1).all()


def test_row_cut_refuses_trained_rows(tmp_path):
    """The [V, D] pad-boundary branch only CUTS rows that are all zero
    (shard padding). A checkpoint whose surplus rows carry trained data —
    genuine vocab skew, invisible to the config check since vocab comes
    from the data — must fail loudly instead of silently dropping them."""
    import jax.numpy as jnp

    trained = jnp.ones((104, 64))      # surplus rows NON-zero
    CK.save_checkpoint(tmp_path / "bad", {"item_emb": trained},
                       global_step=1)
    with pytest.raises(ValueError, match="NOT all zero"):
        CK.load_checkpoint(CK.latest_checkpoint(tmp_path / "bad"),
                           {"item_emb": jnp.zeros((100, 64))})

    # zero surplus rows (real shard padding) still convert fine
    padded = jnp.concatenate([jnp.ones((100, 64)), jnp.zeros((4, 64))])
    CK.save_checkpoint(tmp_path / "ok", {"item_emb": padded}, global_step=1)
    got, _ = CK.load_checkpoint(CK.latest_checkpoint(tmp_path / "ok"),
                                {"item_emb": jnp.zeros((100, 64))})
    assert (np.asarray(got["item_emb"]) == 1).all()


class _FaultyLoader:
    """Wraps a TrainLoader; raises ONCE at (epoch, step) to simulate a host
    failure mid-epoch (the supervisor docstring's ``inject_fault_at_step``)."""

    def __init__(self, inner, fail_epoch, fail_step):
        self.inner = inner
        self.fail_epoch, self.fail_step = fail_epoch, fail_step
        self.armed = True

    def __len__(self):
        return len(self.inner)

    def epoch(self, e):
        for i, b in enumerate(self.inner.epoch(e)):
            if self.armed and e == self.fail_epoch and i == self.fail_step:
                self.armed = False
                raise FaultInjected(f"injected failure epoch {e} step {i}")
            yield b


def _ckpt_step(path):
    import re
    return int(re.match(r"global_step(\d+)", path.name).group(1))


def test_resume_runs_only_remaining_epochs(small_setup, tmp_path):
    """Reference epoch_start_idx semantics (main.py:118-127, loop :154):
    crash mid-epoch-2, resume from the epoch-1 checkpoint, and the resumed
    run trains ONLY epoch 2 — monotone global_step checkpoint names, final
    step count == full budget, params == an uninterrupted 2-epoch run."""
    from tencent_recommendation_2025_tpu.train.trainer import train_loop

    model, cfg, loader, tables, tx, step = _setup(small_setup)
    item_tables = small_setup["tables"]
    n = len(loader)

    s_full = train_loop(model, cfg, loader, None, item_tables,
                        num_epochs=2, verbose=False)

    ckpt = tmp_path / "ckpt"
    faulty = _FaultyLoader(loader, fail_epoch=2, fail_step=1)
    with pytest.raises(FaultInjected):
        train_loop(model, cfg, faulty, None, item_tables,
                   ckpt_dir=str(ckpt), num_epochs=2, verbose=False)

    # the crash path joined the in-flight async save: epoch 1's checkpoint
    # is complete and picked up immediately, no retry loop needed
    latest = CK.latest_checkpoint(ckpt)
    assert latest is not None
    assert _ckpt_step(latest) == n
    restored, meta = CK.load_checkpoint(
        latest, init_state(model, tx, cfg.train.seed))
    assert meta["epoch"] == 1
    assert int(np.asarray(restored.step)) == n

    s_res = train_loop(model, cfg, loader, None, item_tables,
                       ckpt_dir=str(ckpt), state=restored,
                       start_epoch=meta["epoch"], num_epochs=2,
                       verbose=False)
    # only epoch 2 ran: total trained steps == 2 epochs, not 3
    assert int(np.asarray(s_res.step)) == 2 * n
    final = CK.latest_checkpoint(ckpt)
    assert _ckpt_step(final) == 2 * n > n  # monotone names, > crash step
    _, final_meta = CK.load_checkpoint(
        final, init_state(model, tx, cfg.train.seed))
    assert final_meta["epoch"] == 2

    for a, b in zip(jax.tree.leaves(s_full.params),
                    jax.tree.leaves(s_res.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6,
                                   atol=1e-7)

    # resuming a FINISHED run is a no-op, not a re-train
    s_done = train_loop(model, cfg, loader, None, item_tables,
                        state=s_res, start_epoch=2, num_epochs=2,
                        verbose=False)
    assert int(np.asarray(s_done.step)) == 2 * n


def test_supervisor_resumes_remaining_epochs(small_setup, tmp_path):
    """run_supervised + train_loop converge to exactly the epoch budget: the
    restart receives the checkpoint meta and continues from its epoch instead
    of re-running the full budget per crash (round-4 weak #5)."""
    from tencent_recommendation_2025_tpu.train.trainer import train_loop

    model, cfg, loader, tables, tx, step = _setup(small_setup)
    item_tables = small_setup["tables"]
    n = len(loader)
    faulty = _FaultyLoader(loader, fail_epoch=2, fail_step=1)
    template = init_state(model, tx, cfg.train.seed)
    calls = []

    def train_fn(resume, attempt, meta):
        se = int(meta.get("epoch", 0)) if meta else 0
        calls.append(se)
        return train_loop(model, cfg, faulty, None, item_tables,
                          ckpt_dir=str(tmp_path), state=resume,
                          start_epoch=se, num_epochs=2, verbose=False)

    final = run_supervised(train_fn, tmp_path, template, max_restarts=2,
                           verbose=False)
    assert calls == [0, 1]                 # restart resumed AFTER epoch 1
    assert int(np.asarray(final.step)) == 2 * n   # exactly the budget
    assert _ckpt_step(CK.latest_checkpoint(tmp_path)) == 2 * n


def test_sigterm_checkpoints_and_exits_cleanly(small_setup, tmp_path):
    """Graceful preemption (SURVEY §5): SIGTERM mid-epoch finishes the
    current step, writes a synchronous checkpoint with meta epoch = the
    last COMPLETE epoch, and returns cleanly; resuming from it trains the
    remaining budget to the same final state as an uninterrupted run."""
    import os
    import signal as _signal

    from tencent_recommendation_2025_tpu.train.trainer import train_loop

    model, cfg, loader, tables, tx, step = _setup(small_setup)
    item_tables = small_setup["tables"]
    n = len(loader)

    s_full = train_loop(model, cfg, loader, None, item_tables,
                        num_epochs=2, verbose=False)

    class SignalingLoader:
        """Raises SIGTERM at (epoch 2, step 1) — the handler defers the
        stop to the end of the in-flight step."""

        def __init__(self, inner):
            self.inner = inner
            self.armed = True

        def __len__(self):
            return len(self.inner)

        def epoch(self, e):
            for i, b in enumerate(self.inner.epoch(e)):
                if self.armed and e == 2 and i == 1:
                    self.armed = False
                    os.kill(os.getpid(), _signal.SIGTERM)
                yield b

    ckpt = tmp_path / "ck"
    prev = _signal.getsignal(_signal.SIGTERM)
    s_pre = train_loop(model, cfg, SignalingLoader(loader), None,
                       item_tables, ckpt_dir=str(ckpt), num_epochs=2,
                       verbose=False)
    # handler restored, loop returned (not killed), preemption ckpt exists
    assert _signal.getsignal(_signal.SIGTERM) == prev
    latest = CK.latest_checkpoint(ckpt)
    assert latest is not None
    restored, meta = CK.load_checkpoint(
        latest, init_state(model, tx, cfg.train.seed))
    assert meta.get("preempted") is True
    assert meta["epoch"] == 1                       # epoch 2 incomplete
    # the prefetch pipeline runs ahead of the consumer, so the stop lands
    # 1-2 steps after the signal — what matters is CONSISTENCY: the saved
    # step counter equals epoch-1's steps plus the recorded epoch-2 prefix
    assert meta["epoch_step"] >= 1
    assert int(np.asarray(restored.step)) == n + meta["epoch_step"]
    assert int(np.asarray(restored.step)) == int(np.asarray(s_pre.step))

    # STEP-granular resume: skip the already-trained epoch-2 prefix and
    # continue — bit-identical to the uninterrupted run (deterministic
    # loaders + rng folded on state.step)
    s_res = train_loop(model, cfg, loader, None, item_tables,
                       state=restored, start_epoch=meta["epoch"],
                       skip_steps=meta["epoch_step"],
                       num_epochs=2, verbose=False)
    assert int(np.asarray(s_res.step)) == 2 * n     # no double-training
    for a, b in zip(jax.tree.leaves(s_full.params),
                    jax.tree.leaves(s_res.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6,
                                   atol=1e-7)


def test_supervisor_gives_up_after_max_restarts(small_setup, tmp_path):
    model, cfg, loader, tables, tx, step = _setup(small_setup)
    template = init_state(model, tx, cfg.train.seed)

    def always_fail(resume, attempt):
        raise FaultInjected("permafail")

    with pytest.raises(FaultInjected):
        run_supervised(always_fail, tmp_path, template, max_restarts=2,
                       verbose=False)


def test_sharded_checkpoint_save_and_restore(small_setup, tmp_path):
    """Mesh-sharded state saves PER-SHARD files (no gather of any sharded
    leaf — the manifest lists one file per shard extent), restores (a) into
    an unsharded logical-shape template via host reassembly + the row-pad
    layout conversion, (b) shard-direct onto the mesh via `shardings`
    (make_array_from_single_device_arrays — no full host array), and a kill
    mid-write still leaves only a .tmp staging dir."""
    import json

    from tencent_recommendation_2025_tpu.config import MeshConfig
    from tencent_recommendation_2025_tpu.parallel import train as PT
    from tencent_recommendation_2025_tpu.parallel.mesh import build_mesh

    model, cfg, loader, tables, tx, step = _setup(small_setup)
    mesh = build_mesh(MeshConfig(data=8))
    cfg_m = cfg.replace(mesh=MeshConfig(data=8))
    state, tx_m = PT.init_sharded_state(model, cfg_m, mesh)

    h = CK.save_checkpoint_async(tmp_path, state, global_step=5,
                                 valid_loss=0.5, model_config=model.cfg)
    path = h.result()
    manifest = json.loads((path / "manifest.json").read_text())
    by_path = {e["path"]: e for e in manifest["leaves"]}
    # TrainState flattens positionally: params is child 0
    emb_key = next(k for k in by_path if k.endswith("/item_emb")
                   and k.startswith("0"))
    assert "shards" in by_path[emb_key], "table leaf was not saved per-shard"
    assert len(by_path[emb_key]["shards"]) == 8

    # (a) host reassembly into the logical-shape single-device template:
    # the saved table carries shard-pad rows; _convert_layout cuts them
    template = init_state(model, tx_m, cfg.train.seed)
    restored, _ = CK.load_checkpoint(path, template, model_config=model.cfg)
    V = template.params["item_emb"].shape[0]
    np.testing.assert_array_equal(
        np.asarray(restored.params["item_emb"]),
        np.asarray(state.params["item_emb"])[:V])

    # (b) shard-direct restore onto the same mesh: each shard file lands on
    # its device; the result is a sharded jax Array, not a numpy assembly
    got = CK._load_entry(path, by_path[emb_key],
                         state.params["item_emb"].sharding)
    assert hasattr(got, "sharding")
    assert len(got.sharding.device_set) == 8
    np.testing.assert_array_equal(np.asarray(got),
                                  np.asarray(state.params["item_emb"]))

    # full-tree shardings path through load_checkpoint
    shardings = {CK._path_str(p): leaf.sharding for p, leaf in
                 jax.tree_util.tree_flatten_with_path(state)[0]}
    restored_m, _ = CK.load_checkpoint(
        path, jax.tree.map(lambda x: x, state), model_config=model.cfg,
        shardings=shardings)
    assert len(restored_m.params["item_emb"].sharding.device_set) == 8
    np.testing.assert_array_equal(np.asarray(restored_m.params["item_emb"]),
                                  np.asarray(state.params["item_emb"]))

    # kill mid-write on the sharded snapshot
    with pytest.raises(RuntimeError, match="injected"):
        CK.save_checkpoint(tmp_path, state, global_step=9,
                           _fault_after_files=3)
    latest = CK.latest_checkpoint(tmp_path)
    assert latest is not None and latest.name.startswith("global_step5")
