"""Checkpoint / resume (SURVEY.md §5): per-leaf layout, async writer, strict
config + structure verification.

The reference saves a bare ``state_dict`` per epoch into
``TRAIN_CKPT_PATH/global_step{N}.valid_loss={v}/model.pt`` and does NOT save
optimizer state (``main.py:267-269``); inference loads the first ``*.pt``
under ``MODEL_OUTPUT_PATH`` (``infer.py:14-20``). We keep the directory-name
contract but save the **full** train state:

- one ``.npy`` file per pytree leaf (streamed, no single giant blob — a
  100M-row table writes as its own file) plus ``manifest.json`` recording
  every leaf's tree path/shape/dtype — restore verifies PATHS, not just
  positions, so a structure change between save and load fails loudly even
  when shapes coincide;
- ``meta.json`` records step/loss AND the model config, verified on load
  against the restoring model (the reference's known landmine: BaseLineO1
  trains hidden=64 but infers hidden=128 — SURVEY.md §2.1 quirks);
- ``save_checkpoint_async`` fetches leaves to host synchronously (device
  buffers may be donated by the next train step) and writes files on a
  background thread; atomic ``.tmp`` staging + rename means a crash mid-write
  is never picked up by ``latest_checkpoint``;
- the legacy round-1 single-``state.msgpack`` layout still loads.
"""

from __future__ import annotations

import dataclasses
import json
import re
import shutil
import threading
from pathlib import Path
from typing import Any, Optional, Tuple

import jax
import numpy as np

CKPT_FILE = "state.msgpack"          # legacy round-1 layout
MANIFEST_FILE = "manifest.json"
META_FILE = "meta.json"


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        elif hasattr(p, "name"):
            parts.append(str(p.name))
        else:
            parts.append(str(p))
    return "/".join(parts)


def _flatten_with_paths(state: Any):
    flat, _ = jax.tree_util.tree_flatten_with_path(state)
    return [(_path_str(p), leaf) for p, leaf in flat]


def _config_dict(model_config) -> Optional[dict]:
    if model_config is None:
        return None
    if dataclasses.is_dataclass(model_config):
        return dataclasses.asdict(model_config)
    return dict(model_config)


def _shard_snapshot(leaf):
    """Host snapshot of one leaf WITHOUT gathering across devices.

    A jax.Array with >1 distinct shard extents snapshots per shard as
    [(index_json, payload)], where index_json is the shard's [start, stop]
    per dim within the global array and payload is an np.ndarray for
    extents THIS process owns, or None for extents owned elsewhere (the
    multi-process case — the owning process writes those files). The
    canonical owner of an extent is the process holding the lowest-id
    device mapped to it, so exactly one process materializes each extent
    even when replicas span processes. Everything else (replicated,
    single-device, numpy) snapshots as one np.asarray — a device-local
    copy, not a cross-device gather (fully-replicated arrays are host-
    readable on every process)."""
    shards = getattr(leaf, "addressable_shards", None)
    if shards is None or getattr(leaf, "ndim", 0) == 0:
        return np.asarray(leaf)
    shape = leaf.shape

    def idx_json(index):
        return [[int(s.start or 0),
                 int(s.stop if s.stop is not None else d)]
                for s, d in zip(index, shape)]

    sharding = getattr(leaf, "sharding", None)
    if sharding is not None and not getattr(leaf, "is_fully_addressable",
                                            True):
        # multi-process: enumerate ALL extents from the sharding (covers
        # non-addressable devices), pick each extent's canonical owner
        owner = {}
        for dev, index in sharding.devices_indices_map(shape).items():
            key = tuple(tuple(p) for p in idx_json(index))
            if key not in owner or dev.id < owner[key].id:
                owner[key] = dev
        if len(owner) <= 1:
            return np.asarray(leaf)   # replicated: every process has it
        local = {tuple(tuple(p) for p in idx_json(sh.index)): sh
                 for sh in shards}
        out = []
        for key, dev in sorted(owner.items()):
            mine = (dev.process_index == jax.process_index())
            out.append((list(list(p) for p in key),
                        np.asarray(local[key].data) if mine else None))
        return out
    seen = {}
    for sh in shards:
        key = tuple(tuple(p) for p in idx_json(sh.index))
        if key not in seen:
            seen[key] = np.asarray(sh.data)
    if len(seen) <= 1:
        return np.asarray(leaf)
    return [(list(list(p) for p in k), v) for k, v in sorted(seen.items())]


def _snapshot_state(state: Any):
    """[(tree path, payload)] — payload is an ndarray or a per-shard list."""
    return [(path, _shard_snapshot(leaf))
            for path, leaf in _flatten_with_paths(state)]


def save_checkpoint(ckpt_dir, state: Any, global_step: int,
                    valid_loss: float = 0.0,
                    extra_meta: Optional[dict] = None,
                    model_config=None,
                    _fault_after_files: Optional[int] = None,
                    _snapshot=None) -> Path:
    """Write a checkpoint atomically (stage into ``.tmp``, then rename).

    Mesh-sharded leaves write PER-SHARD files (``leaf_i.s03.npy`` + shard
    extents in the manifest) — the full array is never materialized on the
    host; a 100M-row sharded table costs one local-shard copy per device.
    The reference's counterpart is a single-device ``torch.save(state_dict)``
    (``main.py:267-269``) which never faced this.

    ``model_config`` (a ModelConfig or dict) is recorded in meta and checked
    by ``load_checkpoint``. ``_fault_after_files`` is a test-only hook that
    simulates a crash after N leaf files."""
    out = Path(ckpt_dir) / f"global_step{global_step}.valid_loss={valid_loss:.4f}"
    tmp = out.with_name(out.name + ".tmp")
    multiproc = jax.process_count() > 1
    proc0 = jax.process_index() == 0
    if multiproc:
        # shared-filesystem contract (orbax-style): every process writes its
        # OWNED shard files into the same staging dir; process 0 alone
        # writes manifest/meta and renames. Barriers keep the phases apart.
        from jax.experimental import multihost_utils as MH
        if proc0:
            if tmp.exists():
                shutil.rmtree(tmp)
            tmp.mkdir(parents=True)
        MH.sync_global_devices("ckpt_staging_ready")
    else:
        if tmp.exists():
            shutil.rmtree(tmp)
        tmp.mkdir(parents=True)

    snapshot = _snapshot if _snapshot is not None else _snapshot_state(state)
    entries = []
    n_files = 0
    for i, (path, payload) in enumerate(snapshot):
        if isinstance(payload, list):                     # sharded leaf
            dims = len(payload[0][0])
            shape = [max(idx[d][1] for idx, _ in payload)
                     for d in range(dims)]
            dtypes = [a.dtype for _, a in payload if a is not None]
            shard_entries = []
            for k, (idx, arr) in enumerate(payload):
                # extent-coded names: processes write disjoint extents into
                # the same dir without coordination (multi-process); the
                # single-process snapshot owns every extent
                fname = (f"leaf_{i:05d}."
                         + "_".join(f"{a}-{b}" for a, b in idx) + ".npy")
                if arr is not None:
                    if _fault_after_files is not None \
                            and n_files >= _fault_after_files:
                        raise RuntimeError(
                            "injected checkpoint fault (test hook)")
                    np.save(tmp / fname, arr)
                    n_files += 1
                shard_entries.append({"file": fname, "index": idx})
            # process 0 always owns the extent holding device 0, so its
            # dtype list is never empty; other processes' entries (possibly
            # with no owned extent) are discarded before the manifest write
            entries.append({"path": path, "shape": shape,
                            "dtype": str(dtypes[0]) if dtypes else "?",
                            "shards": shard_entries})
            continue
        arr = np.asarray(payload)
        fname = f"leaf_{i:05d}.npy"
        if not multiproc or proc0:
            if _fault_after_files is not None \
                    and n_files >= _fault_after_files:
                raise RuntimeError("injected checkpoint fault (test hook)")
            np.save(tmp / fname, arr)
            n_files += 1
        entries.append({"path": path, "file": fname,
                        "shape": list(arr.shape), "dtype": str(arr.dtype)})
    if multiproc:
        from jax.experimental import multihost_utils as MH
        # every process must know each sharded leaf's dtype for its own
        # manifest view; only process 0's manifest is written. Fill any
        # entry whose extents were all remote from the replicated meta.
        MH.sync_global_devices("ckpt_shards_written")
        if not proc0:
            MH.sync_global_devices("ckpt_finalized")
            return out
    (tmp / MANIFEST_FILE).write_text(json.dumps({"leaves": entries}))
    meta = {"global_step": global_step, "valid_loss": valid_loss}
    cfgd = _config_dict(model_config)
    if cfgd is not None:
        meta["model_config"] = cfgd
    meta.update(extra_meta or {})
    (tmp / META_FILE).write_text(json.dumps(meta))
    if out.exists():
        shutil.rmtree(out)
    tmp.rename(out)
    if multiproc:
        from jax.experimental import multihost_utils as MH
        MH.sync_global_devices("ckpt_finalized")
    return out


class AsyncSaveHandle:
    """Handle for an in-flight background save; ``result()`` joins it."""

    def __init__(self, thread: threading.Thread):
        self._thread = thread
        self.path: Optional[Path] = None
        self.error: Optional[BaseException] = None

    def result(self, timeout: Optional[float] = None) -> Path:
        self._thread.join(timeout)
        if self._thread.is_alive():
            raise TimeoutError("checkpoint save still running")
        if self.error is not None:
            raise self.error
        return self.path


def save_checkpoint_async(ckpt_dir, state: Any, global_step: int,
                          valid_loss: float = 0.0,
                          extra_meta: Optional[dict] = None,
                          model_config=None) -> AsyncSaveHandle:
    """Fetch leaves to host NOW (the train loop will donate the device
    buffers; sharded leaves fetch per-shard — no cross-device gather), write
    files on a background thread. The training step overlaps with disk I/O
    instead of blocking on it."""
    if jax.process_count() > 1:
        raise NotImplementedError(
            "save_checkpoint_async is single-process only: the multi-process "
            "save synchronizes with cross-process barriers, which would "
            "interleave with the main thread's collectives from a background "
            "thread — use save_checkpoint (sync) in multi-process runs")
    snapshot = _snapshot_state(state)

    handle: AsyncSaveHandle

    def run():
        try:
            handle.path = save_checkpoint(ckpt_dir, None, global_step,
                                          valid_loss, extra_meta,
                                          model_config, _snapshot=snapshot)
        except BaseException as e:  # surfaced via result()
            handle.error = e

    t = threading.Thread(target=run, daemon=True)
    handle = AsyncSaveHandle(t)
    t.start()
    return handle


def latest_checkpoint(ckpt_dir) -> Optional[Path]:
    """Pick the newest COMPLETE checkpoint by global_step parsed from the dir
    name (the reference parses ``epoch=``/picks first ``*.pt``)."""
    ckpt_dir = Path(ckpt_dir)
    if not ckpt_dir.exists():
        return None
    best, best_step = None, -1
    for d in ckpt_dir.iterdir():
        if d.name.endswith(".tmp"):
            # in-flight staging dir from a crashed save — never pick it up
            continue
        m = re.match(r"global_step(\d+)", d.name)
        complete = (d / MANIFEST_FILE).exists() or (d / CKPT_FILE).exists()
        if m and complete:
            step = int(m.group(1))
            if step > best_step:
                best, best_step = d, step
    return best


# config keys that change only STORAGE layout, not the trained function —
# checkpoints convert across them (see _convert_layout)
_LAYOUT_KEYS = ("pack_big_tables",)


def _check_config(meta: dict, model_config) -> None:
    want = _config_dict(model_config)
    have = meta.get("model_config")
    if want is None or have is None:
        return
    skew = {k: (have.get(k), want.get(k))
            for k in set(have) | set(want)
            if have.get(k) != want.get(k) and k not in _LAYOUT_KEYS}
    if skew:
        detail = ", ".join(f"{k}: ckpt={a!r} vs model={b!r}"
                           for k, (a, b) in sorted(skew.items()))
        raise ValueError(
            f"checkpoint was trained with a different model config — {detail}"
            " (the reference's train/infer skew landmine, caught loudly)")


def _convert_layout(arr: np.ndarray, tshape,
                    path: str = "?") -> Optional[np.ndarray]:
    """Host-side conversion between a big table's two STORAGE layouts:
    logical [V, D] (mesh/unpacked runs) <-> packed [V/R, 8, 128] with <=31
    zero pad rows (single-chip runs; ops/sparse_table.packed_table_shape).
    Returns None when the shapes aren't that pair — the caller then raises
    its architecture-skew error. Covers the per-row 1-D optimizer state
    too (pad-row count difference only)."""
    tshape = tuple(tshape)
    if len(tshape) == 3 and tshape[1:] == (8, 128) and arr.ndim == 2:
        V, D = arr.shape                       # unpacked ckpt -> packed
        if D <= 128 and 128 % D == 0:
            R = 8 * (128 // D)
            rows = tshape[0] * R
            if 0 <= rows - V < 32:
                out = np.zeros((rows, D), arr.dtype)
                out[:V] = arr
                return out.reshape(tshape)
    if arr.ndim == 3 and arr.shape[1:] == (8, 128) and len(tshape) == 2:
        V, D = tshape                          # packed ckpt -> unpacked
        if D <= 128 and 128 % D == 0:
            R = 8 * (128 // D)
            rows = arr.shape[0] * R
            if 0 <= rows - V < 32:
                return np.ascontiguousarray(arr.reshape(rows, D)[:V])
    if arr.ndim == 1 and len(tshape) == 1 and \
            0 < abs(arr.shape[0] - tshape[0]) < 32:
        # rowwise accumulator across the pad-row boundary (configs already
        # matched — only the physical row padding differs). Pads come from
        # BOTH packing (32-multiples) and mesh row-sharding (shard-count
        # multiples, e.g. 5001 -> 5008 on 8 shards — a mesh-trained
        # rowwise-Adagrad state must restore single-device), so the bound
        # mirrors the 2-D rule; _repad_rows refuses to cut non-zero rows.
        return _repad_rows(arr, tshape, path)
    if arr.ndim == 2 and len(tshape) == 2 and arr.shape[1] == tshape[1] \
            and 0 < abs(arr.shape[0] - tshape[0]) < 32:
        # [V, D] table across the mesh shard-pad boundary: sharded saves
        # keep the padded physical rows (unpadding would all-gather the
        # table — see save_checkpoint); pad rows are zeros and never
        # addressed. Bound 32 >= max table shards (16) keeps gross vocab
        # skew loud; _repad_rows refuses to cut NON-ZERO rows, so genuine
        # small vocab skew (itemnum grew/shrank by a few between save and
        # load — not caught by _check_config since vocab comes from the
        # data) cannot silently discard trained rows.
        return _repad_rows(arr, tshape, path)
    return None


def _repad_rows(arr: np.ndarray, tshape, path: str) -> Optional[np.ndarray]:
    """Cut or zero-extend ``arr``'s leading dim to ``tshape`` across a
    shard-pad boundary. Cutting requires the dropped rows to be ALL ZERO
    (shard pad rows are zeros by construction and never addressed) —
    dropping a trained row means real vocab skew, which must fail loudly,
    not be absorbed. Zero-extending is always storage-safe but still warns:
    if the target's extra rows are genuinely new vocab ids (not shard pads)
    they restore as zeros rather than fresh init."""
    n = min(arr.shape[0], tshape[0])
    if arr.shape[0] > n and np.any(arr[n:]):
        raise ValueError(
            f"checkpoint leaf {path!r} has {arr.shape[0]} rows but the model "
            f"expects {tshape[0]}, and the surplus rows are NOT all zero — "
            "this is trained data, not shard padding (vocab/itemnum skew "
            "between save and load?); refusing to truncate")
    if tshape[0] > arr.shape[0]:
        import logging
        logging.getLogger(__name__).warning(
            "checkpoint leaf %r: zero-extending %d -> %d rows (shard-pad "
            "re-pad; if the model's vocab actually grew, the new rows "
            "restore as zeros, not fresh init)", path, arr.shape[0],
            tshape[0])
    out = np.zeros(tshape, arr.dtype)
    out[:n] = arr[:n]
    return out


def _load_entry(path: Path, e: dict, target_sharding=None):
    """Load one manifest entry. Sharded entries ("shards") either place each
    shard file straight onto its device (when ``target_sharding``'s shard
    grid matches the saved one — no full host array ever exists) or assemble
    on host for resharding into any other layout."""
    if "shards" not in e:
        return np.load(path / e["file"])
    shape = tuple(e["shape"])
    if target_sharding is not None:
        try:
            idx_map = target_sharding.addressable_devices_indices_map(shape)
            saved = {tuple((int(a), int(b)) for a, b in s["index"]):
                     s["file"] for s in e["shards"]}

            def key_of(index):
                return tuple(
                    (int(sl.start or 0),
                     int(sl.stop if sl.stop is not None else d))
                    for sl, d in zip(index, shape))

            if all(key_of(ix) in saved for ix in idx_map.values()):
                parts = [jax.device_put(np.load(path / saved[key_of(ix)]),
                                        dev)
                         for dev, ix in idx_map.items()]
                return jax.make_array_from_single_device_arrays(
                    shape, target_sharding, parts)
        except Exception:
            pass  # fall through to host assembly
    out = np.zeros(shape, np.dtype(e["dtype"]))
    for s in e["shards"]:
        sl = tuple(slice(a, b) for a, b in s["index"])
        out[sl] = np.load(path / s["file"])
    return out


def load_checkpoint(path, target: Any, model_config=None,
                    shardings=None) -> Tuple[Any, dict]:
    """Restore ``target``-shaped state from a checkpoint directory.

    New layout: leaves match by TREE PATH (manifest) with shape+dtype checks;
    ``model_config`` (if given) is verified against the saved meta first.
    Big tables convert between their packed and unpacked storage layouts
    (train on a mesh, serve single-chip, or vice versa — _convert_layout).
    Mesh-sharded saves restore into any layout (host reassembly), or shard-
    direct to devices when ``shardings`` (a {tree path: jax Sharding} dict)
    matches the saved shard grid.
    Legacy layout (single msgpack blob): positional restore with shape guard.
    """
    path = Path(path)
    meta = {}
    if path.is_dir() and (path / META_FILE).exists():
        meta = json.loads((path / META_FILE).read_text())
    _check_config(meta, model_config)

    flat = _flatten_with_paths(target)
    treedef = jax.tree.structure(target)

    if path.is_dir() and (path / MANIFEST_FILE).exists():
        manifest = json.loads((path / MANIFEST_FILE).read_text())
        saved = manifest["leaves"]
        saved_paths = [e["path"] for e in saved]
        target_paths = [p for p, _ in flat]
        if saved_paths != target_paths:
            missing = [p for p in target_paths if p not in saved_paths]
            extra = [p for p in saved_paths if p not in target_paths]
            raise ValueError(
                "checkpoint pytree structure mismatch — "
                f"missing in ckpt: {missing[:5]}, unexpected: {extra[:5]} "
                "(model/optimizer definition changed between save and load)")
        leaves = []
        for e, (p, t) in zip(saved, flat):
            arr = _load_entry(path, e,
                              (shardings or {}).get(p))
            if tuple(arr.shape) != tuple(np.shape(t)):
                conv = _convert_layout(arr, np.shape(t), p)
                if conv is None:
                    raise ValueError(
                        f"checkpoint leaf {p!r} shape {arr.shape} != model "
                        f"shape {np.shape(t)} — architecture config skew "
                        "(check hidden_units/num_blocks/num_heads/maxlen)")
                arr = conv
            leaves.append(arr.astype(np.dtype(
                t.dtype if hasattr(t, "dtype") else arr.dtype)))
        return jax.tree.unflatten(treedef, leaves), meta

    # ---- legacy single-blob layout ----
    from flax import serialization

    blob = (path / CKPT_FILE).read_bytes() if path.is_dir() \
        else path.read_bytes()
    target_leaves = [t for _, t in flat]
    loaded = serialization.from_bytes(
        [np.asarray(x) for x in target_leaves], blob)
    leaves = []
    for i, (l, t) in enumerate(zip(loaded, target_leaves)):
        l = np.asarray(l)
        if l.shape != np.shape(t):
            raise ValueError(
                f"checkpoint leaf {i} shape {l.shape} != model shape "
                f"{np.shape(t)} — the checkpoint was trained with a "
                f"different architecture config (check hidden_units/"
                f"num_blocks/num_heads/maxlen)")
        leaves.append(l.astype(t.dtype))
    return jax.tree.unflatten(treedef, leaves), meta
