"""Checkpoint / resume (SURVEY.md §5).

The reference saves a bare ``state_dict`` per epoch into
``TRAIN_CKPT_PATH/global_step{N}.valid_loss={v}/model.pt`` and does NOT save
optimizer state (``main.py:267-269``); inference loads the first ``*.pt``
under ``MODEL_OUTPUT_PATH`` (``infer.py:14-20``). We keep the directory-name
contract (so external tooling that parses ``global_step``/``valid_loss`` still
works) but save the **full** train state — params, optimizer state, step —
via flax.serialization msgpack, enabling true step-granular resume. Sharded
arrays are gathered host-side before writing (fine at these table sizes;
per-shard async arrives with the multi-host runtime work).
"""

from __future__ import annotations

import json
import re
from pathlib import Path
from typing import Any, Optional, Tuple

import jax
import numpy as np
from flax import serialization

CKPT_FILE = "state.msgpack"
META_FILE = "meta.json"


def _to_plain(state: Any):
    """Flatten any registered pytree (e.g. TrainState, optax NamedTuples) to a
    msgpack-serializable {leaves, treedef-independent} payload."""
    leaves = jax.tree.leaves(state)
    return [np.asarray(x) for x in leaves]


def save_checkpoint(ckpt_dir, state: Any, global_step: int,
                    valid_loss: float = 0.0, extra_meta: Optional[dict] = None
                    ) -> Path:
    """Atomic write: stage into ``<name>.tmp`` then rename, so a crash
    mid-write never leaves a checkpoint that ``latest_checkpoint`` would
    pick up (it requires the final dir name + state file)."""
    out = Path(ckpt_dir) / f"global_step{global_step}.valid_loss={valid_loss:.4f}"
    tmp = out.with_name(out.name + ".tmp")
    tmp.mkdir(parents=True, exist_ok=True)
    (tmp / CKPT_FILE).write_bytes(serialization.to_bytes(_to_plain(state)))
    meta = {"global_step": global_step, "valid_loss": valid_loss}
    meta.update(extra_meta or {})
    (tmp / META_FILE).write_text(json.dumps(meta))
    if out.exists():
        import shutil

        shutil.rmtree(out)
    tmp.rename(out)
    return out


def latest_checkpoint(ckpt_dir) -> Optional[Path]:
    """Pick the newest checkpoint by global_step parsed from the dir name
    (the reference parses ``epoch=``/picks first ``*.pt`` — we order by step)."""
    ckpt_dir = Path(ckpt_dir)
    if not ckpt_dir.exists():
        return None
    best, best_step = None, -1
    for d in ckpt_dir.iterdir():
        if d.name.endswith(".tmp"):
            # in-flight staging dir from a crashed save_checkpoint — a partial
            # state.msgpack may exist inside; never pick it up
            continue
        m = re.match(r"global_step(\d+)", d.name)
        if m and (d / CKPT_FILE).exists():
            step = int(m.group(1))
            if step > best_step:
                best, best_step = d, step
    return best


def load_checkpoint(path, target: Any) -> Tuple[Any, dict]:
    """Restore ``target``-shaped state from a checkpoint directory.

    ``target`` must be a pytree with the same structure as the saved state
    (e.g. a freshly initialized TrainState); leaves are restored by position.
    """
    path = Path(path)
    if path.is_dir():
        blob = (path / CKPT_FILE).read_bytes()
        meta = json.loads((path / META_FILE).read_text()) \
            if (path / META_FILE).exists() else {}
    else:
        blob = path.read_bytes()
        meta = {}
    target_leaves, treedef = jax.tree.flatten(target)
    loaded = serialization.from_bytes(_to_plain(target_leaves), blob)
    leaves = []
    for i, (l, t) in enumerate(zip(loaded, target_leaves)):
        l = np.asarray(l)
        if l.shape != np.shape(t):
            # the reference's known landmine: train/infer config skew makes
            # checkpoint shapes silently mismatch (SURVEY.md §2.1 quirks,
            # BaseLineO1 hidden 64 train vs 128 infer) — fail loudly instead
            raise ValueError(
                f"checkpoint leaf {i} shape {l.shape} != model shape "
                f"{np.shape(t)} — the checkpoint was trained with a "
                f"different architecture config (check hidden_units/"
                f"num_blocks/num_heads/maxlen)")
        leaves.append(l.astype(t.dtype))
    return jax.tree.unflatten(treedef, leaves), meta
