"""Failure detection / elastic recovery (SURVEY.md §5).

The reference's only recovery story is manual ``--state_dict_path`` resume
(``main.py:120-128``). Here a supervisor wraps the training loop: on any
crash it restarts from the latest complete checkpoint, bounded by
``max_restarts``. Checkpoints are written atomically (tmp dir + rename) by
train/checkpoint.py's directory layout, so a kill mid-write never corrupts
the restart point. Fault injection for tests: ``inject_fault_at_step`` raises
inside the loop to simulate a host failure.
"""

from __future__ import annotations

import inspect
import time
import traceback
from pathlib import Path
from typing import Callable, Optional

from . import checkpoint as CK


class FaultInjected(RuntimeError):
    pass


def run_supervised(train_fn: Callable[[Optional[object], int], object],
                   ckpt_dir, state_template,
                   max_restarts: int = 3,
                   backoff_s: float = 0.0,
                   verbose: bool = True):
    """Run ``train_fn(resume_state_or_None, attempt)`` with restart-on-crash.

    ``train_fn`` must checkpoint into ``ckpt_dir`` as it goes and return the
    final state. On failure the supervisor reloads the newest checkpoint into
    ``state_template``'s structure and calls ``train_fn`` again.

    If ``train_fn`` accepts a third parameter it also receives the restored
    checkpoint's ``meta`` dict (``None`` on the first attempt / cold restart)
    — pass ``meta["epoch"]`` into ``train_loop(start_epoch=...)`` so each
    restart trains only the REMAINING epochs instead of re-running the full
    budget (the reference's ``epoch_start_idx`` semantics,
    ``model/BaseLine/main.py:118-127``), and ``meta.get("epoch_step", 0)``
    into ``skip_steps=`` so a SIGTERM-preemption checkpoint resumes
    mid-epoch bit-exactly.
    """
    wants_meta = len(inspect.signature(train_fn).parameters) >= 3
    attempt = 0
    resume, meta = None, None
    while True:
        try:
            if wants_meta:
                return train_fn(resume, attempt, meta)
            return train_fn(resume, attempt)
        except Exception as e:  # noqa: BLE001 — supervisor catches everything
            attempt += 1
            if attempt > max_restarts:
                raise
            if verbose:
                print(f"supervisor: attempt {attempt} failed with "
                      f"{type(e).__name__}: {e}; restarting from latest "
                      f"checkpoint")
                traceback.print_exc(limit=1)
            latest = CK.latest_checkpoint(ckpt_dir)
            if latest is not None:
                resume, meta = CK.load_checkpoint(latest, state_template)
                if verbose:
                    print(f"supervisor: restored {latest.name} "
                          f"(step {meta.get('global_step')}, "
                          f"epoch {meta.get('epoch')})")
            else:
                resume, meta = None, None
            if backoff_s:
                time.sleep(backoff_s)
