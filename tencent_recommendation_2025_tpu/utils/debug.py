"""Debug toolchain (SURVEY.md §5 race-detection/sanitizer analog).

The reference has no sanitizers; on TPU the equivalents are:
- ``enable_nan_checks()`` — ``jax.config.jax_debug_nans`` (fail fast at the
  op that produced the NaN);
- ``enable_checks()`` — jax internal invariant checking;
- ``deterministic(seed)`` — the seed-replay discipline all our samplers and
  train steps already follow (threaded PRNG keys, no wall-clock anywhere in
  traced code), so any run replays bit-identically with the same seed;
- Pallas kernels verify in interpreter mode against dense oracles
  (tests/test_hstu_kernel.py) — the kernel-level assert story.
"""

from __future__ import annotations

import contextlib

import jax


def enable_nan_checks(on: bool = True) -> None:
    jax.config.update("jax_debug_nans", on)


def enable_checks(on: bool = True) -> None:
    jax.config.update("jax_enable_checks", on)


@contextlib.contextmanager
def debug_mode(nans: bool = True, checks: bool = False):
    """Scoped NaN/invariant checking for reproducing failures."""
    prev_nans = jax.config.jax_debug_nans
    prev_checks = jax.config.jax_enable_checks
    try:
        jax.config.update("jax_debug_nans", nans)
        jax.config.update("jax_enable_checks", checks)
        yield
    finally:
        jax.config.update("jax_debug_nans", prev_nans)
        jax.config.update("jax_enable_checks", prev_checks)


@contextlib.contextmanager
def profile_trace(log_dir: str):
    """Capture a jax.profiler trace (TensorBoard-viewable) around a scope."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
