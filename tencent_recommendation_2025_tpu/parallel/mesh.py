"""Device mesh + axis conventions (F1/F6 of SURVEY.md §2.2).

The reference is single-process single-GPU (SURVEY.md §1 L4); the distributed
backend here is the XLA runtime itself: one global ``jax.sharding.Mesh`` over
the pod slice with axes

- ``pipe``  — pipeline parallelism (encoder blocks staged; ring GPipe)
- ``data``  — data parallelism (batch axis; gradient psum over ICI/DCN)
- ``model`` — tensor parallelism (tower/attention projections column/row split)
- ``seq``   — sequence/context parallelism (ring attention over L)

Embedding tables row-shard over the flattened (pipe, data, model) axes —
every chip holds a distinct table shard (the EP analog,
parallel/sharded_embedding.py). A size-1 ``pipe`` axis (the default) makes
every ``pipe``-aware PartitionSpec collapse to the round-1 layout.
No hand-written transport: collectives are compiled by XLA from sharding
annotations; multi-host init is one ``jax.distributed.initialize`` call.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import MeshConfig

AXES = ("pipe", "data", "model", "seq")


def initialize_distributed(coordinator: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Multi-host runtime bring-up. No-op for single-process runs."""
    if num_processes and num_processes > 1:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)


def build_mesh(cfg: MeshConfig = MeshConfig(),
               devices: Optional[Sequence] = None) -> Mesh:
    """Build the (pipe, data, model, seq) mesh. If the config doesn't cover
    all devices, the remainder folds into the data axis."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    dp, dm, dt, ds = cfg.pipe, cfg.data, cfg.model, cfg.seq
    if dp > 1:
        assert dt == 1 and ds == 1, \
            "pipe>1 composes with data parallelism only (model=seq=1)"
    want = dp * dm * dt * ds
    if want != n:
        assert n % (dp * dt * ds) == 0, \
            f"{n} devices not divisible by pipe*model*seq={dp * dt * ds}"
        dm = n // (dp * dt * ds)
    arr = np.asarray(devices).reshape(dp, dm, dt, ds)
    return Mesh(arr, AXES)


def single_device_mesh() -> Mesh:
    return Mesh(np.asarray(jax.devices()[:1]).reshape(1, 1, 1, 1), AXES)


def named(mesh: Mesh, *spec) -> NamedSharding:
    return NamedSharding(mesh, P(*spec))


def host_batch_slice(global_batch: int) -> int:
    """Per-host batch size under multi-host DP."""
    return global_batch // jax.process_count()
