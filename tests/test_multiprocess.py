"""Multi-PROCESS seam (SURVEY §2.2 F6): two real OS processes, 4 fake CPU
devices each, one global 8-device mesh over Gloo collectives.

Everything else in the suite exercises SPMD on a single-process fake mesh;
this is the only place process-spanning init (jax.distributed.initialize),
cross-process device_put, the sharded train step, and the per-shard
checkpoint path with NON-addressable shards actually execute. The loss is
pinned against the single-process 8-device run of the same script
(examples/multihost_train.py --fake), recorded 2026-08-20: 1.9728 (the
synthetic fixture now draws per-position features FROM the feature tables —
the id->features invariant the tower-dedup path relies on — which shifted
the rng stream and hence the pinned value; was 1.8949 on the old fixture).
"""

import socket
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]
SCRIPT = REPO / "examples" / "multihost_train.py"


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_train_and_checkpoint(tmp_path):
    port = _free_port()
    procs = []
    for pid in (0, 1):
        procs.append(subprocess.Popen(
            [sys.executable, str(SCRIPT), "--fake", "--local_devices", "4",
             "--coordinator", f"localhost:{port}", "--num_processes", "2",
             "--process_id", str(pid), "--steps", "3",
             "--ckpt_dir", str(tmp_path / "ck")],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            cwd=str(REPO)))
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
        assert p.returncode == 0, f"process failed:\n{out[-3000:]}"

    losses, ok_lines = [], 0
    for out in outs:
        for line in out.splitlines():
            if "steps in" in line and "loss=" in line:
                losses.append(float(line.rsplit("loss=", 1)[1]))
            if "restored" in line:
                assert "OK" in line, line
                ok_lines += 1
    assert len(losses) == 2 and abs(losses[0] - losses[1]) < 1e-6
    # pinned vs the single-process 8-device run (same seeds, same math)
    assert abs(losses[0] - 1.9728) < 5e-3, losses
    assert ok_lines == 2

    # the checkpoint dir holds ONE complete checkpoint (proc 0 finalized it)
    from tencent_recommendation_2025_tpu.train import checkpoint as CK
    ck = CK.latest_checkpoint(tmp_path / "ck")
    assert ck is not None and (ck / "manifest.json").exists()
