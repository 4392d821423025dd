"""Native (C++) data-prep: seq.jsonl -> packed train arrays on disk.

``native/dataprep/dataprep_tool.cc`` is the threaded counterpart of the
Python :class:`~.cached_dataset.PackedCache` builder: it parses one user per
jsonl line in parallel and pwrites the fixed sample fields
(reference semantics, ``model/BaseLine/dataset.py:96-169``) as raw int32
arrays plus a CSR of each user's seen-item set. This moves the documented
host-side bottleneck (the reference re-runs python ``__getitem__`` per epoch;
even the cached builder costs minutes of python at millions of users) into
native code that scales with cores, and the on-disk layout makes the cache
reusable across runs.

The Python side writes the schema manifest, invokes the tool (building it
with make on first use, like retrieval/ann), and loads the result into a
PackedCache — so training code downstream is identical either way.
"""

from __future__ import annotations

import json
import shutil
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

from . import schema as S
from .cached_dataset import PackedCache
from .dataset import TrainSampler

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native" / "dataprep"


def tool_path(build: bool = True) -> Optional[Path]:
    """Return the dataprep binary path, building it with make if needed."""
    exe = _NATIVE_DIR / "dataprep_tool"
    if exe.exists():
        return exe
    if not build or shutil.which("make") is None:
        return None
    try:
        subprocess.run(["make", "-C", str(_NATIVE_DIR)], check=True,
                       capture_output=True)
    except (subprocess.CalledProcessError, OSError):
        return None
    return exe if exe.exists() else None


def write_schema_manifest(schema, path: Path) -> None:
    path.write_text(json.dumps({
        "user_sparse": list(S.USER_SPARSE_IDS),
        "item_sparse": list(S.ITEM_SPARSE_IDS),
        "user_array": list(S.USER_ARRAY_IDS),
        "item_array": list(S.ITEM_ARRAY_IDS),
        "array_cap": schema.array_cap,
    }))


def run_native_pack(seq_jsonl: Path, out_dir: Path, schema, maxlen: int,
                    threads: int = 16) -> Path:
    """Run the C++ tool; returns out_dir. Raises if the tool is unavailable."""
    exe = tool_path()
    if exe is None:
        raise RuntimeError("dataprep_tool unavailable (make failed?)")
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    manifest = out_dir / "schema.json"
    write_schema_manifest(schema, manifest)
    subprocess.run([str(exe), "--seq", str(seq_jsonl), "--schema",
                    str(manifest), "--out", str(out_dir), "--maxlen",
                    str(maxlen), "--threads", str(threads)], check=True,
                   capture_output=True)
    return out_dir


def load_native_cache(cache_dir: Path, sampler: TrainSampler) -> PackedCache:
    """Load a dataprep_tool output dir into a PackedCache (no python
    per-user sampling; negatives stay dynamic per epoch as usual)."""
    cache_dir = Path(cache_dir)
    meta = json.loads((cache_dir / "meta.json").read_text())
    U, L, cap = meta["num_users"], meta["L"], meta["array_cap"]
    nis, nia = meta["nis"], meta["nia"]
    nus, nua = meta["nus"], meta["nua"]
    assert L == sampler.maxlen + 1, \
        f"cache L={L} != sampler maxlen+1={sampler.maxlen + 1}"

    shapes = {
        "seq": (L,), "pos": (L,), "token_type": (L,),
        "next_token_type": (L,), "next_action_type": (L,),
        "seq_item_sparse": (L, nis), "seq_item_array": (L, nia, cap),
        "seq_user_sparse": (L, nus), "seq_user_array": (L, nua, cap),
        "pos_item_sparse": (L, nis), "pos_item_array": (L, nia, cap),
    }
    self = PackedCache.__new__(PackedCache)
    self.sampler = sampler
    self.fields = {}
    def mm(path):
        # memmap, not fromfile: batches slice out only their rows, so the
        # host never pages in the full field arrays (GBs at millions of
        # users; the OS cache keeps hot pages). mmap rejects empty files
        # (zero-width feature blocks / users with no history).
        if path.stat().st_size == 0:
            return np.zeros(0, np.int32)
        return np.memmap(path, dtype=np.int32, mode="r")

    for name, shape in shapes.items():
        self.fields[name] = mm(cache_dir / f"{name}.bin").reshape(
            (U, *shape))

    offs = np.fromfile(cache_dir / "seen_offsets.bin", dtype=np.int64)
    vals_mm = mm(cache_dir / "seen_values.bin")
    assert len(offs) == U + 1 and offs[-1] == len(vals_mm)
    # one-time sidecar: per-user-sorted seen values (binary-search
    # membership needs sorted segments; the lexsort is fully vectorized)
    sorted_path = cache_dir / "seen_values_sorted.bin"
    if not sorted_path.exists() or \
            sorted_path.stat().st_size != vals_mm.nbytes:
        vs = np.asarray(vals_mm)
        rows = np.repeat(np.arange(U), np.diff(offs))
        order = np.lexsort((vs, rows))
        tmp = sorted_path.with_suffix(".tmp")
        vs[order].tofile(tmp)
        tmp.rename(sorted_path)
    # user-token cap check (ALL rows): the device user tower computes on
    # MAX_USER_TOKENS_PER_ROW gathered positions (models/embedding) — a
    # data layout with more per row must fail loudly, incl. via this
    # python-free loader. One chunked sequential pass over the token_type
    # memmap (64K rows at a time keeps peak memory ~tens of MB at any U);
    # a sampled probe would let an over-cap row beyond the sample silently
    # drop its surplus user-token contributions in fuse_sequence.
    from ..config import MAX_USER_TOKENS_PER_ROW as _K

    tt = self.fields["token_type"]
    worst = 0
    for o in range(0, U, 65536):
        chunk = np.asarray(tt[o:o + 65536])
        if len(chunk):
            worst = max(worst, int((chunk == 2).sum(axis=1).max()))
    if worst > _K:
        raise ValueError(
            f"native cache rows carry {worst} user tokens > "
            f"MAX_USER_TOKENS_PER_ROW={_K}; raise the config cap")

    from .cached_dataset import SeenCSR

    self.seen_sets = SeenCSR(
        np.memmap(sorted_path, dtype=np.int32, mode="r"), offs)
    self.neg_ok = sampler._neg_ok.copy()
    self.valid_ids = np.nonzero(self.neg_ok)[0]
    self.itemnum = sampler.itemnum
    return self


def build_packed_cache_native(sampler: TrainSampler, cache_dir: Path,
                              threads: int = 16) -> PackedCache:
    """One-call native path: pack with the C++ tool, load as a PackedCache.

    An existing cache_dir with a consistent meta.json is REUSED (that's the
    point of the on-disk layout — cli.train keys the dir by maxlen);
    anything inconsistent is repacked."""
    cache_dir = Path(cache_dir)
    meta_path = cache_dir / "meta.json"
    if meta_path.exists():
        try:
            meta = json.loads(meta_path.read_text())
            if meta.get("L") == sampler.maxlen + 1 and \
                    meta.get("num_users") == len(sampler) and \
                    meta.get("array_cap") == sampler.schema.array_cap:
                return load_native_cache(cache_dir, sampler)
        except (ValueError, OSError, AssertionError):
            pass  # unreadable/partial cache: repack below
    run_native_pack(sampler.data.seq.jsonl_path, cache_dir, sampler.schema,
                    sampler.maxlen, threads=threads)
    return load_native_cache(cache_dir, sampler)
