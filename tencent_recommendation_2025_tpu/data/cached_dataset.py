"""Packed sample cache: build each user's sample once, vector-sample negatives.

Everything the train sampler produces is deterministic per user EXCEPT the
negative ids (SURVEY.md §3.3): sequence interleaving, left-padding, feature
packing and positives never change across epochs. The reference re-runs the
whole python ``__getitem__`` every epoch (``dataset.py:96-169``) — the
documented host-side bottleneck. Here:

- a :class:`PackedCache` runs the TrainSampler once per user (threaded) and
  stores the fixed fields as big contiguous arrays ([U, L, ...]);
- each epoch, batches are plain array slices plus **vectorized rejection
  sampling** for negatives: draw uniforms for every prediction position at
  once, reject collisions with the user's seen-item set (hashed membership
  test) and featureless ids, redraw only the rejected lanes (a handful of
  rounds suffice; leftovers fall back to a guaranteed-valid draw).

The negative distribution matches the reference's loop exactly: uniform over
valid ids conditioned on rejection.
"""

from __future__ import annotations

import dataclasses
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, Optional

import numpy as np

from .dataset import TrainSampler

Batch = Dict[str, np.ndarray]

_FIXED_FIELDS = ("seq", "pos", "token_type", "next_token_type",
                 "next_action_type", "seq_item_sparse", "seq_item_array",
                 "seq_user_sparse", "seq_user_array", "pos_item_sparse",
                 "pos_item_array")


class PackedCache:
    """All users' fixed sample fields packed into contiguous arrays."""

    def __init__(self, sampler: TrainSampler, num_workers: int = 16,
                 seen_hash_size: int = 1 << 13):
        self.sampler = sampler
        n = len(sampler)
        rng = np.random.default_rng(0)  # fixed fields ignore the rng

        def build(uid):
            return sampler.sample(uid, np.random.default_rng((0, uid)),
                                  return_seen=True)

        with ThreadPoolExecutor(max_workers=num_workers) as pool:
            pairs = list(pool.map(build, range(n)))
        samples = [p[0] for p in pairs]

        self.fields: Dict[str, np.ndarray] = {}
        for name in _FIXED_FIELDS:
            self.fields[name] = np.stack([getattr(s, name) for s in samples])

        # membership structure for vectorized rejection. "seen" is the
        # FULL-history item set (reference ts, dataset.py:137-141), not the
        # maxlen window — a user with a long history must not get pre-window
        # items as negatives (the native loader's CSR uses full history too)
        self.hash_size = seen_hash_size
        self.seen_hash = np.zeros((n, seen_hash_size), dtype=bool)
        for u, (_, seen) in enumerate(pairs):
            items = np.fromiter((i for i in seen if i > 0), np.int64,
                                count=-1)
            if len(items):
                self.seen_hash[u, items % seen_hash_size] = True
        # exact seen sets for the (rare) hash-hit verification
        self.seen_sets = [frozenset(seen) - {0} for _, seen in pairs]

        self.neg_ok = sampler._neg_ok.copy()
        self.valid_ids = np.nonzero(self.neg_ok)[0]
        self.itemnum = sampler.itemnum

    def __len__(self) -> int:
        return len(self.seen_sets)

    def sample_negatives(self, uids: np.ndarray, rng: np.random.Generator,
                         rounds: int = 8) -> np.ndarray:
        """[B, L] negatives for the given users (0 where no prediction)."""
        pos = self.fields["pos"][uids]                    # [B, L]
        need = pos > 0
        B, L = pos.shape
        neg = np.zeros((B, L), np.int32)
        pending = need.copy()
        for _ in range(rounds):
            if not pending.any():
                break
            draw = rng.integers(1, self.itemnum + 1, (B, L))
            ok_feat = self.neg_ok[draw]
            maybe_seen = self.seen_hash[uids[:, None], draw % self.hash_size]
            accept = pending & ok_feat & ~maybe_seen
            # hash hits can be false positives (bucket collision with a seen
            # item) — verify the rare cases against the exact set so valid ids
            # sharing a bucket with a seen item are not shadowed and the final
            # distribution stays uniform over all valid ids
            hit = pending & ok_feat & maybe_seen
            for b, l in zip(*np.nonzero(hit)):
                if int(draw[b, l]) not in self.seen_sets[uids[b]]:
                    accept[b, l] = True
            neg = np.where(accept, draw, neg)
            pending &= ~accept
        # leftovers (hash false-positives / unlucky draws): exact per-position
        for b, l in zip(*np.nonzero(pending)):
            seen = self.seen_sets[uids[b]]
            t = int(rng.integers(1, self.itemnum + 1))
            while t in seen or not self.neg_ok[t]:
                t = int(rng.integers(1, self.itemnum + 1))
            neg[b, l] = t
        return neg

    def batch(self, uids: np.ndarray, batch_size: int,
              rng: np.random.Generator) -> Batch:
        out: Batch = {}
        n = len(uids)
        for name, arr in self.fields.items():
            take = arr[uids]
            if n < batch_size:
                pad = np.zeros((batch_size - n, *take.shape[1:]), take.dtype)
                take = np.concatenate([take, pad])
            out[name] = take
        neg = self.sample_negatives(uids, rng)
        if n < batch_size:
            neg = np.concatenate(
                [neg, np.zeros((batch_size - n, neg.shape[1]), np.int32)])
        out["neg"] = neg
        out["sample_valid"] = (np.arange(batch_size) < n).astype(np.int32)
        return out


class CachedTrainLoader:
    """Drop-in replacement for pipeline.TrainLoader backed by a PackedCache."""

    def __init__(self, cache: PackedCache, indices: np.ndarray,
                 batch_size: int, seed: int = 0, shuffle: bool = True,
                 host_id: int = 0, num_hosts: int = 1):
        self.cache = cache
        self.indices = np.asarray(indices)[host_id::num_hosts]
        self.batch_size = batch_size
        self.seed = seed
        self.shuffle = shuffle

    def __len__(self) -> int:
        return -(-len(self.indices) // self.batch_size)

    def epoch(self, epoch_idx: int) -> Iterator[Batch]:
        order = self.indices.copy()
        rng = np.random.default_rng((self.seed, epoch_idx))
        if self.shuffle:
            rng.shuffle(order)
        for b in range(len(self)):
            uids = order[b * self.batch_size:(b + 1) * self.batch_size]
            yield self.cache.batch(uids, self.batch_size, rng)
