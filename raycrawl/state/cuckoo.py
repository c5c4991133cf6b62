"""Cuckoo filter for the URL-seen set (north_rule's approximate fast path).

A bucketed cuckoo filter (Fan et al., "Cuckoo Filter: Practically Better
Than Bloom", CoNEXT'14 — public literature; see PAPERS.md): 4-slot buckets
of 16-bit fingerprints, partial-key cuckoo hashing so an item's alternate
bucket is computable from (bucket, fingerprint) alone. ~2.1 bytes/key at
95% load, supports deletion (unused here) and O(1) membership with a
~0.0029 false-positive rate at 4x16-bit — the scale story for a 1e10-URL
frontier: 1e10 keys ≈ 21 GiB across shards, vs ~1 TiB for exact strings.

False positives make the seen-gate DROP a genuinely-new URL; that is the
documented accuracy/scale trade (SURVEY §7 risks). Conformance tests run
the exact store; the bench can run either. Deterministic given the seed:
eviction choices come from a seeded Random, so checkpoint/restore and
re-runs reproduce bit-identical filters.

Storage is a numpy uint16 array -> zero-copy tobytes()/frombuffer for
checkpointing.
"""

from __future__ import annotations

import hashlib
import random

import numpy as np

__all__ = ["CuckooFilter", "url_hash64"]

_EMPTY = 0
_MAX_KICKS = 500


def url_hash64(url: str) -> int:
    """Stable 64-bit hash of a URL string (blake2b; PYTHONHASHSEED-proof)."""
    return int.from_bytes(hashlib.blake2b(url.encode(), digest_size=8).digest(), "little")


class CuckooFilter:
    """4-way bucketed cuckoo filter over 64-bit key hashes."""

    SLOTS = 4

    def __init__(self, capacity: int, seed: int = 0):
        # buckets = next power of two holding capacity at ~95% load
        n_buckets = 1
        while n_buckets * self.SLOTS * 0.95 < capacity:
            n_buckets <<= 1
        self.n_buckets = n_buckets
        self.mask = n_buckets - 1
        self.table = np.zeros((n_buckets, self.SLOTS), dtype=np.uint16)
        self.size = 0
        self.seed = seed
        self._rng = random.Random(seed)
        # (bucket, fp) stash for fingerprints left homeless when an insert
        # exhausts its kicks: the in-hand fp at give-up time belongs to SOME
        # earlier key whose membership must never be lost (no false
        # negatives). The stored bucket is one of the fp's two valid homes,
        # so lookups check both candidate (bucket, fp) pairs.
        self.overflow: set = set()

    # -- partial-key hashing ------------------------------------------------
    def _fp(self, h: int) -> int:
        fp = (h >> 48) & 0xFFFF
        return fp or 1  # 0 is the empty marker

    def _i1(self, h: int) -> int:
        return h & self.mask

    def _alt(self, i: int, fp: int) -> int:
        # alternate bucket from fingerprint only (partial-key cuckoo):
        # i ^ H(fp); a small odd multiplier hash suffices for uint16 fps
        return (i ^ ((fp * 0x5BD1E995) & self.mask)) & self.mask

    # -- core ops -----------------------------------------------------------
    def contains_hash(self, h: int) -> bool:
        fp = self._fp(h)
        i1 = self._i1(h)
        row = self.table[i1]
        if fp in row:
            return True
        i2 = self._alt(i1, fp)
        if fp in self.table[i2]:
            return True
        return (i1, fp) in self.overflow or (i2, fp) in self.overflow

    def add_hash(self, h: int) -> None:
        """Insert (idempotence not guaranteed — callers gate on contains)."""
        fp = self._fp(h)
        i1 = self._i1(h)
        i2 = self._alt(i1, fp)
        for i in (i1, i2):
            row = self.table[i]
            empt = np.flatnonzero(row == _EMPTY)
            if empt.size:
                row[empt[0]] = fp
                self.size += 1
                return
        # evict: bounded random-walk relocation
        i = self._rng.choice((i1, i2))
        for _ in range(_MAX_KICKS):
            slot = self._rng.randrange(self.SLOTS)
            fp, self.table[i][slot] = int(self.table[i][slot]), fp
            i = self._alt(i, fp)
            row = self.table[i]
            empt = np.flatnonzero(row == _EMPTY)
            if empt.size:
                row[empt[0]] = fp
                self.size += 1
                return
        # table effectively full — stash the in-hand fingerprint at its
        # current target bucket (one of its two valid homes)
        self.overflow.add((i, fp))
        self.size += 1

    def check_and_add_hashes(self, hashes) -> np.ndarray:
        """Batch first-wins membership gate: returns bool mask of NEW keys
        (True = unseen until this call; the key is added)."""
        out = np.zeros(len(hashes), dtype=bool)
        for k, h in enumerate(hashes):
            if not self.contains_hash(h):
                self.add_hash(h)
                out[k] = True
        return out

    # -- checkpoint ---------------------------------------------------------
    def to_state(self) -> dict:
        return {
            "n_buckets": self.n_buckets,
            "seed": self.seed,
            "size": self.size,
            "table": self.table.tobytes(),
            "overflow": sorted(tuple(p) for p in self.overflow),
            "rng_state": self._rng.getstate(),
        }

    @classmethod
    def from_state(cls, state: dict) -> "CuckooFilter":
        f = cls.__new__(cls)
        f.n_buckets = state["n_buckets"]
        f.mask = f.n_buckets - 1
        f.seed = state["seed"]
        f.size = state["size"]
        f.table = np.frombuffer(state["table"], dtype=np.uint16).reshape(
            f.n_buckets, cls.SLOTS
        ).copy()
        f.overflow = {tuple(p) for p in state["overflow"]}
        f._rng = random.Random()
        f._rng.setstate(tuple(state["rng_state"]) if not isinstance(state["rng_state"], tuple) else state["rng_state"])
        return f
