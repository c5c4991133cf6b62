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
        # per-bucket occupancy (slots fill left-to-right and are never
        # freed, so occupied slots form a prefix) — lets the batch insert
        # compute write positions without scanning rows
        self.occ = np.zeros(n_buckets, dtype=np.uint8)
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
        self._insert_fp(i1, i2, fp)

    def _insert_fp(self, i1: int, i2: int, fp: int) -> None:
        for i in (i1, i2):
            if self.occ[i] < self.SLOTS:
                self.table[i][self.occ[i]] = fp
                self.occ[i] += 1
                self.size += 1
                return
        # saturated table: beyond ~95% load the random walk almost never
        # frees a slot, and a doomed key pays the full kick budget before
        # stashing anyway (measured: 1M over-capacity inserts took 10 min
        # of pure kick-walking) — stash directly instead. Membership stays
        # exact via the overflow set; the fix for sustained operation here
        # is sizing the filter for the key count.
        if self.size >= int(0.95 * self.n_buckets * self.SLOTS):
            self.overflow.add((i1, fp))
            self.size += 1
            return
        # evict: bounded random-walk relocation
        i = self._rng.choice((i1, i2))
        for _ in range(_MAX_KICKS):
            slot = self._rng.randrange(self.SLOTS)
            fp, self.table[i][slot] = int(self.table[i][slot]), fp
            i = self._alt(i, fp)
            if self.occ[i] < self.SLOTS:
                self.table[i][self.occ[i]] = fp
                self.occ[i] += 1
                self.size += 1
                return
        # table effectively full — stash the in-hand fingerprint at its
        # current target bucket (one of its two valid homes)
        self.overflow.add((i, fp))
        self.size += 1

    def check_and_add_hashes(self, hashes) -> np.ndarray:
        """Batch first-wins membership gate: returns bool mask of NEW keys
        (True = unseen until this call; the key is added).

        Fully vectorized probe + common-case insert: one fancy-index
        gather per candidate bucket for membership, canonical-signature
        dedup for within-batch first-wins, and ranked bulk placement into
        free slots; only keys whose BOTH buckets are full fall back to the
        scalar eviction walk. Semantics match the scalar sequential gate:
        a key is "seen" iff some earlier key (this batch or before) left
        the same fingerprint in either of its two buckets — which is
        exactly signature equality, since the bucket pair is a function of
        (i1, fp)."""
        h = np.asarray(hashes, dtype=np.uint64)
        n = len(h)
        if n == 0:
            return np.zeros(0, dtype=bool)
        fp = ((h >> np.uint64(48)) & np.uint64(0xFFFF)).astype(np.int64)
        fp[fp == 0] = 1
        i1 = (h & np.uint64(self.mask)).astype(np.int64)
        i2 = i1 ^ ((fp * 0x5BD1E995) & self.mask)

        fp16 = fp.astype(np.uint16)
        present = (self.table[i1] == fp16[:, None]).any(axis=1)
        present |= (self.table[i2] == fp16[:, None]).any(axis=1)
        if self.overflow:
            for k in np.flatnonzero(~present):
                if (int(i1[k]), int(fp[k])) in self.overflow or (
                    int(i2[k]), int(fp[k])
                ) in self.overflow:
                    present[k] = True

        # within-batch first-wins on the canonical signature
        # (min(i1,i2), fp): later keys with the same signature would have
        # seen the earlier key's fingerprint in the sequential gate
        sig = (np.minimum(i1, i2) << np.int64(17)) | fp
        cand = np.flatnonzero(~present)
        if cand.size == 0:
            return ~present
        _, first_idx = np.unique(sig[cand], return_index=True)
        new = cand[np.sort(first_idx)]
        dup = np.setdiff1d(cand, new, assume_unique=True)
        out = ~present
        out[dup] = False

        # bulk placement: try i1 runs, then i2 for the spill, then scalar
        # eviction for both-buckets-full stragglers
        rest = new
        for tgt in (i1, i2):
            if rest.size == 0:
                break
            b = tgt[rest]
            order = np.argsort(b, kind="stable")
            bs = b[order]
            starts = np.flatnonzero(np.r_[True, bs[1:] != bs[:-1]])
            sizes = np.diff(np.r_[starts, bs.size])
            ranks = np.arange(bs.size) - np.repeat(starts, sizes)
            pos = self.occ[bs].astype(np.int64) + ranks
            fits = pos < self.SLOTS
            if fits.any():
                put = order[fits]
                self.table[bs[fits], pos[fits]] = fp16[rest[put]]
                ub, cnt = np.unique(bs[fits], return_counts=True)
                self.occ[ub] += cnt.astype(np.uint8)
                self.size += int(put.size)
            rest = rest[order[~fits]]
        for k in rest:
            self._insert_fp(int(i1[k]), int(i2[k]), int(fp[k]))
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
        f.occ = (f.table != _EMPTY).sum(axis=1).astype(np.uint8)
        f.overflow = {tuple(p) for p in state["overflow"]}
        f._rng = random.Random()
        f._rng.setstate(tuple(state["rng_state"]) if not isinstance(state["rng_state"], tuple) else state["rng_state"])
        return f
