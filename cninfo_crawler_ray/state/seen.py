"""Sharded URL-seen set: cuckoo filter front + exact backing set (T2).

The reference's in-flight dedup is a driver-local Python ``set`` over a raw
4-tuple, scoped to one listing stream (cninfo_report_crawler.py:183,
:294-306). At 10^10-URL frontier scale that must become distributed state:

- keyed on SHA1(canonical URL) (north rule),
- sharded by url-hash range across an actor pool (one shard = one hash
  interval, same intervals as the checkpoint partitions),
- a cuckoo filter in front answers "definitely new" without touching the
  exact set; the exact per-shard set backs it so false positives can NEVER
  corrupt the *exact* URL-seen match the north rule demands (SURVEY.md §7.5),
- batch RPC (``contains_and_add`` on a list) so callers pay one round trip
  per map_batches batch, not per URL,
- snapshot/restore for checkpointed resume.

Determinism: "first occurrence wins" is defined by the canonical order key,
not arrival order — callers that need the deterministic winner among
duplicates resolve it with a groupby-argmin *before* consulting the seen set
(SURVEY.md §3.4); the actor path is the streaming/incremental admission gate.
"""

from __future__ import annotations

import hashlib
import pickle


class CuckooFilter:
    """Minimal bucketed cuckoo filter (4-slot buckets, 1-byte fingerprints,
    partial-key eviction). Supports add/contains/remove; ~2-3% false-positive
    rate at default load, which is fine because an exact set sits behind it."""

    MAX_KICKS = 500

    def __init__(self, capacity: int = 1 << 16):
        self.nbuckets = max(1 << (capacity - 1).bit_length(), 8)
        self.buckets: list[list[int]] = [[] for _ in range(self.nbuckets)]
        self.count = 0

    def _fp_and_buckets(self, key: bytes) -> tuple[int, int, int]:
        h = hashlib.blake2b(key, digest_size=8).digest()
        fp = h[0] or 1  # fingerprint never 0
        i1 = int.from_bytes(h[1:5], "little") % self.nbuckets
        # partial-key cuckoo: i2 = i1 XOR hash(fp)
        fph = int.from_bytes(hashlib.blake2b(bytes([fp]), digest_size=4).digest(), "little")
        i2 = (i1 ^ fph) % self.nbuckets
        return fp, i1, i2

    def contains(self, key: bytes) -> bool:
        fp, i1, i2 = self._fp_and_buckets(key)
        return fp in self.buckets[i1] or fp in self.buckets[i2]

    def add(self, key: bytes) -> bool:
        import random

        fp, i1, i2 = self._fp_and_buckets(key)
        for i in (i1, i2):
            if len(self.buckets[i]) < 4:
                self.buckets[i].append(fp)
                self.count += 1
                return True
        # evict (seeded rng not needed — the exact set is authoritative)
        rnd = random.Random(fp ^ i1)
        i = i1
        for _ in range(self.MAX_KICKS):
            slot = rnd.randrange(4)
            fp, self.buckets[i][slot] = self.buckets[i][slot], fp
            fph = int.from_bytes(hashlib.blake2b(bytes([fp]), digest_size=4).digest(), "little")
            i = (i ^ fph) % self.nbuckets
            if len(self.buckets[i]) < 4:
                self.buckets[i].append(fp)
                self.count += 1
                return True
        return False  # table full — callers fall through to the exact set

    def remove(self, key: bytes) -> bool:
        fp, i1, i2 = self._fp_and_buckets(key)
        for i in (i1, i2):
            if fp in self.buckets[i]:
                self.buckets[i].remove(fp)
                self.count -= 1
                return True
        return False


class SeenShard:
    """One hash-range shard of the URL-seen set. Plain class — wrapped by
    ``ray.remote`` at pool construction so it is unit-testable standalone."""

    def __init__(self, shard_id: int = 0, capacity: int = 1 << 16):
        self.shard_id = shard_id
        self.filter = CuckooFilter(capacity)
        self.overflowed = False  # once full, "not in filter" stops meaning "new"
        self.exact: set[bytes] = set()
        self.high_water_seq = -1

    def contains_and_add(self, keys: list[bytes], seqs: list[int] | None = None) -> list[bool]:
        """Batch test-and-set. Returns is_new per key. The cuckoo filter
        short-circuits definite-new keys; the exact set decides the rest."""
        out = []
        for i, k in enumerate(keys):
            if self.overflowed or self.filter.contains(k):
                new = k not in self.exact  # maybe-seen → exact check
            else:
                new = True
            if new:
                self.exact.add(k)
                if not self.filter.add(k):
                    self.overflowed = True
            out.append(new)
            if seqs is not None and seqs[i] > self.high_water_seq:
                self.high_water_seq = seqs[i]
        return out

    def contains(self, keys: list[bytes]) -> list[bool]:
        if self.overflowed:
            return [k in self.exact for k in keys]
        return [self.filter.contains(k) and k in self.exact for k in keys]

    def discard(self, keys: list[bytes]) -> None:
        """Retract admissions (stream-close rollback); cuckoo remove keeps the
        filter honest (the deletion-support reason it beats bloom, §7)."""
        for k in keys:
            if k in self.exact:
                self.exact.discard(k)
                self.filter.remove(k)

    def size(self) -> int:
        return len(self.exact)

    def snapshot(self) -> bytes:
        return pickle.dumps((self.shard_id, self.exact, self.high_water_seq))

    def restore(self, blob: bytes) -> None:
        self.shard_id, self.exact, self.high_water_seq = pickle.loads(blob)
        self.filter = CuckooFilter(max(len(self.exact) * 2, 1 << 10))
        self.overflowed = False
        for k in self.exact:
            if not self.filter.add(k):
                self.overflowed = True


class ShardedSeenSet:
    """Driver-side facade over a pool of SeenShard actors, sharded by the
    leading bytes of the sha1 key (the same hash ranges as checkpoint
    partitions). All calls are batch-per-shard."""

    def __init__(self, num_shards: int, capacity_per_shard: int = 1 << 16):
        import ray

        self.num_shards = num_shards
        # coordination actor: tiny per-call CPU, mostly idle — reserving CPU
        # would let a wide shard pool starve the compute stages
        actor = ray.remote(num_cpus=0)(SeenShard)
        self.shards = [actor.remote(i, capacity_per_shard) for i in range(num_shards)]

    def _route(self, keys: list[bytes]) -> dict[int, list[int]]:
        width = (1 << 32) // self.num_shards + 1
        by_shard: dict[int, list[int]] = {}
        for i, k in enumerate(keys):
            s = int.from_bytes(k[:4], "big") // width
            by_shard.setdefault(s, []).append(i)
        return by_shard

    def contains_and_add(self, keys: list[bytes], seqs: list[int] | None = None) -> list[bool]:
        import ray

        by_shard = self._route(keys)
        futs = {
            s: self.shards[s].contains_and_add.remote(
                [keys[i] for i in idxs], [seqs[i] for i in idxs] if seqs else None
            )
            for s, idxs in by_shard.items()
        }
        out = [False] * len(keys)
        for s, idxs in by_shard.items():
            for i, new in zip(idxs, ray.get(futs[s])):
                out[i] = new
        return out

    def total(self) -> int:
        import ray

        return sum(ray.get([s.size.remote() for s in self.shards]))

    def snapshot(self) -> list[bytes]:
        import ray

        return ray.get([s.snapshot.remote() for s in self.shards])

    def restore(self, blobs: list[bytes]) -> None:
        import ray

        ray.get([s.restore.remote(b) for s, b in zip(self.shards, blobs)])
