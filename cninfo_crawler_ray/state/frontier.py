"""Sharded priority min-heap frontier (north rule).

The reference has no explicit frontier structure — its traversal order is
the nested (exchange × date × page) loop (cninfo_report_crawler.py:450-469)
and its "priority" is the keep-latest-per-code reduction (C:524-530). The
north rule promotes this to a first-class **priority min-heap frontier held
in Ray actor pools**, priority = disclosure-date recency × seed rank, so a
10^10-URL crawl always works on the currently-most-valuable admissible URLs.

Design:

- one heap shard per url-sha1 hash range (same ranges as the seen-set and
  checkpoint partitions — ONE partitioning key reused across all state),
- entries ordered by (-priority, order_key): highest priority first, ties
  broken by the canonical crawl order (SURVEY.md §3.4), so pop order is a
  pure function of frontier CONTENTS — deterministic at any shard count and
  any parallelism,
- batch API throughout (push/pop whole waves, not URLs),
- global pop = per-shard pop(k) → driver k-way merge → push the remainder
  back (the remainder churn is bounded by k × num_shards),
- snapshot/restore per shard for checkpointed resume.

``FrontierShard`` is a plain class (unit-testable standalone) wrapped by
``ray.remote`` in the ``ShardedFrontier`` facade, mirroring
``state/seen.py``.
"""

from __future__ import annotations

import heapq
import pickle

import pandas as pd


class FrontierShard:
    """One hash-range shard: a min-heap on (-priority, order_key)."""

    def __init__(self, shard_id: int = 0):
        self.shard_id = shard_id
        self.heap: list[tuple] = []  # (-priority, order_key, row_values)
        self.columns: list[str] | None = None

    def push(self, columns: list[str], rows: list[list]) -> int:
        if self.columns is None:
            self.columns = list(columns)
        pi = columns.index("priority")
        oi = columns.index("order_key")
        for r in rows:
            heapq.heappush(self.heap, (-r[pi], r[oi], r))
        return len(self.heap)

    def pop_top(self, k: int) -> tuple[list[str], list[list]]:
        out = []
        for _ in range(min(k, len(self.heap))):
            out.append(heapq.heappop(self.heap)[2])
        return (self.columns or [], out)

    def size(self) -> int:
        return len(self.heap)

    def snapshot(self) -> bytes:
        return pickle.dumps((self.shard_id, self.columns, self.heap))

    def restore(self, blob: bytes) -> None:
        self.shard_id, self.columns, heap = pickle.loads(blob)
        self.heap = heap
        heapq.heapify(self.heap)


class ShardedFrontier:
    """Driver-side facade over a pool of FrontierShard actors, sharded by
    the leading bytes of ``url_sha1`` (hex) — the same routing as the
    seen-set shards."""

    def __init__(self, num_shards: int = 8, use_actors: bool = True):
        self.num_shards = num_shards
        self.use_actors = use_actors
        if use_actors:
            import ray

            # coordination actor: tiny per-call CPU, mostly idle — reserving
            # CPU would let a wide shard pool starve the compute stages
            actor = ray.remote(num_cpus=0)(FrontierShard)
            self.shards = [actor.remote(i) for i in range(num_shards)]
        else:
            self.shards = [FrontierShard(i) for i in range(num_shards)]
        self.columns: list[str] | None = None

    # -- internals ---------------------------------------------------------

    def _call(self, shard, method: str, *args):
        if self.use_actors:
            import ray

            return ray.get(getattr(shard, method).remote(*args))
        return getattr(shard, method)(*args)

    def _calls(self, method: str, args_per_shard: list[tuple]):
        if self.use_actors:
            import ray

            return ray.get([
                getattr(s, method).remote(*a) for s, a in zip(self.shards, args_per_shard)
            ])
        return [getattr(s, method)(*a) for s, a in zip(self.shards, args_per_shard)]

    def _shard_of(self, sha_hex: str) -> int:
        return int(sha_hex[:8], 16) % self.num_shards

    # -- API ---------------------------------------------------------------

    def push_pandas(self, df: pd.DataFrame) -> int:
        """Push frontier rows (must include priority, order_key, url_sha1)."""
        if len(df) == 0:
            return self.total()
        self.columns = list(df.columns)
        rows = df.values.tolist()
        shard_idx = [self._shard_of(h) for h in df["url_sha1"]]
        by_shard: dict[int, list[list]] = {}
        for s, r in zip(shard_idx, rows):
            by_shard.setdefault(s, []).append(r)
        args = [(self.columns, by_shard.get(s, [])) for s in range(self.num_shards)]
        self._calls("push", args)
        return self.total()

    def total(self) -> int:
        return sum(self._calls("size", [() for _ in self.shards]))

    def pop_top(self, k: int) -> pd.DataFrame:
        """Globally best k entries by (priority desc, order_key asc) —
        removes them from the shards; the non-selected remainder of each
        shard's local top-k is pushed back."""
        results = self._calls("pop_top", [(k,) for _ in self.shards])
        merged: list[tuple] = []
        cols = self.columns
        for shard_cols, rows in results:
            cols = cols or shard_cols
            pi = shard_cols.index("priority") if shard_cols else 0
            oi = shard_cols.index("order_key") if shard_cols else 0
            for r in rows:
                merged.append((-r[pi], r[oi], r))
        merged.sort()
        take = [t[2] for t in merged[:k]]
        rest = [t[2] for t in merged[k:]]
        if rest and cols:
            df_rest = pd.DataFrame(rest, columns=cols)
            self.push_pandas(df_rest)
        return pd.DataFrame(take, columns=cols) if cols else pd.DataFrame()

    def pop_admissible(self, k: int, gate) -> pd.DataFrame:
        """Top-k wave filtered by the politeness gate: denied rows go back
        on the heap (they stay top-priority and win a later round once the
        host budget refills). Grants consume the gate's virtual-tick budget,
        so admission order is deterministic (SURVEY.md §7: politeness vs
        determinism)."""
        wave = self.pop_top(k)
        if len(wave) == 0:
            return wave
        granted = gate.acquire_batch(list(wave["host"]), [1] * len(wave))
        ok = [g == 1 for g in granted]
        denied = wave[[not o for o in ok]]
        if len(denied):
            self.push_pandas(denied)
        return wave[ok].reset_index(drop=True)

    def snapshot(self) -> list[bytes]:
        return self._calls("snapshot", [() for _ in self.shards])

    def restore(self, blobs: list[bytes]) -> None:
        self._calls("restore", [(b,) for b in blobs])
        for s in range(self.num_shards):
            cols, rows = self._call(self.shards[s], "pop_top", 0)
            if cols:
                self.columns = cols
