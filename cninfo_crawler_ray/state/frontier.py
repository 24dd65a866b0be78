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
- entries ordered by (-priority, order_key, insertion_seq): highest priority
  first, ties broken by the canonical crawl order (SURVEY.md §3.4). The
  insertion counter is a safety tiebreaker ONLY — ``order_key`` is unique
  per admitted URL (seen-set admission grants each URL once), so the counter
  never decides between two live rows in practice; it exists so the heap
  never falls through to comparing raw row payloads (which raises TypeError
  on None-containing or cross-dtype cells),
- batch API throughout (push/pop whole waves, not URLs),
- global pop = per-shard pop(k) → driver k-way merge → push the remainder
  back (the remainder churn is bounded by k × num_shards),
- pandas round-trips preserve dtypes: the shard records the pushed frame's
  dtype map and every rebuilt frame is cast back to it (``df.values`` alone
  re-infers dtypes and e.g. widens int32 partition ids),
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
    """One hash-range shard: a min-heap on (-priority, order_key, seq)."""

    def __init__(self, shard_id: int = 0):
        self.shard_id = shard_id
        self.heap: list[tuple] = []  # (-priority, order_key, seq, row_values)
        self.columns: list[str] | None = None
        self.dtypes: list[str] | None = None
        self._seq = 0  # monotonic insertion counter (see module docstring)

    def push(self, columns: list[str], rows: list[list],
             dtypes: list[str] | None = None) -> int:
        if self.columns is None:
            self.columns = list(columns)
        if dtypes is not None and self.dtypes is None:
            self.dtypes = list(dtypes)
        pi = columns.index("priority")
        oi = columns.index("order_key")
        for r in rows:
            heapq.heappush(self.heap, (-r[pi], r[oi], self._seq, r))
            self._seq += 1
        return len(self.heap)

    def pop_top(self, k: int) -> tuple[list[str], list[list]]:
        out = []
        for _ in range(min(k, len(self.heap))):
            out.append(heapq.heappop(self.heap)[3])
        return (self.columns or [], out)

    def meta(self) -> tuple[list[str] | None, list[str] | None]:
        return (self.columns, self.dtypes)

    def size(self) -> int:
        return len(self.heap)

    def snapshot(self) -> bytes:
        return pickle.dumps((self.shard_id, self.columns, self.dtypes,
                             self.heap, self._seq))

    def restore(self, blob: bytes) -> None:
        self.shard_id, self.columns, self.dtypes, heap, self._seq = pickle.loads(blob)
        self.heap = heap
        heapq.heapify(self.heap)


def _url_paths(urls: pd.Series) -> list[str]:
    """scheme://host/path... → /path... (robots matching input)."""
    out = []
    for u in urls:
        s = str(u)
        i = s.find("://")
        rest = s[i + 3:] if i >= 0 else s
        j = rest.find("/")
        out.append(rest[j:] if j >= 0 else "/")
    return out


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
        self.dtypes: list[str] | None = None
        #: robots-disallowed and never-grantable rows removed by
        #: pop_admissible — kept for lineage/metrics, never re-fetched.
        self.dead_letters: list[pd.DataFrame] = []
        #: hosts denied a grant in the most recent pop_admissible wave —
        #: the scheduler uses them to advance the virtual clock by exactly
        #: the soonest refill instead of spinning tick-by-tick.
        self.last_denied_hosts: list[str] = []

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

    def _rebuild(self, rows: list[list], cols: list[str] | None) -> pd.DataFrame:
        if not cols:
            return pd.DataFrame()
        df = pd.DataFrame(rows, columns=cols)
        if self.dtypes:  # restore the pushed dtypes (values.tolist re-infers)
            df = df.astype(dict(zip(cols, self.dtypes)))
        return df

    # -- API ---------------------------------------------------------------

    def push_pandas(self, df: pd.DataFrame) -> int:
        """Push frontier rows (must include priority, order_key, url_sha1)."""
        if len(df) == 0:
            return self.total()
        self.columns = list(df.columns)
        if self.dtypes is None:
            self.dtypes = [str(t) for t in df.dtypes]
        rows = df.values.tolist()
        shard_idx = [self._shard_of(h) for h in df["url_sha1"]]
        by_shard: dict[int, list[list]] = {}
        for s, r in zip(shard_idx, rows):
            by_shard.setdefault(s, []).append(r)
        args = [(self.columns, by_shard.get(s, []), self.dtypes)
                for s in range(self.num_shards)]
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
                # len(merged) = arrival index: final tiebreaker so sort never
                # falls through to comparing raw row lists
                merged.append((-r[pi], r[oi], len(merged), r))
        merged.sort()
        take = [t[3] for t in merged[:k]]
        rest = [t[3] for t in merged[k:]]
        if rest and cols:
            self.push_pandas(self._rebuild(rest, cols))
        return self._rebuild(take, cols)

    def pop_admissible(self, k: int, gate, url_col: str = "PDF链接") -> pd.DataFrame:
        """Top-k wave filtered by robots rules then the politeness budget.

        - robots-disallowed rows (gate.allowed) are DEAD-LETTERED: recorded
          on ``self.dead_letters``, never fetched, never requeued;
        - budget-denied rows whose host can never be granted (zero refill
          rate with an exhausted bucket) are dead-lettered too — requeueing
          them would spin the scheduler forever (ADVICE r01);
        - other budget-denied rows go back on the heap (they stay
          top-priority and win a later round once the host budget refills)
          and their hosts are exposed via ``last_denied_hosts`` so the
          caller can advance the virtual clock by exactly the soonest
          refill. Grants consume the gate's virtual-tick budget, so
          admission order is deterministic (SURVEY.md §7)."""
        wave = self.pop_top(k)
        self.last_denied_hosts = []
        if len(wave) == 0:
            return wave
        if url_col in wave.columns:
            keep = []
            for host, grp in wave.groupby("host", sort=False):
                ok = gate.allowed(host, _url_paths(grp[url_col]))
                keep.append(pd.Series(ok, index=grp.index))
            allowed = pd.concat(keep).reindex(wave.index)
            if not allowed.all():
                self.dead_letters.append(wave[~allowed].assign(_dead_reason="robots"))
                wave = wave[allowed].reset_index(drop=True)
                if len(wave) == 0:
                    return wave
        granted = gate.acquire_batch(list(wave["host"]), [1] * len(wave))
        ok = [g == 1 for g in granted]
        denied = wave[[not o for o in ok]]
        if len(denied):
            waits = {h: gate.wait_ticks_for(h, 1) for h in denied["host"].unique()}
            hopeless = denied["host"].map(lambda h: waits[h] < 0)
            if hopeless.any():
                self.dead_letters.append(
                    denied[hopeless].assign(_dead_reason="zero_rate_host"))
            requeue = denied[~hopeless]
            if len(requeue):
                self.push_pandas(requeue.drop(columns=[], errors="ignore"))
                self.last_denied_hosts = sorted(requeue["host"].unique())
        return wave[ok].reset_index(drop=True)

    def snapshot(self) -> list[bytes]:
        return self._calls("snapshot", [() for _ in self.shards])

    def restore(self, blobs: list[bytes]) -> None:
        self._calls("restore", [(b,) for b in blobs])
        for s in range(self.num_shards):
            cols, dtypes = self._call(self.shards[s], "meta")
            if cols:
                self.columns = cols
                if dtypes:
                    self.dtypes = dtypes
