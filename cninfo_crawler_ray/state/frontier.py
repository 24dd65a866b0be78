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
    """One hash-range shard: a min-heap on (-priority, order_key, seq).

    ``spill_threshold`` bounds the in-memory heap (VERDICT r02 "what's wrong"
    §6): when a push grows the heap past the threshold, the low-priority tail
    is written to a sorted parquet spill file (actor-local scratch) and only
    the best half stays resident. Pops transparently reload a spill file
    whenever its best entry could beat the in-memory top-k, so pop order is
    byte-identical to an unbounded heap at any threshold — asserted in
    tests/test_scheduler.py. At 10^10-URL frontier scale this caps per-actor
    RSS at O(threshold) rows while the crawl works the high-priority head."""

    def __init__(self, shard_id: int = 0, spill_threshold: int | None = None):
        self.shard_id = shard_id
        self.heap: list[tuple] = []  # (-priority, order_key, seq, row_values)
        self.columns: list[str] | None = None
        self.dtypes: list[str] | None = None
        self._seq = 0  # monotonic insertion counter (see module docstring)
        self.spill_threshold = spill_threshold
        self._spill: list[dict] = []  # {path, min_key, n} per spill file
        self._spill_dir: str | None = None
        self._spill_ctr = 0
        #: staged-admission state (pull path): heap entries popped by
        #: stage_top awaiting the driver's verdict, admitted row payloads
        #: awaiting a worker pull, and dead-lettered rows kept for lineage.
        self._staged: list[tuple] = []
        self._outbox: list[list] = []
        self.dead_rows: list[tuple[str, list]] = []

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
        self._maybe_spill()
        return len(self.heap) + sum(f["n"] for f in self._spill)

    # -- spill (bounded actor memory) ---------------------------------------

    def _spill_path(self) -> str:
        import tempfile

        if self._spill_dir is None:
            self._spill_dir = tempfile.mkdtemp(
                prefix=f"frontier_spill_{self.shard_id}_")
        self._spill_ctr += 1
        import os as _os

        return _os.path.join(self._spill_dir, f"spill_{self._spill_ctr:06d}.parquet")

    def _maybe_spill(self) -> None:
        if not self.spill_threshold or len(self.heap) <= self.spill_threshold:
            return
        self._spill_down(self.spill_threshold // 2)

    def _spill_down(self, keep: int) -> None:
        entries = sorted(self.heap, key=lambda e: e[:3])
        self.heap = entries[:keep]
        heapq.heapify(self.heap)
        tail = entries[keep:]
        if not tail:
            return
        df = pd.DataFrame([e[3] for e in tail], columns=self.columns)
        if self.dtypes:
            df = df.astype(dict(zip(self.columns, self.dtypes)))
        df.insert(0, "_sk0", [float(e[0]) for e in tail])
        df.insert(1, "_sk1", [e[1] for e in tail])
        df.insert(2, "_sk2", [int(e[2]) for e in tail])
        path = self._spill_path()
        df.to_parquet(path, index=False)
        self._spill.append({"path": path, "min_key": tail[0][:3], "n": len(tail)})

    def _reload_spill(self, f: dict) -> None:
        import os as _os

        df = pd.read_parquet(f["path"])
        payload = df[self.columns]
        if self.dtypes:
            payload = payload.astype(dict(zip(self.columns, self.dtypes)))
        rows = payload.values.tolist()
        for k0, k1, k2, row in zip(df["_sk0"], df["_sk1"], df["_sk2"], rows):
            heapq.heappush(self.heap, (k0, k1, int(k2), row))
        self._spill.remove(f)
        _os.unlink(f["path"])

    def _ensure_top(self, k: int) -> None:
        """Reload any spill file whose best entry could belong to the next
        top-k pop, so pop order is byte-identical to an unbounded heap; the
        heap is re-bounded after each reload (the kept top-k is never
        re-spilled, so the loop strictly consumes files and terminates)."""
        while self._spill:
            if len(self.heap) >= k:
                kth = heapq.nsmallest(k, self.heap, key=lambda e: e[:3])[-1][:3]
                best = min(self._spill, key=lambda f: f["min_key"])
                if best["min_key"] >= kth:
                    return
                self._reload_spill(best)
            else:
                self._reload_spill(min(self._spill, key=lambda f: f["min_key"]))
            self._rebound(k)

    def _rebound(self, k: int) -> None:
        """Invariant after every public push/pop: in-memory heap ≤
        max(spill_threshold, 2k) rows."""
        if (self.spill_threshold
                and len(self.heap) > max(self.spill_threshold, 2 * k)):
            self._spill_down(max(k, self.spill_threshold // 2))

    def pop_top(self, k: int) -> tuple[list[str], list[list]]:
        self._ensure_top(k)
        out = []
        for _ in range(min(k, len(self.heap))):
            out.append(heapq.heappop(self.heap)[3])
        self._rebound(k)
        return (self.columns or [], out)

    # -- staged admission (pull path) ---------------------------------------
    # Control plane / data plane split (VERDICT r02 §3): the driver's global
    # merge + politeness decision sees ONLY these compact key columns; the
    # full row payloads never leave the shard until a fetch worker pulls the
    # admitted outbox directly (ShardedFrontier.wave_dataset).

    def stage_top(self, k: int, url_col: str = "PDF链接") -> dict:
        """Pop the local top-k into staging; return compact admission keys
        (priority, order_key, host, robots path) for the driver merge.
        ``path`` is None when the frame has no URL column (mirrors
        pop_admissible skipping the robots check in that case). Clears the
        previous round's outbox — by the time a new round is staged, the
        prior round's rows are durably written (scheduler commits the round
        parquet before looping), and keeping the outbox readable until then
        makes worker pulls idempotent under task retries."""
        self._outbox = []
        self._ensure_top(k)
        self._staged = [heapq.heappop(self.heap)
                        for _ in range(min(k, len(self.heap)))]
        self._rebound(k)
        cols = self.columns or []
        ci = {c: i for i, c in enumerate(cols)}
        rows = [e[3] for e in self._staged]
        hi = ci.get("host")
        ui = ci.get(url_col)
        return {
            "priority": [r[ci["priority"]] for r in rows] if rows else [],
            "order_key": [r[ci["order_key"]] for r in rows] if rows else [],
            "host": ([r[hi] for r in rows] if hi is not None
                     else [""] * len(rows)),
            "path": ([_path_of(r[ui]) for r in rows] if ui is not None
                     else None),
        }

    def resolve(self, admit_idx: list[int], requeue_idx: list[int],
                dead: list[tuple[int, str]]) -> dict:
        """Apply the driver's verdicts to the staged entries: admitted rows
        move to the pull outbox (in the given global-merge order), requeued
        entries go back on the heap unchanged (original seq preserved), dead
        rows are kept shard-side for lineage. Returns per-reason dead counts."""
        for i in admit_idx:
            self._outbox.append(self._staged[i][3])
        for i in requeue_idx:
            heapq.heappush(self.heap, self._staged[i])
        counts: dict[str, int] = {}
        for i, reason in dead:
            self.dead_rows.append((reason, self._staged[i][3]))
            counts[reason] = counts.get(reason, 0) + 1
        self._staged = []
        return {"admitted": len(admit_idx), "dead": counts}

    def read_outbox(self) -> tuple[list[str], list[list]]:
        """Non-destructive (idempotent under Ray task retries); cleared by
        the next stage_top."""
        return (self.columns or [], list(self._outbox))

    def read_dead(self) -> tuple[list[str], list[list], list[str]]:
        reasons = [r for r, _ in self.dead_rows]
        rows = [row for _, row in self.dead_rows]
        return (reasons, rows, self.columns or [])

    def meta(self) -> tuple[list[str] | None, list[str] | None]:
        return (self.columns, self.dtypes)

    def size(self) -> int:
        return len(self.heap) + sum(f["n"] for f in self._spill)

    def snapshot(self) -> bytes:
        # spill files travel inside the blob (self-contained checkpoint);
        # at real scale these would be lineage-referenced parquet on shared
        # storage rather than inlined bytes
        spills = []
        for f in self._spill:
            with open(f["path"], "rb") as fh:
                spills.append((f["min_key"], f["n"], fh.read()))
        return pickle.dumps((self.shard_id, self.columns, self.dtypes,
                             self.heap, self._seq, self.spill_threshold,
                             spills))

    def restore(self, blob: bytes) -> None:
        (self.shard_id, self.columns, self.dtypes, heap, self._seq,
         self.spill_threshold, spills) = pickle.loads(blob)
        self.heap = heap
        heapq.heapify(self.heap)
        self._spill = []
        for min_key, n, data in spills:
            path = self._spill_path()
            with open(path, "wb") as fh:
                fh.write(data)
            self._spill.append({"path": path, "min_key": tuple(min_key), "n": n})
        # in-flight staging/outbox state is never snapshotted: a kill mid-round
        # resumes from the previous round's state and recomputes the round
        self._staged = []
        self._outbox = []


def _path_of(url) -> str:
    """scheme://host/path... → /path... (robots matching input)."""
    s = str(url)
    i = s.find("://")
    rest = s[i + 3:] if i >= 0 else s
    j = rest.find("/")
    return rest[j:] if j >= 0 else "/"


def _url_paths(urls: pd.Series) -> list[str]:
    return [_path_of(u) for u in urls]


def _pull_outbox(df: pd.DataFrame, *, shards, dtypes) -> pd.DataFrame:
    """Wave data plane: a map task pulls its shard's admitted rows straight
    from the FrontierShard actor. Runs as a Ray task (plain fn), one per
    non-empty shard; read_outbox is non-destructive so retries are safe."""
    import ray

    frames = []
    for s in df["shard_id"]:
        cols, rows = ray.get(shards[int(s)].read_outbox.remote())
        sub = pd.DataFrame(rows, columns=cols)
        if dtypes:
            sub = sub.astype(dict(zip(cols, dtypes)))
        frames.append(sub)
    return pd.concat(frames, ignore_index=True)


class ShardedFrontier:
    """Driver-side facade over a pool of FrontierShard actors, sharded by
    the leading bytes of ``url_sha1`` (hex) — the same routing as the
    seen-set shards."""

    def __init__(self, num_shards: int = 8, use_actors: bool = True,
                 spill_threshold: int | None = None):
        self.num_shards = num_shards
        self.use_actors = use_actors
        if use_actors:
            import ray

            # coordination actor: tiny per-call CPU, mostly idle — reserving
            # CPU would let a wide shard pool starve the compute stages
            actor = ray.remote(num_cpus=0)(FrontierShard)
            self.shards = [actor.remote(i, spill_threshold)
                           for i in range(num_shards)]
        else:
            self.shards = [FrontierShard(i, spill_threshold)
                           for i in range(num_shards)]
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

    def pop_admissible_staged(self, k: int, gate,
                              url_col: str = "PDF链接") -> dict:
        """pop_admissible with the data plane left on the shards (VERDICT r02
        §3): shards stage their local top-k and ship ONLY compact key columns
        (priority, order_key, host, url path) for the driver's global merge +
        robots + politeness decision; per-shard verdict lists go back; the
        admitted full rows wait in shard outboxes for fetch workers to pull
        (``wave_dataset``). Driver memory per round is O(wave keys) — four
        scalars/short strings per candidate — never O(wave rows), and denied
        rows are re-heaped in place with zero driver round-trip.

        Semantics are identical to ``pop_admissible`` (same merge order, same
        robots dead-lettering, same grant order, same hopeless-host rule);
        asserted byte-identical in tests/test_scheduler.py."""
        self.last_denied_hosts = []
        staged = self._calls("stage_top", [(k, url_col) for _ in self.shards])
        # merged candidate keys: (-priority, order_key, arrival, shard, local)
        recs: list[tuple] = []
        hosts: list[str] = []
        paths: list[str | None] = []
        for s, st in enumerate(staged):
            pr, ok_, ho = st["priority"], st["order_key"], st["host"]
            pa = st["path"]
            for j in range(len(pr)):
                recs.append((-pr[j], ok_[j], len(recs), s, j))
                hosts.append(ho[j])
                paths.append(pa[j] if pa is not None else None)
        recs.sort()
        requeue: dict[int, list[int]] = {s: [] for s in range(self.num_shards)}
        admit: dict[int, list[int]] = {s: [] for s in range(self.num_shards)}
        dead: dict[int, list[tuple[int, str]]] = {s: [] for s in range(self.num_shards)}
        for r in recs[k:]:
            requeue[r[3]].append(r[4])
        take = recs[:k]
        # robots (skipped for frames without a URL column, like pop_admissible)
        live: list[tuple] = []
        by_host: dict[str, list[tuple]] = {}
        for r in take:
            if paths[r[2]] is None:
                live.append(r)
            else:
                by_host.setdefault(hosts[r[2]], []).append(r)
        robots_live: list[tuple] = []
        for host, grp in by_host.items():
            ok = gate.allowed(host, [paths[r[2]] for r in grp])
            for r, o in zip(grp, ok):
                if o:
                    robots_live.append(r)
                else:
                    dead[r[3]].append((r[4], "robots"))
        # restore global merge order for the grant sequence
        live = sorted(live + robots_live, key=lambda r: (r[0], r[1]))
        granted = gate.acquire_batch([hosts[r[2]] for r in live],
                                     [1] * len(live))
        denied = [r for r, g in zip(live, granted) if g != 1]
        for r, g in zip(live, granted):
            if g == 1:
                admit[r[3]].append(r[4])
        if denied:
            waits = {h: gate.wait_ticks_for(h, 1)
                     for h in {hosts[r[2]] for r in denied}}
            requeued_hosts = set()
            for r in denied:
                h = hosts[r[2]]
                if waits[h] < 0:
                    dead[r[3]].append((r[4], "zero_rate_host"))
                else:
                    requeue[r[3]].append(r[4])
                    requeued_hosts.add(h)
            self.last_denied_hosts = sorted(requeued_hosts)
        results = self._calls(
            "resolve",
            [(admit[s], requeue[s], dead[s]) for s in range(self.num_shards)])
        dead_counts: dict[str, int] = {}
        for res in results:
            for reason, n in res["dead"].items():
                dead_counts[reason] = dead_counts.get(reason, 0) + n
        return {"admitted": [res["admitted"] for res in results],
                "dead": dead_counts}

    def wave_dataset(self, shard_counts: list[int]):
        """Round Dataset for the staged wave: one pull task per non-empty
        shard reads that shard's outbox DIRECTLY (actor RPC from inside the
        map task) — admitted rows flow shard → worker, never via the driver.
        Non-actor (in-process) mode builds the frame driver-side, as that
        mode exists only for unit tests."""
        import ray.data as rd

        idx = [s for s, n in enumerate(shard_counts) if n > 0]
        if not self.use_actors:
            frames = []
            for s in idx:
                cols, rows = self.shards[s].read_outbox()
                frames.append(self._rebuild(rows, cols))
            return rd.from_pandas(pd.concat(frames, ignore_index=True))
        return rd.from_items([{"shard_id": int(s)} for s in idx]).map_batches(
            _pull_outbox,
            fn_kwargs={"shards": self.shards, "dtypes": self.dtypes},
            batch_format="pandas", batch_size=1, num_cpus=0.25,
        )

    def dead_letter_rows(self) -> pd.DataFrame:
        """Lineage view of shard-side dead letters (staged path)."""
        frames = []
        for res in self._calls("read_dead", [() for _ in self.shards]):
            reasons, rows, cols = res
            if rows:
                df = self._rebuild(rows, cols)
                df["_dead_reason"] = reasons
                frames.append(df)
        return (pd.concat(frames, ignore_index=True)
                if frames else pd.DataFrame())

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
