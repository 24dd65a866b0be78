"""Flagship end-to-end crawl: seeds → frontier → seen-set admission →
politeness-gated fetch → decode/validate/extract → long + wide reports.

This is the full composition (SURVEY.md §8): stage 1 builds the frontier in
canonical order; admission consults the sharded cuckoo-fronted URL-seen actor
pool (exact-set backed, so the final URL-seen set matches the oracle's
regardless of parallelism); the per-host politeness gate spaces fetches
within each host's budget (virtual ticks — it shapes timing, never results);
stage 2 streams fetch→decode→extract into the long/wide reductions.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..config import CrawlConfig
from ..sources import corpus as fixtures
from ..state.politeness import PolitenessGate
from ..state.seen import ShardedSeenSet
from . import stage1, stage2


def _grant_schedule(host_counts: dict[str, int], gate) -> tuple[dict, int]:
    """Replay the scheduler's round loop over per-host ADMITTED counts only —
    O(hosts × rounds) driver work, identical decision procedure to
    scheduler.run_scheduled_crawl at unbounded wave size (grant floor(tokens)
    per host per round tick; advance the virtual clock by exactly the soonest
    refill among denied hosts). Returns per-host cumulative grant steps
    ``{host: (ticks, cum_counts)}`` and the total wait ticks."""
    remaining = {h: int(n) for h, n in host_counts.items() if int(n) > 0}
    cum: dict[str, list[tuple[int, int]]] = {h: [] for h in remaining}
    wait_ticks = 0
    while remaining:
        tick = gate.now_tick
        for h in list(remaining):
            got = gate.acquire(h, remaining[h])
            if got:
                prev = cum[h][-1][1] if cum[h] else 0
                cum[h].append((tick, prev + got))
                remaining[h] -= got
                if remaining[h] == 0:
                    del remaining[h]
        if remaining:
            waits = [gate.wait_ticks_for(h, 1) for h in remaining]
            waits = [w for w in waits if w >= 0]
            if not waits:
                raise ValueError(
                    "zero-refill host(s) with exhausted budget can never drain "
                    "on the batch path: %s — use the scheduler path, which "
                    "dead-letters them" % sorted(remaining))
            adv = max(1, min(waits))
            gate.advance(adv)
            wait_ticks += adv
    steps = {h: (np.array([t for t, _ in v], dtype=np.int64),
                 np.array([c for _, c in v], dtype=np.int64))
             for h, v in cum.items()}
    return steps, wait_ticks


def run_crawl(
    n_images: int = 1_000,
    cfg: CrawlConfig | None = None,
    *,
    use_state_actors: bool = True,
    concurrency=None,
    politeness: str = "report-only",
    gate_overrides: dict | None = None,
    return_frontier: bool = False,
):
    """Returns dict with long/wide pandas frames + crawl counters (plus the
    admitted frontier frame when ``return_frontier=True`` — a smoke-scale
    inspection contract, off by default so the flagship path never ships the
    whole frontier to the driver).

    ``politeness`` (VERDICT r02): the batch path fetches the whole admitted
    frontier in one Dataset pass, so the per-host budget cannot reorder or
    drop anything — it defines the request *timing*. Two explicit modes:

    - ``"report-only"`` (default): the grant schedule is computed (identical
      decision procedure to the scheduler's round loop) and reported in
      ``counters["politeness_wait_ticks"]``, but fetch proceeds unspaced —
      the sandbox store has no real host to protect, and the flagship bench
      isolates fetch+decode throughput.
    - ``"enforce"``: additionally assigns every admitted URL its granted
      virtual tick (``grant_tick`` on the long rows' frontier), i.e. the
      exact admission schedule the scheduler path would execute; raises on
      zero-refill hosts (the scheduler dead-letters those instead).
      Equivalence with the scheduler's schedule is asserted in
      tests/test_scheduler.py.

    ``use_state_actors=False`` skips the actor admission path (the frontier
    is already exactly deduplicated by construction) — used by bench to
    isolate fetch+decode throughput."""
    cfg = cfg or CrawlConfig()
    fdir = fixtures.ensure_fixtures(n_images)
    frontier = stage1.build_frontier(fdir, cfg, concurrency=concurrency).materialize()

    counters = {"frontier_rows": frontier.count()}
    schedule = None
    if use_state_actors and counters["frontier_rows"]:
        # URL-seen admission (T2) runs INSIDE the map tasks (each batch RPCs
        # the seen shards and keeps only first-seen rows) — the frontier
        # never lands on the driver for admission. Duplicates are none
        # expected post-A3; the exactness assertion is the point.
        seen = ShardedSeenSet(cfg.seen_shards)

        class Admit:
            def __init__(self, shards):
                self.shards = shards

            def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
                import ray as _ray

                if len(df) == 0:
                    return df
                keys = [bytes.fromhex(h) for h in df["url_sha1"]]
                width = (1 << 32) // len(self.shards) + 1
                by_shard: dict[int, list[int]] = {}
                for i, k in enumerate(keys):
                    by_shard.setdefault(int.from_bytes(k[:4], "big") // width, []).append(i)
                seqs = df["order_key"].tolist()
                futs = {s: self.shards[s].contains_and_add.remote(
                            [keys[i] for i in idxs], [seqs[i] for i in idxs])
                        for s, idxs in by_shard.items()}
                is_new = np.zeros(len(keys), dtype=bool)
                for s, idxs in by_shard.items():
                    for i, new in zip(idxs, _ray.get(futs[s])):
                        is_new[i] = new
                return df[is_new]

        frontier = frontier.map_batches(
            Admit, fn_constructor_args=(seen.shards,), batch_format="pandas",
            batch_size=4096, concurrency=(1, 8), num_cpus=0.5,
        ).materialize()
        counters["seen_admitted"] = frontier.count()
        counters["seen_total"] = seen.total()

        # politeness (T3): the grant schedule over per-host ADMITTED counts
        # (a tiny Ray aggregate — one row per host), replayed through the
        # same round loop as the scheduler so the two paths report (and in
        # "enforce" mode, execute) the identical admission schedule.
        from ray.data.aggregate import Count

        host_counts_df = (frontier.groupby("host")
                          .aggregate(Count(alias_name="n")).to_pandas())
        gate = PolitenessGate(rate_per_second=cfg.host_rate, burst=cfg.host_burst,
                              ticks_per_second=cfg.ticks_per_second)
        for host, (rate, burst) in (gate_overrides or {}).items():
            gate.set_host_rate(host, rate, burst)
        steps, wait_ticks = _grant_schedule(
            dict(zip(host_counts_df["host"], host_counts_df["n"])), gate)
        counters["politeness_wait_ticks"] = wait_ticks
        counters["politeness_mode"] = politeness
        if politeness == "enforce":
            # per-row granted tick: within-host rank in the scheduler's
            # admission order (priority desc, order_key) → the grant step
            # covering that rank. One keyed shuffle; ``steps`` is O(hosts ×
            # rounds) and broadcast with the task closure. The schedule is a
            # separate output (the fetch input is untouched, so reports stay
            # byte-identical across modes); in virtual-tick land executing
            # the schedule IS this assignment — there is no wall clock.
            def _assign(g: pd.DataFrame) -> pd.DataFrame:
                ticks, cums = steps[g["host"].iloc[0]]
                order = np.lexsort((g["order_key"].to_numpy(),
                                    -g["priority"].to_numpy()))
                ranks = np.empty(len(g), dtype=np.int64)
                ranks[order] = np.arange(len(g))
                return pd.DataFrame({
                    "order_key": g["order_key"],
                    "host": g["host"],
                    "url_sha1": g["url_sha1"],
                    "grant_tick": ticks[np.searchsorted(cums, ranks, side="right")],
                })

            schedule = (frontier.groupby("host")
                        .map_groups(_assign, batch_format="pandas")
                        .to_pandas())  # smoke-scale inspection contract; at
            # scale this would be written to parquet by the workers

    decoded = stage2.fetch_decode(frontier, f"{fdir}/corpus.parquet", cfg, concurrency=concurrency)
    long_ds = stage2.long_from_decoded(decoded)
    wide_ds = stage2.wide_from_long(long_ds)
    long_df = stage2.long_view(long_ds)
    wide_df = stage2.wide_view(wide_ds)
    counters["long_rows"] = len(long_df)
    counters["wide_rows"] = len(wide_df)
    out = {"long": long_df, "wide": wide_df, "counters": counters}
    if schedule is not None:
        out["schedule"] = schedule
    if return_frontier:
        # smoke-scale inspection contract only — ships the whole admitted
        # frontier to the driver, so it is opt-in (VERDICT r02 §5)
        out["frontier"] = frontier.to_pandas()
    return out
