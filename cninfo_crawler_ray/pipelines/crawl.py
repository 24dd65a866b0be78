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

import ray.data as rd

from ..config import CrawlConfig
from ..sources import corpus as fixtures
from ..state.politeness import PolitenessGate
from ..state.seen import ShardedSeenSet
from . import stage1, stage2


def run_crawl(
    n_images: int = 1_000,
    cfg: CrawlConfig | None = None,
    *,
    use_state_actors: bool = True,
    concurrency=None,
):
    """Returns dict with frontier/long/wide pandas frames + crawl counters.

    ``use_state_actors=False`` skips the actor admission path (the frontier
    is already exactly deduplicated by construction) — used by bench to
    isolate fetch+decode throughput."""
    cfg = cfg or CrawlConfig()
    fdir = fixtures.ensure_fixtures(n_images)
    frontier = stage1.build_frontier(fdir, cfg, concurrency=concurrency).materialize()
    fdf = frontier.to_pandas()

    counters = {"frontier_rows": len(fdf)}
    if use_state_actors and len(fdf):
        # URL-seen admission (T2): keys are sha1 bytes; duplicates (none
        # expected post-A3 — the assertion is the point) are skipped.
        seen = ShardedSeenSet(cfg.seen_shards)
        keys = [bytes.fromhex(h) for h in fdf["url_sha1"]]
        is_new = seen.contains_and_add(keys, fdf["order_key"].tolist())
        fdf = fdf[np.array(is_new)]
        counters["seen_admitted"] = int(np.sum(is_new))
        counters["seen_total"] = seen.total()

        # politeness (T3): per-host grant schedule in virtual ticks. All
        # admissions are granted eventually; the gate reports how many ticks
        # the budget stretches the schedule by.
        gate = PolitenessGate(rate_per_second=cfg.host_rate, burst=cfg.host_burst,
                              ticks_per_second=cfg.ticks_per_second)
        wait_ticks = 0
        for host, cnt in fdf["host"].value_counts().items():
            remaining = int(cnt)
            while remaining > 0:
                got = gate.acquire(host, remaining)
                remaining -= got
                if remaining > 0:
                    w = gate.wait_ticks_for(host, 1)
                    wait_ticks += w
                    gate.advance(max(w, 1))
        counters["politeness_wait_ticks"] = wait_ticks
        frontier = rd.from_pandas(fdf) if len(fdf) else frontier

    decoded = stage2.fetch_decode(frontier, f"{fdir}/corpus.parquet", cfg, concurrency=concurrency)
    long_ds = stage2.long_from_decoded(decoded)
    wide_ds = stage2.wide_from_long(long_ds)
    long_df = stage2.long_view(long_ds)
    wide_df = stage2.wide_view(wide_ds)
    counters["long_rows"] = len(long_df)
    counters["wide_rows"] = len(wide_df)
    return {"frontier": fdf, "long": long_df, "wide": wide_df, "counters": counters}
