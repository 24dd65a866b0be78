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

    counters = {"frontier_rows": frontier.count()}
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

        # politeness (T3): per-host grant schedule in virtual ticks over the
        # per-host ADMITTED counts (a tiny Ray aggregate — one row per host).
        # All admissions are granted eventually; the gate reports how many
        # ticks the budget stretches the schedule by.
        from ray.data.aggregate import Count

        host_counts = (frontier.groupby("host")
                       .aggregate(Count(alias_name="n")).to_pandas())
        gate = PolitenessGate(rate_per_second=cfg.host_rate, burst=cfg.host_burst,
                              ticks_per_second=cfg.ticks_per_second)
        wait_ticks = 0
        for host, cnt in zip(host_counts["host"], host_counts["n"]):
            remaining = int(cnt)
            while remaining > 0:
                got = gate.acquire(host, remaining)
                remaining -= got
                if remaining > 0:
                    w = gate.wait_ticks_for(host, 1)
                    wait_ticks += w
                    gate.advance(max(w, 1))
        counters["politeness_wait_ticks"] = wait_ticks

    decoded = stage2.fetch_decode(frontier, f"{fdir}/corpus.parquet", cfg, concurrency=concurrency)
    long_ds = stage2.long_from_decoded(decoded)
    wide_ds = stage2.wide_from_long(long_ds)
    long_df = stage2.long_view(long_ds)
    wide_df = stage2.wide_view(wide_ds)
    counters["long_rows"] = len(long_df)
    counters["wide_rows"] = len(wide_df)
    # smoke-scale result contract: the admitted frontier as a pandas frame
    # (entry() and tests consume long/wide; this frame is for inspection)
    fdf = frontier.to_pandas()
    return {"frontier": fdf, "long": long_df, "wide": wide_df, "counters": counters}
