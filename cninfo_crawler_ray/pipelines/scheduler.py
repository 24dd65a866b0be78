"""Round-based crawl scheduler: heap frontier → politeness-admissible waves
→ fused fetch+decode → long/wide reports.

This is the streaming-shaped execution of the flagship crawl (SURVEY.md
§7.6): instead of handing the whole frontier to one Dataset pipeline
(``pipelines/crawl.run_crawl`` — the batch path), the scheduler drains the
**priority min-heap frontier shards** (state/frontier.py) one admissible
wave at a time:

    round:  frontier.pop_admissible(wave, politeness_gate)
            → ray.data.Dataset(wave) → fetch+decode (fused actor pool)
            → long rows accumulate per round
    until the frontier is empty (denied-by-politeness rows return to the
    heap and win a later round once their host budget refills; the gate
    advances virtual ticks between rounds, so the admission schedule is a
    pure function of (frontier contents, budget) — never wall clock).

Determinism: wave composition orders by (priority desc, order_key asc) and
the final outputs sort by canonical order, so the long/wide tables are
byte-identical to the batch path at ANY wave size, shard count, or
parallelism — asserted in tests/test_scheduler.py.

At 10^10-URL scale each round is one streaming execution over an
object-store-resident wave; rounds pipeline naturally (fetch of wave N
overlaps reduction of wave N-1 if the driver overlaps round submission).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data as rd

from ..config import CrawlConfig
from ..state.frontier import ShardedFrontier
from ..state.politeness import PolitenessGate
from ..state.seen import ShardedSeenSet
from . import stage1, stage2


def _ckpt_paths(ckpt_dir: str) -> tuple[str, str]:
    import os

    return os.path.join(ckpt_dir, "state.pkl"), os.path.join(ckpt_dir, "rounds")


def run_scheduled_crawl(
    fixture_dir: str,
    cfg: CrawlConfig | None = None,
    *,
    wave_size: int = 4096,
    concurrency=None,
    use_actors: bool = True,
    max_rounds: int = 10_000,
    ckpt_dir: str | None = None,
):
    """Returns dict with long/wide frames + counters (rounds, admissions,
    politeness waits). Ray must already be initialised by the caller.

    ``ckpt_dir`` enables checkpointed resume (north rule): after every round
    the completed rounds' long rows (parquet per round) plus snapshots of
    frontier heap shards, seen-set shards and the politeness gate's virtual
    clock are flushed atomically. A killed job rerun with the same
    ``ckpt_dir`` restores all three states, skips completed rounds'
    fetching entirely, and finishes with byte-identical outputs
    (tests/test_scheduler.py::test_kill_resume_byte_identical).
    ``max_rounds`` simulates the kill."""
    import os
    import pickle

    cfg = cfg or CrawlConfig()
    corpus_path = f"{fixture_dir}/corpus.parquet"

    gate = PolitenessGate(rate_per_second=cfg.host_rate, burst=cfg.host_burst,
                          ticks_per_second=cfg.ticks_per_second)
    fr = ShardedFrontier(cfg.seen_shards, use_actors=use_actors)
    long_parts: list[pd.DataFrame] = []
    counters = {"rounds": 0, "empty_waves": 0, "politeness_wait_ticks": 0}
    rounds = 0
    seen = ShardedSeenSet(cfg.seen_shards)

    state_path = rounds_dir = None
    if ckpt_dir:
        state_path, rounds_dir = _ckpt_paths(ckpt_dir)
        os.makedirs(rounds_dir, exist_ok=True)

    if state_path and os.path.exists(state_path):
        # resume: restore frontier/seen/gate + completed rounds
        with open(state_path, "rb") as f:
            st = pickle.loads(f.read())
        fr.restore(st["frontier"])
        seen.restore(st["seen"])
        gate.restore(st["gate"])
        rounds = st["rounds"]
        counters.update(st["counters"])
        fdf = st["frontier_df"]
        for r in range(1, rounds + 1):
            long_parts.append(pd.read_parquet(os.path.join(rounds_dir, f"round_{r:05d}.parquet")))
    else:
        frontier_ds = stage1.build_frontier(fixture_dir, cfg, concurrency=concurrency)
        fdf = frontier_ds.to_pandas()
        # seen-set admission (T2): exact, sharded, batch RPC
        keys = [bytes.fromhex(h) for h in fdf["url_sha1"]]
        is_new = seen.contains_and_add(keys, fdf["order_key"].tolist())
        fdf = fdf[np.array(is_new)].reset_index(drop=True)
        fr.push_pandas(fdf)
    counters["frontier_rows"] = len(fdf)

    while fr.total() > 0 and rounds < max_rounds:
        wave = fr.pop_admissible(wave_size, gate)
        if len(wave) == 0:
            # whole wave denied: advance the virtual clock so budgets refill
            gate.advance(1)
            counters["empty_waves"] += 1
            counters["politeness_wait_ticks"] += 1
            continue
        rounds += 1
        ds = rd.from_pandas(wave)
        decoded = stage2.fetch_decode(ds, corpus_path, cfg, concurrency=concurrency)
        long_parts.append(stage2.long_from_decoded(decoded).to_pandas())
        if ckpt_dir:
            # flush round data first, then the state that marks it complete
            p = os.path.join(rounds_dir, f"round_{rounds:05d}.parquet")
            long_parts[-1].to_parquet(p + ".tmp")
            os.replace(p + ".tmp", p)
            counters["rounds"] = rounds
            blob = pickle.dumps({
                "frontier": fr.snapshot(), "seen": seen.snapshot(),
                "gate": gate.snapshot(), "rounds": rounds,
                "counters": counters, "frontier_df": fdf,
            })
            with open(state_path + ".tmp", "wb") as f:
                f.write(blob)
            os.replace(state_path + ".tmp", state_path)
    counters["rounds"] = rounds

    if long_parts:
        long_df = pd.concat(long_parts, ignore_index=True)
    else:
        long_df = pd.DataFrame()
    if len(long_df):
        long_df = long_df.sort_values(["order_key", "_item"], kind="stable").reset_index(drop=True)
        wide_ds = stage2.wide_from_long(rd.from_pandas(long_df))
        wide_df = stage2.wide_view(wide_ds)
        from ..schemas import LONG_COLUMNS

        long_view = long_df[LONG_COLUMNS].reset_index(drop=True)
    else:
        wide_df = pd.DataFrame()
        long_view = long_df
    counters["long_rows"] = len(long_view)
    counters["wide_rows"] = len(wide_df)
    return {"long": long_view, "wide": wide_df, "counters": counters,
            "frontier": fdf, "seen_total": seen.total()}
