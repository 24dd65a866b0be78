#!/usr/bin/env python
"""Benchmark harness.

Headline metric: sustained fetch+decode throughput (URLs/s) over the
synthetic image+caption corpus at the scale mapped from $GRAFT_SF_DIR
(BASELINE.json metric), plus per-query wall times for representative
operator-family pipelines over the sf tables.

Prints ONE JSON line:
  {"metric": ..., "value": <headline seconds>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "num_cpus": N, "urls_per_sec": ...}

--scaling: runs the SAME job in two fresh processes (num_cpus=8 and =32 —
the sandbox substitute for N- and 4N-node clusters, SURVEY.md §4.3) and
reports both throughputs plus the scaling efficiency (T8/T32)/4.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def run_bench() -> dict:
    import ray

    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    from cninfo_crawler_ray.config import CrawlConfig
    from cninfo_crawler_ray.pipelines import queries as Q
    from cninfo_crawler_ray.pipelines import stage1, stage2
    from cninfo_crawler_ray.sources.corpus import ensure_fixtures, scale_for_sf_dir

    # fixtures: built once (Ray-parallel) and cached in /tmp; untimed so the
    # timed sections measure compute+shuffle, not generation.
    n_images = scale_for_sf_dir(sf_dir)
    fdir = ensure_fixtures(n_images)
    corpus_path = f"{fdir}/corpus.parquet"
    # warm the page cache (one untimed metadata+column sweep)
    import pyarrow.parquet as pq

    pq.read_table(corpus_path, columns=["image_id", "fmt"])

    cfg = CrawlConfig(
        fetch_actors=(2, max(num_cpus // 2, 2)),
        decode_actors=(2, max(num_cpus // 2, 2)),
    )
    times: dict[str, float] = {}
    extra: dict[str, float] = {}

    # --- stage 1: seeds → frontier ---
    t0 = time.perf_counter()
    frontier = stage1.build_frontier(fdir, cfg).materialize()
    n_frontier = frontier.count()
    times["crawl_frontier"] = round(time.perf_counter() - t0, 3)
    extra["frontier_rows"] = n_frontier

    # --- headline: fetch+decode over the frontier ---
    t0 = time.perf_counter()
    decoded = stage2.fetch_decode(frontier, corpus_path, cfg).materialize()
    n_valid = decoded.map_batches(
        lambda t: t.select(["type_ok"]), batch_format="pyarrow"
    ).sum("type_ok")
    headline = time.perf_counter() - t0
    times["fetch_decode"] = round(headline, 3)
    extra["validated_urls"] = int(n_valid)
    extra["urls_per_sec"] = round(n_frontier / headline, 1)

    # --- long/wide reductions ---
    t0 = time.perf_counter()
    wide = stage2.wide_from_long(stage2.long_from_decoded(decoded))
    n_wide = wide.count()
    times["wide_report"] = round(time.perf_counter() - t0, 3)
    extra["wide_rows"] = n_wide

    # --- operator-family queries over the sf tables ---
    for name, fn in [
        ("pricing_summary", Q.q_pricing_summary),
        ("latest_order_per_customer", Q.q_latest_order_per_customer),
        ("minhash_lsh_dedup", Q.q_minhash_lsh_dedup),
        ("ann_topk", Q.q_ann_topk),
        ("sessionize", Q.q_sessionize),
    ]:
        t0 = time.perf_counter()
        res = fn(sf_dir)
        if hasattr(res, "to_pandas"):
            res.to_pandas()
        times[name] = round(time.perf_counter() - t0, 3)

    ray.shutdown()
    return {
        "metric": "fetch+decode wall time over the image+caption frontier",
        "value": times["fetch_decode"],
        "unit": "sec",
        "queries": times,
        "sf": sf_dir,
        "num_cpus": num_cpus,
        **extra,
    }


def run_scaling() -> dict:
    """Same job, same input, fresh processes at 8 and 32 CPUs."""
    def one(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo, hi = 8, 32
    r_lo, r_hi = one(lo), one(hi)
    t_lo, t_hi = r_lo["value"], r_hi["value"]
    eff = (t_lo / t_hi) / (hi / lo)
    return {
        "metric": "scaling efficiency, fetch+decode, 8 vs 32 CPUs",
        "sec_8": t_lo,
        "sec_32": t_hi,
        "urls_per_sec_8": r_lo.get("urls_per_sec"),
        "urls_per_sec_32": r_hi.get("urls_per_sec"),
        "scaling_efficiency": round(eff, 3),
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
