"""Ray-free memory-bandwidth probe for the full-node (8v32) scaling residual.

The 8-vs-32 wall pair on this single VM reads below the 4-vs-16 pair, and
BASELINE.md attributes the residual to the NODE's shared memory bandwidth
(per-URL CPU inflates as cores fill), not to the engine. This tool makes
that attribution a measurement instead of an inference:

  - K plain ``multiprocessing`` (fork) workers, NO Ray, no object store,
    no shuffles, no IPC during the timed region;
  - every worker runs the IDENTICAL fixed work: the engine's real per-URL
    kernel (``codecs.decode_image`` + ``codecs.phash64``) over its own
    private copy of the payload list;
  - per-worker wall is measured inside the worker, start-synchronized via
    a Barrier so all K are concurrent.

With fixed work per worker, per-worker wall should be FLAT in K on a
machine with private memory channels per core group (i.e. a real cluster,
where 4N cores arrive with 4N memory controllers). Any inflation at K=32
vs K=8 on this VM is contention in the shared DRAM/hypervisor layer that
NO arrangement of this pipeline's code can remove — the engine's decode is
the workload, verbatim.

Usage:  PYTHONPATH=/root/repo python tools/bandwidth_probe.py
Prints one JSON line: per-K median/percentile worker walls + inflation
ratios (K=32 median over K=8 median).
"""

from __future__ import annotations

import json
import multiprocessing as mp
import statistics
import sys
import time

N_PAYLOADS = 400     # distinct payloads per worker (private copies)
N_DECODES = 12_000   # fixed decode count per worker, payloads cycled


def _load_payloads() -> list[bytes]:
    import pyarrow.parquet as pq

    from cninfo_crawler_ray.sources.corpus import fixture_dir

    from cninfo_crawler_ray.functions import codecs

    # the web-size fixture — the same corpus the scaling runs decode
    path = f"{fixture_dir(50_000, sizes='web')}/corpus.parquet"
    t = pq.read_table(path, columns=["bytes"])
    col = t["bytes"].combine_chunks()
    out: list[bytes] = []
    for i in range(len(col)):
        b = col[i].as_py()
        try:  # the corpus plants undecodable rows on purpose (lying-format
            codecs.decode_image(b)  # fixtures); the probe times decodes only
        except Exception:
            continue
        out.append(b)
        if len(out) == N_PAYLOADS:
            break
    return out


def _worker(payloads: list[bytes], barrier, out_q) -> None:
    from cninfo_crawler_ray.functions import codecs

    # private copies: no shared read-only pages, so each worker generates
    # its own DRAM traffic exactly like K fetch actors decoding K streams
    mine = [bytes(p) for p in payloads]
    # warm one decode (imports, first-call jit-ish costs) before the barrier
    px, _, _ = codecs.decode_image(mine[0])
    codecs.phash64(px)
    barrier.wait()
    t0 = time.perf_counter()
    acc = 0
    for i in range(N_DECODES):
        px, _fmt, _meta = codecs.decode_image(mine[i % len(mine)])
        acc ^= codecs.phash64(px)
    wall = time.perf_counter() - t0
    out_q.put((wall, acc))


def run_k(k: int, payloads: list[bytes]) -> dict:
    ctx = mp.get_context("fork")
    barrier = ctx.Barrier(k)
    out_q = ctx.Queue()
    procs = [ctx.Process(target=_worker, args=(payloads, barrier, out_q))
             for _ in range(k)]
    for p in procs:
        p.start()
    walls = sorted(out_q.get()[0] for _ in range(k))
    for p in procs:
        p.join()
    return {
        "k": k,
        "worker_wall_median_s": round(statistics.median(walls), 3),
        "worker_wall_p10_s": round(walls[max(0, int(0.1 * k) - 1)], 3),
        "worker_wall_p90_s": round(walls[min(k - 1, int(0.9 * k))], 3),
        "aggregate_decodes_per_s": round(k * N_DECODES /
                                         statistics.median(walls), 1),
    }


N_URLS_STORE = 16_384  # URLs per worker in --store mode (~64 row groups)
STORE_BATCH = 256      # matches cfg.fetch_batch_size on the web preset


def _store_worker(widx: int, barrier, out_q) -> None:
    """--store mode: the FULL fused per-batch path — CorpusStore.get_views
    (row-group prune + parquet decompress + Arrow alignment) followed by
    decode — exactly what a FetchDecode actor does per batch, minus Ray.
    Each worker walks a DISTINCT contiguous id range (the locality-sorted
    layout the real pipeline feeds its actors), so K workers decompress K
    disjoint row-group streams concurrently. get_views and decode are timed
    separately to localize any inflation."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from cninfo_crawler_ray.functions import codecs
    from cninfo_crawler_ray.sources.corpus import fixture_dir
    from cninfo_crawler_ray.sources.store import CorpusStore

    pa.set_cpu_count(1)       # the per-actor Arrow thread cap the real
    pa.set_io_thread_count(1)  # store applies inside Ray workers
    path = f"{fixture_dir(50_000, sizes='web')}/corpus.parquet"
    ids = pq.read_table(path, columns=["image_id"])["image_id"].to_pylist()
    ids.sort()
    start = (widx * 7919) % len(ids)
    urls = [f"http://corpus/{ids[(start + i) % len(ids)]}.png"
            for i in range(N_URLS_STORE)]
    store = CorpusStore(path)
    store.get_views(urls[:STORE_BATCH])  # warm: imports + first read
    barrier.wait()
    t_store = t_decode = 0.0
    acc = 0
    for off in range(0, N_URLS_STORE, STORE_BATCH):
        b = urls[off:off + STORE_BATCH]
        t0 = time.perf_counter()
        status, _ctype, views, keep = store.get_views(b)
        t1 = time.perf_counter()
        for s, v in zip(status, views):
            if s != 200 or not v:
                continue
            try:
                px, _, _ = codecs.decode_image(v)
            except Exception:
                continue
            acc ^= codecs.phash64(px)
        t2 = time.perf_counter()
        del views, keep
        t_store += t1 - t0
        t_decode += t2 - t1
    out_q.put((t_store + t_decode, (t_store, t_decode, acc)))


def run_store_k(k: int) -> dict:
    ctx = mp.get_context("fork")
    barrier = ctx.Barrier(k)
    out_q = ctx.Queue()
    procs = [ctx.Process(target=_store_worker, args=(w, barrier, out_q))
             for w in range(k)]
    for p in procs:
        p.start()
    res = [out_q.get() for _ in range(k)]
    for p in procs:
        p.join()
    walls = sorted(r[0] for r in res)
    stores = sorted(r[1][0] for r in res)
    decodes = sorted(r[1][1] for r in res)
    return {
        "k": k,
        "worker_wall_median_s": round(statistics.median(walls), 3),
        "store_median_s": round(statistics.median(stores), 3),
        "decode_median_s": round(statistics.median(decodes), 3),
        "aggregate_urls_per_s": round(k * N_URLS_STORE /
                                      statistics.median(walls), 1),
    }


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--store"]
    ks = [int(x) for x in args] or [1, 8, 32]
    if "--store" in sys.argv[1:]:
        results = [run_store_k(k) for k in ks]
        by_k = {r["k"]: r for r in results}
        out = {"metric": "Ray-free fixed-work store+decode wall per worker",
               "n_urls_per_worker": N_URLS_STORE, "runs": results}
        if 8 in by_k and 32 in by_k:
            out["inflation_32_over_8"] = round(
                by_k[32]["worker_wall_median_s"] /
                by_k[8]["worker_wall_median_s"], 3)
            out["inflation_store_32_over_8"] = round(
                by_k[32]["store_median_s"] / by_k[8]["store_median_s"], 3)
            out["inflation_decode_32_over_8"] = round(
                by_k[32]["decode_median_s"] / by_k[8]["decode_median_s"], 3)
        print(json.dumps(out))
        return
    payloads = _load_payloads()
    results = [run_k(k, payloads) for k in ks]
    by_k = {r["k"]: r for r in results}
    out = {"metric": "Ray-free fixed-work decode wall per worker",
           "n_decodes_per_worker": N_DECODES,
           "runs": results}
    if 8 in by_k and 32 in by_k:
        out["inflation_32_over_8"] = round(
            by_k[32]["worker_wall_median_s"] /
            by_k[8]["worker_wall_median_s"], 3)
    if 1 in by_k and 8 in by_k:
        out["inflation_8_over_1"] = round(
            by_k[8]["worker_wall_median_s"] /
            by_k[1]["worker_wall_median_s"], 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
