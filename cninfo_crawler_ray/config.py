"""Typed crawl configuration.

Elevates the reference's scattered module constants and magic numbers
(SURVEY.md §2.10, §4.2) into one config object. The politeness budget values
are the reference's implied envelope: 1 listing page / 0.3 s per stream
(cninfo_report_crawler.py:331), 10 concurrent validation probes (:479), 5
concurrent fetches (report_info_collection.py:633).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class CrawlConfig:
    # --- listing / pagination guards (cninfo_report_crawler.py) ---
    page_size: int = 30            # :197
    max_pages_limit: int = 500     # :263-267
    overrun_pages: int = 3         # stop at totalpages + 3   (:249-252)
    overrun_empty_stop: int = 2    # past totalpages + 2 consecutive empty (:254-257)
    max_empty_pages: int = 3       # 3 consecutive zero-novelty pages      (:317-326)

    # --- politeness budget (virtual ticks; 10 ticks == 1 s) ---
    ticks_per_second: int = 10
    listing_page_ticks: int = 3    # 0.3 s between listing pages (:331)
    validate_concurrency: int = 10  # ThreadPoolExecutor(10) analog (:479)
    fetch_concurrency: int = 5      # ThreadPoolExecutor(5) analog (report_info_collection.py:633)
    #: token-bucket refill per host, requests per second (fetch stage).
    host_rate: float = 1000.0
    host_burst: int = 2000

    # --- partitioning / state sharding ---
    num_partitions: int = 16       # url-sha1 hash-range checkpoint partitions
    seen_shards: int = 8           # seen-set actor shards
    #: bound on each frontier heap shard's in-memory rows; past it the
    #: low-priority tail spills to sorted parquet (pop order unchanged —
    #: state/frontier.py). None = unbounded (sandbox default; a 10^10-URL
    #: run sets this to O(10^6) per shard).
    frontier_spill_rows: int | None = None
    num_hosts: int = 8             # synthetic host universe (hot host 0)
    #: hash buckets for the grouped reductions (A2/A3, A5/A6). Each bucket is
    #: one vectorized map_groups call covering MANY logical keys — per-group
    #: Python overhead stays O(buckets), not O(distinct keys). On a cluster,
    #: size ≈ 2-4 × total cores so buckets spread evenly.
    reduce_buckets: int = 32

    # --- Ray Data stage sizing ---
    listing_batch_size: int = 1        # seeds per listing task — one stream
                                       # is the parallel unit (its page loop
                                       # is inherently sequential)
    probe_batch_size: int = 4096       # HEAD-analog probe rows per batch
    #: GET-fallback on ambiguous HEADs (reference C:146-150): sniff the first
    #: 1 KB's container magic when HEAD metadata contradicts the URL ext.
    #: Off by default — HEAD-trust is the reference's primary rule.
    probe_sniff_magic: bool = False
    fetch_batch_size: int = 512        # binary payload rows per batch (bytes are KB-MB each)
    decode_batch_size: int = 256
    fetch_actors: tuple[int, int] = (1, 8)
    decode_actors: tuple[int, int] = (1, 8)
    #: sort the admitted wave by content key before fetch so each batch hits
    #: a contiguous store range (per-shard request coalescing).
    fetch_locality: bool = True
    #: run fetch+decode as ONE actor stage so payload bytes never transit
    #: the object store (measured 354 CPU-s of kernel mmap/memcpy per
    #: 198 CPU-s of compute when staged separately). Disable to get the
    #: two-pool layout (e.g. when fetch must be IO-bound-async while decode
    #: saturates CPUs).
    fuse_fetch_decode: bool = True
    #: CPUs reserved per stage actor. Fractional so the MINIMUM reservations
    #: of all concurrent pools never exceed the cluster and deadlock the
    #: streaming executor (each pool pre-reserves min_actors × num_cpus);
    #: autoscaling grows pools into idle CPUs when a stage is the bottleneck.
    actor_num_cpus: float = 0.5
    #: fault-injection hook (tests only): while a file exists at this path,
    #: every FetchDecode batch raises — simulating a worker dying mid-stream
    #: so stream-close-on-error + resume-after-error semantics are testable
    #: deterministically (tests/test_scheduler.py). The path travels to the
    #: actor via its constructor args, so it works across worker processes.
    fault_inject_path: str | None = None

    # --- report-type config (J2; cninfo_report_crawler.py:24-29) ---
    report_type: str = "ndbg"
    categories: tuple[str, ...] = field(default=("category_ndbg_szsh",))


DEFAULT_CONFIG = CrawlConfig()
