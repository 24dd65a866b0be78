"""Round-based scheduler conformance: heap-frontier waves + politeness must
reproduce the batch pipeline's outputs exactly, at any wave size; the
frontier heap itself must pop in (priority desc, order_key asc) order and
survive snapshot/restore."""

import numpy as np
import pandas as pd
import pytest

from cninfo_crawler_ray.config import CrawlConfig
from cninfo_crawler_ray.pipelines import crawl, scheduler
from cninfo_crawler_ray.sources import corpus as C
from cninfo_crawler_ray.state.frontier import FrontierShard, ShardedFrontier
from cninfo_crawler_ray.state.politeness import PolitenessGate

N = 800


@pytest.fixture(scope="module")
def fixture_dir(ray_session):
    return C.ensure_fixtures(N, n_days=3, use_ray=False)


def _mini_df(n=20, hosts=2):
    rng = np.random.default_rng(7)
    pri = rng.random(n) * 10
    return pd.DataFrame(
        {
            "PDF链接": [f"https://h{i % hosts}.x/img_{i:08d}.raw" for i in range(n)],
            "url_sha1": [f"{rng.integers(0, 2**32):08x}{'0'*32}" for _ in range(n)],
            "host": [f"h{i % hosts}.x" for i in range(n)],
            "priority": pri,
            "order_key": np.arange(n, dtype=np.int64),
        }
    )


def test_shard_pops_priority_then_order():
    sh = FrontierShard()
    df = _mini_df(30)
    sh.push(list(df.columns), df.values.tolist())
    cols, rows = sh.pop_top(30)
    got = pd.DataFrame(rows, columns=cols)
    want = df.sort_values(["priority", "order_key"], ascending=[False, True])
    assert list(got["order_key"]) == list(want["order_key"])


def test_sharded_pop_is_global_topk():
    fr = ShardedFrontier(4, use_actors=False)
    df = _mini_df(50)
    fr.push_pandas(df)
    top = fr.pop_top(10)
    want = df.sort_values(["priority", "order_key"], ascending=[False, True]).head(10)
    assert list(top["order_key"]) == list(want["order_key"])
    assert fr.total() == 40  # remainder went back


def test_snapshot_restore_roundtrip():
    fr = ShardedFrontier(2, use_actors=False)
    df = _mini_df(12)
    fr.push_pandas(df)
    blobs = fr.snapshot()
    fr2 = ShardedFrontier(2, use_actors=False)
    fr2.restore(blobs)
    a = fr.pop_top(12).reset_index(drop=True)
    b = fr2.pop_top(12).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_pop_admissible_respects_budget_and_returns_denied():
    fr = ShardedFrontier(2, use_actors=False)
    df = _mini_df(20, hosts=1)  # single host: budget binds
    fr.push_pandas(df)
    gate = PolitenessGate(rate_per_second=10.0, burst=5, ticks_per_second=10)
    wave = fr.pop_admissible(20, gate)
    assert len(wave) == 5  # burst only
    assert fr.total() == 15  # denied back on the heap
    # highest-priority rows won the grants
    want = df.sort_values(["priority", "order_key"], ascending=[False, True]).head(5)
    assert list(wave["order_key"]) == list(want["order_key"])
    # advance the clock → budget refills → next wave succeeds
    gate.advance(10)
    wave2 = fr.pop_admissible(20, gate)
    assert len(wave2) > 0


def test_heap_never_compares_row_payloads():
    """Equal (priority, order_key) entries with None-containing payloads must
    not raise TypeError — the monotonic insertion counter breaks the tie
    before the heap reaches the row lists (ADVICE r01)."""
    sh = FrontierShard()
    cols = ["priority", "order_key", "url_sha1", "extra"]
    sh.push(cols, [[1.0, 7, "aa" + "0" * 38, None], [1.0, 7, "bb" + "0" * 38, {"d": 1}]])
    _, rows = sh.pop_top(2)
    assert len(rows) == 2


def test_pop_roundtrip_preserves_dtypes():
    fr = ShardedFrontier(2, use_actors=False)
    df = _mini_df(8).assign(
        partition_id=np.arange(8, dtype=np.int32),
        flag=np.array([0, 1] * 4, dtype=np.int64),
    )
    fr.push_pandas(df)
    out = fr.pop_top(8)
    assert str(out["partition_id"].dtype) == "int32"
    assert str(out["priority"].dtype) == "float64"
    # snapshot/restore keeps the dtype map too
    fr.push_pandas(df)
    fr2 = ShardedFrontier(2, use_actors=False)
    fr2.restore(fr.snapshot())
    assert str(fr2.pop_top(8)["partition_id"].dtype) == "int32"


def test_pop_admissible_robots_dead_letter():
    """Robots-disallowed URLs are dead-lettered (never fetched, never
    requeued); allowed URLs proceed through the budget (ADVICE r01: the gate
    must actually be consulted on the fetch path)."""
    fr = ShardedFrontier(2, use_actors=False)
    df = _mini_df(10, hosts=2)  # h0.x and h1.x, paths /img_XXXX.raw
    fr.push_pandas(df)
    gate = PolitenessGate(rate_per_second=100.0, burst=100)
    gate.set_robots("h0.x", ["/img_"])  # everything on h0 disallowed
    wave = fr.pop_admissible(10, gate)
    assert set(wave["host"]) == {"h1.x"}
    assert len(wave) == 5
    assert fr.total() == 0  # h0 rows did NOT go back on the heap
    dead = pd.concat(fr.dead_letters)
    assert len(dead) == 5 and set(dead["host"]) == {"h0.x"}
    assert (dead["_dead_reason"] == "robots").all()


def test_pop_admissible_zero_rate_host_dead_letters():
    """A host with zero refill rate and an exhausted bucket can never be
    granted — its rows are dead-lettered instead of spinning the scheduler
    forever (ADVICE r01 empty-wave loop)."""
    fr = ShardedFrontier(2, use_actors=False)
    df = _mini_df(10, hosts=1)
    fr.push_pandas(df)
    gate = PolitenessGate(rate_per_second=100.0, burst=100)
    gate.set_host_rate("h0.x", 0.0, 4)  # 4 grants then never again
    wave = fr.pop_admissible(10, gate)
    assert len(wave) == 4
    assert fr.total() == 0
    dead = pd.concat(fr.dead_letters)
    assert len(dead) == 6 and (dead["_dead_reason"] == "zero_rate_host").all()


def test_scheduled_crawl_with_robots_and_slow_host(fixture_dir):
    """E2E: robots rules drop matching URLs from the outputs; a throttled
    host only stretches the virtual schedule (results identical)."""
    base = scheduler.run_scheduled_crawl(
        fixture_dir, wave_size=200, use_actors=False, concurrency=1
    )
    hosts = sorted({u.split("/")[2] for u in base["wide"]["PDF链接"]})
    blocked = hosts[0]
    rob = scheduler.run_scheduled_crawl(
        fixture_dir, wave_size=200, use_actors=False, concurrency=1,
        robots={blocked: ["/"]},
    )
    assert rob["counters"]["robots_denied"] > 0
    assert not any(u.split("/")[2] == blocked for u in rob["wide"]["PDF链接"])
    want = base["wide"][
        base["wide"]["PDF链接"].map(lambda u: u.split("/")[2] != blocked)
    ].reset_index(drop=True)
    pd.testing.assert_frame_equal(rob["wide"], want)

    slow = scheduler.run_scheduled_crawl(
        fixture_dir, wave_size=200, use_actors=False, concurrency=1,
        gate_overrides={hosts[1]: (5.0, 10)},  # 10-burst, 0.5/tick refill
    )
    assert slow["counters"]["politeness_wait_ticks"] > 0
    pd.testing.assert_frame_equal(slow["long"], base["long"])
    pd.testing.assert_frame_equal(slow["wide"], base["wide"])


def test_kill_resume_byte_identical(fixture_dir, tmp_path):
    """North rule: kill after ≥1 checkpointed round, resume, and the final
    long/wide tables are byte-identical to an uninterrupted run."""
    cfg = CrawlConfig()
    full = scheduler.run_scheduled_crawl(
        fixture_dir, cfg, wave_size=97, use_actors=False, concurrency=1
    )
    ck = str(tmp_path / "ck")
    killed = scheduler.run_scheduled_crawl(
        fixture_dir, cfg, wave_size=97, use_actors=False, concurrency=1,
        ckpt_dir=ck, max_rounds=3
    )
    assert killed["counters"]["rounds"] == 3
    assert len(killed["long"]) < len(full["long"])  # genuinely interrupted
    resumed = scheduler.run_scheduled_crawl(
        fixture_dir, cfg, wave_size=97, use_actors=False, concurrency=1,
        ckpt_dir=ck
    )
    assert resumed["counters"]["rounds"] > 3
    pd.testing.assert_frame_equal(resumed["long"], full["long"])
    pd.testing.assert_frame_equal(resumed["wide"], full["wide"])


def test_scheduled_equals_batch_pipeline(fixture_dir):
    """The round-based scheduler must produce byte-identical long/wide
    tables to the batch path, at a wave size that forces many rounds.
    Both paths use seen-set admission (duplicate URLs across stock codes
    are admitted once — the scheduler's frontier is URL-keyed)."""
    batch = crawl.run_crawl(N, use_state_actors=True)
    cfg = CrawlConfig()
    sched = scheduler.run_scheduled_crawl(
        fixture_dir, cfg, wave_size=97, use_actors=False, concurrency=1
    )
    assert sched["counters"]["rounds"] > 3
    pd.testing.assert_frame_equal(sched["long"], batch["long"])
    pd.testing.assert_frame_equal(sched["wide"], batch["wide"])


def test_kill_between_round_commit_and_state_flush(fixture_dir, tmp_path):
    """ADVICE r02: a kill AFTER round N's directory rename but BEFORE the
    state.pkl flush leaves round_N committed while state says N-1; the
    resume recomputes round N (deterministic) and must overwrite the stale
    dir rather than crash with ENOTEMPTY on os.replace."""
    import os
    import shutil

    cfg = CrawlConfig()
    full = scheduler.run_scheduled_crawl(
        fixture_dir, cfg, wave_size=97, use_actors=False, concurrency=1
    )
    ck = str(tmp_path / "ck")
    scheduler.run_scheduled_crawl(
        fixture_dir, cfg, wave_size=97, use_actors=False, concurrency=1,
        ckpt_dir=ck, max_rounds=3
    )
    # simulate the kill window: round 4's dir exists (committed, non-empty
    # marker file inside) but state still says rounds=3
    stale = os.path.join(ck, "rounds", "round_00004")
    os.makedirs(stale)
    with open(os.path.join(stale, "part-0.parquet"), "wb") as f:
        f.write(b"stale-garbage")  # non-empty → os.replace would ENOTEMPTY
    resumed = scheduler.run_scheduled_crawl(
        fixture_dir, cfg, wave_size=97, use_actors=False, concurrency=1,
        ckpt_dir=ck
    )
    pd.testing.assert_frame_equal(resumed["long"], full["long"])
    pd.testing.assert_frame_equal(resumed["wide"], full["wide"])
    shutil.rmtree(ck)
