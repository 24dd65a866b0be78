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
