"""Standalone unit tests for the stateful components (SURVEY.md §7.5):
cuckoo-fronted seen shards, politeness token bucket, metrics, corpus store."""

import hashlib

import pytest

from cninfo_crawler_ray.state.metrics import Metrics
from cninfo_crawler_ray.state.politeness import PolitenessGate
from cninfo_crawler_ray.state.seen import CuckooFilter, SeenShard


def _keys(n, prefix="k"):
    return [hashlib.sha1(f"{prefix}{i}".encode()).digest() for i in range(n)]


def test_cuckoo_no_false_negatives():
    cf = CuckooFilter(1 << 12)
    keys = _keys(2000)
    for k in keys:
        cf.add(k)
    assert all(cf.contains(k) for k in keys)  # cuckoo never false-negatives
    fresh = _keys(2000, "other")
    fp = sum(cf.contains(k) for k in fresh)
    assert fp < 400  # false positives bounded (exact set absorbs them anyway)


def test_cuckoo_remove():
    cf = CuckooFilter(1 << 8)
    keys = _keys(50)
    for k in keys:
        cf.add(k)
    for k in keys[:25]:
        assert cf.remove(k)
    # removed keys may still collide with other fingerprints; just check add/remove balance
    assert cf.count == 25


def test_seen_shard_exactness():
    sh = SeenShard(0, 1 << 10)
    keys = _keys(5000)
    out1 = sh.contains_and_add(keys, list(range(5000)))
    assert all(out1)
    out2 = sh.contains_and_add(keys)
    assert not any(out2)
    assert sh.size() == 5000
    assert sh.high_water_seq == 4999
    # permutation invariance of the final set (SURVEY.md §5.3)
    sh2 = SeenShard(0, 1 << 10)
    import random

    perm = keys[:]
    random.Random(7).shuffle(perm)
    sh2.contains_and_add(perm)
    assert sh2.exact == sh.exact


def test_seen_shard_snapshot_roundtrip():
    sh = SeenShard(3, 1 << 8)
    keys = _keys(300)
    sh.contains_and_add(keys, list(range(300)))
    blob = sh.snapshot()
    sh2 = SeenShard()
    sh2.restore(blob)
    assert sh2.shard_id == 3
    assert sh2.size() == 300
    assert not any(sh2.contains_and_add(keys))
    assert sh2.high_water_seq == 299


def test_seen_shard_discard():
    sh = SeenShard(0)
    keys = _keys(10)
    sh.contains_and_add(keys)
    sh.discard(keys[:5])
    assert sh.size() == 5
    assert all(sh.contains_and_add(keys[:5]))  # re-addable after retraction


def test_politeness_grants_are_deterministic():
    g = PolitenessGate(rate_per_second=10, burst=5, ticks_per_second=10)
    # burst drains first
    assert g.acquire("h", 3) == 3
    assert g.acquire("h", 5) == 2
    assert g.acquire("h", 1) == 0
    # refill: 1 token/tick at rate 10/s with 10 ticks/s
    g.advance(3)
    assert g.acquire("h", 5) == 3
    # independent hosts
    assert g.acquire("other", 2) == 2
    # replaying the same sequence gives the same grants (pure of wall-clock)
    g2 = PolitenessGate(rate_per_second=10, burst=5, ticks_per_second=10)
    seq = [g2.acquire("h", 3), g2.acquire("h", 5), g2.acquire("h", 1)]
    g2.advance(3)
    seq.append(g2.acquire("h", 5))
    assert seq == [3, 2, 0, 3]


def test_politeness_reference_budget():
    # the reference listing budget: 1 page / 0.3 s (cninfo_report_crawler.py:331)
    g = PolitenessGate(ticks_per_second=10)
    g.set_host_rate("listing.example.test", rate_per_second=1 / 0.3, burst=1)
    assert g.acquire("listing.example.test", 1) == 1
    assert g.acquire("listing.example.test", 1) == 0
    assert g.wait_ticks_for("listing.example.test", 1) == 3  # 0.3 s
    g.advance(3)
    assert g.acquire("listing.example.test", 1) == 1


def test_robots():
    g = PolitenessGate()
    g.set_robots("h", ["/private/", "/tmp"])
    assert g.allowed("h", ["/a", "/private/x", "/tmpfile"]) == [True, False, False]
    assert g.allowed("unknown", ["/x"]) == [True]


def test_metrics():
    m = Metrics()
    m.inc({"fetched": 5, "bytes": 100}, partition_id=2)
    m.inc({"fetched": 3}, partition_id=2)
    m.inc({"fetched": 1})
    assert m.get_all() == {"fetched": 9, "bytes": 100}
    assert m.get_partition(2) == {"fetched": 8, "bytes": 100}


def test_corpus_store_head_get(tmp_path):
    import pyarrow.parquet as pq

    from cninfo_crawler_ray.sources import corpus as C
    from cninfo_crawler_ray.sources.store import CorpusStore

    t = C.corpus_rows(0, 400, 400)
    pq.write_table(t, str(tmp_path / "corpus.parquet"), row_group_size=64)
    store = CorpusStore(str(tmp_path / "corpus.parquet"))
    urls = [C.url_for(f"img_{i:08d}", C.image_fmt(f"img_{i:08d}")) for i in (0, 5, 101, 399)]
    urls.append("https://img0.example.test/img_99999999.raw")  # missing → 404
    h = store.head(urls)
    assert h["status"].to_pylist()[:2] == [200, 200]
    assert h["status"].to_pylist()[4] == 404
    # zero-byte adversarial row (i=101) must 404 like a dead link
    assert h["status"].to_pylist()[2] == 404
    g = store.get(urls)
    assert g["status"].to_pylist() == h["status"].to_pylist()
    blob = g["bytes"].to_pylist()[0]
    assert len(blob) > 0
    from cninfo_crawler_ray.functions import codecs

    px, fmt, meta = codecs.decode_image(blob)
    assert meta["caption"] == t["caption"][0].as_py()


def test_sharded_seen_actor_pool(ray_session):
    from cninfo_crawler_ray.state.seen import ShardedSeenSet

    pool = ShardedSeenSet(4)
    keys = _keys(1000)
    assert all(pool.contains_and_add(keys, list(range(1000))))
    assert not any(pool.contains_and_add(keys))
    assert pool.total() == 1000
    snap = pool.snapshot()
    pool2 = ShardedSeenSet(4)
    pool2.restore(snap)
    assert not any(pool2.contains_and_add(keys))
    assert pool2.total() == 1000


def test_robots_txt_parser_groups_and_delay():
    """load_robots_txt: the exact-agent group beats '*', comments and blank
    lines are ignored, a new User-agent line after a group body starts a new
    group, and Crawl-delay rebinds the host's token rate (1/delay, burst 1)."""
    g = PolitenessGate(rate_per_second=100.0, burst=100, ticks_per_second=10)
    g.load_robots_txt("h.x", """
# comment
User-agent: othercrawler
Disallow: /private/

User-agent: cninfo-crawler
Disallow: /img_
Disallow: /tmp/
Crawl-delay: 2

User-agent: *
Disallow: /
""")
    assert g.robots["h.x"] == ["/img_", "/tmp/"]
    assert g.allowed("h.x", ["/img_1.raw", "/ok/x", "/tmp/y"]) == [False, True, False]
    # crawl-delay 2s @ 10 ticks/s → 0.05 tokens/tick, burst 1
    assert g.acquire("h.x", 5) == 1
    assert g.acquire("h.x", 1) == 0
    assert g.wait_ticks_for("h.x", 1) == 20  # exactly 2 s of virtual time

    # '*' fallback when no specific group matches
    g2 = PolitenessGate()
    g2.load_robots_txt("h.x", "User-agent: *\nDisallow: /all/\n")
    assert g2.robots["h.x"] == ["/all/"]
    # empty Disallow in the winning group = allow everything
    g3 = PolitenessGate()
    g3.load_robots_txt("h.x", "User-agent: cninfo-crawler\nDisallow:\n\nUser-agent: *\nDisallow: /\n")
    assert g3.robots["h.x"] == []
    # no matching group at all
    g4 = PolitenessGate()
    g4.load_robots_txt("h.x", "User-agent: somebot\nDisallow: /\n")
    assert g4.robots["h.x"] == []
