"""Per-host token-bucket politeness + robots cache (T3).

The reference's politeness is a fixed 0.3 s sleep between listing pages and
implicit caps via thread-pool sizes (cninfo_report_crawler.py:331, :479,
report_info_collection.py:633) — none of which survives horizontal scaling.
Here the budget is explicit per-host token buckets held in an actor.

Determinism (SURVEY.md §7, "politeness vs determinism"): grants are a pure
function of (request sequence, budget, tick), never wall-clock — tests drive
a virtual tick; production advances ticks from real time. Crawl ORDER never
depends on grant timing because admission order is fixed by the canonical
order key; politeness only spaces requests out.
"""

from __future__ import annotations


class HostBucket:
    __slots__ = ("tokens", "rate_per_tick", "burst", "last_tick")

    def __init__(self, rate_per_tick: float, burst: float):
        self.tokens = burst
        self.rate_per_tick = rate_per_tick
        self.burst = burst
        self.last_tick = 0


class PolitenessGate:
    """Plain class (wrapped by ray.remote for the actor pool). One instance
    governs all hosts; shard by host-hash across a pool if host cardinality
    is large."""

    def __init__(self, rate_per_second: float = 1000.0, burst: int = 2000,
                 ticks_per_second: int = 10):
        self.tps = ticks_per_second
        self.default_rate = rate_per_second / ticks_per_second
        self.default_burst = float(burst)
        self.buckets: dict[str, HostBucket] = {}
        self.overrides: dict[str, tuple[float, float]] = {}
        self.robots: dict[str, list[str]] = {}  # host → disallowed path prefixes
        self.now_tick = 0

    # --- config ---
    def set_host_rate(self, host: str, rate_per_second: float, burst: int) -> None:
        self.overrides[host] = (rate_per_second / self.tps, float(burst))
        self.buckets.pop(host, None)

    def set_robots(self, host: str, disallow_prefixes: list[str]) -> None:
        """Robots cache: in production this would be fetched+parsed once per
        host and TTL-refreshed; in the sandbox rules are injected."""
        self.robots[host] = list(disallow_prefixes)

    # --- time ---
    def advance(self, ticks: int) -> int:
        self.now_tick += int(ticks)
        return self.now_tick

    def _bucket(self, host: str) -> HostBucket:
        b = self.buckets.get(host)
        if b is None:
            rate, burst = self.overrides.get(host, (self.default_rate, self.default_burst))
            b = self.buckets[host] = HostBucket(rate, burst)
        return b

    # --- grants ---
    def acquire(self, host: str, n: int) -> int:
        """Grant up to n request tokens for host at the current tick; returns
        the number granted (callers requeue the remainder)."""
        b = self._bucket(host)
        if self.now_tick > b.last_tick:
            b.tokens = min(b.burst, b.tokens + (self.now_tick - b.last_tick) * b.rate_per_tick)
            b.last_tick = self.now_tick
        granted = int(min(n, b.tokens))
        b.tokens -= granted
        return granted

    def acquire_batch(self, hosts: list[str], counts: list[int]) -> list[int]:
        """One RPC per map_batches batch: grouped grants per host."""
        return [self.acquire(h, c) for h, c in zip(hosts, counts)]

    def allowed(self, host: str, paths: list[str]) -> list[bool]:
        dis = self.robots.get(host, [])
        return [not any(p.startswith(d) for d in dis) for p in paths]

    # --- checkpoint ---
    def snapshot(self) -> bytes:
        import pickle

        return pickle.dumps((
            self.tps, self.default_rate, self.default_burst, self.overrides,
            self.robots, self.now_tick,
            {h: (b.tokens, b.rate_per_tick, b.burst, b.last_tick)
             for h, b in self.buckets.items()},
        ))

    def restore(self, blob: bytes) -> None:
        import pickle

        (self.tps, self.default_rate, self.default_burst, self.overrides,
         self.robots, self.now_tick, buckets) = pickle.loads(blob)
        self.buckets = {}
        for h, (tokens, rate, burst, last) in buckets.items():
            b = HostBucket(rate, burst)
            b.tokens, b.last_tick = tokens, last
            self.buckets[h] = b

    def wait_ticks_for(self, host: str, n: int) -> int:
        """Deterministic schedule helper: ticks until n tokens are available
        (0 if available now, -1 if NEVER — zero refill rate with an exhausted
        bucket). Pure — does not consume tokens."""
        b = self._bucket(host)
        tokens = min(b.burst, b.tokens + max(self.now_tick - b.last_tick, 0) * b.rate_per_tick)
        if tokens >= n:
            return 0
        if b.rate_per_tick <= 0:
            return -1
        need = n - tokens
        return int(-(-need // b.rate_per_tick))  # ceil
