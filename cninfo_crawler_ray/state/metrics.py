"""Metrics actor (T6) — replaces the reference's driver-local printed
counters (cninfo_report_crawler.py:445-510, report_info_collection.py:650-663)
with a counter actor whose per-partition values are persisted into the
checkpoint lineage records (SURVEY.md §1.2 lineage/metrics table)."""

from __future__ import annotations

from collections import defaultdict


class Metrics:
    def __init__(self):
        self.counters: dict[str, int] = defaultdict(int)
        self.per_partition: dict[int, dict[str, int]] = defaultdict(lambda: defaultdict(int))

    def inc(self, updates: dict[str, int], partition_id: int | None = None) -> None:
        for k, v in updates.items():
            self.counters[k] += int(v)
            if partition_id is not None:
                self.per_partition[partition_id][k] += int(v)

    def get_all(self) -> dict[str, int]:
        return dict(self.counters)

    def get_partition(self, partition_id: int) -> dict[str, int]:
        return dict(self.per_partition.get(partition_id, {}))
