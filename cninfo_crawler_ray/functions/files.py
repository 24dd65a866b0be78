"""Filename conventions of the reference's two-step workflow (S7/O2/M13).

- ``frontier_csv_name`` — the crawl step's dynamic output name
  ``listed_companies_{start}_{end}_{type}_{YYYYMMDD_HHMMSS}.csv``
  (cninfo_report_crawler.py:402-404).
- ``parse_frontier_csv_name`` / ``discover_latest_frontier_csv`` — the
  collect step's auto-discovery: glob ``listed_companies_*_*.csv``, sort by
  the filename-embedded timestamp (file mtime as fallback for unparseable
  names), pick the newest, and parse
  ``{start_date}_{end_date}_{report_type}_{timestamp}`` back out of the name
  (report_info_collection.py:344-428).
- ``sanitize_report_filename`` — the per-report payload filename
  ``{公司名称}：{财报名称}_[{报告日期}]`` with Windows-illegal characters
  replaced by ``_`` (report_info_collection.py:237-238).
"""

from __future__ import annotations

import glob
import os
import re
from datetime import date, datetime

_ILLEGAL = re.compile(r'[\\/:*?"<>|]')


def sanitize_report_filename(sec_name: str, report_title: str,
                             report_date: str, ext: str = "pdf") -> str:
    """Reference M13: fullwidth colon joins name/title, date in brackets,
    every Windows-illegal char replaced by '_' (R:237-238). Collisions keep
    the reference's behavior: same inputs → same name."""
    base = f"{sec_name}：{report_title}_[{report_date}]"
    return _ILLEGAL.sub("_", base) + f".{ext}"


def frontier_csv_name(start: date, end: date, report_type: str,
                      stamp: datetime | None = None) -> str:
    """Crawl-step output name (C:402-404): dates compacted to YYYYMMDD, a
    YYYYMMDD_HHMMSS generation timestamp at the tail."""
    ts = (stamp or datetime.now()).strftime("%Y%m%d_%H%M%S")
    return (f"listed_companies_{start.isoformat().replace('-', '')}_"
            f"{end.isoformat().replace('-', '')}_{report_type}_{ts}.csv")


def parse_frontier_csv_name(path: str) -> dict | None:
    """R:400-421: split on '_'; needs ≥5 parts after stripping .csv. Returns
    {'start_date_str','end_date_str','report_type','original_timestamp'}
    or None when the name doesn't follow the pattern."""
    parts = os.path.basename(path).removesuffix(".csv").split("_")
    if len(parts) < 5:
        return None
    return {
        "start_date_str": parts[2],
        "end_date_str": parts[3],
        "report_type": parts[4],
        "original_timestamp": "_".join(parts[5:]) if len(parts) > 5 else "",
    }


def _name_timestamp_key(path: str) -> str:
    """R:371-388: the embedded 'YYYYMMDD_HHMMSS' tail sorts lexically; names
    without one fall back to file mtime (stringified, like the reference)."""
    parts = os.path.basename(path).removesuffix(".csv").split("_")
    if len(parts) >= 6:
        ts = "_".join(parts[5:])
        if "_" in ts:
            return ts
    return str(os.path.getmtime(path))


def discover_latest_frontier_csv(directory: str = ".") -> str | None:
    """R:363-391: newest ``listed_companies_*_*.csv`` by embedded timestamp."""
    hits = glob.glob(os.path.join(directory, "listed_companies_*_*.csv"))
    if not hits:
        return None
    hits.sort(key=_name_timestamp_key, reverse=True)
    return hits[0]
