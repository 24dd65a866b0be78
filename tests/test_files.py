"""Filename-convention conformance (S7/O2/M13): sanitizer, crawl-output
naming, collect-side discovery + parse — expectations hand-derived from the
reference (report_info_collection.py:237-238, :344-428;
cninfo_report_crawler.py:402-404), no engine code on the oracle side."""

import os
import time
from datetime import date, datetime

from cninfo_crawler_ray.functions import files as F


def test_sanitize_replaces_every_illegal_char():
    # Windows-illegal set \ / : * ? " < > |  → '_' (R:238)
    got = F.sanitize_report_filename('A/B\\C:D*E?F"G<H>I|J', "年报?2024", "2024-12-31")
    assert got == "A_B_C_D_E_F_G_H_I_J：年报_2024_[2024-12-31].pdf"
    # the fullwidth ：joiner is NOT in the illegal set and survives
    assert "：" in got


def test_sanitize_plain_name_and_ext():
    assert (F.sanitize_report_filename("平安银行", "2024年年度报告", "2025-03-15", "img")
            == "平安银行：2024年年度报告_[2025-03-15].img")


def test_frontier_csv_name_format():
    nm = F.frontier_csv_name(date(2025, 8, 1), date(2025, 8, 31), "bndbg",
                             stamp=datetime(2025, 9, 1, 14, 30, 5))
    assert nm == "listed_companies_20250801_20250831_bndbg_20250901_143005.csv"


def test_parse_frontier_csv_name_roundtrip():
    info = F.parse_frontier_csv_name(
        "/some/dir/listed_companies_20250801_20250831_bndbg_20250901_143005.csv")
    assert info == {"start_date_str": "20250801", "end_date_str": "20250831",
                    "report_type": "bndbg", "original_timestamp": "20250901_143005"}
    assert F.parse_frontier_csv_name("random.csv") is None


def test_discovery_prefers_embedded_timestamp_over_mtime(tmp_path):
    old = tmp_path / "listed_companies_20250801_20250831_ndbg_20250901_090000.csv"
    new = tmp_path / "listed_companies_20250801_20250831_ndbg_20250902_090000.csv"
    other = tmp_path / "unrelated.csv"
    for p in (old, new, other):
        p.write_text("x")
    # make the OLD file the most recently modified — embedded ts must win
    now = time.time()
    os.utime(new, (now - 1000, now - 1000))
    os.utime(old, (now, now))
    assert F.discover_latest_frontier_csv(str(tmp_path)) == str(new)


def test_discovery_empty_dir(tmp_path):
    assert F.discover_latest_frontier_csv(str(tmp_path)) is None
