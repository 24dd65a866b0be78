"""Grouped reductions (A2, A3, A5, A6 + J3) as groupby/map_groups shuffles.

The reference does these as driver-side pandas on fully-materialized frames
(cninfo_report_crawler.py:515-535, report_info_collection.py:431-548). Here
each is a keyed shuffle; "first" always means first in the canonical order
key (SURVEY.md §3.4), never arrival order.
"""

from __future__ import annotations

import pandas as pd

from ..functions.kernels import numeric_value_col
from ..schemas import PARENT_CATEGORIES, WIDE_COLUMNS


def dedup_first_by_order(df: pd.DataFrame, keys: list[str], order_col: str = "order_key") -> pd.DataFrame:
    """A2 — drop_duplicates(keep='first') where first = min order key
    (cninfo_report_crawler.py:524)."""
    return (
        df.sort_values(order_col, kind="stable")
        .drop_duplicates(subset=keys, keep="first")
    )


def top1_latest_per_code(group: pd.DataFrame) -> pd.DataFrame:
    """A3 — per 股票代码 keep the most recent 报告日期; invalid dates lose to
    any valid date; ties break by canonical order
    (cninfo_report_crawler.py:527-530 sort + drop_duplicates)."""
    d = pd.to_datetime(group["报告日期"], errors="coerce")
    # NaT → -inf so valid dates always win; tie-break = min order_key
    rank = pd.DataFrame({"d": d.fillna(pd.Timestamp.min), "ok": group["order_key"]})
    idx = rank.sort_values(["d", "ok"], ascending=[False, True], kind="stable").index[0]
    return group.loc[[idx]]


def prefer_positive_first(group: pd.DataFrame) -> pd.DataFrame:
    """A5 — per 6-key group: first row with numeric 金额 > 0, else first row;
    order = canonical (report_info_collection.py:462-489)."""
    g = group.sort_values(["order_key", "_item"], kind="stable")
    if len(g) == 1:
        return g
    pos = g[numeric_value_col(g["金额"]) > 0]
    return (pos if len(pos) else g).head(1)


def pivot_group_wide(group: pd.DataFrame) -> pd.DataFrame:
    """A6 + J3 — one wide row per (证券代码, 公司名称, 报告名称, 报告日期,
    PDF链接) document group: category amounts to columns, flag carried from
    the group (constant per document, report_info_collection.py:507-516).
    Assumes A5 already left ≤1 row per category."""
    first = group.iloc[0]
    row = {
        "证券代码": first["证券代码"],
        "公司名称": first["公司名称"],
        "报告名称": first["报告名称"],
        "报告日期": first["报告日期"],
        "PDF链接": first["PDF链接"],
        "是否包含数据资产": int(first["_has_data_resource"]),
    }
    amounts = dict(zip(group["项目名称"], group["金额"]))
    for cat in PARENT_CATEGORIES:
        v = amounts.get(cat)
        row[cat] = "0" if v is None or v in ("N/A", "空值", "-", "nan", "None", "") else str(v)
    return pd.DataFrame([row])[WIDE_COLUMNS]
