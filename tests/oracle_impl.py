"""Single-process conformance oracle.

A deliberately plain, per-row Python implementation of the reference crawler's
semantics (documented intent where the reference is buggy — SURVEY.md §0.1)
under the canonical total order of SURVEY.md §3.4. The Ray Data engine is
tested against THIS module; it shares no code with the engine's vectorized
kernels, so agreement is a real check, not a tautology.

Control-flow mirrors cninfo_report_crawler.py (stage 1) and
report_info_collection.py (stage 2); cites inline.
"""

from __future__ import annotations

import re
from datetime import date, datetime, timezone

import pandas as pd

from cninfo_crawler_ray.functions import codecs  # codec is shared: it IS the format spec
from cninfo_crawler_ray.sources import corpus as fixtures

EXCHANGES = ["sse", "szse", "bj", "neeq", "star"]
PARENTS = ["存货", "无形资产", "开发支出"]
KEYWORD = "其中：数据资源"


# --- scalar helpers (reference semantics, per-row style) -------------------

def o_decode_time(v):
    # cninfo_report_crawler.py:77-82 (UTC pinned by spec)
    if v is None:
        return ""
    v = str(v)
    if v.isdigit() and v != "":
        return datetime.fromtimestamp(int(v) / 1000, tz=timezone.utc).strftime("%Y-%m-%d")
    return v.split(" ")[0] if v else ""


def o_normalize_code(v):
    # cninfo_report_crawler.py:85-109
    if not v or v == "未知代码":
        return v if v is not None else ""
    s = str(v)
    if s.isdigit():
        s = s.zfill(6)
    if s.startswith("60") or s.startswith("68"):
        return s + ".SH"
    if s.startswith("00") or s.startswith("30"):
        return s + ".SZ"
    if s.startswith(("83", "87", "92", "43")):
        return s + ".BJ"
    return s


def o_sub3(d: date) -> date:
    m, y = d.month - 3, d.year
    if m <= 0:
        m, y = m + 12, y - 1
    while True:
        try:
            return date(y, m, d.day if d.day <= 28 else min(d.day, [31, 29 if y % 4 == 0 and (y % 100 != 0 or y % 400 == 0) else 28, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31][m - 1]))
        except ValueError:  # pragma: no cover
            return date(y, m, 28)


def o_target_years(start: date, end: date):
    a, b = o_sub3(start).year, o_sub3(end).year
    return list(range(a, b + 1)) if b > a else sorted({a, b})


def o_title_keep(title: str, years) -> bool:
    # cninfo_report_crawler.py:111-126 (documented intent)
    has_digit = any(c.isdigit() for c in title)
    year_found = any(str(y) in title for y in years) if years else False
    if not (year_found or not has_digit):
        return False
    if "摘要" in title or "英文版" in title:
        return False
    return True


def o_norm_text(t):
    if t is None:
        return ""
    return re.sub(r"\s+", "", str(t).replace("\n", "").replace(":", "："))


_PATS = [
    r"((?:\d{1,3},)*\d{1,3}\.\d{2})", r"((?:\d{1,3},)*\d{1,3}\.\d+)",
    r"((?:\d{1,3},)+\d+)", r"((?:\d{1,3},)*\d+)",
    r"(\d+\.\d{2})", r"(\d+\.\d+)", r"(\d+)",
]


def o_extract_number(text):
    # report_info_collection.py:97-120
    if not text:
        return None, False, False
    cleaned = str(text).strip()
    for p in _PATS:
        m = re.search(p, cleaned)
        if m:
            v = m.group(1)
            try:
                return v, True, float(v.replace(",", "")) > 0
            except Exception:
                return v, True, True
    return None, False, False


def o_parent(table, idx):
    # report_info_collection.py:122-139
    i = idx - 1
    while i >= 0:
        row = table[i]
        if not row:
            i -= 1
            continue
        joined = "".join(o_norm_text(c) for c in row if c)
        if not joined:
            i -= 1
            continue
        for cat in PARENTS:
            if cat in joined:
                return cat
        break
    return None


def o_extract_items(pages):
    # report_info_collection.py:141-209
    items, flag = [], False
    for pno, page in enumerate(pages, 1):
        if "数据资源" in (page.get("text") or ""):
            flag = True
        for table in page.get("tables") or []:
            if not table:
                continue
            for ridx, row in enumerate(table):
                if not row:
                    continue
                tcol = None
                for cidx, cell in enumerate(row):
                    n = o_norm_text(cell)
                    if n and KEYWORD in n:
                        tcol = cidx
                        flag = True
                        break
                if tcol is None:
                    continue
                val = None
                for cidx in range(tcol, len(row)):
                    v, has, pos = o_extract_number(row[cidx])
                    if has and pos:
                        val = v
                        break
                if not val:
                    continue
                cat = o_parent(table, ridx)
                if not cat:
                    continue
                items.append({"category": cat, "value": val, "page": pno})
    return items, flag


def o_adjust(code, amount):
    # report_info_collection.py:52-79
    from decimal import Decimal, InvalidOperation

    mults = {"600941.SH": Decimal("1000000"), "601727.SH": Decimal("1000")}
    if not amount:
        return amount
    code = (code or "").upper()
    if code not in mults:
        return amount
    cleaned = str(amount).replace(",", "").replace(" ", "").strip()
    if cleaned in {"", "N/A", "空值", "-", "nan", "None"}:
        return amount
    try:
        v = Decimal(cleaned)
    except (InvalidOperation, ValueError):
        return amount
    f = f"{v * mults[code]:,.2f}".rstrip("0").rstrip(".")
    return f if f else "0"


def o_numeric(val):
    # report_info_collection.py:450-460
    if val is None or (isinstance(val, float) and pd.isna(val)):
        return 0
    try:
        s = str(val).strip().replace(",", "").replace(" ", "")
        if s in ["N/A", "空值", "-", "nan", "None", "0", ""]:
            return 0
        return float(s)
    except Exception:
        return 0


# --- stage 1: listing → frontier ------------------------------------------

def _server_pages(anns: pd.DataFrame, exch: str, d) -> dict[int, pd.DataFrame]:
    s = anns[(anns["exchange"] == exch) & (anns["date"] == d)]
    return {p: g.sort_values("index_in_page") for p, g in s.groupby("page_num")}


def oracle_stage1(anns: pd.DataFrame, dates: list[date], corpus: pd.DataFrame,
                  sniff_magic: bool = False) -> pd.DataFrame:
    """Reference stage-1 under canonical order (SURVEY.md §3.1, §3.4).

    ``sniff_magic`` models the reference's GET-fallback
    (cninfo_report_crawler.py:146-150): when the HEAD metadata contradicts
    the URL extension, fetch the first 1024 bytes and accept iff the
    container magic matches the extension."""
    years = o_target_years(dates[0], dates[-1])
    store = corpus.set_index("image_id")
    valid = []
    for erank, exch in enumerate(EXCHANGES):
        for d in dates:
            pages = _server_pages(anns, exch, d)
            total_pages = max(pages.keys(), default=0)
            seen = set()  # per-(exchange,date) — resets per stream (C:183)
            empty = 0
            page = 1
            while True:
                if total_pages and page > total_pages + 3:
                    break
                if total_pages and page > total_pages and empty >= 2:
                    break
                if page > 500:
                    break
                rows = pages.get(page)
                if rows is None or len(rows) == 0:
                    break  # empty page ends the stream (C:283-288)
                novel = []
                for _, r in rows.iterrows():
                    key = (r["secCode"], r["announcementTitle"], r["announcementTime"], r["adjunctUrl"])
                    if key not in seen:
                        seen.add(key)
                        novel.append(r)
                if not novel:
                    empty += 1
                    if empty >= 3:
                        break
                else:
                    empty = 0
                days = (d - date(1970, 1, 1)).days
                for r in novel:
                    # validation (C:56-164): title predicates, then probe
                    title = r["announcementTitle"]
                    if not o_title_keep(title, years):
                        continue
                    url = "https://" + r["adjunctUrl"]
                    image_id = url.rsplit("/", 1)[-1].rsplit(".", 1)[0]
                    if image_id not in store.index:
                        continue
                    row = store.loc[image_id]
                    if len(row["bytes"]) == 0:
                        continue  # zero-byte payload = dead link
                    # HEAD: server content-type (fmt col) vs URL extension
                    ext = url.rsplit(".", 1)[-1]
                    if row["fmt"] != ext:
                        if not sniff_magic:
                            continue
                        # GET-fallback: 1 KB prefix magic vs extension
                        if codecs.sniff_fmt(bytes(row["bytes"])[:1024]) != ext:
                            continue
                    order_key = int(
                        (((((erank << 17) | days) << 2 | 0) << 2 | 0) << 10 | int(r["page_num"])) << 6
                        | int(r["index_in_page"])
                    )
                    valid.append(
                        {
                            "股票代码": o_normalize_code(r["secCode"]),
                            "公司名称": r["secName"],
                            "财报名称": title,
                            "报告日期": o_decode_time(r["announcementTime"]),
                            "PDF链接": url,
                            "order_key": order_key,
                        }
                    )
                page += 1
    df = pd.DataFrame(valid)
    if df.empty:
        return df
    df = df.sort_values("order_key", kind="stable")
    # frame-level exclusion (C:519-521) — idempotent with the per-record one
    df = df[~df["财报名称"].str.contains("摘要|英文版", na=False)]
    # A2 (C:524)
    df = df.drop_duplicates(subset=["股票代码", "公司名称", "财报名称"], keep="first")
    # A3 (C:527-530)
    df["_d"] = pd.to_datetime(df["报告日期"], errors="coerce")
    df = df.sort_values(by=["股票代码", "_d"], ascending=[True, False], kind="stable")
    df = df.drop_duplicates(subset=["股票代码"], keep="first").drop(columns=["_d"])
    return df.sort_values("order_key", kind="stable").reset_index(drop=True)


# --- stage 2: frontier → long/wide ----------------------------------------

def oracle_stage2(frontier: pd.DataFrame, corpus: pd.DataFrame):
    """Reference stage-2 under canonical order (SURVEY.md §3.2, §3.4)."""
    store = corpus.set_index("image_id")
    long_rows = []
    for _, r in frontier.sort_values("order_key", kind="stable").iterrows():
        url = r["PDF链接"]
        image_id = url.rsplit("/", 1)[-1].rsplit(".", 1)[0]
        if image_id not in store.index:
            continue
        blob = store.loc[image_id]["bytes"]
        if len(blob) == 0:
            continue  # download failure → row dropped (R:271-273)
        ext = url.rsplit(".", 1)[-1]
        try:
            px, fmt, meta = codecs.decode_image(bytes(blob))
        except Exception:
            continue
        if fmt != ext:
            continue  # content-type gate (R:257-259)
        items, flag = o_extract_items(meta.get("pages") or [])
        base = {
            "证券代码": r["股票代码"],
            "公司名称": r["公司名称"],
            "报告名称": r["财报名称"],
            "报告日期": r["报告日期"],
            "PDF链接": url,
            "_has_data_resource": 1 if flag else 0,
        }
        if items:
            for k, it in enumerate(items):
                long_rows.append({**base, "项目名称": it["category"],
                                  "金额": o_adjust(r["股票代码"], it["value"]),
                                  "order_key": r["order_key"], "_item": k})
        else:  # zero-fill ×3 (R:298-310)
            for k, cat in enumerate(PARENTS):
                long_rows.append({**base, "项目名称": cat,
                                  "金额": o_adjust(r["股票代码"], "0"),
                                  "order_key": r["order_key"], "_item": k})
    df_long = pd.DataFrame(long_rows)
    if df_long.empty:
        return df_long, pd.DataFrame()
    df_long = df_long.sort_values(["order_key", "_item"], kind="stable").reset_index(drop=True)
    # sink cleanup (R:680-681)
    df_long["金额"] = df_long["金额"].replace(["N/A", "空值", "-", "nan", "None", ""], "0").fillna("0")
    long_cols = ["证券代码", "公司名称", "报告名称", "报告日期", "项目名称", "金额", "PDF链接", "_has_data_resource"]

    # A5 grouped dedup with prefer-positive (R:462-489); "first" = canonical
    keys = ["证券代码", "公司名称", "报告名称", "报告日期", "PDF链接", "项目名称"]
    picked = []
    for _, g in df_long.groupby(keys, sort=True):
        if len(g) == 1:
            picked.append(g.iloc[0])
        else:
            pos = g[g["金额"].apply(o_numeric) > 0]
            picked.append(pos.iloc[0] if len(pos) else g.iloc[0])
    dd = pd.DataFrame(picked)
    # A6 pivot (R:492-497) + J3 flag (constant per doc) + M15 cleanup
    wide = dd.pivot_table(
        index=["证券代码", "公司名称", "报告名称", "报告日期", "PDF链接"],
        columns="项目名称", values="金额", aggfunc="first",
    ).reset_index()
    wide.columns.name = None
    flags = dd.groupby("PDF链接")["_has_data_resource"].first()
    wide["是否包含数据资产"] = wide["PDF链接"].map(flags).astype(int)
    for c in PARENTS:
        if c not in wide.columns:
            wide[c] = "0"
        wide[c] = wide[c].replace(["N/A", "空值", "-", "nan", "None", ""], "0").fillna("0")
    wide = wide[["证券代码", "公司名称", "报告名称", "报告日期", "存货", "无形资产", "开发支出", "是否包含数据资产", "PDF链接"]]
    wide = wide.sort_values(["证券代码", "公司名称", "报告名称", "报告日期", "PDF链接"]).reset_index(drop=True)
    return df_long[long_cols + ["order_key", "_item"]], wide
