"""Vectorized conformance kernels (SURVEY.md §2.2).

Each kernel reimplements one reference transform's *semantics* over a whole
Arrow/numpy column (not a row loop), with the reference cite in its docstring.
Where the reference is buggy, the documented intent is implemented and the
deviation is noted (SURVEY.md §0.1).
"""

from __future__ import annotations

import re
from datetime import date, datetime, timezone
from decimal import Decimal, InvalidOperation

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..schemas import SENTINELS, SPECIAL_UNIT_MULTIPLIERS

# ---------------------------------------------------------------------------
# M2 — announcement-time → "YYYY-MM-DD"
# ---------------------------------------------------------------------------

def decode_announcement_time(col: pa.Array | pa.ChunkedArray) -> pa.Array:
    """cninfo_report_crawler.py:77-82: epoch-ms int → strftime('%Y-%m-%d');
    non-empty string → part before first space; else ''.

    Spec decision: the reference's ``datetime.fromtimestamp`` uses the local
    timezone; we pin UTC so results are machine-independent.
    """
    s = pc.cast(col, pa.string())
    is_ms = pc.match_substring_regex(s, r"^\d+$")
    ms = pc.if_else(is_ms, s, None)
    ts = pc.cast(pc.cast(ms, pa.int64()), pa.timestamp("ms", tz="UTC"))
    from_ms = pc.strftime(ts, format="%Y-%m-%d")
    # string branch: split on ' ', take head; empty string stays ''.
    head = pc.list_element(pc.split_pattern(pc.if_else(is_ms, "", s), " "), 0)
    out = pc.if_else(is_ms, from_ms, head)
    return out.combine_chunks() if isinstance(out, pa.ChunkedArray) else out


# ---------------------------------------------------------------------------
# M3 — security-code normalizer
# ---------------------------------------------------------------------------

_SH_PREFIX = ("60", "68")
_SZ_PREFIX = ("00", "30")
_BJ_PREFIX = ("83", "87", "92", "43")


def normalize_sec_code(col: pa.Array | pa.ChunkedArray) -> pa.Array:
    """cninfo_report_crawler.py:85-109: digits → zfill(6); prefix 60/68→.SH,
    00/30→.SZ, 83/87/92/43→.BJ, else bare. Empty/'未知代码' pass through.
    Vectorized with pandas string kernels."""
    s = pd.Series(col.to_pandas() if hasattr(col, "to_pandas") else col).astype("string").fillna("")
    out = s.copy()
    active = (s != "") & (s != "未知代码")
    padded = s.where(~(active & s.str.isdigit()), s.str.zfill(6))
    sh = active & padded.str.startswith(_SH_PREFIX)
    sz = active & padded.str.startswith(_SZ_PREFIX)
    bj = active & padded.str.startswith(_BJ_PREFIX)
    out = padded.mask(sh, padded + ".SH").mask(sz, padded + ".SZ").mask(bj, padded + ".BJ")
    out = out.where(active, s)
    return pa.array(out.astype(object), pa.string())


# ---------------------------------------------------------------------------
# M4 — title year/digit predicate  +  target-year derivation
# ---------------------------------------------------------------------------

def subtract_3_months_clamped(d: date) -> date:
    """cninfo_report_crawler.py:384-391 with the month-end crash fixed: the
    reference builds datetime(year, month, day) and dies on e.g. 05-31 → Feb
    31 (SURVEY.md §0.1.2). Spec: clamp the day to the target month's length."""
    month = d.month - 3
    year = d.year
    if month <= 0:
        month += 12
        year -= 1
    # days in target month
    nxt = date(year + (month == 12), month % 12 + 1, 1)
    last = (nxt - date(year, month, 1)).days
    return date(year, month, min(d.day, last))


def target_years(start: date, end: date) -> list[int]:
    """cninfo_report_crawler.py:393-400: shift both endpoints −3 months, take
    the inclusive year range."""
    a, b = subtract_3_months_clamped(start).year, subtract_3_months_clamped(end).year
    return list(range(a, b + 1)) if b > a else sorted({a, b})


def title_keep_mask(titles: pa.Array | pa.ChunkedArray, years: list[int]) -> pa.Array:
    """M4+M5 combined: keep iff (title contains any target year OR title has
    no digit) AND title lacks 摘要/英文版 (cninfo_report_crawler.py:111-126).
    Implements the documented intent — the shipped code NameErrors on ``re``
    (SURVEY.md §0.1.1)."""
    has_digit = pc.match_substring_regex(titles, r"\d")
    if years:
        year_re = "|".join(re.escape(str(y)) for y in years)
        year_found = pc.match_substring_regex(titles, year_re)
    else:
        year_found = pa.array([False] * len(titles), pa.bool_())
    keep = pc.or_(year_found, pc.invert(has_digit))
    excluded = pc.match_substring_regex(titles, "摘要|英文版")
    return pc.and_(keep, pc.invert(excluded))


# ---------------------------------------------------------------------------
# M7 — text normalizer
# ---------------------------------------------------------------------------

_WS_RE = re.compile(r"\s+")


def normalize_text_one(text) -> str:
    """report_info_collection.py:42-49 (per-cell form, used by table walk)."""
    if text is None:
        return ""
    cleaned = str(text).replace("\n", "").replace(":", "：")
    return _WS_RE.sub("", cleaned)


def normalize_text_col(col: pa.Array) -> pa.Array:
    """Vectorized M7 over a string column. RE2's ``\\s`` is ASCII-only, so the
    class is widened to Python's Unicode-whitespace semantics (U+3000 etc.)."""
    s = pc.replace_substring(pc.cast(col, pa.string()), "\n", "")
    s = pc.replace_substring(s, ":", "：")
    return pc.replace_substring_regex(s, r"[\s\p{Z}\x85\x1c-\x1f]+", "")


# ---------------------------------------------------------------------------
# M8 — first-number extraction cascade
# ---------------------------------------------------------------------------

#: report_info_collection.py:102-110 — pattern order is the spec; confirmed
#: quirks (SURVEY.md §0.1.3): "12,345.678" → "12,345.67"; sign never captured
#: ("-5.00" → "5.00", positive); "0.00" → not positive.
NUMBER_PATTERNS = [
    r"((?:\d{1,3},)*\d{1,3}\.\d{2})",
    r"((?:\d{1,3},)*\d{1,3}\.\d+)",
    r"((?:\d{1,3},)+\d+)",
    r"((?:\d{1,3},)*\d+)",
    r"(\d+\.\d{2})",
    r"(\d+\.\d+)",
    r"(\d+)",
]
_NUMBER_RES = [re.compile(p) for p in NUMBER_PATTERNS]


def extract_number_one(text) -> tuple[str | None, bool, bool]:
    """Scalar M8 — used by the per-cell table walk (value, has_num, >0)."""
    if not text:
        return None, False, False
    cleaned = str(text).strip()
    for rx in _NUMBER_RES:
        m = rx.search(cleaned)
        if m:
            v = m.group(1)
            try:
                return v, True, float(v.replace(",", "")) > 0
            except Exception:
                return v, True, True
    return None, False, False


def extract_number_col(values: pd.Series) -> pd.DataFrame:
    """Vectorized M8: first-pattern-wins via a fillna chain of str.extract.
    Returns DataFrame(value: string|NaN, has_num: bool, positive: bool)."""
    s = values.astype("string").str.strip()
    out = pd.Series(pd.NA, index=s.index, dtype="string")
    for rx in _NUMBER_RES:
        remaining = out.isna()
        if not remaining.any():
            break
        m = s[remaining].str.extract(rx, expand=False)
        out[remaining] = m
    has = out.notna() & (s.fillna("") != "")
    num = pd.to_numeric(out.str.replace(",", "", regex=False), errors="coerce")
    positive = has & (num.fillna(np.inf) > 0)  # unparsable-but-matched → True (R:119)
    return pd.DataFrame({"value": out, "has_num": has, "positive": positive})


# ---------------------------------------------------------------------------
# M9 — special-unit amount adjuster
# ---------------------------------------------------------------------------

def adjust_amount_special(sec_codes: pd.Series, amounts: pd.Series) -> pd.Series:
    """report_info_collection.py:52-79: for the 2 special codes, Decimal-
    multiply and re-format '{:,.2f}' stripped of trailing zeros/dot; sentinels
    and parse failures pass through unchanged. Only the (rare) special-code
    rows drop to per-row Decimal work; everything else is untouched."""
    out = amounts.copy().astype(object)
    mask = sec_codes.astype("string").str.upper().isin(SPECIAL_UNIT_MULTIPLIERS.keys()) & amounts.notna() & (amounts != "")
    for idx in out.index[mask.fillna(False)]:
        code = str(sec_codes[idx]).upper()
        mult, _label = SPECIAL_UNIT_MULTIPLIERS[code]
        raw = str(out[idx])
        cleaned = raw.replace(",", "").replace(" ", "").strip()
        if cleaned in {"", "N/A", "空值", "-", "nan", "None"}:
            continue
        try:
            val = Decimal(cleaned)
        except (InvalidOperation, ValueError):
            continue
        formatted = f"{val * mult:,.2f}".rstrip("0").rstrip(".")
        out[idx] = formatted if formatted else "0"
    return out


# ---------------------------------------------------------------------------
# M14 — numeric coercion (for the prefer-positive dedup rule A5)
# ---------------------------------------------------------------------------

def numeric_value_col(amounts: pd.Series) -> pd.Series:
    """report_info_collection.py:450-460: NaN→0; strip commas/spaces;
    sentinel set (incl '0')→0; float() else 0."""
    s = amounts.astype("string").str.replace(",", "", regex=False).str.replace(" ", "", regex=False).str.strip()
    s = s.mask(s.isin(["N/A", "空值", "-", "nan", "None", "0", ""]))
    return pd.to_numeric(s, errors="coerce").fillna(0.0)


# ---------------------------------------------------------------------------
# M15 — sentinel → "0" sink cleanup
# ---------------------------------------------------------------------------

def sentinel_to_zero(col: pa.Array | pa.ChunkedArray) -> pa.Array:
    """report_info_collection.py:534-535, :680-681 (NaN included)."""
    s = pc.cast(col, pa.string())
    return pc.if_else(pc.or_kleene(pc.is_null(s), pc.is_in(s, value_set=pa.array(SENTINELS))), "0", s)


# ---------------------------------------------------------------------------
# M18 — tolerant date parse (sort key for A3)
# ---------------------------------------------------------------------------

def parse_report_date(col: pa.Array | pa.ChunkedArray) -> pa.Array:
    """cninfo_report_crawler.py:527 pd.to_datetime(errors='coerce') analog:
    'YYYY-MM-DD' → days-since-epoch int64; invalid → null."""
    ok = pc.match_substring_regex(col, r"^\d{4}-\d{2}-\d{2}$")
    ts = pc.strptime(pc.if_else(ok, col, None), format="%Y-%m-%d", unit="s", error_is_null=True)
    return pc.cast(pc.divide(pc.cast(ts, pa.int64()), 86400), pa.int64())
