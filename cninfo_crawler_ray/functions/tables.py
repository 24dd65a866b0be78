"""Document-table extraction kernels — M10/M11/M12 (SURVEY.md §2.2).

Reimplements the semantics of report_info_collection.py:122-198 over the
synthetic "pages" payloads (list of {text, tables} where each table is a
pdfplumber-shaped list of rows of nullable string cells):

- per page: flag if "数据资源" occurs anywhere in the page text (R:152-156);
- per table row: find the cell containing the normalized TARGET_KEYWORD, then
  the first >0 number at/after that column — the keyword cell itself included
  (R:164-186);
- parent category: walk up rows skipping empties; the first non-empty row must
  contain one of PARENT_CATEGORIES else stop (R:122-139);
- no hits → zero-fill one row per category happens downstream (R:298-310).

This walk is inherently per-document nested-value work; it runs inside the
decode/extract ``map_batches`` stage where the batch loop is over documents,
each small.
"""

from __future__ import annotations

from ..schemas import PARENT_CATEGORIES, TARGET_KEYWORD
from .kernels import extract_number_one, normalize_text_one


def find_parent_category(table: list[list], current_index: int) -> str | None:
    """M11 — upward walk with skip-empty + stop-on-foreign-text rule."""
    i = current_index - 1
    while i >= 0:
        row = table[i]
        if not row:
            i -= 1
            continue
        joined = "".join(normalize_text_one(c) for c in row if c)
        if not joined:
            i -= 1
            continue
        for cat in PARENT_CATEGORIES:
            if cat in joined:
                return cat
        break  # non-empty row without a target category → stop (R:137-138)
    return None


def extract_items_from_pages(pages: list[dict]) -> tuple[list[dict], bool]:
    """M10+M11+M12 over one document. Returns (items, has_data_resource).

    Each item: {category, value, method: 'table', page} — mirroring the
    reference's extraction record (R:192-197).
    """
    found: list[dict] = []
    has_flag = False
    for page_num, page in enumerate(pages, 1):
        if "数据资源" in (page.get("text") or ""):
            has_flag = True
        for table in page.get("tables") or []:
            if not table:
                continue
            for row_idx, row in enumerate(table):
                if not row:
                    continue
                target_col = None
                for col_idx, cell in enumerate(row):
                    norm = normalize_text_one(cell)
                    if norm and TARGET_KEYWORD in norm:
                        target_col = col_idx
                        has_flag = True
                        break
                if target_col is None:
                    continue
                value = None
                for col_idx in range(target_col, len(row)):
                    v, has_num, positive = extract_number_one(row[col_idx])
                    if has_num and positive:
                        value = v
                        break
                if not value:
                    continue
                cat = find_parent_category(table, row_idx)
                if not cat:
                    continue
                found.append({"category": cat, "value": value, "method": "table", "page": page_num})
    return found, has_flag
