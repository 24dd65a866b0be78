"""Minimal stdlib .xlsx writer (S9 fallback).

The reference emits its reports with ``pandas.to_excel`` (openpyxl) —
``report_info_collection.py:701-715``: delete-if-exists, long sheet plain,
wide sheet with ``freeze_panes=(1, 0)``. This sandbox ships no Excel engine,
so the engine vendors the tiny subset of OOXML SpreadsheetML it needs:
one worksheet, inline strings (no shared-string table), numeric cells, and
a frozen header pane. Output opens in Excel/LibreOffice and is verified
structurally in tests/test_cli.py via stdlib zipfile + ElementTree.

An .xlsx file is a zip of XML parts; the minimal valid set is
[Content_Types].xml, _rels/.rels, xl/workbook.xml,
xl/_rels/workbook.xml.rels, xl/styles.xml and one worksheet part
(ECMA-376 part 1, §12). Everything here derives from that public spec.
"""

from __future__ import annotations

import math
import zipfile
from xml.sax.saxutils import escape

_CONTENT_TYPES = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
<Override PartName="/xl/styles.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.styles+xml"/>
</Types>"""

_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
</Relationships>"""

_WORKBOOK = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
<sheets><sheet name="{name}" sheetId="1" r:id="rId1"/></sheets>
</workbook>"""

_WORKBOOK_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
<Relationship Id="rId2" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/styles" Target="styles.xml"/>
</Relationships>"""

_STYLES = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
<fonts count="1"><font><sz val="11"/><name val="Calibri"/></font></fonts>
<fills count="1"><fill><patternFill patternType="none"/></fill></fills>
<borders count="1"><border/></borders>
<cellStyleXfs count="1"><xf/></cellStyleXfs>
<cellXfs count="1"><xf xfId="0"/></cellXfs>
</styleSheet>"""


def _col_letter(i: int) -> str:
    """0-based column index → A, B, …, Z, AA, …"""
    out = ""
    i += 1
    while i:
        i, rem = divmod(i - 1, 26)
        out = chr(ord("A") + rem) + out
    return out


def _cell_xml(ref: str, value) -> str:
    if value is None:
        return ""
    if isinstance(value, bool):
        return f'<c r="{ref}" t="b"><v>{int(value)}</v></c>'
    if isinstance(value, (int, float)) and not isinstance(value, bool):
        if isinstance(value, float) and (math.isnan(value) or math.isinf(value)):
            return ""
        v = repr(value) if isinstance(value, float) else str(value)
        return f'<c r="{ref}"><v>{v}</v></c>'
    s = escape(str(value))
    return (f'<c r="{ref}" t="inlineStr"><is>'
            f'<t xml:space="preserve">{s}</t></is></c>')


def _sheet_xml(header: list, rows: list[list], freeze_panes=None) -> str:
    parts = ['<?xml version="1.0" encoding="UTF-8" standalone="yes"?>',
             '<worksheet xmlns="http://schemas.openxmlformats.org/'
             'spreadsheetml/2006/main">']
    if freeze_panes:
        y, x = freeze_panes
        top_left = f"{_col_letter(x)}{y + 1}"
        parts.append(
            '<sheetViews><sheetView workbookViewId="0">'
            f'<pane ySplit="{y}"' + (f' xSplit="{x}"' if x else "")
            + f' topLeftCell="{top_left}" activePane="bottomLeft"'
            ' state="frozen"/></sheetView></sheetViews>')
    else:
        parts.append('<sheetViews><sheetView workbookViewId="0"/></sheetViews>')
    parts.append("<sheetData>")
    for r, row in enumerate([header] + rows, start=1):
        cells = "".join(
            _cell_xml(f"{_col_letter(c)}{r}", v) for c, v in enumerate(row))
        parts.append(f'<row r="{r}">{cells}</row>')
    parts.append("</sheetData></worksheet>")
    return "".join(parts)


def write_xlsx(path: str, df, sheet_name: str = "Sheet1",
               freeze_panes: tuple[int, int] | None = None) -> None:
    """Write a pandas DataFrame as a single-sheet .xlsx (header row + data,
    like ``df.to_excel(index=False)``). NaN/None cells are written empty."""
    header = [str(c) for c in df.columns]
    rows = df.values.tolist()
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", _CONTENT_TYPES)
        z.writestr("_rels/.rels", _RELS)
        z.writestr("xl/workbook.xml",
                   _WORKBOOK.format(name=escape(sheet_name)))
        z.writestr("xl/_rels/workbook.xml.rels", _WORKBOOK_RELS)
        z.writestr("xl/styles.xml", _STYLES)
        z.writestr("xl/worksheets/sheet1.xml",
                   _sheet_xml(header, rows, freeze_panes))


def read_xlsx_values(path: str) -> tuple[list[str], list[list], dict]:
    """Structural reader for tests (stdlib only): returns (header, rows,
    sheet_view_info). Numbers come back as floats/ints, inline strings as
    str; empty cells as None. sheet_view_info carries the frozen-pane
    attributes if present."""
    import xml.etree.ElementTree as ET

    ns = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
    with zipfile.ZipFile(path) as z:
        root = ET.fromstring(z.read("xl/worksheets/sheet1.xml"))
    pane = root.find(f"{ns}sheetViews/{ns}sheetView/{ns}pane")
    info = dict(pane.attrib) if pane is not None else {}
    grid: list[list] = []
    for row in root.find(f"{ns}sheetData"):
        cells: dict[int, object] = {}
        for c in row:
            ref = c.attrib["r"]
            col = 0
            for ch in ref:
                if ch.isalpha():
                    col = col * 26 + (ord(ch) - ord("A") + 1)
                else:
                    break
            col -= 1
            if c.attrib.get("t") == "inlineStr":
                t = c.find(f"{ns}is/{ns}t")
                cells[col] = t.text if t is not None and t.text else ""
            else:
                v = c.find(f"{ns}v")
                if v is not None and v.text is not None:
                    f = float(v.text)
                    cells[col] = int(f) if f.is_integer() and "." not in v.text else f
        width = max(cells) + 1 if cells else 0
        grid.append([cells.get(i) for i in range(width)])
    header = [str(x) for x in grid[0]] if grid else []
    return header, grid[1:], info
