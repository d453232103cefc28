"""Minimal pure-stdlib XLSX reader/writer (zipfile + xml.etree).

XLSX is a zip of XML parts (ECMA-376 SpreadsheetML). This module implements
just enough of it for the reference's Excel surface — multi-sheet scan
(SURVEY §2.1-S2) and the Results/Statistics/Configuration workbook sink
(S3) — with zero non-stdlib dependencies, so the Excel bridge works in
environments without openpyxl/xlsxwriter. ``sources.io`` prefers the pandas
engines when installed and falls back here.

Scope: cell types number / string (inline or shared) / bool / formula-free;
one-table-per-sheet with a header row, reading the default (first) worksheet
grid. Dates are not decoded (they surface as serial numbers) — the engine's
data path is parquet; Excel is a config-scale report bridge only
(reference ``demos/streamlit_demo.py:100-115,540-568``).
"""

from __future__ import annotations

import re
import zipfile
from typing import Dict, List, Optional, Union
from xml.etree import ElementTree as ET
from xml.sax.saxutils import escape, quoteattr

import pandas as pd

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_NS_R = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"
_CELL_REF = re.compile(r"([A-Z]+)(\d+)")


def _col_index(ref: str) -> int:
    """'A' → 0, 'AB' → 27."""
    n = 0
    for ch in ref:
        n = n * 26 + (ord(ch) - 64)
    return n - 1


def _col_name(idx: int) -> str:
    name = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        name = chr(65 + rem) + name
    return name


# ---------------------------------------------------------------------------
# Reader
# ---------------------------------------------------------------------------

def _sheet_parts(zf: zipfile.ZipFile) -> List[tuple]:
    """[(sheet_name, zip_member_path)] in workbook order."""
    wb = ET.fromstring(zf.read("xl/workbook.xml"))
    rels = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
    rel_ns = "{http://schemas.openxmlformats.org/package/2006/relationships}"
    by_id = {r.get("Id"): r.get("Target") for r in rels.iter(f"{rel_ns}Relationship")}
    out = []
    for sh in wb.iter(f"{_NS}sheet"):
        target = by_id[sh.get(f"{_NS_R}id")].lstrip("/")
        if not target.startswith("xl/"):
            target = "xl/" + target
        out.append((sh.get("name"), target))
    return out


def sheet_names(path: str) -> List[str]:
    with zipfile.ZipFile(path) as zf:
        return [name for name, _ in _sheet_parts(zf)]


def _shared_strings(zf: zipfile.ZipFile) -> List[str]:
    try:
        root = ET.fromstring(zf.read("xl/sharedStrings.xml"))
    except KeyError:
        return []
    out = []
    for si in root.iter(f"{_NS}si"):
        out.append("".join(t.text or "" for t in si.iter(f"{_NS}t")))
    return out


def _cell_value(cell, shared: List[str]):
    ctype = cell.get("t", "n")
    if ctype == "inlineStr":
        return "".join(t.text or "" for t in cell.iter(f"{_NS}t"))
    v = cell.find(f"{_NS}v")
    if v is None or v.text is None:
        return None
    if ctype == "s":
        return shared[int(v.text)]
    if ctype == "str":
        return v.text
    if ctype == "b":
        return v.text == "1"
    num = float(v.text)
    return int(num) if num.is_integer() and "e" not in v.text.lower() else num


def read_xlsx(path: str, sheet_name: Union[int, str, None] = 0,
              header: bool = True) -> pd.DataFrame:
    """Read one worksheet into a pandas DataFrame (first row = header)."""
    with zipfile.ZipFile(path) as zf:
        parts = _sheet_parts(zf)
        if isinstance(sheet_name, str):
            matches = [p for n, p in parts if n == sheet_name]
            if not matches:
                raise ValueError(f"no sheet named {sheet_name!r} in {path}")
            part = matches[0]
        else:
            part = parts[sheet_name or 0][1]
        shared = _shared_strings(zf)
        root = ET.fromstring(zf.read(part))
        grid: Dict[int, Dict[int, object]] = {}
        max_col = -1
        for row in root.iter(f"{_NS}row"):
            for cell in row.iter(f"{_NS}c"):
                m = _CELL_REF.match(cell.get("r", ""))
                if not m:
                    continue
                ci, ri = _col_index(m.group(1)), int(m.group(2)) - 1
                grid.setdefault(ri, {})[ci] = _cell_value(cell, shared)
                max_col = max(max_col, ci)
    if not grid:
        return pd.DataFrame()
    n_rows = max(grid) + 1
    rows = [[grid.get(r, {}).get(c) for c in range(max_col + 1)]
            for r in range(n_rows)]
    if header:
        cols = [str(c) if c is not None else f"col{i}"
                for i, c in enumerate(rows[0])]
        return pd.DataFrame(rows[1:], columns=cols)
    return pd.DataFrame(rows)


# ---------------------------------------------------------------------------
# Writer
# ---------------------------------------------------------------------------

def _cell_xml(ref: str, value) -> Optional[str]:
    if value is None or (isinstance(value, float) and value != value):  # NaN
        return None
    if isinstance(value, bool):
        return f'<c r="{ref}" t="b"><v>{1 if value else 0}</v></c>'
    if isinstance(value, float) and value in (float("inf"), float("-inf")):
        return None  # SpreadsheetML has no non-finite number cell
    if isinstance(value, (int, float)):
        return f'<c r="{ref}"><v>{value!r}</v></c>'
    text = escape(str(value))
    return (f'<c r="{ref}" t="inlineStr"><is>'
            f'<t xml:space="preserve">{text}</t></is></c>')


def _sheet_xml(pdf: pd.DataFrame, header: bool = True) -> str:
    lines = ['<?xml version="1.0" encoding="UTF-8" standalone="yes"?>',
             '<worksheet xmlns="http://schemas.openxmlformats.org/'
             'spreadsheetml/2006/main"><sheetData>']
    data_rows: List[List[object]] = []
    if header:
        data_rows.append([str(c) for c in pdf.columns])
    for tup in pdf.itertuples(index=False, name=None):
        data_rows.append(list(tup))
    for ri, vals in enumerate(data_rows):
        cells = []
        for ci, v in enumerate(vals):
            cell = _cell_xml(f"{_col_name(ci)}{ri + 1}", v)
            if cell:
                cells.append(cell)
        lines.append(f'<row r="{ri + 1}">' + "".join(cells) + "</row>")
    lines.append("</sheetData></worksheet>")
    return "".join(lines)


def write_xlsx(path: str, sheets: Dict[str, pd.DataFrame],
               header: bool = True) -> None:
    """Write a {sheet_name: DataFrame} workbook (strings inline, no shared
    string table — every mainstream reader, openpyxl/pandas/Excel, accepts
    inline strings)."""
    if not sheets:
        raise ValueError("write_xlsx needs at least one sheet")
    names = list(sheets)
    content_types = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
        '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.'
        'openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
        + "".join(
            f'<Override PartName="/xl/worksheets/sheet{i + 1}.xml" ContentType='
            '"application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
            for i in range(len(names)))
        + "</Types>")
    root_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
        'officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>'
        "</Relationships>")
    workbook = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
        "<sheets>"
        + "".join(
            f'<sheet name={quoteattr(n)} sheetId="{i + 1}" r:id="rId{i + 1}"/>'
            for i, n in enumerate(names))
        + "</sheets></workbook>")
    wb_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        + "".join(
            f'<Relationship Id="rId{i + 1}" Type="http://schemas.openxmlformats.'
            f'org/officeDocument/2006/relationships/worksheet" '
            f'Target="worksheets/sheet{i + 1}.xml"/>'
            for i in range(len(names)))
        + "</Relationships>")
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("[Content_Types].xml", content_types)
        zf.writestr("_rels/.rels", root_rels)
        zf.writestr("xl/workbook.xml", workbook)
        zf.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        for i, name in enumerate(names):
            zf.writestr(f"xl/worksheets/sheet{i + 1}.xml",
                        _sheet_xml(sheets[name], header=header))
