"""Minimal ``.xlsx`` binary IO — the S1 workbook scan and S6 annotated-
template sink file formats.

Reference analogues: ``conversion/ReadExcelFile.py:24-105`` reads the
submitted template via xlrd (sheet → rows of strings, empty cells
blank); ``submission/AnnotateTemplate.py:13-214`` writes the same
workbook back with colour-coded cells per validation issue. Neither
xlrd nor openpyxl is assumed here: an xlsx file is a zip of small XML
parts, so the stdlib (zipfile + ElementTree) covers both directions.

Deliberately driver-side: templates are human-authored workbooks
(10^3-10^5 rows, same bound as sources/sheet_ingest.py's name fallback).
Machine-scale data never moves through xlsx — it lands in parquet or
Iceberg and goes through plans/pipeline.py. Date cells are read as their
raw stored strings (the reference's by-name date detection and
leading-zero repair — ReadExcelFile.py:368-378, 446-456 — live in the
sheet logic, not the file format).
"""

from __future__ import annotations

import re
import zipfile
from pathlib import Path
from xml.etree import ElementTree as ET
from xml.sax.saxutils import escape

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_NS_R = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"
_NS_PKG_REL = "{http://schemas.openxmlformats.org/package/2006/relationships}"


# ------------------------------------------------------------------ read

def _col_index(cell_ref: str) -> int:
    """'A1' → 0, 'AB12' → 27."""
    letters = re.match(r"[A-Z]+", cell_ref).group(0)
    idx = 0
    for ch in letters:
        idx = idx * 26 + (ord(ch) - ord("A") + 1)
    return idx - 1


def _shared_strings(zf: zipfile.ZipFile) -> list[str]:
    if "xl/sharedStrings.xml" not in zf.namelist():
        return []
    root = ET.fromstring(zf.read("xl/sharedStrings.xml"))
    out = []
    for si in root.findall(f"{_NS}si"):
        # plain <t> or rich-text runs <r><t>…</t></r>
        out.append("".join(t.text or "" for t in si.iter(f"{_NS}t")))
    return out


def _cell_value(c: ET.Element, shared: list[str]) -> str | None:
    t = c.get("t", "n")
    if t == "inlineStr":
        return "".join(el.text or "" for el in c.iter(f"{_NS}t"))
    v = c.find(f"{_NS}v")
    if v is None or v.text is None:
        return None
    if t == "s":
        return shared[int(v.text)]
    if t == "b":
        return "true" if v.text == "1" else "false"
    return v.text  # numbers / formula strings kept as raw text


def read_workbook(path: str | Path) -> dict[str, list[list[str | None]]]:
    """Workbook → {sheet name: rows}, every cell a string or None.
    Row widths are ragged exactly as stored (callers pad against the
    header row, like the reference's per-row index loop)."""
    out: dict[str, list[list[str | None]]] = {}
    with zipfile.ZipFile(path) as zf:
        shared = _shared_strings(zf)
        wb = ET.fromstring(zf.read("xl/workbook.xml"))
        rels = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
        rid_to_target = {
            r.get("Id"): r.get("Target").lstrip("/")
            for r in rels.findall(f"{_NS_PKG_REL}Relationship")
        }
        for sheet in wb.iter(f"{_NS}sheet"):
            name = sheet.get("name")
            target = rid_to_target[sheet.get(f"{_NS_R}id")]
            if not target.startswith("xl/"):
                target = "xl/" + target
            ws = ET.fromstring(zf.read(target))
            rows: list[list[str | None]] = []
            for row in ws.iter(f"{_NS}row"):
                cells: list[str | None] = []
                for c in row.findall(f"{_NS}c"):
                    idx = _col_index(c.get("r"))
                    while len(cells) < idx:
                        cells.append(None)
                    cells.append(_cell_value(c, shared))
                rows.append(cells)
            out[name] = rows
    return out


def workbook_to_dataframes(spark, path: str | Path) -> dict:
    """S1 bridge: each sheet's first row is the header; remaining rows
    become a string-typed DataFrame ready for sheet_ingest (blank headers
    dropped, short rows padded, pandas-style ``x.1`` dedup applied so
    resolve_headers can flag duplicate attributes)."""
    out = {}
    for name, rows in read_workbook(path).items():
        if not rows:
            continue
        header, body = rows[0], rows[1:]
        cols: list[str] = []
        seen: dict[str, int] = {}
        keep: list[int] = []
        for i, h in enumerate(header):
            if h is None or str(h).strip() == "":
                continue
            h = str(h)
            n = seen.get(h, 0)
            seen[h] = n + 1
            cols.append(h if n == 0 else f"{h}.{n}")
            keep.append(i)
        data = [
            tuple(
                (r[i] if i < len(r) else None) for i in keep
            )
            for r in body
        ]
        schema = ", ".join(f"`{c}` string" for c in cols)
        out[name] = spark.createDataFrame(data, schema)
    return out


def read_cell_styles(path: str | Path, sheet_name: str) -> dict[tuple[int, int], int]:
    """0-based (row, col) → style index for styled cells — lets tests and
    downstream tooling recover the error/warning colour coding."""
    with zipfile.ZipFile(path) as zf:
        wb = ET.fromstring(zf.read("xl/workbook.xml"))
        rels = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
        rid_to_target = {
            r.get("Id"): r.get("Target").lstrip("/")
            for r in rels.findall(f"{_NS_PKG_REL}Relationship")
        }
        target = None
        for sheet in wb.iter(f"{_NS}sheet"):
            if sheet.get("name") == sheet_name:
                target = rid_to_target[sheet.get(f"{_NS_R}id")]
        if target is None:
            raise KeyError(f"no sheet {sheet_name!r}")
        if not target.startswith("xl/"):
            target = "xl/" + target
        ws = ET.fromstring(zf.read(target))
        out: dict[tuple[int, int], int] = {}
        for row in ws.iter(f"{_NS}row"):
            ri = int(row.get("r")) - 1
            for c in row.findall(f"{_NS}c"):
                s = c.get("s")
                if s and int(s):
                    out[(ri, _col_index(c.get("r")))] = int(s)
        return out


# ----------------------------------------------------------------- write

_STYLES_XML = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
<fonts count="1"><font><sz val="11"/><name val="Calibri"/></font></fonts>
<fills count="4">
<fill><patternFill patternType="none"/></fill>
<fill><patternFill patternType="gray125"/></fill>
<fill><patternFill patternType="solid"><fgColor rgb="FFFFC7CE"/><bgColor rgb="FFFFC7CE"/></patternFill></fill>
<fill><patternFill patternType="solid"><fgColor rgb="FFFFEB9C"/><bgColor rgb="FFFFEB9C"/></patternFill></fill>
</fills>
<borders count="1"><border/></borders>
<cellStyleXfs count="1"><xf/></cellStyleXfs>
<cellXfs count="3">
<xf xfId="0"/>
<xf xfId="0" fillId="2" applyFill="1"/>
<xf xfId="0" fillId="3" applyFill="1"/>
</cellXfs>
</styleSheet>
"""

STYLE_NONE, STYLE_ERROR, STYLE_WARNING = 0, 1, 2


def _col_letter(idx: int) -> str:
    letters = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        letters = chr(ord("A") + rem) + letters
    return letters


def _sheet_xml(
    rows: list[list[str | None]],
    styles: dict[tuple[int, int], int] | None,
) -> str:
    parts = [
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>',
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">',
        "<sheetData>",
    ]
    styles = styles or {}
    for ri, row in enumerate(rows):
        parts.append(f'<row r="{ri + 1}">')
        for ci, val in enumerate(row):
            if val is None:
                continue
            ref = f"{_col_letter(ci)}{ri + 1}"
            s = styles.get((ri, ci), STYLE_NONE)
            s_attr = f' s="{s}"' if s else ""
            parts.append(
                f'<c r="{ref}" t="inlineStr"{s_attr}><is><t xml:space="preserve">'
                f"{escape(str(val))}</t></is></c>"
            )
        parts.append("</row>")
    parts.append("</sheetData></worksheet>")
    return "".join(parts)


def write_workbook(
    path: str | Path,
    sheets: dict[str, list[list[str | None]]],
    styles: dict[str, dict[tuple[int, int], int]] | None = None,
) -> Path:
    """Write a minimal valid ``.xlsx``: inline strings only, one style
    each for error (red fill) / warning (yellow fill) cells — the
    AnnotateTemplate colour scheme. ``styles[sheet][(row, col)]`` uses
    0-based data coordinates including the header row."""
    path = Path(path)
    names = list(sheets)
    styles = styles or {}
    ct = [
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>',
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">',
        '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>',
        '<Default Extension="xml" ContentType="application/xml"/>',
        '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>',
        '<Override PartName="/xl/styles.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.styles+xml"/>',
    ]
    for i in range(len(names)):
        ct.append(
            f'<Override PartName="/xl/worksheets/sheet{i + 1}.xml" '
            'ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
        )
    ct.append("</Types>")

    wb = [
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>',
        '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">',
        "<sheets>",
    ]
    wb_rels = [
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>',
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">',
    ]
    for i, name in enumerate(names):
        # attribute context: quotes must also be escaped
        safe = escape(name, {'"': "&quot;"})
        wb.append(
            f'<sheet name="{safe}" sheetId="{i + 1}" r:id="rId{i + 1}"/>'
        )
        wb_rels.append(
            f'<Relationship Id="rId{i + 1}" '
            'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" '
            f'Target="worksheets/sheet{i + 1}.xml"/>'
        )
    wb.append("</sheets></workbook>")
    wb_rels.append(
        f'<Relationship Id="rId{len(names) + 1}" '
        'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/styles" '
        'Target="styles.xml"/>'
    )
    wb_rels.append("</Relationships>")

    root_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" '
        'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" '
        'Target="xl/workbook.xml"/></Relationships>'
    )

    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("[Content_Types].xml", "".join(ct))
        zf.writestr("_rels/.rels", root_rels)
        zf.writestr("xl/workbook.xml", "".join(wb))
        zf.writestr("xl/_rels/workbook.xml.rels", "".join(wb_rels))
        zf.writestr("xl/styles.xml", _STYLES_XML)
        for i, name in enumerate(names):
            zf.writestr(
                f"xl/worksheets/sheet{i + 1}.xml",
                _sheet_xml(sheets[name], styles.get(name)),
            )
    return path


def write_annotated_workbook(
    path: str | Path,
    sheets: dict[str, list[list[str | None]]],
    violations,
    name_col: str = "name",
    sheet_name_field: str | None = None,
) -> Path:
    """S6 sink: re-emit the workbook with issue cells colour-coded (red =
    error, yellow = warning) and one trailing ``issues`` column per row
    holding the '|'-joined ``severity:field:message`` list — the
    AnnotateTemplate overlay (submission/AnnotateTemplate.py:13-214)
    restated for the minimal writer.

    ``violations`` is the validate_workbook output: a DataFrame with
    (sheet, name, field, severity, message); ``sheet_name_field`` names
    the workbook column holding record names (defaults to the record-name
    derivation's field, e.g. 'sample_name'; rows fall back to
    '{sheet}_{row}' exactly like validate_sheet). Collected driver-side —
    violations are template-sized by definition here."""
    by_sheet: dict[str, dict[str, list]] = {}
    for r in violations.collect():
        by_sheet.setdefault(r["sheet"], {}).setdefault(r[name_col], []).append(
            (r["field"], r["severity"], r["message"])
        )

    out_sheets: dict[str, list[list[str | None]]] = {}
    out_styles: dict[str, dict[tuple[int, int], int]] = {}
    for name, rows in sheets.items():
        if not rows:
            out_sheets[name] = rows
            continue
        header = list(rows[0]) + ["issues"]
        col_of = {str(h): i for i, h in enumerate(rows[0]) if h is not None}
        sheet_viol = by_sheet.get(name, {})
        name_idx = col_of.get(sheet_name_field or name_col)
        body_out: list[list[str | None]] = []
        styles: dict[tuple[int, int], int] = {}
        for ri, row in enumerate(rows[1:], start=1):
            row = list(row) + [None] * (len(rows[0]) - len(row))
            # same normalization as validate_sheet: a whitespace-only name
            # cell is ABSENT (trim→''→NULL there), so its violations are
            # keyed by the '{sheet}_{row}' fallback — matching here keeps
            # those rows' issues attached and coloured
            cell = row[name_idx] if name_idx is not None else None
            rec_name = (
                str(cell)
                if cell is not None and str(cell).strip() != ""
                else f"{name}_{ri}"
            )
            issues = sheet_viol.get(rec_name, [])
            for fld, severity, _msg in issues:
                ci = col_of.get(fld)
                if ci is not None:
                    style = STYLE_ERROR if severity == "error" else STYLE_WARNING
                    # error outranks warning when both hit one cell
                    if styles.get((ri, ci)) != STYLE_ERROR:
                        styles[(ri, ci)] = style
            body_out.append(
                row
                + [
                    "|".join(
                        f"{sev}:{fld}:{msg}"
                        for fld, sev, msg in sorted(issues)
                    )
                    or None
                ]
            )
        out_sheets[name] = [header] + body_out
        out_styles[name] = styles
    return write_workbook(path, out_sheets, out_styles)
