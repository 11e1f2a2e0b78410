"""Minimal pure-stdlib XLSX codec (zipfile + xml.etree).

The reference reads/writes Excel through pandas+openpyxl
(/root/reference/src/etl.py:143-145); openpyxl is absent in this
container, and XLSX is just a zip of XML parts — so, as with the PNG
codec (functions/png.py), the gate becomes a REAL implementation:

- `write_xlsx(rows, columns, path)` emits a spec-conformant workbook
  with one sheet, a header row, inline strings (no sharedStrings
  part needed on write), and numeric cells for int/float.
- `read_xlsx(path)` parses the first worksheet of any conforming
  producer: shared strings, inline strings, numbers, booleans, and
  blank cells all handled; returns (columns, rows).

Scope: single sheet, values only (no formulas/styles/dates) — exactly
the tabular payload the reference's ETL moves. Anything fancier still
raises, honestly, and the pandas+openpyxl path is preferred when
importable.
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET
import zipfile

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"


def _col_letter(idx: int) -> str:
    """0-based column index -> A, B, ..., Z, AA, ..."""
    out = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        out = chr(ord("A") + rem) + out
    return out


def _col_index(ref: str) -> int:
    """Cell reference 'BC12' -> 0-based column index."""
    letters = re.match(r"[A-Z]+", ref).group(0)
    idx = 0
    for ch in letters:
        idx = idx * 26 + (ord(ch) - ord("A") + 1)
    return idx - 1


def _esc(s: str) -> str:
    return (
        s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
        .replace('"', "&quot;")
    )


def write_xlsx(rows: list[tuple], columns: list[str], path: str) -> None:
    """Write one worksheet: header row of `columns`, then `rows`.
    Strings become inline-string cells, ints/floats numeric cells,
    bools boolean cells, None blank."""

    def cell(ref: str, v) -> str:
        if v is None:
            return f'<c r="{ref}"/>'
        if isinstance(v, bool):
            return f'<c r="{ref}" t="b"><v>{int(v)}</v></c>'
        if isinstance(v, (int, float)):
            return f'<c r="{ref}"><v>{v!r}</v></c>'
        return f'<c r="{ref}" t="inlineStr"><is><t xml:space="preserve">{_esc(str(v))}</t></is></c>'

    lines = ['<?xml version="1.0" encoding="UTF-8" standalone="yes"?>',
             f'<worksheet xmlns="{_NS[1:-1]}"><sheetData>']
    all_rows = [tuple(columns)] + [tuple(r) for r in rows]
    for rn, row in enumerate(all_rows, start=1):
        cells = "".join(
            cell(f"{_col_letter(ci)}{rn}", v) for ci, v in enumerate(row)
        )
        lines.append(f'<row r="{rn}">{cells}</row>')
    lines.append("</sheetData></worksheet>")
    sheet_xml = "".join(lines)

    content_types = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
        '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
        '<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
        "</Types>"
    )
    rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>'
        "</Relationships>"
    )
    workbook = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<workbook xmlns="{_NS[1:-1]}" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
        '<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets></workbook>'
    )
    wb_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>'
        "</Relationships>"
    )
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", content_types)
        z.writestr("_rels/.rels", rels)
        z.writestr("xl/workbook.xml", workbook)
        z.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        z.writestr("xl/worksheets/sheet1.xml", sheet_xml)


def read_xlsx(path: str) -> tuple[list[str], list[tuple]]:
    """Parse the first worksheet -> (header columns, data rows).
    Numbers come back as int when integral else float; shared and
    inline strings as str; blanks as None."""
    with zipfile.ZipFile(path) as z:
        shared: list[str] = []
        if "xl/sharedStrings.xml" in z.namelist():
            root = ET.fromstring(z.read("xl/sharedStrings.xml"))
            for si in root.findall(f"{_NS}si"):
                shared.append("".join(t.text or "" for t in si.iter(f"{_NS}t")))
        sheet_name = next(
            n for n in z.namelist()
            if re.fullmatch(r"xl/worksheets/sheet\d+\.xml", n)
        )
        root = ET.fromstring(z.read(sheet_name))

    def val(c) -> object:
        t = c.get("t")
        v = c.find(f"{_NS}v")
        if t == "inlineStr":
            return "".join(
                el.text or "" for el in c.iter(f"{_NS}t")
            )
        if v is None or v.text is None:
            return None
        if t == "s":
            return shared[int(v.text)]
        if t == "b":
            return v.text == "1"
        if t == "str":
            return v.text
        # Excel numbers ARE IEEE doubles — returning float uniformly
        # keeps a column's cells one type (a per-cell int collapse
        # would hand Spark/pandas mixed int+float columns).
        return float(v.text)

    rows_out: list[list] = []
    for row in root.iter(f"{_NS}row"):
        cells: dict[int, object] = {}
        for c in row.findall(f"{_NS}c"):
            cells[_col_index(c.get("r"))] = val(c)
        width = max(cells, default=-1) + 1
        rows_out.append([cells.get(i) for i in range(width)])
    if not rows_out:
        return [], []
    width = max(len(r) for r in rows_out)
    norm = [tuple(r + [None] * (width - len(r))) for r in rows_out]
    header = [str(x) if x is not None else f"_c{i}" for i, x in enumerate(norm[0])]
    return header, norm[1:]
