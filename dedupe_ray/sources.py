"""File sources: CSV (A1), Excel (A2), multi-file union (A3), field
auto-detection glue (A4).

Reference semantics (backend/dedupe_script.py:44-136): each file is read
fully, tagged with a ``source_file`` column (basename), concatenated in
input order, and record ids are the stringified 0-based row index of the
concatenation. The app caps inputs at 100 MB/file (README.md:88), so the
app-parity readers parse driver-side (pyarrow.csv C reader / a minimal
zip+XML xlsx parser — openpyxl is not available in this environment) and
ship shards into the object store via ``ray.data.from_arrow``.

For data at Ray scale, ``read_csv_stream`` wraps ``ray.data.read_csv``
(fully streaming, parallel) and requires the caller to provide a real id
column — positional ids cannot exist in a parallel read.
"""

from __future__ import annotations

import os
import re
import zipfile
from xml.etree import ElementTree

import numpy as np
import pyarrow as pa
import pyarrow.csv as pacsv

import ray.data

_SSML = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_CELL_REF = re.compile(r"([A-Z]+)(\d+)")


def _col_index(ref: str) -> int:
    """Cell reference column letters → 0-based index ('A'→0, 'AB'→27)."""
    m = _CELL_REF.match(ref)
    n = 0
    for ch in (m.group(1) if m else "A"):
        n = n * 26 + (ord(ch) - 64)
    return n - 1


def _format_number(text: str) -> str:
    """Numeric cell text → the string pandas+str() would produce
    (integral floats lose the trailing .0: 84600000.0 → '84600000')."""
    try:
        f = float(text)
    except ValueError:
        return text
    if f.is_integer() and "e" not in text.lower():
        return str(int(f))
    return text


def read_excel_table(path: str) -> pa.Table:
    """Parse the first worksheet of an .xlsx into an all-string Arrow table
    (header row = column names) + ``source_file`` column.

    Minimal OOXML reader: sharedStrings + first sheet, cells positioned by
    their r= reference (gaps become empty strings). Covers the reference's
    shipped fixtures (KNA2.xlsx family); no formulas/dates/styles."""
    with zipfile.ZipFile(path) as z:
        names = set(z.namelist())
        shared: list[str] = []
        if "xl/sharedStrings.xml" in names:
            root = ElementTree.fromstring(z.read("xl/sharedStrings.xml"))
            for si in root.iter(f"{_SSML}si"):
                # concatenate all <t> runs (rich text splits into runs)
                shared.append("".join(t.text or "" for t in si.iter(f"{_SSML}t")))
        # first sheet: workbook order; target resolved via rels when present
        sheet_path = "xl/worksheets/sheet1.xml"
        if "xl/_rels/workbook.xml.rels" in names:
            wb = ElementTree.fromstring(z.read("xl/workbook.xml"))
            rels = ElementTree.fromstring(z.read("xl/_rels/workbook.xml.rels"))
            rel_ns = "{http://schemas.openxmlformats.org/package/2006/relationships}"
            rid_ns = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}id"
            targets = {
                r.get("Id"): r.get("Target")
                for r in rels.iter(f"{rel_ns}Relationship")
            }
            first_sheet = next(wb.iter(f"{_SSML}sheet"), None)
            if first_sheet is not None:
                t = targets.get(first_sheet.get(rid_ns), "worksheets/sheet1.xml")
                sheet_path = t if t.startswith("xl/") else f"xl/{t}"
        rows: list[dict[int, str]] = []
        max_col = 0
        sheet = ElementTree.fromstring(z.read(sheet_path))
        for row in sheet.iter(f"{_SSML}row"):
            cells: dict[int, str] = {}
            auto_col = 0
            for c in row.iter(f"{_SSML}c"):
                ref = c.get("r")
                col = _col_index(ref) if ref else auto_col
                auto_col = col + 1
                t = c.get("t")
                v = c.find(f"{_SSML}v")
                if t == "s":
                    val = shared[int(v.text)] if v is not None and v.text else ""
                elif t == "inlineStr":
                    is_el = c.find(f"{_SSML}is")
                    val = "".join(x.text or "" for x in is_el.iter(f"{_SSML}t")) if is_el is not None else ""
                elif t in ("str", "b", "e"):
                    val = v.text or "" if v is not None else ""
                else:  # numeric
                    val = _format_number(v.text) if v is not None and v.text else ""
                cells[col] = val
                max_col = max(max_col, col + 1)
            rows.append(cells)
    if not rows:
        return pa.table({"source_file": pa.array([], pa.string())})
    header_cells = rows[0]
    headers = [header_cells.get(i, f"col{i}") or f"col{i}" for i in range(max_col)]
    cols: list[list[str]] = [[] for _ in range(max_col)]
    for r in rows[1:]:
        for i in range(max_col):
            cols[i].append(r.get(i, ""))
    data = {h: pa.array(c, pa.string()) for h, c in zip(headers, cols)}
    data["source_file"] = pa.array([os.path.basename(path)] * len(rows[1:]), pa.string())
    return pa.table(data)


def read_csv_table(path: str) -> pa.Table:
    """CSV → all-string Arrow table + ``source_file`` (pyarrow C reader;
    every column read as string so values match preprocess() input exactly
    — no float round-trips)."""
    tbl = pacsv.read_csv(
        path, read_options=pacsv.ReadOptions(use_threads=True)
    )
    data = {}
    for name in tbl.column_names:
        col = tbl.column(name)
        if not pa.types.is_string(col.type):
            col = pa.compute.cast(col, pa.string())
        data[name] = pa.compute.fill_null(col, "")
    data["source_file"] = pa.array([os.path.basename(path)] * len(tbl), pa.string())
    return pa.table(data)


def _shard_to_dataset(tbl: pa.Table, shard_rows: int = 50_000) -> "ray.data.Dataset":
    shards = [tbl.slice(s, shard_rows) for s in range(0, max(len(tbl), 1), shard_rows)]
    return ray.data.from_arrow(shards)


def read_input_files(
    paths: list[str],
    id_column: str = "doc_id",
    shard_rows: int = 50_000,
) -> "ray.data.Dataset":
    """A3 semantics: read each file by extension, concatenate in order, and
    assign ``doc_id`` = stringified global row index (the reference's
    positional record id, dedupe_script.py:41 — made explicit as a column
    because Ray block order is not stable)."""
    tables = []
    offset = 0
    for p in paths:
        if p.lower().endswith((".xlsx", ".xls")):
            t = read_excel_table(p)
        else:
            t = read_csv_table(p)
        ids = pa.array([str(i) for i in range(offset, offset + len(t))], pa.string())
        tables.append(t.append_column(id_column, ids))
        offset += len(t)
    if not tables:
        raise ValueError("no input files")
    # unify schemas: union of columns, missing filled with ""
    all_cols: list[str] = []
    for t in tables:
        for c in t.column_names:
            if c not in all_cols:
                all_cols.append(c)
    aligned = []
    for t in tables:
        data = {}
        for c in all_cols:
            if c in t.column_names:
                data[c] = t.column(c)
            else:
                data[c] = pa.array([""] * len(t), pa.string())
        aligned.append(pa.table(data))
    merged = pa.concat_tables(aligned)
    return _shard_to_dataset(merged, shard_rows)


def read_csv_stream(
    paths: list[str] | str, source_tag: str | None = None
) -> "ray.data.Dataset":
    """Scale path: streaming parallel CSV via ray.data.read_csv; adds a
    ``source_file`` literal when ``source_tag`` given. The caller must
    supply/derive a stable id column — positional ids don't exist in a
    parallel read."""
    ds = ray.data.read_csv(paths)
    if source_tag is not None:
        def tag(b: pa.Table) -> pa.Table:
            return b.append_column("source_file", pa.array([source_tag] * len(b), pa.string()))

        ds = ds.map_batches(tag, batch_format="pyarrow")
    return ds


def detect_fields(ds_or_table) -> list[dict]:
    """A4: every non-metadata column becomes {'field', 'type': 'String',
    'has_missing': True} (dedupe_script.py:159-162)."""
    names = (
        ds_or_table.column_names
        if hasattr(ds_or_table, "column_names")
        else [f.name for f in ds_or_table.schema()]
    )
    return [
        {"field": n, "type": "String", "has_missing": True}
        for n in names
        if n not in ("source_file", "doc_id", "spans")
    ]
