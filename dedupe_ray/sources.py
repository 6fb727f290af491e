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
from datetime import datetime, timedelta
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


# Builtin OOXML number-format ids that render as dates / times (ECMA-376
# §18.8.30): 14-17/22 date(+time), 27-31/35/36/50-58 East-Asian dates,
# 18-21/32-34/45-47 times.
_BUILTIN_DATE_FMT = frozenset({14, 15, 16, 17, 22, 27, 28, 29, 30, 31,
                               35, 36, 50, 51, 52, 53, 54, 55, 56, 57, 58})
_BUILTIN_TIME_FMT = frozenset({18, 19, 20, 21, 32, 33, 34, 45, 46, 47})
_FMT_NOISE = re.compile(r'"[^"]*"|\[[^\]]*\]|\\.')


def _custom_fmt_kind(code: str) -> str | None:
    """Classify a custom number-format code as 'date', 'time', or None,
    after stripping quoted literals / [bracket] sections / escapes (the
    same token test openpyxl's is_date_format applies)."""
    c = _FMT_NOISE.sub("", code or "")
    if re.search(r"[dyDY]", c):
        return "date"
    if re.search(r"[hsHS]", c):
        return "time"
    if re.search(r"[mM]", c):  # month-only codes like mmm (minutes need h/s)
        return "date"
    return None


def _style_date_kinds(z: zipfile.ZipFile, names: set[str]) -> list[str | None]:
    """Per-cellXf-index date classification from xl/styles.xml."""
    if "xl/styles.xml" not in names:
        return []
    root = ElementTree.fromstring(z.read("xl/styles.xml"))
    custom = {
        int(nf.get("numFmtId")): nf.get("formatCode") or ""
        for nf in root.iter(f"{_SSML}numFmt")
    }
    cellxfs = root.find(f"{_SSML}cellXfs")
    if cellxfs is None:
        return []
    kinds: list[str | None] = []
    for xf in cellxfs.findall(f"{_SSML}xf"):
        fid = int(xf.get("numFmtId") or 0)
        if fid in _BUILTIN_DATE_FMT:
            kinds.append("date")
        elif fid in _BUILTIN_TIME_FMT:
            kinds.append("time")
        elif fid in custom:
            kinds.append(_custom_fmt_kind(custom[fid]))
        else:
            kinds.append(None)
    return kinds


def _serial_to_text(serial: float, kind: str, date1904: bool) -> str:
    """Excel date serial → the string str(pandas-read cell) would produce:
    'YYYY-MM-DD HH:MM:SS' for dates, 'HH:MM:SS' for sub-day time values.
    Epoch 1899-12-30 (or 1904-01-01 for Mac workbooks); serials rounded to
    whole seconds, matching openpyxl's sub-second clamp. Serials below 61
    in 1900 mode predate Excel's phantom 1900-02-29 and shift one day —
    dates before 1900-03-01 don't occur in tabular business data."""
    base = datetime(1904, 1, 1) if date1904 else datetime(1899, 12, 30)
    dt = base + timedelta(seconds=round(serial * 86400))
    if kind == "time" and 0 <= serial < 1:
        return dt.strftime("%H:%M:%S")
    return dt.strftime("%Y-%m-%d %H:%M:%S")


def _workbook_sheets(z: zipfile.ZipFile, names: set[str]) -> list[tuple[str, str]]:
    """[(sheet name, zip path)] in workbook order, targets resolved via the
    workbook relationship part when present."""
    if "xl/workbook.xml" not in names:
        return [("Sheet1", "xl/worksheets/sheet1.xml")]
    wb = ElementTree.fromstring(z.read("xl/workbook.xml"))
    targets: dict[str, str] = {}
    if "xl/_rels/workbook.xml.rels" in names:
        rels = ElementTree.fromstring(z.read("xl/_rels/workbook.xml.rels"))
        rel_ns = "{http://schemas.openxmlformats.org/package/2006/relationships}"
        targets = {
            r.get("Id"): r.get("Target") for r in rels.iter(f"{rel_ns}Relationship")
        }
    rid_ns = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}id"
    out = []
    for i, s in enumerate(wb.iter(f"{_SSML}sheet")):
        t = targets.get(s.get(rid_ns), f"worksheets/sheet{i + 1}.xml")
        if t.startswith("/"):
            t = t[1:]
        out.append((s.get("name") or f"Sheet{i + 1}",
                    t if t.startswith("xl/") else f"xl/{t}"))
    return out or [("Sheet1", "xl/worksheets/sheet1.xml")]


def excel_sheet_names(path: str) -> list[str]:
    """Worksheet names in workbook order (pandas ExcelFile.sheet_names)."""
    with zipfile.ZipFile(path) as z:
        return [n for n, _ in _workbook_sheets(z, set(z.namelist()))]


def _workbook_date1904(z: zipfile.ZipFile, names: set[str]) -> bool:
    if "xl/workbook.xml" not in names:
        return False
    wb = ElementTree.fromstring(z.read("xl/workbook.xml"))
    pr = wb.find(f"{_SSML}workbookPr")
    return pr is not None and (pr.get("date1904") or "").lower() in ("1", "true")


def read_excel_table(path: str, sheet: int | str = 0) -> pa.Table:
    """Parse one worksheet of an .xlsx into an all-string Arrow table
    (header row = column names) + ``source_file`` column.

    Minimal OOXML reader (openpyxl is not available in this environment):
    sharedStrings / inline strings, cells positioned by their r= reference
    (gaps become empty strings), formula cells read through their cached
    ``<v>`` result, booleans → 'True'/'False', and date/time-styled numeric
    cells rendered via styles.xml the way the reference's pandas+str()
    round-trip would (dedupe_script.py reads with read_excel then
    stringifies every cell). ``sheet`` selects a worksheet by 0-based
    index or by name (default: first sheet, pandas' default)."""
    with zipfile.ZipFile(path) as z:
        names = set(z.namelist())
        shared: list[str] = []
        if "xl/sharedStrings.xml" in names:
            root = ElementTree.fromstring(z.read("xl/sharedStrings.xml"))
            for si in root.iter(f"{_SSML}si"):
                # concatenate all <t> runs (rich text splits into runs)
                shared.append("".join(t.text or "" for t in si.iter(f"{_SSML}t")))
        sheets = _workbook_sheets(z, names)
        if isinstance(sheet, str):
            matches = [p for n, p in sheets if n == sheet]
            if not matches:
                raise ValueError(
                    f"no sheet named {sheet!r} in {path} "
                    f"(have: {[n for n, _ in sheets]})"
                )
            sheet_path = matches[0]
        else:
            if not 0 <= sheet < len(sheets):
                raise ValueError(f"sheet index {sheet} out of range in {path}")
            sheet_path = sheets[sheet][1]
        date_kinds = _style_date_kinds(z, names)
        date1904 = _workbook_date1904(z, names)
        rows: list[dict[int, str]] = []
        max_col = 0
        sheet_root = ElementTree.fromstring(z.read(sheet_path))
        for row in sheet_root.iter(f"{_SSML}row"):
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
                elif t == "b":
                    val = ("True" if v.text.strip() == "1" else "False") if v is not None and v.text else ""
                elif t in ("str", "e"):
                    val = v.text or "" if v is not None else ""
                else:  # numeric (plain or formula-cached value)
                    if v is not None and v.text:
                        s_attr = c.get("s")
                        kind = None
                        if s_attr and s_attr.isdigit() and int(s_attr) < len(date_kinds):
                            kind = date_kinds[int(s_attr)]
                        if kind is not None:
                            try:
                                val = _serial_to_text(float(v.text), kind, date1904)
                            except (ValueError, OverflowError):
                                val = _format_number(v.text)
                        else:
                            val = _format_number(v.text)
                    else:
                        val = ""
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


def read_jsonl(path: str, **kwargs) -> "ray.data.Dataset":
    """JSONL source (one JSON object per line — the interchange format of
    LLM training-data pipelines). Thin seam over ``ray.data.read_json``
    (pyarrow JSON reader: parallel per-file tasks, schema unified across
    files); the seam exists so call sites survive a reader swap the same
    way ``io_utils.read_table`` isolates parquet."""
    import ray.data

    return ray.data.read_json(path, **kwargs)


def write_jsonl(ds: "ray.data.Dataset", path: str) -> None:
    """JSONL sink: one ``.json`` shard per block (line-delimited objects),
    written atomically into ``path`` via a tmp-dir rename so a crashed
    write never leaves a half-readable directory."""
    import os
    import shutil

    shutil.rmtree(path, ignore_errors=True)
    tmp = path + ".__tmp__"
    shutil.rmtree(tmp, ignore_errors=True)
    ds.write_json(tmp)
    os.replace(tmp, path)


def read_jsonl_gz(
    paths: list[str] | str, columns: list[str] | None = None
) -> "ray.data.Dataset":
    """Gzip-compressed JSONL source (``*.jsonl.gz`` — the format most LLM
    training corpora actually ship as): one decode task per file over
    ``ray.data.read_binary_files`` (streaming, parallel), stdlib inflate
    + pyarrow JSON parse per file. ``columns`` prunes right after the
    parse — JSON is row-major, so the projection saves shuffle/heap
    bytes downstream, not parse time."""
    import gzip

    from pyarrow import json as pa_json

    ds = ray.data.read_binary_files(paths)

    def decode(b: pa.Table) -> pa.Table:
        tables = []
        for buf in b.column("bytes"):
            raw = buf.as_py()
            # read_binary_files inflates *.gz itself (Arrow infers the
            # codec from the extension); keep the magic check so renamed
            # or pre-read bytes still decode
            if raw[:2] == b"\x1f\x8b":
                raw = gzip.decompress(raw)
            t = pa_json.read_json(pa.BufferReader(raw))
            if columns is not None:
                t = t.select(columns)
            tables.append(t)
        return pa.concat_tables(tables, promote_options="default")

    return ds.map_batches(decode, batch_format="pyarrow")


def write_jsonl_gz(ds: "ray.data.Dataset", path: str, compresslevel: int = 6) -> None:
    """Gzip JSONL sink: one ``.jsonl.gz`` shard per block (gzip mtime
    pinned to 0 so identical content compresses to identical bytes),
    tmp-dir + atomic rename — the standard resumable-output contract."""
    import gzip

    def shard(t: pa.Table, p: str) -> None:
        payload = t.to_pandas().to_json(
            orient="records", lines=True, force_ascii=False, date_format="iso"
        )
        if not payload.endswith("\n"):
            payload += "\n"
        with open(p, "wb") as f:
            f.write(gzip.compress(payload.encode(), compresslevel, mtime=0))

    _write_sharded(ds, path, "jsonl.gz", shard)


def read_jsonl_zst(
    paths: list[str] | str, columns: list[str] | None = None
) -> "ray.data.Dataset":
    """Zstd-compressed JSONL source (``*.jsonl.zst`` — the other format
    large corpora ship as, e.g. The Pile / RedPajama shards): same shape
    as :func:`read_jsonl_gz` — one decode task per file, pyarrow's
    bundled zstd (streaming ``pa.input_stream``, no frame-size
    requirement) + pyarrow JSON parse. ``read_binary_files`` inflates
    ``*.zst`` itself (Arrow infers the codec from the extension); the
    0x28B52FFD magic check keeps renamed or pre-read bytes working."""
    from pyarrow import json as pa_json

    ds = ray.data.read_binary_files(paths)

    def decode(b: pa.Table) -> pa.Table:
        tables = []
        for buf in b.column("bytes"):
            raw = buf.as_py()
            if raw[:4] == b"\x28\xb5\x2f\xfd":
                with pa.input_stream(
                    pa.BufferReader(raw), compression="zstd"
                ) as f:
                    raw = f.read()
            t = pa_json.read_json(pa.BufferReader(raw))
            if columns is not None:
                t = t.select(columns)
            tables.append(t)
        return pa.concat_tables(tables, promote_options="default")

    return ds.map_batches(decode, batch_format="pyarrow")


def write_jsonl_zst(ds: "ray.data.Dataset", path: str) -> None:
    """Zstd JSONL sink: one ``.jsonl.zst`` shard per block (zstd frames
    carry no timestamp, so identical content compresses to identical
    bytes), tmp-dir + atomic rename — same resumable-output contract as
    the gzip sink."""

    def shard(t: pa.Table, p: str) -> None:
        payload = t.to_pandas().to_json(
            orient="records", lines=True, force_ascii=False, date_format="iso"
        )
        if not payload.endswith("\n"):
            payload += "\n"
        with pa.output_stream(p, compression="zstd") as f:
            f.write(payload.encode())

    _write_sharded(ds, path, "jsonl.zst", shard)


def read_orc(paths: list[str] | str, columns: list[str] | None = None) -> "ray.data.Dataset":
    """Distributed ORC source: one decode task per file over
    ``ray.data.read_binary_files`` (streaming, parallel) → ``pyarrow.orc``
    per file. Shard layout is one file per written block (see
    :func:`write_orc`), so per-file task granularity IS the shard
    granularity; a per-stripe split would drop in here if single files
    outgrew a task. ``columns`` prunes at the decode (ORC is columnar —
    only requested column streams are materialized)."""
    ds = ray.data.read_binary_files(paths)

    def decode(b: pa.Table) -> pa.Table:
        from pyarrow import orc

        tables = []
        for buf in b.column("bytes"):
            f = orc.ORCFile(pa.BufferReader(buf.as_py()))
            tables.append(f.read(columns=columns))
        return pa.concat_tables(tables)

    return ds.map_batches(decode, batch_format="pyarrow")


def read_feather(paths: list[str] | str, columns: list[str] | None = None) -> "ray.data.Dataset":
    """Arrow IPC (Feather V2) source — same per-file decode shape as
    :func:`read_orc`; IPC is the zero-copy interchange format, so the
    decode is a buffer walk, not a parse."""
    ds = ray.data.read_binary_files(paths)

    def decode(b: pa.Table) -> pa.Table:
        tables = []
        for buf in b.column("bytes"):
            t = pa.ipc.open_file(pa.BufferReader(buf.as_py())).read_all()
            if columns is not None:
                t = t.select(columns)
            tables.append(t)
        return pa.concat_tables(tables)

    return ds.map_batches(decode, batch_format="pyarrow")


def _write_sharded(ds: "ray.data.Dataset", path: str, ext: str, write_shard) -> None:
    """Shared sharded-sink shape: each block writes its own ``shard-*.{ext}``
    into a tmp dir (uuid names — Ray may retry a task; the count() barrier
    ensures every retry's winner is complete before the atomic rename
    publishes the directory)."""
    import shutil
    import uuid

    shutil.rmtree(path, ignore_errors=True)
    tmp = path + ".__tmp__"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)

    def sink(t: pa.Table) -> pa.Table:
        if len(t):
            write_shard(t, os.path.join(tmp, f"shard-{uuid.uuid4().hex}.{ext}"))
        return pa.table({"rows": pa.array([len(t)], pa.int64())})

    ds.map_batches(sink, batch_format="pyarrow").count()
    os.replace(tmp, path)


def write_orc(ds: "ray.data.Dataset", path: str) -> None:
    """ORC sink: one ``.orc`` shard per block, tmp-dir + atomic rename (a
    crashed write never leaves a half-readable directory — the same
    resumable-output contract as the parquet/JSONL sinks)."""

    def shard(t: pa.Table, p: str) -> None:
        from pyarrow import orc

        orc.write_table(t, p)

    _write_sharded(ds, path, "orc", shard)


def write_feather(ds: "ray.data.Dataset", path: str) -> None:
    """Arrow IPC (Feather V2) sink — same sharded atomic layout as
    :func:`write_orc`."""

    def shard(t: pa.Table, p: str) -> None:
        with pa.ipc.new_file(p, t.schema) as w:
            w.write_table(t)

    _write_sharded(ds, path, "feather", shard)

def read_avro(paths: list[str] | str, columns: list[str] | None = None) -> "ray.data.Dataset":
    """Avro Object Container File source (flat null-union records; see
    :mod:`dedupe_ray.avro_codec`): one decode task per file over
    ``ray.data.read_binary_files`` — the same per-file shard granularity
    as :func:`read_orc`. Avro is row-major, so ``columns`` prunes after
    the row walk (decode cost is per-row regardless; the projection
    saves shuffle/heap bytes downstream, not parse time)."""
    ds = ray.data.read_binary_files(paths)

    def decode(b: pa.Table) -> pa.Table:
        from dedupe_ray.avro_codec import decode_file

        tables = [
            decode_file(buf.as_py(), columns=columns) for buf in b.column("bytes")
        ]
        return pa.concat_tables(tables)

    return ds.map_batches(decode, batch_format="pyarrow")


def write_avro(ds: "ray.data.Dataset", path: str, codec: str = "deflate") -> None:
    """Avro sink: one ``.avro`` container per block (deflate blocks),
    tmp-dir + atomic rename — the standard resumable-output contract."""

    def shard(t: pa.Table, p: str) -> None:
        from dedupe_ray.avro_codec import encode_table

        with open(p, "wb") as f:
            f.write(encode_table(t, codec=codec))

    _write_sharded(ds, path, "avro", shard)


def write_npz(
    ds: "ray.data.Dataset",
    path: str,
    id_column: str = "vec_id",
    vec_column: str = "embedding",
) -> None:
    """Embedding-matrix sink: one ``.npz`` shard per block holding the
    int64 id vector and the float32 matrix — the format embedding dumps
    actually ship between training jobs. Shards are named by a content
    sha1 (re-running a finished partition rewrites the same file → the
    sink is resumable/idempotent), written into a tmp dir and renamed
    whole so a crashed run never leaves a half-readable directory."""
    import hashlib
    import io
    import os
    import shutil

    import numpy as np

    shutil.rmtree(path, ignore_errors=True)
    tmp = path + ".__tmp__"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp)

    def write_block(b: pa.Table) -> pa.Table:
        ids = b.column(id_column).to_numpy(zero_copy_only=False).astype(np.int64)
        col = b.column(vec_column)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        mat = (
            col.flatten()
            .to_numpy(zero_copy_only=False)
            .astype(np.float32)
            .reshape(len(b), -1)
        )
        buf = io.BytesIO()
        np.savez(buf, vec_id=ids, embedding=mat)
        data = buf.getvalue()
        name = hashlib.sha1(data).hexdigest()[:16] + ".npz"
        with open(os.path.join(tmp, name), "wb") as f:
            f.write(data)
        return pa.table({"rows": pa.array([len(b)], pa.int64())})

    ds.map_batches(write_block, batch_format="pyarrow").count()  # drive it
    os.replace(tmp, path)


def read_npz(paths: list[str] | str) -> "ray.data.Dataset":
    """Embedding-matrix source: one decode task per ``.npz`` shard over
    ``read_binary_files`` (streaming, parallel) back to
    (vec_id int64, embedding list<float>)."""
    import io

    import numpy as np

    ds = ray.data.read_binary_files(paths)

    def decode(b: pa.Table) -> pa.Table:
        tables = []
        for buf in b.column("bytes"):
            z = np.load(io.BytesIO(buf.as_py()))
            ids, mat = z["vec_id"], z["embedding"]
            tables.append(
                pa.table(
                    {
                        "vec_id": pa.array(ids, pa.int64()),
                        "embedding": pa.array(
                            list(mat), pa.list_(pa.float32())
                        ),
                    }
                )
            )
        return pa.concat_tables(tables)

    return ds.map_batches(decode, batch_format="pyarrow")


def write_fixed_width(
    ds: "ray.data.Dataset", path: str, widths: list[tuple[str, int]]
) -> None:
    """Fixed-width text sink (the mainframe/legacy-feed interchange format):
    every column renders left-aligned and space-padded to its declared
    BYTE width, one record per line, one shard per block with the
    tmp-dir + atomic-rename resumable contract. A value longer than its
    width raises (silent truncation would corrupt the round-trip)."""

    def shard(t: pa.Table, p: str) -> None:
        import pyarrow.compute as pc

        cols = []
        for name, w in widths:
            s = pc.cast(t.column(name), pa.string()).to_pylist()
            rendered = []
            for v in s:
                v = "" if v is None else v
                b = v.encode()
                if len(b) > w:
                    raise ValueError(
                        f"value {v!r} exceeds fixed width {w} for column {name}"
                    )
                rendered.append(b.ljust(w))
            cols.append(rendered)
        with open(p, "wb") as f:
            for row in zip(*cols):
                f.write(b"".join(row) + b"\n")

    _write_sharded(ds, path, "fw", shard)


def read_fixed_width(
    paths: list[str] | str,
    widths: list[tuple[str, int]],
    schema: "pa.Schema | None" = None,
) -> "ray.data.Dataset":
    """Fixed-width text source: one decode task per file over
    ``read_binary_files``; the byte matrix reshapes in numpy and every
    column is ONE contiguous slice + rtrim — no per-row parsing. Numeric
    columns (declare them via ``schema``) are stripped both sides before
    the cast, matching the writer's left-aligned padding."""
    import pyarrow.compute as pc

    line_w = sum(w for _, w in widths) + 1  # trailing newline

    ds = ray.data.read_binary_files(paths)

    def decode(b: pa.Table) -> pa.Table:
        tables = []
        for buf in b.column("bytes"):
            raw = buf.as_py()
            if len(raw) % line_w:
                raise ValueError(
                    f"file length {len(raw)} is not a multiple of the "
                    f"declared record width {line_w}"
                )
            arr = np.frombuffer(raw, dtype="S1").reshape(-1, line_w)
            data: dict = {}
            lo = 0
            for name, w in widths:
                colbytes = np.ascontiguousarray(arr[:, lo : lo + w]).view(f"S{w}").ravel()
                col = pc.utf8_rtrim(pa.array(colbytes.astype(object), pa.string()), " ")
                if schema is not None and schema.field(name).type != pa.string():
                    col = pc.cast(
                        pc.utf8_ltrim(col, " "), schema.field(name).type
                    )
                data[name] = col
                lo += w
            tables.append(pa.table(data))
        return pa.concat_tables(tables, promote_options="default")

    return ds.map_batches(decode, batch_format="pyarrow")


def write_xml(ds: "ray.data.Dataset", path: str, root: str = "rows", record: str = "row") -> None:
    """XML record sink (the SOAP/legacy-feed interchange format): one
    ``<record>`` element per row with one child element per column
    (``xml.sax.saxutils`` escaping; NULL columns are omitted so they
    round-trip to null), one shard per block, tmp-dir + atomic-rename
    resumable contract. Values serialize through the Arrow string cast —
    the same rendering the fixed-width sink uses — so a typed reader
    recovers them exactly."""
    from xml.sax.saxutils import escape

    import pyarrow.compute as pc

    def shard(t: pa.Table, p: str) -> None:
        names = t.column_names
        cols = [pc.cast(t.column(n), pa.string()).to_pylist() for n in names]
        with open(p, "w", encoding="utf-8") as f:
            f.write(f'<?xml version="1.0" encoding="UTF-8"?>\n<{root}>\n')
            for row in zip(*cols):
                f.write(f"  <{record}>")
                for name, v in zip(names, row):
                    if v is None:
                        continue
                    f.write(f"<{name}>{escape(v)}</{name}>")
                f.write(f"</{record}>\n")
            f.write(f"</{root}>\n")

    _write_sharded(ds, path, "xml", shard)


def read_xml(
    paths: list[str] | str,
    schema: "pa.Schema",
    record: str = "row",
) -> "ray.data.Dataset":
    """XML record source: one parse task per file over
    ``read_binary_files`` (stdlib ElementTree — the files are this
    sink's own, not hostile input), schema-driven typing: each record's
    child elements fill the declared columns, missing children are NULL,
    non-string columns cast through Arrow. Column order and types come
    from ``schema`` so the round-trip is value-identical."""
    import xml.etree.ElementTree as ET

    import pyarrow.compute as pc

    ds = ray.data.read_binary_files(paths)
    names = list(schema.names)

    def decode(b: pa.Table) -> pa.Table:
        tables = []
        for buf in b.column("bytes"):
            root = ET.fromstring(buf.as_py().decode("utf-8"))
            rows = root.findall(record)
            data = {}
            for name in names:
                vals = []
                for r in rows:
                    el = r.find(name)
                    vals.append(None if el is None else (el.text or ""))
                col = pa.array(vals, pa.string())
                if schema.field(name).type != pa.string():
                    col = pc.cast(col, schema.field(name).type)
                data[name] = col
            tables.append(pa.table(data))
        return pa.concat_tables(tables, promote_options="default")

    return ds.map_batches(decode, batch_format="pyarrow")


def write_parquet_manifest(
    ds: "ray.data.Dataset", path: str, stats_columns: list[str]
) -> None:
    """Parquet sink with a SHARD-LEVEL statistics manifest (the
    lakehouse min/max pruning layer ABOVE parquet's row-group stats):
    each block writes its own ``.parquet`` shard and reports per-column
    min/max; the driver assembles ``manifest.json`` (shard → stats,
    bounded: one row per shard) and the tmp-dir + atomic rename
    publishes data and manifest together — a reader never sees a
    manifest without its shards. Stats serialize through the Arrow
    string cast (timestamps → ISO, numerics → repr) and compare back
    under the column's real type on read."""
    import json
    import shutil
    import uuid

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    shutil.rmtree(path, ignore_errors=True)
    tmp = path + ".__tmp__"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)

    def sink(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table({"shard": pa.array([], pa.string())})
        name = f"shard-{uuid.uuid4().hex}.parquet"
        pq.write_table(t, os.path.join(tmp, name))
        row = {"shard": name}
        for c in stats_columns:
            col = t.column(c)
            row[f"min_{c}"] = pc.cast(pc.min(col), pa.string()).as_py()
            row[f"max_{c}"] = pc.cast(pc.max(col), pa.string()).as_py()
        return pa.table({k: pa.array([v], pa.string()) for k, v in row.items()})

    stats = ds.map_batches(sink, batch_format="pyarrow").take_all()  # bounded: shards
    manifest = {"version": 1, "stats_columns": stats_columns, "shards": stats}
    with open(os.path.join(tmp, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    with open(os.path.join(tmp, "manifest-v1.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    os.replace(tmp, path)


def read_parquet_manifest(
    path: str, column: str, lo, hi, version: int | None = None
) -> "ray.data.Dataset":
    """Manifest-pruned parquet source: consult ``manifest.json`` and read
    ONLY the shards whose [min, max] range for ``column`` overlaps
    [lo, hi] — files outside the predicate never leave storage (the
    prune-at-the-read lever one level above row-group statistics; with
    range-partitioned or z-ordered shards this skips most of a 100-TB
    table). An exact in-range filter runs after the read, so the result
    equals the unpruned filter regardless of manifest granularity.
    ``version=`` time-travels to a prior commit's ``manifest-v{N}.json``
    (appends never rewrite shards, so old snapshots stay intact)."""
    import json

    import pyarrow.compute as pc

    name = "manifest.json" if version is None else f"manifest-v{int(version)}.json"
    with open(os.path.join(path, name)) as f:
        manifest = json.load(f)
    if column not in manifest["stats_columns"]:
        raise ValueError(f"manifest has no stats for column {column!r}")

    probe = ray.data.read_parquet(
        os.path.join(path, manifest["shards"][0]["shard"])
    ).schema()
    typ = dict(zip(probe.names, probe.types))[column]
    lo_s = pa.scalar(lo, typ)
    hi_s = pa.scalar(hi, typ)

    keep = []
    for s in manifest["shards"]:
        mn = pc.cast(pa.scalar(s[f"min_{column}"], pa.string()), typ)
        mx = pc.cast(pa.scalar(s[f"max_{column}"], pa.string()), typ)
        if pc.greater(mn, hi_s).as_py() or pc.less(mx, lo_s).as_py():
            continue
        keep.append(os.path.join(path, s["shard"]))
    if not keep:
        keep = [os.path.join(path, manifest["shards"][0]["shard"])]
        empty = ray.data.read_parquet(keep)
        return empty.map_batches(lambda t: t.slice(0, 0), batch_format="pyarrow")

    def exact(t: pa.Table) -> pa.Table:
        col = t.column(column)
        return t.filter(
            pa.compute.and_(
                pa.compute.greater_equal(col, lo_s),
                pa.compute.less_equal(col, hi_s),
            )
        )

    return ray.data.read_parquet(keep).map_batches(exact, batch_format="pyarrow")


def append_parquet_manifest(
    ds: "ray.data.Dataset", path: str, stats_columns: list[str] | None = None
) -> int:
    """Append a new COMMIT to a manifest-tracked parquet table (the
    delta-style versioned-table write): new shards land under uuid names
    (never touching existing files), then the next ``manifest-v{N}.json``
    lists old + new shards and an atomic ``os.replace`` swings the
    ``manifest.json`` pointer — readers see the old snapshot until the
    swap, and every prior version stays readable by number
    (:func:`read_parquet_manifest`'s ``version=``). Returns the new
    version number. ``stats_columns`` must match the table's (defaults
    to them)."""
    import json
    import uuid

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    with open(os.path.join(path, "manifest.json")) as f:
        current = json.load(f)
    cols = stats_columns or current["stats_columns"]
    if cols != current["stats_columns"]:
        raise ValueError("stats_columns must match the existing manifest")

    def sink(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table({"shard": pa.array([], pa.string())})
        name = f"shard-{uuid.uuid4().hex}.parquet"
        pq.write_table(t, os.path.join(path, name))
        row = {"shard": name}
        for c in cols:
            col = t.column(c)
            row[f"min_{c}"] = pc.cast(pc.min(col), pa.string()).as_py()
            row[f"max_{c}"] = pc.cast(pc.max(col), pa.string()).as_py()
        return pa.table({k: pa.array([v], pa.string()) for k, v in row.items()})

    new_rows = ds.map_batches(sink, batch_format="pyarrow").take_all()  # bounded
    version = int(current.get("version", 1)) + 1
    manifest = {
        "version": version,
        "stats_columns": cols,
        "shards": current["shards"] + new_rows,
    }
    with open(os.path.join(path, f"manifest-v{version}.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    tmp = os.path.join(path, ".manifest.json.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1)
    os.replace(tmp, os.path.join(path, "manifest.json"))
    return version


def write_webdataset(
    ds: "ray.data.Dataset",
    path: str,
    key_column: str,
    columns: list[str],
    binary_columns: set[str] | None = None,
) -> None:
    """WebDataset-style tar-shard sink (the multimodal training-data
    layout: one tar per shard, one member per field named
    ``{key}.{column}``, samples contiguous so a sequential reader
    streams whole examples): each block writes one ``.tar`` via the
    shared tmp-dir + atomic-rename contract. Tar bytes are
    deterministic — USTAR format, mtime/uid/gid pinned to 0, empty
    uname/gname — so identical content produces identical shards
    (resumable/idempotent). String columns encode UTF-8; columns in
    ``binary_columns`` write raw bytes. Null cells write no member and
    read back as null."""
    import io
    import tarfile

    bset = binary_columns or set()

    def shard(t: pa.Table, p: str) -> None:
        keys = [str(k) for k in t.column(key_column).to_pylist()]
        cols = {c: t.column(c).to_pylist() for c in columns}
        with tarfile.open(p, "w", format=tarfile.USTAR_FORMAT) as tf:
            for i, k in enumerate(keys):
                for c in columns:
                    v = cols[c][i]
                    if v is None:
                        continue
                    payload = v if c in bset else str(v).encode("utf-8")
                    info = tarfile.TarInfo(name=f"{k}.{c}")
                    info.size = len(payload)
                    info.mtime = 0
                    info.uid = info.gid = 0
                    info.uname = info.gname = ""
                    tf.addfile(info, io.BytesIO(payload))

    _write_sharded(ds, path, "tar", shard)


def read_webdataset(
    paths: list[str] | str,
    columns: list[str],
    binary_columns: set[str] | None = None,
) -> "ray.data.Dataset":
    """WebDataset tar-shard source: one parse task per shard over
    ``ray.data.read_binary_files``; members group by their ``{key}.{col}``
    name (split on the LAST dot — keys may contain dots), one row per
    key with ``__key__`` (the WebDataset convention) plus the requested
    columns; missing members are null. Keys keep the order of first
    appearance within a shard (samples are contiguous by the sink
    contract)."""
    import io
    import tarfile

    bset = binary_columns or set()
    want = set(columns)

    def decode(b: pa.Table) -> pa.Table:
        rows: dict[str, dict[str, object]] = {}
        order: list[str] = []
        for buf in b.column("bytes"):
            with tarfile.open(fileobj=io.BytesIO(buf.as_py())) as tf:
                for m in tf.getmembers():
                    if not m.isfile() or "." not in m.name:
                        continue
                    key, col = m.name.rsplit(".", 1)
                    if col not in want:
                        continue
                    raw = tf.extractfile(m).read()
                    if key not in rows:
                        rows[key] = {}
                        order.append(key)
                    rows[key][col] = raw if col in bset else raw.decode("utf-8")
        data: dict[str, pa.Array] = {
            "__key__": pa.array(order, pa.string())
        }
        for c in columns:
            vals = [rows[k].get(c) for k in order]
            data[c] = pa.array(
                vals, pa.binary() if c in bset else pa.string()
            )
        return pa.table(data)

    return ray.data.read_binary_files(paths).map_batches(
        decode, batch_format="pyarrow"
    )


def read_jsonl_bz2(
    paths: list[str] | str, columns: list[str] | None = None
) -> "ray.data.Dataset":
    """Bzip2-compressed JSONL source (``*.jsonl.bz2`` — Pushshift-style
    dumps): same shape as :func:`read_jsonl_gz` — one decode task per
    file, stdlib bz2 + pyarrow JSON parse. The 'BZh' magic check keeps
    renamed or transparently-inflated bytes working either way."""
    import bz2

    from pyarrow import json as pa_json

    ds = ray.data.read_binary_files(paths)

    def decode(b: pa.Table) -> pa.Table:
        tables = []
        for buf in b.column("bytes"):
            raw = buf.as_py()
            if raw[:3] == b"BZh":
                raw = bz2.decompress(raw)
            t = pa_json.read_json(pa.BufferReader(raw))
            if columns is not None:
                t = t.select(columns)
            tables.append(t)
        return pa.concat_tables(tables, promote_options="default")

    return ds.map_batches(decode, batch_format="pyarrow")


def write_jsonl_bz2(ds: "ray.data.Dataset", path: str) -> None:
    """Bzip2 JSONL sink: one ``.jsonl.bz2`` shard per block (bz2 frames
    carry no timestamp — identical content compresses to identical
    bytes), tmp-dir + atomic rename."""
    import bz2

    def shard(t: pa.Table, p: str) -> None:
        payload = t.to_pandas().to_json(
            orient="records", lines=True, force_ascii=False, date_format="iso"
        )
        if not payload.endswith("\n"):
            payload += "\n"
        with open(p, "wb") as f:
            f.write(bz2.compress(payload.encode()))

    _write_sharded(ds, path, "jsonl.bz2", shard)


def read_parquet_union_by_name(
    dirs: list[str],
    columns: list[str] | None = None,
) -> "ray.data.Dataset":
    """Schema-evolution parquet read (DuckDB's ``union_by_name`` / the
    data-lake added-a-column reality): each input directory may carry a
    DIFFERENT schema; columns align by NAME into the first-seen-order
    superset, files missing a column contribute typed NULLs. One
    ``read_parquet`` per directory (so Ray still parallelizes and
    column-prunes inside each), aligned per batch, then a zero-copy
    union. Same-named columns must have identical types (a type CHANGE
    is a migration, not evolution — raise early rather than coerce
    silently)."""
    import pyarrow.parquet as pq

    schemas = []
    for d in dirs:
        files = sorted(
            os.path.join(d, f) for f in os.listdir(d) if f.endswith(".parquet")
        )
        if not files:
            raise ValueError(f"no parquet files under {d}")
        schemas.append((d, pq.read_schema(files[0])))

    merged: dict[str, pa.DataType] = {}
    for _d, sch in schemas:
        for f in sch:
            if f.name in merged:
                if merged[f.name] != f.type:
                    raise ValueError(
                        f"column {f.name!r} changes type across inputs: "
                        f"{merged[f.name]} vs {f.type}"
                    )
            else:
                merged[f.name] = f.type
    names = [n for n in merged if columns is None or n in columns]

    def aligner(have: set):
        def align(b: pa.Table) -> pa.Table:
            return pa.table(
                {
                    n: (
                        b.column(n)
                        if n in have
                        else pa.nulls(len(b), merged[n])
                    )
                    for n in names
                }
            )

        return align

    parts = []
    for d, sch in schemas:
        have = set(sch.names)
        cols = [n for n in names if n in have] or None
        parts.append(
            ray.data.read_parquet(d, columns=cols).map_batches(
                aligner(have), batch_format="pyarrow"
            )
        )
    ds = parts[0]
    for p in parts[1:]:
        ds = ds.union(p)
    return ds


def write_csv_gz(ds: "ray.data.Dataset", path: str) -> None:
    """Gzip CSV sink (``*.csv.gz`` — how tabular dumps actually ship):
    one shard per block, header per shard, gzip mtime pinned to 0 so
    identical content compresses to identical bytes; tmp-dir + atomic
    rename."""
    import gzip
    import io

    import pyarrow.csv as _pacsv

    def shard(t: pa.Table, p: str) -> None:
        buf = io.BytesIO()
        _pacsv.write_csv(t, buf)
        with open(p, "wb") as f:
            f.write(gzip.compress(buf.getvalue(), 6, mtime=0))

    _write_sharded(ds, path, "csv.gz", shard)


def read_csv_gz(
    paths: list[str] | str, columns: list[str] | None = None
) -> "ray.data.Dataset":
    """Gzip CSV source: one decode task per shard over
    ``read_binary_files`` (which may already have inflated ``*.gz`` —
    Arrow infers the codec from the extension; the 1f8b magic check
    keeps renamed or pre-read bytes working), pyarrow CSV parse,
    post-parse column pruning."""
    import gzip

    import pyarrow.csv as _pacsv

    ds = ray.data.read_binary_files(paths)

    def decode(b: pa.Table) -> pa.Table:
        tables = []
        for buf in b.column("bytes"):
            raw = buf.as_py()
            if raw[:2] == b"\x1f\x8b":
                raw = gzip.decompress(raw)
            t = _pacsv.read_csv(pa.BufferReader(raw))
            if columns is not None:
                t = t.select(columns)
            tables.append(t)
        return pa.concat_tables(tables, promote_options="default")

    return ds.map_batches(decode, batch_format="pyarrow")
