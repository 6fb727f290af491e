"""App-surface result sinks and UI-shaping helpers.

- :func:`build_report` / :func:`write_json_report` — the A17 JSON results
  shape {total_records, duplicate_groups_found, duplicates, configuration,
  threshold_used} (backend/dedupe_script.py:395-417), with the same
  np.float32 → float coercion as the reference's encoder.
- :func:`cleansed_export_csv` — the A24 cleansed-file export
  (frontend/src/hooks/useFileProcessor.ts:163-242): records of duplicate
  groups minus removals, header order cluster_id + sorted(regular cols) +
  record_id + confidence_score + source_file, 1-based stringified cluster
  ids, 'N/A' → '', RFC-4180 escaping of values containing , " or newline.
- :func:`reorder_training_pairs` — the A11 pair re-ordering for the
  labeling UI (backend/dedupe_script.py:421-486): classify by exact
  equality on the selected columns, interleave match/random/distinct.

The A17/A24 artifacts are app-layer outputs bounded by the review UI (the
reference caps inputs at 100 MB); final assembly is driver-side, but the
record pull is a broadcast semi-join against the reported groups' member
ids — the driver never materializes the corpus, only the report's own
rows (``max_groups`` bounds that). The scale path for cluster membership
itself is ``clusters_ds.write_parquet`` / ``write_json`` (partitioned,
streaming).
"""

from __future__ import annotations

import json
from itertools import islice

import ray.data


def _cluster_groups(
    clusters_ds: "ray.data.Dataset",
    flat_ds: "ray.data.Dataset",
    fields: list[str],
    max_groups: int | None = None,
) -> list[dict]:
    """Cluster membership + records → reference-shaped group list, sorted by
    mean confidence desc with 1-based dense integer cluster ids.

    The record pull is a broadcast semi-join: group order/truncation is
    computed from the (small) cluster membership alone, then ``flat_ds`` is
    filtered to the member ids of the REPORTED groups before any driver
    collection — the driver never holds more records than the report
    itself contains (≤ members of ``max_groups`` groups, not the corpus)."""
    import ray

    import pyarrow as pa
    import pyarrow.compute as pc

    mem = clusters_ds.to_pandas()

    groups: dict[str, list[tuple[str, float]]] = {}
    for cid, did, conf in zip(
        mem["cluster_id"], mem["doc_id"], mem["confidence_score"]
    ):
        groups.setdefault(cid, []).append((did, float(conf)))

    ordered = []
    for cid, members in groups.items():
        if len(members) < 2:
            continue
        ordered.append(
            (sum(c for _, c in members) / len(members), cid, sorted(members))
        )
    ordered.sort(key=lambda g: (-g[0], g[1]))
    if max_groups is not None:
        ordered = ordered[:max_groups]

    need = {did for _, _, members in ordered for did, _ in members}
    need_ref = ray.put(pa.array(sorted(need)))

    def member_rows(b: pa.Table) -> pa.Table:
        wanted = ray.get(need_ref)
        return b.filter(pc.is_in(b.column("doc_id"), value_set=wanted))

    recs = (
        flat_ds.select_columns(
            ["doc_id"] + [f for f in fields if f != "doc_id"]
            + (["source_file"] if "source_file" in flat_ds.schema().names else [])
        )
        .map_batches(member_rows, batch_format="pyarrow")
        .to_pandas()
        .set_index("doc_id")
    )

    out = []
    for mean_conf, cid, members in ordered:
        records = []
        for did, conf in members:
            row = recs.loc[did]
            rec = {f: row[f] for f in fields}
            rec["confidence_score"] = conf
            rec["source_file"] = row["source_file"] if "source_file" in recs.columns else ""
            rec["record_id"] = did
            records.append(rec)
        out.append(
            {
                "group_size": len(records),
                "confidence_score": mean_conf,
                "records": records,
            }
        )
    for i, g in enumerate(out):
        g["cluster_id"] = i
    return out


def build_report(
    clusters_ds: "ray.data.Dataset",
    flat_ds: "ray.data.Dataset",
    fields: list[str],
    threshold: float,
    configuration: dict | None = None,
    max_groups: int | None = 100_000,
) -> dict:
    """A17 JSON results shape (dedupe_script.py:403-416)."""
    groups = _cluster_groups(clusters_ds, flat_ds, fields, max_groups)
    return {
        "total_records": flat_ds.count(),
        "duplicate_groups_found": len(groups),
        "duplicates": groups,
        "configuration": configuration or {},
        "threshold_used": float(threshold),
    }


def write_json_report(report: dict, path: str) -> None:
    with open(path, "w") as f:
        json.dump(report, f, indent=2)


def _csv_escape(value) -> str:
    """A24 formatValue (useFileProcessor.ts:206-215): None/'N/A' → '';
    quote+double-quote when the value contains , \" or newline."""
    if value is None or value == "N/A":
        return ""
    s = str(value)
    if "," in s or "\n" in s or '"' in s:
        return '"' + s.replace('"', '""') + '"'
    return s


def cleansed_export_csv(
    clusters_ds: "ray.data.Dataset",
    flat_ds: "ray.data.Dataset",
    fields: list[str],
    removals: set[str] | None = None,
    path: str | None = None,
    max_groups: int | None = 100_000,
) -> str:
    """A24 cleansed export: duplicate-group records minus removals, exact
    reference header order and escaping. Returns the CSV text (and writes
    ``path`` when given)."""
    removals = removals or set()
    groups = _cluster_groups(clusters_ds, flat_ds, fields, max_groups)
    regular = sorted(fields)
    headers = ["cluster_id"] + regular + ["record_id", "confidence_score", "source_file"]
    lines = [",".join(headers)]
    for g in groups:
        cid_str = str(g["cluster_id"] + 1)  # 1-based stringified (ts:180)
        for rec in g["records"]:
            if rec["record_id"] in removals:
                continue
            row = [cid_str]
            row += [_csv_escape(rec.get(h)) for h in regular]
            row += [
                _csv_escape(rec["record_id"]),
                _csv_escape(rec["confidence_score"]),
                _csv_escape(rec["source_file"]),
            ]
            lines.append(",".join(row))
    csv_text = "\n".join(lines)
    if path:
        with open(path, "w") as f:
            f.write(csv_text)
    return csv_text


def reorder_training_pairs(
    pairs: list[dict], selected_columns: list[str] | None = None
) -> list[dict]:
    """A11 (dedupe_script.py:421-486): each pair is {'0': rec, '1': rec}.
    Pairs equal on ALL selected columns → 'matching'; equal on NONE →
    'distinct'; the rest 'random'; output interleaves
    matching, random, distinct then appends leftovers (which, with the
    reference's per-bucket indexing, is a no-op tail — reproduced as-is)."""
    if not pairs:
        return []
    if selected_columns is None:
        selected_columns = list(pairs[0]["0"].keys())[:2]

    matching, distinct = [], []
    for pair in pairs:
        score = 0
        for f in selected_columns:
            v1 = str(pair["0"].get(f, "N/A")).lower().strip()
            v2 = str(pair["1"].get(f, "N/A")).lower().strip()
            if v1 and v2 and v1 == v2:
                score += 1
        if score == len(selected_columns):
            matching.append(pair)
        elif score == 0:
            distinct.append(pair)
    chosen = {id(p) for p in matching} | {id(p) for p in distinct}
    random_pairs = [p for p in pairs if id(p) not in chosen]

    out = []
    max_len = max(len(matching), len(random_pairs), len(distinct))
    for i in range(max_len):
        if i < len(matching):
            out.append(matching[i])
        if i < len(random_pairs):
            out.append(random_pairs[i])
        if i < len(distinct):
            out.append(distinct[i])
    out.extend(islice(matching, max_len, None))
    out.extend(islice(random_pairs, max_len, None))
    out.extend(islice(distinct, max_len, None))
    return out


def validate_inputs(paths: list[str], selected_columns: list[str]) -> None:
    """A31 upload constraints (page.tsx:117-129,146; main.py:86-91): ≤ 2
    files, same extension family, supported formats, ≥ 2 match columns."""
    import os

    if not paths:
        raise ValueError("no input files")
    if len(paths) > 2:
        raise ValueError("at most 2 input files are supported")
    exts = [os.path.splitext(p)[1].lower() for p in paths]
    ok = {".csv", ".xlsx", ".xls"}
    for e in exts:
        if e not in ok:
            raise ValueError(f"unsupported format {e}: allowed {sorted(ok)}")
    fam = ["excel" if e in (".xlsx", ".xls") else "csv" for e in exts]
    if len(set(fam)) > 1:
        raise ValueError("all input files must share the same format family")
    if len(selected_columns) < 2:
        raise ValueError("select at least 2 match columns")


def write_excel_table(table, path: str, sheet_name: str = "Sheet1") -> None:
    """A21 sink counterpart: write an Arrow table (or pandas DataFrame) as
    a minimal valid .xlsx — the reference's merged-file download is an
    xlsx produced client-side (frontend/src/utils/fileUtils.ts:183-312).
    Inline strings only (no sharedStrings/styles): every cell is written
    as text, matching the all-string data model of the merge path. Bounded
    app-layer output (the reference caps inputs at 100 MB), assembled
    driver-side like the other A-layer sinks.

    Round-trips through :func:`dedupe_ray.sources.read_excel_table`.
    """
    import zipfile
    from xml.sax.saxutils import escape

    import pyarrow as pa

    if hasattr(table, "to_pandas") and not isinstance(table, pa.Table):
        table = pa.Table.from_pandas(table.to_pandas())
    elif not isinstance(table, pa.Table):
        table = pa.Table.from_pandas(table)

    def col_ref(i: int) -> str:
        s = ""
        i += 1
        while i:
            i, r = divmod(i - 1, 26)
            s = chr(65 + r) + s
        return s

    names = table.column_names
    cols = [table.column(n).to_pylist() for n in names]

    def row_xml(r_idx: int, values) -> str:
        cells = []
        for c_idx, v in enumerate(values):
            if v is None:
                continue
            ref = f"{col_ref(c_idx)}{r_idx}"
            cells.append(
                f'<c r="{ref}" t="inlineStr"><is><t xml:space="preserve">'
                f"{escape(str(v))}</t></is></c>"
            )
        return f'<row r="{r_idx}">' + "".join(cells) + "</row>"

    ns = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    rows = [row_xml(1, names)]
    for i in range(table.num_rows):
        rows.append(row_xml(i + 2, [col[i] for col in cols]))
    sheet = f'<worksheet xmlns="{ns}"><sheetData>' + "".join(rows) + "</sheetData></worksheet>"
    rns = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
    workbook = (
        f'<workbook xmlns="{ns}" xmlns:r="{rns}"><sheets>'
        f'<sheet name="{escape(sheet_name)}" sheetId="1" r:id="rId1"/>'
        "</sheets></workbook>"
    )
    pk = "http://schemas.openxmlformats.org/package/2006"
    rels = (
        f'<Relationships xmlns="{pk}/relationships">'
        f'<Relationship Id="rId1" Type="{rns}/worksheet" Target="worksheets/sheet1.xml"/>'
        "</Relationships>"
    )
    root_rels = (
        f'<Relationships xmlns="{pk}/relationships">'
        f'<Relationship Id="rId1" Type="{rns}/officeDocument" Target="xl/workbook.xml"/>'
        "</Relationships>"
    )
    ctypes = (
        f'<Types xmlns="{pk}/content-types">'
        '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
        '<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
        "</Types>"
    )
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", ctypes)
        z.writestr("_rels/.rels", root_rels)
        z.writestr("xl/workbook.xml", workbook)
        z.writestr("xl/_rels/workbook.xml.rels", rels)
        z.writestr("xl/worksheets/sheet1.xml", sheet)
