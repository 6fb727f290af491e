"""Arrow schemas + the span⇄flat-field projection stages.

Input shape mandated by BASELINE.json ``input_hint``::

    doc_id: string
    spans:  list<struct<kind: string, text: string, media_ref: string, offset: int32>>

Entity fields ride as ``kind="field:<Name>"`` text spans; media spans
(``kind="image" | "audio" | ...``, ``text=""``, ``media_ref="media://…"``)
interleave and must pass through the pipeline untouched — the per-row
invariant is span-sequence equality on (kind, text, media_ref, order).

``extract_fields`` is a pure projection ``map_batches`` stage that
materializes flat ``<Field> → string`` columns for matching while leaving the
source dataset (and its spans) untouched; matching stages then operate on the
narrow flat table and results re-attach by ``doc_id``.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

SPAN_STRUCT = pa.struct(
    [
        ("kind", pa.string()),
        ("text", pa.string()),
        ("media_ref", pa.string()),
        ("offset", pa.int32()),
    ]
)

DOCUMENT_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("spans", pa.list_(SPAN_STRUCT)),
    ]
)

FIELD_KIND_PREFIX = "field:"


def extract_fields_batch(batch: pa.Table, field_names: list[str]) -> pa.Table:
    """Project ``field:<name>`` spans into flat string columns.

    Vectorized: flattens the span list once, filters to field spans, and
    scatters texts back per parent row. Missing fields become null (the
    preprocess stage maps them to the "N/A" sentinel). Media/other spans are
    simply not projected — the source ``spans`` column is left untouched in
    the input dataset.
    """
    spans = batch.column("spans")
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    n = len(batch)

    flat = spans.flatten()  # struct array of all spans
    # parent row index for every flattened span
    offsets = spans.offsets.to_numpy(zero_copy_only=False)
    import numpy as np

    parent = np.repeat(np.arange(n, dtype=np.int64), np.diff(offsets))

    kinds = flat.field("kind")
    texts = flat.field("text")

    out: dict[str, pa.Array] = {"doc_id": batch.column("doc_id")}
    kinds_np = np.asarray(kinds.to_pandas(), dtype=object)
    texts_np = np.asarray(texts.to_pandas(), dtype=object)

    for name in field_names:
        want = FIELD_KIND_PREFIX + name
        mask = kinds_np == want
        col = np.full(n, None, dtype=object)
        # last span of a kind wins (fields are unique per doc by construction)
        col[parent[mask]] = texts_np[mask]
        out[name] = pa.array(col, type=pa.string())
    return pa.table(out)


def make_extract_fields_stage(field_names: list[str]):
    def _stage(batch: pa.Table) -> pa.Table:
        return extract_fields_batch(batch, field_names)

    return _stage


def discover_field_names(ds, sample_rows: int = 100) -> list[str]:
    """Reference field auto-detection analogue (A4): inspect a small sample's
    span kinds, return the field names in first-seen (offset) order."""
    seen: list[str] = []
    for row in ds.limit(sample_rows).take(sample_rows):
        for span in row["spans"]:
            k = span["kind"]
            if k.startswith(FIELD_KIND_PREFIX):
                name = k[len(FIELD_KIND_PREFIX):]
                if name not in seen:
                    seen.append(name)
    return seen


def span_signature_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, span_sig) where span_sig is a deterministic string encoding of
    the (kind, text, media_ref) sequence in offset order — used to assert the
    per-row span-sequence-equality invariant cheaply at scale."""
    spans = batch.column("spans")
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    flat = spans.flatten()
    joined = pc.binary_join_element_wise(
        flat.field("kind"), flat.field("text"), flat.field("media_ref"), "\x1f"
    )
    rows = []
    offsets = spans.offsets.to_numpy(zero_copy_only=False)
    joined_py = joined.to_pylist()
    for i in range(len(batch)):
        rows.append("\x1e".join(joined_py[offsets[i]: offsets[i + 1]]))
    return pa.table({"doc_id": batch.column("doc_id"), "span_sig": pa.array(rows, pa.string())})
