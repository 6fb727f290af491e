"""Pair feature vectors.

Mirrors the reference DataModel's distance matrix [lib: dedupe/datamodel.py]:
one column per field comparator plus, for ``has_missing=True`` fields, a
missing-indicator column (distance forced to 0 when either side is missing,
indicator 1) — so the logistic classifier can learn a per-field missing
penalty exactly like the reference.

Input layout: a pyarrow batch with columns ``a_<field>`` and ``b_<field>``
(the joined pair sides). Output: float32 matrix [n, n_features].
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from dedupe_ray.config import MISSING, EngineConfig, FieldConfig
from dedupe_ray.distances import (
    affine_gap_batch,
    datetime_distance_batch,
    exact_distance_batch,
    price_distance_batch,
    tfidf_cosine_batch,
)


def feature_names(config: EngineConfig) -> list[str]:
    names = []
    for f in config.fields:
        names.append(f"d_{f.field}")
    for f in config.fields:
        if f.has_missing:
            names.append(f"miss_{f.field}")
    return names


def _field_distance(
    f: FieldConfig, a: list[str], b: list[str], idf: dict | None
) -> np.ndarray:
    if f.type == "String":
        return affine_gap_batch(a, b)
    if f.type == "Exact":
        return exact_distance_batch(a, b)
    if f.type == "Price":
        return price_distance_batch(a, b)
    if f.type == "DateTime":
        return datetime_distance_batch(a, b)
    if f.type == "Text":
        table = idf or {}
        return tfidf_cosine_batch(a, b, table.get("idf", {}), table.get("default_idf", 1.0))
    raise ValueError(f.type)


def _miss_mask(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    import pyarrow.compute as pc

    filled = pc.fill_null(col, MISSING)
    m = pc.or_(pc.equal(filled, MISSING), pc.equal(filled, ""))
    return m.to_numpy(zero_copy_only=False).astype(bool)


def pair_features(
    batch: pa.Table, config: EngineConfig, idf_tables: dict[str, dict] | None = None
) -> np.ndarray:
    """(a_*, b_*) pair batch → feature matrix [n, n_features] float32.

    Missing detection is vectorized in pyarrow; the (expensive) distance
    kernel only runs on rows where both sides are present."""
    n = len(batch)
    cols: list[np.ndarray] = []
    missing_cols: list[np.ndarray] = []
    for f in config.fields:
        ca = batch.column(f"a_{f.field}")
        cb = batch.column(f"b_{f.field}")
        miss = _miss_mask(ca) | _miss_mask(cb)
        d = np.zeros(n, np.float32)
        idx = np.nonzero(~miss)[0]
        if idx.size:
            a_all = ca.to_pylist()
            b_all = cb.to_pylist()
            a = [a_all[i] for i in idx]
            b = [b_all[i] for i in idx]
            dv = _field_distance(f, a, b, (idf_tables or {}).get(f.field))
            d[idx] = np.nan_to_num(dv, nan=0.0, posinf=0.0, neginf=0.0).astype(np.float32)
        cols.append(d)
        if f.has_missing:
            missing_cols.append(miss.astype(np.float32))
    return np.column_stack(cols + missing_cols).astype(np.float32)


def monotone_feature_dims(config: EngineConfig) -> tuple[list[int], list[int]]:
    """Sign constraints for the classifier, per the pair_features layout
    (distances first, then missing indicators): String/Price/DateTime
    comparators are DISTANCES (weight ≤ 0), Exact/Text are SIMILARITIES
    (weight ≥ 0). Indicators stay unconstrained."""
    neg: list[int] = []
    pos: list[int] = []
    for i, f in enumerate(config.fields):
        if f.type in ("Exact", "Text"):
            pos.append(i)
        else:
            neg.append(i)
    return neg, pos


def compute_idf(
    flat_ds, field: str, min_df: int = 2, max_vocab: int = 1_000_000
) -> dict:
    """Ray doc-frequency pass for a Text field → broadcastable idf table.

    Per-batch partial: each doc contributes its UNIQUE tokens once (df, not
    tf) pre-aggregated within the batch (combiner pattern) → one small
    ``groupby(token).sum`` shuffle → driver table. Tokens with df < min_df
    are left out (their idf equals ``default_idf`` = ln N anyway, and the
    long tail is most of the vocabulary); the collected vocabulary is capped
    at ``max_vocab`` by df so the broadcast stays bounded at any corpus
    size."""
    import math

    import pyarrow as pa
    from ray.data.aggregate import Sum

    from dedupe_ray.distances import _TOKEN

    n_docs = flat_ds.count()

    def partial_df(batch: pa.Table) -> pa.Table:
        counts: dict[str, int] = {}
        for v in batch.column(field).to_pylist():
            for t in set(_TOKEN.findall(v or "")):
                counts[t] = counts.get(t, 0) + 1
        return pa.table(
            {
                "token": pa.array(list(counts.keys()), pa.string()),
                "df": pa.array(list(counts.values()), pa.int64()),
            }
        )

    agg = (
        flat_ds.map_batches(partial_df, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("df", alias_name="df"))
    )
    kept = agg.filter(expr=f"df >= {min_df}")
    if kept.count() > max_vocab:
        kept = kept.sort("df", descending=True).limit(max_vocab)
    idf = {
        r["token"]: math.log(max(n_docs, 1) / r["df"]) for r in kept.take_all()
    }
    return {"idf": idf, "default_idf": math.log(max(n_docs, 1))}
