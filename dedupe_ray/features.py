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
