"""Bucketed distributed equi-join primitive.

Ray Data's hash join (``Dataset.join``) stalls on empty hash partitions at
small scale (NOTES_r2/r3 landmine), so joins on tested paths are expressed
as ONE bucketed shuffle instead: tag each side with
``bucket = siphash(key) % n_buckets``, union the sides (schemas
null-padded to match), ``groupby(bucket)``, and resolve each bucket with a
vectorized ``pyarrow.compute.index_in``. The group count is bounded by
``n_buckets`` regardless of key cardinality, so the exchange behaves like
a hash join without per-key groups; hot keys spread only as far as their
bucket, which is acceptable for lookup-style right sides (unique keys ⇒
bucket payload is bounded by the key distribution of the LEFT side).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

_BKT = "__jbkt"
_SIDE = "__jside"


def _bucket_col(col: pa.ChunkedArray, n_buckets: int) -> pa.Array:
    vals = col.to_numpy(zero_copy_only=False)
    return pa.array((pd.util.hash_array(vals) % n_buckets).astype(np.int32))


def _pa_type(t) -> pa.DataType:
    """Ray's Schema.types mixes pyarrow DataTypes (arrow blocks) with numpy
    dtypes / ``object`` (pandas blocks); normalize to pyarrow. ``object``
    columns are treated as strings (the only object payload in this repo)."""
    if isinstance(t, pa.DataType):
        return t
    try:
        return pa.from_numpy_dtype(t)
    except (pa.ArrowNotImplementedError, TypeError):
        return pa.string()


def bucketed_lookup_join(
    left_ds: "ray.data.Dataset",
    right_ds: "ray.data.Dataset",
    left_key: str,
    right_key: str,
    right_value_cols: list[str],
    n_buckets: int = 256,
) -> "ray.data.Dataset":
    """Distributed inner equi-join against a UNIQUE-keyed lookup side.

    Every left column is kept and ``right_value_cols`` are appended; left
    rows with no right match are dropped (inner semantics). The right
    side's keys must be unique (records by doc_id, node→component, …) —
    with duplicate right keys the first occurrence wins (``index_in``
    semantics); rows are never multiplied.
    """
    left_schema = left_ds.schema()
    left_names = list(left_schema.names)
    left_types = {n: _pa_type(t) for n, t in zip(left_schema.names, left_schema.types)}
    right_schema = right_ds.schema()
    right_types = {n: _pa_type(t) for n, t in zip(right_schema.names, right_schema.types)}
    overlap = set(right_value_cols) & set(left_names)
    if overlap:
        raise ValueError(f"right_value_cols collide with left columns: {sorted(overlap)}")
    key_type = left_types[left_key]
    out_names = left_names + list(right_value_cols)

    def tag_left(t: pa.Table) -> pa.Table:
        data = {n: t.column(n) for n in left_names}
        for c in right_value_cols:
            data[c] = pa.nulls(len(t), right_types[c])
        data[_BKT] = _bucket_col(t.column(left_key), n_buckets)
        data[_SIDE] = pa.array(np.zeros(len(t), bool))
        return pa.table(data)

    def tag_right(t: pa.Table) -> pa.Table:
        key = pc.cast(t.column(right_key), key_type)
        data: dict = {}
        for n in left_names:
            data[n] = key if n == left_key else pa.nulls(len(t), left_types[n])
        for c in right_value_cols:
            data[c] = t.column(c)
        data[_BKT] = _bucket_col(key, n_buckets)
        data[_SIDE] = pa.array(np.ones(len(t), bool))
        return pa.table(data)

    def resolve(t: pa.Table) -> pa.Table:
        rhs = t.filter(t.column(_SIDE))
        lhs = t.filter(pc.invert(t.column(_SIDE)))
        if len(lhs) == 0 or len(rhs) == 0:
            return pa.table(
                {
                    n: pa.array([], left_types.get(n) or right_types[n])
                    for n in out_names
                }
            )
        idx = pc.index_in(lhs.column(left_key), value_set=rhs.column(left_key).combine_chunks())
        valid = pc.is_valid(idx)
        hit = lhs.filter(valid)
        idx_v = idx.filter(valid)
        data = {n: hit.column(n) for n in left_names}
        for c in right_value_cols:
            data[c] = pc.take(rhs.column(c), idx_v)
        return pa.table(data)

    both = left_ds.map_batches(tag_left, batch_format="pyarrow").union(
        right_ds.map_batches(tag_right, batch_format="pyarrow")
    )
    return both.groupby(_BKT).map_groups(resolve, batch_format="pyarrow")
