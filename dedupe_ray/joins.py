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


def bucketed_asof_join(
    left_ds: "ray.data.Dataset",
    right_ds: "ray.data.Dataset",
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    right_value_cols: list[str],
    n_buckets: int = 256,
) -> "ray.data.Dataset":
    """Distributed inner as-of join: each left row matches the right row
    with the same key and the GREATEST right_ts ≤ left_ts (inclusive
    backward match — DuckDB ``ASOF JOIN ... ON l.k = r.k AND l.ts >= r.ts``
    semantics). Left rows with no candidate are dropped.

    Same single-shuffle shape as :func:`bucketed_lookup_join` — key-hash
    buckets bound the group count at any key cardinality. Per bucket the
    match is fully vectorized: one lexsort of both sides on
    (key, ts, side) with right rows ordered before left at equal ts, then
    a key-bounded forward-fill of the last-seen right row index
    (maximum.accumulate with run-start reset) — the standard
    merge-as-of scan, O(n log n) per bucket with no per-key loop.

    Deterministic output requires UNIQUE (key, ts) on the right side
    (pre-aggregate duplicates first); with duplicates the winner depends
    on partition order. Null keys/timestamps never match.
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
    ts_type = left_types[left_ts]
    out_names = left_names + list(right_value_cols)
    rv_types = {c: right_types[c] for c in right_value_cols}

    def _empty() -> pa.Table:
        return pa.table(
            {n: pa.array([], left_types.get(n) or rv_types[n]) for n in out_names}
        )

    def tag_left(t: pa.Table) -> pa.Table:
        mask = pc.and_(pc.is_valid(t.column(left_key)), pc.is_valid(t.column(left_ts)))
        t = t.filter(mask)
        data = {n: t.column(n) for n in left_names}
        for c in right_value_cols:
            data[c] = pa.nulls(len(t), rv_types[c])
        data[_BKT] = _bucket_col(t.column(left_key), n_buckets)
        data[_SIDE] = pa.array(np.zeros(len(t), bool))
        return pa.table(data)

    def tag_right(t: pa.Table) -> pa.Table:
        mask = pc.and_(pc.is_valid(t.column(right_key)), pc.is_valid(t.column(right_ts)))
        t = t.filter(mask)
        key = pc.cast(t.column(right_key), key_type)
        ts = pc.cast(t.column(right_ts), ts_type)
        data: dict = {}
        for n in left_names:
            if n == left_key:
                data[n] = key
            elif n == left_ts:
                data[n] = ts
            else:
                data[n] = pa.nulls(len(t), left_types[n])
        for c in right_value_cols:
            data[c] = t.column(c)
        data[_BKT] = _bucket_col(key, n_buckets)
        data[_SIDE] = pa.array(np.ones(len(t), bool))
        return pa.table(data)

    def resolve(t: pa.Table) -> pa.Table:
        side = t.column(_SIDE).to_numpy(zero_copy_only=False)
        rhs = t.filter(pa.array(side))
        lhs = t.filter(pa.array(~side))
        n_l, n_r = len(lhs), len(rhs)
        if n_l == 0 or n_r == 0:
            return _empty()
        keys = np.concatenate(
            [
                lhs.column(left_key).to_numpy(zero_copy_only=False),
                rhs.column(left_key).to_numpy(zero_copy_only=False),
            ]
        )
        codes, _ = pd.factorize(keys)  # grouping-only codes
        ts = np.concatenate(
            [
                lhs.column(left_ts).to_numpy(zero_copy_only=False),
                rhs.column(left_ts).to_numpy(zero_copy_only=False),
            ]
        )
        n = n_l + n_r
        is_left = np.zeros(n, bool)
        is_left[:n_l] = True
        # right before left at equal ts → inclusive (l.ts >= r.ts) match
        order = np.lexsort((is_left, ts, codes))
        s_codes = codes[order]
        s_left = is_left[order]
        pos = np.arange(n, dtype=np.int64)
        # forward-fill the sorted position of the last right row...
        filled = np.maximum.accumulate(np.where(~s_left, pos, -1))
        # ...bounded to the current key run
        new_run = np.concatenate(([True], s_codes[1:] != s_codes[:-1]))
        run_start = np.maximum.accumulate(np.where(new_run, pos, -1))
        valid = filled >= run_start
        # map matched sorted positions back to original row indices
        s_orig = np.concatenate([np.arange(n_l), np.arange(n_r)])[order]
        at_left = s_left
        l_orig = s_orig[at_left]
        l_match = filled[at_left]
        l_valid = valid[at_left]
        if not l_valid.any():
            return _empty()
        r_orig = s_orig[l_match[l_valid]]
        hit = lhs.take(pa.array(l_orig[l_valid]))
        data = {nm: hit.column(nm) for nm in left_names}
        for c in right_value_cols:
            data[c] = pc.take(rhs.column(c), pa.array(r_orig))
        return pa.table(data)

    both = left_ds.map_batches(tag_left, batch_format="pyarrow").union(
        right_ds.map_batches(tag_right, batch_format="pyarrow")
    )
    return both.groupby(_BKT).map_groups(resolve, batch_format="pyarrow")
