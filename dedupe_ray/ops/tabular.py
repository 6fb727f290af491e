"""App-surface tabular operators (SURVEY §2.A) as Ray Data stages.

Each function cites the reference behavior it re-creates. All are
shuffle-free where the reference is row-local; joins broadcast the small side
(ray.put once) rather than shuffling.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from dedupe_ray.config import MISSING


def _bucket_hash_col(col: "pa.Array | pa.ChunkedArray", nb: int) -> pa.Array:
    """Grouping-only bucket hash of a key column: fixed-key siphash
    (``pd.util.hash_array``, cross-process deterministic) of the stringified
    values, mod ``nb``, vectorized. Bucket choice only co-locates keys — it
    never affects output content — so parity with the per-row crc32 loops
    this replaces is not required."""
    import numpy as np
    import pandas as pd

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    s = col.cast(pa.string()).fill_null("\x00null")
    h = pd.util.hash_array(s.to_numpy(zero_copy_only=False))
    return pa.array((h % np.uint64(nb)).astype(np.int32))


def column_mapped_union(
    ds_target: "ray.data.Dataset",
    ds_other: "ray.data.Dataset",
    mapping: dict[str, str],
    source_names: tuple[str, str] = ("file1", "file2"),
) -> "ray.data.Dataset":
    """Two-dataset merge with a user column mapping — the reference's
    column-mapped CSV/XLSX merge (frontend/src/utils/fileUtils.ts:61-170:
    header union = mapped(target) + unmapped(target) + unmapped(other);
    other's cells remapped; missing filled with ""; `source_file` appended).

    ``mapping`` maps other-column → target-column.
    """
    target_cols = [c for c in ds_target.schema().names if c != "source_file"]
    other_cols = [c for c in ds_other.schema().names if c != "source_file"]
    mapped_targets = set(mapping.values())
    extra_other = [c for c in other_cols if c not in mapping]
    final_cols = target_cols + [c for c in extra_other if c not in target_cols]

    def shape_target(batch: pa.Table) -> pa.Table:
        data = {}
        for c in final_cols:
            if c in batch.column_names:
                data[c] = pc.cast(batch.column(c), pa.string())
            else:
                data[c] = pa.array([""] * len(batch), pa.string())
        data["source_file"] = pa.array([source_names[0]] * len(batch), pa.string())
        return pa.table(data)

    inverse = {v: k for k, v in mapping.items()}

    def shape_other(batch: pa.Table) -> pa.Table:
        data = {}
        for c in final_cols:
            src = inverse.get(c, c if c in extra_other else None)
            if src is not None and src in batch.column_names:
                data[c] = pc.cast(batch.column(src), pa.string())
            else:
                data[c] = pa.array([""] * len(batch), pa.string())
        data["source_file"] = pa.array([source_names[1]] * len(batch), pa.string())
        return pa.table(data)

    a = ds_target.map_batches(shape_target, batch_format="pyarrow")
    b = ds_other.map_batches(shape_other, batch_format="pyarrow")
    return a.union(b)


def drop_empty_rows(ds: "ray.data.Dataset", columns: list[str] | None = None) -> "ray.data.Dataset":
    """Reference isEmptyRow filter (fileUtils.ts:56-58): drop rows where all
    cells are empty/null (vectorized)."""

    def _filter(batch: pa.Table) -> pa.Table:
        cols = columns or [c for c in batch.column_names if c != "source_file"]
        keep = None
        for c in cols:
            col = pc.cast(batch.column(c), pa.string())
            nonempty = pc.and_kleene(col.is_valid(), pc.not_equal(pc.utf8_trim_whitespace(pc.fill_null(col, "")), ""))
            keep = nonempty if keep is None else pc.or_(keep, nonempty)
        return batch.filter(pc.fill_null(keep, False))

    return ds.map_batches(_filter, batch_format="pyarrow")


def anti_join_export(
    ds: "ray.data.Dataset",
    remove_ids: set[str],
    id_column: str = "doc_id",
) -> "ray.data.Dataset":
    """Cleansed-export anti-join (useFileProcessor.ts:163-242): drop the
    records marked for removal. The removal set is broadcast (ray.put once),
    filtered map-side — no shuffle."""
    ref = ray.put(remove_ids)

    def _filter(batch: pa.Table) -> pa.Table:
        removal = ray.get(ref)
        mask = pa.array([v not in removal for v in batch.column(id_column).to_pylist()])
        return batch.filter(mask)

    return ds.map_batches(_filter, batch_format="pyarrow")


def attach_cluster_columns(
    ds: "ray.data.Dataset",
    clusters_ref,
    id_column: str = "doc_id",
) -> "ray.data.Dataset":
    """Re-attach cluster_id / confidence_score to records (the cleansed
    export's special columns, useFileProcessor.ts:188). ``clusters_ref`` is a
    ray.put of {doc_id: (cluster_id, confidence)}."""

    def _attach(batch: pa.Table) -> pa.Table:
        lookup = ray.get(clusters_ref)
        ids = batch.column(id_column).to_pylist()
        cl = [lookup.get(i, ("", None))[0] for i in ids]
        conf = [lookup.get(i, ("", None))[1] for i in ids]
        batch = batch.append_column("cluster_id", pa.array(cl, pa.string()))
        return batch.append_column("confidence_score", pa.array(conf, pa.float32()))

    return ds.map_batches(_attach, batch_format="pyarrow")


def semi_join_recover(
    ds: "ray.data.Dataset",
    pair_records: list[dict],
    fields: list[str],
) -> "ray.data.Dataset":
    """Reprocessing record recovery (A8, dedupe_script.py:219-252): find the
    dataset rows equal to the given labeled-pair records on every matching
    field. The reference scans the whole dict per pair; here the pair-record
    hashes are broadcast and the scan is one vectorized pass."""
    wanted = {tuple(r.get(f, "") or "" for f in fields) for r in pair_records}
    ref = ray.put(wanted)

    def _filter(batch: pa.Table) -> pa.Table:
        table = ray.get(ref)
        cols = [batch.column(f).to_pylist() for f in fields]
        mask = pa.array([tuple(c[i] or "" for c in cols) in table for i in range(len(batch))])
        return batch.filter(mask)

    return ds.map_batches(_filter, batch_format="pyarrow")


def preview(ds: "ray.data.Dataset", id_column: str, n: int = 6) -> dict:
    """File-preview head/tail (FilePreview.tsx:50-57): first n + last n rows
    plus total count."""
    total = ds.count()
    head = ds.limit(n).take(n)
    tail = ds.sort(id_column, descending=True).limit(n).take(n)[::-1]
    return {"total_rows": total, "head": head, "tail": tail}


def pair_diff(record_a: dict, record_b: dict, fields: list[str]) -> dict[str, bool]:
    """Per-field inequality flags (RecordComparison.tsx:46-53)."""
    return {f: (record_a.get(f) != record_b.get(f)) for f in fields}


def auto_column_mapping(
    cols_a: list[str], cols_b: list[str]
) -> tuple[dict[str, str], int]:
    """A23 (ColumnMapper.tsx:50-98): the wider file becomes the merge target
    (:56-68); same-named columns auto-map (:86-94). Returns
    ({other_col: target_col}, target_file_index 0|1)."""
    if len(cols_b) > len(cols_a):
        target, other, t_idx = cols_b, cols_a, 1
    else:
        target, other, t_idx = cols_a, cols_b, 0
    tset = set(target)
    return {c: c for c in other if c in tset}, t_idx


def missing_rate(ds: "ray.data.Dataset", columns: list[str]) -> dict[str, float]:
    """Share of MISSING-sentinel values per column (data-quality helper)."""

    def _counts(batch: pa.Table) -> pa.Table:
        data = {}
        for c in columns:
            data[f"miss_{c}"] = [
                pc.sum(pc.equal(batch.column(c), MISSING).cast(pa.int64())).as_py() or 0
            ]
        data["n"] = [len(batch)]
        return pa.table(data)

    parts = ds.map_batches(_counts, batch_format="pyarrow").to_pandas()
    n = parts["n"].sum()
    return {c: float(parts[f"miss_{c}"].sum()) / max(n, 1) for c in columns}


def sessionize(
    ds: "ray.data.Dataset",
    user_column: str = "user_id",
    ts_column: str = "ts",
    gap_seconds: int = 1800,
) -> "ray.data.Dataset":
    """Session assignment (gaps-and-islands): events of a user belong to the
    same session while consecutive gaps stay ≤ ``gap_seconds``. Adds
    ``session_id`` = "<user>#<n>" (0-based per user, time order).

    Shape: ONE bucketed shuffle — users are hashed into N_BUCKETS groups
    (never one python call per user; a bucket holds many users and is
    processed as a single vectorized sort + diff), so the op scales to any
    user cardinality. Events of one user must fit a bucket group — the
    same assumption every per-user window op makes."""
    import numpy as np

    from dedupe_ray.blocking import N_BUCKETS

    def bucketize(b: pa.Table) -> pa.Table:
        return b.append_column(
            "ubucket", _bucket_hash_col(b.column(user_column), N_BUCKETS)
        )

    def assign(group: pa.Table) -> pa.Table:
        if len(group) == 0:
            return group.drop_columns(["ubucket"])
        order = pc.sort_indices(
            group, sort_keys=[(user_column, "ascending"), (ts_column, "ascending")]
        )
        g = group.take(order)
        users = np.asarray(g.column(user_column).to_pylist(), object)
        ts = g.column(ts_column).to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        new_user = np.empty(len(g), bool)
        new_user[0] = True
        new_user[1:] = users[1:] != users[:-1]
        gap_break = np.empty(len(g), bool)
        gap_break[0] = True
        gap_break[1:] = (ts[1:] - ts[:-1]) > gap_seconds * 1_000_000
        new_session = new_user | gap_break
        # per-user session counter: cumsum of breaks minus the cumsum value
        # at the user's first row
        brk = new_session.astype(np.int64).cumsum() - 1
        first_of_user = np.where(new_user)[0]
        base = np.repeat(brk[first_of_user], np.diff(np.append(first_of_user, len(g))))
        sess_n = brk - base
        sid = pa.array([f"{u}#{k}" for u, k in zip(users, sess_n)], pa.string())
        return g.append_column("session_id", sid).drop_columns(["ubucket"])

    return (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("ubucket")
        .map_groups(assign, batch_format="pyarrow")
    )


def sliding_window_count(
    ds: "ray.data.Dataset",
    key_column: str = "user_id",
    ts_column: str = "ts",
    window_seconds: int = 600,
    n_buckets: int = 256,
) -> "ray.data.Dataset":
    """Per-row sliding-window aggregate: adds ``window_count`` = number of
    rows with the same key whose timestamp lies in ``[ts - window, ts]``
    (closed interval — SQL ``count(*) OVER (PARTITION BY key ORDER BY ts
    RANGE BETWEEN <window> PRECEDING AND CURRENT ROW)``, equal-timestamp
    peers included, self included).

    Shape: ONE bucketed shuffle (keys hashed into ``n_buckets`` groups);
    per bucket the probe is ``range_match_counts`` with the rows as their
    own queries — one lexsort + cumsum, no per-key loop.
    """
    import numpy as np
    import pandas as pd

    from dedupe_ray.joins import range_match_counts

    def bucketize(b: pa.Table) -> pa.Table:
        vals = b.column(key_column).to_numpy(zero_copy_only=False)
        bkt = (pd.util.hash_array(vals) % n_buckets).astype(np.int32)
        return b.append_column("__wbkt", pa.array(bkt))

    def count_windows(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["__wbkt"])
        keys = g.column(key_column).to_numpy(zero_copy_only=False)
        codes, _ = pd.factorize(keys)
        ts = g.column(ts_column).to_numpy(zero_copy_only=False)
        w = (
            np.timedelta64(window_seconds, "s")
            if np.issubdtype(ts.dtype, np.datetime64)
            else window_seconds
        )
        _, _, counts = range_match_counts(codes, ts - w, ts, codes, ts)
        return g.append_column("window_count", pa.array(counts.astype(np.int64)))

    return (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("__wbkt")
        .map_groups(count_windows, batch_format="pyarrow")
    )


def sliding_window_sum(
    ds: "ray.data.Dataset",
    key_column: str = "user_id",
    ts_column: str = "ts",
    value_column: str = "value",
    window_seconds: int = 600,
    out_column: str = "window_sum",
    n_buckets: int = 256,
) -> "ray.data.Dataset":
    """Per-row sliding-window SUM: ``out_column`` = sum of ``value_column``
    over same-key rows with timestamp in ``[ts - window, ts]`` (closed
    interval — SQL ``sum(v) OVER (PARTITION BY key ORDER BY ts RANGE
    BETWEEN <window> PRECEDING AND CURRENT ROW)``, peers + self included).

    Same shape as ``sliding_window_count``: ONE bucketed shuffle, per
    bucket ``range_match_counts`` + a prefix-sum difference over the
    returned right order — no per-key loop. Exact for integer values
    (int64 prefix sums); float values inherit the usual
    summation-order caveat.
    """
    import numpy as np
    import pandas as pd

    from dedupe_ray.joins import range_match_counts

    def bucketize(b: pa.Table) -> pa.Table:
        vals = b.column(key_column).to_numpy(zero_copy_only=False)
        bkt = (pd.util.hash_array(vals) % n_buckets).astype(np.int32)
        return b.append_column("__wsbkt", pa.array(bkt))

    def sum_windows(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["__wsbkt"])
        keys = g.column(key_column).to_numpy(zero_copy_only=False)
        codes, _ = pd.factorize(keys)
        ts = g.column(ts_column).to_numpy(zero_copy_only=False)
        w = (
            np.timedelta64(window_seconds, "s")
            if np.issubdtype(ts.dtype, np.datetime64)
            else window_seconds
        )
        vals = g.column(value_column).to_numpy(zero_copy_only=False)
        r_order, lo, cnt = range_match_counts(codes, ts - w, ts, codes, ts)
        prefix = np.concatenate(([0], np.cumsum(vals[r_order])))
        sums = prefix[lo + cnt] - prefix[lo]
        return g.append_column(out_column, pa.array(sums))

    return (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("__wsbkt")
        .map_groups(sum_windows, batch_format="pyarrow")
    )


def grouped_top_k(
    ds: "ray.data.Dataset",
    key_column: str,
    order_column: str,
    k: int,
    descending: bool = True,
    tiebreak_column: str | None = None,
    n_buckets: int = 256,
) -> "ray.data.Dataset":
    """Per-key top-k: keep the k rows with the largest (or smallest)
    ``order_column`` per key — the SQL
    ``row_number() OVER (PARTITION BY key ORDER BY v [DESC], tie) <= k``.
    Ties beyond ``order_column`` resolve by ``tiebreak_column`` ascending
    (required for deterministic output when order values repeat).

    ONE bucketed shuffle; per bucket a single lexsort + run-relative rank
    (arange minus run starts) — no per-key loop, any key cardinality.
    """
    import numpy as np
    import pandas as pd

    def bucketize(b: pa.Table) -> pa.Table:
        vals = b.column(key_column).to_numpy(zero_copy_only=False)
        bkt = (pd.util.hash_array(vals) % n_buckets).astype(np.int32)
        return b.append_column("__tbkt", pa.array(bkt))

    def head_k(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["__tbkt"])
        keys = g.column(key_column).to_numpy(zero_copy_only=False)
        codes, _ = pd.factorize(keys)
        order_vals = g.column(order_column).to_numpy(zero_copy_only=False)
        sort_keys = [order_vals if not descending else _descending_key(order_vals)]
        if tiebreak_column is not None:
            sort_keys.insert(0, g.column(tiebreak_column).to_numpy(zero_copy_only=False))
        order = np.lexsort(tuple(sort_keys) + (codes,))
        s_codes = codes[order]
        pos = np.arange(len(order), dtype=np.int64)
        new_run = np.concatenate(([True], s_codes[1:] != s_codes[:-1]))
        run_start = np.maximum.accumulate(np.where(new_run, pos, -1))
        keep = (pos - run_start) < k
        return g.take(pa.array(np.sort(order[keep])))

    return (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("__tbkt")
        .map_groups(head_k, batch_format="pyarrow")
    )


def _descending_key(vals):
    """Sort key that orders ``vals`` descending under an ascending sort:
    negation for numerics, DENSE-rank inversion for everything else (equal
    values must stay equal so the tiebreak column — not input order —
    resolves ties)."""
    import numpy as np

    if vals.dtype.kind == "u":
        return np.invert(vals)  # 2^N−1−v: wrap-free unsigned descending key
    if np.issubdtype(vals.dtype, np.number):
        return -vals
    if np.issubdtype(vals.dtype, np.datetime64):
        return -vals.astype(np.int64)
    _, inverse = np.unique(vals, return_inverse=True)
    return -inverse


def grouped_sample_nth(
    ds: "ray.data.Dataset",
    key_column: str,
    order_column: str,
    n: int,
    n_buckets: int = 256,
) -> "ray.data.Dataset":
    """Deterministic stratified sample: keep every ``n``-th row per key in
    ``order_column`` order (rows at 0-based per-key rank ``r`` with
    ``r % n == 0``) — SQL ``(row_number() OVER (PARTITION BY key ORDER BY
    ord) - 1) % n = 0``. Every key keeps ≥1 row (its first), so small strata
    survive — unlike a Bernoulli sample.

    ONE bucketed shuffle; per bucket a single lexsort + run-relative rank,
    no per-key loop — any key cardinality.
    """
    import numpy as np
    import pandas as pd

    def bucketize(b: pa.Table) -> pa.Table:
        vals = b.column(key_column).to_numpy(zero_copy_only=False)
        bkt = (pd.util.hash_array(vals) % n_buckets).astype(np.int32)
        return b.append_column("__sbkt", pa.array(bkt))

    def pick_nth(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["__sbkt"])
        keys = g.column(key_column).to_numpy(zero_copy_only=False)
        codes, _ = pd.factorize(keys)
        order_vals = g.column(order_column).to_numpy(zero_copy_only=False)
        order = np.lexsort((order_vals, codes))
        s_codes = codes[order]
        pos = np.arange(len(order), dtype=np.int64)
        new_run = np.concatenate(([True], s_codes[1:] != s_codes[:-1]))
        run_start = np.maximum.accumulate(np.where(new_run, pos, -1))
        keep = (pos - run_start) % n == 0
        return g.take(pa.array(np.sort(order[keep])))

    return (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("__sbkt")
        .map_groups(pick_nth, batch_format="pyarrow")
    )


def cap_per_key(
    ds: "ray.data.Dataset",
    key_column: str,
    order_column: str,
    n: int,
    n_buckets: int = 256,
) -> "ray.data.Dataset":
    """Per-key quota cap: keep each key's first ``n`` rows in
    ``order_column`` order (the Common-Crawl-style per-domain/source quota
    that stops one giant source from dominating a training mix) — SQL
    ``row_number() OVER (PARTITION BY key ORDER BY ord) <= n``.
    ``order_column`` must be a unique tiebreaker (an id) for a
    deterministic result.

    Same shape as :func:`grouped_sample_nth`: ONE bucketed shuffle, one
    vectorized lexsort + run-relative rank per bucket, any key
    cardinality."""
    import numpy as np
    import pandas as pd

    def bucketize(b: pa.Table) -> pa.Table:
        vals = b.column(key_column).to_numpy(zero_copy_only=False)
        bkt = (pd.util.hash_array(vals) % n_buckets).astype(np.int32)
        return b.append_column("__cbkt", pa.array(bkt))

    def cap(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["__cbkt"])
        keys = g.column(key_column).to_numpy(zero_copy_only=False)
        codes, _ = pd.factorize(keys)
        order_vals = g.column(order_column).to_numpy(zero_copy_only=False)
        order = np.lexsort((order_vals, codes))
        s_codes = codes[order]
        pos = np.arange(len(order), dtype=np.int64)
        new_run = np.concatenate(([True], s_codes[1:] != s_codes[:-1]))
        run_start = np.maximum.accumulate(np.where(new_run, pos, -1))
        keep = (pos - run_start) < n
        return g.take(pa.array(np.sort(order[keep])))

    return (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("__cbkt")
        .map_groups(cap, batch_format="pyarrow")
    )


def mix_corpora(
    sources: dict[str, "ray.data.Dataset"],
    weights: dict[str, float],
    key_column: str,
    strategy: str = "hash",
    seed: str = "mix",
) -> "ray.data.Dataset":
    """Deterministic weighted corpus mixing (the LLM-training data-mix
    step): every source keeps a weight-sized, per-row-deterministic slice
    of its rows, tagged ``mix_source``, and the slices union into one
    stream. Down-sampling only (0 ≤ w ≤ 1) — up-weighting is explicit
    epoch repetition at the trainer, never silent row duplication.

    ``strategy="hash"`` (default): a row survives iff
    ``crc32(f"{seed}:{name}:{key}") ≤ w·2³²`` — independent of row order,
    partitioning, and the other sources (the same vectorized keyspace
    machinery the training samplers use); rate accuracy is
    property-tested. ``strategy="modulo"``: survives iff
    ``(key % 1000) < round(w·1000)`` for integer keys — weaker mixing
    (assumes keys uniform mod 1000) but ANSI-SQL-expressible, which is
    what the driver oracle pins."""
    import numpy as np

    if set(sources) != set(weights):
        raise ValueError("sources and weights must share keys")
    outs = []
    for name in sorted(sources):
        w = float(weights[name])
        if not 0.0 <= w <= 1.0:
            raise ValueError(f"weight for {name!r} must be in [0, 1], got {w}")
        if w == 0.0:
            continue
        if strategy == "hash":
            from dedupe_ray.pipeline import _keyspace_mask

            def _stage(b: pa.Table, _w=w, _name=name) -> pa.Table:
                kept = b.filter(
                    _keyspace_mask(b.column(key_column), f"{seed}:{_name}:", _w)
                )
                return kept.append_column(
                    "mix_source", pa.array([_name] * len(kept), pa.string())
                )

        elif strategy == "modulo":
            cut = int(round(w * 1000))

            def _stage(b: pa.Table, _cut=cut, _name=name) -> pa.Table:
                k = b.column(key_column).to_numpy(zero_copy_only=False)
                kept = b.filter(pa.array((k % 1000) < _cut))
                return kept.append_column(
                    "mix_source", pa.array([_name] * len(kept), pa.string())
                )

        else:
            raise ValueError(f"unknown strategy {strategy!r}")
        outs.append(sources[name].map_batches(_stage, batch_format="pyarrow"))
    if not outs:
        raise ValueError("all weights are zero")
    return outs[0].union(*outs[1:]) if len(outs) > 1 else outs[0]


def pack_documents(
    ds: "ray.data.Dataset",
    group_column: str,
    order_column: str,
    length_column: str,
    capacity: int,
    out_column: str = "pack_id",
    n_buckets: int = 256,
) -> "ray.data.Dataset":
    """Contiguous sequence packing for LLM training batches: within each
    group (ordered by ``order_column``) documents are laid head-to-tail and
    ``out_column`` = exclusive-prefix-length // capacity — the pack a
    document STARTS in when packs are cut every ``capacity`` length units
    (a document overflowing a boundary spills into the next pack, the
    standard concat-then-chunk layout, cf. GPT-2/T5 packing). Integer math
    throughout, so the assignment is bit-exact against the SQL window
    ``sum(len) OVER (... ROWS UNBOUNDED PRECEDING AND 1 PRECEDING) //
    capacity``.

    ONE bucketed shuffle (groups hashed into ``n_buckets``); per bucket a
    lexsort + cumsum with per-group base subtraction — no per-group loop.
    """
    import numpy as np
    import pandas as pd

    def bucketize(b: pa.Table) -> pa.Table:
        vals = b.column(group_column).to_numpy(zero_copy_only=False)
        bkt = (pd.util.hash_array(vals) % n_buckets).astype(np.int32)
        return b.append_column("__pbkt", pa.array(bkt))

    def assign_packs(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["__pbkt"])
        if len(g) == 0:
            return g.append_column(out_column, pa.array([], pa.int64()))
        keys = g.column(group_column).to_numpy(zero_copy_only=False)
        codes, _ = pd.factorize(keys)
        order_vals = g.column(order_column).to_numpy(zero_copy_only=False)
        order = np.lexsort((order_vals, codes))
        lengths = (
            g.column(length_column).to_numpy(zero_copy_only=False).astype(np.int64)[order]
        )
        s_codes = codes[order]
        cs = np.cumsum(lengths)
        exclusive = cs - lengths
        new_run = np.concatenate(([True], s_codes[1:] != s_codes[:-1]))
        first_of_run = np.where(new_run)[0]
        base = np.repeat(
            exclusive[first_of_run],
            np.diff(np.append(first_of_run, len(order))),
        )
        pack = (exclusive - base) // capacity
        inv = np.empty_like(order)
        inv[order] = np.arange(len(order))
        return g.append_column(out_column, pa.array(pack[inv]))

    return (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("__pbkt")
        .map_groups(assign_packs, batch_format="pyarrow")
    )


def grouped_quantile_disc(
    ds: "ray.data.Dataset",
    key_column: str,
    value_column: str,
    q: float = 0.5,
    out_column: str = "quantile",
    n_buckets: int = 256,
) -> "ray.data.Dataset":
    """Per-key discrete quantile: the element at 0-based sorted position
    ``floor((n - 1) * q)`` within each key — SQL ``quantile_disc(v, q)``
    semantics (an ACTUAL element is returned, so the result is bit-exact
    against the oracle; interpolated medians differ in the last ulp
    depending on the interpolation formula).

    ONE bucketed shuffle; per bucket one lexsort + run-length arithmetic.
    """
    import numpy as np
    import pandas as pd

    def bucketize(b: pa.Table) -> pa.Table:
        vals = b.column(key_column).to_numpy(zero_copy_only=False)
        bkt = (pd.util.hash_array(vals) % n_buckets).astype(np.int32)
        return b.append_column("__qbkt", pa.array(bkt))

    def quantiles(g: pa.Table) -> pa.Table:
        keys = g.column(key_column).to_numpy(zero_copy_only=False)
        codes, _ = pd.factorize(keys)
        vals = g.column(value_column).to_numpy(zero_copy_only=False)
        order = np.lexsort((vals, codes))
        s_codes = codes[order]
        n = len(order)
        new_run = np.concatenate(([True], s_codes[1:] != s_codes[:-1]))
        starts = np.nonzero(new_run)[0]
        lengths = np.diff(np.append(starts, n))
        pick = starts + np.floor((lengths - 1) * q).astype(np.int64)
        sel = order[pick]
        return pa.table(
            {
                key_column: pa.compute.take(g.column(key_column), pa.array(sel)),
                out_column: pa.compute.take(g.column(value_column), pa.array(sel)),
            }
        )

    return (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("__qbkt")
        .map_groups(quantiles, batch_format="pyarrow")
    )


def grouped_quantile_cont(
    ds: "ray.data.Dataset",
    key_column: str,
    value_column: str,
    q: float = 0.5,
    out_column: str = "quantile",
    n_buckets: int = 256,
) -> "ray.data.Dataset":
    """Per-key INTERPOLATED quantile (SQL ``percentile_cont`` semantics:
    lerp between the order statistics at floor((n−1)q) and ceil((n−1)q))
    — same one-shuffle bucketed shape as :func:`grouped_quantile_disc`;
    the lerp ``v1 + (v2 − v1)·frac`` with ``frac = (n−1)·q − floor(...)``
    is written as the exact IEEE chain a SQL row_number mirror evaluates,
    so float results are engine-exact. Nulls are dropped (SQL
    aggregate-null semantics)."""
    import numpy as np
    import pandas as pd

    def bucketize(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b.column(value_column)))
        vals = b.column(key_column).to_numpy(zero_copy_only=False)
        bkt = (pd.util.hash_array(vals) % n_buckets).astype(np.int32)
        return b.append_column("__qbkt", pa.array(bkt))

    def quantiles(g: pa.Table) -> pa.Table:
        if len(g) == 0:
            return pa.table(
                {
                    key_column: pa.array([], g.column(key_column).type),
                    out_column: pa.array([], pa.float64()),
                }
            )
        keys = g.column(key_column).to_numpy(zero_copy_only=False)
        codes, _ = pd.factorize(keys)
        vals = g.column(value_column).to_numpy(zero_copy_only=False)
        order = np.lexsort((vals, codes))
        s_codes = codes[order]
        s_vals = vals[order].astype(np.float64)
        n = len(order)
        new_run = np.concatenate(([True], s_codes[1:] != s_codes[:-1]))
        starts = np.nonzero(new_run)[0]
        lengths = np.diff(np.append(starts, n))
        # CAST(n - 1 AS DOUBLE) * q — the same literal chain as the oracle
        pos = (lengths - 1).astype(np.float64) * q
        k1 = np.floor(pos).astype(np.int64)
        k2 = np.ceil(pos).astype(np.int64)
        frac = pos - np.floor(pos)
        v1 = s_vals[starts + k1]
        v2 = s_vals[starts + k2]
        out = v1 + (v2 - v1) * frac
        sel = pa.array(order[starts])
        return pa.table(
            {
                key_column: pa.compute.take(g.column(key_column), sel),
                out_column: pa.array(out, pa.float64()),
            }
        )

    return (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("__qbkt")
        .map_groups(quantiles, batch_format="pyarrow")
    )


def grouped_count_distinct(
    ds: "ray.data.Dataset",
    group_column: str,
    value_column: str,
    out_column: str = "n_distinct",
) -> "ray.data.Dataset":
    """Exact COUNT(DISTINCT value) per group — the exact counterpart of
    ``ops.sketch.hll_approx_distinct`` (use the sketch when the distinct
    pair set itself is too large to shuffle).

    Shape: per-batch (group, value) pre-dedup (the combiner — a batch with
    a million repeats of one value ships ONE row) → groupby(group, value)
    count to finish the dedup → per-batch re-count partials → a tiny
    groupby(group) sum.
    """
    import numpy as np
    import pandas as pd

    from ray.data.aggregate import Sum

    def dedup_batch(b: pa.Table) -> pa.Table:
        g = b.column(group_column).to_numpy(zero_copy_only=False)
        v = b.column(value_column).to_numpy(zero_copy_only=False)
        df = pd.DataFrame({group_column: g, value_column: v}).drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    pairs = (
        ds.map_batches(dedup_batch, batch_format="pyarrow")
        .groupby([group_column, value_column])
        .count()
    )

    def count_partials(b: pa.Table) -> pa.Table:
        g = b.column(group_column).to_numpy(zero_copy_only=False)
        codes, uniques = pd.factorize(g)
        cnt = np.bincount(codes, minlength=len(uniques)).astype(np.int64)
        return pa.table({group_column: pa.array(np.asarray(uniques)), out_column: pa.array(cnt)})

    return (
        pairs.map_batches(count_partials, batch_format="pyarrow")
        .groupby(group_column)
        .aggregate(Sum(out_column, alias_name=out_column))
    )


def grouped_mode(
    ds: "ray.data.Dataset",
    group_column: str,
    value_column: str,
    out_column: str = "mode_value",
) -> "ray.data.Dataset":
    """Most frequent value per group, ties broken to the SMALLEST value —
    fully deterministic (SQL: row_number over count desc, value asc).

    Shape: per-batch (group, value) partial counts (one factorize) →
    groupby(group, value) sum finishes the counts → per-batch argmax
    partials (each batch keeps one candidate per group) → a final tiny
    per-group argmax. All shuffles carry combiner-sized partials."""
    import numpy as np
    import pandas as pd

    from ray.data.aggregate import Sum

    def partial_counts(b: pa.Table) -> pa.Table:
        df = b.select([group_column, value_column]).to_pandas()
        g = (
            df.groupby([group_column, value_column], sort=False)
            .size()
            .rename("cnt")
            .reset_index()
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    counts = (
        ds.map_batches(partial_counts, batch_format="pyarrow")
        .groupby([group_column, value_column])
        .aggregate(Sum("cnt", alias_name="cnt"))
    )

    def argmax_partial(b: pa.Table) -> pa.Table:
        df = b.to_pandas().sort_values(
            [group_column, "cnt", value_column], ascending=[True, False, True]
        )
        return pa.Table.from_pandas(
            df.drop_duplicates(subset=[group_column], keep="first"),
            preserve_index=False,
        )

    def argmax_final(g: pa.Table) -> pa.Table:
        t = argmax_partial(g)
        return pa.table(
            {
                group_column: t.column(group_column),
                out_column: t.column(value_column),
                "mode_count": t.column("cnt"),
            }
        )

    return (
        counts.map_batches(argmax_partial, batch_format="pyarrow")
        .groupby(group_column)
        .map_groups(argmax_final, batch_format="pyarrow")
    )


def grouped_concat(
    ds: "ray.data.Dataset",
    key_column: str,
    value_column: str,
    order_column: str,
    sep: str = ",",
    out_column: str = "agg",
    n_buckets: int = 256,
) -> "ray.data.Dataset":
    """Per-key ordered string aggregation — SQL ``string_agg(value, sep
    ORDER BY ord)``. ONE bucketed shuffle; per bucket a lexsort builds a
    run-length list array and a single ``pc.binary_join`` concatenates —
    no per-key loop. A key's values must fit one group (the same
    assumption the SQL aggregate makes of its hash table)."""
    import numpy as np
    import pandas as pd

    def bucketize(b: pa.Table) -> pa.Table:
        vals = b.column(key_column).to_numpy(zero_copy_only=False)
        bkt = (pd.util.hash_array(vals) % n_buckets).astype(np.int32)
        return b.append_column("__cbkt", pa.array(bkt))

    def concat(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["__cbkt"])
        keys = g.column(key_column).to_numpy(zero_copy_only=False)
        codes, _ = pd.factorize(keys)
        order_vals = g.column(order_column).to_numpy(zero_copy_only=False)
        order = np.lexsort((order_vals, codes))
        s_codes = codes[order]
        vals = pc.cast(pc.take(g.column(value_column), pa.array(order)), pa.string())
        new_run = np.concatenate(([True], s_codes[1:] != s_codes[:-1]))
        starts = np.nonzero(new_run)[0]
        offsets = np.append(starts, len(order)).astype(np.int32)
        lists = pa.ListArray.from_arrays(pa.array(offsets), vals.combine_chunks() if isinstance(vals, pa.ChunkedArray) else vals)
        joined = pc.binary_join(lists, sep)
        sel = pa.array(order[starts])
        return pa.table(
            {
                key_column: pc.take(g.column(key_column), sel),
                out_column: joined,
            }
        )

    return (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("__cbkt")
        .map_groups(concat, batch_format="pyarrow")
    )


def pivot_counts(
    ds: "ray.data.Dataset",
    key_column: str,
    pivot_column: str,
    categories: list[str],
    prefix: str = "n_",
) -> "ray.data.Dataset":
    """Pivot categorical counts into columns: one row per key with
    ``<prefix><cat>`` = count of rows where ``pivot_column == cat`` — SQL
    ``count(*) FILTER (WHERE ...)`` per category. ``categories`` is
    explicit so the output schema is static (a distributed discovery pass
    would make the schema data-dependent — the scale-correct API).

    Combiner pattern: per-batch vectorized category counts per key, then
    one tiny groupby-sum per column.
    """
    import numpy as np
    import pandas as pd

    from ray.data.aggregate import Sum

    def partials(b: pa.Table) -> pa.Table:
        keys = b.column(key_column).to_numpy(zero_copy_only=False)
        piv = b.column(pivot_column).to_numpy(zero_copy_only=False)
        codes, uniques = pd.factorize(keys)
        data = {key_column: pa.array(np.asarray(uniques))}
        for cat in categories:
            hits = np.bincount(
                codes[piv == cat], minlength=len(uniques)
            ).astype(np.int64)
            data[f"{prefix}{cat}"] = pa.array(hits)
        return pa.table(data)

    return (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby(key_column)
        .aggregate(
            *[Sum(f"{prefix}{c}", alias_name=f"{prefix}{c}") for c in categories]
        )
    )


def filter_top_fraction(
    ds: "ray.data.Dataset",
    column: str,
    fraction: float,
) -> "ray.data.Dataset":
    """Quality-threshold pruning: keep the rows whose ``column`` value is
    in the top ``fraction`` of the corpus — SQL ``WHERE v >= (SELECT
    quantile_disc(v, 1-fraction) ...)``. The cutoff comes from
    :func:`global_quantile_disc` (exact, shuffle-free at any scale), then
    one streamed filter pass — the standard "keep the best X% by quality
    score" step of a training-data pipeline. Ties at the cutoff are kept
    (≥), so the result can exceed ``fraction`` exactly as the SQL does."""
    if not 0.0 < fraction <= 1.0:
        raise ValueError(f"fraction must be in (0, 1], got {fraction}")
    cutoff = global_quantile_disc(ds, column, q=1.0 - fraction)

    def keep(b: pa.Table) -> pa.Table:
        return b.filter(pc.greater_equal(b.column(column), cutoff))

    return ds.map_batches(keep, batch_format="pyarrow")


def global_quantile_disc(
    ds: "ray.data.Dataset",
    column: str,
    q: float = 0.5,
    bins: int = 1 << 16,
    collect_limit: int = 2_000_000,
    max_rounds: int = 64,
    rank: int | None = None,
):
    """Global discrete quantile (SQL ``quantile_disc(v, q)``: the ACTUAL
    element at 0-based sorted position ``floor((n-1)*q)``) computed
    WITHOUT a global sort or any shuffle — the scale path for "p99 over
    100 TB".

    Iterative histogram refinement: each round runs two streaming passes
    over the column — (A) exact counts below/inside the current closed
    candidate range plus its true min/max, (B) a ``bins``-bucket histogram
    of the in-range values whose cumulative counts pick the bucket holding
    the target rank. The range shrinks ~``bins``× per round (float edges
    are widened by one ulp; the next round's exact pass A re-anchors the
    rank, so rounding can only widen, never lose, the candidate set).
    Terminates when the in-range population fits ``collect_limit`` (one
    small driver sort of actual elements) or collapses to a single value.
    Doubles need ~4 rounds; nothing but (bin, count) partials ever leaves
    the workers. Nulls are ignored (SQL semantics); returns None on an
    empty column.
    """
    import math

    import numpy as np

    def _col(b: pa.Table) -> np.ndarray:
        return pc.drop_null(b.column(column)).to_numpy(zero_copy_only=False)

    def stats_pass(lo: float, hi: float):
        def f(b: pa.Table) -> pa.Table:
            v = _col(b).astype(np.float64, copy=False)
            inside = (v >= lo) & (v <= hi)
            vin = v[inside]
            return pa.table(
                {
                    "below": pa.array([int((v < lo).sum())], pa.int64()),
                    "cnt": pa.array([len(vin)], pa.int64()),
                    "mn": pa.array([float(vin.min()) if len(vin) else math.inf]),
                    "mx": pa.array([float(vin.max()) if len(vin) else -math.inf]),
                }
            )

        p = ds.map_batches(f, batch_format="pyarrow").to_pandas()
        return (
            int(p["below"].sum()),
            int(p["cnt"].sum()),
            float(p["mn"].min()),
            float(p["mx"].max()),
        )

    def hist_pass(lo: float, hi: float) -> np.ndarray:
        scale = bins / (hi - lo)

        def f(b: pa.Table) -> pa.Table:
            v = _col(b).astype(np.float64, copy=False)
            v = v[(v >= lo) & (v <= hi)]
            idx = np.minimum((v - lo) * scale, bins - 1).astype(np.int64)
            idx = np.maximum(idx, 0)
            cnt = np.bincount(idx, minlength=bins)
            nz = np.nonzero(cnt)[0]
            return pa.table(
                {"bin": pa.array(nz), "c": pa.array(cnt[nz], pa.int64())}
            )

        p = ds.map_batches(f, batch_format="pyarrow").to_pandas()
        h = np.zeros(bins, np.int64)
        np.add.at(h, p["bin"].to_numpy(), p["c"].to_numpy())
        return h

    below, n, lo, hi = stats_pass(-math.inf, math.inf)
    if n == 0:
        return None
    # an explicit 0-based order-statistic rank overrides q (the
    # interpolated-quantile caller needs the two NEIGHBORING ranks)
    rank = int(math.floor((n - 1) * q)) if rank is None else int(rank)

    for _ in range(max_rounds):
        r = rank - below  # 0-based rank within the in-range population
        if lo == hi:
            return lo
        if n <= collect_limit:
            vals = np.sort(
                np.concatenate(
                    [
                        v[(v >= lo) & (v <= hi)]
                        for b in ds.iter_batches(batch_format="pyarrow")
                        for v in [_col(b).astype(np.float64, copy=False)]
                    ]
                    or [np.zeros(0)]
                )
            )
            return float(vals[r])
        h = hist_pass(lo, hi)
        cum = np.cumsum(h)
        b = int(np.searchsorted(cum, r + 1))
        width = (hi - lo) / bins
        new_lo = np.nextafter(lo + b * width, -math.inf)
        new_hi = np.nextafter(lo + (b + 1) * width, math.inf)
        # pass A counts strictly-below GLOBALLY, so this re-anchors the rank
        # exactly regardless of the widened float edges
        below, n, lo, hi = stats_pass(new_lo, new_hi)
    raise RuntimeError(f"global_quantile_disc did not converge in {max_rounds} rounds")


def global_quantile_cont(
    ds: "ray.data.Dataset",
    column: str,
    q: float = 0.5,
    **kw,
):
    """Global INTERPOLATED quantile (SQL ``percentile_cont``: linear
    interpolation between the order statistics at floor((n−1)q) and
    ceil((n−1)q)) — same zero-shuffle iterative-histogram engine as
    :func:`global_quantile_disc`, run once per neighboring rank.

    The lerp ``v1 + (v2 − v1)·frac`` with ``frac = (n−1)q − floor((n−1)q)``
    is written with the exact literals/association a SQL oracle mirrors,
    so the float result is engine-exact (both sides evaluate the same
    IEEE-double expression on the same exact order statistics)."""
    import math

    def _count(b: pa.Table) -> pa.Table:
        return pa.table(
            {"n": pa.array([len(pc.drop_null(b.column(column)))], pa.int64())}
        )

    from ray.data.aggregate import Sum

    n = int(ds.map_batches(_count, batch_format="pyarrow").aggregate(Sum("n", alias_name="n"))["n"] or 0)
    if n == 0:
        return None
    pos = (n - 1) * q
    k1 = int(math.floor(pos))
    k2 = int(math.ceil(pos))
    v1 = global_quantile_disc(ds, column, rank=k1, **kw)
    v2 = v1 if k2 == k1 else global_quantile_disc(ds, column, rank=k2, **kw)
    return v1 + (v2 - v1) * (pos - k1)


def profile_columns(
    ds: "ray.data.Dataset",
    columns: list[str] | None = None,
) -> "ray.data.Dataset":
    """Single-pass table profile — the "look before you process 100 TB"
    data-quality op: one output row per column with row/null counts,
    numeric min/max (as double) and total string length (codepoints,
    SQL ``len()`` semantics).

    Shape: one map_batches partial emits a fixed ``n_columns``-row table
    per batch; a groupby over the (tiny) column-name key merges partials
    with Sum/Min/Max — the shuffle carries ``n_columns × n_blocks``
    rows regardless of data size. String min/max VALUES are deliberately
    omitted (bytewise vs collation ordering is engine-specific); lengths
    are collation-free.
    """
    import numpy as np

    from ray.data.aggregate import Max, Min, Sum

    names = list(columns) if columns is not None else list(ds.schema().names)

    def partial(b: pa.Table) -> pa.Table:
        rows = []
        for name in names:
            col = b.column(name)
            n = len(col)
            nulls = col.null_count
            typ = col.type
            min_num = max_num = None
            total_len = None
            if pa.types.is_integer(typ) or pa.types.is_floating(typ):
                if n - nulls > 0:
                    mm = pc.min_max(col)
                    min_num = float(mm["min"].as_py())
                    max_num = float(mm["max"].as_py())
            elif pa.types.is_string(typ) or pa.types.is_large_string(typ):
                total_len = int(
                    pc.sum(pc.utf8_length(pc.drop_null(col))).as_py() or 0
                )
            rows.append((name, n, nulls, min_num, max_num, total_len))
        return pa.table(
            {
                "column_name": pa.array([r[0] for r in rows], pa.string()),
                "n_rows": pa.array([r[1] for r in rows], pa.int64()),
                "n_nulls": pa.array([r[2] for r in rows], pa.int64()),
                # per-partial identity elements keep Min/Max/Sum merges
                # closed; the final pass restores NULL for absent stats
                "min_num": pa.array(
                    [r[3] if r[3] is not None else np.inf for r in rows]
                ),
                "max_num": pa.array(
                    [r[4] if r[4] is not None else -np.inf for r in rows]
                ),
                "total_len": pa.array(
                    [r[5] if r[5] is not None else -1 for r in rows], pa.int64()
                ),
            }
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("column_name")
        .aggregate(
            Sum("n_rows", alias_name="n_rows"),
            Sum("n_nulls", alias_name="n_nulls"),
            Min("min_num", alias_name="min_num"),
            Max("max_num", alias_name="max_num"),
            Max("total_len", alias_name="has_len"),
            Sum("total_len", alias_name="len_sum"),
        )
    )

    def finalize(b: pa.Table) -> pa.Table:
        import numpy as np

        mn = b.column("min_num").to_numpy(zero_copy_only=False)
        mx = b.column("max_num").to_numpy(zero_copy_only=False)
        # a column's Arrow type is block-invariant, so string columns'
        # length partials are all ≥ 0 (len_sum is the exact total) and
        # numeric columns' are all -1 (max is -1 → NULL)
        is_str = b.column("has_len").to_numpy(zero_copy_only=False) >= 0
        len_sum = b.column("len_sum").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "column_name": b.column("column_name"),
                "n_rows": b.column("n_rows"),
                "n_nulls": b.column("n_nulls"),
                "min_num": pa.array(
                    [float(v) if np.isfinite(v) else None for v in mn],
                    pa.float64(),
                ),
                "max_num": pa.array(
                    [float(v) if np.isfinite(v) else None for v in mx],
                    pa.float64(),
                ),
                "total_len": pa.array(
                    [int(s) if ok else None for s, ok in zip(len_sum, is_str)],
                    pa.int64(),
                ),
            }
        )

    return agg.map_batches(finalize, batch_format="pyarrow")


def json_number_field(
    ds: "ray.data.Dataset",
    column: str,
    key: str,
    out_column: str | None = None,
) -> "ray.data.Dataset":
    """Extract a NUMERIC field from a flat-JSON string column, fully
    vectorized (one RE2 ``extract_regex`` per batch — no per-row json
    parse): the event-stream "pull one metric out of the props blob"
    step. Handles integer/float/negative/exponent literals per the JSON
    grammar; a missing key or non-numeric value yields NULL (SQL
    ``json_extract`` semantics). Keys are matched literally (regex
    metacharacters escaped); nested objects with the same key at deeper
    levels are out of scope — documented flat-JSON contract.
    """
    import re as _re

    out = out_column or key
    pat = (
        '"' + _re.escape(key) + '"\\s*:\\s*'
        "(?P<num>-?(?:0|[1-9][0-9]*)(?:\\.[0-9]+)?(?:[eE][+-][0-9]+|[eE][0-9]+)?)"
    )

    def extract(b: pa.Table) -> pa.Table:
        col = pc.fill_null(b.column(column), "")
        m = pc.extract_regex(col, pat)
        num = pc.struct_field(m, "num")  # null where the pattern missed
        return b.append_column(out, pc.cast(num, pa.float64()))

    return ds.map_batches(extract, batch_format="pyarrow")


def _multiset_compare(
    a_ds: "ray.data.Dataset",
    b_ds: "ray.data.Dataset",
    keep: str,
    n_buckets: int = 256,
) -> "ray.data.Dataset":
    """Shared kernel for EXCEPT ALL / INTERSECT ALL: rows co-locate by a
    full-row hash (one bucketed shuffle carrying the rows once), then each
    bucket diffs the two sides' multisets with one vectorized pandas
    groupby over all columns. Column sets must match; output rows come
    from the ``a`` side (surplus or overlap count copies)."""
    import numpy as np
    import pandas as pd

    cols = list(a_ds.schema().names)
    if list(b_ds.schema().names) != cols:
        raise ValueError(
            f"schema mismatch: {cols} vs {list(b_ds.schema().names)}"
        )

    def tag(side: int):
        def f(b: pa.Table) -> pa.Table:
            df = b.to_pandas()
            h = np.zeros(len(df), np.uint64)
            for c in cols:
                h = h * np.uint64(1099511628211) ^ pd.util.hash_array(
                    df[c].to_numpy()
                )
            df["__side"] = np.int8(side)
            df["__mbkt"] = (h % np.uint64(n_buckets)).astype(np.int32)
            return pa.Table.from_pandas(df, preserve_index=False)

        return f

    both = a_ds.map_batches(tag(0), batch_format="pyarrow").union(
        b_ds.map_batches(tag(1), batch_format="pyarrow")
    )

    def per_bucket(g: pa.Table) -> pa.Table:
        empty = g.select(cols).slice(0, 0)
        if not len(g):
            return empty
        df = g.to_pandas()
        counts = (
            df.groupby(cols + ["__side"], sort=True, dropna=False)
            .size()
            .unstack("__side", fill_value=0)
        )
        cnt_a = counts[0] if 0 in counts.columns else 0
        cnt_b = counts[1] if 1 in counts.columns else 0
        if keep == "except":
            reps = np.maximum(np.asarray(cnt_a) - np.asarray(cnt_b), 0)
        else:  # intersect
            reps = np.minimum(np.asarray(cnt_a), np.asarray(cnt_b))
        rows = counts.index.to_frame(index=False)
        out = rows.loc[np.repeat(np.arange(len(rows)), reps)]
        if not len(out):
            return empty
        return pa.Table.from_pandas(
            out.reset_index(drop=True), preserve_index=False
        ).cast(empty.schema)

    return (
        both.groupby("__mbkt")
        .map_groups(per_bucket, batch_format="pyarrow")
        .select_columns(cols)
    )


def except_all(a_ds: "ray.data.Dataset", b_ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """SQL ``EXCEPT ALL`` (bag difference): each row of ``a`` survives
    ``max(count_a - count_b, 0)`` times — the data-validation primitive
    ("what changed between yesterday's table and today's"). One bucketed
    shuffle; see :func:`_multiset_compare`."""
    return _multiset_compare(a_ds, b_ds, "except")


def intersect_all(a_ds: "ray.data.Dataset", b_ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """SQL ``INTERSECT ALL`` (bag intersection): ``min(count_a, count_b)``
    copies of each common row. Same kernel as :func:`except_all`."""
    return _multiset_compare(a_ds, b_ds, "intersect")


def _grouped_window(
    ds: "ray.data.Dataset",
    key_column: str,
    order_columns: list[str],
    kernel,
    n_buckets: int | None = None,
) -> "ray.data.Dataset":
    """Shared shape for per-key ordered window ops (LAG/LEAD, running
    totals): ONE bucketed shuffle (keys hashed into N_BUCKETS groups, a
    bucket holds many keys), one vectorized sort per bucket, then
    ``kernel(sorted_table, new_key_mask)`` appends the window columns.
    Ties in ``order_columns`` must be broken by a unique column for a
    deterministic result — callers include one."""
    import numpy as np

    from dedupe_ray.blocking import N_BUCKETS

    nb = n_buckets or N_BUCKETS

    def bucketize(b: pa.Table) -> pa.Table:
        return b.append_column(
            "__wbkt", _bucket_hash_col(b.column(key_column), nb)
        )

    sort_keys = [(key_column, "ascending")] + [
        (c, "ascending") for c in order_columns
    ]

    def per_bucket(group: pa.Table) -> pa.Table:
        if len(group) == 0:
            return group.drop_columns(["__wbkt"])
        g = group.take(pc.sort_indices(group, sort_keys=sort_keys))
        keys = np.asarray(g.column(key_column).to_pylist(), object)
        new_key = np.empty(len(g), bool)
        new_key[0] = True
        new_key[1:] = keys[1:] != keys[:-1]
        return kernel(g, new_key).drop_columns(["__wbkt"])

    return (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("__wbkt")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


def rendezvous_assign(
    ds: "ray.data.Dataset",
    key_column: str,
    shards: "list[int]",
    out_column: str = "shard",
) -> "ray.data.Dataset":
    """Rendezvous / highest-random-weight (HRW) hashing (Thaler &
    Ravishankar 1998) — the stable shard-routing rule consistent
    systems use for cache/worker assignment:

        shard(k) = argmax over s ∈ shards of
                   h(k, s) = (1103515245 · ((k · (s + 2)) % P) + 12345) % P,
                   P = 2³¹ − 1, ties → lowest shard id

    with the MINIMAL-DISRUPTION property: removing a shard from the
    candidate list reassigns ONLY the keys that mapped to it (every
    other key's argmax is untouched) — unlike ``k % n``, which moves
    (n−1)/n of all keys. The pinned affine family keeps h engine-exact,
    so a SQL mirror (cross join keys × shards, row_number argmax)
    hash-matches. Zero shuffle: per batch one [n, |shards|] hash matrix
    and a numpy argmax (first-max == lowest-shard tiebreak). Keys must
    be non-negative int64."""
    import numpy as np

    sh = np.asarray(sorted(set(shards)), np.int64)
    if len(sh) == 0:
        raise ValueError("shards must be non-empty")
    P = np.int64((1 << 31) - 1)

    def assign(b: pa.Table) -> pa.Table:
        k = b.column(key_column).to_numpy(zero_copy_only=False).astype(np.int64)
        if len(k) and k.min() < 0:
            raise ValueError("rendezvous keys must be non-negative integers")
        h = (1103515245 * ((k[:, None] * (sh[None, :] + 2)) % P) + 12345) % P
        return b.append_column(out_column, pa.array(sh[np.argmax(h, axis=1)]))

    return ds.map_batches(assign, batch_format="pyarrow")


def watermark_late_filter(
    ds: "ray.data.Dataset",
    key_column: str,
    ts_column: str,
    arrival_columns: list[str],
    delay: int,
) -> "ray.data.Dataset":
    """Streaming watermark / allowed-lateness semantics over a replayed
    log: rows arrive per key in ``arrival_columns`` order (must end in a
    unique tiebreak), the watermark is the running INCLUSIVE max of the
    integer event-time column, and a row is dropped as late when

        ts < watermark − delay

    — the Beam/Flink allowed-lateness rule, applied deterministically to
    a bounded replay (a row that advances the watermark always survives:
    the comparison is against the max including itself). Output =
    surviving rows, original columns. One bucketed key shuffle + one
    segmented cummax per bucket (:func:`_grouped_window` shape); the
    dropped-row count is ``ds.count() − out.count()``."""
    import numpy as np
    import pandas as pd

    def kernel(g: pa.Table, new_key: np.ndarray) -> pa.Table:
        ts = g.column(ts_column).to_numpy(zero_copy_only=False).astype(np.int64)
        grp = np.cumsum(new_key) - 1
        wm = pd.Series(ts).groupby(grp).cummax().to_numpy()
        return g.filter(pa.array(ts >= wm - delay))

    return _grouped_window(ds, key_column, arrival_columns, kernel)


def grouped_lag(
    ds: "ray.data.Dataset",
    key_column: str,
    order_columns: list[str],
    value_column: str,
    out_column: str = "lag_value",
) -> "ray.data.Dataset":
    """SQL ``LAG(value) OVER (PARTITION BY key ORDER BY ...)``: each row
    gets the previous row's value within its key (NULL at key heads).
    One bucketed shuffle + a vectorized shift per bucket."""
    import numpy as np

    def kernel(g: pa.Table, new_key: np.ndarray) -> pa.Table:
        col = g.column(value_column)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        n = len(g)
        idx = np.arange(n) - 1
        take = pa.array(
            np.where(new_key, -1, idx), pa.int64()
        )  # -1 index → null via take on masked positions
        shifted = col.take(pc.if_else(pc.less(take, 0), pa.scalar(None, pa.int64()), take))
        return g.append_column(out_column, shifted)

    return _grouped_window(ds, key_column, order_columns, kernel)


def grouped_lead(
    ds: "ray.data.Dataset",
    key_column: str,
    order_columns: list[str],
    value_column: str,
    out_column: str = "lead_value",
) -> "ray.data.Dataset":
    """SQL ``LEAD(value) OVER (PARTITION BY key ORDER BY ...)``: each row
    gets the next row's value within its key (NULL at key tails) —
    :func:`grouped_lag`'s mirror, same single bucketed shuffle."""
    import numpy as np

    def kernel(g: pa.Table, new_key: np.ndarray) -> pa.Table:
        col = g.column(value_column)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        n = len(g)
        tail = np.empty(n, bool)
        tail[:-1] = new_key[1:]
        tail[-1] = True
        take = pa.array(np.where(tail, -1, np.arange(n) + 1), pa.int64())
        shifted = col.take(
            pc.if_else(pc.less(take, 0), pa.scalar(None, pa.int64()), take)
        )
        return g.append_column(out_column, shifted)

    return _grouped_window(ds, key_column, order_columns, kernel)


def grouped_running_peak(
    ds: "ray.data.Dataset",
    key_column: str,
    order_columns: list[str],
    value_column: str,
    peak_column: str = "peak",
    drawdown_column: str = "drawdown",
) -> "ray.data.Dataset":
    """Per-key running maximum and drawdown (SQL ``MAX(v) OVER
    (PARTITION BY key ORDER BY … ROWS UNBOUNDED PRECEDING)`` plus
    ``peak − v``) — the high-water-mark analytic (drawdown curves,
    peak-memory audits, record-to-date tracking) over an INTEGER value
    column, so both outputs are exact int64 and a window-fn oracle
    hash-matches. One bucketed shuffle + one segmented cummax per
    bucket (:func:`_grouped_window` shape)."""
    import numpy as np
    import pandas as pd

    def kernel(g: pa.Table, new_key: np.ndarray) -> pa.Table:
        v = g.column(value_column).to_numpy(zero_copy_only=False).astype(np.int64)
        grp = np.cumsum(new_key) - 1
        peak = pd.Series(v).groupby(grp).cummax().to_numpy()
        g = g.append_column(peak_column, pa.array(peak.astype(np.int64)))
        return g.append_column(drawdown_column, pa.array(peak - v))

    return _grouped_window(ds, key_column, order_columns, kernel)


def grouped_ntile(
    ds: "ray.data.Dataset",
    key_column: str,
    order_columns: list[str],
    tiles: int,
    out_column: str = "tile",
) -> "ray.data.Dataset":
    """SQL ``NTILE(tiles) OVER (PARTITION BY key ORDER BY ...)``: rows of
    each key split into ``tiles`` buckets, the first ``count % tiles``
    buckets one row larger (T-SQL/DuckDB semantics). Same single bucketed
    shuffle as the other window ops; the tile assignment is pure numpy
    segment arithmetic."""
    import numpy as np

    def kernel(g: pa.Table, new_key: np.ndarray) -> pa.Table:
        n = len(g)
        heads = np.flatnonzero(new_key)
        sizes = np.diff(np.append(heads, n))
        c = np.repeat(sizes, sizes)  # key size, per row
        p = np.arange(n) - np.repeat(heads, sizes)  # 0-based pos in key
        small = c // tiles
        nbig = c % tiles
        cut = nbig * (small + 1)
        tile = np.where(
            p < cut,
            p // (small + 1),
            nbig + (p - cut) // np.maximum(small, 1),
        )
        return g.append_column(out_column, pa.array(tile + 1, pa.int64()))

    return _grouped_window(ds, key_column, order_columns, kernel)


def grouped_rank_stats(
    ds: "ray.data.Dataset",
    key_column: str,
    rank_column: str,
    tiebreak_columns: list[str],
    pct_column: str = "pct_rank",
    cume_column: str = "cume_dist",
) -> "ray.data.Dataset":
    """SQL ``PERCENT_RANK()`` and ``CUME_DIST()`` over ``(PARTITION BY key
    ORDER BY rank_column)`` in one pass: rank ties share the tie run's
    head rank (percent_rank) and its tail position (cume_dist), computed
    with numpy segment arithmetic — same single bucketed shuffle as the
    other window ops. ``tiebreak_columns`` only make the within-run sort
    deterministic; they do not affect the (tie-aware) statistics.
    Nulls in ``rank_column`` are not supported."""
    import numpy as np

    def kernel(g: pa.Table, new_key: np.ndarray) -> pa.Table:
        n = len(g)
        v = g.column(rank_column).to_numpy(zero_copy_only=False)
        kheads = np.flatnonzero(new_key)
        sizes = np.diff(np.append(kheads, n))
        c = np.repeat(sizes, sizes).astype(np.float64)  # key size per row
        khead_of = np.repeat(kheads, sizes)
        new_run = new_key.copy()
        new_run[1:] |= v[1:] != v[:-1]
        rheads = np.flatnonzero(new_run)
        rlens = np.diff(np.append(rheads, n))
        run_head = np.repeat(rheads, rlens)
        run_tail = np.repeat(rheads + rlens - 1, rlens)
        rank = (run_head - khead_of + 1).astype(np.float64)
        pct = np.where(c > 1, (rank - 1.0) / (c - 1.0), 0.0)
        cume = (run_tail - khead_of + 1).astype(np.float64) / c
        return g.append_column(pct_column, pa.array(pct, pa.float64())).append_column(
            cume_column, pa.array(cume, pa.float64())
        )

    return _grouped_window(ds, key_column, [rank_column] + tiebreak_columns, kernel)


def rollup_aggregate(
    ds: "ray.data.Dataset",
    group_columns: list[str],
    value_column: str,
    all_label: str = "(all)",
    cube: bool = False,
) -> "ray.data.Dataset":
    """``GROUP BY ROLLUP(a, b, …)`` (or ``CUBE`` with ``cube=True``):
    count + integer sum at every prefix level (rollup) or every key
    subset (cube), subtotal rows carrying ``all_label`` in the rolled-up
    key slots (instead of SQL's NULL, so results sort and hash cleanly).

    Shape: per-batch partial aggregation at the FINEST level shrinks the
    shuffle to group-cardinality partials, one small groupby, then every
    coarser level derives exactly from the finest aggregate driver-side
    (counts and integer sums compose) — the raw data is never re-read or
    re-shuffled per level."""
    import itertools

    import numpy as np
    import pandas as pd

    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        df = b.select(group_columns + [value_column]).to_pandas()
        df[value_column] = df[value_column].astype(np.int64)
        g = (
            df.groupby(group_columns, dropna=False, sort=False)
            .agg(cnt=(value_column, "size"), val=(value_column, "sum"))
            .reset_index()
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    finest = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(group_columns)
        .aggregate(Sum("cnt", alias_name="cnt"), Sum("val", alias_name="val"))
        .to_pandas()  # bounded: finest-level group cardinality
    )
    if cube:
        key_sets = [
            list(c)
            for r in range(len(group_columns) - 1, -1, -1)
            for c in itertools.combinations(group_columns, r)
        ]
    else:
        key_sets = [group_columns[:d] for d in range(len(group_columns) - 1, -1, -1)]
    levels = [finest]
    for keys in key_sets:
        if keys:
            lvl = finest.groupby(keys, sort=False, as_index=False)[["cnt", "val"]].sum()
        else:
            lvl = finest[["cnt", "val"]].sum().to_frame().T
        for c in group_columns:
            if c not in keys:
                lvl[c] = all_label
        levels.append(lvl[group_columns + ["cnt", "val"]])
    out = pd.concat(levels, ignore_index=True)
    out["cnt"] = out["cnt"].astype(np.int64)
    out["val"] = out["val"].astype(np.int64)
    return ray.data.from_pandas(out)


def debounce_rows(
    ds: "ray.data.Dataset",
    key_column: str,
    ts_column: str,
    min_gap_us: int,
    tiebreak_columns: list[str] | None = None,
) -> "ray.data.Dataset":
    """Debounce: drop every row whose PREDECESSOR in (key, ts) order is
    closer than ``min_gap_us`` microseconds (LAG-based — the gap is to the
    previous raw row, not the previous survivor, which keeps the op
    SQL-expressible and shuffle-parallel). Key heads always survive.
    One bucketed shuffle on the shared window shape."""
    import numpy as np

    def kernel(g: pa.Table, new_key: np.ndarray) -> pa.Table:
        ts = g.column(ts_column)
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        t = ts.cast(pa.int64()).to_numpy(zero_copy_only=False)
        gap = np.empty(len(t), np.int64)
        gap[0] = min_gap_us
        gap[1:] = t[1:] - t[:-1]
        keep = new_key | (gap >= min_gap_us)
        return g.filter(pa.array(keep))

    return _grouped_window(
        ds, key_column, [ts_column] + (tiebreak_columns or []), kernel
    )


def grouped_cumsum(
    ds: "ray.data.Dataset",
    key_column: str,
    order_columns: list[str],
    value_column: str,
    out_column: str = "running_total",
) -> "ray.data.Dataset":
    """SQL ``SUM(value) OVER (PARTITION BY key ORDER BY ... ROWS
    UNBOUNDED PRECEDING)``: per-key running total, computed as one
    global cumsum minus each key's base — no per-key python loop."""
    import numpy as np

    def kernel(g: pa.Table, new_key: np.ndarray) -> pa.Table:
        v = g.column(value_column).to_numpy(zero_copy_only=False).astype(np.int64)
        cs = v.cumsum()
        heads = np.where(new_key)[0]
        base = np.repeat(
            cs[heads] - v[heads], np.diff(np.append(heads, len(v)))
        )
        return g.append_column(out_column, pa.array(cs - base, pa.int64()))

    return _grouped_window(ds, key_column, order_columns, kernel)


def unpivot(
    ds: "ray.data.Dataset",
    id_columns: list[str],
    value_columns: list[str],
    name_column: str = "name",
    value_column: str = "value",
) -> "ray.data.Dataset":
    """UNPIVOT / melt: wide → long, one output row per (row,
    value_column). Row-local (a per-batch concat of column slices — no
    shuffle); value columns are cast to a common string type the way SQL
    UNPIVOT unifies branch types."""

    def melt(b: pa.Table) -> pa.Table:
        parts = []
        for vc in value_columns:
            data = {c: b.column(c) for c in id_columns}
            data[name_column] = pa.array([vc] * len(b), pa.string())
            data[value_column] = pc.cast(b.column(vc), pa.string())
            parts.append(pa.table(data))
        return pa.concat_tables(parts)

    return ds.map_batches(melt, batch_format="pyarrow")


def value_histogram(
    ds: "ray.data.Dataset",
    column: str,
    bins: int = 64,
) -> "ray.data.Dataset":
    """Fixed-bin histogram of a numeric column over its [min, max] range —
    the distribution-profiling pass. Two streaming passes (min/max, then
    per-batch bincount partials summed through one tiny groupby); bin
    index = ``min(floor((v - lo) * (bins / (hi - lo))), bins - 1)`` in
    double precision — reproducible in SQL with the same expression tree,
    so the result is oracle-comparable bit-for-bit. Nulls ignored;
    single-valued/empty columns land in bin 0.

    Returns (bin, bin_lo, bin_hi, n) for non-empty bins.
    """
    import numpy as np

    from ray.data.aggregate import Sum

    def mm_partial(b: pa.Table) -> pa.Table:
        col = pc.drop_null(b.column(column))
        if len(col) == 0:
            return pa.table({"mn": pa.array([], pa.float64()), "mx": pa.array([], pa.float64())})
        mm = pc.min_max(col)
        return pa.table(
            {
                "mn": pa.array([float(mm["min"].as_py())]),
                "mx": pa.array([float(mm["max"].as_py())]),
            }
        )

    p = ds.map_batches(mm_partial, batch_format="pyarrow").to_pandas()
    if len(p) == 0:
        lo, hi = 0.0, 0.0
    else:
        lo, hi = float(p["mn"].min()), float(p["mx"].max())
    width_scale = (bins / (hi - lo)) if hi > lo else 0.0

    def hist_partial(b: pa.Table) -> pa.Table:
        v = pc.drop_null(b.column(column)).to_numpy(zero_copy_only=False).astype(np.float64)
        if width_scale == 0.0:
            idx = np.zeros(len(v), np.int64)
        else:
            idx = np.minimum(
                np.floor((v - lo) * width_scale), bins - 1
            ).astype(np.int64)
        cnt = np.bincount(idx, minlength=bins)
        nz = np.nonzero(cnt)[0]
        return pa.table({"bin": pa.array(nz), "n": pa.array(cnt[nz], pa.int64())})

    agg = (
        ds.map_batches(hist_partial, batch_format="pyarrow")
        .groupby("bin")
        .aggregate(Sum("n", alias_name="n"))
    )

    def edges(b: pa.Table) -> pa.Table:
        import numpy as np

        bn = b.column("bin").to_numpy(zero_copy_only=False).astype(np.float64)
        w = (hi - lo) / bins if hi > lo else 0.0
        return pa.table(
            {
                "bin": b.column("bin"),
                "bin_lo": pa.array(lo + bn * w),
                "bin_hi": pa.array(lo + (bn + 1.0) * w),
                "n": b.column("n"),
            }
        )

    return agg.map_batches(edges, batch_format="pyarrow")


def grouped_dense_rank(
    ds: "ray.data.Dataset",
    key_column: str,
    order_column: str,
    out_column: str = "dense_rank",
    descending: bool = False,
) -> "ray.data.Dataset":
    """SQL ``dense_rank() OVER (PARTITION BY key ORDER BY v [DESC])``:
    ties share a rank, ranks have no gaps. Same one-shuffle bucketed
    window shape as LAG/cumsum; per bucket the rank is a cumulative
    count of value changes within each key run — no per-key loop."""
    import numpy as np

    def kernel(g: pa.Table, new_key: np.ndarray) -> pa.Table:
        v = g.column(order_column).to_numpy(zero_copy_only=False)
        changed = np.empty(len(v), bool)
        changed[0] = True
        changed[1:] = (v[1:] != v[:-1]) | new_key[1:]
        steps = changed.astype(np.int64).cumsum()
        heads = np.where(new_key)[0]
        base = np.repeat(
            steps[heads] - 1, np.diff(np.append(heads, len(v)))
        )
        return g.append_column(out_column, pa.array(steps - base, pa.int64()))

    order = [(order_column, "descending" if descending else "ascending")]

    # reuse the shared bucketed-window shape but with a custom sort
    # direction on the order column
    from dedupe_ray.blocking import N_BUCKETS

    def bucketize(b: pa.Table) -> pa.Table:
        return b.append_column(
            "__wbkt", _bucket_hash_col(b.column(key_column), N_BUCKETS)
        )

    sort_keys = [(key_column, "ascending")] + order

    def per_bucket(group: pa.Table) -> pa.Table:
        if len(group) == 0:
            return group.drop_columns(["__wbkt"])
        g = group.take(pc.sort_indices(group, sort_keys=sort_keys))
        keys = np.asarray(g.column(key_column).to_pylist(), object)
        new_key = np.empty(len(g), bool)
        new_key[0] = True
        new_key[1:] = keys[1:] != keys[:-1]
        return kernel(g, new_key).drop_columns(["__wbkt"])

    return (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("__wbkt")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


def grouped_corr(
    ds: "ray.data.Dataset",
    group_columns: list[str],
    x_column: str,
    y_column: str,
    out_column: str = "corr",
) -> pa.Table:
    """Pearson correlation per group over INTEGER-valued columns, exactly.

    One combiner shuffle: each batch emits per-group int64 moment partials
    (n, Σx, Σy, Σx², Σy², Σxy) — 6 numbers per (group, block) — merged by a
    tiny groupby-Sum; the final ``corr = (nΣxy − ΣxΣy) /
    sqrt((nΣx² − (Σx)²) · (nΣy² − (Σy)²))`` is evaluated driver-side from
    the EXACT integer moments with arbitrary-precision Python ints, so the
    result is order/parallelism-invariant and a SQL oracle mirroring the
    same BIGINT-moments expression is hash-exact (a streaming CORR() or a
    naive double Σ would differ in the last ulp per summation order).

    Caller contract: x/y must already be integers (fixed-point-quantize
    floats upstream — the same ``round(x·10^k)`` chain on both engines);
    per-batch partial magnitudes are checked against int64 and raise on
    overflow risk instead of wrapping. Returns a driver-side pa.Table
    (one row per group; ``corr`` NULL when either variance is zero).
    """
    import math

    agg = _grouped_int_moments(ds, group_columns, x_column, y_column)
    out: list = []
    for _, r in agg.iterrows():
        n, sx, sy = int(r["n"]), int(r["sx"]), int(r["sy"])
        sxx, syy, sxy = int(r["sxx"]), int(r["syy"]), int(r["sxy"])
        vx, vy = n * sxx - sx * sx, n * syy - sy * sy
        if vx == 0 or vy == 0:
            out.append(None)
        else:
            # float(int) conversions + one multiply/sqrt/divide — the same
            # IEEE chain as the SQL mirror's CAST(... AS DOUBLE) expression
            out.append(float(n * sxy - sx * sy) / math.sqrt(float(vx) * float(vy)))
    cols = {g: pa.array(agg[g]) for g in group_columns}
    cols[out_column] = pa.array(out, pa.float64())
    return pa.table(cols)


def _grouped_int_moments(
    ds: "ray.data.Dataset",
    group_columns: list[str],
    x_column: str,
    y_column: str,
):
    """Shared combiner for the exact-integer bivariate statistics family
    (corr / linregress): per-batch int64 moment partials
    (n, Σx, Σy, Σx², Σy², Σxy) per group, merged by a tiny groupby-Sum.
    Returns the bounded driver-side pandas frame of exact moments."""
    import numpy as np
    import pandas as pd

    from ray.data.aggregate import Sum

    def partials(b: pa.Table) -> pa.Table:
        x = b.column(x_column).to_numpy(zero_copy_only=False).astype(np.int64)
        y = b.column(y_column).to_numpy(zero_copy_only=False).astype(np.int64)
        mx = int(np.abs(x).max(initial=0))
        my = int(np.abs(y).max(initial=0))
        if max(mx * mx, my * my, mx * my) * max(len(x), 1) >= (1 << 62):
            raise OverflowError(
                f"integer moment partials may exceed int64 "
                f"(max|x|={mx}, max|y|={my}, n={len(x)}); quantize to a "
                "coarser fixed point"
            )
        df = pd.DataFrame({g: b.column(g).to_pandas() for g in group_columns})
        df["__x"], df["__y"] = x, y
        df["__xx"], df["__yy"], df["__xy"] = x * x, y * y, x * y
        g = df.groupby(group_columns, as_index=False).agg(
            n=("__x", "size"), sx=("__x", "sum"), sy=("__y", "sum"),
            sxx=("__xx", "sum"), syy=("__yy", "sum"), sxy=("__xy", "sum"),
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    return (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby(group_columns)
        .aggregate(
            Sum("n", alias_name="n"), Sum("sx", alias_name="sx"),
            Sum("sy", alias_name="sy"), Sum("sxx", alias_name="sxx"),
            Sum("syy", alias_name="syy"), Sum("sxy", alias_name="sxy"),
        )
        .to_pandas()  # bounded: one row per group
    )


def grouped_linregress(
    ds: "ray.data.Dataset",
    group_columns: list[str],
    x_column: str,
    y_column: str,
) -> pa.Table:
    """Ordinary-least-squares ``y = slope·x + intercept`` per group over
    INTEGER-valued columns — same exact-int64-moments engine as
    :func:`grouped_corr` (one combiner shuffle), finishing with the
    closed-form OLS expressions evaluated from exact BIGINT moments:
    ``slope = (nΣxy − ΣxΣy) / (nΣx² − (Σx)²)`` and
    ``intercept = (Σy − slope·Σx) / n`` — the identical IEEE-double chain
    a SQL mirror of the moment sums evaluates (``regr_slope`` internals
    are engine-private). slope/intercept are NULL for zero x-variance."""
    agg = _grouped_int_moments(ds, group_columns, x_column, y_column)
    slopes: list = []
    intercepts: list = []
    for _, r in agg.iterrows():
        n, sx, sy = int(r["n"]), int(r["sx"]), int(r["sy"])
        sxx, sxy = int(r["sxx"]), int(r["sxy"])
        vx = n * sxx - sx * sx
        if vx == 0:
            slopes.append(None)
            intercepts.append(None)
        else:
            slope = float(n * sxy - sx * sy) / float(vx)
            slopes.append(slope)
            intercepts.append((float(sy) - slope * float(sx)) / float(n))
    cols = {g: pa.array(agg[g]) for g in group_columns}
    cols["slope"] = pa.array(slopes, pa.float64())
    cols["intercept"] = pa.array(intercepts, pa.float64())
    return pa.table(cols)


def filter_outliers_zscore(
    ds: "ray.data.Dataset",
    group_columns: list[str],
    int_column: str,
    k: float = 3.0,
) -> "ray.data.Dataset":
    """Per-group z-score outlier filter (the data-quality gate before a
    model ever sees a row): keep rows with ``|x − μ_g| > k·σ_g`` where
    μ/σ are the group's population mean/stddev — computed in TWO streaming
    passes: exact int64 moment partials (one combiner shuffle, same engine
    as :func:`grouped_corr`) → a tiny per-group (μ, σ) table broadcast
    into a vectorized filter pass. ``int_column`` must be integer
    (fixed-point-quantize floats upstream); μ/σ/thresholds are evaluated
    with the identical IEEE chain a SQL mirror of the BIGINT moments uses
    (int64→double conversions round identically on both engines even past
    2⁵³), so the kept-row SET is engine-exact."""
    import numpy as np

    agg = _grouped_int_moments(ds, group_columns, int_column, int_column)
    stats: dict[tuple, tuple[float, float]] = {}
    for _, r in agg.iterrows():
        n, sx, sxx = int(r["n"]), int(r["sx"]), int(r["sxx"])
        mu = float(sx) / float(n)
        var = (float(n) * float(sxx) - float(sx) * float(sx)) / (
            float(n) * float(n)
        )
        key = tuple(r[g] for g in group_columns)
        stats[key] = (mu, np.sqrt(var))

    kf = float(k)

    def flag(b: pa.Table) -> pa.Table:
        x = b.column(int_column).to_numpy(zero_copy_only=False).astype(np.float64)
        keys = list(zip(*(b.column(g).to_pylist() for g in group_columns)))
        mu = np.fromiter((stats[kk][0] for kk in keys), np.float64, len(keys))
        sd = np.fromiter((stats[kk][1] for kk in keys), np.float64, len(keys))
        return b.filter(pa.array(np.abs(x - mu) > kf * sd))

    return ds.map_batches(flag, batch_format="pyarrow")


def assign_row_numbers(
    ds: "ray.data.Dataset",
    key_column: str,
    id_column: str,
    out_column: str = "row_num",
    n_buckets: int = 256,
    sample_cap: int = 20_000,
) -> "ray.data.Dataset":
    """Global 1-based row numbers in (key, id) order — SQL ``row_number()
    OVER (ORDER BY key, id)`` — WITHOUT a global sort: the distributed
    zip-with-index Ray Data lacks. Range partition on deterministically
    hash-sampled split points (equal keys always co-locate; split quality
    affects balance, never the output), then two streaming passes: a
    per-bucket COUNT combiner whose cumulative offsets (≤ n_buckets
    integers) broadcast in a closure, and a per-bucket local sort that
    adds ``offset + local position``. The id tiebreak makes the order —
    and therefore every assigned number — unique and engine-exact."""
    import numpy as np
    import pandas as pd

    from ray.data.aggregate import Sum

    rate = min(1.0, sample_cap / max(ds.count(), 1))
    mod = np.uint64(max(1, int(1 / max(rate, 1e-9))))

    def sample_keys(b: pa.Table) -> pa.Table:
        ids = b.column(id_column).to_numpy(zero_copy_only=False)
        h = pd.util.hash_array(
            np.asarray(ids, dtype=object if ids.dtype == object else ids.dtype)
        )
        keep = (h % mod) == 0
        return pa.table({"k": b.column(key_column).filter(pa.array(keep))})

    sampled = (
        ds.map_batches(sample_keys, batch_format="pyarrow").to_pandas()["k"].to_numpy()
    )
    if len(sampled) and n_buckets > 1:
        s = np.sort(sampled)
        qpos = (np.linspace(0, 1, n_buckets + 1)[1:-1] * (len(s) - 1)).astype(np.int64)
        splits_arr = np.asarray(sorted(set(s[qpos].tolist())))
    else:
        splits_arr = np.asarray([])

    def assign(b: pa.Table) -> pa.Table:
        keys = b.column(key_column).to_numpy(zero_copy_only=False)
        bkt = (
            np.searchsorted(splits_arr, keys, side="right").astype(np.int32)
            if len(splits_arr)
            else np.zeros(len(b), np.int32)
        )
        return b.append_column("__rnbkt", pa.array(bkt))

    def count_partial(b: pa.Table) -> pa.Table:
        bkt = b.column("__rnbkt").to_numpy(zero_copy_only=False)
        u, c = np.unique(bkt, return_counts=True)
        return pa.table(
            {"__rnbkt": pa.array(u), "c": pa.array(c.astype(np.int64))}
        )

    assigned = ds.map_batches(assign, batch_format="pyarrow")
    counts = (
        assigned.map_batches(count_partial, batch_format="pyarrow")
        .groupby("__rnbkt")
        .aggregate(Sum("c", alias_name="c"))
        .to_pandas()  # bounded: one row per bucket
        .sort_values("__rnbkt")
    )
    offsets: dict[int, int] = {}
    run = 0
    for _, r in counts.iterrows():
        offsets[int(r["__rnbkt"])] = run
        run += int(r["c"])

    def number(group: pa.Table) -> pa.Table:
        if len(group) == 0:
            return group.drop_columns(["__rnbkt"]).append_column(
                out_column, pa.array([], pa.int64())
            )
        g = group.take(
            pc.sort_indices(
                group,
                sort_keys=[(key_column, "ascending"), (id_column, "ascending")],
            )
        )
        off = offsets[int(g.column("__rnbkt")[0].as_py())]
        nums = off + 1 + np.arange(len(g), dtype=np.int64)
        return g.drop_columns(["__rnbkt"]).append_column(
            out_column, pa.array(nums)
        )

    return assigned.groupby("__rnbkt").map_groups(number, batch_format="pyarrow")


def replicate_rows(
    ds: "ray.data.Dataset",
    times_column: str,
    copy_column: str = "copy_idx",
    max_times: int = 1_000_000,
) -> "ray.data.Dataset":
    """Emit each row ``times_column`` times with ``copy_column`` = 0..n-1 —
    the static data-mixing primitive (per-bucket epoch counts / upsampling
    weights à la DoReMi mixtures). Pure per-batch gather (np.repeat index
    + Table.take), zero shuffle, streaming; a row's copies stay in its
    batch so the blowup is bounded per task, and ``max_times`` guards a
    poisoned multiplier from OOMing a worker. n ≤ 0 drops the row (that IS
    downsampling); nulls are an error."""

    import numpy as np

    def rep(t: pa.Table) -> pa.Table:
        col = t.column(times_column)
        if col.null_count:
            raise ValueError(f"{times_column} contains nulls")
        n = np.maximum(col.to_numpy(zero_copy_only=False).astype(np.int64), 0)
        if len(n) and int(n.max()) > max_times:
            raise ValueError(
                f"{times_column} exceeds max_times={max_times}: {int(n.max())}"
            )
        idx = np.repeat(np.arange(len(t), dtype=np.int64), n)
        out = t.take(pa.array(idx))
        ends = np.cumsum(n)
        copy_idx = np.arange(int(ends[-1]) if len(ends) else 0, dtype=np.int64) - np.repeat(
            ends - n, n
        )
        return out.append_column(copy_column, pa.array(copy_idx))

    return ds.map_batches(rep, batch_format="pyarrow")


def funnel_steps(
    ds: "ray.data.Dataset",
    steps: list[str],
    user_column: str = "user_id",
    ts_column: str = "ts",
    type_column: str = "event_type",
) -> "ray.data.Dataset":
    """Greedy-earliest funnel (the product-analytics sequential-pattern
    op): per user, t_1 = earliest ``steps[0]`` event; t_k = earliest
    ``steps[k]`` event STRICTLY after t_{k-1}. Returns one row per user
    who completed every step, with ``ts_<step>`` timestamp columns.

    Shape: ONE bucketed shuffle of (user, ts, type) rows — users hash into
    N_BUCKETS groups and each bucket resolves all its users with k
    vectorized pandas groupby-mins (k = len(steps), never one python call
    per user). Same-timestamp step events do NOT advance the funnel
    (strict >), matching the SQL mirror."""
    import numpy as np

    from dedupe_ray.blocking import N_BUCKETS

    if len(steps) < 2:
        raise ValueError("a funnel needs at least two steps")

    def bucketize(b: pa.Table) -> pa.Table:
        t = b.select([user_column, ts_column, type_column])
        return t.append_column(
            "ubucket", _bucket_hash_col(t.column(user_column), N_BUCKETS)
        )

    def per_bucket(group: pa.Table) -> pa.Table:
        ut = group.schema.field(user_column).type
        tt = group.schema.field(ts_column).type
        df = group.select([user_column, ts_column, type_column]).to_pandas()
        prev = None
        outs = []
        for s in steps:
            sub = df[df[type_column] == s]
            if prev is not None:
                sub = sub.assign(_lim=sub[user_column].map(prev))
                sub = sub[sub["_lim"].notna() & (sub[ts_column] > sub["_lim"])]
            g = sub.groupby(user_column)[ts_column].min()
            outs.append(g)
            prev = g
        done = sorted(outs[-1].index.tolist())
        cols = {user_column: pa.array(done, type=ut)}
        for s, o in zip(steps, outs):
            vals = o.loc[done].to_numpy() if done else np.array([], "datetime64[us]")
            cols[f"ts_{s}"] = pa.array(vals).cast(tt) if len(vals) else pa.array([], type=tt)
        return pa.table(cols)

    return (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("ubucket")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


def winsorize(
    ds: "ray.data.Dataset",
    column: str,
    lo_q: float = 0.01,
    hi_q: float = 0.99,
    out_column: str | None = None,
    **quantile_kwargs,
) -> "ray.data.Dataset":
    """Clip ``column`` to its global [lo_q, hi_q] discrete quantiles (the
    outlier-robust preprocessing standard). Both bounds come from the
    shuffle-free histogram-refinement quantile engine — ACTUAL data
    elements, so the clip is value-exact against a SQL
    ``quantile_disc`` mirror — then one streaming clip pass."""
    import numpy as np

    lo = global_quantile_disc(ds, column, q=lo_q, **quantile_kwargs)
    hi = global_quantile_disc(ds, column, q=hi_q, **quantile_kwargs)
    out = out_column or f"{column}_w"

    def clip(b: pa.Table) -> pa.Table:
        v = b.column(column).to_numpy(zero_copy_only=False)
        return b.append_column(out, pa.array(np.minimum(np.maximum(v, lo), hi)))

    return ds.map_batches(clip, batch_format="pyarrow")


def diff_snapshots(
    old_ds: "ray.data.Dataset",
    new_ds: "ray.data.Dataset",
    key_column: str,
    compare_columns: list[str],
    status_column: str = "status",
) -> "ray.data.Dataset":
    """Corpus-snapshot diff (the data-ops audit primitive): one row per
    key with status ∈ {added, removed, changed, unchanged}. Built on the
    bucketed full-outer join (unique keys both sides), with explicit
    presence markers so rows whose compare columns are all-NULL still
    classify correctly; the value compare is vectorized and null-aware
    (both-NULL counts as equal; float NaN is a VALUE and NaN≠NaN flags
    'changed' — document values, not IEEE identity, are what a diff
    audits). Nothing corpus-sized is collected; the join shuffles rows
    once by key hash."""
    import numpy as np

    from dedupe_ray.joins import bucketed_lookup_join

    new_cols = [f"__new_{c}" for c in compare_columns]

    def tag_old(t: pa.Table) -> pa.Table:
        return t.select([key_column, *compare_columns]).append_column(
            "__old_present", pa.array(np.ones(len(t), np.int8))
        )

    def tag_new(t: pa.Table) -> pa.Table:
        out = {key_column: t.column(key_column)}
        for c, nc in zip(compare_columns, new_cols):
            out[nc] = t.column(c)
        out["__new_present"] = pa.array(np.ones(len(t), np.int8))
        return pa.table(out)

    joined = bucketed_lookup_join(
        old_ds.map_batches(tag_old, batch_format="pyarrow"),
        new_ds.map_batches(tag_new, batch_format="pyarrow"),
        key_column,
        key_column,
        [*new_cols, "__new_present"],
        how="full",
    )

    def classify(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        added = df["__old_present"].isna().to_numpy()
        removed = df["__new_present"].isna().to_numpy()
        changed = np.zeros(len(df), bool)
        for c, nc in zip(compare_columns, new_cols):
            a, b = df[c], df[nc]
            changed |= ((a != b) & ~(a.isna() & b.isna())).to_numpy()
        status = np.where(
            added, "added", np.where(removed, "removed", np.where(changed, "changed", "unchanged"))
        )
        return pa.table(
            {
                key_column: pa.Array.from_pandas(df[key_column]).cast(
                    t.schema.field(key_column).type
                ),
                status_column: pa.array(status.tolist(), pa.string()),
            }
        )

    return joined.map_batches(classify, batch_format="pyarrow")


def cooccurrence_pairs(
    ds: "ray.data.Dataset",
    group_column: str,
    item_column: str,
) -> "ray.data.Dataset":
    """Pairwise co-occurrence counts (the a-priori/market-basket first
    step): (item_a, item_b, n_groups) with item_a < item_b, counting
    groups in which BOTH items occur. Per-batch distinct-(group,item)
    combiner shrinks the shuffle, groups hash into N_BUCKETS so each
    bucket dedups and emits its groups' pairs with numpy triu gathers
    batched BY GROUP SIZE (one gather per distinct size, never one python
    call per group), then a bounded groupby-count over the item-pair
    space. Groups with very many distinct items blow up quadratically by
    definition of the op — cap upstream (``cap_per_key``) for basket-like
    data."""
    import numpy as np

    from dedupe_ray.blocking import N_BUCKETS

    def distinct_partial(b: pa.Table) -> pa.Table:
        df = (
            b.select([group_column, item_column])
            .to_pandas()
            .drop_duplicates()
        )
        t = pa.Table.from_pandas(df, preserve_index=False)
        return t.append_column(
            "__gbkt", _bucket_hash_col(t.column(group_column), N_BUCKETS)
        )

    def emit_pairs(group: pa.Table) -> pa.Table:
        df = (
            group.select([group_column, item_column])
            .to_pandas()
            .drop_duplicates()
            .sort_values([group_column, item_column], kind="mergesort")
        )
        items = df[item_column].to_numpy(object)
        gvals = df[group_column].to_numpy(object)
        new_g = np.empty(len(df), bool)
        if len(df) == 0:
            return pa.table(
                {
                    "item_a": pa.array([], pa.string()),
                    "item_b": pa.array([], pa.string()),
                }
            )
        new_g[0] = True
        new_g[1:] = gvals[1:] != gvals[:-1]
        starts = np.flatnonzero(new_g)
        ks = np.diff(np.append(starts, len(df)))
        out_a, out_b = [], []
        for k in np.unique(ks):
            if k < 2:
                continue
            iu, ju = np.triu_indices(int(k), 1)
            s = starts[ks == k]  # all groups of this size, one gather
            out_a.append((s[:, None] + iu[None, :]).ravel())
            out_b.append((s[:, None] + ju[None, :]).ravel())
        if not out_a:
            return pa.table(
                {
                    "item_a": pa.array([], pa.string()),
                    "item_b": pa.array([], pa.string()),
                }
            )
        ia = np.concatenate(out_a)
        ib = np.concatenate(out_b)
        return pa.table(
            {
                "item_a": pa.array(items[ia], pa.string()),
                "item_b": pa.array(items[ib], pa.string()),
            }
        )

    pairs = (
        ds.map_batches(distinct_partial, batch_format="pyarrow")
        .groupby("__gbkt")
        .map_groups(emit_pairs, batch_format="pyarrow")
    )
    return pairs.groupby(["item_a", "item_b"]).count().map_batches(
        lambda t: pa.table(
            {
                "item_a": t.column("item_a"),
                "item_b": t.column("item_b"),
                "n_groups": pc.cast(t.column("count()"), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def resample_ffill(
    ds: "ray.data.Dataset",
    user_column: str = "user_id",
    ts_column: str = "ts",
    value_column: str = "value",
    every_seconds: int = 3600,
) -> "ray.data.Dataset":
    """Time-series resampling with forward fill (gap filling): for each
    key, emit one row per ``every_seconds`` grid point (epoch-aligned,
    spanning [first, last] observation) carrying the latest observation at
    or before the grid point. Exact-duplicate timestamps within a key
    collapse to their MAX value first (a deterministic tie rule both the
    engine and the SQL mirror apply).

    Shape: ONE bucketed shuffle (the standard per-key window layout); the
    whole bucket resolves with a single composite-key searchsorted — no
    python loop over keys. Composite key = key-ordinal << 48 | (ts − base)
    µs, so a bucket's time span must stay under 2^48 µs ≈ 8.9 years
    (asserted); beyond that, pre-split by epoch range."""
    import numpy as np

    from dedupe_ray.blocking import N_BUCKETS

    step = int(every_seconds) * 1_000_000

    def bucketize(b: pa.Table) -> pa.Table:
        t = b.select([user_column, ts_column, value_column])
        return t.append_column(
            "__rbkt", _bucket_hash_col(t.column(user_column), N_BUCKETS)
        )

    def per_bucket(group: pa.Table) -> pa.Table:
        ut = group.schema.field(user_column).type
        tt = group.schema.field(ts_column).type
        vt = group.schema.field(value_column).type
        df = group.select([user_column, ts_column, value_column]).to_pandas()
        if len(df) == 0:
            return pa.table(
                {
                    user_column: pa.array([], ut),
                    ts_column: pa.array([], tt),
                    value_column: pa.array([], vt),
                }
            )
        # collapse exact-ts duplicates to MAX value, then sort
        df = (
            df.groupby([user_column, ts_column], as_index=False)[value_column]
            .max()
            .sort_values([user_column, ts_column], kind="mergesort")
        )
        ts = df[ts_column].to_numpy().astype("datetime64[us]").astype(np.int64)
        vals = df[value_column].to_numpy()
        users = df[user_column].to_numpy(object)
        new_u = np.empty(len(df), bool)
        new_u[0] = True
        new_u[1:] = users[1:] != users[:-1]
        starts = np.flatnonzero(new_u)
        ends = np.append(starts[1:], len(df)) - 1
        mn, mx = ts[starts], ts[ends]
        g0 = -(-mn // step) * step          # ceil to grid
        g1 = (mx // step) * step            # floor to grid
        n = np.maximum((g1 - g0) // step + 1, 0)
        total = int(n.sum())
        if total == 0:
            return pa.table(
                {
                    user_column: pa.array([], ut),
                    ts_column: pa.array([], tt),
                    value_column: pa.array([], vt),
                }
            )
        base = int(ts.min())
        span = int(ts.max()) - base
        assert span < (1 << 48), "bucket time span exceeds the composite-key range"
        ordinals = np.cumsum(new_u) - 1  # per-row key ordinal
        uid_of_seg = np.arange(len(starts))
        excl = np.zeros(len(n) + 1, np.int64)
        np.cumsum(n, out=excl[1:])
        local = np.arange(total, dtype=np.int64) - np.repeat(excl[:-1], n)
        grid_ts = np.repeat(g0, n) + local * step
        grid_ord = np.repeat(uid_of_seg, n)
        key_ev = (ordinals.astype(np.int64) << 48) | (ts - base)
        key_gr = (grid_ord << 48) | (grid_ts - base)
        idx = np.searchsorted(key_ev, key_gr, side="right") - 1
        out_users = users[starts][grid_ord]
        return pa.table(
            {
                user_column: pa.array(out_users.tolist(), ut),
                ts_column: pa.array(grid_ts.astype("datetime64[us]")).cast(tt),
                value_column: pa.array(vals[idx], vt),
            }
        )

    return (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("__rbkt")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


def weighted_sample(
    ds: "ray.data.Dataset",
    key_column: str,
    weight_column: str,
    k: int,
) -> "ray.data.Dataset":
    """Weighted sampling WITHOUT replacement, k items (Efraimidis &
    Spirakis 2006 A-Res), with DETERMINISTIC pseudo-randomness: the
    uniform draw comes from the same pinned universal hash family as the
    Count-Min sketch (u = (h+1)/2^31 ∈ (0,1], exact integer → float64),
    so the sample is reproducible, parallelism-invariant, and
    engine-exact against a SQL mirror of priority = ln(u)/w. Per-batch
    top-k pre-trim keeps the final sort tiny (≤ k rows per block leave
    the workers); weights must be > 0 (rows with w ≤ 0 or NULL are
    excluded, standard semantics)."""
    import numpy as np

    from dedupe_ray.ops.sketch import _CMS_A, _CMS_B, _CMS_P

    a, b = _CMS_A[0], _CMS_B[0]

    def prio(batch: pa.Table) -> pa.Table:
        key = batch.column(key_column).to_numpy(zero_copy_only=False)
        w = batch.column(weight_column).to_numpy(zero_copy_only=False)
        ok = np.isfinite(w) & (w > 0)
        t = batch.filter(pa.array(ok))
        key, w = key[ok], w[ok]
        h = (a * (key.astype(np.int64) % _CMS_P) + b) % _CMS_P
        u = (h + 1.0) / 2147483648.0
        pri = np.log(u) / w
        t = t.append_column("priority", pa.array(pri))
        if len(t) > k:  # per-batch pre-trim: only each block's top-k travel
            order = np.lexsort((key, -pri))[:k]
            t = t.take(pa.array(np.sort(order)))
        return t

    return (
        ds.map_batches(prio, batch_format="pyarrow")
        .sort(["priority", key_column], descending=[True, False])
        .limit(k)
    )


def normalize_minmax(
    ds: "ray.data.Dataset",
    group_column: str,
    value_column: str,
    out_column: str | None = None,
) -> "ray.data.Dataset":
    """Per-group min-max feature scaling: (x − min) / (max − min), NULL
    when the group is constant (max == min). Group extrema reduce with
    one combiner groupby; the scaling pass streams with a bucketed
    unique-key join — exact data values in, one IEEE expression out, so
    the result hash-compares against a window-function SQL mirror."""
    import numpy as np
    from ray.data.aggregate import Max, Min

    from dedupe_ray.joins import bucketed_lookup_join

    out = out_column or f"{value_column}_mm"
    extrema = (
        ds.groupby(group_column)
        .aggregate(Min(value_column, alias_name="__mn"), Max(value_column, alias_name="__mx"))
    )
    joined = bucketed_lookup_join(ds, extrema, group_column, group_column, ["__mn", "__mx"])

    def scale(t: pa.Table) -> pa.Table:
        x = t.column(value_column).to_numpy(zero_copy_only=False).astype(np.float64)
        mn = t.column("__mn").to_numpy(zero_copy_only=False).astype(np.float64)
        mx = t.column("__mx").to_numpy(zero_copy_only=False).astype(np.float64)
        with np.errstate(invalid="ignore", divide="ignore"):
            v = (x - mn) / (mx - mn)
        v = np.where(mx == mn, np.nan, v)
        return t.drop_columns(["__mn", "__mx"]).append_column(
            out, pa.array(v).cast(pa.float64())
        )

    res = joined.map_batches(scale, batch_format="pyarrow")

    def null_constant(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        col = t.column(out)
        return t.set_column(
            t.schema.get_field_index(out), out, pc.if_else(pc.is_nan(col), pa.scalar(None, pa.float64()), col)
        )

    return res.map_batches(null_constant, batch_format="pyarrow")


def resample_interp(
    ds: "ray.data.Dataset",
    user_column: str = "user_id",
    ts_column: str = "ts",
    value_column: str = "value",
    every_seconds: int = 3600,
) -> "ray.data.Dataset":
    """Time-series resampling with LINEAR INTERPOLATION between the
    bracketing observations (the lerp sibling of :func:`resample_ffill`;
    grid points exactly on an observation take its value). Same bucketed
    composite-key layout; the interpolation weight is one IEEE expression
    — v0 + (v1 − v0) · ((t − t0) / (t1 − t0)) with µs int64 deltas cast to
    float64 — so the output hash-compares against a SQL mirror. Duplicate
    timestamps collapse to MAX(value) first."""
    import numpy as np

    from dedupe_ray.blocking import N_BUCKETS

    step = int(every_seconds) * 1_000_000

    def bucketize(b: pa.Table) -> pa.Table:
        t = b.select([user_column, ts_column, value_column])
        return t.append_column(
            "__ibkt", _bucket_hash_col(t.column(user_column), N_BUCKETS)
        )

    def per_bucket(group: pa.Table) -> pa.Table:
        ut = group.schema.field(user_column).type
        tt = group.schema.field(ts_column).type
        df = group.select([user_column, ts_column, value_column]).to_pandas()
        empty = pa.table(
            {
                user_column: pa.array([], ut),
                ts_column: pa.array([], tt),
                value_column: pa.array([], pa.float64()),
            }
        )
        if len(df) == 0:
            return empty
        df = (
            df.groupby([user_column, ts_column], as_index=False)[value_column]
            .max()
            .sort_values([user_column, ts_column], kind="mergesort")
        )
        ts = df[ts_column].to_numpy().astype("datetime64[us]").astype(np.int64)
        vals = df[value_column].to_numpy().astype(np.float64)
        users = df[user_column].to_numpy(object)
        new_u = np.empty(len(df), bool)
        new_u[0] = True
        new_u[1:] = users[1:] != users[:-1]
        starts = np.flatnonzero(new_u)
        ends = np.append(starts[1:], len(df)) - 1
        mn, mx = ts[starts], ts[ends]
        g0 = -(-mn // step) * step
        g1 = (mx // step) * step
        n = np.maximum((g1 - g0) // step + 1, 0)
        total = int(n.sum())
        if total == 0:
            return empty
        base = int(ts.min())
        assert int(ts.max()) - base < (1 << 48)
        excl = np.zeros(len(n) + 1, np.int64)
        np.cumsum(n, out=excl[1:])
        local = np.arange(total, dtype=np.int64) - np.repeat(excl[:-1], n)
        grid_ts = np.repeat(g0, n) + local * step
        grid_ord = np.repeat(np.arange(len(starts)), n)
        ordinals = np.cumsum(new_u) - 1
        key_ev = (ordinals.astype(np.int64) << 48) | (ts - base)
        key_gr = (grid_ord << 48) | (grid_ts - base)
        lo = np.searchsorted(key_ev, key_gr, side="right") - 1
        hi = np.searchsorted(key_ev, key_gr, side="left")
        on_point = lo >= hi  # grid exactly at an observation
        hi = np.minimum(hi, len(ts) - 1)
        t0, t1 = ts[lo], ts[hi]
        v0, v1 = vals[lo], vals[hi]
        with np.errstate(invalid="ignore", divide="ignore"):
            frac = (grid_ts - t0).astype(np.float64) / (t1 - t0).astype(np.float64)
        v = np.where(on_point, v0, v0 + (v1 - v0) * frac)
        return pa.table(
            {
                user_column: pa.array(users[starts][grid_ord].tolist(), ut),
                ts_column: pa.array(grid_ts.astype("datetime64[us]")).cast(tt),
                value_column: pa.array(v, pa.float64()),
            }
        )

    return (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("__ibkt")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


def merge_upsert(
    base_ds: "ray.data.Dataset",
    changes_ds: "ray.data.Dataset",
    key_column: str,
    value_columns: list[str],
) -> "ray.data.Dataset":
    """CDC MERGE/upsert: apply a changes table to a base table by unique
    key — keys present in ``changes_ds`` take the change row's values
    (update), keys only in ``changes_ds`` are inserted, keys only in
    ``base_ds`` pass through unchanged. One bucketed full-outer join by
    key hash (the same shape as :func:`diff_snapshots`); the per-column
    coalesce is vectorized. Neither side materializes on the driver, so
    the changes table may be corpus-sized (a full re-crawl delta), not
    just a small patch.
    """
    import numpy as np

    from dedupe_ray.joins import bucketed_lookup_join

    new_cols = [f"__new_{c}" for c in value_columns]

    def tag_base(t: pa.Table) -> pa.Table:
        return t.select([key_column, *value_columns])

    def tag_changes(t: pa.Table) -> pa.Table:
        out = {key_column: t.column(key_column)}
        for c, nc in zip(value_columns, new_cols):
            out[nc] = t.column(c)
        out["__new_present"] = pa.array(np.ones(len(t), np.int8))
        return pa.table(out)

    joined = bucketed_lookup_join(
        base_ds.map_batches(tag_base, batch_format="pyarrow"),
        changes_ds.map_batches(tag_changes, batch_format="pyarrow"),
        key_column,
        key_column,
        [*new_cols, "__new_present"],
        how="full",
    )

    def coalesce(t: pa.Table) -> pa.Table:
        take_new = pc.is_valid(t.column("__new_present"))
        out = {key_column: t.column(key_column)}
        for c, nc in zip(value_columns, new_cols):
            out[c] = pc.if_else(take_new, t.column(nc), t.column(c))
        return pa.table(out)

    return joined.map_batches(coalesce, batch_format="pyarrow")


def grouped_skew_kurtosis(
    ds: "ray.data.Dataset",
    group_columns: list[str],
    int_column: str,
) -> pa.Table:
    """Per-group skewness and excess kurtosis over an INTEGER column,
    exactly reproducible: each batch emits int64 raw-moment partials
    (n, Σx, Σx², Σx³, Σx⁴) per group — 5 numbers per (group, block) —
    merged by a tiny groupby-Sum; central moments and the final
    skew/kurtosis doubles are evaluated driver-side from the EXACT
    integer sums with the identical IEEE expression the SQL mirror uses
    (population moments: skew = m3/(m2·sqrt(m2)), kurt = m4/(m2·m2) − 3).

    Caller contract: the column must be integer-valued and small enough
    that Σx⁴ fits int64 (the partial pass raises on overflow risk —
    |x| ≤ ~55k at a billion rows). Returns a driver-side pa.Table, one
    row per group, with the integer sufficient statistics alongside the
    doubles so the oracle can hash-compare both layers.
    """
    import math

    import numpy as np
    import pandas as pd

    from ray.data.aggregate import Sum

    def partials(b: pa.Table) -> pa.Table:
        x = b.column(int_column).to_numpy(zero_copy_only=False).astype(np.int64)
        mx = int(np.abs(x).max(initial=0))
        if mx > 0 and mx**4 * max(len(x), 1) >= (1 << 62):
            raise OverflowError(
                f"fourth-moment partials may exceed int64 (max|x|={mx}, "
                f"n={len(x)}); quantize to a coarser fixed point"
            )
        df = pd.DataFrame({g: b.column(g).to_pandas() for g in group_columns})
        df["__x"] = x
        df["__x2"] = x * x
        df["__x3"] = x * x * x
        df["__x4"] = (x * x) * (x * x)
        g = df.groupby(group_columns, as_index=False).agg(
            n=("__x", "size"), s1=("__x", "sum"), s2=("__x2", "sum"),
            s3=("__x3", "sum"), s4=("__x4", "sum"),
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby(group_columns)
        .aggregate(
            Sum("n", alias_name="n"), Sum("s1", alias_name="s1"),
            Sum("s2", alias_name="s2"), Sum("s3", alias_name="s3"),
            Sum("s4", alias_name="s4"),
        )
        .to_pandas()  # bounded: one row per group
    )
    skews: list = []
    kurts: list = []
    for _, r in agg.iterrows():
        n = float(int(r["n"]))
        s1, s2 = float(int(r["s1"])), float(int(r["s2"]))
        s3, s4 = float(int(r["s3"])), float(int(r["s4"]))
        # written as the EXACT expression the SQL oracle evaluates — same
        # operand order, same literals, no constant folding across engines
        mean = s1 / n
        m2 = s2 / n - mean * mean
        if m2 <= 0.0:
            skews.append(None)
            kurts.append(None)
            continue
        m3 = s3 / n - 3.0 * mean * (s2 / n) + 2.0 * ((mean * mean) * mean)
        m4 = (
            s4 / n
            - 4.0 * mean * (s3 / n)
            + 6.0 * (mean * mean) * (s2 / n)
            - 3.0 * ((mean * mean) * (mean * mean))
        )
        skews.append(m3 / (m2 * math.sqrt(m2)))
        kurts.append(m4 / (m2 * m2) - 3.0)
    cols = {g: pa.array(agg[g]) for g in group_columns}
    cols["n"] = pa.array([int(v) for v in agg["n"]], pa.int64())
    for c in ("s1", "s2", "s3", "s4"):
        cols[c] = pa.array([int(v) for v in agg[c]], pa.int64())
    cols["skewness"] = pa.array(skews, pa.float64())
    cols["kurtosis"] = pa.array(kurts, pa.float64())
    return pa.table(cols)


def spearman_corr(
    ds: "ray.data.Dataset",
    a_column: str,
    b_column: str,
) -> pa.Table:
    """Spearman rank correlation between two LOW-CARDINALITY integer
    columns, exactly: one combiner shuffle reduces the corpus to its
    joint value histogram (|A|×|B| cells — per-batch np groupby partials,
    tiny groupby-Sum merge), then the driver computes tie-averaged ranks
    scaled by 2 (avg rank of a tie run is a half-integer: 2·r =
    2·cum_before + cnt + 1, an exact int) and Pearson-on-ranks from
    arbitrary-precision integer moments. The final rho double is the
    identical IEEE chain the SQL mirror evaluates from the same HUGEINT
    moments. Returns a one-row table (n, rho); rho NULL when either
    column is constant.

    The histogram shape is the 100-TB-safe one for ordinal columns
    (quantity buckets, star ratings, quantized scores): only |A|×|B|
    cells ever reach the driver, never rows. For continuous columns,
    quantize first or use :func:`grouped_corr` on raw values.
    """
    import math

    import numpy as np
    import pandas as pd

    from ray.data.aggregate import Sum

    def partials(b: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "a": b.column(a_column).to_numpy(zero_copy_only=False).astype(np.int64),
                "b": b.column(b_column).to_numpy(zero_copy_only=False).astype(np.int64),
            }
        )
        g = df.groupby(["a", "b"], as_index=False).size().rename(columns={"size": "cnt"})
        return pa.Table.from_pandas(g, preserve_index=False)

    hist = (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby(["a", "b"])
        .aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()  # bounded: |A|×|B| cells
    )
    if len(hist) == 0:
        return pa.table({"n": pa.array([], pa.int64()), "rho": pa.array([], pa.float64())})
    hist = hist.sort_values(["a", "b"])
    a_vals = hist["a"].to_numpy()
    b_vals = hist["b"].to_numpy()
    cnt = hist["cnt"].to_numpy().astype(object)  # python ints → exact

    def scaled_ranks(vals, cnts):
        """value → 2·(tie-averaged rank) as exact python ints."""
        order = np.argsort(vals, kind="stable")
        uniq: dict = {}
        cum = 0
        i = 0
        sv = vals[order]
        sc = cnts[order]
        while i < len(sv):
            j = i
            c = 0
            while j < len(sv) and sv[j] == sv[i]:
                c += int(sc[j])
                j += 1
            uniq[int(sv[i])] = 2 * cum + c + 1
            cum += c
            i = j
        return uniq

    # marginal counts per distinct value
    am = {}
    bm = {}
    for av, bv, c in zip(a_vals, b_vals, cnt):
        am[int(av)] = am.get(int(av), 0) + int(c)
        bm[int(bv)] = bm.get(int(bv), 0) + int(c)
    ra = scaled_ranks(np.array(sorted(am)), np.array([am[k] for k in sorted(am)], object))
    rb = scaled_ranks(np.array(sorted(bm)), np.array([bm[k] for k in sorted(bm)], object))

    n = sa = sb = saa = sbb = sab = 0
    for av, bv, c in zip(a_vals, b_vals, cnt):
        x, y, w = ra[int(av)], rb[int(bv)], int(c)
        n += w
        sa += w * x
        sb += w * y
        saa += w * x * x
        sbb += w * y * y
        sab += w * x * y
    va, vb = n * saa - sa * sa, n * sbb - sb * sb
    if va == 0 or vb == 0:
        rho = None
    else:
        rho = float(n * sab - sa * sb) / (math.sqrt(float(va)) * math.sqrt(float(vb)))
    return pa.table({"n": pa.array([n], pa.int64()), "rho": pa.array([rho], pa.float64())})


def grouped_rolling_median(
    ds: "ray.data.Dataset",
    key_column: str,
    order_columns: list[str],
    int_column: str,
    window: int = 5,
    out_column: str = "rolling_median",
) -> "ray.data.Dataset":
    """SQL ``median(x) OVER (PARTITION BY key ORDER BY ... ROWS BETWEEN
    window-1 PRECEDING AND CURRENT ROW)`` over an INTEGER column — the
    robust-smoothing window op. One bucketed shuffle (the shared
    :func:`_grouped_window` shape); full windows are vectorized via a
    sliding-window view + one batched np.median, only the ragged
    ``window−1`` head rows of each key run take the scalar path.

    Integer inputs make the even-count interpolation exact (a half is
    exactly representable), so ``(a+b)/2`` here and DuckDB's
    ``lower + (upper−lower)·0.5`` produce the identical double —
    quantize float columns to fixed-point upstream on both engines.
    """
    import numpy as np

    w = int(window)

    def kernel(g: pa.Table, new_key: np.ndarray) -> pa.Table:
        vals = g.column(int_column).to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(g)
        idx = np.arange(n)
        starts = np.nonzero(new_key)[0]
        run_id = np.cumsum(new_key) - 1
        run_start = starts[run_id]
        lo = np.maximum(run_start, idx - (w - 1))
        out = np.empty(n, np.float64)
        full = (idx - lo) == (w - 1)
        if n >= w and full.any():
            sw = np.lib.stride_tricks.sliding_window_view(vals, w)
            med_full = np.median(sw, axis=1)
            out[full] = med_full[idx[full] - (w - 1)]
        for i in np.nonzero(~full)[0]:
            out[i] = np.median(vals[lo[i] : i + 1])
        return g.append_column(out_column, pa.array(out))

    return _grouped_window(ds, key_column, order_columns, kernel)


def grouped_twap(
    ds: "ray.data.Dataset",
    key_column: str,
    ts_column: str,
    tiebreak_column: str,
    value_cents_column: str,
    out_column: str = "twap",
) -> "ray.data.Dataset":
    """Per-key time-weighted average: each observation is weighted by the
    whole seconds until the key's NEXT observation (``(next_µs − µs) //
    1e6`` — mirror with ``epoch_us`` + integer division in SQL, NOT
    ``date_diff('second',…)`` which counts boundary CROSSINGS and
    disagrees on sub-second phases). The key's last observation carries
    no weight; keys whose total weight is zero (single observation, or
    all ties) are omitted on both engines.

    One bucketed shuffle; because keys never straddle hash buckets, the
    kernel emits the FINAL per-key row (num = Σ cents·gap, den = Σ gap,
    twap = num/den as the identical double chain) directly — no second
    aggregate. Exact int64 sums: num ≤ max_cents · key_time_span_s per
    key, order-free and parallelism-invariant.
    """
    import numpy as np

    from dedupe_ray.blocking import N_BUCKETS

    def bucketize(b: pa.Table) -> pa.Table:
        return b.append_column(
            "__tbkt", _bucket_hash_col(b.column(key_column), N_BUCKETS)
        )

    sort_keys = [
        (key_column, "ascending"),
        (ts_column, "ascending"),
        (tiebreak_column, "ascending"),
    ]

    def per_bucket(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                key_column: pa.array([], pa.int64()),
                "num": pa.array([], pa.int64()),
                "den": pa.array([], pa.int64()),
                out_column: pa.array([], pa.float64()),
            }
        )
        if len(group) == 0:
            return empty
        g = group.take(pc.sort_indices(group, sort_keys=sort_keys))
        keys = g.column(key_column).to_numpy(zero_copy_only=False).astype(np.int64)
        us = g.column(ts_column).to_numpy(zero_copy_only=False)
        us = us.astype("datetime64[us]").view(np.int64)
        cents = g.column(value_cents_column).to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(g)
        if n < 2:
            return empty
        same = keys[1:] == keys[:-1]
        gap = (us[1:] - us[:-1]) // 1_000_000
        wnum = np.where(same, cents[:-1] * gap, 0)
        wden = np.where(same, gap, 0)
        # per-run sums via reduceat over run starts
        new_key = np.empty(n, bool)
        new_key[0] = True
        new_key[1:] = ~same
        starts = np.nonzero(new_key)[0]
        # pad the weight arrays to length n so reduceat segments align
        wnum_p = np.r_[wnum, 0]
        wden_p = np.r_[wden, 0]
        nums = np.add.reduceat(wnum_p, starts)
        dens = np.add.reduceat(wden_p, starts)
        out_keys = keys[starts]
        keep = dens > 0
        nums, dens, out_keys = nums[keep], dens[keep], out_keys[keep]
        twap = nums.astype(np.float64) / dens.astype(np.float64)
        return pa.table(
            {
                key_column: pa.array(out_keys),
                "num": pa.array(nums),
                "den": pa.array(dens),
                out_column: pa.array(twap),
            }
        )

    return (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("__tbkt")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


def mutual_information(
    ds: "ray.data.Dataset",
    a_column: str,
    b_column: str,
) -> pa.Table:
    """Mutual information between two categorical columns in integer
    micro-nats: the corpus reduces to its joint histogram in one combiner
    shuffle (|A|×|B| cells); the driver computes, per cell, ``c_ab ·
    floor(1e6 · ln((c_ab·n) / (c_a·c_b)))`` with exact integer counts and
    sums the per-cell INTEGERS — order-free, parallelism-invariant, and
    mirrored term-for-term by a SQL oracle (the same quantize-the-
    transcendental trick as the bigram-LM scores; raw float MI would
    hash-mismatch on summation order). Returns a one-row table
    (n, mi_micro); mi_micro/1e6 underestimates true MI by < 1e-6 nats
    per cell."""
    import math

    import pandas as pd

    from ray.data.aggregate import Sum

    def partials(b: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "a": b.column(a_column).to_pandas(),
                "b": b.column(b_column).to_pandas(),
            }
        )
        g = df.groupby(["a", "b"], as_index=False).size().rename(columns={"size": "cnt"})
        return pa.Table.from_pandas(g, preserve_index=False)

    hist = (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby(["a", "b"])
        .aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()  # bounded: |A|×|B| cells
    )
    if len(hist) == 0:
        return pa.table(
            {"n": pa.array([0], pa.int64()), "mi_micro": pa.array([0], pa.int64())}
        )
    ca: dict = {}
    cb: dict = {}
    for av, bv, c in zip(hist["a"], hist["b"], hist["cnt"]):
        ca[av] = ca.get(av, 0) + int(c)
        cb[bv] = cb.get(bv, 0) + int(c)
    n = sum(ca.values())
    mi = 0
    for av, bv, c in zip(hist["a"], hist["b"], hist["cnt"]):
        c = int(c)
        # identical IEEE chain to the SQL mirror: exact ints → double
        # division → libm log → floor
        term = math.floor(
            1000000.0 * math.log(float(c * n) / float(ca[av] * cb[bv]))
        )
        mi += c * term
    return pa.table(
        {"n": pa.array([n], pa.int64()), "mi_micro": pa.array([mi], pa.int64())}
    )


def sequence_gaps(
    ds: "ray.data.Dataset",
    key_column: str,
    seq_column: str,
    min_gap: int = 2,
    n_buckets: int = 256,
) -> "ray.data.Dataset":
    """Gaps-and-islands detection over an integer sequence per key (the
    classic "missing days / missing ids" scan): for each key's DISTINCT
    sorted sequence values, every consecutive pair whose JUMP is at
    least ``min_gap`` (i.e. ≥ ``min_gap − 1`` missing values) emits
    (key, gap_start, gap_end) — the inclusive missing range. Null keys
    and values are excluded (pandas-groupby dropna semantics).

    Shape: per-batch (key, value) dedup (the combiner) → groupby
    finishes the distinct → ONE bucketed shuffle → per bucket one
    lexsort + a vectorized diff over run-interior positions (no per-key
    loop). Output gap rows only — corpus-sized input, hole-sized output.
    """
    import numpy as np
    import pandas as pd

    def dedup_batch(b: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                key_column: b.column(key_column).to_pandas(),
                seq_column: b.column(seq_column).to_pandas(),
            }
        ).drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    distinct = (
        ds.map_batches(dedup_batch, batch_format="pyarrow")
        .groupby([key_column, seq_column])
        .count()
        .drop_columns(["count()"])
    )

    def bucketize(b: pa.Table) -> pa.Table:
        vals = b.column(key_column).to_numpy(zero_copy_only=False)
        bkt = (pd.util.hash_array(vals) % n_buckets).astype(np.int32)
        return b.append_column("__gbkt", pa.array(bkt))

    def gaps(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["__gbkt"])
        keys = g.column(key_column).to_numpy(zero_copy_only=False)
        codes, _ = pd.factorize(keys)
        vals = g.column(seq_column).to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((vals, codes))
        s_codes, s_vals = codes[order], vals[order]
        same_key = s_codes[1:] == s_codes[:-1]
        delta = s_vals[1:] - s_vals[:-1]
        hole = same_key & (delta >= min_gap)
        idx = np.nonzero(hole)[0]
        sel = pa.array(order[idx])
        return pa.table(
            {
                key_column: pc.take(g.column(key_column), sel),
                "gap_start": pa.array(s_vals[idx] + 1),
                "gap_end": pa.array(s_vals[idx + 1] - 1),
            }
        )

    return (
        distinct.map_batches(bucketize, batch_format="pyarrow")
        .groupby("__gbkt")
        .map_groups(gaps, batch_format="pyarrow")
    )


def skyline_2d(
    ds: "ray.data.Dataset",
    maximize_column: str,
    minimize_column: str,
) -> "ray.data.Dataset":
    """2-D skyline / Pareto frontier (Börzsönyi et al., ICDE 2001): rows
    not DOMINATED by any other — b dominates a iff b.max ≥ a.max ∧
    b.min ≤ a.min with at least one strict. Duplicate (max, min) points
    are mutually non-dominating and all survive (exact NOT-EXISTS
    semantics, so the SQL mirror hash-matches).

    Shape: the skyline operator distributes because local filtering is
    LOSSLESS — a globally non-dominated row is non-dominated in its
    block — so each block reduces to its local frontier (one sort +
    run-sliced prefix-min, no row loop) and a final single-group pass
    over the candidate union finishes. The candidate set is Σ per-block
    frontier sizes; for d=2 frontiers are typically tiny (points on the
    staircase), which is what makes this shape practical — a worst-case
    all-frontier dataset degrades to a single-node sort and should use a
    range-partitioned variant instead.
    """
    import numpy as np

    def local_skyline(b: pa.Table) -> pa.Table:
        if not len(b):
            return b
        p = b.column(maximize_column).to_numpy(zero_copy_only=False)
        d = b.column(minimize_column).to_numpy(zero_copy_only=False)
        # sort: p desc, d asc — _descending_key is wrap-safe for unsigned
        # and datetime dtypes (plain -p would wrap uint64 modulo 2^64)
        order = np.lexsort((d, _descending_key(p)))
        ps, dsv = p[order], d[order]
        n = len(order)
        # p-runs: rows sharing p; dominated iff d > run-min d (within run)
        # or d ≥ prefix-min d over strictly-greater p (before run)
        new_run = np.concatenate(([True], ps[1:] != ps[:-1]))
        run_id = np.cumsum(new_run) - 1
        n_runs = int(run_id[-1]) + 1
        run_min = np.full(n_runs, dsv.max(), dtype=dsv.dtype)
        np.minimum.at(run_min, run_id, dsv)
        prev_min = np.empty(n_runs, dtype=dsv.dtype)
        if n_runs:
            prev_min[0] = dsv.max()  # sentinel: nothing above the first run
            if n_runs > 1:
                np.minimum.accumulate(run_min[:-1], out=prev_min[1:])
        keep = (dsv == run_min[run_id]) & (
            (run_id == 0) | (dsv < prev_min[run_id])
        )
        return b.take(pa.array(np.sort(order[keep])))

    candidates = ds.map_batches(local_skyline, batch_format="pyarrow")
    # final frontier over the bounded candidate union (one group)
    return (
        candidates.map_batches(
            lambda t: t.append_column("__sky", pa.array(np.zeros(len(t), np.int8))),
            batch_format="pyarrow",
        )
        .groupby("__sky")
        .map_groups(
            lambda g: local_skyline(g.drop_columns(["__sky"])),
            batch_format="pyarrow",
        )
    )


def grouped_ewma_int(
    ds: "ray.data.Dataset",
    key_column: str,
    value_column: str,
    order_columns: list[str],
    alpha_num: int = 1,
    alpha_den: int = 4,
    cents: int = 100,
    out_column: str = "ewma_c",
    n_buckets: int = 256,
) -> "ray.data.Dataset":
    """Per-key exponentially weighted moving average in EXACT integer
    arithmetic (the streaming smoothing primitive): values quantize to
    cents once, then ``y₁ = x₁`` and ``yᵢ = floor((α_num·xᵢ +
    (α_den−α_num)·y_{i−1}) / α_den)`` — an integer recurrence, so the
    output is order-free across layouts and a recursive-CTE SQL mirror
    reproduces it bit-for-bit (a float EWMA would drift in the last ulp
    between engines; see the weighted-sample ln() landmine).

    ONE bucketed shuffle; per bucket the recurrence is sequential in
    TIME STEPS but vectorized ACROSS keys: rows lexsort to contiguous
    key runs, and step ``i`` updates every key's i-th row in one gather
    (loop length = max events per key, a data constant — not a per-row
    Python loop). Output: (key, *order_columns, out_column int64).
    """
    import numpy as np
    import pandas as pd

    a_n, a_d = int(alpha_num), int(alpha_den)

    def bucketize(b: pa.Table) -> pa.Table:
        vals = b.column(key_column).to_numpy(zero_copy_only=False)
        bkt = (pd.util.hash_array(vals) % n_buckets).astype(np.int32)
        return b.append_column("__wbkt", pa.array(bkt))

    def ewma(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["__wbkt"])
        keys = g.column(key_column).to_numpy(zero_copy_only=False)
        codes, _ = pd.factorize(keys)
        sort_keys = tuple(
            g.column(c).to_numpy(zero_copy_only=False) for c in reversed(order_columns)
        ) + (codes,)
        order = np.lexsort(sort_keys)
        x = np.floor(
            g.column(value_column).to_numpy(zero_copy_only=False).astype(np.float64)
            * float(cents)
            + 0.5
        ).astype(np.int64)[order]
        s_codes = codes[order]
        n = len(order)
        pos = np.arange(n, dtype=np.int64)
        new_run = np.concatenate(([True], s_codes[1:] != s_codes[:-1]))
        run_start = np.maximum.accumulate(np.where(new_run, pos, -1))
        pos_in_run = pos - run_start
        y = np.empty(n, np.int64)
        y[pos_in_run == 0] = x[pos_in_run == 0]
        # step-sliced update: by_step[k] holds the indices whose
        # pos_in_run == step_vals[k], so each loop turn is one gather
        by_step = np.argsort(pos_in_run, kind="stable")
        step_sorted = pos_in_run[by_step]
        bounds = np.searchsorted(step_sorted, np.arange(1, int(pos_in_run.max()) + 2))
        lo = bounds[0]
        for k in range(1, int(pos_in_run.max()) + 1):
            hi = bounds[k]
            sel = by_step[lo:hi]
            lo = hi
            if not len(sel):
                break
            num = a_n * x[sel] + (a_d - a_n) * y[sel - 1]
            y[sel] = np.floor_divide(num, a_d)
        sel_arr = pa.array(order)
        data = {key_column: pc.take(g.column(key_column), sel_arr)}
        for c in order_columns:
            data[c] = pc.take(g.column(c), sel_arr)
        data[out_column] = pa.array(y)
        return pa.table(data)

    return (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("__wbkt")
        .map_groups(ewma, batch_format="pyarrow")
    )


def grouped_holt_int(
    ds: "ray.data.Dataset",
    key_column: str,
    value_column: str,
    order_columns: list[str],
    alpha_num: int = 1,
    alpha_den: int = 4,
    gamma_num: int = 1,
    gamma_den: int = 4,
    cents: int = 100,
    n_buckets: int = 256,
) -> "ray.data.Dataset":
    """Per-key Holt double exponential smoothing (level + trend — the
    one-step forecasting primitive above :func:`grouped_ewma_int`) in
    EXACT integer arithmetic: values quantize to cents once, then with
    ``l₁ = x₁, b₁ = 0`` (pinned init) and floor-divisions throughout,

        lᵢ = ⌊(α_num·xᵢ + (α_den−α_num)·(l_{i−1} + b_{i−1})) / α_den⌋
        bᵢ = ⌊(γ_num·(lᵢ − l_{i−1}) + (γ_den−γ_num)·b_{i−1}) / γ_den⌋

    so both state columns are order-free across layouts and a
    recursive-CTE SQL mirror (wrap-mod floor-div for sign safety)
    reproduces them bit-for-bit; the one-step-ahead forecast is
    ``l + b`` in the same exact units. Same shape as the EWMA kernel:
    ONE bucketed shuffle, recurrence sequential in TIME STEPS but
    vectorized ACROSS keys (step-sliced gathers). Output: (key,
    *order_columns, level_c, trend_c int64)."""
    import numpy as np
    import pandas as pd

    a_n, a_d = int(alpha_num), int(alpha_den)
    g_n, g_d = int(gamma_num), int(gamma_den)

    def bucketize(b: pa.Table) -> pa.Table:
        vals = b.column(key_column).to_numpy(zero_copy_only=False)
        bkt = (pd.util.hash_array(vals) % n_buckets).astype(np.int32)
        return b.append_column("__wbkt", pa.array(bkt))

    def holt(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["__wbkt"])
        keys = g.column(key_column).to_numpy(zero_copy_only=False)
        codes, _ = pd.factorize(keys)
        sort_keys = tuple(
            g.column(c).to_numpy(zero_copy_only=False) for c in reversed(order_columns)
        ) + (codes,)
        order = np.lexsort(sort_keys)
        x = np.floor(
            g.column(value_column).to_numpy(zero_copy_only=False).astype(np.float64)
            * float(cents)
            + 0.5
        ).astype(np.int64)[order]
        s_codes = codes[order]
        n = len(order)
        pos = np.arange(n, dtype=np.int64)
        new_run = np.concatenate(([True], s_codes[1:] != s_codes[:-1]))
        run_start = np.maximum.accumulate(np.where(new_run, pos, -1))
        pos_in_run = pos - run_start
        lvl = np.empty(n, np.int64)
        trd = np.zeros(n, np.int64)
        heads = pos_in_run == 0
        lvl[heads] = x[heads]
        by_step = np.argsort(pos_in_run, kind="stable")
        step_sorted = pos_in_run[by_step]
        bounds = np.searchsorted(step_sorted, np.arange(1, int(pos_in_run.max()) + 2))
        lo = bounds[0]
        for k in range(1, int(pos_in_run.max()) + 1):
            hi = bounds[k]
            sel = by_step[lo:hi]
            lo = hi
            if not len(sel):
                break
            lp = lvl[sel - 1]
            bp = trd[sel - 1]
            l_new = np.floor_divide(a_n * x[sel] + (a_d - a_n) * (lp + bp), a_d)
            trd[sel] = np.floor_divide(g_n * (l_new - lp) + (g_d - g_n) * bp, g_d)
            lvl[sel] = l_new
        sel_arr = pa.array(order)
        data = {key_column: pc.take(g.column(key_column), sel_arr)}
        for c in order_columns:
            data[c] = pc.take(g.column(c), sel_arr)
        data["level_c"] = pa.array(lvl)
        data["trend_c"] = pa.array(trd)
        return pa.table(data)

    return (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("__wbkt")
        .map_groups(holt, batch_format="pyarrow")
    )


def token_bucket_replay(
    ds: "ray.data.Dataset",
    key_column: str,
    ts_column: str,
    order_columns: list[str],
    rate_milli: int = 500,
    cap_milli: int = 3000,
    n_buckets: int = 256,
) -> "ray.data.Dataset":
    """Deterministic token-bucket admission replay (the rate-limiter /
    traffic-shaping semantic, applied to a bounded log): per key in
    ``order_columns`` order, with integer milli-tokens and whole-second
    refill (``dt = (t_i − t_{i−1}) // 10⁶`` on epoch-micros — the
    boundary-crossing date_diff landmine avoided by construction),

        t_new = min(cap, tokens + rate·dt)
        admitted_i = (t_new ≥ 1000);  tokens_i = t_new − 1000·admitted_i

    starting full (``tokens₀ = cap − 1000``, first event admitted;
    ``cap_milli ≥ 1000`` enforced). Every quantity is exact int64, so
    the admit/deny sequence is layout-invariant and a recursive-CTE SQL
    mirror (LAG for dt) replays it row-by-row — the
    EWMA/CUSUM/Holt exact-recurrence doctrine applied to flow control.
    One bucketed shuffle; sequential in TIME STEPS, vectorized ACROSS
    keys. Output: (key, *order_columns, admitted int64, tokens_milli
    int64)."""
    import numpy as np
    import pandas as pd

    if cap_milli < 1000:
        raise ValueError("cap_milli must be >= 1000 (one whole token)")
    rate = int(rate_milli)
    cap = int(cap_milli)

    def bucketize(b: pa.Table) -> pa.Table:
        vals = b.column(key_column).to_numpy(zero_copy_only=False)
        bkt = (pd.util.hash_array(vals) % n_buckets).astype(np.int32)
        return b.append_column("__wbkt", pa.array(bkt))

    def replay(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["__wbkt"])
        keys = g.column(key_column).to_numpy(zero_copy_only=False)
        codes, _ = pd.factorize(keys)
        sort_keys = tuple(
            g.column(c).to_numpy(zero_copy_only=False)
            for c in reversed(order_columns)
        ) + (codes,)
        order = np.lexsort(sort_keys)
        t = (
            g.column(ts_column)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)[order]
        )
        s_codes = codes[order]
        n = len(order)
        pos = np.arange(n, dtype=np.int64)
        new_run = np.concatenate(([True], s_codes[1:] != s_codes[:-1]))
        run_start = np.maximum.accumulate(np.where(new_run, pos, -1))
        pos_in_run = pos - run_start
        dt = np.zeros(n, np.int64)
        dt[1:] = np.where(~new_run[1:], (t[1:] - t[:-1]) // 1_000_000, 0)
        tok = np.empty(n, np.int64)
        adm = np.zeros(n, np.int64)
        heads = pos_in_run == 0
        adm[heads] = 1
        tok[heads] = cap - 1000
        by_step = np.argsort(pos_in_run, kind="stable")
        step_sorted = pos_in_run[by_step]
        bounds = np.searchsorted(
            step_sorted, np.arange(1, int(pos_in_run.max()) + 2)
        )
        lo = bounds[0]
        for k in range(1, int(pos_in_run.max()) + 1):
            hi = bounds[k]
            sel = by_step[lo:hi]
            lo = hi
            if not len(sel):
                break
            t_new = np.minimum(cap, tok[sel - 1] + rate * dt[sel])
            a = (t_new >= 1000).astype(np.int64)
            adm[sel] = a
            tok[sel] = t_new - 1000 * a
        sel_arr = pa.array(order)
        data = {key_column: pc.take(g.column(key_column), sel_arr)}
        for c in order_columns:
            data[c] = pc.take(g.column(c), sel_arr)
        data["admitted"] = pa.array(adm)
        data["tokens_milli"] = pa.array(tok)
        return pa.table(data)

    return (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("__wbkt")
        .map_groups(replay, batch_format="pyarrow")
    )


def first_k_paths(
    ds: "ray.data.Dataset",
    key_column: str,
    value_column: str,
    order_columns: list[str],
    k: int = 3,
    sep: str = ">",
    n_buckets: int = 256,
) -> "ray.data.Dataset":
    """Per-key FIRST-k-step path mining (the product-analytics "top user
    journeys" primitive): each key's first ``k`` values ordered by
    ``order_columns`` concatenate into one path string, and paths count
    globally. ONE bucketed shuffle of (key, value, order) rows; per
    bucket a lexsort + run slicing keeps k rows per key and one
    ``pc.binary_join`` builds the paths (no per-key loop); per-bucket
    partial path counts make the final groupby combiner-sized (≤
    |value-domain|^k rows per bucket). Output: (path, n) —
    deterministic at any parallelism."""
    import numpy as np
    import pandas as pd

    from ray.data.aggregate import Sum

    def bucketize(b: pa.Table) -> pa.Table:
        vals = b.column(key_column).to_numpy(zero_copy_only=False)
        bkt = (pd.util.hash_array(vals) % n_buckets).astype(np.int32)
        return b.append_column("__pbkt", pa.array(bkt))

    def paths(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["__pbkt"])
        keys = g.column(key_column).to_numpy(zero_copy_only=False)
        codes, _ = pd.factorize(keys)
        sort_keys = tuple(
            g.column(c).to_numpy(zero_copy_only=False) for c in reversed(order_columns)
        ) + (codes,)
        order = np.lexsort(sort_keys)
        s_codes = codes[order]
        pos = np.arange(len(order), dtype=np.int64)
        new_run = np.concatenate(([True], s_codes[1:] != s_codes[:-1]))
        run_start = np.maximum.accumulate(np.where(new_run, pos, -1))
        keep = (pos - run_start) < k
        kept = order[keep]
        vals = pc.cast(pc.take(g.column(value_column), pa.array(kept)), pa.string())
        starts = np.nonzero(new_run[keep])[0]
        offsets = np.append(starts, len(kept)).astype(np.int32)
        lists = pa.ListArray.from_arrays(
            pa.array(offsets),
            vals.combine_chunks() if isinstance(vals, pa.ChunkedArray) else vals,
        )
        joined = pc.binary_join(lists, sep)
        dfp = pd.DataFrame({"path": joined.to_pandas()})
        agg = dfp.groupby("path", as_index=False).size().rename(columns={"size": "n"})
        agg["n"] = agg["n"].astype(np.int64)
        return pa.Table.from_pandas(agg, preserve_index=False)

    return (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("__pbkt")
        .map_groups(paths, batch_format="pyarrow")
        .groupby("path")
        .aggregate(Sum("n", alias_name="n"))
    )


def grouped_entropy(
    ds: "ray.data.Dataset",
    group_column: str,
    value_column: str,
    n_buckets: int = 256,
) -> "ray.data.Dataset":
    """Shannon entropy of the categorical ``value_column`` distribution
    per group, in integer micro-nats — the per-source/per-domain
    diversity signal a corpus-mixing pipeline thresholds on. Per group
    with total ``n`` and per-value counts ``c``: ``ent_micro_sum =
    Σ_v c_v · floor(1e6 · ln(n / c_v))`` — an exact int64 sum of exact
    int64 terms, so the output is order-free and parallelism-invariant
    (the raw-float entropy would differ by summation order; same
    quantize-the-transcendental doctrine as :func:`mutual_information`).
    ``H ≈ ent_micro_sum / (n · 1e6)`` nats, underestimating true H by
    < 1e-6 nats per distinct value.

    Shape: per-batch (group, value) partial counts (the combiner — a
    batch with a million repeats ships one row) → groupby Sum finishes
    the histogram → ONE bucketed shuffle of histogram rows, per bucket a
    factorize + two np.add.at passes (no per-group loop, any group
    cardinality). Rows with a null group or value are EXCLUDED
    (pandas-groupby dropna semantics — a SQL mirror must filter
    ``IS NOT NULL`` to match). Output: (group, n, ent_micro_sum) int64.
    """
    import numpy as np
    import pandas as pd

    from ray.data.aggregate import Sum

    def partials(b: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                group_column: b.column(group_column).to_pandas(),
                value_column: b.column(value_column).to_pandas(),
            }
        )
        g = df.groupby([group_column, value_column], as_index=False).size()
        g = g.rename(columns={"size": "cnt"})
        return pa.Table.from_pandas(g, preserve_index=False)

    hist = (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby([group_column, value_column])
        .aggregate(Sum("cnt", alias_name="cnt"))
    )

    def bucketize(b: pa.Table) -> pa.Table:
        vals = b.column(group_column).to_numpy(zero_copy_only=False)
        bkt = (pd.util.hash_array(vals) % n_buckets).astype(np.int32)
        return b.append_column("__ebkt", pa.array(bkt))

    def ent(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["__ebkt"])
        keys = g.column(group_column).to_numpy(zero_copy_only=False)
        codes, uniq = pd.factorize(keys)
        c = g.column("cnt").to_numpy(zero_copy_only=False).astype(np.int64)
        n = np.zeros(len(uniq), np.int64)
        np.add.at(n, codes, c)
        # identical IEEE chain to the SQL mirror: exact ints → double
        # division → libm log → scale → floor
        term = np.floor(
            1000000.0 * np.log(n[codes].astype(np.float64) / c.astype(np.float64))
        ).astype(np.int64)
        ent_sum = np.zeros(len(uniq), np.int64)
        np.add.at(ent_sum, codes, c * term)
        return pa.table(
            {
                group_column: pa.array(np.asarray(uniq)),
                "n": pa.array(n),
                "ent_micro_sum": pa.array(ent_sum),
            }
        )

    return (
        hist.map_batches(bucketize, batch_format="pyarrow")
        .groupby("__ebkt")
        .map_groups(ent, batch_format="pyarrow")
    )


def cohort_retention(
    ds: "ray.data.Dataset",
    key_column: str,
    ts_column: str,
) -> "ray.data.Dataset":
    """Cohort retention analysis (the product-analytics primitive): keys
    are cohorted by their FIRST activity day (epoch days — ``epoch_µs //
    86400e6``, exact integer on both engines), and each (cohort_day,
    day_offset) cell counts the distinct keys active that many days after
    their first day. Three bounded shuffles: distinct (key, day) pairs
    (combiner-deduped per batch before the groupby), per-key min-day, one
    bucketed join of the two — rows never fan out, every stage is keyed
    on the key hash. Output: (cohort_day, day_offset, n_users)."""
    import numpy as np
    import pandas as pd

    from ray.data.aggregate import Count, Min

    from dedupe_ray.joins import bucketed_lookup_join

    def to_days(b: pa.Table) -> pa.Table:
        us = b.column(ts_column).to_numpy(zero_copy_only=False)
        us = us.astype("datetime64[us]").view(np.int64)
        df = pd.DataFrame(
            {
                key_column: b.column(key_column).to_numpy(zero_copy_only=False),
                "day": us // 86_400_000_000,
            }
        ).drop_duplicates()  # per-batch combiner: shrink before the shuffle
        return pa.Table.from_pandas(df, preserve_index=False)

    days = ds.map_batches(to_days, batch_format="pyarrow")
    distinct_pairs = days.groupby([key_column, "day"]).count()

    def drop_count(b: pa.Table) -> pa.Table:
        return b.select([key_column, "day"])

    distinct_pairs = distinct_pairs.map_batches(drop_count, batch_format="pyarrow")
    first_day = days.groupby(key_column).aggregate(Min("day", alias_name="first_day"))

    joined = bucketed_lookup_join(
        distinct_pairs, first_day, key_column, key_column, ["first_day"]
    )

    def offsets(b: pa.Table) -> pa.Table:
        day = b.column("day").to_numpy(zero_copy_only=False).astype(np.int64)
        fd = b.column("first_day").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "cohort_day": pa.array(fd),
                "day_offset": pa.array(day - fd),
            }
        )

    return (
        joined.map_batches(offsets, batch_format="pyarrow")
        .groupby(["cohort_day", "day_offset"])
        .aggregate(Count(alias_name="n_users"))
    )


def scd2_history(
    ds: "ray.data.Dataset",
    key_column: str,
    ts_column: str,
    state_column: str,
    tiebreak_columns: list[str] | None = None,
) -> "ray.data.Dataset":
    """Slowly-Changing-Dimension Type 2: collapse a per-key change log
    into validity intervals. Rows are ordered by (ts, tiebreaks) within a
    key; consecutive rows with an UNCHANGED state are dropped (null-aware:
    null==null is "no change"); each surviving row opens an interval
    ``valid_from = ts`` closed by the NEXT change's ts (``valid_to``,
    NULL + ``is_current=True`` on the open tail). The CDC counterpart of
    :func:`merge_upsert` — upsert keeps latest state, this keeps history.
    One bucketed shuffle on the shared grouped-window shape."""
    import numpy as np

    def kernel(g: pa.Table, new_key: np.ndarray) -> pa.Table:
        n = len(g)
        state = g.column(state_column)
        if isinstance(state, pa.ChunkedArray):
            state = state.combine_chunks()
        prev_idx = pa.array(
            np.where(new_key, -1, np.arange(n) - 1), pa.int64()
        )
        prev = state.take(
            pc.if_else(pc.less(prev_idx, 0), pa.scalar(None, pa.int64()), prev_idx)
        )
        both_null = pc.and_(pc.is_null(state), pc.is_null(prev))
        same = pc.if_else(
            both_null, pa.scalar(True), pc.fill_null(pc.equal(state, prev), False)
        )
        change = new_key | pc.invert(same).to_numpy(zero_copy_only=False)
        f = g.filter(pa.array(change))
        keys = np.asarray(f.column(key_column).to_pylist(), object)
        m = len(f)
        tail = np.empty(m, bool)
        if m:
            tail[:-1] = keys[1:] != keys[:-1]
            tail[-1] = True
        nxt = pa.array(np.where(tail, -1, np.arange(m) + 1), pa.int64())
        ts = f.column(ts_column)
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        valid_to = ts.take(
            pc.if_else(pc.less(nxt, 0), pa.scalar(None, pa.int64()), nxt)
        )
        return pa.table(
            {
                key_column: f.column(key_column),
                state_column: f.column(state_column),
                "valid_from": ts,
                "valid_to": valid_to,
                "is_current": pa.array(tail),
                "__wbkt": f.column("__wbkt"),
            }
        )

    return _grouped_window(
        ds, key_column, [ts_column] + (tiebreak_columns or []), kernel
    )


def transition_counts(
    ds: "ray.data.Dataset",
    key_column: str,
    order_columns: list[str],
    state_column: str,
    prev_column: str = "prev_state",
    count_column: str = "n",
) -> "ray.data.Dataset":
    """First-order Markov transition counts: per key, order rows, pair
    each state with its predecessor, count (prev, state) over the whole
    corpus (key heads have no predecessor and are skipped) — the
    user-journey / clickstream-path primitive. One bucketed window
    shuffle; pair counts are pre-aggregated per bucket inside the window
    kernel (combiner), so the final groupby shuffles at most
    |states|² × n_buckets tiny rows."""
    import numpy as np

    from ray.data.aggregate import Sum

    def kernel(g: pa.Table, new_key: np.ndarray) -> pa.Table:
        import pandas as pd

        n = len(g)
        state = g.column(state_column)
        if isinstance(state, pa.ChunkedArray):
            state = state.combine_chunks()
        prev_idx = pa.array(
            np.where(new_key, -1, np.arange(n) - 1), pa.int64()
        )
        prev = state.take(
            pc.if_else(pc.less(prev_idx, 0), pa.scalar(None, pa.int64()), prev_idx)
        )
        df = pd.DataFrame(
            {
                prev_column: prev.to_numpy(zero_copy_only=False),
                state_column: state.to_numpy(zero_copy_only=False),
            }
        )
        df = df[~pd.isna(df[prev_column])]
        out = (
            df.groupby([prev_column, state_column], sort=False, dropna=False)
            .size()
            .reset_index(name=count_column)
        )
        t = pa.Table.from_pandas(out, preserve_index=False)
        return t.append_column(
            "__wbkt", pa.array(np.zeros(len(t), np.int64))
        )

    partials = _grouped_window(ds, key_column, order_columns, kernel)
    return partials.groupby([prev_column, state_column]).aggregate(
        Sum(count_column, alias_name=count_column)
    )


def _composite_key(t: pa.Table, cols: list[str]) -> pa.Array:
    """Null-safe composite string key over ``cols`` (shared by the
    k-anonymity / l-diversity release gates): NULLs group together via a
    sentinel that cannot appear in cast output, parts join on 0x1f."""
    parts = [
        pc.fill_null(pc.cast(t.column(c), pa.string()), "\x00null") for c in cols
    ]
    joined = parts[0] if len(parts) == 1 else pc.binary_join_element_wise(
        *parts, "\x1f"
    )
    return joined.combine_chunks() if isinstance(
        joined, pa.ChunkedArray
    ) else joined


def l_diversity_suppress(
    ds: "ray.data.Dataset",
    qi_columns: list[str],
    sensitive_column: str,
    l: int,
) -> "ray.data.Dataset":
    """l-diversity by suppression (Machanavajjhala 2007) — the gate
    ABOVE k-anonymity: drop every row whose quasi-identifier group
    carries fewer than ``l`` DISTINCT sensitive values, so group
    membership never narrows the sensitive attribute to <l candidates
    (a k-anonymous group where everyone shares one diagnosis still
    leaks; this catches it). NULL handling and composite-key semantics
    match :func:`k_anonymize_suppress` (shared helper); the sensitive
    column's NULL counts as one value.

    Shape: per-batch DISTINCT (qi, sensitive) pairs → one groupby over
    the pair table (bounded by |distinct qi|·|distinct sensitive|) →
    per-qi distinct counts → ≥l filter → one bucketed semi-join of the
    corpus. Rows shuffle once."""
    from ray.data.aggregate import Count

    from dedupe_ray.joins import bucketed_lookup_join

    def pair_partial(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "__qi": _composite_key(b, qi_columns),
                "__sv": _composite_key(b, [sensitive_column]),
            }
        )
        return t.group_by(["__qi", "__sv"]).aggregate([])

    groups = (
        ds.map_batches(pair_partial, batch_format="pyarrow")
        .groupby(["__qi", "__sv"])
        .count()  # global distinct pairs
        .groupby("__qi")
        .aggregate(Count(alias_name="ndist"))
        .filter(expr=f"ndist >= {int(l)}")
        .map_batches(lambda t: t.select(["__qi"]), batch_format="pyarrow")
    )

    tagged = ds.map_batches(
        lambda b: b.append_column("__qi", _composite_key(b, qi_columns)),
        batch_format="pyarrow",
    )
    kept = bucketed_lookup_join(tagged, groups, "__qi", "__qi", [])
    return kept.map_batches(
        lambda t: t.drop_columns(["__qi"]), batch_format="pyarrow"
    )


def k_anonymize_suppress(
    ds: "ray.data.Dataset",
    qi_columns: list[str],
    k: int,
) -> "ray.data.Dataset":
    """k-anonymity by suppression (Sweeney 2002): drop every row whose
    quasi-identifier combination is shared by fewer than ``k`` rows, so
    no surviving record is re-identifiable within a group smaller than
    ``k`` — the release gate a training-data pipeline runs after PII
    scrubbing. NULL quasi-identifier values group together (SQL PARTITION
    BY semantics) via a sentinel that cannot appear in cast output.

    Shape: per-batch combiner counts of the composite key → one small
    groupby-Sum over distinct combinations → a bucketed semi-join of the
    corpus against the ≥k combinations. Rows shuffle once; the
    combination table is |distinct QI| rows, not corpus rows."""
    import numpy as np

    from ray.data.aggregate import Sum

    from dedupe_ray.joins import bucketed_lookup_join

    def composite(t: pa.Table) -> pa.Array:
        parts = [
            pc.fill_null(pc.cast(t.column(c), pa.string()), "\x00null")
            for c in qi_columns
        ]
        if len(parts) == 1:
            return parts[0].combine_chunks() if isinstance(
                parts[0], pa.ChunkedArray
            ) else parts[0]
        joined = pc.binary_join_element_wise(*parts, "\x1f")
        return joined.combine_chunks() if isinstance(
            joined, pa.ChunkedArray
        ) else joined

    def count_partial(b: pa.Table) -> pa.Table:
        key = composite(b)
        counts = pa.table({"__qi": key}).group_by("__qi").aggregate(
            [("__qi", "count")]
        )
        return pa.table(
            {
                "__qi": counts.column("__qi"),
                "c": counts.column("__qi_count"),
            }
        )

    groups = (
        ds.map_batches(count_partial, batch_format="pyarrow")
        .groupby("__qi")
        .aggregate(Sum("c", alias_name="c"))
        .filter(expr=f"c >= {int(k)}")
        .map_batches(
            lambda t: t.select(["__qi"]), batch_format="pyarrow"
        )
    )

    tagged = ds.map_batches(
        lambda b: b.append_column("__qi", composite(b)),
        batch_format="pyarrow",
    )
    kept = bucketed_lookup_join(tagged, groups, "__qi", "__qi", [])
    return kept.map_batches(
        lambda t: t.drop_columns(["__qi"]), batch_format="pyarrow"
    )


def equidepth_bucketize(
    ds: "ray.data.Dataset",
    column: str,
    k: int,
    out_column: str = "bucket",
    **quantile_kwargs,
) -> "ray.data.Dataset":
    """Global equi-depth binning (the scale form of ``NTILE``/quantile
    bucketing): k−1 boundary values from the sort-free histogram-refine
    quantile engine (:func:`global_quantile_disc` at i/k), broadcast as
    plain scalars, then one zero-shuffle vectorized pass assigns
    ``bucket = #{boundaries strictly below the value}`` (ties land in
    the LOWER bucket — boundary elements are actual column members by
    quantile_disc semantics). Total cost: (k−1) boundary probes × a few
    streaming passes + one map — no global sort anywhere. Nulls get
    bucket NULL."""
    import numpy as np

    bounds = [
        global_quantile_disc(ds, column, i / k, **quantile_kwargs)
        for i in range(1, k)
    ]
    if any(b is None for b in bounds):  # empty column
        return ds.map_batches(
            lambda t: t.append_column(
                out_column, pa.nulls(len(t), pa.int64())
            ),
            batch_format="pyarrow",
        )
    barr = np.asarray(bounds, np.float64)

    def assign(t: pa.Table) -> pa.Table:
        col = t.column(column)
        v = col.to_numpy(zero_copy_only=False).astype(np.float64)
        # strict >: searchsorted(side=left) over sorted boundaries counts
        # boundaries < v; equal-to-boundary values take the lower bucket
        b = np.searchsorted(barr, v, side="left").astype(np.int64)
        null_mask = pc.is_null(col).to_numpy(zero_copy_only=False)
        arr = pa.array(b, pa.int64(), mask=null_mask)
        return t.append_column(out_column, arr)

    return ds.map_batches(assign, batch_format="pyarrow")


def zorder_key(
    ds: "ray.data.Dataset",
    x_column: str,
    y_column: str,
    bits: int = 16,
    out_column: str = "zkey",
) -> "ray.data.Dataset":
    """Z-order (Morton) locality key over two non-negative integer
    dimensions: interleave the low ``bits`` of x (even positions) and y
    (odd positions) into one int64. Sorting / range-partitioning /
    writing by this key co-locates rows that are close in BOTH
    dimensions — the standard data-layout trick (Delta/Iceberg OPTIMIZE
    ZORDER) for two-dimensional pruning at 100 TB, here as a zero-shuffle
    row-local stage feeding the existing sort/repartition/write surface.
    Values must fit ``bits`` bits; out-of-range raises (silent masking
    would scramble locality)."""
    import numpy as np

    if not (1 <= bits <= 31):
        raise ValueError("bits must be in [1, 31] (2*bits must fit int64)")
    lim = np.int64(1) << np.int64(bits)

    def assign(t: pa.Table) -> pa.Table:
        x = t.column(x_column).to_numpy(zero_copy_only=False).astype(np.int64)
        y = t.column(y_column).to_numpy(zero_copy_only=False).astype(np.int64)
        if len(x) and (
            x.min() < 0 or y.min() < 0 or x.max() >= lim or y.max() >= lim
        ):
            raise ValueError(
                f"zorder_key: values must be in [0, 2**{bits})"
            )
        z = np.zeros(len(x), np.int64)
        for b in range(bits):
            z |= ((x >> b) & 1) << (2 * b)
            z |= ((y >> b) & 1) << (2 * b + 1)
        return t.append_column(out_column, pa.array(z))

    return ds.map_batches(assign, batch_format="pyarrow")


def validate_rules(
    ds: "ray.data.Dataset",
    rules: list[tuple],
) -> "ray.data.Dataset":
    """Data-quality gate (Great-Expectations-style): count violations per
    declarative rule in ONE streaming pass (plus one bounded shuffle for
    uniqueness rules). Rules are tuples:

    - ``("not_null", col)`` — NULL values
    - ``("in_range", col, lo, hi)`` — non-null values outside [lo, hi]
    - ``("matches", col, pattern)`` — non-null values not fully matching
      the RE2 pattern
    - ``("unique", col)`` — rows beyond the first per duplicated value

    Row-local rules reduce as per-batch combiner Sums; ``unique`` ships
    per-batch (value, count) partials into a groupby (distinct-value-
    bounded, the exact-distinct shape) and sums ``count−1`` per
    duplicated value. Returns (rule, violations) — the release gate next
    to scrub_pii / k_anonymize_suppress."""
    import numpy as np

    import ray.data as rd
    from ray.data.aggregate import Sum

    local_rules = [r for r in rules if r[0] != "unique"]
    unique_cols = [r[1] for r in rules if r[0] == "unique"]

    def rule_name(r: tuple) -> str:
        return ":".join(str(x) for x in r)

    out_tables = []

    if local_rules:

        def partial(b: pa.Table) -> pa.Table:
            names, counts = [], []
            for r in local_rules:
                kind, col = r[0], b.column(r[1])
                if kind == "not_null":
                    v = col.null_count
                elif kind == "in_range":
                    lo, hi = r[2], r[3]
                    bad = pc.or_(pc.less(col, lo), pc.greater(col, hi))
                    v = int(
                        pc.sum(pc.fill_null(bad, False)).as_py() or 0
                    )
                elif kind == "matches":
                    ok = pc.match_substring_regex(
                        col, f"^(?:{r[2]})$"
                    )
                    v = int(
                        pc.sum(pc.fill_null(pc.invert(ok), False)).as_py()
                        or 0
                    )
                else:
                    raise ValueError(f"unknown rule kind {kind!r}")
                names.append(rule_name(r))
                counts.append(v)
            return pa.table(
                {
                    "rule": pa.array(names),
                    "violations": pa.array(counts, pa.int64()),
                }
            )

        out_tables.append(
            ds.map_batches(partial, batch_format="pyarrow")
            .groupby("rule")
            .aggregate(Sum("violations", alias_name="violations"))
        )

    for col in unique_cols:
        _c = col

        def dup_partial(b: pa.Table, _c=_c) -> pa.Table:
            vc = (
                b.column(_c)
                .cast(pa.string())
                .fill_null("\x00null")
                .value_counts()
            )
            return pa.table(
                {
                    "value": vc.field("values"),
                    "c": pa.array(
                        vc.field("counts").to_numpy(zero_copy_only=False),
                        pa.int64(),
                    ),
                }
            )

        summed = (
            ds.map_batches(dup_partial, batch_format="pyarrow")
            .groupby("value")
            .aggregate(Sum("c", alias_name="c"))
        )

        def excess(t: pa.Table, _c=_c) -> pa.Table:
            c = t.column("c").to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table(
                {
                    "rule": pa.array([f"unique:{_c}"] * len(t)),
                    "violations": pa.array(np.maximum(c - 1, 0)),
                }
            )

        out_tables.append(
            summed.map_batches(excess, batch_format="pyarrow")
            .groupby("rule")
            .aggregate(Sum("violations", alias_name="violations"))
        )

    result = out_tables[0]
    for t in out_tables[1:]:
        result = result.union(t)
    return result


def rolling_active_users(
    ds: "ray.data.Dataset",
    user_column: str,
    ts_column: str,
    window_days: int = 7,
) -> pa.Table:
    """Trailing-window distinct active users (the DAU/WAU/MAU family):
    for every day with any activity, how many distinct users were active
    in the closed trailing window of ``window_days`` days. A COUNT
    DISTINCT over a sliding window — computed WITHOUT any per-day
    distinct pass:

    1. per-batch (user, day) dedup combiner,
    2. one bucketed per-user groupby merges each user's active days into
       contribution intervals ``[day, day+w−1]`` (runs with gaps < w
       fuse, so a user never double-counts inside one window) and emits
       ±1 boundary deltas,
    3. deltas groupby-sum per day (bounded by the day range), then one
       driver cumsum over the day grid — WAU(d) = running sum at d —
       filtered to days that actually appear.

    Shuffles (user,day) distinct pairs once and day-deltas once; nothing
    scales with raw row count. Returns a bounded pa.Table
    (day, active_users) sorted by day."""
    import numpy as np
    import pandas as pd

    from ray.data.aggregate import Sum

    w = int(window_days)
    if w < 1:
        raise ValueError("window_days must be >= 1")

    def pairs(b: pa.Table) -> pa.Table:
        us = b.column(ts_column).to_numpy(zero_copy_only=False)
        day = us.astype("datetime64[us]").view(np.int64) // 86_400_000_000
        df = pd.DataFrame(
            {
                "user": b.column(user_column).to_numpy(zero_copy_only=False),
                "day": day,
            }
        ).drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    distinct = (
        ds.map_batches(pairs, batch_format="pyarrow")
        .groupby(["user", "day"])
        .count()
        .drop_columns(["count()"])
        .materialize()  # consumed twice: delta emission + the day grid
    )

    def bucketize(b: pa.Table) -> pa.Table:
        from dedupe_ray.blocking import N_BUCKETS

        return b.append_column(
            "__ubkt", _bucket_hash_col(b.column("user"), N_BUCKETS)
        )

    def deltas(group: pa.Table) -> pa.Table:
        if len(group) == 0:
            return pa.table(
                {"day": pa.array([], pa.int64()), "d": pa.array([], pa.int64())}
            )
        g = group.take(
            pc.sort_indices(
                group, sort_keys=[("user", "ascending"), ("day", "ascending")]
            )
        )
        users = np.asarray(g.column("user").to_pylist(), object)
        days = g.column("day").to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(days)
        new_user = np.empty(n, bool)
        new_user[0] = True
        new_user[1:] = users[1:] != users[:-1]
        # interval starts: new user OR gap >= w from the previous active day
        gap = np.empty(n, np.int64)
        gap[0] = w
        gap[1:] = days[1:] - days[:-1]
        start = new_user | (gap >= w)
        starts_idx = np.flatnonzero(start)
        # interval end day = last active day of the run + w - 1
        run_end_idx = np.append(starts_idx[1:] - 1, n - 1)
        s_days = days[starts_idx]
        e_days = days[run_end_idx] + w
        return pa.table(
            {
                "day": pa.array(np.concatenate([s_days, e_days])),
                "d": pa.array(
                    np.concatenate(
                        [np.ones(len(s_days), np.int64),
                         np.full(len(e_days), -1, np.int64)]
                    )
                ),
            }
        )

    delta_sums = (
        distinct.map_batches(bucketize, batch_format="pyarrow")
        .groupby("__ubkt")
        .map_groups(deltas, batch_format="pyarrow")
        .groupby("day")
        .aggregate(Sum("d", alias_name="d"))
    )
    dt = delta_sums.to_pandas().sort_values("day")  # bounded: day range
    days_arr = dt["day"].to_numpy(np.int64)
    run = dt["d"].to_numpy(np.int64).cumsum()
    # output grid = every day with ANY activity (not just run starts —
    # a mid-run active day must appear too); bounded by the day range
    grid = distinct.groupby("day").count().to_pandas()
    active_days = np.sort(grid["day"].to_numpy(np.int64))
    # WAU at day x = running sum after processing all deltas at days <= x
    idx = np.searchsorted(days_arr, active_days, side="right") - 1
    wau = run[idx]
    return pa.table(
        {
            "day": pa.array(active_days),
            "active_users": pa.array(wau, pa.int64()),
        }
    )


def temperature_mixture_sample(
    ds: "ray.data.Dataset",
    group_column: str,
    id_column: str,
    budget_num: int = 1,
    budget_den: int = 2,
    weight_scale: int = 10**6,
) -> "ray.data.Dataset":
    """Temperature-based corpus mixture sampling (the multilingual /
    multi-source LLM pre-training allocator, α = 0.5): each source's
    share of the total budget B = (N·budget_num)//budget_den is
    proportional to sqrt(n_source) rather than n_source, up-weighting
    small sources. Everything is engine-exact:

    - weights w_i = floor(weight_scale·sqrt(n_i)) — IEEE-754 sqrt is
      correctly rounded, so numpy and any SQL engine agree bit-for-bit
      (unlike pow/ln, which need the micro-nat quantization trick);
    - quotas by integer largest-remainder: base_i = (B·w_i)//W,
      leftovers go to the largest (B·w_i)%W remainders (ties → group
      asc) — Σ k_i == B exactly;
    - row selection per source: the k_i smallest (Knuth-hash, id) rows —
      the stratified_sample priority, so output is layout-invariant and
      mirrors a QUALIFY row_number() oracle.

    One bounded groupby for the counts (driver math on one row per
    source), then a per-batch top-k_i pre-trim (lexsort + run slicing,
    no Python rows) so the per-source resolve sees ≤ k_i·n_blocks
    candidates — the full table never shuffles."""
    import numpy as np

    cnt_rows = ds.groupby(group_column).count().take_all()  # bounded: per source
    groups = np.asarray(sorted(r[group_column] for r in cnt_rows), object)
    n_i = np.asarray(
        [next(r["count()"] for r in cnt_rows if r[group_column] == g) for g in groups],
        np.int64,
    )
    total = int(n_i.sum())
    budget = (total * int(budget_num)) // int(budget_den)
    w = np.floor(weight_scale * np.sqrt(n_i.astype(np.float64))).astype(np.int64)
    W = int(w.sum())
    base = (budget * w) // W
    rem = (budget * w) % W
    leftover = budget - int(base.sum())
    # bump the `leftover` largest remainders, ties → group asc (groups
    # are already sorted asc, so a stable sort on -rem realizes the rule)
    bump_order = np.argsort(-rem, kind="stable")
    k = base.copy()
    k[bump_order[:leftover]] += 1
    k = np.minimum(k, n_i)  # a quota can't exceed the source (tiny sources)
    quota = {g: int(kk) for g, kk in zip(groups, k)}
    quota_ref = ray.put(quota)

    def trim(b: pa.Table) -> pa.Table:
        q = ray.get(quota_ref)
        g = np.asarray(b.column(group_column).to_pylist(), object)
        ids = b.column(id_column).to_numpy(zero_copy_only=False).astype(np.int64)
        hk = (ids * 2654435761) & 0xFFFFFFFF
        order = np.lexsort((ids, hk, g))
        gs = g[order]
        starts = np.r_[0, np.flatnonzero(gs[1:] != gs[:-1]) + 1]
        runid = np.repeat(np.arange(len(starts)), np.diff(np.r_[starts, len(gs)]))
        pos = np.arange(len(gs)) - starts[runid]
        kcap = np.asarray([q.get(x, 0) for x in gs[starts]], np.int64)[runid]
        keep = order[pos < kcap]
        out = b.take(pa.array(np.sort(keep)))
        hk_col = hk[np.sort(keep)]
        return out.append_column("__hk", pa.array(hk_col))

    def resolve(t: pa.Table) -> pa.Table:
        q = ray.get(quota_ref)
        g0 = t.column(group_column)[0].as_py() if len(t) else None
        kk = q.get(g0, 0)
        hk = t.column("__hk").to_numpy(zero_copy_only=False)
        ids = t.column(id_column).to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, hk))[:kk]
        return t.take(pa.array(order)).drop_columns(["__hk"])

    return (
        ds.map_batches(trim, batch_format="pyarrow")
        .groupby(group_column)
        .map_groups(resolve, batch_format="pyarrow")
    )


def fuse_records(
    ds: "ray.data.Dataset",
    cluster_column: str,
    spec: dict[str, tuple[str, str]],
) -> "ray.data.Dataset":
    """Golden-record construction (survivorship / data fusion — the step
    AFTER entity resolution: collapse each resolved cluster to one fused
    record using per-field rules). ``spec`` maps output column →
    ``(source_column, rule)`` with rules:

    - ``"min"`` / ``"max"`` — algebraic, one groupby aggregate
      (recency-proxy "best value wins" and representative-key picks);
    - ``"mode"`` — most frequent value, ties to the SMALLEST
      (:func:`grouped_mode`'s combiner shape: the classic
      most-supported-source rule).

    An ``n_members`` count always rides along. Shape: ONE groupby
    carries every algebraic rule; each mode field adds one
    combiner-sized groupby; fused columns assemble through bucketed
    unique-key joins on the cluster id — the full record set is
    shuffled zero times (only per-cluster partials move). Mirrors a SQL
    GROUP BY + per-field ``row_number() OVER (ORDER BY cnt DESC, value
    ASC)`` oracle exactly (no floats anywhere unless a source column is
    float)."""
    from ray.data.aggregate import Count, Max, Min

    from dedupe_ray.joins import bucketed_lookup_join

    aggs = [Count(alias_name="n_members")]
    renames: dict[str, str] = {}
    modes: list[tuple[str, str]] = []
    for out, (col, rule) in spec.items():
        if rule == "min":
            aggs.append(Min(col, alias_name=f"min({col})"))
            renames[f"min({col})"] = out
        elif rule == "max":
            aggs.append(Max(col, alias_name=f"max({col})"))
            renames[f"max({col})"] = out
        elif rule == "mode":
            modes.append((out, col))
        else:
            raise ValueError(f"unknown survivorship rule {rule!r} for {out!r}")

    def rename(t: pa.Table) -> pa.Table:
        return t.rename_columns([renames.get(n, n) for n in t.column_names])

    fused = (
        ds.groupby(cluster_column)
        .aggregate(*aggs)
        .map_batches(rename, batch_format="pyarrow")
    )
    for out, col in modes:
        m = grouped_mode(ds, cluster_column, col, out_column=out)
        fused = bucketed_lookup_join(
            fused, m, cluster_column, cluster_column, [out]
        )
    return fused


def gini_coefficient(
    ds: "ray.data.Dataset",
    value_column: str,
    id_column: str,
) -> pa.Table:
    """Gini coefficient of a nonnegative integer value distribution
    (inequality / key-skew diagnosis — how concentrated order value,
    token mass, or partition size is), from exact int64 sufficient
    statistics over the sorted values:

        num = 2·Σ rank_i·x_i − (n + 1)·Σ x_i,    den = n·Σ x_i,
        gini = num / den

    with 1-based ranks in (value, id) order (the id tiebreak makes every
    rank engine-exact). Ranks come from :func:`assign_row_numbers` — the
    distributed zip-with-index, no global sort — and both moments reduce
    through per-batch int64 partials, so nothing but six integers
    reaches the driver. Overflow bound: Σ rank·x ≤ n²·max(x) — safe in
    int64 for n·sqrt(max_x) < 3·10⁹. The single division is the literal
    IEEE chain a SQL row_number mirror reproduces. Output one row:
    (n, sum_x, sum_rank_x, num, den, gini)."""
    import numpy as np

    from ray.data.aggregate import Sum

    ranked = assign_row_numbers(ds, value_column, id_column, out_column="__rank")

    def moments(b: pa.Table) -> pa.Table:
        x = b.column(value_column).to_numpy(zero_copy_only=False).astype(np.int64)
        if len(x) and x.min() < 0:
            raise ValueError(f"{value_column} must be nonnegative")
        r = b.column("__rank").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "n": pa.array([len(x)], pa.int64()),
                "sx": pa.array([int(x.sum())], pa.int64()),
                "srx": pa.array([int((r * x).sum())], pa.int64()),
            }
        )

    agg = ranked.map_batches(moments, batch_format="pyarrow").aggregate(
        Sum("n", alias_name="n"), Sum("sx", alias_name="sx"), Sum("srx", alias_name="srx")
    )
    n, sx, srx = int(agg["n"] or 0), int(agg["sx"] or 0), int(agg["srx"] or 0)
    num = 2 * srx - (n + 1) * sx
    den = n * sx
    gini = float(num) / float(den) if den else 0.0
    return pa.table(
        {
            "n": pa.array([n], pa.int64()),
            "sum_x": pa.array([sx], pa.int64()),
            "sum_rank_x": pa.array([srx], pa.int64()),
            "num": pa.array([num], pa.int64()),
            "den": pa.array([den], pa.int64()),
            "gini": pa.array([gini], pa.float64()),
        }
    )


def km_survival(
    ds: "ray.data.Dataset",
    duration_column: str,
    event_column: str,
    scale: int = 10**6,
) -> pa.Table:
    """Kaplan-Meier survival curve over (duration, event) observations —
    the standard right-censored estimator (churn, time-to-conversion,
    failure analysis): ``event_column`` is 1 when the terminal event was
    observed at ``duration_column`` (integer time units), 0 when the
    subject was censored there (still alive — leaves the at-risk set
    without a death). Survival is the exact integer product recurrence,
    in micro-units:

        s_i = (s_{i-1} * (n_i - d_i)) // n_i,    s_0 = scale

    over death times ascending, with n_i = subjects at risk
    (duration >= t_i; same-time censored count as at-risk — the standard
    KM convention) and d_i = deaths at t_i. Floor-quantizing each step
    keeps the curve parallelism-invariant and lets a recursive-CTE SQL
    mirror replay it row-for-row (the grouped_ewma_int doctrine).
    Shape: one combiner groupby builds the per-time (d, c) count table
    (bounded by distinct durations — bucket a fine-grained clock
    upstream); the reverse-cumulative at-risk walk and the recurrence
    run over that table on the driver. Output one row per death time:
    (duration, at_risk, deaths, surv_micro), all int64."""
    import numpy as np
    import pandas as pd

    from ray.data.aggregate import Sum

    def time_counts(b: pa.Table) -> pa.Table:
        ev = b.column(event_column).to_numpy(zero_copy_only=False).astype(np.int64)
        if len(ev) and (ev.min() < 0 or ev.max() > 1):
            raise ValueError(f"{event_column} must be binary 0/1")
        df = pd.DataFrame(
            {
                "t": b.column(duration_column)
                .to_numpy(zero_copy_only=False)
                .astype(np.int64),
                "d": ev,
                "c": 1 - ev,
            }
        )
        g = df.groupby("t", as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    times = (
        ds.map_batches(time_counts, batch_format="pyarrow")
        .groupby("t")
        .aggregate(Sum("d", alias_name="d"), Sum("c", alias_name="c"))
        .to_pandas()  # bounded: one row per distinct duration
        .sort_values("t", ignore_index=True)
    )
    d = times["d"].to_numpy(np.int64)
    c = times["c"].to_numpy(np.int64)
    at_risk = (d + c)[::-1].cumsum()[::-1]  # duration >= t => still at risk
    s = int(scale)
    out_t, out_n, out_d, out_s = [], [], [], []
    for i in range(len(times)):
        if d[i] == 0:
            continue
        s = (s * (int(at_risk[i]) - int(d[i]))) // int(at_risk[i])
        out_t.append(int(times["t"][i]))
        out_n.append(int(at_risk[i]))
        out_d.append(int(d[i]))
        out_s.append(s)
    return pa.table(
        {
            "duration": pa.array(out_t, pa.int64()),
            "at_risk": pa.array(out_n, pa.int64()),
            "deaths": pa.array(out_d, pa.int64()),
            "surv_micro": pa.array(out_s, pa.int64()),
        }
    )


def benford_profile(
    ds: "ray.data.Dataset",
    value_column: str,
    scale: int = 10**6,
) -> pa.Table:
    """Benford's-law first-digit profile (fraud / synthetic-data
    screening): observed counts of the leading significant digit of
    ``floor(abs(value))`` over rows with ``abs(value) ≥ 1``, next to the
    Benford expectation quantized to micro-units —
    ``exp_micro = floor(scale · ln(1 + 1/d) / ln(10))`` (count-ratio ln,
    the class where numpy and SQL engines agree bit-for-bit; the caller
    does the chi-square with exact integers in hand). The digit kernel
    is a vectorized repeated floor-div (≤ 19 passes, no strings, no
    log10 edge cases at powers of ten). One combiner groupby; all nine
    digits always appear. Output: (digit, obs, total, exp_micro)."""
    import numpy as np

    from ray.data.aggregate import Sum

    def digit_counts(b: pa.Table) -> pa.Table:
        v = np.abs(b.column(value_column).to_numpy(zero_copy_only=False))
        x = np.floor(v[v >= 1.0]).astype(np.int64)
        while (x >= 10).any():
            x = np.where(x >= 10, x // 10, x)
        cnt = np.bincount(x, minlength=10)[1:10]
        return pa.table(
            {
                "digit": pa.array(np.arange(1, 10, dtype=np.int64)),
                "obs": pa.array(cnt.astype(np.int64)),
            }
        )

    counts = (
        ds.map_batches(digit_counts, batch_format="pyarrow")
        .groupby("digit")
        .aggregate(Sum("obs", alias_name="obs"))
        .to_pandas()  # bounded: nine rows
        .sort_values("digit", ignore_index=True)
    )
    obs = np.zeros(9, np.int64)
    obs[counts["digit"].to_numpy(np.int64) - 1] = counts["obs"].to_numpy(np.int64)
    total = int(obs.sum())
    dd = np.arange(1, 10, dtype=np.float64)
    exp_micro = np.floor(
        scale * np.log(1.0 + 1.0 / dd) / np.log(10.0)
    ).astype(np.int64)
    return pa.table(
        {
            "digit": pa.array(np.arange(1, 10, dtype=np.int64)),
            "obs": pa.array(obs),
            "total": pa.array(np.full(9, total, np.int64)),
            "exp_micro": pa.array(exp_micro),
        }
    )


def association_rules(
    ds: "ray.data.Dataset",
    group_column: str,
    item_column: str,
    min_pair_count: int = 1,
    scale: int = 10**6,
) -> "ray.data.Dataset":
    """Market-basket association rules over (basket, item) rows — the
    a-priori second step on top of :func:`cooccurrence_pairs`: for every
    unordered item pair with support ≥ ``min_pair_count``, both directed
    confidences in exact integer micro-units and the lift as an exact
    num/den rational (the caller divides — no cross-engine float ships):

        conf(a→b) = (pair_cnt · scale) // cnt_a        (likewise b→a)
        lift      = (pair_cnt · n_baskets) / (cnt_a · cnt_b)

    with cnt_x = baskets containing x and n_baskets the distinct-basket
    count. Shape: the pair table comes from the co-occurrence combiner,
    per-item basket counts from one distinct-(basket, item) combiner
    groupby, and the two count attachments are bucketed unique-key
    joins; nothing basket-scaled shuffles twice. Overflow bound:
    pair_cnt · n_baskets < int64 for corpora under ~3·10⁹ baskets.
    Output: (item_a, item_b, pair_cnt, cnt_a, cnt_b, n_baskets,
    conf_ab_micro, conf_ba_micro, lift_num, lift_den)."""
    import numpy as np

    from ray.data.aggregate import Count

    from dedupe_ray.joins import bucketed_lookup_join

    pairs = cooccurrence_pairs(ds, group_column, item_column)

    def distinct_partial(b: pa.Table) -> pa.Table:
        df = b.select([group_column, item_column]).to_pandas().drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    gi = (
        ds.map_batches(distinct_partial, batch_format="pyarrow")
        .groupby([group_column, item_column])
        .count()
        .drop_columns(["count()"])
        .materialize()
    )
    item_counts = gi.groupby(item_column).aggregate(Count(alias_name="cnt"))
    n_baskets = (
        gi.groupby(group_column)
        .count()
        .count()  # bounded: the distinct-basket count collapses to a scalar
    )

    with_a = bucketed_lookup_join(
        pairs, item_counts, "item_a", item_column, ["cnt"]
    ).map_batches(
        lambda t: pa.table(
            {
                "item_a": t.column("item_a"),
                "item_b": t.column("item_b"),
                "pair_cnt": t.column("n_groups"),
                "cnt_a": t.column("cnt"),
            }
        ),
        batch_format="pyarrow",
    )
    with_b = bucketed_lookup_join(
        with_a, item_counts, "item_b", item_column, ["cnt"]
    )

    def metrics(t: pa.Table) -> pa.Table:
        # support filter last: an empty intermediate would erase the
        # schema the bucketed joins need to plan against
        t = t.filter(pc.greater_equal(t.column("pair_cnt"), min_pair_count))
        p = pc.cast(t.column("pair_cnt"), pa.int64()).to_numpy(zero_copy_only=False)
        ca = pc.cast(t.column("cnt_a"), pa.int64()).to_numpy(zero_copy_only=False)
        cb = pc.cast(t.column("cnt"), pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "item_a": t.column("item_a"),
                "item_b": t.column("item_b"),
                "pair_cnt": pa.array(p),
                "cnt_a": pa.array(ca),
                "cnt_b": pa.array(cb),
                "n_baskets": pa.array(np.full(len(t), n_baskets, np.int64)),
                "conf_ab_micro": pa.array((p * scale) // ca),
                "conf_ba_micro": pa.array((p * scale) // cb),
                "lift_num": pa.array(p * n_baskets),
                "lift_den": pa.array(ca * cb),
            }
        )

    return with_b.map_batches(metrics, batch_format="pyarrow")


def mann_kendall_trend(
    ds: "ray.data.Dataset",
    key_column: str,
    order_columns: list[str],
    value_column: str,
) -> "ray.data.Dataset":
    """Mann–Kendall trend statistic per key — the rank-based monotone
    trend detector (robust to outliers, exact under ties):

        S = Σ_{i<j in time order} sign(x_j − x_i)   ∈ [−C(n,2), C(n,2)]

    over an INTEGER value column (quantize upstream: cents, micro-units),
    so S is an exact int64 a SQL pair self-join mirrors. S near ±C(n,2)
    is a strong monotone trend; the caller normalizes or applies the
    variance test. ``order_columns`` must end in a unique tiebreak.

    Shape: one bucketed key shuffle (the _grouped_window layout), then
    per bucket a run-sliced, SIZE-BATCHED pairwise kernel — runs of equal
    length stack into one [m, k(k−1)/2] sign broadcast, so the quadratic
    work is pure numpy with one gather per distinct series length.
    Pairwise is intrinsic to the statistic: cap per-key series length
    upstream on unbounded streams. Output one row per key:
    (key, n, s_stat)."""
    import numpy as np

    from dedupe_ray.blocking import N_BUCKETS

    def bucketize(b: pa.Table) -> pa.Table:
        return b.append_column(
            "__mkbkt", _bucket_hash_col(b.column(key_column), N_BUCKETS)
        )

    sort_keys = [(key_column, "ascending")] + [
        (c, "ascending") for c in order_columns
    ]

    def per_bucket(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                key_column: pa.array([], group.schema.field(key_column).type),
                "n": pa.array([], pa.int64()),
                "s_stat": pa.array([], pa.int64()),
            }
        )
        if len(group) == 0:
            return empty
        g = group.take(pc.sort_indices(group, sort_keys=sort_keys))
        keys = np.asarray(g.column(key_column).to_pylist(), object)
        v = g.column(value_column).to_numpy(zero_copy_only=False).astype(np.int64)
        new_key = np.empty(len(g), bool)
        new_key[0] = True
        new_key[1:] = keys[1:] != keys[:-1]
        starts = np.flatnonzero(new_key)
        ks = np.diff(np.append(starts, len(g)))
        out_key, out_n, out_s = [], [], []
        for k in np.unique(ks):
            s_k = starts[ks == k]
            if k < 2:
                s_vals = np.zeros(len(s_k), np.int64)
            else:
                iu, ju = np.triu_indices(int(k), 1)
                block = v[s_k[:, None] + np.arange(int(k))[None, :]]
                s_vals = np.sign(block[:, ju] - block[:, iu]).sum(axis=1)
            out_key.append(keys[s_k])
            out_n.append(np.full(len(s_k), int(k), np.int64))
            out_s.append(s_vals.astype(np.int64))
        return pa.table(
            {
                key_column: pa.array(
                    np.concatenate(out_key), group.schema.field(key_column).type
                ),
                "n": pa.array(np.concatenate(out_n)),
                "s_stat": pa.array(np.concatenate(out_s)),
            }
        )

    return (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("__mkbkt")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


def theil_sen_slope(
    ds: "ray.data.Dataset",
    key_column: str,
    t_column: str,
    value_column: str,
    scale: int = 10**12,
) -> "ray.data.Dataset":
    """Theil–Sen robust slope per key (Sen 1968) — the median of all
    pairwise slopes, the breakdown-resistant complement to
    :func:`grouped_linregress` (OLS) and :func:`mann_kendall_trend`
    (sign-only): over INTEGER (t, value) series the statistic is

        slope_micro = lower-median over pairs t_i < t_j of
                      floor(scale · (v_j − v_i) / (t_j − t_i))

    Pairs at equal t are skipped (the estimator is undefined there);
    keys with zero valid pairs are dropped (pinned). Each pairwise
    slope is an exact floor-division of int64s, so the multiset — and
    its positional lower median — is engine-exact; a SQL mirror floors
    via the wrap-mod identity ``(a − ((a % b) + b) % b) // b`` (DuckDB
    ``//`` truncates while numpy floors; subtracting the positive
    remainder first makes the division exact, so the two agree).

    Shape: the :func:`mann_kendall_trend` layout — one bucketed key
    shuffle, then run-sliced SIZE-BATCHED pair kernels per bucket;
    same-length series stack into one [m, k(k−1)/2] slope matrix,
    invalid (dt = 0) cells take an int64 sentinel, one row-sort gives
    every series' median at its per-row valid count. Pairwise cost is
    intrinsic — cap per-key series length upstream on unbounded
    streams. Output: (key, n_pairs, slope_micro)."""
    import numpy as np

    from dedupe_ray.blocking import N_BUCKETS

    sentinel = np.iinfo(np.int64).max

    def bucketize(b: pa.Table) -> pa.Table:
        return b.append_column(
            "__tsbkt", _bucket_hash_col(b.column(key_column), N_BUCKETS)
        )

    sort_keys = [(key_column, "ascending"), (t_column, "ascending")]

    def per_bucket(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                key_column: pa.array([], group.schema.field(key_column).type),
                "n_pairs": pa.array([], pa.int64()),
                "slope_micro": pa.array([], pa.int64()),
            }
        )
        if len(group) == 0:
            return empty
        g = group.take(pc.sort_indices(group, sort_keys=sort_keys))
        keys = np.asarray(g.column(key_column).to_pylist(), object)
        t = g.column(t_column).to_numpy(zero_copy_only=False).astype(np.int64)
        v = g.column(value_column).to_numpy(zero_copy_only=False).astype(np.int64)
        new_key = np.empty(len(g), bool)
        new_key[0] = True
        new_key[1:] = keys[1:] != keys[:-1]
        starts = np.flatnonzero(new_key)
        ks = np.diff(np.append(starts, len(g)))
        out_key, out_n, out_s = [], [], []
        for k in np.unique(ks):
            if k < 2:
                continue
            s_k = starts[ks == k]
            iu, ju = np.triu_indices(int(k), 1)
            idx = s_k[:, None] + np.arange(int(k))[None, :]
            dt = t[idx][:, ju] - t[idx][:, iu]
            dy = v[idx][:, ju] - v[idx][:, iu]
            valid = dt > 0
            slopes = np.full(dt.shape, sentinel, np.int64)
            np.floor_divide(scale * dy, dt, out=slopes, where=valid)
            slopes.sort(axis=1)
            cnt = valid.sum(axis=1).astype(np.int64)
            keep = cnt > 0
            if not keep.any():
                continue
            med_idx = (cnt[keep] + 1) // 2 - 1
            med = slopes[keep, med_idx]
            out_key.append(keys[s_k[keep]])
            out_n.append(cnt[keep])
            out_s.append(med)
        if not out_key:
            return empty
        return pa.table(
            {
                key_column: pa.array(
                    np.concatenate(out_key), group.schema.field(key_column).type
                ),
                "n_pairs": pa.array(np.concatenate(out_n)),
                "slope_micro": pa.array(np.concatenate(out_s)),
            }
        )

    return (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("__tsbkt")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


def abc_classification(
    ds: "ray.data.Dataset",
    value_column: str,
    id_column: str,
    a_pct: int = 70,
    b_pct: int = 90,
) -> "ray.data.Dataset":
    """ABC / Pareto classification (the 80-20 inventory and skew triage):
    items rank by integer value descending (ties → id asc), and an item
    is class A while its INCLUSIVE cumulative share is ≤ ``a_pct``%,
    B while ≤ ``b_pct``%, else C — the boundary item that crosses a
    threshold falls in the NEXT class (pinned; mirrors
    ``cum·100 ≤ pct·total`` in exact int64, no percentage float ever).

    Shape: ranks from :func:`assign_row_numbers` on the negated value
    (descending without a global sort), the running total from
    :func:`grouped_cumsum` under one constant key — the input here is a
    per-item COMBINER table (revenue per part, size per partition), so
    the single ordered walk is bounded by the dimension's cardinality.
    Output: (id, value, rank, cum, abc_class)."""
    import numpy as np

    from ray.data.aggregate import Sum

    def neg(b: pa.Table) -> pa.Table:
        v = b.column(value_column).to_numpy(zero_copy_only=False).astype(np.int64)
        return b.append_column("__negv", pa.array(-v))

    ranked = assign_row_numbers(
        ds.map_batches(neg, batch_format="pyarrow"), "__negv", id_column,
        out_column="rank",
    ).map_batches(
        lambda t: t.drop_columns(["__negv"]).append_column(
            "__g", pa.array(np.zeros(len(t), np.int64))
        ),
        batch_format="pyarrow",
    )
    total = int(ds.aggregate(Sum(value_column, alias_name="s"))["s"] or 0)
    cum = grouped_cumsum(ranked, "__g", ["rank"], value_column, out_column="cum")

    def classify(t: pa.Table) -> pa.Table:
        c = t.column("cum").to_numpy(zero_copy_only=False).astype(np.int64)
        cls = np.where(
            c * 100 <= a_pct * total,
            "A",
            np.where(c * 100 <= b_pct * total, "B", "C"),
        )
        return pa.table(
            {
                id_column: t.column(id_column),
                value_column: t.column(value_column),
                "rank": t.column("rank"),
                "cum": t.column("cum"),
                "abc_class": pa.array(cls.astype(object), pa.string()),
            }
        )

    return cum.map_batches(classify, batch_format="pyarrow")


def psi_categories(
    ds_ref: "ray.data.Dataset",
    ds_cur: "ray.data.Dataset",
    category_column: str,
    scale: int = 10**6,
) -> "ray.data.Dataset":
    """Population Stability Index terms between two corpus slices — the
    standard categorical drift monitor (PSI < 0.1 stable, > 0.25 major
    shift): per category, term = (p_ref − p_cur)·ln(p_ref/p_cur),
    emitted as the exact integer

        term_micro = ((c_ref·n_cur − c_cur·n_ref) · ln_micro)
                     // (n_ref·n_cur),
        ln_micro   = floor(scale·ln((c_ref·n_cur)/(c_cur·n_ref)))

    — a count-ratio ln (the engine-agreement class) times a rational,
    both factors always same-signed so the floor-div is sign-safe; the
    caller sums term_micro/scale for the index. Categories missing from
    EITHER side are excluded (ln 0 is undefined — the standard PSI
    practice is a smoothing floor; pin that upstream if needed). Two
    bounded per-category count combiners and a driver-side join of the
    two small tables. Output: (category, c_ref, c_cur, ln_micro,
    term_micro)."""
    import numpy as np
    import pandas as pd

    def counts(ds):
        rows = ds.groupby(category_column).count().take_all()  # bounded: categories
        return {r[category_column]: int(r["count()"]) for r in rows}

    ref, cur = counts(ds_ref), counts(ds_cur)
    n_ref, n_cur = sum(ref.values()), sum(cur.values())
    cats = sorted(set(ref) & set(cur))
    c_ref = np.asarray([ref[c] for c in cats], np.int64)
    c_cur = np.asarray([cur[c] for c in cats], np.int64)
    ratio = (c_ref.astype(np.float64) * n_cur) / (c_cur.astype(np.float64) * n_ref)
    ln_micro = np.floor(scale * np.log(ratio)).astype(np.int64)
    diff = c_ref * n_cur - c_cur * n_ref
    term = (diff * ln_micro) // (np.int64(n_ref) * np.int64(n_cur))
    return ray.data.from_arrow(
        pa.table(
            {
                "category": pa.array(cats, pa.string()),
                "c_ref": pa.array(c_ref),
                "c_cur": pa.array(c_cur),
                "ln_micro": pa.array(ln_micro),
                "term_micro": pa.array(term.astype(np.int64)),
            }
        )
    )


def grouped_hhi(
    ds: "ray.data.Dataset",
    group_column: str,
    member_column: str,
) -> "ray.data.Dataset":
    """Herfindahl–Hirschman concentration index per group — market /
    key-skew concentration (HHI = Σ share², 1/k for k equal members, 1
    for a monopoly) — as the exact num/den rational

        hhi = hhi_num / hhi_den = Σ c_i² / (Σ c_i)²

    over member row counts within each group (caller divides). One
    per-(group, member) count combiner → per-group Σc and Σc² partials →
    one tiny groupby. Overflow: Σc² < int64 for groups under ~3·10⁹
    rows. Output: (group, n_members, hhi_num, hhi_den)."""
    import numpy as np
    import pandas as pd

    from ray.data.aggregate import Sum

    def cell_partial(b: pa.Table) -> pa.Table:
        df = b.select([group_column, member_column]).to_pandas()
        g = df.groupby([group_column, member_column], sort=False).size()
        g = g.rename("c").reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    cells = (
        ds.map_batches(cell_partial, batch_format="pyarrow")
        .groupby([group_column, member_column])
        .aggregate(Sum("c", alias_name="c"))
    )

    def moments(b: pa.Table) -> pa.Table:
        import pandas as pd

        c = pc.cast(b.column("c"), pa.int64()).to_numpy(zero_copy_only=False)
        df = pd.DataFrame(
            {
                group_column: b.column(group_column).to_pandas(),
                "n_members": 1,
                "s": c,
                "s2": c * c,
            }
        )
        g = df.groupby(group_column, as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    def finish(t: pa.Table) -> pa.Table:
        s = pc.cast(t.column("s"), pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                group_column: t.column(group_column),
                "n_members": pc.cast(t.column("n_members"), pa.int64()),
                "hhi_num": pc.cast(t.column("s2"), pa.int64()),
                "hhi_den": pa.array(s * s),
            }
        )

    return (
        cells.map_batches(moments, batch_format="pyarrow")
        .groupby(group_column)
        .aggregate(
            Sum("n_members", alias_name="n_members"),
            Sum("s", alias_name="s"),
            Sum("s2", alias_name="s2"),
        )
        .map_batches(finish, batch_format="pyarrow")
    )


def grouped_weighted_median(
    ds: "ray.data.Dataset",
    key_column: str,
    value_column: str,
    weight_column: str,
) -> "ray.data.Dataset":
    """Weighted lower median per key over INTEGER values and weights: the
    smallest value v whose inclusive cumulative weight satisfies
    ``2·cum_w(v) ≥ W`` — exact integer selection, no interpolation, so
    the output is engine-exact against a windowed-cumsum SQL mirror.

    Shape: one (key, value) weight-sum combiner collapses duplicates,
    then ONE bucketed key shuffle (the _grouped_window layout) walks each
    key's sorted values with a run-sliced cumulative sum and a
    reduceat-argmin first-crossing pick — no per-key Python. Output:
    (key, w_total, wmedian)."""
    import numpy as np

    from ray.data.aggregate import Sum

    from dedupe_ray.blocking import N_BUCKETS

    def wpartial(b: pa.Table) -> pa.Table:
        import pandas as pd

        df = pd.DataFrame(
            {
                key_column: b.column(key_column).to_pandas(),
                value_column: b.column(value_column)
                .to_numpy(zero_copy_only=False)
                .astype(np.int64),
                "w": b.column(weight_column)
                .to_numpy(zero_copy_only=False)
                .astype(np.int64),
            }
        )
        g = df.groupby([key_column, value_column], as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    cells = (
        ds.map_batches(wpartial, batch_format="pyarrow")
        .groupby([key_column, value_column])
        .aggregate(Sum("w", alias_name="w"))
    )

    def bucketize(b: pa.Table) -> pa.Table:
        return b.append_column(
            "__wmbkt", _bucket_hash_col(b.column(key_column), N_BUCKETS)
        )

    def per_bucket(group: pa.Table) -> pa.Table:
        if len(group) == 0:
            return pa.table(
                {
                    key_column: pa.array([], group.schema.field(key_column).type),
                    "w_total": pa.array([], pa.int64()),
                    "wmedian": pa.array([], pa.int64()),
                }
            )
        g = group.take(
            pc.sort_indices(
                group,
                sort_keys=[(key_column, "ascending"), (value_column, "ascending")],
            )
        )
        keys = np.asarray(g.column(key_column).to_pylist(), object)
        v = g.column(value_column).to_numpy(zero_copy_only=False).astype(np.int64)
        w = pc.cast(g.column("w"), pa.int64()).to_numpy(zero_copy_only=False)
        new_key = np.empty(len(g), bool)
        new_key[0] = True
        new_key[1:] = keys[1:] != keys[:-1]
        starts = np.flatnonzero(new_key)
        runid = np.repeat(
            np.arange(len(starts)), np.diff(np.append(starts, len(g)))
        )
        cs = w.cumsum()
        base = np.repeat(cs[starts] - w[starts], np.diff(np.append(starts, len(g))))
        cum = cs - base
        w_tot = np.add.reduceat(w, starts)
        flag = 2 * cum >= w_tot[runid]
        first = np.minimum.reduceat(np.where(flag, np.arange(len(g)), len(g)), starts)
        return pa.table(
            {
                key_column: pa.array(keys[starts], group.schema.field(key_column).type),
                "w_total": pa.array(w_tot.astype(np.int64)),
                "wmedian": pa.array(v[first]),
            }
        )

    return (
        cells.map_batches(bucketize, batch_format="pyarrow")
        .groupby("__wmbkt")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


def rfm_scores(
    ds: "ray.data.Dataset",
    id_column: str,
    recency_column: str,
    frequency_column: str,
    monetary_column: str,
    n_tiles: int = 5,
) -> "ray.data.Dataset":
    """RFM customer segmentation (the CRM staple) over a per-customer
    metrics table: each of recency / frequency / monetary gets a 1..n
    quintile score by GLOBAL RANK —

        score = 1 + (n_tiles · (rank − 1)) // n_rows

    with rank from :func:`assign_row_numbers` over (metric, id) — the
    rank-based tiling (row_number, not value buckets) is pinned so ties
    split deterministically and the SQL mirror is exact-integer.
    Recency is inverted (``n_tiles + 1 − raw``: most recent → highest
    score, the standard convention); frequency and monetary score up
    with value. The composite ``rfm = 100·r + 10·f + m``. Three
    zip-with-index passes over the combiner-sized metrics table plus two
    bucketed id joins. Output: the input metric columns plus
    (r_score, f_score, m_score, rfm)."""
    import numpy as np

    from dedupe_ray.joins import bucketed_lookup_join

    n_rows = ds.count()

    def tile(col: str, out: str, invert: bool) -> "ray.data.Dataset":
        ranked = assign_row_numbers(
            ds.select_columns([id_column, col]), col, id_column, out_column="__rk"
        )

        def score(t: pa.Table) -> pa.Table:
            rk = t.column("__rk").to_numpy(zero_copy_only=False).astype(np.int64)
            s = 1 + (n_tiles * (rk - 1)) // n_rows
            if invert:
                s = n_tiles + 1 - s
            return pa.table(
                {id_column: t.column(id_column), out: pa.array(s.astype(np.int64))}
            )

        return ranked.map_batches(score, batch_format="pyarrow")

    r = tile(recency_column, "r_score", invert=True)
    f = tile(frequency_column, "f_score", invert=False)
    m = tile(monetary_column, "m_score", invert=False)
    joined = bucketed_lookup_join(
        bucketed_lookup_join(ds, r, id_column, id_column, ["r_score"]),
        f,
        id_column,
        id_column,
        ["f_score"],
    )
    joined = bucketed_lookup_join(joined, m, id_column, id_column, ["m_score"])

    def composite(t: pa.Table) -> pa.Table:
        rs = t.column("r_score").to_numpy(zero_copy_only=False)
        fs = t.column("f_score").to_numpy(zero_copy_only=False)
        ms = t.column("m_score").to_numpy(zero_copy_only=False)
        return t.append_column(
            "rfm", pa.array((100 * rs + 10 * fs + ms).astype(np.int64))
        )

    return joined.map_batches(composite, batch_format="pyarrow")


def grouped_hampel_flags(
    ds: "ray.data.Dataset",
    key_column: str,
    order_columns: list[str],
    value_column: str,
    window: int = 5,
    k: int = 3,
) -> "ray.data.Dataset":
    """Hampel outlier filter per key — the robust time-series anomaly
    flag (rolling median ± k·MAD beats z-scores because one spike can't
    drag its own baseline): over each trailing ``window`` (inclusive,
    shorter at key heads), flag rows where

        |v − med| > k · MAD        ⟺   2·|2v − med2| > k·mad4

    with med2 = 2·median and mad4 = 4·MAD kept as EXACT integers (the
    doubled-units trick: a median of ints is a half-integer at worst, so
    2× it is integral — no float ever, engine-exact against a
    window-self-join SQL mirror). INTEGER value column (quantize cents
    upstream). One bucketed key shuffle; per bucket the trailing windows
    gather as one [n, window] strided matrix — no per-row Python.
    Output: input rows + (med2, mad4, is_outlier)."""
    import numpy as np

    from dedupe_ray.blocking import N_BUCKETS

    W = int(window)

    def bucketize(b: pa.Table) -> pa.Table:
        return b.append_column(
            "__hbkt", _bucket_hash_col(b.column(key_column), N_BUCKETS)
        )

    sort_keys = [(key_column, "ascending")] + [
        (c, "ascending") for c in order_columns
    ]

    def per_bucket(group: pa.Table) -> pa.Table:
        if len(group) == 0:
            return group.drop_columns(["__hbkt"])
        g = group.take(pc.sort_indices(group, sort_keys=sort_keys))
        keys = np.asarray(g.column(key_column).to_pylist(), object)
        v = g.column(value_column).to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(g)
        new_key = np.empty(n, bool)
        new_key[0] = True
        new_key[1:] = keys[1:] != keys[:-1]
        starts = np.flatnonzero(new_key)
        runid = np.repeat(np.arange(len(starts)), np.diff(np.append(starts, n)))
        pos = np.arange(n) - starts[runid]
        # trailing-window gather: win[i, j] = v at offset j of row i's
        # window; invalid slots masked to the row's own value (keeps the
        # median over the VALID prefix once we sort with +inf padding)
        offs = np.arange(W)
        idx = np.arange(n)[:, None] - (W - 1 - offs)[None, :]
        valid = (idx >= 0) & (idx >= (starts[runid])[:, None])
        wlen = valid.sum(axis=1)
        big = np.iinfo(np.int64).max
        win = np.where(valid, v[np.maximum(idx, 0)], big)
        win.sort(axis=1)
        lo_i = (wlen - 1) // 2
        hi_i = wlen // 2
        rows = np.arange(n)
        med2 = win[rows, lo_i] + win[rows, hi_i]
        dev = np.where(valid, np.abs(2 * v[np.maximum(idx, 0)] - med2[:, None]), big)
        dev.sort(axis=1)
        mad4 = dev[rows, lo_i] + dev[rows, hi_i]
        flag = 2 * np.abs(2 * v - med2) > k * mad4
        out = g.drop_columns(["__hbkt"])
        out = out.append_column("med2", pa.array(med2))
        out = out.append_column("mad4", pa.array(mad4))
        return out.append_column("is_outlier", pa.array(flag))

    return (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("__hbkt")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


def interval_coverage(
    ds: "ray.data.Dataset",
    key_column: str,
    start_column: str,
    end_column: str,
) -> "ray.data.Dataset":
    """Total covered length of a union of half-open integer intervals
    per key (uptime, billing, sensor-coverage accounting): overlapping
    and touching intervals merge into islands, and the output is each
    key's Σ (island_end − island_start) plus the island count — exact
    int64, engine-exact against the classic cummax-islands SQL window.

    One bucketed key shuffle; per bucket a SEGMENTED running max of the
    sorted ends (the offset trick: ends rebased then lifted per-run so
    one ``np.maximum.accumulate`` does every key at once) finds island
    breaks without per-key Python. Order ties break by (start, end) —
    include a unique tiebreak upstream if exact ROW order ever matters
    (sums don't)."""
    import numpy as np

    from dedupe_ray.blocking import N_BUCKETS

    def bucketize(b: pa.Table) -> pa.Table:
        return b.append_column(
            "__ibkt", _bucket_hash_col(b.column(key_column), N_BUCKETS)
        )

    def per_bucket(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                key_column: pa.array([], group.schema.field(key_column).type),
                "covered": pa.array([], pa.int64()),
                "n_islands": pa.array([], pa.int64()),
            }
        )
        if len(group) == 0:
            return empty
        g = group.take(
            pc.sort_indices(
                group,
                sort_keys=[
                    (key_column, "ascending"),
                    (start_column, "ascending"),
                    (end_column, "ascending"),
                ],
            )
        )
        keys = np.asarray(g.column(key_column).to_pylist(), object)
        s = g.column(start_column).to_numpy(zero_copy_only=False).astype(np.int64)
        e = g.column(end_column).to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(g)
        new_key = np.empty(n, bool)
        new_key[0] = True
        new_key[1:] = keys[1:] != keys[:-1]
        starts = np.flatnonzero(new_key)
        runid = np.repeat(np.arange(len(starts)), np.diff(np.append(starts, n)))
        # segmented running max of e: rebase to small nonneg ints, lift
        # each run onto its own plateau, one global accumulate
        base = int(min(s.min(), e.min()))
        span = int(e.max()) - base + 1
        lifted = (e - base) + runid * span  # < n_runs·span — guard below
        if lifted.max() >= np.iinfo(np.int64).max // 2:
            raise OverflowError("interval span × keys exceeds the offset trick")
        cm = np.maximum.accumulate(lifted) - runid * span + base
        prev_cm = np.empty(n, np.int64)
        prev_cm[0] = np.iinfo(np.int64).min
        prev_cm[1:] = cm[:-1]
        prev_cm[new_key] = np.iinfo(np.int64).min
        island_break = s > prev_cm  # strictly after the running max → gap
        # covered = Σ max-end-per-island − island start; equivalently sum
        # of positive extensions: ext_i = min(e_i, cm_i) − max(s_i, prev_cm)
        ext = cm - np.maximum(s, np.minimum(prev_cm, cm))
        ext[island_break] = (cm - s)[island_break]
        ext = np.maximum(ext, 0)
        import pandas as pd

        df = pd.DataFrame(
            {
                key_column: keys,
                "covered": ext,
                "n_islands": island_break.astype(np.int64),
            }
        )
        out = df.groupby(key_column, as_index=False, sort=False).sum()
        return pa.Table.from_pandas(out, preserve_index=False)

    from ray.data.aggregate import Sum

    return (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("__ibkt")
        .map_groups(per_bucket, batch_format="pyarrow")
        .groupby(key_column)
        .aggregate(
            Sum("covered", alias_name="covered"),
            Sum("n_islands", alias_name="n_islands"),
        )
    )


def decayed_counts(
    ds: "ray.data.Dataset",
    key_column: str,
    ts_column: str,
    epoch_us: int = 86_400_000_000,
) -> "ray.data.Dataset":
    """Exponentially time-decayed activity counters per key (the
    streaming-freshness ranking signal: yesterday counts half of today)
    with a HALF-LIFE OF ONE EPOCH, kept exact: an event aged ``a``
    epochs (relative to the corpus's newest epoch) weighs 2^−a, and the
    total ships as the exact rational

        decayed = decayed_num / decayed_den
                = Σ cnt_a · 2^(A − a)  /  2^A

    (A = oldest age present — bit shifts, no floats, engine-exact).
    One per-(key, epoch) count combiner; two bounded scalars (newest
    epoch, max age). Overflow guard: A ≤ 40 epochs (rebucket ``epoch_us``
    coarser for longer horizons). Output: (key, n_events, decayed_num,
    decayed_den)."""
    import numpy as np
    import pandas as pd

    from ray.data.aggregate import Sum

    mx = int(
        np.datetime64(ds.max(ts_column), "us").astype(np.int64) // epoch_us
    )  # bounded: one scalar

    def age_counts(b: pa.Table) -> pa.Table:
        t = b.column(ts_column).to_numpy(zero_copy_only=False).astype(np.int64)
        df = pd.DataFrame(
            {
                "key": b.column(key_column).to_pandas(),
                "age": mx - t // epoch_us,
                "cnt": 1,
            }
        )
        g = df.groupby(["key", "age"], as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    cells = (
        ds.map_batches(age_counts, batch_format="pyarrow")
        .groupby(["key", "age"])
        .aggregate(Sum("cnt", alias_name="cnt"))
        .materialize()
    )
    am = int(cells.max("age"))  # bounded: one scalar
    if am > 40:
        raise OverflowError(
            f"max age {am} epochs overflows the 2^A weighting — coarsen epoch_us"
        )

    def fold(b: pa.Table) -> pa.Table:
        age = pc.cast(b.column("age"), pa.int64()).to_numpy(zero_copy_only=False)
        cnt = pc.cast(b.column("cnt"), pa.int64()).to_numpy(zero_copy_only=False)
        df = pd.DataFrame(
            {
                "key": b.column("key").to_pandas(),
                "n_events": cnt,
                "decayed_num": cnt << (am - age),
            }
        )
        g = df.groupby("key", as_index=False).sum()
        g["decayed_den"] = np.int64(1) << am
        return pa.Table.from_pandas(g, preserve_index=False)

    return (
        cells.map_batches(fold, batch_format="pyarrow")
        .groupby("key")
        .aggregate(
            Sum("n_events", alias_name="n_events"),
            Sum("decayed_num", alias_name="decayed_num"),
            Sum("decayed_den", alias_name="__den_sum"),
        )
        .map_batches(
            lambda t: pa.table(
                {
                    key_column: t.column("key"),
                    "n_events": pc.cast(t.column("n_events"), pa.int64()),
                    "decayed_num": pc.cast(t.column("decayed_num"), pa.int64()),
                    "decayed_den": pa.array(
                        np.full(len(t), np.int64(1) << am, np.int64)
                    ),
                }
            ),
            batch_format="pyarrow",
        )
    )


def grouped_ols_stats(
    ds: "ray.data.Dataset",
    key_column: str,
    x_column: str,
    y_column: str,
) -> "ray.data.Dataset":
    """Per-key simple linear regression as exact int64 sufficient
    statistics over INTEGER (x, y) columns (quantize upstream):

        slope = slope_num / slope_den
              = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)

    — the num/den doctrine: no cross-engine float ships, the caller
    divides (and gets the intercept as (Σy·slope_den − slope_num·Σx) /
    (n·slope_den)). One per-batch moment combiner → one tiny groupby
    Sum. Overflow: n·Σxy needs n·x·y·n < 2⁶³ — cents×units over
    billion-row groups is safe; rescale upstream beyond that. Output:
    (key, n, sx, sy, sxy, sxx, slope_num, slope_den)."""
    import numpy as np
    import pandas as pd

    from ray.data.aggregate import Sum

    def moments(b: pa.Table) -> pa.Table:
        x = b.column(x_column).to_numpy(zero_copy_only=False).astype(np.int64)
        y = b.column(y_column).to_numpy(zero_copy_only=False).astype(np.int64)
        df = pd.DataFrame(
            {
                "key": b.column(key_column).to_pandas(),
                "n": 1,
                "sx": x,
                "sy": y,
                "sxy": x * y,
                "sxx": x * x,
            }
        )
        g = df.groupby("key", as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    def finish(t: pa.Table) -> pa.Table:
        n = pc.cast(t.column("n"), pa.int64()).to_numpy(zero_copy_only=False)
        sx = pc.cast(t.column("sx"), pa.int64()).to_numpy(zero_copy_only=False)
        sy = pc.cast(t.column("sy"), pa.int64()).to_numpy(zero_copy_only=False)
        sxy = pc.cast(t.column("sxy"), pa.int64()).to_numpy(zero_copy_only=False)
        sxx = pc.cast(t.column("sxx"), pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                key_column: t.column("key"),
                "n": pa.array(n),
                "sx": pa.array(sx),
                "sy": pa.array(sy),
                "sxy": pa.array(sxy),
                "sxx": pa.array(sxx),
                "slope_num": pa.array(n * sxy - sx * sy),
                "slope_den": pa.array(n * sxx - sx * sx),
            }
        )

    return (
        ds.map_batches(moments, batch_format="pyarrow")
        .groupby("key")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("sx", alias_name="sx"),
            Sum("sy", alias_name="sy"),
            Sum("sxy", alias_name="sxy"),
            Sum("sxx", alias_name="sxx"),
        )
        .map_batches(finish, batch_format="pyarrow")
    )


def ks_statistic(
    ds_a: "ray.data.Dataset",
    ds_b: "ray.data.Dataset",
    value_column: str,
) -> pa.Table:
    """Two-sample Kolmogorov–Smirnov statistic — the CONTINUOUS drift
    test next to :func:`psi_categories`' categorical one — as an exact
    rational: D = ks_num / ks_den = max_v |F_a(v) − F_b(v)| with the
    empirical CDFs put over the common denominator n_a·n_b, so

        ks_num = max over distinct values of |cum_a(v)·n_b − cum_b(v)·n_a|

    is an exact int64 max (engine-exact against a window-cumsum SQL
    mirror; the caller divides). One per-value count combiner per side,
    then a sorted walk over the merged distinct-value table — bounded by
    distinct values (quantize a fine-grained measure upstream, the AUC
    reduction class). Output one row: (n_a, n_b, ks_num, ks_den)."""
    import numpy as np
    import pandas as pd

    from ray.data.aggregate import Sum

    def counts(ds):
        def partial(b: pa.Table) -> pa.Table:
            df = pd.DataFrame(
                {"v": b.column(value_column).to_numpy(zero_copy_only=False)}
            )
            g = df.groupby("v", as_index=False).size().rename(columns={"size": "c"})
            return pa.Table.from_pandas(g, preserve_index=False)

        rows = (
            ds.map_batches(partial, batch_format="pyarrow")
            .groupby("v")
            .aggregate(Sum("c", alias_name="c"))
            .to_pandas()  # bounded: distinct values
        )
        return rows.sort_values("v", ignore_index=True)

    ca, cb = counts(ds_a), counts(ds_b)
    va = ca["v"].to_numpy()
    vb = cb["v"].to_numpy()
    na = int(ca["c"].sum())
    nb = int(cb["c"].sum())
    allv = np.union1d(va, vb)
    cum_a = np.zeros(len(allv), np.int64)
    cum_b = np.zeros(len(allv), np.int64)
    cum_a[np.searchsorted(allv, va)] = ca["c"].to_numpy(np.int64)
    cum_b[np.searchsorted(allv, vb)] = cb["c"].to_numpy(np.int64)
    cum_a = cum_a.cumsum()
    cum_b = cum_b.cumsum()
    ks_num = int(np.abs(cum_a * nb - cum_b * na).max()) if len(allv) else 0
    return pa.table(
        {
            "n_a": pa.array([na], pa.int64()),
            "n_b": pa.array([nb], pa.int64()),
            "ks_num": pa.array([ks_num], pa.int64()),
            "ks_den": pa.array([na * nb], pa.int64()),
        }
    )


def grouped_quantiles_multi(
    ds: "ray.data.Dataset",
    key_column: str,
    value_column: str,
    qs: list[float] = (0.5, 0.95, 0.99),
    n_buckets: int = 256,
) -> "ray.data.Dataset":
    """The SLO report: SEVERAL discrete quantiles per key from ONE
    shuffle and one sort — p50/p95/p99 latency tables without paying the
    :func:`grouped_quantile_disc` pipeline once per q. Element semantics
    pinned to DuckDB's ``quantile_disc``: the element at 0-based sorted
    index ``ceil(q·n) − 1`` (the smallest element whose CDF reaches q —
    NOT floor((n−1)·q); the two differ for high q, measured). One output
    column ``q{percent}`` per requested quantile plus the group size.
    One bucketed shuffle; per bucket one lexsort, then every quantile is
    a fancy-index into the same sorted runs."""
    import numpy as np
    import pandas as pd

    def bucketize(b: pa.Table) -> pa.Table:
        vals = b.column(key_column).to_numpy(zero_copy_only=False)
        bkt = (pd.util.hash_array(vals) % n_buckets).astype(np.int32)
        return b.append_column("__qbkt", pa.array(bkt))

    names = [f"q{int(round(q * 100))}" for q in qs]

    def quantiles(g: pa.Table) -> pa.Table:
        keys = g.column(key_column).to_numpy(zero_copy_only=False)
        codes, _ = pd.factorize(keys)
        vals = g.column(value_column).to_numpy(zero_copy_only=False)
        order = np.lexsort((vals, codes))
        s_codes = codes[order]
        n = len(order)
        new_run = np.concatenate(([True], s_codes[1:] != s_codes[:-1]))
        starts = np.nonzero(new_run)[0]
        lengths = np.diff(np.append(starts, n))
        heads = order[starts]
        data = {
            key_column: pa.compute.take(g.column(key_column), pa.array(heads)),
            "n": pa.array(lengths.astype(np.int64)),
        }
        for q, name in zip(qs, names):
            idx = np.maximum(np.ceil(lengths * q).astype(np.int64) - 1, 0)
            pick = starts + idx
            data[name] = pa.compute.take(g.column(value_column), pa.array(order[pick]))
        return pa.table(data)

    return (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("__qbkt")
        .map_groups(quantiles, batch_format="pyarrow")
    )


def pairwise_set_jaccard(
    ds: "ray.data.Dataset",
    set_column: str,
    item_column: str,
) -> "ray.data.Dataset":
    """EXACT Jaccard similarity between every pair of named sets over a
    (set, item) membership table — corpus-overlap auditing (how much do
    two sources share a vocabulary / url space / user base) when the
    number of SETS is small while items are unbounded (the transpose of
    doc-pair similarity: MinHash estimates; this is exact because it
    never materializes per-set item lists, only per-item set
    combinations). jaccard = inter / (size_a + size_b − inter), shipped
    as exact integers (caller divides).

    Shape: distinct-(set, item) combiner → per-item set-combination rows
    (items seen by k sets emit C(k, 2) pair partials — bounded by
    C(n_sets, 2) per item) → one tiny pair groupby + a bounded set-size
    table broadcast into the finish map. Output: (set_a, set_b, inter,
    size_a, size_b)."""
    import numpy as np
    import pandas as pd

    from ray.data.aggregate import Sum

    def distinct_partial(b: pa.Table) -> pa.Table:
        df = b.select([set_column, item_column]).to_pandas().drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    gi = (
        ds.map_batches(distinct_partial, batch_format="pyarrow")
        .groupby([set_column, item_column])
        .count()
        .drop_columns(["count()"])
        .materialize()
    )
    sizes = {
        r[set_column]: int(r["count()"])
        for r in gi.groupby(set_column).count().take_all()  # bounded: sets
    }

    def pair_partial(b: pa.Table) -> pa.Table:
        # size-batched triu gather (the wedge-emission pattern): one
        # gather per distinct per-item set count, never a per-item loop
        items = np.asarray(b.column(item_column).to_pylist(), object)
        ss = np.asarray(b.column(set_column).to_pylist(), object)
        icodes, _ = pd.factorize(items)
        order = np.lexsort((ss, icodes))
        ic, sv = icodes[order], ss[order]
        new = np.empty(len(ic), bool)
        if len(ic):
            new[0] = True
            new[1:] = ic[1:] != ic[:-1]
        starts = np.flatnonzero(new)
        ks = np.diff(np.append(starts, len(ic)))
        out_a, out_b = [], []
        for k in np.unique(ks):
            if k < 2:
                continue
            iu, ju = np.triu_indices(int(k), 1)
            s_k = starts[ks == k]
            out_a.append(sv[(s_k[:, None] + iu[None, :]).ravel()])
            out_b.append(sv[(s_k[:, None] + ju[None, :]).ravel()])
        if not out_a:
            return pa.table(
                {
                    "set_a": pa.array([], pa.string()),
                    "set_b": pa.array([], pa.string()),
                    "c": pa.array([], pa.int64()),
                }
            )
        out = pd.DataFrame(
            {
                "set_a": np.concatenate(out_a),
                "set_b": np.concatenate(out_b),
                "c": 1,
            }
        )
        g = out.groupby(["set_a", "set_b"], as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    def finish(t: pa.Table) -> pa.Table:
        a = np.asarray(t.column("set_a").to_pylist(), object)
        b = np.asarray(t.column("set_b").to_pylist(), object)
        return pa.table(
            {
                "set_a": t.column("set_a"),
                "set_b": t.column("set_b"),
                "inter": pc.cast(t.column("c"), pa.int64()),
                "size_a": pa.array([sizes[x] for x in a], pa.int64()),
                "size_b": pa.array([sizes[x] for x in b], pa.int64()),
            }
        )

    from dedupe_ray.blocking import N_BUCKETS

    def bucketize(b: pa.Table) -> pa.Table:
        return b.append_column(
            "__sjbkt", _bucket_hash_col(b.column(item_column), N_BUCKETS)
        )

    return (
        gi.map_batches(bucketize, batch_format="pyarrow")
        .groupby("__sjbkt")  # co-locates every membership of an item
        .map_groups(pair_partial, batch_format="pyarrow")
        .groupby(["set_a", "set_b"])
        .aggregate(Sum("c", alias_name="c"))
        .map_batches(finish, batch_format="pyarrow")
    )


def grouped_autocorr_moments(
    ds: "ray.data.Dataset",
    key_column: str,
    value_column: str,
    order_columns: list[str],
    lag: int = 1,
    cents: int = 100,
    n_buckets: int = 256,
) -> "ray.data.Dataset":
    """Per-key lag-``lag`` autocorrelation SUFFICIENT STATISTICS in exact
    int64 (the time-series drift/seasonality primitive): values quantize
    to cents once, every ordered pair (x_i, x_{i+lag}) within a key
    contributes to (n_pairs, sx, sy, sxx, syy, sxy), and the caller
    divides — Pearson-on-lagged-pairs r = (n·sxy − sx·sy) /
    sqrt((n·sxx − sx²)(n·syy − sy²)), the tpch_q14 num/den doctrine (a
    cross-engine float division would hash-drift; the integer moments
    cannot). Keys with fewer than lag+1 rows emit nothing; null keys and
    null values are dropped (SQL aggregate semantics, pinned).

    ONE bucketed shuffle of (key, order, value) rows; per bucket the rows
    lexsort to contiguous key runs and the lag-pair mask plus five
    bincount reductions are fully vectorized — no per-key Python.
    """
    import numpy as np
    import pandas as pd

    lag = int(lag)
    if lag < 1:
        raise ValueError("lag must be >= 1")

    def bucketize(b: pa.Table) -> pa.Table:
        cols = [key_column, value_column] + list(order_columns)
        b = b.select(cols)
        mask = pc.and_(
            pc.is_valid(b.column(key_column)), pc.is_valid(b.column(value_column))
        )
        b = b.filter(mask)
        vals = b.column(key_column).to_numpy(zero_copy_only=False)
        bkt = (pd.util.hash_array(vals) % n_buckets).astype(np.int32)
        return b.append_column("__wbkt", pa.array(bkt))

    def moments(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["__wbkt"])
        keys = g.column(key_column).to_numpy(zero_copy_only=False)
        codes, uniques = pd.factorize(keys)
        sort_keys = tuple(
            g.column(c).to_numpy(zero_copy_only=False) for c in reversed(order_columns)
        ) + (codes,)
        order = np.lexsort(sort_keys)
        x = np.floor(
            g.column(value_column).to_numpy(zero_copy_only=False).astype(np.float64)
            * float(cents)
            + 0.5
        ).astype(np.int64)[order]
        s_codes = codes[order]
        if len(x) <= lag:
            m = np.zeros(0, bool)
        else:
            m = s_codes[lag:] == s_codes[:-lag]
        xv = x[:-lag][m] if len(x) > lag else x[:0]
        yv = x[lag:][m] if len(x) > lag else x[:0]
        kc = s_codes[:-lag][m] if len(x) > lag else s_codes[:0]
        nk = len(uniques)
        n_pairs = np.bincount(kc, minlength=nk).astype(np.int64)
        sx = np.bincount(kc, weights=xv, minlength=nk).astype(np.int64)
        sy = np.bincount(kc, weights=yv, minlength=nk).astype(np.int64)
        sxx = np.bincount(kc, weights=(xv * xv).astype(np.float64), minlength=nk)
        syy = np.bincount(kc, weights=(yv * yv).astype(np.float64), minlength=nk)
        sxy = np.bincount(kc, weights=(xv * yv).astype(np.float64), minlength=nk)
        keep = n_pairs > 0
        return pa.table(
            {
                key_column: pa.array(np.asarray(uniques)[keep]),
                "n_pairs": pa.array(n_pairs[keep]),
                "sx": pa.array(sx[keep]),
                "sy": pa.array(sy[keep]),
                "sxx": pa.array(sxx[keep].astype(np.int64)),
                "syy": pa.array(syy[keep].astype(np.int64)),
                "sxy": pa.array(sxy[keep].astype(np.int64)),
            }
        )

    return (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("__wbkt")
        .map_groups(moments, batch_format="pyarrow")
    )


def grouped_cusum_int(
    ds: "ray.data.Dataset",
    key_column: str,
    value_column: str,
    order_columns: list[str],
    slack_c: int = 500,
    threshold_c: int = 2000,
    cents: int = 100,
    n_buckets: int = 256,
) -> "ray.data.Dataset":
    """Per-key one-sided CUSUM changepoint detector in EXACT integer
    arithmetic (Page 1954): deviations are measured from each key's FIRST
    value (self-calibrating baseline) minus ``slack_c``; the statistic is
    ``pre_i = max(0, s_{i−1} + x_i − x_first − slack_c)``, an alarm fires
    when ``pre_i ≥ threshold_c`` and resets the carry to 0. Integer
    recurrence ⇒ bit-identical across layouts and engines; the
    recursive-CTE SQL mirror replays it row-by-row (events_ewma doctrine).

    ONE bucketed shuffle; the recurrence is sequential in TIME STEPS but
    vectorized ACROSS keys via the step-sliced gather loop (loop length =
    max events per key, a data constant). Output: (key, *order_columns,
    cusum_c, alarm) with the PRE-reset statistic and a 0/1 flag.
    """
    import numpy as np
    import pandas as pd

    k_c, h_c = int(slack_c), int(threshold_c)

    def bucketize(b: pa.Table) -> pa.Table:
        cols = [key_column, value_column] + list(order_columns)
        b = b.select(cols)
        # null keys AND null values drop (pinned — a null observation has
        # no place in the recurrence; the SQL mirror filters identically)
        b = b.filter(
            pc.and_(
                pc.is_valid(b.column(key_column)), pc.is_valid(b.column(value_column))
            )
        )
        vals = b.column(key_column).to_numpy(zero_copy_only=False)
        bkt = (pd.util.hash_array(vals) % n_buckets).astype(np.int32)
        return b.append_column("__wbkt", pa.array(bkt))

    def cusum(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["__wbkt"])
        keys = g.column(key_column).to_numpy(zero_copy_only=False)
        codes, _ = pd.factorize(keys)
        sort_keys = tuple(
            g.column(c).to_numpy(zero_copy_only=False) for c in reversed(order_columns)
        ) + (codes,)
        order = np.lexsort(sort_keys)
        x = np.floor(
            g.column(value_column).to_numpy(zero_copy_only=False).astype(np.float64)
            * float(cents)
            + 0.5
        ).astype(np.int64)[order]
        s_codes = codes[order]
        n = len(order)
        pos = np.arange(n, dtype=np.int64)
        new_run = np.concatenate(([True], s_codes[1:] != s_codes[:-1]))
        run_start = np.maximum.accumulate(np.where(new_run, pos, -1))
        d = x - x[run_start] - k_c
        pre = np.empty(n, np.int64)
        carry = np.empty(n, np.int64)
        first = pos == run_start
        pre[first] = np.maximum(0, d[first])
        carry[first] = np.where(pre[first] >= h_c, 0, pre[first])
        pos_in_run = pos - run_start
        by_step = np.argsort(pos_in_run, kind="stable")
        step_sorted = pos_in_run[by_step]
        max_step = int(pos_in_run.max()) if n else 0
        bounds = np.searchsorted(step_sorted, np.arange(1, max_step + 2))
        lo = bounds[0]
        for k in range(1, max_step + 1):
            hi = bounds[k]
            sel = by_step[lo:hi]
            lo = hi
            if not len(sel):
                break
            p = np.maximum(0, carry[sel - 1] + d[sel])
            pre[sel] = p
            carry[sel] = np.where(p >= h_c, 0, p)
        sel_arr = pa.array(order)
        data = {key_column: pc.take(g.column(key_column), sel_arr)}
        for c in order_columns:
            data[c] = pc.take(g.column(c), sel_arr)
        data["cusum_c"] = pa.array(pre)
        data["alarm"] = pa.array((pre >= h_c).astype(np.int64))
        return pa.table(data)

    return (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("__wbkt")
        .map_groups(cusum, batch_format="pyarrow")
    )


def fit_category_vocab(
    ds: "ray.data.Dataset",
    column: str,
) -> pa.Table:
    """Frequency-ordered categorical vocabulary (the label-encoding fit
    of every feature pipeline): distinct values get contiguous codes
    0..n−1 by count DESC, value ASC (deterministic ties) — frequent
    categories get small codes, so embedding tables and frequency caps
    compose downstream. One per-batch count combiner + one bounded
    groupby; the vocab itself is |distinct| rows and returns driver-side
    (cap/hash-bucket unbounded-cardinality columns upstream — the
    hashing-trick op is the spillover path). NULL is excluded (encode
    it explicitly upstream if wanted). Output: (value, n, code)."""
    import pandas as pd

    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        col = b.column(column)
        t = pa.table({"value": col}).filter(pc.is_valid(col))
        g = t.group_by("value").aggregate([("value", "count")])
        return pa.table(
            {"value": g.column("value"), "n": g.column("value_count")}
        )

    vocab = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("value")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()  # bounded: one row per distinct category
    )
    vocab = vocab.sort_values(
        ["n", "value"], ascending=[False, True], ignore_index=True
    )
    vocab["code"] = pd.RangeIndex(len(vocab)).astype("int64")
    vocab["n"] = vocab["n"].astype("int64")
    return pa.Table.from_pandas(vocab, preserve_index=False)


def apply_category_vocab(
    ds: "ray.data.Dataset",
    column: str,
    vocab: pa.Table,
    out_column: str = "code",
) -> "ray.data.Dataset":
    """Broadcast-apply a :func:`fit_category_vocab` table: each row gets
    its category's code (NULL for out-of-vocabulary / NULL values —
    callers map OOV to a reserved code upstream if wanted). Zero
    shuffle: the vocab rides to every task as a plain dict (ray.put via
    closure capture), lookup is one pandas ``map`` per batch."""
    import pandas as pd

    mapping = dict(
        zip(vocab.column("value").to_pylist(), vocab.column("code").to_pylist())
    )

    def apply(b: pa.Table) -> pa.Table:
        codes = [mapping.get(v) for v in b.column(column).to_pylist()]
        return b.append_column(out_column, pa.array(codes, pa.int64()))

    return ds.map_batches(apply, batch_format="pyarrow")


def target_encode(
    ds: "ray.data.Dataset",
    category_column: str,
    target_column: str,
    smoothing: int = 20,
) -> pa.Table:
    """Smoothed target encoding (the leakage-prone-but-standard
    categorical feature; Micci-Barreca 2001) in EXACT integer
    micro-units: with global target sum/count (GS, GN) and per-category
    (sum_c, n_c),

        enc_micro(c) = ⌊ 10⁶ · (sum_c·GN + k·GS) / (GN · (n_c + k)) ⌋

    — the Bayesian-smoothed mean pulled toward the global mean by
    pseudo-count ``k``, computed with arbitrary-precision ints in the
    bounded finisher (the lineitem_corr doctrine) so a HUGEINT SQL
    mirror is bit-exact. Targets must be NON-NEGATIVE int64 (shift
    upstream; the encoding is affine in the shift) — pinned so the
    floor-division agrees with SQL truncation. One count combiner, no
    corpus shuffle. Output: (category, n, sum_t, enc_micro) — |distinct
    categories| rows."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        import numpy as np
        import pandas as pd

        t = b.column(target_column).to_numpy(zero_copy_only=False).astype(np.int64)
        if len(t) and t.min() < 0:
            raise ValueError("target_encode targets must be non-negative")
        df = pd.DataFrame(
            {
                "category": b.column(category_column).to_pylist(),
                "n": np.ones(len(t), np.int64),
                "sum_t": t,
            }
        )
        return pa.Table.from_pandas(
            df.groupby("category", as_index=False).sum(), preserve_index=False
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("category")
        .aggregate(Sum("n", alias_name="n"), Sum("sum_t", alias_name="sum_t"))
        .to_pandas()  # bounded: one row per distinct category
    )
    gn = int(agg["n"].sum())
    gs = int(agg["sum_t"].sum())
    k = int(smoothing)
    enc = [
        (10**6 * (int(s) * gn + k * gs)) // (gn * (int(n) + k))
        for n, s in zip(agg["n"], agg["sum_t"])
    ]
    return pa.table(
        {
            "category": pa.array(agg["category"].tolist()),
            "n": pa.array(agg["n"].astype("int64")),
            "sum_t": pa.array(agg["sum_t"].astype("int64")),
            "enc_micro": pa.array(enc, pa.int64()),
        }
    )


def woe_table(
    ds: "ray.data.Dataset",
    category_column: str,
    label_column: str,
) -> pa.Table:
    """Weight of evidence per category (the credit-scoring/feature-
    screening companion of :func:`target_encode` for BINARY targets):

        woe_micro(c) = ⌊10⁶ · ln( (pos_c·B) / (neg_c·G) )⌋

    with G/B the global positive/negative totals — computed as the
    IDENTICAL chain on both engines (int64 products → double → divide →
    ln → ×10⁶ → floor; the count-ratio ln agreement class of
    lang_source_mi, NOT the hash-float class). Categories with zero
    positives or zero negatives are DROPPED (WoE is undefined there;
    pinned — smooth upstream if you need them). Information Value =
    Σ (pos_c/G − neg_c/B)·woe follows from the emitted exact counts.
    One count combiner, no corpus shuffle. Output: (category, pos, neg,
    woe_micro) — |distinct categories| rows."""
    import numpy as np
    import pandas as pd

    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        y = b.column(label_column).to_numpy(zero_copy_only=False).astype(np.int64)
        if len(y) and (y.min() < 0 or y.max() > 1):
            raise ValueError(f"{label_column} must be binary 0/1")
        df = pd.DataFrame(
            {
                "category": b.column(category_column).to_pylist(),
                "pos": y,
                "neg": 1 - y,
            }
        )
        return pa.Table.from_pandas(
            df.groupby("category", as_index=False).sum(), preserve_index=False
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("category")
        .aggregate(Sum("pos", alias_name="pos"), Sum("neg", alias_name="neg"))
        .to_pandas()  # bounded: one row per distinct category
    )
    gp = int(agg["pos"].sum())
    gb = int(agg["neg"].sum())
    pos = agg["pos"].to_numpy(np.int64)
    neg = agg["neg"].to_numpy(np.int64)
    keep = (pos > 0) & (neg > 0)
    woe = np.floor(
        1_000_000.0
        * np.log(
            (pos[keep] * gb).astype(np.float64)
            / (neg[keep] * gp).astype(np.float64)
        )
    ).astype(np.int64)
    return pa.table(
        {
            "category": pa.array(agg["category"][keep].tolist()),
            "pos": pa.array(pos[keep]),
            "neg": pa.array(neg[keep]),
            "woe_micro": pa.array(woe),
        }
    )


def top_n_with_others(
    ds: "ray.data.Dataset",
    key_column: str,
    value_column: str,
    n: int,
    others_label: str = "OTHER",
) -> pa.Table:
    """Top-N groups by total value plus one aggregated ``OTHER`` row —
    the BI reporting shape (top nations + rest, top domains + tail):
    per-key exact int64 totals from one combiner groupby, rank by
    (total DESC, key ASC) driver-side over the bounded key table, tail
    keys collapse into one row. ``n_keys`` on the OTHER row records how
    many groups it absorbed (silent-truncation accounting — the
    no-silent-caps doctrine). Keys are stringified in the output so the
    OTHER label coexists with any key type. Output: (key, total,
    n_keys), top-N rows first in rank order."""
    import pandas as pd

    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        import numpy as np

        df = pd.DataFrame(
            {
                "key": b.column(key_column).to_pylist(),
                "total": b.column(value_column)
                .to_numpy(zero_copy_only=False)
                .astype(np.int64),
            }
        )
        return pa.Table.from_pandas(
            df.groupby("key", as_index=False).sum(), preserve_index=False
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("key")
        .aggregate(Sum("total", alias_name="total"))
        .to_pandas()  # bounded: one row per distinct key
    )
    agg["key"] = agg["key"].astype(str)
    agg = agg.sort_values(
        ["total", "key"], ascending=[False, True], ignore_index=True
    )
    top = agg.iloc[:n]
    rest = agg.iloc[n:]
    keys = top["key"].tolist()
    totals = [int(v) for v in top["total"]]
    nk = [1] * len(top)
    if len(rest):
        keys.append(others_label)
        totals.append(int(rest["total"].sum()))
        nk.append(int(len(rest)))
    return pa.table(
        {
            "key": pa.array(keys, pa.string()),
            "total": pa.array(totals, pa.int64()),
            "n_keys": pa.array(nk, pa.int64()),
        }
    )


def grouped_gini_mean_difference(
    ds: "ray.data.Dataset",
    key_column: str,
    value_column: str,
) -> "ray.data.Dataset":
    """Gini mean difference per key — the pairwise dispersion statistic
    Σ_{i<j} |v_i − v_j| over an INTEGER value column, WITHOUT
    enumerating pairs: on the sorted values the identity

        Σ_{i<j} |v_i − v_j| = Σ_k (2k − n + 1) · v_(k)     (k 0-based)

    turns the O(n²) sum into one sort + one weighted dot per key, so
    the exact int64 numerator ships with n and the caller divides by
    C(n,2) (num/den doctrine; GMD/2·mean is the Gini coefficient). A
    brute-force pair self-join oracle pins it. One bucketed key
    shuffle, run-sliced vectorized weights — no per-key loop. Keys
    with n < 2 are dropped. Output: (key, n, sum_abs_diff)."""
    import numpy as np

    from dedupe_ray.blocking import N_BUCKETS

    def bucketize(b: pa.Table) -> pa.Table:
        return b.append_column(
            "__gbkt", _bucket_hash_col(b.column(key_column), N_BUCKETS)
        )

    sort_keys = [(key_column, "ascending"), (value_column, "ascending")]

    def per_bucket(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                key_column: pa.array([], group.schema.field(key_column).type),
                "n": pa.array([], pa.int64()),
                "sum_abs_diff": pa.array([], pa.int64()),
            }
        )
        if len(group) == 0:
            return empty
        g = group.take(pc.sort_indices(group, sort_keys=sort_keys))
        keys = np.asarray(g.column(key_column).to_pylist(), object)
        v = g.column(value_column).to_numpy(zero_copy_only=False).astype(np.int64)
        m = len(g)
        new_key = np.empty(m, bool)
        new_key[0] = True
        new_key[1:] = keys[1:] != keys[:-1]
        pos = np.arange(m, dtype=np.int64)
        run_start = np.maximum.accumulate(np.where(new_key, pos, -1))
        starts = np.flatnonzero(new_key)
        lens = np.diff(np.append(starts, m))
        pos_in_run = pos - run_start
        w = 2 * pos_in_run - np.repeat(lens - 1, lens)
        contrib = w * v
        sums = np.add.reduceat(contrib, starts)
        keep = lens >= 2
        if not keep.any():
            return empty
        return pa.table(
            {
                key_column: pa.array(
                    keys[starts[keep]], group.schema.field(key_column).type
                ),
                "n": pa.array(lens[keep]),
                "sum_abs_diff": pa.array(sums[keep]),
            }
        )

    return (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("__gbkt")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


def grouped_median_gap(
    ds: "ray.data.Dataset",
    key_column: str,
    t_column: str,
    tiebreak_column: str,
) -> "ray.data.Dataset":
    """Lower-median inter-arrival gap per key — the burstiness /
    health-cadence statistic (heartbeat monitors, user-activity
    rhythm): consecutive gaps in (t, tiebreak) order, then the
    positional lower median (row (n+1)//2 of the sorted gap multiset,
    exact on int64 timestamps — no interpolation, engine-exact). Keys
    with fewer than two events are dropped. One bucketed key shuffle;
    gaps and the per-run median both resolve with run-sliced numpy
    (two lexsorts, no per-key loop). Output: (key, n_gaps,
    median_gap)."""
    import numpy as np

    from dedupe_ray.blocking import N_BUCKETS

    def bucketize(b: pa.Table) -> pa.Table:
        return b.append_column(
            "__mgbkt", _bucket_hash_col(b.column(key_column), N_BUCKETS)
        )

    sort_keys = [
        (key_column, "ascending"),
        (t_column, "ascending"),
        (tiebreak_column, "ascending"),
    ]

    def per_bucket(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                key_column: pa.array([], group.schema.field(key_column).type),
                "n_gaps": pa.array([], pa.int64()),
                "median_gap": pa.array([], pa.int64()),
            }
        )
        if len(group) == 0:
            return empty
        g = group.take(pc.sort_indices(group, sort_keys=sort_keys))
        keys = np.asarray(g.column(key_column).to_pylist(), object)
        t = g.column(t_column).to_numpy(zero_copy_only=False).astype(np.int64)
        m = len(g)
        new_key = np.empty(m, bool)
        new_key[0] = True
        new_key[1:] = keys[1:] != keys[:-1]
        run_id = np.cumsum(new_key) - 1
        gaps = t[1:] - t[:-1]
        keep = ~new_key[1:]  # gap rows stay within one key
        gaps = gaps[keep]
        grun = run_id[1:][keep]
        if not len(gaps):
            return empty
        order = np.lexsort((gaps, grun))
        sg = gaps[order]
        sr = grun[order]
        heads = np.concatenate(([True], sr[1:] != sr[:-1]))
        starts = np.flatnonzero(heads)
        lens = np.diff(np.append(starts, len(sg)))
        med = sg[starts + (lens + 1) // 2 - 1]
        head_keys = keys[np.flatnonzero(new_key)]  # per run_id
        return pa.table(
            {
                key_column: pa.array(
                    head_keys[sr[starts]], group.schema.field(key_column).type
                ),
                "n_gaps": pa.array(lens),
                "median_gap": pa.array(med),
            }
        )

    return (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("__mgbkt")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


def shuffle_skew_report(
    ds: "ray.data.Dataset",
    key_column: str,
    n_buckets: int = 256,
) -> pa.Table:
    """Pre-shuffle skew audit: row counts per hash bucket for a
    prospective shuffle key — the planning probe that prices a
    `groupby(key)` BEFORE running it (a bucket holding 30% of the rows
    means a straggler; salt or pre-aggregate first). Uses the SAME
    pd.util.hash_array bucketing as the engine's bucketed joins/windows,
    so the report reflects the actual placement. One combiner pass +
    one n_buckets-bounded groupby; summary row columns carry max/mean
    occupancy in exact integer rows. Output: (bucket, rows) for
    non-empty buckets plus ``max_rows``/``total_rows``/``n_nonempty``
    repeated on every row (bounded table — callers read the first)."""
    import numpy as np
    import pandas as pd

    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        vals = b.column(key_column).to_numpy(zero_copy_only=False)
        bkt = (pd.util.hash_array(vals) % n_buckets).astype(np.int64)
        u, c = np.unique(bkt, return_counts=True)
        return pa.table(
            {"bucket": pa.array(u), "rows": pa.array(c.astype(np.int64))}
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Sum("rows", alias_name="rows"))
        .to_pandas()  # bounded: <= n_buckets rows
        .sort_values("bucket", ignore_index=True)
    )
    mx = int(agg["rows"].max()) if len(agg) else 0
    tot = int(agg["rows"].sum()) if len(agg) else 0
    return pa.table(
        {
            "bucket": pa.array(agg["bucket"].astype("int64")),
            "rows": pa.array(agg["rows"].astype("int64")),
            "max_rows": pa.array([mx] * len(agg), pa.int64()),
            "total_rows": pa.array([tot] * len(agg), pa.int64()),
            "n_nonempty": pa.array([len(agg)] * len(agg), pa.int64()),
        }
    )


def column_entropy_profile(
    ds: "ray.data.Dataset",
    columns: list[str],
) -> pa.Table:
    """Per-column value-distribution entropy in integer micro-nats —
    the blocking-key selection heuristic (a high-entropy column splits
    a corpus into many small blocks; a low-entropy one creates hot
    blocks) and the categorical-profiling complement of
    profile_columns:

        H_micro(col) = Σ over distinct values v of
                       cnt_v · ⌊10⁶ · ln(n / cnt_v)⌋

    (the count-ratio ln agreement class — engine-exact). NULLs count
    as one value. Meant for CATEGORICAL columns: the per-column
    distinct-value table must be bounded (hash-bucket or truncate
    free-text upstream). One per-batch (column, value) count combiner
    + one groupby; finisher is bounded by Σ distinct values. Output:
    (column, n, n_distinct, entropy_micro)."""
    import numpy as np
    import pandas as pd

    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        frames = []
        for c in columns:
            vals = [
                "\x00null" if v is None else str(v)
                for v in b.column(c).to_pylist()
            ]
            df = pd.DataFrame({"col": c, "value": vals})
            g = df.groupby(["col", "value"], as_index=False).size()
            frames.append(g.rename(columns={"size": "cnt"}))
        out = pd.concat(frames, ignore_index=True)
        out["cnt"] = out["cnt"].astype("int64")
        return pa.Table.from_pandas(out, preserve_index=False)

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["col", "value"])
        .aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()  # bounded: distinct (column, value) pairs
    )
    rows = []
    for c in columns:
        sub = agg[agg["col"] == c]
        cnt = sub["cnt"].to_numpy(np.int64)
        n = int(cnt.sum())
        h = int(
            (cnt * np.floor(1e6 * np.log(n / cnt)).astype(np.int64)).sum()
        ) if n else 0
        rows.append((c, n, int(len(sub)), h))
    return pa.table(
        {
            "column": pa.array([r[0] for r in rows], pa.string()),
            "n": pa.array([r[1] for r in rows], pa.int64()),
            "n_distinct": pa.array([r[2] for r in rows], pa.int64()),
            "entropy_micro": pa.array([r[3] for r in rows], pa.int64()),
        }
    )


def grouped_mad_outliers(
    ds: "ray.data.Dataset",
    key_column: str,
    value_column: str,
    k: int = 3,
    flag_column: str = "is_outlier",
) -> "ray.data.Dataset":
    """Per-group robust outlier gate on INTEGER values: flag rows with

        |v − median_g| > k · MAD_g

    where both the group median and the MAD (median absolute deviation)
    are POSITIONAL lower medians — exact int64 elements, no
    interpolation, so a row_number SQL mirror hash-matches (the
    breakdown-resistant complement of the mean/std z-score gate; a
    MAD of 0 flags ANY deviation — standard and pinned, matching
    events_hampel). One bucketed key shuffle; two run-sliced sorts per
    bucket (values, then deviations), flags gathered back to every
    original row. Output: original columns + (flag int64)."""
    import numpy as np

    from dedupe_ray.blocking import N_BUCKETS

    def bucketize(b: pa.Table) -> pa.Table:
        return b.append_column(
            "__obkt", _bucket_hash_col(b.column(key_column), N_BUCKETS)
        )

    def per_bucket(group: pa.Table) -> pa.Table:
        group = group.drop_columns(["__obkt"])
        if len(group) == 0:
            return group.append_column(flag_column, pa.array([], pa.int64()))
        keys = np.asarray(group.column(key_column).to_pylist(), object)
        v = group.column(value_column).to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        m = len(group)
        codes_order = np.argsort(keys, kind="stable")
        # run layout over key-sorted rows
        sk = keys[codes_order]
        new_key = np.empty(m, bool)
        new_key[0] = True
        new_key[1:] = sk[1:] != sk[:-1]
        run_id_sorted = np.cumsum(new_key) - 1
        run_id = np.empty(m, np.int64)
        run_id[codes_order] = run_id_sorted
        starts = np.flatnonzero(new_key)
        lens = np.diff(np.append(starts, m))

        def run_median(vals: np.ndarray) -> np.ndarray:
            order = np.lexsort((vals, run_id))
            sv = vals[order]
            med_idx = starts + (lens + 1) // 2 - 1
            return sv[med_idx]  # one lower median per run

        med = run_median(v)  # [n_runs]
        dev = np.abs(v - med[run_id])
        mad = run_median(dev)
        flag = (dev > k * mad[run_id]).astype(np.int64)
        return group.append_column(flag_column, pa.array(flag))

    return (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("__obkt")
        .map_groups(per_bucket, batch_format="pyarrow")
    )
