"""Distributed cardinality sketches.

HyperLogLog (Flajolet, Fusy, Gandouet, Meunier 2007 — public algorithm)
as a Ray Data aggregation: per-batch vectorized register partials shrink
the shuffle to ≤(groups × 2^p) sparse rows, a groupby-max merges them
(register max is associative/commutative — the canonical distributed
sketch merge), and a tiny per-group finalize produces the estimate.
Deterministic: values are hashed with pandas' fixed-key siphash
(cross-process stable), so the estimate is a pure function of the value
set — parallelism- and partitioning-invariant.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

_M1 = np.uint64(0x5555555555555555)
_M2 = np.uint64(0x3333333333333333)
_M4 = np.uint64(0x0F0F0F0F0F0F0F0F)
_H01 = np.uint64(0x0101010101010101)


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized SWAR popcount for uint64 (numpy<2 has no bitwise_count)."""
    x = x - ((x >> np.uint64(1)) & _M1)
    x = (x & _M2) + ((x >> np.uint64(2)) & _M2)
    x = (x + (x >> np.uint64(4))) & _M4
    return ((x * _H01) >> np.uint64(56)).astype(np.int64)


def _leading_zeros64(x: np.ndarray) -> np.ndarray:
    """Vectorized count-leading-zeros via OR-propagation + popcount."""
    x = x.copy()
    for s in (1, 2, 4, 8, 16, 32):
        x |= x >> np.uint64(s)
    return 64 - _popcount64(x)


def hll_ranks(values: np.ndarray, precision: int) -> tuple[np.ndarray, np.ndarray]:
    """(register index, rank) per value: index = top ``precision`` hash
    bits, rank = 1 + leading zeros of the remaining bits (capped at
    65 - precision)."""
    h = pd.util.hash_array(values).astype(np.uint64)
    idx = (h >> np.uint64(64 - precision)).astype(np.int32)
    rest = (h << np.uint64(precision)).astype(np.uint64)
    rank = np.minimum(_leading_zeros64(rest) + 1, 65 - precision).astype(np.int8)
    return idx, rank


def hll_estimate(registers: np.ndarray) -> float:
    """Classic HLL estimator with the small-range (linear counting)
    correction; no large-range correction is needed with 64-bit hashes."""
    m = len(registers)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-registers.astype(np.float64)))
    zeros = int(np.count_nonzero(registers == 0))
    if est <= 2.5 * m and zeros > 0:
        est = m * np.log(m / zeros)
    return float(est)


def hll_sketch_table(
    ds: "ray.data.Dataset",
    group_column: str,
    value_column: str,
    precision: int = 12,
) -> "ray.data.Dataset":
    """Per-group HLL sketch as a sparse (group, reg, rank) TABLE — the
    mergeable, persistable form: ``write_parquet`` it after each
    ingestion batch and :func:`hll_merge` yesterday's sketch with
    today's — distinct counts over the union of any number of runs
    without ever re-reading their raw values.

    Shape: map_batches partial (hash + per-batch (group, register) max —
    ≤ groups×2^p rows per batch regardless of batch size) → groupby
    (group, register) Max — the sketch merge.
    """
    from ray.data.aggregate import Max

    def partials(batch: pa.Table) -> pa.Table:
        vals = batch.column(value_column).to_numpy(zero_copy_only=False)
        groups = batch.column(group_column).to_numpy(zero_copy_only=False)
        idx, rank = hll_ranks(vals, precision)
        gcodes, guniques = pd.factorize(groups)
        key = gcodes.astype(np.int64) * (1 << precision) + idx
        order = np.lexsort((rank, key))
        k_sorted, r_sorted = key[order], rank.astype(np.int64)[order]
        last = np.concatenate((k_sorted[1:] != k_sorted[:-1], [True]))
        kk, rr = k_sorted[last], r_sorted[last]  # per-(group,reg) max rank
        return pa.table(
            {
                group_column: pa.array(np.asarray(guniques)[kk >> precision]),
                "reg": pa.array((kk & ((1 << precision) - 1)).astype(np.int32)),
                "rank": pa.array(rr),
            }
        )

    return (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby([group_column, "reg"])
        .aggregate(Max("rank", alias_name="rank"))
    )


def hll_merge(
    *sketches: "ray.data.Dataset", group_column: str = "group"
) -> "ray.data.Dataset":
    """Merge any number of sparse HLL sketch tables (same group column
    and precision): union → (group, reg) Max. Register max is the exact
    HLL union — merging sketches of two corpora equals sketching their
    concatenation."""
    from ray.data.aggregate import Max

    if not sketches:
        raise ValueError("need at least one sketch table")
    ds = sketches[0]
    for other in sketches[1:]:
        ds = ds.union(other)
    return (
        ds.groupby([group_column, "reg"]).aggregate(Max("rank", alias_name="rank"))
    )


def hll_finalize(
    sketch_ds: "ray.data.Dataset",
    group_column: str,
    precision: int = 12,
    out_column: str = "approx_distinct",
) -> "ray.data.Dataset":
    """Sparse sketch table → per-group approximate distinct counts."""

    def finalize(g: pa.Table) -> pa.Table:
        regs = np.zeros(1 << precision, np.int64)
        regs[g.column("reg").to_numpy(zero_copy_only=False)] = g.column(
            "rank"
        ).to_numpy(zero_copy_only=False)
        est = hll_estimate(regs)
        return pa.table(
            {
                group_column: g.column(group_column).slice(0, 1),
                out_column: pa.array([int(round(est))], pa.int64()),
            }
        )

    return sketch_ds.groupby(group_column).map_groups(
        finalize, batch_format="pyarrow"
    )


def hll_approx_distinct(
    ds: "ray.data.Dataset",
    group_column: str,
    value_column: str,
    precision: int = 12,
    out_column: str = "approx_distinct",
) -> "ray.data.Dataset":
    """Approximate COUNT(DISTINCT value) per group at ~1.04/√(2^p) relative
    error (~1.6% at p=12) in constant memory per group — the scale path
    where an exact distinct would shuffle every value. Composition of
    :func:`hll_sketch_table` (mergeable/persistable sparse sketch) and
    :func:`hll_finalize`."""
    return hll_finalize(
        hll_sketch_table(ds, group_column, value_column, precision),
        group_column,
        precision,
        out_column,
    )


# ---------------------------------------------------------------------------
# Heavy hitters (Misra–Gries / mergeable truncated-counts summary)
# ---------------------------------------------------------------------------


def heavy_hitters(
    ds: "ray.data.Dataset",
    column: str,
    k: int = 10,
    capacity: int = 256,
) -> tuple[pa.Table, int]:
    """Top-``k`` most frequent values of ``column`` with lower-bound counts
    and a global error bound — the Misra–Gries frequency summary (Misra &
    Gries 1982) in its mergeable form (Agarwal et al. 2013, "Mergeable
    Summaries"), shaped for Ray Data:

    1. per-BATCH combiner: exact vectorized value counts, truncated to the
       ``capacity`` most frequent (ties broken by value for determinism);
       the batch's max dropped count rides along as the partial's error
       contribution (0 when the batch has ≤ capacity distinct values),
    2. a groupby("value") SUM over the partials — the shuffle carries at
       most n_batches × capacity rows regardless of corpus size,
    3. a tiny driver top-k on the summed lower bounds.

    Guarantee: for every value, ``true − est ≤ err`` where ``err`` is the
    returned sum of per-batch max-dropped counts, itself ≤ N/(capacity+1)
    (the (capacity+1)-th largest count in a batch of n rows is ≤
    n/(capacity+1)). When every batch sees ≤ ``capacity`` distinct values
    the result is EXACT (err == 0) — the regime the DuckDB oracle pins.

    Returns ``(table(value, n), err)`` with rows ordered by n desc then
    value asc — deterministic at any parallelism."""
    import pyarrow.compute as pc

    def partial(batch: pa.Table) -> pa.Table:
        col = batch.column(column)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        vc = col.cast(pa.string()).fill_null("\x00null").value_counts()
        vals = vc.field("values")
        cnts = vc.field("counts").to_numpy(zero_copy_only=False)
        if len(vals) > capacity:
            import numpy as np

            order = pc.sort_indices(
                pa.table({"v": vals, "c": pa.array(cnts)}),
                sort_keys=[("c", "descending"), ("v", "ascending")],
            ).to_numpy(zero_copy_only=False)
            keep = order[:capacity]
            dropped_max = int(cnts[order[capacity]])
            vals = pc.take(vals, pa.array(keep))
            cnts = cnts[keep]
        else:
            dropped_max = 0
        out = pa.table(
            {
                "value": vals,
                "n": pa.array(cnts, pa.int64()),
                "err": pa.array([dropped_max] + [0] * (len(vals) - 1), pa.int64())
                if len(vals)
                else pa.array([], pa.int64()),
            }
        )
        return out

    from ray.data.aggregate import Sum

    summed = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("value")
        .aggregate(Sum("n", alias_name="n"), Sum("err", alias_name="err"))
    )
    merged = pa.Table.from_pandas(summed.to_pandas(), preserve_index=False)
    # bounded: ≤ n_batches × capacity distinct values reach the driver
    err = int(pc.sum(merged.column("err")).as_py() or 0)
    top = merged.select(["value", "n"]).sort_by(
        [("n", "descending"), ("value", "ascending")]
    )
    return top.slice(0, k), err
