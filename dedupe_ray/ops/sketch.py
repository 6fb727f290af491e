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
    correction; no large-range correction is needed with 64-bit hashes.

    The harmonic sum is computed in EXACT integer arithmetic
    (Σ 2^-reg = Σ 2^(53-reg) / 2^53; ranks are ≤ 53 by construction, so
    every term is an integer) — summation-order-invariant at any
    parallelism AND reproducible verbatim in the DuckDB oracle, unlike a
    float Σ exp2 whose last bits depend on accumulation order."""
    m = len(registers)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    s_int = int(np.sum(1 << (53 - registers.astype(np.int64)), dtype=object))
    est = alpha * m * m / (s_int / 9007199254740992.0)
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


# ---------------------------------------------------------------------------
# DDSketch — mergeable quantile sketch (Masson, Rim & Lee, VLDB 2019)
# ---------------------------------------------------------------------------
#
# Bucket function: for v > 0, bucket = ceil(ln(v) / ln(gamma)); zero and
# negative values get their own sign stores ((sign, bucket) keys). Counts
# are plain integers, so the sketch is DETERMINISTIC and merge-order-
# invariant (unlike KLL's randomized compaction — parallelism would change
# a KLL sketch's output, which this engine forbids). Relative-error
# guarantee: alpha = (gamma - 1) / (gamma + 1) for any quantile, any
# distribution. The sketch table is (sign, bucket, c) rows — persistable
# via write_parquet and mergeable by a (sign, bucket) Sum, the same
# contract as hll_sketch_table.


def dd_bucket(values: np.ndarray, gamma: float) -> tuple[np.ndarray, np.ndarray]:
    """values (float64) → (sign int64 in {-1,0,1}, bucket int64).

    ceil(ln(|v|)/ln(gamma)) evaluated with the same libm expression a SQL
    oracle evaluates (`ceil(ln(v)/ln(gamma))`), so bucket assignment is
    engine-exact."""
    v = np.asarray(values, np.float64)
    sign = np.sign(v).astype(np.int64)
    bucket = np.zeros(len(v), np.int64)
    nz = sign != 0
    with np.errstate(divide="ignore"):
        bucket[nz] = np.ceil(np.log(np.abs(v[nz])) / np.log(gamma)).astype(np.int64)
    return sign, bucket


def ddsketch_table(
    ds: "ray.data.Dataset",
    value_column: str,
    gamma: float = 1.02,
) -> "ray.data.Dataset":
    """Corpus → DDSketch bucket table (sign, bucket, c). Per-batch
    combiner partials (≤ distinct-buckets rows per batch — the bucket
    count is O(log(value range)/log(gamma)), a few hundred for any real
    metric) then one tiny groupby Sum: nothing corpus-sized shuffles.
    Null values are dropped (SQL aggregate semantics)."""
    from ray.data.aggregate import Sum

    def partials(batch: pa.Table) -> pa.Table:
        col = batch.column(value_column)
        v = col.to_numpy(zero_copy_only=False).astype(np.float64)
        keep = ~np.isnan(v)
        sign, bucket = dd_bucket(v[keep], gamma)
        key = sign * np.int64(1 << 40) + bucket  # |bucket| < 2^40 always
        ukey, cnt = np.unique(key, return_counts=True)
        return pa.table(
            {
                "sign": pa.array(
                    np.where(ukey >= (1 << 39), 1, np.where(ukey <= -(1 << 39), -1, 0))
                ),
                "bucket": pa.array(
                    ukey - np.where(ukey >= (1 << 39), 1 << 40, 0)
                    + np.where(ukey <= -(1 << 39), 1 << 40, 0)
                ),
                "c": pa.array(cnt.astype(np.int64)),
            }
        )

    return (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby(["sign", "bucket"])
        .aggregate(Sum("c", alias_name="c"))
    )


def ddsketch_merge(*sketches: "ray.data.Dataset") -> "ray.data.Dataset":
    """Union any number of DDSketch tables → one (sign, bucket) Sum.
    Merging sketches of two corpora equals sketching their concatenation
    exactly (integer counts — no approximation added by the merge)."""
    from ray.data.aggregate import Sum

    if not sketches:
        raise ValueError("need at least one sketch table")
    ds = sketches[0]
    for other in sketches[1:]:
        ds = ds.union(other)
    return ds.groupby(["sign", "bucket"]).aggregate(Sum("c", alias_name="c"))


def ddsketch_quantiles(
    sketch_ds: "ray.data.Dataset",
    qs: list[float],
    gamma: float = 1.02,
) -> pa.Table:
    """Sketch table → per-quantile (q, sign, bucket, estimate).

    Rank semantics: the value at rank ceil(q·n) (1-based, min rank 1) in
    sorted order — negatives ascend by -bucket, then zeros, then
    positives ascend by bucket (the (sign, sign·bucket) order a SQL
    oracle can mirror). ``estimate`` is the bucket midpoint
    ±2·gamma^b/(gamma+1); sign and bucket are the engine-exact outputs.
    The bucket table is bounded (O(log range)), so this reduce is
    driver-side by design."""
    t = sketch_ds.to_pandas()  # bounded: bucket-count rows, not corpus rows
    sign = t["sign"].to_numpy(np.int64)
    bucket = t["bucket"].to_numpy(np.int64)
    c = t["c"].to_numpy(np.int64)
    order = np.lexsort((sign * bucket, sign))
    sign, bucket, c = sign[order], bucket[order], c[order]
    cum = np.cumsum(c)
    n = int(cum[-1]) if len(cum) else 0
    out_q, out_s, out_b, out_e = [], [], [], []
    for q in qs:
        rank = max(int(np.ceil(q * n)), 1)
        i = int(np.searchsorted(cum, rank))
        i = min(i, len(cum) - 1)
        s, b = int(sign[i]), int(bucket[i])
        est = 0.0 if s == 0 else s * 2.0 * gamma**b / (gamma + 1.0)
        out_q.append(float(q))
        out_s.append(s)
        out_b.append(b)
        out_e.append(est)
    return pa.table(
        {
            "q": pa.array(out_q, pa.float64()),
            "sign": pa.array(out_s, pa.int64()),
            "bucket": pa.array(out_b, pa.int64()),
            "estimate": pa.array(out_e, pa.float64()),
        }
    )


def ddsketch_group_table(
    ds: "ray.data.Dataset",
    group_column: str,
    value_column: str,
    gamma: float = 1.02,
) -> "ray.data.Dataset":
    """Per-group DDSketch bucket table (group, sign, bucket, c) — same
    combiner-partial shape as :func:`ddsketch_table` with the group key
    folded into the partial, so the shuffle stays buckets×groups-sized."""
    from ray.data.aggregate import Sum

    def partials(batch: pa.Table) -> pa.Table:
        v = batch.column(value_column).to_numpy(zero_copy_only=False).astype(np.float64)
        g = batch.column(group_column).to_numpy(zero_copy_only=False)
        keep = ~np.isnan(v)
        v, g = v[keep], g[keep]
        sign, bucket = dd_bucket(v, gamma)
        gcodes, guniques = pd.factorize(g)
        # inner key biased by +2^41 so it is always positive — without the
        # bias a negative sign store would floor the group shift off by one
        inner = sign * np.int64(1 << 40) + bucket + np.int64(1 << 41)
        key = gcodes.astype(np.int64) * np.int64(1 << 42) + inner
        ukey, cnt = np.unique(key, return_counts=True)
        gi = ukey >> 42
        rem = (ukey - (gi << 42)) - np.int64(1 << 41)
        s = np.where(rem >= (1 << 39), 1, np.where(rem <= -(1 << 39), -1, 0))
        b = rem - np.where(rem >= (1 << 39), 1 << 40, 0) + np.where(
            rem <= -(1 << 39), 1 << 40, 0
        )
        return pa.table(
            {
                group_column: pa.array(np.asarray(guniques)[gi]),
                "sign": pa.array(s.astype(np.int64)),
                "bucket": pa.array(b.astype(np.int64)),
                "c": pa.array(cnt.astype(np.int64)),
            }
        )

    return (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby([group_column, "sign", "bucket"])
        .aggregate(Sum("c", alias_name="c"))
    )


def ddsketch_group_quantile(
    sketch_ds: "ray.data.Dataset",
    group_column: str,
    q: float,
    gamma: float = 1.02,
) -> "ray.data.Dataset":
    """Grouped sketch table → one (group, sign, bucket) row per group: the
    rank-ceil(q·n_group) bucket in (sign, sign·bucket) order. The per-group
    finalize is a map_groups over the (bounded) per-group bucket rows."""

    def finalize(g: pa.Table) -> pa.Table:
        sign = g.column("sign").to_numpy(zero_copy_only=False)
        bucket = g.column("bucket").to_numpy(zero_copy_only=False)
        c = g.column("c").to_numpy(zero_copy_only=False)
        order = np.lexsort((sign * bucket, sign))
        sign, bucket, c = sign[order], bucket[order], c[order]
        cum = np.cumsum(c)
        rank = max(int(np.ceil(q * int(cum[-1]))), 1)
        i = min(int(np.searchsorted(cum, rank)), len(cum) - 1)
        return pa.table(
            {
                group_column: g.column(group_column).slice(0, 1),
                "sign": pa.array([int(sign[i])], pa.int64()),
                "bucket": pa.array([int(bucket[i])], pa.int64()),
            }
        )

    return sketch_ds.groupby(group_column).map_groups(
        finalize, batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# Count-Min sketch (Cormode & Muthukrishnan 2005) — mergeable frequency table
# ---------------------------------------------------------------------------
#
# d universal hash rows h_i(v) = ((a_i·(v mod p) + b_i) mod p) mod w over the
# Mersenne prime p = 2^31 − 1 with pinned constants — every step is exact
# int64 arithmetic (a_i < 2^31 and (v mod p) < 2^31 ⇒ products < 2^62), so a
# SQL oracle evaluating the same expression lands on the same cells and the
# whole sketch is engine-exact, deterministic, and merge-order-invariant
# (integer counts, cell-wise Sum). Estimates are upper bounds:
# true ≤ est ≤ true + εN with ε = e/w at failure prob e^−d per key.

_CMS_P = (1 << 31) - 1
_CMS_A = (1103515245, 1229782938, 1815976680, 1664525, 22695477, 1566083941)
_CMS_B = (12345, 1013904223, 1442695040, 1203793, 7919, 104729)


def _cms_cols(values: np.ndarray, width: int, depth: int) -> np.ndarray:
    """values (non-negative int64 [n]) → column index int64 [depth, n]."""
    if depth > len(_CMS_A):
        raise ValueError(f"depth > {len(_CMS_A)} not supported")
    v = np.asarray(values, np.int64)
    if len(v) and int(v.min()) < 0:
        raise ValueError("count-min keys must be non-negative integers")
    u = v % _CMS_P
    return np.stack(
        [(_CMS_A[i] * u + _CMS_B[i]) % _CMS_P % width for i in range(depth)]
    )


def cms_table(
    ds: "ray.data.Dataset",
    value_column: str,
    width: int = 1024,
    depth: int = 3,
) -> "ray.data.Dataset":
    """Corpus → Count-Min cell table (row, col, c) — the mergeable,
    persistable form (same contract as hll_sketch_table/ddsketch_table:
    ``write_parquet`` per ingestion run, :func:`cms_merge` across runs).
    Per-batch combiner partials (≤ depth × min(distinct, width) rows per
    batch) then one depth×width-bounded groupby Sum — nothing corpus-sized
    shuffles. Null keys are dropped (SQL aggregate semantics)."""
    from ray.data.aggregate import Sum

    def partials(batch: pa.Table) -> pa.Table:
        col = batch.column(value_column)
        v = col.to_numpy(zero_copy_only=False)
        if col.null_count:
            v = v[pa.compute.is_valid(col.combine_chunks()).to_numpy(zero_copy_only=False)]
        cols = _cms_cols(v, width, depth)
        key = (np.arange(depth, dtype=np.int64)[:, None] * width + cols).ravel()
        ukey, cnt = np.unique(key, return_counts=True)
        return pa.table(
            {
                "row": pa.array(ukey // width),
                "col": pa.array(ukey % width),
                "c": pa.array(cnt.astype(np.int64)),
            }
        )

    return (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby(["row", "col"])
        .aggregate(Sum("c", alias_name="c"))
    )


def cms_merge(*sketches: "ray.data.Dataset") -> "ray.data.Dataset":
    """Union any number of CMS cell tables (same width/depth) → cell-wise
    Sum; merging sketches of two corpora equals sketching their
    concatenation exactly."""
    from ray.data.aggregate import Sum

    if not sketches:
        raise ValueError("need at least one sketch table")
    ds = sketches[0]
    for other in sketches[1:]:
        ds = ds.union(other)
    return ds.groupby(["row", "col"]).aggregate(Sum("c", alias_name="c"))


def cms_inner_product(
    sketch_a: "ray.data.Dataset",
    sketch_b: "ray.data.Dataset",
    width: int = 1024,
    depth: int = 3,
) -> pa.Table:
    """Equi-join size estimation from two Count-Min cell tables (Alon/
    Gibbons/Matias/Szegedy; Cormode–Muthukrishnan §4.2): the inner
    product of two frequency vectors is Σ_k f_A(k)·f_B(k) — exactly the
    row count of ``A ⋈ B`` on that key — and each CMS row overestimates
    it by hash-collision noise, so

        est = min over rows r of  Σ_col c_A[r,col] · c_B[r,col]

    prices a shuffle join's output BEFORE running it (the planning
    primitive behind join reordering and skew triage at 100 TB), from
    two sketches built in one streaming pass each. Both tables must
    share width/depth (the pinned hash family makes sketches of
    different corpora cell-compatible by construction). All arithmetic
    exact int64 — engine-exact vs a SQL mirror. Inputs are
    depth×width-bounded, so the dot products run driver-side. Output:
    (sketch_row, dot) per row plus the min as ``est`` on every row."""
    a = sketch_a.to_pandas()  # bounded: <= depth*width rows
    b = sketch_b.to_pandas()  # bounded: <= depth*width rows
    m = a.merge(b, on=["row", "col"], suffixes=("_a", "_b"))
    m["p"] = m["c_a"].astype(np.int64) * m["c_b"].astype(np.int64)
    dots = (
        m.groupby("row")["p"].sum().reindex(range(depth), fill_value=0)
    )
    est = int(dots.min())
    return pa.table(
        {
            "sketch_row": pa.array(np.arange(depth, dtype=np.int64)),
            "dot": pa.array(dots.to_numpy(np.int64)),
            "est": pa.array(np.full(depth, est, np.int64)),
        }
    )


def cms_point_estimates(
    sketch_ds: "ray.data.Dataset",
    keys_ds: "ray.data.Dataset",
    key_column: str,
    width: int = 1024,
    depth: int = 3,
    out_column: str = "est",
) -> "ray.data.Dataset":
    """Estimate the frequency of every key in ``keys_ds``: est(v) =
    min_i cell[i, h_i(v)]. The cell table is ≤ depth×width rows by
    construction, so it is collected once and broadcast (``ray.put``);
    the keys side streams through one map_batches — no shuffle."""
    import ray

    cells = sketch_ds.to_pandas()  # bounded: ≤ depth × width rows
    grid = np.zeros((depth, width), np.int64)
    grid[cells["row"].to_numpy(np.int64), cells["col"].to_numpy(np.int64)] = (
        cells["c"].to_numpy(np.int64)
    )
    grid_ref = ray.put(grid)

    def probe(batch: pa.Table) -> pa.Table:
        g = ray.get(grid_ref)
        v = batch.column(key_column).to_numpy(zero_copy_only=False)
        cols = _cms_cols(v, width, depth)
        est = g[np.arange(depth)[:, None], cols].min(axis=0)
        return batch.append_column(out_column, pa.array(est.astype(np.int64)))

    return keys_ds.map_batches(probe, batch_format="pyarrow")


def frequent_items_exact(
    ds: "ray.data.Dataset",
    column: str,
    phi_bp: int,
    capacity: int = 4096,
) -> pa.Table:
    """EXACT frequent items over an unbounded value domain: every value
    whose frequency exceeds ``phi_bp`` basis points (1/10000) of the
    rows, with its exact count — without ever shuffling the full distinct
    table (the thing :func:`heavy_hitters` alone can't promise: its
    output is layout-dependent once batches truncate).

    Two passes:

    1. **candidates** — the Misra–Gries combiner partials (capacity-
       truncated per-batch counts + max-dropped error), groupby-summed;
       any true heavy hitter has summed lower bound
       ``est > φ·N − err`` (MG guarantee: ``true − est ≤ err``), so the
       candidate filter is lossless. Shuffle ≤ n_batches × capacity rows.
    2. **verify** — candidates broadcast in the task closure (bounded),
       per-batch exact counts of candidate values only, one tiny
       groupby-Sum, then the exact integer threshold
       ``cnt · 10000 > phi_bp · N``.

    The output is layout-INVARIANT even though pass-1 intermediates are
    not: the candidate set only ever over-approximates, and pass 2 is
    exact. Returns a bounded pa.Table (value, n) ordered n desc, value
    asc. ``ds`` is consumed twice (Ray re-executes the lineage; pass an
    already-materialized dataset to pay the scan once).

    Requires ``capacity + 1 ≥ 10000/phi_bp``: a global φ-heavy hitter is
    only guaranteed to SURVIVE some batch's truncation when its in-batch
    frequency (> φ in at least one batch) clears the top-``capacity``
    pigeonhole cut — below that the candidate pass could drop it."""
    import numpy as np
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    if (capacity + 1) * phi_bp < 10000:
        raise ValueError(
            f"capacity={capacity} cannot guarantee recall at "
            f"phi_bp={phi_bp}: need capacity + 1 >= 10000/phi_bp"
        )

    def partial(batch: pa.Table) -> pa.Table:
        col = batch.column(column)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        total = len(col)
        vc = col.cast(pa.string()).fill_null("\x00null").value_counts()
        vals = vc.field("values")
        cnts = vc.field("counts").to_numpy(zero_copy_only=False)
        if len(vals) > capacity:
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
        head = [dropped_max] + [0] * (len(vals) - 1)
        tot = [total] + [0] * (len(vals) - 1)
        return pa.table(
            {
                "value": vals,
                "n": pa.array(cnts, pa.int64()),
                "err": pa.array(head if len(vals) else [], pa.int64()),
                "total": pa.array(tot if len(vals) else [], pa.int64()),
            }
        )

    summed = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("value")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("err", alias_name="err"),
            Sum("total", alias_name="total"),
        )
    )
    merged = pa.Table.from_pandas(summed.to_pandas(), preserve_index=False)
    # bounded: ≤ n_batches × capacity rows reach the driver
    if len(merged) == 0:
        return pa.table(
            {"value": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
        )
    err = int(pc.sum(merged.column("err")).as_py() or 0)
    n_total = int(pc.sum(merged.column("total")).as_py() or 0)
    est = merged.column("n").to_numpy(zero_copy_only=False)
    # lossless candidate filter: true > φN ⇒ est ≥ true − err > φN − err
    cand_mask = est * 10000 > phi_bp * n_total - err * 10000
    candidates = set(
        merged.column("value").to_numpy(zero_copy_only=False)[cand_mask].tolist()
    )
    if not candidates:
        return pa.table(
            {"value": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
        )
    cand_arr = pa.array(sorted(candidates), pa.string())

    def exact_partial(batch: pa.Table) -> pa.Table:
        col = batch.column(column)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        s = col.cast(pa.string()).fill_null("\x00null")
        hit = s.filter(pc.is_in(s, value_set=cand_arr))
        vc = hit.value_counts()
        return pa.table(
            {
                "value": vc.field("values"),
                "n": pa.array(
                    vc.field("counts").to_numpy(zero_copy_only=False), pa.int64()
                ),
            }
        )

    exact = (
        ds.map_batches(exact_partial, batch_format="pyarrow")
        .groupby("value")
        .aggregate(Sum("n", alias_name="n"))
    )
    et = pa.Table.from_pandas(exact.to_pandas(), preserve_index=False)
    cnts = et.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
    keep = cnts * 10000 > phi_bp * n_total
    out = et.filter(pa.array(keep)).sort_by(
        [("n", "descending"), ("value", "ascending")]
    )
    return out.select(["value", "n"])


_KMV_P = (1 << 31) - 1
_KMV_A = 1103515245
_KMV_B = 12345


def kmv_hash(values: np.ndarray) -> np.ndarray:
    """Pinned universal hash for KMV (same family as the CMS rows):
    ``(A·(x mod P) + B) mod P`` over the Mersenne prime P = 2³¹−1 —
    exact int64 arithmetic, so a SQL oracle lands on the same values."""
    v = np.asarray(values, np.int64)
    if len(v) and int(v.min()) < 0:
        raise ValueError("kmv keys must be non-negative integers")
    return (_KMV_A * (v % _KMV_P) + _KMV_B) % _KMV_P


def kmv_group_sketch(
    ds: "ray.data.Dataset",
    group_column: str,
    value_column: str,
    k: int = 64,
) -> "ray.data.Dataset":
    """Per-group K-Minimum-Values distinct sketch: the k smallest distinct
    hash values of ``value_column`` per group — the mergeable, persistable
    bottom-k form (Bar-Yossef et al. 2002 / the theta-sketch ancestor).
    Per-batch combiner partials (≤ k rows per (group, batch): local
    distinct + bottom-k), then one groupby whose groups are already
    k-bounded resolves the global bottom-k with ``map_groups``. Unlike
    HLL it supports set EXPRESSIONS (intersection via the kth-value
    union trick) and is DETERMINISTIC — merge order can't change a bit.
    Returns (group, rnk 1..k, hval); merge two corpora by unioning
    sketch tables and re-running the same finalize."""
    import pandas as pd

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.column(group_column).to_numpy(zero_copy_only=False)
        col = batch.column(value_column)
        v = col.to_numpy(zero_copy_only=False)
        if col.null_count:
            ok = pa.compute.is_valid(col.combine_chunks()).to_numpy(
                zero_copy_only=False
            )
            g, v = g[ok], v[ok]
        df = pd.DataFrame({group_column: g, "hval": kmv_hash(v)}).drop_duplicates()
        df = df.sort_values("hval", kind="mergesort")
        return pa.Table.from_pandas(
            df.groupby(group_column, sort=False).head(k).reset_index(drop=True),
            preserve_index=False,
        )

    def finalize(g: pd.DataFrame) -> pd.DataFrame:
        hv = np.unique(g["hval"].to_numpy(np.int64))[:k]
        return pd.DataFrame(
            {
                group_column: [g[group_column].iloc[0]] * len(hv),
                "rnk": np.arange(1, len(hv) + 1, dtype=np.int64),
                "hval": hv,
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(group_column)
        .map_groups(finalize, batch_format="pandas")
    )


def kmv_group_estimate(
    sketch_ds: "ray.data.Dataset",
    group_column: str,
    k: int = 64,
) -> "ray.data.Dataset":
    """KMV sketch table → per-group distinct estimate. Saturated groups
    (n_kept == k) estimate (k−1)·P / h₍ₖ₎; unsaturated groups hold EVERY
    distinct hash, so the count is exact. One bounded groupby over rows
    already ≤ k per group; the estimate is a single IEEE expression a
    SQL engine reproduces bit-for-bit from the same ints."""
    from ray.data.aggregate import Count, Max

    agg = sketch_ds.groupby(group_column).aggregate(
        Count(alias_name="n_kept"), Max("hval", alias_name="kth")
    )

    def est(b: pa.Table) -> pa.Table:
        n = b.column("n_kept").to_numpy(zero_copy_only=False).astype(np.int64)
        kth = b.column("kth").to_numpy(zero_copy_only=False).astype(np.int64)
        e = n.astype(np.float64)
        sat = n >= k
        e[sat] = (float(k) - 1.0) * float(_KMV_P) / kth[sat].astype(np.float64)
        return pa.table(
            {
                group_column: b.column(group_column),
                "n_kept": pa.array(n),
                "kth": pa.array(kth),
                "est_distinct": pa.array(e),
            }
        )

    return agg.map_batches(est, batch_format="pyarrow")


def kmv_set_estimate(
    sketch_ds: "ray.data.Dataset",
    group_column: str,
    group_a: str,
    group_b: str,
    k: int = 64,
) -> pa.Table:
    """Theta-sketch-style SET-EXPRESSION estimation from two KMV sketches
    (Dasgupta et al., "Theta Sketch Framework" — the audience-overlap
    workhorse): union and intersection cardinalities of two sets from
    their bottom-k sketch tables alone, never re-touching the corpus.

    If BOTH sketches are unsaturated they hold every distinct hash, so
    union/intersection are EXACT counts. Otherwise: θ = k-th smallest of
    the union's hashes, union_est = (k−1)·P/θ (the kmv_group_estimate
    literal chain), and intersection scales the union estimate by the
    fraction of the union's bottom-k present in BOTH sketches —
    ``inter_est = n_both/k · union_est``. All counts are exact ints and
    the two doubles are single IEEE chains, so a SQL mirror reproduces
    the row bit-for-bit.

    Output (one row): n_a, n_b, n_both, theta int64; union_est,
    inter_est float64. The input sketch table is ≤ k rows per group by
    construction — the driver reduce is bounded.
    """
    import pyarrow.compute as pc

    tbl = sketch_ds.map_batches(
        lambda t: t.filter(
            pc.is_in(
                t.column(group_column),
                value_set=pa.array([group_a, group_b]),
            )
        ),
        batch_format="pyarrow",
    ).to_pandas()  # bounded: ≤ 2k rows
    a = np.sort(tbl.loc[tbl[group_column] == group_a, "hval"].to_numpy(np.int64))
    b = np.sort(tbl.loc[tbl[group_column] == group_b, "hval"].to_numpy(np.int64))
    n_a, n_b = len(a), len(b)
    u = np.union1d(a, b)
    sat = n_a == k or n_b == k
    if not sat:
        theta = int(u[-1]) if len(u) else 0
        n_both = int(len(np.intersect1d(a, b)))
        union_est = float(len(u))
        inter_est = float(n_both)
    else:
        ub = u[:k]
        theta = int(ub[-1])
        both = np.intersect1d(a, b)
        n_both = int(np.isin(ub, both).sum())
        union_est = (float(k) - 1.0) * float(_KMV_P) / float(theta)
        inter_est = float(n_both) / float(k) * union_est
    return pa.table(
        {
            "n_a": pa.array([n_a], pa.int64()),
            "n_b": pa.array([n_b], pa.int64()),
            "n_both": pa.array([n_both], pa.int64()),
            "theta": pa.array([theta], pa.int64()),
            "union_est": pa.array([union_est], pa.float64()),
            "inter_est": pa.array([inter_est], pa.float64()),
        }
    )


def ams_f2_table(
    ds: "ray.data.Dataset",
    value_column: str,
    depth: int = 5,
) -> "ray.data.Dataset":
    """AMS second-frequency-moment sketch (Alon–Matias–Szegedy 1996):
    ``depth`` signed sums S_j = Σ_v σ_j(v)·f_v with σ_j(v) ∈ {−1,+1}
    drawn from the pinned CMS universal-hash family (parity of
    (a_j·(v mod p) + b_j) mod p) — every step exact int64, so the sketch
    is deterministic, merge-order-invariant (integer Sum per row), and a
    SQL oracle evaluating the same expression lands on the same sums.
    E[S_j²] = F₂ = Σ f_v², the self-join-size / skew estimator: at 100 TB
    this is how you price a shuffle join WITHOUT running it. Per-batch
    combiner partials (depth rows per batch), one depth-bounded groupby.
    Null keys are dropped (SQL aggregate semantics)."""
    from ray.data.aggregate import Sum

    if depth > len(_CMS_A):
        raise ValueError(f"depth > {len(_CMS_A)} not supported")

    def partials(batch: pa.Table) -> pa.Table:
        col = batch.column(value_column)
        v = col.to_numpy(zero_copy_only=False)
        if col.null_count:
            v = v[pa.compute.is_valid(col.combine_chunks()).to_numpy(zero_copy_only=False)]
        v = np.asarray(v, np.int64)
        if len(v) and int(v.min()) < 0:
            raise ValueError("AMS keys must be non-negative integers")
        u = v % _CMS_P
        sums = [
            int((2 * (((_CMS_A[j] * u + _CMS_B[j]) % _CMS_P) % 2) - 1).sum())
            for j in range(depth)
        ]
        return pa.table(
            {
                "sketch_row": pa.array(np.arange(depth, dtype=np.int64)),
                "s": pa.array(np.asarray(sums, np.int64)),
            }
        )

    return (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby("sketch_row")
        .aggregate(Sum("s", alias_name="signed_sum"))
    )


def ams_f2_estimate(rows: "np.ndarray") -> int:
    """Lower-median of S_j² over the sketch rows — matches DuckDB
    quantile_disc(·, 0.5) index floor(q·(n−1)) exactly for any depth."""
    sq = np.sort(np.asarray(rows, np.int64) ** 2)
    return int(sq[(len(sq) - 1) // 2])
