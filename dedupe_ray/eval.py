"""Pairwise cluster-quality metrics (FIXTURES.md §4 conformance metric)."""

from __future__ import annotations

from itertools import combinations

import pyarrow as pa


def _within_pairs(assignment: dict[str, object]) -> set[tuple[str, str]]:
    groups: dict[object, list[str]] = {}
    for doc, g in assignment.items():
        groups.setdefault(g, []).append(doc)
    out: set[tuple[str, str]] = set()
    for members in groups.values():
        if len(members) > 1:
            for a, b in combinations(sorted(members), 2):
                out.add((a, b))
    return out


def pairwise_prf(
    predicted: dict[str, object], truth: dict[str, object]
) -> tuple[float, float, float]:
    """Pairwise precision / recall / F1 over within-cluster pairs."""
    pred_pairs = _within_pairs(predicted)
    true_pairs = _within_pairs({d: g for d, g in truth.items()})
    tp = len(pred_pairs & true_pairs)
    precision = tp / len(pred_pairs) if pred_pairs else 1.0
    recall = tp / len(true_pairs) if true_pairs else 1.0
    f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
    return precision, recall, f1


def truth_assignment(truth: pa.Table) -> dict[str, int]:
    return {
        d: e
        for d, e in zip(truth.column("doc_id").to_pylist(), truth.column("entity_id").to_pylist())
    }


def clusters_assignment(clusters: pa.Table) -> dict[str, str]:
    return {
        d: c
        for d, c in zip(
            clusters.column("doc_id").to_pylist(), clusters.column("cluster_id").to_pylist()
        )
    }


def _sum_c2(ds, cols: list[str]) -> int:
    """Σ C(n, 2) over the ``cols`` group sizes of ``ds`` — the counting
    combiner every pair-based partition metric reduces to: per-batch
    partial counts → groupby Sum finishes the sizes → streamed int64
    Σ n(n−1)/2. Null keys drop (pandas-groupby semantics; SQL mirrors
    filter IS NOT NULL)."""
    import numpy as np
    import pandas as pd

    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({c: b.column(c).to_pandas() for c in cols})
        g = df.groupby(cols, as_index=False).size()
        g = g.rename(columns={"size": "n"})
        return pa.Table.from_pandas(g, preserve_index=False)

    counts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(cols)
        .aggregate(Sum("n", alias_name="n"))
    )

    def c2(b: pa.Table) -> pa.Table:
        n = b.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"p": pa.array([int((n * (n - 1) // 2).sum())], pa.int64())})

    agg = counts.map_batches(c2, batch_format="pyarrow").aggregate(
        Sum("p", alias_name="p")
    )
    return int(agg["p"] or 0)


def pairwise_cluster_metrics(
    ds,
    pred_column: str,
    true_column: str,
) -> pa.Table:
    """DISTRIBUTED pairwise partition-agreement metrics — the scale form of
    :func:`pairwise_prf` (which materializes every within-cluster pair on
    the driver and is quadratic in cluster size): pairwise precision /
    recall / F1 of the ``pred_column`` partition against ``true_column``,
    computed from three counting combiners only.

    Identity: the within-pair sets intersect exactly on pairs co-clustered
    in BOTH partitions, so tp = Σ C(n_ct, 2) over the contingency cells,
    pred_pairs = Σ C(n_c, 2), true_pairs = Σ C(n_t, 2) — each a per-batch
    count partial → tiny groupby Sum → streamed Σ n(n−1)/2 (int64 partials;
    exact up to ~4·10⁹-row clusters). Nothing driver-side but nine
    integers. Ratios are evaluated with the literal double chain a SQL
    mirror uses, so the output is oracle-hash-exact.
    """
    pred_pairs = _sum_c2(ds, [pred_column])
    true_pairs = _sum_c2(ds, [true_column])
    both_pairs = _sum_c2(ds, [pred_column, true_column])
    prec = float(both_pairs) / float(pred_pairs) if pred_pairs else 1.0
    rec = float(both_pairs) / float(true_pairs) if true_pairs else 1.0
    f1 = 2.0 * prec * rec / (prec + rec) if (prec + rec) > 0.0 else 0.0
    return pa.table(
        {
            "pred_pairs": pa.array([pred_pairs], pa.int64()),
            "true_pairs": pa.array([true_pairs], pa.int64()),
            "both_pairs": pa.array([both_pairs], pa.int64()),
            "prec": pa.array([prec], pa.float64()),
            "rec": pa.array([rec], pa.float64()),
            "f1": pa.array([f1], pa.float64()),
        }
    )


def blocking_quality(
    ds,
    block_column: str,
    true_column: str,
) -> pa.Table:
    """Blocking-scheme evaluation (Christen 2012 §7.4): REDUCTION RATIO
    (how many of the C(N,2) comparisons blocking avoids), PAIRS
    COMPLETENESS (recall — matched pairs co-blocked) and PAIRS QUALITY
    (precision — co-blocked pairs that are matches), for single-key
    blocking where every record lands in exactly one block.

    Same Σ C(n,2) counting-combiner identity as
    :func:`pairwise_cluster_metrics`: candidate pairs = Σ C(n_block, 2),
    true pairs = Σ C(n_true, 2), hits = Σ C(n_joint, 2) over the
    (block, true) contingency cells — three tiny groupbys plus one
    Count; nothing pair-scaled ever materializes (the naive evaluation
    enumerates candidate pairs and dies exactly when blocking matters).
    Ratios are single IEEE divisions a SQL mirror reproduces."""
    import numpy as np
    import pandas as pd

    from ray.data.aggregate import Sum

    def sum_c2(cols: list[str]) -> int:
        def partial(b: pa.Table) -> pa.Table:
            df = pd.DataFrame({c: b.column(c).to_pandas() for c in cols})
            g = df.groupby(cols, as_index=False).size().rename(columns={"size": "n"})
            return pa.Table.from_pandas(g, preserve_index=False)

        counts = (
            ds.map_batches(partial, batch_format="pyarrow")
            .groupby(cols)
            .aggregate(Sum("n", alias_name="n"))
        )

        def c2(b: pa.Table) -> pa.Table:
            n = b.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table(
                {"p": pa.array([int((n * (n - 1) // 2).sum())], pa.int64())}
            )

        agg = counts.map_batches(c2, batch_format="pyarrow").aggregate(
            Sum("p", alias_name="p")
        )
        return int(agg["p"] or 0)

    n_records = int(ds.count())
    total_pairs = n_records * (n_records - 1) // 2
    cand = sum_c2([block_column])
    true_pairs = sum_c2([true_column])
    hits = sum_c2([block_column, true_column])
    return pa.table(
        {
            "n_records": pa.array([n_records], pa.int64()),
            "total_pairs": pa.array([total_pairs], pa.int64()),
            "cand_pairs": pa.array([cand], pa.int64()),
            "true_pairs": pa.array([true_pairs], pa.int64()),
            "hit_pairs": pa.array([hits], pa.int64()),
            "reduction_ratio": pa.array(
                [1.0 - float(cand) / float(total_pairs)], pa.float64()
            ),
            "pairs_completeness": pa.array(
                [float(hits) / float(true_pairs)], pa.float64()
            ),
            "pairs_quality": pa.array(
                [float(hits) / float(cand)], pa.float64()
            ),
        }
    )


def bcubed_metrics(
    ds,
    pred_column: str,
    true_column: str,
) -> pa.Table:
    """DISTRIBUTED B-cubed precision/recall (Bagga & Baldwin 1998) — the
    other standard ER-evaluation family next to
    :func:`pairwise_cluster_metrics`: pairwise metrics weight big
    clusters quadratically; B³ averages PER RECORD, so singleton and
    small-cluster quality is visible.

    Identity: per record r, precision(r) = |pred(r) ∩ true(r)| /
    |pred(r)| — constant within a contingency cell — so
    B³prec = (1/N) Σ_cells c·(c/p). Each cell's contribution is kept as
    the EXACT integer ``((c · 10^6) // p) · c`` (c ≤ p bounds the term
    by 1e6·c, so sums stay in int64 up to ~9·10¹² records); the
    micro-unit sums are order-free, parallelism-invariant, and mirrored
    term-for-term in SQL (the quantize-the-rational doctrine —
    B³prec ≈ prec_micro_sum / (n · 1e6), underestimating by < 1e-6 per
    record).

    Shape: one combiner pass builds the (pred, true, c) contingency
    cells; pred sizes and true sizes reduce from the CELL table (never
    rescanning records); two bucketed joins attach p and t to each cell;
    per-batch partial term sums → one global Sum. Nothing driver-side
    but five integers. Records with a null pred or true label are
    EXCLUDED (pandas-groupby dropna semantics — a SQL mirror must filter
    ``IS NOT NULL`` to match). Output: one row (n, prec_micro_sum,
    rec_micro_sum) int64.
    """
    import numpy as np
    import pandas as pd

    from ray.data.aggregate import Sum

    from dedupe_ray.joins import bucketed_lookup_join

    def cell_partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "pred": b.column(pred_column).to_pandas(),
                "true": b.column(true_column).to_pandas(),
            }
        )
        g = df.groupby(["pred", "true"], as_index=False).size()
        g = g.rename(columns={"size": "c"})
        return pa.Table.from_pandas(g, preserve_index=False)

    cells = (
        ds.map_batches(cell_partial, batch_format="pyarrow")
        .groupby(["pred", "true"])
        .aggregate(Sum("c", alias_name="c"))
        .materialize()  # consumed four times below
    )

    def side_sizes(col: str, out: str):
        def partial(b: pa.Table) -> pa.Table:
            keys = b.column(col).to_numpy(zero_copy_only=False)
            codes, uniq = pd.factorize(keys)
            c = b.column("c").to_numpy(zero_copy_only=False).astype(np.int64)
            s = np.zeros(len(uniq), np.int64)
            np.add.at(s, codes, c)
            return pa.table({col: pa.array(np.asarray(uniq)), out: pa.array(s)})

        return (
            cells.map_batches(partial, batch_format="pyarrow")
            .groupby(col)
            .aggregate(Sum(out, alias_name=out))
        )

    with_p = bucketed_lookup_join(cells, side_sizes("pred", "p"), "pred", "pred", ["p"])
    with_pt = bucketed_lookup_join(
        with_p, side_sizes("true", "t"), "true", "true", ["t"]
    )

    def term_partial(b: pa.Table) -> pa.Table:
        c = b.column("c").to_numpy(zero_copy_only=False).astype(np.int64)
        p = b.column("p").to_numpy(zero_copy_only=False).astype(np.int64)
        t = b.column("t").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "n": pa.array([int(c.sum())], pa.int64()),
                "prec_micro_sum": pa.array([int((((c * 1000000) // p) * c).sum())], pa.int64()),
                "rec_micro_sum": pa.array([int((((c * 1000000) // t) * c).sum())], pa.int64()),
            }
        )

    agg = with_pt.map_batches(term_partial, batch_format="pyarrow").aggregate(
        Sum("n", alias_name="n"),
        Sum("prec_micro_sum", alias_name="prec_micro_sum"),
        Sum("rec_micro_sum", alias_name="rec_micro_sum"),
    )
    return pa.table(
        {
            "n": pa.array([int(agg["n"] or 0)], pa.int64()),
            "prec_micro_sum": pa.array([int(agg["prec_micro_sum"] or 0)], pa.int64()),
            "rec_micro_sum": pa.array([int(agg["rec_micro_sum"] or 0)], pa.int64()),
        }
    )


def rank_relevance_metrics(
    topk_ds,
    labels_ds,
    query_labels: dict,
    id_column: str = "vec_id",
    label_column: str = "label",
) -> pa.Table:
    """IR ranking metrics over a retrieved top-k table — the evaluation
    member of the search family next to ``ops.embedding.topk_recall``:
    per query, the relevant-hit count, first-relevant rank, reciprocal
    rank, and DCG, where "relevant" means the hit's label equals the
    query's label (leave-one-out protocol: exclude the query row from
    the corpus BEFORE ranking).

    All metrics are exact integers (the quantize-the-transcendental
    doctrine): ``rr_micro = 10^6 // (first_rel_rank + 1)`` and
    ``dcg_micro = Σ_rel 10^12 // floor(1e6 · log2(rank + 2))`` — int64
    chains a SQL mirror reproduces term-for-term, order-free at any
    parallelism. Queries with no relevant hit emit first_rel_rank = -1
    and zero rr/dcg.

    ``topk_ds``: Dataset/table with (query_id, id_column, rank 0-based);
    ``labels_ds``: Dataset with (id_column, label_column) — joined via
    the bucketed unique-key join, so the label table never sits on the
    driver; ``query_labels``: {query_id: label} for the (bounded) query
    set. Output: one row per query, sorted by query_id.
    """
    import math

    import numpy as np
    import pandas as pd
    import ray.data as rd

    from dedupe_ray.joins import bucketed_lookup_join

    if isinstance(topk_ds, pa.Table):
        topk_ds = rd.from_arrow(topk_ds)
    hits = bucketed_lookup_join(
        topk_ds, labels_ds, id_column, id_column, [label_column]
    ).to_pandas()  # bounded: n_queries × k rows
    out_rows = []
    for qid in sorted(query_labels):
        g = hits[hits["query_id"] == qid]
        rel_ranks = np.sort(
            g.loc[g[label_column] == query_labels[qid], "rank"].to_numpy(np.int64)
        )
        n_rel = int(len(rel_ranks))
        if n_rel:
            first = int(rel_ranks[0])
            rr = 1000000 // (first + 1)
            dcg = int(
                sum(
                    10**12 // math.floor(1000000.0 * math.log2(float(r + 2)))
                    for r in rel_ranks
                )
            )
        else:
            first, rr, dcg = -1, 0, 0
        out_rows.append((qid, n_rel, first, rr, dcg))
    qs, nr, fr, rrs, dcgs = zip(*out_rows) if out_rows else ((), (), (), (), ())
    return pa.table(
        {
            "query_id": pa.array(list(qs), pa.int64()),
            "n_rel": pa.array(list(nr), pa.int64()),
            "first_rel_rank": pa.array(list(fr), pa.int64()),
            "rr_micro": pa.array(list(rrs), pa.int64()),
            "dcg_micro": pa.array(list(dcgs), pa.int64()),
        }
    )


def ari_stats(
    ds,
    pred_column: str,
    true_column: str,
) -> pa.Table:
    """Adjusted Rand Index (Hubert & Arabie 1985) — the chance-corrected
    member of the pair-counting partition-agreement family
    (:func:`pairwise_cluster_metrics` is the uncorrected one): ARI = 1
    for identical partitions, ~0 for independent ones, negative for
    worse-than-chance.

    Sufficient statistics are four exact int64 pair counts (the same
    Σ C(n, 2) counting combiners — nothing pair-scaled materializes):
    tp = Σ_cells C(n_ij, 2), pred_pairs = Σ C(a_i, 2), true_pairs =
    Σ C(b_j, 2), total_pairs = C(n, 2). The index itself is the literal
    IEEE double chain

        exp = pred_pairs · true_pairs / total_pairs
        ari = (tp − exp) / ((pred_pairs + true_pairs) / 2 − exp)

    evaluated identically by a SQL mirror (each operand CAST to DOUBLE
    first), so the output is oracle-hash-exact. Rows with a null label
    on either side are EXCLUDED up front (a SQL mirror filters both
    ``IS NOT NULL``). Degenerate inputs (all rows one cluster on both
    sides → denominator 0) return ari = 1.0 by convention."""
    import pyarrow.compute as pc

    both = ds.map_batches(
        lambda t: t.filter(
            pc.and_(
                pc.is_valid(t.column(pred_column)),
                pc.is_valid(t.column(true_column)),
            )
        ),
        batch_format="pyarrow",
    )
    n = both.count()
    total_pairs = n * (n - 1) // 2
    pred_pairs = _sum_c2(both, [pred_column])
    true_pairs = _sum_c2(both, [true_column])
    tp = _sum_c2(both, [pred_column, true_column])
    if total_pairs > 0:
        exp = float(pred_pairs) * float(true_pairs) / float(total_pairs)
        denom = (float(pred_pairs) + float(true_pairs)) / 2.0 - exp
        ari = (float(tp) - exp) / denom if denom != 0.0 else 1.0
    else:
        ari = 1.0
    return pa.table(
        {
            "n": pa.array([n], pa.int64()),
            "tp": pa.array([tp], pa.int64()),
            "pred_pairs": pa.array([pred_pairs], pa.int64()),
            "true_pairs": pa.array([true_pairs], pa.int64()),
            "total_pairs": pa.array([total_pairs], pa.int64()),
            "ari": pa.array([ari], pa.float64()),
        }
    )


def rank_auc_stats(
    ds,
    score_column: str,
    label_column: str,
) -> pa.Table:
    """Tie-aware ROC AUC (the Mann–Whitney U statistic) of a score
    against a binary label, from exact integer sufficient statistics:

        num2 = Σ_v p_v · (2 · N_below(v) + n_v)        (doubled to keep
        auc  = num2 / (2 · P · N)                       0.5-ties integral)

    where (p_v, n_v) are positive/negative counts at each distinct score
    value and N_below its cumulative negative count — the classic
    probability that a random positive outranks a random negative, with
    ties counted half. One combiner pass builds the per-value count
    table (p_v, n_v); the cumulative walk runs over THAT table only —
    bounded by distinct score values, so quantize/bucket a continuous
    score upstream at corpus scale (the heavy-hitters reduction class).
    num2 stays in int64 up to P·N < 4.6·10¹⁸ pair-halves. The single
    division is the literal IEEE chain a SQL window mirror (SUM(n) OVER
    (ORDER BY score) − n) reproduces. Labels outside {0, 1} raise;
    degenerate inputs (no positives or no negatives) return auc = 1.0.
    Output one row: (n_pos, n_neg, num2, auc)."""
    import numpy as np
    import pandas as pd

    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        lab = b.column(label_column).to_numpy(zero_copy_only=False).astype(np.int64)
        if len(lab) and (lab.min() < 0 or lab.max() > 1):
            raise ValueError(f"{label_column} must be binary 0/1")
        df = pd.DataFrame(
            {
                "score": b.column(score_column).to_numpy(zero_copy_only=False),
                "p": lab,
                "n": 1 - lab,
            }
        )
        g = df.groupby("score", as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    counts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("score")
        .aggregate(Sum("p", alias_name="p"), Sum("n", alias_name="n"))
        .to_pandas()  # bounded: one row per distinct score value
        .sort_values("score", ignore_index=True)
    )
    p = counts["p"].to_numpy(np.int64)
    n = counts["n"].to_numpy(np.int64)
    below = np.concatenate(([0], np.cumsum(n)[:-1]))
    num2 = int((p * (2 * below + n)).sum())
    n_pos, n_neg = int(p.sum()), int(n.sum())
    den = 2 * n_pos * n_neg
    auc = float(num2) / float(den) if den else 1.0
    return pa.table(
        {
            "n_pos": pa.array([n_pos], pa.int64()),
            "n_neg": pa.array([n_neg], pa.int64()),
            "num2": pa.array([num2], pa.int64()),
            "auc": pa.array([auc], pa.float64()),
        }
    )


def calibration_report(
    ds,
    p_milli_column: str,
    label_column: str,
    n_bins: int = 10,
) -> pa.Table:
    """Probability-calibration report (reliability diagram + Brier
    score) from exact integer sufficient statistics — the standard
    audit for any probabilistic scorer (the ER match scores, a quality
    classifier) before its threshold is trusted. Predictions arrive as
    exact thousandths ``p_milli`` ∈ [0, 1000] (quantize upstream; the
    scorer's float → milli cast is the only rounding, applied
    identically in a SQL mirror), labels as {0, 1}. Per equal-width bin
    b = min(p_milli · n_bins // 1000, n_bins − 1):

        n_b, sum_p_milli_b, sum_y_b,
        gap_abs_b = |sum_p_milli_b − 1000 · sum_y_b|

    so ECE = Σ_b gap_abs_b / (1000 · N) and the reliability curve
    (p̄_b, ȳ_b) are exact rationals of the emitted int64s — no float
    ever crosses the engine boundary (the tpch_q14 num/den doctrine).
    The global Brier numerator Σ (p_milli − 1000·y)² rides along each
    row (micro-units; divide by 10⁶·N for the score). One combiner
    pass per block groups by bin (≤ n_bins rows each), one bounded
    groupby merges. Output: (bin, n, sum_p_milli, sum_y, gap_abs,
    brier_num) sorted by bin."""
    import numpy as np
    import pandas as pd

    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        p = b.column(p_milli_column).to_numpy(zero_copy_only=False).astype(np.int64)
        y = b.column(label_column).to_numpy(zero_copy_only=False).astype(np.int64)
        if len(p) and (p.min() < 0 or p.max() > 1000):
            raise ValueError(f"{p_milli_column} must be milli-probs in [0, 1000]")
        if len(y) and (y.min() < 0 or y.max() > 1):
            raise ValueError(f"{label_column} must be binary 0/1")
        bins = np.minimum(p * n_bins // 1000, n_bins - 1)
        df = pd.DataFrame(
            {
                "bin": bins,
                "n": np.ones(len(p), np.int64),
                "sum_p_milli": p,
                "sum_y": y,
                "brier_num": (p - 1000 * y) ** 2,
            }
        )
        return pa.Table.from_pandas(
            df.groupby("bin", as_index=False).sum(), preserve_index=False
        )

    merged = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bin")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("sum_p_milli", alias_name="sum_p_milli"),
            Sum("sum_y", alias_name="sum_y"),
            Sum("brier_num", alias_name="brier_num"),
        )
        .to_pandas()  # bounded: <= n_bins rows
        .sort_values("bin", ignore_index=True)
    )
    gap = (merged["sum_p_milli"] - 1000 * merged["sum_y"]).abs()
    return pa.table(
        {
            "bin": pa.array(merged["bin"].astype("int64")),
            "n": pa.array(merged["n"].astype("int64")),
            "sum_p_milli": pa.array(merged["sum_p_milli"].astype("int64")),
            "sum_y": pa.array(merged["sum_y"].astype("int64")),
            "gap_abs": pa.array(gap.astype("int64")),
            "brier_num": pa.array(merged["brier_num"].astype("int64")),
        }
    )


def pr_curve_stats(
    ds,
    score_column: str,
    label_column: str,
) -> pa.Table:
    """Precision–recall / ROC operating points from exact integer
    sufficient statistics: for every distinct score value v (predicting
    positive iff score ≥ v),

        tp(v) = Σ_{s≥v} p_s,  fp(v) = Σ_{s≥v} n_s,
        fn(v) = P − tp(v),    tn(v) = N − fp(v)

    so precision = tp/(tp+fp) and recall = tp/P are exact rationals of
    the emitted int64s (the num/den doctrine — no float crosses the
    engine boundary) and the full threshold sweep costs ONE pass: the
    same per-value (p_v, n_v) combiner table as :func:`rank_auc_stats`,
    cumulated from the top. Scores must be integers (quantize upstream);
    output is bounded by distinct score values — bucket a continuous
    score first at corpus scale. Output: (threshold, tp, fp, fn, tn)
    sorted by threshold descending."""
    import numpy as np
    import pandas as pd

    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        lab = b.column(label_column).to_numpy(zero_copy_only=False).astype(np.int64)
        if len(lab) and (lab.min() < 0 or lab.max() > 1):
            raise ValueError(f"{label_column} must be binary 0/1")
        df = pd.DataFrame(
            {
                "threshold": b.column(score_column)
                .to_numpy(zero_copy_only=False)
                .astype(np.int64),
                "p": lab,
                "n": 1 - lab,
            }
        )
        return pa.Table.from_pandas(
            df.groupby("threshold", as_index=False).sum(), preserve_index=False
        )

    counts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("threshold")
        .aggregate(Sum("p", alias_name="p"), Sum("n", alias_name="n"))
        .to_pandas()  # bounded: one row per distinct score value
        .sort_values("threshold", ascending=False, ignore_index=True)
    )
    tp = counts["p"].to_numpy(np.int64).cumsum()
    fp = counts["n"].to_numpy(np.int64).cumsum()
    P, N = int(tp[-1]) if len(tp) else 0, int(fp[-1]) if len(fp) else 0
    return pa.table(
        {
            "threshold": pa.array(counts["threshold"].astype("int64")),
            "tp": pa.array(tp),
            "fp": pa.array(fp),
            "fn": pa.array(P - tp),
            "tn": pa.array(N - fp),
        }
    )
