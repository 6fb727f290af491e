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
    import numpy as np
    import pandas as pd

    from ray.data.aggregate import Sum

    def sum_c2(cols: list[str]) -> int:
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

    pred_pairs = sum_c2([pred_column])
    true_pairs = sum_c2([true_column])
    both_pairs = sum_c2([pred_column, true_column])
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
