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
