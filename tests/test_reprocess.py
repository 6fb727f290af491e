"""Reprocess loop (the reference's third user path, SURVEY §3.3): review →
derived y/n labels → retrain → re-partition. The simulated reviewer uses
planted truth: removals = members wrongly clustered."""

import pytest

pytestmark = pytest.mark.slow_e2e  # training-loop / multi-run pipeline e2e

import pyarrow as pa
import ray.data as rd

from dedupe_ray.eval import clusters_assignment, pairwise_prf, truth_assignment
from dedupe_ray.fixtures import KNA_FIELDS
from dedupe_ray.pipeline import (
    dedupe_documents,
    flatten_documents,
    labels_from_reviewed_clusters,
    reprocess,
)


def test_labels_from_reviewed_clusters():
    clusters = pa.table(
        {
            "cluster_id": ["c1", "c1", "c1", "c2", "c2"],
            "doc_id": ["a", "b", "x", "p", "q"],
            "confidence_score": [0.9] * 5,
        }
    )
    recs = {d: {"Name": d} for d in "abxpq"}
    labels = labels_from_reviewed_clusters(clusters, recs, removals={"x"})
    match = {(p[0]["Name"], p[1]["Name"]) for p in labels["match"]}
    distinct = {(p[0]["Name"], p[1]["Name"]) for p in labels["distinct"]}
    assert match == {("a", "b"), ("p", "q")}
    assert distinct == {("a", "x"), ("b", "x")}


def test_reprocess_round_improves_or_holds(small_corpus):
    docs, truth = small_corpus
    ta = truth_assignment(truth)
    ds = rd.from_arrow(docs)
    oracle = lambda a, b: ta[a["doc_id"]] == ta[b["doc_id"]]
    clusters, deduper = dedupe_documents(
        ds, threshold=0.25, field_names=KNA_FIELDS, label_oracle=oracle
    )
    tbl1 = pa.Table.from_pandas(clusters.to_pandas())
    _, _, f1_before = pairwise_prf(clusters_assignment(tbl1), ta)

    # simulated reviewer: remove members whose entity differs from the
    # cluster's majority entity
    removals: set[str] = set()
    by_cluster: dict[str, list[str]] = {}
    for cid, doc in zip(tbl1.column("cluster_id").to_pylist(), tbl1.column("doc_id").to_pylist()):
        by_cluster.setdefault(cid, []).append(doc)
    for members in by_cluster.values():
        ents = [ta[d] for d in members]
        majority = max(set(ents), key=ents.count)
        removals |= {d for d in members if ta[d] != majority}

    flat, _ = flatten_documents(ds, KNA_FIELDS)
    flat = flat.materialize()
    recs = {r["doc_id"]: r for r in flat.take_all()}
    labels = labels_from_reviewed_clusters(tbl1, recs, removals)
    assert len(labels["match"]) > 0
    clusters2 = reprocess(deduper, flat, labels, threshold=0.25)
    tbl2 = pa.Table.from_pandas(clusters2.to_pandas())
    _, _, f1_after = pairwise_prf(clusters_assignment(tbl2), ta)
    assert f1_after >= f1_before - 0.01  # refinement must not regress
