"""End-to-end entity-resolution pipeline — the Ray-native ``Dedupe`` API.

Mirrors the reference lifecycle (SURVEY §3, backend/dedupe_script.py:290-392):

    deduper = RayDeduper(config)
    deduper.prepare_training(flat_ds)        # head-400 sample, active learner
    ... label loop (uncertain_pairs / mark) or mark_pairs(labeled) ...
    deduper.train()                          # classifier + learned predicates
    clusters = deduper.partition(flat_ds, threshold)   # the distributed DAG

``partition`` is the distributed Dataset DAG (SURVEY §3 Ray lifecycle
mapping): block-explode(map_batches) → groupby(block_key) pair-gen →
pair-dedup groupby → record join (broadcast or hash join) → scorer actor
pool → threshold filter → connected components → per-component HAC
map_groups → stats groupby → sort.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa

import ray.data

from dedupe_ray.blocking import candidate_pairs
from dedupe_ray.clustering import cluster_edges
from dedupe_ray.config import EngineConfig
from dedupe_ray.learning import (
    ActiveLearner,
    LogisticClassifier,
    features_for_pairs,
    learn_predicates,
)
from dedupe_ray.preprocess import make_preprocess_stage, preprocess_value
from dedupe_ray.schema import discover_field_names, make_extract_fields_stage
from dedupe_ray.scoring import assemble_pairs, score_pairs


def flatten_documents(
    docs_ds: "ray.data.Dataset", field_names: list[str] | None = None, batch_size: int = 4096
) -> tuple["ray.data.Dataset", list[str]]:
    """Span documents → preprocessed flat record Dataset (doc_id, <fields>…).

    Pure projection + normalization; the source dataset (with its spans) is
    untouched, preserving the span-sequence invariant trivially.
    """
    if field_names is None:
        field_names = discover_field_names(docs_ds)
    flat = docs_ds.map_batches(
        make_extract_fields_stage(field_names), batch_format="pyarrow", batch_size=batch_size
    ).map_batches(
        make_preprocess_stage(field_names), batch_format="pyarrow", batch_size=batch_size
    )
    return flat, field_names


def _clean_pair(pair: tuple[dict, dict], fields: list[str]) -> tuple[dict, dict]:
    return tuple(
        {f: preprocess_value(r.get(f, "")) for f in fields} for r in pair
    )  # type: ignore[return-value]


class RayDeduper:
    """Driver-side façade holding config, labels, and the trained model."""

    def __init__(self, config: EngineConfig):
        self.config = config
        self.classifier = LogisticClassifier(config.l2_lambda)
        self.predicate_ids: list[str] = []
        self.labeled: list[tuple[tuple[dict, dict], bool]] = []
        self._learner: ActiveLearner | None = None
        self._sample_records: dict[str, dict] = {}

    # ---- training ---------------------------------------------------------

    def prepare_training(self, flat_ds: "ray.data.Dataset") -> None:
        """Head-N sample (reference: all_data.head(400), dedupe_script.py:254)
        → driver-side active learner over blocked+random candidates."""
        fields = self.config.field_names()
        rows = flat_ds.limit(self.config.max_training_rows).take(self.config.max_training_rows)
        self._sample_records = {
            r["doc_id"]: {f: (r.get(f) or "") for f in fields} for r in rows
        }
        self._learner = ActiveLearner(self.config, self._sample_records, seed=self.config.seed)

    def uncertain_pairs(self) -> list[tuple[dict, dict]]:
        assert self._learner is not None, "call prepare_training first"
        return self._learner.uncertain_pairs()

    def mark_pairs(self, labeled: dict[str, list[tuple[dict, dict]]]) -> None:
        """labeled = {'match': [(rec_a, rec_b)…], 'distinct': […]} — the
        reference label format (dedupe_script.py:322-332). Records may be raw;
        they are preprocessed here."""
        fields = self.config.field_names()
        new: list[tuple[tuple[dict, dict], bool]] = []
        for pair in labeled.get("match", []):
            new.append((_clean_pair(pair, fields), True))
        for pair in labeled.get("distinct", []):
            new.append((_clean_pair(pair, fields), False))
        self.labeled.extend(new)
        if self._learner is not None:
            self._learner.labels.extend(new)

    def train(self, recall: float = 1.0) -> None:
        if not self.labeled:
            raise ValueError("no labeled pairs; call mark_pairs first")
        X = features_for_pairs([p for p, _ in self.labeled], self.config)
        y = np.array([1.0 if lbl else 0.0 for _, lbl in self.labeled])
        if len(set(y.tolist())) < 2:
            raise ValueError("need both match and distinct labels")
        self.classifier.fit(X, y)
        match_pairs = [p for p, lbl in self.labeled if lbl]
        self.predicate_ids = learn_predicates(
            match_pairs, self._sample_records, self.config, recall=recall
        )

    # ---- settings persistence ([lib] write_settings / StaticDedupe) -------

    def save_settings(self, path: str) -> None:
        state = {
            "config": {
                "fields": [
                    {"field": f.field, "type": f.type, "has_missing": f.has_missing}
                    for f in self.config.fields
                ],
            },
            "model": self.classifier.to_dict(),
            "predicates": self.predicate_ids,
        }
        tmp = path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(state, fh)
        os.replace(tmp, path)

    @staticmethod
    def load_settings(path: str, config: EngineConfig | None = None) -> "RayDeduper":
        with open(path) as fh:
            state = json.load(fh)
        if config is None:
            from dedupe_ray.config import FieldConfig

            config = EngineConfig(
                fields=[FieldConfig(**f) for f in state["config"]["fields"]]
            )
        d = RayDeduper(config)
        d.classifier = LogisticClassifier.from_dict(state["model"])
        d.predicate_ids = state["predicates"]
        return d

    # ---- the distributed DAG ---------------------------------------------

    def partition(
        self,
        flat_ds: "ray.data.Dataset",
        threshold: float | None = None,
        cc_mode: str = "auto",
    ) -> "ray.data.Dataset":
        """Flat record Dataset → cluster membership Dataset
        (cluster_id, doc_id, confidence_score), clusters of size ≥ 2 only."""
        if threshold is None:
            threshold = self.config.similarity_threshold
        if not self.predicate_ids:
            raise ValueError("not trained; call train() or load_settings()")
        cfg = self.config
        pairs, _oversized = candidate_pairs(
            flat_ds,
            self.predicate_ids,
            max_block_size=cfg.max_block_size,
            map_batch_size=cfg.map_batch_size,
        )
        assembled = assemble_pairs(
            pairs,
            flat_ds,
            cfg.field_names(),
            broadcast_limit=cfg.broadcast_record_limit,
            batch_size=cfg.score_batch_size,
            concurrency=(1, max(2, cfg.score_concurrency // 2)),
        )
        scored = score_pairs(
            assembled,
            self.classifier.to_dict(),
            cfg,
            batch_size=cfg.score_batch_size,
            concurrency=(1, cfg.score_concurrency),
        )
        edges = scored.filter(expr=f"score >= {threshold}")
        return cluster_edges(
            edges,
            threshold,
            driver_edge_limit=cfg.cc_driver_edge_limit,
            max_component_size=cfg.max_component_size,
            cc_mode=cc_mode,
        )


def summarize_clusters(clusters_ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Cluster stats (A15) sorted by confidence desc (A16):
    (cluster_id, group_size, confidence_score)."""
    from ray.data.aggregate import Count, Mean

    return (
        clusters_ds.groupby("cluster_id")
        .aggregate(Count(alias_name="group_size"), Mean("confidence_score", alias_name="confidence_score"))
        .sort("confidence_score", descending=True)
    )


def dedupe_documents(
    docs_ds: "ray.data.Dataset",
    labeled_pairs: list[tuple[dict, dict, str]],
    threshold: float = 0.5,
    config: EngineConfig | None = None,
    field_names: list[str] | None = None,
) -> tuple["ray.data.Dataset", RayDeduper]:
    """One-call scripted pipeline: span docs + labeled pairs → clusters.

    labeled_pairs entries are (record_a, record_b, 'y'|'n') — the reference
    training format (FIXTURES.md §3); 'u' entries are dropped (page.tsx:253).
    """
    flat, field_names = flatten_documents(docs_ds, field_names)
    if config is None:
        config = EngineConfig.auto_detect(field_names)
        config.similarity_threshold = threshold
    deduper = RayDeduper(config)
    deduper.prepare_training(flat)
    deduper.mark_pairs(
        {
            "match": [(a, b) for a, b, ans in labeled_pairs if ans == "y"],
            "distinct": [(a, b) for a, b, ans in labeled_pairs if ans == "n"],
        }
    )
    deduper.train()
    clusters = deduper.partition(flat, threshold)
    return clusters, deduper
