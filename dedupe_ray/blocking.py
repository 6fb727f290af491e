"""Blocking: predicate key explode → groupby(block_key) → candidate pairs.

Re-creates the reference Fingerprinter + pair generation ([lib:
dedupe/blocking.py Fingerprinter; dedupe/api.py pairs()], driven inside
``partition`` at backend/dedupe_script.py:360) as two Ray Data shuffles:

1. ``map_batches(explode)`` → rows ``(block_key, doc_id)`` — stateless, the
   predicate list is baked into the stage closure (broadcast via task spec).
2. ``groupby("block_key")`` → per-block C(n,2) pair emission (shuffle #1),
   then ``groupby(["id_a","id_b"])`` pair dedup (shuffle #2).

Scale/skew handling (no reference equivalent — it is single-process):
- Per-value key caching inside the explode stage (low-cardinality columns like
  Country hit the cache, not the regex).
- Blocks larger than ``max_block_size`` emit no pairs and are counted in an
  ``oversized`` side-channel: a key shared by thousands of records carries no
  discriminative signal, and emitting its O(n²) pairs is the classic blocking
  skew bomb. The block learner's cost term already steers away from such
  predicates; the cap is the hard backstop. The dropped-block count is
  reported so recall loss is never silent.
"""

from __future__ import annotations

from itertools import combinations

import numpy as np
import pyarrow as pa

import ray.data

from dedupe_ray.config import MISSING
from dedupe_ray.predicates import Predicate


def make_block_explode_stage(predicate_ids: list[str]):
    """Stateless map_batches fn: flat record batch → (block_key, doc_id) rows.

    ``block_key`` is namespaced with the predicate index so identical raw keys
    from different predicates never collide.
    """
    preds = [Predicate.from_id(p) for p in predicate_ids]

    def _stage(batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        n = len(doc_ids)
        out_keys: list[str] = []
        out_ids: list[str] = []
        col_cache: dict[str, list] = {}

        def col(f: str) -> list:
            if f not in col_cache:
                col_cache[f] = batch.column(f).to_pylist()
            return col_cache[f]

        for pi, pred in enumerate(preds):
            prefix = f"{pi}\x1f"
            if len(pred.parts) == 1:
                fn, field = pred.parts[0]
                values = col(field)
                cache: dict[str, tuple[str, ...]] = {}
                for j in range(n):
                    v = values[j]
                    if not v or v == MISSING:
                        continue
                    ks = cache.get(v)
                    if ks is None:
                        ks = fn(v)
                        cache[v] = ks
                    for k in ks:
                        out_keys.append(prefix + k)
                        out_ids.append(doc_ids[j])
            else:
                fields = [f for _, f in pred.parts]
                cols = [col(f) for f in fields]
                cache2: dict[tuple, tuple[str, ...]] = {}
                for j in range(n):
                    vals = tuple(c[j] for c in cols)
                    ks = cache2.get(vals)
                    if ks is None:
                        ks = pred.keys(dict(zip(fields, vals)))
                        cache2[vals] = ks
                    for k in ks:
                        out_keys.append(prefix + k)
                        out_ids.append(doc_ids[j])
        return pa.table(
            {"block_key": pa.array(out_keys, pa.string()), "doc_id": pa.array(out_ids, pa.string())}
        )

    return _stage


def make_pair_emit_fn(max_block_size: int):
    """Per-block pair emitter for groupby(block_key).map_groups.

    Emits canonical (id_a < id_b) unordered pairs; oversized blocks are
    dropped (1 row in the `oversized` marker column instead) — see module doc.
    """

    def _emit(group: pa.Table) -> pa.Table:
        ids = sorted(set(group.column("doc_id").to_pylist()))
        n = len(ids)
        if n < 2:
            return pa.table(
                {"id_a": pa.array([], pa.string()), "id_b": pa.array([], pa.string()),
                 "oversized": pa.array([], pa.int8())}
            )
        if n > max_block_size:
            return pa.table(
                {"id_a": pa.array([""], pa.string()), "id_b": pa.array([""], pa.string()),
                 "oversized": pa.array([1], pa.int8())}
            )
        a, b = zip(*combinations(ids, 2))
        return pa.table(
            {"id_a": pa.array(a, pa.string()), "id_b": pa.array(b, pa.string()),
             "oversized": pa.array(np.zeros(len(a), np.int8))}
        )

    return _emit


def candidate_pairs(
    flat_ds: "ray.data.Dataset",
    predicate_ids: list[str],
    max_block_size: int = 1024,
    map_batch_size: int = 8192,
) -> tuple["ray.data.Dataset", "ray.data.Dataset"]:
    """flat record Dataset → (unique candidate pair Dataset, oversized-block marker Dataset).

    Pairs schema: (id_a: string, id_b: string), id_a < id_b, globally distinct.
    """
    blocked = flat_ds.map_batches(
        make_block_explode_stage(predicate_ids),
        batch_format="pyarrow",
        batch_size=map_batch_size,
    )
    raw_pairs = blocked.groupby("block_key").map_groups(
        make_pair_emit_fn(max_block_size), batch_format="pyarrow"
    )
    oversized = raw_pairs.filter(expr="oversized == 1")
    pairs = (
        raw_pairs.filter(expr="oversized == 0")
        .drop_columns(["oversized"])
        .groupby(["id_a", "id_b"])
        .count()
        .drop_columns(["count()"])
    )
    return pairs, oversized


def brute_force_pairs(flat_records: list[dict], predicate_ids: list[str]) -> set[tuple[str, str]]:
    """Driver-side oracle for tests: same semantics, no Ray."""
    preds = [Predicate.from_id(p) for p in predicate_ids]
    blocks: dict[str, set[str]] = {}
    for rec in flat_records:
        for pi, pred in enumerate(preds):
            for k in pred.keys(rec):
                blocks.setdefault(f"{pi}\x1f{k}", set()).add(rec["doc_id"])
    out: set[tuple[str, str]] = set()
    for members in blocks.values():
        if len(members) > 1:
            for a, b in combinations(sorted(members), 2):
                out.add((a, b))
    return out
