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


# Bucketed-groupby fan-in: grouping by the raw key (block_key, pair) would
# call a python fn once per tiny group — per-call overhead dominates at
# millions of groups. Instead rows carry `bucket = crc32(key) % N_BUCKETS`,
# the shuffle groups by bucket (N_BUCKETS groups total), and the per-bucket
# fn processes all contained keys vectorized. Same exchange volume, ~100×
# less per-group overhead; N_BUCKETS bounds reducer fan-in at any scale.
N_BUCKETS = 1024


def make_block_explode_stage(
    predicate_ids: list[str], with_bucket: bool = False, index_tables: dict | None = None
):
    """Stateless map_batches fn: flat record batch → (block_key, doc_id) rows.

    ``block_key`` is namespaced with the predicate index so identical raw keys
    from different predicates never collide. Index predicates
    (``canopy4|<field>``) are reconstructed from ``index_tables`` —
    {pid: {"field", "df", "n_docs"}} — the broadcast train-time DF state.
    """
    from dedupe_ray.predicates import NGramCanopyPredicate

    preds = []
    for p in predicate_ids:
        if p.startswith("canopy"):
            t = (index_tables or {})[p]
            preds.append(NGramCanopyPredicate(t["field"], t["df"], t["n_docs"]))
        else:
            preds.append(Predicate.from_id(p))

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
        if not with_bucket:
            return pa.table(
                {"block_key": pa.array(out_keys, pa.string()), "doc_id": pa.array(out_ids, pa.string())}
            )
        import zlib

        buckets = np.fromiter(
            (zlib.crc32(k.encode()) % N_BUCKETS for k in out_keys), np.int32, len(out_keys)
        )
        return pa.table(
            {
                "block_key": pa.array(out_keys, pa.string()),
                "doc_id": pa.array(out_ids, pa.string()),
                "bucket": pa.array(buckets),
            }
        )

    return _stage


def make_bucket_pair_emit_fn(max_block_size: int):
    """Per-BUCKET pair emitter: one call processes every block hashed into
    the bucket — sorted run detection via numpy, pairs via combinations per
    run. Emits canonical (id_a < id_b) pairs + a pair-hash bucket column for
    the dedup shuffle; oversized blocks emit one marker row instead."""
    import zlib

    def _emit(group: pa.Table) -> pa.Table:
        import pandas as pd

        df = pd.DataFrame(
            {
                "block_key": group.column("block_key").to_pylist(),
                "doc_id": group.column("doc_id").to_pylist(),
            }
        ).drop_duplicates()
        df = df.sort_values(["block_key", "doc_id"])
        keys = df["block_key"].to_numpy()
        ids = df["doc_id"].to_numpy()
        boundaries = np.nonzero(np.concatenate(([True], keys[1:] != keys[:-1], [True])))[0]
        out_a: list[str] = []
        out_b: list[str] = []
        n_oversized = 0
        for s, e in zip(boundaries[:-1], boundaries[1:]):
            n = e - s
            if n < 2:
                continue
            if n > max_block_size:
                n_oversized += 1
                continue
            run = ids[s:e]
            for i in range(n - 1):
                a = run[i]
                out_a.extend([a] * (n - 1 - i))
                out_b.extend(run[i + 1:])
        over = [1] * n_oversized
        out_a.extend([""] * n_oversized)
        out_b.extend([""] * n_oversized)
        pbucket = np.fromiter(
            (zlib.crc32(f"{a}\x1f{b}".encode()) % N_BUCKETS for a, b in zip(out_a, out_b)),
            np.int32,
            len(out_a),
        )
        return pa.table(
            {
                "id_a": pa.array(out_a, pa.string()),
                "id_b": pa.array(out_b, pa.string()),
                "oversized": pa.array(np.concatenate([np.zeros(len(out_a) - n_oversized, np.int8), np.ones(n_oversized, np.int8)]) if out_a else np.zeros(0, np.int8)),
                "pbucket": pa.array(pbucket),
            }
        )

    return _emit


def _dedup_bucket(group: pa.Table) -> pa.Table:
    import pandas as pd

    df = pd.DataFrame(
        {"id_a": group.column("id_a").to_pylist(), "id_b": group.column("id_b").to_pylist()}
    ).drop_duplicates()
    return pa.Table.from_pandas(df, preserve_index=False)


def candidate_pairs_raw(
    flat_ds: "ray.data.Dataset",
    predicate_ids: list[str],
    max_block_size: int = 1024,
    map_batch_size: int = 8192,
    index_tables: dict | None = None,
) -> "ray.data.Dataset":
    """Block-key explode + per-bucket pair emission, NOT yet deduped:
    rows (id_a, id_b, oversized, pbucket) where oversized==1 rows are
    dropped-block markers. Checkpointable as ONE artifact so both the
    deduped pairs and the oversized count derive from it without
    re-running the blocking pass."""
    blocked = flat_ds.map_batches(
        make_block_explode_stage(predicate_ids, with_bucket=True, index_tables=index_tables),
        batch_format="pyarrow",
        batch_size=map_batch_size,
    )
    return blocked.groupby("bucket").map_groups(
        make_bucket_pair_emit_fn(max_block_size), batch_format="pyarrow"
    )


def dedup_pairs(raw_pairs: "ray.data.Dataset") -> "ray.data.Dataset":
    """Raw emitted pairs → globally distinct canonical pairs (drops marker
    rows; bucketed dedup shuffle)."""
    return (
        raw_pairs.filter(expr="oversized == 0")
        .drop_columns(["oversized"])
        .groupby("pbucket")
        .map_groups(_dedup_bucket, batch_format="pyarrow")
    )


def candidate_pairs(
    flat_ds: "ray.data.Dataset",
    predicate_ids: list[str],
    max_block_size: int = 1024,
    map_batch_size: int = 8192,
    index_tables: dict | None = None,
) -> tuple["ray.data.Dataset", "ray.data.Dataset"]:
    """flat record Dataset → (unique candidate pair Dataset, oversized-block marker Dataset).

    Pairs schema: (id_a: string, id_b: string), id_a < id_b, globally
    distinct. Two bucketed shuffles (see N_BUCKETS note): block-key buckets
    → vectorized pair emission, pair-hash buckets → vectorized dedup.
    """
    raw_pairs = candidate_pairs_raw(
        flat_ds, predicate_ids, max_block_size, map_batch_size, index_tables
    )
    oversized = raw_pairs.filter(expr="oversized == 1")
    return dedup_pairs(raw_pairs), oversized


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
