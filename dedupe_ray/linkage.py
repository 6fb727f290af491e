"""Two-dataset record linkage (L20 — [lib: dedupe/api.py RecordLink]).

The reference app never calls RecordLink (it merges files into one table,
A20/A21), but the library surface exists; this re-creates it on the same
Ray stages as dedupe: blocking and scoring run over the UNION of both
sides with side-prefixed ids, candidate pairs are filtered to cross-side
only, and matches are reduced per-left — ``many_to_one`` as a bucketed
distributed argmax, ``one_to_one`` as the greedy highest-score-first
assignment ([lib: dedupe/api.py RecordLink.join one-to-one semantics],
driver-side over the thresholded match list, which is ≤ min(|A|,|B|)
after the per-side pre-reduction).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from dedupe_ray.blocking import candidate_pairs
from dedupe_ray.pipeline import RayDeduper
from dedupe_ray.scoring import assemble_pairs, score_pairs

_A = "a\x1f"
_B = "b\x1f"


def _prefix(ds: "ray.data.Dataset", prefix: str) -> "ray.data.Dataset":
    def _fn(t: pa.Table) -> pa.Table:
        i = t.schema.get_field_index("doc_id")
        col = pc.binary_join_element_wise(
            pa.array([prefix] * len(t), pa.string()), pc.cast(t.column("doc_id"), pa.string()), ""
        )
        return t.set_column(i, "doc_id", col)

    return ds.map_batches(_fn, batch_format="pyarrow")


def link_records(
    flat_a: "ray.data.Dataset",
    flat_b: "ray.data.Dataset",
    deduper: RayDeduper,
    threshold: float | None = None,
    match_mode: str = "one_to_one",
    one_to_one_limit: int = 5_000_000,
) -> "ray.data.Dataset":
    """Link records of ``flat_a`` to records of ``flat_b`` using a trained
    :class:`RayDeduper` model. Returns (id_a, id_b, score) — ids are the
    ORIGINAL doc_ids of each side.

    match_mode:
    - ``"pairs"``: every cross-side pair above threshold.
    - ``"many_to_one"``: best B-match per A record (distributed argmax).
    - ``"one_to_one"``: greedy mutual assignment, highest score first
      (after a distributed per-A-record top-1 pre-reduction, the greedy
      list is ≤ |A| rows; ``one_to_one_limit`` guards the driver pull).
    """
    if threshold is None:
        threshold = deduper.config.similarity_threshold
    if not deduper.predicate_ids:
        raise ValueError("deduper is not trained")
    cfg = deduper.config
    both = _prefix(flat_a, _A).union(_prefix(flat_b, _B)).materialize()
    pairs, _oversized = candidate_pairs(
        both,
        deduper.predicate_ids,
        max_block_size=cfg.max_block_size,
        map_batch_size=cfg.map_batch_size,
        index_tables=deduper.index_tables,
    )

    # cross-side only: canonical id_a < id_b ordering puts the A-side id
    # (prefix 'a\\x1f') first in every cross pair; same-side pairs share a
    # prefix and are dropped.
    def cross_only(t: pa.Table) -> pa.Table:
        pa_side = pc.utf8_slice_codeunits(t.column("id_a"), 0, 2)
        pb_side = pc.utf8_slice_codeunits(t.column("id_b"), 0, 2)
        return t.filter(pc.and_(pc.equal(pa_side, _A), pc.equal(pb_side, _B)))

    cross = pairs.map_batches(cross_only, batch_format="pyarrow")
    assembled = assemble_pairs(
        cross,
        both,
        cfg.field_names(),
        broadcast_limit=cfg.broadcast_record_limit,
        batch_size=cfg.score_batch_size,
    )
    scored = score_pairs(
        assembled,
        deduper.classifier.to_dict(),
        cfg,
        idf_tables=deduper.idf_tables or None,
        batch_size=cfg.score_batch_size,
    ).filter(expr=f"score >= {threshold}")

    def strip(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "id_a": pc.utf8_slice_codeunits(t.column("id_a"), 2, 2**30),
                "id_b": pc.utf8_slice_codeunits(t.column("id_b"), 2, 2**30),
                "score": t.column("score"),
            }
        )

    if match_mode == "pairs":
        return scored.map_batches(strip, batch_format="pyarrow")

    # per-A-record top-1 (bucketed argmax — vectorized per bucket)
    from dedupe_ray.blocking import N_BUCKETS

    def bucketize(t: pa.Table) -> pa.Table:
        import zlib

        h = np.fromiter(
            (zlib.crc32(v.encode()) % N_BUCKETS for v in t.column("id_a").to_pylist()),
            np.int32,
            len(t),
        )
        return t.append_column("abucket", pa.array(h))

    top_k = 1 if match_mode == "many_to_one" else 3

    def top1(group: pa.Table) -> pa.Table:
        df = group.select(["id_a", "id_b", "score"]).to_pandas()
        # deterministic: max score, ties to smallest id_b; one_to_one keeps
        # top-3 per A so the greedy can fall back to a second choice when
        # an A record's best B is claimed by a higher-scoring pair
        df = df.sort_values(["id_a", "score", "id_b"], ascending=[True, False, True])
        df = df.groupby("id_a", as_index=False).head(top_k)
        return pa.Table.from_pandas(df, preserve_index=False)

    best = (
        scored.map_batches(bucketize, batch_format="pyarrow")
        .groupby("abucket")
        .map_groups(top1, batch_format="pyarrow")  # selects its own columns
    )
    if match_mode == "many_to_one":
        return best.map_batches(strip, batch_format="pyarrow")
    if match_mode != "one_to_one":
        raise ValueError(match_mode)

    n = best.count()
    if n > one_to_one_limit:
        raise ValueError(
            f"one_to_one match list has {n} rows (> {one_to_one_limit}); "
            f"use many_to_one or raise the limit"
        )
    df = best.to_pandas().sort_values(["score", "id_a", "id_b"], ascending=[False, True, True])
    used_a: set[str] = set()
    used_b: set[str] = set()
    keep = []
    for _, row in df.iterrows():
        if row["id_a"] in used_a or row["id_b"] in used_b:
            continue
        used_a.add(row["id_a"])
        used_b.add(row["id_b"])
        keep.append(row)
    import pandas as pd

    out = pd.DataFrame(keep, columns=["id_a", "id_b", "score"]).reset_index(drop=True)
    out["id_a"] = out["id_a"].str[2:]
    out["id_b"] = out["id_b"].str[2:]
    return ray.data.from_pandas(out)
