"""Pair feature vectors.

Mirrors the reference DataModel's distance matrix [lib: dedupe/datamodel.py]:
one column per field comparator plus, for ``has_missing=True`` fields, a
missing-indicator column (distance forced to 0 when either side is missing,
indicator 1) — so the logistic classifier can learn a per-field missing
penalty exactly like the reference.

Input layout: a pyarrow batch with columns ``a_<field>`` and ``b_<field>``
(the joined pair sides). Output: float32 matrix [n, n_features].
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from dedupe_ray.config import MISSING, EngineConfig, FieldConfig
from dedupe_ray.distances import (
    affine_gap_batch,
    datetime_distance_batch,
    exact_distance_batch,
    haversine_batch,
    jaccard_set_batch,
    price_distance_batch,
    tfidf_cosine_batch,
    token_align_batch,
)


def _cat_pairs(cats: tuple[str, ...]) -> list[tuple[str, str]]:
    out = []
    for i in range(len(cats)):
        for j in range(i + 1, len(cats)):
            out.append((cats[i], cats[j]))
    return out


def field_feature_names(f: FieldConfig) -> list[str]:
    """Feature columns contributed by one field (in layout order)."""
    if f.type == "Categorical":
        return [f"cat_{f.field}_same"] + [
            f"cat_{f.field}_{a}|{b}" for a, b in _cat_pairs(f.categories or ())
        ]
    if f.type == "Exists":
        return [f"ex_{f.field}_both", f"ex_{f.field}_one"]
    if f.type == "Interaction":
        return [f"inter_{f.field}"]
    if f.token_align:
        return [f"d_{f.field}", f"ta_{f.field}"]
    return [f"d_{f.field}"]


def _indicator_fields(config: EngineConfig) -> list[FieldConfig]:
    """Fields that get a missing-indicator column: has_missing, except
    Exists (missing IS its feature) and Interaction (no own value)."""
    return [
        f for f in config.fields
        if f.has_missing and f.type not in ("Exists", "Interaction")
    ]


def feature_names(config: EngineConfig) -> list[str]:
    names = []
    for f in config.fields:
        names.extend(field_feature_names(f))
    for f in _indicator_fields(config):
        names.append(f"miss_{f.field}")
    return names


def _field_distance(
    f: FieldConfig, a: list[str], b: list[str], idf: dict | None
) -> np.ndarray:
    if f.type in ("String", "ShortString"):
        # [lib] ShortString shares the affine-gap comparator; it differs in
        # predicate eligibility (no canopy indexes), not in the distance
        return affine_gap_batch(a, b)
    if f.type == "Exact":
        return exact_distance_batch(a, b)
    if f.type == "Price":
        return price_distance_batch(a, b)
    if f.type == "DateTime":
        return datetime_distance_batch(a, b)
    if f.type == "LatLong":
        return haversine_batch(a, b)
    if f.type == "Set":
        return jaccard_set_batch(a, b)
    if f.type == "Text":
        table = idf or {}
        return tfidf_cosine_batch(a, b, table.get("idf", {}), table.get("default_idf", 1.0))
    if f.type == "Custom":
        return np.asarray(_resolve_comparator(f.comparator)(a, b), np.float32)
    raise ValueError(f.type)


_COMPARATOR_CACHE: dict[str, object] = {}


def _resolve_comparator(path: str):
    """"module:attr" → callable; cached per worker process. An import path
    (not a pickled callable) keeps settings JSON round-trippable — the
    user's module must be importable on every Ray worker."""
    fn = _COMPARATOR_CACHE.get(path)
    if fn is None:
        import importlib

        mod, _, attr = path.partition(":")
        if not attr:
            raise ValueError(f'comparator must be "module:attr", got {path!r}')
        fn = getattr(importlib.import_module(mod), attr)
        _COMPARATOR_CACHE[path] = fn
    return fn


def _categorical_block(
    f: FieldConfig, ca, cb, miss: np.ndarray
) -> np.ndarray:
    """[lib: dedupe/variables/categorical_type.py] dummy expansion: one
    'same category' column + one column per unordered category pair.
    Vectorized via searchsorted over the declared categories; values
    outside the declared set (or missing) leave every dummy at 0."""
    cats = np.array(sorted(f.categories or ()), object)
    pairs = _cat_pairs(f.categories or ())
    pair_idx = {frozenset(p): i for i, p in enumerate(pairs)}
    n = len(miss)
    out = np.zeros((n, 1 + len(pairs)), np.float32)
    a_vals = np.asarray(ca.to_pylist(), object)
    b_vals = np.asarray(cb.to_pylist(), object)
    ia = np.searchsorted(cats, a_vals)
    ib = np.searchsorted(cats, b_vals)
    ia_c = np.minimum(ia, len(cats) - 1)
    ib_c = np.minimum(ib, len(cats) - 1)
    va = (ia < len(cats)) & (cats[ia_c] == a_vals) & ~miss
    vb = (ib < len(cats)) & (cats[ib_c] == b_vals) & ~miss
    ok = va & vb
    same = ok & (a_vals == b_vals)
    out[same, 0] = 1.0
    for r in np.nonzero(ok & ~same)[0]:
        out[r, 1 + pair_idx[frozenset((a_vals[r], b_vals[r]))]] = 1.0
    return out


def _miss_mask(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    import pyarrow.compute as pc

    filled = pc.fill_null(col, MISSING)
    m = pc.or_(pc.equal(filled, MISSING), pc.equal(filled, ""))
    return m.to_numpy(zero_copy_only=False).astype(bool)


def pair_features(
    batch: pa.Table, config: EngineConfig, idf_tables: dict[str, dict] | None = None
) -> np.ndarray:
    """(a_*, b_*) pair batch → feature matrix [n, n_features] float32.

    Missing detection is vectorized in pyarrow; the (expensive) distance
    kernel only runs on rows where both sides are present."""
    n = len(batch)
    blocks: list[np.ndarray] = []
    missing_cols: list[np.ndarray] = []
    primary: dict[str, np.ndarray] = {}  # field → its first feature column
    miss_by_field: dict[str, np.ndarray] = {}
    interactions: list[tuple[int, FieldConfig]] = []
    for f in config.fields:
        if f.type == "Interaction":
            blocks.append(np.zeros((n, 1), np.float32))  # filled below
            interactions.append((len(blocks) - 1, f))
            continue
        ca = batch.column(f"a_{f.field}")
        cb = batch.column(f"b_{f.field}")
        miss = _miss_mask(ca) | _miss_mask(cb)
        miss_by_field[f.field] = miss
        if f.type == "Exists":
            # [lib: dedupe/variables/exists.py]: presence-pattern dummies;
            # both-missing is the reference level
            ma = _miss_mask(ca)
            mb = _miss_mask(cb)
            block = np.column_stack(
                [(~ma & ~mb).astype(np.float32), (ma ^ mb).astype(np.float32)]
            )
        elif f.type == "Categorical":
            block = _categorical_block(f, ca, cb, miss)
        else:
            d = np.zeros(n, np.float32)
            ta_col = np.zeros(n, np.float32) if f.token_align else None
            idx = np.nonzero(~miss)[0]
            if idx.size:
                a_all = ca.to_pylist()
                b_all = cb.to_pylist()
                a = [a_all[i] for i in idx]
                b = [b_all[i] for i in idx]
                dv = _field_distance(f, a, b, (idf_tables or {}).get(f.field))
                d[idx] = np.nan_to_num(dv, nan=0.0, posinf=0.0, neginf=0.0).astype(np.float32)
                if ta_col is not None:
                    ta_col[idx] = token_align_batch(a, b)
            block = (
                np.column_stack([d, ta_col]) if ta_col is not None else d.reshape(-1, 1)
            )
        blocks.append(block.astype(np.float32))
        primary[f.field] = blocks[-1][:, 0]
    # Interaction = product of the member fields' primary features
    # ([lib: dedupe/variables/interaction.py])
    for bi, f in interactions:
        prod = np.ones(n, np.float32)
        for g in f.interaction_fields or ():
            prod = prod * primary.get(g, np.zeros(n, np.float32))
        blocks[bi] = prod.reshape(-1, 1)
    for f in _indicator_fields(config):
        missing_cols.append(miss_by_field[f.field].astype(np.float32).reshape(-1, 1))
    return np.column_stack([b for b in blocks + missing_cols]).astype(np.float32)


def monotone_feature_dims(config: EngineConfig) -> tuple[list[int], list[int]]:
    """Sign constraints for the classifier, per the pair_features layout
    (field feature blocks in field order, then missing indicators):
    String/ShortString/Price/DateTime/LatLong comparators are DISTANCES
    (weight ≤ 0), Exact/Text/Set are SIMILARITIES (weight ≥ 0);
    Categorical/Exists/Interaction dummies and the indicators stay
    unconstrained."""
    neg: list[int] = []
    pos: list[int] = []
    i = 0
    for f in config.fields:
        k = len(field_feature_names(f))
        if f.type in ("Exact", "Text", "Set") or (f.type == "Custom" and f.similarity):
            pos.append(i)
        elif f.type in ("String", "ShortString", "Price", "DateTime", "LatLong", "Custom"):
            neg.append(i)
        if f.token_align:
            neg.append(i + 1)  # ta_<field> sits right after the primary; a DISTANCE
        i += k
    return neg, pos


def compute_idf(
    flat_ds, field: str, min_df: int = 2, max_vocab: int = 1_000_000
) -> dict:
    """Ray doc-frequency pass for a Text field → broadcastable idf table.

    Per-batch partial: each doc contributes its UNIQUE tokens once (df, not
    tf) pre-aggregated within the batch (combiner pattern) → one small
    ``groupby(token).sum`` shuffle → driver table. Tokens with df < min_df
    are left out (their idf equals ``default_idf`` = ln N anyway, and the
    long tail is most of the vocabulary); the collected vocabulary is capped
    at ``max_vocab`` by df so the broadcast stays bounded at any corpus
    size."""
    import math

    import pyarrow as pa
    from ray.data.aggregate import Sum

    from dedupe_ray.distances import _TOKEN

    n_docs = flat_ds.count()

    def partial_df(batch: pa.Table) -> pa.Table:
        counts: dict[str, int] = {}
        for v in batch.column(field).to_pylist():
            for t in set(_TOKEN.findall(v or "")):
                counts[t] = counts.get(t, 0) + 1
        return pa.table(
            {
                "token": pa.array(list(counts.keys()), pa.string()),
                "df": pa.array(list(counts.values()), pa.int64()),
            }
        )

    agg = (
        flat_ds.map_batches(partial_df, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("df", alias_name="df"))
    )
    kept = agg.filter(expr=f"df >= {min_df}")
    if kept.count() > max_vocab:
        kept = kept.sort("df", descending=True).limit(max_vocab)
    idf = {
        r["token"]: math.log(max(n_docs, 1) / r["df"]) for r in kept.take_all()
    }
    return {"idf": idf, "default_idf": math.log(max(n_docs, 1))}
