"""Similarity search over an embedding column (list<float>).

- brute_force_topk: baseline — per-batch numpy matmul against a broadcast
  query matrix (``ray.put`` once, read in every task), partial top-k per
  batch, final top-k reduce on the tiny result. Scales linearly with rows,
  no shuffle.
- ivf_topk: the scale path — k-means-ish coarse quantizer (trained on a
  driver sample), rows bucketed by nearest centroid (one shuffle at build),
  queries probe only nprobe buckets.
- embedding_near_dup_pairs: cosine near-duplicate pairs via the same
  centroid bucketing (groupby bucket → within-bucket pairwise cosine).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data


def _batch_matrix(batch: pa.Table, col: str = "embedding") -> np.ndarray:
    arr = batch.column(col)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    flat = arr.flatten().to_numpy(zero_copy_only=False)
    return flat.reshape(len(batch), -1).astype(np.float32)


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    return m / np.maximum(n, 1e-12)


def brute_force_topk(
    ds: "ray.data.Dataset",
    queries: np.ndarray,
    k: int = 10,
    id_column: str = "vec_id",
) -> pa.Table:
    """Exact cosine top-k for each query row.

    Per-batch: normalized matmul [batch × dim]·[dim × nq] → per-batch top-k
    partials; driver reduces partials (nq·k·num_batches rows — tiny).
    Returns (query_id, vec_id, cosine, rank)."""
    qn = _normalize(np.atleast_2d(np.asarray(queries, np.float32)))
    qref = ray.put(qn)

    def partial_topk(batch: pa.Table) -> pa.Table:
        q = ray.get(qref)
        m = _normalize(_batch_matrix(batch))
        sims = m @ q.T  # [n, nq]
        n, nq = sims.shape
        kk = min(k, n)
        ids = np.asarray(batch.column(id_column).to_pylist())
        top = np.argpartition(-sims, kk - 1, axis=0)[:kk]  # [kk, nq]
        out_q, out_id, out_s = [], [], []
        for j in range(nq):
            sel = top[:, j]
            out_q.extend([j] * kk)
            out_id.extend(ids[sel].tolist())
            out_s.extend(sims[sel, j].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int32()),
                id_column: pa.array(out_id, type=pa.from_numpy_dtype(ids.dtype) if ids.dtype != object else pa.string()),
                "cosine": pa.array(np.asarray(out_s, np.float32)),
            }
        )

    partials = ds.map_batches(partial_topk, batch_format="pyarrow").to_pandas()
    out = (
        partials.sort_values(["query_id", "cosine"], ascending=[True, False])
        .groupby("query_id", as_index=False)
        .head(k)
    )
    out["rank"] = out.groupby("query_id").cumcount().astype("int32")
    return pa.Table.from_pandas(out.reset_index(drop=True), preserve_index=False)


def _knn_join_ivf(
    ds: "ray.data.Dataset",
    k: int,
    id_column: str,
    n_total: int,
    n_centroids: int | None = None,
    nprobe: int = 4,
) -> "ray.data.Dataset":
    """Approximate cosine k-NN SELF-join at index sizes where the broadcast
    matrix no longer fits: IVF bucketing as a distributed shuffle.

    Shape: each vector is emitted ONCE as an index member of its nearest
    centroid's bucket, and ``nprobe`` times as a query of its nprobe nearest
    buckets → groupby(bucket) computes within-bucket query×member top-k
    (member sets are disjoint across buckets, so partials never duplicate a
    (query, neighbor) pair) → a second small groupby merges per-query
    partials to the global top-k. Shuffle volume is (nprobe+1)× the corpus —
    the standard IVF trade-off — and no stage materializes more than one
    bucket. Measured recall@5 vs the exact path on sf0.01 embeddings
    (near-uniform vectors — IVF's worst case — 16 centroids): 0.60 at
    nprobe=4, 0.72 at nprobe=6, 0.82 at nprobe=8; on clustered data
    (test_knn_join_overflow_routes_to_ivf) ≥0.8 already at nprobe=4.
    Recall → 1.0 as nprobe → n_centroids."""
    if n_centroids is None:
        n_centroids = max(16, int(np.ceil(n_total / 4096)))
    cent = train_centroids(ds, n_centroids)
    cref = ray.put(_normalize(cent.astype(np.float64)))

    def emit(batch: pa.Table) -> pa.Table:
        cent_l = ray.get(cref)
        np_ = min(nprobe, cent_l.shape[0])
        m = _normalize(_batch_matrix(batch).astype(np.float64))
        ids = np.asarray(batch.column(id_column).to_pylist(), np.int64)
        order = np.argsort(-(m @ cent_l.T), axis=1)[:, :np_]
        n = len(ids)
        out_ids = np.concatenate([ids, np.repeat(ids, np_)])
        out_bucket = np.concatenate([order[:, 0], order.reshape(-1)]).astype(np.int32)
        out_role = np.concatenate([np.zeros(n, np.int8), np.ones(n * np_, np.int8)])
        emb = np.concatenate([m, np.repeat(m, np_, axis=0)]).astype(np.float32)
        dim = emb.shape[1] if len(emb) else 0
        return pa.table(
            {
                id_column: pa.array(out_ids),
                "bucket": pa.array(out_bucket),
                "role": pa.array(out_role),
                "emb": pa.FixedSizeListArray.from_arrays(
                    pa.array(emb.reshape(-1), pa.float32()), dim or 1
                ),
            }
        )

    def per_bucket(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                id_column: pa.array([], pa.int64()),
                "neighbor_id": pa.array([], pa.int64()),
                "cosine": pa.array([], pa.float64()),
            }
        )
        role = np.asarray(group.column("role").to_pylist(), np.int8)
        ids = np.asarray(group.column(id_column).to_pylist(), np.int64)
        emb_col = group.column("emb")
        if isinstance(emb_col, pa.ChunkedArray):
            emb_col = emb_col.combine_chunks()
        mat = emb_col.flatten().to_numpy(zero_copy_only=False).reshape(len(group), -1).astype(np.float64)
        mem = role == 0
        qry = ~mem
        if not mem.any() or not qry.any():
            return empty
        mem_ids, mem_m = ids[mem], mat[mem]
        q_ids, q_m = ids[qry], mat[qry]
        # sort members by id so self-exclusion is a searchsorted
        mo = np.argsort(mem_ids, kind="stable")
        mem_ids, mem_m = mem_ids[mo], mem_m[mo]
        out_q, out_n, out_s = [], [], []
        for lo in range(0, len(q_ids), 1024):  # bound the matmul working set
            qs = q_m[lo : lo + 1024]
            qi = q_ids[lo : lo + 1024]
            sims = qs @ mem_m.T
            pos = np.minimum(np.searchsorted(mem_ids, qi), len(mem_ids) - 1)
            self_rows = np.nonzero(mem_ids[pos] == qi)[0]
            sims[self_rows, pos[self_rows]] = -np.inf
            kk = min(k, sims.shape[1])
            cand = np.argpartition(-sims, kk - 1, axis=1)[:, :kk] if kk < sims.shape[1] else np.tile(np.arange(sims.shape[1]), (len(qs), 1))
            rows = np.arange(len(qs))[:, None]
            c_s = sims[rows, cand]
            keep = c_s > -np.inf
            out_q.append(np.repeat(qi, kk)[keep.reshape(-1)])
            out_n.append(mem_ids[cand].reshape(-1)[keep.reshape(-1)])
            out_s.append(c_s.reshape(-1)[keep.reshape(-1)])
        if not out_q:
            return empty
        return pa.table(
            {
                id_column: pa.array(np.concatenate(out_q)),
                "neighbor_id": pa.array(np.concatenate(out_n)),
                "cosine": pa.array(np.concatenate(out_s)),
            }
        )

    partials = (
        ds.map_batches(emit, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pyarrow")
    )

    def add_qb(batch: pa.Table) -> pa.Table:
        qb = np.asarray(batch.column(id_column).to_pylist(), np.int64) % 256
        return batch.append_column("qb", pa.array(qb.astype(np.int32)))

    import pandas as pd

    def merge_topk(g: "pd.DataFrame") -> "pd.DataFrame":
        g = g.sort_values(
            [id_column, "cosine", "neighbor_id"], ascending=[True, False, True]
        )
        g = g.groupby(id_column, as_index=False).head(k).copy()
        g["rank"] = g.groupby(id_column).cumcount().astype("int32")
        return g[[id_column, "neighbor_id", "rank"]]

    return (
        partials.map_batches(add_qb, batch_format="pyarrow")
        .groupby("qb")
        .map_groups(merge_topk, batch_format="pandas")
    )


def knn_join(
    ds: "ray.data.Dataset",
    k: int = 5,
    id_column: str = "vec_id",
    index_limit: int = 4_000_000,
    on_overflow: str = "ivf",
) -> "ray.data.Dataset":
    """Cosine k-nearest-neighbor SELF-join: for every vector, its k
    most-similar other vectors (self excluded), ties on cosine broken by
    ascending neighbor id.

    Broadcast-index design below ``index_limit``: the id-sorted normalized
    corpus matrix is assembled once on the driver (float64), ``ray.put``
    once, and the SAME dataset streams through ``map_batches``: one
    [B×dim]·[dim×N] matmul per batch. Because the index side is complete,
    each batch's top-k rows are FINAL — the output streams with no driver
    reduce, and results are exact.

    Above ``index_limit`` the join auto-routes to the bucketed IVF path
    (``_knn_join_ivf``): approximate (bucket-local recall; measured
    recall@5 on sf0.01 = 0.60–0.82 for nprobe 4–8 on near-uniform vectors,
    ≥0.8 at nprobe=4 on clustered data — see its docstring), but
    fully distributed — no driver-side matrix, shuffle-bounded at
    (nprobe+1)× the corpus. Pass ``on_overflow="raise"`` to forbid the
    approximate fallback.

    Returns a Dataset of (``id_column``, neighbor_id, rank)."""
    n_total = ds.count()
    if n_total > index_limit:
        if on_overflow == "ivf":
            return _knn_join_ivf(ds, k, id_column, n_total)
        raise ValueError(
            f"knn_join index side has {n_total} rows > index_limit={index_limit}; "
            "use ivf_build/ivf_search or embedding_near_dup_pairs at this scale"
        )
    ids_parts: list[np.ndarray] = []
    mat_parts: list[np.ndarray] = []
    for batch in ds.select_columns([id_column, "embedding"]).iter_batches(
        batch_format="pyarrow"
    ):
        ids_parts.append(
            np.asarray(batch.column(id_column).to_pylist(), np.int64)
        )
        mat_parts.append(_batch_matrix(batch).astype(np.float64))
    ids_all = np.concatenate(ids_parts) if ids_parts else np.empty(0, np.int64)
    mat = (
        np.concatenate(mat_parts)
        if mat_parts
        else np.empty((0, 0), np.float64)
    )
    order = np.argsort(ids_all, kind="stable")
    ids_sorted = ids_all[order]
    mat_sorted = _normalize(mat[order])
    iref = ray.put((ids_sorted, mat_sorted))
    kk = min(k, max(len(ids_sorted) - 1, 0))

    def topk_batch(batch: pa.Table) -> pa.Table:
        ids_idx, m_idx = ray.get(iref)
        if len(batch) == 0 or kk == 0:
            return pa.table(
                {
                    id_column: pa.array([], pa.int64()),
                    "neighbor_id": pa.array([], pa.int64()),
                    "rank": pa.array([], pa.int32()),
                }
            )
        q = _normalize(_batch_matrix(batch).astype(np.float64))
        qids = np.asarray(batch.column(id_column).to_pylist(), np.int64)
        sims = q @ m_idx.T  # [B, N]
        # exclude self (id equality, not position — ds may be reordered)
        pos = np.searchsorted(ids_idx, qids)
        pos = np.minimum(pos, len(ids_idx) - 1)
        self_rows = np.nonzero(ids_idx[pos] == qids)[0]
        sims[self_rows, pos[self_rows]] = -np.inf
        cand = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]  # [B, kk]
        rows = np.arange(len(q))[:, None]
        c_sims = sims[rows, cand]
        c_ids = ids_idx[cand]
        # within-row order: cosine desc, neighbor id asc (two stable passes)
        by_id = np.argsort(c_ids, axis=1, kind="stable")
        c_sims = np.take_along_axis(c_sims, by_id, axis=1)
        c_ids = np.take_along_axis(c_ids, by_id, axis=1)
        by_sim = np.argsort(-c_sims, axis=1, kind="stable")
        c_ids = np.take_along_axis(c_ids, by_sim, axis=1)
        return pa.table(
            {
                id_column: pa.array(np.repeat(qids, kk)),
                "neighbor_id": pa.array(c_ids.reshape(-1)),
                "rank": pa.array(
                    np.tile(np.arange(kk, dtype=np.int32), len(q))
                ),
            }
        )

    return ds.map_batches(topk_batch, batch_format="pyarrow")


def train_centroids(
    ds: "ray.data.Dataset", n_centroids: int = 16, sample: int = 2048, iters: int = 10, seed: int = 42
) -> np.ndarray:
    """Lloyd's k-means on a driver-side sample (coarse quantizer training —
    sample fits trivially; assignment is the distributed part)."""
    total = ds.count()
    frac = min(1.0, sample / max(total, 1))
    rows = ds.random_sample(frac, seed=seed).take(sample)
    X = _normalize(
        np.stack([np.asarray(r["embedding"], np.float32) for r in rows])
    )
    rng = np.random.RandomState(seed)
    cent = X[rng.choice(len(X), min(n_centroids, len(X)), replace=False)]
    for _ in range(iters):
        assign = (X @ cent.T).argmax(axis=1)
        for c in range(len(cent)):
            members = X[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
        cent = _normalize(cent)
    return cent


def assign_buckets(
    ds: "ray.data.Dataset", centroids: np.ndarray, id_column: str = "vec_id"
) -> "ray.data.Dataset":
    """Add ``bucket: int32`` = nearest centroid (broadcast, map-side)."""
    cref = ray.put(_normalize(centroids.astype(np.float32)))

    def _assign(batch: pa.Table) -> pa.Table:
        cent = ray.get(cref)
        m = _normalize(_batch_matrix(batch))
        b = (m @ cent.T).argmax(axis=1).astype(np.int32)
        return batch.append_column("bucket", pa.array(b))

    return ds.map_batches(_assign, batch_format="pyarrow")


def ivf_topk(
    ds: "ray.data.Dataset",
    queries: np.ndarray,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    id_column: str = "vec_id",
) -> pa.Table:
    """IVF approximate top-k: probe only the nprobe nearest buckets per query.

    At cluster scale the bucketed table is written partitioned by bucket so
    probes read only matching partitions; here the filter is map-side."""
    cent = train_centroids(ds, n_centroids)
    bucketed = assign_buckets(ds, cent, id_column)
    qn = _normalize(np.atleast_2d(np.asarray(queries, np.float32)))
    probes = np.argsort(-(qn @ cent.T), axis=1)[:, :nprobe]  # [nq, nprobe]
    wanted = sorted(int(b) for b in np.unique(probes))
    import pyarrow.compute as pc

    filtered = bucketed.map_batches(
        lambda t: t.filter(pc.is_in(t.column("bucket"), value_set=pa.array(wanted, pa.int32()))),
        batch_format="pyarrow",
    )
    probe_ref = ray.put(probes)
    qref = ray.put(qn)

    def partial_topk(batch: pa.Table) -> pa.Table:
        q = ray.get(qref)
        pr = ray.get(probe_ref)
        m = _normalize(_batch_matrix(batch))
        bk = batch.column("bucket").to_numpy(zero_copy_only=False)
        ids = np.asarray(batch.column(id_column).to_pylist())
        sims = m @ q.T
        out_q, out_id, out_s = [], [], []
        for j in range(q.shape[0]):
            mask = np.isin(bk, pr[j])
            if not mask.any():
                continue
            s = sims[mask, j]
            sel_ids = ids[mask]
            kk = min(k, len(s))
            top = np.argpartition(-s, kk - 1)[:kk]
            out_q.extend([j] * kk)
            out_id.extend(sel_ids[top].tolist())
            out_s.extend(s[top].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int32()),
                id_column: pa.array(out_id, type=pa.from_numpy_dtype(ids.dtype) if ids.dtype != object else pa.string()),
                "cosine": pa.array(np.asarray(out_s, np.float32)),
            }
        )

    partials = filtered.map_batches(partial_topk, batch_format="pyarrow").to_pandas()
    out = (
        partials.sort_values(["query_id", "cosine"], ascending=[True, False])
        .groupby("query_id", as_index=False)
        .head(k)
    )
    out["rank"] = out.groupby("query_id").cumcount().astype("int32")
    return pa.Table.from_pandas(out.reset_index(drop=True), preserve_index=False)


def ivf_build(
    ds: "ray.data.Dataset",
    path: str,
    n_centroids: int = 16,
    id_column: str = "vec_id",
) -> np.ndarray:
    """Build a bucket-partitioned IVF index on disk: rows written as
    parquet partitioned by nearest-centroid bucket (one directory per
    bucket), centroids saved beside it. This is the REAL pruning layout —
    a probe reads only the matching partition directories off storage,
    instead of scanning every row with a map-side filter."""
    import shutil

    cent = train_centroids(ds, n_centroids)
    bucketed = assign_buckets(ds, cent, id_column)
    shutil.rmtree(path, ignore_errors=True)
    bucketed.write_parquet(path, partition_cols=["bucket"])
    np.save(path + "_centroids.npy", cent)
    return cent


def ivf_search(
    path: str,
    queries: np.ndarray,
    k: int = 10,
    nprobe: int = 4,
    id_column: str = "vec_id",
) -> pa.Table:
    """Query a built IVF index: only the nprobe nearest bucket PARTITIONS
    are read (partition-pruned parquet read), then the same per-batch
    partial top-k as brute force within them."""
    import os

    cent = np.load(path + "_centroids.npy")
    qn = _normalize(np.atleast_2d(np.asarray(queries, np.float32)))
    probes = np.argsort(-(qn @ cent.T), axis=1)[:, :nprobe]  # [nq, nprobe]
    wanted = sorted({int(b) for b in probes.reshape(-1)})
    # path-level partition pruning: only the probed bucket directories are
    # ever opened (the bucket column is also stored in the files, so no
    # re-tagging is needed)
    import glob

    subdirs = [
        f
        for b in wanted
        for f in sorted(glob.glob(os.path.join(path, f"bucket={b}", "*.parquet")))
    ]
    if not subdirs:
        return pa.table(
            {
                "query_id": pa.array([], pa.int32()),
                id_column: pa.array([], pa.int64()),
                "cosine": pa.array([], pa.float32()),
                "rank": pa.array([], pa.int32()),
            }
        )
    ds = ray.data.read_parquet(subdirs)
    probe_ref = ray.put(probes)
    qref = ray.put(qn)

    def partial_topk(batch: pa.Table) -> pa.Table:
        q = ray.get(qref)
        pr = ray.get(probe_ref)
        m = _normalize(_batch_matrix(batch))
        bk = np.asarray(batch.column("bucket").to_pylist(), np.int64)
        ids = np.asarray(batch.column(id_column).to_pylist())
        sims = m @ q.T
        out_q, out_id, out_s = [], [], []
        for j in range(q.shape[0]):
            mask = np.isin(bk, pr[j])
            if not mask.any():
                continue
            s = sims[mask, j]
            sel_ids = ids[mask]
            kk = min(k, len(s))
            top = np.argpartition(-s, kk - 1)[:kk]
            out_q.extend([j] * kk)
            out_id.extend(sel_ids[top].tolist())
            out_s.extend(s[top].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int32()),
                id_column: pa.array(out_id, type=pa.from_numpy_dtype(ids.dtype) if ids.dtype != object else pa.string()),
                "cosine": pa.array(np.asarray(out_s, np.float32)),
            }
        )

    partials = ds.map_batches(partial_topk, batch_format="pyarrow").to_pandas()
    out = (
        partials.sort_values(["query_id", "cosine"], ascending=[True, False])
        .groupby("query_id", as_index=False)
        .head(k)
    )
    out["rank"] = out.groupby("query_id").cumcount().astype("int32")
    return pa.Table.from_pandas(out.reset_index(drop=True), preserve_index=False)


def embedding_near_dup_pairs(
    ds: "ray.data.Dataset",
    cosine_threshold: float = 0.95,
    n_centroids: int = 16,
    id_column: str = "vec_id",
    max_bucket: int = 5000,
    return_oversized: bool = False,
):
    """Embedding-cosine near-duplicate pairs: centroid-bucket shuffle →
    within-bucket pairwise cosine (vectorized) → threshold.

    Note candidate recall is bucket-local (pairs straddling a centroid
    boundary are missed) — the standard IVF trade-off; raise n_centroids /
    add multi-probe assignment for tighter recall. Buckets larger than
    ``max_bucket`` emit no pairs but ARE counted: pass
    ``return_oversized=True`` for a (bucket, n_members) side-channel
    Dataset — capped recall is never silent."""
    cent = train_centroids(ds, n_centroids)
    bucketed = assign_buckets(ds, cent, id_column)

    def within_bucket_pairs(group: pa.Table) -> pa.Table:
        n = len(group)

        def shaped(ids_a, ids_b, cos, over_bucket, over_n):
            return pa.table(
                {
                    "id_a": pa.array(ids_a, pa.int64()),
                    "id_b": pa.array(ids_b, pa.int64()),
                    "cosine": pa.array(cos, pa.float32()),
                    "oversized": pa.array(
                        [0] * (len(ids_a) - len(over_bucket)) + [1] * len(over_bucket), pa.int8()
                    ),
                    "over_bucket": pa.array([-1] * (len(ids_a) - len(over_bucket)) + over_bucket, pa.int32()),
                    "n_members": pa.array([0] * (len(ids_a) - len(over_bucket)) + over_n, pa.int32()),
                }
            )

        if n < 2:
            return shaped([], [], [], [], [])
        if n > max_bucket:
            b = int(group.column("bucket")[0].as_py())
            return shaped([-1], [-1], [0.0], [b], [n])
        m = _normalize(_batch_matrix(group))
        ids = np.asarray(group.column(id_column).to_pylist(), np.int64)
        sims = m @ m.T
        iu, ju = np.triu_indices(n, k=1)
        mask = sims[iu, ju] >= cosine_threshold
        ia, ib = ids[iu[mask]], ids[ju[mask]]
        lo, hi = np.minimum(ia, ib), np.maximum(ia, ib)
        return shaped(lo.tolist(), hi.tolist(), sims[iu[mask], ju[mask]].astype(np.float32).tolist(), [], [])

    raw = bucketed.groupby("bucket").map_groups(within_bucket_pairs, batch_format="pyarrow")
    pairs = raw.filter(expr="oversized == 0").drop_columns(
        ["oversized", "over_bucket", "n_members"]
    )
    if return_oversized:
        oversized = raw.filter(expr="oversized == 1").select_columns(["over_bucket", "n_members"])
        return pairs, oversized
    return pairs


# ---------------------------------------------------------------------------
# Vector aggregates: per-label centroids + distributed k-means
# ---------------------------------------------------------------------------


def embedding_centroids(
    ds: "ray.data.Dataset",
    label_column: str = "label",
    quantize: int = 1_000_000,
) -> pa.Table:
    """Mean embedding per label, REDUCTION-ORDER-FREE: each vector element
    is quantized to ``round(v·quantize)`` int64 units per batch, partial
    (int-sum-per-dim, count) rows shuffle through a tiny label groupby,
    and the mean is the exact integer sum divided by the count. Summing
    floats across Ray's nondeterministic batch order drifts in the last
    bit (the round-3 flake class); integer sums of per-element-quantized
    values are associative, so the result is bit-identical at any
    parallelism — and expressible in ANSI SQL for the driver oracle.

    Returns (``label_column``, dim: int32, centroid: float64) in exploded
    per-dimension rows (list columns hash poorly in oracle compares)."""
    import pandas as pd

    def partial(batch: pa.Table) -> pa.Table:
        m = _batch_matrix(batch).astype(np.float64)
        q = np.floor(m * quantize).astype(np.int64)
        labels = batch.column(label_column).to_numpy(zero_copy_only=False)
        codes, uniq = pd.factorize(labels)
        dim = q.shape[1] if len(q) else 0
        sums = np.zeros((len(uniq), dim), np.int64)
        np.add.at(sums, codes, q)
        counts = np.bincount(codes, minlength=len(uniq)).astype(np.int64)
        return pa.table(
            {
                label_column: pa.array(np.repeat(uniq, dim)),
                "dim": pa.array(np.tile(np.arange(dim, dtype=np.int32), len(uniq))),
                "qsum": pa.array(sums.reshape(-1)),
                "cnt": pa.array(np.repeat(counts, dim)),
            }
        )

    from ray.data.aggregate import Sum

    merged = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby([label_column, "dim"])
        .aggregate(Sum("qsum", alias_name="qsum"), Sum("cnt", alias_name="cnt"))
        .to_pandas()  # bounded: n_labels × dim rows
    )
    merged["centroid"] = (merged["qsum"] / quantize) / merged["cnt"]
    out = merged[[label_column, "dim", "centroid"]].sort_values(
        [label_column, "dim"]
    )
    return pa.Table.from_pandas(out.reset_index(drop=True), preserve_index=False)


def kmeans_fit(
    ds: "ray.data.Dataset",
    k: int = 8,
    iters: int = 10,
    quantize: int = 1_000_000,
    seed: int = 42,
    id_column: str = "vec_id",
) -> np.ndarray:
    """Distributed Lloyd's k-means over the FULL dataset (not the
    driver-sample coarse quantizer of :func:`train_centroids`): per
    iteration, one map pass assigns every vector to its nearest centroid
    and emits per-centroid (quantized int64 sum-per-dim, count) partials;
    a global aggregate merges them and the driver recomputes centroids —
    O(k·dim) driver state, zero shuffle of vectors.

    Deterministic at ANY parallelism: init centroids are the k smallest
    ``crc32(f"{seed}:{id}")`` rows (keyspace choice, not row order), and
    the quantized integer partials make every iteration's sums exact and
    associative (float accumulation across Ray's nondeterministic batch
    order drifts in the last bit and diverges after a few iterations).
    Empty clusters keep their previous centroid. Returns [k, dim]
    float64."""
    import zlib

    # deterministic seed rows: k smallest hash values (two passes: a cheap
    # hash-min aggregate would need the vectors anyway, so one partial
    # top-k per batch + tiny driver reduce)
    def seed_partial(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_column).to_numpy(zero_copy_only=False)
        h = np.array(
            [zlib.crc32(f"{seed}:{i}".encode()) for i in ids], np.uint64
        )
        kk = min(k, len(h))
        top = np.argpartition(h, kk - 1)[:kk] if kk and kk < len(h) else np.arange(len(h))
        m = _batch_matrix(batch).astype(np.float64)
        dim = m.shape[1] if len(m) else 0
        return pa.table(
            {
                "h": pa.array(h[top]),
                "vec": pa.FixedSizeListArray.from_arrays(
                    pa.array(m[top].reshape(-1)), dim or 1
                ),
            }
        )

    seeds = (
        ds.map_batches(seed_partial, batch_format="pyarrow").to_pandas()
    )  # bounded: ≤ k rows per batch
    seeds = seeds.sort_values("h").head(k)
    cent = np.stack([np.asarray(v, np.float64) for v in seeds["vec"]])

    from ray.data.aggregate import Sum

    for _ in range(iters):
        cref = ray.put(cent)

        def assign_partial(batch: pa.Table) -> pa.Table:
            c = ray.get(cref)
            m = _batch_matrix(batch).astype(np.float64)
            if not len(m):
                return pa.table(
                    {
                        "c": pa.array([], pa.int32()),
                        "dim": pa.array([], pa.int32()),
                        "qsum": pa.array([], pa.int64()),
                        "cnt": pa.array([], pa.int64()),
                    }
                )
            d2 = ((m * m).sum(axis=1)[:, None] - 2.0 * (m @ c.T)
                  + (c * c).sum(axis=1)[None, :])
            a = d2.argmin(axis=1)
            q = np.floor(m * quantize).astype(np.int64)
            sums = np.zeros((len(c), m.shape[1]), np.int64)
            np.add.at(sums, a, q)
            counts = np.bincount(a, minlength=len(c)).astype(np.int64)
            dim = m.shape[1]
            return pa.table(
                {
                    "c": pa.array(np.repeat(np.arange(len(c), dtype=np.int32), dim)),
                    "dim": pa.array(np.tile(np.arange(dim, dtype=np.int32), len(c))),
                    "qsum": pa.array(sums.reshape(-1)),
                    "cnt": pa.array(np.repeat(counts, dim)),
                }
            )

        merged = (
            ds.map_batches(assign_partial, batch_format="pyarrow")
            .groupby(["c", "dim"])
            .aggregate(Sum("qsum", alias_name="qsum"), Sum("cnt", alias_name="cnt"))
            .to_pandas()  # bounded: k × dim rows
        )
        merged = merged.sort_values(["c", "dim"])
        dim = cent.shape[1]
        new = cent.copy()
        for ci, grp in merged.groupby("c"):
            n = int(grp["cnt"].iloc[0])
            if n > 0:
                new[int(ci)] = (grp["qsum"].to_numpy(np.float64) / quantize) / n
        cent = new
    return cent


def semantic_dedup(
    ds: "ray.data.Dataset",
    cosine_threshold: float = 0.95,
    n_centroids: int = 16,
    id_column: str = "vec_id",
    max_bucket: int = 5000,
) -> "ray.data.Dataset":
    """SemDeDup-style semantic pruning (Abbas et al. 2023): cluster the
    embedding space, mark within-cluster cosine near-duplicates, keep ONE
    representative per near-dup component, return the surviving rows.

    Composition of existing scale shapes — nothing new materializes:

    1. :func:`embedding_near_dup_pairs` (centroid-bucket shuffle +
       within-bucket vectorized cosine; oversized buckets surface on a
       side channel rather than silently losing recall),
    2. :func:`dedupe_ray.clustering.connected_components` over the pair
       edges (driver union-find under the edge limit, bucketed iteration
       above it),
    3. the kept id per component is its component_id (the minimum member
       id — content-stable), and losers drop via one
       :func:`dedupe_ray.joins.bucketed_lookup_join` LEFT anti-join —
       the drop table shuffles, the corpus streams.

    The representative choice (min id) matches the SQL a reviewer would
    write, and the whole path is parallelism-invariant: centroids are
    deterministic (quantized k-means), pair emission is order-free, and
    component ids are content-stable."""
    import pyarrow.compute as pc

    from dedupe_ray.clustering import connected_components
    from dedupe_ray.joins import bucketed_lookup_join

    pairs = embedding_near_dup_pairs(
        ds,
        cosine_threshold=cosine_threshold,
        n_centroids=n_centroids,
        id_column=id_column,
        max_bucket=max_bucket,
    )
    def edge_ids_to_str(batch: pa.Table) -> pa.Table:
        # connected_components speaks string ids and picks the LEXICO-min
        # member as component_id; zero-padding keeps lexicographic order
        # == numeric order, so the representative is the numeric-min id
        return pa.table(
            {
                "id_a": pc.utf8_lpad(pc.cast(batch.column("id_a"), pa.string()), 20, "0"),
                "id_b": pc.utf8_lpad(pc.cast(batch.column("id_b"), pa.string()), 20, "0"),
            }
        )

    edges = pairs.select_columns(["id_a", "id_b"]).map_batches(
        edge_ids_to_str, batch_format="pyarrow"
    )
    cc = connected_components(edges)

    def losers(batch: pa.Table) -> pa.Table:
        keep = pc.not_equal(batch.column("doc_id"), batch.column("component_id"))
        t = batch.filter(keep)
        return pa.table(
            {
                "__drop_id": pc.cast(t.column("doc_id"), pa.int64()),
                "__dropped": pa.array(np.ones(len(t), bool)),
            }
        )

    drop = cc.map_batches(losers, batch_format="pyarrow")
    joined = bucketed_lookup_join(
        ds, drop, id_column, "__drop_id", ["__dropped"], how="left"
    )
    def keep_survivors(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_null(batch.column("__dropped"))).drop_columns(
            ["__dropped"]
        )

    return joined.map_batches(keep_survivors, batch_format="pyarrow")


class RandomProjector:
    """Actor-pool stage: Johnson–Lindenstrauss random projection of the
    embedding column to ``out_dim`` — the cheap, data-independent
    dimensionality reduction every billion-vector pipeline runs before an
    index build (pairwise distances preserved within (1±ε) w.h.p.,
    ε² ≳ 8·ln(n)/out_dim). The seeded N(0, 1/out_dim) matrix is built ONCE
    per actor on the first batch (input dim read from the data), so the
    projection is deterministic and identical across actors/parallelism;
    per batch it is one float32 matmul."""

    def __init__(self, out_dim: int = 16, seed: int = 42,
                 embedding_column: str = "embedding",
                 out_column: str = "projected"):
        self.out_dim = out_dim
        self.seed = seed
        self.col = embedding_column
        self.out = out_column
        self._mat: np.ndarray | None = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return batch.append_column(
                self.out, pa.array([], pa.list_(pa.float32(), self.out_dim))
            )
        m = _batch_matrix(batch, self.col)
        if self._mat is None:
            rng = np.random.RandomState(self.seed)
            self._mat = (
                rng.standard_normal((m.shape[1], self.out_dim))
                / np.sqrt(self.out_dim)
            ).astype(np.float32)
        proj = m @ self._mat
        col = pa.FixedSizeListArray.from_arrays(
            pa.array(proj.reshape(-1), pa.float32()), self.out_dim
        )
        return batch.append_column(self.out, col)


def random_projection(
    ds: "ray.data.Dataset",
    out_dim: int = 16,
    seed: int = 42,
    embedding_column: str = "embedding",
    out_column: str = "projected",
    concurrency=(1, 8),
) -> "ray.data.Dataset":
    """Project the embedding column to ``out_dim`` dims (see
    :class:`RandomProjector`); zero shuffle, one matmul per batch."""
    return ds.map_batches(
        RandomProjector,
        fn_constructor_args=(out_dim, seed, embedding_column, out_column),
        batch_format="pyarrow",
        concurrency=concurrency,
    )


def kmeans_exact_assign(
    ds: "ray.data.Dataset",
    k: int = 4,
    iters: int = 2,
    quantize: int = 1_000_000,
    id_column: str = "vec_id",
    vec_column: str = "embedding",
) -> "ray.data.Dataset":
    """Lloyd's k-means whose per-vector ASSIGNMENTS are exactly
    reproducible by a SQL mirror: vectors are fixed-point-quantized once
    (``floor(x·quantize + 0.5)`` int64 — the same half-away rule the
    oracle's ``floor(v*1e6 + 0.5)`` applies), centroids stay INTEGER
    through every update (floor-division of exact int64 per-dim sums), and
    distances are exact int64, so argmin ties (→ lowest cluster id) and
    every iteration are bit-identical at any parallelism and in SQL.

    Unlike :func:`kmeans_fit` (float centroids, hash seeds — the
    throughput path), this is the CONFORMANCE path: seeds are the ``k``
    smallest ``id_column`` rows, and the deliverable is the assignment
    table ``(id, cluster, dist)``, i.e. the semantic-bucketing output a
    training-data pipeline shards by. Per iteration: one map pass emits
    per-centroid (cluster, dim, Σq, count) int64 partials (k·dim rows per
    block), a tiny groupby-Sum merges them, and the driver floor-divides —
    vectors never shuffle; driver state is O(k·dim). Empty clusters keep
    their previous centroid.
    """
    # the integer Lloyd loop is the shared _exact_lloyd helper (one source
    # of truth for the SQL-mirrored recurrence; ivf_pq_build's coarse
    # quantizer runs the identical code)
    cent = _exact_lloyd(ds, k, iters, quantize, id_column, vec_column)
    fref = ray.put(cent)

    def final_assign(batch: pa.Table) -> pa.Table:
        c = ray.get(fref)
        q = _pq_quant(_batch_matrix(batch, vec_column), quantize)
        if not len(q):
            return pa.table(
                {
                    id_column: pa.array([], pa.int64()),
                    "cluster": pa.array([], pa.int32()),
                    "dist": pa.array([], pa.int64()),
                }
            )
        a = _exact_argmin(q, c)
        diff = q - c[a]
        dmin = (diff * diff).sum(axis=1)
        return pa.table(
            {
                id_column: batch.column(id_column),
                "cluster": pa.array(a.astype(np.int32)),
                "dist": pa.array(dmin),
            }
        )

    return ds.map_batches(final_assign, batch_format="pyarrow")


def hash_negative_samples(
    ds: "ray.data.Dataset",
    id_column: str,
    n_total: int,
    k: int = 4,
    salt: int = 2654435761,
) -> "ray.data.Dataset":
    """Deterministic in-batch-free negative sampling for contrastive
    training: each anchor row gets ``k`` pseudo-random negative ids drawn
    from the DENSE id space ``[0, n_total)`` by a Knuth multiplicative
    hash of (anchor, slot) — reproducible at any parallelism, no shuffle,
    no RNG state, and SQL-mirrorable (the weighted_sample_orders
    pinned-hash-randomness doctrine). A draw that lands on the anchor
    itself moves one slot up (mod n_total), so negatives never equal
    their anchor. Output: one row per (anchor, slot) with ``neg_id``."""
    import numpy as np

    if n_total < 2:
        raise ValueError("n_total must be >= 2 to draw a non-anchor id")

    def draw(b: pa.Table) -> pa.Table:
        ids = b.column(id_column).to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(ids)
        a = np.repeat(ids, k)
        slot = np.tile(np.arange(k, dtype=np.int64), n)
        h = (a * np.int64(salt) + slot * np.int64(0x9E3779B9)) % np.int64(
            2**31
        )
        neg = h % np.int64(n_total)
        neg = np.where(neg == a, (neg + 1) % np.int64(n_total), neg)
        return pa.table(
            {
                id_column: pa.array(a),
                "slot": pa.array(slot),
                "neg_id": pa.array(neg),
            }
        )

    return ds.map_batches(draw, batch_format="pyarrow")


def topk_recall(
    reference: "pa.Table | object",
    candidate: "pa.Table | object",
    query_column: str = "query_id",
    item_column: str = "vec_id",
) -> pa.Table:
    """Retrieval evaluation: per-query overlap between a reference top-k
    and a candidate top-k — recall@k as exact integers (hits, k), the
    number every ANN/quantization trade-off is judged by. Inputs are the
    bounded (query, item) tables the top-k ops return (pa.Table or
    Dataset); the overlap is one vectorized join per query set, no
    shuffle. Queries absent from the candidate score 0."""
    import pandas as pd

    import ray.data as rd

    def to_df(x) -> pd.DataFrame:
        if isinstance(x, pa.Table):
            df = x.to_pandas()
        elif isinstance(x, rd.Dataset):
            df = x.to_pandas()  # bounded: top-k outputs
        else:
            df = x
        return df[[query_column, item_column]]

    ref = to_df(reference)
    cand = to_df(candidate)
    k_per_q = ref.groupby(query_column).size().rename("k")
    hits = (
        ref.merge(cand, on=[query_column, item_column], how="inner")
        .groupby(query_column)
        .size()
        .rename("hits")
    )
    out = (
        pd.concat([k_per_q, hits], axis=1)
        .fillna(0)
        .astype(np.int64)
        .reset_index()
        .sort_values(query_column)
    )
    return pa.Table.from_pandas(out.reset_index(drop=True), preserve_index=False)


def embedding_gram_int(
    ds: "ray.data.Dataset",
    column: str = "embedding",
    scale: int = 1000,
) -> "ray.data.Dataset":
    """Exact-integer Gram matrix of an embedding column — the
    second-moment table behind PCA / whitening / covariance drift
    monitoring, as a pure combiner reduce: vectors fixed-point quantize
    to ``floor(x·scale + 0.5)`` int64, each batch contributes its local
    ``XᵀX`` (computed in float64 — exact below 2⁵³ for these magnitudes),
    and one bounded groupby sums the d(d+1)/2 upper-triangle cells.
    Nothing row-scaled shuffles; the result is order-free, layout-
    invariant, and SQL-mirrorable (lm_doc_scores doctrine: quantize the
    floats, ship exact ints). Returns (i, j, s_xy) with 0-based i ≤ j."""
    import numpy as np

    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        col = b.column(column)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        d = len(col[0]) if len(col) else 0
        if d == 0:
            return pa.table(
                {
                    "i": pa.array([], pa.int64()),
                    "j": pa.array([], pa.int64()),
                    "s_xy": pa.array([], pa.int64()),
                }
            )
        x = np.floor(flat * scale + 0.5).reshape(-1, d)
        g = x.T @ x  # exact: |cells| < 2**53
        iu, ju = np.triu_indices(d)
        return pa.table(
            {
                "i": pa.array(iu.astype(np.int64)),
                "j": pa.array(ju.astype(np.int64)),
                "s_xy": pa.array(g[iu, ju].astype(np.int64)),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["i", "j"])
        .aggregate(Sum("s_xy", alias_name="s_xy"))
    )


def pca_fit(
    ds: "ray.data.Dataset",
    n_components: int = 2,
    quantize: int = 1000,
    vec_column: str = "embedding",
) -> tuple[np.ndarray, np.ndarray]:
    """Fit PCA over the embedding column from EXACT integer moments — the
    dimensionality-reduction stage before indexing/visualization. One
    combiner pass collects n, the per-dim sums Σx, and the full second-
    moment matrix ΣxᵀX as exact int64 (the :func:`embedding_gram_int`
    doctrine — nothing row-scaled shuffles, driver state is O(d²)); the
    driver then forms the covariance from those integers and runs one
    LAPACK ``eigh``. Because the integer moments are order-free, the
    covariance matrix is BIT-IDENTICAL at any parallelism, so the
    eigenvectors are too (eigh is deterministic for a fixed input).
    Component signs are canonicalized: the largest-|v| coefficient of
    each component is made positive (first index on ties).

    Returns ``(mean float64 [d] in quantized units, components float64
    [n_components, d])`` — feed both to :func:`pca_project`.
    """
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        if not len(b):
            return pa.table(
                {
                    "i": pa.array([], pa.int64()),
                    "j": pa.array([], pa.int64()),
                    "s": pa.array([], pa.int64()),
                }
            )
        x = np.floor(
            _batch_matrix(b, vec_column).astype(np.float64) * float(quantize) + 0.5
        )
        d = x.shape[1]
        g = x.T @ x  # exact in float64: |cells| < 2**53 at these scales
        iu, ju = np.triu_indices(d)
        # first moments ride along as j = -1 rows; the count as (-1, -1)
        i_out = np.concatenate([iu.astype(np.int64), np.arange(d, dtype=np.int64), [-1]])
        j_out = np.concatenate([ju.astype(np.int64), np.full(d, -1, np.int64), [-1]])
        s_out = np.concatenate(
            [g[iu, ju].astype(np.int64), x.sum(axis=0).astype(np.int64), [len(x)]]
        )
        return pa.table({"i": pa.array(i_out), "j": pa.array(j_out), "s": pa.array(s_out)})

    mom = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["i", "j"])
        .aggregate(Sum("s", alias_name="s"))
        .to_pandas()  # bounded: d(d+1)/2 + d + 1 rows
    )
    n = int(mom.loc[(mom["i"] == -1) & (mom["j"] == -1), "s"].iloc[0])
    first = mom[(mom["j"] == -1) & (mom["i"] >= 0)].sort_values("i")
    d = len(first)
    s1 = first["s"].to_numpy(np.int64)
    g = np.zeros((d, d), np.float64)
    sec = mom[mom["j"] >= 0]
    gi = sec["i"].to_numpy(np.int64)
    gj = sec["j"].to_numpy(np.int64)
    gs = sec["s"].to_numpy(np.int64).astype(np.float64)
    g[gi, gj] = gs
    g[gj, gi] = gs
    mean = s1.astype(np.float64) / n
    cov = g / n - np.outer(mean, mean)
    w, v = np.linalg.eigh(cov)
    comps = v[:, ::-1][:, : int(n_components)].T  # largest eigenvalues first
    for r in range(len(comps)):
        if comps[r, np.argmax(np.abs(comps[r]))] < 0:
            comps[r] = -comps[r]
    return mean, comps


def pca_project(
    ds: "ray.data.Dataset",
    mean: np.ndarray,
    components: np.ndarray,
    quantize: int = 1000,
    id_column: str = "vec_id",
    vec_column: str = "embedding",
) -> "ray.data.Dataset":
    """Project each vector onto fitted PCA components (one broadcast, one
    matmul per batch — zero shuffle): quantizes with the SAME fixed-point
    rule as :func:`pca_fit` so the projection is layout-invariant, then
    emits ``pc_0..pc_{k-1}`` float64 columns alongside ``id_column``."""
    mref = ray.put((np.asarray(mean, np.float64), np.asarray(components, np.float64)))
    k = len(components)

    def proj(b: pa.Table) -> pa.Table:
        mu, comp = ray.get(mref)
        data: dict = {id_column: b.column(id_column)}
        if not len(b):
            for r in range(k):
                data[f"pc_{r}"] = pa.array([], pa.float64())
            return pa.table(data)
        x = np.floor(
            _batch_matrix(b, vec_column).astype(np.float64) * float(quantize) + 0.5
        )
        y = (x - mu[None, :]) @ comp.T
        for r in range(k):
            data[f"pc_{r}"] = pa.array(y[:, r])
        return pa.table(data)

    return ds.map_batches(proj, batch_format="pyarrow")


def mmr_diversify(
    ds: "ray.data.Dataset",
    query_vec: np.ndarray,
    k: int = 5,
    pool: int = 20,
    column: str = "embedding",
    id_column: str = "vec_id",
    scale: float = 1000.0,
) -> pa.Table:
    """Maximal Marginal Relevance diversified top-k (Carbonell &
    Goldstein 1998) at λ = 1/2, where the MMR argmax reduces to
    ``rel_i − max_{j∈S} sim_ij`` — PURE int64 arithmetic over
    fixed-point vectors (embedding_gram_int doctrine), so the greedy
    trajectory is deterministic and SQL-mirrorable. Distribution shape:
    per-batch partial top-``pool`` by (rel DESC, id ASC) carrying the
    quantized vectors, bounded driver reduce (n_blocks × pool rows),
    then the O(k·pool) greedy runs on the pool alone. Ties break to the
    smaller id. Returns (rnk 1..k, id)."""
    qv = np.floor(np.asarray(query_vec, np.float32).astype(np.float64) * scale + 0.5)
    qref = ray.put(qv.astype(np.int64))

    def partial(batch: pa.Table) -> pa.Table:
        q = ray.get(qref)
        x = np.floor(
            _batch_matrix(batch, column).astype(np.float64) * scale + 0.5
        ).astype(np.int64)
        ids = batch.column(id_column).to_numpy(zero_copy_only=False).astype(np.int64)
        rel = x @ q
        order = np.lexsort((ids, -rel))[: min(pool, len(ids))]
        return pa.table(
            {
                "id": pa.array(ids[order]),
                "rel": pa.array(rel[order]),
                "qvec": pa.array(list(x[order]), pa.list_(pa.int64())),
            }
        )

    cand = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    # bounded: n_blocks × pool rows
    cand = cand.sort_values(["rel", "id"], ascending=[False, True]).head(pool)
    ids = cand["id"].to_numpy(np.int64)
    rel = cand["rel"].to_numpy(np.int64)
    vecs = np.stack(cand["qvec"].to_numpy())  # [pool, d] int64
    sims = vecs @ vecs.T  # exact: fixed-point dots < 2**63

    selected: list[int] = []
    remaining = list(range(len(ids)))
    for _ in range(min(k, len(ids))):
        if not selected:
            pick = remaining[0]  # already (rel desc, id asc)-ordered
        else:
            score = rel[remaining] - sims[np.ix_(remaining, selected)].max(axis=1)
            best = np.lexsort((ids[remaining], -score))[0]
            pick = remaining[best]
        selected.append(pick)
        remaining.remove(pick)
    return pa.table(
        {
            "rnk": pa.array(np.arange(1, len(selected) + 1, dtype=np.int64)),
            id_column: pa.array(ids[selected]),
        }
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ): the memory-compressed ANN index
# ---------------------------------------------------------------------------


def _pq_quant(m: np.ndarray, quantize: int) -> np.ndarray:
    return np.floor(m.astype(np.float64) * float(quantize) + 0.5).astype(np.int64)


def _pq_assign_sub(q: np.ndarray, cb: np.ndarray) -> np.ndarray:
    """Exact int64 squared distance argmin per subspace; ties → lowest
    codeword id. q: [n, dsub] int64, cb: [k, dsub] int64 → [n] int32."""
    d = np.empty((len(q), len(cb)), np.int64)
    for j in range(len(cb)):
        diff = q - cb[j][None, :]
        d[:, j] = (diff * diff).sum(axis=1)
    return d.argmin(axis=1).astype(np.int32)


def pq_train(
    ds: "ray.data.Dataset",
    m: int = 4,
    k: int = 4,
    iters: int = 1,
    quantize: int = 1_000_000,
    id_column: str = "vec_id",
    vec_column: str = "embedding",
) -> np.ndarray:
    """Train a product-quantization codebook (Jégou et al., "Product
    Quantization for Nearest Neighbor Search", TPAMI 2011) whose codes are
    exactly SQL-reproducible — the memory-compressed index for
    billion-vector corpora (64-dim float32 = 256 B/vec → ``m`` bytes/vec).

    Same conformance doctrine as :func:`kmeans_exact_assign`: vectors are
    fixed-point quantized ONCE (``floor(x·quantize + 0.5)`` int64), each of
    the ``m`` subspaces runs Lloyd iterations with INTEGER centroids
    (exact floor-div updates, argmin ties → lowest codeword), seeded by
    the ``k`` smallest-``id_column`` rows — so training, encoding, and ADC
    search are bit-identical at any parallelism and in a SQL mirror.

    One streaming pass per iteration over ALL subspaces at once: each
    batch emits (sub, codeword, dim, qsum, cnt) int64 partials (m·k·dsub
    rows per block), a tiny groupby-Sum merges them, and the driver
    floor-divides. Vectors never shuffle; driver state is O(m·k·dsub).

    Returns codebooks as an int64 ndarray [m, k, dsub].
    """
    from ray.data.aggregate import Sum

    ms, ks = int(m), int(k)

    # ---- seeds: subvectors of the k smallest ids (partial min-k, tiny reduce)
    def seed_partial(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_column).to_numpy(zero_copy_only=False).astype(np.int64)
        if not len(ids):
            return pa.table(
                {"id": pa.array([], pa.int64()), "vec": pa.array([], pa.list_(pa.int64()))}
            )
        kk = min(ks, len(ids))
        top = np.argpartition(ids, kk - 1)[:kk] if kk < len(ids) else np.arange(len(ids))
        q = _pq_quant(_batch_matrix(batch, vec_column), quantize)
        return pa.table(
            {
                "id": pa.array(ids[top]),
                "vec": pa.array([q[i].tolist() for i in top], pa.list_(pa.int64())),
            }
        )

    seeds = ds.map_batches(seed_partial, batch_format="pyarrow").to_pandas()
    seeds = seeds.sort_values("id").head(ks)
    full = np.stack([np.asarray(v, np.int64) for v in seeds["vec"]])  # [k, dim]
    dim = full.shape[1]
    if dim % ms:
        raise ValueError(f"dim {dim} not divisible by m={ms}")
    dsub = dim // ms
    # codebooks[s] trains on dims [s*dsub, (s+1)*dsub)
    cbs = np.stack([full[:, s * dsub : (s + 1) * dsub] for s in range(ms)])

    for _ in range(int(iters)):
        cref = ray.put(cbs)

        def upd_partial(batch: pa.Table) -> pa.Table:
            c = ray.get(cref)  # [m, k, dsub]
            q = _pq_quant(_batch_matrix(batch, vec_column), quantize)
            if not len(q):
                return pa.table(
                    {
                        "sub": pa.array([], pa.int32()),
                        "c": pa.array([], pa.int32()),
                        "dim": pa.array([], pa.int32()),
                        "qsum": pa.array([], pa.int64()),
                        "cnt": pa.array([], pa.int64()),
                    }
                )
            subs, cls, dims, qsums, cnts = [], [], [], [], []
            for s in range(ms):
                qs = q[:, s * dsub : (s + 1) * dsub]
                a = _pq_assign_sub(qs, c[s])
                sums = np.zeros((ks, dsub), np.int64)
                np.add.at(sums, a, qs)
                counts = np.bincount(a, minlength=ks).astype(np.int64)
                subs.append(np.full(ks * dsub, s, np.int32))
                cls.append(np.repeat(np.arange(ks, dtype=np.int32), dsub))
                dims.append(np.tile(np.arange(dsub, dtype=np.int32), ks))
                qsums.append(sums.reshape(-1))
                cnts.append(np.repeat(counts, dsub))
            return pa.table(
                {
                    "sub": pa.array(np.concatenate(subs)),
                    "c": pa.array(np.concatenate(cls)),
                    "dim": pa.array(np.concatenate(dims)),
                    "qsum": pa.array(np.concatenate(qsums)),
                    "cnt": pa.array(np.concatenate(cnts)),
                }
            )

        merged = (
            ds.map_batches(upd_partial, batch_format="pyarrow")
            .groupby(["sub", "c", "dim"])
            .aggregate(Sum("qsum", alias_name="qsum"), Sum("cnt", alias_name="cnt"))
            .to_pandas()  # bounded: m × k × dsub rows
        ).sort_values(["sub", "c", "dim"])
        new = cbs.copy()
        for (s, ci), grp in merged.groupby(["sub", "c"]):
            n = int(grp["cnt"].iloc[0])
            if n > 0:  # empty codewords keep their previous centroid
                new[int(s), int(ci)] = np.floor_divide(
                    grp["qsum"].to_numpy(np.int64), np.int64(n)
                )
        cbs = new
    return cbs


def pq_encode(
    ds: "ray.data.Dataset",
    codebooks: np.ndarray,
    quantize: int = 1_000_000,
    id_column: str = "vec_id",
    vec_column: str = "embedding",
) -> "ray.data.Dataset":
    """Encode each vector to ``m`` codeword ids (columns code_0..code_{m-1},
    int32) against broadcast codebooks — one streaming pass, no shuffle.
    The code table is the persistent index artifact: m ints per row
    regardless of dim, so a 100-TB float corpus compresses ~250× before
    the search stage ever runs."""
    cref = ray.put(np.asarray(codebooks, np.int64))

    def enc(batch: pa.Table) -> pa.Table:
        c = ray.get(cref)
        ms, _, dsub = c.shape
        data: dict = {id_column: batch.column(id_column)}
        if not len(batch):
            for s in range(ms):
                data[f"code_{s}"] = pa.array([], pa.int32())
            return pa.table(data)
        q = _pq_quant(_batch_matrix(batch, vec_column), quantize)
        for s in range(ms):
            data[f"code_{s}"] = pa.array(
                _pq_assign_sub(q[:, s * dsub : (s + 1) * dsub], c[s])
            )
        return pa.table(data)

    return ds.map_batches(enc, batch_format="pyarrow")


def pq_search(
    codes_ds: "ray.data.Dataset",
    codebooks: np.ndarray,
    query_vectors_quantized: np.ndarray,
    k: int = 5,
    id_column: str = "vec_id",
) -> pa.Table:
    """Asymmetric-distance (ADC) top-k over a PQ code table: per query a
    tiny [m, k_codes] lookup table of exact int64 subspace distances is
    built once, each code batch resolves distances by pure gather-sum,
    per-batch partial top-k (ties → lowest id), bounded driver reduce —
    the same partial-top-k shape as :func:`brute_force_topk`, but the
    streamed payload is m ints per row instead of the full vector.

    Returns (query_id int32, vec_id, adc_dist int64, rnk int64 1-based),
    deterministic at any parallelism.
    """
    cbs = np.asarray(codebooks, np.int64)  # [m, kc, dsub]
    ms, kc, dsub = cbs.shape
    qv = np.atleast_2d(np.asarray(query_vectors_quantized, np.int64))  # [nq, dim]
    nq = len(qv)
    # lut[j, s, c] = exact squared distance of query j's subvector s to codeword c
    lut = np.empty((nq, ms, kc), np.int64)
    for s in range(ms):
        qs = qv[:, s * dsub : (s + 1) * dsub]  # [nq, dsub]
        diff = qs[:, None, :] - cbs[s][None, :, :]  # [nq, kc, dsub]
        lut[:, s, :] = (diff * diff).sum(axis=2)
    lref = ray.put(lut)

    def partial_topk(batch: pa.Table) -> pa.Table:
        lt = ray.get(lref)
        n = len(batch)
        if not n:
            return pa.table(
                {
                    "query_id": pa.array([], pa.int32()),
                    id_column: pa.array([], pa.int64()),
                    "adc_dist": pa.array([], pa.int64()),
                }
            )
        ids = batch.column(id_column).to_numpy(zero_copy_only=False).astype(np.int64)
        codes = np.stack(
            [
                batch.column(f"code_{s}").to_numpy(zero_copy_only=False)
                for s in range(ms)
            ],
            axis=1,
        )  # [n, m]
        out_q, out_id, out_d = [], [], []
        kk = min(k, n)
        subs = np.arange(ms)[None, :]
        for j in range(len(lt)):
            dist = lt[j][subs, codes].sum(axis=1)  # [n] exact int64
            sel = np.lexsort((ids, dist))[:kk]
            out_q.append(np.full(kk, j, np.int32))
            out_id.append(ids[sel])
            out_d.append(dist[sel])
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q)),
                id_column: pa.array(np.concatenate(out_id)),
                "adc_dist": pa.array(np.concatenate(out_d)),
            }
        )

    partials = codes_ds.map_batches(partial_topk, batch_format="pyarrow").to_pandas()
    out = (
        partials.sort_values(["query_id", "adc_dist", id_column], ignore_index=True)
        .groupby("query_id", as_index=False)
        .head(k)
        .reset_index(drop=True)
    )
    out["rnk"] = (out.groupby("query_id").cumcount() + 1).astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False)


def _exact_lloyd(
    ds: "ray.data.Dataset",
    k: int,
    iters: int,
    quantize: int,
    id_column: str,
    vec_column: str,
) -> np.ndarray:
    """The integer Lloyd loop shared by :func:`kmeans_exact_assign` and
    :func:`ivf_pq_build`'s coarse quantizer: seeds = the ``k`` smallest
    ``id_column`` rows, centroids stay int64 through exact floor-div
    updates, argmin ties → lowest centroid id. Returns the final
    centroids as int64 ``[k, dim]`` — per iteration ONE streaming pass
    emits k·dim (c, dim, Σq, cnt) partials, a tiny groupby-Sum merges,
    the driver floor-divides; vectors never shuffle."""
    from ray.data.aggregate import Sum

    ks = int(k)

    def seed_partial(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_column).to_numpy(zero_copy_only=False).astype(np.int64)
        if not len(ids):
            return pa.table(
                {"id": pa.array([], pa.int64()), "vec": pa.array([], pa.list_(pa.int64()))}
            )
        kk = min(ks, len(ids))
        top = np.argpartition(ids, kk - 1)[:kk] if kk < len(ids) else np.arange(len(ids))
        q = _pq_quant(_batch_matrix(batch, vec_column), quantize)
        return pa.table(
            {
                "id": pa.array(ids[top]),
                "vec": pa.array([q[i].tolist() for i in top], pa.list_(pa.int64())),
            }
        )

    seeds = ds.map_batches(seed_partial, batch_format="pyarrow").to_pandas()
    seeds = seeds.sort_values("id").head(ks)
    cent = np.stack([np.asarray(v, np.int64) for v in seeds["vec"]])

    for _ in range(int(iters)):
        cref = ray.put(cent)

        def upd_partial(batch: pa.Table) -> pa.Table:
            c = ray.get(cref)
            q = _pq_quant(_batch_matrix(batch, vec_column), quantize)
            if not len(q):
                return pa.table(
                    {
                        "c": pa.array([], pa.int32()),
                        "dim": pa.array([], pa.int32()),
                        "qsum": pa.array([], pa.int64()),
                        "cnt": pa.array([], pa.int64()),
                    }
                )
            a = _exact_argmin(q, c)
            sums = np.zeros((len(c), q.shape[1]), np.int64)
            np.add.at(sums, a, q)
            counts = np.bincount(a, minlength=len(c)).astype(np.int64)
            dim = q.shape[1]
            return pa.table(
                {
                    "c": pa.array(np.repeat(np.arange(len(c), dtype=np.int32), dim)),
                    "dim": pa.array(np.tile(np.arange(dim, dtype=np.int32), len(c))),
                    "qsum": pa.array(sums.reshape(-1)),
                    "cnt": pa.array(np.repeat(counts, dim)),
                }
            )

        merged = (
            ds.map_batches(upd_partial, batch_format="pyarrow")
            .groupby(["c", "dim"])
            .aggregate(Sum("qsum", alias_name="qsum"), Sum("cnt", alias_name="cnt"))
            .to_pandas()  # bounded: k × dim rows
        ).sort_values(["c", "dim"])
        new = cent.copy()
        for ci, grp in merged.groupby("c"):
            n = int(grp["cnt"].iloc[0])
            if n > 0:  # empty cells keep their previous centroid
                new[int(ci)] = np.floor_divide(
                    grp["qsum"].to_numpy(np.int64), np.int64(n)
                )
        cent = new
    return cent


def _exact_argmin(q: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Exact int64 squared-distance argmin of each row of ``q`` against
    the centroid rows of ``c``; ties → lowest centroid id."""
    d = np.empty((len(q), len(c)), np.int64)
    for j in range(len(c)):
        diff = q - c[j][None, :]
        d[:, j] = (diff * diff).sum(axis=1)
    return d.argmin(axis=1)


def ivf_pq_build(
    ds: "ray.data.Dataset",
    k_coarse: int = 4,
    coarse_iters: int = 1,
    m: int = 4,
    k_codes: int = 4,
    pq_iters: int = 1,
    quantize: int = 1_000_000,
    id_column: str = "vec_id",
    vec_column: str = "embedding",
) -> tuple[np.ndarray, np.ndarray, "ray.data.Dataset"]:
    """Build an IVF-PQ index (Jégou et al. 2011 §V — the index every
    billion-vector ANN system actually ships): an integer Lloyd coarse
    quantizer partitions the corpus into ``k_coarse`` inverted lists, and
    a product quantizer trained on the RESIDUALS (vector − its cell
    centroid, exactly representable in int64 after fixed-point
    quantization) compresses each member to ``m`` codeword ids. Search
    then probes only ``nprobe`` cells and scores by residual-ADC lookup
    — at 100 TB the code table is the only corpus-sized artifact
    (cell + m small ints per row), vectors never shuffle, and both
    training passes are combiner-shaped (k·dim partials per block).

    Same conformance doctrine as :func:`kmeans_exact_assign` /
    :func:`pq_train`: seeds = smallest ids, integer centroids via exact
    floor-div, argmin ties → lowest id — so a generated SQL mirror
    reproduces cells, codes, and the final ranking bit-for-bit.

    Returns ``(coarse int64 [k_coarse, dim], codebooks int64
    [m, k_codes, dsub], codes_ds)`` where ``codes_ds`` has
    ``id_column, cell int32, code_0..code_{m-1} int32``.
    """
    from ray.data.aggregate import Sum

    coarse = _exact_lloyd(ds, k_coarse, coarse_iters, quantize, id_column, vec_column)
    dim = coarse.shape[1]
    ms, ks = int(m), int(k_codes)
    if dim % ms:
        raise ValueError(f"dim {dim} not divisible by m={ms}")
    dsub = dim // ms
    coarse_ref = ray.put(coarse)

    def _residuals(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
        """(residual int64 [n, dim], cell int32 [n]) for a batch."""
        c = ray.get(coarse_ref)
        q = _pq_quant(_batch_matrix(batch, vec_column), quantize)
        cell = _exact_argmin(q, c)
        return q - c[cell], cell.astype(np.int32)

    # ---- PQ seeds: residual subvectors of the k_codes smallest ids
    def seed_partial(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_column).to_numpy(zero_copy_only=False).astype(np.int64)
        if not len(ids):
            return pa.table(
                {"id": pa.array([], pa.int64()), "vec": pa.array([], pa.list_(pa.int64()))}
            )
        kk = min(ks, len(ids))
        top = np.argpartition(ids, kk - 1)[:kk] if kk < len(ids) else np.arange(len(ids))
        r, _ = _residuals(batch)
        return pa.table(
            {
                "id": pa.array(ids[top]),
                "vec": pa.array([r[i].tolist() for i in top], pa.list_(pa.int64())),
            }
        )

    seeds = ds.map_batches(seed_partial, batch_format="pyarrow").to_pandas()
    seeds = seeds.sort_values("id").head(ks)
    full = np.stack([np.asarray(v, np.int64) for v in seeds["vec"]])  # [k, dim]
    cbs = np.stack([full[:, s * dsub : (s + 1) * dsub] for s in range(ms)])

    for _ in range(int(pq_iters)):
        cref = ray.put(cbs)

        def upd_partial(batch: pa.Table) -> pa.Table:
            c = ray.get(cref)  # [m, k, dsub]
            r, _ = _residuals(batch)
            if not len(r):
                return pa.table(
                    {
                        "sub": pa.array([], pa.int32()),
                        "c": pa.array([], pa.int32()),
                        "dim": pa.array([], pa.int32()),
                        "qsum": pa.array([], pa.int64()),
                        "cnt": pa.array([], pa.int64()),
                    }
                )
            subs, cls, dims, qsums, cnts = [], [], [], [], []
            for s in range(ms):
                rs = r[:, s * dsub : (s + 1) * dsub]
                a = _pq_assign_sub(rs, c[s])
                sums = np.zeros((ks, dsub), np.int64)
                np.add.at(sums, a, rs)
                counts = np.bincount(a, minlength=ks).astype(np.int64)
                subs.append(np.full(ks * dsub, s, np.int32))
                cls.append(np.repeat(np.arange(ks, dtype=np.int32), dsub))
                dims.append(np.tile(np.arange(dsub, dtype=np.int32), ks))
                qsums.append(sums.reshape(-1))
                cnts.append(np.repeat(counts, dsub))
            return pa.table(
                {
                    "sub": pa.array(np.concatenate(subs)),
                    "c": pa.array(np.concatenate(cls)),
                    "dim": pa.array(np.concatenate(dims)),
                    "qsum": pa.array(np.concatenate(qsums)),
                    "cnt": pa.array(np.concatenate(cnts)),
                }
            )

        merged = (
            ds.map_batches(upd_partial, batch_format="pyarrow")
            .groupby(["sub", "c", "dim"])
            .aggregate(Sum("qsum", alias_name="qsum"), Sum("cnt", alias_name="cnt"))
            .to_pandas()  # bounded: m × k × dsub rows
        ).sort_values(["sub", "c", "dim"])
        new = cbs.copy()
        for (s, ci), grp in merged.groupby(["sub", "c"]):
            n = int(grp["cnt"].iloc[0])
            if n > 0:
                new[int(s), int(ci)] = np.floor_divide(
                    grp["qsum"].to_numpy(np.int64), np.int64(n)
                )
        cbs = new

    cbs_ref = ray.put(cbs)

    def enc(batch: pa.Table) -> pa.Table:
        c = ray.get(cbs_ref)
        data: dict = {id_column: batch.column(id_column)}
        if not len(batch):
            data["cell"] = pa.array([], pa.int32())
            for s in range(ms):
                data[f"code_{s}"] = pa.array([], pa.int32())
            return pa.table(data)
        r, cell = _residuals(batch)
        data["cell"] = pa.array(cell)
        for s in range(ms):
            data[f"code_{s}"] = pa.array(
                _pq_assign_sub(r[:, s * dsub : (s + 1) * dsub], c[s])
            )
        return pa.table(data)

    return coarse, cbs, ds.map_batches(enc, batch_format="pyarrow")


def ivf_pq_search(
    codes_ds: "ray.data.Dataset",
    coarse: np.ndarray,
    codebooks: np.ndarray,
    query_vectors_quantized: np.ndarray,
    k: int = 5,
    nprobe: int = 2,
    id_column: str = "vec_id",
) -> pa.Table:
    """Residual-ADC top-k over an IVF-PQ code table: each query probes its
    ``nprobe`` exactly-nearest coarse cells (ties → lowest cell id), a
    per-(query, probed-cell) lookup table of exact int64 residual
    subspace distances broadcasts once, and each code batch resolves the
    probed rows by pure gather-sum with per-batch partial top-k (ties →
    lowest id) and a bounded driver reduce. Rows outside the probed
    cells are never touched — the read itself would be partition-pruned
    at scale when the code table is hive-partitioned by ``cell``.

    Returns (query_id int32, vec_id, adc_dist int64, rnk int64 1-based),
    deterministic at any parallelism.
    """
    import pandas as pd

    cc = np.asarray(coarse, np.int64)  # [kc, dim]
    cbs = np.asarray(codebooks, np.int64)  # [m, kcode, dsub]
    ms, _, dsub = cbs.shape
    qv = np.atleast_2d(np.asarray(query_vectors_quantized, np.int64))  # [nq, dim]
    nq = len(qv)
    npb = min(int(nprobe), len(cc))

    # probed cells per query: exact distances, stable sort keeps lowest id on ties
    dcell = np.empty((nq, len(cc)), np.int64)
    for j in range(len(cc)):
        diff = qv - cc[j][None, :]
        dcell[:, j] = (diff * diff).sum(axis=1)
    probed = np.argsort(dcell, axis=1, kind="stable")[:, :npb].astype(np.int32)

    # lut[j, p, s, c] = exact squared distance of query j's residual in
    # probed cell p (subvector s) to codeword c
    kcode = cbs.shape[1]
    lut = np.empty((nq, npb, ms, kcode), np.int64)
    for j in range(nq):
        for p in range(npb):
            r = qv[j] - cc[probed[j, p]]
            for s in range(ms):
                diff = r[s * dsub : (s + 1) * dsub][None, :] - cbs[s]
                lut[j, p, s, :] = (diff * diff).sum(axis=1)
    pref = ray.put((probed, lut))

    def partial_topk(batch: pa.Table) -> pa.Table:
        pb, lt = ray.get(pref)
        empty = pa.table(
            {
                "query_id": pa.array([], pa.int32()),
                id_column: pa.array([], pa.int64()),
                "adc_dist": pa.array([], pa.int64()),
            }
        )
        if not len(batch):
            return empty
        ids = batch.column(id_column).to_numpy(zero_copy_only=False).astype(np.int64)
        cells = batch.column("cell").to_numpy(zero_copy_only=False)
        codes = np.stack(
            [
                batch.column(f"code_{s}").to_numpy(zero_copy_only=False)
                for s in range(ms)
            ],
            axis=1,
        )  # [n, m]
        subs = np.arange(ms)[None, :]
        out_q, out_id, out_d = [], [], []
        for j in range(len(lt)):
            j_ids, j_d = [], []
            for p in range(pb.shape[1]):
                mask = cells == pb[j, p]
                if not mask.any():
                    continue
                j_ids.append(ids[mask])
                j_d.append(lt[j, p][subs, codes[mask]].sum(axis=1))
            if not j_ids:
                continue
            cand_ids = np.concatenate(j_ids)
            cand_d = np.concatenate(j_d)
            sel = np.lexsort((cand_ids, cand_d))[: min(k, len(cand_ids))]
            out_q.append(np.full(len(sel), j, np.int32))
            out_id.append(cand_ids[sel])
            out_d.append(cand_d[sel])
        if not out_q:
            return empty
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q)),
                id_column: pa.array(np.concatenate(out_id)),
                "adc_dist": pa.array(np.concatenate(out_d)),
            }
        )

    partials = codes_ds.map_batches(partial_topk, batch_format="pyarrow").to_pandas()
    out = (
        partials.sort_values(["query_id", "adc_dist", id_column], ignore_index=True)
        .groupby("query_id", as_index=False)
        .head(k)
        .reset_index(drop=True)
    )
    out["rnk"] = (out.groupby("query_id").cumcount() + 1).astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False)


# ---------------------------------------------------------------------------
# DBSCAN: density-based clustering over the embedding column
# ---------------------------------------------------------------------------


def dbscan_embeddings(
    ds: "ray.data.Dataset",
    eps2: int,
    min_pts: int,
    quantize: int = 1_000_000,
    id_column: str = "vec_id",
    vec_column: str = "embedding",
    index_limit: int = 4_000_000,
) -> "ray.data.Dataset":
    """Exact DBSCAN (Ester et al., KDD 1996) over an embedding column,
    parallelism-invariant and SQL-mirrorable end-to-end.

    Distances are exact integers: vectors fixed-point quantize to
    ``floor(x·quantize + 0.5)`` int64 and ``eps2`` is the squared radius on
    that scale, so core/border decisions carry no float ambiguity. The
    squared distances are computed through a float64 BLAS matmul of the
    integer values — exact because every product and partial sum stays
    below 2⁵³ (asserted per batch).

    Shape: the (id, vector) table broadcasts once (``ray.put``), like
    :func:`knn_join`'s exact path, guarded at ``index_limit``; batches then
    stream through three passes — (1) ε-neighbor counts → core ids
    (includes self, the classic formulation), (2) core-core edge + border
    adjacency emission, (3) connected components over core edges
    (:func:`dedupe_ray.clustering.connected_components` — driver UF under
    the edge limit, bucketed iteration above) with cluster_id = the
    numeric-min core member; border points take the min cluster among
    their core neighbors; noise is dropped. The scale path above
    ``index_limit`` would swap the broadcast for IVF-bucketed candidate
    generation (accepting approximate neighborhoods); this operator is the
    exact-conformance variant and raises instead of silently degrading.

    Returns (id_column, cluster int64, role 'core'|'border').
    """
    import pyarrow.compute as pc

    from dedupe_ray.clustering import connected_components

    n = ds.count()
    if n > index_limit:
        raise ValueError(
            f"dbscan_embeddings exact path supports ≤ {index_limit} rows "
            f"(got {n}); use IVF-bucketed approximate DBSCAN at this scale"
        )
    blocks = [
        t
        for t in ray.get(ds.select_columns([id_column, vec_column]).to_arrow_refs())
        if t.num_columns > 0
    ]
    tbl = pa.concat_tables(blocks).combine_chunks()
    ids = tbl.column(id_column).to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(ids, kind="stable")
    ids = ids[order]
    col = tbl.column(vec_column).combine_chunks()
    dim = len(col[0]) if len(col) else 0
    qm = _pq_quant(
        col.flatten().to_numpy(zero_copy_only=False).reshape(len(tbl), dim)[order],
        quantize,
    )
    assert dim * float(np.abs(qm).max() if len(qm) else 0) ** 2 < 2**53
    qf = qm.astype(np.float64)
    rnorm = (qf * qf).sum(axis=1)
    ref = ray.put((ids, qf, rnorm))

    def _dists(bq: np.ndarray, rq: np.ndarray, rn: np.ndarray) -> np.ndarray:
        bf = bq.astype(np.float64)
        bn = (bf * bf).sum(axis=1)
        return (bn[:, None] + rn[None, :] - 2.0 * (bf @ rq.T)).astype(np.int64)

    empty_cnt = pa.table(
        {"vid": pa.array([], pa.int64()), "cnt": pa.array([], pa.int64())}
    )

    def counts(batch: pa.Table) -> pa.Table:
        if not len(batch):
            return empty_cnt
        rid, rq, rn = ray.get(ref)
        bq = _pq_quant(_batch_matrix(batch, vec_column), quantize)
        d = _dists(bq, rq, rn)
        return pa.table(
            {
                "vid": pa.array(
                    batch.column(id_column)
                    .to_numpy(zero_copy_only=False)
                    .astype(np.int64)
                ),
                "cnt": pa.array((d <= eps2).sum(axis=1).astype(np.int64)),
            }
        )

    cdf = (
        ds.map_batches(counts, batch_format="pyarrow").to_pandas()
    )  # bounded: ≤ index_limit (id, cnt) rows, the same budget as the index
    core_ids = np.sort(cdf.loc[cdf["cnt"] >= min_pts, "vid"].to_numpy(np.int64))
    coreref = ray.put(core_ids)

    empty_edges = pa.table(
        {
            "kind": pa.array([], pa.int8()),
            "a": pa.array([], pa.int64()),
            "b": pa.array([], pa.int64()),
        }
    )

    def emit(batch: pa.Table) -> pa.Table:
        if not len(batch):
            return empty_edges
        rid, rq, rn = ray.get(ref)
        core = ray.get(coreref)
        bq = _pq_quant(_batch_matrix(batch, vec_column), quantize)
        bid = batch.column(id_column).to_numpy(zero_copy_only=False).astype(np.int64)
        d = _dists(bq, rq, rn)
        nbr = d <= eps2
        col_core = np.isin(rid, core, assume_unique=True)
        row_core = np.isin(bid, core)
        # core-core edges, owned by the lower id (plus a self edge so
        # isolated core points still form singleton clusters)
        m_edge = nbr & row_core[:, None] & col_core[None, :] & (
            rid[None, :] >= bid[:, None]
        )
        ei, ej = np.nonzero(m_edge)
        # border adjacency: non-core row → every core neighbor
        m_bord = nbr & ~row_core[:, None] & col_core[None, :]
        bi, bj = np.nonzero(m_bord)
        return pa.table(
            {
                "kind": pa.array(
                    np.concatenate(
                        [np.zeros(len(ei), np.int8), np.ones(len(bi), np.int8)]
                    )
                ),
                "a": pa.array(np.concatenate([bid[ei], bid[bi]])),
                "b": pa.array(np.concatenate([rid[ej], rid[bj]])),
            }
        )

    emitted = ds.map_batches(emit, batch_format="pyarrow").materialize()

    def edge_str(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.equal(batch.column("kind"), pa.scalar(0, pa.int8())))
        # zero-pad: lexico-min component id == numeric-min core member
        return pa.table(
            {
                "id_a": pc.utf8_lpad(pc.cast(t.column("a"), pa.string()), 20, "0"),
                "id_b": pc.utf8_lpad(pc.cast(t.column("b"), pa.string()), 20, "0"),
            }
        )

    cc = connected_components(emitted.map_batches(edge_str, batch_format="pyarrow"))
    ccdf = cc.to_pandas()  # bounded: one row per core point
    if len(ccdf):
        core_nodes = ccdf["doc_id"].astype(np.int64).to_numpy()
        core_clusters = ccdf["component_id"].astype(np.int64).to_numpy()
        o = np.argsort(core_nodes, kind="stable")
        core_nodes, core_clusters = core_nodes[o], core_clusters[o]
    else:
        core_nodes = np.array([], np.int64)
        core_clusters = np.array([], np.int64)
    cmapref = ray.put((core_nodes, core_clusters))

    from ray.data.aggregate import Min

    def border_rows(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.equal(batch.column("kind"), pa.scalar(1, pa.int8())))
        if not len(t):
            return pa.table(
                {"bid": pa.array([], pa.int64()), "cl": pa.array([], pa.int64())}
            )
        nodes, clusters = ray.get(cmapref)
        j = np.searchsorted(nodes, t.column("b").to_numpy(zero_copy_only=False))
        return pa.table(
            {
                "bid": t.column("a"),
                "cl": pa.array(clusters[j]),
            }
        )

    border = (
        emitted.map_batches(border_rows, batch_format="pyarrow")
        .groupby("bid")
        .aggregate(Min("cl", alias_name="cl"))
    )

    def core_out(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                id_column: pc.cast(batch.column("doc_id"), pa.int64()),
                "cluster": pc.cast(batch.column("component_id"), pa.int64()),
                "role": pa.array(["core"] * len(batch), pa.string()),
            }
        )

    def border_out(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                id_column: batch.column("bid"),
                "cluster": batch.column("cl"),
                "role": pa.array(["border"] * len(batch), pa.string()),
            }
        )

    return cc.map_batches(core_out, batch_format="pyarrow").union(
        border.map_batches(border_out, batch_format="pyarrow")
    )


def mutual_knn_pairs(
    ds: "ray.data.Dataset",
    k: int = 5,
    id_column: str = "vec_id",
) -> "ray.data.Dataset":
    """Reciprocal-nearest-neighbor pairs: (a, b) with a < b where b is in
    a's cosine top-k AND a is in b's — the high-precision near-duplicate
    / translation-mining filter (mutual kNN kills the hub-vector false
    positives a one-sided top-k keeps). Composition: :func:`knn_join`
    (exact below its index limit, IVF-routed above) → canonical
    (min, max) pair emission → one pair-keyed groupby; a pair can appear
    at most once per side, so count == 2 ⟺ mutual. Shuffle volume is
    k·n pair rows, never vectors. Returns (id_a, id_b)."""
    knn = knn_join(ds, k=k, id_column=id_column)

    def canon(t: pa.Table) -> pa.Table:
        a = t.column(id_column).to_numpy(zero_copy_only=False).astype(np.int64)
        b = t.column("neighbor_id").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {"id_a": pa.array(np.minimum(a, b)), "id_b": pa.array(np.maximum(a, b))}
        )

    def keep_mutual(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        mask = pc.equal(t.column("count()"), 2)
        return t.filter(mask).drop_columns(["count()"])

    return (
        knn.map_batches(canon, batch_format="pyarrow")
        .groupby(["id_a", "id_b"])
        .count()
        .map_batches(keep_mutual, batch_format="pyarrow")
    )


def lsh_hyperplane_pairs(
    ds: "ray.data.Dataset",
    id_column: str = "vec_id",
    vector_column: str = "embedding",
    dim: int = 64,
    nbits: int = 32,
    bands: int = 4,
    quant_scale: int = 1000,
) -> "ray.data.Dataset":
    """Random-hyperplane LSH candidate pairs over an embedding column
    (Charikar 2002 — SimHash for cosine): the SCALE path for
    embedding-space near-duplicate candidate generation. Each vector gets
    an ``nbits``-bit signature (bit b = sign of ⟨v, h_b⟩ against a
    deterministic ±1 hyperplane), the signature splits into ``bands``
    bands, and two vectors become a candidate pair iff they agree on ALL
    bits of at least one band — cosine-close vectors collide with high
    probability, everything else almost never. Band width (nbits/bands)
    is the bucket-size lever: wider bands → exponentially smaller
    buckets → fewer candidates (raise it on bigger corpora; the
    brute-force / IVF paths in :func:`knn_join` are the verify stage).

    Everything is engine-exact so a SQL mirror hash-matches: hyperplane
    entries are ±1 from a Knuth multiplicative hash of the (bit, dim)
    index, vectors quantize to ``floor(x·quant_scale + 0.5)`` int64
    (the embedding_gram doctrine), and each dot product is an order-free
    int64 sum. Shape: one signature ``map_batches`` (a [n, nbits] int64
    matmul per batch — vectors never leave their block), a bands·n-row
    (band, key, id) shuffle of INTEGER rows only, per-bucket triu pair
    emission, and one pair-keyed distinct. Returns (id_a, id_b),
    canonical a < b."""
    import pyarrow.compute as pc

    if nbits % bands:
        raise ValueError(f"bands ({bands}) must divide nbits ({nbits})")
    r = nbits // bands
    if r > 62:
        raise ValueError("band width > 62 bits overflows the int64 band key")
    idx = np.arange(nbits, dtype=np.int64)[:, None] * dim + np.arange(
        dim, dtype=np.int64
    ) + 1
    signs = np.where((idx * 2654435761) % (2**32) < 2**31, 1, -1).astype(np.int64)
    weights = (1 << np.arange(r, dtype=np.int64)).reshape(1, 1, r)

    def signature(t: pa.Table) -> pa.Table:
        vecs = t.column(vector_column)
        flat = pc.list_flatten(vecs).to_numpy(zero_copy_only=False)
        v = flat.astype(np.float64).reshape(-1, dim)
        q = np.floor(v * quant_scale + 0.5).astype(np.int64)
        bits = (q @ signs.T >= 0).astype(np.int64).reshape(-1, bands, r)
        keys = (bits * weights).sum(axis=2)  # [n, bands]
        n = len(t)
        return pa.table(
            {
                "band": pa.array(np.tile(np.arange(bands, dtype=np.int64), n)),
                "key": pa.array(keys.ravel()),
                "id": pa.array(
                    np.repeat(
                        t.column(id_column).to_numpy(zero_copy_only=False), bands
                    )
                ),
            }
        )

    def bucket_pairs(g: pa.Table) -> pa.Table:
        ids = np.sort(g.column("id").to_numpy(zero_copy_only=False))
        k = len(ids)
        if k < 2:
            return pa.table(
                {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64())}
            )
        iu, ju = np.triu_indices(k, 1)
        return pa.table({"id_a": pa.array(ids[iu]), "id_b": pa.array(ids[ju])})

    return (
        ds.map_batches(signature, batch_format="pyarrow")
        .groupby(["band", "key"])
        .map_groups(bucket_pairs, batch_format="pyarrow")
        .groupby(["id_a", "id_b"])
        .count()
        .drop_columns(["count()"])
    )


def silhouette_embeddings(
    ds: "ray.data.Dataset",
    k: int = 4,
    iters: int = 2,
    quantize: int = 1_000_000,
    id_column: str = "vec_id",
    vec_column: str = "embedding",
) -> "ray.data.Dataset":
    """Simplified (centroid-based) silhouette over the exact-integer
    Lloyd clustering (:func:`kmeans_exact_assign`'s conformance path) —
    the standard clustering-quality diagnostic at scale, where the true
    silhouette's all-pairs distances are quadratic and the
    centroid-distance form is what practitioners ship. Per vector:

        d_own  = floor(sqrt(d²_assigned)),  d_next = floor(sqrt(min
                 d² over the other centroids)),
        s      = s_num / s_den = (d_next − d_own) / max(d_own, d_next, 1)

    emitted as the exact int64 num/den pair (s can be negative and
    floor-div signs differ across engines — the caller divides). d² is
    exact int64 < 2⁵³, so IEEE sqrt is correctly rounded on the same
    value in every engine and the floor is engine-exact. One streaming
    pass against the broadcast [k, dim] int64 centroid table; vectors
    never shuffle. Output: (id, cluster, d_own, d_next, s_num, s_den)."""
    cents = _exact_lloyd(ds, k, iters, quantize, id_column, vec_column)

    def score(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        flat = pc.list_flatten(t.column(vec_column)).to_numpy(zero_copy_only=False)
        v = flat.astype(np.float64).reshape(len(t), -1)
        q = np.floor(v * quantize + 0.5).astype(np.int64)
        d2 = np.empty((len(q), len(cents)), np.int64)
        for j in range(len(cents)):
            diff = q - cents[j][None, :]
            d2[:, j] = (diff * diff).sum(axis=1)
        own = d2.argmin(axis=1)  # ties -> lowest cluster id (np argmin)
        rows = np.arange(len(q))
        d2_own = d2[rows, own]
        masked = d2.copy()
        masked[rows, own] = np.iinfo(np.int64).max
        d2_next = masked.min(axis=1)
        d_own = np.floor(np.sqrt(d2_own.astype(np.float64))).astype(np.int64)
        d_next = np.floor(np.sqrt(d2_next.astype(np.float64))).astype(np.int64)
        return pa.table(
            {
                id_column: t.column(id_column),
                "cluster": pa.array(own.astype(np.int64)),
                "d_own": pa.array(d_own),
                "d_next": pa.array(d_next),
                "s_num": pa.array(d_next - d_own),
                "s_den": pa.array(np.maximum(np.maximum(d_own, d_next), 1)),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")
