"""Deduplication operators for training-data pipelines.

- exact_dedup: content-hash → hash-partitioned keep-first (one shuffle).
- minhash_lsh_pairs / minhash_dedup: shingle → minhash → banded LSH buckets
  → groupby(band, hash) candidate pairs → exact-Jaccard verify → connected
  components (the standard MinHash-LSH near-dup pipeline; Broder '97).
- simhash_pairs: 64-bit SimHash (Charikar '02) with Hamming-ball bucketing.
- ngram_jaccard_pairs: exact n-gram Jaccard verification kernel.

All heavy stages are vectorized map_batches; the only shuffles are the
bucket groupbys and the final components pass.
"""

from __future__ import annotations

import re
from itertools import combinations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from dedupe_ray.clustering import connected_components

_WORD = re.compile(r"[\w']+", re.U)

# 64-bit multiply-shift hash family (deterministic seeds)
_MERSENNE = (1 << 61) - 1


def _hash_family(n: int, seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=n, dtype=np.int64).astype(np.uint64)
    b = rng.randint(0, _MERSENNE, size=n, dtype=np.int64).astype(np.uint64)
    return a, b


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    """k-word shingles → uint64 hashes (python hash of tuple is unstable
    across processes; use FNV over the joined shingle)."""
    toks = _WORD.findall((text or "").lower())
    if len(toks) < k:
        toks = toks + [""] * (k - len(toks))
    out = np.empty(max(1, len(toks) - k + 1), np.uint64)
    for i in range(len(out)):
        s = " ".join(toks[i: i + k]).encode()
        h = np.uint64(14695981039346656037)
        for byte in s:
            h = np.uint64((int(h) ^ byte) * 1099511628211 & 0xFFFFFFFFFFFFFFFF)
        out[i] = h
    return out


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------


def add_content_hash(batch: pa.Table, column: str = "text", out: str = "content_hash") -> pa.Table:
    """Vectorized 64-bit content hash of a string column (keyed on the exact
    bytes; whitespace-sensitive — exact dedup semantics)."""
    import zlib

    vals = pc.fill_null(batch.column(column), "").to_pylist()
    h = np.fromiter(
        ((zlib.crc32(v.encode()) << 32) | zlib.adler32(v.encode()) for v in vals),
        np.uint64,
        len(vals),
    )
    return batch.append_column(out, pa.array(h, pa.uint64()))


def exact_dedup(
    ds: "ray.data.Dataset", column: str = "text", id_column: str = "doc_id"
) -> "ray.data.Dataset":
    """Keep the min-id row per distinct value: hash column (map_batches) →
    ``groupby(content_hash).map_groups(first)`` — the canonical one-shuffle
    exact dedup. Output = surviving rows (original columns)."""
    hashed = ds.map_batches(
        lambda b: add_content_hash(b, column), batch_format="pyarrow"
    )

    def keep_first(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(group, sort_keys=[(id_column, "ascending")])
        return group.take(order[:1]).drop_columns(["content_hash"])

    return hashed.groupby("content_hash").map_groups(keep_first, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


class MinHasher:
    """Actor-pool stage: text → num_perm minhash signature (uint64 cols as a
    fixed-size list) — hash family built once per actor."""

    def __init__(self, num_perm: int = 64, shingle_k: int = 3, seed: int = 42):
        self.a, self.b = _hash_family(num_perm, seed)
        self.k = shingle_k
        self.num_perm = num_perm

    def signature(self, text: str) -> np.ndarray:
        sh = _shingle_hashes(text, self.k)
        # (a*x + b) mod p, min over shingles, vectorized over perms × shingles
        prod = (sh[None, :] * self.a[:, None] + self.b[:, None]) % np.uint64(_MERSENNE)
        return prod.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        sigs = np.stack([self.signature(t) for t in texts]) if texts else np.zeros((0, self.num_perm), np.uint64)
        col = pa.FixedSizeListArray.from_arrays(
            pa.array(sigs.reshape(-1), pa.uint64()), self.num_perm
        )
        return pa.table({"doc_id": batch.column("doc_id"), "minhash": col})


def minhash_lsh_pairs(
    ds: "ray.data.Dataset",
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    jaccard_threshold: float = 0.7,
    concurrency=(1, 8),
    max_bucket: int = 2000,
) -> "ray.data.Dataset":
    """Near-duplicate candidate pairs via banded MinHash-LSH, verified by
    signature-estimated Jaccard.

    Stages: MinHasher actor pool → explode to (band_id, band_hash, doc_id)
    → groupby(band) bucket pairs (size-capped) → pair dedup → Jaccard
    verify (signature agreement). Returns (id_a, id_b, jaccard)."""
    rows_per_band = num_perm // bands
    sigs = ds.map_batches(
        MinHasher,
        fn_constructor_args=(num_perm, shingle_k),
        batch_format="pyarrow",
        concurrency=concurrency,
    ).materialize()

    def explode_bands(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        sig = np.asarray(batch.column("minhash").combine_chunks().flatten().to_numpy(zero_copy_only=False)).reshape(len(ids), num_perm)
        out_band, out_hash, out_id = [], [], []
        for b in range(bands):
            seg = sig[:, b * rows_per_band: (b + 1) * rows_per_band]
            # fold the band rows into one uint64 bucket key
            key = seg[:, 0].copy()
            for c in range(1, rows_per_band):
                key = key * np.uint64(1099511628211) ^ seg[:, c]
            out_band.extend([b] * len(ids))
            out_hash.extend(key.tolist())
            out_id.extend(ids)
        return pa.table(
            {
                "band": pa.array(out_band, pa.int32()),
                "bucket": pa.array(out_hash, pa.uint64()),
                "doc_id": pa.array(out_id, pa.string()),
            }
        )

    buckets = sigs.map_batches(explode_bands, batch_format="pyarrow")

    def emit_pairs(group: pa.Table) -> pa.Table:
        ids = sorted(set(group.column("doc_id").to_pylist()))
        if len(ids) < 2 or len(ids) > max_bucket:
            return pa.table({"id_a": pa.array([], pa.string()), "id_b": pa.array([], pa.string())})
        a, b = zip(*combinations(ids, 2))
        return pa.table({"id_a": pa.array(a, pa.string()), "id_b": pa.array(b, pa.string())})

    pairs = (
        buckets.groupby(["band", "bucket"])
        .map_groups(emit_pairs, batch_format="pyarrow")
        .groupby(["id_a", "id_b"])
        .count()
        .drop_columns(["count()"])
    )

    # verify: estimated Jaccard = fraction of agreeing minhash positions;
    # signatures are broadcast (small: num_perm uint64 per doc)
    import ray as _ray

    sig_tbl = pa.Table.from_pandas(sigs.to_pandas())
    ref = _ray.put(sig_tbl)

    class Verify:
        def __init__(self, sig_ref, num_perm):
            t = _ray.get(sig_ref)
            ids = t.column("doc_id").to_pylist()
            mat = np.asarray(t.column("minhash").combine_chunks().flatten().to_numpy(zero_copy_only=False)).reshape(len(ids), num_perm)
            self.index = {d: i for i, d in enumerate(ids)}
            self.mat = mat

        def __call__(self, batch: pa.Table) -> pa.Table:
            ia = [self.index[d] for d in batch.column("id_a").to_pylist()]
            ib = [self.index[d] for d in batch.column("id_b").to_pylist()]
            jac = (self.mat[ia] == self.mat[ib]).mean(axis=1).astype(np.float32)
            return pa.table(
                {
                    "id_a": batch.column("id_a"),
                    "id_b": batch.column("id_b"),
                    "jaccard": pa.array(jac),
                }
            )

    verified = pairs.map_batches(
        Verify, fn_constructor_args=(ref, num_perm), batch_format="pyarrow", concurrency=concurrency
    )
    return verified.filter(expr=f"jaccard >= {jaccard_threshold}")


def minhash_dedup(
    ds: "ray.data.Dataset",
    jaccard_threshold: float = 0.7,
    **kwargs,
) -> "ray.data.Dataset":
    """Near-dup groups: LSH pairs → connected components →
    (doc_id, component_id) membership for docs in any near-dup group."""
    pairs = minhash_lsh_pairs(ds, jaccard_threshold=jaccard_threshold, **kwargs)
    return connected_components(pairs)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


class SimHasher:
    """64-bit SimHash over word features; actor-pool stage → (doc_id, simhash)."""

    def __init__(self, seed: int = 42):
        self.a, self.b = _hash_family(1, seed)

    @staticmethod
    def _word_hash(w: str) -> int:
        h = 14695981039346656037
        for byte in w.encode():
            h = (h ^ byte) * 1099511628211 & 0xFFFFFFFFFFFFFFFF
        return h

    def simhash(self, text: str) -> np.uint64:
        toks = _WORD.findall((text or "").lower())
        if not toks:
            return np.uint64(0)
        acc = np.zeros(64, np.int64)
        shifts = np.arange(64, dtype=np.uint64)
        for t in toks:
            h = np.uint64(self._word_hash(t))
            bits = (h >> shifts) & np.uint64(1)
            acc += np.where(bits == 1, 1, -1)
        out = np.uint64(0)
        for i in range(64):
            if acc[i] > 0:
                out |= np.uint64(1) << np.uint64(i)
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        vals = np.array(
            [self.simhash(t) for t in batch.column("text").to_pylist()], np.uint64
        )
        return pa.table({"doc_id": batch.column("doc_id"), "simhash": pa.array(vals, pa.uint64())})


def simhash_pairs(
    ds: "ray.data.Dataset",
    max_hamming: int = 3,
    n_tables: int = 4,
    concurrency=(1, 8),
) -> "ray.data.Dataset":
    """Near-dup pairs by SimHash: bucket on n_tables 16-bit key segments
    (any pair within Hamming distance ≤ 3 of a 64-bit hash agrees exactly on
    ≥1 of 4 segments — pigeonhole), verify Hamming map-side."""
    sigs = ds.map_batches(
        SimHasher, batch_format="pyarrow", concurrency=concurrency
    ).materialize()

    seg_bits = 64 // n_tables

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        h = batch.column("simhash").to_numpy(zero_copy_only=False).astype(np.uint64)
        out_t, out_k, out_i = [], [], []
        for t in range(n_tables):
            seg = (h >> np.uint64(t * seg_bits)) & np.uint64((1 << seg_bits) - 1)
            out_t.extend([t] * len(ids))
            out_k.extend(seg.tolist())
            out_i.extend(ids)
        return pa.table(
            {
                "tbl": pa.array(out_t, pa.int32()),
                "seg": pa.array(out_k, pa.uint64()),
                "doc_id": pa.array(out_i, pa.string()),
            }
        )

    buckets = sigs.map_batches(explode, batch_format="pyarrow")

    def emit(group: pa.Table) -> pa.Table:
        ids = sorted(set(group.column("doc_id").to_pylist()))
        if len(ids) < 2 or len(ids) > 2000:
            return pa.table({"id_a": pa.array([], pa.string()), "id_b": pa.array([], pa.string())})
        a, b = zip(*combinations(ids, 2))
        return pa.table({"id_a": pa.array(a, pa.string()), "id_b": pa.array(b, pa.string())})

    pairs = (
        buckets.groupby(["tbl", "seg"])
        .map_groups(emit, batch_format="pyarrow")
        .groupby(["id_a", "id_b"])
        .count()
        .drop_columns(["count()"])
    )

    import ray as _ray

    lookup = dict(
        zip(
            sigs.to_pandas()["doc_id"],
            sigs.to_pandas()["simhash"].astype(np.uint64),
        )
    )
    ref = _ray.put(lookup)

    def verify(batch: pa.Table) -> pa.Table:
        m = _ray.get(ref)
        ha = np.array([m[d] for d in batch.column("id_a").to_pylist()], np.uint64)
        hb = np.array([m[d] for d in batch.column("id_b").to_pylist()], np.uint64)
        x = ha ^ hb
        ham = np.zeros(len(x), np.int32)
        for i in range(64):
            ham += ((x >> np.uint64(i)) & np.uint64(1)).astype(np.int32)
        out = batch.append_column("hamming", pa.array(ham, pa.int32()))
        return out.filter(pc.less_equal(out.column("hamming"), max_hamming))

    return pairs.map_batches(verify, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# n-gram Jaccard verification
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(
    ds: "ray.data.Dataset",
    pairs_ds: "ray.data.Dataset",
    n: int = 3,
    threshold: float = 0.5,
) -> "ray.data.Dataset":
    """Exact word-n-gram Jaccard for given candidate pairs (verification
    kernel — text broadcast, similarity computed map-side)."""
    import ray as _ray

    texts = dict(zip(ds.to_pandas()["doc_id"], ds.to_pandas()["text"]))
    ref = _ray.put(texts)

    def verify(batch: pa.Table) -> pa.Table:
        m = _ray.get(ref)

        def grams(t: str) -> set:
            toks = _WORD.findall((t or "").lower())
            return {tuple(toks[i: i + n]) for i in range(max(1, len(toks) - n + 1))}

        jac = []
        for a, b in zip(batch.column("id_a").to_pylist(), batch.column("id_b").to_pylist()):
            ga, gb = grams(m.get(a, "")), grams(m.get(b, ""))
            jac.append(len(ga & gb) / max(len(ga | gb), 1))
        out = batch.append_column("ngram_jaccard", pa.array(np.asarray(jac, np.float32)))
        return out.filter(pc.greater_equal(out.column("ngram_jaccard"), threshold))

    return pairs_ds.map_batches(verify, batch_format="pyarrow")
