"""Deduplication operators for training-data pipelines.

- exact_dedup: content-hash → bucketed keep-min-id (one shuffle, vectorized
  per-bucket — no per-group python calls).
- minhash_lsh_pairs / minhash_dedup: shingle → minhash → banded LSH buckets
  → in-bucket signature-Jaccard verify → pair dedup (the standard
  MinHash-LSH near-dup pipeline; Broder '97).
- simhash_pairs: 64-bit SimHash (Charikar '02) with pigeonhole segment
  bucketing (n_tables > max_hamming guaranteed) and in-bucket Hamming verify.
- ngram_jaccard_pairs: exact n-gram Jaccard verification kernel — texts
  reach the kernel via two hash joins, never a driver broadcast.

Scale invariant for this module: NO stage materializes an unbounded dataset
on the driver (no full-dataset pandas pulls on inputs) — signatures are
carried through the band explode and verified inside the bucket group, so
the only driver-visible data are the final thresholded pairs. Verified by
tests/test_ops.py::test_dedup_module_has_no_driver_materialization.

Group fan-in uses the bucketed-groupby pattern (see
dedupe_ray/blocking.py N_BUCKETS): rows are grouped by crc32(key) % 1024
and each bucket is processed vectorized, instead of one python call per
(band, hash) group.
"""

from __future__ import annotations

import re
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from dedupe_ray.blocking import N_BUCKETS
from dedupe_ray.clustering import connected_components

_WORD = re.compile(r"[\w']+", re.U)

# 64-bit multiply-shift hash family (deterministic seeds)
_MERSENNE = (1 << 61) - 1

# byte-wise popcount table for vectorized Hamming distance
_POPCNT = np.array([bin(i).count("1") for i in range(256)], np.uint8)


def _hash_family(n: int, seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=n, dtype=np.int64).astype(np.uint64)
    b = rng.randint(0, _MERSENNE, size=n, dtype=np.int64).astype(np.uint64)
    return a, b


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized popcount of a uint64 array via the byte table."""
    return _POPCNT[x.view(np.uint8).reshape(len(x), 8)].sum(axis=1).astype(np.int32)


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------


def add_content_hash(batch: pa.Table, column: str = "text", out: str = "content_hash") -> pa.Table:
    """Vectorized 64-bit content hash of a string column (keyed on the exact
    bytes; whitespace-sensitive — exact dedup semantics). Fixed-key siphash
    via pandas (C per-string, cross-process deterministic); collisions are
    handled downstream by comparing the actual values."""
    import pandas as pd

    vals = pc.fill_null(batch.column(column), "").to_numpy(zero_copy_only=False)
    h = pd.util.hash_array(vals)
    return batch.append_column(out, pa.array(h, pa.uint64()))


def exact_dedup(
    ds: "ray.data.Dataset", column: str = "text", id_column: str = "doc_id"
) -> "ray.data.Dataset":
    """Keep the min-id row per distinct value — one bucketed shuffle.

    Rows are bucketed by crc32 of the content hash (N_BUCKETS groups total,
    not one python call per distinct value — at corpus scale nearly every
    value is unique, so per-group overhead would dominate). Within a bucket
    the keep-first is a vectorized sort + run-boundary filter on the actual
    VALUE column (hash collisions cannot merge distinct values)."""
    def _bucketize(b: pa.Table) -> pa.Table:
        b = add_content_hash(b, column)
        h = b.column("content_hash").to_numpy(zero_copy_only=False)
        return b.append_column(
            "hbucket", pa.array((h % np.uint64(N_BUCKETS)).astype(np.int32))
        )

    hashed = ds.map_batches(_bucketize, batch_format="pyarrow")

    def _keep_min_id(group: pa.Table) -> pa.Table:
        if len(group) == 0:
            return group.drop_columns(["content_hash", "hbucket"])
        order = pc.sort_indices(
            group,
            sort_keys=[("content_hash", "ascending"), (column, "ascending"), (id_column, "ascending")],
        )
        g = group.take(order)
        h = g.column("content_hash").to_numpy(zero_copy_only=False)
        keep = np.empty(len(g), bool)
        keep[0] = True
        keep[1:] = h[1:] != h[:-1]
        # hash collisions: where adjacent hashes tie, fall back to comparing
        # the actual values (python-level, but only at collision positions)
        ties = np.nonzero(~keep[1:])[0] + 1
        if len(ties):
            vcol = g.column(column)
            for i in ties:
                keep[i] = vcol[int(i)].as_py() != vcol[int(i) - 1].as_py()
        return g.filter(pa.array(keep)).drop_columns(["content_hash", "hbucket"])

    return hashed.groupby("hbucket").map_groups(_keep_min_id, batch_format="pyarrow")


def dedup_keep_best(
    ds: "ray.data.Dataset",
    key_column: str,
    quality_column: str,
    id_column: str,
) -> "ray.data.Dataset":
    """Canonical-pick dedup: keep the single highest-``quality_column`` row
    per distinct ``key_column`` value (ties broken by min ``id_column``) —
    the training-data variant of exact dedup where duplicate groups keep
    their BEST copy (longest / highest-scoring) instead of an arbitrary
    first.

    Same bucketed shape as :func:`exact_dedup`: rows shuffle once by a
    crc32 bucket of the key hash (N_BUCKETS groups — per-group python
    overhead never scales with distinct-key count), and the within-bucket
    argmax is a vectorized sort + run-boundary filter on (key hash, key,
    quality desc, id). Hash collisions cannot merge distinct keys: the
    actual key value is a sort key, and run boundaries compare values at
    colliding positions."""

    def _bucketize(b: pa.Table) -> pa.Table:
        b = add_content_hash(b, key_column, out="__key_hash")
        h = b.column("__key_hash").to_numpy(zero_copy_only=False)
        return b.append_column(
            "__kbucket", pa.array((h % np.uint64(N_BUCKETS)).astype(np.int32))
        )

    hashed = ds.map_batches(_bucketize, batch_format="pyarrow")

    def _keep_best(group: pa.Table) -> pa.Table:
        if len(group) == 0:
            return group.drop_columns(["__key_hash", "__kbucket"])
        order = pc.sort_indices(
            group,
            sort_keys=[
                ("__key_hash", "ascending"),
                (key_column, "ascending"),
                (quality_column, "descending"),
                (id_column, "ascending"),
            ],
        )
        g = group.take(order)
        h = g.column("__key_hash").to_numpy(zero_copy_only=False)
        keep = np.empty(len(g), bool)
        keep[0] = True
        keep[1:] = h[1:] != h[:-1]
        ties = np.nonzero(~keep[1:])[0] + 1
        if len(ties):
            vcol = g.column(key_column)
            for i in ties:
                keep[i] = vcol[int(i)].as_py() != vcol[int(i) - 1].as_py()
        return g.filter(pa.array(keep)).drop_columns(["__key_hash", "__kbucket"])

    return hashed.groupby("__kbucket").map_groups(_keep_best, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


class MinHasher:
    """Actor-pool stage: text → num_perm minhash signature (uint64 fixed-size
    list) — hash family built once per actor; the whole batch is hashed as
    one vectorized (perm × shingle) pass with segment-min via reduceat."""

    def __init__(self, num_perm: int = 64, shingle_k: int = 3, seed: int = 42):
        self.a, self.b = _hash_family(num_perm, seed)
        self.k = shingle_k
        self.num_perm = num_perm

    def _shingle_hashes(self, texts: list) -> tuple[np.ndarray, np.ndarray]:
        """All shingle hashes for a batch + per-doc start offsets.

        Base hash = crc32 of the joined shingle (C speed; 32-bit base is the
        standard choice — datasketch-style — collisions only perturb the
        Jaccard estimate by ~2^-32 per shingle)."""
        hashes: list[int] = []
        offsets = np.empty(len(texts) + 1, np.int64)
        offsets[0] = 0
        k = self.k
        for i, t in enumerate(texts):
            toks = _WORD.findall((t or "").lower())
            if len(toks) < k:
                toks = toks + [""] * (k - len(toks))
            for j in range(len(toks) - k + 1):
                hashes.append(zlib.crc32(" ".join(toks[j: j + k]).encode()))
            offsets[i + 1] = len(hashes)
        return np.asarray(hashes, np.uint64), offsets

    def signatures(self, texts: list) -> np.ndarray:
        n = len(texts)
        if n == 0:
            return np.zeros((0, self.num_perm), np.uint64)
        sh, offsets = self._shingle_hashes(texts)
        # (a*x + b) mod p over every (perm, shingle), then per-doc min via
        # reduceat on the shingle axis — no python loop over docs.
        prod = (sh[None, :] * self.a[:, None] + self.b[:, None]) % np.uint64(_MERSENNE)
        mins = np.minimum.reduceat(prod, offsets[:-1], axis=1)  # [perm, doc]
        return np.ascontiguousarray(mins.T)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        sigs = self.signatures(texts)
        col = pa.FixedSizeListArray.from_arrays(
            pa.array(sigs.reshape(-1), pa.uint64()), self.num_perm
        )
        return pa.table({"doc_id": batch.column("doc_id"), "minhash": col})


def _one_chunk(col) -> pa.Array:
    """Table column (ChunkedArray) → single contiguous Array."""
    if isinstance(col, pa.ChunkedArray):
        if col.num_chunks == 0:
            return pa.array([], col.type)
        if col.num_chunks == 1:
            return col.chunk(0)
        c = col.combine_chunks()
        return c.chunk(0) if isinstance(c, pa.ChunkedArray) else c
    return col


def _sig_matrix(group: pa.Table, col: str, width: int) -> np.ndarray:
    arr = _one_chunk(group.column(col))
    return arr.flatten().to_numpy(zero_copy_only=False).reshape(len(group), width)


def minhash_lsh_pairs(
    ds: "ray.data.Dataset",
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    jaccard_threshold: float = 0.7,
    concurrency=(1, 8),
    max_bucket: int = 2000,
    return_oversized: bool = False,
    broadcast_limit: int = 2_000_000,
):
    """Near-duplicate pairs via banded MinHash-LSH, verified by
    signature-estimated Jaccard.

    Stages: MinHasher actor pool → materialized signature table →
    LIGHT band explode (band, bhash, bucket, doc_id — ~28 B/row, no
    signature carry; round-2 tiled the full num_perm×8 B signature through
    every band row, ~16× the shuffle bytes) → bucketed groupby → candidate
    pair emission (triangular expansion) → pair dedup (shuffle #2) →
    signatures joined back through the size-guarded assembler (broadcast
    ≤ limit, hash join above) → one vectorized agreement pass over all
    pairs. Returns (id_a, id_b, jaccard); with ``return_oversized`` also a
    Dataset of (band, n_members) rows for every size-capped bucket (no
    silent recall loss)."""
    import pandas as pd

    from dedupe_ray.scoring import assemble_pairs

    rows_per_band = num_perm // bands
    sigs = ds.map_batches(
        MinHasher,
        fn_constructor_args=(num_perm, shingle_k),
        batch_format="pyarrow",
        concurrency=concurrency,
        batch_size=2048,  # bounds the perm × shingle hash matrix per call
    ).materialize()  # consumed twice: band explode + verify join-back

    def explode_bands(batch: pa.Table) -> pa.Table:
        n = len(batch)
        sig = _sig_matrix(batch, "minhash", num_perm)
        band_keys = np.empty((bands, n), np.uint64)
        for b in range(bands):
            seg = sig[:, b * rows_per_band: (b + 1) * rows_per_band]
            key = seg[:, 0].copy()
            for c in range(1, rows_per_band):
                key = key * np.uint64(1099511628211) ^ seg[:, c]
            band_keys[b] = key
        band_col = np.repeat(np.arange(bands, dtype=np.int32), n)
        bhash = band_keys.reshape(-1)
        bucket = ((bhash ^ (np.uint64(0x9E3779B97F4A7C15) * band_col.astype(np.uint64))) % np.uint64(N_BUCKETS)).astype(np.int32)
        id_arr = _one_chunk(batch.column("doc_id"))
        ids = pa.concat_arrays([id_arr] * bands)
        return pa.table(
            {
                "band": pa.array(band_col),
                "bhash": pa.array(bhash, pa.uint64()),
                "bucket": pa.array(bucket),
                "doc_id": ids,
            }
        )

    exploded = sigs.map_batches(explode_bands, batch_format="pyarrow")

    def emit_bucket(group: pa.Table) -> pa.Table:
        """Runs of equal (band, bhash) → all C(n,2) candidate pairs,
        vectorized triangular expansion; oversized runs emit markers."""
        empty = pa.table(
            {
                "id_a": pa.array([], pa.string()),
                "id_b": pa.array([], pa.string()),
                "pbucket": pa.array([], pa.int32()),
                "oversized": pa.array([], pa.int8()),
                "over_band": pa.array([], pa.int32()),
                "n_members": pa.array([], pa.int32()),
            }
        )
        if not len(group):
            return empty
        order = pc.sort_indices(
            group,
            sort_keys=[("band", "ascending"), ("bhash", "ascending"), ("doc_id", "ascending")],
        )
        g = group.take(order)
        band = g.column("band").to_numpy(zero_copy_only=False)
        bhash = g.column("bhash").to_numpy(zero_copy_only=False)
        ids = _one_chunk(g.column("doc_id"))
        n = len(g)
        change = (band[1:] != band[:-1]) | (bhash[1:] != bhash[:-1]) if n > 1 else np.zeros(0, bool)
        run_starts = np.nonzero(np.concatenate(([True], change)))[0]
        run_lengths = np.diff(np.append(run_starts, n))
        m_per_elem = np.repeat(run_lengths, run_lengths)
        pos_in_run = np.arange(n) - np.repeat(run_starts, run_lengths)
        ok = m_per_elem <= max_bucket
        counts = np.where(ok, m_per_elem - 1 - pos_in_run, 0)
        total = int(counts.sum())
        over_runs = run_lengths > max_bucket
        n_over = int(over_runs.sum())
        if total == 0 and n_over == 0:
            return empty
        a_idx = np.repeat(np.arange(n), counts)
        cum = np.concatenate(([0], np.cumsum(counts)))[:-1]
        off = np.arange(total, dtype=np.int64) - np.repeat(cum, counts)
        out_a = pc.take(ids, pa.array(a_idx))
        out_b = pc.take(ids, pa.array(a_idx + 1 + off))
        ha = pd.util.hash_array(out_a.to_numpy(zero_copy_only=False))
        hb = pd.util.hash_array(out_b.to_numpy(zero_copy_only=False))
        pbucket = ((ha * np.uint64(31) + hb) % np.uint64(N_BUCKETS)).astype(np.int32)
        over_band = band[run_starts[over_runs]].astype(np.int32)
        over_n = run_lengths[over_runs].astype(np.int32)
        if n_over:
            out_a = pa.concat_arrays([out_a, pa.array([""] * n_over, pa.string())])
            out_b = pa.concat_arrays([out_b, pa.array([""] * n_over, pa.string())])
            pbucket = np.concatenate([pbucket, np.zeros(n_over, np.int32)])
        return pa.table(
            {
                "id_a": out_a,
                "id_b": out_b,
                "pbucket": pa.array(pbucket),
                "oversized": pa.array(
                    np.concatenate([np.zeros(total, np.int8), np.ones(n_over, np.int8)])
                ),
                "over_band": pa.array(np.concatenate([np.full(total, -1, np.int32), over_band])),
                "n_members": pa.array(np.concatenate([np.zeros(total, np.int32), over_n])),
            }
        )

    raw = exploded.groupby("bucket").map_groups(emit_bucket, batch_format="pyarrow")
    oversized = raw.filter(expr="oversized == 1").select_columns(["over_band", "n_members"])

    def dedup_bucket(group: pa.Table) -> pa.Table:
        t = group.select(["id_a", "id_b"]).sort_by(
            [("id_a", "ascending"), ("id_b", "ascending")]
        )
        if len(t) < 2:
            return t
        a = _one_chunk(t.column("id_a"))
        b = _one_chunk(t.column("id_b"))
        neq = pc.not_equal(a.slice(1), a.slice(0, len(a) - 1)).to_numpy(zero_copy_only=False) | \
            pc.not_equal(b.slice(1), b.slice(0, len(b) - 1)).to_numpy(zero_copy_only=False)
        keep = np.concatenate(([True], neq))
        return t if keep.all() else t.take(pa.array(np.nonzero(keep)[0]))

    pairs = (
        raw.filter(expr="oversized == 0")
        .groupby("pbucket")
        .map_groups(dedup_bucket, batch_format="pyarrow")
    )

    # signature join-back + ONE vectorized agreement pass over all pairs
    assembled = assemble_pairs(
        pairs,
        sigs.select_columns(["doc_id", "minhash"]),
        ["minhash"],
        broadcast_limit=broadcast_limit,
        strict=False,
    )

    def verify(batch: pa.Table) -> pa.Table:
        if not len(batch):
            return pa.table(
                {
                    "id_a": pa.array([], pa.string()),
                    "id_b": pa.array([], pa.string()),
                    "jaccard": pa.array([], pa.float32()),
                }
            )
        sa = _sig_matrix(batch, "a_minhash", num_perm)
        sb = _sig_matrix(batch, "b_minhash", num_perm)
        jac = (sa == sb).mean(axis=1).astype(np.float32)
        keep = jac >= jaccard_threshold
        out = pa.table(
            {
                "id_a": batch.column("id_a"),
                "id_b": batch.column("id_b"),
                "jaccard": pa.array(jac),
            }
        )
        return out.filter(pa.array(keep))

    pairs = assembled.map_batches(verify, batch_format="pyarrow")
    if return_oversized:
        return pairs, oversized
    return pairs


def minhash_dedup(
    ds: "ray.data.Dataset",
    jaccard_threshold: float = 0.7,
    **kwargs,
) -> "ray.data.Dataset":
    """Near-dup groups: LSH pairs → connected components →
    (doc_id, component_id) membership for docs in any near-dup group."""
    pairs = minhash_lsh_pairs(ds, jaccard_threshold=jaccard_threshold, **kwargs)
    return connected_components(pairs)


def minhash_lsh_join(
    queries_ds: "ray.data.Dataset",
    corpus_ds: "ray.data.Dataset",
    jaccard_threshold: float = 0.7,
    **kwargs,
) -> "ray.data.Dataset":
    """Near-duplicate JOIN across two corpora → (query_id, corpus_id,
    jaccard) — the third rung of the cross-corpus decontamination ladder
    (exact content hash: :func:`bloom_anti_join`; exact benchmark n-grams:
    ``ops.text.decontaminate``; NEAR-dup: this). A training shard streams
    through as the query side; any row whose shingle-set MinHash estimate
    against a benchmark/reference doc clears the threshold is a leak
    candidate.

    Reuses the banded self-join pipeline verbatim over the side-prefixed
    union (``q:``/``c:`` first bytes keep ids unique and encode the side);
    pairs are filtered to cross-side after the cheap vectorized signature
    verify and the prefixes stripped. In-side candidate pairs do ride the
    candidate shuffle — if the corpus side carries heavy internal
    duplication, dedup it first (its own pairs, not the join's, dominate
    the bucket work then). Both inputs need string ``doc_id`` + ``text``;
    ids may repeat ACROSS sides but must be unique within each."""

    def tag(prefix: str):
        def f(b: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "doc_id": pc.binary_join_element_wise(
                        pa.scalar(prefix),
                        pc.cast(b.column("doc_id"), pa.string()),
                        pa.scalar(""),
                    ),
                    "text": b.column("text"),
                }
            )

        return f

    union = queries_ds.map_batches(tag("q:"), batch_format="pyarrow").union(
        corpus_ds.map_batches(tag("c:"), batch_format="pyarrow")
    )
    pairs = minhash_lsh_pairs(union, jaccard_threshold=jaccard_threshold, **kwargs)

    def split(b: pa.Table) -> pa.Table:
        # pair order is lexicographic on the prefixed ids: "c:" < "q:", so
        # a cross-side pair always has the corpus doc in id_a
        cross = pc.and_(
            pc.starts_with(b.column("id_a"), pattern="c:"),
            pc.starts_with(b.column("id_b"), pattern="q:"),
        )
        t = b.filter(cross)
        return pa.table(
            {
                "query_id": pc.utf8_slice_codeunits(t.column("id_b"), 2),
                "corpus_id": pc.utf8_slice_codeunits(t.column("id_a"), 2),
                "jaccard": t.column("jaccard"),
            }
        )

    return pairs.map_batches(split, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


class SimHasher:
    """64-bit SimHash over word features; actor-pool stage → (doc_id, simhash).

    The whole batch is hashed in one vectorized pass: all tokens → 64-bit
    crc-composed hashes, ±1 bit matrix, per-doc reduceat sum, sign-pack."""

    _SHIFTS = np.arange(64, dtype=np.uint64)

    def __init__(self, seed: int = 42):
        self.seed = seed  # kept for signature stability across actors

    @staticmethod
    def _token_hashes(texts: list) -> tuple[np.ndarray, np.ndarray]:
        hashes: list[int] = []
        offsets = np.empty(len(texts) + 1, np.int64)
        offsets[0] = 0
        for i, t in enumerate(texts):
            for tok in _WORD.findall((t or "").lower()):
                e = tok.encode()
                hashes.append((zlib.crc32(b"\x01" + e) << 32) | zlib.crc32(b"\x02" + e))
            offsets[i + 1] = len(hashes)
        return np.asarray(hashes, np.uint64), offsets

    def simhashes(self, texts: list) -> np.ndarray:
        n = len(texts)
        if n == 0:
            return np.zeros(0, np.uint64)
        h, offsets = self._token_hashes(texts)
        if len(h) == 0:
            return np.zeros(n, np.uint64)
        bits = (((h[:, None] >> self._SHIFTS) & np.uint64(1)).astype(np.int32) * 2 - 1)
        # guard empty docs: reduceat needs distinct offsets; fix up after
        starts = np.minimum(offsets[:-1], len(h) - 1)
        acc = np.add.reduceat(bits, starts, axis=0)
        empty = offsets[:-1] == offsets[1:]
        acc[empty] = 0
        packed = ((acc > 0).astype(np.uint64) << self._SHIFTS[None, :]).sum(axis=1, dtype=np.uint64)
        packed[empty] = 0
        return packed

    def __call__(self, batch: pa.Table) -> pa.Table:
        vals = self.simhashes(batch.column("text").to_pylist())
        return pa.table({"doc_id": batch.column("doc_id"), "simhash": pa.array(vals, pa.uint64())})


def simhash_pairs(
    ds: "ray.data.Dataset",
    max_hamming: int = 3,
    n_tables: int | None = None,
    concurrency=(1, 8),
    max_bucket: int = 2000,
    return_oversized: bool = False,
    hash_column: str | None = None,
):
    """Near-dup pairs by SimHash with the pigeonhole guarantee enforced.

    The 64-bit hash is split into ``n_tables`` contiguous segments; any pair
    with Hamming distance ≤ n_tables - 1 agrees exactly on ≥ 1 segment, so
    candidate recall to ``max_hamming`` requires n_tables ≥ max_hamming + 1
    — computed automatically when not given, rejected when violated.
    Hamming is verified in-bucket from the carried simhash (no driver
    signature table).

    With ``hash_column`` set, the text SimHasher is skipped and that
    PRECOMPUTED 64-bit column (any uint64-castable type) feeds the same
    banding/verify machinery — e.g. perceptual image hashes
    (`ops/multimodal.py dhash64`)."""
    if n_tables is None:
        n_tables = max_hamming + 1
    if n_tables <= max_hamming:
        raise ValueError(
            f"n_tables={n_tables} cannot guarantee recall to Hamming {max_hamming}: "
            f"need n_tables >= max_hamming + 1 (pigeonhole)"
        )
    if hash_column is None:
        sigs = ds.map_batches(
            SimHasher, batch_format="pyarrow", concurrency=concurrency
        )
    else:
        _hc = hash_column

        def precomputed(b: pa.Table) -> pa.Table:
            h = b.column(_hc).to_numpy(zero_copy_only=False).astype(np.uint64)
            return pa.table(
                {
                    "doc_id": b.column("doc_id"),
                    "simhash": pa.array(h, pa.uint64()),
                }
            )

        sigs = ds.map_batches(precomputed, batch_format="pyarrow")

    # segment bit layout: as even as possible, e.g. 64/7 → [10,9,9,9,9,9,9]
    base = 64 // n_tables
    sizes = [base + (1 if i < 64 % n_tables else 0) for i in range(n_tables)]
    starts = np.cumsum([0] + sizes[:-1])

    def explode(batch: pa.Table) -> pa.Table:
        n = len(batch)
        h = batch.column("simhash").to_numpy(zero_copy_only=False).astype(np.uint64)
        seg_all = np.empty((n_tables, n), np.uint64)
        for t in range(n_tables):
            seg_all[t] = (h >> np.uint64(starts[t])) & np.uint64((1 << sizes[t]) - 1)
        tbl = np.repeat(np.arange(n_tables, dtype=np.int32), n)
        seg = seg_all.reshape(-1)
        bucket = ((seg ^ (np.uint64(0x9E3779B97F4A7C15) * tbl.astype(np.uint64))) % np.uint64(N_BUCKETS)).astype(np.int32)
        ids = pa.concat_arrays([_one_chunk(batch.column("doc_id"))] * n_tables)
        return pa.table(
            {
                "tbl": pa.array(tbl),
                "seg": pa.array(seg, pa.uint64()),
                "bucket": pa.array(bucket),
                "doc_id": ids,
                "simhash": pa.array(np.tile(h, n_tables), pa.uint64()),
            }
        )

    exploded = sigs.map_batches(explode, batch_format="pyarrow")

    def verify_bucket(group: pa.Table) -> pa.Table:
        out_a: list[str] = []
        out_b: list[str] = []
        out_h: list[np.ndarray] = []
        n_over: list[tuple[int, int]] = []
        if len(group):
            order = pc.sort_indices(
                group, sort_keys=[("tbl", "ascending"), ("seg", "ascending"), ("doc_id", "ascending")]
            )
            g = group.take(order)
            tbl = g.column("tbl").to_numpy(zero_copy_only=False)
            seg = g.column("seg").to_numpy(zero_copy_only=False)
            ids = np.asarray(g.column("doc_id").to_pylist(), object)
            sh = g.column("simhash").to_numpy(zero_copy_only=False).astype(np.uint64)
            change = (tbl[1:] != tbl[:-1]) | (seg[1:] != seg[:-1])
            bounds = np.nonzero(np.concatenate(([True], change, [True])))[0]
            for s, e in zip(bounds[:-1], bounds[1:]):
                n = e - s
                if n < 2:
                    continue
                if n > max_bucket:
                    n_over.append((int(tbl[s]), n))
                    continue
                iu, ju = np.triu_indices(n, k=1)
                ham = _popcount64(sh[s + iu] ^ sh[s + ju])
                keep = ham <= max_hamming
                if keep.any():
                    out_a.extend(ids[s + iu[keep]].tolist())
                    out_b.extend(ids[s + ju[keep]].tolist())
                    out_h.append(ham[keep])
        import pandas as pd

        ham_all = np.concatenate(out_h) if out_h else np.zeros(0, np.int32)
        if out_a:
            ha = pd.util.hash_array(np.asarray(out_a, object))
            hb = pd.util.hash_array(np.asarray(out_b, object))
            pbucket = ((ha * np.uint64(31) + hb) % np.uint64(N_BUCKETS)).astype(np.int32)
        else:
            pbucket = np.zeros(0, np.int32)
        n_pairs = len(out_a)
        return pa.table(
            {
                "id_a": pa.array(out_a + [""] * len(n_over), pa.string()),
                "id_b": pa.array(out_b + [""] * len(n_over), pa.string()),
                "hamming": pa.array(np.concatenate([ham_all, np.zeros(len(n_over), np.int32)])),
                "pbucket": pa.array(np.concatenate([pbucket, np.zeros(len(n_over), np.int32)])),
                "oversized": pa.array(
                    np.concatenate([np.zeros(n_pairs, np.int8), np.ones(len(n_over), np.int8)])
                ),
                "over_tbl": pa.array([-1] * n_pairs + [t for t, _ in n_over], pa.int32()),
                "n_members": pa.array([0] * n_pairs + [n for _, n in n_over], pa.int32()),
            }
        )

    raw = exploded.groupby("bucket").map_groups(verify_bucket, batch_format="pyarrow")
    oversized = raw.filter(expr="oversized == 1").select_columns(["over_tbl", "n_members"])

    def dedup_bucket(group: pa.Table) -> pa.Table:
        t = group.select(["id_a", "id_b", "hamming"]).sort_by(
            [("id_a", "ascending"), ("id_b", "ascending")]
        )
        if len(t) < 2:
            return t
        a = _one_chunk(t.column("id_a"))
        b = _one_chunk(t.column("id_b"))
        neq = pc.not_equal(a.slice(1), a.slice(0, len(a) - 1)).to_numpy(zero_copy_only=False) | \
            pc.not_equal(b.slice(1), b.slice(0, len(b) - 1)).to_numpy(zero_copy_only=False)
        keep = np.concatenate(([True], neq))
        return t if keep.all() else t.take(pa.array(np.nonzero(keep)[0]))

    pairs = (
        raw.filter(expr="oversized == 0")
        .groupby("pbucket")
        .map_groups(dedup_bucket, batch_format="pyarrow")
    )
    if return_oversized:
        return pairs, oversized
    return pairs


# ---------------------------------------------------------------------------
# n-gram Jaccard verification
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(
    ds: "ray.data.Dataset",
    pairs_ds: "ray.data.Dataset",
    n: int = 3,
    threshold: float = 0.5,
    broadcast_limit: int = 2_000_000,
    token_pattern: str | None = None,
) -> "ray.data.Dataset":
    """Exact word-n-gram Jaccard for given candidate pairs.

    Texts reach the kernel via the size-guarded pair assembler
    (dedupe_ray/scoring.py): broadcast searchsorted lookup when the corpus
    fits the limit, two hash joins above it — never an unguarded driver
    corpus pull. Pairs whose ids are absent from ``ds`` are dropped
    (inner-join semantics)."""
    from dedupe_ray.scoring import assemble_pairs

    joined = assemble_pairs(
        pairs_ds,
        ds.select_columns(["doc_id", "text"]),
        ["text"],
        broadcast_limit=broadcast_limit,
        strict=False,
    )

    word_re = re.compile(token_pattern) if token_pattern else _WORD

    def verify(batch: pa.Table) -> pa.Table:
        def grams(t: str) -> set:
            toks = word_re.findall((t or "").lower())
            if not toks:
                # Empty/non-tokenizable text has no n-grams; SQL's 0/0 = NULL
                # drops such pairs, so Jaccard must be 0 here, not 1.
                return set()
            return {tuple(toks[i: i + n]) for i in range(max(1, len(toks) - n + 1))}

        jac = []
        for a, b in zip(batch.column("a_text").to_pylist(), batch.column("b_text").to_pylist()):
            ga, gb = grams(a), grams(b)
            jac.append(len(ga & gb) / len(ga | gb) if (ga and gb) else 0.0)
        out = batch.append_column("ngram_jaccard", pa.array(np.asarray(jac, np.float64)))
        out = out.filter(pc.greater_equal(out.column("ngram_jaccard"), threshold))
        return out.select([c for c in out.column_names if c not in ("a_text", "b_text")])

    return joined.map_batches(verify, batch_format="pyarrow")


def dup_ngram_docs(
    ds: "ray.data.Dataset",
    n: int = 8,
    column: str = "text",
    id_column: str = "doc_id",
) -> "ray.data.Dataset":
    """Exact duplicated-n-gram detection: for every document, count its
    DISTINCT space-delimited ``n``-grams that also occur in at least one
    OTHER document — the per-doc signal behind suffix-array exact-substring
    dedup (Lee et al. 2022, "Deduplicating Training Data Makes Language
    Models Better", the n-gram-granular formulation).

    Shape: map_batches emits per-doc distinct gram hashes (already deduped
    inside the batch kernel, so a gram repeated within one doc costs one
    row), bucketed by gram hash → ONE groupby over N_BUCKETS gram buckets
    finds cross-doc runs and pre-aggregates (doc, count) partials inside
    the bucket → one tiny groupby over doc ids sums the partials. Shuffle
    rows are (id, uint64, int32) — no text ever moves.

    Returns (id_column, dup_ngrams) for docs with ≥1 shared gram.
    """
    import pandas as pd

    from ray.data.aggregate import Sum

    from dedupe_ray.ops.text import _space_gram_hashes

    def grams_partial(batch: pa.Table) -> pa.Table:
        rid, gh = _space_gram_hashes(batch.column(column), n)
        ids = _one_chunk(batch.column(id_column))
        return pa.table(
            {
                id_column: pc.take(ids, pa.array(rid)),
                "ghash": pa.array(gh, pa.uint64()),
                "gbucket": pa.array((gh % np.uint64(N_BUCKETS)).astype(np.int32)),
            }
        )

    exploded = ds.map_batches(grams_partial, batch_format="pyarrow")

    def dup_partial(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                id_column: pa.array([], group.column(id_column).type),
                "cnt": pa.array([], pa.int64()),
            }
        )
        if not len(group):
            return empty
        t = group.sort_by([("ghash", "ascending")])
        gh = t.column("ghash").to_numpy(zero_copy_only=False)
        change = gh[1:] != gh[:-1]
        run_starts = np.nonzero(np.concatenate(([True], change)))[0]
        run_lengths = np.diff(np.append(run_starts, len(gh)))
        # per-doc-distinct upstream ⇒ run length == number of docs holding
        # the gram; runs of length ≥2 are the duplicated grams
        dup_members = np.repeat(run_lengths >= 2, run_lengths)
        if not dup_members.any():
            return empty
        ids = _one_chunk(t.column(id_column)).take(
            pa.array(np.nonzero(dup_members)[0])
        )
        codes, uniques = pd.factorize(ids.to_numpy(zero_copy_only=False))
        cnt = np.bincount(codes, minlength=len(uniques)).astype(np.int64)
        return pa.table(
            {
                id_column: pa.array(uniques, group.column(id_column).type),
                "cnt": pa.array(cnt),
            }
        )

    return (
        exploded.groupby("gbucket")
        .map_groups(dup_partial, batch_format="pyarrow")
        .groupby(id_column)
        .aggregate(Sum("cnt", alias_name="dup_ngrams"))
    )


def _emit_scrubbed(
    batch: pa.Table,
    flat: "pa.Array",
    offsets: np.ndarray,
    covered: np.ndarray,
    id_column: str,
) -> pa.Table:
    """Shared scrub tail: covered-token mask → (id, text_clean, n_removed)
    via one Arrow take + binary_join."""
    nrows = len(batch)
    counts = np.diff(offsets)
    keep = ~covered
    row_of_flat = np.repeat(np.arange(nrows, dtype=np.int64), counts)
    kept_per_row = np.bincount(row_of_flat[keep], minlength=nrows)
    new_offsets = np.concatenate(([0], np.cumsum(kept_per_row)))
    kept_tokens = flat.take(pa.array(np.flatnonzero(keep)))
    lists = pa.ListArray.from_arrays(pa.array(new_offsets, pa.int32()), kept_tokens)
    ids = _one_chunk(batch.column(id_column))
    return pa.table(
        {
            id_column: ids,
            "text_clean": pc.binary_join(lists, " "),
            "n_removed": pa.array(counts - kept_per_row, pa.int64()),
        }
    )


def scrub_repeated_ngrams(
    ds: "ray.data.Dataset",
    n: int = 5,
    min_count: int = 2,
    column: str = "text",
    id_column: str = "doc_id",
    hot_limit: int = 50_000_000,
    strategy: str = "auto",
) -> "ray.data.Dataset":
    """Exact repeated-substring REMOVAL (the scrub half of Lee et al.
    2022's suffix-array dedup, n-gram-granular): every token covered by a
    space-delimited ``n``-gram occurring ≥ ``min_count`` times in the
    corpus is dropped, and each document's survivors are re-joined with
    single spaces.

    Shape: pass 1 counts gram-hash instances — per-batch partials
    (factorize + bincount) bucketed by hash → per-bucket run-sum keeps
    only hashes at ≥ ``min_count``. With ``strategy='broadcast'`` (auto
    below ``hot_limit``) the HOT set ships once via ``ray.put`` and
    pass 2 is shuffle-free: vectorized interval cover over the flat
    token array (delta + cumsum), one Arrow take + binary_join to
    reassemble. ``strategy='join'`` is the 100-TB path: gram-instance
    rows join the hot table in a bucketed token-hash groupby, covered
    starts aggregate per doc (ordered string_agg), and a bucketed id
    join brings them back — gram hashes shuffle, text never does, and
    nothing vocabulary-sized ever reaches one process. Both paths emit
    identical rows. Gram identity is 64-bit hashed — collisions are
    negligible at any realistic corpus size.

    Returns (id_column, text_clean, n_removed) for every document."""
    import ray

    from dedupe_ray.ops.text import _space_gram_all

    def count_partial(batch: pa.Table) -> pa.Table:
        _, _, gh, _, _ = _space_gram_all(batch.column(column), n)
        uh, cnt = np.unique(gh, return_counts=True)
        return pa.table(
            {
                "ghash": pa.array(uh, pa.uint64()),
                "cnt": pa.array(cnt.astype(np.int64)),
                "gbucket": pa.array((uh % np.uint64(N_BUCKETS)).astype(np.int32)),
            }
        )

    def hot_in_bucket(group: pa.Table) -> pa.Table:
        if not len(group):
            return pa.table({"ghash": pa.array([], pa.uint64())})
        t = group.sort_by([("ghash", "ascending")])
        gh = t.column("ghash").to_numpy(zero_copy_only=False)
        cnt = t.column("cnt").to_numpy(zero_copy_only=False)
        heads = np.flatnonzero(np.r_[True, gh[1:] != gh[:-1]])
        totals = np.add.reduceat(cnt, heads)
        return pa.table({"ghash": pa.array(gh[heads][totals >= min_count], pa.uint64())})

    hot_ds = (
        ds.map_batches(count_partial, batch_format="pyarrow")
        .groupby("gbucket")
        .map_groups(hot_in_bucket, batch_format="pyarrow")
        .materialize()  # hot-gram-sized; consumed once per path
    )
    n_hot = hot_ds.count()
    if strategy == "auto":
        strategy = "broadcast" if n_hot <= hot_limit else "join"
    if strategy == "join":
        return _scrub_join(ds, hot_ds, n, column, id_column)
    if n_hot > hot_limit:
        raise ValueError(
            f"hot gram set ({n_hot}) exceeds broadcast limit "
            f"{hot_limit}; pass strategy='join'"
        )
    hot_df = hot_ds.to_pandas()  # bounded: guarded above
    hot_ref = ray.put(np.sort(hot_df["ghash"].to_numpy(np.uint64)))

    def scrub(batch: pa.Table) -> pa.Table:
        hot = ray.get(hot_ref)
        rid, pos, gh, flat, offsets = _space_gram_all(batch.column(column), n)
        covered = np.zeros(len(flat), bool)
        if len(gh) and len(hot):
            idx = np.searchsorted(hot, gh)
            idx[idx >= len(hot)] = 0
            hit = hot[idx] == gh
            if hit.any():
                starts_flat = offsets[:-1][rid[hit]] + pos[hit]
                delta = np.zeros(len(flat) + 1, np.int64)
                np.add.at(delta, starts_flat, 1)
                np.add.at(delta, starts_flat + n, -1)  # gram fits its row
                covered = np.cumsum(delta[:-1]) > 0
        return _emit_scrubbed(batch, flat, offsets, covered, id_column)

    return ds.map_batches(scrub, batch_format="pyarrow")


def _scrub_join(
    ds: "ray.data.Dataset",
    hot_ds: "ray.data.Dataset",
    n: int,
    column: str,
    id_column: str,
) -> "ray.data.Dataset":
    """100-TB scrub path: gram-instance rows (id, start, ghash) inner-join
    the hot table inside one bucketed gram-hash groupby, covered starts
    aggregate per doc (ordered string_agg), one bucketed id join brings
    the start list back to each document, and the cover/rebuild runs
    map-side."""
    from dedupe_ray.joins import bucketed_lookup_join
    from dedupe_ray.ops.tabular import grouped_concat
    from dedupe_ray.ops.text import _space_gram_all

    def gram_rows(batch: pa.Table) -> pa.Table:
        rid, pos, gh, _, _ = _space_gram_all(batch.column(column), n)
        ids = _one_chunk(batch.column(id_column))
        return pa.table(
            {
                id_column: ids.take(pa.array(rid)),
                "start": pa.array(pos, pa.int64()),
                "ghash": pa.array(gh, pa.uint64()),
            }
        )

    def mark(b: pa.Table) -> pa.Table:
        return b.append_column("hot", pa.array(np.ones(len(b), np.int8)))

    hits = bucketed_lookup_join(
        ds.map_batches(gram_rows, batch_format="pyarrow"),
        hot_ds.map_batches(mark, batch_format="pyarrow"),
        "ghash",
        "ghash",
        ["hot"],
        how="inner",
    )
    cov = grouped_concat(hits, id_column, "start", "start", sep=",", out_column="cov")
    docs = bucketed_lookup_join(ds, cov, id_column, id_column, ["cov"], how="left")

    def rebuild(batch: pa.Table) -> pa.Table:
        _, _, _, flat, offsets = _space_gram_all(batch.column(column), n)
        covered = np.zeros(len(flat), bool)
        cov_col = batch.column("cov").to_pylist()
        deltas = []
        for row, s in enumerate(cov_col):
            if s:
                starts = np.array(s.split(","), np.int64) + offsets[row]
                deltas.append(starts)
        if deltas:
            starts_flat = np.concatenate(deltas)
            delta = np.zeros(len(flat) + 1, np.int64)
            np.add.at(delta, starts_flat, 1)
            np.add.at(delta, starts_flat + n, -1)
            covered = np.cumsum(delta[:-1]) > 0
        return _emit_scrubbed(
            batch.drop_columns(["cov"]), flat, offsets, covered, id_column
        )

    return docs.map_batches(rebuild, batch_format="pyarrow")


def _bloom_hash_pair(vals: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Two independent 64-bit hash streams per value (fixed-key siphash via
    pandas, cross-process deterministic); h2 forced odd so the
    Kirsch-Mitzenmacher double-hashing probe sequence h1 + i*h2 never
    degenerates."""
    import pandas as pd

    h1 = pd.util.hash_array(vals)
    h2 = pd.util.hash_array(vals, hash_key="dedupe_ray_bloom") | np.uint64(1)
    return h1, h2


def build_bloom(
    corpus_ds: "ray.data.Dataset",
    key_column: str,
    n_bits: int = 1 << 24,
    k: int = 7,
) -> np.ndarray:
    """One corpus scan -> packed Bloom bitmap (uint64[n_bits/64]) for
    ``key_column``. Per-block bitmap partials OR-merge streamed on the
    driver (constant memory). Persist with :func:`save_bloom` and reuse
    across runs — the "dedupe every day's crawl against everything seen
    so far" filter is built ONCE per corpus growth step, not per batch."""
    import pyarrow.compute as _pc

    if n_bits % 64:
        raise ValueError("n_bits must be a multiple of 64")
    words = n_bits // 64
    nb = np.uint64(n_bits)

    def bloom_partial(batch: pa.Table) -> pa.Table:
        vals = pc.fill_null(batch.column(key_column), "").to_numpy(
            zero_copy_only=False
        )
        bm = np.zeros(words, np.uint64)
        h1, h2 = _bloom_hash_pair(vals)
        for i in range(k):
            pos = (h1 + np.uint64(i) * h2) % nb
            np.bitwise_or.at(
                bm, (pos >> np.uint64(6)).astype(np.int64),
                np.uint64(1) << (pos & np.uint64(63)),
            )
        return pa.table({"bitmap": pa.array([bm.tobytes()], pa.large_binary())})

    parts = corpus_ds.map_batches(
        bloom_partial, batch_format="pyarrow", batch_size=65536
    )
    bloom = np.zeros(words, np.uint64)
    for b in parts.iter_batches(batch_format="pyarrow"):
        for buf in b.column("bitmap"):
            bloom |= np.frombuffer(buf.as_py(), np.uint64)
    return bloom


def save_bloom(bloom: np.ndarray, path: str, key_column: str, k: int) -> None:
    """Persist a Bloom bitmap + its parameters (npz); atomic replace."""
    import os

    tmp = path + ".__tmp__.npz"
    np.savez_compressed(
        tmp[:-4], bloom=bloom, n_bits=np.int64(len(bloom) * 64),
        k=np.int64(k), key_column=np.array(key_column),
    )
    os.replace(tmp, path)


def load_bloom(path: str) -> tuple[np.ndarray, int, int, str]:
    """Load (bitmap, n_bits, k, key_column) saved by :func:`save_bloom`."""
    z = np.load(path, allow_pickle=False)
    return (
        z["bloom"].astype(np.uint64),
        int(z["n_bits"]),
        int(z["k"]),
        str(z["key_column"]),
    )


def bloom_anti_join(
    new_ds: "ray.data.Dataset",
    corpus_ds: "ray.data.Dataset",
    key_column: str,
    n_bits: int = 1 << 24,
    k: int = 7,
    candidate_limit: int = 5_000_000,
    bloom: np.ndarray | None = None,
) -> "ray.data.Dataset":
    """Incremental exact dedup: rows of ``new_ds`` whose ``key_column``
    value does NOT occur anywhere in ``corpus_ds`` — the "dedupe today's
    crawl against the 100-TB corpus already ingested" step, with EXACT
    anti-join semantics and ZERO shuffle.

    The Bloom filter is a prefilter, not the answer: (1) corpus scan
    builds per-block bitmap partials (one packed ``n_bits``-bit row per
    block) that OR-merge streamed on the driver — constant driver memory,
    one bitmap live at a time; (2) new-side probe pass collects the
    bloom-POSITIVE keys (true dups + FP-rate·|new| stragglers — tiny,
    guarded by ``candidate_limit``); (3) one corpus scan confirms which
    candidates really occur (broadcast candidate set, C-speed hash-table
    ``isin`` per batch — string equality, so a Bloom or 64-bit-hash
    collision can never leak a wrong row); (4) new side streams through a
    final broadcast filter. Both sides only ever move (small) key sets to
    the driver; no all-to-all exchange at any scale. Sizing: FP rate ≈
    (1-e^{-kn/m})^k — default 16 Mbit / k=7 is <1% up to ~2M corpus keys;
    size ``n_bits`` ~10 bits per corpus key.
    """
    import pandas as pd

    import ray

    if n_bits % 64:
        raise ValueError("n_bits must be a multiple of 64")
    nb = np.uint64(n_bits)
    if bloom is None:
        bloom = build_bloom(corpus_ds, key_column, n_bits=n_bits, k=k)
    elif len(bloom) * 64 != n_bits:
        raise ValueError(
            f"provided bloom has {len(bloom) * 64} bits, expected {n_bits}"
        )
    bloom_ref = ray.put(np.ascontiguousarray(bloom, np.uint64))

    def probe(batch: pa.Table) -> pa.Table:
        bm = ray.get(bloom_ref)
        col = pc.fill_null(batch.column(key_column), "")
        vals = col.to_numpy(zero_copy_only=False)
        h1, h2 = _bloom_hash_pair(vals)
        hit = np.ones(len(vals), np.uint64)
        for i in range(k):
            pos = (h1 + np.uint64(i) * h2) % nb
            hit &= (bm[(pos >> np.uint64(6)).astype(np.int64)]
                    >> (pos & np.uint64(63))) & np.uint64(1)
        cand = np.unique(vals[hit.astype(bool)])
        return pa.table({key_column: pa.array(cand, batch.column(key_column).type)})

    cand = np.unique(
        new_ds.map_batches(probe, batch_format="pyarrow")
        .to_pandas()[key_column]  # bounded: bloom-positives, guarded by candidate_limit below
        .to_numpy()
    )
    if len(cand) > candidate_limit:
        raise ValueError(
            f"bloom-positive candidate set ({len(cand)}) exceeds "
            f"{candidate_limit}; raise n_bits (FP rate too high for this "
            "corpus) or candidate_limit"
        )
    cand_ref = ray.put(cand)

    def confirm(batch: pa.Table) -> pa.Table:
        cands = ray.get(cand_ref)
        vals = pc.fill_null(batch.column(key_column), "").to_numpy(
            zero_copy_only=False
        )
        mask = pd.Series(vals).isin(cands).to_numpy()
        found = np.unique(vals[mask])
        return pa.table({key_column: pa.array(found, batch.column(key_column).type)})

    found = np.unique(
        corpus_ds.map_batches(confirm, batch_format="pyarrow")
        .to_pandas()[key_column]  # bounded: subset of the guarded candidate set
        .to_numpy()
    )
    found_ref = ray.put(found)

    def final_filter(batch: pa.Table) -> pa.Table:
        dups = ray.get(found_ref)
        vals = pc.fill_null(batch.column(key_column), "").to_numpy(
            zero_copy_only=False
        )
        return batch.filter(pa.array(~pd.Series(vals).isin(dups).to_numpy()))

    return new_ds.map_batches(final_filter, batch_format="pyarrow")


def leakage_safe_split(
    ds: "ray.data.Dataset",
    val_frac: float = 0.1,
    jaccard_threshold: float = 0.7,
    assign_hash: str = "pandas",
    **lsh_kwargs,
) -> "ray.data.Dataset":
    """Cluster-aware train/validation split: near-duplicate documents NEVER
    straddle the split boundary (the train→eval leakage guard every LLM
    data pipeline needs — a val doc whose near-copy sits in train measures
    memorization, not generalization).

    Composition: MinHash-LSH groups → each doc's effective split key is
    its component id (lexicographically-smallest member, content-stable)
    or its own id when unclustered; assignment is a fixed-key hash of the
    key against ``val_frac`` — deterministic, parallelism-invariant, and
    stable under corpus growth (adding docs never moves an existing
    cluster). One extra bucketed shuffle over (id, id) rows on top of the
    LSH pipeline; expects the near-dup family's string ``doc_id``.

    ``assign_hash`` selects the fixed-key hash family for the final
    assignment: ``"pandas"`` (pd.util.hash_array's keyed siphash — the
    historical default) or ``"crc32"`` (zlib crc32 of the UTF-8 key —
    identical split quality, and expressible in ANSI SQL so the driver
    oracle can mirror the whole operator exactly).

    Returns (doc_id, split) with split ∈ {'train', 'val'} for every input
    doc.
    """
    import pandas as pd

    if assign_hash not in ("pandas", "crc32"):
        raise ValueError(f"unknown assign_hash {assign_hash!r}")

    groups = minhash_dedup(ds, jaccard_threshold=jaccard_threshold, **lsh_kwargs)
    threshold = np.uint64(int(val_frac * 1_000_000))

    def self_rows(b: pa.Table) -> pa.Table:
        ids = _one_chunk(b.column("doc_id"))
        return pa.table(
            {
                "doc_id": ids,
                "component_id": ids,
                "prio": pa.array(np.ones(len(b), np.int8)),
            }
        )

    def group_rows(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": b.column("doc_id"),
                "component_id": b.column("component_id"),
                "prio": pa.array(np.zeros(len(b), np.int8)),
            }
        )

    def bucketize(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        bkt = (pd.util.hash_array(ids) % np.uint64(N_BUCKETS)).astype(np.int32)
        return b.append_column("sbucket", pa.array(bkt))

    def resolve(g: pa.Table) -> pa.Table:
        t = g.sort_by([("doc_id", "ascending"), ("prio", "ascending")])
        ids = _one_chunk(t.column("doc_id"))
        keep = np.ones(len(t), bool)
        if len(t) > 1:
            same = pc.equal(ids.slice(1), ids.slice(0, len(ids) - 1))
            keep[1:] = ~same.to_numpy(zero_copy_only=False)
        rows = np.nonzero(keep)[0]
        comp = _one_chunk(t.column("component_id")).take(pa.array(rows))
        comp_np = comp.to_numpy(zero_copy_only=False)
        if assign_hash == "crc32":
            h = np.fromiter(
                (zlib.crc32(str(c).encode()) for c in comp_np),
                np.uint64,
                count=len(comp_np),
            )
        else:
            h = pd.util.hash_array(comp_np)
        split = np.where(h % np.uint64(1_000_000) < threshold, "val", "train")
        return pa.table(
            {
                "doc_id": ids.take(pa.array(rows)),
                "split": pa.array(split, pa.string()),
            }
        )

    unioned = (
        ds.map_batches(self_rows, batch_format="pyarrow")
        .union(groups.map_batches(group_rows, batch_format="pyarrow"))
        .map_batches(bucketize, batch_format="pyarrow")
    )
    return unioned.groupby("sbucket").map_groups(resolve, batch_format="pyarrow")


def fuzzy_levenshtein_join(
    ds: "ray.data.Dataset",
    id_column: str = "doc_id",
    value_column: str = "value",
    max_distance: int = 2,
    max_bucket: int = 20_000,
) -> "ray.data.Dataset":
    """Edit-distance-threshold SELF-JOIN: every unordered pair of rows whose
    ``value_column`` strings are within Levenshtein distance ``max_distance``
    → ``(id_a, id_b, dist)`` with ``id_a < id_b`` — the distributed form of
    the reference library's Levenshtein canopy (L6, [lib:
    dedupe/levenshtein.py]) expressed as a join instead of an index probe.

    Blocking is the SymSpell/FastSS deletion-neighborhood property (public:
    Bocek et al. 2007; Garbe's SymSpell): if ``lev(u, v) <= r`` then deleting
    ``<= r`` characters from each reaches a COMMON string, so rows sharing a
    depth-``r`` deletion variant form a complete candidate set. Stages:

    1. explode — each row emits one row per distinct deletion variant,
       carrying only ``(hash64(variant), id, value)`` (the variant string
       itself never shuffles; a 64-bit collision can only ADD a candidate,
       which the exact verify removes — recall is unaffected because equal
       variants always hash equal);
    2. bucketed groupby on the variant hash — runs of equal hash expand
       triangularly into candidate pairs (vectorized, same shape as the
       MinHash band-bucket emitter), re-keyed by a pair-id hash;
    3. pair-bucket groupby — global pair dedup (the same pair arises once
       per shared variant; its pair hash lands it in ONE bucket), then one
       vectorized ``levenshtein_batch`` verify and the threshold filter.

    Fan-out is ``O(len^r)`` variants per row — the standard SymSpell cost
    (~190 variants for an 18-char value at r=2); values should be near-
    distinct. A value duplicated m times shares ALL its variants, so runs
    grow O(m) and pairs O(m²): dedup to distinct values first (exact_dedup)
    and join ids back if your column repeats. Runs longer than
    ``max_bucket`` raise (explicit, never silent recall loss) — raise the
    cap or pre-dedup. Output dist is int64 (SQL ``levenshtein`` parity).
    """
    import pandas as pd

    from dedupe_ray.distances import levenshtein_batch
    from dedupe_ray.predicates import _deletions

    def explode(batch: pa.Table) -> pa.Table:
        ids = _one_chunk(batch.column(id_column))
        vals_arr = _one_chunk(batch.column(value_column))
        vals = vals_arr.to_pylist()
        variants: list[str] = []
        counts = np.empty(len(vals), np.int64)
        for i, v in enumerate(vals):
            d = _deletions(v or "", max_distance)
            counts[i] = len(d)
            variants.extend(d)
        h = pd.util.hash_array(np.asarray(variants, dtype=object))
        parent = pa.array(np.repeat(np.arange(len(vals), dtype=np.int64), counts))
        return pa.table(
            {
                "dhash": pa.array(h, pa.uint64()),
                "vbucket": pa.array((h % np.uint64(N_BUCKETS)).astype(np.int32)),
                "rid": ids.take(parent),
                "val": vals_arr.take(parent),
            }
        )

    def emit_pairs(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "id_a": pa.array([], group.column("rid").type),
                "id_b": pa.array([], group.column("rid").type),
                "val_a": pa.array([], pa.string()),
                "val_b": pa.array([], pa.string()),
                "pbucket": pa.array([], pa.int32()),
            }
        )
        if not len(group):
            return empty
        g = group.take(
            pc.sort_indices(
                group, sort_keys=[("dhash", "ascending"), ("rid", "ascending")]
            )
        )
        h = g.column("dhash").to_numpy(zero_copy_only=False)
        n = len(g)
        change = h[1:] != h[:-1] if n > 1 else np.zeros(0, bool)
        run_starts = np.nonzero(np.concatenate(([True], change)))[0]
        run_lengths = np.diff(np.append(run_starts, n))
        if int(run_lengths.max()) > max_bucket:
            raise ValueError(
                f"deletion-variant run of {int(run_lengths.max())} rows exceeds "
                f"max_bucket={max_bucket}; dedup {value_column!r} to distinct "
                "values first or raise the cap"
            )
        m_per_elem = np.repeat(run_lengths, run_lengths)
        pos_in_run = np.arange(n) - np.repeat(run_starts, run_lengths)
        counts = m_per_elem - 1 - pos_in_run
        total = int(counts.sum())
        if total == 0:
            return empty
        a_idx = np.repeat(np.arange(n), counts)
        cum = np.concatenate(([0], np.cumsum(counts)))[:-1]
        b_idx = a_idx + 1 + (np.arange(total, dtype=np.int64) - np.repeat(cum, counts))
        ids = _one_chunk(g.column("rid"))
        vals = _one_chunk(g.column("val"))
        out_a = ids.take(pa.array(a_idx))
        out_b = ids.take(pa.array(b_idx))
        ha = pd.util.hash_array(out_a.to_numpy(zero_copy_only=False))
        hb = pd.util.hash_array(out_b.to_numpy(zero_copy_only=False))
        pbucket = ((ha * np.uint64(31) + hb) % np.uint64(N_BUCKETS)).astype(np.int32)
        return pa.table(
            {
                "id_a": out_a,
                "id_b": out_b,
                "val_a": vals.take(pa.array(a_idx)),
                "val_b": vals.take(pa.array(b_idx)),
                "pbucket": pa.array(pbucket),
            }
        )

    def dedup_verify(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "id_a": pa.array([], group.column("id_a").type),
                "id_b": pa.array([], group.column("id_b").type),
                "dist": pa.array([], pa.int64()),
            }
        )
        if not len(group):
            return empty
        t = group.sort_by([("id_a", "ascending"), ("id_b", "ascending")])
        a = _one_chunk(t.column("id_a"))
        b = _one_chunk(t.column("id_b"))
        keep = np.ones(len(t), bool)
        if len(t) > 1:
            same = pc.and_(
                pc.equal(a.slice(1), a.slice(0, len(a) - 1)),
                pc.equal(b.slice(1), b.slice(0, len(b) - 1)),
            )
            keep[1:] = ~same.to_numpy(zero_copy_only=False)
        rows = pa.array(np.nonzero(keep)[0])
        t = t.take(rows)
        dist = levenshtein_batch(
            t.column("val_a").to_pylist(), t.column("val_b").to_pylist()
        )
        ok = dist <= max_distance
        sel = pa.array(np.nonzero(ok)[0])
        return pa.table(
            {
                "id_a": _one_chunk(t.column("id_a")).take(sel),
                "id_b": _one_chunk(t.column("id_b")).take(sel),
                "dist": pa.array(dist[ok].astype(np.int64)),
            }
        )

    exploded = ds.map_batches(explode, batch_format="pyarrow")
    raw = exploded.groupby("vbucket").map_groups(emit_pairs, batch_format="pyarrow")
    return raw.groupby("pbucket").map_groups(dedup_verify, batch_format="pyarrow")


def sorted_neighborhood_pairs(
    ds: "ray.data.Dataset",
    id_column: str = "doc_id",
    key_column: str = "sort_key",
    window: int = 5,
    n_buckets: int | None = None,
    sample_cap: int = 20_000,
) -> "ray.data.Dataset":
    """Sorted-neighborhood blocking (Hernández & Stolfo 1995 — the classic
    ER alternative to key-equality blocking): every pair of rows within
    ``window`` positions of each other in the GLOBAL (key, id) order →
    ``(id_a, id_b)`` with ``id_a`` preceding ``id_b`` in that order.

    Scale shape — NO global sort: the key space is range-partitioned on
    deterministically hash-sampled split points (the OUTPUT is
    split-invariant, so sampling quality only affects balance, never
    correctness); each bucket sorts locally and emits its window pairs
    vectorized (one slice join per offset 1..w). Cross-boundary pairs:
    only a bucket's first/last ``window`` rows can reach another bucket
    (an interior row is > w positions from any bucket edge), so those
    rows — tagged with their bucket, offset-from-edge and the bucket's
    total count — converge on ONE small group (≤ 2·w·n_buckets rows)
    where exact global rank gaps are reconstructed from the per-bucket
    counts (empty buckets contribute zero rows and zero gap). In-bucket
    pairs and cross-bucket pairs are disjoint by construction, so no
    dedup shuffle is needed.

    Rows with equal keys always land in one bucket (range assignment
    compares keys only), so a heavily repeated key value skews its bucket
    — same caveat as any range partitioner; the (key, id) tiebreak makes
    the total order (and therefore the pair set) unique and engine-exact
    against a SQL ``row_number`` window oracle.
    """
    import pandas as pd

    n = ds.count()
    if n == 0:
        return ds.map_batches(
            lambda b: pa.table(
                {"id_a": pa.array([], pa.string()), "id_b": pa.array([], pa.string())}
            ),
            batch_format="pyarrow",
        )
    if n_buckets is None:
        n_buckets = max(1, min(N_BUCKETS, n // max(window * 64, 512)))

    # deterministic hash-sample of keys → driver-sorted split points.
    # bounded: expected sample ≤ sample_cap regardless of n.
    rate = min(1.0, sample_cap / max(n, 1))
    mod = np.uint64(max(1, int(1 / max(rate, 1e-9))))

    def sample_keys(b: pa.Table) -> pa.Table:
        ids = b.column(id_column).to_numpy(zero_copy_only=False)
        h = pd.util.hash_array(np.asarray(ids, dtype=object if ids.dtype == object else ids.dtype))
        keep = (h % mod) == 0
        return pa.table({"k": pc.array_filter(b.column(key_column), pa.array(keep))})

    sampled = (
        # bounded: hash-sampled keys, expected <= sample_cap regardless of n
        ds.map_batches(sample_keys, batch_format="pyarrow").to_pandas()["k"].to_numpy()  # bounded: sample_cap
    )
    if len(sampled) and n_buckets > 1:
        s = np.sort(sampled)
        qpos = (np.linspace(0, 1, n_buckets + 1)[1:-1] * (len(s) - 1)).astype(np.int64)
        splits_arr = np.asarray(sorted(set(s[qpos].tolist())))
    else:
        splits_arr = np.asarray([])

    def assign(b: pa.Table) -> pa.Table:
        keys = b.column(key_column).to_numpy(zero_copy_only=False)
        bkt = (
            np.searchsorted(splits_arr, keys, side="right").astype(np.int32)
            if len(splits_arr)
            else np.zeros(len(b), np.int32)
        )
        return pa.table(
            {
                "rid": b.column(id_column),
                "key": b.column(key_column),
                "bkt": pa.array(bkt),
            }
        )

    sch = ds.schema()
    id_type = dict(zip(sch.names, sch.types))[id_column]

    def per_bucket(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "kind": pa.array([], pa.int8()),
                "id_a": pa.array([], id_type),
                "id_b": pa.array([], id_type),
                "bkt": pa.array([], pa.int32()),
                "pos": pa.array([], pa.int32()),
                "cnt": pa.array([], pa.int64()),
                "bid": pa.array([], id_type),
                "bkey": pa.array([], group.column("key").type),
            }
        )
        m = len(group)
        if m == 0:
            return empty
        g = group.take(
            pc.sort_indices(
                group, sort_keys=[("key", "ascending"), ("rid", "ascending")]
            )
        )
        ids = _one_chunk(g.column("rid"))
        parts = [empty]
        for d in range(1, min(window, m - 1) + 1):
            a = ids.slice(0, m - d)
            b = ids.slice(d)
            parts.append(
                pa.table(
                    {
                        "kind": pa.array(np.zeros(m - d, np.int8)),
                        "id_a": a,
                        "id_b": b,
                        "bkt": pa.array(np.zeros(m - d, np.int32)),
                        "pos": pa.array(np.zeros(m - d, np.int32)),
                        "cnt": pa.array(np.zeros(m - d, np.int64)),
                        "bid": pa.nulls(m - d, id_type),
                        "bkey": pa.nulls(m - d, group.column("key").type),
                    }
                )
            )
        # boundary rows: positions 0..w-1 and m-w..m-1 (deduped when m<2w)
        bpos = sorted(set(range(min(window, m))) | set(range(max(0, m - window), m)))
        bkt_val = int(g.column("bkt")[0].as_py())
        take = pa.array(np.asarray(bpos, np.int64))
        parts.append(
            pa.table(
                {
                    "kind": pa.array(np.ones(len(bpos), np.int8)),
                    "id_a": pa.nulls(len(bpos), id_type),
                    "id_b": pa.nulls(len(bpos), id_type),
                    "bkt": pa.array(np.full(len(bpos), bkt_val, np.int32)),
                    "pos": pa.array(np.asarray(bpos, np.int32)),
                    "cnt": pa.array(np.full(len(bpos), m, np.int64)),
                    "bid": ids.take(take),
                    "bkey": _one_chunk(g.column("key")).take(take),
                }
            )
        )
        return pa.concat_tables(parts)

    mixed = (
        ds.map_batches(assign, batch_format="pyarrow")
        .groupby("bkt")
        .map_groups(per_bucket, batch_format="pyarrow")
    )
    pairs = mixed.filter(expr="kind == 0").select_columns(["id_a", "id_b"])

    def cross_pairs(group: pa.Table) -> pa.Table:
        """All boundary rows in one group: reconstruct exact global rank
        gaps from per-bucket counts and emit the ≤ window cross pairs."""
        empty = pa.table({"id_a": pa.array([], id_type), "id_b": pa.array([], id_type)})
        if len(group) == 0:
            return empty
        g = group.take(
            pc.sort_indices(
                group,
                sort_keys=[("bkt", "ascending"), ("pos", "ascending")],
            )
        )
        bkt = g.column("bkt").to_numpy(zero_copy_only=False)
        pos = g.column("pos").to_numpy(zero_copy_only=False).astype(np.int64)
        cnt = g.column("cnt").to_numpy(zero_copy_only=False).astype(np.int64)
        ids = _one_chunk(g.column("bid"))
        counts = {int(b): int(c) for b, c in zip(bkt, cnt)}
        # cumulative rows before each bucket (buckets absent = 0 rows)
        uniq = sorted(counts)
        before = {}
        run = 0
        for u in uniq:
            before[u] = run
            run += counts[u]
        grank = np.asarray([before[int(b)] + p for b, p in zip(bkt, pos)], np.int64)
        out_a, out_b = [], []
        m = len(g)
        for i in range(m):
            j = i + 1
            while j < m and grank[j] - grank[i] <= window:
                if bkt[j] != bkt[i]:  # same-bucket pairs already emitted
                    out_a.append(i)
                    out_b.append(j)
                j += 1
        if not out_a:
            return empty
        return pa.table(
            {
                "id_a": ids.take(pa.array(np.asarray(out_a, np.int64))),
                "id_b": ids.take(pa.array(np.asarray(out_b, np.int64))),
            }
        )

    boundary = (
        mixed.filter(expr="kind == 1")
        .map_batches(
            lambda b: b.select(["bkt", "pos", "cnt", "bid"]).append_column(
                "one", pa.array(np.zeros(len(b), np.int8))
            ),
            batch_format="pyarrow",
        )
        .groupby("one")
        .map_groups(cross_pairs, batch_format="pyarrow")
    )
    return pairs.union(boundary)


def jaccard_similarity_join(
    ds: "ray.data.Dataset",
    threshold: float,
    id_column: str = "doc_id",
    text_column: str = "text",
    n: int = 1,
    token_pattern: str | None = None,
    order: str = "hash",
    df_table_size: int = 100_000,
    max_bucket: int = 50_000,
    broadcast_limit: int = 2_000_000,
) -> "ray.data.Dataset":
    """EXACT Jaccard-threshold self-join over word-``n``-gram shingle SETS — all pairs with
    ``|A∩B|/|A∪B| >= threshold`` → (id_a, id_b, ngram_jaccard) — the
    deterministic companion to MinHash-LSH (no probabilistic recall loss;
    the filter is lossless, so the output is exactly the brute-force set).

    Prefix filtering (SSJoin/PPJoin family — Chaudhuri et al. 2006, Xiao
    et al. 2008): under ANY global total order on tokens, two sets with
    overlap ≥ α must share a token inside both of their first
    ``|set| − α + 1`` tokens (pigeonhole); with α = ⌈t·|set|⌉ (valid since
    Jaccard ≥ t forces overlap ≥ t·max(|A|,|B|)), only each doc's PREFIX
    tokens are exploded — the shuffle carries ``(1−t)·|set|+1`` rows per
    doc instead of the full set. Two total orders are offered
    (the choice is a pruning lever, NEVER a correctness one — the output
    is the exact brute-force set either way): ``order="hash"`` uses the
    64-bit gram hash, computable per batch with no extra pass;
    ``order="df"`` is the PPJoin frequency-ascending order — one
    counting-combiner pass collects gram document frequencies, the top
    ``df_table_size`` heavy grams broadcast driver-side (bounded), and
    prefixes order by (df, hash) with every gram outside the table
    treated as df 0 (rare-first). Heavy grams — the ones that blow up
    candidate buckets — are thereby pushed OUT of prefixes (measured on
    the sf0.01 documents corpus, 3-gram t=0.5: 4557 candidates under hash
    order vs 749 under df order — 6.1x — identical 25-pair output). Stages: prefix explode → token-bucket groupby (pairs
    within equal-hash runs + the ``|B| ≥ t·|A|`` length filter) →
    pair-bucket dedup → exact verify via :func:`ngram_jaccard_pairs`
    (n=1; texts join back through the size-guarded assembler). A 64-bit
    hash collision merges two tokens (could, with ~2⁻⁶⁴ probability per
    token pair, shorten a prefix below the bound) — the same negligible-
    collision stance as the MinHash family. Oversized token runs raise
    (never silent loss)."""
    import pandas as pd

    word_re = re.compile(token_pattern) if token_pattern else _WORD
    t = float(threshold)

    def doc_grams(txt) -> list[str] | None:
        toks = word_re.findall((txt or "").lower())
        if not toks:
            return None
        return sorted(
            {" ".join(toks[j: j + n]) for j in range(max(1, len(toks) - n + 1))}
        )

    top_hashes = top_counts = None
    if order == "df":
        from ray.data.aggregate import Sum

        def gram_counts(batch: pa.Table) -> pa.Table:
            hs = []
            for txt in batch.column(text_column).to_pylist():
                grams = doc_grams(txt)
                if grams:
                    hs.append(pd.util.hash_array(np.asarray(grams, dtype=object)))
            if not hs:
                return pa.table(
                    {"ghash": pa.array([], pa.uint64()), "c": pa.array([], pa.int64())}
                )
            u, c = np.unique(np.concatenate(hs), return_counts=True)
            # uint64 group keys round-trip through Ray's groupby as Python
            # ints and overflow Arrow int64 — ship the order-preserving
            # XOR-shifted int64 image instead (h ^ 2^63, unsigned->signed)
            u_i64 = (u ^ np.uint64(1 << 63)).astype(np.int64)
            return pa.table(
                {"ghash": pa.array(u_i64, pa.int64()), "c": pa.array(c.astype(np.int64))}
            )

        import pandas as pd

        agg = (
            ds.map_batches(gram_counts, batch_format="pyarrow")
            .groupby("ghash")
            .aggregate(Sum("c", alias_name="c"))
        )

        def topk_partial(b: pa.Table) -> pa.Table:
            # Ray's Sort chokes converting uint64 > int64-max back to Arrow,
            # so the heavy-gram cut is a per-block partial top-K + a bounded
            # driver merge instead of a Dataset sort
            hh = b.column("ghash").to_numpy(zero_copy_only=False).astype(np.int64)
            cc = b.column("c").to_numpy(zero_copy_only=False).astype(np.int64)
            if len(cc) > df_table_size:
                sel = np.lexsort((hh, -cc))[:df_table_size]
                hh, cc = hh[sel], cc[sel]
            return pa.table(
                {"ghash": pa.array(hh, pa.int64()), "c": pa.array(cc, pa.int64())}
            )

        dft = topk_partial(
            pa.Table.from_pandas(
                agg.map_batches(topk_partial, batch_format="pyarrow").to_pandas()  # bounded: df_table_size per block
            )
        )
        hh = dft.column("ghash").to_numpy(zero_copy_only=False).astype(np.int64)
        hh = hh.astype(np.uint64) ^ np.uint64(1 << 63)  # undo the shift
        cc = dft.column("c").to_numpy(zero_copy_only=False).astype(np.int64)
        o = np.argsort(hh)
        top_hashes, top_counts = hh[o], cc[o]
    elif order != "hash":
        raise ValueError(f"unknown prefix order {order!r} (hash|df)")

    def explode_prefix(batch: pa.Table) -> pa.Table:
        ids = _one_chunk(batch.column(id_column))
        texts = batch.column(text_column).to_pylist()
        all_hashes: list[np.ndarray] = []
        counts = np.zeros(len(texts), np.int64)
        sizes = np.zeros(len(texts), np.int64)
        for i, txt in enumerate(texts):
            # word-n-gram shingle SET, space-joined — the same universe the
            # verify kernel's tuple grams span (tokens contain no spaces,
            # so the join is injective and set sizes agree)
            grams = doc_grams(txt)
            if not grams:
                all_hashes.append(np.zeros(0, np.uint64))
                continue
            hs = pd.util.hash_array(np.asarray(grams, dtype=object))
            if top_hashes is not None and len(top_hashes):
                idx = np.searchsorted(top_hashes, hs)
                idxc = np.minimum(idx, len(top_hashes) - 1)
                dfv = np.where(top_hashes[idxc] == hs, top_counts[idxc], 0)
                h = hs[np.lexsort((hs, dfv))]  # (df asc, hash asc)
            else:
                h = np.sort(hs)
            size = len(h)
            alpha = int(np.ceil(t * size))
            L = max(1, size - alpha + 1)
            all_hashes.append(h[:L])
            counts[i] = L
            sizes[i] = size
        flat = (
            np.concatenate(all_hashes) if all_hashes else np.zeros(0, np.uint64)
        )
        parent = pa.array(np.repeat(np.arange(len(texts), dtype=np.int64), counts))
        return pa.table(
            {
                "thash": pa.array(flat, pa.uint64()),
                "tbucket": pa.array((flat % np.uint64(N_BUCKETS)).astype(np.int32)),
                "rid": ids.take(parent),
                "size": pa.array(np.repeat(sizes, counts)),
            }
        )

    def emit_candidates(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "id_a": pa.array([], group.column("rid").type),
                "id_b": pa.array([], group.column("rid").type),
                "pbucket": pa.array([], pa.int32()),
            }
        )
        if not len(group):
            return empty
        g = group.take(
            pc.sort_indices(
                group, sort_keys=[("thash", "ascending"), ("rid", "ascending")]
            )
        )
        h = g.column("thash").to_numpy(zero_copy_only=False)
        n = len(g)
        change = h[1:] != h[:-1] if n > 1 else np.zeros(0, bool)
        run_starts = np.nonzero(np.concatenate(([True], change)))[0]
        run_lengths = np.diff(np.append(run_starts, n))
        if int(run_lengths.max()) > max_bucket:
            raise ValueError(
                f"prefix-token run of {int(run_lengths.max())} rows exceeds "
                f"max_bucket={max_bucket}; raise the cap or switch the token "
                "order to document frequency"
            )
        m_per_elem = np.repeat(run_lengths, run_lengths)
        pos_in_run = np.arange(n) - np.repeat(run_starts, run_lengths)
        counts = m_per_elem - 1 - pos_in_run
        total = int(counts.sum())
        if total == 0:
            return empty
        a_idx = np.repeat(np.arange(n), counts)
        cum = np.concatenate(([0], np.cumsum(counts)))[:-1]
        b_idx = a_idx + 1 + (np.arange(total, dtype=np.int64) - np.repeat(cum, counts))
        sizes = g.column("size").to_numpy(zero_copy_only=False)
        sa, sb = sizes[a_idx], sizes[b_idx]
        # Jaccard >= t forces overlap >= t*max(|A|,|B|), so min >= t*max
        ok = np.minimum(sa, sb) >= t * np.maximum(sa, sb)
        a_idx, b_idx = a_idx[ok], b_idx[ok]
        if not len(a_idx):
            return empty
        ids = _one_chunk(g.column("rid"))
        out_a = ids.take(pa.array(a_idx))
        out_b = ids.take(pa.array(b_idx))
        ha = pd.util.hash_array(out_a.to_numpy(zero_copy_only=False))
        hb = pd.util.hash_array(out_b.to_numpy(zero_copy_only=False))
        pbucket = ((ha * np.uint64(31) + hb) % np.uint64(N_BUCKETS)).astype(np.int32)
        return pa.table({"id_a": out_a, "id_b": out_b, "pbucket": pa.array(pbucket)})

    def dedup(group: pa.Table) -> pa.Table:
        t2 = group.select(["id_a", "id_b"]).sort_by(
            [("id_a", "ascending"), ("id_b", "ascending")]
        )
        if len(t2) < 2:
            return t2
        a = _one_chunk(t2.column("id_a"))
        b = _one_chunk(t2.column("id_b"))
        neq = pc.not_equal(a.slice(1), a.slice(0, len(a) - 1)).to_numpy(
            zero_copy_only=False
        ) | pc.not_equal(b.slice(1), b.slice(0, len(b) - 1)).to_numpy(
            zero_copy_only=False
        )
        keep = np.concatenate(([True], neq))
        return t2 if keep.all() else t2.take(pa.array(np.nonzero(keep)[0]))

    cands = (
        ds.map_batches(explode_prefix, batch_format="pyarrow")
        .groupby("tbucket")
        .map_groups(emit_candidates, batch_format="pyarrow")
        .groupby("pbucket")
        .map_groups(dedup, batch_format="pyarrow")
    )
    # the verify kernel's assembler speaks (doc_id: string, text) — rename;
    # string ids are this family's contract (like the MinHash pipeline)
    flat = ds.map_batches(
        lambda b: pa.table(
            {"doc_id": b.column(id_column), "text": b.column(text_column)}
        ),
        batch_format="pyarrow",
    )
    return ngram_jaccard_pairs(
        flat,
        cands,
        n=n,
        threshold=t,
        broadcast_limit=broadcast_limit,
        token_pattern=token_pattern,
    )


def string_sim_pairs(
    ds: "ray.data.Dataset",
    pairs_ds: "ray.data.Dataset",
    value_column: str,
    threshold: float,
    metric: str = "jaro_winkler",
    broadcast_limit: int = 2_000_000,
) -> "ray.data.Dataset":
    """Verify candidate pairs with a string-similarity kernel — the second
    half of the classic blocking→verify ER dataflow (pair any blocking
    generator here: :func:`sorted_neighborhood_pairs`, the deletion-
    neighborhood join, predicate blocking). Values reach the kernel
    through the size-guarded pair assembler (broadcast under the limit,
    hash joins above); string ``doc_id`` ids are this family's contract.
    Returns (id_a, id_b, sim ≥ threshold); ``metric``: ``jaro_winkler``
    (DuckDB-bit-exact, see distances.jaro_winkler_batch) or
    ``levenshtein`` (unit-cost distance turned into a normalized
    similarity ``1 − d/max_len``)."""
    from dedupe_ray.distances import jaro_winkler_batch, levenshtein_batch
    from dedupe_ray.scoring import assemble_pairs

    if metric not in ("jaro_winkler", "levenshtein"):
        raise ValueError(f"unknown metric {metric!r}")
    joined = assemble_pairs(
        pairs_ds.select_columns(["id_a", "id_b"]),
        ds.select_columns(["doc_id", value_column]),
        [value_column],
        broadcast_limit=broadcast_limit,
        strict=False,
    )
    t = float(threshold)

    def verify(batch: pa.Table) -> pa.Table:
        if not len(batch):
            return pa.table(
                {
                    "id_a": pa.array([], pa.string()),
                    "id_b": pa.array([], pa.string()),
                    "sim": pa.array([], pa.float64()),
                }
            )
        va = batch.column(f"a_{value_column}").to_pylist()
        vb = batch.column(f"b_{value_column}").to_pylist()
        if metric == "jaro_winkler":
            sim = jaro_winkler_batch(va, vb)
        else:
            d = levenshtein_batch(va, vb).astype(np.float64)
            mx = np.fromiter(
                (max(len(x or ""), len(y or ""), 1) for x, y in zip(va, vb)),
                np.float64,
                len(va),
            )
            sim = 1.0 - d / mx
        out = pa.table(
            {
                "id_a": batch.column("id_a"),
                "id_b": batch.column("id_b"),
                "sim": pa.array(sim),
            }
        )
        return out.filter(pc.greater_equal(out.column("sim"), t))

    return joined.map_batches(verify, batch_format="pyarrow")


def containment_join(
    ds: "ray.data.Dataset",
    threshold: float,
    id_column: str = "doc_id",
    text_column: str = "text",
    n: int = 1,
    token_pattern: str | None = None,
    max_bucket: int = 200_000,
) -> "ray.data.Dataset":
    """EXACT directed containment self-join over word-``n``-gram shingle
    sets: all ordered pairs with ``|A∩B| / |A| >= threshold`` (A ≠ B) →
    (id_a, id_b, containment) — the SUB-DOCUMENT near-dup semantics
    (a quote, excerpt, or boilerplate block embedded in a larger page)
    that symmetric Jaccard misses by construction.

    Shape: one full gram-hash explode (containment admits no prefix
    pruning on the containee side — the intrinsic cost of the exact
    join), within-run undirected candidate pairs carrying both set
    sizes, one pair groupby COUNT = the exact intersection size (gram
    hashes are distinct within a doc's set), then both directed
    emissions check their own denominator. The division is the same
    IEEE expression a SQL list_intersect oracle evaluates — engine-
    exact. 64-bit gram-hash collisions get the family's usual
    negligible-collision stance; oversized gram runs raise (a hot gram
    at web scale means a stopword-like shingle — lengthen ``n`` or
    pre-filter)."""
    import pandas as pd
    from ray.data.aggregate import Count

    word_re = re.compile(token_pattern) if token_pattern else _WORD
    t = float(threshold)

    def explode(batch: pa.Table) -> pa.Table:
        ids = _one_chunk(pc.cast(batch.column(id_column), pa.string()))
        texts = batch.column(text_column).to_pylist()
        hs_all: list[np.ndarray] = []
        counts = np.zeros(len(texts), np.int64)
        for i, txt in enumerate(texts):
            toks = word_re.findall((txt or "").lower())
            if not toks:
                hs_all.append(np.zeros(0, np.uint64))
                continue
            grams = sorted({" ".join(toks[j : j + n]) for j in range(max(1, len(toks) - n + 1))})
            hs = pd.util.hash_array(np.asarray(grams, object))
            hs_all.append(hs)
            counts[i] = len(hs)
        flat = np.concatenate(hs_all) if hs_all else np.zeros(0, np.uint64)
        parent = pa.array(np.repeat(np.arange(len(texts), dtype=np.int64), counts))
        return pa.table(
            {
                "thash": pa.array(flat, pa.uint64()),
                "tbucket": pa.array((flat % np.uint64(N_BUCKETS)).astype(np.int32)),
                "rid": ids.take(parent),
                "size": pa.array(np.repeat(counts, counts)),
            }
        )

    def run_pairs(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "id_a": pa.array([], pa.string()),
                "id_b": pa.array([], pa.string()),
                "size_a": pa.array([], pa.int64()),
                "size_b": pa.array([], pa.int64()),
            }
        )
        if not len(group):
            return empty
        g = group.take(
            pc.sort_indices(
                group, sort_keys=[("thash", "ascending"), ("rid", "ascending")]
            )
        )
        h = g.column("thash").to_numpy(zero_copy_only=False)
        m = len(g)
        change = h[1:] != h[:-1] if m > 1 else np.zeros(0, bool)
        run_starts = np.nonzero(np.concatenate(([True], change)))[0]
        run_lengths = np.diff(np.append(run_starts, m))
        if int(run_lengths.max()) > max_bucket:
            raise ValueError(
                f"gram run of {int(run_lengths.max())} rows exceeds "
                f"max_bucket={max_bucket} — a stopword-like shingle; "
                "lengthen n or pre-filter hot grams"
            )
        per = np.repeat(run_lengths, run_lengths)
        pos = np.arange(m) - np.repeat(run_starts, run_lengths)
        cnt = per - 1 - pos
        total = int(cnt.sum())
        if total == 0:
            return empty
        a_idx = np.repeat(np.arange(m), cnt)
        cum = np.concatenate(([0], np.cumsum(cnt)))[:-1]
        b_idx = a_idx + 1 + (np.arange(total, dtype=np.int64) - np.repeat(cum, cnt))
        rid = g.column("rid").to_numpy(zero_copy_only=False)
        sizes = g.column("size").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "id_a": pa.array(rid[a_idx], pa.string()),
                "id_b": pa.array(rid[b_idx], pa.string()),
                "size_a": pa.array(sizes[a_idx].astype(np.int64)),
                "size_b": pa.array(sizes[b_idx].astype(np.int64)),
            }
        )

    inter = (
        ds.map_batches(explode, batch_format="pyarrow")
        .groupby("tbucket")
        .map_groups(run_pairs, batch_format="pyarrow")
        .groupby(["id_a", "id_b", "size_a", "size_b"])
        .aggregate(Count(alias_name="inter"))
    )

    def emit_directed(b: pa.Table) -> pa.Table:
        ia = b.column("id_a").to_numpy(zero_copy_only=False)
        ib = b.column("id_b").to_numpy(zero_copy_only=False)
        sa = b.column("size_a").to_numpy(zero_copy_only=False).astype(np.int64)
        sb = b.column("size_b").to_numpy(zero_copy_only=False).astype(np.int64)
        ov = b.column("inter").to_numpy(zero_copy_only=False).astype(np.int64)
        ca = ov * 1.0 / sa  # A contained in B
        cb = ov * 1.0 / sb  # B contained in A
        ka, kb = ca >= t, cb >= t
        return pa.table(
            {
                "id_a": pa.array(np.concatenate([ia[ka], ib[kb]]), pa.string()),
                "id_b": pa.array(np.concatenate([ib[ka], ia[kb]]), pa.string()),
                "containment": pa.array(np.concatenate([ca[ka], cb[kb]])),
            }
        )

    return inter.map_batches(emit_directed, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Line-level exact dedup (C4 / RefinedWeb style)
# ---------------------------------------------------------------------------


def dedup_lines(
    ds: "ray.data.Dataset",
    text_column: str = "text",
    id_column: str = "doc_id",
    line_tokens: int = 4,
    out_column: str = "clean_text",
) -> "ray.data.Dataset":
    """Corpus-wide exact LINE dedup (C4 / RefinedWeb style): every document
    is segmented into fixed-width token lines (``line_tokens`` whitespace
    tokens per line — the corpus carries no newlines, so the segmenter IS
    the line definition, applied identically by the SQL oracle), every line
    that appears anywhere else in the corpus keeps only its FIRST
    occurrence (lexicographic min of ``(doc_id, line_no)``), and surviving
    lines are re-joined per document in original order. Documents whose
    every line loses are dropped entirely.

    Shape: two bucketed shuffles, both on N_BUCKETS-sized key spaces —
    (1) lines shuffle once by a crc-bucket of the line hash; within a
    bucket the global keep-first is one vectorized sort + run-boundary
    filter on (hash, line, doc_id, line_no) — hash collisions cannot merge
    distinct lines because the line value itself is a sort key; (2)
    surviving lines shuffle by id-bucket and each doc re-joins with a
    single per-doc ''.join. Only line-sized rows ever move; the original
    documents never re-shuffle. At 100 TB the line table is the same order
    of magnitude as the corpus, which is exactly what the bucketed
    keep-first was built for (cf. exact_dedup above).

    Tokenization contract: split on every single space (``str.split(' ')``,
    NOT ``split()``) so the oracle's ``regexp_split_to_array(text, ' ')``
    produces the identical token stream including empties from runs of
    spaces.
    """
    import pandas as pd

    w = int(line_tokens)

    def explode_lines(b: pa.Table) -> pa.Table:
        texts = pc.fill_null(b.column(text_column), "").to_pylist()
        ids = b.column(id_column).to_numpy(zero_copy_only=False)
        out_lines: list[str] = []
        out_ids: list[int] = []
        out_ln: list[int] = []
        for did, t in zip(ids, texts):
            toks = t.split(" ")
            n = (len(toks) + w - 1) // w
            for ln in range(n):
                out_lines.append(" ".join(toks[ln * w : ln * w + w]))
                out_ids.append(int(did))
                out_ln.append(ln)
        lines = np.asarray(out_lines, dtype=object)
        h = pd.util.hash_array(lines)
        return pa.table(
            {
                "line": pa.array(out_lines, pa.string()),
                id_column: pa.array(out_ids, pa.int64()),
                "line_no": pa.array(out_ln, pa.int64()),
                "__lhash": pa.array(h, pa.uint64()),
                "__lbucket": pa.array((h % np.uint64(N_BUCKETS)).astype(np.int32)),
            }
        )

    exploded = ds.map_batches(explode_lines, batch_format="pyarrow")

    def keep_first(group: pa.Table) -> pa.Table:
        if len(group) == 0:
            return group.drop_columns(["__lhash", "__lbucket"])
        order = pc.sort_indices(
            group,
            sort_keys=[
                ("__lhash", "ascending"),
                ("line", "ascending"),
                (id_column, "ascending"),
                ("line_no", "ascending"),
            ],
        )
        g = group.take(order)
        h = g.column("__lhash").to_numpy(zero_copy_only=False)
        keep = np.empty(len(g), bool)
        keep[0] = True
        keep[1:] = h[1:] != h[:-1]
        ties = np.nonzero(~keep[1:])[0] + 1
        if len(ties):
            vcol = g.column("line")
            for i in ties:
                keep[i] = vcol[int(i)].as_py() != vcol[int(i) - 1].as_py()
        return g.filter(pa.array(keep)).drop_columns(["__lhash", "__lbucket"])

    kept = exploded.groupby("__lbucket").map_groups(keep_first, batch_format="pyarrow")

    def add_id_bucket(b: pa.Table) -> pa.Table:
        ids = b.column(id_column).to_numpy(zero_copy_only=False)
        return b.append_column(
            "__dbucket",
            pa.array((ids % N_BUCKETS).astype(np.int32)),
        )

    def reassemble(group: pa.Table) -> pa.Table:
        if len(group) == 0:
            return pa.table(
                {
                    id_column: pa.array([], pa.int64()),
                    out_column: pa.array([], pa.string()),
                }
            )
        order = pc.sort_indices(
            group, sort_keys=[(id_column, "ascending"), ("line_no", "ascending")]
        )
        g = group.take(order)
        ids = g.column(id_column).to_numpy(zero_copy_only=False)
        lines = g.column("line").to_pylist()
        # run boundaries over the sorted ids → one join per document
        starts = np.nonzero(np.r_[True, ids[1:] != ids[:-1]])[0]
        ends = np.r_[starts[1:], len(ids)]
        out_ids = ids[starts]
        texts = [" ".join(lines[s:e]) for s, e in zip(starts, ends)]
        return pa.table(
            {
                id_column: pa.array(out_ids, pa.int64()),
                out_column: pa.array(texts, pa.string()),
            }
        )

    return (
        kept.map_batches(add_id_bucket, batch_format="pyarrow")
        .groupby("__dbucket")
        .map_groups(reassemble, batch_format="pyarrow")
    )


def novelty_scores(
    ds: "ray.data.Dataset",
    n: int = 8,
    column: str = "text",
    id_column: str = "doc_id",
) -> "ray.data.Dataset":
    """Per-document novelty: of a doc's DISTINCT space-delimited
    ``n``-grams, how many occur in NO other document — the complement of
    :func:`dup_ngram_docs` and the standard freshness/curation signal
    (prefer documents that add new content to the corpus). Same
    shuffle-light shape: per-doc distinct gram hashes → one groupby over
    gram buckets classifies run-length-1 grams as novel and emits
    (doc, total, novel) partials → one tiny per-doc sum. No text moves.
    Docs with fewer than ``n`` tokens emit no grams and are absent."""
    import pandas as pd

    from ray.data.aggregate import Sum

    from dedupe_ray.ops.text import _space_gram_hashes

    def grams_partial(batch: pa.Table) -> pa.Table:
        rid, gh = _space_gram_hashes(batch.column(column), n)
        ids = _one_chunk(batch.column(id_column))
        return pa.table(
            {
                id_column: pc.take(ids, pa.array(rid)),
                "ghash": pa.array(gh, pa.uint64()),
                "gbucket": pa.array(
                    (gh % np.uint64(N_BUCKETS)).astype(np.int32)
                ),
            }
        )

    exploded = ds.map_batches(grams_partial, batch_format="pyarrow")

    def novelty_partial(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                id_column: pa.array([], group.column(id_column).type),
                "total": pa.array([], pa.int64()),
                "novel": pa.array([], pa.int64()),
            }
        )
        if not len(group):
            return empty
        t = group.sort_by([("ghash", "ascending")])
        gh = t.column("ghash").to_numpy(zero_copy_only=False)
        change = gh[1:] != gh[:-1]
        run_starts = np.nonzero(np.concatenate(([True], change)))[0]
        run_lengths = np.diff(np.append(run_starts, len(gh)))
        is_novel = np.repeat(run_lengths == 1, run_lengths)
        ids = t.column(id_column).to_numpy(zero_copy_only=False)
        codes, uniques = pd.factorize(ids)
        total = np.bincount(codes, minlength=len(uniques)).astype(np.int64)
        novel = np.bincount(
            codes, weights=is_novel.astype(np.float64), minlength=len(uniques)
        ).astype(np.int64)
        return pa.table(
            {
                id_column: pa.array(uniques, group.column(id_column).type),
                "total": pa.array(total),
                "novel": pa.array(novel),
            }
        )

    return (
        exploded.groupby("gbucket")
        .map_groups(novelty_partial, batch_format="pyarrow")
        .groupby(id_column)
        .aggregate(
            Sum("total", alias_name="total_grams"),
            Sum("novel", alias_name="novel_grams"),
        )
    )


def dedup_cascade(
    ds: "ray.data.Dataset",
    text_column: str = "text",
    id_column: str = "doc_id",
    jaccard_threshold: float = 0.7,
) -> pa.Table:
    """The production dedup CASCADE, cheapest filter first — exact
    content-hash dedup, then MinHash-LSH near-dup grouping over the
    survivors — reported as a funnel (stage, docs_in, docs_removed,
    docs_out): the shape a 100-TB curation run uses because each stage
    only pays for what the previous one let through. Semantics pinned:
    exact keeps the min-id row per distinct text (:func:`exact_dedup`);
    near-dup keeps the min-id member of each LSH component
    (:func:`minhash_dedup`'s components, bytewise-string min). Counts
    are exact and parallelism-invariant; the survivor ID SET is
    deterministic (banding is hash-seeded, not random). Driver state:
    three integers — the survivor datasets stream throughout."""
    n0 = ds.count()
    exact = exact_dedup(ds, column=text_column, id_column=id_column).materialize()
    n1 = exact.count()

    groups = minhash_dedup(
        exact.select_columns([id_column, text_column]),
        jaccard_threshold=jaccard_threshold,
    )

    def loss_partial(t: pa.Table) -> pa.Table:
        import pandas as pd

        # bounded: t is one map_batches block (per-batch combiner partial)
        df = pd.DataFrame(
            {"component": t.column("component_id").to_pandas()}  # bounded: block
        )
        g = df.groupby("component").size().rename("n").reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    from ray.data.aggregate import Sum

    comp = (
        groups.map_batches(loss_partial, batch_format="pyarrow")
        .groupby("component")
        .aggregate(Sum("n", alias_name="n"))
    )
    removed_rows = comp.map_batches(
        lambda t: pa.table(
            {
                "r": pa.array(
                    pa.compute.cast(t.column("n"), pa.int64())
                    .to_numpy(zero_copy_only=False)
                    .astype(np.int64)
                    - 1
                )
            }
        ),
        batch_format="pyarrow",
    ).aggregate(Sum("r", alias_name="r"))
    near_removed = int(removed_rows["r"] or 0)
    return pa.table(
        {
            "stage": pa.array(["exact", "near_dup"], pa.string()),
            "docs_in": pa.array([n0, n1], pa.int64()),
            "docs_removed": pa.array([n0 - n1, near_removed], pa.int64()),
            "docs_out": pa.array([n1, n1 - near_removed], pa.int64()),
        }
    )


# Gear table for content-defined chunking: pinned splitmix64-style mix of
# the byte value — deterministic across processes, no RNG state.
def _gear_table() -> np.ndarray:
    z = (np.arange(256, dtype=np.uint64) + np.uint64(0x9E3779B97F4A7C15)) * np.uint64(
        0xBF58476D1CE4E5B9
    )
    z ^= z >> np.uint64(27)
    z *= np.uint64(0x94D049BB133111EB)
    z ^= z >> np.uint64(31)
    return z


_GEAR = _gear_table()


def gear_cdc_chunk_table(
    ds: "ray.data.Dataset",
    id_column: str = "doc_id",
    text_column: str = "text",
    mask_bits: int = 6,
) -> "ray.data.Dataset":
    """Content-defined chunking (the gear-hash family of LBFS/FastCDC —
    storage-level dedup): each document's UTF-8 bytes split at positions
    where the 64-byte rolling gear hash

        h_t = Σ_{k=0..63} GEAR[b_{t−k}] << k   (mod 2⁶⁴)

    has its low ``mask_bits`` bits zero and the position is ≥ 64 bytes
    into the document (so the window never crosses a document start and
    the cut points are a pure content function — insert a byte mid-file
    and only the neighboring chunks change, the property fixed-size
    blocks lack). Mean chunk ≈ 2^mask_bits bytes; no min-since-last-cut
    suppression (pinned: boundaries are position-independent, which
    keeps the operator embarrassingly parallel and layout-invariant).

    The rolling hash is NOT a per-byte Python loop: per batch all
    documents concatenate into one byte array and h computes as 64
    shifted vectorized adds; window contamination across document joins
    is impossible at any TESTED position because cuts below byte 64 are
    suppressed. Chunks key by (md5-prefix int64, length) — the
    persistable dedup index row — and the output table
    (chunk_hash, length, n) is the mergeable storage-dedup state:
    Σ length·n = corpus bytes, Σ length over rows = deduped bytes.
    Output size is bounded by DISTINCT chunks (the index itself, same
    scale class as inverted_index); summaries aggregate it further."""
    import hashlib

    from ray.data.aggregate import Sum

    if mask_bits < 1 or mask_bits > 30:
        raise ValueError("mask_bits must be in 1..30")
    mask = np.uint64((1 << mask_bits) - 1)

    def chunk_partial(t: pa.Table) -> pa.Table:
        texts = [
            (s or "").encode("utf-8") for s in t.column(text_column).to_pylist()
        ]
        if not texts:
            return pa.table(
                {
                    "chunk_hash": pa.array([], pa.int64()),
                    "length": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        lens = np.array([len(b) for b in texts], np.int64)
        blob = np.frombuffer(b"".join(texts), np.uint8)
        starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
        g = _GEAR[blob]
        h = np.zeros(len(blob), np.uint64)
        for k in range(64):
            if k >= len(blob):
                break
            h[k:] += g[: len(blob) - k] << np.uint64(k)
        pos = np.arange(len(blob), dtype=np.int64)
        doc_idx = np.searchsorted(starts, pos, side="right") - 1
        pos_in_doc = pos - starts[doc_idx]
        is_cut = ((h & mask) == 0) & (pos_in_doc >= 64)
        # a cut at t ends the chunk AT t (exclusive); chunk boundaries per
        # doc = [0, cuts..., len)
        counts: dict[tuple[int, int], int] = {}
        cut_pos = np.flatnonzero(is_cut)
        cut_doc = doc_idx[cut_pos]
        import numpy as _np

        per_doc_cuts = {
            int(d): pos_in_doc[cut_pos[cut_doc == d]]
            for d in _np.unique(cut_doc)
        }
        for i, b in enumerate(texts):
            bounds = [0, *map(int, per_doc_cuts.get(i, ())), len(b)]
            for lo, hi in zip(bounds, bounds[1:]):
                if hi <= lo:
                    continue
                piece = b[lo:hi]
                h64 = int.from_bytes(
                    hashlib.md5(piece).digest()[:8], "big", signed=True
                )
                key = (h64, hi - lo)
                counts[key] = counts.get(key, 0) + 1
        keys = list(counts)
        return pa.table(
            {
                "chunk_hash": pa.array([k[0] for k in keys], pa.int64()),
                "length": pa.array([k[1] for k in keys], pa.int64()),
                "n": pa.array([counts[k] for k in keys], pa.int64()),
            }
        )

    return (
        ds.map_batches(chunk_partial, batch_format="pyarrow")
        .groupby(["chunk_hash", "length"])
        .aggregate(Sum("n", alias_name="n"))
    )


def cdc_dedup_summary(chunk_table: "ray.data.Dataset") -> pa.Table:
    """Bounded reduce of :func:`gear_cdc_chunk_table`'s index: one row
    (total_chunks, uniq_chunks, total_bytes, uniq_bytes) — the
    storage-dedup ratio is total_bytes/uniq_bytes as an exact int pair
    (the num/den doctrine)."""
    from ray.data.aggregate import Sum

    def stat_partial(t: pa.Table) -> pa.Table:
        n = t.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
        ln = t.column("length").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "total_chunks": pa.array([int(n.sum())], pa.int64()),
                "uniq_chunks": pa.array([len(t)], pa.int64()),
                "total_bytes": pa.array([int((n * ln).sum())], pa.int64()),
                "uniq_bytes": pa.array([int(ln.sum())], pa.int64()),
            }
        )

    agg = (
        chunk_table.map_batches(stat_partial, batch_format="pyarrow")
        .aggregate(
            Sum("total_chunks", alias_name="total_chunks"),
            Sum("uniq_chunks", alias_name="uniq_chunks"),
            Sum("total_bytes", alias_name="total_bytes"),
            Sum("uniq_bytes", alias_name="uniq_bytes"),
        )
    )
    return pa.table({k: pa.array([int(v)], pa.int64()) for k, v in agg.items()})


def ngram_cosine_pairs(
    ds: "ray.data.Dataset",
    threshold_num: int = 1,
    threshold_den: int = 2,
    id_column: str = "doc_id",
    text_column: str = "text",
    n: int = 1,
    token_pattern: str | None = None,
    max_bucket: int = 200_000,
) -> "ray.data.Dataset":
    """EXACT cosine-similarity self-join over word-``n``-gram COUNT
    vectors: all pairs with ``dot(A,B)/sqrt(|A|²·|B|²) ≥ num/den``,
    decided entirely in int64 via the square-and-cross-multiply
    identity ``den²·dot² ≥ num²·‖A‖²·‖B‖²`` (dot ≥ 0 — counts are
    non-negative) — the multiset-sensitive near-dup metric next to
    :func:`ngram_jaccard_pairs` (sets) and :func:`containment_join`
    (directed): repetition-heavy templates that Jaccard scores low
    still land high on cosine. No float ever crosses a partition or
    engine boundary; outputs carry the exact (dot, norm_a2, norm_b2)
    triple (the num/den doctrine — callers divide).

    Shape: one explode of per-doc DISTINCT grams carrying (count,
    ‖doc‖²), within-run candidate pairs contributing ``c_a·c_b`` per
    shared gram, one pair groupby Sum = the exact dot product, local
    threshold filter. int64 bound: den²·dot² needs
    ``den·‖A‖·‖B‖ < 3·10⁹`` — cap document token counts upstream at
    web scale (the quadratic terms are intrinsic to exactness).
    Output: (id_a, id_b, dot, norm_a2, norm_b2), id_a < id_b."""
    import pandas as pd

    from ray.data.aggregate import Max, Sum

    word_re = re.compile(token_pattern) if token_pattern else _WORD
    tn2 = int(threshold_num) ** 2
    td2 = int(threshold_den) ** 2

    def explode(batch: pa.Table) -> pa.Table:
        ids = _one_chunk(pc.cast(batch.column(id_column), pa.string()))
        texts = batch.column(text_column).to_pylist()
        hs_all: list[np.ndarray] = []
        cs_all: list[np.ndarray] = []
        counts = np.zeros(len(texts), np.int64)
        norms = np.zeros(len(texts), np.int64)
        for i, txt in enumerate(texts):
            toks = word_re.findall((txt or "").lower())
            if not toks:
                hs_all.append(np.zeros(0, np.uint64))
                cs_all.append(np.zeros(0, np.int64))
                continue
            grams = [
                " ".join(toks[j : j + n])
                for j in range(max(1, len(toks) - n + 1))
            ]
            uniq, cnt = np.unique(np.asarray(grams, object), return_counts=True)
            hs = pd.util.hash_array(uniq)
            hs_all.append(hs)
            cs_all.append(cnt.astype(np.int64))
            counts[i] = len(hs)
            norms[i] = int((cnt.astype(np.int64) ** 2).sum())
        flat = np.concatenate(hs_all) if hs_all else np.zeros(0, np.uint64)
        flat_c = np.concatenate(cs_all) if cs_all else np.zeros(0, np.int64)
        parent = np.repeat(np.arange(len(texts), dtype=np.int64), counts)
        return pa.table(
            {
                "thash": pa.array(flat, pa.uint64()),
                "tbucket": pa.array(
                    (flat % np.uint64(N_BUCKETS)).astype(np.int32)
                ),
                "rid": ids.take(pa.array(parent)),
                "c": pa.array(flat_c),
                "n2": pa.array(norms[parent]),
            }
        )

    def run_pairs(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "id_a": pa.array([], pa.string()),
                "id_b": pa.array([], pa.string()),
                "prod": pa.array([], pa.int64()),
                "norm_a2": pa.array([], pa.int64()),
                "norm_b2": pa.array([], pa.int64()),
            }
        )
        if not len(group):
            return empty
        g = group.take(
            pc.sort_indices(
                group, sort_keys=[("thash", "ascending"), ("rid", "ascending")]
            )
        )
        h = g.column("thash").to_numpy(zero_copy_only=False)
        m = len(g)
        change = h[1:] != h[:-1] if m > 1 else np.zeros(0, bool)
        run_starts = np.nonzero(np.concatenate(([True], change)))[0]
        run_lengths = np.diff(np.append(run_starts, m))
        if int(run_lengths.max()) > max_bucket:
            raise ValueError(
                f"gram run of {int(run_lengths.max())} rows exceeds "
                f"max_bucket={max_bucket} — a stopword-like gram; "
                "lengthen n or pre-filter hot grams"
            )
        per = np.repeat(run_lengths, run_lengths)
        pos = np.arange(m) - np.repeat(run_starts, run_lengths)
        cnt = per - 1 - pos
        total = int(cnt.sum())
        if total == 0:
            return empty
        a_idx = np.repeat(np.arange(m), cnt)
        cum = np.concatenate(([0], np.cumsum(cnt)))[:-1]
        b_idx = a_idx + 1 + (
            np.arange(total, dtype=np.int64) - np.repeat(cum, cnt)
        )
        rid = g.column("rid").to_numpy(zero_copy_only=False)
        c = g.column("c").to_numpy(zero_copy_only=False).astype(np.int64)
        n2 = g.column("n2").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "id_a": pa.array(rid[a_idx], pa.string()),
                "id_b": pa.array(rid[b_idx], pa.string()),
                "prod": pa.array(c[a_idx] * c[b_idx]),
                "norm_a2": pa.array(n2[a_idx]),
                "norm_b2": pa.array(n2[b_idx]),
            }
        )

    dots = (
        ds.map_batches(explode, batch_format="pyarrow")
        .groupby("tbucket")
        .map_groups(run_pairs, batch_format="pyarrow")
        .groupby(["id_a", "id_b"])
        .aggregate(
            Sum("prod", alias_name="dot"),
            Max("norm_a2", alias_name="norm_a2"),
            Max("norm_b2", alias_name="norm_b2"),
        )
    )

    def keep(b: pa.Table) -> pa.Table:
        dot = b.column("dot").to_numpy(zero_copy_only=False).astype(np.int64)
        na = b.column("norm_a2").to_numpy(zero_copy_only=False).astype(np.int64)
        nb = b.column("norm_b2").to_numpy(zero_copy_only=False).astype(np.int64)
        mask = pa.array(td2 * dot * dot >= tn2 * na * nb)
        return b.filter(mask)

    return dots.map_batches(keep, batch_format="pyarrow")


def exact_dedup_mapping(
    ds: "ray.data.Dataset", column: str = "text", id_column: str = "doc_id"
) -> "ray.data.Dataset":
    """Provenance side of :func:`exact_dedup`: the (dropped_id →
    kept_id) mapping for every row the dedup removes — the audit table
    a compliance pipeline keeps next to the deduped corpus ("this row
    was dropped BECAUSE of that survivor"), and the redirect table
    downstream joins consult. Same bucketed shuffle and keep-min-id
    semantics as exact_dedup (sort per bucket, run-sliced first-of-run
    = survivor, every other run member emits one mapping row; hash-
    collision ties resolved on the value column identically). Output:
    (dropped_id, kept_id) — empty when the corpus is duplicate-free."""
    def _bucketize(b: pa.Table) -> pa.Table:
        b = add_content_hash(b, column)
        h = b.column("content_hash").to_numpy(zero_copy_only=False)
        return b.append_column(
            "hbucket", pa.array((h % np.uint64(N_BUCKETS)).astype(np.int32))
        )

    hashed = ds.map_batches(_bucketize, batch_format="pyarrow")

    def _emit_mapping(group: pa.Table) -> pa.Table:
        id_type = group.schema.field(id_column).type
        empty = pa.table(
            {
                "dropped_id": pa.array([], id_type),
                "kept_id": pa.array([], id_type),
            }
        )
        if len(group) == 0:
            return empty
        order = pc.sort_indices(
            group,
            sort_keys=[
                ("content_hash", "ascending"),
                (column, "ascending"),
                (id_column, "ascending"),
            ],
        )
        g = group.take(order)
        h = g.column("content_hash").to_numpy(zero_copy_only=False)
        head = np.empty(len(g), bool)
        head[0] = True
        head[1:] = h[1:] != h[:-1]
        ties = np.nonzero(~head[1:])[0] + 1
        if len(ties):
            vcol = g.column(column)
            for i in ties:
                head[i] = vcol[int(i)].as_py() != vcol[int(i) - 1].as_py()
        if head.all():
            return empty
        pos = np.arange(len(g), dtype=np.int64)
        run_start = np.maximum.accumulate(np.where(head, pos, -1))
        dropped = ~head
        ids = g.column(id_column)
        return pa.table(
            {
                "dropped_id": ids.filter(pa.array(dropped)),
                "kept_id": ids.take(pa.array(run_start[dropped])),
            }
        )

    return hashed.groupby("hbucket").map_groups(
        _emit_mapping, batch_format="pyarrow"
    )
