"""Text-analysis stages for large-scale training-data pipelines.

All are single-pass ``map_batches`` transforms. Stateful pieces (compiled
regexes, stopword tables, n-gram profiles) live in callable-class actors so
setup runs once per actor, not per batch.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

_WORD = re.compile(r"[\w']+", re.U)
# a BPE-ish tokenizer regex (GPT-2 style, simplified): words, numbers,
# punctuation runs, whitespace collapsed
_BPE_ISH = re.compile(r"'s|'t|'re|'ve|'m|'ll|'d| ?[a-zA-Z]+| ?\d+| ?[^\sa-zA-Z\d]+")

# tiny per-language stopword profiles for the n-gram/stopword language
# heuristic (public-knowledge wordlists, top function words)
_LANG_PROFILES: dict[str, set[str]] = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that", "it", "for", "was", "with"},
    "de": {"der", "die", "das", "und", "ist", "von", "mit", "den", "für", "auf", "ein", "nicht"},
    "es": {"el", "la", "de", "que", "y", "en", "un", "por", "con", "los", "del", "se"},
    "fr": {"le", "la", "de", "et", "les", "des", "en", "un", "du", "une", "que", "est"},
    "pl": {"i", "w", "na", "z", "do", "się", "nie", "jest", "to", "że", "po", "od"},
    "zh": set(),  # no-space languages fall through to the charset heuristic
}


def _tokenize_batch(col) -> tuple[pa.Array, np.ndarray, np.ndarray]:
    """Lowercased \\w-ish tokens for a whole batch: (flat token array,
    per-row offsets, per-row token counts) — one Arrow kernel chain, no
    python row loop."""
    import pyarrow.compute as pc

    lower = pc.utf8_lower(pc.fill_null(col, ""))
    toks = pc.split_pattern_regex(lower, r"[^\p{L}\p{N}']+")  # RE2: \w is ASCII-only
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    # split produces empty-string tokens at value edges; they match no
    # stopword and count handling below treats them explicitly
    offsets = np.asarray(toks.offsets.to_numpy(zero_copy_only=False), np.int64)
    counts = offsets[1:] - offsets[:-1]
    return toks.flatten(), offsets, counts


def _per_row_sums(values: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """Sum `values` (aligned with the flat token array) per row."""
    if len(values) == 0:
        return np.zeros(len(offsets) - 1, np.int64)
    starts = np.minimum(offsets[:-1], len(values) - 1)
    out = np.add.reduceat(values, starts)
    out[offsets[:-1] == offsets[1:]] = 0
    return out


class LanguageId:
    """Stopword + charset language heuristic; actor-pool stage.

    Output column ``lang_pred`` (ISO-2 or 'und'). Fully vectorized: one
    Arrow tokenize per batch, one ``is_in`` + reduceat per language
    profile; the CJK charset check is a vectorized codepoint-range count."""

    def __init__(self) -> None:
        import pyarrow.compute as pc

        self.profiles = {
            lang: pa.array(sorted(stops)) for lang, stops in _LANG_PROFILES.items() if stops
        }
        self._pc = pc

    def __call__(self, batch: pa.Table) -> pa.Table:
        pc = self._pc
        col = batch.column("text")
        n = len(batch)
        flat, offsets, _ = _tokenize_batch(col)
        hit_matrix = np.zeros((len(self.profiles), n), np.int64)
        langs = list(self.profiles)
        for i, lang in enumerate(langs):
            hits = pc.is_in(flat, value_set=self.profiles[lang])
            hv = pc.fill_null(hits, False).to_numpy(zero_copy_only=False).astype(np.int64)
            hit_matrix[i] = _per_row_sums(hv, offsets)
        best_idx = hit_matrix.argmax(axis=0)
        best_hits = hit_matrix.max(axis=0)
        # CJK: any codepoint in the unified-ideograph block, checked over the
        # first 200 chars only (a long Latin text quoting one CJK character
        # must not flip to 'zh' — preserves the round-1 prefix semantics).
        zh_counts = pc.count_substring_regex(
            pc.utf8_slice_codeunits(pc.fill_null(col, ""), 0, 200), "[一-鿿]"
        ).to_numpy(zero_copy_only=False)
        preds = np.where(
            zh_counts > 0,
            "zh",
            np.where(best_hits > 0, np.asarray(langs, object)[best_idx], "und"),
        )
        return batch.append_column("lang_pred", pa.array(preds.tolist(), pa.string()))


class QualityScore:
    """Heuristic document-quality features (length, punctuation ratio,
    stopword ratio, mean word length) + a combined score in [0,1] —
    the standard pre-training corpus filters (C4/Gopher-style rules,
    public). Fully vectorized: Arrow tokenize + regex counts + reduceat.

    ``exact_rational=True`` computes the combined score as ONE float64
    division of exact integer numerator/denominator products instead of
    the float32 per-factor chain — value-identical math, but bit-exactly
    reproducible in ANSI SQL (the driver oracle's requirement); the
    factor clips become integer min/max: score =
    (min(max(w−5,0),45) · (c−min(max(5p−c,0),c)) · (10w'−min(|L−5w'|,5w')))
    / (450·c·w') with w'=max(w,1), c=max(chars,1), L=Σ token lengths."""

    def __init__(self, exact_rational: bool = False) -> None:
        stops = _LANG_PROFILES["en"] | _LANG_PROFILES["de"] | _LANG_PROFILES["es"]
        self.stops = pa.array(sorted(stops))
        self.exact_rational = exact_rational

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        col = pc.fill_null(batch.column("text"), "")
        n = len(batch)
        n_chars = pc.utf8_length(col).to_numpy(zero_copy_only=False).astype(np.int64)
        flat, offsets, _ = _tokenize_batch(batch.column("text"))
        tok_lens = pc.utf8_length(flat).to_numpy(zero_copy_only=False).astype(np.int64)
        nonempty = (tok_lens > 0).astype(np.int64)
        n_words = _per_row_sums(nonempty, offsets).astype(np.int32)
        len_sums = _per_row_sums(tok_lens, offsets)
        is_stop = pc.fill_null(pc.is_in(flat, value_set=self.stops), False)
        stop_hits = _per_row_sums(
            is_stop.to_numpy(zero_copy_only=False).astype(np.int64), offsets
        )
        n_punct = pc.count_substring_regex(col, r"[^\p{L}\p{N}\s]").to_numpy(zero_copy_only=False)
        denom_c = np.maximum(n_chars, 1)
        denom_w = np.maximum(n_words, 1)
        punct_ratio = (n_punct / denom_c).astype(np.float32)
        punct_ratio[n_chars == 0] = 0.0
        stop_ratio = (stop_hits / denom_w).astype(np.float32)
        mean_word_len = (len_sums / denom_w).astype(np.float32)
        mean_word_len[n_words == 0] = 0.0
        stop_ratio[n_words == 0] = 0.0
        if self.exact_rational:
            w64 = n_words.astype(np.int64)
            wd = denom_w.astype(np.int64)
            cd = denom_c.astype(np.int64)
            p64 = n_punct.astype(np.int64)
            n1 = np.minimum(np.maximum(w64 - 5, 0), 45)
            n2 = cd - np.minimum(np.maximum(5 * p64 - cd, 0), cd)
            n3 = 10 * wd - np.minimum(np.abs(len_sums - 5 * wd), 5 * wd)
            score = ((n1 * n2 * n3).astype(np.float64)
                     / (450 * cd * wd).astype(np.float64))
        else:
            ok_len = np.clip((n_words - 5) / 45.0, 0, 1)
            ok_punct = 1.0 - np.clip((punct_ratio - 0.2) * 5, 0, 1)
            ok_wordlen = 1.0 - np.clip(np.abs(mean_word_len - 5.0) / 5.0, 0, 1) * 0.5
            score = (ok_len * ok_punct * ok_wordlen).astype(np.float32)
        for name, c in [
            ("q_n_words", pa.array(n_words, pa.int32())),
            ("q_punct_ratio", pa.array(punct_ratio, pa.float32())),
            ("q_stop_ratio", pa.array(stop_ratio, pa.float32())),
            ("q_mean_word_len", pa.array(mean_word_len, pa.float32())),
            (
                "quality_score",
                pa.array(
                    score, pa.float64() if self.exact_rational else pa.float32()
                ),
            ),
        ]:
            batch = batch.append_column(name, c)
        return batch


def token_count_batch(batch: pa.Table, mode: str = "whitespace") -> pa.Table:
    """Token counting: 'whitespace' (vectorized arrow split) or 'bpe_ish'
    (compiled GPT-2-style regex). Adds ``n_tokens: int32``."""
    import pyarrow.compute as pc

    col = pc.fill_null(batch.column("text"), "")
    if mode == "whitespace":
        counts = pc.list_value_length(pc.split_pattern_regex(col, r"\s+"))
        counts = pc.cast(counts, pa.int32())
    else:
        counts = pa.array(
            [len(_BPE_ISH.findall(t)) for t in col.to_pylist()], pa.int32()
        )
    return batch.append_column("n_tokens", counts)


_FNV_PRIME = np.uint64(1099511628211)
_FNV_OFFSET = np.uint64(14695981039346656037)


def _fnv1a(data: bytes) -> np.uint64:
    h = _FNV_OFFSET
    for b in data:
        h = np.uint64((int(h) ^ b) * int(_FNV_PRIME) & 0xFFFFFFFFFFFFFFFF)
    return h


def fingerprint_batch(batch: pa.Table, window: int = 8) -> pa.Table:
    """Document fingerprinting via winnowed rolling hashes (Rabin-Karp over
    byte windows, min-sampled — the standard MOSS/winnowing scheme, public).
    Adds ``fingerprint: uint64`` (min-hash of windows — content-stable,
    whitespace-insensitive).

    The FNV pass is vectorized across all windows of a document
    (sliding_window_view + ``window`` fused xor-multiply vector ops) —
    O(window) numpy kernels per doc instead of O(doc_len) python byte
    loops."""
    texts = batch.column("text").to_pylist()
    out = np.zeros(len(texts), np.uint64)
    with np.errstate(over="ignore"):  # uint64 wraparound is the algorithm
        for i, t in enumerate(texts):
            s = "".join((t or "").lower().split()).encode()
            if len(s) < window:
                out[i] = _fnv1a(s)
                continue
            arr = np.frombuffer(s, np.uint8)
            win = np.lib.stride_tricks.sliding_window_view(arr, window)
            h = np.full(len(win), _FNV_OFFSET, np.uint64)
            for k in range(window):
                h = (h ^ win[:, k].astype(np.uint64)) * _FNV_PRIME
            out[i] = h.min()
    return batch.append_column("fingerprint", pa.array(out, pa.uint64()))


def text_stats(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Grouped corpus stats by (lang, source): docs, total chars — the
    pre-aggregated (combiner) pattern: per-batch partials then a tiny
    groupby."""
    from ray.data.aggregate import Count, Mean, Sum

    def partials(batch: pa.Table) -> pd.DataFrame:
        df = batch.select(["lang", "source", "n_chars"]).to_pandas()
        g = df.groupby(["lang", "source"], as_index=False).agg(
            docs=("n_chars", "size"), chars=("n_chars", "sum")
        )
        return g

    part = ds.map_batches(partials, batch_format="pyarrow")
    return part.groupby(["lang", "source"]).aggregate(
        Sum("docs", alias_name="docs"), Sum("chars", alias_name="chars")
    )


# PII/noise scrub presets — RE2 syntax (pyarrow.compute and DuckDB both run
# RE2, so the same pattern string behaves identically on both sides of the
# oracle). Applied sequentially in list order.
PII_RULES: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("url", r"https?://[^\s]+", "<URL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
]


def scrub_text_batch(
    batch: pa.Table,
    column: str = "text",
    rules: list[tuple[str, str, str]] | None = None,
    out_column: str = "scrubbed",
    with_counts: bool = True,
) -> pa.Table:
    """Training-data hygiene: replace PII/noise spans (emails, URLs, IPs by
    default) with typed placeholders — fully vectorized
    ``pc.replace_substring_regex`` per rule, no Python row loop. When
    ``with_counts``, also emits ``n_<rule>`` match counts measured on the
    ORIGINAL text (so counts are rule-order independent); replacements
    apply sequentially in rule order."""
    import pyarrow.compute as pc

    rules = PII_RULES if rules is None else rules
    col = batch.column(column)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    out = batch
    scrubbed = col
    for name, pattern, replacement in rules:
        if with_counts:
            out = out.append_column(
                f"n_{name}",
                pc.cast(pc.count_substring_regex(col, pattern), pa.int64()),
            )
        scrubbed = pc.replace_substring_regex(scrubbed, pattern, replacement)
    return out.append_column(out_column, scrubbed)


def normalize_text_batch(
    batch: pa.Table,
    column: str = "text",
    out_column: str = "norm_text",
) -> pa.Table:
    """Canonical text normalization for dedup keys / training corpora:
    Unicode NFC → lowercase → collapse whitespace runs to one space → trim.
    Lower/collapse/trim are Arrow kernels (RE2, matching DuckDB's
    ``lower``/``regexp_replace`` bit-for-bit). NFC runs as ONE
    ``unicodedata.normalize`` C call per batch via the NUL-join trick —
    pyarrow 16's ``utf8_normalize(form="NFC")`` does NOT compose (measured:
    ``e+U+0301`` stays decomposed), so it can't match DuckDB's
    ``nfc_normalize``. NUL is a ccc=0 starter, i.e. a normalization
    barrier, so joining on it cannot merge or reorder across rows; rows
    that themselves contain NUL fall back to per-row normalize.
    Row-local — compose with ``exact_dedup`` on the output for normalized
    exact dedup."""
    import unicodedata

    import pyarrow.compute as pc

    col = batch.column(column)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    vals = pc.fill_null(col, "").to_pylist()
    joined = "\x00".join(vals)
    if joined.count("\x00") == max(len(vals) - 1, 0):
        parts = unicodedata.normalize("NFC", joined).split("\x00")
        if len(parts) != len(vals):  # normalization never changes NUL count,
            parts = [unicodedata.normalize("NFC", v) for v in vals]  # but belt+braces
    else:
        parts = [unicodedata.normalize("NFC", v) for v in vals]
    norm = pc.utf8_lower(pa.array(parts, pa.string()))
    norm = pc.replace_substring_regex(norm, r"\s+", " ")
    # trim ASCII space only — RE2 \s is ASCII, so edges are plain spaces
    # after the collapse, and DuckDB's trim() is space-only too
    norm = pc.utf8_trim(norm, " ")
    return batch.append_column(out_column, norm)


def repetition_stats_batch(batch: pa.Table, column: str = "text") -> pa.Table:
    """Gopher-style repetition signals per document (Rae et al. 2021 §A1.1,
    adapted to token granularity — this corpus has no line breaks):
    ``dup_token_frac`` = (n_tokens − n_distinct)/n_tokens and
    ``top_token_frac`` = count(most frequent token)/n_tokens. Zero-token
    docs emit zeros. Row-local, fully vectorized (one factorize + bincounts
    per batch, no Python row loop)."""
    ids = np.arange(len(batch), dtype=np.int64)
    flat, offsets, counts = _tokenize_batch(batch.column(column))
    row_ids = np.repeat(ids, counts)
    toks = np.asarray(flat.to_pylist(), object)
    mask = toks != ""
    rows = row_ids[mask]
    codes = pd.factorize(toks[mask])[0].astype(np.int64)
    n_tokens = np.bincount(rows, minlength=len(batch)).astype(np.int64)
    vocab = int(codes.max()) + 1 if len(codes) else 1
    pair_keys, pair_counts = np.unique(rows * vocab + codes, return_counts=True)
    pair_rows = pair_keys // vocab
    n_distinct = np.bincount(pair_rows, minlength=len(batch)).astype(np.int64)
    max_c = np.zeros(len(batch), np.int64)
    np.maximum.at(max_c, pair_rows, pair_counts)
    denom = np.maximum(n_tokens, 1).astype(np.float64)
    dup = (n_tokens - n_distinct) / denom
    top = max_c / denom
    return (
        batch.append_column("n_tokens", pa.array(n_tokens))
        .append_column("n_distinct", pa.array(n_distinct))
        .append_column("dup_token_frac", pa.array(dup))
        .append_column("top_token_frac", pa.array(top))
    )


def term_counts(
    ds: "ray.data.Dataset",
    column: str = "text",
    top_n: int = 50,
) -> "ray.data.Dataset":
    """Corpus-wide term frequencies, top-``top_n`` (count desc, token asc —
    fully deterministic at the cut). The combiner pattern: per-batch partial
    counts (one factorize per batch) shrink the shuffle to vocab-sized
    partials, the groupby sums them, and the final sort+limit runs on the
    aggregated vocabulary — never on the corpus."""
    from ray.data.aggregate import Sum

    def partial_counts(batch: pa.Table) -> pa.Table:
        flat, _, _ = _tokenize_batch(batch.column(column))
        toks = np.asarray(flat.to_pylist(), object)
        toks = toks[toks != ""]
        codes, uniques = pd.factorize(toks)
        cnt = np.bincount(codes, minlength=len(uniques)).astype(np.int64)
        return pa.table(
            {"token": pa.array(uniques, pa.string()), "cnt": pa.array(cnt)}
        )

    agg = (
        ds.map_batches(partial_counts, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("cnt", alias_name="cnt"))
    )
    return agg.sort(["cnt", "token"], descending=[True, False]).limit(top_n)


def tfidf_top_terms(
    ds: "ray.data.Dataset",
    column: str = "text",
    id_column: str = "doc_id",
    k: int = 5,
    n_docs: int | None = None,
    vocab_limit: int = 50_000_000,
    strategy: str = "auto",
) -> "ray.data.Dataset":
    """Per-document top-``k`` TF-IDF keywords (keyword extraction — the
    classic training-data tagging/retrieval feature).

    Shape: document frequencies reduce per batch (distinct doc-token
    pairs → vocab-sized partials), one small groupby, and the resulting
    idf table is broadcast once via ``ray.put`` — the scoring pass is
    then shuffle-free: per batch, tf per (row, token) via one factorize +
    ``np.unique``, score ``tf · ln((N+1)/(df+1))``, top-k per row at
    (score desc, token asc). The guard raises above ``vocab_limit``
    (beyond that a hash join on tokens is the scale path).

    Output: (id_column, token, rnk) — scores are float and deliberately
    not emitted so the result hashes exactly against a SQL oracle; the
    ORDER itself is float-stable because both engines compute the same
    IEEE double expression.

    ``strategy``: 'broadcast' (default below ``vocab_limit``) ships the
    idf table once via ``ray.put``; 'join' is the 100-TB path — tf rows
    bucket by token hash, the df merge and the per-doc top-k each run
    inside one bucketed groupby (token rows shuffle, text never does).
    'auto' routes by a corpus-sampled vocabulary estimate. Both paths
    produce identical rows (verified by a forced-join parity test)."""
    import ray
    from ray.data.aggregate import Sum

    if n_docs is None:
        n_docs = ds.count()

    def _batch_pairs(batch: pa.Table):
        """(row_id, unique_tokens, pair_row, pair_code, pair_tf) for a batch."""
        flat, offsets, _ = _tokenize_batch(batch.column(column))
        toks = np.asarray(flat.to_pylist(), object)
        rid = np.repeat(np.arange(len(batch), dtype=np.int64), np.diff(offsets))
        keep = toks != ""
        toks, rid = toks[keep], rid[keep]
        codes, uniques = pd.factorize(toks)
        if len(uniques) == 0:
            z = np.zeros(0, np.int64)
            return uniques, z, z, z
        pair = rid * len(uniques) + codes
        upair, tf = np.unique(pair, return_counts=True)
        return uniques, upair // len(uniques), upair % len(uniques), tf.astype(np.int64)

    def df_partial(batch: pa.Table) -> pa.Table:
        uniques, _, ucode, _ = _batch_pairs(batch)
        cnt = np.bincount(ucode, minlength=len(uniques)).astype(np.int64)
        return pa.table(
            {"token": pa.array(uniques, pa.string()), "df": pa.array(cnt)}
        )

    df_ds = (
        ds.map_batches(df_partial, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("df", alias_name="df"))
        .materialize()  # vocab-sized; consumed twice on the join path
    )
    n_vocab = df_ds.count()
    if strategy == "auto":
        strategy = "broadcast" if n_vocab <= vocab_limit else "join"
    if strategy == "join":
        return _tfidf_topk_join(ds, df_ds, column, id_column, k, n_docs, _batch_pairs)
    if n_vocab > vocab_limit:
        raise ValueError(
            f"vocabulary ({n_vocab}) exceeds broadcast limit "
            f"{vocab_limit}; pass strategy='join'"
        )
    df_tbl = df_ds.to_pandas()  # bounded: vocab-sized, guarded above
    vocab = df_tbl["token"].to_numpy(dtype=object)
    order = np.argsort(vocab)
    ref = ray.put((vocab[order], df_tbl["df"].to_numpy(np.int64)[order]))

    def topk(batch: pa.Table) -> pa.Table:
        vocab_sorted, dfs = ray.get(ref)
        uniques, urow, ucode, tf = _batch_pairs(batch)
        ids = batch.column(id_column)
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        if len(uniques) == 0:
            return pa.table(
                {
                    id_column: ids.take(pa.array([], pa.int64())),
                    "token": pa.array([], pa.string()),
                    "rnk": pa.array([], pa.int64()),
                }
            )
        idf = np.log((n_docs + 1.0) / (dfs[np.searchsorted(vocab_sorted, uniques)] + 1.0))
        sdf = pd.DataFrame(
            {
                "row": urow,
                "token": uniques[ucode],
                "score": tf.astype(np.float64) * idf[ucode],
            }
        ).sort_values(["row", "score", "token"], ascending=[True, False, True])
        row = sdf["row"].to_numpy()
        heads = np.flatnonzero(np.r_[True, row[1:] != row[:-1]])
        rnk = np.arange(len(row)) - np.repeat(heads, np.diff(np.append(heads, len(row)))) + 1
        keep = rnk <= k
        return pa.table(
            {
                id_column: ids.take(pa.array(row[keep])),
                "token": pa.array(sdf["token"].to_numpy()[keep], pa.string()),
                "rnk": pa.array(rnk[keep], pa.int64()),
            }
        )

    return ds.map_batches(topk, batch_format="pyarrow")


def _tfidf_topk_join(
    ds: "ray.data.Dataset",
    df_ds: "ray.data.Dataset",
    column: str,
    id_column: str,
    k: int,
    n_docs: int,
    batch_pairs,
) -> "ray.data.Dataset":
    """100-TB tfidf path: no broadcast — tf rows (id, token, tf) join the
    df table inside one bucketed token-hash groupby
    (:func:`dedupe_ray.joins.bucketed_lookup_join`), then the per-doc
    top-k runs inside one bucketed id-hash groupby. Token rows shuffle
    twice; document text never does. Produces exactly the broadcast
    path's rows (same IEEE score expression, same tie order)."""
    from dedupe_ray.joins import bucketed_lookup_join

    def tf_rows(batch: pa.Table) -> pa.Table:
        uniques, urow, ucode, tf = batch_pairs(batch)
        ids = batch.column(id_column)
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        return pa.table(
            {
                id_column: ids.take(pa.array(urow)),
                "token": pa.array(uniques[ucode] if len(uniques) else [], pa.string()),
                "tf": pa.array(tf, pa.int64()),
            }
        )

    tf_ds = ds.map_batches(tf_rows, batch_format="pyarrow")
    joined = bucketed_lookup_join(tf_ds, df_ds, "token", "token", ["df"])

    from dedupe_ray.ops.tabular import _bucket_hash_col
    from dedupe_ray.blocking import N_BUCKETS

    def bucketize(b: pa.Table) -> pa.Table:
        return b.append_column(
            "__dbkt", _bucket_hash_col(b.column(id_column), N_BUCKETS)
        )

    def topk_in_bucket(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                id_column: pa.array([], g.column(id_column).type),
                "token": pa.array([], pa.string()),
                "rnk": pa.array([], pa.int64()),
            }
        )
        if not len(g):
            return empty
        df = g.to_pandas()
        df["score"] = df["tf"].to_numpy(np.float64) * np.log(
            (n_docs + 1.0) / (df["df"].to_numpy(np.int64) + 1.0)
        )
        df = df.sort_values(
            [id_column, "score", "token"], ascending=[True, False, True]
        )
        rid = df[id_column].to_numpy(object)
        heads = np.flatnonzero(np.r_[True, rid[1:] != rid[:-1]])
        rnk = (
            np.arange(len(rid))
            - np.repeat(heads, np.diff(np.append(heads, len(rid))))
            + 1
        )
        keep = rnk <= k
        return pa.table(
            {
                id_column: pa.array(rid[keep], g.column(id_column).type),
                "token": pa.array(df["token"].to_numpy(object)[keep], pa.string()),
                "rnk": pa.array(rnk[keep], pa.int64()),
            }
        )

    return (
        joined.map_batches(bucketize, batch_format="pyarrow")
        .groupby("__dbkt")
        .map_groups(
            lambda g: topk_in_bucket(g.drop_columns(["__dbkt"])),
            batch_format="pyarrow",
        )
    )


def _space_gram_hashes(col, n: int) -> tuple[np.ndarray, np.ndarray]:
    """Per-row DISTINCT space-delimited n-gram hashes for a whole batch.

    Tokenization is a plain split on a single space (DuckDB
    ``string_split(text, ' ')`` semantics — empty tokens from consecutive
    spaces are kept, no lowercasing), so an oracle can rebuild the exact
    same gram set with ``array_to_string(ts[i:i+n-1], ' ')``. Grams are
    64-bit hashes (fixed-key siphash per token via ``pd.util.hash_array``,
    FNV-style window combine): tokens contain no spaces, so token-sequence
    equality ≡ joined-string equality, and 64-bit collisions are
    negligible at any realistic corpus size.

    Returns ``(row_ids, ghash)`` — one entry per distinct gram per row,
    grouped by row. Fully vectorized: one Arrow split, one hash_array,
    ``n`` shifted combine ops, one lexsort.
    """
    row_ids, _, acc, _, _ = _space_gram_all(col, n)
    if len(acc) == 0:
        return row_ids, acc
    # distinct grams per row: lexsort by (row, hash), keep run heads
    order = np.lexsort((acc, row_ids))
    r, g = row_ids[order], acc[order]
    keep = np.concatenate(([True], (r[1:] != r[:-1]) | (g[1:] != g[:-1])))
    return r[keep], g[keep]


def _space_gram_all(
    col, n: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray, "pa.Array", np.ndarray]:
    """ALL space-delimited n-gram instances for a batch (not per-row
    distinct): ``(row_ids, start_pos_in_row, ghash, flat_tokens,
    token_offsets)`` — same tokenizer/hash contract as
    :func:`_space_gram_hashes`."""
    toks = pc.split_pattern(pc.fill_null(col, ""), " ")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    offsets = np.asarray(toks.offsets.to_numpy(zero_copy_only=False), np.int64)
    counts = offsets[1:] - offsets[:-1]
    flat = toks.flatten()
    z64, zu64 = np.zeros(0, np.int64), np.zeros(0, np.uint64)
    if len(flat) == 0:
        return z64, z64, zu64, flat, offsets
    h = pd.util.hash_array(np.asarray(flat.to_pylist(), object))
    nw = np.maximum(counts - (n - 1), 0)
    total = int(nw.sum())
    if total == 0:
        return z64, z64, zu64, flat, offsets
    row_ids = np.repeat(np.arange(len(counts), dtype=np.int64), nw)
    starts = np.repeat(offsets[:-1], nw)
    cum = np.concatenate(([0], np.cumsum(nw)))[:-1]
    pos = np.arange(total, dtype=np.int64) - np.repeat(cum, nw)
    s = starts + pos
    acc = np.zeros(total, np.uint64)
    C = np.uint64(1099511628211)
    for k in range(n):
        acc = (acc * C) ^ h[s + k]
    return row_ids, pos, acc, flat, offsets


def decontaminate(
    ds: "ray.data.Dataset",
    benchmark: "ray.data.Dataset",
    n: int = 13,
    column: str = "text",
    id_column: str = "doc_id",
    bench_gram_limit: int = 50_000_000,
) -> "ray.data.Dataset":
    """Benchmark-contamination tagging (the GPT-3/PaLM decontamination
    check, Brown et al. 2020 appx. C): a document is contaminated if it
    shares any space-delimited ``n``-gram with the benchmark corpus.

    Shape: the benchmark side is SMALL by definition (eval sets), so its
    distinct gram-hash set is reduced per-batch, pulled once, sorted, and
    broadcast via ``ray.put`` — every scoring task then does a vectorized
    ``searchsorted`` membership test per batch. No shuffle at any scale;
    the guard raises if the benchmark gram set exceeds
    ``bench_gram_limit`` (at which point this op is the wrong tool and a
    hash join on gram hashes is the scale path).

    Returns (id_column, matched_ngrams) for documents with ≥1 shared
    n-gram; callers exclude benchmark members themselves.
    """
    import ray

    def bench_partial(batch: pa.Table) -> pa.Table:
        _, gh = _space_gram_hashes(batch.column(column), n)
        return pa.table({"ghash": pa.array(np.unique(gh), pa.uint64())})

    parts = benchmark.map_batches(bench_partial, batch_format="pyarrow").to_pandas()
    bench_hashes = np.unique(parts["ghash"].to_numpy(dtype=np.uint64))
    if len(bench_hashes) > bench_gram_limit:
        raise ValueError(
            f"benchmark gram set ({len(bench_hashes)}) exceeds broadcast "
            f"limit {bench_gram_limit}; use a distributed hash join instead"
        )
    ref = ray.put(bench_hashes)

    def tag(batch: pa.Table) -> pa.Table:
        bench_sorted = ray.get(ref)
        rid, gh = _space_gram_hashes(batch.column(column), n)
        ids = batch.column(id_column)
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        if len(gh) == 0:
            hit = np.zeros(0, bool)
        else:
            idx = np.searchsorted(bench_sorted, gh)
            idx[idx >= len(bench_sorted)] = 0
            hit = len(bench_sorted) > 0
            hit = bench_sorted[idx] == gh if hit else np.zeros(len(gh), bool)
        matched = np.bincount(rid[hit], minlength=len(batch)).astype(np.int64)
        rows = np.nonzero(matched > 0)[0]
        return pa.table(
            {
                id_column: ids.take(pa.array(rows)),
                "matched_ngrams": pa.array(matched[rows]),
            }
        )

    return ds.map_batches(tag, batch_format="pyarrow")


def char_ngram_redundancy_batch(
    batch: pa.Table, column: str = "text", n: int = 8
) -> pa.Table:
    """Per-document distinct character-``n``-gram ratio — the
    SQL-expressible sibling of the zlib compression-ratio signal
    (repetitive text has few distinct n-grams; both are Gopher-family
    redundancy filters). ratio = |distinct n-byte windows| / |windows|,
    1.0 for docs shorter than ``n``; computed as ONE float64 division of
    exact integer counts, so the DuckDB oracle hashes exact.

    Vectorized per doc: the byte string's sliding windows are packed into
    one uint64 view (n ≤ 8) and counted with np.unique — no per-window
    Python work."""
    col = pc.fill_null(batch.column(column), "")
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if n > 8:
        raise ValueError("n must be <= 8 (windows are packed into uint64)")
    distinct = np.ones(len(col), np.int64)
    total = np.ones(len(col), np.int64)
    for i, buf in enumerate(col):
        raw = buf.as_py().encode("utf-8")
        if len(raw) < n:
            continue
        arr = np.frombuffer(raw, np.uint8)
        win = np.lib.stride_tricks.sliding_window_view(arr, n)
        packed = np.zeros(len(win), np.uint64)
        view = np.ascontiguousarray(win)
        for b in range(n):
            packed = (packed << np.uint64(8)) | view[:, b].astype(np.uint64)
        total[i] = len(packed)
        distinct[i] = len(np.unique(packed))
    ratio = distinct.astype(np.float64) / total.astype(np.float64)
    return batch.append_column("redundancy_ratio", pa.array(ratio))


def compression_ratio_batch(
    batch: pa.Table, column: str = "text", level: int = 6
) -> pa.Table:
    """Per-document zlib compression ratio (compressed/raw bytes) — the
    classic redundancy quality signal (highly repetitive or generated
    text compresses far below ~0.4; Gopher-family pipelines filter on
    it). One C zlib call per document (the work is inherently per-doc,
    like hashing); empty docs get ratio 1.0. Deterministic: fixed level,
    raw deflate stream, no timestamps (zlib format carries none).
    """
    import zlib

    col = pc.fill_null(batch.column(column), "")
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    ratios = np.ones(len(col), np.float64)
    for i, buf in enumerate(col):
        raw = buf.as_py().encode("utf-8")
        if raw:
            ratios[i] = len(zlib.compress(raw, level)) / len(raw)
    return batch.append_column("compression_ratio", pa.array(ratios))


def chunk_documents(
    ds: "ray.data.Dataset",
    chunk_tokens: int = 64,
    overlap: int = 16,
    column: str = "text",
    id_column: str = "doc_id",
) -> "ray.data.Dataset":
    """Token-window chunking — the embedding/RAG segmentation step:
    space-delimited tokens sliced into windows of ``chunk_tokens`` with
    ``overlap`` tokens carried between consecutive chunks (stride =
    chunk_tokens − overlap; last window may be shorter; empty docs emit
    nothing). Chunk starts are ``k·stride`` for k = 0..floor((n−1)/stride)
    — well-defined on both sides of the oracle, including the short-tail
    windows.

    Fully vectorized per batch: one Arrow split, numpy offset arithmetic
    to build the gather indices, one ``take`` + ListArray rebuild + one
    ``binary_join`` — no Python loop over rows or chunks.

    Returns (id_column, chunk_id, chunk_text, chunk_n_tokens).
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap

    def chunk(batch: pa.Table) -> pa.Table:
        col = pc.fill_null(batch.column(column), "")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        toks = pc.split_pattern(col, " ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        offsets = np.asarray(toks.offsets.to_numpy(zero_copy_only=False), np.int64)
        counts = offsets[1:] - offsets[:-1]
        flat = toks.flatten()
        # a fully-empty string is an empty doc (split('') yields [''])
        empty_doc = pc.equal(col, "").to_numpy(zero_copy_only=False)
        n_chunks = np.where(empty_doc, 0, (np.maximum(counts, 1) - 1) // stride + 1)
        total = int(n_chunks.sum())
        ids = batch.column(id_column)
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        if total == 0:
            return pa.table(
                {
                    id_column: ids.slice(0, 0),
                    "chunk_id": pa.array([], pa.int64()),
                    "chunk_text": pa.array([], pa.string()),
                    "chunk_n_tokens": pa.array([], pa.int64()),
                }
            )
        row_of_chunk = np.repeat(np.arange(len(counts)), n_chunks)
        cum = np.concatenate(([0], np.cumsum(n_chunks)))[:-1]
        chunk_id = np.arange(total, dtype=np.int64) - np.repeat(cum, n_chunks)
        start = chunk_id * stride
        end = np.minimum(start + chunk_tokens, counts[row_of_chunk])
        lens = end - start
        # gather indices: for each chunk, flat[row_start + start : row_start + end]
        g_starts = offsets[:-1][row_of_chunk] + start
        gcum = np.concatenate(([0], np.cumsum(lens)))
        pos = np.arange(int(lens.sum()), dtype=np.int64) - np.repeat(gcum[:-1], lens)
        gather = np.repeat(g_starts, lens) + pos
        gathered = flat.take(pa.array(gather))
        chunks_list = pa.LargeListArray.from_arrays(pa.array(gcum, pa.int64()), gathered)
        text_out = pc.binary_join(chunks_list, " ")
        return pa.table(
            {
                id_column: ids.take(pa.array(row_of_chunk)),
                "chunk_id": pa.array(chunk_id),
                "chunk_text": text_out,
                "chunk_n_tokens": pa.array(lens),
            }
        )

    return ds.map_batches(chunk, batch_format="pyarrow")


def split_sentences(
    ds: "ray.data.Dataset",
    column: str = "text",
    id_column: str = "doc_id",
) -> "ray.data.Dataset":
    """Sentence segmentation: one row per sentence (``id, sent_idx,
    sentence``), terminal punctuation PRESERVED.

    The boundary rule is deliberately a two-step RE2-compatible op chain —
    mark boundaries with ``regexp_replace('([.!?]) +', '\\1<RS>')``, then
    split on the record separator — because RE2 (pyarrow AND DuckDB) has
    no lookbehind; running the identical chain in both engines is what
    lets the driver oracle pin this op exactly. Fully vectorized: one
    regex pass + one split + offset flatten per batch."""
    import numpy as np
    import pyarrow.compute as pc

    RS = "\x1e"

    def split(batch: pa.Table) -> pa.Table:
        txt = pc.fill_null(batch.column(column), "")
        marked = pc.replace_substring_regex(
            txt, pattern=r"([.!?]) +", replacement=r"\1" + RS
        )
        parts = pc.split_pattern(marked, pattern=RS)
        if isinstance(parts, pa.ChunkedArray):
            parts = parts.combine_chunks()
        offsets = parts.offsets.to_numpy(zero_copy_only=False)
        counts = np.diff(offsets)
        ids = batch.column(id_column)
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        parent = np.repeat(np.arange(len(batch)), counts)
        idx = np.arange(int(counts.sum()), dtype=np.int64) - np.repeat(
            np.cumsum(counts) - counts, counts
        )
        return pa.table(
            {
                id_column: pc.take(ids, pa.array(parent)),
                "sent_idx": pa.array(idx.astype(np.int32)),
                "sentence": parts.flatten(),
            }
        )

    return ds.map_batches(split, batch_format="pyarrow")


def bm25_topk(
    ds: "ray.data.Dataset",
    query_terms: list[str],
    column: str = "text",
    id_column: str = "doc_id",
    top_n: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
) -> "ray.data.Dataset":
    """Okapi BM25 retrieval: rank every document against a fixed bag of
    query terms, return the ``top_n`` ids as (id, rnk) — the classic
    lexical-retrieval scorer (Robertson & Walker 1994; the Lucene
    ``k1=1.2, b=0.75`` defaults and its +1-inside-the-log idf variant,
    which keeps idf positive for df > n/2).

    Two shuffle-free passes over the corpus, scale-ready by shape:

    1. **stats** — per-batch combiner partials (doc count, total token
       length, per-query-term document frequency) reduced by one bounded
       ``Dataset.aggregate``; nothing corpus-sized moves.
    2. **score** — the handful of (N, avgdl, df_t) scalars ride the task
       closure; tf per term per row is one vectorized reduceat over the
       batch token stream; only rows matching ≥1 term are emitted, each
       batch pre-trims to its local top-``top_n``, and the global sort
       runs over ≤ top_n·n_batches rows.

    Scores are float64 but deliberately NOT emitted: the output is the
    RANK order (score desc, id asc), which hashes exactly against a SQL
    oracle because both engines evaluate the same IEEE-double expression
    with the same association (see oracle_sql()['bm25_search'])."""
    import math

    from ray.data.aggregate import Sum

    terms = [str(t) for t in query_terms]

    def _tf_matrix(batch: pa.Table):
        flat, offsets, _ = _tokenize_batch(batch.column(column))
        toks = np.asarray(flat.to_pylist(), object)
        dl = _per_row_sums((toks != "").astype(np.int64), offsets)
        tfs = [
            _per_row_sums((toks == t).astype(np.int64), offsets) for t in terms
        ]
        return dl, tfs

    def stats_partial(batch: pa.Table) -> pa.Table:
        dl, tfs = _tf_matrix(batch)
        row: dict = {
            "n": [len(batch)],
            "dlsum": [int(dl.sum())],
        }
        for i, tf in enumerate(tfs):
            row[f"df{i}"] = [int((tf > 0).sum())]
        return pa.table(row)

    aggs = [Sum("n", alias_name="n"), Sum("dlsum", alias_name="dlsum")] + [
        Sum(f"df{i}", alias_name=f"df{i}") for i in range(len(terms))
    ]
    st = ds.map_batches(stats_partial, batch_format="pyarrow").aggregate(*aggs)
    n_docs = int(st["n"])
    avgdl = int(st["dlsum"]) / n_docs  # exact-int operands → identical double
    dfs = [int(st[f"df{i}"]) for i in range(len(terms))]
    # idf per term: python doubles, same expression the oracle evaluates
    idfs = [math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5)) for df in dfs]

    def score_batch(batch: pa.Table) -> pa.Table:
        import pandas as pd

        dl_i, tfs = _tf_matrix(batch)
        dl = dl_i.astype(np.float64)
        dbase = 1.0 - b + b * dl / avgdl
        score = np.zeros(len(batch), np.float64)
        for idf, tf_i in zip(idfs, tfs):
            tf = tf_i.astype(np.float64)
            score = score + idf * ((k1 + 1.0) * tf / (tf + k1 * dbase))
        keep = score > 0.0
        sdf = pd.DataFrame(
            {
                id_column: np.asarray(
                    batch.column(id_column).to_pylist(), object
                )[keep],
                "score": score[keep],
            }
        ).sort_values(
            ["score", id_column], ascending=[False, True], kind="mergesort"
        ).head(top_n)
        return pa.Table.from_pandas(sdf, preserve_index=False)

    hits = (
        ds.map_batches(score_batch, batch_format="pyarrow")
        .sort(["score", id_column], descending=[True, False])
        .limit(top_n)
    )
    top = hits.to_pandas()  # bounded: ≤ top_n rows by construction
    import ray.data as rd

    if id_column not in top.columns:  # zero hits: Ray loses the empty schema
        id_type = ds.schema().base_schema.field(id_column).type
        return rd.from_arrow(
            pa.table({id_column: pa.array([], id_type),
                      "rnk": pa.array([], pa.int64())})
        )
    return rd.from_arrow(
        pa.table(
            {
                id_column: pa.array(top[id_column]),
                "rnk": pa.array(np.arange(1, len(top) + 1, dtype=np.int64)),
            }
        )
    )


# HTML entity decode order: named entities first, ampersand LAST — so a
# double-escaped "&amp;lt;" decodes to the literal "&lt;", not "<" (the
# standard single-pass chain; both engines apply the identical sequence).
_MARKUP_ENTITIES = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
]


def strip_markup(
    ds: "ray.data.Dataset",
    text_column: str = "text",
    out_column: str = "clean",
) -> "ray.data.Dataset":
    """Markup-strip stage (the boilerplate-removal primitive of every
    web-scrape → training-text pipeline): remove ``<...>`` tags with one
    RE2 pass (``<[^>]*>`` — attributes and all), THEN decode the common
    HTML entities with a fixed literal-replace chain (tags first so a
    decoded ``&lt;`` can never resurrect a strippable tag). Fully
    vectorized pyarrow kernels; zero shuffle; mirrors 1:1 to a SQL
    ``regexp_replace + replace`` chain for oracle checking."""

    def f(b: pa.Table) -> pa.Table:
        col = pc.replace_substring_regex(
            b.column(text_column), pattern="<[^>]*>", replacement=""
        )
        for ent, ch in _MARKUP_ENTITIES:
            col = pc.replace_substring(col, pattern=ent, replacement=ch)
        return b.append_column(out_column, col)

    return ds.map_batches(f, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Bigram language-model scoring (CCNet-style perplexity filter)
# ---------------------------------------------------------------------------
#
# Wikipedia-LM perplexity filtering (CCNet, Wenzek et al. 2020) is the
# classic corpus quality gate. This is the shuffle-light Ray shape: the
# model is TRAINED on the corpus itself in two bounded count passes and
# BROADCAST once; scoring is a third streaming pass. Log-probs are
# quantized to integer micro-nats (floor(1e6·ln p)) so per-document sums
# are exact integer arithmetic — order-free, parallelism-invariant, and
# engine-exact against a SQL oracle evaluating the same IEEE expression.


def _lm_tokens(col) -> tuple[np.ndarray, np.ndarray]:
    """lower → [a-z]+ runs (== regexp_extract_all(lower(x),'[a-z]+') in
    SQL) → (flat object array of tokens, per-row token counts)."""
    lower = pc.utf8_lower(pc.fill_null(col, ""))
    toks = pc.split_pattern_regex(lower, "[^a-z]+")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    offsets = np.asarray(toks.offsets.to_numpy(zero_copy_only=False), np.int64)
    flat = np.asarray(toks.flatten().to_pylist(), object)
    keep = flat != ""
    counts = _per_row_sums(keep.astype(np.int64), offsets)
    return flat[keep], counts


def lm_bigram_scores(
    ds: "ray.data.Dataset",
    column: str = "text",
    id_column: str = "doc_id",
    vocab_size: int = 1024,
) -> "ray.data.Dataset":
    """Per-document corpus-LM log-probability (add-one-smoothed bigram
    model over a capped vocabulary) → (id, n_tokens, logprob_micro).

    Three streaming passes, no corpus-sized shuffle:

    1. unigram counts (per-batch combiner partials → vocab-sized groupby
       Sum) → top-``vocab_size`` tokens by (count desc, token asc); the
       sort/limit runs on the DISTINCT-token table only. ids: 1..V by
       rank, 0 = <unk>, V+1 = BOS.
    2. bigram counts over the id space (combiner partials → ≤(V+2)·(V+1)
       groupby Sum), collected driver-side (bounded by the id-space
       square, asserted) and broadcast via ``ray.put`` together with the
       derived context totals ctx[prev] = Σ_cur cb[prev,cur].
    3. score: every position i contributes
       floor(1e6 · ln((cb[prev,cur]+1.0)/(ctx[prev]+(V+1.0)))) micro-nats
       (V+1 = the id-space outcomes 0..V; BOS is context-only)
       (prev of the first token is BOS); per-doc integer sum. Perplexity
       = exp(-logprob_micro / 1e6 / n_tokens).

    At 100 TB the broadcast model stays ≤ (V+2)² cells by construction;
    raise ``vocab_size`` consciously — the shuffle cost is unchanged (the
    count tables shuffle partials, never documents)."""
    import ray
    from ray.data.aggregate import Sum

    V = int(vocab_size)
    BOS = V + 1
    WIDTH = V + 2  # id-space stride for packed bigram keys

    def uni_partials(batch: pa.Table) -> pa.Table:
        flat, _ = _lm_tokens(batch.column(column))
        codes, uniques = pd.factorize(flat)
        cnt = np.bincount(codes, minlength=len(uniques)).astype(np.int64)
        return pa.table({"token": pa.array(uniques, pa.string()), "cnt": pa.array(cnt)})

    vocab_rows = (
        ds.map_batches(uni_partials, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("cnt", alias_name="cnt"))
        .sort(["cnt", "token"], descending=[True, False])
        .limit(V)
        .take_all()  # bounded: ≤ V rows
    )
    vtok = np.asarray([r["token"] for r in vocab_rows], object)
    vid = np.arange(1, len(vtok) + 1, dtype=np.int64)  # rank order = id order
    order = np.argsort(vtok)
    vtok_sorted, vid_sorted = vtok[order], vid[order]
    vocab_ref = ray.put((vtok_sorted, vid_sorted))

    def _ids_and_prev(batch: pa.Table):
        vt, vi = ray.get(vocab_ref)
        flat, counts = _lm_tokens(batch.column(column))
        if len(flat) == 0:
            return np.empty(0, np.int64), np.empty(0, np.int64), counts
        pos = np.searchsorted(vt, flat)
        pos_c = np.minimum(pos, len(vt) - 1) if len(vt) else np.zeros(len(flat), np.int64)
        hit = (vt[pos_c] == flat) if len(vt) else np.zeros(len(flat), bool)
        ids = np.where(hit, vi[pos_c] if len(vt) else 0, 0).astype(np.int64)
        prev = np.empty_like(ids)
        prev[1:] = ids[:-1]
        starts = np.zeros(len(counts) + 1, np.int64)
        np.cumsum(counts, out=starts[1:])
        prev[starts[:-1][counts > 0]] = BOS
        return ids, prev, counts

    def bigram_partials(batch: pa.Table) -> pa.Table:
        ids, prev, _ = _ids_and_prev(batch)
        key = prev * WIDTH + ids
        ukey, cnt = np.unique(key, return_counts=True)
        return pa.table(
            {
                "prev": pa.array(ukey // WIDTH),
                "cur": pa.array(ukey % WIDTH),
                "c": pa.array(cnt.astype(np.int64)),
            }
        )

    cb_rows = (
        ds.map_batches(bigram_partials, batch_format="pyarrow")
        .groupby(["prev", "cur"])
        .aggregate(Sum("c", alias_name="c"))
        .to_pandas()  # bounded: ≤ (V+2)·(V+1) cells
    )
    assert len(cb_rows) <= WIDTH * (V + 1)
    cb_key = (cb_rows["prev"].to_numpy(np.int64) * WIDTH + cb_rows["cur"].to_numpy(np.int64))
    cb_cnt = cb_rows["c"].to_numpy(np.int64)
    ctx = np.zeros(WIDTH, np.int64)
    np.add.at(ctx, cb_rows["prev"].to_numpy(np.int64), cb_cnt)
    k_order = np.argsort(cb_key)
    cb_key, cb_cnt = cb_key[k_order], cb_cnt[k_order]
    model_ref = ray.put((cb_key, cb_cnt, ctx))

    def score(batch: pa.Table) -> pa.Table:
        cbk, cbc, ctxv = ray.get(model_ref)
        ids, prev, counts = _ids_and_prev(batch)
        if len(ids):
            key = prev * WIDTH + ids
            p = np.searchsorted(cbk, key)
            cb = cbc[np.minimum(p, len(cbk) - 1)]
            cb = np.where(cbk[np.minimum(p, len(cbk) - 1)] == key, cb, 0)
            # identical literals/association to the SQL oracle — do not
            # constant-fold or reorder
            lp = np.floor(
                1000000.0 * np.log((cb + 1.0) / (ctxv[prev] + (V + 1.0)))
            ).astype(np.int64)
            starts = np.zeros(len(counts) + 1, np.int64)
            np.cumsum(counts, out=starts[1:])
            doc_lp = np.zeros(len(counts), np.int64)
            nz = counts > 0
            if nz.any():
                doc_lp[nz] = np.add.reduceat(lp, starts[:-1][nz])
        else:
            doc_lp = np.zeros(len(counts), np.int64)
        return pa.table(
            {
                id_column: batch.column(id_column),
                "n_tokens": pa.array(counts),
                "logprob_micro": pa.array(doc_lp),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")

def inverted_index(
    ds: "ray.data.Dataset",
    column: str = "text",
    id_column: str = "doc_id",
    min_df: int = 1,
) -> "ray.data.Dataset":
    """Token → posting-list index (the retrieval primitive):
    (token, df, postings) with postings = comma-joined STRING doc ids in
    ascending lexicographic order. One shuffle: per-batch DISTINCT
    (token, id) pairs (pandas drop_duplicates combiner — document text
    never leaves the map task), then a single groupby-token assembly that
    dedups across batches and sorts in-group, so the output is
    deterministic under any block layout. At corpus scale, write the
    result partitioned by token-hash prefix (write_partitioned_resumable)
    instead of collecting it; df-filtering happens before the string
    join, so hot tokens cost one group each."""

    def pairs(batch: pa.Table) -> pa.Table:
        flat, counts = _lm_tokens(batch.column(column))
        ids = np.repeat(
            np.asarray(
                pc.cast(batch.column(id_column), pa.string()).to_pylist(), object
            ),
            counts,
        )
        df = pd.DataFrame({"token": flat, "id": ids}).drop_duplicates()
        return pa.table(
            {
                "token": pa.array(df["token"].to_numpy(object), pa.string()),
                "id": pa.array(df["id"].to_numpy(object), pa.string()),
            }
        )

    def assemble(group: pa.Table) -> pa.Table:
        ids = sorted(set(group.column("id").to_pylist()))
        if len(ids) < min_df:
            return pa.table(
                {
                    "token": pa.array([], pa.string()),
                    "df": pa.array([], pa.int64()),
                    "postings": pa.array([], pa.string()),
                }
            )
        return pa.table(
            {
                "token": pa.array([group.column("token")[0].as_py()], pa.string()),
                "df": pa.array([len(ids)], pa.int64()),
                "postings": pa.array([",".join(ids)], pa.string()),
            }
        )

    return (
        ds.map_batches(pairs, batch_format="pyarrow")
        .groupby("token")
        .map_groups(assemble, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# BPE tokenizer: sample-train (driver, bounded) + broadcast-apply (streaming)
# ---------------------------------------------------------------------------


def bpe_train(
    ds: "ray.data.Dataset",
    column: str = "text",
    id_column: str = "doc_id",
    n_merges: int = 200,
    sample_mod: int = 1,
    max_words: int = 50_000,
) -> list[tuple[str, str]]:
    """Train byte-pair-encoding merges (Sennrich et al. 2016) the way
    production tokenizers are built at corpus scale: word frequencies come
    from a DETERMINISTIC hash-sample of documents (``sample_mod``: keep
    ids with siphash(id) % mod == 0; 1 = whole corpus) reduced with the
    combiner/groupby pattern, the merge loop itself runs driver-side over
    the bounded top-``max_words`` word-frequency table. Ties on pair
    frequency break lexicographically — the merge list is parallelism-
    and layout-invariant. Returns the ordered merge list for
    :func:`bpe_tokenize`."""
    from ray.data.aggregate import Sum

    def word_partials(batch: pa.Table) -> pa.Table:
        keep = pd.util.hash_array(
            np.asarray(
                pc.cast(batch.column(id_column), pa.string()).to_pylist(), object
            )
        ) % sample_mod == 0
        flat, counts = _lm_tokens(batch.column(column))
        mask = np.repeat(keep, counts)
        codes, uniques = pd.factorize(flat[mask])
        cnt = np.bincount(codes, minlength=len(uniques)).astype(np.int64)
        return pa.table({"word": pa.array(uniques, pa.string()), "cnt": pa.array(cnt)})

    rows = (
        ds.map_batches(word_partials, batch_format="pyarrow")
        .groupby("word")
        .aggregate(Sum("cnt", alias_name="cnt"))
        .sort(["cnt", "word"], descending=[True, False])
        .limit(max_words)
        .take_all()  # bounded: ≤ max_words rows
    )
    vocab: dict[tuple[str, ...], int] = {
        (*r["word"], "</w>"): int(r["cnt"]) for r in rows
    }
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for sym, c in vocab.items():
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + c
        if not pairs:
            break
        # deterministic argmax: max count, then lexicographically SMALLEST
        top = max(pairs.values())
        best = min(p for p, c in pairs.items() if c == top)
        if pairs[best] < 2:
            break
        merges.append(best)
        merged = best[0] + best[1]
        new_vocab: dict[tuple[str, ...], int] = {}
        for sym, c in vocab.items():
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == best[0] and sym[i + 1] == best[1]:
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges


def bpe_tokenize(
    ds: "ray.data.Dataset",
    merges: list[tuple[str, str]],
    column: str = "text",
    out_column: str = "n_bpe_tokens",
) -> "ray.data.Dataset":
    """Apply a trained merge list: per-batch, each DISTINCT word is
    segmented once (memo over the batch's unique words — web text repeats
    words heavily) and per-document BPE token counts come from a reduceat
    over the word→length map. The merge table broadcasts once via
    ``ray.put``; the pass is a single streaming map_batches."""
    import ray

    ranks_ref = ray.put({m: i for i, m in enumerate(merges)})

    def seg_len(word: str, ranks: dict) -> int:
        sym = [*word, "</w>"]
        while len(sym) > 1:
            best_rank, best_i = None, -1
            for i, pair in enumerate(zip(sym, sym[1:])):
                r = ranks.get(pair)
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_i = r, i
            if best_rank is None:
                break
            sym[best_i : best_i + 2] = [sym[best_i] + sym[best_i + 1]]
        return len(sym)

    def apply(batch: pa.Table) -> pa.Table:
        ranks = ray.get(ranks_ref)
        flat, counts = _lm_tokens(batch.column(column))
        codes, uniques = pd.factorize(flat)
        lens = np.fromiter(
            (seg_len(w, ranks) for w in uniques), np.int64, count=len(uniques)
        )
        per_tok = lens[codes] if len(codes) else np.zeros(0, np.int64)
        starts = np.zeros(len(counts) + 1, np.int64)
        np.cumsum(counts, out=starts[1:])
        out = np.zeros(len(counts), np.int64)
        nz = counts > 0
        if nz.any():
            out[nz] = np.add.reduceat(per_tok, starts[:-1][nz])
        return batch.append_column(out_column, pa.array(out))

    return ds.map_batches(apply, batch_format="pyarrow")


# URL canonicalization chain: every step is one RE2 kernel over the whole
# column (pyarrow replaces ALL matches; the SQL mirror needs the 'g' flag
# on every regexp_replace to match). The '?'→'?&' / strip '&utm_*' /
# '?&'→'?' trio removes tracking params without lookbehind, which RE2
# lacks. Scheme+host are lowercased via extract_regex + utf8_lower
# (RE2 has no case-folding replacement); non-URL rows pass through the
# remaining steps unchanged.
_URL_HEAD_RE = r"^(?P<head>[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)(?P<rest>.*)$"
_URL_STEPS: list[tuple[str, str]] = [
    (r"^(https://[^/:?#]*):443([/?#]|$)", r"\1\2"),  # default https port
    (r"^(http://[^/:?#]*):80([/?#]|$)", r"\1\2"),  # default http port
    (r"^(https?://)www\.", r"\1"),  # www prefix
    (r"\?", "?&"),  # sentinel so params are uniformly '&'-prefixed
    (r"&(utm_[^&#]*|fbclid=[^&#]*)", ""),  # tracking params
    (r"\?&", "?"),  # undo sentinel
    (r"[?&]+$", ""),  # dangling separator after param removal
    (r"/+$", ""),  # trailing slashes
]


def canonicalize_urls(
    ds: "ray.data.Dataset",
    column: str = "url",
    out_column: str = "canonical_url",
) -> "ray.data.Dataset":
    """URL canonicalization — the first step of every web-crawl dedup
    pipeline: drop the fragment, lowercase scheme+host, strip default
    ports (:80 http / :443 https) and the ``www.`` prefix, remove
    ``utm_*``/``fbclid`` tracking parameters, and trim dangling ``?``/
    ``&``/trailing slashes. Purely row-local (zero shuffle) and fully
    vectorized: one fragment strip + one extract/lower/rejoin + 8 RE2
    replace kernels per batch. Dedup downstream by grouping on
    ``out_column`` (see the url_dedup driver query)."""

    def canon(b: pa.Table) -> pa.Table:
        col = b.column(column)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        u = pc.replace_substring_regex(col, pattern="#.*", replacement="")
        ex = pc.extract_regex(u, pattern=_URL_HEAD_RE)
        head = pc.utf8_lower(pc.struct_field(ex, "head"))
        joined = pc.binary_join_element_wise(
            head, pc.struct_field(ex, "rest"), ""
        )
        u = pc.if_else(pc.is_valid(joined), joined, u)
        for pat, rep in _URL_STEPS:
            u = pc.replace_substring_regex(u, pattern=pat, replacement=rep)
        return b.append_column(out_column, u)

    return ds.map_batches(canon, batch_format="pyarrow")


def rrf_fuse(
    rankings: list,
    id_column: str = "doc_id",
    rank_column: str = "rnk",
    k: int = 60,
    top_n: int = 20,
    nano: int = 10**9,
) -> "ray.data.Dataset":
    """Reciprocal-rank fusion (Cormack, Clarke & Buettcher 2009) — the
    standard hybrid-search combiner for lexical + dense retrieval: each
    input ranking contributes ``1/(k+rank)`` per id (k=60 canonical) and
    ids are ordered by the summed score. Scores are kept as EXACT int64
    nano-units ``nano // (k + rank)`` so the fusion is order-free,
    layout-invariant, and engine-exact against a SQL mirror (the
    weighted_sample_orders lesson: never emit a cross-engine float when
    an integer carries the answer).

    Inputs are (id, rank) tables — top-k outputs, so everything here is
    bounded: union → groupby-Sum over ≤ Σ|rankings| rows → one tiny
    sort. Ties at the cut break by id ascending."""
    import ray.data  # noqa: F401

    from ray.data.aggregate import Sum

    def contrib(t: pa.Table) -> pa.Table:
        r = t.column(rank_column).to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                id_column: t.column(id_column),
                "rrf_nano": pa.array(nano // (k + r)),
            }
        )

    ds = rankings[0].map_batches(contrib, batch_format="pyarrow")
    for other in rankings[1:]:
        ds = ds.union(other.map_batches(contrib, batch_format="pyarrow"))
    fused = ds.groupby(id_column).aggregate(Sum("rrf_nano", alias_name="rrf_nano"))
    return fused.sort(["rrf_nano", id_column], descending=[True, False]).limit(
        top_n
    )


def fold_accents(
    ds: "ray.data.Dataset",
    column: str = "text",
    out_column: str = "folded",
) -> "ray.data.Dataset":
    """Accent folding (café→cafe, über→uber): NFD decomposition + strip
    NONSPACING combining marks — two Arrow kernels per batch
    (``utf8_normalize`` + one RE2 ``\\p{Mn}`` erase), zero Python rows,
    zero shuffle. Matches DuckDB's ``strip_accents`` on Latin / Greek /
    Cyrillic / Arabic / Vietnamese (verified); diverges on scripts whose
    vowel signs are SPACING combining marks (Mc — e.g. Devanagari
    matras), which this keeps and strip_accents removes — stripping Mc
    would destroy those words rather than fold them. Base letters
    without decompositions (Ł, ø, ﬁ) pass through on both engines."""

    def fold(b: pa.Table) -> pa.Table:
        col = b.column(column)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        nfd = pc.utf8_normalize(col, form="NFD")
        out = pc.replace_substring_regex(
            nfd, pattern=r"\p{Mn}", replacement=""
        )
        return b.append_column(out_column, out)

    return ds.map_batches(fold, batch_format="pyarrow")


def flesch_scores(
    ds: "ray.data.Dataset",
    column: str = "text",
    id_column: str = "doc_id",
) -> "ray.data.Dataset":
    """Flesch reading-ease scoring (Flesch 1948), the readability member
    of the quality-scorer family: per-doc word / sentence / syllable
    counts from three vectorized RE2 kernels (words = non-empty
    single-space pieces, sentences = [.!?] occurrences, syllables =
    [aeiouyAEIOUY]+ vowel groups — groups cannot span a space, so the
    whole-text count equals the per-word sum), each floored at 1, then
    the classic 206.835 − 1.015·(W/S) − 84.6·(Y/W) evaluated as ONE
    left-associated IEEE chain a SQL mirror reproduces bit-for-bit.
    Zero shuffle; pure map."""
    import pyarrow.compute as pc

    def f(b: pa.Table) -> pa.Table:
        vals = b.column(column).combine_chunks().fill_null("")
        pieces = pc.split_pattern(vals, " ")
        offs = pieces.offsets.to_numpy(zero_copy_only=False)
        flat = pieces.flatten().to_numpy(zero_copy_only=False)
        ne = (flat != "").astype(np.int64)
        w = np.add.reduceat(
            np.concatenate([ne, [0]]), offs[:-1]
        ) * (np.diff(offs) > 0)
        s = pc.count_substring_regex(vals, r"[.!?]").to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        y = pc.count_substring_regex(vals, r"[aeiouyAEIOUY]+").to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        w1 = np.maximum(w, 1).astype(np.float64)
        s1 = np.maximum(s, 1).astype(np.float64)
        y1 = np.maximum(y, 1).astype(np.float64)
        flesch = 206.835 - 1.015 * (w1 / s1) - 84.6 * (y1 / w1)
        return pa.table(
            {
                id_column: b.column(id_column),
                "n_words": pa.array(np.maximum(w, 1)),
                "n_sentences": pa.array(np.maximum(s, 1)),
                "n_syllables": pa.array(np.maximum(y, 1)),
                "flesch": pa.array(flesch),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow")


def nb_classify_docs(
    ds: "ray.data.Dataset",
    text_column: str = "text",
    label_column: str = "lang",
    id_column: str = "doc_id",
    vocab_size: int = 256,
) -> "ray.data.Dataset":
    """Multinomial naive Bayes trained AND applied distributed, in exact
    integer micro-nats (the lm_bigram_scores quantization doctrine, so
    per-doc score sums are order-free int64 and the SQL mirror is
    hash-exact): class priors floor(1e6·ln(n_c/N)), per-token terms
    floor(1e6·ln((cnt[c,tok]+1)/(tot_c+(V+1)))) with add-one smoothing
    over the capped vocabulary (top-``vocab_size`` tokens by count desc /
    token asc; everything else is <unk>=0, which trains like any token).

    Three streaming passes, none corpus-shuffling:

    1. class counts (bounded groupby → driver) + vocab (distinct-token
       table sort/limit, the lm pass);
    2. (class, token-id) counts: per-batch combiner partials →
       ≤ L·(V+1)-cell groupby Sum, collected bounded and turned into an
       [L, V+1] int64 term matrix broadcast via ``ray.put``;
    3. score: per doc, per class, gather + reduceat over token ids; pred
       = argmax (score desc, class asc).

    Self-classification over the training corpus is the intended demo
    shape (the oracle mirrors it); split train/apply by passing a
    different ``ds`` to a follow-up scoring call is a trivial refactor
    the test pins down. Returns (id, pred, score_micro)."""
    import ray
    from ray.data.aggregate import Sum

    V = int(vocab_size)

    # pass 1a: class document counts (bounded by #classes)
    cls_rows = (
        ds.groupby(label_column)
        .count()
        .take_all()  # bounded: one row per class
    )
    classes = np.asarray(sorted(r[label_column] for r in cls_rows), object)
    n_c = np.asarray(
        [next(r["count()"] for r in cls_rows if r[label_column] == c) for c in classes],
        np.int64,
    )
    n_docs = int(n_c.sum())
    L = len(classes)

    # pass 1b: capped vocabulary (count desc, token asc), ids 1..V; unk=0
    def uni_partials(batch: pa.Table) -> pa.Table:
        flat, _ = _lm_tokens(batch.column(text_column))
        codes, uniques = pd.factorize(flat)
        cnt = np.bincount(codes, minlength=len(uniques)).astype(np.int64)
        return pa.table({"token": pa.array(uniques, pa.string()), "cnt": pa.array(cnt)})

    vocab_rows = (
        ds.map_batches(uni_partials, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("cnt", alias_name="cnt"))
        .sort(["cnt", "token"], descending=[True, False])
        .limit(V)
        .take_all()  # bounded: ≤ V rows
    )
    vtok = np.asarray([r["token"] for r in vocab_rows], object)
    vid = np.arange(1, len(vtok) + 1, dtype=np.int64)
    vorder = np.argsort(vtok)
    vocab_ref = ray.put((vtok[vorder], vid[vorder], np.sort(classes)))

    def _token_ids(batch: pa.Table):
        vt, vi, _ = ray.get(vocab_ref)
        flat, counts = _lm_tokens(batch.column(text_column))
        if len(flat) == 0 or len(vt) == 0:
            return np.zeros(len(flat), np.int64), counts
        pos = np.minimum(np.searchsorted(vt, flat), len(vt) - 1)
        hit = vt[pos] == flat
        return np.where(hit, vi[pos], 0).astype(np.int64), counts

    # pass 2: (class, token-id) counts — combiner partials, bounded groupby
    def cnt_partials(batch: pa.Table) -> pa.Table:
        _, _, cls_sorted = ray.get(vocab_ref)
        ids, counts = _token_ids(batch)
        lab = np.asarray(batch.column(label_column).to_pylist(), object)
        lab_tok = np.repeat(np.searchsorted(cls_sorted, lab), counts)
        key = lab_tok * (V + 1) + ids
        ukey, c = np.unique(key, return_counts=True)
        return pa.table(
            {
                "ci": pa.array((ukey // (V + 1)).astype(np.int64)),
                "tid": pa.array((ukey % (V + 1)).astype(np.int64)),
                "c": pa.array(c.astype(np.int64)),
            }
        )

    cell_rows = (
        ds.map_batches(cnt_partials, batch_format="pyarrow")
        .groupby(["ci", "tid"])
        .aggregate(Sum("c", alias_name="c"))
        .to_pandas()  # bounded: ≤ L·(V+1) cells
    )
    assert len(cell_rows) <= L * (V + 1)
    cnt = np.zeros((L, V + 1), np.int64)
    cnt[
        cell_rows["ci"].to_numpy(np.int64), cell_rows["tid"].to_numpy(np.int64)
    ] = cell_rows["c"].to_numpy(np.int64)
    tot = cnt.sum(axis=1)
    # identical literals/association to the SQL oracle — do not refactor
    term = np.floor(
        1000000.0 * np.log((cnt + 1.0) / (tot[:, None] + (V + 1.0)))
    ).astype(np.int64)
    prior = np.floor(1000000.0 * np.log((n_c + 0.0) / (n_docs + 0.0))).astype(
        np.int64
    )
    model_ref = ray.put((term, prior, classes))

    # pass 3: score + argmax (score desc, class asc — classes pre-sorted)
    def score(batch: pa.Table) -> pa.Table:
        trm, pri, cls = ray.get(model_ref)
        ids, counts = _token_ids(batch)
        n_rows = len(counts)
        scores = np.tile(pri, (n_rows, 1))
        if len(ids):
            per_tok = trm[:, ids]  # [L, n_tokens]
            starts = np.zeros(n_rows + 1, np.int64)
            np.cumsum(counts, out=starts[1:])
            nz = counts > 0
            if nz.any():
                sums = np.add.reduceat(per_tok, starts[:-1][nz], axis=1)
                scores[nz] += sums.T
        best = np.argmax(scores, axis=1)  # first max = smallest class (sorted)
        return pa.table(
            {
                id_column: batch.column(id_column),
                "pred": pa.array(cls[best], pa.string()),
                "score_micro": pa.array(scores[np.arange(n_rows), best]),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")


def bpe_train_merges(
    ds: "ray.data.Dataset",
    text_column: str = "text",
    n_merges: int = 20,
    vocab_cap: int = 10_000,
) -> pa.Table:
    """Byte-pair-encoding merge training (Sennrich et al. 2016) the way
    production tokenizer trainers actually run it: the CORPUS pass is
    distributed (one combiner word-count sweep — the only part that
    scales with data), and the merge loop runs over the bounded
    word-frequency table (top ``vocab_cap`` words by count desc / word
    asc — the nb_classify vocab-cap rule; merge candidates are weighted
    by word frequency, so capping the tail loses only tail mass).

    Loop (driver-side over ≤ vocab_cap symbol sequences): words start as
    character sequences + ``</w>``; each round counts adjacent symbol
    pairs weighted by word count, picks the most frequent (ties → the
    lexicographically smallest (left, right) pair — fully deterministic),
    merges it everywhere, repeats. Stops early when no pair repeats.
    Returns the merge table (rank, left, right, pair_count) — the
    artifact a downstream encoder applies in rank order."""
    import pandas as pd

    from ray.data.aggregate import Sum

    def word_partials(batch: pa.Table) -> pa.Table:
        flat, _ = _lm_tokens(batch.column(text_column))
        codes, uniques = pd.factorize(flat)
        cnt = np.bincount(codes, minlength=len(uniques)).astype(np.int64)
        return pa.table(
            {"word": pa.array(uniques, pa.string()), "cnt": pa.array(cnt)}
        )

    rows = (
        ds.map_batches(word_partials, batch_format="pyarrow")
        .groupby("word")
        .aggregate(Sum("cnt", alias_name="cnt"))
        .sort(["cnt", "word"], descending=[True, False])
        .limit(vocab_cap)
        .take_all()  # bounded: <= vocab_cap rows
    )
    words = [tuple(r["word"]) + ("</w>",) for r in rows]
    counts = [int(r["cnt"]) for r in rows]

    out_rank, out_left, out_right, out_cnt = [], [], [], []
    for rank in range(int(n_merges)):
        pair_cnt: dict[tuple[str, str], int] = {}
        for w, c in zip(words, counts):
            for i in range(len(w) - 1):
                pair_cnt[(w[i], w[i + 1])] = pair_cnt.get((w[i], w[i + 1]), 0) + c
        if not pair_cnt:
            break
        (left, right), cnt = min(pair_cnt.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < 2:
            break
        merged = left + right
        words = [
            tuple(_merge_pair(w, left, right, merged)) for w in words
        ]
        out_rank.append(rank)
        out_left.append(left)
        out_right.append(right)
        out_cnt.append(cnt)
    return pa.table(
        {
            "rank": pa.array(out_rank, pa.int64()),
            "left": pa.array(out_left, pa.string()),
            "right": pa.array(out_right, pa.string()),
            "pair_count": pa.array(out_cnt, pa.int64()),
        }
    )


def _merge_pair(w: tuple, left: str, right: str, merged: str) -> list:
    out = []
    i = 0
    while i < len(w):
        if i + 1 < len(w) and w[i] == left and w[i + 1] == right:
            out.append(merged)
            i += 2
        else:
            out.append(w[i])
            i += 1
    return out


def hashed_features(
    ds: "ray.data.Dataset",
    text_column: str = "text",
    id_column: str = "doc_id",
    n_features: int = 64,
) -> "ray.data.Dataset":
    """The hashing-trick vectorizer (Weinberger et al. 2009 — the
    fixed-width, vocabulary-free featurizer linear models and MinHash-free
    dedup baselines run on): every token maps to bucket
    ``int(md5(token)[:8], 16) % n_features`` — md5 is the one hash every
    engine computes identically, so the bucketing is oracle-exact — and
    each document emits its sparse (id, bucket, cnt) rows (long form; a
    downstream stage reshapes to dense vectors when a model wants them).

    Row-local and embarrassingly parallel: one ``map_batches`` pass,
    tokens factorized per batch so each DISTINCT token is hashed once
    (md5 is per-unique-token Python, the classic cost profile of the
    trick — there is no corpus-wide vocabulary pass, which is the whole
    point). Nothing shuffles."""
    import hashlib

    import pandas as pd

    nf = int(n_features)

    def feat(batch: pa.Table) -> pa.Table:
        flat, counts = _lm_tokens(batch.column(text_column))
        ids = batch.column(id_column).to_numpy(zero_copy_only=False)
        doc_of = np.repeat(np.arange(len(counts)), counts)
        codes, uniques = pd.factorize(flat)
        bucket_of = np.asarray(
            [
                int(hashlib.md5(u.encode("utf-8")).hexdigest()[:8], 16) % nf
                for u in uniques
            ],
            np.int64,
        )
        key = doc_of * nf + bucket_of[codes]
        ukey, cnt = np.unique(key, return_counts=True)
        return pa.table(
            {
                id_column: pa.array(ids[(ukey // nf).astype(np.int64)]),
                "bucket": pa.array((ukey % nf).astype(np.int64)),
                "cnt": pa.array(cnt.astype(np.int64)),
            }
        )

    return ds.map_batches(feat, batch_format="pyarrow")


def token_pmi_pairs(
    ds: "ray.data.Dataset",
    text_column: str = "text",
    id_column: str = "doc_id",
    vocab_size: int = 64,
    min_pair_count: int = 2,
    scale: int = 10**6,
) -> "ray.data.Dataset":
    """Pointwise-mutual-information collocation mining over document
    co-occurrence (Church & Hanks 1990): for frequent-token pairs that
    co-occur in ≥ ``min_pair_count`` documents,

        pmi_micro = floor(scale · ln((pair_cnt · n_docs)
                                     / (cnt_a · cnt_b)))

    — a count-ratio ln, the quantization class where numpy and SQL
    engines agree bit-for-bit. The pair machinery is
    :func:`dedupe_ray.ops.tabular.association_rules` over the
    vocab-capped distinct (doc, token) table (top ``vocab_size`` tokens
    by count desc / token asc — the nb_classify cap; capping bounds the
    per-doc pair fan-out at C(V, 2), which is what makes doc-level
    co-occurrence tractable at corpus scale). Output: the rule columns
    plus ``pmi_micro``."""
    import pandas as pd

    from ray.data.aggregate import Sum

    from dedupe_ray.ops.tabular import association_rules

    V = int(vocab_size)

    def uni_partials(batch: pa.Table) -> pa.Table:
        flat, _ = _lm_tokens(batch.column(text_column))
        codes, uniques = pd.factorize(flat)
        cnt = np.bincount(codes, minlength=len(uniques)).astype(np.int64)
        return pa.table(
            {"token": pa.array(uniques, pa.string()), "cnt": pa.array(cnt)}
        )

    vocab_rows = (
        ds.map_batches(uni_partials, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("cnt", alias_name="cnt"))
        .sort(["cnt", "token"], descending=[True, False])
        .limit(V)
        .take_all()  # bounded: <= V rows
    )
    vocab = np.sort(np.asarray([r["token"] for r in vocab_rows], object))
    vocab_ref = ray.put(vocab)

    def doc_tokens(batch: pa.Table) -> pa.Table:
        vt = ray.get(vocab_ref)
        flat, counts = _lm_tokens(batch.column(text_column))
        ids = np.repeat(
            batch.column(id_column).to_numpy(zero_copy_only=False), counts
        )
        if len(flat) == 0 or len(vt) == 0:
            return pa.table(
                {"doc": pa.array([], pa.int64()), "tok": pa.array([], pa.string())}
            )
        pos = np.minimum(np.searchsorted(vt, flat), len(vt) - 1)
        hit = vt[pos] == flat
        return pa.table(
            {
                "doc": pa.array(ids[hit].astype(np.int64)),
                "tok": pa.array(flat[hit], pa.string()),
            }
        )

    rules = association_rules(
        ds.map_batches(doc_tokens, batch_format="pyarrow"),
        "doc",
        "tok",
        min_pair_count=min_pair_count,
    )

    def pmi(t: pa.Table) -> pa.Table:
        num = t.column("lift_num").to_numpy(zero_copy_only=False).astype(np.int64)
        den = t.column("lift_den").to_numpy(zero_copy_only=False).astype(np.int64)
        p = np.floor(
            scale * np.log(num.astype(np.float64) / den.astype(np.float64))
        ).astype(np.int64)
        return t.append_column("pmi_micro", pa.array(p))

    return rules.map_batches(pmi, batch_format="pyarrow")


def pseudonymize(
    ds: "ray.data.Dataset",
    columns: list[str],
    salt: str,
    digest_chars: int = 16,
) -> "ray.data.Dataset":
    """Salted stable pseudonymization of identifier columns (the
    PII-safe-sharing step after :func:`scrub_pii`): each value becomes
    ``md5(salt || ':' || value)[:digest_chars]`` — deterministic, so
    joins across pseudonymized tables still line up, but the original
    value is unrecoverable without the salt (keep the salt out of the
    shared artifact; rotate it to break linkage). md5 here is a
    PSEUDONYM generator, not a security boundary — for adversarial
    threat models swap in an HMAC behind the same seam.

    Row-local one-pass ``map_batches``; values factorize per batch so
    each distinct value hashes once. NULL stays NULL. Non-string columns
    pseudonymize through their Arrow string cast (pinned — the same
    rendering the XML/fixed-width sinks use)."""
    import hashlib

    import pandas as pd
    import pyarrow.compute as pc

    prefix = salt + ":"

    def scrub(batch: pa.Table) -> pa.Table:
        out = batch
        for col in columns:
            s = pc.cast(batch.column(col), pa.string())
            codes, uniques = pd.factorize(np.asarray(s.to_pylist(), object))
            hashed = np.asarray(
                [
                    None
                    if u is None
                    else hashlib.md5((prefix + u).encode("utf-8")).hexdigest()[
                        :digest_chars
                    ]
                    for u in uniques
                ],
                object,
            )
            vals = np.where(codes >= 0, hashed[np.maximum(codes, 0)], None)
            out = out.set_column(
                out.column_names.index(col),
                col,
                pa.array(vals.tolist(), pa.string()),
            )
        return out

    return ds.map_batches(scrub, batch_format="pyarrow")


def normalize_org_names(
    ds: "ray.data.Dataset",
    column: str,
    out_column: str = "normalized",
) -> "ray.data.Dataset":
    """Organization-name normalization for ER blocking (the classic
    company-matching preprocessor): lowercase → non-alphanumerics to
    spaces → legal-form suffixes dropped as whole words (inc, llc, corp,
    ltd, gmbh, co, company, corporation, limited) → whitespace collapsed
    and trimmed. 'Acme Corp.' , 'ACME CORP' and 'acme corp, ltd.' all
    normalize to 'acme', so exact blocking on the normalized form
    recovers the matches raw equality misses.

    Row-local one-pass; every regex runs through Arrow's RE2
    (`pc.replace_substring_regex`) — the same engine DuckDB embeds, so a
    SQL mirror applying the identical chain is byte-exact (the scrub_pii
    parity doctrine). NULL stays NULL."""
    import pyarrow.compute as pc

    suffix = r"\b(incorporated|corporation|company|limited|gmbh|corp|ltd|llc|inc|co)\b"

    def norm(batch: pa.Table) -> pa.Table:
        s = pc.utf8_lower(pc.cast(batch.column(column), pa.string()))
        s = pc.replace_substring_regex(s, r"[^a-z0-9 ]", " ")
        s = pc.replace_substring_regex(s, suffix, " ")
        s = pc.replace_substring_regex(s, r" +", " ")
        s = pc.utf8_trim(s, " ")
        return batch.append_column(out_column, s)

    return ds.map_batches(norm, batch_format="pyarrow")


def char_entropy_docs(
    ds: "ray.data.Dataset",
    id_column: str = "doc_id",
    text_column: str = "text",
) -> "ray.data.Dataset":
    """Per-document character-level Shannon entropy in integer
    micro-nats — the gibberish / binary-blob / base64-dump quality
    signal next to compression_ratio (entropy is its model-free bound):

        H_micro = Σ over distinct code points c of
                  cnt_c · ⌊10⁶ · ln(n / cnt_c)⌋

    with n the doc's total code points. The ln argument is a count
    ratio (int64 → double division — the lang_source_mi agreement
    class), so a SQL mirror that unnests characters lands on the same
    integers; dividing by 10⁶·n gives nats/char. Zero shuffle: the
    whole statistic is row-local (one np.unique per doc over its
    UTF-32 code points). Empty documents are dropped (entropy of an
    empty string is undefined; pinned on both engines by construction).
    Output: (id, n, entropy_micro)."""
    import numpy as np

    def kernel(b: pa.Table) -> pa.Table:
        ids = b.column(id_column)
        texts = b.column(text_column).to_pylist()
        keep_idx, ns, ents = [], [], []
        for i, s in enumerate(texts):
            if not s:
                continue
            cps = np.frombuffer(s.encode("utf-32-le"), np.uint32)
            _u, cnt = np.unique(cps, return_counts=True)
            n = int(len(cps))
            cnt = cnt.astype(np.int64)
            h = int(
                (cnt * np.floor(1e6 * np.log(n / cnt)).astype(np.int64)).sum()
            )
            keep_idx.append(i)
            ns.append(n)
            ents.append(h)
        return pa.table(
            {
                id_column: ids.take(pa.array(keep_idx, pa.int64())),
                "n": pa.array(ns, pa.int64()),
                "entropy_micro": pa.array(ents, pa.int64()),
            }
        )

    return ds.map_batches(kernel, batch_format="pyarrow")
