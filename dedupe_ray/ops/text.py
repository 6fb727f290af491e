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


class LanguageId:
    """Stopword + charset language heuristic; actor-pool stage.

    Output column ``lang_pred`` (ISO-2 or 'und'). The profiles load once per
    actor in __init__."""

    def __init__(self) -> None:
        self.profiles = _LANG_PROFILES
        self.word = _WORD

    def _classify(self, text: str) -> str:
        if not text:
            return "und"
        if any("一" <= ch <= "鿿" for ch in text[:200]):
            return "zh"
        toks = [t.lower() for t in self.word.findall(text)]
        if not toks:
            return "und"
        best, best_hits = "und", 0
        for lang, stops in self.profiles.items():
            if not stops:
                continue
            hits = sum(1 for t in toks if t in stops)
            if hits > best_hits:
                best, best_hits = lang, hits
        return best if best_hits > 0 else "und"

    def __call__(self, batch: pa.Table) -> pa.Table:
        preds = [self._classify(t or "") for t in batch.column("text").to_pylist()]
        return batch.append_column("lang_pred", pa.array(preds, pa.string()))


class QualityScore:
    """Heuristic document-quality features (length, punctuation ratio,
    stopword ratio, mean word length) + a combined score in [0,1] —
    the standard pre-training corpus filters (C4/Gopher-style rules,
    public)."""

    def __init__(self) -> None:
        self.word = _WORD
        self.stops = _LANG_PROFILES["en"] | _LANG_PROFILES["de"] | _LANG_PROFILES["es"]

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        n = len(texts)
        n_chars = np.zeros(n, np.int32)
        n_words = np.zeros(n, np.int32)
        punct_ratio = np.zeros(n, np.float32)
        stop_ratio = np.zeros(n, np.float32)
        mean_word_len = np.zeros(n, np.float32)
        for i, t in enumerate(texts):
            t = t or ""
            n_chars[i] = len(t)
            words = self.word.findall(t)
            n_words[i] = len(words)
            if t:
                punct_ratio[i] = sum(not (c.isalnum() or c.isspace()) for c in t) / len(t)
            if words:
                lw = [w.lower() for w in words]
                stop_ratio[i] = sum(w in self.stops for w in lw) / len(words)
                mean_word_len[i] = float(np.mean([len(w) for w in words]))
        ok_len = np.clip((n_words - 5) / 45.0, 0, 1)
        ok_punct = 1.0 - np.clip((punct_ratio - 0.2) * 5, 0, 1)
        ok_wordlen = 1.0 - np.clip(np.abs(mean_word_len - 5.0) / 5.0, 0, 1) * 0.5
        score = (ok_len * ok_punct * ok_wordlen).astype(np.float32)
        for name, col in [
            ("q_n_words", pa.array(n_words, pa.int32())),
            ("q_punct_ratio", pa.array(punct_ratio, pa.float32())),
            ("q_stop_ratio", pa.array(stop_ratio, pa.float32())),
            ("q_mean_word_len", pa.array(mean_word_len, pa.float32())),
            ("quality_score", pa.array(score, pa.float32())),
        ]:
            batch = batch.append_column(name, col)
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
