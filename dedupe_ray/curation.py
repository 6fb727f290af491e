"""End-to-end corpus curation: the composed training-data pipeline
(lang filter → quality gate → normalized exact dedup → benchmark
decontamination) that chains the individual operators this library
already ships into the one pass a FineWeb/CCNet-style curation run
actually executes.

Every stage keeps the streaming shape of its underlying op: the filters
are vectorized per-batch predicates (no shuffle), dedup is the one
bucketed shuffle of :func:`dedupe_ray.ops.dedup.exact_dedup`, and
decontamination broadcasts the benchmark gram-hash set once
(:func:`dedupe_ray.ops.text.decontaminate`) then anti-joins through the
bucketed unique-key join. Nothing materializes the corpus driver-side.

Determinism contract (oracle-mirrorable): tokenization is single-space
split with empty pieces ignored, the dedup key is
``lower(trim(regexp_replace(text, '\\s+', ' ', 'g'), ' '))`` (pyarrow and
DuckDB both run RE2, so ``\\s`` means the same five characters), the
duplicate-token gate is the EXACT integer cross-multiply
``(n_tokens − n_distinct)·2 ≤ n_tokens`` — no float fraction anywhere.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

DEFAULT_LANGS = ("en", "de", "fr", "es")


def _token_stats(texts: pa.ChunkedArray) -> tuple[np.ndarray, np.ndarray]:
    """Per-doc (n_tokens, n_distinct) over non-empty single-space pieces."""
    import pandas as pd

    vals = texts.combine_chunks().fill_null("")
    pieces = pc.split_pattern(vals, " ")
    offs = pieces.offsets.to_numpy(zero_copy_only=False)
    flat = pieces.flatten().to_numpy(zero_copy_only=False)
    doc_idx = np.repeat(np.arange(len(vals), dtype=np.int64), np.diff(offs))
    ne = flat != ""
    n_tok = np.bincount(doc_idx[ne], minlength=len(vals)).astype(np.int64)
    dd = pd.DataFrame({"d": doc_idx[ne], "t": flat[ne]}).drop_duplicates()
    n_dis = np.bincount(
        dd["d"].to_numpy(np.int64), minlength=len(vals)
    ).astype(np.int64)
    return n_tok, n_dis


def _norm_key(texts: pa.ChunkedArray) -> pa.Array:
    """``lower(trim(regexp_replace(text, '\\s+', ' ', 'g'), ' '))`` — the
    whitespace-insensitive casefolded dedup key. Both engines run RE2."""
    vals = texts.combine_chunks().fill_null("")
    collapsed = pc.replace_substring_regex(vals, r"\s+", " ")
    return pc.utf8_lower(pc.utf8_trim(collapsed, " "))


def _annotate(
    keep_langs: tuple[str, ...], min_tokens: int
):
    langs = set(keep_langs)

    def f(b: pa.Table) -> pa.Table:
        n_tok, n_dis = _token_stats(b.column("text"))
        lang = b.column("lang").to_numpy(zero_copy_only=False)
        pass_lang = np.asarray([v in langs for v in lang], bool)
        pass_quality = (
            pass_lang
            & (n_tok >= min_tokens)
            & ((n_tok - n_dis) * 2 <= n_tok)
        )
        return b.append_column("n_tokens", pa.array(n_tok)).append_column(
            "pass_lang", pa.array(pass_lang)
        ).append_column("pass_quality", pa.array(pass_quality)).append_column(
            "norm_key", _norm_key(b.column("text"))
        )

    return f


def curate_documents(
    docs: "ray.data.Dataset",
    bench: "ray.data.Dataset",
    keep_langs: tuple[str, ...] = DEFAULT_LANGS,
    min_tokens: int = 5,
    contamination_ngram: int = 5,
    id_column: str = "doc_id",
) -> "ray.data.Dataset":
    """The full curation chain; returns surviving docs as
    (doc_id, lang, source, n_tokens)."""
    from dedupe_ray.joins import bucketed_lookup_join
    from dedupe_ray.ops.dedup import exact_dedup
    from dedupe_ray.ops.text import decontaminate

    ann = docs.map_batches(
        _annotate(keep_langs, min_tokens), batch_format="pyarrow"
    )
    passed = ann.filter(expr="pass_quality == True").drop_columns(
        ["pass_lang", "pass_quality"]
    )
    survivors = exact_dedup(passed, column="norm_key", id_column=id_column)
    cont = decontaminate(
        survivors, bench, n=contamination_ngram, id_column=id_column
    )
    joined = bucketed_lookup_join(
        survivors.drop_columns(["text", "norm_key"]),
        cont,
        id_column,
        id_column,
        ["matched_ngrams"],
        how="left",
    )

    def clean_only(b: pa.Table) -> pa.Table:
        col = b.column("matched_ngrams")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        return b.filter(pc.is_null(col)).drop_columns(["matched_ngrams"])

    return joined.map_batches(clean_only, batch_format="pyarrow").select_columns(
        [id_column, "lang", "source", "n_tokens"]
    )


def curation_funnel(
    docs: "ray.data.Dataset",
    bench: "ray.data.Dataset",
    keep_langs: tuple[str, ...] = DEFAULT_LANGS,
    min_tokens: int = 5,
    contamination_ngram: int = 5,
    id_column: str = "doc_id",
) -> pa.Table:
    """Per-stage survivor counts (the audit artifact a curation run
    publishes): input → lang → quality → dedup → decontaminated. The two
    filter counts come from ONE combiner aggregate over the annotated
    pass; dedup and final counts are bounded count() consumptions of the
    same lazy chain."""
    from ray.data.aggregate import Count, Sum

    ann = docs.map_batches(
        _annotate(keep_langs, min_tokens), batch_format="pyarrow"
    )

    def flag_ints(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "pl": pa.array(
                    b.column("pass_lang").to_numpy(zero_copy_only=False).astype(
                        np.int64
                    )
                ),
                "pq": pa.array(
                    b.column("pass_quality")
                    .to_numpy(zero_copy_only=False)
                    .astype(np.int64)
                ),
            }
        )

    agg = ann.map_batches(flag_ints, batch_format="pyarrow").aggregate(
        Count(alias_name="n_input"),
        Sum("pl", alias_name="n_lang"),
        Sum("pq", alias_name="n_quality"),
    )
    curated = curate_documents(
        docs, bench, keep_langs, min_tokens, contamination_ngram, id_column
    )
    from dedupe_ray.ops.dedup import exact_dedup

    passed = ann.filter(expr="pass_quality == True").drop_columns(
        ["pass_lang", "pass_quality"]
    )
    n_dedup = exact_dedup(passed, column="norm_key", id_column=id_column).count()
    n_final = curated.count()
    return pa.table(
        {
            "stage": pa.array(
                ["input", "lang", "quality", "dedup", "decontaminated"]
            ),
            "n": pa.array(
                [
                    int(agg["n_input"]),
                    int(agg["n_lang"]),
                    int(agg["n_quality"]),
                    int(n_dedup),
                    int(n_final),
                ],
                pa.int64(),
            ),
        }
    )
