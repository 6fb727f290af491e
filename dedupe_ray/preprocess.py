"""Vectorized record preprocessing (reference A5/A6, backend/dedupe_script.py:18-42).

Reference semantics per cell value::

    unidecode(str(v)) → collapse '  +'→' ' → '\\n'→' ' → strip → strip quotes
    → lower() → strip; empty or 'nan' → "N/A"

The normalizer is part of the observable output (cluster records embed the
cleaned values — backend/test_response.py:1), so it must be reproduced exactly.
``unidecode`` is not installed in this environment; :data:`_FOLD` is an ASCII
fold table covering Latin-1 Supplement + Latin Extended-A (the character range
of the reference's KNA fixtures), applied only to rows that actually contain
non-ASCII bytes, so the pure-ASCII fast path stays fully vectorized in
pyarrow.compute.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from dedupe_ray.config import MISSING

# ASCII fold map (unidecode-compatible on Latin-1 + Latin Extended-A).
_FOLD_PAIRS = {
    "À": "A", "Á": "A", "Â": "A", "Ã": "A", "Ä": "A", "Å": "A", "Æ": "AE",
    "Ç": "C", "È": "E", "É": "E", "Ê": "E", "Ë": "E", "Ì": "I", "Í": "I",
    "Î": "I", "Ï": "I", "Ð": "D", "Ñ": "N", "Ò": "O", "Ó": "O", "Ô": "O",
    "Õ": "O", "Ö": "O", "Ø": "O", "Ù": "U", "Ú": "U", "Û": "U", "Ü": "U",
    "Ý": "Y", "Þ": "Th", "ß": "ss",
    "à": "a", "á": "a", "â": "a", "ã": "a", "ä": "a", "å": "a", "æ": "ae",
    "ç": "c", "è": "e", "é": "e", "ê": "e", "ë": "e", "ì": "i", "í": "i",
    "î": "i", "ï": "i", "ð": "d", "ñ": "n", "ò": "o", "ó": "o", "ô": "o",
    "õ": "o", "ö": "o", "ø": "o", "ù": "u", "ú": "u", "û": "u", "ü": "u",
    "ý": "y", "þ": "th", "ÿ": "y",
    # Latin Extended-A (subset relevant to the KNA fixtures: pl/cz/de/hu names)
    "Ā": "A", "ā": "a", "Ă": "A", "ă": "a", "Ą": "A", "ą": "a",
    "Ć": "C", "ć": "c", "Č": "C", "č": "c", "Ď": "D", "ď": "d",
    "Đ": "D", "đ": "d", "Ē": "E", "ē": "e", "Ė": "E", "ė": "e",
    "Ę": "E", "ę": "e", "Ě": "E", "ě": "e", "Ğ": "G", "ğ": "g",
    "Ģ": "G", "ģ": "g", "Ī": "I", "ī": "i", "Į": "I", "į": "i",
    "İ": "I", "ı": "i", "Ķ": "K", "ķ": "k", "Ĺ": "L", "ĺ": "l",
    "Ļ": "L", "ļ": "l", "Ľ": "L", "ľ": "l", "Ł": "L", "ł": "l",
    "Ń": "N", "ń": "n", "Ņ": "N", "ņ": "n", "Ň": "N", "ň": "n",
    "Ō": "O", "ō": "o", "Ő": "O", "ő": "o", "Œ": "OE", "œ": "oe",
    "Ŕ": "R", "ŕ": "r", "Ř": "R", "ř": "r", "Ś": "S", "ś": "s",
    "Ş": "S", "ş": "s", "Š": "S", "š": "s", "Ť": "T", "ť": "t",
    "Ū": "U", "ū": "u", "Ů": "U", "ů": "u", "Ű": "U", "ű": "u",
    "Ų": "U", "ų": "u", "Ź": "Z", "ź": "z", "Ż": "Z", "ż": "z",
    "Ž": "Z", "ž": "z",
}
_FOLD = str.maketrans(_FOLD_PAIRS)


def ascii_fold(value: str) -> str:
    """unidecode stand-in: fold Latin-1/Latin-Ext-A to ASCII, drop the rest."""
    if value.isascii():
        return value
    folded = value.translate(_FOLD)
    if folded.isascii():
        return folded
    return folded.encode("ascii", errors="ignore").decode("ascii")


def preprocess_value(value: object) -> str:
    """Scalar reference-exact normalizer (for tests / driver-side use).

    The 'nan' sentinel check happens on the RAW unidecoded string, BEFORE
    whitespace collapse (backend/dedupe_script.py:24-26): "NaN" → "N/A" but
    " NAN " survives the check and comes out as the literal "nan".

    Falsy non-string cells (0, 0.0, False, None, "") map to MISSING before
    stringification, mirroring the reference's `if not column` guard
    (backend/dedupe_script.py:20-22)."""
    if not value:
        return MISSING
    s = ascii_fold(str(value) if value is not None else "")
    if s.lower() == "nan":
        return MISSING
    import re

    s = re.sub("  +", " ", s)
    s = s.replace("\n", " ")
    s = s.strip().strip('"').strip("'").lower().strip()
    if not s:
        return MISSING
    return s


def preprocess_array(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Vectorized normalizer over an Arrow string array.

    Fully pyarrow.compute on the ASCII fast path; the ASCII fold falls back to
    a python translate only for rows containing non-ASCII characters.
    """
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if not pa.types.is_string(arr.type) and not pa.types.is_large_string(arr.type):
        arr = pc.cast(arr, pa.string())
    # nulls → "" (becomes the MISSING sentinel at the end)
    arr = pc.fill_null(arr, "")

    # ASCII fold: only touch rows that need it.
    non_ascii = pc.invert(pc.string_is_ascii(arr))
    if pc.any(non_ascii).as_py():
        py = arr.to_pylist()
        idx = np.nonzero(non_ascii.to_numpy(zero_copy_only=False))[0]
        for i in idx:
            py[i] = ascii_fold(py[i])
        arr = pa.array(py, type=pa.string())

    # reference nan check: on the raw folded value, BEFORE collapse
    # (dedupe_script.py:24-26) — " NAN " is NOT caught here and survives
    # the pipeline as the literal "nan"
    raw_nan = pc.equal(pc.utf8_lower(arr), "nan")
    arr = pc.replace_substring_regex(arr, "  +", " ")
    arr = pc.replace_substring(arr, "\n", " ")
    arr = pc.utf8_trim_whitespace(arr)
    arr = pc.utf8_trim(arr, '"')
    arr = pc.utf8_trim(arr, "'")
    arr = pc.utf8_lower(arr)
    arr = pc.utf8_trim_whitespace(arr)
    missing = pc.or_(raw_nan, pc.equal(arr, ""))
    return pc.if_else(missing, pa.scalar(MISSING, pa.string()), arr)


def preprocess_table(batch: pa.Table, columns: list[str] | None = None) -> pa.Table:
    """``map_batches``-ready batch transform: normalize the given string columns
    in place (all string columns except ``doc_id``/``spans`` when None)."""
    if columns is None:
        columns = [
            f.name
            for f in batch.schema
            if (pa.types.is_string(f.type) or pa.types.is_large_string(f.type))
            and f.name not in ("doc_id", "source_file")
        ]
    for name in columns:
        i = batch.schema.get_field_index(name)
        batch = batch.set_column(i, name, preprocess_array(batch.column(name)))
    return batch


def make_preprocess_stage(columns: list[str]):
    """Return a stateless map_batches fn normalizing ``columns``."""

    def _stage(batch: pa.Table) -> pa.Table:
        return preprocess_table(batch, columns)

    return _stage
