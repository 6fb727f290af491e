"""Preprocess normalizer conformance (reference backend/dedupe_script.py:18-31).

Golden values follow the reference's exact operation order: ascii-fold →
collapse '  +' → '\\n'→' ' → strip → strip quotes → lower → strip;
empty/'nan' → 'N/A'. Note the quirk that a newline replaced AFTER the
multi-space collapse can leave a double space — deliberately preserved.
"""

import pyarrow as pa

from dedupe_ray.preprocess import preprocess_array, preprocess_table, preprocess_value

GOLDEN = [
    ("Müller GmbH", "muller gmbh"),
    ("  spaced   out  ", "spaced out"),
    ("nan", "N/A"),
    ("", "N/A"),
    (None, "N/A"),
    ('"quoted"', "quoted"),
    ("'single'", "single"),
    ("Łódź", "lodz"),
    ("Straße", "strasse"),
    ("line\nbreak", "line break"),
    ("a  b\nc", "a b c"),
    ("Dvořák s.r.o.", "dvorak s.r.o."),
    ("UPPER", "upper"),
    ("N/A", "n/a"),  # literal already-sentinel text is lowercased like any value
    ("  \n  ", "N/A"),
]


def test_scalar_golden():
    for raw, want in GOLDEN:
        assert preprocess_value(raw) == want, raw


def test_vectorized_matches_scalar():
    raws = [r for r, _ in GOLDEN]
    arr = pa.array([r if r is not None else None for r in raws], pa.string())
    got = preprocess_array(arr).to_pylist()
    want = [preprocess_value(r) for r in raws]
    assert got == want


def test_falsy_nonstring_cells_become_missing():
    # Reference preprocess() starts with `if not column: return 'N/A'`
    # (backend/dedupe_script.py:20-22): numeric zero / False / None / ""
    # are all MISSING, while the strings "0"/"False" are kept.
    for falsy in (0, 0.0, False, None, ""):
        assert preprocess_value(falsy) == "N/A", falsy
    assert preprocess_value("0") == "0"
    assert preprocess_value("False") == "false"


def test_newline_after_collapse_quirk():
    # '\n' → ' ' happens after '  +' collapse, so the spaces it creates survive
    assert preprocess_value("a \n b") == "a   b"


def test_table_preprocess_only_touches_named_columns():
    t = pa.table({"doc_id": ["A"], "City": ["  KRAKÓW "], "other": ["RAW"]})
    out = preprocess_table(t, ["City"])
    assert out.column("City").to_pylist() == ["krakow"]
    assert out.column("other").to_pylist() == ["RAW"]
    assert out.column("doc_id").to_pylist() == ["A"]
