"""Property-based tests (hypothesis) over the pure kernel layer: the
invariants every downstream stage silently relies on, probed across a far
wider input space than the golden-value unit tests."""

import re

from hypothesis import given, settings, strategies as st

from dedupe_ray.distances import (
    affine_gap,
    affine_gap_batch,
    levenshtein,
    token_align_batch,
)
from dedupe_ray.phonetic import double_metaphone
from dedupe_ray.predicates import (
    SIMPLE_PREDICATES,
    deletion_neighborhood2,
)
from dedupe_ray.preprocess import preprocess_array, preprocess_value

import pyarrow as pa

# Bounded-size printable text; a separate latin-ish alphabet keeps the
# phonetic/edit-distance cases in their meaningful input class.
_text = st.text(max_size=40)
_latin = st.text(
    alphabet=st.sampled_from("abcdefghijklmnopqrstuvwxyz -'"), max_size=24
)


@settings(max_examples=200, deadline=None)
@given(_text)
def test_preprocess_is_idempotent(s):
    once = preprocess_value(s)
    # Two reference-exact quirks break idempotence by design: the "N/A"
    # sentinel re-normalizes to "n/a", and " NAN " survives the raw-string
    # nan check once but becomes "N/A" the second time
    # (backend/dedupe_script.py:20-26).
    if once in ("N/A", "nan"):
        return
    assert preprocess_value(once) == once


@settings(max_examples=100, deadline=None)
@given(st.lists(_text, max_size=30))
def test_preprocess_array_matches_scalar(values):
    got = preprocess_array(pa.array(values, pa.string())).to_pylist()
    assert got == [preprocess_value(v) for v in values]


@settings(max_examples=200, deadline=None)
@given(_latin)
def test_double_metaphone_code_alphabet(s):
    for code in double_metaphone(s):
        # codes draw from consonant classes + A (initial vowel) + 0 (TH)
        assert re.fullmatch(r"[A-Z0]*", code)
    # deterministic and case/punctuation insensitive
    assert double_metaphone(s) == double_metaphone(s.upper() + "!")


@settings(max_examples=150, deadline=None)
@given(_latin, _latin)
def test_affine_gap_symmetry_and_identity(a, b):
    d_ab = affine_gap(a, b)
    d_ba = affine_gap(b, a)
    assert abs(d_ab - d_ba) < 1e-9
    if a.strip() or b.strip():
        assert affine_gap(a, a) <= 0.5  # self-distance is small, never large


@settings(max_examples=100, deadline=None)
@given(st.lists(st.tuples(_latin, _latin), min_size=1, max_size=10))
def test_affine_gap_batch_matches_scalar(pairs):
    a = [p[0] for p in pairs]
    b = [p[1] for p in pairs]
    batch = affine_gap_batch(a, b)
    for i, (x, y) in enumerate(pairs):
        assert abs(batch[i] - affine_gap(x, y)) < 1e-9


@settings(max_examples=150, deadline=None)
@given(_latin, _latin)
def test_levenshtein_metric_axioms(a, b):
    d = levenshtein(a, b)
    assert d == levenshtein(b, a)
    assert (d == 0) == (a == b)
    assert d <= max(len(a), len(b))


@settings(max_examples=150, deadline=None)
@given(
    st.text(alphabet=st.sampled_from("abcdefghij0123456789-"), min_size=1, max_size=10),
    st.integers(0, 2),
    st.data(),
)
def test_deletion_neighborhood2_covers_two_edits(s, n_edits, data):
    """Any value reachable by ≤2 single-char edits (sub/del/ins) from a
    short string shares at least one deletion key with the original."""
    t = s
    for _ in range(n_edits):
        op = data.draw(st.sampled_from(["sub", "del", "ins"]))
        i = data.draw(st.integers(0, max(len(t) - 1, 0)))
        ch = data.draw(st.sampled_from("abcdefghij0123456789-"))
        if op == "sub" and t:
            t = t[:i] + ch + t[i + 1 :]
        elif op == "del" and t:
            t = t[:i] + t[i + 1 :]
        else:
            t = t[:i] + ch + t[i:]
    if not t or len(s) > 12 or len(t) > 12:
        return
    assert set(deletion_neighborhood2(s)) & set(deletion_neighborhood2(t))


@settings(max_examples=100, deadline=None)
@given(_latin)
def test_predicate_keys_deterministic_and_hashable(value):
    for name, fn in SIMPLE_PREDICATES.items():
        keys = fn(value)
        assert isinstance(keys, tuple)
        assert keys == fn(value), name
        assert all(isinstance(k, str) for k in keys), name


@settings(max_examples=100, deadline=None)
@given(st.lists(st.tuples(_latin, _latin), min_size=1, max_size=8))
def test_token_align_bounds_and_symmetry(pairs):
    a = [p[0] for p in pairs]
    b = [p[1] for p in pairs]
    fwd = token_align_batch(a, b)
    rev = token_align_batch(b, a)
    for i, (x, y) in enumerate(pairs):
        assert 0.0 <= fwd[i] <= 1.0 or fwd[i] != fwd[i]  # in range or NaN
        assert (fwd[i] != fwd[i]) == (rev[i] != rev[i])
        if fwd[i] == fwd[i]:
            assert abs(fwd[i] - rev[i]) < 1e-9
        if x == y and x.strip():
            assert fwd[i] == 0.0 or fwd[i] != fwd[i]


_doc = st.text(alphabet=" abcx", max_size=40)


@given(st.lists(_doc, max_size=12), st.integers(min_value=1, max_value=5))
@settings(max_examples=60, deadline=None)
def test_space_gram_hashes_match_brute_force(texts, n):
    """Per-row distinct-gram counts and cross-row hash-set equality match a
    brute-force tuple-set build (split on single space, window of n)."""
    from dedupe_ray.ops.text import _space_gram_hashes

    import numpy as np

    rid, gh = _space_gram_hashes(pa.array(texts, pa.string()), n)

    def brute(t):
        toks = t.split(" ")
        return {tuple(toks[i:i + n]) for i in range(len(toks) - n + 1)}

    sets = [brute(t) for t in texts]
    counts = np.bincount(rid, minlength=len(texts)).tolist() if len(rid) else [0] * len(texts)
    assert counts == [len(s) for s in sets]
    for i in range(len(texts)):
        for j in range(i + 1, len(texts)):
            hi = set(gh[rid == i].tolist())
            hj = set(gh[rid == j].tolist())
            assert (len(hi & hj) > 0) == (len(sets[i] & sets[j]) > 0)


@given(
    st.lists(st.text(alphabet=st.sampled_from("abcdef"), max_size=8), min_size=1, max_size=60),
    st.text(alphabet=st.sampled_from("abcdef"), max_size=8),
    st.sampled_from([1, 2]),
)
@settings(max_examples=80, deadline=None)
def test_bktree_and_symspell_match_brute_force(values, query, radius):
    """Both L6 radius-search structures must return EXACTLY the indexed
    values within the radius (sorted) — the small alphabet forces dense
    near-neighborhoods, the worst case for pruning bugs."""
    from dedupe_ray.distances import levenshtein
    from dedupe_ray.predicates import BKTree, SymSpellIndex

    vals = sorted({v for v in values if v})
    want = sorted(v for v in vals if levenshtein(query, v) <= radius)
    assert BKTree(vals).search(query, radius) == want
    assert sorted(SymSpellIndex(vals, radius).search(query)) == want


@given(st.text(alphabet=st.sampled_from("abcd"), min_size=1, max_size=6))
@settings(max_examples=40, deadline=None)
def test_lcanopy_pairs_within_radius_coblock(s):
    """Any two indexed values within the radius share a block key under the
    lcanopy predicate (the L6 recall contract)."""
    from dedupe_ray.distances import levenshtein
    from dedupe_ray.predicates import LevenshteinCanopyPredicate

    # neighbor by one substitution (distance ≤ 1)
    t = ("z" + s[1:]) if len(s) > 1 else "z"
    pred = LevenshteinCanopyPredicate("f", [s, t, "unrelatedlongvalue"], 1)
    if levenshtein(s, t) <= 1:
        assert set(pred.keys({"f": s})) & set(pred.keys({"f": t}))


@settings(max_examples=150, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=2**62), min_size=1, max_size=50),
    st.integers(min_value=1, max_value=4096),
    st.integers(min_value=1, max_value=6),
)
def test_cms_cols_range_and_determinism(vals, width, depth):
    import numpy as np

    from dedupe_ray.ops.sketch import _cms_cols

    v = np.asarray(vals, np.int64)
    a = _cms_cols(v, width, depth)
    b = _cms_cols(v, width, depth)
    assert a.shape == (depth, len(vals))
    assert (a >= 0).all() and (a < width).all()
    assert (a == b).all()
