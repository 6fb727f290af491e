"""Distance kernels: batched affine gap vs a frozen naive reference, plus
golden values (FIXTURES.md §6) and the other comparators."""

import math

import numpy as np
import pytest

from dedupe_ray.distances import (
    ABBREV_SCALE,
    GAP_OPEN,
    MATCH,
    MISMATCH,
    SPACE,
    affine_gap,
    affine_gap_batch,
    datetime_distance_batch,
    exact_distance_batch,
    price_distance_batch,
    tfidf_cosine_batch,
)


def naive_affine_gap(a: str, b: str) -> float:
    """Frozen scalar reference of the documented spec (match=1, mismatch=11,
    gap open=10, space=7, trailing-gap abbreviation ×0.125, normalized by
    len(a)+len(b); identical → 0.5)."""
    if a == b:
        return 0.5 if a else 0.0
    if len(a) < len(b):
        a, b = b, a
    la, lb = len(a), len(b)
    if lb == 0:
        return (GAP_OPEN + SPACE * la) / max(la, 1)
    INF = float("inf")
    M = [[INF] * (lb + 1) for _ in range(la + 1)]
    I = [[INF] * (lb + 1) for _ in range(la + 1)]
    D = [[INF] * (lb + 1) for _ in range(la + 1)]
    M[0][0] = 0.0
    for j in range(1, lb + 1):
        I[0][j] = GAP_OPEN + SPACE * j
    abbrev = INF
    for i in range(1, la + 1):
        bp = min(M[i - 1][lb], I[i - 1][lb], D[i - 1][lb])
        # discount only when lengths differ (affinegap activates it in rows
        # beyond the shorter string, impossible for equal lengths) — this is
        # also what makes the distance symmetric for equal-length inputs
        if la > lb and la > i - 1:
            abbrev = min(abbrev, bp + GAP_OPEN + SPACE * ABBREV_SCALE * (la - (i - 1)))
        for j in range(0, lb + 1):
            D[i][j] = min(M[i - 1][j] + GAP_OPEN + SPACE, D[i - 1][j] + SPACE)
            if j >= 1:
                sub = MATCH if a[i - 1] == b[j - 1] else MISMATCH
                M[i][j] = min(M[i - 1][j - 1], I[i - 1][j - 1], D[i - 1][j - 1]) + sub
                I[i][j] = min(M[i][j - 1] + GAP_OPEN + SPACE, I[i][j - 1] + SPACE)
    return min(M[la][lb], I[la][lb], D[la][lb], abbrev) / (la + lb)


GOLDEN = [
    ("hello", "hello", 0.5),  # identical → match·n/(2n)
    ("", "", 0.0),
    ("a", "a", 0.5),
    ("ab", "ba", (MISMATCH * 2) / 4),  # two substitutions
]


def test_golden_values():
    for a, b, want in GOLDEN:
        assert affine_gap(a, b) == pytest.approx(want, abs=1e-5), (a, b)


def test_transposition_and_abbreviation():
    # rietz/reitz: 3 matches + 2 mismatches = 25 / 10
    assert affine_gap("rietz", "reitz") == pytest.approx(2.5, abs=1e-5)
    # univ vs university: 4 matches + discounted trailing gap
    want = naive_affine_gap("univ", "university")
    assert affine_gap("univ", "university") == pytest.approx(want, abs=1e-4)
    # abbreviation must be cheaper than an interior gap of the same length
    assert affine_gap("univ", "university") < affine_gap("sity", "university")


def test_batch_matches_naive_fuzz():
    import random

    rng = random.Random(3)
    tests = []
    for _ in range(400):
        a = "".join(rng.choice("abcd ef") for _ in range(rng.randint(0, 15)))
        b = "".join(rng.choice("abcd ef") for _ in range(rng.randint(0, 15)))
        tests.append((a, b))
    got = affine_gap_batch([t[0] for t in tests], [t[1] for t in tests])
    for (a, b), g in zip(tests, got):
        assert g == pytest.approx(naive_affine_gap(a, b), abs=1e-4), (a, b)


def test_symmetry():
    # includes equal-length pairs with long differing tails — the case where
    # an unconditional abbreviation discount would break symmetry
    pairs = [
        ("kraków", "krakow"),
        ("abc", "xyzabc"),
        ("", "q"),
        ("aaaaaaaaaa'", "aaaaaa----a"),
        ("prefix-aaaaaaaa", "prefix-bbbbbbbb"),
    ]
    fwd = affine_gap_batch([p[0] for p in pairs], [p[1] for p in pairs])
    rev = affine_gap_batch([p[1] for p in pairs], [p[0] for p in pairs])
    np.testing.assert_allclose(fwd, rev, atol=1e-6)


def test_price_distance():
    d = price_distance_batch(["100", "10", "x"], ["1000", "10", "5"])
    assert d[0] == pytest.approx(1.0, abs=1e-5)  # |log10 100 - log10 1000|
    assert d[1] == pytest.approx(0.0, abs=1e-6)
    assert math.isnan(d[2])


def test_exact_distance():
    d = exact_distance_batch(["a", "b"], ["a", "c"])
    assert d.tolist() == [1.0, 0.0]


def test_datetime_distance():
    d = datetime_distance_batch(["2020-01-01", "01.02.2020"], ["2020-01-11", "01.02.2020"])
    assert d[0] == pytest.approx(math.log1p(10), abs=1e-5)
    assert d[1] == pytest.approx(0.0, abs=1e-6)


def test_tfidf_cosine():
    idf = {"acme": 3.0, "gmbh": 0.1}
    sim = tfidf_cosine_batch(["acme gmbh", "acme"], ["acme", "gmbh"], idf, 1.0)
    assert sim[0] > 0.9  # heavy shared token dominates
    assert sim[1] == 0.0


# ---- levenshtein_batch / token_align_batch --------------------------------


def naive_lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[len(b)]


def test_levenshtein_batch_matches_naive():
    from dedupe_ray.distances import levenshtein_batch

    rng = np.random.RandomState(7)
    alpha = "abcde "
    pairs = [
        ("", ""), ("", "abc"), ("abc", ""), ("abc", "abc"),
        ("kitten", "sitting"), ("flaw", "lawn"), ("gumbo", "gambol"),
    ]
    for _ in range(200):
        a = "".join(rng.choice(list(alpha), rng.randint(0, 12)))
        b = "".join(rng.choice(list(alpha), rng.randint(0, 12)))
        pairs.append((a, b))
    got = levenshtein_batch([p[0] for p in pairs], [p[1] for p in pairs])
    want = [naive_lev(a, b) for a, b in pairs]
    assert got.tolist() == want


def test_token_align_separates_replacement_from_corruption():
    from dedupe_ray.distances import token_align_batch

    a = [
        "zaklad marbenkor sp z o o",   # typo: transposed coined word
        "zaklad marbenkro sp z o o",   # vs itself below
        "zaklad marbenkor sp z o o",   # REPLACED coined word (distinct entity)
        "przedsiebiorstwo handlowe kowalski",
        "",                            # empty side
        "sp z o o",                    # only short tokens on one side
    ]
    b = [
        "zaklad marbenkro sp z o o",
        "zaklad marbenkro sp z o o",
        "zaklad tovertis sp z o o",
        "przedsiebiorstwo handlowe kowalski gmbh",
        "anything",
        "sp z oo",
    ]
    d = token_align_batch(a, b)
    # corruption: every token has a close counterpart
    assert 0 < d[0] < 0.35
    assert d[1] == 0.0
    # replacement: the coined token has no counterpart → large distance
    assert d[2] > 0.6
    # extra legal-suffix token on one side is itself unmatched (gmbh)
    assert d[3] > 0.6
    assert d[4] == 0.0
    # short-token fallback still yields a small distance for oo vs o
    assert 0 < d[5] <= 0.5


def test_token_align_symmetry_and_order_invariance():
    from dedupe_ray.distances import token_align_batch

    a = ["alpha beta gamma", "rotho GmbH"]
    b = ["gamma alpha betta", "gmbh rotha"]
    d1 = token_align_batch(a, b)
    d2 = token_align_batch(b, a)
    assert np.allclose(d1, d2)
    # token order must not matter
    assert np.isclose(d1[0], token_align_batch(["beta gamma alpha"], ["betta gamma alpha"])[0])


def test_jaro_winkler_batch_duckdb_parity():
    """Random-probe bit-parity with DuckDB's jaro_winkler_similarity —
    the property that lets jw verify stages carry hash-exact SQL oracles."""
    import duckdb

    from dedupe_ray.distances import jaro_winkler_batch

    rng = np.random.RandomState(41)
    alpha = "abcdef #-"
    a, b = [], []
    for _ in range(400):
        la, lb = rng.randint(0, 12), rng.randint(0, 12)
        s = "".join(alpha[i] for i in rng.randint(0, len(alpha), la))
        t = "".join(alpha[i] for i in rng.randint(0, len(alpha), lb))
        a.append(s)
        b.append(t)
    # pinned structural cases: equal, prefix boost, transposition, empties
    a += ["martha", "dixon", "jellyfish", "abcde", "", "x", "dwayne"]
    b += ["marhta", "dicksonx", "smellyfish", "abcde", "", "", "duane"]
    got = jaro_winkler_batch(a, b)
    con = duckdb.connect()
    exp = con.execute(
        "SELECT jaro_winkler_similarity(s, t) FROM "
        "(SELECT unnest($1::VARCHAR[]) s, unnest($2::VARCHAR[]) t)",
        [a, b],
    ).fetchnumpy()
    con.close()
    assert np.array_equal(got, next(iter(exp.values())))


def test_jaro_winkler_batch_goldens():
    from dedupe_ray.distances import jaro_winkler_batch

    got = jaro_winkler_batch(["martha", "abcde"], ["marhta", "abcde"])
    # classic Winkler example: jaro 0.944..., prefix 3 → 0.9611...
    assert math.isclose(got[0], 0.9611111111111111)
    assert got[1] == 1.0


def test_jaro_winkler_pinned_vectors():
    import numpy as np

    from dedupe_ray.distances import jaro_batch, jaro_winkler_batch

    a = ["MARTHA", "DIXON", "DWAYNE", "CRATE", "abc", "", "a"]
    b = ["MARHTA", "DICKSONX", "DUANE", "TRACE", "abc", "", "b"]
    j = jaro_batch(a, b)
    jw = jaro_winkler_batch(a, b)
    # classic Winkler-paper vectors (also DuckDB's values, bit-exact)
    assert np.allclose(j, [0.9444444444444445, 0.7666666666666666,
                           0.8222222222222223, 0.7333333333333334,
                           1.0, 0.0, 0.0], rtol=0, atol=0)
    assert np.allclose(jw, [0.9611111111111111, 0.8133333333333332,
                            0.8400000000000001, 0.7333333333333334,
                            1.0, 0.0, 0.0], rtol=0, atol=0)
    # boost only above 0.7: CRATE/TRACE has prefix 0 -> unchanged;
    # sub-threshold jaro never boosts even with a shared prefix
    low = jaro_winkler_batch(["abcdxxxxxx"], ["abcdyyyyyyzzzzzzzz"])
    lowj = jaro_batch(["abcdxxxxxx"], ["abcdyyyyyyzzzzzzzz"])
    if lowj[0] <= 0.7:
        assert low[0] == lowj[0]


def test_jaro_winkler_matches_duckdb_fuzz():
    """The oracle contract: bit-identical doubles vs DuckDB on fuzzed
    pairs (the customer_name_jw query hashes raw jw values)."""
    import duckdb
    import numpy as np

    from dedupe_ray.distances import jaro_winkler_batch

    rng = np.random.default_rng(21)
    alpha = list("abcdef #123")
    pairs = []
    for _ in range(400):
        s = "".join(rng.choice(alpha, rng.integers(0, 14)))
        t = list(s)
        for _ in range(rng.integers(0, 4)):
            if not t:
                break
            p = int(rng.integers(0, len(t)))
            t[p] = str(rng.choice(alpha))
        pairs.append((s, "".join(t)))
    con = duckdb.connect()
    want = [
        con.execute(
            "select jaro_winkler_similarity(?, ?)", [s, t]
        ).fetchone()[0]
        for s, t in pairs
    ]
    got = jaro_winkler_batch([p[0] for p in pairs], [p[1] for p in pairs])
    assert got.tolist() == want
