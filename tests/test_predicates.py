"""Predicate functions on a toy table (FIXTURES.md §6) — expected key sets."""

from dedupe_ray.config import MISSING
from dedupe_ray.predicates import (
    SIMPLE_PREDICATES,
    Predicate,
    default_predicate_pool,
)


def test_whole_and_tokens():
    assert SIMPLE_PREDICATES["whole"]("acme gmbh") == ("acme gmbh",)
    assert set(SIMPLE_PREDICATES["token"]("acme acme gmbh")) == {"acme", "gmbh"}
    assert SIMPLE_PREDICATES["tok1"]("acme gmbh") == ("acme",)
    assert SIMPLE_PREDICATES["tok2"]("acme gmbh x") == ("acme gmbh",)
    assert SIMPLE_PREDICATES["tok2"]("single") == ()


def test_integer_predicates():
    assert set(SIMPLE_PREDICATES["int"]("ul. 18 apt 007")) == {"18", "7"}
    assert set(SIMPLE_PREDICATES["nearint"]("5")) == {"4", "5", "6"}
    assert SIMPLE_PREDICATES["hundint"]("1234") == ("1200",)
    assert SIMPLE_PREDICATES["firstint"]("18a") == ("18",)
    assert SIMPLE_PREDICATES["firstint"]("x18") == ()


def test_ngrams_and_fingerprints():
    assert set(SIMPLE_PREDICATES["4gram"]("ab cd ef")) == {"abcd", "bcde", "cdef"}
    assert SIMPLE_PREDICATES["fprint"]("beta alpha") == ("alphabeta",)
    assert SIMPLE_PREDICATES["1gfprint"]("aab b") == ("ab",)
    assert SIMPLE_PREDICATES["2gfprint"]("abab") == ("abba",)
    assert SIMPLE_PREDICATES["acronym"]("deep blue sea") == ("bds",)


def test_prefix_and_suffix():
    assert SIMPLE_PREDICATES["start3"]("kraków") == ("kra",)
    assert SIMPLE_PREDICATES["start5"]("kra ków") == ("krakó",)  # de-spaced
    sufs = set(SIMPLE_PREDICATES["suffix"]("abcdefgh"))
    assert "abcdefgh" in sufs and "defgh" in sufs and "efgh" not in sufs


def test_phonetic():
    # classic Soundex: Robert/Rupert → R163
    assert SIMPLE_PREDICATES["phonetic"]("robert") == SIMPLE_PREDICATES["phonetic"]("rupert")
    assert SIMPLE_PREDICATES["phonetic1"]("smith co") == SIMPLE_PREDICATES["phonetic1"]("smyth inc")


def test_missing_produces_no_keys():
    p = Predicate.simple("whole", "City")
    assert p.keys({"City": MISSING}) == ()
    assert p.keys({"City": ""}) == ()
    assert p.keys({}) == ()


def test_compound_cartesian():
    p = Predicate.from_id("tok1|City+firstint|Postal")
    keys = p.keys({"City": "new york", "Postal": "123-45"})
    assert keys == ("new:123",)
    # either side missing → no keys
    assert p.keys({"City": "x", "Postal": "no digits"}) == ()


def test_roundtrip_ids():
    for pred in default_predicate_pool(["A", "B"])[:10]:
        clone = Predicate.from_id(pred.pid)
        rec = {"A": "alpha beta 12", "B": "x9"}
        assert clone.keys(rec) == pred.keys(rec)


def test_typo_audit_backstop_extends_cover():
    """learn_predicates must not stop at covering the labeled matches: the
    synthetic typo audit forces predicates that survive transposition /
    word-shift corruption even when every LABEL is an exact copy."""
    from dedupe_ray.config import EngineConfig
    from dedupe_ray.learning import _typo_audit_pairs, learn_predicates
    from dedupe_ray.predicates import Predicate

    import numpy as np

    rng = np.random.RandomState(5)
    firsts = ["alpha", "bravo", "carlo", "delta", "elena", "frank", "grace", "henry"]
    seconds = ["markon", "belzor", "quilar", "zindel", "orvani", "teplik"]
    records = {
        str(i): {
            "Name": f"{firsts[rng.randint(len(firsts))]} {seconds[rng.randint(len(seconds))]}{i}",
            "City": f"city{rng.randint(6)}",
        }
        for i in range(60)
    }
    # labels: exact copies only — cover alone would settle for whole|Name
    match_pairs = [(records[str(i)], dict(records[str(i)])) for i in range(8)]
    config = EngineConfig.auto_detect(["Name", "City"])
    chosen, _ = learn_predicates(match_pairs, records, config, cost_records=records)

    # a transposed-name + replaced-city pair must share a key under the set
    base = records["0"]
    v = base["Name"]
    corrupted = {"Name": v[:3] + v[4] + v[3] + v[5:], "City": "cityX"}
    covered = any(
        set(Predicate.from_id(pid).keys(base)) & set(Predicate.from_id(pid).keys(corrupted))
        for pid in chosen
        if not pid.startswith("canopy")
    )
    assert covered, chosen


def test_deletion_neighborhood_predicate():
    """L6 stand-in (FastSS deletion neighborhood): values within edit
    distance 1 — and adjacent transpositions — share a key."""
    from dedupe_ray.predicates import deletion_neighborhood as dn

    def share(a, b):
        return bool(set(dn(a)) & set(dn(b)))

    assert share("12345", "12345")        # exact
    assert share("12345", "1235")         # deletion
    assert share("12345", "12a45")        # substitution
    assert share("12345", "123456")       # insertion at end... same prefix key
    assert share("kruger", "krguer")      # adjacent transposition
    assert share("ab cd", "abc d")        # word-boundary shift (whitespace collapsed)
    assert not share("12345", "99999")
    # long values degrade to whole-value key (bounded fan-out)
    long = "x" * 30
    assert dn(long) == ("x" * 30,)
