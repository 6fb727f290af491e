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


def test_tfidf_token_canopy_semantics():
    """L5 token canopy: keys are tokens with normalized TF-IDF weight >=
    sqrt(threshold) — dominant RARE tokens collide, common tokens don't."""
    from dedupe_ray.predicates import TfidfTokenCanopyPredicate, token_df

    corpus = ["the quick fox"] * 50 + ["the slow dog"] * 49 + ["the zyzzyva special"]
    df = token_df(corpus)
    p02 = TfidfTokenCanopyPredicate("F", df, len(corpus), 0.2)
    p08 = TfidfTokenCanopyPredicate("F", df, len(corpus), 0.8)

    # a rare token dominating the value is a key at every threshold
    assert "zyzzyva" in p02.keys_from_value("the zyzzyva special")
    # 'the' appears in every doc: tiny idf, never a key
    assert "the" not in p02.keys_from_value("the quick fox")
    # two long values sharing only the dominant rare token collide at 0.2
    ka = set(p02.keys_from_value("zyzzyva import export gmbh"))
    kb = set(p02.keys_from_value("trading house zyzzyva warsaw"))
    assert ka & kb
    # at 0.8 the shared token must dominate BOTH values — these don't collide
    ka8 = set(p08.keys_from_value("zyzzyva import export gmbh"))
    kb8 = set(p08.keys_from_value("trading house zyzzyva warsaw"))
    assert not (ka8 & kb8)
    # fan-out bound: <= floor(1/t) keys
    for val in corpus:
        assert len(p02.keys_from_value(val)) <= 5
        assert len(p08.keys_from_value(val)) <= 1
    # missing/empty emit nothing
    assert p02.keys_from_value("N/A") == ()
    assert p02.keys_from_value("") == ()


def test_tfidf_token_canopy_in_learner_pool_and_explode(ray_session):
    """The learner pool contains tcanopy predicates; a planted long-text
    duplicate pair sharing only a dominant rare token is covered by one,
    and the explode stage reconstructs it from persisted index tables."""
    import pyarrow as pa
    import ray.data as rd

    from dedupe_ray.blocking import make_block_explode_stage
    from dedupe_ray.learning import learn_predicates
    from dedupe_ray.config import EngineConfig
    from dedupe_ray.predicates import TfidfTokenCanopyPredicate, token_df

    common = [f"acme logistics warehouse unit {i}" for i in range(60)]
    a = "zyzzyva import export gmbh"
    b = "zyzzyva trading house warsaw"
    records = {str(i): {"doc_id": str(i), "Name": v} for i, v in enumerate(common + [a, b])}
    config = EngineConfig.auto_detect(["Name"])
    chosen, tables = learn_predicates(
        [({"Name": a}, {"Name": b})], records, config, compound=False
    )
    # some canopy (token or n-gram) family must cover the planted pair
    df = token_df([r["Name"] for r in records.values()])
    tp = TfidfTokenCanopyPredicate("Name", df, len(records), 0.2)
    assert set(tp.keys_from_value(a)) & set(tp.keys_from_value(b))

    # explode roundtrip from index tables (as persisted settings would)
    pid = tp.pid
    tables = {pid: {"field": "Name", "df": df, "n_docs": len(records), "threshold": 0.2}}
    stage = make_block_explode_stage([pid], index_tables=tables)
    tbl = pa.table({"doc_id": ["x", "y"], "Name": [a, b]})
    out = stage(tbl)
    keys = out.column("block_key").to_pylist()
    assert len(keys) >= 2 and len(set(keys)) < len(keys) or (
        sorted(out.column("doc_id").to_pylist()) == ["x", "y"]
    )
    by_doc = {}
    for k, d in zip(keys, out.column("doc_id").to_pylist()):
        by_doc.setdefault(d, set()).add(k)
    assert by_doc["x"] & by_doc["y"]


def test_deletion_neighborhood2_distance2():
    """L6 radius-2: short-field values within edit distance 2 share a key."""
    from dedupe_ray.predicates import deletion_neighborhood2 as dn2

    def share(a, b):
        return bool(set(dn2(a)) & set(dn2(b)))

    assert share("60-171", "60-171")   # exact
    assert share("60-171", "63-271")   # two substitutions
    assert share("60-171", "6-17")     # two deletions
    assert share("60-171", "061-171")  # insertion + transposition
    assert share("907 01", "90701x")   # whitespace collapse + insertion
    assert not share("60-171", "99-999")
    # long values degrade to the depth-1 neighborhood (bounded fan-out)
    long = "abcdefghijklmnop"
    assert len(dn2(long)) <= len(long) + 1


def test_metaphone_conflations():
    """Metaphone (Philips 1990) catches consonant-class variants Soundex
    misses or mis-groups."""
    from dedupe_ray.predicates import _metaphone_one as m

    assert m("philip") == m("filip")          # PH -> F
    assert m("night") == m("nite")            # GH silent
    assert m("schmidt") == m("schmitt")       # D/T conflate
    assert m("wright") == m("rite")           # WR -> R, GH silent
    assert m("catherine") == m("katherine")   # hard C/K
    assert m("xavier")[0] == "S"              # initial X -> S
    assert m("knight") == m("night")          # KN -> N
    assert m("smith") != m("smid")            # TH (0) vs D (T) differ
    assert m("") == ""


def test_metaphone_token_predicate():
    from dedupe_ray.predicates import metaphone_token

    assert set(metaphone_token("philip morris")) & set(metaphone_token("filip morys"))
    assert metaphone_token("") == ()


def test_double_metaphone_vectors():
    """Canonical Double Metaphone vectors (Philips, DDJ June 2000) —
    exercises the Germanic/Slavic/Romance branch rules the single-code
    Metaphone lacks."""
    from dedupe_ray.phonetic import double_metaphone as dm

    assert dm("smith") == ("SM0", "XMT")
    assert dm("schmidt") == ("XMT", "SMT")
    assert dm("snider") == ("SNTR", "XNTR")
    assert dm("schneider") == ("XNTR", "SNTR")
    assert dm("wasserman") == ("ASRMN", "FSRMN")
    assert dm("vasserman") == ("FSRMN", "FSRMN")
    assert dm("filipowicz") == ("FLPTS", "FLPFX")
    assert dm("michael") == ("MKL", "MXL")
    assert dm("thomas") == ("TMS", "TMS")
    assert dm("school") == ("SKL", "SKL")
    assert dm("ghislane") == ("JLN", "JLN")
    assert dm("ghost") == ("KST", "KST")
    assert dm("hugh") == ("H", "H")
    assert dm("jose") == ("HS", "HS")
    assert dm("caesar") == ("SSR", "SSR")
    assert dm("chianti") == ("KNT", "KNT")
    assert dm("accident") == ("AKSTNT", "AKSTNT")
    assert dm("edgar") == ("ATKR", "ATKR")
    assert dm("edge") == ("AJ", "AJ")
    assert dm("cabrillo") == ("KPRL", "KPR")
    assert dm("zhao") == ("J", "J")
    assert dm("xavier") == ("SF", "SFR")
    assert dm("knight") == ("NT", "NT")
    assert dm("aubrey") == ("APR", "APR")
    assert dm("") == ("", "")
    assert dm("123") == ("", "")


def test_double_metaphone_predicate_cross_spelling_blocks():
    """dmphone blocks cross-language spelling variants together via the
    alternate code — the collisions that motivate doubleMetaphone over
    Metaphone/Soundex in the reference's predicate pool."""
    from dedupe_ray.predicates import (
        SIMPLE_PREDICATES,
        double_metaphone_token,
        double_metaphone_first_token,
    )

    assert "dmphone" in SIMPLE_PREDICATES and "dmphone1" in SIMPLE_PREDICATES
    for a, b in [
        ("smith gmbh", "schmidt gmbh"),
        ("wasserman", "vasserman"),
        ("jan filipowicz", "jan filipowitz"),
        ("snider co", "schneider co"),
    ]:
        assert set(double_metaphone_token(a)) & set(double_metaphone_token(b)), (a, b)
    assert set(double_metaphone_first_token("smith co")) & set(
        double_metaphone_first_token("schmidt ag")
    )
    assert double_metaphone_token("") == ()
    assert double_metaphone_first_token("") == ()


def test_nysiis_published_vectors():
    from dedupe_ray.phonetic import nysiis

    vectors = {
        "Catherine": "CATARAN",
        "Katherine": "CATARAN",
        "Katerina": "CATARAN",
        "Jonathan": "JANATAN",
        "Johnathan": "JANATAN",
        "John": "JAN",
        "Teresa": "TARAS",
        "Theresa": "TARAS",
        "Jessica": "JASAC",
        "Worthy": "WARTY",
        "Ogata": "OGAT",
        "Knuth": "NAT",
        "montgomery": "MANTGANARY",
        "Costales": "CASTAL",
        "Tu": "T",
        "martincevic": "MARTANCAFAC",
    }
    for word, want in vectors.items():
        assert nysiis(word) == want, word
    # spelling variants of one surname collide (the point of the code)
    assert nysiis("MacDonald") == nysiis("McDonald")
    assert nysiis("Phillips") == nysiis("Philips")
    # robustness: empty / non-alpha
    assert nysiis("") == ""
    assert nysiis("123") == ""
    assert nysiis("O'Brien") == nysiis("OBrien")
