"""Blocking predicates — stateless block-key extractors.

Re-implements the semantics of the reference library's simple predicate pool
([lib: dedupe/predicates.py in dedupe==3.0.3], exercised through the learned
Fingerprinter at backend/dedupe_script.py:360): each predicate maps a cleaned
field value to a set of string block keys. Two records sharing any key for any
learned predicate become a candidate pair.

All functions take an already-preprocessed string (lowercase, ASCII-folded,
"N/A" sentinel for missing — see preprocess.py) and return a ``tuple[str, ...]``
of block keys. Missing values produce no keys.

The phonetic predicate uses Soundex (public-domain algorithm) standing in for
the reference's doubleMetaphone C extension, which is not installable here;
it fills the same role in the learner's pool (coarse phonetic blocking).
"""

from __future__ import annotations

import re
from typing import Callable

from dedupe_ray.config import MISSING

_WORDS = re.compile(r"[\w']+")
_INTEGERS = re.compile(r"\d+")
_START_WORD = re.compile(r"^([\w']+)")
_START_TWO_WORDS = re.compile(r"^([\w']+\s+[\w']+)")
_ALPHA_NUM = re.compile(r"\w*\d+\w*")

PredicateFn = Callable[[str], tuple[str, ...]]


def whole_field(field: str) -> tuple[str, ...]:
    return (field,)


def token_field(field: str) -> tuple[str, ...]:
    return tuple(set(_WORDS.findall(field)))


def first_token(field: str) -> tuple[str, ...]:
    m = _START_WORD.match(field)
    return (m.group(1),) if m else ()


def first_two_tokens(field: str) -> tuple[str, ...]:
    m = _START_TWO_WORDS.match(field)
    return (m.group(1),) if m else ()


def common_integer(field: str) -> tuple[str, ...]:
    return tuple({str(int(i)) for i in _INTEGERS.findall(field)})


def near_integers(field: str) -> tuple[str, ...]:
    ints = {int(i) for i in _INTEGERS.findall(field)}
    out: set[str] = set()
    for i in ints:
        out.update((str(i - 1), str(i), str(i + 1)))
    return tuple(out)


def hundred_integer(field: str) -> tuple[str, ...]:
    return tuple({str((int(i) // 100) * 100) for i in _INTEGERS.findall(field)})


def first_integer(field: str) -> tuple[str, ...]:
    m = _INTEGERS.match(field)
    return (m.group(),) if m else ()


def alpha_numeric(field: str) -> tuple[str, ...]:
    return tuple(set(_ALPHA_NUM.findall(field)))


def _ngrams(s: str, n: int) -> tuple[str, ...]:
    s = "".join(s.split())
    return tuple({s[i: i + n] for i in range(max(0, len(s) - n + 1))})


def common_four_gram(field: str) -> tuple[str, ...]:
    return _ngrams(field, 4)


def common_six_gram(field: str) -> tuple[str, ...]:
    return _ngrams(field, 6)


def _adjacent_token_grams(field: str, n: int) -> tuple[str, ...]:
    tokens = _WORDS.findall(field)
    return tuple({" ".join(tokens[i: i + n]) for i in range(len(tokens) - n + 1)})


def common_two_tokens(field: str) -> tuple[str, ...]:
    return _adjacent_token_grams(field, 2)


def common_three_tokens(field: str) -> tuple[str, ...]:
    return _adjacent_token_grams(field, 3)


def fingerprint(field: str) -> tuple[str, ...]:
    tokens = _WORDS.findall(field)
    return ("".join(sorted(tokens)),) if tokens else ()


def one_gram_fingerprint(field: str) -> tuple[str, ...]:
    s = "".join(field.split())
    return ("".join(sorted(set(s))),) if s else ()


def two_gram_fingerprint(field: str) -> tuple[str, ...]:
    s = "".join(field.split())
    if len(s) < 2:
        return ()
    return ("".join(sorted({s[i: i + 2] for i in range(len(s) - 1)})),)


def sorted_acronym(field: str) -> tuple[str, ...]:
    tokens = _WORDS.findall(field)
    return ("".join(sorted(t[0] for t in tokens)),) if tokens else ()


def _same_start(field: str, n: int) -> tuple[str, ...]:
    s = "".join(field.split())
    return (s[:n],) if s else ()


def same_three_char_start(field: str) -> tuple[str, ...]:
    return _same_start(field, 3)


def same_five_char_start(field: str) -> tuple[str, ...]:
    return _same_start(field, 5)


def same_seven_char_start(field: str) -> tuple[str, ...]:
    return _same_start(field, 7)


def suffix_array(field: str) -> tuple[str, ...]:
    s = "".join(field.split())
    if len(s) < 5:
        return ()
    return tuple({s[i:] for i in range(0, len(s) - 4)})


_SOUNDEX_MAP = str.maketrans(
    "bfpvcgjkqsxzdtlmnr", "111122222222334556"
)


def _soundex_one(word: str) -> str:
    word = re.sub(r"[^a-z]", "", word)
    if not word:
        return ""
    first = word[0]
    digits = word.translate(_SOUNDEX_MAP)
    code = first.upper()
    prev = digits[0] if digits[0] in "123456" else ""
    for ch, d in zip(word[1:], digits[1:]):
        d = d if d in "123456" else ""
        if d and d != prev:
            code += d
        if ch not in "hw":
            prev = d
        if len(code) == 4:
            break
    return (code + "000")[:4]


def phonetic_token(field: str) -> tuple[str, ...]:
    """Soundex per token (stand-in for metaphoneToken / doubleMetaphone)."""
    return tuple({_soundex_one(t) for t in _WORDS.findall(field) if _soundex_one(t)})


def phonetic_first_token(field: str) -> tuple[str, ...]:
    m = _START_WORD.match(field)
    if not m:
        return ()
    c = _soundex_one(m.group(1))
    return (c,) if c else ()


_VOWELS = "aeiou"


def _metaphone_one(word: str) -> str:
    """Classic Metaphone (Lawrence Philips 1990 — public algorithm),
    standing in for the reference's doubleMetaphone C extension
    ([lib: dedupe/predicates.py metaphoneToken]; not installable here).
    Catches the consonant-class conflations Soundex misses (PH→F, GH
    silences, soft C/G, SH/TIA→X, TH→0)."""
    w = re.sub(r"[^a-z]", "", word.lower())
    if not w:
        return ""
    # initial-cluster transforms
    for pre, rep in (("ae", "e"), ("gn", "n"), ("kn", "n"), ("pn", "n"),
                     ("wr", "r"), ("wh", "w")):
        if w.startswith(pre):
            w = rep + w[len(pre):]
            break
    if w[0] == "x":
        w = "s" + w[1:]
    out = []
    n = len(w)
    i = 0
    while i < n:
        c = w[i]
        # drop duplicate adjacent letters except c
        if c != "c" and i > 0 and w[i - 1] == c:
            i += 1
            continue
        nxt = w[i + 1] if i + 1 < n else ""
        nxt2 = w[i + 2] if i + 2 < n else ""
        if c in _VOWELS:
            if i == 0:
                out.append(c.upper())
        elif c == "b":
            if not (i == n - 1 and i > 0 and w[i - 1] == "m"):
                out.append("B")
        elif c == "c":
            if nxt == "i" and nxt2 == "a":
                out.append("X")
            elif nxt == "h":
                out.append("K" if i > 0 and w[i - 1] == "s" else "X")
                i += 1
            elif nxt in "iey":
                out.append("S")
            else:
                out.append("K")
        elif c == "d":
            if nxt == "g" and nxt2 in "eiy":
                out.append("J")
                i += 2
            else:
                out.append("T")
        elif c == "g":
            if nxt == "h":
                if i + 2 < n and w[i + 2] in _VOWELS:
                    out.append("K")
                i += 1  # else silent (gh at end / before consonant)
            elif nxt == "n":
                pass  # silent (gn, gned)
            elif nxt in "iey":
                out.append("J")
            else:
                out.append("K")
        elif c == "h":
            if i > 0 and w[i - 1] in _VOWELS and nxt not in _VOWELS:
                pass  # silent
            else:
                out.append("H")
        elif c == "k":
            if not (i > 0 and w[i - 1] == "c"):
                out.append("K")
        elif c == "p":
            if nxt == "h":
                out.append("F")
                i += 1
            else:
                out.append("P")
        elif c == "q":
            out.append("K")
        elif c == "s":
            if nxt == "h":
                out.append("X")
                i += 1
            elif nxt == "i" and nxt2 in "oa":
                out.append("X")
            else:
                out.append("S")
        elif c == "t":
            if nxt == "i" and nxt2 in "oa":
                out.append("X")
            elif nxt == "h":
                out.append("0")
                i += 1
            elif nxt == "c" and nxt2 == "h":
                pass  # silent in -tch-
            else:
                out.append("T")
        elif c == "v":
            out.append("F")
        elif c == "w":
            if nxt in _VOWELS:
                out.append("W")
        elif c == "x":
            out.append("KS")
        elif c == "y":
            if nxt in _VOWELS:
                out.append("Y")
        elif c == "z":
            out.append("S")
        elif c in "flmnr":
            out.append(c.upper())
        elif c == "j":
            out.append("J")
        i += 1
    # collapse equal adjacent output codes (dt → TT → T etc.) — input-level
    # dedup alone misses clusters that map to the same code
    code = "".join(out)
    return re.sub(r"(.)\1+", r"\1", code)


def metaphone_token(field: str) -> tuple[str, ...]:
    """Metaphone per token (closer stand-in for metaphoneToken than the
    Soundex 'phonetic' predicate, which is kept for settings compat)."""
    return tuple({_metaphone_one(t) for t in _WORDS.findall(field) if _metaphone_one(t)})


def metaphone_first_token(field: str) -> tuple[str, ...]:
    m = _START_WORD.match(field)
    if not m:
        return ()
    c = _metaphone_one(m.group(1))
    return (c,) if c else ()


def double_metaphone_token(field: str) -> tuple[str, ...]:
    """Double Metaphone per token, emitting BOTH primary and alternate
    codes — the reference's metaphoneToken semantics ([lib:
    dedupe/predicates.py], which unions every non-empty code from
    doublemetaphone(token)). Two records block together when ANY token's
    primary or alternate code matches, so Slavic/Germanic/Romance spelling
    variants (Smith↔Schmidt) land in one block."""
    from dedupe_ray.phonetic import double_metaphone

    out: set[str] = set()
    for t in _WORDS.findall(field):
        for code in double_metaphone(t):
            if code:
                out.add(code)
    return tuple(out)


def double_metaphone_first_token(field: str) -> tuple[str, ...]:
    from dedupe_ray.phonetic import double_metaphone

    m = _START_WORD.match(field)
    if not m:
        return ()
    return tuple(c for c in double_metaphone(m.group(1)) if c)


def deletion_neighborhood(field: str) -> tuple[str, ...]:
    """L6 stand-in: FastSS/SymSpell-style single-deletion neighborhood
    (public: Bocek et al. 2007 "Fast Similarity Search in Large
    Dictionaries"). Two values within edit distance 1 — and most adjacent
    transpositions — share a deletion key, giving BK-tree-class recall as a
    STATELESS predicate (no index actor needed). Whitespace is collapsed so
    word-boundary shifts also collide; values longer than 24 chars emit only
    the collapsed whole value (long strings are better served by n-gram/
    token predicates, and key fan-out must stay bounded)."""
    s = "".join(field.split())
    if not s:
        return ()
    if len(s) > 24:
        return (s,)
    return tuple({s} | {s[:i] + s[i + 1:] for i in range(len(s))})


def deletion_neighborhood2(field: str) -> tuple[str, ...]:
    """L6 full-strength stand-in at radius 2: SymSpell/FastSS deletion
    neighborhood of depth ≤2 (public: Bocek et al. 2007; Garbe's SymSpell).
    Any two values within edit distance 2 (including multi-substitution
    short-field typos — the postal-code class the BK-tree radius search
    catches in [lib] dedupe/levenshtein.py) share a deletion key. Fan-out
    is O(len²/2), so only values ≤12 chars (whitespace collapsed) get the
    depth-2 expansion; longer values degrade to the depth-1 neighborhood
    (long strings are better served by n-gram/token predicates)."""
    s = "".join(field.split())
    if not s:
        return ()
    if len(s) > 12:
        return deletion_neighborhood(field)
    d1 = {s[:i] + s[i + 1:] for i in range(len(s))}
    keys = {s} | d1
    for t in d1:
        keys.update(t[:i] + t[i + 1:] for i in range(len(t)))
    return tuple(keys)


# Registry: predicate name → fn. Names are stable identifiers used in learned
# predicate lists, checkpoints, and block keys.
SIMPLE_PREDICATES: dict[str, PredicateFn] = {
    "whole": whole_field,
    "token": token_field,
    "tok1": first_token,
    "tok2": first_two_tokens,
    "int": common_integer,
    "nearint": near_integers,
    "hundint": hundred_integer,
    "firstint": first_integer,
    "alphanum": alpha_numeric,
    "4gram": common_four_gram,
    "6gram": common_six_gram,
    "2tok": common_two_tokens,
    "3tok": common_three_tokens,
    "fprint": fingerprint,
    "1gfprint": one_gram_fingerprint,
    "2gfprint": two_gram_fingerprint,
    "acronym": sorted_acronym,
    "start3": same_three_char_start,
    "start5": same_five_char_start,
    "start7": same_seven_char_start,
    "suffix": suffix_array,
    "phonetic": phonetic_token,
    "phonetic1": phonetic_first_token,
    "del1": deletion_neighborhood,
    "del2": deletion_neighborhood2,
    "mphone": metaphone_token,
    "mphone1": metaphone_first_token,
    "dmphone": double_metaphone_token,
    "dmphone1": double_metaphone_first_token,
}


def register_predicate(name: str, fn: PredicateFn, overwrite: bool = False) -> None:
    """User-extension surface ([lib: dedupe/variables/base.py] custom
    Variable ``predicates``): add a simple predicate family usable in
    predicate ids (``"<name>|<field>"``), compounds, and the blocking
    explode. ``fn(value) -> tuple[str, ...]`` must be a pure function of
    the cell value; it ships to Ray workers inside task closures, so it
    must be cloudpickle-able (a module-level function from an importable
    module, or a self-contained nested function shipped by value — not a
    method bound to unpicklable state)."""
    if not overwrite and name in SIMPLE_PREDICATES:
        raise ValueError(f"predicate {name!r} already registered")
    if "|" in name or "+" in name:
        raise ValueError("predicate names must not contain '|' or '+'")
    SIMPLE_PREDICATES[name] = fn


class Predicate:
    """A (predicate fn, field) pair with a stable id, optionally compound.

    Simple: id ``"tok1|City"``. Compound (conjunction of two simples — [lib:
    dedupe/predicates.py CompoundPredicate, compound_length=2]): id
    ``"tok1|City+int|Postal Code"``; keys are the cartesian product joined
    with ':'.
    """

    __slots__ = ("pid", "parts")

    def __init__(self, pid: str, parts: list[tuple[str, str]]):
        self.pid = pid
        self.parts = [(SIMPLE_PREDICATES[p], f) for p, f in parts]

    @staticmethod
    def simple(pred_name: str, field: str) -> "Predicate":
        return Predicate(f"{pred_name}|{field}", [(pred_name, field)])

    @staticmethod
    def compound(a: "Predicate", b: "Predicate", spec_a: tuple[str, str], spec_b: tuple[str, str]) -> "Predicate":
        return Predicate(f"{a.pid}+{b.pid}", [spec_a, spec_b])

    @staticmethod
    def from_id(pid: str) -> "Predicate":
        parts = []
        for piece in pid.split("+"):
            name, field = piece.split("|", 1)
            parts.append((name, field))
        return Predicate(pid, parts)

    def keys(self, record: dict[str, str]) -> tuple[str, ...]:
        out: tuple[str, ...] | None = None
        for fn, field in self.parts:
            value = record.get(field) or ""
            if value == MISSING or not value:
                return ()
            ks = fn(value)
            if not ks:
                return ()
            if out is None:
                out = ks
            else:
                out = tuple(f"{x}:{y}" for x in out for y in ks)
        return out or ()

    def keys_from_value(self, value: str) -> tuple[str, ...]:
        """Simple-predicate fast path used by vectorized explode."""
        assert len(self.parts) == 1
        if value == MISSING or not value:
            return ()
        return self.parts[0][0](value)

    def __repr__(self) -> str:  # pragma: no cover
        return f"Predicate({self.pid})"


def default_predicate_pool(field_names: list[str]) -> list[Predicate]:
    """All simple predicates × fields — the learner's candidate pool."""
    return [Predicate.simple(p, f) for f in field_names for p in SIMPLE_PREDICATES]


# ---------------------------------------------------------------------------
# Index predicate: TF-IDF char-n-gram canopy ([lib: dedupe/predicates.py
# TfidfNGramCanopyPredicate / canopy_index.py], SURVEY L5)
# ---------------------------------------------------------------------------


class NGramCanopyPredicate:
    """Deterministic, partition-stable reformulation of dedupe's TF-IDF
    n-gram canopy: a record's block keys are its ``k`` RAREST character
    n-grams (highest idf). Two values sharing any sufficiently-rare n-gram
    land in a block — the same fuzzy-blocking effect as center-based
    canopies, without the order-dependent center selection the reference's
    in-memory index relies on (SURVEY §7.4.2).

    State: a document-frequency table, built at train time from the cost
    sample, persisted in the settings checkpoint and broadcast to blocking
    tasks (char-n-gram key space is bounded ≈ alphabet^n, so the table stays
    broadcastable at any corpus size).

    Predicate id: ``canopy4|<field>`` (n is fixed at 4, k at 2).
    """

    N = 4
    K = 2

    def __init__(self, field: str, df: dict[str, int], n_docs: int):
        self.pid = f"canopy{self.N}|{field}"
        self.field = field
        self.df = df
        self.n_docs = max(n_docs, 1)
        self.parts = [(self.keys_from_value, field)]  # explode-stage protocol

    @staticmethod
    def grams(value: str, n: int = 4) -> list[str]:
        s = "".join(value.split())
        return [s[i: i + n] for i in range(max(0, len(s) - n + 1))]

    def keys_from_value(self, value: str) -> tuple[str, ...]:
        if not value or value == MISSING:
            return ()
        gs = set(self.grams(value, self.N))
        if not gs:
            return ()
        # rarest first; deterministic tiebreak on the gram itself
        ranked = sorted(gs, key=lambda g: (self.df.get(g, 0), g))
        return tuple(ranked[: self.K])

    def keys(self, record: dict[str, str]) -> tuple[str, ...]:
        return self.keys_from_value(record.get(self.field) or "")


class TfidfTokenCanopyPredicate:
    """L5 token TF-IDF canopy ([lib: dedupe/tfidf.py, canopy_index.py],
    thresholds {.2,.4,.6,.8}) — deterministic, partition-stable
    reformulation.

    The reference builds an in-memory inverted index and assigns records to
    sequentially-chosen canopy centers (order-dependent, unshardable). Here
    a record's block keys at threshold ``t`` are its tokens whose L2-
    normalized TF-IDF weight is ≥ √t: two records sharing such a token have
    TF-IDF cosine ≥ t — the canopy membership guarantee — and weight² sums
    to 1, so fan-out is bounded by ⌊1/t⌋ keys per record at any corpus
    size. Unlike ``token|field`` (a key per token — huge blocks on common
    tokens), only DOMINANT rare tokens emit keys, which is the whole point
    of TF-IDF canopies on long text fields.

    State: a token document-frequency table from the cost sample, persisted
    in the settings checkpoint like the n-gram canopy DF."""

    THRESHOLDS = (0.2, 0.4, 0.6, 0.8)

    def __init__(self, field: str, df: dict[str, int], n_docs: int, threshold: float):
        self.pid = f"tcanopy{threshold}|{field}"
        self.field = field
        self.df = df
        self.n_docs = max(n_docs, 1)
        self.threshold = threshold
        self.parts = [(self.keys_from_value, field)]  # explode-stage protocol

    def _idf(self, tok: str) -> float:
        import math

        return max(math.log(self.n_docs / (1 + self.df.get(tok, 0))) + 1.0, 0.01)

    def keys_from_value(self, value: str) -> tuple[str, ...]:
        import math

        if not value or value == MISSING:
            return ()
        toks = _WORDS.findall(value)
        if not toks:
            return ()
        tf: dict[str, int] = {}
        for t in toks:
            tf[t] = tf.get(t, 0) + 1
        w = {t: c * self._idf(t) for t, c in tf.items()}
        norm = math.sqrt(sum(v * v for v in w.values()))
        cut = math.sqrt(self.threshold) * norm
        return tuple(sorted(t for t, v in w.items() if v >= cut))

    def keys(self, record: dict[str, str]) -> tuple[str, ...]:
        return self.keys_from_value(record.get(self.field) or "")


class BKTree:
    """Burkhard–Keller metric tree over Levenshtein distance (public:
    Burkhard & Keller 1973) — the reference library's L6 canopy index
    structure [lib: dedupe/levenshtein.py LevenshteinCanopyPredicate].

    Both build and search are BATCHED so the O(n²) scalar-call overhead
    never appears: construction groups all values by their distance to the
    subtree root in ONE ``levenshtein_batch`` call per node (canonical
    bulk build), and search expands a frontier level by level, computing
    the whole level's distances in one call. Triangle inequality prune:
    a child at edge distance e can hold radius-r matches only if
    ``|d(q, node) − e| ≤ r``. Deterministic: values are sorted before
    build, so tree shape and search output are parallelism-stable."""

    __slots__ = ("root",)

    def __init__(self, values: list[str]):
        from dedupe_ray.distances import levenshtein_batch

        vals = sorted({v for v in values if v})
        self.root = self._build(vals, levenshtein_batch)

    @staticmethod
    def _build(vals: list[str], lev_batch):
        if not vals:
            return None
        root = vals[0]
        rest = vals[1:]
        node: list = [root, {}]
        if not rest:
            return node
        d = lev_batch(rest, [root] * len(rest))
        groups: dict[int, list[str]] = {}
        for v, dist in zip(rest, d.tolist()):
            if dist > 0:
                groups.setdefault(dist, []).append(v)
        node[1] = {e: BKTree._build(g, lev_batch) for e, g in sorted(groups.items())}
        return node

    def search(self, query: str, radius: int) -> list[str]:
        """All indexed values within edit distance ``radius`` of ``query``
        (sorted). Frontier-batched: one distance kernel call per level."""
        from dedupe_ray.distances import levenshtein_batch

        if self.root is None:
            return []
        out: list[str] = []
        frontier = [self.root]
        while frontier:
            vals = [n[0] for n in frontier]
            d = levenshtein_batch([query] * len(vals), vals)
            nxt: list = []
            for node, dist in zip(frontier, d.tolist()):
                if dist <= radius:
                    out.append(node[0])
                for e, child in node[1].items():
                    if abs(dist - e) <= radius:
                        nxt.append(child)
            frontier = nxt
        return sorted(out)


def _deletions(s: str, depth: int) -> set[str]:
    """All strings reachable from ``s`` by ≤ ``depth`` character deletions
    (including ``s`` itself) — no length cap (unlike the map-side ``del2``
    predicate, whose fan-out must stay bounded without an index)."""
    out = {s}
    frontier = {s}
    for _ in range(depth):
        frontier = {t[:i] + t[i + 1 :] for t in frontier for i in range(len(t))}
        out |= frontier
    return out


class SymSpellIndex:
    """Exact Levenshtein radius search via deletion keys (public: FastSS,
    Bocek et al. 2007; Garbe's SymSpell): if lev(u, v) ≤ r then deleting
    ≤ r characters from each reaches a common string, so the union of the
    query's depth-r deletion buckets is a complete candidate set; true
    ``levenshtein_batch`` verification then makes the result EXACT. Query
    cost is O(C(len, r)) dict lookups + a small batched verify — orders of
    magnitude faster than walking a BK-tree at radius 2, at the price of
    O(n·lenʳ) index memory (fine for sample-sized canopy indexes)."""

    def __init__(self, values: list[str], radius: int):
        self.radius = radius
        self.values = sorted({v for v in values if v})
        self.buckets: dict[str, list[int]] = {}
        for i, v in enumerate(self.values):
            for k in _deletions(v, radius):
                self.buckets.setdefault(k, []).append(i)

    def search(self, query: str, radius: int | None = None) -> list[str]:
        from dedupe_ray.distances import levenshtein_batch

        r = self.radius if radius is None else min(radius, self.radius)
        cand_ids: set[int] = set()
        for k in _deletions(query, r):
            cand_ids.update(self.buckets.get(k, ()))
        if not cand_ids:
            return []
        cands = [self.values[i] for i in sorted(cand_ids)]
        d = levenshtein_batch([query] * len(cands), cands)
        return [c for c, dist in zip(cands, d.tolist()) if dist <= r]


class LevenshteinCanopyPredicate:
    """L6 Levenshtein radius canopy [lib: dedupe/levenshtein.py] — a TRUE
    radius search at arbitrary edit distance (supersedes the bounded
    ``del2`` deletion-neighborhood stand-in, which stays in the pool for
    its map-side zero-state cheapness). Backed by :class:`SymSpellIndex`
    (exact; ~400× faster per query than the :class:`BKTree` walk at
    radius 2 — the tree remains available for driver-side use).

    Block keys of a value are the INDEXED values within ``radius`` of it
    (the reference's index-predicate semantics: keys ⊆ index). Two values
    within ``radius`` of a common indexed center co-block; any indexed
    pair within ``radius`` of each other co-blocks directly. Index state
    is the distinct field values of the learner's cost sample — the same
    sample-derived state the TF-IDF canopies persist — and round-trips
    through the settings checkpoint as a plain value list (the index
    rebuilds on load; build is deterministic)."""

    RADII = (1, 2)

    def __init__(self, field: str, values: list[str], radius: int):
        self.pid = f"lcanopy{radius}|{field}"
        self.field = field
        self.radius = radius
        self.index = SymSpellIndex(
            [v for v in values if v and v != MISSING], radius
        )
        self.values = self.index.values
        self.parts = [(self.keys_from_value, field)]  # explode-stage protocol

    def keys_from_value(self, value: str) -> tuple[str, ...]:
        if not value or value == MISSING:
            return ()
        return tuple(self.index.search(value))

    def keys(self, record: dict[str, str]) -> tuple[str, ...]:
        return self.keys_from_value(record.get(self.field) or "")


def token_df(values: list[str]) -> dict[str, int]:
    """Token document-frequency table (driver-side, from a sample)."""
    from collections import Counter

    df: Counter = Counter()
    for v in values:
        if v and v != MISSING:
            df.update(set(_WORDS.findall(v)))
    return dict(df)


def ngram_df(values: list[str], n: int = 4) -> dict[str, int]:
    """Document-frequency table over char n-grams (driver-side, from a
    sample — idf RANKING is what matters, not absolute counts)."""
    from collections import Counter

    df: Counter = Counter()
    for v in values:
        if v and v != MISSING:
            df.update(set(NGramCanopyPredicate.grams(v, n)))
    return dict(df)
