"""Deterministic synthetic fixtures (FIXTURES.md §1–§3).

Generates the interleaved text+media ``documents`` table of BASELINE.json's
``input_hint`` shape, carrying KNA1-style customer records (the reference's
shipped workload: /root/reference/KNA2.xlsx — 8 string columns) as
``kind="field:<Name>"`` spans, with planted duplicate clusters mirroring the
classes observable in the reference golden response (backend/test_response.py:1):
exact copies, near copies (postal-digit drop, punctuation variants), fuzzy
edits (transpositions), and same-blocking-key non-duplicates.

Everything is seeded (numpy RandomState); same (n_docs, seed) → identical
bytes. Large corpora are cached as parquet under /tmp/dedupe_ray_fixtures.
"""

from __future__ import annotations

import os
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from dedupe_ray.schema import DOCUMENT_SCHEMA

KNA_FIELDS = ["Customer", "Name 1", "Name 2", "Street", "Postal Code", "City", "Region", "Country"]

_NAME_STEMS = [
    "Hapis", "Polmex", "Stalprodukt", "Müller", "Kovács", "Nowak", "Schmidt",
    "Wiśniewski", "Dvořák", "Horváth", "Keller", "Zieliński", "Baumgartner",
    "Łukasik", "Richter", "Szabó", "Krüger", "Jansen", "Vogel", "Černý",
    "Mazur", "Winkler", "Sørensen", "Fischer", "Wagner", "Becker", "Hoffman",
    "Koval", "Bąk", "Urbański", "Lehmann", "Weiss", "Neumann", "Schäfer",
]
_NAME_SUFFIXES = ["Sp. z o.o.", "GmbH", "s.r.o.", "Kft.", "S.A.", "AG", "B.V.", "Co. Ltd.", ""]
_STREET_STEMS = [
    "Moniuszki", "Hauptstraße", "Polna", "Dlouhá", "Kossuth utca", "Ogrodowa",
    "Bahnhofstraße", "Krótka", "Nádražní", "Leśna", "Gartenweg", "Słoneczna",
    "Kirchgasse", "Lipowa", "Růžová", "Szkolna", "Mühlenweg", "Kwiatowa",
]
_CITIES = [
    ("Szczytno", "pl"), ("Warszawa", "pl"), ("Kraków", "pl"), ("Gdańsk", "pl"),
    ("Rietz", "de"), ("München", "de"), ("Köln", "de"), ("Dresden", "de"),
    ("Praha", "cz"), ("Brno", "cz"), ("Plzeň", "cz"),
    ("Budapest", "hu"), ("Szeged", "hu"), ("Debrecen", "hu"),
    ("Wrocław", "pl"), ("Olsztyn", "pl"), ("Leipzig", "de"), ("Ostrava", "cz"),
]
_REGIONS = ["", "", "", "", "", "MA", "SL", "BY", "HE", "14", "02", ""]


def _postal(rng: np.random.RandomState, country: str) -> str:
    if country == "pl":
        return f"{rng.randint(0, 100):02d}-{rng.randint(0, 1000):03d}"
    if country == "de":
        return f"{rng.randint(1000, 99999):05d}"
    if country == "cz":
        return f"{rng.randint(100, 800):03d} {rng.randint(0, 100):02d}"
    return f"{rng.randint(1000, 9999):04d}"


_SYL_C = ["b", "d", "f", "g", "k", "l", "m", "n", "p", "r", "s", "t", "v", "z", "st", "tr", "pl"]
_SYL_V = ["a", "e", "i", "o", "u", "ia", "ei"]


_SYLLABLES = [c + v for c in _SYL_C for v in _SYL_V]  # 119 distinct syllables


def _coined_word(rng: np.random.RandomState, entity_id: int) -> str:
    """Pronounceable brand word, UNIQUE per entity: one random syllable plus
    a base-119 syllable encoding of entity_id. Distinct entities must stay
    separable on Name 1 — real company names are registry-unique, and a
    colliding fixture (same name + city for 'distinct' entities, which the
    birthday paradox guarantees at 10⁵ entities from any finite vocabulary)
    would cap achievable F1 below the 0.99 target for every method,
    including the reference."""
    word = _SYLLABLES[rng.randint(len(_SYLLABLES))]
    n = entity_id
    while True:
        word += _SYLLABLES[n % len(_SYLLABLES)]
        n //= len(_SYLLABLES)
        if n == 0:
            break
    return word.capitalize()


def _make_entity(rng: np.random.RandomState, entity_id: int) -> dict[str, str]:
    city, country = _CITIES[rng.randint(len(_CITIES))]
    stem = _NAME_STEMS[rng.randint(len(_NAME_STEMS))]
    suffix = _NAME_SUFFIXES[rng.randint(len(_NAME_SUFFIXES))]
    name1 = f"{stem} {_coined_word(rng, entity_id)} {suffix}".strip()
    name2 = "" if rng.rand() < 0.7 else f"{_NAME_STEMS[rng.randint(len(_NAME_STEMS))]} Filia"
    street = f"{_STREET_STEMS[rng.randint(len(_STREET_STEMS))]} {rng.randint(1, 200)}"
    return {
        "Customer": str(200000 + entity_id),
        "Name 1": name1,
        "Name 2": name2 if name2 else ("nan" if rng.rand() < 0.3 else ""),
        "Street": street,
        "Postal Code": _postal(rng, country),
        "City": city,
        "Region": _REGIONS[rng.randint(len(_REGIONS))],
        "Country": country.upper() if rng.rand() < 0.3 else country,
    }


def _transpose(s: str, rng: np.random.RandomState) -> str:
    if len(s) < 4:
        return s
    i = rng.randint(1, len(s) - 2)
    return s[:i] + s[i + 1] + s[i] + s[i + 2:]


def _perturb(rec: dict[str, str], cls: int, rng: np.random.RandomState) -> dict[str, str]:
    """Duplicate classes per FIXTURES.md §2: 0=exact, 1=near, 2=fuzzy."""
    out = dict(rec)
    # a duplicate row always gets its own Customer id (re-keyed duplicate entry)
    out["Customer"] = str(500000 + rng.randint(0, 300000))
    if cls == 0:
        return out
    if cls == 1:
        which = rng.randint(3)
        if which == 0:  # postal digit drop / add (84600000 → 8460000 class)
            p = out["Postal Code"].replace("-", "").replace(" ", "")
            out["Postal Code"] = p[:-1] if len(p) > 3 and rng.rand() < 0.5 else p + str(rng.randint(10))
        elif which == 1:  # punctuation variant (co. ltd. → co ltd)
            out["Name 1"] = out["Name 1"].replace(".", "").replace(",", "")
        else:  # casing / spacing noise
            out["Name 1"] = out["Name 1"].upper()
            out["Street"] = "  " + out["Street"] + " "
        return out
    # fuzzy: transposition in city or name, possibly different street
    if rng.rand() < 0.5:
        out["City"] = _transpose(out["City"], rng)
    else:
        out["Name 1"] = _transpose(out["Name 1"], rng)
    if rng.rand() < 0.4:
        out["Street"] = f"{_STREET_STEMS[rng.randint(len(_STREET_STEMS))]} {rng.randint(1, 200)}"
    return out


def generate_kna_corpus(
    n_docs: int, seed: int = 42, dup_fraction: float = 0.15
) -> tuple[pa.Table, pa.Table]:
    """Build (documents, truth_clusters).

    documents: (doc_id: string, spans: list<struct kind,text,media_ref,offset>)
    truth_clusters: (doc_id: string, entity_id: int64)

    ~``dup_fraction`` of rows belong to a duplicate cluster of size 2–6.
    """
    rng = np.random.RandomState(seed)
    records: list[dict[str, str]] = []
    entity_ids: list[int] = []

    target_dup_rows = int(n_docs * dup_fraction)
    entity_id = 0
    dup_rows = 0
    # duplicate clusters first
    while dup_rows < target_dup_rows:
        size = int(rng.choice([2, 2, 2, 3, 3, 4, 5, 6]))
        base = _make_entity(rng, entity_id)
        records.append(base)
        entity_ids.append(entity_id)
        for _ in range(size - 1):
            cls = int(rng.choice([0, 1, 1, 2]))
            records.append(_perturb(base, cls, rng))
            entity_ids.append(entity_id)
        dup_rows += size
        entity_id += 1
    # singletons fill the rest
    while len(records) < n_docs:
        records.append(_make_entity(rng, entity_id))
        entity_ids.append(entity_id)
        entity_id += 1
    records = records[:n_docs]
    entity_ids = entity_ids[:n_docs]

    # deterministic shuffle so duplicates are not adjacent
    order = rng.permutation(len(records))
    records = [records[i] for i in order]
    entity_ids = [entity_ids[i] for i in order]

    pad = max(6, len(str(n_docs)))
    doc_ids = [f"d{idx:0{pad}d}" for idx in range(len(records))]

    # spans: field spans in fixed KNA order, with 0–3 media spans interleaved
    kinds_all: list[str] = []
    texts_all: list[str] = []
    refs_all: list[str] = []
    offs_all: list[int] = []
    lengths: list[int] = []
    n_media = rng.randint(0, 4, size=len(records))
    for i, rec in enumerate(records):
        spans: list[tuple[str, str, str]] = [
            ("field:" + f, rec[f], "") for f in KNA_FIELDS
        ]
        for m in range(n_media[i]):
            pos = rng.randint(0, len(spans) + 1)
            # stable across processes/machines (builtin hash() is
            # PYTHONHASHSEED-randomized, breaking the "same (n_docs, seed)
            # → identical bytes" module contract)
            ref_h = zlib.crc32(f"{doc_ids[i]}:{m}".encode())
            ref = f"media://{ref_h:012d}"
            spans.insert(pos, ("image", "", ref))
        lengths.append(len(spans))
        for off, (k, t, r) in enumerate(spans):
            kinds_all.append(k)
            texts_all.append(t)
            refs_all.append(r)
            offs_all.append(off)

    flat = pa.StructArray.from_arrays(
        [
            pa.array(kinds_all, pa.string()),
            pa.array(texts_all, pa.string()),
            pa.array(refs_all, pa.string()),
            pa.array(offs_all, pa.int32()),
        ],
        names=["kind", "text", "media_ref", "offset"],
    )
    offsets = pa.array(np.concatenate([[0], np.cumsum(lengths)]).astype(np.int32))
    spans_col = pa.ListArray.from_arrays(offsets, flat)

    documents = pa.table(
        {"doc_id": pa.array(doc_ids, pa.string()), "spans": spans_col}
    ).cast(DOCUMENT_SCHEMA)
    truth = pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.string()),
            "entity_id": pa.array(np.asarray(entity_ids, dtype=np.int64)),
        }
    )
    return documents, truth


_CACHE_DIR = "/tmp/dedupe_ray_fixtures"


def corpus_paths(n_docs: int, seed: int = 42) -> tuple[str, str]:
    """Generate (or reuse cached) corpus parquet; returns (docs_dir, truth_path).

    Documents are written as a DIRECTORY of shard files — Ray assigns one
    read task per file, so a single giant file would serialize the read
    (and the resumable-output layout at production scale is per-shard
    directories anyway)."""
    os.makedirs(_CACHE_DIR, exist_ok=True)
    docs_dir = os.path.join(_CACHE_DIR, f"docs_n{n_docs}_s{seed}_v2")
    truth_path = os.path.join(_CACHE_DIR, f"truth_n{n_docs}_s{seed}_v2.parquet")
    if not (os.path.isdir(docs_dir) and os.path.exists(truth_path)):
        docs, truth = generate_kna_corpus(n_docs, seed)
        shard_rows = max(4096, n_docs // 64)
        tmp = docs_dir + ".tmp"
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(tmp, exist_ok=True)
        for i, start in enumerate(range(0, docs.num_rows, shard_rows)):
            pq.write_table(
                docs.slice(start, shard_rows),
                os.path.join(tmp, f"part-{i:05d}.parquet"),
                row_group_size=8192,
            )
        shutil.rmtree(docs_dir, ignore_errors=True)
        os.replace(tmp, docs_dir)
        pq.write_table(truth, truth_path + ".tmp", row_group_size=65536)
        os.replace(truth_path + ".tmp", truth_path)
    return docs_dir, truth_path


def labeled_pairs_from_truth(
    documents: pa.Table, truth: pa.Table, n_match: int = 10, n_distinct: int = 10, seed: int = 42
) -> list[tuple[dict, dict, str]]:
    """Deterministic labeled pairs (record_a, record_b, 'y'|'n') per FIXTURES.md §3.

    Respects the reference gates (≥2 y, ≥2 n, ≥15 total — page.tsx:368-369)
    when n_match + n_distinct ≥ 15. Records are the *raw* field dicts; the
    training path preprocesses them the same way the pipeline does.
    """
    from dedupe_ray.schema import extract_fields_batch

    rng = np.random.RandomState(seed)
    flat = extract_fields_batch(documents, KNA_FIELDS).to_pylist()
    by_doc = {r["doc_id"]: r for r in flat}
    ent = {r["doc_id"]: r["entity_id"] for r in truth.to_pylist()}

    groups: dict[int, list[str]] = {}
    for d, e in ent.items():
        groups.setdefault(e, []).append(d)
    dup_groups = [sorted(v) for v in groups.values() if len(v) > 1]
    dup_groups.sort()
    singletons = sorted(d for e, v in groups.items() if len(v) == 1 for d in v)

    pairs: list[tuple[dict, dict, str]] = []
    for g in dup_groups[:n_match]:
        a, b = g[0], g[1]
        pairs.append((by_doc[a], by_doc[b], "y"))

    # Distinct labels: half HARD negatives (same City — they share blocking
    # keys, the class the active learner would surface as uncertain), half
    # random. Without hard negatives the classifier never learns to reject
    # same-area non-duplicates and precision collapses.
    by_city: dict[str, list[str]] = {}
    for d in singletons:
        by_city.setdefault(by_doc[d]["City"], []).append(d)
    hard_pool = [v for v in by_city.values() if len(v) > 1]
    n_hard = n_distinct // 2
    made_hard = 0
    for v in sorted(hard_pool, key=len, reverse=True):
        for i in range(0, len(v) - 1, 2):
            if made_hard >= n_hard:
                break
            pairs.append((by_doc[v[i]], by_doc[v[i + 1]], "n"))
            made_hard += 1
        if made_hard >= n_hard:
            break
    for _ in range(n_distinct - made_hard):
        a = singletons[rng.randint(len(singletons))]
        b = singletons[rng.randint(len(singletons))]
        if a == b:
            continue
        pairs.append((by_doc[a], by_doc[b], "n"))
    return pairs
