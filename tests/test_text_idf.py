"""L7-Text TF-IDF wiring: compute_idf Ray pass + idf-weighted cosine beats
unweighted cosine on boilerplate-heavy text, and idf tables persist through
the settings round-trip."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

BOILER = "terms and conditions apply this agreement is governed by law of the state"


def _docs():
    # every doc shares the boilerplate; only one rare token distinguishes
    return [
        f"{BOILER} zephyrium",
        f"{BOILER} zephyrium",   # true near-dup of 0
        f"{BOILER} quartzite",
        f"{BOILER} obsidian",
    ]


def test_compute_idf_values(ray_session):
    from dedupe_ray.features import compute_idf

    ds = rd.from_arrow(pa.table({"doc_id": ["0", "1", "2", "3"], "desc": _docs()}))
    t = compute_idf(ds, "desc", min_df=2)
    # boilerplate tokens appear in all 4 docs → idf = ln(4/4) = 0
    assert t["idf"]["terms"] == pytest.approx(0.0)
    assert t["idf"]["zephyrium"] == pytest.approx(np.log(4 / 2))
    # rare tokens (df=1) are left to default_idf = ln N
    assert "quartzite" not in t["idf"]
    assert t["default_idf"] == pytest.approx(np.log(4))


def test_idf_weighting_separates_boilerplate(ray_session):
    """Unweighted cosine sees every pair as near-identical (boilerplate
    dominates); idf weighting drops the boilerplate to weight 0 and the
    rare-token pair stands out."""
    from dedupe_ray.distances import tfidf_cosine_batch
    from dedupe_ray.features import compute_idf

    docs = _docs()
    ds = rd.from_arrow(pa.table({"doc_id": ["0", "1", "2", "3"], "desc": docs}))
    t = compute_idf(ds, "desc", min_df=2)

    flat = {"idf": {}, "default_idf": 1.0}  # unweighted: every token weight 1
    dup_flat = tfidf_cosine_batch([docs[0]], [docs[1]], flat["idf"], flat["default_idf"])[0]
    non_flat = tfidf_cosine_batch([docs[0]], [docs[2]], flat["idf"], flat["default_idf"])[0]
    dup_idf = tfidf_cosine_batch([docs[0]], [docs[1]], t["idf"], t["default_idf"])[0]
    non_idf = tfidf_cosine_batch([docs[0]], [docs[2]], t["idf"], t["default_idf"])[0]

    assert dup_idf == pytest.approx(1.0, abs=1e-5)
    # idf separation must far exceed the unweighted one
    assert (dup_idf - non_idf) > (dup_flat - non_flat) + 0.3
    assert non_flat > 0.85  # boilerplate really does swamp the flat cosine


def test_idf_tables_flow_and_persist(tmp_path, ray_session):
    from dedupe_ray.config import EngineConfig, FieldConfig
    from dedupe_ray.pipeline import RayDeduper

    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": [str(i) for i in range(8)],
                "desc": _docs() * 2,
            }
        )
    )
    config = EngineConfig(fields=[FieldConfig(field="desc", type="Text", has_missing=True)])
    d = RayDeduper(config)
    d.prepare_training(ds)
    assert "desc" in d.idf_tables
    assert d.idf_tables["desc"]["idf"]["terms"] == pytest.approx(0.0)

    # persist via settings and reload
    d.labeled = [
        ((({"desc": _docs()[0]}), ({"desc": _docs()[1]})), True),
        ((({"desc": _docs()[0]}), ({"desc": _docs()[2]})), False),
    ] * 3
    d.train()
    p = tmp_path / "settings.json"
    d.save_settings(str(p))
    d2 = RayDeduper.load_settings(str(p))
    assert d2.idf_tables["desc"]["idf"] == pytest.approx(d.idf_tables["desc"]["idf"])
