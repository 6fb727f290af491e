"""User-extension surface (SURVEY §2.C / [lib: dedupe/variables/base.py]):
Custom variable type (importable batch comparator + sign choice) and
register_predicate()."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from dedupe_ray.config import EngineConfig, FieldConfig
from dedupe_ray.features import feature_names, monotone_feature_dims, pair_features
from dedupe_ray.pipeline import RayDeduper


def _cfg():
    # the comparator path must be importable on every Ray worker, so the
    # fixture borrows a library batch kernel as the "user" function
    return EngineConfig(
        fields=[
            FieldConfig("name", "String"),
            FieldConfig(
                "code",
                "Custom",
                comparator="dedupe_ray.distances:exact_distance_batch",
                similarity=True,
            ),
        ]
    )


def test_custom_field_feature_and_signs():
    cfg = _cfg()
    assert feature_names(cfg) == ["d_name", "d_code", "miss_name", "miss_code"]
    neg, pos = monotone_feature_dims(cfg)
    assert 0 in neg  # String distance
    assert 1 in pos  # similarity=True Custom
    batch = pa.table(
        {
            "a_name": ["acme co", "acme co"],
            "b_name": ["acme co", "acme inc"],
            "a_code": ["X1", "X1"],
            "b_code": ["X1", "Y2"],
        }
    )
    X = pair_features(batch, cfg)
    assert X[0, 1] == 1.0 and X[1, 1] == 0.0  # exact comparator output


def test_custom_field_distance_sign():
    cfg = EngineConfig(
        fields=[
            FieldConfig(
                "code",
                "Custom",
                comparator="dedupe_ray.distances:exact_distance_batch",
                similarity=False,
            )
        ]
    )
    neg, pos = monotone_feature_dims(cfg)
    assert neg == [0] and pos == []


def test_custom_field_requires_comparator():
    with pytest.raises(ValueError):
        FieldConfig("x", "Custom")


def test_custom_field_settings_roundtrip(tmp_path):
    cfg = _cfg()
    ded = RayDeduper(cfg)
    ded.predicate_ids = ["whole|code"]
    ded.classifier.weights = np.array([-1.0, 2.0, 0.0, 0.0])
    ded.classifier.bias = -0.5
    p = str(tmp_path / "settings.json")
    ded.save_settings(p)
    back = RayDeduper.load_settings(p)
    f = back.config.fields[1]
    assert f.type == "Custom"
    assert f.comparator == "dedupe_ray.distances:exact_distance_batch"
    assert f.similarity is True


def test_custom_field_scores_through_ray(ray_session):
    from dedupe_ray.scoring import score_pairs

    cfg = _cfg()
    ded = RayDeduper(cfg)
    ded.classifier.weights = np.array([-2.0, 3.0, 0.0, 0.0])
    ded.classifier.bias = -1.0
    assembled = rd.from_arrow(
        pa.table(
            {
                "id_a": ["1", "2"],
                "id_b": ["3", "4"],
                "a_name": ["acme", "acme"],
                "b_name": ["acme", "acme"],
                "a_code": ["X1", "X1"],
                "b_code": ["X1", "Y2"],
            }
        )
    )
    df = (
        score_pairs(assembled, ded.classifier.to_dict(), cfg)
        .to_pandas()
        .sort_values("id_a")
        .reset_index(drop=True)
    )
    # equal strings carry affine-gap distance 0.5 (repo convention), so
    # z = -1 + (-2)(0.5) + 3·[code eq]
    assert df["score"][0] == pytest.approx(1 / (1 + np.exp(-1.0)), abs=1e-6)
    assert df["score"][1] == pytest.approx(1 / (1 + np.exp(2.0)), abs=1e-6)


# --- register_predicate ----------------------------------------------------


def test_register_predicate_and_block():
    from dedupe_ray.blocking import brute_force_pairs, candidate_pairs
    from dedupe_ray.predicates import SIMPLE_PREDICATES, register_predicate

    # nested def: cloudpickle serializes it BY VALUE into the task closure,
    # like a user registering from a script Ray workers cannot import
    def _rev3(value: str) -> tuple[str, ...]:
        return (value[::-1][:3],) if value else ()

    if "rev3" not in SIMPLE_PREDICATES:
        register_predicate("rev3", _rev3)
    with pytest.raises(ValueError):
        register_predicate("rev3", _rev3)  # collision
    with pytest.raises(ValueError):
        register_predicate("bad|name", _rev3)

    recs = [
        {"doc_id": "a", "name": "hello"},
        {"doc_id": "b", "name": "jello"},  # same reversed 3-suffix "oll"
        {"doc_id": "c", "name": "world"},
    ]
    flat = rd.from_items(recs)
    pairs_ds, _ = candidate_pairs(flat, ["rev3|name"])
    got = {(r["id_a"], r["id_b"]) for r in pairs_ds.take_all()}
    want = brute_force_pairs(recs, ["rev3|name"])
    assert got == want == {("a", "b")}
