"""Library variable types beyond the app call-site (SURVEY §1.2 [lib]):
ShortString, Categorical, LatLong, Set, Interaction, Exists — feature
layout, kernels, sign constraints, and settings round-trip."""

import numpy as np
import pyarrow as pa
import pytest

from dedupe_ray.config import EngineConfig, FieldConfig
from dedupe_ray.features import (
    feature_names,
    field_feature_names,
    monotone_feature_dims,
    pair_features,
)


def _pairs_batch(rows):
    cols = {}
    for k in rows[0]:
        cols[k] = pa.array([r[k] for r in rows], pa.string())
    return pa.table(cols)


def test_latlong_haversine():
    from dedupe_ray.distances import haversine_batch

    d = haversine_batch(["52.23,21.01", "0,0", "junk"], ["52.23,21.01", "0,180", "1,1"])
    assert d[0] == pytest.approx(0.0)
    assert d[1] == pytest.approx(np.pi)  # antipodal on the equator
    assert np.isnan(d[2])  # unparseable → NaN (masked upstream)


def test_set_jaccard():
    from dedupe_ray.distances import jaccard_set_batch

    s = jaccard_set_batch(["a b c", "a,b", ""], ["b c d", "c d", "x"])
    assert s[0] == pytest.approx(2 / 4)
    assert s[1] == pytest.approx(0.0)
    assert s[2] == pytest.approx(0.0)


def test_categorical_dummies():
    cfg = EngineConfig(
        fields=[FieldConfig("kind", "Categorical", categories=("a", "b", "c"))]
    )
    # layout: same + 3 unordered pairs + missing indicator
    assert feature_names(cfg) == [
        "cat_kind_same", "cat_kind_a|b", "cat_kind_a|c", "cat_kind_b|c", "miss_kind",
    ]
    batch = _pairs_batch(
        [
            {"a_kind": "a", "b_kind": "a"},
            {"a_kind": "a", "b_kind": "c"},
            {"a_kind": "c", "b_kind": "a"},   # unordered: same dummy as (a,c)
            {"a_kind": "a", "b_kind": "zzz"},  # undeclared → all dummies 0
            {"a_kind": "N/A", "b_kind": "a"},  # missing → indicator only
        ]
    )
    X = pair_features(batch, cfg)
    assert X.shape == (5, 5)
    assert X[0].tolist() == [1, 0, 0, 0, 0]
    assert X[1].tolist() == [0, 0, 1, 0, 0]
    assert X[2].tolist() == [0, 0, 1, 0, 0]
    assert X[3].tolist() == [0, 0, 0, 0, 0]
    assert X[4].tolist() == [0, 0, 0, 0, 1]


def test_exists_presence_dummies():
    cfg = EngineConfig(fields=[FieldConfig("opt", "Exists")])
    # Exists has NO missing indicator — missing IS the feature
    assert feature_names(cfg) == ["ex_opt_both", "ex_opt_one"]
    batch = _pairs_batch(
        [
            {"a_opt": "x", "b_opt": "y"},
            {"a_opt": "x", "b_opt": "N/A"},
            {"a_opt": "N/A", "b_opt": "N/A"},
        ]
    )
    X = pair_features(batch, cfg)
    assert X.tolist() == [[1, 0], [0, 1], [0, 0]]


def test_interaction_product():
    cfg = EngineConfig(
        fields=[
            FieldConfig("x", "Exact", has_missing=False),
            FieldConfig("y", "Exact", has_missing=False),
            FieldConfig("xy", "Interaction", interaction_fields=("x", "y")),
        ]
    )
    assert feature_names(cfg) == ["d_x", "d_y", "inter_xy"]
    batch = _pairs_batch(
        [
            {"a_x": "1", "b_x": "1", "a_y": "2", "b_y": "2"},
            {"a_x": "1", "b_x": "1", "a_y": "2", "b_y": "3"},
            {"a_x": "1", "b_x": "9", "a_y": "2", "b_y": "3"},
        ]
    )
    X = pair_features(batch, cfg)
    assert X[:, 2].tolist() == [1.0, 0.0, 0.0]


def test_shortstring_is_affine_gap():
    cfg_s = EngineConfig(fields=[FieldConfig("f", "String")])
    cfg_ss = EngineConfig(fields=[FieldConfig("f", "ShortString")])
    batch = _pairs_batch([{"a_f": "kruger", "b_f": "krguer"}])
    assert pair_features(batch, cfg_s).tolist() == pair_features(batch, cfg_ss).tolist()


def test_monotone_dims_multicolumn_layout():
    cfg = EngineConfig(
        fields=[
            FieldConfig("name", "String"),
            FieldConfig("kind", "Categorical", categories=("a", "b")),
            FieldConfig("loc", "LatLong"),
            FieldConfig("tags", "Set"),
            FieldConfig("opt", "Exists"),
        ]
    )
    neg, pos = monotone_feature_dims(cfg)
    names = feature_names(cfg)
    # String at 0; Categorical occupies 1..2 (unconstrained); LatLong at 3
    # (distance); Set at 4 (similarity); Exists 5..6 unconstrained
    assert names[0] == "d_name" and 0 in neg
    assert names[3] == "d_loc" and 3 in neg
    assert names[4] == "d_tags" and 4 in pos
    assert not ({1, 2, 5, 6} & set(neg + pos))


def test_settings_roundtrip_with_extended_types(tmp_path):
    from dedupe_ray.pipeline import RayDeduper

    cfg = EngineConfig(
        fields=[
            FieldConfig("name", "ShortString"),
            FieldConfig("kind", "Categorical", categories=("a", "b")),
            FieldConfig("loc", "LatLong"),
        ]
    )
    d = RayDeduper(cfg)
    d.predicate_ids = ["whole|name"]
    d.labeled = [((({"name": "x"}, {"name": "x"})), True)]
    import numpy as np

    d.classifier.weights = np.zeros(len(feature_names(cfg)) + 1)
    path = str(tmp_path / "s.json")
    d.save_settings(path)
    loaded = RayDeduper.load_settings(path)
    assert [f.type for f in loaded.config.fields] == ["ShortString", "Categorical", "LatLong"]
    assert loaded.config.fields[1].categories == ("a", "b")


def test_token_align_layout_and_constraints():
    from dedupe_ray.config import EngineConfig, FieldConfig

    cfg = EngineConfig(
        fields=[
            FieldConfig(field="name", type="String", token_align=True),
            FieldConfig(field="city", type="String"),
        ]
    )
    assert feature_names(cfg) == ["d_name", "ta_name", "d_city", "miss_name", "miss_city"]
    neg, pos = monotone_feature_dims(cfg)
    assert neg == [0, 1, 2] and pos == []
    batch = pa.table(
        {
            "a_name": ["zaklad marbenkor", "zaklad marbenkor"],
            "b_name": ["zaklad marbenkro", "zaklad tovertis"],
            "a_city": ["krakow", "krakow"],
            "b_city": ["krakow", "krakow"],
        }
    )
    X = pair_features(batch, cfg)
    assert X.shape == (2, 5)
    assert 0 < X[0, 1] < 0.35 < 0.6 < X[1, 1]  # corruption vs replacement


def test_token_align_settings_roundtrip(tmp_path):
    import numpy as np

    from dedupe_ray.config import EngineConfig, FieldConfig
    from dedupe_ray.pipeline import RayDeduper

    cfg = EngineConfig(fields=[FieldConfig(field="name", type="String", token_align=True)])
    d = RayDeduper(cfg)
    d.classifier.weights = np.zeros(len(feature_names(cfg)) + 1)
    d.predicate_ids = ["whole|name"]
    p = str(tmp_path / "s.json")
    d.save_settings(p)
    d2 = RayDeduper.load_settings(p)
    assert d2.config.fields[0].token_align is True
    assert feature_names(d2.config) == feature_names(cfg)


def test_auto_detect_enables_token_align():
    from dedupe_ray.config import EngineConfig

    cfg = EngineConfig.auto_detect(["Name 1", "City"])
    assert all(f.token_align for f in cfg.fields)
    assert feature_names(cfg) == [
        "d_Name 1", "ta_Name 1", "d_City", "ta_City", "miss_Name 1", "miss_City",
    ]
