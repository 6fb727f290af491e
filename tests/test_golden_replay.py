"""A30 golden-response conformance (SURVEY §5.1): KNA2.xlsx through the
engine vs the reference's captured 26-cluster response
(/root/reference/backend/test_response.py:1), plus the A1/A2 source readers
feeding it."""

import os

import pytest

pytestmark = pytest.mark.slow_e2e  # full engine runs vs the captured golden response

KNA2 = "/root/reference/KNA2.xlsx"
GOLDEN = "/root/reference/backend/test_response.py"

needs_reference = pytest.mark.skipif(
    not (os.path.exists(KNA2) and os.path.exists(GOLDEN)),
    reason="reference fixtures not present",
)


@needs_reference
def test_xlsx_reader_shape():
    from dedupe_ray.sources import read_excel_table

    t = read_excel_table(KNA2)
    assert t.num_rows == 410
    assert t.column_names[:8] == [
        "Customer", "Name 1", "Name 2", "Street", "Postal Code", "City", "Region", "Country",
    ]
    assert t.column("source_file")[0].as_py() == "KNA2.xlsx"


@needs_reference
def test_preprocess_matches_golden_records():
    """Positional alignment + preprocess bit-parity: every field of every
    golden record equals preprocess(raw cell at that record_id)."""
    from dedupe_ray.golden import KNA_FIELDS, load_golden_clusters, _GOLDEN_PATH
    from dedupe_ray.preprocess import preprocess_value
    from dedupe_ray.sources import read_excel_table

    import ast

    payload = ast.literal_eval(open(_GOLDEN_PATH).read().split("=", 1)[1].strip())
    t = read_excel_table(KNA2)
    for d in payload["duplicates"]:
        for r in d["records"]:
            i = int(r["record_id"])
            for f in KNA_FIELDS:
                assert preprocess_value(t.column(f)[i].as_py()) == r[f], (i, f)


@needs_reference
def test_kna2_replay_f1(ray_session):
    """End-to-end A30 replay: read xlsx → train (golden-derived labels) →
    partition → pairwise comparison vs the 26 golden clusters."""
    from dedupe_ray.golden import (
        golden_pairs,
        kna2_replay,
        load_golden_clusters,
        _predicted_pairs,
    )

    clusters, f1 = kna2_replay()
    # recall must be perfect: every golden pair recovered
    gp = golden_pairs(load_golden_clusters())
    predicted = _predicted_pairs(clusters)
    assert gp <= predicted
    # precision vs golden: the engine's stronger blocking surfaces a handful
    # of same-postal+same-city name-prefix pairs the reference never even
    # generated as candidates (e.g. 'arti grafiche antonelli' vs
    # '... antonelli s.r.l.'); they score as matches — defensible ER
    # behavior, but counted against golden conformance here.
    assert f1 >= 0.95, f1


@needs_reference
def test_kna2_replay_deterministic(ray_session):
    """The A30 replay must be run-deterministic: two back-to-back replays
    produce byte-identical cluster membership (round-2 had ±2-cluster
    session drift; also verified invariant across PYTHONHASHSEED and
    num_cpus=4/8/32 in fresh processes, 2026-08-17)."""
    import pyarrow as pa

    from dedupe_ray.golden import kna2_replay

    def digest():
        clusters, _ = kna2_replay()
        tbl = pa.Table.from_pylist(clusters.take_all())
        return sorted(zip(tbl["cluster_id"].to_pylist(), tbl["doc_id"].to_pylist()))

    assert digest() == digest()


def test_csv_reader_roundtrip(tmp_path, ray_session):
    from dedupe_ray.sources import read_input_files

    p = tmp_path / "a.csv"
    p.write_text('Name,City\n"Acme, Inc.",K\nBeta,W\n')
    ds = read_input_files([str(p)])
    df = ds.to_pandas().sort_values("doc_id")
    assert df["Name"].tolist() == ["Acme, Inc.", "Beta"]
    assert df["doc_id"].tolist() == ["0", "1"]
    assert (df["source_file"] == "a.csv").all()


def test_multi_file_union_positional_ids(tmp_path, ray_session):
    """A3: ids continue across files; schemas union with '' fill."""
    from dedupe_ray.sources import read_input_files

    (tmp_path / "a.csv").write_text("Name,City\nx,k\n")
    (tmp_path / "b.csv").write_text("Name,Extra\ny,e\n")
    ds = read_input_files([str(tmp_path / "a.csv"), str(tmp_path / "b.csv")])
    df = ds.to_pandas().sort_values("doc_id").set_index("doc_id")
    assert df.loc["1", "Name"] == "y"
    assert df.loc["1", "City"] == ""
    assert df.loc["0", "Extra"] == ""


def test_detect_fields():
    from dedupe_ray.sources import detect_fields

    import pyarrow as pa

    t = pa.table({"Name": ["x"], "City": ["y"], "source_file": ["f"], "doc_id": ["0"]})
    fields = detect_fields(t)
    assert fields == [
        {"field": "Name", "type": "String", "has_missing": True},
        {"field": "City", "type": "String", "has_missing": True},
    ]


def test_read_csv_stream_scale_path(tmp_path, ray_session):
    """The streaming-parallel CSV reader (scale path): ray.data.read_csv +
    source tag; no positional ids by design."""
    from dedupe_ray.sources import read_csv_stream

    p = tmp_path / "s.csv"
    p.write_text("id,Name\n1,x\n2,y\n3,z\n")
    ds = read_csv_stream(str(p), source_tag="s.csv")
    df = ds.to_pandas()
    assert len(df) == 3
    assert (df["source_file"] == "s.csv").all()
    assert "doc_id" not in df.columns  # caller supplies/derives real ids


@needs_reference
def test_kna1_full_transfer_partition(ray_session):
    """StaticDedupe-style transfer on the second reference fixture: model
    trained on KNA2 (410 rows) partitions KNA1_full (5,185 rows) — the
    train-once / partition-many production mode on real data."""
    from dedupe_ray.config import EngineConfig
    from dedupe_ray.golden import KNA_FIELDS, kna2_flat_dataset, load_golden_clusters
    from dedupe_ray.pipeline import RayDeduper, active_label_loop, summarize_clusters
    from dedupe_ray.preprocess import make_preprocess_stage
    from dedupe_ray.sources import read_input_files

    golden = load_golden_clusters()

    def is_match(a, b):
        ca, cb = golden.get(str(a["doc_id"])), golden.get(str(b["doc_id"]))
        return ca is not None and ca == cb

    flat2 = kna2_flat_dataset().materialize()
    ded = RayDeduper(EngineConfig.auto_detect(KNA_FIELDS))
    ded.prepare_training(flat2)
    active_label_loop(ded, is_match)
    ded.train()

    big = read_input_files(["/root/reference/KNA1_full_dedupe.XLSX.xlsx"]).map_batches(
        make_preprocess_stage(KNA_FIELDS), batch_format="pyarrow"
    ).materialize()
    assert big.count() == 5185
    clusters = ded.partition(big, 0.3)
    summary = summarize_clusters(clusters).to_pandas()
    # the fixture family is known to contain duplicates; clusters must be
    # non-trivial, bounded, and confidence-scored
    assert 100 <= len(summary) <= 2000
    assert summary["confidence_score"].between(0, 1).all()
    assert (summary["group_size"] >= 2).all()
