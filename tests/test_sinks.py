"""A17 JSON report, A24 cleansed export, A11 pair re-ordering, A23 auto
column mapping, A31 input validation."""

import json

import pyarrow as pa
import pytest
import ray.data as rd


@pytest.fixture()
def tiny_clusters(ray_session):
    clusters = rd.from_arrow(
        pa.table(
            {
                "cluster_id": ["cA", "cA", "cB", "cB", "cB"],
                "doc_id": ["0", "1", "2", "3", "4"],
                "confidence_score": pa.array([0.9, 0.9, 0.5, 0.6, 0.7], pa.float32()),
            }
        )
    )
    flat = rd.from_arrow(
        pa.table(
            {
                "doc_id": ["0", "1", "2", "3", "4", "5"],
                "Name": ["a, co", 'b "x"', "c", "d", "e", "solo"],
                "City": ["k", "k", "N/A", "w", "w", "z"],
                "source_file": ["f1"] * 6,
            }
        )
    )
    return clusters, flat


def test_json_report_shape(tiny_clusters):
    from dedupe_ray.sinks import build_report

    clusters, flat = tiny_clusters
    rep = build_report(clusters, flat, ["Name", "City"], threshold=0.4, configuration={"x": 1})
    assert set(rep) == {
        "total_records", "duplicate_groups_found", "duplicates", "configuration", "threshold_used",
    }
    assert rep["total_records"] == 6
    assert rep["duplicate_groups_found"] == 2
    # sorted by mean confidence desc; dense 0-based ids
    assert [g["cluster_id"] for g in rep["duplicates"]] == [0, 1]
    assert rep["duplicates"][0]["group_size"] == 2
    assert rep["duplicates"][0]["confidence_score"] == pytest.approx(0.9)
    r0 = rep["duplicates"][0]["records"][0]
    assert set(r0) == {"Name", "City", "confidence_score", "source_file", "record_id"}
    json.dumps(rep)  # float32 coerced — must serialize


def test_sinks_record_pull_is_semi_joined(tiny_clusters):
    """Scale seam: the A17/A24 record pull must be bounded by the reported
    group members (a broadcast semi-join on doc_id), never a full-corpus
    to_pandas. Checked two ways: source grep + max_groups truncation only
    pulling the surviving group's members."""
    import inspect

    import dedupe_ray.sinks as m
    from dedupe_ray.sinks import build_report

    src = inspect.getsource(m)
    for line in src.splitlines():
        if "flat_ds" in line and (".to_pandas()" in line or "take_all" in line):
            raise AssertionError(f"unbounded driver pull in sinks.py: {line.strip()}")

    clusters, flat = tiny_clusters
    rep = build_report(clusters, flat, ["Name", "City"], threshold=0.4, max_groups=1)
    assert rep["duplicate_groups_found"] == 1
    ids = {r["record_id"] for g in rep["duplicates"] for r in g["records"]}
    assert ids == {"0", "1"}  # only the top group's members were assembled


def test_cleansed_export_header_order_and_escaping(tiny_clusters):
    from dedupe_ray.sinks import cleansed_export_csv

    clusters, flat = tiny_clusters
    csv_text = cleansed_export_csv(clusters, flat, ["Name", "City"], removals={"3"})
    lines = csv_text.split("\n")
    assert lines[0] == "cluster_id,City,Name,record_id,confidence_score,source_file"
    # removal dropped: doc 3 absent
    assert not any(line.split(",")[3] == "3" for line in lines[1:] if line)
    # 1-based stringified cluster ids
    assert lines[1].split(",")[0] == "1"
    # comma value quoted; embedded quotes doubled; N/A → ''
    body = "\n".join(lines[1:])
    assert '"a, co"' in body
    assert '"b ""x"""' in body
    assert ",N/A," not in body


def test_reorder_training_pairs_interleaves():
    from dedupe_ray.sinks import reorder_training_pairs

    def pair(a, b):
        return {"0": {"Name": a, "City": "k"}, "1": {"Name": b, "City": "k"}}

    m1, m2 = pair("x", "x"), pair("y", "y")         # match on both cols
    d1 = {"0": {"Name": "a", "City": "q"}, "1": {"Name": "b", "City": "r"}}  # none
    r1 = pair("a", "b")                              # City matches only → random
    out = reorder_training_pairs([d1, m1, r1, m2], ["Name", "City"])
    assert out[0] is m1 and out[1] is r1 and out[2] is d1 and out[3] is m2
    assert len(out) == 4


def test_auto_column_mapping():
    from dedupe_ray.ops.tabular import auto_column_mapping

    mapping, target = auto_column_mapping(["A", "B"], ["A", "C", "D"])
    assert target == 1  # wider file is the target
    assert mapping == {"A": "A"}


def test_validate_inputs():
    from dedupe_ray.sinks import validate_inputs

    validate_inputs(["a.csv", "b.csv"], ["Name", "City"])
    with pytest.raises(ValueError):
        validate_inputs(["a.csv", "b.xlsx"], ["Name", "City"])
    with pytest.raises(ValueError):
        validate_inputs(["a.csv"], ["Name"])
    with pytest.raises(ValueError):
        validate_inputs(["a.parquet"], ["Name", "City"])
    with pytest.raises(ValueError):
        validate_inputs(["a.csv"] * 3, ["Name", "City"])


def test_jsonl_gz_roundtrip_fidelity(ray_session, tmp_path):
    """Edge-case fidelity through the gzip JSONL sink/source: unicode,
    embedded newlines/quotes, empty strings, nulls, int64 extremes."""
    from dedupe_ray.sources import read_jsonl_gz, write_jsonl_gz

    t = pa.table(
        {
            "doc_id": pa.array(["a", "b", "c", "d"]),
            "text": pa.array(['he said "hi"\nbye', "café — ☃", "", None]),
            "n": pa.array([0, -1, 2**53 - 1, None], pa.int64()),
        }
    )
    out = str(tmp_path / "docs_gz")
    write_jsonl_gz(rd.from_arrow(t).repartition(2), out)
    back = read_jsonl_gz(out).to_pandas().sort_values("doc_id").reset_index(drop=True)
    src = t.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert list(back["text"]) == list(src["text"])
    assert back["n"].equals(src["n"].astype(back["n"].dtype))


def test_jsonl_zst_roundtrip_fidelity(ray_session, tmp_path):
    """Same edge-case fidelity through the zstd JSONL sink/source; also
    pins that the decoder handles pre-read (already-inflated) bytes via
    the magic check by reading a renamed shard."""
    import shutil

    from dedupe_ray.sources import read_jsonl_zst, write_jsonl_zst

    t = pa.table(
        {
            "doc_id": pa.array(["a", "b", "c", "d"]),
            "text": pa.array(['he said "hi"\nbye', "café — ☃", "", None]),
            "n": pa.array([0, -1, 2**53 - 1, None], pa.int64()),
        }
    )
    out = str(tmp_path / "docs_zst")
    write_jsonl_zst(rd.from_arrow(t).repartition(2), out)
    back = read_jsonl_zst(out).to_pandas().sort_values("doc_id").reset_index(drop=True)
    src = t.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert list(back["text"]) == list(src["text"])
    assert back["n"].equals(src["n"].astype(back["n"].dtype))

    # renamed shard: read_binary_files no longer auto-inflates, the
    # 0x28B52FFD magic check must kick in
    import os

    renamed = str(tmp_path / "renamed")
    os.makedirs(renamed)
    shard = sorted(os.listdir(out))[0]
    shutil.copy(os.path.join(out, shard), os.path.join(renamed, "shard.bin"))
    again = read_jsonl_zst(renamed).to_pandas()
    assert len(again) > 0


def test_fixed_width_roundtrip_edges(ray_session):
    """Fixed-width source/sink: unicode multi-byte padding, nulls render
    empty, exact-width values survive, over-width raises."""
    import pandas as pd
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from dedupe_ray.sources import read_fixed_width, write_fixed_width

    df = pd.DataFrame(
        {
            "k": [1, 22, 333],
            "s": ["abc", None, "héllo"],  # é is 2 bytes utf-8
        }
    )
    widths = [("k", 4), ("s", 8)]
    out = "/tmp/dedupe_ray_fw_test"
    write_fixed_width(rd.from_pandas(df), out, widths)
    got = (
        read_fixed_width(
            out, widths, pa.schema([("k", pa.int64()), ("s", pa.string())])
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert got["k"].tolist() == [1, 22, 333]
    assert got["s"].tolist() == ["abc", "", "héllo"]
    # width-exact ascii value round-trips
    write_fixed_width(
        rd.from_pandas(pd.DataFrame({"k": [1], "s": ["12345678"]})), out, widths
    )
    got2 = read_fixed_width(out, widths).to_pandas()
    assert got2["s"].tolist() == ["12345678"]
    with pytest.raises(Exception):
        write_fixed_width(
            rd.from_pandas(pd.DataFrame({"k": [1], "s": ["123456789"]})), out, widths
        )


def test_webdataset_roundtrip_unit(ray_session, tmp_path):
    import pyarrow as pa
    import ray.data as rd

    from dedupe_ray.sources import read_webdataset, write_webdataset

    tbl = pa.table(
        {
            "k": ["a", "b.with.dots", "c"],  # keys may contain dots
            "txt": ["héllo\nworld", None, "plain"],  # unicode + null
            "img": pa.array([b"\x89PNG\x00raw", b"", None], pa.binary()),
        }
    )
    out = str(tmp_path / "wds")
    write_webdataset(
        rd.from_arrow(tbl).repartition(2), out, "k", ["txt", "img"],
        binary_columns={"img"},
    )
    got = (
        read_webdataset(out + "/", ["txt", "img"], binary_columns={"img"})
        .to_pandas()
        .sort_values("__key__")
        .reset_index(drop=True)
    )
    assert got["__key__"].tolist() == ["a", "b.with.dots", "c"]
    assert got["txt"].tolist()[0] == "héllo\nworld"
    assert got["txt"].isna().tolist() == [False, True, False]
    assert got["img"].tolist()[0] == b"\x89PNG\x00raw"
    assert got["img"].tolist()[1] == b""
    assert got["img"].isna().tolist() == [False, False, True]


def test_webdataset_shards_are_deterministic(ray_session, tmp_path):
    import hashlib
    import os

    import pyarrow as pa
    import ray.data as rd

    from dedupe_ray.sources import write_webdataset

    tbl = pa.table({"k": ["x", "y"], "t": ["1", "2"]})

    def digest(d):
        h = hashlib.sha256()
        for f in sorted(os.listdir(d)):
            h.update(open(os.path.join(d, f), "rb").read())
        return h.hexdigest()

    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    write_webdataset(rd.from_arrow(tbl), a, "k", ["t"])
    write_webdataset(rd.from_arrow(tbl), b, "k", ["t"])
    assert digest(a) == digest(b)  # mtime/uid pinned -> identical bytes


def test_read_parquet_union_by_name(ray_session, tmp_path):
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from dedupe_ray.sources import read_parquet_union_by_name

    old = pa.table({"id": pa.array([1, 2], pa.int64()), "a": ["x", "y"]})
    new = pa.table(
        {
            "id": pa.array([3], pa.int64()),
            "a": ["z"],
            "b": pa.array([9.5], pa.float64()),
        }
    )
    d1, d2 = str(tmp_path / "v1"), str(tmp_path / "v2")
    rd.from_arrow(old).write_parquet(d1)
    rd.from_arrow(new).write_parquet(d2)
    out = (
        read_parquet_union_by_name([d1, d2])
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    assert list(out.columns) == ["id", "a", "b"]  # first-seen superset
    assert out["b"].isna().tolist() == [True, True, False]
    assert out["b"].tolist()[2] == 9.5

    # a type CHANGE across inputs raises instead of coercing
    bad = pa.table({"id": ["oops"], "a": ["w"]})
    d3 = str(tmp_path / "v3")
    rd.from_arrow(bad).write_parquet(d3)
    with pytest.raises(ValueError):
        read_parquet_union_by_name([d1, d3])

    # column pruning keeps only requested superset columns
    pruned = read_parquet_union_by_name([d1, d2], columns=["id", "b"]).to_pandas()
    assert sorted(pruned.columns) == ["b", "id"]
