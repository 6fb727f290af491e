"""Resume-from-checkpoint: rerun after partial completion reproduces the
single-run output (BASELINE.md resume target)."""

import json
import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

pytestmark = pytest.mark.slow_e2e  # training-loop / multi-run pipeline e2e

from dedupe_ray.eval import clusters_assignment, truth_assignment
from dedupe_ray.fixtures import corpus_paths
from dedupe_ray.io_utils import CheckpointManager, fingerprint, run_checkpointed_dedupe


@pytest.fixture(scope="module")
def corpus():
    docs_path, truth_path = corpus_paths(1000, seed=42)
    ta = truth_assignment(pq.read_table(truth_path))
    return docs_path, ta


def _assignment(ds):
    return clusters_assignment(pa.Table.from_pandas(ds.to_pandas()))


def test_checkpoint_skip_and_resume(tmp_path, corpus):
    docs_path, ta = corpus
    root = str(tmp_path / "run")
    oracle = lambda a, b: ta[a["doc_id"]] == ta[b["doc_id"]]

    first = _assignment(run_checkpointed_dedupe(docs_path, root, 0.25, label_oracle=oracle))
    assert first

    # stage manifests exist with lineage info
    for stage in ("flatten", "pairs_raw", "edges", "clusters"):
        man = json.load(open(os.path.join(root, f"stage={stage}", "_manifest.json")))
        assert man["rows"] >= 0 and man["partitions"], stage

    # simulate a crash after 'pairs': delete later stages, rerun → same output
    shutil.rmtree(os.path.join(root, "stage=edges"))
    shutil.rmtree(os.path.join(root, "stage=clusters"))
    second = _assignment(run_checkpointed_dedupe(docs_path, root, 0.25, label_oracle=oracle))
    assert second == first

    # full rerun with everything cached is also identical (and skips stages)
    third = _assignment(run_checkpointed_dedupe(docs_path, root, 0.25, label_oracle=oracle))
    assert third == first


def test_fingerprint_invalidates(tmp_path):
    ckpt = CheckpointManager(str(tmp_path / "c"))
    import ray.data as rd

    calls = {"n": 0}

    def compute():
        calls["n"] += 1
        return rd.range(5)

    fp1 = fingerprint("a", 1)
    ckpt.run_stage("s", fp1, compute)
    ckpt.run_stage("s", fp1, compute)
    assert calls["n"] == 1  # second call skipped
    ckpt.run_stage("s", fingerprint("a", 2), compute)
    assert calls["n"] == 2  # changed fingerprint recomputes


def test_write_partitioned_resumable(tmp_path, ray_session):
    import os

    import pyarrow as pa
    import ray.data as rd

    from dedupe_ray.io_utils import write_partitioned_resumable

    out = str(tmp_path / "parts")
    ds = rd.from_arrow(
        pa.table({"k": ["a", "a", "b", "b", "c"], "v": [1, 2, 3, 4, 5]})
    )
    r1 = write_partitioned_resumable(ds, out, "k")
    assert r1 == {"written": ["a", "b", "c"], "skipped": []}

    # crash simulation: partition b unfinished (marker gone, stale fragment
    # on disk) — the rerun must rewrite ONLY b and never duplicate rows
    os.remove(os.path.join(out, "k=b", "_SUCCESS"))
    r2 = write_partitioned_resumable(ds, out, "k")
    assert r2 == {"written": ["b"], "skipped": ["a", "c"]}
    back = rd.read_parquet(out).to_pandas()
    assert sorted(back["v"].tolist()) == [1, 2, 3, 4, 5]

    # clean rerun: everything skipped, nothing rewritten
    r3 = write_partitioned_resumable(ds, out, "k")
    assert r3 == {"written": [], "skipped": ["a", "b", "c"]}


def test_read_table_lance_route(ray_session, tmp_path, monkeypatch):
    """The Lance seam: .lance paths route to ray.data.read_lance when the
    package imports (stub-injected here — the sandbox has no pylance), and
    raise a clear ImportError when it doesn't."""
    import sys
    import types

    import pytest
    import ray.data as rd

    from dedupe_ray.io_utils import read_table

    calls = {}

    def fake_read_lance(path, columns=None):
        calls["path"], calls["columns"] = path, columns
        import pyarrow as pa

        return rd.from_arrow(pa.table({"doc_id": ["x"]}))

    monkeypatch.setitem(sys.modules, "lance", types.ModuleType("lance"))
    monkeypatch.setattr(rd, "read_lance", fake_read_lance)
    out = read_table("/data/corpus.lance", columns=["doc_id"])
    assert out.take_all() == [{"doc_id": "x"}]
    assert calls == {"path": "/data/corpus.lance", "columns": ["doc_id"]}

    monkeypatch.delitem(sys.modules, "lance")
    import builtins

    real_import = builtins.__import__

    def no_lance(name, *a, **kw):
        if name == "lance":
            raise ImportError("no lance")
        return real_import(name, *a, **kw)

    monkeypatch.setattr(builtins, "__import__", no_lance)
    with pytest.raises(ImportError, match="parquet"):
        read_table("/data/corpus.lance")

    # parquet default unaffected
    import pyarrow.parquet as pq
    import pyarrow as pa

    p = tmp_path / "t.parquet"
    pq.write_table(pa.table({"a": [1, 2]}), p)
    assert read_table(str(p)).count() == 2


def test_job_entrypoint(ray_session, tmp_path):
    """The ray-job-submit CLI surface: runs the checkpointed flagship on the
    fixture corpus inside the existing session (guarded init), prints the
    success response shape, and resumes from checkpoints on re-run."""
    import json

    import job as jobmod
    from dedupe_ray.fixtures import corpus_paths

    docs_path, truth_path = corpus_paths(500, seed=42)
    ta = truth_assignment(pq.read_table(truth_path))
    out = str(tmp_path / "jobrun")
    # train once via the library path (the CLI is the StaticDedupe surface:
    # a settings checkpoint exists before jobs get submitted) — this also
    # drops out/settings.json where the job picks it up
    run_checkpointed_dedupe(
        docs_path, out, 0.25,
        label_oracle=lambda a, b: ta[a["doc_id"]] == ta[b["doc_id"]],
    )
    s1 = jobmod.main(["--docs", docs_path, "--out", out, "--threshold", "0.25"])
    assert s1["success"] and s1["docs"] > 0 and s1["clusters"] > 0
    # second submit resumes from checkpoints — same output, much less work
    s2 = jobmod.main(["--docs", docs_path, "--out", out, "--threshold", "0.25"])
    assert (s2["docs"], s2["clusters"]) == (s1["docs"], s1["clusters"])


def test_compact_shards_preserves_rows_and_reduces_files(ray_session):
    """compact_shards: many tiny shards rewrite to few target-size files
    with identical row content; the report counts match reality."""
    import os

    import pandas as pd
    import ray.data as rd

    from dedupe_ray.io_utils import compact_shards

    src_dir = "/tmp/dedupe_ray_compact_src"
    out_dir = "/tmp/dedupe_ray_compact_out"
    import shutil

    shutil.rmtree(src_dir, ignore_errors=True)
    df = pd.DataFrame({"k": range(5000), "v": [f"x{i}" for i in range(5000)]})
    # 50 tiny shards
    rd.from_pandas(df).repartition(50).write_parquet(src_dir)
    n_in = len([f for f in os.listdir(src_dir) if f.endswith(".parquet")])
    assert n_in >= 25  # ray writes one file per block

    report = compact_shards(src_dir, out_dir, target_bytes=10**9)
    assert report["rows"] == 5000
    assert report["in_files"] == n_in
    assert report["out_files"] == 1  # everything fits one target shard

    got = (
        rd.read_parquet(out_dir)
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, df)
