"""IO seam + resumable stage checkpointing + metrics.

- read/write behind one seam (BASELINE.json names Lance; unavailable here —
  parquet with the identical schema, so ``read_table``/``write_table`` can
  switch format without touching pipelines).
- ``CheckpointManager``: per-stage resumable output. A stage's result is a
  partitioned parquet directory plus ``_manifest.json`` recording the stage
  fingerprint (inputs hash + code tag), row count and per-partition lineage.
  A rerun with the same fingerprint skips the stage and re-reads its output;
  a mid-run crash leaves no manifest (writes are tmp-dir + atomic rename),
  so the stage recomputes — "resume mid-run reproduces single-run output".
- ``Metrics``: a named Ray actor accumulating per-stage counters
  (records in/out, pairs, oversized blocks), dumped to METRICS.json.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time

import ray
import ray.data


def read_table(
    path: str, columns: list[str] | None = None, format: str | None = None
) -> "ray.data.Dataset":
    """Format seam: one call site for every pipeline read.

    ``format`` is inferred from the path (``.lance`` → Lance, else
    parquet) or forced explicitly. Lance (the BASELINE.json input format)
    routes through ``ray.data.read_lance`` when the ``lance`` package is
    importable — this sandbox doesn't ship it, so the route is exercised
    by a stub-injected unit test and fails with a clear error otherwise;
    parquet carries the identical schema either way, so pipelines never
    see the difference."""
    fmt = format or ("lance" if path.rstrip("/").endswith(".lance") else "parquet")
    if fmt == "lance":
        try:
            import lance  # noqa: F401
        except ImportError as e:
            raise ImportError(
                "reading a Lance table requires the 'lance' package, which "
                "is not installed in this environment; re-materialize the "
                "table as parquet (same schema) or install pylance"
            ) from e
        return ray.data.read_lance(path, columns=columns)
    return ray.data.read_parquet(path, columns=columns)


def write_table(ds: "ray.data.Dataset", path: str) -> None:
    shutil.rmtree(path, ignore_errors=True)
    tmp = path + ".__tmp__"
    shutil.rmtree(tmp, ignore_errors=True)
    ds.write_parquet(tmp)
    os.replace(tmp, path)


def fingerprint(*parts: object) -> str:
    h = hashlib.sha256()
    for p in parts:
        h.update(repr(p).encode())
        h.update(b"\x00")
    return h.hexdigest()[:16]


class CheckpointManager:
    """Stage-level resume for a pipeline run rooted at ``root``."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _paths(self, stage: str) -> tuple[str, str]:
        d = os.path.join(self.root, f"stage={stage}")
        return d, os.path.join(d, "_manifest.json")

    def has(self, stage: str, fp: str) -> bool:
        _, man = self._paths(stage)
        if not os.path.exists(man):
            return False
        try:
            with open(man) as fh:
                m = json.load(fh)
            return m.get("fingerprint") == fp
        except (json.JSONDecodeError, OSError):
            return False

    def load(self, stage: str) -> "ray.data.Dataset":
        d, _ = self._paths(stage)
        return ray.data.read_parquet(os.path.join(d, "data"))

    def run_stage(
        self, stage: str, fp: str, compute, metrics: "Metrics | None" = None
    ) -> "ray.data.Dataset":
        """compute() → Dataset, checkpointed. Skips when (stage, fp) already
        completed; otherwise executes, writes data + manifest atomically."""
        d, man = self._paths(stage)
        if self.has(stage, fp):
            if metrics is not None:
                metrics.add(stage, skipped=1)
            return self.load(stage)
        shutil.rmtree(d, ignore_errors=True)
        tmp = d + ".__tmp__"
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(tmp, exist_ok=True)
        t0 = time.time()
        ds: "ray.data.Dataset" = compute()
        ds.write_parquet(os.path.join(tmp, "data"))
        out = ray.data.read_parquet(os.path.join(tmp, "data"))
        n = out.count()
        parts = sorted(os.listdir(os.path.join(tmp, "data")))
        manifest = {
            "stage": stage,
            "fingerprint": fp,
            "rows": n,
            "partitions": parts,
            "elapsed_sec": round(time.time() - t0, 3),
            "completed_at": time.time(),
        }
        with open(os.path.join(tmp, "_manifest.json"), "w") as fh:
            json.dump(manifest, fh, indent=2)
        os.replace(tmp, d)
        if metrics is not None:
            metrics.add(stage, rows_out=n, elapsed_sec=manifest["elapsed_sec"])
        return self.load(stage)


@ray.remote
class _MetricsActor:
    def __init__(self) -> None:
        self.counters: dict[str, dict[str, float]] = {}

    def add(self, stage: str, **kv: float) -> None:
        c = self.counters.setdefault(stage, {})
        for k, v in kv.items():
            c[k] = c.get(k, 0) + v

    def snapshot(self) -> dict:
        return self.counters


class Metrics:
    """Driver-side handle over the metrics actor (stages call .add remotely
    via the handle captured in closures)."""

    def __init__(self) -> None:
        self._actor = _MetricsActor.options(name=None).remote()

    def add(self, stage: str, **kv: float) -> None:
        self._actor.add.remote(stage, **kv)

    def snapshot(self) -> dict:
        return ray.get(self._actor.snapshot.remote())

    def dump(self, path: str) -> dict:
        snap = self.snapshot()
        with open(path, "w") as fh:
            json.dump(snap, fh, indent=2)
        return snap


def run_checkpointed_dedupe(
    docs_path: str,
    out_root: str,
    threshold: float = 0.25,
    settings_path: str | None = None,
    label_oracle=None,
) -> "ray.data.Dataset":
    """The flagship pipeline with per-stage checkpoints: flatten → train (or
    load settings) → pairs → scored edges → clusters. Re-running after a
    crash (or deleting a later stage dir) recomputes only what's missing."""
    from dedupe_ray.blocking import candidate_pairs
    from dedupe_ray.clustering import cluster_edges
    from dedupe_ray.pipeline import RayDeduper, active_label_loop, flatten_documents
    from dedupe_ray.scoring import assemble_pairs, score_pairs

    ckpt = CheckpointManager(out_root)
    metrics = Metrics()
    src_fp = fingerprint("src", docs_path, os.stat(docs_path).st_mtime_ns)

    docs = ray.data.read_parquet(docs_path)
    flat_fp = fingerprint(src_fp, "flatten", "v1")
    flat = ckpt.run_stage(
        "flatten", flat_fp, lambda: flatten_documents(docs)[0], metrics
    ).materialize()
    fields = [c for c in flat.schema().names if c != "doc_id"]

    settings_file = settings_path or os.path.join(out_root, "settings.json")
    if os.path.exists(settings_file):
        deduper = RayDeduper.load_settings(settings_file)
    else:
        from dedupe_ray.config import EngineConfig

        deduper = RayDeduper(EngineConfig.auto_detect(fields))
        deduper.prepare_training(flat)
        if label_oracle is None:
            raise ValueError("no settings file and no label oracle")
        active_label_loop(deduper, label_oracle)
        deduper.train()
        deduper.save_settings(settings_file)

    from dedupe_ray.blocking import candidate_pairs_raw, dedup_pairs

    model_fp = fingerprint(flat_fp, deduper.predicate_ids, deduper.classifier.to_dict())
    # raw pairs (incl. oversized-block markers) are the checkpoint artifact:
    # the deduped pairs AND the no-silent-caps metric both derive from it
    # without a second blocking pass
    raw_pairs = ckpt.run_stage(
        "pairs_raw",
        fingerprint(model_fp, "pairs_raw"),
        lambda: candidate_pairs_raw(
            flat, deduper.predicate_ids, deduper.config.max_block_size,
            index_tables=deduper.index_tables,
        ),
        metrics,
    )
    metrics.add("pairs", oversized_blocks=raw_pairs.filter(expr="oversized == 1").count())
    pairs = dedup_pairs(raw_pairs)
    edges = ckpt.run_stage(
        "edges",
        fingerprint(model_fp, "edges", threshold),
        lambda: score_pairs(
            assemble_pairs(pairs, flat, fields), deduper.classifier.to_dict(), deduper.config
        ).filter(expr=f"score >= {threshold}"),
        metrics,
    )
    clusters = ckpt.run_stage(
        "clusters",
        fingerprint(model_fp, "clusters", threshold),
        lambda: cluster_edges(edges, threshold),
        metrics,
    )
    metrics.dump(os.path.join(out_root, "METRICS.json"))
    return clusters


def write_partitioned_resumable(
    ds: "ray.data.Dataset",
    path: str,
    partition_column: str,
) -> dict:
    """Resumable partitioned parquet sink: one ``<partition_column>=v/``
    directory per key value, each stamped with a ``_SUCCESS`` marker when
    its data is complete — a failed 100-TB run reruns with the SAME call
    and only the unfinished partitions are (re)written.

    Protocol: (1) finished partitions (marker present) are excluded from
    the input with a broadcast filter — their bytes are never re-read or
    re-shuffled; (2) unfinished partition dirs left by a crash are wiped
    before writing (Ray writes uuid-named fragments, so append-after-crash
    would duplicate rows); (3) the pending partition values are computed
    from a streaming distinct, the write runs with Ray's hive-style
    ``partition_cols``, and markers land only after the write returns.
    Returns {"written": [...], "skipped": [...]}.
    """
    import urllib.parse

    import pyarrow.compute as pc

    os.makedirs(path, exist_ok=True)
    prefix = f"{partition_column}="

    def _dir_value(name: str) -> str:
        return urllib.parse.unquote(name[len(prefix):])

    finished, stale = [], []
    for name in os.listdir(path):
        if not name.startswith(prefix):
            continue
        if os.path.exists(os.path.join(path, name, "_SUCCESS")):
            finished.append(_dir_value(name))
        else:
            stale.append(name)
    for name in stale:  # crash leftovers: uuid fragments would duplicate
        shutil.rmtree(os.path.join(path, name), ignore_errors=True)

    fin_ref = ray.put(set(finished))

    def drop_finished(b):
        import pyarrow as pa

        done = ray.get(fin_ref)
        if not done:
            return b
        vals = [str(v) for v in b.column(partition_column).to_pylist()]
        return b.filter(pa.array([v not in done for v in vals]))

    pending = ds.map_batches(drop_finished, batch_format="pyarrow")
    uniq = pending.select_columns([partition_column]).unique(partition_column)
    todo = sorted(str(v) for v in (uniq or []))  # unique() -> None when empty
    if todo:
        pending.write_parquet(path, partition_cols=[partition_column])
        for v in todo:
            part_dir = os.path.join(
                path, prefix + urllib.parse.quote(str(v), safe="")
            )
            if os.path.isdir(part_dir):
                with open(os.path.join(part_dir, "_SUCCESS"), "w") as f:
                    f.write("")
    return {"written": todo, "skipped": sorted(finished)}


def compact_shards(
    in_path: str,
    out_path: str,
    target_bytes: int = 256 * 1024 * 1024,
) -> dict:
    """Small-files compaction (the Delta/Iceberg ``OPTIMIZE`` shape): read
    a parquet directory that has accumulated many under-sized shards
    (per-block sinks, incremental appends, hive partitions) and rewrite
    it as ~``target_bytes`` output files. At 100 TB the small-files
    problem is an operational killer — metadata-bound planning, one
    scheduler round-trip per tiny read task — and compaction is the
    standing maintenance job that fixes it.

    Streaming shape: ``read_parquet`` (file count only drives planning),
    one ``repartition`` to ``ceil(input_bytes / target_bytes)`` blocks
    (Ray's all-to-all — rows never sit on the driver), atomic dir-swap
    write. Returns {"rows", "in_files", "out_files", "in_bytes"} so a
    scheduler can assert no data loss and measure the win.
    """
    import math

    import pyarrow.dataset as pads

    dataset = pads.dataset(in_path, format="parquet")
    in_files = list(dataset.files)
    in_bytes = sum(os.path.getsize(f) for f in in_files)
    n_out = max(1, math.ceil(in_bytes / int(target_bytes)))

    ds = ray.data.read_parquet(in_path)
    rows = ds.count()
    write_table(ds.repartition(n_out), out_path)
    out_files = [f for f in os.listdir(out_path) if f.endswith(".parquet")]
    return {
        "rows": rows,
        "in_files": len(in_files),
        "out_files": len(out_files),
        "in_bytes": in_bytes,
    }
