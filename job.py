"""``ray job submit`` entrypoint for the flagship ER pipeline (the A18
orchestration surface — SURVEY.md maps the reference's HTTP orchestration
[backend/main.py:52-158] onto this CLI):

    ray job submit --working-dir . -- \
        python job.py --docs /data/docs.parquet --out /data/run1 \
                      --threshold 0.25 [--settings settings.json]

Runs :func:`dedupe_ray.io_utils.run_checkpointed_dedupe` — every stage
checkpoints under ``--out`` with per-partition lineage + metrics, so
re-submitting the same job after a crash resumes from the last finished
stage. Prints ONE JSON summary line (the reference's ``success`` response
shape: cluster/doc counts + output path).

Owns the Ray session ONLY when run as a script (guarded init — the driver
contract in ``__ray_entry__.py`` must never init).
"""

from __future__ import annotations

import argparse
import json
import os
import time


def main(argv: list[str] | None = None) -> dict:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--docs", required=True, help="input span-document parquet")
    p.add_argument("--out", required=True, help="checkpoint + output root")
    p.add_argument("--threshold", type=float, default=0.25)
    p.add_argument("--settings", default=None, help="trained settings JSON (StaticDedupe mode)")
    p.add_argument("--num-cpus", type=int, default=None, help="only used when this process owns ray.init")
    args = p.parse_args(argv)

    import ray

    owns_session = not ray.is_initialized()
    if owns_session:
        ray.init(
            address=os.environ.get("RAY_ADDRESS", "local"),
            num_cpus=args.num_cpus,
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from dedupe_ray.io_utils import run_checkpointed_dedupe

    t0 = time.time()
    clusters = run_checkpointed_dedupe(
        args.docs, args.out, threshold=args.threshold, settings_path=args.settings
    )
    out_dir = os.path.join(args.out, "clusters_out")
    import shutil

    shutil.rmtree(out_dir, ignore_errors=True)
    clusters.write_parquet(out_dir)
    import pyarrow.parquet as pq

    tbl = pq.read_table(out_dir, columns=["cluster_id", "doc_id"])
    summary = {
        "success": True,
        "docs": tbl.num_rows,
        "clusters": len(set(tbl.column("cluster_id").to_pylist())),
        "output": out_dir,
        "seconds": round(time.time() - t0, 3),
    }
    print(json.dumps(summary))
    if owns_session:
        ray.shutdown()
    return summary


if __name__ == "__main__":
    main()
