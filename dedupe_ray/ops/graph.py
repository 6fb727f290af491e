"""Graph compute beyond connected components: iterative message-passing
ops built from the same bucketed-join/groupby primitives the rest of the
engine uses. Everything here is deterministic and layout-invariant by
construction — scores are exact int64 micro-units, so merges/sums are
order-free and a SQL oracle can evaluate the identical arithmetic."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data


def pagerank_micro(
    edges_ds: "ray.data.Dataset",
    src_column: str = "src",
    dst_column: str = "dst",
    iters: int = 3,
    damping_pct: int = 85,
    scale: int = 10**12,
) -> "ray.data.Dataset":
    """PageRank in exact integer micro-units: pr₀ = scale for every node;
    pr_{k+1}(v) = (100−d)·scale/100 + d·Σ_{(u,v)∈E} (pr_k(u) // outdeg(u)) // 100
    — every step is int64 floor arithmetic, so the result is
    parallelism-invariant AND engine-exact against an unrolled SQL
    mirror. Dangling mass is dropped (the standard simplification) and
    duplicate edges are collapsed first (they would inflate outdeg).

    Shape per iteration: one bucketed unique-key join (node scores onto
    edges) + one groupby-Sum over destinations + one LEFT join back onto
    the node table — all hash-partitioned; nothing is collected
    driver-side. Per-node state is two int64s; 100 TB of edges streams
    through ``iters`` bounded shuffles."""
    from ray.data.aggregate import Sum

    from dedupe_ray.joins import bucketed_lookup_join

    if not (0 < damping_pct < 100):
        raise ValueError("damping_pct must be in (0, 100)")
    base = ((100 - damping_pct) * scale) // 100

    edges = (
        edges_ds.select_columns([src_column, dst_column])
        .groupby([src_column, dst_column])
        .count()
        .drop_columns(["count()"])
        .materialize()
    )

    def to_nodes(t: pa.Table) -> pa.Table:
        a = t.column(src_column).combine_chunks()
        return pa.table({"node": a})

    nodes = (
        edges.map_batches(to_nodes, batch_format="pyarrow")
        .union(
            edges.map_batches(
                lambda t: pa.table({"node": t.column(dst_column).combine_chunks()}),
                batch_format="pyarrow",
            )
        )
        .groupby("node")
        .count()
        .drop_columns(["count()"])
        .materialize()
    )

    outdeg = edges.groupby(src_column).count().map_batches(
        lambda t: pa.table(
            {
                src_column: t.column(src_column),
                "outdeg": t.column("count()"),
            }
        ),
        batch_format="pyarrow",
    )
    edges_w = bucketed_lookup_join(
        edges, outdeg, src_column, src_column, ["outdeg"]
    ).materialize()

    pr = nodes.map_batches(
        lambda t: t.append_column(
            "pr", pa.array(np.full(len(t), scale, np.int64))
        ),
        batch_format="pyarrow",
    ).materialize()

    for _ in range(iters):
        contrib = bucketed_lookup_join(
            edges_w, pr, src_column, "node", ["pr"]
        ).map_batches(
            lambda t: pa.table(
                {
                    "dst": t.column(dst_column),
                    "m": pa.array(
                        t.column("pr").to_numpy(zero_copy_only=False)
                        // t.column("outdeg").to_numpy(zero_copy_only=False)
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        sums = contrib.groupby("dst").aggregate(Sum("m", alias_name="m"))

        def fold(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            # unmatched nodes (no inbound edges) carry NULL m → 0
            m = (
                pc.fill_null(pc.cast(t.column("m"), pa.int64()), 0)
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
            )
            return pa.table(
                {
                    "node": t.column("node"),
                    "pr": pa.array(base + (damping_pct * m) // 100),
                }
            )

        pr = (
            bucketed_lookup_join(nodes, sums, "node", "dst", ["m"], how="left")
            .map_batches(fold, batch_format="pyarrow")
            .materialize()
        )
    return pr
