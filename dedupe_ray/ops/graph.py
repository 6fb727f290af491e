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

    # repartition before each materialize: groupby outputs inherit high
    # block counts and every bucketed join over them schedules thousands
    # of tiny tasks across rounds (geometric block explosion — see
    # bfs_hops; 8+ min → seconds at sf0.1/32 CPUs). All these tables are
    # node/edge-bounded.
    edges = (
        edges_ds.select_columns([src_column, dst_column])
        .groupby([src_column, dst_column])
        .count()
        .drop_columns(["count()"])
        .repartition(16)
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
        .repartition(16)
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
    edges_w = (
        bucketed_lookup_join(edges, outdeg, src_column, src_column, ["outdeg"])
        .repartition(16)
        .materialize()
    )

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
            .repartition(16)
            .materialize()
        )
    return pr



def _canonical_edges(
    edges_ds: "ray.data.Dataset",
    src_column: str,
    dst_column: str,
    repartition: int | None = None,
) -> "ray.data.Dataset":
    """Canonical undirected simple-edge table — the shared front door of
    every graph op here: endpoints string-cast, (u, w) = (min, max),
    self-loops dropped, duplicate/reversed edges collapsed via one
    groupby; materialized because every caller scans it at least twice.
    ``repartition`` bounds the block count for callers that loop
    (the bfs_hops block-explosion rule)."""
    import pyarrow.compute as pc

    def canon(t: pa.Table) -> pa.Table:
        a = pc.cast(t.column(src_column), pa.string())
        b = pc.cast(t.column(dst_column), pa.string())
        u = pc.min_element_wise(a, b)
        w = pc.max_element_wise(a, b)
        keep = pc.not_equal(u, w)  # drop self-loops
        return pa.table({"u": u.combine_chunks(), "w": w.combine_chunks()}).filter(
            keep.combine_chunks() if isinstance(keep, pa.ChunkedArray) else keep
        )

    out = (
        edges_ds.map_batches(canon, batch_format="pyarrow")
        .groupby(["u", "w"])
        .count()
        .drop_columns(["count()"])
    )
    if repartition is not None:
        out = out.repartition(repartition)
    return out.materialize()


def triangle_counts(
    edges_ds: "ray.data.Dataset",
    src_column: str = "src",
    dst_column: str = "dst",
) -> "ray.data.Dataset":
    """Per-node triangle participation counts over an undirected simple
    graph (edges in either orientation; duplicates collapse). Method:
    every node emits its neighbor-pair WEDGES (u,w) with u<w — the same
    size-batched triu gather as cooccurrence mining — and a wedge closed
    by an actual edge is a triangle counted at its center, so the matched-
    wedge count per center IS that node's triangle count (each triangle
    has exactly one wedge at each of its three vertices).

    Shape: wedge emission is one bucketed groupby over adjacency rows; the
    closing check is a bucketed unique-key join against the canonical edge
    set; the final count is a bounded groupby. Wedge volume is Σ deg² —
    the intrinsic cost of per-node triangle counting; cap hub degrees
    upstream (``cap_per_key``) on power-law graphs."""
    from ray.data.aggregate import Count

    from dedupe_ray.blocking import N_BUCKETS
    from dedupe_ray.joins import bucketed_lookup_join
    from dedupe_ray.ops.tabular import _bucket_hash_col

    edges = _canonical_edges(edges_ds, src_column, dst_column)

    def adj(t: pa.Table) -> pa.Table:
        u = t.column("u").combine_chunks()
        w = t.column("w").combine_chunks()
        node = pa.concat_arrays([u, w])
        nbr = pa.concat_arrays([w, u])
        out = pa.table({"node": node, "nbr": nbr})
        return out.append_column("__abkt", _bucket_hash_col(node, N_BUCKETS))

    def wedges(group: pa.Table) -> pa.Table:
        df = (
            group.select(["node", "nbr"])
            .to_pandas()
            .sort_values(["node", "nbr"], kind="mergesort")
        )
        if len(df) == 0:
            return pa.table(
                {
                    "center": pa.array([], pa.string()),
                    "wkey": pa.array([], pa.string()),
                }
            )
        nodes = df["node"].to_numpy(object)
        nbrs = df["nbr"].to_numpy(object)
        new_n = np.empty(len(df), bool)
        new_n[0] = True
        new_n[1:] = nodes[1:] != nodes[:-1]
        starts = np.flatnonzero(new_n)
        ks = np.diff(np.append(starts, len(df)))
        out_c, out_a, out_b = [], [], []
        for k in np.unique(ks):
            if k < 2:
                continue
            iu, ju = np.triu_indices(int(k), 1)
            s = starts[ks == k]
            out_a.append((s[:, None] + iu[None, :]).ravel())
            out_b.append((s[:, None] + ju[None, :]).ravel())
            out_c.append(np.repeat(s, len(iu)))
        if not out_a:
            return pa.table(
                {
                    "center": pa.array([], pa.string()),
                    "wkey": pa.array([], pa.string()),
                }
            )
        ia, ib, ic = (np.concatenate(x) for x in (out_a, out_b, out_c))
        wkey = np.char.add(
            np.char.add(nbrs[ia].astype(str), "\x1f"), nbrs[ib].astype(str)
        )
        return pa.table(
            {
                "center": pa.array(nodes[ic], pa.string()),
                "wkey": pa.array(wkey.tolist(), pa.string()),
            }
        )

    wedge_ds = (
        edges.map_batches(adj, batch_format="pyarrow")
        .groupby("__abkt")
        .map_groups(wedges, batch_format="pyarrow")
    )
    ekeys = edges.map_batches(
        lambda t: pa.table(
            {
                "ekey": pa.compute.binary_join_element_wise(
                    t.column("u"), t.column("w"), "\x1f"
                ),
                "present": pa.array(np.ones(len(t), np.int8)),
            }
        ),
        batch_format="pyarrow",
    )
    closed = bucketed_lookup_join(wedge_ds, ekeys, "wkey", "ekey", ["present"])
    return (
        closed.groupby("center")
        .aggregate(Count(alias_name="n_tri"))
        .map_batches(
            lambda t: pa.table(
                {
                    "node": t.column("center"),
                    "n_tri": pa.compute.cast(t.column("n_tri"), pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
    )


def link_prediction_scores(
    edges_ds: "ray.data.Dataset",
    src_column: str = "src",
    dst_column: str = "dst",
) -> "ray.data.Dataset":
    """Common-neighbors and Adamic–Adar link-prediction scores
    (Liben-Nowell & Kleinberg, CIKM 2003) for every NON-adjacent node
    pair with at least one common neighbor — the classic
    missing-edge / entity-merge-candidate signal over an undirected
    simple graph (edges in either orientation, duplicates collapse).

    Method: every node emits its neighbor-pair wedges (u,w), u<w — the
    same size-batched triu gather as :func:`triangle_counts` — and each
    wedge at center v contributes one common neighbor and one
    Adamic–Adar term ``1/ln(deg v)`` to the pair. The AA term is kept in
    EXACT integer nano-units, ``10^15 // floor(1e6 · ln(deg))`` — the
    run length of the center's adjacency rows inside its hash bucket IS
    its degree — so the per-pair sums are order-free,
    parallelism-invariant, and SQL-exact (the quantize-the-
    transcendental doctrine). Wedges pre-aggregate per bucket (the
    combiner), one groupby(u,w) finishes the sums, and pairs that are
    already edges drop via a bucketed LEFT anti-join against the
    canonical edge keys. Wedge volume is Σ deg²; cap hub degrees
    upstream (``cap_per_key``) on power-law graphs.

    Output: (u, w, cn int64, aa_nano int64).
    """
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    from dedupe_ray.blocking import N_BUCKETS
    from dedupe_ray.joins import bucketed_lookup_join
    from dedupe_ray.ops.tabular import _bucket_hash_col

    edges = _canonical_edges(edges_ds, src_column, dst_column)

    def adj(t: pa.Table) -> pa.Table:
        u = t.column("u").combine_chunks()
        w = t.column("w").combine_chunks()
        node = pa.concat_arrays([u, w])
        nbr = pa.concat_arrays([w, u])
        out = pa.table({"node": node, "nbr": nbr})
        return out.append_column("__abkt", _bucket_hash_col(node, N_BUCKETS))

    def wedge_partials(group: pa.Table) -> pa.Table:
        import math

        import pandas as pd

        empty = pa.table(
            {
                "u": pa.array([], pa.string()),
                "w": pa.array([], pa.string()),
                "cn": pa.array([], pa.int64()),
                "aa_nano": pa.array([], pa.int64()),
            }
        )
        df = (
            group.select(["node", "nbr"])
            .to_pandas()
            .sort_values(["node", "nbr"], kind="mergesort")
        )
        if len(df) == 0:
            return empty
        nodes = df["node"].to_numpy(object)
        nbrs = df["nbr"].to_numpy(object)
        new_n = np.empty(len(df), bool)
        new_n[0] = True
        new_n[1:] = nodes[1:] != nodes[:-1]
        starts = np.flatnonzero(new_n)
        ks = np.diff(np.append(starts, len(df)))
        out_a, out_b, out_t = [], [], []
        for k in np.unique(ks):
            if k < 2:
                continue
            # run length k == deg(center): the bucket holds ALL adjacency
            # rows of its nodes. Same IEEE chain as the SQL mirror:
            # int → double → libm log → ×1e6 → floor → integer division
            term = 10**15 // math.floor(1000000.0 * math.log(float(k)))
            iu, ju = np.triu_indices(int(k), 1)
            s = starts[ks == k]
            out_a.append((s[:, None] + iu[None, :]).ravel())
            out_b.append((s[:, None] + ju[None, :]).ravel())
            out_t.append(np.full(len(s) * len(iu), term, np.int64))
        if not out_a:
            return empty
        ia = np.concatenate(out_a)
        ib = np.concatenate(out_b)
        part = pd.DataFrame(
            {"u": nbrs[ia], "w": nbrs[ib], "aa_nano": np.concatenate(out_t)}
        )
        agg = part.groupby(["u", "w"], as_index=False).agg(
            cn=("aa_nano", "size"), aa_nano=("aa_nano", "sum")
        )
        agg["cn"] = agg["cn"].astype(np.int64)
        return pa.Table.from_pandas(agg[["u", "w", "cn", "aa_nano"]], preserve_index=False)

    pairs = (
        edges.map_batches(adj, batch_format="pyarrow")
        .groupby("__abkt")
        .map_groups(wedge_partials, batch_format="pyarrow")
        .groupby(["u", "w"])
        .aggregate(Sum("cn", alias_name="cn"), Sum("aa_nano", alias_name="aa_nano"))
    )

    def pair_key(t: pa.Table) -> pa.Table:
        return t.append_column(
            "pkey", pc.binary_join_element_wise(t.column("u"), t.column("w"), "\x1f")
        )

    ekeys = edges.map_batches(
        lambda t: pa.table(
            {
                "ekey": pc.binary_join_element_wise(
                    t.column("u"), t.column("w"), "\x1f"
                ),
                "present": pa.array(np.ones(len(t), np.int8)),
            }
        ),
        batch_format="pyarrow",
    )
    joined = bucketed_lookup_join(
        pairs.map_batches(pair_key, batch_format="pyarrow"),
        ekeys,
        "pkey",
        "ekey",
        ["present"],
        how="left",
    )
    return joined.map_batches(
        lambda t: t.filter(pc.is_null(t.column("present"))).select(
            ["u", "w", "cn", "aa_nano"]
        ),
        batch_format="pyarrow",
    )


def degree_assortativity_moments(
    edges_ds: "ray.data.Dataset",
    src_column: str = "src",
    dst_column: str = "dst",
) -> pa.Table:
    """Exact integer sufficient statistics for the degree-assortativity
    coefficient (Newman 2002) of an undirected simple graph: over the
    2|E| directed edge instances with endpoint-degree pairs (dᵤ, d_w),
    returns one row ``(n2, sx, sxx, sxy)`` int64 — Pearson's r on
    degrees is then ``(n2·sxy − sx²) / (n2·sxx − sx²)`` (x/y marginals
    coincide by symmetry), a division the CALLER performs so no
    cross-engine float ever ships (the tpch_q14 exact num/den doctrine).

    Shape: canonical edge dedup → per-node degrees from the adjacency
    rows (combiner groupby) → TWO bucketed unique-key joins attach dᵤ
    and d_w to each edge → per-batch int64 moment partials → one global
    Sum. Order-free and layout-invariant by integer arithmetic.
    """
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    from dedupe_ray.joins import bucketed_lookup_join

    edges = _canonical_edges(edges_ds, src_column, dst_column)

    def adj(t: pa.Table) -> pa.Table:
        u = t.column("u").combine_chunks()
        w = t.column("w").combine_chunks()
        return pa.table({"node": pa.concat_arrays([u, w])})

    def deg_partial(b: pa.Table) -> pa.Table:
        import pandas as pd

        keys = b.column("node").to_numpy(zero_copy_only=False)
        codes, uniq = pd.factorize(keys)
        cnt = np.bincount(codes, minlength=len(uniq)).astype(np.int64)
        return pa.table({"node": pa.array(np.asarray(uniq)), "d": pa.array(cnt)})

    deg = (
        edges.map_batches(adj, batch_format="pyarrow")
        .map_batches(deg_partial, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Sum("d", alias_name="d"))
    )
    with_du = bucketed_lookup_join(edges, deg, "u", "node", ["d"]).map_batches(
        lambda t: t.rename_columns(["u", "w", "du"]), batch_format="pyarrow"
    )
    with_both = bucketed_lookup_join(with_du, deg, "w", "node", ["d"]).map_batches(
        lambda t: t.rename_columns(["u", "w", "du", "dw"]), batch_format="pyarrow"
    )

    def moments(t: pa.Table) -> pa.Table:
        du = t.column("du").to_numpy(zero_copy_only=False).astype(np.int64)
        dw = t.column("dw").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "n2": pa.array([2 * len(du)], pa.int64()),
                "sx": pa.array([int((du + dw).sum())], pa.int64()),
                "sxx": pa.array([int((du * du + dw * dw).sum())], pa.int64()),
                "sxy": pa.array([int(2 * (du * dw).sum())], pa.int64()),
            }
        )

    agg = with_both.map_batches(moments, batch_format="pyarrow").aggregate(
        Sum("n2", alias_name="n2"),
        Sum("sx", alias_name="sx"),
        Sum("sxx", alias_name="sxx"),
        Sum("sxy", alias_name="sxy"),
    )
    return pa.table(
        {
            "n2": pa.array([int(agg["n2"] or 0)], pa.int64()),
            "sx": pa.array([int(agg["sx"] or 0)], pa.int64()),
            "sxx": pa.array([int(agg["sxx"] or 0)], pa.int64()),
            "sxy": pa.array([int(agg["sxy"] or 0)], pa.int64()),
        }
    )


def kcore(
    edges_ds: "ray.data.Dataset",
    k: int,
    src_column: str = "src",
    dst_column: str = "dst",
    max_rounds: int = 64,
) -> "ray.data.Dataset":
    """k-core decomposition by iterative peeling: repeatedly drop nodes
    with degree < k (degrees recomputed on the surviving subgraph) until a
    fixpoint; returns the surviving (node, degree) table — the standard
    dense-subgraph/spam-farm signal. Deterministic set semantics (no
    floats); convergence is detected by the surviving-node COUNT, which is
    trivially layout-invariant, and peeling is monotone so an unchanged
    count IS the fixpoint. Rounds beyond the fixpoint are no-ops — which
    is what lets a fixed-depth unrolled SQL mirror hash-match whenever the
    fixpoint arrives within its unroll depth.

    Per round: one degree groupby + two bucketed semi-joins (each edge end
    must survive). Nothing collects driver-side except the scalar count."""
    from ray.data.aggregate import Count

    from dedupe_ray.joins import bucketed_lookup_join

    # repartition before each loop materialize — peeling rounds otherwise
    # inherit ever-growing block counts from the groupby/join outputs and
    # the per-round bucketed joins drown in tiny tasks (see bfs_hops)
    edges = _canonical_edges(edges_ds, src_column, dst_column, repartition=16)

    def degrees(e: "ray.data.Dataset") -> "ray.data.Dataset":
        both = e.map_batches(
            lambda t: pa.table(
                {
                    "node": pa.concat_arrays(
                        [t.column("u").combine_chunks(), t.column("w").combine_chunks()]
                    )
                }
            ),
            batch_format="pyarrow",
        )
        return both.groupby("node").aggregate(Count(alias_name="degree"))

    prev_nodes = -1
    for _ in range(max_rounds):
        deg = degrees(edges).repartition(16).materialize()
        alive = deg.filter(expr=f"degree >= {int(k)}").materialize()
        n_alive = alive.count()
        if n_alive == prev_nodes:
            return deg.filter(expr=f"degree >= {int(k)}")
        if n_alive == 0:
            return ray.data.from_arrow(
                pa.table(
                    {"node": pa.array([], pa.string()), "degree": pa.array([], pa.int64())}
                )
            )
        prev_nodes = n_alive
        marks = alive.map_batches(
            lambda t: pa.table(
                {"node": t.column("node"), "__alive": pa.array(np.ones(len(t), np.int8))}
            ),
            batch_format="pyarrow",
        )
        edges = (
            bucketed_lookup_join(edges, marks, "u", "node", ["__alive"])
            .drop_columns(["__alive"])
        )
        edges = (
            bucketed_lookup_join(edges, marks, "w", "node", ["__alive"])
            .drop_columns(["__alive"])
            .repartition(16)
            .materialize()
        )
    raise RuntimeError(f"k-core peeling did not converge in {max_rounds} rounds")


def label_propagation(
    edges_ds: "ray.data.Dataset",
    src_column: str = "src",
    dst_column: str = "dst",
    iters: int = 3,
) -> "ray.data.Dataset":
    """Synchronous label propagation (Raghavan et al. 2007) over an
    undirected simple graph with deterministic tie-breaking: every node
    starts with its own id as label; each round, a node adopts the label
    held by the MOST of its neighbors, ties to the smallest label. Runs a
    FIXED ``iters`` rounds (classic sync LPA can oscillate on bipartite
    graphs, so a fixpoint test would not terminate in general) — the
    result is deterministic, layout-invariant, and mirrored exactly by an
    unrolled SQL oracle.

    Determinism mechanics: the per-node argmax is a single int64
    composite ``count·2³² − (label+1)`` maximized by Ray's Max aggregate
    — larger count wins, then SMALLER label (the +1 shift keeps label 0
    decodable). Node ids must be integers in ``[0, 2³²−2]`` and degrees
    < 2³¹.

    Shape per round: one bucketed unique-key join (labels onto directed
    edges) + a (dst,label) count groupby + a per-dst Max groupby — all
    hash-partitioned, per-node state one int64; nothing driver-sized."""
    import pyarrow.compute as pc

    from ray.data.aggregate import Max

    from dedupe_ray.joins import bucketed_lookup_join

    SHIFT = np.int64(1) << np.int64(32)

    def both_dirs(t: pa.Table) -> pa.Table:
        a = pc.cast(t.column(src_column), pa.int64()).combine_chunks()
        b = pc.cast(t.column(dst_column), pa.int64()).combine_chunks()
        keep = pc.not_equal(a, b)  # self-loops never change the argmax order
        a, b = a.filter(keep), b.filter(keep)
        return pa.table(
            {
                "src": pa.concat_arrays([a, b]),
                "dst": pa.concat_arrays([b, a]),
            }
        )

    edges = (
        edges_ds.map_batches(both_dirs, batch_format="pyarrow")
        .groupby(["src", "dst"])
        .count()
        .drop_columns(["count()"])
        .repartition(16)
        .materialize()
    )
    # the per-round repartition matters: groupby outputs inherit high
    # block counts and each bucketed join then schedules thousands of
    # tiny tasks (same geometric explosion measured in bfs_hops —
    # 98 s → ~10 s at sf0.1/32 CPUs); labels are node-bounded

    labels = (
        edges.map_batches(
            lambda t: pa.table(
                {"node": t.column("src"), "label": t.column("src")}
            ),
            batch_format="pyarrow",
        )
        .groupby("node")
        .count()
        .map_batches(
            lambda t: pa.table(
                {"node": t.column("node"), "label": t.column("node")}
            ),
            batch_format="pyarrow",
        )
        .repartition(16)
        .materialize()
    )

    # fused round: the (node,label) vote count and the per-node composite
    # argmax resolve inside ONE bucketed map_groups (per-batch combiner
    # pre-counts votes so a bucket ships at most its distinct
    # (node,label) pairs per block) — one all-to-all per round instead of
    # two, identical integer argmax c·2³² − (label+1).
    import pandas as _pd

    def vote_partial(t: pa.Table) -> pa.Table:
        lab = t.column("label").to_numpy(zero_copy_only=False).astype(np.int64)
        if len(lab) and (lab.min() < 0 or lab.max() >= int(SHIFT) - 1):
            raise ValueError("label_propagation needs node ids in [0, 2**32-2]")
        df = (
            _pd.DataFrame(
                {
                    "node": t.column("dst").to_numpy(zero_copy_only=False),
                    "label": lab,
                }
            )
            .groupby(["node", "label"], sort=False)
            .size()
            .reset_index(name="c")
        )
        df["__nbkt"] = (_pd.util.hash_array(df["node"].to_numpy(np.int64)) % 256).astype(
            np.int32
        )
        return pa.Table.from_pandas(df, preserve_index=False)

    def bucket_argmax(g: _pd.DataFrame) -> _pd.DataFrame:
        votes = (
            g.groupby(["node", "label"], sort=False)["c"].sum().reset_index()
        )
        m = votes["c"].to_numpy(np.int64) * int(SHIFT) - (
            votes["label"].to_numpy(np.int64) + 1
        )
        votes["m"] = m
        best = votes.loc[votes.groupby("node", sort=False)["m"].idxmax()]
        lab = (best["m"].to_numpy(np.int64) // int(SHIFT) + 1) * int(SHIFT) - best[
            "m"
        ].to_numpy(np.int64) - 1
        return _pd.DataFrame({"node": best["node"].to_numpy(np.int64), "label": lab})

    for _ in range(iters):
        labels = (
            bucketed_lookup_join(edges, labels, "src", "node", ["label"])
            .map_batches(vote_partial, batch_format="pyarrow")
            .groupby("__nbkt")
            .map_groups(bucket_argmax, batch_format="pandas")
            .repartition(16)
            .materialize()
        )
    return labels


def bfs_hops(
    edges_ds: "ray.data.Dataset",
    seeds_ds: "ray.data.Dataset",
    src_column: str = "src",
    dst_column: str = "dst",
    seed_column: str = "node",
    iters: int = 3,
) -> "ray.data.Dataset":
    """Bounded-depth BFS from a seed set over an undirected simple graph:
    per-node minimum hop distance ≤ ``iters`` (unreached nodes are
    absent). The frontier-expansion member of the graph family next to
    CC / PageRank / LPA / triangles / k-core — the shape behind
    "everything within k hops of a flagged account" fraud sweeps and
    seed-expansion crawls.

    Shape per round: one bucketed unique-key join (reached distances onto
    directed edges), one (node) Min groupby over (reached ∪ expansions)
    — per-node state one int64, nothing driver-sized. The reached table
    materializes each round to keep the per-round DAG flat; rounds are
    FIXED so the output is deterministic and an unrolled SQL oracle
    evaluates the identical min-distance recurrence."""
    import pyarrow.compute as pc

    from ray.data.aggregate import Min

    from dedupe_ray.joins import bucketed_lookup_join

    def both_dirs(t: pa.Table) -> pa.Table:
        a = pc.cast(t.column(src_column), pa.int64()).combine_chunks()
        b = pc.cast(t.column(dst_column), pa.int64()).combine_chunks()
        keep = pc.not_equal(a, b)
        a, b = a.filter(keep), b.filter(keep)
        return pa.table(
            {
                "src": pa.concat_arrays([a, b]),
                "dst": pa.concat_arrays([b, a]),
            }
        )

    # Compact per round: union concatenates block lists and the groupby
    # keeps them, so without a repartition the reached table's block count
    # EXPLODES geometrically across rounds (64 → 960 blocks measured at
    # sf0.1) and round r+1's bucketed join schedules thousands of tiny
    # tasks — 94 s vs 9 s for the same answer. The reached table is
    # node-bounded; n_blocks caps its physical fan-out.
    n_blocks = 16

    edges = (
        edges_ds.map_batches(both_dirs, batch_format="pyarrow")
        .groupby(["src", "dst"])
        .count()
        .drop_columns(["count()"])
        .repartition(n_blocks)
        .materialize()
    )

    def init(t: pa.Table) -> pa.Table:
        n = pc.cast(t.column(seed_column), pa.int64())
        return pa.table({"node": n, "dist": pa.array(np.zeros(len(t), np.int64))})

    reached = (
        seeds_ds.map_batches(init, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Min("dist", alias_name="dist"))
        .repartition(n_blocks)
        .materialize()
    )

    for _ in range(iters):
        expand = bucketed_lookup_join(
            edges, reached, "src", "node", ["dist"]
        ).map_batches(
            lambda t: pa.table(
                {
                    "node": t.column("dst"),
                    "dist": pc.add(pc.cast(t.column("dist"), pa.int64()), 1),
                }
            ),
            batch_format="pyarrow",
        )
        reached = (
            reached.union(expand)
            .groupby("node")
            .aggregate(Min("dist", alias_name="dist"))
            .repartition(n_blocks)
            .materialize()
        )
    return reached


def hits_micro(
    edges_ds: "ray.data.Dataset",
    src_column: str = "src",
    dst_column: str = "dst",
    iters: int = 2,
    scale: int = 10**6,
) -> "ray.data.Dataset":
    """HITS hubs-and-authorities (Kleinberg 1999) in exact integer
    micro-units with MAX normalization: every node starts at
    ``hub = scale``; each iteration computes

        auth_raw(v) = Σ_{(u,v)∈E} hub(u);   auth = (auth_raw·scale) // max(auth_raw)
        hub_raw(u)  = Σ_{(u,v)∈E} auth(v);  hub  = (hub_raw·scale) // max(hub_raw)

    Max-normalization (instead of the textbook L2 norm) keeps every step
    in int64 floor arithmetic, so scores are parallelism-invariant and
    engine-exact against an unrolled SQL mirror (the pagerank_micro
    doctrine). Nodes without inbound edges get auth 0, without outbound
    edges hub 0. Duplicate edges are collapsed first.

    Shape per half-iteration: one bucketed unique-key join (scores onto
    edges) + one groupby-Sum + one bounded global Max (a scalar — the
    normalizer) + one LEFT join back onto the node table. State is two
    int64s per node; edges stream through 2·``iters`` bounded shuffles.
    Overflow bound: raw ≤ scale·max_degree·scale ≤ 10¹²·deg — safe in
    int64 for degree < 9·10⁶ at the default scale."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from dedupe_ray.joins import bucketed_lookup_join

    edges = (
        edges_ds.select_columns([src_column, dst_column])
        .groupby([src_column, dst_column])
        .count()
        .drop_columns(["count()"])
        .repartition(16)
        .materialize()
    )
    nodes = (
        edges.map_batches(
            lambda t: pa.table({"node": t.column(src_column).combine_chunks()}),
            batch_format="pyarrow",
        )
        .union(
            edges.map_batches(
                lambda t: pa.table({"node": t.column(dst_column).combine_chunks()}),
                batch_format="pyarrow",
            )
        )
        .groupby("node")
        .count()
        .drop_columns(["count()"])
        .repartition(16)
        .materialize()
    )

    def _half(scores, score_col: str, from_col: str, to_col: str, out_col: str):
        """One propagation half-step: scores flow from ``from_col`` to
        ``to_col`` endpoints, then max-normalize to ``scale``."""
        sums = (
            bucketed_lookup_join(edges, scores, from_col, "node", [score_col])
            .map_batches(
                lambda t: pa.table(
                    {"node": t.column(to_col), "m": t.column(score_col)}
                ),
                batch_format="pyarrow",
            )
            .groupby("node")
            .aggregate(Sum("m", alias_name="m"))
            .repartition(16)
            .materialize()
        )
        mx = sums.max("m")  # bounded: one scalar
        mx = int(mx) if mx is not None and int(mx) > 0 else 1

        def norm(t: pa.Table) -> pa.Table:
            m = (
                pc.fill_null(pc.cast(t.column("m"), pa.int64()), 0)
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
            )
            return pa.table(
                {"node": t.column("node"), out_col: pa.array((m * scale) // mx)}
            )

        return (
            bucketed_lookup_join(nodes, sums, "node", "node", ["m"], how="left")
            .map_batches(norm, batch_format="pyarrow")
            .repartition(16)
            .materialize()
        )

    hub = nodes.map_batches(
        lambda t: t.append_column("hub", pa.array(np.full(len(t), scale, np.int64))),
        batch_format="pyarrow",
    ).materialize()
    auth = None
    for _ in range(iters):
        auth = _half(hub, "hub", src_column, dst_column, "auth")
        hub = _half(auth, "auth", dst_column, src_column, "hub")

    return bucketed_lookup_join(hub, auth, "node", "node", ["auth"])


def clustering_coefficients(
    edges_ds: "ray.data.Dataset",
    src_column: str = "src",
    dst_column: str = "dst",
    scale: int = 10**6,
) -> "ray.data.Dataset":
    """Local clustering coefficient per node (Watts & Strogatz 1998) over
    an undirected simple graph, in exact integer micro-units:

        coeff_micro(v) = (2 · tri(v) · scale) // (deg(v) · (deg(v) − 1))

    for deg(v) ≥ 2, else 0 — the floor-div quantization keeps the output
    parallelism-invariant and engine-exact against a SQL mirror (the
    pagerank_micro doctrine; both operands are nonnegative so floor ==
    truncation in every engine). Composition: :func:`triangle_counts`
    (wedge emission + closing-edge join — the Σ deg² intrinsic cost) +
    one degree groupby over the canonical edge list + one bucketed LEFT
    join (nodes with no triangle keep coeff 0, so every node of the
    graph appears in the output). Returns (node, deg, n_tri,
    coeff_micro), all int64 but the node key."""
    from ray.data.aggregate import Count

    from dedupe_ray.joins import bucketed_lookup_join

    edges = _canonical_edges(edges_ds, src_column, dst_column)

    deg = (
        edges.map_batches(
            lambda t: pa.table(
                {
                    "node": pa.concat_arrays(
                        [
                            t.column("u").combine_chunks(),
                            t.column("w").combine_chunks(),
                        ]
                    )
                }
            ),
            batch_format="pyarrow",
        )
        .groupby("node")
        .aggregate(Count(alias_name="deg"))
    )
    tri = triangle_counts(edges_ds, src_column, dst_column)

    def coeff(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        d = pc.cast(t.column("deg"), pa.int64()).to_numpy(zero_copy_only=False)
        n_tri = (
            pc.fill_null(pc.cast(t.column("n_tri"), pa.int64()), 0)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        denom = d * (d - 1)
        c = np.where(d >= 2, (2 * n_tri * scale) // np.maximum(denom, 1), 0)
        return pa.table(
            {
                "node": t.column("node"),
                "deg": pa.array(d),
                "n_tri": pa.array(n_tri),
                "coeff_micro": pa.array(c.astype(np.int64)),
            }
        )

    return bucketed_lookup_join(deg, tri, "node", "node", ["n_tri"], how="left").map_batches(
        coeff, batch_format="pyarrow"
    )


def modularity_stats(
    edges_ds: "ray.data.Dataset",
    labels_ds: "ray.data.Dataset",
    src_column: str = "src",
    dst_column: str = "dst",
    node_column: str = "node",
    label_column: str = "label",
) -> "ray.data.Dataset":
    """Newman modularity of a node partition over an undirected simple
    graph, as exact int64 per-community sufficient statistics (the
    num/den doctrine — no cross-engine float ever ships):

        Q = (1 / 4m²) · Σ_c (4m·e_c − d_c²)
          = Σ_c contrib_num / (4m²)

    with m = |E| (canonical edges), e_c = within-community edge count,
    d_c = community degree sum. Nodes missing from ``labels_ds`` form
    their own null-label community EXCLUDED from the output (SQL mirrors
    filter the label join's misses). Shape: two bucketed unique-key
    label joins onto the edge list (endpoints labelled independently),
    one within-edge groupby, one degree-sum groupby, one bounded LEFT
    join across the two per-community tables. Overflow: d_c² < int64 for
    community degree sums up to 3·10⁹. Output one row per community:
    (label, within_edges, degree_sum, m, contrib_num)."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Count, Sum

    from dedupe_ray.joins import bucketed_lookup_join

    edges = _canonical_edges(edges_ds, src_column, dst_column).materialize()
    m = edges.count()
    labels = labels_ds.select_columns([node_column, label_column])

    lab_u = bucketed_lookup_join(
        edges, labels, "u", node_column, [label_column]
    ).map_batches(
        lambda t: pa.table(
            {"u": t.column("u"), "w": t.column("w"), "lab_u": t.column(label_column)}
        ),
        batch_format="pyarrow",
    )
    lab_uw = bucketed_lookup_join(lab_u, labels, "w", node_column, [label_column])

    within = (
        lab_uw.map_batches(
            lambda t: t.filter(
                pc.equal(t.column("lab_u"), t.column(label_column))
            ).select(["lab_u"]),
            batch_format="pyarrow",
        )
        .groupby("lab_u")
        .aggregate(Count(alias_name="within_edges"))
    )

    deg = (
        edges.map_batches(
            lambda t: pa.table(
                {
                    node_column: pa.concat_arrays(
                        [
                            t.column("u").combine_chunks(),
                            t.column("w").combine_chunks(),
                        ]
                    )
                }
            ),
            batch_format="pyarrow",
        )
        .groupby(node_column)
        .count()
        .map_batches(
            lambda t: t.rename_columns([node_column, "deg"]), batch_format="pyarrow"
        )
    )
    deg_lab = bucketed_lookup_join(deg, labels, node_column, node_column, [label_column])
    deg_c = (
        deg_lab.map_batches(
            lambda t: pa.table({"lab_u": t.column(label_column), "deg": t.column("deg")}),
            batch_format="pyarrow",
        )
        .groupby("lab_u")
        .aggregate(Sum("deg", alias_name="degree_sum"))
    )

    def contrib(t: pa.Table) -> pa.Table:
        e_c = (
            pc.fill_null(pc.cast(t.column("within_edges"), pa.int64()), 0)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        d_c = pc.cast(t.column("degree_sum"), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        return pa.table(
            {
                "label": t.column("lab_u"),
                "within_edges": pa.array(e_c),
                "degree_sum": pa.array(d_c),
                "m": pa.array(np.full(len(t), m, np.int64)),
                "contrib_num": pa.array(4 * m * e_c - d_c * d_c),
            }
        )

    return bucketed_lookup_join(
        deg_c, within, "lab_u", "lab_u", ["within_edges"], how="left"
    ).map_batches(contrib, batch_format="pyarrow")


def deterministic_walks(
    edges_ds: "ray.data.Dataset",
    src_column: str = "src",
    dst_column: str = "dst",
    steps: int = 3,
) -> "ray.data.Dataset":
    """Hash-seeded random walks from EVERY node of an undirected simple
    graph — the corpus-generation step of DeepWalk/node2vec-class
    embeddings, made reproducible: at step s from node v the walk takes
    the neighbor with sorted-rank

        r = int(md5(v || ':' || s)[:8], 16) % deg(v)

    (md5 is the engine-portable hash — the hashed_features doctrine), so
    trajectories are bit-identical at any parallelism and replayable by
    a step-unrolled SQL mirror. One walk per start node, ``steps`` hops.

    Shape: adjacency ranks come from one bucketed per-node sort (rank =
    position among sorted neighbors); each hop is two bucketed
    unique-key joins (state → degree, then (node, rank) → neighbor) —
    walk state is one row per walk, never the graph. Output long form:
    (start, step, node), step 0 = the start itself."""
    import hashlib

    import pandas as pd
    import pyarrow.compute as pc
    from ray.data.aggregate import Count

    from dedupe_ray.blocking import N_BUCKETS
    from dedupe_ray.joins import bucketed_lookup_join
    from dedupe_ray.ops.tabular import _bucket_hash_col

    edges = _canonical_edges(edges_ds, src_column, dst_column)

    def adj(t: pa.Table) -> pa.Table:
        u = t.column("u").combine_chunks()
        w = t.column("w").combine_chunks()
        node = pa.concat_arrays([u, w])
        out = pa.table({"node": node, "nbr": pa.concat_arrays([w, u])})
        return out.append_column("__abkt", _bucket_hash_col(node, N_BUCKETS))

    def rank_per_node(group: pa.Table) -> pa.Table:
        if len(group) == 0:
            return pa.table(
                {"akey": pa.array([], pa.string()), "nbr": pa.array([], pa.string())}
            )
        g = group.take(
            pc.sort_indices(
                group, sort_keys=[("node", "ascending"), ("nbr", "ascending")]
            )
        )
        nodes = np.asarray(g.column("node").to_pylist(), object)
        new = np.empty(len(g), bool)
        new[0] = True
        new[1:] = nodes[1:] != nodes[:-1]
        starts = np.flatnonzero(new)
        pos = np.arange(len(g)) - np.repeat(
            starts, np.diff(np.append(starts, len(g)))
        )
        akey = np.char.add(
            np.char.add(nodes.astype(str), "\x1f"), pos.astype(str)
        )
        return pa.table(
            {
                "akey": pa.array(akey.tolist(), pa.string()),
                "nbr": g.column("nbr"),
            }
        )

    adj_ranks = (
        edges.map_batches(adj, batch_format="pyarrow")
        .groupby("__abkt")
        .map_groups(rank_per_node, batch_format="pyarrow")
        .materialize()
    )
    deg = (
        edges.map_batches(adj, batch_format="pyarrow")
        .map_batches(
            lambda t: t.select(["node"]), batch_format="pyarrow"
        )
        .groupby("node")
        .aggregate(Count(alias_name="deg"))
        .materialize()
    )

    state = deg.map_batches(
        lambda t: pa.table({"start": t.column("node"), "cur": t.column("node")}),
        batch_format="pyarrow",
    ).materialize()
    trail = [
        state.map_batches(
            lambda t: pa.table(
                {
                    "start": t.column("start"),
                    "step": pa.array(np.zeros(len(t), np.int64)),
                    "node": t.column("cur"),
                }
            ),
            batch_format="pyarrow",
        )
    ]
    for s in range(1, int(steps) + 1):
        with_deg = bucketed_lookup_join(state, deg, "cur", "node", ["deg"])

        def pick(t: pa.Table, step=s) -> pa.Table:
            cur = np.asarray(t.column("cur").to_pylist(), object)
            d = pc.cast(t.column("deg"), pa.int64()).to_numpy(zero_copy_only=False)
            codes, uniques = pd.factorize(cur)
            h = np.asarray(
                [
                    int(
                        hashlib.md5(f"{u}:{step}".encode("utf-8")).hexdigest()[:8],
                        16,
                    )
                    for u in uniques
                ],
                np.int64,
            )
            r = h[codes] % np.maximum(d, 1)
            akey = np.char.add(
                np.char.add(cur.astype(str), "\x1f"), r.astype(str)
            )
            return pa.table(
                {
                    "start": t.column("start"),
                    "akey": pa.array(akey.tolist(), pa.string()),
                }
            )

        state = (
            bucketed_lookup_join(
                with_deg.map_batches(pick, batch_format="pyarrow"),
                adj_ranks,
                "akey",
                "akey",
                ["nbr"],
            )
            .map_batches(
                lambda t: pa.table(
                    {"start": t.column("start"), "cur": t.column("nbr")}
                ),
                batch_format="pyarrow",
            )
            .materialize()
        )
        trail.append(
            state.map_batches(
                lambda t, step=s: pa.table(
                    {
                        "start": t.column("start"),
                        "step": pa.array(np.full(len(t), step, np.int64)),
                        "node": t.column("cur"),
                    }
                ),
                batch_format="pyarrow",
            )
        )
    out = trail[0]
    for t in trail[1:]:
        out = out.union(t)
    return out
