"""Exact-output checks for the deterministic queries that have no SQL
oracle (VERDICT r2 item #3): frozen value-hash snapshots at sf0.001.

Every op here is deterministic given its seeds (minhash/simhash hash
families, winnowing window, language profiles, the fake media decoder) and
parallelism-invariant (verified at num_cpus 4 and 8 before freezing). A
hash change therefore means the op's OUTPUT changed — if intentional
(e.g. new constants), regenerate with the recipe below; if not, it's a
regression.

Regenerate: run each query at /root/testdata/sf0.001, normalize exactly as
test_entry._normalize (sorted columns, floats rounded to 6, int64 casts,
rows sorted), then ``int(pd.util.hash_pandas_object(df, index=False).sum())``
(fixed-key siphash — machine-stable).
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import __ray_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"

# (row_count, value_hash) — frozen 2026-08-17 (round 3)
SNAPSHOTS = {
    "minhash_pairs": (28, 18086921363269322730),
    "simhash_pairs": (434, 7456101814729597156),
    # minhash_groups / fingerprints(_v2) / user_shuffle_skew gained full
    # SQL oracles in round 5 (recursive-CTE CC, FNV mulmod64 fold,
    # splitmix64 bucketing) and left the snapshot list
    # quality_langid became quality_langid_v2 in round 5 (exact-rational
    # score) and is now covered by a full SQL oracle instead
    "media_features": (696, 12115332766548111239),
    # embedding_near_dup became embedding_near_dup_v2 in round 5
    # (arithmetic planting + exact integer verify) — full SQL oracle now
    # HLL p=12 approximate distinct; at this scale the linear-counting
    # regime returns the exact per-type user counts (15 each)
    "approx_distinct_users": (5, 9732546478658035194),
    # full trained ER pipeline (training loop + partition): deterministic
    # end-to-end (content-keyed sampling/ordering); re-frozen after the
    # equal-length affine-gap symmetry fix (one borderline pair dropped),
    # verified identical at num_cpus 4 and 8
    # train_val_split became train_val_split_v2 in round 5 (crc32
    # assignment hash) and is now covered by a full SQL oracle instead
    # zlib level-6 ratios (this container's zlib; a zlib swap would
    # legitimately re-freeze), identical at num_cpus 4 and 8
    "compression_ratios": (500, 17283051347077179173),
    "er_clusters": (79, 8492769270338936534),
    # per-cluster canonical records (min-mean-affine-gap centroid per
    # field), identical at num_cpus 4 and 8
    "er_canonical": (19, 3585206592379217455),
    "er_cluster_summary": (19, 9362016833877420128),
    # semantic_dedup became semantic_dedup_v2 in round 5 (exact-integer
    # decision + recursive-CTE CC oracle) and left the snapshot list
    # perceptual dHash near-dup over synthesized PPM twins: exactly the
    # 250 planted pairs; identical at num_cpus 4 and 8 (frozen round 4)
    "image_near_dup": (250, 630617113193423766),
    # cdc_chunks_docs gained a closed-form SQL oracle in round 5
}


def _to_pandas(result):
    import ray.data

    if isinstance(result, ray.data.Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype(np.float64).round(6)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype(np.int64)
        elif df[c].dtype == object:
            df[c] = df[c].apply(
                lambda v: str(v) if isinstance(v, (list, np.ndarray, dict)) else v
            )
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name", sorted(SNAPSHOTS))
def test_query_snapshot(name, ray_session):
    df = _normalize(_to_pandas(entrymod.queries()[name](SF_DIR)))
    want_rows, want_hash = SNAPSHOTS[name]
    assert len(df) == want_rows, f"{name}: {len(df)} rows != frozen {want_rows}"
    got = int(pd.util.hash_pandas_object(df, index=False).sum())
    assert got == want_hash, f"{name}: value hash drifted from frozen snapshot"
