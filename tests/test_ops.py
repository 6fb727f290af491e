"""Operator-library tests: tabular parity ops, text analysis, dedup family,
embedding search, multimodal plumbing."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray
import ray.data as rd


# ---------------------------------------------------------------------------
# tabular
# ---------------------------------------------------------------------------


def test_column_mapped_union():
    from dedupe_ray.ops.tabular import column_mapped_union

    a = rd.from_arrow(pa.table({"Name": ["x", "y"], "City": ["k", "w"]}))
    b = rd.from_arrow(pa.table({"FullName": ["z"], "Extra": ["e"]}))
    out = column_mapped_union(a, b, {"FullName": "Name"}, ("f1", "f2")).to_pandas()
    assert list(out.columns) == ["Name", "City", "Extra", "source_file"]
    assert out[out.source_file == "f2"]["Name"].tolist() == ["z"]
    assert out[out.source_file == "f2"]["City"].tolist() == [""]  # fill missing
    assert out[out.source_file == "f1"]["Extra"].tolist() == ["", ""]


def test_drop_empty_rows():
    from dedupe_ray.ops.tabular import drop_empty_rows

    ds = rd.from_arrow(
        pa.table({"a": ["x", "", "  ", None], "b": ["", "y", "", None]})
    )
    out = drop_empty_rows(ds).to_pandas()
    assert len(out) == 2


def test_anti_join_export_and_attach():
    from dedupe_ray.ops.tabular import anti_join_export, attach_cluster_columns

    ds = rd.from_arrow(pa.table({"doc_id": ["a", "b", "c"], "v": ["1", "2", "3"]}))
    out = anti_join_export(ds, {"b"}).to_pandas()
    assert sorted(out["doc_id"]) == ["a", "c"]

    ref = ray.put({"a": ("c1", 0.9)})
    out2 = attach_cluster_columns(ds, ref).to_pandas().set_index("doc_id")
    assert out2.loc["a", "cluster_id"] == "c1"
    assert out2.loc["b", "cluster_id"] == ""


def test_semi_join_recover():
    from dedupe_ray.ops.tabular import semi_join_recover

    ds = rd.from_arrow(
        pa.table({"doc_id": ["a", "b"], "Name": ["acme", "zeta"], "City": ["k", "w"]})
    )
    # recovery ignores extra keys on the pair record (reference drops
    # confidence_score/source_file/record_id before comparing)
    recs = [{"Name": "acme", "City": "k", "confidence_score": "0.9"}]
    out = semi_join_recover(ds, recs, ["Name", "City"]).to_pandas()
    assert out["doc_id"].tolist() == ["a"]


def test_pair_diff():
    from dedupe_ray.ops.tabular import pair_diff

    d = pair_diff({"a": "1", "b": "2"}, {"a": "1", "b": "3"}, ["a", "b"])
    assert d == {"a": False, "b": True}


# ---------------------------------------------------------------------------
# text
# ---------------------------------------------------------------------------


def test_language_id():
    from dedupe_ray.ops.text import LanguageId

    ds = rd.from_arrow(
        pa.table(
            {
                "text": [
                    "the cat and the dog in the house",
                    "der Hund ist nicht mit der Katze",
                    "el perro y la casa en la calle",
                    "",
                ]
            }
        )
    )
    out = ds.map_batches(LanguageId, batch_format="pyarrow", concurrency=(1, 1)).to_pandas()
    assert out["lang_pred"].tolist() == ["en", "de", "es", "und"]


def test_quality_score_ranges():
    from dedupe_ray.ops.text import QualityScore

    ds = rd.from_arrow(
        pa.table({"text": ["a good long sentence with many proper words included here", "!!!", ""]})
    )
    out = ds.map_batches(QualityScore, batch_format="pyarrow", concurrency=(1, 1)).to_pandas()
    assert out["quality_score"].between(0, 1).all()
    assert out["quality_score"].iloc[0] > out["quality_score"].iloc[1]


def test_token_count_modes():
    from dedupe_ray.ops.text import token_count_batch

    t = pa.table({"text": ["one two three", "hello, world!"]})
    ws = token_count_batch(t, "whitespace")
    assert ws.column("n_tokens").to_pylist() == [3, 2]
    bp = token_count_batch(t, "bpe_ish")
    assert bp.column("n_tokens").to_pylist()[0] == 3
    assert bp.column("n_tokens").to_pylist()[1] >= 4  # punctuation splits


def test_fingerprint_whitespace_insensitive():
    from dedupe_ray.ops.text import fingerprint_batch

    t = pa.table({"text": ["Hello World Example", "hello   world example", "different text"]})
    out = fingerprint_batch(t).column("fingerprint").to_pylist()
    assert out[0] == out[1]
    assert out[0] != out[2]


# ---------------------------------------------------------------------------
# dedup family
# ---------------------------------------------------------------------------


def _text_ds(texts):
    return rd.from_arrow(
        pa.table({"doc_id": [f"d{i}" for i in range(len(texts))], "text": texts})
    )


def test_exact_dedup_keeps_min_id():
    from dedupe_ray.ops.dedup import exact_dedup

    ds = _text_ds(["same", "same", "unique"])
    out = exact_dedup(ds).to_pandas()
    assert sorted(out["doc_id"]) == ["d0", "d2"]


def test_minhash_finds_near_dups():
    from dedupe_ray.ops.dedup import minhash_lsh_pairs

    base = "the quick brown fox jumps over the lazy dog again and again in the field"
    near = base.replace("lazy", "sleepy")
    texts = [base, near, "completely different content about ray data pipelines and arrow"]
    out = minhash_lsh_pairs(_text_ds(texts), jaccard_threshold=0.5, num_perm=64, bands=16).to_pandas()
    pairs = set(zip(out["id_a"], out["id_b"]))
    assert ("d0", "d1") in pairs
    assert all(p == ("d0", "d1") for p in pairs)


def test_simhash_near_dups():
    from dedupe_ray.ops.dedup import simhash_pairs

    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    near = base + " extra"
    texts = [base, near, "unrelated words entirely about databases and query planners"]
    out = simhash_pairs(_text_ds(texts), max_hamming=10).to_pandas()
    pairs = set(zip(out["id_a"], out["id_b"]))
    assert ("d0", "d1") in pairs


def test_dedup_module_has_no_driver_materialization():
    """Scale seam: the near-dup family must never materialize an unbounded
    dataset on the driver — signatures/texts travel through the shuffle or a
    hash join, not .to_pandas()/.take_all()."""
    import inspect

    import dedupe_ray.ops.dedup as m

    src = inspect.getsource(m)
    # .to_pandas() is allowed only on a BOUNDED per-bucket group or a pull
    # explicitly annotated '# bounded:' with a size guard (bloom candidate
    # sets); a full-dataset driver pull (ds/sigs/texts.to_pandas,
    # take_all) is the forbidden pattern.
    for line in src.splitlines():
        if ".to_pandas()" in line or "take_all" in line:
            assert "group" in line or "# bounded:" in line, (
                f"driver-side materialization: {line.strip()}"
            )


def test_simhash_pigeonhole_contract():
    from dedupe_ray.ops.dedup import simhash_pairs

    with pytest.raises(ValueError):
        simhash_pairs(_text_ds(["a"]), max_hamming=6, n_tables=4)


def test_minhash_oversized_side_channel():
    from dedupe_ray.ops.dedup import minhash_lsh_pairs

    texts = ["identical text here now"] * 5 + ["something else entirely different words"]
    pairs, oversized = minhash_lsh_pairs(
        _text_ds(texts), jaccard_threshold=0.5, max_bucket=3, return_oversized=True
    )
    assert oversized.count() > 0  # 5 identical docs exceed the bucket cap


def test_ngram_jaccard_verify():
    from dedupe_ray.ops.dedup import ngram_jaccard_pairs

    ds = _text_ds(["a b c d e f", "a b c d e g", "x y z w q r"])
    cands = rd.from_arrow(
        pa.table({"id_a": ["d0", "d0"], "id_b": ["d1", "d2"]})
    )
    out = ngram_jaccard_pairs(ds, cands, n=2, threshold=0.3).to_pandas()
    assert out["id_b"].tolist() == ["d1"]


def test_ngram_jaccard_empty_texts_not_perfect_match():
    # Two empty/non-tokenizable texts have no n-grams: Jaccard is 0, not
    # 1.0 (SQL's 0/0 = NULL drops such pairs — semantics must agree).
    from dedupe_ray.ops.dedup import ngram_jaccard_pairs

    ds = _text_ds(["", "   ", "a b c"])
    cands = rd.from_arrow(pa.table({"id_a": ["d0", "d0"], "id_b": ["d1", "d2"]}))
    out = ngram_jaccard_pairs(ds, cands, n=2, threshold=0.1).to_pandas()
    assert out.empty


# ---------------------------------------------------------------------------
# embeddings
# ---------------------------------------------------------------------------


def _emb_ds(n=50, dim=8, seed=0):
    rng = np.random.RandomState(seed)
    m = rng.randn(n, dim).astype(np.float32)
    return rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(np.arange(n, dtype=np.int64)),
                "embedding": pa.FixedSizeListArray.from_arrays(
                    pa.array(m.reshape(-1)), dim
                ).cast(pa.list_(pa.float32())),
            }
        )
    ), m


def test_brute_force_topk_exact():
    from dedupe_ray.ops.embedding import brute_force_topk

    ds, m = _emb_ds()
    q = m[:2]
    out = brute_force_topk(ds, q, k=5).to_pandas()
    # rank-0 hit for each query is the query vector itself (cosine 1)
    top0 = out[out["rank"] == 0].sort_values("query_id")
    assert top0["vec_id"].tolist() == [0, 1]
    # verify against numpy directly
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    want = np.argsort(-(mn @ mn[0]))[:5]
    got = out[out["query_id"] == 0].sort_values("rank")["vec_id"].tolist()
    assert got == want.tolist()


def test_ivf_topk_recovers_self():
    from dedupe_ray.ops.embedding import ivf_topk

    ds, m = _emb_ds(100, 8)
    out = ivf_topk(ds, m[:3], k=3, n_centroids=4, nprobe=2).to_pandas()
    top0 = out[out["rank"] == 0].sort_values("query_id")
    assert top0["vec_id"].tolist() == [0, 1, 2]


def test_embedding_near_dup_pairs_planted():
    from dedupe_ray.ops.embedding import embedding_near_dup_pairs

    rng = np.random.RandomState(1)
    m = rng.randn(30, 8).astype(np.float32)
    m[15] = m[0] + 0.001  # planted near-dup
    ds = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(np.arange(30, dtype=np.int64)),
                "embedding": pa.FixedSizeListArray.from_arrays(pa.array(m.reshape(-1)), 8).cast(
                    pa.list_(pa.float32())
                ),
            }
        )
    )
    out = embedding_near_dup_pairs(ds, cosine_threshold=0.99, n_centroids=2).to_pandas()
    assert (0, 15) in set(zip(out["id_a"], out["id_b"]))


# ---------------------------------------------------------------------------
# multimodal plumbing
# ---------------------------------------------------------------------------


def test_media_pipeline_fake_decode(small_corpus):
    from dedupe_ray.ops.multimodal import media_feature_pipeline

    docs, _ = small_corpus
    ds = rd.from_arrow(docs)
    out = media_feature_pipeline(ds, fake_decode=True).to_pandas()
    assert set(["doc_id", "kind", "media_ref", "width", "height", "features"]) <= set(out.columns)
    assert (out["kind"] == "image").all()
    assert out["width"].between(64, 1024).all()
    # deterministic: same media_ref → same features
    f = out.groupby("media_ref")["width"].nunique()
    assert (f == 1).all()


def test_media_decode_stub_raises():
    from dedupe_ray.ops.multimodal import DecodeImage

    with pytest.raises(NotImplementedError):
        DecodeImage(fake=False)._decode_one("media://x")


def test_ivf_build_search_partition_pruned(tmp_path, ray_session):
    """ivf_build writes a bucket-partitioned layout (one dir per bucket);
    ivf_search with full probe equals brute force; partial probe recovers
    self matches while reading fewer partitions."""
    import os

    from dedupe_ray.ops.embedding import brute_force_topk, ivf_build, ivf_search

    ds, m = _emb_ds(120, 8, seed=3)
    path = str(tmp_path / "ivf_idx")
    ivf_build(ds, path, n_centroids=4)
    parts = [d for d in os.listdir(path) if d.startswith("bucket=")]
    assert len(parts) >= 2  # real on-disk partitioning

    full = ivf_search(path, m[:3], k=5, nprobe=4).to_pandas()
    bf = brute_force_topk(ds, m[:3], k=5).to_pandas()
    assert full[["query_id", "vec_id", "rank"]].values.tolist() == bf[["query_id", "vec_id", "rank"]].values.tolist()

    part = ivf_search(path, m[:3], k=5, nprobe=1).to_pandas()
    top0 = part[part["rank"] == 0].sort_values("query_id")
    assert top0["vec_id"].astype(int).tolist() == [0, 1, 2]


def test_sessionize_gaps_and_islands(ray_session):
    from datetime import datetime

    from dedupe_ray.ops.tabular import sessionize

    ts = [
        datetime(2025, 1, 1, 10, 0), datetime(2025, 1, 1, 10, 10),   # u1 s0
        datetime(2025, 1, 1, 11, 0),                                  # u1 s1 (50min gap)
        datetime(2025, 1, 1, 10, 5),                                  # u2 s0
    ]
    ds = rd.from_arrow(
        pa.table({"event_id": [1, 2, 3, 4], "user_id": ["u1", "u1", "u1", "u2"],
                  "ts": pa.array(ts, pa.timestamp("us"))})
    )
    out = sessionize(ds, gap_seconds=1800).to_pandas().set_index("event_id")
    assert out.loc[1, "session_id"] == out.loc[2, "session_id"] == "u1#0"
    assert out.loc[3, "session_id"] == "u1#1"
    assert out.loc[4, "session_id"] == "u2#0"


def test_media_resize_and_frame_sample(small_corpus, ray_session):
    from dedupe_ray.ops.multimodal import FrameSample, ResizeImage, media_feature_pipeline

    docs, _ = small_corpus
    ds = rd.from_arrow(docs.slice(0, 200))
    feats = media_feature_pipeline(ds, fake_decode=True)
    resized = feats.map_batches(
        ResizeImage, fn_constructor_args=(256, True), batch_format="pyarrow", concurrency=(1, 2)
    ).to_pandas()
    assert (resized["resized_w"] <= 256).all() and (resized["resized_h"] <= 256).all()
    # aspect preserved within rounding
    ratio = resized["width"] / resized["height"]
    ratio2 = resized["resized_w"] / resized["resized_h"]
    assert (abs(ratio - ratio2) / ratio < 0.05).all()

    frames = feats.map_batches(
        FrameSample, fn_constructor_args=(3,), batch_format="pyarrow", concurrency=(1, 2)
    ).to_pandas()
    assert len(frames) == 3 * feats.count()
    # deterministic timestamps per ref
    per_ref = frames.groupby("media_ref")["frame_ts"].apply(lambda s: tuple(sorted(set(s))))
    assert per_ref.map(len).eq(3).all()


def test_sliding_window_count_matches_naive(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from dedupe_ray.ops.tabular import sliding_window_count

    rng = np.random.default_rng(5)
    base = pd.Timestamp("2024-01-01")
    df = pd.DataFrame(
        {
            "event_id": np.arange(300),
            "user_id": rng.integers(0, 9, 300),
            "ts": base + pd.to_timedelta(rng.integers(0, 3_000, 300), unit="s"),
        }
    )
    got = (
        sliding_window_count(rd.from_pandas(df), "user_id", "ts", window_seconds=120, n_buckets=8)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    naive = [
        int(
            (
                (df.user_id == r.user_id)
                & (df.ts >= r.ts - pd.Timedelta(seconds=120))
                & (df.ts <= r.ts)
            ).sum()
        )
        for r in df.itertuples()
    ]
    assert got["window_count"].tolist() == naive
    assert (got["window_count"] >= 1).all()  # self always counted


def test_grouped_top_k_matches_pandas(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from dedupe_ray.ops.tabular import grouped_top_k

    rng = np.random.default_rng(9)
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 20, 500),
            "v": rng.integers(0, 40, 500).astype(float),  # many ties
            "id": np.arange(500),
        }
    )
    got = (
        grouped_top_k(rd.from_pandas(df), "k", "v", 3, descending=True,
                      tiebreak_column="id", n_buckets=8)
        .to_pandas()
        .sort_values(["k", "id"])
        .reset_index(drop=True)
    )
    want = (
        df.sort_values(["v", "id"], ascending=[False, True])
        .groupby("k")
        .head(3)
        .sort_values(["k", "id"])
        .reset_index(drop=True)[got.columns]
    )
    pd.testing.assert_frame_equal(got, want)


def test_grouped_top_k_string_order_dense_ranks(ray_session):
    import pandas as pd
    import ray.data as rd

    from dedupe_ray.ops.tabular import grouped_top_k

    # equal string order values must fall through to the tiebreak column
    df = pd.DataFrame(
        {"k": ["a"] * 4, "v": ["mid", "top", "mid", "low"], "id": [3, 0, 1, 2]}
    )
    got = (
        grouped_top_k(rd.from_pandas(df), "k", "v", 2, descending=True,
                      tiebreak_column="id", n_buckets=2)
        .to_pandas()
        .sort_values("id")
    )
    assert got["v"].tolist() == ["top", "mid"]
    assert got["id"].tolist() == [0, 1]  # the lower id among the two 'mid's


def test_grouped_quantile_disc_matches_duckdb(ray_session):
    import duckdb
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from dedupe_ray.ops.tabular import grouped_quantile_disc

    rng = np.random.default_rng(13)
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 15, 400),
            "v": np.round(rng.normal(100, 20, 400), 2),
        }
    )
    got = (
        grouped_quantile_disc(rd.from_pandas(df), "k", "v", 0.5, "med", n_buckets=8)
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    want = (
        duckdb.connect()
        .execute("SELECT k, quantile_disc(v, 0.5) AS med FROM df GROUP BY k ORDER BY k")
        .df()
    )
    pd.testing.assert_frame_equal(got.astype({"k": np.int64}), want.astype({"k": np.int64}))


def _ppm_bytes(w, h, pixel_fn):
    import numpy as np

    img = np.zeros((h, w, 3), np.uint8)
    for y in range(h):
        for x in range(w):
            img[y, x] = pixel_fn(x, y)
    return b"P6\n# test comment\n%d %d\n255\n" % (w, h) + img.tobytes(), img


def _bmp_bytes(img):
    """24-bit BI_RGB bottom-up BMP from an RGB uint8 array."""
    import numpy as np

    h, w = img.shape[:2]
    stride = ((w * 3 + 3) // 4) * 4
    rows = np.zeros((h, stride), np.uint8)
    rows[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
    raster = rows.tobytes()
    off = 14 + 40
    header = (
        b"BM"
        + (off + len(raster)).to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + off.to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")
        + len(raster).to_bytes(4, "little")
        + b"\x00" * 16
    )
    return header + raster


def test_decode_ppm_bmp_real():
    import numpy as np

    from dedupe_ray.ops.multimodal import decode_bmp, decode_ppm, resize_nearest

    payload, img = _ppm_bytes(5, 3, lambda x, y: (x * 40, y * 80, 7))
    got = decode_ppm(payload)
    np.testing.assert_array_equal(got, img)

    bmp = _bmp_bytes(img)
    np.testing.assert_array_equal(decode_bmp(bmp), img)

    # grayscale PGM
    g = b"P5\n4 2\n255\n" + bytes(range(8))
    np.testing.assert_array_equal(
        decode_ppm(g), np.arange(8, dtype=np.uint8).reshape(2, 4)
    )

    big = np.arange(40 * 20 * 3, dtype=np.uint8).reshape(20, 40, 3)
    small = resize_nearest(big, 10)
    assert small.shape == (5, 10, 3)
    assert resize_nearest(small, 10).shape == small.shape  # within bounds → no-op
    # nearest-neighbor picks actual source pixels
    assert all(v in big.reshape(-1, 3).tolist() for v in small.reshape(-1, 3).tolist()[:5])


def _png_bytes(img, ctype, filters, palette=None, depth=8, interlace=0):
    """Hand-built PNG encoder (test-side only): applies the given per-row
    filter types (spec §9) so the decoder's unfilter paths are all hit;
    supports 16-bit samples (big-endian byte expansion, filters over
    BYTES) and Adam7 interlacing (each pass filtered independently)."""
    import struct
    import zlib as _z

    import numpy as np

    def chunk(tag, body):
        c = struct.pack(">I", len(body)) + tag + body
        return c + struct.pack(">I", _z.crc32(tag + body))

    h, w = img.shape[:2]
    ch = 1 if img.ndim == 2 else img.shape[2]
    arr = img.reshape(h, w, ch)
    bpp = ch * (2 if depth == 16 else 1)

    def encode_sub(sub):
        hp, wp = sub.shape[:2]
        flat = sub.reshape(hp, wp * ch).astype(np.int64)
        if depth == 16:
            by = np.empty((hp, wp * ch * 2), np.int64)
            by[:, 0::2] = flat >> 8
            by[:, 1::2] = flat & 255
        else:
            by = flat
        raw = bytearray()
        prev = np.zeros(by.shape[1], np.int64)
        for y in range(hp):
            f = filters[y % len(filters)]
            rec = by[y]
            if f == 0:
                filt = rec
            elif f == 1:
                left = np.concatenate([np.zeros(bpp, np.int64), rec[:-bpp]])
                filt = (rec - left) % 256
            elif f == 2:
                filt = (rec - prev) % 256
            elif f == 3:
                left = np.concatenate([np.zeros(bpp, np.int64), rec[:-bpp]])
                filt = (rec - (left + prev) // 2) % 256
            elif f == 4:
                left = np.concatenate([np.zeros(bpp, np.int64), rec[:-bpp]])
                upleft = np.concatenate([np.zeros(bpp, np.int64), prev[:-bpp]])
                p = left + prev - upleft
                pa_, pb, pc_ = np.abs(p - left), np.abs(p - prev), np.abs(p - upleft)
                pred = np.where(
                    (pa_ <= pb) & (pa_ <= pc_), left, np.where(pb <= pc_, prev, upleft)
                )
                filt = (rec - pred) % 256
            raw += bytes([f]) + bytes(filt.astype(np.uint8))
            prev = rec
        return raw

    if interlace == 0:
        raw = encode_sub(arr)
    else:
        raw = bytearray()
        for x0, y0, xs, ys in (
            (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
            (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
        ):
            sub = arr[y0::ys, x0::xs]
            if sub.shape[0] and sub.shape[1]:
                raw += encode_sub(sub)
    ihdr = struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, interlace)
    out = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
    if palette is not None:
        out += chunk(b"PLTE", bytes(palette.astype(np.uint8).reshape(-1)))
    out += chunk(b"IDAT", _z.compress(bytes(raw))) + chunk(b"IEND", b"")
    return out


def test_decode_png_all_filters_and_color_types():
    import numpy as np

    from dedupe_ray.ops.multimodal import decode_png

    rng = np.random.RandomState(11)
    # RGB, every filter type exercised
    img = rng.randint(0, 256, (10, 7, 3), dtype=np.uint8)
    for filters in ([0], [1], [2], [3], [4], [0, 1, 2, 3, 4]):
        np.testing.assert_array_equal(
            decode_png(_png_bytes(img, 2, filters)), img, err_msg=str(filters)
        )
    # grayscale
    g = rng.randint(0, 256, (5, 9), dtype=np.uint8)
    np.testing.assert_array_equal(decode_png(_png_bytes(g, 0, [0, 1, 2, 3, 4])), g)
    # RGBA
    a = rng.randint(0, 256, (4, 4, 4), dtype=np.uint8)
    np.testing.assert_array_equal(decode_png(_png_bytes(a, 6, [4, 3, 2, 1])), a)
    # palette
    pal = rng.randint(0, 256, (16, 3), dtype=np.uint8)
    idx = rng.randint(0, 16, (6, 5), dtype=np.uint8)
    np.testing.assert_array_equal(
        decode_png(_png_bytes(idx, 3, [0, 1], palette=pal)), pal[idx]
    )
    # guards
    import pytest

    with pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"BMnope")


def test_decode_mixed_codec_quarantine(ray_session):
    """A corpus mixing decodable, corrupt and unsupported payloads flows
    END TO END with on_error='quarantine': good rows decode normally, bad
    rows surface null features + a typed decode_error audit value instead
    of aborting the stage (VERDICT r4 item 5)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from dedupe_ray.ops.multimodal import DecodeAudio, DecodeImage, pcm16_wav_bytes

    payload, img = _ppm_bytes(6, 4, lambda x, y: (200, x * 30, y * 50))
    corrupt_ppm = payload[:8]  # header torn mid-token
    unknown = b"\x00\x01NOTANIMAGE" * 4
    tbl = pa.table(
        {
            "media_ref": ["good", "corrupt", "unknown"],
            "payload": pa.array([payload, corrupt_ppm, unknown], pa.binary()),
        }
    )
    # consume as Arrow rows (write_parquet/iter_batches path — Ray's
    # pandas tensor-extension cast rejects null fixed-size lists)
    rows = {
        r["media_ref"]: r
        for r in rd.from_arrow(tbl)
        .map_batches(
            DecodeImage,
            fn_constructor_kwargs={"fake": False, "on_error": "quarantine"},
            concurrency=1,
            batch_format="pyarrow",
        )
        .take_all()
    }
    assert rows["good"]["width"] == 6 and rows["good"]["decode_error"] is None
    assert np.asarray(rows["good"]["features"]).shape == (8,)
    assert rows["unknown"]["decode_error"].startswith("unsupported:")
    assert rows["unknown"]["features"] is None
    # the torn header dies inside the tokenizer (unpacking/int errors are
    # implementation detail) — any quarantined kind is acceptable for it,
    # but it must NOT abort the stage
    assert rows["corrupt"]["decode_error"] is not None

    wav = pcm16_wav_bytes(np.sin(np.linspace(0, 20, 800, dtype=np.float64)), 8000)
    atbl = pa.table(
        {
            "media_ref": ["wav", "mp3ish"],
            "payload": pa.array([wav, b"ID3\x03not-really-mp3"], pa.binary()),
        }
    )
    arows = {
        r["media_ref"]: r
        for r in rd.from_arrow(atbl)
        .map_batches(
            DecodeAudio,
            fn_constructor_kwargs={"fake": False, "on_error": "quarantine"},
            concurrency=1,
            batch_format="pyarrow",
        )
        .take_all()
    }
    assert arows["wav"]["sample_rate"] == 8000
    assert arows["wav"]["decode_error"] is None
    assert arows["mp3ish"]["decode_error"].startswith("unsupported:")
    assert arows["mp3ish"]["duration_sec"] is None


def test_decode_image_stage_png_payload(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from dedupe_ray.ops.multimodal import DecodeImage

    # same pixels as PPM vs PNG must give identical width/height/features
    payload, img = _ppm_bytes(6, 4, lambda x, y: (200, x * 30, y * 50))
    png = _png_bytes(img, 2, [0, 1, 2, 3, 4])
    rgba = np.dstack([img, np.full(img.shape[:2], 255, np.uint8)])
    tbl = pa.table(
        {
            "media_ref": ["ppm", "png", "png_rgba"],
            "payload": pa.array([payload, png, _png_bytes(rgba, 6, [4])], pa.binary()),
        }
    )
    out = (
        rd.from_arrow(tbl)
        .map_batches(DecodeImage, fn_constructor_kwargs={"fake": False},
                     concurrency=1, batch_format="pyarrow")
        .to_pandas()
        .set_index("media_ref")
    )
    assert out.loc["png", "width"] == 6 and out.loc["png", "height"] == 4
    for other in ("png", "png_rgba"):  # alpha dropped → same features
        np.testing.assert_allclose(
            np.asarray(out.loc["ppm", "features"]),
            np.asarray(out.loc[other, "features"]),
        )


def _jpeg_bytes(img, sampling=(1, 1), quant=1, restart=0):
    """Hand-built baseline JPEG encoder (test-side only): BT.601 RGB→YCbCr,
    box-filter chroma downsampling per ``sampling`` (Y factors; chroma is
    1×1), FDCT + flat ``quant`` tables, canonical Huffman tables built from
    the symbols actually emitted (all codes length 12), optional restart
    markers every ``restart`` MCUs — exercising every decoder path."""
    import struct

    import numpy as np

    from dedupe_ray.ops.multimodal import _DCT_BASIS, _JPEG_ZIGZAG

    gray = img.ndim == 2
    h, w = img.shape[:2]
    if gray:
        planes = [img.astype(np.float64)]
        samp = [(1, 1)]
    else:
        rgb = img.astype(np.float64)
        r, g, b = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        planes = [y, cb, cr]
        samp = [sampling, (1, 1), (1, 1)]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcus_x, mcus_y = -(-w // (8 * hmax)), -(-h // (8 * vmax))

    def prep(plane, sh, sv):
        # box-downsample by integer factors, pad (edge) to the MCU grid
        fy, fx = vmax // sv, hmax // sh
        ph, pw = -(-plane.shape[0] // fy) * fy, -(-plane.shape[1] // fx) * fx
        plane = np.pad(plane, ((0, ph - plane.shape[0]), (0, pw - plane.shape[1])), "edge")
        if fy > 1 or fx > 1:
            plane = plane.reshape(ph // fy, fy, pw // fx, fx).mean(axis=(1, 3))
        th, tw = mcus_y * sv * 8, mcus_x * sh * 8
        return np.pad(
            plane,
            ((0, th - plane.shape[0]), (0, tw - plane.shape[1])),
            "edge",
        )

    prepped = [prep(p, sh, sv) for p, (sh, sv) in zip(planes, samp)]
    A, zz = _DCT_BASIS, _JPEG_ZIGZAG

    def encode_block(plane, y0, x0, pred):
        block = plane[y0 : y0 + 8, x0 : x0 + 8] - 128.0
        coef = np.round((A @ block @ A.T).reshape(64)[zz] / quant).astype(np.int64)
        syms = []  # (dc?, huff_symbol, extra_value, extra_nbits)
        diff = int(coef[0]) - pred
        size = int(diff).bit_length() if diff else 0
        extra = diff if diff >= 0 else diff + (1 << size) - 1
        syms.append((0, size, extra, size))
        k, run = 1, 0
        while k < 64:
            v = int(coef[k])
            if v == 0:
                run += 1
            else:
                while run > 15:
                    syms.append((1, 0xF0, 0, 0))
                    run -= 16
                s = abs(v).bit_length()
                extra = v if v >= 0 else v + (1 << s) - 1
                syms.append((1, (run << 4) | s, extra, s))
                run = 0
            k += 1
        if run:
            syms.append((1, 0x00, 0, 0))  # EOB
        return int(coef[0]), syms

    # pass 1: collect symbols per (class, table_id); table 0 = Y, 1 = chroma
    ncomp = len(planes)
    table_of = [0] + [1] * (ncomp - 1)
    used = {}  # (tc, th) -> set of symbols
    mcu_syms = []  # per MCU: list of symbol tuples tagged with (tc, th)
    preds = [0] * ncomp
    ri = restart or mcus_x * mcus_y
    for mi in range(mcus_x * mcus_y):
        if restart and mi and mi % restart == 0:
            preds = [0] * ncomp
        my, mx = divmod(mi, mcus_x)
        cur = []
        for ci in range(ncomp):
            sh, sv = samp[ci]
            for by in range(sv):
                for bx in range(sh):
                    preds[ci], syms = encode_block(
                        prepped[ci], (my * sv + by) * 8, (mx * sh + bx) * 8, preds[ci]
                    )
                    for tc, sym, extra, nbits in syms:
                        used.setdefault((tc, table_of[ci]), set()).add(sym)
                        cur.append(((tc, table_of[ci]), sym, extra, nbits))
        mcu_syms.append(cur)
    # canonical tables: every used symbol gets a length-12 code
    codes, dht = {}, b""
    for key in sorted(used):
        vals = sorted(used[key])
        assert len(vals) < (1 << 12)
        for i, sym in enumerate(vals):
            codes[(key, sym)] = (12, i)
        bits = [0] * 16
        bits[11] = len(vals)
        dht += bytes([(key[0] << 4) | key[1]]) + bytes(bits) + bytes(vals)

    out = bytearray(b"\xff\xd8")

    def seg(marker, body):
        out.extend(bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body)

    qz = np.full(64, quant, np.uint8)
    seg(0xDB, b"\x00" + bytes(qz))
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        sof += bytes([ci + 1, (samp[ci][0] << 4) | samp[ci][1], 0])
    seg(0xC0, sof)
    seg(0xC4, dht)
    if restart:
        seg(0xDD, struct.pack(">H", restart))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, (table_of[ci] << 4) | table_of[ci]])
    sos += b"\x00\x3f\x00"
    seg(0xDA, sos)
    # entropy-coded data with byte stuffing + restart markers
    acc, nbits = 0, 0
    scan = bytearray()

    def put(value, n):
        nonlocal acc, nbits
        acc = (acc << n) | (value & ((1 << n) - 1))
        nbits += n
        while nbits >= 8:
            nbits -= 8
            byte = (acc >> nbits) & 0xFF
            scan.append(byte)
            if byte == 0xFF:
                scan.append(0x00)
        acc &= (1 << nbits) - 1

    def flush():
        nonlocal acc, nbits
        if nbits:
            put(0xFF, 8 - nbits)  # pad with 1-bits to the byte boundary

    for mi, cur in enumerate(mcu_syms):
        if restart and mi and mi % restart == 0:
            flush()
            scan += bytes([0xFF, 0xD0 + ((mi // restart - 1) % 8)])
        for key, sym, extra, xbits in cur:
            clen, code = codes[(key, sym)]
            put(code, clen)
            if xbits:
                put(extra, xbits)
    flush()
    out.extend(scan)
    out.extend(b"\xff\xd9")
    return bytes(out)


def _jpeg_progressive_bytes(img, sampling=(1, 1), quant=1, restart=0,
                            dc_al=1, ac_al=2, split=5):
    """Hand-built PROGRESSIVE JPEG encoder (test-side only): same color /
    sampling / FDCT / flat-quant front end as ``_jpeg_bytes``, then a
    libjpeg-style scan script — interleaved DC first at Al=dc_al, per-
    component spectral-selection AC first scans (1..split, split+1..63)
    at Al=ac_al, AC refinement passes down to 0 (EOB-run coding +
    buffered correction bits per T.81 §G.1.2.3), and a final DC
    refinement. Huffman tables are rebuilt and re-emitted before every
    scan (all codes length 12), exercising table redefinition."""
    import struct

    import numpy as np

    from dedupe_ray.ops.multimodal import _DCT_BASIS, _JPEG_ZIGZAG

    gray = img.ndim == 2
    h, w = img.shape[:2]
    if gray:
        planes = [img.astype(np.float64)]
        samp = [(1, 1)]
    else:
        rgb = img.astype(np.float64)
        r, g, b = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        planes = [y, cb, cr]
        samp = [sampling, (1, 1), (1, 1)]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcus_x, mcus_y = -(-w // (8 * hmax)), -(-h // (8 * vmax))
    A, zz = _DCT_BASIS, _JPEG_ZIGZAG

    def prep(plane, sh, sv):
        fy, fx = vmax // sv, hmax // sh
        ph, pw = -(-plane.shape[0] // fy) * fy, -(-plane.shape[1] // fx) * fx
        plane = np.pad(plane, ((0, ph - plane.shape[0]), (0, pw - plane.shape[1])), "edge")
        if fy > 1 or fx > 1:
            plane = plane.reshape(ph // fy, fy, pw // fx, fx).mean(axis=(1, 3))
        th, tw = mcus_y * sv * 8, mcus_x * sh * 8
        return np.pad(plane, ((0, th - plane.shape[0]), (0, tw - plane.shape[1])), "edge")

    ncomp = len(planes)
    coefs = []  # per comp: [bh, bw, 64] int (zigzag order)
    for ci in range(ncomp):
        sh, sv = samp[ci]
        p = prep(planes[ci], sh, sv)
        bh, bw = mcus_y * sv, mcus_x * sh
        arr = np.zeros((bh, bw, 64), np.int64)
        for by in range(bh):
            for bx in range(bw):
                blk = p[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
                arr[by, bx] = np.round((A @ blk @ A.T).reshape(64)[zz] / quant)
        coefs.append(arr)

    def comp_blocks(ci):
        sh, sv = samp[ci]
        cw = -(-(w * sh) // hmax)
        chh = -(-(h * sv) // vmax)
        return -(-chh // 8), -(-cw // 8)

    # ---- scan encoders: produce op lists [("h", sym) | ("b", v, n) | ("rst",)]
    def dc_first_scan(al):
        ops, used = [], set()
        preds = [0] * ncomp
        mi = 0
        for my in range(mcus_y):
            for mx in range(mcus_x):
                if restart and mi and mi % restart == 0:
                    ops.append(("rst",))
                    preds = [0] * ncomp
                for ci in range(ncomp):
                    sh, sv = samp[ci]
                    for by in range(sv):
                        for bx in range(sh):
                            v = int(coefs[ci][my * sv + by, mx * sh + bx, 0]) >> al
                            diff = v - preds[ci]
                            preds[ci] = v
                            size = abs(diff).bit_length()
                            extra = diff if diff >= 0 else diff + (1 << size) - 1
                            ops.append(("h", size))
                            used.add(size)
                            if size:
                                ops.append(("b", extra, size))
                mi += 1
        return ops, {(0, 0): used}

    def dc_refine_scan(al):
        ops = []
        mi = 0
        for my in range(mcus_y):
            for mx in range(mcus_x):
                if restart and mi and mi % restart == 0:
                    ops.append(("rst",))
                for ci in range(ncomp):
                    sh, sv = samp[ci]
                    for by in range(sv):
                        for bx in range(sh):
                            v = int(coefs[ci][my * sv + by, mx * sh + bx, 0])
                            ops.append(("b", (v >> al) & 1, 1))
                mi += 1
        return ops, {}

    def ac_first_scan(ci, ss, se, al):
        ops, used = [], set()
        eobrun = 0

        def flush_eob():
            nonlocal eobrun
            if eobrun > 0:
                nbits = eobrun.bit_length() - 1
                ops.append(("h", nbits << 4))
                used.add(nbits << 4)
                if nbits:
                    ops.append(("b", eobrun - (1 << nbits), nbits))
                eobrun = 0

        bh, bw = comp_blocks(ci)
        ui = 0
        for by in range(bh):
            for bx in range(bw):
                if restart and ui and ui % restart == 0:
                    flush_eob()
                    ops.append(("rst",))
                blk = coefs[ci][by, bx]
                run = 0
                wrote = False
                for k in range(ss, se + 1):
                    v = int(blk[k])
                    t = (v >> al) if v >= 0 else -((-v) >> al)
                    if t == 0:
                        run += 1
                        continue
                    flush_eob()
                    while run > 15:
                        ops.append(("h", 0xF0))
                        used.add(0xF0)
                        run -= 16
                    s = abs(t).bit_length()
                    extra = t if t >= 0 else t + (1 << s) - 1
                    ops.append(("h", (run << 4) | s))
                    used.add((run << 4) | s)
                    ops.append(("b", extra, s))
                    run = 0
                    wrote = True
                if run or not wrote:
                    eobrun += 1
                    if eobrun == 0x7FFF:
                        flush_eob()
                ui += 1
        flush_eob()
        return ops, {(1, 0): used}

    def ac_refine_scan(ci, ss, se, ah, al):
        ops, used = [], set()
        eobrun = 0
        pend = []  # correction bits owed to the next eobrun flush

        def flush_eob():
            nonlocal eobrun, pend
            if eobrun > 0:
                nbits = eobrun.bit_length() - 1
                ops.append(("h", nbits << 4))
                used.add(nbits << 4)
                if nbits:
                    ops.append(("b", eobrun - (1 << nbits), nbits))
                for bval in pend:
                    ops.append(("b", bval, 1))
                pend.clear()
                eobrun = 0

        bh, bw = comp_blocks(ci)
        ui = 0
        for by in range(bh):
            for bx in range(bw):
                if restart and ui and ui % restart == 0:
                    flush_eob()
                    for bval in pend:
                        ops.append(("b", bval, 1))
                    pend.clear()
                    ops.append(("rst",))
                blk = coefs[ci][by, bx]
                absv = [
                    (abs(int(blk[k])) >> al) for k in range(ss, se + 1)
                ]
                eob = 0  # index AFTER last newly-nonzero coefficient
                for i, t in enumerate(absv):
                    if t == 1:
                        eob = i + 1
                r = 0
                br = []  # correction bits buffered for the next symbol
                for i, t in enumerate(absv):
                    if t == 0:
                        r += 1
                        continue
                    while r > 15 and i < eob:
                        flush_eob()
                        ops.append(("h", 0xF0))
                        used.add(0xF0)
                        r -= 16
                        for bval in br:
                            ops.append(("b", bval, 1))
                        br = []
                    if t > 1:
                        br.append(t & 1)
                        continue
                    flush_eob()
                    ops.append(("h", (r << 4) | 1))
                    used.add((r << 4) | 1)
                    ops.append(("b", 0 if int(blk[ss + i]) < 0 else 1, 1))
                    for bval in br:
                        ops.append(("b", bval, 1))
                    br = []
                    r = 0
                if r > 0 or br:
                    eobrun += 1
                    pend.extend(br)
                    if eobrun == 0x7FFF or len(pend) > 900:
                        flush_eob()
                ui += 1
        flush_eob()
        return ops, {(1, 0): used}

    # ---- scan script
    scans = []  # (sel bytes, Ss, Se, Ah, Al, ops, used)
    all_sel = [(ci, 0, 0) for ci in range(ncomp)]
    ops, used = dc_first_scan(dc_al)
    scans.append((all_sel, 0, 0, 0, dc_al, ops, used))
    for ci in range(ncomp):
        ops, used = ac_first_scan(ci, 1, split, ac_al)
        scans.append(([(ci, 0, 0)], 1, split, 0, ac_al, ops, used))
        ops, used = ac_first_scan(ci, split + 1, 63, ac_al)
        scans.append(([(ci, 0, 0)], split + 1, 63, 0, ac_al, ops, used))
    for al in range(ac_al - 1, -1, -1):
        for ci in range(ncomp):
            ops, used = ac_refine_scan(ci, 1, 63, al + 1, al)
            scans.append(([(ci, 0, 0)], 1, 63, al + 1, al, ops, used))
    for al in range(dc_al - 1, -1, -1):
        ops, used = dc_refine_scan(al)
        scans.append((all_sel, 0, 0, al + 1, al, ops, used))

    # ---- serialize
    out = bytearray(b"\xff\xd8")

    def seg(marker, body):
        out.extend(bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body)

    seg(0xDB, b"\x00" + bytes(np.full(64, quant, np.uint8)))
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        sof += bytes([ci + 1, (samp[ci][0] << 4) | samp[ci][1], 0])
    seg(0xC2, sof)
    if restart:
        seg(0xDD, struct.pack(">H", restart))
    for sel, ss, se, ah, al, ops, used in scans:
        codes, dht = {}, b""
        for key in sorted(used):
            vals = sorted(used[key])
            assert len(vals) < (1 << 12)
            for i, sym in enumerate(vals):
                codes[(key, sym)] = (12, i)
            bits = [0] * 16
            bits[11] = len(vals)
            dht += bytes([(key[0] << 4) | key[1]]) + bytes(bits) + bytes(vals)
        if dht:
            seg(0xC4, dht)
        sos = bytes([len(sel)])
        for ci, dc_id, ac_id in sel:
            sos += bytes([ci + 1, (dc_id << 4) | ac_id])
        sos += bytes([ss, se, (ah << 4) | al])
        seg(0xDA, sos)
        acc, nbits = 0, 0
        scan_bytes = bytearray()
        rst_i = 0

        def put(value, n):
            nonlocal acc, nbits
            acc = (acc << n) | (value & ((1 << n) - 1))
            nbits += n
            while nbits >= 8:
                nbits -= 8
                byte = (acc >> nbits) & 0xFF
                scan_bytes.append(byte)
                if byte == 0xFF:
                    scan_bytes.append(0x00)
            acc &= (1 << nbits) - 1

        def flushbits():
            nonlocal nbits
            if nbits:
                put(0xFF, 8 - nbits)

        for op in ops:
            if op[0] == "rst":
                flushbits()
                scan_bytes += bytes([0xFF, 0xD0 + (rst_i % 8)])
                rst_i += 1
            elif op[0] == "h":
                key = (0, 0) if ss == 0 else (1, 0)
                clen, code = codes[(key, op[1])]
                put(code, clen)
            else:
                put(op[1], op[2])
        flushbits()
        out.extend(scan_bytes)
    out.extend(b"\xff\xd9")
    return bytes(out)


def test_decode_jpeg_roundtrip():
    import numpy as np
    import pytest

    from dedupe_ray.ops.multimodal import decode_jpeg

    rng = np.random.RandomState(7)
    # smooth RGB gradient: flat quant=1 tables → only DCT rounding error
    yy, xx = np.mgrid[0:24, 0:17]
    img = np.stack(
        [(yy * 5 + xx * 3) % 200 + 20, (xx * 7) % 180 + 30, (yy * 4) % 160 + 40],
        axis=2,
    ).astype(np.uint8)
    dec = decode_jpeg(_jpeg_bytes(img, sampling=(1, 1)))
    assert dec.shape == img.shape
    # 4:4:4 quant=1: error budget = DCT round-trip + colorspace rounding
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 4

    # grayscale exact-ish
    g = ((yy * 9 + xx * 2) % 230 + 10).astype(np.uint8)
    dg = decode_jpeg(_jpeg_bytes(g))
    assert dg.shape == g.shape
    assert np.abs(dg.astype(int) - g.astype(int)).max() <= 2

    # 4:2:0 subsampling on a chroma-flat image: Y survives, shape right
    flat = np.empty((21, 14, 3), np.uint8)
    flat[:, :, 0] = (yy[:21, :14] * 6) % 240
    flat[:, :, 1] = flat[:, :, 0]
    flat[:, :, 2] = flat[:, :, 0]  # gray content → chroma ≡ 128
    d420 = decode_jpeg(_jpeg_bytes(flat, sampling=(2, 2)))
    assert d420.shape == flat.shape
    assert np.abs(d420.astype(int) - flat.astype(int)).max() <= 4

    # 4:2:2 + restart markers + coarse quant: decodes, stays close
    noisy = rng.randint(0, 256, (18, 26, 3), dtype=np.uint8)
    d = decode_jpeg(_jpeg_bytes(noisy, sampling=(2, 1), quant=16, restart=1))
    assert d.shape == noisy.shape

    # quantization-error bound scales with quant table
    q8 = decode_jpeg(_jpeg_bytes(img, quant=8))
    assert np.abs(q8.astype(int) - img.astype(int)).mean() < 16

    # guards
    with pytest.raises(ValueError, match="not a JPEG"):
        decode_jpeg(b"\x89PNG....")
    with pytest.raises(ValueError, match="missing SOF"):
        decode_jpeg(b"\xff\xd8fakejpeg")


def test_decode_image_stage_jpeg_payload(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from dedupe_ray.ops.multimodal import DecodeImage

    # same pixels as PPM vs JPEG(quant=1): features must be ~identical
    payload, img = _ppm_bytes(16, 16, lambda x, y: (x * 12, y * 12, 128))
    jpg = _jpeg_bytes(img, sampling=(1, 1))
    tbl = pa.table(
        {
            "media_ref": ["ppm", "jpg"],
            "payload": pa.array([payload, jpg], pa.binary()),
        }
    )
    out = (
        rd.from_arrow(tbl)
        .map_batches(DecodeImage, fn_constructor_kwargs={"fake": False},
                     concurrency=1, batch_format="pyarrow")
        .to_pandas()
        .set_index("media_ref")
    )
    assert out.loc["jpg", "width"] == 16 and out.loc["jpg", "height"] == 16
    np.testing.assert_allclose(
        np.asarray(out.loc["ppm", "features"]),
        np.asarray(out.loc["jpg", "features"]),
        atol=0.02,
    )


def test_decode_image_stage_real_payloads(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from dedupe_ray.ops.multimodal import DecodeImage

    payload, img = _ppm_bytes(6, 4, lambda x, y: (200, x * 30, y * 50))
    bmp = _bmp_bytes(img)
    tbl = pa.table(
        {
            "media_ref": ["m1", "m2", "m3"],
            "payload": pa.array([payload, bmp, b"\xff\xd8fakejpeg"], pa.binary()),
        }
    )
    out = (
        rd.from_arrow(tbl)
        .map_batches(DecodeImage, fn_constructor_kwargs={"fake": True},
                     concurrency=1, batch_format="pyarrow")
        .to_pandas()
        .set_index("media_ref")
    )
    assert out.loc["m1", "width"] == 6 and out.loc["m1", "height"] == 4
    # PPM and BMP of the same pixels produce identical features
    np.testing.assert_allclose(
        np.asarray(out.loc["m1", "features"]), np.asarray(out.loc["m2", "features"])
    )
    # unrecognized payload fell back to the deterministic fake
    assert out.loc["m3", "width"] >= 64
    import pytest

    with pytest.raises(Exception):  # fake=False + compressed payload → stub raises
        rd.from_arrow(tbl).map_batches(
            DecodeImage, fn_constructor_kwargs={"fake": False},
            concurrency=1, batch_format="pyarrow",
        ).materialize()


def test_decode_wav_real(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from dedupe_ray.ops.multimodal import DecodeAudio, decode_wav

    rate = 8000
    t = np.arange(rate) / rate  # 1 second
    tone = (np.sin(2 * np.pi * 440 * t) * 0.5 * 32767).astype(np.int16)
    data = tone.tobytes()
    fmt = (
        b"fmt " + (16).to_bytes(4, "little")
        + (1).to_bytes(2, "little") + (1).to_bytes(2, "little")
        + rate.to_bytes(4, "little") + (rate * 2).to_bytes(4, "little")
        + (2).to_bytes(2, "little") + (16).to_bytes(2, "little")
    )
    chunks = fmt + b"data" + len(data).to_bytes(4, "little") + data
    wav = b"RIFF" + (4 + len(chunks)).to_bytes(4, "little") + b"WAVE" + chunks

    x, r = decode_wav(wav)
    assert r == rate and x.shape == (rate, 1)
    assert abs(float(np.sqrt((x**2).mean())) - 0.5 / np.sqrt(2)) < 0.01

    out = (
        rd.from_arrow(pa.table({"media_ref": ["a1"], "payload": pa.array([wav], pa.binary())}))
        .map_batches(DecodeAudio, fn_constructor_kwargs={"fake": False},
                     concurrency=1, batch_format="pyarrow")
        .to_pandas()
        .iloc[0]
    )
    assert out["duration_sec"] == 1.0 and out["sample_rate"] == rate
    assert out["channels"] == 1
    # a 440 Hz tone crosses zero ~880 times/sec
    assert 0.09 < out["zero_cross_rate"] < 0.13


def _wav_bytes(fmt_code, channels, rate, bits, block_align, data, extra=b""):
    fmt_body = (
        fmt_code.to_bytes(2, "little") + channels.to_bytes(2, "little")
        + rate.to_bytes(4, "little")
        + (rate * max(block_align, 1)).to_bytes(4, "little")
        + block_align.to_bytes(2, "little") + bits.to_bytes(2, "little")
        + extra
    )
    chunks = (
        b"fmt " + len(fmt_body).to_bytes(4, "little") + fmt_body
        + b"data" + len(data).to_bytes(4, "little") + data
    )
    return b"RIFF" + (4 + len(chunks)).to_bytes(4, "little") + b"WAVE" + chunks


def _ulaw2linear_ref(code):
    """Scalar reference μ-law expansion (Sun g711.c ulaw2linear) —
    independent of the vectorized decoder under test."""
    u = ~code & 0xFF
    t = (((u & 0x0F) << 3) + 0x84) << ((u & 0x70) >> 4)
    return (0x84 - t) if (u & 0x80) else (t - 0x84)


def _alaw2linear_ref(code):
    """Scalar reference A-law expansion (Sun g711.c alaw2linear)."""
    a = code ^ 0x55
    t = (a & 0x0F) << 4
    seg = (a & 0x70) >> 4
    if seg == 0:
        t += 8
    elif seg == 1:
        t += 0x108
    else:
        t = (t + 0x108) << (seg - 1)
    return t if (a & 0x80) else -t


def test_decode_wav_g711():
    import numpy as np

    from dedupe_ray.ops.multimodal import decode_wav

    # pinned ITU vectors: μ-law 0x00 → -32124 (peak), 0xFF → 0;
    # A-law 0x55 → -8, 0xD5 → +8, 0x2A/0xAA → ∓32256 (peak)
    x, _ = decode_wav(_wav_bytes(7, 1, 8000, 8, 1, bytes([0x00, 0x80, 0xFF])))
    np.testing.assert_array_equal(
        (x[:, 0] * 32768).astype(int), [-32124, 32124, 0]
    )
    x, _ = decode_wav(_wav_bytes(6, 1, 8000, 8, 1, bytes([0x55, 0xD5, 0x2A, 0xAA])))
    np.testing.assert_array_equal(
        (x[:, 0] * 32768).astype(int), [-8, 8, -32256, 32256]
    )
    # ALL 256 codes must match the scalar reference expansion exactly
    all_codes = bytes(range(256))
    for code, ref in ((7, _ulaw2linear_ref), (6, _alaw2linear_ref)):
        x, r = decode_wav(_wav_bytes(code, 1, 8000, 8, 1, all_codes))
        got = np.round(x[:, 0] * 32768).astype(np.int64)
        want = np.array([ref(c) for c in range(256)], np.int64)
        assert r == 8000
        np.testing.assert_array_equal(got, want)
        # nearest-codeword round-trip: arbitrary samples decode back to
        # the closest representable codeword value (real-codec sanity)
        rng = np.random.RandomState(7)
        samples = np.concatenate(
            [rng.randint(-32768, 32768, 200), [-32768, -1, 0, 1, 32767]]
        )
        enc = bytes(int(np.argmin(np.abs(want - s))) for s in samples)
        x2, _ = decode_wav(_wav_bytes(code, 1, 8000, 8, 1, enc))
        dec = np.round(x2[:, 0] * 32768).astype(np.int64)
        nearest = want[np.argmin(np.abs(want[None, :] - samples[:, None]), axis=1)]
        np.testing.assert_array_equal(dec, nearest)


def _ima_encode_decode_scalar(samples, channels, block_align):
    """Scalar reference IMA ADPCM codec (spec recurrence, one sample at a
    time) → (encoded bytes, reference-decoded int16 list)."""
    from dedupe_ray.ops.multimodal import _IMA_INDEX_TABLE, _IMA_STEP_TABLE

    spb = (block_align - 4 * channels) * 2 // channels + 1
    n = len(samples) // channels
    blocks = bytearray()
    ref_out = []
    pos = 0
    while pos + spb <= n:
        pred = [int(samples[pos * channels + c]) for c in range(channels)]
        index = [0] * channels
        for c in range(channels):
            blocks += int(pred[c] & 0xFFFF).to_bytes(2, "little")
            blocks += bytes([index[c], 0])
        ref_out.extend(pred)
        nibbles = [[] for _ in range(channels)]
        for t in range(1, spb):
            for c in range(channels):
                s = int(samples[(pos + t) * channels + c])
                step = int(_IMA_STEP_TABLE[index[c]])
                diff = s - pred[c]
                code = 0
                if diff < 0:
                    code = 8
                    diff = -diff
                if diff >= step:
                    code |= 4
                    diff -= step
                if diff >= step >> 1:
                    code |= 2
                    diff -= step >> 1
                if diff >= step >> 2:
                    code |= 1
                # reference decode of this code (exact spec recurrence)
                delta = code & 7
                d = (step >> 3) + (step if delta & 4 else 0) + (
                    (step >> 1) if delta & 2 else 0
                ) + ((step >> 2) if delta & 1 else 0)
                pred[c] = max(-32768, min(32767, pred[c] + (-d if code & 8 else d)))
                index[c] = max(0, min(88, index[c] + int(_IMA_INDEX_TABLE[delta])))
                nibbles[c].append(code)
                ref_out.append(pred[c])
        # pack: per 8-sample run, one 4-byte word per channel interleaved
        for w in range(len(nibbles[0]) // 8):
            for c in range(channels):
                grp = nibbles[c][w * 8 : w * 8 + 8]
                word = bytes(
                    [grp[0] | (grp[1] << 4), grp[2] | (grp[3] << 4),
                     grp[4] | (grp[5] << 4), grp[6] | (grp[7] << 4)]
                )
                blocks += word
        pos += spb
    return bytes(blocks), ref_out


def test_decode_wav_ima_adpcm():
    import numpy as np

    from dedupe_ray.ops.multimodal import decode_wav

    rng = np.random.RandomState(11)
    for channels in (1, 2):
        block_align = 32 * channels  # spb = 57
        spb = (block_align - 4 * channels) * 2 // channels + 1
        n = spb * 3 * channels  # three full blocks
        t = np.arange(n // channels)
        sig = (np.sin(t / 9.0) * 12000 + rng.randint(-500, 500, len(t))).astype(int)
        interleaved = np.repeat(sig, channels) + np.tile(
            np.arange(channels) * 100, len(sig)
        )
        interleaved = np.clip(interleaved, -32768, 32767)
        data, ref = _ima_encode_decode_scalar(interleaved, channels, block_align)
        wav = _wav_bytes(
            0x11, channels, 8000, 4, block_align, data,
            extra=(2).to_bytes(2, "little") + spb.to_bytes(2, "little"),
        )
        x, r = decode_wav(wav)
        assert r == 8000 and x.shape == (spb * 3, channels)
        got = np.round(x * 32768).astype(int).reshape(-1)
        # vectorized decoder must be EXACTLY the scalar spec recurrence
        np.testing.assert_array_equal(got, np.asarray(ref))
        # and ADPCM is a real codec: reconstruction tracks the waveform
        err = np.abs(got - interleaved[: len(got)])
        assert float(np.median(err)) < 1500


def test_scrub_text_batch():
    import pyarrow as pa

    from dedupe_ray.ops.text import scrub_text_batch

    t = pa.table(
        {
            "text": [
                "mail a.b+c@x-corp.io or see https://x.io/p?q=1 now",
                "server at 10.0.255.1 and 192.168.0.7 replied",
                "nothing to scrub here",
                None,
            ]
        }
    )
    out = scrub_text_batch(t)
    s = out.column("scrubbed").to_pylist()
    assert s[0] == "mail <EMAIL> or see <URL> now"
    assert s[1] == "server at <IP> and <IP> replied"
    assert s[2] == "nothing to scrub here"
    assert s[3] is None
    assert out.column("n_email").to_pylist() == [1, 0, 0, None]
    assert out.column("n_ipv4").to_pylist() == [0, 2, 0, None]


def test_knn_join_matches_numpy_brute_force(ray_session):
    from dedupe_ray.ops.embedding import knn_join

    rng = np.random.RandomState(3)
    n, dim, k = 60, 8, 4
    X = rng.normal(size=(n, dim)).astype(np.float32)
    ids = np.arange(100, 100 + n)  # non-contiguous ids
    ds = rd.from_arrow(
        pa.table({"vec_id": ids, "embedding": [row.tolist() for row in X]})
    )
    out = (
        knn_join(ds, k=k)
        .to_pandas()
        .sort_values(["vec_id", "rank"])
        .reset_index(drop=True)
    )
    Xn = X.astype(np.float64)
    Xn /= np.linalg.norm(Xn, axis=1, keepdims=True)
    sims = Xn @ Xn.T
    np.fill_diagonal(sims, -np.inf)
    for i in range(n):
        # expected: cosine desc, id asc tiebreak
        exp = sorted(range(n), key=lambda j: (-sims[i, j], ids[j]))[:k]
        got = out[out.vec_id == ids[i]].neighbor_id.tolist()
        assert got == [ids[j] for j in exp], i
    assert all(
        v == list(range(k)) for v in out.groupby("vec_id")["rank"].apply(list)
    )
    assert not (out.vec_id == out.neighbor_id).any()


def test_knn_join_index_limit_raises(ray_session):
    from dedupe_ray.ops.embedding import knn_join

    ds = rd.from_arrow(
        pa.table({"vec_id": [1, 2, 3], "embedding": [[1.0], [2.0], [3.0]]})
    )
    with pytest.raises(ValueError, match="index_limit"):
        knn_join(ds, k=1, index_limit=2, on_overflow="raise")


def test_knn_join_overflow_routes_to_ivf(ray_session):
    """Above index_limit, knn_join must route to the bucketed IVF path and
    return the same schema with high recall vs the exact result."""
    from dedupe_ray.ops.embedding import knn_join

    rng = np.random.RandomState(7)
    n, dim, k = 300, 8, 5
    # clustered data so IVF buckets are meaningful
    centers = rng.normal(size=(6, dim)) * 4
    X = (centers[rng.randint(0, 6, n)] + rng.normal(size=(n, dim))).astype(
        np.float32
    )
    ids = np.arange(n, dtype=np.int64)
    ds = rd.from_arrow(
        pa.table({"vec_id": ids, "embedding": [r.tolist() for r in X]})
    )
    exact = (
        knn_join(ds, k=k)
        .to_pandas()
        .sort_values(["vec_id", "rank"])
        .reset_index(drop=True)
    )
    approx = (
        knn_join(ds, k=k, index_limit=10)  # force the IVF route
        .to_pandas()
        .sort_values(["vec_id", "rank"])
        .reset_index(drop=True)
    )
    assert list(approx.columns) == ["vec_id", "neighbor_id", "rank"]
    assert set(approx.vec_id) == set(ids)  # every vector got neighbors
    assert not (approx.vec_id == approx.neighbor_id).any()
    assert approx.groupby("vec_id").size().max() <= k
    got = set(zip(approx.vec_id, approx.neighbor_id))
    want = set(zip(exact.vec_id, exact.neighbor_id))
    recall = len(got & want) / len(want)
    assert recall >= 0.8, recall


def test_grouped_sample_nth(ray_session):
    from dedupe_ray.ops.tabular import grouped_sample_nth

    df = pd.DataFrame(
        {
            "g": ["a"] * 25 + ["b"] * 7 + ["c"] * 1,
            "ord": list(range(25)) + list(range(7)) + [0],
        }
    )
    out = grouped_sample_nth(rd.from_pandas(df), "g", "ord", 10).to_pandas()
    by_g = out.sort_values(["g", "ord"]).groupby("g")["ord"].apply(list).to_dict()
    assert by_g == {"a": [0, 10, 20], "b": [0], "c": [0]}  # every stratum kept


def test_normalize_text_batch():
    from dedupe_ray.ops.text import normalize_text_batch

    t = pa.table(
        {
            "text": [
                "  Hello\t\tWORLD \n",
                "Cafe\u0301 au Lait",  # decomposed: e + combining acute
                None,
                "",
            ]
        }
    )
    out = normalize_text_batch(t)["norm_text"].to_pylist()
    assert out == ["hello world", "caf\u00e9 au lait", "", ""]


def test_pack_documents_boundaries(ray_session):
    from dedupe_ray.ops.tabular import pack_documents

    df = pd.DataFrame(
        {
            "g": ["x"] * 4 + ["y"] * 2,
            "doc": [0, 1, 2, 3, 0, 1],
            "length": [60, 60, 60, 10, 150, 1],
        }
    )
    out = pack_documents(
        rd.from_pandas(df), "g", "doc", "length", 100
    ).to_pandas().sort_values(["g", "doc"])
    # x: exclusive prefixes 0,60,120,180 // 100 -> 0,0,1,1 (doc 1 straddles
    # the boundary but is assigned to the pack it STARTS in)
    assert out[out.g == "x"].pack_id.tolist() == [0, 0, 1, 1]
    # y: 0,150 // 100 -> 0,1 ; packing restarts per group
    assert out[out.g == "y"].pack_id.tolist() == [0, 1]


def test_repetition_stats_batch():
    from dedupe_ray.ops.text import repetition_stats_batch

    t = pa.table(
        {
            "doc_id": [0, 1, 2],
            "text": ["a a a b", "all unique words here", ""],
        }
    )
    out = repetition_stats_batch(t)
    assert out.column("n_tokens").to_pylist() == [4, 4, 0]
    assert out.column("n_distinct").to_pylist() == [2, 4, 0]
    assert out.column("dup_token_frac").to_pylist() == [0.5, 0.0, 0.0]
    assert out.column("top_token_frac").to_pylist() == [0.75, 0.25, 0.0]


def test_term_counts_top_n(ray_session):
    from dedupe_ray.ops.text import term_counts

    ds = rd.from_arrow(
        pa.table({"text": ["b b b a a c", "a, b! z", None]})
    )
    out = term_counts(ds, top_n=3).to_pandas()
    # counts: b=4 a=3 c=1 z=1 -> top3 with token-asc tiebreak at the cut
    assert list(zip(out.token, out.cnt)) == [("b", 4), ("a", 3), ("c", 1)]


def test_sliding_window_sum_matches_naive(ray_session):
    from dedupe_ray.ops.tabular import sliding_window_sum

    rng = np.random.RandomState(5)
    n = 300
    df = pd.DataFrame(
        {
            "user_id": rng.randint(0, 7, n),
            "ts": rng.randint(0, 500, n).astype(np.int64),
            "value": rng.randint(-10, 10, n).astype(np.int64),
            "row": np.arange(n),
        }
    )
    out = (
        sliding_window_sum(rd.from_pandas(df), "user_id", "ts", "value", 60)
        .to_pandas()
        .sort_values("row")
        .reset_index(drop=True)
    )
    for _, r in out.iterrows():
        m = df[(df.user_id == r.user_id) & (df.ts >= r.ts - 60) & (df.ts <= r.ts)]
        assert r.window_sum == m.value.sum(), r.row


def test_hll_primitives():
    from dedupe_ray.ops.sketch import _leading_zeros64, _popcount64

    x = np.array([0, 1, 0xFFFFFFFFFFFFFFFF, 1 << 63, 0x8000000000000001], np.uint64)
    assert _popcount64(x).tolist() == [0, 1, 64, 1, 2]
    assert _leading_zeros64(x).tolist() == [64, 63, 0, 0, 0]


def test_hll_approx_distinct_accuracy(ray_session):
    from dedupe_ray.ops.sketch import hll_approx_distinct

    rng = np.random.RandomState(11)
    rows = []
    truth = {"small": 37, "mid": 2000, "big": 50000}
    for g, n in truth.items():
        vals = rng.choice(n * 3, n, replace=False).astype(np.int64) + hash(g) % 7
        # repeat some values: distinct count must ignore multiplicity
        rows.append(pd.DataFrame({"g": g, "v": np.concatenate([vals, vals[: n // 2]])}))
    df = pd.concat(rows, ignore_index=True)
    out = (
        hll_approx_distinct(rd.from_pandas(df), "g", "v")
        .to_pandas()
        .set_index("g")["approx_distinct"]
    )
    for g, n in truth.items():
        assert abs(out[g] - n) / n < 0.05, (g, out[g], n)
    # determinism: same input -> identical estimates
    out2 = (
        hll_approx_distinct(rd.from_pandas(df), "g", "v")
        .to_pandas()
        .set_index("g")["approx_distinct"]
    )
    assert out.to_dict() == out2.to_dict()


def test_grouped_count_distinct(ray_session):
    from dedupe_ray.ops.tabular import grouped_count_distinct

    df = pd.DataFrame(
        {"g": ["a"] * 6 + ["b"] * 3, "v": [1, 1, 2, 3, 3, 3, 9, 9, 9]}
    )
    out = (
        grouped_count_distinct(rd.from_pandas(df), "g", "v")
        .to_pandas()
        .set_index("g")["n_distinct"]
        .to_dict()
    )
    assert out == {"a": 3, "b": 1}


def test_grouped_concat_ordered(ray_session):
    from dedupe_ray.ops.tabular import grouped_concat

    df = pd.DataFrame(
        {"k": ["x", "y", "x", "x"], "v": [3, 7, 1, 2], "ord": [3, 7, 1, 2]}
    )
    out = (
        grouped_concat(rd.from_pandas(df), "k", "v", "ord")
        .to_pandas()
        .set_index("k")["agg"]
        .to_dict()
    )
    assert out == {"x": "1,2,3", "y": "7"}


def test_pivot_counts(ray_session):
    from dedupe_ray.ops.tabular import pivot_counts

    df = pd.DataFrame(
        {"u": [1, 1, 1, 2], "t": ["click", "click", "view", "other"]}
    )
    out = (
        pivot_counts(rd.from_pandas(df), "u", "t", ["click", "view"])
        .to_pandas()
        .set_index("u")
        .sort_index()
    )
    assert out.loc[1, "n_click"] == 2 and out.loc[1, "n_view"] == 1
    assert out.loc[2, "n_click"] == 0 and out.loc[2, "n_view"] == 0  # 'other' not counted


def _brute_space_grams(text: str, n: int) -> set:
    toks = (text or "").split(" ")
    return {tuple(toks[i:i + n]) for i in range(len(toks) - n + 1)}


def test_space_gram_hashes_kernel():
    from dedupe_ray.ops.text import _space_gram_hashes

    texts = [
        "a b c d a b c d",       # 8 tokens, dup grams within row
        "a b c",                 # too short for n=4
        "",                      # empty
        "x  y z w",              # consecutive spaces keep an empty token
        None,                    # null → ''
        "a b c d a b c d",       # identical to row 0
    ]
    rid, gh = _space_gram_hashes(pa.array(texts, pa.string()), 4)
    # per-row distinct gram counts must match a brute-force set build
    got = np.bincount(rid, minlength=len(texts)).tolist()
    want = [len(_brute_space_grams(t, 4)) for t in texts]
    assert got == want
    # identical rows produce identical hash sets, disjoint rows disjoint
    set0 = set(gh[rid == 0].tolist())
    assert set0 == set(gh[rid == 5].tolist())
    assert not set0 & set(gh[rid == 3].tolist())


def test_dup_ngram_docs_matches_brute_force(ray_session):
    from dedupe_ray.ops.dedup import dup_ngram_docs

    texts = {
        1: "the quick brown fox jumps over the lazy dog tonight",
        2: "a quick brown fox jumps over the lazy dog today",
        3: "completely unrelated text with no shared spans at all",
        4: "the quick brown fox jumps over the lazy dog tonight",  # exact dup of 1
        5: "short doc",
    }
    n = 4
    ds = rd.from_arrow(
        pa.table({"doc_id": list(texts), "text": list(texts.values())})
    )
    out = dup_ngram_docs(ds, n=n).to_pandas().set_index("doc_id")["dup_ngrams"]

    grams = {d: _brute_space_grams(t, n) for d, t in texts.items()}
    want = {}
    for d, gs in grams.items():
        others = set().union(*(g for dd, g in grams.items() if dd != d))
        c = len(gs & others)
        if c:
            want[d] = c
    assert dict(out) == want


def test_decontaminate_broadcast_membership(ray_session):
    from dedupe_ray.ops.text import decontaminate

    bench = rd.from_arrow(
        pa.table({"doc_id": [100], "text": ["alpha beta gamma delta epsilon"]})
    )
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": [1, 2, 3],
                "text": [
                    "x alpha beta gamma delta y",   # shares 2 distinct 4-grams? see below
                    "alpha beta gamma zeta",        # no full 4-gram shared? a b g z no
                    "no overlap here at all",
                ],
            }
        )
    )
    out = decontaminate(ds, bench, n=4).to_pandas().set_index("doc_id")[
        "matched_ngrams"
    ]
    # doc 1 contains 'alpha beta gamma delta' (1 shared 4-gram); docs 2,3 none
    assert dict(out) == {1: 1}


def test_decontaminate_bench_limit_guard(ray_session):
    from dedupe_ray.ops.text import decontaminate

    bench = rd.from_arrow(
        pa.table({"doc_id": [1], "text": ["a b c d e f g h i j"]})
    )
    ds = rd.from_arrow(pa.table({"doc_id": [2], "text": ["a b c d e"]}))
    with pytest.raises(ValueError, match="broadcast limit"):
        decontaminate(ds, bench, n=4, bench_gram_limit=2)


def test_bloom_anti_join_exact_even_with_forced_fps(ray_session):
    from dedupe_ray.ops.dedup import bloom_anti_join

    corpus_keys = [f"k{i}" for i in range(200)]
    new_keys = [f"k{i}" for i in range(150, 250)] + ["zzz", "yyy"]
    corpus = rd.from_arrow(pa.table({"key": corpus_keys}))
    new = rd.from_arrow(
        pa.table({"rid": list(range(len(new_keys))), "key": new_keys})
    )
    want = sorted(k for k in new_keys if k not in set(corpus_keys))
    # a 64-bit filter with k=1 saturates → nearly every probe is a false
    # positive; the exact verify pass must still produce the exact answer
    out = bloom_anti_join(new, corpus, "key", n_bits=64, k=1)
    assert sorted(out.to_pandas()["key"]) == want
    # sane sizing gives the same exact answer
    out2 = bloom_anti_join(new, corpus, "key", n_bits=1 << 16, k=7)
    assert sorted(out2.to_pandas()["key"]) == want


def test_bloom_anti_join_candidate_limit(ray_session):
    from dedupe_ray.ops.dedup import bloom_anti_join

    ds = rd.from_arrow(pa.table({"key": [f"a{i}" for i in range(50)]}))
    with pytest.raises(ValueError, match="candidate set"):
        bloom_anti_join(ds, ds, "key", n_bits=64, k=1, candidate_limit=10)


def test_global_quantile_disc_multi_round(ray_session):
    import math

    from dedupe_ray.ops.tabular import global_quantile_disc

    rng = np.random.RandomState(3)
    vals = np.concatenate(
        [rng.normal(0, 1, 5000), np.full(800, 42.0), rng.normal(9e6, 1, 200)]
    )
    ds = rd.from_arrow(pa.table({"v": vals}))
    srt = np.sort(vals)
    for q in (0.0, 0.13, 0.5, 0.97, 1.0):
        got = global_quantile_disc(ds, "v", q, bins=64, collect_limit=100)
        assert got == float(srt[int(math.floor((len(vals) - 1) * q))])
    # plateau collapses via min==max, empty returns None
    flat = rd.from_arrow(pa.table({"v": np.full(500, 7.5)}))
    assert global_quantile_disc(flat, "v", 0.5, bins=8, collect_limit=10) == 7.5
    empty = rd.from_arrow(pa.table({"v": pa.array([None, None], pa.float64())}))
    assert global_quantile_disc(empty, "v", 0.5) is None


def test_leakage_safe_split_groups_never_straddle(ray_session):
    from dedupe_ray.ops.dedup import leakage_safe_split, minhash_lsh_pairs

    base = (
        "the quick brown fox jumps over the lazy dog while the band plays "
        "a long tune about distributed systems and data pipelines tonight"
    )
    texts, ids = [], []
    for i in range(30):
        ids.append(f"d{i:03d}")
        if i % 3 == 0:
            texts.append(base)                     # exact dup family
        elif i % 3 == 1:
            texts.append(base.replace("fox", f"fox{i}"))  # near dup of base
        else:
            texts.append(f"totally unrelated document number {i} " * 4)
    ds = rd.from_arrow(pa.table({"doc_id": ids, "text": texts}))
    out = leakage_safe_split(ds, val_frac=0.4, jaccard_threshold=0.5).to_pandas()
    assert sorted(out.doc_id) == sorted(ids)          # every doc exactly once
    split = dict(zip(out.doc_id, out.split))
    pairs = minhash_lsh_pairs(ds, jaccard_threshold=0.5).to_pandas()
    assert len(pairs) > 0
    for a, b in zip(pairs.id_a, pairs.id_b):
        assert split[a] == split[b], (a, b)
    assert set(out.split) <= {"train", "val"}


def test_leakage_safe_split_deterministic(ray_session):
    from dedupe_ray.ops.dedup import leakage_safe_split

    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": [f"x{i}" for i in range(40)],
                "text": [f"unique text number {i} with several words" for i in range(40)],
            }
        )
    )
    a = leakage_safe_split(ds, val_frac=0.25).to_pandas().sort_values("doc_id")
    b = leakage_safe_split(ds, val_frac=0.25).to_pandas().sort_values("doc_id")
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))
    assert 1 <= (a.split == "val").sum() <= 20  # ~25% of 40, loose bounds


def test_char_ngram_redundancy_edges():
    """Brute-force parity + the short-doc/empty/null edge cases."""
    from dedupe_ray.ops.text import char_ngram_redundancy_batch

    texts = ["abcdefgh", "aaaaaaaaaa", "short", "", None, "abcabcabcabcabc"]
    out = char_ngram_redundancy_batch(
        pa.table({"text": pa.array(texts, pa.string())})
    )
    got = out.column("redundancy_ratio").to_pylist()
    for t, r in zip(texts, got):
        s = (t or "").encode()
        if len(s) < 8:
            assert r == 1.0
        else:
            wins = [s[i : i + 8] for i in range(len(s) - 7)]
            assert r == len(set(wins)) / len(wins)


def test_profile_columns_nulls_and_types(ray_session):
    from dedupe_ray.ops.tabular import profile_columns

    t = pa.table(
        {
            "k": pa.array([1, None, 3, None], pa.int64()),
            "s": pa.array(["ab", None, "", "ü"], pa.string()),
            "f": pa.array([None, None, None, None], pa.float64()),
        }
    )
    out = (
        profile_columns(rd.from_arrow(t))
        .to_pandas()
        .set_index("column_name")
        .sort_index()
    )
    assert out.loc["k", "n_rows"] == 4 and out.loc["k", "n_nulls"] == 2
    assert out.loc["k", "min_num"] == 1.0 and out.loc["k", "max_num"] == 3.0
    assert pd.isna(out.loc["k", "total_len"])
    # 'ü' is ONE codepoint (len() semantics), total = 2 + 0 + 1
    assert out.loc["s", "total_len"] == 3
    assert pd.isna(out.loc["s", "min_num"])
    # all-null float column: counts still exact, min/max NULL
    assert out.loc["f", "n_nulls"] == 4 and pd.isna(out.loc["f", "min_num"])


def test_json_number_field_grammar(ray_session):
    from dedupe_ray.ops.tabular import json_number_field

    ds = rd.from_arrow(
        pa.table(
            {
                "j": [
                    '{"k": 69}',
                    '{"a": 1, "k": -2.5e3}',
                    '{"k": "not a number"}',
                    '{"other": 3}',
                    None,
                    '{"kk": 7, "k": 0}',
                ]
            }
        )
    )
    out = json_number_field(ds, "j", "k").to_pandas()["k"]
    assert out.iloc[0] == 69.0 and out.iloc[1] == -2500.0 and out.iloc[5] == 0.0
    assert out.iloc[2:5].isna().all()


def test_jsonl_roundtrip_special_chars(tmp_path, ray_session):
    from dedupe_ray.sources import read_jsonl, write_jsonl

    t = pa.table(
        {
            "id": [1, 2, 3],
            "s": ['he said "hi"\tand left', "unicode: üñî ✓", "back\\slash"],
        }
    )
    out = str(tmp_path / "jl")
    write_jsonl(rd.from_arrow(t), out)
    back = read_jsonl(out).to_pandas().sort_values("id").reset_index(drop=True)
    assert back["s"].tolist() == t.column("s").to_pylist()
    # overwrite semantics: second write replaces, never appends
    write_jsonl(rd.from_arrow(t.slice(0, 1)), out)
    assert read_jsonl(out).count() == 1


def test_compression_ratio_batch():
    from dedupe_ray.ops.text import compression_ratio_batch

    t = pa.table(
        {
            "doc_id": [0, 1, 2],
            "text": ["abc " * 500, "", None],
        }
    )
    out = compression_ratio_batch(t).column("compression_ratio").to_pylist()
    assert out[0] < 0.05          # highly repetitive → tiny ratio
    assert out[1] == 1.0 and out[2] == 1.0


def test_except_intersect_all_multiset_semantics(ray_session):
    import duckdb

    from dedupe_ray.ops.tabular import except_all, intersect_all

    a = pa.table({"k": ["x", "x", "x", "y", "z"], "v": [1, 1, 2, 3, 4]})
    b = pa.table({"k": ["x", "x", "w"], "v": [1, 2, 9]})
    con = duckdb.connect()
    con.register("ta", a.to_pandas())
    con.register("tb", b.to_pandas())
    for op, fn in (("EXCEPT ALL", except_all), ("INTERSECT ALL", intersect_all)):
        got = (
            fn(rd.from_arrow(a), rd.from_arrow(b))
            .to_pandas()
            .sort_values(["k", "v"])
            .reset_index(drop=True)
        )
        want = (
            con.execute(f"SELECT * FROM ta {op} SELECT * FROM tb")
            .df()
            .sort_values(["k", "v"])
            .reset_index(drop=True)
        )
        assert got.equals(want), op
    # schema mismatch guard
    with pytest.raises(ValueError, match="schema mismatch"):
        except_all(rd.from_arrow(a), rd.from_arrow(pa.table({"k": ["x"]})))


def test_grouped_lag_and_cumsum(ray_session):
    from dedupe_ray.ops.tabular import grouped_cumsum, grouped_lag

    t = pa.table(
        {
            "k": ["a", "a", "a", "b", "b"],
            "o": [3, 1, 2, 1, 2],
            "rid": [0, 1, 2, 3, 4],
            "v": [10, 20, 30, 5, 7],
        }
    )
    ds = rd.from_arrow(t)
    lag = (
        grouped_lag(ds, "k", ["o", "rid"], "v", "prev")
        .to_pandas()
        .sort_values(["k", "o"])
    )
    assert lag["prev"].tolist()[0] != lag["prev"].tolist()[0]  # NaN at head
    assert lag["prev"].tolist()[1:3] == [20.0, 30.0]  # order by o: 20,30,10
    cs = (
        grouped_cumsum(ds, "k", ["o", "rid"], "v", "rt")
        .to_pandas()
        .sort_values(["k", "o"])
    )
    assert cs["rt"].tolist() == [20, 50, 60, 5, 12]


def test_grouped_lead_and_ntile(ray_session):
    from dedupe_ray.ops.tabular import grouped_lead, grouped_ntile

    t = pa.table(
        {
            "k": ["a", "a", "a", "b", "b", "c"],
            "o": [3, 1, 2, 1, 2, 1],
            "rid": [0, 1, 2, 3, 4, 5],
            "v": [10, 20, 30, 5, 7, 9],
        }
    )
    ds = rd.from_arrow(t)
    lead = (
        grouped_lead(ds, "k", ["o", "rid"], "v", "nxt")
        .to_pandas()
        .sort_values(["k", "o"])
    )
    # a ordered by o: v = 20, 30, 10 → lead = 30, 10, NaN
    assert lead["nxt"].tolist()[:2] == [30.0, 10.0]
    assert lead["nxt"].isna().tolist() == [False, False, True, False, True, True]

    # NTILE semantics: first (n % tiles) buckets get the extra row
    t2 = pa.table(
        {
            "k": ["a"] * 7 + ["b"] * 2,
            "o": list(range(7)) + [0, 1],
            "rid": list(range(9)),
            "v": [0] * 9,
        }
    )
    nt = (
        grouped_ntile(rd.from_arrow(t2), "k", ["o", "rid"], 3, "tile")
        .to_pandas()
        .sort_values(["k", "o"])
    )
    assert nt["tile"].tolist() == [1, 1, 1, 2, 2, 3, 3, 1, 2]  # 7 rows → 3,2,2
    # more tiles than rows: each row its own tile, no division blowup
    nt2 = (
        grouped_ntile(rd.from_arrow(t2), "k", ["o", "rid"], 5, "tile")
        .to_pandas()
        .sort_values(["k", "o"])
    )
    assert nt2[nt2.k == "b"]["tile"].tolist() == [1, 2]


def test_tfidf_join_strategy_matches_broadcast(ray_session):
    from dedupe_ray.ops.text import tfidf_top_terms

    rng = np.random.RandomState(5)
    vocab = ["apple", "banana", "cherry", "date", "elder", "fig", "grape"]
    docs = pa.table(
        {
            "doc_id": [f"d{i}" for i in range(40)],
            "text": [" ".join(rng.choice(vocab, rng.randint(0, 12))) for _ in range(40)],
        }
    )
    kw = dict(column="text", id_column="doc_id", k=3)
    bc = (
        tfidf_top_terms(rd.from_arrow(docs), strategy="broadcast", **kw)
        .to_pandas()
        .sort_values(["doc_id", "rnk"])
        .reset_index(drop=True)
    )
    jn = (
        tfidf_top_terms(rd.from_arrow(docs), strategy="join", **kw)
        .to_pandas()
        .sort_values(["doc_id", "rnk"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(bc, jn)
    # a tiny vocab_limit auto-routes to the join path
    auto = (
        tfidf_top_terms(rd.from_arrow(docs), vocab_limit=2, **kw)
        .to_pandas()
        .sort_values(["doc_id", "rnk"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(bc, auto)


def test_scrub_repeated_ngrams_bruteforce_parity(ray_session):
    """Randomized corpora from a tiny vocabulary (heavy gram collisions)
    vs a pure-python reference implementation of the same semantics."""
    from collections import Counter

    from dedupe_ray.ops.dedup import scrub_repeated_ngrams

    rng = np.random.RandomState(17)
    vocab = ["aa", "bb", "cc", "dd"]
    for trial in range(6):
        n, t = rng.choice([2, 3]), rng.choice([2, 3])
        docs = [
            " ".join(rng.choice(vocab, rng.randint(0, 9)))
            for _ in range(25)
        ]
        # brute force: count gram instances, cover, rebuild
        grams = Counter()
        for d in docs:
            toks = d.split(" ")
            for i in range(len(toks) - n + 1):
                grams[tuple(toks[i : i + n])] += 1
        hot = {g for g, c in grams.items() if c >= t}
        want_clean, want_removed = [], []
        for d in docs:
            toks = d.split(" ")
            cov = [False] * len(toks)
            for i in range(len(toks) - n + 1):
                if tuple(toks[i : i + n]) in hot:
                    for j in range(i, i + n):
                        cov[j] = True
            want_clean.append(" ".join(tok for tok, c in zip(toks, cov) if not c))
            want_removed.append(sum(cov))
        tbl = pa.table({"doc_id": [str(i) for i in range(len(docs))], "text": docs})
        out = (
            scrub_repeated_ngrams(rd.from_arrow(tbl), n=int(n), min_count=int(t))
            .to_pandas()
            .set_index("doc_id")
        )
        for i in range(len(docs)):
            assert out.loc[str(i), "text_clean"] == want_clean[i], (trial, n, t, docs[i])
            assert out.loc[str(i), "n_removed"] == want_removed[i]


def test_scrub_join_strategy_matches_broadcast(ray_session):
    from dedupe_ray.ops.dedup import scrub_repeated_ngrams

    rng = np.random.RandomState(23)
    vocab = ["aa", "bb", "cc", "dd", "ee"]
    docs = pa.table(
        {
            "doc_id": [str(i) for i in range(30)],
            "text": [" ".join(rng.choice(vocab, rng.randint(0, 10))) for _ in range(30)],
        }
    )
    kw = dict(n=3, min_count=2)
    bc = (
        scrub_repeated_ngrams(rd.from_arrow(docs), strategy="broadcast", **kw)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert bc.n_removed.sum() > 0  # the corpus must actually exercise covers
    jn = (
        scrub_repeated_ngrams(rd.from_arrow(docs), strategy="join", **kw)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(bc, jn)
    # a tiny hot_limit auto-routes to the join path
    auto = (
        scrub_repeated_ngrams(rd.from_arrow(docs), hot_limit=1, **kw)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(bc, auto)


def test_debounce_rows(ray_session):
    from dedupe_ray.ops.tabular import debounce_rows

    ts = pa.array([0, 500, 1500, 1600, 3000, 100], pa.timestamp("us"))
    t = pa.table(
        {
            "k": ["a", "a", "a", "a", "a", "b"],
            "rid": [0, 1, 2, 3, 4, 5],
            "ts": ts,
        }
    )
    out = (
        debounce_rows(rd.from_arrow(t), "k", "ts", 1000, ["rid"])
        .to_pandas()
        .sort_values("rid")
    )
    # gaps to previous RAW row: head, 500, 1000, 100, 1400 → keep 0,2,4; b head
    assert out.rid.tolist() == [0, 2, 4, 5]


def test_grouped_mode_and_cube(ray_session):
    from dedupe_ray.ops.tabular import grouped_mode, rollup_aggregate

    t = pa.table(
        {
            "k": ["a", "a", "a", "b", "b", "b", "b"],
            "v": ["x", "y", "x", "p", "q", "q", "p"],
            "n": [1, 2, 3, 4, 5, 6, 7],
        }
    )
    mode = grouped_mode(rd.from_arrow(t), "k", "v").to_pandas().set_index("k")
    assert mode.loc["a", "mode_value"] == "x" and mode.loc["a", "mode_count"] == 2
    # b: p and q tie at 2 → smallest value wins
    assert mode.loc["b", "mode_value"] == "p" and mode.loc["b", "mode_count"] == 2

    cube = (
        rollup_aggregate(rd.from_arrow(t), ["k", "v"], "n", cube=True)
        .to_pandas()
        .set_index(["k", "v"])
    )
    # cube adds the (v)-only level that rollup lacks
    assert cube.loc[("(all)", "q"), "cnt"] == 2
    assert cube.loc[("(all)", "q"), "val"] == 11
    assert cube.loc[("(all)", "(all)"), "val"] == 28
    assert len(cube) == 4 + 2 + 4 + 1  # finest + k-levels + v-levels + total


def test_grouped_rank_stats_ties(ray_session):
    from dedupe_ray.ops.tabular import grouped_rank_stats

    t = pa.table(
        {
            "k": ["a"] * 5 + ["b"],
            "rid": [0, 1, 2, 3, 4, 5],
            "v": [10.0, 10.0, 20.0, 20.0, 30.0, 7.0],
        }
    )
    out = (
        grouped_rank_stats(rd.from_arrow(t), "k", "v", ["rid"])
        .to_pandas()
        .sort_values(["k", "v", "rid"])
        .reset_index(drop=True)
    )
    # ranks with ties: 1,1,3,3,5 → pct = (r-1)/4; cume = tail/5
    assert out.pct_rank.tolist() == [0.0, 0.0, 0.5, 0.5, 1.0, 0.0]
    assert out.cume_dist.tolist() == [0.4, 0.4, 0.8, 0.8, 1.0, 1.0]


def test_rollup_aggregate_matches_pandas(ray_session):
    from dedupe_ray.ops.tabular import rollup_aggregate

    rng = np.random.RandomState(3)
    t = pa.table(
        {
            "a": rng.choice(["x", "y"], 50).tolist(),
            "b": rng.choice(["p", "q", "r"], 50).tolist(),
            "v": rng.randint(0, 100, 50),
        }
    )
    out = (
        rollup_aggregate(rd.from_arrow(t), ["a", "b"], "v")
        .to_pandas()
        .set_index(["a", "b"])
        .sort_index()
    )
    df = t.to_pandas()
    # finest level
    for (a, b), g in df.groupby(["a", "b"]):
        assert out.loc[(a, b), "cnt"] == len(g)
        assert out.loc[(a, b), "val"] == g.v.sum()
    # subtotal + grand total
    for a, g in df.groupby("a"):
        assert out.loc[(a, "(all)"), "cnt"] == len(g)
        assert out.loc[(a, "(all)"), "val"] == g.v.sum()
    assert out.loc[("(all)", "(all)"), "cnt"] == 50
    assert out.loc[("(all)", "(all)"), "val"] == df.v.sum()
    assert len(out) == df.groupby(["a", "b"]).ngroups + df.a.nunique() + 1


def test_tfidf_top_terms(ray_session):
    from dedupe_ray.ops.text import tfidf_top_terms

    docs = pa.table(
        {
            "doc_id": ["d1", "d2", "d3", "d4"],
            "text": [
                "apple banana apple cherry",
                "banana banana date",
                "apple date date date",
                "",
            ],
        }
    )
    out = (
        tfidf_top_terms(rd.from_arrow(docs), "text", "doc_id", k=2)
        .to_pandas()
        .sort_values(["doc_id", "rnk"])
        .reset_index(drop=True)
    )
    # empty doc emits nothing; others emit ≤ k rows
    assert set(out.doc_id) == {"d1", "d2", "d3"}
    assert out.groupby("doc_id").size().max() <= 2
    # d1: apple tf=2 (df=2), cherry tf=1 (df=1) → apple 2·ln(5/3)=1.02,
    # cherry 1·ln(5/2)=0.92, banana 1·ln(5/3)=0.51 → top2 = apple, cherry
    assert out[out.doc_id == "d1"].token.tolist() == ["apple", "cherry"]
    # d2: banana tf=2 beats date tf=1
    assert out[out.doc_id == "d2"].token.tolist()[0] == "banana"
    # d3: date tf=3 df=2 dominates
    assert out[out.doc_id == "d3"].token.tolist()[0] == "date"


def test_scrub_repeated_ngrams(ray_session):
    from dedupe_ray.ops.dedup import scrub_repeated_ngrams

    boiler = "all rights reserved contact us today"
    docs = pa.table(
        {
            "doc_id": ["a", "b", "c", "d"],
            "text": [
                f"alpha beta {boiler} gamma",
                f"delta {boiler} epsilon zeta",
                "unique words only in this document here",
                "",
            ],
        }
    )
    out = (
        scrub_repeated_ngrams(rd.from_arrow(docs), n=6, min_count=2)
        .to_pandas()
        .set_index("doc_id")
    )
    # the shared 6-token boilerplate is covered in both docs; survivors
    # re-join with single spaces
    assert out.loc["a", "text_clean"] == "alpha beta gamma"
    assert out.loc["a", "n_removed"] == 6
    assert out.loc["b", "text_clean"] == "delta epsilon zeta"
    assert out.loc["b", "n_removed"] == 6
    # untouched and empty docs pass through whole
    assert out.loc["c", "text_clean"] == "unique words only in this document here"
    assert out.loc["c", "n_removed"] == 0
    assert out.loc["d", "text_clean"] == "" and out.loc["d", "n_removed"] == 0

    # overlapping hot grams merge their cover (no double-removal):
    # 'x1..x7' twice → three hot 6-grams each doc, cover = all 7 tokens
    rep = " ".join(f"x{i}" for i in range(7))
    out2 = (
        scrub_repeated_ngrams(
            rd.from_arrow(
                pa.table({"doc_id": ["p", "q"], "text": [f"pre {rep}", f"{rep} post"]})
            ),
            n=6,
            min_count=2,
        )
        .to_pandas()
        .set_index("doc_id")
    )
    assert out2.loc["p", "text_clean"] == "pre" and out2.loc["p", "n_removed"] == 7
    assert out2.loc["q", "text_clean"] == "post" and out2.loc["q", "n_removed"] == 7


def test_unpivot_and_histogram(ray_session):
    from dedupe_ray.ops.tabular import unpivot, value_histogram

    t = pa.table({"id": [1, 2], "a": [10, 20], "b": ["x", "y"]})
    out = (
        unpivot(rd.from_arrow(t), ["id"], ["a", "b"])
        .to_pandas()
        .sort_values(["id", "name"])
        .reset_index(drop=True)
    )
    assert out.value.tolist() == ["10", "x", "20", "y"]

    vals = np.array([0.0, 0.5, 1.0, 1.0, 10.0])
    h = (
        value_histogram(rd.from_arrow(pa.table({"v": vals})), "v", 5)
        .to_pandas()
        .set_index("bin")["n"]
    )
    # range [0,10], width 2: bin0 holds {0,0.5,1,1}, bin4 holds {10 (clipped)}
    assert h.to_dict() == {0: 4, 4: 1}
    # single-valued column collapses to bin 0
    h2 = (
        value_histogram(rd.from_arrow(pa.table({"v": [3.0, 3.0]})), "v", 4)
        .to_pandas()
    )
    assert h2.n.tolist() == [2] and h2.bin.tolist() == [0]


def test_chunk_documents_windows(ray_session):
    from dedupe_ray.ops.text import chunk_documents

    ds = rd.from_arrow(
        pa.table(
            {"doc_id": [1, 2, 3], "text": ["a b c d e f g", "", "x y"]}
        )
    )
    out = (
        chunk_documents(ds, chunk_tokens=4, overlap=1)
        .to_pandas()
        .sort_values(["doc_id", "chunk_id"])
        .reset_index(drop=True)
    )
    # stride 3: starts 0,3,6 → 'a b c d', 'd e f g', 'g'; empty doc drops
    assert out.chunk_text.tolist() == ["a b c d", "d e f g", "g", "x y"]
    assert out.chunk_n_tokens.tolist() == [4, 4, 1, 2]
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(ds, chunk_tokens=4, overlap=4)


def test_bloom_persistence_roundtrip(tmp_path, ray_session):
    from dedupe_ray.ops.dedup import (
        bloom_anti_join,
        build_bloom,
        load_bloom,
        save_bloom,
    )

    corpus = rd.from_arrow(pa.table({"key": [f"k{i}" for i in range(300)]}))
    new = rd.from_arrow(
        pa.table({"key": [f"k{i}" for i in range(250, 320)] + ["fresh"]})
    )
    want = sorted(f"k{i}" for i in range(300, 320)) + ["fresh"]
    want.sort()

    bm = build_bloom(corpus, "key", n_bits=1 << 14, k=5)
    p = str(tmp_path / "corpus.bloom")
    save_bloom(bm, p, "key", 5)
    bm2, n_bits, k, keycol = load_bloom(p)
    assert (bm2 == bm).all() and n_bits == 1 << 14 and k == 5 and keycol == "key"

    # reuse the persisted filter: same exact result, no rebuild pass
    out = bloom_anti_join(
        new, corpus, "key", n_bits=n_bits, k=k, bloom=bm2
    ).to_pandas()
    assert sorted(out["key"]) == want
    with pytest.raises(ValueError, match="expected"):
        bloom_anti_join(new, corpus, "key", n_bits=1 << 15, k=k, bloom=bm2)


def test_grouped_dense_rank_ties(ray_session):
    from dedupe_ray.ops.tabular import grouped_dense_rank

    t = pa.table(
        {
            "k": ["a", "a", "a", "a", "b"],
            "v": [10, 20, 20, 30, 5],
            "rid": [0, 1, 2, 3, 4],
        }
    )
    out = (
        grouped_dense_rank(rd.from_arrow(t), "k", "v", "r", descending=True)
        .to_pandas()
        .sort_values("rid")
    )
    # desc: 30→1, 20→2 (both ties), 10→3; b: 5→1
    assert out.r.tolist() == [3, 2, 2, 1, 1]


def test_hll_merge_equals_union_sketch(tmp_path, ray_session):
    from dedupe_ray.ops.sketch import (
        hll_approx_distinct,
        hll_finalize,
        hll_merge,
        hll_sketch_table,
    )

    a = pa.table(
        {"g": ["x"] * 400 + ["y"] * 100, "v": [f"a{i}" for i in range(400)] + [f"b{i}" for i in range(100)]}
    )
    b = pa.table(
        {"g": ["x"] * 300, "v": [f"a{i}" for i in range(200, 500)]}  # overlaps a
    )
    da, db = rd.from_arrow(a), rd.from_arrow(b)
    p = 10

    # sketch(a) persisted, reloaded, merged with sketch(b) == sketch(a ∪ b)
    sa = hll_sketch_table(da, "g", "v", precision=p)
    path = str(tmp_path / "sketch_a")
    sa.write_parquet(path)
    sa_back = rd.read_parquet(path)
    merged = hll_merge(sa_back, hll_sketch_table(db, "g", "v", precision=p), group_column="g")
    got = (
        hll_finalize(merged, "g", precision=p)
        .to_pandas()
        .set_index("g")["approx_distinct"]
        .sort_index()
    )
    want = (
        hll_approx_distinct(da.union(db), "g", "v", precision=p)
        .to_pandas()
        .set_index("g")["approx_distinct"]
        .sort_index()
    )
    assert got.equals(want)  # register-max merge == sketch of concatenation
    # sanity: estimates in a plausible band (true x=500, y=100)
    assert 400 <= got["x"] <= 600 and 80 <= got["y"] <= 120


def test_heavy_hitters_exact_and_bounded(ray_session):
    from collections import Counter

    from dedupe_ray.ops.sketch import heavy_hitters

    rng = np.random.RandomState(13)
    # zipf-ish: value i appears ~ N/i times
    vals = [f"v{i:03d}" for i in range(1, 60) for _ in range(600 // i)]
    rng.shuffle(vals)
    truth = Counter(vals)
    ds = rd.from_arrow(pa.table({"w": vals})).repartition(8)

    # exact regime: capacity above distinct count → err 0, counts exact
    top, err = heavy_hitters(ds, "w", k=5, capacity=256)
    assert err == 0
    got = list(zip(top.column("value").to_pylist(), top.column("n").to_pylist()))
    want = sorted(truth.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    assert got == want

    # tight capacity: lower-bound counts within the reported error
    top2, err2 = heavy_hitters(ds, "w", k=5, capacity=8)
    assert err2 > 0
    for v, n in zip(top2.column("value").to_pylist(), top2.column("n").to_pylist()):
        assert n <= truth[v] <= n + err2, (v, n, truth[v], err2)
    # the undisputed heaviest value survives truncation
    assert top2.column("value")[0].as_py() == "v001"

    # parallelism invariance in the exact regime
    top3, _ = heavy_hitters(
        rd.from_arrow(pa.table({"w": vals})).repartition(2), "w", k=5, capacity=256
    )
    assert top3.equals(top)


def test_cap_per_key(ray_session):
    from dedupe_ray.ops.tabular import cap_per_key

    rows = [
        {"k": k, "id": i, "v": f"{k}{i}"}
        for k in ("a", "b", "c")
        for i in range(5 if k != "c" else 2)
    ]
    ds = rd.from_items(rows).repartition(4)
    out = cap_per_key(ds, "k", "id", 3).to_pandas().sort_values(["k", "id"])
    assert out.groupby("k").size().to_dict() == {"a": 3, "b": 3, "c": 2}
    assert out[out.k == "a"]["id"].tolist() == [0, 1, 2]  # smallest ids kept


def test_mix_corpora_hash_rates_and_determinism(ray_session):
    from dedupe_ray.ops.tabular import mix_corpora

    n = 4000
    a = rd.from_arrow(pa.table({"doc_id": list(range(n))}))
    b = rd.from_arrow(pa.table({"doc_id": list(range(n))}))
    mixed = mix_corpora(
        {"big": a, "small": b}, {"big": 0.8, "small": 0.2}, "doc_id"
    ).to_pandas()
    counts = mixed.groupby("mix_source").size()
    assert abs(counts["big"] / n - 0.8) < 0.03
    assert abs(counts["small"] / n - 0.2) < 0.03
    # per-row deterministic: same input partitioned differently → same rows
    again = mix_corpora(
        {"big": a.repartition(7), "small": b.repartition(3)},
        {"big": 0.8, "small": 0.2},
        "doc_id",
    ).to_pandas()
    key = lambda df: sorted(zip(df.mix_source, df.doc_id))
    assert key(again) == key(mixed)
    # zero-weight source vanishes; bad weight raises
    only = mix_corpora(
        {"big": a, "small": b}, {"big": 0.5, "small": 0.0}, "doc_id"
    ).to_pandas()
    assert set(only.mix_source) == {"big"}
    with pytest.raises(ValueError):
        mix_corpora({"big": a}, {"big": 1.5}, "doc_id")


def test_embedding_centroids_exact_and_invariant(ray_session):
    from dedupe_ray.ops.embedding import embedding_centroids

    rng = np.random.RandomState(17)
    X = rng.normal(size=(300, 4)).astype(np.float32)
    labels = rng.randint(0, 3, 300)
    tbl = pa.table({"label": labels, "embedding": [r.tolist() for r in X]})
    out = embedding_centroids(rd.from_arrow(tbl), "label").to_pandas()
    # matches the quantized mean computed directly
    q = np.floor(X.astype(np.float64) * 1_000_000)
    for lbl in range(3):
        m = (q[labels == lbl].sum(axis=0) / 1_000_000) / (labels == lbl).sum()
        got = out[out.label == lbl].sort_values("dim")["centroid"].to_numpy()
        np.testing.assert_array_equal(got, m)
    # bit-identical at a different partitioning
    out2 = embedding_centroids(
        rd.from_arrow(tbl).repartition(7), "label"
    ).to_pandas()
    assert out.equals(out2)


def test_kmeans_fit_converges_and_is_parallelism_invariant(ray_session):
    from dedupe_ray.ops.embedding import kmeans_fit

    rng = np.random.RandomState(23)
    centers = np.array([[5, 5, 5], [-5, -5, 5], [0, 0, -8]], np.float64)
    X = (centers[rng.randint(0, 3, 600)] + rng.normal(size=(600, 3))).astype(
        np.float32
    )
    tbl = pa.table(
        {"vec_id": np.arange(600, dtype=np.int64), "embedding": [r.tolist() for r in X]}
    )
    c1 = kmeans_fit(rd.from_arrow(tbl), k=3, iters=8)
    # every true center has a learned centroid within 1.0
    for ctr in centers:
        assert np.linalg.norm(c1 - ctr, axis=1).min() < 1.0
    # bit-identical across partitionings (quantized integer partials)
    c2 = kmeans_fit(rd.from_arrow(tbl).repartition(9), k=3, iters=8)
    np.testing.assert_array_equal(c1, c2)


def test_split_sentences(ray_session):
    from dedupe_ray.ops.text import split_sentences

    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": ["a", "b", "c"],
                "text": [
                    "First one. Second two! Third three? Done",
                    "No boundary here",
                    "",
                ],
            }
        )
    )
    out = split_sentences(ds).to_pandas().sort_values(["doc_id", "sent_idx"])
    a = out[out.doc_id == "a"]["sentence"].tolist()
    assert a == ["First one.", "Second two!", "Third three?", "Done"]
    assert out[out.doc_id == "a"]["sent_idx"].tolist() == [0, 1, 2, 3]
    assert out[out.doc_id == "b"]["sentence"].tolist() == ["No boundary here"]
    assert out[out.doc_id == "c"]["sentence"].tolist() == [""]


def test_filter_top_fraction(ray_session):
    from dedupe_ray.ops.tabular import filter_top_fraction

    vals = list(range(100))
    ds = rd.from_arrow(pa.table({"id": vals, "v": vals})).repartition(5)
    out = filter_top_fraction(ds, "v", 0.25).to_pandas()
    # quantile_disc(v, 0.75) over 0..99 = element at floor(99*0.75)=74 → v>=74
    assert sorted(out["v"]) == list(range(74, 100))
    with pytest.raises(ValueError):
        filter_top_fraction(ds, "v", 0.0)


def test_bm25_topk(ray_session):
    import math

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from dedupe_ray.ops.text import bm25_topk

    docs = [
        "spark window merge spark",     # hits all three, spark twice
        "spark join",                   # one hit, short doc
        "merge merge merge merge merge merge merge merge",  # long, one term
        "filter scan table",            # no hits
        "window",                       # single-token doc
        "",                             # empty
    ]
    tbl = pa.table({"doc_id": list(range(6)), "text": docs})
    out = (
        bm25_topk(rd.from_arrow(tbl), ["spark", "window", "merge"], top_n=4)
        .to_pandas()
        .sort_values("rnk")
    )

    # brute-force reference: same formula, scalar python
    terms = ["spark", "window", "merge"]
    toks = [d.split() for d in docs]
    dls = [len(t) for t in toks]
    n = len(docs)
    avgdl = sum(dls) / n
    scores = []
    for i, t in enumerate(toks):
        s = 0.0
        for q in terms:
            tf = t.count(q)
            df = sum(1 for tt in toks if q in tt)
            idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
            s = s + idf * ((1.2 + 1.0) * tf / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dls[i] / avgdl)))
        scores.append((i, s))
    want = [i for i, s in sorted(scores, key=lambda p: (-p[1], p[0])) if s > 0][:4]
    assert list(out["doc_id"]) == want
    assert list(out["rnk"]) == [1, 2, 3, 4]
    # the no-hit and empty docs never appear
    assert 3 not in set(out["doc_id"]) and 5 not in set(out["doc_id"])


def test_bm25_topk_no_hits(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from dedupe_ray.ops.text import bm25_topk

    tbl = pa.table({"doc_id": [1, 2], "text": ["alpha beta", "gamma"]})
    out = bm25_topk(rd.from_arrow(tbl), ["zzz"], top_n=5).to_pandas()
    assert len(out) == 0


def test_dedup_keep_best(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from dedupe_ray.ops.dedup import dedup_keep_best

    tbl = pa.table(
        {
            "id": [1, 2, 3, 4, 5, 6, 7],
            "key": ["a", "a", "a", "b", "b", "c", None],
            "q": [1.0, 5.0, 5.0, 2.0, 2.0, 0.0, 9.0],
        }
    )
    out = (
        dedup_keep_best(rd.from_arrow(tbl), "key", "q", "id")
        .to_pandas()
        .sort_values("id")
    )
    # a → max q 5.0, tie (ids 2,3) → min id 2; b → tie → id 4; c → id 6;
    # None normalizes to "" (its own group) → id 7
    assert list(out["id"]) == [2, 4, 6, 7]


def test_ddsketch_quantiles_guarantee(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from dedupe_ray.ops.sketch import (
        dd_bucket,
        ddsketch_merge,
        ddsketch_quantiles,
        ddsketch_table,
    )

    rng = np.random.RandomState(3)
    vals = np.concatenate(
        [
            np.exp(rng.randn(5000) * 2.0),      # lognormal positives
            -np.exp(rng.randn(500)),            # negatives
            np.zeros(100),
        ]
    )
    rng.shuffle(vals)
    gamma = 1.02
    alpha = (gamma - 1.0) / (gamma + 1.0)
    ds = rd.from_arrow(pa.table({"value": vals})).repartition(7)
    sk = ddsketch_table(ds, "value", gamma=gamma)
    got = ddsketch_quantiles(sk, [0.01, 0.25, 0.5, 0.9, 0.99], gamma=gamma).to_pandas()

    srt = np.sort(vals)
    n = len(vals)
    for _, row in got.iterrows():
        exact = srt[max(int(np.ceil(row["q"] * n)), 1) - 1]
        est = row["estimate"]
        if exact == 0:
            assert est == 0.0
        else:
            # DDSketch guarantee: relative error ≤ alpha
            assert abs(est - exact) <= alpha * abs(exact) * 1.0000001, (
                row["q"], est, exact,
            )

    # merge(sketch(half1), sketch(half2)) == sketch(all), exactly
    h1 = rd.from_arrow(pa.table({"value": vals[:2000]}))
    h2 = rd.from_arrow(pa.table({"value": vals[2000:]}))
    merged = ddsketch_merge(
        ddsketch_table(h1, "value", gamma=gamma),
        ddsketch_table(h2, "value", gamma=gamma),
    ).to_pandas().sort_values(["sign", "bucket"]).reset_index(drop=True)
    whole = sk.to_pandas().sort_values(["sign", "bucket"]).reset_index(drop=True)
    assert merged.equals(whole)

    # bucket function is the documented closed form
    s, b = dd_bucket(np.array([1.0, gamma**3 * 0.999, -2.5, 0.0]), gamma)
    assert list(s) == [1, 1, -1, 0]
    assert b[0] == 0 and b[1] == 3 and b[3] == 0


def test_semantic_dedup_brute_force(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from dedupe_ray.ops.embedding import semantic_dedup

    rng = np.random.RandomState(5)
    dim = 16
    base = rng.randn(30, dim).astype(np.float32)
    # plant near-dups: rows 30..39 are tiny perturbations of rows 0..9
    dups = base[:10] + rng.normal(0, 0.001, (10, dim)).astype(np.float32)
    vecs = np.vstack([base, dups])
    ids = np.arange(40, dtype=np.int64)
    tbl = pa.table(
        {
            "vec_id": ids,
            "embedding": pa.array(
                [v.tolist() for v in vecs], pa.list_(pa.float32())
            ),
        }
    )
    thr = 0.98
    # brute-force reference: full cosine matrix + union-find, keep min id
    vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sims = vn @ vn.T
    parent = list(range(40))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i in range(40):
        for j in range(i + 1, 40):
            if sims[i, j] >= thr:
                parent[find(j)] = find(i)
    roots = {}
    for i in range(40):
        roots.setdefault(find(i), []).append(i)
    want = sorted(min(m) for m in roots.values())

    # n_centroids=1 → single bucket → no IVF recall loss: exact parity
    out = (
        semantic_dedup(
            rd.from_arrow(tbl).repartition(4),
            cosine_threshold=thr,
            n_centroids=1,
            id_column="vec_id",
        )
        .to_pandas()
        .sort_values("vec_id")
    )
    assert list(out["vec_id"]) == want
    # every planted dup (30..39) must be gone, all non-dup bases kept
    assert all(v < 30 for v in out["vec_id"])


def test_ddsketch_grouped(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from dedupe_ray.ops.sketch import (
        dd_bucket,
        ddsketch_group_quantile,
        ddsketch_group_table,
    )

    rng = np.random.RandomState(9)
    # group "neg" exercises the negative store (the packing-bias edge)
    vals = {
        "small": rng.uniform(0.001, 0.01, 300),
        "big": rng.uniform(100, 10000, 300),
        "neg": -rng.uniform(1, 50, 300),
    }
    g = np.concatenate([[k] * len(v) for k, v in vals.items()])
    v = np.concatenate(list(vals.values()))
    ds = rd.from_arrow(pa.table({"grp": g, "value": v})).repartition(5)
    sk = ddsketch_group_table(ds, "grp", "value", gamma=1.05)
    out = (
        ddsketch_group_quantile(sk, "grp", 0.5, gamma=1.05)
        .to_pandas()
        .set_index("grp")
    )
    for k, arr in vals.items():
        srt = np.sort(arr)
        exact = srt[max(int(np.ceil(0.5 * len(arr))), 1) - 1]
        s, b = dd_bucket(np.array([exact]), 1.05)
        # the sketch's selected bucket must contain a value within one
        # bucket of the exact rank-median's bucket (rank falls inside it)
        assert out.loc[k, "sign"] == s[0]
        assert abs(out.loc[k, "bucket"] - b[0]) <= 1, (k, out.loc[k, "bucket"], b[0])


def test_decode_jpeg_progressive():
    import numpy as np

    from dedupe_ray.ops.multimodal import decode_jpeg

    rng = np.random.RandomState(21)
    img = rng.randint(0, 256, (21, 18, 3), dtype=np.uint8)

    # progressive and baseline encode the SAME quantized coefficients, so
    # the decoded pixels must be bit-identical
    for kwargs in (
        dict(sampling=(1, 1), quant=4),                       # 4:4:4
        dict(sampling=(2, 2), quant=4),                       # 4:2:0
        dict(sampling=(2, 1), quant=8, restart=3),            # 4:2:2 + RST
        dict(sampling=(1, 1), quant=4, dc_al=2, ac_al=3),     # deeper SA
        dict(sampling=(1, 1), quant=4, dc_al=0, ac_al=0),     # spectral only
        dict(sampling=(1, 1), quant=4, split=1),              # narrow band 1
    ):
        base_kwargs = {k: v for k, v in kwargs.items()
                       if k in ("sampling", "quant", "restart")}
        want = decode_jpeg(_jpeg_bytes(img, **base_kwargs))
        got = decode_jpeg(_jpeg_progressive_bytes(img, **kwargs))
        np.testing.assert_array_equal(got, want, err_msg=str(kwargs))

    # grayscale
    g = rng.randint(0, 256, (9, 13), dtype=np.uint8)
    np.testing.assert_array_equal(
        decode_jpeg(_jpeg_progressive_bytes(g, quant=2)),
        decode_jpeg(_jpeg_bytes(g, quant=2)),
    )

    # smooth gradient → long EOB runs across blocks (exercises EOBRUN
    # accumulation + its correction-bit buffering)
    yy, xx = np.mgrid[0:32, 0:40]
    smooth = ((yy * 3 + xx * 2) % 256).astype(np.uint8)
    np.testing.assert_array_equal(
        decode_jpeg(_jpeg_progressive_bytes(smooth, quant=16)),
        decode_jpeg(_jpeg_bytes(smooth, quant=16)),
    )


def _avi_bytes(frames, fps=10, width=16, height=8):
    """Minimal AVI container: LIST hdrl(avih) + LIST movi with
    ('dc', jpeg_bytes) / ('db', dib_bytes) frame chunks."""
    import struct

    def chunk(cid, body):
        pad = b"\x00" if len(body) & 1 else b""
        return cid + struct.pack("<I", len(body)) + body + pad

    avih = struct.pack(
        "<IIIIIIIIII", int(1e6 / fps), 0, 0, 0, len(frames), 0, 1, 0,
        width, height
    ) + b"\x00" * 16
    hdrl = b"LIST" + struct.pack("<I", 4 + 8 + len(avih)) + b"hdrl" + chunk(b"avih", avih)
    movi_body = b"".join(
        chunk(b"00dc" if kind == "dc" else b"00db", data) for kind, data in frames
    )
    movi = b"LIST" + struct.pack("<I", 4 + len(movi_body)) + b"movi" + movi_body
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_decode_video_avi(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from dedupe_ray.ops.multimodal import (
        DecodeVideo,
        _pixel_features,
        decode_jpeg,
        demux_avi,
    )

    rng = np.random.RandomState(31)
    w, h = 16, 8
    imgs = [rng.randint(0, 256, (h, w, 3), dtype=np.uint8) for _ in range(3)]
    jpegs = [_jpeg_bytes(im, quant=4) for im in imgs]
    # DIB frame: bottom-up BGR with 4-byte row stride
    dib_img = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), np.uint8)
    rows[:, : w * 3] = dib_img[::-1, :, ::-1].reshape(h, w * 3)
    avi = _avi_bytes(
        [("dc", j) for j in jpegs] + [("db", rows.tobytes())],
        fps=10, width=w, height=h,
    )

    frames, fps, aw, ah = demux_avi(avi)
    assert len(frames) == 4 and fps == 10.0 and (aw, ah) == (w, h)

    out = (
        rd.from_arrow(
            pa.table({"media_ref": ["clip1"], "payload": pa.array([avi], pa.binary())})
        )
        .map_batches(DecodeVideo, fn_constructor_kwargs={"n_frames": 4, "fake": False},
                     concurrency=1, batch_format="pyarrow")
        .to_pandas()
    )
    assert len(out) == 4
    assert list(out["frame_ts"]) == [0.0, 0.1, 0.2, 0.3]
    assert set(out["width"]) == {w} and set(out["height"]) == {h}
    # frame features == features of the independently decoded frame images
    for i, jpg in enumerate(jpegs):
        np.testing.assert_allclose(
            np.asarray(out.iloc[i]["features"]),
            _pixel_features(decode_jpeg(jpg)),
        )
    # DIB frame round-trips exactly
    np.testing.assert_allclose(
        np.asarray(out.iloc[3]["features"]), _pixel_features(dib_img)
    )
    # non-AVI + fake=False raises through the stage
    import pytest

    with pytest.raises(Exception):
        rd.from_arrow(
            pa.table({"media_ref": ["x"], "payload": pa.array([b"\x00\x01"], pa.binary())})
        ).map_batches(
            DecodeVideo, fn_constructor_kwargs={"fake": False},
            concurrency=1, batch_format="pyarrow",
        ).materialize()


def test_global_quantile_cont(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from dedupe_ray.ops.tabular import global_quantile_cont

    rng = np.random.RandomState(13)
    vals = rng.uniform(0, 1000, 2001)
    ds = rd.from_arrow(pa.table({"v": vals})).repartition(6)
    for q in (0.0, 0.25, 0.5, 0.9, 1.0):
        got = global_quantile_cont(ds, "v", q, bins=64, collect_limit=50)
        srt = np.sort(vals)
        pos = (len(vals) - 1) * q
        k1 = int(np.floor(pos))
        k2 = int(np.ceil(pos))
        want = srt[k1] + (srt[k2] - srt[k1]) * (pos - k1)
        assert got == want, (q, got, want)
    # nulls ignored; empty → None
    with_null = rd.from_arrow(pa.table({"v": pa.array([None, 5.0, 1.0], pa.float64())}))
    assert global_quantile_cont(with_null, "v", 0.5) == 3.0
    empty = rd.from_arrow(pa.table({"v": pa.array([], pa.float64())}))
    assert global_quantile_cont(empty, "v", 0.5) is None


def test_fuzzy_levenshtein_join_brute_force(ray_session):
    """SymSpell-blocked distributed join == brute-force O(n²) edit-distance
    scan (completeness is the Bocek/Garbe deletion-neighborhood theorem;
    this exercises it through the full explode→bucket→verify pipeline,
    including pair dedup across shared variants)."""
    from dedupe_ray.distances import levenshtein_batch
    from dedupe_ray.ops.dedup import fuzzy_levenshtein_join

    rng = np.random.RandomState(11)
    alphabet = list("abcd")
    vals = []
    for i in range(120):
        base = "".join(rng.choice(alphabet, size=rng.randint(0, 7)))
        vals.append(base)
    # force duplicates-adjacent-by-edits structure and some empties
    ds = rd.from_arrow(
        pa.table({"doc_id": [f"r{i:03d}" for i in range(len(vals))], "value": vals})
    )
    got = (
        fuzzy_levenshtein_join(ds, "doc_id", "value", max_distance=2)
        .to_pandas()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    ids = [f"r{i:03d}" for i in range(len(vals))]
    exp_rows = []
    a_list, b_list, pairs = [], [], []
    for i in range(len(vals)):
        for j in range(i + 1, len(vals)):
            a_list.append(vals[i])
            b_list.append(vals[j])
            pairs.append((ids[i], ids[j]))
    dist = levenshtein_batch(a_list, b_list)
    for (pa_, pb_), d in zip(pairs, dist):
        if d <= 2:
            exp_rows.append((pa_, pb_, int(d)))
    exp = pd.DataFrame(exp_rows, columns=["id_a", "id_b", "dist"]).sort_values(
        ["id_a", "id_b"]
    ).reset_index(drop=True)
    assert len(got) == len(exp)
    assert got["id_a"].tolist() == exp["id_a"].tolist()
    assert got["id_b"].tolist() == exp["id_b"].tolist()
    assert got["dist"].tolist() == exp["dist"].tolist()


def test_fuzzy_levenshtein_join_oversized_run_raises(ray_session):
    from dedupe_ray.ops.dedup import fuzzy_levenshtein_join

    ds = rd.from_arrow(
        pa.table({"doc_id": [str(i) for i in range(30)], "value": ["same"] * 30})
    )
    with pytest.raises(Exception, match="max_bucket"):
        fuzzy_levenshtein_join(ds, "doc_id", "value", max_distance=1, max_bucket=10).count()


def test_grouped_corr_matches_numpy(ray_session):
    from dedupe_ray.ops.tabular import grouped_corr

    rng = np.random.RandomState(3)
    g = rng.choice(["a", "b"], size=400)
    x = rng.randint(0, 50, size=400)
    y = (x * 2 + rng.randint(-10, 10, size=400)).astype(np.int64)
    ds = rd.from_arrow(pa.table({"g": g, "x": x.astype(np.int64), "y": y}))
    out = grouped_corr(ds, ["g"], "x", "y").to_pandas().set_index("g")["corr"]
    for key in ("a", "b"):
        m = g == key
        expect = np.corrcoef(x[m].astype(float), y[m].astype(float))[0, 1]
        assert abs(out[key] - expect) < 1e-9


def test_grouped_corr_degenerate_and_overflow(ray_session):
    from dedupe_ray.ops.tabular import grouped_corr

    ds = rd.from_arrow(
        pa.table({"g": ["z"] * 5, "x": [7] * 5, "y": [1, 2, 3, 4, 5]})
    )
    out = grouped_corr(ds, ["g"], "x", "y").to_pandas()
    assert out["corr"].isna().all()  # zero variance in x → NULL

    big = rd.from_arrow(
        pa.table({"g": ["z"] * 4, "x": [2**31] * 4, "y": [1, 2, 3, 4]})
    )
    with pytest.raises(Exception, match="int64"):
        grouped_corr(big, ["g"], "x", "y")


def test_strip_markup(ray_session):
    from dedupe_ray.ops.text import strip_markup

    raw = [
        '<div class="x">hello <b>world</b></div>',
        "a &lt;tag&gt; &amp;amp; stays: &amp;lt;",  # double-escape safety
        "no markup at all",
        "<p>q&quot;d&#39;s&nbsp;end</p>",
        "",
    ]
    ds = rd.from_arrow(pa.table({"text": raw}))
    out = strip_markup(ds, "text", "clean").to_pandas()["clean"].tolist()
    assert out == [
        "hello world",
        "a <tag> &amp; stays: &lt;",
        "no markup at all",
        'q"d\'s end',
        "",
    ]


def _gif_lzw_encode(indices, min_code_size):
    """Test-side GIF LZW encoder (variable width, LSB-first; emits CLEAR
    when the table fills so the decoder's reset path gets exercised)."""
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code, width):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 255)
            acc >>= 8
            nbits -= 8

    def fresh():
        return {bytes([i]): i for i in range(clear)}, end + 1, min_code_size + 1

    table, next_code, width = fresh()
    emit(clear, width)
    cur = b""
    for p in indices:
        nxt = cur + bytes([int(p)])
        if nxt in table:
            cur = nxt
            continue
        emit(table[cur], width)
        if next_code < 4096:
            table[nxt] = next_code
            next_code += 1
            # encoder bumps ONE code later than the decoder's
            # len(table)==2^width rule: the decoder's table lags the
            # encoder's by one entry (it adds on the NEXT code), so the
            # giflib convention is ">" (here: == 2^width + 1)
            if next_code == (1 << width) + 1 and width < 12:
                width += 1
        else:
            emit(clear, width)
            table, next_code, width = fresh()
        cur = nxt[-1:]
    if cur:
        emit(table[cur], width)
    emit(end, width)
    if nbits:
        out.append(acc & 255)
    return bytes(out)


def _gif_bytes(idx, palette, interlace=False, local=False, extension=False):
    """Hand-built GIF89a encoder (test-side only)."""
    import struct

    import numpy as np

    h, w = idx.shape
    bits = max(1, (len(palette) - 1).bit_length())
    size_field = bits - 1
    tbl_n = 2 << size_field
    pal = np.zeros((tbl_n, 3), np.uint8)
    pal[: len(palette)] = palette
    min_code_size = max(2, bits)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    if local:
        out += bytes([0, 0, 0])
    else:
        out += bytes([0x80 | size_field, 0, 0]) + bytes(pal.reshape(-1))
    if extension:  # graphic-control extension → decoder's skip path
        out += b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    rows = idx
    if interlace:
        order = np.concatenate(
            [np.arange(0, h, 8), np.arange(4, h, 8),
             np.arange(2, h, 4), np.arange(1, h, 2)]
        )
        rows = idx[order]
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h)
    packed = (0x80 | size_field) if local else 0
    if interlace:
        packed |= 0x40
    out += bytes([packed])
    if local:
        out += bytes(pal.reshape(-1))
    out += bytes([min_code_size])
    data = _gif_lzw_encode(rows.reshape(-1), min_code_size)
    for i in range(0, len(data), 255):
        out += bytes([len(data[i : i + 255])]) + data[i : i + 255]
    out += b"\x00\x3b"
    return bytes(out)


def test_gif_lzw_pinned_bytes():
    """Hand-computed 2-pixel stream pins the LSB-first packing and the
    CLEAR/END conventions on BOTH test encoder and library decoder
    (guards against a symmetric bug cancelling in round-trip tests)."""
    from dedupe_ray.ops.multimodal import _gif_lzw_decode

    enc = _gif_lzw_encode(np.array([0, 0]), 2)
    assert enc == b"\x04\x0a"
    np.testing.assert_array_equal(_gif_lzw_decode(b"\x04\x0a", 2, 2), [0, 0])


def test_decode_gif_round_trip():
    from dedupe_ray.ops.multimodal import decode_gif

    rng = np.random.RandomState(5)
    # 256-color random: dictionary fills to 4096 → encoder emits CLEAR →
    # decoder reset path; also 9→12-bit width growth
    pal = rng.randint(0, 256, (256, 3)).astype(np.uint8)
    idx = rng.randint(0, 256, (60, 80)).astype(np.uint8)
    np.testing.assert_array_equal(decode_gif(_gif_bytes(idx, pal)), pal[idx])
    # 4-color, KwKwK-prone repetitive data
    pal4 = np.array([[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]], np.uint8)
    rep = np.tile(np.array([0, 0, 1, 1, 2, 2, 3, 3, 0, 0, 0], np.uint8), 40)[:440]
    idx4 = rep.reshape(20, 22)
    np.testing.assert_array_equal(decode_gif(_gif_bytes(idx4, pal4)), pal4[idx4])
    # interlaced + local color table + extension block in front
    idx2 = rng.randint(0, 4, (13, 9)).astype(np.uint8)
    np.testing.assert_array_equal(
        decode_gif(_gif_bytes(idx2, pal4, interlace=True, local=True, extension=True)),
        pal4[idx2],
    )
    with pytest.raises(ValueError, match="not a GIF"):
        decode_gif(b"PNGnope")


def test_decode_png_16bit_and_adam7():
    from dedupe_ray.ops.multimodal import decode_png

    rng = np.random.RandomState(7)
    # 16-bit gray + RGB: decoder returns the high byte
    g16 = rng.randint(0, 1 << 16, (9, 6)).astype(np.uint16)
    np.testing.assert_array_equal(
        decode_png(_png_bytes(g16, 0, [0, 1, 2, 3, 4], depth=16)), (g16 >> 8).astype(np.uint8)
    )
    rgb16 = rng.randint(0, 1 << 16, (5, 7, 3)).astype(np.uint16)
    np.testing.assert_array_equal(
        decode_png(_png_bytes(rgb16, 2, [4, 3, 2, 1, 0], depth=16)),
        (rgb16 >> 8).astype(np.uint8),
    )
    # Adam7 interlaced RGB, dims chosen to make some passes ragged/empty
    for shape in ((13, 11, 3), (3, 2, 3), (1, 1, 3), (8, 8, 3)):
        img = rng.randint(0, 256, shape).astype(np.uint8)
        np.testing.assert_array_equal(
            decode_png(_png_bytes(img, 2, [0, 1, 2, 3, 4], interlace=1)), img,
            err_msg=str(shape),
        )
    # Adam7 × 16-bit together
    g = rng.randint(0, 1 << 16, (10, 9)).astype(np.uint16)
    np.testing.assert_array_equal(
        decode_png(_png_bytes(g, 0, [2, 4], depth=16, interlace=1)),
        (g >> 8).astype(np.uint8),
    )


def test_decode_image_stage_gif_payload(ray_session):
    import ray.data as rd

    from dedupe_ray.ops.multimodal import DecodeImage

    rng = np.random.RandomState(9)
    pal = rng.randint(0, 256, (8, 3)).astype(np.uint8)
    idx = rng.randint(0, 8, (4, 6)).astype(np.uint8)
    gif = _gif_bytes(idx, pal)
    png = _png_bytes(pal[idx], 2, [0])  # same pixels via PNG
    tbl = pa.table(
        {
            "media_ref": ["gif", "png"],
            "payload": pa.array([gif, png], pa.binary()),
        }
    )
    out = (
        rd.from_arrow(tbl)
        .map_batches(DecodeImage, fn_constructor_kwargs={"fake": False},
                     concurrency=1, batch_format="pyarrow")
        .to_pandas()
        .set_index("media_ref")
    )
    assert out.loc["gif", "width"] == 6 and out.loc["gif", "height"] == 4
    np.testing.assert_allclose(
        np.asarray(out.loc["gif", "features"]), np.asarray(out.loc["png", "features"])
    )


def _snm_brute(keys, ids, window):
    order = sorted(range(len(ids)), key=lambda i: (keys[i], ids[i]))
    out = set()
    for r, i in enumerate(order):
        for d in range(1, window + 1):
            if r + d < len(order):
                out.add((ids[i], ids[order[r + d]]))
    return out


def test_sorted_neighborhood_pairs_brute_force(ray_session):
    """Range-partitioned SNM == the global-sort window definition, across
    forced tiny buckets (cross-boundary reconstruction), equal keys, and
    buckets smaller than the window."""
    from dedupe_ray.ops.dedup import sorted_neighborhood_pairs

    rng = np.random.RandomState(17)
    n = 300
    keys = rng.randint(0, 40, size=n).astype(np.int64)  # heavy key ties
    ids = [f"r{i:04d}" for i in range(n)]
    ds = rd.from_arrow(pa.table({"doc_id": ids, "k": keys}))
    for w, nb in ((3, 1), (3, 8), (5, 64), (1, 16)):
        got = sorted_neighborhood_pairs(
            ds, "doc_id", "k", window=w, n_buckets=nb
        ).to_pandas()
        got_set = set(zip(got["id_a"], got["id_b"]))
        exp = _snm_brute(keys.tolist(), ids, w)
        assert got_set == exp, (w, nb, len(got_set), len(exp))
        assert len(got) == len(got_set)  # no duplicate pairs


def test_sorted_neighborhood_pairs_string_keys_int_ids(ray_session):
    from dedupe_ray.ops.dedup import sorted_neighborhood_pairs

    rng = np.random.RandomState(23)
    n = 120
    keys = ["k" + "abcde"[rng.randint(5)] * rng.randint(1, 4) for _ in range(n)]
    ids = np.arange(n, dtype=np.int64)
    ds = rd.from_arrow(pa.table({"doc_id": ids, "k": keys}))
    got = sorted_neighborhood_pairs(ds, "doc_id", "k", window=4, n_buckets=6).to_pandas()
    got_set = set(zip(got["id_a"], got["id_b"]))
    exp = _snm_brute(keys, ids.tolist(), 4)
    assert got_set == exp


def test_grouped_linregress_matches_numpy(ray_session):
    from dedupe_ray.ops.tabular import grouped_linregress

    rng = np.random.RandomState(6)
    g = rng.choice(["p", "q"], size=300)
    x = rng.randint(0, 40, size=300).astype(np.int64)
    y = (3 * x + 7 + rng.randint(-5, 5, size=300)).astype(np.int64)
    ds = rd.from_arrow(pa.table({"g": g, "x": x, "y": y}))
    out = grouped_linregress(ds, ["g"], "x", "y").to_pandas().set_index("g")
    for key in ("p", "q"):
        m = g == key
        slope, intercept = np.polyfit(x[m].astype(float), y[m].astype(float), 1)
        assert abs(out.loc[key, "slope"] - slope) < 1e-8
        assert abs(out.loc[key, "intercept"] - intercept) < 1e-7
    flat = rd.from_arrow(pa.table({"g": ["z"] * 4, "x": [5] * 4, "y": [1, 2, 3, 4]}))
    res = grouped_linregress(flat, ["g"], "x", "y").to_pandas()
    assert res["slope"].isna().all() and res["intercept"].isna().all()


def test_jaccard_similarity_join_brute_force(ray_session):
    """Prefix-filtered exact Jaccard self-join == brute-force over all
    pairs (the filter is lossless; exercises length filter, dedup across
    shared prefix tokens, empty texts, exact duplicates)."""
    import itertools
    import re as _re

    from dedupe_ray.ops.dedup import jaccard_similarity_join

    rng = np.random.RandomState(19)
    vocab = [f"w{i}" for i in range(30)]
    ids, texts = [], []
    for i in range(80):
        k = rng.randint(1, 12)
        ids.append(f"d{i:03d}")
        texts.append(" ".join(rng.choice(vocab, size=k)))
    ids += ["dup0", "dup1", "zempty"]
    texts += [texts[0], texts[1] + " w0", ""]
    ds = rd.from_arrow(pa.table({"doc_id": ids, "text": texts}))
    sets = {i: set(_re.findall(r"[\w']+", x.lower())) for i, x in zip(ids, texts)}
    for t in (0.9, 0.6, 0.34):
        got = jaccard_similarity_join(ds, t).to_pandas()
        got_pairs = {
            (a, b): j for a, b, j in zip(got.id_a, got.id_b, got.ngram_jaccard)
        }
        exp = {}
        for a, b in itertools.combinations(sorted(ids), 2):
            sa, sb = sets[a], sets[b]
            if not sa or not sb:
                continue
            j = len(sa & sb) / len(sa | sb)
            if j >= t:
                exp[(a, b)] = j
        assert set(got_pairs) == set(exp), (t, len(got_pairs), len(exp))
        for k in exp:
            assert abs(got_pairs[k] - exp[k]) < 1e-12
    assert ("d000", "dup0") in got_pairs or any(
        k in got_pairs for k in [("d000", "dup0")]
    )


def test_jaccard_similarity_join_shingles(ray_session):
    """n=3 shingle variant against the kernel-identical brute force."""
    import itertools
    import re as _re

    from dedupe_ray.ops.dedup import jaccard_similarity_join

    rng = np.random.RandomState(29)
    vocab = [f"t{i}" for i in range(12)]
    ids, texts = [], []
    for i in range(50):
        k = rng.randint(1, 20)
        ids.append(f"s{i:03d}")
        texts.append(" ".join(rng.choice(vocab, size=k)))
    texts[10] = texts[0] + " extra"
    ds = rd.from_arrow(pa.table({"doc_id": ids, "text": texts}))

    def grams(x, nn):
        toks = _re.findall(r"[\w']+", x.lower())
        if not toks:
            return set()
        return {tuple(toks[i: i + nn]) for i in range(max(1, len(toks) - nn + 1))}

    got = jaccard_similarity_join(ds, 0.4, n=3).to_pandas()
    got_pairs = {(a, b): j for a, b, j in zip(got.id_a, got.id_b, got.ngram_jaccard)}
    exp = {}
    for a, b in itertools.combinations(sorted(ids), 2):
        ga, gb = grams(texts[ids.index(a)], 3), grams(texts[ids.index(b)], 3)
        if ga and gb:
            j = len(ga & gb) / len(ga | gb)
            if j >= 0.4:
                exp[(a, b)] = j
    assert set(got_pairs) == set(exp)
    for k in exp:
        assert abs(got_pairs[k] - exp[k]) < 1e-12


def test_grouped_quantile_cont(ray_session):
    from dedupe_ray.ops.tabular import grouped_quantile_cont

    rng = np.random.RandomState(31)
    keys = rng.choice(["a", "b", "c"], size=200)
    vals = rng.rand(200) * 100
    mask = np.ones(200, bool)
    mask[5] = False  # a true SQL NULL, dropped by the op
    varr = pa.array(
        [float(v) if m else None for v, m in zip(vals, mask)], pa.float64()
    )
    tbl = pa.table({"k": keys, "v": varr})
    ds = rd.from_arrow(tbl.filter(pa.compute.is_valid(tbl.column("v"))))
    # also route the null through the op itself
    ds_null = rd.from_arrow(tbl)
    for d in (ds, ds_null):
        out = (
            grouped_quantile_cont(d, "k", "v", q=0.6, out_column="p60")
            .to_pandas()
            .set_index("k")["p60"]
        )
        for key in ("a", "b", "c"):
            m = (keys == key) & mask
            s = np.sort(vals[m])
            pos = (len(s) - 1) * 0.6
            k1, k2 = int(np.floor(pos)), int(np.ceil(pos))
            expect = s[k1] + (s[k2] - s[k1]) * (pos - np.floor(pos))
            assert out[key] == expect  # exact, not approx


def test_pairwise_cluster_metrics_matches_driver(ray_session):
    """Distributed counting metrics == the quadratic driver-side
    pairwise_prf on the same assignments."""
    from dedupe_ray.eval import pairwise_cluster_metrics, pairwise_prf

    rng = np.random.RandomState(13)
    n = 500
    pred = rng.randint(0, 30, size=n)
    true = (pred + (rng.rand(n) < 0.2) * rng.randint(1, 5, size=n)) % 30
    ids = [str(i) for i in range(n)]
    ds = rd.from_arrow(
        pa.table({"pred": pred.astype(np.int64), "truth": true.astype(np.int64)})
    )
    got = pairwise_cluster_metrics(ds, "pred", "truth").to_pandas().iloc[0]
    p, r, f1 = pairwise_prf(
        dict(zip(ids, pred.tolist())), dict(zip(ids, true.tolist()))
    )
    assert got["prec"] == p and got["rec"] == r and abs(got["f1"] - f1) < 1e-15


def test_filter_outliers_zscore(ray_session):
    from dedupe_ray.ops.tabular import filter_outliers_zscore

    rng = np.random.RandomState(41)
    g = rng.choice(["a", "b"], size=400)
    x = rng.randint(90, 111, size=400).astype(np.int64)
    x[::97] += 500  # planted outliers
    ds = rd.from_arrow(pa.table({"g": g, "x": x, "rid": np.arange(400)}))
    got = filter_outliers_zscore(ds, ["g"], "x", k=3.0).to_pandas()
    exp_rows = set()
    for key in ("a", "b"):
        m = g == key
        mu, sd = x[m].astype(float).mean(), x[m].astype(float).std()
        for i in np.nonzero(m)[0]:
            if abs(float(x[i]) - mu) > 3.0 * sd:
                exp_rows.add(i)
    assert set(got["rid"]) == exp_rows
    assert len(exp_rows) > 0


def test_assign_row_numbers(ray_session):
    from dedupe_ray.ops.tabular import assign_row_numbers

    rng = np.random.RandomState(43)
    n = 700
    keys = rng.randint(0, 50, size=n).astype(np.int64)  # heavy ties
    ids = np.arange(n, dtype=np.int64)
    rng.shuffle(ids)
    ds = rd.from_arrow(pa.table({"id": ids, "k": keys}))
    for nb in (1, 4, 64):
        got = (
            assign_row_numbers(ds, "k", "id", n_buckets=nb)
            .to_pandas()
            .sort_values("row_num")
        )
        order = sorted(range(n), key=lambda i: (keys[i], ids[i]))
        assert got["row_num"].tolist() == list(range(1, n + 1))
        assert got["id"].tolist() == [int(ids[i]) for i in order]


def test_minhash_lsh_join_cross_corpus(ray_session):
    from dedupe_ray.ops.dedup import minhash_lsh_join

    rng = np.random.RandomState(47)
    vocab = [f"tok{i}" for i in range(200)]
    corpus_texts = [
        " ".join(rng.choice(vocab, size=60)) for _ in range(40)
    ]
    corpus = rd.from_arrow(
        pa.table(
            {"doc_id": [f"c{i}" for i in range(40)], "text": corpus_texts}
        )
    )
    # queries: 5 verbatim leaks (guaranteed found: jaccard 1.0 agrees on
    # every band), plus 5 unrelated
    q_texts = corpus_texts[:5] + [
        " ".join(rng.choice(vocab, size=60)) for _ in range(5)
    ]
    queries = rd.from_arrow(
        pa.table({"doc_id": [f"q{i}" for i in range(10)], "text": q_texts})
    )
    got = minhash_lsh_join(queries, corpus, jaccard_threshold=0.7).to_pandas()
    found = set(zip(got["query_id"], got["corpus_id"]))
    for i in range(5):
        assert (f"q{i}", f"c{i}") in found
    # every reported pair is cross-side with a verified estimate
    assert (got["jaccard"] >= 0.7).all()
    assert got["query_id"].str.startswith("q").all()
    assert got["corpus_id"].str.startswith("c").all()


def _tiff_bytes(img, byte_order="II", rows_per_strip=None, min_is_white=False):
    """Hand-built uncompressed TIFF encoder (test-side only), both byte
    orders, multi-strip layout."""
    import struct

    import numpy as np

    bo = "little" if byte_order == "II" else "big"
    h, w = img.shape[:2]
    spp = 1 if img.ndim == 2 else img.shape[2]
    arr = img.reshape(h, w * spp)
    if min_is_white:
        arr = 255 - arr.astype(np.int64)
    rps = rows_per_strip or h
    strips = [bytes(arr[y: y + rps].astype(np.uint8).reshape(-1)) for y in range(0, h, rps)]

    def pk(v, n):
        return int(v).to_bytes(n, bo)

    entries = []
    extra = bytearray()
    header_len = 8
    n_tags = 9
    ifd_len = 2 + n_tags * 12 + 4
    data_base = header_len + ifd_len

    def entry(tag, typ, count, values, size_each):
        nonlocal extra
        raw = b"".join(pk(v, size_each) for v in values)
        if len(raw) <= 4:
            entries.append((tag, typ, count, raw + b"\x00" * (4 - len(raw))))
        else:
            off = data_base + len(extra)
            extra += raw
            entries.append((tag, typ, count, pk(off, 4)))

    # strip data appended after the extra-values area — two passes to know
    # offsets: reserve extra first
    entry(256, 3, 1, [w], 2)
    entry(257, 3, 1, [h], 2)
    entry(258, 3, spp, [8] * spp, 2)
    entry(259, 3, 1, [1], 2)
    entry(262, 3, 1, [0 if min_is_white else 1], 2)
    entry(277, 3, 1, [spp], 2)
    entry(278, 3, 1, [rps], 2)
    # placeholders for strip offsets/counts — compute after extra is final
    counts = [len(s) for s in strips]
    entry(279, 4, len(strips), counts, 4)
    # strip offsets come last so every other extra block is already sized
    strips_area_start = None
    raw_off = b""
    if len(strips) * 4 <= 4:
        strips_area_start = data_base + len(extra)
        raw_off = pk(strips_area_start, 4)
    else:
        # offsets array itself lives in extra; strips follow it
        arr_off = data_base + len(extra)
        strips_area_start = arr_off + 4 * len(strips)
        offs = []
        run = strips_area_start
        for c in counts:
            offs.append(run)
            run += c
        extra += b"".join(pk(o, 4) for o in offs)
        raw_off = pk(arr_off, 4)
    entries.append((273, 4, len(strips), raw_off))
    entries.sort(key=lambda e: e[0])

    out = bytearray()
    out += (b"II" if bo == "little" else b"MM") + pk(42, 2) + pk(8, 4)
    out += pk(n_tags, 2)
    for tag, typ, count, val4 in entries:
        out += pk(tag, 2) + pk(typ, 2) + pk(count, 4) + val4
    out += pk(0, 4)  # next IFD
    out += extra
    assert len(out) == strips_area_start
    for s in strips:
        out += s
    return bytes(out)


def test_decode_tiff_round_trip():
    from dedupe_ray.ops.multimodal import decode_tiff

    rng = np.random.RandomState(53)
    rgb = rng.randint(0, 256, (11, 7, 3), dtype=np.uint8)
    for bo in ("II", "MM"):
        np.testing.assert_array_equal(decode_tiff(_tiff_bytes(rgb, bo)), rgb)
        # multi-strip
        np.testing.assert_array_equal(
            decode_tiff(_tiff_bytes(rgb, bo, rows_per_strip=4)), rgb
        )
    g = rng.randint(0, 256, (6, 9), dtype=np.uint8)
    np.testing.assert_array_equal(decode_tiff(_tiff_bytes(g, "II")), g)
    # MinIsWhite inverts back to the usual scale
    np.testing.assert_array_equal(
        decode_tiff(_tiff_bytes(g, "MM", min_is_white=True)), g
    )
    with pytest.raises(ValueError, match="not a TIFF"):
        decode_tiff(b"GIF89a")


def test_random_projection(ray_session):
    from dedupe_ray.ops.embedding import random_projection

    rng = np.random.RandomState(59)
    n, d = 300, 64
    vecs = rng.randn(n, d).astype(np.float32)
    ds = rd.from_arrow(
        pa.table(
            {
                "vec_id": np.arange(n, dtype=np.int64),
                "embedding": pa.FixedSizeListArray.from_arrays(
                    pa.array(vecs.reshape(-1), pa.float32()), d
                ),
            }
        )
    )
    out = random_projection(ds, out_dim=32).to_pandas().sort_values("vec_id")
    proj = np.stack(out["projected"].to_numpy())
    assert proj.shape == (n, 32)
    # deterministic across runs/actors
    out2 = random_projection(ds, out_dim=32).to_pandas().sort_values("vec_id")
    np.testing.assert_array_equal(proj, np.stack(out2["projected"].to_numpy()))
    # JL property: pairwise distances roughly preserved (loose bound)
    idx = rng.randint(0, n, size=(200, 2))
    keep = idx[:, 0] != idx[:, 1]
    a, b = idx[keep, 0], idx[keep, 1]
    d_orig = np.linalg.norm(vecs[a] - vecs[b], axis=1)
    d_proj = np.linalg.norm(proj[a] - proj[b], axis=1)
    ratio = d_proj / d_orig
    assert 0.55 < ratio.min() and ratio.max() < 1.6
    assert abs(ratio.mean() - 1.0) < 0.1


def test_jaccard_similarity_join_df_order_same_output(ray_session):
    """The prefix ORDER is a pruning lever, never a correctness one:
    df-ascending (PPJoin) and hash orders produce the identical pair set."""
    from dedupe_ray.ops.dedup import jaccard_similarity_join

    rng = np.random.RandomState(61)
    vocab = [f"w{i}" for i in range(25)]
    ids = [f"d{i:03d}" for i in range(70)]
    texts = [" ".join(rng.choice(vocab, size=rng.randint(1, 15))) for _ in ids]
    texts[7] = texts[3]
    ds = rd.from_arrow(pa.table({"doc_id": ids, "text": texts}))
    a = (
        jaccard_similarity_join(ds, 0.5, order="hash")
        .to_pandas()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    b = (
        jaccard_similarity_join(ds, 0.5, order="df", df_table_size=10)
        .to_pandas()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    assert a.equals(b)
    assert len(a) > 0
    with pytest.raises(ValueError, match="unknown prefix order"):
        jaccard_similarity_join(ds, 0.5, order="bogus")


def test_string_sim_pairs_both_metrics(ray_session):
    """string_sim_pairs verifies candidates with either kernel; levenshtein
    similarity is 1 - d/max_len; sub-threshold pairs are dropped."""
    from dedupe_ray.ops.dedup import string_sim_pairs

    names = {"1": "martha", "2": "marhta", "3": "zzzzzz", "4": ""}
    ds = rd.from_arrow(
        pa.table({"doc_id": list(names), "name": list(names.values())})
    )
    pairs = rd.from_arrow(
        pa.table({"id_a": ["1", "1", "1"], "id_b": ["2", "3", "4"]})
    )
    jw = (
        string_sim_pairs(ds, pairs, "name", 0.9, metric="jaro_winkler")
        .to_pandas()
        .sort_values(["id_a", "id_b"])
    )
    assert list(zip(jw["id_a"], jw["id_b"])) == [("1", "2")]
    assert np.isclose(jw["sim"].iloc[0], 0.9611111111111111)
    lev = (
        string_sim_pairs(ds, pairs, "name", 0.5, metric="levenshtein")
        .to_pandas()
        .sort_values(["id_a", "id_b"])
    )
    # d(martha, marhta)=2, len 6 → sim 2/3; zzzzzz → 0; empty → 0
    assert list(zip(lev["id_a"], lev["id_b"])) == [("1", "2")]
    assert np.isclose(lev["sim"].iloc[0], 1 - 2 / 6)
    with pytest.raises(ValueError):
        string_sim_pairs(ds, pairs, "name", 0.5, metric="cosine")


@pytest.mark.parametrize("fmt", ["orc", "feather", "avro"])
def test_orc_feather_roundtrip(tmp_path, ray_session, fmt):
    """Sharded columnar sinks round-trip values, types, nulls and unicode;
    re-read with column pruning; overwrite of an existing dir is clean."""
    from dedupe_ray import sources

    write = getattr(sources, f"write_{fmt}")
    read = getattr(sources, f"read_{fmt}")
    t = pa.table(
        {
            "id": pa.array([1, 2, 3, 4], pa.int64()),
            "s": pa.array(["a,b\n", 'q"u', "żółć", None], pa.string()),
            "f": pa.array([0.5, None, -1.25, 3.0], pa.float64()),
        }
    )
    out = str(tmp_path / f"rt.{fmt}")
    write(rd.from_arrow(t).repartition(3), out)
    back = read(out).to_pandas().sort_values("id").reset_index(drop=True)
    assert back["s"].tolist()[:3] == ["a,b\n", 'q"u', "żółć"]
    assert back["s"].isna().tolist() == [False, False, False, True]
    assert back["f"].tolist()[0] == 0.5 and np.isnan(back["f"][1])
    pruned = read(out, columns=["id"]).to_pandas()
    assert list(pruned.columns) == ["id"] and len(pruned) == 4
    # overwrite: old shards must not leak into the re-read
    write(rd.from_arrow(t.slice(0, 2)), out)
    assert len(read(out).to_pandas()) == 2


def test_count_min_sketch(ray_session):
    import pandas as pd
    import ray.data as rd

    from dedupe_ray.ops.sketch import (
        _cms_cols,
        cms_merge,
        cms_point_estimates,
        cms_table,
    )

    rng = np.random.RandomState(11)
    # zipf-ish skew with a guaranteed hot key, plus nulls (dropped)
    keys = np.concatenate(
        [
            rng.zipf(1.5, 4000) % 5000,
            np.full(500, 42),
        ]
    ).astype(np.int64)
    width, depth = 64, 3
    df = pd.DataFrame({"k": keys})
    ds = rd.from_pandas(df).repartition(7)
    sk = cms_table(ds, "k", width=width, depth=depth).to_pandas()
    assert len(sk) <= width * depth

    # reference grid built scalar-style from the same hash family
    grid = np.zeros((depth, width), np.int64)
    cols = _cms_cols(keys, width, depth)
    for r in range(depth):
        np.add.at(grid[r], cols[r], 1)
    got = np.zeros((depth, width), np.int64)
    got[sk["row"].to_numpy(), sk["col"].to_numpy()] = sk["c"].to_numpy()
    assert np.array_equal(got, grid)

    # point estimates: upper bound always holds; hot key is near-exact
    probe_keys = np.unique(keys)
    probe = rd.from_pandas(pd.DataFrame({"k": probe_keys}))
    est = (
        cms_point_estimates(
            cms_table(ds, "k", width=width, depth=depth),
            probe,
            "k",
            width=width,
            depth=depth,
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    true = pd.Series(keys).value_counts().sort_index()
    assert (est["est"].to_numpy() >= true.to_numpy()).all()
    # CMS overestimate for the hot key is bounded by the colliding tail
    hot_est = int(est.loc[est["k"] == 42, "est"].iloc[0])
    hot_true = int(true[42])
    assert hot_true <= hot_est <= hot_true + len(keys) // width

    # merge(two halves) == sketch(whole), cell-exact
    da = rd.from_pandas(pd.DataFrame({"k": keys[:2000]})).repartition(3)
    db = rd.from_pandas(pd.DataFrame({"k": keys[2000:]})).repartition(4)
    merged = cms_merge(
        cms_table(da, "k", width=width, depth=depth),
        cms_table(db, "k", width=width, depth=depth),
    ).to_pandas()
    m = np.zeros((depth, width), np.int64)
    m[merged["row"].to_numpy(), merged["col"].to_numpy()] = merged["c"].to_numpy()
    assert np.array_equal(m, grid)


def test_count_min_nulls_and_negatives(ray_session):
    import pandas as pd
    import ray.data as rd

    from dedupe_ray.ops.sketch import cms_table

    ds = rd.from_pandas(pd.DataFrame({"k": pd.array([1, None, 1, 7], dtype="Int64")}))
    sk = cms_table(ds, "k", width=16, depth=2).to_pandas()
    assert sk["c"].sum() == 3 * 2  # nulls dropped, 3 valid keys x depth

    with pytest.raises(Exception, match="non-negative"):
        cms_table(
            rd.from_pandas(pd.DataFrame({"k": [-1, 2]})), "k", width=16, depth=2
        ).materialize()


def test_lm_bigram_scores_brute_force(ray_session):
    import math

    import pandas as pd
    import ray.data as rd

    from dedupe_ray.ops.text import lm_bigram_scores

    docs = [
        "the cat sat on the mat",
        "the dog sat on the log",
        "the cat and the dog",
        "",            # zero tokens -> (0, 0)
        "zzz qqq zzz"  # mostly-unk garbage
    ]
    V = 4
    ds = rd.from_pandas(
        pd.DataFrame({"doc_id": [f"d{i}" for i in range(len(docs))], "text": docs})
    ).repartition(3)
    out = (
        lm_bigram_scores(ds, "text", "doc_id", vocab_size=V)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )

    # brute-force reference model
    toks = [[t for t in d.lower().split() if t] for d in docs]
    from collections import Counter

    uni = Counter(t for d in toks for t in d)
    ranked = sorted(uni, key=lambda t: (-uni[t], t))[:V]
    vid = {t: i + 1 for i, t in enumerate(ranked)}
    BOS = V + 1
    cb, ctx = Counter(), Counter()
    for d in toks:
        ids = [vid.get(t, 0) for t in d]
        for p, c in zip([BOS] + ids[:-1], ids):
            cb[(p, c)] += 1
            ctx[p] += 1
    for i, d in enumerate(toks):
        ids = [vid.get(t, 0) for t in d]
        lp = sum(
            math.floor(
                1000000.0 * math.log((cb[(p, c)] + 1.0) / (ctx[p] + (V + 1.0)))
            )
            for p, c in zip([BOS] + ids[:-1], ids)
        )
        row = out.loc[f"d{i}"]
        assert row["n_tokens"] == len(d)
        assert row["logprob_micro"] == lp

    # quality signal: per-token logprob of garbage < in-distribution text
    per_tok = out["logprob_micro"] / out["n_tokens"].clip(lower=1)
    assert per_tok.loc["d4"] < per_tok.loc["d0"]


def test_replicate_rows(ray_session):
    import pandas as pd
    import ray.data as rd

    from dedupe_ray.ops.tabular import replicate_rows

    ds = rd.from_pandas(
        pd.DataFrame({"id": ["a", "b", "c", "d"], "n": [2, 0, 3, 1]})
    ).repartition(2)
    out = (
        replicate_rows(ds, "n")
        .to_pandas()
        .sort_values(["id", "copy_idx"])
        .reset_index(drop=True)
    )
    assert out["id"].tolist() == ["a", "a", "c", "c", "c", "d"]  # n=0 dropped
    assert out["copy_idx"].tolist() == [0, 1, 0, 1, 2, 0]

    with pytest.raises(Exception, match="max_times"):
        replicate_rows(
            rd.from_pandas(pd.DataFrame({"id": [1], "n": [10]})), "n", max_times=5
        ).materialize()

    with pytest.raises(Exception, match="nulls"):
        replicate_rows(
            rd.from_pandas(pd.DataFrame({"id": [1], "n": pd.array([None], dtype="Int64")})),
            "n",
        ).materialize()


def test_inverted_index(ray_session):
    import pandas as pd
    import ray.data as rd

    from dedupe_ray.ops.text import inverted_index

    ds = rd.from_pandas(
        pd.DataFrame(
            {
                # ids 2 and 10: lexicographic order ("10" < "2") must hold
                "doc_id": [2, 10, 7],
                "text": ["cat cat dog", "Cat bird", "dog bird bird"],
            }
        )
    ).repartition(3)
    out = (
        inverted_index(ds, "text", "doc_id", min_df=2)
        .to_pandas()
        .sort_values("token")
        .reset_index(drop=True)
    )
    assert out["token"].tolist() == ["bird", "cat", "dog"]
    assert out["df"].tolist() == [2, 2, 2]
    assert out["postings"].tolist() == ["10,7", "10,2", "2,7"]


def test_funnel_steps_strict_order(ray_session):
    import pandas as pd
    import ray.data as rd

    from dedupe_ray.ops.tabular import funnel_steps

    T = pd.Timestamp
    rows = [
        # u1 completes: view@1, click@2 (the click@0 BEFORE view must not count), purchase@3
        (1, T("2024-01-01 00:00"), "click"),
        (1, T("2024-01-01 01:00"), "view"),
        (1, T("2024-01-01 02:00"), "click"),
        (1, T("2024-01-01 03:00"), "purchase"),
        # u2: click at the SAME ts as view — strict > blocks the funnel
        (2, T("2024-01-01 01:00"), "view"),
        (2, T("2024-01-01 01:00"), "click"),
        (2, T("2024-01-01 02:00"), "purchase"),
        # u3: never purchases
        (3, T("2024-01-01 01:00"), "view"),
        (3, T("2024-01-01 02:00"), "click"),
    ]
    df = pd.DataFrame(rows, columns=["user_id", "ts", "event_type"])
    ds = rd.from_pandas(df).repartition(3)
    out = funnel_steps(ds, ["view", "click", "purchase"]).to_pandas()
    assert out["user_id"].tolist() == [1]
    assert out["ts_view"].iloc[0] == T("2024-01-01 01:00")
    assert out["ts_click"].iloc[0] == T("2024-01-01 02:00")
    assert out["ts_purchase"].iloc[0] == T("2024-01-01 03:00")


def test_funnel_steps_brute_force_random(ray_session):
    import pandas as pd
    import ray.data as rd

    from dedupe_ray.ops.tabular import funnel_steps

    rng = np.random.RandomState(1234)
    n = 3000
    df = pd.DataFrame(
        {
            "user_id": rng.randint(0, 200, n),
            "ts": pd.Timestamp("2024-01-01")
            + pd.to_timedelta(rng.randint(0, 10_000, n), unit="s"),
            "event_type": rng.choice(["view", "click", "purchase", "other"], n),
        }
    )
    steps = ["view", "click", "purchase"]
    out = (
        funnel_steps(rd.from_pandas(df).repartition(7), steps)
        .to_pandas()
        .set_index("user_id")
        .sort_index()
    )

    # brute force: greedy-earliest per user over the time-sorted stream
    expect = {}
    for uid, g in df.sort_values("ts").groupby("user_id"):
        t_prev, stamps = None, []
        ok = True
        for s in steps:
            sub = g[(g.event_type == s) & ((g.ts > t_prev) if t_prev is not None else True)]
            if len(sub) == 0:
                ok = False
                break
            t_prev = sub["ts"].iloc[0]
            stamps.append(t_prev)
        if ok:
            expect[uid] = stamps
    assert sorted(expect) == out.index.tolist()
    for uid, (tv, tc, tp) in expect.items():
        row = out.loc[uid]
        assert (row["ts_view"], row["ts_click"], row["ts_purchase"]) == (tv, tc, tp)


def test_diff_snapshots(ray_session):
    import pandas as pd
    import ray.data as rd

    from dedupe_ray.ops.tabular import diff_snapshots

    old = rd.from_pandas(
        pd.DataFrame(
            {
                "k": [1, 2, 3, 4, 5],
                "v": ["a", "b", None, None, "e"],
            }
        )
    ).repartition(2)
    new = rd.from_pandas(
        pd.DataFrame(
            {
                "k": [1, 3, 4, 5, 6],
                "v": ["a", None, "now-set", "E", None],
            }
        )
    ).repartition(3)
    out = (
        diff_snapshots(old, new, "k", ["v"])
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert out["k"].tolist() == [1, 2, 3, 4, 5, 6]
    assert out["status"].tolist() == [
        "unchanged",  # same value
        "removed",
        "unchanged",  # both NULL counts as equal
        "changed",    # NULL -> value
        "changed",    # value edit
        "added",
    ]


def test_bpe_train_and_tokenize(ray_session):
    import pandas as pd
    import ray.data as rd

    from dedupe_ray.ops.text import bpe_tokenize, bpe_train

    # classic Sennrich toy corpus: "est</w>" becomes an early merge
    docs = ["low low low lower lower", "newest newest widest widest", "low"]
    ds = rd.from_pandas(
        pd.DataFrame({"doc_id": [1, 2, 3], "text": docs})
    ).repartition(2)
    merges = bpe_train(ds, n_merges=10, id_column="doc_id")
    assert merges, "expected at least one merge"
    assert ("e", "s") in merges and ("es", "t") in merges
    assert ("l", "o") in merges and ("lo", "w") in merges

    # layout invariance: merges identical under a different partitioning
    merges2 = bpe_train(ds.repartition(5), n_merges=10, id_column="doc_id")
    assert merges == merges2

    out = (
        bpe_tokenize(ds, merges)
        .to_pandas()
        .set_index("doc_id")["n_bpe_tokens"]
        .sort_index()
    )
    # with full merges "low</w>" collapses to 1 token; brute-check doc 3
    def brute(word, merges):
        sym = [*word, "</w>"]
        ranks = {m: i for i, m in enumerate(merges)}
        while len(sym) > 1:
            cands = [(ranks[p], i) for i, p in enumerate(zip(sym, sym[1:])) if p in ranks]
            if not cands:
                break
            _, i = min(cands)
            sym[i : i + 2] = [sym[i] + sym[i + 1]]
        return len(sym)

    assert out.loc[3] == brute("low", merges)
    exp1 = 3 * brute("low", merges) + 2 * brute("lower", merges)
    assert out.loc[1] == exp1


def test_cooccurrence_pairs(ray_session):
    import pandas as pd
    import ray.data as rd

    from dedupe_ray.ops.tabular import cooccurrence_pairs

    df = pd.DataFrame(
        {
            "g": [1, 1, 1, 1, 2, 2, 3, 3, 3, 4],
            #      duplicates within a group must not double-count
            "item": ["a", "b", "c", "a", "a", "b", "b", "c", "d", "a"],
        }
    )
    out = (
        cooccurrence_pairs(rd.from_pandas(df).repartition(4), "g", "item")
        .to_pandas()
        .sort_values(["item_a", "item_b"])
        .reset_index(drop=True)
    )
    got = {(r.item_a, r.item_b): r.n_groups for r in out.itertuples()}
    assert got == {
        ("a", "b"): 2,   # groups 1 and 2
        ("a", "c"): 1,   # group 1
        ("b", "c"): 2,   # groups 1 and 3
        ("b", "d"): 1,
        ("c", "d"): 1,
    }


def test_pagerank_micro_brute_force(ray_session):
    import pandas as pd
    import ray.data as rd

    from dedupe_ray.ops.graph import pagerank_micro

    # directed graph with a dangling-in node, a hub, and duplicate edges
    # (duplicates must collapse before outdeg)
    raw = [
        ("a", "b"), ("a", "b"),  # dup
        ("a", "c"),
        ("b", "c"),
        ("c", "a"),
        ("d", "a"),              # nothing points at d
    ]
    df = pd.DataFrame(raw, columns=["src", "dst"])
    out = (
        pagerank_micro(rd.from_pandas(df).repartition(3), iters=4)
        .to_pandas()
        .set_index("node")["pr"]
        .sort_index()
    )

    # brute force with identical integer arithmetic
    edges = sorted(set(raw))
    nodes = sorted({x for e in edges for x in e})
    outdeg = {n: sum(1 for s, _ in edges if s == n) for n in nodes}
    scale, base, d = 10**12, (15 * 10**12) // 100, 85
    pr = {n: scale for n in nodes}
    for _ in range(4):
        acc = {n: 0 for n in nodes}
        for s, t in edges:
            acc[t] += pr[s] // outdeg[s]
        pr = {n: base + (d * acc[n]) // 100 for n in nodes}
    assert out.to_dict() == pr
    # layout invariance is by construction (exact int64 sums) and is
    # additionally evidenced by the pagerank_parts oracle hash-matching
    # at three scales under different block layouts


def test_resample_ffill(ray_session):
    import pandas as pd
    import ray.data as rd

    from dedupe_ray.ops.tabular import resample_ffill

    T = pd.Timestamp
    df = pd.DataFrame(
        [
            # u1: events at 00:30 and 03:10 -> hourly grid 01:00..03:00
            (1, T("2024-01-01 00:30:00"), 10.0),
            (1, T("2024-01-01 03:10:00"), 20.0),
            # u1 duplicate-ts pair collapses to MAX before the fill
            (1, T("2024-01-01 00:30:00"), 7.0),
            # u2: single event EXACTLY on the grid -> one row, own value
            (2, T("2024-01-01 05:00:00"), 99.0),
            # u3: events within one step and not straddling a grid point
            (3, T("2024-01-01 06:10:00"), 1.0),
            (3, T("2024-01-01 06:50:00"), 2.0),
        ],
        columns=["user_id", "ts", "value"],
    )
    out = (
        resample_ffill(rd.from_pandas(df).repartition(3), every_seconds=3600)
        .to_pandas()
        .sort_values(["user_id", "ts"])
        .reset_index(drop=True)
    )
    u1 = out[out.user_id == 1]
    assert u1["ts"].tolist() == [
        T("2024-01-01 01:00:00"),
        T("2024-01-01 02:00:00"),
        T("2024-01-01 03:00:00"),
    ]
    assert u1["value"].tolist() == [10.0, 10.0, 10.0]
    u2 = out[out.user_id == 2]
    assert u2["ts"].tolist() == [T("2024-01-01 05:00:00")]
    assert u2["value"].tolist() == [99.0]
    assert len(out[out.user_id == 3]) == 0  # no grid point inside the span


def test_weighted_sample(ray_session):
    import pandas as pd
    import ray.data as rd

    from dedupe_ray.ops.sketch import _CMS_A, _CMS_B, _CMS_P
    from dedupe_ray.ops.tabular import weighted_sample

    rng = np.random.RandomState(5)
    df = pd.DataFrame(
        {
            "k": np.arange(2000, dtype=np.int64),
            "w": np.concatenate([rng.uniform(0.1, 1, 1000), rng.uniform(50, 100, 1000)]),
        }
    )
    df.loc[5, "w"] = 0.0      # excluded
    df.loc[6, "w"] = -3.0     # excluded
    out = (
        weighted_sample(rd.from_pandas(df).repartition(7), "k", "w", k=50)
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert len(out) == 50
    assert not {5, 6} & set(out["k"])

    # reference: full A-Res scan with the same pinned hash
    w = df["w"].to_numpy()
    keep = w > 0
    kk = df["k"].to_numpy()[keep]
    ww = w[keep]
    h = (_CMS_A[0] * (kk % _CMS_P) + _CMS_B[0]) % _CMS_P
    pri = np.log((h + 1.0) / 2147483648.0) / ww
    ref = kk[np.lexsort((kk, -pri))[:50]]
    assert sorted(ref.tolist()) == out["k"].tolist()

    # high-weight half should dominate the sample
    assert (out["k"] >= 1000).mean() > 0.9

    # parallelism invariance
    out2 = (
        weighted_sample(rd.from_pandas(df).repartition(1), "k", "w", k=50)
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert out2["k"].tolist() == out["k"].tolist()


def test_triangle_counts(ray_session):
    import pandas as pd
    import ray.data as rd

    from dedupe_ray.ops.graph import triangle_counts

    # K4 on a,b,c,d (every vertex in C(3,2)=3 triangles) plus a pendant
    # edge d-e and a disconnected pair f-g; duplicate + reversed edges
    # must collapse; self-loop must be ignored
    edges = [
        ("a", "b"), ("b", "a"),      # dup reversed
        ("a", "c"), ("a", "d"),
        ("b", "c"), ("b", "d"),
        ("c", "d"), ("c", "d"),      # dup
        ("d", "e"),
        ("f", "g"),
        ("e", "e"),                  # self-loop
    ]
    ds = rd.from_pandas(pd.DataFrame(edges, columns=["src", "dst"])).repartition(3)
    out = triangle_counts(ds).to_pandas().set_index("node")["n_tri"].sort_index()
    assert out.to_dict() == {"a": 3, "b": 3, "c": 3, "d": 3}


def test_avro_codec_pinned_bytes():
    """Hand-assembled Avro OCF decodes correctly (writer/reader bugs can't
    cancel), and the writer reproduces the hand bytes for the same rows."""
    import hashlib
    import json

    from dedupe_ray.avro_codec import decode_file, encode_table

    schema = json.dumps(
        {
            "type": "record",
            "name": "row",
            "fields": [
                {"name": "id", "type": ["null", "long"]},
                {"name": "s", "type": ["null", "string"]},
            ],
        },
        sort_keys=True,
    )
    sync = hashlib.md5(schema.encode()).digest()

    def vlong(n):  # zigzag varint, hand-rolled independently
        z = (n << 1) ^ (n >> 63) if n >= 0 else ((-n - 1) << 1 | 1)
        out = b""
        while True:
            b7 = z & 0x7F
            z >>= 7
            if z:
                out += bytes([b7 | 0x80])
            else:
                return out + bytes([b7])

    body = (
        vlong(1) + vlong(5)          # id = 5
        + vlong(1) + vlong(2) + "hi".encode()  # s = "hi"
        + vlong(1) + vlong(-3)       # id = -3 (zigzag negative)
        + vlong(0)                   # s = null
    )
    hand = (
        b"Obj\x01"
        + vlong(2)
        + vlong(len(b"avro.codec")) + b"avro.codec"
        + vlong(len(b"null")) + b"null"
        + vlong(len(b"avro.schema")) + b"avro.schema"
        + vlong(len(schema.encode())) + schema.encode()
        + vlong(0)
        + sync
        + vlong(2) + vlong(len(body)) + body + sync
    )
    t = decode_file(hand)
    assert t.column("id").to_pylist() == [5, -3]
    assert t.column("s").to_pylist() == ["hi", None]

    back = encode_table(t, codec="null")
    assert back == hand  # byte-identical round trip


def test_normalize_minmax(ray_session):
    import pandas as pd
    import ray.data as rd

    from dedupe_ray.ops.tabular import normalize_minmax

    df = pd.DataFrame(
        {
            "g": ["a", "a", "a", "b", "b", "c"],
            "v": [10.0, 20.0, 30.0, 5.0, 5.0, 7.0],
        }
    )
    out = (
        normalize_minmax(rd.from_pandas(df).repartition(3), "g", "v")
        .to_pandas()
        .sort_values(["g", "v"])
        .reset_index(drop=True)
    )
    a = out[out.g == "a"]["v_mm"].tolist()
    assert a == [0.0, 0.5, 1.0]
    # constant groups (including singletons) scale to NULL
    assert out[out.g == "b"]["v_mm"].isna().all()
    assert out[out.g == "c"]["v_mm"].isna().all()


def test_resample_interp(ray_session):
    import pandas as pd
    import ray.data as rd

    from dedupe_ray.ops.tabular import resample_interp

    T = pd.Timestamp
    df = pd.DataFrame(
        [
            (1, T("2024-01-01 00:00:00"), 0.0),   # exactly on the grid
            (1, T("2024-01-01 02:30:00"), 10.0),
            (1, T("2024-01-01 04:00:00"), 4.0),   # on grid again
        ],
        columns=["user_id", "ts", "value"],
    )
    out = (
        resample_interp(rd.from_pandas(df).repartition(2), every_seconds=3600)
        .to_pandas()
        .sort_values("ts")
        .reset_index(drop=True)
    )
    assert out["ts"].tolist() == [T(f"2024-01-01 0{h}:00:00") for h in range(5)]
    # 00:00 on-point 0.0; 01:00/02:00 lerp toward 10 over 2.5h; 03:00 lerp
    # back toward 4 over 1.5h; 04:00 on-point
    assert out["value"].tolist() == [0.0, 4.0, 8.0, 10.0 + (4.0 - 10.0) * (0.5 / 1.5), 4.0]


def test_containment_join_brute_force(ray_session):
    import itertools

    import pandas as pd
    import ray.data as rd

    from dedupe_ray.ops.dedup import containment_join

    docs = {
        "1": "the quick brown fox jumps over the lazy dog",
        "2": "quick brown fox",                      # fully inside 1
        "3": "brown fox jumps high above everything else entirely",
        "4": "completely different words here",
        "5": "",                                     # empty -> no pairs
    }
    ds = rd.from_pandas(
        pd.DataFrame({"doc_id": list(docs), "text": list(docs.values())})
    ).repartition(3)
    t = 0.6
    out = containment_join(ds, threshold=t).to_pandas()
    got = {(r.id_a, r.id_b): r.containment for r in out.itertuples()}

    sets = {k: set(v.lower().split()) for k, v in docs.items()}
    expect = {}
    for a, b in itertools.permutations(docs, 2):
        if sets[a] and sets[b]:
            c = len(sets[a] & sets[b]) * 1.0 / len(sets[a])
            if c >= t:
                expect[(a, b)] = c
    assert got == expect
    assert ("2", "1") in got and got[("2", "1")] == 1.0   # 2 fully contained
    assert ("1", "2") not in got                          # asymmetric


def test_kcore(ray_session):
    import pandas as pd
    import ray.data as rd

    from dedupe_ray.ops.graph import kcore

    # K4 core (a,b,c,d) + a chain of pendants that peels away in CASCADE:
    # e hangs off the core with extra leaves f,g — e has degree 3 at the
    # start but drops below 3 only AFTER f and g peel (2 rounds needed)
    edges = [
        ("a", "b"), ("a", "c"), ("a", "d"),
        ("b", "c"), ("b", "d"), ("c", "d"),
        ("d", "e"), ("e", "f"), ("e", "g"),
        ("f", "g"),
    ]
    ds = rd.from_pandas(pd.DataFrame(edges, columns=["src", "dst"])).repartition(3)
    out = kcore(ds, k=3).to_pandas().set_index("node")["degree"].sort_index()
    assert out.to_dict() == {"a": 3, "b": 3, "c": 3, "d": 3}

    # k larger than any degree -> empty, typed (schema survives emptiness)
    empty = kcore(ds, k=10)
    assert empty.count() == 0
    assert empty.schema().names == ["node", "degree"]


# ---------------------------------------------------------------------------
# line-level dedup / merge upsert / exact stats / kmeans (round-4 session 4)
# ---------------------------------------------------------------------------


def test_dedup_lines_brute_force(ray_session):
    """Engine output == a driver-side brute-force of the same contract
    (4-token lines, keep first (doc_id, line_no) occurrence, re-join),
    invariant under repartitioning."""
    from dedupe_ray.ops.dedup import dedup_lines

    rng = np.random.RandomState(7)
    vocab = ["a", "b", "c", "d"]
    docs = {}
    for i in range(60):
        n = rng.randint(1, 30)
        docs[i] = " ".join(rng.choice(vocab, n))
    # plant exact duplicate lines: doc 60 repeats doc 0's first line twice
    docs[60] = docs[0]  # full duplicate doc → should vanish entirely
    tbl = pa.table({"doc_id": list(docs), "text": list(docs.values())})

    def brute(w=4):
        seen = {}
        lines = []
        for did, t in docs.items():
            toks = t.split(" ")
            for ln in range((len(toks) + w - 1) // w):
                line = " ".join(toks[ln * w : ln * w + w])
                lines.append((did, ln, line))
                key = line
                if key not in seen or (did, ln) < seen[key]:
                    seen[key] = (did, ln)
        out = {}
        for did, ln, line in lines:
            if seen[line] == (did, ln):
                out.setdefault(did, []).append((ln, line))
        return {
            did: " ".join(l for _, l in sorted(v)) for did, v in out.items()
        }

    expect = brute()
    for parallelism in (1, 7):
        ds = rd.from_arrow(tbl).repartition(parallelism)
        got = dedup_lines(ds, "text", "doc_id", line_tokens=4).to_pandas()
        gmap = dict(zip(got["doc_id"], got["clean_text"]))
        assert gmap == expect
    # the full-duplicate doc lost every line
    assert 60 not in expect


def test_merge_upsert(ray_session):
    from dedupe_ray.ops.tabular import merge_upsert

    base = rd.from_arrow(
        pa.table({"k": [1, 2, 3], "name": ["a", "b", "c"], "v": [10, 20, 30]})
    )
    changes = rd.from_arrow(
        pa.table({"k": [2, 9], "name": ["B2", "NEW"], "v": [99, 7]})
    )
    out = (
        merge_upsert(base, changes, "k", ["name", "v"])
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert out["k"].tolist() == [1, 2, 3, 9]
    assert out["name"].tolist() == ["a", "B2", "c", "NEW"]
    assert out["v"].tolist() == [10, 99, 30, 7]


def test_grouped_skew_kurtosis(ray_session):
    """Exact-moment skew/kurt == direct numpy population formulas."""
    from dedupe_ray.ops.tabular import grouped_skew_kurtosis

    rng = np.random.RandomState(3)
    g = rng.choice(["x", "y"], 500)
    v = rng.randint(1, 50, 500).astype(np.int64)
    ds = rd.from_arrow(pa.table({"g": g, "v": v})).repartition(5)
    out = grouped_skew_kurtosis(ds, ["g"], "v").to_pandas().set_index("g")
    for grp in ("x", "y"):
        x = v[g == grp].astype(np.float64)
        m = x.mean()
        m2 = ((x - m) ** 2).mean()
        m3 = ((x - m) ** 3).mean()
        m4 = ((x - m) ** 4).mean()
        assert out.loc[grp, "skewness"] == pytest.approx(m3 / m2**1.5, rel=1e-9)
        assert out.loc[grp, "kurtosis"] == pytest.approx(m4 / m2**2 - 3.0, rel=1e-9)
        assert out.loc[grp, "n"] == len(x)


def test_spearman_corr(ray_session):
    """Histogram-path Spearman == pandas average-rank Pearson."""
    from dedupe_ray.ops.tabular import spearman_corr

    rng = np.random.RandomState(11)
    a = rng.randint(1, 8, 400).astype(np.int64)
    b = (a * 2 + rng.randint(0, 5, 400)).astype(np.int64)  # correlated + ties
    ds = rd.from_arrow(pa.table({"a": a, "b": b})).repartition(4)
    out = spearman_corr(ds, "a", "b").to_pandas()
    ra = pd.Series(a).rank(method="average")
    rb = pd.Series(b).rank(method="average")
    expect = np.corrcoef(ra, rb)[0, 1]
    assert out["rho"].iloc[0] == pytest.approx(expect, rel=1e-12)
    assert out["n"].iloc[0] == 400

    # constant column → NULL rho
    ds2 = rd.from_arrow(pa.table({"a": [1, 1, 1], "b": [1, 2, 3]}))
    out2 = spearman_corr(ds2, "a", "b").to_pandas()
    assert pd.isna(out2["rho"].iloc[0])


def test_kmeans_exact_assign(ray_session):
    """Assignments == a pure-python integer Lloyd reference, invariant
    across parallelism; two well-separated blobs recover their split."""
    from dedupe_ray.ops.embedding import kmeans_exact_assign

    rng = np.random.RandomState(5)
    blob_a = rng.normal(0.0, 0.05, (30, 8))
    blob_b = rng.normal(1.0, 0.05, (30, 8))
    vecs = np.vstack([blob_a, blob_b]).astype(np.float32)
    ids = np.arange(len(vecs))
    tbl = pa.table(
        {
            "vec_id": ids,
            "embedding": pa.array(
                [row.tolist() for row in vecs], pa.list_(pa.float32())
            ),
        }
    )

    def brute(k=2, iters=2, quantize=1_000_000):
        q = np.floor(vecs.astype(np.float64) * quantize + 0.5).astype(np.int64)
        cent = q[:k].copy()  # k smallest ids
        for _ in range(iters):
            d = ((q[:, None, :] - cent[None, :, :]) ** 2).sum(-1)
            a = d.argmin(1)
            for j in range(k):
                sel = q[a == j]
                if len(sel):
                    cent[j] = np.floor_divide(sel.sum(0), len(sel))
        d = ((q[:, None, :] - cent[None, :, :]) ** 2).sum(-1)
        a = d.argmin(1)
        return a, d[np.arange(len(q)), a]

    ea, ed = brute()
    for parallelism in (1, 6):
        ds = rd.from_arrow(tbl).repartition(parallelism)
        got = (
            kmeans_exact_assign(ds, k=2, iters=2)
            .to_pandas()
            .sort_values("vec_id")
            .reset_index(drop=True)
        )
        assert got["cluster"].to_numpy().tolist() == ea.tolist()
        assert got["dist"].to_numpy().tolist() == ed.tolist()
    # blob structure recovered: each blob lands in one cluster
    assert len(set(ea[:30])) == 1 and len(set(ea[30:])) == 1
    assert ea[0] != ea[30]


def test_grouped_rolling_median(ray_session):
    """Window median == pandas rolling(min_periods=1).median per group."""
    from dedupe_ray.ops.tabular import grouped_rolling_median

    rng = np.random.RandomState(9)
    n = 300
    key = rng.randint(0, 7, n).astype(np.int64)
    order = np.arange(n, dtype=np.int64)
    val = rng.randint(-50, 50, n).astype(np.int64)
    ds = rd.from_arrow(
        pa.table({"k": key, "o": order, "v": val})
    ).repartition(5)
    out = (
        grouped_rolling_median(ds, "k", ["o"], "v", window=4, out_column="med")
        .to_pandas()
        .sort_values(["k", "o"])
        .reset_index(drop=True)
    )
    df = pd.DataFrame({"k": key, "o": order, "v": val}).sort_values(["k", "o"])
    expect = (
        df.groupby("k")["v"].rolling(4, min_periods=1).median().reset_index(drop=True)
    )
    assert out["med"].tolist() == expect.tolist()


def test_grouped_twap(ray_session):
    """Hand-computed TWAP: weights are whole seconds to the next event;
    the last event carries no weight; single-event keys are omitted."""
    from dedupe_ray.ops.tabular import grouped_twap

    ts = pa.array(
        np.array(
            [0, 10_000_000, 40_000_000, 0, 2_500_000, 0],  # µs
            np.int64,
        ).view("datetime64[us]")
    )
    tbl = pa.table(
        {
            "k": pa.array([1, 1, 1, 2, 2, 3], pa.int64()),
            "ts": ts,
            "tie": pa.array([0, 1, 2, 3, 4, 5], pa.int64()),
            "c": pa.array([100, 200, 999, 40, 7, 5], pa.int64()),
        }
    )
    out = (
        grouped_twap(rd.from_arrow(tbl).repartition(3), "k", "ts", "tie", "c")
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    # key 1: 100·10 + 200·30 = 7000 over 40 s; key 2: 40·2 over 2 s
    # (2.5 s floor-divides to 2); key 3: single event → omitted
    assert out["k"].tolist() == [1, 2]
    assert out["num"].tolist() == [7000, 80]
    assert out["den"].tolist() == [40, 2]
    assert out["twap"].tolist() == [175.0, 40.0]


def test_mutual_information(ray_session):
    """Identical uniform columns → n·floor(1e6·ln k); independent uniform
    columns → exactly 0; invariant across parallelism."""
    import math

    from dedupe_ray.ops.tabular import mutual_information

    k, reps = 4, 100
    a = np.repeat(np.arange(k), reps)
    for parallelism in (1, 6):
        ds = rd.from_arrow(
            pa.table({"a": a.astype(str), "b": a.astype(str)})
        ).repartition(parallelism)
        out = mutual_information(ds, "a", "b").to_pandas()
        n = k * reps
        assert out["n"].iloc[0] == n
        assert out["mi_micro"].iloc[0] == n * math.floor(1e6 * math.log(k))

    # independent: every (a,b) cell has the same count → each term ln(1)=0
    b2 = np.tile(np.arange(k), reps)
    ds2 = rd.from_arrow(pa.table({"a": a.astype(str), "b": b2.astype(str)}))
    out2 = mutual_information(ds2, "a", "b").to_pandas()
    assert out2["mi_micro"].iloc[0] == 0


def test_cohort_retention(ray_session):
    """Hand-built cohort table: two users starting on different days."""
    from dedupe_ray.ops.tabular import cohort_retention

    day = 86_400_000_000  # µs
    ts = pa.array(
        np.array(
            [0, day, day * 3, day, day * 2, day, day],  # u1: d0,d1,d3; u2: d1,d2; u3: d1 twice
            np.int64,
        ).view("datetime64[us]")
    )
    tbl = pa.table(
        {"user_id": pa.array([1, 1, 1, 2, 2, 3, 3], pa.int64()), "ts": ts}
    )
    out = (
        cohort_retention(rd.from_arrow(tbl).repartition(3), "user_id", "ts")
        .to_pandas()
        .sort_values(["cohort_day", "day_offset"])
        .reset_index(drop=True)
    )
    # cohort 0 (u1): offsets 0,1,3 → 1 user each
    # cohort 1 (u2,u3): offset 0 → 2 users; offset 1 → 1 user (u2);
    # u3's duplicate same-day event collapses
    expect = [(0, 0, 1), (0, 1, 1), (0, 3, 1), (1, 0, 2), (1, 1, 1)]
    got = list(zip(out["cohort_day"], out["day_offset"], out["n_users"]))
    assert got == expect


def test_scd2_history_null_collapse(ray_session):
    """Null-aware change detection: null→null is NO change; null→value and
    value→null are changes; consecutive duplicates collapse; the open tail
    carries valid_to NULL + is_current."""
    from dedupe_ray.ops.tabular import scd2_history

    ts = pa.array(np.arange(6, dtype=np.int64).view("datetime64[us]"))
    tbl = pa.table(
        {
            "k": pa.array([1, 1, 1, 1, 1, 2], pa.int64()),
            "ts": ts,
            "eid": pa.array([0, 1, 2, 3, 4, 5], pa.int64()),
            "state": pa.array(["a", "a", None, None, "b", "x"]),
        }
    )
    out = (
        scd2_history(
            rd.from_arrow(tbl).repartition(3), "k", "ts", "state",
            tiebreak_columns=["eid"],
        )
        .to_pandas()
        .sort_values(["k", "valid_from"])
        .reset_index(drop=True)
    )
    got = [
        (r.k, None if pd.isna(r.state) else r.state,
         int(r.valid_from.value // 1000),
         None if pd.isna(r.valid_to) else int(r.valid_to.value // 1000),
         bool(r.is_current))
        for r in out.itertuples()
    ]
    assert got == [
        (1, "a", 0, 2, False),
        (1, None, 2, 4, False),
        (1, "b", 4, None, True),
        (2, "x", 5, None, True),
    ]


def test_transition_counts_basic(ray_session):
    from dedupe_ray.ops.tabular import transition_counts

    ts = pa.array(np.arange(7, dtype=np.int64).view("datetime64[us]"))
    tbl = pa.table(
        {
            "k": pa.array([1, 1, 1, 1, 2, 2, 3], pa.int64()),
            "ts": ts,
            "eid": pa.array(list(range(7)), pa.int64()),
            "state": pa.array(["a", "b", "a", "b", "a", "b", "z"]),
        }
    )
    out = (
        transition_counts(
            rd.from_arrow(tbl).repartition(4), "k", ["ts", "eid"], "state",
            prev_column="prev", count_column="n",
        )
        .to_pandas()
        .sort_values(["prev", "state"])
        .reset_index(drop=True)
    )
    got = list(zip(out["prev"], out["state"], out["n"]))
    assert got == [("a", "b", 3), ("b", "a", 1)]


def test_label_propagation_brute_force(ray_session):
    """Engine LPA == a scalar reference implementing the same rules
    (sync rounds, neighbor-label mode, ties to min label), across two
    block layouts."""
    from dedupe_ray.ops.graph import label_propagation

    rng = np.random.RandomState(7)
    n = 40
    edges = set()
    for _ in range(90):
        a, b = rng.randint(0, n, 2)
        if a != b:
            edges.add((min(a, b), max(a, b)))
    edges = sorted(edges)

    # scalar reference
    adj: dict = {}
    for a, b in edges:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    labels = {v: v for v in adj}
    for _ in range(3):
        nxt = {}
        for v, nbrs in adj.items():
            counts: dict = {}
            for u in nbrs:
                counts[labels[u]] = counts.get(labels[u], 0) + 1
            nxt[v] = min(
                counts, key=lambda lab: (-counts[lab], lab)
            )
        labels = nxt

    tbl = pa.table(
        {
            "src": pa.array([a for a, _ in edges], pa.int64()),
            "dst": pa.array([b for _, b in edges], pa.int64()),
        }
    )
    for parts in (2, 7):
        out = (
            label_propagation(rd.from_arrow(tbl).repartition(parts), iters=3)
            .to_pandas()
            .sort_values("node")
        )
        got = dict(zip(out["node"], out["label"]))
        assert got == labels


def test_k_anonymize_suppress(ray_session):
    """Rows in QI groups smaller than k are dropped; NULL QI values group
    together (SQL PARTITION BY semantics)."""
    from dedupe_ray.ops.tabular import k_anonymize_suppress

    tbl = pa.table(
        {
            "id": pa.array(list(range(7)), pa.int64()),
            "nat": pa.array([1, 1, 1, 2, None, None, 2], pa.int64()),
            "seg": pa.array(["a", "a", "a", "a", "b", "b", "b"]),
        }
    )
    out = (
        k_anonymize_suppress(
            rd.from_arrow(tbl).repartition(3), ["nat", "seg"], k=2
        )
        .to_pandas()
        .sort_values("id")
    )
    # (1,a)×3 survives; (2,a)×1 and (2,b)×1 drop; (NULL,b)×2 survives
    assert list(out["id"]) == [0, 1, 2, 4, 5]


def test_canonicalize_urls_edge_cases(ray_session):
    from dedupe_ray.ops.text import canonicalize_urls

    raw = [
        "HTTPS://WWW.Ex.COM:443/a/?utm_source=m&ref=1#f",
        "https://ex.com/a/?ref=1",
        "http://Ex.com:80/",                 # default port + root slash
        "https://ex.com/p?utm_a=1",          # query becomes empty
        "https://ex.com/p?fbclid=xyz&id=2",  # fbclid dropped, id kept
        "not a url",                         # passthrough
        None,
    ]
    out = (
        canonicalize_urls(
            rd.from_arrow(pa.table({"url": pa.array(raw, pa.string())})),
            "url",
        )
        .to_pandas()["canonical_url"]
        .tolist()
    )
    assert out[:6] == [
        "https://ex.com/a/?ref=1",
        "https://ex.com/a/?ref=1",
        "http://ex.com",
        "https://ex.com/p",
        "https://ex.com/p?id=2",
        "not a url",
    ]
    assert out[6] is None or (isinstance(out[6], float) and np.isnan(out[6]))


def test_rrf_fuse_exact(ray_session):
    """Hand-computed RRF: ids in both rankings sum contributions; cut
    ties break by id ascending."""
    from dedupe_ray.ops.text import rrf_fuse

    a = rd.from_arrow(
        pa.table({"id": pa.array([7, 3, 9], pa.int64()),
                  "rnk": pa.array([1, 2, 3], pa.int64())})
    )
    b = rd.from_arrow(
        pa.table({"id": pa.array([3, 5], pa.int64()),
                  "rnk": pa.array([1, 2], pa.int64())})
    )
    out = rrf_fuse([a, b], "id", "rnk", k=60, top_n=3).to_pandas()
    got = list(zip(out["id"], out["rrf_nano"]))
    n = 10**9
    assert got == [
        (3, n // 62 + n // 61),  # both rankings
        (7, n // 61),
        (5, n // 62),  # 9 scores n // 63 and falls off the top-3
    ]


def _ppm_from_array(img: np.ndarray) -> bytes:
    h, w = img.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + img.astype(np.uint8).tobytes()


def test_dhash_and_image_near_dup(ray_session):
    """dHash is stable under mild noise and scaling, far apart for
    different content; image_near_dup_pairs recovers exactly the planted
    near-identical pair through decode → hash → banded Hamming LSH."""
    from dedupe_ray.ops.multimodal import dhash64, image_near_dup_pairs

    rng = np.random.RandomState(3)
    yy, xx = np.mgrid[0:32, 0:32]
    base = np.stack(
        [(yy * 8) % 256, (xx * 8) % 256, ((yy + xx) * 4) % 256], axis=2
    ).astype(np.uint8)
    noisy = base.astype(np.int16)
    mask = rng.rand(32, 32) < 0.05
    noisy[mask] += rng.randint(-2, 3, mask.sum())[:, None]
    noisy = np.clip(noisy, 0, 255).astype(np.uint8)
    other = np.stack(
        [(xx * 13) % 256, (255 - yy * 5) % 256, (yy * xx) % 256], axis=2
    ).astype(np.uint8)

    h_base, h_noisy, h_other = dhash64(base), dhash64(noisy), dhash64(other)
    ham = lambda a, b: bin(a ^ b).count("1")  # noqa: E731
    assert ham(h_base, h_noisy) <= 6
    assert ham(h_base, h_other) > 10
    # scale invariance: the same content at 2x size hashes nearby
    big = np.repeat(np.repeat(base, 2, axis=0), 2, axis=1)
    assert ham(h_base, dhash64(big)) <= 4

    tbl = pa.table(
        {
            "doc_id": pa.array(["a", "b", "c"]),
            "payload": pa.array(
                [_ppm_from_array(base), _ppm_from_array(noisy), _ppm_from_array(other)],
                pa.binary(),
            ),
        }
    )
    pairs = (
        image_near_dup_pairs(rd.from_arrow(tbl).repartition(2), max_hamming=6)
        .to_pandas()
        .sort_values(["id_a", "id_b"])
    )
    assert list(zip(pairs["id_a"], pairs["id_b"])) == [("a", "b")]


def test_frequent_items_exact_truncating_regime(ray_session):
    """Exact heavy hitters under forced per-batch truncation: a skewed
    corpus (few heavy values + a long unique tail) with capacity far
    below per-batch distinct count still yields the exact > phi set,
    identical across layouts; the capacity/phi recall guard raises."""
    import pytest as _pytest

    from dedupe_ray.ops.sketch import frequent_items_exact

    rng = np.random.RandomState(11)
    heavy = np.repeat(["aa", "bb", "cc"], [400, 300, 200])
    tail = np.array([f"t{i}" for i in range(1100)], object)
    vals = np.concatenate([heavy, tail])
    vals = vals[rng.permutation(len(vals))]
    n = len(vals)  # 2000

    import collections

    cnt = collections.Counter(vals.tolist())
    expect = sorted(
        ((v, c) for v, c in cnt.items() if c * 10000 > 500 * n),
        key=lambda x: (-x[1], x[0]),
    )

    for parts in (2, 5):
        ds = rd.from_arrow(
            pa.table({"v": pa.array(vals.tolist())})
        ).repartition(parts)
        out = frequent_items_exact(ds, "v", phi_bp=500, capacity=32)
        got = list(zip(out.column("value").to_pylist(),
                       out.column("n").to_pylist()))
        assert got == expect

    with _pytest.raises(ValueError):
        frequent_items_exact(
            rd.from_arrow(pa.table({"v": ["x"]})), "v", phi_bp=100,
            capacity=16,
        )


def test_equidepth_bucketize(ray_session):
    """Quartile buckets match a brute-force sort; boundary ties take the
    lower bucket; nulls stay null; forced multi-round refinement path."""
    from dedupe_ray.ops.tabular import equidepth_bucketize

    rng = np.random.RandomState(5)
    v = rng.randint(0, 50, 400).astype(np.float64)  # heavy ties
    v[7] = np.nan  # numpy nan is a VALUE; use arrow null instead below
    vals = pa.array(
        [None if i == 7 else float(x) for i, x in enumerate(v)], pa.float64()
    )
    tbl = pa.table({"id": pa.array(list(range(400)), pa.int64()), "v": vals})
    out = (
        equidepth_bucketize(
            rd.from_arrow(tbl).repartition(3), "v", k=4,
            bins=16, collect_limit=20,  # force the refine rounds
        )
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    clean = np.sort(np.asarray([x for i, x in enumerate(v) if i != 7]))
    n = len(clean)
    bounds = [clean[int(np.floor((n - 1) * q))] for q in (0.25, 0.5, 0.75)]
    for i, row in out.iterrows():
        if i == 7:
            assert pd.isna(row["bucket"])
            continue
        expect = sum(v[i] > b for b in bounds)
        assert row["bucket"] == expect, (i, v[i], row["bucket"], expect)


def test_zorder_key(ray_session):
    """Bit-interleave matches a scalar reference; locality property holds
    (nearby points share high bits); out-of-range raises."""
    import pytest as _pytest

    from dedupe_ray.ops.tabular import zorder_key

    def ref(x, y, bits=16):
        z = 0
        for b in range(bits):
            z |= ((x >> b) & 1) << (2 * b)
            z |= ((y >> b) & 1) << (2 * b + 1)
        return z

    rng = np.random.RandomState(2)
    xs = rng.randint(0, 1 << 16, 200)
    ys = rng.randint(0, 1 << 16, 200)
    tbl = pa.table(
        {"x": pa.array(xs, pa.int64()), "y": pa.array(ys, pa.int64())}
    )
    out = zorder_key(rd.from_arrow(tbl), "x", "y", bits=16).to_pandas()
    assert all(
        z == ref(int(x), int(y))
        for x, y, z in zip(out["x"], out["y"], out["zkey"])
    )
    # locality: the 2x2 cell (x//2, y//2) is contiguous in z
    assert ref(4, 6) // 4 == ref(5, 7) // 4

    bad = rd.from_arrow(pa.table({"x": pa.array([1 << 16], pa.int64()),
                                  "y": pa.array([0], pa.int64())}))
    with _pytest.raises(Exception):
        zorder_key(bad, "x", "y", bits=16).materialize()


def test_interval_overlap_self_join(ray_session):
    """Random intervals vs brute force, across layouts; long intervals
    spanning many cells dedupe to exactly one emission per pair."""
    from dedupe_ray.joins import interval_overlap_self_join

    rng = np.random.RandomState(9)
    n = 120
    s = rng.randint(0, 10_000, n).astype(np.int64)
    e = s + rng.randint(0, 3_000, n)
    e[:5] = s[:5] + 9_000  # long intervals: many-cell replication
    ids = np.arange(n, dtype=np.int64)

    expect = sorted(
        (int(ids[i]), int(ids[j]))
        for i in range(n)
        for j in range(i + 1, n)
        if s[i] <= e[j] and s[j] <= e[i]
    )
    tbl = pa.table({"id": pa.array(ids), "s": pa.array(s), "e": pa.array(e)})
    for parts in (2, 6):
        out = (
            interval_overlap_self_join(
                rd.from_arrow(tbl).repartition(parts), "id", "s", "e",
                cell=1000,
            )
            .to_pandas()
            .sort_values(["id_a", "id_b"])
        )
        assert list(zip(out["id_a"], out["id_b"])) == expect


def test_fold_accents(ray_session):
    from dedupe_ray.ops.text import fold_accents

    raw = ["café NÉE", "Łódź", "ệạự", "plain", None]
    out = (
        fold_accents(
            rd.from_arrow(pa.table({"text": pa.array(raw, pa.string())}))
        )
        .to_pandas()["folded"]
        .tolist()
    )
    assert out[:4] == ["cafe NEE", "Łodz", "eau", "plain"]
    assert out[4] is None


def test_validate_rules(ray_session):
    """Each rule kind counts its violations: nulls, out-of-range
    (null-safe), regex non-matches, and duplicate excess — across block
    layouts."""
    from dedupe_ray.ops.tabular import validate_rules

    tbl = pa.table(
        {
            "id": pa.array([1, 1, 2, 2, 2, 3, None], pa.int64()),
            "v": pa.array([0.5, -1.0, 2.0, None, 99.0, 1.0, 1.0]),
            "s": pa.array(["ab1", "zz", "ab22", None, "ab3", "x", "ab4"]),
        }
    )
    rules = [
        ("not_null", "s"),
        ("in_range", "v", 0, 10),
        ("matches", "s", "ab[0-9]+"),
        ("unique", "id"),
    ]
    for parts in (1, 4):
        out = (
            validate_rules(rd.from_arrow(tbl).repartition(parts), rules)
            .to_pandas()
            .sort_values("rule")
        )
        got = dict(zip(out["rule"], out["violations"]))
        assert got == {
            "not_null:s": 1,
            "in_range:v:0:10": 2,          # -1.0 and 99.0; null skipped
            "matches:s:ab[0-9]+": 2,       # "zz", "x"; null skipped
            "unique:id": 3,                # 1×2→1, 2×3→2; null group has 1
        }


def test_rolling_active_users(ray_session):
    """Hand-built WAU: merged runs, window re-entry, mid-run grid days,
    across layouts; brute-force reference."""
    from dedupe_ray.ops.tabular import rolling_active_users

    day = 86_400_000_000
    # u1 active d0,d1,d9; u2 active d1; u3 active d8,d9
    rows = [(1, 0), (1, 1), (1, 9), (2, 1), (3, 8), (3, 9), (1, 0)]
    ts = pa.array(
        np.array([d * day for _, d in rows], np.int64).view("datetime64[us]")
    )
    tbl = pa.table(
        {"user_id": pa.array([u for u, _ in rows], pa.int64()), "ts": ts}
    )
    active = {}
    for u, d in rows:
        active.setdefault(u, set()).add(d)
    grid = sorted({d for _, d in rows})
    expect = [
        (g, sum(1 for u, ds_ in active.items()
                if any(g - 6 <= d <= g for d in ds_)))
        for g in grid
    ]
    for parts in (1, 3):
        out = rolling_active_users(
            rd.from_arrow(tbl).repartition(parts), "user_id", "ts", 7
        ).to_pandas()
        assert list(zip(out["day"], out["active_users"])) == expect


def test_kmv_sketch_merge_equals_union(ray_session):
    from dedupe_ray.ops.sketch import (
        kmv_group_estimate,
        kmv_group_sketch,
        kmv_hash,
    )

    rng = np.random.RandomState(7)
    a = pa.table(
        {
            "g": pa.array(["x"] * 300 + ["y"] * 50),
            "v": pa.array(rng.randint(0, 200, 350).astype(np.int64)),
        }
    )
    b = pa.table(
        {
            "g": pa.array(["x"] * 300 + ["y"] * 20),
            "v": pa.array(rng.randint(100, 400, 320).astype(np.int64)),
        }
    )
    k = 16
    # sketch of the union == merge (bottom-k of unioned sketch rows)
    direct = kmv_group_sketch(
        rd.from_arrow(a).union(rd.from_arrow(b)), "g", "v", k=k
    ).to_pandas()
    import pandas as pd_

    ha = kmv_group_sketch(rd.from_arrow(a), "g", "v", k=k).to_pandas()
    hb = kmv_group_sketch(rd.from_arrow(b), "g", "v", k=k).to_pandas()
    man = (
        pd_.concat([ha, hb])
        .drop_duplicates(["g", "hval"])
        .sort_values(["g", "hval"])
        .groupby("g")
        .head(k)
        .reset_index(drop=True)
    )
    man["rnk"] = man.groupby("g").cumcount() + 1
    lhs = direct.sort_values(["g", "rnk"]).reset_index(drop=True)
    rhs = man[["g", "rnk", "hval"]].sort_values(["g", "rnk"]).reset_index(drop=True)
    pd_.testing.assert_frame_equal(lhs, rhs)

    # unsaturated group estimate is exact
    est = kmv_group_estimate(
        kmv_group_sketch(rd.from_arrow(a), "g", "v", k=64), "g", k=64
    ).to_pandas()
    y = est[est.g == "y"].iloc[0]
    n_true = len(set(kmv_hash(a.filter(pa.compute.equal(a["g"], "y"))["v"].to_numpy())))
    assert y.n_kept == n_true and y.est_distinct == float(n_true)


def test_mmr_diversify_prefers_diverse(ray_session):
    from dedupe_ray.ops.embedding import mmr_diversify

    # 3 near-identical vectors close to the query + 1 orthogonal-ish one;
    # corpus norms exceed the query norm so the λ=1/2 raw-dot penalty
    # rel−maxsim actually bites (with q equal to a corpus vector the
    # scores all tie at 0). Plain top-2 picks two clones; MMR must pick
    # the diverse vector 2nd.
    vecs = np.array(
        [
            [1.8, 0.2, 0.0],
            [1.79, 0.22, 0.0],
            [1.78, 0.24, 0.0],
            [0.2, 1.8, 0.0],
        ],
        np.float32,
    )
    ds = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(np.arange(4, dtype=np.int64)),
                "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
            }
        )
    )
    out = mmr_diversify(ds, np.array([1.0, 0.0, 0.0], np.float32), k=2, pool=4)
    got = out.column("vec_id").to_pylist()
    assert got[0] == 0
    assert got[1] == 3  # rel−maxsim: clones are punished by sim to pick 0

    # deterministic across block layouts
    out2 = mmr_diversify(
        ds.repartition(4), np.array([1.0, 0.0, 0.0], np.float32), k=2, pool=4
    )
    assert out2.column("vec_id").to_pylist() == got


def test_curate_documents_layout_invariant(ray_session):
    from dedupe_ray.curation import curate_documents, curation_funnel

    texts = [
        "the quick brown fox jumps over the lazy dog",   # survives
        "The  quick brown fox jumps over the lazy dog ", # dedup loser (norm)
        "a a a a a a a a",                               # dup-token gate
        "short one",                                     # min_tokens gate
        "benchmark shared gram one two three four five", # contaminated
        "one two three four five shared with benchmark", # contaminated
        "totally novel content nothing shared here ok",  # survives
    ]
    docs = pa.table(
        {
            "doc_id": pa.array(np.arange(1, 8, dtype=np.int64)),
            "text": pa.array(texts),
            "lang": pa.array(["en", "en", "en", "en", "en", "en", "zh"]),
            "source": pa.array(["s"] * 7),
        }
    )
    bench = pa.table(
        {
            "doc_id": pa.array([100], pa.int64()),
            "text": pa.array(["zzz one two three four five zzz"]),
            "lang": pa.array(["en"]),
            "source": pa.array(["b"]),
        }
    )
    out = curate_documents(
        rd.from_arrow(docs), rd.from_arrow(bench)
    ).to_pandas().sort_values("doc_id").reset_index(drop=True)
    # doc 7 fails lang, 3 fails dup-token, 4 fails min_tokens, 2 loses
    # dedup to 1 after whitespace/case normalization, 5 & 6 share the
    # 5-gram "one two three four five" with the benchmark
    assert out.doc_id.tolist() == [1]
    out2 = curate_documents(
        rd.from_arrow(docs).repartition(5), rd.from_arrow(bench)
    ).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert out2.doc_id.tolist() == out.doc_id.tolist()

    fun = curation_funnel(rd.from_arrow(docs), rd.from_arrow(bench)).to_pandas()
    assert dict(zip(fun.stage, fun.n)) == {
        "input": 7, "lang": 6, "quality": 4, "dedup": 3, "decontaminated": 1
    }


def test_bfs_hops_distances(ray_session):
    from dedupe_ray.ops.graph import bfs_hops

    # path graph 0-1-2-3-4-5 plus isolated edge 8-9; seeds {0}
    e = pa.table(
        {
            "src": pa.array([0, 1, 2, 3, 4, 8], pa.int64()),
            "dst": pa.array([1, 2, 3, 4, 5, 9], pa.int64()),
        }
    )
    seeds = pa.table({"node": pa.array([0], pa.int64())})
    out = (
        bfs_hops(rd.from_arrow(e), rd.from_arrow(seeds), iters=3)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    # 3 rounds reach nodes 0..3; 4,5 and the 8-9 component stay absent
    assert dict(zip(out.node, out.dist)) == {0: 0, 1: 1, 2: 2, 3: 3}
    # layout invariance
    ds2 = bfs_hops(rd.from_arrow(e).repartition(4), rd.from_arrow(seeds), iters=3)
    out2 = ds2.to_pandas().sort_values("node").reset_index(drop=True)
    assert out2.equals(out)
    # block-explosion regression guard: the per-round repartition keeps the
    # reached table's physical fan-out bounded across rounds
    assert ds2.num_blocks() <= 16


def test_blocking_quality_hand_computed(ray_session):
    from dedupe_ray.eval import blocking_quality

    # 6 records: blocks {a: 1,2,3}, {b: 4,5,6}; truth {x: 1,2}, {y: 3,4}, {z: 5,6}
    t = pa.table(
        {
            "blk": pa.array(["a", "a", "a", "b", "b", "b"]),
            "grp": pa.array(["x", "x", "y", "y", "z", "z"]),
        }
    )
    out = blocking_quality(rd.from_arrow(t), "blk", "grp").to_pandas().iloc[0]
    # cand = 2*C(3,2)=6; truth = 3*C(2,2)=3; hits: (a,x)=1, (b,z)=1 -> 2
    assert out.n_records == 6 and out.total_pairs == 15
    assert out.cand_pairs == 6 and out.true_pairs == 3 and out.hit_pairs == 2
    assert out.reduction_ratio == 1.0 - 6.0 / 15.0
    assert out.pairs_completeness == 2.0 / 3.0
    assert out.pairs_quality == 2.0 / 6.0


def test_npz_roundtrip_bitexact(ray_session, tmp_path):
    from dedupe_ray.sources import read_npz, write_npz

    rng = np.random.RandomState(3)
    mat = rng.randn(37, 8).astype(np.float32)
    ds = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(np.arange(37, dtype=np.int64)),
                "embedding": pa.array(list(mat), pa.list_(pa.float32())),
            }
        )
    ).repartition(3)
    out = str(tmp_path / "emb_npz")
    write_npz(ds, out)
    back = read_npz(out).to_pandas().sort_values("vec_id").reset_index(drop=True)
    got = np.stack(back.embedding.to_numpy())
    assert got.dtype == np.float32 and np.array_equal(got, mat)


def test_flesch_scores_edges(ray_session):
    from dedupe_ray.ops.text import flesch_scores

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": pa.array(
                [
                    "The cat sat. The dog ran!",  # 6 words, 2 sentences
                    "",                            # empty -> all floors at 1
                    "zzz zzz",                     # no vowels, no sentences
                    None,                          # null text
                ]
            ),
        }
    )
    out = (
        flesch_scores(rd.from_arrow(t))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    r1 = out.iloc[0]
    assert r1.n_words == 6 and r1.n_sentences == 2
    # "The cat sat The dog ran" vowel groups: e,a,a,e,o,a -> 6
    assert r1.n_syllables == 6
    assert r1.flesch == 206.835 - 1.015 * (6.0 / 2.0) - 84.6 * (6.0 / 6.0)
    assert (out.iloc[1][["n_words", "n_sentences", "n_syllables"]] == 1).all()
    assert out.iloc[2].n_words == 2 and out.iloc[2].n_syllables == 1
    assert (out.iloc[3][["n_words", "n_sentences", "n_syllables"]] == 1).all()


def test_pq_adc_matches_brute_force_on_separated_clusters(ray_session):
    """PQ with well-separated per-subspace clusters: codes identify the
    cluster in every subspace, and ADC top-k ordering matches the exact
    integer top-k (quantization error ≪ cluster separation)."""
    import ray.data

    from dedupe_ray.ops.embedding import pq_encode, pq_search, pq_train

    rng = np.random.default_rng(7)
    m, dsub, k = 2, 4, 2
    dim = m * dsub
    # two centers per subspace, far apart; 40 vectors pick a center per
    # subspace independently and jitter slightly
    centers = np.array([[0.0] * dsub, [10.0] * dsub])
    picks = rng.integers(0, 2, size=(40, m))
    vecs = np.concatenate(
        [centers[picks[:, s]] + rng.normal(0, 0.01, (40, dsub)) for s in range(m)],
        axis=1,
    )
    # the 2 smallest ids must cover both codewords per subspace: pin rows 0/1
    vecs[0] = 0.0
    vecs[1] = 10.0
    picks[0] = 0
    picks[1] = 1
    ds = ray.data.from_pandas(
        pd.DataFrame({"vec_id": np.arange(40), "embedding": [v.tolist() for v in vecs]})
    ).repartition(4)

    cbs = pq_train(ds, m=m, k=k, iters=2, quantize=1_000_000)
    assert cbs.shape == (m, k, dsub)

    codes = pq_encode(ds, cbs, quantize=1_000_000).to_pandas().sort_values("vec_id")
    # each subspace's code equals the planted center pick (up to a fixed
    # relabeling per subspace — seeds are rows 0/1, so code==pick exactly)
    for s in range(m):
        assert (codes[f"code_{s}"].to_numpy() == picks[:, s]).all()

    q = np.floor(vecs[:3] * 1_000_000 + 0.5).astype(np.int64)
    out = pq_search(codes_ds=pq_encode(ds, cbs), codebooks=cbs,
                    query_vectors_quantized=q, k=5).to_pandas()
    assert len(out) == 15
    assert list(out.columns) == ["query_id", "vec_id", "adc_dist", "rnk"]
    # brute-force ADC on the driver must agree exactly
    qv = np.floor(vecs * 1_000_000 + 0.5).astype(np.int64)
    cds = codes[[f"code_{s}" for s in range(m)]].to_numpy()
    for j in range(3):
        lut = np.stack(
            [
                ((q[j, s * dsub:(s + 1) * dsub][None, :] - cbs[s]) ** 2).sum(axis=1)
                for s in range(m)
            ]
        )  # [m, k]
        dist = lut[np.arange(m)[None, :], cds].sum(axis=1)
        order = np.lexsort((np.arange(40), dist))[:5]
        got = out[out["query_id"] == j].sort_values("rnk")
        assert got["vec_id"].tolist() == order.tolist()
        assert got["adc_dist"].tolist() == dist[order].tolist()


def test_grouped_entropy_hand_computed_and_layout_invariant(ray_session):
    """grouped_entropy: hand-computed micro-nat sums on a tiny fixture
    (uniform 2-value group, single-value group, skewed 3/1 group), and
    byte-identical output at 1 vs 8 blocks."""
    import math

    import ray.data

    from dedupe_ray.ops.tabular import grouped_entropy

    df = pd.DataFrame(
        {
            "g": ["a", "a", "a", "a", "b", "b", "c", "c", "c", "c"],
            "v": ["x", "x", "y", "y", "x", "x", "x", "x", "x", "y"],
        }
    )
    outs = []
    for nparts in (1, 8):
        ds = ray.data.from_pandas(df).repartition(nparts)
        out = (
            grouped_entropy(ds, "g", "v")
            .to_pandas()
            .sort_values("g")
            .reset_index(drop=True)
        )
        outs.append(out)
    pd.testing.assert_frame_equal(outs[0], outs[1])
    out = outs[0]
    assert out["g"].tolist() == ["a", "b", "c"]
    assert out["n"].tolist() == [4, 2, 4]
    # a: two values with c=2, n=4 → 2·floor(1e6·ln2) × 2
    t2 = math.floor(1e6 * math.log(4.0 / 2.0))
    assert out["ent_micro_sum"][0] == 2 * t2 + 2 * t2
    # b: single value → ln(1) = 0
    assert out["ent_micro_sum"][1] == 0
    # c: 3/1 split
    assert out["ent_micro_sum"][2] == 3 * math.floor(
        1e6 * math.log(4.0 / 3.0)
    ) + 1 * math.floor(1e6 * math.log(4.0 / 1.0))


def test_first_k_paths_hand_fixture(ray_session):
    """first_k_paths: first-k ordering respects the composite order
    columns, short histories produce short paths, counts aggregate
    across buckets; layout-invariant."""
    import ray.data

    from dedupe_ray.ops.tabular import first_k_paths

    df = pd.DataFrame(
        {
            "u": ["a", "a", "a", "a", "b", "b", "b", "c"],
            "t": ["x", "y", "z", "w", "x", "y", "z", "x"],
            "ts": [1, 2, 3, 4, 1, 2, 3, 9],
            "eid": [0, 1, 2, 3, 4, 5, 6, 7],
        }
    )
    outs = []
    for nparts in (1, 4):
        out = (
            first_k_paths(
                ray.data.from_pandas(df).repartition(nparts),
                "u", "t", ["ts", "eid"], k=3,
            )
            .to_pandas()
            .sort_values("path")
            .reset_index(drop=True)
        )
        outs.append(out)
    pd.testing.assert_frame_equal(outs[0], outs[1])
    got = dict(zip(outs[0]["path"], outs[0]["n"]))
    # a and b share the same first-3 path; c has a 1-step path
    assert got == {"x>y>z": 2, "x": 1}
    # tie on ts resolves by eid: two same-ts events for one user
    df2 = pd.DataFrame(
        {"u": ["d", "d"], "t": ["q", "p"], "ts": [5, 5], "eid": [11, 10]}
    )
    out2 = first_k_paths(
        ray.data.from_pandas(df2), "u", "t", ["ts", "eid"], k=3
    ).to_pandas()
    assert out2["path"].tolist() == ["p>q"]


def test_degree_assortativity_hand_graph(ray_session):
    """degree_assortativity_moments on a star graph (perfectly
    disassortative, r = -1) and a path, vs by-hand moments;
    layout-invariant."""
    import ray.data

    from dedupe_ray.ops.graph import degree_assortativity_moments

    # star: center c with 3 leaves. degrees c=3, leaves=1.
    star = pd.DataFrame({"src": ["c", "c", "c"], "dst": ["l1", "l2", "l3"]})
    outs = []
    for nparts in (1, 3):
        t = degree_assortativity_moments(
            ray.data.from_pandas(star).repartition(nparts), "src", "dst"
        ).to_pandas()
        outs.append(t)
    pd.testing.assert_frame_equal(outs[0], outs[1])
    m = outs[0].iloc[0]
    # 3 edges, directed instances: (3,1)×3 and (1,3)×3
    assert m["n2"] == 6
    assert m["sx"] == 3 * (3 + 1) * 2 // 2 == 12
    assert m["sxx"] == 3 * (9 + 1)
    assert m["sxy"] == 2 * 3 * 3
    # Pearson r from the moments = -1 exactly for a star
    num = m["n2"] * m["sxy"] - m["sx"] * m["sx"]
    den = m["n2"] * m["sxx"] - m["sx"] * m["sx"]
    assert num == -den and den > 0


def test_bcubed_hand_computed_and_layout_invariant(ray_session):
    """bcubed_metrics vs a by-hand B³ on a 5-record fixture, plus the
    identical-partition and layout-invariance properties."""
    import ray.data

    from dedupe_ray.eval import bcubed_metrics

    # pred: {a,a,a}{b,b}  true: {x,x}{y,y,y} with cells:
    # (a,x):2 (a,y):1 (b,y):2 → p(a)=3 p(b)=2 t(x)=2 t(y)=3
    df = pd.DataFrame(
        {
            "pred": ["a", "a", "a", "b", "b"],
            "true": ["x", "x", "y", "y", "y"],
        }
    )
    outs = []
    for nparts in (1, 4):
        out = bcubed_metrics(
            ray.data.from_pandas(df).repartition(nparts), "pred", "true"
        ).to_pandas()
        outs.append(out)
    pd.testing.assert_frame_equal(outs[0], outs[1])
    out = outs[0].iloc[0]
    assert out["n"] == 5
    # prec_micro_sum = Σ ((c·1e6)//p)·c = (2e6//3)·2 + (1e6//3)·1 + (2e6//2)·2
    assert out["prec_micro_sum"] == (2_000_000 // 3) * 2 + (1_000_000 // 3) * 1 + 2_000_000
    # rec_micro_sum = (2e6//2)·2 + (1e6//3)·1 + (2e6//3)·2
    assert out["rec_micro_sum"] == 2_000_000 + (1_000_000 // 3) * 1 + (2_000_000 // 3) * 2
    # identical partitions → exact 1.0 in micro-units
    same = bcubed_metrics(
        ray.data.from_pandas(pd.DataFrame({"pred": ["a", "a", "b"], "true": ["a", "a", "b"]})),
        "pred",
        "true",
    ).to_pandas().iloc[0]
    assert same["prec_micro_sum"] == same["n"] * 1_000_000
    assert same["rec_micro_sum"] == same["n"] * 1_000_000


def test_pca_planted_axis_and_layout_invariance(ray_session):
    """pca_fit/pca_project: on data varying along one planted direction,
    the first component recovers it (sign-canonicalized, |cos| ≈ 1) and
    projections are bit-identical at 1 vs 8 blocks; pc_0 carries almost
    all the variance."""
    import ray.data

    from dedupe_ray.ops.embedding import pca_fit, pca_project

    rng = np.random.default_rng(3)
    d = 6
    axis = np.zeros(d)
    axis[2] = 1.0  # planted: all variance on dim 2
    t = rng.normal(0, 5.0, 80)
    vecs = 10.0 + t[:, None] * axis[None, :] + rng.normal(0, 0.01, (80, d))
    df = pd.DataFrame(
        {"vec_id": np.arange(80), "embedding": [v.tolist() for v in vecs]}
    )
    outs = []
    for nparts in (1, 8):
        ds = ray.data.from_pandas(df).repartition(nparts)
        mean, comps = pca_fit(ds, n_components=2)
        out = (
            pca_project(ds, mean, comps)
            .to_pandas()
            .sort_values("vec_id")
            .reset_index(drop=True)
        )
        outs.append((mean, comps, out))
    assert (outs[0][0] == outs[1][0]).all()
    assert (outs[0][1] == outs[1][1]).all()
    pd.testing.assert_frame_equal(outs[0][2], outs[1][2])
    mean, comps, out = outs[0]
    # first component aligns with the planted axis, sign-canonical (+)
    assert abs(comps[0] @ axis) > 0.999
    assert comps[0, 2] > 0
    # variance concentrates on pc_0
    assert out["pc_0"].var() > 100 * out["pc_1"].var()


def test_link_prediction_hand_graph(ray_session):
    """link_prediction_scores on a 4-node hand graph: only non-adjacent
    pairs appear, common-neighbor counts and integer-nano Adamic–Adar
    terms match the by-hand wedge enumeration; layout-invariant."""
    import math

    import ray.data

    from dedupe_ray.ops.graph import link_prediction_scores

    # a-b, a-c, b-c (triangle) + b-d pendant; mixed orientation + dup
    df = pd.DataFrame(
        {
            "src": ["a", "c", "b", "d", "a"],
            "dst": ["b", "a", "c", "b", "b"],
        }
    )
    outs = []
    for nparts in (1, 4):
        ds = ray.data.from_pandas(df).repartition(nparts)
        out = (
            link_prediction_scores(ds, "src", "dst")
            .to_pandas()
            .sort_values(["u", "w"])
            .reset_index(drop=True)
        )
        outs.append(out)
    pd.testing.assert_frame_equal(outs[0], outs[1])
    out = outs[0]
    # non-adjacent pairs with a common neighbor: (a,d) and (c,d), both
    # through center b (deg 3)
    aa3 = 10**15 // math.floor(1000000.0 * math.log(3.0))
    assert out[["u", "w"]].values.tolist() == [["a", "d"], ["c", "d"]]
    assert out["cn"].tolist() == [1, 1]
    assert out["aa_nano"].tolist() == [aa3, aa3]


def test_ivf_pq_planted_cells_probe_and_adc(ray_session):
    """IVF-PQ on planted well-separated clusters: coarse cells recover the
    planted groups, search touches ONLY the nprobe probed cells, and the
    ranking matches a brute-force driver residual-ADC reference built
    from the same artifacts. Build and search are partitioning-invariant
    (2 vs 8 blocks byte-identical)."""
    import ray.data

    from dedupe_ray.ops.embedding import ivf_pq_build, ivf_pq_search

    rng = np.random.default_rng(11)
    m, dsub, kc = 2, 4, 3
    dim = m * dsub
    centers = np.array(
        [[0.0] * dim, [10.0] * dim, [20.0] * dim]
    )
    groups = rng.integers(0, kc, size=60)
    vecs = centers[groups] + rng.normal(0, 0.05, (60, dim))
    # coarse seeds are the 3 smallest ids: pin one per planted group so
    # cell id == planted group exactly
    for g in range(kc):
        vecs[g] = centers[g]
        groups[g] = g
    df = pd.DataFrame({"vec_id": np.arange(60), "embedding": [v.tolist() for v in vecs]})

    outs = []
    for nparts in (2, 8):
        ds = ray.data.from_pandas(df).repartition(nparts)
        coarse, cbs, codes_ds = ivf_pq_build(
            ds, k_coarse=kc, coarse_iters=2, m=m, k_codes=2, pq_iters=1
        )
        codes = codes_ds.to_pandas().sort_values("vec_id").reset_index(drop=True)
        assert (codes["cell"].to_numpy() == groups).all()
        q = np.floor(vecs[:2] * 1_000_000 + 0.5).astype(np.int64)
        out = ivf_pq_search(
            ray.data.from_pandas(codes).repartition(nparts),
            coarse, cbs, q, k=4, nprobe=2,
        ).to_pandas()
        outs.append((coarse, cbs, codes, out))
    # partitioning invariance
    assert (outs[0][0] == outs[1][0]).all() and (outs[0][1] == outs[1][1]).all()
    pd.testing.assert_frame_equal(outs[0][2], outs[1][2])
    pd.testing.assert_frame_equal(outs[0][3], outs[1][3])

    coarse, cbs, codes, out = outs[0]
    assert list(out.columns) == ["query_id", "vec_id", "adc_dist", "rnk"]
    # brute-force driver reference: probe the 2 exactly-nearest cells,
    # residual-ADC over members of those cells only
    q = np.floor(vecs[:2] * 1_000_000 + 0.5).astype(np.int64)
    cds = codes[[f"code_{s}" for s in range(m)]].to_numpy()
    cells = codes["cell"].to_numpy()
    for j in range(2):
        dcell = ((q[j][None, :] - coarse) ** 2).sum(axis=1)
        probe = np.argsort(dcell, kind="stable")[:2]
        cand, cd = [], []
        for cell in probe:
            r = q[j] - coarse[cell]
            lut = np.stack(
                [((r[s * dsub:(s + 1) * dsub][None, :] - cbs[s]) ** 2).sum(axis=1)
                 for s in range(m)]
            )
            mask = cells == cell
            ids = codes["vec_id"].to_numpy()[mask]
            dist = lut[np.arange(m)[None, :], cds[mask]].sum(axis=1)
            cand.append(ids)
            cd.append(dist)
        ids = np.concatenate(cand)
        dist = np.concatenate(cd)
        order = np.lexsort((ids, dist))[:4]
        got = out[out["query_id"] == j].sort_values("rnk")
        assert got["vec_id"].tolist() == ids[order].tolist()
        assert got["adc_dist"].tolist() == dist[order].tolist()
        # nothing from the unprobed cell leaks in
        probed_members = set(codes["vec_id"][np.isin(cells, probe)])
        assert set(got["vec_id"]).issubset(probed_members)


def test_dbscan_planted_clusters_roles_and_noise(ray_session):
    """Two planted dense blobs + a bridge-free sparse point: cores get the
    numeric-min member as cluster id, border points attach to the min
    neighboring core cluster, noise is absent — verified against a
    brute-force driver DBSCAN."""
    import ray.data

    from dedupe_ray.ops.embedding import dbscan_embeddings

    dim = 8
    # hand-placed along dim0 (quantized units: 0.001 → 1000):
    # ids 0..5 at 0,1,..,5 millis (blob A: pairwise ≤ 5000² = 2.5e7)
    # ids 6..10 at 1.0 + 0..4 millis (blob B)
    # id 11 at 0.014: within ε only of ids 4,5 (+self) → cnt 3 < 5 → border
    # id 12 at 5.0: isolated noise
    dim0 = np.array([0, 0.001, 0.002, 0.003, 0.004, 0.005,
                     1.0, 1.001, 1.002, 1.003, 1.004,
                     0.014, 5.0])
    vecs = np.zeros((13, dim))
    vecs[:, 0] = dim0
    ds = ray.data.from_pandas(
        pd.DataFrame(
            {"vec_id": np.arange(13), "embedding": [v.tolist() for v in vecs]}
        )
    ).repartition(3)

    quantize = 1_000_000
    q = np.floor(vecs * quantize + 0.5).astype(np.int64)
    d2 = ((q[:, None, :] - q[None, :, :]) ** 2).sum(axis=2)
    eps2 = 10_000**2  # ε = 0.01 on the fixed-point scale
    min_pts = 5
    cnt = (d2 <= eps2).sum(axis=1)
    core = cnt >= min_pts

    out = (
        dbscan_embeddings(ds, eps2=eps2, min_pts=min_pts, quantize=quantize)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    # reference: UF over core-core edges
    parent = list(range(13))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i in range(13):
        for j in range(13):
            if core[i] and core[j] and d2[i, j] <= eps2:
                ri, rj = find(i), find(j)
                if ri != rj:
                    parent[max(ri, rj)] = min(ri, rj)
    expect = {}
    for i in range(13):
        if core[i]:
            members = [j for j in range(13) if core[j] and find(j) == find(i)]
            expect[i] = (min(members), "core")
    for i in range(13):
        if not core[i]:
            nbrs = [expect[j][0] for j in range(13) if core[j] and d2[i, j] <= eps2]
            if nbrs:
                expect[i] = (min(nbrs), "border")
    got = {int(r.vec_id): (int(r.cluster), r.role) for r in out.itertuples()}
    assert got == expect
    assert 12 not in got  # the isolated point is noise
    assert set(r for _, r in got.values()) == {"core", "border"}


def test_rank_relevance_metrics_hand_fixture(ray_session):
    """rank_relevance_metrics on a hand rank table: first-relevant rank,
    integer rr/dcg chains, and the no-relevant-hit query."""
    import math

    import ray.data

    from dedupe_ray.eval import rank_relevance_metrics

    topk = pa.table(
        {
            "query_id": pa.array([0, 0, 0, 1, 1], pa.int32()),
            "vec_id": pa.array([10, 11, 12, 10, 13], pa.int64()),
            "rank": pa.array([0, 1, 2, 0, 1], pa.int64()),
        }
    )
    labels = ray.data.from_pandas(
        pd.DataFrame({"vec_id": [10, 11, 12, 13], "label": [5, 7, 5, 9]})
    )
    out = rank_relevance_metrics(topk, labels, {0: 5, 1: 4}).to_pandas()
    q0 = out[out["query_id"] == 0].iloc[0]
    # relevant at ranks 0 and 2
    assert q0["n_rel"] == 2 and q0["first_rel_rank"] == 0
    assert q0["rr_micro"] == 1_000_000
    expect_dcg = (10**12 // math.floor(1e6 * math.log2(2.0))) + (
        10**12 // math.floor(1e6 * math.log2(4.0))
    )
    assert q0["dcg_micro"] == expect_dcg
    q1 = out[out["query_id"] == 1].iloc[0]
    assert q1["n_rel"] == 0 and q1["first_rel_rank"] == -1
    assert q1["rr_micro"] == 0 and q1["dcg_micro"] == 0


def test_grouped_ewma_int_hand_recurrence(ray_session):
    """grouped_ewma_int vs a scalar python recurrence per key, including
    a negative-value row (floor semantics) and order-column ties;
    layout-invariant."""
    import ray.data

    from dedupe_ray.ops.tabular import grouped_ewma_int

    df = pd.DataFrame(
        {
            "u": ["a", "a", "a", "b", "b", "a"],
            "v": [1.00, 2.00, -3.00, 5.00, 1.00, 7.00],
            "ts": [1, 2, 3, 1, 2, 2],
            "eid": [0, 1, 2, 3, 4, 5],
        }
    )
    outs = []
    for nparts in (1, 4):
        out = (
            grouped_ewma_int(
                ray.data.from_pandas(df).repartition(nparts),
                "u", "v", ["ts", "eid"], alpha_num=1, alpha_den=4,
            )
            .to_pandas()
            .sort_values(["u", "ts", "eid"])
            .reset_index(drop=True)
        )
        outs.append(out)
    pd.testing.assert_frame_equal(outs[0], outs[1])
    got = outs[0]

    # scalar reference
    ref = {}
    for u in ("a", "b"):
        rows = df[df["u"] == u].sort_values(["ts", "eid"])
        y = None
        for _, r in rows.iterrows():
            x = int(np.floor(r["v"] * 100.0 + 0.5))
            y = x if y is None else (1 * x + 3 * y) // 4
            ref[(u, r["ts"], r["eid"])] = y
    for _, r in got.iterrows():
        assert r["ewma_c"] == ref[(r["u"], r["ts"], r["eid"])]


def test_skyline_2d_brute_force_parity(ray_session):
    """skyline_2d vs an O(n²) dominance scan on random points including
    planted duplicates and tie columns; layout-invariant."""
    import ray.data

    from dedupe_ray.ops.tabular import skyline_2d

    rng = np.random.default_rng(5)
    p = rng.integers(0, 50, 200).astype(np.float64)
    d = rng.integers(0, 50, 200).astype(np.int64)
    # planted duplicate frontier point
    p[10] = p[11] = 99.0
    d[10] = d[11] = 0
    df = pd.DataFrame({"k": np.arange(200), "p": p, "d": d})

    dominated = np.zeros(200, bool)
    for i in range(200):
        dominated[i] = bool(
            np.any(
                (p >= p[i]) & (d <= d[i]) & ((p > p[i]) | (d < d[i]))
            )
        )
    expect = sorted(df.loc[~dominated, "k"].tolist())
    assert 10 in expect and 11 in expect  # duplicates both survive

    outs = []
    for nparts in (1, 8):
        got = (
            skyline_2d(ray.data.from_pandas(df).repartition(nparts), "p", "d")
            .to_pandas()
            .sort_values("k")
            .reset_index(drop=True)
        )
        outs.append(got)
    pd.testing.assert_frame_equal(outs[0], outs[1])
    assert outs[0]["k"].tolist() == expect


def test_sequence_gaps_hand_fixture(ray_session):
    """sequence_gaps: holes ≥ min_gap emit inclusive ranges, duplicates
    collapse, adjacent values emit nothing; layout-invariant."""
    import ray.data

    from dedupe_ray.ops.tabular import sequence_gaps

    df = pd.DataFrame(
        {
            "u": ["a", "a", "a", "a", "a", "b", "b", "c"],
            "s": [1, 2, 2, 5, 9, 10, 11, 7],
        }
    )
    outs = []
    for nparts in (1, 4):
        out = (
            sequence_gaps(
                ray.data.from_pandas(df).repartition(nparts), "u", "s", min_gap=2
            )
            .to_pandas()
            .sort_values(["u", "gap_start"])
            .reset_index(drop=True)
        )
        outs.append(out)
    pd.testing.assert_frame_equal(outs[0], outs[1])
    got = outs[0][["u", "gap_start", "gap_end"]].values.tolist()
    # a: 2→5 gives [3,4]; 5→9 gives [6,8]; b adjacent → none; c single → none
    assert got == [["a", 3, 4], ["a", 6, 8]]


def test_kmv_set_estimate_exact_and_saturated(ray_session):
    """kmv_set_estimate: exact path equals true set algebra when both
    sketches are unsaturated; saturated path reproduces the theta
    estimator literals and lands near the planted truth."""
    import ray.data

    from dedupe_ray.ops.sketch import _KMV_P, kmv_group_sketch, kmv_set_estimate

    # exact: |A|=20, |B|=15, overlap 5
    rows = [("a", i) for i in range(20)] + [("b", i) for i in range(15, 30)]
    df = pd.DataFrame(rows, columns=["g", "v"])
    sk = kmv_group_sketch(ray.data.from_pandas(df), "g", "v", k=64)
    out = kmv_set_estimate(sk, "g", "a", "b", k=64).to_pandas().iloc[0]
    assert out["n_a"] == 20 and out["n_b"] == 15
    assert out["n_both"] == 5
    assert out["union_est"] == 30.0 and out["inter_est"] == 5.0

    # saturated: |A|=2000, |B|=2000, overlap 1000 (planted)
    rows = [("a", i) for i in range(2000)] + [("b", i) for i in range(1000, 3000)]
    df = pd.DataFrame(rows, columns=["g", "v"])
    sk = kmv_group_sketch(ray.data.from_pandas(df).repartition(8), "g", "v", k=64)
    out = kmv_set_estimate(sk, "g", "a", "b", k=64).to_pandas().iloc[0]
    assert out["n_a"] == 64 and out["n_b"] == 64
    assert out["union_est"] == (64.0 - 1.0) * float(_KMV_P) / float(out["theta"])
    assert out["inter_est"] == float(out["n_both"]) / 64.0 * out["union_est"]
    # within ~4 standard errors of the planted truth (union 3000, inter 1000)
    assert 1500 < out["union_est"] < 6000
    assert 200 < out["inter_est"] < 2500


def test_hits_micro_brute_force_and_layout(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from dedupe_ray.ops.graph import hits_micro

    # bipartite with duplicate edges (must collapse) and degree variety
    raw = [
        ("P1", "S1"), ("P1", "S2"), ("P1", "S1"),  # dup
        ("P2", "S2"),
        ("P3", "S2"), ("P3", "S3"),
    ]
    tbl = pa.table({"src": [e[0] for e in raw], "dst": [e[1] for e in raw]})

    # brute force with identical integer max-normalized arithmetic
    edges = sorted(set(raw))
    nodes = sorted({x for e in edges for x in e})
    scale = 10**6
    h = {n: scale for n in nodes}
    a = {}
    for _ in range(2):
        ar = {n: 0 for n in nodes}
        for u, v in edges:
            ar[v] += h[u]
        mx = max(max(ar.values()), 1)
        a = {n: (ar[n] * scale) // mx for n in nodes}
        hr = {n: 0 for n in nodes}
        for u, v in edges:
            hr[u] += a[v]
        mx = max(max(hr.values()), 1)
        h = {n: (hr[n] * scale) // mx for n in nodes}

    frames = []
    for parts in (1, 4):
        out = (
            hits_micro(rd.from_arrow(tbl).repartition(parts), iters=2)
            .to_pandas()
            .sort_values("node")
            .reset_index(drop=True)
        )
        frames.append(out)
        got = {r["node"]: (r["hub"], r["auth"]) for _, r in out.iterrows()}
        assert got == {n: (h[n], a[n]) for n in nodes}
    # layout invariance is implied by both matching the reference, but
    # assert byte-equality anyway (dtype drift would hide there)
    assert frames[0].equals(frames[1])


def test_nb_classify_docs_brute_force(ray_session):
    import math
    import re

    import pyarrow as pa
    import ray.data as rd

    from dedupe_ray.ops.text import nb_classify_docs

    docs = [
        (1, "the cat sat on the mat", "en"),
        (2, "le chat est sur le tapis", "fr"),
        (3, "the dog ate the food", "en"),
        (4, "le chien mange", "fr"),
        (5, "cat dog mat food", "en"),
        (6, "chat chien tapis", "fr"),
        (7, "", "en"),  # empty doc scores prior-only
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array([d[0] for d in docs], pa.int64()),
            "text": [d[1] for d in docs],
            "lang": [d[2] for d in docs],
        }
    )
    V = 8
    toks = {d[0]: re.findall(r"[a-z]+", d[1].lower()) for d in docs}
    cnt_all: dict = {}
    for ts in toks.values():
        for t in ts:
            cnt_all[t] = cnt_all.get(t, 0) + 1
    vocab = sorted(cnt_all, key=lambda t: (-cnt_all[t], t))[:V]
    vmap = {t: i + 1 for i, t in enumerate(vocab)}
    classes = sorted({d[2] for d in docs})
    nc = {c: sum(1 for d in docs if d[2] == c) for c in classes}
    cell: dict = {}
    for d in docs:
        for t in toks[d[0]]:
            k = (d[2], vmap.get(t, 0))
            cell[k] = cell.get(k, 0) + 1
    tot = {c: sum(v for (cc, _), v in cell.items() if cc == c) for c in classes}

    def term(c, tid):
        return math.floor(
            1e6 * math.log((cell.get((c, tid), 0) + 1.0) / (tot[c] + (V + 1.0)))
        )

    ref = {}
    for d in docs:
        sc = {
            c: math.floor(1e6 * math.log((nc[c] + 0.0) / (len(docs) + 0.0)))
            + sum(term(c, vmap.get(t, 0)) for t in toks[d[0]])
            for c in classes
        }
        best = sorted(classes, key=lambda c: (-sc[c], c))[0]
        ref[d[0]] = (best, sc[best])

    for parts in (1, 3):
        out = (
            nb_classify_docs(rd.from_arrow(tbl).repartition(parts), vocab_size=V)
            .to_pandas()
            .sort_values("doc_id")
        )
        got = {r["doc_id"]: (r["pred"], r["score_micro"]) for _, r in out.iterrows()}
        assert got == ref


def test_temperature_mixture_sample_quota_and_pick(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from dedupe_ray.ops.tabular import temperature_mixture_sample

    # sqrt-weighting must over-allocate the small sources relative to
    # proportional sampling, quotas must sum to B exactly, and a tiny
    # source must cap at its own size
    n_by = {"big": 100, "mid": 25, "tiny": 2}
    ids, gs = [], []
    i = 0
    for g, n in n_by.items():
        for _ in range(n):
            ids.append(i)
            gs.append(g)
            i += 1
    tbl = pa.table(
        {"doc_id": pa.array(ids, pa.int64()), "source": pa.array(gs, pa.string())}
    )

    groups = sorted(n_by)
    n_i = np.array([n_by[g] for g in groups], np.int64)
    B = int(n_i.sum()) // 2
    w = np.floor(1e6 * np.sqrt(n_i.astype(np.float64))).astype(np.int64)
    W = int(w.sum())
    base = (B * w) // W
    rem = (B * w) % W
    k = base.copy()
    k[np.argsort(-rem, kind="stable")[: B - int(base.sum())]] += 1
    k = np.minimum(k, n_i)
    expect = {}
    for gi, g in enumerate(groups):
        rows = sorted(
            (x for x, gg in zip(ids, gs) if gg == g),
            key=lambda x: ((x * 2654435761) & 0xFFFFFFFF, x),
        )
        expect[g] = set(rows[: k[gi]])

    for parts in (1, 5):
        out = temperature_mixture_sample(
            rd.from_arrow(tbl).repartition(parts), "source", "doc_id"
        ).to_pandas()
        got = {
            g: set(out[out["source"] == g]["doc_id"].tolist()) for g in groups
        }
        assert got == expect
    # sqrt weighting: tiny source keeps everything it has, big source
    # gets less than its proportional share
    assert len(expect["tiny"]) == 2
    assert len(expect["big"]) < n_by["big"] * B // int(n_i.sum()) + 2


def test_mutual_knn_pairs_brute_force(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from dedupe_ray.ops.embedding import mutual_knn_pairs

    rng = np.random.default_rng(11)
    vecs = rng.normal(size=(40, 6)).astype(np.float32)
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(40), pa.int64()),
            "embedding": pa.array(
                [list(map(float, v)) for v in vecs], pa.list_(pa.float32())
            ),
        }
    )
    m = vecs.astype(np.float64)
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    sims = m @ m.T
    np.fill_diagonal(sims, -np.inf)
    topk = {
        a: set(sorted(range(40), key=lambda b: (-sims[a, b], b))[:4])
        for a in range(40)
    }
    ref = sorted(
        (a, b) for a in range(40) for b in topk[a] if a < b and a in topk[b]
    )
    out = (
        mutual_knn_pairs(rd.from_arrow(tbl).repartition(4), k=4)
        .to_pandas()
        .sort_values(["id_a", "id_b"])
    )
    assert list(map(tuple, out.to_records(index=False))) == ref
    # mutual pairs are a strict subset of one-sided pairs on random data
    assert 0 < len(ref) < 40 * 4


def test_clustering_coefficients_brute_force(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from dedupe_ray.ops.graph import clustering_coefficients

    # triangle a-b-c, plus d attached to a and b (a,b close a second
    # wedge), plus pendant e-a (degree-1 node must appear with coeff 0)
    edges = [("a", "b"), ("b", "c"), ("a", "c"), ("a", "d"), ("b", "d"), ("a", "e")]
    tbl = pa.table({"src": [e[0] for e in edges], "dst": [e[1] for e in edges]})

    adj = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    expect = {}
    for v, nb in adj.items():
        deg = len(nb)
        tri = sum(
            1
            for i, x in enumerate(sorted(nb))
            for y in sorted(nb)[i + 1 :]
            if y in adj[x]
        )
        cm = (2 * tri * 10**6) // (deg * (deg - 1)) if deg >= 2 else 0
        expect[v] = (deg, tri, cm)

    for parts in (1, 3):
        out = clustering_coefficients(rd.from_arrow(tbl).repartition(parts)).to_pandas()
        got = {
            r["node"]: (r["deg"], r["n_tri"], r["coeff_micro"])
            for _, r in out.iterrows()
        }
        assert got == expect


def test_ari_stats_brute_force(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from dedupe_ray.eval import ari_stats

    pred = ["x", "x", "x", "y", "y", "z", None, "z"]
    true = ["p", "p", "q", "q", "q", "p", "p", None]
    ds = rd.from_arrow(pa.table({"pred": pred, "true": true}))
    out = ari_stats(ds, "pred", "true").to_pandas().iloc[0]

    # brute force over the 6 non-null rows
    rows = [(p, t) for p, t in zip(pred, true) if p is not None and t is not None]
    n = len(rows)
    tp = sum(
        1
        for i in range(n)
        for j in range(i + 1, n)
        if rows[i][0] == rows[j][0] and rows[i][1] == rows[j][1]
    )
    pp = sum(
        1 for i in range(n) for j in range(i + 1, n) if rows[i][0] == rows[j][0]
    )
    tt = sum(
        1 for i in range(n) for j in range(i + 1, n) if rows[i][1] == rows[j][1]
    )
    total = n * (n - 1) // 2
    exp = float(pp) * float(tt) / float(total)
    ari = (float(tp) - exp) / ((float(pp) + float(tt)) / 2.0 - exp)
    assert out["n"] == n and out["tp"] == tp
    assert out["pred_pairs"] == pp and out["true_pairs"] == tt
    assert out["total_pairs"] == total
    assert out["ari"] == ari

    # identical partitions → ARI exactly 1
    same = rd.from_arrow(pa.table({"pred": ["a", "a", "b"], "true": ["u", "u", "v"]}))
    assert ari_stats(same, "pred", "true").to_pandas().iloc[0]["ari"] == 1.0


def test_fuse_records_rules_and_ties(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from dedupe_ray.ops.tabular import fuse_records

    tbl = pa.table(
        {
            "cl": [1, 1, 1, 2, 2],
            "k": [10, 11, 12, 20, 21],
            "seg": ["B", "A", "B", "X", "Y"],  # cl1 mode B; cl2 tie -> X
            "bal": [5.0, 9.0, 7.0, 1.0, 2.0],
        }
    )
    for parts in (1, 3):
        out = (
            fuse_records(
                rd.from_arrow(tbl).repartition(parts),
                "cl",
                {
                    "rep": ("k", "min"),
                    "bal_max": ("bal", "max"),
                    "seg_mode": ("seg", "mode"),
                },
            )
            .to_pandas()
            .sort_values("cl")
            .reset_index(drop=True)
        )
        assert out["cl"].tolist() == [1, 2]
        assert out["n_members"].tolist() == [3, 2]
        assert out["rep"].tolist() == [10, 20]
        assert out["bal_max"].tolist() == [9.0, 2.0]
        assert out["seg_mode"].tolist() == ["B", "X"]

    import pytest

    with pytest.raises(ValueError):
        fuse_records(rd.from_arrow(tbl), "cl", {"bad": ("k", "median")})


def test_lsh_hyperplane_pairs_reference_and_guarantees(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from dedupe_ray.ops.embedding import lsh_hyperplane_pairs

    rng = np.random.RandomState(7)
    dim, nbits, bands = 16, 16, 4
    vecs = rng.randn(40, dim).astype(np.float32)
    vecs[35] = vecs[3]  # exact duplicate MUST pair (all bands agree)
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(40, dtype=np.int64)),
            "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
        }
    )

    # driver reference with identical integer arithmetic
    idx = (
        np.arange(nbits, dtype=np.int64)[:, None] * dim
        + np.arange(dim, dtype=np.int64)
        + 1
    )
    signs = np.where((idx * 2654435761) % (2**32) < 2**31, 1, -1).astype(np.int64)
    q = np.floor(vecs.astype(np.float64) * 1000 + 0.5).astype(np.int64)
    bits = (q @ signs.T >= 0).astype(np.int64)
    r = nbits // bands
    keys = (bits.reshape(-1, bands, r) * (1 << np.arange(r, dtype=np.int64))).sum(2)
    expect = set()
    for b in range(bands):
        for i in range(40):
            for j in range(i + 1, 40):
                if keys[i, b] == keys[j, b]:
                    expect.add((i, j))

    for parts in (1, 4):
        out = lsh_hyperplane_pairs(
            rd.from_arrow(tbl).repartition(parts),
            dim=dim,
            nbits=nbits,
            bands=bands,
        ).to_pandas()
        got = set(zip(out["id_a"], out["id_b"]))
        assert got == expect
    assert (3, 35) in got  # the planted exact duplicate collides

    import pytest

    with pytest.raises(ValueError):
        lsh_hyperplane_pairs(rd.from_arrow(tbl), dim=dim, nbits=10, bands=4)


def test_rank_auc_stats_brute_force(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from dedupe_ray.eval import rank_auc_stats

    scores = [1.0, 2.0, 2.0, 3.0, 3.0, 3.0, 4.0, 0.5]
    labels = [0, 0, 1, 0, 1, 1, 1, 0]
    ds = rd.from_arrow(pa.table({"score": scores, "label": labels}))
    out = rank_auc_stats(ds, "score", "label").to_pandas().iloc[0]

    num2 = 0
    for sp, lp in zip(scores, labels):
        if lp != 1:
            continue
        for sn, ln in zip(scores, labels):
            if ln != 0:
                continue
            num2 += 2 if sp > sn else (1 if sp == sn else 0)
    n_pos, n_neg = sum(labels), len(labels) - sum(labels)
    assert out["n_pos"] == n_pos and out["n_neg"] == n_neg
    assert out["num2"] == num2
    assert out["auc"] == float(num2) / float(2 * n_pos * n_neg)

    # perfect separation -> 1.0; label validation
    perf = rd.from_arrow(pa.table({"score": [1.0, 2.0], "label": [0, 1]}))
    assert rank_auc_stats(perf, "score", "label").to_pandas().iloc[0]["auc"] == 1.0
    import pytest

    bad = rd.from_arrow(pa.table({"score": [1.0], "label": [2]}))
    with pytest.raises(Exception):
        rank_auc_stats(bad, "score", "label")


def test_gini_coefficient_known_values(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from dedupe_ray.ops.tabular import gini_coefficient

    # all equal -> gini 0
    eq = rd.from_arrow(pa.table({"x": [5, 5, 5, 5], "id": [1, 2, 3, 4]}))
    assert gini_coefficient(eq, "x", "id").to_pandas().iloc[0]["gini"] == 0.0

    # brute force against the rank formula
    vals = [0, 0, 3, 7, 10, 40]
    ds = rd.from_arrow(
        pa.table({"x": vals, "id": list(range(len(vals)))})
    ).repartition(3)
    out = gini_coefficient(ds, "x", "id").to_pandas().iloc[0]
    xs = sorted(vals)
    n, sx = len(xs), sum(xs)
    srx = sum((i + 1) * x for i, x in enumerate(xs))
    num, den = 2 * srx - (n + 1) * sx, n * sx
    assert out["n"] == n and out["sum_x"] == sx and out["sum_rank_x"] == srx
    assert out["num"] == num and out["den"] == den
    assert out["gini"] == float(num) / float(den)


def test_km_survival_hand_curve(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from dedupe_ray.ops.tabular import km_survival

    # deaths at t=2 (1 of 6 at risk), t=5 (2 of 4), censored at 3 and 7
    dur = [2, 3, 5, 5, 7, 9]
    ev = [1, 0, 1, 1, 0, 1]
    expect = []
    s = 10**6
    s = (s * (6 - 1)) // 6
    expect.append((2, 6, 1, s))
    s = (s * (4 - 2)) // 4
    expect.append((5, 4, 2, s))
    s = (s * (1 - 1)) // 1
    expect.append((9, 1, 1, s))

    for parts in (1, 3):
        out = km_survival(
            rd.from_arrow(pa.table({"t": dur, "e": ev})).repartition(parts),
            "t",
            "e",
        ).to_pandas()
        got = [
            (r["duration"], r["at_risk"], r["deaths"], r["surv_micro"])
            for _, r in out.iterrows()
        ]
        assert got == expect


def test_modularity_stats_brute_force(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from dedupe_ray.ops.graph import modularity_stats

    # two triangles joined by one bridge; labels = the two triangles
    edges = [("a", "b"), ("b", "c"), ("a", "c"), ("d", "e"), ("e", "f"), ("d", "f"), ("c", "d")]
    labels = {"a": "L", "b": "L", "c": "L", "d": "R", "e": "R", "f": "R"}
    e_t = pa.table({"src": [e[0] for e in edges], "dst": [e[1] for e in edges]})
    l_t = pa.table({"node": list(labels), "label": list(labels.values())})

    m = len(edges)
    expect = {}
    for lab in ("L", "R"):
        within = sum(1 for u, v in edges if labels[u] == lab and labels[v] == lab)
        dsum = sum(1 for u, v in edges for x in (u, v) if labels[x] == lab)
        expect[lab] = (within, dsum, m, 4 * m * within - dsum * dsum)

    for parts in (1, 3):
        out = modularity_stats(
            rd.from_arrow(e_t).repartition(parts), rd.from_arrow(l_t)
        ).to_pandas()
        got = {
            r["label"]: (r["within_edges"], r["degree_sum"], r["m"], r["contrib_num"])
            for _, r in out.iterrows()
        }
        assert got == expect
    # modularity of this split should be clearly positive
    q = sum(v[3] for v in expect.values()) / (4 * m * m)
    assert q > 0.3


def test_benford_profile_planted(ray_session):
    import math

    import pyarrow as pa
    import ray.data as rd

    from dedupe_ray.ops.tabular import benford_profile

    # 1x 1.., 2x 2.., sub-1 and negative values; -9000.5 -> digit 9
    vals = [1.5, 123.0, 256.9, 0.42, -0.9, -9000.5, 2.0]
    out = (
        benford_profile(
            rd.from_arrow(pa.table({"v": vals})).repartition(2), "v"
        )
        .to_pandas()
        .set_index("digit")
    )
    assert out.loc[1, "obs"] == 2 and out.loc[2, "obs"] == 2
    assert out.loc[9, "obs"] == 1
    assert out["obs"].sum() == 5 and (out["total"] == 5).all()
    for d in range(1, 10):
        assert out.loc[d, "exp_micro"] == math.floor(
            10**6 * math.log(1.0 + 1.0 / d) / math.log(10.0)
        )


def test_association_rules_brute_force(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from dedupe_ray.ops.tabular import association_rules

    baskets = [
        (1, "a"), (1, "b"), (1, "c"),
        (2, "a"), (2, "b"),
        (3, "a"), (3, "b"), (3, "b"),  # duplicate item row must not double
        (4, "c"), (4, "a"),
        (5, "b"),
    ]
    tbl = pa.table({"g": [x[0] for x in baskets], "i": [x[1] for x in baskets]})
    out = (
        association_rules(
            rd.from_arrow(tbl).repartition(3), "g", "i", min_pair_count=2
        )
        .to_pandas()
        .sort_values(["item_a", "item_b"], ignore_index=True)
    )
    # pairs with support>=2: (a,b)=3, (a,c)=2
    assert list(zip(out["item_a"], out["item_b"])) == [("a", "b"), ("a", "c")]
    ab = out.iloc[0]
    assert ab["pair_cnt"] == 3 and ab["cnt_a"] == 4 and ab["cnt_b"] == 4
    assert ab["n_baskets"] == 5
    assert ab["conf_ab_micro"] == (3 * 10**6) // 4
    assert ab["lift_num"] == 3 * 5 and ab["lift_den"] == 16
    ac = out.iloc[1]
    assert ac["pair_cnt"] == 2 and ac["cnt_b"] == 2
    assert ac["conf_ba_micro"] == 10**6  # c always co-occurs with a


def test_silhouette_embeddings_planted(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from dedupe_ray.ops.embedding import silhouette_embeddings

    rng = np.random.RandomState(3)
    a = rng.randn(20, 8) * 0.05 + 5.0
    b = rng.randn(20, 8) * 0.05 - 5.0
    vecs = np.vstack([a, b]).astype(np.float32)
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(40, dtype=np.int64)),
            "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
        }
    )
    frames = []
    for parts in (1, 4):
        out = (
            silhouette_embeddings(
                rd.from_arrow(tbl).repartition(parts), k=2, iters=2
            )
            .to_pandas()
            .sort_values("vec_id", ignore_index=True)
        )
        frames.append(out)
    assert frames[0].equals(frames[1])
    out = frames[0]
    # tight well-separated blobs: silhouette ratio near 1 everywhere
    s = out["s_num"] / out["s_den"]
    assert (s > 0.9).all()
    # the two blobs land in different clusters
    assert set(out.loc[out["vec_id"] < 20, "cluster"]) != set(
        out.loc[out["vec_id"] >= 20, "cluster"]
    )
    # d_own/d_next are floor-sqrt of exact integer d2: spot-check one row
    q = np.floor(vecs.astype(np.float64) * 1_000_000 + 0.5).astype(np.int64)
    assert (out["d_own"] >= 0).all() and (out["d_next"] > out["d_own"]).all()
    assert out["s_den"].tolist() == out["d_next"].tolist()  # d_next > d_own > 0


def test_bpe_train_merges_reference(ray_session):
    from collections import Counter

    import pyarrow as pa
    import ray.data as rd

    from dedupe_ray.ops.text import bpe_train_merges

    texts = ["low low low lower lowest", "new newer newest wide wider widest"]

    # independent reference: Counter-based BPE on the raw word list
    words = []
    for t in texts:
        words.extend(t.split())
    wc = Counter(words)
    seqs = {w: tuple(w) + ("</w>",) for w in wc}
    expect = []
    for _ in range(6):
        pc_ = Counter()
        for w, c in wc.items():
            s = seqs[w]
            for i in range(len(s) - 1):
                pc_[(s[i], s[i + 1])] += c
        (l, r), c = min(pc_.items(), key=lambda kv: (-kv[1], kv[0]))
        if c < 2:
            break
        expect.append((l, r, c))
        for w in seqs:
            s, out, i = seqs[w], [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == l and s[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            seqs[w] = tuple(out)

    ds = rd.from_arrow(pa.table({"text": texts})).repartition(2)
    got = bpe_train_merges(ds, n_merges=6).to_pandas()
    assert [
        (r["left"], r["right"], r["pair_count"]) for _, r in got.iterrows()
    ] == expect
    assert got["rank"].tolist() == list(range(len(expect)))


def test_audio_spectral_planted_tone(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from dedupe_ray.ops.multimodal import AudioSpectralFeatures, pcm16_wav_bytes

    rate, n = 8000, 4096
    t = np.arange(n) / rate
    tone = pcm16_wav_bytes(0.5 * np.sin(2 * np.pi * 440.0 * t), rate)
    rng = np.random.RandomState(0)
    noise = pcm16_wav_bytes(rng.uniform(-0.5, 0.5, n), rate)
    tbl = pa.table(
        {
            "media_ref": ["tone", "noise"],
            "payload": pa.array([tone, noise], pa.binary()),
        }
    )
    out = (
        rd.from_arrow(tbl)
        .map_batches(AudioSpectralFeatures, batch_format="pyarrow", concurrency=1)
        .to_pandas()
        .set_index("media_ref")
    )
    bin_hz = rate / 2048  # default n_fft
    assert abs(out.loc["tone", "dominant_hz"] - 440.0) <= bin_hz
    assert abs(out.loc["tone", "centroid_hz"] - 440.0) < 150.0
    assert out.loc["tone", "flatness"] < 0.2
    assert out.loc["noise", "flatness"] > out.loc["tone", "flatness"] * 2
    assert out.loc["noise", "centroid_hz"] > 1000.0


def test_hashed_features_brute_force(ray_session):
    import hashlib

    import pyarrow as pa
    import ray.data as rd

    from dedupe_ray.ops.text import hashed_features

    texts = ["the cat sat", "THE the dog!", ""]
    tbl = pa.table({"doc_id": [1, 2, 3], "text": texts})
    out = (
        hashed_features(rd.from_arrow(tbl).repartition(2), n_features=8)
        .to_pandas()
        .sort_values(["doc_id", "bucket"], ignore_index=True)
    )

    import re

    expect = {}
    for did, t in zip([1, 2, 3], texts):
        for tok in re.findall(r"[a-z]+", t.lower()):
            b = int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % 8
            expect[(did, b)] = expect.get((did, b), 0) + 1
    got = {(r["doc_id"], r["bucket"]): r["cnt"] for _, r in out.iterrows()}
    assert got == expect
    assert 3 not in set(out["doc_id"])  # empty doc emits nothing


def test_mann_kendall_trend_brute_force(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from dedupe_ray.ops.tabular import mann_kendall_trend

    rows = [
        ("u1", 1, 10), ("u1", 2, 20), ("u1", 3, 15), ("u1", 4, 30),  # up trend
        ("u2", 1, 9), ("u2", 2, 9), ("u2", 3, 5),                    # ties+down
        ("u3", 7, 1),                                                # singleton
    ]
    tbl = pa.table(
        {
            "k": [r[0] for r in rows],
            "t": [r[1] for r in rows],
            "v": [r[2] for r in rows],
        }
    )

    def brute(vals):
        s = 0
        for i in range(len(vals)):
            for j in range(i + 1, len(vals)):
                s += (vals[j] > vals[i]) - (vals[j] < vals[i])
        return s

    expect = {
        "u1": (4, brute([10, 20, 15, 30])),
        "u2": (3, brute([9, 9, 5])),
        "u3": (1, 0),
    }
    for parts in (1, 3):
        out = mann_kendall_trend(
            rd.from_arrow(tbl).repartition(parts), "k", ["t"], "v"
        ).to_pandas()
        got = {r["k"]: (r["n"], r["s_stat"]) for _, r in out.iterrows()}
        assert got == expect


def test_xml_roundtrip_unit(ray_session, tmp_path):
    import pyarrow as pa
    import ray.data as rd

    from dedupe_ray.sources import read_xml, write_xml

    tbl = pa.table(
        {
            "id": pa.array([1, 2, 3], pa.int64()),
            "name": ["a<b&c>", 'quo"te', None],  # escaping + null
            "score": pa.array([1.5, None, -0.25], pa.float64()),
        }
    )
    out = str(tmp_path / "xmlsink")
    write_xml(rd.from_arrow(tbl).repartition(2), out)
    schema = pa.schema(
        [("id", pa.int64()), ("name", pa.string()), ("score", pa.float64())]
    )
    back = (
        read_xml(out, schema)
        .to_pandas()
        .sort_values("id", ignore_index=True)
    )
    assert back["id"].tolist() == [1, 2, 3]
    assert back["name"].tolist()[:2] == ["a<b&c>", 'quo"te']
    assert back["name"].isna().tolist() == [False, False, True]
    assert back["score"].tolist()[0] == 1.5 and back["score"].tolist()[2] == -0.25


def test_abc_classification_boundaries(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from dedupe_ray.ops.tabular import abc_classification

    # values 50,30,10,10 of total 100: cum 50(A),80(B at 70-boundary
    # crossing),90(B),100(C)
    tbl = pa.table({"id": [1, 2, 3, 4], "v": [50, 30, 10, 10]})
    for parts in (1, 3):
        out = (
            abc_classification(rd.from_arrow(tbl).repartition(parts), "v", "id")
            .to_pandas()
            .sort_values("rank", ignore_index=True)
        )
        assert out["id"].tolist() == [1, 2, 3, 4]
        assert out["cum"].tolist() == [50, 80, 90, 100]
        assert out["abc_class"].tolist() == ["A", "B", "B", "C"]
        # ties rank by id asc
        assert out.loc[out["id"] == 3, "rank"].item() == 3


def test_psi_categories_brute_force(ray_session):
    import math

    import pyarrow as pa
    import ray.data as rd

    from dedupe_ray.ops.tabular import psi_categories

    ref = rd.from_arrow(pa.table({"c": ["a"] * 6 + ["b"] * 3 + ["only_ref"]}))
    cur = rd.from_arrow(pa.table({"c": ["a"] * 2 + ["b"] * 8}))
    out = psi_categories(ref, cur, "c").to_pandas().set_index("category")
    assert set(out.index) == {"a", "b"}  # one-sided categories excluded
    n_ref, n_cur = 10, 10
    for cat, cr, cc in [("a", 6, 2), ("b", 3, 8)]:
        ln_micro = math.floor(
            10**6 * math.log((float(cr) * n_cur) / (float(cc) * n_ref))
        )
        diff = cr * n_cur - cc * n_ref
        assert out.loc[cat, "ln_micro"] == ln_micro
        assert out.loc[cat, "term_micro"] == (diff * ln_micro) // (n_ref * n_cur)
        assert out.loc[cat, "term_micro"] >= 0  # PSI terms are nonnegative


def test_grouped_hhi_known(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from dedupe_ray.ops.tabular import grouped_hhi

    rows = [("g1", "s1")] * 4 + [("g2", "s1"), ("g2", "s2")] * 2
    tbl = pa.table({"g": [r[0] for r in rows], "m": [r[1] for r in rows]})
    out = (
        grouped_hhi(rd.from_arrow(tbl).repartition(3), "g", "m")
        .to_pandas()
        .set_index("g")
    )
    # monopoly: 16/16 = 1; two equal: (4+4)/16 = 0.5
    assert out.loc["g1", "hhi_num"] == 16 and out.loc["g1", "hhi_den"] == 16
    assert out.loc["g1", "n_members"] == 1
    assert out.loc["g2", "hhi_num"] == 8 and out.loc["g2", "hhi_den"] == 16
    assert out.loc["g2", "n_members"] == 2


def test_grouped_weighted_median_brute(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from dedupe_ray.ops.tabular import grouped_weighted_median

    rows = [
        ("k1", 10, 1), ("k1", 20, 1), ("k1", 30, 10),  # weight-dominated -> 30
        ("k2", 5, 2), ("k2", 7, 2),                     # 2*2 >= 4 at v=5
        ("k3", 9, 3), ("k3", 9, 4), ("k3", 11, 1),      # dup values merge -> 9
    ]
    tbl = pa.table(
        {
            "k": [r[0] for r in rows],
            "v": [r[1] for r in rows],
            "w": [r[2] for r in rows],
        }
    )
    for parts in (1, 3):
        out = (
            grouped_weighted_median(
                rd.from_arrow(tbl).repartition(parts), "k", "v", "w"
            )
            .to_pandas()
            .set_index("k")
        )
        assert out.loc["k1", "wmedian"] == 30 and out.loc["k1", "w_total"] == 12
        assert out.loc["k2", "wmedian"] == 5
        assert out.loc["k3", "wmedian"] == 9 and out.loc["k3", "w_total"] == 8


def test_token_pmi_pairs_brute_force(ray_session):
    import math

    import pyarrow as pa
    import ray.data as rd

    from dedupe_ray.ops.text import token_pmi_pairs

    texts = [
        "alpha beta", "alpha beta", "alpha beta gamma",
        "alpha gamma", "beta delta", "gamma delta",
    ]
    tbl = pa.table({"doc_id": list(range(6)), "text": texts})
    out = (
        token_pmi_pairs(
            rd.from_arrow(tbl).repartition(2),
            vocab_size=4,
            min_pair_count=2,
        )
        .to_pandas()
        .set_index(["item_a", "item_b"])
    )
    # (alpha, beta) co-occur 3x; cnt alpha 4, beta 4, n_docs 6
    ab = out.loc[("alpha", "beta")]
    assert ab["pair_cnt"] == 3 and ab["cnt_a"] == 4 and ab["cnt_b"] == 4
    assert ab["n_baskets"] == 6
    assert ab["pmi_micro"] == math.floor(
        10**6 * math.log(float(3 * 6) / float(4 * 4))
    )
    # (alpha, gamma) co-occur 2x
    assert out.loc[("alpha", "gamma")]["pair_cnt"] == 2


def test_rfm_scores_rank_tiling(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from dedupe_ray.ops.tabular import rfm_scores

    # 10 customers with fully ordered metrics: recency 0..9 (0 most
    # recent -> r_score 5), frequency/monetary ascending -> scores 1..5
    tbl = pa.table(
        {
            "id": list(range(10)),
            "rec": list(range(10)),
            "freq": list(range(10, 20)),
            "mon": list(range(100, 110)),
        }
    )
    for parts in (1, 3):
        out = (
            rfm_scores(
                rd.from_arrow(tbl).repartition(parts), "id", "rec", "freq", "mon"
            )
            .to_pandas()
            .sort_values("id", ignore_index=True)
        )
        # rank-based quintiles: two customers per tile
        assert out["f_score"].tolist() == [1, 1, 2, 2, 3, 3, 4, 4, 5, 5]
        assert out["m_score"].tolist() == [1, 1, 2, 2, 3, 3, 4, 4, 5, 5]
        assert out["r_score"].tolist() == [5, 5, 4, 4, 3, 3, 2, 2, 1, 1]
        assert (
            out["rfm"] == 100 * out["r_score"] + 10 * out["f_score"] + out["m_score"]
        ).all()


def test_pseudonymize_stable_and_null(ray_session):
    import hashlib

    import pyarrow as pa
    import ray.data as rd

    from dedupe_ray.ops.text import pseudonymize

    tbl = pa.table(
        {
            "id": pa.array([7, 8, 7], pa.int64()),
            "name": ["ann", None, "ann"],
            "keep": ["x", "y", "z"],
        }
    )
    out = (
        pseudonymize(rd.from_arrow(tbl).repartition(2), ["id", "name"], salt="k")
        .to_pandas()
        .sort_values("keep", ignore_index=True)
    )
    h7 = hashlib.md5(b"k:7").hexdigest()[:16]
    hann = hashlib.md5(b"k:ann").hexdigest()[:16]
    assert out["id"].tolist() == [h7, hashlib.md5(b"k:8").hexdigest()[:16], h7]
    assert out["name"].tolist()[0] == hann and out["name"].tolist()[2] == hann
    assert out["name"].isna().tolist() == [False, True, False]
    assert out["keep"].tolist() == ["x", "y", "z"]  # untouched column


def test_manifest_parquet_prunes_files(ray_session, tmp_path):
    import pyarrow as pa
    import ray.data as rd

    from dedupe_ray.sources import read_parquet_manifest, write_parquet_manifest

    tbl = pa.table({"k": list(range(100)), "v": [f"r{i}" for i in range(100)]})
    out = str(tmp_path / "mani")
    # sorted + 10 blocks -> each shard covers a 10-key range
    write_parquet_manifest(
        rd.from_arrow(tbl).repartition(10), out, stats_columns=["k"]
    )
    import json
    import os

    manifest = json.load(open(os.path.join(out, "manifest.json")))
    assert len(manifest["shards"]) == 10

    got = (
        read_parquet_manifest(out, "k", 25, 34)
        .to_pandas()
        .sort_values("k", ignore_index=True)
    )
    assert got["k"].tolist() == list(range(25, 35))

    # pruning actually skips files: the kept set for a 10-wide range in
    # 10-wide shards is at most 2 files
    import pyarrow.compute as pc

    overlapping = [
        s
        for s in manifest["shards"]
        if not (int(s["min_k"]) > 34 or int(s["max_k"]) < 25)
    ]
    assert len(overlapping) <= 2

    # out-of-range predicate -> empty but correctly typed (schema survives
    # even though ray's to_pandas drops columns on fully-empty datasets)
    empty = read_parquet_manifest(out, "k", 1000, 2000)
    assert empty.count() == 0 and empty.schema().names == ["k", "v"]


def test_deterministic_walks_reference(ray_session):
    import hashlib

    import pyarrow as pa
    import ray.data as rd

    from dedupe_ray.ops.graph import deterministic_walks

    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d")]
    tbl = pa.table({"src": [e[0] for e in edges], "dst": [e[1] for e in edges]})

    adj = {}
    for u, v in edges:
        adj.setdefault(u, []).append(v)
        adj.setdefault(v, []).append(u)
    adj = {k: sorted(vs) for k, vs in adj.items()}

    def step(cur, s):
        r = int(hashlib.md5(f"{cur}:{s}".encode()).hexdigest()[:8], 16) % len(adj[cur])
        return adj[cur][r]

    expect = set()
    for start in adj:
        cur = start
        expect.add((start, 0, start))
        for s in (1, 2, 3):
            cur = step(cur, s)
            expect.add((start, s, cur))

    for parts in (1, 3):
        out = deterministic_walks(
            rd.from_arrow(tbl).repartition(parts), steps=3
        ).to_pandas()
        got = set(zip(out["start"], out["step"], out["node"]))
        assert got == expect


def test_versioned_manifest_time_travel(ray_session, tmp_path):
    import pyarrow as pa
    import ray.data as rd

    from dedupe_ray.sources import (
        append_parquet_manifest,
        read_parquet_manifest,
        write_parquet_manifest,
    )

    out = str(tmp_path / "delta")
    v1 = pa.table({"k": [1, 2, 3], "v": ["a", "b", "c"]})
    write_parquet_manifest(rd.from_arrow(v1), out, stats_columns=["k"])
    ver = append_parquet_manifest(
        rd.from_arrow(pa.table({"k": [10, 11], "v": ["x", "y"]})), out
    )
    assert ver == 2
    old = (
        read_parquet_manifest(out, "k", 0, 100, version=1)
        .to_pandas()
        .sort_values("k", ignore_index=True)
    )
    assert old["k"].tolist() == [1, 2, 3]
    latest = (
        read_parquet_manifest(out, "k", 0, 100)
        .to_pandas()
        .sort_values("k", ignore_index=True)
    )
    assert latest["k"].tolist() == [1, 2, 3, 10, 11]
    # pruning on the latest version skips the v1 shard entirely
    tail = read_parquet_manifest(out, "k", 10, 11).to_pandas()
    assert sorted(tail["k"]) == [10, 11]

    import pytest

    with pytest.raises(ValueError):
        append_parquet_manifest(
            rd.from_arrow(v1), out, stats_columns=["v"]
        )


def test_grouped_hampel_flags_brute(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from dedupe_ray.ops.tabular import grouped_hampel_flags

    # flat series with one big spike -> only the spike flags; second key
    # exercises short head windows
    vals = [10, 10, 11, 500, 10, 10, 11]
    rows = [("u", i, v) for i, v in enumerate(vals)] + [("w", 0, 7), ("w", 1, 9)]
    tbl = pa.table(
        {
            "k": [r[0] for r in rows],
            "t": [r[1] for r in rows],
            "v": [r[2] for r in rows],
        }
    )

    def brute(series):
        out = []
        for i in range(len(series)):
            win = sorted(series[max(0, i - 4) : i + 1])
            n = len(win)
            med2 = win[(n - 1) // 2] + win[n // 2]
            dev = sorted(abs(2 * x - med2) for x in series[max(0, i - 4) : i + 1])
            mad4 = dev[(n - 1) // 2] + dev[n // 2]
            out.append((med2, mad4, 2 * abs(2 * series[i] - med2) > 3 * mad4))
        return out

    expect = {("u", i): r for i, r in enumerate(brute(vals))}
    expect.update({("w", i): r for i, r in enumerate(brute([7, 9]))})

    for parts in (1, 3):
        out = grouped_hampel_flags(
            rd.from_arrow(tbl).repartition(parts), "k", ["t"], "v"
        ).to_pandas()
        got = {
            (r["k"], r["t"]): (r["med2"], r["mad4"], r["is_outlier"])
            for _, r in out.iterrows()
        }
        assert got == expect
    assert got[("u", 3)][2]  # the spike flags
    # the MAD=0 degeneracy also flags t=2 (any deviation over an
    # all-equal-median window trips) — standard Hampel behavior
    assert {kv for kv, v in got.items() if v[2]} == {("u", 2), ("u", 3)}


def test_interval_coverage_brute(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from dedupe_ray.ops.tabular import interval_coverage

    rows = [
        ("a", 0, 10), ("a", 5, 15), ("a", 15, 20),  # touch merges -> [0,20)
        ("a", 30, 40),                               # second island
        ("b", 100, 101), ("b", 300, 400), ("b", 350, 360),  # contained
    ]
    tbl = pa.table(
        {
            "k": [r[0] for r in rows],
            "s": [r[1] for r in rows],
            "e": [r[2] for r in rows],
        }
    )
    for parts in (1, 3):
        out = (
            interval_coverage(rd.from_arrow(tbl).repartition(parts), "k", "s", "e")
            .to_pandas()
            .set_index("k")
        )
        assert out.loc["a", "covered"] == 30 and out.loc["a", "n_islands"] == 2
        assert out.loc["b", "covered"] == 101 and out.loc["b", "n_islands"] == 2


def test_decayed_counts_exact(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from dedupe_ray.ops.tabular import decayed_counts

    day = 86_400_000_000
    base = np.datetime64("2024-01-10", "us").astype(np.int64)
    # u: 2 events today (age 0), 1 yesterday (1), 1 three days ago (3)
    # w: 1 event three days ago only
    rows = [
        ("u", base), ("u", base + 100), ("u", base - day),
        ("u", base - 3 * day), ("w", base - 3 * day),
    ]
    tbl = pa.table(
        {
            "k": [r[0] for r in rows],
            "ts": pa.array(
                np.asarray([r[1] for r in rows], "datetime64[us]")
            ),
        }
    )
    for parts in (1, 2):
        out = (
            decayed_counts(rd.from_arrow(tbl).repartition(parts), "k", "ts")
            .to_pandas()
            .set_index("k")
        )
        # A = 3: weights 8, 4, 2, 1 for ages 0..3
        assert out.loc["u", "decayed_num"] == 2 * 8 + 1 * 4 + 1 * 1
        assert out.loc["u", "decayed_den"] == 8
        assert out.loc["u", "n_events"] == 4
        assert out.loc["w", "decayed_num"] == 1 and out.loc["w", "decayed_den"] == 8


def test_normalize_org_names_variants(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from dedupe_ray.ops.text import normalize_org_names

    tbl = pa.table(
        {
            "name": [
                "Acme Corp.",
                "ACME CORP",
                "acme corp, ltd.",
                "Widget & Sons, LLC",
                "Plain Name",
                None,
            ]
        }
    )
    out = normalize_org_names(rd.from_arrow(tbl).repartition(2), "name").to_pandas()
    norm = dict(zip(out["name"], out["normalized"]))
    assert norm["Acme Corp."] == "acme"
    assert norm["ACME CORP"] == "acme"
    assert norm["acme corp, ltd."] == "acme"
    assert norm["Widget & Sons, LLC"] == "widget sons"
    assert norm["Plain Name"] == "plain name"
    assert out["normalized"].isna().sum() == 1  # NULL stays NULL


def test_grouped_ols_stats_brute(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from dedupe_ray.ops.tabular import grouped_ols_stats

    # k1: perfect y = 3x + 1; k2: flat
    rows = [("k1", 1, 4), ("k1", 2, 7), ("k1", 3, 10), ("k2", 5, 9), ("k2", 9, 9)]
    tbl = pa.table(
        {
            "k": [r[0] for r in rows],
            "x": [r[1] for r in rows],
            "y": [r[2] for r in rows],
        }
    )
    for parts in (1, 3):
        out = (
            grouped_ols_stats(rd.from_arrow(tbl).repartition(parts), "k", "x", "y")
            .to_pandas()
            .set_index("k")
        )
        r1 = out.loc["k1"]
        assert (r1["n"], r1["sx"], r1["sy"], r1["sxy"], r1["sxx"]) == (3, 6, 21, 48, 14)
        assert r1["slope_num"] / r1["slope_den"] == 3.0
        r2 = out.loc["k2"]
        assert r2["slope_num"] == 0 and r2["slope_den"] == 2 * 106 - 196


def test_ks_statistic_brute(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from dedupe_ray.ops.tabular import ks_statistic

    a = [1, 2, 2, 3, 10]
    b = [2, 3, 3, 9, 10, 10]
    out = ks_statistic(
        rd.from_arrow(pa.table({"v": a})).repartition(2),
        rd.from_arrow(pa.table({"v": b})),
        "v",
    ).to_pandas().iloc[0]
    na, nb = len(a), len(b)
    ks_num = max(
        abs(sum(1 for x in a if x <= v) * nb - sum(1 for x in b if x <= v) * na)
        for v in sorted(set(a + b))
    )
    assert out["n_a"] == na and out["n_b"] == nb
    assert out["ks_num"] == ks_num and out["ks_den"] == na * nb

    # identical samples -> zero drift
    same = ks_statistic(
        rd.from_arrow(pa.table({"v": a})), rd.from_arrow(pa.table({"v": a})), "v"
    ).to_pandas().iloc[0]
    assert same["ks_num"] == 0


def test_dedup_cascade_funnel(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from dedupe_ray.ops.dedup import dedup_cascade

    base = (
        "the quick brown fox jumps over the lazy dog and runs far away today "
    ) * 3
    near = base.replace("lazy", "sleepy")
    docs = pa.table(
        {
            "doc_id": ["a", "b", "c", "d", "e"],
            # a==b exact dup; c near-dup of a; d, e unrelated
            "text": [base, base, near, "completely different text here", "x y z"],
        }
    )
    out = (
        rd.from_arrow(dedup_cascade(rd.from_arrow(docs).repartition(2)))
        .to_pandas()
        .set_index("stage")
    )
    assert out.loc["exact", "docs_in"] == 5
    assert out.loc["exact", "docs_removed"] == 1  # b
    assert out.loc["exact", "docs_out"] == 4
    assert out.loc["near_dup", "docs_in"] == 4
    assert out.loc["near_dup", "docs_removed"] == 1  # c near-dups a
    assert out.loc["near_dup", "docs_out"] == 3


def test_grouped_quantiles_multi_semantics(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from dedupe_ray.ops.tabular import grouped_quantiles_multi

    tbl = pa.table(
        {
            "k": ["a"] * 4 + ["b"] * 5,
            "v": [1.0, 2.0, 3.0, 4.0, 10.0, 20.0, 30.0, 40.0, 50.0],
        }
    )
    for parts in (1, 3):
        out = (
            grouped_quantiles_multi(
                rd.from_arrow(tbl).repartition(parts), "k", "v",
                qs=[0.5, 0.95, 0.99],
            )
            .to_pandas()
            .set_index("k")
        )
        # quantile_disc = element at ceil(q*n)-1
        assert out.loc["a", "n"] == 4
        assert out.loc["a", "q50"] == 2.0   # ceil(2)-1 = 1
        assert out.loc["a", "q95"] == 4.0   # ceil(3.8)-1 = 3
        assert out.loc["b", "q50"] == 30.0  # ceil(2.5)-1 = 2
        assert out.loc["b", "q99"] == 50.0


def test_pairwise_set_jaccard_brute(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from dedupe_ray.ops.tabular import pairwise_set_jaccard

    rows = [
        ("s1", "a"), ("s1", "b"), ("s1", "c"), ("s1", "a"),  # dup membership
        ("s2", "b"), ("s2", "c"), ("s2", "d"),
        ("s3", "z"),                                          # disjoint
    ]
    tbl = pa.table({"s": [r[0] for r in rows], "i": [r[1] for r in rows]})
    for parts in (1, 3):
        out = (
            pairwise_set_jaccard(rd.from_arrow(tbl).repartition(parts), "s", "i")
            .to_pandas()
            .set_index(["set_a", "set_b"])
        )
        assert list(out.index) == [("s1", "s2")]  # disjoint pair omitted
        r = out.loc[("s1", "s2")]
        assert r["inter"] == 2 and r["size_a"] == 3 and r["size_b"] == 3
        # jaccard = 2 / (3 + 3 - 2) = 0.5
        assert r["inter"] / (r["size_a"] + r["size_b"] - r["inter"]) == 0.5


def test_grouped_autocorr_moments_brute(ray_session):
    """grouped_autocorr_moments vs a pandas shift-based reference on
    random per-key series (ties in ts broken by eid); keys with < lag+1
    rows emit nothing; layout-invariant."""
    import ray.data

    from dedupe_ray.ops.tabular import grouped_autocorr_moments

    rng = np.random.RandomState(7)
    n = 400
    df = pd.DataFrame(
        {
            "u": rng.randint(0, 12, n),
            "v": np.round(rng.uniform(-20, 120, n), 2),
            "ts": rng.randint(0, 40, n),
            "eid": np.arange(n),
        }
    )
    # one singleton key (must emit nothing at lag=1)
    df.loc[0, "u"] = 99
    df = df[(df["u"] != 99) | (df.index == 0)]

    outs = []
    for nparts in (1, 5):
        out = (
            grouped_autocorr_moments(
                ray.data.from_pandas(df).repartition(nparts),
                "u", "v", ["ts", "eid"], lag=1,
            )
            .to_pandas()
            .sort_values("u")
            .reset_index(drop=True)
        )
        outs.append(out)
    pd.testing.assert_frame_equal(outs[0], outs[1])
    got = outs[0]
    assert 99 not in set(got["u"])

    for u, rows in df.groupby("u"):
        rows = rows.sort_values(["ts", "eid"])
        x = np.floor(rows["v"].to_numpy() * 100.0 + 0.5).astype(np.int64)
        if len(x) < 2:
            continue
        a, b = x[:-1], x[1:]
        r = got[got["u"] == u].iloc[0]
        assert r["n_pairs"] == len(a)
        assert r["sx"] == a.sum() and r["sy"] == b.sum()
        assert r["sxx"] == (a * a).sum() and r["syy"] == (b * b).sum()
        assert r["sxy"] == (a * b).sum()


def test_grouped_cusum_int_hand_recurrence(ray_session):
    """grouped_cusum_int vs a scalar Page recurrence per key: covers the
    clamp at 0, an alarm crossing, and the post-alarm carry reset;
    layout-invariant across partitions."""
    import ray.data

    from dedupe_ray.ops.tabular import grouped_cusum_int

    df = pd.DataFrame(
        {
            "u": ["a"] * 6 + ["b"] * 3,
            "v": [10.0, 40.0, 5.0, 45.0, 44.0, 9.0, 3.0, 3.0, 3.0],
            "ts": [1, 2, 3, 4, 5, 6, 1, 2, 3],
            "eid": list(range(9)),
        }
    )
    slack, h = 500, 2000
    outs = []
    for nparts in (1, 4):
        out = (
            grouped_cusum_int(
                ray.data.from_pandas(df).repartition(nparts),
                "u", "v", ["ts", "eid"], slack_c=slack, threshold_c=h,
            )
            .to_pandas()
            .sort_values(["u", "ts", "eid"])
            .reset_index(drop=True)
        )
        outs.append(out)
    pd.testing.assert_frame_equal(outs[0], outs[1])
    got = outs[0]

    ref = {}
    for u, rows in df.groupby("u"):
        rows = rows.sort_values(["ts", "eid"])
        x = np.floor(rows["v"].to_numpy() * 100.0 + 0.5).astype(np.int64)
        carry = 0
        for i, (_, r) in enumerate(rows.iterrows()):
            d = int(x[i]) - int(x[0]) - slack
            pre = max(0, carry + d)
            alarm = 1 if pre >= h else 0
            carry = 0 if alarm else pre
            ref[(u, r["ts"], r["eid"])] = (pre, alarm)
    alarms = 0
    for _, r in got.iterrows():
        pre, alarm = ref[(r["u"], r["ts"], r["eid"])]
        assert r["cusum_c"] == pre and r["alarm"] == alarm
        alarms += alarm
    assert alarms >= 1  # fixture actually crosses the threshold


def test_ams_f2_sketch_exact_and_layout_invariant(ray_session):
    """ams_f2_table == a direct driver computation of the five signed
    sums for every block layout; the estimate is the lower-median of
    squares and sits within the AMS error envelope of true F2."""
    import ray.data

    from dedupe_ray.ops.sketch import _CMS_A, _CMS_B, _CMS_P, ams_f2_estimate, ams_f2_table

    rng = np.random.RandomState(11)
    vals = rng.zipf(1.7, 3000).astype(np.int64) % 500  # skewed keys
    df = pd.DataFrame({"k": vals})

    u = vals % _CMS_P
    want = np.array(
        [int((2 * (((_CMS_A[j] * u + _CMS_B[j]) % _CMS_P) % 2) - 1).sum()) for j in range(5)],
        np.int64,
    )
    outs = []
    for nparts in (2, 8):
        t = (
            ams_f2_table(ray.data.from_pandas(df).repartition(nparts), "k")
            .to_pandas()
            .sort_values("sketch_row")
            .reset_index(drop=True)
        )
        outs.append(t)
    pd.testing.assert_frame_equal(outs[0], outs[1])
    assert (outs[0]["signed_sum"].to_numpy() == want).all()

    est = ams_f2_estimate(outs[0]["signed_sum"].to_numpy())
    sq = np.sort(want.astype(np.int64) ** 2)
    assert est == int(sq[2])
    f2 = int((np.bincount(vals) ** 2).sum())
    assert 0 < est < 10 * f2  # sane scale (median-of-5 single estimator)


def test_theil_sen_slope_brute_force(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from dedupe_ray.ops.tabular import theil_sen_slope

    rng = np.random.default_rng(7)
    keys, ts, vs = [], [], []
    for k, n in [("a", 9), ("b", 4), ("c", 1), ("d", 6)]:
        t = np.sort(rng.integers(0, 50, n))  # duplicate t values likely
        v = rng.integers(-100, 100, n)
        keys += [k] * n
        ts += t.tolist()
        vs += v.tolist()
    keys += ["e", "e"]  # all pairs at equal t -> key dropped
    ts += [5, 5]
    vs += [1, 2]
    tbl = pa.table({"k": keys, "t": pa.array(ts, pa.int64()),
                    "v": pa.array(vs, pa.int64())})
    scale = 10**6

    def brute(t, v):
        slopes = []
        for i in range(len(t)):
            for j in range(len(t)):
                if t[j] > t[i]:
                    slopes.append((scale * (v[j] - v[i])) // (t[j] - t[i]))
        if not slopes:
            return None
        slopes.sort()
        return len(slopes), slopes[(len(slopes) + 1) // 2 - 1]

    expect = {}
    for k in set(keys):
        idx = [i for i, kk in enumerate(keys) if kk == k]
        r = brute([ts[i] for i in idx], [vs[i] for i in idx])
        if r is not None:
            expect[k] = r

    for parts in (1, 4):
        out = theil_sen_slope(
            rd.from_arrow(tbl).repartition(parts), "k", "t", "v", scale=scale
        ).to_pandas()
        got = {r["k"]: (r["n_pairs"], r["slope_micro"])
               for _, r in out.iterrows()}
        assert got == expect
    assert "c" not in got and "e" not in got  # singleton and all-tied drop


def test_calibration_report_hand_computed(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from dedupe_ray.eval import calibration_report

    # p_milli, y rows: bin 0 holds {50/0, 80/1}, bin 9 holds {950/1, 999/0,
    # 1000/1 (clamped into bin 9)}
    tbl = pa.table(
        {
            "p": pa.array([50, 80, 950, 999, 1000], pa.int64()),
            "y": pa.array([0, 1, 1, 0, 1], pa.int64()),
        }
    )
    for parts in (1, 3):
        out = calibration_report(
            rd.from_arrow(tbl).repartition(parts), "p", "y"
        ).to_pandas()
        assert out["bin"].tolist() == [0, 9]
        assert out["n"].tolist() == [2, 3]
        assert out["sum_p_milli"].tolist() == [130, 2949]
        assert out["sum_y"].tolist() == [1, 2]
        assert out["gap_abs"].tolist() == [abs(130 - 1000), abs(2949 - 2000)]
        # brier: (50-0)^2+(80-1000)^2 ; (950-1000)^2+(999-0)^2+(1000-1000)^2
        assert out["brier_num"].tolist() == [
            50**2 + 920**2,
            50**2 + 999**2 + 0,
        ]


def test_calibration_report_rejects_bad_inputs(ray_session):
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from dedupe_ray.eval import calibration_report

    bad_p = rd.from_arrow(pa.table({"p": [1001], "y": [0]}))
    with pytest.raises(Exception):
        calibration_report(bad_p, "p", "y")
    bad_y = rd.from_arrow(pa.table({"p": [500], "y": [2]}))
    with pytest.raises(Exception):
        calibration_report(bad_y, "p", "y")


def test_watermark_late_filter_brute_force(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from dedupe_ray.ops.tabular import watermark_late_filter

    # per-key arrival sequences with out-of-order event times
    rows = [
        # (key, arrival, ts) — key a: wm walks 10,50,50,70; ts 20 at
        # arrival 3 is 30 behind wm=50: dropped at delay 25, kept at 40
        ("a", 1, 10), ("a", 2, 50), ("a", 3, 20), ("a", 4, 70),
        ("b", 1, 100), ("b", 2, 40),  # 60 behind: dropped at both delays
    ]
    tbl = pa.table(
        {
            "k": [r[0] for r in rows],
            "arr": pa.array([r[1] for r in rows], pa.int64()),
            "t": pa.array([r[2] for r in rows], pa.int64()),
        }
    )

    def brute(delay):
        keep = []
        for k in ("a", "b"):
            wm = None
            for kk, arr, t in rows:
                if kk != k:
                    continue
                wm = t if wm is None else max(wm, t)
                if t >= wm - delay:
                    keep.append((k, arr, t))
        return sorted(keep)

    for delay in (25, 40):
        for parts in (1, 3):
            out = watermark_late_filter(
                rd.from_arrow(tbl).repartition(parts), "k", "t", ["arr"], delay
            ).to_pandas()
            got = sorted(map(tuple, out[["k", "arr", "t"]].to_numpy()))
            assert got == brute(delay), (delay, parts)


def test_cms_inner_product_exact_on_sparse_keys(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from dedupe_ray.ops.sketch import cms_inner_product, cms_table

    # few distinct keys + wide table -> no collisions -> est is EXACT
    a = rd.from_arrow(pa.table({"k": pa.array([1, 1, 1, 2, 5], pa.int64())}))
    b = rd.from_arrow(pa.table({"k": pa.array([1, 2, 2, 7], pa.int64())}))
    out = cms_inner_product(
        cms_table(a, "k", width=1024, depth=3),
        cms_table(b, "k", width=1024, depth=3),
        width=1024,
        depth=3,
    ).to_pandas()
    # true join size: key1 3*1 + key2 1*2 = 5; keys 5,7 unmatched
    assert out["sketch_row"].tolist() == [0, 1, 2]
    assert (out["est"] == 5).all()
    assert (out["dot"] >= 5).all()  # CMS rows only ever overestimate


def test_rendezvous_assign_minimal_disruption(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from dedupe_ray.ops.tabular import rendezvous_assign

    keys = pa.table({"k": pa.array(list(range(1, 500)), pa.int64())})
    full = rendezvous_assign(
        rd.from_arrow(keys), "k", [0, 1, 2, 3, 4]
    ).to_pandas().set_index("k")["shard"]
    # every shard gets some keys (sanity: the hash spreads)
    assert set(full.unique()) == {0, 1, 2, 3, 4}
    # remove shard 3: ONLY shard-3 keys move, everyone else is untouched
    reduced = rendezvous_assign(
        rd.from_arrow(keys), "k", [0, 1, 2, 4]
    ).to_pandas().set_index("k")["shard"]
    stay = full[full != 3]
    assert (reduced.loc[stay.index] == stay).all()
    assert (reduced.loc[full[full == 3].index] != 3).all()


def test_grouped_holt_int_scalar_parity(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from dedupe_ray.ops.tabular import grouped_holt_int

    rng = np.random.default_rng(3)
    keys, ords, vals = [], [], []
    for k, n in [("a", 7), ("b", 1), ("c", 12)]:
        keys += [k] * n
        ords += list(range(n))
        vals += (rng.uniform(-50, 50, n)).tolist()
    tbl = pa.table({"k": keys, "o": pa.array(ords, pa.int64()),
                    "v": pa.array(vals, pa.float64())})

    def fd(a, d):
        return (a - ((a % d) + d) % d) // d

    expect = {}
    for k in ("a", "b", "c"):
        xs = [int(np.floor(v * 100 + 0.5))
              for kk, v in zip(keys, vals) if kk == k]
        l, b = xs[0], 0
        expect[(k, 0)] = (l, b)
        for i in range(1, len(xs)):
            l2 = fd(1 * xs[i] + 3 * (l + b), 4)
            b = fd(1 * (l2 - l) + 3 * b, 4)
            l = l2
            expect[(k, i)] = (l, b)

    for parts in (1, 4):
        out = grouped_holt_int(
            rd.from_arrow(tbl).repartition(parts), "k", "v", ["o"]
        ).to_pandas()
        got = {(r["k"], r["o"]): (r["level_c"], r["trend_c"])
               for _, r in out.iterrows()}
        assert got == expect, parts


def _cdc_reference_chunks(texts):
    """Scalar gear recurrence reference: h = (h<<1) + GEAR[b] per byte,
    cut when low mask bits zero and pos >= 64; returns chunk multiset."""
    import hashlib
    from collections import Counter

    from dedupe_ray.ops.dedup import _GEAR

    mask = (1 << 6) - 1
    out = Counter()
    for s in texts:
        b = s.encode("utf-8")
        h = 0
        cuts = []
        for t, byte in enumerate(b):
            h = ((h << 1) + int(_GEAR[byte])) & ((1 << 64) - 1)
            if (h & mask) == 0 and t >= 64:
                cuts.append(t)
        bounds = [0, *cuts, len(b)]
        for lo, hi in zip(bounds, bounds[1:]):
            if hi > lo:
                piece = b[lo:hi]
                h64 = int.from_bytes(hashlib.md5(piece).digest()[:8], "big",
                                     signed=True)
                out[(h64, hi - lo)] += 1
    return out


def test_gear_cdc_chunk_table_scalar_parity(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from dedupe_ray.ops.dedup import cdc_dedup_summary, gear_cdc_chunk_table

    rng = np.random.default_rng(5)
    alphabet = "abcdefgh \n"
    texts = [
        "".join(rng.choice(list(alphabet), size=int(n)))
        for n in rng.integers(0, 600, 40)
    ]
    texts.append(texts[0])  # exact duplicate: all its chunks dedup away
    ref = _cdc_reference_chunks(texts)

    tbl = pa.table({"doc_id": [f"d{i}" for i in range(len(texts))],
                    "text": texts})
    for parts in (1, 5):
        out = gear_cdc_chunk_table(
            rd.from_arrow(tbl).repartition(parts), "doc_id", "text"
        ).to_pandas()
        got = {(r["chunk_hash"], r["length"]): r["n"]
               for _, r in out.iterrows()}
        assert got == dict(ref), parts

    summ = cdc_dedup_summary(
        gear_cdc_chunk_table(rd.from_arrow(tbl), "doc_id", "text")
    ).to_pandas()
    assert summ["total_bytes"][0] == sum(len(t.encode()) for t in texts)
    assert summ["uniq_chunks"][0] == len(ref)
    assert summ["uniq_bytes"][0] == sum(ln for (_, ln) in ref)
    assert summ["total_chunks"][0] == sum(ref.values())
    # the duplicated doc guarantees real dedup happened
    assert summ["uniq_bytes"][0] < summ["total_bytes"][0]


def test_gear_cdc_edit_locality(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from dedupe_ray.ops.dedup import gear_cdc_chunk_table

    import numpy as np

    rng = np.random.default_rng(9)
    # aperiodic text: a periodic string can cycle without ever hitting a
    # cut (the 44-byte-period trap) — random bytes cut every ~64 bytes
    base = "".join(rng.choice(list("abcdefghijklmnop qrstuv"), size=4000))
    edited = base[:2000] + "X" + base[2000:]  # one inserted byte mid-doc
    t1 = pa.table({"doc_id": ["a"], "text": [base]})
    t2 = pa.table({"doc_id": ["a"], "text": [edited]})
    c1 = gear_cdc_chunk_table(rd.from_arrow(t1)).to_pandas()
    c2 = gear_cdc_chunk_table(rd.from_arrow(t2)).to_pandas()
    s1 = set(zip(c1["chunk_hash"], c1["length"]))
    s2 = set(zip(c2["chunk_hash"], c2["length"]))
    # content-defined cuts resynchronize: most chunks survive the edit
    assert len(s1 & s2) >= len(s1) * 0.5


def test_l_diversity_suppress_hand_case(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from dedupe_ray.ops.tabular import l_diversity_suppress

    tbl = pa.table(
        {
            "qi": ["a", "a", "a", "b", "b", "c", "c"],
            "sens": ["x", "y", "x", "x", "x", "y", None],
            "v": pa.array(range(7), pa.int64()),
        }
    )
    # distinct sens per qi: a -> {x,y}=2, b -> {x}=1, c -> {y,NULL}=2
    out = l_diversity_suppress(
        rd.from_arrow(tbl).repartition(3), ["qi"], "sens", l=2
    ).to_pandas()
    assert sorted(out["qi"].unique()) == ["a", "c"]  # b leaks: suppressed
    assert len(out) == 5
    # NULL sensitive counts as ONE value (c survives because of it)


def test_pr_curve_stats_hand_case(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from dedupe_ray.eval import pr_curve_stats

    # scores: 3(y=1), 2(y=0), 2(y=1), 1(y=0)
    tbl = pa.table(
        {
            "s": pa.array([3, 2, 2, 1], pa.int64()),
            "y": pa.array([1, 0, 1, 0], pa.int64()),
        }
    )
    for parts in (1, 2):
        out = pr_curve_stats(
            rd.from_arrow(tbl).repartition(parts), "s", "y"
        ).to_pandas()
        assert out["threshold"].tolist() == [3, 2, 1]
        assert out["tp"].tolist() == [1, 2, 2]
        assert out["fp"].tolist() == [0, 1, 2]
        assert out["fn"].tolist() == [1, 0, 0]
        assert out["tn"].tolist() == [2, 1, 0]


def test_category_vocab_fit_apply(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from dedupe_ray.ops.tabular import apply_category_vocab, fit_category_vocab

    tbl = pa.table({"c": ["b", "a", "b", "c", "a", "b", None]})
    ds = rd.from_arrow(tbl).repartition(3)
    vocab = fit_category_vocab(ds, "c")
    # count desc, value asc: b(3)->0, a(2)->1, c(1)->2; NULL excluded
    got = dict(zip(vocab.column("value").to_pylist(),
                   vocab.column("code").to_pylist()))
    assert got == {"b": 0, "a": 1, "c": 2}
    out = apply_category_vocab(ds, "c", vocab).to_pandas()
    assert out["code"].tolist()[:6] == [0, 1, 0, 2, 1, 0]
    assert out["code"].isna().tolist()[-1]  # NULL -> null code


def test_target_encode_hand_case(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from dedupe_ray.ops.tabular import target_encode

    tbl = pa.table(
        {
            "cat": ["a", "a", "b"],
            "t": pa.array([10, 20, 100], pa.int64()),
        }
    )
    out = target_encode(
        rd.from_arrow(tbl).repartition(2), "cat", "t", smoothing=2
    ).to_pandas().set_index("category")
    gn, gs, k = 3, 130, 2
    assert out.loc["a", "enc_micro"] == (10**6 * (30 * gn + k * gs)) // (
        gn * (2 + k)
    )
    assert out.loc["b", "enc_micro"] == (10**6 * (100 * gn + k * gs)) // (
        gn * (1 + k)
    )
    # smoothing pulls the singleton toward the global mean
    import pytest

    with pytest.raises(Exception):
        target_encode(
            rd.from_arrow(pa.table({"cat": ["a"], "t": [-1]})), "cat", "t"
        )


def test_woe_table_hand_case(ray_session):
    import math

    import pyarrow as pa
    import ray.data as rd

    from dedupe_ray.ops.tabular import woe_table

    tbl = pa.table(
        {
            "c": ["a", "a", "a", "b", "b", "z", "z"],
            "y": pa.array([1, 1, 0, 0, 0, 1, 1], pa.int64()),
        }
    )
    out = woe_table(
        rd.from_arrow(tbl).repartition(3), "c", "y"
    ).to_pandas().set_index("category")
    # G=4 pos, B=3 neg; 'z' (pure-positive) and 'b' (pure-negative) are
    # dropped — WoE is undefined there
    assert sorted(out.index) == ["a"]
    assert out.loc["a", "woe_micro"] == math.floor(
        1e6 * math.log((2 * 3) / (1 * 4))
    )
    assert out.loc["a", "pos"] == 2 and out.loc["a", "neg"] == 1


def test_token_bucket_replay_scalar_parity(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from dedupe_ray.ops.tabular import token_bucket_replay

    # per-key event times (seconds), converted to epoch micros
    series = {
        "a": [0, 1, 2, 3, 10, 10, 11],  # bursts then refill; equal ts tie
        "b": [5],
        "c": [0, 100],
    }
    rows = [(k, s * 1_000_000, i) for k, ss in series.items()
            for i, s in enumerate(ss)]
    tbl = pa.table(
        {
            "k": [r[0] for r in rows],
            "t": pa.array([r[1] for r in rows], pa.int64()),
            "e": pa.array([r[2] for r in rows], pa.int64()),
        }
    )
    rate, cap = 500, 3000

    def brute(ts):
        tok, out = cap, []
        prev = None
        for t in ts:
            dt = 0 if prev is None else (t - prev) // 1_000_000
            prev = t
            tnew = min(cap, tok + rate * dt) if out else cap
            a = 1 if tnew >= 1000 else 0
            tok = tnew - 1000 * a
            out.append((a, tok))
        return out

    expect = {}
    for k, ss in series.items():
        for i, (a, tok) in enumerate(brute([s * 1_000_000 for s in ss])):
            expect[(k, i)] = (a, tok)

    for parts in (1, 3):
        out = token_bucket_replay(
            rd.from_arrow(tbl).repartition(parts), "k", "t", ["t", "e"],
            rate_milli=rate, cap_milli=cap,
        ).to_pandas()
        got = {(r["k"], r["e"]): (r["admitted"], r["tokens_milli"])
               for _, r in out.iterrows()}
        assert got == expect, parts


def test_token_bucket_rejects_small_cap(ray_session):
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from dedupe_ray.ops.tabular import token_bucket_replay

    with pytest.raises(ValueError):
        token_bucket_replay(
            rd.from_arrow(pa.table({"k": ["a"], "t": [0], "e": [0]})),
            "k", "t", ["t", "e"], cap_milli=500,
        )


def test_ngram_cosine_pairs_brute_force(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from dedupe_ray.ops.dedup import ngram_cosine_pairs

    texts = [
        "the cat sat on the mat the cat",      # repetition-heavy
        "the cat sat on the mat",              # same set, lighter counts
        "a dog ran through a park",            # disjoint-ish
        "the cat the cat the cat",             # extreme repetition
        "",                                    # empty
    ]
    tbl = pa.table({"doc_id": [str(i) for i in range(len(texts))],
                    "text": texts})

    from collections import Counter

    def vec(s):
        return Counter(s.lower().split())

    expect = set()
    for i in range(len(texts)):
        for j in range(i + 1, len(texts)):
            a, b = vec(texts[i]), vec(texts[j])
            dot = sum(a[g] * b[g] for g in a)
            na = sum(v * v for v in a.values())
            nb = sum(v * v for v in b.values())
            if na and nb and 4 * dot * dot >= na * nb:
                expect.add((str(i), str(j), dot, na, nb))

    for parts in (1, 3):
        out = ngram_cosine_pairs(
            rd.from_arrow(tbl).repartition(parts), 1, 2
        ).to_pandas()
        got = set(
            zip(out["id_a"], out["id_b"], out["dot"],
                out["norm_a2"], out["norm_b2"])
        )
        assert got == expect, parts
    # the repetition-heavy pair (0, 3) must be found by cosine
    assert any(p[0] == "0" and p[1] == "3" for p in expect)


def test_probe_image_meta_parity_with_decoders():
    """Header probe (format, w, h, channels) agrees with the full
    decoders' output shapes on every supported codec — without touching
    pixel data."""
    import numpy as np

    from dedupe_ray.ops.multimodal import (
        decode_bmp,
        decode_gif,
        decode_jpeg,
        decode_png,
        decode_ppm,
        decode_tiff,
        probe_image_meta,
    )

    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (12, 17, 3)).astype(np.uint8)
    gray = img[:, :, 0]

    ppm, _img = _ppm_bytes(17, 12, lambda x, y: (x * 3 % 256, y * 5 % 256, 7))
    assert probe_image_meta(ppm) == ("ppm", 17, 12, 3)
    assert decode_ppm(ppm).shape == (12, 17, 3)

    png_rgb = _png_bytes(img, 2, [0] * 12)
    assert probe_image_meta(png_rgb) == ("png", 17, 12, 3)
    assert decode_png(png_rgb).shape == (12, 17, 3)

    png_gray = _png_bytes(gray, 0, [0] * 12)
    assert probe_image_meta(png_gray) == ("png", 17, 12, 1)
    assert decode_png(png_gray).shape == (12, 17)

    jpg = _jpeg_bytes(img)
    assert probe_image_meta(jpg) == ("jpeg", 17, 12, 3)
    assert decode_jpeg(jpg).shape == (12, 17, 3)

    pal = np.arange(12, dtype=np.uint8).reshape(4, 3) * 20
    idx = rng.integers(0, 4, (9, 11)).astype(np.uint8)
    gif = _gif_bytes(idx, pal)
    assert probe_image_meta(gif) == ("gif", 11, 9, 3)
    assert decode_gif(gif).shape == (9, 11, 3)

    tif = _tiff_bytes(gray)
    kind, w, h, _c = probe_image_meta(tif)
    assert (kind, w, h) == ("tiff", 17, 12)
    assert decode_tiff(tif).shape[:2] == (12, 17)

    assert probe_image_meta(b"not an image at all") is None
    assert probe_image_meta(b"") is None


def test_grouped_running_peak_hand_case(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from dedupe_ray.ops.tabular import grouped_running_peak

    tbl = pa.table(
        {
            "k": ["a", "a", "a", "a", "b"],
            "o": pa.array([1, 2, 3, 4, 1], pa.int64()),
            "v": pa.array([10, 30, 20, 40, -5], pa.int64()),
        }
    )
    for parts in (1, 3):
        out = (
            grouped_running_peak(
                rd.from_arrow(tbl).repartition(parts), "k", ["o"], "v"
            )
            .to_pandas()
            .sort_values(["k", "o"])
            .reset_index(drop=True)
        )
        assert out["peak"].tolist() == [10, 30, 30, 40, -5]
        assert out["drawdown"].tolist() == [0, 0, 10, 0, 0]


def test_grouped_gmd_matches_brute_force(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from dedupe_ray.ops.tabular import grouped_gini_mean_difference

    rng = np.random.default_rng(13)
    keys, vals = [], []
    for k, n in [("a", 8), ("b", 2), ("c", 1), ("d", 30)]:
        keys += [k] * n
        vals += rng.integers(-100, 100, n).tolist()
    tbl = pa.table({"k": keys, "v": pa.array(vals, pa.int64())})

    expect = {}
    for k in ("a", "b", "d"):
        vs = [v for kk, v in zip(keys, vals) if kk == k]
        s = sum(abs(vs[i] - vs[j]) for i in range(len(vs))
                for j in range(i + 1, len(vs)))
        expect[k] = (len(vs), s)

    for parts in (1, 3):
        out = grouped_gini_mean_difference(
            rd.from_arrow(tbl).repartition(parts), "k", "v"
        ).to_pandas()
        got = {r["k"]: (r["n"], r["sum_abs_diff"]) for _, r in out.iterrows()}
        assert got == expect, parts  # singleton key 'c' dropped


def test_top_n_with_others_hand_case(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from dedupe_ray.ops.tabular import top_n_with_others

    tbl = pa.table(
        {
            "k": pa.array([1, 1, 2, 3, 4, 5], pa.int64()),
            "v": pa.array([50, 50, 80, 60, 10, 5], pa.int64()),
        }
    )
    out = top_n_with_others(
        rd.from_arrow(tbl).repartition(2), "k", "v", n=2
    ).to_pandas()
    assert out["key"].tolist() == ["1", "2", "OTHER"]
    assert out["total"].tolist() == [100, 80, 75]
    assert out["n_keys"].tolist() == [1, 1, 3]


def test_grouped_median_gap_brute_force(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from dedupe_ray.ops.tabular import grouped_median_gap

    series = {"a": [0, 10, 15, 100], "b": [5, 5, 9], "c": [7]}
    rows = [(k, t, i) for k, ts in series.items() for i, t in enumerate(ts)]
    tbl = pa.table(
        {
            "k": [r[0] for r in rows],
            "t": pa.array([r[1] for r in rows], pa.int64()),
            "e": pa.array([r[2] for r in rows], pa.int64()),
        }
    )
    expect = {}
    for k, ts in series.items():
        gaps = sorted(b - a for a, b in zip(ts, ts[1:]))
        if gaps:
            expect[k] = (len(gaps), gaps[(len(gaps) + 1) // 2 - 1])
    # a: gaps [10,5,85] -> sorted [5,10,85] -> median 10
    assert expect["a"] == (3, 10)
    assert expect["b"] == (2, 0)  # duplicate-ts gap of 0 counts

    for parts in (1, 3):
        out = grouped_median_gap(
            rd.from_arrow(tbl).repartition(parts), "k", "t", "e"
        ).to_pandas()
        got = {r["k"]: (r["n_gaps"], r["median_gap"])
               for _, r in out.iterrows()}
        assert got == expect, parts


def test_exact_dedup_mapping_consistency(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from dedupe_ray.ops.dedup import exact_dedup, exact_dedup_mapping

    tbl = pa.table(
        {
            "doc_id": ["d3", "d1", "d2", "d4", "d5"],
            "text": ["x", "x", "y", "x", "y"],
        }
    )
    for parts in (1, 3):
        ds = rd.from_arrow(tbl).repartition(parts)
        kept = set(exact_dedup(ds, "text", "doc_id").to_pandas()["doc_id"])
        mp = exact_dedup_mapping(ds, "text", "doc_id").to_pandas()
        got = dict(zip(mp["dropped_id"], mp["kept_id"]))
        assert got == {"d3": "d1", "d4": "d1", "d5": "d2"}, parts
        # mapping + survivors partition the corpus exactly
        assert kept == {"d1", "d2"}
        assert kept.isdisjoint(got.keys())
        assert set(got.values()) <= kept


def test_column_entropy_profile_hand_case(ray_session):
    import math

    import pyarrow as pa
    import ray.data as rd

    from dedupe_ray.ops.tabular import column_entropy_profile

    tbl = pa.table(
        {
            "a": ["x", "x", "y", None],  # counts 2,1,1 (null is a value)
            "b": ["z", "z", "z", "z"],   # constant -> entropy 0
        }
    )
    out = column_entropy_profile(
        rd.from_arrow(tbl).repartition(2), ["a", "b"]
    ).to_pandas().set_index("column")
    n = 4

    def term(c):
        return c * math.floor(1e6 * math.log(n / c))

    assert out.loc["a", "n"] == 4 and out.loc["a", "n_distinct"] == 3
    assert out.loc["a", "entropy_micro"] == term(2) + term(1) + term(1)
    assert out.loc["b", "entropy_micro"] == 0
    assert out.loc["b", "n_distinct"] == 1


def test_shuffle_skew_report_counts(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from dedupe_ray.ops.tabular import shuffle_skew_report

    keys = ["hot"] * 90 + [f"k{i}" for i in range(10)]
    out = shuffle_skew_report(
        rd.from_arrow(pa.table({"k": keys})).repartition(3), "k", n_buckets=16
    ).to_pandas()
    assert out["total_rows"].iloc[0] == 100
    assert out["rows"].sum() == 100
    assert out["max_rows"].iloc[0] == out["rows"].max() >= 90  # hot key shows
    assert out["n_nonempty"].iloc[0] == len(out) <= 11


def test_grouped_mad_outliers_hand_case(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from dedupe_ray.ops.tabular import grouped_mad_outliers

    # key a: values 10,12,14,16,100 -> median 14 (lower), devs
    # 4,2,0,2,86 -> MAD 2 -> threshold 6 -> only 100 flags
    # key b: constant -> MAD 0 -> any deviation flags
    tbl = pa.table(
        {
            "k": ["a"] * 5 + ["b"] * 3,
            "e": pa.array(range(8), pa.int64()),
            "v": pa.array([10, 12, 14, 16, 100, 5, 5, 7], pa.int64()),
        }
    )
    for parts in (1, 3):
        out = (
            grouped_mad_outliers(
                rd.from_arrow(tbl).repartition(parts), "k", "v"
            )
            .to_pandas()
            .sort_values("e")
            .reset_index(drop=True)
        )
        assert out["is_outlier"].tolist() == [0, 0, 0, 0, 1, 0, 0, 1], parts
