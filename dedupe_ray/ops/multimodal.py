"""Multimodal (image/audio/video) column plumbing.

Media ride as opaque payloads: either ``media_ref: string`` pointers inside
the span column (BASELINE.json input_hint) or a ``payload: binary`` column
with typed metadata. The Ray-side plumbing — schemas, actor-pool stages,
batch sizing for wide binary rows, output layout — is real and tested; the
codec work itself is STUBBED (no image/audio libraries exist in this
environment): ``DecodeImage`` raises ``NotImplementedError`` unless
``fake=True``, in which case a deterministic fake decoder (seeded by the
payload hash) produces stable pseudo-features so downstream stages are
testable end to end.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa

import ray.data

MEDIA_SCHEMA = pa.schema(
    [
        ("media_ref", pa.string()),
        ("kind", pa.string()),  # image | audio | video
        ("payload", pa.binary()),
        ("width", pa.int32()),
        ("height", pa.int32()),
    ]
)


def extract_media_spans(batch: pa.Table) -> pa.Table:
    """Span documents → one row per media span (doc_id, kind, media_ref) —
    the fan-out side of a media-processing pipeline (vectorized flatten)."""
    spans = batch.column("spans")
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    flat = spans.flatten()
    offsets = spans.offsets.to_numpy(zero_copy_only=False)
    parent = np.repeat(np.arange(len(batch)), np.diff(offsets))
    kinds = np.asarray(flat.field("kind").to_pylist(), object)
    refs = np.asarray(flat.field("media_ref").to_pylist(), object)
    doc_ids = np.asarray(batch.column("doc_id").to_pylist(), object)
    mask = np.array([not k.startswith("field:") and k != "text" for k in kinds])
    return pa.table(
        {
            "doc_id": pa.array(doc_ids[parent[mask]], pa.string()),
            "kind": pa.array(kinds[mask], pa.string()),
            "media_ref": pa.array(refs[mask], pa.string()),
        }
    )


class DecodeImage:
    """Actor-pool stage: media_ref/payload → decoded features.

    Real pipelines load the codec model once per actor here (``__init__``)
    and decode per batch. In this sandbox there are no codecs: with
    ``fake=True`` a deterministic stand-in emits stable (seeded by ref hash)
    width/height/embedding so the distributed plumbing is fully exercised;
    with ``fake=False`` the stage raises NotImplementedError, marking the
    integration point."""

    FEATURE_DIM = 8

    def __init__(self, fake: bool = False):
        self.fake = fake

    def _decode_one(self, ref: str) -> tuple[int, int, np.ndarray]:
        if not self.fake:
            raise NotImplementedError(
                "image decoding requires a codec library (PIL/ffmpeg) — not "
                "available in this environment; pass fake=True for the "
                "deterministic test decoder"
            )
        seed = zlib.crc32(ref.encode())
        rng = np.random.RandomState(seed)
        w, h = int(rng.randint(64, 1024)), int(rng.randint(64, 1024))
        feat = rng.rand(self.FEATURE_DIM).astype(np.float32)
        return w, h, feat

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs = batch.column("media_ref").to_pylist()
        ws, hs, feats = [], [], []
        for r in refs:
            w, h, f = self._decode_one(r or "")
            ws.append(w)
            hs.append(h)
            feats.append(f)
        feat_arr = (
            pa.FixedSizeListArray.from_arrays(
                pa.array(np.concatenate(feats) if feats else np.zeros(0, np.float32)),
                self.FEATURE_DIM,
            )
            if feats
            else pa.array([], pa.list_(pa.float32(), self.FEATURE_DIM))
        )
        out = batch.append_column("width", pa.array(ws, pa.int32()))
        out = out.append_column("height", pa.array(hs, pa.int32()))
        return out.append_column("features", feat_arr)


class ResizeImage:
    """Actor-pool stage: (width, height[, payload]) → resized dimensions +
    a resize plan. The arithmetic (aspect-preserving fit into
    ``max_side`` × ``max_side``) is real and vectorized; the pixel work is
    the stubbed codec integration point (same contract as DecodeImage)."""

    def __init__(self, max_side: int = 256, fake: bool = True):
        self.max_side = max_side
        if not fake:
            raise NotImplementedError(
                "pixel resampling requires a codec library — not available "
                "in this environment; the stage computes target geometry only"
            )

    def __call__(self, batch: pa.Table) -> pa.Table:
        w = batch.column("width").to_numpy(zero_copy_only=False).astype(np.float64)
        h = batch.column("height").to_numpy(zero_copy_only=False).astype(np.float64)
        scale = np.minimum(1.0, self.max_side / np.maximum(np.maximum(w, h), 1.0))
        out = batch.append_column(
            "resized_w", pa.array(np.maximum(1, np.round(w * scale)).astype(np.int32))
        )
        return out.append_column(
            "resized_h", pa.array(np.maximum(1, np.round(h * scale)).astype(np.int32))
        )


class FrameSample:
    """Actor-pool stage for video spans: pick ``n_frames`` deterministic
    sample timestamps per clip (uniform over a fake duration seeded by the
    ref — stable across runs). Emits one row per sampled frame
    (doc/media fan-out #2); the actual frame grab is the codec stub."""

    def __init__(self, n_frames: int = 4):
        self.n_frames = n_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs = batch.column("media_ref").to_pylist()
        n = len(refs)
        k = self.n_frames
        # per-row seeded duration: only the scalar rng runs per row; the
        # row fan-out itself is one vectorized take (no as_py copies)
        durations = np.empty(n, np.float64)
        for i, r in enumerate(refs):
            rng = np.random.RandomState(zlib.crc32((r or "").encode()) ^ 0x5EED)
            durations[i] = float(rng.randint(2, 600))
        stamps = np.stack(
            [np.linspace(0.0, d, k + 2)[1:-1] for d in durations]
        ) if n else np.zeros((0, k))
        ts = np.round(stamps.reshape(-1), 3)
        out = batch.take(pa.array(np.repeat(np.arange(n, dtype=np.int64), k)))
        return out.append_column("frame_ts", pa.array(ts, pa.float64()))


def media_feature_pipeline(
    docs_ds: "ray.data.Dataset",
    fake_decode: bool = True,
    batch_size: int = 256,
    concurrency=(1, 4),
) -> "ray.data.Dataset":
    """Span docs → media spans → decoded features.

    batch_size is deliberately small: media rows are wide (binary payloads at
    production scale), so batch × concurrency must fit worker heap."""
    media = docs_ds.map_batches(extract_media_spans, batch_format="pyarrow")
    return media.map_batches(
        DecodeImage,
        fn_constructor_args=(fake_decode,),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
