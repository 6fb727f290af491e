"""Pure-python Avro Object Container File codec for FLAT record schemas —
the long/double/string/bytes/boolean/timestamp-micros subset that tabular
pipelines exchange (Avro spec 1.11, public). No avro library ships in this
environment, so encode/decode are implemented from the spec: zigzag-varint
longs, IEEE little-endian doubles, length-prefixed utf8/bytes, nullable
fields as ["null", T] unions, blocks deflate-compressed (raw, wbits=-15)
behind a deterministic schema-derived sync marker.

Byte-level correctness is pinned by tests that hand-assemble an Avro file
(so writer and reader bugs cannot cancel), mirroring the GIF/LZW approach.
"""

from __future__ import annotations

import hashlib
import json
import struct
import zlib

import numpy as np
import pyarrow as pa

MAGIC = b"Obj\x01"


def _enc_long(n: int, out: bytearray) -> None:
    n = (n << 1) ^ (n >> 63) if n >= 0 else ((-n - 1) << 1 | 1)  # zigzag
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _dec_long(data: bytes, pos: int) -> tuple[int, int]:
    shift = 0
    acc = 0
    while True:
        b = data[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1), pos  # un-zigzag


def _enc_bytes(b: bytes, out: bytearray) -> None:
    _enc_long(len(b), out)
    out += b


_ARROW_TO_AVRO = [
    (pa.types.is_boolean, "boolean"),
    (pa.types.is_integer, "long"),
    (pa.types.is_floating, "double"),
    (pa.types.is_string, "string"),
    (pa.types.is_binary, "bytes"),
]


def _avro_type(t: pa.DataType):
    if pa.types.is_timestamp(t):
        return {"type": "long", "logicalType": "timestamp-micros"}
    for pred, name in _ARROW_TO_AVRO:
        if pred(t):
            return name
    raise ValueError(f"unsupported Arrow type for Avro: {t}")


def schema_json(tbl_schema: pa.Schema, name: str = "row") -> str:
    fields = [
        {"name": f.name, "type": ["null", _avro_type(f.type)]}
        for f in tbl_schema
    ]
    return json.dumps(
        {"type": "record", "name": name, "fields": fields}, sort_keys=True
    )


def _sync(schema: str) -> bytes:
    return hashlib.md5(schema.encode()).digest()  # deterministic marker


def encode_table(tbl: pa.Table, codec: str = "deflate") -> bytes:
    """Arrow table → one self-contained Avro OCF (single block)."""
    schema = schema_json(tbl.schema)
    sync = _sync(schema)
    out = bytearray()
    out += MAGIC
    meta = {"avro.schema": schema.encode(), "avro.codec": codec.encode()}
    _enc_long(len(meta), out)
    for k, v in sorted(meta.items()):
        _enc_bytes(k.encode(), out)
        _enc_bytes(v, out)
    _enc_long(0, out)  # end of metadata map
    out += sync

    body = bytearray()
    cols = []
    for f in tbl.schema:
        col = tbl.column(f.name)
        is_ts = pa.types.is_timestamp(f.type)
        vals = col.to_pylist()
        if is_ts:
            iv = col.cast(pa.int64()).to_pylist()
            vals = iv
        cols.append((f.type, vals))
    for i in range(len(tbl)):
        for t, vals in cols:
            v = vals[i]
            if v is None:
                _enc_long(0, body)  # union branch: null
                continue
            _enc_long(1, body)  # union branch: value
            if pa.types.is_boolean(t):
                body.append(1 if v else 0)
            elif pa.types.is_integer(t) or pa.types.is_timestamp(t):
                _enc_long(int(v), body)
            elif pa.types.is_floating(t):
                body += struct.pack("<d", float(v))
            elif pa.types.is_string(t):
                _enc_bytes(v.encode("utf-8"), body)
            else:  # binary
                _enc_bytes(bytes(v), body)
    payload = bytes(body)
    if codec == "deflate":
        co = zlib.compressobj(6, zlib.DEFLATED, -15)
        payload = co.compress(payload) + co.flush()
    elif codec != "null":
        raise ValueError(f"unsupported codec {codec!r}")
    _enc_long(len(tbl), out)
    _enc_long(len(payload), out)
    out += payload
    out += sync
    return bytes(out)


def decode_file(data: bytes, columns: list[str] | None = None) -> pa.Table:
    """Avro OCF bytes → Arrow table (flat null-union records only)."""
    if data[:4] != MAGIC:
        raise ValueError("not an Avro object container file")
    pos = 4
    meta: dict[str, bytes] = {}
    while True:
        n, pos = _dec_long(data, pos)
        if n == 0:
            break
        if n < 0:  # negative count form: count then byte size
            n = -n
            _, pos = _dec_long(data, pos)
        for _ in range(n):
            klen, pos = _dec_long(data, pos)
            k = data[pos : pos + klen].decode()
            pos += klen
            vlen, pos = _dec_long(data, pos)
            meta[k] = data[pos : pos + vlen]
            pos += vlen
    sync = data[pos : pos + 16]
    pos += 16
    schema = json.loads(meta["avro.schema"].decode())
    codec = meta.get("avro.codec", b"null").decode()
    if schema.get("type") != "record":
        raise ValueError("only flat record schemas are supported")

    fields = []  # (name, base_type, nullable, logical)
    for f in schema["fields"]:
        t = f["type"]
        nullable = False
        if isinstance(t, list):
            branches = [x for x in t if x != "null"]
            if len(branches) != 1 or len(t) != len(branches) + ("null" in t):
                raise ValueError(f"unsupported union {t}")
            nullable = "null" in t
            t = branches[0]
        logical = None
        if isinstance(t, dict):
            logical = t.get("logicalType")
            t = t["type"]
        fields.append((f["name"], t, nullable, logical))

    out: dict[str, list] = {f[0]: [] for f in fields}
    while pos < len(data):
        count, pos = _dec_long(data, pos)
        size, pos = _dec_long(data, pos)
        block = data[pos : pos + size]
        pos += size
        if data[pos : pos + 16] != sync:
            raise ValueError("sync marker mismatch — corrupt block")
        pos += 16
        if codec == "deflate":
            block = zlib.decompress(block, -15)
        elif codec != "null":
            raise ValueError(f"unsupported codec {codec!r}")
        bpos = 0
        for _ in range(count):
            for name, t, nullable, _log in fields:
                if nullable:
                    branch, bpos = _dec_long(block, bpos)
                    if branch == 0:
                        out[name].append(None)
                        continue
                if t == "boolean":
                    out[name].append(block[bpos] != 0)
                    bpos += 1
                elif t in ("long", "int"):
                    v, bpos = _dec_long(block, bpos)
                    out[name].append(v)
                elif t == "double":
                    out[name].append(struct.unpack_from("<d", block, bpos)[0])
                    bpos += 8
                elif t == "float":
                    out[name].append(struct.unpack_from("<f", block, bpos)[0])
                    bpos += 4
                elif t == "string":
                    n, bpos = _dec_long(block, bpos)
                    out[name].append(block[bpos : bpos + n].decode("utf-8"))
                    bpos += n
                elif t == "bytes":
                    n, bpos = _dec_long(block, bpos)
                    out[name].append(block[bpos : bpos + n])
                    bpos += n
                else:
                    raise ValueError(f"unsupported Avro type {t!r}")

    arrays = {}
    for name, t, _nullable, logical in fields:
        if columns is not None and name not in columns:
            continue
        vals = out[name]
        if logical == "timestamp-micros":
            arrays[name] = pa.array(vals, pa.int64()).cast(pa.timestamp("us"))
        elif t in ("long", "int"):
            arrays[name] = pa.array(vals, pa.int64())
        elif t == "double":
            arrays[name] = pa.array(vals, pa.float64())
        elif t == "float":
            arrays[name] = pa.array(
                [None if v is None else float(np.float32(v)) for v in vals],
                pa.float64(),
            )
        elif t == "boolean":
            arrays[name] = pa.array(vals, pa.bool_())
        elif t == "string":
            arrays[name] = pa.array(vals, pa.string())
        else:
            arrays[name] = pa.array(vals, pa.binary())
    names = [f[0] for f in fields if columns is None or f[0] in columns]
    return pa.table({n: arrays[n] for n in names})
