"""Pure-Python Apache Avro Object Container File (OCF) codec.

Avro is the one mainstream interchange format whose Spark DataSource
(`spark-avro`, an external jar) this environment cannot fetch — the
attempt and its network failure are documented in README. Rather than
leave the format absent, the engine ships its own OCF codec behind the
same seam as the BMP/WAV/PNG/GIF codecs (operators/multimodal.py):
REAL bytes per the public Avro 1.11 specification — magic ``Obj\\x01``,
metadata map carrying the JSON schema and codec, 16-byte sync marker,
zigzag-varint binary encoding, raw-deflate block compression — that
any conformant Avro implementation can read, produced and consumed
through distributed Arrow stages (``mapInPandas``), never a
driver-side loop.

Scope: the record subset the corpus needs — ``long``, ``int``,
``double``, ``string``, ``boolean``, timestamp-micros (logical type on
``long``), and 2-branch ``["null", T]`` unions. ``null`` and
``deflate`` codecs. Malformed containers (bad magic, truncated block,
sync-marker mismatch, unknown codec) raise ``ValueError`` — the
reject-bad-container contract every codec in the engine follows.

Reference parity note: the reference engine (core.clj) has no Avro
surface; this module exists for the format-matrix completeness the
corpus demands (SURVEY §2.10 multi-format sources).
"""

from __future__ import annotations

import hashlib
import json
import struct
import zlib

MAGIC = b"Obj\x01"

#: types encoded as zigzag varints
_VARINT_TYPES = {"long", "int"}


# ---------------------------------------------------------------- encoding

def zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63) if n >= 0 else (((-n) << 1) - 1)


def unzigzag(u: int) -> int:
    return (u >> 1) ^ -(u & 1)


def write_long(n: int) -> bytes:
    u = zigzag(n)
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def write_string(s: str) -> bytes:
    raw = s.encode("utf-8")
    return write_long(len(raw)) + raw


def write_bytes(b: bytes) -> bytes:
    return write_long(len(b)) + b


def read_long(buf: bytes, pos: int) -> tuple[int, int]:
    u = shift = 0
    while True:
        if pos >= len(buf):
            raise ValueError("avro: truncated varint")
        byte = buf[pos]
        pos += 1
        u |= (byte & 0x7F) << shift
        if not byte & 0x80:
            return unzigzag(u), pos
        shift += 7
        if shift > 70:
            raise ValueError("avro: varint too long")


def read_string(buf: bytes, pos: int) -> tuple[str, int]:
    n, pos = read_long(buf, pos)
    if n < 0 or pos + n > len(buf):
        raise ValueError("avro: truncated string")
    return buf[pos : pos + n].decode("utf-8"), pos + n


def read_bytes(buf: bytes, pos: int) -> tuple[bytes, int]:
    n, pos = read_long(buf, pos)
    if n < 0 or pos + n > len(buf):
        raise ValueError("avro: truncated bytes")
    return buf[pos : pos + n], pos + n


# ---------------------------------------------------------------- schema

def record_schema(name: str, fields: list[tuple[str, object]]) -> str:
    """JSON record schema. A field type is an Avro type string
    (``"long"``, ``"string"``, …), ``"timestamp-micros"`` (sugar for
    the logical type on long), or a list for a union
    (``["null", "double"]``)."""

    def ftype(t: object) -> object:
        if t == "timestamp-micros":
            return {"type": "long", "logicalType": "timestamp-micros"}
        return t

    return json.dumps(
        {
            "type": "record",
            "name": name,
            "fields": [{"name": n, "type": ftype(t)} for n, t in fields],
        },
        sort_keys=True,
    )


def _norm_type(t: object) -> object:
    """Collapse a parsed schema field type to the encoder's handle:
    logical timestamp-micros → ``"timestamp-micros"``; keep unions as
    lists and primitives as strings."""
    if isinstance(t, dict):
        if t.get("logicalType") == "timestamp-micros":
            return "timestamp-micros"
        return t.get("type")
    return t


def parse_schema(schema_json: str) -> list[tuple[str, object]]:
    s = json.loads(schema_json)
    if not isinstance(s, dict) or s.get("type") != "record":
        raise ValueError("avro: only record schemas supported")
    out = []
    for f in s["fields"]:
        t = _norm_type(f["type"])
        if isinstance(t, list):
            t = [_norm_type(b) for b in t]
            if len(t) != 2 or t[0] != "null":
                raise ValueError(f"avro: unsupported union {t}")
        elif t not in (
            "long",
            "int",
            "double",
            "string",
            "boolean",
            "timestamp-micros",
        ):
            raise ValueError(f"avro: unsupported type {t!r}")
        out.append((f["name"], t))
    return out


# ---------------------------------------------------------------- values

def _encode_value(t: object, v: object, out: bytearray) -> None:
    if isinstance(t, list):  # ["null", T]
        if v is None:
            out += write_long(0)
            return
        out += write_long(1)
        t = t[1]
    if v is None:
        raise ValueError("avro: null value for non-nullable field")
    if t in _VARINT_TYPES or t == "timestamp-micros":
        out += write_long(int(v))
    elif t == "double":
        out += struct.pack("<d", float(v))
    elif t == "string":
        out += write_string(str(v))
    elif t == "boolean":
        out.append(1 if v else 0)
    else:  # pragma: no cover - parse_schema rejects these first
        raise ValueError(f"avro: unsupported type {t!r}")


def _decode_value(t: object, buf: bytes, pos: int) -> tuple[object, int]:
    if isinstance(t, list):
        branch, pos = read_long(buf, pos)
        if branch == 0:
            return None, pos
        if branch != 1:
            raise ValueError(f"avro: union branch {branch} out of range")
        t = t[1]
    if t in _VARINT_TYPES or t == "timestamp-micros":
        return read_long(buf, pos)
    if t == "double":
        if pos + 8 > len(buf):
            raise ValueError("avro: truncated double")
        return struct.unpack_from("<d", buf, pos)[0], pos + 8
    if t == "string":
        return read_string(buf, pos)
    if t == "boolean":
        if pos >= len(buf):
            raise ValueError("avro: truncated boolean")
        return buf[pos] == 1, pos + 1
    raise ValueError(f"avro: unsupported type {t!r}")


# ---------------------------------------------------------------- container

def _sync_marker(schema_json: str) -> bytes:
    """Deterministic 16-byte sync marker (content-derived, not random —
    every plan in the engine must be replayable bit-for-bit)."""
    return hashlib.md5(b"cassaforte-avro:" + schema_json.encode()).digest()


def ocf_encode(
    schema_json: str,
    rows: list[tuple],
    codec: str = "deflate",
    block_rows: int = 4096,
) -> bytes:
    """Serialize rows (tuples in schema field order) as one Avro OCF."""
    if codec not in ("null", "deflate"):
        raise ValueError(f"avro: unsupported codec {codec!r}")
    fields = parse_schema(schema_json)
    sync = _sync_marker(schema_json)
    out = bytearray(MAGIC)
    meta = {
        "avro.schema": schema_json.encode(),
        "avro.codec": codec.encode(),
    }
    out += write_long(len(meta))
    for k in sorted(meta):
        out += write_string(k)
        out += write_bytes(meta[k])
    out += write_long(0)  # end of metadata map
    out += sync
    for i in range(0, len(rows), block_rows) or [0]:
        block = rows[i : i + block_rows]
        if not block:
            continue
        body = bytearray()
        for row in block:
            for (_, t), v in zip(fields, row):
                _encode_value(t, v, body)
        payload = (
            zlib.compress(bytes(body), 6)[2:-4]  # raw deflate (RFC1951)
            if codec == "deflate"
            else bytes(body)
        )
        out += write_long(len(block))
        out += write_long(len(payload))
        out += payload
        out += sync
    return bytes(out)


def ocf_decode(b: bytes) -> tuple[str, list[tuple]]:
    """Parse an Avro OCF → (schema JSON, rows as tuples in field
    order). Raises ValueError on any malformed container."""
    if b[:4] != MAGIC:
        raise ValueError("avro: bad magic (not an OCF)")
    pos = 4
    meta: dict[str, bytes] = {}
    while True:
        n, pos = read_long(b, pos)
        if n == 0:
            break
        if n < 0:  # block form: abs count then byte size
            n = -n
            _, pos = read_long(b, pos)
        for _ in range(n):
            k, pos = read_string(b, pos)
            v, pos = read_bytes(b, pos)
            meta[k] = v
    if "avro.schema" not in meta:
        raise ValueError("avro: missing avro.schema metadata")
    schema_json = meta["avro.schema"].decode()
    codec = meta.get("avro.codec", b"null").decode()
    if codec not in ("null", "deflate"):
        raise ValueError(f"avro: unsupported codec {codec!r}")
    fields = parse_schema(schema_json)
    if pos + 16 > len(b):
        raise ValueError("avro: truncated header sync marker")
    sync = b[pos : pos + 16]
    pos += 16
    rows: list[tuple] = []
    while pos < len(b):
        count, pos = read_long(b, pos)
        size, pos = read_long(b, pos)
        if count < 0 or size < 0 or pos + size + 16 > len(b):
            raise ValueError("avro: truncated block")
        payload = b[pos : pos + size]
        pos += size
        if b[pos : pos + 16] != sync:
            raise ValueError("avro: sync marker mismatch")
        pos += 16
        body = (
            zlib.decompress(payload, -15) if codec == "deflate" else payload
        )
        bpos = 0
        for _ in range(count):
            row = []
            for _, t in fields:
                v, bpos = _decode_value(t, body, bpos)
                row.append(v)
            rows.append(tuple(row))
        if bpos != len(body):
            raise ValueError("avro: trailing bytes in block body")
    return schema_json, rows
