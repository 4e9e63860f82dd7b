"""Minimal pure-Python Avro Object Container File writer/reader.

Implements the subset of the public Apache Avro 1.12 specification
(https://avro.apache.org/docs/1.12.0/specification/) that Iceberg
manifest and manifest-list files use: records, the primitive types,
nullable unions, arrays, maps and fixed. No third-party Avro library
exists in this environment (and pyspark's bundled avro jars are not
exposed as a DataFrame source), so the container format is written by
hand from the spec:

- binary encoding: zigzag-varint int/long, little-endian IEEE
  float/double, length-prefixed bytes/string, union = branch index +
  value, array/map = blocks terminated by a 0 count;
- container: magic ``Obj\\x01``, a file-metadata map carrying
  ``avro.schema`` (JSON) and ``avro.codec``, a random 16-byte sync
  marker, then data blocks of (record count, byte length, payload,
  sync). Codec ``null`` and ``deflate`` (raw zlib) are supported.

The reader decodes with the writer schema only (no schema resolution)
— exactly what an Iceberg reader does with its own manifests, and all
the round-trip tests need. Schemas are plain parsed-JSON dicts in the
Avro schema dialect; extra attributes (``field-id`` etc., which Iceberg
requires on manifest schemas) pass through untouched because the
schema is embedded verbatim.

Reference parity: the reference's tables carry avro manifest lists
written by Iceberg itself (reference README.md:96); this module lets
the export path (iceberg_export.py) produce the same container format.
"""

from __future__ import annotations

import io
import json
import os
import struct
import zlib
from typing import Any, Iterable

MAGIC = b"Obj\x01"


# ---------------------------------------------------------------------------
# binary primitives
# ---------------------------------------------------------------------------

def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _unzigzag(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def write_long(buf: io.BytesIO, n: int) -> None:
    z = _zigzag(n) & 0xFFFFFFFFFFFFFFFF
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            buf.write(bytes((b | 0x80,)))
        else:
            buf.write(bytes((b,)))
            break


def read_long(buf: io.BytesIO) -> int:
    shift = 0
    acc = 0
    while True:
        (b,) = buf.read(1)
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return _unzigzag(acc)


def _write_bytes(buf: io.BytesIO, b: bytes) -> None:
    write_long(buf, len(b))
    buf.write(b)


def _read_bytes(buf: io.BytesIO) -> bytes:
    return buf.read(read_long(buf))


# ---------------------------------------------------------------------------
# schema-driven encode / decode
# ---------------------------------------------------------------------------

def _branch_matches(sch, value) -> bool:
    """Loose union-branch match: None only matches "null"; everything
    else takes the first non-null branch (Iceberg unions are always
    ["null", X], so this is exact for our use)."""
    t = sch["type"] if isinstance(sch, dict) else sch
    return (value is None) == (t == "null")


def encode(buf: io.BytesIO, schema: Any, value: Any) -> None:
    if isinstance(schema, list):  # union
        for i, branch in enumerate(schema):
            if _branch_matches(branch, value):
                write_long(buf, i)
                encode(buf, branch, value)
                return
        raise ValueError(f"no union branch for {value!r} in {schema}")
    t = schema["type"] if isinstance(schema, dict) else schema
    if t == "null":
        return
    if t == "boolean":
        buf.write(b"\x01" if value else b"\x00")
    elif t in ("int", "long"):
        write_long(buf, int(value))
    elif t == "float":
        buf.write(struct.pack("<f", float(value)))
    elif t == "double":
        buf.write(struct.pack("<d", float(value)))
    elif t == "bytes":
        _write_bytes(buf, bytes(value))
    elif t == "string":
        _write_bytes(buf, value.encode("utf-8"))
    elif t == "fixed":
        b = bytes(value)
        if len(b) != schema["size"]:
            raise ValueError(f"fixed size {schema['size']} != {len(b)}")
        buf.write(b)
    elif t == "record":
        for f in schema["fields"]:
            if isinstance(f["type"], list) and "null" in [
                b if isinstance(b, str) else b.get("type") for b in f["type"]
            ]:
                # nullable field: a missing key encodes as null, so
                # entries read from manifests written BEFORE a field was
                # added (e.g. bounds) re-encode cleanly under the
                # current schema
                encode(buf, f["type"], value.get(f["name"]))
            else:
                encode(buf, f["type"], value[f["name"]])
    elif t == "array":
        items = list(value)
        if items:
            write_long(buf, len(items))
            for it in items:
                encode(buf, schema["items"], it)
        write_long(buf, 0)
    elif t == "map":
        entries = dict(value)
        if entries:
            write_long(buf, len(entries))
            for k, v in entries.items():
                _write_bytes(buf, str(k).encode("utf-8"))
                encode(buf, schema["values"], v)
        write_long(buf, 0)
    else:
        raise ValueError(f"unsupported avro type {t!r}")


def decode(buf: io.BytesIO, schema: Any) -> Any:
    if isinstance(schema, list):  # union
        return decode(buf, schema[read_long(buf)])
    t = schema["type"] if isinstance(schema, dict) else schema
    if t == "null":
        return None
    if t == "boolean":
        return buf.read(1) == b"\x01"
    if t in ("int", "long"):
        return read_long(buf)
    if t == "float":
        return struct.unpack("<f", buf.read(4))[0]
    if t == "double":
        return struct.unpack("<d", buf.read(8))[0]
    if t == "bytes":
        return _read_bytes(buf)
    if t == "string":
        return _read_bytes(buf).decode("utf-8")
    if t == "fixed":
        return buf.read(schema["size"])
    if t == "record":
        return {f["name"]: decode(buf, f["type"]) for f in schema["fields"]}
    if t == "array":
        out = []
        while True:
            n = read_long(buf)
            if n == 0:
                break
            if n < 0:  # block with byte size prefix
                read_long(buf)
                n = -n
            out.extend(decode(buf, schema["items"]) for _ in range(n))
        return out
    if t == "map":
        out = {}
        while True:
            n = read_long(buf)
            if n == 0:
                break
            if n < 0:
                read_long(buf)
                n = -n
            for _ in range(n):
                k = _read_bytes(buf).decode("utf-8")
                out[k] = decode(buf, schema["values"])
        return out
    raise ValueError(f"unsupported avro type {t!r}")


# ---------------------------------------------------------------------------
# container file
# ---------------------------------------------------------------------------

def write_ocf(
    schema: dict,
    records: Iterable[dict],
    *,
    codec: str = "deflate",
    metadata: dict[str, str] | None = None,
    sync: bytes | None = None,
) -> bytes:
    """Serialize records into one Avro OCF byte string (single block —
    manifests are small; Iceberg writes multi-MB manifests the same
    way). ``metadata`` adds extra file-metadata keys (Iceberg stamps
    ``schema``/``partition-spec``/``format-version`` etc.)."""
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported codec {codec!r}")
    sync = sync or os.urandom(16)
    out = io.BytesIO()
    out.write(MAGIC)
    meta = {
        "avro.schema": json.dumps(schema),
        "avro.codec": codec,
        **(metadata or {}),
    }
    write_long(out, len(meta))
    for k, v in meta.items():
        _write_bytes(out, k.encode("utf-8"))
        _write_bytes(out, v.encode("utf-8"))
    write_long(out, 0)
    out.write(sync)

    payload = io.BytesIO()
    n = 0
    for rec in records:
        encode(payload, schema, rec)
        n += 1
    raw = payload.getvalue()
    if codec == "deflate":  # avro deflate = raw DEFLATE, no zlib header
        co = zlib.compressobj(9, zlib.DEFLATED, -15)
        raw = co.compress(raw) + co.flush()
    write_long(out, n)
    write_long(out, len(raw))
    out.write(raw)
    out.write(sync)
    return out.getvalue()


def read_ocf(data: bytes) -> tuple[dict, dict[str, str], list[dict]]:
    """Parse an Avro OCF: returns (schema, file_metadata, records)."""
    buf = io.BytesIO(data)
    if buf.read(4) != MAGIC:
        raise ValueError("not an Avro object container file")
    meta: dict[str, str] = {}
    while True:
        n = read_long(buf)
        if n == 0:
            break
        if n < 0:
            read_long(buf)
            n = -n
        for _ in range(n):
            k = _read_bytes(buf).decode("utf-8")
            meta[k] = _read_bytes(buf).decode("utf-8")
    sync = buf.read(16)
    schema = json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", "null")
    records: list[dict] = []
    while True:
        head = buf.read(1)
        if not head:
            break
        buf.seek(-1, io.SEEK_CUR)
        n = read_long(buf)
        size = read_long(buf)
        block = buf.read(size)
        if codec == "deflate":
            block = zlib.decompress(block, -15)
        elif codec != "null":
            raise ValueError(f"unsupported codec {codec!r}")
        bbuf = io.BytesIO(block)
        records.extend(decode(bbuf, schema) for _ in range(n))
        if buf.read(16) != sync:
            raise ValueError("sync marker mismatch")
    return schema, meta, records
