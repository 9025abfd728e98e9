"""Minimal Avro Object Container File codec (pure Python, from the
public Avro 1.11 spec) — the fallback when the spark-avro module jar is
absent (as in this environment; no fastavro either).

Supports the reference's Avro surface (reference src/connectors/avro.rs:
105-211 read, 393-556 write): records of null/boolean/long/double/
string/bytes, nullable fields as ``["null", T]`` unions, logical types
``timestamp-micros``/``timestamp-millis``/``date``, null codec (no
compression). Complex nested types are out of scope — the reference
itself collapses them to strings.

Scale note: this path is DRIVER-side and single-file, exactly like the
reference's Avro connector (which buffers the whole file). On a real
cluster add the spark-avro package and the engine uses it natively; the
fallback keeps the format usable offline and pins semantics in tests.
"""

from __future__ import annotations

import io
import json
import os
import struct

MAGIC = b"Obj\x01"
SYNC = bytes(range(16))  # deterministic sync marker


# ----------------------------------------------------------- primitives

def _zigzag_encode(n: int) -> bytes:
    z = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag_decode(buf: io.BytesIO) -> int:
    shift, acc = 0, 0
    while True:
        raw = buf.read(1)
        if not raw:
            raise EOFError("Avro buffer underflow while decoding varint")
        b = raw[0]
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1)


def _write_bytes(out: bytearray, b: bytes) -> None:
    out += _zigzag_encode(len(b))
    out += b


def _read_bytes(buf: io.BytesIO) -> bytes:
    n = _zigzag_decode(buf)
    data = buf.read(n)
    if len(data) != n:
        raise EOFError(f"Avro buffer underflow: wanted {n} bytes, got {len(data)}")
    return data


# -------------------------------------------------------------- schema

def spark_schema_to_avro(fields: list[tuple[str, str]], name: str = "row") -> dict:
    """fields: (name, kind) with kind in {long, double, string, bytes,
    boolean, timestamp}. Every field is nullable → union, like the
    reference (avro.rs:408-481)."""
    avro_fields = []
    for fname, kind in fields:
        if kind == "timestamp":
            t: object = {"type": "long", "logicalType": "timestamp-micros"}
        elif kind == "date":
            t = {"type": "int", "logicalType": "date"}
        else:
            t = kind
        avro_fields.append({"name": fname, "type": ["null", t], "default": None})
    return {"type": "record", "name": name, "fields": avro_fields}


def _field_kinds(schema: dict) -> list[tuple[str, str]]:
    kinds = []
    for f in schema["fields"]:
        t = f["type"]
        if isinstance(t, list):  # ["null", T]
            t = next(x for x in t if x != "null")
        if isinstance(t, dict):
            lt = t.get("logicalType", "")
            if lt.startswith("timestamp"):
                kinds.append((f["name"], "timestamp-" + ("micros" if "micros" in lt else "millis")))
                continue
            if lt == "date":
                kinds.append((f["name"], "date"))
                continue
            t = t.get("type", "string")
        kinds.append((f["name"], str(t)))
    return kinds


# --------------------------------------------------------------- write

def write_file(path: str, fields: list[tuple[str, str]], rows) -> int:
    """rows: iterable of tuples aligned with fields. Returns count."""
    import datetime as dt

    schema = spark_schema_to_avro(fields)
    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    n = 0
    with open(path, "wb") as fh:
        fh.write(MAGIC)
        meta = bytearray()
        meta += _zigzag_encode(2)
        _write_bytes(meta, b"avro.schema")
        _write_bytes(meta, json.dumps(schema).encode())
        _write_bytes(meta, b"avro.codec")
        _write_bytes(meta, b"null")
        meta += _zigzag_encode(0)
        fh.write(bytes(meta))
        fh.write(SYNC)

        block = bytearray()
        block_count = 0

        def flush() -> None:
            nonlocal block, block_count
            if not block_count:
                return
            fh.write(_zigzag_encode(block_count))
            fh.write(_zigzag_encode(len(block)))
            fh.write(bytes(block))
            fh.write(SYNC)
            block = bytearray()
            block_count = 0

        for row in rows:
            for (fname, kind), value in zip(fields, row):
                if value is None:
                    block += _zigzag_encode(0)  # union branch: null
                    continue
                block += _zigzag_encode(1)
                if kind == "long":
                    block += _zigzag_encode(int(value))
                elif kind == "double":
                    block += struct.pack("<d", float(value))
                elif kind == "boolean":
                    block.append(1 if value else 0)
                elif kind == "bytes":
                    _write_bytes(block, bytes(value))
                elif kind == "timestamp":
                    if isinstance(value, dt.datetime):
                        # Spark hands the driver NAIVE datetimes in the
                        # session tz (UTC here); a tz-aware value is
                        # normalized to UTC so a non-UTC session zone
                        # can't shift the written instant
                        if value.tzinfo:
                            micros = (
                                value.astimezone(dt.timezone.utc)
                                - dt.datetime(1970, 1, 1, tzinfo=dt.timezone.utc)
                            ) // dt.timedelta(microseconds=1)
                        else:
                            micros = (value - dt.datetime(1970, 1, 1)) // dt.timedelta(
                                microseconds=1
                            )
                    else:
                        micros = int(value)
                    block += _zigzag_encode(micros)
                else:  # string
                    _write_bytes(block, str(value).encode())
            n += 1
            block_count += 1
            if len(block) >= 1 << 20:
                flush()
        flush()
    return n


# ---------------------------------------------------------------- read

def _read_meta(buf: io.BytesIO, path: str) -> dict[bytes, bytes]:
    """Magic check + the OCF header metadata map (shared by the
    header-only and full readers so fixes can't drift apart)."""
    if buf.read(4) != MAGIC:
        raise ValueError(f"{path}: not an Avro object container file")
    meta: dict[bytes, bytes] = {}
    while True:
        count = _zigzag_decode(buf)
        if count == 0:
            break
        for _ in range(abs(count)):
            k = _read_bytes(buf)
            v = _read_bytes(buf)
            meta[k] = v
    return meta


def read_header(path: str) -> list[tuple[str, str]]:
    """Parse just the OCF header and return the field kinds — lets a
    directory reader learn the schema without decoding any data blocks
    (the header is metadata-only and lives in the first few KB)."""
    with open(path, "rb") as fh:
        data = fh.read(1 << 20)  # schema JSON is tiny; 1 MiB is usually ample
        try:
            meta = _read_meta(io.BytesIO(data), path)
        except EOFError:
            # header larger than the 1 MiB probe — fall back to the whole
            # file so an oversized schema/metadata map still parses
            data = data + fh.read()
            meta = _read_meta(io.BytesIO(data), path)
    return _field_kinds(json.loads(meta[b"avro.schema"]))


def read_file(path: str) -> tuple[list[tuple[str, str]], list[tuple]]:
    """Returns (field kinds, rows). Kinds use timestamp-micros/millis
    markers so the caller builds the right Spark types."""
    import datetime as dt

    with open(path, "rb") as fh:
        data = fh.read()
    buf = io.BytesIO(data)
    meta = _read_meta(buf, path)
    codec = meta.get(b"avro.codec", b"null")
    if codec != b"null":
        raise ValueError(f"unsupported Avro codec {codec!r} (null only)")
    schema = json.loads(meta[b"avro.schema"])
    kinds = _field_kinds(schema)
    sync = buf.read(16)
    rows: list[tuple] = []
    epoch = dt.datetime(1970, 1, 1, tzinfo=dt.timezone.utc)
    while buf.tell() < len(data):
        n_rows = _zigzag_decode(buf)
        _ = _zigzag_decode(buf)  # byte length (unused, null codec)
        for _ in range(n_rows):
            vals = []
            for _, kind in kinds:
                branch = _zigzag_decode(buf)
                if branch == 0:
                    vals.append(None)
                    continue
                if kind == "long" or kind == "int":
                    vals.append(_zigzag_decode(buf))
                elif kind == "double":
                    vals.append(struct.unpack("<d", buf.read(8))[0])
                elif kind == "float":
                    vals.append(struct.unpack("<f", buf.read(4))[0])
                elif kind == "boolean":
                    vals.append(buf.read(1)[0] == 1)
                elif kind == "bytes":
                    vals.append(_read_bytes(buf))
                elif kind.startswith("timestamp"):
                    raw = _zigzag_decode(buf)
                    us = raw if kind.endswith("micros") else raw * 1000
                    vals.append(epoch + dt.timedelta(microseconds=us))
                elif kind == "date":
                    vals.append((epoch + dt.timedelta(days=_zigzag_decode(buf))).date())
                else:
                    vals.append(_read_bytes(buf).decode())
            rows.append(tuple(vals))
        marker = buf.read(16)
        if marker != sync:
            raise ValueError(f"{path}: sync marker mismatch (corrupt block)")
    return kinds, rows
