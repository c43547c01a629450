"""Minimal Avro Object Container File writer/reader (Avro 1.12 spec).

No Avro library ships in this environment, but the Iceberg table spec
requires manifests and manifest lists to be Avro OCF — so the subset the
Iceberg bridge needs is implemented directly from the PUBLIC Avro
specification (avro.apache.org/docs/1.12.0/specification/):

- container format: ``Obj\\x01`` magic, file-metadata map (schema JSON +
  codec), 16-byte sync marker, then blocks of ``(count, byte-length,
  payload, sync)``;
- binary encoding: zig-zag varint ints/longs, length-prefixed UTF-8
  strings / bytes, records as field concatenation, unions as a branch
  index + value, arrays/maps as blocked sequences terminated by 0;
- codec: ``null`` (uncompressed) — every Avro reader must support it.

Supported schema subset (everything Iceberg metadata files use): record,
string, bytes, int, long, boolean, float, double, nullable unions
``["null", T]``, arrays of records, and maps. Schemas are passed as the
standard JSON dicts, so attributes Iceberg requires (``field-id``,
element/key/value ids) travel verbatim into the file metadata.

This is general Avro plumbing, not Iceberg-specific: the Iceberg bridge
layers its schemas on top (see ``iceberg_export``).
"""

from __future__ import annotations

import io
import json
import os
import struct

_MAGIC = b"Obj\x01"


# ----------------------------------------------------------- binary encode


def _zigzag(n: int) -> bytes:
    n = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _enc_bytes(v: bytes) -> bytes:
    return _zigzag(len(v)) + v


def _enc_str(v: str) -> bytes:
    return _enc_bytes(v.encode("utf-8"))


def encode(schema, value) -> bytes:
    """Binary-encode ``value`` against ``schema`` (JSON-dict form)."""
    if isinstance(schema, str):
        t = schema
    elif isinstance(schema, list):  # union: pick the matching branch
        if value is None:
            idx = schema.index("null")
            return _zigzag(idx)
        idx = next(i for i, s in enumerate(schema) if s != "null")
        return _zigzag(idx) + encode(schema[idx], value)
    else:
        t = schema["type"]

    if t == "null":
        return b""
    if t == "boolean":
        return b"\x01" if value else b"\x00"
    if t in ("int", "long"):
        return _zigzag(int(value))
    if t == "float":
        return struct.pack("<f", float(value))
    if t == "double":
        return struct.pack("<d", float(value))
    if t == "string":
        return _enc_str(value)
    if t == "bytes":
        return _enc_bytes(bytes(value))
    if t == "record":
        out = bytearray()
        for f in schema["fields"]:
            try:
                out += encode(f["type"], value.get(f["name"]))
            except StopIteration:
                raise ValueError(
                    f"field {f['name']!r}: no union branch for "
                    f"{value.get(f['name'])!r}"
                ) from None
        return bytes(out)
    if t == "array":
        items = list(value or [])
        if not items:
            return _zigzag(0)
        out = bytearray(_zigzag(len(items)))
        for it in items:
            out += encode(schema["items"], it)
        out += _zigzag(0)
        return bytes(out)
    if t == "map":
        entries = dict(value or {})
        if not entries:
            return _zigzag(0)
        out = bytearray(_zigzag(len(entries)))
        for k, v in entries.items():
            out += _enc_str(k) + encode(schema["values"], v)
        out += _zigzag(0)
        return bytes(out)
    raise NotImplementedError(f"avro type {t!r}")


# ----------------------------------------------------------- binary decode


class _Reader:
    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def read(self, n: int) -> bytes:
        out = self.buf[self.pos:self.pos + n]
        if len(out) != n:
            raise EOFError("truncated avro data")
        self.pos += n
        return out

    def varint(self) -> int:
        shift, acc = 0, 0
        while True:
            b = self.read(1)[0]
            acc |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
        return (acc >> 1) ^ -(acc & 1)  # un-zigzag

    def decode(self, schema):
        if isinstance(schema, str):
            t = schema
        elif isinstance(schema, list):
            idx = self.varint()
            return self.decode(schema[idx])
        else:
            t = schema["type"]

        if t == "null":
            return None
        if t == "boolean":
            return self.read(1) == b"\x01"
        if t in ("int", "long"):
            return self.varint()
        if t == "float":
            return struct.unpack("<f", self.read(4))[0]
        if t == "double":
            return struct.unpack("<d", self.read(8))[0]
        if t == "string":
            return self.read(self.varint()).decode("utf-8")
        if t == "bytes":
            return self.read(self.varint())
        if t == "record":
            return {f["name"]: self.decode(f["type"])
                    for f in schema["fields"]}
        if t in ("array", "map"):
            out = [] if t == "array" else {}
            while True:
                n = self.varint()
                if n == 0:
                    break
                if n < 0:  # size-prefixed block: skip the byte length
                    n = -n
                    self.varint()
                for _ in range(n):
                    if t == "array":
                        out.append(self.decode(schema["items"]))
                    else:
                        k = self.read(self.varint()).decode("utf-8")
                        out[k] = self.decode(schema["values"])
            return out
        raise NotImplementedError(f"avro type {t!r}")


# --------------------------------------------------------------- container


_META_SCHEMA = {"type": "map", "values": "bytes"}


def write_ocf(path: str, schema: dict, records: list[dict],
              metadata: dict[str, str] | None = None,
              sync: bytes | None = None) -> str:
    """Write an Avro Object Container File (codec ``null``). ``metadata``
    adds extra file-metadata keys (Iceberg stamps ``schema``,
    ``partition-spec`` etc. there). Returns ``path``."""
    sync = sync or os.urandom(16)
    meta = {"avro.schema": json.dumps(schema).encode(),
            "avro.codec": b"null"}
    for k, v in (metadata or {}).items():
        meta[k] = v.encode() if isinstance(v, str) else v
    payload = b"".join(encode(schema, r) for r in records)
    with open(path, "wb") as fh:
        fh.write(_MAGIC)
        fh.write(encode(_META_SCHEMA, meta))
        fh.write(sync)
        if records:
            fh.write(_zigzag(len(records)) + _zigzag(len(payload)))
            fh.write(payload)
            fh.write(sync)
    return path


def read_ocf(path: str) -> tuple[dict, dict[str, bytes], list[dict]]:
    """Read an OCF written with codec ``null``: returns
    ``(schema, file_metadata, records)``."""
    with open(path, "rb") as fh:
        buf = fh.read()
    if buf[:4] != _MAGIC:
        raise ValueError(f"{path}: not an Avro object container file")
    r = _Reader(buf)
    r.pos = 4
    meta = r.decode(_META_SCHEMA)
    codec = meta.get("avro.codec", b"null")
    if codec != b"null":
        raise NotImplementedError(f"avro codec {codec!r}")
    schema = json.loads(meta["avro.schema"])
    sync = r.read(16)
    records: list[dict] = []
    while r.pos < len(buf):
        n = r.varint()
        r.varint()  # block byte length (codec null: payload follows)
        for _ in range(n):
            records.append(r.decode(schema))
        if r.read(16) != sync:
            raise ValueError(f"{path}: sync marker mismatch")
    return schema, meta, records
