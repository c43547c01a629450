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
- codecs: ``null`` (uncompressed — every Avro reader must support it) and
  ``deflate`` (raw RFC 1951 streams, the Avro-spec required-optional codec;
  iceberg-java's default ``write.avro.compression-codec=gzip`` property
  writes exactly this codec, so external manifests commonly carry it).

Supported schema subset (everything Iceberg metadata files use): record,
string, bytes, fixed, int, long, boolean, float, double, nullable unions
``["null", T]``, arrays of records, maps, and NAMED-TYPE REFERENCES (a
string type naming a record/fixed defined earlier in the same schema —
external writers reuse e.g. a partition-tuple record by name). Schemas
are passed as the standard JSON dicts, so attributes Iceberg requires
(``field-id``, element/key/value ids) travel verbatim into the file
metadata.

This is general Avro plumbing, not Iceberg-specific: the Iceberg bridge
layers its schemas on top (see ``iceberg_export``).
"""

from __future__ import annotations

import io
import json
import os
import struct

_MAGIC = b"Obj\x01"

_PRIMITIVES = {
    "null", "boolean", "int", "long", "float", "double", "string", "bytes",
}


def _collect_names(schema, reg: dict) -> None:
    """Register every named type (record/fixed/enum) defined in ``schema``
    so later string references to the name resolve (Avro spec: a name is a
    valid type once defined)."""
    if isinstance(schema, list):
        for s in schema:
            _collect_names(s, reg)
        return
    if not isinstance(schema, dict):
        return
    t = schema.get("type")
    if t in ("record", "fixed", "enum") and schema.get("name"):
        reg[schema["name"]] = schema
    if t == "record":
        for f in schema.get("fields", []):
            _collect_names(f.get("type"), reg)
    elif t == "array":
        _collect_names(schema.get("items"), reg)
    elif t == "map":
        _collect_names(schema.get("values"), reg)


def _resolve(t: str, names: dict):
    """A string type is a primitive or a reference to a defined name."""
    if t in _PRIMITIVES:
        return t
    if t in names:
        return names[t]
    raise NotImplementedError(f"avro type {t!r}")


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


def encode(schema, value, names: dict | None = None) -> bytes:
    """Binary-encode ``value`` against ``schema`` (JSON-dict form)."""
    if names is None:
        names = {}
        _collect_names(schema, names)
    if isinstance(schema, str):
        if schema not in _PRIMITIVES:
            return encode(_resolve(schema, names), value, names)
        t = schema
    elif isinstance(schema, list):  # union: pick the matching branch
        if value is None:
            idx = schema.index("null")
            return _zigzag(idx)
        idx = next(i for i, s in enumerate(schema) if s != "null")
        return _zigzag(idx) + encode(schema[idx], value, names)
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
    if t == "fixed":
        raw = bytes(value)
        if len(raw) != schema["size"]:
            raise ValueError(
                f"fixed {schema.get('name')!r}: {len(raw)} bytes != "
                f"size {schema['size']}"
            )
        return raw
    if t == "record":
        out = bytearray()
        for f in schema["fields"]:
            try:
                out += encode(f["type"], value.get(f["name"]), names)
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
            out += encode(schema["items"], it, names)
        out += _zigzag(0)
        return bytes(out)
    if t == "map":
        entries = dict(value or {})
        if not entries:
            return _zigzag(0)
        out = bytearray(_zigzag(len(entries)))
        for k, v in entries.items():
            out += _enc_str(k) + encode(schema["values"], v, names)
        out += _zigzag(0)
        return bytes(out)
    raise NotImplementedError(f"avro type {t!r}")


# ----------------------------------------------------------- binary decode


class _Reader:
    def __init__(self, buf: bytes, names: dict | None = None):
        self.buf = buf
        self.pos = 0
        self.names = names or {}

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
            if schema not in _PRIMITIVES:
                return self.decode(_resolve(schema, self.names))
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
        if t == "fixed":
            return self.read(schema["size"])
        if t == "enum":
            return schema["symbols"][self.varint()]
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
              sync: bytes | None = None, codec: str = "null") -> str:
    """Write an Avro Object Container File. ``metadata`` adds extra
    file-metadata keys (Iceberg stamps ``schema``, ``partition-spec`` etc.
    there). ``codec`` is ``null`` or ``deflate``. Returns ``path``."""
    import zlib

    if codec not in ("null", "deflate"):
        raise NotImplementedError(f"avro codec {codec!r}")
    sync = sync or os.urandom(16)
    meta = {"avro.schema": json.dumps(schema).encode(),
            "avro.codec": codec.encode()}
    for k, v in (metadata or {}).items():
        meta[k] = v.encode() if isinstance(v, str) else v
    payload = b"".join(encode(schema, r) for r in records)
    if codec == "deflate":  # raw RFC 1951 stream (no zlib header)
        co = zlib.compressobj(wbits=-15)
        payload = co.compress(payload) + co.flush()
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
    """Read an OCF (codec ``null`` or ``deflate``): returns
    ``(schema, file_metadata, records)``."""
    import zlib

    with open(path, "rb") as fh:
        buf = fh.read()
    if buf[:4] != _MAGIC:
        raise ValueError(f"{path}: not an Avro object container file")
    r = _Reader(buf)
    r.pos = 4
    meta = r.decode(_META_SCHEMA)
    codec = meta.get("avro.codec", b"null")
    if codec not in (b"null", b"deflate"):
        raise NotImplementedError(
            f"avro codec {codec!r} (external writer used a compression "
            "library this environment does not ship; null and deflate are "
            "supported)"
        )
    schema = json.loads(meta["avro.schema"])
    names: dict = {}
    _collect_names(schema, names)
    sync = r.read(16)
    records: list[dict] = []
    while r.pos < len(buf):
        n = r.varint()
        blen = r.varint()
        block = r.read(blen)
        if codec == b"deflate":
            block = zlib.decompress(block, wbits=-15)
        br = _Reader(block, names)
        for _ in range(n):
            records.append(br.decode(schema))
        if br.pos != len(block):
            raise ValueError(f"{path}: trailing bytes in block")
        if r.read(16) != sync:
            raise ValueError(f"{path}: sync marker mismatch")
    return schema, meta, records
