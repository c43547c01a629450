"""Deletion-vector bitmap plumbing: 64-bit RoaringBitmapArray codec, the
Z85 text encoding, and the Delta DV file framing.

No roaring library ships in this environment, so the subset the Delta
bridge needs is implemented directly from the PUBLIC specifications:

- the standard 32-bit Roaring portable serialization
  (github.com/RoaringBitmap/RoaringFormatSpec): cookie 12346
  (no run containers, count follows) or 12347 (run-capable, count and a
  run-flag bitset in the header), per-container (key, cardinality-1)
  descriptors, optional offset table, then ARRAY (sorted uint16 LE),
  BITMAP (8 KiB bitset), and RUN (count + (start, length-1) pairs)
  containers;
- Delta's 64-bit ``RoaringBitmapArray`` "portable" wrapper
  (PROTOCOL.md §Deletion Vectors): 4-byte LE magic ``1681511377``,
  8-byte LE bitmap count, then per 32-bit bucket a 4-byte LE key
  followed by one standard portable bitmap — value ``v`` lives in
  bucket ``v >> 32`` at position ``v & 0xFFFFFFFF``;
- the DV FILE layout (same spec section): a 1-byte format version (1)
  at file start; each vector at its descriptor's ``offset``: 4-byte
  BIG-endian data length, the serialized bitmap, 4-byte BIG-endian
  CRC-32 of the data. Inline vectors (``storageType="i"``) carry the
  serialized bitmap directly as Z85 text;
- Z85 (rfc.zeromq.org/spec/32): 4 bytes -> 5 chars over the 85-glyph
  alphabet, big-endian groups.

The encoder exists so tests can fabricate externally-shaped DVs (and a
future DV-writing DELETE can reuse it); it always emits the no-run
cookie with array/bitmap containers, which every conforming reader —
including this module's decoder — accepts.
"""

from __future__ import annotations

import struct
import zlib

MAGIC = 1681511377
_SERIAL_COOKIE_NO_RUN = 12346
_SERIAL_COOKIE_RUN = 12347
_NO_OFFSET_THRESHOLD = 4

_Z85_ALPHABET = (
    "0123456789abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
)
_Z85_INDEX = {c: i for i, c in enumerate(_Z85_ALPHABET)}


class RoaringError(ValueError):
    pass


# ------------------------------------------------------------------- Z85


def z85_decode(text: str) -> bytes:
    if len(text) % 5:
        raise RoaringError(f"z85 length {len(text)} not a multiple of 5")
    out = bytearray()
    for i in range(0, len(text), 5):
        acc = 0
        for ch in text[i:i + 5]:
            try:
                acc = acc * 85 + _Z85_INDEX[ch]
            except KeyError:
                raise RoaringError(f"invalid z85 glyph {ch!r}") from None
        out += acc.to_bytes(4, "big")
    return bytes(out)


def z85_encode(data: bytes) -> str:
    if len(data) % 4:
        raise RoaringError(f"z85 input {len(data)} not a multiple of 4")
    out = []
    for i in range(0, len(data), 4):
        acc = int.from_bytes(data[i:i + 4], "big")
        chunk = []
        for _ in range(5):
            acc, rem = divmod(acc, 85)
            chunk.append(_Z85_ALPHABET[rem])
        out.extend(reversed(chunk))
    return "".join(out)


# ------------------------------------------------- 32-bit roaring decode


def _decode_rb32(buf: bytes, pos: int) -> tuple[list[int], int]:
    """One standard portable 32-bit RoaringBitmap at ``pos``; returns
    (sorted values, next position)."""
    # unsigned: with >=32769 containers the size in the upper 16 bits
    # would make a signed cookie negative and silently decode an EMPTY
    # bitmap (resurrecting every deleted row) instead of its containers
    (cookie,) = struct.unpack_from("<I", buf, pos)
    if (cookie & 0xFFFF) == _SERIAL_COOKIE_RUN:
        size = ((cookie >> 16) & 0xFFFF) + 1
        pos += 4
        nbytes = (size + 7) // 8
        run_flags = buf[pos:pos + nbytes]
        pos += nbytes
        has_offsets = size >= _NO_OFFSET_THRESHOLD
    elif cookie == _SERIAL_COOKIE_NO_RUN:
        (size,) = struct.unpack_from("<i", buf, pos + 4)
        pos += 8
        run_flags = b"\x00" * ((size + 7) // 8)
        has_offsets = True
    else:
        raise RoaringError(f"unknown roaring cookie {cookie}")

    keys_cards = []
    for i in range(size):
        k, c1 = struct.unpack_from("<HH", buf, pos)
        keys_cards.append((k, c1 + 1))
        pos += 4
    if has_offsets:
        pos += 4 * size  # offset table: sequential read needs no seeks

    values: list[int] = []
    for i, (k, card) in enumerate(keys_cards):
        base = k << 16
        is_run = bool(run_flags[i // 8] & (1 << (i % 8)))
        if is_run:
            (n_runs,) = struct.unpack_from("<H", buf, pos)
            pos += 2
            for _ in range(n_runs):
                start, length1 = struct.unpack_from("<HH", buf, pos)
                pos += 4
                values.extend(range(base + start,
                                    base + start + length1 + 1))
        elif card > 4096:
            words = struct.unpack_from("<1024Q", buf, pos)
            pos += 8192
            for wi, w in enumerate(words):
                while w:
                    b = w & -w
                    values.append(base + (wi << 6) + b.bit_length() - 1)
                    w ^= b
        else:
            vals = struct.unpack_from(f"<{card}H", buf, pos)
            pos += 2 * card
            values.extend(base + v for v in vals)
    return values, pos


def _encode_rb32(values: list[int]) -> bytes:
    """Standard portable form, no-run cookie, array/bitmap containers."""
    by_key: dict[int, list[int]] = {}
    for v in sorted(values):
        by_key.setdefault(v >> 16, []).append(v & 0xFFFF)
    keys = sorted(by_key)
    out = bytearray(struct.pack("<ii", _SERIAL_COOKIE_NO_RUN, len(keys)))
    for k in keys:
        out += struct.pack("<HH", k, len(by_key[k]) - 1)
    # offset table (mandatory with the no-run cookie)
    header_len = len(out) + 4 * len(keys)
    offsets, containers = [], []
    cursor = header_len
    for k in keys:
        vals = by_key[k]
        if len(vals) > 4096:
            words = [0] * 1024
            for v in vals:
                words[v >> 6] |= 1 << (v & 63)
            blob = struct.pack("<1024Q", *words)
        else:
            blob = struct.pack(f"<{len(vals)}H", *vals)
        offsets.append(cursor)
        containers.append(blob)
        cursor += len(blob)
    for off in offsets:
        out += struct.pack("<i", off)
    for blob in containers:
        out += blob
    return bytes(out)


# ------------------------------------------ 64-bit RoaringBitmapArray


def decode_rbm_array(buf: bytes) -> list[int]:
    """Delta's portable 64-bit RoaringBitmapArray -> sorted values."""
    (magic,) = struct.unpack_from("<i", buf, 0)
    if magic != MAGIC:
        raise RoaringError(
            f"bad RoaringBitmapArray magic {magic} (want {MAGIC})"
        )
    (n,) = struct.unpack_from("<q", buf, 4)
    pos, out = 12, []
    for _ in range(n):
        (key,) = struct.unpack_from("<i", buf, pos)
        pos += 4
        vals, pos = _decode_rb32(buf, pos)
        base = key << 32
        out.extend(base + v for v in vals)
    return out


def encode_rbm_array(values: list[int]) -> bytes:
    by_key: dict[int, list[int]] = {}
    for v in sorted(values):
        by_key.setdefault(v >> 32, []).append(v & 0xFFFFFFFF)
    out = bytearray(struct.pack("<iq", MAGIC, len(by_key)))
    for k in sorted(by_key):
        out += struct.pack("<i", k)
        out += _encode_rb32(by_key[k])
    return bytes(out)


# ------------------------------------------------------- DV file framing


def read_dv_segment(buf: bytes, offset: int, size_in_bytes: int) -> bytes:
    """One deletion vector out of a DV file: 4-byte BE length at
    ``offset``, data, 4-byte BE CRC-32 — verified."""
    (length,) = struct.unpack_from(">i", buf, offset)
    if length != size_in_bytes:
        raise RoaringError(
            f"DV length {length} != descriptor sizeInBytes {size_in_bytes}"
        )
    data = buf[offset + 4:offset + 4 + length]
    (crc,) = struct.unpack_from(">I", buf, offset + 4 + length)
    if zlib.crc32(data) & 0xFFFFFFFF != crc:
        raise RoaringError("DV checksum mismatch")
    return data


def write_dv_file(path: str, vectors: list[list[int]]) -> list[tuple[int, int]]:
    """A DV file in the spec layout (version byte + framed vectors);
    returns ``[(offset, sizeInBytes)]`` per vector, for descriptors."""
    out = bytearray(b"\x01")
    spans = []
    for values in vectors:
        data = encode_rbm_array(values)
        spans.append((len(out), len(data)))
        out += struct.pack(">i", len(data))
        out += data
        out += struct.pack(">I", zlib.crc32(data) & 0xFFFFFFFF)
    with open(path, "wb") as fh:
        fh.write(bytes(out))
    return spans


class DvFileWriter:
    """Incremental DV-file writer — the executor-side shape of
    :func:`write_dv_file`: one file per task, one framed vector appended
    per data file, so a task encoding thousands of per-file bitmaps never
    holds more than one bitmap in memory and the driver only ever sees
    the returned ``(offset, sizeInBytes)`` descriptors."""

    def __init__(self, path: str):
        self._fh = open(path, "wb")
        self._fh.write(b"\x01")
        self._pos = 1

    def append(self, values: list[int]) -> tuple[int, int]:
        data = encode_rbm_array(values)
        offset = self._pos
        self._fh.write(struct.pack(">i", len(data)))
        self._fh.write(data)
        self._fh.write(struct.pack(">I", zlib.crc32(data) & 0xFFFFFFFF))
        self._pos += 4 + len(data) + 4
        return offset, len(data)

    def close(self) -> None:
        self._fh.close()
