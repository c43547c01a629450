"""Unit tests for the RoaringBitmapArray codec (monday_etl_spark.roaring).

The DV read path decodes bitmaps OTHER engines wrote, so the decoder must
handle the full RoaringFormatSpec surface — including shapes our own
encoder never produces (run containers, huge container counts)."""

import struct

from monday_etl_spark.roaring import (
    MAGIC,
    decode_rbm_array,
    encode_rbm_array,
)


def test_roundtrip_small():
    vals = [0, 1, 5, 4096, 70000, (1 << 33) + 7]
    assert decode_rbm_array(encode_rbm_array(vals)) == sorted(vals)


def test_roundtrip_dense_container():
    vals = list(range(5000))  # > 4096 forces a bitset container
    assert decode_rbm_array(encode_rbm_array(vals)) == vals


def _run_format_rb32(n_containers: int) -> bytes:
    """Hand-build a RUN-format 32-bit bitmap: ``n_containers`` run
    containers, each holding the single value ``key << 16``."""
    cookie = 12347 | ((n_containers - 1) << 16)  # _SERIAL_COOKIE_RUN
    buf = bytearray(struct.pack("<I", cookie))
    buf += b"\xff" * ((n_containers + 7) // 8)  # every container is a run
    for key in range(n_containers):
        buf += struct.pack("<HH", key, 0)  # cardinality-1 = 0
    if n_containers >= 4:  # offset header present at >= NO_OFFSET_THRESHOLD
        buf += b"\x00" * (4 * n_containers)  # sequential decode skips it
    for _ in range(n_containers):
        buf += struct.pack("<H", 1)        # one run ...
        buf += struct.pack("<HH", 0, 0)    # ... start 0, length-1 = 0
    return bytes(buf)


def test_run_cookie_decodes_unsigned():
    """Regression: with >= 32769 containers the size field in the run
    cookie's upper 16 bits makes a SIGNED int32 read negative — the old
    decoder then silently produced an EMPTY bitmap (resurrecting every
    deleted row) instead of its containers."""
    n = 33000  # (n-1) << 16 sets the sign bit of a signed int32
    arr = struct.pack("<iq", MAGIC, 1) + struct.pack("<i", 0) \
        + _run_format_rb32(n)
    got = decode_rbm_array(arr)
    assert got == [k << 16 for k in range(n)]


def test_run_cookie_small():
    """The same run-format shape at a benign size, as a decode baseline."""
    arr = struct.pack("<iq", MAGIC, 1) + struct.pack("<i", 0) \
        + _run_format_rb32(3)
    assert decode_rbm_array(arr) == [0, 1 << 16, 2 << 16]
