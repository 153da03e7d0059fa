"""Roaring64 portable codec + Z85 (the Delta deletion-vector
serialization) — round-trips, container-type coverage, and the
run-container decode path real Delta writers may emit."""

import struct

import pytest

from kissmetrics_to_database_spark.functions import roaring as rb


def test_roundtrip_array_containers():
    vals = [0, 1, 5, 65535, 65536, 1 << 20, (1 << 33) + 7]
    assert rb.deserialize64(rb.serialize64(vals)) == sorted(vals)


def test_roundtrip_bitmap_container():
    # >4096 values in one 16-bit bucket forces a bitmap container
    vals = list(range(0, 10000, 2))
    assert rb.deserialize64(rb.serialize64(vals)) == vals


def test_roundtrip_dedupes_and_sorts():
    assert rb.deserialize64(rb.serialize64([5, 3, 5, 3])) == [3, 5]


def test_empty():
    assert rb.deserialize64(rb.serialize64([])) == []


def test_decode_run_container():
    # hand-build a 12347-cookie bitmap with one RUN container
    # (values 10..14 and 100): 2 runs
    n = 1
    body = bytearray()
    body += struct.pack("<I", rb.SERIAL_COOKIE | ((n - 1) << 16))
    body += bytes([0b1])  # container 0 is a run
    body += struct.pack("<HH", 0, 6 - 1)  # key 0, cardinality 6
    # n < 4 with runs: no offset header
    body += struct.pack("<H", 2)  # 2 runs
    body += struct.pack("<HH", 10, 4)  # 10..14
    body += struct.pack("<HH", 100, 0)  # 100
    buf = struct.pack("<q", 1) + struct.pack("<I", 0) + bytes(body)
    assert rb.deserialize64(buf) == [10, 11, 12, 13, 14, 100]


def test_bad_cookie_raises():
    buf = struct.pack("<q", 1) + struct.pack("<I", 0) + struct.pack("<I", 99)
    with pytest.raises(ValueError, match="cookie"):
        rb.deserialize64(buf)


def test_z85_roundtrip_and_spec_vector():
    # the Z85 spec's reference vector (rfc.zeromq.org/spec/32)
    assert rb.z85_encode(bytes([0x86, 0x4F, 0xD2, 0x6F, 0xB5, 0x59, 0xF7, 0x5B])) == "HelloWorld"
    assert rb.z85_decode("HelloWorld") == bytes(
        [0x86, 0x4F, 0xD2, 0x6F, 0xB5, 0x59, 0xF7, 0x5B]
    )
    data = bytes(range(16))
    assert rb.z85_decode(rb.z85_encode(data)) == data
    with pytest.raises(ValueError, match="multiple of 4"):
        rb.z85_encode(b"abc")
