"""RoaringBitmapArray codec (Delta deletion-vector bitmaps) — spec
vectors hand-built from RoaringFormatSpec + delta PROTOCOL.md, plus
encode/decode roundtrips across every container-type boundary. No
Roaring library ships in this container, so the structural vectors ARE
the external anchor (byte layouts written out longhand from the spec)."""

from __future__ import annotations

import struct
import zlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from flink_gmall2024_realtime_spark.operators.roaring import (
    build_dv_file,
    parse_dv_in_file,
    parse_roaring_bitmap_array,
    serialize_roaring_bitmap_array,
    z85_decode,
    z85_encode,
)


class TestZ85:
    def test_rfc32_vector(self):
        # the ZeroMQ RFC 32 reference vector
        assert z85_encode(bytes([0x86, 0x4F, 0xD2, 0x6F, 0xB5, 0x59, 0xF7, 0x5B])) == "HelloWorld"
        assert z85_decode("HelloWorld") == bytes(
            [0x86, 0x4F, 0xD2, 0x6F, 0xB5, 0x59, 0xF7, 0x5B]
        )

    def test_uuid_is_20_chars(self):
        import uuid

        u = uuid.UUID(int=0x123456789ABCDEF0123456789ABCDEF0)
        enc = z85_encode(u.bytes)
        assert len(enc) == 20
        assert z85_decode(enc) == u.bytes

    def test_bad_length_and_chars(self):
        with pytest.raises(ValueError, match="multiple of 4"):
            z85_encode(b"abc")
        with pytest.raises(ValueError, match="multiple of 5"):
            z85_decode("abcd")
        with pytest.raises(ValueError, match="invalid z85"):
            z85_decode('abcd"')


def _array_bitmap_bytes(key_vals: dict[int, list[int]]) -> bytes:
    """Hand-build a no-run-cookie bitmap: the spec layout longhand."""
    keys = sorted(key_vals)
    out = struct.pack("<II", 12346, len(keys))
    out += b"".join(struct.pack("<HH", k, len(key_vals[k]) - 1) for k in keys)
    at = len(out) + 4 * len(keys)
    offs = []
    for k in keys:
        offs.append(at)
        at += 2 * len(key_vals[k])
    out += struct.pack(f"<{len(keys)}I", *offs)
    for k in keys:
        out += struct.pack(f"<{len(key_vals[k])}H", *sorted(key_vals[k]))
    return out


class TestBitmapArray:
    def test_hand_built_array_containers(self):
        bm = _array_bitmap_bytes({0: [1, 5, 7], 3: [0, 65535]})
        blob = struct.pack("<iq", 1681511377, 1) + struct.pack("<i", 0) + bm
        assert parse_roaring_bitmap_array(blob) == [
            1, 5, 7, (3 << 16), (3 << 16) + 65535,
        ]

    def test_hand_built_run_container(self):
        # cookie 12347, ONE container, run flag set, no offset header
        # (size < 4): values 10..14 and 100
        bm = struct.pack("<I", ((1 - 1) << 16) | 12347)
        bm += bytes([0b1])  # run flag bitset, container 0 is a run
        bm += struct.pack("<HH", 0, 6 - 1)  # key 0, cardinality 6
        bm += struct.pack("<H", 2)  # two runs
        bm += struct.pack("<HH", 10, 4)  # 10..14
        bm += struct.pack("<HH", 100, 0)  # 100
        blob = struct.pack("<iq", 1681511377, 1) + struct.pack("<i", 2) + bm
        base = 2 << 32
        assert parse_roaring_bitmap_array(blob) == [
            base + v for v in [10, 11, 12, 13, 14, 100]
        ]

    def test_bitset_container_roundtrip(self):
        vals = list(range(0, 10000, 2))  # 5000 > 4096 -> bitset container
        blob = serialize_roaring_bitmap_array(vals)
        assert parse_roaring_bitmap_array(blob) == vals

    def test_multi_key_blocks(self):
        vals = [3, (1 << 32) + 1, (1 << 32) + 2, (5 << 32) + 123456789]
        blob = serialize_roaring_bitmap_array(vals)
        assert parse_roaring_bitmap_array(blob) == vals

    def test_bad_magic_and_truncation(self):
        with pytest.raises(ValueError, match="bad magic"):
            parse_roaring_bitmap_array(struct.pack("<iq", 99, 0))
        good = serialize_roaring_bitmap_array([1, 2, 3])
        with pytest.raises(ValueError):
            parse_roaring_bitmap_array(good[:-3])
        with pytest.raises(ValueError, match="trailing"):
            parse_roaring_bitmap_array(good + b"\x00")

    @settings(max_examples=60, deadline=None)
    @given(
        st.sets(
            st.one_of(
                st.integers(0, 1 << 20),
                st.integers((1 << 32) - 100, (1 << 32) + 100),
                st.integers(4090, 4100),
            ),
            max_size=300,
        )
    )
    def test_roundtrip(self, vals):
        assert parse_roaring_bitmap_array(
            serialize_roaring_bitmap_array(vals)
        ) == sorted(vals)

    @settings(max_examples=20, deadline=None)
    @given(st.integers(0, 2000), st.integers(4000, 4200))
    def test_roundtrip_container_boundary(self, base, n):
        # straddle the 4096 array/bitset cardinality cutoff
        vals = list(range(base, base + n))
        assert parse_roaring_bitmap_array(
            serialize_roaring_bitmap_array(vals)
        ) == vals


class TestDvFraming:
    def test_file_roundtrip_two_dvs(self):
        d1 = serialize_roaring_bitmap_array([0, 2, 4])
        d2 = serialize_roaring_bitmap_array([9])
        blob, offs = build_dv_file([d1, d2])
        assert blob[0] == 1  # format version byte
        assert parse_dv_in_file(blob, offs[0], len(d1)) == [0, 2, 4]
        assert parse_dv_in_file(blob, offs[1], len(d2)) == [9]

    def test_crc_and_size_checks(self):
        d = serialize_roaring_bitmap_array([1])
        blob, offs = build_dv_file([d])
        with pytest.raises(ValueError, match="sizeInBytes"):
            parse_dv_in_file(blob, offs[0], len(d) + 1)
        corrupt = bytearray(blob)
        corrupt[-1] ^= 0xFF  # flip a CRC byte
        with pytest.raises(ValueError, match="checksum"):
            parse_dv_in_file(bytes(corrupt), offs[0], len(d))
        with pytest.raises(ValueError, match="format version"):
            parse_dv_in_file(b"\x02" + blob[1:], offs[0], len(d))

    def test_big_endian_framing_is_spec_true(self):
        # the size word before the data and the CRC after it are BIG
        # endian per PROTOCOL.md (Java DataOutputStream layout)
        d = serialize_roaring_bitmap_array([7])
        blob, offs = build_dv_file([d])
        (size,) = struct.unpack_from(">I", blob, offs[0])
        assert size == len(d)
        (crc,) = struct.unpack_from(">I", blob, offs[0] + 4 + len(d))
        assert crc == zlib.crc32(d) & 0xFFFFFFFF
