"""DEFLATE/zlib/gzip codec tests: conformance anchored to stdlib zlib in
BOTH directions, wrapper field handling, partial-tree quirks, corruption
behavior, and the fast-path dispatch equivalence."""

from __future__ import annotations

import gzip as _gzip
import io
import random
import zlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from flink_gmall2024_realtime_spark.operators import deflate as D
from flink_gmall2024_realtime_spark.operators.fastpath import fast_decoder

_STRATEGIES = ("stored", "fixed", "dynamic")


def _corpus(seed: int, n: int) -> bytes:
    rng = random.Random(seed)
    kind = seed % 4
    if kind == 0:
        return bytes(rng.randrange(256) for _ in range(n))
    if kind == 1:
        return (b"deflate window copy " * (n // 10 + 1))[:n]
    if kind == 2:
        return bytes(rng.choice(b"ab\n") for _ in range(n))
    return b"\x00" * n


class TestDecoderVsStdlib:
    @settings(max_examples=40, deadline=None)
    @given(st.binary(max_size=4000), st.integers(0, 9))
    def test_inflate_decodes_every_stdlib_level(self, data, level):
        assert D.zlib_decompress(zlib.compress(data, level)) == data
        assert D.inflate(zlib.compress(data, level)[2:-4]) == data

    @settings(max_examples=25, deadline=None)
    @given(st.binary(max_size=3000), st.integers(1, 9))
    def test_gzip_header_fields(self, data, level):
        buf = io.BytesIO()
        with _gzip.GzipFile(
            fileobj=buf, mode="wb", compresslevel=level, filename="fixture.txt"
        ) as f:
            f.write(data)
        assert D.gzip_decompress(buf.getvalue()) == data

    def test_gzip_multi_member_and_padding(self):
        m = _gzip.compress(b"hello ") + _gzip.compress(b"world")
        assert D.gzip_decompress(m) == b"hello world"
        # trailing zero padding: accepted, same as stdlib
        assert D.gzip_decompress(m + b"\x00" * 7) == b"hello world"
        assert _gzip.decompress(m + b"\x00" * 7) == b"hello world"

    def test_gzip_fhcrc_and_fextra(self):
        # hand-build a header with FEXTRA + FNAME + FCOMMENT + FHCRC
        body = zlib.compress(b"payload", 6)[2:-4]
        import struct

        hdr = bytearray(b"\x1f\x8b\x08" + bytes([0x02 | 0x04 | 0x08 | 0x10]))
        hdr += b"\x00\x00\x00\x00\x00\xff"
        hdr += struct.pack("<H", 4) + b"XTRA"  # FEXTRA
        hdr += b"name.txt\x00"  # FNAME
        hdr += b"a comment\x00"  # FCOMMENT
        hdr += struct.pack("<H", zlib.crc32(bytes(hdr)) & 0xFFFF)  # FHCRC
        full = bytes(hdr) + body + struct.pack(
            "<II", zlib.crc32(b"payload"), 7
        )
        assert D.gzip_decompress(full) == b"payload"
        assert _gzip.decompress(full) == b"payload"  # stdlib agrees
        bad = bytearray(full)
        bad[len(hdr) - 1] ^= 0xFF  # corrupt FHCRC
        with pytest.raises(ValueError, match="header CRC16"):
            D.gzip_decompress(bytes(bad))


class TestCompressorVsStdlib:
    @settings(max_examples=40, deadline=None)
    @given(st.binary(max_size=4000), st.sampled_from(_STRATEGIES))
    def test_stdlib_decodes_our_output(self, data, strategy):
        enc = D.deflate_compress(data, strategy)
        assert zlib.decompress(enc, -15) == data
        assert D.inflate(enc) == data  # self round-trip too
        assert zlib.decompress(D.zlib_compress(data, strategy)) == data
        assert _gzip.decompress(D.gzip_compress(data, strategy)) == data

    def test_window_spanning_matches(self):
        # repeats far apart but inside the 32K window; and beyond it
        base = bytes(random.Random(5).randrange(256) for _ in range(400))
        data = base + b"x" * 31000 + base + b"y" * 40000 + base
        for strategy in ("fixed", "dynamic"):
            enc = D.deflate_compress(data, strategy)
            assert zlib.decompress(enc, -15) == data

    def test_compression_actually_happens(self):
        data = (b"the same line over and over\n" * 500)
        assert len(D.deflate_compress(data, "dynamic")) < len(data) // 10

    def test_stored_block_chunking(self):
        data = bytes(random.Random(6).randrange(256) for _ in range(70001))
        enc = D.deflate_compress(data, "stored")
        assert zlib.decompress(enc, -15) == data
        assert D.inflate(enc) == data


class TestCorruption:
    def test_reserved_block_type(self):
        with pytest.raises(ValueError, match="reserved block type"):
            D.inflate(b"\x07\x00")

    def test_stored_len_mismatch(self):
        with pytest.raises(ValueError, match="LEN/NLEN"):
            D.inflate(b"\x01\x05\x00\x00\x00hello")

    def test_zlib_header_checks(self):
        with pytest.raises(ValueError, match="not deflate"):
            D.zlib_decompress(b"\x79\x01" + b"\x00" * 8)
        with pytest.raises(ValueError, match="FCHECK"):
            D.zlib_decompress(b"\x78\x00" + b"\x00" * 8)
        with pytest.raises(ValueError, match="preset dictionary"):
            D.zlib_decompress(bytes([0x78, (0x20 | (31 - (0x78 * 256 + 0x20) % 31))]) + b"\x00" * 8)

    def test_checksum_mismatches(self):
        z = bytearray(zlib.compress(b"payload", 6))
        z[-1] ^= 1
        with pytest.raises(ValueError, match="Adler-32"):
            D.zlib_decompress(bytes(z))
        g = bytearray(_gzip.compress(b"payload"))
        g[-5] ^= 1  # CRC32 field
        with pytest.raises(ValueError, match="CRC-32"):
            D.gzip_decompress(bytes(g))

    def test_bitflips_never_leak_mechanical_errors(self):
        rng = random.Random(9)
        for seed in (0, 1, 2, 3):
            base = D.synth_gzip_dump(seed)
            for _ in range(150):
                b = bytearray(base)
                for _ in range(rng.randrange(1, 4)):
                    b[rng.randrange(len(b))] ^= 1 << rng.randrange(8)
                try:
                    D.gzip_decompress(bytes(b))
                except (ValueError, NotImplementedError):
                    pass


class TestFastPath:
    @settings(max_examples=30, deadline=None)
    @given(st.integers(0, 10_000_000))
    def test_gzip_fast_equals_spec(self, seed):
        payload = D.synth_gzip_dump(seed)
        fast = fast_decoder("gzip", sample_every=1)  # cross-verify EVERY record
        spec = fast_decoder("gzip", spec_only=True)
        assert fast(payload) == spec(payload)

    def test_zlib_family_parity_on_fdict(self):
        # an FDICT stream WITHOUT its dictionary refuses identically
        # through both engines (r12: ValueError — a dict-less FDICT read
        # is caller error, not an unimplemented format)
        payload = bytes([0x78, (0x20 | (31 - (0x78 * 256 + 0x20) % 31))]) + b"\x00" * 8
        for decoder in (fast_decoder("zlib"), fast_decoder("zlib", spec_only=True)):
            with pytest.raises(ValueError):
                decoder(payload)

    def test_zlib_fast_family(self):
        data = b"zlib family payload " * 50
        payload = zlib.compress(data, 7)
        assert fast_decoder("zlib", sample_every=1)(payload) == data


class TestTables:
    def test_rfc_tables_match_known_rows(self):
        # spot anchors from RFC 1951 section 3.2.5
        assert (D._LEN_BASE[0], D._LEN_EXTRA[0]) == (3, 0)  # code 257
        assert (D._LEN_BASE[8], D._LEN_EXTRA[8]) == (11, 1)  # code 265
        assert (D._LEN_BASE[27], D._LEN_EXTRA[27]) == (227, 5)  # code 284
        assert (D._LEN_BASE[28], D._LEN_EXTRA[28]) == (258, 0)  # code 285
        assert (D._DIST_BASE[4], D._DIST_EXTRA[4]) == (5, 1)
        assert (D._DIST_BASE[29], D._DIST_EXTRA[29]) == (24577, 13)
        # full coverage: code 284 tops out at 257, adjacent to code 285's 258
        assert D._LEN_BASE[27] + (1 << D._LEN_EXTRA[27]) - 1 == 258
        assert D._DIST_BASE[29] + (1 << D._DIST_EXTRA[29]) - 1 == 32768


class TestZlibFdict:
    """r12: FDICT preset-dictionary streams (the last zlib wrapper seam)
    — stdlib-anchored both directions (zlib.compressobj writes, we read;
    window seeding via the out-prefix trick, DICTID verified)."""

    def test_roundtrip_all_levels(self):
        import zlib

        from flink_gmall2024_realtime_spark.operators.deflate import (
            zlib_decompress,
        )

        text = b"the quick brown fox jumps over the lazy dog " * 300
        zdict = b"quick brown fox jumps over the lazy dog shared phrases"
        for level in (0, 1, 6, 9):
            co = zlib.compressobj(
                level, zlib.DEFLATED, 15, 8, zlib.Z_DEFAULT_STRATEGY, zdict
            )
            payload = co.compress(text) + co.flush()
            assert zlib_decompress(payload, zdict=zdict) == text

    def test_backrefs_reach_into_seed(self):
        import zlib

        from flink_gmall2024_realtime_spark.operators.deflate import (
            zlib_decompress,
        )

        body = bytes(range(256)) * 120  # 30k, fully dictionary-covered
        co = zlib.compressobj(9, zlib.DEFLATED, 15, 8, zlib.Z_DEFAULT_STRATEGY, body)
        payload = co.compress(body) + co.flush()
        assert len(payload) < len(body) // 50  # provably dict-referenced
        assert zlib_decompress(payload, zdict=body) == body

    def test_fdict_error_paths(self):
        import zlib

        import pytest

        from flink_gmall2024_realtime_spark.operators.deflate import (
            zlib_decompress,
        )

        zdict = b"dictionary bytes"
        co = zlib.compressobj(6, zlib.DEFLATED, 15, 8, zlib.Z_DEFAULT_STRATEGY, zdict)
        payload = co.compress(b"dictionary bytes again") + co.flush()
        with pytest.raises(ValueError, match="preset dictionary"):
            zlib_decompress(payload)
        with pytest.raises(ValueError, match="DICTID"):
            zlib_decompress(payload, zdict=b"some other dictionary")
        with pytest.raises(ValueError, match="no FDICT"):
            zlib_decompress(zlib.compress(b"plain"), zdict=zdict)

    def test_long_dict_truncates_to_window(self):
        import zlib

        from flink_gmall2024_realtime_spark.operators.deflate import (
            zlib_decompress,
        )

        zdict = bytes((i * 7 + 13) % 256 for i in range(50_000))  # > 32 KiB
        co = zlib.compressobj(6, zlib.DEFLATED, 15, 8, zlib.Z_DEFAULT_STRATEGY, zdict)
        body = zdict[-500:] * 3
        payload = co.compress(body) + co.flush()
        assert zlib_decompress(payload, zdict=zdict) == body
