"""VP8L (lossless WebP) codec tests: encoder/decoder round-trips through
every variant code path, spec-table sanity, corruption behavior, and the
pixel-sum fixture arithmetic the catalog oracle relies on."""

from __future__ import annotations

import random
import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from flink_gmall2024_realtime_spark.operators import vp8l


def _argb(a, r, g, b):
    return (a << 24) | (r << 16) | (g << 8) | b


def _chunk_body(payload: bytes) -> bytes:
    assert payload[:4] == b"RIFF" and payload[8:12] == b"WEBP"
    assert payload[12:16] == b"VP8L"
    size = struct.unpack("<I", payload[16:20])[0]
    return payload[20 : 20 + size]


def _roundtrip(pix, w, h, variant):
    payload = vp8l.encode_webp_lossless(pix, w, h, variant)
    w2, h2, out = vp8l.decode_vp8l(_chunk_body(payload))
    assert (w2, h2) == (w, h)
    assert out == pix


# deterministic pseudo-random pixels (avoid hypothesis example blowup for
# the full variant x shape sweep)
def _pix(rng, n):
    return [
        _argb(rng.randrange(256), rng.randrange(256), rng.randrange(256), rng.randrange(256))
        for _ in range(n)
    ]


class TestRoundTrip:
    @pytest.mark.parametrize("variant", [0, 1, 2, 3, 4, 6, 7])
    def test_random_pixels_all_generic_variants(self, variant):
        rng = random.Random(100 + variant)
        for _ in range(8):
            w, h = rng.randint(1, 33), rng.randint(1, 17)
            _roundtrip(_pix(rng, w * h), w, h, variant)

    def test_palette_variant(self):
        rng = random.Random(5)
        for ncols in (1, 2, 3, 4, 5, 16):
            cols = _pix(rng, ncols)
            w, h = rng.randint(1, 33), rng.randint(1, 17)
            pix = [cols[rng.randrange(ncols)] for _ in range(w * h)]
            _roundtrip(pix, w, h, 5)

    def test_palette_variant_rejects_too_many_colors(self):
        rng = random.Random(6)
        pix = _pix(rng, 40)  # 40 distinct colors almost surely
        with pytest.raises(ValueError, match="16 distinct"):
            vp8l.encode_vp8l(pix, 8, 5, 5)

    def test_lz77_repeated_rows_use_backrefs(self):
        # identical rows compress: the stream must be much smaller than
        # literal encoding AND still round-trip (covers the short 2D
        # distance code (0,1) and the plain dist+120 code alternation)
        rng = random.Random(7)
        w, h = 31, 16
        row = _pix(rng, w)
        pix = row * h
        lz = vp8l.encode_webp_lossless(pix, w, h, 1)
        lit = vp8l.encode_webp_lossless(pix, w, h, 0)
        assert len(lz) < len(lit) / 2
        _roundtrip(pix, w, h, 1)

    def test_long_backref_chunking(self):
        # > 4096 identical pixels force multiple max-length copies
        w, h = 64, 80
        pix = [_argb(255, 1, 2, 3)] * (w * h)
        _roundtrip(pix, w, h, 1)

    def test_cache_hits_shrink_stream(self):
        # 16 distinct colors tiled: after the first row every pixel is a
        # cache hit (1 symbol) vs 4 literal symbols in the plain variant
        rng = random.Random(12)
        cols = _pix(rng, 16)
        w, h = 32, 16
        pix = [cols[x % 16] for _ in range(h) for x in range(w)]
        cached = vp8l.encode_webp_lossless(pix, w, h, 2)
        _roundtrip(pix, w, h, 2)
        assert len(cached) < len(vp8l.encode_webp_lossless(pix, w, h, 0))

    def test_single_pixel_and_single_row(self):
        for variant in range(8):
            _roundtrip([_argb(255, 9, 8, 7)], 1, 1, variant)
        rng = random.Random(8)
        row = _pix(rng, 19)
        for variant in (0, 1, 2, 3, 4, 6, 7):
            _roundtrip(row, 19, 1, variant)

    @settings(max_examples=30, deadline=None)
    @given(st.integers(0, 10_000_000), st.integers(0, 7))
    def test_hypothesis_fixture_roundtrip(self, seed, variant):
        # the synth fixture itself (variant from seed) plus an explicit
        # variant override on the same pixels
        payload = vp8l.synth_webp_lossless(seed)
        w, h, npx, ssum = vp8l.decode_webp_pixels(payload)
        assert (w, h) == (seed % 29 + 5, seed % 13 + 3)
        exp = 0
        for i in range(4):
            cnt = h * ((w + 3 - i) // 4)
            exp += cnt * (
                255
                + (seed * 7 + i * 31) % 256
                + (seed * 11 + i * 57) % 256
                + (seed * 13 + i * 97) % 256
            )
        assert ssum == exp
        assert npx == 4 * w * h

    @settings(max_examples=25, deadline=None)
    @given(
        st.integers(1, 24),
        st.integers(1, 12),
        st.integers(0, 2**32 - 1),
        st.sampled_from([0, 1, 2, 3, 4, 6, 7]),
    )
    def test_hypothesis_random_roundtrip(self, w, h, seed, variant):
        rng = random.Random(seed)
        _roundtrip(_pix(rng, w * h), w, h, variant)


class TestSpecTables:
    def test_distance_map_shape(self):
        # 120 unique entries, x in [-7, 8], y in [0, 7], first entries match
        # the spec's (0,1),(1,0),(1,1),(-1,1),(0,2),(2,0) prefix, and every
        # mapped offset points strictly backwards in scan order
        assert len(vp8l.DISTANCE_MAP) == 120
        assert len(set(vp8l.DISTANCE_MAP)) == 120
        decoded = [(8 - (b & 0xF), b >> 4) for b in vp8l.DISTANCE_MAP]
        assert decoded[:6] == [(0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0)]
        for x, y in decoded:
            assert -7 <= x <= 8 and 0 <= y <= 7
            assert y > 0 or x > 0  # never (<=0, 0): must reference the past

    def test_prefix_value_scheme_inverse(self):
        br_bits = []
        for v in list(range(1, 200)) + [4096, 1048576]:
            code, extra, nbits = vp8l._prefix_value_encode(v)
            bw = vp8l._BitWriter()
            bw.write(extra, nbits)
            br = vp8l._BitReader(bw.getvalue() or b"\x00")
            assert vp8l._prefix_value_decode(br, code) == v

    def test_canonical_code_kraft_enforced(self):
        with pytest.raises(ValueError, match="prefix code"):
            vp8l._PrefixCode([1, 1, 1])  # oversubscribed
        with pytest.raises(ValueError, match="prefix code"):
            vp8l._PrefixCode([2, 2, 2])  # incomplete
        pc = vp8l._PrefixCode([1, 1])
        assert pc.single is None
        one = vp8l._PrefixCode([0, 5, 0])  # single symbol: 0-bit code
        assert one.single == 1


class TestCorruption:
    def test_bad_signature(self):
        with pytest.raises(ValueError, match="signature"):
            vp8l.decode_vp8l(b"\x30\x00\x00\x00\x00")

    def test_truncation_raises_valueerror(self):
        payload = _chunk_body(vp8l.synth_webp_lossless(11))
        for cut in range(1, len(payload)):
            with pytest.raises((ValueError, NotImplementedError)):
                vp8l.decode_vp8l(payload[:cut])

    def test_bitflips_never_leak_mechanical_errors(self):
        rng = random.Random(13)
        base = vp8l.synth_webp_lossless(23)
        for _ in range(300):
            b = bytearray(base)
            for _ in range(rng.randrange(1, 5)):
                b[rng.randrange(len(b))] ^= 1 << rng.randrange(8)
            try:
                vp8l.decode_webp_pixels(bytes(b))
            except (ValueError, NotImplementedError):
                pass

    def test_lossy_vp8_is_loud_seam(self):
        from flink_gmall2024_realtime_spark.operators.multimodal import synth_webp

        # seed % 3 == 0 -> simple lossy VP8 container
        with pytest.raises(NotImplementedError, match="VP8L decodes in-repo|vendored"):
            vp8l.decode_webp_pixels(synth_webp(3))

    def test_backref_before_start_raises(self):
        # hand-build: literal then a copy with dist 5 > 1 pixel decoded.
        # Easiest via the public encoder then targeted corruption is flaky;
        # instead drive the internal entropy writer directly.
        bw = vp8l._BitWriter()
        # _write_entropy_image writes the cache/meta headers itself
        toks = [("lit", _argb(255, 1, 2, 3)), ("copy", 1, 5 + 120)]
        vp8l._write_entropy_image(bw, [toks], [0, 0], 0, None, False)
        br = vp8l._BitReader(bw.getvalue())
        with pytest.raises(ValueError, match="distance before image start"):
            vp8l._decode_entropy_image(br, 2, 1, False)


class TestTransformUnits:
    def test_subtract_green_forward_inverse(self):
        rng = random.Random(3)
        pix = _pix(rng, 64)
        enc = vp8l._forward_subtract_green(pix)
        dec = list(enc)
        vp8l._apply_inverse_subtract_green(dec)
        assert dec == pix

    def test_predictor_all_modes_forward_inverse(self):
        # force every predictor mode via a mode image with bits=2 over a
        # 16x8 image: block (bx,by) gets mode (bx + 4*by) % 14
        rng = random.Random(4)
        w, h, bits = 16, 8, 2
        mw, mh = 4, 2
        modes = [
            _argb(0, 0, (bx + 4 * by) % 14, 0) for by in range(mh) for bx in range(mw)
        ]
        pix = _pix(rng, w * h)
        res = vp8l._forward_predictor(pix, w, h, modes, bits)
        out = list(res)
        vp8l._apply_inverse_predictor(out, w, h, modes, bits)
        assert out == pix

    def test_color_transform_forward_inverse(self):
        rng = random.Random(5)
        w, h, bits = 16, 8, 2
        ctes = [
            _argb(255, rng.randrange(256), rng.randrange(256), rng.randrange(256))
            for _ in range(4 * 2)
        ]
        pix = _pix(rng, w * h)
        enc = vp8l._forward_color_transform(pix, w, h, ctes, bits)
        out = list(enc)
        vp8l._apply_inverse_color_transform(out, w, h, ctes, bits)
        assert out == pix

    def test_c_division_semantics(self):
        # ClampAddSubtractHalf uses C truncation toward zero
        assert vp8l._c_div2(-3) == -1  # Python -3 // 2 == -2
        assert vp8l._c_div2(3) == 1


# --------------------------------------------------------------------------
# External conformance anchors (ADVICE r11): every other codec family is
# anchored to an in-container real implementation (zlib, zstd CLI, pyarrow);
# VP8L gets the same treatment here, gated on whatever anchor the host
# ships — libwebp CLI tools (cwebp/dwebp) or Pillow with WebP support.
# Skipped cleanly when neither exists (this container ships neither), so the
# suite stays green everywhere while any real deployment gets the check.

import io
import shutil
import subprocess
import tempfile


def _pil_webp():
    try:
        from PIL import Image, features  # noqa: F401

        if features.check("webp"):
            return Image
    except Exception:
        pass
    return None


def _find_vp8l_chunk(payload: bytes) -> bytes:
    """Walk RIFF chunks (handles bare-VP8L and VP8X-extended layouts) and
    return the VP8L chunk body, or raise KeyError."""
    assert payload[:4] == b"RIFF" and payload[8:12] == b"WEBP"
    i = 12
    while i + 8 <= len(payload):
        fourcc = payload[i : i + 4]
        (size,) = struct.unpack("<I", payload[i + 4 : i + 8])
        if fourcc == b"VP8L":
            return payload[i + 8 : i + 8 + size]
        i += 8 + size + (size & 1)
    raise KeyError("no VP8L chunk")


def _parse_pam_rgba(data: bytes) -> tuple[int, int, list[int]]:
    head, _, raster = data.partition(b"ENDHDR\n")
    fields = dict(
        line.split(None, 1)
        for line in head.decode().splitlines()[1:]
        if line and not line.startswith("#")
    )
    w, h, depth = int(fields["WIDTH"]), int(fields["HEIGHT"]), int(fields["DEPTH"])
    assert depth == 4 and fields["TUPLTYPE"] == "RGB_ALPHA"
    pix = [
        _argb(raster[i + 3], raster[i], raster[i + 1], raster[i + 2])
        for i in range(0, w * h * 4, 4)
    ]
    return w, h, pix


class TestExternalConformance:
    """Decode-direction and encode-direction anchors against libwebp."""

    def _fixture_pixels(self, seed, n):
        rng = random.Random(seed)
        return _pix(rng, n)

    @pytest.mark.parametrize("variant", [0, 2, 3, 5, 7])
    def test_our_encoder_under_dwebp(self, variant, tmp_path):
        if shutil.which("dwebp") is None:
            pytest.skip("dwebp not installed")
        rng = random.Random(variant)
        w, h = 19, 11
        if variant == 5:
            cols = self._fixture_pixels(9, 7)
            pix = [cols[rng.randrange(7)] for _ in range(w * h)]
        else:
            pix = self._fixture_pixels(variant, w * h)
        src = tmp_path / "ours.webp"
        src.write_bytes(vp8l.encode_webp_lossless(pix, w, h, variant))
        out = tmp_path / "out.pam"
        subprocess.run(
            ["dwebp", str(src), "-pam", "-o", str(out)],
            check=True, capture_output=True,
        )
        w2, h2, got = _parse_pam_rgba(out.read_bytes())
        assert (w2, h2) == (w, h)
        assert got == pix

    def test_our_decoder_on_cwebp_stream(self, tmp_path):
        # cwebp encodes a real PNG losslessly; dwebp's decode of that same
        # stream is the reference our decoder must match bit-for-bit
        if shutil.which("cwebp") is None or shutil.which("dwebp") is None:
            pytest.skip("cwebp/dwebp not installed")
        from flink_gmall2024_realtime_spark.operators import multimodal

        src = tmp_path / "in.png"
        src.write_bytes(multimodal.synth_png_random(23, 17, seed=11))
        dst = tmp_path / "ext.webp"
        subprocess.run(
            ["cwebp", "-lossless", "-exact", str(src), "-o", str(dst)],
            check=True, capture_output=True,
        )
        w, h, ours = vp8l.decode_vp8l(_find_vp8l_chunk(dst.read_bytes()))
        assert (w, h) == (23, 17)
        out = tmp_path / "ref.pam"
        subprocess.run(
            ["dwebp", str(dst), "-pam", "-o", str(out)],
            check=True, capture_output=True,
        )
        w2, h2, ref = _parse_pam_rgba(out.read_bytes())
        assert (w2, h2) == (w, h)
        assert ours == ref

    @pytest.mark.parametrize("variant", [0, 2, 3, 5, 7])
    def test_roundtrip_through_pillow(self, variant):
        Image = _pil_webp()
        if Image is None:
            pytest.skip("Pillow with WebP support not installed")
        rng = random.Random(40 + variant)
        w, h = 21, 13
        if variant == 5:
            cols = self._fixture_pixels(8, 5)
            pix = [cols[rng.randrange(5)] for _ in range(w * h)]
        else:
            pix = self._fixture_pixels(40 + variant, w * h)
        # direction 1: Pillow decodes OUR stream
        payload = vp8l.encode_webp_lossless(pix, w, h, variant)
        img = Image.open(io.BytesIO(payload)).convert("RGBA")
        got = [
            _argb(px[3], px[0], px[1], px[2])
            for px in img.getdata()
        ]
        assert got == pix
        # direction 2: WE decode Pillow's lossless stream
        src = Image.new("RGBA", (w, h))
        src.putdata([((p >> 16) & 255, (p >> 8) & 255, p & 255, p >> 24) for p in pix])
        buf = io.BytesIO()
        src.save(buf, format="WEBP", lossless=True, exact=True)
        w2, h2, ours = vp8l.decode_vp8l(_find_vp8l_chunk(buf.getvalue()))
        assert (w2, h2) == (w, h)
        assert ours == pix
