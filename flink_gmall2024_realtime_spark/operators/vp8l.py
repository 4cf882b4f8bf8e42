"""VP8L (lossless WebP) bitstream codec — decoder + format-true encoder.

Zero vendored libraries: everything below is written from the public
"WebP Lossless Bitstream Specification" (Google, RFC-style spec shipped
with libwebp). The DECODER implements the full spec surface:

- LSB-first bit reading, canonical prefix codes decoded MSB-of-code-first
  (DEFLATE convention), both SIMPLE (1-2 symbol) and normal
  (code-length-coded, with 16/17/18 repeats and the max_symbol header)
  tree transmissions, single-symbol trees consuming 0 bits;
- the 5-tree group (green+length+cache / red / blue / alpha / distance),
  optional META-PREFIX entropy image selecting a tree group per 2^b block;
- LZ77 backward references with the 120-entry 2D distance-map short codes
  and the shared length/distance prefix-value scheme;
- the hash-addressed COLOR CACHE (0x1e35a7bd multiplier);
- all four transforms, applied inverse in reverse read order: PREDICTOR
  (14 modes incl. Select / ClampAddSubtractFull / ClampAddSubtractHalf,
  border rules), COLOR (signed 8-bit cross-channel deltas, >>5
  arithmetic), SUBTRACT_GREEN, COLOR_INDEXING (delta-coded palette +
  sub-byte pixel bundling for palettes <= 16).

The ENCODER is the fixture/verification side of the zstd pattern used
elsewhere in this repo (operators/zstdcodec.py): a format-true writer
that produces spec-valid streams through genuinely different code paths
(variant-rotated: plain literals, row-copy LZ77 incl. short distance
codes, color cache, subtract-green, predictor blocks, palette bundling,
meta-prefix groups, color transform) so the decoder's every branch is
exercised by hypothesis round-trips in both directions. It is NOT a
rate-optimized production encoder; it IS a valid one — real canonical
Huffman from symbol histograms, real code-length-code serialization.

Reference parity note: the reference engine (flink-gmall2024-realtime)
has no media path at all; this belongs to the beyond-reference
training-data-pipeline surface (SURVEY.md §2.11, mm-decode family).
"""

from __future__ import annotations

import struct
from heapq import heapify, heappop, heappush

from .codecguard import malformed_guard

# ---------------------------------------------------------------------------
# Constants from the spec
# ---------------------------------------------------------------------------

# Order in which code-length-code lengths are transmitted (spec §6.2.2).
CODE_LENGTH_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

# Short distance codes 1..120 map to a 2D neighborhood: byte = (y << 4) |
# (8 - x), i.e. x = 8 - (low nibble), y = high nibble, dist = y*xsize + x
# (clamped to >= 1). Transcribed from the spec's distance-mapping table.
DISTANCE_MAP = (
    0x18, 0x07, 0x17, 0x19, 0x28, 0x06, 0x27, 0x29, 0x16, 0x1A,
    0x26, 0x2A, 0x38, 0x05, 0x37, 0x39, 0x15, 0x1B, 0x36, 0x3A,
    0x25, 0x2B, 0x48, 0x04, 0x47, 0x49, 0x14, 0x1C, 0x35, 0x3B,
    0x46, 0x4A, 0x24, 0x2C, 0x58, 0x45, 0x4B, 0x34, 0x3C, 0x03,
    0x57, 0x59, 0x13, 0x1D, 0x56, 0x5A, 0x23, 0x2D, 0x44, 0x4C,
    0x55, 0x5B, 0x33, 0x3D, 0x68, 0x02, 0x67, 0x69, 0x12, 0x1E,
    0x66, 0x6A, 0x22, 0x2E, 0x54, 0x5C, 0x43, 0x4D, 0x65, 0x6B,
    0x32, 0x3E, 0x78, 0x01, 0x77, 0x79, 0x53, 0x5D, 0x11, 0x1F,
    0x64, 0x6C, 0x42, 0x4E, 0x76, 0x7A, 0x21, 0x2F, 0x75, 0x7B,
    0x31, 0x3F, 0x63, 0x6D, 0x52, 0x5E, 0x00, 0x74, 0x7C, 0x41,
    0x4F, 0x10, 0x20, 0x62, 0x6E, 0x30, 0x73, 0x7D, 0x51, 0x5F,
    0x40, 0x72, 0x7E, 0x61, 0x6F, 0x50, 0x71, 0x7F, 0x60, 0x70,
)

NUM_LENGTH_CODES = 24
NUM_DISTANCE_CODES = 40
MAX_CODE_LENGTH = 15
CACHE_MULT = 0x1E35A7BD

TRANSFORM_PREDICTOR = 0
TRANSFORM_COLOR = 1
TRANSFORM_SUBTRACT_GREEN = 2
TRANSFORM_COLOR_INDEXING = 3


# ---------------------------------------------------------------------------
# Bit I/O (LSB-first within bytes, like DEFLATE)
# ---------------------------------------------------------------------------


class _BitReader:
    __slots__ = ("data", "pos", "nbits")

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.nbits = len(data) * 8

    def bits(self, n: int) -> int:
        if self.pos + n > self.nbits:
            raise ValueError("vp8l: bitstream exhausted")
        v = 0
        p = self.pos
        d = self.data
        for i in range(n):
            v |= ((d[(p + i) >> 3] >> ((p + i) & 7)) & 1) << i
        self.pos = p + n
        return v

    def bit(self) -> int:
        if self.pos >= self.nbits:
            raise ValueError("vp8l: bitstream exhausted")
        b = (self.data[self.pos >> 3] >> (self.pos & 7)) & 1
        self.pos += 1
        return b


class _BitWriter:
    __slots__ = ("buf", "acc", "n")

    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, nbits: int) -> None:
        self.acc |= (value & ((1 << nbits) - 1)) << self.n
        self.n += nbits
        while self.n >= 8:
            self.buf.append(self.acc & 0xFF)
            self.acc >>= 8
            self.n -= 8

    def getvalue(self) -> bytes:
        out = bytes(self.buf)
        if self.n:
            out += bytes([self.acc & 0xFF])
        return out


# ---------------------------------------------------------------------------
# Canonical prefix codes
# ---------------------------------------------------------------------------


def _canonical_codes(lengths: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) for nonzero lengths, DEFLATE canonical
    numbering (codes of a length are consecutive, ordered by symbol)."""
    bl_count: dict[int, int] = {}
    for l in lengths:
        if l:
            bl_count[l] = bl_count.get(l, 0) + 1
    code = 0
    next_code: dict[int, int] = {}
    for l in range(1, MAX_CODE_LENGTH + 1):
        code = (code + bl_count.get(l - 1, 0)) << 1
        next_code[l] = code
    out: dict[int, tuple[int, int]] = {}
    for sym, l in enumerate(lengths):
        if l:
            out[sym] = (next_code[l], l)
            next_code[l] += 1
    return out


class _PrefixCode:
    """Decoder-side prefix code: either a 0-bit single-symbol code or a
    complete canonical code walked bit-by-bit (MSB of code first)."""

    __slots__ = ("single", "table")

    def __init__(self, lengths: list[int]) -> None:
        used = [s for s, l in enumerate(lengths) if l]
        if not used:
            raise ValueError("vp8l: prefix code with no symbols")
        if len(used) == 1:
            self.single: int | None = used[0]
            self.table: dict[tuple[int, int], int] = {}
            return
        self.single = None
        # completeness (Kraft sum must be exactly 1 for >1 symbol)
        kraft = sum(1 << (MAX_CODE_LENGTH - lengths[s]) for s in used)
        if kraft != 1 << MAX_CODE_LENGTH:
            raise ValueError("vp8l: invalid (incomplete/oversubscribed) prefix code")
        self.table = {
            (l, code): sym for sym, (code, l) in _canonical_codes(lengths).items()
        }

    @classmethod
    def simple(cls, symbols: list[int]) -> "_PrefixCode":
        pc = cls.__new__(cls)
        if len(symbols) == 1:
            pc.single = symbols[0]
            pc.table = {}
        else:
            pc.single = None
            pc.table = {(1, 0): symbols[0], (1, 1): symbols[1]}
        return pc

    def read(self, br: _BitReader) -> int:
        if self.single is not None:
            return self.single
        code = 0
        for l in range(1, MAX_CODE_LENGTH + 1):
            code = (code << 1) | br.bit()
            sym = self.table.get((l, code))
            if sym is not None:
                return sym
        raise ValueError("vp8l: prefix code walk exceeded 15 bits")


def _read_prefix_code(br: _BitReader, alphabet_size: int) -> _PrefixCode:
    """Spec §6.2.1/§6.2.2: SIMPLE (1-2 symbols) or normal transmission."""
    if br.bit():  # simple
        num_symbols = br.bit() + 1
        first_8bits = br.bit()
        sym0 = br.bits(8 if first_8bits else 1)
        symbols = [sym0]
        if num_symbols == 2:
            symbols.append(br.bits(8))
        for s in symbols:
            if s >= alphabet_size:
                raise ValueError("vp8l: simple-code symbol out of alphabet")
        if num_symbols == 2 and symbols[0] == symbols[1]:
            raise ValueError("vp8l: duplicate simple-code symbols")
        return _PrefixCode.simple(symbols)
    # normal: code-length code over 19 meta symbols
    num_code_lengths = 4 + br.bits(4)
    if num_code_lengths > len(CODE_LENGTH_ORDER):
        raise ValueError("vp8l: bad num_code_lengths")
    cl_lengths = [0] * 19
    for i in range(num_code_lengths):
        cl_lengths[CODE_LENGTH_ORDER[i]] = br.bits(3)
    cl_code = _PrefixCode(cl_lengths)
    if br.bit():  # limited max_symbol
        length_nbits = 2 + 2 * br.bits(3)
        max_symbol = 2 + br.bits(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    prev_code_len = 8
    symbol = 0
    while symbol < alphabet_size:
        if max_symbol == 0:
            break
        max_symbol -= 1
        code_len = cl_code.read(br)
        if code_len < 16:
            lengths[symbol] = code_len
            symbol += 1
            if code_len:
                prev_code_len = code_len
        else:
            if code_len == 16:
                repeat, fill = 3 + br.bits(2), prev_code_len
            elif code_len == 17:
                repeat, fill = 3 + br.bits(3), 0
            else:
                repeat, fill = 11 + br.bits(7), 0
            if symbol + repeat > alphabet_size:
                raise ValueError("vp8l: code-length repeat overflows alphabet")
            for _ in range(repeat):
                lengths[symbol] = fill
                symbol += 1
    return _PrefixCode(lengths)


def _prefix_value_decode(br: _BitReader, prefix_code: int) -> int:
    """Shared LZ77 length/distance value scheme (spec §5.2.2)."""
    if prefix_code < 4:
        return prefix_code + 1
    extra_bits = (prefix_code - 2) >> 1
    offset = (2 + (prefix_code & 1)) << extra_bits
    return offset + br.bits(extra_bits) + 1


def _prefix_value_encode(value: int) -> tuple[int, int, int]:
    """value -> (prefix_code, extra_bits_value, extra_bits_count)."""
    if value <= 4:
        return value - 1, 0, 0
    v = value - 1
    extra_bits = v.bit_length() - 2
    offset = (2 + ((v >> extra_bits) & 1)) << extra_bits
    return (
        2 * extra_bits + ((v >> extra_bits) & 1) + 2,
        v - offset,
        extra_bits,
    )


# ---------------------------------------------------------------------------
# ARGB helpers
# ---------------------------------------------------------------------------


def _argb(a: int, r: int, g: int, b: int) -> int:
    return (a << 24) | (r << 16) | (g << 8) | b


def _split(p: int) -> tuple[int, int, int, int]:
    return (p >> 24) & 0xFF, (p >> 16) & 0xFF, (p >> 8) & 0xFF, p & 0xFF


def _cache_hash(p: int, bits: int) -> int:
    return ((CACHE_MULT * p) & 0xFFFFFFFF) >> (32 - bits)


def _sub_size(size: int, bits: int) -> int:
    return (size + (1 << bits) - 1) >> bits


# ---------------------------------------------------------------------------
# Entropy-coded image decode (shared by main image and sub-images)
# ---------------------------------------------------------------------------


def _read_tree_group(br: _BitReader, cache_size: int) -> list[_PrefixCode]:
    return [
        _read_prefix_code(br, 256 + NUM_LENGTH_CODES + cache_size),
        _read_prefix_code(br, 256),
        _read_prefix_code(br, 256),
        _read_prefix_code(br, 256),
        _read_prefix_code(br, NUM_DISTANCE_CODES),
    ]


def _decode_entropy_image(
    br: _BitReader, w: int, h: int, top_level: bool
) -> list[int]:
    """Decode one entropy-coded ARGB image of w x h pixels (spec §5/§6.2.3).
    ``top_level`` enables the meta-prefix header (main image only)."""
    cache_bits = 0
    if br.bit():
        cache_bits = br.bits(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError("vp8l: color cache bits out of range")
    meta: list[int] | None = None
    meta_bits = 0
    num_groups = 1
    if top_level and br.bit():
        meta_bits = br.bits(3) + 2
        mw, mh = _sub_size(w, meta_bits), _sub_size(h, meta_bits)
        meta = _decode_entropy_image(br, mw, mh, False)
        num_groups = max(((p >> 8) & 0xFFFF) for p in meta) + 1
    cache_size = (1 << cache_bits) if cache_bits else 0
    groups = [_read_tree_group(br, cache_size) for _ in range(num_groups)]
    cache = [0] * cache_size
    npix = w * h
    out: list[int] = []
    trees = groups[0]
    while len(out) < npix:
        if meta is not None:
            x, y = len(out) % w, len(out) // w
            mp = meta[(y >> meta_bits) * _sub_size(w, meta_bits) + (x >> meta_bits)]
            trees = groups[(mp >> 8) & 0xFFFF]
        green_code, red_code, blue_code, alpha_code, dist_code = trees
        s = green_code.read(br)
        if s < 256:  # literal
            r = red_code.read(br)
            b = blue_code.read(br)
            a = alpha_code.read(br)
            p = _argb(a, r, s, b)
            out.append(p)
            if cache_size:
                cache[_cache_hash(p, cache_bits)] = p
        elif s < 256 + NUM_LENGTH_CODES:  # LZ77 backref
            length = _prefix_value_decode(br, s - 256)
            dcode = _prefix_value_decode(br, dist_code.read(br))
            if dcode > 120:
                dist = dcode - 120
            else:
                b8 = DISTANCE_MAP[dcode - 1]
                dist = (b8 >> 4) * w + (8 - (b8 & 0xF))
                if dist < 1:
                    dist = 1
            if dist > len(out):
                raise ValueError("vp8l: backref distance before image start")
            if len(out) + length > npix:
                raise ValueError("vp8l: backref overruns image")
            base = len(out) - dist
            for i in range(length):
                p = out[base + i]
                out.append(p)
                if cache_size:
                    cache[_cache_hash(p, cache_bits)] = p
        else:  # color-cache reference
            idx = s - 256 - NUM_LENGTH_CODES
            if idx >= cache_size:
                raise ValueError("vp8l: color-cache index out of range")
            out.append(cache[idx])
    return out


# ---------------------------------------------------------------------------
# Transforms (decode side = inverse)
# ---------------------------------------------------------------------------


def _avg2(a: int, b: int) -> int:
    return (a + b) >> 1


def _clamp(v: int) -> int:
    return 0 if v < 0 else (255 if v > 255 else v)


def _c_div2(d: int) -> int:
    """C-style truncation toward zero of d/2 (Python // floors)."""
    return -((-d) >> 1) if d < 0 else d >> 1


def _predict(mode: int, left: int, top: int, tl: int, tr: int) -> int:
    if mode == 0:
        return 0xFF000000
    if mode == 1:
        return left
    if mode == 2:
        return top
    if mode == 3:
        return tr
    if mode == 4:
        return tl
    la, lr, lg, lb = _split(left)
    ta, tr_, tg, tb = _split(top)
    if mode == 5:
        ra, rr, rg, rb = _split(tr)
        return _argb(
            _avg2(_avg2(la, ra), ta),
            _avg2(_avg2(lr, rr), tr_),
            _avg2(_avg2(lg, rg), tg),
            _avg2(_avg2(lb, rb), tb),
        )
    ca, cr, cg, cb = _split(tl)
    if mode == 6:
        return _argb(_avg2(la, ca), _avg2(lr, cr), _avg2(lg, cg), _avg2(lb, cb))
    if mode == 7:
        return _argb(_avg2(la, ta), _avg2(lr, tr_), _avg2(lg, tg), _avg2(lb, tb))
    if mode == 8:
        return _argb(_avg2(ca, ta), _avg2(cr, tr_), _avg2(cg, tg), _avg2(cb, tb))
    if mode == 9:
        ra, rr, rg, rb = _split(tr)
        return _argb(_avg2(ta, ra), _avg2(tr_, rr), _avg2(tg, rg), _avg2(tb, rb))
    if mode == 10:
        ra, rr, rg, rb = _split(tr)
        return _argb(
            _avg2(_avg2(la, ca), _avg2(ta, ra)),
            _avg2(_avg2(lr, cr), _avg2(tr_, rr)),
            _avg2(_avg2(lg, cg), _avg2(tg, rg)),
            _avg2(_avg2(lb, cb), _avg2(tb, rb)),
        )
    if mode == 11:  # Select
        pa = la + ta - ca
        pr = lr + tr_ - cr
        pg = lg + tg - cg
        pb = lb + tb - cb
        p_l = abs(pa - la) + abs(pr - lr) + abs(pg - lg) + abs(pb - lb)
        p_t = abs(pa - ta) + abs(pr - tr_) + abs(pg - tg) + abs(pb - tb)
        return left if p_l < p_t else top
    if mode == 12:  # ClampAddSubtractFull
        return _argb(
            _clamp(la + ta - ca),
            _clamp(lr + tr_ - cr),
            _clamp(lg + tg - cg),
            _clamp(lb + tb - cb),
        )
    if mode == 13:  # ClampAddSubtractHalf
        return _argb(
            _clamp(_avg2(la, ta) + _c_div2(_avg2(la, ta) - ca)),
            _clamp(_avg2(lr, tr_) + _c_div2(_avg2(lr, tr_) - cr)),
            _clamp(_avg2(lg, tg) + _c_div2(_avg2(lg, tg) - cg)),
            _clamp(_avg2(lb, tb) + _c_div2(_avg2(lb, tb) - cb)),
        )
    raise ValueError(f"vp8l: predictor mode {mode} out of range")


def _predictor_mode_at(
    modes: list[int], mode_w: int, bits: int, x: int, y: int
) -> int:
    return (modes[(y >> bits) * mode_w + (x >> bits)] >> 8) & 0xFF


def _apply_inverse_predictor(
    pix: list[int], w: int, h: int, modes: list[int], bits: int
) -> None:
    mode_w = _sub_size(w, bits)
    for y in range(h):
        for x in range(w):
            i = y * w + x
            if x == 0 and y == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = pix[i - 1]  # L (forced on top row)
            elif x == 0:
                pred = pix[i - w]  # T (forced on first column)
            else:
                mode = _predictor_mode_at(modes, mode_w, bits, x, y)
                tr = pix[i - w + 1] if x + 1 < w else pix[i - w]
                pred = _predict(mode, pix[i - 1], pix[i - w], pix[i - w - 1], tr)
            a, r, g, b = _split(pix[i])
            pa, pr, pg, pb = _split(pred)
            pix[i] = _argb((a + pa) & 0xFF, (r + pr) & 0xFF, (g + pg) & 0xFF, (b + pb) & 0xFF)


def _ct_delta(t: int, c: int) -> int:
    """(int8(t) * int8(c)) >> 5 with arithmetic shift."""
    ts = t - 256 if t >= 128 else t
    cs = c - 256 if c >= 128 else c
    return (ts * cs) >> 5


def _apply_inverse_color_transform(
    pix: list[int], w: int, h: int, ctes: list[int], bits: int
) -> None:
    cte_w = _sub_size(w, bits)
    for y in range(h):
        for x in range(w):
            i = y * w + x
            cte = ctes[(y >> bits) * cte_w + (x >> bits)]
            _, r2b, g2b, g2r = _split(cte)
            a, r, g, b = _split(pix[i])
            r = (r + _ct_delta(g2r, g)) & 0xFF
            b = (b + _ct_delta(g2b, g) + _ct_delta(r2b, r)) & 0xFF
            pix[i] = _argb(a, r, g, b)


def _apply_inverse_subtract_green(pix: list[int]) -> None:
    for i, p in enumerate(pix):
        a, r, g, b = _split(p)
        pix[i] = _argb(a, (r + g) & 0xFF, g, (b + g) & 0xFF)


def _index_width_bits(palette_size: int) -> int:
    if palette_size <= 2:
        return 3  # 8 pixels per byte (1 bit each)
    if palette_size <= 4:
        return 2  # 4 pixels per byte (2 bits each)
    if palette_size <= 16:
        return 1  # 2 pixels per byte (4 bits each)
    return 0


def _apply_inverse_color_indexing(
    packed: list[int], w: int, h: int, palette: list[int], width_bits: int
) -> list[int]:
    """Unbundle sub-byte indices from the green channel and map through the
    (already delta-accumulated) palette."""
    if width_bits == 0:
        out = []
        for p in packed:
            idx = (p >> 8) & 0xFF
            if idx >= len(palette):
                raise ValueError("vp8l: palette index out of range")
            out.append(palette[idx])
        return out
    packed_w = _sub_size(w, width_bits)
    per = 1 << width_bits
    bits_pp = 8 >> width_bits
    mask = (1 << bits_pp) - 1
    out = [0] * (w * h)
    for y in range(h):
        for x in range(w):
            g = (packed[y * packed_w + (x >> width_bits)] >> 8) & 0xFF
            idx = (g >> (bits_pp * (x % per))) & mask
            if idx >= len(palette):
                raise ValueError("vp8l: palette index out of range")
            out[y * w + x] = palette[idx]
    return out


# ---------------------------------------------------------------------------
# Top-level decode
# ---------------------------------------------------------------------------


@malformed_guard
def decode_vp8l(payload: bytes) -> tuple[int, int, list[int]]:
    """Decode a VP8L chunk payload (starting with the 0x2F signature byte)
    to (width, height, row-major ARGB pixel list)."""
    if not payload or payload[0] != 0x2F:
        raise ValueError("vp8l: bad signature byte")
    br = _BitReader(payload[1:])
    w = br.bits(14) + 1
    h = br.bits(14) + 1
    br.bit()  # alpha_is_used hint
    if br.bits(3) != 0:
        raise ValueError("vp8l: unsupported version")
    transforms: list[tuple[int, object]] = []
    seen: set[int] = set()
    cur_w = w
    while br.bit():
        ttype = br.bits(2)
        if ttype in seen:
            raise ValueError("vp8l: duplicate transform")
        seen.add(ttype)
        if ttype == TRANSFORM_PREDICTOR or ttype == TRANSFORM_COLOR:
            bits = br.bits(3) + 2
            sw, sh = _sub_size(cur_w, bits), _sub_size(h, bits)
            sub = _decode_entropy_image(br, sw, sh, False)
            transforms.append((ttype, (bits, sub)))
        elif ttype == TRANSFORM_SUBTRACT_GREEN:
            transforms.append((ttype, None))
        else:  # COLOR_INDEXING
            palette_size = br.bits(8) + 1
            raw = _decode_entropy_image(br, palette_size, 1, False)
            palette: list[int] = []
            prev = 0
            for p in raw:  # componentwise delta accumulation
                a, r, g, b = _split(p)
                pa, pr, pg, pb = _split(prev)
                prev = _argb((a + pa) & 0xFF, (r + pr) & 0xFF, (g + pg) & 0xFF, (b + pb) & 0xFF)
                palette.append(prev)
            width_bits = _index_width_bits(palette_size)
            transforms.append((ttype, (width_bits, palette)))
            cur_w = _sub_size(cur_w, width_bits)
    pix = _decode_entropy_image(br, cur_w, h, True)
    for ttype, tdata in reversed(transforms):
        if ttype == TRANSFORM_PREDICTOR:
            bits, sub = tdata  # type: ignore[misc]
            _apply_inverse_predictor(pix, cur_w, h, sub, bits)
        elif ttype == TRANSFORM_COLOR:
            bits, sub = tdata  # type: ignore[misc]
            _apply_inverse_color_transform(pix, cur_w, h, sub, bits)
        elif ttype == TRANSFORM_SUBTRACT_GREEN:
            _apply_inverse_subtract_green(pix)
        else:
            width_bits, palette = tdata  # type: ignore[misc]
            pix = _apply_inverse_color_indexing(pix, w, h, palette, width_bits)
            cur_w = w
    if len(pix) != w * h:
        raise ValueError("vp8l: decoded pixel count mismatch")
    return w, h, pix


@malformed_guard
def decode_webp_pixels(payload: bytes) -> tuple[int, int, int, int]:
    """RIFF walk -> VP8L pixel decode: (width, height, n_px, sample_sum)
    where n_px counts 4 channels per pixel and sample_sum is the ARGB
    channel total. Lossy VP8 stays the vendored seam."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WEBP":
        raise ValueError("not a WebP payload")
    off = 12
    while off + 8 <= len(payload):
        fourcc = payload[off : off + 4]
        size = struct.unpack("<I", payload[off + 4 : off + 8])[0]
        body = payload[off + 8 : off + 8 + size]
        if fourcc == b"VP8L":
            w, h, pix = decode_vp8l(body)
            total = 0
            for p in pix:
                total += (p >> 24) + ((p >> 16) & 0xFF) + ((p >> 8) & 0xFF) + (p & 0xFF)
            return w, h, 4 * w * h, total
        if fourcc == b"VP8 ":
            raise NotImplementedError(
                "lossy VP8 pixel decode is the vendored seam; VP8L decodes in-repo"
            )
        off += 8 + size + (size & 1)
    raise ValueError("vp8l: no VP8L chunk in container")

# ---------------------------------------------------------------------------
# Encoder (format-true fixture writer — the verification twin of the decoder)
# ---------------------------------------------------------------------------


def _huffman_lengths(freqs: dict[int, int], maxlen: int = MAX_CODE_LENGTH) -> dict[int, int]:
    """Real Huffman code lengths from a symbol histogram. Alphabets here are
    tiny (fixture images), so depth never approaches 15; if a pathological
    histogram would, fall back to a balanced complete code (valid, just not
    optimal)."""
    syms = sorted(freqs)
    if not syms:
        raise ValueError("vp8l: empty histogram")
    if len(syms) == 1:
        return {syms[0]: 1}
    heap: list[tuple[int, int, list[int]]] = [
        (freqs[s], i, [s]) for i, s in enumerate(syms)
    ]
    heapify(heap)
    tick = len(heap)
    depths = {s: 0 for s in syms}
    while len(heap) > 1:
        fa, _, la = heappop(heap)
        fb, _, lb = heappop(heap)
        for s in la + lb:
            depths[s] += 1
        heappush(heap, (fa + fb, tick, la + lb))
        tick += 1
    if max(depths.values()) > maxlen:
        k = (len(syms) - 1).bit_length()
        n_short = (1 << k) - len(syms)
        out = {}
        for i, s in enumerate(syms):
            out[s] = k - 1 if i < n_short else k
        return out
    return depths


class _TreeWriter:
    """Encoder-side prefix code: canonical codes from lengths, emitted
    MSB-of-code-first (matching the decoder's bit-by-bit walk)."""

    __slots__ = ("codes", "single")

    def __init__(self, lengths: list[int]) -> None:
        used = [s for s, l in enumerate(lengths) if l]
        self.single = used[0] if len(used) == 1 else None
        self.codes = _canonical_codes(lengths)

    def write(self, bw: _BitWriter, sym: int) -> None:
        if self.single is not None:
            if sym != self.single:
                raise ValueError("vp8l: symbol outside single-symbol code")
            return
        code, l = self.codes[sym]
        for i in range(l - 1, -1, -1):
            bw.write((code >> i) & 1, 1)


def _lengths_to_meta_tokens(lengths: list[int]) -> list[tuple[int, int, int]]:
    """RLE a code-length array into (meta_symbol, extra_value, extra_bits)
    tokens using codes 16 (repeat prev) / 17 / 18 (zero runs)."""
    out: list[tuple[int, int, int]] = []
    # trailing zeros are implied by the decoder's fill loop, but the spec's
    # reader stops only at alphabet end — safe to RLE them explicitly
    i, n = 0, len(lengths)
    prev = 8
    while i < n:
        l = lengths[i]
        run = 1
        while i + run < n and lengths[i + run] == l:
            run += 1
        if l == 0:
            left = run
            while left >= 11:
                take = min(left, 11 + 127)
                out.append((18, take - 11, 7))
                left -= take
            while left >= 3:
                take = min(left, 3 + 7)
                out.append((17, take - 3, 3))
                left -= take
            for _ in range(left):
                out.append((0, 0, 0))
        else:
            out.append((l, 0, 0))
            prev = l
            left = run - 1
            while left >= 3:
                take = min(left, 3 + 3)
                out.append((16, take - 3, 2))
                left -= take
            for _ in range(left):
                out.append((l, 0, 0))
        i += run
    return out


def _write_prefix_code(bw: _BitWriter, lengths: list[int]) -> _TreeWriter:
    """Serialize a prefix code: SIMPLE when <=2 used symbols all <256,
    else the full code-length-coded transmission."""
    used = [s for s, l in enumerate(lengths) if l]
    if 1 <= len(used) <= 2 and all(s < 256 for s in used):
        bw.write(1, 1)  # simple
        bw.write(len(used) - 1, 1)
        first = used[0]
        if first <= 1 and len(used) == 1:
            bw.write(0, 1)  # 1-bit first symbol
            bw.write(first, 1)
        else:
            bw.write(1, 1)  # 8-bit first symbol
            bw.write(first, 8)
        if len(used) == 2:
            bw.write(used[1], 8)
        return _TreeWriter(lengths)
    bw.write(0, 1)  # normal
    tokens = _lengths_to_meta_tokens(lengths)
    meta_freqs: dict[int, int] = {}
    for sym, _, _ in tokens:
        meta_freqs[sym] = meta_freqs.get(sym, 0) + 1
    if len(meta_freqs) == 1:
        # a single-symbol code-length code decodes 0-bit; ensure >= 2 meta
        # symbols by splitting one run (keeps the stream boring but complete)
        only = next(iter(meta_freqs))
        meta_freqs[0 if only != 0 else 1] = 0  # placeholder; assign len below
        ml = {only: 1, (0 if only != 0 else 1): 1}
    else:
        ml = _huffman_lengths(meta_freqs, maxlen=7)
    meta_lengths = [0] * 19
    for s, l in ml.items():
        meta_lengths[s] = l
    num_code_lengths = max(
        i + 1 for i, s in enumerate(CODE_LENGTH_ORDER) if meta_lengths[s]
    )
    num_code_lengths = max(num_code_lengths, 4)
    bw.write(num_code_lengths - 4, 4)
    for i in range(num_code_lengths):
        bw.write(meta_lengths[CODE_LENGTH_ORDER[i]], 3)
    meta_tree = _TreeWriter(meta_lengths)
    bw.write(0, 1)  # no max_symbol header: transmit full alphabet
    for sym, extra, nbits in tokens:
        meta_tree.write(bw, sym)
        if nbits:
            bw.write(extra, nbits)
    return _TreeWriter(lengths)


# Token kinds for entropy-image encoding: ("lit", argb), ("copy", length,
# distance_value_with_map_bias) where the distance value is ALREADY in
# spec space (short code 1..120 or plain dist+120), ("cache", index).


def _tokenize_literals(pix: list[int]) -> list[tuple]:
    return [("lit", p) for p in pix]


def _tokenize_row_lz77(pix: list[int], w: int, h: int) -> list[tuple]:
    """Literal first row(s); any row identical to the previous one becomes
    backrefs of distance w — alternating between the 2D short code (0, 1)
    (= distance code 1) and the plain code w + 120, in <=4096 chunks."""
    toks: list[tuple] = []
    y = 0
    use_short = True
    while y < h:
        row = pix[y * w : (y + 1) * w]
        if y > 0 and row == pix[(y - 1) * w : y * w]:
            run_rows = 1
            while (
                y + run_rows < h
                and pix[(y + run_rows) * w : (y + run_rows + 1) * w] == row
            ):
                run_rows += 1
            left = run_rows * w
            while left > 0:
                take = min(left, 4096)
                toks.append(("copy", take, 1 if use_short else w + 120))
                use_short = not use_short
                left -= take
            y += run_rows
        else:
            toks.extend(("lit", p) for p in row)
            y += 1
    return toks


def _tokenize_cache(pix: list[int], cache_bits: int) -> list[tuple]:
    """Literal on miss, cache reference on hit — mirrors the decoder's
    insertion rule (every emitted pixel is inserted)."""
    cache = [None] * (1 << cache_bits)
    toks: list[tuple] = []
    for p in pix:
        h = _cache_hash(p, cache_bits)
        if cache[h] == p:
            toks.append(("cache", h))
        else:
            toks.append(("lit", p))
            cache[h] = p
    return toks


def _write_entropy_image(
    bw: _BitWriter,
    tokens_by_group: list[list[tuple]],
    order: list[int],
    cache_bits: int,
    meta: tuple[int, list[int], int, int] | None,
    top_level: bool,
) -> None:
    """Write one entropy-coded image: cache header, optional meta-prefix
    header (top level only), tree groups, then the token stream. ``order``
    gives, per output pixel, the tree-group index; ``tokens_by_group[g]``
    are consumed in stream order."""
    bw.write(1 if cache_bits else 0, 1)
    if cache_bits:
        bw.write(cache_bits, 4)
    if top_level:
        if meta is not None:
            bw.write(1, 1)
            meta_bits, meta_pix, mw, mh = meta
            bw.write(meta_bits - 2, 3)
            _write_entropy_image(
                bw, [_tokenize_literals(meta_pix)], [0] * len(meta_pix), 0, None, False
            )
        else:
            bw.write(0, 1)
    cache_size = (1 << cache_bits) if cache_bits else 0
    green_n = 256 + NUM_LENGTH_CODES + cache_size
    group_trees: list[list[_TreeWriter]] = []
    for toks in tokens_by_group:
        hists = [dict() for _ in range(5)]  # green+, red, blue, alpha, dist

        def bump(h: dict, s: int) -> None:
            h[s] = h.get(s, 0) + 1

        for t in toks:
            if t[0] == "lit":
                a, r, g, b = _split(t[1])
                bump(hists[0], g)
                bump(hists[1], r)
                bump(hists[2], b)
                bump(hists[3], a)
            elif t[0] == "copy":
                lcode, _, _ = _prefix_value_encode(t[1])
                bump(hists[0], 256 + lcode)
                dcode, _, _ = _prefix_value_encode(t[2])
                bump(hists[4], dcode)
            else:
                bump(hists[0], 256 + NUM_LENGTH_CODES + t[1])
        # every tree must exist; unused trees get a 1-symbol simple code
        for h, default in zip(hists, (0, 0, 0, 255, 0)):
            if not h:
                h[default] = 1
        sizes = (green_n, 256, 256, 256, NUM_DISTANCE_CODES)
        trees = []
        for h, n in zip(hists, sizes):
            lengths = [0] * n
            for s, l in _huffman_lengths(h).items():
                lengths[s] = l
            trees.append(_write_prefix_code(bw, lengths))
        group_trees.append(trees)
    cursors = [0] * len(tokens_by_group)
    for g in order:
        toks = tokens_by_group[g]
        t = toks[cursors[g]]
        cursors[g] += 1
        green, red, blue, alpha, dist = group_trees[g]
        if t[0] == "lit":
            a, r, gg, b = _split(t[1])
            green.write(bw, gg)
            red.write(bw, r)
            blue.write(bw, b)
            alpha.write(bw, a)
        elif t[0] == "copy":
            lcode, lex, lbits = _prefix_value_encode(t[1])
            green.write(bw, 256 + lcode)
            if lbits:
                bw.write(lex, lbits)
            dcode, dex, dbits = _prefix_value_encode(t[2])
            dist.write(bw, dcode)
            if dbits:
                bw.write(dex, dbits)
        else:
            green.write(bw, 256 + NUM_LENGTH_CODES + t[1])


def _token_order(tokens: list[tuple], groups: list[int] | None) -> list[int]:
    """Expand a token list to a per-token group-index sequence (all zeros
    when no meta grouping)."""
    return groups if groups is not None else [0] * len(tokens)


def _forward_subtract_green(pix: list[int]) -> list[int]:
    out = []
    for p in pix:
        a, r, g, b = _split(p)
        out.append(_argb(a, (r - g) & 0xFF, g, (b - g) & 0xFF))
    return out


def _forward_predictor(
    pix: list[int], w: int, h: int, modes: list[int], bits: int
) -> list[int]:
    """Residuals (c - pred) mod 256; predictions come from the ORIGINAL
    pixels, which is exactly what the decoder has reconstructed when it
    reaches each position."""
    mode_w = _sub_size(w, bits)
    out = [0] * (w * h)
    for y in range(h):
        for x in range(w):
            i = y * w + x
            if x == 0 and y == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = pix[i - 1]
            elif x == 0:
                pred = pix[i - w]
            else:
                mode = _predictor_mode_at(modes, mode_w, bits, x, y)
                tr = pix[i - w + 1] if x + 1 < w else pix[i - w]
                pred = _predict(mode, pix[i - 1], pix[i - w], pix[i - w - 1], tr)
            a, r, g, b = _split(pix[i])
            pa, pr, pg, pb = _split(pred)
            out[i] = _argb((a - pa) & 0xFF, (r - pr) & 0xFF, (g - pg) & 0xFF, (b - pb) & 0xFF)
    return out


def _forward_color_transform(
    pix: list[int], w: int, h: int, ctes: list[int], bits: int
) -> list[int]:
    cte_w = _sub_size(w, bits)
    out = [0] * (w * h)
    for y in range(h):
        for x in range(w):
            i = y * w + x
            cte = ctes[(y >> bits) * cte_w + (x >> bits)]
            _, r2b, g2b, g2r = _split(cte)
            a, r, g, b = _split(pix[i])
            b_enc = (b - _ct_delta(g2b, g) - _ct_delta(r2b, r)) & 0xFF
            r_enc = (r - _ct_delta(g2r, g)) & 0xFF
            out[i] = _argb(a, r_enc, g, b_enc)
    return out


def _delta_code_palette(palette: list[int]) -> list[int]:
    out = []
    prev = 0
    for p in palette:
        a, r, g, b = _split(p)
        pa, pr, pg, pb = _split(prev)
        out.append(_argb((a - pa) & 0xFF, (r - pr) & 0xFF, (g - pg) & 0xFF, (b - pb) & 0xFF))
        prev = p
    return out


def encode_vp8l(pix: list[int], w: int, h: int, variant: int = 0) -> bytes:
    """Encode row-major ARGB pixels as a spec-valid VP8L chunk payload.

    Variant selects the code path exercised (all reproduce the exact same
    pixels): 0 plain literals; 1 row-copy LZ77 (short 2D distance code +
    plain code, chunked <= 4096); 2 color cache; 3 subtract-green;
    4 predictor transform (alternating modes 1/2 per 4x4 block);
    5 color-indexing palette with sub-byte bundling (<= 16 distinct
    colors required); 6 meta-prefix (two tree groups by 4x4 block
    parity); 7 cross-channel color transform (per-8x8-block elements)."""
    if not 1 <= w <= 16384 and not 1 <= h <= 16384:
        raise ValueError("vp8l: dimensions out of range")
    if len(pix) != w * h:
        raise ValueError("vp8l: pixel count mismatch")
    variant %= 8
    bw = _BitWriter()
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(1 if any((p >> 24) & 0xFF != 255 for p in pix) else 0, 1)
    bw.write(0, 3)  # version
    data = pix
    cur_w = w
    if variant == 3:
        bw.write(1, 1)
        bw.write(TRANSFORM_SUBTRACT_GREEN, 2)
        data = _forward_subtract_green(pix)
    elif variant == 4:
        bits = 2
        mw, mh = _sub_size(w, bits), _sub_size(h, bits)
        modes = [
            _argb(0, 0, 1 if (bx + by) % 2 == 0 else 2, 0)
            for by in range(mh)
            for bx in range(mw)
        ]
        bw.write(1, 1)
        bw.write(TRANSFORM_PREDICTOR, 2)
        bw.write(bits - 2, 3)
        _write_entropy_image(
            bw, [_tokenize_literals(modes)], [0] * len(modes), 0, None, False
        )
        data = _forward_predictor(pix, w, h, modes, bits)
    elif variant == 7:
        bits = 3
        cw, ch = _sub_size(w, bits), _sub_size(h, bits)
        ctes = [
            _argb(255, 0x08 + (by % 2) * 4, 0xF0, 0x10 + (bx % 3) * 8)
            for by in range(ch)
            for bx in range(cw)
        ]
        bw.write(1, 1)
        bw.write(TRANSFORM_COLOR, 2)
        bw.write(bits - 2, 3)
        _write_entropy_image(
            bw, [_tokenize_literals(ctes)], [0] * len(ctes), 0, None, False
        )
        data = _forward_color_transform(pix, w, h, ctes, bits)
    elif variant == 5:
        palette: list[int] = []
        index: dict[int, int] = {}
        for p in pix:
            if p not in index:
                index[p] = len(palette)
                palette.append(p)
        if len(palette) > 16:
            raise ValueError(
                "vp8l: color-indexing fixture variant needs <= 16 distinct colors"
            )
        width_bits = _index_width_bits(len(palette))
        bw.write(1, 1)
        bw.write(TRANSFORM_COLOR_INDEXING, 2)
        bw.write(len(palette) - 1, 8)
        dpal = _delta_code_palette(palette)
        _write_entropy_image(
            bw, [_tokenize_literals(dpal)], [0] * len(dpal), 0, None, False
        )
        per = 1 << width_bits
        bits_pp = 8 >> width_bits
        cur_w = _sub_size(w, width_bits)
        packed = []
        for y in range(h):
            for px in range(cur_w):
                g = 0
                for k in range(per):
                    x = (px << width_bits) + k
                    if x < w:
                        g |= index[pix[y * w + x]] << (bits_pp * k)
                packed.append(_argb(0, 0, g, 0))
        data = packed
    bw.write(0, 1)  # no more transforms
    meta = None
    groups_order: list[int] | None = None
    cache_bits = 0
    if variant == 1:
        tokens_by_group = [_tokenize_row_lz77(data, cur_w, h)]
    elif variant == 2:
        cache_bits = 4
        tokens_by_group = [_tokenize_cache(data, cache_bits)]
    elif variant == 6:
        meta_bits = 2
        mw, mh = _sub_size(cur_w, meta_bits), _sub_size(h, meta_bits)
        gid = lambda x, y: ((x >> meta_bits) + (y >> meta_bits)) % 2  # noqa: E731
        meta_pix = [
            _argb(0, 0, (bx + by) % 2, 0) for by in range(mh) for bx in range(mw)
        ]
        meta = (meta_bits, meta_pix, mw, mh)
        groups_order = [gid(i % cur_w, i // cur_w) for i in range(len(data))]
        tokens_by_group = [
            [("lit", p) for i, p in enumerate(data) if groups_order[i] == 0],
            [("lit", p) for i, p in enumerate(data) if groups_order[i] == 1],
        ]
        if not tokens_by_group[1]:  # degenerate tiny image: single group
            meta = (meta_bits, [_argb(0, 0, 0, 0)] * (mw * mh), mw, mh)
            groups_order = [0] * len(data)
            tokens_by_group = tokens_by_group[:1]
    else:
        tokens_by_group = [_tokenize_literals(data)]
    _write_entropy_image(
        bw,
        tokens_by_group,
        groups_order if groups_order is not None else [0] * len(tokens_by_group[0]),
        cache_bits,
        meta,
        True,
    )
    return b"\x2f" + bw.getvalue()


def encode_webp_lossless(pix: list[int], w: int, h: int, variant: int = 0) -> bytes:
    """Wrap an encoded VP8L payload in the RIFF/WEBP container."""
    body = encode_vp8l(pix, w, h, variant)
    chunk = b"VP8L" + struct.pack("<I", len(body)) + body
    if len(body) & 1:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def synth_webp_lossless(seed: int) -> bytes:
    """Deterministic lossless-WebP fixture: w = seed%29+5, h = seed%13+3,
    pixel(x, y) = palette[x%4] with palette channel c_i = (seed*k + i*m)
    % 256 — every variant encodes the SAME pixels, so the catalog oracle's
    closed-form pix_sum is independent of which encoder path ran, and any
    decoder-branch bug corrupts it. Encoder variant rotates seed % 8."""
    seed = int(seed)
    w, h = seed % 29 + 5, seed % 13 + 3
    palette = [
        _argb(
            255,
            (seed * 7 + i * 31) % 256,
            (seed * 11 + i * 57) % 256,
            (seed * 13 + i * 97) % 256,
        )
        for i in range(4)
    ]
    pix = [palette[x % 4] for _ in range(h) for x in range(w)]
    return encode_webp_lossless(pix, w, h, seed % 8)
