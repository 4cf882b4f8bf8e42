"""DEFLATE / zlib / gzip codec — decoder + format-true compressor.

Written from the public RFCs: 1951 (DEFLATE), 1950 (zlib wrapper), 1952
(gzip wrapper). DEFLATE is the one compression format the ingestion
stack previously outsourced entirely to stdlib ``zlib`` — it sits under
ZIP members (``archive.py``), gzip'd WARC crawls, Avro deflate blocks,
PNG IDAT, and ORC zlib-compressed footers. This module closes the loop
the same way ``zstdcodec.py``/``lzmadec.py`` did for their formats:

- ``inflate`` implements the full RFC 1951 surface — stored blocks
  (LEN/NLEN integrity), fixed-Huffman blocks, dynamic-Huffman blocks
  (HLIT/HDIST/HCLEN header, the 19-symbol code-length code with
  16/17/18 repeats spanning the literal->distance boundary), canonical
  trees walked bit-by-bit, the length/distance extra-bit tables built
  programmatically from the RFC recurrences, overlapping LZ77 copies,
  and the deflate quirk of PARTIAL distance trees (zero or one distance
  code is legal; one code decodes from a single 0 bit).
- ``zlib_decompress`` / ``gzip_decompress`` add the RFC 1950/1952
  wrappers: CMF/FLG consistency, FDICT preset dictionaries (r12:
  DICTID-verified window seeding; an FDICT stream without its
  dictionary raises), Adler-32 verification; gzip FEXTRA/FNAME/FCOMMENT/FHCRC header
  fields, CRC-32 + ISIZE verification, and multi-member concatenation.
- ``deflate_compress`` is the format-true writer (the conformance twin,
  zstd pattern): three strategies — stored, fixed-Huffman, and
  dynamic-Huffman with a REAL hash-chain LZ77 matcher and real canonical
  code-length-code serialization — all validated against stdlib
  ``zlib.decompress`` (and the decoder against stdlib ``zlib.compress``
  at every level), so conformance is anchored in BOTH directions.

Checksums (CRC-32, Adler-32) use ``zlib.crc32``/``zlib.adler32`` —
checksum primitives, not codec work, same stance as ``fastpath.py``.

Scale stance: decoding is per-row Arrow map work behind
``fastpath.fast_decoder`` families (stdlib zlib IS the C fast path;
this module is the live spec oracle and rejected-frame fallback), so
the 100 TB story is identical to the zstd/xz/bz2 families.
"""

from __future__ import annotations

import struct
import zlib as _zlib

from .codecguard import malformed_guard  # checksums + the C fast path's engine; spec work is below

# ---------------------------------------------------------------------------
# RFC 1951 tables (built from the spec recurrences, not transcribed)
# ---------------------------------------------------------------------------

# length codes 257..285 -> (base, extra_bits)
_LEN_BASE: list[int] = []
_LEN_EXTRA: list[int] = []
_base = 3
for _code in range(257, 285):
    _extra = 0 if _code < 265 else (_code - 261) >> 2
    _LEN_BASE.append(_base)
    _LEN_EXTRA.append(_extra)
    _base += 1 << _extra
_LEN_BASE.append(258)  # code 285: length 258, 0 extra
_LEN_EXTRA.append(0)

# distance codes 0..29 -> (base, extra_bits)
_DIST_BASE: list[int] = []
_DIST_EXTRA: list[int] = []
_base = 1
for _code in range(30):
    _extra = 0 if _code < 4 else (_code >> 1) - 1
    _DIST_BASE.append(_base)
    _DIST_EXTRA.append(_extra)
    _base += 1 << _extra

_CL_ORDER = (16, 17, 18, 0, 8, 7, 9, 6, 10, 5, 11, 4, 12, 3, 13, 2, 14, 1, 15)

_FIXED_LIT_LENGTHS = [8] * 144 + [9] * 112 + [7] * 24 + [8] * 8
_FIXED_DIST_LENGTHS = [5] * 32

_MAX_BITS = 15


class _BitReader:
    """LSB-first bit reader; byte-aligned reads for stored blocks and
    wrapper trailers."""

    __slots__ = ("data", "pos")

    def __init__(self, data: bytes, bytepos: int = 0) -> None:
        self.data = data
        self.pos = bytepos * 8

    def bits(self, n: int) -> int:
        if self.pos + n > len(self.data) * 8:
            raise ValueError("deflate: bitstream exhausted")
        v = 0
        p = self.pos
        d = self.data
        for i in range(n):
            v |= ((d[(p + i) >> 3] >> ((p + i) & 7)) & 1) << i
        self.pos = p + n
        return v

    def bit(self) -> int:
        if self.pos >= len(self.data) * 8:
            raise ValueError("deflate: bitstream exhausted")
        b = (self.data[self.pos >> 3] >> (self.pos & 7)) & 1
        self.pos += 1
        return b

    def align(self) -> int:
        """Skip to the next byte boundary; returns the byte offset."""
        self.pos = (self.pos + 7) & ~7
        return self.pos >> 3

    def read_bytes(self, n: int) -> bytes:
        start = self.align()
        if start + n > len(self.data):
            raise ValueError("deflate: truncated byte run")
        self.pos = (start + n) * 8
        return self.data[start : start + n]


class _Tree:
    """Canonical Huffman decode table: (length, code) -> symbol, walked
    MSB-of-code-first one bit at a time. ``partial_single`` marks the
    legal RFC 1951 degenerate distance tree (one 1-bit code; the unused
    pattern is invalid input, not padding)."""

    __slots__ = ("table", "single", "partial_single")

    def __init__(self, lengths: list[int], allow_partial: bool = False) -> None:
        used = [(s, l) for s, l in enumerate(lengths) if l]
        self.single: int | None = None
        self.partial_single = False
        if not used:
            raise ValueError("deflate: empty prefix tree")
        kraft = sum(1 << (_MAX_BITS - l) for _, l in used)
        if kraft > 1 << _MAX_BITS:
            raise ValueError("deflate: oversubscribed prefix tree")
        if kraft < 1 << _MAX_BITS:
            if not (allow_partial and len(used) == 1 and used[0][1] == 1):
                raise ValueError("deflate: incomplete prefix tree")
            self.partial_single = True
        bl_count: dict[int, int] = {}
        for _, l in used:
            bl_count[l] = bl_count.get(l, 0) + 1
        code = 0
        next_code: dict[int, int] = {}
        for l in range(1, _MAX_BITS + 1):
            code = (code + bl_count.get(l - 1, 0)) << 1
            next_code[l] = code
        self.table: dict[tuple[int, int], int] = {}
        for s, l in used:
            self.table[(l, next_code[l])] = s
            next_code[l] += 1

    def read(self, br: _BitReader) -> int:
        code = 0
        for l in range(1, _MAX_BITS + 1):
            code = (code << 1) | br.bit()
            sym = self.table.get((l, code))
            if sym is not None:
                return sym
            if self.partial_single and l == 1:
                raise ValueError("deflate: invalid code in degenerate distance tree")
        raise ValueError("deflate: prefix walk exceeded 15 bits")


_FIXED_LIT_TREE: _Tree | None = None
_FIXED_DIST_TREE: _Tree | None = None


def _fixed_trees() -> tuple[_Tree, _Tree]:
    global _FIXED_LIT_TREE, _FIXED_DIST_TREE
    if _FIXED_LIT_TREE is None:
        _FIXED_LIT_TREE = _Tree(_FIXED_LIT_LENGTHS)
        # 32 5-bit distance codes: codes 30/31 never appear in valid data
        # but the TREE is complete by construction (spec says so)
        _FIXED_DIST_TREE = _Tree(_FIXED_DIST_LENGTHS)
    return _FIXED_LIT_TREE, _FIXED_DIST_TREE  # type: ignore[return-value]


def _read_dynamic_trees(br: _BitReader) -> tuple[_Tree, _Tree | None]:
    hlit = br.bits(5) + 257
    hdist = br.bits(5) + 1
    hclen = br.bits(4) + 4
    if hlit > 286 or hdist > 30:
        raise ValueError("deflate: dynamic header counts out of range")
    cl_lengths = [0] * 19
    for i in range(hclen):
        cl_lengths[_CL_ORDER[i]] = br.bits(3)
    cl_tree = _Tree(cl_lengths)
    lengths: list[int] = []
    total = hlit + hdist
    prev = -1
    while len(lengths) < total:
        sym = cl_tree.read(br)
        if sym < 16:
            lengths.append(sym)
            prev = sym
        elif sym == 16:
            if prev < 0:
                raise ValueError("deflate: repeat with no previous length")
            lengths.extend([prev] * (3 + br.bits(2)))
        elif sym == 17:
            lengths.extend([0] * (3 + br.bits(3)))
            prev = 0
        else:
            lengths.extend([0] * (11 + br.bits(7)))
            prev = 0
    if len(lengths) != total:
        raise ValueError("deflate: code-length repeat overflows header counts")
    lit_lengths, dist_lengths = lengths[:hlit], lengths[hlit:]
    if lit_lengths[256] == 0:
        raise ValueError("deflate: no end-of-block code")
    lit_tree = _Tree(lit_lengths)
    if not any(dist_lengths):
        return lit_tree, None  # literal-only block
    return lit_tree, _Tree(dist_lengths, allow_partial=True)


def _inflate_into(br: _BitReader, out: bytearray) -> None:
    """Inflate one complete DEFLATE stream from the reader into ``out``
    (reader left just past the final block, NOT byte-aligned). A caller
    may pre-fill ``out`` with a preset-dictionary window (RFC 1950
    FDICT): back-references reach into it naturally, and the caller
    strips the prefix afterwards."""
    while True:
        bfinal = br.bit()
        btype = br.bits(2)
        if btype == 0:  # stored
            ln = struct.unpack("<H", br.read_bytes(2))[0]
            nlen = struct.unpack("<H", br.read_bytes(2))[0]
            if ln ^ nlen != 0xFFFF:
                raise ValueError("deflate: stored-block LEN/NLEN mismatch")
            out += br.read_bytes(ln)
        elif btype in (1, 2):
            if btype == 1:
                lit_tree, dist_tree = _fixed_trees()
            else:
                lit_tree, dist_tree = _read_dynamic_trees(br)
            while True:
                sym = lit_tree.read(br)
                if sym < 256:
                    out.append(sym)
                elif sym == 256:
                    break
                else:
                    if sym > 285:
                        raise ValueError(f"deflate: invalid length code {sym}")
                    li = sym - 257
                    length = _LEN_BASE[li] + br.bits(_LEN_EXTRA[li])
                    if dist_tree is None:
                        raise ValueError(
                            "deflate: length code in a block with no distance codes"
                        )
                    dsym = dist_tree.read(br)
                    if dsym > 29:
                        raise ValueError(f"deflate: invalid distance code {dsym}")
                    dist = _DIST_BASE[dsym] + br.bits(_DIST_EXTRA[dsym])
                    if dist > len(out):
                        raise ValueError("deflate: distance before output start")
                    start = len(out) - dist
                    for i in range(length):  # may overlap: byte-at-a-time
                        out.append(out[start + i])
        else:
            raise ValueError("deflate: reserved block type 3")
        if bfinal:
            return


@malformed_guard
def inflate(data: bytes) -> bytes:
    """Decode one raw DEFLATE stream (RFC 1951); trailing bits after the
    final block are padding and ignored."""
    out = bytearray()
    _inflate_into(_BitReader(bytes(data)), out)
    return bytes(out)


@malformed_guard
def zlib_decompress(data: bytes, zdict: bytes | None = None) -> bytes:
    """RFC 1950: CMF/FLG header checks, DEFLATE body, Adler-32 verify.
    FDICT streams (r12) decode when the caller supplies the preset
    dictionary: the DICTID field must equal Adler-32(zdict) and the last
    32 KiB of the dictionary seed the LZ77 window (back-references may
    reach into it; its bytes are never emitted). An FDICT stream without
    a dictionary — or a dictionary whose checksum disagrees — raises;
    there is nothing safe to guess."""
    data = bytes(data)
    if len(data) < 6:
        raise ValueError("zlib: payload shorter than header + trailer")
    cmf, flg = data[0], data[1]
    if cmf & 0x0F != 8:
        raise ValueError(f"zlib: compression method {cmf & 0x0F} is not deflate")
    if (cmf >> 4) > 7:
        raise ValueError("zlib: window size exceeds 32K")
    if (cmf * 256 + flg) % 31 != 0:
        raise ValueError("zlib: FCHECK header checksum failed")
    body_at = 2
    seed = b""
    if flg & 0x20:
        if zdict is None:
            raise ValueError(
                "zlib: FDICT stream needs its preset dictionary "
                "(pass zdict=)"
            )
        if len(data) < 10:
            raise ValueError("zlib: FDICT stream truncated before DICTID")
        (dictid,) = struct.unpack(">I", data[2:6])
        if _zlib.adler32(bytes(zdict)) & 0xFFFFFFFF != dictid:
            raise ValueError(
                "zlib: DICTID does not match the supplied dictionary"
            )
        seed = bytes(zdict)[-32768:]
        body_at = 6
    elif zdict is not None:
        raise ValueError("zlib: zdict supplied but the stream has no FDICT")
    br = _BitReader(data, body_at)
    out = bytearray(seed)
    _inflate_into(br, out)
    trailer_at = br.align()
    if trailer_at + 4 > len(data):
        raise ValueError("zlib: truncated Adler-32 trailer")
    (want,) = struct.unpack(">I", data[trailer_at : trailer_at + 4])
    result = bytes(out[len(seed):])
    if _zlib.adler32(result) & 0xFFFFFFFF != want:
        raise ValueError("zlib: Adler-32 mismatch")
    return result


@malformed_guard
def gzip_decompress(data: bytes) -> bytes:
    """RFC 1952: full header field parse (FEXTRA/FNAME/FCOMMENT/FHCRC),
    DEFLATE body, CRC-32 + ISIZE verify, multi-member concatenation."""
    data = bytes(data)
    out_all = bytearray()
    off = 0
    members = 0
    while off < len(data):
        if members and not any(data[off:]):
            break  # trailing zero padding (tape-block convention; stdlib
            # gzip accepts it too — fast path and spec path must agree)
        if len(data) - off < 18:
            raise ValueError("gzip: member shorter than header + trailer")
        if data[off : off + 2] != b"\x1f\x8b":
            raise ValueError("gzip: bad magic")
        if data[off + 2] != 8:
            raise ValueError(f"gzip: compression method {data[off + 2]} is not deflate")
        flg = data[off + 3]
        if flg & 0xE0:
            raise ValueError("gzip: reserved FLG bits set")
        p = off + 10
        if flg & 0x04:  # FEXTRA
            if p + 2 > len(data):
                raise ValueError("gzip: truncated FEXTRA length")
            xlen = struct.unpack("<H", data[p : p + 2])[0]
            p += 2 + xlen
        if flg & 0x08:  # FNAME
            end = data.index(b"\x00", p)
            p = end + 1
        if flg & 0x10:  # FCOMMENT
            end = data.index(b"\x00", p)
            p = end + 1
        if flg & 0x02:  # FHCRC
            if p + 2 > len(data):
                raise ValueError("gzip: truncated FHCRC")
            (want16,) = struct.unpack("<H", data[p : p + 2])
            if _zlib.crc32(data[off:p]) & 0xFFFF != want16:
                raise ValueError("gzip: header CRC16 mismatch")
            p += 2
        if p > len(data):
            raise ValueError("gzip: truncated header fields")
        br = _BitReader(data, p)
        member = bytearray()
        _inflate_into(br, member)
        trailer_at = br.align()
        if trailer_at + 8 > len(data):
            raise ValueError("gzip: truncated CRC32/ISIZE trailer")
        crc, isize = struct.unpack("<II", data[trailer_at : trailer_at + 8])
        if _zlib.crc32(bytes(member)) & 0xFFFFFFFF != crc:
            raise ValueError("gzip: CRC-32 mismatch")
        if len(member) & 0xFFFFFFFF != isize:
            raise ValueError("gzip: ISIZE mismatch")
        out_all += member
        off = trailer_at + 8
        members += 1
    if members == 0:
        raise ValueError("gzip: empty payload")
    return bytes(out_all)


# ---------------------------------------------------------------------------
# Compressor (format-true writer — the conformance twin of the decoder)
# ---------------------------------------------------------------------------


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

    def write_code(self, code: int, nbits: int) -> None:
        """Huffman codes go MSB-first into the LSB-first stream."""
        for i in range(nbits - 1, -1, -1):
            self.write((code >> i) & 1, 1)

    def align(self) -> None:
        if self.n:
            self.buf.append(self.acc & 0xFF)
            self.acc = 0
            self.n = 0

    def getvalue(self) -> bytes:
        out = bytes(self.buf)
        if self.n:
            out += bytes([self.acc & 0xFF])
        return out


def _canonical(lengths: list[int]) -> dict[int, tuple[int, int]]:
    bl_count: dict[int, int] = {}
    for l in lengths:
        if l:
            bl_count[l] = bl_count.get(l, 0) + 1
    code = 0
    next_code: dict[int, int] = {}
    for l in range(1, _MAX_BITS + 1):
        code = (code + bl_count.get(l - 1, 0)) << 1
        next_code[l] = code
    out: dict[int, tuple[int, int]] = {}
    for s, l in enumerate(lengths):
        if l:
            out[s] = (next_code[l], l)
            next_code[l] += 1
    return out


def _huffman_lengths(freqs: dict[int, int], maxlen: int) -> dict[int, int]:
    """Heap Huffman with a balanced complete-code fallback past maxlen
    (valid, not optimal — fixture histograms never trigger it)."""
    from heapq import heapify, heappop, heappush

    syms = sorted(freqs)
    if not syms:
        raise ValueError("deflate: empty histogram")
    if len(syms) == 1:
        return {syms[0]: 1}
    heap = [(freqs[s], i, [s]) for i, s in enumerate(syms)]
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
        if k > maxlen:
            raise ValueError("deflate: alphabet too large for code length cap")
        n_short = (1 << k) - len(syms)
        return {s: (k - 1 if i < n_short else k) for i, s in enumerate(syms)}
    return depths


def _lz77_tokens(data: bytes) -> list[tuple]:
    """Greedy hash-chain matcher: ("lit", byte) / ("match", length, dist)
    with RFC 1951 bounds (length 3..258, dist 1..32768)."""
    n = len(data)
    tokens: list[tuple] = []
    head: dict[bytes, list[int]] = {}
    i = 0
    while i < n:
        best_len = 0
        best_dist = 0
        if i + 3 <= n:
            key = data[i : i + 3]
            for j in reversed(head.get(key, ())):
                if i - j > 32768:
                    break
                l = 3
                max_l = min(258, n - i)
                while l < max_l and data[j + l] == data[i + l]:
                    l += 1
                if l > best_len:
                    best_len, best_dist = l, i - j
                    if l >= 64:  # good enough; keep the matcher honest but fast
                        break
        if best_len >= 3:
            tokens.append(("match", best_len, best_dist))
            end = i + best_len
            while i < end:
                if i + 3 <= n:
                    chain = head.setdefault(data[i : i + 3], [])
                    chain.append(i)
                    if len(chain) > 16:
                        del chain[0]
                i += 1
        else:
            tokens.append(("lit", data[i]))
            if i + 3 <= n:
                chain = head.setdefault(data[i : i + 3], [])
                chain.append(i)
                if len(chain) > 16:
                    del chain[0]
            i += 1
    return tokens


def _length_code(length: int) -> tuple[int, int, int]:
    """length -> (code, extra_value, extra_bits)."""
    if length == 258:
        return 285, 0, 0
    for code in range(28):
        base, extra = _LEN_BASE[code], _LEN_EXTRA[code]
        if base <= length < base + (1 << extra):
            return 257 + code, length - base, extra
    raise ValueError(f"deflate: length {length} out of range")


def _dist_code(dist: int) -> tuple[int, int, int]:
    for code in range(30):
        base, extra = _DIST_BASE[code], _DIST_EXTRA[code]
        if base <= dist < base + (1 << extra):
            return code, dist - base, extra
    raise ValueError(f"deflate: distance {dist} out of range")


def _write_dynamic_header(
    bw: _BitWriter, lit_lengths: list[int], dist_lengths: list[int]
) -> None:
    hlit = max(257, max((s + 1 for s, l in enumerate(lit_lengths) if l), default=257))
    hdist = max(1, max((s + 1 for s, l in enumerate(dist_lengths) if l), default=1))
    seq = lit_lengths[:hlit] + dist_lengths[:hdist]
    # RLE into code-length symbols (16/17/18), spanning the boundary as
    # the spec allows
    cl_tokens: list[tuple[int, int, int]] = []
    i = 0
    prev = -1
    while i < len(seq):
        l = seq[i]
        run = 1
        while i + run < len(seq) and seq[i + run] == l:
            run += 1
        if l == 0:
            left = run
            while left >= 11:
                take = min(left, 138)
                cl_tokens.append((18, take - 11, 7))
                left -= take
            if left >= 3:
                cl_tokens.append((17, left - 3, 3))
                left = 0
            cl_tokens.extend((0, 0, 0) for _ in range(left))
            prev = 0
        else:
            start = 0
            if l != prev:
                cl_tokens.append((l, 0, 0))
                start = 1
                prev = l
            left = run - start
            while left >= 3:
                take = min(left, 6)
                cl_tokens.append((16, take - 3, 2))
                left -= take
            cl_tokens.extend((l, 0, 0) for _ in range(left))
        i += run
    freqs: dict[int, int] = {}
    for s, _, _ in cl_tokens:
        freqs[s] = freqs.get(s, 0) + 1
    if len(freqs) == 1:
        only = next(iter(freqs))
        cl_lengths_map = {only: 1, (0 if only else 1): 1}
    else:
        cl_lengths_map = _huffman_lengths(freqs, 7)
    cl_lengths = [0] * 19
    for s, l in cl_lengths_map.items():
        cl_lengths[s] = l
    hclen = max(4, max(i + 1 for i, s in enumerate(_CL_ORDER) if cl_lengths[s]))
    bw.write(hlit - 257, 5)
    bw.write(hdist - 1, 5)
    bw.write(hclen - 4, 4)
    for i in range(hclen):
        bw.write(cl_lengths[_CL_ORDER[i]], 3)
    cl_codes = _canonical(cl_lengths)
    for s, extra, nbits in cl_tokens:
        code, clen = cl_codes[s]
        bw.write_code(code, clen)
        if nbits:
            bw.write(extra, nbits)


def deflate_compress(data: bytes, strategy: str = "dynamic") -> bytes:
    """Spec-valid raw DEFLATE: ``stored`` (65535-byte blocks), ``fixed``
    (RFC fixed trees + LZ77), or ``dynamic`` (histogram Huffman + LZ77 +
    code-length-coded header). Output validated against stdlib
    ``zlib.decompress`` in the property suite."""
    data = bytes(data)
    bw = _BitWriter()
    if strategy == "stored":
        if not data:
            bw.write(1, 1)
            bw.write(0, 2)
            bw.align()
            bw.buf += struct.pack("<HH", 0, 0xFFFF)
            return bw.getvalue()
        off = 0
        while off < len(data):
            chunk = data[off : off + 65535]
            off += len(chunk)
            bw.write(1 if off >= len(data) else 0, 1)
            bw.write(0, 2)
            bw.align()
            bw.buf += struct.pack("<HH", len(chunk), len(chunk) ^ 0xFFFF)
            bw.buf += chunk
        return bw.getvalue()
    tokens = _lz77_tokens(data)
    if strategy == "fixed":
        bw.write(1, 1)
        bw.write(1, 2)
        lit_codes = _canonical(_FIXED_LIT_LENGTHS)
        dist_codes = _canonical(_FIXED_DIST_LENGTHS)
    elif strategy == "dynamic":
        lit_freqs: dict[int, int] = {256: 1}
        dist_freqs: dict[int, int] = {}
        for t in tokens:
            if t[0] == "lit":
                lit_freqs[t[1]] = lit_freqs.get(t[1], 0) + 1
            else:
                lc, _, _ = _length_code(t[1])
                dc, _, _ = _dist_code(t[2])
                lit_freqs[lc] = lit_freqs.get(lc, 0) + 1
                dist_freqs[dc] = dist_freqs.get(dc, 0) + 1
        lit_map = _huffman_lengths(lit_freqs, _MAX_BITS)
        if len(lit_map) == 1:  # only EOB: pad to a complete 2-symbol tree
            lit_map = {256: 1, 0: 1}
        lit_lengths = [0] * 286
        for s, l in lit_map.items():
            lit_lengths[s] = l
        dist_lengths = [0] * 30
        if dist_freqs:
            dmap = _huffman_lengths(dist_freqs, _MAX_BITS)
            if len(dmap) == 1:
                # single-code distance tree: legal partial tree (1 bit)
                dist_lengths[next(iter(dmap))] = 1
            else:
                for s, l in dmap.items():
                    dist_lengths[s] = l
        bw.write(1, 1)
        bw.write(2, 2)
        _write_dynamic_header(bw, lit_lengths, dist_lengths)
        lit_codes = _canonical(lit_lengths)
        dist_codes = _canonical(dist_lengths)
    else:
        raise ValueError(f"unknown deflate strategy {strategy!r}")
    for t in tokens:
        if t[0] == "lit":
            code, clen = lit_codes[t[1]]
            bw.write_code(code, clen)
        else:
            lc, lextra, lbits = _length_code(t[1])
            code, clen = lit_codes[lc]
            bw.write_code(code, clen)
            if lbits:
                bw.write(lextra, lbits)
            dc, dextra, dbits = _dist_code(t[2])
            code, clen = dist_codes[dc]
            bw.write_code(code, clen)
            if dbits:
                bw.write(dextra, dbits)
    code, clen = lit_codes[256]
    bw.write_code(code, clen)
    return bw.getvalue()


def zlib_compress(data: bytes, strategy: str = "dynamic") -> bytes:
    body = deflate_compress(data, strategy)
    hdr = b"\x78"  # CM=8, CINFO=7 (32K window)
    flg = 31 - (0x78 * 256) % 31
    return (
        hdr
        + bytes([flg])
        + body
        + struct.pack(">I", _zlib.adler32(bytes(data)) & 0xFFFFFFFF)
    )


def gzip_compress(data: bytes, strategy: str = "dynamic") -> bytes:
    body = deflate_compress(data, strategy)
    hdr = b"\x1f\x8b\x08\x00" + b"\x00\x00\x00\x00" + b"\x00\xff"
    return hdr + body + struct.pack(
        "<II", _zlib.crc32(bytes(data)) & 0xFFFFFFFF, len(data) & 0xFFFFFFFF
    )


# ---------------------------------------------------------------------------
# Dump-ingestion fixture + stats plan (the gzip'd-crawl intake gate)
# ---------------------------------------------------------------------------


def synth_gzip_dump(seed: int) -> bytes:
    """Deterministic .gz fixture: a dump-like text of n = seed%36+8 lines,
    line i = '<rec id={seed} line={i}> t000 ... t{m-1}' with
    m = (seed + 5*i) % 13 + 2 words. The WRITER rotates by seed%4 so both
    conformance directions stay live in the catalog: 0 = stdlib gzip
    (level seed%9+1), 1 = stdlib gzip split into TWO concatenated
    members, 2 = the in-repo format-true compressor (fixed-Huffman
    strategy), 3 = in-repo (dynamic-Huffman strategy)."""
    import gzip as _gzip

    seed = int(seed)
    n = seed % 36 + 8
    lines = []
    for i in range(n):
        m = (seed + 5 * i) % 13 + 2
        words = " ".join(f"t{k:03d}" for k in range(m))
        lines.append(f"<rec id={seed} line={i}> {words}")
    text = "\n".join(lines).encode()
    v = seed % 4
    if v == 0:
        return _gzip.compress(text, compresslevel=seed % 9 + 1)
    if v == 1:
        cut = len(text) // 2
        return _gzip.compress(text[:cut], compresslevel=1) + _gzip.compress(
            text[cut:], compresslevel=9
        )
    return gzip_compress(text, "fixed" if v == 2 else "dynamic")


GZIP_DUMP_SCHEMA = "media_id long, n_lines int, n_tokens long, n_chars long"


def gzip_dump_stats(media, fast_path: bool = True):
    """Per-dump stats after a gzip decode — the gzip'd-crawl intake gate.
    ``fast_path`` (default) decodes via stdlib zlib/gzip with the in-repo
    RFC 1951/1952 decoder as deterministic sampled cross-verification +
    rejected-frame fallback (``fastpath.py``); ``fast_path=False`` runs
    the spec decoder on every record (the A/B lever). Per-row Arrow
    work, linear by construction."""
    import pandas as pd
    from pyspark.sql import functions as F  # noqa: F401 (plan-side import parity)

    from .fastpath import fast_decoder

    decode = fast_decoder("gzip", spec_only=not fast_path)

    def batches(it):
        for pdf in it:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                text = decode(bytes(p)).decode("utf-8")
                rows.append(
                    (mid, text.count("\n") + 1, len(text.split()), len(text))
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "n_lines", "n_tokens", "n_chars"]
            )

    return media.select("media_id", "payload").mapInPandas(
        batches, schema=GZIP_DUMP_SCHEMA
    )
