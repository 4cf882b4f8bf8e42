"""zstd decoder (RFC 8878) — the Common-Crawl-era ingestion gate, zero
vendored libs.

Common Crawl and most modern data drops ship ``.zst``. This module
implements the REAL decode path from the public spec alone (RFC 8878 and
the format's educational decoder documentation): frame headers, raw/RLE/
compressed blocks, the literals section in all four types (raw, RLE,
Huffman-compressed with direct OR FSE-compressed weights, treeless reuse)
with 1-stream and 4-stream layouts, FSE table descriptions (variable-bit
probability parse, "less than 1" cells, the (size/2 + size/8 + 3) spread),
the sequences section in all four modes (predefined / RLE / FSE-compressed
/ repeat) with the three-state interleaved backward bitstream, repeat-
offset history with the literals-length-0 twist, overlap-safe match copy,
and the XXH64 content checksum — verified, never skipped.

The conformance anchor is the strongest available in this container: the
REAL ``zstd`` CLI compresses arbitrary bytes (all levels, long inputs that
force 4-stream literals and FSE-compressed weights) and this decoder must
reproduce them exactly (pytest property + seeded units). The in-repo
COMPRESSOR below emits genuine zstd format (Huffman literals via direct
weights, LZ matches as predefined-FSE sequences, RLE/raw fallbacks,
content checksums) so the oracle-checked catalog path exercises decode
end-to-end without any external tool at runtime; ``zstd -d`` round-trips
its output in units, anchoring both directions.

Dictionary support (r11): ``parse_zstd_dictionary`` reads both the
structured format (0xEC30A437 magic, Dictionary_ID, entropy tables in
block format — Huffman weights then OF/ML/LL FSE — three initial repeat
offsets, content) and raw-content dictionaries;
``zstd_decompress(dictionary=...)`` seeds the window, entropy context
and repcodes from it, and ``zstd_compress(dictionary=...)`` emits
frames whose matches reach into the dictionary prefix (window-descriptor
header sized over dict + content, Dictionary_ID written for structured
dicts). Anchored against the real ``zstd`` CLI in both directions
(``--train``-produced and raw ``-D`` dictionaries). A frame that
declares a Dictionary_ID when no/other dictionary was supplied raises
ValueError — never a silent wrong answer.

Reference scope note: the reference app (hellohappyworld/
flink-gmall2024-realtime) has no archive path; this is part of the
beyond-reference LLM-data-pipeline surface the build brief asks for.
"""

from __future__ import annotations

import struct
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from .codecguard import malformed_guard

_MAGIC = 0xFD2FB528
_SKIP_BASE = 0x184D2A50

# ---------------------------------------------------------------- XXH64

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M64 = 0xFFFFFFFFFFFFFFFF


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def xxh64(data: bytes, seed: int = 0) -> int:
    """XXH64 of ``data`` — zstd's content checksum is its low 32 bits."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M64
        v2 = (seed + _P2) & _M64
        v3 = seed
        v4 = (seed - _P1) & _M64
        while i + 32 <= n:
            for off, v in ((0, 1), (8, 2), (16, 3), (24, 4)):
                (lane,) = struct.unpack_from("<Q", data, i + off)
                cur = (v1, v2, v3, v4)[v - 1]
                cur = _rotl((cur + lane * _P2) & _M64, 31) * _P1 & _M64
                if v == 1:
                    v1 = cur
                elif v == 2:
                    v2 = cur
                elif v == 3:
                    v3 = cur
                else:
                    v4 = cur
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M64
        for v in (v1, v2, v3, v4):
            h ^= _rotl((v * _P2) & _M64, 31) * _P1 & _M64
            h = (h * _P1 + _P4) & _M64
    else:
        h = (seed + _P5) & _M64
    h = (h + n) & _M64
    while i + 8 <= n:
        (lane,) = struct.unpack_from("<Q", data, i)
        h ^= _rotl((lane * _P2) & _M64, 31) * _P1 & _M64
        h = (_rotl(h, 27) * _P1 + _P4) & _M64
        i += 8
    if i + 4 <= n:
        (lane,) = struct.unpack_from("<I", data, i)
        h ^= (lane * _P1) & _M64
        h = (_rotl(h, 23) * _P2 + _P3) & _M64
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M64
        h = (_rotl(h, 11) * _P1) & _M64
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    h ^= h >> 32
    return h


# ------------------------------------------------------------ bitstreams


class _Back:
    """zstd's backward bitstream: bits are read from just below the
    sentinel bit (the highest set bit of the LAST byte) toward the start.
    Reads past the start zero-pad (legal only for Huffman's final peeks
    and the weight-FSE end condition; callers check ``pos``)."""

    def __init__(self, data: bytes) -> None:
        if not data or data[-1] == 0:
            raise ValueError("corrupt backward bitstream (no sentinel)")
        self.v = int.from_bytes(data, "little")
        self.pos = 8 * (len(data) - 1) + data[-1].bit_length() - 1

    def read(self, n: int) -> int:
        """Read ``n`` bits; zero-pads past the start (pos goes negative)."""
        if n == 0:
            return 0
        self.pos -= n
        if self.pos >= 0:
            return (self.v >> self.pos) & ((1 << n) - 1)
        avail = n + self.pos  # bits that actually exist
        if avail <= 0:
            return 0
        return (self.v & ((1 << avail) - 1)) << (-self.pos)

    def peek(self, n: int) -> int:
        p = self.pos - n
        if p >= 0:
            return (self.v >> p) & ((1 << n) - 1)
        avail = n + p
        if avail <= 0:
            return 0
        return (self.v & ((1 << avail) - 1)) << (-p)


class _Fwd:
    """Forward LSB-first bitstream (FSE table descriptions)."""

    def __init__(self, data: bytes) -> None:
        self.d = data
        self.pos = 0

    def read(self, n: int) -> int:
        end = self.pos + n
        if end > 8 * len(self.d):
            raise ValueError("truncated FSE table description")
        v = 0
        got = 0
        pos = self.pos
        while got < n:
            byte = self.d[pos >> 3]
            off = pos & 7
            take = min(8 - off, n - got)
            v |= ((byte >> off) & ((1 << take) - 1)) << got
            got += take
            pos += take
        self.pos = end
        return v

    def rewind(self, n: int) -> None:
        self.pos -= n

    def byte_align(self) -> int:
        """Align to the next byte boundary; return bytes consumed."""
        self.pos = (self.pos + 7) & ~7
        return self.pos >> 3


# ------------------------------------------------------------------ FSE


def fse_read_distribution(
    fwd: _Fwd, max_symbols: int = 256, max_al: int = 9
) -> tuple[int, list[int]]:
    """FSE table description (RFC 8878 §4.1.1): 4-bit accuracy-log offset
    then variable-bit probabilities with the low/high threshold trick and
    2-bit zero-repeat flags. Returns (accuracy_log, probs) where -1 means
    the 'less than 1' probability. ``max_al`` is the per-table spec cap
    (RFC 8878 §3.1.1.3.2.1.1: LL/ML 9, OF 8, Huffman weights 6)."""
    al = fwd.read(4) + 5
    if al > max_al:
        raise ValueError(f"FSE accuracy log {al} out of range (max {max_al})")
    remaining = (1 << al) + 1
    probs: list[int] = []
    while remaining > 1 and len(probs) < max_symbols:
        # count field width: threshold = largest power of two <= remaining;
        # values below max_small use one bit fewer (FSE_readNCount's rule)
        bits = remaining.bit_length()
        val = fwd.read(bits)
        lower_mask = (1 << (bits - 1)) - 1
        max_small = (1 << bits) - 1 - remaining
        if (val & lower_mask) < max_small:
            fwd.rewind(1)
            val &= lower_mask
        elif val > lower_mask:
            val -= max_small
        proba = val - 1
        probs.append(proba)
        remaining -= -proba if proba < 0 else proba
        if proba == 0:
            while True:
                rep = fwd.read(2)
                probs.extend([0] * rep)
                if rep != 3:
                    break
    if remaining != 1:
        raise ValueError("FSE distribution does not sum to table size")
    fwd.byte_align()
    return al, probs


class _FseTable:
    """FSE decode table: per state (cell) a symbol, bit count and new-state
    baseline; built with the standard spread (RFC 8878 §4.1)."""

    __slots__ = ("al", "symbols", "nbits", "base")

    def __init__(self, al: int, probs: list[int]) -> None:
        size = 1 << al
        symbols = [0] * size
        high = size
        desc = [0] * len(probs)
        for s, p in enumerate(probs):
            if p == -1:
                high -= 1
                symbols[high] = s
                desc[s] = 1
            else:
                desc[s] = p
        step = (size >> 1) + (size >> 3) + 3
        mask = size - 1
        pos = 0
        for s, p in enumerate(probs):
            for _ in range(max(p, 0)):
                symbols[pos] = s
                pos = (pos + step) & mask
                while pos >= high:
                    pos = (pos + step) & mask
        if pos != 0:
            raise ValueError("corrupt FSE table spread")
        nbits = [0] * size
        base = [0] * size
        for i in range(size):
            s = symbols[i]
            nxt = desc[s]
            desc[s] += 1
            nb = al - (nxt.bit_length() - 1)
            nbits[i] = nb
            base[i] = (nxt << nb) - size
        self.al = al
        self.symbols = symbols
        self.nbits = nbits
        self.base = base

    @classmethod
    def rle(cls, symbol: int) -> "_FseTable":
        t = object.__new__(cls)
        t.al = 0
        t.symbols = [symbol]
        t.nbits = [0]
        t.base = [0]
        return t


# -------------------------------------------------------------- Huffman


def _huf_read_weights(data: bytes) -> tuple[list[int], int]:
    """Huffman tree description (RFC 8878 §4.2.1): header byte < 128 means
    FSE-compressed weights in that many following bytes (two alternating
    states on a backward bitstream); >= 128 means headerByte-127 direct
    4-bit weights. Returns (weights incl. the implied last, bytes used)."""
    hb = data[0]
    if hb >= 128:
        n = hb - 127
        nbytes = (n + 1) // 2
        raw = data[1 : 1 + nbytes]
        if len(raw) < nbytes:
            raise ValueError("truncated Huffman weights")
        weights = []
        for i in range(n):
            b = raw[i // 2]
            weights.append(b >> 4 if i % 2 == 0 else b & 0xF)
        used = 1 + nbytes
    else:
        comp = data[1 : 1 + hb]
        if len(comp) < hb:
            raise ValueError("truncated FSE-compressed Huffman weights")
        fwd = _Fwd(comp)
        al, probs = fse_read_distribution(fwd, max_symbols=256, max_al=6)
        table = _FseTable(al, probs)
        consumed = fwd.byte_align()
        back = _Back(comp[consumed:])
        s1 = back.read(al)
        s2 = back.read(al)
        weights = []
        while True:
            if len(weights) > 255:
                raise ValueError("runaway Huffman weight stream")
            weights.append(table.symbols[s1])
            if back.pos < table.nbits[s1]:
                back.read(table.nbits[s1])
                weights.append(table.symbols[s2])
                break
            s1 = table.base[s1] + back.read(table.nbits[s1])
            weights.append(table.symbols[s2])
            if back.pos < table.nbits[s2]:
                back.read(table.nbits[s2])
                weights.append(table.symbols[s1])
                break
            s2 = table.base[s2] + back.read(table.nbits[s2])
        if len(weights) > 255:
            raise ValueError("too many Huffman weights")
        used = 1 + hb
    # implied last weight completes the sum to a power of two
    total = sum((1 << (w - 1)) for w in weights if w > 0)
    if total == 0:
        raise ValueError("empty Huffman weight set")
    table_size = 1 << (total - 1).bit_length() if total > 1 else 2
    if table_size < total + 1:
        table_size <<= 1
    rest = table_size - total
    if rest & (rest - 1):
        raise ValueError("corrupt Huffman weights (non-power-of-2 remainder)")
    weights.append(rest.bit_length())
    return weights, used


class _HufTable:
    """Huffman decode table: a 2^max_bits lookup of (symbol, nbits), cells
    assigned in (weight asc, symbol asc) order per the spec."""

    __slots__ = ("max_bits", "symbols", "nbits")

    def __init__(self, weights: list[int]) -> None:
        total = sum((1 << (w - 1)) for w in weights if w > 0)
        max_bits = (total - 1).bit_length()
        if (1 << max_bits) != total:
            raise ValueError("Huffman weights do not complete the table")
        if max_bits > 11:
            raise ValueError("Huffman max bits > 11")
        size = 1 << max_bits
        symbols = [0] * size
        nbits = [0] * size
        pos = 0
        for w in range(1, max_bits + 1):
            run = 1 << (w - 1)
            nb = max_bits + 1 - w
            for s, sw in enumerate(weights):
                if sw == w:
                    for k in range(run):
                        symbols[pos + k] = s
                        nbits[pos + k] = nb
                    pos += run
        if pos != size:
            raise ValueError("Huffman table underfilled")
        self.max_bits = max_bits
        self.symbols = symbols
        self.nbits = nbits

    def decode_stream(self, data: bytes, count: int) -> bytes:
        back = _Back(data)
        out = bytearray()
        mb = self.max_bits
        for _ in range(count):
            idx = back.peek(mb)
            nb = self.nbits[idx]
            if nb == 0 or back.pos - nb < 0:
                raise ValueError("corrupt Huffman literal stream")
            back.pos -= nb
            out.append(self.symbols[idx])
        if back.pos != 0:
            raise ValueError("Huffman literal stream not fully consumed")
        return bytes(out)


# -------------------------------------------- sequence code value tables

_LL_BITS = [0] * 16 + [1, 1, 1, 1, 2, 2, 3, 3, 4, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16]
_LL_BASE = list(range(16)) + [
    16, 18, 20, 22, 24, 28, 32, 40, 48, 64, 128, 256, 512, 1024,
    2048, 4096, 8192, 16384, 32768, 65536,
]
_ML_BITS = [0] * 32 + [1, 1, 1, 1, 2, 2, 3, 3, 4, 4, 5, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16]
_ML_BASE = list(range(3, 35)) + [
    35, 37, 39, 41, 43, 47, 51, 59, 67, 83, 99, 131, 259, 515, 1027,
    2051, 4099, 8195, 16387, 32771, 65539,
]

_LL_DEFAULT = [
    4, 3, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 1, 1, 1,
    2, 2, 2, 2, 2, 2, 2, 2, 2, 3, 2, 1, 1, 1, 1, 1,
    -1, -1, -1, -1,
]
_ML_DEFAULT = [
    1, 4, 3, 2, 2, 2, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1,
    1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
    1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, -1, -1,
    -1, -1, -1, -1, -1,
]
_OF_DEFAULT = [
    1, 1, 1, 1, 1, 1, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1,
    1, 1, 1, 1, 1, 1, 1, 1, -1, -1, -1, -1, -1,
]

_LL_PREDEF = None
_ML_PREDEF = None
_OF_PREDEF = None


def _predef_tables() -> tuple[_FseTable, _FseTable, _FseTable]:
    global _LL_PREDEF, _ML_PREDEF, _OF_PREDEF
    if _LL_PREDEF is None:
        _LL_PREDEF = _FseTable(6, _LL_DEFAULT)
        _ML_PREDEF = _FseTable(6, _ML_DEFAULT)
        _OF_PREDEF = _FseTable(5, _OF_DEFAULT)
    return _LL_PREDEF, _ML_PREDEF, _OF_PREDEF


# --------------------------------------------------------------- decode


def _read_literals(block: bytes, ctx: dict) -> tuple[bytes, int]:
    """Literals section: returns (literals, bytes consumed). ``ctx`` keeps
    the frame's last Huffman table for Treeless (type 3) blocks."""
    b0 = block[0]
    ltype = b0 & 3
    sf = (b0 >> 2) & 3
    if ltype in (0, 1):  # Raw / RLE
        if sf & 1 == 0:
            rs = b0 >> 3
            h = 1
        elif sf == 1:
            rs = (b0 >> 4) | (block[1] << 4)
            h = 2
        else:
            rs = (b0 >> 4) | (block[1] << 4) | (block[2] << 12)
            h = 3
        if ltype == 0:
            lits = block[h : h + rs]
            if len(lits) < rs:
                raise ValueError("truncated raw literals")
            return bytes(lits), h + rs
        return bytes([block[h]]) * rs, h + 1
    # Compressed / Treeless
    if sf == 0:
        v = b0 | (block[1] << 8) | (block[2] << 16)
        rs = (v >> 4) & 0x3FF
        cs = (v >> 14) & 0x3FF
        h, four = 3, False
    elif sf == 1:
        v = b0 | (block[1] << 8) | (block[2] << 16)
        rs = (v >> 4) & 0x3FF
        cs = (v >> 14) & 0x3FF
        h, four = 3, True
    elif sf == 2:
        v = b0 | (block[1] << 8) | (block[2] << 16) | (block[3] << 24)
        rs = (v >> 4) & 0x3FFF
        cs = (v >> 18) & 0x3FFF
        h, four = 4, True
    else:
        v = (
            b0 | (block[1] << 8) | (block[2] << 16)
            | (block[3] << 24) | (block[4] << 32)
        )
        rs = (v >> 4) & 0x3FFFF
        cs = (v >> 22) & 0x3FFFF
        h, four = 5, True
    body = block[h : h + cs]
    if len(body) < cs:
        raise ValueError("truncated compressed literals")
    if ltype == 2:
        weights, used = _huf_read_weights(body)
        ctx["huf"] = _HufTable(weights)
        body = body[used:]
    elif "huf" not in ctx:
        raise ValueError("treeless literals with no previous Huffman table")
    huf: _HufTable = ctx["huf"]
    if not four:
        return huf.decode_stream(body, rs), h + cs
    if len(body) < 6:
        raise ValueError("truncated 4-stream jump table")
    s1, s2, s3 = struct.unpack_from("<HHH", body, 0)
    streams = []
    off = 6
    for sz in (s1, s2, s3):
        streams.append(body[off : off + sz])
        off += sz
    streams.append(body[off:])
    per = (rs + 3) // 4
    counts = [per, per, per, rs - 3 * per]
    if counts[3] < 0:
        raise ValueError("corrupt 4-stream regenerated size")
    out = b"".join(huf.decode_stream(s, c) for s, c in zip(streams, counts))
    return out, h + cs


def _decode_block(block: bytes, out: bytearray, ctx: dict) -> None:
    """Decode one compressed block into ``out`` (the frame's whole output
    so matches can reach previous blocks). ``ctx`` carries repeat offsets,
    the last Huffman table and last FSE tables across blocks."""
    lits, consumed = _read_literals(block, ctx)
    rest = block[consumed:]
    if not rest:
        raise ValueError("missing sequences section")
    b0 = rest[0]
    if b0 == 0:
        out += lits
        if len(rest) != 1:
            raise ValueError("trailing bytes after empty sequences section")
        return
    if b0 < 128:
        nseq, p = b0, 1
    elif b0 < 255:
        nseq, p = ((b0 - 128) << 8) | rest[1], 2
    else:
        nseq, p = (rest[1] | (rest[2] << 8)) + 0x7F00, 3
    modes = rest[p]
    p += 1
    if modes & 3:
        raise ValueError("reserved sequence-mode bits set")
    tables = []
    fwd_bytes = rest[p:]
    fpos = 0
    for name, mode_shift, predef_idx, max_sym, max_al in (
        ("ll", 6, 0, 36, 9),
        ("of", 4, 2, 32, 8),
        ("ml", 2, 1, 53, 9),
    ):
        mode = (modes >> mode_shift) & 3
        if mode == 0:
            tables.append(_predef_tables()[predef_idx])
        elif mode == 1:
            tables.append(_FseTable.rle(fwd_bytes[fpos]))
            fpos += 1
        elif mode == 2:
            fwd = _Fwd(fwd_bytes[fpos:])
            al, probs = fse_read_distribution(fwd, max_symbols=max_sym, max_al=max_al)
            tables.append(_FseTable(al, probs))
            fpos += fwd.byte_align()
        else:
            prev = ctx.get(f"fse_{name}")
            if prev is None:
                raise ValueError(f"repeat mode with no previous {name} table")
            tables.append(prev)
    ll_t, of_t, ml_t = tables
    ctx["fse_ll"], ctx["fse_of"], ctx["fse_ml"] = ll_t, of_t, ml_t
    back = _Back(fwd_bytes[fpos:])
    ll_s = back.read(ll_t.al)
    of_s = back.read(of_t.al)
    ml_s = back.read(ml_t.al)
    lit_pos = 0
    offs = ctx["offsets"]
    for i in range(nseq):
        of_code = of_t.symbols[of_s]
        ml_code = ml_t.symbols[ml_s]
        ll_code = ll_t.symbols[ll_s]
        if of_code > 31 or ml_code > 52 or ll_code > 35:
            raise ValueError("sequence code out of range")
        offset_value = (1 << of_code) + back.read(of_code)
        ml = _ML_BASE[ml_code] + back.read(_ML_BITS[ml_code])
        ll = _LL_BASE[ll_code] + back.read(_LL_BITS[ll_code])
        if back.pos < 0:
            raise ValueError("sequence bitstream overrun")
        if offset_value > 3:
            offset = offset_value - 3
            offs[2] = offs[1]
            offs[1] = offs[0]
            offs[0] = offset
        else:
            idx = offset_value + (1 if ll == 0 else 0)
            if idx == 1:
                offset = offs[0]
            elif idx == 2:
                offset = offs[1]
                offs[1] = offs[0]
                offs[0] = offset
            elif idx == 3:
                offset = offs[2]
                offs[2] = offs[1]
                offs[1] = offs[0]
                offs[0] = offset
            else:
                offset = offs[0] - 1
                if offset == 0:
                    raise ValueError("repeat offset underflow")
                offs[2] = offs[1]
                offs[1] = offs[0]
                offs[0] = offset
        out += lits[lit_pos : lit_pos + ll]
        lit_pos += ll
        if lit_pos > len(lits):
            raise ValueError("literal buffer overrun")
        if offset > len(out):
            raise ValueError("match offset beyond window")
        if offset >= ml:
            start = len(out) - offset
            out += out[start : start + ml]
        else:
            for _ in range(ml):  # overlapping copy
                out.append(out[-offset])
        if i + 1 < nseq:
            ll_s = ll_t.base[ll_s] + back.read(ll_t.nbits[ll_s])
            ml_s = ml_t.base[ml_s] + back.read(ml_t.nbits[ml_s])
            of_s = of_t.base[of_s] + back.read(of_t.nbits[of_s])
            if back.pos < 0:
                raise ValueError("sequence bitstream overrun")
    if back.pos != 0:
        raise ValueError("sequence bitstream not fully consumed")
    out += lits[lit_pos:]


ZDICT_MAGIC = 0xEC30A437


def parse_zstd_dictionary(data: bytes) -> dict:
    """Parse a zstd dictionary (RFC 8878 §5). Structured dictionaries
    (0xEC30A437 magic) carry a Dictionary_ID, entropy tables in exactly
    the compressed-block wire format (Huffman literal weights, then
    OF/ML/LL FSE table descriptions), three initial repeat offsets, and
    the content; anything without the magic is a raw-content dictionary
    (history prefix only, default entropy, standard repcodes)."""
    data = bytes(data)
    if len(data) < 8 or struct.unpack_from("<I", data, 0)[0] != ZDICT_MAGIC:
        return {
            "dict_id": 0,
            "content": data,
            "entropy": None,
            "offsets": [1, 4, 8],
        }
    (dict_id,) = struct.unpack_from("<I", data, 4)
    body = data[8:]
    weights, used = _huf_read_weights(body)
    huf = _HufTable(weights)
    pos = used
    fse: dict[str, _FseTable] = {}
    for name, max_sym, max_al in (("of", 32, 8), ("ml", 53, 9), ("ll", 36, 9)):
        fwd = _Fwd(body[pos:])
        al, probs = fse_read_distribution(fwd, max_symbols=max_sym, max_al=max_al)
        fse[name] = _FseTable(al, probs)
        pos += fwd.byte_align()
    if pos + 12 > len(body):
        raise ValueError("truncated dictionary repeat offsets")
    reps = list(struct.unpack_from("<III", body, pos))
    pos += 12
    content = body[pos:]
    for r in reps:
        if r == 0 or r > len(content):
            raise ValueError("dictionary repeat offset out of range")
    return {
        "dict_id": dict_id,
        "content": content,
        "entropy": {"huf": huf, "fse": fse},
        "offsets": reps,
    }


@malformed_guard
def zstd_decompress(payload: bytes, dictionary: bytes | None = None) -> bytes:
    """Decode a (multi-)frame zstd payload; skippable frames are skipped,
    content checksums are VERIFIED. ``dictionary`` (structured or raw
    content) seeds each frame's window, entropy context and repeat
    offsets. Raises ValueError on corruption, on a frame that declares a
    Dictionary_ID with no/mismatched dictionary supplied, and on any
    repcode/match reaching past the available history."""
    zdict = parse_zstd_dictionary(dictionary) if dictionary is not None else None
    out_all = []
    i = 0
    n = len(payload)
    while i < n:
        if i + 4 > n:
            raise ValueError("truncated frame magic")
        (magic,) = struct.unpack_from("<I", payload, i)
        if _SKIP_BASE <= magic <= _SKIP_BASE + 15:
            (sz,) = struct.unpack_from("<I", payload, i + 4)
            i += 8 + sz
            continue
        if magic != _MAGIC:
            raise ValueError(f"bad zstd magic at offset {i}")
        fhd = payload[i + 4]
        if fhd & 0x08:
            raise ValueError("reserved frame-header-descriptor bit set")
        fcs_flag = fhd >> 6
        single = bool(fhd & 0x20)
        has_check = bool(fhd & 0x04)
        did_flag = fhd & 3
        j = i + 5
        if not single:
            j += 1  # window descriptor (bound checks are by-offset below)
        did_size = (0, 1, 2, 4)[did_flag]
        frame_did = 0
        if did_size:
            frame_did = int.from_bytes(payload[j : j + did_size], "little")
            j += did_size
        if frame_did:
            if zdict is None:
                raise ValueError(
                    f"frame declares dictionary id {frame_did} but no "
                    "dictionary was supplied"
                )
            if zdict["dict_id"] not in (0, frame_did) or zdict["dict_id"] == 0:
                raise ValueError(
                    f"dictionary id mismatch: frame wants {frame_did}, "
                    f"supplied dictionary has {zdict['dict_id']}"
                )
        fcs_size = (1 if single else 0, 2, 4, 8)[fcs_flag]
        fcs = None
        if fcs_size:
            fcs = int.from_bytes(payload[j : j + fcs_size], "little")
            if fcs_size == 2:
                fcs += 256
            j += fcs_size
        if zdict is not None:
            out = bytearray(zdict["content"])
            ctx = {"offsets": list(zdict["offsets"])}
            if zdict["entropy"] is not None:
                ctx["huf"] = zdict["entropy"]["huf"]
                for name, t in zdict["entropy"]["fse"].items():
                    ctx[f"fse_{name}"] = t
        else:
            out = bytearray()
            ctx = {"offsets": [1, 4, 8]}
        prefix = len(out)
        while True:
            bh = int.from_bytes(payload[j : j + 3], "little")
            if j + 3 > n:
                raise ValueError("truncated block header")
            last, btype, bsize = bh & 1, (bh >> 1) & 3, bh >> 3
            j += 3
            if btype == 0:
                out += payload[j : j + bsize]
                j += bsize
            elif btype == 1:
                out += payload[j : j + 1] * bsize
                j += 1
            elif btype == 2:
                _decode_block(payload[j : j + bsize], out, ctx)
                j += bsize
            else:
                raise ValueError("reserved block type")
            if j > n:
                raise ValueError("block runs past end of payload")
            if last:
                break
        produced = bytes(out[prefix:])
        if fcs is not None and len(produced) != fcs:
            raise ValueError(
                f"frame content size mismatch: declared {fcs}, got {len(produced)}"
            )
        if has_check:
            if j + 4 > n:
                raise ValueError("truncated content checksum")
            (want,) = struct.unpack_from("<I", payload, j)
            j += 4
            got = xxh64(produced) & 0xFFFFFFFF
            if got != want:
                raise ValueError("content checksum mismatch")
        out_all.append(produced)
        i = j
    return b"".join(out_all)


# --------------------------------------------------------------- encode
#
# Fixture-grade but REAL-format compressor: greedy LZ matches emitted as
# predefined-FSE sequences, literals Huffman-coded with direct weights
# (flat frequency-agnostic canonical code), RLE/raw fallbacks, content
# checksum. `zstd -d` round-trips its output (unit-tested), which anchors
# the encoder to the real tool and lets the oracle-checked catalog path
# exercise OUR decoder end-to-end with no runtime external dependency.


class _FwdWriter:
    """Forward LSB-first bit writer (FSE table descriptions)."""

    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, v: int, n: int) -> None:
        self.acc |= (v & ((1 << n) - 1)) << self.nbits
        self.nbits += n
        while self.nbits >= 8:
            self.buf.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def bytes(self) -> bytes:
        out = bytearray(self.buf)
        if self.nbits:
            out.append(self.acc & 0xFF)
        return bytes(out)


def fse_write_distribution(al: int, probs: list[int]) -> bytes:
    """Inverse of ``fse_read_distribution`` (FSE_writeNCount): 4-bit
    accuracy-log offset, threshold-coded probabilities, 2-bit zero-repeat
    flags, byte-aligned."""
    w = _FwdWriter()
    w.write(al - 5, 4)
    remaining = (1 << al) + 1
    i = 0
    while remaining > 1 and i < len(probs):
        p = probs[i]
        i += 1
        val = p + 1
        bits = remaining.bit_length()
        lower_mask = (1 << (bits - 1)) - 1
        max_small = (1 << bits) - 1 - remaining
        if val < max_small:
            w.write(val, bits - 1)
        elif val <= lower_mask:
            w.write(val, bits)
        else:
            w.write(val + max_small, bits)
        remaining -= -p if p < 0 else p
        if p == 0:
            # run of additional zero symbols as 2-bit repeat flags
            run = 0
            while i < len(probs) and probs[i] == 0 and remaining > 1:
                run += 1
                i += 1
            while run >= 3:
                w.write(3, 2)
                run -= 3
            w.write(run, 2)
    return w.bytes()


def _normalize_counts(codes: list[int], al: int, n_symbols: int) -> list[int]:
    """Histogram -> normalized probabilities summing to exactly 2^al,
    every present symbol >= 1 (fixture-grade largest-remainder)."""
    size = 1 << al
    counts = [0] * n_symbols
    for c in codes:
        counts[c] += 1
    if sum(1 for c in counts if c) > size:
        raise ValueError("more distinct symbols than FSE table cells")
    total = len(codes)
    probs = [max(1, (c * size) // total) if c else 0 for c in counts]
    diff = size - sum(probs)
    order = sorted(
        (k for k in range(n_symbols) if counts[k]),
        key=lambda k: -counts[k],
    )
    j = 0
    while diff != 0:
        k = order[j % len(order)]
        if diff > 0:
            probs[k] += 1
            diff -= 1
        elif probs[k] > 1:
            probs[k] -= 1
            diff += 1
        j += 1
    while probs and probs[-1] == 0:
        probs.pop()
    return probs


def _pack_backward(parts: list[tuple[int, int]]) -> bytes:
    """Pack (value, width) pairs, first-read first, into a backward
    bitstream with the sentinel bit."""
    acc = 0
    bits = 0
    for v, w in parts:
        acc = (acc << w) | (v & ((1 << w) - 1))
        bits += w
    acc |= 1 << bits  # sentinel
    return acc.to_bytes((bits + 8) // 8, "little")


def _fse_encode_states(table: _FseTable, codes: list[int]) -> tuple[int, list[tuple[int, int]]]:
    """Choose decoder states for ``codes`` (walked backward) such that each
    state emits its code and transitions to the next one. Returns
    (initial_state, update_bits in forward order)."""
    size = 1 << table.al
    by_symbol: dict[int, list[int]] = {}
    for cell in range(size):
        by_symbol.setdefault(table.symbols[cell], []).append(cell)
    state = by_symbol[codes[-1]][0]
    updates: list[tuple[int, int]] = []
    for code in reversed(codes[:-1]):
        nxt = state
        for cell in by_symbol[code]:
            width = 1 << table.nbits[cell]
            if table.base[cell] <= nxt < table.base[cell] + width:
                updates.append((nxt - table.base[cell], table.nbits[cell]))
                state = cell
                break
        else:
            raise AssertionError("FSE encode: no reachable cell")
    updates.reverse()
    return state, updates


def _huf_flat_code(
    lits: bytes, extra_alphabet: set | None = None
) -> tuple[bytes, dict[int, tuple[int, int]], int]:
    """Flat canonical Huffman code over the distinct bytes of ``lits``
    (plus ``extra_alphabet``, so a frame's FIRST table can cover bytes
    later blocks will need for treeless reuse): tree description (direct
    4-bit weights, last implied) + per-symbol (code, nbits) map +
    max_bits. Requires >= 2 distinct bytes and max symbol < 128 (ASCII
    fixture text)."""
    present = sorted(set(lits) | (extra_alphabet or set()))
    d = len(present)
    max_bits = max(1, (d - 1).bit_length())
    excess = (1 << max_bits) - d  # symbols promoted to the shorter length
    weights = {}
    for k, s in enumerate(present):
        weights[s] = 2 if k < excess else 1
    # decode-table order: weight asc, symbol asc — mirrors _HufTable
    pos = 0
    codemap: dict[int, tuple[int, int]] = {}
    for w in range(1, max_bits + 1):
        run = 1 << (w - 1)
        nb = max_bits + 1 - w
        for s in present:
            if weights[s] == w:
                codemap[s] = (pos >> (w - 1), nb)
                pos += run
    last = present[-1]
    n_weights = last  # weights for symbols 0..last-1; `last` is implied
    if n_weights > 127:
        raise ValueError("fixture literals must stay ASCII")
    nibbles = [weights.get(s, 0) for s in range(n_weights)]
    desc = bytearray([127 + n_weights])
    for k in range(0, n_weights, 2):
        hi = nibbles[k] << 4
        lo = nibbles[k + 1] if k + 1 < n_weights else 0
        desc.append(hi | lo)
    return bytes(desc), codemap, max_bits


def _ll_code(ll: int) -> int:
    if ll < 16:
        return ll
    for c in range(35, 15, -1):
        if ll >= _LL_BASE[c]:
            return c
    raise AssertionError


def _ml_code(ml: int) -> int:
    if ml < 35:
        return ml - 3
    for c in range(52, 31, -1):
        if ml >= _ML_BASE[c]:
            return c
    raise AssertionError


def _compress_block(
    chunk: bytes, history: bytes, reuse: dict | None = None
) -> bytes | None:
    """One compressed zstd block for ``chunk`` (with ``history`` = frame
    bytes already emitted, reachable by match offsets). Returns None when
    the compressed form would not be smaller (caller emits a raw block).

    ``reuse`` carries encoder continuity across a frame's blocks so the
    TABLE-REUSE decode paths ride the oracle-checked fixture too: once a
    block has shipped a Huffman description, later blocks whose literals
    stay inside that alphabet emit TRELESS (type 3) literals, and once a
    block has carried sequences, later ones select Repeat_Mode (3) for
    all three FSE tables."""
    base = len(history)
    data = history + chunk
    # greedy matcher over 4-byte anchors
    table: dict[bytes, int] = {}
    for k in range(max(0, base - 4096), base):
        if k + 4 <= base:
            table[data[k : k + 4]] = k
    seqs = []  # (ll, offset, ml) with literal runs between
    lits = bytearray()
    i = base
    run_start = i
    n = len(data)
    while i + 4 <= n:
        key = data[i : i + 4]
        j = table.get(key)
        if j is not None and i - j <= 131072:
            ml = 4
            while i + ml < n and data[j + ml] == data[i + ml] and ml < 65000:
                ml += 1
            ll = i - run_start
            lits += data[run_start:i]
            seqs.append((ll, i - j, ml))
            for k in range(i, min(i + ml, n - 3)):
                table[data[k : k + 4]] = k
            i += ml
            run_start = i
            if len(seqs) >= 120:
                break
        else:
            table[key] = i
            i += 1
    lits += data[run_start:]
    lits = bytes(lits)
    # literals section
    lit_sec = None
    new_codemap = None
    prev = reuse.get("codemap") if reuse else None
    if prev is not None and lits and set(lits) <= prev.keys():
        # TRELESS: reuse the frame's previous Huffman table (type 3);
        # chosen for coverage whenever legal — the whole-body < chunk
        # gate below still guarantees net compression
        stream = _pack_backward([prev[b] for b in lits])
        if len(stream) <= 1023 and len(lits) <= 1023:
            v = 3 | (0 << 2) | (len(lits) << 4) | (len(stream) << 14)
            lit_sec = v.to_bytes(3, "little") + stream
    if lit_sec is None and len(set(lits)) >= 2 and len(lits) >= 16 and max(lits) < 128:
        # first table covers the whole chunk alphabet so later blocks of
        # the same text can reuse it treeless
        extra = set(chunk) if (reuse is not None and max(chunk) < 128) else None
        desc, codemap, _mb = _huf_flat_code(lits, extra)
        stream = _pack_backward([codemap[b] for b in lits])
        comp = desc + stream
        # the first table is an investment: later blocks reuse it TRELESS,
        # so accept paying the description once even at small literal runs
        slack = 0 if (reuse is None or "codemap" in reuse) else len(desc)
        if len(lits) >= 16:
            # 4-STREAM layout (Size_Format 01): three (rs+3)//4-literal
            # streams + remainder, 6-byte jump table — puts the decoder's
            # 4-stream path on the oracle-checked fixture too
            per = (len(lits) + 3) // 4
            streams = [
                _pack_backward([codemap[b] for b in lits[k * per : (k + 1) * per]])
                for k in range(3)
            ] + [_pack_backward([codemap[b] for b in lits[3 * per :]])]
            body4 = struct.pack(
                "<HHH", len(streams[0]), len(streams[1]), len(streams[2])
            ) + b"".join(streams)
            comp4 = desc + body4
            if len(comp4) < len(lits) + slack and len(comp4) <= 1023 and len(lits) <= 1023:
                v = 2 | (1 << 2) | (len(lits) << 4) | (len(comp4) << 14)
                lit_sec = v.to_bytes(3, "little") + comp4
                new_codemap = codemap
        if lit_sec is None and len(comp) < len(lits) + slack and len(comp) <= 1023 and len(lits) <= 1023:
            v = 2 | (0 << 2) | (len(lits) << 4) | (len(comp) << 14)
            lit_sec = v.to_bytes(3, "little") + comp
            new_codemap = codemap
    if lit_sec is None:
        if len(lits) and len(set(lits)) == 1:
            if len(lits) < 32:
                lit_sec = bytes([1 | (len(lits) << 3), lits[0]])
            else:
                lit_sec = bytes([1 | (1 << 2) | ((len(lits) & 0xF) << 4),
                                 (len(lits) >> 4) & 0xFF]) + bytes([lits[0]])
        elif len(lits) < 32:
            lit_sec = bytes([0 | (len(lits) << 3)]) + lits
        else:
            lit_sec = bytes([0 | (1 << 2) | ((len(lits) & 0xF) << 4),
                             (len(lits) >> 4) & 0xFF]) + lits
    # sequences section
    if not seqs:
        body = lit_sec + b"\x00"
        if len(body) < len(chunk):
            if reuse is not None and new_codemap is not None:
                reuse["codemap"] = new_codemap
            return body
        return None
    ll_codes = [_ll_code(s[0]) for s in seqs]
    of_values = [s[1] + 3 for s in seqs]
    of_codes = [v.bit_length() - 1 for v in of_values]
    ml_codes = [_ml_code(s[2]) for s in seqs]

    def _covers(t: _FseTable, cs: list[int]) -> bool:
        have = set(t.symbols)
        return all(c in have for c in cs)

    stored = reuse.get("tables") if reuse else None
    table_desc = b""
    if stored is not None and all(
        _covers(t, cs)
        for t, cs in zip(stored, (ll_codes, of_codes, ml_codes))
    ):
        # Repeat_Mode (3): the decoder replays its stored tables
        ll_t, of_t, ml_t = stored
        modes = 0xFC
    elif len(seqs) >= 16:
        # FSE_Compressed_Mode (2): ship custom normalized tables — the
        # in-format path real encoders take for bigger blocks
        ll_p = _normalize_counts(ll_codes, 6, 36)
        of_p = _normalize_counts(of_codes, 5, 29)
        ml_p = _normalize_counts(ml_codes, 6, 53)
        ll_t, of_t, ml_t = _FseTable(6, ll_p), _FseTable(5, of_p), _FseTable(6, ml_p)
        modes = (2 << 6) | (2 << 4) | (2 << 2)
        table_desc = (
            fse_write_distribution(6, ll_p)
            + fse_write_distribution(5, of_p)
            + fse_write_distribution(6, ml_p)
        )
    else:
        ll_t, ml_t, of_t = _predef_tables()
        modes = 0x00
    ll_init, ll_upd = _fse_encode_states(ll_t, ll_codes)
    of_init, of_upd = _fse_encode_states(of_t, of_codes)
    ml_init, ml_upd = _fse_encode_states(ml_t, ml_codes)
    parts = [(ll_init, ll_t.al), (of_init, of_t.al), (ml_init, ml_t.al)]
    nseq = len(seqs)
    for k in range(nseq):
        ll, _off, ml = seqs[k]
        parts.append((of_values[k] - (1 << of_codes[k]), of_codes[k]))
        parts.append((ml - _ML_BASE[ml_codes[k]], _ML_BITS[ml_codes[k]]))
        parts.append((ll - _LL_BASE[ll_codes[k]], _LL_BITS[ll_codes[k]]))
        if k + 1 < nseq:
            parts.append(ll_upd[k])
            parts.append(ml_upd[k])
            parts.append(of_upd[k])
    stream = _pack_backward(parts)
    body = lit_sec + bytes([nseq, modes]) + table_desc + stream
    if len(body) < len(chunk):
        if reuse is not None:
            if new_codemap is not None:
                reuse["codemap"] = new_codemap
            reuse["tables"] = (ll_t, of_t, ml_t)
        return body
    return None


def _window_descriptor(need: int) -> int:
    """Smallest window-descriptor byte whose window covers ``need`` bytes
    (window = 2^(10+exp) + mantissa * 2^(10+exp)/8)."""
    for exp in range(32):
        base = 1 << (10 + exp)
        for mantissa in range(8):
            if base + mantissa * (base >> 3) >= need:
                return (exp << 3) | mantissa
    raise ValueError("window requirement too large")


def zstd_compress(data: bytes, dictionary: bytes | None = None) -> bytes:
    """Real-format zstd frame for ``data``: single-segment header with
    exact content size, >=1 blocks (compressed with Huffman literals +
    predefined-FSE sequences when that wins, RLE/raw otherwise) and an
    XXH64 content checksum. With ``dictionary`` the frame is emitted in
    dictionary form instead: window-descriptor header sized over
    dict + content (matches reach into the dictionary prefix),
    Dictionary_ID written when the dictionary is structured. ``zstd -d``
    (with ``-D`` for dictionary frames) round-trips the output."""
    n = len(data)
    zdict = parse_zstd_dictionary(dictionary) if dictionary is not None else None
    prefix = zdict["content"] if zdict is not None else b""
    if zdict is not None:
        fhd = (2 << 6) | 0x04  # 4-byte FCS, windowed (not single-segment)
        did = b""
        if zdict["dict_id"]:
            fhd |= 3  # 4-byte Dictionary_ID
            did = struct.pack("<I", zdict["dict_id"])
        out = bytearray(struct.pack("<IB", _MAGIC, fhd))
        out.append(_window_descriptor(len(prefix) + n))
        out += did
        out += struct.pack("<I", n)
    else:
        if n < 256:
            fcs_flag, fcs = 0, bytes([n])
        elif n <= 0xFFFF + 256:
            fcs_flag, fcs = 1, struct.pack("<H", n - 256)
        else:
            fcs_flag, fcs = 2, struct.pack("<I", n)
        fhd = (fcs_flag << 6) | 0x20 | 0x04  # single segment + checksum
        out = bytearray(struct.pack("<IB", _MAGIC, fhd))
        out += fcs
    chunks = [data[i : i + 1000] for i in range(0, n, 1000)] or [b""]
    done = 0
    reuse: dict = {}
    for ci, chunk in enumerate(chunks):
        last = 1 if ci == len(chunks) - 1 else 0
        comp = _compress_block(chunk, prefix + data[:done], reuse) if chunk else None
        if comp is not None:
            out += ((len(comp) << 3) | (2 << 1) | last).to_bytes(3, "little")
            out += comp
        elif chunk and len(set(chunk)) == 1:
            out += ((len(chunk) << 3) | (1 << 1) | last).to_bytes(3, "little")
            out += chunk[:1]
        else:
            out += ((len(chunk) << 3) | (0 << 1) | last).to_bytes(3, "little")
            out += chunk
        done += len(chunk)
    out += struct.pack("<I", xxh64(data) & 0xFFFFFFFF)
    return bytes(out)


# ----------------------------------------------------------- fixture op


def synth_zstd_dump(seed: int) -> bytes:
    """Deterministic .zst fixture via the in-repo COMPRESSOR (whose output
    the real ``zstd`` CLI round-trips in units): a dump-like text of
    n = seed%36+8 lines, line i = '<rec id={seed} line={i}> t000 ... ' with
    m = (seed+7i)%12+3 tokens — repetitive enough that the compressed
    blocks carry real Huffman literals AND real FSE-coded match
    sequences."""
    seed = int(seed)
    n = seed % 36 + 8
    lines = []
    for i in range(n):
        m = (seed + 7 * i) % 12 + 3
        toks = " ".join(f"t{k:03d}" for k in range(m))
        lines.append(f"<rec id={seed} line={i}> {toks}")
    return zstd_compress("\n".join(lines).encode())


ZSTD_DUMP_SCHEMA = "media_id long, n_lines int, n_tokens long, n_chars long"


def zstd_dump_stats(media: DataFrame, fast_path: bool = True) -> DataFrame:
    """Per-dump stats after a zstd decode — the Common-Crawl-shard intake
    gate. ``fast_path`` (default) decodes via pyarrow's bundled libzstd
    with the in-repo RFC 8878 spec decoder (FSE + Huffman + sequence
    execution + XXH64 verify) as deterministic sampled cross-verification
    + rejected-frame fallback (``fastpath.py`` — the 100 TB engine);
    ``fast_path=False`` runs the spec decoder on every record (the A/B
    lever). Per-row Arrow work, linear by construction."""
    from .fastpath import fast_decoder

    decode = fast_decoder("zstd", spec_only=not fast_path)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
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
        batches, schema=ZSTD_DUMP_SCHEMA
    )


# The shared deterministic raw-content dictionary for the dict-frame
# catalog entry: the boilerplate vocabulary every fixture line draws
# from, so matches genuinely reach into the dictionary prefix.
ZSTD_FIXTURE_DICT = (
    b"<zrec id= line=> " + b" ".join(b"w%03d" % k for k in range(16)) + b"\n"
) * 4


def synth_zstd_dict_dump(seed: int) -> bytes:
    """Deterministic dictionary-frame .zst fixture via the in-repo
    COMPRESSOR (CLI `zstd -d -D` round-trips it in units): same dump-like
    text shape as ``synth_zstd_dump`` but compressed against the shared
    raw-content dictionary ``ZSTD_FIXTURE_DICT`` — the windowed frame
    header, no Dictionary_ID (raw dicts carry none), and matches whose
    offsets reach into the dictionary prefix."""
    seed = int(seed)
    n = seed % 32 + 6
    lines = []
    for i in range(n):
        m = (seed + 7 * i) % 11 + 2
        toks = " ".join(f"w{k:03d}" for k in range(m))
        lines.append(f"<zrec id={seed} line={i}> {toks}")
    return zstd_compress("\n".join(lines).encode(), dictionary=ZSTD_FIXTURE_DICT)


def zstd_dict_dump_stats(media: DataFrame) -> DataFrame:
    """Per-dump stats after a DICTIONARY-frame zstd decode. No C fast
    path here on purpose: pyarrow's codec API exposes no dictionary
    parameter, so the spec decoder runs every record (the honest
    engine note lives in the catalog docstring); per-row Arrow work,
    linear by construction."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                text = zstd_decompress(
                    bytes(p), dictionary=ZSTD_FIXTURE_DICT
                ).decode("utf-8")
                rows.append(
                    (mid, text.count("\n") + 1, len(text.split()), len(text))
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "n_lines", "n_tokens", "n_chars"]
            )

    return media.select("media_id", "payload").mapInPandas(
        batches, schema=ZSTD_DUMP_SCHEMA
    )
