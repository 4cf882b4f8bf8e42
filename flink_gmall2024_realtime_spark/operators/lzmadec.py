"""LZMA / LZMA2 / .xz decoder — the dump format xz audits could only walk.

Wikipedia history dumps, kernel archives and many dataset drops ship .xz.
The r9 audit (``multimodal.parse_xz_meta``) walks the container backward
but could not read payloads; this module adds the REAL decode path.
LZMA is fully ADAPTIVE — every probability starts at 1/2 and adapts; there
are no fixed entropy tables — so, like bzip2 and zstd, a faithful decoder
is derivable from the public format description alone, and the stdlib
``lzma`` COMPRESSOR is the strongest possible in-process conformance
anchor (hypothesis properties compress arbitrary bytes at several presets
and filters; this decoder must reproduce them exactly).

Implemented: the 11-bit-probability range decoder (bit, direct-bits,
bit-tree and reverse bit-tree forms), the 12-state LZMA match model
(literal contexts with matched-literal decode after matches, match/rep
branches, length coders, distance slots + aligned/direct distance bits,
rep-distance history), classic ``.lzma`` (FORMAT_ALONE: 13-byte header,
optional end marker), the LZMA2 chunk layer (dict/state/props resets,
uncompressed chunks), and the .xz container (stream header/flags, block
headers with the LZMA2 filter, block padding, CRC32/CRC64 content checks
VERIFIED, index + footer already audited by ``parse_xz_meta``).

Scope seam (raise, never a silent wrong answer): non-LZMA2 xz filter
chains (BCJ/delta) raise NotImplementedError.

Reference scope note: the reference app (hellohappyworld/
flink-gmall2024-realtime) has no archive path; this is part of the
beyond-reference LLM-data-pipeline surface the build brief asks for.
"""

from __future__ import annotations

import struct
import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from .codecguard import malformed_guard

_KNUM_STATES = 12


class _RangeDecoder:
    """LZMA range decoder: 32-bit range/code, 11-bit adaptive
    probabilities (move-ratio 1/32), byte-at-a-time normalization."""

    __slots__ = ("d", "i", "range", "code", "pad")

    # Real decoders fail with an input-exhaustion error once they need
    # bytes past the stream end; a tiny slack covers the encoder's final
    # flush, anything beyond it is corruption (an unknown-size .lzma
    # whose end marker never arrives would otherwise decode zero padding
    # as literals forever — unbounded output growth on an 18-byte input).
    _MAX_PAD = 16

    def __init__(self, data: bytes, pos: int) -> None:
        self.d = data
        if data[pos] != 0:
            raise ValueError("LZMA range coder must start with a zero byte")
        self.code = int.from_bytes(data[pos + 1 : pos + 5], "big")
        self.i = pos + 5
        self.range = 0xFFFFFFFF
        self.pad = 0

    def _norm(self) -> None:
        if self.range < (1 << 24):
            self.range = (self.range << 8) & 0xFFFFFFFF
            if self.i < len(self.d):
                b = self.d[self.i]
            else:
                self.pad += 1
                if self.pad > self._MAX_PAD:
                    raise ValueError("LZMA input exhausted before stream end")
                b = 0
            self.code = ((self.code << 8) | b) & 0xFFFFFFFF
            self.i += 1

    def bit(self, probs: list, idx: int) -> int:
        p = probs[idx]
        bound = (self.range >> 11) * p
        if self.code < bound:
            self.range = bound
            probs[idx] = p + ((2048 - p) >> 5)
            b = 0
        else:
            self.range -= bound
            self.code -= bound
            probs[idx] = p - (p >> 5)
            b = 1
        self._norm()
        return b

    def direct(self, n: int) -> int:
        out = 0
        for _ in range(n):
            self.range >>= 1
            if self.code >= self.range:
                self.code -= self.range
                out = (out << 1) | 1
            else:
                out <<= 1
            self._norm()
        return out

    def tree(self, probs: list, base: int, nbits: int) -> int:
        m = 1
        for _ in range(nbits):
            m = (m << 1) | self.bit(probs, base + m)
        return m - (1 << nbits)

    def rtree(self, probs: list, base: int, nbits: int) -> int:
        m = 1
        out = 0
        for k in range(nbits):
            b = self.bit(probs, base + m)
            m = (m << 1) | b
            out |= b << k
        return out


class _LenCoder:
    __slots__ = ("choice", "low", "mid", "high")

    def __init__(self) -> None:
        self.choice = [1024, 1024]
        self.low = [1024] * (16 << 3)
        self.mid = [1024] * (16 << 3)
        self.high = [1024] * 256

    def decode(self, rc: _RangeDecoder, pos_state: int) -> int:
        if rc.bit(self.choice, 0) == 0:
            return 2 + rc.tree(self.low, pos_state << 3, 3)
        if rc.bit(self.choice, 1) == 0:
            return 10 + rc.tree(self.mid, pos_state << 3, 3)
        return 18 + rc.tree(self.high, 0, 8)


class _LzmaState:
    """The adaptive model state (survives across LZMA2 chunks unless a
    state reset is signalled)."""

    def __init__(self, lc: int, lp: int, pb: int) -> None:
        self.lc, self.lp, self.pb = lc, lp, pb
        self.state = 0
        self.reps = [0, 0, 0, 0]
        self.is_match = [1024] * (_KNUM_STATES << 4)
        self.is_rep = [1024] * _KNUM_STATES
        self.is_rep_g0 = [1024] * _KNUM_STATES
        self.is_rep_g1 = [1024] * _KNUM_STATES
        self.is_rep_g2 = [1024] * _KNUM_STATES
        self.is_rep0_long = [1024] * (_KNUM_STATES << 4)
        self.pos_slot = [1024] * (4 << 6)
        self.spec_pos = [1024] * 115
        self.align = [1024] * 16
        self.len_coder = _LenCoder()
        self.rep_len_coder = _LenCoder()
        self.literal = [1024] * (0x300 << (lc + lp))


def _decode_lzma_stream(
    data: bytes,
    pos: int,
    out: bytearray,
    st: _LzmaState,
    limit: int | None,
    base: int = 0,
) -> int:
    """Decode one range-coded LZMA stream starting at ``pos`` into
    ``out`` until ``limit`` output bytes exist (or the end marker when
    ``limit`` is None). Returns the input position after the stream.

    ``base`` is the dictionary-reset offset into ``out``: match
    distances may not reach below it and the position feeding pos_state
    / literal context restarts there (an LZMA2 mid-block dict reset
    decodes exactly as if the dictionary were empty)."""
    rc = _RangeDecoder(data, pos)
    pb_mask = (1 << st.pb) - 1
    lp_mask = (1 << st.lp) - 1
    while limit is None or len(out) < limit:
        pos_state = (len(out) - base) & pb_mask
        if rc.bit(st.is_match, (st.state << 4) | pos_state) == 0:
            # literal
            prev = out[-1] if len(out) > base else 0
            ctx = (((len(out) - base) & lp_mask) << st.lc) + (prev >> (8 - st.lc))
            lit_base = 0x300 * ctx
            sym = 1
            if st.state >= 7:
                match_byte = out[-st.reps[0] - 1]
                while sym < 0x100:
                    match_bit = (match_byte >> 7) & 1
                    match_byte = (match_byte << 1) & 0xFF
                    b = rc.bit(st.literal, lit_base + ((1 + match_bit) << 8) + sym)
                    sym = (sym << 1) | b
                    if match_bit != b:
                        while sym < 0x100:
                            sym = (sym << 1) | rc.bit(st.literal, lit_base + sym)
                        break
            else:
                while sym < 0x100:
                    sym = (sym << 1) | rc.bit(st.literal, lit_base + sym)
            out.append(sym & 0xFF)
            st.state = 0 if st.state < 4 else (st.state - 3 if st.state < 10 else st.state - 6)
            continue
        if rc.bit(st.is_rep, st.state) == 0:
            # new match: length then distance
            length = st.len_coder.decode(rc, pos_state)
            len_state = min(length - 2, 3)
            slot = rc.tree(st.pos_slot, len_state << 6, 6)
            if slot < 4:
                dist = slot
            else:
                nd = (slot >> 1) - 1
                dist = (2 | (slot & 1)) << nd
                if slot < 14:
                    dist += rc.rtree(st.spec_pos, dist - slot - 1, nd)
                else:
                    dist += rc.direct(nd - 4) << 4
                    dist += rc.rtree(st.align, 0, 4)
            if dist == 0xFFFFFFFF:
                if limit is not None:
                    raise ValueError("unexpected LZMA end marker")
                return rc.i
            st.reps = [dist, st.reps[0], st.reps[1], st.reps[2]]
            st.state = 7 if st.state < 7 else 10
        else:
            if rc.bit(st.is_rep_g0, st.state) == 0:
                if rc.bit(st.is_rep0_long, (st.state << 4) | pos_state) == 0:
                    # short rep: one byte at rep0
                    if st.reps[0] + 1 > len(out) - base:
                        raise ValueError("LZMA match distance beyond dictionary")
                    st.state = 9 if st.state < 7 else 11
                    out.append(out[-st.reps[0] - 1])
                    continue
            else:
                if rc.bit(st.is_rep_g1, st.state) == 0:
                    dist = st.reps[1]
                    st.reps = [dist, st.reps[0], st.reps[2], st.reps[3]]
                elif rc.bit(st.is_rep_g2, st.state) == 0:
                    dist = st.reps[2]
                    st.reps = [dist, st.reps[0], st.reps[1], st.reps[3]]
                else:
                    dist = st.reps[3]
                    st.reps = [dist, st.reps[0], st.reps[1], st.reps[2]]
            length = st.rep_len_coder.decode(rc, pos_state)
            st.state = 8 if st.state < 7 else 11
        d = st.reps[0] + 1
        if d > len(out) - base:
            raise ValueError("LZMA match distance beyond dictionary")
        if d >= length:
            start = len(out) - d
            out += out[start : start + length]
        else:
            for _ in range(length):
                out.append(out[-d])
    return rc.i


@malformed_guard
def lzma_alone_decompress(payload: bytes) -> bytes:
    """Classic .lzma (FORMAT_ALONE): props byte, LE32 dict size, LE64
    uncompressed size (all-ones = unknown -> end-marker-terminated)."""
    if len(payload) < 13:
        raise ValueError("truncated .lzma header")
    d = payload[0]
    if d >= 9 * 5 * 5:
        raise ValueError("bad LZMA properties byte")
    lc = d % 9
    lp = (d // 9) % 5
    pb = d // 45
    (usize,) = struct.unpack_from("<Q", payload, 5)
    st = _LzmaState(lc, lp, pb)
    out = bytearray()
    _decode_lzma_stream(
        payload, 13, out, st, None if usize == 0xFFFFFFFFFFFFFFFF else usize
    )
    if usize != 0xFFFFFFFFFFFFFFFF and len(out) != usize:
        raise ValueError("LZMA output does not match declared size")
    return bytes(out)


@malformed_guard
def lzma2_decompress(data: bytes, pos: int = 0) -> tuple[bytes, int]:
    """The LZMA2 chunk layer: control bytes select uncompressed chunks or
    LZMA chunks with optional state/props/dict resets. Returns (output,
    position after the 0x00 end marker)."""
    out = bytearray()
    st: _LzmaState | None = None
    base = 0  # dictionary-reset offset into ``out``
    while True:
        if pos >= len(data):
            raise ValueError("LZMA2 stream missing end marker")
        ctrl = data[pos]
        pos += 1
        if ctrl == 0:
            return bytes(out), pos
        if ctrl < 0x80:
            if ctrl > 2:
                raise ValueError(f"bad LZMA2 control byte {ctrl:#x}")
            if ctrl == 1:  # uncompressed chunk WITH dict reset
                base = len(out)
            size = int.from_bytes(data[pos : pos + 2], "big") + 1
            pos += 2
            chunk = data[pos : pos + size]
            if len(chunk) < size:
                raise ValueError("truncated LZMA2 uncompressed chunk")
            pos += size
            out += chunk
            # an uncompressed chunk invalidates the probability model
            st = None
            continue
        unpack = ((ctrl & 0x1F) << 16) + int.from_bytes(data[pos : pos + 2], "big") + 1
        packed = int.from_bytes(data[pos + 2 : pos + 4], "big") + 1
        pos += 4
        reset = (ctrl >> 5) & 3
        if reset == 3:  # props + state + DICT reset
            base = len(out)
        if reset >= 2:
            d = data[pos]
            pos += 1
            if d >= 9 * 5 * 5:
                raise ValueError("bad LZMA2 properties byte")
            st = _LzmaState(d % 9, (d // 9) % 5, d // 45)
        elif reset == 1:
            if st is None:
                raise ValueError("LZMA2 state reset without known properties")
            st = _LzmaState(st.lc, st.lp, st.pb)
        elif st is None:
            raise ValueError("LZMA2 chunk continues an unknown state")
        chunk = data[pos : pos + packed]
        if len(chunk) < packed:
            raise ValueError("truncated LZMA2 chunk")
        end = _decode_lzma_stream(chunk, 0, out, st, len(out) + unpack, base)
        if end > packed:
            raise ValueError("LZMA2 chunk overran its packed size")
        pos += packed
    # unreachable


_XZ_MAGIC = b"\xfd7zXZ\x00"


def _crc64(data: bytes) -> int:
    """CRC-64/XZ (ECMA-182 reflected, init/xorout all-ones)."""
    tbl = _crc64_table()
    c = 0xFFFFFFFFFFFFFFFF
    for b in data:
        c = (c >> 8) ^ tbl[(c ^ b) & 0xFF]
    return c ^ 0xFFFFFFFFFFFFFFFF


_CRC64_TBL = None


def _crc64_table():
    global _CRC64_TBL
    if _CRC64_TBL is None:
        poly = 0xC96C5795D7870F42
        tbl = []
        for i in range(256):
            c = i
            for _ in range(8):
                c = (c >> 1) ^ poly if c & 1 else c >> 1
            tbl.append(c)
        _CRC64_TBL = tbl
    return _CRC64_TBL


def _read_xz_varint(data: bytes, pos: int) -> tuple[int, int]:
    v = 0
    shift = 0
    while True:
        b = data[pos]
        pos += 1
        v |= (b & 0x7F) << shift
        shift += 7
        if not b & 0x80:
            return v, pos
        if shift > 63:
            raise ValueError("xz varint too long")


@malformed_guard
def xz_decompress(payload: bytes) -> bytes:
    """Full .xz decode: stream header/flags, per-block header parse
    (LZMA2 filter only), LZMA2 chunk decode, block padding, and the
    stream-selected content check VERIFIED per block (none/CRC32/CRC64;
    SHA256 via hashlib). Multi-stream concatenations handled."""
    import hashlib

    out_all = []
    i = 0
    n = len(payload)
    while i < n:
        if payload[i : i + 6] != _XZ_MAGIC:
            raise ValueError(f"bad xz stream magic at {i}")
        check_type = payload[i + 7] & 0x0F
        i += 12  # magic + 2 flag bytes + CRC32 of flags
        while True:
            hdr_size_byte = payload[i]
            if hdr_size_byte == 0:
                break  # index indicator: blocks done for this stream
            hdr_size = (hdr_size_byte + 1) * 4
            hdr = payload[i : i + hdr_size]
            (want_crc,) = struct.unpack_from("<I", hdr, hdr_size - 4)
            if (zlib.crc32(hdr[:-4]) & 0xFFFFFFFF) != want_crc:
                raise ValueError("xz block header CRC mismatch")
            flags = hdr[1]
            nfilters = (flags & 3) + 1
            p = 2
            if flags & 0x40:  # compressed size present
                _, p = _read_xz_varint(hdr, p)
            if flags & 0x80:  # uncompressed size present
                _, p = _read_xz_varint(hdr, p)
            props = None
            for _ in range(nfilters):
                fid, p = _read_xz_varint(hdr, p)
                psize, p = _read_xz_varint(hdr, p)
                fprops = hdr[p : p + psize]
                p += psize
                if fid != 0x21:
                    raise NotImplementedError(
                        f"xz filter {fid:#x} (only LZMA2 chains supported)"
                    )
                props = fprops
            if props is None or len(props) != 1:
                raise ValueError("xz LZMA2 filter without dict-size props")
            i += hdr_size
            out, i = lzma2_decompress(payload, i)
            while i % 4:  # block padding to 4 bytes
                if payload[i] != 0:
                    raise ValueError("nonzero xz block padding")
                i += 1
            if check_type == 0x00:
                pass
            elif check_type == 0x01:
                (want,) = struct.unpack_from("<I", payload, i)
                i += 4
                if (zlib.crc32(out) & 0xFFFFFFFF) != want:
                    raise ValueError("xz CRC32 content check mismatch")
            elif check_type == 0x04:
                (want,) = struct.unpack_from("<Q", payload, i)
                i += 8
                if _crc64(out) != want:
                    raise ValueError("xz CRC64 content check mismatch")
            elif check_type == 0x0A:
                want = payload[i : i + 32]
                i += 32
                if hashlib.sha256(out).digest() != want:
                    raise ValueError("xz SHA-256 content check mismatch")
            else:
                raise NotImplementedError(f"xz check type {check_type:#x}")
            out_all.append(out)
        # skip index: indicator already consumed? (payload[i] == 0)
        idx_start = i
        i += 1  # index indicator
        nrec, i = _read_xz_varint(payload, i)
        for _ in range(nrec):
            _, i = _read_xz_varint(payload, i)
            _, i = _read_xz_varint(payload, i)
        while i % 4:
            if payload[i] != 0:
                raise ValueError("nonzero xz index padding")
            i += 1
        (want_crc,) = struct.unpack_from("<I", payload, i)
        if (zlib.crc32(payload[idx_start : i]) & 0xFFFFFFFF) != want_crc:
            raise ValueError("xz index CRC mismatch")
        i += 4
        i += 12  # stream footer (CRC32, backward size, flags, YZ magic)
    return b"".join(out_all)


# ----------------------------------------------------------- fixture op


def synth_xz_dump(seed: int) -> bytes:
    """Deterministic .xz fixture via the stdlib COMPRESSOR (the decode
    side under test is ours): a dump-like text of n = seed%30+8 lines,
    line i = '<doc id={seed} line={i}> w000 ...' with m = (seed+11i)%13+2
    words; preset and check type vary by seed."""
    import lzma

    seed = int(seed)
    n = seed % 30 + 8
    lines = []
    for i in range(n):
        m = (seed + 11 * i) % 13 + 2
        words = " ".join(f"w{k:03d}" for k in range(m))
        lines.append(f"<doc id={seed} line={i}> {words}")
    check = [lzma.CHECK_CRC32, lzma.CHECK_CRC64, lzma.CHECK_SHA256,
             lzma.CHECK_NONE][seed % 4]
    return lzma.compress(
        "\n".join(lines).encode(), format=lzma.FORMAT_XZ,
        check=check, preset=seed % 3,
    )


XZ_DUMP_SCHEMA = "media_id long, n_lines int, n_tokens long, n_chars long"


def xz_dump_stats(media: DataFrame, fast_path: bool = True) -> DataFrame:
    """Per-dump stats after a .xz decode — the Wikipedia-history-dump
    intake gate. ``fast_path`` (default) decodes via stdlib liblzma with
    the in-repo spec decoder (LZMA2 range decode, content check
    verified) as deterministic sampled cross-verification + fallback,
    and a header-only filter-chain scan preserving the non-LZMA2 scope
    seam (``fastpath.py``); ``fast_path=False`` runs the spec decoder on
    every record (the A/B lever). Per-row Arrow work, linear by
    construction."""
    from .fastpath import fast_decoder

    decode = fast_decoder("xz", spec_only=not fast_path)

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
        batches, schema=XZ_DUMP_SCHEMA
    )
