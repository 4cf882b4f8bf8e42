"""bzip2 decoder — the Wikipedia-dump ingestion gate, zero vendored libs.

Wikipedia/Wikidata dumps — a staple pretraining source — ship as
``.xml.bz2``. This module implements the REAL decode path from the public
format alone (the de-facto spec mirrored by every independent decoder):
MSB-first bit stream, block magics, the symbol-map bitmap, MTF-coded
selectors, delta-coded per-group Huffman lengths with canonical decode and
the 50-symbol group switch, RUNA/RUNB run-length (RLE2) + move-to-front
inversion, inverse Burrows-Wheeler via the standard T-vector walk, final
RLE1 expansion, and both CRC layers (bzip2's MSB-first CRC-32 per block,
combined stream CRC) — verified, never skipped.

The conformance anchor is the strongest available: stdlib ``bz2``
COMPRESSES arbitrary bytes and this decoder must reproduce them exactly
(hypothesis property + seeded units).

Scope seam: the deprecated "randomized" block flag (never produced by any
modern compressor) raises NotImplementedError.

Reference scope note: the reference app (hellohappyworld/
flink-gmall2024-realtime) has no archive path; this is part of the
beyond-reference LLM-data-pipeline surface the build brief asks for.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from .codecguard import malformed_guard

_BLOCK_MAGIC = 0x314159265359
_EOS_MAGIC = 0x177245385090

_CRC_TABLE = None


def _bz2_crc_table():
    """bzip2's CRC-32: polynomial 0x04C11DB7, MSB-first (unreflected)."""
    global _CRC_TABLE
    if _CRC_TABLE is None:
        tbl = []
        for i in range(256):
            c = i << 24
            for _ in range(8):
                c = ((c << 1) ^ 0x04C11DB7) if c & 0x80000000 else (c << 1)
                c &= 0xFFFFFFFF
            tbl.append(c)
        _CRC_TABLE = tbl
    return _CRC_TABLE


def _bz2_crc(data: bytes) -> int:
    tbl = _bz2_crc_table()
    c = 0xFFFFFFFF
    for b in data:
        c = ((c << 8) & 0xFFFFFFFF) ^ tbl[((c >> 24) ^ b) & 0xFF]
    return c ^ 0xFFFFFFFF


class _Bits:
    """MSB-first bit reader over the whole stream (bzip2 blocks are not
    byte-aligned)."""

    def __init__(self, data: bytes) -> None:
        self.d = data
        self.pos = 0  # bit position

    def read(self, n: int) -> int:
        end = self.pos + n
        if end > len(self.d) * 8:
            raise ValueError("truncated bzip2 stream")
        v = 0
        pos = self.pos
        while n:
            byte = self.d[pos >> 3]
            avail = 8 - (pos & 7)
            take = min(avail, n)
            v = (v << take) | ((byte >> (avail - take)) & ((1 << take) - 1))
            pos += take
            n -= take
        self.pos = pos
        return v


@malformed_guard
def bz2_decompress(payload: bytes) -> bytes:
    """Decode a complete .bz2 payload — including CONCATENATED streams
    (pbzip2 / parallel-compressor output: each stream byte-aligned after
    the previous one). Every block CRC and every stream CRC is verified;
    trailing garbage raises. Raises ValueError on any structural or
    checksum failure."""
    out_parts: list = []
    pos = 0
    while pos < len(payload):
        pos = _bz2_one_stream(payload, pos, out_parts)
    return b"".join(out_parts)


def _bz2_one_stream(payload: bytes, start: int, out_parts: list) -> int:
    """Decode one stream beginning at byte ``start``; append plaintext
    parts and return the byte offset just past the stream (streams are
    byte-aligned in a concatenation)."""
    if payload[start : start + 3] != b"BZh" or not (
        start + 3 < len(payload) and 0x31 <= payload[start + 3] <= 0x39
    ):
        raise ValueError("not a bzip2 stream")
    level = payload[start + 3] - 0x30
    max_block = level * 100_000
    r = _Bits(payload)
    r.pos = (start + 4) * 8
    combined = 0
    while True:
        magic = r.read(48)
        if magic == _EOS_MAGIC:
            stream_crc = r.read(32)
            if stream_crc != combined:
                raise ValueError("bzip2 stream CRC mismatch")
            return (r.pos + 7) // 8  # next stream starts byte-aligned
        if magic != _BLOCK_MAGIC:
            raise ValueError(f"bad bzip2 block magic {magic:#x}")
        declared_crc = r.read(32)
        if r.read(1):
            raise NotImplementedError("deprecated randomized bzip2 blocks")
        orig_ptr = r.read(24)
        # symbol map: 16-bit group bitmap, then 16 bits per used group
        used = []
        groups16 = r.read(16)
        for g in range(16):
            if groups16 & (0x8000 >> g):
                bits16 = r.read(16)
                for b in range(16):
                    if bits16 & (0x8000 >> b):
                        used.append(16 * g + b)
        if not used:
            raise ValueError("empty bzip2 symbol map")
        alpha = len(used) + 2  # RUNA, RUNB, MTF values, EOB
        n_groups = r.read(3)
        if not 2 <= n_groups <= 6:
            raise ValueError(f"bzip2 nGroups {n_groups} out of range")
        n_sel = r.read(15)
        # selectors, MTF-coded in unary over the group list
        mtf_g = list(range(n_groups))
        selectors = []
        for _ in range(n_sel):
            j = 0
            while r.read(1):
                j += 1
                if j >= n_groups:
                    raise ValueError("bzip2 selector overruns group count")
            g = mtf_g.pop(j)
            mtf_g.insert(0, g)
            selectors.append(g)
        # per-group delta-coded code lengths -> canonical decode tables
        tables = []
        for _ in range(n_groups):
            ln = r.read(5)
            lens = []
            for _s in range(alpha):
                while r.read(1):
                    ln += -1 if r.read(1) else 1
                if not 1 <= ln <= 20:
                    raise ValueError("bzip2 code length out of range")
                lens.append(ln)
            tables.append(_canonical_table(lens))
        # symbol stream: MTF + RLE2, group switch every 50 symbols
        mtf_syms = list(used)
        bwt = bytearray()
        run = 0
        run_bit = 0
        sel_idx = -1
        count = 0
        limit, base, perm, minlen = tables[selectors[0]] if selectors else (None,) * 4
        while True:
            if count == 0:
                sel_idx += 1
                if sel_idx >= len(selectors):
                    raise ValueError("bzip2 selectors exhausted before EOB")
                limit, base, perm, minlen = tables[selectors[sel_idx]]
                count = 50
            count -= 1
            # canonical Huffman decode
            ln = minlen
            code = r.read(minlen)
            while ln <= 23 and code > limit[ln]:
                code = (code << 1) | r.read(1)
                ln += 1
            if ln > 23:
                raise ValueError("bzip2 Huffman decode overrun")
            sym = perm[code - base[ln]]
            if sym <= 1:  # RUNA / RUNB
                run += (sym + 1) << run_bit
                run_bit += 1
                continue
            if run:
                bwt += bytes([mtf_syms[0]]) * run
                run = 0
                run_bit = 0
            if sym == alpha - 1:  # EOB
                break
            v = mtf_syms.pop(sym - 1)
            mtf_syms.insert(0, v)
            bwt.append(v)
            if len(bwt) > max_block:
                raise ValueError("bzip2 block exceeds declared size")
        if run:
            bwt += bytes([mtf_syms[0]]) * run
        if orig_ptr >= len(bwt):
            raise ValueError("bzip2 origPtr beyond block")
        plain = _inverse_bwt_rle1(bytes(bwt), orig_ptr)
        if _bz2_crc(plain) != declared_crc:
            raise ValueError("bzip2 block CRC mismatch")
        combined = (((combined << 1) | (combined >> 31)) & 0xFFFFFFFF) ^ declared_crc
        out_parts.append(plain)


def _canonical_table(lens: list) -> tuple:
    """bzip2-style canonical Huffman decode arrays (limit/base/perm)."""
    minlen, maxlen = min(lens), max(lens)
    perm = []
    for ln in range(minlen, maxlen + 1):
        for s, sl in enumerate(lens):
            if sl == ln:
                perm.append(s)
    limit = [0] * 24
    base = [0] * 24
    cnt = [0] * 24
    for sl in lens:
        cnt[sl] += 1
    code = 0
    total = 0
    for ln in range(minlen, maxlen + 1):
        base[ln] = code - total
        total += cnt[ln]
        code += cnt[ln]
        limit[ln] = code - 1
        code <<= 1
    for ln in range(maxlen + 1, 24):
        limit[ln] = -1  # unreachable
    return limit, base, perm, minlen


def _inverse_bwt_rle1(bwt: bytes, orig_ptr: int) -> bytes:
    """Standard counting-sort inverse BWT (T-vector walk) followed by the
    outer RLE1 expansion (4 equal bytes + count byte)."""
    import numpy as np

    arr = np.frombuffer(bwt, dtype=np.uint8)
    # order[k] = index in the last column of the k-th element of the
    # SORTED column (stable): following it from orig_ptr replays the
    # rotations in original-string order
    order = np.argsort(arr, kind="stable")
    res = np.empty(len(arr), dtype=np.uint8)
    p = orig_ptr
    for i in range(len(arr)):
        p = order[p]
        res[i] = arr[p]
    # RLE1: any 4 identical bytes are followed by a count byte
    outb = bytearray()
    i = 0
    n = len(res)
    data = res.tobytes()
    while i < n:
        b = data[i]
        j = i + 1
        while j < n and j - i < 4 and data[j] == b:
            j += 1
        runlen = j - i
        outb += bytes([b]) * runlen
        i = j
        if runlen == 4:
            if i >= n:
                raise ValueError("bzip2 RLE1 run missing its count byte")
            outb += bytes([b]) * data[i]
            i += 1
    return bytes(outb)


def synth_bz2_dump(seed: int) -> bytes:
    """Deterministic .bz2 fixture via the stdlib COMPRESSOR (the decode
    side under test is ours): a dump-like text of n = seed%40+10 lines,
    line i = '<doc id={seed} line={i}> w000 ... w{m-1}' with
    m = (seed+3i)%15+2 words. Compression level 1 + (seed%3)."""
    import bz2

    seed = int(seed)
    n = seed % 40 + 10
    lines = []
    for i in range(n):
        m = (seed + 3 * i) % 15 + 2
        words = " ".join(f"w{k:03d}" for k in range(m))
        lines.append(f"<doc id={seed} line={i}> {words}")
    return bz2.compress("\n".join(lines).encode(), compresslevel=1 + seed % 3)


BZ2_DUMP_SCHEMA = "media_id long, n_lines int, n_tokens long, n_chars long"


def bz2_dump_stats(media: DataFrame, fast_path: bool = True) -> DataFrame:
    """Per-dump stats after a bzip2 decode — the Wikipedia-dump intake
    gate. ``fast_path`` (default) decodes via stdlib libbz2 with the
    in-repo spec decoder as deterministic sampled cross-verification +
    rejected-frame fallback (``fastpath.py``); ``fast_path=False`` runs
    the spec decoder on every record (the A/B lever). Per-row Arrow
    work, linear by construction."""
    from .fastpath import fast_decoder

    decode = fast_decoder("bz2", spec_only=not fast_path)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                text = decode(bytes(p)).decode("utf-8")
                rows.append(
                    (
                        mid,
                        text.count("\n") + 1,
                        len(text.split()),
                        len(text),
                    )
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "n_lines", "n_tokens", "n_chars"]
            )

    return media.select("media_id", "payload").mapInPandas(
        batches, schema=BZ2_DUMP_SCHEMA
    )
