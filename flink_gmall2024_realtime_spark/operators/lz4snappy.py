"""LZ4 (block + frame) and Snappy decoders — the object-store codecs.

Parquet pages, ORC stripes, Kafka batches and ad-hoc dataset drops ship
LZ4- and Snappy-compressed; both formats are FULLY ALGORITHMIC (token/
varint-structured LZ77 with no fixed entropy tables), so — unlike MP3 or
brotli — a faithful decoder is derivable from the public format documents
alone, and this container carries two independent real implementations to
anchor against: pyarrow's bundled C++ compressors (lz4 frame, lz4 raw
block, snappy) and the standalone ``lz4`` CLI. Fixtures are COMPRESSED by
pyarrow at runtime (the bzip2-via-stdlib pattern), so the oracle-checked
path is real-writer -> our-reader end to end; hypothesis properties
compress arbitrary bytes both ways.

LZ4 frame support: magic, FLG/BD descriptor (version, block-independence,
block/content checksums, content size, dict-id), header-checksum VERIFY
(XXH32 high byte), compressed and uncompressed blocks, per-block XXH32
and content XXH32 verification, EndMark, skippable frames, multi-frame
concatenation. Snappy: varint length + all four tag kinds (1/2/4-byte
literal lengths, copy-1/2/4 with overlap-safe reconstruction).

Scope seam (raise, never a silent wrong answer): LZ4 frames with
Dict-ID raise NotImplementedError.

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

_LZ4_MAGIC = 0x184D2204
_LZ4_SKIP_BASE = 0x184D2A50

# ----------------------------------------------------------------- XXH32

_P32_1 = 0x9E3779B1
_P32_2 = 0x85EBCA77
_P32_3 = 0xC2B2AE3D
_P32_4 = 0x27D4EB2F
_P32_5 = 0x165667B1
_M32 = 0xFFFFFFFF


def _rotl32(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _M32


def xxh32(data: bytes, seed: int = 0) -> int:
    """XXH32 — LZ4 frame header/block/content checksums."""
    n = len(data)
    i = 0
    if n >= 16:
        v1 = (seed + _P32_1 + _P32_2) & _M32
        v2 = (seed + _P32_2) & _M32
        v3 = seed & _M32
        v4 = (seed - _P32_1) & _M32
        while i + 16 <= n:
            lanes = struct.unpack_from("<IIII", data, i)
            v1 = (_rotl32((v1 + lanes[0] * _P32_2) & _M32, 13) * _P32_1) & _M32
            v2 = (_rotl32((v2 + lanes[1] * _P32_2) & _M32, 13) * _P32_1) & _M32
            v3 = (_rotl32((v3 + lanes[2] * _P32_2) & _M32, 13) * _P32_1) & _M32
            v4 = (_rotl32((v4 + lanes[3] * _P32_2) & _M32, 13) * _P32_1) & _M32
            i += 16
        h = (_rotl32(v1, 1) + _rotl32(v2, 7) + _rotl32(v3, 12) + _rotl32(v4, 18)) & _M32
    else:
        h = (seed + _P32_5) & _M32
    h = (h + n) & _M32
    while i + 4 <= n:
        (lane,) = struct.unpack_from("<I", data, i)
        h = (_rotl32((h + lane * _P32_3) & _M32, 17) * _P32_4) & _M32
        i += 4
    while i < n:
        h = (_rotl32((h + data[i] * _P32_5) & _M32, 11) * _P32_1) & _M32
        i += 1
    h ^= h >> 15
    h = (h * _P32_2) & _M32
    h ^= h >> 13
    h = (h * _P32_3) & _M32
    h ^= h >> 16
    return h


# ------------------------------------------------------------- LZ4 block


@malformed_guard
def lz4_block_decompress(data: bytes, out: bytearray | None = None) -> bytes:
    """One raw LZ4 block: token-structured (literal run, 2-byte offset,
    min-4 match) sequences, 255-extension lengths, overlap-safe copy.
    ``out`` carries prior frame output for dependent blocks."""
    dst = out if out is not None else bytearray()
    base = len(dst)
    i = 0
    n = len(data)
    while i < n:
        token = data[i]
        i += 1
        ll = token >> 4
        if ll == 15:
            while True:
                b = data[i]
                i += 1
                ll += b
                if b != 255:
                    break
        if i + ll > n:
            raise ValueError("LZ4 literal run past block end")
        dst += data[i : i + ll]
        i += ll
        if i == n:
            break  # last sequence carries literals only
        if i + 2 > n:
            raise ValueError("truncated LZ4 match offset")
        offset = data[i] | (data[i + 1] << 8)
        i += 2
        if offset == 0:
            raise ValueError("LZ4 zero match offset")
        ml = (token & 0xF) + 4
        if (token & 0xF) == 15:
            while True:
                b = data[i]
                i += 1
                ml += b
                if b != 255:
                    break
        if offset > len(dst):
            raise ValueError("LZ4 match offset beyond output")
        if offset >= ml:
            start = len(dst) - offset
            dst += dst[start : start + ml]
        else:
            for _ in range(ml):
                dst.append(dst[-offset])
    if out is not None:
        return b""
    return bytes(dst[base:])


# ------------------------------------------------------------- LZ4 frame


@malformed_guard
def lz4_frame_decompress(payload: bytes) -> bytes:
    """LZ4 frame walk with EVERY checksum verified: header XXH32 byte,
    optional per-block XXH32, optional content XXH32 + declared content
    size; handles uncompressed blocks, block-dependent frames, EndMark,
    skippable frames and multi-frame concatenation."""
    out_all = []
    i = 0
    n = len(payload)
    while i < n:
        if i + 4 > n:
            raise ValueError("truncated LZ4 frame magic")
        (magic,) = struct.unpack_from("<I", payload, i)
        if _LZ4_SKIP_BASE <= magic <= _LZ4_SKIP_BASE + 15:
            (sz,) = struct.unpack_from("<I", payload, i + 4)
            i += 8 + sz
            continue
        if magic != _LZ4_MAGIC:
            raise ValueError(f"bad LZ4 frame magic at offset {i}")
        hdr_start = i + 4
        flg = payload[hdr_start]
        bd = payload[hdr_start + 1]
        if (flg >> 6) != 0b01:
            raise ValueError("unsupported LZ4 frame version")
        if flg & 0x02:
            raise ValueError("reserved FLG bit set")
        indep = bool(flg & 0x20)
        b_check = bool(flg & 0x10)
        c_size = bool(flg & 0x08)
        c_check = bool(flg & 0x04)
        dict_id = bool(flg & 0x01)
        if bd & 0x8F:
            raise ValueError("reserved BD bits set")
        j = hdr_start + 2
        content_size = None
        if c_size:
            (content_size,) = struct.unpack_from("<Q", payload, j)
            j += 8
        if dict_id:
            raise NotImplementedError("LZ4 dictionary frames")
        hc = payload[j]
        want_hc = (xxh32(payload[hdr_start:j]) >> 8) & 0xFF
        if hc != want_hc:
            raise ValueError("LZ4 frame header checksum mismatch")
        j += 1
        out = bytearray()
        while True:
            if j + 4 > n:
                raise ValueError("truncated LZ4 block size")
            (bsz,) = struct.unpack_from("<I", payload, j)
            j += 4
            if bsz == 0:
                break  # EndMark
            uncompressed = bool(bsz & 0x80000000)
            bsz &= 0x7FFFFFFF
            block = payload[j : j + bsz]
            if len(block) < bsz:
                raise ValueError("truncated LZ4 block")
            j += bsz
            if b_check:
                (want,) = struct.unpack_from("<I", payload, j)
                j += 4
                if xxh32(block) != want:
                    raise ValueError("LZ4 block checksum mismatch")
            if uncompressed:
                out += block
            elif indep:
                out += lz4_block_decompress(block)
            else:
                lz4_block_decompress(block, out)
        if c_check:
            if j + 4 > n:
                raise ValueError("truncated LZ4 content checksum")
            (want,) = struct.unpack_from("<I", payload, j)
            j += 4
            if xxh32(bytes(out)) != want:
                raise ValueError("LZ4 content checksum mismatch")
        if content_size is not None and len(out) != content_size:
            raise ValueError(
                f"LZ4 content size mismatch: declared {content_size}, got {len(out)}"
            )
        out_all.append(bytes(out))
        i = j
    return b"".join(out_all)


# ---------------------------------------------------------------- Snappy


@malformed_guard
def snappy_decompress(data: bytes) -> bytes:
    """Raw Snappy: varint uncompressed length, then literal and copy-1/2/4
    tags with overlap-safe reconstruction; the declared length is
    enforced."""
    # varint length
    length = 0
    shift = 0
    i = 0
    while True:
        if i >= len(data):
            raise ValueError("truncated snappy length varint")
        b = data[i]
        i += 1
        length |= (b & 0x7F) << shift
        shift += 7
        if not b & 0x80:
            break
        if shift > 35:
            raise ValueError("snappy length varint too long")
    out = bytearray()
    n = len(data)
    while i < n:
        tag = data[i]
        i += 1
        kind = tag & 3
        if kind == 0:  # literal
            ln = tag >> 2
            if ln >= 60:
                extra = ln - 59
                if i + extra > n:
                    raise ValueError("truncated snappy literal length")
                ln = int.from_bytes(data[i : i + extra], "little")
                i += extra
            ln += 1
            if i + ln > n:
                raise ValueError("snappy literal past end")
            out += data[i : i + ln]
            i += ln
            continue
        if kind == 1:  # copy with 1-byte offset tail
            ml = ((tag >> 2) & 0x7) + 4
            offset = ((tag >> 5) << 8) | data[i]
            i += 1
        elif kind == 2:  # copy, 2-byte offset
            ml = (tag >> 2) + 1
            offset = data[i] | (data[i + 1] << 8)
            i += 2
        else:  # copy, 4-byte offset
            ml = (tag >> 2) + 1
            (offset,) = struct.unpack_from("<I", data, i)
            i += 4
        if offset == 0 or offset > len(out):
            raise ValueError("snappy copy offset out of range")
        if offset >= ml:
            start = len(out) - offset
            out += out[start : start + ml]
        else:
            for _ in range(ml):
                out.append(out[-offset])
    if len(out) != length:
        raise ValueError(
            f"snappy length mismatch: declared {length}, got {len(out)}"
        )
    return bytes(out)


# ------------------------------------------------------------- fixtures


def _dump_text(seed: int, n_mod: int, n_add: int, m_mul: int, m_mod: int, m_add: int) -> bytes:
    """Shared dump-text shape (closed-form lines/tokens/chars)."""
    n = seed % n_mod + n_add
    lines = []
    for i in range(n):
        m = (seed + m_mul * i) % m_mod + m_add
        toks = " ".join(f"t{k:03d}" for k in range(m))
        lines.append(f"<rec id={seed} line={i}> {toks}")
    return "\n".join(lines).encode()


def synth_lz4_dump(seed: int) -> bytes:
    """Deterministic .lz4 fixture COMPRESSED BY PYARROW's bundled C++
    LZ4-frame writer (the real-writer/our-reader anchor): a dump-like
    text of n = seed%32+9 lines, m = (seed+5i)%14+2 tokens each."""
    import pyarrow as pa

    return bytes(pa.Codec("lz4").compress(_dump_text(int(seed), 32, 9, 5, 14, 2)))


def synth_snappy_dump(seed: int) -> bytes:
    """Deterministic .snappy fixture COMPRESSED BY PYARROW's bundled C++
    Snappy writer: n = seed%28+7 lines, m = (seed+9i)%13+4 tokens each."""
    import pyarrow as pa

    return bytes(pa.Codec("snappy").compress(_dump_text(int(seed), 28, 7, 9, 13, 4)))


DUMP_SCHEMA = "media_id long, n_lines int, n_tokens long, n_chars long"


def _dump_stats(media: DataFrame, decode) -> DataFrame:
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
        batches, schema=DUMP_SCHEMA
    )


def lz4_dump_stats(media: DataFrame, fast_path: bool = True) -> DataFrame:
    """Per-dump stats after an LZ4 frame decode. ``fast_path`` (default)
    decodes via pyarrow's C++ LZ4 with the in-repo spec decoder
    (header/block/content XXH32 all verified) as deterministic sampled
    cross-verification + rejected-frame fallback (``fastpath.py``);
    ``fast_path=False`` runs the spec decoder on every record (the A/B
    lever). Per-row Arrow work, linear by construction."""
    from .fastpath import fast_decoder

    return _dump_stats(media, fast_decoder("lz4", spec_only=not fast_path))


def snappy_dump_stats(media: DataFrame, fast_path: bool = True) -> DataFrame:
    """Per-dump stats after a Snappy decode. ``fast_path`` (default)
    decodes via pyarrow's C++ Snappy (declared-length varint parsed and
    enforced) with the in-repo spec decoder as deterministic sampled
    cross-verification + fallback; ``fast_path=False`` runs the spec
    decoder throughout. Per-row Arrow work, linear by construction."""
    from .fastpath import fast_decoder

    return _dump_stats(media, fast_decoder("snappy", spec_only=not fast_path))
