"""ZIP archive ingestion — the code-corpus path.

Source-code corpora (repository exports, dataset drops) arrive as ZIP
archives. This module implements the real walk with stdlib zlib only,
matching the repo's other byte-level gates: End-Of-Central-Directory
locate (scanning back past an optional comment), central-directory entry
parse, local-header cross-check, STORED and DEFLATE member extraction
(raw inflate, ``wbits=-15``), and CRC-32 verification of every extracted
member — a silently corrupt member is corpus loss, so mismatches raise.

ZIP64 archives (the layout of any >4 GiB corpus shard: EOCD sentinel
values -> ZIP64 EOCD locator -> ZIP64 EOCD record, plus 0x0001 extended-
info extra fields on central-directory entries) and streaming-writer
data descriptors (general-purpose bit 3: zeroed local-header sizes, the
authoritative values live in the central directory and a post-data
descriptor) are fully handled. Scope seam (raise, never a wrong answer):
encrypted members and compression methods other than STORED/DEFLATE are
NotImplementedError.

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

_EOCD_SIG = b"PK\x05\x06"
_CD_SIG = b"PK\x01\x02"
_LFH_SIG = b"PK\x03\x04"
_DD_SIG = b"PK\x07\x08"  # data descriptor (streaming writers)
_Z64_EOCD_SIG = b"PK\x06\x06"  # ZIP64 end-of-central-directory record
_Z64_LOC_SIG = b"PK\x06\x07"  # ZIP64 EOCD locator


def synth_zip(seed: int) -> bytes:
    """Deterministic ZIP fixture: ``seed%8+1`` members named
    ``src/f{k}.py`` (every 4th ``docs/n{k}.md``), member k holding
    L = (seed+7k)%20+1 lines of ``# line {i} of member {k}\\n``.
    Members alternate DEFLATE/STORED by (seed+k)%3 (0 -> STORED); the
    archive ends with an EOCD carrying a ``seed%30``-byte comment so the
    back-scan is on the verified path. CRCs are real.

    Container-layout variety (member CONTENT and the oracle closed form
    are unchanged): members with (seed+k)%5 == 1 are written the
    streaming-writer way — general-purpose bit 3, zeroed local-header
    sizes, signed data descriptor after the payload; seeds %6 == 2 write
    the whole archive in ZIP64 layout — 0xFFFFFFFF sentinels in the
    central directory with 0x0001 extended-info extras, ZIP64 EOCD record
    + locator, sentinel EOCD — the shape every >4 GiB shard has."""
    seed = int(seed)
    n = seed % 8 + 1
    zip64 = seed % 6 == 2
    locals_out = []
    cd_out = []
    pos = 0
    for k in range(n):
        name = (f"docs/n{k}.md" if k % 4 == 3 else f"src/f{k}.py").encode()
        lines = (seed + 7 * k) % 20 + 1
        content = "".join(f"# line {i} of member {k}\n" for i in range(lines)).encode()
        crc = zlib.crc32(content) & 0xFFFFFFFF
        if (seed + k) % 3 == 0:
            method, data = 0, content  # STORED
        else:
            co = zlib.compressobj(6, zlib.DEFLATED, -15)
            method, data = 8, co.compress(content) + co.flush()
        streamed = (seed + k) % 5 == 1  # data-descriptor member
        flags = 0x08 if streamed else 0
        lfh_crc, lfh_cs, lfh_us = (0, 0, 0) if streamed else (crc, len(data), len(content))
        lfh = (
            _LFH_SIG
            + struct.pack(
                "<HHHHHIIIHH",
                20, flags, method, 0, 0x5821,  # version, flags, method, time, date
                lfh_crc, lfh_cs, lfh_us, len(name), 0,
            )
            + name
        )
        desc = (
            _DD_SIG + struct.pack("<III", crc, len(data), len(content))
            if streamed
            else b""
        )
        if zip64:
            extra = struct.pack("<HHQQQ", 0x0001, 24, len(content), len(data), pos)
            cd_out.append(
                _CD_SIG
                + struct.pack(
                    "<HHHHHHIIIHHHHHII",
                    45, 45, flags, method, 0, 0x5821,
                    crc, 0xFFFFFFFF, 0xFFFFFFFF, len(name), len(extra),
                    0, 0, 0, 0, 0xFFFFFFFF,
                )
                + name
                + extra
            )
        else:
            cd_out.append(
                _CD_SIG
                + struct.pack(
                    "<HHHHHHIIIHHHHHII",
                    20, 20, flags, method, 0, 0x5821,
                    crc, len(data), len(content), len(name), 0, 0, 0, 0, 0, pos,
                )
                + name
            )
        locals_out.append(lfh + data + desc)
        pos += len(lfh) + len(data) + len(desc)
    cd = b"".join(cd_out)
    comment = bytes((seed + i) % 200 + 32 for i in range(seed % 30))
    if zip64:
        z64_eocd = _Z64_EOCD_SIG + struct.pack(
            "<QHHIIQQQQ", 44, 45, 45, 0, 0, n, n, len(cd), pos
        )
        locator = _Z64_LOC_SIG + struct.pack("<IQI", 0, pos + len(cd), 1)
        eocd = _EOCD_SIG + struct.pack(
            "<HHHHIIH", 0, 0, 0xFFFF, 0xFFFF, 0xFFFFFFFF, 0xFFFFFFFF,
            len(comment),
        ) + comment
        return b"".join(locals_out) + cd + z64_eocd + locator + eocd
    eocd = _EOCD_SIG + struct.pack(
        "<HHHHIIH", 0, 0, n, n, len(cd), pos, len(comment)
    ) + comment
    return b"".join(locals_out) + cd + eocd


@malformed_guard
def _walk_zip(payload: bytes):
    """Member walk shared by ``parse_zip`` and ``zip_extract``: locate
    EOCD by back-scanning past the comment, parse every central-directory
    entry, cross-check each member's local header signature, extract
    (STORED / raw-DEFLATE through the fast-path dispatch) and verify
    CRC-32. Returns a list of (member_idx, name, method, n_bytes,
    content) tuples."""
    scan_from = max(0, len(payload) - 22 - 0xFFFF)
    eocd_at = payload.rfind(_EOCD_SIG, scan_from)
    if eocd_at < 0:
        raise ValueError("no ZIP end-of-central-directory record")
    (
        _disk, _cd_disk, _n_disk, n_total, cd_size, cd_off, _clen,
    ) = struct.unpack_from("<HHHHIIH", payload, eocd_at + 4)
    if n_total == 0xFFFF or cd_off == 0xFFFFFFFF:
        # ZIP64: locator sits immediately before the EOCD and points at
        # the ZIP64 EOCD record carrying the 64-bit counts/offsets
        loc_at = eocd_at - 20
        if loc_at < 0 or payload[loc_at : loc_at + 4] != _Z64_LOC_SIG:
            raise ValueError("ZIP64 sentinel EOCD without a ZIP64 locator")
        (_z_disk, z64_off, _n_disks) = struct.unpack_from(
            "<IQI", payload, loc_at + 4
        )
        if payload[z64_off : z64_off + 4] != _Z64_EOCD_SIG:
            raise ValueError("ZIP64 locator points past the EOCD record")
        (
            _rsize, _vmade64, _vneed64, _d1, _d2,
            _n_disk64, n_total, cd_size, cd_off,
        ) = struct.unpack_from("<QHHIIQQQQ", payload, z64_off + 4)
    rows = []
    pos = cd_off
    for idx in range(n_total):
        if payload[pos : pos + 4] != _CD_SIG:
            raise ValueError(f"bad central-directory signature at entry {idx}")
        (
            _vmade, _vneed, flags, method, _t, _d, crc, csize, usize,
            nlen, xlen, clen, _disk2, _iattr, _eattr, lfh_off,
        ) = struct.unpack_from("<HHHHHHIIIHHHHHII", payload, pos + 4)
        name = payload[pos + 46 : pos + 46 + nlen].decode("utf-8")
        if usize == 0xFFFFFFFF or csize == 0xFFFFFFFF or lfh_off == 0xFFFFFFFF:
            # ZIP64 extended-info extra (id 0x0001): 8-byte values appear
            # in (usize, csize, lfh_off) order, only for sentinel fields
            extra = payload[pos + 46 + nlen : pos + 46 + nlen + xlen]
            e = 0
            found = False
            while e + 4 <= len(extra):
                eid, esz = struct.unpack_from("<HH", extra, e)
                if eid == 0x0001:
                    body = extra[e + 4 : e + 4 + esz]
                    b = 0
                    if usize == 0xFFFFFFFF:
                        (usize,) = struct.unpack_from("<Q", body, b)
                        b += 8
                    if csize == 0xFFFFFFFF:
                        (csize,) = struct.unpack_from("<Q", body, b)
                        b += 8
                    if lfh_off == 0xFFFFFFFF:
                        (lfh_off,) = struct.unpack_from("<Q", body, b)
                        b += 8
                    found = True
                    break
                e += 4 + esz
            if not found:
                raise ValueError(
                    f"member {name!r}: ZIP64 sentinel without 0x0001 extra"
                )
        pos += 46 + nlen + xlen + clen
        if flags & 0x1:
            raise NotImplementedError("encrypted ZIP members")
        if method not in (0, 8):
            raise NotImplementedError(f"compression method {method}")
        if payload[lfh_off : lfh_off + 4] != _LFH_SIG:
            raise ValueError(f"member {name!r}: bad local-header signature")
        lnlen, lxlen = struct.unpack_from("<HH", payload, lfh_off + 26)
        data_at = lfh_off + 30 + lnlen + lxlen
        data = payload[data_at : data_at + csize]
        if len(data) != csize:
            raise ValueError(f"member {name!r}: truncated data")
        if method == 0:
            content = data
        else:
            from .fastpath import fast_decoder

            content = fast_decoder("deflate_raw")(data)
        if len(content) != usize:
            raise ValueError(f"member {name!r}: size mismatch after inflate")
        if (zlib.crc32(content) & 0xFFFFFFFF) != crc:
            raise ValueError(f"member {name!r}: CRC-32 mismatch")
        rows.append((idx, name, method, usize, content))
    return rows


def parse_zip(payload: bytes) -> list:
    """Per-member ZIP audit rows: (member_idx, name, method, n_bytes,
    n_lines) with n_bytes/n_lines of the DECOMPRESSED content. Raises on
    signature, scope, or CRC failures (see ``_walk_zip``)."""
    return [
        (idx, name, method, usize, content.count(b"\n"))
        for idx, name, method, usize, content in _walk_zip(payload)
    ]


def zip_extract(payload: bytes) -> list:
    """Extract every member as (name, content) — the in-repo unzip used
    by composed readers (e.g. the Delta-log snapshot audit)."""
    return [
        (name, content) for _i, name, _m, _u, content in _walk_zip(payload)
    ]


ZIP_MEMBERS_SCHEMA = (
    "media_id long, member_idx int, name string, method int, "
    "n_bytes int, n_lines int"
)


def zip_members(media: DataFrame) -> DataFrame:
    """Per-member table from ZIP payloads via ``mapInPandas`` — one row
    per archive member with its path, compression method, decompressed
    size and line count, every member CRC-verified. The code-corpus
    ingestion gate: downstream filters by extension and feeds the text
    path. Per-row Arrow work, linear by construction."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                for row in parse_zip(bytes(p)):
                    out.append((mid, *row))
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id", "member_idx", "name", "method",
                    "n_bytes", "n_lines",
                ],
            )

    return media.select("media_id", "payload").mapInPandas(
        batches, schema=ZIP_MEMBERS_SCHEMA
    )


def synth_tar_gz(seed: int) -> bytes:
    """Deterministic .tar.gz fixture (POSIX ustar): ``seed%7+1`` file
    members named like the ZIP fixture (``src/f{k}.py`` / every 4th
    ``docs/n{k}.md``) plus one leading directory entry, member k holding
    L = (seed+11k)%20+1 lines of ``# line {i} of member {k}\\n``; octal
    header fields, real checksums, two zero blocks, single gzip member
    (mtime 0)."""
    import gzip

    seed = int(seed)
    n = seed % 7 + 1

    def header(name: bytes, size: int, typeflag: bytes) -> bytes:
        h = bytearray(512)
        h[0 : len(name)] = name
        h[100:108] = b"0000644\x00"
        h[108:116] = b"0000000\x00"
        h[116:124] = b"0000000\x00"
        h[124:136] = ("%011o" % size).encode() + b"\x00"
        h[136:148] = b"00000000000\x00"  # mtime 0
        h[148:156] = b" " * 8  # checksum field counted as spaces
        h[156:157] = typeflag
        h[257:263] = b"ustar\x00"
        h[263:265] = b"00"
        chk = sum(h)
        h[148:156] = ("%06o" % chk).encode() + b"\x00 "
        return bytes(h)

    out = [header(b"src/", 0, b"5")]
    for k in range(n):
        name = (f"docs/n{k}.md" if k % 4 == 3 else f"src/f{k}.py").encode()
        lines = (seed + 11 * k) % 20 + 1
        content = "".join(f"# line {i} of member {k}\n" for i in range(lines)).encode()
        out.append(header(name, len(content), b"0"))
        out.append(content)
        pad = (-len(content)) % 512
        out.append(bytes(pad))
    out.append(bytes(1024))
    return gzip.compress(b"".join(out), compresslevel=6, mtime=0)


@malformed_guard
def parse_tar_gz(payload: bytes) -> list:
    """REAL ustar walk over a gunzipped tarball: 512-byte headers with
    verified checksums, octal size fields, 512-padding, end-of-archive
    zero blocks; directory entries are skipped. Returns one
    (member_idx, name, n_bytes, n_lines) per regular file. Raises on
    checksum or structure failures."""
    from .fastpath import fast_decoder

    data = fast_decoder("gzip")(payload)
    rows = []
    idx = 0
    pos = 0
    while pos + 512 <= len(data):
        h = data[pos : pos + 512]
        if h == bytes(512):
            break  # end-of-archive
        stored = int(h[148:156].rstrip(b"\x00 ") or b"0", 8)
        calc = sum(h[:148]) + 8 * 32 + sum(h[156:])
        if stored != calc:
            raise ValueError(f"tar header checksum mismatch at offset {pos}")
        name = h[0:100].rstrip(b"\x00").decode("utf-8")
        size = int(h[124:136].rstrip(b"\x00 ") or b"0", 8)
        typeflag = h[156:157]
        pos += 512
        content = data[pos : pos + size]
        if len(content) != size:
            raise ValueError(f"member {name!r}: truncated content")
        pos += size + ((-size) % 512)
        if typeflag in (b"0", b"\x00"):
            rows.append((idx, name, size, content.count(b"\n")))
            idx += 1
    else:
        raise ValueError("tar archive without end-of-archive blocks")
    return rows


TAR_MEMBERS_SCHEMA = (
    "media_id long, member_idx int, name string, n_bytes int, n_lines int"
)


def tar_members(media: DataFrame) -> DataFrame:
    """Per-member table from .tar.gz payloads via ``mapInPandas`` — the
    sibling of ``zip_members`` for the other archive format code and
    dataset drops ship in. Per-row Arrow work, linear by construction."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                for row in parse_tar_gz(bytes(p)):
                    out.append((mid, *row))
            yield pd.DataFrame(
                out,
                columns=["media_id", "member_idx", "name", "n_bytes", "n_lines"],
            )

    return media.select("media_id", "payload").mapInPandas(
        batches, schema=TAR_MEMBERS_SCHEMA
    )
