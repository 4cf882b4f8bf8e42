"""ORC footer audit + FULL stripe DATA decode — the other columnar-lake
format, read raw end-to-end.

Footer side mirrors the parquet footer audit with ORC's layout: a 1-byte postscript
length at the very end, a PROTOBUF postscript (footer length, compression
kind, block size, the "ORC" magic in field 8000), then the footer — a
protobuf Footer message wrapped in ORC compression chunks (3-byte
little-endian headers carrying ``length << 1 | is_original``). The
protobuf wire walk is the in-repo generic one (``operators/mlrecords``);
the chunk payloads decompress through zlib (raw deflate) or — the point —
the REPO'S OWN Snappy / LZ4-block / zstd decoders, composing the r10
codec work into a second real container format. Recovered: exact row
counts, stripe layout (with the stripe-sum cross-check), compression
kind, column count, and the first int column's min/max statistics
(protobuf ``sint64`` zigzag).

Data side (r11, ``parse_orc_data``): per-stripe StripeFooter protobuf,
PRESENT boolean RLE (byte-RLE + MSB bits), integer RLE v2 in all FOUR
sub-encodings (short-repeat / direct / patched-base / delta — pinned to
the spec's worked byte examples and to live pyarrow output per
sub-encoding via the ``_RLE_SPY`` coverage test), IEEE754 double DATA,
and string DIRECT_V2 / DICTIONARY_V2.

Conformance anchor: REAL pyarrow-written ORC bytes (the bundled C++
writer) across all five compression kinds; pytest cross-checks
``pyarrow.orc.ORCFile`` introspection on arbitrary shapes, and the data
decode is compared to ground-truth aggregates on hypothesis-random
nullable tables.

Reference scope note: the reference app (hellohappyworld/
flink-gmall2024-realtime) has no storage-audit path; this is part of the
beyond-reference LLM-data-pipeline surface the build brief asks for.
"""

from __future__ import annotations

import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from .mlrecords import _read_varint, _wire_fields

from .codecguard import malformed_guard

_KIND_NAMES = {0: "NONE", 1: "ZLIB", 2: "SNAPPY", 3: "LZO", 4: "LZ4", 5: "ZSTD"}


def _zigzag64(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


def _decompress_stream(data: bytes, kind: int) -> bytes:
    """An ORC compressed stream: chunks of (3-byte LE header =
    ``chunk_len << 1 | is_original``) + payload, each payload compressed
    with the file's codec unless the original bit is set."""
    if kind == 0:
        return data
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        if i + 3 > n:
            raise ValueError("truncated ORC chunk header")
        hdr = data[i] | (data[i + 1] << 8) | (data[i + 2] << 16)
        i += 3
        orig = hdr & 1
        ln = hdr >> 1
        chunk = data[i : i + ln]
        if len(chunk) < ln:
            raise ValueError("truncated ORC chunk")
        i += ln
        if orig:
            out += chunk
        elif kind == 1:
            # C zlib decode with the in-repo RFC 1951 decoder as sampled
            # cross-verification + rejected-chunk fallback
            from .fastpath import fast_decoder

            out += fast_decoder("deflate_raw")(chunk)
        elif kind == 2:
            from .lz4snappy import snappy_decompress

            out += snappy_decompress(chunk)
        elif kind == 4:
            from .lz4snappy import lz4_block_decompress

            out += lz4_block_decompress(chunk)
        elif kind == 5:
            from .zstdcodec import zstd_decompress

            out += zstd_decompress(chunk)
        else:
            raise NotImplementedError(f"ORC compression kind {kind}")
    return bytes(out)


@malformed_guard
def parse_orc_footer(payload: bytes) -> dict:
    """Raw ORC footer audit: postscript -> compression kind -> chunked
    footer decompress -> protobuf Footer walk. Returns num_rows,
    n_stripes, n_columns (non-root types), compression name, and the
    first int column's min/max statistics; stripe row counts must sum to
    num_rows."""
    if len(payload) < 4 or payload[:3] != b"ORC":
        raise ValueError("not an ORC file (magic)")
    ps_len = payload[-1]
    if ps_len == 0 or ps_len + 1 > len(payload):
        raise ValueError("bad ORC postscript length")
    ps = payload[-1 - ps_len : -1]
    footer_len = None
    kind = 0
    magic_ok = False
    for field, wt, v in _wire_fields(ps):
        if field == 1 and wt == 0:
            footer_len = v
        elif field == 2 and wt == 0:
            kind = v
        elif field == 8000 and wt == 2:
            magic_ok = v == b"ORC"
    if not magic_ok:
        raise ValueError("ORC postscript missing magic field")
    if footer_len is None:
        raise ValueError("ORC postscript missing footer length")
    end = len(payload) - 1 - ps_len
    raw_footer = payload[end - footer_len : end]
    if len(raw_footer) != footer_len:
        raise ValueError("truncated ORC footer")
    footer = _decompress_stream(raw_footer, kind)
    num_rows = None
    stripes = []
    types = []
    stats = []
    for field, wt, v in _wire_fields(footer):
        if field == 6 and wt == 0:
            num_rows = v
        elif field == 3 and wt == 2:
            stripes.append({f: val for f, _w, val in _wire_fields(v)})
        elif field == 4 and wt == 2:
            types.append({f: val for f, _w, val in _wire_fields(v)})
        elif field == 7 and wt == 2:
            stats.append({f: (_wire_fields(val) if _w == 2 else val)
                          for f, _w, val in _wire_fields(v)})
    if num_rows is None:
        raise ValueError("ORC footer missing row count")
    stripe_rows = sum(s.get(5, 0) for s in stripes)
    if stripe_rows != num_rows:
        raise ValueError(
            f"ORC stripe rows {stripe_rows} != footer num_rows {num_rows}"
        )
    col_min = col_max = None
    # stats[0] is the root struct; find the first column with
    # IntegerStatistics (field 2), whose min/max are protobuf sint64
    for cs in stats[1:]:
        intstats = cs.get(2)
        if intstats:
            vals = {f: v for f, _w, v in intstats}
            if 1 in vals and 2 in vals:
                col_min = _zigzag64(vals[1])
                col_max = _zigzag64(vals[2])
                break
    return {
        "num_rows": num_rows,
        "n_stripes": len(stripes),
        "n_columns": max(0, len(types) - 1),
        "compression": _KIND_NAMES.get(kind, f"kind{kind}"),
        "col0_min": col_min,
        "col0_max": col_max,
    }


def synth_orc(seed: int) -> bytes:
    """Deterministic ORC fixture WRITTEN BY PYARROW: n = seed%80+20 rows,
    k = seed..seed+n-1 (int64), v strings; compression cycles
    zlib/snappy/lz4/zstd/uncompressed by seed%5; small stripes when
    seed%3==0."""
    import io

    import pyarrow as pa
    from pyarrow import orc

    seed = int(seed)
    n = seed % 80 + 20
    comp = ["zlib", "snappy", "lz4", "zstd", "uncompressed"][seed % 5]
    t = pa.table(
        {
            "k": pa.array([seed + j for j in range(n)], type=pa.int64()),
            "v": [f"s{j}" for j in range(n)],
        }
    )
    buf = io.BytesIO()
    kwargs = {"compression": comp}
    if seed % 3 == 0:
        kwargs["stripe_size"] = 1024  # force multi-stripe layouts
    orc.write_table(t, buf, **kwargs)
    return buf.getvalue()


ORC_AUDIT_SCHEMA = (
    "media_id long, num_rows long, n_stripes int, n_columns int, "
    "compression string, col0_min long, col0_max long"
)


def orc_footer_audit(media: DataFrame) -> DataFrame:
    """Per-file ORC footer audit over a binary column — exact row counts,
    stripe layout, compression kind and first-int-column min/max straight
    from the protobuf footer, decompressing footer chunks through the
    repo's own snappy/lz4/zstd decoders. Per-row Arrow work, linear by
    construction."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                a = parse_orc_footer(bytes(p))
                rows.append(
                    (
                        mid, a["num_rows"], a["n_stripes"], a["n_columns"],
                        a["compression"], a["col0_min"], a["col0_max"],
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "num_rows", "n_stripes", "n_columns",
                    "compression", "col0_min", "col0_max",
                ],
            )

    return media.select("media_id", "payload").mapInPandas(
        batches, schema=ORC_AUDIT_SCHEMA
    )


# ---------------------------------------------------------------------------
# Stripe DATA decode (r11): full ORC value read from raw bytes
# ---------------------------------------------------------------------------

# 5-bit width-code table (ORC spec "decodeBitWidth")
_FBS = list(range(1, 25)) + [26, 28, 30, 32, 40, 48, 56, 64]


class _MsbBits:
    """Big-endian (MSB-first) bit unpacker for RLEv2 packed runs."""

    __slots__ = ("d", "pos")

    def __init__(self, data: bytes, bitpos: int = 0) -> None:
        self.d = data
        self.pos = bitpos

    def read(self, n: int) -> int:
        if self.pos + n > 8 * len(self.d):
            raise ValueError("ORC packed run exhausted")
        v = 0
        pos = self.pos
        got = 0
        while got < n:
            byte = self.d[pos >> 3]
            off = pos & 7
            take = min(8 - off, n - got)
            v = (v << take) | ((byte >> (8 - off - take)) & ((1 << take) - 1))
            got += take
            pos += take
        self.pos = pos
        return v


def _byte_rle(data: bytes) -> bytes:
    """ORC byte-level RLE (booleans ride on top of this): control c in
    0..127 = run of c+3 copies of the next byte; 128..255 = 256-c literal
    bytes."""
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        c = data[i]
        i += 1
        if c < 128:
            if i >= n:
                raise ValueError("truncated ORC byte-RLE run")
            out += bytes([data[i]]) * (c + 3)
            i += 1
        else:
            ln = 256 - c
            if i + ln > n:
                raise ValueError("truncated ORC byte-RLE literals")
            out += data[i : i + ln]
            i += ln
    return bytes(out)


def _bool_rle(data: bytes, count: int) -> list[int]:
    """PRESENT stream: byte-RLE bytes, bits MSB-first."""
    raw = _byte_rle(data)
    if 8 * len(raw) < count:
        raise ValueError("ORC present stream shorter than row count")
    return [(raw[i >> 3] >> (7 - (i & 7))) & 1 for i in range(count)]


def _read_uvarint(d: bytes, i: int) -> tuple[int, int]:
    v = 0
    shift = 0
    while True:
        if i >= len(d):
            raise ValueError("truncated ORC varint")
        b = d[i]
        i += 1
        v |= (b & 0x7F) << shift
        shift += 7
        if not b & 0x80:
            return v, i
        if shift > 70:
            raise ValueError("ORC varint too long")


# test hook: when set to a dict, _rlev2 counts each run's sub-encoding
# (0 short-repeat / 1 direct / 2 patched-base / 3 delta) so the property
# suite can PROVE all four paths were exercised by real pyarrow output
_RLE_SPY: dict | None = None


def _rlev2(data: bytes, count: int, signed: bool) -> list[int]:
    """Integer RLE v2: SHORT_REPEAT / DIRECT / PATCHED_BASE / DELTA runs
    until ``count`` values are produced (ORC v1 spec §Integer RLE v2)."""
    out: list[int] = []
    i = 0

    def zz(v: int) -> int:
        return (v >> 1) ^ -(v & 1)

    while len(out) < count:
        if i >= len(data):
            raise ValueError("ORC RLEv2 stream exhausted")
        b0 = data[i]
        kind = b0 >> 6
        if _RLE_SPY is not None:
            _RLE_SPY[kind] = _RLE_SPY.get(kind, 0) + 1
        if kind == 0:  # SHORT_REPEAT
            w = ((b0 >> 3) & 7) + 1
            rep = (b0 & 7) + 3
            if i + 1 + w > len(data):
                raise ValueError("truncated ORC short-repeat")
            v = int.from_bytes(data[i + 1 : i + 1 + w], "big")
            if signed:
                v = zz(v)
            out += [v] * rep
            i += 1 + w
        elif kind == 1:  # DIRECT
            w = _FBS[(b0 >> 1) & 0x1F]
            ln = (((b0 & 1) << 8) | data[i + 1]) + 1
            i += 2
            nbytes = (w * ln + 7) // 8
            bits = _MsbBits(data[i : i + nbytes])
            vals = [bits.read(w) for _ in range(ln)]
            i += nbytes
            out += [zz(v) for v in vals] if signed else vals
        elif kind == 2:  # PATCHED_BASE
            w = _FBS[(b0 >> 1) & 0x1F]
            ln = (((b0 & 1) << 8) | data[i + 1]) + 1
            b2, b3 = data[i + 2], data[i + 3]
            bw = ((b2 >> 5) & 7) + 1
            pw = _FBS[b2 & 0x1F]
            pgw = ((b3 >> 5) & 7) + 1
            pll = b3 & 0x1F
            i += 4
            base = int.from_bytes(data[i : i + bw], "big")
            sign_mask = 1 << (8 * bw - 1)
            if base & sign_mask:
                base = -(base & (sign_mask - 1))
            i += bw
            nbytes = (w * ln + 7) // 8
            bits = _MsbBits(data[i : i + nbytes])
            vals = [bits.read(w) for _ in range(ln)]
            i += nbytes
            # patch entries at the smallest FBS width >= pgw + pw
            pe_w = next(f for f in _FBS if f >= pgw + pw)
            pbytes = (pe_w * pll + 7) // 8
            pbits = _MsbBits(data[i : i + pbytes])
            i += pbytes
            pos = 0
            for _ in range(pll):
                entry = pbits.read(pe_w)
                gap = entry >> pw
                patch = entry & ((1 << pw) - 1)
                pos += gap
                if pos >= ln:
                    raise ValueError("ORC patch position out of run")
                vals[pos] |= patch << w
            out += [base + v for v in vals]
        else:  # DELTA
            wcode = (b0 >> 1) & 0x1F
            w = 0 if wcode == 0 else _FBS[wcode]
            ln = (((b0 & 1) << 8) | data[i + 1]) + 1  # total values in run
            i += 2
            base, i = _read_uvarint(data, i)
            if signed:
                base = zz(base)
            db_raw, i = _read_uvarint(data, i)
            delta_base = zz(db_raw)
            run = [base]
            if ln > 1:
                run.append(base + delta_base)
            if w and ln > 2:
                nbytes = (w * (ln - 2) + 7) // 8
                bits = _MsbBits(data[i : i + nbytes])
                sign = -1 if delta_base < 0 else 1
                for _ in range(ln - 2):
                    run.append(run[-1] + sign * bits.read(w))
                i += nbytes
            elif ln > 2:  # fixed-delta run
                for _ in range(ln - 2):
                    run.append(run[-1] + delta_base)
            out += run
    if len(out) != count:
        raise ValueError("ORC RLEv2 produced more values than expected")
    return out


_ENC_DIRECT, _ENC_DICT, _ENC_DIRECT_V2, _ENC_DICT_V2 = 0, 1, 2, 3


@malformed_guard
def _orc_file_context(payload: bytes):
    """Shared postscript/footer walk for the ORC data readers: returns
    (column names, column type kinds, compression kind, stripe list).
    Flat-struct root required; unsupported type kinds raise the same
    documented seams as before."""
    if len(payload) < 4 or payload[:3] != b"ORC":
        raise ValueError("not an ORC file (magic)")
    ps_len = payload[-1]
    ps = payload[-1 - ps_len : -1]
    footer_len = None
    kind = 0
    for field, wt, v in _wire_fields(ps):
        if field == 1 and wt == 0:
            footer_len = v
        elif field == 2 and wt == 0:
            kind = v
    if footer_len is None:
        raise ValueError("ORC postscript missing footer length")
    end = len(payload) - 1 - ps_len
    footer = _decompress_stream(payload[end - footer_len : end], kind)
    stripes = []
    types = []
    for field, wt, v in _wire_fields(footer):
        if field == 3 and wt == 2:
            stripes.append({f: val for f, _w, val in _wire_fields(v)})
        elif field == 4 and wt == 2:
            tf: dict = {}
            for f, _w, val in _wire_fields(v):
                tf.setdefault(f, []).append(val)
            types.append(tf)
    if not types or types[0].get(1, [None])[0] != 12:
        raise NotImplementedError("ORC data decode requires a flat struct root")
    names = [n.decode() for n in types[0].get(3, [])]
    kinds = [t[1][0] for t in types[1:]]
    # 0 boolean, 1 byte, 2 short, 3 int, 4 long, 5 float, 6 double,
    # 7 string, 9 timestamp, 15 date
    for k in kinds:
        if k not in _ORC_INT_KINDS + (5, 6, 7):
            raise NotImplementedError(f"ORC column type kind {k} in data decode")
    return names, kinds, kind, stripes


def _orc_stripe_streams(payload: bytes, st: dict, kind: int):
    """One stripe's (row count, per-column encodings, data-region stream
    map {(col, stream_kind): bytes})."""
    off, ilen, dlen = st.get(1, 0), st.get(2, 0), st.get(3, 0)
    flen, nrows = st.get(4, 0), st.get(5, 0)
    sfoot = _decompress_stream(
        payload[off + ilen + dlen : off + ilen + dlen + flen], kind
    )
    streams = []
    encs = []
    for f, w, v in _wire_fields(sfoot):
        if f == 1 and w == 2:
            streams.append({ff: vv for ff, _ww, vv in _wire_fields(v)})
        elif f == 2 and w == 2:
            encs.append({ff: vv for ff, _ww, vv in _wire_fields(v)})
    # locate each column's data-region streams (index region excluded)
    pos = off + ilen
    by_col: dict[tuple[int, int], bytes] = {}
    for s in streams:
        skind, col, ln = s.get(1, 0), s.get(2, 0), s.get(3, 0)
        if skind in (6, 7, 8):  # ROW_INDEX / BLOOM live in the index region
            continue
        by_col[(col, skind)] = payload[pos : pos + ln]
        pos += ln
    if pos != off + ilen + dlen:
        raise ValueError("ORC stream lengths disagree with stripe dataLength")
    return nrows, encs, by_col


def _orc_column_values(
    tkind: int, encs: list, by_col: dict, ci: int, kind: int, n_nonnull: int
) -> list:
    """Decode one column's NON-NULL python values in one stripe —
    the shared core of the aggregate reader (parse_orc_data) and the
    record assembler (parse_orc_records). Timestamps surface as
    epoch MICROS, dates as epoch days, booleans as 0/1 ints."""
    import struct as _struct

    enc = encs[ci].get(1, 0)
    data = _decompress_stream(by_col.get((ci, 1), b""), kind)
    if tkind in (2, 3, 4, 15):  # short / int / long / date(days)
        if enc != _ENC_DIRECT_V2:
            raise NotImplementedError(f"ORC integer encoding {enc}")
        return _rlev2(data, n_nonnull, signed=True)
    if tkind == 0:  # boolean: bit stream over byte RLE
        return _bool_rle(data, n_nonnull)
    if tkind == 1:  # tinyint: signed bytes over byte RLE
        raw = _byte_rle(data)
        if len(raw) < n_nonnull:
            raise ValueError("ORC byte stream shorter than values")
        return [b - 256 if b >= 128 else b for b in raw[:n_nonnull]]
    if tkind == 9:  # timestamp: seconds since 2015 + nanos -> micros
        if enc != _ENC_DIRECT_V2:
            raise NotImplementedError(f"ORC timestamp encoding {enc}")
        secs = _rlev2(data, n_nonnull, signed=True)
        nraw = _decompress_stream(by_col.get((ci, 5), b""), kind)
        nanos_enc = _rlev2(nraw, n_nonnull, signed=False)
        out = []
        for s, nv in zip(secs, nanos_enc):
            # The C++ ORC writer (pyarrow's) truncates seconds
            # toward zero, so pre-2015 fractions carry NEGATIVE
            # nanos — the stream value is two's-complement.
            # Empirically pinned (see tests): the low 3 bits are
            # (trailing zeros - 1) when >= 2 zeros were stripped,
            # else 0; arithmetic >> keeps the sign.
            if nv >= 1 << 63:
                nv -= 1 << 64
            z = nv & 7
            nanos = nv >> 3
            if z:
                nanos *= 10 ** (z + 1)
            out.append(((1420070400 + s) * 1_000_000_000 + nanos) // 1000)
        return out
    if tkind == 5:  # float
        if enc != _ENC_DIRECT:
            raise NotImplementedError(f"ORC float encoding {enc}")
        if len(data) < 4 * n_nonnull:
            raise ValueError("ORC float stream shorter than values")
        return [
            _struct.unpack_from("<f", data, 4 * j)[0]
            for j in range(n_nonnull)
        ]
    if tkind == 6:  # double
        if enc != _ENC_DIRECT:
            raise NotImplementedError(f"ORC double encoding {enc}")
        if len(data) < 8 * n_nonnull:
            raise ValueError("ORC double stream shorter than values")
        return [
            _struct.unpack_from("<d", data, 8 * j)[0]
            for j in range(n_nonnull)
        ]
    # string
    lens_raw = _decompress_stream(by_col.get((ci, 2), b""), kind)
    if enc == _ENC_DIRECT_V2:
        lens = _rlev2(lens_raw, n_nonnull, signed=False)
        if sum(lens) > len(data):
            raise ValueError("ORC string data shorter than lengths")
        out = []
        at = 0
        for ln in lens:
            out.append(data[at : at + ln].decode())
            at += ln
        return out
    if enc == _ENC_DICT_V2:
        dict_size = encs[ci].get(2, 0)
        ids = _rlev2(data, n_nonnull, signed=False)
        dlens = _rlev2(lens_raw, dict_size, signed=False)
        blob = _decompress_stream(by_col.get((ci, 3), b""), kind)
        if sum(dlens) > len(blob):
            raise ValueError("ORC dictionary blob shorter than lengths")
        entries = []
        at = 0
        for ln in dlens:
            entries.append(blob[at : at + ln].decode())
            at += ln
        out = []
        for _id in ids:
            if _id >= dict_size:
                raise ValueError("ORC dictionary id out of range")
            out.append(entries[_id])
        return out
    raise NotImplementedError(f"ORC string encoding {enc}")


_ORC_INT_KINDS = (0, 1, 2, 3, 4, 9, 15)


def parse_orc_data(payload: bytes) -> list:
    """FULL ORC value decode from raw bytes (r11 — the THIRD container
    format read end-to-end, after parquet data pages and ORC footers):
    postscript -> footer -> per-stripe StripeFooter protobuf -> per-column
    stream decode. Covers PRESENT boolean RLE, integer RLE v2 in all four
    sub-encodings (short-repeat / direct / patched-base / delta), IEEE754
    double DATA, and string DIRECT_V2 (length RLE + bytes) and
    DICTIONARY_V2 (id RLE + dictionary blob) — every stream decompressed
    through the repo's own codec surface (raw-deflate zlib, Snappy, LZ4
    block, zstd).

    Returns one (col_name, n_values, n_nulls, int_sum, float_sum,
    byte_len) tuple per column, exactly one of the three content
    aggregates non-None by type (long, double, string). Per-stripe
    non-null counts are verified against the stream contents; unsupported
    type kinds / RLEv1 encodings raise NotImplementedError (documented
    seams). r14: the per-column stripe decode is shared with
    ``parse_orc_records`` (full record assembly)."""
    names, kinds, kind, stripes = _orc_file_context(payload)
    totals = [
        {"n_values": 0, "n_nulls": 0,
         "int": 0 if k in _ORC_INT_KINDS else None,
         "flt": 0.0 if k in (5, 6) else None,
         "blen": 0 if k == 7 else None}
        for k in kinds
    ]
    for st in stripes:
        nrows, encs, by_col = _orc_stripe_streams(payload, st, kind)
        for ci, tkind in enumerate(kinds, start=1):
            present_raw = by_col.get((ci, 0))
            if present_raw is not None:
                present = _bool_rle(_decompress_stream(present_raw, kind), nrows)
            else:
                present = [1] * nrows
            n_nonnull = sum(present)
            t = totals[ci - 1]
            t["n_values"] += n_nonnull
            t["n_nulls"] += nrows - n_nonnull
            vals = _orc_column_values(tkind, encs, by_col, ci, kind, n_nonnull)
            if t["int"] is not None:
                t["int"] += sum(vals)
            elif t["flt"] is not None:
                t["flt"] += sum(vals)
            else:
                # ENCODED byte length (UTF-8), not character count —
                # matches parse_parquet_data's convention and the
                # pre-refactor lens/dlens accounting (ADVICE r14: the
                # two disagree on non-ASCII data)
                t["blen"] += sum(
                    len(v) if isinstance(v, (bytes, bytearray))
                    else len(v.encode("utf-8"))
                    for v in vals
                )
    return [
        (
            names[ci],
            t["n_values"],
            t["n_nulls"],
            t["int"],
            t["flt"],
            t["blen"],
        )
        for ci, t in enumerate(totals)
    ]


def parse_orc_records(payload: bytes, columns: list | None = None) -> dict:
    """FULL RECORD ASSEMBLY for flat ORC files (r14 — the ORC twin of
    ``parquetmeta.parse_parquet_records``): {column: [value-or-None per
    row]}, nulls re-interleaved from the PRESENT streams, stripes
    concatenated in order. Timestamps surface as epoch micros, dates as
    epoch days (the same physical conventions the parquet record reader
    uses). ``columns`` restricts which columns decode."""
    names, kinds, kind, stripes = _orc_file_context(payload)
    if columns is not None:
        unknown = set(columns) - set(names)
        if unknown:
            raise ValueError(f"ORC columns {sorted(unknown)} not in file")
    want = set(columns) if columns is not None else set(names)
    out: dict[str, list] = {n: [] for n in names if n in want}
    for st in stripes:
        nrows, encs, by_col = _orc_stripe_streams(payload, st, kind)
        for ci, tkind in enumerate(kinds, start=1):
            name = names[ci - 1]
            if name not in want:
                continue
            present_raw = by_col.get((ci, 0))
            if present_raw is not None:
                present = _bool_rle(_decompress_stream(present_raw, kind), nrows)
            else:
                present = [1] * nrows
            n_nonnull = sum(present)
            vals = _orc_column_values(tkind, encs, by_col, ci, kind, n_nonnull)
            col = out[name]
            it = iter(vals)
            for p in present:
                col.append(next(it) if p else None)
    return out


def synth_orc_data(seed: int) -> bytes:
    """Deterministic ORC data fixture WRITTEN BY PYARROW (the bundled C++
    ORC writer — the decode side under test is ours): n = seed%80+12 rows
    of (nullable long k = seed+2i with every 5th null, string v = 's'*(i%7),
    double d = i/2). Compression rotates through all five kinds by seed%5;
    seed%3==0 forces DICTIONARY_V2 strings (threshold 1.0), others
    DIRECT_V2; seed%4==0 shrinks the stripe size so multi-stripe
    aggregation is on the verified path."""
    import io

    import pyarrow as pa
    import pyarrow.orc as _orc

    seed = int(seed)
    n = seed % 80 + 12
    k = [None if i % 5 == 4 else seed + 2 * i for i in range(n)]
    v = ["s" * (i % 7) for i in range(n)]
    d = [i / 2 for i in range(n)]
    table = pa.table(
        {
            "k": pa.array(k, type=pa.int64()),
            "v": pa.array(v, type=pa.string()),
            "d": pa.array(d, type=pa.float64()),
        }
    )
    buf = io.BytesIO()
    kwargs: dict = {
        "compression": ["uncompressed", "zlib", "snappy", "lz4", "zstd"][seed % 5],
        "dictionary_key_size_threshold": 1.0 if seed % 3 == 0 else 0.0,
    }
    if seed % 4 == 0:
        kwargs["stripe_size"] = 4096
    _orc.write_table(table, buf, **kwargs)
    return buf.getvalue()


ORC_DATA_SCHEMA = (
    "media_id long, col string, n_values long, n_nulls long, "
    "int_sum long, float_sum double, byte_len long"
)


def orc_data_stats(media: DataFrame) -> DataFrame:
    """Per-column value aggregates from a full raw-byte ORC decode — one
    row per (file, column). Per-row Arrow work, linear by construction."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                for col, nv, nn, isum, fsum, blen in parse_orc_data(bytes(p)):
                    rows.append((mid, col, nv, nn, isum, fsum, blen))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "col", "n_values", "n_nulls",
                    "int_sum", "float_sum", "byte_len",
                ],
            )

    return media.select("media_id", "payload").mapInPandas(
        batches, schema=ORC_DATA_SCHEMA
    )
