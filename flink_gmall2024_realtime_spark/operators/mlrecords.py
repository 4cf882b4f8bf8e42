"""TFRecord ingestion — the ML-native dataset format.

Vision/speech/LLM datasets ship as TFRecord files: length-framed records,
each guarded by two masked CRC-32C checksums, each record a serialized
``tf.train.Example`` protobuf. This module implements the real read path
from the PUBLIC formats alone — the TFRecord framing (TensorFlow docs),
CRC-32C (RFC 3720, Castagnoli polynomial, table-driven) with TensorFlow's
mask rotation, and a generic protobuf WIRE-FORMAT walker (varint tags,
length-delimited submessages, packed scalar lists) specialized to the
``Example``/``Features``/``Feature`` schema. No TensorFlow, no protobuf
library.

Corrupt framing or CRC mismatches raise — a silently skipped record is
corpus loss.

Reference scope note: the reference app (hellohappyworld/
flink-gmall2024-realtime) has no ML-record path; this is part of the
beyond-reference LLM-data-pipeline surface the build brief asks for.
"""

from __future__ import annotations

import struct
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from .codecguard import malformed_guard

# --- CRC-32C (Castagnoli, reflected poly 0x82F63B78) ---------------------

_CRC32C_TABLE = None


def _crc32c_table():
    global _CRC32C_TABLE
    if _CRC32C_TABLE is None:
        tbl = []
        for i in range(256):
            c = i
            for _ in range(8):
                c = (c >> 1) ^ 0x82F63B78 if c & 1 else c >> 1
            tbl.append(c)
        _CRC32C_TABLE = tbl
    return _CRC32C_TABLE


def crc32c(data: bytes) -> int:
    tbl = _crc32c_table()
    c = 0xFFFFFFFF
    for b in data:
        c = tbl[(c ^ b) & 0xFF] ^ (c >> 8)
    return c ^ 0xFFFFFFFF


def _masked_crc(data: bytes) -> int:
    """TensorFlow's masked CRC: rotate right 15 and add a constant."""
    c = crc32c(data)
    return (((c >> 15) | (c << 17)) + 0xA282EAD8) & 0xFFFFFFFF


# --- protobuf wire format --------------------------------------------------


def _write_varint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_varint(data: bytes, pos: int) -> tuple:
    v = 0
    shift = 0
    while True:
        if pos >= len(data):
            raise ValueError("truncated varint")
        b = data[pos]
        pos += 1
        v |= (b & 0x7F) << shift
        if not b & 0x80:
            return v, pos
        shift += 7
        if shift > 63:
            raise ValueError("varint too long")


def _ld(field: int, payload: bytes) -> bytes:
    """A length-delimited (wire type 2) field."""
    return _write_varint((field << 3) | 2) + _write_varint(len(payload)) + payload


def _wire_fields(data: bytes) -> list:
    """Generic wire walk: [(field_num, wire_type, value)] where value is
    int for varint/fixed and bytes for length-delimited."""
    out = []
    pos = 0
    while pos < len(data):
        tag, pos = _read_varint(data, pos)
        field, wt = tag >> 3, tag & 7
        if wt == 0:
            v, pos = _read_varint(data, pos)
        elif wt == 1:
            v = int.from_bytes(data[pos : pos + 8], "little")
            pos += 8
        elif wt == 5:
            v = int.from_bytes(data[pos : pos + 4], "little")
            pos += 4
        elif wt == 2:
            ln, pos = _read_varint(data, pos)
            v = data[pos : pos + ln]
            if len(v) != ln:
                raise ValueError("truncated length-delimited field")
            pos += ln
        else:
            raise NotImplementedError(f"wire type {wt} (groups are obsolete)")
        out.append((field, wt, v))
    return out


def synth_tfrecord(seed: int) -> bytes:
    """Deterministic TFRecord fixture: ``seed%5+1`` records, record k a
    ``tf.train.Example`` with three features —

    - ``text``  BytesList: one string of m = (seed+3k)%20+3 fixed-width
      words;
    - ``label`` Int64List (packed varints): one value (seed+k)%10;
    - ``emb``   FloatList (packed 4-byte LE): d = (seed+k)%4+2 values
      i + 0.5.

    Framing is the real thing: 8-byte LE length + masked CRC-32C of the
    length + data + masked CRC-32C of the data."""
    seed = int(seed)
    n = seed % 5 + 1
    out = []
    for k in range(n):
        m = (seed + 3 * k) % 20 + 3
        text = " ".join(f"w{i:03d}" for i in range(m)).encode()
        label = (seed + k) % 10
        d = (seed + k) % 4 + 2
        emb = struct.pack(f"<{d}f", *[i + 0.5 for i in range(d)])

        def feat_entry(name: bytes, feature: bytes) -> bytes:
            return _ld(1, _ld(1, name) + _ld(2, feature))

        features = (
            feat_entry(b"emb", _ld(2, _ld(1, emb)))  # FloatList, packed
            + feat_entry(b"label", _ld(3, _ld(1, _write_varint(label))))
            + feat_entry(b"text", _ld(1, _ld(1, text)))  # BytesList
        )
        example = _ld(1, features)
        hdr = struct.pack("<Q", len(example))
        out.append(
            hdr
            + struct.pack("<I", _masked_crc(hdr))
            + example
            + struct.pack("<I", _masked_crc(example))
        )
    return b"".join(out)


@malformed_guard
def parse_tfrecord(payload: bytes) -> list:
    """REAL TFRecord walk: verify BOTH masked CRC-32Cs per record, then
    wire-walk the Example -> Features -> map-entry -> Feature chain.
    Returns one tuple per record:
    (rec_idx, n_features, text_tokens, label, emb_dim)."""
    rows = []
    pos = 0
    idx = 0
    while pos < len(payload):
        if pos + 12 > len(payload):
            raise ValueError("truncated TFRecord header")
        hdr = payload[pos : pos + 8]
        (length,) = struct.unpack("<Q", hdr)
        (hcrc,) = struct.unpack("<I", payload[pos + 8 : pos + 12])
        if _masked_crc(hdr) != hcrc:
            raise ValueError(f"record {idx}: length CRC mismatch")
        data = payload[pos + 12 : pos + 12 + length]
        if len(data) != length or pos + 16 + length > len(payload):
            raise ValueError(f"record {idx}: truncated data or footer")
        (dcrc,) = struct.unpack(
            "<I", payload[pos + 12 + length : pos + 16 + length]
        )
        if _masked_crc(data) != dcrc:
            raise ValueError(f"record {idx}: data CRC mismatch")
        pos += 16 + length

        n_features = 0
        text_tokens = None
        label = None
        emb_dim = None
        for f, _wt, v in _wire_fields(data):
            if f != 1:
                continue  # Example.features is field 1
            for f2, _wt2, entry in _wire_fields(v):
                if f2 != 1:
                    continue  # Features.feature map entries
                n_features += 1
                name = b""
                feature = b""
                for f3, _wt3, v3 in _wire_fields(entry):
                    if f3 == 1:
                        name = v3
                    elif f3 == 2:
                        feature = v3
                for f4, wt4, v4 in _wire_fields(feature):
                    if f4 == 1 and name == b"text":  # BytesList
                        for f5, _w5, s in _wire_fields(v4):
                            if f5 == 1:
                                text_tokens = len(s.split())
                    elif f4 == 3 and name == b"label":  # Int64List packed
                        for f5, w5, v5 in _wire_fields(v4):
                            if f5 == 1:
                                vals = []
                                if w5 == 2:
                                    p2 = 0
                                    while p2 < len(v5):
                                        x, p2 = _read_varint(v5, p2)
                                        vals.append(x)
                                else:
                                    vals.append(v5)
                                label = vals[0] if vals else None
                    elif f4 == 2 and name == b"emb":  # FloatList packed
                        for f5, w5, v5 in _wire_fields(v4):
                            if f5 == 1 and w5 == 2:
                                emb_dim = len(v5) // 4
                            elif f5 == 1:
                                emb_dim = (emb_dim or 0) + 1
        rows.append((idx, n_features, text_tokens, label, emb_dim))
        idx += 1
    return rows


TFRECORD_SCHEMA = (
    "media_id long, rec_idx int, n_features int, text_tokens int, "
    "label int, emb_dim int"
)


def tfrecord_examples(media: DataFrame) -> DataFrame:
    """Per-record Example summary from TFRecord payloads via
    ``mapInPandas`` — CRC-verified framing plus a wire-format feature
    walk. Per-row Arrow work, linear by construction."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                for row in parse_tfrecord(bytes(p)):
                    out.append((mid, *row))
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id", "rec_idx", "n_features", "text_tokens",
                    "label", "emb_dim",
                ],
            )

    return media.select("media_id", "payload").mapInPandas(
        batches, schema=TFRECORD_SCHEMA
    )
