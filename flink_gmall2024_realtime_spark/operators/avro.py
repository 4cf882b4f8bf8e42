"""Avro object-container ingestion — the schema'd interchange format.

Kafka pipelines, Iceberg manifests and many dataset drops ship Avro
object container files (OCF). The format is fully self-describing — the
writer schema travels as JSON in the file header and the binary encoding
is zigzag varints + length-prefixed bytes + explicit union branches, with
NO fixed entropy tables — so, like the in-repo TFRecord/WARC gates, a
faithful reader is derivable from the public specification alone and the
fixture writer is the same-spec inverse (corruption tests + the sync-
marker / codec / count cross-checks keep both honest).

Implemented: header (magic ``Obj\\x01``, metadata map with
``avro.schema``/``avro.codec``, 16-byte sync marker), data blocks
(record-count + byte-size varints, per-block sync verification), codecs
``null``, ``deflate`` (raw, stdlib zlib) and ``snappy`` (the REPO'S OWN
decoder + the spec's trailing 4-byte big-endian CRC32 of the
uncompressed block), and the binary decoders for null / boolean / int /
long (zigzag) / float / double / string / bytes / enum / fixed / array
(incl. negative-count-with-size blocks) / map / union / nested record.

Reference scope note: the reference app (hellohappyworld/
flink-gmall2024-realtime) has no interchange-file path; this is part of
the beyond-reference LLM-data-pipeline surface the build brief asks for.
"""

from __future__ import annotations

import json
import struct
import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from .codecguard import malformed_guard

_MAGIC = b"Obj\x01"


class _Reader:
    __slots__ = ("d", "i")

    def __init__(self, data: bytes) -> None:
        self.d = data
        self.i = 0

    def read(self, n: int) -> bytes:
        out = self.d[self.i : self.i + n]
        if len(out) < n:
            raise ValueError("truncated avro data")
        self.i += n
        return out

    def varint(self) -> int:
        v = 0
        shift = 0
        while True:
            b = self.d[self.i : self.i + 1]
            if not b:
                raise ValueError("truncated avro varint")
            self.i += 1
            v |= (b[0] & 0x7F) << shift
            if not b[0] & 0x80:
                return v
            shift += 7
            if shift > 70:
                raise ValueError("runaway avro varint")

    def zigzag(self) -> int:
        v = self.varint()
        return (v >> 1) ^ -(v & 1)

    def at_end(self) -> bool:
        return self.i >= len(self.d)


def _decode(r: _Reader, schema) -> object:
    """Decode one datum of ``schema`` (parsed JSON: str primitive, dict
    complex, list union)."""
    if isinstance(schema, list):  # union: zigzag branch index
        idx = r.zigzag()
        if not 0 <= idx < len(schema):
            raise ValueError(f"avro union branch {idx} out of range")
        return _decode(r, schema[idx])
    if isinstance(schema, dict):
        t = schema["type"]
        if t == "record":
            return {f["name"]: _decode(r, f["type"]) for f in schema["fields"]}
        if t == "array":
            out = []
            while True:
                n = r.zigzag()
                if n == 0:
                    return out
                if n < 0:  # negative count: a byte size follows (skippable form)
                    r.zigzag()
                    n = -n
                if n > len(r.d) + (1 << 16):
                    raise ValueError("avro array count exceeds payload")
                out.extend(_decode(r, schema["items"]) for _ in range(n))
        if t == "map":
            out = {}
            while True:
                n = r.zigzag()
                if n == 0:
                    return out
                if n < 0:
                    r.zigzag()
                    n = -n
                if n > len(r.d) + (1 << 16):
                    raise ValueError("avro map count exceeds payload")
                for _ in range(n):
                    k = r.read(r.zigzag()).decode("utf-8")
                    out[k] = _decode(r, schema["values"])
        if t == "enum":
            idx = r.zigzag()
            syms = schema["symbols"]
            if not 0 <= idx < len(syms):
                raise ValueError(f"avro enum index {idx} out of range")
            return syms[idx]
        if t == "fixed":
            return r.read(schema["size"])
        schema = t  # e.g. {"type": "string"} wrapper
    if schema == "null":
        return None
    if schema == "boolean":
        return r.read(1) != b"\x00"
    if schema in ("int", "long"):
        return r.zigzag()
    if schema == "float":
        return struct.unpack("<f", r.read(4))[0]
    if schema == "double":
        return struct.unpack("<d", r.read(8))[0]
    if schema in ("string", "bytes"):
        b = r.read(r.zigzag())
        return b.decode("utf-8") if schema == "string" else b
    raise NotImplementedError(f"avro type {schema!r}")


@malformed_guard
def parse_avro(payload: bytes) -> tuple[dict, list]:
    """Read an Avro OCF: returns (header metadata dict, list of decoded
    records). Every block's sync marker is verified; snappy blocks also
    verify the spec's trailing CRC32."""
    r = _Reader(payload)
    if r.read(4) != _MAGIC:
        raise ValueError("not an avro object container (magic)")
    meta: dict = {}
    while True:
        n = r.zigzag()
        if n == 0:
            break
        if n < 0:
            r.zigzag()
            n = -n
        for _ in range(n):
            k = r.read(r.zigzag()).decode("utf-8")
            meta[k] = r.read(r.zigzag())
    sync = r.read(16)
    schema = json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", b"null").decode()
    records = []
    while not r.at_end():
        count = r.zigzag()
        size = r.zigzag()
        block = r.read(size)
        if r.read(16) != sync:
            raise ValueError("avro block sync marker mismatch")
        if codec == "null":
            data = block
        elif codec == "deflate":
            from .fastpath import fast_decoder

            data = fast_decoder("deflate_raw")(block)
        elif codec == "snappy":
            from .fastpath import fast_decoder

            data = fast_decoder("snappy")(block[:-4])
            (want,) = struct.unpack(">I", block[-4:])
            if (zlib.crc32(data) & 0xFFFFFFFF) != want:
                raise ValueError("avro snappy block CRC mismatch")
        elif codec == "zstandard":
            from .fastpath import fast_decoder

            data = fast_decoder("zstd")(block)
        elif codec == "bzip2":
            from .fastpath import fast_decoder

            data = fast_decoder("bz2")(block)
        elif codec == "xz":
            from .fastpath import fast_decoder

            data = fast_decoder("xz")(block)
        else:
            raise NotImplementedError(f"avro codec {codec!r}")
        br = _Reader(data)
        for _ in range(count):
            records.append(_decode(br, schema))
        if not br.at_end():
            raise ValueError("trailing bytes in avro block")
    return meta, records


_FIXTURE_SCHEMA = {
    "type": "record",
    "name": "Doc",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "text", "type": "string"},
        {"name": "labels", "type": {"type": "array", "items": "long"}},
        {"name": "score", "type": ["null", "double"]},
    ],
}


def _zz(v: int) -> bytes:
    u = (v << 1) ^ (v >> 63) if v < 0 else v << 1
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def synth_avro(seed: int) -> bytes:
    """Deterministic Avro OCF: n = seed%25+5 Doc records (id, text of
    m = (seed+5k)%10+2 tokens, labels array of k%4 longs, nullable score
    present when (seed+k)%3 != 0), split into 2 blocks, codec cycling
    null/deflate/snappy/zstandard/bzip2/xz by seed%6 (the full codec
    suite the Avro 1.11 spec names, each decoding through the repo's
    fast-path dispatch with the in-repo spec decoders as oracle)."""
    seed = int(seed)
    n = seed % 25 + 5
    codec = ["null", "deflate", "snappy", "zstandard", "bzip2", "xz"][seed % 6]

    def enc_record(k: int) -> bytes:
        m = (seed + 5 * k) % 10 + 2
        text = " ".join(f"w{j:02d}" for j in range(m)).encode()
        out = bytearray(_zz(seed * 1000 + k))
        out += _zz(len(text)) + text
        n_labels = k % 4
        if n_labels:
            out += _zz(n_labels)
            for j in range(n_labels):
                out += _zz(seed + k + j)
        out += _zz(0)  # array end
        if (seed + k) % 3 != 0:
            out += _zz(1) + struct.pack("<d", float(k) / 2)
        else:
            out += _zz(0)  # null branch
        return bytes(out)

    sync = bytes((seed * 7 + i) % 256 for i in range(16))
    meta_entries = {
        "avro.schema": json.dumps(_FIXTURE_SCHEMA, separators=(",", ":")).encode(),
        "avro.codec": codec.encode(),
    }
    out = bytearray(_MAGIC)
    out += _zz(len(meta_entries))
    for k, v in meta_entries.items():
        out += _zz(len(k)) + k.encode() + _zz(len(v)) + v
    out += _zz(0)
    out += sync
    half = (n + 1) // 2
    for lo, hi in ((0, half), (half, n)):
        if hi <= lo:
            continue
        data = b"".join(enc_record(k) for k in range(lo, hi))
        if codec == "deflate":
            co = zlib.compressobj(6, zlib.DEFLATED, -15)
            block = co.compress(data) + co.flush()
        elif codec == "snappy":
            import pyarrow as pa

            block = bytes(pa.Codec("snappy").compress(data))
            block += struct.pack(">I", zlib.crc32(data) & 0xFFFFFFFF)
        elif codec == "zstandard":
            import pyarrow as pa

            block = bytes(pa.Codec("zstd").compress(data))
        elif codec == "bzip2":
            import bz2 as _bz2

            block = _bz2.compress(data, 1)
        elif codec == "xz":
            import lzma as _lzma

            block = _lzma.compress(data, format=_lzma.FORMAT_XZ, preset=1)
        else:
            block = data
        out += _zz(hi - lo) + _zz(len(block)) + block + sync
    return bytes(out)


AVRO_SCHEMA = (
    "media_id long, n_records int, n_tokens long, n_labels long, "
    "n_scored int, codec string"
)


def avro_doc_stats(media: DataFrame) -> DataFrame:
    """Per-container stats after a REAL in-repo Avro decode (sync + codec
    CRC verified): record/token/label counts, how many carry the nullable
    score, and the block codec. Per-row Arrow work, linear by
    construction."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                meta, recs = parse_avro(bytes(p))
                rows.append(
                    (
                        mid,
                        len(recs),
                        sum(len(r["text"].split()) for r in recs),
                        sum(len(r["labels"]) for r in recs),
                        sum(1 for r in recs if r["score"] is not None),
                        meta.get("avro.codec", b"null").decode(),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "n_records", "n_tokens", "n_labels",
                    "n_scored", "codec",
                ],
            )

    return media.select("media_id", "payload").mapInPandas(
        batches, schema=AVRO_SCHEMA
    )
