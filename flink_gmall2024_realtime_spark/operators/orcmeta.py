"""ORC footer audit — the other columnar-lake format, read raw.

Mirrors the parquet footer audit with ORC's layout: a 1-byte postscript
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

Conformance anchor: REAL pyarrow-written ORC bytes (the bundled C++
writer) across all five compression kinds; pytest cross-checks
``pyarrow.orc.ORCFile`` introspection on arbitrary shapes.

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
            out += zlib.decompress(chunk, -15)
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
