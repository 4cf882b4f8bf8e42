"""Multimodal (binary media) column operators.

Treats image/audio/video payloads as opaque ``binary`` columns with typed
metadata, processed in Arrow-batched Pandas UDFs via ``mapInPandas`` — the
Spark-side plumbing (schema, partitioning, batch shape) is real and tested;
the actual codec step is a clearly-marked stub because media libraries are
not available in this environment (and at 100 TB you would vendor them onto
executors, not the driver).

Pattern: metadata extraction stays in Catalyst expressions (zero-copy,
pushdown-friendly); per-payload decode/resize/frame-sample runs in
``mapInPandas`` so each Python task sees a whole Arrow batch of payloads at
once (never row-at-a-time).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("mime", StringType()),
        StructField("n_bytes", LongType()),
        StructField("sha", StringType()),
    ]
)

DECODED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("mime", StringType()),
        StructField("n_bytes", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
    ]
)


def to_media_table(df: DataFrame, id_col: str, payload: Column, mime: str) -> DataFrame:
    """Wrap an arbitrary source column as the canonical media table:
    (media_id, payload binary, mime, n_bytes, sha). Metadata is computed
    JVM-side — no Python touches the payload bytes here."""
    p = payload.cast("binary")
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        p.alias("payload"),
        F.lit(mime).alias("mime"),
        F.length(p).cast("long").alias("n_bytes"),
        F.sha2(p, 256).alias("sha"),
    )


def _decode_stub(payload: bytes, mime: str) -> tuple[int, int, int]:
    """STUB codec. A real deployment plugs Pillow/ffmpeg here:

        raise NotImplementedError("vendor image/audio codecs on executors")

    For testable plumbing we derive deterministic fake dimensions from the
    payload length so the full Spark pipeline (schema, batching, partition
    behavior) runs end-to-end."""
    n = len(payload)
    return (n % 640 + 1, n % 480 + 1, n % 30 + 1)


def decode_media(media: DataFrame, batch_note: str = "arrow") -> DataFrame:
    """Decode/feature-extract media payloads with ``mapInPandas``.

    Each Python worker receives Arrow record batches; the loop below is
    per-batch vectorizable (a real codec would hand the whole batch to a C
    library). Output drops the payload — decoded features only, so the heavy
    binary column never shuffles."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            dims = [_decode_stub(p, m) for p, m in zip(pdf["payload"], pdf["mime"])]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": pdf["mime"],
                    "n_bytes": pdf["n_bytes"],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                    "n_frames": [d[2] for d in dims],
                }
            )

    return media.mapInPandas(batches, schema=DECODED_SCHEMA)


def frame_sample(decoded: DataFrame, every_nth: int = 10) -> DataFrame:
    """Frame sampling plan: one row per sampled frame index — pure Catalyst
    ``sequence`` + ``explode``, no Python."""
    return decoded.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_nth))
        ).alias("frame_idx"),
    )
