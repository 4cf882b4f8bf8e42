"""Adversarial-flood survival for the STREAMING twins (VERDICT r5 #6):
drive the stateful sinks with a flooded stream SPLIT ACROSS micro-batches —
the input shape the batch-side adversarial harness cannot express, because
there the flood arrives all at once and the per-batch caps/collapses never
face a store already saturated with it.

Per sink, the flood is built with ``sources/scaling.py``'s adversarial
fixtures (dup_corpus / fat_cell / hot_key) and dealt into B batches by id
hash, so every batch both carries new flood rows AND collides with the
flood already resident in the store. The survival claim is per-batch wall
boundedness: batch b's wall must be governed by (batch size + true output),
never by re-scanning the resident flood — a linear-in-store regression
shows up as the LAST batch's wall exploding relative to the first.

Usage:
    PYTHONPATH=. python tools/streaming_adv_bench.py \
        [--sf-dir /root/testdata/sf0.01] [--multiplier 10] [--batches 5] \
        [--sinks lsh,semantic,cm]

Prints one JSON object: per-sink per-batch walls, emitted/stored row
counts. Note the true output CAN grow per batch (a flood copy arriving in
batch b legitimately pairs with every resident copy); the boundedness
claim is about join/scan volume, so each sink also reports rows_emitted
per batch — wall growth tracking output growth is healthy, wall growth
without output growth is the regression.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from flink_gmall2024_realtime_spark.session import get_spark
from flink_gmall2024_realtime_spark.sources import scaling
from flink_gmall2024_realtime_spark.streaming import sinks


def _batches(df, id_col: str, n: int):
    return [
        df.filter(F.pmod(F.xxhash64(id_col), F.lit(n)) == b).localCheckpoint(eager=True)
        for b in range(n)
    ]


def run_lsh(spark, sf_dir: str, m: int, n_batches: int, work: str) -> dict:
    flood_dir = os.path.join(work, "lsh_flood")
    scaling.build_adversarial_dir(
        spark, sf_dir, flood_dir, "dup_corpus", m, tables=("documents",)
    )
    docs = spark.read.parquet(os.path.join(flood_dir, "documents.parquet")).select(
        "doc_id", "text"
    )
    idx, prs = os.path.join(work, "lsh_i"), os.path.join(work, "lsh_p")
    write = sinks.lsh_dedup_sink(spark, idx, prs)
    out: dict = {"walls": [], "rows_emitted": []}
    for b, batch in enumerate(_batches(docs, "doc_id", n_batches)):
        t0 = time.perf_counter()
        write(batch, b)
        out["walls"].append(round(time.perf_counter() - t0, 3))
        out["rows_emitted"].append(
            spark.read.parquet(os.path.join(prs, "data", f"batch={b}")).count()
        )
    bands = spark.read.schema(sinks.BANDS_SCHEMA).parquet(
        os.path.join(idx, "bands", "batch=*", "p=*")
    )
    out["store_band_rows"] = bands.count()
    out["store_band_rows_uncollapsed_would_be"] = docs.count() * 32
    return out


def run_semantic(spark, sf_dir: str, m: int, n_batches: int, work: str) -> dict:
    from flink_gmall2024_realtime_spark.operators import similarity

    flood_dir = os.path.join(work, "sem_flood")
    scaling.build_adversarial_dir(
        spark, sf_dir, flood_dir, "fat_cell", m, tables=("embeddings",)
    )
    emb = spark.read.parquet(os.path.join(flood_dir, "embeddings.parquet")).select(
        "vec_id", "embedding"
    )
    base = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet")).select(
        "vec_id", "embedding"
    )
    ids, cen_micro = similarity.kmeans_centroids_micro(base, k=8, iters=3)
    centroids = (ids, cen_micro / 1e6)
    idx, prs = os.path.join(work, "sem_i"), os.path.join(work, "sem_p")
    write = sinks.semantic_dedup_sink(spark, centroids, idx, prs, threshold=0.4)
    out: dict = {"walls": [], "rows_emitted": []}
    for b, batch in enumerate(_batches(emb, "vec_id", n_batches)):
        t0 = time.perf_counter()
        write(batch, b)
        out["walls"].append(round(time.perf_counter() - t0, 3))
        out["rows_emitted"].append(
            spark.read.parquet(os.path.join(prs, "data", f"batch={b}")).count()
        )
    cells = spark.read.schema(sinks.CELLS_SCHEMA).parquet(
        os.path.join(idx, "cells", "batch=*", "c=*")
    )
    out["store_cell_rows"] = cells.count()
    return out


def run_cm(spark, sf_dir: str, m: int, n_batches: int, work: str) -> dict:
    flood_dir = os.path.join(work, "cm_flood")
    scaling.build_adversarial_dir(
        spark, sf_dir, flood_dir, "hot_key", m, tables=("events",)
    )
    ev = spark.read.parquet(os.path.join(flood_dir, "events.parquet")).select(
        "event_id", "user_id"
    )
    store = os.path.join(work, "cm_store")
    write = sinks.cm_sketch_sink(spark, store, "user_id")
    out: dict = {"walls": []}
    for b, batch in enumerate(_batches(ev, "event_id", n_batches)):
        t0 = time.perf_counter()
        write(batch, b)
        out["walls"].append(round(time.perf_counter() - t0, 3))
    out["store_rows"] = spark.read.parquet(os.path.join(store, "table")).count()
    return out


def run_pq(spark, sf_dir: str, m: int, n_batches: int, work: str) -> dict:
    """fat_cell flood through pq_index_sink: the codebook is trained ONCE
    on the base corpus (frozen — the sink's contract), then (m-1)x copies
    of one vector arrive across batches. Encoding is a per-row map against
    the broadcast codebook, so per-batch wall must track batch size only —
    the store is append-per-batch and never re-scanned."""
    from flink_gmall2024_realtime_spark.operators import similarity

    base = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet")).select(
        "vec_id", "embedding"
    )
    cb = similarity.pq_codebook(base)
    flood_dir = os.path.join(work, "pq_flood")
    scaling.build_adversarial_dir(
        spark, sf_dir, flood_dir, "fat_cell", m, tables=("embeddings",)
    )
    emb = spark.read.parquet(os.path.join(flood_dir, "embeddings.parquet")).select(
        "vec_id", "embedding"
    )
    index_path = os.path.join(work, "pq_index")
    write = sinks.pq_index_sink(spark, index_path, cb)
    out: dict = {"walls": []}
    for b, batch in enumerate(_batches(emb, "vec_id", n_batches)):
        t0 = time.perf_counter()
        write(batch, b)
        out["walls"].append(round(time.perf_counter() - t0, 3))
    out["store_rows"] = spark.read.parquet(
        os.path.join(index_path, "codes")
    ).count()
    out["input_rows"] = emb.count()
    return out


def run_aggview(spark, sf_dir: str, m: int, n_batches: int, work: str) -> dict:
    """hot_key flood through agg_view_sink as a signed changelog: every
    third flood row is a retract (-1) of the same key, so the store must
    both absorb ~(m-1)/m of the stream onto ONE user_id group and delete
    net-zero groups. Per-batch wall = batch partial agg + O(groups) store
    merge — never O(resident stream)."""
    flood_dir = os.path.join(work, "aggview_flood")
    scaling.build_adversarial_dir(
        spark, sf_dir, flood_dir, "hot_key", m, tables=("events",)
    )
    ev = (
        spark.read.parquet(os.path.join(flood_dir, "events.parquet"))
        .select(
            "event_id",
            "user_id",
            F.coalesce(F.col("value"), F.lit(0.0)).alias("value"),
            F.when(F.pmod(F.col("event_id"), F.lit(3)) == 0, F.lit(-1))
            .otherwise(F.lit(1))
            .alias("_w"),
        )
    )
    store = os.path.join(work, "aggview_store")
    write = sinks.agg_view_sink(spark, store, ["user_id"], {"sum_value": "value"})
    out: dict = {"walls": [], "store_rows": []}
    for b, batch in enumerate(_batches(ev, "event_id", n_batches)):
        t0 = time.perf_counter()
        write(batch, b)
        out["walls"].append(round(time.perf_counter() - t0, 3))
        out["store_rows"].append(
            spark.read.parquet(os.path.join(store, "table")).count()
        )
    return out


def run_hdr(spark, sf_dir: str, m: int, n_batches: int, work: str) -> dict:
    """hot_key flood through hdr_hist_sink: the flood lands on one user but
    the histogram state is O(groups x buckets) regardless — per-batch wall
    must stay flat while the resident mass grows every batch."""
    flood_dir = os.path.join(work, "hdr_flood")
    scaling.build_adversarial_dir(
        spark, sf_dir, flood_dir, "hot_key", m, tables=("events",)
    )
    ev = spark.read.parquet(os.path.join(flood_dir, "events.parquet")).select(
        "event_id", "event_type", F.coalesce(F.col("value"), F.lit(0.0)).alias("value")
    )
    store = os.path.join(work, "hdr_store")
    write = sinks.hdr_hist_sink(spark, store, "event_type", "value")
    out: dict = {"walls": []}
    for b, batch in enumerate(_batches(ev, "event_id", n_batches)):
        t0 = time.perf_counter()
        write(batch, b)
        out["walls"].append(round(time.perf_counter() - t0, 3))
    out["store_rows"] = spark.read.parquet(os.path.join(store, "table")).count()
    return out


RUNNERS = {
    "lsh": run_lsh,
    "semantic": run_semantic,
    "cm": run_cm,
    "pq": run_pq,
    "aggview": run_aggview,
    "hdr": run_hdr,
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--multiplier", type=int, default=10)
    ap.add_argument("--batches", type=int, default=5)
    ap.add_argument("--sinks", default="lsh,semantic,cm,pq,aggview,hdr")
    args = ap.parse_args()

    spark = get_spark("gmall-streaming-adv")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="stream_adv_")
    result: dict = {
        "sf_dir": args.sf_dir,
        "multiplier": args.multiplier,
        "batches": args.batches,
        "sinks": {},
    }
    try:
        for name in args.sinks.split(","):
            t0 = time.perf_counter()
            result["sinks"][name] = RUNNERS[name](
                spark, args.sf_dir, args.multiplier, args.batches, work
            )
            print(f"# {name}: {time.perf_counter() - t0:.1f}s total", file=sys.stderr)
        print(json.dumps(result))
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
