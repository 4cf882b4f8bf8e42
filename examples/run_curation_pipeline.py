"""End-to-end training-data curation demo over the documents/embeddings tables.

The pipeline a 100 TB pre-training data job runs, at fixture scale:

  1. exact dedup        md5 grouping — drop byte-identical copies
  1b. domain cap        deterministic hash-rank cap per source — no single
                        domain may dominate the corpus
  2. near-dup dedup     doc-local MinHash pass -> LSH band candidates ->
                        exact-Jaccard verify -> connected components ->
                        keep the smallest doc id per cluster
  2b. span dedup        duplicated word-8-gram removal across the survivors
                        (boilerplate kept only at its first occurrence)
  2c. decontamination   cross-corpus MinHash+LSH: the held-out eval slice
                        (source src0) leaves the corpus, and training docs
                        near-duplicating any eval doc are dropped
  3. embedding near-dup exact cosine pairs via the symmetric block grid
                        (reported, not dropped — threshold is corpus-tuned)
  4. quality gating     C4/Gopher-style feature filter (token count, ratios)
  5. language filter    n-gram-marker language ID
  6. PII scrub          email/phone/digit-run placeholder rewrite
  7. sampling + split   importance-weighted keep (p ∝ token count) + hash
                        train/val/test
  8. fingerprint stamp  60-bit content fingerprint for provenance joins
  9. model score gate   logistic quality score (sigmoid over the features)
 10. chunk + pack       64-token overlapping chunks; language-sharded
                        prefix-sum packing into ~256-token sequences

Every stage is a declarative DataFrame transform (the same operators the
oracle-checked catalog entries run); the output is a curated parquet corpus
partitioned by split.

Usage: PYTHONPATH=/root/repo python3 examples/run_curation_pipeline.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from flink_gmall2024_realtime_spark.operators import dedup, text
from flink_gmall2024_realtime_spark.operators.sampling import hash_split
from flink_gmall2024_realtime_spark.session import get_spark
from flink_gmall2024_realtime_spark.sources.fixtures import load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="curated_")
    spark = get_spark("curation-pipeline")
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, sf_dir, "documents")
    n0 = docs.count()

    # 1. exact dedup: keep each content hash's smallest doc_id
    keepers = dedup.exact_dedup(docs).select(F.col("keep_id").alias("doc_id"))
    docs1 = docs.join(keepers, "doc_id")

    # 1b. domain cap: at most 200 docs per source, hash-rank selected
    # (WindowGroupLimit keeps the per-group limit map-side)
    from flink_gmall2024_realtime_spark.operators.sampling import domain_cap

    docs1 = domain_cap(docs1, "source", "doc_id", cap=200).drop("keep_rank")

    # 2. near-dup dedup: MinHash+LSH verified pairs -> components -> keep policy
    pairs = dedup.minhash_lsh_pairs(docs1, threshold=0.35)
    clusters = dedup.dedup_clusters(docs1, pairs)
    # checkpoint: docs2 feeds four downstream branches (features, lang,
    # gating, model score) — materializing here avoids recomputing the
    # dedup lineage per branch AND keeps each later stage's generated code
    # under the JVM 64 KB method limit (one giant fused stage falls back
    # to interpreted execution)
    docs2 = (
        docs1.join(clusters, "doc_id")
        .filter(F.col("doc_id") == F.col("cluster_id"))
        .drop("cluster_id")
    ).localCheckpoint(eager=True)

    # 2b. span dedup across the survivors: duplicated 8-gram boilerplate is
    # kept only at its first corpus-wide occurrence; documents continue with
    # their cleaned text (the checkpoint bounds the gram-election lineage)
    spans = dedup.duplicate_span_removal(docs2, width=8)
    span_removed = spans.agg(F.sum("removed_tokens").alias("s")).collect()[0]["s"] or 0
    docs2 = (
        docs2.drop("text")
        .join(spans.select("doc_id", F.col("clean_text").alias("text")), "doc_id")
        .localCheckpoint(eager=True)
    )

    # 2c. decontamination: source 'src0' plays the held-out eval set — it
    # leaves the corpus entirely, and any surviving training doc that
    # near-duplicates an eval doc is dropped (document-level contamination;
    # the fingerprint-overlap span-level check is text.decontamination)
    eval_docs = docs2.filter(F.col("source") == "src0")
    train_side = docs2.filter(F.col("source") != "src0")
    contam = (
        dedup.minhash_lsh_pairs_cross(eval_docs, train_side, threshold=0.35)
        .select(F.col("corpus_id").alias("doc_id"))
        .distinct()
    )
    n_contam = contam.count()
    docs2 = train_side.join(contam, "doc_id", "left_anti").localCheckpoint(eager=True)

    # 3. embedding near-dups (report only at fixture scale — no planted dups)
    emb = load_table(spark, sf_dir, "embeddings")
    emb_pairs = dedup.embedding_cosine_pairs(emb, threshold=0.4).count()

    # 4-5. quality + language gates — ONE enrichment pass (features joined,
    # lang-id as a column), then a trivial filter. Fusing a second join and
    # the filter into the same whole-stage-codegen method pushed the
    # generated processNext() past the JVM's 64 KB limit (Spark falls back
    # to interpreted execution — correct but off the codegen fast path);
    # this shape compiles, and the checkpoint keeps the downstream
    # scrub/fingerprint stage's method small too.
    feats = text.quality_features(docs2)
    enriched = (
        docs2.join(
            feats.select("doc_id", "n_tokens", "alpha_ratio", "stopword_ratio"),
            "doc_id",
        ).withColumn("lang_pred", text.lang_id(F.col("text")))
    ).localCheckpoint(eager=True)
    gated = enriched.filter(
        (F.col("n_tokens") >= 5)
        & (F.col("alpha_ratio") >= 0.5)
        & (F.col("lang_pred") != "und")
    )

    # 5b. perplexity-style boilerplate gate: corpus-trained bigram LM —
    # docs whose bigrams are near-perfectly predictable (mean conditional
    # probability ~1) are templates/repeats; drop the extreme tail
    lm = text.bigram_lm_score(gated)
    predictable = lm.filter(F.col("pred_score") / F.col("n_bigrams") > 0.98).select("doc_id")
    n_boiler = predictable.count()
    gated = gated.join(predictable, "doc_id", "left_anti")

    # 6-8. scrub, importance-weighted downsample, split, stamp — the keep
    # coin is a hash with p ∝ token count, so longer (information-denser)
    # docs survive preferentially and membership is replay-reproducible
    from flink_gmall2024_realtime_spark.operators.sampling import importance_sample

    curated = (
        gated.select(
            "doc_id",
            text.scrub_pii(F.col("text")).alias("text"),
            "lang",
            "n_tokens",
            text.fingerprint(F.col("text")).alias("content_fp"),
        )
        .transform(lambda df: importance_sample(df, "doc_id", "n_tokens", 0.85))
        .drop("keep_p")
        .transform(lambda df: hash_split(df, "doc_id"))
    )
    curated.write.mode("overwrite").partitionBy("split").parquet(os.path.join(out_dir, "corpus"))

    # 9-10. model score gate, then chunk + pack the train split into
    # sequences — reading back the corpus just written: a real pipeline
    # stages through storage here, and chaining the whole lineage into one
    # stage pushes whole-stage codegen past the JVM's 64 KB method limit
    # (Spark falls back to interpreted — correct but slow)
    curated = spark.read.parquet(os.path.join(out_dir, "corpus"))
    scored = curated.join(
        text.quality_model_score(docs2).filter("keep").select("doc_id"), "doc_id"
    )
    train = scored.filter(F.col("split") == "train")
    chunks = text.chunk_documents(train, chunk_tokens=64, overlap=16)
    packed = text.pack_sequences(train, cap_tokens=256, shard_col="lang")
    chunks.write.mode("overwrite").parquet(os.path.join(out_dir, "chunks"))
    packed.write.mode("overwrite").parquet(os.path.join(out_dir, "sequences"))

    back = spark.read.parquet(os.path.join(out_dir, "corpus"))
    per_split = {r["split"]: r["ct"] for r in back.groupBy("split").agg(F.count(F.lit(1)).alias("ct")).collect()}
    print(
        f"corpus: {n0} -> exact-dedup+domain-cap {docs1.count()} -> near-dup+decontam {docs2.count()}"
        f" (span-dedup removed {span_removed} tokens; {n_contam} contaminated train docs dropped)"
        f" -> gated {gated.count()} (bigram-LM boilerplate gate dropped {n_boiler});"
        f" embedding near-dup pairs reported: {emb_pairs}"
    )
    print(f"curated splits: {per_split}")
    print(
        f"model-gated train docs: {train.count()}, chunks: {chunks.count()}, "
        f"packed bins: {packed.select('lang', 'bin_id').distinct().count()}"
    )
    print(f"curated corpus at {out_dir}/corpus (+ chunks/, sequences/)")
    spark.stop()


if __name__ == "__main__":
    main()
