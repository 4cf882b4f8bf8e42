"""Deduplication operators for large-scale training-data pipelines.

Exact and near-duplicate detection over a ``documents(doc_id, text, ...)``
table, designed for the 100 TB case:

- **exact**: md5 grouping — one shuffle on a 128-bit hash, no text shuffle.
- **n-gram Jaccard (brute candidates)**: exact, O(pairs sharing a shingle);
  the *verification* oracle, viable at test scale only.
- **MinHash + LSH**: the scale path. Shingle -> 60-bit minhash signature ->
  band buckets -> candidate pairs ONLY within buckets -> exact Jaccard
  verify. Data volume after banding is |docs| x bands tiny rows; the
  candidate join is an equi-join on the band hash, so Catalyst
  hash-partitions it and no O(n^2) comparison ever happens.
- **SimHash**: 48-bit per-doc fingerprint; near-dups = small Hamming
  distance. Computed fully declaratively (explode token-bit matrix ->
  majority per bit -> reassemble).

All hashes are md5-derived (``functions.md5_long``) so the DuckDB oracle can
reproduce every value bit-for-bit — at production scale you would swap in
xxhash64 via one line without changing any plan shape.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import md5_long, normalize_text, tokenize

# MinHash parameterization: 2-row-per-band at 64 perms gives ~100% recall at
# Jaccard >= 0.35 (P[miss] = (1 - j^2)^32; j=0.35 -> 1.6%, j=0.5 -> 0.02%).
# Mersenne prime 2^31-1: shingle hashes are 28-bit, so (a*h + b) stays well
# under 2^63 (no overflow in either Spark or DuckDB 64-bit arithmetic) while
# the mod genuinely wraps (a*h can exceed p many times over).
MINHASH_PERMS = 64
LSH_BAND_ROWS = 2
MERSENNE_P = (1 << 31) - 1


def shingles(text: Column, n: int = 3) -> Column:
    """Distinct n-gram (word-level) shingle array of a document."""
    toks = tokenize(text)
    idx = F.sequence(F.lit(0), F.size(toks) - n)
    return F.array_distinct(
        F.transform(
            idx,
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, (i + j + 1).cast("int")) for j in range(n)]
            ),
        )
    )


def exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup: group by content hash, keep the smallest id.

    Output: (content_hash, keep_id, dup_ct). Only the 32-char hash shuffles,
    not the documents."""
    return (
        docs.select(F.md5(F.col(text_col)).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("dup_ct"))
    )


def _doc_shingles(docs: DataFrame, text_col: str, id_col: str, n: int) -> DataFrame:
    """Distinct (doc_id, shingle) rows.

    Deliberately NOT the array-transform formulation (``shingles()``): Spark's
    higher-order functions run interpreted per element, which measured ~4x
    slower than this posexplode + window-lead plan, whose expressions all stay
    in whole-stage codegen. Same output set."""
    from pyspark.sql import Window

    from ..functions import TOKEN_SPLIT_RE

    toks = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.posexplode(F.split(F.trim(F.col(text_col)), TOKEN_SPLIT_RE)).alias("pos", "tok"),
        )
        .filter(F.col("tok") != "")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    leads = toks.select(
        "doc_id",
        "tok",
        *[F.lead("tok", j).over(w).alias(f"_t{j}") for j in range(1, n)],
    )
    shingle = F.concat_ws(" ", F.col("tok"), *[F.col(f"_t{j}") for j in range(1, n)])
    return (
        leads.filter(F.col(f"_t{n-1}").isNotNull())
        .select("doc_id", shingle.alias("shingle"))
        .distinct()
    )


def jaccard_pairs_brute(
    docs: DataFrame,
    threshold: float = 0.35,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs via shared-shingle candidates.

    Candidate pairs = pairs sharing >= 1 shingle (a self equi-join on the
    shingle); Jaccard = |inter| / (|A| + |B| - |inter|). Exact but candidate
    volume scales with shingle popularity — use the MinHash path at scale.
    Output: (id_a, id_b, jaccard) with id_a < id_b, rounded to 6 dp."""
    sh = _doc_shingles(docs, text_col, id_col, n)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, on=(F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sza = sizes.select(F.col("doc_id").alias("id_a"), F.col("sz").alias("sz_a"))
    szb = sizes.select(F.col("doc_id").alias("id_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sza, "id_a")
        .join(szb, "id_b")
        .withColumn("jaccard", F.round(F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")), 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_signatures(
    docs: DataFrame,
    perms: int = MINHASH_PERMS,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-doc MinHash signature: for each permutation i,
    ``min((a_i * h + b_i) mod p)`` over 31-bit shingle hashes ``h``.

    Coefficients are fixed odd/even functions of i so the signature is fully
    deterministic and oracle-reproducible. Output: (doc_id, sig array<long>).
    One explode + one groupBy — linear in total shingle count."""
    return _signatures_from_shingles(_doc_shingles(docs, text_col, id_col, n), perms)


def _signatures_from_shingles(sh: DataFrame, perms: int) -> DataFrame:
    hashed = sh.withColumn(
        "h", md5_long(F.col("shingle"), hex_chars=7)  # 28-bit: a*h+b stays < 2^63
    )
    mins = [
        F.min((F.lit(2 * i + 1) * F.col("h") + F.lit(i * i + 1)) % F.lit(MERSENNE_P)).alias(f"m{i}")
        for i in range(perms)
    ]
    agged = hashed.groupBy("doc_id").agg(*mins)
    return agged.select("doc_id", F.array(*[f"m{i}" for i in range(perms)]).alias("sig"))


def minhash_lsh_pairs(
    docs: DataFrame,
    threshold: float = 0.35,
    perms: int = MINHASH_PERMS,
    band_rows: int = LSH_BAND_ROWS,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """MinHash+LSH near-dup pairs, exact-Jaccard verified — the scale path.

    signatures -> band each signature into ``perms/band_rows`` buckets ->
    self equi-join on (band, bucket-hash) -> distinct candidate pairs ->
    verify with exact n-gram Jaccard >= threshold. The only joins are
    equi-joins on hashes; nothing is O(n^2).

    The shingle set feeds four plan branches (signature, sizes, and both
    sides of the verification join) — persist it so tokenize+hash runs once;
    candidates are tiny relative to the corpus and broadcast explicitly."""
    sh_cached = _doc_shingles(docs, text_col, id_col, n).persist()
    sig = _signatures_from_shingles(sh_cached, perms)
    n_bands = perms // band_rows
    # Persist the banded form: it feeds both sides of the self-join (else the
    # whole signature pipeline runs twice). |docs| x bands small rows.
    bands = (
        sig.select(
            "doc_id",
            F.explode(
                F.array(*[
                    F.struct(
                        F.lit(bi).alias("band"),
                        F.concat_ws(",", *[F.col("sig")[bi * band_rows + r].cast("string") for r in range(band_rows)]).alias("bucket"),
                    )
                    for bi in range(n_bands)
                ])
            ).alias("bb"),
        )
        .select("doc_id", "bb.band", "bb.bucket")
        .persist()
    )
    l, r = bands.alias("l"), bands.alias("r")
    # Broadcast one side while the banded frame fits an executor (tens of
    # millions of docs); beyond that drop the hint and let the equi-join
    # shuffle on (band, bucket) — the plan shape is unchanged.
    cand = (
        l.join(
            F.broadcast(r),
            on=(F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(F.col("l.doc_id").alias("id_a"), F.col("r.doc_id").alias("id_b"))
        .distinct()
    )
    # Exact verification on candidates only: attach each side's shingle SET
    # (one aggregated array per doc — |docs| rows, tiny next to the exploded
    # shingle frame) to the candidate pairs and intersect per pair in one
    # Arrow batch pass. This keeps verification O(|cand| * avg-shingles)
    # instead of a |cand|-x-shingles shuffle expansion; both attach joins are
    # equi-joins on doc_id, so the shape survives any corpus size.
    import pandas as pd

    doc_sets = sh_cached.groupBy("doc_id").agg(F.collect_list("shingle").alias("shs"))
    pairs = (
        cand.join(doc_sets.select(F.col("doc_id").alias("id_a"), F.col("shs").alias("shs_a")), "id_a")
        .join(doc_sets.select(F.col("doc_id").alias("id_b"), F.col("shs").alias("shs_b")), "id_b")
    )

    def verify(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out_a, out_b, out_j = [], [], []
            for ia, ib, sa, sb in zip(pdf["id_a"], pdf["id_b"], pdf["shs_a"], pdf["shs_b"]):
                set_a, set_b = set(sa), set(sb)
                inter = len(set_a & set_b)
                union = len(set_a) + len(set_b) - inter
                # exact half-up 6dp rounding in integer arithmetic (Python's
                # round() is half-even; Spark/DuckDB round half-away)
                j = ((inter * 2_000_000 + union) // (2 * union)) / 1e6
                if j >= threshold:
                    out_a.append(ia)
                    out_b.append(ib)
                    out_j.append(j)
            yield pd.DataFrame({"id_a": out_a, "id_b": out_b, "jaccard": out_j})

    return pairs.mapInPandas(verify, "id_a long, id_b long, jaccard double")


def simhash(docs: DataFrame, bits: int = 48, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """SimHash fingerprint: bit b set iff the sum over distinct tokens of
    (+1 if token-hash bit b else -1) is positive.

    Computed declaratively: explode tokens -> per-doc popcount per bit via
    shift/mask -> reassemble. Output: (doc_id, simhash bigint)."""
    from ..functions import TOKEN_SPLIT_RE

    toks = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(F.split(F.trim(F.col(text_col)), TOKEN_SPLIT_RE)).alias("tok"),
        )
        .filter(F.col("tok") != "")
        .distinct()  # distinct tokens per doc, codegen path (no interpreted HOF)
        .withColumn("h", md5_long(F.col("tok"), hex_chars=12))  # 48-bit
    )
    bit_sums = toks.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"b{b}")
            for b in range(bits)
        ]
    )
    acc = F.lit(0).cast("long")
    for b in range(bits):
        acc = acc + F.when(F.col(f"b{b}") > 0, F.lit(1 << b).cast("long")).otherwise(F.lit(0).cast("long"))
    return bit_sums.select("doc_id", acc.alias("simhash"))


def embedding_cosine_pairs(
    emb: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (id_a < id_b, sim >= threshold).

    All-pairs within Arrow batches against the broadcast corpus matrix —
    dimension-sequential accumulation for oracle bit-parity (see
    similarity.brute_force_topk). At 100 TB the corpus matrix no longer
    broadcasts; the same emit contract then runs per LSH/IVF bucket
    (similarity.signbit_bucket) instead of per batch."""
    import numpy as np
    import pandas as pd

    rows = emb.select(id_col, vec_col).collect()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    mat = np.array([list(r[1]) for r in rows], dtype=np.float64)
    d = mat.shape[1]
    nrm = mat[:, 0] * mat[:, 0]
    for j in range(1, d):
        nrm = nrm + mat[:, j] * mat[:, j]
    nrm = np.sqrt(nrm)
    bc = emb.sparkSession.sparkContext.broadcast((ids, mat, nrm))

    def score(batches):
        ids_, mat_, nrm_ = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            cids = pdf[id_col].to_numpy(dtype=np.int64)
            cmat = np.array([list(v) for v in pdf[vec_col]], dtype=np.float64)
            acc = cmat[:, 0:1] * mat_[None, :, 0]
            for j in range(1, d):
                acc = acc + cmat[:, j : j + 1] * mat_[None, :, j]
            cn = cmat[:, 0] * cmat[:, 0]
            for j in range(1, d):
                cn = cn + cmat[:, j] * cmat[:, j]
            cn = np.sqrt(cn)
            sim = np.round(acc / (cn[:, None] * nrm_[None, :]), 6)
            li, ri = np.nonzero((sim >= threshold) & (cids[:, None] < ids_[None, :]))
            yield pd.DataFrame(
                {"id_a": cids[li], "id_b": ids_[ri], "sim": sim[li, ri]}
            )

    return emb.select(id_col, vec_col).mapInPandas(score, "id_a long, id_b long, sim double")


def dedup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    max_iter: int = 20,
) -> DataFrame:
    """Connected-components cluster assignment over near-dup pairs: every doc
    gets ``cluster_id`` = the smallest doc id reachable through the pair
    graph (singletons map to themselves). The keep-one-per-cluster dedup
    policy is then ``doc_id == cluster_id``.

    Iterative distributed label propagation (the standard Spark formulation
    for components without a graph library): each round joins current labels
    across the undirected edge set and takes the min; converges in
    O(component diameter) rounds — near-dup clusters are shallow, so a handful
    of shuffles. The loop is driver-side control flow over DataFrame ops; the
    data never leaves the cluster."""
    edges = (
        pairs.select(F.col("id_a").alias("a"), F.col("id_b").alias("b"))
        .union(pairs.select(F.col("id_b").alias("a"), F.col("id_a").alias("b")))
        .distinct()
    )
    edges = edges.persist()
    labels = docs.select(F.col(id_col).alias("node"), F.col(id_col).alias("label"))
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges["b"] == labels["node"])
            .groupBy(F.col("a").alias("node"))
            .agg(F.min("label").alias("nlabel"))
        )
        # Eager local checkpoint per round: without it each iteration's plan
        # embeds all previous iterations (lineage doubles per round and the
        # convergence check re-executes the whole chain).
        new_labels = (
            labels.join(neighbor_min, "node", "left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce(F.col("nlabel"), F.col("label"))).alias("label"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), F.col("n.node") == F.col("o.node"))
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select(F.col("node").alias(id_col), F.col("label").alias("cluster_id"))
