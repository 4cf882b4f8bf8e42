"""Property-based tests (hypothesis): operator semantics against independent
pure-Python models on randomized inputs — the rigor layer the reference ships
without (SURVEY §5)."""

from __future__ import annotations

import pytest
from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

from flink_gmall2024_realtime_spark.operators import state
from flink_gmall2024_realtime_spark.operators.skew import salted_aggregate
from flink_gmall2024_realtime_spark.streaming.sinks import upsert_batch

# Small domains force key collisions (the interesting cases).
_keys = st.integers(min_value=0, max_value=5)
_ts = st.integers(min_value=0, max_value=50)


@settings(max_examples=10, deadline=None)
@given(st.lists(st.tuples(_keys, _ts, st.integers(0, 999)), min_size=1, max_size=40))
def test_upsert_batch_is_last_write_wins(spark, rows):
    df = spark.createDataFrame(
        [(str(k), t, v) for k, t, v in rows], "id string, ts long, v long"
    )
    got = {r["id"]: (r["ts"], r["v"]) for r in upsert_batch(None, df, "id", "ts").collect()}
    # model: per key, the row with max ts wins; among equal ts the engine may
    # pick either — compare only max-ts and its value set membership
    model: dict[str, int] = {}
    for k, t, v in rows:
        model[str(k)] = max(model.get(str(k), -1), t)
    assert set(got) == set(model)
    for k, (t, v) in got.items():
        assert t == model[k]
        assert (int(k), t, v) in [(a, b, c) for a, b, c in rows]


@settings(max_examples=10, deadline=None)
@given(st.lists(st.tuples(_keys, st.integers(0, 30)), min_size=1, max_size=40))
def test_first_seen_repair_model(spark, rows):
    df = spark.createDataFrame([(str(k), f"2024-01-{d+1:02d}") for k, d in rows], "mid string, d string")
    out = state.first_seen_repair(df, "mid", F.col("d")).collect()
    first = {}
    for k, d in rows:
        first[str(k)] = min(first.get(str(k), "9"), f"2024-01-{d+1:02d}")
    for r in out:
        assert r["is_new"] == (1 if r["cur_date"] == first[r["mid"]] else 0)


@settings(max_examples=10, deadline=None)
@given(st.lists(st.tuples(_keys, st.integers(0, 10_000)), min_size=1, max_size=60))
def test_salted_aggregate_equals_plain(spark, rows):
    df = spark.createDataFrame([(str(k), v) for k, v in rows], "k string, v long")
    plain = {
        r["k"]: (r["s"], r["c"])
        for r in df.groupBy("k").agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("c")).collect()
    }
    salted = {
        r["k"]: (r["s"], r["c"])
        for r in salted_aggregate(
            df,
            ["k"],
            phase1=[F.sum("v").alias("ps"), F.count(F.lit(1)).alias("pc")],
            phase2=[F.sum("ps").alias("s"), F.sum("pc").alias("c")],
            salt_buckets=4,
        ).collect()
    }
    assert plain == salted


@settings(max_examples=10, deadline=None)
@given(
    st.lists(st.tuples(_keys, _ts, st.integers(0, 99)), min_size=1, max_size=30),
    st.lists(st.tuples(_keys, _ts, st.integers(100, 199)), min_size=1, max_size=30),
)
def test_asof_join_model(spark, dim_rows, fact_rows):
    """asof_join == per-fact 'greatest dim ts <= fact ts' scan on random
    inputs (dims deduped per (key, ts) keeping max payload)."""
    from flink_gmall2024_realtime_spark.operators.joins import asof_join

    dim_map: dict[tuple[int, int], int] = {}
    for k, t, v in dim_rows:
        kk = (k, t)
        dim_map[kk] = max(dim_map.get(kk, -1), v)
    dims = spark.createDataFrame(
        [(k, t, v) for (k, t), v in dim_map.items()], "k long, ts long, v long"
    )
    facts = spark.createDataFrame(
        [(k, t, i) for i, (k, t, _) in enumerate(fact_rows)], "k long, ts long, fid long"
    )
    got = {r["fid"]: r["v"] for r in asof_join(facts, dims, "k", "ts", ["v"]).collect()}
    for i, (k, t, _) in enumerate(fact_rows):
        eligible = [(dt, v) for (dk, dt), v in dim_map.items() if dk == k and dt <= t]
        want = max(eligible)[1] if eligible else None
        assert got[i] == want, (i, k, t, eligible)


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 10_000), st.lists(st.floats(-1, 1, allow_nan=False), min_size=4, max_size=4)),
        min_size=2,
        max_size=25,
        unique_by=lambda r: r[0],
    )
)
def test_embedding_block_grid_equals_brute(spark, rows):
    """The symmetric block-grid cosine self-join finds exactly the pairs an
    all-pairs scan finds, for any block count (partition of the pair space)."""
    import numpy as np

    from flink_gmall2024_realtime_spark.operators.dedup import embedding_cosine_pairs

    rows = [(i, v) for i, v in rows if np.linalg.norm(v) > 1e-6]
    if len(rows) < 2:
        return
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {
        (r["id_a"], r["id_b"]) for r in embedding_cosine_pairs(df, threshold=0.5, n_blocks=3).collect()
    }
    ids = [i for i, _ in rows]
    mat = np.array([list(np.array(v, dtype=np.float32)) for _, v in rows], dtype=np.float64)
    nrm = np.linalg.norm(mat, axis=1)
    want = set()
    for i in range(len(ids)):
        for j in range(len(ids)):
            if ids[i] < ids[j]:
                sim = round(float(mat[i] @ mat[j] / (nrm[i] * nrm[j])), 6)
                if sim >= 0.5:
                    want.add((ids[i], ids[j]))
    assert got == want


@settings(max_examples=10, deadline=None)
@given(
    st.lists(st.tuples(_keys, st.integers(0, 99)), min_size=0, max_size=10),
    st.lists(
        st.tuples(_keys, _ts, st.sampled_from(["upsert", "delete"]), st.integers(0, 999)),
        min_size=1,
        max_size=40,
    ),
)
def test_merge_into_model(spark, target_rows, changelog):
    """merge_into == a dict model: fold the changelog latest-wins (ts then
    input order as tie-break), apply upserts/deletes over the target dict."""
    from flink_gmall2024_realtime_spark.operators.merge import (
        fold_changelog,
        merge_into,
    )

    tgt = {k: v for k, v in target_rows}  # later duplicate key wins in both
    target = spark.createDataFrame(
        [(k, v) for k, v in tgt.items()], "k int, v int"
    ) if tgt else spark.createDataFrame([], "k int, v int")
    chg = spark.createDataFrame(
        [(k, t, op, v, i) for i, (k, t, op, v) in enumerate(changelog)],
        "k int, ts int, op string, v int, seq int",
    )
    folded = fold_changelog(chg, ["k"], ["ts", "seq"]).drop("ts", "seq")
    got = {
        r["k"]: r["v"]
        for r in merge_into(target, folded, ["k"], ["v"], op_col="op").collect()
    }

    latest: dict[int, tuple[int, int, str, int]] = {}
    for i, (k, t, op, v) in enumerate(changelog):
        if k not in latest or (t, i) > (latest[k][0], latest[k][1]):
            latest[k] = (t, i, op, v)
    model = dict(tgt)
    for k, (_t, _i, op, v) in latest.items():
        if op == "delete":
            model.pop(k, None)
        else:
            model[k] = v
    assert got == model


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.lists(st.sampled_from("abcde"), min_size=0, max_size=12),
        min_size=1,
        max_size=8,
    )
)
def test_duplicate_span_removal_model(spark, docs_toks):
    """duplicate_span_removal vs a pure-Python model: random docs over a
    5-token vocabulary (width 3 forces heavy gram collisions)."""
    from flink_gmall2024_realtime_spark.operators.dedup import duplicate_span_removal

    width = 3
    docs = [(i + 1, " ".join(toks)) for i, toks in enumerate(docs_toks)]
    # model
    occ: dict[tuple, tuple] = {}
    for did, toks in ((d, t.split()) if t else (d, []) for d, t in docs):
        for p in range(len(toks) - width + 1):
            g = tuple(toks[p : p + width])
            if g not in occ or (did, p) < occ[g]:
                occ[g] = (did, p)
    want = {}
    for did, text in docs:
        toks = text.split()
        covered = set()
        for p in range(len(toks) - width + 1):
            g = tuple(toks[p : p + width])
            if occ[g] != (did, p):
                covered.update(range(p, p + width))
        keep = [t for i, t in enumerate(toks) if i not in covered]
        want[did] = (" ".join(keep), len(toks) - len(keep))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["clean_text"], r["removed_tokens"])
        for r in duplicate_span_removal(df, width=width).collect()
    }
    assert got == want


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(_keys, st.integers(min_value=-40, max_value=40)),
        min_size=1,
        max_size=50,
        unique_by=lambda kv: kv,
    )
)
def test_two_phase_rank_model(spark, rows):
    """Two-phase rank == the plain per-key (value, id) row_number for any
    key/value mix, including negative values (floor bucketing) and values
    straddling bucket boundaries."""
    from flink_gmall2024_realtime_spark.operators.skew import two_phase_rank

    data = [(i, str(k), float(v)) for i, (k, v) in enumerate(rows)]
    df = spark.createDataFrame(data, "id long, k string, v double")
    got = {
        (r["k"], r["id"]): r["rnk"]
        for r in two_phase_rank(df, "k", "v", "id", bucket_width=7.0, rank_col="rnk").collect()
    }
    model = {}
    bykey: dict[str, list] = {}
    for i, k, v in data:
        bykey.setdefault(k, []).append((v, i))
    for k, vs in bykey.items():
        for rank, (v, i) in enumerate(sorted(vs), start=1):
            model[(k, i)] = rank
    assert got == model


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.lists(st.sampled_from(["a", "b", "c", "d"]), min_size=0, max_size=8),
        min_size=1,
        max_size=12,
    )
)
def test_bigram_lm_model(spark, docs_toks):
    """Bigram LM scores == a pure-Python MLE model over the same corpus
    (6-dp rounding applied at the same points)."""
    from flink_gmall2024_realtime_spark.operators.text import bigram_lm_score

    data = [(i, " ".join(toks)) for i, toks in enumerate(docs_toks)]
    df = spark.createDataFrame(data, "doc_id long, text string")
    got = {r["doc_id"]: (r["n_bigrams"], r["pred_score"]) for r in bigram_lm_score(df).collect()}

    c2: dict[tuple, int] = {}
    c1: dict[str, int] = {}
    for toks in docs_toks:
        for a, b in zip(toks, toks[1:]):
            c2[(a, b)] = c2.get((a, b), 0) + 1
            c1[a] = c1.get(a, 0) + 1
    model = {}
    for i, toks in enumerate(docs_toks):
        bigs = list(zip(toks, toks[1:]))
        if not bigs:
            continue
        s = sum(round(c2[p] / c1[p[0]], 6) for p in bigs)
        model[i] = (len(bigs), round(s, 6))
    assert got == model


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.lists(st.integers(min_value=-5, max_value=5), min_size=16, max_size=16),
        min_size=17,
        max_size=28,
        unique_by=lambda v: tuple(v),
    )
)
def test_pq_topk_model(spark, vecs):
    """pq_topk == a pure-Python PQ model (codebook = 16 smallest ids,
    per-subspace argmin with ties to the smaller index, integer-micro
    distance accumulation, rank by (dist, id))."""
    from flink_gmall2024_realtime_spark.operators.similarity import pq_topk

    dim, m, ds, cbk, k = 16, 4, 4, 16, 3
    data = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(data, "vec_id long, embedding array<float>")
    queries = df.filter(F.col("vec_id") % 5 == 0)
    got = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["dist"])
        for r in pq_topk(df, queries, k=k, m=m, cb_k=cbk, dim=dim).collect()
    }

    cb = [v for _i, v in sorted(data)[:cbk]]

    def subd(a, b, s):
        acc = 0.0
        for i in range(s * ds, s * ds + ds):
            acc += (a[i] - b[i]) * (a[i] - b[i])
        return acc

    codes = {
        i: [min(range(cbk), key=lambda j: (subd(v, cb[j], s), j)) for s in range(m)]
        for i, v in data
    }
    model = {}
    for qi, qv in [(i, v) for i, v in data if i % 5 == 0]:
        table = [[round(round(subd(qv, cb[j], s), 6) * 1e6) for j in range(cbk)] for s in range(m)]
        scored = sorted(
            (round(sum(table[s][codes[i][s]] for s in range(m)) / 1e6, 6), i)
            for i, _v in data
            if i != qi
        )
        for rank, (dist, nid) in enumerate(scored[:k], start=1):
            model[(qi, rank)] = (nid, dist)
    assert got == model


@settings(max_examples=12, deadline=None)
@given(
    st.lists(
        st.tuples(_keys, st.integers(min_value=0, max_value=40_000)),
        min_size=1,
        max_size=50,
    )
)
def test_sessionize_two_phase_equals_single_phase(spark, rows):
    """VERDICT r6 #1a: the skew-safe two-phase plan must equal the
    single-window formulation on random inputs — bucket crossings, empty
    intermediate buckets, ties (equal ts) and multi-key mixes all arise
    from the generator (ts domain spans ~11 bucket_seconds=3600 buckets)."""
    df = spark.createDataFrame(
        [(str(k), i, t) for i, (k, t) in enumerate(rows)],
        "uid string, event_id long, off long",
    ).select(
        "uid",
        "event_id",
        (F.to_timestamp(F.lit("2024-01-01 00:00:00")).cast("long") + F.col("off"))
        .cast("timestamp")
        .alias("ts"),
    )
    kw = dict(gap_seconds=1800, bucket_seconds=3600)
    single = sorted(
        map(tuple, state.sessionize(df, "uid", "ts", mode="single", **kw).collect())
    )
    two = sorted(
        map(tuple, state.sessionize(df, "uid", "ts", mode="two_phase", **kw).collect())
    )
    assert single == two


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(1, 3), st.integers(0, 40)),
        min_size=1,
        max_size=50,
    )
)
def test_calendar_streaks_model(spark, rows):
    """calendar_streaks == a pure-Python islands model on random
    (key, day-offset) multisets (duplicates collapse; runs split on any
    gap > 1 day)."""
    from datetime import date, timedelta

    base = date(2024, 1, 1)
    df = spark.createDataFrame(
        [(k, base + timedelta(days=d)) for k, d in rows], "k long, d date"
    )
    got = {
        r["k"]: (r["max_streak_days"], r["n_streaks"], r["active_days"])
        for r in state.calendar_streaks(df, "k", F.col("d")).collect()
    }

    want = {}
    by_key: dict[int, set[int]] = {}
    for k, d in rows:
        by_key.setdefault(k, set()).add(d)
    for k, days in by_key.items():
        ds = sorted(days)
        runs = []
        run = 1
        for a, b in zip(ds, ds[1:]):
            if b == a + 1:
                run += 1
            else:
                runs.append(run)
                run = 1
        runs.append(run)
        want[k] = (max(runs), len(runs), len(ds))
    assert got == want


@settings(max_examples=12, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=3),     # key
            st.integers(min_value=-50, max_value=99),  # order value (incl. negatives: floor bucketing)
            st.integers(min_value=1, max_value=9),     # weight
        ),
        min_size=1,
        max_size=40,
    )
)
def test_two_phase_cumsum_equals_plain_window(spark, rows):
    """two_phase_cumsum == SUM() OVER (PARTITION BY key ORDER BY v, id
    ROWS UNBOUNDED PRECEDING..CURRENT) + SUM() OVER (PARTITION BY key),
    on random inputs with deliberate duplicate order values (the id
    tiebreak makes the prefix deterministic)."""
    from pyspark.sql import Window

    from flink_gmall2024_realtime_spark.operators.skew import two_phase_cumsum

    data = [(k, float(v), float(w), i) for i, (k, v, w) in enumerate(rows)]
    df = spark.createDataFrame(data, "k long, v double, w double, id long")
    got = {
        r["id"]: (r["cum_w"], r["total_w"])
        for r in two_phase_cumsum(df, "k", "v", "id", "w", bucket_width=10.0).collect()
    }
    win = (
        Window.partitionBy("k").orderBy("v", "id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    expect = {
        r["id"]: (r["cw"], r["tw"])
        for r in df.select(
            "id",
            F.sum("w").over(win).alias("cw"),
            F.sum("w").over(Window.partitionBy("k")).alias("tw"),
        ).collect()
    }
    assert got == expect


# --- r9 codec properties: byte-level codecs against random content -------


@settings(max_examples=40, deadline=None)
@given(st.binary(max_size=6000), st.sampled_from([0, 17, 64]))
def test_tiff_lzw_roundtrip_random_bytes(data, clear_every):
    """TIFF-variant LZW (MSB-first, early change, mid-stream Clears) is the
    identity on arbitrary byte strings."""
    from flink_gmall2024_realtime_spark.operators.multimodal import (
        _tiff_lzw_decode,
        _tiff_lzw_encode,
    )

    assert bytes(_tiff_lzw_decode(_tiff_lzw_encode(data, clear_every=clear_every))) == data


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet=st.sampled_from(list("ab()\\ n")), min_size=0, max_size=12
        ),
        min_size=1,
        max_size=6,
    )
)
def test_pdf_content_scanner_inverts_any_literal(pieces):
    """The Tj/TJ scanner recovers ANY text (parens, backslashes, spaces)
    from correctly-escaped PDF literal strings — the escaper here mirrors
    the spec, the decoder must invert it."""
    from flink_gmall2024_realtime_spark.operators.pdftext import (
        _content_stream_text,
    )

    def lit(s: str) -> bytes:
        return (
            "("
            + s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")
            + ")"
        ).encode("latin-1")

    # one Tj per piece plus one TJ over all pieces with kern numbers
    stream = b"BT " + b" ".join(lit(p) + b" Tj" for p in pieces)
    stream += b" [" + b" -250 ".join(lit(p) for p in pieces) + b"] TJ ET"
    expect = "".join(pieces) * 2
    assert _content_stream_text(stream) == expect


@settings(max_examples=30, deadline=None)
@given(st.lists(st.binary(min_size=0, max_size=300), min_size=1, max_size=6))
def test_warc_gunzip_members_inverts_any_concatenation(bodies):
    """Multi-member gunzip recovers every member of any concatenation —
    the property that makes member-per-record WARCs range-readable."""
    import gzip

    from flink_gmall2024_realtime_spark.operators.webarchive import (
        _gunzip_members,
    )

    payload = b"".join(gzip.compress(b, mtime=0) for b in bodies)
    assert _gunzip_members(payload) == bodies


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.text(alphabet=st.sampled_from(list("abcdef/_.")), min_size=1, max_size=20),
            st.binary(max_size=400),
            st.booleans(),
        ),
        min_size=1,
        max_size=6,
        unique_by=lambda t: t[0],
    )
)
def test_zip_walk_reads_stdlib_written_archives(members):
    """True independence check: stdlib ``zipfile`` WRITES arbitrary
    archives (mixed STORED/DEFLATED, arbitrary names and contents), OUR
    central-directory walk must read back exactly what zipfile reports."""
    import io
    import zipfile

    from flink_gmall2024_realtime_spark.operators.archive import parse_zip

    # zip member names cannot start with '/'; keep them relative
    members = [(n.lstrip("/") or "x", c, s) for n, c, s in members]
    seen = set()
    uniq = []
    for n, c, s in members:
        if n not in seen:
            seen.add(n)
            uniq.append((n, c, s))
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        for name, content, stored in uniq:
            zf.writestr(
                name, content,
                compress_type=zipfile.ZIP_STORED if stored else zipfile.ZIP_DEFLATED,
            )
    rows = parse_zip(buf.getvalue())
    assert [(r[1], r[3], r[4]) for r in rows] == [
        (n, len(c), c.count(b"\n")) for n, c, _s in uniq
    ]


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.text(alphabet=st.sampled_from(list("abcdef/_.")), min_size=1, max_size=20),
            st.binary(max_size=400),
        ),
        min_size=1,
        max_size=6,
    )
)
def test_tar_walk_reads_stdlib_written_archives(entries):
    """stdlib ``tarfile`` writes arbitrary gzipped tarballs; our
    checksum-verified ustar walk must read back identical member tables."""
    import io
    import tarfile

    from flink_gmall2024_realtime_spark.operators.archive import parse_tar_gz

    entries = [(n.lstrip("/") or "x", c) for n, c in entries]
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w:gz", format=tarfile.USTAR_FORMAT) as tf:
        for i, (name, content) in enumerate(entries):
            info = tarfile.TarInfo(name=f"{i}_{name}")  # unique names
            info.size = len(content)
            tf.addfile(info, io.BytesIO(content))
    rows = parse_tar_gz(buf.getvalue())
    assert [(r[2], r[3]) for r in rows] == [
        (len(c), c.count(b"\n")) for _n, c in entries
    ]


@settings(max_examples=30, deadline=None)
@given(st.binary(max_size=4000), st.sampled_from([1, 5, 9]))
def test_bz2_decoder_inverts_stdlib_compressor(data, level):
    """stdlib ``bz2`` COMPRESSES arbitrary bytes; the in-repo bzip2
    decoder (Huffman groups, MTF/RLE2, inverse BWT, RLE1, both CRCs) must
    reproduce them exactly — the strongest conformance anchor available."""
    import bz2

    from flink_gmall2024_realtime_spark.operators.bzip2 import bz2_decompress

    assert bz2_decompress(bz2.compress(data, level)) == data


@settings(max_examples=25, deadline=None)
@given(st.binary(max_size=2000), st.sampled_from([0, 1, 4, 10]))
def test_xz_audit_reads_any_stdlib_lzma_stream(data, check_id):
    """stdlib lzma writes a real .xz for ANY content/check type; the
    backward audit must report exactly one stream/block and the true
    uncompressed size."""
    import lzma

    from flink_gmall2024_realtime_spark.operators.multimodal import (
        parse_xz_meta,
    )

    check = {0: lzma.CHECK_NONE, 1: lzma.CHECK_CRC32,
             4: lzma.CHECK_CRC64, 10: lzma.CHECK_SHA256}[check_id]
    p = lzma.compress(data, format=lzma.FORMAT_XZ, check=check)
    # empty content legitimately yields a zero-block stream
    assert parse_xz_meta(p) == (1, 1 if data else 0, len(data), check_id)


@settings(max_examples=25, deadline=None)
@given(st.lists(st.binary(min_size=0, max_size=500), min_size=1, max_size=4))
def test_bz2_decoder_inverts_concatenated_streams(parts):
    """pbzip2-style concatenations of independently-compressed streams
    decode to the concatenated plaintexts."""
    import bz2

    from flink_gmall2024_realtime_spark.operators.bzip2 import bz2_decompress

    payload = b"".join(bz2.compress(p, 1) for p in parts)
    assert bz2_decompress(payload) == b"".join(parts)


@settings(max_examples=25, deadline=None)
@given(st.binary(min_size=1, max_size=1200), st.booleans())
def test_g711_wav_decode_matches_audioop_on_random_bytes(samples, mulaw):
    """A G.711 WAV with ARBITRARY sample bytes decodes to exactly the
    PCM sum stdlib ``audioop`` produces for the same law."""
    import struct
    import warnings

    from flink_gmall2024_realtime_spark.operators.multimodal import decode_wav

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        import audioop

    code = 7 if mulaw else 6
    fmt = struct.pack("<HHIIHH", code, 1, 8000, 8000, 1, 8)
    body = b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(samples)) + samples
    payload = b"RIFF" + struct.pack("<I", len(body)) + body
    _ch, _rate, n, s = decode_wav(payload)
    conv = audioop.ulaw2lin(samples, 2) if mulaw else audioop.alaw2lin(samples, 2)
    import numpy as np

    ref = int(np.frombuffer(conv, dtype="<i2").astype(np.int64).sum())
    assert n == len(samples) and s == ref


@settings(max_examples=25, deadline=None)
@given(st.binary(max_size=6000), st.sampled_from([1, 3, 9, 19]))
def test_zstd_decoder_inverts_real_cli(data, level):
    """The real ``zstd`` CLI compresses arbitrary bytes; the in-repo RFC
    8878 decoder (FSE distributions, Huffman literals incl. FSE-coded
    weights and 4-stream layout, 3-state sequence bitstream, repeat
    offsets, XXH64 verify) must reproduce them exactly — the strongest
    conformance anchor available in this container."""
    import shutil
    import subprocess

    from flink_gmall2024_realtime_spark.operators.zstdcodec import (
        zstd_decompress,
    )

    if shutil.which("zstd") is None:
        pytest.skip("zstd CLI not available")
    r = subprocess.run(
        ["zstd", f"-{level}", "-c"], input=data, capture_output=True
    )
    assert r.returncode == 0
    assert zstd_decompress(r.stdout) == data


@settings(max_examples=25, deadline=None)
@given(st.binary(max_size=4000))
def test_zstd_encoder_roundtrips_and_real_cli_reads_it(data):
    """The in-repo compressor emits genuine zstd format: our decoder
    round-trips it AND the real ``zstd`` CLI decodes it to the same
    bytes (format anchor in the write direction)."""
    import shutil
    import subprocess

    from flink_gmall2024_realtime_spark.operators.zstdcodec import (
        zstd_compress,
        zstd_decompress,
    )

    payload = zstd_compress(data)
    assert zstd_decompress(payload) == data
    if shutil.which("zstd") is None:
        pytest.skip("zstd CLI not available")
    r = subprocess.run(["zstd", "-d", "-c"], input=payload, capture_output=True)
    assert r.returncode == 0, r.stderr.decode()[:200]
    assert r.stdout == data


@settings(max_examples=25, deadline=None)
@given(st.binary(max_size=5000))
def test_lz4_and_snappy_decoders_invert_pyarrow(data):
    """pyarrow's bundled C++ compressors (lz4 frame, lz4 raw block,
    snappy — the real reference implementations) compress arbitrary
    bytes; the in-repo decoders must reproduce them exactly."""
    import pyarrow as pa

    from flink_gmall2024_realtime_spark.operators.lz4snappy import (
        lz4_block_decompress,
        lz4_frame_decompress,
        snappy_decompress,
    )

    assert lz4_frame_decompress(bytes(pa.Codec("lz4").compress(data))) == data
    assert lz4_block_decompress(bytes(pa.Codec("lz4_raw").compress(data))) == data
    assert snappy_decompress(bytes(pa.Codec("snappy").compress(data))) == data


@settings(max_examples=10, deadline=None)
@given(st.binary(max_size=3000), st.sampled_from([["-1"], ["-9"], ["-1", "--content-size"], ["-9", "-B4", "-BD"]]))
def test_lz4_decoder_inverts_real_cli(data, flags):
    """The standalone ``lz4`` CLI (second independent writer) round-trips
    through the in-repo frame decoder, including block-dependent (-BD)
    frames and declared content sizes."""
    import shutil
    import subprocess

    from flink_gmall2024_realtime_spark.operators.lz4snappy import (
        lz4_frame_decompress,
    )

    if shutil.which("lz4") is None:
        pytest.skip("lz4 CLI not available")
    r = subprocess.run(["lz4", "-c", "-z"] + flags, input=data, capture_output=True)
    assert r.returncode == 0
    assert lz4_frame_decompress(r.stdout) == data


@settings(max_examples=15, deadline=None)
@given(
    st.integers(1, 500),
    st.integers(1, 100),
    st.sampled_from(["snappy", "zstd", "gzip", "none"]),
    st.integers(-10_000, 10_000),
)
def test_parquet_footer_audit_matches_pyarrow(n, rg, codec, base):
    """pyarrow writes a real parquet file for arbitrary shapes; the
    hand-rolled Thrift compact footer walk must recover the same row
    count, row-group layout, codec and int64 min/max statistics pyarrow's
    own introspection reports."""
    import io

    import pyarrow as pa
    import pyarrow.parquet as pq

    from flink_gmall2024_realtime_spark.operators.parquetmeta import (
        parse_parquet_footer,
    )

    t = pa.table({"k": pa.array([base + j for j in range(n)], type=pa.int64())})
    buf = io.BytesIO()
    pq.write_table(t, buf, row_group_size=rg, compression=codec)
    a = parse_parquet_footer(buf.getvalue())
    pf = pq.ParquetFile(io.BytesIO(buf.getvalue()))
    assert a["num_rows"] == pf.metadata.num_rows == n
    assert a["n_row_groups"] == pf.metadata.num_row_groups
    assert a["n_columns"] == 1
    assert a["codecs"] == {"snappy": "SNAPPY", "zstd": "ZSTD",
                           "gzip": "GZIP", "none": "UNCOMPRESSED"}[codec]
    assert (a["col0_min"], a["col0_max"]) == (base, base + n - 1)


@settings(max_examples=12, deadline=None)
@given(
    st.integers(1, 400),
    st.sampled_from(["zlib", "snappy", "lz4", "zstd", "uncompressed"]),
    st.integers(-10_000, 10_000),
)
def test_orc_footer_audit_matches_pyarrow(n, comp, base):
    """pyarrow writes a real ORC file for arbitrary shapes; the raw
    postscript/footer walk (chunk decompression through the repo's own
    snappy/lz4/zstd decoders) must recover the same row count, stripe
    count, compression and int64 min/max pyarrow's ORCFile reports."""
    import io

    import pyarrow as pa
    from pyarrow import orc

    from flink_gmall2024_realtime_spark.operators.orcmeta import (
        parse_orc_footer,
    )

    t = pa.table({"k": pa.array([base + j for j in range(n)], type=pa.int64())})
    buf = io.BytesIO()
    orc.write_table(t, buf, compression=comp, stripe_size=1024)
    a = parse_orc_footer(buf.getvalue())
    f = orc.ORCFile(io.BytesIO(buf.getvalue()))
    assert a["num_rows"] == f.nrows == n
    assert a["n_stripes"] == f.nstripes
    assert a["compression"] == {"zlib": "ZLIB", "snappy": "SNAPPY",
                                "lz4": "LZ4", "zstd": "ZSTD",
                                "uncompressed": "NONE"}[comp]
    assert (a["col0_min"], a["col0_max"]) == (base, base + n - 1)


@settings(max_examples=10, deadline=None)
@given(st.lists(st.tuples(_keys, _ts, st.integers(0, 999)), min_size=1, max_size=50))
def test_latest_by_key_equals_row_number_spelling(spark, rows):
    """The r10 argmax rewire: latest_by_key (partial-agg max_by) returns
    exactly the rows of the row_number-over-sort spelling on random
    inputs with heavy key/ts collisions (seq is the unique tiebreak both
    spellings order by)."""
    from pyspark.sql import Window

    from flink_gmall2024_realtime_spark.operators.skew import latest_by_key

    df = spark.createDataFrame(
        [(k, t, i) for i, (k, t, _v) in enumerate(rows)], "k long, ts long, seq long"
    )
    got = {tuple(r) for r in latest_by_key(df, "k", ("ts", "seq")).collect()}
    w = Window.partitionBy("k").orderBy(F.col("ts").desc(), F.col("seq").desc())
    want = {
        tuple(r)
        for r in df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
        .collect()
    }
    assert got == want


@settings(max_examples=8, deadline=None)
@given(st.lists(st.tuples(_keys, st.integers(0, 200_000)), min_size=1, max_size=40))
def test_traffic_repair_modes_agree(spark, rows):
    """traffic_repair_flags returns identical (is_new, uv, sv) rows in the
    single-window and partial-agg two-phase shapes on random event frames
    (seconds-scale gaps straddling the 1800 s session bound and day
    boundaries)."""
    from flink_gmall2024_realtime_spark.operators.state import (
        traffic_repair_flags,
    )

    df = spark.createDataFrame(
        [(k, i, f"2024-01-0{1 + (t // 86400) % 9:d} "
          f"{(t % 86400) // 3600:02d}:{(t % 3600) // 60:02d}:{t % 60:02d}")
         for i, (k, t) in enumerate(rows)],
        "user_id long, event_id long, ts_s string",
    ).select("user_id", "event_id", F.col("ts_s").cast("timestamp").alias("ts"))
    cols = ["user_id", "event_id", "is_new", "uv", "sv"]
    a = {tuple(r) for r in traffic_repair_flags(df, mode="single").select(*cols).collect()}
    b = {tuple(r) for r in traffic_repair_flags(df, mode="two_phase").select(*cols).collect()}
    assert a == b


@settings(max_examples=20, deadline=None)
@given(st.binary(max_size=5000), st.sampled_from([0, 1, 6]),
       st.sampled_from([0, 1, 4, 10]))
def test_xz_decoder_inverts_stdlib_compressor(data, preset, check_id):
    """stdlib ``lzma`` COMPRESSES arbitrary bytes; the in-repo LZMA2/.xz
    decoder (range decoder, 12-state model, chunk resets, every container
    CRC and the content check verified) must reproduce them exactly —
    plus the classic FORMAT_ALONE header path."""
    import lzma

    from flink_gmall2024_realtime_spark.operators.lzmadec import (
        lzma_alone_decompress,
        xz_decompress,
    )

    check = {0: lzma.CHECK_NONE, 1: lzma.CHECK_CRC32,
             4: lzma.CHECK_CRC64, 10: lzma.CHECK_SHA256}[check_id]
    assert xz_decompress(
        lzma.compress(data, format=lzma.FORMAT_XZ, check=check, preset=preset)
    ) == data
    assert lzma_alone_decompress(
        lzma.compress(data, format=lzma.FORMAT_ALONE, preset=preset)
    ) == data


def _iceberg_read(payload: bytes):
    from flink_gmall2024_realtime_spark.operators.iceberg import (
        read_iceberg_snapshot,
    )

    return read_iceberg_snapshot(payload)


def _synth_iceberg(seed: int) -> bytes:
    from flink_gmall2024_realtime_spark.operators.iceberg import (
        synth_iceberg_table,
    )

    return synth_iceberg_table(seed)


def _synth_iceberg_kind(kind):
    def synth(seed: int) -> bytes:
        from flink_gmall2024_realtime_spark.operators import iceberg

        return getattr(iceberg, f"synth_iceberg_{kind}")(seed)

    return synth


def _roaring_parse(payload: bytes):
    from flink_gmall2024_realtime_spark.operators.roaring import (
        parse_roaring_bitmap_array,
    )

    return parse_roaring_bitmap_array(payload)


def _synth_roaring(seed: int) -> bytes:
    from flink_gmall2024_realtime_spark.operators.roaring import (
        synth_roaring_dump,
    )

    return synth_roaring_dump(seed)


def _synth_checkpoint_blob(seed: int) -> bytes:
    from flink_gmall2024_realtime_spark.operators import deltalog

    path = f"f{seed}.parquet"
    return deltalog.write_checkpoint_blob(
        {path: {"path": path, "size": seed, "stats": None,
                "partitionValues": {"p": str(seed)}}},
        {"id": "t", "schemaString": "{}", "partitionColumns": ["p"]},
        {"minReaderVersion": 1, "minWriterVersion": 2},
    )


def _synth_delta_mapped_id(seed: int) -> bytes:
    from flink_gmall2024_realtime_spark.operators import deltalog

    return deltalog.synth_delta_mapped(seed, mode="id")


def _synth_iceberg_orcdata(seed: int) -> bytes:
    from flink_gmall2024_realtime_spark.operators import iceberg

    return iceberg.synth_iceberg_avrodata(seed, fmt="ORC")


def _synth_lzma_alone(seed: int) -> bytes:
    import lzma

    text = b"\n".join(b"doc %d word %d" % (seed, i) for i in range(seed % 20 + 5))
    return lzma.compress(text, format=lzma.FORMAT_ALONE, preset=seed % 3)


@settings(max_examples=40, deadline=None)
@given(st.binary(max_size=300), st.integers(0, 43), st.randoms())
def test_decoders_raise_only_documented_errors(noise, which, rng):
    """Adversarial-input contract (crawl data contains garbage): every
    byte-level decoder either parses or raises the DOCUMENTED
    ValueError / NotImplementedError — never IndexError / KeyError /
    struct.error / zlib.error leaking from the walk. Inputs are raw
    fuzz plus bit-flipped/truncated mutations of a valid payload."""
    from flink_gmall2024_realtime_spark.operators import (
        archive,
        avro,
        bzip2,
        deflate,
        deltalog,
        fastpath,
        lz4snappy,
        lzmadec,
        orcmeta,
        parquetmeta,
        pdftext,
        vp8l,
        zstdcodec,
    )

    table = [
        (zstdcodec.zstd_decompress, zstdcodec.synth_zstd_dump),
        (lz4snappy.lz4_frame_decompress, lz4snappy.synth_lz4_dump),
        (lz4snappy.snappy_decompress, lz4snappy.synth_snappy_dump),
        (lzmadec.xz_decompress, lzmadec.synth_xz_dump),
        (avro.parse_avro, avro.synth_avro),
        (parquetmeta.parse_parquet_footer, parquetmeta.synth_parquet),
        (parquetmeta.parse_parquet_data, parquetmeta.synth_parquet_data),
        (orcmeta.parse_orc_footer, orcmeta.synth_orc),
        (archive.parse_zip, archive.synth_zip),
        (archive.parse_tar_gz, archive.synth_tar_gz),
        (pdftext.parse_pdf_text, pdftext.synth_pdf),
        (lz4snappy.lz4_block_decompress, None),
        (bzip2.bz2_decompress, None),
        (lzmadec.lzma_alone_decompress, _synth_lzma_alone),
        # fast-path dispatchers must keep the same error contract
        # (library failures fall back to the spec decoder's errors)
        (fastpath.fast_decoder("zstd", sample_every=1), zstdcodec.synth_zstd_dump),
        (fastpath.fast_decoder("xz", sample_every=1), lzmadec.synth_xz_dump),
        (fastpath.fast_decoder("lz4", sample_every=1), lz4snappy.synth_lz4_dump),
        (fastpath.fast_decoder("snappy", sample_every=1), lz4snappy.synth_snappy_dump),
        (fastpath.fast_decoder("bz2", sample_every=1), None),
        (fastpath.fast_decoder("lzma_alone", sample_every=1), _synth_lzma_alone),
        (vp8l.decode_webp_pixels, vp8l.synth_webp_lossless),
        (deflate.gzip_decompress, deflate.synth_gzip_dump),
        (deflate.zlib_decompress, None),
        (deflate.inflate, None),
        (fastpath.fast_decoder("gzip", sample_every=1), deflate.synth_gzip_dump),
        (fastpath.fast_decoder("zlib", sample_every=1), None),
        (orcmeta.parse_orc_data, orcmeta.synth_orc_data),
        (deltalog.read_delta_snapshot, deltalog.synth_delta_table),
        (deltalog.read_delta_snapshot, deltalog.synth_delta_checkpointed),
        (deltalog.read_delta_snapshot, deltalog.synth_delta_partitioned),
        (parquetmeta.parse_parquet_records, _synth_checkpoint_blob),
        (_iceberg_read, _synth_iceberg),
        # r13: deletion-vector / column-mapping tables + the roaring codec
        (deltalog.read_delta_snapshot, deltalog.synth_delta_dv),
        (deltalog.read_delta_snapshot, deltalog.synth_delta_mapped),
        (_roaring_parse, _synth_roaring),
        (_iceberg_read, _synth_iceberg_kind("deletes")),
        (_iceberg_read, _synth_iceberg_kind("stats")),
        (_iceberg_read, _synth_iceberg_kind("transforms")),
        (_iceberg_read, _synth_iceberg_kind("eqdeletes")),
        (deltalog.read_delta_snapshot, deltalog.synth_delta_v2checkpoint),
        # r14: ORC record assembly, id-mode mapping, avro/orc data files
        (orcmeta.parse_orc_records, orcmeta.synth_orc_data),
        (deltalog.read_delta_snapshot, _synth_delta_mapped_id),
        (_iceberg_read, _synth_iceberg_kind("avrodata")),
        (_iceberg_read, _synth_iceberg_orcdata),
    ]
    fn, synth = table[which]
    cases = [noise]
    if synth is not None:
        base = bytearray(synth(7))
        for _ in range(3):
            b = bytearray(base)
            for _ in range(rng.randrange(1, 4)):
                b[rng.randrange(len(b))] ^= 1 << rng.randrange(8)
            if rng.random() < 0.5:
                b = b[: rng.randrange(len(b))]
            cases.append(bytes(b))
    for c in cases:
        try:
            fn(c)
        except (ValueError, NotImplementedError):
            pass


@settings(max_examples=18, deadline=None)
@given(
    st.lists(
        st.one_of(st.none(), st.integers(-(10**12), 10**12)),
        min_size=1, max_size=300,
    ),
    st.lists(st.text(max_size=12), min_size=1, max_size=50),
    st.integers(1, 80),
    st.sampled_from(["snappy", "zstd", "gzip", "none"]),
    st.sampled_from(
        [True, False, "delta", "delta_len", "split"]  # r12 encodings
    ),
    st.sampled_from(["1.0", "2.0"]),
)
def test_parquet_data_decode_matches_pyarrow(ints, strs, rg, codec, use_dict, dpv):
    """pyarrow writes a real parquet file for arbitrary nullable-int64,
    string and double columns under every writer mode (codecs, dict
    on/off, data page v1/v2, row-group splits); the in-repo page-stream
    decode (parse_parquet_data) must recover exact value/null counts and
    content sums — no pyarrow on the read path."""
    import io
    import math

    import pyarrow as pa
    import pyarrow.parquet as pq

    from flink_gmall2024_realtime_spark.operators.parquetmeta import (
        parse_parquet_data,
    )

    n = len(ints)
    strs = (strs * ((n + len(strs) - 1) // len(strs)))[:n]
    dbls = [j * 0.25 for j in range(n)]
    t = pa.table({
        "a": pa.array(ints, type=pa.int64()),
        "s": strs,
        "x": pa.array(dbls, type=pa.float64()),
    })
    buf = io.BytesIO()
    if use_dict in (True, False):
        kw = {"use_dictionary": use_dict}
    else:
        kw = {
            "use_dictionary": False,
            "column_encoding": {
                "a": "DELTA_BINARY_PACKED",
                "s": "DELTA_BYTE_ARRAY" if use_dict == "delta"
                else "DELTA_LENGTH_BYTE_ARRAY",
                "x": "BYTE_STREAM_SPLIT" if use_dict == "split" else "PLAIN",
            },
        }
    pq.write_table(
        t, buf, row_group_size=rg, compression=codec,
        data_page_version=dpv, **kw,
    )
    rows = {r[0]: r[1:] for r in parse_parquet_data(buf.getvalue())}
    defined = [v for v in ints if v is not None]
    assert rows["a"] == (
        len(defined), n - len(defined),
        sum(defined) if defined else 0, None, None,
    ) or (not defined and rows["a"][:2] == (0, n))
    assert rows["s"][0] == n and rows["s"][4] == sum(
        len(s.encode()) for s in strs
    )
    assert rows["x"][0] == n and math.isclose(rows["x"][3], sum(dbls))


def test_parquet_data_decode_corruption_and_seams():
    """Tampered pages and out-of-scope shapes fail loudly: flipped page
    bytes raise (codec CRC/structure or count mismatch), nested schemas
    hit NotImplementedError in the FLAT decoder (parse_parquet_records
    owns them since r12), and the delta encodings decode exactly."""
    import io

    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest as _pytest

    from flink_gmall2024_realtime_spark.operators.parquetmeta import (
        parse_parquet_data,
        synth_parquet_data,
    )

    base = synth_parquet_data(13)  # snappy, dict on, v1
    assert parse_parquet_data(base)
    bad = bytearray(base)
    bad[40] ^= 0xFF  # inside the first page stream
    try:
        parse_parquet_data(bytes(bad))
    except (ValueError, NotImplementedError):
        pass
    # nested schema is the documented seam
    t = pa.table({"outer": [{"inner": 1}, {"inner": 2}]})
    buf = io.BytesIO()
    pq.write_table(t, buf)
    with _pytest.raises(NotImplementedError, match="nested"):
        parse_parquet_data(buf.getvalue())
    # DELTA_BINARY_PACKED entered scope in r12: it must decode exactly
    t2 = pa.table({"k": pa.array(range(50), type=pa.int64())})
    buf2 = io.BytesIO()
    pq.write_table(
        t2, buf2, use_dictionary=False,
        column_encoding={"k": "DELTA_BINARY_PACKED"}, version="2.6",
    )
    rows = {r[0]: r[1:] for r in parse_parquet_data(buf2.getvalue())}
    assert rows["k"] == (50, 0, sum(range(50)), None, None)


@settings(max_examples=20, deadline=None)
@given(st.binary(min_size=0, max_size=2000), st.integers(1, 19), st.randoms())
def test_zstd_dictionary_frames_cli_both_directions(data, level, rng):
    """Dictionary frames (r11): the real zstd CLI compresses with -D
    against raw-content AND trained-style dictionaries and the in-repo
    decoder must reproduce the bytes with the dictionary seeding window/
    entropy/repcodes; symmetrically the in-repo dictionary-frame writer's
    output must decode under zstd -d -D."""
    import shutil
    import subprocess
    import tempfile
    import os

    from flink_gmall2024_realtime_spark.operators.zstdcodec import (
        zstd_compress,
        zstd_decompress,
    )

    if shutil.which("zstd") is None:
        pytest.skip("zstd CLI not available")
    # raw-content dictionary sharing vocabulary with the payload
    words = [data[i : i + 7] or b"pad" for i in range(0, max(len(data), 1), 7)]
    dictionary = b"|".join(words[:40]) + b"|shared-boilerplate|" * 3
    with tempfile.TemporaryDirectory() as td:
        dpath = os.path.join(td, "raw.dict")
        ipath = os.path.join(td, "in.bin")
        opath = os.path.join(td, "out.zst")
        with open(dpath, "wb") as f:
            f.write(dictionary)
        with open(ipath, "wb") as f:
            f.write(data)
        r = subprocess.run(
            ["zstd", f"-{level}", "-D", dpath, "-f", "-q", ipath, "-o", opath],
            capture_output=True,
        )
        assert r.returncode == 0, r.stderr
        with open(opath, "rb") as f:
            payload = f.read()
        assert zstd_decompress(payload, dictionary=dictionary) == data
        # our writer -> CLI reader
        ours = zstd_compress(data, dictionary=dictionary)
        assert zstd_decompress(ours, dictionary=dictionary) == data
        wpath = os.path.join(td, "ours.zst")
        rpath = os.path.join(td, "cli.out")
        with open(wpath, "wb") as f:
            f.write(ours)
        r = subprocess.run(
            ["zstd", "-d", "-D", dpath, "-f", "-q", wpath, "-o", rpath],
            capture_output=True,
        )
        assert r.returncode == 0, r.stderr
        with open(rpath, "rb") as f:
            assert f.read() == data


def test_zstd_trained_dictionary_decode():
    """A zstd --train structured dictionary (magic + entropy tables +
    repcodes): parse_zstd_dictionary reads its entropy section and the
    decoder uses it for CLI frames at several levels; wrong-dictionary
    and missing-dictionary cases raise, never return wrong bytes."""
    import shutil
    import subprocess
    import tempfile
    import os
    import random as _random

    from flink_gmall2024_realtime_spark.operators.zstdcodec import (
        ZDICT_MAGIC,
        parse_zstd_dictionary,
        zstd_compress,
        zstd_decompress,
    )

    if shutil.which("zstd") is None:
        pytest.skip("zstd CLI not available")
    rng = _random.Random(11)
    words = ["alpha", "beta", "gamma", "delta", "common", "header", "spark"]
    with tempfile.TemporaryDirectory() as td:
        samples = []
        for i in range(80):
            p = os.path.join(td, f"s{i:03d}.txt")
            with open(p, "w") as f:
                f.write(
                    "HDR-v1 " + " ".join(rng.choice(words) for _ in range(60))
                )
            samples.append(p)
        dpath = os.path.join(td, "trained.dict")
        r = subprocess.run(
            ["zstd", "--train", *samples, "-o", dpath, "--maxdict=2048", "-q"],
            capture_output=True,
        )
        if r.returncode != 0:
            pytest.skip(f"zstd --train unavailable: {r.stderr[:100]!r}")
        with open(dpath, "rb") as f:
            trained = f.read()
        info = parse_zstd_dictionary(trained)
        assert info["dict_id"] != 0 and info["entropy"] is not None
        import struct as _struct

        assert _struct.unpack_from("<I", trained, 0)[0] == ZDICT_MAGIC
        data = b"HDR-v1 " + b" ".join(
            rng.choice(words).encode() for _ in range(100)
        )
        ipath = os.path.join(td, "in.bin")
        opath = os.path.join(td, "out.zst")
        with open(ipath, "wb") as f:
            f.write(data)
        for level in (1, 9, 19):
            subprocess.run(
                ["zstd", f"-{level}", "-D", dpath, "-f", "-q", ipath, "-o", opath],
                check=True,
            )
            with open(opath, "rb") as f:
                payload = f.read()
            assert zstd_decompress(payload, dictionary=trained) == data
            # missing dictionary: loud, typed
            with pytest.raises(ValueError, match="dictionary"):
                zstd_decompress(payload)
        # our structured-dict writer leg: DID is written and enforced
        ours = zstd_compress(data, dictionary=trained)
        assert zstd_decompress(ours, dictionary=trained) == data
        with pytest.raises(ValueError, match="dictionary"):
            zstd_decompress(ours)


def test_orc_rlev2_spec_examples():
    """The four worked byte examples from the ORC v1 spec's Integer RLE
    v2 section decode exactly: short-repeat, direct, delta, and
    patched-base (incl. the 14-bit patch entry carrying the 1000000
    outlier)."""
    from flink_gmall2024_realtime_spark.operators.orcmeta import _rlev2

    assert _rlev2(bytes([0x0A, 0x27, 0x10]), 5, False) == [10000] * 5
    assert _rlev2(
        bytes([0x5E, 0x03, 0x5C, 0xA1, 0xAB, 0x1E, 0xDE, 0xAD, 0xBE, 0xEF]),
        4,
        False,
    ) == [23713, 43806, 57005, 48879]
    assert _rlev2(
        bytes([0xC6, 0x09, 0x02, 0x02, 0x22, 0x42, 0x42, 0x46]), 10, False
    ) == [2, 3, 5, 7, 11, 13, 17, 19, 23, 29]
    pb = bytes(
        [0x8E, 0x13, 0x2B, 0x21, 0x07, 0xD0, 0x1E, 0x00, 0x14, 0x70,
         0x28, 0x32, 0x3C, 0x46, 0x50, 0x5A, 0x64, 0x6E, 0x78, 0x82,
         0x8C, 0x96, 0xA0, 0xAA, 0xB4, 0xBE, 0xFC, 0xE8]
    )
    assert _rlev2(pb, 20, False) == [2030, 2000, 2020, 1000000] + list(
        range(2040, 2200, 10)
    )


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.one_of(st.none(), st.integers(-(10**14), 10**14)),
        min_size=1,
        max_size=300,
    ),
    st.sampled_from(["uncompressed", "zlib", "snappy", "lz4", "zstd"]),
    st.sampled_from([0.0, 1.0]),
    st.randoms(),
)
def test_orc_data_decode_matches_pyarrow(ks, comp, dict_thr, rng):
    """parse_orc_data vs ground truth on REAL pyarrow-written ORC across
    all five compression kinds, dictionary and direct string encodings,
    nullable longs, and random string/double columns."""
    import io

    import pyarrow as pa
    import pyarrow.orc as orc

    from flink_gmall2024_realtime_spark.operators.orcmeta import parse_orc_data

    n = len(ks)
    vs = [None if rng.random() < 0.1 else "s" * rng.randrange(0, 9) for _ in range(n)]
    ds = [rng.random() * 100 for _ in range(n)]
    t = pa.table(
        {
            "k": pa.array(ks, pa.int64()),
            "v": pa.array(vs, pa.string()),
            "d": pa.array(ds, pa.float64()),
        }
    )
    buf = io.BytesIO()
    orc.write_table(
        t, buf, compression=comp, dictionary_key_size_threshold=dict_thr,
        stripe_size=4096,
    )
    got = {r[0]: tuple(r) for r in parse_orc_data(buf.getvalue())}
    assert got["k"] == (
        "k",
        sum(1 for x in ks if x is not None),
        sum(1 for x in ks if x is None),
        sum(x for x in ks if x is not None),
        None,
        None,
    )
    assert got["v"] == (
        "v",
        sum(1 for x in vs if x is not None),
        sum(1 for x in vs if x is None),
        None,
        None,
        sum(len(x) for x in vs if x is not None),
    )
    assert abs(got["d"][4] - sum(ds)) < 1e-6


def test_orc_data_string_bytelen_is_encoded_bytes_not_chars():
    """Non-ASCII strings: byte_len must be the ENCODED UTF-8 byte count
    (parse_parquet_data's convention), not len() over decoded python
    strings (ADVICE r14 — the refactor regressed this; ASCII fixtures
    hid it). Checked for both DIRECT and DICTIONARY encodings."""
    import io

    import pyarrow as pa
    import pyarrow.orc as orc

    from flink_gmall2024_realtime_spark.operators.orcmeta import parse_orc_data

    vs = ["héllo", "日本語", "naïve", None, "ascii", "日本語"] * 20
    for dict_thr in (0.0, 1.0):
        t = pa.table({"v": pa.array(vs, pa.string())})
        buf = io.BytesIO()
        orc.write_table(
            t, buf, compression="uncompressed",
            dictionary_key_size_threshold=dict_thr,
        )
        got = {r[0]: tuple(r) for r in parse_orc_data(buf.getvalue())}
        assert got["v"][5] == sum(
            len(x.encode("utf-8")) for x in vs if x is not None
        )


def test_orc_rlev2_all_subencodings_exercised_by_pyarrow():
    """Coverage proof: real pyarrow output drives the direct, delta AND
    patched-base RLEv2 paths (the spy counts runs per sub-encoding);
    short-repeat is pinned by the spec-example unit above."""
    import io
    import random as _random

    import pyarrow as pa
    import pyarrow.orc as orc

    from flink_gmall2024_realtime_spark.operators import orcmeta

    spy: dict = {}
    orcmeta._RLE_SPY = spy
    try:
        rng = _random.Random(2)

        def feed(ks):
            t = pa.table({"k": pa.array(ks, pa.int64())})
            buf = io.BytesIO()
            orc.write_table(t, buf, compression="uncompressed")
            got = orcmeta.parse_orc_data(buf.getvalue())
            assert got[0][3] == sum(ks)

        feed(list(range(0, 5000, 3)))  # monotonic -> delta
        outliers = [rng.randrange(1000) for _ in range(3000)]
        for j in range(0, 3000, 97):
            outliers[j] = 10**14 + j  # -> patched base
        feed(outliers)
        feed([rng.randrange(2**40) for _ in range(1500)])  # wide -> direct
    finally:
        orcmeta._RLE_SPY = None
    assert spy.get(1) and spy.get(2) and spy.get(3), spy


@settings(max_examples=15, deadline=None)
@given(st.integers(1, 200), st.integers(0, 2**32 - 1),
       st.sampled_from(["uncompressed", "zlib", "snappy", "lz4", "zstd"]))
def test_orc_data_decode_wide_types_match_pyarrow(n, seed, comp):
    """parse_orc_data across the full primitive surface — boolean (bit
    RLE), tinyint (byte RLE), short/int (RLEv2), float, date (days), and
    timestamp incl. the C++ writer's pre-2015 convention (trunc-toward-
    zero seconds with SIGNED two's-complement nanos, trailing-zeros-
    minus-one low bits) — vs ground truth on pyarrow-written files."""
    import calendar
    import datetime
    import io
    import random as _random

    import pyarrow as pa
    import pyarrow.orc as orc

    from flink_gmall2024_realtime_spark.operators.orcmeta import parse_orc_data

    rng = _random.Random(seed)
    bs = [None if rng.random() < 0.1 else rng.random() < 0.5 for _ in range(n)]
    i8 = [None if rng.random() < 0.1 else rng.randrange(-128, 128) for _ in range(n)]
    i32 = [rng.randrange(-(2**31), 2**31) for _ in range(n)]
    dts = [
        None if rng.random() < 0.1 else
        datetime.date(1930 + rng.randrange(140), rng.randrange(1, 13), rng.randrange(1, 28))
        for _ in range(n)
    ]
    tss = [
        None if rng.random() < 0.1 else
        datetime.datetime(
            1940 + rng.randrange(120), rng.randrange(1, 13), rng.randrange(1, 28),
            rng.randrange(24), rng.randrange(60), rng.randrange(60),
            rng.randrange(10**6),
        )
        for _ in range(n)
    ]
    t = pa.table(
        {
            "b": pa.array(bs, pa.bool_()),
            "i8": pa.array(i8, pa.int8()),
            "i32": pa.array(i32, pa.int32()),
            "dt": pa.array(dts, pa.date32()),
            "ts": pa.array(tss, pa.timestamp("us")),
        }
    )
    buf = io.BytesIO()
    orc.write_table(t, buf, compression=comp)
    got = {r[0]: tuple(r) for r in parse_orc_data(buf.getvalue())}
    epoch = datetime.date(1970, 1, 1)

    def micros(x):
        return calendar.timegm(x.timetuple()) * 1_000_000 + x.microsecond

    assert got["b"][3] == sum(1 for x in bs if x)
    assert got["i8"][3] == sum(x for x in i8 if x is not None)
    assert got["i32"][3] == sum(i32)
    assert got["dt"][3] == sum((x - epoch).days for x in dts if x is not None)
    assert got["ts"][3] == sum(micros(x) for x in tss if x is not None)
    assert got["ts"][1] == sum(1 for x in tss if x is not None)


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.fixed_dictionaries(
            {
                "s": st.one_of(
                    st.none(),
                    st.fixed_dictionaries(
                        {
                            "name": st.one_of(st.none(), st.text(max_size=8)),
                            "n": st.one_of(st.none(), st.integers(-(10**9), 10**9)),
                            "flag": st.one_of(st.none(), st.booleans()),
                            "tags": st.one_of(
                                st.none(),
                                st.lists(st.text(max_size=5), max_size=4),
                            ),
                            "kv": st.one_of(
                                st.none(),
                                st.dictionaries(
                                    st.text(min_size=1, max_size=4),
                                    st.one_of(st.none(), st.text(max_size=4)),
                                    max_size=3,
                                ),
                            ),
                        }
                    ),
                ),
                "top": st.one_of(st.none(), st.integers(0, 10**6)),
            }
        ),
        min_size=1,
        max_size=60,
    ),
    st.integers(1, 20),
    st.sampled_from(["snappy", "zstd", "none"]),
    st.booleans(),
    st.sampled_from(["1.0", "2.0"]),
)
def test_parquet_nested_records_match_pyarrow(rows, rg, codec, use_dict, dpv):
    """pyarrow (the reference C++ writer) writes arbitrary nested tables
    — structs holding optional scalars, bools, a list<string> and a
    map<string,string> — under every writer mode; the in-repo Dremel
    assembly (parse_parquet_records) must reproduce pyarrow's OWN reader
    output per leaf, records, nulls, empty-vs-null lists and all."""
    import io

    import pyarrow as pa
    import pyarrow.parquet as pq

    from flink_gmall2024_realtime_spark.operators.parquetmeta import (
        parse_parquet_records,
    )

    schema = pa.schema(
        [
            (
                "s",
                pa.struct(
                    [
                        ("name", pa.string()),
                        ("n", pa.int64()),
                        ("flag", pa.bool_()),
                        ("tags", pa.list_(pa.string())),
                        ("kv", pa.map_(pa.string(), pa.string())),
                    ]
                ),
            ),
            ("top", pa.int64()),
        ]
    )
    pyrows = [
        {
            "s": None
            if r["s"] is None
            else {
                "name": r["s"]["name"],
                "n": r["s"]["n"],
                "flag": r["s"]["flag"],
                "tags": r["s"]["tags"],
                "kv": None if r["s"]["kv"] is None else list(r["s"]["kv"].items()),
            },
            "top": r["top"],
        }
        for r in rows
    ]
    t = pa.Table.from_pylist(pyrows, schema=schema)
    buf = io.BytesIO()
    pq.write_table(
        t, buf, row_group_size=rg, compression=codec,
        use_dictionary=use_dict, data_page_version=dpv,
    )
    got = parse_parquet_records(buf.getvalue())
    # reference: pyarrow's own reader on the same bytes
    ref = pq.read_table(io.BytesIO(buf.getvalue())).to_pylist()

    def enc(v):
        return v.encode() if isinstance(v, str) else v

    for i, r in enumerate(ref):
        s = r["s"]
        assert got["top"][i] == r["top"]
        assert got["s.name"][i] == (None if s is None else enc(s["name"]))
        assert got["s.n"][i] == (None if s is None else s["n"])
        assert got["s.flag"][i] == (None if s is None else s["flag"])
        exp_tags = None if s is None or s["tags"] is None else [enc(x) for x in s["tags"]]
        assert got["s.tags.list.element"][i] == exp_tags
        if s is None or s["kv"] is None:
            assert got["s.kv.key_value.key"][i] is None
        else:
            assert got["s.kv.key_value.key"][i] == [enc(k) for k, _ in s["kv"]]
            assert got["s.kv.key_value.value"][i] == [enc(v) for _, v in s["kv"]]


@settings(max_examples=12, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(1, 24),
            st.integers(1, 16),
            st.integers(0, 10_000),
            st.sampled_from([(0,), (1,), (2,), (3,), (4,), (0, 1, 2, 3, 4), (3, 4)]),
        ),
        min_size=1,
        max_size=24,
    ),
    st.booleans(),
)
def test_png_batch_decode_matches_single(shapes, interlace_some):
    """The r12 wavefront batch decoder (Average/Paeth x-scan vectorized
    ACROSS images) must be byte-equivalent to per-image decode_png on
    arbitrary mixed batches — sizes, filter mixes, interlaced members,
    batch widths above and below the scalar-fallback threshold."""
    from flink_gmall2024_realtime_spark.operators.multimodal import (
        decode_png,
        decode_png_batch,
        synth_png_interlaced,
        synth_png_random,
    )

    payloads = []
    for i, (w, h, seed, filters) in enumerate(shapes):
        if interlace_some and i % 3 == 2:
            payloads.append(synth_png_interlaced(seed))
        else:
            payloads.append(synth_png_random(w, h, seed=seed, filters=filters))
    assert decode_png_batch(payloads) == [decode_png(p) for p in payloads]


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.one_of(
            st.none(),
            st.decimals(
                min_value=-10**9, max_value=10**9, places=3,
                allow_nan=False, allow_infinity=False,
            ),
        ),
        min_size=1,
        max_size=120,
    ),
    st.booleans(),
    st.sampled_from(["1.0", "2.0"]),
)
def test_parquet_decimal_flba_matches_pyarrow(decs, use_dict, dpv):
    """r12: FIXED_LEN_BYTE_ARRAY (decimal128) and the decimal_unscaled
    helper reproduce pyarrow-written decimals exactly under writer
    variety, nulls included."""
    import decimal
    import io

    import pyarrow as pa
    import pyarrow.parquet as pq

    from flink_gmall2024_realtime_spark.operators.parquetmeta import (
        decimal_unscaled,
        parse_parquet_records,
    )

    t = pa.table({"dec": pa.array(decs, pa.decimal128(15, 3))})
    buf = io.BytesIO()
    pq.write_table(t, buf, use_dictionary=use_dict, data_page_version=dpv)
    rec = parse_parquet_records(buf.getvalue())
    got = [
        None if v is None else decimal.Decimal(decimal_unscaled(v)).scaleb(-3)
        for v in rec["dec"]
    ]
    assert got == decs


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.one_of(st.none(), st.integers(-(10**12), 10**12)),
        min_size=1, max_size=200,
    ),
    st.lists(st.text(max_size=10), min_size=1, max_size=40),
    st.sampled_from(["zlib", "snappy", "lz4", "zstd", "uncompressed"]),
    st.integers(1, 50),
)
def test_orc_record_assembly_matches_pyarrow(ints, strs, comp, stripe_rows):
    """r14: pyarrow writes a real ORC file for arbitrary nullable-int64,
    string and double columns under every codec and stripe split; the
    in-repo RECORD ASSEMBLY (parse_orc_records — PRESENT-stream null
    re-interleave over the shared stripe decode) must reproduce
    pyarrow's own reader row-for-row."""
    import io

    import pyarrow as pa
    from pyarrow import orc

    from flink_gmall2024_realtime_spark.operators.orcmeta import (
        parse_orc_records,
    )

    n = len(ints)
    strs = (strs * ((n + len(strs) - 1) // len(strs)))[:n]
    dbls = [j * 0.25 for j in range(n)]
    t = pa.table(
        {
            "a": pa.array(ints, type=pa.int64()),
            "s": strs,
            "x": pa.array(dbls, type=pa.float64()),
        }
    )
    buf = io.BytesIO()
    orc.write_table(t, buf, compression=comp, stripe_size=stripe_rows * 64)
    recs = parse_orc_records(buf.getvalue())
    ref = orc.ORCFile(io.BytesIO(buf.getvalue())).read()
    assert recs["a"] == ref["a"].to_pylist()
    assert recs["s"] == ref["s"].to_pylist()
    assert recs["x"] == ref["x"].to_pylist()
    # column projection decodes only what was asked
    assert parse_orc_records(buf.getvalue(), columns=["s"]) == {
        "s": ref["s"].to_pylist()
    }
