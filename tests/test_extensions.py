"""Behavioral tests for the training-data-pipeline extensions: recall of
approximate methods vs exact baselines, dedup semantics on crafted
duplicates, multimodal batch shapes."""

import pytest
from pyspark.sql import functions as F

from etl_gamma_spark.operators import multimodal as MM
from etl_gamma_spark.operators.dedup import (
    exact_dedup_keep,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash_signatures,
)
from etl_gamma_spark.operators.similarity import brute_force_topk, lsh_topk
from tests.conftest import SF_CORRECT


# Cached for reuse within this module, UNPERSISTED at teardown: Spark's
# cache manager substitutes InMemoryTableScan for ANY later plan reading
# the same parquet path — a leaked cache made test_plan_quality's
# PushedFilters assertions vacuous for the rest of the session.
@pytest.fixture(scope="module")
def docs(spark):
    df = spark.read.parquet(f"{SF_CORRECT}/documents.parquet").cache()
    yield df
    df.unpersist()


@pytest.fixture(scope="module")
def emb(spark):
    df = spark.read.parquet(f"{SF_CORRECT}/embeddings.parquet").cache()
    yield df
    df.unpersist()


def test_exact_dedup_keeps_smallest_id(spark):
    df = spark.createDataFrame(
        [(1, "same text"), (5, "same text"), (3, "  SAME   text "), (2, "other")],
        "doc_id long, text string",
    )
    kept = {r.doc_id for r in exact_dedup_keep(df).collect()}
    # 1, 5, 3 normalize to the same fingerprint → keeper is 1
    assert kept == {1, 2}


def test_minhash_estimates_track_true_jaccard(spark, docs):
    pairs = minhash_lsh_pairs(docs).cache()
    try:
        assert pairs.count() > 0, "LSH produced no candidate pairs"
        true = ngram_jaccard_pairs(docs, threshold=0.0)
        joined = pairs.join(true, ["doc_a", "doc_b"])
        err = joined.select(
            F.avg(F.abs(F.col("est_jaccard") - F.col("jaccard"))).alias("mae")
        ).first()
        # K=16 weak permutations → loose but real tracking
        assert err.mae is not None and err.mae < 0.35
    finally:
        pairs.unpersist()


def test_high_jaccard_pairs_are_lsh_candidates(spark, docs):
    # LSH (4 bands × 4 rows) should catch nearly all truly similar pairs
    true = ngram_jaccard_pairs(docs, threshold=0.5)
    n_true = true.count()
    if n_true == 0:
        pytest.skip("no pairs above 0.5 at this scale factor")
    cand = minhash_lsh_pairs(docs).select("doc_a", "doc_b")
    recall = true.join(cand, ["doc_a", "doc_b"]).count() / n_true
    assert recall >= 0.8


def test_simhash_identical_docs_equal_signatures(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha beta gamma"), (3, "unrelated words here")],
        "doc_id long, text string",
    )
    sig = {r.doc_id: r.simhash for r in simhash_signatures(df).collect()}
    assert sig[1] == sig[2]
    assert sig[1] != sig[3]


def test_lsh_topk_recall_vs_brute_force(spark, emb):
    exact = [r.vec_id for r in brute_force_topk(emb, query_id=0, k=10).collect()]
    approx = [r.vec_id for r in lsh_topk(emb, query_id=0, k=10).collect()]
    assert len(approx) > 0
    # 8 hyperplanes on random-ish vectors: expect meaningful overlap, not
    # perfection — pin the empirically observed floor
    overlap = len(set(exact) & set(approx)) / 10
    assert overlap >= 0.2, f"LSH recall collapsed: {overlap}"


def test_media_features_shape(spark, docs):
    media = MM.synth_media(docs)
    feats = MM.extract_features(media, n_features=8).collect()
    assert len(feats) == docs.count()
    assert all(len(r.features) == 8 for r in feats)
    assert all(0.0 <= v <= 1.0 for r in feats for v in r.features)
    # determinism across runs
    feats2 = MM.extract_features(media, n_features=8).collect()
    assert sorted((r.media_id, tuple(r.features)) for r in feats) == sorted(
        (r.media_id, tuple(r.features)) for r in feats2
    )


def test_media_frame_sampling_counts(spark, docs):
    media = MM.synth_media(docs)
    frames = MM.sample_frames(media, every_n=10)
    per_media = {r.media_id: r.n for r in frames.groupBy("media_id").agg(F.count("*").alias("n")).collect()}
    metas = {
        r.media_id: r.meta.n_frames
        for r in media.filter(F.col("kind") == "video").select("media_id", "meta").collect()
    }
    assert set(per_media) == set(metas)
    for mid, n_frames in metas.items():
        assert per_media[mid] == (n_frames + 9) // 10


def test_neardup_clusters_match_union_find(spark, docs):
    from etl_gamma_spark.operators.dedup import neardup_clusters

    pairs = minhash_lsh_pairs(docs).filter(F.col("est_jaccard") >= 0.3).cache()
    try:
        labels = {
            r.doc_id: r.cluster_id for r in neardup_clusters(docs, pairs).collect()
        }
        # reference union-find on the collected edge list
        parent = {r.doc_id: r.doc_id for r in docs.select("doc_id").collect()}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for r in pairs.collect():
            ra, rb = find(r.doc_a), find(r.doc_b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        expected = {d: find(d) for d in parent}
        assert labels == expected
    finally:
        pairs.unpersist()


def test_stratified_sample_deterministic_and_bounded(spark, docs):
    from etl_gamma_spark.operators.dedup import stratified_sample

    s1 = stratified_sample(docs, keep_pct={"en": 30}, default_pct=50)
    s2 = stratified_sample(docs, keep_pct={"en": 30}, default_pct=50)
    a = sorted(r.doc_id for r in s1.collect())
    assert a == sorted(r.doc_id for r in s2.collect())
    rates = {
        r.lang: r.rate
        for r in s1.groupBy("lang").count()
        .join(docs.groupBy("lang").count().withColumnRenamed("count", "total"), "lang")
        .selectExpr("lang", "count / total AS rate").collect()
    }
    assert 0.1 < rates["en"] < 0.5   # target 0.30
    for lang, rate in rates.items():
        if lang != "en":
            assert 0.3 < rate < 0.7  # target 0.50


def test_ivf_topk_recall_vs_brute_force(spark, emb):
    from etl_gamma_spark.operators.similarity import ivf_topk

    exact = [r.vec_id for r in brute_force_topk(emb, query_id=0, k=10).collect()]
    approx = [r.vec_id for r in ivf_topk(emb, query_id=0, k=10, n_probe=4).collect()]
    assert len(approx) == 10
    overlap = len(set(exact) & set(approx)) / 10
    assert overlap >= 0.2, f"IVF recall collapsed: {overlap}"
    # determinism across runs (fixed init, fixed iterations)
    approx2 = [r.vec_id for r in ivf_topk(emb, query_id=0, k=10, n_probe=4).collect()]
    assert approx == approx2


def test_embedding_neardup_recall_vs_exact(spark, emb):
    from etl_gamma_spark.operators.similarity import (
        cosine_expr,
        embedding_neardup_pairs,
    )

    approx = {(r.id_a, r.id_b) for r in embedding_neardup_pairs(emb).collect()}
    assert len(approx) > 0
    a = emb.selectExpr("vec_id AS id_a", "embedding AS v_a")
    b = emb.selectExpr("vec_id AS id_b", "embedding AS v_b")
    exact = {
        (r.id_a, r.id_b)
        for r in a.join(b, F.expr("id_a < id_b"))
        .selectExpr("id_a", "id_b", f"{cosine_expr('v_a', 'v_b')} AS c")
        .filter("c >= 0.35")
        .collect()
    }
    assert approx <= exact  # no false positives (exact verify stage)
    recall = len(approx) / len(exact)
    assert recall >= 0.5, f"neardup recall {recall}"


def test_periodo_array_f13_form(spark):
    # reference F13 (kpi_fechamento_m_presente/extract.py:169-172) builds
    # periodo_responsabilidade as DATE[inicio, fim]; the registered driver
    # query carries the flattened pair — the array form is the library API
    from pyspark.sql import types as Ty

    from etl_gamma_spark.plans.fechamento import periodo_array
    from etl_gamma_spark.registry import QUERIES

    base = QUERIES["fechamento_m_presente"](spark, SF_CORRECT)
    out = periodo_array(base)
    field = out.schema["periodo_responsabilidade"]
    assert isinstance(field.dataType, Ty.ArrayType)
    assert isinstance(field.dataType.elementType, Ty.DateType)
    row = out.select("periodo_inicio", "periodo_fim", "periodo_responsabilidade").first()
    assert row.periodo_responsabilidade == [row.periodo_inicio, row.periodo_fim]


def test_winnowing_guarantee_shared_substring(spark):
    """MOSS theorem (Schleimer et al. §3): any shared substring of length
    >= k + w - 1 contributes at least one shared fingerprint. Random doc
    pairs with an injected common chunk must always overlap; pairs drawn
    from disjoint alphabets never can."""
    import random
    import string

    from etl_gamma_spark.functions.text import WINNOW_K, WINNOW_W
    from etl_gamma_spark.operators.dedup import winnow_fingerprints

    rng = random.Random(42)
    guarantee_len = WINNOW_K + WINNOW_W - 1

    def rand_text(alphabet, lo=20, hi=200):
        return "".join(rng.choice(alphabet) for _ in range(rng.randint(lo, hi)))

    rows = []
    n_pairs = 50
    for i in range(n_pairs):
        shared = rand_text(string.ascii_lowercase, guarantee_len, 40)
        for j in (0, 1):
            base = rand_text(string.ascii_lowercase)
            pos = rng.randint(0, len(base))
            rows.append((2 * i + j, base[:pos] + shared + base[pos:]))
    # disjoint-alphabet pairs: no common k-gram is possible
    for i in range(n_pairs, n_pairs + 10):
        rows.append((2 * i, rand_text("abcdefgh")))
        rows.append((2 * i + 1, rand_text("stuvwxyz")))

    docs = spark.createDataFrame(rows, "doc_id long, text string")
    fps = winnow_fingerprints(docs)
    a = fps.selectExpr("doc_id AS doc_a", "fp")
    b = fps.selectExpr("doc_id AS doc_b", "fp")
    overlapping = {
        (r.doc_a, r.doc_b)
        for r in a.join(b, "fp")
        .filter("doc_b = doc_a + 1 AND doc_a % 2 = 0")
        .select("doc_a", "doc_b")
        .distinct()
        .collect()
    }
    for i in range(n_pairs):
        assert (2 * i, 2 * i + 1) in overlapping, f"pair {i} lost its shared chunk"
    for i in range(n_pairs, n_pairs + 10):
        assert (2 * i, 2 * i + 1) not in overlapping, f"disjoint pair {i} overlaps"


# --- round-5 batch 2: chunk dedup, CDC merge, events analytics, tf-idf ----


def test_chunk_dedup_keeps_first_occurrence_and_reassembles(spark):
    from etl_gamma_spark.operators.dedup import chunk_dedup

    boiler = " ".join(f"b{i}" for i in range(10))  # exactly one 10-word chunk
    uniq1 = " ".join(f"u{i}" for i in range(10))
    uniq3 = " ".join(f"v{i}" for i in range(10))
    df = spark.createDataFrame(
        [
            (1, f"{boiler} {uniq1}"),  # first occurrence of boiler kept
            (2, boiler),               # only chunk already seen -> emptied
            (3, f"{boiler} {uniq3}"),  # boiler stripped, tail kept
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in chunk_dedup(df).collect()}
    assert out[1].n_chunks == 2 and out[1].n_kept == 2
    assert out[1].text_clean == f"{boiler} {uniq1}"
    assert out[2].n_chunks == 1 and out[2].n_kept == 0 and out[2].text_clean == ""
    assert out[3].n_chunks == 2 and out[3].n_kept == 1
    assert out[3].text_clean == uniq3


def test_chunk_dedup_short_doc_single_chunk(spark):
    from etl_gamma_spark.operators.dedup import chunk_dedup

    df = spark.createDataFrame(
        [(1, "just three words"), (2, "just three words")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in chunk_dedup(df).collect()}
    assert out[1].n_chunks == 1 and out[1].n_kept == 1
    assert out[2].n_chunks == 1 and out[2].n_kept == 0


def test_apply_changes_exercises_all_four_branches(spark):
    from etl_gamma_spark.operators.cdc import apply_changes

    base = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 30)], "key long, v long"
    )
    changes = spark.createDataFrame(
        [
            (2, 99, "U"),  # matched update
            (3, 0, "D"),   # matched delete
            (4, 44, "U"),  # unmatched insert
            (5, 0, "D"),   # unmatched delete -> no-op
        ],
        "key long, v long, op string",
    )
    got = {r.key: r.v for r in apply_changes(base, changes, "key", ["v"]).collect()}
    assert got == {1: 10, 2: 99, 4: 44}


def test_funnel_requires_strict_temporal_order(spark):
    import datetime as dt

    from etl_gamma_spark.operators.temporal import funnel_steps

    t = lambda s: dt.datetime(2024, 1, 1, 0, 0, s)  # noqa: E731
    rows = [
        (1, t(1), "view"), (1, t(2), "click"), (1, t(3), "purchase"),
        (2, t(5), "click"), (2, t(6), "view"),      # click precedes view
        (3, t(1), "view"), (3, t(1), "click"),      # same ts: strict > fails
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    out = {
        r.step: r.n_users
        for r in funnel_steps(df, ["view", "click", "purchase"]).collect()
    }
    assert out == {"view": 3, "click": 1, "purchase": 1}


def test_retention_cohorts_offsets(spark):
    import datetime as dt

    from etl_gamma_spark.operators.temporal import retention_cohorts

    d = dt.datetime
    rows = [
        (1, d(2024, 1, 1, 5)), (1, d(2024, 1, 1, 9)),  # same day counts once
        (1, d(2024, 1, 3, 6)),
        (2, d(2024, 1, 2, 1)),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {
        (str(r.cohort_day), r.day_offset): r.n_users
        for r in retention_cohorts(df).collect()
    }
    assert got == {
        ("2024-01-01", 0): 1,
        ("2024-01-01", 2): 1,
        ("2024-01-02", 0): 1,
    }


def test_tfidf_prefers_rare_tokens_for_equal_tf(spark):
    from etl_gamma_spark.operators.quality import tfidf_top_terms

    df = spark.createDataFrame(
        [
            (1, "common rare1 common common"),
            (2, "common rare2"),
        ],
        "doc_id long, text string",
    )
    rows = tfidf_top_terms(df, k=2).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append((r.rank, r.token, r.score))
    # doc 2: rare2 (tf 1, df 1 -> 1e6) outranks common (tf 1, df 2 -> 5e5)
    assert sorted(by_doc[2])[0][1] == "rare2"
    # doc 1: tf dominates -- common has tf 3 / df 2 -> 1.5e6 > rare1 1e6
    assert sorted(by_doc[1])[0][1] == "common"


def test_streaming_interval_join_declares_watermarks_both_sides(spark):
    from etl_gamma_spark.io import read_events_stream
    from etl_gamma_spark.streaming.interval_join import view_purchase_join

    df = view_purchase_join(read_events_stream(spark, SF_CORRECT))
    analyzed = str(df._jdf.queryExecution().analyzed())
    # both sides must carry a watermark or the join state grows unbounded
    assert analyzed.count("EventTimeWatermark") == 2, analyzed
    assert "Join Inner" in analyzed


def test_gap_fill_monthly_fills_and_flags(spark):
    import datetime as dt

    from etl_gamma_spark.operators.temporal import gap_fill_monthly

    rows = [
        ("a", dt.date(2024, 1, 1), 10),
        ("a", dt.date(2024, 4, 1), 40),  # gap: feb, mar carry 10
        ("b", dt.date(2024, 2, 1), 7),   # single month, no gaps
    ]
    df = spark.createDataFrame(rows, "k string, mes date, v long")
    got = {
        (r.k, str(r.mes)): (r.v, r.is_observed)
        for r in gap_fill_monthly(df, "k", "mes", "v").collect()
    }
    assert got == {
        ("a", "2024-01-01"): (10, True),
        ("a", "2024-02-01"): (10, False),
        ("a", "2024-03-01"): (10, False),
        ("a", "2024-04-01"): (40, True),
        ("b", "2024-02-01"): (7, True),
    }


def test_streaming_cdc_apply_multi_batch_matches_single_latest(spark, tmp_path):
    """Sequential per-batch application must equal latest-per-key over the
    whole feed — proven with a 3-file source at maxFilesPerTrigger=1 so
    the merge really runs three times."""
    import datetime as dt

    from pyspark.sql import functions as F

    from etl_gamma_spark.streaming.cdc_apply import apply_feed, latest_changes

    rows = []
    for i in range(600):
        rows.append((
            i,
            dt.datetime(2024, 1, 1 + (i * 7) % 28, i % 24, (i * 13) % 60, i % 60),
            i % 40,
            ["view", "purchase", "error", "click"][(i * 3) % 4],
            float(i) / 7.0,
            "{}",
        ))
    feed_df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    src = str(tmp_path / "feed")
    # 3 files -> 3 micro-batches at maxFilesPerTrigger=1
    feed_df.withColumn("__f", F.col("event_id") % 3).repartition(
        "__f"
    ).drop("__f").write.parquet(src)

    out = str(tmp_path / "state")
    spark.createDataFrame([], "key long, val decimal(18,6)").write.parquet(out)
    stream = (
        spark.readStream.schema(feed_df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    apply_feed(stream, out, str(tmp_path / "ckpt"))

    got = {r.key: r.val for r in spark.read.parquet(out).collect()}
    want = {
        r.key: r.val
        for r in latest_changes(feed_df).filter("op = 'U'").select("key", "val").collect()
    }
    assert got == want
    # deletes really removed keys whose overall-latest event is an error
    deleted = {
        r.key for r in latest_changes(feed_df).filter("op = 'D'").collect()
    }
    assert deleted and not (set(got) & deleted)


def test_streaming_cdc_apply_checkpoint_resume_is_exactly_once(spark, tmp_path):
    """Re-running the feed with the SAME checkpoint must process only the
    NEW files: a key touched only by already-committed files keeps a
    manually planted state value (a replay would overwrite it)."""
    import datetime as dt
    import os

    from pyspark.sql import functions as F

    from etl_gamma_spark.streaming.cdc_apply import apply_feed

    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    src = str(tmp_path / "feed")
    os.makedirs(src)
    def write_file(df, name):
        import shutil as _sh

        stage = src + "/_" + name
        df.coalesce(1).write.parquet(stage)
        part = [f for f in os.listdir(stage) if f.endswith(".parquet")][0]
        _sh.move(os.path.join(stage, part), os.path.join(src, name))
        _sh.rmtree(stage)

    a = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1), 100, "view", 1.0, "{}")], schema
    )
    write_file(a, "batchA.parquet")

    out = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    spark.createDataFrame([], "key long, val decimal(18,6)").write.parquet(out)

    def stream():
        return spark.readStream.schema(a.schema).option(
            "maxFilesPerTrigger", 1
        ).parquet(src)

    apply_feed(stream(), out, ckpt)
    assert {r.key for r in spark.read.parquet(out).collect()} == {100}

    # plant a sentinel value for key 100, then add a file touching key 200
    planted = spark.read.parquet(out).withColumn(
        "val",
        F.when(F.col("key") == 100, F.lit(999).cast("decimal(18,6)")).otherwise(
            F.col("val")
        ),
    )
    tmp2 = out + ".tmp"
    planted.write.parquet(tmp2)
    import shutil

    shutil.rmtree(out)
    os.rename(tmp2, out)

    b = spark.createDataFrame(
        [(2, dt.datetime(2024, 1, 2), 200, "click", 2.0, "{}")], schema
    )
    write_file(b, "batchB.parquet")
    apply_feed(stream(), out, ckpt)

    got = {r.key: r.val for r in spark.read.parquet(out).collect()}
    from decimal import Decimal

    assert set(got) == {100, 200}
    assert got[100] == Decimal("999.000000"), "committed batch was replayed"


def test_sq8_topk_recall_and_code_range(spark, emb):
    from etl_gamma_spark.operators.similarity import sq8_codes, sq8_topk

    exact = [r.vec_id for r in brute_force_topk(emb, query_id=0, k=10).collect()]
    approx = [r.vec_id for r in sq8_topk(emb, query_id=0, k=10, rerank=40).collect()]
    assert len(approx) == 10
    # 8-bit codes over 64 dims lose little ranking info; with a 4x rerank
    # pool the overlap floor is far above the LSH/IVF probes'
    overlap = len(set(exact) & set(approx)) / 10
    assert overlap >= 0.6, f"SQ8 recall collapsed: {overlap}"
    # codes are bytes: every component in [0, 255], dim preserved
    rows = sq8_codes(emb).limit(50).collect()
    assert all(len(r.c) == 64 for r in rows)
    assert all(0 <= x <= 255 for r in rows for x in r.c)
    # deterministic across runs (pure function of the corpus)
    approx2 = [r.vec_id for r in sq8_topk(emb, query_id=0, k=10, rerank=40).collect()]
    assert approx == approx2
