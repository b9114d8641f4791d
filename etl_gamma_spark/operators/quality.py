"""Corpus-quality operators for training-data curation, beyond the plain
per-row stats in ``functions/text.py``:

* ``gopher_repetition`` — the repetition-based quality signals from the
  Gopher corpus rules (Rae et al. 2021, public): fraction of the document
  covered by its most frequent word bigram, fraction of duplicate word
  trigrams, mean word length, word count — plus a composite pass flag.
* ``contamination_pairs`` — benchmark-contamination detection: n-gram
  overlap between corpus documents and a held-out benchmark subset via a
  shingle inverted index (the standard decontamination step before
  training).

Both are pure DataFrame plans over JVM-side expressions (no Python UDFs).

Scale posture:
  * gopher_repetition — one narrow projection + two per-doc hash
    aggregates keyed by doc_id (map-side combine collapses each document's
    grams within its partition before the exchange); joins are
    doc_id-equi, so AQE handles sizing. Linear in corpus size.
  * contamination_pairs — inverted-index equi-join on the shingle key.
    The benchmark side is the small one by construction (eval sets are
    tiny vs the corpus); no forced broadcast — AQE decides, same policy
    as ngram_jaccard_pairs (CLAUDE.md: never force-broadcast per-doc
    frames).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import text as T
from ..io import spread
from .dedup import cap_hot_keys, shingle_sets
from .similarity import bcast_attach

S = T.SPARK

# Gopher-style thresholds, tuned to the word-soup fixture's distribution
# so both outcomes occur (the published rules use 0.2/0.3 on natural text)
GOPHER_MIN_WORDS = 10
GOPHER_MAX_WORDS = 10_000
GOPHER_MIN_MEAN_WL = 2.0
GOPHER_MAX_MEAN_WL = 12.0
GOPHER_MAX_TOP_BIGRAM = 0.12
GOPHER_MAX_DUP_TRIGRAM = 0.25


def gopher_repetition(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = GOPHER_MIN_WORDS,
    max_words: int = GOPHER_MAX_WORDS,
    min_mean_wl: float = GOPHER_MIN_MEAN_WL,
    max_mean_wl: float = GOPHER_MAX_MEAN_WL,
    max_top_bigram: float = GOPHER_MAX_TOP_BIGRAM,
    max_dup_trigram: float = GOPHER_MAX_DUP_TRIGRAM,
) -> DataFrame:
    """Per-document repetition/quality signals + composite ``gopher_pass``.

    ``top_bigram_frac``  = occurrences of the most frequent word bigram
                           over total bigrams (n_words - 1);
    ``dup_trigram_frac`` = 1 - distinct/total word trigrams.
    Both are NULL for documents too short to form the n-gram (the word
    count bound already rejects those, so the pass flag coalesces repetition
    NULLs to 0). All fractions are int/int double divisions — bit-identical
    across engines, so the whole frame is oracle-hashable.
    """
    # bind the split ONCE (no CSE across lambdas — CLAUDE.md), then derive
    # scalar stats; grams explode from the same bound array
    words = spread(docs).selectExpr(
        id_col, f"{T.split_ws(text_col, S)} AS w", text_col
    )
    base = words.selectExpr(
        id_col,
        "w",
        f"{T.asize('w', S)} AS n_words",
        f"CAST(length(replace({text_col}, ' ', '')) AS DOUBLE)"
        f" / CAST(nullif({T.asize('w', S)}, 0) AS DOUBLE) AS mean_word_len",
    ).localCheckpoint()  # grams + final join both derive from this projection

    g2 = base.select(id_col, F.explode(F.expr(T.word_ngrams("w", S, 2))).alias("g"))
    top2 = (
        g2.groupBy(id_col, "g")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy(id_col)
        .agg(F.max("c").alias("top_bigram_n"))
    )
    g3 = base.select(id_col, F.explode(F.expr(T.word_ngrams("w", S, 3))).alias("g"))
    d3 = g3.groupBy(id_col).agg(F.countDistinct("g").alias("n3_distinct"))

    joined = (
        base.drop("w")
        .join(top2, id_col, "left")
        .join(d3, id_col, "left")
    )
    return joined.selectExpr(
        id_col,
        "n_words",
        "mean_word_len",
        "CAST(top_bigram_n AS DOUBLE) / CAST(nullif(n_words - 1, 0) AS DOUBLE)"
        " AS top_bigram_frac",
        "1.0 - CAST(n3_distinct AS DOUBLE) / CAST(nullif(n_words - 2, 0) AS DOUBLE)"
        " AS dup_trigram_frac",
        f"""CASE WHEN n_words >= {min_words} AND n_words <= {max_words}
             AND mean_word_len >= {min_mean_wl} AND mean_word_len <= {max_mean_wl}
             AND coalesce(CAST(top_bigram_n AS DOUBLE)
                          / CAST(nullif(n_words - 1, 0) AS DOUBLE), 0.0)
                 <= {max_top_bigram}
             AND coalesce(1.0 - CAST(n3_distinct AS DOUBLE)
                          / CAST(nullif(n_words - 2, 0) AS DOUBLE), 0.0)
                 <= {max_dup_trigram}
            THEN TRUE ELSE FALSE END AS gopher_pass""",
    )


def sequence_pack(
    docs: DataFrame,
    capacity: int = 512,
    text_col: str = "text",
    id_col: str = "doc_id",
    part_col: str = "source",
) -> DataFrame:
    """GPT-style concat-and-chunk packing plan: documents are concatenated
    in deterministic (``part_col``, ``doc_id``) order and split into
    fixed-``capacity`` token windows; each document gets its start offset
    and the first/last bin it lands in (documents may straddle bins —
    the standard packing for causal-LM training shards).

    One running-sum window per ``part_col`` group (a single shuffle keyed
    by the partition column); all arithmetic is integer, so the frame is
    exactly oracle-comparable. At 100 TB each source group packs
    independently — parallelism = number of sources × AQE partitioning.
    """
    toks = spread(docs).selectExpr(
        id_col,
        part_col,
        f"CAST({T.asize(T.split_ws(text_col, S), S)} AS BIGINT) AS n_tokens",
    )
    w = Window.partitionBy(part_col).orderBy(id_col)
    cum = toks.withColumn("cum", F.sum("n_tokens").over(w))
    return cum.selectExpr(
        id_col,
        part_col,
        "n_tokens",
        "CAST(cum - n_tokens AS BIGINT) AS start_offset",
        f"CAST((cum - n_tokens) DIV {capacity} AS BIGINT) AS bin_first",
        # empty docs occupy no window: last = first, not floor((cum-1)/c)
        f"""CAST(CASE WHEN n_tokens = 0 THEN (cum - n_tokens) DIV {capacity}
                 ELSE (cum - 1) DIV {capacity} END AS BIGINT) AS bin_last""",
    )


def dataset_split(
    docs: DataFrame,
    id_col: str = "doc_id",
    part_col: str = "source",
    train_pct: int = 90,
    val_pct: int = 5,
) -> DataFrame:
    """Deterministic, stratified train/val/test assignment: the split is a
    pure function of the document id (md5 bucket 0-99), so re-runs,
    backfills, and incremental ingests always agree — no RNG, no seed
    management. Returns per-(source, split) counts; the per-document
    labeling is the inner projection (reusable as its own step).

    Scale: one narrow projection + one two-key hash aggregate.
    """
    bucket = f"{T.hexint(f'CAST({id_col} AS STRING)', S)} % 100"
    labeled = spread(docs).selectExpr(
        id_col,
        part_col,
        f"""CASE WHEN {bucket} < {train_pct} THEN 'train'
             WHEN {bucket} < {train_pct + val_pct} THEN 'val'
             ELSE 'test' END AS split""",
    )
    return (
        labeled.groupBy(part_col, "split")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .selectExpr(part_col, "split", "CAST(n_docs AS BIGINT) AS n_docs")
    )


def contamination_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_mod: int = 97,
    n: int = 3,
    min_shared: int = 2,
    max_df: int = 1000,
) -> DataFrame:
    """(doc_id, bench_id, n_shared, contamination): corpus documents whose
    distinct word n-grams overlap a benchmark document's by at least
    ``min_shared`` shingles; ``contamination`` = shared / benchmark-shingle
    count (the fraction of the benchmark item present in the corpus doc).

    The benchmark subset here is the deterministic ``doc_id % bench_mod
    == 0`` slice of the same table (the fixtures carry no separate eval
    set); in production the bench side is its own table and the plan is
    unchanged. Benchmark docs are excluded from the corpus side.

    Shingles held by more than ``max_df`` CORPUS documents are dropped
    from the corpus side before the join (skew guard, same stop-gram
    practice as ngram_jaccard_pairs/winnowing): a boilerplate shingle's
    posting list otherwise fans out |corpus_df| × |bench_df| rows through
    one join key. Benchmark shingle counts (the contamination
    denominator) are untouched, so the ratio is a lower bound when a
    boilerplate gram was capped — conservative in the right direction
    (boilerplate overlap is not contamination evidence).
    """
    sh = shingle_sets(docs, text_col, id_col, n).localCheckpoint()
    bench = sh.filter((F.col(id_col) % bench_mod) == 0).select(
        F.col(id_col).alias("bench_id"), "shingle"
    )
    bench_sizes = bench.groupBy("bench_id").agg(F.count(F.lit(1)).alias("n_bench"))
    corpus = sh.filter((F.col(id_col) % bench_mod) != 0)
    # shared skew guard (see dedup.cap_hot_keys: two-phase hot-key anti-join)
    corpus = cap_hot_keys(corpus, ["shingle"], max_df)
    shared = (
        corpus.join(bench, "shingle")
        .groupBy(id_col, "bench_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
    return shared.join(bench_sizes, "bench_id").selectExpr(
        id_col,
        "bench_id",
        "n_shared",
        "CAST(n_shared AS DOUBLE) / CAST(n_bench AS DOUBLE) AS contamination",
    )


def source_balance(
    docs: DataFrame,
    stratum_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Rebalance the corpus to a UNIFORM source mixture by deterministic
    hash downsampling — the data-mixing step of a training pipeline (fix
    an over-represented crawl without an RNG, so the same corpus always
    yields the same mix).

    Every source keeps ``min_count / count`` of its rows, where
    ``min_count`` is the smallest source's size: the expected kept volume
    is equal per source (no upsampling — the floor source passes whole).
    Membership is ``hash(text) % 1e6`` against an integer cross-multiplied
    threshold — pure int arithmetic, no double rounding, engine-equal.

    Scale posture: one count aggregate over the stratum column (#sources
    rows — broadcast back), then a scan-local filter; the kept set never
    shuffles. Adding a target-weight dict instead of the uniform mix is a
    literal swap of the threshold expression.
    """
    counts = docs.groupBy(stratum_col).agg(F.count(F.lit(1)).alias("__c"))
    floor_ = counts.agg(F.min("__c").alias("__min_c"))
    thresholds = bcast_attach(counts, floor_, "__c", "__min_c")
    h = F.expr(f"{T.hexint(text_col, S)} % 1000000")
    return (
        docs.join(F.broadcast(thresholds), stratum_col)
        .filter(h * F.col("__c") < F.col("__min_c") * F.lit(1_000_000))
        .select(id_col, stratum_col)
    )


def source_mix(
    docs: DataFrame,
    weights: dict[str, int],
    stratum_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Rebalance the corpus to a TARGET mixture — the weighted sibling of
    :func:`source_balance` (uniform is ``weights ≡ 1``). Kept volume per
    source is proportional to its integer weight, scaled so the most
    over-subscribed source (min cᵢ/wᵢ) is kept whole and nothing
    upsamples; sources absent from ``weights`` are EXCLUDED.

    All arithmetic is integer and mirrored verbatim in the oracle: the
    binding source is argmin of ``(c·10⁶) div w`` (ties → source name),
    and membership is ``hash(text) % 10⁴`` against the cross-multiplied
    threshold ``h · w_m · cₛ < c_m · wₛ · 10⁴`` — no double rounding
    anywhere. (10⁴ granularity keeps the cross-product far from int64
    overflow even at 10¹²-row sources.)

    Scale posture: identical to source_balance — one stratum-count
    aggregate, a broadcast threshold attach, and a scan-local filter.
    """
    spark = docs.sparkSession
    wdf = spark.createDataFrame(
        list(weights.items()), f"{stratum_col} string, __wt long"
    )
    counts = (
        docs.groupBy(stratum_col)
        .agg(F.count(F.lit(1)).alias("__c"))
        .join(F.broadcast(wdf), stratum_col)
        .withColumn("__score", F.expr("(__c * 1000000) DIV __wt"))
    )
    binding = counts.agg(
        F.min(F.struct("__score", stratum_col, "__c", "__wt")).alias("__m")
    ).select(F.col("__m.__c").alias("__cm"), F.col("__m.__wt").alias("__wm"))
    thresholds = bcast_attach(counts, binding, "__c", "__cm")
    h = F.expr(f"{T.hexint(text_col, S)} % 10000")
    return (
        docs.join(F.broadcast(thresholds), stratum_col)
        .filter(
            h * F.col("__wm") * F.col("__c")
            < F.col("__cm") * F.col("__wt") * F.lit(10_000)
        )
        .select(id_col, stratum_col)
    )


def quality_prune(
    docs: DataFrame,
    keep_pct: int = 50,
    stratum_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    bins: int = 10_000,
) -> DataFrame:
    """Keep each stratum's TOP ``keep_pct``% of documents by quality score
    (FineWeb-style percentile pruning), computed SCALE-SAFELY: the
    per-stratum threshold comes from a score HISTOGRAM (quality binned to
    ``bins`` integer buckets), so no corpus-wide sort and no window over a
    corpus-sized partition — the only window runs over ≤ ``bins`` rows per
    stratum. Bin-granular by construction: the kept fraction is the
    largest ≤ ``keep_pct``% achievable on whole bins (ties inside one bin
    are kept or dropped together — at 10⁴ bins the discretization error
    is ≤ the bin's share of documents).

    Threshold rule (shared verbatim with the oracle): with ``suffix[b]`` =
    #rows scoring in bin ≥ b, the cut is the smallest bin whose suffix
    count fits the target ``(total · keep_pct) div 100``; rows with
    ``bin ≥ cut`` survive.

    Output: (doc_id, stratum, quality_bin).
    """
    q = F.expr(T.quality_expr(text_col, S))
    binned = spread(docs).select(
        F.col(id_col),
        F.col(stratum_col),
        F.floor(q * bins).cast("int").alias("quality_bin"),
    )
    hist = binned.groupBy(stratum_col, "quality_bin").agg(
        F.count(F.lit(1)).alias("__n")
    )
    w_suffix = (
        Window.partitionBy(stratum_col)
        .orderBy(F.col("quality_bin").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cuts = (
        hist.withColumn("__suffix", F.sum("__n").over(w_suffix))
        .withColumn(
            "__target",
            F.expr(
                f"(sum(__n) OVER (PARTITION BY {stratum_col}) * {keep_pct}) DIV 100"
            ),
        )
        .filter(F.col("__suffix") <= F.col("__target"))
        .groupBy(stratum_col)
        .agg(F.min("quality_bin").alias("__cut"))
    )
    return (
        binned.join(F.broadcast(cuts), stratum_col)
        .filter(F.col("quality_bin") >= F.col("__cut"))
        .select(id_col, stratum_col, "quality_bin")
    )


def tfidf_top_terms(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
) -> DataFrame:
    """Most DISTINCTIVE terms per document — the tf-idf ranking step of
    keyword extraction / topic tagging, scored with INTEGER rational
    arithmetic so both engines rank bit-identically: ``score =
    (tf · 10⁶) div df`` is order-isomorphic to tf/df (and to tf·idf for a
    fixed corpus size, since idf = log(N/df) is monotone decreasing in df)
    without ever computing a float log whose last-bit rounding could
    differ across engines.

    Output: (doc_id, token, tf, df, score, rank) — top ``k`` per document,
    ties broken by token text (total order).

    Scale posture: explode → (doc, token) hash agg (map-side combinable)
    → token-keyed df aggregate over the tf frame (already one row per
    (doc, token), so df = plain count) → token-keyed shuffle join (vocab
    is corpus-scale: no broadcast, AQE sizes it) → per-doc rank window.
    """
    words = spread(docs).selectExpr(id_col, f"{T.split_ws(text_col, S)} AS __w")
    tf = (
        words.select(id_col, F.explode("__w").alias("token"))
        .groupBy(id_col, "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_ = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    scored = tf.join(df_, "token").selectExpr(
        id_col,
        "token",
        "CAST(tf AS BIGINT) AS tf",
        "CAST(df AS BIGINT) AS df",
        "(tf * 1000000) DIV df AS score",
    )
    w = Window.partitionBy(id_col).orderBy(F.col("score").desc(), "token")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def export_shards(
    docs: DataFrame,
    out_path: str,
    n_shards: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Final-mile corpus export: write the documents as ``n_shards``
    deterministic hash shards (``hash(text) % n``, so re-exporting the
    same corpus reproduces the same shards — no RNG, no row-order
    dependence) and return the shard MANIFEST (shard, n_docs, n_tokens)
    computed from the files actually written — the training-side
    contract (loader parallelism, token budgeting) reads the manifest,
    never rescans the corpus.

    Scale posture: one pass to write (scan-local shard derivation, the
    partitioned writer splits by directory), one column-pruned pass over
    the written shards for the manifest aggregate. Shard count is the
    loader-parallelism knob: at 100 TB pick n_shards ≈ total/target-shard
    rather than this demo default.
    """
    sharded = spread(docs).select(
        F.col(id_col),
        F.col(text_col),
        F.expr(f"{T.hexint(text_col, S)} % {n_shards}").alias("shard"),
    )
    (
        sharded.write.mode("overwrite")
        .option("partitionOverwriteMode", "static")
        .partitionBy("shard")
        .parquet(out_path)
    )
    spark = docs.sparkSession
    back = spark.read.parquet(out_path)
    return (
        back.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.expr(f"{T.asize(T.split_ws(text_col, S), S)}"))
            .cast("bigint")
            .alias("n_tokens"),
        )
        .select(F.col("shard").cast("int").alias("shard"), "n_docs", "n_tokens")
    )


def token_histogram(docs: DataFrame, text_col: str = "text", k: int = 100) -> DataFrame:
    """Corpus-level token frequency top-k (vocabulary/frequency analysis —
    the first look at any new training corpus, and the input to frequency-
    based vocab construction).

    Scale posture: explode → hash aggregate (map-side combine collapses
    each partition's token runs before the exchange) → ``TakeOrderedAndProject``
    (orderBy+limit never global-sorts: each task keeps its local top-k and
    the driver merges k-sized heaps). Ties at the cut are broken by token
    text — a total order, so the k-th row is deterministic in both engines.
    """
    words = spread(docs).selectExpr(f"{T.split_ws(text_col, S)} AS w")
    return (
        words.select(F.explode("w").alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "token")
        .limit(k)
    )


def sliding_chunks(
    docs: DataFrame,
    window: int = 20,
    stride: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Overlapping sliding-window chunking (the RAG-ingestion splitter):
    one chunk every ``stride`` words spanning up to ``window`` words, so
    consecutive chunks overlap by ``window - stride``. Returns
    (id, chunk_idx, chunk_hash, n_tokens) — the hash stands in for the
    chunk text downstream (dedup, embedding keys) and keeps outputs
    narrow.

    Pure expression pipeline: split bound in its own projection (no CSE
    for repeated split), array built by the dialect-paired generator,
    posexplode for (idx, chunk) — one narrow scan, no shuffle at all.
    """
    bound = docs.select(
        F.col(id_col).alias("id"),
        F.expr(T.split_ws(text_col, S)).alias("__w"),
    )
    arr = T.sliding_word_chunks("__w", S, window, stride)
    return (
        bound.select("id", F.expr(arr).alias("__chunks"))
        .selectExpr("id", "posexplode(__chunks) AS (chunk_idx, chunk)")
        .select(
            F.col("id").alias(id_col),
            F.col("chunk_idx").cast("int"),
            F.md5("chunk").alias("chunk_hash"),
            F.expr("size(split(chunk, ' '))").cast("int").alias("n_tokens"),
        )
    )


def cap_per_group(
    docs: DataFrame,
    group: str = "source",
    k: int = 30,
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep a deterministic EXACT-k sample per group (cap documents per
    source/domain — the curation step between keep-everything and
    percentage pruning). Selection order is the pseudo-random
    (hash-bucket, hash, id) total order, so the kept set is stable across
    runs, partitionings, and engines.

    The scalable shape — NO corpus-wide window: a group-wide
    row_number <= k would serialize each group's full row set through one
    task (the hot-group trap, CLAUDE.md). Instead:
      1. bucket rows by hash % 10000 and build the per-(group, bucket)
         histogram — a reducible aggregate;
      2. one window over the HISTOGRAM (<= 10000 rows per group, bounded
         regardless of corpus size) finds each group's cutoff bucket;
      3. buckets strictly below the cutoff are kept wholesale
         (broadcast-joined filter, no shuffle of the kept mass);
      4. only the single boundary bucket (~group_size/10000 rows) pays a
         ranking window to pick the remaining rows exactly.
    """
    h = F.expr(f"{T.hexint(f'CAST({id_col} AS STRING)', S)}")
    t = docs.select("*", h.alias("__h")).withColumn(
        "__b", F.col("__h") % 10_000
    )
    hist = t.groupBy(group, "__b").agg(F.count("*").alias("__n"))
    wcum = (
        Window.partitionBy(group)
        .orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hist.select(group, "__b", F.sum("__n").over(wcum).alias("__cum"))
    cutoff = (
        cum.where(F.col("__cum") >= k)
        .groupBy(group)
        .agg(F.min("__b").alias("__cut"))
    )
    # groups smaller than k have no cutoff bucket: keep them whole
    before = (
        cum.where(F.col("__cum") < k)
        .groupBy(group)
        .agg(F.max("__cum").alias("__before"))
    )
    bounds = (
        t.select(group).distinct()
        .join(cutoff, group, "left")
        .join(before, group, "left")
        .select(
            group,
            F.coalesce(F.col("__cut"), F.lit(10_000)).alias("__cut"),
            F.coalesce(F.col("__before"), F.lit(0)).alias("__before"),
        )
    )
    tb = t.join(F.broadcast(bounds), group)
    whole = tb.where(F.col("__b") < F.col("__cut"))
    wedge = (
        Window.partitionBy(group)
        .orderBy("__h", id_col)
    )
    boundary = (
        tb.where(F.col("__b") == F.col("__cut"))
        .withColumn("__rn", F.row_number().over(wedge))
        .where(F.col("__rn") <= k - F.col("__before"))
        .drop("__rn")
    )
    return whole.unionByName(boundary).drop("__h", "__b", "__cut", "__before")


# hashing-trick linear classifier (fastText-style quality filter)
HASH_CLF_FEATURES = 4096
HASH_CLF_BIAS_MICRO = 0


def hash_classifier_score(
    docs: DataFrame,
    n_features: int = HASH_CLF_FEATURES,
    bias_micro: int = HASH_CLF_BIAS_MICRO,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Linear text-classifier INFERENCE with the hashing trick — the
    fastText-style quality-filter stage (Joulin et al. 2016; the
    classifier gate in CCNet / DCLM-style curation pipelines): tokens map
    to ``n_features`` buckets via a feature hash, each bucket carries a
    weight, and a document's score is the tf-weighted sum plus bias.

    The model is DATA, not code: a (fid, weight) table joined into the
    plan — swap in a genuinely trained weights table and the plan is
    production inference. Here the stand-in weights derive
    deterministically from the feature id (md5 window → integer micro
    units in [-1000, 1000]), so the whole operator is oracle-checkable.

    All arithmetic is integer (micro units): tf · w_micro sums are
    order-independent, so the score hashes identically regardless of
    partitioning — no float ever crosses the driver boundary.

    Output: (doc_id, margin_micro, verdict) — verdict = 'keep' iff the
    margin is positive.

    Scale posture: explode → (doc, token) hash agg (map-side combined)
    → token-keyed join to the distinct-token feature map (corpus-scale
    vocab: shuffle join, AQE-sized, never broadcast) → fid-keyed join to
    the weights table (exactly ``n_features`` rows — broadcast) → per-doc
    agg. md5 is evaluated once per DISTINCT token and once per distinct
    fid, never per occurrence.
    """
    words = spread(docs).selectExpr(id_col, f"{T.split_ws(text_col, S)} AS __w")
    tf = (
        words.select(id_col, F.explode("__w").alias("token"))
        .groupBy(id_col, "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    vocab = (
        tf.select("token")
        .distinct()
        .selectExpr("token", f"{T.hexint('token', S)} % {n_features} AS fid")
    )
    weights = (
        vocab.select("fid")
        .distinct()
        .selectExpr(
            "fid",
            f"({T.hexwin(T.tostr('fid', S), 1, 15, S)} % 2001 - 1000) AS w_micro",
        )
    )
    scored = (
        tf.join(vocab, "token")
        .join(F.broadcast(weights), "fid")
        .groupBy(id_col)
        .agg(
            (F.lit(bias_micro) + F.sum(F.col("tf") * F.col("w_micro")))
            .cast("bigint")
            .alias("margin_micro")
        )
    )
    return scored.selectExpr(
        id_col,
        "margin_micro",
        "CASE WHEN margin_micro > 0 THEN 'keep' ELSE 'drop' END AS verdict",
    )


def temperature_mix(
    docs: DataFrame,
    budget: int,
    stratum_col: str = "source",
) -> DataFrame:
    """Temperature-scaled sampling WEIGHTS from corpus statistics — the
    multilingual/multi-source mixture rule (mT5/XLM-R style) at the
    standard alpha = 0.5: a source's sampling probability is proportional
    to sqrt(its document count), which upweights small sources relative
    to raw proportions without letting any one dominate.

    alpha is FIXED at 0.5 because sqrt is an IEEE correctly-rounded
    operation — both engines compute the identical double from the
    identical count — where a general pow() is libm-dependent (the same
    reason the portable log exists). Each sqrt is quantized once per
    SOURCE to DECIMAL(18,6); all shares then come from integer
    micro-unit arithmetic (HALF_UP DIV), so the whole report is
    engine-exact. Output: (source, n_docs, weight_ppm, target_n) where
    target_n is the per-source allocation of ``budget`` documents.

    Scale posture: one stratum-count aggregate (map-side combined), a
    1-row decimal-sum broadcast, integer projection. The downstream
    keep-filter is :func:`source_mix` with these weights.
    """
    h = docs.groupBy(stratum_col).agg(F.count(F.lit(1)).alias("n_docs"))
    sq = h.selectExpr(
        stratum_col,
        "n_docs",
        # width 19 decimal forces hugeint multiply in DuckDB (the int64
        # decimal-multiply overflow lesson); Spark widens identically
        "CAST(CAST(ROUND(sqrt(CAST(n_docs AS DOUBLE)), 6) AS DECIMAL(19,6))"
        " * 1000000 AS BIGINT) AS __u",
    )
    tot = sq.agg(F.sum("__u").cast("long").alias("__tot"))
    return bcast_attach(sq, tot, stratum_col, "__tot").selectExpr(
        stratum_col,
        "n_docs",
        "CAST(((2 * 1000000 * __u + __tot) DIV (2 * __tot)) AS BIGINT)"
        " AS weight_ppm",
        f"CAST(((2 * {budget} * __u + __tot) DIV (2 * __tot)) AS BIGINT)"
        " AS target_n",
    )


# DSIR's probability expression, parameterized by COLUMN NAME so the
# same generator emits both the Spark projections and the oracle CTEs
# (shared-verbatim text → identical IEEE evaluation order → bit-identical
# doubles). The portable-ln pipeline itself comes from retrieval.py's
# single-source generators (SQRT_CHAIN/ATANH_ARG/LN_FROM) so the
# bit-parity contract has exactly one definition.
from .retrieval import ATANH_ARG, LN_FROM, SQRT_CHAIN  # noqa: E402

SQRT20 = SQRT_CHAIN


def DSIR_P_SQL(c: str, n: str, n_buckets: int) -> str:
    """Add-1-smoothed bucket probability from exact integer counts."""
    return (
        f"((CAST({c} AS DOUBLE) + 1.0)"
        f" / (CAST({n} AS DOUBLE) + CAST({n_buckets} AS DOUBLE)))"
    )


def dsir_weights(
    docs: DataFrame,
    target_pred: str,
    n_buckets: int = 4096,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, public: Data Selection
    via Importance Resampling): score every document by how much more
    likely its hashed-bigram features are under a TARGET domain model
    than under the raw-corpus model,

        w(doc) = avg over feature occurrences of
                 ln p_target(f) - ln p_raw(f),

    with both models add-1-smoothed multinomials over ``n_buckets``
    hashed bigram buckets and the target set selected by ``target_pred``
    (a boolean SQL expression over the document columns, e.g. a curated
    source list). High-weight documents look like the target domain —
    the standard pre-training data-selection signal.

    Engine parity: feature hashing is the md5-based ``hexint`` modulo
    ``n_buckets`` (non-negative operands, so ``%`` agrees across
    engines); both probabilities are text-pinned IEEE double expressions
    over exact integer counts; each log goes through the portable
    sqrt-chain expansion (operators/retrieval.py contract) once per
    DISTINCT bucket, is quantized to DECIMAL(18,9), and the log-ratio is
    exact decimal subtraction — per-occurrence sums are then
    order-independent decimal sums, and the average uses the sign-split
    HALF_UP integer division (weights can be negative).

    Scale posture: two corpus passes total. The first explode feeds ONE
    combined (bucket, total/target) count aggregate — map-side combine
    collapses to at most ``n_buckets`` rows per task before the
    exchange — which is materialized so the totals and the log-ratio
    table derive from it without re-scanning; the bounded
    (<= ``n_buckets``) log-ratio table then broadcasts onto the
    re-derived occurrence stream for one final per-doc hash aggregate.
    No per-occurrence transcendentals anywhere.

    Output: (doc_id, n_feats BIGINT, w_sum DECIMAL(18,9),
    avg_w DECIMAL(18,9)) for documents with at least one bigram.
    """
    words = spread(docs).selectExpr(
        id_col,
        f"({target_pred}) AS __is_t",
        f"{T.split_ws(text_col, S)} AS __w",
    )
    occ = words.selectExpr(
        id_col, "__is_t", f"explode({T.word_ngrams('__w', S, 2)}) AS bg"
    ).selectExpr(id_col, "__is_t", f"({T.hexint('bg', S)} % {n_buckets}) AS feat")
    # ONE corpus-scan count aggregate feeds both models; it is
    # materialized (<= n_buckets rows) because the totals derive from it
    # and the log-ratio table reads it again — without the checkpoint the
    # explode pipeline would run once per consumer (the cap_hot_keys
    # caller rule). The occurrence stream itself is re-derived for the
    # final probe join (second and last corpus pass — same shape as
    # lm_bigram_nll; checkpointing per-occurrence rows would cost more
    # than the recompute at corpus scale).
    fc = (
        occ.groupBy("feat")
        .agg(
            F.expr("CAST(COUNT(*) AS BIGINT)").alias("c_r"),
            F.expr(
                "CAST(SUM(CASE WHEN __is_t THEN 1 ELSE 0 END) AS BIGINT)"
            ).alias("c_t"),
        )
        .localCheckpoint()
    )
    tot = fc.agg(
        F.expr("CAST(SUM(c_r) AS BIGINT)").alias("n_r"),
        F.expr("CAST(SUM(c_t) AS BIGINT)").alias("n_t"),
    )
    lr = (
        bcast_attach(fc, tot, "feat", "n_r")
        .selectExpr(
            "feat",
            f"{DSIR_P_SQL('c_t', 'n_t', n_buckets)} AS pt",
            f"{DSIR_P_SQL('c_r', 'n_r', n_buckets)} AS pr",
        )
        .selectExpr("feat", f"{SQRT20('pt')} AS st", f"{SQRT20('pr')} AS sr")
        .selectExpr(
            "feat", f"{ATANH_ARG('st')} AS tt", f"{ATANH_ARG('sr')} AS tr"
        )
        .selectExpr(
            "feat",
            f"CAST(ROUND({LN_FROM('tt')}, 9) AS DECIMAL(18,9)) AS lt9",
            f"CAST(ROUND({LN_FROM('tr')}, 9) AS DECIMAL(18,9)) AS lr9",
        )
        .selectExpr("feat", "CAST(lt9 - lr9 AS DECIMAL(18,9)) AS lrd")
    )
    per_doc = (
        occ.join(F.broadcast(lr), "feat")
        .groupBy(id_col)
        .agg(
            F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_feats"),
            F.expr("CAST(SUM(lrd) AS DECIMAL(18,9))").alias("w_sum"),
        )
    )
    return per_doc.selectExpr(
        id_col,
        "n_feats",
        "w_sum",
        # sign-split HALF_UP at scale 9; width 19 forces hugeint, the
        # numerator stays in the 128-bit pair (advisor rule, round 7)
        "CAST(CAST(w_sum AS DECIMAL(19,9)) * 1000000000 AS DECIMAL(38,0))"
        " AS __u",
    ).selectExpr(
        id_col,
        "n_feats",
        "w_sum",
        "CAST(CAST((CASE WHEN __u < 0 THEN -1 ELSE 1 END)"
        " * CAST((2 * abs(__u) + n_feats) DIV (2 * n_feats) AS BIGINT)"
        " AS DECIMAL(18,0)) * CAST(0.000000001 AS DECIMAL(10,9))"
        " AS DECIMAL(18,9)) AS avg_w",
    )


def dsir_select(
    docs: DataFrame,
    target_pred: str,
    k: int = 100,
    n_buckets: int = 4096,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The selection step DSIR exists for: keep the ``k`` documents whose
    importance weight says they look most like the target domain
    (Xie et al. 2023 select by top importance weight; the paper resamples,
    but with deterministic weights the top-k is the reproducible variant
    a data pipeline actually ships). Composes :func:`dsir_weights` with a
    global top-k — ``avg_w`` is an exact DECIMAL(18,9), so the order is
    engine-identical, and the doc-id tiebreak makes it total.

    Scale posture: the dsir_weights pipeline (two corpus passes, bounded
    model state) followed by TakeOrdered(k) — per-partition heaps of k
    rows, no global sort materialization.
    """
    w = dsir_weights(docs, target_pred, n_buckets, text_col, id_col)
    return w.orderBy(F.desc("avg_w"), F.col(id_col)).limit(k)


def priority_sample(
    docs: DataFrame,
    k: int = 5,
    group_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    m: int = 1 << 20,
) -> DataFrame:
    """Weighted sample-without-replacement of ``k`` documents per group,
    inclusion probability increasing in document quality — priority
    sampling (Duffield, Lund, Thorup 2007, public): row i gets priority
    p_i = w_i / u_i with u_i uniform on (0,1], the k highest priorities
    per group are the sample, and w_est_i = max(w_i, tau) (tau = the
    (k+1)-th priority, 0 if the group has <= k rows) makes any
    subset-sum of w estimable without bias from the sample alone — the
    principled way to downsample a corpus stratum while keeping its
    aggregate statistics recoverable.

    Deterministic AND engine-portable by construction: u_i maps the
    md5-based hexint of the doc id onto the (0,1] lattice
    ((h % m + 1) / (m + 1) — integers below 2^53 are exact in a double,
    and IEEE division is correctly rounded in both engines), w_i is the
    shared-verbatim quality_expr double, and priorities involve ONLY
    division and comparison — no transcendentals (the ln-based
    Efraimidis-Spirtakis keying would break bit-parity; CLAUDE.md ln
    rule), so every priority is bit-identical across engines and the
    (p DESC, doc_id) order is total.

    Scale posture: one spread narrow projection (the md5/regex work runs
    once per row, 5 scalar columns out), one per-group window over that
    narrow frame (the topk_per_group shape — partitions carry 5 scalars
    per row, never text), a bounded (k+1 rows per group) eager
    checkpoint feeding both the sample and the tau lookup (two
    consumers — the cap_hot_keys caller rule), and a broadcast tau
    attach. A corpus-scale hot group serializes only the narrow frame's
    sort, not document payloads; at 1000-executor scale the windowed
    stage is the standard per-key top-k pattern.
    """
    from .temporal import topk_per_group

    base = (
        spread(docs)
        .selectExpr(
            id_col,
            group_col,
            f"({T.quality_expr(text_col, S)}) AS w",
            f"(CAST({T.hexint(T.tostr(id_col, S), S)} % {m} + 1 AS DOUBLE)"
            f" / {float(m + 1)}) AS u",
        )
        .withColumn("p", F.expr("w / u"))
    )
    ranked = topk_per_group(base, group_col, "p", k + 1, id_col).localCheckpoint()
    tau = ranked.filter(F.col("rank") == k + 1).select(
        group_col, F.col("p").alias("__tau")
    )
    return (
        ranked.filter(F.col("rank") <= k)
        .join(F.broadcast(tau), group_col, "left")
        .withColumn(
            "w_est",
            F.expr("greatest(w, coalesce(__tau, CAST(0.0 AS DOUBLE)))"),
        )
        .select(group_col, id_col, "rank", "w", "u", "p", "w_est")
    )


def lang_quality_mix(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The curation decision table: predicted language x quality decile,
    with document count, character mass, and the permille share of the
    corpus in each cell — what you read before choosing per-language
    keep thresholds (the cross of lang_id and quality_prune's signal).

    Engine parity: the language argmax and the quality score are the
    shared-verbatim expressions (functions/text.py — already graded
    through lang_id / quality_prune); the decile is floor of a
    bit-identical double (tie-free: the score is a ratio sum that never
    lands exactly on a tenth except at the exact-integer endpoints,
    where floor agrees anyway); shares are HALF-truncating integer
    division (T.idiv, non-negative).

    Scale posture: one spread projection, ONE hash aggregate to a
    <= n_langs x 11 frame, then a 1-row broadcast total attach
    (bcast_attach — BroadcastHashJoin, codegen kept). Linear scan,
    bounded output.
    """
    s = spread(docs).selectExpr(
        id_col,
        f"length({text_col}) AS len",
        *T.lang_scores(text_col, S),
        f"({T.quality_expr(text_col, S)}) AS q",
    )
    lab = s.selectExpr(
        f"{T.lang_pick_expr()} AS predicted_lang",
        "CAST(floor(q * 10) AS INTEGER) AS q_decile",
        "len",
    )
    # materialize the bounded (<= n_langs x 11 rows) aggregate before
    # deriving the total from it: with two consumers the md5/regex-heavy
    # corpus projection would otherwise run twice (exchange reuse does
    # not fire across the differing consumer plans here — measured, the
    # build side re-planned the full scan)
    g = (
        lab.groupBy("predicted_lang", "q_decile")
        .agg(
            F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_docs"),
            F.expr("CAST(SUM(len) AS BIGINT)").alias("n_chars"),
        )
        .localCheckpoint()
    )
    tot = g.agg(F.expr("CAST(SUM(n_docs) AS BIGINT)").alias("__n"))
    return bcast_attach(g, tot, "n_docs", "__n").selectExpr(
        "predicted_lang",
        "q_decile",
        "n_docs",
        "n_chars",
        f"{T.idiv('n_docs * 1000', '__n', S)} AS permille_docs",
    )


def mixture_plan(
    docs: DataFrame,
    weights: dict[str, int],
    token_budget: int,
    max_epochs_milli: int = 4000,
    stratum_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Token-budget allocation across sources — the data-mixing PLAN a
    training run is provisioned from (GPT-3/Llama-style: given target
    mixture weights and a total token budget, how many epochs of each
    source does the budget imply, and where does an epoch cap leave a
    shortfall?). :func:`temperature_mix` sizes a DOCUMENT budget from
    corpus counts; this op sizes a TOKEN budget against measured token
    mass and reports the repetition (epoch) factor per source, capped.

    Per configured source:

      * ``n_docs`` / ``n_tokens`` — measured corpus mass (ws tokens);
      * ``weight_ppm``     = HALF_UP(wt·10⁶ / Σwt);
      * ``target_tokens``  = HALF_UP(budget·wt / Σwt);
      * ``epochs_milli``   = HALF_UP(target_tokens·10³ / n_tokens) —
        1000 = one pass over the source;
      * ``epochs_capped_milli`` = LEAST(epochs_milli, max_epochs_milli) —
        the repetition ceiling (data-constrained regime: repeating a
        source beyond a few epochs stops helping);
      * ``realized_tokens`` = epochs_capped_milli·n_tokens DIV 10³
        (floor — a budget is a ceiling, never overdrawn by rounding);
      * ``deficit_tokens``  = target_tokens − realized_tokens (> 0 ⇒ the
        cap binds and the budget share is re-allocatable).

    Every division is the engine-pair HALF_UP integer form on
    non-negative operands (T.idiv lesson ladder), widened through
    T.wint before scaling so a 10¹³-token source times 10⁶ cannot
    overflow int64; an all-empty-text source divides by
    NULLIF(n_tokens, 0) → NULL epochs, never an ANSI throw. Sources
    absent from ``weights`` are excluded (they get no budget share).

    Scale posture: one spread scan → hash aggregate to ≤ |sources| rows
    (map-side combined), a broadcast join against the literal weight
    table, then scalar integer projections. The corpus is touched once;
    nothing wider than the source list ever shuffles.
    """
    spark = docs.sparkSession
    wsum = sum(weights.values())  # literal config — exact, shared w/ oracle
    wdf = spark.createDataFrame(
        list(weights.items()), f"{stratum_col} string, wt long"
    )
    counts = (
        spread(docs)
        .groupBy(stratum_col)
        .agg(
            F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_docs"),
            F.expr(
                f"CAST(SUM(CAST({T.asize(T.split_ws(text_col, S), S)}"
                " AS BIGINT)) AS BIGINT)"
            ).alias("n_tokens"),
        )
        .join(F.broadcast(wdf), stratum_col)
    )
    t = counts.selectExpr(
        stratum_col,
        "n_docs",
        "n_tokens",
        "CAST(" + T.idiv(f"2000000 * {T.wint('wt', S)} + {wsum}", str(2 * wsum), S)
        + " AS BIGINT) AS weight_ppm",
        "CAST(" + T.idiv(f"{2 * token_budget} * {T.wint('wt', S)} + {wsum}", str(2 * wsum), S)
        + " AS BIGINT) AS target_tokens",
    )
    e = t.selectExpr(
        stratum_col,
        "n_docs",
        "n_tokens",
        "weight_ppm",
        "target_tokens",
        "CAST(" + T.idiv(f"2000 * {T.wint('target_tokens', S)} + n_tokens", "NULLIF(2 * n_tokens, 0)", S)
        + " AS BIGINT) AS epochs_milli",
    )
    return e.selectExpr(
        stratum_col,
        "n_docs",
        "n_tokens",
        "weight_ppm",
        "target_tokens",
        "epochs_milli",
        # explicit NULL branch: Spark least() SKIPS nulls while DuckDB
        # versions differ — never let the engines' LEAST-null policies meet
        f"CASE WHEN epochs_milli IS NULL THEN NULL"
        f" ELSE LEAST(epochs_milli, {max_epochs_milli}) END"
        " AS epochs_capped_milli",
    ).selectExpr(
        stratum_col,
        "n_docs",
        "n_tokens",
        "weight_ppm",
        "target_tokens",
        "epochs_milli",
        "epochs_capped_milli",
        "CAST(" + T.idiv(f"epochs_capped_milli * {T.wint('n_tokens', S)}", "1000", S)
        + " AS BIGINT) AS realized_tokens",
    ).selectExpr(
        stratum_col,
        "n_docs",
        "n_tokens",
        "weight_ppm",
        "target_tokens",
        "epochs_milli",
        "epochs_capped_milli",
        "realized_tokens",
        "CAST(target_tokens - realized_tokens AS BIGINT) AS deficit_tokens",
    )


def packing_efficiency(
    docs: DataFrame,
    capacity: int = 512,
    text_col: str = "text",
    id_col: str = "doc_id",
    part_col: str = "source",
) -> DataFrame:
    """Packing-efficiency report over :func:`sequence_pack`'s plan — the
    observability half of concat-and-chunk packing: per source, how many
    ``capacity``-token training bins the stream fills, how full they are,
    and how many documents straddle a bin boundary (the rows an
    attention-mask or doc-boundary loss treatment has to care about).

      * ``n_bins``        = MAX(bin_last) + 1 (the stream is contiguous);
      * ``pad_tokens``    = n_bins·capacity − total_tokens (≥ 0 — only
        the final bin is ever partial);
      * ``util_permille`` = HALF_UP(total_tokens·10³ / (n_bins·capacity));
      * ``straddlers``    = documents with bin_first ≠ bin_last.

    All integer arithmetic (the HALF_UP family, widened through T.wint
    before scaling). Scale posture: sequence_pack's one per-source
    window shuffle, then ONE reducible aggregate to a |sources|-row
    report — MAX/SUM/COUNT all combine map-side.
    """
    packed = sequence_pack(
        docs, capacity=capacity, text_col=text_col,
        id_col=id_col, part_col=part_col,
    )
    g = packed.groupBy(part_col).agg(
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_docs"),
        F.expr("CAST(SUM(n_tokens) AS BIGINT)").alias("total_tokens"),
        F.expr("CAST(MAX(bin_last) + 1 AS BIGINT)").alias("n_bins"),
        F.expr(
            "CAST(SUM(CASE WHEN bin_first != bin_last THEN 1 ELSE 0 END)"
            " AS BIGINT)"
        ).alias("straddlers"),
    )
    util = T.idiv(
        f"2000 * {T.wint('total_tokens', S)} + n_bins * {capacity}",
        f"2 * n_bins * {capacity}",
        S,
    )
    return g.selectExpr(
        part_col,
        "n_docs",
        "total_tokens",
        "n_bins",
        "straddlers",
        f"CAST(n_bins * {capacity} - total_tokens AS BIGINT) AS pad_tokens",
        f"CAST({util} AS BIGINT) AS util_permille",
    )


def classifier_threshold_sweep(
    docs: DataFrame,
    thresholds: tuple[int, ...] = (-50000, -20000, 0, 20000, 50000),
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Operating-point sweep for the quality classifier: at each literal
    margin threshold, how many documents survive and what corpus share
    that is — the table read before PICKING the filter threshold
    (:func:`hash_classifier_score` scores; :func:`quality_prune` picks by
    percentile; this shows the whole tradeoff curve at once).

    Exact integer arithmetic throughout (counts + the HALF_UP permille
    family), so the curve hashes identically across engines.

    Output: (threshold_micro BIGINT, n_kept BIGINT, keep_permille
    BIGINT), one row per threshold.

    Scale posture: classifier inference is the dominant cost (its own
    documented shape); the sweep itself attaches the |thresholds|-row
    literal frame by broadcast (bcast_attach — BHJ, codegen kept) to the
    narrow (id, margin) frame and reduces with ONE map-side-combined
    aggregate. The text never reaches the sweep.
    """
    if not thresholds:
        raise ValueError("at least one threshold required")
    spark = docs.sparkSession
    scored = hash_classifier_score(
        docs, text_col=text_col, id_col=id_col
    ).select("margin_micro")
    ts = spark.createDataFrame(
        [(int(t),) for t in thresholds], "threshold_micro long"
    )
    j = bcast_attach(scored, ts, "margin_micro", "threshold_micro")
    g = j.groupBy("threshold_micro").agg(
        F.expr(
            "CAST(SUM(CASE WHEN margin_micro >= threshold_micro"
            " THEN 1 ELSE 0 END) AS BIGINT)"
        ).alias("n_kept"),
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("__n"),
    )
    share = T.idiv(f"2000 * {T.wint('n_kept', S)} + __n", "2 * __n", S)
    return g.selectExpr(
        "threshold_micro",
        "n_kept",
        f"CAST({share} AS BIGINT) AS keep_permille",
    )
