"""Keyword retrieval over the documents table: BM25 top-k scoring.

The retrieval side of a training-data pipeline (mining a corpus for
documents matching a query, e.g. benchmark-adjacent text or targeted
domain data) — the counterpart of the embedding-space searches in
operators/similarity.py. Classic Robertson/Spärck-Jones BM25 with the
Lucene idf form:

    idf(t)  = ln((N - df + 0.5) / (df + 0.5) + 1)
    s(d, t) = idf(t) * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl/avgdl))
    bm25(d) = sum over query terms t of s(d, t)

Engine-parity design (the repo's oracle gate compares value hashes):

* All the RATIONAL parts (tf, dl, avgdl = sum(dl)/N, the k1/b mixing)
  are IEEE basic ops on identical inputs in a text-pinned evaluation
  order — correctly rounded in every engine, so bit-identical.
* ``ln`` is libm-dependent — and on THIS host JVM Math.log and DuckDB's
  glibc log genuinely disagree in the last ulp (measured:
  ln(333.(3)) = 5.8111409929767 vs ...76701; see
  tests/test_env_canary.py). So the idf log is NOT the native ln: it is
  an engine-portable expansion built exclusively from IEEE
  correctly-rounded operations (sqrt, +, -, *, /), which every engine
  must compute bit-identically:

      ln(x) = 2^20 * 2 * atanh(t),  t = (s - 1) / (s + 1),
      s = sqrt applied 20 times to x,  atanh(t) ~ t + t^3/3

  After 20 square roots s - 1 <= ln(x)/2^20 (~2e-5 even for a
  trillion-document corpus), so the two-term series truncation error is
  below 1e-20 relative; the dominant error is the accumulated sqrt
  rounding, giving |portable_ln - ln| < ~1e-8 absolute over the idf
  domain (unit-tested). The approximation is part of the operator
  CONTRACT (documented here), deterministic, and identical in both
  engines by construction — then quantized once per DISTINCT query term:
  ROUND(..., 9) → DECIMAL(18,9).
* Per-(doc, term) scores are rounded then summed as DECIMAL — the
  repo-wide order-independent-sum rule — so the final ranking hashes
  identically regardless of partitioning.

Scale posture: tokens for NON-query terms are dropped before the
(doc, token) aggregate (predicate on the exploded token, pushed below
the shuffle), so the heavy agg carries |terms| x N_docs rows at most;
the per-term df/idf table is bounded by the query length and broadcast;
the doc-length stats attach via a 1-row broadcast (bcast_attach — no
collect, no BNLJ). One shuffle for the tf agg, one for the final top-k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as T
from ..io import spread
from .similarity import bcast_attach

S = T.SPARK


def _score_sql(k1: str, b: str) -> str:
    """The per-(doc, term) BM25 contribution, shared verbatim between the
    Spark plan and the DuckDB oracle (identical text → identical
    evaluation order → bit-identical doubles; see module docstring).
    Expects columns tf, dl (BIGINT), idf9 DECIMAL(18,9), avgdl DOUBLE."""
    return (
        f"CAST(idf9 AS DOUBLE) * "
        f"((CAST(tf AS DOUBLE) * ({k1} + 1.0)) / "
        f"(CAST(tf AS DOUBLE) + {k1} * "
        f"((1.0 - {b}) + ({b} * (CAST(dl AS DOUBLE) / avgdl)))))"
    )


# The idf pipeline as FOUR text-pinned steps (each shared verbatim
# between the Spark plan and the DuckDB oracle; binding each stage to a
# column keeps the expression linear-sized and single-evaluated):
#   IDF_X_SQL : the Lucene idf argument from (n_docs, df)
#   IDF_S_SQL : sqrt applied 20 times to x
#   IDF_T_SQL : the atanh argument (s-1)/(s+1)
#   IDF9_FROM_T_SQL : 2^21 * (t + t^3/3), quantized to DECIMAL(18,9)
IDF_X_SQL = (
    "(((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE)) + 0.5)"
    " / (CAST(df AS DOUBLE) + 0.5) + 1.0)"
)
# Column-parameterized generators for the portable-ln pipeline — the
# SINGLE source of the bit-parity-critical expansion (sqrt depth, series
# terms). The pinned one-column constants below and quality.dsir_weights'
# two-column stages all derive from these; retune here and every consumer
# moves together.


def SQRT_CHAIN(x: str, depth: int = 20) -> str:
    return "sqrt(" * depth + x + ")" * depth


def ATANH_ARG(s: str) -> str:
    return f"(({s} - 1.0) / ({s} + 1.0))"


def LN_FROM(t: str) -> str:
    """Generic portable ln from the atanh argument: 2^21 * (t + t^3/3);
    negate/quantize at the call sites."""
    return f"(2097152.0 * ({t} + ((({t} * {t}) * {t}) / 3.0)))"


IDF_S_SQL = SQRT_CHAIN("x")
IDF_T_SQL = ATANH_ARG("s")
LN_FROM_T_SQL = LN_FROM("t")
IDF9_FROM_T_SQL = f"CAST(ROUND({LN_FROM_T_SQL}, 9) AS DECIMAL(18,9))"


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: str = "1.2",
    b: str = "0.75",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-``k`` documents for a bag-of-words query under BM25.

    ``k1``/``b`` are passed as SQL literal TEXT (not floats) so engine
    and oracle parse the identical literal into the identical double.
    Output: (doc_id, n_terms, bm25 DECIMAL(18,9)) ordered by bm25 desc
    with doc_id tiebreak.
    """
    if not query_terms:
        raise ValueError("at least one query term required")
    words = spread(docs).selectExpr(
        id_col, f"{T.split_ws(text_col, S)} AS __w"
    ).selectExpr(id_col, "__w", "CAST(size(__w) AS BIGINT) AS dl")

    terms_in = ", ".join("'" + t.replace("'", "''") + "'" for t in query_terms)
    tf = (
        words.selectExpr(id_col, "dl", "explode(__w) AS token")
        .filter(F.expr(f"token IN ({terms_in})"))
        .groupBy(id_col, "token")
        .agg(F.count(F.lit(1)).alias("tf"), F.min("dl").alias("dl"))
    )

    # corpus stats: one row, broadcast-attached (no collect)
    stats = words.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("total_len"),
    )
    # per-term document frequency over the tf frame (already one row per
    # (doc, term)); bounded by the query length -> idf table is tiny
    df_ = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    idf = (
        bcast_attach(df_, stats, "token", "n_docs")
        .selectExpr("token", f"{IDF_X_SQL} AS x")
        .selectExpr("token", f"{IDF_S_SQL} AS s")
        .selectExpr("token", f"{IDF_T_SQL} AS t")
        .selectExpr("token", f"{IDF9_FROM_T_SQL} AS idf9")
    )

    scored = (
        bcast_attach(tf, stats, "token", "n_docs")
        .withColumn("avgdl", F.expr("CAST(total_len AS DOUBLE) / CAST(n_docs AS DOUBLE)"))
        .join(F.broadcast(idf), "token")
        .selectExpr(
            id_col,
            "token",
            f"CAST(ROUND({_score_sql(k1, b)}, 9) AS DECIMAL(18,9)) AS s9",
        )
    )
    agg = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_terms"),
        F.expr("CAST(SUM(s9) AS DECIMAL(18,9))").alias("bm25"),
    )
    return agg.orderBy(F.col("bm25").desc(), id_col).limit(k)


# ---------------------------------------------------------------------------
# Language-model quality scoring (CCNet-style perplexity filtering)
# ---------------------------------------------------------------------------

# add-k smoothed bigram probability, text-pinned (columns c2, c1, vocab):
#   p(w2 | w1) = (c(w1 w2) + 0.5) / (c(w1 .) + 0.5 * V)
LM_P_SQL = (
    "((CAST(c2 AS DOUBLE) + 0.5)"
    " / (CAST(c1 AS DOUBLE) + (0.5 * CAST(vocab AS DOUBLE))))"
)
LM_S_SQL = "sqrt(" * 20 + "p" + ")" * 20
NLL9_FROM_T_SQL = f"CAST(ROUND(-({LN_FROM_T_SQL}), 9) AS DECIMAL(18,9))"


def lm_bigram_nll(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document language-model surprisal — the perplexity-filter
    quality signal of CCNet/CC-style curation pipelines: score every
    document by the average negative log-likelihood of its bigrams under
    an add-0.5-smoothed bigram model estimated FROM THE CORPUS ITSELF
    (self-scoring: boilerplate and templated text score low NLL, rare
    garbled text scores high; no external model artifact needed —
    deterministic and oracle-checkable).

    The log is the engine-portable sqrt-chain expansion (see module
    docstring), computed once per DISTINCT bigram and quantized to
    DECIMAL(18,9); per-occurrence NLLs then sum as DECIMAL, so the score
    hashes identically across engines. The reported ``avg_nll`` is in
    nats/bigram (perplexity = e^avg_nll — deliberately NOT computed:
    exp() would reintroduce libm divergence, and the ranking is
    identical).

    Output: (doc_id, n_bigrams, nll_sum DECIMAL(18,9), avg_nll9
    DECIMAL(18,9)) for every document with at least one bigram.

    Scale posture: one explode→hash-agg for bigram counts (map-side
    combined); context counts and the smoothed logp derive from the
    DISTINCT-bigram table (vocabulary-scale, not corpus-scale rows);
    occurrences re-attach logp by a bigram-keyed shuffle join (vocab is
    corpus-scale: never broadcast); corpus stats attach via a 1-row
    broadcast. No per-occurrence transcendentals — the sqrt chain runs
    once per distinct bigram.
    """
    words = spread(docs).selectExpr(
        id_col, f"{T.split_ws(text_col, S)} AS __w"
    )
    occ = words.selectExpr(
        id_col, f"explode({T.word_ngrams('__w', S, 2)}) AS bg"
    )
    c2 = occ.groupBy("bg").agg(F.count(F.lit(1)).alias("c2"))
    # context counts from the distinct-bigram table: c(w1 .) = sum of c2
    # over bigrams sharing the first word — no per-occurrence split
    bg_w1 = c2.selectExpr("bg", "c2", f"{T.elem(T.split_ws('bg', S), '1', S)} AS w1")
    c1 = bg_w1.groupBy("w1").agg(F.sum("c2").alias("c1"))
    stats = words.selectExpr(f"explode({T.adistinct('__w', S)}) AS w").agg(
        F.count_distinct("w").alias("vocab")
    )
    logp = (
        bcast_attach(bg_w1.join(c1, "w1"), stats, "bg", "vocab")
        .selectExpr("bg", f"{LM_P_SQL} AS p")
        .selectExpr("bg", f"{LM_S_SQL} AS s")
        .selectExpr("bg", f"{IDF_T_SQL} AS t")
        .selectExpr("bg", f"{NLL9_FROM_T_SQL} AS nll9")
    )
    per_doc = (
        occ.join(logp, "bg")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.expr("CAST(SUM(nll9) AS DECIMAL(18,9))").alias("nll_sum"),
        )
    )
    # avg = nll_sum / n at scale 9, HALF_UP, in EXACT integer arithmetic:
    # a double division here hits exact .5e-9 ties (nll_sum has scale 9,
    # so remainder/n = 1/2 is common — observed at sf0.1) and Spark and
    # DuckDB round double ties differently. (2u + n) DIV (2n) on the
    # 1e9-scaled BIGINT is the tie-proof HALF_UP for non-negative u.
    return per_doc.selectExpr(
        id_col,
        "CAST(n_bigrams AS BIGINT) AS n_bigrams",
        "nll_sum",
        # width-19 operand: DuckDB multiplies width<=18 decimals in int64
        # storage and overflows; 19 forces hugeint (Spark caps at 38)
        "CAST(CAST(nll_sum AS DECIMAL(19,9)) * 1000000000 AS BIGINT) AS __u",
    ).selectExpr(
        id_col,
        "n_bigrams",
        "nll_sum",
        "CAST(CAST((2 * __u + n_bigrams) DIV (2 * n_bigrams) AS DECIMAL(18,0))"
        " * CAST(0.000000001 AS DECIMAL(10,9)) AS DECIMAL(18,9)) AS avg_nll",
    )


def rrf_fuse(
    docs: DataFrame,
    embeddings: DataFrame,
    query_terms: list[str],
    query_id: int = 0,
    n_each: int = 20,
    k: int = 10,
    rrf_k: int = 60,
) -> DataFrame:
    """Hybrid retrieval: reciprocal-rank fusion of the lexical (BM25)
    and semantic (exact-cosine) rankings — the standard two-tower corpus
    mining step (Cormack/Clarke RRF: fused(d) = sum over lists of
    1/(rrf_k + rank_d)).

    Engine parity: both input rankings already hash identically (BM25
    scores are DECIMAL(18,9); cosine doubles come from the sequential
    fold that is bit-identical with DuckDB's list_dot_product), so the
    ranks are identical; the reciprocal is taken in EXACT integer form,
    1e9 DIV (rrf_k + rank) — truncating division on non-negative
    operands is engine-equal — giving a BIGINT score with no float
    divergence to chase. Ties (e.g. symmetric ranks in both lists)
    break by doc_id.

    Scale posture: each input list is already top-``n_each`` (bounded),
    so the rank windows, the full-outer fusion join and the final
    ordering all run on at most 2 * n_each rows; the heavy lifting is
    inside bm25_topk / brute_force_topk, which keep their own
    documented one-shuffle shapes. The rank windows partition on a
    constant (hash exchange of <= n_each rows to one task — bounded by
    construction), never a range sort.

    Output: (doc_id, lex_rank, sem_rank, rrf_ppb BIGINT) top-``k`` by
    fused score; absent-in-one-list ranks are NULL and contribute 0.
    """
    from pyspark.sql import Window

    from .similarity import brute_force_topk

    lex = bm25_topk(docs, query_terms, k=n_each)
    sem = brute_force_topk(embeddings, query_id, k=n_each).withColumnRenamed(
        "vec_id", "doc_id"
    )
    wl = Window.partitionBy(F.lit(0)).orderBy(F.col("bm25").desc(), "doc_id")
    ws = Window.partitionBy(F.lit(0)).orderBy(F.col("cosine").desc(), "doc_id")
    lr = lex.select(
        "doc_id", F.row_number().over(wl).cast("long").alias("lex_rank")
    )
    sr = sem.select(
        "doc_id", F.row_number().over(ws).cast("long").alias("sem_rank")
    )
    fused = lr.join(sr, "doc_id", "full_outer").selectExpr(
        "doc_id",
        "lex_rank",
        "sem_rank",
        f"coalesce(1000000000 DIV ({rrf_k} + lex_rank), 0)"
        f" + coalesce(1000000000 DIV ({rrf_k} + sem_rank), 0) AS rrf_ppb",
    )
    return fused.orderBy(F.col("rrf_ppb").desc(), "doc_id").limit(k)


# ---------------------------------------------------------------------------
# Collocation mining (PMI over the corpus bigram table)
# ---------------------------------------------------------------------------

# Bigram-space PMI ratio, text-pinned (columns c12, tot, cw1, cw2 — all
# BIGINT counts): p(w1,w2) / (p(w1,·)·p(·,w2)) with every marginal taken
# over the bigram event space, so the whole ratio derives from ONE count
# table. Shared verbatim between the Spark plan and the DuckDB oracle —
# identical text → identical IEEE evaluation order → bit-identical double.
PMI_R_SQL = (
    "((CAST(c12 AS DOUBLE) * CAST(tot AS DOUBLE))"
    " / (CAST(cw1 AS DOUBLE) * CAST(cw2 AS DOUBLE)))"
)
PMI_S_SQL = SQRT_CHAIN("r")
PMI9_FROM_T_SQL = f"CAST(ROUND({LN_FROM_T_SQL}, 9) AS DECIMAL(18,9))"


def collocations_pmi(
    docs: DataFrame,
    min_count: int = 5,
    text_col: str = "text",
) -> DataFrame:
    """Collocation mining: pointwise mutual information of every word
    bigram occurring at least ``min_count`` times — the phrase-detection
    primitive (word2vec's phrase pass, terminology extraction) over the
    corpus bigram table.

        pmi(w1,w2) = ln( p(w1,w2) / (p(w1,·) · p(·,w2)) )

    with all probabilities over the bigram event space: p(w1,w2)=c12/B,
    p(w1,·)=Σ_y c(w1,y)/B, p(·,w2)=Σ_x c(x,w2)/B — so the ratio
    simplifies to c12·B / (cw1·cw2) and EVERYTHING derives from the one
    distinct-bigram count table (no separate unigram pass).

    Engine parity: the ratio is a shared-verbatim double expression over
    exact integer counts; the log is the portable sqrt-chain expansion
    (module docstring) evaluated once per DISTINCT surviving bigram and
    quantized at scale 9 — tie-free because ln(r) is irrational for every
    rational r ≠ 1, and r = 1 yields an exact 0.0 in both engines (the
    sqrt chain fixes 1.0, the series of t = 0 is 0).

    Output: (w1, w2, c12 BIGINT, pmi9 DECIMAL(18,9)), one row per
    surviving bigram (unordered report; positive pmi9 ⇒ collocation).

    Scale posture: one explode → hash-aggregate for bigram counts
    (map-side combined); marginals aggregate the DISTINCT-bigram table
    (vocabulary-scale, not corpus-scale); the min_count filter shrinks
    the frame BEFORE the two marginal joins (vocabulary-keyed shuffle
    joins — never broadcast: vocab grows with the corpus); the 1-row
    total attaches via broadcast (bcast_attach, codegen kept). The sqrt
    chain runs once per surviving bigram.
    """
    words = spread(docs).selectExpr(f"{T.split_ws(text_col, S)} AS __w")
    occ = words.selectExpr(f"explode({T.word_ngrams('__w', S, 2)}) AS bg")
    # materialize the vocabulary-scale count table: its four consumers
    # (both marginals, the kept cut, the total) re-plan differently, so
    # exchange reuse cannot recover the corpus explode — unmaterialized,
    # the documents scan ran TWICE (measured in formatted explain)
    c2 = occ.groupBy("bg").agg(
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("c12")
    ).localCheckpoint()
    bg_w = c2.selectExpr(
        "bg",
        "c12",
        f"{T.elem(T.split_ws('bg', S), '1', S)} AS w1",
        f"{T.elem(T.split_ws('bg', S), '2', S)} AS w2",
    )
    # marginals + total BEFORE the min_count cut (probabilities are over
    # the full corpus); the cut then bounds everything downstream
    cw1 = bg_w.groupBy("w1").agg(F.expr("CAST(SUM(c12) AS BIGINT)").alias("cw1"))
    cw2 = bg_w.groupBy("w2").agg(F.expr("CAST(SUM(c12) AS BIGINT)").alias("cw2"))
    tot = c2.agg(F.expr("CAST(SUM(c12) AS BIGINT)").alias("tot"))
    kept = (
        bg_w.filter(F.col("c12") >= min_count)
        .join(cw1, "w1")
        .join(cw2, "w2")
    )
    return (
        bcast_attach(kept, tot, "c12", "tot")
        .selectExpr("w1", "w2", "c12", f"{PMI_R_SQL} AS r")
        .selectExpr("w1", "w2", "c12", f"{PMI_S_SQL} AS s")
        .selectExpr("w1", "w2", "c12", f"{IDF_T_SQL} AS t")
        .selectExpr("w1", "w2", "c12", f"{PMI9_FROM_T_SQL} AS pmi9")
    )
