"""Systematic dialect-generator parity: every expression builder in
functions/text.py evaluated by BOTH engines over crafted edge-case texts
(unicode, punctuation-heavy, digits, single-word, repeated words) — not
just the texts that happen to be in the fixture corpus.

Order-sensitive arrays (shingles) are compared via explode/unnest
(adistinct order is engine-specific by documented design).
"""

import duckdb
import pytest

from etl_gamma_spark.functions import text as T

TEXTS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "word"),                      # shorter than the shingle width
    (3, "a a a a a"),                 # heavy repetition → distinct collapse
    (4, "123 456 !!! ??? ,,,"),       # digits + punctuation only
    (5, "Çãó ünïcode tëxt hére"),     # non-ASCII
    (6, "one two three four five six seven"),
]


@pytest.fixture(scope="module")
def engines(spark):
    df = spark.createDataFrame(TEXTS, "doc_id long, text string")
    df.createOrReplaceTempView("gen_docs")
    con = duckdb.connect()
    con.execute("CREATE TABLE gen_docs AS SELECT * FROM (VALUES "
                + ", ".join(f"({i}, '{t}')" for i, t in TEXTS)
                + ") v(doc_id, text)")
    return spark, con


def _check(engines, spark_exprs: list[str], duck_exprs: list[str], from_clause: str = "gen_docs"):
    spark, con = engines
    s_rows = sorted(
        tuple(str(v) for v in r)
        for r in spark.sql(
            f"SELECT {', '.join(spark_exprs)} FROM {from_clause}"
        ).collect()
    )
    d_rows = sorted(
        tuple(str(v) for v in r)
        for r in con.execute(
            f"SELECT {', '.join(duck_exprs)} FROM {from_clause}"
        ).fetchall()
    )
    assert s_rows == d_rows, f"\nspark={s_rows}\nduck ={d_rows}"


def test_scalar_generators_parity(engines):
    gens = [
        lambda d: f"CAST({T.asize(T.split_ws('text', d), d)} AS BIGINT)",
        lambda d: f"CAST({T.bpe_token_count('text', d)} AS BIGINT)",
        lambda d: T.hexint("text", d),
        lambda d: f"CAST({T.stopword_count('text', d)} AS BIGINT)",
        lambda d: f"round({T.punct_ratio('text', d)}, 6)",
        lambda d: f"round({T.digit_ratio('text', d)}, 6)",
        lambda d: f"round({T.quality_expr('text', d)}, 6)",
    ]
    _check(
        engines,
        ["doc_id"] + [g(T.SPARK) for g in gens],
        ["doc_id"] + [g(T.DUCK) for g in gens],
    )


def test_lang_scores_parity(engines):
    _check(
        engines,
        ["doc_id"] + T.lang_scores("text", T.SPARK),
        ["doc_id"] + T.lang_scores("text", T.DUCK),
    )


def test_shingle_sets_parity(engines):
    spark, con = engines
    s = sorted(
        (r.doc_id, r.sh)
        for r in spark.sql(
            f"""SELECT doc_id, explode(sh) AS sh FROM (
                SELECT doc_id, {T.word_shingles(T.split_ws('text', T.SPARK), 'text', T.SPARK)} AS sh
                FROM gen_docs)"""
        ).collect()
    )
    d = sorted(
        (i, x)
        for i, x in con.execute(
            f"""SELECT doc_id, unnest(sh) FROM (
                SELECT doc_id, {T.word_shingles(T.split_ws('text', T.DUCK), 'text', T.DUCK)} AS sh
                FROM gen_docs)"""
        ).fetchall()
    )
    assert s == d


def test_minhash_parity_on_edge_texts(engines):
    body_s = (
        f"SELECT doc_id, {T.shingle_hash_expr(T.word_shingles(T.split_ws('text', T.SPARK), 'text', T.SPARK), T.SPARK)} AS hs FROM gen_docs"
    )
    body_d = (
        f"SELECT doc_id, {T.shingle_hash_expr(T.word_shingles(T.split_ws('text', T.DUCK), 'text', T.DUCK), T.DUCK)} AS hs FROM gen_docs"
    )
    # compose per-engine subqueries explicitly (FROM differs per dialect)
    spark, con = engines
    s_rows = sorted(
        tuple(str(v) for v in r)
        for r in spark.sql(
            f"SELECT doc_id, {', '.join(T.minhash_exprs('hs', T.SPARK))} FROM ({body_s})"
        ).collect()
    )
    d_rows = sorted(
        tuple(str(v) for v in r)
        for r in con.execute(
            f"SELECT doc_id, {', '.join(T.minhash_exprs('hs', T.DUCK))} FROM ({body_d})"
        ).fetchall()
    )
    assert s_rows == d_rows


def test_winnow_parity_on_edge_texts(engines):
    spark, con = engines

    def q(d: str, explode_fn: str) -> str:
        return (
            f"WITH g AS (SELECT doc_id, {T.winnow_gram_hashes('text', d)} AS g FROM gen_docs), "
            f"m AS (SELECT doc_id, {T.winnow_select('g', d)} AS mins FROM g) "
            f"SELECT DISTINCT doc_id, fp FROM "
            f"(SELECT doc_id, {explode_fn}(mins) AS fp FROM m)"
        )

    s = sorted((r.doc_id, r.fp) for r in spark.sql(q(T.SPARK, "explode")).collect())
    d = sorted((i, x) for i, x in con.execute(q(T.DUCK, "unnest")).fetchall())
    assert s == d


def test_word_ngrams_parity(engines):
    # duplicates KEPT and order preserved (the multiset builder for
    # repetition signals) — positional compare, not set compare
    spark, con = engines
    for n in (2, 3):
        def q(d: str, explode_fn: str) -> str:
            return (
                f"WITH w AS (SELECT doc_id, {T.split_ws('text', d)} AS w FROM gen_docs) "
                f"SELECT doc_id, {explode_fn}({T.word_ngrams('w', d, n)}) AS g FROM w"
            )
        s = sorted((r.doc_id, r.g) for r in spark.sql(q(T.SPARK, "explode")).collect())
        d = sorted((i, x) for i, x in con.execute(q(T.DUCK, "unnest")).fetchall())
        assert s == d, f"n={n}"
        # multiset check: repetition must survive (text 3 is 'a a a a a')
        from collections import Counter
        reps = Counter(g for i, g in s if i == 3)
        assert max(reps.values()) == 6 - n, reps
