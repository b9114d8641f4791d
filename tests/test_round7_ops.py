"""Independent verification of the round-7 additions: reciprocal-rank
fusion (operators/retrieval.py::rrf_fuse) recomputed in pure Python from
its two input rankings, and the TPC-H Q6 plan/value contract."""

from etl_gamma_spark.io import load_table
from tests.conftest import SF_SMOKE

_TERMS = ["spark", "vector", "window", "scan"]


def test_rrf_fuse_matches_python_fusion(spark):
    from etl_gamma_spark.operators.retrieval import bm25_topk, rrf_fuse
    from etl_gamma_spark.operators.similarity import brute_force_topk

    docs = load_table(spark, SF_SMOKE, "documents")
    emb = load_table(spark, SF_SMOKE, "embeddings")

    lex = bm25_topk(docs, _TERMS, k=20).collect()  # already (bm25 desc, id)
    sem = brute_force_topk(emb, query_id=0, k=20).collect()
    lex_rank = {r.doc_id: i + 1 for i, r in enumerate(lex)}
    sem_rank = {r.vec_id: i + 1 for i, r in enumerate(sem)}
    fused = {}
    for d in set(lex_rank) | set(sem_rank):
        s = 0
        if d in lex_rank:
            s += 1_000_000_000 // (60 + lex_rank[d])
        if d in sem_rank:
            s += 1_000_000_000 // (60 + sem_rank[d])
        fused[d] = s
    want = sorted(fused.items(), key=lambda kv: (-kv[1], kv[0]))[:10]

    got = rrf_fuse(docs, emb, _TERMS).collect()
    assert [(r.doc_id, r.rrf_ppb) for r in got] == want
    for r in got:
        assert r.lex_rank == lex_rank.get(r.doc_id)
        assert r.sem_rank == sem_rank.get(r.doc_id)


def test_rrf_fuse_requires_terms(spark):
    import pytest

    from etl_gamma_spark.operators.retrieval import rrf_fuse

    docs = load_table(spark, SF_SMOKE, "documents")
    emb = load_table(spark, SF_SMOKE, "embeddings")
    with pytest.raises(ValueError):
        rrf_fuse(docs, emb, []).collect()


def test_tpch_q6_revenue_matches_decimal_python(spark):
    """Recompute Q6 in pure Python Decimal over the filtered fixture rows
    — an independent transcription of the exact-decimal contract (round
    raw inputs, exact product, HALF_UP cents at the end)."""
    from decimal import ROUND_HALF_UP, Decimal

    from etl_gamma_spark.registry import QUERIES

    li = load_table(spark, SF_SMOKE, "lineitem").selectExpr(
        "l_shipdate", "l_extendedprice", "l_discount", "l_quantity"
    )
    rows = li.where(
        "CAST(l_shipdate AS DATE) >= DATE '1996-01-01'"
        " AND CAST(l_shipdate AS DATE) < DATE '1997-01-01'"
        " AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24"
    ).collect()
    cents = Decimal("0.01")
    total = Decimal(0)
    for r in rows:
        p2 = Decimal(repr(r.l_extendedprice)).quantize(cents, ROUND_HALF_UP)
        d6 = Decimal(repr(r.l_discount)).quantize(
            Decimal("0.000001"), ROUND_HALF_UP
        )
        total += p2 * d6
    want = total.quantize(cents, ROUND_HALF_UP)

    got = QUERIES["tpch_q6_forecast_revenue"](spark, SF_SMOKE).first()
    assert got.n_items == len(rows)
    assert Decimal(str(got.revenue)) == want


def test_dsir_weights_behavior_and_float_recount(spark):
    """DSIR semantics (parity is covered by the oracle suite): documents
    sharing the target domain's bigrams must score higher than
    out-of-domain ones, and a pure-Python recount with true math.log
    must agree to ~1e-6 (the portable-ln contract)."""
    import hashlib
    import math

    from etl_gamma_spark.operators.quality import dsir_weights

    rows = [
        (1, "alpha beta alpha beta alpha", "tgt"),
        (2, "alpha beta alpha", "tgt"),
        (3, "alpha beta gamma", "raw"),
        (4, "zeta eta theta iota", "raw"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {
        r.doc_id: r
        for r in dsir_weights(docs, "source = 'tgt'", n_buckets=4096).collect()
    }
    # ranking: the target docs themselves score highest, the target-like
    # doc 3 ("alpha beta ...") beats out-of-domain doc 4. (Absolute sign
    # is not meaningful at toy scale: with add-1 smoothing over B=4096
    # buckets the weight ~ ln((c_t+1)/(c_r+1)) <= 0 whenever the target
    # is a subset of the corpus — only the ordering matters.)
    assert float(got[1].avg_w) > float(got[3].avg_w) > float(got[4].avg_w)

    B = 4096

    def feats(text):
        ws = text.split(" ")
        return [
            int(hashlib.md5(f"{a} {b}".encode()).hexdigest()[:15], 16) % B
            for a, b in zip(ws, ws[1:])
        ]

    c_r, c_t = {}, {}
    n_r = n_t = 0
    for _, text, src in rows:
        for f in feats(text):
            c_r[f] = c_r.get(f, 0) + 1
            n_r += 1
            if src == "tgt":
                c_t[f] = c_t.get(f, 0) + 1
                n_t += 1
    for doc_id, text, _ in rows:
        fs = feats(text)
        w = sum(
            math.log((c_t.get(f, 0) + 1) / (n_t + B))
            - math.log((c_r[f] + 1) / (n_r + B))
            for f in fs
        ) / len(fs)
        assert abs(float(got[doc_id].avg_w) - w) < 1e-6, (doc_id, w)
        assert got[doc_id].n_feats == len(fs)
