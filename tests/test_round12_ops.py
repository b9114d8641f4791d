"""Round-12 additions: PQ (product-quantization / ADC) compressed-domain
ANN, and the ADVICE-r11 NULLIF guard on tokenizer_fertility (an
all-empty-text language group has bpe_tokens = 0 and sessions run ANSI
mode — unguarded DIV 0 threw in BOTH engines)."""

import duckdb
import pytest

from etl_gamma_spark.registry import _D, _S, _tokenizer_fertility_sql
from tests.conftest import SF_CORRECT


@pytest.fixture(scope="module")
def emb(spark):
    df = spark.read.parquet(f"{SF_CORRECT}/embeddings.parquet").cache()
    yield df
    df.unpersist()


def test_pq_topk_recall_vs_brute_force(spark, emb):
    from etl_gamma_spark.operators.similarity import brute_force_topk, pq_topk

    exact = [r.vec_id for r in brute_force_topk(emb, query_id=0, k=10).collect()]
    got = pq_topk(emb, query_id=0, k=10).collect()
    approx = [r.vec_id for r in got]
    assert len(approx) == 10
    # PQ codes are coarser than SQ8's 64 bytes, so the defaults are 32
    # entries/subspace + an 8x rerank pool (recall 1.0 on this fixture;
    # the 16-entry/4x combination read 0.4 — the sweep is in the round-12
    # notes). Floor at 0.7 to keep slack for fixture regeneration.
    overlap = len(set(exact) & set(approx)) / 10
    assert overlap >= 0.7, f"PQ recall collapsed: {overlap}"
    # output is (vec_id, adc_d2, cosine); ADC distances are exact ints
    for r in got:
        assert isinstance(r.adc_d2, int) and r.adc_d2 >= 0
    # deterministic across runs (pure function of the corpus)
    approx2 = [r.vec_id for r in pq_topk(emb, query_id=0, k=10).collect()]
    assert approx == approx2


def test_ivfpq_topk_recall_and_subset_of_cells(spark, emb):
    """IVF-PQ: recall stays useful (the n_probe=4-of-16-cell cut is the
    recall ceiling — ivf_topk's own recall test bounds it), every result
    must come from a probed cell, and the composition is deterministic."""
    from pyspark.sql import functions as F

    from etl_gamma_spark.operators.similarity import (
        brute_force_topk,
        ivfpq_topk,
        ivf_build,
        ivf_topk,
        seed_centroids,
    )

    cents = seed_centroids(emb, 16)
    index = (ivf_build(emb, cents), cents)
    exact = [r.vec_id for r in brute_force_topk(emb, query_id=0, k=10).collect()]
    got = ivfpq_topk(emb, query_id=0, k=10, n_probe=4, index=index).collect()
    assert len(got) == 10
    overlap = len(set(exact) & {r.vec_id for r in got}) / 10
    # plain IVF at the same n_probe is the ceiling; ADC + 8x rerank should
    # recover essentially all of it
    ivf_ids = {
        r.vec_id
        for r in ivf_topk(emb, query_id=0, k=10, n_probe=4, index=index).collect()
    }
    ivf_overlap = len(set(exact) & ivf_ids) / 10
    assert overlap >= ivf_overlap - 0.2, (overlap, ivf_overlap)
    assert overlap >= 0.3, f"IVF-PQ recall collapsed: {overlap}"
    # every survivor sits in one of (at most) the 4 probed cells
    assign = {r.vec_id: r.centroid_id for r in index[0].collect()}
    cells_of_results = {assign[r.vec_id] for r in got}
    assert len(cells_of_results) <= 4
    got2 = ivfpq_topk(emb, query_id=0, k=10, n_probe=4, index=index).collect()
    assert [r.vec_id for r in got] == [r.vec_id for r in got2]


def test_ivfpq_persisted_prunes_both_scans_and_matches_memory(spark, emb, tmp_path):
    """The written IVF-PQ index: BOTH scans (the M-int PQ codes for ADC
    and the float cells for rerank) must partition-prune to the probed
    cells, the ADC stage must be join-free (the LUT is inlined as
    literal arrays), and the persisted answer must equal the in-memory
    composition's bit-for-bit."""
    import re as _re

    from etl_gamma_spark.operators.similarity import (
        ivf_build,
        ivfpq_topk,
        ivfpq_topk_persisted,
        pq_write_index,
        probe_cells,
        seed_centroids,
    )
    from tests.test_plan_quality import _explain

    base = str(tmp_path / "ivfpq_index")
    pq_write_index(emb, seed_centroids(emb, 16), base, m_sub=8, n_codes=32)
    qv = [float(x) for x in emb.filter("vec_id = 0").select("embedding").head()[0]]
    cells = probe_cells(spark, base, qv, n_probe=4)

    topk = ivfpq_topk_persisted(
        spark, base, qv, k=10, n_probe=4, rerank=80, n_codes=32, exclude_id=0
    )
    plan = _explain(topk)
    filters = _re.findall(
        r"PartitionFilters: \[centroid_id[^ ]* IN \(([^)]*)\)", plan
    )
    assert len(filters) == 2, f"expected 2 pruned scans:\n{plan}"
    for f in filters:
        assert {int(x) for x in f.split(",")} == set(cells)
    # ADC candidate generation is join-free: exactly one join in the
    # whole plan (rerank ids onto the float cells), broadcast hash
    assert plan.count("BroadcastHashJoin") == 2  # tree + details
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan

    cents = seed_centroids(emb, 16)
    mem = ivfpq_topk(
        emb, query_id=0, k=10, n_probe=4, rerank=80, n_codes=32,
        index=(ivf_build(emb, cents), cents),
    )
    got = [(r[0], r[1], r[2]) for r in topk.collect()]
    want = [(r[0], r[1], r[2]) for r in mem.collect()]
    assert got == want


def test_pq_assignment_invariants(spark, emb):
    """Every (vector, subspace) gets exactly one code in [0, n_codes);
    a codebook SEED vector must assign to its own entry in every subspace
    (its distance there is exactly 0)."""
    from etl_gamma_spark.operators.similarity import (
        pq_assign,
        pq_codebook,
        sq8_codes,
    )

    codes = sq8_codes(emb.limit(200)).localCheckpoint()
    book = pq_codebook(codes, n_codes=16, m_sub=8, sub_dim=8)
    assign = pq_assign(codes, book, m_sub=8, sub_dim=8).collect()
    per_vec = {}
    for r in assign:
        assert 0 <= r.code_id < 16
        per_vec.setdefault(r.vec_id, set()).add(r.m)
    assert all(ms == set(range(8)) for ms in per_vec.values())
    # seed vectors: codebook entry code_id j came from the j-th vector by
    # id, so that vector's subvector distance to entry j is 0 — unless an
    # EARLIER entry ties at 0 (duplicate subvectors), which the code_id
    # tiebreak resolves downward; assert assigned distance is 0 via the
    # codebook itself
    entries = {(r.m, r.code_id): list(r.entry) for r in book.collect()}
    seed_ids = sorted({r.vec_id for r in codes.orderBy("vec_id").limit(16).collect()})
    subs = {
        (r.vec_id, r.m): list(r.sub)
        for r in codes.selectExpr(
            "vec_id", "explode(sequence(0, 7)) AS m", "c"
        )
        .selectExpr("vec_id", "m", "slice(c, m * 8 + 1, 8) AS sub")
        .filter(f"vec_id IN ({','.join(str(i) for i in seed_ids)})")
        .collect()
    }
    got = {(r.vec_id, r.m): r.code_id for r in assign}
    for j, vid in enumerate(seed_ids):
        for m in range(8):
            assert subs[(vid, m)] == entries[(m, got[(vid, m)])]


def test_pq_lut_is_query_only_and_tiny(spark, emb):
    """The ADC lookup table is built from the query alone: m_sub x n_codes
    rows of exact integers — the broadcast-sized object that replaces
    per-candidate float arithmetic."""
    from etl_gamma_spark.operators.similarity import (
        pq_codebook,
        pq_sub_expr,
        sq8_codes,
        sq8_dist2_expr,
    )
    from pyspark.sql import functions as F

    codes = sq8_codes(emb).localCheckpoint()
    book = pq_codebook(codes, n_codes=16, m_sub=8, sub_dim=8)
    qsubs = (
        codes.filter(F.col("vec_id") == 0)
        .selectExpr("explode(sequence(0, 7)) AS m", "c")
        .selectExpr("m", f"{pq_sub_expr('c', 'm', 8)} AS qsub")
    )
    lut = book.join(F.broadcast(qsubs), "m").selectExpr(
        "m", "code_id", f"{sq8_dist2_expr('qsub', 'entry', 8)} AS t"
    )
    rows = lut.collect()
    assert len(rows) == 8 * 16
    assert all(r.t >= 0 for r in rows)


def test_flat_literal_sq8_path_matches_legacy_building_blocks(spark, emb):
    """Optimization r12: sq8_topk's literal-range quantize projection
    (driver-side collect_sq8_range — serving-shape quantizer metadata)
    must be bit-identical to the engine-derived attached-range
    sq8_codes it replaced. (pq_topk/ivfpq_topk deliberately KEEP the
    engine-side codebook pipeline: the full-codebook literal form blows
    Janino's 64 KB codegen limit and runs interpreted — see
    pq_write_index's docstring.)"""
    from etl_gamma_spark.operators.similarity import (
        _dlit,
        collect_sq8_range,
        sq8_code_expr,
        sq8_codes,
    )

    lo, hi = collect_sq8_range(emb)
    codes = sq8_codes(emb).localCheckpoint()
    try:
        code = sq8_code_expr("v", 64, lo=_dlit(lo), hi=_dlit(hi))
        flat_frame = (
            emb.selectExpr("vec_id", "CAST(embedding AS ARRAY<DOUBLE>) AS v")
            .selectExpr("vec_id", f"{code} AS c")
        )
        eng_c = {r.vec_id: list(r.c) for r in codes.collect()}
        for r in flat_frame.collect():
            assert list(r.c) == eng_c[r.vec_id], r.vec_id
    finally:
        codes.unpersist()


def _rows_by_lang(rows):
    return {r[0]: tuple(r[1:]) for r in rows}


def test_tokenizer_fertility_empty_language_group_is_null_not_error(spark):
    # doc 1-2: zero BPE tokens (empty / space-only text -> lang 'und');
    # doc 3: a normal English doc so a healthy group coexists
    data = [
        (1, ""),
        (2, "   "),
        (3, "the quick brown fox and the lazy dog of it"),
    ]
    spark.createDataFrame(
        data, "doc_id long, text string"
    ).createOrReplaceTempView("__tokfert_empty")
    got = _rows_by_lang(
        [
            tuple(r)
            for r in spark.sql(
                _tokenizer_fertility_sql(_S, "__tokfert_empty")
            ).collect()
        ]
    )
    assert got["und"][2] == 0  # bpe_tokens sum really is zero
    assert got["und"][5] is None  # chars_per_token_permille: NULL, no throw
    assert got["en"][4] is not None and got["en"][5] is not None

    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", data)
    oracle = _rows_by_lang(con.execute(_tokenizer_fertility_sql(_D)).fetchall())
    assert oracle == got


# --- round-12 batch 2: mixture_plan / collocations_pmi / hard negatives ---


def test_mixture_plan_hand_computed(spark):
    """Exact-integer check of every column against a hand Decimal model:
    weights {A:2, B:1}, budget 100 tokens, cap 1.5 epochs.
      A: 3 docs, 10 tokens -> target HALF_UP(200/3)=67,
         epochs HALF_UP(67000/10)=6700 -> capped 1500,
         realized floor(1500*10/1000)=15, deficit 52
      B: 1 doc,   4 tokens -> target HALF_UP(100/3)=33,
         epochs HALF_UP(33000/4)=8250 -> capped 1500,
         realized floor(1500*4/1000)=6, deficit 27
    """
    from etl_gamma_spark.operators.quality import mixture_plan

    docs = spark.createDataFrame(
        [
            (1, "a b", "A"),
            (2, "a b c", "A"),
            (3, "a b c d e", "A"),
            (4, "x y z w", "B"),
            (5, "ignored entirely", "C"),  # no weight -> excluded
        ],
        "doc_id long, text string, source string",
    )
    got = {
        r.source: r.asDict()
        for r in mixture_plan(
            docs, {"A": 2, "B": 1}, 100, max_epochs_milli=1500
        ).collect()
    }
    assert set(got) == {"A", "B"}
    a, b = got["A"], got["B"]
    assert (a["n_docs"], a["n_tokens"]) == (3, 10)
    assert (b["n_docs"], b["n_tokens"]) == (1, 4)
    assert a["weight_ppm"] == 666667 and b["weight_ppm"] == 333333
    assert a["target_tokens"] == 67 and b["target_tokens"] == 33
    assert a["epochs_milli"] == 6700 and b["epochs_milli"] == 8250
    assert a["epochs_capped_milli"] == 1500 == b["epochs_capped_milli"]
    assert a["realized_tokens"] == 15 and b["realized_tokens"] == 6
    assert a["deficit_tokens"] == 52 and b["deficit_tokens"] == 27


def test_collocations_pmi_hand_computed(spark):
    """Corpus 'a b a b' has bigrams (a b) x2, (b a) x1; tot=3.
    pmi(a,b) = ln(2*3/(2*2)) = ln(1.5); pmi(b,a) = ln(1*3/(1*1)) = ln(3).
    The portable expansion is within 1e-8 of true ln."""
    import math

    from etl_gamma_spark.operators.retrieval import collocations_pmi

    docs = spark.createDataFrame([(1, "a b a b")], "doc_id long, text string")
    got = {
        (r.w1, r.w2): (r.c12, float(r.pmi9))
        for r in collocations_pmi(docs, min_count=1).collect()
    }
    assert got[("a", "b")][0] == 2 and got[("b", "a")][0] == 1
    assert abs(got[("a", "b")][1] - math.log(1.5)) < 1e-8
    assert abs(got[("b", "a")][1] - math.log(3.0)) < 1e-8


def test_collocations_pmi_min_count_cut_after_marginals(spark):
    """The min_count filter must NOT change surviving bigrams' pmi: the
    marginals and total are corpus-wide. 'a b' survives a min_count=2 cut
    with the same pmi it has at min_count=1."""
    from etl_gamma_spark.operators.retrieval import collocations_pmi

    docs = spark.createDataFrame([(1, "a b a b")], "doc_id long, text string")
    all_rows = {
        (r.w1, r.w2): r.pmi9 for r in collocations_pmi(docs, min_count=1).collect()
    }
    cut = {(r.w1, r.w2): r.pmi9 for r in collocations_pmi(docs, min_count=2).collect()}
    assert set(cut) == {("a", "b")}
    assert cut[("a", "b")] == all_rows[("a", "b")]


def test_hard_negative_mining_semantics(spark):
    """Anchors 0 (label 1) and 1 (label 9, unique): negatives all carry a
    different label, rank follows cosine desc, pos_cosine is the best
    same-label cosine, margin = pos - neg; a label-unique anchor gets
    NULL pos/margin but keeps its negative rows."""
    from etl_gamma_spark.operators.similarity import (
        brute_force_topk,
        hard_negative_mining,
    )

    rows = [
        (0, [1.0, 0.0, 0.0, 0.0], 1),
        (1, [0.0, 1.0, 0.0, 0.0], 9),   # unique label
        (2, [0.9, 0.1, 0.0, 0.0], 1),   # 0's positive
        (3, [0.8, 0.2, 0.0, 0.0], 2),   # 0's best negative
        (4, [0.5, 0.5, 0.0, 0.0], 2),
        (5, [0.0, 0.9, 0.1, 0.0], 2),   # 1's best negative
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    out = hard_negative_mining(emb, n_queries=2, k=2).collect()
    by_anchor = {}
    for r in out:
        by_anchor.setdefault(r.query_id, []).append(r)
    labels = {v: lb for v, _, lb in rows}
    for qid, rs in by_anchor.items():
        rs.sort(key=lambda r: r.rank)
        cosines = [r.cosine for r in rs]
        assert cosines == sorted(cosines, reverse=True)
        for r in rs:
            assert labels[r.vec_id] != labels[qid]
    # anchor 0: positive is vec 2; its cosine must equal the brute-force
    # same-label max, and margins are consistent
    a0 = by_anchor[0]
    assert a0[0].vec_id == 3
    assert a0[0].pos_cosine is not None
    for r in a0:
        assert abs(r.margin - (r.pos_cosine - r.cosine)) == 0.0
    # anchor 1: unique label -> NULL positive, rows kept
    a1 = by_anchor[1]
    assert len(a1) == 2 and a1[0].vec_id == 5
    assert all(r.pos_cosine is None and r.margin is None for r in a1)


def test_packing_efficiency_hand_computed(spark):
    """Tokens 3,2,4 at capacity 4: cum 3,5,9 -> doc2 straddles bins 0-1,
    doc3 straddles 1-2; n_bins=3, pad=12-9=3, util=HALF_UP(9000/12)=750."""
    from etl_gamma_spark.operators.quality import packing_efficiency

    docs = spark.createDataFrame(
        [(1, "a b c", "A"), (2, "d e", "A"), (3, "f g h i", "A")],
        "doc_id long, text string, source string",
    )
    [r] = packing_efficiency(docs, capacity=4).collect()
    assert (r.n_docs, r.total_tokens, r.n_bins) == (3, 9, 3)
    assert r.straddlers == 2
    assert r.pad_tokens == 3
    assert r.util_permille == 750


def test_ivf_cell_balance_counts_empty_and_oversized(spark):
    """Hand centroid table: c0 at the origin-ish cluster (8 of 10 vectors
    -> 8*4 > 2*10, oversized), c1 and c2 with one vector each, c3 far from
    everything (EMPTY cell still reported, share 0, not oversized)."""
    from etl_gamma_spark.operators.similarity import ivf_cell_balance

    vecs = [(i, [float(i) * 0.01, 0.0, 0.0, 0.0], 0) for i in range(8)]
    vecs += [(8, [5.0, 5.0, 0.0, 0.0], 0), (9, [-5.0, 5.0, 0.0, 0.0], 0)]
    emb = spark.createDataFrame(
        vecs, "vec_id long, embedding array<float>, label int"
    )
    cents = spark.createDataFrame(
        [
            (0, [0.0, 0.0, 0.0, 0.0]),
            (1, [5.0, 5.0, 0.0, 0.0]),
            (2, [-5.0, 5.0, 0.0, 0.0]),
            (3, [100.0, 100.0, 100.0, 100.0]),
        ],
        "centroid_id int, centroid array<double>",
    )
    got = {
        r.centroid_id: r for r in ivf_cell_balance(emb, cents, 4, dim=4).collect()
    }
    assert set(got) == {0, 1, 2, 3}
    assert got[0].n_vectors == 8 and got[0].oversized is True
    assert got[1].n_vectors == 1 and got[1].oversized is False
    assert got[3].n_vectors == 0 and got[3].share_ppm == 0
    assert got[3].oversized is False
    assert sum(r.n_vectors for r in got.values()) == 10
    # HALF_UP ppm: 8/10 -> 800000, 1/10 -> 100000
    assert got[0].share_ppm == 800000 and got[1].share_ppm == 100000


def test_vocab_coverage_hand_computed(spark):
    """'a a a b b c': counts 3/2/1, mass 6. K=1 -> 3 (500 permille),
    K=2 -> 5 (HALF_UP 833), K=4 > |types| -> 6 (1000)."""
    from etl_gamma_spark.operators.tokenize import vocab_coverage

    docs = spark.createDataFrame([(1, "a a a b b c")], "doc_id long, text string")
    got = {
        r.vocab_k: (r.covered_tokens, r.coverage_permille)
        for r in vocab_coverage(docs, (1, 2, 4)).collect()
    }
    assert got == {1: (3, 500), 2: (5, 833), 4: (6, 1000)}


def test_vocab_coverage_partial_class(spark):
    """'a a b b c c d': three tied types at count 2 — K=2 lands INSIDE
    the class, covering exactly 2 of the 3 interchangeable types:
    covered = 4 of mass 7 (HALF_UP 571)."""
    from etl_gamma_spark.operators.tokenize import vocab_coverage

    docs = spark.createDataFrame([(1, "a a b b c c d")], "doc_id long, text string")
    got = {
        r.vocab_k: (r.covered_tokens, r.coverage_permille)
        for r in vocab_coverage(docs, (2,)).collect()
    }
    assert got == {2: (4, 571)}


def test_classifier_threshold_sweep_consistent_with_scores(spark):
    from etl_gamma_spark.operators.quality import (
        classifier_threshold_sweep,
        hash_classifier_score,
    )

    docs = spark.createDataFrame(
        [(i, f"tok{i} tok{i % 3} common word") for i in range(12)],
        "doc_id long, text string",
    )
    margins = [r.margin_micro for r in hash_classifier_score(docs).collect()]
    assert len(margins) == 12
    ts = (min(margins) - 1, 0, max(margins) + 1)
    got = {
        r.threshold_micro: (r.n_kept, r.keep_permille)
        for r in classifier_threshold_sweep(docs, ts).collect()
    }
    for t in ts:
        expect = sum(1 for m in margins if m >= t)
        assert got[t][0] == expect
        assert got[t][1] == (2000 * expect + 12) // 24
    assert got[min(margins) - 1][0] == 12 and got[max(margins) + 1][0] == 0


def test_vocab_coverage_fuzz_vs_bruteforce(spark):
    """Random Zipf-ish corpora (heavy tie classes) vs the obvious model:
    sort types by count desc, take K, sum their counts. The count-class
    cumulative form must agree EXACTLY for every K, including K inside a
    tie class (same-count types are interchangeable) and K > |types|."""
    import random

    from etl_gamma_spark.operators.tokenize import vocab_coverage

    rng = random.Random(12)
    for trial in range(4):
        # many types at few distinct counts -> partial-class Ks are common
        types = [f"w{i}" for i in range(rng.randint(5, 40))]
        counts = {t: rng.choice([1, 1, 2, 2, 3, 5, 8]) for t in types}
        tokens = [t for t, c in counts.items() for _ in range(c)]
        rng.shuffle(tokens)
        # split the stream across a few documents
        docs, i = [], 0
        did = 0
        while i < len(tokens):
            j = min(len(tokens), i + rng.randint(3, 9))
            docs.append((did, " ".join(tokens[i:j])))
            did += 1
            i = j
        ks = tuple(sorted({1, 2, rng.randint(1, len(types)), len(types) + 5}))
        df = spark.createDataFrame(docs, "doc_id long, text string")
        got = {
            r.vocab_k: r.covered_tokens
            for r in vocab_coverage(df, ks).collect()
        }
        ordered = sorted(counts.values(), reverse=True)
        total = sum(ordered)
        for k in ks:
            expect = sum(ordered[:k]) if k <= len(ordered) else total
            assert got[k] == expect, (trial, k, got[k], expect, ordered)


def test_mixture_plan_fuzz_vs_decimal_model(spark):
    """Random corpora/weights/budgets vs a pure-Python integer HALF_UP
    model of every column."""
    import random

    from etl_gamma_spark.operators.quality import mixture_plan

    def half_up(a, b):  # non-negative a/b
        return (2 * a + b) // (2 * b)

    rng = random.Random(34)
    for trial in range(3):
        sources = [f"s{i}" for i in range(rng.randint(2, 5))]
        weights = {s: rng.randint(1, 9) for s in sources}
        wsum = sum(weights.values())
        budget = rng.randint(50, 5000)
        cap = rng.choice([800, 1500, 10_000_000])
        rows, toks = [], {}
        did = 0
        for s in sources:
            toks[s] = 0
            for _ in range(rng.randint(1, 6)):
                n = rng.randint(1, 12)
                rows.append((did, " ".join(f"t{j}" for j in range(n)), s))
                toks[s] += n
                did += 1
        df = spark.createDataFrame(rows, "doc_id long, text string, source string")
        got = {
            r.source: r.asDict()
            for r in mixture_plan(df, weights, budget, max_epochs_milli=cap).collect()
        }
        for s in sources:
            t = toks[s]
            target = half_up(budget * weights[s], wsum)
            epochs = half_up(target * 1000, t)
            capped = min(epochs, cap)
            realized = capped * t // 1000
            r = got[s]
            assert r["weight_ppm"] == half_up(weights[s] * 1_000_000, wsum)
            assert r["n_tokens"] == t and r["target_tokens"] == target
            assert r["epochs_milli"] == epochs
            assert r["epochs_capped_milli"] == capped
            assert r["realized_tokens"] == realized
            assert r["deficit_tokens"] == target - realized


def test_boilerplate_share_hand_computed(spark):
    """chunk_words=2: doc1 = [a b, c d, a b]-style repeats across docs and
    within one doc; every occurrence of a chunk with corpus df >= 2
    counts as boilerplate."""
    from etl_gamma_spark.operators.dedup import boilerplate_share

    docs = spark.createDataFrame(
        [
            (1, "a b c d a b"),   # chunks: 'a b','c d','a b' -> 'a b' df 3
            (2, "a b x y"),       # chunks: 'a b','x y'       -> 'a b' dup
            (3, "p q"),           # chunk:  'p q'              -> unique
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_chunks, r.dup_chunks, r.boilerplate_permille)
        for r in boilerplate_share(docs, chunk_words=2).collect()
    }
    # doc1: 3 chunks, 'a b' x2 dup (df=3), 'c d' unique -> 2/3 -> 667
    assert got[1] == (3, 2, 667)
    # doc2: 2 chunks, 'a b' dup -> 1/2 -> 500
    assert got[2] == (2, 1, 500)
    # doc3: 1 chunk, unique -> 0
    assert got[3] == (1, 0, 0)
