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
