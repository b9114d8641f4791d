"""Round-13 optimization equivalence pins: the restructured IVF-PQ
internals must be bit-identical to the legacy building blocks they
replaced (the optimization contract — same results, fewer jobs)."""

import pytest

from tests.conftest import SF_CORRECT


@pytest.fixture(scope="module")
def emb(spark):
    df = spark.read.parquet(f"{SF_CORRECT}/embeddings.parquet").cache()
    yield df
    df.unpersist()


def test_pq_sub_explode_matches_legacy_code_slices(spark, emb):
    """Optimization r13: ivfpq_topk's inline per-subspace quantization
    (_pq_sub_explode with the collected literal range) must produce the
    SAME (id, m, sub) rows as slicing the legacy engine-derived
    sq8_codes frame with pq_sub_expr — the candidate-assignment input is
    bit-identical, so the whole downstream argmin/ADC pipeline is too."""
    from etl_gamma_spark.operators.similarity import (
        _pq_query_metadata,
        _pq_sub_explode,
        pq_sub_expr,
        sq8_codes,
    )

    m_sub, sub_dim = 8, 8
    lo, hi, _qv, _qsubs = _pq_query_metadata(
        emb, 0, 64, m_sub, "vec_id", "embedding"
    )
    codes = sq8_codes(emb).localCheckpoint()
    try:
        legacy = codes.selectExpr(
            "vec_id", f"explode(sequence(0, {m_sub - 1})) AS m", "c"
        ).selectExpr("vec_id", "m", f"{pq_sub_expr('c', 'm', sub_dim)} AS sub")
        new = _pq_sub_explode(
            emb.selectExpr("vec_id", "CAST(embedding AS ARRAY<DOUBLE>) AS v"),
            64,
            m_sub,
            lo,
            hi,
            "vec_id",
        )
        want = {(r.vec_id, r.m): list(r.sub) for r in legacy.collect()}
        got = {(r.vec_id, r.m): list(r.sub) for r in new.collect()}
        assert got == want
    finally:
        codes.unpersist()


def test_pq_query_metadata_matches_engine_range_and_codes(spark, emb):
    """The fused one-job metadata aggregate must return the same range
    as collect_sq8_range and the same query code slices as the engine
    quantization of the query row."""
    from etl_gamma_spark.operators.similarity import (
        _pq_query_metadata,
        _py_sq8_codes,
        collect_sq8_range,
    )

    lo, hi, qv, qsubs = _pq_query_metadata(emb, 0, 64, 8, "vec_id", "embedding")
    lo2, hi2 = collect_sq8_range(emb)
    assert (lo, hi) == (lo2, hi2)
    qc = _py_sq8_codes(qv, lo, hi)
    assert [c for sub in qsubs for c in sub] == qc
    with pytest.raises(ValueError, match="not found"):
        _pq_query_metadata(emb, -12345, 64, 8, "vec_id", "embedding")


def test_pq_assign_packed_carry_matches_join(spark, emb):
    """pq_assign_packed(carry=('centroid_id',)) must equal the legacy
    packed-then-join shape it replaced in pq_write_index."""
    from etl_gamma_spark.operators.similarity import (
        _assign_to,
        pq_assign_packed,
        pq_codebook,
        seed_centroids,
        sq8_codes,
    )

    codes = sq8_codes(emb).localCheckpoint()
    try:
        book = pq_codebook(codes, 32, 8, 8)
        cents = seed_centroids(emb, 16)
        cells = _assign_to(
            codes.select("vec_id", "v"), cents, 64, "vec_id"
        ).localCheckpoint()
        legacy = (
            pq_assign_packed(codes, book, 8, 8, "vec_id", 32)
            .join(cells.select("vec_id", "centroid_id"), "vec_id")
        )
        combined = cells.join(
            codes.select("vec_id", "c"), "vec_id"
        )
        new = pq_assign_packed(
            combined.select("vec_id", "c", "centroid_id"),
            book,
            8,
            8,
            "vec_id",
            32,
            carry=("centroid_id",),
        )
        want = {
            r.vec_id: (list(r.code), r.centroid_id) for r in legacy.collect()
        }
        got = {r.vec_id: (list(r.code), r.centroid_id) for r in new.collect()}
        assert got == want
    finally:
        codes.unpersist()
