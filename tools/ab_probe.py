#!/usr/bin/env python3
"""Interleaved A/B adjudication of a suspected perf regression (VERDICT
r12 item 1): run two plan-construction arms ALTERNATING in ONE session
(same warmup, same ambient load window), N runs per arm, report per-run
seconds + min per arm + loadavg. Evidence lands under plans/<tag>/ so
the adjudication survives the session (VERDICT r12 item 8).

Arms are named plan builders registered in ARMS below: each is a
callable (spark, sf_dir) -> DataFrame, materialized with the noop sink
(guide §1.4). Arm "cur:<query>" runs the registered carrier as-is; the
"old:*" arms reproduce the pre-change carrier shape with current
operator code so the diff under test is ONLY the structural change.

Usage: python tools/ab_probe.py <tag> <arm_a> <arm_b> [runs_per_arm]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_gamma_spark.registry import QUERIES  # noqa: E402
from etl_gamma_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _old_incremental_neardup(spark, sf_dir):
    """Pre-4064232 carrier shape: per-side signature pipelines + an outer
    checkpoint of the corpus 4x-band union (3 eager sig materializations
    instead of 1)."""
    from etl_gamma_spark.operators import dedup as DD

    docs = spark.table("documents")
    corpus = docs.filter("doc_id % 10 <> 0")
    batch = docs.filter("doc_id % 10 = 0")
    index = DD.minhash_band_index(corpus).localCheckpoint()
    return DD.incremental_neardup_pairs(batch, index)


def _cur(name):
    def run(spark, sf_dir):
        return QUERIES[name](spark, sf_dir)

    return run


def _pagerank_variant(fold: bool, ckpt_nodes: bool, ckpt_e: bool):
    """Parameterized pagerank shapes for the checkpoint-discipline A/B:
    fold = round-1 contribution as a pure projection (no rank join);
    ckpt_nodes / ckpt_e = materialize the reused frames vs rely on
    ReusedExchange inside the single terminal job."""

    def run(spark, sf_dir):
        from pyspark.sql import functions as F

        from etl_gamma_spark.operators.graph import SCALE

        e0 = spark.table("lineitem").select("l_suppkey", "l_partkey").distinct()
        s = F.concat(F.lit("S"), F.col("l_suppkey").cast("string"))
        p = F.concat(F.lit("P"), F.col("l_partkey").cast("string"))
        edges = e0.select(s.alias("src"), p.alias("dst")).unionByName(
            e0.select(p.alias("src"), s.alias("dst"))
        )
        iters = 3
        edges = edges.localCheckpoint()
        nodes = (
            edges.select(F.col("src").alias("node"))
            .union(edges.select(F.col("dst").alias("node")))
            .distinct()
        )
        if ckpt_nodes:
            nodes = nodes.localCheckpoint()
        deg = edges.groupBy("src").agg(F.count("*").alias("out_deg"))
        e = edges.join(deg, "src")
        if ckpt_e:
            e = e.localCheckpoint()
        ranks = None
        for i in range(iters):
            if fold and ranks is None:
                contrib = e.select(
                    F.col("dst").alias("node"),
                    F.expr(f"{SCALE}L DIV out_deg").alias("c"),
                )
            else:
                r = ranks if ranks is not None else nodes.select(
                    "node", F.lit(SCALE).cast("long").alias("rank")
                )
                contrib = e.join(r, e["src"] == r["node"]).select(
                    F.col("dst").alias("node"),
                    F.expr("rank DIV out_deg").alias("c"),
                )
            sums = contrib.groupBy("node").agg(F.sum("c").alias("s"))
            ranks = nodes.join(sums, "node", "left").select(
                "node",
                (
                    F.lit(150_000) + F.expr("(85 * coalesce(s, 0L)) DIV 100")
                ).cast("long").alias("rank"),
            )
        return ranks

    return run


def _old_ivf_recall_sweep(spark, sf_dir):
    """Pre-r13 sweep shape: brute + four independent semi-join+rescore
    leg subplans."""
    from pyspark.sql import functions as F

    from etl_gamma_spark import registry as R
    from etl_gamma_spark.operators.similarity import brute_force_topk, ivf_topk

    emb = spark.table("embeddings")
    index = R._ivf_index(spark)
    brute = (
        brute_force_topk(emb, query_id=0, k=10)
        .select("vec_id")
        .localCheckpoint()
    )
    legs = []
    for np_ in R._SWEEP_PROBES:
        ivf = ivf_topk(
            emb, query_id=0, k=10, n_probe=np_, index=index
        ).select("vec_id")
        legs.append(
            ivf.join(brute, "vec_id")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_overlap"))
            .selectExpr(
                f"CAST({np_} AS BIGINT) AS n_probe",
                "n_overlap",
                "CAST(n_overlap * 10 AS BIGINT) AS recall_pct",
            )
        )
    out = legs[0]
    for leg in legs[1:]:
        out = out.unionByName(leg)
    return out


def _old_pq_topk(spark, sf_dir):
    """Pre-r13 pq_topk: eager full-corpus codes checkpoint; book, query
    subvectors and rerank vectors all read the checkpoint."""
    from pyspark.sql import functions as F

    from etl_gamma_spark import registry as R
    from etl_gamma_spark.operators.similarity import (
        bcast_attach,
        cosine_expr,
        pq_assign,
        pq_codebook,
        pq_sub_expr,
        sq8_codes,
        sq8_dist2_expr,
    )

    embeddings = spark.table("embeddings")
    query_id, k, rerank = 0, 10, R._PQ_RERANK
    dim, m_sub, n_codes = 64, R._PQ_M, R._PQ_CODES
    id_col = "vec_id"
    sub_dim = dim // m_sub
    codes = sq8_codes(embeddings, dim, id_col, "embedding").localCheckpoint()
    book = pq_codebook(codes, n_codes, m_sub, sub_dim, id_col)
    assign = pq_assign(codes, book, m_sub, sub_dim, id_col, n_codes)
    qsubs = (
        codes.filter(F.col(id_col) == query_id)
        .selectExpr(f"explode(sequence(0, {m_sub - 1})) AS m", "c")
        .selectExpr("m", f"{pq_sub_expr('c', 'm', sub_dim)} AS qsub")
    )
    lut = book.join(F.broadcast(qsubs), "m").selectExpr(
        "m", "code_id", f"{sq8_dist2_expr('qsub', 'entry', sub_dim)} AS t"
    )
    adc = (
        assign.filter(F.col(id_col) != query_id)
        .join(F.broadcast(lut), ["m", "code_id"])
        .groupBy(id_col)
        .agg(F.sum("t").cast("bigint").alias("adc_d2"))
    )
    cand = adc.orderBy("adc_d2", id_col).limit(rerank)
    q = codes.filter(F.col(id_col) == query_id).selectExpr(
        "v AS qv", f"{id_col} AS __qid"
    )
    scored = bcast_attach(
        codes.join(F.broadcast(cand), id_col), q, id_col, "__qid"
    ).selectExpr(id_col, "adc_d2", f"{cosine_expr('v', 'qv')} AS cosine")
    return scored.orderBy(F.col("cosine").desc(), F.col(id_col)).limit(k)


def _old_ivfpq_topk(spark, sf_dir):
    """Pre-r13 ivfpq_topk (the r12 shape): eager full-corpus codes
    checkpoint; book/qsubs/probe/rerank all read it; candidate codes
    via semi-join of the checkpoint."""
    from pyspark.sql import functions as F

    from etl_gamma_spark import registry as R
    from etl_gamma_spark.operators.similarity import (
        bcast_attach,
        cosine_expr,
        dist2_unrolled,
        pq_assign,
        pq_codebook,
        pq_sub_expr,
        sq8_codes,
        sq8_dist2_expr,
    )

    embeddings = spark.table("embeddings")
    query_id, k, rerank = 0, 10, R._PQ_RERANK
    dim, m_sub, n_codes = 64, R._PQ_M, R._PQ_CODES
    n_probe = R._IVF_PROBE
    id_col = "vec_id"
    sub_dim = dim // m_sub
    cell_of, centroids = R._ivf_index(spark)
    codes = sq8_codes(embeddings, dim, id_col, "embedding").localCheckpoint()
    book = pq_codebook(codes, n_codes, m_sub, sub_dim, id_col)
    qv = codes.filter(F.col(id_col) == query_id).selectExpr(
        "v AS qv", f"{id_col} AS __qid"
    )
    probe = (
        bcast_attach(centroids, qv, "centroid_id", "__qid")
        .selectExpr(
            "centroid_id", f"{dist2_unrolled('qv', 'centroid', dim)} AS d2"
        )
        .orderBy("d2", "centroid_id")
        .limit(n_probe)
        .select("centroid_id")
    )
    cand_ids = (
        cell_of.join(F.broadcast(probe), "centroid_id")
        .filter(F.col(id_col) != query_id)
        .select(id_col)
    )
    pq = pq_assign(
        codes.select(id_col, "c").join(cand_ids, id_col, "left_semi"),
        book,
        m_sub,
        sub_dim,
        id_col,
        n_codes,
    )
    qsubs = (
        codes.filter(F.col(id_col) == query_id)
        .selectExpr(f"explode(sequence(0, {m_sub - 1})) AS m", "c")
        .selectExpr("m", f"{pq_sub_expr('c', 'm', sub_dim)} AS qsub")
    )
    lut = book.join(F.broadcast(qsubs), "m").selectExpr(
        "m", "code_id", f"{sq8_dist2_expr('qsub', 'entry', sub_dim)} AS t"
    )
    adc = (
        pq.join(F.broadcast(lut), ["m", "code_id"])
        .groupBy(id_col)
        .agg(F.sum("t").cast("bigint").alias("adc_d2"))
    )
    cand = adc.orderBy("adc_d2", id_col).limit(rerank)
    scored = bcast_attach(
        codes.join(F.broadcast(cand), id_col), qv, id_col, "__qid"
    ).selectExpr(id_col, "adc_d2", f"{cosine_expr('v', 'qv')} AS cosine")
    return scored.orderBy(F.col("cosine").desc(), F.col(id_col)).limit(k)


def _old_ivfpq_persisted(spark, sf_dir):
    """Pre-r13 persisted carrier: two eager checkpoints (codes, cells),
    engine-side rng aggregate, id-join to attach centroid_id to the
    packed codes."""
    import os as _os
    import shutil as _sh
    import tempfile as _tf
    from concurrent.futures import ThreadPoolExecutor

    from pyspark.sql import functions as F

    from etl_gamma_spark import registry as R
    from etl_gamma_spark.operators.similarity import (
        _assign_to,
        ivfpq_topk_persisted,
        pq_assign_packed,
        pq_codebook,
        seed_centroids,
        sq8_codes,
        sq8_range_exprs,
    )
    from etl_gamma_spark.sources.sink import write_full_refresh

    emb = spark.table("embeddings")
    dim, m_sub, n_codes = 64, R._PQ_M, R._PQ_CODES
    sub_dim = dim // m_sub
    id_col, vec_col = "vec_id", "embedding"
    centroids = seed_centroids(emb, R._IVF_K)
    tmp = _tf.mkdtemp(prefix="etl_gamma_ivfpq_ab_")
    try:
        codes = sq8_codes(emb, dim, id_col, vec_col).localCheckpoint()
        book = pq_codebook(codes, n_codes, m_sub, sub_dim, id_col)
        cells = _assign_to(
            codes.select(id_col, "v"), centroids, dim, id_col
        ).localCheckpoint()
        pq_rows = pq_assign_packed(
            codes, book, m_sub, sub_dim, id_col, n_codes
        ).join(cells.select(id_col, "centroid_id"), id_col)
        emb_rows = cells.select(
            id_col, F.col("v").alias(vec_col), "centroid_id"
        )
        rmin, rmax = sq8_range_exprs("v", dim)
        rng = (
            codes.selectExpr(f"{rmin} AS __rmin", f"{rmax} AS __rmax")
            .agg(F.min("__rmin").alias("__lo"), F.max("__rmax").alias("__hi"))
        )
        writes = [
            lambda: write_full_refresh(
                emb_rows, _os.path.join(tmp, "ivf"), ["centroid_id"]
            ),
            lambda: write_full_refresh(
                pq_rows, _os.path.join(tmp, "pq"), ["centroid_id"]
            ),
            lambda: write_full_refresh(book, _os.path.join(tmp, "codebook")),
            lambda: write_full_refresh(
                centroids, _os.path.join(tmp, "centroids")
            ),
            lambda: write_full_refresh(rng, _os.path.join(tmp, "sq8_range")),
        ]
        with ThreadPoolExecutor(max_workers=3) as pool:
            for fut in [pool.submit(w) for w in writes]:
                fut.result()
        qv = [
            float(x)
            for x in emb.filter("vec_id = 0").select("embedding").head()[0]
        ]
        return ivfpq_topk_persisted(
            spark,
            tmp,
            qv,
            k=10,
            n_probe=R._IVF_PROBE,
            rerank=R._PQ_RERANK,
            m_sub=m_sub,
            n_codes=n_codes,
            exclude_id=0,
        ).localCheckpoint(eager=True)
    finally:
        _sh.rmtree(tmp, ignore_errors=True)


def _old_cluster_prune(spark, sf_dir):
    """Pre-r13 cluster_prune: edges distinct retained (redundant for the
    distinct-by-construction LSH pair list)."""
    from pyspark.sql import functions as F

    from etl_gamma_spark.operators.dedup import (
        cluster_prune,
        minhash_lsh_pairs,
        neardup_clusters,
    )

    docs = spark.table("documents")
    pairs = minhash_lsh_pairs(docs).filter(F.col("est_jaccard") >= 0.5)
    return cluster_prune(
        docs, neardup_clusters(docs, pairs, assume_distinct_pairs=False)
    )


def _old_ivf_topk_eager(spark, sf_dir):
    """embedding_ivf_topk with the eager checkpointed _ivf_index (the
    pre-r13 carrier shape)."""
    from etl_gamma_spark import registry as R
    from etl_gamma_spark.operators.similarity import ivf_topk

    return ivf_topk(
        spark.table("embeddings"),
        query_id=0,
        k=10,
        n_probe=R._IVF_PROBE,
        index=R._ivf_index(spark),
    )


ARMS = {
    "old:incremental_neardup": _old_incremental_neardup,
    "old:embedding_ivf_topk": _old_ivf_topk_eager,
    "old:embedding_pq_topk": _old_pq_topk,
    "old:embedding_ivfpq_topk": _old_ivfpq_topk,
    "old:embedding_ivfpq_persisted": _old_ivfpq_persisted,
    "old:cluster_prune": _old_cluster_prune,
    "old:ivf_recall_sweep": _old_ivf_recall_sweep,
    "pr:old": _pagerank_variant(fold=False, ckpt_nodes=True, ckpt_e=True),
    "pr:fold": _pagerank_variant(fold=True, ckpt_nodes=True, ckpt_e=True),
    "pr:fold_nonodes": _pagerank_variant(
        fold=True, ckpt_nodes=False, ckpt_e=True
    ),
    "pr:fold_minckpt": _pagerank_variant(
        fold=True, ckpt_nodes=False, ckpt_e=False
    ),
}


def _arm(name):
    if name.startswith("cur:"):
        return _cur(name[4:])
    return ARMS[name]


def main() -> None:
    tag = sys.argv[1]
    a_name, b_name = sys.argv[2], sys.argv[3]
    runs = int(sys.argv[4]) if len(sys.argv) > 4 else 3
    a, b = _arm(a_name), _arm(b_name)
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        tag,
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("etl-gamma-ab")
    # model views / base tables registered by any carrier run; warm up with
    # the flagship like bench.py so JIT/session startup is excluded
    QUERIES["receita_farmer_m_passado"](spark, SF_DIR).write.mode(
        "overwrite"
    ).format("noop").save()
    lines = [f"ab {a_name} vs {b_name} sf={SF_DIR} runs/arm={runs}",
             f"loadavg_start={os.getloadavg()}"]
    times: dict[str, list[float]] = {a_name: [], b_name: []}
    for i in range(runs):
        for name, fn in ((a_name, a), (b_name, b)):
            t0 = time.monotonic()
            fn(spark, SF_DIR).write.mode("overwrite").format("noop").save()
            dt = round(time.monotonic() - t0, 3)
            times[name].append(dt)
            lines.append(f"run{i} {name}: {dt} loadavg={os.getloadavg()[0]:.2f}")
    for name in (a_name, b_name):
        lines.append(f"{name}: runs={times[name]} min={min(times[name])}")
    lines.append(f"loadavg_end={os.getloadavg()}")
    text = "\n".join(lines) + "\n"
    fn_safe = f"ab_{a_name}_vs_{b_name}".replace(":", "_").replace("/", "_")
    with open(os.path.join(out_dir, fn_safe + ".txt"), "w") as f:
        f.write(text)
    print(text)
    spark.stop()


if __name__ == "__main__":
    main()
