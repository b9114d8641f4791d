#!/usr/bin/env python3
"""Scale probe: replicate the sf0.1 FACT tables N× (dims unchanged) and
time the heavy plans at 1× vs N× on the same session — the local
evidence behind the "would this survive a 100× scale-up" question.

Replication preserves join structure instead of blowing it up:
  * lineitem/orders copies shift their orderkeys (same custkeys → the
    customer join fans out N×, like N months of history would);
  * events copies shift event_id, keep user_id (sessions get longer);
  * documents copies shift doc_id and append a per-copy suffix token so
    copies are NEAR-duplicates, not exact ones (pair generators see a
    realistic duplicate-heavy corpus, not a degenerate one — the skew
    caps are exercised, not bypassed);
  * embeddings copies shift vec_id and nudge the first component per
    copy (keeps cosine near-dup candidate counts linear in N).

Timings are min-of-``--reps`` (default 2) to damp shared-host noise;
load averages are printed alongside. Usage:

    python tools/scale_probe.py [--copies 10] [--reps 2] [--out /tmp/scale10]
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

DIM_TABLES = ["region", "nation", "supplier", "part"]
PROBE_QUERIES = [
    "receita_farmer_m_passado",
    "receita_produto_f_m_passado",
    "fechamento_m_passado",
    "responsibility_filter",
    "receita_cliente",
    "chunk_dedup",
    "minhash_lsh_pairs",
    "tfidf_top_terms",
    "embedding_lsh_topk",
    "cdc_merge",
    "token_histogram",
    "user_sessions",
    # round-5 batch-4 fact-table operators
    "range_tier_join",
    "hll_distinct",
    "cms_topk",
    "pagerank_bipartite",
    "supplier_window_overlaps",
    "iqr_outliers",
    # round-6 (VERDICT r5 item 6): the round-5 heavy ops. The graph ops
    # read lineitem — replication shifts orderkeys but keeps the
    # (partkey, suppkey) pairs, so the distinct-pair graph is constant
    # while the rows feeding the DISTINCT grow Nx (the "N more months of
    # history" scenario). fuzzy_name_pairs reads customer, which IS now
    # replicated (keys shifted, names tagged with pairwise-distance-2
    # suffixes so no cross-copy pairs appear and true pairs grow
    # linearly, never quadratically).
    "supplier_triangles",
    "also_bought_topk",
    "fuzzy_name_pairs",
    "embedding_neardup_pairs",
    # round-6 second batch. semdedup_prune's carrier keeps n_centroids
    # fixed at 16, so a 10x corpus grows within-cluster pairs ~100x — by
    # design the knob is n_centroids ∝ corpus (docstring); its ratio here
    # documents the fixed-K cost, it is not a regression signal.
    "bm25_topk",
    "lm_bigram_nll",
    "semdedup_prune",
    "quality_classifier_score",
    "bloom_filtered_revenue",
    "zorder_layout",
    "hdr_value_percentiles",
    "split_leakage_pairs",
    "incremental_neardup",
    # round-6 third batch: compressed-domain ANN (rerank pool fixed, so
    # the candidate stage is the part that scales) and the URL ops
    # (narrow projections + one hash agg — expect ~linear).
    "embedding_sq8_topk",
    # round-12: the PQ/ADC sibling — codebook and LUT are corpus-size-
    # independent (32x8 entries), so the scaling parts are the one-pass
    # assignment (N x m_sub argmin rows) and the integer ADC aggregate
    "embedding_pq_topk",
    # the IVF-PQ composition: the ADC aggregate shrinks to the probed
    # cells (~N*n_probe/K rows); the linear parts are the two one-pass
    # assignments (cells + PQ codes) — both written indexes at scale
    "embedding_ivfpq_topk",
    # the written-index serving path: cost = the index WRITE (two
    # partitioned tables, linear) + a probe whose both scans prune to
    # the probed cells
    "embedding_ivfpq_persisted",
    "url_dedup",
    "domain_mix",
    # round-6 fourth batch (minhash_lsh_pairs above already covers the
    # rewritten explode+agg MinHash path): the CMS join-size estimator
    # (two corpus scans into fixed 1024-cell sketches + the exact
    # calibration aggregate), mode (two reducible aggs over replicated
    # events), the OLS trend (two tiny aggs over a monthly rollup), and
    # the shared-histogram BPE train+encode (vocabulary-sized loop; the
    # corpus pass is the only part that should scale).
    "orders_events_join_size",
    "user_mode_event_type",
    "revenue_trend_by_priority",
    "bpe_token_histogram",
    # batch-5: interval coalesce (per-supplier islands over 10x rows),
    # transition matrix (per-user LAG over longer streams), and the two
    # canonical TPC-H showcases (scan-bound aggregate; selective-join
    # top-k whose output is fixed at 10 rows)
    "supplier_shipping_coverage",
    "event_type_transitions",
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    # round-7: the pure scan-predicate aggregate (expect ~linear in the
    # lineitem scan) and the RRF fusion (both legs' corpus passes scale;
    # the fusion itself runs on two bounded top-20 lists)
    "tpch_q6_forecast_revenue",
    "rrf_fusion",
    # the Q18 pre-join reduction (per-order sums before any join; output
    # pinned at 100 rows) and the DSIR two-pass count/probe pipeline
    # (bounded 4096-bucket model state regardless of corpus size)
    "tpch_q18_large_volume",
    "dsir_weights",
    # round-8: exact substring dedup. The replicated corpus is the
    # adversarial case — every document gains ~copies near-copies whose
    # shared spans all exceed k, so reported span rows grow ~copies² per
    # base doc (output growth, not plan growth; the df-cap bounds any
    # single gram's fan-out). substring_dedup adds the covered-position
    # explode + reassembly on top.
    "substring_dup_spans",
    "substring_dedup",
    # cross-corpus variant: bench side is a fixed 1/23 slice, so its
    # posting list grows linearly and the join fan-out stays
    # max_df x bench-df per gram
    "decontamination_spans",
    # ingest path: batch is a fixed 1/17 slice probing the corpus index
    "incremental_substring_spans",
    # round-9: the decontamination ACT step (span search + covered-token
    # explode bounded by contaminated mass + doc-keyed reassembly), the
    # full index-maintenance loop (build + append + compact + probe — the
    # only PROBE query that writes), and the stored-quantizer SemDeDup
    # (fixed K=16 quantizer read back from parquet, so within-cell pairs
    # grow like the pinned-K semdedup row)
    "decontaminate_corpus",
    "substring_index_maintain",
    "semdedup_persisted",
    # intra-document repeats: replication multiplies DOCUMENTS, not
    # within-doc repetition (each copy carries the same internal repeats,
    # and the per-copy suffix token adds none), so spans and strip work
    # should both grow ~linearly — the posting self-join never crosses
    # documents
    "intradoc_repeat_spans",
    "intradoc_repeat_strip",
    # content-defined chunk dedup: replica copies are near-duplicates
    # whose shared chunks all collapse onto the base copy — removed mass
    # grows with the duplicate mass while the cut scan stays linear
    "content_chunk_dedup",
    # ingest path: batch is a fixed 1/17 slice anti-joined on chunk
    # fingerprints against the 10x corpus index
    "incremental_chunk_dedup",
    # round-10 (VERDICT r9 item 4): the iterative family. The replicated
    # corpus is CC's adversarial case — each base doc's ~copies
    # near-copies band together, so components grow from pairs to
    # ~copies-sized clusters; min-label propagation converges in
    # O(cluster diameter) rounds, and banded pairs make clusters dense
    # (near-star), so rounds should stay small while per-round work
    # grows with the edge mass. Round counts come from the stats
    # out-param (neardup_clusters) — see tools/iter_probe.py.
    "neardup_clusters",
    "cluster_prune",
    "bpe_merges",
    # the MinHash index maintenance loop (build + append + compact +
    # probe — the banded sibling of substring_index_maintain) and the
    # fixed-merge-table BPE encode (vocabulary-sized fixpoint; the
    # corpus pass is the only part that should scale)
    "minhash_index_maintain",
    "bpe_encode_fixed",
    # directed containment: at 100 copies every shingle's df exceeds the
    # max_df=50 cap, so the guard withdraws the pair machinery from the
    # all-duplicates regime (like substring_dup_spans) and the measured
    # wall is the linear shingle/size passes. At 10 copies the cap does
    # NOT saturate (df ≈ 10-20 per replicated shingle < 50), so the 10x
    # row exercises the directed pair join itself — measure it there
    # (VERDICT r10 item 3).
    "ngram_containment_pairs",
    # round-11 (VERDICT r10 item 5): the two CC-composition reports —
    # narrow aggregates over neardup_clusters' output, so their 100x
    # cost is the shared CC upstream plus one groupBy each; the
    # histogram at 100x is the operator's actual use-case (reading the
    # duplicate-mass spectrum of a duplicate-heavy corpus)
    "dedup_cluster_histogram",
    "cluster_aware_split",
    # round-11 additions: DSIR selection (bounded-model pipeline + a
    # TakeOrdered — expect the dsir_weights curve), priority sampling
    # (one narrow projection + per-group top-k window over 5 scalar
    # columns), and the lang x quality crosstab (one hash agg to a
    # bounded frame)
    "dsir_select",
    "priority_sample",
    "lang_quality_mix",
    # wave 2/3: the ANN tuning curve (4 probes + 1 brute leg over the
    # replicated vectors), per-language fertility (one bounded agg), and
    # the IVF maintenance loop (write/append/compact/probe — two disk
    # round-trips by design, the minhash_index_maintain shape)
    "ivf_recall_sweep",
    "tokenizer_fertility",
    "ivf_index_maintain",
    # wave 4: estimator calibration — the banded candidate set feeds an
    # exact-intersection join bounded by pairs x shingles-per-doc, so
    # cost tracks the (capped) pair mass like minhash_lsh_pairs
    "minhash_jaccard_calibration",
    # round-12 batch 2: token-budget mixture plan (one scan → 10-row
    # report), PMI collocations (explode + vocabulary-scale aggregates;
    # replica suffix tokens add ~one new bigram type per copy, so the
    # surviving report stays near-constant while the count pass grows
    # linearly), and hard-negative mining (20 broadcast anchors × the
    # replicated corpus — linear in N, vectors never shuffle)
    "mixture_token_plan",
    "collocations_pmi",
    "hard_negative_mining",
    # the two observability reports: one window + one reducible agg
    # (packing), and one assignment pass + K-row report (cell balance)
    "packing_efficiency",
    "ivf_cell_balance",
    # batch 4: the coverage curve (unigram agg → bounded class frame) and
    # the classifier sweep (inference cost + a 5-row broadcast reduce)
    "vocab_coverage",
    "classifier_threshold_sweep",
    # batch 5: the duplicated-chunk measurement — on the near-dup replica
    # most replica chunks ARE corpus-duplicated, so dup counts grow with
    # the duplicate mass while the two chunk-keyed aggregates stay linear
    "boilerplate_share",
]


def replicate(spark, out_dir: str, copies: int) -> None:
    from pyspark.sql import functions as F

    os.makedirs(out_dir, exist_ok=True)
    for t in DIM_TABLES:
        shutil.copy(
            os.path.join(BASE, f"{t}.parquet"), os.path.join(out_dir, f"{t}.parquet")
        )

    def write(df, name):
        # single file like the fixtures so io.spread()'s behavior matches
        df.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(out_dir, f"_{name}")
        )
        part = [
            f
            for f in os.listdir(os.path.join(out_dir, f"_{name}"))
            if f.endswith(".parquet")
        ][0]
        shutil.move(
            os.path.join(out_dir, f"_{name}", part),
            os.path.join(out_dir, f"{name}.parquet"),
        )
        shutil.rmtree(os.path.join(out_dir, f"_{name}"))

    def stacked(name, mutate):
        base = spark.read.parquet(os.path.join(BASE, f"{name}.parquet"))
        parts = [mutate(base, i) for i in range(copies)]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    shift = 1_000_000_000
    write(
        stacked("orders", lambda df, i: df.withColumn(
            "o_orderkey", df.o_orderkey + F.lit(i * shift))),
        "orders",
    )
    write(
        stacked("lineitem", lambda df, i: df.withColumn(
            "l_orderkey", df.l_orderkey + F.lit(i * shift))),
        "lineitem",
    )
    write(
        stacked("events", lambda df, i: df.withColumn(
            "event_id", df.event_id + F.lit(i * shift))),
        "events",
    )
    write(
        stacked("documents", lambda df, i: df
                .withColumn("doc_id", df.doc_id + F.lit(i * shift))
                .withColumn("text", F.concat(df.text, F.lit(f" copytag{i}")))),
        "documents",
    )
    write(
        stacked("customer", lambda df, i: df
                .withColumn("c_custkey", df.c_custkey + F.lit(i * shift))
                # pairwise tag distance 2 ("x00" vs "x11"): no cross-copy
                # pairs at lev<=1, so fuzzy pair counts grow linearly
                .withColumn("c_name", F.concat(df.c_name, F.lit(f" x{i}{i}")))),
        "customer",
    )
    write(
        stacked("embeddings", lambda df, i: df
                .withColumn("vec_id", df.vec_id + F.lit(i * shift))
                .withColumn(
                    "embedding",
                    F.expr(
                        f"transform(embedding, (x, j) -> CASE WHEN j = 0 "
                        f"THEN x + CAST({i} AS FLOAT) * CAST(0.001 AS FLOAT) "
                        f"ELSE x END)"
                    ),
                )),
        "embeddings",
    )


def time_queries(
    spark, sf_dir: str, reps: int, names: list[str] | None = None
) -> dict[str, float]:
    from etl_gamma_spark.registry import QUERIES, _REGISTERED

    _REGISTERED.pop(spark, None)  # force re-registration for this dir
    out = {}
    for name in (names if names is not None else PROBE_QUERIES):
        best = None
        for _ in range(reps):
            t0 = time.monotonic()
            QUERIES[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
            dt_ = time.monotonic() - t0
            best = dt_ if best is None else min(best, dt_)
        out[name] = round(best, 2)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--copies", type=int, default=10)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--out", default="/tmp/scale_probe")
    ap.add_argument("--skip-build", action="store_true")
    ap.add_argument(
        "--queries",
        default=None,
        help="comma-separated subset of PROBE_QUERIES to time",
    )
    args = ap.parse_args()
    names = args.queries.split(",") if args.queries else PROBE_QUERIES
    from etl_gamma_spark.registry import QUERIES as _ALL

    unknown = sorted(set(names) - set(_ALL))
    if unknown:  # fail fast, BEFORE the expensive replica build
        ap.error(f"unknown queries: {', '.join(unknown)}")

    from etl_gamma_spark.session import get_spark

    spark = get_spark("scale-probe")
    if not args.skip_build:
        print(f"building {args.copies}x replica at {args.out} ...", flush=True)
        replicate(spark, args.out, args.copies)

    print("load", os.getloadavg(), flush=True)
    base = time_queries(spark, BASE, args.reps, names)
    print("load", os.getloadavg(), flush=True)
    scaled = time_queries(spark, args.out, args.reps, names)
    print("load", os.getloadavg(), flush=True)

    print(f"\n{'query':32s} {'1x':>7s} {args.copies:>5d}x  ratio")
    for name in names:
        r = scaled[name] / base[name] if base[name] else float("nan")
        print(f"{name:32s} {base[name]:7.2f} {scaled[name]:6.2f}  {r:4.1f}x")
    spark.stop()


if __name__ == "__main__":
    main()
