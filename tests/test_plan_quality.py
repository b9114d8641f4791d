"""Physical-plan regression tests: the optimizations SURVEY.md §4 relies on
must stay visible in explain output — filter pushdown to the parquet scan,
broadcast joins for dimensions (no sort-merge for dim joins), and a single
shuffle for the flagship aggregate.
"""

from pyspark.sql import DataFrame

from etl_gamma_spark.registry import QUERIES
from tests.conftest import SF_CORRECT


def _explain(df: DataFrame) -> str:
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def _non_cap_broadcast_hints(analyzed: str) -> list[str]:
    """ResolvedHint occurrences in an analyzed-plan string whose immediate
    subtree is NOT cap_hot_keys' over-limit key list (recognizable by its
    ``__hot_`` aliases). That hint is the one legitimate forced broadcast
    in pair-generator plans: its build side holds at most rows/limit keys
    by construction. Any other hint on a per-doc/per-vector O(N) frame is
    an OOM at corpus scale."""
    lines = analyzed.splitlines()
    bad = []
    for i, line in enumerate(lines):
        if "ResolvedHint" not in line:
            continue
        window = "\n".join(lines[i + 1 : i + 4])
        if "__hot_" not in window:
            bad.append(line.strip())
    return bad


def test_flagship_pushdown_and_broadcast(spark):
    plan = _explain(QUERIES["receita_farmer_m_passado"](spark, SF_CORRECT))
    # month-window predicate reaches the lineitem scan
    assert "GreaterThanOrEqual(l_shipdate" in plan
    # column pruning: money columns read, no l_comment-ish waste
    assert "l_extendedprice" in plan and "l_quantity" not in plan
    # dims broadcast; fact never shuffled for the joins
    assert plan.count("BroadcastHashJoin") >= 4
    assert "SortMergeJoin" not in plan
    # exactly one real shuffle: the final partial→final hash aggregate
    n_shuffles = plan.count("+- Exchange") + plan.count(":- Exchange")
    assert n_shuffles == 1, f"expected 1 shuffle exchange, plan:\n{plan}"


def test_responsibility_filter_uses_equi_join(spark):
    # the interval semi-join keeps client_id as an equi key → broadcast
    # HASH join with range post-filters, never a nested-loop over the fact
    plan = _explain(QUERIES["responsibility_filter"](spark, SF_CORRECT))
    assert "BroadcastHashJoin" in plan
    assert "LeftSemi" in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_minhash_signatures_one_combined_exchange(spark):
    # explode + aggregate shape (the per-row lambda form was 16
    # interpreted transform() passes — the dominant term of the LSH
    # query): exactly ONE key exchange, on doc_id, and it must carry
    # map-side-combined partials (partial+final HashAggregate pair), so
    # only |docs| x K longs per partition cross the wire. No range sort,
    # no interpreted higher-order functions anywhere in the plan.
    plan = _explain(QUERIES["minhash_signatures"](spark, SF_CORRECT))
    assert plan.count("hashpartitioning") == 1
    assert "rangepartitioning" not in plan
    assert plan.count("HashAggregate") == 2 * 2  # partial+final, tree+details
    # the old form's marker: 16 array_min(transform(...)) lambdas. The one
    # remaining transform( is the shingle builder (once per word array).
    assert "array_min" not in plan
    assert plan.count("transform(") <= 2


def test_fechamento_all_dim_joins_broadcast(spark):
    plan = _explain(QUERIES["fechamento_m_presente"](spark, SF_CORRECT))
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 5


def test_asof_join_single_shuffle_per_side(spark):
    # the union+window formulation must shuffle once on the key — no
    # per-row subqueries, no nested loops
    plan = _explain(QUERIES["asof_join_purchases"](spark, SF_CORRECT))
    assert "BroadcastNestedLoopJoin" not in plan
    n_shuffles = plan.count("+- Exchange") + plan.count(":- Exchange")
    assert n_shuffles <= 2, plan


def test_pair_ops_never_force_broadcast_of_per_doc_frames(spark):
    # ngram_jaccard re-attaches per-doc shingle counts and
    # embedding_neardup re-attaches the full vector corpus — both are
    # O(N) tables. A broadcast() HINT there forces an OOM at corpus scale;
    # without the hint Catalyst/AQE broadcasts only when the runtime size
    # is actually small (fine). Assert no hint beyond cap_hot_keys'
    # tiny over-limit key list survives in the analyzed plan, and
    # candidate generation stays an equi-join (no BNLJ).
    for name in [
        "ngram_jaccard_pairs",
        "ngram_containment_pairs",
        "embedding_neardup_pairs",
    ]:
        df = QUERIES[name](spark, SF_CORRECT)
        analyzed = df._jdf.queryExecution().analyzed().toString()
        assert not _non_cap_broadcast_hints(analyzed), (
            f"{name}: forced broadcast hint on a per-doc/per-vector frame"
        )
        assert "BroadcastNestedLoopJoin" not in _explain(df), name


def test_partitioned_output_prunes_partitions(spark, tmp_path):
    # month-partitioned sink output must serve month-filtered reads from
    # matching partitions only (PartitionFilters at the scan)
    from etl_gamma_spark.sources.sink import write_full_refresh

    df = QUERIES["receita_farmer_m_passado"](spark, SF_CORRECT)
    path = str(tmp_path / "t")
    write_full_refresh(df, path, ["mes"])
    scan = spark.read.parquet(path).filter("mes = DATE '2001-01-01'")
    plan = _explain(scan)
    assert "PartitionFilters: [isnotnull(mes" in plan.replace("#", "").replace(
        "mes)", "mes"
    ) or "PartitionFilters" in plan and "2001-01-01" in plan, plan
    # and the filter is NOT a post-scan row filter on the data column
    assert scan.count() > 0


def test_lsh_topk_query_side_pushed_to_scan(spark):
    # lsh_topk references the bucketed corpus twice (query row + corpus).
    # The query side's `vec_id = <id>` predicate must reach its parquet
    # scan, so the expensive bucket projection evaluates over the corpus
    # ONCE plus a single pruned row — never over the corpus twice.
    plan = _explain(QUERIES["embedding_lsh_topk"](spark, SF_CORRECT))
    scan_meta = [
        line.strip() for line in plan.splitlines() if "PushedFilters" in line
    ]
    assert any("EqualTo(vec_id,0)" in line for line in scan_meta), (
        f"query-side equality not pushed; PushedFilters lines: {scan_meta}"
    )
    assert "BroadcastNestedLoopJoin" not in plan


def test_similarity_scoring_stages_keep_codegen(spark):
    # broadcast query/centroid attachment goes through bcast_attach
    # (constant-key BroadcastHashJoin) — a BNLJ would disable whole-stage
    # codegen for the unrolled scoring arithmetic, the hottest stage of
    # every similarity query.
    for name in [
        "embedding_topk",
        "embedding_knn_join",
        "embedding_lsh_topk",
        "embedding_ivf_topk",
    ]:
        plan = _explain(QUERIES[name](spark, SF_CORRECT))
        assert "BroadcastNestedLoopJoin" not in plan, name
        assert "BroadcastHashJoin" in plan, name


def test_pair_generators_bounded_on_duplicate_heavy_corpus(spark):
    # The adversarial corpus dedup exists for: 10k copies of one
    # boilerplate document. Without the skew caps every band bucket /
    # shingle posting list holds all 10k docs and candidate generation
    # emits ~n²/2 ≈ 50M pairs through ONE join key. With the caps
    # (max_bucket / max_df) those keys are dropped before the self-join,
    # so candidate output stays O(n·cap) — here exactly 0, because every
    # key is over-cap. (The cluster itself is exact-dedup's job: all
    # copies share one md5 fingerprint.)
    from etl_gamma_spark.operators.dedup import (
        exact_dedup_groups,
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
        simhash_neardup_pairs,
    )
    from etl_gamma_spark.operators.quality import contamination_pairs

    n = 10_000
    docs = spark.range(n).selectExpr(
        "id AS doc_id",
        "'the same boilerplate header text appears on every page of this"
        " corpus dump over and over' AS text",
    )
    assert minhash_lsh_pairs(docs).count() == 0
    assert simhash_neardup_pairs(docs).count() == 0
    assert ngram_jaccard_pairs(docs).count() == 0
    assert contamination_pairs(docs).count() == 0
    # the duplicate mass is still fully visible to exact dedup
    [grp] = exact_dedup_groups(docs).collect()
    assert grp.n_docs == n and grp.keeper == 0

    # and a duplicate cluster BELOW the caps still pairs up completely:
    # the caps remove degenerate keys, not legitimate near-dup signal
    small = spark.range(20).selectExpr(
        "id AS doc_id",
        "'a perfectly ordinary duplicated paragraph of words' AS text",
    )
    assert minhash_lsh_pairs(small).count() == 20 * 19 // 2


def test_pair_candidate_joins_degrade_to_shuffle_not_broadcast(spark):
    # AQE skew-join canary: at corpus scale no side of a candidate
    # self-join fits in a broadcast. Simulate that by forbidding
    # broadcast (threshold -1) and assert every capped pair op plans its
    # joins as shuffle joins (sort-merge / shuffled-hash) — which AQE's
    # skew-join splitter can then subdivide — never a nested loop and
    # never a forced broadcast that would OOM at 100×. The ONE broadcast
    # that may survive the -1 threshold is cap_hot_keys' LeftAnti probe:
    # its build side is the over-limit key list, tiny by construction
    # (at most rows/limit keys), and hinting it broadcast is the point.
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    assert spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        for name in [
            "minhash_lsh_pairs",
            "simhash_neardup_pairs",
            "ngram_jaccard_pairs",
            "contamination_pairs",
        ]:
            plan = _explain(QUERIES[name](spark, SF_CORRECT))
            assert "BroadcastNestedLoopJoin" not in plan, name
            # every BroadcastHashJoin appears twice in formatted explain
            # (tree line carries the join type, details line does not):
            # require every one to be the hot-key-cap LeftAnti
            n_bhj = plan.count("BroadcastHashJoin")
            n_anti = plan.count("BroadcastHashJoin LeftAnti")
            assert n_bhj == 2 * n_anti, (
                f"{name}: non-anti forced broadcast survives a -1 threshold"
            )
            assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, name
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_embedding_neardup_candidate_stage_is_banded(spark):
    # candidate generation must equi-join on (band, probed fragment) keys
    # — the banded shape that scales with code width — and carry an exact
    # code-Hamming verify (bit_count on the xor) BEFORE vectors attach
    plan = _explain(QUERIES["embedding_neardup_pairs"](spark, SF_CORRECT))
    assert "__band" in plan and "__bkey" in plan, "banded join keys missing"
    assert "bit_count" in plan, "exact Hamming verify missing"
    assert "BroadcastNestedLoopJoin" not in plan


def test_quality_ops_plan_shape(spark):
    # per-doc aggregate frames join back on doc_id WITHOUT a forced
    # broadcast hint (O(N) tables — AQE may broadcast at small SF, a real
    # cluster shuffle-joins); candidate generation stays hash-equi
    for name in ["gopher_repetition", "contamination_pairs"]:
        df = QUERIES[name](spark, SF_CORRECT)
        analyzed = df._jdf.queryExecution().analyzed().toString()
        assert not _non_cap_broadcast_hints(analyzed), name
        plan = _explain(df)
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_no_cross_join_anywhere_in_package():
    """crossJoin(broadcast(1-row)) plans as BroadcastNestedLoopJoin and
    disables whole-stage codegen for the entire probe stage (CLAUDE.md).
    similarity.bcast_attach exists precisely to replace it; this source
    scan keeps the "no BNLJ" invariant grep-enforceable."""
    import pathlib

    pkg = pathlib.Path(__file__).resolve().parents[1] / "etl_gamma_spark"
    offenders = [
        str(p)
        for p in pkg.rglob("*.py")
        for line in p.read_text().splitlines()
        if ".crossJoin(" in line
    ]
    assert offenders == [], offenders


def test_round5_curation_plan_shapes(spark):
    # cluster_prune: representative via reducible agg, never a window over
    # the cluster partition (one giant cluster would serialize a window);
    # token_histogram: top-k via TakeOrderedAndProject, never a global sort;
    # source_balance: thresholds (#sources rows) broadcast, kept set unshuffled
    plan = _explain(QUERIES["cluster_prune"](spark, SF_CORRECT))
    assert "Window" not in plan
    plan = _explain(QUERIES["token_histogram"](spark, SF_CORRECT))
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan
    plan = _explain(QUERIES["source_balance"](spark, SF_CORRECT))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_round5_batch2_plan_shapes(spark):
    # chunk_dedup: exactly the two data shuffles the algorithm needs (by
    # chunk for keep-first, by doc_id for reassembly) plus the totals join;
    # never a nested-loop join, never a global sort
    plan = _explain(QUERIES["chunk_dedup"](spark, SF_CORRECT))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Exchange rangepartitioning" not in plan
    n_shuffles = plan.count("+- Exchange") + plan.count(":- Exchange")
    assert n_shuffles <= 5, f"chunk_dedup shuffle count grew: {n_shuffles}\n{plan}"

    # cdc_merge: the merge itself is ONE join keyed by the merge key; the
    # change-set derivation adds its own agg exchange, nothing quadratic
    plan = _explain(QUERIES["cdc_merge"](spark, SF_CORRECT))
    assert "BroadcastNestedLoopJoin" not in plan

    # tfidf: the df side is vocabulary-scale -- candidate join must be able
    # to degrade to a shuffle join at corpus scale, so no FORCED broadcast
    # hint anywhere (AQE may still pick broadcast at tiny SF, that's fine)
    from etl_gamma_spark.operators.quality import tfidf_top_terms

    docs = spark.read.parquet(f"{SF_CORRECT}/documents.parquet")
    logical = str(tfidf_top_terms(docs)._jdf.queryExecution().logical())
    assert "UnresolvedHint" not in logical and "hint" not in logical.lower()

    # funnel: every stage join is an equi-join on the entity key
    plan = _explain(QUERIES["funnel_steps"](spark, SF_CORRECT))
    assert "BroadcastNestedLoopJoin" not in plan


def test_round5_batch3_plan_shapes(spark):
    # gap_fill: grid explode + one left join + one window, no nested loop,
    # no global sort
    plan = _explain(QUERIES["receita_gap_fill"](spark, SF_CORRECT))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "explode(sequence(" in plan

    # retention: both aggregates + the join are entity-keyed
    plan = _explain(QUERIES["retention_cohorts"](spark, SF_CORRECT))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Exchange rangepartitioning" not in plan


def test_quality_prune_and_source_mix_plan_shapes(spark):
    # both ops attach their per-stratum thresholds by BROADCAST and filter
    # scan-local — the kept set must never shuffle, and nothing nested-loops
    for name in ("quality_prune", "source_mix"):
        plan = _explain(QUERIES[name](spark, SF_CORRECT))
        assert "BroadcastNestedLoopJoin" not in plan, name
        assert "BroadcastHashJoin" in plan, name


def test_round5_batch4_plan_shapes(spark):
    # range join: the whole point is turning the BETWEEN predicate into a
    # bin equi-join — the naive form would be a BroadcastNestedLoopJoin
    plan = _explain(QUERIES["range_tier_join"](spark, SF_CORRECT))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "explode(sequence(" in plan  # interval bin explosion

    # pagerank: per-iteration rank joins and dst aggregations are hash
    # shuffles, never nested loops; no global sort anywhere
    plan = _explain(QUERIES["pagerank_bipartite"](spark, SF_CORRECT))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Exchange rangepartitioning" not in plan

    # hll sketch: registers come from hash aggregation (reducible MAX),
    # never a per-group window pass
    plan = _explain(QUERIES["hll_distinct"](spark, SF_CORRECT))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Window" not in plan

    # profile: independent pruned single-column aggregate per column —
    # never the wide SortAggregate Expand form (measured 3-4x slower),
    # and no joins
    plan = _explain(QUERIES["profile_orders"](spark, SF_CORRECT))
    assert "Expand" not in plan
    assert "Join" not in plan
    # one pruned scan per column (Location: appears once per scan detail)
    assert plan.count("Location: InMemoryFileIndex") == 5


def test_fuzzy_pairs_candidate_join_degrades_to_shuffle(spark):
    # same AQE skew-join canary as the other pair generators: with
    # broadcast forbidden the variant self-join must plan as a shuffle
    # join (skew-splittable), never a nested loop / forced broadcast
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _explain(QUERIES["fuzzy_name_pairs"](spark, SF_CORRECT))
        assert "BroadcastNestedLoopJoin" not in plan
        assert "BroadcastHashJoin" not in plan
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_round5_batch5_plan_shapes(spark):
    # interval overlap: bin-exploded equi-join with residual — no nested loop
    plan = _explain(QUERIES["supplier_window_overlaps"](spark, SF_CORRECT))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "explode(sequence(" in plan

    # asof_nearest: NO join at all — one exchange on the key feeding the
    # two window passes
    plan = _explain(QUERIES["purchase_nearest_view"](spark, SF_CORRECT))
    assert "Join" not in plan
    assert plan.count("Window") >= 1

    # twap: LEAD window and aggregate share the (entity, bucket) exchange;
    # no join, no nested loop
    plan = _explain(QUERIES["twap_hourly"](spark, SF_CORRECT))
    assert "Join" not in plan

    # sliding chunks: pure expression pipeline — zero exchanges
    plan = _explain(QUERIES["doc_sliding_chunks"](spark, SF_CORRECT))
    assert "Exchange" not in plan and "Join" not in plan

    # triangles: every join is a hash join on edge keys
    plan = _explain(QUERIES["supplier_triangles"](spark, SF_CORRECT))
    assert "BroadcastNestedLoopJoin" not in plan


def test_ivf_persisted_probe_prunes_partitions(spark, tmp_path):
    """The written IVF index (VERDICT r5 item 4): a probe against the
    centroid_id-partitioned table must prune the scan to the n_probe
    probed cells BEFORE opening any file — PartitionFilters in the plan
    and, at the file level, inputFiles drawn only from probed cell
    directories."""
    from etl_gamma_spark.io import load_table
    from etl_gamma_spark.operators.similarity import (
        ivf_topk_persisted,
        ivf_write_index,
        probe_cells,
        seed_centroids,
    )

    emb = load_table(spark, SF_CORRECT, "embeddings")
    base = str(tmp_path / "ivf_index")
    ivf_write_index(emb, seed_centroids(emb, 16), base)

    qv = [float(x) for x in emb.filter("vec_id = 0").select("embedding").head()[0]]
    cells = probe_cells(spark, base, qv, n_probe=4)
    assert len(cells) == 4

    topk = ivf_topk_persisted(spark, base, qv, k=10, n_probe=4, exclude_id=0)
    plan = _explain(topk)
    assert "PartitionFilters" in plan and "centroid_id" in plan

    # the PartitionFilters IN-list is exactly the probed cells (Catalyst
    # applies PartitionFilters at file listing — files in other cell
    # directories are never opened)
    import re as _re

    m = _re.search(r"PartitionFilters: \[centroid_id[^ ]* IN \(([^)]*)\)", plan)
    assert m, f"no centroid_id IN PartitionFilters in plan:\n{plan}"
    assert {int(x) for x in m.group(1).split(",")} == set(cells)

    # and the persisted answer equals the in-memory index's answer
    from etl_gamma_spark.operators.similarity import ivf_build, ivf_topk

    cents = seed_centroids(emb, 16)
    mem = ivf_topk(emb, query_id=0, k=10, n_probe=4, index=(ivf_build(emb, cents), cents))
    got = [(r[0], round(r[1], 12)) for r in topk.collect()]
    want = [(r[0], round(r[1], 12)) for r in mem.collect()]
    assert got == want


def test_centroid_assignment_is_reducible_argmin(spark):
    """_assign_to (round-9 rewrite): the |emb| x K scored frame must
    collapse via a PARTIAL min(struct) aggregate before any exchange —
    never a row_number window, which would shuffle every candidate row
    (with its 64-double vector) into per-vector sort partitions."""
    from etl_gamma_spark.io import load_table
    from etl_gamma_spark.operators.similarity import _assign_to, seed_centroids

    emb = load_table(spark, SF_CORRECT, "embeddings")
    # materialize the 16-row seed frame so the explained plan is the
    # assignment alone (seed selection has its own bounded top-k window)
    cents = seed_centroids(emb, 16).localCheckpoint()
    frame = _assign_to(
        emb.selectExpr("vec_id", "CAST(embedding AS ARRAY<DOUBLE>) AS v"),
        cents,
        64,
        "vec_id",
    )
    plan = _explain(frame)
    assert "Window" not in plan, plan
    assert "partial_min" in plan, plan  # map-side combine proven


def test_bm25_plan_shape(spark):
    """BM25 (round 6): non-query tokens dropped before the tf aggregate,
    stats/idf attach via broadcast hash joins (never BNLJ), scans pruned
    to (doc_id, text)."""
    plan = _explain(QUERIES["bm25_topk"](spark, SF_CORRECT))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan
    # the IN-list filter sits under the (doc, token) aggregate
    assert "token#" in plan and " IN (" in plan
    # column pruning: only doc_id/text leave the documents scan
    import re

    schemas = re.findall(r"ReadSchema: (struct<[^\n]*)", plan)
    assert schemas, plan
    for s in schemas:
        assert "lang" not in s and "url" not in s, s


def test_round6_batch2_plan_shapes(spark):
    """SemDeDup / classifier / bloom / zorder plan posture."""
    # semdedup: pair generation is ONE equi-join on centroid_id over the
    # materialized assignment (no nested loop, no re-assignment per pair
    # — the checkpointed scan appears, not a second ranking window chain)
    plan = _explain(QUERIES["semdedup_prune"](spark, SF_CORRECT))
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("Window") == 0, "assignment must be pre-materialized"

    # classifier: weights table broadcast (n_features rows), vocab join
    # NOT force-broadcast (corpus-scale), no nested loop
    plan = _explain(QUERIES["quality_classifier_score"](spark, SF_CORRECT))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan

    # bloom: the k position filters are broadcast semi-joins ahead of the
    # exact verify; nothing nested-loops, nothing range-shuffles
    from etl_gamma_spark.operators.bloom import BLOOM_K

    plan = _explain(QUERIES["bloom_filtered_revenue"](spark, SF_CORRECT))
    assert "BroadcastNestedLoopJoin" not in plan
    # 4 position prefilters + the exact verify, all broadcast semi joins
    assert plan.count("BroadcastHashJoin LeftSemi") >= BLOOM_K + 1, plan

    # zorder: one scan + the 1-row stats broadcast + one agg — the whole
    # interleave is codegen'd projection arithmetic (no UDF, no window)
    plan = _explain(QUERIES["zorder_layout"](spark, SF_CORRECT))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # two pruned scans of lineitem: the 1-row min/max stats pass and the
    # row pass the stats broadcast onto — nothing else
    assert plan.count("Location: InMemoryFileIndex") == 2, plan


def test_sq8_topk_flat_literal_plan(spark):
    # optimization r12: the whole candidate stage is ONE pruned parquet
    # scan -> literal-range quantize projection -> flat integer d2 ->
    # TakeOrdered. Zero joins, zero checkpoint scans; the only exchange
    # is spread()'s round-robin repartition. The quantize floor( terms
    # are INLINE now (literal range, not an attached 1-row frame), but
    # CollapseProject's duplication guard must keep the 64-term quantize
    # projection separate from the 64-reference d2 consumer — the plan
    # prints the quantize projection ONCE (<=64 FLOOR calls; formatted
    # explain truncates field lists at maxToStringFields=25). A re-inline
    # puts 64 FLOORs inside EVERY d2 term (thousands in the plan text).
    plan = _explain(QUERIES["embedding_sq8_topk"](spark, SF_CORRECT))
    assert 1 <= plan.count("FLOOR") <= 130, plan.count("FLOOR")
    assert "Join" not in plan, plan
    assert "Scan ExistingRDD" not in plan  # no checkpoint barrier jobs
    assert plan.count("TakeOrderedAndProject") == 4  # cut + final, x2
    assert "rangepartitioning" not in plan
    assert plan.count("Location: InMemoryFileIndex") == 1


def test_pq_topk_plan_shape(spark):
    # PQ/ADC search keeps the legacy join-based shape ON PURPOSE
    # (optimization r12): inlining the m_sub x n_codes codebook as
    # literal d2 arrays puts ~2k terms into one WholeStageCodegen stage,
    # Janino's 64 KB method limit kills codegen and the projection runs
    # INTERPRETED (measured 2.7 s -> 8.8 s). The quantizer must stay out
    # of the search stage (the materialized-codes rule — a floor( in the
    # plan means the 64-term quantization re-inlined per consumer);
    # every join is a broadcast hash join; the candidate and final cuts
    # are TakeOrdered, never global sorts. Optimization r13 re-confirmed
    # this by interleaved A/B: the no-checkpoint driver-metadata form
    # that wins for ivfpq_topk (where it shrinks the quantized set) was
    # ~30% SLOWER here, where the full corpus must be quantized anyway
    # and the checkpoint amortizes it across four consumers.
    plan = _explain(QUERIES["embedding_pq_topk"](spark, SF_CORRECT))
    assert "floor(" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    # 4 TakeOrdered ops x 2 (formatted explain prints tree + details):
    # the final top-k, the rerank candidate cut, and the bounded
    # codebook-seed limit once per book consumer (assignment + LUT)
    assert plan.count("TakeOrderedAndProject") == 8
    assert "rangepartitioning" not in plan


def test_mode_per_group_reducible_no_window(spark):
    # keep-first discipline: mode must reduce through partial aggregates
    # (the struct-min final is a SortAggregate — still partial+final, so
    # a hot user combines map-side), never a row_number window
    plan = _explain(QUERIES["user_mode_event_type"](spark, SF_CORRECT))
    assert "Window" not in plan
    assert plan.count("hashpartitioning") == 2
    assert "rangepartitioning" not in plan


def test_group_trend_two_agg_passes_no_window(spark):
    # centering min + sums + closed-form division: aggregates and a
    # broadcast join back — no window partitions, no sorts
    plan = _explain(QUERIES["revenue_trend_by_priority"](spark, SF_CORRECT))
    assert "Window" not in plan
    assert "rangepartitioning" not in plan
    assert "SortMergeJoin" not in plan


def test_tpch_q1_pushdown_single_exchange(spark):
    # the canonical pricing summary: CAST(shipdate AS DATE) <= d must
    # still reach the scan (Catalyst rewrites it to a timestamp range),
    # the scan reads only the 7 referenced columns, and the whole query
    # is one partial+final hash aggregate — a single exchange
    plan = _explain(QUERIES["tpch_q1_pricing_summary"](spark, SF_CORRECT))
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
    assert pushed and "LessThan(l_shipdate" in pushed[0], pushed
    assert "l_orderkey" not in plan  # column pruning held
    assert plan.count("hashpartitioning") == 1
    assert plan.count("HashAggregate") == 4  # partial+final, tree+details


def test_tpch_q3_takeordered_no_global_sort(spark):
    # top-10 must plan as TakeOrderedAndProject (bounded per-partition
    # heaps + one driver merge), never a full range-partitioned sort;
    # the selective BUILDING customer list broadcasts
    plan = _explain(QUERIES["tpch_q3_shipping_priority"](spark, SF_CORRECT))
    assert "TakeOrderedAndProject" in plan
    assert "rangepartitioning" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_enriched_rollup_batch_plan(spark):
    # streaming_dim_enrich's transformation, linted on static tables (the
    # streaming carrier is excluded from the global lint because running
    # it executes the micro-batch job): the dim must broadcast — the
    # stream side never shuffles for the join — and the rollup is one
    # partial+final hash aggregate over bounded (segment, type) keys
    from etl_gamma_spark.io import load_table
    from etl_gamma_spark.streaming.enrich import enriched_segment_rollup

    df = enriched_segment_rollup(
        load_table(spark, SF_CORRECT, "events"),
        load_table(spark, SF_CORRECT, "customer"),
    )
    plan = _explain(df)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("hashpartitioning") == 1
    assert "rangepartitioning" not in plan


def test_tpch_q6_all_predicates_pushed_single_agg(spark):
    # the scan-predicate benchmark: shipdate range, discount band and
    # quantity cap must all reach the parquet scan; the whole query is
    # one partial+final aggregate over a 4-column pruned read
    plan = _explain(QUERIES["tpch_q6_forecast_revenue"](spark, SF_CORRECT))
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
    assert pushed, plan
    line = pushed[0]
    assert "l_shipdate" in line
    assert "GreaterThanOrEqual(l_discount" in line
    assert "LessThanOrEqual(l_discount" in line
    assert "LessThan(l_quantity" in line
    assert "l_orderkey" not in plan  # column pruning held
    assert "rangepartitioning" not in plan
    assert "Join" not in plan


def test_tpch_q5_dims_broadcast_and_date_pushdown(spark):
    # the join-reordering benchmark (newly graded r9): every dimension —
    # and at fixture scale the filtered one-year orders slice — must
    # broadcast (no shuffle join anywhere), and Catalyst must rewrite the
    # CAST(o_orderdate AS DATE) range into a native pushed timestamp
    # range on the orders scan
    plan = _explain(QUERIES["tpch_q5_local_supplier_volume"](spark, SF_CORRECT))
    assert plan.count("BroadcastHashJoin") >= 8  # >=4 joins, each listed twice
    assert "SortMergeJoin" not in plan
    assert "ShuffledHashJoin" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    pushed = [
        l for l in plan.splitlines()
        if "PushedFilters" in l and "o_orderdate" in l
    ]
    assert pushed and "GreaterThanOrEqual(o_orderdate" in pushed[0], plan
    assert "LessThan(o_orderdate" in pushed[0]


def test_dsir_single_probe_scan_and_broadcast(spark):
    # two-pass contract: the count aggregate is checkpointed at build
    # time, so the FINAL plan reads the corpus exactly once (the probe
    # explode) plus the materialized RDD; the bounded log-ratio table
    # must broadcast onto the occurrence stream
    plan = _explain(QUERIES["dsir_weights"](spark, SF_CORRECT))
    assert plan.count("Location: InMemoryFileIndex") == 1, plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "rangepartitioning" not in plan


def test_tpch_q18_reduces_before_joining(spark):
    # the HAVING aggregate must run BEFORE the joins (partial+final on
    # l_orderkey, then the selective frame probes orders/customer as
    # hash joins) and the top-100 must be a TakeOrdered, never a global
    # range sort
    plan = _explain(QUERIES["tpch_q18_large_volume"](spark, SF_CORRECT))
    assert "TakeOrderedAndProject" in plan
    assert "rangepartitioning" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # lineitem scan reads exactly the two aggregate columns
    pruned = [l for l in plan.splitlines() if "ReadSchema" in l and "l_orderkey" in l]
    assert pruned and "l_quantity" in pruned[0] and "l_extendedprice" not in pruned[0]


def test_substring_spans_plan_shape(spark):
    # posting list is checkpointed (the df-cap's two passes must not
    # re-run the split/gram derivation): the FINAL plan reads no parquet
    # at all (both sides scan the materialized RDD); the pair join is a
    # shuffle hash/sort join on the hash key (never a broadcast of the
    # O(corpus) posting frame), and the run-merge window sorts within
    # hash partitions only — no global range sort
    plan = _explain(QUERIES["substring_dup_spans"](spark, SF_CORRECT))
    assert plan.count("Location: InMemoryFileIndex") == 0, plan
    assert "Scan ExistingRDD" in plan
    assert "rangepartitioning" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    from etl_gamma_spark.operators.dedup import substring_dup_spans
    from etl_gamma_spark.io import load_table

    docs = load_table(spark, SF_CORRECT, "documents")
    analyzed = substring_dup_spans(docs)._jdf.queryExecution().analyzed().toString()
    assert not _non_cap_broadcast_hints(analyzed)


def test_intradoc_spans_plan_shape(spark):
    # same contract as the cross-document sibling: the posting list is
    # checkpointed (the per-(doc, gram) cap's two passes must not re-run
    # the split/gram derivation — final plan reads no parquet), the
    # anchor self-join shuffles on (doc, gram) rather than broadcasting
    # the O(corpus) posting frame, and the run-merge window sorts within
    # hash partitions only
    plan = _explain(QUERIES["intradoc_repeat_spans"](spark, SF_CORRECT))
    assert plan.count("Location: InMemoryFileIndex") == 0, plan
    assert "Scan ExistingRDD" in plan
    assert "rangepartitioning" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    from etl_gamma_spark.operators.dedup import intradoc_repeat_spans
    from etl_gamma_spark.io import load_table

    docs = load_table(spark, SF_CORRECT, "documents")
    analyzed = (
        intradoc_repeat_spans(docs)._jdf.queryExecution().analyzed().toString()
    )
    assert not _non_cap_broadcast_hints(analyzed)


def test_priority_sample_plan_shape(spark):
    # the only window runs over the 5-scalar narrow frame (never document
    # text); tau attaches by BroadcastHashJoin; the ranked frame is a
    # materialized RDD (eager checkpoint — two consumers), so the final
    # plan scans no parquet and re-derives nothing
    plan = _explain(QUERIES["priority_sample"](spark, SF_CORRECT))
    assert plan.count("Location: InMemoryFileIndex") == 0, plan
    assert "Scan ExistingRDD" in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_dsir_select_takeordered_no_global_sort(spark):
    # the selection is per-partition heaps (TakeOrdered), never a
    # rangepartitioned global sort materialization
    plan = _explain(QUERIES["dsir_select"](spark, SF_CORRECT))
    assert "TakeOrderedAndProject" in plan
    assert "rangepartitioning" not in plan


def test_lang_quality_mix_single_scan_bounded_agg(spark):
    # the corpus-scanning aggregate is materialized (bounded frame), so
    # the final plan reads NO parquet and the heavy projection cannot
    # run once per consumer; the 1-row total attaches by
    # BroadcastHashJoin (bcast_attach), codegen intact
    plan = _explain(QUERIES["lang_quality_mix"](spark, SF_CORRECT))
    assert plan.count("Location: InMemoryFileIndex") == 0, plan
    assert "Scan ExistingRDD" in plan
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "SortMergeJoin" not in plan
