"""Global plan lint: EVERY registered query's physical plan is screened
for the scale-killer operator classes, not just the hand-picked plans in
test_plan_quality.py — so a future query can't quietly ship a cartesian
product, a BroadcastNestedLoopJoin, a row-at-a-time Python eval, a
global sort, or an unpartitioned window that only shows up at 100x the
fixture size.

Side-effectful carriers (streaming runs, sink writes, JDBC round-trips)
are excluded: calling them executes the side effect, and their plan
posture is covered by their own tests. The exclusion list is explicit so
a NEW side-effectful query must be added here consciously.
"""

import re

import pytest

from etl_gamma_spark.registry import QUERIES
from tests.conftest import SF_CORRECT
from tests.test_plan_quality import _explain

# calling these executes writes / streams / JDBC — plan-linted by their
# dedicated tests instead
SIDE_EFFECTFUL = {
    "media_stats",
    "media_features",
    "media_frame_sample",
    "streaming_monthly_rollup",
    "streaming_dedup_events",
    "streaming_windowed_events",
    "streaming_session_windows",
    "streaming_cdc_apply",
    "streaming_interval_join",
    "streaming_dedup_watermark",
    "embedding_ivf_persisted",
    "embedding_ivfpq_persisted",
    "sink_overwrite_scope",
    "export_shards",
    "schema_evolution",
    "jdbc_roundtrip_agg",
    # runs a streaming job (checkpoint dir + micro-batches) and returns
    # only the memory-sink table scan — the batch-equivalent plan is
    # linted in test_plan_quality.py::test_enriched_rollup_batch_plan
    "streaming_dim_enrich",
}

# TakeOrderedAndProject / per-group bounded sorts are fine; a full
# Exchange rangepartitioning feeding a global Sort is the pattern that
# explodes at scale. These queries are the deliberate exceptions:
# ordered final output (reference semantics) over an already-aggregated
# (bounded) frame.
GLOBAL_SORT_OK = {
    "receita_cliente",  # reference pipeline's ordered 15-col output
    "receita_cliente_presente",
    "boilerplate_chunks",  # post-agg diagnostic top list
}

# BroadcastNestedLoopJoin allowlist — each case is a VALUES/literal-list
# fan-out whose BUILD side is a constant local relation and whose stream
# side is dim-scale or already aggregated, so neither the OOM nor the
# codegen-loss concern applies:
#   fechamento_*          the shared `compensation` model view generates
#                         fixture rows as nation CROSS JOIN (VALUES 7
#                         dates) — shared-verbatim SQL (model.py), so the
#                         bcast_attach rewrite is not available, and the
#                         stream side is the 25-row nation dim
#   revenue_percentiles   3 quantile fractions cross-attached onto the
#                         per-month aggregate (#months rows)
BNLJ_OK = {
    "fechamento_m_presente",
    "fechamento_m_passado",
    "fechamento_periodo",
    "fechamento_by_name",
    "revenue_percentiles",
}


# Unpartitioned windows (WindowExec over a SinglePartition child) move
# EVERYTHING into one task — the round-9 _assign_to finding's cousin.
# Each allowlisted query's windowed frame is bounded by construction:
#   embedding_ivf_topk        seed_centroids relabels a LIMIT-K frame
#                             (<= n_centroids rows)
#   ivf_recall_at_10          same seed_centroids LIMIT-K relabel (the
#                             recall query composes the IVF index)
#   new_users_daily           cumulative sum over the post-agg daily
#                             frame (<= #distinct days)
#   client_revenue_pct_rank   percent_rank over the per-client aggregate
#   client_revenue_quartiles  ntile(4) over the same dim-scale frame
#                             (global total order IS the semantics)
#   rrf_fusion                rank windows over the two top-n_each
#                             (20-row) lists; the lit(0) partition is
#                             constant-folded out of the optimized plan
#   ivf_recall_sweep          the curve variant of ivf_recall_at_10 —
#                             same seed_centroids LIMIT-K relabel, once
#                             per probe width
#   embedding_pq_topk         pq_codebook relabels a LIMIT-n_codes frame
#                             (<= 32 rows) with dense code ids — the PQ
#                             twin of the seed_centroids pattern
#   embedding_ivfpq_topk      composes both bounded relabels above
#                             (seed_centroids LIMIT-K + pq_codebook
#                             LIMIT-n_codes)
UNPARTITIONED_WINDOW_OK = {
    "embedding_pq_topk",
    "embedding_ivfpq_topk",
    "embedding_ivf_topk",
    # same seed_centroids LIMIT-K relabel — visible in the plan since
    # the r13 lazy index (the eager checkpoint used to hide it behind
    # an RDD scan); the returned assignment itself is window-free
    "embedding_ivf_build",
    "ivf_recall_at_10",
    "ivf_recall_sweep",
    # seed_centroids' dense relabel: row_number over the LIMIT-K seed
    # frame (<= 16 rows by construction), same as every IVF carrier here
    "ivf_cell_balance",
    # count-class running sum: the window runs over one row per DISTINCT
    # frequency value (~O(sqrt corpus) under Zipf), never the vocabulary
    "vocab_coverage",
    "new_users_daily",
    "client_revenue_pct_rank",
    "client_revenue_quartiles",
    "rrf_fusion",
}


def _split_depth0(spec: str) -> list[str]:
    """Split a windowspecdefinition arg list at top-level commas only.
    A plain ', '-split fragments any partition/order expression holding a
    nested call (coalesce(a, b)), producing direction-less fragments that
    made the lint silently treat the window as partitioned (ADVICE r9)."""
    args, depth, start = [], 0, 0
    for i, ch in enumerate(spec):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth == 0:
            args.append(spec[start:i].strip())
            start = i + 1
    args.append(spec[start:].strip())
    return [a for a in args if a]


def _unpartitioned_windows(logical_plan: str) -> list[str]:
    """Window nodes whose windowspecdefinition has ONLY order columns
    (every pre-frame argument carries a sort direction): the optimized
    logical plan prints partition columns as bare expressions before the
    ordered ones, so zero direction-less arguments == no partitioning."""
    bad = []
    for line in logical_plan.splitlines():
        s = line.strip().lstrip("+-: ").strip()
        if not s.startswith("Window ["):
            continue
        for spec in re.findall(
            r"windowspecdefinition\((.*?)specifiedwindowframe", s
        ):
            args = _split_depth0(spec.rstrip(", "))
            if not any(
                "ASC NULLS" not in a and "DESC NULLS" not in a for a in args
            ):
                bad.append(s[:100])
    return bad


def test_unpartitioned_window_lint_handles_nested_commas():
    # partition expression with a nested comma (coalesce(a, b)): the old
    # ', '-split fragmented it into direction-less pieces AND pieces with
    # directions, misclassifying both ways. Depth-0 split keeps each arg
    # whole: case 1 is partitioned (ok), case 2 is order-only (flagged).
    partitioned = (
        "Window [sum(x) windowspecdefinition(coalesce(a#1, b#2), "
        "c#3 ASC NULLS FIRST, specifiedwindowframe(RangeFrame, "
        "unboundedpreceding$(), currentrow$())) AS s#9]"
    )
    order_only = (
        "Window [sum(x) windowspecdefinition(coalesce(a#1, b#2) "
        "ASC NULLS FIRST, specifiedwindowframe(RangeFrame, "
        "unboundedpreceding$(), currentrow$())) AS s#9]"
    )
    assert _unpartitioned_windows(partitioned) == []
    assert len(_unpartitioned_windows(order_only)) == 1


def test_lint_side_effect_exclusions_are_registered():
    missing = (SIDE_EFFECTFUL | UNPARTITIONED_WINDOW_OK) - set(QUERIES)
    assert not missing, f"stale exclusion entries: {missing}"


@pytest.mark.parametrize(
    "name", [n for n in QUERIES if n not in SIDE_EFFECTFUL]
)
def test_plan_has_no_scale_killers(spark, name):
    df = QUERIES[name](spark, SF_CORRECT)
    plan = _explain(df)
    issues = []
    if "CartesianProduct" in plan:
        issues.append("CartesianProduct")
    if name not in BNLJ_OK and "BroadcastNestedLoopJoin" in plan:
        issues.append("BroadcastNestedLoopJoin")
    # row-at-a-time Python UDF eval; Arrow-batched mapInPandas renders as
    # MapInPandas / ArrowEvalPython and is the sanctioned Python path
    if "BatchEvalPython" in plan:
        issues.append("BatchEvalPython")
    if name not in GLOBAL_SORT_OK and "Exchange rangepartitioning" in plan:
        issues.append("global range-partition sort")
    if name not in UNPARTITIONED_WINDOW_OK:
        unpart = _unpartitioned_windows(
            df._jdf.queryExecution().optimizedPlan().toString()
        )
        if unpart:
            issues.append(f"unpartitioned window: {unpart[0]}")
    assert not issues, f"{name}: {issues}\n{plan}"
