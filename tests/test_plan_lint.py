"""Global plan lint: EVERY registered query's physical plan is screened
for the scale-killer operator classes, not just the hand-picked plans in
test_plan_quality.py — so a future query can't quietly ship a cartesian
product, a BroadcastNestedLoopJoin, a row-at-a-time Python eval, or a
global sort that only shows up at 100x the fixture size.

Side-effectful carriers (streaming runs, sink writes, JDBC round-trips)
are excluded: calling them executes the side effect, and their plan
posture is covered by their own tests. The exclusion list is explicit so
a NEW side-effectful query must be added here consciously.
"""

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


def test_lint_side_effect_exclusions_are_registered():
    missing = SIDE_EFFECTFUL - set(QUERIES)
    assert not missing, f"stale exclusion entries: {missing}"


@pytest.mark.parametrize(
    "name", [n for n in QUERIES if n not in SIDE_EFFECTFUL]
)
def test_plan_has_no_scale_killers(spark, name):
    plan = _explain(QUERIES[name](spark, SF_CORRECT))
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
    assert not issues, f"{name}: {issues}\n{plan}"
