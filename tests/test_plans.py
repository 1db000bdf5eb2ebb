"""Physical-plan regression tests: the scale properties README claims —
broadcast star joins, rank-limit pushdown, scan pruning, partial
aggregation, top-k without global sort — must survive refactors. A query
can pass the value oracle with a terrible plan; these pin the plan."""

from __future__ import annotations

import covid_data_challenge_spark.queries  # noqa: F401 — populate REGISTRY
import covid_data_challenge_spark.queries_ext  # noqa: F401
from covid_data_challenge_spark.registry import REGISTRY


def _plan(spark, df, mode: str = "formatted") -> str:
    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    return df._jdf.queryExecution().explainString(jmode)


def test_latest_per_key_uses_rank_limit_pushdown(spark, sf_dir):
    """Argmax must keep only the per-key best row on the map side
    (WindowGroupLimit partial) so the shuffle moves ~|keys| rows."""
    plan = _plan(spark, REGISTRY["latest_per_key"].spark(spark, sf_dir))
    assert "WindowGroupLimit" in plan
    assert plan.count("WindowGroupLimit") >= 2  # Partial + Final


def test_regional_revenue_broadcasts_dims_and_never_shuffles_fact(spark, sf_dir):
    plan = _plan(spark, REGISTRY["regional_revenue"].spark(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan  # every join side is a broadcast dim
    # the selective region predicate reaches the parquet scan
    assert "ASIA" in plan and "PushedFilters" in plan
    # exactly one exchange: the final group-by on nation name
    simple = _plan(spark, REGISTRY["regional_revenue"].spark(spark, sf_dir), "simple")
    assert simple.count("Exchange hashpartitioning") == 1


def test_flagship_topk_is_take_ordered(spark, sf_dir):
    plan = _plan(spark, REGISTRY["flagship_customer_snapshot"].spark(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan  # top-k, not a global sort


def test_pricing_summary_prunes_columns_and_partially_aggregates(spark, sf_dir):
    plan = _plan(spark, REGISTRY["pricing_summary"].spark(spark, sf_dir))
    assert "partial_sum" in plan  # map-side combine before the exchange
    assert "l_partkey" not in plan  # unused fact columns never leave parquet


def test_threshold_filter_pushes_down(spark, sf_dir):
    plan = _plan(spark, REGISTRY["threshold_in_filter"].spark(spark, sf_dir))
    assert "PushedFilters" in plan
    assert "o_totalprice" in plan.split("PushedFilters")[1].split("\n")[0]


def test_parity_surface_has_no_python_udf(spark, sf_dir):
    """SURVEY §2 parity queries must stay JVM-side end to end (the only
    sanctioned Python is the multimodal mapInPandas stage)."""
    for name, spec in REGISTRY.items():
        if name.startswith("multimodal"):
            continue
        plan = _plan(spark, spec.spark(spark, sf_dir), "simple")
        assert "BatchEvalPython" not in plan, f"{name} uses a row-at-a-time Python UDF"
        assert "ArrowEvalPython" not in plan, f"{name} uses an unexpected pandas UDF"
