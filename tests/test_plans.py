"""Physical-plan regression tests: the scale properties README claims —
broadcast star joins, rank-limit pushdown, scan pruning, partial
aggregation, top-k without global sort — must survive refactors. A query
can pass the value oracle with a terrible plan; these pin the plan."""

from __future__ import annotations

import re

import pytest

import covid_data_challenge_spark.queries  # noqa: F401 — populate REGISTRY
import covid_data_challenge_spark.queries_ext  # noqa: F401
from covid_data_challenge_spark.registry import REGISTRY


def _plan(spark, df, mode: str = "formatted") -> str:
    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    return df._jdf.queryExecution().explainString(jmode)


@pytest.fixture(scope="module")
def all_simple_plans(spark, sf_dir):
    """One registry-wide plan-build pass shared by the three whole-surface
    audit sweeps below (r13: each sweep previously re-CONSTRUCTED all
    ~212 queries — including the eager gold builds and the streaming
    queries' own micro-batch actions — so three sweeps cost 311+247+245 s
    of the suite's 50 min; one shared pass keeps identical coverage at a
    third of the cost). name → 'simple'-mode physical plan."""
    return {
        name: _plan(spark, spec.spark(spark, sf_dir), "simple")
        for name, spec in REGISTRY.items()
    }


def test_latest_per_key_is_partial_argmax_aggregate(spark, sf_dir):
    """Argmax must keep only the per-key best row on the map side
    (partial max_by) so the shuffle moves ~|keys| rows — and the r6 agg
    form must hold: no window machinery (the old WindowGroupLimit shape
    still full-sorted every input partition by the 4-column ordering;
    the agg form sorts by the group key alone and measured 2× faster at
    10× data), and the pre-argmax projection must prune the scan to the
    6 output columns (the max_by row struct would otherwise drag every
    lineitem column through the aggregate)."""
    plan = _plan(spark, REGISTRY["latest_per_key"].spark(spark, sf_dir))
    assert "partial_max_by" in plan  # map-side argmax before the exchange
    assert "WindowGroupLimit" not in plan and "Window" not in plan
    assert "l_partkey" not in plan  # unused fact columns never leave parquet


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


def test_parity_surface_has_no_python_udf(all_simple_plans):
    """SURVEY §2 parity queries must stay JVM-side end to end (the only
    sanctioned Python is the multimodal mapInPandas stage)."""
    for name, plan in all_simple_plans.items():
        if name.startswith("multimodal"):
            continue
        assert "BatchEvalPython" not in plan, f"{name} uses a row-at-a-time Python UDF"
        assert "ArrowEvalPython" not in plan, f"{name} uses an unexpected pandas UDF"


def test_partitioned_gold_table_scan_is_partition_pruned(spark, sf_dir, tmp_path):
    """A gold table written with partitionBy(date) must serve a one-day
    query by reading ONLY that day's files — at 100 TB the difference
    between a partition-pruned scan and a full scan is the whole game."""
    from pyspark.sql import functions as F

    from covid_data_challenge_spark.sources.readers import load_table
    from covid_data_challenge_spark.sources.sinks import write_parquet

    ev = load_table(spark, sf_dir, "events").withColumn("event_date", F.to_date("ts"))
    gold = str(tmp_path / "events_gold")
    write_parquet(ev, gold, partition_by=["event_date"])

    back = spark.read.parquet(gold)
    day = back.select(F.min("event_date").alias("d")).collect()[0]["d"]
    one_day = back.filter(F.col("event_date") == F.lit(day))

    plan = _plan(spark, one_day)
    scan = plan.split("PartitionFilters", 1)
    assert len(scan) == 2 and "event_date" in scan[1][:300]

    n_pruned = one_day.select(F.input_file_name()).distinct().count()
    n_total = back.select(F.input_file_name()).distinct().count()
    assert 0 < n_pruned < n_total
    # pruning must not change results
    assert one_day.count() == ev.filter(F.col("event_date") == F.lit(day)).count()


def test_chunking_and_mixture_are_map_side_only(spark, sf_dir):
    """The corpus-prep explodes (chunking, mixture sampling) and the
    regex redactor must stay shuffle-free: pure scan→project→generate
    plans, no Exchange, no Python runner."""
    for name in ("doc_chunks", "mixture_sample", "pii_redaction"):
        simple = _plan(spark, REGISTRY[name].spark(spark, sf_dir), "simple")
        assert "Exchange" not in simple, name
        assert "Generate" in simple or name == "pii_redaction", name


def test_events_cube_is_single_pass(spark, sf_dir):
    """Cube subtotals expand in ONE aggregate plan — one scan of events,
    partial agg before the single exchange."""
    simple = _plan(spark, REGISTRY["events_cube"].spark(spark, sf_dir), "simple")
    assert simple.count("Scan parquet") == 1
    assert simple.count("Exchange hashpartitioning") == 1
    assert "Expand" in simple
    plan = _plan(spark, REGISTRY["events_cube"].spark(spark, sf_dir))
    assert "partial_count" in plan or "partial" in plan


def test_stratified_sample_rank_limits_on_map_side(spark, sf_dir):
    """k-per-class sampling must push the rank limit below the shuffle
    (WindowGroupLimit) so only k·classes rows move."""
    plan = _plan(spark, REGISTRY["stratified_sample"].spark(spark, sf_dir))
    assert "WindowGroupLimit" in plan


def test_group_winsorize_broadcasts_cut_table(spark, sf_dir):
    """The per-group percentile cuts must broadcast — the fact table is
    clipped map-side, never shuffled for the join."""
    plan = _plan(spark, REGISTRY["group_winsorize"].spark(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_cohort_retention_has_no_join_and_no_broadcast(spark, sf_dir):
    """Cohort tagging is a window-min over the distinct (user, week)
    activity set — NO join, and in particular no broadcast of the
    per-user first-seen table (unbounded cardinality at 100 TB of
    events would OOM the driver)."""
    simple = _plan(spark, REGISTRY["cohort_retention"].spark(spark, sf_dir), "simple")
    assert "Join" not in simple
    assert "BroadcastExchange" not in simple


def test_group_mad_outliers_broadcasts_stats(spark, sf_dir):
    """Median and MAD tables are groups-sized — the event scan must be
    filtered via broadcast, never shuffled on the group key."""
    plan = _plan(spark, REGISTRY["group_mad_outliers"].spark(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_grouping_sets_is_single_pass(spark, sf_dir):
    """All four granularities must come from ONE Expand over one scan
    with partial aggregation — not four scans."""
    simple = _plan(spark, REGISTRY["events_grouping_sets"].spark(spark, sf_dir), "simple")
    assert simple.count("Scan parquet") == 1
    assert "Expand" in simple
    assert simple.count("Exchange hashpartitioning") == 1


def test_attribution_last_touch_single_shuffle(spark, sf_dir):
    """The as-of style attribution is ONE window pass: exactly one
    exchange (user_id), no self-join."""
    simple = _plan(spark, REGISTRY["attribution_last_touch"].spark(spark, sf_dir), "simple")
    assert simple.count("Exchange hashpartitioning") == 1
    assert "Join" not in simple


def test_transition_matrix_normalizer_reuses_partitioning(spark, sf_dir):
    """The row-normalizing window runs on the |types|² aggregate — the
    raw event stream is shuffled exactly once (user_id for the lead)."""
    simple = _plan(spark, REGISTRY["event_transition_matrix"].spark(spark, sf_dir), "simple")
    assert simple.count("Scan parquet") == 1

def test_sorted_layout_gives_tight_rowgroup_stats_and_file_pruning(spark, sf_dir, tmp_path):
    """write_sorted_parquet must produce range-clustered files whose
    row-group min/max stats on the sort key are tight (disjoint across
    files), so a selective key predicate skips files/row groups instead
    of scanning the table — the zone-map layout lever at 100 TB."""
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from covid_data_challenge_spark.sources.readers import load_table
    from covid_data_challenge_spark.sources.sinks import write_sorted_parquet

    ev = load_table(spark, sf_dir, "events")
    gold = str(tmp_path / "events_sorted")
    write_sorted_parquet(ev, gold, sort_cols=["user_id"], num_files=8)

    import glob as globmod

    files = sorted(globmod.glob(f"{gold}/part-*.parquet"))
    assert len(files) >= 2
    ranges = []
    for f in files:
        md = pq.ParquetFile(f).metadata
        idx = {md.row_group(0).column(i).path_in_schema: i for i in range(md.num_columns)}["user_id"]
        mins = [md.row_group(g).column(idx).statistics.min for g in range(md.num_row_groups)]
        maxs = [md.row_group(g).column(idx).statistics.max for g in range(md.num_row_groups)]
        ranges.append((min(mins), max(maxs)))
    # range clustering ⇒ per-file key ranges are pairwise disjoint
    ranges.sort()
    for (_, hi), (lo, _) in zip(ranges, ranges[1:]):
        assert hi <= lo
    # a one-key query touches exactly one file
    back = spark.read.parquet(gold)
    key = back.select(F.min("user_id").alias("k")).collect()[0]["k"]
    touched = back.filter(F.col("user_id") == key).select(F.input_file_name()).distinct().count()
    assert touched == 1
    # layout must not change results
    assert back.count() == ev.count()

def test_capped_jaccard_has_no_self_join_and_two_scans(spark, sf_dir):
    """The capped exact-Jaccard path must stay the group-pair-explode
    shape: two corpus scans (main lineage + df pre-agg), no shingle
    self-join, pairs emitted inside ≤cap groups."""
    simple = _plan(spark, REGISTRY["ngram_jaccard_pairs"].spark(spark, sf_dir), "simple")
    assert simple.count("Scan parquet") == 2
    # the only join is the LeftSemi df-cap filter — no inner self-join
    assert "Inner" not in simple
    assert "LeftSemi" in simple


def test_no_cartesian_product_anywhere(all_simple_plans):
    """Registry-wide sweep: no query may plan a CartesianProduct — every
    join must have an equi-key or a broadcast side. (1-row scalar
    broadcasts plan as BroadcastNestedLoopJoin, which is fine; an
    unconstrained CartesianProduct at 100 TB is a job killer.)"""
    for name, simple in all_simple_plans.items():
        if "stream" in name:
            continue  # streaming plans resolve at runtime
        assert "CartesianProduct" not in simple, name


def test_no_unsanctioned_python_and_no_unbounded_global_window_anywhere(
    all_simple_plans,
):
    """Registry-wide sweep with the SAME detectors as tools/plan_audit.py
    (imported, not copied — one source of truth): (a) every Python
    evaluation node — row-UDF, pandas-UDF, applyInPandas/mapInPandas,
    stateful — may appear only in the explicitly sanctioned sites
    (multimodal decode, sequence packing, streaming stateful); (b) no
    query may plan a single-partition Window over an input that is not
    PROVABLY bounded — an aggregate exempts only when its grouping keys
    are low-cardinality by construction, so a window partitioned on a
    bare corpus-population key (the r4 length_bucketed_batches weak) or
    fed by an arbitrary-key aggregate (the r4 AUC residual) fails here."""
    import pathlib
    import sys

    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1] / "tools"))
    from plan_audit import (  # noqa: E402
        _RUNS_OWN_ACTION,
        corpus_global_windows,
        python_eval_nodes,
        python_sanctioned,
    )

    for name, simple in all_simple_plans.items():
        if "stream" in name or name in _RUNS_OWN_ACTION:
            continue
        if python_eval_nodes(simple):
            assert python_sanctioned(name), (
                f"{name} plans a Python evaluation node outside the "
                f"sanctioned sites"
            )
        assert corpus_global_windows(simple) == 0, (
            f"{name} plans a single-partition Window over an unbounded "
            f"input:\n{simple[:3000]}"
        )


def test_late_shipment_is_semi_join_with_pruned_fact_scan(spark, sf_dir):
    """The EXISTS must plan as LEFT SEMI (orders never duplicate however
    many lineitems are late) and the fact scan must read only the join
    key + ship date."""
    plan = _plan(spark, REGISTRY["late_shipment_priority"].spark(spark, sf_dir))
    assert "LeftSemi" in plan
    assert "l_extendedprice" not in plan  # fact columns pruned at the scan


def test_cheapest_supplier_argmin_has_no_window_sort(spark, sf_dir):
    """The per-part ARGMIN must stay the fused two-pass aggregation
    (struct-min), never a window sort over the unit-price table."""
    simple = _plan(spark, REGISTRY["cheapest_supplier_per_part"].spark(spark, sf_dir), "simple")
    assert "Window" not in simple
    plan = _plan(spark, REGISTRY["cheapest_supplier_per_part"].spark(spark, sf_dir))
    assert "partial_min" in plan  # map-side combine on both agg passes


def test_cms_sketch_probe_is_broadcast_and_partially_aggregated(spark, sf_dir):
    """The sketch fold must map-side combine the ×depth explode before
    its (tiny) shuffle, and the probe join must broadcast the sketch —
    candidate probing stays map-side at any candidate count."""
    plan = _plan(spark, REGISTRY["cms_heavy_hitters"].spark(spark, sf_dir))
    assert "partial_count" in plan
    assert "BroadcastHashJoin" in plan


def test_zorder_layout_prunes_on_both_dimensions(spark, sf_dir, tmp_path):
    """Z-order clustering must give partial locality on EVERY clustered
    column: a narrow range predicate on either dimension touches a
    strict subset of the files, where the 1-D sorted layout serves only
    its sort key (the second column's predicate hits every file)."""
    import glob as globmod

    from pyspark.sql import functions as F

    from covid_data_challenge_spark.sources.readers import load_table
    from covid_data_challenge_spark.sources.sinks import (
        write_sorted_parquet,
        write_zorder_parquet,
    )

    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    zpath, spath = str(tmp_path / "ev_z"), str(tmp_path / "ev_s")
    write_zorder_parquet(ev, zpath, cols=["user_id", "value"], num_files=8)
    write_sorted_parquet(ev, spath, sort_cols=["user_id"], num_files=8)
    n_files = len(globmod.glob(f"{zpath}/part-*.parquet"))
    assert n_files >= 4

    lo_u, hi_u, lo_v, hi_v = ev.agg(
        F.min("user_id"), F.max("user_id"), F.min("value"), F.max("value")
    ).collect()[0]
    u_pred = F.col("user_id") < lo_u + (hi_u - lo_u) / 16
    v_pred = F.col("value") < lo_v + (hi_v - lo_v) / 16

    def touched(path, pred):
        return (
            spark.read.parquet(path)
            .filter(pred)
            .select(F.input_file_name())
            .distinct()
            .count()
        )

    # z-layout: BOTH dimensions cluster → both predicates skip files
    assert touched(zpath, u_pred) < n_files
    assert touched(zpath, v_pred) < n_files
    # 1-D layout: the non-sort column has no locality at all
    assert touched(spath, v_pred) == n_files
    # layout must not change results
    zdf = spark.read.parquet(zpath)
    assert zdf.count() == ev.count()
    assert zdf.filter(u_pred).count() == ev.filter(u_pred).count()
    assert zdf.filter(v_pred).count() == ev.filter(v_pred).count()


def test_q6_scan_pushdown_and_column_pruning(spark, sf_dir):
    """The pure-scan aggregate must push all four predicates into the
    parquet reader and read only the columns it uses."""
    plan = _plan(spark, REGISTRY["forecast_revenue_change"].spark(spark, sf_dir))
    pushed = plan.split("PushedFilters")[1].split("\n")[0]
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in pushed
    assert "l_orderkey" not in plan  # unused columns never leave parquet


def test_q19_disjunction_splits_to_both_scans(spark, sf_dir):
    """Catalyst must derive per-table envelopes from the OR-of-ANDs:
    each scan's PushedFilters carries its side of the disjunction."""
    plan = _plan(spark, REGISTRY["disjunctive_brand_revenue"].spark(spark, sf_dir))
    assert plan.count("PushedFilters") >= 2
    assert "p_brand" in plan.split("PushedFilters")[2].split("\n")[0] or "p_brand" in plan.split("PushedFilters")[1].split("\n")[0]


def test_bloom_probe_is_broadcast_hash_join(spark, sf_dir):
    """The Bloom membership test must plan as a broadcast HASH join on
    the position key — an array/map lookup would be a linear scan per
    probe (the 58×-growth regression SCALING.md documents)."""
    plan = _plan(spark, REGISTRY["bloom_decontaminate"].spark(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "array_contains" not in plan


def test_product_type_profit_pushes_name_filter_and_broadcasts_dims(spark, sf_dir):
    plan = _plan(spark, REGISTRY["product_type_profit"].spark(spark, sf_dir))
    assert "StringContains(p_name,widget)" in plan  # pushed into the part scan
    assert "BroadcastHashJoin" in plan


def test_asof_forward_is_single_window_pass(spark, sf_dir):
    """Both as-of directions must stay the union+one-window shape — no
    inequality join (BroadcastNestedLoopJoin) may appear."""
    for q in ("events_asof_join", "events_asof_forward"):
        plan = _plan(spark, REGISTRY[q].spark(spark, sf_dir))
        assert "BroadcastNestedLoopJoin" not in plan, q
        assert plan.count("Window") >= 1, q
        assert "Union" in plan, q


def test_concurrent_peak_partitions_sweep_by_day(spark, sf_dir):
    """The sweep-line running sum must be windowed BY DAY (parallel
    sweeps), never a global single-partition ordered window."""
    plan = _plan(spark, REGISTRY["concurrent_sessions_peak"].spark(spark, sf_dir))
    # the sweep Window's partition spec must be the day column — the
    # formatted plan prints it as windowspecdefinition(day#N, ...); the
    # prior 'day#' fallback was vacuous (matches any day reference)
    assert "windowspecdefinition(day#" in plan
    # a global ordered window would show an Exchange SinglePartition
    assert "SinglePartition" not in plan


def test_reservoir_sample_uses_rank_limit_pushdown(spark, sf_dir):
    """The per-source cap must prune map-side (WindowGroupLimit partial
    + final) — capping a 100 TB corpus moves ~n·|sources| rows, not the
    corpus."""
    plan = _plan(spark, REGISTRY["reservoir_sample_per_source"].spark(spark, sf_dir))
    assert "WindowGroupLimit" in plan
    assert plan.count("WindowGroupLimit") >= 2  # Partial + Final


def test_corpus_prep_recipe_is_three_shuffles(spark, sf_dir):
    """The composed curation recipe must stay three exchanges (dedup
    groupBy, dedup semi-join side, per-source cap window) over one scan
    — the composition cannot silently grow extra shuffles."""
    plan = _plan(spark, REGISTRY["corpus_prep_recipe"].spark(spark, sf_dir), "simple")
    assert plan.count("Exchange hashpartitioning") <= 3
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # the soft-sample coin is a pushed filter, not a join or python stage
    assert "WindowGroupLimit" in plan  # per-source cap pruned map-side


def test_semdedup_policy_assignment_broadcasts_centroids(spark, sf_dir):
    """Under the corpus-proportional sizing policy (n_centroids=None)
    the centroid join must stay a broadcast — the policy's broadcast-
    budget assert and this plan pin are two halves of one contract."""
    from covid_data_challenge_spark.operators.semdedup import semdedup_assignments
    from covid_data_challenge_spark.sources.readers import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    plan = _plan(spark, semdedup_assignments(emb, n_centroids=None), "simple")
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan


def test_ewma_has_single_fact_shuffle_and_no_udf(spark, sf_dir):
    """EWMA = daily pre-agg (one fact shuffle) + per-user fold; the fold
    is JVM column algebra, not Python."""
    plan = _plan(spark, REGISTRY["user_daily_value_ewma"].spark(spark, sf_dir))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "aggregate(" in plan  # the higher-order fold survives in the plan


def test_passage_dedup_two_exchanges_with_rank_limit_pushdown(spark, sf_dir):
    """Passage dedup must be exactly two shuffles (passage-hash
    keep-first, doc_id reassembly) and the keep-first must prune on the
    map side (WindowGroupLimit Partial) so only per-partition winners
    reach the hash exchange."""
    simple = _plan(spark, REGISTRY["passage_dedup"].spark(spark, sf_dir), "simple")
    assert simple.count("Exchange hashpartitioning") == 2
    assert simple.count("WindowGroupLimit") >= 2  # Partial + Final
    assert "CartesianProduct" not in simple


def test_bilateral_trade_broadcasts_all_dim_arms(spark, sf_dir):
    """The two nation slices and the pruned supplier arm are hinted
    broadcasts — the fact table must never feed a cartesian and the
    hinted joins must stay broadcast regardless of stats."""
    simple = _plan(spark, REGISTRY["bilateral_trade_volume"].spark(spark, sf_dir), "simple")
    assert simple.count("BroadcastHashJoin") >= 3
    assert "CartesianProduct" not in simple


def test_pagerank_broadcast_loop_never_shuffles_edges(spark):
    """With broadcast_ranks=True every iteration join is a
    BroadcastHashJoin — the edge list crosses no exchange inside the
    loop (the whole point of the hint: at dimension-sized node sets the
    big edge relation is shuffle-free for the entire run)."""
    from pyspark.sql import functions as F

    from covid_data_challenge_spark.operators.graph import _iterate

    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (3, 2), (1, 3), (3, 1)], "src int, dst int"
    )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("__deg"))
    e = edges.join(deg, "src").persist()  # as pagerank() itself does
    nodes = deg.select(F.col("src").alias("node")).persist()
    n_nodes = nodes.agg(F.count(F.lit(1)).alias("__n"))
    ranks = nodes.join(F.broadcast(n_nodes)).select(
        "node", (F.lit(1.0) / F.col("__n")).alias("rank")
    )
    out = _iterate(
        e, nodes, n_nodes, ranks, 3, 0.85, F.lit(0.15), "src", "dst", 9,
        broadcast_ranks=True,
    )
    simple = _plan(spark, out, "simple")
    e.unpersist()
    nodes.unpersist()
    # 2 broadcast joins per iteration; the only SortMergeJoin strings in
    # the explain output are the cached edges⋈deg BUILD plan rendered
    # beneath each InMemoryTableScan (keyed on src) — the loop's own
    # joins are keyed on node and must never sort-merge
    assert simple.count("BroadcastHashJoin") >= 6
    assert "SortMergeJoin [node" not in simple


def test_containment_shares_jaccard_plan_shape(spark, sf_dir):
    """Containment must keep the capped inverted-index shape: two corpus
    scans, no shingle self-join — same pins as ngram_jaccard_pairs, since
    both project off pair_overlap_counts."""
    simple = _plan(
        spark, REGISTRY["containment_neardup_pairs"].spark(spark, sf_dir), "simple"
    )
    assert simple.count("Scan parquet") == 2
    assert "Inner" not in simple
    assert "LeftSemi" in simple


def test_bm25_topk_is_take_ordered_with_broadcast_stats(spark, sf_dir):
    """BM25 must cap the result via TakeOrderedAndProject (never a global
    sort) and bring the |q|-row df table + 1-row corpus stats in by
    broadcast — the posting-list aggregate is the only corpus-sized
    shuffle."""
    plan = _plan(spark, REGISTRY["bm25_topk"].spark(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_ngram_novelty_is_single_scan_no_join(spark, sf_dir):
    """Novelty is one corpus scan: distinct → gram-key count window
    (partitions bounded by |sources| post-distinct) → per-source agg.
    No join of any kind, and never a second scan of the corpus."""
    plan = _plan(
        spark, REGISTRY["ngram_novelty_by_source"].spark(spark, sf_dir), "simple"
    )
    assert plan.count("Scan parquet") == 1
    assert "Join" not in plan


def test_runtime_bloom_filter_kicks_in_when_dim_cannot_broadcast(spark, sf_dir):
    """The 100 TB big-big join story: while the filtered dim side fits
    the broadcast threshold no runtime filter is needed (the broadcast
    hash join IS the filter); force the join to sort-merge (as at real
    scale, where both sides are TBs) and Spark must inject a runtime
    Bloom filter — bloom_filter_agg on the selective side, might_contain
    pre-filtering the fact scan — cutting the fact shuffle to ~matching
    rows. Confs are restored so later tests see the session defaults."""
    from pyspark.sql import functions as F

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    od = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    j = li.join(od, li.l_orderkey == od.o_orderkey).groupBy("o_orderpriority").count()
    assert "bloomFilter" not in j._jdf.queryExecution().optimizedPlan().toString()

    prior_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    prior_app = spark.conf.get(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
    )
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        # fixture scans are KBs; at real scale the default 10GB gate passes
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "0",
        )
        j2 = (
            li.join(od, li.l_orderkey == od.o_orderkey)
            .groupBy("o_orderpriority")
            .count()
        )
        plan = j2._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom_filter_agg" in plan and "might_contain" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior_bc)
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            prior_app,
        )


def test_dsir_select_scans_corpus_at_most_twice(spark, sf_dir):
    """The DSIR model (bucket weights) must be materialized, not
    re-derived per consumer: the end-to-end select plan gets one scan
    for the threshold pass and one for the filter pass. A regression to
    subtree re-derivation showed up as 6 parquet scans (and 12x the
    warm runtime) before the model checkpoint + window-totals rewrite."""
    import re

    from covid_data_challenge_spark.registry import REGISTRY
    import covid_data_challenge_spark.queries_ext  # noqa: F401

    df = REGISTRY["dsir_importance_select"].spark(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert len(re.findall(r"Scan parquet", plan)) <= 2, plan[:2000]


def test_auc_rank_window_is_range_sharded_two_level(spark, sf_dir):
    """Exact ROC-AUC / PR-AUC must never sort anything data-sized
    through a single-partition window — not the scored corpus (the r3
    scale-killer) and not the distinct-logit table either (the r4
    residual: near-unique logits on a natural corpus make |distinct| ≈
    |rows|). The pinned two-level shape (operators/prefix.py): a
    rangepartitioning exchange on logit_units feeds a window
    PARTITIONED by the shard label, and the only unpartitioned window
    consumes the K-row per-shard-total aggregate (its subtree reaches
    HashAggregate(keys=[__ps_shard...]) before any scan)."""
    for qname in ("classifier_eval_auc", "classifier_eval_pr_auc"):
        simple = _plan(spark, REGISTRY[qname].spark(spark, sf_dir), "simple")
        assert "rangepartitioning(logit_units" in simple, (qname, simple)
        lines = simple.splitlines()
        for i, l in enumerate(lines):
            if "Window" not in l or "WindowGroupLimit" in l:
                continue
            if "windowspecdefinition(__ps_shard" in l:
                continue  # within-shard cumulative — partitioned, bounded
            # unpartitioned window: must consume the K-row shard totals
            below = lines[i + 1 :]
            agg_at = next(
                (
                    j
                    for j, s in enumerate(below)
                    if "HashAggregate(keys=[__ps_shard" in s
                ),
                None,
            )
            assert agg_at is not None, (qname, l, simple)
            assert not any("Scan" in s for s in below[:agg_at]), (qname, simple)


def test_length_bucketed_batches_window_is_sharded(spark, sf_dir):
    """The r4 `weak`, pinned fixed: batch-cutting row_number must
    partition on (len_bucket, shard) — a natural corpus concentrates
    doc lengths in a few dozen 32-token bins, so a window partitioned
    on the BARE len_bucket sorts a corpus-scale population in one task
    (and, being hashpartitioned rather than SinglePartition, would slip
    past the audit's global-window detector — hence this explicit pin)."""
    simple = _plan(
        spark, REGISTRY["length_bucketed_batches"].spark(spark, sf_dir), "simple"
    )
    wins = [l for l in simple.splitlines()
            if "windowspecdefinition" in l and "WindowGroupLimit" not in l]
    assert wins, simple
    for l in wins:
        assert re.search(r"windowspecdefinition\(len_bucket#\d+L?, shard#\d+", l), l


def test_objective_transforms_and_gopher_are_shuffle_free(spark, sf_dir):
    """fim_transform, t5_span_corruption, and gopher_quality_flags claim
    to stream at scan speed — their plans must contain no Exchange of
    any kind and exactly one parquet scan."""
    for name in ("fim_transform", "t5_span_corruption", "gopher_quality_flags"):
        simple = _plan(spark, REGISTRY[name].spark(spark, sf_dir), "simple")
        assert "Exchange" not in simple, (name, simple)
        assert simple.count("Scan parquet") == 1, (name, simple)


def test_duplicate_spans_islands_partition_by_doc(spark, sf_dir):
    """The island-merge windows must be doc_id-partitioned (bounded by
    tokens-per-doc): no single-partition exchange may appear anywhere in
    the span plan, and the window hash-partitions on doc_id."""
    simple = _plan(spark, REGISTRY["duplicate_spans"].spark(spark, sf_dir), "simple")
    assert "Exchange SinglePartition" not in simple, simple
    assert "hashpartitioning(doc_id" in simple, simple


def test_moore_lewis_fused_scorer_single_per_doc_aggregate(spark, sf_dir):
    """The r7 fused multi-LM scorer must survive refactors: the final
    moore_lewis_select plan starts from the checkpointed scored frame
    (both scoring passes + the per-doc aggregation already collapsed
    into ONE chain behind the boundary), so the visible plan contains
    no corpus-sized joins, no sort-merge joins, and no window — only
    the median broadcast onto the scored rows."""
    plan = _plan(spark, REGISTRY["moore_lewis_select"].spark(spark, sf_dir))
    assert "SortMergeJoin" not in plan
    assert "Window" not in plan
    # the scored frame is a checkpoint leaf, not a re-derived LM chain
    assert "ExistingRDD" in plan or "Scan ExistingRDD" in plan


def test_block_power_iteration_matvec_is_single_scan_no_shuffle_amplification(
    spark, sf_dir
):
    """embedding_top_pcs (r7): the returned frame is the per-dim
    projection over ONE posexplode aggregate — a single exchange (the
    64-group aggregate), no joins, no window; the iterate enters as
    literals so the plan is join-free (the iteration-internal matvecs
    already ran eagerly via the aux-table pattern)."""
    plan = _plan(spark, REGISTRY["embedding_top_pcs"].spark(spark, sf_dir))
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan
    assert "Window" not in plan
    assert plan.count("Exchange") <= 2  # partial->final of the 64-group agg


def test_hll_register_build_is_two_aggregates_no_window(spark, sf_dir):
    """hll_distinct_tokens (r7): registers are groupBy(source, idx)
    max — map-side combinable — and the estimate is a per-source
    re-aggregate; no window, no sort-merge join anywhere (the exact
    side joins the estimate by source, broadcast-sized)."""
    plan = _plan(spark, REGISTRY["hll_distinct_tokens"].spark(spark, sf_dir))
    assert "Window" not in plan
    assert "SortMergeJoin" not in plan
