"""Structured-Streaming twins (hash-matching their batch
oracles), CDC/SCD2 upserts, and mergeable sketch maintenance.

Registered via registry.register; queries_ext imports every themed
module and restores the frozen driver-contract registry order
(registry_order.CANONICAL_ORDER) afterwards — in-module order is
thematic, not contractual.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from covid_data_challenge_spark.registry import register
from covid_data_challenge_spark.sources.readers import load_table
from covid_data_challenge_spark.queries_shared import (  # noqa: F401
    _events,
)


@register(
    "events_tumbling_stream",
    oracle="""
SELECT date_trunc('hour', ts) AS window_start, event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       round(sum(value), 2) AS total_value
FROM events GROUP BY 1, 2
""",
)
def q_events_tumbling_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    from covid_data_challenge_spark.streaming.events import (
        read_event_stream,
        run_to_memory_sink,
        streaming_tumbling_counts,
    )

    stream = read_event_stream(spark, sf_dir)
    agg = streaming_tumbling_counts(stream, width="1 hour", watermark="2 hours")
    try:
        run_to_memory_sink(agg, "events_tumbling_stream_sink")
    finally:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
    return spark.table("events_tumbling_stream_sink")


@register(
    "events_sessionize_stream",
    oracle="""
WITH flagged AS (
    SELECT user_id, ts, event_id, value,
           CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id
                )) > 1800 * 1000000 THEN 1 ELSE 0 END AS is_new
    FROM events
),
numbered AS (
    SELECT *, sum(is_new) OVER (
        PARTITION BY user_id ORDER BY ts, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
    ) AS session_idx
    FROM flagged
)
SELECT user_id,
       min(ts) AS session_start,
       max(ts) AS session_end,
       CAST(count(*) AS BIGINT) AS n_events,
       round(sum(value), 2) AS total_value
FROM numbered GROUP BY user_id, session_idx
""",
)
def q_events_sessionize_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native ``session_window`` streaming sessionization, held to the
    batch gaps-and-islands oracle: ``session_window.start`` is the first
    event's ts and ``.end`` is last ts + gap, so subtracting the gap
    recovers the batch ``session_end`` exactly."""
    from covid_data_challenge_spark.streaming.events import (
        read_event_stream,
        run_to_memory_sink,
        streaming_sessionize,
    )

    stream = read_event_stream(spark, sf_dir)
    sessions = streaming_sessionize(stream, gap="30 minutes", watermark="2 hours")
    try:
        run_to_memory_sink(sessions, "events_sessionize_stream_sink")
    finally:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
    return spark.table("events_sessionize_stream_sink").select(
        "user_id",
        "session_start",
        (F.col("session_end") - F.expr("INTERVAL 30 MINUTES")).alias("session_end"),
        "n_events",
        "total_value",
    )


@register(
    "distinct_users_sketch",
    oracle="""
SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS approx_distinct
FROM events GROUP BY event_type
""",
)
def q_distinct_users_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type distinct users via mergeable HLL sketches (sparse-mode
    exact at test cardinality → hash-checkable; mergeable and ~1% at
    100 TB where countDistinct would need the raw keys at every grain)."""
    from covid_data_challenge_spark.operators.sketch import distinct_sketches

    ev = _events(spark, sf_dir)
    return distinct_sketches(ev, "event_type", "user_id").select(
        "event_type", "approx_distinct"
    )


@register(
    "price_quantiles",
    oracle="""
SELECT o_orderpriority,
       round(quantile_cont(o_totalprice, 0.25), 2) AS p25,
       round(quantile_cont(o_totalprice, 0.50), 2) AS p50,
       round(quantile_cont(o_totalprice, 0.75), 2) AS p75,
       CAST(count(*) AS BIGINT) AS n_orders
FROM orders GROUP BY o_orderpriority
""",
)
def q_price_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated quantiles per group (A5 extended) — Spark's
    ``percentile`` matches DuckDB's ``quantile_cont`` bit-for-bit; at
    100 TB switch to ``approx_percentile`` (t-digest) and accept ε."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.round(F.percentile("o_totalprice", F.lit(0.25)), 2).alias("p25"),
        F.round(F.percentile("o_totalprice", F.lit(0.50)), 2).alias("p50"),
        F.round(F.percentile("o_totalprice", F.lit(0.75)), 2).alias("p75"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@register(
    "user_running_totals_stream",
    oracle="""
SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
       round(sum(value), 2) AS total_value,
       max(value) AS max_value
FROM events GROUP BY user_id
""",
)
def q_user_running_totals_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState): per-user running
    totals after the stream drains must equal the batch aggregation."""
    from covid_data_challenge_spark.streaming.events import (
        read_event_stream,
        run_to_memory_sink,
    )
    from covid_data_challenge_spark.streaming.stateful import running_user_totals

    stream = read_event_stream(spark, sf_dir)
    try:
        run_to_memory_sink(
            running_user_totals(stream), "user_running_totals_sink", mode="update"
        )
    finally:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
    return spark.table("user_running_totals_sink").select(
        "user_id",
        "n_events",
        F.round(F.col("total_value"), 2).alias("total_value"),
        "max_value",
    )


@register(
    "scd2_history",
    oracle="""
SELECT user_id, event_id, value,
       ts AS valid_from,
       lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
       lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL AS is_current
FROM events
""",
)
def q_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension (type 2) versioning: each per-user event
    becomes a [valid_from, valid_to) row, closed by the next change via
    lead(). One shuffle on the entity key; the open row (valid_to NULL)
    is the current state — the standard CDC modeling the reference's
    'latest snapshot only' pipeline cannot express."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w)
    return ev.select(
        "user_id",
        "event_id",
        "value",
        F.col("ts").alias("valid_from"),
        nxt.alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )


@register(
    "clicks_purchases_stream_join",
    oracle="""
SELECT p.event_id AS purchase_id, p.user_id, p.ts AS purchase_ts,
       c.event_id AS click_id, c.ts AS click_ts,
       round(p.value, 2) AS purchase_value
FROM events p JOIN events c
  ON c.user_id = p.user_id
 AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts < p.ts
WHERE p.event_type = 'purchase' AND c.event_type = 'click'
""",
)
def q_clicks_purchases_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked stream-stream join (the Structured Streaming flagship
    the batch suite can't show): purchases pair with same-user clicks in
    the trailing hour. The event-time bound + watermarks let Spark evict
    buffered rows once the watermark passes — bounded state on an
    unbounded stream. Held to the batch inequality-join oracle over the
    same data."""
    from covid_data_challenge_spark.streaming.events import (
        read_event_stream,
        run_to_memory_sink,
        streaming_click_purchase_join,
    )

    stream = read_event_stream(spark, sf_dir)
    clicks = stream.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", F.col("ts").alias("click_ts")
    )
    purchases = stream.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.col("ts").alias("purchase_ts"), "value"
    )
    joined = streaming_click_purchase_join(clicks, purchases)
    try:
        run_to_memory_sink(joined, "clicks_purchases_stream_join_sink")
    finally:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
    return spark.table("clicks_purchases_stream_join_sink")


_DIFF_CUTOFF = "2024-01-20 00:00:00"


@register(
    "snapshot_diff",
    oracle=f"""
WITH old_ranked AS (
  SELECT user_id, value, row_number() OVER (
      PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events WHERE ts < TIMESTAMP '{_DIFF_CUTOFF}'
),
new_ranked AS (
  SELECT user_id, value, row_number() OVER (
      PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
),
old AS (SELECT user_id, value AS old_value FROM old_ranked WHERE rn = 1),
new AS (SELECT user_id, value AS new_value FROM new_ranked WHERE rn = 1)
SELECT n.user_id, o.old_value, n.new_value,
       CASE WHEN o.user_id IS NULL THEN 'added' ELSE 'changed' END AS change_type
FROM new n LEFT JOIN old o USING (user_id)
WHERE o.user_id IS NULL OR o.old_value <> n.new_value
""",
)
def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-to-snapshot CDC diff: latest per-user state as of a
    cutoff vs now, classified added/changed (drop unchanged). Both
    snapshots are WindowGroupLimit argmax passes over the SAME user_id
    partitioning, and the diff join is keyed on user_id too — one
    logical partitioning serves all three stages, so at 100 TB the
    whole diff is a single shuffle plus map-side compares. This is the
    incremental-refresh primitive the reference recomputes from scratch."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )

    def snap(df: DataFrame, alias: str) -> DataFrame:
        return (
            df.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("user_id", F.col("value").alias(alias))
        )

    old = snap(ev.filter(F.col("ts") < F.lit(_DIFF_CUTOFF).cast("timestamp")), "old_value")
    new = snap(ev, "new_value")
    return (
        new.join(old, "user_id", "left")
        .filter(
            F.col("old_value").isNull()
            | (F.col("old_value") != F.col("new_value"))
        )
        .select(
            "user_id",
            "old_value",
            "new_value",
            F.when(F.col("old_value").isNull(), F.lit("added"))
            .otherwise(F.lit("changed"))
            .alias("change_type"),
        )
    )


@register(
    "cms_heavy_hitters",
    oracle="""
WITH sketch AS (
  SELECT t.i AS sk_row,
         substr(md5(CAST(t.i AS VARCHAR) || ':' || CAST(user_id AS VARCHAR)), 1, 2) AS bucket,
         count(*) AS cnt
  FROM events CROSS JOIN range(0, 4) t(i)
  GROUP BY 1, 2
),
cand AS (SELECT DISTINCT user_id FROM events),
probes AS (
  SELECT c.user_id, t.i AS sk_row,
         substr(md5(CAST(t.i AS VARCHAR) || ':' || CAST(c.user_id AS VARCHAR)), 1, 2) AS bucket
  FROM cand c CROSS JOIN range(0, 4) t(i)
)
SELECT p.user_id, CAST(min(s.cnt) AS BIGINT) AS est_count
FROM probes p JOIN sketch s ON s.sk_row = p.sk_row AND s.bucket = p.bucket
GROUP BY 1 ORDER BY est_count DESC, user_id LIMIT 15
""",
)
def q_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters via a count-min sketch (operators/sketch.py): one
    pass folds every user_id into a 4×256 counter grid (map-side
    partials collapse the explode to ≤1024 rows per task before a tiny
    shuffle), then a candidate set probes the broadcast sketch with
    min-over-rows. At 100 TB the grid is the only state — mergeable by
    addition across days/clusters — and the probe is map-side whatever
    the candidate count. md5 bucketing (splits.py discipline) makes the
    sketch — and therefore every estimate, collisions included —
    bit-identical to the DuckDB oracle. Candidates here are the
    distinct keys so the oracle covers the whole key space; production
    would pass a shortlist."""
    from covid_data_challenge_spark.operators.sketch import cms_build, cms_estimate

    ev = _events(spark, sf_dir).select("user_id")
    sketch = cms_build(ev, "user_id", depth=4, hex_chars=2)
    cand = ev.distinct()
    est = cms_estimate(sketch, cand, "user_id", depth=4, hex_chars=2)
    return est.orderBy(F.col("est_count").desc(), "user_id").limit(15)


@register(
    "events_sliding_stream",
    oracle="""
WITH ex AS (
    SELECT event_type, value,
           unnest([time_bucket(INTERVAL 30 MINUTE, ts),
                   time_bucket(INTERVAL 30 MINUTE, ts) - INTERVAL 30 MINUTE]) AS window_start
    FROM events
)
SELECT window_start, event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       round(sum(value), 2) AS total_value
FROM ex GROUP BY 1, 2
""",
)
def q_events_sliding_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of events_sliding: watermarked hopping windows
    (1 h width, 30 min slide) drained via Trigger.AvailableNow into a
    memory sink — hash-matches the batch DuckDB oracle exactly, the
    streaming-equals-batch claim the engine makes for every window
    shape (streaming/events.py:streaming_sliding_counts)."""
    from covid_data_challenge_spark.streaming.events import (
        read_event_stream,
        run_to_memory_sink,
        streaming_sliding_counts,
    )

    stream = read_event_stream(spark, sf_dir)
    agg = streaming_sliding_counts(stream, width="1 hour", slide="30 minutes", watermark="2 hours")
    try:
        run_to_memory_sink(agg, "events_sliding_stream_sink")
    finally:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
    return spark.table("events_sliding_stream_sink")


@register(
    "events_dedup_stream",
    oracle="""
WITH d AS (SELECT DISTINCT ON (event_id) event_type FROM events ORDER BY event_id)
SELECT event_type, CAST(count(*) AS BIGINT) AS n_events
FROM d GROUP BY event_type
""",
)
def q_events_dedup_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-once event counts from an at-least-once source:
    dropDuplicatesWithinWatermark on event_id (bounded dedup state),
    then per-type counts — drained via Trigger.AvailableNow and
    hash-matched against the batch distinct. The synthetic feed has
    unique event_ids, so the dedup must be lossless — which is exactly
    the property worth pinning (a wrong watermark interaction silently
    drops rows; see the r2 NTZ incident)
    (streaming/events.py:streaming_dedup)."""
    from covid_data_challenge_spark.streaming.events import (
        read_event_stream,
        run_to_memory_sink,
        streaming_dedup,
    )

    stream = read_event_stream(spark, sf_dir)
    counts = (
        streaming_dedup(stream, keys=("event_id",), watermark="2 hours")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    )
    try:
        run_to_memory_sink(counts, "events_dedup_stream_sink", mode="complete")
    finally:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
    return spark.table("events_dedup_stream_sink")


@register(
    "events_enriched_stream",
    oracle="""
SELECT c.c_mktsegment AS mktsegment,
       CAST(count(*) AS BIGINT) AS n_events,
       round(sum(e.value), 2) AS total_value
FROM events e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY 1
""",
)
def q_events_enriched_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment: the event stream joins the customer
    dimension per micro-batch (no state — the dim is re-resolved each
    batch, the pattern for slowly-refreshing lookup tables), then
    aggregates per market segment; drained via AvailableNow and
    hash-matched against the batch join
    (streaming/events.py:streaming_enrich_with_static)."""
    from covid_data_challenge_spark.streaming.events import (
        read_event_stream,
        run_to_memory_sink,
        streaming_enrich_with_static,
    )

    dim = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    stream = read_event_stream(spark, sf_dir)
    enriched = streaming_enrich_with_static(stream, dim, key="user_id")
    counts = enriched.groupBy(F.col("c_mktsegment").alias("mktsegment")).agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )
    try:
        run_to_memory_sink(counts, "events_enriched_stream_sink", mode="complete")
    finally:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
    return spark.table("events_enriched_stream_sink")


@register(
    "value_quantile_sketch",
    oracle="""
WITH grid AS (
    SELECT event_type, CAST(floor(value / 5.0) AS BIGINT) AS bin, count(*) AS cnt
    FROM events GROUP BY 1, 2
),
cum AS (
    SELECT event_type, bin, cnt,
           sum(cnt) OVER (PARTITION BY event_type ORDER BY bin) AS cum,
           sum(cnt) OVER (PARTITION BY event_type) AS total
    FROM grid
),
qs AS (SELECT unnest([0.5, 0.95, 0.99]) AS q),
hit AS (
    SELECT event_type, q, bin, cnt, cum, total,
           row_number() OVER (PARTITION BY event_type, q ORDER BY bin) AS rn
    FROM cum CROSS JOIN qs
    WHERE cum >= q * total
)
SELECT event_type, q,
       round(bin * 5.0 + 5.0 * (q * total - (cum - cnt)) / cnt, 4) AS est
FROM hit WHERE rn = 1
""",
)
def q_value_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable fixed-bin quantile sketch (p50/p95/p99 of event value
    per type): the third sketch next to HLL-distinct and count-min —
    per-(group, bin) counts merge by addition across days/partitions/
    clusters, and the interpolated estimates replay bit-exactly in
    DuckDB because the grid is fixed, not adaptive
    (operators/sketch.py:quantile_sketch_build/estimate)."""
    from covid_data_challenge_spark.operators.sketch import (
        quantile_sketch_build,
        quantile_sketch_estimate,
    )

    events = _events(spark, sf_dir)
    grid = quantile_sketch_build(events, "event_type", "value", bin_width=5.0)
    return quantile_sketch_estimate(
        grid, "event_type", quantiles=[0.5, 0.95, 0.99], bin_width=5.0
    )


@register(
    "monthly_users_from_daily_sketches",
    oracle="""
SELECT strftime(ts, '%Y-%m') AS month,
       CAST(count(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_days_merged,
       CAST(count(DISTINCT user_id) AS BIGINT) AS approx_distinct
FROM events GROUP BY 1
""",
)
def q_monthly_users_from_daily_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sketch RE-AGGREGATION pattern end to end: per-day HLL
    sketches of user_id union into monthly distinct counts WITHOUT
    re-scanning the facts — at 100 TB you persist the tiny per-day
    sketch table once and answer any date-range distinct query by
    merging sketches (count(DISTINCT) would need the raw keys at every
    grain). Sparse-mode exactness at test cardinality (150 users ≪
    2^14/2) makes the estimate equal the exact count, so the merge
    chain itself — sketch → union → estimate — is hash-checked
    (operators/sketch.py)."""
    ev = _events(spark, sf_dir)
    daily = ev.groupBy(
        F.date_format("ts", "yyyy-MM").alias("month"),
        F.to_date("ts").alias("day"),
    ).agg(F.hll_sketch_agg("user_id", F.lit(14)).alias("sketch"))
    return daily.groupBy("month").agg(
        F.count(F.lit(1)).cast("long").alias("n_days_merged"),
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("approx_distinct"),
    )


#: md5-prefix thresholds for the deterministic synthetic change feed:
#: ~5% deletes, ~10% updates, ~5% inserts (same hex-prefix idiom as
#: operators/splits.py — engine-portable, reproducible on any layout).
_CDC_SALT = "cdc-v1"


_CDC_DEL, _CDC_UPD, _CDC_INS = "0ccccccc", "26666666", "33333333"


_CDC_INS_OFFSET = 100_000_000


@register(
    "cdc_upsert_apply",
    oracle=f"""
WITH base AS (
    SELECT o_orderkey,
           CAST(round(o_totalprice * 100) AS BIGINT) AS cents
    FROM orders
),
feed AS (
    SELECT o_orderkey, cents,
           substr(md5(CAST(o_orderkey AS VARCHAR) || '{_CDC_SALT}'), 1, 8) AS h
    FROM base
),
changes AS (
    SELECT CASE WHEN h >= '{_CDC_UPD}' THEN o_orderkey + {_CDC_INS_OFFSET}
                ELSE o_orderkey END AS o_orderkey,
           CASE WHEN h < '{_CDC_DEL}' THEN 'D'
                WHEN h < '{_CDC_UPD}' THEN 'U'
                ELSE 'I' END AS op,
           CASE WHEN h < '{_CDC_DEL}' THEN NULL
                WHEN h < '{_CDC_UPD}'
                    THEN CAST(floor((cents * 11 + 5) / 10) AS BIGINT)
                ELSE cents END AS new_cents
    FROM feed WHERE h < '{_CDC_INS}'
)
SELECT o_orderkey,
       coalesce(c.new_cents, b.cents) AS price_cents,
       CASE WHEN c.op = 'U' THEN 'updated'
            WHEN c.op = 'I' THEN 'inserted'
            ELSE 'kept' END AS action
FROM base b FULL OUTER JOIN changes c USING (o_orderkey)
WHERE c.op IS NULL OR c.op <> 'D'
""",
)
def q_cdc_upsert_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO without a table format: apply a change batch
    (inserts / updates / deletes) to a gold snapshot in one
    full-outer join — the lakehouse upsert Spark OSS lacks without
    Delta/Iceberg, expressed as a plan any engine can run. The change
    feed is synthesized deterministically from the snapshot itself
    (md5-prefix buckets: ~5% D / ~10% U / ~5% I, update = +10% in
    exact integer cents) so the apply is hash-checkable end to end.

    Scale shape: ONE shuffle join on the merge key — and with the
    snapshot stored bucketed on that key (sinks.write_bucketed_table)
    the base side's exchange disappears entirely, which is how a daily
    100 TB upsert stays bounded by the (much smaller) change batch.
    Deletes filter post-join; actions are emitted for audit parity with
    MERGE's matched/not-matched clauses."""
    base = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100)
        .cast("long")
        .alias("cents"),
    )
    h = F.substring(
        F.md5(F.concat(F.col("o_orderkey").cast("string"), F.lit(_CDC_SALT))),
        1,
        8,
    )
    feed = base.withColumn("h", h).filter(F.col("h") < _CDC_INS)
    changes = feed.select(
        F.when(F.col("h") >= _CDC_UPD, F.col("o_orderkey") + _CDC_INS_OFFSET)
        .otherwise(F.col("o_orderkey"))
        .alias("o_orderkey"),
        F.when(F.col("h") < _CDC_DEL, "D")
        .when(F.col("h") < _CDC_UPD, "U")
        .otherwise("I")
        .alias("op"),
        F.when(F.col("h") < _CDC_DEL, F.lit(None).cast("long"))
        .when(
            F.col("h") < _CDC_UPD,
            F.floor((F.col("cents") * 11 + 5) / 10).cast("long"),
        )
        .otherwise(F.col("cents"))
        .alias("new_cents"),
    )
    from covid_data_challenge_spark.operators.cdc import apply_changes

    return apply_changes(
        base, changes, "o_orderkey", "cents", "new_cents", "op"
    ).withColumnRenamed("cents", "price_cents")


# ---------------------------------------------------------------------------
# Round 4: streaming drift monitor — per-window PSI vs a static baseline
# ---------------------------------------------------------------------------

_SPSI_BINS = 10
_SPSI_WINDOW_S = 6 * 3600
from covid_data_challenge_spark.functions.pmath import portable_ln_sql_stages  # noqa: E402

_SPSI_STAGE, _SPSI_FINAL = portable_ln_sql_stages(
    {
        "l_p": "(cw + 1)",
        "l_q": "(cb + 1)",
        "l_nw": f"(nw + {_SPSI_BINS})",
        "l_nb": f"(nb + {_SPSI_BINS})",
    }
)


@register(
    "value_drift_psi_stream",
    oracle=f"""
WITH bounds AS (SELECT min(value) AS lo, max(value) AS hi FROM events),
binned AS (
    SELECT CAST(to_timestamp(
               CAST(floor(epoch(ts) / {_SPSI_WINDOW_S}) AS BIGINT)
               * {_SPSI_WINDOW_S})
             AS TIMESTAMP) AS window_start,
           CAST(least(floor(((value - b.lo) / (b.hi - b.lo)) * {_SPSI_BINS}.0),
                      {_SPSI_BINS - 1}.0) AS INT) AS bin
    FROM events CROSS JOIN bounds b
),
wcounts AS (
    SELECT window_start, bin, CAST(count(*) AS BIGINT) AS cw
    FROM binned GROUP BY 1, 2
),
base AS (SELECT bin, CAST(count(*) AS BIGINT) AS cb FROM binned GROUP BY bin),
nbtot AS (SELECT CAST(sum(cb) AS BIGINT) AS nb FROM base),
wins AS (SELECT window_start, CAST(sum(cw) AS BIGINT) AS nw FROM wcounts
         GROUP BY window_start),
grid AS (
    SELECT w.window_start, g.bin, w.nw, n.nb,
           coalesce(c.cw, 0) AS cw, coalesce(b.cb, 0) AS cb
    FROM wins w
    CROSS JOIN (SELECT CAST(unnest(range({_SPSI_BINS})) AS INT) AS bin) g
    CROSS JOIN nbtot n
    LEFT JOIN wcounts c ON c.window_start = w.window_start AND c.bin = g.bin
    LEFT JOIN base b ON b.bin = g.bin
),
staged AS (SELECT window_start, nw, cw, cb, nb, {_SPSI_STAGE} FROM grid),
lns AS (SELECT window_start, nw, cw, cb, nb, {_SPSI_FINAL} FROM staged),
units AS (
    SELECT window_start, nw,
           CAST(floor(1000000000.0 *
             (((CAST(cw + 1 AS DOUBLE) / CAST(nw + {_SPSI_BINS} AS DOUBLE))
               - (CAST(cb + 1 AS DOUBLE) / CAST(nb + {_SPSI_BINS} AS DOUBLE)))
              * ((((l_p) - (l_nw)) - (l_q)) + (l_nb)))) AS BIGINT) AS u
    FROM lns
)
SELECT window_start, CAST(max(nw) AS BIGINT) AS n_events,
       CAST(sum(u) AS BIGINT) / 1000000000.0 AS psi
FROM units GROUP BY window_start
""",
)
def q_value_drift_psi_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming drift monitor: the STREAM maintains watermarked 6-hour
    tumbling (window, value-bin) counts — bin bounds come from a static
    baseline gold frame via a stream-static join, the production
    pattern where the reference distribution is a published table — and
    the report layer computes each window's add-one-smoothed PSI
    against the corpus baseline over the maintained counts. Windows
    whose PSI crosses 0.25 are the alert rows; on this uniform
    synthetic feed every window sits near 0 by construction, which is
    the negative control. Drained with Trigger.AvailableNow and
    hash-matched against the batch twin, like every stream in this
    module. Stream state is (windows × 10 bins) counters, watermark-
    bounded; the PSI projection joins a 10-row grid and a 1-row total —
    nothing corpus-sized after the windowed aggregation."""
    from covid_data_challenge_spark.functions.pmath import portable_ln
    from covid_data_challenge_spark.streaming.events import (
        read_event_stream,
        run_to_memory_sink,
    )

    ev_static = load_table(spark, sf_dir, "events")
    # the baseline's bin bounds are a PUBLISHED config: one bounded
    # 1-row fetch, embedded as literals into the streaming expression
    # (a lateral stream⨯1-row join is not a streaming-supported shape;
    # a production monitor reads these two doubles from its config
    # store the same way). The doubles are exact parquet stats, so the
    # literal embedding is bit-identical to the oracle's bounds CTE.
    lo, hi = ev_static.agg(F.min("value"), F.max("value")).first()
    b = _SPSI_BINS

    def binc(lo_c, hi_c):
        return F.least(
            F.floor(
                ((F.col("value") - lo_c) / (hi_c - lo_c)) * F.lit(float(b))
            ),
            F.lit(float(b - 1)),
        ).cast("int")

    stream = read_event_stream(spark, sf_dir)
    wcounts_stream = (
        stream.withWatermark("ts", "2 hours")
        .select(F.col("ts"), binc(F.lit(lo), F.lit(hi)).alias("bin"))
        .groupBy(F.window("ts", f"{_SPSI_WINDOW_S} seconds"), "bin")
        .agg(F.count(F.lit(1)).cast("long").alias("cw"))
        .select(F.col("window.start").alias("window_start"), "bin", "cw")
    )
    try:
        run_to_memory_sink(wcounts_stream, "value_drift_psi_stream_sink")
    finally:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
    wcounts = spark.table("value_drift_psi_stream_sink")

    base = (
        ev_static.select(binc(F.lit(lo), F.lit(hi)).alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).cast("long").alias("cb"))
    )
    nb_tot = base.agg(F.sum("cb").cast("long").alias("nb"))
    # rename the join keys on each arm — wins and the count arm share
    # the memory-sink lineage, and a bare self-join on window_start
    # trips Catalyst's conflicting-attribute check
    wins = (
        wcounts.groupBy("window_start")
        .agg(F.sum("cw").cast("long").alias("nw"))
        .withColumnRenamed("window_start", "ws")
    )
    wc = wcounts.select(
        F.col("window_start").alias("c_ws"), F.col("bin").alias("c_bin"), "cw"
    )
    bs = base.select(F.col("bin").alias("b_bin"), "cb")
    grid = (
        wins.crossJoin(
            spark.range(0, b).select(F.col("id").cast("int").alias("bin"))
        )
        .join(F.broadcast(nb_tot))
        .join(
            wc,
            (F.col("ws") == F.col("c_ws")) & (F.col("bin") == F.col("c_bin")),
            "left",
        )
        .join(bs, F.col("bin") == F.col("b_bin"), "left")
        .select(
            F.col("ws").alias("window_start"),
            "bin",
            "nw",
            "nb",
            F.coalesce(F.col("cw"), F.lit(0)).alias("cw"),
            F.coalesce(F.col("cb"), F.lit(0)).alias("cb"),
        )
    )
    lnr = (
        (
            portable_ln(F.col("cw") + F.lit(1))
            - portable_ln(F.col("nw") + F.lit(b))
        )
        - portable_ln(F.col("cb") + F.lit(1))
    ) + portable_ln(F.col("nb") + F.lit(b))
    diff = (F.col("cw") + F.lit(1)).cast("double") / (
        F.col("nw") + F.lit(b)
    ).cast("double") - (F.col("cb") + F.lit(1)).cast("double") / (
        F.col("nb") + F.lit(b)
    ).cast("double")
    units = grid.select(
        "window_start",
        "nw",
        F.floor(F.lit(1e9) * (diff * lnr)).cast("long").alias("u"),
    )
    return units.groupBy("window_start").agg(
        F.max("nw").cast("long").alias("n_events"),
        (F.sum("u").cast("long") / F.lit(1e9)).alias("psi"),
    )


def _doc_screen_oracle() -> str:
    from covid_data_challenge_spark.queries_dedup import (
        _minhash_lsh_incremental_oracle,
    )

    return _minhash_lsh_incremental_oracle()


@register("doc_neardup_screen_stream", oracle=_doc_screen_oracle())
def q_doc_neardup_screen_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING ingest near-dup screen: incoming documents (a parquet
    file stream; doc_id % 5 = 0, the incremental-batch convention)
    MinHash-banded against the STATIC history index, hash-matching the
    batch twin's oracle (minhash_neardup_incremental) exactly.

    The signature stage uses the row-local
    operators/dedup.py:minhash_signature_expr — the whole per-document
    pipeline (shingle → md5 base hash → 32 affine permutations → band
    buckets) is map-side column algebra, so the only stateful streaming
    operator is the final (batch_doc, hist_doc) collision-dedup
    aggregate; candidates come from stream-static equi-joins against
    the history band/signature gold tables (localCheckpointed here; at
    100 TB they are the pre-built bucketed tables the batch twin's
    docstring describes, and the daily screen touches history only
    through these joins — never pairing history against itself)."""
    from covid_data_challenge_spark.operators.dedup import (
        minhash_bands,
        minhash_signature_expr,
        minhash_signatures,
    )
    from covid_data_challenge_spark.functions.text import tokens
    from covid_data_challenge_spark.streaming.events import (
        read_document_stream,
        run_to_memory_sink,
    )

    docs = load_table(spark, sf_dir, "documents")
    history = docs.filter(F.col("doc_id") % 5 != 0)
    sig_h = minhash_signatures(history, portable=True).localCheckpoint(eager=True)
    h_bands = minhash_bands(sig_h, portable=True).localCheckpoint(eager=True)

    stream = read_document_stream(spark, sf_dir).filter(F.col("doc_id") % 5 == 0)
    sigs = stream.filter(F.size(tokens(F.col("text"))) >= 3).select(
        F.col("doc_id").alias("batch_doc"),
        minhash_signature_expr(F.col("text")).alias("sig_a"),
    )
    rows_per_band, bands = 4, 8
    b_stream = sigs.select(
        "batch_doc",
        "sig_a",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.array(
                            *[
                                F.element_at("sig_a", b * rows_per_band + r + 1)
                                for r in range(rows_per_band)
                            ]
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("batch_doc", "sig_a", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    cand = b_stream.join(h_bands, ["band", "bucket"]).select(
        "batch_doc", "sig_a", F.col("id").alias("hist_doc")
    )
    sb = sig_h.select(
        F.col("doc_id").alias("hist_doc"), F.col("signature").alias("sig_b")
    )
    agree = F.size(
        F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda eq: eq)
    )
    scored = (
        cand.join(sb, "hist_doc")
        .withColumn("est_jaccard", F.round(agree / F.lit(32), 4))
        .filter(F.col("est_jaccard") >= 0.2)
    )
    result = scored.groupBy("batch_doc", "hist_doc").agg(
        F.max("est_jaccard").alias("est_jaccard")
    )
    run_to_memory_sink(result, "doc_neardup_screen_stream_sink", mode="complete")
    return spark.table("doc_neardup_screen_stream_sink")


def _hll_stream_oracle() -> str:
    """Batch twin of the streamed registers: per-source estimate +
    zero-register count (the exact-count columns belong to the batch
    query; the stream maintains only the register state)."""
    from covid_data_challenge_spark.functions.pmath import portable_ln_sql_stages
    from covid_data_challenge_spark.queries_shared import _NORM
    from covid_data_challenge_spark.queries_text import _HLL_M, _HLL_NUM, _HLL_Q

    st, fin = portable_ln_sql_stages(
        {"l_mv": f"({_HLL_M}.0 / CAST(greatest(v_zero, 1) AS DOUBLE))"}
    )
    return f"""
WITH tok AS (
    SELECT source, unnest(string_split({_NORM}, ' ')) AS w FROM documents
),
ranked AS (
    SELECT source,
           h >> {_HLL_Q} AS idx,
           CASE WHEN (h & {(1 << _HLL_Q) - 1}) = 0 THEN {_HLL_Q + 1}
                ELSE {_HLL_Q + 1} - length(bin(h & {(1 << _HLL_Q) - 1}))
           END AS rho
    FROM (SELECT source, CAST(('0x' || substr(md5(w), 1, 15)) AS BIGINT) AS h
          FROM tok)
),
regs AS (
    SELECT source, idx, CAST(max(rho) AS BIGINT) AS mj
    FROM ranked GROUP BY 1, 2
),
per AS (
    SELECT source,
           CAST({_HLL_M} - count(*) AS BIGINT) AS v_zero,
           CAST(sum(CAST(1 AS BIGINT) << CAST({_HLL_Q + 1} - mj AS INT))
                AS BIGINT) AS s_present
    FROM regs GROUP BY 1
),
raw AS (
    SELECT source, v_zero,
           CAST({_HLL_NUM!r} AS DOUBLE)
             / CAST(v_zero * (CAST(1 AS BIGINT) << {_HLL_Q + 1}) + s_present
                    AS DOUBLE) AS e_raw
    FROM per
),
stg AS (SELECT source, v_zero, e_raw, {st} FROM raw),
lns AS (SELECT source, v_zero, e_raw, {fin} FROM stg)
SELECT source,
       round(CASE WHEN e_raw <= {2.5 * _HLL_M!r} AND v_zero > 0
                  THEN {_HLL_M}.0 * l_mv ELSE e_raw END, 2) AS hll_estimate,
       v_zero AS n_zero_registers
FROM lns
"""


@register("hll_registers_stream", oracle=_hll_stream_oracle())
def q_hll_registers_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING HyperLogLog: the per-source register table maintained
    as Structured Streaming state — tokens hash map-side in the stream
    (the shared queries_text.hll_rho_cols expressions), and the ONLY
    stateful operator is `groupBy(source, idx).max(rho)`, whose state
    is bounded at 1024 rows per source FOREVER, whatever the stream
    volume (the register-merge property made updatable: max is the
    streaming-safe monotone aggregate). The estimate is computed over
    the drained register sink and hash-matches the BATCH twin exactly —
    register max is order- and batching-insensitive, the same argument
    the cms/quantile-grid stream updaters pin in pytest. Note the
    stream skips the batch query's (source, token) distinct: max over
    duplicate tokens is idempotent, so dedup before the register
    aggregate is unnecessary work in either engine."""
    from covid_data_challenge_spark.queries_text import (
        hll_estimate_from_regs,
        hll_rho_cols,
    )
    from covid_data_challenge_spark.functions.text import tokens
    from covid_data_challenge_spark.streaming.events import (
        read_document_stream,
        run_to_memory_sink,
    )

    stream = read_document_stream(spark, sf_dir)
    idx, rho = hll_rho_cols("w")
    regs = (
        stream.select("source", F.explode(tokens(F.col("text"))).alias("w"))
        .select("source", idx, rho)
        .groupBy("source", "idx")
        .agg(F.max("rho").cast("long").alias("mj"))
    )
    run_to_memory_sink(regs, "hll_registers_stream_sink", mode="complete")
    sunk = spark.table("hll_registers_stream_sink")
    return hll_estimate_from_regs(sunk).select(
        "source",
        F.round(F.col("e"), 2).alias("hll_estimate"),
        F.col("v_zero").alias("n_zero_registers"),
    )


# ---------------------------------------------------------------------------
# Streaming media ingest (r9) — the multimodal leg of the streaming
# family: encoded payloads arriving as parquet micro-batches are decoded
# through the SAME Arrow-batched magic-sniffing kernel the batch path
# runs (operators/multimodal.auto_features — mapInPandas is stateless,
# so it chains onto the streaming scan exactly as onto a batch scan),
# then aggregated per kind with an integer-scaled feature checksum. The
# oracle is the committed decode golden aggregated in DuckDB — the
# stream must land bit-exactly where the batch decode landed.
# ---------------------------------------------------------------------------

@register(
    "media_decode_stream",
    oracle="""
WITH per_media AS (
    SELECT media_id, kind,
           max(n_bytes) AS n_bytes,
           bool_or(decoded) AS decoded,
           coalesce(sum(CAST(floor(1e6 * feat_value) AS BIGINT)), 0) AS cs
    FROM read_parquet('{fixtures}/media_corpus_features_golden.parquet')
    GROUP BY media_id, kind
)
SELECT kind, CAST(count(*) AS BIGINT) AS n_media,
       CAST(sum(CASE WHEN decoded THEN 1 ELSE 0 END) AS BIGINT) AS n_decoded,
       CAST(sum(n_bytes) AS BIGINT) AS n_bytes_sum,
       CAST(sum(cs) AS BIGINT) AS feat_checksum
FROM per_media GROUP BY kind
""".format(fixtures=str(Path(__file__).resolve().parent / "fixtures")),
)
def q_media_decode_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming decode of the sf-scaled media corpus: build/refresh the
    gold table (the batch landing step), then stream it back as parquet
    micro-batches → mapInPandas auto-decode → per-kind aggregate with a
    micro-scaled integer feature checksum (order-independent, so the
    complete-mode memory sink hash-matches the batch golden exactly).
    The quarantine rows stay visible as n_media − n_decoded. Scale
    shape: the decode stage is stateless and shuffle-free per
    micro-batch; only the tiny per-kind aggregate carries state."""
    from covid_data_challenge_spark.operators.media_corpus import (
        _gold_path,
        media_corpus,
    )
    from covid_data_challenge_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        extract_features,
    )
    from covid_data_challenge_spark.streaming.events import run_to_memory_sink

    media_corpus(spark, sf_dir)  # ensure the gold table exists/is fresh
    # the r10 mtime-keyed versioned path (the pre-r10 fixed name would
    # miss the atomically-published directory)
    stream = spark.readStream.schema(MEDIA_SCHEMA).parquet(_gold_path(sf_dir))
    feats = extract_features(stream, decoder="auto")
    cs = F.coalesce(
        F.aggregate(
            F.col("features"),
            F.lit(0).cast("long"),
            lambda acc, x: acc + F.floor(F.lit(1e6) * x).cast("long"),
        ),
        F.lit(0).cast("long"),
    )
    per_media = feats.select(
        "kind",
        "n_bytes",
        F.col("features").isNotNull().alias("decoded"),
        cs.alias("__cs"),
    )
    agg = per_media.groupBy("kind").agg(
        F.count(F.lit(1)).cast("long").alias("n_media"),
        F.sum(F.when(F.col("decoded"), 1).otherwise(0)).cast("long").alias("n_decoded"),
        F.sum("n_bytes").cast("long").alias("n_bytes_sum"),
        F.sum("__cs").cast("long").alias("feat_checksum"),
    )
    run_to_memory_sink(agg, "media_decode_stream_sink")
    return spark.table("media_decode_stream_sink")


@register(
    "media_incremental_phash_screen_stream",
    oracle="""
SELECT batch_id, hist_id, hamming
FROM read_parquet('{fixtures}/media_incremental_phash_golden.parquet')
""".format(fixtures=str(Path(__file__).resolve().parent / "fixtures")),
)
def q_media_incremental_phash_screen_stream(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """STREAMING twin of the incremental pHash media screen (r12 —
    VERDICT r11 next-round #6: the incremental media screens had no
    streaming leg): the synthetic ingest batch lands once as a parquet
    directory (atomic publish, mtime-tagged beside the other media
    golds), arrives as Structured Streaming micro-batches, is hashed by
    the SAME Arrow mapInPandas pHash stage, banded by the SAME shared
    band expression (operators/media_incremental.phash_bands — one
    implementation, so stream == batch band-exact), and equi-joins the
    STATIC history gold per micro-batch (stream-static join: the
    static side re-resolves each batch, never buffers). The only
    stateful operator is the final (batch_id, hist_id) collision-dedup
    aggregate — min(hamming), identical values to the batch twin's
    distinct since a pair's hamming is band-independent. Hash-matches
    the batch twin's committed golden exactly.

    Scale shape: per micro-batch the work is the batch leg's plan with
    the broadcast direction decided by the planner; history is never
    re-fingerprinted (the gold is the pre-built index) and never
    self-joined; state is bounded by true collision pairs."""
    from covid_data_challenge_spark.operators.media_corpus import (
        _gold_base,
        atomic_publish_gold,
        gold_tag,
    )
    from covid_data_challenge_spark.operators.media_incremental import (
        phash_bands,
        phash_gold,
        synth_media_batch,
    )
    from covid_data_challenge_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        phash_hashes,
    )
    from covid_data_challenge_spark.streaming.events import run_to_memory_sink

    hist = phash_gold(spark, sf_dir)
    # land the deterministic ingest batch as the stream source (its own
    # gold family: build-once, atomically published, tag-invalidated)
    src = f"{_gold_base(sf_dir)}/image_batch_src-{gold_tag(sf_dir)}.parquet"
    atomic_publish_gold(
        src,
        lambda tmp: synth_media_batch(spark, "image")
        .write.mode("overwrite")
        .parquet(tmp),
    )
    stream = spark.readStream.schema(MEDIA_SCHEMA).parquet(src)
    batch = phash_hashes(stream).filter(F.col("decoded"))
    b = phash_bands(batch, "batch_id", "__hb")
    h = phash_bands(hist, "hist_id", "__hh")
    ham = F.bit_count(F.col("__hh").bitwiseXOR(F.col("__hb")))
    scored = (
        b.join(h, ["band", "val"])
        .select("batch_id", "hist_id", ham.cast("int").alias("hamming"))
        .filter(F.col("hamming") <= 6)
    )
    result = scored.groupBy("batch_id", "hist_id").agg(
        F.min("hamming").alias("hamming")
    )
    run_to_memory_sink(
        result, "media_incremental_phash_screen_stream_sink", mode="complete"
    )
    return spark.table("media_incremental_phash_screen_stream_sink")


@register(
    "media_incremental_image_tile_screen_stream",
    oracle="""
SELECT batch_id, hist_id, dx, dy, overlap, hamming
FROM read_parquet('{fixtures}/media_incremental_image_tile_golden.parquet')
""".format(fixtures=str(Path(__file__).resolve().parent / "fixtures")),
)
def q_media_incremental_image_tile_screen_stream(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """STREAMING twin of the crop/pad-tolerant tile screen (r12 —
    completing VERDICT r11 #6 for the 2-D family): the tile ingest
    batch lands once as a parquet directory, streams in micro-batches
    through the SAME Arrow tiled-pHash stage, explodes per-tile word
    rows via the SAME _tile_sides/_tile_match machinery as the batch
    twin (word equi-join against the static history tile gold with the
    history document-frequency prune — both static computations
    re-resolve per micro-batch), and keeps ONE stateful operator: the
    per-pair best-alignment min_by aggregate. Hash-matches the batch
    twin's committed brute-force golden (hop-grid offsets)."""
    from covid_data_challenge_spark.operators.media_corpus import (
        _gold_base,
        atomic_publish_gold,
        gold_tag,
    )
    from covid_data_challenge_spark.operators.media_incremental import (
        tile_phash_gold,
    )
    from covid_data_challenge_spark.operators.multimodal import MEDIA_SCHEMA
    from covid_data_challenge_spark.operators.tilehash import (
        synth_media_tile_batch,
        tile_phash_incremental_pairs,
        tile_phash_table,
    )
    from covid_data_challenge_spark.streaming.events import run_to_memory_sink

    hist = tile_phash_gold(spark, sf_dir)
    src = f"{_gold_base(sf_dir)}/image_tile_batch_src-{gold_tag(sf_dir)}.parquet"
    atomic_publish_gold(
        src,
        lambda tmp: synth_media_tile_batch(spark)
        .write.mode("overwrite")
        .parquet(tmp),
    )
    stream = spark.readStream.schema(MEDIA_SCHEMA).parquet(src)
    batch = tile_phash_table(stream).filter(F.col("decoded"))
    result = tile_phash_incremental_pairs(
        hist, batch,
        max_shift=4, max_bits_per_tile=4, min_overlap=9, max_band_freq=64,
        stream_batch=True,
    )
    run_to_memory_sink(
        result, "media_incremental_image_tile_screen_stream_sink",
        mode="complete",
    )
    return spark.table("media_incremental_image_tile_screen_stream_sink")
