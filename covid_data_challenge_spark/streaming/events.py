"""Structured Streaming variants of the event-analytics operators.

The reference is strictly batch (SURVEY.md §2.9) — its "current snapshot"
source is a once-per-run REST fetch. This module models the refresh as a
stream: the same transformations as operators/sessions.py, expressed as
``readStream → withWatermark → window/session_window → sink``, so one
logical operator surface serves both batch and streaming.

Scale/latency notes:
- watermarks bound state: late events beyond the horizon are dropped and
  window state is evicted — mandatory for unbounded runs at cluster scale;
- ``dropDuplicatesWithinWatermark`` gives at-least-once sources exactly-
  once window counts with bounded dedup state;
- ``session_window`` is Spark's native gap-session operator (merges
  micro-batch partials; equivalent to the batch gaps-and-islands
  formulation when event time is honored).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

def _events_stream_schema(ts_type: T.DataType) -> T.StructType:
    return T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", ts_type),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )


#: File-stream schema for the nanos layout of the events table (``ts``
#: shipped as TIMESTAMP(NANOS) parquet → declared long and converted).
EVENTS_STREAM_SCHEMA = _events_stream_schema(T.LongType())


def read_event_stream(spark: SparkSession, directory: str, glob: str = "events.parquet") -> DataFrame:
    """Parquet file stream over the events table (new files in
    ``directory`` matching ``glob`` become micro-batches).

    The driver has shipped ``ts`` both as TIMESTAMP(NANOS) — unreadable
    as a timestamp by Spark, so declared long (nanos) and truncated to µs
    exactly like the batch reader (sources/readers.py) — and as naive
    TIMESTAMP(MICROS). File streams take a *declared* schema, so a wrong
    guess doesn't error: the nanos schema would silently misparse µs
    values into 1970 wall-clocks and the watermark would eat the data.
    A one-off batch probe of the same files picks the right layout; an
    empty/new stream directory (nothing to probe — AnalysisException)
    falls back to the µs schema, the driver's current layout. The
    ``nanosAsLong`` conf is restored to its pre-call value on the
    non-nanos paths rather than hardcoded, so a caller-pinned setting
    survives; on the nanos path it must stay ``true`` for the stream's
    lifetime (the file-stream scan itself needs it)."""
    ts_kind = None
    prior = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", None)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    try:
        probe = spark.read.option("pathGlobFilter", glob).parquet(directory)
        ts_kind = dict(probe.dtypes).get("ts")
    except Exception:
        ts_kind = None  # empty/new directory: no files to probe yet
    finally:
        if ts_kind != "bigint":
            if prior is None:
                spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
            else:
                spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", prior)
    if ts_kind == "bigint":
        raw = (
            spark.readStream.schema(EVENTS_STREAM_SCHEMA)
            .option("pathGlobFilter", glob)
            .parquet(directory)
        )
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    # µs layout: declare TimestampType outright — the scan yields
    # session-tz TIMESTAMP (UTC session ⇒ oracle wall-clock), watermarkable.
    return (
        spark.readStream.schema(_events_stream_schema(T.TimestampType()))
        .option("pathGlobFilter", glob)
        .parquet(directory)
    )


def streaming_tumbling_counts(
    events: DataFrame,
    width: str = "1 hour",
    watermark: str = "2 hours",
    keys: tuple[str, ...] = ("event_type",),
) -> DataFrame:
    """Watermarked tumbling-window aggregation — streaming twin of
    operators.sessions.tumbling_agg (append-mode capable)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window(F.col("ts"), width).alias("w"), *keys)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), *keys, "n_events", "total_value")
    )


def streaming_sliding_counts(
    events: DataFrame,
    width: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "2 hours",
    keys: tuple[str, ...] = ("event_type",),
) -> DataFrame:
    """Watermarked sliding (hopping) window aggregation — streaming twin
    of operators.sessions.sliding_agg. Each event lands in
    width/slide overlapping windows; the watermark bounds how many
    window panes stay open per key."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window(F.col("ts"), width, slide).alias("w"), *keys)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), *keys, "n_events", "total_value")
    )


def streaming_dedup(
    events: DataFrame,
    keys: tuple[str, ...] = ("event_id",),
    watermark: str = "2 hours",
) -> DataFrame:
    """Exactly-once event feed from an at-least-once source: duplicates
    within the watermark horizon are dropped with bounded state."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(list(keys))


def streaming_sessionize(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Native gap-session aggregation per user (session_window merges
    partial sessions across micro-batches)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window(F.col("ts"), gap).alias("sw"), F.col("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("user_id"),
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


def streaming_click_purchase_join(
    clicks: DataFrame,
    purchases: DataFrame,
    horizon: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked stream-stream inner join: each purchase pairs with the
    same user's clicks in the trailing ``horizon``. Both sides carry a
    watermark and the join condition bounds event-time distance, so Spark
    evicts buffered state once the watermark passes — without the time
    bound, stream-stream join state grows forever. Append-mode output.

    Input frames must be pre-projected with disambiguated column names
    (``click_ts`` / ``purchase_ts``)."""
    c = clicks.withWatermark("click_ts", watermark)
    p = purchases.withWatermark("purchase_ts", watermark)
    cond = (
        (F.col("c.user_id") == F.col("p.user_id"))
        & (F.col("click_ts") >= F.col("purchase_ts") - F.expr(f"interval {horizon}"))
        & (F.col("click_ts") < F.col("purchase_ts"))
    )
    return (
        p.alias("p")
        .join(c.alias("c"), cond)
        .select(
            F.col("p.event_id").alias("purchase_id"),
            F.col("p.user_id").alias("user_id"),
            "purchase_ts",
            F.col("c.event_id").alias("click_id"),
            "click_ts",
            F.round(F.col("p.value"), 2).alias("purchase_value"),
        )
    )


def run_to_memory_sink(
    stream_df: DataFrame, table_name: str, timeout_s: int = 120, mode: str | None = None
):
    """Execute a streaming query over all currently-available data
    (Trigger.AvailableNow) into an in-memory table; returns the query
    after completion. Test/driver harness helper — production sinks would
    be kafka/parquet/delta with checkpointing. ``mode`` overrides the
    inferred output mode (custom stateful ops declare their own)."""
    if mode is None:
        mode = "complete" if _has_aggregation(stream_df) else "append"
    q = (
        stream_df.writeStream.format("memory")
        .queryName(table_name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_s)
    return q


def _has_aggregation(df: DataFrame) -> bool:
    return "Aggregate" in df._jdf.queryExecution().analyzed().toString()


def streaming_enrich_with_static(
    events: DataFrame, dim: DataFrame, key: str = "user_id"
) -> DataFrame:
    """Stream-static enrichment join: each micro-batch joins against the
    (slowly-changing) static dimension — no watermark needed, because
    the static side is re-resolved per micro-batch, not buffered as
    state. The planner broadcasts the dim when it fits; at 100 TB the
    dim side becomes a bucketed gold table so each micro-batch joins
    shuffle-free."""
    return events.join(dim, key, "left")


def read_document_stream(
    spark: SparkSession, directory: str, glob: str = "documents.parquet"
) -> DataFrame:
    """Parquet file stream over the documents table (new corpus files
    in ``directory`` become micro-batches — the ingest feed for the
    streaming near-dup screen). File streams need a declared schema; a
    one-off batch probe of the current files supplies it, and an
    empty/new directory falls back to the canonical documents layout."""
    try:
        schema = (
            spark.read.option("pathGlobFilter", glob).parquet(directory).schema
        )
    except Exception:
        from pyspark.sql import types as T

        schema = T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("text", T.StringType()),
                T.StructField("lang", T.StringType()),
                T.StructField("source", T.StringType()),
                T.StructField("n_chars", T.LongType()),
            ]
        )
    return (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", glob)
        .parquet(directory)
    )
