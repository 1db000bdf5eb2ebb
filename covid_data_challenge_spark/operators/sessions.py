"""Event-time windowing and sessionization over event streams (batch
form; streaming variants live in covid_data_challenge_spark.streaming).

The reference has no streaming surface (SURVEY.md §2.9) — these extend
the engine to the event-analytics shapes the driver's ``events`` table
exercises. All are single-shuffle plans:

- tumbling/sliding aggregation: ``F.window`` assigns buckets scan-side;
  the only shuffle is the groupBy on (window, key).
- sessionization: gaps-and-islands with two window functions over one
  hash-partition by user — the classic distributed formulation; identical
  SQL runs on the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def tumbling_agg(
    events: DataFrame,
    ts_col: str = "ts",
    width: str = "1 hour",
    keys: tuple[str, ...] = ("event_type",),
) -> DataFrame:
    """Tumbling event-time windows: count + value sum per (window, key)."""
    return (
        events.groupBy(F.window(F.col(ts_col), width).alias("w"), *keys)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), *keys, "n_events", "total_value")
    )


def sliding_agg(
    events: DataFrame,
    ts_col: str = "ts",
    width: str = "1 hour",
    slide: str = "30 minutes",
    keys: tuple[str, ...] = ("event_type",),
) -> DataFrame:
    """Sliding (hopping) windows — each event lands in width/slide
    buckets; Spark materializes the bucket list scan-side, no self-join."""
    return (
        events.groupBy(F.window(F.col(ts_col), width, slide).alias("w"), *keys)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), *keys, "n_events", "total_value")
    )


def session_index(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
    tie_breakers: tuple[str, ...] = ("event_id",),
) -> DataFrame:
    """Events + ``__session_idx``: the gaps-and-islands assignment that
    every session-grain operator shares (one hash partition by user, two
    window passes, deterministic via tie-breaks)."""
    order = [F.col(ts_col), *[F.col(c) for c in tie_breakers]]
    w_user = Window.partitionBy(user_col).orderBy(*order)
    gap_s = gap_minutes * 60
    is_new = (
        F.when(
            F.col(ts_col).cast("double") - F.lag(F.col(ts_col)).over(w_user).cast("double")
            > gap_s,
            1,
        )
        .otherwise(0)
    )
    return events.withColumn(
        "__session_idx",
        F.sum(is_new).over(w_user.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
    tie_breakers: tuple[str, ...] = ("event_id",),
) -> DataFrame:
    """Gap-based sessionization (gaps-and-islands).

    A new session starts when the gap to the previous event of the same
    user exceeds ``gap_minutes``. Output grain: one row per session with
    start/end/count/value. Deterministic via event-id tie-breaks.
    """
    numbered = session_index(events, user_col, ts_col, gap_minutes, tie_breakers)
    return (
        numbered.groupBy(user_col, "__session_idx")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .withColumn("session_idx", F.col("__session_idx").cast("long"))
        .drop("__session_idx")
    )


def session_paths(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    gap_minutes: int = 30,
    max_len: int = 5,
    k: int = 10,
) -> DataFrame:
    """Top-k in-session event sequences (path analysis): the ordered
    prefix of each session's event types, counted across sessions.

    The per-session ordering happens INSIDE the aggregation —
    collect_list(struct(ts, tie, type)) then array_sort — so the second
    shuffle moves one row per session, not per event, and no window sort
    runs over the raw events beyond the shared session_index pass.
    ``max_len`` caps the path prefix, bounding both string size and
    distinct-path cardinality at 100 TB. Deterministic: struct sort ties
    break on event_id, top-k ties break on path string.
    """
    numbered = session_index(events, user_col, ts_col, gap_minutes)
    paths = numbered.groupBy(user_col, "__session_idx").agg(
        F.concat_ws(
            ">",
            F.slice(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(ts_col, "event_id", type_col))
                    ),
                    lambda x: x[type_col],
                ),
                1,
                max_len,
            ),
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.countDistinct(user_col).alias("n_users"),
        )
        .orderBy(F.col("n_sessions").desc(), "path")
        .limit(k)
    )


def concurrent_peak_by_day(
    sessions: DataFrame,
    start_col: str = "session_start",
    end_col: str = "session_end",
) -> DataFrame:
    """Per-day peak number of concurrently active sessions → (day,
    peak_concurrent) — the capacity-planning staple (max simultaneous
    users/connections/streams).

    Classic sweep-line, distributed: each session [start, end]
    (inclusive) is split into per-day segments (explode of the day
    sequence, clipped to day bounds), each segment emits a +1 at its
    start and a −1 at its end, and a running sum ordered by
    (ts, +1-before-−1) within each day is the instantaneous concurrency;
    the day's max is the peak.

    Why partition by day instead of one global sweep: a single ordered
    running sum is an all-data single-partition sort. Midnight-clipping
    makes every day's sweep self-contained (sessions alive at 00:00
    emit their +1 at 00:00), so days sweep independently and in
    parallel — the sweep scales with days × sessions-per-day, and a
    hot day can be salted further by hour with the same construction.
    Determinism: +1s sort before −1s at equal ts (delta desc), so a
    session ending exactly when another starts counts both — and the
    prefix-max is invariant to the order of equal (ts, delta) rows.
    """
    day_ts = F.col("day").cast("timestamp")
    next_day_end = F.col("day").cast("timestamp") + F.expr(
        "INTERVAL 1 DAY - INTERVAL 1 MICROSECOND"
    )
    seg = sessions.select(
        F.explode(
            F.sequence(F.to_date(start_col), F.to_date(end_col))
        ).alias("day"),
        F.col(start_col).alias("__s"),
        F.col(end_col).alias("__e"),
    ).select(
        "day",
        F.greatest(F.col("__s"), day_ts).alias("seg_start"),
        F.least(F.col("__e"), next_day_end).alias("seg_end"),
    )
    points = seg.select(
        "day", F.col("seg_start").alias("ts"), F.lit(1).alias("delta")
    ).unionByName(
        seg.select("day", F.col("seg_end").alias("ts"), F.lit(-1).alias("delta"))
    )
    w = (
        Window.partitionBy("day")
        .orderBy(F.col("ts").asc(), F.col("delta").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        points.withColumn("__running", F.sum("delta").over(w))
        .groupBy("day")
        .agg(F.max("__running").cast("long").alias("peak_concurrent"))
    )
