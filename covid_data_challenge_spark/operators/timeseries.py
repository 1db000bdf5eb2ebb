"""Time-series scaffold + interpolation operators.

The reference's only imputation is per-group forward-fill
(data_cleaner.py:174-186); a real time-series pipeline also needs the
stronger form: a complete per-key daily scaffold with LINEAR
interpolation across interior gaps. Spark-first shape:

- the scaffold is ``sequence(min_day, max_day)`` + ``explode`` — a
  map-side generate, O(keys × span-days) rows, independent of event
  volume;
- the bracketing observations come from two one-pass window frames
  (trailing ``last ignorenulls``, leading ``first ignorenulls``) over
  ONE user_id partitioning — no self-join, no collect;
- boundary days are observed by construction (the scaffold spans
  [min(day), max(day)] of *observed* days), so every interpolated day
  is bracketed and the division is never by zero.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def gapfill_interpolate(
    daily: DataFrame,
    key: str = "user_id",
    day: str = "day",
    val: str = "v",
    round_to: int = 4,
) -> DataFrame:
    """Complete ``daily``'s per-``key`` date range and linearly
    interpolate missing days.

    ``daily`` must hold at most one row per (key, day). Returns
    (key, day, value_filled, interpolated)."""
    bounds = daily.groupBy(key).agg(
        F.min(day).alias("d0"), F.max(day).alias("d1")
    )
    scaffold = bounds.select(
        key,
        F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias(day),
    )
    joined = scaffold.join(daily, [key, day], "left")
    w_prev = (
        Window.partitionBy(key)
        .orderBy(day)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_next = (
        Window.partitionBy(key)
        .orderBy(day)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_day = F.when(F.col(val).isNotNull(), F.col(day))
    prev_v = F.last(val, ignorenulls=True).over(w_prev)
    prev_day = F.last(obs_day, ignorenulls=True).over(w_prev)
    next_v = F.first(val, ignorenulls=True).over(w_next)
    next_day = F.first(obs_day, ignorenulls=True).over(w_next)
    interp = prev_v + (next_v - prev_v) * F.datediff(
        F.col(day), prev_day
    ) / F.datediff(next_day, prev_day)
    return joined.select(
        key,
        day,
        F.round(F.coalesce(F.col(val), interp), round_to).alias("value_filled"),
        F.col(val).isNull().alias("interpolated"),
    )
