"""Temporal alignment operators (SURVEY.md §2.4 A6, A11–A14; §2.5 W3).

The reference aligns a time-series table to snapshot grain by taking the
latest row per entity (data_merger.py:83-98) and computes trailing-window
trend metrics with a per-entity Python loop (data_merger.py:136-218).
Both become single shuffle-stage DataFrame plans here:

- ``latest_per_key``: ONE ``groupBy().agg(max_by(row, order))`` —
  argmax as a hash aggregate with map-side partials, no sort anywhere
  (r6: replaced the window + WindowGroupLimit form, which still paid a
  full per-partition sort of the input before its partial top-1 — the
  agg form measured 2× faster at 10× data with growth 1.35×→1.05×).
  Explicit tie-breaks replace the reference's reliance on pre-sorted
  frame order ("last" aggregation) — order-dependence does not survive
  a distributed shuffle.
- ``trend_metrics``: ONE ``groupBy().agg`` with ``min_by``/``max_by``/
  ``avg``/``count`` — map-side partial aggregation, a single shuffle on the
  group key, no Python in the loop. At 100 TB this is the shape you want:
  the window-filter prunes to the trailing N days *before* the shuffle.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def latest_per_key(
    df: DataFrame,
    keys: str | Sequence[str],
    order_col: str,
    tie_breakers: Sequence[str] = (),
    desc: bool = True,
) -> DataFrame:
    """Latest (or earliest) full row per key — argmax by ``order_col``.

    Deterministic: ties on ``order_col`` are broken by ``tie_breakers``
    (same direction), so the result is stable across partitionings and
    engines — unlike the reference's frame-order "last"
    (data_merger.py:85-96).

    Shape: ``max_by(struct(all columns), struct(order, *ties))`` (or
    ``min_by`` for earliest) under one ``groupBy`` — a hash aggregate
    whose map-side partial keeps one candidate row per key per task, so
    the shuffle moves ~|keys| rows and NOTHING is ever sorted. The
    previous window + rank-limit form still sorted every input
    partition before its partial top-1; at 10× data the agg form
    measured 0.91 s vs 1.80 s with growth 1.05× vs 1.35× (VERDICT r5
    watch item). Struct comparison puts a null field before non-null,
    which coincides with the window form's ``DESC NULLS LAST`` /
    ``ASC NULLS FIRST`` defaults, so top-1 semantics are unchanged —
    pinned by the pandas-argmax property test and the driver oracle.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    order = F.struct(order_col, *tie_breakers)
    pick = F.max_by if desc else F.min_by
    return (
        df.groupBy(*keys)
        .agg(pick(F.struct(*df.columns), order).alias("__row"))
        .select("__row.*")
    )


def trailing_window(df: DataFrame, ts_col: str, days: int) -> DataFrame:
    """Keep rows within ``days`` of the table's max timestamp (W3,
    data_merger.py:136-142).

    The scalar max is computed as a 1-row aggregate and broadcast-joined
    (cross join of a single row) — no driver collect, stays lazy, and the
    resulting predicate can still prune partitions when the source is
    date-partitioned.
    """
    max_ts = df.agg(F.max(ts_col).alias("__max_ts"))
    return (
        df.join(F.broadcast(max_ts))
        .filter(F.col(ts_col) >= F.date_sub(F.col("__max_ts"), days))
        .drop("__max_ts")
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: str,
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str],
    suffix: str = "_asof",
    direction: str = "backward",
) -> DataFrame:
    """Distributed as-of join: for every left row, the latest right row
    with ``right_ts <= left_ts`` (``direction="backward"``, default) or
    the earliest right row with ``right_ts >= left_ts``
    (``direction="forward"``) within the same ``by`` key (left outer —
    unmatched left rows keep NULLs).

    Spark has no native ASOF JOIN (DuckDB/kdb do); a naive inequality
    join is a nested-loop O(n·m) per key. This is the scalable
    formulation: tag and union both sides, ONE window pass per key
    ordered by (ts, side) — descending for forward — carrying the right
    values with ``last(ignorenulls)``, then keep the left rows. Cost =
    one shuffle on ``by`` — identical shape to any other window op, so
    it survives any scale-up. Ties (right_ts == left_ts) match in both
    directions, right-before-left at equal ts; the right side must be
    unique per (by, ts) for deterministic results — pre-reduce with
    :func:`latest_per_key`.

    Output: all left columns + ``<right_ts><suffix>`` + each value col as
    ``<col><suffix>``.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be 'backward' or 'forward', got {direction!r}")
    lcols = left.columns
    l = left.select(
        F.col(by).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in value_cols],
        F.lit(None).cast(right.schema[right_ts].dataType).alias("__r_ts"),
    )
    r = right.select(
        F.col(by).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        *[F.col(c).alias(f"__r_{c}") for c in value_cols],
        F.col(right_ts).alias("__r_ts"),
    )
    ts_order = F.col("__ts").asc() if direction == "backward" else F.col("__ts").desc()
    w = (
        Window.partitionBy("__k")
        .orderBy(ts_order, F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = l.unionByName(r).select(
        *lcols,
        "__side",
        F.last("__r_ts", ignorenulls=True).over(w).alias(f"{right_ts}{suffix}"),
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"{c}{suffix}")
            for c in value_cols
        ],
    )
    return filled.filter(F.col("__side") == 1).drop("__side")


def trend_metrics(
    df: DataFrame,
    keys: str | Sequence[str],
    ts_col: str,
    value_cols: Sequence[str],
    rate_cols: Sequence[str] = (),
    window_days: int | None = 30,
    min_points: int = 2,
    tie_breakers: Sequence[str] = (),
) -> DataFrame:
    """Per-key trailing-window trend aggregation (A11–A14).

    Replaces the reference's per-country Python loop (data_merger.py:146-218)
    with one aggregation pass producing, per key:

    - ``data_points_available`` — row count in window (A10)
    - per value col: ``first_<c>`` / ``last_<c>`` (min_by/max_by on the
      timestamp with tie-breaks, NULL→0 like the reference's ``fillna(0)``),
      ``<c>_change`` and ``<c>_change_percent`` (A13)
    - per rate col: ``avg_daily_<c>`` (A11)

    Groups with fewer than ``min_points`` rows are dropped (HAVING, A14).
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    if window_days is not None:
        df = trailing_window(df, ts_col, window_days)

    # Composite ordering struct gives min_by/max_by a total order even when
    # timestamps tie (multiple rows per key per day).
    order_expr = F.struct(*[F.col(c) for c in (ts_col, *tie_breakers)])

    aggs: list[Column] = [F.count(F.lit(1)).alias("data_points_available")]
    for c in value_cols:
        aggs.append(F.coalesce(F.min_by(F.col(c), order_expr), F.lit(0.0)).alias(f"first_{c}"))
        aggs.append(F.coalesce(F.max_by(F.col(c), order_expr), F.lit(0.0)).alias(f"last_{c}"))
    for c in rate_cols:
        aggs.append(F.round(F.avg(F.col(c)), 2).alias(f"avg_daily_{c}"))

    out = df.groupBy(*keys).agg(*aggs)
    for c in value_cols:
        first, last = F.col(f"first_{c}"), F.col(f"last_{c}")
        out = out.withColumn(f"{c}_change", F.round(last - first, 2)).withColumn(
            f"{c}_change_percent",
            F.when(first > 0, F.round((last - first) / first * 100, 2)).otherwise(F.lit(0.0)),
        )
    return out.filter(F.col("data_points_available") >= min_points)


def trend_metrics_pandas(
    df: DataFrame,
    keys: str | Sequence[str],
    ts_col: str,
    value_col: str,
    min_points: int = 2,
) -> DataFrame:
    """SURVEY §2.10's escape hatch, demonstrated: the same per-group trend
    reduction as :func:`trend_metrics`, but as an Arrow-batched
    ``applyInPandas`` grouped-map — the route to exact pandas NaN-edge
    semantics if a parity corner ever demands it. The native
    ``groupBy().agg`` version is the production path (map-side combine;
    this one ships whole groups); equality of the two is pinned in
    pytest."""
    import pandas as pd

    keys = [keys] if isinstance(keys, str) else list(keys)

    def reduce_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([ts_col])
        if len(pdf) < min_points:
            return pd.DataFrame(columns=[*keys, "data_points_available", "first_v", "last_v"])
        first, last = pdf[value_col].iloc[0], pdf[value_col].iloc[-1]
        return pd.DataFrame(
            {
                **{k: [pdf[k].iloc[0]] for k in keys},
                "data_points_available": [len(pdf)],
                "first_v": [0.0 if pd.isna(first) else float(first)],
                "last_v": [0.0 if pd.isna(last) else float(last)],
            }
        )

    schema = ", ".join(
        [f"{k} {dict(df.dtypes)[k]}" for k in keys]
        + ["data_points_available long", "first_v double", "last_v double"]
    )
    return df.groupBy(*keys).applyInPandas(reduce_group, schema=schema)
