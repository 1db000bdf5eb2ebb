"""Skyline (Pareto-frontier) operator — maximize all dimensions.

Pattern from "Integration of Skyline Queries into Spark SQL" (EDBT 2023,
PAPERS.md): a point is in the skyline iff no other point is ≥ in every
dimension and > in at least one. The classic 2-D sort-based algorithm —
scan points in (x desc, y desc) order, keep those whose y exceeds the
running max — is inherently sequential, so the distributed form here is
the paper's two-phase shape:

1. **Local skylines, in parallel**: grid-partition on x
   (``width_bucket`` against a 1-row broadcast min/max) and run the
   sort-based filter per bucket (``Window.partitionBy(bucket)`` — a
   parallel, partition-local sort, NOT a global one). Points dominated
   within their bucket are gone; survivors are each bucket's frontier,
   O(buckets · frontier) rows.
2. **Global merge WITHOUT a global sort**: because the grid cells are
   contiguous x-ranges, "the running max-y of every earlier (higher-x)
   point outside my bucket" is exactly the prefix max over the
   per-bucket max-y summary — a ``buckets``-row table (constant size by
   construction), prefix-maxed in one bounded window and broadcast back.
   A local survivor is on the global frontier iff its y also beats the
   higher-buckets prefix max. No window anywhere partitions or sorts a
   data-sized input (the r4-era global frontier sort is gone: an
   anti-correlated corpus puts O(n) points on the frontier, which made
   "sort the frontiers" corpus-scale in the worst case).

Dominance tests run on DISTINCT (x, y) points (exact duplicates tie —
neither dominates — and would break the running-max formulation), then a
semi join brings back every row on the frontier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def skyline_2d(
    df: DataFrame, x_col: str, y_col: str, buckets: int = 32
) -> DataFrame:
    """Rows of ``df`` on the (max ``x_col``, max ``y_col``) Pareto
    frontier. Null coordinates are excluded (SQL dominance over NULL is
    undefined three ways)."""
    pts = (
        df.select(F.col(x_col).alias("__x"), F.col(y_col).alias("__y"))
        .filter(F.col("__x").isNotNull() & F.col("__y").isNotNull())
        .distinct()
    )
    stats = pts.agg(
        F.min("__x").alias("__xmin"), F.max("__x").alias("__xmax")
    )
    bucketed = pts.join(F.broadcast(stats)).select(
        "__x",
        "__y",
        F.coalesce(
            F.width_bucket(
                F.col("__x").cast("double"),
                F.col("__xmin").cast("double"),
                F.col("__xmax").cast("double") + 1e-9,
                F.lit(buckets),
            ),
            F.lit(1),
        ).alias("__b"),
    )

    def survivors(frame: DataFrame, w: Window) -> DataFrame:
        runmax = F.max("__y").over(w)
        return (
            frame.withColumn("__rm", runmax)
            .filter(F.col("__rm").isNull() | (F.col("__rm") < F.col("__y")))
            .drop("__rm")
        )

    w_local = (
        Window.partitionBy("__b")
        .orderBy(F.col("__x").desc(), F.col("__y").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = survivors(bucketed, w_local)
    # Points in a strictly-higher bucket have strictly greater x (cells
    # are contiguous x-ranges and equal x co-buckets), so they dominate
    # a local survivor iff their y >= its y. The cross-bucket running
    # max is therefore the EXCLUSIVE prefix max over the buckets-row
    # max-y summary — bounded by the constant bucket count, never by
    # the frontier size.
    bucket_max = bucketed.groupBy("__b").agg(F.max("__y").alias("__bm"))
    w_buckets = Window.orderBy(F.col("__b").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    higher = bucket_max.withColumn("__hm", F.max("__bm").over(w_buckets)).select(
        "__b", "__hm"
    )
    frontier = (
        local.join(F.broadcast(higher), "__b")
        .filter(F.col("__hm").isNull() | (F.col("__hm") < F.col("__y")))
        .select("__x", "__y")
    )
    return df.join(
        frontier,
        (F.col(x_col) == F.col("__x")) & (F.col(y_col) == F.col("__y")),
        "left_semi",
    )
