"""Data-quality profiling operators (SURVEY.md §2.4 A7–A9, A15, A16; §2.2 P22–P23).

Every profile is ONE aggregation pass (single job, map-side partials) —
the reference iterates per-column in Python (data_cleaner.py:99-151,
data_merger.py:368-419); here all per-column statistics are fused into one
``agg`` so a 100 TB table is scanned once, not once per column.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _count_if(cond: Column) -> Column:
    return F.sum(F.when(cond, 1).otherwise(0))


def null_profile(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Missing count + percentage per column (A7, reference
    data_cleaner.py:110-122), unpivoted to (column, missing_count,
    missing_percentage) rows."""
    total = F.count(F.lit(1))
    aggs = [total.alias("__total")]
    for c in cols:
        aggs.append(_count_if(F.col(c).isNull()).alias(f"__null_{c}"))
    wide = df.agg(*aggs)
    pairs = []
    for c in cols:
        pairs.append(
            F.struct(
                F.lit(c).alias("column"),
                F.col(f"__null_{c}").cast("long").alias("missing_count"),
                F.round(F.col(f"__null_{c}") / F.col("__total") * 100, 2).alias(
                    "missing_percentage"
                ),
            )
        )
    return wide.select(F.explode(F.array(*pairs)).alias("s")).select("s.*")


def completeness(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Available / missing / percent-complete per key column (A8, reference
    data_merger.py:378-392)."""
    total = F.count(F.lit(1))
    aggs = [total.alias("__total")] + [F.count(F.col(c)).alias(f"__avail_{c}") for c in cols]
    wide = df.agg(*aggs)
    pairs = [
        F.struct(
            F.lit(c).alias("column"),
            F.col(f"__avail_{c}").cast("long").alias("available"),
            (F.col("__total") - F.col(f"__avail_{c}")).cast("long").alias("missing"),
            F.round(F.col(f"__avail_{c}") / F.col("__total") * 100, 2).alias("percent_complete"),
        )
        for c in cols
    ]
    return wide.select(F.explode(F.array(*pairs)).alias("s")).select("s.*")


def conditional_counts(df: DataFrame, conds: dict[str, Column]) -> DataFrame:
    """Named conditional counts in one pass (A9, P22, P23; reference
    data_merger.py:395-401, data_cleaner.py:127-144). Returns one row with
    one column per condition name."""
    return df.agg(*[_count_if(c).cast("long").alias(name) for name, c in conds.items()])


def histogram(df: DataFrame, col: str, bins: int = 30) -> DataFrame:
    """Equi-width histogram (A16, reference visualizer.py:266-272).

    Two tiny jobs: a 1-row min/max aggregate (broadcast), then a
    groupBy(bucket) count — the classic scalable binning plan; never
    collects the data column."""
    bounds = df.agg(
        F.min(F.col(col)).alias("__lo"), F.max(F.col(col)).alias("__hi")
    )
    width = (F.col("__hi") - F.col("__lo")) / F.lit(bins)
    bucket = F.least(
        F.floor((F.col(col) - F.col("__lo")) / width).cast("int"), F.lit(bins - 1)
    )
    return (
        df.join(F.broadcast(bounds))
        .filter(F.col(col).isNotNull())
        .withColumn("bucket", bucket)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("bucket_count"))
        .orderBy("bucket")
    )


def observe_quality(
    df: DataFrame, cols: Sequence[str], name: str = "quality"
):
    """Attach free-riding data-quality metrics to a plan via
    ``Observation``: row count plus per-column null counts are computed
    AS THE JOB RUNS — no second scan, no extra action, and the same
    mechanism works on streaming queries (per micro-batch). The
    reference computes its quality report as a separate full pass
    (data_cleaner.py:99-151); here the report is a side effect of
    whatever action the caller was already running.

    Returns (df_with_observation, observation); read
    ``observation.get`` AFTER an action on the returned frame."""
    from pyspark.sql import Observation

    obs = Observation(name)
    metrics = [F.count(F.lit(1)).alias("n_rows")] + [
        _count_if(F.col(c).isNull()).alias(f"null_{c}") for c in cols
    ]
    return df.observe(obs, *metrics), obs
