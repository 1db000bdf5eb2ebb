"""Sinks (SURVEY.md §2.1 S5–S7).

The reference exports query results as CSV strings for dashboard download
(streamlit_app.py:651-657) and memoizes the pipeline result per session
(streamlit_app.py:46). Here:

- ``csv_export_string``: driver-side export of a SMALL result (the
  dashboard path) — caller is responsible for having reduced the data
  first; guarded by a row cap so nobody accidentally collects a fact table.
- ``write_csv`` / ``write_parquet``: distributed file sinks for scale;
  parquet is the "gold table" materialization replacing @st.cache_data.
  ``partition_by`` yields partition-pruned downstream scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def csv_export_string(df: DataFrame, max_rows: int = 100_000) -> str:
    """Serialize a small query result to a CSV string on the driver."""
    n = df.limit(max_rows + 1).count()
    if n > max_rows:
        raise ValueError(
            f"result exceeds {max_rows} rows — use write_csv() for distributed export"
        )
    return df.toPandas().to_csv(index=False)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Distributed CSV export (one file per partition)."""
    df.write.mode(mode).option("header", True).csv(path)


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    """Materialize a gold table; ``partition_by`` enables partition
    pruning for downstream readers."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    mode: str = "overwrite",
) -> None:
    """Materialize a catalog table bucketed (and sorted) on the join key.

    Bucketing is the pay-once answer to repeated fact-fact joins at scale:
    two tables bucketed on the same key with the same bucket count
    equi-join with ZERO exchanges — the shuffle happened at write time.
    At 100 TB, bucket the fact tables on their primary join key
    (orders/lineitem on orderkey) and every downstream join/aggregation on
    that key skips its shuffle. Requires the session catalog (saveAsTable),
    not a bare path — bucket metadata lives in the catalog.
    """
    (
        df.write.mode(mode)
        .format("parquet")
        .bucketBy(num_buckets, *bucket_cols)
        .sortBy(*bucket_cols)
        .saveAsTable(table)
    )


def write_sorted_parquet(
    df: DataFrame,
    path: str,
    sort_cols: list[str],
    mode: str = "overwrite",
    num_files: int | None = None,
) -> None:
    """Materialize a gold table range-clustered and sorted on the scan
    key — the data-layout lever below partitioning.

    ``repartitionByRange`` clusters each key range into one file and
    ``sortWithinPartitions`` orders rows inside it, so every parquet
    row-group carries tight min/max statistics on ``sort_cols``. A
    selective predicate on the sort key then skips whole row groups
    (and with range-clustered files, whole files) at scan time — the
    poor man's zone map. At 100 TB this is the difference between
    reading a few row groups and reading the table: partition pruning
    handles the coarse key (e.g. day), sorted layout handles the fine
    key (e.g. user_id) inside each partition.
    """
    part = (
        df.repartitionByRange(num_files, *sort_cols)
        if num_files
        else df.repartitionByRange(*sort_cols)
    )
    part.sortWithinPartitions(*sort_cols).write.mode(mode).parquet(path)
