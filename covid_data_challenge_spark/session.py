"""SparkSession factory with scale-appropriate defaults.

The reference is an eager single-node pandas pipeline with no execution
configuration at all (see SURVEY.md §4). Here the session is tuned for the
two regimes we care about:

- local[] testing (driver runs local[32], 128 GiB) — modest shuffle
  partition count so tiny SF inputs don't fragment into thousands of
  empty tasks;
- a real cluster at ~100 TB — AQE handles runtime coalescing/skew, the
  static shuffle-partition number is only the pre-AQE upper bound, and all
  session defaults below are safe to scale up (none encode data size).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_DEFAULT_CONF: dict[str, str] = {
    # Adaptive execution: runtime re-planning (partition coalescing, skew
    # join splitting, broadcast conversion) — the main lever that keeps one
    # static config valid from sf0.001 to 100 TB.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow for any driver-side pandas interchange and for pandas UDFs.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Deterministic time semantics for oracle comparisons and streaming
    # window alignment.
    "spark.sql.session.timeZone": "UTC",
    # Naive parquet timestamps (isAdjustedToUTC=false) must scan as plain
    # TIMESTAMP, not TIMESTAMP_NTZ: NTZ breaks epoch arithmetic and
    # watermarks, and with the UTC session the two types carry the same
    # wall-clock anyway. Keeping the scan type TIMESTAMP (instead of a
    # post-scan cast) preserves ts-predicate pushdown into parquet.
    "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
    # Dimension tables (region/nation/customer-at-small-SF, the country
    # mapping, LSH band tables) should broadcast; 64 MB covers every
    # dimension we ship while still refusing to broadcast a fact table.
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    # Local-mode heap: Spark's 1g default driver heap cannot HOLD a
    # 64 MB-threshold broadcast build (hashed relations inflate ~5-10×
    # over on-disk size) and OOMs under a 10× data stress
    # (SCALING.md §synthetic-sf1). In local[] the driver JVM IS the
    # executor, so it gets the executor-grade sizing; on a real cluster
    # the submitter's --driver-memory/--executor-memory override this.
    "spark.driver.memory": "16g",
    # Read-side split size: 128 MB keeps scan tasks right-sized at scale.
    "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
}


def get_spark(
    app_name: str = "covid-data-challenge-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the session.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (falling back to
    ``local[*]``) so tests, bench.py, and the driver's harness all agree.
    On a real cluster, pass ``master=None`` with ``spark.master`` already
    set by the submitter — an existing session is returned as-is.
    """
    builder = SparkSession.builder.appName(app_name)

    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{cpus}]" if cpus else "local[*]"
    builder = builder.master(master)

    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))

    conf = dict(_DEFAULT_CONF)
    conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)

    return builder.getOrCreate()
