"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All real logic lives in :mod:`covid_data_challenge_spark`; this module is
a thin adapter over its query registry.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

import covid_data_challenge_spark.queries  # noqa: F401 — populates REGISTRY
import covid_data_challenge_spark.queries_ext  # noqa: F401 — populates REGISTRY
from covid_data_challenge_spark.registry import REGISTRY

#: Runtime-settable session confs the queries assume. The driver builds its
#: own SparkSession; event-time windows hash-match the (tz-naive) DuckDB
#: oracle only under UTC, and AQE/partition counts keep tiny-SF plans sane.
_SESSION_CONF = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.shuffle.partitions": "32",
    # naive parquet timestamps must scan as TIMESTAMP, not NTZ (epoch
    # arithmetic + watermarks; load_table also casts defensively, but the
    # scan-level type keeps ts-predicates pushing down) — see session.py
    "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
}


def _pin_session(spark: SparkSession) -> None:
    for k, v in _SESSION_CONF.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # never let a read-only conf break a query


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    _pin_session(spark)
    return REGISTRY["flagship_customer_snapshot"].spark(spark, "/root/testdata/sf0.001")


def _wrap(fn: Callable[[SparkSession, str], DataFrame]) -> Callable[[SparkSession, str], DataFrame]:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        _pin_session(spark)
        return fn(spark, sf_dir)

    return run


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: _wrap(spec.spark) for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalents for each query (omitted for
    non-SQL-expressible ops → driver records a rows-only check)."""
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None}
