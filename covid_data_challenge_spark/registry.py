"""Query registry plumbing shared by all query modules.

``REGISTRY`` maps query name → (Spark callable, optional DuckDB oracle
SQL). ``__spark_entry__.py`` exposes it to the driver; importing a query
module populates it via the :func:`register` decorator.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI SQL for DuckDB; None → rows-only check


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in REGISTRY:
            # a duplicate name would SILENTLY shadow the earlier query
            # (dict overwrite) — caught live in r8 when a new funnel
            # query clobbered the existing funnel_conversion; fail at
            # import time instead
            raise ValueError(f"duplicate query registration: {name!r}")
        REGISTRY[name] = QuerySpec(spark=fn, oracle=oracle)
        return fn

    return deco
