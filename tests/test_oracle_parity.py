"""The primary correctness gate, run locally at sf0.001 for speed:
every registered query must match its DuckDB oracle exactly (the driver
repeats this at sf0.01)."""

from __future__ import annotations

import pytest

import covid_data_challenge_spark.queries  # noqa: F401 — populates REGISTRY
import covid_data_challenge_spark.queries_ext  # noqa: F401 — populates REGISTRY
from covid_data_challenge_spark.registry import REGISTRY
from covid_data_challenge_spark.testing import (
    duckdb_connection,
    normalize,
    values_match,
)


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_connection(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(spark, con, sf_dir, name):
    spec = REGISTRY[name]
    sdf = spec.spark(spark, sf_dir).toPandas()
    if spec.oracle is None:
        assert len(sdf) >= 0  # rows-only check, mirrors the driver
        return
    odf = con.execute(spec.oracle).fetchdf()
    ok, why = values_match(normalize(sdf), normalize(odf))
    assert ok, f"{name}: {why}"


def test_registry_order_matches_frozen_driver_contract():
    """The driver's correctness snapshot keys on the FIRST 50 names of
    queries(); the themed-module split must never reorder or drop a
    frozen name. New queries may only append after the frozen prefix."""
    import covid_data_challenge_spark.queries  # noqa: F401
    import covid_data_challenge_spark.queries_ext  # noqa: F401
    from covid_data_challenge_spark.registry import REGISTRY
    from covid_data_challenge_spark.registry_order import CANONICAL_ORDER

    names = list(REGISTRY)
    assert names[: len(CANONICAL_ORDER)] == list(CANONICAL_ORDER)
    assert all(REGISTRY[n].spark is not None for n in CANONICAL_ORDER)
