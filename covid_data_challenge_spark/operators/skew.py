"""Skew-mitigation utilities for hot-key joins and aggregations.

AQE's skew-join splitting (on in session.py) is the first line of defense
— it re-splits oversized sort-merge partitions at runtime. These helpers
cover the cases AQE cannot: a broadcast-ineligible join where one key
holds a double-digit percentage of all rows (AQE splits the partition but
every split still collides on the same reducer for the build side), and
engines/stages where runtime re-planning is unavailable.

Technique (standard salting): the skewed (big) side gets a uniform random
salt in [0, n); the small side is replicated across all n salt values with
``explode``; the join key becomes (key, salt). Row multiplicity is
unchanged — each big-side row matches exactly the one replica carrying its
salt — so the salted join returns byte-identical results to the plain
join, while the shuffle spreads each hot key over n reducers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salt_column(n: int):
    """Uniform salt in [0, n). Random (not key-derived) by design: the
    goal is to spread identical keys apart, so the salt must NOT be a
    function of the key."""
    return (F.rand() * n).cast("int")


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str | list[str],
    how: str = "inner",
    salt: int = 16,
) -> DataFrame:
    """Equi-join that survives extreme key skew on ``big``.

    ``small`` is exploded ×``salt`` (only acceptable for genuinely small
    sides — which is exactly the skewed-join shape: a big skewed fact
    against a modest dimension too large or too dynamic to broadcast).
    Result is identical to ``big.join(small, on, how)`` for inner/left
    joins; any other join type would see each small row ``salt`` times
    (wrong multiplicities / spurious NULL rows), so it is rejected.
    """
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(
            f"salted_join supports inner/left joins only, got how={how!r}: "
            "the small side is exploded ×salt, which corrupts right/full/"
            "semi/anti multiplicities"
        )
    keys = [on] if isinstance(on, str) else list(on)
    big_s = big.withColumn(_SALT, salt_column(salt))
    small_s = small.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(salt - 1)).cast("array<int>"))
    )
    return big_s.join(small_s, [*keys, _SALT], how).drop(_SALT)


def salted_agg_sum_count(
    df: DataFrame,
    keys: str | list[str],
    sum_cols: list[str],
    salt: int = 16,
) -> DataFrame:
    """Two-stage sum/count aggregation over a skewed key: partial agg on
    (key, salt) spreads the hot key across reducers; the final agg on key
    combines ``salt`` partials. (Spark's own map-side partial aggregation
    makes this unnecessary for plain ``groupBy`` — it exists for stages
    where partials are defeated, e.g. after an expensive per-row expansion
    or with high-cardinality distinct-like payloads.)"""
    keys = [keys] if isinstance(keys, str) else list(keys)
    partial = (
        df.withColumn(_SALT, salt_column(salt))
        .groupBy(*keys, _SALT)
        .agg(
            F.count(F.lit(1)).alias("__cnt"),
            *[F.sum(c).alias(f"__sum_{c}") for c in sum_cols],
        )
    )
    return partial.groupBy(*keys).agg(
        F.sum("__cnt").alias("n_rows"),
        *[F.sum(f"__sum_{c}").alias(f"sum_{c}") for c in sum_cols],
    )
