"""Scalar expression helpers (SURVEY.md §2.2, §2.8).

All pure Column → Column combinators over built-in ``pyspark.sql.functions``
— JVM-side, whole-stage-codegen friendly, zero Python UDFs. Each mirrors a
scalar idiom of the reference (cited per function).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def guarded_div(num: Column, den: Column, scale: float = 1.0, digits: int | None = None) -> Column:
    """``np.where(den > 0, num/den*scale, 0)`` (reference data_cleaner.py:241-247,
    data_merger.py:317-348 — CFR and gap-percent style metrics).

    SQL three-valued logic note (SURVEY.md §7): NULL>0 is NULL → otherwise
    branch fires → 0, same as the pandas NaN behavior.
    """
    out = F.when(den > 0, num / den * F.lit(scale)).otherwise(F.lit(0.0))
    if digits is not None:
        out = F.round(out, digits)
    return out


def pct_gap(current: Column, base: Column, digits: int = 2) -> Column:
    """Gap percent ``(current - base) / base * 100`` guarded on base>0
    (reference data_merger.py:317-329)."""
    return guarded_div(current - base, base, scale=100.0, digits=digits)


def per_100k(value: Column, population: Column, digits: int = 2) -> Column:
    """``value / population * 100000`` guarded (reference data_cleaner.py:231-239)."""
    return guarded_div(value, population, scale=100_000.0, digits=digits)


def clip_lower(col: Column, lo: float = 0.0) -> Column:
    """``Series.clip(lower=lo)`` (reference data_cleaner.py:225-228) — NULLs
    pass through untouched, as in pandas."""
    return F.when(col.isNull(), col).otherwise(F.greatest(col, F.lit(lo)))


def fill_zero(col: Column) -> Column:
    """``fillna(0)`` (reference data_cleaner.py:190,194)."""
    return F.coalesce(col, F.lit(0.0))


def label_title(col: Column) -> Column:
    """``col.replace("_", " ").title()`` — metric-key → display label
    (P19, reference streamlit_app.py:255, visualizer.py:492). DuckDB has
    no ``initcap`` → presentation-layer, pinned by unit test not oracle."""
    return F.initcap(F.regexp_replace(col, "_", " "))


def search_contains(col: Column, term: str) -> Column:
    """Case-insensitive substring search, null-safe → False
    (reference streamlit_app.py:637-639)."""
    return F.coalesce(F.lower(col).contains(term.lower()), F.lit(False))
