"""The end-to-end integration pipeline: the reference's three stages
(load → clean → merge, SURVEY.md §3) as pure DataFrame → DataFrame
functions, plus the analytics query surface served to its dashboards.

Reference parity map (file:line cites into /root/reference):
- ``clean_history``     ← data_cleaner.clean_owid_data (data_cleaner.py:155-199)
- ``clean_snapshot``    ← data_cleaner.clean_api_data (data_cleaner.py:202-252)
- ``build_country_mapping`` ← data_merger.create_country_mapping (data_merger.py:29-64)
- ``align_latest``      ← data_merger.align_temporal_data (data_merger.py:67-111)
- ``covid_trends``      ← data_merger.calculate_trend_metrics (data_merger.py:114-218)
- ``merge_datasets``    ← data_merger.merge_datasets (data_merger.py:221-273)
- ``derive_metrics``    ← data_merger.calculate_derived_metrics (data_merger.py:276-352)
- ``integration_summary`` ← data_merger.generate_integration_summary (data_merger.py:368-419)
- analytics helpers     ← visualizer.py / streamlit_app.py query surface

Differences by design (Spark semantics, SURVEY.md §7 "hard parts"):
- order-dependent pandas ``last`` → explicit argmax (``latest_per_key``)
- ``datetime.now()`` → injected ``now`` parameter (deterministic plans)
- everything lazy; callers decide when to cache/materialize
- EXCLUDE_REGIONS additionally drops the UK constituent nations
  (England/Scotland/Wales/Northern Ireland) — OWID publishes them
  alongside 'United Kingdom', double-counting the UK in global sums.
"""

from __future__ import annotations

import datetime

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from covid_data_challenge_spark.functions.scalar import guarded_div, pct_gap, per_100k
from covid_data_challenge_spark.operators.alignment import latest_per_key, trend_metrics
from covid_data_challenge_spark.operators.cleaning import (
    clip_columns,
    filter_not_in,
    filter_regex_out,
    forward_fill,
    lag_diff,
    standardize_keys,
)
from covid_data_challenge_spark.operators.joins import key_membership, prefixed

#: Country-name harmonization: OWID name → disease.sh API name, applied to
#: the OWID history source ONLY (the API snapshot keeps its original names).
#: The reference's dictionary, config/constants.py:14-41, reproduced
#: verbatim as configuration data.
COUNTRY_NAME_MAPPING: dict[str, str] = {
    "Bosnia and Herzegovina": "Bosnia",
    "Cape Verde": "Cabo Verde",
    "Cote d'Ivoire": "Côte d'Ivoire",
    "Democratic Republic of Congo": "DRC",
    "East Timor": "Timor-Leste",
    "Curacao": "Curaçao",
    "Bonaire Sint Eustatius and Saba": "Caribbean Netherlands",
    "United States": "USA",
    "United Kingdom": "UK",
    "South Korea": "S. Korea",
    "Czech Republic": "Czechia",
    "North Macedonia": "Macedonia",
    "Myanmar": "Burma",
    "Republic of the Congo": "Congo",
    "Eswatini": "Swaziland",
    "Vatican": "Holy See (Vatican City State)",
    "Brunei": "Brunei Darussalam",
    "Moldova": "Moldova, Republic of",
    "Russia": "Russian Federation",
    "Syria": "Syrian Arab Republic",
    "Tanzania": "Tanzania, United Republic of",
    "Turkey": "Turkey",
    "Venezuela": "Venezuela, Bolivarian Republic of",
    "Vietnam": "Viet Nam",
    "Laos": "Lao People's Democratic Republic",
}

#: Aggregate pseudo-entities to drop (reference constants.py:44-61,
#: reproduced verbatim) plus the UK constituent nations — a deliberate
#: extension beyond the reference: OWID publishes them alongside 'United
#: Kingdom', double-counting the UK in any global aggregate.
EXCLUDE_REGIONS: tuple[str, ...] = (
    "World", "Africa", "Asia", "Europe", "European Union", "North America",
    "South America", "Oceania", "International", "High income",
    "Upper middle income", "Lower middle income", "Low income",
    "OECD countries", "MS Zaandam", "Diamond Princess",
    # extension (not in the reference):
    "England", "Scotland", "Wales", "Northern Ireland",
)

#: Case-insensitive aggregate-name pattern (reference data_cleaner.py:73-77).
AGGREGATE_NAME_PATTERN = "income|oecd|union|international"

#: Cumulative columns to forward-fill per country (reference data_cleaner.py:174-186).
CUMULATIVE_COLS: tuple[str, ...] = (
    "total_cases", "total_deaths", "total_tests",
    "people_vaccinated", "people_fully_vaccinated",
)

TREND_WINDOW_DAYS = 30  # reference constants.py:64


def _existing(df: DataFrame, cols) -> list[str]:
    """Resolve optional columns against the actual schema pre-plan — the
    engine-level form of the reference's defensive column checks
    (data_loader.py:111, data_merger.py:283-295)."""
    return [c for c in cols if c in df.columns]


def standardize_countries(
    df: DataFrame, key_col: str = "country", source: str = "owid"
) -> DataFrame:
    """P7/J5: dictionary standardization with pass-through fallback
    (reference data_cleaner.py:28-53). The OWID→API mapping applies to
    the OWID source only; API data keeps its original names (the
    reference deliberately does NOT reverse-map)."""
    if source == "owid":
        return standardize_keys(df, COUNTRY_NAME_MAPPING, key_col, "country_standardized")
    return df.withColumn("country_standardized", F.col(key_col))


def filter_valid_countries(df: DataFrame, key_col: str = "country") -> DataFrame:
    """P5 + P6: drop aggregate entities by list and by name pattern."""
    out = filter_not_in(df, key_col, EXCLUDE_REGIONS)
    return filter_regex_out(out, key_col, AGGREGATE_NAME_PATTERN)


def clean_history(df: DataFrame) -> DataFrame:
    """Historical time-series cleaning (reference data_cleaner.py:155-199):
    standardize keys → drop aggregates → per-country forward-fill of
    cumulative metrics → lag-diff daily increments (fill 0, clip ≥0,
    computed ONLY when the source did not provide them — reference
    data_cleaner.py:188-194 guards with ``if "new_cases" not in
    df_clean.columns``; real OWID data ships reported daily values,
    which must not be overwritten by diffs of ffilled cumulatives) →
    provenance literal."""
    out = standardize_countries(df, source="owid")
    out = filter_valid_countries(out)
    fill_cols = _existing(out, CUMULATIVE_COLS)
    if fill_cols:
        out = forward_fill(out, "country_standardized", "date", fill_cols)
    if "new_cases" not in out.columns and "total_cases" in out.columns:
        out = lag_diff(out, "country_standardized", "date", "total_cases", "new_cases")
    if "new_deaths" not in out.columns and "total_deaths" in out.columns:
        out = lag_diff(out, "country_standardized", "date", "total_deaths", "new_deaths")
    return out.withColumn("data_source", F.lit("owid_historical"))


def clean_snapshot(df: DataFrame) -> DataFrame:
    """Snapshot cleaning (reference data_cleaner.py:202-252): standardize →
    drop aggregates → clip negative counts (lat/long exempt) → per-100k +
    CFR derived columns → provenance literal."""
    out = standardize_countries(df, source="api")
    out = filter_valid_countries(out)
    clip_cols = _existing(
        out,
        ("current_cases", "current_deaths", "current_recovered",
         "current_active", "current_critical", "population"),
    )
    out = clip_columns(out, clip_cols)
    if {"current_cases", "population"} <= set(out.columns):
        out = out.withColumn(
            "cases_per_100k", per_100k(F.col("current_cases"), F.col("population"))
        )
    if {"current_deaths", "population"} <= set(out.columns):
        out = out.withColumn(
            "deaths_per_100k", per_100k(F.col("current_deaths"), F.col("population"))
        )
    if {"current_cases", "current_deaths"} <= set(out.columns):
        out = out.withColumn(
            "case_fatality_rate",
            guarded_div(F.col("current_deaths"), F.col("current_cases"), 100.0, digits=3),
        )
    return out.withColumn("data_source", F.lit("disease_sh_current"))


def build_country_mapping(history: DataFrame, snapshot: DataFrame) -> DataFrame:
    """J3: full-outer key membership table with can_merge flag."""
    return key_membership(
        history.select("country_standardized"),
        snapshot.select("country_standardized"),
        "country_standardized",
        "in_owid",
        "in_api",
    )


def align_latest(history: DataFrame) -> DataFrame:
    """A6: latest full row per country, owid_-prefixed for the merge
    (reference data_merger.py:67-111)."""
    latest = latest_per_key(history, "country_standardized", "date")
    return prefixed(latest, "owid_", exclude=["country_standardized"])


def covid_trends(history: DataFrame, window_days: int = TREND_WINDOW_DAYS) -> DataFrame:
    """A11–A14: trailing-window trend metrics per country."""
    value_cols = _existing(history, ("total_cases", "total_deaths"))
    rate_cols = _existing(history, ("new_cases", "new_deaths"))
    out = trend_metrics(
        history,
        keys="country_standardized",
        ts_col="date",
        value_cols=value_cols,
        rate_cols=rate_cols,
        window_days=window_days,
    )
    renames = {
        "total_cases_change": "cases_change_30d",
        "total_cases_change_percent": "cases_change_percent_30d",
        "total_deaths_change": "deaths_change_30d",
        "total_deaths_change_percent": "deaths_change_percent_30d",
    }
    for old, new in renames.items():
        if old in out.columns:
            out = out.withColumnRenamed(old, new)
    return out


def merge_datasets(
    history: DataFrame,
    snapshot: DataFrame,
    now: datetime.datetime | None = None,
    window_days: int = TREND_WINDOW_DAYS,
) -> DataFrame:
    """The core integration (reference data_merger.py:221-273): inner join
    of latest historical state with the current snapshot, trends
    left-joined, derived metrics appended.

    ``now`` is injected (not wall-clock) so plans stay deterministic; None
    falls back to ``current_timestamp()`` for interactive use.
    """
    aligned = align_latest(history)
    trends = covid_trends(history, window_days)
    snap = prefixed(snapshot, "api_", exclude=["country_standardized"])
    merged = aligned.join(snap, "country_standardized", "inner").join(
        trends, "country_standardized", "left"
    )
    return derive_metrics(merged, now)


def derive_metrics(merged: DataFrame, now: datetime.datetime | None = None) -> DataFrame:
    """Derived gap/rate metrics (reference data_merger.py:276-352)."""
    out = merged
    cols = set(out.columns)
    if {"api_current_cases", "owid_total_cases"} <= cols:
        out = out.withColumn(
            "cases_data_gap", F.col("api_current_cases") - F.col("owid_total_cases")
        ).withColumn(
            "cases_data_gap_percent",
            pct_gap(F.col("api_current_cases"), F.col("owid_total_cases")),
        )
    if {"api_current_deaths", "owid_total_deaths"} <= cols:
        out = out.withColumn(
            "deaths_data_gap", F.col("api_current_deaths") - F.col("owid_total_deaths")
        ).withColumn(
            "deaths_data_gap_percent",
            pct_gap(F.col("api_current_deaths"), F.col("owid_total_deaths")),
        )
    # population-adjusted comparison metrics use the OWID population
    # denominator and current_* names (reference data_merger.py:330-348)
    if {"api_current_cases", "owid_population"} <= cols:
        out = out.withColumn(
            "current_cases_per_100k",
            per_100k(F.col("api_current_cases"), F.col("owid_population")),
        )
    if {"api_current_deaths", "owid_population"} <= cols:
        out = out.withColumn(
            "current_deaths_per_100k",
            per_100k(F.col("api_current_deaths"), F.col("owid_population")),
        )
    if {"api_current_deaths", "api_current_cases"} <= cols:
        out = out.withColumn(
            "current_case_fatality_rate",
            guarded_div(F.col("api_current_deaths"), F.col("api_current_cases"), 100.0, digits=3),
        )
    now_col = F.lit(now) if now is not None else F.current_timestamp()
    out = out.withColumn("merge_timestamp", now_col)
    if "owid_date" in cols:
        out = out.withColumn(
            "owid_data_age_days", F.datediff(F.to_date(now_col), F.to_date("owid_date"))
        )
    return out


def integration_summary(merged: DataFrame) -> dict:
    """Integration quality report (reference data_merger.py:368-419) —
    everything computed in ONE aggregation pass + one top-k query; only
    the tiny results are collected."""
    key_cols = [
        c
        for c in (
            "owid_total_cases", "owid_total_deaths", "api_current_cases",
            "api_current_deaths", "cases_data_gap_percent", "avg_daily_new_cases",
        )
        if c in merged.columns
    ]
    aggs = [F.count(F.lit(1)).alias("total_countries")]
    for c in key_cols:
        aggs.append(F.count(F.col(c)).alias(f"avail_{c}"))
    if "cases_data_gap_percent" in merged.columns:
        aggs.append(
            F.sum(F.when(F.abs(F.col("cases_data_gap_percent")) > 10, 1).otherwise(0))
            .cast("long")
            .alias("countries_with_large_gap")
        )
        aggs.append(F.round(F.avg(F.abs(F.col("cases_data_gap_percent"))), 2).alias("avg_abs_gap_percent"))
    if "owid_data_age_days" in merged.columns:
        aggs.append(
            F.sum(F.when(F.col("owid_data_age_days") > 90, 1).otherwise(0))
            .cast("long")
            .alias("countries_with_old_data")
        )
    row = merged.agg(*aggs).collect()[0].asDict()

    total = row["total_countries"] or 1
    completeness = {
        c: round(row[f"avail_{c}"] / total * 100, 2) for c in key_cols
    }
    top10 = []
    if "api_current_cases" in merged.columns:
        top10 = [
            r["country_standardized"]
            for r in merged.orderBy(
                F.col("api_current_cases").desc(), F.col("country_standardized")
            )
            .select("country_standardized")
            .limit(10)
            .collect()
        ]
    return {
        "total_countries": row["total_countries"],
        "completeness_percent": completeness,
        "countries_with_large_gap": row.get("countries_with_large_gap"),
        "avg_abs_gap_percent": row.get("avg_abs_gap_percent"),
        "countries_with_old_data": row.get("countries_with_old_data"),
        "top_10_by_current_cases": top10,
    }


# --- Analytics query surface (visualizer.py / streamlit_app.py) ------------


def top_k_by(merged: DataFrame, metric: str, k: int = 15) -> DataFrame:
    """O3: deterministic top-k by metric (reference visualizer.py:69,157)."""
    return (
        merged.filter(F.col(metric).isNotNull())
        .orderBy(F.col(metric).desc(), F.col("country_standardized"))
        .limit(k)
    )


def search_countries(merged: DataFrame, term: str) -> DataFrame:
    """P18: case-insensitive substring search (streamlit_app.py:634-643)."""
    from covid_data_challenge_spark.functions.scalar import search_contains

    return merged.filter(search_contains(F.col("country_standardized"), term))


def compare_countries(merged: DataFrame, countries: list[str]) -> DataFrame:
    """P21: IN-list comparison slice (streamlit_app.py:155-238)."""
    return merged.filter(F.col("country_standardized").isin(countries))


def choropleth_frame(
    merged: DataFrame, metric: str, name_col: str = "country_standardized"
) -> DataFrame:
    """World-map feed (reference streamlit_app.py:358-439): resolve the
    ISO-code column suffix-tolerantly (post-merge frames may carry
    ``iso_code_owid_meta`` / ``iso_code_api_meta`` variants), drop rows
    without a usable location, and project (iso_code, name, metric).

    Resolution order matches the reference exactly: first any column
    containing ``iso_code`` that does NOT end in a ``_*_meta`` suffix,
    then the explicit fallbacks. Resolution happens driver-side against
    the schema (pre-plan, like the reference's defensive column checks),
    so the executed plan is a pure filter + projection — both push down
    to the scan."""
    iso_col = None
    for c in merged.columns:
        if "iso_code" in c and not c.endswith("_api_meta") and not c.endswith("_owid_meta"):
            iso_col = c
            break
    if iso_col is None:
        for cand in ("iso_code_owid_meta", "iso_code_api_meta", "iso_code"):
            if cand in merged.columns:
                iso_col = cand
                break
    if iso_col is None or metric not in merged.columns:
        iso_like = [c for c in merged.columns if "iso" in c.lower()]
        raise ValueError(
            f"choropleth needs an iso_code column and metric {metric!r}; "
            f"iso-like columns present: {iso_like}"
        )
    return merged.filter(
        F.col(iso_col).isNotNull() & (F.col(iso_col) != "")
    ).select(F.col(iso_col).alias("iso_code"), name_col, metric)


def overview_stats(merged: DataFrame) -> dict:
    """Dashboard tiles (streamlit_app.py:117-152) in one aggregation."""
    cols = set(merged.columns)
    aggs = [F.count(F.lit(1)).alias("n_countries")]
    if "api_current_cases" in cols:
        aggs.append(F.sum("api_current_cases").alias("total_current_cases"))
    if "api_current_deaths" in cols:
        aggs.append(F.sum("api_current_deaths").alias("total_current_deaths"))
    if "owid_data_age_days" in cols:
        aggs.append(F.round(F.avg("owid_data_age_days"), 1).alias("avg_data_age_days"))
    return merged.agg(*aggs).collect()[0].asDict()
