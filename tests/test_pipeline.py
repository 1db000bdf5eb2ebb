"""End-to-end pipeline tests with the reference's golden values
(reference tests/test_integration.py:325-642): the full clean → align →
merge → derive → summarize chain on hand-built fixtures.

Mapping direction matches the reference (data_cleaner.py:28-53): OWID
names are mapped to API names on the history source only; the API
snapshot keeps its original names."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from covid_data_challenge_spark.pipeline.covid import (
    build_country_mapping,
    clean_history,
    clean_snapshot,
    compare_countries,
    covid_trends,
    integration_summary,
    merge_datasets,
    overview_stats,
    search_countries,
    standardize_countries,
    top_k_by,
)

D = datetime.date
NOW = datetime.datetime(2024, 3, 1, 12, 0, 0)


@pytest.fixture(scope="module")
def history(spark):
    """OWID-shaped fixture: mapped + unmapped + aggregate rows, NULL gaps
    (reference tests/test_integration.py:331-340,406-416)."""
    rows = [
        ("Afghanistan", D(2024, 1, 1), "AFG", 40_000_000, 1000.0, 50.0),
        ("Afghanistan", D(2024, 1, 2), "AFG", 40_000_000, 1200.0, 60.0),
        ("United States", D(2024, 1, 1), "USA", 331_000_000, 9000.0, 400.0),
        ("United States", D(2024, 1, 2), "USA", 331_000_000, None, None),  # ffill target
        ("World", D(2024, 1, 1), "OWID_WRL", 8_000_000_000, 99999.0, 9999.0),
        ("High income", D(2024, 1, 1), "OWID_HIC", 1_000_000_000, 5555.0, 555.0),
    ]
    return spark.createDataFrame(
        rows,
        "country string, date date, iso_code string, population long, "
        "total_cases double, total_deaths double",
    )


@pytest.fixture(scope="module")
def snapshot(spark):
    """API-shaped fixture: API-style names kept as-is (no reverse
    mapping), plus a cruise-ship pseudo-entity the exclusion list must
    drop (reference tests/test_integration.py:342-349)."""
    rows = [
        ("Afghanistan", "AFG", 40_000_000, 1500, 75),
        ("USA", "USA", 331_000_000, 12000, 600),
        ("Bosnia", "BIH", 3_000_000, 90, 5),
        ("Diamond Princess", "XXX", 3711, 712, 14),
    ]
    return spark.createDataFrame(
        rows,
        "country string, iso_code string, population long, "
        "current_cases long, current_deaths long",
    )


def test_clean_history_drops_aggregates_and_fills(history):
    out = clean_history(history)
    rows = out.collect()
    countries = {r["country_standardized"] for r in rows}
    # World + High income dropped; 'United States' mapped to API name
    assert countries == {"Afghanistan", "USA"}
    usa2 = [
        r
        for r in rows
        if r["country_standardized"] == "USA" and r["date"] == D(2024, 1, 2)
    ][0]
    assert usa2["total_cases"] == 9000.0  # forward-filled
    assert usa2["new_cases"] == 0.0  # ffilled value − previous = 0
    afg2 = [
        r for r in rows if r["country_standardized"] == "Afghanistan" and r["date"] == D(2024, 1, 2)
    ][0]
    assert afg2["new_cases"] == 200.0
    assert afg2["data_source"] == "owid_historical"


def test_clean_history_keeps_source_provided_daily_columns(spark):
    """Reference data_cleaner.py:188-194: new_cases is computed ONLY when
    absent — source-reported daily values are never overwritten by diffs
    of forward-filled cumulatives."""
    rows = [
        ("Afghanistan", D(2024, 1, 1), 1000.0, 77.0),
        ("Afghanistan", D(2024, 1, 2), 1200.0, 88.0),
    ]
    df = spark.createDataFrame(
        rows, "country string, date date, total_cases double, new_cases double"
    )
    out = {r["date"]: r for r in clean_history(df).collect()}
    assert out[D(2024, 1, 2)]["new_cases"] == 88.0  # NOT the 200.0 diff


def test_clean_snapshot_keeps_api_names_and_derives(snapshot):
    out = {r["country_standardized"]: r for r in clean_snapshot(snapshot).collect()}
    assert "USA" in out  # API name kept, not reverse-mapped
    assert "Bosnia" in out
    assert "Diamond Princess" not in out  # cruise-ship pseudo-entity dropped
    bosnia = out["Bosnia"]
    assert bosnia["cases_per_100k"] == 3.0  # 90 / 3e6 * 1e5 (golden :506)
    afg = out["Afghanistan"]
    assert afg["case_fatality_rate"] == 5.0  # 75/1500*100


def test_country_mapping_flags(history, snapshot):
    h, s = clean_history(history), clean_snapshot(snapshot)
    flags = {r["country_standardized"]: r for r in build_country_mapping(h, s).collect()}
    assert flags["Afghanistan"]["can_merge"]
    assert flags["USA"]["can_merge"]  # OWID 'United States' → 'USA' matches
    assert flags["Bosnia"]["in_api"]
    assert not flags["Bosnia"]["in_owid"]


def test_merge_latest_alignment_and_gap_goldens(history, snapshot):
    """Latest row wins (reference :403-444); gap/CFR goldens (:475-509)."""
    merged = merge_datasets(clean_history(history), clean_snapshot(snapshot), now=NOW)
    rows = {r["country_standardized"]: r for r in merged.collect()}
    assert set(rows) == {"Afghanistan", "USA"}  # inner join
    afg = rows["Afghanistan"]
    assert afg["owid_date"] == D(2024, 1, 2)  # latest per key
    assert afg["owid_total_cases"] == 1200.0
    assert afg["cases_data_gap"] == 300.0  # 1500 − 1200
    assert afg["cases_data_gap_percent"] == 25.0
    assert afg["current_case_fatality_rate"] == 5.0  # 75/1500*100
    # reference data_merger.py:330-340: OWID population is the denominator
    assert afg["current_cases_per_100k"] == 3.75  # 1500 / 4e7 * 1e5
    assert afg["owid_data_age_days"] == 59  # 2024-01-02 → 2024-03-01
    assert afg["merge_timestamp"] == NOW


def test_trends_constant_ramp_golden(spark):
    """35-day +1/day ramp → avg_daily_new_cases == 1.0 (reference :446-473)."""
    base = D(2024, 1, 1)
    rows = [
        ("Testland", base + datetime.timedelta(days=i), 1000.0 + i, float(1))
        for i in range(35)
    ]
    df = spark.createDataFrame(
        rows, "country_standardized string, date date, total_cases double, new_cases double"
    )
    out = covid_trends(df).collect()
    assert len(out) == 1
    assert out[0]["avg_daily_new_cases"] == 1.0
    assert out[0]["cases_change_30d"] == 30.0


def test_integration_summary_completeness(spark, history, snapshot):
    merged = merge_datasets(clean_history(history), clean_snapshot(snapshot), now=NOW)
    summary = integration_summary(merged)
    assert summary["total_countries"] == 2
    assert summary["completeness_percent"]["owid_total_cases"] == 100.0
    assert summary["countries_with_large_gap"] == 2  # 25% and 33.3% gaps
    assert summary["top_10_by_current_cases"][0] == "USA"


def test_analytics_surface(history, snapshot):
    merged = merge_datasets(clean_history(history), clean_snapshot(snapshot), now=NOW)
    top1 = top_k_by(merged, "api_current_cases", 1).collect()
    assert top1[0]["country_standardized"] == "USA"
    assert search_countries(merged, "usa").count() == 1  # case-insensitive
    assert compare_countries(merged, ["Afghanistan"]).count() == 1
    stats = overview_stats(merged)
    assert stats["n_countries"] == 2
    assert stats["total_current_cases"] == 13500


def test_standardize_fallback(spark):
    df = spark.createDataFrame([("Narnia",)], "country string")
    assert standardize_countries(df).collect()[0]["country_standardized"] == "Narnia"
    # API source: names always pass through, even mapped ones
    df2 = spark.createDataFrame([("USA",)], "country string")
    assert (
        standardize_countries(df2, source="api").collect()[0]["country_standardized"]
        == "USA"
    )


def test_choropleth_frame_resolution_and_filter(spark):
    """Suffix-tolerant ISO resolution (reference streamlit_app.py:384-397):
    a non-meta iso column wins; _*_meta-only frames use the fallback
    order; NULL/empty locations are dropped; missing metric raises."""
    from covid_data_challenge_spark.pipeline.covid import choropleth_frame

    df = spark.createDataFrame(
        [("Aland", "ALA", "XALA", 5), ("Nowhere", None, "XNW", 7), ("Empty", "", "XE", 9)],
        "country_standardized string, iso_code_x string, iso_code_api_meta string, m long",
    )
    out = choropleth_frame(df, "m").collect()
    # iso_code_x contains 'iso_code' and has no meta suffix → wins over api_meta
    assert [(r["iso_code"], r["m"]) for r in out] == [("ALA", 5)]

    meta_only = df.withColumnRenamed("iso_code_x", "iso_code_owid_meta")
    out2 = {r["iso_code"] for r in choropleth_frame(meta_only, "m").collect()}
    assert out2 == {"ALA"}  # fallback picks iso_code_owid_meta first

    import pytest as _pytest

    with _pytest.raises(ValueError, match="iso-like columns"):
        choropleth_frame(df.select("country_standardized", "m"), "m")
    with _pytest.raises(ValueError, match="metric"):
        choropleth_frame(df, "missing_metric")
