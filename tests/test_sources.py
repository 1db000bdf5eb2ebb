"""Source reader tests: CSV scan with declared schema, JSON scan with
nested-struct flatten, epoch-ms timestamps (reference
tests/test_integration.py:49-147 re-expressed for Spark readers)."""

from __future__ import annotations

import datetime
import json

from pyspark.sql import functions as F

from covid_data_challenge_spark.sources.readers import (
    load_table,
    read_history_csv,
    read_snapshot_json,
)

CSV = """iso_code,location,date,population,total_cases,new_cases,total_deaths,new_deaths,total_tests,new_tests,people_vaccinated,people_fully_vaccinated,total_vaccinations,tests_per_case,positive_rate
USA,United States,2024-01-01,331000000,1000,10,50,1,,,,,,,
USA,United States,2024-01-02,331000000,1100,100,55,5,,,,,,,
OWID_WRL,World,2024-01-01,8000000000,99999,999,9999,99,,,,,,,
AFG,Afghanistan,2024-01-01,40000000,500,5,25,0,,,,,,,
"""

SNAPSHOT = [
    {
        "country": "USA",
        "countryInfo": {
            "_id": 840,
            "iso2": "US",
            "iso3": "USA",
            "lat": 38.0,
            "long": -97.0,
            "flag": "https://example.test/us.png",
        },
        "cases": 1200,
        "deaths": 60,
        "recovered": 1000,
        "active": 140,
        "critical": 5,
        "casesPerOneMillion": 3625.0,
        "deathsPerOneMillion": 181.0,
        "tests": 5000,
        "testsPerOneMillion": 15105.0,
        "population": 331000000,
        "todayCases": 10,
        "todayDeaths": 1,
        "todayRecovered": 20,
        "updated": 1640995200000,
    }
]


def test_history_csv_schema_and_aggregate_filter(spark, tmp_path):
    p = tmp_path / "owid.csv"
    p.write_text(CSV)
    df = read_history_csv(spark, str(p))
    assert df.schema["date"].dataType.typeName() == "date"
    assert df.schema["total_cases"].dataType.typeName() == "double"
    rows = df.collect()
    # OWID_* aggregate row dropped at scan; location renamed to country
    assert {r["country"] for r in rows} == {"United States", "Afghanistan"}
    assert len(rows) == 3


def test_snapshot_json_flatten_and_epoch_ms(spark, tmp_path):
    p = tmp_path / "snapshot.json"
    p.write_text(json.dumps(SNAPSHOT))
    df = read_snapshot_json(spark, str(p))
    r = df.collect()[0]
    assert r["iso_code"] == "USA"
    assert r["iso2_code"] == "US"
    assert r["country_id"] == 840
    assert r["latitude"] == 38.0
    assert r["longitude"] == -97.0  # negative coords survive (no clipping)
    assert r["current_cases"] == 1200
    assert r["last_updated"] == datetime.datetime(2022, 1, 1, 0, 0)


def test_parquet_loader_prunes_columns(spark, sf_dir):
    df = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "l_orderkey" in plan
    # Projection reaches the scan: only the two columns are read.
    assert "ReadSchema: struct<l_orderkey:bigint,l_quantity:double>" in plan


def test_csv_export_and_file_sinks(spark, tmp_path):
    from covid_data_challenge_spark.sources.sinks import (
        csv_export_string,
        write_csv,
        write_parquet,
    )

    df = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
    s = csv_export_string(df)
    assert "k,v" in s and "1,a" in s

    import pytest

    with pytest.raises(ValueError):
        csv_export_string(df, max_rows=1)

    write_csv(df, str(tmp_path / "csv_out"))
    back = spark.read.option("header", True).csv(str(tmp_path / "csv_out"))
    assert back.count() == 2

    write_parquet(df, str(tmp_path / "pq_out"), partition_by=["v"])
    back_pq = spark.read.parquet(str(tmp_path / "pq_out"))
    assert sorted((r["k"], r["v"]) for r in back_pq.collect()) == [(1, "a"), (2, "b")]


def test_register_views_enables_spark_sql(spark, sf_dir):
    from covid_data_challenge_spark.sources.readers import register_views

    register_views(spark, sf_dir)
    r = spark.sql(
        """
        SELECT n.n_name, count(*) AS n_suppliers
        FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
        GROUP BY n.n_name ORDER BY n_suppliers DESC, n.n_name LIMIT 3
        """
    ).collect()
    assert len(r) == 3 and all(row["n_suppliers"] > 0 for row in r)
    # events view gets the ns→µs conversion like the DataFrame reader
    ts_type = dict(spark.sql("SELECT * FROM events").dtypes)["ts"]
    assert ts_type == "timestamp"


def test_jsonl_quarantine_splits_bad_lines(spark, tmp_path):
    """One bad line must not poison the scan (PERMISSIVE + dead-letter),
    and the good side must keep the declared schema exactly."""
    from pyspark.sql import types as T

    from covid_data_challenge_spark.sources.readers import read_jsonl_with_quarantine

    p = tmp_path / "feed.jsonl"
    p.write_text(
        '{"id": 1, "v": 10.5}\n'
        "this is not json at all\n"
        '{"id": 2, "v": null}\n'
        '{"id": "not-a-number", "v": 3.0}\n'
    )
    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("v", T.DoubleType())]
    )
    good, quarantine = read_jsonl_with_quarantine(spark, str(p), schema)
    assert [f.name for f in good.schema.fields] == ["id", "v"]
    assert sorted(r["id"] for r in good.collect()) == [1, 2]
    bad = [r["raw_line"] for r in quarantine.collect()]
    assert len(bad) == 2
    assert any("not json" in b for b in bad)
    assert any("not-a-number" in b for b in bad)


def test_snapshot_api_python_data_source(spark):
    """The custom Python Data Source must plan one partition per API
    page, produce the declared schema, and compose with ordinary
    operators downstream."""
    from pyspark.sql import functions as F

    from covid_data_challenge_spark.sources.rest_source import (
        register_snapshot_source,
    )

    register_snapshot_source(spark)
    df = (
        spark.read.format("snapshot_api")
        .option("pages", 3)
        .option("page_size", 40)
        .load()
    )
    assert df.schema.simpleString() == (
        "struct<entity_id:bigint,name:string,current_cases:bigint,"
        "current_deaths:bigint,updated_ms:bigint>"
    )
    assert df.count() == 120
    assert df.rdd.getNumPartitions() == 3
    # deterministic content, normal operators compose on top
    top = (
        df.withColumn("cfr", F.col("current_deaths") / F.col("current_cases"))
        .orderBy(F.col("current_cases").desc())
        .limit(1)
        .collect()[0]
    )
    assert top["current_cases"] == (top["entity_id"] * 7919 + 17) % 10**6
    # re-read is identical (replayable source)
    again = (
        spark.read.format("snapshot_api")
        .option("pages", 3)
        .option("page_size", 40)
        .load()
    )
    assert df.exceptAll(again).count() == 0


def test_union_by_name_schema_evolution(spark):
    """Multi-source union with schema drift: unionByName with
    allowMissingColumns fills absent columns with nulls — the
    schema-evolution-tolerant concat the reference does by hand."""
    a = spark.createDataFrame([(1, "x", 10.0)], "id long, src string, v double")
    b = spark.createDataFrame([(2, "y")], "id long, src string")  # no v column
    u = a.unionByName(b, allowMissingColumns=True)
    rows = {r["id"]: r for r in u.collect()}
    assert rows[1]["v"] == 10.0
    assert rows[2]["v"] is None
    assert set(u.columns) == {"id", "src", "v"}


def test_compact_parquet_merges_small_files(spark, sf_dir, tmp_path):
    """Compaction must size output files from actual input bytes: a
    32-small-file directory rewrites to the computed file count with
    identical data."""
    import glob as globmod

    from covid_data_challenge_spark.sources.readers import load_table
    from covid_data_challenge_spark.sources.sinks import compact_parquet

    ev = load_table(spark, sf_dir, "events")
    small = str(tmp_path / "small")
    ev.repartition(32).write.parquet(small)
    assert len(globmod.glob(f"{small}/part-*.parquet")) == 32

    out = str(tmp_path / "compacted")
    n = compact_parquet(spark, small, out, target_file_bytes=1 << 30)
    files = globmod.glob(f"{out}/part-*.parquet")
    assert len(files) == n == 1
    back = spark.read.parquet(out)
    assert back.count() == ev.count()
    assert (
        back.agg(F.sum("event_id")).collect()[0][0]
        == ev.agg(F.sum("event_id")).collect()[0][0]
    )


def test_overwrite_partitions_leaves_other_partitions_intact(spark, sf_dir, tmp_path):
    """Dynamic partition overwrite must replace only the partitions in
    the incoming frame — the idempotent-backfill contract."""
    from covid_data_challenge_spark.sources.readers import load_table
    from covid_data_challenge_spark.sources.sinks import (
        overwrite_partitions,
        write_parquet,
    )

    ev = load_table(spark, sf_dir, "events").select("event_id", "value", "event_type")
    gold = str(tmp_path / "gold")
    write_parquet(ev, gold, partition_by=["event_type"])

    patched = ev.filter(F.col("event_type") == "click").withColumn(
        "value", F.lit(0.0)
    )
    overwrite_partitions(patched, gold, partition_by=["event_type"])

    back = spark.read.parquet(gold)
    # the patched partition was replaced…
    assert back.filter((F.col("event_type") == "click") & (F.col("value") != 0.0)).count() == 0
    assert back.filter(F.col("event_type") == "click").count() == patched.count()
    # …and every other partition is byte-identical to the original
    others_before = ev.filter(F.col("event_type") != "click")
    others_after = back.filter(F.col("event_type") != "click")
    assert others_after.count() == others_before.count()
    assert others_after.exceptAll(others_before.select("event_id", "value", "event_type")).count() == 0


def test_orc_roundtrip_and_pushdown(spark, sf_dir, tmp_path):
    """The ORC gold twin must roundtrip values exactly and push
    predicates + projections into the scan like parquet."""
    from covid_data_challenge_spark.sources.readers import load_table
    from covid_data_challenge_spark.sources.sinks import read_orc, write_orc

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus"
    )
    path = str(tmp_path / "orders_orc")
    write_orc(orders, path)
    back = read_orc(spark, path)
    assert sorted(map(tuple, orders.collect())) == sorted(map(tuple, back.collect()))

    scan = back.filter(F.col("o_totalprice") > 100000).select("o_orderkey")
    plan = scan._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "PushedFilters" in plan and "o_totalprice" in plan.split("PushedFilters")[1].split("\n")[0]
    assert "ReadSchema" in plan  # projection reaches the ORC scan


def test_orc_partitioned_write_prunes(spark, sf_dir, tmp_path):
    """partition_by on the ORC sink must enable partition pruning for
    downstream readers (the pruned partition never appears in the scan)."""
    from covid_data_challenge_spark.sources.readers import load_table
    from covid_data_challenge_spark.sources.sinks import read_orc, write_orc

    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    path = str(tmp_path / "orders_orc_part")
    write_orc(orders, path, partition_by=["o_orderstatus"])
    back = read_orc(spark, path).filter(F.col("o_orderstatus") == "F")
    expected = orders.filter(F.col("o_orderstatus") == "F").count()
    assert back.count() == expected
    plan = back._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "PartitionFilters" in plan


def test_png_heatmap_sink_writes_decodable_png(spark, sf_dir, tmp_path):
    """S6 closed for real: render activity_heatmap's aggregate through
    the stdlib PNG encoder, then re-parse the file — signature, IHDR
    dimensions, chunk CRCs, and the zlib scanline stream must all check
    out, and a known-extreme cell must map to the right shade."""
    import struct
    import zlib

    import covid_data_challenge_spark.queries_ext  # noqa: F401
    from covid_data_challenge_spark.registry import REGISTRY
    from covid_data_challenge_spark.sources.sinks import write_png_heatmap

    feed = REGISTRY["activity_heatmap"].spark(spark, sf_dir)
    out = str(tmp_path / "heatmap.png")
    w, h = write_png_heatmap(feed, "dow", "hr", "n_events", out, cell_px=4)
    data = open(out, "rb").read()
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    # walk chunks, verify CRCs, collect IDAT
    pos, idat, dims = 8, b"", None
    while pos < len(data):
        (ln,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + ln]
        (crc,) = struct.unpack(">I", data[pos + 8 + ln : pos + 12 + ln])
        assert crc == (zlib.crc32(tag + payload) & 0xFFFFFFFF), tag
        if tag == b"IHDR":
            dims = struct.unpack(">II", payload[:8])
        if tag == b"IDAT":
            idat += payload
        pos += 12 + ln
    assert dims == (w, h) and tag == b"IEND"
    raw = zlib.decompress(idat)
    assert len(raw) == h * (w + 1)  # filter byte + one byte per px
    assert all(raw[r * (w + 1)] == 0 for r in range(h))  # filter None
    # the max-count cell must render as 255, the min-count cell darker
    rows = feed.collect()
    top = max(rows, key=lambda r: r["n_events"])
    r0 = min(r["dow"] for r in rows)
    c0 = min(r["hr"] for r in rows)
    px_row = (top["dow"] - r0) * 4
    px_col = (top["hr"] - c0) * 4
    shade = raw[px_row * (w + 1) + 1 + px_col]
    assert shade == 255


def test_png_heatmap_extent_guard_and_missing_sentinel(spark, tmp_path):
    """ADVICE r4: (a) a sparse feed with outlier coordinates must be
    rejected by the grid-extent guard even when the row count is tiny;
    (b) absent/null cells render as the reserved sentinel shade 0 while
    the true data minimum renders as 1 — missing is distinguishable
    from minimum."""
    import struct
    import zlib

    import pytest

    from covid_data_challenge_spark.sources.sinks import write_png_heatmap

    sparse = spark.createDataFrame(
        [(0, 0, 1.0), (1, 10_000_000, 2.0)], "r long, c long, v double"
    )
    with pytest.raises(ValueError, match="grid extent"):
        write_png_heatmap(sparse, "r", "c", "v", str(tmp_path / "sparse.png"))

    feed = spark.createDataFrame(
        [(0, 0, 5.0), (0, 1, None), (1, 1, 10.0)], "r long, c long, v double"
    )
    out = str(tmp_path / "sentinel.png")
    w, h = write_png_heatmap(feed, "r", "c", "v", out, cell_px=1)
    data = open(out, "rb").read()
    pos, idat = 8, b""
    while pos < len(data):
        (ln,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        if tag == b"IDAT":
            idat += data[pos + 8 : pos + 8 + ln]
        pos += 12 + ln
    raw = zlib.decompress(idat)

    def px(r, c):
        return raw[r * (w + 1) + 1 + c]

    assert px(0, 0) == 1  # true minimum — scaled floor is 1, not 0
    assert px(1, 1) == 255  # maximum
    assert px(0, 1) == 0  # null-valued cell → sentinel
    assert px(1, 0) == 0  # absent cell → sentinel
