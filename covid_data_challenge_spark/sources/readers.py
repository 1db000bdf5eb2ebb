"""Typed source readers (SURVEY.md §2.1, S1–S4).

The reference scans two external sources with inferred schemas:

- a wide historical time-series CSV (``data_loader.py:32-69`` in the
  reference): here ``read_history_csv`` with an explicit ``StructType``
  (schema-on-read inference is a full extra pass over 100 TB — never
  acceptable at scale) plus an ``infer`` escape hatch for parity;
- a JSON array of nested records (``data_loader.py:124-218``): here
  ``spark.read.json`` + a nested-struct flatten ``select`` replacing the
  reference's record-by-record Python loop.

Parquet loaders for the driver's synthetic tables live here too; every
query in the engine goes through them so column pruning / predicate
pushdown reach the parquet scan.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one synthetic table. Plain ``spark.read.parquet`` so Catalyst
    can push filters and prune columns into the scan.

    The ``events`` table has shipped as TIMESTAMP(NANOS) (a parquet type
    Spark refuses by default — read via the nanos-as-long escape hatch and
    truncated to µs, matching DuckDB's ns → µs coercion) and, in later
    driver drops, as naive TIMESTAMP(MICROS), which Spark 4 infers as
    TIMESTAMP_NTZ. NTZ breaks epoch arithmetic (`cast(ts as double)`,
    `unix_micros`) and streaming watermarks, so any NTZ column is
    normalized to session-tz TIMESTAMP: with the UTC session the engine
    pins (session.py), the wall-clock — which is what the DuckDB oracle
    compares — is preserved exactly. Our own session also disables
    `parquet.inferTimestampNTZ` so the scan itself yields TIMESTAMP and
    ts-predicates keep pushing down; the cast below is the safety net for
    foreign sessions (e.g. the driver's) that keep NTZ inference on.
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        try:
            raw = spark.read.parquet(path)
        finally:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
        if dict(raw.dtypes).get("ts") == "bigint":
            raw = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    else:
        raw = spark.read.parquet(path)
    ntz_cols = [c for c, t in raw.dtypes if t == "timestamp_ntz"]
    if ntz_cols:
        raw = raw.withColumns(
            {c: F.col(c).cast("timestamp") for c in ntz_cols}
        )
    return raw


def widen(df: DataFrame) -> DataFrame:
    """Restore scan parallelism lost to unsplittable tiny inputs
    (optimization guide §2.5, input skew: "one huge unsplittable file …
    repartition immediately after the read").

    The driver's fixture tables each ship as ONE parquet file with ONE
    row group, so every scan plans a single task and any per-row-heavy
    stage fused onto it (n-gram explode + md5, EM expectation passes,
    LR feature builds, embedding folds) runs on 1 of the N cores — the
    round-12 profile measured gopher's gram stage at 52.8 s single-task
    vs 2.9 s after a 32-way repartition. This helper is deliberately
    conditional so it is scale-adaptive, not a local[32] constant:

    - when the scan already plans >= defaultParallelism partitions (any
      realistically-sized input, e.g. the 100 TB layout of 128 MB+
      multi-row-group files), it is a NO-OP — no exchange is added and
      the plan is byte-identical to the unwidened one;
    - only when the planned scan parallelism is below the core count
      does it pay one round-robin exchange of the (by construction
      tiny — it fit in fewer splits than cores) input.

    Apply it at compute-heavy call sites only; cheap scan+agg queries
    keep their exchange-free plans (and their plan-pin tests).
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)


def load_tables(spark: SparkSession, sf_dir: str, names=TESTDATA_TABLES) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in names}


def register_views(spark: SparkSession, sf_dir: str, names=TESTDATA_TABLES) -> None:
    """Expose the tables as temp views so the whole surface is reachable
    from ``spark.sql`` — the same names the DuckDB oracle uses, so any
    oracle SQL in the registry is also (modulo dialect) a runnable Spark
    SQL query against these views."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


# --- Historical time-series CSV (reference: OWID-shaped) -------------------

# The 15 key columns the reference projects right after scan
# (reference data_loader.py:92-112); declared, not inferred.
HISTORY_SCHEMA = T.StructType(
    [
        T.StructField("iso_code", T.StringType()),
        T.StructField("location", T.StringType()),
        T.StructField("date", T.DateType()),
        T.StructField("population", T.LongType()),
        T.StructField("total_cases", T.DoubleType()),
        T.StructField("new_cases", T.DoubleType()),
        T.StructField("total_deaths", T.DoubleType()),
        T.StructField("new_deaths", T.DoubleType()),
        T.StructField("total_tests", T.DoubleType()),
        T.StructField("new_tests", T.DoubleType()),
        T.StructField("people_vaccinated", T.DoubleType()),
        T.StructField("people_fully_vaccinated", T.DoubleType()),
        T.StructField("total_vaccinations", T.DoubleType()),
        T.StructField("tests_per_case", T.DoubleType()),
        T.StructField("positive_rate", T.DoubleType()),
    ]
)

#: Aggregate pseudo-entities excluded at scan (reference data_loader.py:115).
EXCLUDE_ISO_PREFIX = "OWID_"


def read_history_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = HISTORY_SCHEMA,
    infer: bool = False,
) -> DataFrame:
    """CSV scan with declared schema (S1) + rename + early entity filter.

    Mirrors reference ``load_owid_data`` (data_loader.py:32-69): project the
    key columns, rename ``location`` → ``country``, drop aggregate rows.
    The filter is a scan-level predicate so it pushes down.
    """
    reader = spark.read.option("header", True)
    if infer or schema is None:
        reader = reader.option("inferSchema", True)
    else:
        reader = reader.schema(schema)
    df = reader.csv(path)
    if "location" in df.columns:
        df = df.withColumnRenamed("location", "country")
    if "iso_code" in df.columns:
        df = df.filter(
            ~F.coalesce(F.col("iso_code").startswith(EXCLUDE_ISO_PREFIX), F.lit(False))
        )
    return df


# --- Snapshot JSON (reference: disease.sh-shaped) ---------------------------

SNAPSHOT_SCHEMA = T.StructType(
    [
        T.StructField("country", T.StringType()),
        T.StructField(
            "countryInfo",
            T.StructType(
                [
                    T.StructField("_id", T.LongType()),
                    T.StructField("iso2", T.StringType()),
                    T.StructField("iso3", T.StringType()),
                    T.StructField("lat", T.DoubleType()),
                    T.StructField("long", T.DoubleType()),
                    T.StructField("flag", T.StringType()),
                ]
            ),
        ),
        T.StructField("cases", T.LongType()),
        T.StructField("deaths", T.LongType()),
        T.StructField("recovered", T.LongType()),
        T.StructField("active", T.LongType()),
        T.StructField("critical", T.LongType()),
        T.StructField("casesPerOneMillion", T.DoubleType()),
        T.StructField("deathsPerOneMillion", T.DoubleType()),
        T.StructField("tests", T.LongType()),
        T.StructField("testsPerOneMillion", T.DoubleType()),
        T.StructField("population", T.LongType()),
        T.StructField("todayCases", T.LongType()),
        T.StructField("todayDeaths", T.LongType()),
        T.StructField("todayRecovered", T.LongType()),
        T.StructField("updated", T.LongType()),
    ]
)


def read_snapshot_json(spark: SparkSession, path: str, multi_line: bool = True) -> DataFrame:
    """JSON scan (S2) → flattened snapshot (S3, S4).

    Replaces the reference's requests.get + per-record dict flatten
    (data_loader.py:124-218) with a declarative nested-struct select.
    """
    raw = spark.read.schema(SNAPSHOT_SCHEMA).option("multiLine", multi_line).json(path)
    return flatten_snapshot(raw)


def flatten_snapshot(raw: DataFrame) -> DataFrame:
    """Nested-struct projection (S3) + epoch-ms → timestamp (S4)."""
    return raw.select(
        F.col("country"),
        F.col("countryInfo.iso3").alias("iso_code"),
        F.col("countryInfo.iso2").alias("iso2_code"),
        F.col("countryInfo._id").alias("country_id"),
        F.col("countryInfo.lat").alias("latitude"),
        F.col("countryInfo.long").alias("longitude"),
        F.col("countryInfo.flag").alias("flag_url"),
        F.col("cases").alias("current_cases"),
        F.col("deaths").alias("current_deaths"),
        F.col("recovered").alias("current_recovered"),
        F.col("active").alias("current_active"),
        F.col("critical").alias("current_critical"),
        F.col("casesPerOneMillion").alias("cases_per_million"),
        F.col("deathsPerOneMillion").alias("deaths_per_million"),
        F.col("tests").alias("tests_total"),
        F.col("testsPerOneMillion").alias("tests_per_million"),
        F.col("population"),
        F.col("todayCases").alias("today_cases"),
        F.col("todayDeaths").alias("today_deaths"),
        F.col("todayRecovered").alias("today_recovered"),
        F.timestamp_millis(F.col("updated")).alias("last_updated"),
    )


def read_jsonl_with_quarantine(
    spark: SparkSession, path: str, schema: T.StructType
) -> tuple[DataFrame, DataFrame]:
    """Malformed-input-tolerant JSON-lines scan: returns (good, quarantine).

    The reference tolerates bad payloads by try/except around the whole
    fetch (data_loader.py:124-163) — all-or-nothing. At pipeline scale a
    single bad line must not poison a 100 TB ingest, and silently
    dropping it (DROPMALFORMED) destroys the audit trail. PERMISSIVE
    mode + ``columnNameOfCorruptRecord`` routes every unparseable line
    into a dead-letter frame instead: ``good`` carries the declared
    schema, ``quarantine`` carries the raw offending text for replay.
    Both come from ONE scan (the split is two filters on a cached plan,
    and the corrupt column is pruned out of ``good``).
    """
    with_corrupt = T.StructType(
        schema.fields + [T.StructField("_corrupt_record", T.StringType())]
    )
    raw = (
        spark.read.schema(with_corrupt)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
        .cache()  # Spark disallows filtering a raw scan on ONLY the
        # corrupt column (QUERY_ONLY_CORRUPT_RECORD_COLUMN); caching the
        # parsed batch is the documented pattern and also makes the
        # good/quarantine split one parse instead of two.
    )
    good = raw.filter(F.col("_corrupt_record").isNull()).drop("_corrupt_record")
    quarantine = raw.filter(F.col("_corrupt_record").isNotNull()).select(
        F.col("_corrupt_record").alias("raw_line")
    )
    return good, quarantine
