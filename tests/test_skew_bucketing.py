"""Skew salting must be result-identical to the plain join/agg; bucketed
tables must equi-join with zero exchanges (the write-time shuffle claim)."""

from __future__ import annotations

from pyspark.sql import functions as F

from covid_data_challenge_spark.operators.skew import salted_agg_sum_count, salted_join
from covid_data_challenge_spark.sources.readers import load_table
from covid_data_challenge_spark.sources.sinks import write_bucketed_table


def _skewed_fixture(spark):
    """90% of rows on one key — the shape AQE's split can't fully fix."""
    hot = spark.range(0, 900).select(F.lit(1).alias("k"), F.col("id").alias("v"))
    cold = spark.range(0, 100).select((F.col("id") % 7 + 2).alias("k"), F.col("id").alias("v"))
    return hot.unionAll(cold)


def test_salted_join_matches_plain_join(spark):
    big = _skewed_fixture(spark)
    small = spark.range(1, 10).select(
        F.col("id").alias("k"), (F.col("id") * 100).alias("dim_val")
    )
    plain = big.join(small, "k").groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv"), F.max("dim_val").alias("d")
    )
    salted = salted_join(big, small, "k", salt=8).groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv"), F.max("dim_val").alias("d")
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_left_outer_keeps_unmatched(spark):
    big = _skewed_fixture(spark).filter(F.col("k") <= 3)
    small = spark.range(1, 3).select(F.col("id").alias("k"), F.lit("x").alias("d"))
    plain = big.join(small, "k", "left").select("k", "v", "d")
    salted = salted_join(big, small, "k", how="left", salt=4).select("k", "v", "d")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_rejects_unsupported_join_types(spark):
    """The small side is exploded ×salt, so right/full/semi/anti joins
    would return corrupted multiplicities — misuse must fail fast."""
    import pytest

    big = _skewed_fixture(spark)
    small = spark.range(1, 3).select(F.col("id").alias("k"), F.lit("x").alias("d"))
    for how in ("right", "full", "left_semi", "left_anti", "outer"):
        with pytest.raises(ValueError, match="salted_join supports"):
            salted_join(big, small, "k", how=how)


def test_salted_agg_matches_plain_agg(spark):
    df = _skewed_fixture(spark)
    plain = {
        r["k"]: (r["n_rows"], r["sum_v"])
        for r in df.groupBy("k")
        .agg(F.count(F.lit(1)).alias("n_rows"), F.sum("v").alias("sum_v"))
        .collect()
    }
    salted = {
        r["k"]: (r["n_rows"], r["sum_v"])
        for r in salted_agg_sum_count(df, "k", ["v"], salt=8).collect()
    }
    assert salted == plain


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    """orders ⋈ lineitem bucketed on orderkey: both shuffles disappear.
    (Managed tables land in ./spark-warehouse — dropped at the end.)"""
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    write_bucketed_table(
        orders.withColumnRenamed("o_orderkey", "k"), "orders_b", ["k"], num_buckets=8
    )
    write_bucketed_table(
        li.withColumnRenamed("l_orderkey", "k"), "lineitem_b", ["k"], num_buckets=8
    )
    # disable broadcast so the join would otherwise be a shuffled SMJ
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("orders_b").join(spark.table("lineitem_b"), "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # bucket-aligned: zero shuffles
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_history_bands_gold_join_is_shuffle_free_on_history(spark, sf_dir):
    """The incremental-dedup scale claim, proven: history MinHash bands
    materialized as a gold table bucketed on (band, bucket) serve the
    daily batch screen with NO exchange on the history side — only the
    (small) batch bands shuffle to align. At 100 TB the pay-once write
    replaces a per-ingest shuffle of the whole corpus."""
    from covid_data_challenge_spark.operators.dedup import (
        minhash_bands,
        minhash_signatures,
    )

    docs = load_table(spark, sf_dir, "documents")
    hist = docs.filter(F.col("doc_id") % 5 != 0)
    batch = docs.filter(F.col("doc_id") % 5 == 0)
    hb = minhash_bands(minhash_signatures(hist))
    write_bucketed_table(hb, "hist_bands_b", ["band", "bucket"], num_buckets=8)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        bb = minhash_bands(minhash_signatures(batch)).withColumnRenamed("id", "batch_doc")
        joined = spark.table("hist_bands_b").join(bb, ["band", "bucket"])
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # the history arm — everything between the join node and the
        # gold-table scan — must contain no Exchange (bucket-aligned);
        # only the batch side pays an alignment shuffle. (Sanity: with
        # an unbucketed history table this very segment shows
        # "Exchange hashpartitioning(band, bucket, ...)".)
        assert "hist_bands_b" in plan
        left, _, _ = plan.partition("hist_bands_b")
        hist_arm = left.split("SortMergeJoin")[-1]
        assert "Exchange" not in hist_arm
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS hist_bands_b")
