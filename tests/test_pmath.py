"""Portable-ln kernel (functions/pmath.py) and DSIR selection
(operators/dsir.py).

The kernel's whole contract is cross-engine bit-identity: the SAME
expression tree evaluated by Spark (JVM), DuckDB (C), and the Python
replica must produce the SAME 64 bits, and the replica must agree with
libm ln to ~1e-9 relative (the series' truncation bound). The DSIR tests
then pin the selection semantics on a constructed corpus where the
target-like documents are known.
"""

from __future__ import annotations

import math
import struct

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from covid_data_challenge_spark.functions.pmath import (
    portable_ln_py,
    portable_ln_sql_stages,
)

_SETTINGS = dict(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


def _bits(x: float) -> bytes:
    return struct.pack("<d", x)


@given(
    st.floats(min_value=1e-12, max_value=1e12, allow_nan=False, exclude_min=True)
)
@settings(**_SETTINGS)
def test_portable_ln_accuracy(x):
    """Replica vs libm: the atanh series through z^15 with |z| <= 1/3 is
    good to ~4.6e-10 relative truncation + a few ulp of accumulation."""
    got = portable_ln_py(x)
    want = math.log(x)
    assert math.isclose(got, want, rel_tol=1e-9, abs_tol=1e-12)


@given(
    a=st.integers(min_value=1, max_value=10**9),
    b=st.integers(min_value=1, max_value=10**9),
)
@settings(**_SETTINGS)
def test_portable_ln_duckdb_bit_identity(a, b):
    """DuckDB evaluates the staged SQL tree to the SAME 64 bits as the
    Python replica, on rationals a/b spanning ~18 orders of magnitude —
    exactly the inputs the DSIR model produces (smoothed count ratios).
    (Python floats are IEEE doubles with correctly-rounded arithmetic,
    so replica==DuckDB and replica==Spark together give DuckDB==Spark.)"""
    x = a / b
    if x <= 0 or not math.isfinite(x):  # pragma: no cover - guarded by ranges
        return
    stage, final = portable_ln_sql_stages({"l": f"(CAST({a} AS DOUBLE) / {b})"})
    con = duckdb.connect()
    got = con.execute(
        f"WITH s AS (SELECT {stage}), f AS (SELECT {final} FROM s) "
        "SELECT l FROM f"
    ).fetchone()[0]
    assert _bits(got) == _bits(portable_ln_py(x)), (x, got, portable_ln_py(x))


def test_portable_ln_spark_bit_identity(spark):
    """Spark evaluates portable_ln to the SAME 64 bits as the replica
    over a sweep of count-ratio-shaped rationals (incl. x<1 swap branch,
    exact powers of two, and x=1 → exactly 0.0)."""
    from pyspark.sql import functions as F

    from covid_data_challenge_spark.functions.pmath import portable_ln

    cases = (
        [(a, b) for a in (1, 2, 3, 7, 22, 1000, 999983) for b in (1, 3, 8, 2035, 10**6)]
        + [(1, 1), (4, 1), (1024, 1), (1, 1024)]
    )
    df = spark.createDataFrame(cases, "a long, b long").select(
        "a", "b", portable_ln(F.col("a").cast("double") / F.col("b")).alias("l")
    )
    for r in df.collect():
        x = r.a / r.b
        assert _bits(r.l) == _bits(portable_ln_py(x)), (r.a, r.b, r.l)
    # x = 1 must be exactly zero (e=0, z=0): the quantization floor(1e6*0)
    # sits on a boundary, so this case being exact matters
    assert portable_ln_py(1.0) == 0.0


def test_portable_ln_let_bit_equal_even_inside_case_when(spark):
    """portable_ln_let (the compact let-bound tree for conditional
    contexts — r7 fix for the janino-64KB interpreted fallback) must be
    bit-equal to portable_ln/portable_ln_py on the same sweep, INCLUDING
    when wrapped in a CASE WHEN branch (the shape that broke codegen),
    with codegen fallback disabled so a 64 KB regression fails loudly."""
    from pyspark.sql import functions as F

    from covid_data_challenge_spark.functions.pmath import portable_ln_let

    cases = (
        [(a, b) for a in (1, 2, 3, 7, 22, 1000, 999983) for b in (1, 3, 8, 2035, 10**6)]
        + [(1, 1), (4, 1), (1024, 1), (1, 1024)]
    )
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try:
        df = spark.createDataFrame(cases, "a long, b long").select(
            "a",
            "b",
            portable_ln_let(F.col("a").cast("double") / F.col("b")).alias("l"),
            F.when(
                F.col("a") > 0,
                F.floor(
                    F.lit(1000000.0)
                    * (
                        portable_ln_let(F.col("a").cast("double"))
                        - portable_ln_let(F.col("b").cast("double"))
                    )
                ).cast("long"),
            ).alias("u"),
        )
        for r in df.collect():
            assert _bits(r.l) == _bits(portable_ln_py(r.a / r.b)), (r.a, r.b)
            want = math.floor(
                1e6 * (portable_ln_py(float(r.a)) - portable_ln_py(float(r.b)))
            )
            assert r.u == want, (r.a, r.b)
    finally:
        spark.conf.set("spark.sql.codegen.fallback", "true")


@pytest.fixture(scope="module")
def dsir_corpus(spark):
    """20 target docs about 'quantum physics lab', 60 raw docs: 20 near
    the target vocabulary, 40 about cooking — the selected quarter(ish)
    must be exactly the physics-flavored raw docs."""
    rows = []
    for i in range(20):
        rows.append((i, f"quantum physics lab experiment {i % 3}", "tgt"))
    for i in range(20):
        rows.append((100 + i, f"quantum lab notes physics {i % 5}", "rawlike"))
    for i in range(40):
        rows.append((200 + i, f"butter flour sugar recipe oven {i % 7}", "rawfood"))
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_dsir_selects_target_like_docs(dsir_corpus):
    from pyspark.sql import functions as F

    from covid_data_challenge_spark.operators.dsir import dsir_select

    out = dsir_select(
        dsir_corpus, is_target=F.col("source") == "tgt", keep_frac=0.25
    ).collect()
    ids = {r.doc_id for r in out}
    # 60 raw docs, top quartile = 15 by threshold (ties all kept); every
    # selected doc must be physics-flavored, none from the cooking slice
    assert ids and ids <= set(range(100, 120)), sorted(ids)


def test_dsir_weights_order_docs_by_target_affinity(dsir_corpus):
    from pyspark.sql import functions as F

    from covid_data_challenge_spark.operators.dsir import dsir_doc_weights

    dw = dsir_doc_weights(dsir_corpus, is_target=F.col("source") == "tgt")
    rows = {r.doc_id: r.w_units for r in dw.collect() if not r.is_target}
    worst_physics = min(v for k, v in rows.items() if 100 <= k < 120)
    best_food = max(v for k, v in rows.items() if k >= 200)
    assert worst_physics > best_food


@given(st.floats(min_value=-40.0, max_value=40.0, allow_nan=False))
@settings(**_SETTINGS)
def test_portable_exp_accuracy(x):
    """Replica vs libm inside the clamp; saturation beyond it."""
    from covid_data_challenge_spark.functions.pmath import (
        EXP_CLAMP,
        portable_exp_py,
    )

    got = portable_exp_py(x)
    want = math.exp(max(min(x, EXP_CLAMP), -EXP_CLAMP))
    assert math.isclose(got, want, rel_tol=1e-11)


@given(
    a=st.integers(min_value=-(10**6), max_value=10**6),
    b=st.integers(min_value=1, max_value=10**5),
)
@settings(**_SETTINGS)
def test_portable_exp_duckdb_bit_identity(a, b):
    """DuckDB evaluates the exp tree to the same 64 bits as the replica
    on rationals a/b — the logit values a linear model produces."""
    from covid_data_challenge_spark.functions.pmath import (
        portable_exp_py,
        portable_exp_sql,
    )

    x = a / b
    con = duckdb.connect()
    got = con.execute(
        f"WITH s AS (SELECT CAST({a} AS DOUBLE) / {b} AS z) "
        f"SELECT {portable_exp_sql('z')} FROM s"
    ).fetchone()[0]
    assert _bits(got) == _bits(portable_exp_py(x)), (x, got)


def test_portable_exp_spark_bit_identity(spark):
    from pyspark.sql import functions as F

    from covid_data_challenge_spark.functions.pmath import (
        portable_exp,
        portable_exp_py,
    )

    cases = [(-35.0,), (-3.7,), (-0.5,), (0.0,), (0.3,), (1.0,), (7.25,), (29.9,), (35.0,)]
    df = spark.createDataFrame(cases, "x double").select(
        "x", portable_exp(F.col("x")).alias("e")
    )
    for r in df.collect():
        assert _bits(r.e) == _bits(portable_exp_py(r.x)), r.x


def test_lr_classifier_separates_separable_corpus(spark, dsir_corpus):
    """On the physics-vs-cooking fixture the trained classifier must
    rank essentially every physics doc above every cooking doc (the
    vocabularies are disjoint, so 3 GD steps are plenty), and raw
    physics-adjacent docs must score closer to the target than food
    docs do."""
    from pyspark.sql import functions as F

    from covid_data_challenge_spark.operators.lr import (
        lr_features,
        lr_score,
        lr_train,
    )

    feats = lr_features(
        dsir_corpus, is_target=F.col("source") == "tgt"
    ).localCheckpoint(eager=True)
    w = lr_train(feats)
    out = {r.doc_id: r.logit_units for r in lr_score(feats, w).collect()}
    physics_like = [v for k, v in out.items() if 100 <= k < 120]
    food = [v for k, v in out.items() if k >= 200]
    assert min(physics_like) > max(food)
    # target docs themselves must score at the top
    tgt = [v for k, v in out.items() if k < 20]
    assert min(tgt) > max(food)


def test_pr_auc_and_sweep_invariants(spark, sf_dir):
    """AP and the threshold sweep must obey the exact identities the
    distinct-logit derivation claims: AP in (0, 1]; the sweep's lowest
    threshold (0.0) selects every doc with recall 1.0, monotone
    non-increasing n_sel as the threshold rises, and tp consistent with
    precision·n_sel at every row."""
    import covid_data_challenge_spark.queries_ext  # noqa: F401
    from covid_data_challenge_spark.registry import REGISTRY

    ap = REGISTRY["classifier_eval_pr_auc"].spark(spark, sf_dir).collect()[0]
    assert 0.0 < ap.pr_auc <= 1.0
    # random-ranking baseline for AP is the positive prevalence
    prevalence = ap.n_pos / (ap.n_pos + ap.n_neg)
    assert ap.pr_auc >= prevalence * 0.5

    rows = sorted(
        REGISTRY["classifier_threshold_sweep"].spark(spark, sf_dir).collect(),
        key=lambda r: r.threshold,
    )
    assert len(rows) == 10 and rows[0].threshold == 0.0
    assert rows[0].n_sel == ap.n_pos + ap.n_neg
    assert rows[0].recall == 1.0
    for lo, hi in zip(rows, rows[1:]):
        assert lo.n_sel >= hi.n_sel and lo.tp >= hi.tp
    for r in rows:
        if r.n_sel:
            assert abs(r.precision * r.n_sel - r.tp) < 1e-6


def test_platt_fit_recovers_shift_on_miscalibrated_scores(spark):
    """On scores with a constant +4 logit offset the Platt fit (identity
    init) must drive the intercept toward -4 and cut the log-loss —
    the case the calibration machinery exists for."""
    from pyspark.sql import functions as F

    from covid_data_challenge_spark.operators.lr import lr_score, lr_train

    rows = []
    for i in range(200):
        y = float(i % 2)
        z = (3.0 if y else -3.0) + 4.0  # miscalibrated: everything positive
        rows.append((i, y, int(z * 1e9)))
    scored = spark.createDataFrame(rows, "doc_id long, y double, logit_units long")
    cal_feat = (
        scored.select(
            "doc_id", "y", F.lit(0).cast("int").alias("bucket"),
            (F.col("logit_units").cast("double") / F.lit(1e9)).alias("x"),
        )
        .unionAll(
            scored.select(
                "doc_id", "y", F.lit(-1).cast("int").alias("bucket"),
                F.lit(1.0).alias("x"),
            )
        )
        .localCheckpoint(eager=True)
    )
    w = lr_train(cal_feat, n_buckets=1, iters=12, rate=5.0, init_units={0: 1_000_000})
    ab = {r.bucket: r.w_units for r in w.collect()}
    assert ab[-1] < -500_000, ab  # intercept pulled strongly negative
    assert ab[0] > 0, ab
    # calibrated decisions must now separate the classes raw scores can't
    cal = lr_score(cal_feat, w)
    acc = cal.select(
        F.avg(
            F.when(
                ((F.col("logit_units") > 0) & (F.col("y") == 1.0))
                | ((F.col("logit_units") <= 0) & (F.col("y") == 0.0)),
                1.0,
            ).otherwise(0.0)
        ).alias("a")
    ).collect()[0].a
    assert acc > 0.95, acc  # raw scores give 0.5 (all positive)


def test_dsir_ess_flat_vs_degenerate_weights(spark, dsir_corpus, monkeypatch):
    """dsir_ess_report (r7): a raw source whose docs all look alike gets
    ess_frac near 1 (flat weights); planting ONE strongly target-like
    doc inside an otherwise-uniform source collapses its ESS toward a
    single effective sample."""
    from pyspark.sql import functions as F

    import covid_data_challenge_spark.queries_curation as qc
    from covid_data_challenge_spark.registry import REGISTRY

    extra = spark.createDataFrame(
        [(900, "quantum physics lab " * 12, "rawmix")]
        + [(901 + i, f"butter flour sugar recipe oven {i}", "rawmix")
           for i in range(9)],
        "doc_id long, text string, source string",
    )
    docs = dsir_corpus.unionByName(extra)
    monkeypatch.setattr(qc, "_docs", lambda spark, sf: docs)
    monkeypatch.setattr(
        qc, "_DSIR_TARGET_SOURCES", ("tgt",), raising=False
    )
    out = {r.source: r for r in
           REGISTRY["dsir_ess_report"].spark(spark, "unused").collect()}
    assert set(out) == {"rawlike", "rawfood", "rawmix"}
    # homogeneous sources keep a healthy effective fraction (the {i%k}
    # digit wobble still spreads hashed-bucket weights a bit)
    assert out["rawfood"].ess_frac > 0.4
    assert out["rawlike"].ess_frac > 0.4
    # the planted dominant doc collapses the mixed source's ESS to ~1
    # effective sample
    assert out["rawmix"].n_docs == 10
    assert out["rawmix"].ess_frac < 0.2, out["rawmix"]
    assert out["rawmix"].ess_frac < out["rawfood"].ess_frac
    assert out["rawmix"].ess_frac < out["rawlike"].ess_frac
    for r in out.values():  # 1 <= ESS <= n always
        assert 1.0 <= r.ess <= r.n_docs + 1e-6
