"""Engine-portable transcendental kernels built from correctly-rounded ops.

The oracle gate (testing.values_match) requires float outputs to be
BIT-exact between Spark (JVM ``java.lang.Math``) and DuckDB (C
``std::log``). The two libm implementations disagree in the last ulp on
~1% of inputs (measured: ``ln(22/2035)`` differs), so any query whose
hash depends on ``F.ln``/``F.exp`` cannot be oracle-checked. IEEE 754
however *guarantees* correct rounding for ``+ - * /`` and integer ops —
identical bit patterns on every conforming engine.

``portable_ln`` therefore evaluates a natural log using only those ops:

    y  = 1/x if x < 1 else x            (one correctly-rounded divide)
    e  = floor(log2(y))                 (bit-length of floor(y) — integer)
    m  = y / 2^e                        (2^e exact via shift; m in [1,2))
    z  = (m-1)/(m+1)                    (|z| <= 1/3)
    s  = z * Horner(z^2; 1, 1/3, ... 1/15)   (atanh series, 8 terms)
    ln = e*LN2 + 2*s, negated if x < 1

Truncation error <= z^17/17 ~ 4.6e-10 relative — but accuracy is NOT the
point: both engines run the *same expression tree*, so the results are
bit-identical by construction, and quantizing (``floor(1e6 * ln)``) is
then deterministic cross-engine. The three builders below emit the same
tree for Spark Columns, DuckDB SQL stages, and pure Python (the test
replica); keep them in lockstep — any re-association breaks bit-parity.

Used by operators/dsir.py (importance-weight log-ratios). Reference has
no equivalent (pandas uses numpy's libm and never cross-checks engines).
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

#: shortest-repr double literals — parse identically in JVM, C, Python
LN2 = 0.6931471805599453
#: atanh series 1/(2k+1), k = 0..7 (terms through z^15)
COEFFS = tuple(1.0 / (2 * k + 1) for k in range(8))


def portable_ln(x: Column) -> Column:
    """Natural log of a strictly-positive Column, bit-reproducible on
    any IEEE-754 engine that evaluates the same tree (see module doc).
    Association is load-bearing: keep in lockstep with
    :func:`portable_ln_sql_stages` and :func:`portable_ln_py`."""
    y = F.when(x < 1, F.lit(1.0) / x).otherwise(x.cast("double"))
    e = F.length(F.bin(F.floor(y).cast("long"))) - F.lit(1)
    # the F.shiftleft wrapper only accepts a literal shift — call the
    # SQL function, which takes a column shift amount
    p2 = F.call_function("shiftleft", F.lit(1).cast("long"), e).cast("double")
    m = y / p2
    z = (m - F.lit(1.0)) / (m + F.lit(1.0))
    z2 = z * z
    acc = F.lit(COEFFS[-1])
    for c in reversed(COEFFS[:-1]):
        acc = F.lit(c) + z2 * acc
    ln_y = e.cast("double") * F.lit(LN2) + F.lit(2.0) * (z * acc)
    return F.when(x < 1, -ln_y).otherwise(ln_y)


def portable_ln_let(x: Column) -> Column:
    """:func:`portable_ln` with let-bound internals — bit-identical
    output, compact expression tree.

    ``portable_ln`` reuses its Python locals (y inside e/m, z inside the
    Horner chain), so the Column DAG expands to a TREE of thousands of
    nodes. Codegen's subexpression elimination collapses it again — but
    ONLY when the expression is unconditional: inside a ``CASE WHEN``
    branch elimination is disabled, the generated method crosses
    janino's 64 KB limit, and the whole stage silently falls back to
    interpreted execution (the r6 ``unigram_lm_em*`` defect; the
    ``ERROR CodeGenerator`` stack trace in BENCH_r06.json's tail).

    Here every intermediate is bound ONCE through :func:`let`
    (single-element-array transform), so the tree stays ~linear in the
    series length. The arithmetic and association are identical —
    outputs are bit-equal to :func:`portable_ln` — but the HOF nodes
    evaluate interpreted, so use THIS variant inside conditionals /
    vocab-sized projections and keep plain ``portable_ln`` on
    unconditional hot paths where elimination works and codegen wins."""
    from covid_data_challenge_spark.functions.text import let

    def with_y(y: Column) -> Column:
        def with_e(e: Column) -> Column:
            p2 = F.call_function("shiftleft", F.lit(1).cast("long"), e).cast("double")

            def with_m(m: Column) -> Column:
                def with_z(z: Column) -> Column:
                    def with_z2(z2: Column) -> Column:
                        acc = F.lit(COEFFS[-1])
                        for c in reversed(COEFFS[:-1]):
                            acc = F.lit(c) + z2 * acc
                        return e.cast("double") * F.lit(LN2) + F.lit(2.0) * (z * acc)

                    return let(z * z, with_z2)

                return let((m - F.lit(1.0)) / (m + F.lit(1.0)), with_z)

            return let(y / p2, with_m)

        return let(F.length(F.bin(F.floor(y).cast("long"))) - F.lit(1), with_e)

    ln_y = let(
        F.when(x < 1, F.lit(1.0) / x).otherwise(x.cast("double")), with_y
    )
    return F.when(x < 1, -ln_y).otherwise(ln_y)


def portable_ln_sql_stages(args: dict[str, str]) -> tuple[str, str]:
    """DuckDB replay of :func:`portable_ln` for several inputs at once.

    ``args`` maps output column name -> SQL expression (strictly
    positive). Returns ``(stage_columns, final_columns)``: splice
    ``stage_columns`` into one CTE SELECT and ``final_columns`` into the
    next (the split keeps each subexpression a named column, so the
    generated SQL stays linear in series length instead of exploding the
    nested tree textually).

    Example::

        WITH a AS (SELECT bucket, <stage_columns> FROM grid),
             l AS (SELECT bucket, <final_columns> FROM a)
    """
    stage, final = [], []
    for name, expr in args.items():
        stage.append(
            f"CASE WHEN ({expr}) < 1 THEN 1.0 / ({expr}) "
            f"ELSE CAST(({expr}) AS DOUBLE) END AS {name}__y"
        )
        stage.append(f"(({expr}) < 1) AS {name}__swap")
        final_parts = _pln_from_y(f"{name}__y")
        final.append(
            f"CASE WHEN {name}__swap THEN -({final_parts}) "
            f"ELSE ({final_parts}) END AS {name}"
        )
    return ", ".join(stage), ", ".join(final)


def _pln_from_y(y: str) -> str:
    """ln(y) for y >= 1 as one SQL expression over the staged column
    ``y`` — mirrors portable_ln's tree exactly (e/m/z inlined; repeated
    subterms stay textually identical, which is what bit-parity needs)."""
    e = f"(length(bin(CAST(floor({y}) AS BIGINT))) - 1)"
    m = f"({y} / CAST((CAST(1 AS BIGINT) << {e}) AS DOUBLE))"
    z = f"(({m} - 1.0) / ({m} + 1.0))"
    z2 = f"({z} * {z})"
    acc = repr(COEFFS[-1])
    for c in reversed(COEFFS[:-1]):
        acc = f"({c!r} + ({z2} * {acc}))"
    return f"((CAST({e} AS DOUBLE) * {LN2!r}) + (2.0 * ({z} * {acc})))"


#: exp clamp: sigmoid(±30) is within 1e-13 of 0/1, and the clamp keeps
#: the power-of-two range reduction inside exact long shifts
EXP_CLAMP = 30.0
#: Taylor 1/n! through n=13 (r <= ln2 after reduction → error ~ 1e-12)
EXP_COEFFS = tuple(1.0 / math.factorial(n) for n in range(14))


def portable_exp(x: Column) -> Column:
    """e^x for |x| <= EXP_CLAMP (clamped beyond), bit-reproducible on
    any IEEE-754 engine evaluating the same tree. Range-reduce by
    powers of two — k = floor(x/ln2), r = x - k*ln2 ∈ [0, ln2) — then a
    13-term Taylor Horner in r; 2^k is an exact long shift (inverted by
    one exact division for negative k). Keep in lockstep with
    :func:`portable_exp_sql` and :func:`portable_exp_py`."""
    xc = F.greatest(F.least(x.cast("double"), F.lit(EXP_CLAMP)), F.lit(-EXP_CLAMP))
    k = F.floor(xc / F.lit(LN2)).cast("int")
    r = xc - k.cast("double") * F.lit(LN2)
    acc = F.lit(EXP_COEFFS[-1])
    for c in reversed(EXP_COEFFS[:-1]):
        acc = F.lit(c) + r * acc
    p2 = F.call_function("shiftleft", F.lit(1).cast("long"), F.abs(k)).cast("double")
    return F.when(k >= 0, acc * p2).otherwise(acc / p2)


def portable_exp_sql(expr: str) -> str:
    """DuckDB twin of :func:`portable_exp` as one scalar expression over
    ``expr`` (name a staged column first — the tree references it ~16
    times)."""
    xc = f"greatest(least(CAST(({expr}) AS DOUBLE), {EXP_CLAMP!r}), {-EXP_CLAMP!r})"
    k = f"CAST(floor({xc} / {LN2!r}) AS INT)"
    r = f"({xc} - (CAST({k} AS DOUBLE) * {LN2!r}))"
    acc = repr(EXP_COEFFS[-1])
    for c in reversed(EXP_COEFFS[:-1]):
        acc = f"({c!r} + ({r} * {acc}))"
    p2 = f"CAST((CAST(1 AS BIGINT) << abs({k})) AS DOUBLE)"
    return f"CASE WHEN {k} >= 0 THEN ({acc} * {p2}) ELSE ({acc} / {p2}) END"


def portable_exp_py(x: float) -> float:
    """Pure-Python replica of :func:`portable_exp`."""
    xc = max(min(float(x), EXP_CLAMP), -EXP_CLAMP)
    k = int(math.floor(xc / LN2))
    r = xc - float(k) * LN2
    acc = EXP_COEFFS[-1]
    for c in reversed(EXP_COEFFS[:-1]):
        acc = c + r * acc
    p2 = float(1 << abs(k))
    return acc * p2 if k >= 0 else acc / p2


def portable_ln_py(x: float) -> float:
    """Pure-Python replica (CPython floats are IEEE doubles with
    correctly-rounded arithmetic — bit-identical to the engines)."""
    if x <= 0:
        raise ValueError("portable_ln needs x > 0")
    swap = x < 1
    y = 1.0 / x if swap else float(x)
    e = int(y).bit_length() - 1
    m = y / float(1 << e)
    z = (m - 1.0) / (m + 1.0)
    z2 = z * z
    acc = COEFFS[-1]
    for c in reversed(COEFFS[:-1]):
        acc = c + z2 * acc
    ln_y = float(e) * LN2 + 2.0 * (z * acc)
    return -ln_y if swap else ln_y
