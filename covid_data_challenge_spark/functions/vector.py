"""Vector expression library over ``array<float>`` embedding columns.

Dot products, norms, and cosine similarity as built-in higher-order
functions (``zip_with`` + ``aggregate``) — JVM-side, no UDF, no Python in
the loop. Accumulation is an ordered left fold in DOUBLE, which makes the
result deterministic and engine-comparable (a float32 fold would not be).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _fold_sum(arr: Column) -> Column:
    """Ordered left-fold sum in double precision."""
    return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return _fold_sum(F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")))


def norm(a: Column) -> Column:
    return F.sqrt(_fold_sum(F.transform(a, lambda x: x.cast("double") * x.cast("double"))))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; 0.0 when either vector has zero norm."""
    d, na, nb = dot(a, b), norm(a), norm(b)
    return F.when((na > 0) & (nb > 0), d / (na * nb)).otherwise(F.lit(0.0))


def l2sq(a: Column, b: Column) -> Column:
    """Squared Euclidean distance (the PQ/k-means metric) as an ordered
    double fold — deterministic like the rest of this module."""
    return _fold_sum(
        F.zip_with(
            a,
            b,
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        )
    )


def lit_double_array(values) -> Column:
    """``array<double>`` LITERAL from ONE parsed SQL expression.

    ``F.array(*[F.lit(float(x)) for x in values])`` costs one py4j
    round trip per element: a 64-dim constant vector is ~65 JVM calls
    and a 48-plane LSH set ~3×10³, which measured SECONDS of driver
    time per query construction (optimization guide §5 — the driver is
    part of the query path; ann_lsh_topk spent 7.1 s of its 8.8 s total
    CONSTRUCTING the plan). One ``F.expr`` string is a single call and
    parses to the same doubles bit-exactly: ``repr()`` emits the
    shortest round-trip decimal and Spark's double-literal parse is
    correctly rounded (verified incl. -0.0, subnormals, ±1e300).
    Finite values only — engine constants are finite by construction,
    and the guard keeps a stray NaN from parsing as a column name."""
    parts = []
    for v in values:
        f = float(v)
        if f != f or f in (float("inf"), float("-inf")):
            raise ValueError(f"lit_double_array: non-finite literal {f!r}")
        parts.append(repr(f) + "D")
    return F.expr("array(" + ",".join(parts) + ")")


def to_double(a: Column) -> Column:
    """Materialize a float32 embedding as array<double> ONCE per vector.
    In O(n²) pair loops the per-pair fold then skips 2·dim float→double
    casts (Catalyst's SimplifyCasts elides the now-redundant casts inside
    dot/norm): measured 1.6× on the exact near-dup pair scan. Use only
    where the arrays do NOT cross a shuffle — double arrays are 2× the
    bytes of the float originals."""
    return F.transform(a, lambda x: x.cast("double"))
