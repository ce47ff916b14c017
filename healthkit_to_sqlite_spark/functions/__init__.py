"""Reusable Column-expression helpers shared by operators.

Everything here returns JVM-side Column expressions (whole-stage
codegen eligible) — no Python UDFs.  The decimal helpers exist because
the driver's correctness gate hash-compares our values against a DuckDB
oracle: double-precision SUMs are order-dependent across engines, but
decimal arithmetic is exact and associative, so we cast measure columns
to decimal before aggregating and back to double after.  This costs a
little CPU but buys bit-exact reproducibility — a property worth having
at 100 TB too (deterministic reruns, auditable pipelines).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Decimal type wide enough for TPC-H-ish money/quantity columns.
DEC = "decimal(18,2)"


def dec(col: Column | str, typ: str = DEC) -> Column:
    """Cast a double measure to exact decimal for associative aggregation."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(typ)


def dec_sum(col: Column | str, typ: str = DEC) -> Column:
    """SUM over exact decimals, surfaced as double (bit-exact across engines)."""
    return F.sum(dec(col, typ)).cast("double")


def dec_avg(col: Column | str, typ: str = DEC) -> Column:
    """AVG computed as exact-decimal SUM / COUNT, surfaced as double.

    Built-in avg() accumulates in double (order-dependent); this variant
    does the single rounding at the end.
    """
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(dec(c, typ)).cast("double") / F.count(c)).cast("double")


def revenue(extendedprice: str = "l_extendedprice", discount: str = "l_discount") -> Column:
    """TPC-H style revenue term: extendedprice * (1 - discount), exact."""
    return dec(extendedprice) * (F.lit(1).cast(DEC) - dec(discount))


def ws_tokens(col: Column | str) -> Column:
    """Whitespace tokenization (matches DuckDB ``string_split(x, ' ')``)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(c, " ")


def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<float|double> columns, in double.

    Pure builtin expressions (zip_with + aggregate) — stays JVM-side,
    no UDF, vectorizable by codegen; at scale this is the hot inner
    loop of brute-force similarity search.
    """
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, v: acc + v)
    return dot / (l2_norm(a) * l2_norm(b))


def l2_norm(a: Column) -> Column:
    """L2 norm of an array column, in double (index-order fold)."""
    return F.sqrt(F.aggregate(
        a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")))


def cosine_from_norms(a: Column, b: Column, na: Column, nb: Column) -> Column:
    """cosine_similarity with the norms supplied as columns.

    In a pair join each vector participates in many pairs; computing
    the norm fold per PAIR does 3 array folds per output row where 1
    suffices.  Materializing ``l2_norm`` once per vector before the
    join and dividing here is the same arithmetic bit-for-bit
    (sqrt-per-vector, multiply, divide — order unchanged), so oracles
    that spell dot/(|a|·|b|) stay exact; only the fold count drops."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, v: acc + v)
    return dot / (na * nb)


def one_slice_df(spark, rows, schema):
    """Local relation as ONE slice.  A bare ``createDataFrame(rows)``
    parallelizes even a handful of rows to one slice PER CORE, so
    every downstream job over it launches a task per core (32 at
    local[32]) and every write/exchange pays a 32-task stage —
    measured 7.3-8.7 CPU-s per 10-row state write vs 0.44-0.47 with
    one explicit slice (r15).  Rows and schema semantics are
    unchanged; only the slicing is."""
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), schema)
