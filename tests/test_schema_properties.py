"""Property-based tests for the schema-inference type system.

The widening unification (operators/schema_infer.py) replaces the
reference's order-dependent first-seen-wins typing (core.rs:219-226).
The whole point of the replacement is an algebraic property — the
result must not depend on row order or partitioning — so that property
is tested *as a property* here, with hypothesis driving the pure
lattice model, plus a deterministic cross-engine corpus proving the
Spark cascade and the DuckDB oracle cascade classify identically on
the value shapes the engine supports.
"""

from __future__ import annotations

import random

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

TAGS = ["INTEGER", "REAL", "DATE", "TIMESTAMP", "TEXT"]


def py_unify(tags: list[str | None]) -> str:
    """Pure-python model of operators.schema_infer.unify_tags."""
    s = set(t for t in tags if t is not None)
    if not s:
        return "TEXT"
    if s == {"INTEGER"}:
        return "INTEGER"
    if s <= {"INTEGER", "REAL"}:
        return "REAL"
    if s == {"DATE"}:
        return "DATE"
    if s == {"TIMESTAMP"}:
        return "TIMESTAMP"
    return "TEXT"


# --- lattice algebra (pure, fast, many examples) --------------------------

tag_lists = st.lists(st.sampled_from(TAGS + [None]), min_size=0, max_size=12)


@given(tag_lists, st.randoms())
def test_unify_is_order_and_partition_independent(tags, rnd):
    """Any shuffle AND any partitioning of the same evidence unifies
    identically: resolve(S) == resolve(union of per-chunk tag sets) —
    the property that makes partial aggregation safe on any cluster."""
    base = py_unify(tags)
    shuffled = tags[:]
    rnd.shuffle(shuffled)
    assert py_unify(shuffled) == base
    # split into arbitrary chunks; merging chunk evidence = set union
    if tags:
        k = rnd.randint(1, len(tags))
        chunks = [tags[i::k] for i in range(k)]
        merged: set[str] = set()
        for c in chunks:
            merged |= {t for t in c if t is not None}
        assert py_unify(sorted(merged)) == base


@given(tag_lists)
def test_unify_is_idempotent_and_monotone(tags):
    """Adding the already-inferred tag never changes the result, and
    adding TEXT evidence always forces TEXT (top of the lattice)."""
    base = py_unify(tags)
    assert py_unify(tags + [base]) == base or base == "TEXT"
    assert py_unify(tags + ["TEXT"]) == "TEXT"


@given(st.sampled_from(TAGS), st.sampled_from(TAGS))
def test_unify_pairs_match_lattice(a, b):
    """The full 5×5 join table: symmetric, reflexive, and only the
    INTEGER⊂REAL edge widens inside a family — everything else
    escalates to TEXT."""
    got = py_unify([a, b])
    assert got == py_unify([b, a])
    if a == b:
        assert got == a
    elif {a, b} == {"INTEGER", "REAL"}:
        assert got == "REAL"
    else:
        assert got == "TEXT"


# --- cross-engine cascade agreement (deterministic corpus) ----------------


def _corpus(n=400, seed=42) -> list[str]:
    """Curated generator covering every cascade branch + adversarial
    shapes, all within the domain where Spark and DuckDB provably agree
    (see test_documented_cascade_divergences for the two exceptions)."""
    r = random.Random(seed)
    vals: list[str] = []
    for _ in range(n):
        kind = r.randrange(10)
        if kind == 0:
            vals.append(str(r.randint(-2**63, 2**63 - 1)))
        elif kind == 1:
            vals.append(str(r.randint(-10**25, 10**25)))  # beyond int64 → REAL
        elif kind == 2:
            vals.append(repr(r.uniform(-1e6, 1e6)))
        elif kind == 3:
            vals.append(f"{r.uniform(-1, 1):.3e}")
        elif kind == 4:
            vals.append(f"{r.randint(1900, 2100):04d}-{r.randint(1, 12):02d}-{r.randint(1, 28):02d}")
        elif kind == 5:
            vals.append(f"{r.randint(1900, 2100):04d}-{r.randint(1, 12):02d}-"
                        f"{r.randint(1, 28):02d} {r.randint(0, 23):02d}:"
                        f"{r.randint(0, 59):02d}:{r.randint(0, 59):02d}")
        elif kind == 6:
            vals.append("".join(r.choices("abz XY-_.", k=r.randint(1, 12))))
        elif kind == 7:
            vals.append(r.choice(["", " ", "NaN", "inf", "+3", "007", "-0",
                                  "1.", ".5", "-.", "0x1A", "1,5",
                                  "2024-02-30", "2024-13-01",
                                  "1999-12-31 23:59:60"]))
        elif kind == 8:
            vals.append(str(r.randint(0, 9)) * r.randint(1, 30))
        else:
            vals.append(f"{r.randint(-999, 999)}.{r.randint(0, 999999)}")
    return vals


def test_cascade_agrees_across_engines_and_model(spark):
    import duckdb
    from healthkit_to_sqlite_spark.operators.schema_infer import (
        _CASCADE_SQL, type_tag)

    vals = _corpus()
    sdf = spark.createDataFrame([(v,) for v in vals], "value string")
    spark_tags = dict((r["value"], r["t"]) for r in
                      sdf.select("value", type_tag(F.col("value")).alias("t"))
                      .collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE t(value VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in vals])
    duck_tags = dict(con.execute(f"SELECT value, {_CASCADE_SQL} FROM t").fetchall())
    diffs = [(v, spark_tags[v], duck_tags[v]) for v in set(vals)
             if spark_tags[v] != duck_tags[v]]
    assert not diffs, diffs[:10]


def test_documented_cascade_divergences(spark):
    """The known domain edge where the engines' casts disagree — pinned
    so a dependency upgrade that shifts it is caught, and so the
    divergence is a documented fact rather than a silent one:
    - '1_000': DuckDB accepts underscore digit separators; Spark doesn't
    Bare times ('12:30:00') USED to diverge (Spark promotes them to
    today's timestamp); the ^YYYY-MM-DD gate in both cascades now
    classifies them TEXT on both engines — asserted below."""
    import duckdb
    from healthkit_to_sqlite_spark.operators.schema_infer import (
        _CASCADE_SQL, type_tag)

    sdf = spark.createDataFrame([("1_000",), ("12:30:00",)], "value string")
    spark_tags = dict((r["value"], r["t"]) for r in
                      sdf.select("value", type_tag(F.col("value")).alias("t"))
                      .collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE t(value VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [("1_000",), ("12:30:00",)])
    duck_tags = dict(con.execute(f"SELECT value, {_CASCADE_SQL} FROM t").fetchall())
    assert spark_tags["1_000"] == "TEXT" and duck_tags["1_000"] == "REAL"
    assert spark_tags["12:30:00"] == "TEXT" and duck_tags["12:30:00"] == "TEXT"


def test_inferred_casts_never_null_non_null_values(spark):
    """Cast-safety: whatever type inference assigns, applying it must
    not lose values (a non-null string must cast to a non-null typed
    value) — the guarantee the reference silently lacks (its SQLite
    columns accept anything; a wrong inference just pollutes the
    column, core.rs:219-226)."""
    from healthkit_to_sqlite_spark.operators.schema_infer import (
        CAST_TARGETS, type_tag, unify_tags)

    vals = _corpus(seed=7)
    sdf = spark.createDataFrame([(v,) for v in vals], "value string")
    tag = (sdf.select(unify_tags(type_tag(F.col("value"))).alias("t"))
           .collect()[0]["t"])
    target = CAST_TARGETS.get(tag)
    if target is None:  # TEXT — nothing to cast
        return
    lost = sdf.filter(F.col("value").isNotNull()
                      & F.col("value").cast(target).isNull()).count()
    assert lost == 0
