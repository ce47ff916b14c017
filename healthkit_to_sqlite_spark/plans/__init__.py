"""Physical-plan inspection helpers — the feedback loop for scale work.

At 100 TB the difference between a good and bad plan is not 2× but
100×: a filter that doesn't reach the parquet scan reads the whole
table; a join that doesn't broadcast shuffles terabytes.  These
helpers make plan properties assertable in tests (tests/test_plans.py)
so regressions fail CI instead of surfacing as cluster bills.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """The formatted physical plan (what .explain('formatted') prints)."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted")


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters entries across all scans in the plan."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", formatted_plan(df)):
        if m.group(1).strip():
            out.extend(f.strip() for f in m.group(1).split(","))
    return out


def read_schema_columns(df: DataFrame) -> set[str]:
    """Columns actually read from parquet (column pruning check)."""
    cols: set[str] = set()
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", formatted_plan(df)):
        for field in m.group(1).split(","):
            if ":" in field:
                cols.add(field.split(":")[0].strip())
    return cols


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df)


def shuffle_count(df: DataFrame) -> int:
    """Number of shuffle exchanges in the plan — the scale currency.
    (Formatted mode under AQE prints each as '(n) Exchange'; broadcast
    exchanges print as '(n) BroadcastExchange' and are not counted.)"""
    return len(re.findall(r"\(\d+\) Exchange\b", formatted_plan(df)))


def executed_reuse_count(df: DataFrame) -> int:
    """Reused shuffle stages in the FINAL (post-AQE) plan — how many
    identical exchange subtrees AQE deduplicated into one materialized
    stage.  This is the mechanism that lets a self-join compute its
    (identical) two sides ONCE when both sit on the same explicit
    repartition key.  Executes the query (AQE finalizes at runtime)."""
    df.collect()
    s = df._jdf.queryExecution().executedPlan().toString()
    return s.count("ReusedQueryStage") + s.count("ReusedExchange")


def codegen_stage_count(df: DataFrame) -> int:
    """WholeStageCodegen spans in the FINAL (post-AQE) plan; fewer
    boundaries = wider fused pipelines.  Executes the query: AQE only
    finalizes (and codegen-annotates) the plan after it runs."""
    df.collect()  # a write spawns a new QueryExecution; collect runs this one
    s = df._jdf.queryExecution().executedPlan().toString()
    # final plans mark codegen spans with the star notation: *(id) Node
    return len(set(re.findall(r"\*\((\d+)\)", s)))
