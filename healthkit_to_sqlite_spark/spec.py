"""Query/oracle spec plumbing shared by all operator modules.

Each operator module registers ``Spec`` objects; ``registry.py`` merges
them into the driver contract (``queries()`` / ``oracle_sql()`` in
``__spark_entry__.py``).

A ``Spec.build`` takes ``(spark, sf_dir)`` and returns a DataFrame; the
optional ``oracle`` is equivalent ANSI SQL that DuckDB can execute over
the same parquet tables (driver pre-registers views named after the
tables).  Column names MUST match between the two — the driver's
comparator sorts columns by name before hashing values.

Result dtypes must match too: DuckDB's integer ``SUM`` returns
HUGEINT (int128), which pandas widens to float64, while the Spark
side is int64 — the driver's value hash then sees ``72315.0`` vs
``72315`` and flags a mismatch even when values are equal.  Every
integer aggregate in an oracle must be wrapped ``CAST(... AS
BIGINT)`` (or DOUBLE when the Spark side is double).  tests/parity.py
compares pandas dtypes to catch this class before the driver does.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Spec:
    #: builds the Spark result: (spark, sf_dir) -> DataFrame
    build: Callable[[SparkSession, str], DataFrame]
    #: DuckDB-runnable ANSI SQL; None => non-SQL-expressible (rows-only check)
    oracle: Optional[str]
    #: one-line provenance: which SURVEY.md §2 row this implements
    doc: str = ""

def sql_in_list(values) -> str:
    """Render an iterable as a SQL IN-list body, e.g. ``(16, 77)``.

    Interpolating a Python tuple's repr is a latent trap (ADVICE r9):
    a single-element tuple renders ``(16,)`` and an empty one ``()``,
    both malformed for DuckDB.  Strings are single-quoted.  The empty
    case raises — ``x IN ()`` has no portable SQL meaning, and every
    current call site guards emptiness by construction (``if ids``)."""
    vals = list(values)
    if not vals:
        raise ValueError("empty SQL IN-list; guard at the call site")
    return "(" + ", ".join(
        "'" + v.replace("'", "''") + "'" if isinstance(v, str) else str(v)
        for v in vals) + ")"


# Float-result gotcha (round 6): IEEE NEGATIVE ZERO. DuckDB's ROUND
# keeps the sign of a tiny negative rounded to zero (-0.0); Spark's
# does not. -0.0 == 0.0 compares equal, but str()/hash paths diverge,
# which misaligns the driver's sorted-row value hash for the whole
# result. Any double column that can round to zero from below must
# canonicalize with `+ 0.0` after ROUND in BOTH engines (see
# q_embed_covariance).
