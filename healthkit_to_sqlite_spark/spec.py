"""Query/oracle spec plumbing shared by all operator modules.

Each operator module registers ``Spec`` objects; ``registry.py`` merges
them into the driver contract (``queries()`` / ``oracle_sql()`` in
``__spark_entry__.py``).

A ``Spec.build`` takes ``(spark, sf_dir)`` and returns a DataFrame; the
optional ``oracle`` is equivalent ANSI SQL that DuckDB can execute over
the same parquet tables (driver pre-registers views named after the
tables).  Column names MUST match between the two — the driver's
comparator sorts columns by name before hashing values.
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
