"""Merged driver contract: every operator module's SPECS in one place.

``__spark_entry__.py`` re-exports these as ``queries()`` /
``oracle_sql()``.  Import side effects are kept light; modules that
need optional deps (pyspark.ml) import them lazily inside builders.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession

from .spec import Spec


def _all_specs() -> dict[str, Spec]:
    specs: dict[str, Spec] = {}
    for mod_name in ("relational", "restructure", "schema_infer", "dedup",
                     "similarity", "text", "timeseries", "multimodal",
                     "pipeline", "udx"):
        try:
            mod = __import__(f"healthkit_to_sqlite_spark.operators.{mod_name}",
                             fromlist=[mod_name])
        except ImportError:
            continue
        specs.update(getattr(mod, "SPECS", {}))
    return specs


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.build for name, spec in _all_specs().items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.oracle for name, spec in _all_specs().items()
            if spec.oracle is not None}
