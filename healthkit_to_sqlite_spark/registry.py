"""Merged driver contract: every operator module's SPECS in one place.

``__spark_entry__.py`` re-exports these as ``queries()`` /
``oracle_sql()``.  Import side effects are kept light; modules that
need optional deps (pyspark.ml) import them lazily inside builders.

Ordering is load-bearing: the driver's correctness gate checks the
FIRST 50 queries in dict iteration order (CORRECTNESS_r01 contains
exactly the first 50 registry entries of round 1 — module order —
leaving timeseries/multimodal/pipeline/udx unverified).  ``PRIORITY``
pins the verification window each round: queries whose semantics
changed this round plus queries with no driver row yet come first,
then the reference §2.A/§2.B parity surface, then the long-green
remainder.  Everything (all 72+) still runs in tests/parity.py, whose
committed PARITY_r{N}.json covers the overflow.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession

from .spec import Spec

#: Names the driver must re-verify this round, in order: (1) queries
#: fixed/changed since their last green row, (2) queries that have
#: never had a CORRECTNESS row, (3) the reference-parity §2.A/§2.B
#: surface.  Names not listed (or not registered) follow in module
#: order; unknown names here are ignored, so the list is safe to
#: curate ahead of the code.
PRIORITY: tuple[str, ...] = (
    # (1) fixed, semantics-changed, or new this round
    "q_json_extract", "q_dedup_simhash", "q_dedup_embedding",
    "q_ngram_jaccard", "q_ann_ivf", "q_dedup_clusters_star",
    "q_decontaminate", "q_multimodal_resize", "q_multimodal_frames",
    "q_ann_pq", "q_topk_cosine_incremental", "q_salted_join",
    # (2) no CORRECTNESS row in round 1 (driver 50-query window overflow)
    "q_tfidf", "q_asof_join", "q_sessionize", "q_tumbling_window",
    "q_sliding_window", "q_lag_lead", "q_posexplode",
    "q_multimodal_meta", "q_multimodal_decode",
    "q_dedup_clusters", "q_dedup_apply", "q_pack_sequences",
    "q_interval_join", "q_salted_agg", "q_merge_upsert",
    "q_pii_scrub", "q_stratified_sample", "q_repetition_signals",
    "q_fingerprint", "q_udtf_chunks", "q_udaf_median", "q_ann_brp",
    # (3) reference §2.A/§2.B parity surface — keep continuously green
    "q_flagship", "q_filter_between", "q_filter_or_isin",
    "q_project_arith", "q_agg_sum", "q_group_agg", "q_date_parse",
    "q_topk", "q_path_join", "q_partition_by_type", "q_kv_pivot",
    "q_collect_events", "q_collect_stats_map", "q_linestring",
    "q_schema_infer", "q_schema_unify",
)


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
    ordered: dict[str, Spec] = {}
    for name in PRIORITY:
        if name in specs:
            ordered[name] = specs[name]
    for name, spec in specs.items():
        if name not in ordered:
            ordered[name] = spec
    return ordered


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.build for name, spec in _all_specs().items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.oracle for name, spec in _all_specs().items()
            if spec.oracle is not None}
