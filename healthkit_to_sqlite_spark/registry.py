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
    # (1) round 3: fixed (r02 comparator crash), semantics-changed, or new
    "q_variant_extract", "q_cogroup_asof", "q_dedup_incremental",
    "q_dedup_semantic", "q_skew_report", "q_dedup_normalized",
    "q_ivf_postings", "q_expectations", "q_funnel_left", "q_multimodal_embed",
    "q_resample_ffill", "q_fuzzy_join", "q_triangles", "q_gapfill",
    "q_anomaly_zscore", "q_dedup_audit", "q_manifest_roundtrip",
    "q_multimodal_resize", "q_multimodal_frames", "q_dedup_embedding",
    "q_topk_cosine_incremental", "q_dedup_clusters_star", "q_dedup_clusters",
    "q_global_shuffle", "q_train_split", "q_quality_funnel",
    "q_ngram_counts", "q_stateful_counts",
    "q_funnel_join", "q_containment", "q_vocab_topk", "q_pagerank",
    "q_zorder", "q_bloom_prune", "q_session_window", "q_mixture_rebalance",
    "q_hll_merge",
    # (2) last driver row in r01 (r02 window overflow) — rotate back in
    "q_window_rank", "q_set_ops", "q_semi_anti", "q_cube",
    "q_approx_distinct", "q_percentiles", "q_histogram", "q_full_outer",
    "q_moving_avg", "q_unpivot", "q_correlated_scalar", "q_rollup",
    "q_grouping_sets", "q_exists_in", "q_conditional_agg",
    "q_string_funcs", "q_ntile", "q_dedup_exact", "q_dedup_minhash_lsh",
    "q_dedup_near", "q_topk_cosine", "q_embed_norms",
    "q_ann_lsh_buckets", "q_topk_cosine_pandas", "q_ann_lsh_pairs",
    "q_lang_id", "q_token_counts", "q_quality_score", "q_token_count_bpe",
    # (3) reference §2.A/§2.B parity surface fill (green r01+r02; the
    # rest of the reference surface overflows this round and is covered
    # by the committed PARITY_r03.json)
    "q_flagship", "q_json_extract", "q_dedup_simhash", "q_schema_infer",
    "q_schema_unify", "q_kv_pivot", "q_collect_events", "q_path_join",
    "q_linestring", "q_partition_by_type",
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
