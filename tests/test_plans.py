"""Physical-plan property tests — scale regressions fail here.

Each assertion encodes a 100 TB survival property: filters must reach
the parquet scan, projections must prune the read schema, small dims
must broadcast, top-k must not global-sort, aggregations must not
shuffle more than once.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from healthkit_to_sqlite_spark.plans import (
    codegen_stage_count,
    executed_reuse_count,
    formatted_plan,
    has_broadcast_join,
    pushed_filters,
    read_schema_columns,
    shuffle_count,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def specs():
    from healthkit_to_sqlite_spark.registry import _all_specs
    return _all_specs()


def test_filter_pushdown_reaches_scan(spark, specs):
    df = specs["q_filter_between"].build(spark, SF)
    pushed = " ".join(pushed_filters(df))
    assert "o_orderdate" in pushed and "GreaterThanOrEqual" in pushed


def test_isin_pushdown(spark, specs):
    df = specs["q_filter_or_isin"].build(spark, SF)
    assert any("In(o_orderpriority" in f for f in pushed_filters(df))


def test_column_pruning(spark, specs):
    df = specs["q_partition_by_type"].build(spark, SF)
    cols = read_schema_columns(df)
    # events has 6 columns; the aggregate needs exactly these two
    # (ts arrives via the nanos-long rebuild; it must still be pruned)
    assert "event_type" in cols and "value" in cols
    assert "props" not in cols and "user_id" not in cols


def test_flagship_broadcasts_filtered_orders(spark, specs):
    df = specs["q_flagship"].build(spark, SF)
    assert has_broadcast_join(df)
    pushed = " ".join(pushed_filters(df))
    assert "In(o_orderpriority" in pushed and "o_orderdate" in pushed


def test_dimension_join_broadcasts(spark, specs):
    df = specs["q_path_join"].build(spark, SF)
    assert has_broadcast_join(df)


def test_topk_avoids_global_sort(spark, specs):
    df = specs["q_topk"].build(spark, SF)
    assert "TakeOrderedAndProject" in formatted_plan(df)
    assert shuffle_count(df) == 0


def test_group_agg_single_shuffle(spark, specs):
    df = specs["q_group_agg"].build(spark, SF)
    assert shuffle_count(df) == 1
    # partial + final HashAggregate pair (map-side combine)
    assert formatted_plan(df).count("HashAggregate") >= 2


def test_sessionize_reuses_user_partitioning(spark, specs):
    # lag window + cumulative-sum window + two groupBys, all keyed by
    # user_id → Spark must plan exactly ONE user_id shuffle
    df = specs["q_sessionize"].build(spark, SF)
    assert shuffle_count(df) == 1


def test_simhash_single_shuffle(spark, specs):
    # r14 Arrow kernel: the signature folds per doc in one map-only
    # pass — zero exchanges (value identity across kernels is pinned
    # in test_batch_kernels)
    df = specs["q_dedup_simhash"].build(spark, SF)
    assert shuffle_count(df) == 0
    # signature width pinned with the cost it buys (VERDICT r4 item 4):
    # 60 bits ≈ 2.4s at sf0.1 — a width change re-prices the kernel,
    # so it must re-measure and update SCALE.md "Recall/cost operating
    # points" rather than drift
    import inspect

    from healthkit_to_sqlite_spark.operators.dedup import simhash
    assert inspect.signature(simhash).parameters["bits"].default == 60


def test_interval_join_is_equi_join(spark, specs):
    # the ±window self-join must plan as a SortMergeJoin/ShuffledHashJoin
    # on (user, bucket) — NEVER a nested-loop/cartesian over user groups
    df = specs["q_interval_join"].build(spark, SF)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_stratified_sample_is_map_only(spark, specs):
    # hash-based sampling is a pure filter: no shuffle, pruned scan
    df = specs["q_stratified_sample"].build(spark, SF)
    assert shuffle_count(df) == 0
    assert "text" not in read_schema_columns(df)


def test_pii_scrub_is_map_only(spark, specs):
    df = specs["q_pii_scrub"].build(spark, SF)
    assert shuffle_count(df) == 0


def test_decontaminate_broadcasts_benchmark_grams(spark, specs):
    # the eval-set n-gram inventory is bounded by eval-suite size → it
    # must broadcast; corpus grams must never shuffle for this join
    df = specs["q_decontaminate"].build(spark, SF)
    assert has_broadcast_join(df)
    assert "CartesianProduct" not in formatted_plan(df)


def test_multimodal_kernels_are_map_only(spark, specs):
    # resize and frame-sample are per-row/batch media kernels — any
    # shuffle of blob payloads is a scale bug
    for name in ("q_multimodal_resize", "q_multimodal_frames"):
        df = specs[name].build(spark, SF)
        assert shuffle_count(df) == 0, name


def test_lsh_self_joins_reuse_one_shuffle_stage(spark, specs):
    # the explicit repartition on the band key exists so AQE dedupes
    # the two identical self-join subtrees into ONE materialized
    # shuffle stage — signatures compute once, not per side (measured
    # 3.8s→2.3s on minhash; 4.6s→3.1s with norm caching on the
    # embedding variant).  A regression here doubles signature work.
    for name in ("q_dedup_minhash_lsh", "q_dedup_embedding"):
        df = specs[name].build(spark, SF)
        assert executed_reuse_count(df) >= 1, name


def test_salted_join_spreads_key_with_broadcast_off(spark, specs):
    # with broadcast disabled (the regime where salting matters — a
    # dim too big to broadcast), the join must be a shuffle join keyed
    # on (user_id, _salt), never a nested loop; the salt column is
    # what spreads one hot user across reducers
    keys = ("spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold")
    saved = {k: spark.conf.get(k, None) for k in keys}
    try:
        for k in saved:
            spark.conf.set(k, "-1")
        df = specs["q_salted_join"].build(spark, SF)
        plan = formatted_plan(df)
        assert "BroadcastNestedLoopJoin" not in plan
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        # formatted mode lists join keys as "Left keys [2]: [user_id…, _salt…]"
        import re
        left_keys = re.search(r"Left keys \[\d+\]: \[([^\]]*)\]", plan)
        assert left_keys and "_salt" in left_keys.group(1), plan[:2000]
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_whole_stage_codegen_everywhere(spark, specs):
    for name in ("q_flagship", "q_group_agg", "q_project_arith"):
        df = specs[name].build(spark, SF)
        assert codegen_stage_count(df) >= 1, name


def test_bucketed_join_is_shuffle_free(spark):
    # the at-scale join strategy: co-bucketed tables join with zero
    # exchanges (and zero sorts, being sorted within buckets)
    from healthkit_to_sqlite_spark.catalog import load_table
    from healthkit_to_sqlite_spark.sinks.database import write_bucketed

    write_bucketed(load_table(spark, SF, "orders"), "b_orders", "o_orderkey")
    write_bucketed(
        load_table(spark, SF, "lineitem").withColumnRenamed(
            "l_orderkey", "o_orderkey"), "b_lineitem", "o_orderkey")
    # at test scale the dims fit the broadcast threshold; disable it so
    # the plan shows what a TB-vs-TB join would do (broadcast is not an
    # option when both sides are huge — bucketing is)
    keys = ("spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold")
    saved = {k: spark.conf.get(k, None) for k in keys}
    try:
        for k in saved:
            spark.conf.set(k, "-1")
        j = (spark.table("b_lineitem").join(spark.table("b_orders"), "o_orderkey")
             .groupBy("o_orderpriority").agg(F.sum("l_quantity").alias("q")))
        plan = formatted_plan(j)
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert shuffle_count(j) == 1  # only the final tiny groupBy
        # the join itself must sit on bucketed scans, not exchanges:
        # the only Exchange must hash on o_orderpriority (the agg key)
        import re
        exch = re.findall(r"hashpartitioning\((\w+)#", plan)
        assert exch and all(c == "o_orderpriority" for c in exch), exch
        assert "SelectedBucketsCount" in plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_global_shuffle_has_no_single_partition_sort(spark, specs):
    # the training-order shuffle must sort per shard; a global
    # row_number (empty PARTITION BY) plans an Exchange SinglePartition
    # — the one-reducer scale killer this operator exists to avoid
    plan = formatted_plan(specs["q_global_shuffle"].build(spark, SF))
    assert "SinglePartition" not in plan
    assert shuffle_count(specs["q_global_shuffle"].build(spark, SF)) <= 1


def test_funnel_single_pass(spark, specs):
    # the 3-stage funnel must stay ONE scan + ONE aggregation shuffle
    df = specs["q_quality_funnel"].build(spark, SF)
    assert shuffle_count(df) <= 1
    plan = formatted_plan(df)
    # one scan node: the formatted plan prints each node twice (tree +
    # detail), so count the per-scan Location line instead
    assert plan.count("Location: InMemoryFileIndex") == 1


def test_bloom_probe_prunes_before_semi_join(spark, specs):
    # the 8 KB bitmask probe must sit as a Filter on the fact side
    # BEFORE the exact semi join — that ordering is the whole point
    # (prune, then join); and nothing may plan as a nested loop
    df = specs["q_bloom_prune"].build(spark, SF)
    plan = formatted_plan(df)
    assert "shiftright" in plan and "LeftSemi" in plan, plan[:2000]
    # ORDERING, not mere presence (review finding): in formatted
    # explain the tree prints top-down, so the semi join node must
    # appear BEFORE the probe filter in the text for the probe to sit
    # BELOW it in the plan (filter inside the join's fact input — the
    # prune-then-join guarantee; a probe hoisted above the join would
    # print before it)
    assert plan.index("LeftSemi") < plan.index("shiftright")
    # the only nested-loop allowed is the 1-row bitmask attach (a
    # broadcast cross carrying the probe as its condition; formatted
    # mode prints each node twice — tree line + detail header)
    assert plan.count("BroadcastNestedLoopJoin") <= 2
    assert "CartesianProduct" not in plan


def test_funnel_join_is_equi_join(spark, specs):
    # stream-stream-shaped join: equi-key (user) + time-range
    # predicate — must plan as a hash/sort-merge join with the range
    # as a post-join condition, never a nested loop over users
    df = specs["q_funnel_join"].build(spark, SF)
    plan = formatted_plan(df)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_vocab_topk_never_sorts_globally(spark, specs):
    # the corpus-wide vocabulary must reach the driver via TakeOrdered
    # (per-partition heaps), not a global sort of all distinct tokens
    plan = formatted_plan(specs["q_vocab_topk"].build(spark, SF))
    assert "TakeOrderedAndProject" in plan


def test_zorder_and_session_window_single_shuffle(spark, specs):
    for name in ("q_zorder", "q_session_window"):
        df = specs[name].build(spark, SF)
        assert shuffle_count(df) == 1, name


def test_mixture_rebalance_broadcasts_histogram(spark, specs):
    # the per-source histogram (k rows) must broadcast back onto the
    # corpus — the corpus itself must not shuffle for the stats join
    df = specs["q_mixture_rebalance"].build(spark, SF)
    assert has_broadcast_join(df)


def test_incremental_dedup_is_one_sided_equi_join(spark, specs):
    # batch↔corpus collisions only: an equi-join on (band, band_sig),
    # never a nested loop; corpus×corpus pairs are never generated
    # (the join's two sides are disjoint filters of the signature set)
    df = specs["q_dedup_incremental"].build(spark, SF)
    plan = formatted_plan(df)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_semantic_dedup_pairs_are_cell_local(spark, specs):
    # the pair search must be an equi-join on the k-means cell id —
    # the O(n²) scan bounded to Σ|cell|²; no nested-loop anywhere
    df = specs["q_dedup_semantic"].build(spark, SF)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan
    # nested loops may appear only as K-row centroid broadcasts into
    # the assignment scans (crossJoin(broadcast(cent))); the pair
    # search itself must be a hash or sort-merge equi-join on cell
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan \
        or "BroadcastHashJoin" in plan


def test_variant_extract_single_shuffle(spark, specs):
    # parse_json + typed paths stay in the projection; one aggregate
    # exchange total
    df = specs["q_variant_extract"].build(spark, SF)
    assert shuffle_count(df) == 1


def test_source_cap_uses_window_group_limit(spark, specs):
    # rank-limit filter must rewrite to WindowGroupLimit: per-partition
    # top-cap heaps with map-side partial limiting BEFORE the shuffle —
    # a hot source must never force a full per-key sort of its rows
    df = specs["q_source_cap"].build(spark, SF)
    plan = formatted_plan(df)
    assert "WindowGroupLimit" in plan
    assert shuffle_count(df) == 1  # one hash exchange on source


def test_knn_graph_top_k_uses_window_group_limit(spark, specs):
    # per-node top-k must be the WindowGroupLimit heap, and the
    # candidate stage stays an equi-join (no nested loop anywhere)
    df = specs["q_knn_graph"].build(spark, SF)
    plan = formatted_plan(df)
    assert "WindowGroupLimit" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_scd2_shares_one_user_shuffle(spark, specs):
    # both window passes partition by user_id — the change-detection
    # pass and the interval pass must reuse ONE hash exchange
    df = specs["q_scd2"].build(spark, SF)
    assert shuffle_count(df) == 1


def test_ewma_is_one_window_pass_one_shuffle(spark, specs):
    # 8 LAG taps must come out of a single WindowExec over a single
    # user_id exchange — one shuffle, no per-tap passes
    df = specs["q_ewma"].build(spark, SF)
    assert shuffle_count(df) == 1
    assert formatted_plan(df).count("Window") <= 2  # node + its detail


def test_first_touch_uses_window_group_limit(spark, specs):
    df = specs["q_first_touch"].build(spark, SF)
    assert "WindowGroupLimit" in formatted_plan(df)


def test_span_scrub_scans_text_once(spark, specs):
    # the posexplode_outer form exists so the corpus text is read ONCE
    df = specs["q_span_scrub"].build(spark, SF)
    plan = formatted_plan(df)
    import re
    schemas = re.findall(r"ReadSchema: (struct<[^\n]*)", plan)
    text_reads = [s for s in schemas if "text" in s]
    assert len(text_reads) == 1, schemas
    assert shuffle_count(df) == 2  # seg window + doc_id aggregate


def test_snapshot_diff_carries_hash_not_payload_through_join(spark, specs):
    # the full-outer join must see only (doc_id, hash, n_chars) —
    # no text column above the scan
    df = specs["q_snapshot_diff"].build(spark, SF)
    plan = formatted_plan(df)
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan


def test_pivot_has_no_distinct_discovery_scan(spark, specs):
    # explicit values list => ONE corpus scan (no distinct job over
    # the pivot column); two exchanges, the second over group-reduced
    # (user, type) rows only
    df = specs["q_pivot"].build(spark, SF)
    plan = formatted_plan(df)
    assert plan.count("ReadSchema:") == 1  # one scan block
    assert shuffle_count(df) == 2
    assert "pivotfirst" in plan


def test_range_frame_and_analytics_single_window_shuffle(spark, specs):
    for name in ("q_range_frame", "q_window_analytics"):
        df = specs[name].build(spark, SF)
        assert shuffle_count(df) == 1, name


def test_snowflake_join_broadcasts_dimension_chain(spark, specs):
    # region->nation->customer and supplier must all broadcast; the
    # only shuffle-worthy join is lineitem x orders
    df = specs["q_snowflake_join"].build(spark, SF)
    plan = formatted_plan(df)
    assert plan.count("BroadcastHashJoin") >= 3
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_returned_customers_pushes_flag_filter(spark, specs):
    df = specs["q_returned_customers"].build(spark, SF)
    pushed = " ".join(pushed_filters(df))
    assert "l_returnflag" in pushed
    assert "TakeOrderedAndProject" in formatted_plan(df)


def test_big_orders_scans_lineitem_once(spark, specs):
    # the HAVING rollup must be the ONLY lineitem pass — the
    # qualifying set joins back carrying its measures
    df = specs["q_big_orders"].build(spark, SF)
    plan = formatted_plan(df)
    import re
    li = [m for m in re.findall(r"Location: [^\n]*", plan)
          if "lineitem" in m]
    assert len(li) == 1, li


def test_corpus_profile_single_scan_expand(spark, specs):
    df = specs["q_corpus_profile"].build(spark, SF)
    plan = formatted_plan(df)
    assert plan.count("ReadSchema:") == 1
    assert "Expand" in plan  # multi-distinct lanes over ONE scan


def test_cusum_and_seasonal_single_type_shuffle(spark, specs):
    # all cusum windows key on event_type → ONE exchange; seasonal's
    # 168-cell aggregate is one partial-agg shuffle
    df = specs["q_cusum"].build(spark, SF)
    assert shuffle_count(df) == 1
    df = specs["q_seasonal_profile"].build(spark, SF)
    assert shuffle_count(df) == 1


def test_media_dedup_never_shuffles_payload_bytes(spark, specs):
    # the groupBy must carry the 32-char hash, not the binary column
    df = specs["q_media_dedup"].build(spark, SF)
    plan = formatted_plan(df)
    import re
    ex = re.search(r"\(\d+\) Exchange\b.*?Input \[\d+\]: \[([^\]]*)\]",
                   plan, re.S)
    # the binary column would surface as `payload#N` (payload_md5 is
    # the 32-char hash and is exactly what SHOULD shuffle)
    assert ex and not re.search(r"\bpayload#", ex.group(1)), ex.group(1)


def test_funnel_ordered_and_khop_no_nested_loops(spark, specs):
    for name in ("q_funnel_ordered", "q_khop_reach"):
        df = specs[name].build(spark, SF)
        plan = formatted_plan(df)
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_lm_and_dsir_broadcast_models_and_heap_topk(spark, specs):
    """The LM/DSIR scoring joins must be hash joins against the
    bounded model (broadcast at this scale), the only nested-loop is
    the 1-row totals closure, and top-k must be a TakeOrdered heap,
    never a global sort."""
    for name in ("q_lm_perplexity", "q_dsir_weights"):
        df = specs[name].build(spark, SF)
        plan = formatted_plan(df)
        assert "CartesianProduct" not in plan, name
        assert "TakeOrderedAndProject" in plan, name
        assert has_broadcast_join(df), name
        # exactly one nested-loop node: the broadcast 1-row
        # vocab/totals crossJoin (each node prints twice: tree + detail)
        assert plan.count("BroadcastNestedLoopJoin") == 2, name


def test_simhash_near_is_bucket_equi_join(spark, specs):
    # the Hamming pair search must plan as a (band, bval) equi-join —
    # never a cartesian/BNLJ over signatures
    df = specs["q_simhash_near"].build(spark, SF)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_token_budget_mix_scans_corpus_once(spark, specs):
    # every consumer derives from the checkpointed bucket histogram:
    # the final plan must not re-scan (and re-tokenize) the parquet
    df = specs["q_token_budget_mix"].build(spark, SF)
    assert formatted_plan(df).count("Scan parquet") == 0


def test_ann_serve_query_performs_zero_training(spark, specs):
    """VERDICT r5 item 1 — the build/serve split's contract: the
    serve query must read the four COMMITTED index artifacts and rank
    with joins + top-k heaps only.  Any aggregate in the serve plan
    means training (Lloyd assignment min-structs, mean accumulators,
    code pivots) leaked back into the query path."""
    df = specs["q_ann_query_from_index"].build(spark, SF)
    plan = formatted_plan(df)
    assert "ann_index_" in plan            # committed artifact scans
    assert "HashAggregate" not in plan     # zero Lloyd / zero pivots
    assert "ObjectHashAggregate" not in plan
    assert "TakeOrderedAndProject" in plan  # shortlist + re-rank heaps


def test_embedding_pair_kernel_cost_pinned(spark, specs):
    """VERDICT r5 item 2 — q_graph_jaccard's ×1.41 bench drift was
    unexplained because nothing pinned the underlying pair kernel's
    plan cost; a kernel regression would surface only as silent bench
    noise.  Pin the shape: 3 exchanges (band repartition reused by
    both self-join sides + candidate distinct + verify join), bounded
    scans, and strictly equi-join candidate generation."""
    from healthkit_to_sqlite_spark.catalog import load_table
    from healthkit_to_sqlite_spark.operators.similarity import (
        dedup_embedding_pairs,
    )

    df = dedup_embedding_pairs(load_table(spark, SF, "embeddings"))
    plan = formatted_plan(df)
    assert shuffle_count(df) == 3
    assert plan.count("Scan parquet") <= 8  # runtime dedupes via reuse
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_pipeline_e2e_final_plan_is_scan_free(spark, specs):
    """VERDICT r5 item 4 — the composed pipeline makes exactly two
    passes over corpus text, BOTH materialized as bounded artifacts
    (slim per-doc relation, contamination drop set) before the stage
    DAG runs; the final plan must therefore touch parquet zero times
    and contain no nested-loop joins."""
    df = specs["q_pipeline_e2e"].build(spark, SF)
    plan = formatted_plan(df)
    assert plan.count("Scan parquet") == 0
    assert "CartesianProduct" not in plan


def test_ann_batch_serve_plan_is_training_free_with_heap_topk(spark, specs):
    """The batch serve must share the single-query serve's contract —
    committed-artifact scans, zero aggregates (no Lloyd/pivot work) —
    and its per-query shortlist/rank must plan as WindowGroupLimit
    heaps, never per-query global sorts."""
    df = specs["q_ann_batch_queries"].build(spark, SF)
    plan = formatted_plan(df)
    assert "ann_index_" in plan
    assert "HashAggregate" not in plan
    assert "ObjectHashAggregate" not in plan
    assert "WindowGroupLimit" in plan


def test_bm25_serve_never_reads_corpus_text(spark, specs):
    """The lexical serve split's contract: scoring reads ONLY the
    committed index artifacts (term-pruned postings + doclen +
    bounded stats) — the documents table must not appear in the
    plan."""
    df = specs["q_bm25_from_index"].build(spark, SF)
    plan = formatted_plan(df)
    assert "text_index_" in plan
    assert "documents.parquet" not in plan


def test_dedup_serve_reads_committed_signatures(spark, specs):
    """The dedup serving split's contract: the corpus side comes from
    the committed signature artifact; only the BATCH side may touch
    the documents table."""
    df = specs["q_dedup_from_index"].build(spark, SF)
    plan = formatted_plan(df)
    assert "sig_index_" in plan
    assert plan.count("documents.parquet") <= 1


def test_bm25_mrr_probe_bounded_and_term_pruned(spark, specs):
    """The known-item audit's scale contract: the probe set is a
    bounded broadcast (its doc_id predicate reaches the documents
    scan — the only corpus-text read is the probe rows' own query
    tokens), candidates come from the committed postings via
    equi-joins, and nothing goes cartesian."""
    df = specs["q_bm25_mrr"].build(spark, SF)
    plan = formatted_plan(df)
    assert "text_index_" in plan             # committed postings scans
    assert has_broadcast_join(df)            # probe inventory broadcast
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    pushed = " ".join(pushed_filters(df))
    assert "doc_id" in pushed, "probe bound must reach the scan"


def test_bm25_append_serve_never_reads_corpus_text(spark, specs):
    """The appended-index serve (r7): scoring still reads ONLY
    committed artifacts — two encode passes must not change the
    serve plan's data sources."""
    df = specs["q_bm25_index_append"].build(spark, SF)
    plan = formatted_plan(df)
    assert "text_index_append_" in plan
    assert "documents.parquet" not in plan


def test_dedup_append_serve_reads_committed_signatures(spark, specs):
    """The appended signature serve (r7): corpus side = committed
    artifact grown by two passes; only the batch side scans text."""
    df = specs["q_dedup_index_append"].build(spark, SF)
    plan = formatted_plan(df)
    assert "sig_index_append_" in plan
    assert plan.count("documents.parquet") <= 1


def test_bpe_encode_serve_plan_is_map_only(spark, specs):
    """The tokenizer serve split (r7): the committed merge table is a
    bounded driver-side collect folded into the encode kernel, so the
    plan must be ONE corpus scan → per-doc map — zero training (no
    argmax heaps, no per-round shuffles).  Since the r14 Arrow kernel
    the per-doc rollup happens inside the map pass, so even the
    groupBy(doc_id) exchange is gone (the expression form's 1-shuffle
    + folded-literal-replace shape stays pinned via HK_BPE_KERNEL in
    test_batch_kernels' value-identity suite)."""
    df = specs["q_bpe_encode"].build(spark, SF)
    plan = formatted_plan(df)
    assert shuffle_count(df) == 0
    # one scan = tree line + detail header in the formatted plan
    assert plan.count("Scan parquet") == 2
    assert "TakeOrderedAndProject" not in plan
    assert "MapInPandas" in plan       # the bounded-model encode kernel


def test_bm25_pruned_serve_plan_is_bounded_artifact_scan(spark, specs):
    """The pruned lexical serve (r7): ≤ m·|terms| artifact rows in,
    term IN pushed to the parquet scan, ONE exchange (conditional
    pivot agg), top-k as a TakeOrdered heap, corpus text never read —
    the plan whose cost is flat in corpus size."""
    df = specs["q_bm25_pruned"].build(spark, SF)
    plan = formatted_plan(df)
    assert "text_index_pruned_" in plan
    assert "documents.parquet" not in plan
    assert shuffle_count(df) == 1
    assert "TakeOrderedAndProject" in plan
    assert "In(term" in plan              # pushed term filter


def test_quality_classifier_serve_is_pure_map(spark, specs):
    """The classifier serve (r7): committed weights fold in as a
    literal array and every token scores in-row — the plan must be a
    single corpus scan with ZERO exchanges (score-as-you-scan; no
    feature materialization, no training aggregates)."""
    df = specs["q_quality_classifier"].build(spark, SF)
    plan = formatted_plan(df)
    assert shuffle_count(df) == 0
    assert plan.count("Scan parquet") == 2   # tree + detail, one scan
    assert "HashAggregate" not in plan


def test_quality_classifier_eval_single_pass(spark, specs):
    """The monitoring artifact (r7): scorer + teacher predicate fused
    into one projection — a single corpus scan and ONE groupBy(source)
    exchange; no join between prediction and label sides."""
    df = specs["q_quality_classifier_eval"].build(spark, SF)
    plan = formatted_plan(df)
    assert shuffle_count(df) == 1
    assert plan.count("Scan parquet") == 2   # tree + detail, one scan
    assert "Join" not in plan


def test_cms_sketch_map_side_combines_and_broadcasts(spark, specs):
    """Count-Min's scale contract: the build must PARTIAL-aggregate
    before its exchange (≤ d·w rows per partition through the
    shuffle, whatever the token volume) and the bounded sketch must
    broadcast to the probe side — never the reverse."""
    df = specs["q_cms_counts"].build(spark, SF)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert "partial_count" in plan
    assert has_broadcast_join(df)


def test_hybrid_serve_reads_only_committed_indexes(spark, specs):
    """The hybrid serve's contract: BOTH legs come from committed
    artifacts — the lexical leg's postings (corpus text never read)
    and the vector leg's index tables (zero Lloyd training
    aggregates on that leg; the only aggregates in the plan are the
    BM25 scorer's bounded candidate sums)."""
    df = specs["q_hybrid_from_index"].build(spark, SF)
    plan = formatted_plan(df)
    assert "text_index_" in plan          # committed postings artifact
    assert "ann_index_" in plan           # committed ANN artifacts
    assert "documents.parquet" not in plan  # corpus text never read
    assert "CartesianProduct" not in plan


def test_bm25_pruned_append_serve_plan_matches_single_pass(spark, specs):
    """Prune-on-append serve (r8): same bounded-artifact-scan shape as
    the single-pass pruned serve — committed pruned artifact in, term
    IN pushed to the scan, ONE exchange, TakeOrdered heap, corpus
    text never read at serve."""
    df = specs["q_bm25_pruned_append"].build(spark, SF)
    plan = formatted_plan(df)
    assert "text_index_pruned_append_" in plan
    assert "documents.parquet" not in plan
    assert shuffle_count(df) == 1
    assert "TakeOrderedAndProject" in plan
    assert "In(term" in plan              # pushed term filter


def test_ivf_rebalance_report_reads_only_catalog_artifacts(spark, specs):
    """The rebalance report (r8): occupancy + provenance come from the
    catalog's overlay resolution — committed cells/deltas in, ZERO
    Lloyd training aggregates in the plan (the split 2-means ran in
    the version-guarded build), raw embeddings never read."""
    df = specs["q_ivf_rebalance"].build(spark, SF)
    plan = formatted_plan(df)
    assert "ann_index_rebal_" in plan     # committed overlay artifacts
    assert "embeddings.parquet" not in plan
    assert "decimal(30,10)" not in plan   # no training aggregates
    assert "CartesianProduct" not in plan


def test_quality_retrain_report_single_scan_both_models(spark, specs):
    """The drift-loop report (r8): BOTH model versions score in ONE
    corpus scan (champion/challenger audit) — a single parquet scan
    of the documents table, one groupBy(source) exchange, no join
    between the v1 and v2 sides."""
    df = specs["q_quality_retrain"].build(spark, SF)
    plan = formatted_plan(df)
    assert plan.count("Scan parquet") == 2   # tree + detail, one scan
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan


def test_skew_adaptive_join_branch_shapes(spark, specs):
    """Differential salting (r8): the plan must be a UNION of two join
    branches — the hot branch keyed on (user_id, _salt) with the dim
    replication (explode of the salt range) local to it, the cold
    branch keyed on user_id alone — with the committed hot-key
    artifact probed via broadcast semi/anti joins (never a shuffle for
    the key-list probes)."""
    import re

    keys = ("spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold")
    saved = {k: spark.conf.get(k, None) for k in keys}
    try:
        for k in saved:
            spark.conf.set(k, "-1")   # dim too big to broadcast regime
        df = specs["q_skew_join_adaptive"].build(spark, SF)
        plan = formatted_plan(df)
        assert "Union" in plan
        assert "skew_stats_" in plan          # committed artifact scan
        assert "BroadcastNestedLoopJoin" not in plan
        # exactly one branch joins on the salt
        salted_joins = [m.group(1) for m in
                        re.finditer(r"Left keys \[\d+\]: \[([^\]]*)\]",
                                    plan) if "_salt" in m.group(1)]
        assert len(salted_joins) == 1, plan[:2000]
        # the hot-key probes stay broadcast even with the dim-join
        # broadcast regime off (they are tiny by construction)
        assert "BroadcastHashJoin" in plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_filtered_ann_pushes_label_predicate(spark, specs):
    """The filtered-ANN serve's candidate scan carries the label
    predicate as a pushed parquet filter — the plan property that
    makes the filtered scan read s·nprobe·n/K vectors at 100 TB
    instead of filtering after the read."""
    df = specs["q_ann_filtered_from_index"].build(spark, SF)
    assert any("In(label" in f for f in pushed_filters(df))


def test_suffix_ranks_never_single_partition(spark, specs):
    """Every global ordering in the prefix-doubling kernel runs
    through the range-partitioned rank + offset join — a
    single-partition exchange here would serialize the whole corpus
    through one reducer at 100 TB."""
    df = specs["q_suffix_ranks"].build(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan


def test_dv_fraction_rollup_reads_only_index_artifacts(spark, specs):
    """The erasure monitor (r10/r11): DV debt is a rollup over the
    committed cells + deleted artifacts at INDEX grain — the vector
    corpus is never scanned, the tiny DV broadcasts instead of
    shuffling, and no training aggregate appears in the plan (the
    decision is count/sum arithmetic over artifact rows)."""
    df = specs["q_dv_fraction"].build(spark, SF)
    plan = formatted_plan(df)
    assert "ann_index_forget_" in plan       # committed artifact scans
    assert "embeddings.parquet" not in plan  # corpus never read
    assert "decimal(30,10)" not in plan      # no Lloyd training
    assert has_broadcast_join(df)            # DV broadcast, not shuffled


def test_ann_dv_rewrite_serve_is_training_free(spark, specs):
    """The physically-rewritten serve (r10/r11): reads the rewritten
    artifacts plus the leftover logical DV (broadcast anti-join at
    candidate time); zero training aggregates — the rewrite ran in
    the version-guarded pass, never in the query plan."""
    df = specs["q_ann_dv_rewrite"].build(spark, SF)
    plan = formatted_plan(df)
    assert "ann_dv_rw_" in plan              # rewritten artifact scans
    assert "HashAggregate" not in plan       # zero Lloyd / zero pivots
    assert "ObjectHashAggregate" not in plan
    assert "TakeOrderedAndProject" in plan   # shortlist + re-rank heaps


def test_ann_retrain_serve_is_training_free(spark, specs):
    """The retrain actuator's serve (r11): the rebuild trained once in
    the version-guarded `retrain_ann_index` build; the query plan
    reads the four committed artifacts and ranks with joins + top-k
    heaps only — the same contract every committed-index serve pins."""
    df = specs["q_ann_retrain"].build(spark, SF)
    plan = formatted_plan(df)
    assert "ann_retrain_" in plan            # committed artifact scans
    assert "HashAggregate" not in plan
    assert "ObjectHashAggregate" not in plan
    assert "TakeOrderedAndProject" in plan


def test_proto_prune_serve_is_training_free(spark, specs):
    """VERDICT r11 item 2 — the serve-split standard applied to the
    prune: scoring reads the committed centroids/cells artifacts with
    ZERO Lloyd in the plan, and because the stored assignment already
    holds each vector's argmin cell, even the n·K argmin groupBy
    disappears — the score is one broadcast equi-join + the ranked
    window."""
    df = specs["q_proto_prune_from_index"].build(spark, SF)
    plan = formatted_plan(df)
    assert "ann_index_" in plan              # committed artifact scans
    assert "decimal(30,10)" not in plan      # zero Lloyd training
    assert "HashAggregate" not in plan       # argmin sweep gone too
    assert "ObjectHashAggregate" not in plan
    assert "CartesianProduct" not in plan
    assert has_broadcast_join(df)            # K centroids broadcast


def test_dedup_semantic_serve_is_training_free(spark, specs):
    """VERDICT r11 item 5 — the q_dedup_semantic slope watch's fix:
    SemDeDup pairs from the committed cell assignment; the only
    remaining cost is the within-cell pair join (the quantizer chain
    that dominated the in-query slope never enters the plan)."""
    df = specs["q_dedup_semantic_from_index"].build(spark, SF)
    plan = formatted_plan(df)
    assert "ann_index_" in plan              # committed artifact scans
    assert "decimal(30,10)" not in plan      # zero Lloyd training
    assert "CartesianProduct" not in plan    # pair search stays equi-join
    assert "BroadcastNestedLoopJoin" not in plan


def test_proto_prune_plan(spark, specs):
    # train + one ranked scan: the only nested-loop is the declared
    # K-row centroid broadcast; no CartesianProduct; the per-cell
    # window never global-sorts
    df = specs["q_proto_prune"].build(spark, SF)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert "Sort [dist" not in plan.replace(
        "Sort [cell", "")  # window sort is per-cell, not global
    cols = read_schema_columns(df)
    assert "label" not in cols, "prune reads only vec_id+embedding"


def test_bitext_mine_plan(spark):
    # the TEST-ONLY exact audit (retired from the contract in r13):
    # language sides: lang filter pushes to the documents scan; the
    # candidate block is the declared broadcast of the smaller side;
    # nothing cartesian
    from healthkit_to_sqlite_spark.catalog import load_table
    from healthkit_to_sqlite_spark.operators.similarity import bitext_mine

    df = bitext_mine(load_table(spark, SF, "embeddings"),
                     load_table(spark, SF, "documents"))
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan
    pushed = " ".join(pushed_filters(df))
    assert "lang" in pushed, "lang predicate must reach the scan"
    cols = read_schema_columns(df)
    assert "text" not in cols and "source" not in cols, (
        "mining reads doc_id+lang only from documents")


def test_kcenter_plan_is_incremental(spark, specs):
    # the running-dmin design: the final round's plan must reference
    # only the (checkpointed) previous round + ONE literal center —
    # i.e. no cartesian/join growth with k, and no global sort other
    # than the TakeOrdered argmax (which never appears in the
    # returned local relation)
    from healthkit_to_sqlite_spark.operators.similarity import (
        kcenter_coreset)
    from healthkit_to_sqlite_spark.catalog import load_table

    df = kcenter_coreset(load_table(spark, SF, "embeddings"))
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert "Join" not in plan, "selection result must be a local relation"


def test_bitext_from_index_serve_has_no_crossjoin_no_training(spark, specs):
    """VERDICT r11 item 1 — the one operator whose written 100 TB
    story had no code: stage-1 candidates must come from the
    committed index via an EQUI-join on the cell id.  Zero Lloyd
    (no decimal training aggregates), zero crossJoin between the
    language sides — the only nested-loop is the K-row centroid
    probe broadcast (one node = two formatted mentions)."""
    df = specs["q_bitext_from_index"].build(spark, SF)
    plan = formatted_plan(df)
    assert "ann_index_" in plan              # committed artifact scans
    # zero training: the serve is joins + windows only — Lloyd's mean
    # and argmin stages would surface as aggregates (the margin's own
    # decimal window sums are Window nodes, not aggregates, so the
    # family's decimal(30,10) probe can't distinguish here)
    assert "HashAggregate" not in plan
    assert "ObjectHashAggregate" not in plan
    assert "posexplode" not in plan          # the Lloyd mean explode
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") == 2
    cols = read_schema_columns(df)
    assert "text" not in cols and "source" not in cols


def test_bitext_forget_reads_erased_head_dv_broadcast(spark, specs):
    """The DV-erased bitext serve shares `_bitext_index_serve` (the
    live-serve pins apply); what is specific here: it reads the
    FORGET catalog's artifacts and the tombstone anti-join rides a
    broadcast — the DV read path, never a corpus-sized shuffle."""
    df = specs["q_bitext_forget"].build(spark, SF)
    plan = formatted_plan(df)
    assert "ann_index_forget_" in plan       # erased-head artifacts
    assert "CartesianProduct" not in plan
    assert "HashAggregate" not in plan       # zero training
    assert has_broadcast_join(df)


def test_bitext_single_fold_chain(spark):
    # the scored-pairs fold must appear ONCE: both k-NN means are
    # window aggregates on one linear lineage (the groupBy-join-back
    # form branches the BNLJ subtree three ways with non-reusable
    # exchanges — the fold would run 3x).  bitext_mine is the
    # TEST-ONLY exact audit since r13 (VERDICT r12 item 2) — this pin
    # keeps the audit arm honest, not a contract plan.
    from healthkit_to_sqlite_spark.catalog import load_table
    from healthkit_to_sqlite_spark.operators.similarity import bitext_mine

    df = bitext_mine(load_table(spark, SF, "embeddings"),
                     load_table(spark, SF, "documents"))
    plan = formatted_plan(df)
    # formatted explain prints each node twice (tree + details):
    # exactly one BNLJ node => exactly two mentions
    assert plan.count("BroadcastNestedLoopJoin") == 2


def test_no_contract_query_crossjoins_two_corpus_sides(spark, specs):
    """VERDICT r12 item 2 (Done criterion): with q_bitext_mine
    demoted, NO registered query's plan may crossJoin two
    corpus-shaped sides.  (a) The all-pairs forms are not registered;
    (b) every registered bitext/selection query that replaced one is
    CartesianProduct-free and its only nested loops are bounded
    broadcasts (the K-row centroid probe / 1-row query vector),
    pinned by counting BNLJ nodes."""
    from healthkit_to_sqlite_spark.registry import queries

    registered = set(queries())
    assert "q_bitext_mine" not in registered
    assert "q_brute_force_pairs" not in registered
    # the family that replaced the all-pairs plan: candidates must
    # come from an equi-join on the committed cell id
    for name, max_bnlj in (("q_bitext_append", 1),
                           ("q_bitext_recall_report", None)):
        df = specs[name].build(spark, SF)
        plan = formatted_plan(df)
        assert "CartesianProduct" not in plan, name
        if max_bnlj is not None:
            # one bounded BNLJ: the K-row centroid probe broadcast
            assert plan.count("BroadcastNestedLoopJoin") == 2 * max_bnlj, name


def test_bitext_append_probes_only_the_batch(spark, specs):
    """Append symmetry contract: zero Lloyd in the serve plan (the
    catalog build is the version-guarded warm-up), and the batch
    predicate reaches the source scan — probe cost tracks |batch|,
    never the corpus."""
    df = specs["q_bitext_append"].build(spark, SF)
    plan = formatted_plan(df)
    assert "ann_index_append_" in plan       # committed artifacts
    assert "HashAggregate" not in plan       # zero training
    assert "ObjectHashAggregate" not in plan
    assert "posexplode" not in plan
    assert "CartesianProduct" not in plan
    pushed = " ".join(pushed_filters(df))
    assert "vec_id" in pushed, "batch cursor must reach a scan"


def test_curriculum_order_no_global_sort(spark, specs):
    # the closed-form interleave keeps the plan to ONE window
    # exchange (per source); the reference definition's global
    # ROW_NUMBER would need a range-partitioned (or worse, single-
    # partition) global sort — neither may appear
    df = specs["q_curriculum_order"].build(spark, SF)
    plan = formatted_plan(df)
    assert "rangepartitioning" not in plan.lower()
    assert "SinglePartition" not in plan
    assert "CartesianProduct" not in plan
    cols = read_schema_columns(df)
    assert "text" in cols and "n_chars" not in cols


def test_facet_page_pushes_filter_and_heaps_the_page(spark, specs):
    """The Datasette table-view shape (reference README.md:96-110):
    the user filter AND the keyset cursor are pushable predicates —
    page N's scan reads only rows past the cursor (the reason keyset
    beats OFFSET at scale); the page is a TakeOrdered heap, never a
    global sort; the ≤|values| facet-count side broadcasts."""
    df = specs["q_facet_page"].build(spark, SF)
    plan = formatted_plan(df)
    pushed = " ".join(pushed_filters(df))
    assert "o_orderstatus" in pushed, "user filter must reach the scan"
    assert "o_orderdate" in pushed, "keyset cursor must reach the scan"
    assert "TakeOrderedAndProject" in plan
    assert has_broadcast_join(df)
    assert "CartesianProduct" not in plan


def test_decontaminate_fuzzy_broadcasts_eval_variants(spark, specs):
    # same contract as the exact audit: the eval-side variant
    # inventory broadcasts; corpus variants never shuffle for the
    # match (the one exchange is the per-doc count's groupBy)
    df = specs["q_decontaminate_fuzzy"].build(spark, SF)
    plan = formatted_plan(df)
    assert has_broadcast_join(df)
    assert "CartesianProduct" not in plan
    # three exchanges, none corpus-sized: the eval-side DISTINCT
    # (eval-bounded rows), then countDistinct's two-phase pair —
    # both over only the MATCHED subset, never the x6 variant stream
    assert shuffle_count(df) == 3


# --- VERDICT r13 item 4: the structural no-cartesian sweep ----------------

#: Queries whose plans legitimately contain BroadcastNestedLoopJoin:
#: every entry's non-equi/cross side is a DECLARED BOUNDED set
#: broadcast against the streamed corpus shard (the exact-audit-arm
#: shape VERDICT r13 ruled correct at scale for sampled monitors).
#: Everything NOT listed here must be nested-loop-free: a new query
#: that reintroduces an all-pairs plan fails the sweep by name.
#: Discovered by running the sweep with an empty list and verifying
#: each hit's broadcast side against its operator's docstring.
ALLOWED_BNLJ: frozenset = frozenset({
    # 1-row corpus-statistics broadcast (crossJoin of a scalar
    # aggregate: |corpus|, total tokens, budget row, stat bounds)
    "q_skew_report", "q_vocab_topk", "q_bm25", "q_dsir_resample",
    "q_dsir_weights", "q_heavy_hitters", "q_lm_perplexity",
    "q_quantize_int8", "q_mixture_rebalance", "q_expectations",
    "q_tfidf", "q_temperature_sample", "q_token_budget_mix",
    "q_bloom_prune", "q_rrf_fusion", "q_pipeline_e2e",
    "q_multimodal_embed", "q_negative_pairs",
    # r14: the covariance kernel's 1-row corpus-count broadcast
    # (crossJoin of the n row against the ≤2080 product sums)
    "q_embed_covariance",
    # ≤K-row centroid table broadcast (probe-side nearest-centroid
    # joins in serve/probe shapes; K is corpus-derived).  The r14
    # assignment-kernel flip (HK_ASSIGN_KERNEL default np) removed the
    # TRAINER-side nested loops outright — q_dedup_semantic,
    # q_ivf_postings and q_proto_prune left this list because their
    # only BNLJ came from the broadcast-join assignment, now a
    # mapInPandas pass with no join at all
    "q_ann_ivf", "q_ann_ivfpq", "q_ann_ivfpq_residual",
    "q_ann_index_append", "q_ann_retrain", "q_ann_forget",
    "q_ann_dv_rewrite",
    "q_ann_binary", "q_ann_pq",
    # 1-row query vector / ≤Q-row query-set probe broadcast (serve
    # shapes: the corpus streams, the query side is KBs)
    "q_ann_query_from_index", "q_ann_batch_queries", "q_ann_filtered",
    "q_ann_filtered_from_index", "q_topk_cosine", "q_mrl_rerank",
    # bounded probe-set monitors / batch-restricted bitext serves
    # (probe ids < 100 or the ingest batch broadcast; VERDICT r13
    # ruled this exact-audit-arm shape correct at scale)
    "q_ann_recall_report", "q_bitext_append", "q_bitext_recall_report",
    "q_bitext_from_index", "q_bitext_forget", "q_hybrid_from_index",
})


def test_no_registered_plan_is_cartesian(spark, specs):
    """VERDICT r13 What's-missing 4: the 'no contract query crossJoins
    two corpus-shaped sides' claim, made STRUCTURAL — build every
    registered plan (compile only, no execution beyond the
    version-guarded catalog warm-ups) and assert (a) CartesianProduct
    appears nowhere, (b) BroadcastNestedLoopJoin appears only for the
    allow-listed declared bounded probes.  test_plans' named pins
    covered 2 of 229; this covers all of them, and any future query
    that sneaks an all-pairs join in fails here by name."""
    from healthkit_to_sqlite_spark.registry import queries

    registered = queries()
    cartesian, stray_bnlj, errors = [], [], []
    has_bnlj = set()
    for name in registered:
        try:
            plan = formatted_plan(specs[name].build(spark, SF))
        except Exception as e:  # noqa: BLE001 — name the breakage
            errors.append(f"{name}: {type(e).__name__}: {str(e)[:120]}")
            continue
        if "CartesianProduct" in plan:
            cartesian.append(name)
        if "BroadcastNestedLoopJoin" in plan:
            has_bnlj.add(name)
            if name not in ALLOWED_BNLJ:
                stray_bnlj.append(name)
    assert not errors, errors
    assert cartesian == [], f"CartesianProduct in: {cartesian}"
    assert stray_bnlj == [], (
        "BroadcastNestedLoopJoin outside the declared bounded-probe "
        f"allow-list: {stray_bnlj}")
    # the allow-list stays EXACT: an entry whose plan no longer nests
    # must leave the list, or the list silently over-permits
    stale = sorted(ALLOWED_BNLJ - has_bnlj)
    assert stale == [], f"stale ALLOWED_BNLJ entries (no BNLJ now): {stale}"
