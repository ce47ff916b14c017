"""Pipeline operator properties: CC kernel equivalence + round counts.

The registered `dedup_clusters` rides the large-star/small-star
kernel (since r14, VERDICT r13 item 1); `dedup_clusters_minlabel`
is the test-only min-label propagation audit.  The two independent
kernels must produce exactly the same component-min labels (the
q_dedup_clusters oracle's contract), and star must converge in
O(log n) rounds where propagation needs O(diameter) — pinned on a
path graph, the worst-case diameter shape.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from healthkit_to_sqlite_spark.catalog import load_table
from healthkit_to_sqlite_spark.operators.pipeline import (
    connected_components_star,
    dedup_clusters,
    dedup_clusters_minlabel,
)

SF = "/root/testdata/sf0.001"


def test_star_equals_propagation_on_lsh_graph(spark):
    docs = load_table(spark, SF, "documents")
    prop = {(r.doc_id, r.cluster_id, r.is_keeper)
            for r in dedup_clusters_minlabel(docs).collect()}
    star = {(r.doc_id, r.cluster_id, r.is_keeper)
            for r in dedup_clusters(docs).collect()}
    assert star == prop


def test_star_contracts_long_chain_in_log_rounds(spark):
    # path 0-1-2-…-63: diameter 63 ⇒ min-label propagation needs ~63
    # rounds; star contraction must finish in O(log n)
    n = 64
    edges = spark.range(n - 1).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst"))
    labels, rounds = connected_components_star(edges)
    got = {(r.node, r.label) for r in labels.collect()}
    assert got == {(i, 0) for i in range(n)}
    assert rounds <= 10, rounds


def test_star_handles_multiple_components_and_orientation(spark):
    # two components, edges in mixed orientation with dups/self-loops
    rows = [(5, 3), (3, 5), (3, 1), (7, 9), (9, 11), (4, 4)]
    edges = spark.createDataFrame(rows, "src long, dst long")
    labels, _ = connected_components_star(edges)
    got = {(r.node, r.label) for r in labels.collect()}
    assert got == {(1, 1), (3, 1), (5, 1), (7, 7), (9, 7), (11, 7)}


def test_global_shuffle_is_a_permutation(spark):
    from healthkit_to_sqlite_spark.operators.pipeline import (
        N_SHUFFLE_SHARDS, global_shuffle)
    docs = load_table(spark, SF, "documents")
    n = docs.count()
    out = global_shuffle(docs)
    rows = out.collect()
    assert len(rows) == n
    assert len({r.doc_id for r in rows}) == n
    # per shard, positions are exactly 1..|shard| (dense, no gaps)
    by_shard: dict = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r.pos)
    assert set(by_shard) <= set(range(N_SHUFFLE_SHARDS))
    for positions in by_shard.values():
        assert sorted(positions) == list(range(1, len(positions) + 1))


def test_train_split_fractions_and_stability(spark):
    from healthkit_to_sqlite_spark.operators.pipeline import train_val_test_split
    docs = load_table(spark, SF, "documents")
    got = {r.split: r.n_docs for r in train_val_test_split(docs).collect()}
    n = sum(got.values())
    assert got["train"] / n > 0.7 and got["test"] / n < 0.2
    # hash assignment: a subset of the corpus gets identical splits
    sub = {r.split: r.n_docs
           for r in train_val_test_split(docs.filter(F.col("doc_id") < 100))
           .collect()}
    assert sum(sub.values()) == 100 and set(sub) == set(got)


def test_quality_funnel_is_monotone(spark):
    from healthkit_to_sqlite_spark.operators.pipeline import quality_funnel
    docs = load_table(spark, SF, "documents")
    for r in quality_funnel(docs).collect():
        assert r.n_total >= r.n_len >= r.n_diversity >= r.n_lang


def test_pagerank_conserves_mass_and_ranks_hubs(spark):
    from healthkit_to_sqlite_spark.operators.pipeline import pagerank
    docs = load_table(spark, SF, "documents")
    rows = pagerank(docs).collect()
    assert rows, "LSH graph should be non-empty on the test corpus"
    # undirected graph has no dangling nodes ⇒ total rank stays 1
    assert abs(sum(r.pagerank for r in rows) - 1.0) < 1e-3
    assert all(r.pagerank > 0 for r in rows)


def test_zorder_bounds_both_dims_per_file(spark):
    from healthkit_to_sqlite_spark.operators.pipeline import zorder_layout
    events = load_table(spark, SF, "events")
    rows = zorder_layout(events).collect()
    # 16 z-contiguous cells = one 4×4 block of the 16×16 grid: every
    # file's min/max range must be tight in BOTH dims — the property
    # that makes either-dim predicates prune (an x-sorted layout would
    # leave y spans at 15)
    for r in rows:
        assert r.x_max - r.x_min <= 3, r
        assert r.y_max - r.y_min <= 3, r


def test_bloom_filter_prunes_nonmatching_keys(spark):
    from healthkit_to_sqlite_spark.operators.pipeline import (
        BLOOM_NATION, bloom_semi_join)
    li = load_table(spark, SF, "lineitem")
    sup = load_table(spark, SF, "supplier")
    out = {r.l_returnflag: r.n_items
           for r in bloom_semi_join(li, sup).collect()}
    # exact semi-join ground truth
    keys = {r.s_suppkey for r in
            sup.filter(F.col("s_nationkey") == BLOOM_NATION).collect()}
    truth: dict = {}
    for r in li.select("l_suppkey", "l_returnflag").collect():
        if r.l_suppkey in keys:
            truth[r.l_returnflag] = truth.get(r.l_returnflag, 0) + 1
    assert out == truth
    # the 64 Kbit filter over a handful of keys must prune almost
    # everything: false-positive rate ≈ (2k/m)² ≪ 1%
    n_total = li.count()
    n_match = sum(truth.values())
    assert n_match < n_total * 0.5, "fixture: filter must be selective"


def test_mixture_rebalance_targets_uniform(spark):
    from healthkit_to_sqlite_spark.operators.pipeline import mixture_rebalance
    docs = load_table(spark, SF, "documents")
    rows = mixture_rebalance(docs).collect()
    n_total = sum(r.n_docs for r in rows)
    target = n_total / len(rows)
    for r in rows:
        assert 0 < r.n_kept <= r.n_docs
        # under-represented sources keep everything; over-represented
        # ones land near the uniform target (hash granularity ± slack)
        if r.n_docs <= target:
            assert r.n_kept == r.n_docs, r
        else:
            assert abs(r.n_kept - target) < 0.35 * target, (r, target)


def test_session_windows_are_disjoint_per_user(spark):
    from healthkit_to_sqlite_spark.operators.timeseries import (
        session_window_agg)
    events = load_table(spark, SF, "events")
    by_user: dict = {}
    for r in session_window_agg(events).collect():
        assert r.n_events >= 1
        assert r.session_end > r.session_start
        by_user.setdefault(r.user_id, []).append(
            (r.session_start, r.session_end))
    for sessions in by_user.values():
        sessions.sort()
        for (s1, e1), (s2, _) in zip(sessions, sessions[1:]):
            assert s2 >= e1, "gap-merged sessions must not overlap"


def test_hll_merge_accuracy(spark):
    from healthkit_to_sqlite_spark.operators.pipeline import hll_merge
    events = load_table(spark, SF, "events")
    got = {r.event_type: r.approx_users for r in hll_merge(events).collect()}
    exact = {r.event_type: r.n for r in
             events.groupBy("event_type")
             .agg(F.countDistinct("user_id").alias("n")).collect()}
    exact["__all__"] = events.select("user_id").distinct().count()
    assert set(got) == set(exact)
    for k, est in got.items():
        assert abs(est - exact[k]) <= max(2, 0.02 * exact[k]), (k, est, exact[k])


def test_containment_catches_embedded_subset(spark):
    from healthkit_to_sqlite_spark.operators.dedup import (
        containment_pairs, ngram_jaccard_pairs)
    words_b = " ".join(f"w{i}" for i in range(12))
    text_a = words_b + " " + " ".join(f"x{i}" for i in range(60))
    docs = spark.createDataFrame(
        [(1, text_a), (2, words_b)], "doc_id long, text string")
    got = containment_pairs(docs).collect()
    assert len(got) == 1 and got[0].containment == 1.0
    # the same pair scores low on symmetric Jaccard — the dilution
    # containment exists to fix
    jac = ngram_jaccard_pairs(docs, threshold=0.0).collect()
    assert jac and jac[0].jaccard < 0.2


def test_salted_join_keeps_null_keys(spark):
    # pmod(NULL) is NULL and a NULL salt never equi-joins — the
    # coalesce(0) salt must keep NULL-event_id rows identical to the
    # unsalted join (review finding)
    from healthkit_to_sqlite_spark.operators.pipeline import salted_join

    ev = spark.createDataFrame(
        [(1, 10, None), (2, 10, 5.0), (3, 20, 1.0)],
        "user_id long, value long, x double").selectExpr(
        "user_id", "CASE WHEN x IS NULL THEN NULL ELSE CAST(x AS LONG) END"
        " AS event_id", "CAST(value AS DOUBLE) AS value",
        "CAST('2024-01-01' AS TIMESTAMP) AS ts",
        "'click' AS event_type", "'{}' AS props")
    out = salted_join(ev)
    assert out.filter("event_id IS NULL").count() == 1


def test_qgram_blocking_bounded_under_shared_token_skew(spark):
    """Worst case for word blocking: EVERY name shares one ubiquitous
    token, so word blocking degenerates to all-pairs (n*(n-1)/2).
    Positional q-gram blocking keys on (gram, ±max_dist offset), so
    the shared token only collides names where it sits at nearly the
    same position — the candidate set must stay well under all-pairs,
    and true near-matches must still be found."""
    from pyspark.sql import functions as F

    from healthkit_to_sqlite_spark.operators.text import (
        fuzzy_name_pairs, qgram_candidates)

    # 60 names, all containing 'common', preceded by distinct
    # aperiodic prefixes whose lengths spread the shared token over 40
    # offsets; plus two genuine near-duplicates (edit distance 1)
    rows = []
    for i in range(60):
        pre = "".join(chr(97 + (i * 5 + k * k) % 26) for k in range(i % 40))
        rows.append(((pre + " common tail" + format(i, "02d")).strip(),))
    rows += [("alpha common beta",), ("alpha common betb",)]
    names = (spark.createDataFrame(rows, "p_name string")
             .groupBy(F.col("p_name").alias("name"))
             .agg(F.count(F.lit(1)).alias("n_parts")))

    n = names.count()
    all_pairs = n * (n - 1) // 2
    n_cand = qgram_candidates(names).count()
    # word blocking would emit ~all_pairs (every pair shares 'common');
    # the positional net must stay far below that
    assert n_cand < all_pairs / 3, (n_cand, all_pairs)

    # and recall holds: the planted near-duplicate pair survives
    out = fuzzy_name_pairs(
        spark.createDataFrame(rows, "p_name string")).collect()
    found = {(r["name_a"], r["name_b"]) for r in out}
    assert ("alpha common beta", "alpha common betb") in found


def test_heavy_hitters_exact_and_partitioning_independent(spark):
    """MG candidates + exact verify must return EXACTLY the tokens
    above N/(capacity+1) with their true counts, for any partitioning —
    the summary is per-partition, so this is the guarantee that matters.
    Fixture: 400 distinct rare tokens (≫ 32 counters) + 3 hot ones."""
    from healthkit_to_sqlite_spark.operators.pipeline import heavy_hitters

    hot = {"alpha": 500, "beta": 300, "gamma": 120}
    stream = sorted(
        [t for t, c in hot.items() for _ in range(c)]
        + [f"tok{i:03d}" for i in range(400)])
    docs = [" ".join(stream[i:i + 40]) for i in range(0, len(stream), 40)]
    df = spark.createDataFrame(list(enumerate(docs)),
                               "doc_id long, text string")
    n_total = len(stream)
    expected = {(t, c) for t, c in hot.items() if c > n_total / 33.0}
    assert expected == {(t, c) for t, c in hot.items()}  # fixture sanity
    for parts in (1, 7):
        got = {(r.token, r.n)
               for r in heavy_hitters(df.repartition(parts)).collect()}
        assert got == expected, (parts, got)


def test_exact_substring_finds_planted_span(spark):
    """A k-token span planted in two docs (different surroundings) must
    surface with n_docs=2, n_occ=2; sub-windows crossing the span
    boundary differ between the docs so only the aligned span repeats."""
    from healthkit_to_sqlite_spark.operators.dedup import duplicated_spans

    span = "p q r s t u v w"
    rows = [(0, "a b c " + span + " x y"),
            (1, span + " zz ww"),
            (2, "unrelated tokens only here indeed truly present today")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = duplicated_spans(df).collect()
    hits = [r for r in got if r.span == span]
    assert len(hits) == 1 and hits[0].n_docs == 2 and hits[0].n_occ == 2
    assert all(r.n_docs >= 2 for r in got)


def test_retention_cohort_week0_equals_cohort_size(spark):
    """Every user is active in their first week by definition, so the
    weeks_since=0 cell must equal the cohort's user count exactly."""
    from healthkit_to_sqlite_spark.operators.timeseries import (
        retention_cohorts,
    )

    ev = load_table(spark, SF, "events")
    got = retention_cohorts(ev).collect()
    assert got and all(r.weeks_since >= 0 for r in got)
    week0 = {r.cohort_week: r.n_users for r in got if r.weeks_since == 0}
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("w"))
    sizes = {r.w.date(): r.n for r in
             firsts.groupBy("w")
             .agg(F.countDistinct("user_id").alias("n")).collect()}
    assert week0 == sizes


def test_source_cap_binds_and_is_repartition_stable(spark):
    from healthkit_to_sqlite_spark.operators.pipeline import source_cap
    docs = load_table(spark, SF, "documents")
    kept = source_cap(docs, cap=7).collect()
    per_src: dict[str, int] = {}
    for r in kept:
        per_src[r.source] = per_src.get(r.source, 0) + 1
    assert per_src and all(v <= 7 for v in per_src.values())
    # every source with >=7 docs contributes exactly 7
    totals = {r.source: r.n for r in
              docs.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    for s, n in totals.items():
        assert per_src.get(s, 0) == min(n, 7)
    # hash-order selection is a pure function of doc_id ⇒ identical
    # under a different physical partitioning
    again = source_cap(docs.repartition(13), cap=7).collect()
    assert {(r.doc_id, r.source, r.sample_rank) for r in again} == \
        {(r.doc_id, r.source, r.sample_rank) for r in kept}


def test_temperature_sample_tempers_language_skew(spark):
    import math

    from healthkit_to_sqlite_spark.operators.pipeline import temperature_sample
    docs = load_table(spark, SF, "documents")
    totals = {r.lang: r.n for r in
              docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    kept = temperature_sample(docs).collect()
    per: dict[str, int] = {}
    for r in kept:
        per[r.lang] = per.get(r.lang, 0) + 1
    n_min = min(totals.values())
    min_lang = [l for l, n in totals.items() if n == n_min]
    # the smallest language keeps everything (rate floor(1.0*scale))
    for l in min_lang:
        assert per[l] == totals[l]
    # realized keep ratio tracks sqrt(n_min/n_s) (hash uniformity ⇒
    # small deviation; deterministic, so the bound is tight per fixture)
    for l, n in totals.items():
        want = math.sqrt(n_min / n)
        assert abs(per.get(l, 0) / n - want) < 0.12
    # deterministic: same membership on a different partitioning
    again = {(r.doc_id, r.lang)
             for r in temperature_sample(docs.repartition(7)).collect()}
    assert again == {(r.doc_id, r.lang) for r in kept}


def test_scd2_intervals_tile_each_user_timeline(spark):
    """Type-2 history must be a tiling: consecutive versions abut
    (valid_to == next valid_from), states actually change between
    versions, and exactly one open (is_current) interval per user."""
    from healthkit_to_sqlite_spark.operators.timeseries import scd2_history

    ev = load_table(spark, SF, "events")
    rows = scd2_history(ev).collect()
    assert rows
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    for user, hist in by_user.items():
        hist.sort(key=lambda r: r.version)
        assert [r.version for r in hist] == list(range(1, len(hist) + 1))
        assert sum(r.is_current for r in hist) == 1 and hist[-1].is_current
        for a, b in zip(hist, hist[1:]):
            assert a.valid_to == b.valid_from
            assert a.state != b.state


def test_ewma_identity_and_convexity(spark):
    """A user's first event smooths to itself; every EWMA is a convex
    combination, so it lies within [min, max] of its 8-row tail."""
    from healthkit_to_sqlite_spark.operators.timeseries import ewma_halflife

    ev = load_table(spark, SF, "events")
    got = {r.event_id: r for r in ewma_halflife(ev).collect()}
    series: dict[int, list] = {}
    for r in sorted(got.values(), key=lambda r: (r.ts, r.event_id)):
        series.setdefault(r.user_id, []).append(r)
    assert series
    for user, rows in series.items():
        assert got[rows[0].event_id].ewma == round(rows[0].value, 6)
        for i, r in enumerate(rows):
            tail = [x.value for x in rows[max(0, i - 7):i + 1]]
            assert min(tail) - 1e-6 <= r.ewma <= max(tail) + 1e-6


def test_first_touch_is_min_event_time(spark):
    from healthkit_to_sqlite_spark.operators.timeseries import first_touch

    ev = load_table(spark, SF, "events")
    got = first_touch(ev).collect()
    want = {(r.user_id, r.event_type): r.m
            for r in ev.groupBy("user_id", "event_type")
            .agg(F.min("ts").alias("m")).collect()}
    assert len(got) == len(want)
    for r in got:
        assert r.first_ts == want[(r.user_id, r.event_type)]


def test_span_scrub_removes_planted_duplicate_segment(spark):
    """An aligned 8-token segment shared by two docs is scrubbed from
    both; a unique doc loses nothing; budgets reconcile exactly."""
    from healthkit_to_sqlite_spark.operators.dedup import span_scrub

    dup = "p q r s t u v w"
    rows = [(0, dup + " a b c d e f g h"),        # dup seg at slot 1
            (1, dup + " z1 z2 z3"),               # dup seg at slot 1
            (2, "only unique tokens appear in this tiny document x")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in span_scrub(df).collect()}
    assert got[0].n_scrubbed_segments == 1 and got[0].n_tokens_kept == 8
    assert got[1].n_scrubbed_segments == 1 and got[1].n_tokens_kept == 3
    assert got[2].n_scrubbed_segments == 0
    for r in got.values():
        assert r.n_tokens_kept == r.n_tokens - 8 * r.n_scrubbed_segments


def test_incremental_agg_merge_equals_rescan(spark):
    """The merged artifact+delta must equal a full rescan bit-exactly —
    the algebraic-mergeability property the operator exists for."""
    from healthkit_to_sqlite_spark.operators.pipeline import (
        incremental_agg_merge,
    )

    ev = load_table(spark, SF, "events")
    merged = {r.event_type: (r.n_events, r.sum_value)
              for r in incremental_agg_merge(ev).collect()}
    from healthkit_to_sqlite_spark.functions import dec_sum
    direct = {r.event_type: (r.n, r.s)
              for r in ev.groupBy("event_type")
              .agg(F.count(F.lit(1)).alias("n"),
                   dec_sum("value").alias("s")).collect()}
    assert merged == direct


def test_snapshot_diff_finds_planted_edits_and_is_empty_on_identity(spark):
    from healthkit_to_sqlite_spark.operators.pipeline import (
        _snapshots,
        snapshot_diff,
    )

    docs = load_table(spark, SF, "documents")
    assert snapshot_diff(docs, docs).count() == 0
    old, new = _snapshots(docs)
    got = {r.doc_id: r for r in snapshot_diff(old, new).collect()}
    for r in docs.select("doc_id", "n_chars").collect():
        m = r.doc_id % 20
        if m == 0:
            assert got[r.doc_id].change_type == "removed"
            assert got[r.doc_id].new_n_chars is None
        elif m == 1:
            assert got[r.doc_id].change_type == "added"
            assert got[r.doc_id].old_n_chars is None
        elif 2 <= m <= 4:
            assert got[r.doc_id].change_type == "changed"
            assert got[r.doc_id].new_n_chars == r.n_chars + 1
        else:
            assert r.doc_id not in got


def test_entity_resolution_is_transitive_and_canonical(spark):
    """A~B and B~C (each within edit distance 4) must land in ONE
    entity even when A~C alone would not match — the transitivity CC
    adds over pairwise fuzzy matching; unmatched names resolve to
    themselves as singletons."""
    from healthkit_to_sqlite_spark.operators.pipeline import (
        entity_resolution,
    )

    rows = ([("aaaa bbbb cccc",)] * 3          # A
            + [("aaaa bbbb cccx dd",)] * 2     # B: dist(A,B)=3
            + [("aaaa bbbb cccx dd ee",)]      # C: dist(B,C)=3
            + [("zzzz completely different",)])
    df = spark.createDataFrame(rows, "p_name string")
    got = {r.name: r for r in entity_resolution(df).collect()}
    a, b, c = ("aaaa bbbb cccc", "aaaa bbbb cccx dd",
               "aaaa bbbb cccx dd ee")
    # direct distances: d(a,b)=4, d(b,c)=5>4 would break the chain —
    # recompute to keep the fixture honest
    import duckdb
    d_ab = duckdb.sql(f"select levenshtein('{a}','{b}')").fetchone()[0]
    d_bc = duckdb.sql(f"select levenshtein('{b}','{c}')").fetchone()[0]
    d_ac = duckdb.sql(f"select levenshtein('{a}','{c}')").fetchone()[0]
    assert d_ab <= 4 and d_bc <= 4 and d_ac > 4
    assert got[a].entity_id == got[b].entity_id == got[c].entity_id == a
    assert got[a].is_canonical and not got[b].is_canonical
    z = "zzzz completely different"
    assert got[z].entity_id == z and got[z].is_canonical
    assert got[a].n_parts == 3 and got[b].n_parts == 2


def test_graph_jaccard_bounds_and_direct_equality(spark):
    from healthkit_to_sqlite_spark.operators.similarity import (
        dedup_embedding_pairs,
        graph_jaccard,
        KNN_MIN_COS,
    )

    emb = load_table(spark, SF, "embeddings")
    got = graph_jaccard(emb).collect()
    assert got
    import collections
    nbrs: dict[int, set] = collections.defaultdict(set)
    for r in dedup_embedding_pairs(emb, min_cosine=KNN_MIN_COS).collect():
        nbrs[r.vec_a].add(r.vec_b)
        nbrs[r.vec_b].add(r.vec_a)
    for r in got:
        inter = nbrs[r.vec_a] & nbrs[r.vec_b]
        union = nbrs[r.vec_a] | nbrs[r.vec_b]
        assert r.n_common == len(inter) > 0
        assert r.deg_a == len(nbrs[r.vec_a])
        assert r.jaccard == round(len(inter) / len(union), 6)
        assert 0 < r.jaccard <= 1


def test_kll_merge_accuracy_vs_exact(spark):
    """Per-type and merged KLL quantiles must satisfy the sketch's
    ACTUAL guarantee — normalized RANK error |rank(est)/n − q| ≤ ε —
    not a value-distance bound.  (The r4 suite pinned |est − exact(q)|
    ≤ 3% of the value range at p99, which is flaky by construction:
    ~1.7% rank error at default k maps through the LOCAL DENSITY to
    unbounded value error in a sparse tail, so a merge-order change in
    the randomized compaction legitimately failed the pin.  VERDICT r4
    item 1.)  ε = 0.025 gives ~1.5× headroom over the k=200 single
    sketch bound while still rejecting any real regression (a broken
    sketch is off by whole percentiles, not 2.5%)."""
    import bisect

    from healthkit_to_sqlite_spark.operators.pipeline import (
        kll_quantile_merge,
    )

    ev = load_table(spark, SF, "events")
    got = {r.event_type: r for r in kll_quantile_merge(ev).collect()}
    vals = sorted(v.value for v in ev.select("value").collect())
    n = len(vals)
    assert got["__all__"].n == n

    for q, attr in ((0.5, "p50"), (0.9, "p90"), (0.99, "p99")):
        est = getattr(got["__all__"], attr)
        # rank of the estimate in the exact sorted corpus (midpoint of
        # the tie run, so duplicates don't bias the normalized rank)
        lo = bisect.bisect_left(vals, est)
        hi = bisect.bisect_right(vals, est)
        rank = (lo + hi) / 2
        assert abs(rank / n - q) <= 0.025, (q, est, rank / n)
    # per-type sketch ns sum to the corpus n (mergeability invariant)
    assert sum(r.n for k, r in got.items() if k != "__all__") == n


def test_theta_set_algebra_accuracy_and_consistency(spark):
    from healthkit_to_sqlite_spark.operators.pipeline import (
        theta_set_algebra,
    )

    ev = load_table(spark, SF, "events")
    row = theta_set_algebra(ev).collect()[0]
    clickers = {r.user_id for r in
                ev.filter(F.col("event_type") == "click")
                .select("user_id").distinct().collect()}
    purchasers = {r.user_id for r in
                  ev.filter(F.col("event_type") == "purchase")
                  .select("user_id").distinct().collect()}

    def close(est, exact):
        return abs(est - exact) <= max(2, 0.05 * max(exact, 1))

    assert close(row.clickers, len(clickers))
    assert close(row.purchasers, len(purchasers))
    assert close(row.either, len(clickers | purchasers))
    assert close(row.both, len(clickers & purchasers))
    assert close(row.click_only, len(clickers - purchasers))
    # inclusion-exclusion should hold approximately on the estimates
    assert abs((row.clickers + row.purchasers - row.both) - row.either) \
        <= max(2, 0.05 * row.either)


def test_temporal_join_matches_interval_containment(spark):
    """The union+window rewrite must agree with a direct per-fact
    search over the SCD2 history (the BETWEEN semantics)."""
    from healthkit_to_sqlite_spark.operators.timeseries import (
        scd2_history,
        temporal_scd2_join,
    )

    ev = load_table(spark, SF, "events")
    got = {r.event_id: r.state_at for r in temporal_scd2_join(ev).collect()}
    hist: dict[int, list] = {}
    for r in scd2_history(
            ev.filter(F.col("event_type") != "purchase")).collect():
        hist.setdefault(r.user_id, []).append(r)
    facts = ev.filter(F.col("event_type") == "purchase") \
        .select("event_id", "user_id", "ts").collect()
    assert got and len(got) == len(facts)
    for f in facts:
        want = None
        for h in hist.get(f.user_id, []):
            if h.valid_from <= f.ts and (h.valid_to is None
                                         or h.valid_to > f.ts):
                want = h.state
        assert got[f.event_id] == want, f


def test_skyline_is_exact_pareto_frontier(spark):
    from healthkit_to_sqlite_spark.operators.relational import (
        skyline_parts,
    )

    part = load_table(spark, SF, "part")
    got = {(r.p_retailprice, r.p_size) for r in skyline_parts(part).collect()}
    pts = {(r.p_retailprice, r.p_size)
           for r in part.select("p_retailprice", "p_size").distinct().collect()}

    def dominated(a):
        return any(b[0] <= a[0] and b[1] >= a[1] and b != a for b in pts)

    want = {p for p in pts if not dominated(p)}
    assert got == want and got
    # no skyline point dominates another (mutual incomparability)
    for a in got:
        assert not any(b[0] <= a[0] and b[1] >= a[1] and b != a
                       for b in got)


def test_group_ols_matches_numpy_lstsq(spark):
    import numpy as np

    from healthkit_to_sqlite_spark.operators.timeseries import (
        group_ols_trend,
    )

    ev = load_table(spark, SF, "events")
    got = {r.event_type: r for r in group_ols_trend(ev).collect()}
    rows = ev.selectExpr(
        "event_type",
        "unix_micros(cast(ts as timestamp)) div 3600000000 as x",
        "value").collect()
    import collections
    pts = collections.defaultdict(list)
    for r in rows:
        pts[r.event_type].append((r.x, r.value))
    assert set(got) == set(pts)
    for t, p in pts.items():
        x = np.array([a for a, _ in p], dtype=float)
        y = np.array([b for _, b in p], dtype=float)
        A = np.vstack([x, np.ones_like(x)]).T
        slope, intercept = np.linalg.lstsq(A, y, rcond=None)[0]
        assert got[t].n == len(p)
        assert abs(got[t].slope - slope) < 1e-4, (t, got[t].slope, slope)
        assert abs(got[t].intercept - intercept) < 1e-2 * max(
            1.0, abs(intercept))


def test_autocorr_matches_numpy_and_is_bounded(spark):
    import numpy as np

    from healthkit_to_sqlite_spark.operators.timeseries import (
        autocorr_lag1,
    )

    ev = load_table(spark, SF, "events")
    got = {r.event_type: r for r in autocorr_lag1(ev).collect()}
    rows = sorted(ev.select("event_type", "user_id", "ts", "event_id",
                            "value").collect(),
                  key=lambda r: (r.user_id, r.ts, r.event_id))
    import collections
    seqs = collections.defaultdict(list)
    for r in rows:
        seqs[(r.event_type, r.user_id)].append(round(r.value, 2))
    pairs = collections.defaultdict(list)
    for (t, _), vs in seqs.items():
        pairs[t].extend(zip(vs, vs[1:]))
    for t, p in pairs.items():
        x = np.array([a for a, _ in p])
        y = np.array([b for _, b in p])
        want = np.corrcoef(x, y)[0, 1]
        assert got[t].n == len(p)
        assert abs(got[t].autocorr_lag1 - want) < 1e-6
        assert -1.0 <= got[t].autocorr_lag1 <= 1.0


def test_hll_sliding_matches_exact_distinct(spark):
    """Every merged 4-hour window estimate must sit within HLL error
    of the exact sliding distinct count computed the expensive way."""
    from healthkit_to_sqlite_spark.operators.timeseries import (  # noqa: F401
        tumbling_window,
    )
    from healthkit_to_sqlite_spark.operators.pipeline import (
        hll_sliding_distinct,
    )

    ev = load_table(spark, SF, "events")
    got = {(r.window_start, r.event_type): r.approx_users
           for r in hll_sliding_distinct(ev).collect()}
    assert got
    rows = ev.selectExpr(
        "cast(date_trunc('hour', ts) as timestamp_ntz) as hour",
        "event_type", "user_id").collect()
    import collections
    import datetime
    exact = collections.defaultdict(set)
    for r in rows:
        for k in range(4):
            exact[(r.hour - datetime.timedelta(hours=k),
                   r.event_type)].add(r.user_id)
    for key, est in got.items():
        want = len(exact[key])
        assert abs(est - want) <= max(2, 0.05 * want), (key, est, want)
    # sliding windows that contain at least one active hour all appear
    assert set(got) == set(exact)


def test_funnel_ordered_monotone_and_matches_direct(spark):
    """Stage reach must be monotone non-increasing, and must equal a
    direct per-user chained-min computation."""
    from healthkit_to_sqlite_spark.operators.timeseries import (
        funnel_ordered,
    )

    ev = load_table(spark, SF, "events")
    row = funnel_ordered(ev).collect()[0]
    assert row.n_signup >= row.n_click_after >= row.n_purchase_after
    import collections
    by_user = collections.defaultdict(list)
    for r in ev.select("user_id", "event_type", "ts").collect():
        by_user[r.user_id].append((r.ts, r.event_type))
    n_s = n_c = n_p = 0
    for _, evs in by_user.items():
        s = min((t for t, e in evs if e == "signup"), default=None)
        if s is None:
            continue
        n_s += 1
        c = min((t for t, e in evs if e == "click" and t > s),
                default=None)
        if c is None:
            continue
        n_c += 1
        if any(e == "purchase" and t > c for t, e in evs):
            n_p += 1
    assert (row.n_signup, row.n_click_after, row.n_purchase_after) == \
        (n_s, n_c, n_p)


def test_kcore_equals_python_peeling_and_invariants(spark):
    """The Spark peel must equal an exact pure-Python k-core on the
    same edge set, and every core member must keep >= k in-core
    neighbors (the defining invariant)."""
    from healthkit_to_sqlite_spark.operators.dedup import (
        minhash_lsh_pairs,
    )
    from healthkit_to_sqlite_spark.operators.pipeline import kcore

    docs = load_table(spark, SF, "documents")
    got = {r.doc_id: r.core_degree for r in kcore(docs, k=2).collect()}

    edges = {(min(r.doc_a, r.doc_b), max(r.doc_a, r.doc_b))
             for r in minhash_lsh_pairs(docs).collect()
             if r.doc_a != r.doc_b}
    import collections
    adj = collections.defaultdict(set)
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    changed = True
    while changed:
        changed = False
        for n in list(adj):
            if len(adj[n]) < 2:
                for m in adj.pop(n):
                    adj[m].discard(n)
                changed = True
    want = {n: len(vs) for n, vs in adj.items() if vs}
    assert got == want
    for n, d in got.items():
        assert d >= 2


def test_quarantine_routes_dirty_rows_by_first_rule(spark):
    """Planted violations must land under their FIRST violated rule
    (priority order), clean rows under 'ok', and counts must add up."""
    import datetime

    from healthkit_to_sqlite_spark.operators.pipeline import (
        quarantine_router,
    )

    t = datetime.datetime(2024, 6, 1)
    bad_ts = datetime.datetime(2035, 1, 1)
    rows = [
        (1, t, 10, "click", 5.0, "{}"),          # ok
        (2, t, None, "click", 5.0, "{}"),        # null_user
        (3, t, 11, "click", -1.0, "{}"),         # negative_value
        (4, t, 12, "weird", 5.0, "{}"),          # unknown_type
        (5, bad_ts, 13, "view", 5.0, "{}"),      # out_of_range_ts
        (6, t, None, "weird", -2.0, "{}"),       # null_user wins (priority)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, "
              "event_type string, value double, props string")
    got = {(r.reason, r.event_type): r.n_rows
           for r in quarantine_router(df).collect()}
    assert got[("ok", "click")] == 1
    assert got[("null_user", "click")] == 1
    assert got[("negative_value", "click")] == 1
    assert got[("unknown_type", "weird")] == 1
    assert got[("out_of_range_ts", "view")] == 1
    assert got[("null_user", "weird")] == 1
    assert sum(got.values()) == len(rows)


def test_media_dedup_counts_planted_duplicate_payloads(spark):
    """A planted byte-identical payload pair must collapse to one
    keeper with correct copy count and reclaimable bytes; the grouped
    hash must equal the landing-time checksum in media_meta."""
    from healthkit_to_sqlite_spark.operators.multimodal import (
        media_dedup,
        media_metadata,
    )

    rows = [(0, "same bytes here", "en", "s0", 15),
            (1, "same bytes here", "en", "s1", 15),
            (2, "unique payload bytes", "en", "s0", 20)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long")
    got = {r.payload_md5: r for r in media_dedup(df).collect()}
    assert len(got) == 2
    dup = [r for r in got.values() if r.n_copies == 2][0]
    assert dup.keep_id == 0
    assert dup.bytes_reclaimable == 15  # one redundant copy's bytes
    uniq = [r for r in got.values() if r.n_copies == 1][0]
    assert uniq.bytes_reclaimable == 0
    checksums = {r.checksum_md5 for r in media_metadata(df).collect()}
    assert set(got) <= checksums


def test_decode_real_roundtrips_png_when_pillow_present(spark):
    """The REAL codec path (r6 VERDICT item 7): gated behind the
    optional Pillow dependency — skipped in codec-free containers,
    exercised wherever PIL exists.  A generated 3×2 PNG must decode to
    its true dimensions and exact grayscale mean through the same
    mapInPandas plumbing the fake kernels use."""
    PIL = __import__("pytest").importorskip("PIL.Image")
    import io

    from healthkit_to_sqlite_spark.operators.multimodal import decode_real

    im = PIL.new("L", (3, 2))
    im.putdata([0, 50, 100, 150, 200, 250])
    buf = io.BytesIO()
    im.save(buf, format="PNG")
    media = spark.createDataFrame([(7, bytearray(buf.getvalue()))],
                                  "doc_id long, payload binary")
    rows = decode_real(media).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.width, r.height, r.mode) == (3, 2, "L")
    assert abs(r.mean_pixel - 125.0) < 1e-9


def test_decode_real_fails_loud_without_pillow(spark):
    """Without Pillow the boundary must raise NotImplementedError at
    plan-construction time — never a silent fake."""
    import pytest

    from healthkit_to_sqlite_spark.operators.multimodal import decode_real

    try:
        import PIL.Image  # noqa: F401
        pytest.skip("Pillow present; the loud-failure arm is moot")
    except ImportError:
        pass
    media = spark.createDataFrame([(1, bytearray(b"x"))],
                                  "doc_id long, payload binary")
    with pytest.raises(NotImplementedError):
        decode_real(media)


def test_cusum_finds_planted_level_shift(spark):
    """A clean step in the series must put the CUSUM argmax exactly at
    the last pre-shift point."""
    import datetime

    from healthkit_to_sqlite_spark.operators.timeseries import (
        cusum_changepoint,
    )

    t0 = datetime.datetime(2024, 1, 1)
    rows = [(i, t0 + datetime.timedelta(hours=i), 1, "click",
             10.0 if i < 40 else 50.0, "{}") for i in range(100)]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, "
              "event_type string, value double, props string")
    got = cusum_changepoint(df).collect()
    assert len(got) == 1
    r = got[0]
    # argmax of |n*S_t - t*S_n| for a step at index 40 is t=39 (0-based
    # event_id 39): the last point of the low regime
    assert r.changepoint_event_id == 39
    assert r.n == 100
    # scaled-back stat equals the classic cusum value at the argmax:
    # mean = (40*10 + 60*50)/100 = 34; S_40 - 40*mean = 400 - 1360
    assert r.cusum_stat == -960.0


def test_seasonal_profile_covers_grid_and_recomputes(spark):
    from healthkit_to_sqlite_spark.operators.timeseries import (
        seasonal_profile,
    )

    ev = load_table(spark, SF, "events")
    got = {(r.dow, r.hour): (r.n, r.mean_value)
           for r in seasonal_profile(ev).collect()}
    assert all(0 <= d <= 6 and 0 <= h <= 23 for d, h in got)
    assert sum(n for n, _ in got.values()) == ev.count()
    import collections
    direct = collections.defaultdict(list)
    for r in ev.select("ts", "value").collect():
        direct[((r.ts.weekday() + 1) % 7, r.ts.hour)].append(
            round(r.value, 2))
    for k, (n, mv) in got.items():
        assert n == len(direct[k])
        assert abs(mv - sum(direct[k]) / n) < 1e-6


def test_khop_reach_distances_are_shortest_paths(spark):
    """Recursive-CTE distances must equal BFS shortest paths (capped
    at the hop bound) from each seed over the same pair graph."""
    from healthkit_to_sqlite_spark.operators.dedup import (
        minhash_lsh_pairs,
    )
    from healthkit_to_sqlite_spark.operators.pipeline import (
        KHOP_MAX,
        KHOP_SEED_MOD,
        khop_reachability,
    )

    docs = load_table(spark, SF, "documents")
    got = {(r.seed, r.node): r.dist
           for r in khop_reachability(spark, docs).collect()}
    import collections
    adj = collections.defaultdict(set)
    for r in minhash_lsh_pairs(docs).collect():
        adj[r.doc_a].add(r.doc_b)
        adj[r.doc_b].add(r.doc_a)
    seeds = [r.doc_id for r in docs.collect()
             if r.doc_id % KHOP_SEED_MOD == 0]
    want = {}
    for s in seeds:
        dist = {s: 0}
        frontier = [s]
        for d in range(1, KHOP_MAX + 1):
            nxt = []
            for n in frontier:
                for m in adj[n]:
                    if m not in dist:
                        dist[m] = d
                        nxt.append(m)
            frontier = nxt
        for n, d in dist.items():
            want[(s, n)] = d
    assert got == want and all((s, s) in got for s in seeds)


def test_span_scrub_short_docs_yield_zero_segments(spark):
    """Docs shorter than k tokens must never scrub (the sequence(1,0)
    counts-down footgun — review finding: two short docs previously
    fabricated phantom matching segments and negative budgets)."""
    from healthkit_to_sqlite_spark.operators.dedup import span_scrub

    rows = [(0, "hello world"), (1, "hello world"),
            (2, "a b c d e f g h i")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in span_scrub(df).collect()}
    assert got[0].n_scrubbed_segments == 0
    assert got[0].n_tokens_kept == 2
    assert got[1].n_tokens_kept == 2
    assert got[2].n_scrubbed_segments == 0  # unique 8-token segment


def test_abtest_matches_numpy_welch_and_is_stable(spark):
    import hashlib
    import math

    from healthkit_to_sqlite_spark.operators.timeseries import (
        AB_SEED,
        abtest_readout,
    )

    ev = load_table(spark, SF, "events")
    got = {r.event_type: r for r in abtest_readout(ev).collect()}

    def arm_a(uid):
        h = int(hashlib.md5(f"{AB_SEED}:{uid}".encode())
                .hexdigest()[:8], 16)
        return h % 2 == 0

    import collections
    arms = collections.defaultdict(lambda: ([], []))
    for r in ev.select("event_type", "user_id", "value").collect():
        arms[r.event_type][0 if arm_a(r.user_id) else 1].append(
            round(r.value, 2))
    assert set(got) == set(arms)
    for t, (a, b) in arms.items():
        ma, mb = sum(a) / len(a), sum(b) / len(b)
        va = sum((x - ma) ** 2 for x in a) / (len(a) - 1)
        vb = sum((x - mb) ** 2 for x in b) / (len(b) - 1)
        z = (ma - mb) / math.sqrt(va / len(a) + vb / len(b))
        r = got[t]
        assert (r.n_a, r.n_b) == (len(a), len(b))
        assert abs(r.mean_a - ma) < 1e-6 and abs(r.lift - (ma - mb)) < 1e-6
        assert abs(r.z_stat - z) < 1e-5
    # assignment is repartition-stable (deterministic hash, no RNG)
    again = {r.event_type: (r.n_a, r.n_b)
             for r in abtest_readout(ev.repartition(7)).collect()}
    assert again == {t: (r.n_a, r.n_b) for t, r in got.items()}


def test_exact_arithmetic_ops_survive_adversarial_series(spark):
    """Hypothesis drives adversarial event series (constant runs,
    negatives, duplicates at one timestamp, singletons) through the
    exact-arithmetic operators; every run must satisfy the operators'
    algebraic invariants.  One Spark round-trip per example is slow,
    so examples are capped and the series kept small."""
    import datetime

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from healthkit_to_sqlite_spark.operators.timeseries import (
        cusum_changepoint,
        ewma_halflife,
    )

    t0 = datetime.datetime(2024, 1, 1)
    series = st.lists(
        st.tuples(st.integers(0, 30),              # hour offset (dups ok)
                  st.floats(-100, 100, allow_nan=False,
                            allow_infinity=False)),
        min_size=1, max_size=12)

    @settings(max_examples=10, deadline=None,
              suppress_health_check=[HealthCheck.too_slow])
    @given(series)
    def check(rows):
        data = [(i, t0 + datetime.timedelta(hours=h), 1, "click",
                 round(v, 2), "{}") for i, (h, v) in enumerate(rows)]
        df = spark.createDataFrame(
            data, "event_id long, ts timestamp_ntz, user_id long, "
                  "event_type string, value double, props string")
        # EWMA: convex combination of the trailing window, first==self
        out = sorted(ewma_halflife(df).collect(),
                     key=lambda r: (r.ts, r.event_id))
        vals = [r.value for r in out]
        assert out[0].ewma == round(out[0].value, 6)
        for i, r in enumerate(out):
            tail = vals[max(0, i - 7):i + 1]
            assert min(tail) - 1e-6 <= r.ewma <= max(tail) + 1e-6
        # CUSUM: exactly one changepoint row; |stat| maximal among all
        # prefixes (recomputed directly in integer cents)
        cp = cusum_changepoint(df).collect()
        assert len(cp) == 1 and cp[0].n == len(rows)
        cents = [int(round(r.value * 100)) for r in out]
        n, tot = len(cents), sum(cents)
        stats = [n * sum(cents[:t + 1]) - (t + 1) * tot
                 for t in range(n)]
        best = max(abs(s) for s in stats)
        got_stat = cp[0].cusum_stat * n * 100
        assert abs(abs(got_stat) - best) < 1e-3

    check()


def test_approx_distinct_error_bound(spark):
    """q_approx_distinct (rows-only contract) quantitative pin
    (VERDICT r4 item 7): HyperLogLog++ estimates must sit within 7%
    of the exact per-group distinct counts (default rsd = 5%; the
    hash is deterministic, so the measured max error — 4.7% at
    sf0.001 — is stable and the bound is tight, not decorative)."""
    from healthkit_to_sqlite_spark.operators.relational import (
        approx_distinct,
    )

    orders = load_table(spark, SF, "orders")
    li = load_table(spark, SF, "lineitem")
    got = {r.o_orderpriority: r for r in
           approx_distinct(orders, li).collect()}
    exact = {r.o_orderpriority: r for r in
             (li.join(orders, li.l_orderkey == orders.o_orderkey)
              .groupBy("o_orderpriority")
              .agg(F.countDistinct("l_partkey").alias("parts"),
                   F.countDistinct("o_custkey").alias("custs"))
              .collect())}
    assert set(got) == set(exact) and got
    for k, r in got.items():
        assert abs(r.approx_parts - exact[k].parts) \
            <= max(2, 0.07 * exact[k].parts), (k, r)
        assert abs(r.approx_custs - exact[k].custs) \
            <= max(2, 0.07 * exact[k].custs), (k, r)


def test_simhash_near_pairs_exact_at_pigeonhole_radius(spark):
    """4 disjoint 15-bit bands find EVERY pair with Hamming ≤ 3 (a
    pair differing in d ≤ bands−1 bits touches ≤ d bands, so one band
    must match) — so at the default radius the banded join must equal
    the brute-force pair set exactly, with correct distances."""
    from healthkit_to_sqlite_spark.operators.dedup import (
        SIMHASH_MAX_HAMMING,
        simhash,
        simhash_near_pairs,
    )

    docs = load_table(spark, SF, "documents")
    sigs = {r.doc_id: r.simhash for r in simhash(docs).collect()}
    ids = sorted(sigs)
    brute = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            d = bin(sigs[a] ^ sigs[b]).count("1")
            if d <= SIMHASH_MAX_HAMMING:
                brute[(a, b)] = d
    got = {(r.doc_a, r.doc_b): r.hamming
           for r in simhash_near_pairs(docs).collect()}
    assert got == brute
    assert got, "fixture must contain at least one near pair"


def test_token_budget_mix_respects_budget_and_keeps_small_sources(spark):
    """Each source's kept tokens must fit the corpus-share budget (the
    cutoff is the last bucket that FITS, so adherence is exact, not
    just within a bucket), kept counts are sane, and a source already
    under budget keeps every doc and every token."""
    from healthkit_to_sqlite_spark.operators.pipeline import (
        token_budget_mix,
    )

    docs = load_table(spark, SF, "documents")
    rows = token_budget_mix(docs).collect()
    assert rows
    budget = rows[0].budget
    trimmed = 0
    for r in rows:
        assert r.budget == budget          # one corpus-wide budget
        assert 0 <= r.n_kept <= r.n_docs
        assert r.tokens_kept <= budget, r
        if r.tokens <= budget:             # under-budget: keep all
            assert r.n_kept == r.n_docs and r.tokens_kept == r.tokens, r
        else:
            trimmed += 1
    assert trimmed > 0, "fixture must exercise the trimming path"


def test_paragraph_dedup_bucket_cap_and_backrefs(spark):
    """VERDICT r5 item 7 — paragraph-granularity near-dedup: (1) two
    docs sharing a 16-word paragraph pair at paragraph granularity
    with correct (doc, para) back-references; (2) a band bucket
    saturated past MAX_PARA_BUCKET is dropped entirely (hot-bucket
    discipline), while the distinctive pair survives."""
    from healthkit_to_sqlite_spark.operators.dedup import (
        MAX_PARA_BUCKET,
        dedup_paragraph_pairs,
    )

    shared = " ".join(f"w{i}" for i in range(16))          # para 0 of 1, 2
    boiler = "the same sixteen boilerplate words repeat here again and " \
             "again to fill one paragraph slot"
    rows = [(1, shared + " unique tail one two three four five six seven "
                "eight nine ten eleven twelve thirteen fourteen fifteen"),
            (2, shared + " other ending alpha beta gamma delta epsilon "
                "zeta eta theta iota kappa lam mu nu xi")]
    # MAX_PARA_BUCKET+1 single-paragraph docs with IDENTICAL text: all
    # land in one band bucket per band → bucket size > cap → dropped
    rows += [(100 + i, boiler) for i in range(MAX_PARA_BUCKET + 1)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = dedup_paragraph_pairs(docs).collect()
    keys = {(r.doc_a, r.para_a, r.doc_b, r.para_b) for r in pairs}
    assert (1, 0, 2, 0) in keys                 # shared paragraph found
    assert all(r.doc_a < 100 for r in pairs)    # saturated bucket gone


def test_pipeline_e2e_stage_conservation(spark):
    """The composed pipeline's invariants: stage counts monotonically
    non-increasing through the filters, token conservation through
    packing (stage 4 tokens == stage 5 tokens), and sequence count =
    sum over langs of ceil(tokens/budget)."""
    from healthkit_to_sqlite_spark.operators.pipeline import (
        pipeline_e2e_query,
    )

    rows = {r.stage: r for r in
            pipeline_e2e_query(spark, "/root/testdata/sf0.001").collect()}
    assert set(rows) == {"0_ingest", "1_quality", "2_dedup",
                         "3_decontam", "4_mixture", "5_packed"}
    order = ["0_ingest", "1_quality", "2_dedup", "3_decontam", "4_mixture"]
    for earlier, later in zip(order, order[1:]):
        assert rows[later].n_docs <= rows[earlier].n_docs
        assert rows[later].n_tokens <= rows[earlier].n_tokens
    assert rows["5_packed"].n_tokens == rows["4_mixture"].n_tokens
    assert 0 < rows["5_packed"].n_docs <= rows["4_mixture"].n_docs


def test_pipeline_e2e_every_stage_fires_on_synthetic_corpus(spark):
    """Composition pin on a corpus engineered so EVERY stage drops
    something (the fixture table has no normalized duplicates, so the
    dedup stage is a no-op there): quality drops the short doc, dedup
    drops the punctuation-variant twin, decontamination drops the
    bench doc (id%50==0) and its n-gram-sharing neighbor, the widened
    60% budget keeps both surviving sources, and packing conserves
    mixture tokens."""
    from healthkit_to_sqlite_spark.operators.pipeline import pipeline_e2e

    good = ("the quick brown fox jumps over the lazy dog and then "
            "the other fox naps with a cat nearby for a while longer")
    twin = good.replace("fox jumps", "fox, jumps").replace(
        "cat nearby", "cat; nearby")       # same canon, passes quality
    rows = [
        (1, good, "en", "srcA"),
        (2, twin, "en", "srcA"),                    # normalized twin of 1
        (3, "too short", "en", "srcA"),             # fails quality
        (50, "the secret benchmark question about foxes appears here "
             "with twenty one distinct carefully chosen common words "
             "in a row again", "en", "srcB"),       # bench member
        (4, "the secret benchmark question about foxes appears here "
            "inside training data with more ordinary words after it "
            "and padding words", "en", "srcB"),     # contaminated by 50
        (5, "a completely separate clean document with many plain "
            "common words that the stopword rule accepts and nothing "
            "shared with that held out suite", "en", "srcB"),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string")
    got = {r.stage: r for r in pipeline_e2e(docs, num=60, den=100).collect()}
    assert got["0_ingest"].n_docs == 6
    assert got["1_quality"].n_docs == 5            # doc 3 out
    assert got["2_dedup"].n_docs == 4              # doc 2 out (twin)
    assert got["3_decontam"].n_docs == 2           # bench 50 + doc 4 out
    assert got["4_mixture"].n_docs == 2            # both sources fit 60%
    assert got["5_packed"].n_tokens == got["4_mixture"].n_tokens
    assert got["5_packed"].n_docs == 1             # one 256-token seq


def test_paragraphs_reconstruct_original_text_exactly(spark):
    """The apply stage's correctness rests on paragraphs() being a
    lossless partition of the word sequence: joining a doc's
    paragraphs in order with single spaces must reproduce the
    original text byte-for-byte, across the boundary cases (empty
    string, one word, exactly one paragraph, one-past boundary,
    multi-paragraph, unicode)."""
    from healthkit_to_sqlite_spark.operators.dedup import (
        PARA_WORDS,
        paragraphs,
    )

    texts = ["",
             "solo",
             " ".join(f"w{i}" for i in range(PARA_WORDS)),
             " ".join(f"w{i}" for i in range(PARA_WORDS + 1)),
             " ".join(f"w{i}" for i in range(3 * PARA_WORDS + 7)),
             "naïve café über " + " ".join(["word"] * 20)]
    docs = spark.createDataFrame(list(enumerate(texts)),
                                 "doc_id long, text string")
    out = {}
    for r in paragraphs(docs).collect():
        out.setdefault(r.doc_id, []).append((r.para_idx, r.text))
    for i, t in enumerate(texts):
        parts = [p for _, p in sorted(out[i])]
        assert " ".join(parts) == t, (i, parts)


def test_dedup_signature_append_time_travels_and_matches_one_shot(spark):
    """Append-maintenance invariants for the dedup signature index
    (r7): (1) version 1 = day-1 sources only (time travel); (2) the
    appended head's day-1 rows are byte-identical to v1 (fixed hash
    family = frozen "quantizer": signing day 2 never re-signs or
    perturbs day 1); (3) head = one-shot signing of the full corpus;
    (4) serving against the appended head equals in-query incremental
    dedup row-for-row."""
    from pyspark.sql import functions as F

    from healthkit_to_sqlite_spark.catalog import load_table
    from healthkit_to_sqlite_spark.operators.dedup import (
        SIG_APPEND_FIRST,
        _band_signatures,
        build_signature_index_appended,
        incremental_dedup,
        incremental_dedup_from_appended_index,
    )

    sf = "/root/testdata/sf0.001"
    cat = build_signature_index_appended(spark, sf)
    assert cat.current_version() == 2
    docs = load_table(spark, sf, "documents")
    src_num = F.regexp_extract("source", r"src(\d+)", 1).try_cast("int")
    day1_ids = {r.doc_id for r in docs.filter(
        F.coalesce(src_num < SIG_APPEND_FIRST, F.lit(False)))
        .select("doc_id").collect()}

    # (1) time travel: v1 holds exactly the day-1 docs' signatures
    v1 = cat.read(spark, "signatures", version=1)
    assert {r.doc_id for r in v1.select("doc_id").distinct().collect()} \
        == day1_ids

    # (2) day-1 rows carried over byte-identical
    head = cat.read(spark, "signatures")
    assert sorted(map(tuple, v1.collect())) == \
        sorted(map(tuple,
                   head.filter(F.col("doc_id").isin(day1_ids)).collect()))

    # (3) head == one-shot signing of the full src<10 corpus
    corpus = docs.filter(F.coalesce(src_num < 10, F.lit(False)))
    assert sorted(map(tuple, head.collect())) == \
        sorted(map(tuple, _band_signatures(corpus).collect()))

    # (4) serve equality vs in-query incremental dedup
    got = sorted(map(tuple,
                     incremental_dedup_from_appended_index(spark, sf)
                     .collect()))
    want = sorted(map(tuple, incremental_dedup(docs).collect()))
    assert got == want


def test_dedup_keep_best_prefers_longest_not_min_id(spark):
    """Quality-aware keeper selection (r7): in a near-dup cluster the
    LONGEST member must win even when it is not the component-minimum
    doc_id (the exact case where this differs from dedup_apply);
    singletons keep themselves."""
    from healthkit_to_sqlite_spark.operators.pipeline import (
        dedup_apply,
        dedup_keep_best,
    )

    # identical texts ⇒ guaranteed LSH collision in every band;
    # n_chars is an independent column in the corpus schema, so the
    # higher-id doc can be the longer one
    t = " ".join(f"tok{i}" for i in range(30))
    rows = [(0, t, "en", "s0", 10),
            (1, t, "en", "s0", 99),
            (2, "completely different singleton text here", "en",
             "s1", 40)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long")
    got = {r.doc_id: r for r in dedup_keep_best(df).collect()}
    assert got[0].cluster_id == 0 and got[1].cluster_id == 0
    assert not got[0].is_keeper and got[1].is_keeper  # longest wins
    assert got[2].is_keeper and got[2].cluster_id == 2
    # contrast pin: min-id apply keeps doc 0 instead
    kept_minid = {r.doc_id for r in dedup_apply(df).collect()}
    assert kept_minid == {0, 2}


def test_quality_quantile_thresholds_are_per_source(spark):
    """Per-source adaptive thresholding (r7): each source's nearest-
    rank p75 cutoff is computed within the source — a uniformly
    high-quality source still trims its bottom ranks while a noisy
    source's locally-good docs survive a globally-fatal score."""
    from healthkit_to_sqlite_spark.operators.pipeline import (
        quality_quantile_filter,
    )

    def doc(i, src, n_alpha, n_chars):
        return (i, "a" * n_alpha, "en", src, n_chars)

    rows = [doc(0, "A", 2, 10), doc(1, "A", 4, 10),
            doc(2, "A", 6, 10), doc(3, "A", 8, 10),
            doc(4, "B", 90, 100), doc(5, "B", 91, 100),
            doc(6, "B", 95, 100), doc(7, "B", 100, 100)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long")
    got = {r.source: r for r in quality_quantile_filter(df).collect()}
    # rank ceil(0.75*4)=3 ascending: A → 0.6, B → 0.95
    assert got["A"].threshold == 0.6 and got["A"].n_kept == 2
    assert got["B"].threshold == 0.95 and got["B"].n_kept == 2
    # the adaptivity pin: B's dropped docs (0.90/0.91) score far above
    # A's kept ones (0.6/0.8)
    assert got["A"].n_docs == 4 and got["B"].n_docs == 4


def test_cms_never_underestimates_and_small_w_overestimates(spark):
    """Count-Min invariants: (1) at the contract (d=4, w=256) every
    probe estimate ≥ its exact count AND — measured on this corpus,
    where d·w comfortably exceeds the vocabulary's collision
    pressure — equals it exactly; (2) at a deliberately tiny w=4 the
    sketch MUST overestimate somewhere (collisions are forced: the
    vocabulary is far larger than 4 counters/row) yet still never
    underestimates.  Together they pin both CMS guarantees: one-sided
    error always, ε-accuracy at the contract parameters."""
    from healthkit_to_sqlite_spark.operators.pipeline import cms_token_counts

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    out = cms_token_counts(docs).collect()
    assert len(out) == 20
    assert all(r.cms_n >= r.exact_n and r.over == r.cms_n - r.exact_n
               for r in out)
    assert all(r.over == 0 for r in out)  # measured at (4, 256)

    tiny = cms_token_counts(docs, w=4).collect()
    assert all(r.cms_n >= r.exact_n for r in tiny)
    assert any(r.over > 0 for r in tiny)


def test_lpa_splits_barbell_where_cc_merges(spark):
    """The LPA-vs-CC differentiator on the canonical hand graph: two
    triangles {1,2,3} and {4,5,6} joined by ONE bridge edge 3-4.
    Connected components merge everything into one cluster; label
    propagation (self-vote, min tie-break, 4 synchronous rounds)
    keeps the two dense triangles as separate communities — traced by
    hand: after round 1 labels are (1,1,1,3,4,4), round 2 the bridge
    vote loses to the triangle majority on both sides, stable from
    round 3 as {1,2,3}→1, {4,5,6}→4."""
    from healthkit_to_sqlite_spark.operators.pipeline import _lpa_propagate

    pairs = [(1, 2), (1, 3), (2, 3), (4, 5), (4, 6), (5, 6), (3, 4)]
    edges = spark.createDataFrame(
        pairs + [(b, a) for a, b in pairs], "src long, dst long")
    got = {r.doc_id: r.community
           for r in _lpa_propagate(edges, rounds=4).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 4, 5: 4, 6: 4}


def test_lpa_communities_refine_cc_components(spark):
    """Labels only travel along edges, so an LPA community can never
    straddle two connected components: on the real corpus every LPA
    community must be a (possibly strict) refinement of the CC
    clustering, over exactly the same node set."""
    from healthkit_to_sqlite_spark.catalog import load_table
    from healthkit_to_sqlite_spark.operators.pipeline import (
        communities_lpa,
        dedup_clusters,
    )

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    lpa = {r.doc_id: r.community for r in communities_lpa(docs).collect()}
    cc = {r.doc_id: r.cluster_id for r in dedup_clusters(docs).collect()}
    # LPA covers edge-touching nodes only; CC also emits singletons
    assert set(lpa) <= set(cc) and lpa
    # same LPA community => same CC component
    by_comm = {}
    for d, c in lpa.items():
        by_comm.setdefault(c, set()).add(cc[d])
    assert all(len(v) == 1 for v in by_comm.values())


def test_skew_adaptive_join_decision_and_partition(spark):
    """Adaptive-salting pins (r8, the skew actuator): (1) the
    committed hot-key set equals the exact-integer recompute from the
    per-key counts artifact; (2) the threshold actually bites on this
    corpus (some keys hot, most cold); (3) the hot and cold branches
    PARTITION the plain-join output exactly — together they equal it
    row-for-row (the oracle pins this too, but here per-branch); (4)
    every hot key's fact rows spread across >1 salt value (the whole
    point of the salted path)."""
    from pyspark.sql import functions as F

    from healthkit_to_sqlite_spark.catalog import load_table
    from healthkit_to_sqlite_spark.operators.pipeline import (
        SKEW_HOT_PCT,
        build_skew_stats,
        skew_adaptive_join,
    )

    sf = "/root/testdata/sf0.001"
    cat = build_skew_stats(spark, sf)
    counts = {r.user_id: r.cnt for r in
              cat.read(spark, "keystats").collect()}
    n_rows, n_keys = sum(counts.values()), len(counts)
    expect_hot = {u for u, c in counts.items()
                  if c * n_keys * 100 > SKEW_HOT_PCT * n_rows}
    got_hot = {r.user_id for r in cat.read(spark, "hotkeys").collect()}
    assert got_hot == expect_hot
    assert 0 < len(got_hot) < n_keys          # bites, but not blanket

    events = load_table(spark, sf, "events")
    dim = (events.groupBy("user_id")
           .agg(F.count(F.lit(1)).alias("n_events_user")))
    plain = sorted(map(tuple, events.join(dim, "user_id")
                       .select("event_id", "user_id", "event_type",
                               "n_events_user").collect()))
    got = sorted(map(tuple, skew_adaptive_join(spark, sf).collect()))
    assert got == plain
    # branch partition: hot keys' rows all present, as are cold's
    hot_rows = [t for t in got if t[1] in got_hot]
    assert len(hot_rows) == sum(counts[u] for u in got_hot)

    # the salted path spreads each hot key across >1 reducer key
    n_salt = 8
    spread = (events.filter(F.col("user_id").isin(list(got_hot)))
              .select("user_id",
                      F.pmod(F.coalesce(F.col("event_id"), F.lit(0)),
                             F.lit(n_salt)).alias("s"))
              .groupBy("user_id")
              .agg(F.countDistinct("s").alias("ns")).collect())
    assert all(r.ns > 1 for r in spread)


def test_decontaminate_fuzzy_catches_one_token_rewrite(spark):
    """A training doc sharing a 6-gram with the bench set EXCEPT one
    substituted token is invisible to the exact audit and flagged by
    the fuzzy one; a 2-token rewrite stays invisible to both (Hamming
    > 1); exact contamination is a subset of fuzzy."""
    from healthkit_to_sqlite_spark.operators.pipeline import (
        BENCH_MOD, decontaminate, decontaminate_fuzzy)

    bench_text = "alpha beta gamma delta epsilon zeta"
    rows = [
        (BENCH_MOD, bench_text),                            # eval doc
        (1, "alpha beta gamma delta epsilon zeta tail"),    # exact copy
        (2, "alpha beta gamma REWRITE epsilon zeta"),       # 1-token swap
        (3, "alpha beta OTHER delta epsilon WORDS"),        # 2-token swap
        (4, "completely unrelated text with no overlap at all here"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    exact = {r.doc_id for r in decontaminate(docs, n=6).collect()}
    fuzzy = {r.doc_id: r.n_fuzzy
             for r in decontaminate_fuzzy(docs, n=6).collect()}
    assert 1 in exact and 2 not in exact and 3 not in exact
    assert 1 in fuzzy and 2 in fuzzy
    assert 3 not in fuzzy and 4 not in fuzzy
    assert exact <= set(fuzzy)


def test_decontaminate_fuzzy_ignores_short_docs(spark):
    """ADVICE r11: word_shingles emits one TRUNCATED shingle for a
    doc with < n tokens; its trailing-sentinel variants collided with
    any benchmark 6-gram sharing the first m tokens — a match outside
    the token-Hamming ≤ 1-between-6-grams contract.  Grams are now
    filtered to exactly n tokens: the 3-token doc sharing the bench
    gram's prefix must NOT be flagged, and a short BENCH doc must not
    flag full-length training grams either."""
    from healthkit_to_sqlite_spark.operators.pipeline import (
        BENCH_MOD, decontaminate_fuzzy)

    rows = [
        (BENCH_MOD, "alpha beta gamma delta epsilon zeta"),   # eval doc
        (BENCH_MOD * 2, "alpha beta gamma"),                  # short eval
        (1, "alpha beta gamma"),                # 3-token prefix, no 6-gram
        (2, "alpha beta gamma delta epsilon"),  # 5 tokens — still short
        (3, "alpha beta gamma delta epsilon zeta eta"),       # real match
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    fuzzy = {r.doc_id for r in decontaminate_fuzzy(docs, n=6).collect()}
    assert fuzzy == {3}


def test_skipgram_equality_is_hamming_leq_one():
    """The join's correctness claim, as a pure property: two n-grams
    share a same-position skip-gram variant iff token-Hamming ≤ 1
    (hypothesis over small random token tuples)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    tok = st.sampled_from(["a", "b", "c"])

    @settings(max_examples=300, deadline=None)
    @given(st.tuples(tok, tok, tok, tok), st.tuples(tok, tok, tok, tok))
    def check(g1, g2):
        def variants(g):
            return {(i, g[:i] + ("\x01",) + g[i + 1:])
                    for i in range(len(g))}
        share = bool(variants(g1) & variants(g2))
        hamming = sum(a != b for a, b in zip(g1, g2))
        assert share == (hamming <= 1)

    check()
