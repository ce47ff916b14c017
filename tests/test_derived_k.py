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
