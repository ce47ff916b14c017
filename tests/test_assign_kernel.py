"""The Arrow-vectorized assignment kernel (``HK_ASSIGN_KERNEL=np``)
must be a BIT-IDENTICAL twin of the broadcast-join kernel.

Why the twin exists: the join kernel evaluates ``_l2sq`` through
``zip_with``/``aggregate`` — Catalyst higher-order functions are
CodegenFallback (interpreted per element) — over n·K exploded
candidate rows, and with corpus-derived K (∝ n) that term is the one
superlinear cpu_sec in the tracked sf1 set (q_proto_prune 51× CPU for
10× data, SCALE.md round 14).  The numpy kernel does the same fold
fused; these tests pin that "same" means same bits, not same-ish:

- raw distances: float64 accumulation in dimension order reproduces
  the JVM fold's IEEE operation sequence exactly;
- the argmin contract: HALF_UP-rounded-9dp distance, ties → lowest
  cid, via exact ``Decimal(repr(d))`` rounding on the few candidates
  within 2e-9 of the unrounded minimum (rounding is monotone, so no
  other centroid can win).

The suite always exercises BOTH kernels regardless of the session
default, so a drift in either direction fails loudly.
"""

from __future__ import annotations

import os

import pytest

from healthkit_to_sqlite_spark.catalog import load_table
from healthkit_to_sqlite_spark.operators.similarity import (
    _assign_cells,
    _assign_cells_np,
    kmeans_centroids,
    proto_prune,
)
from healthkit_to_sqlite_spark.plans import formatted_plan

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF, "embeddings")


@pytest.fixture(scope="module")
def cent(emb):
    return kmeans_centroids(emb).localCheckpoint(eager=True)


def test_np_kernel_bit_identical_with_dist(emb, cent):
    # cell AND the 9dp-rounded distance (the prototypicality score
    # consumers keep) must match the join kernel bit for bit
    a = sorted((r.vec_id, r.cell, r.dist)
               for r in _assign_cells(emb, cent, keep_dist=True).collect())
    b = sorted((r.vec_id, r.cell, r.dist)
               for r in _assign_cells_np(emb, cent, keep_dist=True).collect())
    assert a == b
    assert len(a) == emb.count()


def test_np_kernel_bit_identical_without_dist(emb, cent):
    a = sorted((r.vec_id, r.cell)
               for r in _assign_cells(emb, cent).collect())
    b = sorted((r.vec_id, r.cell)
               for r in _assign_cells_np(emb, cent).collect())
    assert a == b


def test_np_plan_has_no_join_and_no_exchange(emb, cent):
    # the kernel's reason to exist: no n·K candidate rows (no
    # BroadcastNestedLoopJoin) and no exchange at all — the join
    # kernel's map-side-combined shuffle of n rows is gone too
    plan = formatted_plan(_assign_cells_np(emb, cent, keep_dist=True))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "Exchange" not in plan
    assert "ArrowEvalPython" in plan or "MapInPandas" in plan


def test_env_switch_routes_and_default_is_np(emb, cent, monkeypatch):
    # r14 flip: default (unset) rides the Arrow-vectorized kernel;
    # HK_ASSIGN_KERNEL=join keeps the broadcast-join kernel selectable
    # so every quantizer family A/Bs through one switch
    monkeypatch.delenv("HK_ASSIGN_KERNEL", raising=False)
    assert "MapInPandas" in formatted_plan(_assign_cells(emb, cent))
    monkeypatch.setenv("HK_ASSIGN_KERNEL", "join")
    assert "MapInPandas" not in formatted_plan(_assign_cells(emb, cent))


def test_sub_assignment_np_bit_identical(spark, emb, monkeypatch):
    # r14: the per-(vector, subspace) PQ assignment rides the same
    # switch — both kernels must agree bit-for-bit on every code
    from pyspark.sql import functions as F

    from healthkit_to_sqlite_spark.operators.similarity import (
        PQ_SUB_DIM,
        _assign_sub,
        _assign_sub_np,
        _pq_subspaces,
        pq_codes,
    )

    staged = (emb.select("vec_id",
                         F.explode(_pq_subspaces()).alias("s"))
              .select("vec_id", "s.j", "s.sub"))
    cent = (staged.filter(F.col("vec_id") < 8)
            .select("j", F.col("vec_id").cast("int").alias("cid"),
                    F.transform("sub", lambda x: x.cast("double"))
                    .alias("cemb")).localCheckpoint(eager=True))
    monkeypatch.setenv("HK_ASSIGN_KERNEL", "join")
    a = sorted(map(tuple, _assign_sub(staged, cent).collect()))
    b = sorted(map(tuple, _assign_sub_np(staged, cent).collect()))
    assert a == b
    assert len(a) == staged.count()
    # end-to-end: the full fused-Lloyd PQ codes agree across kernels
    monkeypatch.setenv("HK_ASSIGN_KERNEL", "join")
    ca = sorted(map(tuple, pq_codes(emb)[0].collect()))
    monkeypatch.delenv("HK_ASSIGN_KERNEL", raising=False)
    cb = sorted(map(tuple, pq_codes(emb)[0].collect()))
    assert ca == cb


def test_proto_prune_identical_under_join_kernel(spark, emb, monkeypatch):
    # an end-to-end keep_dist consumer: the kept/pruned verdict and
    # the prototypicality ordering ride the kernel unchanged
    monkeypatch.delenv("HK_ASSIGN_KERNEL", raising=False)
    a = sorted(map(tuple, proto_prune(emb).collect()))
    monkeypatch.setenv("HK_ASSIGN_KERNEL", "join")
    b = sorted(map(tuple, proto_prune(emb).collect()))
    assert a == b
