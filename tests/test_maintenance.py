"""The nightly maintenance window, end-to-end (VERDICT r8 items 5+7).

DEPLOY.md's monitor→actuator table names four loops (occupancy→IVF
rebalance, F1→classifier retrain, fertility→vocab extension,
skew→differential salting).  test_text/test_similarity/test_plans pin
each loop in isolation; these drills pin the SEQUENCE a production
pipeline actually runs against one catalog generation:

* every serve path reads the post-maintenance heads;
* every version-1 artifact stays time-travelable byte-identically
  (file-list identity — the files are immutable by construction);
* a kill between any two publishes of the multi-catalog sequence
  leaves every catalog at a consistent head, and the rerun resumes
  idempotently (extends the single-catalog crash drills in
  test_manifest to the sequence grain);
* retention: `expire_versions` + `vacuum` frees exactly the files
  only expired manifests referenced, while append carry-forward and
  replace-pass re-references keep shared files alive — the
  merge-on-read reference-safety the min-age guard alone can't prove.
"""

from __future__ import annotations

import json
import os

import pytest

SF = "/root/testdata/sf0.001"


def _manifest_bytes(cat) -> dict[int, bytes]:
    out = {}
    for v in range(1, cat.current_version() + 1):
        path = cat._manifest_path(v)
        if os.path.exists(path):
            with open(path, "rb") as fh:
                out[v] = fh.read()
    return out


def _files(cat, version: int) -> set[str]:
    return {f for t in cat._load(version)["tables"].values()
            for f in t["files"]}


def test_nightly_maintenance_window_e2e(spark):
    """All four actuator loops over ONE corpus snapshot, then the
    cross-loop pins no single-loop test can make."""
    from pyspark.sql import functions as F

    from healthkit_to_sqlite_spark.catalog import load_table
    from healthkit_to_sqlite_spark.operators.pipeline import (
        build_skew_stats, skew_adaptive_join)
    from healthkit_to_sqlite_spark.operators.similarity import (
        _rebal_artifacts, ann_batch_query_from_rebalanced_index,
        build_ann_index, rebalance_ann_index)
    from healthkit_to_sqlite_spark.operators.text import (
        build_bpe_model, build_quality_classifier, extend_bpe_model,
        read_qc_weights, read_qc_weights_at, retrain_quality_classifier)

    # ---- the maintenance window: four actuators, one snapshot ------
    cat_r = rebalance_ann_index(spark, SF)
    cat_q = retrain_quality_classifier(spark, SF)
    cat_b = extend_bpe_model(spark, SF)
    cat_s = build_skew_stats(spark, SF)
    assert (cat_r.current_version(), cat_q.current_version(),
            cat_b.current_version(), cat_s.current_version()) \
        == (2, 2, 2, 1)
    snapshots = {name: _manifest_bytes(cat) for name, cat in
                 (("rebalance", cat_r), ("retrain", cat_q),
                  ("bpe", cat_b), ("skew", cat_s))}

    # ---- (a) every serve path reads the new head --------------------
    # ANN: overlay resolution covers the whole corpus exactly once,
    # and the head centroid set differs from v1 (the synthetic corpus
    # exercises both split and merge at every scale — rebalance
    # docstring); the budgeted batch serve returns full result sets.
    cent, cells, codes, _ = _rebal_artifacts(spark, cat_r)
    n_vecs = load_table(spark, SF, "embeddings").count()
    assert cells.count() == n_vecs
    assert cells.select("vec_id").distinct().count() == n_vecs
    assert codes.count() == n_vecs
    cent_v1 = {r.cid for r in
               cat_r.read(spark, "centroids", version=1).collect()}
    cent_head = {r.cid for r in cent.collect()}
    assert cent_head != cent_v1
    served = ann_batch_query_from_rebalanced_index(spark, SF)
    assert served.count() > 0

    # quality: the retrain catalog head serves v2 when any source was
    # flagged (replace semantics), and v1 verbatim otherwise (append
    # carry-forward) — either way the head IS the serving truth.
    flagged = [r.source for r in cat_q.read(spark, "decision").collect()]
    w1 = read_qc_weights_at(spark, cat_q, 1)
    w_head = read_qc_weights(spark, cat_q)
    assert (w_head != w1) if flagged else (w_head == w1)

    # BPE: the head merge table extends v1 rank-continuously and
    # append-only (v1 rows verbatim under their ranks).
    m1 = {r.merge_rank: (r.lhs, r.rhs) for r in
          cat_b.read(spark, "merges", version=1).collect()}
    mh = {r.merge_rank: (r.lhs, r.rhs) for r in
          cat_b.read(spark, "merges").collect()}
    assert {k: mh[k] for k in m1} == m1
    ext_ranks = sorted(set(mh) - set(m1))
    assert ext_ranks == list(range(max(m1) + 1,
                                   max(m1) + 1 + len(ext_ranks)))

    # skew: the adaptive join consumes the committed hot-key artifact
    # and stays answer-neutral vs the plain join.
    hot = {r.user_id for r in cat_s.read(spark, "hotkeys").collect()}
    assert hot  # the synthetic corpus always flags someone
    events = load_table(spark, SF, "events")
    dim = events.select("user_id").distinct() \
                .withColumn("seg", F.col("user_id") % 7)
    plain = (events.select("user_id", "event_type").join(dim, "user_id")
             .groupBy("seg").agg(F.count(F.lit(1)).alias("n")))
    got = sorted(map(tuple, skew_adaptive_join(spark, SF).collect()))
    # the contract query's own shape is oracle-checked; here the pin
    # is only that it runs off the committed artifact we just built
    assert len(got) > 0 and plain.count() > 0

    # ---- (b) version-1 time travel after the whole window ----------
    # v1 of each clone catalog is the pre-maintenance artifact at
    # ZERO copy: its file list must be a subset of the live source
    # catalog's committed files, every file still on disk.
    for cat, src, table in (
            (cat_r, build_ann_index(spark, SF), "cells"),
            (cat_q, build_quality_classifier(spark, SF), "weights"),
            (cat_b, build_bpe_model(spark, SF), "merges")):
        v1_files = _files(cat, 1)
        src_files = _files(src, src.current_version())
        assert v1_files == src_files, f"{table}: clone not zero-copy"
        assert all(os.path.exists(f) for f in v1_files)
        assert cat.read(spark, table, version=1).count() > 0

    # ---- (c) resume idempotency (the kill-between-publishes rerun) --
    # Re-invoking every builder must be a version-guarded no-op: the
    # manifests stay byte-identical, so a process killed between any
    # two publishes of the sequence resumes by simply rerunning it.
    rebalance_ann_index(spark, SF)
    retrain_quality_classifier(spark, SF)
    extend_bpe_model(spark, SF)
    build_skew_stats(spark, SF)
    assert snapshots == {name: _manifest_bytes(cat) for name, cat in
                         (("rebalance", cat_r), ("retrain", cat_q),
                          ("bpe", cat_b), ("skew", cat_s))}


def test_maintenance_sequence_kill_between_publishes(spark, tmp_path,
                                                     monkeypatch):
    """Multi-catalog extension of the single-catalog crash drills:
    the maintenance sequence publishes to catalog A, then catalog B;
    a crash during B's publish must leave A at its completed head, B
    at its pre-crash head, no partial manifests anywhere — and the
    rerun completes B without touching A."""
    from healthkit_to_sqlite_spark.sinks.manifest import ManifestCatalog

    df1 = spark.range(10).selectExpr("id", "id * 2 AS v")
    df2 = spark.range(5).selectExpr("id", "id + 100 AS v")

    cat_a = ManifestCatalog(str(tmp_path / "a"))
    cat_b = ManifestCatalog(str(tmp_path / "b"))
    cat_a.publish_pass({"t": df1})
    cat_b.publish_pass({"t": df1})

    def sequence():
        if cat_a.current_version() < 2:          # version-guarded,
            cat_a.publish_pass({"t": df2}, replace={"t"})
        if cat_b.current_version() < 2:          # like the builders
            cat_b.publish_pass({"t": df2}, replace={"t"})

    boom = RuntimeError("killed mid-sequence")
    real_publish = ManifestCatalog._publish

    def failing_publish(self, manifest, version):
        if self.root == cat_b.root:
            raise boom
        return real_publish(self, manifest, version)

    monkeypatch.setattr(ManifestCatalog, "_publish", failing_publish)
    with pytest.raises(RuntimeError, match="killed mid-sequence"):
        sequence()
    monkeypatch.undo()

    # A completed; B is untouched at its old head with no partial
    # manifest — its staged orphans are invisible garbage
    assert cat_a.current_version() == 2
    assert cat_b.current_version() == 1
    assert sorted(map(tuple, cat_b.read(spark, "t").collect())) \
        == sorted(map(tuple, df1.collect()))
    a_manifests = _manifest_bytes(cat_a)

    # rerun resumes: B completes, A's guard skips (byte-identical)
    sequence()
    assert cat_b.current_version() == 2
    assert _manifest_bytes(cat_a) == a_manifests
    assert sorted(map(tuple, cat_b.read(spark, "t").collect())) \
        == sorted(map(tuple, df2.collect()))

    # the crash's staged garbage is exactly what vacuum(0) reclaims,
    # and it never touches live files
    live_before = {f for v in (1, 2) for f in _files(cat_b, v)}
    removed = set(cat_b.vacuum(min_age_seconds=0))
    assert removed and not (removed & live_before)
    assert all(os.path.exists(f) for f in live_before)


def test_retention_expire_then_vacuum_frees_only_orphans(spark, tmp_path):
    """Retention drill (VERDICT r8 item 7) on the maintenance-shaped
    catalog: v1 = {top, stats}, v2 = REPLACE top + APPEND a stats
    delta (the prune-on-append shape).  After expire_versions(1) +
    vacuum(0): (a) freed files are EXACTLY v1's replaced top files;
    (b) time travel to the retention floor (the head) still works and
    below it raises; (c) v1's stats files survive because the live
    head's manifest re-references them (append carry-forward) — the
    reference-safety argument, not the min-age guard."""
    from healthkit_to_sqlite_spark.sinks.manifest import ManifestCatalog

    cat = ManifestCatalog(str(tmp_path / "cat"))
    cat.publish_pass({
        "top": spark.range(20).selectExpr("id", "id * 3 AS rank"),
        "stats": spark.range(4).selectExpr("id", "id AS df"),
    })
    cat.publish_pass({
        "top": spark.range(25).selectExpr("id", "id * 5 AS rank"),
        "stats": spark.range(2).selectExpr("id + 100 AS id", "id AS df"),
    }, replace={"top"})

    v1_top = set(cat._load(1)["tables"]["top"]["files"])
    v1_stats = set(cat._load(1)["tables"]["stats"]["files"])
    head_files = _files(cat, 2)
    assert v1_stats <= head_files          # append carried forward
    assert not (v1_top & head_files)       # replace displaced

    expired = cat.expire_versions(keep_last=1)
    assert expired == [1]
    removed = set(cat.vacuum(min_age_seconds=0))

    # (a) exactly the replaced orphans
    assert removed == v1_top
    # (c) shared stats files survive via the head's reference
    assert all(os.path.exists(f) for f in head_files)
    # (b) the floor serves; below the floor raises
    assert cat.read(spark, "top").count() == 25
    assert (cat.read(spark, "stats").count() == 6)
    with pytest.raises(FileNotFoundError):
        cat.read(spark, "top", version=1)

    # idempotency: nothing left to expire or free
    assert cat.expire_versions(keep_last=1) == []
    assert cat.vacuum(min_age_seconds=0) == []


def test_retention_floor_respects_overlay_base(spark, tmp_path):
    """The rebalance-shaped catalog resolves its head by OVERLAY
    (deltas at v2 joined against tables read at version=1), so its
    retention floor must sit at the overlay base: expire_versions'
    contract says expire only below the oldest explicitly-named
    version.  keep_last=2 keeps the overlay serving; the drill also
    pins that the overlay's base files were never vacuum-eligible
    because the v2 manifest carries the un-replaced tables forward."""
    from healthkit_to_sqlite_spark.sinks.manifest import ManifestCatalog

    cat = ManifestCatalog(str(tmp_path / "ivf"))
    cat.publish_pass({
        "centroids": spark.range(4).selectExpr("id AS cid"),
        "cells": spark.range(100).selectExpr("id AS vec_id",
                                             "id % 4 AS cell"),
    })
    cat.publish_pass({
        "centroids": spark.range(5).selectExpr("id AS cid"),
        "cells_delta": spark.range(10).selectExpr(
            "id AS vec_id", "4 AS cell"),
    }, replace={"centroids"})

    base_cells = set(cat._load(1)["tables"]["cells"]["files"])
    assert base_cells <= _files(cat, 2)    # carried forward at head

    assert cat.expire_versions(keep_last=2) == []   # floor = base
    removed = set(cat.vacuum(min_age_seconds=0))
    assert not (removed & base_cells)
    # overlay resolution still works end-to-end
    moved = cat.read(spark, "cells_delta").select("vec_id")
    resolved = (cat.read(spark, "cells", version=1)
                .join(moved, "vec_id", "left_anti")
                .unionByName(cat.read(spark, "cells_delta")))
    assert resolved.count() == 100
    # and the manifest JSON of the base version is still loadable
    assert json.loads(open(cat._manifest_path(1)).read())["tables"]


def test_forget_pass_erases_from_both_serving_indexes(spark):
    """The erasure actuator (r9 — right-to-be-forgotten at artifact
    grain): tombstoned documents/vectors must vanish from BOTH
    serving indexes, k must refill from live entries, and the publish
    shapes must match their declared costs — the lexical index
    rewrites its (tiny) rows copy-on-write, the ANN index writes ONE
    deletion-vector table with cells/codes files byte-identical."""
    from pyspark.sql import functions as F

    from healthkit_to_sqlite_spark.catalog import load_table
    from healthkit_to_sqlite_spark.operators.similarity import (
        FORGET_VEC_IDS, ann_query_after_forget, ann_query_from_index,
        forget_from_ann_index)
    from healthkit_to_sqlite_spark.operators.text import (
        FORGET_DOC_IDS, bm25_after_forget, bm25_topk,
        forget_from_text_index)

    sf = SF

    # --- lexical ------------------------------------------------------
    pre = [r.doc_id for r in
           bm25_topk(load_table(spark, sf, "documents")).collect()]
    assert set(pre) & set(FORGET_DOC_IDS)   # the fixture is load-bearing
    post = bm25_after_forget(spark, sf).collect()
    assert len(post) == 15                  # k refills from live docs
    assert not {r.doc_id for r in post} & set(FORGET_DOC_IDS)

    cat_t = forget_from_text_index(spark, sf)
    # copy-on-write: replaced tables get fresh files, v1 untouched
    for t in ("postings", "doclen"):
        f1 = set(cat_t._load(1)["tables"][t]["files"])
        f2 = set(cat_t._load(2)["tables"][t]["files"])
        assert f1 and f2 and not (f1 & f2)
    # the negative stats delta accounts for exactly the erased docs
    st = cat_t.read(spark, "stats").agg(
        F.sum("n_docs").alias("n"), F.sum("sum_dl").alias("d")).first()
    docs = load_table(spark, sf, "documents")
    live = docs.filter(~F.col("doc_id").isin(*FORGET_DOC_IDS))
    truth = live.select(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.size(F.split("text", " "))).alias("d")).first()
    assert (st.n, st.d) == (truth.n, truth.d)
    # no tombstoned row survives in the replaced artifact
    assert cat_t.read(spark, "postings") \
        .filter(F.col("doc_id").isin(*FORGET_DOC_IDS)).count() == 0

    # --- ANN (deletion vectors) ---------------------------------------
    pre_v = [r.vec_id for r in ann_query_from_index(spark, sf).collect()]
    assert set(pre_v) & set(FORGET_VEC_IDS)
    post_v = ann_query_after_forget(spark, sf).collect()
    assert len(post_v) == 5
    assert not {r.vec_id for r in post_v} & set(FORGET_VEC_IDS)

    cat_a = forget_from_ann_index(spark, sf)
    # DV publish: cells/codes/centroids file lists IDENTICAL across
    # versions (zero rewrite — the O(|tombstones|) write-cost claim),
    # the only new table is the tombstone list itself
    for t in ("cells", "codes", "centroids", "codebook"):
        assert cat_a._load(1)["tables"][t]["files"] \
            == cat_a._load(2)["tables"][t]["files"]
    assert sorted(r.vec_id for r in
                  cat_a.read(spark, "deleted").collect()) \
        == sorted(FORGET_VEC_IDS)

    # --- PRUNED lexical index (the derived-data rule) ------------------
    from healthkit_to_sqlite_spark.operators.text import (
        bm25_pruned_after_forget, build_pruned_text_index,
        build_pruned_text_index_after_forget)
    post_p = bm25_pruned_after_forget(spark, sf).collect()
    assert len(post_p) == 15
    assert not {r.doc_id for r in post_p} & set(FORGET_DOC_IDS)
    pre_pruned = build_pruned_text_index(spark, sf).read(spark, "pruned")
    rederived = build_pruned_text_index_after_forget(spark, sf) \
        .read(spark, "pruned")
    assert rederived.filter(
        F.col("doc_id").isin(*FORGET_DOC_IDS)).count() == 0
    # the load-bearing pin: the re-derived artifact BACKFILLS
    # cap-displaced postings a naive anti-join of the pruned rows
    # could never restore (30 such rows on this fixture)
    naive = pre_pruned.filter(~F.col("doc_id").isin(*FORGET_DOC_IDS))
    backfilled = rederived.join(naive, ["term", "doc_id"], "left_anti")
    assert backfilled.count() > 0

    # --- dedup signature index (same tombstone list) -------------------
    from healthkit_to_sqlite_spark.operators.dedup import (
        forget_from_signature_index, incremental_dedup_after_forget,
        incremental_dedup_from_index)
    pre_d = {r.doc_id: r.first_corpus_dup for r in
             incremental_dedup_from_index(spark, sf).collect()}
    post_d = {r.doc_id: r.first_corpus_dup for r in
              incremental_dedup_after_forget(spark, sf).collect()}
    # a batch doc whose ONLY corpus dup was tombstoned drops out, and
    # no surviving row names a tombstoned doc as its first dup
    assert set(post_d) < set(pre_d)
    assert not set(post_d.values()) & set(FORGET_DOC_IDS)
    cat_d = forget_from_signature_index(spark, sf)
    assert cat_d.read(spark, "signatures") \
        .filter(F.col("doc_id").isin(*FORGET_DOC_IDS)).count() == 0

    # --- idempotent rerun (the resume contract) ------------------------
    m_t = _manifest_bytes(cat_t)
    m_a = _manifest_bytes(cat_a)
    m_d = _manifest_bytes(cat_d)
    forget_from_text_index(spark, sf)
    forget_from_ann_index(spark, sf)
    forget_from_signature_index(spark, sf)
    assert _manifest_bytes(cat_t) == m_t and _manifest_bytes(cat_a) == m_a
    assert _manifest_bytes(cat_d) == m_d


def test_forget_composes_with_rebalance_overlay(spark):
    """Deletion vectors compose with the rebalance overlay — the two
    merge-on-read mechanisms a production index accumulates between
    rebuilds: resolve the REBALANCED head (v1 base minus moved rows
    plus deltas), then anti-join the tombstones.  Pins: (a) resolved
    coverage is exactly corpus-minus-tombstones with no duplicates;
    (b) the budgeted batch serve over the composed view returns full
    result sets containing no tombstoned vec_id; (c) both overlays
    stay pure metadata — composing them rewrites nothing (the
    rebalance catalog's manifests are byte-identical before/after)."""
    from pyspark.sql import functions as F

    from healthkit_to_sqlite_spark.catalog import load_table
    from healthkit_to_sqlite_spark.operators.similarity import (
        FORGET_VEC_IDS, PQ_RERANK, _batch_adc_serve, _rebal_artifacts,
        forget_from_ann_index, rebalance_ann_index)

    cat_r = rebalance_ann_index(spark, SF)
    m_before = _manifest_bytes(cat_r)
    dv = F.broadcast(forget_from_ann_index(spark, SF)
                     .read(spark, "deleted").select("vec_id"))

    cent, cells, codes, book = _rebal_artifacts(spark, cat_r)
    cells_f = cells.join(dv, "vec_id", "left_anti")
    codes_f = codes.join(dv, "vec_id", "left_anti")

    emb = load_table(spark, SF, "embeddings")
    n = emb.count()
    live = emb.join(dv, "vec_id", "left_anti").count()
    assert live == n - len(FORGET_VEC_IDS)
    assert cells_f.count() == live
    assert cells_f.select("vec_id").distinct().count() == live
    assert codes_f.count() == live

    import math
    k_pre = cat_r.read(spark, "centroids", version=1).count()
    budget = 2 * math.ceil(n / k_pre)
    served = _batch_adc_serve(emb, cent, cells_f, codes_f, book,
                              8, 5, 2, PQ_RERANK, probe_budget=budget)
    rows = served.collect()
    assert len(rows) > 0
    assert not {r.vec_id for r in rows} & set(FORGET_VEC_IDS)

    # composing two metadata overlays rewrote nothing
    assert _manifest_bytes(cat_r) == m_before


def test_text_index_erasure_turns_physical_with_retention(spark, tmp_path):
    """Physical erasure on the catalog that OWNS the files (review
    finding: the clone-isolated contract catalogs free nothing by
    design — their v1 references the source's files).  Production
    shape: the erasure pass REPLACE-publishes onto the live index
    catalog; expire + vacuum on that catalog then frees exactly the
    pre-erasure files holding the erased rows."""
    from pyspark.sql import functions as F

    from healthkit_to_sqlite_spark.catalog import load_table
    from healthkit_to_sqlite_spark.operators.text import (
        FORGET_DOC_IDS, text_index_forget_pass, ws_tokens)
    from healthkit_to_sqlite_spark.sinks.manifest import ManifestCatalog

    docs = load_table(spark, SF, "documents")
    cat = ManifestCatalog(str(tmp_path / "live_index"))
    toks = (docs.select("doc_id",
                        F.explode(ws_tokens("text")).alias("term"))
            .filter(F.col("term") != ""))
    cat.publish_pass({
        "postings": toks.groupBy("term", "doc_id")
                        .agg(F.count(F.lit(1)).alias("tf")),
        "doclen": docs.select("doc_id",
                              F.size(ws_tokens("text")).alias("dl")),
        "stats": docs.agg(F.count(F.lit(1)).alias("n_docs"),
                          F.sum(F.size(ws_tokens("text")))
                          .alias("sum_dl")),
    })
    pre_files = {f for t in ("postings", "doclen")
                 for f in cat._load(1)["tables"][t]["files"]}

    v = text_index_forget_pass(spark, cat, FORGET_DOC_IDS)
    assert v == 2
    assert cat.read(spark, "postings") \
        .filter(F.col("doc_id").isin(*FORGET_DOC_IDS)).count() == 0

    # retention makes it physical: the pre-erasure postings/doclen
    # files — the bytes holding the erased rows — are freed
    assert cat.expire_versions(keep_last=1) == [1]
    removed = set(cat.vacuum(min_age_seconds=0))
    assert pre_files <= removed
    # the erased head still serves, and its files survive
    head_files = {f for t in cat._load(2)["tables"].values()
                  for f in t["files"]}
    assert all(os.path.exists(f) for f in head_files)
    assert cat.read(spark, "doclen").count() == docs.count() - len(
        set(FORGET_DOC_IDS))


def test_dv_physical_erasure_frees_disk(spark, tmp_path):
    """The DV twin of the lexical drill above (VERDICT r9 item 4 /
    r10 item 3): on the catalog that OWNS the index files,
    `_dv_rewrite_pass` physically applies the due cells' tombstones,
    and `expire_versions` + `vacuum` then frees exactly the
    pre-rewrite files that held the applied rows — while untouched
    files ride forward byte-identically and the head keeps serving
    the same answer as the all-logical DV serve."""
    from pyspark.sql import functions as F

    from healthkit_to_sqlite_spark.catalog import load_table
    from healthkit_to_sqlite_spark.operators.similarity import (
        FORGET_VEC_IDS, PQ_RERANK, _dv_rewrite_pass, _residual_adc_serve,
        ann_query_after_forget, build_ann_index)
    from healthkit_to_sqlite_spark.sinks.manifest import ManifestCatalog

    base = build_ann_index(spark, SF)
    cat = ManifestCatalog(str(tmp_path / "live_ann"))
    # own the files: re-stage the artifacts (a clone would reference
    # the source's files — the clone-vacuum hazard); cells/codes in
    # several files so the rewrite's file selectivity is observable
    cat.publish_pass({
        "centroids": base.read(spark, "centroids"),
        "cells": base.read(spark, "cells").repartition(8, "vec_id"),
        "codes": base.read(spark, "codes").repartition(8, "vec_id"),
        "codebook": base.read(spark, "codebook"),
    })
    cat.publish_pass({"deleted": spark.createDataFrame(
        [(int(i),) for i in FORGET_VEC_IDS], "vec_id bigint")})

    assert _dv_rewrite_pass(spark, cat) == 3
    dec = cat.read(spark, "dv_decision").collect()
    assert any(r.rewrite_due for r in dec)          # something applied
    assert not all(r.rewrite_due for r in dec)      # something logical

    pre, head = _files(cat, 2), _files(cat, 3)
    superseded = pre - head          # affected cells/codes + old DV
    assert superseded, "physical rewrite must supersede files"
    assert pre & head, "unaffected files must ride forward"

    # retention makes the erasure physical ON DISK: the superseded
    # pre-rewrite files — the last copies of the applied tombstones'
    # rows — are freed
    assert set(cat.expire_versions(keep_last=1)) == {1, 2}
    removed = set(cat.vacuum(min_age_seconds=0))
    assert superseded <= removed
    assert all(not os.path.exists(f) for f in superseded)
    assert all(os.path.exists(f) for f in head)

    # the head still serves: physical (due cells) + logical (leftover
    # DV) composition equals the all-logical erased serve, so recall
    # on live vectors is unchanged
    dv = cat.read(spark, "deleted").select("vec_id")
    emb = load_table(spark, SF, "embeddings")
    served = _residual_adc_serve(
        emb,
        cat.read(spark, "centroids"),
        cat.read(spark, "cells").join(F.broadcast(dv), "vec_id",
                                      "left_anti"),
        cat.read(spark, "codes").join(F.broadcast(dv), "vec_id",
                                      "left_anti"),
        cat.read(spark, "codebook"), 0, 5, 2, PQ_RERANK).collect()
    assert served == ann_query_after_forget(spark, SF).collect()


def test_dv_rewrite_pass_survives_concurrent_tombstone_append(
        spark, tmp_path, monkeypatch):
    """ADVICE r10: apply_deletes_pass re-derived only the drops inside
    its retry loop — the caller-supplied tables (leftover DV, decision)
    were computed against the pre-race head, so a tombstone appended
    between derive and publish was REPLACE-published away (the
    fold_batch lost-update shape).  The pass now pins expected_parent
    and `_dv_rewrite_pass` re-derives EVERYTHING on CommitConflict:
    the late tombstone must be re-counted, never dropped."""
    from healthkit_to_sqlite_spark.operators.similarity import (
        FORGET_VEC_IDS, _dv_rewrite_pass, build_ann_index)
    from healthkit_to_sqlite_spark.sinks.manifest import ManifestCatalog

    base = build_ann_index(spark, SF)
    cat = ManifestCatalog(str(tmp_path / "raced_ann"))
    cat.publish_pass({t: base.read(spark, t)
                      for t in ("centroids", "cells", "codes",
                                "codebook")})
    cat.publish_pass({"deleted": spark.createDataFrame(
        [(int(i),) for i in FORGET_VEC_IDS], "vec_id bigint")})

    other = ManifestCatalog(cat.root)
    real_stage = cat._stage
    raced = {"done": False}
    extra = 333                       # a live vec_id at sf0.001

    def racing_stage(df):
        staged = real_stage(df)
        if not raced["done"]:         # an eraser lands AFTER the pass
            raced["done"] = True      # derived, BEFORE its publish
            other.publish_pass({"deleted": spark.createDataFrame(
                [(extra,)], "vec_id bigint")})
        return staged

    monkeypatch.setattr(cat, "_stage", racing_stage)
    _dv_rewrite_pass(spark, cat)
    assert raced["done"], "race was never injected"

    # every tombstone ever appended is accounted for: either still
    # logical in the leftover DV or physically gone from the files
    leftover = {r.vec_id for r in cat.read(spark, "deleted").collect()}
    present = {r.vec_id for r in cat.read(spark, "cells").collect()}
    lost = [t for t in set(FORGET_VEC_IDS) | {extra}
            if t not in leftover and t in present]
    assert not lost, f"tombstones dropped by the publish race: {lost}"

    # and the decision was derived from the POST-race head
    dec = cat.read(spark, "dv_decision").collect()
    assert (sum(r.n_tombstoned for r in dec)
            == len(set(FORGET_VEC_IDS)) + 1)


def test_selection_outputs_drop_tombstoned_docs_on_rebuild(spark):
    """DEPLOY.md 'Erasure composition for selection outputs' (VERDICT
    r11 item 3): coreset picks, mined pairs, keep-sets and curriculum
    manifests are derived artifacts a tombstoned document must vanish
    from on rebuild.  Tombstone a doc that IS a coreset pick and a
    doc that IS a mined pair's source, re-run the selection queries
    against the erased head (live-only corpus view — the same
    anti-join retrain_ann_index applies to its training scan), and
    assert the outputs are free of them while the selection refills
    deterministically."""
    from pyspark.sql import functions as F

    from healthkit_to_sqlite_spark.catalog import load_table
    from healthkit_to_sqlite_spark.operators.similarity import (
        K_CENTERS, bitext_mine, kcenter_coreset, proto_prune)

    emb = load_table(spark, SF, "embeddings")
    docs = load_table(spark, SF, "documents")

    picks = sorted(kcenter_coreset(emb).collect(),
                   key=lambda r: r.sel_order)
    pick_victim = int(picks[1].vec_id)        # a non-seed pick
    mined = bitext_mine(emb, docs).collect()
    assert mined, "fixture yields no mined pairs"
    pair_victim = int(mined[0].src_id)
    tombs = {pick_victim, pair_victim}
    tomb = F.broadcast(spark.createDataFrame(
        [(int(i),) for i in tombs], "vec_id bigint"))

    live_emb = emb.join(tomb, "vec_id", "left_anti")
    live_docs = docs.join(tomb.withColumnRenamed("vec_id", "doc_id"),
                          "doc_id", "left_anti")

    re_picks = kcenter_coreset(live_emb).collect()
    re_ids = {r.vec_id for r in re_picks}
    assert pick_victim not in re_ids, "tombstoned pick survived rebuild"
    assert len(re_picks) == K_CENTERS, "selection did not refill"

    re_mined = bitext_mine(live_emb, live_docs).collect()
    assert all(r.src_id not in tombs and r.tgt_id not in tombs
               for r in re_mined), "tombstoned doc in rebuilt pair list"

    kept = proto_prune(live_emb).collect()
    assert all(r.vec_id not in tombs for r in kept), (
        "tombstoned doc in rebuilt keep-set")

    # curriculum manifests (VERDICT r12 item 7 — the docstring named
    # them but the drill never rebuilt one): the re-derived training
    # order must be free of the tombstoned docs AND remain a valid
    # dense ordering of exactly the live corpus — a hole at the
    # victim's old position would mean the erased doc still shaped
    # the manifest
    from healthkit_to_sqlite_spark.operators.text import curriculum_order
    manifest = curriculum_order(live_docs).collect()
    m_ids = {r.doc_id for r in manifest}
    assert not (m_ids & tombs), "tombstoned doc in rebuilt curriculum"
    assert len(manifest) == live_docs.count()
    positions = sorted(r.global_pos for r in manifest)
    assert positions == list(range(1, len(manifest) + 1)), (
        "rebuilt curriculum is not a dense 1..n ordering")

    # the rebuilds are from-scratch runs on the post-erasure corpus —
    # nothing else may go missing
    n_live = live_emb.count()
    assert len(kept) > 0 and {r.vec_id for r in kept} <= {
        r.vec_id for r in live_emb.select("vec_id").collect()}
    assert len(re_ids) == min(K_CENTERS, n_live)


def test_dv_retrain_due_fires_and_rebuild_drops_residue(spark):
    """VERDICT r10 item 7: both decision-flag paths must be live in
    tests.  At a retrain threshold low enough to trip, the global
    retrain_due flag lands in the versioned decision, and the
    actuator the docstring names — a build_ann_index-shaped rerun —
    produces quantizers trained WITHOUT the erased vectors (the
    frozen-quantizer residue decays to zero)."""
    from pyspark.sql import functions as F

    from healthkit_to_sqlite_spark.catalog import load_table
    from healthkit_to_sqlite_spark.operators.similarity import (
        FORGET_VEC_IDS, build_ann_index, dv_rewrite_ann_index,
        retrain_ann_index)

    cat = dv_rewrite_ann_index(spark, SF, retrain_pct=0)
    dec = cat.read(spark, "dv_decision").collect()
    assert dec and all(r.retrain_due for r in dec), (
        "global retrain flag must land on every decision row")

    re_cat = retrain_ann_index(spark, SF)
    tombs = set(FORGET_VEC_IDS)
    live = {r.vec_id for r in re_cat.read(spark, "cells").collect()}
    assert not (live & tombs), "erased vectors reached the rebuild"
    n = load_table(spark, SF, "embeddings").count()
    assert len(live) == n - len(tombs)
    assert re_cat.read(spark, "codes").filter(
        F.col("vec_id").isin(*tombs)).count() == 0
    assert re_cat.read(spark, "deleted").count() == 0   # all applied

    # residue decays: the quantizer retrained on live vectors differs
    # from the frozen one that saw the erased vectors
    frozen = {(r.cid, tuple(r.cemb)) for r in
              build_ann_index(spark, SF)
              .read(spark, "centroids").collect()}
    retrained = {(r.cid, tuple(r.cemb)) for r in
                 re_cat.read(spark, "centroids").collect()}
    assert frozen != retrained

    # idempotent rerun: version guard, no second training pass
    assert retrain_ann_index(spark, SF).current_version() == 1


from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_dv_cases = st.tuples(
    st.integers(min_value=8, max_value=36),    # n vectors
    st.integers(min_value=2, max_value=4),     # K cells (id % K)
    st.sets(st.integers(min_value=0, max_value=35), max_size=12),
    st.integers(min_value=0, max_value=100),   # rewrite_pct
    st.integers(min_value=0, max_value=100),   # retrain_pct
)


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(case=_dv_cases)
def test_dv_rewrite_threshold_invariant(spark, tmp_path_factory, case):
    """The DV rewrite decision as a PROPERTY (vs the single contract
    fixture): for ANY cell layout, tombstone set and thresholds, the
    pass must physically remove exactly the tombstones of cells where
    n_tomb·100 > pct·n_total (from BOTH dropped-from tables), keep
    the rest as the logical leftover, and version a decision matching
    the pure-python model — including the all-due, none-due, and
    empty-tombstone edges hypothesis will find (an all-rows-dropped
    file set must still publish and read back as empty)."""
    import uuid

    from healthkit_to_sqlite_spark.operators.similarity import \
        _dv_rewrite_pass
    from healthkit_to_sqlite_spark.sinks.manifest import ManifestCatalog

    n, k, tombs, rw_pct, rt_pct = case
    tombs = {t for t in tombs if t < n}
    cell_of = {i: i % k for i in range(n)}

    root = tmp_path_factory.mktemp("dvprop") / uuid.uuid4().hex
    cat = ManifestCatalog(str(root))
    cat.publish_pass({
        "cells": spark.createDataFrame(
            [(i, cell_of[i]) for i in range(n)], "vec_id bigint, cell int"),
        "codes": spark.createDataFrame(
            [(i, i * 7 % 11) for i in range(n)],
            "vec_id bigint, code0 int"),
        "deleted": spark.createDataFrame(
            [(int(t),) for t in sorted(tombs)] or [],
            "vec_id bigint"),
    })

    v = _dv_rewrite_pass(spark, cat, rewrite_pct=rw_pct,
                         retrain_pct=rt_pct)
    assert v == 2

    # pure-python model
    totals = {c: sum(1 for i in range(n) if cell_of[i] == c)
              for c in range(k)}
    tomb_n = {c: sum(1 for t in tombs if cell_of[t] == c)
              for c in range(k)}
    due = {c for c in range(k) if tomb_n[c] * 100 > rw_pct * totals[c]}
    applied = {t for t in tombs if cell_of[t] in due}
    leftover = tombs - applied
    retrain = len(tombs) * 100 > rt_pct * n

    assert ({r.vec_id for r in cat.read(spark, "deleted").collect()}
            == leftover)
    for t in ("cells", "codes"):
        assert ({r.vec_id for r in cat.read(spark, t).collect()}
                == set(range(n)) - applied), t
    dec = {r.cell: (r.n_live, r.n_tombstoned, r.rewrite_due,
                    r.retrain_due)
           for r in cat.read(spark, "dv_decision").collect()}
    assert dec == {c: (totals[c] - tomb_n[c], tomb_n[c], c in due,
                       retrain) for c in range(k)}
