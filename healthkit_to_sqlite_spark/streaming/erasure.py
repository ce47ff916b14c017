"""Streaming erasure queue: GDPR/DSR tombstone requests arrive as a
STREAM in production (a deletion-request topic), not as a hand-built
batch table.  This module makes the queue a first-class streaming
input to the two-phase erasure contract the batch side already pins:

1. ``erasure_queue_writer`` — ``foreachBatch`` sink appending each
   micro-batch's tombstoned ids exactly-once into a queue
   ``ManifestTable`` (the ``append_batch`` high-water contract: a
   replayed batch no-ops at the manifest layer, a reset checkpoint
   fails fast — same exactly-once composition as every other
   streaming sink here).
2. ``sync_tombstones_pass`` — fold the committed queue into a serving
   catalog's ``deleted`` deletion-vector table as a SET UNION
   (re-requesting an id is idempotent), version-guarded by a
   ``dv_sync`` artifact recording the queue version folded (the
   publish-even-do-nothing rule: later calls no-op on the recorded
   version instead of re-scanning), and pinned to the head it read
   (the ``expected_parent`` CAS pattern) so a concurrently appended
   tombstone is never REPLACE-published away.

Downstream is unchanged: the DV-debt monitor (`q_dv_fraction`), the
threshold-gated physical rewrite (`_dv_rewrite_pass` /
`q_ann_dv_rewrite`) and the global retrain (`q_ann_retrain`) consume
whatever the synced ``deleted`` table holds — streamed and batch
tombstones are indistinguishable by construction (drilled in
tests/test_streaming.py with a killed-and-restarted StreamingQuery).

At 100 TB: the queue and the DV are index-grain tiny (O(|tombstones|)
rows); the sync is one distinct-union over two small tables per
erasure window, and the corpus is never read.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from ..functions import one_slice_df
from ..sinks.manifest import CommitConflict, ManifestCatalog, ManifestTable


def erasure_queue_writer(tbl: ManifestTable):
    """``writeStream.foreachBatch(erasure_queue_writer(queue_tbl))`` —
    exactly-once append of each micro-batch's ``vec_id`` tombstones
    (deduplicated within the batch; cross-batch duplicates are fine —
    the sync's set-union absorbs them)."""
    def write(batch_df, batch_id: int) -> None:
        tbl.append_batch(batch_df.select("vec_id").distinct(),
                         int(batch_id))
    return write


def sync_tombstones_pass(spark: SparkSession, queue: ManifestTable,
                         cat: ManifestCatalog,
                         max_retries: int = 10) -> int | None:
    """Fold the streamed erasure queue into ``cat``'s ``deleted`` DV:
    REPLACE-publish ``deleted = committed ∪ queue`` plus a one-row
    ``dv_sync`` artifact carrying the queue version folded, in ONE
    atomic pass.  Returns the published version, or None when the
    recorded ``dv_sync`` version already covers the queue head (the
    version guard — no scan, no publish).

    The union is over the FULL queue, so ids whose index rows were
    already physically applied re-enter the DV.  Deliberate: they mask
    nothing (their rows are gone) but they make the DV the permanent
    ERASURE REGISTRY — a later re-ingest of the same id from a stale
    upstream copy is still masked at candidate time instead of
    resurfacing erased data (the re-ingestion guard every erasure
    system needs).  Size stays O(|all requests ever|): index-grain
    tiny, and the monitor/rewrite decisions are unaffected because
    the DV-debt rollup counts tombstones through a join FROM the
    index rows (an id with no rows contributes zero debt).

    The derive runs INSIDE the commit-retry loop against a PINNED
    head, like `_dv_rewrite_pass`: on a lost race the union recomputes
    from the NEW head, so tombstones appended concurrently by another
    eraser (or a second sync) survive — the fold_batch lost-update
    shape, closed the same way."""
    qv = queue.current_version()
    if qv == 0:
        return None                       # nothing streamed yet
    for _ in range(max_retries):
        head = cat.current_version()
        tables = cat._load(head).get("tables", {}) if head else {}
        if "dv_sync" in tables:
            synced = cat.read(spark, "dv_sync", version=head) \
                        .collect()[0].queue_version   # 1 row (bounded)
            if synced >= qv:
                return None               # queue unchanged since last fold
        # read the queue AT qv (time travel): the recorded dv_sync
        # version then exactly names the content folded — a batch
        # landing mid-pass is picked up by the next sync, not
        # silently folded under an older version number
        incoming = queue.read(spark, version=qv).select("vec_id")
        deleted = (cat.read(spark, "deleted", version=head)
                      .select("vec_id") if "deleted" in tables
                   else incoming.limit(0))
        merged = deleted.unionByName(incoming).distinct()
        sync = one_slice_df(spark, [(int(qv),)], "queue_version bigint")
        try:
            return cat.publish_pass({"deleted": merged, "dv_sync": sync},
                                    replace={"deleted", "dv_sync"},
                                    expected_parent=head)
        except CommitConflict:
            continue
    raise CommitConflict(f"lost {max_retries} publish races")
