"""Incremental similarity search: maintain a running top-k over an
unbounded vector stream.

The continuous-query analog of operators/similarity.topk_cosine (the
interactive/incremental top-k family — e.g. "Incremental Framework for
Efficient Top-K Similarity Search", EDBT 2020; "Continuously Adaptive
Similarity Search", SIGMOD 2020): as vector batches arrive, each
micro-batch contributes its local top-k and merges into a persisted
global top-k.  Top-k is a monotone merge — max-k(S ∪ T) =
max-k(max-k(S) ∪ max-k(T)) — so the incremental result is EXACTLY the
batch answer at every point, and the state is O(k) rows regardless of
stream length (the streaming-state discipline every op in this package
follows).

foreachBatch is the right harness: global ordering isn't expressible
as a watermarked streaming aggregation (sort needs complete mode), but
per-batch local top-k (TakeOrdered, no global sort) + an O(k) merge
is; the driver-side state round-trip is k≈10 rows, inside the
"bounded scalars only" collect policy.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import cosine_similarity

_STATE_SCHEMA = "vec_id long, label int, cosine_sim double"


def _latest_state(state_dir: str) -> str | None:
    """Resolve the last durably committed state version, or None.

    State layout: ``state_dir/v=<batch_id>/`` parquet versions plus a
    ``LATEST`` pointer file.  Round 2 overwrote one flat dir in place;
    a crash between the delete and the rewrite — before the streaming
    checkpoint recorded the batch — lost all accumulated state, and
    the retried batch merged against nothing (round-2 advisor).  With
    versions, a retried batch re-reads the previous committed version
    and rewrites only its own."""
    ptr = os.path.join(state_dir, "LATEST")
    if not os.path.exists(ptr):
        # round-2 FLAT layout (parquet + _SUCCESS directly in
        # state_dir): recognize rather than silently discard — the
        # exact data-loss mode the versioned layout was built to fix
        if os.path.exists(os.path.join(state_dir, "_SUCCESS")):
            return state_dir
        return None
    with open(ptr) as fh:
        name = fh.read().strip()
    d = os.path.join(state_dir, name)
    if name and os.path.exists(os.path.join(d, "_SUCCESS")):
        return d
    return None


def incremental_topk(stream: DataFrame, query_vec: list[float],
                     state_dir: str, k: int = 10, exclude_vec_id: int = 0):
    """Wire the merge: returns a ``DataStreamWriter`` whose foreachBatch
    folds each micro-batch's local top-k into the parquet state at
    ``state_dir``.  Caller starts it with its own checkpoint/trigger."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])

    def merge(batch_df, batch_id):
        spark = batch_df.sparkSession
        cand = (batch_df
                .filter(F.col("vec_id") != exclude_vec_id)
                .select("vec_id", "label",
                        F.round(cosine_similarity(F.col("embedding"), q), 6)
                        .alias("cosine_sim"))
                .orderBy(F.col("cosine_sim").desc(), F.col("vec_id"))
                .limit(k))
        rows = [tuple(r) for r in cand.collect()]  # ≤ k rows
        prev = _latest_state(state_dir)
        if prev is not None:
            rows += [tuple(r) for r in
                     spark.read.schema(_STATE_SCHEMA).parquet(prev)
                     .collect()]  # ≤ k rows
        # dedupe on vec_id (reprocessed batches under at-least-once),
        # then keep the k best — all driver-side on ≤ 2k tuples
        best: dict = {}
        for vec_id, label, sim in rows:
            if vec_id not in best or sim > best[vec_id][2]:
                best[vec_id] = (vec_id, label, sim)
        top = sorted(best.values(), key=lambda t: (-t[2], t[0]))[:k]
        # Commit protocol: write a FRESH uniquely-named attempt dir,
        # then atomically repoint LATEST, then best-effort GC of
        # every version except the one LATEST names.  The attempt
        # suffix is load-bearing: a batch RETRIED after its own
        # publish (crash before the streaming checkpoint committed)
        # re-enters with the same batch_id, and a name keyed only by
        # batch_id would make mode("overwrite") delete the committed
        # dir LATEST points at — a crash mid-rewrite then loses ALL
        # state since older versions were already GC'd (review
        # finding).  With unique attempts, no committed dir is ever
        # rewritten; the retry simply publishes a content-identical
        # new version.  (Local-fs rename is the atomic primitive; on
        # an object store the same pattern rides conditional PUT.)
        import uuid
        vname = f"v={batch_id}-{uuid.uuid4().hex[:8]}"
        vdir = os.path.join(state_dir, vname)
        # parallelize(rows, 1): a bare createDataFrame parallelizes
        # even these ≤k rows to one slice PER CORE, and both exits are
        # expensive — coalesce(1) drains all 32 slices sequentially
        # through the Python serializer (~4.3 s/write, measured r13)
        # and repartition(1) pays a 32-task stage + exchange per write
        # (measured 7.3-8.7 CPU-s per batch at local[32], ~30 of this
        # query's 34 CPU-s).  One explicit slice = one task, no
        # exchange: 0.44-0.47 CPU-s per write, identical rows.
        (spark.createDataFrame(spark.sparkContext.parallelize(
            top, 1), _STATE_SCHEMA)
         .write.mode("overwrite").parquet(vdir))
        tmp = os.path.join(state_dir, "LATEST.tmp")
        with open(tmp, "w") as fh:
            fh.write(vname)
        os.replace(tmp, os.path.join(state_dir, "LATEST"))
        for stale in os.listdir(state_dir):
            if stale.startswith("v=") and stale != vname:
                shutil.rmtree(os.path.join(state_dir, stale),
                              ignore_errors=True)

    return stream.writeStream.foreachBatch(merge)


def read_topk_state(spark: SparkSession, state_dir: str) -> DataFrame:
    """The current global top-k (ordered), from the last committed
    state version."""
    latest = _latest_state(state_dir)
    if latest is None:
        raise FileNotFoundError(
            f"no committed top-k state under {state_dir} (no LATEST "
            f"pointer / _SUCCESS-marked version)")
    return (spark.read.schema(_STATE_SCHEMA).parquet(latest)
            .orderBy(F.col("cosine_sim").desc(), F.col("vec_id")))


def run_incremental_topk(spark: SparkSession, source_parquet: str,
                         work_dir: str, query_vec: list[float],
                         k: int = 10, n_chunks: int = 4) -> DataFrame:
    """Batch-bounded end-to-end run (availableNow): re-chunk the source
    into ``n_chunks`` files (the file stream source wants a drop DIR,
    and several files force several micro-batches — a single-batch run
    would not exercise the merge), stream them one file per trigger
    through the incremental merge, and return the final top-k.  Exists
    so the operator is contract-checkable — the final state must equal
    the batch topk_cosine answer, hence it shares that query's
    oracle."""
    src = spark.read.parquet(source_parquet)
    chunks_dir = os.path.join(work_dir, "chunks")
    src.repartition(n_chunks).write.mode("overwrite").parquet(chunks_dir)
    stream = (spark.readStream.schema(src.schema)
              .option("maxFilesPerTrigger", 1)
              .parquet(chunks_dir))
    state_dir = os.path.join(work_dir, "topk_state")
    ckpt = os.path.join(work_dir, "ckpt")
    query = (incremental_topk(stream, query_vec, state_dir, k=k)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True)
             .start())
    query.awaitTermination()
    return read_topk_state(spark, state_dir)
