"""Streaming corpus quality filter: score documents with the COMMITTED
classifier as they arrive.

Completes the quality-model lifecycle across both execution modes:
train once (operators.text.build_quality_classifier), serve the batch
corpus (q_quality_classifier), monitor per source
(q_quality_classifier_eval), and — here — score the INGEST STREAM so
new documents carry their quality verdict from the moment they land
(the FineWeb-class deployment shape: the classifier gates documents on
the way in, not in a later sweep).

Because the serve expression is a pure map (`qc_score_col` — literal
weights, in-row transform/aggregate, zero shuffles, no state), it
drops into a streaming projection UNCHANGED: no watermarks, no state
store, exactly-once via the file-sink manifest.  The batch and
streaming paths share the Column verbatim, and the equivalence test
pins streamed scores row-identical to the batch serve.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def streaming_quality_scores(stream: DataFrame,
                             w: dict[int, float],
                             dim: int) -> DataFrame:
    """Map-only streaming projection: (doc_id, qc_score, pred_keep)
    per arriving document — `qc_score_col` applied to an unbounded
    relation."""
    from ..operators.text import qc_score_col

    score = qc_score_col(w, dim)
    return stream.select("doc_id",
                         F.round(score, 6).alias("qc_score"),
                         (score > 0.5).alias("pred_keep"))


def run_streaming_quality(spark: SparkSession, sf_dir: str,
                          work_dir: str, n_chunks: int = 4,
                          cat=None) -> DataFrame:
    """Batch-bounded end-to-end run (availableNow): build/load the
    committed model, re-chunk the documents table so several
    micro-batches flow through the scorer, sink scores to parquet via
    the exactly-once file sink, and return the scored relation.  The
    result must equal the batch serve row-for-row — pinned in
    test_streaming.

    ``cat`` overrides the model catalog — pass the RETRAIN catalog
    (operators.text.retrain_quality_classifier) and the stream scores
    with its head weights, i.e. the v2 model the drift loop published:
    model rollout to the streaming path is just pointing the reader
    at the catalog head (pinned row-identical to the v2 batch serve
    in test_streaming)."""
    from ..catalog import load_table
    from ..operators.text import (HASH_EMBED_DIM, build_quality_classifier,
                                  read_qc_weights)

    if cat is None:
        cat = build_quality_classifier(spark, sf_dir)
    w = read_qc_weights(spark, cat)
    src = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    chunks_dir = os.path.join(work_dir, "chunks")
    src.repartition(n_chunks).write.mode("overwrite").parquet(chunks_dir)
    stream = (spark.readStream.schema(src.schema)
              .option("maxFilesPerTrigger", 1)
              .parquet(chunks_dir))
    out_dir = os.path.join(work_dir, "scores")
    (streaming_quality_scores(stream, w, HASH_EMBED_DIM)
     .writeStream.format("parquet")
     .option("path", out_dir)
     .option("checkpointLocation", os.path.join(work_dir, "ckpt"))
     .trigger(availableNow=True)
     .start().awaitTermination())
    return spark.read.parquet(out_dir)
