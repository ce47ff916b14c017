"""Spark 4 ``transformWithStateInPandas``: the successor stateful API
(SPARK-49564 "State API v2") pinned with a MapState processor.

Where ``applyInPandasWithState`` (streaming/stateful.py) exposes one
opaque state tuple per key, the v2 API gives named, typed state
variables (ValueState / ListState / MapState), per-state TTL, timers,
and an init/close lifecycle — the Flink-KeyedProcessFunction feature
set inside Structured Streaming.  This module keeps the same contract
discipline as every streaming operator here: the processor only
ACCUMULATES, so the final emitted state equals a batch ``GROUP BY``
and the operator is oracle-checkable rather than rows-only.

State discipline: one MapState per user holding event_type → count —
O(#event_types) per key (bounded, 5 types), updated with one
``iterator`` pass per micro-batch.  Requires the RocksDB state store
provider (state v2 is not implemented for the HDFS-backed store);
``run_transform_state_counts`` sets it on the session for the run.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

OUT_SCHEMA = "user_id long, event_type string, n long"

_ROCKSDB = ("org.apache.spark.sql.execution.streaming."
            "state.RocksDBStateStoreProvider")


def _build_processor():
    """Closure-complete StatefulProcessor factory (module-level classes
    pickle by reference and break on repo-less executors)."""
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor, StatefulProcessorHandle)

    class TypeCounts(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._counts = handle.getMapState("counts", "key string", "n long")

        def handleInputRows(self, key, rows, timerValues):
            for pdf in rows:
                for et, n in pdf.groupby("event_type").size().items():
                    k = (et,)
                    prev = (self._counts.getValue(k)[0]
                            if self._counts.containsKey(k) else 0)
                    self._counts.updateValue(k, (prev + int(n),))
            out = pd.DataFrame(
                [(key[0], k[0], v[0]) for k, v in self._counts.iterator()],
                columns=["user_id", "event_type", "n"])
            yield out

        def close(self) -> None:
            pass

    return TypeCounts()


def transform_state_counts(stream: DataFrame) -> DataFrame:
    """Running per-(user, event_type) counts via the v2 stateful API,
    re-emitting every key's full count map each micro-batch."""
    return (stream.groupBy("user_id")
            .transformWithStateInPandas(
                statefulProcessor=_build_processor(),
                outputStructType=OUT_SCHEMA,
                outputMode="Update",
                timeMode="None"))


def run_transform_state_counts(spark: SparkSession, source: DataFrame,
                               work_dir: str, n_chunks: int = 4) -> DataFrame:
    """Bounded end-to-end run (availableNow over file chunks, several
    micro-batches so the cross-batch MapState merge is exercised):
    returns the LAST emitted row per (user, event_type), which — the
    processor only accumulates — must equal the batch
    ``GROUP BY user_id, event_type`` answer."""
    try:
        prev_provider = spark.conf.get(
            "spark.sql.streaming.stateStore.providerClass")
    except Exception:
        prev_provider = None
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", _ROCKSDB)
    src = source.select("user_id", "event_type")
    chunks_dir = os.path.join(work_dir, "chunks")
    src.repartition(n_chunks).write.mode("overwrite").parquet(chunks_dir)
    stream = (spark.readStream.schema(src.schema)
              .option("maxFilesPerTrigger", 1)
              .parquet(chunks_dir))
    out_dir = os.path.join(work_dir, "updates")
    ckpt = os.path.join(work_dir, "ckpt")

    def sink(batch_df, batch_id):
        from pyspark.sql import functions as F
        (batch_df.withColumn("batch_id", F.lit(int(batch_id)))
         .write.mode("append").parquet(out_dir))

    try:
        (transform_state_counts(stream)
         .writeStream.foreachBatch(sink)
         .outputMode("update")
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True)
         .start().awaitTermination())
    finally:
        # restore the session provider — leaking RocksDB onto a shared
        # session breaks later queries with HDFS-backed checkpoints
        if prev_provider is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass",
                           prev_provider)

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    updates = spark.read.parquet(out_dir)
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("batch_id").desc())
    return (updates.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("user_id", "event_type", "n"))
