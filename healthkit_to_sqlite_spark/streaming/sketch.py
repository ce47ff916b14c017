"""Streaming Count-Min sketch maintenance: keep the d×w frequency
matrix incrementally up to date from a document stream — the sketch
analog of ``streaming/moments.py`` (covariance) and the streaming
proof of the CMS mergeability claim in ``operators/pipeline.py``:
integer cell counts sum associatively and order-independently, so
folding per-batch sketches into the stored artifact yields a matrix
BIT-IDENTICAL to the one-shot batch sketch over the union — pinned in
tests/test_streaming.py through the same kill-and-resume drill as the
covariance maintenance.

Per micro-batch cost: the batch's own ≤ d·w-row sketch (map-side
combined), folded into the ≤ d·w-row artifact — the whole state is
~1024 integers no matter how much text has streamed through, which is
the operating point for a corpus-frequency monitor over a 100 TB/day
ingest: heavy-token estimates stay queryable at any moment without
rescanning history, and the same artifact merges across independent
ingest pipelines (region/shard) by one more fold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import one_slice_df
from ..operators.pipeline import CMS_D, CMS_W, _cms_cell, cms_sketch
from ..sinks.manifest import ManifestTable


def _fold(head: DataFrame, partial: DataFrame) -> DataFrame:
    if not head.columns:
        return partial
    return (head.unionByName(partial)
            .groupBy("r", "c")
            .agg(F.sum("n").cast("long").alias("n")))


def cms_writer(spark: SparkSession, table: ManifestTable,
               d: int = CMS_D, w: int = CMS_W):
    """``docs.writeStream.foreachBatch(cms_writer(spark, tbl))`` —
    exactly-once incremental Count-Min maintenance (fold inside the
    commit-retry loop; replayed batches no-op at the manifest)."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        table.fold_batch(spark, cms_sketch(batch_df, d, w), _fold,
                         int(batch_id))

    return write


def read_estimates(spark: SparkSession, table: ManifestTable,
                   tokens: list[str], d: int = CMS_D,
                   w: int = CMS_W) -> DataFrame:
    """Point-frequency estimates for ``tokens`` from the maintained
    artifact: same cells, same min-over-rows as the batch probe —
    missing cells read as 0 (a token never streamed past estimates
    to exactly zero, CMS's one-sided-error floor) — including the
    never-folded artifact, whose zero-column read short-circuits to
    all-zero estimates."""
    probes = one_slice_df(spark, [(t,) for t in tokens], "token string")
    art = table.read(spark)
    if not art.columns:
        return (probes.select("token", F.lit(0).cast("bigint")
                              .alias("cms_n")).orderBy("token"))
    pr = probes.select(
        "token",
        F.explode(F.array(*[F.lit(r) for r in range(d)])).alias("r"))
    cells = pr.select("token", "r",
                      _cms_cell(F.col("r"), F.col("token"), w).alias("c"))
    return (cells.join(F.broadcast(art), ["r", "c"], "left")
            .groupBy("token")
            .agg(F.min(F.coalesce(F.col("n"), F.lit(0))).alias("cms_n"))
            .orderBy("token"))
