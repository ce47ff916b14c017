"""Streaming ANN index maintenance: encode arriving vectors with the
FROZEN trained quantizers and append their index rows exactly-once —
the continuous-ingest twin of ``operators/similarity.
build_ann_index_appended`` (the batch FAISS ``add()``), composed with
the manifest storage layer.

Per micro-batch: one nearest-centroid assignment (cell) + one
nearest-code assignment per subspace (codes) against the broadcast
frozen quantizers — zero Lloyd iterations, zero shuffles beyond the
assignment aggregates — then ONE ``append_batch`` publish of the
combined (vec_id, cell, code0..code{m-1}) rows.  Exactly-once
composes from the sink contract exactly as in
``streaming/maintenance.py``: a replayed micro-batch (crash between
manifest publish and streaming-checkpoint commit) no-ops at the
manifest layer, so no vector is ever double-indexed (drill with a
real killed-and-restarted StreamingQuery in tests/test_streaming.py).

At 100 TB/day this is the serving-index ingestion shape: encoding
cost scales with |batch|, the quantizers stay immutable between
(rare, drift-triggered) rebuilds, and the encodings table is an
ordinary manifest table — readable, time-travelable, joinable against
the catalog-committed centroids/codebook at serve time.  The combined
single-table layout (cells+codes in one row) keeps the per-batch
commit to ONE atomic publish; the batch append path uses the
catalog's multi-table pass instead because it appends to the
separately-stored cells/codes artifacts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.similarity import (_assign_cells, _assign_sub,
                                    _codes_wide, _pq_subspaces)
from ..sinks.manifest import ManifestTable


def encode_vectors(vecs: DataFrame, cent: DataFrame,
                   book: DataFrame) -> DataFrame:
    """(vec_id, embedding) → (vec_id, cell, code0..code{m-1}) using
    the FROZEN coarse centroids and residual codebook — the same
    assignment kernels training uses for its final pass, so streamed
    encodings are bit-identical to a batch re-encode."""
    cells = _assign_cells(vecs, cent)
    res = (vecs.select("vec_id", "embedding")
           .join(cells, "vec_id")
           .join(F.broadcast(cent), F.col("cell") == F.col("cid"))
           .select("vec_id",
                   F.zip_with("embedding", "cemb",
                              lambda x, c: x.cast("double") - c)
                   .alias("embedding")))
    staged = (res.select("vec_id", F.explode(_pq_subspaces()).alias("s"))
              .select("vec_id", "s.j", "s.sub"))
    return cells.join(_codes_wide(_assign_sub(staged, book)), "vec_id")


def index_append_writer(spark: SparkSession, table: ManifestTable,
                        cent: DataFrame, book: DataFrame):
    """``new_vectors.writeStream.foreachBatch(index_append_writer(
    spark, tbl, cent, book))`` — maintain the streaming encodings
    table exactly-once.  ``cent``/``book`` should be the
    catalog-committed quantizer artifacts (broadcast-sized)."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        table.append_batch(encode_vectors(batch_df, cent, book),
                           int(batch_id))

    return write
