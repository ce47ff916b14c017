"""User-defined extension surface: UDTF, pandas UDAF, ml LSH.

The reference has no UDF surface at all (SQLite built-ins only,
reference README.md:27-110); Spark's three extension points are pinned
here so the engine demonstrably supports them — each with the honest
scale caveat in its docstring:

- Python UDTF (lateral table function): row-at-a-time Python — the
  SLOWEST extension point; exists for API parity and for logic that
  genuinely must emit a variable number of rows from driver-opaque
  code.  The same chunking below is expressible with builtin
  sequence/explode (the production shape, cf. dedup.word_shingles).
- pandas GROUPED_AGG UDAF: Arrow-batched per-group numpy reduction —
  the right escape hatch when the aggregate has no builtin (here:
  interpolated median, which Spark DOES have as percentile(); the
  oracle proves the UDAF agrees with the engine-native path).
- pyspark.ml BucketedRandomProjectionLSH: library Euclidean LSH for
  embedding ANN — the scale path alongside our hand-rolled sign-LSH /
  IVF (similarity.py); ml hashing isn't reproducible in SQL → rows-only.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..spec import Spec

CHUNK = 10  # tokens per UDTF chunk


def chunk_sentences(spark: SparkSession, documents: DataFrame,
                    chunk: int = CHUNK) -> DataFrame:
    """Python UDTF splitting each document into fixed-size token chunks
    (doc_id, chunk_id, chunk, n_tok) — a lateral table function fed by
    a correlated subquery.  Row-at-a-time Python: fine for API parity,
    wrong for 100 TB (use the builtin sequence/slice explode instead —
    same output, whole-stage codegen)."""
    from pyspark.sql.functions import lit, udtf  # noqa: F401

    # chunk size rides in as a SQL argument rather than a closure
    # capture, and the input frame as a spark.sql template arg rather
    # than a named temp view (ADVICE r4: session-global view names +
    # state-captured registrations collide across concurrent callers
    # in one session — same fix as khop_reachability, commit 89620ed).
    # With no captured state, the global registration is idempotent.
    @udtf(returnType="doc_id bigint, chunk_id int, chunk string, n_tok int")
    class ChunkDoc:
        def eval(self, doc_id: int, text: str, size: int):  # noqa: D401
            toks = text.split(" ")
            for i in range(0, len(toks), size):
                part = toks[i:i + size]
                yield doc_id, i // size, " ".join(part), len(part)

    spark.udtf.register("chunk_doc", ChunkDoc)
    return spark.sql(
        "SELECT c.* FROM {docs} AS d, "
        f"LATERAL chunk_doc(d.doc_id, d.text, {int(chunk)}) AS c",
        docs=documents.select("doc_id", "text"))


def chunk_sentences_arrow(spark: SparkSession, documents: DataFrame,
                          chunk: int = CHUNK) -> DataFrame:
    """Arrow-optimized twin of :func:`chunk_sentences`
    (``@udtf(useArrow=True)``, Spark 4): identical per-row generator
    semantics, but inputs/outputs cross the Python boundary as Arrow
    RecordBatches instead of pickled rows — the batched transfer that
    makes a Python table function survivable in a hot path.  Same
    oracle as ``q_udtf_chunks``; together the pair pins BOTH UDTF
    transports, and the builtin sequence/slice explode
    (text.chunk_overlap) remains the true 100 TB shape."""
    from pyspark.sql.functions import udtf

    # same concurrency discipline as chunk_sentences: chunk size as a
    # SQL argument, frame as a template arg, no temp view
    @udtf(returnType="doc_id bigint, chunk_id int, chunk string, n_tok int",
          useArrow=True)
    class ChunkDocArrow:
        def eval(self, doc_id: int, text: str, size: int):  # noqa: D401
            toks = text.split(" ")
            for i in range(0, len(toks), size):
                part = toks[i:i + size]
                yield doc_id, i // size, " ".join(part), len(part)

    spark.udtf.register("chunk_doc_arrow", ChunkDocArrow)
    return spark.sql(
        "SELECT c.* FROM {docs} AS d, "
        f"LATERAL chunk_doc_arrow(d.doc_id, d.text, {int(chunk)}) AS c",
        docs=documents.select("doc_id", "text"))


POLY_N = 3  # leading tokens the polymorphic UDTF widens into columns


def leading_tokens_poly(spark: SparkSession, documents: DataFrame,
                        n: int = POLY_N) -> DataFrame:
    """POLYMORPHIC Python UDTF (Spark 4 ``analyze`` API — the third and
    last UDTF extension point after pickled-row and Arrow transport):
    the output schema is computed at PLAN TIME from the constant
    argument ``n``, widening each document's first ``n`` tokens into
    ``tok0..tok{n-1}`` columns.  Schema-from-arguments is what static
    ``returnType`` UDTFs cannot express — the dynamic-width analog of
    pivot's explicit values list.  Missing tokens yield NULL (matching
    SQL list indexing, not '').  Row-at-a-time Python: an API pin;
    the builtin split()+getItem projection is the 100 TB shape."""
    from pyspark.sql.functions import udtf
    from pyspark.sql.types import LongType, StringType, StructType
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    @udtf
    class LeadingTokens:
        @staticmethod
        def analyze(doc_id: AnalyzeArgument, text: AnalyzeArgument,
                    n_arg: AnalyzeArgument) -> AnalyzeResult:
            if not isinstance(n_arg.value, int) or n_arg.value < 1:
                raise ValueError("n must be a constant positive int")
            schema = StructType().add("doc_id", LongType())
            for i in range(n_arg.value):
                schema = schema.add(f"tok{i}", StringType())
            return AnalyzeResult(schema=schema)

        def eval(self, doc_id: int, text: str, n_arg: int):
            toks = text.split(" ")
            yield (doc_id,
                   *[toks[i] if i < len(toks) else None
                     for i in range(n_arg)])

    # ADVICE r4: the named temp view was session-global state that
    # collided across concurrent callers; the frame now rides in as a
    # spark.sql template arg.  The UDTF registration itself captures
    # no state (n is a plan-time SQL argument the analyze() method
    # reads), so the global name is re-registration-safe.
    spark.udtf.register("leading_tokens", LeadingTokens)
    return spark.sql(
        "SELECT t.* FROM {docs} AS d, "
        f"LATERAL leading_tokens(d.doc_id, d.text, {int(n)}) AS t",
        docs=documents.select("doc_id", "text"))


def grouped_median_udaf(lineitem: DataFrame) -> DataFrame:
    """pandas GROUPED_AGG UDAF: per-group interpolated median via
    numpy, Arrow-batched.  The oracle (quantile_cont) proves the UDAF
    path agrees with the engine-native order statistic — the agreement
    contract you want before trusting custom aggregates at scale."""
    from pyspark.sql.functions import pandas_udf

    # Spark-4 type-hinted form: Series → scalar ⇒ GROUPED_AGG (string
    # annotations from `from __future__ import annotations` resolve
    # fine — pd is a module-level import)
    @pandas_udf("double")
    def np_median(v: pd.Series) -> float:
        import numpy as np
        return float(np.median(v.to_numpy()))

    # Spark refuses to mix GROUPED_AGG pandas UDFs with JVM aggregates
    # in one agg, so the count is a second pandas aggregate
    @pandas_udf("long")
    def np_count(v: pd.Series) -> int:
        return len(v)

    return (lineitem
            .groupBy("l_returnflag")
            .agg(F.round(np_median("l_extendedprice"), 4).alias("median_price"),
                 np_count("l_extendedprice").alias("n")))


def ann_brp_lsh(embeddings: DataFrame, threshold: float = 1.2) -> DataFrame:
    """Embedding ANN via pyspark.ml BucketedRandomProjectionLSH
    (Euclidean): random-projection bucketing turns the O(n²) pair
    search into bucket joins, like our hand-rolled sign-LSH but with
    library-grade multi-table amplification.  Hashing is seeded but
    not SQL-reproducible → rows-only correctness check."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    feats = embeddings.select(
        "vec_id", array_to_vector(F.col("embedding")).alias("features"))
    lsh = BucketedRandomProjectionLSH(inputCol="features", outputCol="hashes",
                                      bucketLength=0.5, numHashTables=3,
                                      seed=42)
    model = lsh.fit(feats)
    pairs = model.approxSimilarityJoin(feats, feats, threshold,
                                       distCol="l2_dist")
    return (pairs
            .filter(F.col("datasetA.vec_id") < F.col("datasetB.vec_id"))
            .select(F.col("datasetA.vec_id").alias("vec_a"),
                    F.col("datasetB.vec_id").alias("vec_b"),
                    F.round("l2_dist", 6).alias("l2_dist")))


def cogroup_attribution(events: DataFrame) -> DataFrame:
    """Cogrouped-pandas surface pin: per-user purchase→last-click
    attribution via ``groupBy().cogroup().applyInPandas`` running
    ``pd.merge_asof`` on each (purchases, clicks) group pair.

    The cogroup is the fourth pandas extension point (scalar / grouped
    map / grouped agg are pinned elsewhere): Spark shuffles BOTH sides
    by the group key and hands each key's two frames to one Arrow
    batch — the natural home for per-entity stream alignment that
    needs imperative pandas semantics.  Scale shape: one co-shuffle on
    user_id, group-local O(n log n) sorts, no driver involvement;
    skewed users are the caveat (a single user's pair must fit one
    task).  The engine-native equivalent is timeseries.asof_join
    (union + last-over-window) — this pins API parity and proves the
    two strategies agree with one SQL oracle.

    Known cost profile: grouped-map Python ops pay a per-GROUP Arrow
    round-trip, so many tiny groups are the worst case — and AQE's
    partition coalescing makes it worse by shrinking the tiny shuffle
    to ONE partition, serializing every group through a single Python
    worker (measured at sf0.1: 12.8s coalesced vs 3.9s at 32
    partitions with the same kernel).  That interaction — AQE
    optimizes for JVM operators and is blind to Python per-group
    cost — is exactly why the engine-native asof_join stays the
    production path and this stays the API pin."""
    ev = events.select("user_id", "event_id", "ts", "event_type")
    purchases = ev.filter(F.col("event_type") == "purchase")
    clicks = ev.filter(F.col("event_type") == "click")

    schema = ("user_id bigint, purchase_id bigint, purchase_ts timestamp_ntz, "
              "click_id bigint, gap_s double")

    def merge(left, right):
        # lean numpy kernel, NOT pd.merge_asof: with many small groups
        # the per-group pandas machinery dominates (measured at sf0.1,
        # 1500 groups / 20k purchases: merge_asof 3.9s vs searchsorted
        # 1.3s at 32 partitions).  Semantics identical — right sorted
        # (ts, event_id) ascending, searchsorted 'right' − 1 = last
        # click ≤ purchase ts, ties → max event_id, no click → NULL.
        import numpy as np
        import pandas as pd

        lt = left["ts"].to_numpy()
        lorder = np.lexsort((left["event_id"].to_numpy(), lt))
        lt = lt[lorder]
        pid = left["event_id"].to_numpy()[lorder]
        uid = left["user_id"].to_numpy()[lorder]
        n = len(lt)
        if len(right):
            rt = right["ts"].to_numpy()
            rorder = np.lexsort((right["event_id"].to_numpy(), rt))
            rt = rt[rorder]
            rid = right["event_id"].to_numpy()[rorder]
            idx = np.searchsorted(rt, lt, side="right") - 1
            has = idx >= 0
            safe = np.clip(idx, 0, None)
            click = pd.array(rid[safe], dtype="Int64")
            click[~has] = pd.NA
            gap = (lt - rt[safe]) / np.timedelta64(1, "s")
            gap = np.where(has, gap, np.nan)
        else:
            click = pd.array([pd.NA] * n, dtype="Int64")
            gap = np.full(n, np.nan)
        return pd.DataFrame({
            "user_id": uid,
            "purchase_id": pid,
            "purchase_ts": lt,
            "click_id": click,
            "gap_s": gap,
        })

    return (purchases.groupBy("user_id")
            .cogroup(clicks.groupBy("user_id"))
            .applyInPandas(merge, schema))


_CHUNKS_ORACLE = f"""
        SELECT doc_id,
               CAST(k.k AS INT) AS chunk_id,
               array_to_string((string_split(text, ' '))[k.k * {CHUNK} + 1
                                                         :k.k * {CHUNK} + {CHUNK}],
                               ' ') AS chunk,
               CAST(least({CHUNK}, len(string_split(text, ' ')) - k.k * {CHUNK})
                    AS INT) AS n_tok
        FROM documents,
             -- correlated bound: the generator covers every chunk of
             -- the LONGEST document (a hardcoded cap silently narrowed
             -- verification for docs over cap*CHUNK tokens)
             (SELECT unnest(range((SELECT max(len(string_split(text, ' ')))
                                   FROM documents) // {CHUNK} + 1)) AS k) k
        WHERE k.k * {CHUNK} < len(string_split(text, ' '))
        """

SPECS: dict[str, Spec] = {
    "q_udtf_chunks": Spec(
        lambda spark, sf: chunk_sentences(
            spark, load_table(spark, sf, "documents")),
        _CHUNKS_ORACLE,
        "Python UDTF lateral chunking (UDF surface; builtin explode is the scale path)"),
    "q_udtf_chunks_arrow": Spec(
        lambda spark, sf: chunk_sentences_arrow(
            spark, load_table(spark, sf, "documents")),
        _CHUNKS_ORACLE,
        "Arrow-optimized Python UDTF (useArrow=True): same lateral "
        "chunking, Arrow-batched Python boundary — the survivable UDTF "
        "transport"),
    "q_udtf_poly": Spec(
        lambda spark, sf: leading_tokens_poly(
            spark, load_table(spark, sf, "documents")),
        f"""
        SELECT doc_id,
               {", ".join(f"(string_split(text, ' '))[{i + 1}] AS tok{i}"
                          for i in range(POLY_N))}
        FROM documents
        """,
        "polymorphic Python UDTF (analyze API): output schema computed "
        "at plan time from the constant argument — the third UDTF "
        "transport/extension pin (builtin split projection is the "
        "scale path)"),
    "q_udaf_median": Spec(
        lambda spark, sf: grouped_median_udaf(load_table(spark, sf, "lineitem")),
        """
        SELECT l_returnflag,
               ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS median_price,
               COUNT(*) AS n
        FROM lineitem GROUP BY l_returnflag
        """,
        "pandas GROUPED_AGG UDAF vs engine-native order statistic"),
    "q_cogroup_asof": Spec(
        lambda spark, sf: cogroup_attribution(load_table(spark, sf, "events")),
        """
        WITH p AS (SELECT user_id, event_id, ts FROM events
                   WHERE event_type = 'purchase'),
             c AS (SELECT user_id, event_id, ts FROM events
                   WHERE event_type = 'click'),
             j AS (
               SELECT p.user_id, p.event_id AS purchase_id, p.ts AS purchase_ts,
                      c.event_id AS click_id, c.ts AS click_ts,
                      ROW_NUMBER() OVER (PARTITION BY p.event_id
                          ORDER BY c.ts DESC, c.event_id DESC) AS rn
               FROM p LEFT JOIN c
                 ON c.user_id = p.user_id AND c.ts <= p.ts)
        SELECT user_id, purchase_id,
               strptime(strftime(purchase_ts, '%Y-%m-%d %H:%M:%S.%f'),
                        '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts,
               click_id,
               CAST(date_sub('microsecond', click_ts, purchase_ts) AS DOUBLE)
                 / 1000000 AS gap_s
        FROM j WHERE rn = 1
        """,
        "cogrouped applyInPandas (merge_asof attribution) — pandas "
        "cogroup API pin; same oracle family as q_asof_join"),
    "q_ann_brp": Spec(
        lambda spark, sf: ann_brp_lsh(load_table(spark, sf, "embeddings")),
        None,  # ml random projections not SQL-reproducible — rows-only
        "pyspark.ml BucketedRandomProjectionLSH embedding ANN (scale path)"),
}
