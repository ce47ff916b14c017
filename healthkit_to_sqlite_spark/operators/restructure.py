"""Restructuring operators (SURVEY.md §2.A analogs on synthetic tables).

The reference's engine is, at heart, four restructurings of streamed
XML rows (reference core.rs):

- table-per-type fan-out of Record rows        (core.rs:311-313, 656-685)
- MetadataEntry key/value → wide columns       (core.rs:452-474, 231-257)
- WorkoutEvent children → ordered JSON array   (core.rs:526, 541-543, 639-642)
- WorkoutStatistics → JSON object keyed by type(core.rs:527, 544-548, 643-646)
- GPX trkpt stream → GeoJSON LineString        (core.rs:588-627)

Each is re-expressed here as a declarative DataFrame op over the
driver's synthetic tables so the DuckDB oracle can check it.  The
HealthKit-shaped ingest pipeline (sources/healthkit.py) composes the
same primitives over real XML.

Ordered-collect determinism: the reference gets ordering for free from
its sequential scan (document order).  Distributed Spark must make the
sort key explicit — we sort collected arrays by an explicit key
(array_sort over struct), which is deterministic under any
partitioning; never rely on collect_list's arrival order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions import dec, dec_sum
from ..spec import Spec

#: Fixed pivot key list — Spark pivot with an explicit value list avoids
#: the extra distinct-collection job, and at 100 TB an *unbounded* pivot
#: is a driver OOM; always pass keys (SURVEY.md §7.4).
EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def partition_by_type(events: DataFrame) -> DataFrame:
    """A4 analog: the reference routes each Record row to a table named
    by its ``type`` attribute (core.rs:311-313).  Query-side analog is a
    per-type aggregate; write-side is ``df.write.partitionBy`` (see
    sinks/).  Map-side partial agg → 5-row shuffle, any scale."""
    return events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        dec_sum("value").alias("sum_value"))


def kv_pivot(events: DataFrame) -> DataFrame:
    """A6 analog: MetadataEntry key/value pairs become wide columns
    (core.rs:452-474).  Here: one column per event_type with the summed
    value per user — groupBy().pivot(explicit keys).agg().

    One shuffle on user_id; the pivot itself is a projection inside the
    aggregate (PivotFirst), not a second shuffle."""
    return (events.groupBy("user_id")
            .pivot("event_type", list(EVENT_TYPES))
            .agg(dec_sum("value")))


def collect_events(lineitem: DataFrame) -> DataFrame:
    """A7 analog: WorkoutEvent children → ordered array per parent
    (core.rs:639-642).  Oracle-comparable form: the ordered line-number
    list rendered as a string (cross-engine array hashing is brittle;
    the string is unambiguous)."""
    arr = F.sort_array(F.collect_list("l_linenumber"))
    return (lineitem.groupBy("l_orderkey")
            .agg(F.concat_ws(",", F.transform(arr, lambda x: x.cast("string")))
                 .alias("line_numbers"),
                 F.count(F.lit(1)).alias("n_lines")))


def collect_stats_map(lineitem: DataFrame) -> DataFrame:
    """A8 analog: WorkoutStatistics children → object keyed by type
    (core.rs:643-646).  Ordered ``k:v`` rendering of the per-order
    linenumber→quantity map; decimal-formatted values so both engines
    print identically."""
    # synthetic lineitem repeats l_linenumber within an order, so the
    # sort key must include the value (numerically) for a total order.
    pair = F.struct(F.col("l_linenumber").alias("k"),
                    F.col("l_quantity").alias("q"),
                    dec("l_quantity").cast("string").alias("v"))
    arr = F.array_sort(F.collect_list(pair))
    rendered = F.concat_ws(
        ",", F.transform(arr, lambda s: F.concat_ws(":", s.k.cast("string"), s.v)))
    return (lineitem.groupBy("l_orderkey")
            .agg(rendered.alias("stats_map"), F.count(F.lit(1)).alias("n_stats")))


def linestring(events: DataFrame) -> DataFrame:
    """A11 analog: GPX track points → LineString geometry
    (core.rs:588-627: ordered [lon,lat] pairs, document order).  Here
    each user's (value, event_id) points ordered by (ts, event_id) —
    explicit total order replaces document order.

    Spark shape: single groupBy(user_id) with array_sort(collect_list(
    struct(sort_key..., payload))) — one shuffle, no window pass."""
    pt = F.struct(F.col("ts"), F.col("event_id"),
                  F.concat_ws(" ", dec("value").cast("string"),
                              F.col("event_id").cast("string")).alias("p"))
    arr = F.array_sort(F.collect_list(pt))
    geom = F.concat(F.lit("LINESTRING("),
                    F.concat_ws("|", F.transform(arr, lambda s: s.p)),
                    F.lit(")"))
    return (events.groupBy("user_id")
            .agg(geom.alias("geometry"), F.count(F.lit(1)).alias("n_points")))


SPECS: dict[str, Spec] = {
    "q_partition_by_type": Spec(
        lambda spark, sf: partition_by_type(load_table(spark, sf, "events")),
        """
        SELECT event_type, COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        FROM events GROUP BY event_type
        """,
        "A4 table-per-type fan-out (reference core.rs:311-313, 656-685)"),
    "q_kv_pivot": Spec(
        lambda spark, sf: kv_pivot(load_table(spark, sf, "events")),
        """
        SELECT user_id,
               CAST(SUM(CASE WHEN event_type='click'    THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS click,
               CAST(SUM(CASE WHEN event_type='error'    THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS error,
               CAST(SUM(CASE WHEN event_type='purchase' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS purchase,
               CAST(SUM(CASE WHEN event_type='signup'   THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS signup,
               CAST(SUM(CASE WHEN event_type='view'     THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS view
        FROM events GROUP BY user_id
        """,
        "A6 key-value pivot (reference core.rs:452-474, 231-257)"),
    "q_collect_events": Spec(
        lambda spark, sf: collect_events(load_table(spark, sf, "lineitem")),
        """
        SELECT l_orderkey,
               STRING_AGG(CAST(l_linenumber AS VARCHAR), ',' ORDER BY l_linenumber) AS line_numbers,
               COUNT(*) AS n_lines
        FROM lineitem GROUP BY l_orderkey
        """,
        "A7 ordered nested-array aggregation (reference core.rs:639-642)"),
    "q_collect_stats_map": Spec(
        lambda spark, sf: collect_stats_map(load_table(spark, sf, "lineitem")),
        """
        SELECT l_orderkey,
               STRING_AGG(l_linenumber || ':' ||
                          CAST(CAST(l_quantity AS DECIMAL(18,2)) AS VARCHAR),
                          ',' ORDER BY l_linenumber, l_quantity) AS stats_map,
               COUNT(*) AS n_stats
        FROM lineitem GROUP BY l_orderkey
        """,
        "A8 nested map aggregation (reference core.rs:643-646)"),
    "q_linestring": Spec(
        lambda spark, sf: linestring(load_table(spark, sf, "events")),
        """
        SELECT user_id,
               'LINESTRING(' ||
               STRING_AGG(CAST(CAST(value AS DECIMAL(18,2)) AS VARCHAR) || ' ' ||
                          CAST(event_id AS VARCHAR),
                          '|' ORDER BY ts, event_id) || ')' AS geometry,
               COUNT(*) AS n_points
        FROM events GROUP BY user_id
        """,
        "A11 GPX→LineString assembly (reference core.rs:588-627)"),
}
