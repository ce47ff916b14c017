"""Relational query surface (SURVEY.md §2.B) + the flagship query.

The reference delegates all querying to SQLite/Datasette; its README
defines the required surface (reference README.md:27-110): scans,
BETWEEN range filters, OR-of-equality filters, arithmetic projections,
SUM aggregation, grouped aggregation, json_extract, date comparison,
sort/limit, and cross-table joins.  Each is a pure DataFrame operator
here, expressed declaratively so Catalyst gets predicate pushdown,
column pruning and join planning for free.

Scale notes per operator are inline.  General rules honored here:
- filters sit directly on base scans → parquet PushedFilters;
- aggregates use exact decimal accumulation (functions.dec_sum) so
  results are reproducible run-to-run regardless of partitioning;
- small-dimension joins are explicitly broadcast();
- top-k uses orderBy+limit which Spark executes as per-partition
  TakeOrdered (no global sort shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions import DEC, dec, dec_avg, dec_sum, revenue
from ..spec import Spec

# ---------------------------------------------------------------------------
# Flagship (Milestone 0): the Spark translation of the reference's
# README.md:33-46 "total workout duration by type, in a date range,
# for selected types" onto the synthetic star schema: filter + IN +
# join + grouped SUM with arithmetic.  Exercises B1-B6 + A10/B10.
# ---------------------------------------------------------------------------

FLAGSHIP_DATE_LO = "1996-01-01 00:00:00"
FLAGSHIP_DATE_HI = "1997-12-31 23:59:59"
FLAGSHIP_PRIORITIES = ("1-URGENT", "2-HIGH")


def flagship(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """Revenue & volume per order priority over a date window.

    Mirrors reference README.md:33-46 (`sum(duration)/60 … WHERE
    creationDate BETWEEN … AND (workoutActivityType = … OR …) GROUP
    BY`): the BETWEEN filter, the OR-of-equalities (as isin), the
    arithmetic aggregate, and the grouped SUM — run through a join.

    Scale: both filters are on `orders` and push to the parquet scan
    before the join; the join shuffles on l_orderkey/o_orderkey (the
    natural co-partition key — at 100 TB both sides would be bucketed
    on orderkey making this shuffle-free); aggregation is partial →
    final (map-side combine) on a low-cardinality key (5 priorities),
    so the final shuffle is tiny.
    """
    o = orders.filter(
        F.col("o_orderdate").between(
            F.lit(FLAGSHIP_DATE_LO).cast("timestamp_ntz"),
            F.lit(FLAGSHIP_DATE_HI).cast("timestamp_ntz"))
        & F.col("o_orderpriority").isin(*FLAGSHIP_PRIORITIES))
    j = lineitem.join(o, lineitem.l_orderkey == o.o_orderkey)
    return (
        j.groupBy("o_orderpriority")
        .agg(
            F.countDistinct("o_orderkey").alias("n_orders"),
            dec_sum("l_quantity").alias("sum_qty"),
            F.sum(revenue()).cast("double").alias("revenue"),
        )
    )


FLAGSHIP_ORACLE = f"""
SELECT o_orderpriority,
       COUNT(DISTINCT o_orderkey) AS n_orders,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE o_orderdate BETWEEN TIMESTAMP '{FLAGSHIP_DATE_LO}' AND TIMESTAMP '{FLAGSHIP_DATE_HI}'
  AND o_orderpriority IN ('1-URGENT', '2-HIGH')
GROUP BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# B2 — BETWEEN range filter (reference README.md:39-41)
# ---------------------------------------------------------------------------

def filter_between(orders: DataFrame) -> DataFrame:
    """Range predicate on the date column; pushed to the parquet scan
    (min/max row-group pruning at scale)."""
    return orders.select("o_orderkey", "o_totalprice", "o_orderdate").filter(
        F.col("o_orderdate").between(
            F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"),
            F.lit("1997-12-31 23:59:59").cast("timestamp_ntz")))


# ---------------------------------------------------------------------------
# B3 — boolean OR of equality predicates (reference README.md:42-46)
# ---------------------------------------------------------------------------

def filter_or_isin(orders: DataFrame) -> DataFrame:
    """(c = a OR c = b) expressed as isin — Catalyst emits an IN-set
    predicate that pushes down to parquet dictionary filters."""
    return orders.select("o_orderkey", "o_orderpriority", "o_orderstatus").filter(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"))


# ---------------------------------------------------------------------------
# B4 — expression projection with arithmetic + alias (README.md:34-35)
# ---------------------------------------------------------------------------

def project_arith(lineitem: DataFrame) -> DataFrame:
    """Per-row arithmetic stays bit-identical across engines because the
    expression tree (and thus IEEE op order) is identical."""
    return lineitem.select(
        "l_orderkey", "l_linenumber",
        (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
         * (F.lit(1.0) + F.col("l_tax"))).alias("charge"),
        (F.col("l_quantity") / F.lit(60.0)).alias("qty_per_min"))


# ---------------------------------------------------------------------------
# B5 — ungrouped SUM (README.md:33-46, 51-65)
# ---------------------------------------------------------------------------

def agg_sum(lineitem: DataFrame) -> DataFrame:
    """Global aggregate; Spark runs partial aggregation per partition
    then a single-row final — no data-size-proportional shuffle."""
    return lineitem.agg(
        dec_sum("l_quantity").alias("sum_qty"),
        dec_sum("l_extendedprice").alias("sum_price"),
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("l_orderkey").alias("n_orders"))


# ---------------------------------------------------------------------------
# B6 — grouped aggregation (TPC-H Q1 shape; README.md:96-105 facets)
# ---------------------------------------------------------------------------

def group_agg(lineitem: DataFrame) -> DataFrame:
    """Pricing-summary aggregate: grouped sums/averages/counts with
    exact decimal accumulation. Low-cardinality keys → tiny shuffle
    after map-side combine, independent of input size."""
    return (
        lineitem.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dec_sum("l_quantity").alias("sum_qty"),
            dec_sum("l_extendedprice").alias("sum_base_price"),
            F.sum(revenue()).cast("double").alias("sum_disc_price"),
            dec_avg("l_quantity").alias("avg_qty"),
            dec_avg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# B7 — JSON path extraction (reference README.md:52-58: json_extract)
# ---------------------------------------------------------------------------

def json_extract_k(events: DataFrame) -> DataFrame:
    """``json_extract(props, '$.k')`` analog via get_json_object, plus a
    grouped rollup over the extracted value. JSON parse happens once in
    the projection; at scale prefer materializing extracted columns."""
    k = F.get_json_object(F.col("props"), "$.k").cast("bigint")
    return (
        events.select("event_id", "event_type", k.alias("k"))
        .filter(F.col("k").isNotNull())
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum("k").alias("sum_k"),
             F.max("k").alias("max_k"))
    )


def variant_extract_k(events: DataFrame) -> DataFrame:
    """B7 via the VARIANT type (Spark 4): ``parse_json`` once into a
    binary variant, then typed path extraction with ``try_variant_get``
    — the modern engine answer to the reference's SQLite
    ``json_extract`` delegation (README.md:52-58).

    Vs. ``get_json_object`` (q_json_extract): the variant encodes the
    parsed structure ONCE; N path extractions reuse it instead of
    re-parsing the text N times, and at scale a variant column stored
    in parquet supports shredded columnar access.  ``try_variant_get``
    on a missing path yields NULL (counted here to pin the semantics)
    rather than erroring."""
    v = F.parse_json(F.col("props"))
    k = F.try_variant_get(v, "$.k", "bigint")
    missing = F.try_variant_get(v, "$.not_there", "string")
    return (events
            .select("event_type", k.alias("k"), missing.alias("m"))
            .filter(F.col("k").isNotNull())
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("k").alias("sum_k"),
                 F.max("k").alias("max_k"),
                 F.count("m").alias("n_missing")))


# ---------------------------------------------------------------------------
# B8 — date/timestamp parse & parts (reference core.rs:13-19 formats)
# ---------------------------------------------------------------------------

def date_parse(events: DataFrame) -> DataFrame:
    """Round-trip the reference's timestamp text format (core.rs:13-16,
    sans zone offset — zone-offset parsing is exercised in the HealthKit
    ingest tests): format → parse → extract parts."""
    s = F.date_format("ts", "yyyy-MM-dd HH:mm:ss")
    parsed = F.to_timestamp(s, "yyyy-MM-dd HH:mm:ss").cast("timestamp_ntz")
    return events.select(
        "event_id",
        parsed.alias("parsed_ts"),
        F.year(parsed).alias("y"),
        F.month(parsed).alias("m"),
        F.dayofmonth(parsed).alias("d"),
        F.hour(parsed).alias("h"))


# ---------------------------------------------------------------------------
# B9 — sort / limit (Datasette paging, README.md:96-101)
# ---------------------------------------------------------------------------

def topk_orders(orders: DataFrame, k: int = 100) -> DataFrame:
    """Top-k by price, tie-broken by key for determinism.  Spark plans
    orderBy+limit as TakeOrderedAndProject: per-partition heap-k then a
    driver merge of k·P rows — no global sort, scales to any input."""
    return (orders
            .select("o_orderkey", "o_custkey", "o_totalprice")
            .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
            .limit(k))


# ---------------------------------------------------------------------------
# B10/A10 — equi-join (reference's workout⋈route zip lookup, core.rs:556-633,
# re-expressed as a declarative join; README.md:96-105 cross-table use)
# ---------------------------------------------------------------------------

def customer_order_join(customer: DataFrame, orders: DataFrame, nation: DataFrame) -> DataFrame:
    """Two-level equi-join with an explicitly broadcast dimension.

    The reference's route join is a per-row nested-loop lookup into the
    zip archive (core.rs:580-582); the Spark-native form is a broadcast
    hash join against the small side — per-row O(1) hash probes, zero
    shuffle of the big side.  `nation` (25 rows) is broadcast; at 100 TB
    `customer` would also be bucketed on c_custkey to co-locate with
    orders."""
    enriched = customer.join(F.broadcast(nation),
                             customer.c_nationkey == nation.n_nationkey)
    j = orders.join(enriched, orders.o_custkey == enriched.c_custkey)
    return (
        j.groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n_orders"),
             dec_sum("o_totalprice").alias("total_price"))
    )


# ---------------------------------------------------------------------------
# Additions beyond the reference (SURVEY.md §2.B honest-gaps list):
# window/ranking, set ops, rollup, semi/anti joins — justified by the
# driver's north star; the reference has no analog (noted per SURVEY).
# ---------------------------------------------------------------------------

def window_rank(orders: DataFrame, per_cust_k: int = 3) -> DataFrame:
    """Ranking window: top-N orders per customer (row_number over a
    partitioned ordered window). Shuffles once on o_custkey; skewed
    customers are handled by AQE skew splitting at scale."""
    from pyspark.sql import Window
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (orders
            .select("o_custkey", "o_orderkey", "o_totalprice",
                    F.row_number().over(w).alias("rn"))
            .filter(F.col("rn") <= per_cust_k))


def set_ops(orders: DataFrame) -> DataFrame:
    """UNION / INTERSECT / EXCEPT over customer key sets, tagged.

    Spark plans INTERSECT/EXCEPT as aggregate+semi/anti-join; keys
    shuffle once per op."""
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    high = orders.filter(F.col("o_orderpriority") == "2-HIGH").select("o_custkey")
    both = urgent.intersect(high).withColumn("tag", F.lit("both"))
    only_urgent = urgent.subtract(high).withColumn("tag", F.lit("urgent_only"))
    either = urgent.union(high).distinct().withColumn("tag", F.lit("either"))
    return both.unionByName(only_urgent).unionByName(either)


def semi_anti(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """EXISTS / NOT EXISTS as left_semi / left_anti joins (no row
    multiplication, build side only carries the key)."""
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT")
    with_urgent = (customer.join(urgent, customer.c_custkey == urgent.o_custkey, "left_semi")
                   .withColumn("tag", F.lit("has_urgent")))
    without = (customer.join(orders, customer.c_custkey == orders.o_custkey, "left_anti")
               .withColumn("tag", F.lit("no_orders")))
    return with_urgent.select("c_custkey", "c_mktsegment", "tag").unionByName(
        without.select("c_custkey", "c_mktsegment", "tag"))


def cube_agg(orders: DataFrame) -> DataFrame:
    """CUBE grouping-sets aggregate — all 4 subtotal combinations in a
    single shuffle pass (Spark expands grouping sets map-side)."""
    return (orders
            .cube("o_orderpriority", "o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"),
                 dec_sum("o_totalprice").alias("total"))
            .select(
                F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
                F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
                "n", "total"))


def approx_distinct(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """Approximate aggregates (HyperLogLog++): the constant-memory
    distinct-count path for 100 TB cardinality estimation.  The sketch
    is engine-specific, so this is a rows-only check; the exact
    counterpart it approximates is oracle-checked in q_agg_sum /
    q_flagship."""
    return (lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.approx_count_distinct("l_partkey").alias("approx_parts"),
                 F.approx_count_distinct("o_custkey").alias("approx_custs"),
                 F.count(F.lit(1)).alias("n_rows")))


def rollup_agg(orders: DataFrame) -> DataFrame:
    """ROLLUP grouping-sets aggregate (priority × status hierarchy).
    Spark expands grouping sets in a single shuffle pass."""
    return (orders
            .rollup("o_orderpriority", "o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"),
                 dec_sum("o_totalprice").alias("total"))
            .select(
                F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
                F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
                "n", "total"))


def percentiles(lineitem: DataFrame) -> DataFrame:
    """Exact percentiles (linear interpolation) per group — the
    order-statistics surface.  Spark's percentile() sorts within the
    aggregate buffer; for 100 TB you'd reach for approx_percentile
    (t-digest sketch, mergeable, constant memory) and accept bounded
    error — both shapes ship here (q_approx_distinct pins the sketch
    family's rows-only contract)."""
    return (lineitem
            .groupBy("l_returnflag")
            .agg(F.round(F.percentile("l_extendedprice", F.lit(0.5)), 4)
                 .alias("median_price"),
                 F.round(F.percentile("l_extendedprice", F.lit(0.9)), 4)
                 .alias("p90_price"),
                 F.count(F.lit(1)).alias("n")))


def histogram(lineitem: DataFrame, width: float = 5000.0) -> DataFrame:
    """Fixed-width histogram by integer bin index — the constant-memory
    distribution sketch: one groupBy on a derived low-cardinality key,
    partial-aggregated map-side, no sort anywhere."""
    bin_ = F.floor(F.col("l_extendedprice") / width).cast("bigint")
    return (lineitem
            .groupBy(bin_.alias("bin"))
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.min("l_extendedprice"), 2).alias("lo"),
                 F.round(F.max("l_extendedprice"), 2).alias("hi")))


def full_outer(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """FULL OUTER join of the customer dimension against per-customer
    order rollups: both null sides survive (customers without orders,
    order keys outside the dimension).  The pre-join aggregate shrinks
    the fact side to one row per key BEFORE the join — at scale you
    always aggregate-then-outer-join, never outer-join raw facts."""
    per_cust = (orders.groupBy("o_custkey")
                .agg(F.count(F.lit(1)).alias("n_orders"),
                     dec_sum("o_totalprice").alias("total_spend")))
    bal = customer.filter(F.col("c_acctbal") > 9000) \
                  .select("c_custkey", "c_mktsegment")
    j = bal.join(per_cust, bal.c_custkey == per_cust.o_custkey, "full_outer")
    return j.select(
        F.coalesce("c_custkey", "o_custkey").alias("custkey"),
        F.coalesce("c_mktsegment", F.lit("UNKNOWN")).alias("segment"),
        F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
        F.coalesce("total_spend", F.lit(0.0)).alias("total_spend"))


def moving_avg(orders: DataFrame, frame: int = 3) -> DataFrame:
    """Window-frame aggregation: per-customer moving average of order
    totals over the last ``frame``+1 orders (ROWS BETWEEN n PRECEDING
    AND CURRENT ROW).  One o_custkey shuffle; the frame is computed by
    a single WindowExec pass over each sorted partition.  Decimal
    accumulation inside the frame keeps the average bit-exact across
    engines (double window-SUM would be order-sensitive)."""
    from pyspark.sql import Window
    w = (Window.partitionBy("o_custkey")
         .orderBy("o_orderdate", "o_orderkey")
         .rowsBetween(-frame, 0))
    avg = (F.sum(dec("o_totalprice")).over(w)
           / F.count(F.lit(1)).over(w)).cast("double")
    return orders.select("o_custkey", "o_orderkey", "o_totalprice",
                         F.round(avg, 6).alias("moving_avg"))


def unpivot_measures(lineitem: DataFrame) -> DataFrame:
    """UNPIVOT (wide→long melt) of the lineitem measure columns.
    Spark plans Expand — one scan emitting 4 rows per input, no
    shuffle, no UNION-of-scans re-read; the selective filter still
    pushes down to the single parquet scan."""
    return (lineitem
            .filter(F.col("l_quantity") >= 45)
            .unpivot(["l_orderkey", "l_linenumber"],
                     ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
                     "measure", "val"))


def correlated_scalar(spark: SparkSession, orders: DataFrame) -> DataFrame:
    """Correlated scalar subquery through the SQL entry path: orders
    whose total exceeds 1.5× their customer's average.  Catalyst
    de-correlates into an aggregate + join (no per-row re-execution —
    the rewrite that makes correlated subqueries viable at scale).
    The comparison is cross-multiplied into exact decimal×count form
    so no engine ever divides (2·price·n > 3·sum ⇔ price > 1.5·avg)."""
    orders.createOrReplaceTempView("orders_v")
    return spark.sql("""
        SELECT o_custkey, o_orderkey, o_totalprice
        FROM orders_v o
        WHERE 2 * CAST(o_totalprice AS DECIMAL(18,2))
                * (SELECT COUNT(*) FROM orders_v o2
                   WHERE o2.o_custkey = o.o_custkey)
              > 3 * (SELECT SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                     FROM orders_v o2 WHERE o2.o_custkey = o.o_custkey)
    """)


def grouping_sets_agg(spark: SparkSession, orders: DataFrame) -> DataFrame:
    """GROUPING SETS — the general form of rollup/cube: an explicit,
    sparse list of subtotal combinations ((priority), (status), ())
    computed in ONE shuffle pass via map-side Expand, instead of three
    separate scans UNIONed together.  At 100 TB the difference is 3
    full scans vs 1.  SQL entry path (the DataFrame API only exposes
    the rollup/cube special cases)."""
    orders.createOrReplaceTempView("orders_gs")
    return spark.sql("""
        SELECT COALESCE(o_orderpriority, 'ALL') AS priority,
               COALESCE(o_orderstatus, 'ALL') AS status,
               COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
    """)


def exists_in_subquery(spark: SparkSession, customer: DataFrame,
                       orders: DataFrame) -> DataFrame:
    """EXISTS + IN subqueries through the SQL entry path.  Catalyst
    rewrites both to left-semi joins (RewritePredicateSubquery) — no
    per-row re-execution, each subquery shuffles only its key column.
    Complements q_semi_anti, which pins the same plan shape via the
    DataFrame API."""
    customer.createOrReplaceTempView("customer_sq")
    orders.createOrReplaceTempView("orders_sq")
    return spark.sql("""
        SELECT c_mktsegment, COUNT(*) AS n_cust
        FROM customer_sq c
        WHERE EXISTS (SELECT 1 FROM orders_sq o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
          AND c_custkey IN (SELECT o_custkey FROM orders_sq
                            WHERE o_totalprice > 50000)
        GROUP BY c_mktsegment
    """)


def conditional_agg(lineitem: DataFrame) -> DataFrame:
    """Conditional (filtered) aggregation — SUM/COUNT over CASE WHEN,
    the idiom behind pivot-style reports without a second scan.  All
    conditions evaluate in the same partial-aggregate pass; decimal
    accumulation keeps the filtered sums bit-stable under
    repartitioning."""
    returned = F.col("l_returnflag") == "R"
    big = F.col("l_quantity") > 25
    return (lineitem
            .groupBy("l_linestatus")
            .agg(
                F.count(F.when(returned, 1)).alias("n_returned"),
                F.count(F.when(big, 1)).alias("n_big_qty"),
                F.sum(F.when(returned, dec("l_extendedprice"))
                      .otherwise(F.lit(0).cast(DEC))).cast("double")
                .alias("returned_price"),
                F.count(F.lit(1)).alias("n_rows")))


def string_funcs(part: DataFrame) -> DataFrame:
    """String-function surface: LIKE pushdown filter + case fold,
    length, substring, split-part projection.  All JVM builtins inside
    whole-stage codegen; the LIKE 'x%' prefix form pushes to the
    parquet scan as a StringStartsWith filter."""
    first_word = F.split(F.col("p_name"), " ").getItem(0)
    return (part
            .filter(F.col("p_type").like("STANDARD%"))
            .select(
                "p_partkey",
                F.upper("p_brand").alias("brand_uc"),
                F.length("p_name").alias("name_len"),
                F.substring("p_type", 1, 8).alias("type_prefix"),
                first_word.alias("first_word")))


def ntile_quartiles(customer: DataFrame) -> DataFrame:
    """NTILE ranking window: account-balance quartiles per market
    segment, then a per-(segment, quartile) rollup.  One shuffle on
    the partition key; the quartile assignment is deterministic given
    the (balance, custkey) total order."""
    from pyspark.sql import Window
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey"))
    return (customer
            .select("c_mktsegment", "c_acctbal",
                    F.ntile(4).over(w).alias("quartile"))
            .groupBy("c_mktsegment", "quartile")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.min("c_acctbal"), 2).alias("min_bal"),
                 F.round(F.max("c_acctbal"), 2).alias("max_bal")))


#: Explicit pivot column set — passing the values list skips the
#: extra distinct-scan job Spark otherwise runs to discover them (a
#: full corpus pass at 100 TB, and nondeterministic column order).
EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def pivot_event_counts(events: DataFrame,
                       types: tuple[str, ...] = EVENT_TYPES) -> DataFrame:
    """Dynamic pivot with an EXPLICIT values list: per-user wide
    event-type count columns via ``groupBy().pivot(values=...)``.

    The values list is load-bearing at scale: without it Spark first
    runs a distinct job over the pivot column (a full corpus pass) and
    the output schema depends on the data.  Plan shape: Spark compiles
    pivot to two aggregates — (user, type) counts, then pivotfirst by
    user — so the second exchange carries only |users × types| rows,
    never the corpus.  (The 1-shuffle hand-rolled alternative is the
    CASE-WHEN conditional aggregate, pinned as q_conditional_agg; the
    oracle here spells that form, which is also the equivalence
    proof.)"""
    wide = (events.groupBy("user_id")
            .pivot("event_type", list(types))
            .agg(F.count(F.lit(1))))
    return wide.select(
        "user_id",
        *[F.coalesce(F.col(t), F.lit(0)).cast("bigint").alias(f"n_{t}")
          for t in types])


def range_frame_trailing(events: DataFrame,
                         seconds: int = 3600) -> DataFrame:
    """True RANGE window frame over event time: per user, the count
    and exact-decimal sum of events in the trailing hour (value-based
    frame — peers at equal timestamps aggregate together, unlike the
    ROWS frame q_moving_avg pins).

    Ordering key is integer microseconds (unix_micros ↔ epoch_us), so
    frame boundaries are exact on both engines — ordering by a
    float-seconds epoch would make boundary membership engine-
    dependent.  One shuffle on user_id."""
    from pyspark.sql import Window
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = (Window.partitionBy("user_id").orderBy(us)
         .rangeBetween(-seconds * 1_000_000, 0))
    return events.select(
        "user_id", "event_id", "ts",
        F.count(F.lit(1)).over(w).alias("n_trailing"),
        F.sum(dec("value")).over(w).cast("double").alias("sum_trailing"))


def window_analytics(events: DataFrame) -> DataFrame:
    """Analytic-function breadth in one pass: percent_rank, cume_dist,
    first_value, last_value, nth_value over a (event_type, value,
    event_id) total order — one shuffle on event_type, every function
    from the same WindowExec sort.  first/last/nth use the explicit
    unbounded frame (the default frame stops at CURRENT ROW, which
    silently turns last_value into a running value).

    Honest limit: percent_rank/cume_dist need the partition's total
    order, so a low-cardinality partition key caps parallelism at
    |types| reducers.  At 100 TB, rank against a per-type quantile
    artifact instead (q_kll_merge's sketches give rank estimates with
    bounded error) or two-pass: per-subpartition ranks + a
    |types|-row offset merge."""
    from pyspark.sql import Window
    order = Window.partitionBy("event_type").orderBy(
        F.col("value"), F.col("event_id"))
    full = order.rowsBetween(Window.unboundedPreceding,
                             Window.unboundedFollowing)
    return events.select(
        "event_id", "event_type", "value",
        F.round(F.percent_rank().over(order), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(order), 6).alias("cume_dist"),
        F.first_value(F.col("value")).over(full).alias("min_value"),
        F.last_value(F.col("value")).over(full).alias("max_value"),
        F.nth_value(F.col("value"), 3).over(full).alias("third_value"))


def snowflake_revenue(region: DataFrame, nation: DataFrame,
                      customer: DataFrame, supplier: DataFrame,
                      orders: DataFrame, lineitem: DataFrame,
                      region_name: str = "ASIA") -> DataFrame:
    """TPC-H Q5-shaped 6-table snowflake join: revenue per nation for
    one region, where the supplying and ordering nation coincide (the
    local-supplier condition) — the deepest multi-way join in the
    suite, exercising join ORDER as much as join strategy.

    Plan economics: region (5 rows) and nation (25) are the only
    dims we FORCE to broadcast — they are provably tiny at any scale.
    customer/supplier are huge at 100 TB (TPC-H sf100k: billions of
    rows), so forcing a broadcast there would be a scale bug; AQE
    picks broadcast at small scale and shuffle join at large, which
    is exactly the right behavior to leave declarative.  The
    nation-must-match-supplier condition lands as an equi-key
    (c_nationkey = s_nationkey) INSIDE the join tree, not a
    post-filter, so mismatched rows die before the aggregate.
    Revenue accumulates in exact decimal."""
    r = region.filter(F.col("r_name") == region_name)
    n = nation.join(F.broadcast(r),
                    nation.n_regionkey == r.r_regionkey).select(
                        "n_nationkey", "n_name")
    c = customer.join(F.broadcast(n),
                      customer.c_nationkey == n.n_nationkey).select(
                          "c_custkey", "c_nationkey", "n_name")
    o = orders.join(c, orders.o_custkey == c.c_custkey)
    s = supplier.select("s_suppkey", "s_nationkey")
    j = (lineitem
         .join(o, lineitem.l_orderkey == o.o_orderkey)
         .join(s, (F.col("l_suppkey") == s.s_suppkey)
               & (F.col("c_nationkey") == s.s_nationkey)))
    return (j.groupBy("n_name")
            .agg(F.sum(revenue()).cast("double").alias("revenue"),
                 F.count(F.lit(1)).alias("n_items"))
            .orderBy(F.col("revenue").desc(), "n_name"))


def nation_trade_volume(nation: DataFrame, customer: DataFrame,
                        supplier: DataFrame, orders: DataFrame,
                        lineitem: DataFrame,
                        nation_a: str = "NATION_3",
                        nation_b: str = "NATION_7") -> DataFrame:
    """TPC-H Q7-shaped bi-directional trade volume: revenue flowing
    between two nations in BOTH directions (supplier in A shipping to
    customers in B, and vice versa), by year.

    The 2-row nation dim broadcasts down both arms (forced — provably
    tiny); the nation-filtered customer/supplier sides stay
    declarative so AQE chooses broadcast-vs-shuffle by actual size
    (at 100 TB a two-nation customer slice is still billions of rows).
    The direction predicate dies at the join, never a post-aggregate
    filter.  Year comes from the shipdate (our orders carry no
    commitdate)."""
    n2 = nation.filter(F.col("n_name").isin(nation_a, nation_b)) \
        .select("n_nationkey", "n_name")
    cust = (customer.join(F.broadcast(n2),
                          customer.c_nationkey == n2.n_nationkey)
            .select("c_custkey", F.col("n_name").alias("cust_nation")))
    supp = (supplier.join(F.broadcast(n2.select(
        F.col("n_nationkey").alias("sn_key"),
        F.col("n_name").alias("supp_nation"))),
        supplier.s_nationkey == F.col("sn_key"))
        .select("s_suppkey", "supp_nation"))
    j = (lineitem
         .join(orders.select("o_orderkey", "o_custkey"),
               lineitem.l_orderkey == F.col("o_orderkey"))
         .join(cust, F.col("o_custkey") == cust.c_custkey)
         .join(supp, lineitem.l_suppkey == supp.s_suppkey)
         .filter(F.col("supp_nation") != F.col("cust_nation")))
    return (j.groupBy("supp_nation", "cust_nation",
                      F.year("l_shipdate").alias("l_year"))
            .agg(F.sum(revenue()).cast("double").alias("volume"),
                 F.count(F.lit(1)).alias("n_items"))
            .orderBy("supp_nation", "cust_nation", "l_year"))


def returned_revenue_customers(customer: DataFrame, orders: DataFrame,
                               lineitem: DataFrame,
                               k: int = 20) -> DataFrame:
    """TPC-H Q10-shaped returned-item ranking: the customers losing
    the most revenue to returns (l_returnflag = 'R'), top-k.

    The returnflag filter pushes to the lineitem scan (PushedFilters),
    the orders join shuffles on orderkey, and the top-k is TakeOrdered
    — the revenue-triage query every warehouse runs, shaped so only
    flagged lineitems ever shuffle.  customer is NOT force-broadcast
    (huge at scale); AQE decides by size."""
    flagged = lineitem.filter(F.col("l_returnflag") == "R")
    j = (flagged
         .join(orders.select("o_orderkey", "o_custkey"),
               flagged.l_orderkey == F.col("o_orderkey"))
         .join(customer.select("c_custkey", "c_name", "c_acctbal"),
               F.col("o_custkey") == F.col("c_custkey")))
    return (j.groupBy("c_custkey", "c_name")
            .agg(F.sum(revenue()).cast("double").alias("lost_revenue"),
                 F.count(F.lit(1)).alias("n_returned"),
                 F.round(F.max("c_acctbal"), 2).alias("acctbal"))
            .orderBy(F.col("lost_revenue").desc(), "c_custkey")
            .limit(k))


def big_orders(customer: DataFrame, orders: DataFrame,
               lineitem: DataFrame, min_qty: float = 150.0) -> DataFrame:
    """TPC-H Q18-shaped large-volume orders: orders whose total
    quantity exceeds a threshold, with their customer and line stats —
    the HAVING-then-join-back shape.

    The quantity rollup is ONE partial aggregate over lineitem; only
    qualifying orderkeys (a tiny set) proceed to the orders/customer
    joins, and the qualifying set joins lineitem-free (the aggregate
    already carries the measures) — no second lineitem pass, no
    semi-join rescan."""
    qual = (lineitem.groupBy("l_orderkey")
            .agg(F.sum(dec("l_quantity")).alias("__q"),
                 F.count(F.lit(1)).alias("n_lines"))
            .filter(F.col("__q") > F.lit(min_qty).cast(DEC)))
    j = (qual
         .join(orders.select("o_orderkey", "o_custkey", "o_orderdate",
                             "o_totalprice"),
               qual.l_orderkey == F.col("o_orderkey"))
         .join(customer.select("c_custkey", "c_name"),
               F.col("o_custkey") == F.col("c_custkey")))
    return j.select("o_orderkey", "c_name", "o_orderdate",
                    F.round("o_totalprice", 2).alias("o_totalprice"),
                    F.col("__q").cast("double").alias("total_qty"),
                    "n_lines")


def skyline_parts(part: DataFrame) -> DataFrame:
    """2-D skyline (Pareto frontier): the (price, size) points no
    other point dominates — dominate = cheaper-or-equal AND
    bigger-or-equal with at least one strict.  The multi-objective
    shortlist query (cheapest-per-capability), O(n²) if written as the
    textbook NOT EXISTS anti-join.

    Single-window rewrite: dedupe to distinct points, sort by
    (price asc, size desc); a point is dominated iff the running max
    of size over STRICTLY earlier rows ≥ its size (earlier rows are
    exactly the cheaper-or-equal candidates, and the sort makes
    equal-price-bigger-size land earlier).  The oracle is the NOT
    EXISTS form, proving the rewrite.  The dedupe groupBy does the
    heavy lifting distributed; the frontier window runs over distinct
    points only.  Honest limit: that window is unpartitioned — fine
    while |distinct points| ≪ |rows| (here and in most catalogs); at
    larger point counts, range-partition by price and merge per-range
    frontiers with carried max offsets."""
    from pyspark.sql import Window
    pts = (part.groupBy("p_retailprice", "p_size")
           .agg(F.count(F.lit(1)).alias("n_parts")))
    w = (Window.orderBy(F.col("p_retailprice").asc(),
                        F.col("p_size").desc())
         .rowsBetween(Window.unboundedPreceding, -1))
    cm = F.max("p_size").over(w)
    return (pts.withColumn("__cm", cm)
            .filter(F.col("__cm").isNull()
                    | (F.col("p_size") > F.col("__cm")))
            .select("p_retailprice", "p_size", "n_parts"))


FACET_STATUS = "O"                           # the user's filter
FACET_PAGE_SIZE = 20                         # Datasette default-ish page
FACET_AFTER_DATE = "1995-06-15 00:00:00"     # keyset cursor from the
FACET_AFTER_KEY = 0                          # ...previous page's last row


def facet_page(orders: DataFrame, status: str = FACET_STATUS,
               page_size: int = FACET_PAGE_SIZE,
               after_date: str = FACET_AFTER_DATE,
               after_key: int = FACET_AFTER_KEY) -> DataFrame:
    """Datasette-style faceted table page (the reference's documented
    interaction surface — its README ships the converted DB straight
    into Datasette, reference README.md:96-110, whose table view is
    exactly this query): the user's filter, a facet panel of
    per-value counts over the FILTERED (not paginated) rows, and
    KEYSET pagination — the next page starts strictly after the
    previous page's last (sort key, pk) cursor, never at an OFFSET.

    Spark shape, and why keyset is the only pagination that survives
    scale: the filter is a plain predicate (pushed to the parquet
    scan — PushedFilters pinned in test_plans), the keyset cursor is
    ALSO a pushable range predicate, so page N reads only rows past
    the cursor; OFFSET pagination scans and discards N·page_size rows
    and gets slower per page.  The page itself is orderBy().limit()
    — a TakeOrdered O(page_size) heap per partition, no global sort.
    The facet counts are a ≤|values| groupBy (map-side combined)
    broadcast back onto the page rows, so every returned row carries
    its facet's total — one relation, both Datasette panels.  The
    final orderBy restores the page order the counts join discards
    (ADVICE r12: in-page order IS the pagination contract — a page
    returned in arbitrary order forces every consumer to re-sort);
    it sorts page_size rows, not the relation."""
    filtered = orders.filter(F.col("o_orderstatus") == status)
    counts = (filtered.groupBy("o_orderpriority")
              .agg(F.count(F.lit(1)).alias("facet_count")))
    cursor = F.to_timestamp(F.lit(after_date))
    page = (filtered
            .filter((F.col("o_orderdate") > cursor)
                    | ((F.col("o_orderdate") == cursor)
                       & (F.col("o_orderkey") > after_key)))
            .select("o_orderkey", "o_orderdate", "o_orderpriority",
                    "o_totalprice")
            .orderBy("o_orderdate", "o_orderkey")
            .limit(page_size))
    return (page.join(F.broadcast(counts), "o_orderpriority")
            .select("o_orderkey", "o_orderdate", "o_orderpriority",
                    "o_totalprice", "facet_count")
            .orderBy("o_orderdate", "o_orderkey"))


_FACET_PAGE_ORACLE = f"""
    WITH f AS (
      SELECT * FROM orders WHERE o_orderstatus = '{FACET_STATUS}'),
    counts AS (
      SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS facet_count
      FROM f GROUP BY o_orderpriority),
    page AS (
      SELECT o_orderkey, o_orderdate, o_orderpriority, o_totalprice
      FROM f
      WHERE o_orderdate > TIMESTAMP '{FACET_AFTER_DATE}'
         OR (o_orderdate = TIMESTAMP '{FACET_AFTER_DATE}'
             AND o_orderkey > {FACET_AFTER_KEY})
      ORDER BY o_orderdate, o_orderkey LIMIT {FACET_PAGE_SIZE})
    SELECT p.o_orderkey, p.o_orderdate, p.o_orderpriority,
           p.o_totalprice, c.facet_count
    FROM page p JOIN counts c USING (o_orderpriority)
    ORDER BY p.o_orderdate, p.o_orderkey
    """


# ---------------------------------------------------------------------------
# Specs
# ---------------------------------------------------------------------------

ANALYZE_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


def analyze_column_stats(lineitem: DataFrame,
                         cols: tuple = ANALYZE_COLS) -> DataFrame:
    """ANALYZE TABLE … COMPUTE STATISTICS FOR COLUMNS, as a contract
    query: per-column row count, null count, exact NDV, min and max —
    the statistics artifact a cost-based optimizer prunes, reorders,
    and broadcast-decides with (Spark persists exactly these in the
    catalog; the manifest layer's file-level min/max in `q_zorder`
    and `q_bloom_prune` are the same idea at file grain).

    ONE scan: all per-column aggregates compute in a single global
    aggregation (the multi-distinct Expand costs ×|cols| map rows but
    no extra scan), then the 1-row wide result unpivots in-row to the
    per-column layout.  Exact NDV keeps the oracle bit-exact; at
    100 TB production ANALYZE swaps countDistinct for the
    `approx_count_distinct` HLL (the q_approx_distinct path) with the
    identical plan shape.  Values round to 6 dp in double — these
    columns carry ≤2-dp decimals, so the cast is exact."""
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.col(c)).alias(f"{c}__nn"),
            F.countDistinct(F.col(c)).alias(f"{c}__ndv"),
            F.round(F.min(F.col(c)).cast("double"), 6).alias(f"{c}__mn"),
            F.round(F.max(F.col(c)).cast("double"), 6).alias(f"{c}__mx"),
        ]
    wide = lineitem.agg(F.count(F.lit(1)).alias("n_rows"), *aggs)
    per_col = F.array(*[
        F.struct(F.lit(c).alias("column"),
                 (F.col("n_rows") - F.col(f"{c}__nn")).cast("bigint")
                 .alias("n_nulls"),
                 F.col(f"{c}__ndv").cast("bigint").alias("ndv"),
                 F.col(f"{c}__mn").alias("min_val"),
                 F.col(f"{c}__mx").alias("max_val"))
        for c in cols])
    return (wide.select("n_rows", F.explode(per_col).alias("s"))
            .select(F.col("s.column").alias("column"),
                    F.col("n_rows").cast("bigint").alias("n_rows"),
                    "s.n_nulls", "s.ndv", "s.min_val", "s.max_val")
            .orderBy("column"))


def _analyze_oracle_sql(cols: tuple = ANALYZE_COLS) -> str:
    parts = [f"""
    SELECT '{c}' AS "column",
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_nulls,
           CAST(COUNT(DISTINCT {c}) AS BIGINT) AS ndv,
           ROUND(CAST(MIN({c}) AS DOUBLE), 6) AS min_val,
           ROUND(CAST(MAX({c}) AS DOUBLE), 6) AS max_val
    FROM lineitem""" for c in cols]
    return " UNION ALL ".join(parts) + ' ORDER BY "column"'


def _q(table_names, op):
    def build(spark: SparkSession, sf_dir: str) -> DataFrame:
        return op(*[load_table(spark, sf_dir, t) for t in table_names])
    return build


SPECS: dict[str, Spec] = {
    "q_facet_page": Spec(
        lambda spark, sf: facet_page(load_table(spark, sf, "orders")),
        _FACET_PAGE_ORACLE,
        "Datasette-style faceted table page (reference "
        "README.md:96-110's documented interaction surface): pushed "
        "filter + per-value facet counts broadcast onto a "
        "keyset-paginated page — cursor predicate prunes the scan, "
        "TakeOrdered heap, never OFFSET"),
    "q_analyze_stats": Spec(
        lambda spark, sf: analyze_column_stats(
            load_table(spark, sf, "lineitem")),
        _analyze_oracle_sql(),
        "ANALYZE-style per-column statistics (count/nulls/exact "
        "NDV/min/max) in ONE scan — the CBO statistics artifact; "
        "multi-distinct Expand, no second pass"),
    "q_flagship": Spec(
        _q(("orders", "lineitem"), flagship), FLAGSHIP_ORACLE,
        "Milestone-0 flagship: README.md:33-46 shape (B1-B6 + B10)"),
    "q_filter_between": Spec(
        _q(("orders",), filter_between),
        """
        SELECT o_orderkey, o_totalprice, o_orderdate FROM orders
        WHERE o_orderdate BETWEEN TIMESTAMP '1997-01-01 00:00:00'
                              AND TIMESTAMP '1997-12-31 23:59:59'
        """,
        "B2 range predicate (reference README.md:39-41)"),
    "q_filter_or_isin": Spec(
        _q(("orders",), filter_or_isin),
        """
        SELECT o_orderkey, o_orderpriority, o_orderstatus FROM orders
        WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
        """,
        "B3 OR-of-equalities (reference README.md:42-46)"),
    "q_project_arith": Spec(
        _q(("lineitem",), project_arith),
        """
        SELECT l_orderkey, l_linenumber,
               l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS charge,
               l_quantity / 60.0 AS qty_per_min
        FROM lineitem
        """,
        "B4 arithmetic projection (reference README.md:34-35)"),
    "q_agg_sum": Spec(
        _q(("lineitem",), agg_sum),
        """
        SELECT CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
               COUNT(*) AS n_rows,
               COUNT(DISTINCT l_orderkey) AS n_orders
        FROM lineitem
        """,
        "B5 ungrouped SUM (reference README.md:33-46)"),
    "q_group_agg": Spec(
        _q(("lineitem",), group_agg),
        """
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
               CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_quantity) AS DOUBLE) AS avg_qty,
               CAST(CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_discount) AS DOUBLE) AS avg_disc,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        """,
        "B6 grouped aggregation (TPC-H Q1 shape; README.md:96-105)"),
    "q_json_extract": Spec(
        _q(("events",), json_extract_k),
        """
        SELECT event_type, COUNT(*) AS n,
               CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
               MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
        FROM events
        WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) IS NOT NULL
        GROUP BY event_type
        """,
        "B7 json_extract (reference README.md:52-58)"),
    "q_variant_extract": Spec(
        _q(("events",), variant_extract_k),
        """
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
               CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k,
               CAST(COUNT(json_extract_string(props, '$.not_there')) AS BIGINT) AS n_missing
        FROM events
        WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) IS NOT NULL
        GROUP BY event_type
        """,
        "B7 via Spark 4 VARIANT (parse_json + try_variant_get typed paths; "
        "single parse, shredded-columnar-ready)"),
    "q_date_parse": Spec(
        _q(("events",), date_parse),
        """
        SELECT event_id,
               strptime(strftime(ts, '%Y-%m-%d %H:%M:%S'), '%Y-%m-%d %H:%M:%S') AS parsed_ts,
               CAST(EXTRACT(YEAR FROM ts) AS INT) AS y,
               CAST(EXTRACT(MONTH FROM ts) AS INT) AS m,
               CAST(EXTRACT(DAY FROM ts) AS INT) AS d,
               CAST(EXTRACT(HOUR FROM ts) AS INT) AS h
        FROM events
        """,
        "B8 date parse/parts (reference core.rs:13-19 format)"),
    "q_topk": Spec(
        _q(("orders",), topk_orders),
        """
        SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
        """,
        "B9 sort/limit (reference README.md:96-101)"),
    "q_path_join": Spec(
        _q(("customer", "orders", "nation"), customer_order_join),
        """
        SELECT n_name, COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name
        """,
        "B10/A10 equi-join with broadcast dim (reference core.rs:556-633)"),
    "q_window_rank": Spec(
        _q(("orders",), window_rank),
        """
        SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
          SELECT o_custkey, o_orderkey, o_totalprice,
                 CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
                        ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rn
          FROM orders) t
        WHERE rn <= 3
        """,
        "window/ranking addition (SURVEY.md §2.B gaps)"),
    "q_set_ops": Spec(
        _q(("orders",), set_ops),
        """
        WITH urgent AS (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'),
             high   AS (SELECT o_custkey FROM orders WHERE o_orderpriority = '2-HIGH')
        SELECT o_custkey, 'both' AS tag FROM (SELECT o_custkey FROM urgent INTERSECT SELECT o_custkey FROM high)
        UNION ALL
        SELECT o_custkey, 'urgent_only' AS tag FROM
          (SELECT DISTINCT o_custkey FROM urgent EXCEPT SELECT DISTINCT o_custkey FROM high)
        UNION ALL
        SELECT o_custkey, 'either' AS tag FROM
          (SELECT DISTINCT o_custkey FROM (SELECT o_custkey FROM urgent UNION SELECT o_custkey FROM high))
        """,
        "set-operation addition (SURVEY.md §2.B gaps)"),
    "q_semi_anti": Spec(
        _q(("customer", "orders"), semi_anti),
        """
        SELECT c_custkey, c_mktsegment, 'has_urgent' AS tag FROM customer
        WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                      AND o_orderpriority = '1-URGENT')
        UNION ALL
        SELECT c_custkey, c_mktsegment, 'no_orders' AS tag FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        """,
        "semi/anti join addition (SURVEY.md §2.B gaps)"),
    "q_cube": Spec(
        _q(("orders",), cube_agg),
        """
        SELECT COALESCE(o_orderpriority, 'ALL') AS priority,
               COALESCE(o_orderstatus, 'ALL') AS status,
               COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM orders GROUP BY CUBE (o_orderpriority, o_orderstatus)
        """,
        "cube/grouping-sets addition (SURVEY.md §2.B gaps)"),
    "q_approx_distinct": Spec(
        _q(("orders", "lineitem"), approx_distinct),
        None,  # HLL++ sketch values are engine-specific — rows-only
        "approximate aggregates addition (SURVEY.md §2.B gaps)"),
    "q_percentiles": Spec(
        _q(("lineitem",), percentiles),
        """
        SELECT l_returnflag,
               ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS median_price,
               ROUND(quantile_cont(l_extendedprice, 0.9), 4) AS p90_price,
               COUNT(*) AS n
        FROM lineitem GROUP BY l_returnflag
        """,
        "exact interpolated percentiles per group (order statistics)"),
    "q_histogram": Spec(
        _q(("lineitem",), histogram),
        """
        SELECT CAST(floor(l_extendedprice / 5000.0) AS BIGINT) AS bin,
               COUNT(*) AS n,
               ROUND(MIN(l_extendedprice), 2) AS lo,
               ROUND(MAX(l_extendedprice), 2) AS hi
        FROM lineitem GROUP BY 1
        """,
        "fixed-width histogram binning (constant-memory distribution)"),
    "q_full_outer": Spec(
        _q(("customer", "orders"), full_outer),
        """
        WITH per_cust AS (
          SELECT o_custkey, COUNT(*) AS n_orders,
                 CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend
          FROM orders GROUP BY o_custkey),
        bal AS (SELECT c_custkey, c_mktsegment FROM customer WHERE c_acctbal > 9000)
        SELECT COALESCE(c_custkey, o_custkey) AS custkey,
               COALESCE(c_mktsegment, 'UNKNOWN') AS segment,
               COALESCE(n_orders, 0) AS n_orders,
               COALESCE(total_spend, 0.0) AS total_spend
        FROM bal FULL OUTER JOIN per_cust ON c_custkey = o_custkey
        """,
        "full outer join with aggregate-before-join (SURVEY.md §2.B gaps)"),
    "q_moving_avg": Spec(
        _q(("orders",), moving_avg),
        """
        SELECT o_custkey, o_orderkey, o_totalprice,
               ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE)
                     / COUNT(*) OVER w, 6) AS moving_avg
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                     ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
        """,
        "window-frame moving average (SURVEY.md §2.B gaps: window functions)"),
    "q_unpivot": Spec(
        _q(("lineitem",), unpivot_measures),
        """
        SELECT l_orderkey, l_linenumber, m AS measure,
               CASE m WHEN 'l_quantity' THEN l_quantity
                      WHEN 'l_extendedprice' THEN l_extendedprice
                      WHEN 'l_discount' THEN l_discount
                      ELSE l_tax END AS val
        FROM lineitem, (SELECT unnest(['l_quantity', 'l_extendedprice',
                                       'l_discount', 'l_tax']) AS m)
        WHERE l_quantity >= 45
        """,
        "UNPIVOT / melt via Expand (wide→long, single scan)"),
    "q_correlated_scalar": Spec(
        lambda spark, sf: correlated_scalar(
            spark, load_table(spark, sf, "orders")),
        """
        SELECT o_custkey, o_orderkey, o_totalprice
        FROM orders o
        WHERE 2 * CAST(o_totalprice AS DECIMAL(18,2))
                * (SELECT COUNT(*) FROM orders o2
                   WHERE o2.o_custkey = o.o_custkey)
              > 3 * (SELECT SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                     FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
        """,
        "correlated scalar subquery, de-correlated by Catalyst (SQL entry path)"),
    "q_rollup": Spec(
        _q(("orders",), rollup_agg),
        """
        SELECT COALESCE(o_orderpriority, 'ALL') AS priority,
               COALESCE(o_orderstatus, 'ALL') AS status,
               COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM orders GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
        """,
        "rollup/grouping-sets addition (SURVEY.md §2.B gaps)"),
    "q_grouping_sets": Spec(
        lambda spark, sf: grouping_sets_agg(
            spark, load_table(spark, sf, "orders")),
        """
        SELECT COALESCE(o_orderpriority, 'ALL') AS priority,
               COALESCE(o_orderstatus, 'ALL') AS status,
               COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM orders
        GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
        """,
        "explicit GROUPING SETS — general grouping-sets form (§2.B gaps)"),
    "q_exists_in": Spec(
        lambda spark, sf: exists_in_subquery(
            spark, load_table(spark, sf, "customer"),
            load_table(spark, sf, "orders")),
        """
        SELECT c_mktsegment, COUNT(*) AS n_cust
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
          AND c_custkey IN (SELECT o_custkey FROM orders
                            WHERE o_totalprice > 50000)
        GROUP BY c_mktsegment
        """,
        "EXISTS/IN subqueries → semi-join rewrite (SQL entry path, §2.B gaps)"),
    "q_conditional_agg": Spec(
        _q(("lineitem",), conditional_agg),
        """
        SELECT l_linestatus,
               COUNT(CASE WHEN l_returnflag = 'R' THEN 1 END) AS n_returned,
               COUNT(CASE WHEN l_quantity > 25 THEN 1 END) AS n_big_qty,
               CAST(SUM(CASE WHEN l_returnflag = 'R'
                             THEN CAST(l_extendedprice AS DECIMAL(18,2))
                             ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
                   AS returned_price,
               COUNT(*) AS n_rows
        FROM lineitem GROUP BY l_linestatus
        """,
        "conditional/filtered aggregation — CASE WHEN in one agg pass"),
    "q_string_funcs": Spec(
        _q(("part",), string_funcs),
        """
        SELECT p_partkey,
               UPPER(p_brand) AS brand_uc,
               LENGTH(p_name) AS name_len,
               SUBSTRING(p_type, 1, 8) AS type_prefix,
               SPLIT_PART(p_name, ' ', 1) AS first_word
        FROM part WHERE p_type LIKE 'STANDARD%'
        """,
        "string-function surface: LIKE pushdown + fold/length/substr/split"),
    "q_ntile": Spec(
        _q(("customer",), ntile_quartiles),
        """
        SELECT c_mktsegment, quartile, COUNT(*) AS n,
               ROUND(MIN(c_acctbal), 2) AS min_bal,
               ROUND(MAX(c_acctbal), 2) AS max_bal
        FROM (SELECT c_mktsegment, c_acctbal,
                     NTILE(4) OVER (PARTITION BY c_mktsegment
                                    ORDER BY c_acctbal DESC, c_custkey) AS quartile
              FROM customer)
        GROUP BY c_mktsegment, quartile
        """,
        "NTILE ranking window + rollup (§2.B gaps: ranking breadth)"),
    "q_nation_trade": Spec(
        _q(("nation", "customer", "supplier", "orders", "lineitem"),
           nation_trade_volume),
        """
        SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
               CAST(year(l_shipdate) AS INT) AS l_year,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (CAST(1 AS DECIMAL(18,2))
                           - CAST(l_discount AS DECIMAL(18,2))))
                    AS DOUBLE) AS volume,
               CAST(COUNT(*) AS BIGINT) AS n_items
        FROM lineitem
        JOIN orders    ON l_orderkey = o_orderkey
        JOIN customer  ON o_custkey = c_custkey
        JOIN supplier  ON l_suppkey = s_suppkey
        JOIN nation cn ON c_nationkey = cn.n_nationkey
        JOIN nation sn ON s_nationkey = sn.n_nationkey
        WHERE cn.n_name IN ('NATION_3', 'NATION_7')
          AND sn.n_name IN ('NATION_3', 'NATION_7')
          AND sn.n_name <> cn.n_name
        GROUP BY sn.n_name, cn.n_name, year(l_shipdate)
        ORDER BY supp_nation, cust_nation, l_year
        """,
        "TPC-H Q7-shaped bi-directional trade volume between two "
        "nations by ship year (2-row nation dim broadcast down both "
        "arms; direction predicate dies at the join, never a "
        "post-aggregate filter)"),
    "q_returned_customers": Spec(
        _q(("customer", "orders", "lineitem"),
           returned_revenue_customers),
        """
        SELECT c_custkey, c_name,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (CAST(1 AS DECIMAL(18,2))
                           - CAST(l_discount AS DECIMAL(18,2))))
                    AS DOUBLE) AS lost_revenue,
               CAST(COUNT(*) AS BIGINT) AS n_returned,
               ROUND(MAX(c_acctbal), 2) AS acctbal
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE l_returnflag = 'R'
        GROUP BY c_custkey, c_name
        ORDER BY lost_revenue DESC, c_custkey LIMIT 20
        """,
        "TPC-H Q10-shaped returned-revenue customer ranking "
        "(returnflag filter pushed to the lineitem scan, customer dim "
        "broadcast, TakeOrdered top-k)"),
    "q_big_orders": Spec(
        _q(("customer", "orders", "lineitem"), big_orders),
        """
        WITH qual AS (
          SELECT l_orderkey,
                 SUM(CAST(l_quantity AS DECIMAL(18,2))) AS q,
                 CAST(COUNT(*) AS BIGINT) AS n_lines
          FROM lineitem GROUP BY l_orderkey
          HAVING SUM(CAST(l_quantity AS DECIMAL(18,2)))
                 > CAST(150.0 AS DECIMAL(18,2)))
        SELECT o_orderkey, c_name, o_orderdate,
               ROUND(o_totalprice, 2) AS o_totalprice,
               CAST(q AS DOUBLE) AS total_qty, n_lines
        FROM qual
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        """,
        "TPC-H Q18-shaped large-volume orders: HAVING on the one-pass "
        "quantity rollup, qualifying set joins back lineitem-free (the "
        "aggregate already carries the measures — no second scan)"),
    "q_snowflake_join": Spec(
        _q(("region", "nation", "customer", "supplier", "orders",
            "lineitem"), snowflake_revenue),
        """
        SELECT n_name,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (CAST(1 AS DECIMAL(18,2))
                           - CAST(l_discount AS DECIMAL(18,2))))
                    AS DOUBLE) AS revenue,
               CAST(COUNT(*) AS BIGINT) AS n_items
        FROM region
        JOIN nation   ON n_regionkey = r_regionkey
        JOIN customer ON c_nationkey = n_nationkey
        JOIN orders   ON o_custkey = c_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN supplier ON s_suppkey = l_suppkey
                     AND s_nationkey = c_nationkey
        WHERE r_name = 'ASIA'
        GROUP BY n_name
        ORDER BY revenue DESC, n_name
        """,
        "TPC-H Q5-shaped 6-table snowflake join: region->nation->"
        "customer dims broadcast, local-supplier condition as an "
        "equi-key inside the join tree, one large shuffle "
        "(lineitem x orders), exact-decimal revenue"),
    "q_skyline": Spec(
        _q(("part",), skyline_parts),
        """
        WITH pts AS (
          SELECT p_retailprice, p_size, CAST(COUNT(*) AS BIGINT)
                   AS n_parts
          FROM part GROUP BY p_retailprice, p_size)
        SELECT p_retailprice, p_size, n_parts
        FROM pts a
        WHERE NOT EXISTS (
          SELECT 1 FROM pts b
          WHERE b.p_retailprice <= a.p_retailprice
            AND b.p_size >= a.p_size
            AND (b.p_retailprice < a.p_retailprice
                 OR b.p_size > a.p_size))
        """,
        "2-D skyline / Pareto frontier: the O(n^2) NOT-EXISTS "
        "dominance anti-join rewritten as one running-max window over "
        "distinct points (oracle is the NOT EXISTS form, proving the "
        "rewrite)"),
    "q_pivot": Spec(
        _q(("events",), pivot_event_counts),
        """
        SELECT user_id,
               CAST(COUNT(CASE WHEN event_type = 'click' THEN 1 END)
                    AS BIGINT) AS n_click,
               CAST(COUNT(CASE WHEN event_type = 'error' THEN 1 END)
                    AS BIGINT) AS n_error,
               CAST(COUNT(CASE WHEN event_type = 'purchase' THEN 1 END)
                    AS BIGINT) AS n_purchase,
               CAST(COUNT(CASE WHEN event_type = 'signup' THEN 1 END)
                    AS BIGINT) AS n_signup,
               CAST(COUNT(CASE WHEN event_type = 'view' THEN 1 END)
                    AS BIGINT) AS n_view
        FROM events GROUP BY user_id
        """,
        "dynamic pivot with an explicit values list (one conditional-"
        "agg pass, no distinct-discovery job over the pivot column)"),
    "q_range_frame": Spec(
        _q(("events",), range_frame_trailing),
        """
        SELECT user_id, event_id, ts,
               CAST(COUNT(*) OVER w AS BIGINT) AS n_trailing,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE)
                 AS sum_trailing
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                     RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        """,
        "true RANGE window frame (trailing hour by value, not rows) "
        "keyed on integer microseconds so boundary membership is "
        "engine-exact"),
    "q_window_analytics": Spec(
        _q(("events",), window_analytics),
        """
        SELECT event_id, event_type, value,
               ROUND(percent_rank() OVER o, 6) AS pct_rank,
               ROUND(cume_dist() OVER o, 6) AS cume_dist,
               first_value(value) OVER f AS min_value,
               last_value(value) OVER f AS max_value,
               nth_value(value, 3) OVER f AS third_value
        FROM events
        WINDOW o AS (PARTITION BY event_type ORDER BY value, event_id),
               f AS (PARTITION BY event_type ORDER BY value, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING
                              AND UNBOUNDED FOLLOWING)
        """,
        "analytic-function breadth: percent_rank/cume_dist/first/"
        "last/nth_value from ONE WindowExec sort (explicit unbounded "
        "frame — the default frame corrupts last_value)"),
}
