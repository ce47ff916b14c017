"""Time-series operators: windowed aggregation, sessionization, as-of join.

The reference has no streaming/temporal surface (batch-only,
SURVEY.md §1.1 "Stream: none"); these implement the driver north-star
C6 row plus the temporal operators any event pipeline needs.  The
Structured Streaming twin of the tumbling window lives in
``streaming/windowed.py`` — same logical aggregation, watermarked.

Scale notes:
- tumbling window: date_trunc bucketing keeps grouping key cardinality
  = buckets × types; partial agg makes the shuffle proportional to
  groups, not rows.
- sessionize: one shuffle (by user) shared by both window passes —
  Spark reuses the exchange since partitioning matches.
- as-of join: implemented as union + last() over an ordered window
  (single shuffle by key), NOT a range join — a range join at 100 TB
  explodes; the union trick is linear and skew-tolerant (AQE).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions import dec, dec_sum
from ..spec import Spec


def tumbling_window(events: DataFrame, bucket: str = "hour") -> DataFrame:
    """C6: tumbling-window aggregate in batch form (date_trunc
    bucketing); the streaming twin uses window(ts, '1 hour') +
    watermark."""
    return (events
            .groupBy(F.date_trunc(bucket, "ts").cast("timestamp_ntz").alias("window_start"),
                     "event_type")
            .agg(F.count(F.lit(1)).alias("n"),
                 dec_sum("value").alias("sum_value")))


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Gap-based sessionization per user: a new session starts when the
    inter-event gap exceeds ``gap_minutes``.  Classic lag + cumulative
    sum over one user-partitioned ordered window; the stateful
    streaming analog is applyInPandasWithState (streaming/sessions.py).
    Output: per-user session stats (deterministic, no floats)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lag_ts = F.lag("ts").over(w)
    new_sess = F.when(
        lag_ts.isNull()
        | (F.col("ts") > lag_ts + F.expr(f"INTERVAL {gap_minutes} MINUTES")), 1
    ).otherwise(0)
    sess = (events
            .withColumn("new_sess", new_sess)
            .withColumn("session_id", F.sum("new_sess").over(
                w.rowsBetween(Window.unboundedPreceding, 0))))
    per_session = (sess.groupBy("user_id", "session_id")
                   .agg(F.count(F.lit(1)).alias("n_events")))
    return (per_session.groupBy("user_id")
            .agg(F.max("session_id").cast("bigint").alias("n_sessions"),
                 F.sum("n_events").alias("n_events"),
                 F.max("n_events").alias("max_session_events")))


def asof_last_click(events: DataFrame) -> DataFrame:
    """As-of join: for every purchase event, the most recent click (≤ ts)
    by the same user.

    Spark lacks a native as-of join; the scalable composition is the
    union trick: tag both streams, sort within user by (ts, side), and
    carry the last click timestamp forward with last(ignorenulls) —
    O(n log n) per user partition, one shuffle, no pairwise explosion.
    Click-before-purchase at equal ts matches DuckDB ASOF's inclusive
    bound."""
    clicks = (events.filter(F.col("event_type") == "click")
              .select("user_id", F.col("ts"), F.lit(0).alias("side"),
                      F.lit(None).cast("bigint").alias("event_id"),
                      F.col("ts").alias("click_ts")))
    purchases = (events.filter(F.col("event_type") == "purchase")
                 .select("user_id", F.col("ts"), F.lit(1).alias("side"),
                         F.col("event_id"),
                         F.lit(None).cast("timestamp_ntz").alias("click_ts")))
    unioned = clicks.unionByName(purchases)
    w = (Window.partitionBy("user_id").orderBy("ts", "side")
         .rowsBetween(Window.unboundedPreceding, 0))
    out = (unioned
           .withColumn("last_click_ts", F.last("click_ts", ignorenulls=True).over(w))
           .filter(F.col("side") == 1))
    return out.select("event_id", "user_id", F.col("ts"), "last_click_ts")


def session_window_agg(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Per-user session aggregates via Spark's NATIVE ``session_window``
    operator (gap-merged dynamic windows) — the declarative twin of the
    lag+cumsum ``sessionize``: one partial-merging aggregate, no window
    function pass, and the identical expression runs under Structured
    Streaming with a watermark (where lag+cumsum cannot).

    Session semantics: a session spans [first ts, last ts + gap); an
    event at exactly ``prev + gap`` starts a NEW session (windows merge
    only on strict overlap) — the oracle's island detection uses ``>=``
    to match.  Deterministic: boundaries derive from event times only."""
    return (events
            .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 dec_sum("value").alias("sum_value"))
            .select("user_id", F.col("w.start").alias("session_start"),
                    F.col("w.end").alias("session_end"),
                    "n_events", "sum_value"))


def funnel_join(events: DataFrame, max_lag_minutes: int = 30) -> DataFrame:
    """Batch twin of streaming/windowed.stream_stream_join: every
    (click → purchase) pair of the same user where the purchase lands
    within ``max_lag_minutes`` after the click — the attribution /
    funnel join.

    The join keeps an equi-key (user_id) so it shuffles by user and
    applies the time-range predicate post-match; the streaming form is
    the same condition with watermarks bounding both sides' state.
    Batch↔stream equivalence is pinned in tests/test_streaming.py."""
    from ..streaming.windowed import stream_stream_join
    clicks = events.filter(F.col("event_type") == "click")
    purchases = events.filter(F.col("event_type") == "purchase")
    return stream_stream_join(clicks, purchases,
                              max_lag_minutes=max_lag_minutes)


def resample_ffill(events: DataFrame) -> DataFrame:
    """Regular-grid resampling with forward fill — the gap-filling
    operator every sensor/metrics pipeline needs (HealthKit's own data
    is exactly this shape: irregular samples → hourly series).  Per
    user: an hourly slot grid spanning [min ts, max ts] (sequence +
    explode — generated, not shuffled), the last observation within
    each slot (deterministic ``max(struct(ts, event_id, value))`` —
    partial-aggregating, ties impossible since event_id is unique),
    then ``last(value, ignorenulls)`` over the user-ordered grid to
    carry observations across empty slots.

    Scale shape: one groupBy for bounds, one for slot-last, one window
    — all keyed by user_id, so AQE shares the user partitioning; grid
    rows are span/granularity per user (bounded by time horizon, NOT
    by event count — the one cardinality to watch when the horizon is
    years and the grain is seconds)."""
    slot = F.date_trunc("hour", F.col("ts")).cast("timestamp_ntz")
    bounds = events.groupBy("user_id").agg(
        F.date_trunc("hour", F.min("ts")).cast("timestamp_ntz").alias("t0"),
        F.date_trunc("hour", F.max("ts")).cast("timestamp_ntz").alias("t1"))
    grid = bounds.select(
        "user_id",
        F.explode(F.sequence("t0", "t1",
                             F.expr("INTERVAL 1 HOUR"))).alias("slot"))
    hourly = (events
              .groupBy("user_id", slot.alias("slot"))
              .agg(F.max(F.struct("ts", "event_id", "value"))["value"]
                   .alias("obs")))
    w = (Window.partitionBy("user_id").orderBy("slot")
         .rowsBetween(Window.unboundedPreceding, 0))
    return (grid.join(hourly, ["user_id", "slot"], "left")
            .select("user_id", "slot",
                    F.last("obs", ignorenulls=True).over(w).alias("value_ffill"),
                    F.col("obs").isNull().alias("is_gap")))


def funnel_left_join(events: DataFrame, max_lag_minutes: int = 30) -> DataFrame:
    """Batch twin of streaming/windowed.stream_stream_left_join: the
    LEFT OUTER funnel — every click, paired with its in-window
    purchases OR emitted once with nulls when none followed
    (conversion analysis needs the non-converters, which the inner
    form drops).  In streaming the null rows flush on watermark
    expiry; batch↔stream equivalence incl. the unmatched set is
    pinned in tests/test_streaming.py."""
    from ..streaming.windowed import stream_stream_left_join
    clicks = events.filter(F.col("event_type") == "click")
    purchases = events.filter(F.col("event_type") == "purchase")
    return stream_stream_left_join(clicks, purchases,
                                   max_lag_minutes=max_lag_minutes)


def sliding_window(events: DataFrame,
                   window: str = "2 hours", slide: str = "30 minutes") -> DataFrame:
    """Sliding-window aggregate, batch form — identical expression to
    streaming/windowed.sliding_window_stream minus the watermark
    (Spark's window() explodes each event into window/slide = 4
    overlapping buckets via Expand, then a single partial+final agg).
    ts arrives as timestamp_ntz; window() keys stay ntz → engine-
    agnostic naive datetimes."""
    return (events
            .groupBy(F.window("ts", window, slide).alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
                 .alias("sum_value"))
            .select(F.col("w.start").alias("window_start"), "event_type",
                    "n", "sum_value"))


def gapfill_hourly(events: DataFrame, max_user: int = 50) -> DataFrame:
    """Time-series resample + gap-fill: regularize each user's event
    stream onto an hourly grid between that user's first and last
    active hour, filling silent hours with zero counts and a
    forward-filled last observation — the hypertable
    ``time_bucket_gapfill``/``locf`` shape every monitoring pipeline
    needs before rate or trend math.

    Plan: (1) hourly partial-aggregated groupBy (shuffle carries
    groups, not events); (2) per-user min/max span — same user_id
    partitioning, so AQE reuses the exchange; (3) the grid is
    ``explode(sequence(h0, h1, 1 hour))`` — generated IN-ROW from two
    scalars, never a driver-side range or a cross join; (4) left join
    grid←aggregates on (user, hour) and one ordered window pass for
    the locf carry-forward.  Row count = Σ_user span_hours, which the
    ``max_user`` scan-pruned filter bounds; at 100 TB the same plan
    holds with user_id bucketing making the join co-located."""
    ev = events.filter(F.col("user_id") < max_user)
    hourly = (ev.groupBy(
        "user_id",
        F.date_trunc("hour", "ts").cast("timestamp_ntz").alias("hour"))
        .agg(F.count(F.lit(1)).alias("n"),
             dec_sum("value").alias("sum_value")))
    spans = hourly.groupBy("user_id").agg(F.min("hour").alias("h0"),
                                          F.max("hour").alias("h1"))
    grid = spans.select(
        "user_id",
        F.explode(F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))).alias("hour"))
    joined = grid.join(hourly, ["user_id", "hour"], "left")
    w = (Window.partitionBy("user_id").orderBy("hour")
         .rowsBetween(Window.unboundedPreceding, 0))
    return joined.select(
        "user_id", "hour",
        F.coalesce("n", F.lit(0)).alias("n_events"),
        F.col("sum_value"),
        F.last("sum_value", ignorenulls=True).over(w).alias("locf_value"),
        F.col("n").isNull().alias("is_gap"))


def anomaly_zscore(events: DataFrame, threshold: float = 2.5) -> DataFrame:
    """Per-type z-score outlier detection: events whose ``value``
    deviates from their event_type's mean by more than ``threshold``
    standard deviations.

    The per-type moments aggregate in exact DECIMAL (sum and sum of
    squares are associative there, so partition order can't drift the
    result); mean/variance then derive in double with one expression
    shared verbatim with the oracle — identical IEEE inputs + identical
    operation order ⇒ bit-identical z on both engines.  The stats table
    is K rows (one per type) and broadcast back onto the events scan:
    one shuffle of K·partitions partial rows, one map-side join, no
    window pass over the full stream."""
    v = F.col("value").cast("decimal(18,2)")
    stats = (events.groupBy("event_type")
             .agg(F.count(F.lit(1)).alias("n_type"),
                  F.sum(v).cast("double").alias("s1"),
                  F.sum(v * v).cast("double").alias("s2")))
    mean = F.col("s1") / F.col("n_type")
    var = F.col("s2") / F.col("n_type") - mean * mean
    z = (F.col("value") - mean) / F.sqrt(var)
    return (events.join(F.broadcast(stats), "event_type")
            .withColumn("z", F.round(z, 6))
            .filter(F.abs(F.col("z")) >= threshold)
            .select("event_id", "event_type", "ts", "value", "z"))


def retention_cohorts(events: DataFrame) -> DataFrame:
    """Weekly cohort retention matrix: users grouped by the ISO week of
    their FIRST event; for each (cohort_week, weeks_since) cell, the
    count of distinct users active that week.

    Shape: one groupBy(user) for first-event week, one equi-join back
    on user_id (no broadcast assumption — the user dimension grows with
    the data), one groupBy(cell).  All key-partitioned shuffles; at
    100 TB the first-touch table is a maintained artifact and the join
    co-partitions on user_id with the activity scan.  `weeks_since` is
    an exact integer (datediff of two Monday-truncated dates / 7)."""
    wk = lambda c: F.date_trunc("week", c)  # noqa: E731 — Monday trunc
    firsts = (events.groupBy("user_id")
              .agg(wk(F.min("ts")).alias("cohort_ts")))
    active = events.select(
        "user_id", wk(F.col("ts")).alias("week_ts"))
    return (active.join(firsts, "user_id")
            .groupBy(F.col("cohort_ts").cast("date").alias("cohort_week"),
                     (F.datediff(F.col("week_ts"), F.col("cohort_ts")) / 7)
                     .cast("int").alias("weeks_since"))
            .agg(F.countDistinct("user_id").alias("n_users"))
            .orderBy("cohort_week", "weeks_since"))


def lag_lead_deltas(events: DataFrame) -> DataFrame:
    """LAG/LEAD offset windows: per-user inter-event gaps (seconds to
    previous and next event).  One user_id shuffle feeds both offsets
    — same WindowExec pass, same (ts, event_id) deterministic order
    the other temporal ops use; first/last rows keep NULL gaps."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # diff on second-truncated values = DuckDB date_diff('second')
    # boundary-count semantics, exact even for sub-second timestamps
    trunc = F.date_trunc("second", F.col("ts"))
    staged = events.select(
        "user_id", "event_id", "ts",
        F.lag(trunc).over(w).alias("__prev"),
        F.lead(trunc).over(w).alias("__next"),
        trunc.alias("__cur"))
    return staged.select(
        "user_id", "event_id", "ts",
        F.expr("timestampdiff(SECOND, __prev, __cur)")
        .alias("secs_since_prev"),
        F.expr("timestampdiff(SECOND, __cur, __next)")
        .alias("secs_to_next"))


def scd2_history(events: DataFrame) -> DataFrame:
    """Slowly-changing-dimension type-2 history of each user's event
    state (CDC complement to pipeline.merge_upsert): collapse each
    user's event stream into change rows — one row per run of equal
    ``event_type`` — with ``valid_from``/``valid_to`` interval columns
    and an ``is_current`` flag on the open interval.

    Both windows partition by user_id, so the change-detection pass and
    the interval pass share ONE shuffle (Catalyst reuses the exchange;
    the second WindowExec only re-sorts the filtered change rows).  At
    100 TB this is the standard dimension-history build: linear in
    events, no self-join, skew bounded by the busiest user.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("event_type").over(w)
    changes = (events
               .withColumn("__prev", prev)
               .filter(F.col("__prev").isNull()
                       | (F.col("event_type") != F.col("__prev"))))
    valid_to = F.lead("ts").over(w)
    return changes.select(
        "user_id",
        F.row_number().over(w).cast("int").alias("version"),
        F.col("event_type").alias("state"),
        F.col("ts").alias("valid_from"),
        valid_to.alias("valid_to"),
        valid_to.isNull().alias("is_current"))


#: EWMA taps: half-life weights 2^-j are exact in binary AND in
#: decimal(9,7), so the windowed convolution is bit-reproducible
#: cross-engine (the reason alpha is pinned to 1/2).
EWMA_TAPS = 8


def ewma_halflife(events: DataFrame, taps: int = EWMA_TAPS) -> DataFrame:
    """Half-life EWMA smoothing per user: a ``taps``-point truncated
    exponential moving average with alpha = 1/2, computed as an exact
    decimal convolution over LAG offsets.

    A true recursive EWMA is order-dependent float accumulation —
    irreproducible across engines and unparallelizable.  Truncating at
    8 taps leaves a weight tail < 0.4% and turns the operator into a
    bounded window convolution: one shuffle by user, 8 LAG reads from
    a single WindowExec pass, weights 2^-j exact in decimal(9,7) so
    numerator/denominator are exact decimals and the one double
    division at the end is IEEE-identical on any engine.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    num = F.lit(0).cast("decimal(28,9)")
    den = F.lit(0).cast("decimal(9,7)")
    for j in range(taps):
        lag_j = F.col("value") if j == 0 else F.lag("value", j).over(w)
        w_j = F.lit(0.5 ** j).cast("decimal(9,7)")
        num = num + F.when(lag_j.isNotNull(),
                           lag_j.cast("decimal(18,2)") * w_j
                           ).otherwise(F.lit(0).cast("decimal(28,9)"))
        den = den + F.when(lag_j.isNotNull(), w_j
                           ).otherwise(F.lit(0).cast("decimal(9,7)"))
    return events.select(
        "user_id", "event_id", "ts", "value",
        F.round(num.cast("double") / den.cast("double"), 6).alias("ewma"))


def temporal_scd2_join(events: DataFrame) -> DataFrame:
    """Temporal (validity-interval) dimension lookup: for every
    purchase, the SCD2 state the user was in at purchase time — the
    fact ⋈ dimension-history join every warehouse needs once a
    dimension is SCD2-tracked.

    NOT implemented as a BETWEEN range join (which degenerates to a
    per-user nested loop at scale): dimension change points and fact
    rows union into one stream, and ``last(state) IGNORE NULLS`` over
    a (ts, dim-before-fact, version) order resolves the interval
    containment in a single user-partitioned window pass — linear,
    one shuffle, the same union+window trick as `asof_last_click`.
    The oracle IS the BETWEEN join, proving the rewrite.

    The dimension here is the SCD2 history of the user's NON-purchase
    activity (self-contained; in production it's any SCD2 table):
    a change at exactly the fact's timestamp applies (valid_from
    inclusive, valid_to exclusive — dim sorts before fact at equal
    ts); zero-width intervals are correctly skipped by last-wins."""
    dim = (scd2_history(events.filter(F.col("event_type") != "purchase"))
           .select("user_id", F.col("valid_from").alias("ts"), "state",
                   F.lit(0).alias("__is_fact"), "version",
                   F.lit(None).cast("long").alias("event_id")))
    facts = (events.filter(F.col("event_type") == "purchase")
             .select("user_id", "ts",
                     F.lit(None).cast("string").alias("state"),
                     F.lit(1).alias("__is_fact"),
                     F.lit(None).cast("int").alias("version"), "event_id"))
    w = (Window.partitionBy("user_id")
         .orderBy("ts", "__is_fact", "version", "event_id")
         .rowsBetween(Window.unboundedPreceding, 0))
    return (dim.unionByName(facts)
            .withColumn("state_at", F.last("state", ignorenulls=True).over(w))
            .filter(F.col("__is_fact") == 1)
            .select("event_id", "user_id", "ts", "state_at"))


def first_touch(events: DataFrame) -> DataFrame:
    """Earliest event per (user_id, event_type) — the deterministic
    batch twin of streaming first-arrival dedup
    (streaming/windowed.py::dedup_stream uses
    ``dropDuplicatesWithinWatermark``, which keeps the first ARRIVAL;
    this keeps the first event-time row, the replay-stable contract).
    Tie-break (ts, event_id) via row_number; rank-limit rewrites to
    WindowGroupLimit, so each partition keeps one candidate row per
    key in flight — no per-key full sort."""
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (events
            .withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .select("user_id", "event_type",
                    F.col("ts").alias("first_ts"),
                    F.col("event_id").alias("first_event_id"),
                    F.col("value").alias("first_value")))


def group_ols_trend(events: DataFrame) -> DataFrame:
    """Per-group closed-form OLS trend ("many small models"): for each
    event_type, the least-squares slope/intercept of value against
    hour index — in-engine ML with no ML library and no Python.

    The normal equations need only five sufficient statistics
    (n, Σx, Σy, Σxy, Σx²), all integer/decimal-exact here (x = integer
    hour index, y = 2-dp decimal), so the grouped fit is ONE partial
    aggregation pass — the shuffle carries 5 numbers per group, not
    points — and the final slope/intercept divisions run on exact
    sums, making the result bit-reproducible at any partitioning.
    This beats collecting points into a Python UDF by the usual
    10-100× Arrow margin and never materializes a group in memory."""
    # exact integer division: epoch-us ~ 1.7e18 exceeds double's 53-bit
    # mantissa, so floor(us / 3.6e9) in float drops hours at the edges
    x = F.expr("unix_micros(cast(ts as timestamp)) div 3600000000"
               ).cast("bigint")
    y = dec("value")
    # The x moments accumulate in DECIMAL, not int64 (ADVICE r4):
    # x ≈ 4.9e5 epoch-hours in 2026 ⇒ x² ≈ 2.4e11, so SUM(x*x) in
    # bigint hits ANSI ARITHMETIC_OVERFLOW at ~4e7 rows per group —
    # far below the 100 TB operating point — and DuckDB's silent
    # HUGEINT widening makes the engines diverge exactly at that
    # cliff.  decimal(12,0) holds epoch-hours past year 9999; the
    # product is decimal(25,0) and its sum decimal(35,0), pushing the
    # overflow horizon to ~4e23 rows per group (same discipline as
    # connected_components_star's decimal signature sum).
    xd = F.col("x").cast("decimal(12,0)")
    stats = (events
             .select("event_type", x.alias("x"), y.alias("y"))
             .groupBy("event_type")
             .agg(F.count(F.lit(1)).alias("n"),
                  F.sum(xd).alias("sx"),
                  F.sum("y").alias("sy"),
                  F.sum(F.col("x").cast("decimal(18,0)")
                        * F.col("y")).alias("sxy"),
                  F.sum(xd * xd).alias("sxx")))
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx = F.col("sxx").cast("double")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return stats.select(
        "event_type", "n",
        F.round(slope, 6).alias("slope"),
        F.round((sy - slope * sx) / n, 6).alias("intercept"))


AB_SEED = "ab1"  # experiment salt: deterministic 50/50 user assignment


def abtest_readout(events: DataFrame, seed: str = AB_SEED) -> DataFrame:
    """A/B experiment readout per event type: deterministic salted-hash
    50/50 user assignment (same reproducible-assignment discipline as
    q_train_split — no RNG state, stable under reruns/repartitioning),
    then Welch z-statistic on the value means from exact sufficient
    statistics.

    The moment-method family again (q_group_ols, q_autocorr): each arm
    needs only (n, Σx, Σx²), all decimal/integer-exact, so the readout
    is ONE conditional-aggregate pass — no per-arm scans, no shuffle
    of raw observations — and the final float ops (two divisions, one
    sqrt) run on exact sums, bit-identical on any engine."""
    arm_a = (F.conv(F.substring(F.md5(
        F.concat(F.lit(seed + ":"), F.col("user_id").cast("string"))),
        1, 8), 16, 10).cast("bigint") % 2 == 0)
    cents = (dec("value") * 100).cast("bigint")
    stats = (events
             .select("event_type", arm_a.alias("__a"),
                     cents.alias("__c"))
             .groupBy("event_type")
             .agg(F.count(F.when(F.col("__a"), 1)).alias("n_a"),
                  F.count(F.when(~F.col("__a"), 1)).alias("n_b"),
                  F.sum(F.when(F.col("__a"), F.col("__c"))
                        .otherwise(0)).alias("s_a"),
                  F.sum(F.when(~F.col("__a"), F.col("__c"))
                        .otherwise(0)).alias("s_b"),
                  F.sum(F.when(F.col("__a"),
                               F.col("__c") * F.col("__c"))
                        .otherwise(0)).alias("q_a"),
                  F.sum(F.when(~F.col("__a"),
                               F.col("__c") * F.col("__c"))
                        .otherwise(0)).alias("q_b")))
    na, nb = [F.col(c).cast("double") for c in ("n_a", "n_b")]
    sa, sb = [F.col(c).cast("double") / 100 for c in ("s_a", "s_b")]
    qa, qb = [F.col(c).cast("double") / 10000 for c in ("q_a", "q_b")]
    ma, mb = sa / na, sb / nb
    va = (qa - sa * sa / na) / (na - 1)
    vb = (qb - sb * sb / nb) / (nb - 1)
    z = (ma - mb) / F.sqrt(va / na + vb / nb)
    return stats.select(
        "event_type", "n_a", "n_b",
        F.round(ma, 6).alias("mean_a"),
        F.round(mb, 6).alias("mean_b"),
        F.round(ma - mb, 6).alias("lift"),
        F.round(z, 6).alias("z_stat"))


def seasonal_profile(events: DataFrame) -> DataFrame:
    """Seasonality heatmap: (day-of-week × hour-of-day) event counts
    and exact-decimal mean value per cell — the load/usage profile
    behind capacity planning and anomaly baselines (a z-score against
    the WRONG baseline flags every Monday morning as an anomaly).

    One partial-aggregated scan; the grouping key caps at 168 cells,
    so the shuffle is constant-size at any corpus scale.  dow is
    normalized to 0=Sunday (Spark's dayofweek is 1-based)."""
    return (events
            .groupBy((F.dayofweek("ts") - 1).alias("dow"),
                     F.hour("ts").alias("hour"))
            .agg(F.count(F.lit(1)).alias("n"),
                 (F.sum(dec("value")).cast("double")
                  / F.count(F.lit(1))).alias("mean_value"))
            .withColumn("mean_value", F.round("mean_value", 6)))


def cusum_changepoint(events: DataFrame) -> DataFrame:
    """CUSUM changepoint detection per event type: the time index
    maximizing |n·S_t − t·S_n| (the cumulative-sum statistic scaled by
    n so every term stays EXACT decimal — the unscaled Σ(x_i − mean)
    needs the non-exact mean; scaling by n preserves the argmax).

    A level shift in the series puts the max exactly at the shift
    point (pinned in test_pipeline on a planted step).  Arithmetic
    runs in integer CENTS (value rounded to 2dp × 100 → bigint): a
    decimal formulation overflows the 38-digit cap at n·S_t, while
    cents keep |stat| ≤ n·Σ|x|·100 ≈ 1e17 — exact in int64.  One
    ordered window pass per type (running sum + row_number share the
    WindowExec sort) + the per-type total from the same partition
    frame; argmax via one rank window — all on the single
    (event_type)-keyed shuffle.  Deterministic: integer arithmetic +
    (|stat| desc, ts, event_id) tie order."""
    cents = (dec("value") * 100).cast("bigint")
    wt = Window.partitionBy("event_type")
    wo = wt.orderBy("ts", "event_id")
    staged = events.select("event_type", "ts", "event_id",
                           cents.alias("__c"))
    run = F.sum("__c").over(wo.rowsBetween(Window.unboundedPreceding, 0))
    total = F.sum("__c").over(wt)
    n = F.count(F.lit(1)).over(wt)
    t = F.row_number().over(wo)
    stat = n * run - t * total
    scored = staged.select(
        "event_type", "ts", "event_id",
        n.alias("n"), stat.alias("__stat"))
    pick = Window.partitionBy("event_type").orderBy(
        F.abs(F.col("__stat")).desc(), "ts", "event_id")
    return (scored
            .withColumn("__rk", F.row_number().over(pick))
            .filter(F.col("__rk") == 1)
            .select("event_type", F.col("ts").alias("changepoint_ts"),
                    F.col("event_id").alias("changepoint_event_id"),
                    F.round(F.col("__stat").cast("double")
                            / (F.col("n") * 100), 6)
                    .alias("cusum_stat"), "n"))


def funnel_ordered(events: DataFrame) -> DataFrame:
    """Ordered three-step funnel (signup → click → purchase): per
    user, the earliest signup, the earliest click strictly after it,
    and the earliest purchase strictly after that click — then one
    summary row of stage reach (the product-analytics conversion
    funnel; `q_funnel_join` is the pairwise-window special case).

    Each stage is a tiny per-user aggregate joined to the next stage's
    filtered events — three user-keyed shuffles over progressively
    smaller sets (stage N's input is only users who reached stage
    N-1), never a window over the whole stream and never a 3-way
    event self-join (which multiplies).  Chaining by MIN timestamps
    makes the reach counts deterministic and order-insensitive."""
    def first_after(etype: str, after: DataFrame,
                    ts_col: str) -> DataFrame:
        e = events.filter(F.col("event_type") == etype) \
            .select("user_id", "ts")
        j = e.join(after, "user_id").filter(F.col("ts") > F.col(ts_col))
        return j.groupBy("user_id").agg(F.min("ts").alias(etype + "_ts"))

    signup = (events.filter(F.col("event_type") == "signup")
              .groupBy("user_id").agg(F.min("ts").alias("signup_ts")))
    click = first_after("click", signup, "signup_ts")
    purchase = first_after("purchase", click, "click_ts")
    return (signup
            .join(click, "user_id", "left")
            .join(purchase, "user_id", "left")
            .agg(F.count(F.lit(1)).alias("n_signup"),
                 F.count("click_ts").alias("n_click_after"),
                 F.count("purchase_ts").alias("n_purchase_after")))


def autocorr_lag1(events: DataFrame) -> DataFrame:
    """Per-type lag-1 autocorrelation of ``value`` over each user's
    event sequence (pairs pooled across users) — the does-this-metric-
    have-memory diagnostic that decides between carrying state
    (EWMA/forecasting) and treating points as independent.

    Same sufficient-statistics discipline as `group_ols_trend`:
    Pearson r needs six exact sums over (prev, cur) pairs — one LAG
    window keyed (user, type) so a click only pairs with the user's
    previous click, then one partial-agg pass (type shuffle),
    five decimal/integer numbers per group through the exchange;
    sqrt/division run last on exact sums, so the result is
    bit-reproducible at any partitioning."""
    w = Window.partitionBy("user_id", "event_type").orderBy("ts",
                                                            "event_id")
    pairs = (events
             .select("event_type", dec("value").alias("y"),
                     F.lag(dec("value")).over(w).alias("x"))
             .filter(F.col("x").isNotNull()))
    stats = (pairs.groupBy("event_type")
             .agg(F.count(F.lit(1)).alias("n"),
                  F.sum("x").alias("sx"), F.sum("y").alias("sy"),
                  F.sum(F.col("x") * F.col("y")).alias("sxy"),
                  F.sum(F.col("x") * F.col("x")).alias("sxx"),
                  F.sum(F.col("y") * F.col("y")).alias("syy")))
    n, sx, sy, sxy, sxx, syy = [F.col(c).cast("double")
                                for c in ("n", "sx", "sy", "sxy",
                                          "sxx", "syy")]
    r = ((n * sxy - sx * sy)
         / F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)))
    return stats.select("event_type", "n",
                        F.round(r, 6).alias("autocorr_lag1"))


SPECS: dict[str, Spec] = {
    "q_lag_lead": Spec(
        lambda spark, sf: lag_lead_deltas(load_table(spark, sf, "events")),
        """
        SELECT user_id, event_id, ts,
               date_diff('second', lag(ts)  OVER w, ts) AS secs_since_prev,
               date_diff('second', ts, lead(ts) OVER w) AS secs_to_next
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        """,
        "LAG/LEAD offset windows — per-user inter-event gaps (§2.B gaps)"),
    "q_sliding_window": Spec(
        lambda spark, sf: sliding_window(load_table(spark, sf, "events")),
        """
        SELECT time_bucket(INTERVAL '30 minutes', ts)
                 - k.k * INTERVAL '30 minutes' AS window_start,
               event_type, COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        FROM events, (SELECT unnest(range(4)) AS k) k
        GROUP BY 1, 2
        """,
        "C6 sliding-window aggregate (batch twin of sliding_window_stream)"),
    "q_tumbling_window": Spec(
        lambda spark, sf: tumbling_window(load_table(spark, sf, "events")),
        """
        SELECT date_trunc('hour', ts) AS window_start, event_type,
               COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        FROM events GROUP BY 1, 2
        """,
        "C6 tumbling-window aggregate (batch twin of streaming/windowed.py)"),
    "q_sessionize": Spec(
        lambda spark, sf: sessionize(load_table(spark, sf, "events")),
        """
        WITH flagged AS (
          SELECT user_id, ts, event_id,
                 CASE WHEN lag(ts) OVER w IS NULL
                        OR ts > lag(ts) OVER w + INTERVAL '30 minutes'
                      THEN 1 ELSE 0 END AS new_sess
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), sessions AS (
          SELECT user_id,
                 SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                     ROWS UNBOUNDED PRECEDING) AS session_id
          FROM flagged
        ), per_session AS (
          SELECT user_id, session_id, COUNT(*) AS n_events
          FROM sessions GROUP BY user_id, session_id
        )
        SELECT user_id,
               CAST(MAX(session_id) AS BIGINT) AS n_sessions,
               CAST(SUM(n_events) AS BIGINT) AS n_events,
               MAX(n_events) AS max_session_events
        FROM per_session GROUP BY user_id
        """,
        "sessionization addition (stateful-op analog; SURVEY.md §2.C)"),
    "q_session_window": Spec(
        lambda spark, sf: session_window_agg(load_table(spark, sf, "events")),
        """
        WITH flagged AS (
          SELECT user_id, ts, value,
                 CASE WHEN lag(ts) OVER w IS NULL
                        OR ts >= lag(ts) OVER w + INTERVAL '30 minutes'
                      THEN 1 ELSE 0 END AS new_sess
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        ), sess AS (
          SELECT user_id, ts, value,
                 SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                     ROWS UNBOUNDED PRECEDING) AS sid
          FROM flagged)
        SELECT user_id, MIN(ts) AS session_start,
               MAX(ts) + INTERVAL '30 minutes' AS session_end,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        FROM sess GROUP BY user_id, sid
        """,
        "gap-merged session aggregates via Spark's native session_window "
        "(single aggregate, streaming-capable; oracle = island detection)"),
    "q_funnel_join": Spec(
        lambda spark, sf: funnel_join(load_table(spark, sf, "events")),
        """
        SELECT c.event_id AS l_id, p.event_id AS r_id, c.user_id,
               c.ts AS l_ts, p.ts AS r_ts,
               c.event_type AS l_type, p.event_type AS r_type
        FROM (SELECT * FROM events WHERE event_type = 'click') c
        JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
          ON c.user_id = p.user_id
         AND p.ts > c.ts AND p.ts <= c.ts + INTERVAL '30 minutes'
        """,
        "funnel/attribution join — batch twin of the watermarked "
        "stream-stream join (streaming/windowed.stream_stream_join)"),
    "q_gapfill": Spec(
        lambda spark, sf: gapfill_hourly(load_table(spark, sf, "events")),
        """
        WITH ev AS (SELECT * FROM events WHERE user_id < 50),
        hourly AS (
          SELECT user_id, date_trunc('hour', ts) AS hour,
                 COUNT(*) AS n,
                 CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                   AS sum_value
          FROM ev GROUP BY 1, 2),
        spans AS (SELECT user_id, MIN(hour) AS h0, MAX(hour) AS h1
                  FROM hourly GROUP BY user_id),
        grid AS (
          SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR))
                   AS hour
          FROM spans)
        SELECT g.user_id, g.hour,
               CAST(COALESCE(h.n, 0) AS BIGINT) AS n_events,
               h.sum_value,
               last_value(h.sum_value IGNORE NULLS) OVER (
                 PARTITION BY g.user_id ORDER BY g.hour
                 ROWS UNBOUNDED PRECEDING) AS locf_value,
               h.n IS NULL AS is_gap
        FROM grid g LEFT JOIN hourly h USING (user_id, hour)
        """,
        "hourly gap-fill with zero counts + locf sums (hypertable "
        "time_bucket_gapfill/locf shape; complements q_resample_ffill's "
        "observation-level carry)"),
    "q_anomaly_zscore": Spec(
        lambda spark, sf: anomaly_zscore(load_table(spark, sf, "events")),
        """
        WITH stats AS (
          SELECT event_type, COUNT(*) AS n_type,
                 CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS s1,
                 CAST(SUM(CAST(value AS DECIMAL(18,2))
                          * CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS s2
          FROM events GROUP BY event_type)
        SELECT e.event_id, e.event_type, e.ts, e.value,
               ROUND((e.value - (s1 / n_type)) /
                     sqrt((s2 / n_type) - (s1 / n_type) * (s1 / n_type)), 6)
                 AS z
        FROM events e JOIN stats USING (event_type)
        WHERE abs(ROUND((e.value - (s1 / n_type)) /
                        sqrt((s2 / n_type) - (s1 / n_type) * (s1 / n_type)),
                        6)) >= 2.5
        """,
        "per-type z-score outliers (decimal-exact moments, broadcast "
        "stats join — no window over the stream)"),
    "q_resample_ffill": Spec(
        lambda spark, sf: resample_ffill(load_table(spark, sf, "events")),
        """
        WITH bounds AS (
          SELECT user_id, date_trunc('hour', MIN(ts)) AS t0,
                 date_trunc('hour', MAX(ts)) AS t1
          FROM events GROUP BY user_id),
        grid AS (
          SELECT user_id, unnest(generate_series(t0, t1, INTERVAL 1 HOUR))
                   AS slot
          FROM bounds),
        hourly AS (
          SELECT user_id, date_trunc('hour', ts) AS slot, value AS obs
          FROM (SELECT user_id, ts, event_id, value,
                       ROW_NUMBER() OVER (PARTITION BY user_id,
                                          date_trunc('hour', ts)
                                          ORDER BY ts DESC, event_id DESC)
                         AS rn
                FROM events)
          WHERE rn = 1)
        SELECT g.user_id, g.slot,
               last_value(h.obs IGNORE NULLS) OVER (
                 PARTITION BY g.user_id ORDER BY g.slot
                 ROWS UNBOUNDED PRECEDING) AS value_ffill,
               h.obs IS NULL AS is_gap
        FROM grid g LEFT JOIN hourly h
          ON g.user_id = h.user_id AND g.slot = h.slot
        """,
        "regular-grid resample + forward fill (sensor gap-filling; "
        "grid generated per user, deterministic slot-last observation)"),
    "q_funnel_left": Spec(
        lambda spark, sf: funnel_left_join(load_table(spark, sf, "events")),
        """
        SELECT c.event_id AS l_id, p.event_id AS r_id, c.user_id,
               c.ts AS l_ts, p.ts AS r_ts,
               c.event_type AS l_type, p.event_type AS r_type
        FROM (SELECT * FROM events WHERE event_type = 'click') c
        LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
          ON c.user_id = p.user_id
         AND p.ts > c.ts AND p.ts <= c.ts + INTERVAL '30 minutes'
        """,
        "LEFT OUTER funnel join (keeps non-converters) — batch twin of "
        "the watermarked outer stream-stream join, whose null rows "
        "flush on watermark expiry"),
    "q_asof_join": Spec(
        lambda spark, sf: asof_last_click(load_table(spark, sf, "events")),
        """
        SELECT p.event_id, p.user_id, p.ts, c.ts AS last_click_ts
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
          ON p.user_id = c.user_id AND p.ts >= c.ts
        """,
        "as-of join addition (union+window composition; SURVEY.md §2.B gaps)"),
    "q_retention_cohort": Spec(
        lambda spark, sf: retention_cohorts(load_table(spark, sf, "events")),
        """
        WITH firsts AS (
          SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_ts
          FROM events GROUP BY user_id),
        active AS (
          SELECT user_id, date_trunc('week', ts) AS week_ts FROM events)
        SELECT CAST(cohort_ts AS DATE) AS cohort_week,
               CAST(date_diff('day', cohort_ts, week_ts) / 7 AS INT)
                 AS weeks_since,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
        FROM active JOIN firsts USING (user_id)
        GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "weekly cohort retention matrix (first-touch week × weeks-since "
        "distinct actives) — product-analytics staple over events"),
    "q_scd2": Spec(
        lambda spark, sf: scd2_history(load_table(spark, sf, "events")),
        """
        WITH ordered AS (
          SELECT user_id, ts, event_id, event_type,
                 lag(event_type) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) AS prev_type
          FROM events),
        changes AS (
          SELECT user_id, ts, event_id, event_type
          FROM ordered
          WHERE prev_type IS NULL OR event_type <> prev_type)
        SELECT user_id,
               CAST(ROW_NUMBER() OVER w2 AS INT) AS version,
               event_type AS state,
               ts AS valid_from,
               lead(ts) OVER w2 AS valid_to,
               lead(ts) OVER w2 IS NULL AS is_current
        FROM changes
        WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id)
        """,
        "SCD type-2 dimension history from the event stream (CDC "
        "complement to q_merge_upsert: run-collapse + interval windows, "
        "one user shuffle shared by both passes)"),
    "q_ewma": Spec(
        lambda spark, sf: ewma_halflife(load_table(spark, sf, "events")),
        "\n        SELECT user_id, event_id, ts, value,\n"
        "               ROUND(CAST((" + " + ".join(
            f"CASE WHEN lag(value, {j}) OVER w IS NOT NULL THEN "
            f"CAST(lag(value, {j}) OVER w AS DECIMAL(18,2)) * "
            f"CAST({0.5 ** j!r} AS DECIMAL(9,7)) "
            f"ELSE CAST(0 AS DECIMAL(28,9)) END"
            for j in range(EWMA_TAPS)) + ") AS DOUBLE)\n"
        "               / CAST((" + " + ".join(
            f"CASE WHEN lag(value, {j}) OVER w IS NOT NULL THEN "
            f"CAST({0.5 ** j!r} AS DECIMAL(9,7)) "
            f"ELSE CAST(0 AS DECIMAL(9,7)) END"
            for j in range(EWMA_TAPS)) + ") AS DOUBLE), 6) AS ewma\n"
        "        FROM events\n"
        "        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)\n",
        "half-life EWMA smoothing: 8-tap exact-decimal window "
        "convolution (alpha=1/2 so weights are exact in both binary "
        "and decimal — bit-reproducible, parallel, one user shuffle)"),
    "q_abtest": Spec(
        lambda spark, sf: abtest_readout(load_table(spark, sf,
                                                    "events")),
        (lambda na="CAST(n_a AS DOUBLE)", nb="CAST(n_b AS DOUBLE)",
                sa="(CAST(s_a AS DOUBLE) / 100)",
                sb="(CAST(s_b AS DOUBLE) / 100)",
                qa="(CAST(q_a AS DOUBLE) / 10000)",
                qb="(CAST(q_b AS DOUBLE) / 10000)":
         f"""
        WITH t AS (
          SELECT event_type,
                 (CAST('0x' || substr(md5('{AB_SEED}:'
                      || CAST(user_id AS VARCHAR)), 1, 8) AS BIGINT)
                  % 2 = 0) AS a,
                 CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS c
          FROM events),
        stats AS (
          SELECT event_type,
                 CAST(COUNT(CASE WHEN a THEN 1 END) AS BIGINT) AS n_a,
                 CAST(COUNT(CASE WHEN NOT a THEN 1 END) AS BIGINT)
                   AS n_b,
                 CAST(SUM(CASE WHEN a THEN c ELSE 0 END) AS BIGINT)
                   AS s_a,
                 CAST(SUM(CASE WHEN NOT a THEN c ELSE 0 END) AS BIGINT)
                   AS s_b,
                 CAST(SUM(CASE WHEN a THEN c * c ELSE 0 END) AS BIGINT)
                   AS q_a,
                 CAST(SUM(CASE WHEN NOT a THEN c * c ELSE 0 END)
                      AS BIGINT) AS q_b
          FROM t GROUP BY event_type)
        SELECT event_type, n_a, n_b,
               ROUND({sa} / {na}, 6) AS mean_a,
               ROUND({sb} / {nb}, 6) AS mean_b,
               ROUND({sa} / {na} - {sb} / {nb}, 6) AS lift,
               ROUND(({sa} / {na} - {sb} / {nb})
                     / sqrt((({qa} - {sa} * {sa} / {na}) / ({na} - 1))
                              / {na}
                            + (({qb} - {sb} * {sb} / {nb}) / ({nb} - 1))
                              / {nb}), 6) AS z_stat
        FROM stats
        """)(),
        "A/B experiment readout: deterministic salted-hash 50/50 "
        "assignment + Welch z from exact per-arm sufficient statistics "
        "(one conditional-agg pass; the moment-method family with "
        "q_group_ols/q_autocorr)"),
    "q_seasonal_profile": Spec(
        lambda spark, sf: seasonal_profile(load_table(spark, sf,
                                                      "events")),
        """
        SELECT CAST(date_part('dow', ts) AS INT) AS dow,
               CAST(date_part('hour', ts) AS INT) AS hour,
               CAST(COUNT(*) AS BIGINT) AS n,
               ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                     / COUNT(*), 6) AS mean_value
        FROM events GROUP BY 1, 2
        """,
        "seasonality heatmap: (dow x hour) counts + exact-decimal "
        "mean per cell — constant 168-key shuffle at any corpus "
        "scale; the baseline grid anomaly scoring should z-score "
        "against"),
    "q_cusum": Spec(
        lambda spark, sf: cusum_changepoint(load_table(spark, sf,
                                                       "events")),
        """
        WITH c AS (
          SELECT event_type, ts, event_id,
                 CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS cents
          FROM events),
        scored AS (
          SELECT event_type, ts, event_id,
                 CAST(COUNT(*) OVER wt AS BIGINT) AS n,
                 CAST(COUNT(*) OVER wt AS BIGINT)
                   * SUM(cents) OVER wo
                 - ROW_NUMBER() OVER wo * SUM(cents) OVER wt AS stat
          FROM c
          WINDOW wt AS (PARTITION BY event_type),
                 wo AS (PARTITION BY event_type ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING))
        SELECT event_type, ts AS changepoint_ts,
               event_id AS changepoint_event_id,
               ROUND(CAST(stat AS DOUBLE) / (n * 100), 6) AS cusum_stat,
               n
        FROM (SELECT *, ROW_NUMBER() OVER (
                 PARTITION BY event_type
                 ORDER BY abs(stat) DESC, ts, event_id) AS rk
              FROM scored)
        WHERE rk = 1
        """,
        "CUSUM changepoint per type: argmax |n*S_t - t*S_n| in exact "
        "integer cents (decimal would overflow 38 digits at n*S_t); "
        "one ordered window pass + one rank window on a single "
        "type-keyed shuffle"),
    "q_funnel_ordered": Spec(
        lambda spark, sf: funnel_ordered(load_table(spark, sf,
                                                    "events")),
        """
        WITH s AS (
          SELECT user_id, MIN(ts) AS signup_ts FROM events
          WHERE event_type = 'signup' GROUP BY user_id),
        c AS (
          SELECT e.user_id, MIN(e.ts) AS click_ts
          FROM events e JOIN s USING (user_id)
          WHERE e.event_type = 'click' AND e.ts > s.signup_ts
          GROUP BY e.user_id),
        p AS (
          SELECT e.user_id, MIN(e.ts) AS purchase_ts
          FROM events e JOIN c USING (user_id)
          WHERE e.event_type = 'purchase' AND e.ts > c.click_ts
          GROUP BY e.user_id)
        SELECT CAST(COUNT(*) AS BIGINT) AS n_signup,
               CAST(COUNT(c.click_ts) AS BIGINT) AS n_click_after,
               CAST(COUNT(p.purchase_ts) AS BIGINT) AS n_purchase_after
        FROM s LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)
        """,
        "ordered 3-step conversion funnel (signup -> click -> "
        "purchase): MIN-timestamp chaining through progressively "
        "smaller per-user aggregates — no stream-wide window, no "
        "multiplying 3-way self-join"),
    "q_autocorr": Spec(
        lambda spark, sf: autocorr_lag1(load_table(spark, sf, "events")),
        """
        WITH pairs AS (
          SELECT event_type,
                 CAST(value AS DECIMAL(18,2)) AS y,
                 lag(CAST(value AS DECIMAL(18,2))) OVER (
                   PARTITION BY user_id, event_type
                   ORDER BY ts, event_id) AS x
          FROM events),
        stats AS (
          SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
                 SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy,
                 SUM(x * x) AS sxx, SUM(y * y) AS syy
          FROM pairs WHERE x IS NOT NULL GROUP BY event_type)
        SELECT event_type, n,
               ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                     / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                             - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                            * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                               - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))),
                     6) AS autocorr_lag1
        FROM stats
        """,
        "per-type lag-1 autocorrelation from six exact sufficient "
        "statistics (moment-method family with q_group_ols: one LAG "
        "window + one partial-agg pass, bit-reproducible)"),
    "q_group_ols": Spec(
        lambda spark, sf: group_ols_trend(load_table(spark, sf,
                                                     "events")),
        (lambda s: f"""
        WITH pts AS (
          SELECT event_type,
                 epoch_us(ts) // 3600000000 AS x,
                 CAST(value AS DECIMAL(18,2)) AS y
          FROM events),
        stats AS (
          SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(x) AS BIGINT) AS sx,
                 SUM(y) AS sy,
                 SUM(CAST(x AS DECIMAL(18,0)) * y) AS sxy,
                 CAST(SUM(x * x) AS BIGINT) AS sxx
          FROM pts GROUP BY event_type)
        SELECT event_type, n,
               ROUND({s}, 6) AS slope,
               ROUND((CAST(sy AS DOUBLE) - ({s}) * CAST(sx AS DOUBLE))
                     / CAST(n AS DOUBLE), 6) AS intercept
        FROM stats
        """)("(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)"
             " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
             " / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)"
             " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"),
        "per-group closed-form OLS trend: the five sufficient "
        "statistics (n, Sx, Sy, Sxy, Sxx) aggregate exactly in one "
        "partial-agg pass — in-engine grouped regression, 5 numbers "
        "per group through the shuffle, no ML library, no Python"),
    "q_temporal_join": Spec(
        lambda spark, sf: temporal_scd2_join(load_table(spark, sf,
                                                        "events")),
        """
        WITH nonp AS (SELECT * FROM events
                      WHERE event_type <> 'purchase'),
        ordered AS (
          SELECT user_id, ts, event_id, event_type,
                 lag(event_type) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) AS prev_type
          FROM nonp),
        changes AS (
          SELECT user_id, ts, event_id, event_type
          FROM ordered
          WHERE prev_type IS NULL OR event_type <> prev_type),
        hist AS (
          SELECT user_id, event_type AS state, ts AS valid_from,
                 lead(ts) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS valid_to
          FROM changes),
        facts AS (SELECT user_id, event_id, ts FROM events
                  WHERE event_type = 'purchase')
        SELECT f.event_id, f.user_id, f.ts, h.state AS state_at
        FROM facts f LEFT JOIN hist h
          ON f.user_id = h.user_id
         AND h.valid_from <= f.ts
         AND (h.valid_to > f.ts OR h.valid_to IS NULL)
        """,
        "temporal SCD2 dimension lookup: interval-containment join "
        "rewritten as union + last-ignore-nulls window (linear, one "
        "user shuffle — never a BETWEEN range join); oracle is the "
        "BETWEEN join, proving the rewrite"),
    "q_first_touch": Spec(
        lambda spark, sf: first_touch(load_table(spark, sf, "events")),
        """
        SELECT user_id, event_type, ts AS first_ts,
               event_id AS first_event_id, value AS first_value
        FROM (SELECT *, ROW_NUMBER() OVER (
                 PARTITION BY user_id, event_type
                 ORDER BY ts, event_id) AS rn
              FROM events)
        WHERE rn = 1
        """,
        "earliest event per (user, type) — replay-stable batch twin of "
        "streaming first-arrival dedup (windowed.py::dedup_stream; "
        "WindowGroupLimit keeps one row per key in flight)"),
}
