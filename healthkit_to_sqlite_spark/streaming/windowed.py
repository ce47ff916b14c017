"""Streaming operators over an events-shaped stream.

The reference is strictly batch (two sequential XML scans,
SURVEY.md §1.1); this module is the driver-north-star C6 surface:
the same logical aggregations as operators/timeseries.py, expressed
as incremental Structured Streaming plans.

- ``tumbling_window_stream``: window(ts, 1h) aggregate with a
  watermark bounding state: late rows beyond the watermark are
  dropped, closed windows are evicted — state size is O(open windows ×
  types) regardless of stream length (the 100 TB/day property).
- ``sessionize_stream``: gap-based sessions via
  ``applyInPandasWithState`` — the custom-stateful-operator escape
  hatch for semantics window functions can't express incrementally.
  State per user = running session bounds; timeouts flush idle users.

Both take any streaming DataFrame with (event_id, ts, user_id,
event_type, value) — tests feed a file stream of the driver's events
parquet, production would use Kafka with identical code downstream of
the source.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T


def tumbling_window_stream(events: DataFrame,
                           window: str = "1 hour",
                           watermark: str = "2 hours") -> DataFrame:
    """Watermarked tumbling-window aggregate (batch twin:
    timeseries.tumbling_window; same group keys and measures)."""
    return (events
            .withWatermark("ts", watermark)
            .groupBy(F.window("ts", window).alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
                 .alias("sum_value"))
            .select(F.col("w.start").alias("window_start"), "event_type",
                    "n", "sum_value"))


def sliding_window_stream(events: DataFrame,
                          window: str = "2 hours",
                          slide: str = "30 minutes",
                          watermark: str = "4 hours") -> DataFrame:
    """Watermarked sliding-window aggregate: each event lands in
    window/slide overlapping buckets (4 here).  State is still bounded
    — open windows × types — because the watermark closes windows as
    event time advances.  The batch twin is the same expression without
    the watermark (Spark's window() works identically in batch)."""
    return (events
            .withWatermark("ts", watermark)
            .groupBy(F.window("ts", window, slide).alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
                 .alias("sum_value"))
            .select(F.col("w.start").alias("window_start"), "event_type",
                    "n", "sum_value"))


def session_window_stream(events: DataFrame, gap: str = "30 minutes",
                          watermark: str = "2 hours") -> DataFrame:
    """Watermarked NATIVE session windows (gap-merged dynamic windows)
    — the streaming twin of timeseries.session_window_agg, same
    grouping expression plus the watermark.  State per (user, open
    session) only; a session closes (and its state evicts) once the
    watermark passes session_end — the property that makes per-entity
    sessionization viable on an unbounded stream.  The lag+cumsum
    formulation (`sessionize`) cannot run incrementally at all; this
    is why the native operator earns its place."""
    return (events
            .withWatermark("ts", watermark)
            .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
                 .alias("sum_value"))
            .select("user_id", F.col("w.start").alias("session_start"),
                    F.col("w.end").alias("session_end"),
                    "n_events", "sum_value"))


def dedup_stream(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Streaming exact dedup by event_id with bounded state:
    ``dropDuplicatesWithinWatermark`` keeps each key only until the
    watermark passes it, so state is O(keys per watermark window) —
    the property that makes exact dedup viable on an unbounded stream
    (plain dropDuplicates on a stream retains ALL keys forever).
    Batch twin: dropDuplicates(["event_id"])."""
    return (events
            .withWatermark("ts", watermark)
            .dropDuplicatesWithinWatermark(["event_id"]))


def stream_stream_join(left: DataFrame, right: DataFrame,
                       max_lag_minutes: int = 30,
                       watermark: str = "2 hours") -> DataFrame:
    """Watermarked stream-stream inner join: pair each left event with
    the right-stream events of the SAME user that follow it within
    ``max_lag_minutes`` (the funnel/attribution join — "which action
    followed which trigger").

    The two state-boundedness obligations Spark imposes on
    stream-stream joins are both explicit here: (1) watermarks on BOTH
    sides bound how late either stream can be; (2) the time-range
    predicate bounds how long a buffered row can still find partners —
    together they let the join evict state instead of buffering both
    streams forever (state is O(events per watermark+lag horizon per
    user)).  An equi-key (user_id) keeps the join a hash shuffle, never
    a cross-stream scan.  Batch twin: identical join condition on
    bounded frames — equivalence pinned in tests."""
    l = (left.select(F.col("event_id").alias("l_id"), "user_id",
                     F.col("ts").alias("l_ts"),
                     F.col("event_type").alias("l_type"))
         .withWatermark("l_ts", watermark))
    r = (right.select(F.col("event_id").alias("r_id"),
                      F.col("user_id").alias("r_user"),
                      F.col("ts").alias("r_ts"),
                      F.col("event_type").alias("r_type"))
         .withWatermark("r_ts", watermark))
    cond = ((F.col("user_id") == F.col("r_user"))
            & (F.col("r_ts") > F.col("l_ts"))
            & (F.col("r_ts") <= F.col("l_ts")
               + F.expr(f"INTERVAL {int(max_lag_minutes)} MINUTES")))
    return (l.join(r, cond)
            .select("l_id", "r_id", "user_id", "l_ts", "r_ts",
                    "l_type", "r_type"))


def stream_stream_left_join(left: DataFrame, right: DataFrame,
                            max_lag_minutes: int = 30,
                            watermark: str = "2 hours") -> DataFrame:
    """Watermarked stream-stream LEFT OUTER join — the semantics the
    inner funnel join can't pin: a left event with NO follower within
    the lag window must still be emitted (with nulls), and Structured
    Streaming can only do that once the watermark proves no matching
    right row can still arrive.  So null-joined rows are emitted ON
    WATERMARK EXPIRY, not on arrival — the outer join is where the
    eviction machinery becomes user-visible output rather than just
    state hygiene.  Same two boundedness obligations as the inner
    form (two-sided watermarks + time-range bound), same equi-key
    hash-shuffle shape.  Batch twin: the identical condition as a
    plain left join — equivalence pinned in tests (with availableNow,
    all watermarks advance past the bounded input, so every
    unmatched row flushes)."""
    l = (left.select(F.col("event_id").alias("l_id"), "user_id",
                     F.col("ts").alias("l_ts"),
                     F.col("event_type").alias("l_type"))
         .withWatermark("l_ts", watermark))
    r = (right.select(F.col("event_id").alias("r_id"),
                      F.col("user_id").alias("r_user"),
                      F.col("ts").alias("r_ts"),
                      F.col("event_type").alias("r_type"))
         .withWatermark("r_ts", watermark))
    cond = ((F.col("user_id") == F.col("r_user"))
            & (F.col("r_ts") > F.col("l_ts"))
            & (F.col("r_ts") <= F.col("l_ts")
               + F.expr(f"INTERVAL {int(max_lag_minutes)} MINUTES")))
    return (l.join(r, cond, "left_outer")
            .select("l_id", "r_id", "user_id", "l_ts", "r_ts",
                    "l_type", "r_type"))


def enrich_stream(events: DataFrame, dim: DataFrame) -> DataFrame:
    """Stream-static enrichment join: the static dimension is
    broadcast to every task, so the stream never shuffles — the
    standard shape for joining a firehose against reference data.
    The static side is re-resolved per micro-batch (picks up dim
    refreshes); the batch twin is the same join on a batch frame."""
    return events.join(F.broadcast(dim), "event_type")


SESSION_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("session_start", T.TimestampType()),
    T.StructField("session_end", T.TimestampType()),
    T.StructField("n_events", T.LongType()),
])

_STATE_SCHEMA = "start long, end long, n long"  # epoch-micros bounds


def sessionize_stream(events: DataFrame,
                      gap_minutes: int = 30,
                      idle_timeout_ms: int = 3_600_000) -> DataFrame:
    """Custom stateful sessionization (batch twin:
    timeseries.sessionize).  Emits a row per CLOSED session; open
    sessions flush on processing-time timeout.

    applyInPandasWithState contract honored here: the function is
    closure-complete (no module references — executors don't share the
    driver's sys.path) and handles both data batches and timeouts."""
    gap_us = gap_minutes * 60 * 1_000_000

    def fn(key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        user_id = key[0]
        closed = []

        if state.hasTimedOut:
            if state.exists:
                s, e, n = state.get
                closed.append((user_id, s, e, n))
                state.remove()
        else:
            ts_us = []
            for pdf in pdfs:
                ts_us.extend(int(t.value // 1000) for t in pd.to_datetime(pdf["ts"]))
            ts_us.sort()
            if state.exists:
                cur = list(state.get)
            else:
                cur = None
            for t in ts_us:
                if cur is None:
                    cur = [t, t, 1]
                elif t - cur[1] > gap_us:
                    closed.append((user_id, cur[0], cur[1], cur[2]))
                    cur = [t, t, 1]
                else:
                    cur[1] = t
                    cur[2] += 1
            if cur is not None:
                state.update(tuple(cur))
                state.setTimeoutDuration(idle_timeout_ms)

        if closed:
            yield pd.DataFrame({
                "user_id": [c[0] for c in closed],
                "session_start": [pd.Timestamp(c[1], unit="us") for c in closed],
                "session_end": [pd.Timestamp(c[2], unit="us") for c in closed],
                "n_events": [c[3] for c in closed],
            })

    return (events
            .groupBy("user_id")
            .applyInPandasWithState(
                fn,
                outputStructType=SESSION_SCHEMA,
                stateStructType=_STATE_SCHEMA,
                outputMode="append",
                timeoutConf=GroupStateTimeout.ProcessingTimeTimeout))
