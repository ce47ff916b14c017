"""Ingest-parity tests: the fixture-zip golden assertions from
FIXTURES.md §A.3 — the real-assertion version of the reference's
CI smoke run (SURVEY.md §5.1: exit-code-only)."""

from __future__ import annotations

import json
import sqlite3

import pytest
from pyspark.sql import functions as F


def test_table_set(hk_tables):
    assert set(hk_tables) == {
        "Workout", "ActivitySummary",
        "HKQuantityTypeIdentifierWalkingSpeed",
        "HKQuantityTypeIdentifierStepCount"}


def test_activity_summary(hk_tables):
    df = hk_tables["ActivitySummary"]
    assert df.count() == 10
    types = dict(df.dtypes)
    assert types["dateComponents"] == "date"
    assert types["activeEnergyBurned"] == "double"
    assert types["activeEnergyBurnedGoal"] == "bigint"
    assert df.agg(F.sum("appleExerciseTime")).collect()[0][0] == sum(range(30, 40))


def test_record_typing_and_metadata(hk_tables):
    ws = hk_tables["HKQuantityTypeIdentifierWalkingSpeed"]
    assert ws.count() == 3
    types = dict(ws.dtypes)
    assert types["value"] == "double"
    assert types["creationDate"].startswith("timestamp")
    # metadata key with a space survives as a column (reference
    # backtick-quotes such identifiers, core.rs:78-83)
    assert "metadata_Test Entry" in ws.columns
    assert ws.select("metadata_Test Entry").distinct().collect()[0][0] == "FooBar"

    sc = hk_tables["HKQuantityTypeIdentifierStepCount"]
    assert sc.count() == 2
    # integer-valued record column widens to bigint, not double
    assert dict(sc.dtypes)["value"] == "bigint"


def test_workout_nested_columns(hk_tables):
    w = hk_tables["Workout"].orderBy("workoutActivityType")
    rows = {r["workoutActivityType"]: r for r in w.collect()}
    run = rows["HKWorkoutActivityTypeRunning"]

    events = json.loads(run["workoutEvents"])
    assert len(events) == 4
    assert events[0]["type"] == "HKWorkoutEventTypeSegment"
    assert events[0]["duration"] == 8.1
    # order preserved (document order by date)
    assert [e["type"] for e in events][1] == "HKWorkoutEventTypePause"

    stats = json.loads(run["workoutStatistics"])
    assert set(stats) == {
        "HKQuantityTypeIdentifierHeartRate",
        "HKQuantityTypeIdentifierActiveEnergyBurned",
        "HKQuantityTypeIdentifierDistanceWalkingRunning"}
    assert stats["HKQuantityTypeIdentifierHeartRate"]["average"] == "149"

    geom = json.loads(run["geometry"])
    assert geom["type"] == "LineString"
    assert len(geom["coordinates"]) == 644
    # [lon, lat] ordering (reference core.rs:612-615), first point first
    lon, lat = geom["coordinates"][0]
    assert lon == pytest.approx(-118.495, abs=1e-5)
    assert lat == pytest.approx(34.011, abs=1e-5)
    # monotone along the route
    assert geom["coordinates"][-1][1] > lat


def test_workout_duplicate_metadata_last_wins(hk_tables):
    run = hk_tables["Workout"].filter(
        F.col("workoutActivityType") == "HKWorkoutActivityTypeRunning").collect()[0]
    # fixture repeats HKIndoorWorkout with 0 then 1 → LAST_WIN keeps 1
    assert run["metadata_HKIndoorWorkout"] == 1
    # mixed-unit text stays TEXT
    assert run["metadata_HKAverageMETs"] == "4.30455 kcal/hr·kg"


def test_bare_workout_empty_json(hk_tables):
    yoga = hk_tables["Workout"].filter(
        F.col("workoutActivityType") == "HKWorkoutActivityTypeYoga").collect()[0]
    # reference writes [] / {} for absent children (core.rs:639-650)
    assert yoga["workoutEvents"] == "[]"
    assert yoga["workoutStatistics"] == "{}"
    assert yoga["geometry"] == "{}"
    assert yoga["route_path"] is None


def test_sqlite_sink_roundtrip(hk_tables, tmp_path):
    from healthkit_to_sqlite_spark.sinks.database import write_sqlite
    db = str(tmp_path / "healthkit.db")
    write_sqlite(hk_tables, db, drop=True)
    con = sqlite3.connect(db)
    tables = {r[0] for r in con.execute(
        "SELECT name FROM sqlite_master WHERE type='table'")}
    assert tables == set(hk_tables)
    n = con.execute('SELECT COUNT(*) FROM "ActivitySummary"').fetchone()[0]
    assert n == 10
    # the README's flagship query shape runs against our output
    # (reference README.md:33-46)
    total = con.execute(
        "SELECT SUM(duration)/60 FROM `Workout` "
        "WHERE creationDate BETWEEN '2020-01-01' AND '2021-01-01'").fetchone()[0]
    assert total == pytest.approx((23.59 + 30.0) / 60)
    geom = con.execute(
        "SELECT json_extract(geometry, '$.type') FROM `Workout` "
        "WHERE workoutActivityType='HKWorkoutActivityTypeRunning'").fetchone()[0]
    assert geom == "LineString"
    con.close()
