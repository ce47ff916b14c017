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
    # numeric attrs are JSON numbers, not strings (the reference's
    # f32-else-string policy, core.rs:487-491); text attrs stay strings
    hr = stats["HKQuantityTypeIdentifierHeartRate"]
    assert hr["average"] == 149 and isinstance(hr["average"], (int, float))
    assert isinstance(hr["unit"], str)
    dist = stats["HKQuantityTypeIdentifierDistanceWalkingRunning"]
    assert dist["sum"] == 2.235 and isinstance(dist["sum"], float)

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


def test_reference_readme_queries_on_sqlite_output(hk_tables, tmp_path):
    """Run the reference README's own example SQL (README.md:33-65)
    verbatim-shape against OUR converted SQLite file — the literal
    'switch engines, keep your queries' guarantee.  Dates adapted to
    the fixture's February 2020 workout."""
    from healthkit_to_sqlite_spark.sinks.database import write_sqlite

    db = str(tmp_path / "healthkit.db")
    write_sqlite(hk_tables, db, drop=True)
    con = sqlite3.connect(db)

    # README.md:33-46 — total duration over a date range + activity OR
    total_duration = con.execute("""
        select sum(duration) / 60 as total_duration
        from workout
        where (creationDate between '2020-02-01' and '2020-02-29')
          and (workoutActivityType = 'HKWorkoutActivityTypeWalking' or
               workoutActivityType = 'HKWorkoutActivityTypeRunning' or
               workoutActivityType = 'HKWorkoutActivityTypeHiking')
    """).fetchone()[0]
    assert abs(total_duration - 23.59 / 60) < 1e-9

    # README.md:51-65 — SUM over json_extract into workoutStatistics
    total_miles = con.execute("""
        select sum(json_extract(workoutStatistics,
                   '$.HKQuantityTypeIdentifierDistanceWalkingRunning.sum'))
               as total_distance_miles
        from workout
        where (creationDate between '2020-02-01' and '2020-02-29')
    """).fetchone()[0]
    assert abs(total_miles - 2.235) < 1e-9
    con.close()


def test_cli_end_to_end(hk_zip, tmp_path):
    """The reference CLI surface (main.rs:12-29) end to end:
    python -m healthkit_to_sqlite_spark <zip> sqlite://<db> --drop
    --yes --quiet, then open the database as a Datasette user would."""
    import subprocess
    import sys as _sys

    db = str(tmp_path / "cli_out.db")
    proc = subprocess.run(
        [_sys.executable, "-m", "healthkit_to_sqlite_spark",
         str(hk_zip), f"sqlite://{db}", "--drop", "--yes", "--quiet"],
        cwd="/root/repo", capture_output=True, text=True, timeout=300)
    assert proc.returncode == 0, proc.stderr[-2000:]
    con = sqlite3.connect(db)
    tables = {r[0] for r in con.execute(
        "select name from sqlite_master where type='table'")}
    assert {"Workout", "ActivitySummary"} <= tables
    assert any(t.startswith("HK") for t in tables)
    n = con.execute('select count(*) from "Workout"').fetchone()[0]
    assert n == 2
    con.close()


def test_offset_timestamps_keep_local_wall_clock(spark):
    """HealthKit datetimes carry explicit offsets; the reference stores
    the original text, so its README date-range queries compare LOCAL
    time (core.rs:199-200).  A plain cast would rebase a device-local
    23:30 -0800 to next-day 07:30 UTC and flip day-boundary queries;
    the cascade must keep the wall-clock instead."""
    from healthkit_to_sqlite_spark.operators.schema_infer import (
        apply_inferred_types)
    df = spark.createDataFrame(
        [("2020-03-01 23:30:00 -0800",), ("2020-03-02 01:00:00 +0100",)],
        "creationDate string")
    out = apply_inferred_types(df)
    assert dict(out.dtypes)["creationDate"] == "timestamp_ntz"
    vals = sorted(r[0].isoformat(sep=" ") for r in out.collect())
    assert vals == ["2020-03-01 23:30:00", "2020-03-02 01:00:00"]


def test_rare_class_split_detects_boundary_loss(tmp_path):
    """A Workout longer than the overlap window that straddles a chunk
    boundary cannot be captured by the span regex; the open-tag census
    must detect the miss and abandon the side file (callers then read
    the class from the full export.xml) instead of silently dropping
    rows."""
    from healthkit_to_sqlite_spark.sources.healthkit import (
        _split_rare_classes)
    big = "x" * 3000  # element body ≫ the (test-sized) overlap
    xml = (
        "<HealthData>\n"
        + "<pad>" + "p" * 2000 + "</pad>\n"
        + f'<Workout workoutActivityType="A" note="{big}"></Workout>\n'
        + '<ActivitySummary dateComponents="2020-01-01"/>\n'
        + "</HealthData>\n")
    p = tmp_path / "export.xml"
    p.write_text(xml)
    import warnings as _w
    with _w.catch_warnings(record=True) as caught:
        _w.simplefilter("always")
        outs = _split_rare_classes(str(p), str(tmp_path),
                                   chunk_size=4096, overlap=512)
    assert "Workout" not in outs          # loss detected → no side file
    assert "ActivitySummary" in outs      # unaffected class still split
    assert any("Workout" in str(w.message) for w in caught)

    # sanity: with a big-enough overlap the same file splits cleanly
    ok_dir = tmp_path / "ok"
    ok_dir.mkdir()
    outs2 = _split_rare_classes(str(p), str(ok_dir),
                                chunk_size=4096, overlap=4096)
    assert "Workout" in outs2


def test_convert_many_archives(spark, tmp_path_factory):
    """Fleet ingest: two archives → one catalog, every row tagged with
    its archive stem; per-type tables hold the union of both."""
    from tests.hk_fixture import build_export_zip
    from healthkit_to_sqlite_spark.sources.healthkit import convert_many

    d = tmp_path_factory.mktemp("fleet")
    zips = [build_export_zip(str(d / f"user{i}.zip")) for i in (1, 2)]
    tables = convert_many(spark, zips, str(d / "staging"))

    assert {"Workout", "ActivitySummary",
            "HKQuantityTypeIdentifierWalkingSpeed",
            "HKQuantityTypeIdentifierStepCount"} <= set(tables)
    # both archives contribute; archive column distinguishes them
    w = tables["Workout"]
    assert w.count() == 4  # 2 workouts per archive
    assert ({r[0] for r in w.select("archive").distinct().collect()}
            == {"user1", "user2"})
    steps = tables["HKQuantityTypeIdentifierStepCount"]
    assert steps.count() == 4  # 2 step records per archive
    per_archive = dict(steps.groupBy("archive").count().collect())
    assert per_archive == {"user1": 2, "user2": 2}
    # typed columns survive the union + fan-out
    assert dict(steps.dtypes)["value"] == "bigint"
