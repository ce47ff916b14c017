"""Synthetic HealthKit export.zip generator (FIXTURES.md §A shapes).

Generates the canonical fixture — 10 ActivitySummary rows, Records of
two types, one fully-loaded Workout (duplicate metadata keys, 4 events,
3 statistics, a 644-point GPX route) plus one bare Workout — entirely
from the published HealthKit export format; nothing is copied from the
reference archive.
"""

from __future__ import annotations

import os
import zipfile

N_TRKPT = 644
ROUTE_PATH = "/workout-routes/route_2020-02-24_10.18am.gpx"


def _records_xml() -> str:
    rows = []
    # walking speed: REAL values
    for i, v in enumerate(("2.95276", "3.10000", "2.50000")):
        rows.append(
            f'<Record type="HKQuantityTypeIdentifierWalkingSpeed" unit="mi/hr" '
            f'value="{v}" sourceName="Phone" sourceVersion="16.1.2" '
            f'creationDate="2022-12-15 18:0{i}:02 -0800" '
            f'startDate="2022-12-15 17:58:5{i} -0800" '
            f'endDate="2022-12-15 17:59:0{i} -0800">'
            '<MetadataEntry key="Test Entry" value="FooBar"/>'
            '</Record>')
    # step count: INTEGER values, one record with no metadata
    for i, v in enumerate(("100", "250")):
        rows.append(
            f'<Record type="HKQuantityTypeIdentifierStepCount" unit="count" '
            f'value="{v}" sourceName="Phone" '
            f'creationDate="2022-12-16 08:0{i}:00 -0800" '
            f'startDate="2022-12-16 08:0{i}:00 -0800" '
            f'endDate="2022-12-16 08:0{i}:30 -0800"/>')
    return "\n".join(rows)


def _workout_xml() -> str:
    md = []
    # duplicate keys (reference appends both, we keep LAST: value 1 wins)
    md.append('<MetadataEntry key="HKIndoorWorkout" value="0"/>')
    md.append('<MetadataEntry key="HKIndoorWorkout" value="1"/>')
    md.append('<MetadataEntry key="HKAverageMETs" value="4.30455 kcal/hr·kg"/>')
    md.append('<MetadataEntry key="HKTimeZone" value="America/Los_Angeles"/>')
    md.append('<MetadataEntry key="HKElevationAscended" value="1025 cm"/>')
    events = [
        '<WorkoutEvent type="HKWorkoutEventTypeSegment" date="2020-02-24 10:18:12 -0800" duration="8.1" durationUnit="min"/>',
        '<WorkoutEvent type="HKWorkoutEventTypePause" date="2020-02-24 10:26:16 -0800"/>',
        '<WorkoutEvent type="HKWorkoutEventTypeResume" date="2020-02-24 10:28:00 -0800"/>',
        '<WorkoutEvent type="HKWorkoutEventTypeSegment" date="2020-02-24 10:28:00 -0800" duration="13.8" durationUnit="min"/>',
    ]
    stats = [
        '<WorkoutStatistics type="HKQuantityTypeIdentifierHeartRate" startDate="2020-02-24 10:18:12 -0800" endDate="2020-02-24 10:41:48 -0800" average="149" minimum="120" maximum="167" unit="count/min"/>',
        '<WorkoutStatistics type="HKQuantityTypeIdentifierActiveEnergyBurned" startDate="2020-02-24 10:18:12 -0800" endDate="2020-02-24 10:41:48 -0800" sum="221.224" unit="Cal"/>',
        '<WorkoutStatistics type="HKQuantityTypeIdentifierDistanceWalkingRunning" startDate="2020-02-24 10:18:12 -0800" endDate="2020-02-24 10:41:48 -0800" sum="2.235" unit="mi"/>',
    ]
    route = (
        '<WorkoutRoute sourceName="Watch" sourceVersion="6.1.3" '
        'creationDate="2020-02-24 10:42:21 -0800" '
        'startDate="2020-02-24 10:18:12 -0800" endDate="2020-02-24 10:41:48 -0800">'
        '<MetadataEntry key="HKMetadataKeySyncVersion" value="2"/>'
        f'<FileReference path="{ROUTE_PATH}"/>'
        '</WorkoutRoute>')
    full = (
        '<Workout workoutActivityType="HKWorkoutActivityTypeRunning" '
        'duration="23.59" durationUnit="min" totalDistance="2.2351" '
        'totalDistanceUnit="mi" totalEnergyBurned="221.224" '
        'totalEnergyBurnedUnit="Cal" sourceName="Watch" sourceVersion="6.1.3" '
        'creationDate="2020-02-24 10:42:18 -0800" '
        'startDate="2020-02-24 10:18:12 -0800" '
        'endDate="2020-02-24 10:41:48 -0800">'
        + "".join(md) + "".join(events) + "".join(stats) + route
        + "</Workout>")
    bare = (
        '<Workout workoutActivityType="HKWorkoutActivityTypeYoga" '
        'duration="30.0" durationUnit="min" sourceName="Watch" '
        'creationDate="2020-03-01 09:00:00 -0800" '
        'startDate="2020-03-01 08:30:00 -0800" '
        'endDate="2020-03-01 09:00:00 -0800"/>')
    return full + "\n" + bare


def _summaries_xml() -> str:
    return "\n".join(
        f'<ActivitySummary dateComponents="2020-02-{15 + i:02d}" '
        f'activeEnergyBurned="{300 + i}.25" activeEnergyBurnedGoal="400" '
        f'activeEnergyBurnedUnit="Cal" appleExerciseTime="{30 + i}" '
        f'appleExerciseTimeGoal="30" appleStandHours="{10 + i % 3}" '
        f'appleStandHoursGoal="12"/>'
        for i in range(10))


def export_xml() -> str:
    return (
        '<?xml version="1.0" encoding="UTF-8"?>\n'
        '<HealthData locale="en_US">\n'
        ' <ExportDate value="2023-01-06 13:04:32 -0800"/>\n'
        ' <Me HKCharacteristicTypeIdentifierBiologicalSex="HKBiologicalSexNotSet"'
        ' HKCharacteristicTypeIdentifierBloodType="HKBloodTypeNotSet"/>\n'
        + _records_xml() + "\n" + _workout_xml() + "\n" + _summaries_xml()
        + "\n</HealthData>\n")


def route_gpx(n_points: int = N_TRKPT) -> str:
    pts = []
    for i in range(n_points):
        lat = 34.011000 + i * 1e-5
        lon = -118.495000 - i * 1e-5
        # strictly increasing ISO times, second granularity:
        total = 18 * 3600 + 18 * 60 + i  # 18:18:00Z + i seconds
        t = f"2020-02-24T{total // 3600:02d}:{(total // 60) % 60:02d}:{total % 60:02d}Z"
        pts.append(
            f'<trkpt lat="{lat:.6f}" lon="{lon:.6f}"><ele>6.3</ele>'
            f'<time>{t}</time></trkpt>')
    return (
        '<?xml version="1.0" encoding="UTF-8"?>\n'
        '<gpx version="1.1" creator="Apple Health Export">'
        '<trk><name>Route 2020-02-24</name><trkseg>'
        + "".join(pts) + '</trkseg></trk></gpx>')


def build_export_zip(path: str) -> str:
    """Write the canonical fixture zip; returns the path."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("apple_health_export/export.xml", export_xml())
        zf.writestr("apple_health_export" + ROUTE_PATH, route_gpx())
    return path
