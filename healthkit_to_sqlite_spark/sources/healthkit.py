"""HealthKit export.zip ingestion — the reference's entire ETL surface,
re-expressed Spark-first.

Reference pipeline (/root/reference/src/core.rs): open zip (48-51),
stream-parse export.xml twice — schema pass (52-62, 85-132) then insert
pass (63-73, 381-718) — flattening MetadataEntry children to
``metadata_<key>`` columns (452-474), collecting WorkoutEvent children
to a JSON array (541-543, 639-642), WorkoutStatistics to a JSON object
keyed by type (544-548, 643-646), and joining each workout to its GPX
route file inside the zip to build GeoJSON LineString geometry
(556-633).

Spark-native re-expression:

- zip staging is driver-side (A1): Spark has no zip codec; unpack once
  to a staging dir, then every subsequent step is distributed.
- ONE schema-inferring distributed read per element class via the
  native XML source (rowTag=Record/Workout/ActivitySummary) replaces
  both streaming passes; the reader's inference implements the
  *widening* policy we chose over the reference's first-seen-wins
  (SURVEY.md §1.2, §4.4-2).
- MetadataEntry flatten = map_from_entries + per-key projection
  (LAST_WIN dedup conf replaces the reference's duplicate-column
  INSERT quirk, §4.4-5).
- Workout children = struct/array transforms + to_json at the edge.
- Route join = a real equi-join against a GPX DataFrame (broadcast;
  route sets are small) instead of per-row random zip access.
- table-per-type fan-out (A4) = filtered views / partitionBy writes.

At 100 TB (hypothetically many exports): staging parallelizes per
archive; every downstream op is a plain shuffle/groupBy pipeline with
no driver-side row handling except the bounded distinct metadata-key /
record-type collections (cardinality ~100s — the same bound the
reference's BTreeMap schema carries).
"""

from __future__ import annotations

import os
import re
import zipfile
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..session import configure

EXPORT_XML = "apple_health_export/export.xml"
ARCHIVE_ROOT = "apple_health_export"


@dataclass(frozen=True)
class StagedExport:
    """Filesystem layout after zip staging (A1)."""
    root: str          # staging dir containing apple_health_export/
    export_xml: str    # path to export.xml
    routes_dir: str    # dir with workout-routes/*.gpx (may not exist)
    #: small per-class side files for the RARE element classes — a
    #: rowTag XML read must scan the whole file even when its class is
    #: 0.01% of it, so Workout/ActivitySummary reads go against these
    workouts_xml: str | None = None
    summaries_xml: str | None = None
    #: directory of export.xml re-chunked at <Record boundaries — the
    #: XML source does not split single files (isSplitable=false for
    #: rowTag parsing), so one big export.xml would parse on ONE task;
    #: N chunk files give the Record read N-way parallelism
    records_dir: str | None = None


_RARE_CLASS_RE = {
    # Workout may nest children but never another <Workout>; an
    # unescaped literal '</Workout>' inside an attribute value is the
    # only false terminator and does not occur in HealthKit exports
    "Workout": re.compile(rb"<Workout\b[^>]*/>|<Workout\b.*?</Workout>",
                          re.DOTALL),
    "ActivitySummary": re.compile(rb"<ActivitySummary\b[^>]*/>"),
}


def _split_rare_classes(export_xml: str, out_dir: str,
                        chunk_size: int = 16 << 20,
                        overlap: int = 1 << 20) -> dict[str, str]:
    """One streaming pass over export.xml extracting the low-frequency
    element classes into small side files.  O(file) like the
    reference's pass 1 (core.rs:52-62), but it buys each subsequent
    rare-class XML read a scan of kilobytes instead of the whole
    archive.  Chunked with an ``overlap`` window (default ≫ any single
    Workout element) so spans crossing chunk boundaries are captured;
    an element that still straddles a cut is *detected* by the open-tag
    census below and the class falls back to a full-file read."""
    outs = {}
    bufs = {k: [b"<HealthData>\n"] for k in _RARE_CLASS_RE}
    seen: dict[str, set[tuple[int, int]]] = {k: set() for k in _RARE_CLASS_RE}
    # independent open-tag census: an element longer than the overlap
    # window would start before a chunk boundary and end after it, so
    # the span regex never sees it complete and silently drops it; the
    # open-tag count (short pattern, can't itself span a cut given the
    # overlap) detects the loss so we can fall back to the full file
    opens: dict[str, set[int]] = {k: set() for k in _RARE_CLASS_RE}
    open_rx = {k: re.compile(rb"<" + k.encode() + rb"[\s/>]")
               for k in _RARE_CLASS_RE}
    with open(export_xml, "rb") as f:
        base = 0
        carry = b""
        while True:
            chunk = f.read(chunk_size)
            data = carry + chunk
            if not data:
                break
            for klass, rx in _RARE_CLASS_RE.items():
                for m in rx.finditer(data):
                    span = (base + m.start(), base + m.end())
                    if span not in seen[klass]:
                        seen[klass].add(span)
                        bufs[klass].append(m.group(0) + b"\n")
                for m in open_rx[klass].finditer(data):
                    opens[klass].add(base + m.start())
            if not chunk:
                break
            carry = data[-overlap:]
            base += len(data) - len(carry)
    for klass, parts in bufs.items():
        if len(opens[klass]) != len(seen[klass]):
            # pathological export: at least one element crossed a chunk
            # boundary un-captured — omit the side file; callers fall
            # back to reading the class from the full export.xml
            import warnings
            warnings.warn(
                f"{klass}: {len(opens[klass])} open tags vs "
                f"{len(seen[klass])} extracted spans; side-file "
                "extraction abandoned for this class (full-file read)")
            continue
        parts.append(b"</HealthData>\n")
        # NB: no leading underscore — Spark's file index treats _*/.*
        # paths as hidden and silently reads nothing
        path = os.path.join(out_dir, f"side-{klass.lower()}s.xml")
        with open(path, "wb") as out:
            out.writelines(parts)
        outs[klass] = path
    return outs


def _chunk_records(export_xml: str, out_dir: str,
                   n_target: int | None = None) -> str | None:
    """Re-chunk export.xml into ~2×cpus files, cutting only at
    ``<Record `` element starts, so the Record rowTag read runs one
    task per chunk instead of one task for the whole file (the XML
    source cannot split a single file).  Streaming, constant memory,
    sequential IO — the Spark-side analog of why the reference's pass
    structure is O(file) (core.rs:52-73).  Every chunk is wrapped in a
    root element; content between records (e.g. a Workout spanning a
    cut) stays inside exactly one chunk, and rowTag scanning ignores
    any non-Record tail.  Returns the chunk dir, or None when the file
    is too small to be worth splitting."""
    size = os.path.getsize(export_xml)
    n_target = n_target or min(64, max(2, 2 * (os.cpu_count() or 8)))
    target = max(1 << 20, size // n_target)
    if size < 2 << 20:
        return None
    chunk_dir = os.path.join(out_dir, "records-chunks")
    os.makedirs(chunk_dir, exist_ok=True)
    idx = 0

    def flush(payload: bytes) -> None:
        nonlocal idx
        path = os.path.join(chunk_dir, f"records-{idx:05d}.xml")
        with open(path, "wb") as out:
            out.write(b"<HealthData>\n")
            out.write(payload)
            out.write(b"\n</HealthData>\n")
        idx += 1

    buf = b""
    preamble_dropped = False
    with open(export_xml, "rb") as f:
        while True:
            block = f.read(16 << 20)
            if not block:
                break
            buf += block
            if not preamble_dropped:
                # drop declaration/DTD/<HealthData …> opener: each chunk
                # gets its own root, and a second root (or a mid-file
                # <?xml?>) is malformed XML the reader rejects
                first = buf.find(b"<Record ")
                if first < 0:
                    continue
                buf = buf[first:]
                preamble_dropped = True
            while len(buf) >= target + (1 << 16):
                cut = buf.rfind(b"<Record ", 0, target)
                if cut <= 0:
                    break  # no boundary in window; accumulate more
                flush(buf[:cut])
                buf = buf[cut:]
    if not preamble_dropped:
        return None  # no <Record> elements at all
    # strip the original closing root tag (our wrapper adds its own)
    end = buf.rfind(b"</HealthData>")
    if end >= 0:
        buf = buf[:end]
    if buf.strip():
        flush(buf)
    return chunk_dir if idx > 1 else None


def stage_zip(zip_path: str, staging_dir: str,
              split_rare: bool = True) -> StagedExport:
    """A1: unpack export.zip to a staging directory (driver-side; the
    zip format is not splittable).  Mirrors reference core.rs:48-56 but
    once, up front — the reference re-opens the archive per route file
    (core.rs:580-582).  With ``split_rare`` the staging pass also
    carves the rare element classes into side files (see
    _split_rare_classes)."""
    with zipfile.ZipFile(zip_path) as zf:
        safe = [n for n in zf.namelist()
                if not (n.startswith("/") or ".." in n.split("/"))]
        zf.extractall(staging_dir, members=safe)
    root = os.path.join(staging_dir, ARCHIVE_ROOT)
    export_xml = os.path.join(staging_dir, EXPORT_XML)
    side = _split_rare_classes(export_xml, staging_dir) if split_rare else {}
    return StagedExport(
        root=root,
        export_xml=export_xml,
        routes_dir=os.path.join(root, "workout-routes"),
        workouts_xml=side.get("Workout"),
        summaries_xml=side.get("ActivitySummary"),
        records_dir=_chunk_records(export_xml, staging_dir)
        if split_rare else None)


def _strip_attr_prefix(df: DataFrame) -> DataFrame:
    """XML attributes arrive as ``_name``; surface them as ``name``
    (reference stores bare attribute names, core.rs:216-227)."""
    renames = {c: c[1:] for c in df.columns if c.startswith("_")}
    for old, new in renames.items():
        df = df.withColumnRenamed(old, new)
    return df


def _as_array(df: DataFrame, col: str) -> DataFrame:
    """Normalize the XML reader's struct-vs-array ambiguity: a child
    element appearing once per parent infers as struct, repeated as
    array.  Downstream code always sees an array."""
    if col not in df.columns:
        return df
    if not isinstance(df.schema[col].dataType, T.ArrayType):
        # a null struct must become [], not [null] (a parent without
        # that child has no entries)
        df = df.withColumn(col, F.when(F.col(col).isNotNull(),
                                       F.array(F.col(col)))
                           .otherwise(F.array().cast(
                               T.ArrayType(df.schema[col].dataType))))
    else:
        df = df.withColumn(col, F.coalesce(
            F.col(col), F.array().cast(df.schema[col].dataType)))
    return df


def read_element(spark: SparkSession, xml_path: str, row_tag: str) -> DataFrame:
    """A2: one distributed XML read per element class (replaces both of
    the reference's sequential scans).

    Attributes are read as RAW STRINGS (inferSchema=false): typing is
    applied per output table by the widening cascade
    (operators.schema_infer.apply_inferred_types), matching the
    reference's per-table schema maps (core.rs:216-257) rather than one
    global schema — e.g. Record@value must be INTEGER for StepCount but
    REAL for WalkingSpeed."""
    configure(spark)
    df = (spark.read.format("xml")
          .option("rowTag", row_tag)
          .option("inferSchema", "false")
          .load(xml_path))
    return _strip_attr_prefix(df)


def _metadata_map(col: str = "MetadataEntry"):
    """MetadataEntry array → map.  LAST_WIN dedup (session conf) gives
    the deterministic duplicate-key policy the reference lacks
    (core.rs:468-472 appends duplicate columns; SURVEY.md §4.4-5)."""
    return F.map_from_entries(
        F.transform(F.col(col),
                    lambda m: F.struct(m["_key"].alias("key"),
                                       m["_value"].cast("string").alias("value"))))


def flatten_metadata(df: DataFrame, keys: list[str] | None = None) -> DataFrame:
    """A6: pivot metadata entries to ``metadata_<key>`` wide columns.

    ``keys=None`` collects the distinct key set first (bounded: same
    cardinality the reference's schema BTreeMap holds in memory,
    core.rs:231-257).  Pass explicit keys in pipelines that must avoid
    the extra job."""
    if "MetadataEntry" not in df.columns:
        return df
    df = _as_array(df, "MetadataEntry")
    df = df.withColumn("__md", _metadata_map())
    if keys is None:
        keys = [r[0] for r in
                (df.select(F.explode(F.map_keys("__md")).alias("k"))
                 .distinct().orderBy("k").collect())]
    for k in keys:
        df = df.withColumn(f"metadata_{k}", F.col("__md").getItem(k))
    return df.drop("__md", "MetadataEntry")


def read_records(spark: SparkSession, xml_path: str) -> DataFrame:
    """All <Record> rows, metadata flattened, with their ``type``
    discriminator (table name in the reference, core.rs:311-313).
    Columns stay raw strings here; typing happens per type-table in
    ``record_tables`` (per-table schemas, core.rs:216-227)."""
    return flatten_metadata(read_element(spark, xml_path, "Record"))


def read_activity_summaries(spark: SparkSession, xml_path: str) -> DataFrame:
    """<ActivitySummary> rows (fixed table, core.rs:23, 358-365),
    typed by the widening cascade."""
    from ..operators.schema_infer import apply_inferred_types
    return apply_inferred_types(read_element(spark, xml_path, "ActivitySummary"))


def read_gpx_routes(spark: SparkSession, routes_dir: str) -> DataFrame:
    """A11: GPX route files → one row per route with GeoJSON-shaped
    LineString geometry.

    Reference parses each file imperatively per workout row
    (core.rs:588-627, [lon, lat] pairs in document order, dropping
    ele/time/speed…).  Spark form: distributed read of all route files
    (rowTag=trkpt), group by source file, order points by time (GPX
    track time is monotone; document order surrogate), collect
    coordinates.  Returns empty-schema DF if no routes exist."""
    schema = T.StructType([
        T.StructField("route_path", T.StringType()),
        T.StructField("geometry", T.StructType([
            T.StructField("type", T.StringType()),
            T.StructField("coordinates",
                          T.ArrayType(T.ArrayType(T.DoubleType()))),
        ])),
        T.StructField("n_points", T.LongType()),
    ])
    if not os.path.isdir(routes_dir) or not any(
            n.endswith(".gpx") for n in os.listdir(routes_dir)):
        return spark.createDataFrame([], schema)
    configure(spark)
    pts = (spark.read.format("xml").option("rowTag", "trkpt")
           .option("pathGlobFilter", "*.gpx")
           .load(routes_dir)
           .select(F.col("_lat").cast("double").alias("lat"),
                   F.col("_lon").cast("double").alias("lon"),
                   F.col("time").cast("timestamp").alias("t"),
                   F.col("_metadata.file_path").alias("file_path")))
    # archive-relative path: '<...>/apple_health_export/workout-routes/x.gpx'
    # → '/workout-routes/x.gpx' (join key; reference core.rs:567-581)
    rel = F.regexp_extract("file_path", r"apple_health_export(/.*)$", 1)
    coord = F.struct(F.col("t"), F.array(F.col("lon"), F.col("lat")).alias("c"))
    return (pts.groupBy(rel.alias("route_path"))
            .agg(F.transform(F.array_sort(F.collect_list(coord)),
                             lambda s: s.c).alias("coordinates"),
                 F.count(F.lit(1)).alias("n_points"))
            .select("route_path",
                    F.struct(F.lit("LineString").alias("type"),
                             F.col("coordinates")).alias("geometry"),
                    "n_points"))


def read_workouts(spark: SparkSession, xml_path: str,
                  routes: DataFrame | None = None) -> DataFrame:
    """<Workout> rows with the reference's three synthesized columns
    (core.rs:639-650): workoutEvents JSON array, workoutStatistics JSON
    object keyed by statistic type, geometry GeoJSON LineString.

    Empty-children workouts keep '[]' / '{}' (reference quirk
    preserved, SURVEY.md §4.4-6); a missing route file leaves '{}'
    (reference hard-errors, core.rs:580-582 — we degrade gracefully
    and record the divergence here)."""
    df = read_element(spark, xml_path, "Workout")
    # raw child columns get __-prefixed temp names: Spark resolves
    # column names case-insensitively, so raw `WorkoutStatistics` would
    # collide with the synthesized `workoutStatistics`
    for raw in ("WorkoutEvent", "WorkoutStatistics", "WorkoutRoute"):
        if raw in df.columns:
            df = df.withColumnRenamed(raw, f"__{raw}")

    # --- workoutEvents: ordered JSON array (A7; core.rs:541-543) ---
    # every attribute passes through (no fixed list); values follow the
    # reference's f32-else-string JSON policy via _unquote_numeric_json
    if "__WorkoutEvent" in df.columns:
        df = _as_array(df, "__WorkoutEvent")
        ev_fields = sorted(f[1:] for f in _struct_fields(df, "__WorkoutEvent")
                           if f.startswith("_"))
        ev = F.transform(
            F.col("__WorkoutEvent"),
            lambda e: F.struct(*[e[f"_{f}"].cast("string").alias(f)
                                 for f in ev_fields]))
        df = df.withColumn("workoutEvents",
                           _unquote_numeric_json(F.to_json(ev)))
    else:
        df = df.withColumn("workoutEvents", F.lit("[]"))
    df = df.withColumn("workoutEvents",
                       F.coalesce("workoutEvents", F.lit("[]")))

    # --- workoutStatistics: JSON object keyed by type (A8; core.rs:544-548) ---
    if "__WorkoutStatistics" in df.columns:
        df = _as_array(df, "__WorkoutStatistics")
        st_fields = sorted(f[1:] for f in
                           _struct_fields(df, "__WorkoutStatistics")
                           if f.startswith("_"))
        st = F.map_from_entries(F.transform(
            F.col("__WorkoutStatistics"),
            lambda s: F.struct(
                s["_type"].alias("key"),
                F.struct(*[s[f"_{f}"].cast("string").alias(f)
                           for f in st_fields]).alias("value"))))
        df = df.withColumn("workoutStatistics",
                           _unquote_numeric_json(F.to_json(st)))
    else:
        df = df.withColumn("workoutStatistics", F.lit("{}"))
    df = df.withColumn("workoutStatistics",
                       F.coalesce("workoutStatistics", F.lit("{}")))

    # --- route path + geometry join (A10/A11; core.rs:556-633) ---
    if "__WorkoutRoute" in df.columns:
        df = _as_array(df, "__WorkoutRoute")
        df = df.withColumn(
            "route_path",
            F.try_element_at(F.col("__WorkoutRoute"),
                             F.lit(1))["FileReference"]["_path"])
    else:
        df = df.withColumn("route_path", F.lit(None).cast("string"))
    if routes is not None:
        df = (df.join(F.broadcast(routes), "route_path", "left")
              .withColumn("geometry",
                          F.coalesce(F.to_json("geometry"), F.lit("{}")))
              .drop("n_points"))
    else:
        df = df.withColumn("geometry", F.lit("{}"))

    df = df.drop("__WorkoutEvent", "__WorkoutStatistics", "__WorkoutRoute")
    from ..operators.schema_infer import apply_inferred_types
    df = flatten_metadata(df)
    # type the scalar attribute + metadata columns; the synthesized
    # JSON columns classify as TEXT and stay strings
    return apply_inferred_types(df)


#: a complete quoted JSON *value* that is a valid JSON number literal;
#: anchored on the preceding ':' so keys never match.  Deliberately
#: excluded (documented edges, all forms the reference's f32 parse
#: accepts but whose verbatim unquoting would emit invalid or
#: misleading JSON): leading-zero strings ("0081" → reference 81.0),
#: bare-fraction forms (".5" / "5." → reference 0.5 / 5.0 — not valid
#: JSON number literals verbatim), and beyond-f32-range literals
#: ("1e39" → reference saturates to inf, unrepresentable in JSON).
#: All stay quoted strings here; HealthKit exports emit none of these
#: forms in practice.
_NUM_JSON_VALUE = r'":"(-?(?:0|[1-9][0-9]*)(?:\.[0-9]+)?(?:[eE][+-]?[0-9]+)?)"'


def _unquote_numeric_json(col: Column) -> Column:
    """Reference JSON policy (core.rs:476-495, f32-else-string): every
    element attribute becomes a JSON *number* when numeric, else a
    string.  Spark struct fields are single-typed, so a per-value
    number-else-string union can't be expressed in the struct itself;
    instead all values serialize as strings and numeric literals are
    unquoted in the JSON text — one JVM-side regexp_replace, map-only."""
    return F.regexp_replace(col, _NUM_JSON_VALUE, '":$1')


def _struct_fields(df: DataFrame, col: str) -> set[str]:
    dt = df.schema[col].dataType
    if isinstance(dt, T.ArrayType):
        dt = dt.elementType
    return {f.name for f in dt.fields} if isinstance(dt, T.StructType) else set()


def record_tables(records: DataFrame,
                  types: list[str] | None = None) -> dict[str, DataFrame]:
    """A4: table-per-Record-type fan-out (core.rs:311-313, 656-685).
    Returns {type: DataFrame} with all-null columns pruned per type
    (the reference's per-table column sets).  The distinct-type collect
    is bounded (~100s of HK types)."""
    from ..operators.schema_infer import apply_inferred_types

    if types is None:
        types = [r[0] for r in
                 records.select("type").distinct().orderBy("type").collect()]
    return {t: apply_inferred_types(records.filter(F.col("type") == t),
                                    drop_all_null=True)
            for t in types}


def record_tables_onepass(records: DataFrame) -> dict[str, DataFrame]:
    """A4 fan-out with schema votes for ALL types in ONE aggregate:
    ``groupBy(type)`` computing every column's unified tag + non-null
    count simultaneously (one scan, partial-aggregated map-side),
    instead of one inference pass per type (``record_tables`` — N
    extra scans for N types).  Same per-table schemas, same all-null
    column pruning; the collect is bounded at one row per HK type
    (~100s).  This is the scan-count winner whenever the staged
    relation is large and types are many."""
    from ..operators.schema_infer import cast_to_tag, type_tag, unify_tags

    str_cols = [f.name for f in records.schema.fields
                if isinstance(f.dataType, T.StringType) and f.name != "type"]
    # materialize each value's tag ONCE in a projection before the
    # aggregate: unify_tags references its input in every when-branch,
    # and codegen does not CSE across conditional branches — feeding
    # type_tag(...) in directly re-runs the try-cast cascade per branch
    # (measured 8× slower at 400k rows)
    proj = [F.col("type")]
    for i, c in enumerate(str_cols):
        proj.append(type_tag(F.col(c)).alias(f"g{i}"))
        proj.append(F.col(c).isNotNull().cast("bigint").alias(f"p{i}"))
    tagged = records.select(*proj)
    aggs = []
    for i, c in enumerate(str_cols):
        aggs.append(unify_tags(F.col(f"g{i}")).alias(f"t{i}"))
        aggs.append(F.sum(F.col(f"p{i}")).alias(f"n{i}"))
    votes = tagged.groupBy("type").agg(*aggs).collect()

    out: dict[str, DataFrame] = {}
    for row in sorted(votes, key=lambda r: r["type"]):
        t = row["type"]
        proj = [F.col("type")]
        for i, c in enumerate(str_cols):
            if row[f"n{i}"] == 0:
                continue  # column never seen for this type (core.rs:216-227)
            casted = cast_to_tag(F.col(c), row[f"t{i}"])
            proj.append(casted.alias(c) if casted is not None else F.col(c))
        out[t] = records.filter(F.col("type") == t).select(*proj)
    return out


def convert(spark: SparkSession, zip_path: str, staging_dir: str,
            stage_columnar: bool = True,
            parallel: bool = True) -> dict[str, DataFrame]:
    """E1 end-to-end (reference main.rs:88 → core.rs:42-76): stage the
    zip, read all element classes, synthesize nested columns, and
    return the logical table catalog {table_name: DataFrame} — the
    Spark analog of the converted SQLite database.

    ``stage_columnar``: materialize the parsed Record relation to
    staging parquet before the table-per-type fan-out.  The fan-out
    makes one type-discovery pass plus two passes per type (schema
    vote + output); without staging each pass re-parses the XML —
    columnar staging turns them into pruned parquet scans.  Exactly
    the reference's two-pass design rationale (core.rs:52-73), except
    pass 1 leaves behind a columnar artifact instead of being pure
    overhead.

    ``parallel``: the three element-class pipelines (workouts+routes /
    summaries / records) are independent, but each fires several small
    BLOCKING driver jobs (XML structure discovery, metadata key
    census, schema votes) whose fixed latency — not data volume —
    dominates the rare classes.  Running them on three threads lets
    the Spark scheduler interleave those jobs instead of serializing
    ~6 back-to-back round-trips (same-JVM A/B at 400k records incl.
    forcing all 6 tables: 7.5→3.7s first run, 4.7→2.8s repeat;
    identical outputs — threads only submit jobs)."""
    staged = stage_zip(zip_path, staging_dir)

    # rare classes read from their small side files (a rowTag read
    # scans its whole input; don't make it the full archive)
    def _workouts() -> DataFrame:
        routes = read_gpx_routes(spark, staged.routes_dir)
        return read_workouts(
            spark, staged.workouts_xml or staged.export_xml, routes)

    def _summaries() -> DataFrame:
        return read_activity_summaries(
            spark, staged.summaries_xml or staged.export_xml)

    # records read from the boundary-safe chunk dir → one parse task
    # per chunk (a single export.xml would parse on one task)
    def _record_tables() -> dict[str, DataFrame]:
        records = read_records(spark, staged.records_dir or staged.export_xml)
        if stage_columnar:
            # NB: no leading underscore — Spark's file index hides _* paths
            staged_records = os.path.join(staging_dir, "records-staged.parquet")
            records.write.mode("overwrite").parquet(staged_records)
            staged_df = spark.read.parquet(staged_records)
        else:
            staged_df = records
        return record_tables_onepass(staged_df)

    out: dict[str, DataFrame] = {}
    if parallel:
        from concurrent.futures import ThreadPoolExecutor
        with ThreadPoolExecutor(max_workers=3) as ex:
            fw = ex.submit(_workouts)
            fs = ex.submit(_summaries)
            fr = ex.submit(_record_tables)
            out["Workout"] = fw.result()
            out["ActivitySummary"] = fs.result()
            out.update(fr.result())
    else:
        out["Workout"] = _workouts()
        out["ActivitySummary"] = _summaries()
        out.update(_record_tables())
    return out


def convert_many(spark: SparkSession, zip_paths: list[str],
                 staging_dir: str) -> dict[str, DataFrame]:
    """Fleet ingest: N export archives → ONE logical catalog, each row
    tagged with its archive stem in an ``archive`` column.

    This is the shape the 100 TB deployment actually runs — thousands
    of per-user archives, not one file.  Staging (unzip + rare-class
    split + record chunking) is per-archive driver work, trivially
    farmed out; every Spark job then runs ONCE over the union:
    - Record chunks from all archives are read in a single multi-path
      XML scan (one task per chunk file, cross-archive parallelism —
      unionByName of per-archive reads would instead plan N separate
      scans);
    - schema votes/fan-out, workout restructuring, and route joins are
      single jobs over the union, so per-archive fixed cost is paid in
      the driver loop only, never per Spark job.
    allowMissingColumns handles archives whose attribute sets differ
    (the union schema is the per-column union, exactly the reference's
    schema-map union semantics, core.rs:216-227)."""
    out: dict[str, DataFrame] = {}
    record_dirs: list[str] = []
    workouts = []
    summaries = []
    for zp in zip_paths:
        stem = os.path.splitext(os.path.basename(zp))[0]
        sub = os.path.join(staging_dir, stem)
        staged = stage_zip(zp, sub)
        routes = read_gpx_routes(spark, staged.routes_dir)
        workouts.append(
            read_workouts(spark, staged.workouts_xml or staged.export_xml,
                          routes).withColumn("archive", F.lit(stem)))
        summaries.append(
            read_activity_summaries(
                spark, staged.summaries_xml or staged.export_xml)
            .withColumn("archive", F.lit(stem)))
        record_dirs.append(staged.records_dir or staged.export_xml)

    def union_all(dfs):
        acc = dfs[0]
        for d in dfs[1:]:
            acc = acc.unionByName(d, allowMissingColumns=True)
        return acc

    out["Workout"] = union_all(workouts)
    out["ActivitySummary"] = union_all(summaries)
    # one multi-path scan for ALL archives' record chunks; archive
    # recovered from the file path (no per-archive read loop)
    chunked = F.regexp_extract(F.col("_metadata.file_path"),
                               r"([^/]+)/records-chunks/", 1)
    whole = F.regexp_extract(F.col("_metadata.file_path"),
                             r"([^/]+)/apple_health_export/", 1)
    records = (read_element(spark, record_dirs, "Record")
               .withColumn("archive",
                           F.when(chunked != "", chunked).otherwise(whole)))
    records = flatten_metadata(records)
    staged_records = os.path.join(staging_dir, "records-staged.parquet")
    records.write.mode("overwrite").parquet(staged_records)
    records = spark.read.parquet(staged_records)
    for t, df in record_tables_onepass(records).items():
        out[t] = df
    return out
