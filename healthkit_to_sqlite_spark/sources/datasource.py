"""Spark Python Data Source for HealthKit exports:
``spark.read.format("healthkit")`` / ``spark.readStream.format("healthkit")``.

Packages the reference's ingest surface (reference core.rs:42-76: open
archive, stream-parse ``export.xml``, emit one row per ``<Record>``)
as a first-class Spark V2 source via the PySpark 4 ``DataSource`` API,
so the archive participates in normal reader planning instead of
requiring a bespoke convert() call:

- **Batch**: the driver stages the zip once and plans N *byte-range*
  input partitions, each aligned to a ``<Record `` element boundary;
  executors parse only their slice and emit **Arrow RecordBatches**
  (columnar transfer — no per-row Python→JVM pickling).  This is the
  same "one task per record-aligned chunk" parallelism the staged
  chunk-file path uses (healthkit.py:_chunk_records), expressed as a
  planner-visible source: a single ``export.xml`` parses on as many
  tasks as requested, not one.
- **Streaming**: a ``SimpleDataSourceStreamReader`` whose offset is a
  byte position in the staged XML; each micro-batch advances through
  record-aligned ranges.  Replay between committed offsets is exact
  (offsets are byte positions, parsing is deterministic), so the
  source is safely retryable under Structured Streaming's recovery
  contract.

Schema is the *published* HealthKit Record attribute set (fixed,
raw-string typed — the widening type cascade is applied per type-table
downstream, exactly like ``read_records``), plus a
``metadata map<string,string>`` column holding MetadataEntry children
(last-wins duplicate keys, SURVEY.md §4.4-5).  Unknown attributes are
folded into the metadata map rather than dropped.

Scale notes: staging must land on storage every executor can reach
(shared FS / object store) — the same contract as the parquet staging
step in ``convert``.  The zip itself is not splittable (DEFLATE), so
staging is the unavoidable driver-side step; everything after is
partition-parallel.  Parsing here is Python-side (regex over bytes,
Arrow out) — the JVM ``rowTag`` XML reader path in healthkit.py remains
the throughput champion; this source exists for API completeness and
for clusters where the spark-xml package is unavailable.
"""

from __future__ import annotations

import os
import re
import zipfile
from xml.sax.saxutils import unescape as _xml_unescape

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

#: Published Record attributes (HealthKit export format; the same set
#: the reference's schema pass discovers on real archives,
#: core.rs:216-227).  All raw strings — typing is a downstream concern.
RECORD_ATTRS = (
    "type", "sourceName", "sourceVersion", "device", "unit", "value",
    "creationDate", "startDate", "endDate",
)

SCHEMA_DDL = (
    ", ".join(f"`{a}` string" for a in RECORD_ATTRS)
    + ", `metadata` map<string,string>"
)

#: Attribute-aware tag body: XML requires '<' and '&' escaped in
#: attribute values but '>' is LEGAL there (HealthKit device strings
#: are exactly '<<HKDevice: 0x…>, …>' shaped) — a naive [^>]* open-tag
#: match truncates at that '>' and drops/merges records.  The
#: alternation skips quoted spans wholesale.
_TAG_BODY = rb'(?:[^>"]|"[^"]*")*?'
_RECORD_RE = re.compile(rb"<Record\b" + _TAG_BODY + rb"(?:/>|>.*?</Record>)",
                        re.DOTALL)
_OPEN_TAG_RE = re.compile(rb"\A<Record\b" + _TAG_BODY + rb"/?>", re.DOTALL)
_ATTR_RE = re.compile(rb'([A-Za-z_][\w.:-]*)="([^"]*)"')
_MD_RE = re.compile(rb"<MetadataEntry\b" + _TAG_BODY + rb"/>")
_ENTITIES = {"&quot;": '"', "&apos;": "'"}
#: numeric character references (&#10; / &#x2019;) — standard XML
#: writers emit these for control/non-ASCII chars; resolved BEFORE the
#: named entities so a literal '&amp;#10;' round-trips as '&#10;'.
_NUMREF_RE = re.compile(r"&#(x[0-9a-fA-F]+|[0-9]+);")


def _default_staging(path: str) -> str:
    """Default staging dir: next to the archive, falling back to a
    DETERMINISTIC per-archive tmp dir when the archive lives on
    read-only storage (the sibling default would fail at mkdir).
    Deterministic (abspath hash), not random, so concurrent/repeat
    jobs converge on one extraction (review finding)."""
    sibling = path + ".staged"
    parent = os.path.dirname(os.path.abspath(path)) or "."
    if os.access(parent, os.W_OK):
        return sibling
    import hashlib
    import tempfile
    digest = hashlib.sha256(os.path.abspath(path).encode()).hexdigest()[:16]
    return os.path.join(tempfile.gettempdir(), f"hk-staged-{digest}")


def _stage(path: str, staging_dir: str | None) -> str:
    """Resolve the source path to a readable export.xml: zips are
    extracted once driver-side (not splittable), plain XML passes
    through.

    Concurrency-safe: extraction lands in a UNIQUE temp dir (marker
    written last) and is atomically renamed into place — a dir-onto-
    existing-dir rename fails on POSIX, which is exactly the
    put-if-absent we need.  The loser of a race discards its copy and
    reads the winner's; executors therefore never observe a
    half-extracted export.xml (previous in-place extractall could be
    overwritten under a concurrent reader — review finding)."""
    if not path.endswith(".zip"):
        return path
    staging_dir = staging_dir or _default_staging(path)
    xml_path = os.path.join(staging_dir, "apple_health_export", "export.xml")
    marker = os.path.join(staging_dir, ".extract-complete")
    # completion marker, not bare existence: a crash mid-extract leaves
    # a TRUNCATED export.xml that a bare exists() check would silently
    # reuse forever (review finding); without the marker we re-extract
    if os.path.exists(xml_path) and os.path.exists(marker):
        return xml_path
    import shutil
    import uuid

    tmp = f"{staging_dir}.tmp-{uuid.uuid4().hex}"
    try:
        with zipfile.ZipFile(path) as zf:
            safe = [n for n in zf.namelist()
                    if not (n.startswith("/") or ".." in n.split("/"))]
            zf.extractall(tmp, members=safe)
        with open(os.path.join(tmp, ".extract-complete"), "w"):
            pass  # marker LAST: a renamed dir is complete by definition
        try:
            os.rename(tmp, staging_dir)
        except OSError:
            if os.path.exists(marker):
                return xml_path  # lost the race to a completed winner
            # stale partial from a pre-marker crash: replace it
            shutil.rmtree(staging_dir, ignore_errors=True)
            os.rename(tmp, staging_dir)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return xml_path


def _record_boundaries(xml_path: str, n_partitions: int,
                       probe_window: int = 4 << 20) -> list[tuple[int, int]]:
    """Record-aligned byte ranges: seek to each target offset and scan
    a bounded window forward for the next ``<Record `` start.  O(N ·
    window) driver IO regardless of file size — no full read.  Records
    never nest (published format), so every element starting in
    [start, end) also *ends* before the record that starts at ``end``;
    slicing at starts is loss-free."""
    size = os.path.getsize(xml_path)
    if n_partitions <= 1 or size < 1 << 20:
        return [(0, size)]
    cuts = [0]
    with open(xml_path, "rb") as f:
        for i in range(1, n_partitions):
            target = size * i // n_partitions
            if target <= cuts[-1]:
                continue
            f.seek(target)
            window = f.read(probe_window)
            hit = window.find(b"<Record ")
            if hit >= 0 and target + hit > cuts[-1]:
                cuts.append(target + hit)
    cuts.append(size)
    return [(cuts[i], cuts[i + 1]) for i in range(len(cuts) - 1)]


def _decode(raw: bytes) -> str:
    text = raw.decode("utf-8", errors="replace")
    text = _NUMREF_RE.sub(
        lambda m: chr(int(m.group(1)[1:], 16)) if m.group(1)[0] in "xX"
        else chr(int(m.group(1))), text)
    return _xml_unescape(text, _ENTITIES)


def _parse_slice(data: bytes):
    """Yield (attrs: dict, metadata: dict) per complete Record element
    in the slice."""
    for m in _RECORD_RE.finditer(data):
        blob = m.group(0)
        open_tag = _OPEN_TAG_RE.match(blob)
        head = open_tag.group(0) if open_tag else blob
        attrs = {k.decode(): _decode(v) for k, v in _ATTR_RE.findall(head)}
        md = {}
        for me in _MD_RE.finditer(blob, len(head)):
            kv = dict(_ATTR_RE.findall(me.group(0)))
            if b"key" in kv:
                md[_decode(kv[b"key"])] = _decode(kv.get(b"value", b""))
        yield attrs, md


def _to_arrow_batches(pairs, batch_size: int = 4096):
    """Columnar flush: (attrs, md) pairs → pyarrow RecordBatches
    matching SCHEMA_DDL (known attrs as columns, the rest folded into
    the metadata map)."""
    import pyarrow as pa

    known = set(RECORD_ATTRS)
    schema = pa.schema(
        [pa.field(a, pa.string()) for a in RECORD_ATTRS]
        + [pa.field("metadata", pa.map_(pa.string(), pa.string()))])
    cols: list[list] = [[] for _ in RECORD_ATTRS]
    mds: list[list[tuple[str, str]]] = []

    def flush():
        arrays = [pa.array(c, type=pa.string()) for c in cols]
        arrays.append(pa.array(mds, type=pa.map_(pa.string(), pa.string())))
        return pa.RecordBatch.from_arrays(arrays, schema=schema)

    for attrs, md in pairs:
        for extra in set(attrs) - known:
            md.setdefault(extra, attrs[extra])
        for i, a in enumerate(RECORD_ATTRS):
            cols[i].append(attrs.get(a))
        mds.append(sorted(md.items()))
        if len(mds) >= batch_size:
            yield flush()
            cols = [[] for _ in RECORD_ATTRS]
            mds = []
    if mds:
        yield flush()


class RecordRange(InputPartition):
    def __init__(self, path: str, start: int, end: int):
        self.path = path
        self.start = start
        self.end = end


class HealthKitBatchReader(DataSourceReader):
    def __init__(self, options: dict):
        path = options.get("path")
        if not path:
            raise ValueError("healthkit source requires a path "
                             "(export.zip or export.xml)")
        self.xml_path = _stage(path, options.get("staging"))
        self.n_partitions = int(options.get("numpartitions", "0")) or \
            min(32, max(1, (os.cpu_count() or 4)))
        self.batch_size = int(options.get("batchsize", "4096"))

    def partitions(self):
        return [RecordRange(self.xml_path, s, e)
                for s, e in _record_boundaries(self.xml_path, self.n_partitions)]

    def read(self, partition: RecordRange):
        with open(partition.path, "rb") as f:
            f.seek(partition.start)
            data = f.read(partition.end - partition.start)
        yield from _to_arrow_batches(_parse_slice(data), self.batch_size)


class HealthKitStreamReader(SimpleDataSourceStreamReader):
    """Byte-position-offset incremental reader: each micro-batch parses
    the next record-aligned range of the staged XML.  Deterministic
    replay between offsets (required by the Simple reader contract:
    un-committed batches are re-read by offset range on recovery)."""

    def __init__(self, options: dict):
        path = options.get("path")
        if not path:
            raise ValueError("healthkit source requires a path")
        self.xml_path = _stage(path, options.get("staging"))
        self.chunk = int(options.get("chunkbytes", str(4 << 20)))
        self.size = os.path.getsize(self.xml_path)

    def initialOffset(self):
        return {"pos": 0}

    def _advance(self, pos: int) -> int:
        """Next record-aligned cut at least ``chunk`` bytes on (EOF if
        none): scan a bounded window for the next ``<Record `` start."""
        target = pos + self.chunk
        if target >= self.size:
            return self.size
        with open(self.xml_path, "rb") as f:
            f.seek(target)
            window = f.read(4 << 20)
        hit = window.find(b"<Record ")
        return target + hit if hit >= 0 else self.size

    def _rows(self, start: int, end: int):
        with open(self.xml_path, "rb") as f:
            f.seek(start)
            data = f.read(end - start)
        known = set(RECORD_ATTRS)
        for attrs, md in _parse_slice(data):
            for extra in set(attrs) - known:
                md.setdefault(extra, attrs[extra])
            yield tuple(attrs.get(a) for a in RECORD_ATTRS) + (md,)

    def read(self, start: dict):
        pos = start["pos"]
        end = self._advance(pos)
        # materialized list iterator, not a generator: Spark's prefetch
        # cache copy.copy()s the iterator, which generators don't
        # support.  Bounded by chunkbytes.
        return iter(list(self._rows(pos, end))), {"pos": end}

    def readBetweenOffsets(self, start: dict, end: dict):
        return self._rows(start["pos"], end["pos"])


class HealthKitDataSource(DataSource):
    """``spark.read.format("healthkit").load("export.zip")``.

    Options: ``numPartitions`` (batch parallelism; default min(32,
    cpus)), ``staging`` (shared staging dir for zip extraction),
    ``batchSize`` (Arrow rows per batch), ``chunkBytes`` (streaming
    micro-batch size)."""

    @classmethod
    def name(cls):
        return "healthkit"

    def schema(self):
        return SCHEMA_DDL

    def reader(self, schema):
        return HealthKitBatchReader(self.options)

    def simpleStreamReader(self, schema):
        return HealthKitStreamReader(self.options)


def register(spark) -> None:
    """Idempotently register the source with a session."""
    spark.dataSource.register(HealthKitDataSource)
