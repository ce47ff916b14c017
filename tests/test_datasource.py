"""Python Data Source (`format("healthkit")`) tests: batch read parity
with the JVM-XML ingest path, partition planning, and the streaming
reader's offset/replay contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def registered(spark):
    from healthkit_to_sqlite_spark.sources.datasource import register
    register(spark)
    return spark


def test_batch_read_counts_and_values(registered, hk_zip):
    df = registered.read.format("healthkit").load(hk_zip)
    rows = df.collect()
    assert len(rows) == 5  # 3 WalkingSpeed + 2 StepCount (hk_fixture)
    by_type = {r["type"]: r for r in rows}
    ws = [r for r in rows
          if r["type"] == "HKQuantityTypeIdentifierWalkingSpeed"]
    assert len(ws) == 3
    assert {r["value"] for r in ws} == {"2.95276", "3.10000", "2.50000"}
    # MetadataEntry children land in the map column
    assert ws[0]["metadata"]["Test Entry"] == "FooBar"
    sc = by_type["HKQuantityTypeIdentifierStepCount"]
    assert sc["unit"] == "count"
    assert sc["metadata"] == {}


def test_batch_parity_with_xml_reader(registered, hk_zip, hk_tables):
    """The datasource and the JVM rowTag path agree on the Record
    relation (count per type + value multiset)."""
    ds = (registered.read.format("healthkit").load(hk_zip)
          .groupBy("type").agg(F.count(F.lit(1)).alias("n"),
                               F.sort_array(F.collect_list("value")).alias("vals")))
    got = {r["type"]: (r["n"], r["vals"]) for r in ds.collect()}
    for t in ("HKQuantityTypeIdentifierWalkingSpeed",
              "HKQuantityTypeIdentifierStepCount"):
        tbl = hk_tables[t]
        vals = sorted(str(r[0]) for r in tbl.select(
            F.col("value").cast("string")).collect())
        assert got[t][0] == tbl.count()
        # typed values (100 → "100"/"100.0" formatting differs); compare
        # as doubles
        assert sorted(float(v) for v in got[t][1]) == \
            sorted(float(v) for v in vals)


def test_partition_planning_multifile(tmp_path):
    """Byte-range planner: record-aligned cuts, loss-free slicing."""
    from healthkit_to_sqlite_spark.sources.datasource import (
        _parse_slice, _record_boundaries)
    # a synthetic export big enough to split (>1 MiB)
    rec = (b'<Record type="T" value="%d" startDate="2020-01-01 00:00:00 '
           b'+0000"><MetadataEntry key="k" value="v%d"/></Record>\n')
    n = 12000
    body = b"".join(rec % (i, i) for i in range(n))
    p = tmp_path / "big.xml"
    p.write_bytes(b"<HealthData>\n" + body + b"</HealthData>\n")
    ranges = _record_boundaries(str(p), 8)
    assert len(ranges) > 1
    # contiguous, disjoint, covering
    assert ranges[0][0] == 0 and ranges[-1][1] == p.stat().st_size
    for (s1, e1), (s2, e2) in zip(ranges, ranges[1:]):
        assert e1 == s2
    data = p.read_bytes()
    seen = []
    for s, e in ranges:
        for attrs, md in _parse_slice(data[s:e]):
            seen.append(int(attrs["value"]))
            assert md == {"k": f"v{attrs['value']}"}
    assert sorted(seen) == list(range(n))


def test_stream_reader_offsets(hk_zip):
    """Offset monotonicity + exact replay between offsets."""
    from healthkit_to_sqlite_spark.sources.datasource import (
        HealthKitStreamReader)
    r = HealthKitStreamReader({"path": hk_zip, "chunkbytes": "1024"})
    pos = r.initialOffset()
    all_rows = []
    while pos["pos"] < r.size:
        it, nxt = r.read(pos)
        rows = list(it)
        assert nxt["pos"] > pos["pos"]
        # replay of the same range returns identical rows
        assert list(r.readBetweenOffsets(pos, nxt)) == rows
        all_rows += rows
        pos = nxt
    assert len(all_rows) == 5
    types = {t[0] for t in all_rows}
    assert types == {"HKQuantityTypeIdentifierWalkingSpeed",
                     "HKQuantityTypeIdentifierStepCount"}


def test_streaming_end_to_end(registered, hk_zip, tmp_path):
    """readStream → availableNow → memory sink: the full Structured
    Streaming path over the Python source."""
    q = (registered.readStream.format("healthkit")
         .option("chunkBytes", "1024")
         .load(hk_zip)
         .groupBy("type").agg(F.count(F.lit(1)).alias("n"))
         .writeStream.format("memory").queryName("hk_stream")
         .outputMode("complete")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .start())
    # availableNow falls back to single-batch for Simple stream readers;
    # processAllAvailable drains every pending micro-batch instead
    q.processAllAvailable()
    q.stop()
    out = {r["type"]: r["n"] for r in
           registered.sql("SELECT * FROM hk_stream").collect()}
    assert out == {"HKQuantityTypeIdentifierWalkingSpeed": 3,
                   "HKQuantityTypeIdentifierStepCount": 2}


def test_streaming_checkpoint_restart(registered, hk_zip, tmp_path):
    """Exactly-once across engine restarts: stop the query after the
    first micro-batch, restart from the same checkpoint, and verify
    the sink holds every record exactly once (offset replay + commit
    log, no dupes, no loss)."""
    out = str(tmp_path / "rows")
    ckpt = str(tmp_path / "ckpt")

    def start():
        return (registered.readStream.format("healthkit")
                .option("chunkBytes", "512")
                .load(hk_zip)
                .writeStream.format("parquet")
                .option("path", out)
                .option("checkpointLocation", ckpt)
                .start())

    q = start()
    # wait for the first committed batch, then stop mid-stream
    import time
    for _ in range(600):
        if q.lastProgress and q.lastProgress["numInputRows"] >= 0 \
                and q.recentProgress:
            break
        time.sleep(0.1)
    q.stop()
    q2 = start()
    q2.processAllAvailable()
    q2.stop()
    rows = registered.read.parquet(out).collect()
    assert len(rows) == 5  # every record exactly once
    vals = sorted(r["value"] for r in rows)
    assert vals == sorted(["2.95276", "3.10000", "2.50000", "100", "250"])


def test_missing_path_raises(registered):
    from healthkit_to_sqlite_spark.sources.datasource import (
        HealthKitBatchReader)
    with pytest.raises(ValueError, match="path"):
        HealthKitBatchReader({})


def test_recordless_xml_yields_zero_rows(registered, tmp_path):
    p = tmp_path / "empty.xml"
    p.write_text("<?xml version='1.0'?><HealthData>"
                 "<ActivitySummary dateComponents='2020-01-01'/>"
                 "</HealthData>")
    df = registered.read.format("healthkit").load(str(p))
    assert df.count() == 0
    assert "type" in df.columns  # schema still the published contract


def test_attribute_entity_unescaping(registered, tmp_path):
    p = tmp_path / "ent.xml"
    p.write_text('<HealthData><Record type="T" value="a &amp; b '
                 '&lt;c&gt; &quot;d&quot;"/></HealthData>')
    row = registered.read.format("healthkit").load(str(p)).collect()[0]
    assert row["value"] == 'a & b <c> "d"'


def test_gt_in_attribute_value_and_numeric_refs(registered, tmp_path):
    """'>' is legal inside attribute values (HealthKit device strings)
    and numeric character references must resolve — both naive-regex
    killers."""
    p = tmp_path / "dev.xml"
    p.write_text(
        '<HealthData>'
        '<Record type="A" device="&lt;&lt;HKDevice: 0x283&gt;, name:W>x" '
        'value="1"/>'
        '<Record type="B" value="line&#10;break &#x2019;q&#8217;"/>'
        '<Record type="C" value="3"><MetadataEntry key="k" value="v>w"/>'
        '</Record>'
        '</HealthData>')
    rows = {r["type"]: r for r in
            registered.read.format("healthkit").load(str(p)).collect()}
    assert len(rows) == 3                       # nothing dropped/merged
    assert rows["A"]["device"] == "<<HKDevice: 0x283>, name:W>x"
    assert rows["B"]["value"] == "line\nbreak ’q’"
    assert rows["C"]["metadata"] == {"k": "v>w"}


def test_truncated_staging_reextracts(registered, hk_zip, tmp_path):
    """A crash mid-extract leaves a truncated export.xml; the missing
    completion marker forces re-extraction instead of silent reuse."""
    import os
    staging = str(tmp_path / "staged")
    xmlp = os.path.join(staging, "apple_health_export", "export.xml")
    os.makedirs(os.path.dirname(xmlp))
    with open(xmlp, "w") as fh:
        fh.write("<HealthData><Record type=")  # truncated garbage
    df = (registered.read.format("healthkit")
          .option("staging", staging).load(hk_zip))
    assert df.count() == 5  # re-extracted, not the truncated file
