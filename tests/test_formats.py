"""Source/sink format breadth: the engine must round-trip its tables
through every mainstream columnar/row format Spark ships — a user
switching storage (or landing data from CSV/JSON upstreams) keeps
bit-identical semantics.  Parquet is the native path (everything
else tests it); here CSV, JSON, and ORC prove the read/write surface.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from healthkit_to_sqlite_spark.catalog import load_table

SF = "/root/testdata/sf0.001"


def _roundtrip(spark, df, fmt: str, path: str, read_opts=None,
               write_opts=None):
    w = df.write.mode("overwrite")
    for k, v in (write_opts or {}).items():
        w = w.option(k, v)
    w.format(fmt).save(path)
    r = spark.read
    for k, v in (read_opts or {}).items():
        r = r.option(k, v)
    return r.format(fmt).schema(df.schema).load(path)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("fmt,opts", [
    ("orc", {}),
    ("json", {}),
    ("csv", {"header": "true", "escape": '"'}),
])
def test_documents_roundtrip_formats(spark, tmp_path, fmt, opts):
    docs = load_table(spark, SF, "documents")
    back = _roundtrip(spark, docs, fmt, str(tmp_path / fmt),
                      read_opts=opts, write_opts=opts)
    assert _rows(back) == _rows(docs)


def test_lineitem_roundtrip_orc_preserves_timestamps(spark, tmp_path):
    li = load_table(spark, SF, "lineitem")
    back = _roundtrip(spark, li, "orc", str(tmp_path / "li_orc"))
    assert _rows(back) == _rows(li)
    assert dict(back.dtypes)["l_shipdate"] == dict(li.dtypes)["l_shipdate"]


def test_embeddings_array_column_roundtrip_json(spark, tmp_path):
    # arrays survive JSON; CSV is scalar-only by design (not tested)
    emb = load_table(spark, SF, "embeddings")
    back = _roundtrip(spark, emb, "json", str(tmp_path / "emb_json"))
    a = {r.vec_id: r.embedding for r in emb.collect()}
    b = {r.vec_id: r.embedding for r in back.collect()}
    assert a == b
