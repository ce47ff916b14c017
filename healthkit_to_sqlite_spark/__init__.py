"""healthkit_to_sqlite_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of jshrake/healthkit-to-sqlite.

The reference (/root/reference, Rust, 822 LoC) is a two-pass HealthKit
XML → SQLite ETL whose query surface is delegated to SQLite/Datasette
(reference README.md:27-110).  This package re-expresses that surface —
plus the large-scale training-data-pipeline extensions — Spark-first:

- ``sources``    : zip/XML/GPX ingestion (reference core.rs:48-73)
- ``operators``  : relational, restructuring, dedup, similarity, text
- ``functions``  : reusable Column expression helpers
- ``streaming``  : Structured Streaming analogs of the batch operators
- ``sinks``      : table-per-type fan-out + JDBC/sqlite writers
- ``registry``   : the (queries, oracle_sql) contract for the driver

Everything is public PySpark DataFrame/SQL API; no RDDs, no custom
Catalyst rules (see SURVEY.md §4.3 — none are needed).
"""

__version__ = "0.1.0"
