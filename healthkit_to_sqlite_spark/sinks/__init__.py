"""Output connectors: SQLite/JDBC (reference parity) and partitioned
parquet (the at-scale layout)."""
