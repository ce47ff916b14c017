"""Operator modules. Each exposes pure ``DataFrame -> DataFrame``
functions plus a ``SPECS`` dict contributing (query, oracle) pairs to
the driver contract (see ``healthkit_to_sqlite_spark.registry``)."""
