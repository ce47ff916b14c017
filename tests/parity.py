"""Local replica of the driver's Spark-vs-DuckDB correctness gate.

For each registered query with an oracle: run the Spark build and the
DuckDB SQL over the same parquet directory, then compare row count,
column names/types, and (order-insensitively) every value.  We compare
*exactly* by default — the whole engine is designed so aggregates are
bit-reproducible across engines (see functions.__init__ decimal notes);
a tolerance would only mask design errors.
"""

from __future__ import annotations

import math
import os
import sys
from dataclasses import dataclass, field

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from healthkit_to_sqlite_spark.catalog import TABLES  # noqa: E402


@dataclass
class ParityResult:
    name: str
    ok: bool
    detail: str = ""
    spark_rows: int = -1
    oracle_rows: int = -1
    mismatches: list = field(default_factory=list)


def duckdb_connection(sf_dir: str) -> "duckdb.DuckDBPyConnection":
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


def _norm_cell(v):
    """Normalize a cell for cross-engine comparison."""
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, list):
        return tuple(_norm_cell(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _norm_cell(x)) for k, x in v.items()))
    try:  # Decimal → float-preserving string
        import decimal
        if isinstance(v, decimal.Decimal):
            return float(v)
    except ImportError:
        pass
    return v


def _rowset(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = []
    for r in rows:
        out.append(tuple(_norm_cell(r[i]) for i in order))
    out.sort(key=lambda t: tuple((x is None, str(type(x)), str(x)) for x in t))
    return out


def _dtype_kinds(df):
    """pandas dtype kind per column name — the driver compares values
    through pandas, where DuckDB HUGEINT surfaces as float64 while the
    Spark side is int64; str(72315.0) != str(72315) ⇒ hash mismatch
    even when values are numerically equal.  Comparing kinds catches
    that class locally (int-ish 'i'/'u' vs float 'f' vs object 'O')."""
    return {c: df[c].dtype.kind for c in df.columns}


def compare_query(spark, con, name, build, sql, sf_dir) -> ParityResult:
    sdf = build(spark, sf_dir)
    scols = sdf.columns
    # dtype check reads through pandas (the driver's path); the value
    # compare stays on Python-native rows so NULL is None on both
    # sides.  persist() makes the second action read the cache — the
    # old form re-executed every (often iterative) plan twice; same
    # trick on the DuckDB side via a temp-table materialization
    # (review finding: the sweep paid ~2× wall for nothing).
    sdf = sdf.persist()
    try:
        spdf = sdf.toPandas()
        srows = [tuple(r) for r in sdf.collect()]
    finally:
        sdf.unpersist()
    con.execute("CREATE OR REPLACE TEMP TABLE __parity_res AS " + sql)
    opdf = con.execute("SELECT * FROM __parity_res").df()
    ores = con.execute("SELECT * FROM __parity_res")
    ocols = [d[0] for d in ores.description]
    orows = ores.fetchall()

    if sorted(scols) != sorted(ocols):
        return ParityResult(name, False,
                            f"column mismatch: spark={sorted(scols)} oracle={sorted(ocols)}",
                            len(srows), len(orows))
    # The driver canonicalizes with pandas sort_values over ALL columns;
    # a list/dict-typed cell is unhashable there and the whole query
    # errors out (r02: q_multimodal_resize).  Catch that class locally:
    # contract queries must emit scalar-typed columns only.
    unhashable = {
        c for df in (spdf, opdf) for c in df.columns
        if df[c].dtype.kind == "O"
        and df[c].map(lambda v: isinstance(v, (list, dict, set))
                      or type(v).__name__ == "ndarray").any()}
    if unhashable:
        return ParityResult(
            name, False,
            f"driver-unsortable (list/dict) columns: {sorted(unhashable)}",
            len(srows), len(orows))
    skinds, okinds = _dtype_kinds(spdf), _dtype_kinds(opdf)
    # int-vs-float is the driver-visible formatting divergence; only
    # flag when neither side holds NULLs (pandas itself widens nullable
    # int columns to float64 on BOTH engines, which hashes identically)
    bad_kinds = {
        c: (skinds[c], okinds[c]) for c in scols
        if {skinds[c], okinds[c]} == {"i", "f"}
        and not (spdf[c].isna().any() or opdf[c].isna().any())}
    if bad_kinds:
        return ParityResult(name, False,
                            f"dtype mismatch (spark,oracle): {bad_kinds}",
                            len(srows), len(orows))
    if len(srows) != len(orows):
        return ParityResult(name, False,
                            f"row count mismatch: spark={len(srows)} oracle={len(orows)}",
                            len(srows), len(orows))
    s = _rowset(srows, scols)
    o = _rowset(orows, ocols)
    mism = []
    for i, (a, b) in enumerate(zip(s, o)):
        if a != b:
            # allow tiny float drift reporting (still a failure, but show scale)
            mism.append((i, a, b))
            if len(mism) >= 5:
                break
    if mism:
        return ParityResult(name, False, "value mismatch", len(srows), len(orows), mism)
    return ParityResult(name, True, "", len(srows), len(orows))


def run_all(sf_dir: str | None = None, only: list[str] | None = None):
    from healthkit_to_sqlite_spark.registry import _all_specs
    from healthkit_to_sqlite_spark.session import get_spark

    sf_dir = sf_dir or os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    spark = get_spark("parity")
    con = duckdb_connection(sf_dir)
    specs = _all_specs()
    results = []
    for name, spec in specs.items():
        if only and name not in only:
            continue
        if spec.oracle is None:
            try:
                n = spec.build(spark, sf_dir).count()
                results.append(ParityResult(name, n >= 0, f"rows-only: {n} rows", n, -1))
            except Exception as e:  # noqa: BLE001
                results.append(ParityResult(name, False, f"EXC {type(e).__name__}: {e}"))
            continue
        try:
            results.append(compare_query(spark, con, name, spec.build, spec.oracle, sf_dir))
        except Exception as e:  # noqa: BLE001
            results.append(ParityResult(name, False, f"EXC {type(e).__name__}: {str(e)[:500]}"))
    return results


if __name__ == "__main__":
    import json

    argv = sys.argv[1:]
    out_path = None
    if "--json" in argv:
        i = argv.index("--json")
        if i + 1 >= len(argv):
            sys.exit("usage: parity.py [names...] [--json OUT_PATH]")
        out_path = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    only = argv or None
    results = run_all(only=only)
    failed = [r for r in results if not r.ok]
    for r in results:
        mark = "PASS" if r.ok else "FAIL"
        print(f"{mark} {r.name} ({r.spark_rows} rows) {r.detail}")
        for i, a, b in r.mismatches:
            print(f"    row {i}: spark={a!r}\n           oracle={b!r}")
    print(f"\n{len(results) - len(failed)}/{len(results)} passed")
    if out_path:
        payload = {r.name: {"ok": r.ok, "detail": r.detail,
                            "spark_rows": r.spark_rows,
                            "oracle_rows": r.oracle_rows}
                   for r in results}
        with open(out_path, "w") as fh:
            json.dump(payload, fh, indent=1, sort_keys=True)
        print(f"wrote {out_path}")
    sys.exit(1 if failed else 0)
