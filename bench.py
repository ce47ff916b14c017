#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS].

Protocol (BASELINE.md): warm SparkSession, one untimed warm-up run per
query, median of 3 timed runs, noop-write as the forcing action (full
materialization, no driver collect).  Prints ONE JSON line:
{"metric": ..., "value": <total sec>, "unit": "sec",
 "queries": {name: sec}, "sf": <sf>}.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

#: Headline set: one per operator family (relational, restructure,
#: dedup, similarity, text, timeseries, multimodal).
HEADLINE = [
    "q_flagship",
    "q_group_agg",
    "q_path_join",
    "q_window_rank",
    "q_kv_pivot",
    "q_collect_events",
    "q_linestring",
    "q_schema_infer",
    "q_tumbling_window",
    "q_sessionize",
    "q_asof_join",
    "q_dedup_exact",
    "q_dedup_minhash_lsh",
    "q_dedup_simhash",
    "q_topk_cosine",
    "q_ann_lsh_pairs",
    "q_token_counts",
    "q_quality_score",
    "q_fingerprint",
    "q_multimodal_decode",
    "q_dedup_clusters",
    "q_repetition_signals",
    "q_interval_join",
    "q_pack_sequences",
]


def force(df) -> None:
    """Fixed forcing action: noop datasource write (materializes every
    row through the full plan; no driver-side collection)."""
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 8)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from healthkit_to_sqlite_spark.session import get_spark
    from healthkit_to_sqlite_spark.registry import queries

    spark = get_spark("bench", cpus=cpus, shuffle_partitions=cpus)
    qs = queries()
    names = [n for n in HEADLINE if n in qs]

    timings: dict[str, float] = {}
    for name in names:
        build = qs[name]
        force(build(spark, sf_dir))          # warm-up (untimed)
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            force(build(spark, sf_dir))
            runs.append(time.perf_counter() - t0)
        timings[name] = round(statistics.median(runs), 4)

    out = {
        "metric": "headline query wall time (median of 3, noop sink)",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "cpus": cpus,
        "spark": spark.version,
        "shuffle_partitions": spark.conf.get("spark.sql.shuffle.partitions"),
        "aqe": spark.conf.get("spark.sql.adaptive.enabled"),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
