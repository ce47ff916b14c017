"""Bench aggregation unit tests (VERDICT r12 item 4): the fresh-JVM
substitution policy must be immune to a degraded box phase BY
CONSTRUCTION — the r12 driver run hit a slow phase whose fresh arm
wrote q_communities_lpa = 95.68 s over an in-loop 6.37 s (clean run:
3.53 s), inflating BENCH_r12.json by 130 s.  These tests replay that
scenario synthetically against the pure aggregation helper."""

from __future__ import annotations

import importlib.util
import os
import sys


def _bench():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(repo, "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    sys.modules.setdefault("bench", mod)
    spec.loader.exec_module(mod)
    return mod


def test_degraded_fresh_run_cannot_overwrite_warm_median():
    """The r12 scenario: in-loop 6.37 s tripped the 1.5×-vs-committed
    gate (prev 3.36 s), the fresh arm ran during the degraded phase
    and returned 95.68 s.  Policy: keep min(in_loop, fresh), flag the
    fresh sample as box-degraded, preserve both values."""
    b = _bench()
    timings = {"q_communities_lpa": 6.37}
    spread = {"q_communities_lpa": [6.1, 6.9]}
    fresh = {"q_communities_lpa": [95.68, 90.2, 101.3]}
    reruns = b._merge_fresh(timings, spread, fresh,
                            {"q_communities_lpa": 3.36})
    assert timings["q_communities_lpa"] == 6.37      # min kept
    assert spread["q_communities_lpa"] == [6.1, 6.9]  # spread untouched
    rec = reruns["q_communities_lpa"]
    assert rec["box_degraded"] is True
    assert rec["in_loop"] == 6.37 and rec["fresh"] == 95.68
    assert rec["kept"] == 6.37 and rec["prev"] == 3.36


def test_exonerating_fresh_run_substitutes_median_and_spread():
    """The gate's intended use: a same-JVM GC artifact (in-loop 9.0 s)
    exonerated by a clean fresh arm (2.1 s) — the fresh median AND its
    spread become the committed values."""
    b = _bench()
    timings = {"q_x": 9.0}
    spread = {"q_x": [8.8, 9.4]}
    reruns = b._merge_fresh(timings, spread, {"q_x": [2.1, 2.0, 2.3]},
                            {"q_x": 2.2})
    assert timings["q_x"] == 2.1
    assert spread["q_x"] == [2.0, 2.3]
    assert "box_degraded" not in reruns["q_x"]
    assert reruns["q_x"]["kept"] == 2.1


def test_fresh_result_for_unknown_query_is_ignored():
    b = _bench()
    timings = {"q_x": 1.0}
    reruns = b._merge_fresh(timings, {"q_x": [0.9, 1.1]},
                            {"q_gone": [5.0, 4.9, 5.1]}, {})
    assert reruns == {} and timings == {"q_x": 1.0}


def test_tree_cpu_counts_own_process_work():
    """_tree_cpu sums utime+stime over the process tree; burning CPU
    in this process must move it by roughly the burned amount (loose
    lower bound — other threads only add)."""
    import time as _time

    b = _bench()
    c0 = b._tree_cpu()
    assert c0 > 0.0
    t_end = _time.process_time() + 0.3
    x = 0
    while _time.process_time() < t_end:
        x += 1
    delta = b._tree_cpu() - c0
    assert delta >= 0.2, f"tree CPU delta {delta} missed own-process burn"


def test_compact_totals_tail_wall_for_both_shapes():
    """VERDICT r13 What's-missing 3: tail entries carry [wall, cpu]
    since r14 — the compact line must total the WALL column, and keep
    accepting the pre-r14 float shape (older committed artifacts)."""
    b = _bench()
    out = {"metric": "m", "value": 1.0, "unit": "sec", "sf": 0.1,
           "cpus": 32, "queries": {"q_a": 1.0},
           "tail_queries": {"q_t1": [2.0, 30.5], "q_t2": 3.0}}
    compact = b._compact(out, {"q_a": 1.0}, budget=2000)
    assert compact["tail_total_sec"] == 5.0
    assert compact["tail_n"] == 2


def test_compact_sheds_bulk_fields_before_slowest_ten():
    """VERDICT r14 item 1: the r14 tail line overflowed (fresh_reruns
    + a 36-entry sf1 dict) and _compact shrank the query dict to k=0
    BEFORE touching the bulk fields — the driver got zero per-query
    data (n_common 0, null geomean, empty scaling block).  Replay that
    overflow: the slowest-10 dict must survive, bulk fields shed."""
    import json

    b = _bench()
    timings = {f"q_name_{i:03d}": round(0.1 + i * 0.01, 4)
               for i in range(177)}
    out = {"metric": "headline query wall time (median of 3, noop sink)",
           "value": round(sum(timings.values()), 4), "unit": "sec",
           "sf": 0.1, "cpus": 32, "queries": timings,
           "tail_queries": {f"q_tail_{i}": [1.0, 2.0] for i in range(52)},
           "ingest": {"rows_per_sec": 100000, "rows": 400012,
                      "rows_per_sec_band": [100000, 90000, 110000]},
           "sf1": {"ratio_vs_sf0.1": {f"q_sf1_{i:02d}": 2.13
                                      for i in range(36)}},
           "fresh_reruns": {f"q_fresh_rerun_entry_{i:02d}": {"in_loop": 2.0,
                                                             "fresh": 1.5,
                                                             "prev": 1.0,
                                                             "kept": 1.5}
                            for i in range(40)}}
    compact = b._compact(out, timings, budget=1800)
    assert len(json.dumps(compact)) <= 1800
    assert len(compact["queries"]) >= 10, compact
    # the slowest entries, not arbitrary ones
    assert "q_name_176" in compact["queries"]
    # bulk fields shed before the query dict — fresh_reruns first
    assert "fresh_reruns" not in compact
