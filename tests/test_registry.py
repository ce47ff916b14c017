"""Registry window self-test (VERDICT r5 item 6): the driver's
correctness gate checks exactly the FIRST 50 queries in dict
iteration order, so the curated PRIORITY window is load-bearing —
an unregistered or misspelled name in the first 50 would silently
let module-order queries eat verification slots and waste a round."""

from __future__ import annotations


def test_priority_window_occupies_first_50_slots():
    from healthkit_to_sqlite_spark.registry import PRIORITY, queries

    names = list(queries())
    assert names[:50] == list(PRIORITY[:50]), (
        "driver verification window drifted from the documented plan; "
        "first mismatch: "
        + str(next((a, b) for a, b in zip(names, PRIORITY) if a != b)))


def test_every_priority_name_is_registered():
    # PRIORITY tolerates unknown names by design (curate-ahead), but
    # once a round ships, a leftover unknown name means a typo or a
    # dropped query — fail loudly instead of silently shrinking the
    # re-verification rotation.
    from healthkit_to_sqlite_spark.registry import PRIORITY, queries

    unknown = [n for n in PRIORITY if n not in queries()]
    assert unknown == [], f"PRIORITY names not registered: {unknown}"


def test_registry_counts_match_docstring():
    import healthkit_to_sqlite_spark.registry as reg

    n = len(reg.queries())
    assert f"({n} queries" in reg.__doc__, (
        f"registry docstring count stale: {n} registered")
