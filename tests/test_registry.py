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


def test_window_derivation_from_correctness_union():
    """VERDICT r8 item 2: the stale block of the verification window
    is DERIVED from the committed CORRECTNESS artifacts, not
    hand-curated.  Recompute 'newest driver row per query' from
    CORRECTNESS_r*.json (the judge's union), then assert the window
    equals (never-checked ∪ TOUCHED_THIS_ROUND) + the globally oldest
    rows by (newest round, name) until the 50 slots fill.  A curation
    slip (like the r7→r8 65-vs-50 overflow) fails here naming the
    dropped queries instead of surfacing as a judge finding.

    Boundary hygiene (VERDICT r9 item 1 / ADVICE r9): the window for
    round N is derived from rounds 1..N-1 ONLY, so the driver
    committing CORRECTNESS_rN at the round-N boundary does not turn
    the suite red.  A 'rotate me' failure fires only when an artifact
    NEWER than DERIVED_FOR_ROUND exists — i.e. a whole rotation was
    skipped."""
    import glob
    import json
    import os
    import re

    from healthkit_to_sqlite_spark.registry import (DERIVED_FOR_ROUND,
                                                    PRIORITY,
                                                    TOUCHED_THIS_ROUND,
                                                    queries)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    newest: dict[str, int] = {}
    skipped_rotation: list[str] = []
    # ADVICE r10: glob r* not r0* — CORRECTNESS_r10.json and later
    # two-digit rounds never match r0*, which would silently exclude
    # r10+ rows from the union and let the 'rotate me' guard sleep.
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r0*(\d+)", os.path.basename(path)).group(1))
        if rnd > DERIVED_FOR_ROUND:
            skipped_rotation.append(os.path.basename(path))
        if rnd >= DERIVED_FOR_ROUND:
            continue
        with open(path) as fh:
            for q in json.load(fh):
                newest[q] = max(newest.get(q, 0), rnd)
    assert not skipped_rotation, (
        "rotate me: driver artifacts newer than DERIVED_FOR_ROUND="
        f"{DERIVED_FOR_ROUND} exist ({skipped_rotation}); bump "
        "DERIVED_FOR_ROUND in registry.py and re-derive PRIORITY's "
        "first 50 slots from the new union")

    registered = list(queries())
    never_checked = [q for q in registered if q not in newest]
    must = set(never_checked) | set(TOUCHED_THIS_ROUND)
    assert len(must) <= 50, (
        f"{len(must)} mandatory entries exceed the 50-slot window; "
        "split across rounds explicitly")
    stale_fill = sorted(
        (q for q in registered if q in newest and q not in must),
        key=lambda q: (newest[q], q))[:50 - len(must)]
    required = must | set(stale_fill)
    window = set(PRIORITY[:50])
    dropped = sorted(required - window)
    assert not dropped, (
        "verification window drops mandatory queries "
        f"(new/touched/oldest-row): {dropped}")


def test_sql_in_list_rendering():
    """ADVICE r9: tuple-repr interpolation renders '(16,)' for a
    single element and '()' for empty — both malformed SQL.  All
    oracle IN-lists now route through sql_in_list; pin its edge
    cases so a future fixture shrink to one tombstone can't
    resurrect the trap."""
    import pytest

    from healthkit_to_sqlite_spark.spec import sql_in_list

    assert sql_in_list((16, 77)) == "(16, 77)"
    assert sql_in_list((16,)) == "(16)"
    assert sql_in_list(("en", "de")) == "('en', 'de')"
    assert sql_in_list(("o'hare",)) == "('o''hare')"
    with pytest.raises(ValueError):
        sql_in_list(())


def test_touched_names_are_registered():
    from healthkit_to_sqlite_spark.registry import (TOUCHED_THIS_ROUND,
                                                    queries)

    unknown = [n for n in TOUCHED_THIS_ROUND if n not in queries()]
    assert unknown == [], f"TOUCHED_THIS_ROUND names not registered: {unknown}"
