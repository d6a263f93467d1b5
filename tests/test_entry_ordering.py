"""Pins for __spark_entry__'s driver-queue logic — the exact spot where
round 3 lost verification coverage (a rows_match-only green test parked
two hash-failing queries in the 'proven' tail forever)."""

from __future__ import annotations

import importlib.util
import os

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_entry():
    spec = importlib.util.spec_from_file_location(
        "spark_entry_under_test", os.path.join(_ROOT, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_hash_fail_is_not_proven():
    """A CORRECTNESS row with rows_match=True but hash_match=False must
    classify as 'fail' (→ re-verified first), never 'green' — the
    round-3 regression."""
    E = _load_entry()
    st = E._driver_status()
    # every green entry must have come from a fully matching row
    import glob
    import json

    latest: dict[str, dict] = {}
    for p in sorted(glob.glob(os.path.join(_ROOT, "CORRECTNESS_r*.json"))):
        with open(p) as fh:
            for name, row in json.load(fh).items():
                if isinstance(row, dict):
                    latest[name] = row
    for name, verdict in st.items():
        row = latest[name]
        if verdict == "green":
            assert row.get("rows_match") and row.get("schema_match") and row.get(
                "hash_match"
            ), (name, row)
        if (
            row.get("err") is None
            and row.get("rows_match")
            and not row.get("hash_match")
        ):
            assert verdict == "fail", (name, row)


def test_unproven_entries_ordered_before_proven():
    """queries() must list every non-green entry before every green one
    so a driver cap always extends the proven set. ACTIVE _RECHECK names
    are exempt: their green rows pre-date an engine change, so they are
    deliberately re-queued at the front (they count as unproven here).
    A RETIRED recheck (green row post-dates the change,
    green_round >= pinned round — the auto-retire rule in
    __spark_entry__.queries) is proven like any other green entry."""
    E = _load_entry()
    st, green_round = E._driver_history()
    names = list(E.queries())
    recheck = {
        n
        for n, min_round in E._RECHECK.items()
        if green_round.get(n, 0) < min_round
    }
    seen_green = False
    for n in names:
        if st.get(n) == "green" and n not in recheck:
            seen_green = True
        else:
            assert not seen_green, (
                f"unproven entry {n} ordered after a proven one"
            )


def test_recheck_entries_self_retire_on_postdating_green_row():
    """A _RECHECK entry whose green row post-dates the engine change
    (green_round >= its pinned round) must sort with the proven tail —
    otherwise it burns a driver-cap slot every round forever. One whose
    green rows all PRE-date the change must still jump the queue."""
    E = _load_entry()
    status, green_round = E._driver_history()
    names = list(E.queries())
    for n, min_round in E._RECHECK.items():
        if n not in names or status.get(n) == "fail":
            continue
        pos = names.index(n)
        retired = green_round.get(n, 0) >= min_round
        # active recheck entries must appear before every never-tested
        # BACKLOG entry (pending entries that are not themselves
        # recheck/priority names); retired ones must NOT occupy the
        # front block
        front = set(E._RECHECK) | set(E._PRIORITY)
        first_pending = next(
            (
                names.index(p)
                for p in names
                if p not in status and p not in front
            ),
            len(names),
        )
        if retired:
            if first_pending < len(names):
                assert pos > first_pending or status.get(n) != "green", (
                    f"retired recheck entry {n} still jumps the queue"
                )
            # else: backlog-zero terminal state — every entry has a
            # driver status, so there is no never-tested "front block"
            # to jump (the r7 red: `pos > len(names)` is unsatisfiable).
            # Ordering among greens is pinned by the rotation test below.
        elif status.get(n) == "green":
            assert pos < first_pending, (
                f"active recheck entry {n} (green pre-change) ordered "
                f"after the never-tested backlog"
            )


def test_proven_tail_rotates_stalest_green_first():
    """Green-row rotation (r8): within the proven tail, entries must be
    ordered by OLDEST green round first so the driver's per-round cap
    refreshes stale rows instead of re-proving the same head forever.
    Active _RECHECK entries are excluded (they sort in the front block)."""
    E = _load_entry()
    status, green_round = E._driver_history()
    names = list(E.queries())
    active_recheck = {
        n for n, r in E._RECHECK.items() if green_round.get(n, 0) < r
    }
    greens = [
        n
        for n in names
        if status.get(n) == "green" and n not in active_recheck
    ]
    rounds = [green_round[n] for n in greens]
    assert rounds == sorted(rounds), (
        "proven tail not ordered stalest-green-first: "
        + str([(n, r) for n, r in zip(greens, rounds)][:10])
    )


def test_queue_is_total_and_deterministic_in_backlog_zero_state():
    """Regression for the r7 red (test harness, not engine): synthesize
    the all-green state — every registry entry green, mixed rounds,
    every _RECHECK retired — and require queries() to (a) return the
    full registry exactly once each, (b) order it stalest-green-first,
    (c) not crash on retired rechecks with no pending front block."""
    E = _load_entry()
    names = list(E.PARITY)
    # deterministic mixed rounds: cycle 1..7 over registry order
    synth_green = {n: 1 + (i % 7) for i, n in enumerate(names)}
    for n in E._RECHECK:
        if n in synth_green:
            synth_green[n] = max(synth_green[n], E._RECHECK[n])  # retired
    synth_status = {n: "green" for n in names}
    orig = E._driver_history
    E._driver_history = lambda: (synth_status, synth_green)
    try:
        ordered = list(E.queries())
    finally:
        E._driver_history = orig
    assert sorted(ordered) == sorted(names)
    assert len(ordered) == len(set(ordered))
    rounds = [synth_green[n] for n in ordered]
    assert rounds == sorted(rounds), "backlog-zero queue not rotated"


def test_oracle_keys_subset_of_queries():
    """Every oracle_sql key must be a queries() key (the driver joins
    on the name), and column-name contracts require non-empty SQL."""
    E = _load_entry()
    qs = set(E.queries())
    for name, sql in E.oracle_sql().items():
        assert name in qs
        assert sql and sql.strip()


def test_coverage_doc_lists_every_query():
    """COVERAGE.md is the judge-facing operator map — every registered
    queries() key must have a row there (backticked), so a new entry
    without documentation fails CI instead of silently hiding."""
    import trino_demo_spark.parity_llm  # noqa: F401
    import trino_demo_spark.parity_ml  # noqa: F401
    from trino_demo_spark.parity import PARITY

    cov = open(os.path.join(_ROOT, "COVERAGE.md")).read()
    missing = [n for n in PARITY if f"`{n}`" not in cov]
    assert not missing, f"undocumented queries: {missing}"
