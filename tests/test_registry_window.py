"""Driver-window allocation guard.

The per-round driver hash-checks only the FIRST ~50 entries of
``__spark_entry__.queries()`` — the ordering is deliberate signal
allocation.  Round 5 (r4 verdict item 1) spends every slot on
never-driver-checked queries that carry an exact DuckDB oracle — zero
rows-only entries: the first 50 of the 191-query backlog in
merged-registry order, with the newly un-gated
``events_tws_running_totals`` taking slot 1 (verdict item 4's "green
driver row").  A registry edit that silently reorders or un-oracles the
window would cost a round of correctness signal; this test pins the
contract.
"""

import json
import os

import __spark_entry__ as E

WINDOW = 50

# Rounds whose CORRECTNESS files existed when this round's window was
# planned.  The window must re-check NONE of the queries they cover
# (every slot is first-signal capacity), with a declared exception list
# for queries whose RESULTS changed this round (none in r5).
PRIOR_ROUNDS = ("01", "02", "03", "04")
CHANGED_THIS_ROUND: set[str] = set()


def _prior_checked() -> set[str]:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    checked: set[str] = set()
    for r in PRIOR_ROUNDS:
        path = os.path.join(root, f"CORRECTNESS_r{r}.json")
        if os.path.exists(path):
            with open(path) as fh:
                checked |= set(json.load(fh))
    return checked


def test_front_window_matches_declared_allocation():
    # the first len(FRONT_WINDOW) entries are exactly the declared list,
    # in order — capability-invariant (no conditional registration may
    # shift a slot, ADVICE r2)
    qs = list(E.queries())
    assert qs[:len(E.FRONT_WINDOW)] == E.FRONT_WINDOW


def test_window_is_exactly_fifty():
    assert len(E.FRONT_WINDOW) == WINDOW
    assert len(set(E.FRONT_WINDOW)) == WINDOW  # no duplicate slots


def test_window_is_fully_oracled():
    """r4 verdict item 1: zero rows-only slots this round — every window
    query must carry an exact DuckDB oracle (the 10 model fits had their
    one rows-only row in r4 and are rotated out)."""
    qs, oracles = E.queries(), E.oracle_sql()
    window = list(qs)[:WINDOW]
    rows_only = [n for n in window if n not in oracles]
    assert not rows_only, rows_only


def test_no_window_slot_wasted_on_already_checked_queries():
    """Every slot goes to a query that has never had a driver row in any
    prior round's CORRECTNESS file (195 distinct queries checked over
    r1-r4; re-checking any would burn first-signal capacity)."""
    checked = _prior_checked()
    rechecks = [n for n in E.FRONT_WINDOW
                if n in checked and n not in CHANGED_THIS_ROUND]
    assert not rechecks, rechecks


def test_window_follows_registry_order_of_the_backlog():
    """The 50 slots are the first never-checked oracled queries in
    MODULE-REGISTRY order (slot 1's TWS un-gate aside), so the r6 window
    resumes deterministically at backlog position 51.  The derivation is
    recomputed here from the module blocks WITHOUT the front-window pin
    — a registry insertion that would silently skip a backlog query
    changes the recomputed head and fails this test.  (The first
    version of this test compared the window against the post-pin tail,
    which is disjoint from the window by construction — a tautology the
    r5 code review caught.)"""
    # queries registered AFTER the r5 window was frozen (the window is a
    # snapshot of the backlog at freeze time; the freeze budget is ≤ +10
    # and each addition must be listed here or this test fails)
    registered_after_freeze = {"media_image_header_meta"}
    checked = _prior_checked()
    oracles = E.oracle_sql()
    # module order = the merged blocks, BOTH pin blocks excluded (the
    # front window at index 0 and the backlog hedge at index 1)
    module_order: dict[str, object] = {}
    for qs_block, _ in E._registries()[2:]:
        module_order.update(qs_block)
    backlog = [n for n in module_order
               if n not in checked and n in oracles
               and n != "events_tws_running_totals"
               and n not in registered_after_freeze]
    window_rest = [n for n in E.FRONT_WINDOW
                   if n != "events_tws_running_totals"]
    assert window_rest == backlog[:len(window_rest)], (
        "window slots 2..50 must be exactly the head of the "
        "never-checked oracled backlog in module order")


def test_backlog_hedge_block_is_first_signal_in_order():
    """Positions 51+ (the backlog hedge pinned behind the window) must
    be exactly the never-checked oracled queries NOT in the window, in
    module order — so a wider-than-50 driver cap only ever lands on
    first-signal queries."""
    checked = _prior_checked()
    oracles = E.oracle_sql()
    qs = list(E.queries())
    module_order: dict[str, object] = {}
    for qs_block, _ in E._registries()[2:]:
        module_order.update(qs_block)
    expected = [n for n in module_order
                if n not in checked and n in oracles
                and n not in E.FRONT_WINDOW]
    got = qs[WINDOW:WINDOW + len(expected)]
    assert got == expected
