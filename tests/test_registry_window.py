"""Driver-window allocation guard.

The per-round driver hash-checks only the FIRST ~50 entries of
``__spark_entry__.queries()`` — the ordering is deliberate signal
allocation.  Round 6 (r5 verdict item 1) spends every slot on
never-driver-checked queries that carry an exact DuckDB oracle — zero
rows-only entries: the next 50 of the 142-query backlog in
merged-registry module order (head ``media_image_header_meta``, then
``ips_policy_value``).  A registry edit that silently reorders or
un-oracles the window would cost a round of correctness signal; this
test pins the contract.

Checked-set derivation (ADVICE r5, low #1): the tests used to hardcode
the prior-round list while ``_registries()`` derives its hedge from a
glob of ALL ``CORRECTNESS_r*.json`` — under a wider-than-50 driver cap
the current round's file would make the two sets diverge.  Now both the
planning-time set (rounds < CURRENT_ROUND, for the window tests) and
the live set (all rounds, for the hedge test) come from the same glob.
"""

import glob
import json
import os
import re

import __spark_entry__ as E

WINDOW = 50

# The round whose window this file pins.  CORRECTNESS files from THIS
# round (or later) contain the window's own driver rows once the driver
# runs, so the planning-time checked-set must exclude them; the hedge
# in _registries() deliberately includes them (it self-updates).
CURRENT_ROUND = 6
CHANGED_THIS_ROUND: set[str] = set()


def _checked(max_round: int | None = None) -> set[str]:
    """Names with a driver row in any CORRECTNESS_r*.json, via the same
    glob ``_registries()`` uses.  ``max_round`` (exclusive) restricts to
    planning-time rounds; ``None`` matches the registry's live set."""
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    checked: set[str] = set()
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if m and max_round is not None and int(m.group(1)) >= max_round:
            continue
        try:
            with open(path) as fh:
                checked |= set(json.load(fh))
        except (OSError, ValueError):
            pass  # mirror the registry: malformed artifacts don't break
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
    """r5 verdict item 1: zero rows-only slots this round — every window
    query must carry an exact DuckDB oracle."""
    qs, oracles = E.queries(), E.oracle_sql()
    window = list(qs)[:WINDOW]
    rows_only = [n for n in window if n not in oracles]
    assert not rows_only, rows_only


def test_no_window_slot_wasted_on_already_checked_queries():
    """Every slot goes to a query that has never had a driver row in any
    prior round's CORRECTNESS file (245 distinct queries checked over
    r1-r5; re-checking any would burn first-signal capacity).  Uses the
    planning-time checked-set (rounds < CURRENT_ROUND) so the window's
    own rows landing in CORRECTNESS_r06 don't self-flag."""
    checked = _checked(max_round=CURRENT_ROUND)
    rechecks = [n for n in E.FRONT_WINDOW
                if n in checked and n not in CHANGED_THIS_ROUND]
    assert not rechecks, rechecks


def test_window_follows_registry_order_of_the_backlog():
    """The 50 slots are the first never-checked oracled queries in
    MODULE-REGISTRY order, so the r7 window resumes deterministically at
    backlog position 51.  The derivation is recomputed here from the
    module blocks WITHOUT the front-window pin — a registry insertion
    that would silently skip a backlog query changes the recomputed head
    and fails this test."""
    # queries registered AFTER the r6 window was frozen (freeze budget
    # ≤ +10; each oracled addition must be listed here or this fails —
    # rows-only additions don't enter the oracled backlog)
    registered_after_freeze: set[str] = set()
    checked = _checked(max_round=CURRENT_ROUND)
    oracles = E.oracle_sql()
    # module order = the merged blocks, BOTH pin blocks excluded (the
    # front window at index 0 and the backlog hedge at index 1)
    module_order: dict[str, object] = {}
    for qs_block, _ in E._registries()[2:]:
        module_order.update(qs_block)
    backlog = [n for n in module_order
               if n not in checked and n in oracles
               and n not in registered_after_freeze]
    assert E.FRONT_WINDOW == backlog[:WINDOW], (
        "window must be exactly the head of the never-checked oracled "
        "backlog in module order")


def test_backlog_hedge_block_is_first_signal_in_order():
    """Positions 51+ (the backlog hedge pinned behind the window) must
    be exactly the never-checked oracled queries NOT in the window, in
    module order — so a wider-than-50 driver cap only ever lands on
    first-signal queries.  Uses the LIVE checked-set (all CORRECTNESS
    files, same glob as the registry) so the two derivations cannot
    diverge when the current round's file lands (ADVICE r5, low #1)."""
    checked = _checked(max_round=None)
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
