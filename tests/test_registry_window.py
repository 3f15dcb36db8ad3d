"""Driver-window allocation guard.

The per-round driver hash-checks only the FIRST ~50 entries of
``__spark_entry__.queries()`` — the ordering is deliberate signal
allocation.  Round 7 (r6 verdict item 1) starts the post-drain
RE-VERIFY rotation: 47 first-signal slots (the head of the 92-query
never-driver-checked oracled backlog in merged-registry module order)
+ 1 first-signal PROMOTION (`events_stream_stream_left_join`, pulled
forward from backlog position 79 as the most drift-exposed
never-checked query) + 2 re-verify slots for previously-green
high-risk queries (`events_tws_running_totals` r5-green stateful TWS,
`ucb1_replay_policy` r5-green recursive-CTE).  A registry edit that
silently reorders, un-oracles, or re-allocates the window would cost
a round of correctness signal; this test pins the contract.

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
CURRENT_ROUND = 7
# r7 window-policy slots that are NOT first-signal-in-order, each with
# its documented reason (__spark_entry__.py window comment):
RE_VERIFY_SLOTS = {"events_tws_running_totals", "ucb1_replay_policy"}
PROMOTED_SLOTS = {"events_stream_stream_left_join"}
N_FIRST_SIGNAL_IN_ORDER = WINDOW - len(RE_VERIFY_SLOTS) - len(PROMOTED_SLOTS)


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
    """Every window query must carry an exact DuckDB oracle — zero
    rows-only slots (standing policy since r5 verdict item 1)."""
    qs, oracles = E.queries(), E.oracle_sql()
    window = list(qs)[:WINDOW]
    rows_only = [n for n in window if n not in oracles]
    assert not rows_only, rows_only


def test_first_signal_slots_never_had_a_driver_row():
    """Every slot OUTSIDE the declared re-verify set goes to a query
    that has never had a driver row in any prior round's CORRECTNESS
    file (295 distinct queries checked over r1-r6; an undeclared
    re-check would burn first-signal capacity).  Uses the planning-time
    checked-set (rounds < CURRENT_ROUND) so the window's own rows
    landing in CORRECTNESS_r07 don't self-flag."""
    checked = _checked(max_round=CURRENT_ROUND)
    rechecks = [n for n in E.FRONT_WINDOW
                if n in checked and n not in RE_VERIFY_SLOTS]
    assert not rechecks, rechecks


def test_re_verify_slots_are_actually_previously_green():
    """The rotation slots must RE-verify — each declared re-verify
    query needs a prior-round driver row; spending a rotation slot on
    a never-checked query would mislabel first-signal as re-verify."""
    checked = _checked(max_round=CURRENT_ROUND)
    not_prior = [n for n in RE_VERIFY_SLOTS if n not in checked]
    assert not not_prior, not_prior
    assert RE_VERIFY_SLOTS <= set(E.FRONT_WINDOW)


def test_window_follows_registry_order_of_the_backlog():
    """The first-signal slots are the head of the never-checked oracled
    backlog in MODULE-REGISTRY order — 47 in-order + the declared
    promotion — so r8 resumes deterministically at the displaced names.
    The derivation is recomputed here from the module blocks WITHOUT
    the front-window pin — a registry insertion that would silently
    skip a backlog query changes the recomputed head and fails this
    test."""
    # queries registered AFTER the r7 window was frozen (freeze budget
    # ≤ +10; each oracled addition must be listed here or this fails —
    # rows-only additions don't enter the oracled backlog)
    registered_after_freeze: set[str] = {
        # round-7 second-half additions (the full ≤ +10 budget):
        # forecast-eval completions, phonetic blocking, MRR eval,
        # Kruskal-Wallis, KPSS + the auto.arima differencing decision
        "forecast_mase_scores", "forecast_dm_test", "series_ljung_box",
        "series_pacf", "granger_lag1_purchases", "phonetic_token_groups",
        "retrieval_mrr_eval", "kruskal_wallis_values",
        "series_kpss_test", "series_ndiffs_nsdiffs",
    }
    assert len(registered_after_freeze) <= 10, "freeze budget exceeded"
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
    first_signal = [n for n in E.FRONT_WINDOW if n not in RE_VERIFY_SLOTS]
    # 47 in backlog order, then the promotion (which must itself be a
    # backlog member, just out of order)
    assert first_signal[:N_FIRST_SIGNAL_IN_ORDER] == \
        backlog[:N_FIRST_SIGNAL_IN_ORDER], (
        "first-signal slots must be exactly the head of the "
        "never-checked oracled backlog in module order")
    assert first_signal[N_FIRST_SIGNAL_IN_ORDER:] == \
        sorted(PROMOTED_SLOTS), "promotion slots changed"
    assert PROMOTED_SLOTS <= set(backlog), (
        "a promoted slot must be a never-checked oracled backlog query")


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


# ---------------------------------------------------------------------------
# tools/rotation_window.py — the self-advancing cursor (r6 verdict item 5)


def test_rotation_tool_drain_era_matches_pinned_first_signal():
    """While a backlog remains, the tool's first-signal block must equal
    the pinned window's in-order slots — the tool IS the derivation the
    manual window was built from, so they cannot disagree."""
    from tools.rotation_window import derive_window
    res = derive_window(cap=WINDOW, n_reverify=3)
    assert res["era"] == "drain"
    assert len(res["window"]) == WINDOW
    n = WINDOW - 3
    first_signal = [x for x in E.FRONT_WINDOW
                    if x not in RE_VERIFY_SLOTS and x not in PROMOTED_SLOTS]
    assert res["window"][:len(first_signal)] == first_signal
    # re-verify slots: previously-green tier-1 names, oldest-green-first
    checked = _checked(max_round=None)
    for name in res["window"][n:]:
        assert name in checked, "re-verify slot must already be green"


def test_rotation_tool_rotation_era_tiers(tmp_path):
    """Once every oracled query has a driver row, the tool flips to the
    rotation era: tier-1 (streaming/stateful/recursive-CTE) fills the
    first ~10 slots, the rest is oldest-green-first, and the cursor
    advances as newer CORRECTNESS files land."""
    import json as _json

    from tools.rotation_window import derive_window

    oracles = E.oracle_sql()
    row = {"rows_match": True, "schema_match": True, "hash_match": True,
           "spark_rows": 1, "oracle_rows": 1, "err": None}
    # round 1: everything green; round 2: a specific tier-2 slice
    # re-greened — those names must drop to the window's tail
    (tmp_path / "CORRECTNESS_r01.json").write_text(
        _json.dumps({n: row for n in oracles}))
    regreened = sorted(oracles)[:60]
    (tmp_path / "CORRECTNESS_r02.json").write_text(
        _json.dumps({n: row for n in regreened}))
    res = derive_window(cap=WINDOW, n_reverify=3, repo=str(tmp_path))
    assert res["era"] == "rotation"
    assert res["backlog_size"] == 0
    assert len(res["window"]) == WINDOW
    tier1 = res["window"][:10]
    from tools.rotation_window import RECURSIVE_CTE, _streaming_names
    tier1_pool = set(_streaming_names()) | set(RECURSIVE_CTE)
    assert set(tier1) <= tier1_pool
    # tier 2 is oldest-green-first: r2-regreened names may appear only
    # after every r1-only name has been consumed — with 300+ r1-only
    # names and a 40-slot tier 2, none should appear at all
    tier2 = res["window"][10:]
    assert not (set(tier2) & set(regreened)), (
        "recently-re-greened queries must sort behind older greens")


def test_rotation_tool_drain_backfills_transition_round(tmp_path):
    """When the backlog is smaller than the window, the drain era must
    backfill the remaining slots with rotation-ordered greens instead
    of emitting a short window (the r9 transition round)."""
    import json as _json

    from tools.rotation_window import derive_window

    oracles = E.oracle_sql()
    row = {"rows_match": True, "schema_match": True, "hash_match": True,
           "spark_rows": 1, "oracle_rows": 1, "err": None}
    names = list(oracles)
    # everything green except 7 stragglers
    leftover = names[-7:]
    (tmp_path / "CORRECTNESS_r01.json").write_text(
        _json.dumps({n: row for n in names if n not in leftover}))
    res = derive_window(cap=WINDOW, n_reverify=3, repo=str(tmp_path))
    assert res["era"] == "drain"
    assert res["backlog_size"] == 7
    assert len(res["window"]) == WINDOW
    assert res["window"][:7] == [n for n in list(E.queries())
                                 if n in set(leftover)][:7] or \
        set(res["window"][:7]) == set(leftover)
    assert len(set(res["window"])) == WINDOW  # no duplicates


def test_rotation_tool_r8_handoff_preview(tmp_path):
    """Simulate this round's driver run landing (every FRONT_WINDOW name
    green in a synthetic next-round artifact) on top of the real
    committed artifacts: the derived next window must be 50 slots, the
    head of the remaining never-checked backlog first, re-verify slots
    previously green — the exact handoff the window-policy comment
    documents.  Expectations derive from the SAME artifact set the tool
    reads (no hard-coded backlog count), so real future artifacts or
    registrations can't break this test spuriously."""
    import json as _json
    import shutil

    from tools.rotation_window import derive_window

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for p in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        shutil.copy(p, tmp_path)
    row = {"rows_match": True, "schema_match": True, "hash_match": True,
           "spark_rows": 1, "oracle_rows": 1, "err": None}
    (tmp_path / "CORRECTNESS_r99.json").write_text(
        _json.dumps({n: row for n in E.FRONT_WINDOW}))
    # expected checked-set == exactly what the tmp artifacts contain
    checked: set[str] = set()
    for p in glob.glob(os.path.join(str(tmp_path), "CORRECTNESS_r*.json")):
        with open(p) as fh:
            checked |= set(_json.load(fh))
    oracles = E.oracle_sql()
    expected_backlog = [n for n in E.queries()
                        if n in oracles and n not in checked]
    res = derive_window(cap=WINDOW, n_reverify=3, repo=str(tmp_path))
    assert res["era"] == ("drain" if expected_backlog else "rotation")
    assert res["backlog_size"] == len(expected_backlog)
    assert len(res["window"]) == WINDOW
    n_first = min(len(expected_backlog), WINDOW - 3)
    assert res["window"][:n_first] == expected_backlog[:n_first], (
        "next window must open with the never-checked backlog head")
    # every slot past the backlog head is a previously-green re-verify
    for name in res["window"][n_first:]:
        assert name in checked, name
    assert all(n in oracles for n in res["window"])
    assert len(set(res["window"])) == WINDOW
