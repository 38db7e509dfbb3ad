"""Pin the mechanical verify-window rotation (round-4 verdict item 1).

The external harness diff-checks only the first 50 keys of
``__spark_entry__.queries()`` per round.  Rounds 3 and 4 shipped with a
hand-maintained window that was never rotated, so the newest keys went
two rounds with local-only evidence.  ``verify_window`` now computes the
ordering from the committed ``CORRECTNESS_r*.json`` files; these tests
make the old failure mode impossible rather than re-promising it.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entry

WINDOW = 50


def test_never_verified_keys_lead_the_window():
    """No never-driver-verified key may sit outside the window while a
    stable (already-green) key occupies a window slot."""
    keys = list(entry.queries())
    green = entry._driver_green_keys()
    never = [k for k in keys if k not in green]
    window = keys[:WINDOW]
    outside = [k for k in never if k not in window]
    if outside:
        stale_in_window = [k for k in window if k in green]
        assert not stale_in_window, (
            f"never-verified keys {outside} are outside the 50-key window "
            f"while stable keys {stale_in_window[:5]}... occupy slots")
    # And ordering within the window: every never-verified key precedes
    # every stable key.
    last_never = max((window.index(k) for k in never if k in window),
                     default=-1)
    first_green = min((window.index(k) for k in window if k in green),
                      default=WINDOW)
    assert last_never < first_green


def test_window_is_computed_not_hand_listed():
    """verify_window is a pure function of the registry + committed
    CORRECTNESS files — re-deriving it must match queries() ordering."""
    keys = list(entry.queries())
    recomputed = entry.verify_window(keys)
    assert keys[:WINDOW] == recomputed[:WINDOW]


def test_changed_keys_follow_never_verified():
    keys = list(entry.queries())
    green = entry._driver_green_keys()
    never = [k for k in keys if k not in green]
    for k in entry.CHANGED_THIS_ROUND:
        assert k in keys, f"CHANGED_THIS_ROUND key {k} not registered"
        if k in green and len(never) + len(entry.CHANGED_THIS_ROUND) <= WINDOW:
            assert keys.index(k) < WINDOW


def test_regressed_key_reenters_window(tmp_path):
    """Latest round wins per key (round-5 ADVICE): a key green in r1 but
    red in r2 must NOT be in the green set, so it mechanically re-enters
    the priority window; a key red in r1 but green in r2 is green."""
    g = {"rows_match": True, "schema_match": True, "hash_match": True}
    r = {**g, "hash_match": False}
    (tmp_path / "CORRECTNESS_r01.json").write_text(
        '{"regressed": %s, "recovered": %s, "stable": %s}'
        % tuple(__import__("json").dumps(x) for x in (g, r, g)))
    (tmp_path / "CORRECTNESS_r02.json").write_text(
        '{"regressed": %s, "recovered": %s}'
        % tuple(__import__("json").dumps(x) for x in (r, g)))
    green = entry._driver_green_keys(str(tmp_path))
    assert green == {"recovered", "stable"}


def test_unregistered_changed_key_cannot_crash_queries():
    """A renamed/stale CHANGED_THIS_ROUND entry is filtered out inside
    verify_window rather than KeyError-ing queries() (round-5 ADVICE)."""
    keys = [k for k in entry.queries()]
    saved = entry.CHANGED_THIS_ROUND[:]
    try:
        entry.CHANGED_THIS_ROUND.append("no_such_key_anywhere")
        window = entry.verify_window(keys)
        assert "no_such_key_anywhere" not in window
        assert entry.queries()  # must not raise
    finally:
        entry.CHANGED_THIS_ROUND[:] = saved


def test_every_key_has_an_oracle_or_documented_exception():
    q = entry.queries()
    o = entry.oracle_sql()
    missing = [k for k in q if k not in o]
    assert missing == [], f"queries without oracle SQL: {missing}"


def test_registry_size_matches_readme_claim():
    """README/SCALING claim the query count in prose — keep them honest
    (round-4 verdict item 2)."""
    n = len(entry.queries())
    readme = (Path(__file__).resolve().parent.parent / "README.md").read_text()
    assert f"{n} " in readme or f"{n}-" in readme or f"{n}\n" in readme, (
        f"README.md never mentions the current query count {n}")
    assert "148 " not in readme or n == 148, (
        "README.md still cites a stale 148-query count")


def test_stable_pad_is_oldest_evidence_first():
    """The pad slots (after never-verified and changed keys) must pick
    the STALEST stable keys — a fixed registration-order pad re-checks
    the same keys forever while the tail's evidence ages silently
    (round-10 verdict item 7)."""
    keys = list(entry.queries())
    green = entry._driver_green_keys()
    last = entry._latest_round_per_key()
    window = entry.verify_window(keys)
    reserved = set(window) - (set(keys) - green)  # never-verified out
    pad = [k for k in window
           if k in green and k not in entry.CHANGED_THIS_ROUND]
    outside_stable = [k for k in keys
                      if k in green and k not in window
                      and k not in entry.CHANGED_THIS_ROUND]
    assert reserved is not None  # window computed
    if pad and outside_stable:
        # no stable key outside the window may be staler than a padded one
        worst_in = max(last.get(k, 0) for k in pad)
        best_out = min(last.get(k, 0) for k in outside_stable)
        assert best_out >= worst_in, (
            f"pad holds a key from round {worst_in} while a round-"
            f"{best_out} key waits outside — rotation broken")


def test_rotation_bounds_staleness():
    """Simulate future rounds: each round the driver checks exactly the
    50-key window, stamping fresh evidence for those keys.  Every
    registered key — including today's stalest backlog — must be
    re-verified within ceil(n/size)+1 rounds, and in steady state no
    key's evidence ever gets older than that bound.  This is the
    mechanical guarantee that replaces 'hope the pad happens to
    rotate' (round-10 verdict item 7: keys existed whose only driver
    row was round 1)."""
    import math

    keys = list(entry.queries())
    green = set(keys)            # steady state: everything verified
    last = dict(entry._latest_round_per_key())
    cur = max(last.values(), default=0)
    bound = math.ceil(len(keys) / WINDOW) + 1

    saved = entry.CHANGED_THIS_ROUND[:]
    try:
        # a realistic per-round change load that eats pad slots
        entry.CHANGED_THIS_ROUND[:] = keys[:5]
        for rnd in range(cur + 1, cur + 2 * bound + 1):
            window = entry.verify_window(keys, last_seen=last, green=green)
            assert len(window) == WINDOW
            for k in window:
                last[k] = rnd
            worst = min(last.get(k, 0) for k in keys)
            if rnd - cur >= bound:
                assert rnd - worst <= bound, (
                    f"after {rnd - cur} simulated rounds a key is "
                    f"{rnd - worst} rounds stale (bound {bound})")
    finally:
        entry.CHANGED_THIS_ROUND[:] = saved
