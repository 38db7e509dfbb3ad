"""The committed bench artifact must be self-normalizing (round-10
verdict item 2): host drift on this box moves absolute totals 1.2-1.6x
with zero local load, so the judge-facing comparison is the median
per-key ratio of UNTOUCHED keys vs the prior committed run — bench.py
computes it into the artifact's conditions; these guards keep the field
populated instead of letting the normalization decay back into prose.
"""

from __future__ import annotations

import json
import os

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _latest():
    with open(os.path.join(HERE, "BENCH_LATEST.json")) as fh:
        return json.load(fh)


def test_bench_latest_carries_normalization_fields():
    cond = _latest().get("conditions", {})
    assert "untouched_median_vs_prev" in cond, (
        "BENCH_LATEST.json predates the self-normalizing bench — "
        "re-run bench.py and commit the artifact")
    assert "untouched_n_keys" in cond
    v, n = cond["untouched_median_vs_prev"], cond["untouched_n_keys"]
    if v is None:
        # legitimate only when there was nothing to compare against,
        # and the artifact must say why
        assert cond.get("untouched_vs_prev_note"), (
            "null ratio without a recorded reason")
    else:
        assert 0.1 < v < 10.0, f"implausible drift ratio {v}"
        assert n >= 50, (
            f"only {n} untouched keys compared — the normalizer needs "
            f"a wide basis to be meaningful")


def test_bench_latest_carries_cpu_probes():
    cond = _latest().get("conditions", {})
    for field in ("cpu_probe_ms", "cpu_probe32_ms",
                  "other_jvms", "load1_at_start"):
        assert field in cond, field


def test_bench_latest_end_of_run_load_sampled():
    """Round-11 verdict item 2: the shipped end-of-round artifact was a
    spiked rep whose start-sampled conditions looked quiet — load that
    arrives mid-run is invisible to a start-only sample, so bench.py
    now samples load/other-JVMs AFTER the timed runs too. Older
    committed artifacts predate the fields; once an artifact carries
    either end field it must carry both."""
    cond = _latest().get("conditions", {})
    has_any = ("load1_at_end" in cond) or ("other_jvms_at_end" in cond)
    if has_any:
        assert "load1_at_end" in cond and "other_jvms_at_end" in cond


def test_bench_latest_code_cache_evidence():
    """Once an artifact carries the round-13 code-cache diagnostics,
    they must be coherent: the flag that reached the live JVM is the
    one session.py configures (a mismatch means a pre-existing JVM
    swallowed it — the r12 driver-rep spike mechanism — and such a rep
    must not ship as the committed evidence), and the recorded heap
    usage stays below max (saturation = the deopt regime the 512 MB
    setting exists to prevent)."""
    cond = _latest().get("conditions", {})
    if "code_cache_flag" not in cond:
        return  # pre-round-13 artifact
    flag = cond["code_cache_flag"]
    assert flag and "ReservedCodeCacheSize=" in flag, (
        "committed rep ran WITHOUT the code-cache flag — a vanilla or "
        "reused JVM; re-run bench.py in a fresh process")
    heaps = cond.get("code_heaps_mb", {})
    for name, h in heaps.items():
        if h.get("max_mb", 0) > 0:
            assert h["used_mb"] <= h["max_mb"], name
            # the committed rep must not have run saturated
            assert h["used_mb"] < 0.98 * h["max_mb"], (
                f"{name} ended at {h['used_mb']}/{h['max_mb']} MB — "
                "code cache effectively full; bump "
                "SPARK_GRAFT_CODE_CACHE and re-measure")


def test_bench_latest_drift_gate_requires_notes_addendum():
    """A committed rep whose untouched-median ratio exceeds the 1.3
    drift gate must be NAMED in the round's bench notes — the
    round-11 failure was exactly a spiked rep shipping silently. The
    pairing is: bench.py marks the artifact (drift_exceeds_gate), and
    the newest BENCH_NOTES_r*.md must mention the gate."""
    import glob
    import re
    cond = _latest().get("conditions", {})
    if not cond.get("drift_exceeds_gate"):
        return
    # newest by PARSED round number, not string order — lexicographic
    # sort only works while every round is zero-padded to two digits
    # (r9.md or r100.md would make sorted()[-1] read stale notes;
    # round-12 ADVICE item 4)
    notes = sorted(
        glob.glob(os.path.join(HERE, "BENCH_NOTES_r*.md")),
        key=lambda p: int(re.search(r"_r(\d+)", os.path.basename(p)).group(1)))
    assert notes, "drift-flagged artifact with no bench notes at all"
    with open(notes[-1]) as fh:
        text = fh.read()
    assert "drift_exceeds_gate" in text or "drift gate" in text, (
        "committed BENCH_LATEST.json is drift-flagged "
        f"(untouched_median_vs_prev={cond.get('untouched_median_vs_prev')}"
        ") but the newest bench notes never mention the drift gate — "
        "re-run quiet or write the addendum")
