"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) and prints ONE JSON line.

Each query is forced end-to-end with the `noop` sink (full computation,
no driver collect). Warm-up run of a trivial action first so JVM/codegen
startup isn't billed to the first query.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from dht11_data_pipeline_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "q1_pricing_summary",
    "q3_unshipped_revenue",
    "q5_region_supplier_volume",
    "j2_scd2_delta_classify",
    "a1_latest_order_per_customer",
    "j1_interface_registration",
    "j_asof_latest_event_before_order",
    "t5_tumbling_window_agg",
    "t_sliding_window_agg",
    "w_running_user_value",
    "w_rank_suite",
    "w_range_frame_rolling_spend",
]


def _load_sample() -> tuple[int, float]:
    """(other java processes, 1-minute loadavg) — best-effort."""
    try:
        n_java = len(_java_pids())
    except Exception:  # noqa: BLE001 — conditions are best-effort
        n_java = -1
    try:
        load1 = round(os.getloadavg()[0], 1)
    except OSError:
        load1 = -1.0
    return max(0, n_java), load1


def _java_pids() -> set[int]:
    """All live java PIDs on the box (empty set on pgrep failure)."""
    import subprocess
    out = subprocess.run(["pgrep", "java"], capture_output=True,
                         text=True, timeout=10)
    return {int(p) for p in out.stdout.split()}


def _own_java_pids() -> set[int]:
    """Java PIDs belonging to THIS bench session: those whose /proc
    parent chain reaches this python process. Round-12 ADVICE item 5:
    the old end-of-run sample subtracted a constant 1 on the
    assumption that exactly one java process was ours — wrong both
    when our JVM had already exited at sample time and when it spawned
    helpers, so start/end fields measured different populations.
    Walking PPid chains attributes each PID explicitly."""
    me = os.getpid()
    own: set[int] = set()
    for pid in _java_pids():
        p = pid
        for _ in range(16):  # bounded ancestor walk
            try:
                with open(f"/proc/{p}/status") as fh:
                    ppid = next((int(line.split()[1]) for line in fh
                                 if line.startswith("PPid:")), 0)
            except OSError:
                break
            if ppid == me:
                own.add(pid)
                break
            if ppid <= 1:
                break
            p = ppid
    return own


def _jvm_code_cache(spark) -> dict:
    """Live-JVM JIT code-cache diagnostics, sampled AFTER the timed
    runs — the direct evidence the round-12 verdict asked for on the
    driver rep's late-key spike cluster: (a) did session.py's
    ReservedCodeCacheSize flag actually reach this process (a conf
    string reads back as set even when getOrCreate() reused a JVM that
    never saw it), and (b) how full each code heap ran at end of the
    full registry (saturation ⇒ the sweeper was evicting hot methods
    mid-run, the r9-r12 deopt mechanism). Best-effort."""
    out: dict = {}
    try:
        mf = spark.sparkContext._jvm.java.lang.management.ManagementFactory
        args = [str(a) for a in mf.getRuntimeMXBean().getInputArguments()]
        flags = [a for a in args if "ReservedCodeCacheSize" in a]
        out["code_cache_flag"] = flags[-1] if flags else None
        heaps: dict = {}
        it = mf.getMemoryPoolMXBeans().iterator()
        while it.hasNext():
            pool = it.next()
            name = str(pool.getName())
            if "CodeHeap" in name or "CodeCache" in name:
                usage = pool.getUsage()
                heaps[name] = {
                    "used_mb": round(usage.getUsed() / 1048576, 1),
                    "max_mb": round(usage.getMax() / 1048576, 1),
                }
        out["code_heaps_mb"] = heaps
    except Exception as exc:  # noqa: BLE001 — conditions are best-effort
        out["code_cache_note"] = f"error: {exc}"
    return out


def _run_conditions() -> dict:
    """Record whether the box was quiet: timings on this 32-core host
    move ±20-50% when another Spark JVM runs concurrently, and three
    rounds of 'regressions' on unchanged code traced back to exactly
    that. other_jvms counts java processes besides our own session's;
    load1 is the 1-minute loadavg BEFORE warm-up. The *_at_end twins
    are sampled after the timed runs (round-11 verdict item 2: a rep
    that STARTED quiet shipped with 3-9x per-key spikes — load that
    arrives mid-run is invisible to a start-only sample)."""
    n_java, load1 = _load_sample()
    return {"other_jvms": n_java, "load1_at_start": load1,
            "cpu_probe_ms": _cpu_probe_ms(),
            "cpu_probe32_ms": _cpu_probe32_ms()}


def _cpu_probe_ms() -> float:
    """Repo-independent single-core speed index: wall ms for a fixed
    200k-iteration sha256 chain. Round 10 found the HOST itself drifts
    (this probe moved 128 → 163 ms across one session with zero local
    load — hypervisor contention), which inflates every absolute
    timing; recording the index with each artifact lets cross-round
    comparisons normalize mechanically instead of guessing."""
    import hashlib
    import time
    t0 = time.time()
    h = b"x"
    for _ in range(200_000):
        h = hashlib.sha256(h).digest()
    return round((time.time() - t0) * 1000, 1)


def _cpu_probe32_ms() -> float:
    """All-cores speed index: MEAN per-process wall ms for the same
    sha256 chain run on 32 processes at once. Captures hypervisor
    co-scheduling / SMT dilation that the single-core probe misses —
    round 10 saw bench totals track THIS number while the single-core
    probe looked healthy (a 32-vCPU guest can be slow in aggregate
    with every individual core probing fast). Best-effort: -1 if
    multiprocessing is unavailable."""
    try:
        from multiprocessing import Pool
        with Pool(32) as p:
            times = p.map(_probe_child, range(32))
        return round(sum(times) / len(times) * 1000, 1)
    except Exception:  # noqa: BLE001 — conditions are best-effort
        return -1.0


def _probe_child(_i: int) -> float:
    import hashlib
    import time
    t0 = time.time()
    h = b"x"
    for _ in range(200_000):
        h = hashlib.sha256(h).digest()
    return time.time() - t0


def _untouched_vs_prev(timings: dict[str, float], sf: float,
                       changed: list[str]) -> dict:
    """Self-normalizing drift index: median per-key ratio of THIS run
    vs the prior COMMITTED BENCH_LATEST.json (git HEAD), over keys the
    current round's code did not touch (absent from CHANGED_THIS_ROUND)
    and that exist in both runs at the same SF. Round 10 showed the
    host drifts 1.2-1.6× session-to-session with zero local load, so
    absolute totals can't distinguish host drift from code regressions;
    untouched keys can ONLY move with the host, making their median
    ratio the normalizer — recorded here so the comparison is a
    checkable number in the artifact, not hand-computed prose.
    Best-effort: nulls (with a reason) when there is no comparable
    prior run."""
    out = {"untouched_median_vs_prev": None, "untouched_n_keys": 0}
    try:
        import statistics
        import subprocess
        repo = os.path.dirname(os.path.abspath(__file__))
        prior_raw = subprocess.run(
            ["git", "-C", repo, "show", "HEAD:BENCH_LATEST.json"],
            capture_output=True, text=True, timeout=30)
        if prior_raw.returncode != 0:
            out["untouched_vs_prev_note"] = "no committed BENCH_LATEST"
            return out
        prior = json.loads(prior_raw.stdout)
        if prior.get("sf") != sf:
            out["untouched_vs_prev_note"] = (
                f"prior run at sf={prior.get('sf')}, this run at sf={sf}")
            return out
        prev_q = prior.get("queries", {})
        changed_set = set(changed)
        ratios = [timings[k] / prev_q[k]
                  for k in timings
                  if k not in changed_set and prev_q.get(k, 0) > 0]
        if not ratios:
            out["untouched_vs_prev_note"] = "no untouched keys in common"
            return out
        out["untouched_median_vs_prev"] = round(statistics.median(ratios), 3)
        out["untouched_n_keys"] = len(ratios)
    except Exception as exc:  # noqa: BLE001 — conditions are best-effort
        out["untouched_vs_prev_note"] = f"error: {exc}"
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    conditions = _run_conditions()  # sample BEFORE our own JVM starts
    # if a SparkSession already lives in THIS process, getOrCreate()
    # below reuses its JVM and session.py's extraJavaOptions (the
    # 512 MB code cache) silently never apply — the exact inheritance
    # failure suspected behind the r12 driver rep's late-key spike
    # cluster (sim_label_knn_audit 5.1x on a 1.25x-drift rep). Record
    # the seam so the artifact itself names the mechanism.
    try:
        from pyspark.sql import SparkSession as _SS
        conditions["preexisting_session"] = _SS.getActiveSession() is not None
    except Exception:  # noqa: BLE001 — conditions are best-effort
        pass
    spark = get_spark("bench")

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    # headline first, then EVERY registered query — the bench total
    # tracks the whole engine surface (it grows as coverage grows;
    # compare per-query numbers across rounds, not the raw total)
    names = [n for n in HEADLINE if n in qs] + [
        n for n in sorted(qs) if n not in HEADLINE
    ]

    # warm-up: JVM/codegen via a trivial job, then one pass over each
    # input table (file listing, parquet footers, scan codegen) so the
    # timings below measure query compute on a warm engine rather than
    # billing one-time startup to whichever query runs first
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    from dht11_data_pipeline_spark.sources.tables import TABLES, load_table
    for t in TABLES:
        load_table(spark, sf_dir, t).count()
    # spin up the Python/Arrow worker pool once so mapInPandas queries
    # don't bill daemon startup
    spark.range(32).repartition(32).mapInPandas(
        lambda it: it, schema="id long").count()

    # steady-state warmup: run every query once at the smallest scale so
    # whole-stage codegen classes are compiled before timing (JIT compile
    # of a large generated aggregate costs seconds and is a one-time,
    # data-size-independent cost — at 100 TB it is noise, so the timed
    # runs below measure the throughput that actually scales)
    warm_dir = os.environ.get("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    for name in names:
        try:
            qs[name](spark, warm_dir).write.format("noop").mode("overwrite").save()
        except Exception:
            pass  # warmup is best-effort; the timed run will surface errors

    # best-of-2: one measurement can absorb a GC pause or OS scheduling
    # blip; the minimum is the reproducible compute time. Both reps are
    # kept so the artifact can discriminate spike mechanisms: a key
    # whose two back-to-back reps disagree 3x points at a JVM event
    # (deopt/recompile storm) or a transient host burst DURING that
    # key, while two agreeing slow reps mean the cost is real.
    timings: dict[str, float] = {}
    rep_ratio: dict[str, float] = {}
    for name in names:
        reps = []
        for _ in range(2):
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            reps.append(time.perf_counter() - t0)
        timings[name] = round(min(reps), 3)
        if min(reps) > 0:
            rep_ratio[name] = round(max(reps) / min(reps), 2)

    # end-of-run single-core probe: the start-only probes made a
    # mid-run host burst invisible — a co-scheduled noisy neighbor
    # arriving after start hits the widest-parallel (late-running
    # sim_*) keys hardest while the narrow median barely moves, which
    # is indistinguishable from a JVM deopt storm without a second
    # host sample (round-13 spike decomposition). The 32-way probe is
    # deliberately NOT re-run here: it would measure our own JVM's
    # leftover activity, not the host.
    conditions["cpu_probe_ms_at_end"] = _cpu_probe_ms()
    # the 10 most rep-asymmetric keys: max/min ratio of the two
    # back-to-back reps (see the timing loop) — a spiked key with
    # ratio ~1 was slow in BOTH reps (sustained cause); ratio >>1
    # means one transient event inside a ~2-second window
    conditions["rep_ratio_top"] = dict(
        sorted(rep_ratio.items(), key=lambda kv: -kv[1])[:10])
    _, load_end = _load_sample()
    # the start sample runs before our own JVM exists, so every java
    # PID it sees is foreign; at end our session's JVM (plus any
    # helpers) is alive — attribute PIDs by /proc parent chain so the
    # field means OTHER JVMs at both sample points (ADVICE r12 item 5:
    # the old constant-1 subtraction under- or over-counted whenever
    # the assumption of exactly one own java process broke)
    try:
        foreign_end = _java_pids() - _own_java_pids()
        conditions["other_jvms_at_end"] = len(foreign_end)
    except Exception:  # noqa: BLE001 — conditions are best-effort
        conditions["other_jvms_at_end"] = -1
    conditions["load1_at_end"] = load_end
    conditions.update(_jvm_code_cache(spark))
    want_cache = os.environ.get("SPARK_GRAFT_CODE_CACHE", "512m")
    flag = conditions.get("code_cache_flag")
    if "code_cache_flag" in conditions and (
            flag is None or not str(flag).endswith(f"={want_cache}")):
        print(f"WARNING bench.py: live JVM runs {flag!r} but session.py "
              f"asked for ReservedCodeCacheSize={want_cache} — a "
              f"pre-existing session/JVM swallowed the flag; late-key "
              f"timings in this rep may carry code-cache deopt "
              f"(preexisting_session="
              f"{conditions.get('preexisting_session')})", file=sys.stderr)
    conditions.update(_untouched_vs_prev(
        timings, sf, getattr(entrymod, "CHANGED_THIS_ROUND", [])))
    # drift gate (round-11 verdict item 2): a rep whose untouched keys
    # run >1.3x the prior committed artifact is measuring the HOST,
    # not the code — mark it in the artifact itself so a spiked rep
    # cannot ship as the round's evidence without a named addendum in
    # BENCH_NOTES (tests/test_bench_artifact.py enforces the pairing)
    ratio = conditions.get("untouched_median_vs_prev")
    if ratio is not None and ratio > 1.3:
        conditions["drift_exceeds_gate"] = True
        print(f"WARNING bench.py: untouched-median ratio {ratio} > 1.3 "
              f"vs the prior committed BENCH_LATEST — this rep is "
              f"drift-contaminated; re-run quiet or name the cause in "
              f"BENCH_NOTES before committing it", file=sys.stderr)

    result = {
        "metric": "headline_queries_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "conditions": conditions,
    }
    line = json.dumps(result, separators=(",", ":"))
    # the AUTHORITATIVE full per-query map lives in-repo: the driver
    # keeps only a bounded (~2000-char) tail of stdout, and 135 query
    # timings are ~4 KB — they cannot fit however compactly encoded
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "BENCH_LATEST.json"), "w") as fh:
        fh.write(line + "\n")
    print(line)
    # LAST line: a bounded summary guaranteed to fit the driver's tail
    # whole — total + per-query coverage stats + the slowest queries —
    # so the recorded artifact always holds one complete parseable JSON
    # object even though the full map above gets cut
    vals = sorted(timings.values())
    summary = {
        "metric": "headline_queries_total",
        "value": result["value"],
        "unit": "sec",
        "sf": sf,
        "n_queries": len(timings),
        "conditions": conditions,
        "median_sec": round(vals[len(vals) // 2], 3) if vals else 0.0,
        "over_2s": sum(1 for v in vals if v > 2.0),
        "full_map": "BENCH_LATEST.json",
        "slowest": dict(sorted(timings.items(), key=lambda kv: -kv[1])[:25]),
    }
    line2 = json.dumps(summary, separators=(",", ":"))
    while len(line2) > 1900 and summary["slowest"]:
        summary["slowest"].pop(min(summary["slowest"],
                                   key=summary["slowest"].get))
        line2 = json.dumps(summary, separators=(",", ":"))
    print(line2)


if __name__ == "__main__":
    main()
