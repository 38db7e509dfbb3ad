"""Regenerates SCALING.md: every registered query timed at sf0.001 /
sf0.01 / sf0.1 in ONE warm session (same warm-up discipline as
bench.py), with the wall-clock ratio of the last 10x data step.
Ratios near 1 are fixed-overhead dominated; near 10 scale linearly;
super-linear flags a quadratic plan shape.

    python scaling_audit.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from dht11_data_pipeline_spark.session import get_spark  # noqa: E402

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01",
           "/root/testdata/sf0.1"]


def _verdict_section(names: list[str]) -> list[str]:
    """Per-SF VERIFIED-correctness record (round-5 verdict item 9):
    reads the machine-written verdict files that ``python
    tests/diffcheck.py <sf_dir>`` drops in tests/verdicts/, so
    SCALING.md's cross-SF correctness claim is backed by recorded
    differential runs — counts, failing keys, and coverage gaps are
    all stated from the artifact, never asserted ahead of it."""
    import json

    here = os.path.dirname(os.path.abspath(__file__))
    out = ["", "## Verified correctness per scale factor", "",
           "Recorded by `python tests/diffcheck.py <sf_dir>` "
           "(tests/verdicts/*.json — row count + column set + "
           "order-insensitive value hash vs DuckDB):", ""]
    any_row = False
    for sf_dir in SF_DIRS:
        sf = os.path.basename(sf_dir)
        path = os.path.join(here, "tests", "verdicts", f"{sf}.json")
        try:
            with open(path) as fh:
                v = json.load(fh)
        except (OSError, json.JSONDecodeError):
            out.append(f"- {sf}: NOT RECORDED — run "
                       f"`python tests/diffcheck.py {sf_dir}`")
            continue
        any_row = True
        checked = {k: r for k, r in v.items() if r.get("ok") is not None}
        ok = sorted(k for k, r in checked.items() if r["ok"])
        bad = sorted(k for k, r in checked.items() if not r["ok"])
        missing = sorted(set(names) - set(v))
        line = f"- {sf}: **{len(ok)}/{len(checked)} match**"
        if bad:
            line += f"; MISMATCH: {', '.join(bad)}"
        if missing:
            line += (f"; not covered by that run ({len(missing)} newer "
                     f"keys): {', '.join(missing[:8])}"
                     + ("…" if len(missing) > 8 else ""))
        out.append(line)
    if not any_row:
        out.append("")
        out.append("(no verdict files recorded yet)")
    return out


def main() -> None:
    spark = get_spark("scaling-audit")
    import __spark_entry__ as entrymod
    from dht11_data_pipeline_spark.sources.tables import TABLES, load_table

    qs = entrymod.queries()
    names = sorted(qs)

    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.range(32).repartition(32).mapInPandas(
        lambda it: it, schema="id long").count()
    for sf_dir in SF_DIRS:
        for t in TABLES:
            load_table(spark, sf_dir, t).count()
    broken: dict[str, str] = {}
    for name in names:  # codegen/JIT warm pass at the smallest scale
        try:
            qs[name](spark, SF_DIRS[0]).write.format("noop").mode("overwrite").save()
        except Exception as exc:  # noqa: BLE001
            broken[name] = f"{type(exc).__name__}: {exc}"

    times: dict[str, list[float]] = {n: [] for n in names if n not in broken}
    for sf_dir in SF_DIRS:
        for name in list(times):
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                try:
                    qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
                except Exception as exc:  # noqa: BLE001
                    # one bad SF must not throw away every other timing
                    broken[name] = f"{sf_dir}: {type(exc).__name__}: {exc}"
                    times.pop(name)
                    break
                best = min(best, time.perf_counter() - t0)
            else:
                times[name].append(best)

    rows = sorted(times.items(), key=lambda kv: -(kv[1][2] / kv[1][1]))
    out = [
        "# SCALING — cross-scale-factor bench (local[32], warm engine)",
        "",
        f"Same {len(times)} queries timed at sf0.001 / sf0.01 / sf0.1 (10x data per",
        "step; documents/embeddings scale with SF). The r(0.1/0.01) column",
        "is the wall-clock ratio for the last 10x step: values near 1 are",
        "fixed-overhead dominated (scheduling, JVM, Python daemons — noise",
        "at cluster scale), values near 10 are data-dominated and scale",
        "linearly; super-linear values would flag a quadratic plan shape.",
        "",
        "| query | sf0.001 s | sf0.01 s | sf0.1 s | r(0.1/0.01) |",
        "|---|---|---|---|---|",
    ]
    for name, (a, b, c) in rows:
        out.append(f"| {name} | {a:.2f} | {b:.2f} | {c:.2f} | {c / b:.1f}x |")
    tot = [sum(t[i] for t in times.values()) for i in range(3)]
    out += ["", f"Totals: sf0.001 {tot[0]:.1f}s, sf0.01 {tot[1]:.1f}s, "
            f"sf0.1 {tot[2]:.1f}s — a 100x data increase costs "
            f"{tot[2] / tot[0]:.1f}x wall-clock on this fixed 32-core box."]
    out += _verdict_section(names)
    if broken:
        out += ["", "FAILED (not timed):"]
        out += [f"- {n}: {err[:200]}" for n, err in sorted(broken.items())]
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "SCALING.md"), "w") as fh:
        fh.write("\n".join(out) + "\n")
    print(f"SCALING.md written ({len(names)} queries)")


if __name__ == "__main__":
    main()
