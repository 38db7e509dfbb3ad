"""Run the driver-mirror diff compare for a NAMED SUBSET of queries —
the fast iteration loop while changing one operator family:

    python tests/diffcheck_subset.py sim_ivf_ann sim_kmeans_clusters [--sf /root/testdata/sf0.01]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

from diffcheck import compare_one  # noqa: E402


def main(argv: list[str]) -> int:
    sf_dir = "/root/testdata/sf0.01"
    names = []
    it = iter(argv)
    for a in it:
        if a == "--sf":
            sf_dir = next(it)
        else:
            names.append(a)

    import __spark_entry__ as E
    from dht11_data_pipeline_spark.session import get_spark

    spark = get_spark("diffcheck-subset")
    qs, oracles = E.queries(), E.oracle_sql()
    failures = 0
    for name in names:
        if name not in qs:
            print(f"UNKNOWN query: {name}")
            failures += 1
            continue
        if name not in oracles:
            print(f"SKIP (no oracle): {name}")
            continue
        try:
            probs = compare_one(spark, name, qs[name], oracles[name], sf_dir)
        except Exception as exc:  # noqa: BLE001
            probs = [f"{name}: EXCEPTION {type(exc).__name__}: {exc}"]
        if probs:
            failures += 1
            print("FAIL", *probs, sep="\n  ")
        else:
            print(f"OK   {name}")
    print(f"\n{len(names) - failures}/{len(names)} subset match at {sf_dir}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
