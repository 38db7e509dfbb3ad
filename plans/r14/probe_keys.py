"""Per-key wall time + job count probe (guide §1): run named registry
keys warm (best-of-2 after one warmup at the same SF) and report
seconds + Spark job count, so job-count floors are a measured number.

Usage: SPARK_GRAFT_CPUS=32 python plans/r14/probe_keys.py key1 key2 ...
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))

from dht11_data_pipeline_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main(names: list[str]) -> None:
    spark = get_spark("probe_keys")
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    import __spark_entry__ as E
    qs = E.queries()

    def jobs() -> int:
        ids = tracker.getJobIdsForGroup(None)
        return max(ids) + 1 if ids else 0

    from dht11_data_pipeline_spark.sources.tables import TABLES, load_table
    for t in TABLES:
        load_table(spark, SF_DIR, t).count()
    spark.range(32).repartition(32).mapInPandas(
        lambda it: it, schema="id long").count()

    for name in names:
        fn = qs[name]
        sc.setJobDescription(name)
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        best, jn = None, 0
        for _ in range(2):
            j0 = jobs()
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            jn = jobs() - j0
            best = dt if best is None else min(best, dt)
        print(f"{name:35s} {best:7.3f}s  jobs={jn}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1:])
