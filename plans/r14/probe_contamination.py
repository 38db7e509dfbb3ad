"""Phase-level timing + job-count probe for the contamination family
(round-14 guide §1 'measure first').  Runs each phase of the
contamination_cut chain in isolation at the session's core count and
reports wall seconds + Spark job count per phase.

Usage: SPARK_GRAFT_CPUS=32 python plans/r14/probe_contamination.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))

from pyspark.sql import functions as F  # noqa: E402

from dht11_data_pipeline_spark.session import get_spark  # noqa: E402
from dht11_data_pipeline_spark.sources.tables import load_table  # noqa: E402
from dht11_data_pipeline_spark.operators import textops  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    spark = get_spark("probe_contamination")
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    def jobs() -> int:
        ids = tracker.getJobIdsForGroup(None)
        return max(ids) + 1 if ids else 0

    def phase(name, fn, reps=2):
        best, jn = None, 0
        for _ in range(reps):
            j0 = jobs()
            t0 = time.perf_counter()
            fn()
            dt = time.perf_counter() - t0
            jn = jobs() - j0
            best = dt if best is None else min(best, dt)
        print(f"{name:42s} {best:7.3f}s  jobs={jn}")

    docs = load_table(spark, SF_DIR, "documents")
    docs.count()  # warm the scan

    # warm codegen/JIT once through the whole chain
    textops.contamination_cut(docs).write.format("noop").mode(
        "overwrite").save()

    # --- full keys ---
    for name, fn in [
        ("cur_contamination_matrix",
         lambda: textops.contamination_matrix(docs)),
        ("cur_contamination_pairs",
         lambda: textops.contamination_pairs(docs)),
        ("cur_contamination_spans",
         lambda: textops.contamination_spans(docs)),
        ("cur_contamination_pos_spans",
         lambda: textops.contamination_pos_spans(docs)),
        ("cur_contamination_gate",
         lambda: textops.contamination_gate(docs)),
        ("cur_contamination_cut",
         lambda: textops.contamination_cut(docs)),
    ]:
        phase(name, lambda fn=fn: fn().write.format("noop")
              .mode("overwrite").save())

    # --- decomposition of the index build ---
    from dht11_data_pipeline_spark.functions.text import shingles
    from dht11_data_pipeline_spark.operators.textops import (
        tokens, MAX_SOURCES_PER_GRAM)

    def sdg_distinct():
        return (docs.select(F.col("source").alias("src"),
                            F.col("doc_id").alias("doc"),
                            F.explode(shingles(tokens("text"), 7))
                            .alias("gram"))
                .distinct())

    phase("index: explode+distinct only",
          lambda: sdg_distinct().write.format("noop")
          .mode("overwrite").save())

    def stats_agg():
        sdg = sdg_distinct()
        return (sdg.groupBy("gram")
                .agg(F.count_distinct("src").alias("_n_src"),
                     F.count(F.lit(1)).alias("n_docs_gram")))

    phase("index: distinct+stats agg (count_distinct)",
          lambda: stats_agg().write.format("noop")
          .mode("overwrite").save())

    def stats_two_level():
        sdg = sdg_distinct()
        per_src = sdg.groupBy("gram", "src").agg(
            F.count(F.lit(1)).alias("_c"))
        return (per_src.groupBy("gram")
                .agg(F.count(F.lit(1)).alias("_n_src"),
                     F.sum("_c").alias("n_docs_gram")))

    phase("index: distinct+stats two-level agg",
          lambda: stats_two_level().write.format("noop")
          .mode("overwrite").save())

    def index_full():
        return textops.contamination_index(docs)

    phase("index: full build (checkpoint)", index_full)

    # --- window-form stats (dense_rank over gram) ---
    def stats_window():
        from pyspark.sql.window import Window
        sdg = sdg_distinct()
        wg = Window.partitionBy("gram")
        rk = F.dense_rank().over(Window.partitionBy("gram").orderBy("src"))
        return (sdg.withColumn("_rk", rk)
                .withColumn("_n_src", F.max("_rk").over(wg))
                .withColumn("n_docs_gram", F.count(F.lit(1)).over(wg))
                .filter(F.col("_n_src").between(2, MAX_SOURCES_PER_GRAM))
                .select("gram", "src", "doc", "n_docs_gram"))

    phase("index: window-form (dense_rank)",
          lambda: stats_window().write.format("noop")
          .mode("overwrite").save())

    # --- drill-down increments on a prebuilt index ---
    idx = textops.contamination_index(docs)

    phase("pairs from prebuilt index",
          lambda: textops.contamination_pairs(docs, index=idx)
          .write.format("noop").mode("overwrite").save())
    phase("pos_spans from prebuilt index",
          lambda: textops.contamination_pos_spans(docs, index=idx)
          .write.format("noop").mode("overwrite").save())
    phase("cut from prebuilt index",
          lambda: textops.contamination_cut(docs, index=idx)
          .write.format("noop").mode("overwrite").save())

    n_idx = idx.count()
    n_flagged = textops.contamination_pairs(docs, index=idx).count()
    print(f"index rows={n_idx}  flagged pairs={n_flagged}")
    spark.stop()


if __name__ == "__main__":
    main()
