"""A/B: minhash signatures via explode+groupBy-min (current) vs a
shuffle-free per-row HOF form with the sha256 base hash projected
OUTSIDE the k seeded lambdas (VERDICT r13 item 7 re-measure).
Asserts bit-equality, then times both with the noop sink.
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
from dht11_data_pipeline_spark.operators import dedup  # noqa: E402
from dht11_data_pipeline_spark.operators.dedup import (  # noqa: E402
    MINHASH_A, MINHASH_B, MINHASH_P, _doc_shingles)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def hof_signature(df, text_col="text", id_col="doc_id", n=3, num_hashes=8):
    base = lambda s: F.pmod(  # noqa: E731
        F.conv(F.substring(F.sha2(s, 256), 1, 15), 16, 10).cast("bigint"),
        F.lit(MINHASH_P))
    staged = (_doc_shingles(df, text_col, id_col, n)
              .select(F.col(id_col),
                      F.transform("shingle_set", base).alias("_bases")))
    def _seeded(s):
        return lambda b: (b * MINHASH_A[s] + MINHASH_B[s]) % MINHASH_P

    sig = F.array(*[
        F.array_min(F.transform("_bases", _seeded(s)))
        for s in range(num_hashes)])
    return staged.select(F.col(id_col), sig.alias("signature"))


def main() -> None:
    spark = get_spark("probe_minhash")
    docs = load_table(spark, SF_DIR, "documents")
    docs.count()

    old = dedup.minhash_signature(docs)
    new = hof_signature(docs)
    # bit-equality (integer arithmetic: min over the same multiset)
    diff = old.exceptAll(new).count() + new.exceptAll(old).count()
    print("diff rows:", diff)
    assert diff == 0

    def timeit(label, fn, reps=3):
        best = None
        for _ in range(reps):
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            best = min(best or 9e9, time.perf_counter() - t0)
        print(f"{label:28s} {best:6.3f}s")

    timeit("old explode+groupBy", lambda: dedup.minhash_signature(docs))
    timeit("new HOF per-row", lambda: hof_signature(docs))
    # full chain comparison
    timeit("chain old (near_dups)",
           lambda: dedup.minhash_near_duplicates(docs, threshold=0.5))
    spark.stop()


if __name__ == "__main__":
    main()
