"""Bucketed storage for co-located joins — the 100 TB answer to the
SCD2 full-outer join (SURVEY §7.4: "bucket staging and target by the
natural key and it becomes a zero-shuffle sort-merge join").

``spark.read.parquet`` can't carry bucket metadata, so bucketed tables
go through the session catalog (``saveAsTable`` with ``bucketBy``).
Writing costs one shuffle up front; every subsequent join/aggregation
on the bucket key skips its exchange — the right trade for a target
table that's joined every batch but rewritten rarely.

Requirement for the shuffle-free plan: both sides bucketed by the same
key into the same bucket count, and
``spark.sql.sources.bucketing.enabled`` (default true). AQE leaves
bucketed joins alone, so the plan is stable across data sizes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, bucket_cols: list[str],
                   n_buckets: int = 32, sort: bool = True) -> None:
    """Materialize ``df`` as a bucketed (and bucket-sorted) catalog
    table. Sorting within buckets upgrades the later sort-merge join to
    a merge without per-task sorts."""
    writer = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    if sort:
        writer = writer.sortBy(*bucket_cols)
    writer.saveAsTable(table)


def cobucketed_join(spark: SparkSession, left_table: str, right_table: str,
                    on: list[str], how: str = "inner") -> DataFrame:
    """Join two co-bucketed tables on their bucket key. With matching
    bucket specs the physical plan contains NO Exchange on either side
    (verified by tests/test_bucketing.py)."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
