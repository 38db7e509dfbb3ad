"""Partition right-sizing for CPU-heavy narrow operators.

A small parquet table arrives as ONE input split, so per-row-expensive
work (shingling, hashing, vector math) runs on one core no matter how
many the session has. On a real cluster a 100 TB input has thousands of
splits and this helper is a no-op; locally it buys full parallelism for
one cheap shuffle of the raw rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def right_size(df: DataFrame, factor: int = 1) -> DataFrame:
    """Repartition up to ``factor × defaultParallelism`` iff the input
    has fewer partitions than cores — never shrinks, never shuffles an
    already-parallel input."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism * factor
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
