"""JDBC source (SURVEY §2.1 S3: `SELECT * FROM esp_schema.esp_users`,
test1.py:16-18, dag.py:29-31, Airflow-DAG.py:458-465 — plus the thin
single-connection reads throughout CheckInterface_Metadata.py).

The reference reads Oracle through ONE synchronous connection
(dbconnect.py:4-11 — a new connection per cursor, no parallelism).
The Spark-native replacement plans a PARTITIONED read: N executors
each issue a bounded-range query, so a 10⁹-row source table arrives
as N parallel streams instead of one cursor.

Everything here except ``read_table`` is pure planning logic (no
driver, no connection), unit-tested without a database:

- ``range_partition_predicates`` — equal-width ranges over a numeric
  key, first/last unbounded so rows outside the sampled [lo, hi] are
  never lost (Spark's own partitionColumn semantics).
- ``mod_partition_predicates`` — ``MOD(key, n) = i`` stripes for keys
  with pathological skew in the value domain (hot ranges ruin
  equal-width bounds; modulo stripes are skew-proof for dense keys).

``read_table`` feeds either predicate set to ``spark.read.jdbc``.
The whole path (write → partitioned read-back, range and mod stripes)
is exercised against a LIVE embedded Derby database in
tests/test_jdbc_live.py — Derby ships in Spark's jars, so no external
dependency. Pass ``partition_col`` exactly as the remote dialect
resolves it (e.g. '"k"' for a case-sensitive quoted identifier —
Spark's JDBC writer quotes column names on CREATE).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def range_partition_predicates(col: str, lo: int, hi: int, n: int) -> list[str]:
    """N non-overlapping WHERE clauses covering every value of ``col``.

    Mirrors spark.read.jdbc(partitionColumn=...) stride math: first and
    last partitions are open-ended, interior ones are half-open ranges —
    union of the N predicates is provably the whole domain regardless of
    how stale the sampled lo/hi are.
    """
    if n <= 0:
        raise ValueError("need at least one partition")
    if n == 1 or hi <= lo:
        return ["1=1"]
    stride = max(1, (hi - lo) // n)
    preds = [f"{col} < {lo + stride}"]
    for i in range(1, n - 1):
        a, b = lo + i * stride, lo + (i + 1) * stride
        preds.append(f"{col} >= {a} AND {col} < {b}")
    preds.append(f"{col} >= {lo + (n - 1) * stride}")
    return preds


def mod_partition_predicates(col: str, n: int) -> list[str]:
    """N modulo stripes — value-skew-proof partitioning for dense keys.

    ``MOD(ABS(col), n)`` rather than ``MOD(col, n)``: SQL MOD keeps the
    dividend's sign, so plain stripes over 0..n-1 would silently DROP
    negative keys (each belongs to stripe -(|k| mod n), matched by no
    predicate). ABS keeps the stripes a true partition of all integers."""
    if n <= 0:
        raise ValueError("need at least one partition")
    if n == 1:
        return ["1=1"]
    return [f"MOD(ABS({col}), {n}) = {i}" for i in range(n)]


def read_table(spark: SparkSession, url: str, table: str,
               properties: dict[str, str] | None = None,
               partition_col: str | None = None,
               bounds: tuple[int, int] | None = None,
               num_partitions: int = 8,
               mod_stripes: bool = False) -> DataFrame:
    """Partitioned JDBC scan. With no partition_col: single-stream read
    (the reference's behavior — correct, just serial)."""
    properties = properties or {}
    if partition_col is None:
        return spark.read.jdbc(url, table, properties=properties)
    if mod_stripes:
        preds = mod_partition_predicates(partition_col, num_partitions)
    else:
        if bounds is None:
            raise ValueError("range partitioning needs (lo, hi) bounds")
        preds = range_partition_predicates(partition_col, *bounds, num_partitions)
    return spark.read.jdbc(url, table, predicates=preds, properties=properties)
