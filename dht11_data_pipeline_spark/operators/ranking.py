"""Distributed exact global ranking.

``NTILE(n) OVER (ORDER BY ...)`` — an unpartitioned window — is the
classic scale trap: Spark plans it as an Exchange to a SINGLE
partition followed by one task sorting (and buffering) the entire
input. Fine for a dashboard query over thousands of rows; a stalled
30 GB task over a billion-user frame.

``global_ntile`` computes the identical assignment with no
single-partition stage, using the textbook distributed-ranking shape:

1. ``repartitionByRange`` + ``sortWithinPartitions`` on the order
   columns — a range-partitioned parallel sort (what ``ORDER BY``
   compiles to for top-level sorts, but never for window functions).
2. ``spark_partition_id()`` + ``monotonically_increasing_id()``
   projected above the sort give every row its partition and 0-based
   local index (``mid - (pid << 33)``) — no window needed.
3. A ``localCheckpoint`` pins the materialized partitions so the two
   consumers below read the SAME data (range bounds are sampled once;
   a recompute could legally re-sample).
4. Per-partition row counts are an O(#partitions) frame; its running
   sum (a window over those few rows, not over the data) is broadcast
   back, so global rank ``i = offset[pid] + local_i + 1``.
5. The SQL NTILE remainder rule is then pure arithmetic: with
   ``q = N div n`` and ``r = N mod n``, the first ``r`` tiles hold
   ``q + 1`` rows, so ``tile = ceil(i / (q+1))`` while
   ``i <= r*(q+1)`` and ``r + ceil((i - r*(q+1)) / q)`` after.

The arithmetic stays exact: every operand is ≤ N (a count), the
double quotients are ≤ n_tiles, and IEEE division of integers that
small cannot round across an integer boundary.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_PID_SHIFT = 1 << 33  # monotonically_increasing_id = (pid << 33) + local index


def _range_indexed(df: DataFrame, order_by: list[Column]) -> DataFrame:
    """The data path: a range-partitioned parallel sort with each row
    stamped (partition id, encoded local index). Split out so its plan
    (rangepartitioning, no SinglePartition) is directly testable —
    the localCheckpoint in global_ntile truncates lineage, hiding this
    stage from the final plan string."""
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    return (df.repartitionByRange(parallelism, *order_by)
            .sortWithinPartitions(*order_by)
            .withColumn("_pid", F.spark_partition_id())
            .withColumn("_mid", F.monotonically_increasing_id()))


def _ranked(df: DataFrame, order_by: list[Column]):
    """Shared machinery: the checkpointed range-sorted frame joined
    with its O(#partitions) offset frame, plus the 1-based global rank
    column ``i`` and the total count column ``_n``. Callers project a
    rank function of (i, N) and drop the helpers."""
    t = _range_indexed(df, order_by).localCheckpoint(eager=True)
    # O(#partitions) frame: counts, exclusive running offset, total N.
    # The unpartitioned windows here run over ~#partitions rows.
    few = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    all_rows = Window.orderBy("_pid").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
    offs = (t.groupBy("_pid").agg(F.count(F.lit(1)).alias("_cnt"))
            .select("_pid",
                    F.coalesce(F.sum("_cnt").over(few), F.lit(0))
                    .alias("_off"),
                    F.sum("_cnt").over(all_rows).alias("_n")))
    i = (F.col("_off") + (F.col("_mid") - F.col("_pid").cast("long")
                          * F.lit(_PID_SHIFT)) + 1)
    return t.join(F.broadcast(offs), "_pid"), i


def global_ntile(df: DataFrame, n_tiles: int, order_by: list[Column],
                 out_col: str) -> DataFrame:
    """Add ``out_col`` = NTILE(n_tiles) OVER (ORDER BY order_by) to
    ``df`` without a single-partition sort. ``order_by`` must be a
    total order (include a unique tiebreak column) so the assignment
    is deterministic. All input columns are preserved."""
    joined, i = _ranked(df, order_by)
    r = F.col("_n") % n_tiles
    q = ((F.col("_n") - r) / n_tiles).cast("long")
    head = r * (q + 1)  # rows living in the r tiles of size q+1
    tile = (F.when(i <= head, F.ceil(i / (q + 1)))
            .otherwise(r + F.ceil((i - head) / q)))
    return (joined.withColumn(out_col, tile.cast("int"))
            .drop("_pid", "_mid", "_off", "_n"))


def global_row_number(df: DataFrame, order_by: list[Column],
                      out_col: str) -> DataFrame:
    """Add ``out_col`` = ROW_NUMBER() OVER (ORDER BY order_by) — the
    same distributed-ranking machinery as global_ntile, emitting the
    rank itself. The classic use is a full leaderboard / corpus-order
    assignment where a window form would funnel every row through one
    task; here the rank is ``offset[pid] + local index + 1`` with only
    O(#partitions) driver-adjacent state."""
    joined, i = _ranked(df, order_by)
    return (joined.withColumn(out_col, i.cast("bigint"))
            .drop("_pid", "_mid", "_off", "_n"))


def global_rank_cumsum(df: DataFrame, order_by: list[Column],
                       val_col: str, rank_col: str,
                       cum_col: str) -> DataFrame:
    """ROW_NUMBER() and SUM(val) OVER (ORDER BY ... ROWS UNBOUNDED
    PRECEDING) in ONE distributed pass — the Pareto/Lorenz-curve shape
    ("the top N items hold X% of the total") that a plain running-total
    window would funnel through a single task.

    Same two-level decomposition as the rank: the O(#partitions) offset
    frame carries the exclusive prefix of per-partition VALUE sums next
    to the row-count prefix, and the within-partition running total is
    a window partitioned by ``_pid`` — every partition of the
    range-sort works its own slice, so the only global state is
    #partitions prefix values. ``val_col`` must be an existing
    (integer-exact, e.g. cents) column of ``df``."""
    t = _range_indexed(df, order_by).localCheckpoint(eager=True)
    few = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offs = (t.groupBy("_pid").agg(F.count(F.lit(1)).alias("_cnt"),
                                  F.sum(val_col).alias("_vsum"))
            .select("_pid",
                    F.coalesce(F.sum("_cnt").over(few), F.lit(0))
                    .alias("_off"),
                    F.coalesce(F.sum("_vsum").over(few),
                               F.lit(0).cast("bigint")).alias("_voff")))
    local = (Window.partitionBy("_pid").orderBy("_mid")
             .rowsBetween(Window.unboundedPreceding, 0))
    i = (F.col("_off") + (F.col("_mid") - F.col("_pid").cast("long")
                          * F.lit(_PID_SHIFT)) + 1)
    return (t.join(F.broadcast(offs), "_pid")
            .withColumn(rank_col, i.cast("bigint"))
            .withColumn(cum_col,
                        (F.col("_voff") + F.sum(val_col).over(local))
                        .cast("bigint"))
            .drop("_pid", "_mid", "_off", "_voff"))
