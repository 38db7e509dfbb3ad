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

# Frames at or under this row count take the plain window-NTILE tier in
# ``global_ntile_auto``: a single-task sort of 100k skinny rows is
# milliseconds, while the distributed machinery costs a fixed 3 jobs
# (range exchange, eager pin, offset frame) regardless of size. Same
# budget-tier discipline as operators/graph.SMALL_EDGE_LIMIT.
SMALL_FRAME_LIMIT = 100_000


def _pin(df: DataFrame, checkpoint_dir: str | None) -> DataFrame:
    """Materialize the range-sorted frame so every consumer reads the
    SAME sampled range bounds. ``localCheckpoint`` (default) stores to
    executor memory/disk — gone with a lost executor, which on a real
    cluster restarts the whole ranking stage; pass ``checkpoint_dir``
    to pin to reliable storage instead (HDFS/S3 path), the
    belt-and-braces form for a long ranking stage at scale.

    ``setCheckpointDir`` is SESSION-GLOBAL state, so this only sets it
    when unset and raises on a conflicting value — silently redirecting
    a dir another caller configured (or relies on) would move THEIR
    checkpoints too."""
    if checkpoint_dir is None:
        return df.localCheckpoint(eager=True)
    sc = df.sparkSession.sparkContext
    current = sc.getCheckpointDir()
    if current is None:
        sc.setCheckpointDir(checkpoint_dir)
    elif not _same_checkpoint_dir(current, checkpoint_dir):
        raise ValueError(
            f"ranking checkpoint_dir={checkpoint_dir!r} conflicts with "
            f"the session's already-configured checkpoint dir "
            f"{current!r}; setCheckpointDir is session-global, so "
            f"refusing to redirect it — pass the configured dir or "
            f"leave checkpoint_dir=None for localCheckpoint")
    return df.checkpoint(eager=True)


def _same_checkpoint_dir(current: str, requested: str) -> bool:
    """getCheckpointDir returns the qualified URI (file:/...) of the
    per-context UUID subdir Spark creates UNDER the configured dir;
    compare (scheme, authority, path) and accept either the dir itself
    or its UUID child so passing the same local dir twice is a no-op.
    Path equality alone is NOT enough: 'hdfs://nn/ckpt' and
    'file:/ckpt' share a path but are different filesystems, and
    treating them as equal would silently checkpoint to the wrong one
    — the exact redirect this guard exists to refuse. A requested dir
    with no scheme is a local path, so it matches only the local
    'file' scheme (with empty authority)."""
    import posixpath
    from urllib.parse import urlparse

    def _parts(d: str) -> tuple[str, str, str]:
        p = urlparse(d)
        scheme = p.scheme or "file"
        path = (p.path or d).rstrip("/")
        return scheme, p.netloc, path

    cur_s, cur_a, cur_p = _parts(current)
    req_s, req_a, req_p = _parts(requested)
    if (cur_s, cur_a) != (req_s, req_a):
        return False
    return cur_p == req_p or posixpath.dirname(cur_p) == req_p


def _range_indexed(df: DataFrame, order_by: list[Column]) -> DataFrame:
    """The data path: a range-partitioned parallel sort with each row
    stamped (partition id, encoded local index). Split out so its plan
    (rangepartitioning, no SinglePartition) is directly testable —
    the checkpoint in global_ntile truncates lineage, hiding this
    stage from the final plan string."""
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    return (df.repartitionByRange(parallelism, *order_by)
            .sortWithinPartitions(*order_by)
            .withColumn("_pid", F.spark_partition_id())
            .withColumn("_mid", F.monotonically_increasing_id()))


def _overflow_guard() -> Column:
    """Loud failure instead of silent rank corruption: the local-index
    decode ``_mid - (pid << 33)`` assumes no partition materializes
    2^33 (~8.6 B) rows or more — beyond it, monotonically_increasing_id
    bleeds into the next partition's id space. The guard rides the
    offset expression (an always-consumed column of the O(#partitions)
    frame, so Catalyst cannot prune it) and costs one comparison per
    PARTITION, not per row."""
    return (F.when(F.col("_cnt") >= F.lit(_PID_SHIFT),
                   F.raise_error(F.format_string(
                       "global ranking: partition %s holds %s rows "
                       "(>= 2^33); local-index decode would corrupt "
                       "ranks — raise parallelism", F.col("_pid"),
                       F.col("_cnt"))).cast("long"))
            .otherwise(F.lit(0)))


def _ranked(df: DataFrame, order_by: list[Column],
            checkpoint_dir: str | None = None):
    """Shared machinery: the checkpointed range-sorted frame joined
    with its O(#partitions) offset frame, plus the 1-based global rank
    column ``i`` and the total count column ``_n``. Callers project a
    rank function of (i, N) and drop the helpers."""
    t = _pin(_range_indexed(df, order_by), checkpoint_dir)
    # O(#partitions) frame: counts, exclusive running offset, total N.
    # The unpartitioned windows here run over ~#partitions rows.
    few = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    all_rows = Window.orderBy("_pid").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
    offs = (t.groupBy("_pid").agg(F.count(F.lit(1)).alias("_cnt"))
            .select("_pid",
                    (F.coalesce(F.sum("_cnt").over(few), F.lit(0))
                     + _overflow_guard()).alias("_off"),
                    F.sum("_cnt").over(all_rows).alias("_n")))
    i = (F.col("_off") + (F.col("_mid") - F.col("_pid").cast("long")
                          * F.lit(_PID_SHIFT)) + 1)
    return t.join(F.broadcast(offs), "_pid"), i


def global_ntile_auto(df: DataFrame, n_tiles: int, order_by: list[Column],
                      out_col: str, n_rows: int | None = None,
                      small_limit: int = SMALL_FRAME_LIMIT) -> DataFrame:
    """Tiered exact NTILE: identical assignment either way, but frames
    that provably fit one task (``n_rows <= small_limit``) take the
    plain window form — one sort task instead of the distributed
    machinery's three fixed jobs — while anything larger routes to
    ``global_ntile``. Pass ``n_rows`` when the caller already knows the
    cardinality (e.g. it just materialized the frame) to avoid the
    count job; ``small_limit=0`` forces the distributed path (the
    test hook, same convention as graph.small_edge_limit)."""
    if n_rows is None:
        n_rows = df.count()
    if n_rows <= small_limit:
        return df.withColumn(
            out_col, F.ntile(n_tiles).over(Window.orderBy(*order_by)))
    return global_ntile(df, n_tiles, order_by, out_col)


def global_ntile(df: DataFrame, n_tiles: int, order_by: list[Column],
                 out_col: str,
                 checkpoint_dir: str | None = None) -> DataFrame:
    """Add ``out_col`` = NTILE(n_tiles) OVER (ORDER BY order_by) to
    ``df`` without a single-partition sort. ``order_by`` must be a
    total order (include a unique tiebreak column) so the assignment
    is deterministic. All input columns are preserved."""
    joined, i = _ranked(df, order_by, checkpoint_dir)
    r = F.col("_n") % n_tiles
    q = ((F.col("_n") - r) / n_tiles).cast("long")
    head = r * (q + 1)  # rows living in the r tiles of size q+1
    tile = (F.when(i <= head, F.ceil(i / (q + 1)))
            .otherwise(r + F.ceil((i - head) / q)))
    return (joined.withColumn(out_col, tile.cast("int"))
            .drop("_pid", "_mid", "_off", "_n"))


def global_row_number(df: DataFrame, order_by: list[Column],
                      out_col: str,
                      checkpoint_dir: str | None = None) -> DataFrame:
    """Add ``out_col`` = ROW_NUMBER() OVER (ORDER BY order_by) — the
    same distributed-ranking machinery as global_ntile, emitting the
    rank itself. The classic use is a full leaderboard / corpus-order
    assignment where a window form would funnel every row through one
    task; here the rank is ``offset[pid] + local index + 1`` with only
    O(#partitions) driver-adjacent state."""
    joined, i = _ranked(df, order_by, checkpoint_dir)
    return (joined.withColumn(out_col, i.cast("bigint"))
            .drop("_pid", "_mid", "_off", "_n"))


def global_rank_cumsum(df: DataFrame, order_by: list[Column],
                       val_col: str, rank_col: str, cum_col: str,
                       checkpoint_dir: str | None = None) -> DataFrame:
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
    t = _pin(_range_indexed(df, order_by), checkpoint_dir)
    few = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offs = (t.groupBy("_pid").agg(F.count(F.lit(1)).alias("_cnt"),
                                  F.sum(val_col).alias("_vsum"))
            .select("_pid",
                    (F.coalesce(F.sum("_cnt").over(few), F.lit(0))
                     + _overflow_guard()).alias("_off"),
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
