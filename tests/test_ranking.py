"""global_ntile must reproduce SQL NTILE exactly (it replaces the
single-partition window in t_rfm_segmentation with a distributed
rank; any divergence from the window form is a correctness bug, not
a tolerance)."""

from __future__ import annotations

import sys

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from dht11_data_pipeline_spark.operators.ranking import global_ntile  # noqa: E402


@pytest.mark.parametrize("n_rows", [0, 1, 3, 4, 5, 6, 23, 100, 1001])
@pytest.mark.parametrize("n_tiles", [2, 5, 7])
def test_global_ntile_matches_window_ntile(spark, n_rows, n_tiles):
    # values collide on purpose (v = id % 7) so the unique-id tiebreak
    # carries the ordering; descending order exercises the range
    # partitioner's non-default sort direction.
    df = spark.range(n_rows).select(
        F.col("id"), (F.col("id") % 7).alias("v"))
    order = [F.col("v").desc(), F.col("id").asc()]
    got = {r["id"]: r["t"] for r in
           global_ntile(df, n_tiles, order, "t").collect()}
    want = {r["id"]: r["t"] for r in
            df.select("id", F.ntile(n_tiles).over(
                Window.orderBy(*order)).alias("t")).collect()}
    assert got == want


@pytest.mark.parametrize("n_rows", [0, 1, 7, 100, 1001])
def test_global_row_number_matches_window(spark, n_rows):
    df = spark.range(n_rows).select(
        F.col("id"), (F.col("id") % 5).alias("v"))
    order = [F.col("v").desc(), F.col("id").asc()]
    from dht11_data_pipeline_spark.operators.ranking import global_row_number
    got = {r["id"]: r["rn"] for r in
           global_row_number(df, order, "rn").collect()}
    want = {r["id"]: r["rn"] for r in
            df.select("id", F.row_number().over(
                Window.orderBy(*order)).cast("bigint").alias("rn")).collect()}
    assert got == want


@pytest.mark.parametrize("n_rows", [0, 1, 7, 100, 1001])
def test_global_rank_cumsum_matches_windows(spark, n_rows):
    from dht11_data_pipeline_spark.operators.ranking import global_rank_cumsum

    df = spark.range(n_rows).select(
        F.col("id"), (F.col("id") % 5).alias("v"),
        ((F.col("id") * 37) % 1000).cast("bigint").alias("val"))
    order = [F.col("v").desc(), F.col("id").asc()]
    got = {r["id"]: (r["rn"], r["cum"]) for r in
           global_rank_cumsum(df, order, "val", "rn", "cum").collect()}
    w = Window.orderBy(*order)
    want = {r["id"]: (r["rn"], r["cum"]) for r in df.select(
        "id", F.row_number().over(w).cast("bigint").alias("rn"),
        F.sum("val").over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("bigint").alias("cum")).collect()}
    assert got == want


def test_global_ntile_plan_single_partition_only_on_offset_frame(spark):
    """The data path must be range-partitioned; the only permissible
    SinglePartition exchange is the O(#partitions) offset frame, i.e.
    it must sit directly above the per-_pid count aggregate, never
    above the row-level sort the window form would have required."""
    df = spark.range(10_000).select(
        F.col("id"), (F.col("id") % 3).alias("v"))
    from dht11_data_pipeline_spark.operators.ranking import _range_indexed

    data_path = _range_indexed(df, [F.col("v"), F.col("id")])
    data_plan = data_path._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" in data_plan
    assert "SinglePartition" not in data_plan

    out = global_ntile(df, 5, [F.col("v"), F.col("id")], "t")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window [ntile" not in plan
    lines = plan.splitlines()
    for idx, line in enumerate(lines):
        if "Exchange SinglePartition" in line:
            below = "\n".join(lines[idx + 1:idx + 3])
            assert "HashAggregate(keys=[_pid" in below, (
                "SinglePartition exchange over something other than "
                "the per-partition count frame:\n" + below)


@pytest.mark.parametrize("small_limit", [0, 100_000])
def test_global_ntile_auto_tiers_agree(spark, small_limit):
    """Both tiers of the auto form produce the identical assignment:
    small_limit=0 forces the distributed path (the graph
    small_edge_limit convention), the default takes the window form
    at this size."""
    from dht11_data_pipeline_spark.operators.ranking import global_ntile_auto

    df = spark.range(503).select(F.col("id"), (F.col("id") % 7).alias("v"))
    order = [F.col("v").desc(), F.col("id").asc()]
    got = {r["id"]: r["t"] for r in
           global_ntile_auto(df, 5, order, "t",
                             small_limit=small_limit).collect()}
    want = {r["id"]: r["t"] for r in
            df.select("id", F.ntile(5).over(
                Window.orderBy(*order)).alias("t")).collect()}
    assert got == want


def test_global_ntile_reliable_checkpoint_dir(spark, tmp_path):
    """The opt-in reliable checkpoint (executor-loss-safe at scale)
    must not change the assignment, and the data path must still be
    range-partitioned — no SinglePartition row-level sort."""
    df = spark.range(2003).select(F.col("id"), (F.col("id") % 5).alias("v"))
    order = [F.col("v").asc(), F.col("id").asc()]
    out = global_ntile(df, 4, order, "t",
                       checkpoint_dir=str(tmp_path / "ckpt"))
    got = {r["id"]: r["t"] for r in out.collect()}
    want = {r["id"]: r["t"] for r in
            df.select("id", F.ntile(4).over(
                Window.orderBy(*order)).alias("t")).collect()}
    assert got == want
    from dht11_data_pipeline_spark.operators.ranking import _range_indexed
    plan = _range_indexed(df, order)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "rangepartitioning" in plan
    assert "SinglePartition" not in plan


def test_overflow_guard_raises_loudly(spark):
    """A partition count at or past 2^33 must fail the job with the
    named error, not silently corrupt ranks (the guard rides the
    offset expression of the O(#partitions) frame)."""
    from dht11_data_pipeline_spark.operators.ranking import _overflow_guard

    bad = spark.createDataFrame([(0, 1 << 33)], "_pid int, _cnt long")
    with pytest.raises(Exception, match="local-index decode"):
        bad.select((F.lit(0) + _overflow_guard()).alias("_off")).collect()
    ok = spark.createDataFrame([(0, (1 << 33) - 1)], "_pid int, _cnt long")
    assert ok.select((F.lit(0) + _overflow_guard()).alias("_off")) \
        .collect()[0]["_off"] == 0


def test_weighted_keep_rate_tracks_weight(spark):
    """The importance gate's empirical keep rate must track the
    keep_ppm the operator itself reports: over many ids per weight
    class, observed Y-fraction lands within a wide tolerance of the
    target probability, and w = w_max with rate 1e6 keeps everything."""
    from dht11_data_pipeline_spark.operators.curation import weighted_keep

    df = spark.range(8000).select(
        F.col("id").alias("doc_id"),
        # four weight classes: 25, 50, 75, 100 (w_max)
        ((F.col("id") % 4 + 1) * 25).alias("w"))
    out = weighted_keep(df, F.col("w"), rate_ppm=1_000_000).collect()
    by_w: dict[int, list] = {}
    for r in out:
        by_w.setdefault(r["weight"], []).append(r)
    assert set(by_w) == {25, 50, 75, 100}
    for w, rows in by_w.items():
        target = w / 100  # rate 1.0 x w / w_max
        ppm = rows[0]["keep_ppm"]
        assert ppm == int(1_000_000 * w) // 100
        got = sum(1 for r in rows if r["keep_flag"] == "Y") / len(rows)
        assert abs(got - target) < 0.05, (w, got, target)
    assert all(r["keep_flag"] == "Y" for r in by_w[100])


@pytest.mark.parametrize("bad", ["null", "negative", "all_zero"])
def test_weighted_keep_rejects_degenerate_inputs(spark, bad):
    """NULL / negative weights and an all-zero corpus are exactly
    where Spark's least()/DIV semantics diverge from DuckDB's // —
    the gate must raise, not silently emit engine-specific output."""
    from dht11_data_pipeline_spark.operators.curation import weighted_keep

    rows = {"null": [(1, 5), (2, None)],
            "negative": [(1, 5), (2, -3)],
            "all_zero": [(1, 0), (2, 0)]}[bad]
    df = spark.createDataFrame(rows, "doc_id bigint, w bigint")
    with pytest.raises(Exception, match="weighted_keep"):
        weighted_keep(df, F.col("w")).collect()


def test_pin_refuses_conflicting_checkpoint_dir(spark, tmp_path):
    """setCheckpointDir is session-global: _pin may claim it when
    unset and must no-op on the same dir, but a DIFFERENT dir while
    one is configured raises instead of silently redirecting other
    callers' checkpoints (ADVICE r9)."""
    from dht11_data_pipeline_spark.operators.ranking import _pin

    sc = spark.sparkContext
    before = sc.getCheckpointDir()
    dir_a, dir_b = str(tmp_path / "a"), str(tmp_path / "b")
    try:
        sc.setCheckpointDir(dir_a)
        df = spark.range(10)
        _pin(df, dir_a)  # same dir: allowed
        with pytest.raises(ValueError, match="session-global"):
            _pin(df, dir_b)
        _pin(df, None)  # localCheckpoint path never touches the dir
        # still dir_a's UUID child — nothing redirected it
        assert "/a/" in sc.getCheckpointDir()
    finally:
        spark._jsc.sc().setCheckpointDir(before)


def test_same_checkpoint_dir_compares_scheme_and_authority():
    """Path equality alone is not dir equality: 'hdfs://nn/ckpt' and
    'file:/ckpt' share a path but live on different filesystems, and
    conflating them would silently checkpoint to the wrong one — the
    exact redirect _pin's guard exists to refuse (ADVICE r10)."""
    from dht11_data_pipeline_spark.operators.ranking import (
        _same_checkpoint_dir)

    # same local dir, any spelling, incl. the UUID child Spark appends
    assert _same_checkpoint_dir("file:/ckpt", "/ckpt")
    assert _same_checkpoint_dir("file:///ckpt", "file:/ckpt")
    assert _same_checkpoint_dir("file:/ckpt/uuid-123", "/ckpt")
    # same remote dir (and its UUID child)
    assert _same_checkpoint_dir("hdfs://nn:8020/ckpt", "hdfs://nn:8020/ckpt")
    assert _same_checkpoint_dir("hdfs://nn:8020/ckpt/u1", "hdfs://nn:8020/ckpt")
    # different filesystem, same path: NOT the same dir
    assert not _same_checkpoint_dir("hdfs://nn:8020/ckpt", "/ckpt")
    assert not _same_checkpoint_dir("file:/ckpt", "hdfs://nn:8020/ckpt")
    assert not _same_checkpoint_dir("hdfs://nn1/ckpt", "hdfs://nn2/ckpt")
    assert not _same_checkpoint_dir("s3a://bucket/ckpt", "hdfs://nn/ckpt")
