"""Streaming fixed-point EWMA == batch closed form: the (Y, t) state
fold must emit bit-for-bit the rows fixed_point_ewma produces over the
same ordered stream — including users whose sequence straddles batch
boundaries and users hitting the max_steps cap mid-stream."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from dht11_data_pipeline_spark.operators.sequence import fixed_point_ewma
from dht11_data_pipeline_spark.streaming.ewma import streaming_ewma

EVENT_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("event_id", T.LongType()),
    T.StructField("ts", T.TimestampType()),
    T.StructField("value", T.DoubleType()),
])


def test_streaming_ewma_equals_batch(spark, tmp_path, sf_dir):
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        ev = (spark.read.parquet(f"{sf_dir}/events.parquet")
              .filter(F.col("user_id") < 12)
              .select("user_id", "event_id",
                      F.col("ts").cast("timestamp").alias("ts"), "value")
              .orderBy("ts", "event_id").collect())
        assert len(ev) > 30
        src = str(tmp_path / "feed")
        os.makedirs(src)
        third = len(ev) // 3
        for i, chunk in enumerate([ev[:third], ev[third:2 * third],
                                   ev[2 * third:]]):
            path = os.path.join(src, f"b{i}.json")
            with open(path, "w") as f:
                for r in chunk:
                    f.write(json.dumps({
                        "user_id": r["user_id"], "event_id": r["event_id"],
                        "ts": r["ts"].isoformat(sep=" "),
                        "value": r["value"]}) + "\n")
            # FileStreamSource orders by mtime; same-mtime files may
            # process out of name order — pin distinct mtimes so the
            # in-order feed is genuinely in order (strict mode raises
            # on violation by design).
            os.utime(path, (1_700_000_000 + i, 1_700_000_000 + i))

        out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
        stream = streaming_ewma(
            spark.readStream.schema(EVENT_SCHEMA)
            .option("maxFilesPerTrigger", 1).json(src),
            max_steps=15)
        q = (stream.writeStream.format("parquet").option("path", out_dir)
             .outputMode("append").option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(300)

        got = spark.read.parquet(out_dir)
        sub = spark.createDataFrame(ev, EVENT_SCHEMA)
        expect = fixed_point_ewma(sub, max_steps=15)
        assert got.count() == expect.count() > 0
        assert got.exceptAll(expect).count() == 0
        assert expect.exceptAll(got).count() == 0
        # cap engaged: some user reached 15 steps
        assert got.filter(F.col("rn") == 15).count() > 0
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def _write_feed(src: str, batches) -> None:
    os.makedirs(src)
    for i, chunk in enumerate(batches):
        path = os.path.join(src, f"b{i}.json")
        with open(path, "w") as f:
            for user_id, event_id, ts, value in chunk:
                f.write(json.dumps({
                    "user_id": user_id, "event_id": event_id,
                    "ts": ts, "value": value}) + "\n")
        os.utime(path, (1_700_000_000 + i, 1_700_000_000 + i))


def _run_feed(spark, tmp_path, batches, **kwargs):
    src = str(tmp_path / "feed")
    _write_feed(src, batches)
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    stream = streaming_ewma(
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1).json(src), **kwargs)
    q = (stream.writeStream.format("parquet").option("path", out_dir)
         .outputMode("append").option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(300)
    return spark.read.parquet(out_dir)


OOO_BATCHES = [
    [(1, 10, "2024-01-01 00:00:10", 1.0),
     (1, 20, "2024-01-01 00:00:20", 2.0)],
    # regression: earlier event-time arrives in a later micro-batch
    [(1, 15, "2024-01-01 00:00:15", 3.0)],
]


def test_streaming_ewma_strict_raises_on_out_of_order(spark, tmp_path):
    import pytest
    from pyspark.errors.exceptions.captured import StreamingQueryException

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    try:
        with pytest.raises(StreamingQueryException) as exc:
            _run_feed(spark, tmp_path, OOO_BATCHES)
        assert "OutOfOrderEventError" in str(exc.value)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def test_streaming_ewma_non_strict_absorbs_out_of_order(spark, tmp_path):
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    try:
        got = _run_feed(spark, tmp_path, OOO_BATCHES, strict=False)
        # all three events absorbed, arrival order (10, 20, then 15)
        rows = {r["event_id"]: r["rn"] for r in got.collect()}
        assert rows == {10: 1, 20: 2, 15: 3}
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def test_streaming_ewma_strict_skips_exact_redelivery(spark, tmp_path):
    """At-least-once redelivery of the last absorbed (ts, event_id) is
    an idempotent skip, not an OutOfOrderEventError."""
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    try:
        got = _run_feed(spark, tmp_path, [
            [(1, 10, "2024-01-01 00:00:10", 1.0),
             (1, 20, "2024-01-01 00:00:20", 2.0)],
            # replayed tail event + one genuinely new event
            [(1, 20, "2024-01-01 00:00:20", 2.0),
             (1, 30, "2024-01-01 00:00:30", 3.0)],
        ])
        rows = {r["event_id"]: r["rn"] for r in got.collect()}
        # the redelivered event_id=20 emitted once (from batch 0 only)
        assert rows == {10: 1, 20: 2, 30: 3}
        assert got.count() == 3
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def test_streaming_ewma_strict_skips_multi_event_overlap(spark, tmp_path):
    """An at-least-once source re-sending a WINDOW of already-absorbed
    events (not just the tail) must skip them all idempotently
    (round-6 ADVICE): batch 1 replays both batch-0 events before the
    new one."""
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    try:
        got = _run_feed(spark, tmp_path, [
            [(1, 10, "2024-01-01 00:00:10", 1.0),
             (1, 20, "2024-01-01 00:00:20", 2.0)],
            # full-window redelivery + one genuinely new event
            [(1, 10, "2024-01-01 00:00:10", 1.0),
             (1, 20, "2024-01-01 00:00:20", 2.0),
             (1, 30, "2024-01-01 00:00:30", 3.0)],
        ])
        rows = {r["event_id"]: r["rn"] for r in got.collect()}
        assert rows == {10: 1, 20: 2, 30: 3}
        assert got.count() == 3
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def test_streaming_ewma_replay_beyond_window_raises(spark, tmp_path):
    """An absorbed event redelivered AFTER falling out of the
    replay_window ring is indistinguishable from a genuinely
    out-of-order event and must raise."""
    import pytest
    from pyspark.errors.exceptions.captured import StreamingQueryException

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    try:
        with pytest.raises(StreamingQueryException) as exc:
            _run_feed(spark, tmp_path, [
                [(1, 10, "2024-01-01 00:00:10", 1.0),
                 (1, 20, "2024-01-01 00:00:20", 2.0),
                 (1, 30, "2024-01-01 00:00:30", 3.0)],
                # event 10 has been evicted from the 2-deep ring
                [(1, 10, "2024-01-01 00:00:10", 1.0)],
            ], replay_window=2)
        assert "OutOfOrderEventError" in str(exc.value)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def test_streaming_ewma_strict_raises_on_null_ts(spark, tmp_path):
    import pytest
    from pyspark.errors.exceptions.captured import StreamingQueryException

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    try:
        with pytest.raises(StreamingQueryException) as exc:
            _run_feed(spark, tmp_path, [
                [(1, 10, "2024-01-01 00:00:10", 1.0)],
                [(1, 20, None, 2.0)],
            ])
        assert "NullTimestampEventError" in str(exc.value)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
