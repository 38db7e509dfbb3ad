"""Streaming sketch partials == batch-built sketches, bit for bit:
count-min cells are a sum monoid and KMV signatures merge as
bottom-k-of-union, so the merge-on-read views must reproduce the batch
operators exactly over the same events."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from dht11_data_pipeline_spark.operators.sketches import (
    countmin_frequencies,
    kmv_signatures,
)
from dht11_data_pipeline_spark.streaming.sketches import (
    current_countmin,
    current_kmv_signatures,
    start_countmin_stream,
    start_kmv_stream,
)

# deliberately collides across batches: the same (event_type, user_id)
# member and the same event_id key recur in every batch
EVENTS = [
    (i, f"2024-01-01 00:00:{i % 60:02d}", i % 17, f"type_{i % 5}",
     float(i % 7))
    for i in range(240)
]


def _write_feed(src: str, n_batches: int = 3) -> None:
    os.makedirs(src)
    per = len(EVENTS) // n_batches
    for b in range(n_batches):
        path = os.path.join(src, f"b{b}.json")
        with open(path, "w") as f:
            for eid, ts, uid, etype, val in EVENTS[b * per:(b + 1) * per]:
                f.write(json.dumps({
                    "event_id": eid, "ts": ts, "user_id": uid,
                    "event_type": etype, "value": val}) + "\n")
        os.utime(path, (1_700_000_000 + b, 1_700_000_000 + b))


def _batch_events(spark):
    return spark.createDataFrame(
        EVENTS, "event_id long, ts string, user_id long, "
                "event_type string, value double")


def _assert_same(got, want):
    assert got.count() == want.count() > 0
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_streaming_countmin_equals_batch(spark, tmp_path):
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        src = str(tmp_path / "feed")
        _write_feed(src)
        q = start_countmin_stream(
            spark, src, str(tmp_path / "state"), str(tmp_path / "ckpt"),
            key_col="event_id")
        q.awaitTermination(300)
        # >1 partial actually written (the merge path is exercised)
        parts = os.listdir(str(tmp_path / "state" / "cm_cells"))
        assert len([p for p in parts if p.startswith("b")]) > 1
        got = current_countmin(spark, str(tmp_path / "state"))
        want = countmin_frequencies(_batch_events(spark), "event_id")
        _assert_same(got, want)
        # the sketch is lossy upward only: estimates never undercount
        assert got.filter(F.col("cm_est") < F.col("true_n")).count() == 0
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def test_streaming_kmv_equals_batch(spark, tmp_path):
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        src = str(tmp_path / "feed")
        _write_feed(src)
        q = start_kmv_stream(
            spark, src, str(tmp_path / "state"), str(tmp_path / "ckpt"),
            set_col="event_type", member_col="user_id", k=8)
        q.awaitTermination(300)
        parts = os.listdir(str(tmp_path / "state" / "kmv_sig"))
        assert len([p for p in parts if p.startswith("b")]) > 1
        got = current_kmv_signatures(spark, str(tmp_path / "state"), k=8)
        want = kmv_signatures(_batch_events(spark), "event_type",
                              "user_id", k=8)
        _assert_same(got, want)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
