"""Exactly-once streaming JDBC sink against live embedded Derby:
stream rows through foreachBatch into a real database, then force a
batch replay and verify no duplicates survive."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from dht11_data_pipeline_spark.streaming.jdbc_sink import (
    BATCH_COL, jdbc_batch_writer)

DRIVER = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}


def test_stream_to_jdbc_exactly_once(spark, tmp_path):
    url = f"jdbc:derby:{tmp_path}/sinkdb;create=true"
    src = tmp_path / "src"
    src.mkdir()
    (src / "a.json").write_text("\n".join(
        json.dumps({"device_id": f"D{i % 3}", "reading": i})
        for i in range(50)))

    stream = (spark.readStream
              .schema("device_id string, reading long").json(str(src)))
    writer = jdbc_batch_writer(url, "readings")
    q = (stream.writeStream.foreachBatch(writer)
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    back = spark.read.jdbc(url, "readings", properties=DRIVER)
    assert back.count() == 50
    assert back.agg(F.sum("reading")).first()[0] == sum(range(50))

    # forced replay of batch 0 (crash-after-partial-commit shape):
    # running the same foreachBatch function again with the same
    # batch_id must leave the table unchanged
    batch0 = spark.createDataFrame(
        [(f"D{i % 3}", i) for i in range(50)],
        "device_id string, reading long")
    writer(batch0, 0)
    back2 = spark.read.jdbc(url, "readings", properties=DRIVER)
    assert back2.count() == 50
    assert back2.agg(F.sum("reading")).first()[0] == sum(range(50))
    assert back2.select(BATCH_COL).distinct().count() == 1


def test_second_batch_appends(spark, tmp_path):
    url = f"jdbc:derby:{tmp_path}/sinkdb2;create=true"
    writer = jdbc_batch_writer(url, "readings")
    b0 = spark.createDataFrame([("D0", 1)], "device_id string, reading long")
    b1 = spark.createDataFrame([("D1", 2)], "device_id string, reading long")
    writer(b0, 0)
    writer(b1, 1)
    back = spark.read.jdbc(url, "readings", properties=DRIVER)
    assert back.count() == 2
    assert back.select(BATCH_COL).distinct().count() == 2
    # replaying ONLY batch 1 leaves batch 0 untouched
    writer(b1, 1)
    assert spark.read.jdbc(url, "readings", properties=DRIVER).count() == 2
