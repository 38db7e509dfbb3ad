"""applyInPandasWithState: state must carry across micro-batches —
the jump counter sees a temperature delta that straddles two batches."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from dht11_data_pipeline_spark.streaming.ingest import (
    read_reading_stream, typed_readings,
)
from dht11_data_pipeline_spark.streaming.stateful import track_device_state

B1 = [
    {"device_id": "D1", "Temperature": "20", "Humidity": "50",
     "Timestamp": "2024-05-05 10:00:00"},
    {"device_id": "D1", "Temperature": "21", "Humidity": "50",
     "Timestamp": "2024-05-05 10:05:00"},   # Δ1: no jump
    {"device_id": "D1", "Temperature": "30", "Humidity": "50",
     "Timestamp": "2024-05-05 10:10:00"},   # Δ9: jump 1
    {"device_id": "D2", "Temperature": "10", "Humidity": "50",
     "Timestamp": "2024-05-05 10:00:00"},
]

B2 = [
    # Δ vs last batch-1 temp (30) = 12 -> cross-batch jump
    {"device_id": "D1", "Temperature": "42", "Humidity": "50",
     "Timestamp": "2024-05-05 11:00:00"},
    {"device_id": "D2", "Temperature": "11", "Humidity": "50",
     "Timestamp": "2024-05-05 11:00:00"},   # Δ1: no jump
]


def _write(dirpath, name, rows):
    os.makedirs(dirpath, exist_ok=True)
    with open(os.path.join(dirpath, name), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_state_carries_across_batches(spark, tmp_path):
    src, ckpt = str(tmp_path / "feed"), str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "out")
    # one state store per shuffle partition: 32 stores x 2 batches is all
    # setup overhead at 2-device scale — shrink for the test
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    _write(src, "b1.json", B1)
    stream = track_device_state(
        typed_readings(read_reading_stream(spark, src), watermark=None))

    def drain(batch_tag):
        # parquet sink (memory sink can't resume from a checkpoint);
        # each drain appends that batch's emitted rows
        q = (stream.writeStream.format("parquet")
             .option("path", out_dir)
             .outputMode("append").option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        rows = spark.read.parquet(out_dir).collect()
        # latest emission per device = the row with max n_total
        out = {}
        for r in rows:
            if r["device_id"] not in out or r["n_total"] > out[r["device_id"]]["n_total"]:
                out[r["device_id"]] = r
        return out

    out1 = drain("b1")
    assert out1["D1"]["n_total"] == 3 and out1["D1"]["n_jumps"] == 1
    assert out1["D1"]["last_temp"] == 30.0
    assert out1["D2"]["n_jumps"] == 0

    _write(src, "b2.json", B2)
    try:
        out2 = drain("b2")
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    # batch 2 emits only its own rows, but counters include batch 1
    assert out2["D1"]["n_batch"] == 1
    assert out2["D1"]["n_total"] == 4          # state carried
    assert out2["D1"]["n_jumps"] == 2          # 30 -> 42 across batches
    assert out2["D2"]["n_total"] == 2 and out2["D2"]["n_jumps"] == 0
