"""End-to-end pipeline replay (reference E1: main.py) over B1/B2-style
tree JSON batches: control gates, landing/intermediate layers, SCD2."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from dht11_data_pipeline_spark.operators.control import ControlTable
from dht11_data_pipeline_spark.pipeline import bootstrap, read_history, run_batch

BATCH1 = {"MCU_Data": {"DEV01": {"HIST_DHT11_DATA": {
    "2024-05-05": {
        "11:30:35": {"TimeZone": "IST", "Humidity": "61", "Temperature": "29",
                     "Timestamp": "2024-05-05 11:30:35"},
        "11:35:35": {"TimeZone": "IST", "Humidity": "62", "Temperature": "29",
                     "Timestamp": "2024-05-05 11:35:35"},
    }}}}}

BATCH2 = {"MCU_Data": {"DEV01": {"HIST_DHT11_DATA": {
    "2024-05-05": {
        "11:30:35": {"TimeZone": "IST", "Humidity": "61", "Temperature": "29",
                     "Timestamp": "2024-05-05 11:30:35"},      # unchanged
        "11:35:35": {"TimeZone": "IST", "Humidity": "99", "Temperature": "29",
                     "Timestamp": "2024-05-05 11:35:35"},      # humidity changed
    },
    "2024-05-06": {
        "08:00:00": {"TimeZone": "IST", "Humidity": "70", "Temperature": "30",
                     "Timestamp": "2024-05-06 08:00:00"},      # new
    }}}}}


def test_full_two_batch_lifecycle(spark, tmp_path):
    wh = str(tmp_path / "wh")
    t1 = tmp_path / "b1.json"; t1.write_text(json.dumps(BATCH1))
    t2 = tmp_path / "b2.json"; t2.write_text(json.dumps(BATCH2))

    bootstrap(spark, wh)

    r1 = run_batch(spark, wh, str(t1), "DEV01",
                   load_ts="2024-05-05 12:00:00", since_ts="1970-01-01 00:00:00")
    assert r1 == {"load_key": 2, "rows": 2, "skipped": False, "hist_rows": 2}

    r2 = run_batch(spark, wh, str(t2), "DEV01",
                   load_ts="2024-05-06 12:00:00", since_ts="1970-01-01 00:00:00")
    assert r2["load_key"] == 3 and r2["rows"] == 3
    # 2 originals + 1 closed-out replacement + 1 new = 4
    assert r2["hist_rows"] == 4

    hist = read_history(spark, wh)
    current = hist.filter(F.col("da_current_flag") == "Y").collect()
    assert len(current) == 3
    changed = hist.filter(F.col("humidity") == "62").collect()
    assert len(changed) == 1 and changed[0].da_current_flag == "N"

    ctl = ControlTable(spark, wh)
    prev = ctl.previous_run("STG_1020")
    assert prev["load_status"] == "Success" and prev["load_key"] == 3


def test_prev_failure_gate(spark, tmp_path):
    """Abort when the previous run isn't 'Success' (main.py:15-20)."""
    wh = str(tmp_path / "wh")
    bootstrap(spark, wh)
    ctl = ControlTable(spark, wh)
    ctl.add_run_entry("DHT11_SENSOR_DATA_LOAD", "STG_1020", 2, "FAILED")
    t = tmp_path / "b.json"; t.write_text(json.dumps(BATCH1))
    with pytest.raises(RuntimeError, match="!= 'Success'"):
        run_batch(spark, wh, str(t), "DEV01")


def test_unregistered_interface_gate(spark, tmp_path):
    wh = str(tmp_path / "wh")
    t = tmp_path / "b.json"; t.write_text(json.dumps(BATCH1))
    with pytest.raises(RuntimeError, match="not registered"):
        run_batch(spark, wh, str(t), "DEV01")


def test_empty_batch_short_circuit(spark, tmp_path):
    """Empty increment → skip load tasks, still mark Success
    (reference T3, Airflow-DAG.py:114-119,563-576)."""
    wh = str(tmp_path / "wh")
    bootstrap(spark, wh)
    t = tmp_path / "b.json"; t.write_text(json.dumps(BATCH1))
    r = run_batch(spark, wh, str(t), "DEV01", since_ts="2030-01-01 00:00:00")
    assert r["skipped"] is True and r["rows"] == 0
    ctl = ControlTable(spark, wh)
    assert ctl.previous_run("STG_1020")["load_status"] == "Success"


def test_historize_logged_prunes_nc_buckets(spark, tmp_path):
    """Default historize path is the transaction-logged table: batch 2
    commits ONE new manifest version where only buckets holding changed
    keys point at the new commit dir; NC-only buckets keep their
    original immutable directories (reference MERGE parity at 100 TB
    write-amplification cost, plus crash atomicity + time travel)."""
    import os

    from dht11_data_pipeline_spark.operators import txlog
    from dht11_data_pipeline_spark.operators.scd2_partitioned import key_bucket
    from dht11_data_pipeline_spark.pipeline import HIST_CFG

    wh = str(tmp_path / "wh")
    t1 = tmp_path / "b1.json"; t1.write_text(json.dumps(BATCH1))
    t2 = tmp_path / "b2.json"; t2.write_text(json.dumps(BATCH2))
    bootstrap(spark, wh)
    run_batch(spark, wh, str(t1), "DEV01",
              load_ts="2024-05-05 12:00:00", since_ts="1970-01-01 00:00:00")

    hist_path = os.path.join(wh, "hist_dht11_data")
    assert txlog.current_version(hist_path) == 1
    before = txlog.read_manifest(hist_path)["buckets"]

    run_batch(spark, wh, str(t2), "DEV01",
              load_ts="2024-05-06 12:00:00", since_ts="1970-01-01 00:00:00")

    assert txlog.current_version(hist_path) == 2
    after = txlog.read_manifest(hist_path)["buckets"]

    # changed keys of batch 2: the U (11:35:35) and the I (2024-05-06)
    changed = spark.createDataFrame(
        [("DEV01", "2024-05-05 11:35:35"), ("DEV01", "2024-05-06 08:00:00")],
        "device_id string, ts string",
    ).select(F.col("device_id"), F.col("ts").cast("timestamp"))
    changed_buckets = {
        str(r["b"]) for r in changed.select(
            key_bucket(HIST_CFG, 64).alias("b")).collect()}

    moved = {b for b in after if after[b] != before.get(b)}
    assert moved == changed_buckets
    for b, path in before.items():
        if b not in changed_buckets:
            assert after[b] == path, f"NC-only bucket re-pointed: {b}"
    # batch-1 state remains time-travelable
    assert txlog.read_table(spark, hist_path, version=1).count() == 2

    hist = read_history(spark, wh)
    assert hist.filter(F.col("da_current_flag") == "Y").count() == 3
    assert hist.count() == 4
