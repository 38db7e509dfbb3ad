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


def test_dedup_batch_pipeline_e2e(spark, tmp_path, sf_dir, monkeypatch):
    """The deployed incremental-dedup path (pipeline.run_dedup_batch):
    ledger discipline + durable store + the cost contract — batch N+1
    sketches only its own batch, so the probe plan's sketch stages do
    NOT grow with store size (store-size-independence asserted on the
    physical plan, per the round-10 verdict)."""
    import os

    from dht11_data_pipeline_spark.operators import dedup, sigstore
    from dht11_data_pipeline_spark.pipeline import run_dedup_batch
    from dht11_data_pipeline_spark.plans.audit import (
        normalize_plan, physical_plan)

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    wh = str(tmp_path / "wh")

    got_pairs = set()
    seen = docs.limit(0)
    for b in range(4):
        batch = docs.filter(F.col("doc_id") % 4 == b)
        seen = seen.unionByName(batch)
        res = run_dedup_batch(spark, wh, corpus=seen, new_docs=batch,
                              batch_key=f"b{b}")
        assert res["load_key"] == b + 1
        assert res["store_version"] == b + 2  # init committed v1
        got_pairs |= {(r["doc_a"], r["doc_b"])
                      for r in res["pairs_df"].collect()}

    # pair-completeness: union over batches == the one-shot run
    want = {(r["doc_a"], r["doc_b"]) for r in
            dedup.minhash_near_duplicates(docs, threshold=0.5).collect()}
    assert got_pairs == want and want

    # ledger: every run ended Success with monotonic load keys
    ctl = ControlTable(spark, wh)
    runs = (ctl.control().filter(F.col("interface_cd") == "STG_1030")
            .orderBy("load_key").collect())
    assert [r["load_key"] for r in runs] == [1, 2, 3, 4]
    assert all(r["load_status"] == "Success" for r in runs)

    # cost contract BY PLAN: probe the store's time-travel snapshots
    # (v2 = one committed batch, v4 = three) with the checkpoints
    # disabled so the FULL lazy plan — including the sha2 sketch
    # stages the eager localCheckpoints normally hide — is visible.
    # Sketch work (sha2) must not grow with store size: it appears
    # only over the new batch and the candidate point-lookups, never
    # as a full-store re-sketch.
    # patch the CONCRETE DataFrame class (Spark 4: pyspark.sql.classic
    # subclasses the pyspark.sql.DataFrame ABC and overrides the method)
    monkeypatch.setattr(type(docs), "localCheckpoint",
                        lambda self, eager=True: self)
    store_dir = os.path.join(wh, "dedup_sig_store")

    def probe_plan(version: int, b: int) -> str:
        store_sigs = sigstore.read_signature_store(spark, store_dir,
                                                   version=version)
        batch = docs.filter(F.col("doc_id") % 4 == b)
        return normalize_plan(physical_plan(
            dedup.minhash_incremental_pairs(docs, store_sigs, batch)))

    p_small, p_large = probe_plan(2, 1), probe_plan(4, 3)
    assert p_small.count("sha2") == p_large.count("sha2") > 0
    for metric in ("Exchange hash", "Scan parquet", "MapInPandas"):
        assert p_small.count(metric) == p_large.count(metric), metric
    assert p_small.count("MapInPandas") == 0
    monkeypatch.undo()

    # gate: a non-Success previous run aborts the next batch
    ctl.update_run_status("STG_1030", 4, "DEDUP PROBE")
    with pytest.raises(RuntimeError, match="aborting"):
        run_dedup_batch(spark, wh, corpus=seen,
                        new_docs=docs.filter(F.col("doc_id") % 4 == 0),
                        batch_key="b9")
