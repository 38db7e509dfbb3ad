"""S7/S8/S9 table-lifecycle helpers."""

from __future__ import annotations

import os

from dht11_data_pipeline_spark.operators.ddl import (
    drop_table_if_exists, materialize, truncate_table)


def test_truncate_preserves_schema_and_empties(spark, tmp_path):
    p = str(tmp_path / "t")
    df = spark.createDataFrame([(1, "a")], "k long, v string")
    df.write.parquet(p)
    truncate_table(spark, p)
    back = spark.read.parquet(p)
    assert back.count() == 0
    assert back.schema == df.schema
    # truncating a missing table is a silent no-op (reference parity)
    truncate_table(spark, str(tmp_path / "missing"))


def test_drop_if_exists_idempotent(spark, tmp_path):
    p = str(tmp_path / "d")
    spark.createDataFrame([(1,)], "k long").write.parquet(p)
    assert drop_table_if_exists(spark, p) is True
    assert not os.path.exists(p)
    assert drop_table_if_exists(spark, p) is False  # second drop: no error


def test_materialize_spill_roundtrip_and_lineage_cut(spark, tmp_path):
    df = spark.range(100).selectExpr("id", "id * 2 AS dbl")
    out = materialize(df, path=str(tmp_path / "m"), spill=True)
    assert out.count() == 100
    assert sorted(out.columns) == ["dbl", "id"]
    # spilled frame reads from storage: no Exchange/compute ancestry
    assert "Scan parquet" in out._jdf.queryExecution().executedPlan().toString()
    cached = materialize(df)
    assert cached.storageLevel.useMemory
    cached.unpersist()
