"""Layer moves: landing → intermediate → (SCD2 target).

Reference physical behaviors consciously replaced (SURVEY §4.2):
- landing delete+reload per device (S6+S5 row loop) → one atomic
  ``mode("overwrite")`` partition write
- row-at-a-time INSERT → set-oriented columnar parquet write
- INSERT..SELECT with load_key stamp (S10, STG_to_INT.py:16-20) →
  ``withColumn(lit(load_key))`` + append, partitioned BY load_key so
  every downstream ``WHERE load_key = k`` is partition pruning, not a
  scan (SURVEY §4.1 partition-pruning row).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_landing(df: DataFrame, warehouse_dir: str, device_id: str) -> str:
    """Delete+reload landing for one device, as one atomic overwrite of
    the device's partition directory."""
    path = os.path.join(warehouse_dir, "dht11_data", f"device_id={device_id}")
    df.drop("device_id").write.mode("overwrite").parquet(path)
    return path


def read_landing(spark: SparkSession, warehouse_dir: str) -> DataFrame:
    return spark.read.option("basePath", os.path.join(warehouse_dir, "dht11_data")) \
        .parquet(os.path.join(warehouse_dir, "dht11_data"))


def load_to_intermediate(spark: SparkSession, warehouse_dir: str,
                         load_key: int, device_id: str) -> str:
    """Landing→intermediate copy stamping the batch's load_key
    (reference S10). Append-only, partitioned by load_key."""
    landing = read_landing(spark, warehouse_dir).filter(
        F.col("device_id") == device_id)
    path = os.path.join(warehouse_dir, "dht11_data_int")
    (landing.withColumn("load_key", F.lit(load_key).cast("bigint"))
        .write.mode("append").partitionBy("load_key").parquet(path))
    return path


def read_intermediate(spark: SparkSession, warehouse_dir: str,
                      load_key: int | None = None) -> DataFrame:
    df = spark.read.parquet(os.path.join(warehouse_dir, "dht11_data_int"))
    if load_key is not None:
        df = df.filter(F.col("load_key") == load_key)  # partition pruning
    return df
