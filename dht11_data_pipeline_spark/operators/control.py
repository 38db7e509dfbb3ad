"""Control-plane run ledger — reference parity for the
``data_control_table`` / ``interface_config`` / ``HIST_LOAD_CONTROL``
machinery (CheckInterface_Metadata.py, STG_to_INT.py:23-29).

Semantics preserved:
- interface existence gate: registered in both the control table and
  the interface config (INNER JOIN on cd+name, CheckInterface_Metadata.py:17-20)
- previous-run lookup: row with MAX(load_key) for the interface
  (:21-25); callers gate on LOAD_STATUS == 'Success' (main.py:15-20)
- monotonic load keys: previous + 1 (main.py:47, Airflow-DAG.py:130)
- status progression written as the batch advances (main.py:47-68)

Storage is a parquet directory per table (append-mode single-row
writes). The ledger is O(runs) rows — driver-side `.first()` lookups
are correct at any data scale because the ledger never grows with the
data, only with the number of batches.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, Row, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CONTROL_SCHEMA = T.StructType([
    T.StructField("interface_name", T.StringType()),
    T.StructField("interface_cd", T.StringType()),
    T.StructField("load_status", T.StringType()),
    T.StructField("load_start_dt_tm", T.TimestampType()),
    T.StructField("load_complete_dt_tm", T.TimestampType()),
    T.StructField("load_key", T.LongType()),
])

CONFIG_SCHEMA = T.StructType([
    T.StructField("interface_cd", T.StringType()),
    T.StructField("interface_name", T.StringType()),
])


class ControlTable:
    """Run ledger over a warehouse directory."""

    def __init__(self, spark: SparkSession, warehouse_dir: str):
        self.spark = spark
        self.dir = warehouse_dir
        self.control_path = os.path.join(warehouse_dir, "data_control_table")
        self.config_path = os.path.join(warehouse_dir, "interface_config")

    # -- reads ---------------------------------------------------------

    def _read(self, path: str, schema: T.StructType) -> DataFrame:
        if not os.path.exists(path):
            return self.spark.createDataFrame([], schema)
        return self.spark.read.parquet(path)

    def control(self) -> DataFrame:
        return self._read(self.control_path, CONTROL_SCHEMA)

    def config(self) -> DataFrame:
        return self._read(self.config_path, CONFIG_SCHEMA)

    def interface_exists(self, interface_nm: str, interface_cd: str) -> bool:
        """Existence gate (reference J1: control ⋈ config on cd+name)."""
        dct = self.control().filter(
            (F.col("interface_cd") == interface_cd)
            & (F.col("interface_name") == interface_nm)
        )
        cfg = self.config().filter(
            (F.col("interface_cd") == interface_cd)
            & (F.col("interface_name") == interface_nm)
        )
        return (
            dct.join(cfg, ["interface_cd", "interface_name"], "inner").limit(1).count() > 0
        )

    def previous_run(self, interface_cd: str) -> Row | None:
        """Latest run row = argmax(load_key) for this interface
        (reference A1's IN (SELECT MAX(...)) subquery, re-expressed as
        orderBy-desc-limit-1 — one pass, no self-join)."""
        return (
            self.control()
            .filter(F.col("interface_cd") == interface_cd)
            .orderBy(F.col("load_key").desc())
            .limit(1)
            .first()
        )

    def next_load_key(self, interface_cd: str) -> int:
        prev = self.previous_run(interface_cd)
        return (int(prev["load_key"]) if prev else 0) + 1

    # -- writes --------------------------------------------------------

    def register_interface(self, interface_cd: str, interface_nm: str) -> None:
        df = self.spark.createDataFrame(
            [(interface_cd, interface_nm)], CONFIG_SCHEMA)
        df.write.mode("append").parquet(self.config_path)

    def add_run_entry(self, interface_nm: str, interface_cd: str,
                      load_key: int, status: str) -> None:
        """Insert new run row (reference add_current_run_entry,
        CheckInterface_Metadata.py:68-100)."""
        df = self.spark.sql(
            "SELECT CAST(%s AS STRING) interface_name, CAST(%s AS STRING) interface_cd,"
            " CAST(%s AS STRING) load_status, current_timestamp() load_start_dt_tm,"
            " CAST(NULL AS TIMESTAMP) load_complete_dt_tm, CAST(%d AS BIGINT) load_key"
            % (repr(interface_nm), repr(interface_cd), repr(status), load_key)
        )
        df.write.mode("append").parquet(self.control_path)

    def update_run_status(self, interface_cd: str, load_key: int,
                          status: str, complete: bool = False) -> None:
        """Status update (reference update_current_run_entry,
        CheckInterface_Metadata.py:102-121). Parquet is immutable, so
        the update is a read-modify-overwrite of the O(runs) ledger —
        cheap because the ledger is tiny, atomic via staged rewrite."""
        df = self.control()
        upd = df.withColumn(
            "load_status",
            F.when((F.col("interface_cd") == interface_cd)
                   & (F.col("load_key") == load_key), F.lit(status))
            .otherwise(F.col("load_status")),
        ).withColumn(
            "load_complete_dt_tm",
            F.when((F.col("interface_cd") == interface_cd)
                   & (F.col("load_key") == load_key) & F.lit(complete),
                   F.current_timestamp())
            .otherwise(F.col("load_complete_dt_tm")),
        )
        rows = upd.collect()  # ledger is O(runs) — driver-safe
        self.spark.createDataFrame(rows, CONTROL_SCHEMA).write.mode(
            "overwrite").parquet(self.control_path)

    # -- gates ---------------------------------------------------------

    def assert_previous_success(self, interface_cd: str) -> tuple[str, int]:
        """Abort-if-previous-run-not-Success gate (main.py:15-20).
        Returns (prev_start_ts_str, prev_load_key)."""
        prev = self.previous_run(interface_cd)
        if prev is None:
            raise RuntimeError(f"no previous run for interface {interface_cd}")
        if prev["load_status"] != "Success":
            raise RuntimeError(
                f"previous run (load_key={prev['load_key']}) status "
                f"{prev['load_status']!r} != 'Success' — aborting"
            )
        ts = prev["load_start_dt_tm"]
        return ts.strftime("%Y-%m-%d %H:%M:%S"), int(prev["load_key"])
