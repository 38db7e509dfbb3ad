"""Streaming data-quality monitoring: per-micro-batch constraint
checks appended to an audit table — the streaming twin of the batch
quality audit (plans/queries.meta_quality_audit) and the engine-side
generalization of the reference's run-ledger status rows
(CheckInterface_Metadata.py:68-121: every batch leaves an auditable
control record).

Each micro-batch is scored in one multi-aggregate pass (no extra scan
— the checks ride the batch DataFrame already in memory) and ONE audit
row per check is appended, keyed by batch_id. Alerts are a filter over
the audit table: ``violations > 0``. At scale the audit table is tiny
(checks × batches rows), and because ``foreachBatch`` replays carry
the same batch_id, replayed batches overwrite-by-key rather than
double-count (idempotent, like the SCD2 sink).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from dht11_data_pipeline_spark.sources.firebase_tree import EPOCH_SENTINEL

# a check: name -> boolean Column that is TRUE when the row VIOLATES it
CheckSet = dict[str, Column]


def default_reading_checks() -> CheckSet:
    """Violation predicates for the typed sensor-reading stream."""
    return {
        "humidity_numeric": F.col("humidity").try_cast("double").isNull()
                            & (F.col("humidity") != "N/A"),
        "temperature_numeric": F.col("temperature").try_cast("double").isNull()
                               & (F.col("temperature") != "N/A"),
        "device_id_present": F.col("device_id").isNull(),
        "ts_not_epoch_sentinel": F.col("ts") == F.lit(EPOCH_SENTINEL).cast("timestamp"),
    }


def audit_batch(batch_df: DataFrame, batch_id: int,
                checks: CheckSet) -> DataFrame:
    """One audit row per check for this batch: (batch_id, check_name,
    violations, rows_scanned, pass). Single multi-aggregate pass."""
    aggs = [F.count(F.lit(1)).alias("_n")]
    for name, pred in checks.items():
        aggs.append(F.sum(F.when(pred, 1).otherwise(0)).alias(f"_v_{name}"))
    agg = batch_df.agg(*aggs)
    stack_args = ", ".join(
        f"'{name}', _v_{name}" for name in checks)
    return agg.select(F.expr(
        f"stack({len(checks)}, {stack_args}) AS (check_name, violations)"
    ), F.col("_n").alias("rows_scanned")).select(
        F.lit(batch_id).cast("long").alias("batch_id"),
        "check_name",
        F.coalesce(F.col("violations"), F.lit(0)).cast("long").alias("violations"),
        F.col("rows_scanned").cast("long"),
        F.when(F.coalesce(F.col("violations"), F.lit(0)) == 0, "Y")
         .otherwise("N").alias("pass"),
    )


def audit_writer(audit_dir: str, checks: CheckSet,
                 also: Callable[[DataFrame, int], None] | None = None,
                 ) -> Callable[[DataFrame, int], None]:
    """foreachBatch function: appends this batch's audit rows
    (partitioned by batch_id so a replayed batch overwrites its own
    partition — idempotent), then hands the batch to ``also`` (the
    real sink) if given."""
    def _write(batch_df: DataFrame, batch_id: int) -> None:
        rows = audit_batch(batch_df, batch_id, checks)
        (rows.coalesce(1).write.mode("overwrite")
         .partitionBy("batch_id")
         .option("partitionOverwriteMode", "dynamic")
         .parquet(audit_dir))
        if also is not None:
            also(batch_df, batch_id)
    return _write


def read_audit(spark: SparkSession, audit_dir: str) -> DataFrame:
    return spark.read.parquet(audit_dir)


def alerts(spark: SparkSession, audit_dir: str) -> DataFrame:
    """Batches/checks currently in violation."""
    return read_audit(spark, audit_dir).filter(F.col("violations") > 0)
