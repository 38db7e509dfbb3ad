"""Partition-selective SCD2 apply: O(changed partitions) per batch
instead of O(target).

The base ``apply_scd2`` returns the complete new target state — simple
and atomic, but writing it back rewrites the WHOLE target every batch.
At 100 TB with a 0.1% daily delta that's a 1000x write amplification.

Fix, with plain parquet (no Delta required): store the target
partitioned by a hash bucket of the natural key
(``pmod(xxhash64(keys), n_buckets)``). A batch's changed keys touch a
subset of buckets; rows in other buckets cannot change (same key ⇒
same bucket). So the apply:

1. computes the incoming batch's bucket set (driver-side list of ints,
   O(n_buckets) small),
2. reads ONLY those partitions of the target (partition pruning),
3. runs the normal SCD2 merge on that slice,
4. writes back with dynamic partition overwrite — untouched buckets'
   files are never rewritten.

Atomicity is per-partition (the dynamic overwrite commits each bucket
directory); a retry of the same batch is idempotent because re-applying
yields NC for every key (the reference's content-hash idempotency,
SURVEY §2.9 T2). Delta Lake MERGE gives the same selective-write via
file-level pruning; this is the engine's parquet-native equivalent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dht11_data_pipeline_spark.operators.scd2 import SCD2Config, apply_scd2

BUCKET_COL = "da_key_bucket"


def key_bucket(cfg: SCD2Config, n_buckets: int) -> F.Column:
    cols = [F.col(k).cast("string") for k in cfg.natural_keys]
    return F.pmod(F.xxhash64(*cols), F.lit(n_buckets)).cast("int")


def init_partitioned_target(target: DataFrame, path: str, cfg: SCD2Config,
                            n_buckets: int = 64) -> None:
    """Materialize (or re-shard) a target as a bucket-partitioned layout."""
    (target.withColumn(BUCKET_COL, key_bucket(cfg, n_buckets))
     .write.mode("overwrite").partitionBy(BUCKET_COL).parquet(path))


def apply_scd2_partitioned(spark: SparkSession, staging: DataFrame,
                           target_path: str, cfg: SCD2Config,
                           n_buckets: int = 64,
                           load_ts: str | None = None,
                           deterministic_keys: bool = False,
                           incremental: bool = True) -> list[int]:
    """SCD2 apply touching only the buckets present in ``staging``.
    Returns the list of bucket ids rewritten."""
    stg = staging.withColumn(BUCKET_COL, key_bucket(cfg, n_buckets))
    buckets = sorted(
        r[BUCKET_COL] for r in stg.select(BUCKET_COL).distinct().collect())
    if not buckets:
        return []

    full_target = spark.read.parquet(target_path)
    # GLOBAL high-water marks: slice-local maxima would collide with
    # surrogate keys living in unread buckets. Parquet column stats make
    # this a metadata-mostly scan.
    hw = full_target.agg(
        F.coalesce(F.max(F.col(cfg.ak_col)), F.lit(0)),
        F.coalesce(F.max(F.col(cfg.key_col)), F.lit(0)),
    ).first()
    target_slice = (
        full_target
        .filter(F.col(BUCKET_COL).isin(buckets))  # partition pruning
        .drop(BUCKET_COL)
    )
    new_slice = apply_scd2(stg.drop(BUCKET_COL), target_slice, cfg,
                           load_ts=load_ts,
                           deterministic_keys=deterministic_keys,
                           incremental=incremental,
                           high_water=(int(hw[0]), int(hw[1])))

    prev_mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (new_slice.withColumn(BUCKET_COL, key_bucket(cfg, n_buckets))
         .write.mode("overwrite").partitionBy(BUCKET_COL).parquet(target_path))
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev_mode)
    return buckets


def read_partitioned_target(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path).drop(BUCKET_COL)
