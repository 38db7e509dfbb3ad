"""Streaming importance-sampling gate: ``operators/curation.
weighted_keep`` as a continuous filter over an arriving corpus.

The batch gate keeps a row iff ``bucket(id) × w_max < rate_ppm × w``
with ``w_max`` the corpus maximum. A stream cannot know the maximum of
an unbounded corpus, so the stream form takes ``w_max`` as the SCORER'S
DECLARED CEILING (every weight model has one — a max document length, a
max quality score) and the gate becomes completely STATELESS: pure
per-row integer hash arithmetic, no aggregation, no state store, no
watermark. That is the whole point of the hash-gate design — the
decision for a row depends only on (id, weight, w_max, rate), so batch
replays, stream restarts and out-of-order delivery all keep the
identical subset.

Drift-proofing: both forms project through the SAME
``weighted_gate_projection`` (operators/curation.py) — the stream only
swaps the corpus-max column for the declared-ceiling literal. Fed the
true corpus max as the ceiling, stream output == batch output row for
row (pinned in tests/test_streaming_curation.py).

The batch operator's enforced preconditions carry over and gain one:
weights must be non-negative integers AND must not exceed the declared
ceiling (a weight above ``w_max`` would silently keep with clamped
probability — loud failure instead, same rationale as the batch
NULL/negative guards).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from dht11_data_pipeline_spark.operators.curation import (
    _hash_bucket, weighted_gate_projection)

WEIGHTED_DOC_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("weight", T.LongType()),
])


def weighted_keep_stream(df: DataFrame, w_max: int,
                         rate_ppm: int = 500_000,
                         id_col: str = "doc_id",
                         weight_col: str = "weight",
                         salt: str = "wkeep1") -> DataFrame:
    """Apply the weighted_keep gate with a declared weight ceiling.

    Works identically on a streaming or a batch frame (it is a pure
    projection) — the parity test runs it both ways. Returns the batch
    operator's exact schema: (id, weight, bucket, keep_ppm, keep_flag).
    """
    if w_max <= 0:
        raise ValueError("weighted_keep_stream: declared ceiling w_max "
                         "must be a positive integer")
    w = F.col(weight_col)
    w_checked = (
        F.when(w.isNull() | (w.cast("bigint") < 0)
               | (w.cast("bigint") > F.lit(int(w_max))),
               F.raise_error(F.format_string(
                   "weighted_keep_stream: weight must be an integer in "
                   f"[0, {int(w_max)}], got %s for id %s",
                   w.cast("string"), F.col(id_col).cast("string")))
               .cast("bigint"))
        .otherwise(w.cast("bigint")))
    staged = df.select(
        F.col(id_col),
        w_checked.alias("weight"),
        _hash_bucket(F.col(id_col), salt, 1_000_000)
        .cast("bigint").alias("bucket"),
        F.lit(int(w_max)).cast("bigint").alias("_w_max"))
    return weighted_gate_projection(staged, id_col, rate_ppm)


def cluster_balanced_stream(df: DataFrame,
                            centroids: list[tuple[int, list[float]]],
                            quotas: dict[int, int],
                            id_col: str = "vec_id",
                            vec_col: str = "embedding",
                            salt: str = "cbal1",
                            quant: int = 1000) -> DataFrame:
    """Streaming form of ``operators/curation.cluster_balanced_sample``:
    the same integer-exact nearest-prototype assignment and the same
    ``bucket < keep_ppm`` gate, with the per-cluster quotas passed IN
    (a stream cannot know corpus-wide cluster sizes; a deployment
    refreshes the quota map from a periodic batch pass — the same
    declared-parameter move as ``weighted_keep_stream``'s w_max).

    Stateless per row given (centroids, quotas): works identically on
    a streaming or batch frame. A vector assigned to a cluster absent
    from the quota map raises (quota maps must cover the prototype
    set) — silent drops would skew the mix unnoticed.

    Returns (id, cluster_id, keep_ppm, keep_flag).
    """
    from dht11_data_pipeline_spark.operators.kmeans import (
        assign_clusters_exact)

    if not quotas:
        raise ValueError("cluster_balanced_stream: need a non-empty "
                         "quota map")
    assigned = assign_clusters_exact(df, centroids, id_col, vec_col,
                                     quant)
    quota_expr = F.map_from_arrays(
        F.array(*[F.lit(int(c)) for c in sorted(quotas)]),
        F.array(*[F.lit(int(quotas[c])).cast("bigint")
                  for c in sorted(quotas)]))
    keep_ppm = F.element_at(quota_expr, F.col("cluster_id"))
    checked = (F.when(keep_ppm.isNull(),
                      F.raise_error(F.format_string(
                          "cluster_balanced_stream: cluster %s has no "
                          "quota", F.col("cluster_id").cast("string")))
                      .cast("bigint"))
               .otherwise(keep_ppm))
    bucket = _hash_bucket(F.col(id_col), salt, 1_000_000)
    return assigned.select(
        id_col, "cluster_id",
        checked.alias("keep_ppm"),
        F.when(bucket < checked, "Y").otherwise("N").alias("keep_flag"))


def start_weighted_keep_stream(spark: SparkSession, source_path: str,
                               out_dir: str, checkpoint_dir: str,
                               w_max: int, rate_ppm: int = 500_000,
                               max_files_per_trigger: int | None = 1,
                               available_now: bool = True
                               ) -> StreamingQuery:
    """readStream JSON-lines (doc_id, weight) → gated parquet rows at
    ``out_dir``. Append-only stateless pipeline: exactly-once via the
    file-sink manifest, no state store to size or upgrade."""
    reader = spark.readStream.schema(WEIGHTED_DOC_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    gated = weighted_keep_stream(reader.json(source_path), w_max,
                                 rate_ppm=rate_ppm)
    writer = (gated.writeStream.format("parquet")
              .option("path", out_dir)
              .option("checkpointLocation", checkpoint_dir)
              .outputMode("append"))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
