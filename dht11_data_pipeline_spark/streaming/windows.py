"""Watermarked event-time window aggregations over the sensor stream.

The reference aggregates nothing over time (SURVEY §2.9 T5) — its only
temporal semantics are the daily batch boundary. These are the
Spark-native operators a sensor-analytics consumer of the same feed
needs: tumbling / sliding / session windows with late-data handling by
watermark instead of the reference's overlap-and-re-read.

All three are plain ``groupBy(window(...))`` aggregations: partial
(map-side) aggregation happens per input partition, the shuffle key is
(window, device), and state for open windows is dropped once the
watermark passes — bounded memory at any stream rate. Sensor readings
arrive as strings ('N/A' for missing — reference
STG_Firebase2Oracle.py:80-83), so metrics go through ``try_cast``:
unparsable values become NULL and fall out of avg/min/max natively.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _metric(col: str) -> F.Column:
    return F.col(col).try_cast("double")


def _stats_aggs() -> list[F.Column]:
    return [
        F.count(F.lit(1)).alias("n_readings"),
        F.avg(_metric("temperature")).alias("avg_temp"),
        F.min(_metric("temperature")).alias("min_temp"),
        F.max(_metric("temperature")).alias("max_temp"),
        F.avg(_metric("humidity")).alias("avg_humidity"),
    ]


def tumbling_stats(readings: DataFrame, size: str = "10 minutes") -> DataFrame:
    """Per-device tumbling-window sensor stats."""
    return (
        readings.groupBy(F.window("ts", size).alias("w"), "device_id")
        .agg(*_stats_aggs())
        .select("device_id", F.col("w.start").alias("window_start"),
                F.col("w.end").alias("window_end"),
                "n_readings", "avg_temp", "min_temp", "max_temp", "avg_humidity")
    )


def sliding_stats(readings: DataFrame, size: str = "10 minutes",
                  slide: str = "5 minutes") -> DataFrame:
    """Overlapping sliding windows — each event lands in size/slide
    windows; Spark expands them at the map side, so the cost is the
    overlap factor, not a second shuffle."""
    return (
        readings.groupBy(F.window("ts", size, slide).alias("w"), "device_id")
        .agg(*_stats_aggs())
        .select("device_id", F.col("w.start").alias("window_start"),
                F.col("w.end").alias("window_end"),
                "n_readings", "avg_temp", "min_temp", "max_temp", "avg_humidity")
    )


def enrich_with_alerts(readings: DataFrame, alerts: DataFrame,
                       tolerance: str = "10 minutes") -> DataFrame:
    """Stream-stream inner join: pair each reading with alerts for the
    same device raised within ``tolerance`` BEFORE the reading — the
    interval-join shape (matching a measurement to its active alert).

    Both inputs must carry watermarks; the time-range condition lets
    Spark bound the join state on both sides (a reading older than
    alert_ts + tolerance can never match future alerts, so its state is
    evicted). One shuffle per side on device_id.
    """
    a = alerts.select(
        F.col("device_id").alias("alert_device"),
        F.col("ts").alias("alert_ts"),
        "alert_kind",
    )
    cond = (
        (F.col("device_id") == F.col("alert_device"))
        & (F.col("ts") >= F.col("alert_ts"))
        & (F.col("ts") <= F.col("alert_ts") + F.expr(f"INTERVAL {tolerance}"))
    )
    return readings.join(a, cond, "inner").select(
        "device_id", "ts", "temperature", "alert_ts", "alert_kind")


def session_stats(readings: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Gap-based session windows per device (``session_window`` —
    dynamic, closes when no reading arrives for ``gap``). The batch twin
    of plans/ext_queries.t_sessionize; in streaming mode state merges
    adjacent sessions as late rows arrive, within the watermark."""
    return (
        readings.groupBy(F.session_window("ts", gap).alias("w"), "device_id")
        .agg(F.count(F.lit(1)).alias("n_readings"))
        .select("device_id", F.col("w.start").alias("session_start"),
                F.col("w.end").alias("session_end"), "n_readings")
    )
