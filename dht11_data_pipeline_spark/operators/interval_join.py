"""Bucketed (banded) interval join — the scale-safe plan for
"right.ts within (left.ts, left.ts + gap]" joins.

A naive range join is an equi-join on the entity key plus a theta
range condition; when one key has many rows the per-key cross product
dominates, and with no equi-time component the optimizer can only
nested-loop within key groups. The banded form makes time part of the
equi key: quantize the axis into buckets at least as wide as the gap,
probe each left row into its own bucket and the next one (a window of
width ≤ bucket always overlaps ≤ 2 consecutive buckets), equi-join on
(key, bucket), and re-apply the exact range predicate. The join
becomes a hash/sort-merge join on a compound key whose fan-out per
bucket is bounded by the time density, not the key cardinality.

Same doubling trick Flink uses for interval joins and the standard
ad-hoc pattern in Spark SQL (a "band join"). At 100 TB: shuffle keys
are (entity, epoch-bucket) — hot entities spread across time buckets,
so the skew ceiling is rows-per-entity-per-gap-window, and AQE skew
split handles the rest.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_ANCHOR = "1990-01-01"  # any fixed date before the data; only bucket
                        # alignment depends on it, never results


def _bucket(ts_date: Column, width_days: int) -> Column:
    return F.floor(F.datediff(ts_date, F.lit(_ANCHOR)) / width_days)


def interval_join_aggregate(left: DataFrame, right: DataFrame, key: str,
                            left_date: str, right_date: str,
                            gap_days: int, aggs: list[Column],
                            left_id: str) -> DataFrame:
    """For each left row, aggregate right rows of the same ``key`` with
    ``right_date`` in (left_date, left_date + gap_days]. Emits one row
    per left id that has at least one match.

    Bucket width = gap_days, so each left row probes exactly 2 buckets
    (an explode of 2, constant fan-out) and the join is pure equi on
    (key, bucket).
    """
    ld, rd = F.col(left_date).cast("date"), F.col(right_date).cast("date")
    lb = _bucket(ld, gap_days)
    l = left.select(
        F.col(key), F.col(left_id), ld.alias("_l_date"),
        F.explode(F.array(lb, lb + 1)).alias("_bucket"))
    r = right.select(
        F.col(key).alias("_r_key"), rd.alias("_r_date"),
        _bucket(rd, gap_days).alias("_bucket"),
        *[F.col(c) for c in right.columns if c not in (key, right_date)])
    joined = l.join(
        r,
        (l[key] == r["_r_key"]) & (l["_bucket"] == r["_bucket"])
        & (F.col("_r_date") > F.col("_l_date"))
        & (F.col("_r_date") <= F.date_add(F.col("_l_date"), gap_days)),
    )
    return joined.groupBy(left_id).agg(*aggs)
