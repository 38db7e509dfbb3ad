"""Skew mitigation: salting for hot keys.

AQE's skew-join splitting (on in session.py) handles most skew at
runtime, but two cases still need explicit salting at 100 TB: (a) a
groupBy where one key holds a double-digit percent of all rows — AQE
can't split a single hash-aggregate key; (b) a shuffle join against a
side too big to broadcast where hot keys would pin single tasks.

Both helpers are deterministic given the salt count and preserve exact
results (salting only re-routes rows; the final combine undoes it).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt(n_salts: int) -> Column:
    # deterministic per-row salt: cheap hash of a monotonic id spreads
    # rows uniformly without an RNG (reproducible across retries of the
    # same partition layout; any uniform spread works — the combine
    # stage is salt-agnostic)
    return F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts))


def salted_aggregate(df: DataFrame, keys: list[str], aggs: dict[str, str],
                     n_salts: int = 16) -> DataFrame:
    """Two-phase aggregation for skewed grouping keys.

    Phase 1 groups by (keys + salt) — a hot key becomes ``n_salts``
    parallel partial groups; phase 2 combines the partials per key.
    Supported aggs (value: 'sum' | 'count' | 'min' | 'max') compose
    exactly across phases. Spark's own map-side partial aggregation
    does this per-partition already; salting extends it across the
    shuffle, which matters when one key's partials alone overwhelm a
    single reducer.
    """
    fns = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
    partial = df.withColumn("_salt", _salt(n_salts)).groupBy(*keys, "_salt").agg(
        *[fns[how](c).alias(f"_p_{c}_{how}") for c, how in aggs.items()])
    recombine = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    return partial.groupBy(*keys).agg(
        *[recombine[how](f"_p_{c}_{how}").alias(f"{c}_{how}")
          for c, how in aggs.items()])


def salted_join(big: DataFrame, small: DataFrame, on: list[str],
                n_salts: int = 8, how: str = "inner") -> DataFrame:
    """Skew-safe equi-join: salt the big side, replicate the small side
    once per salt value, join on (keys + salt).

    A hot key's rows spread over ``n_salts`` tasks instead of one; the
    small side grows n_salts-fold (only viable when it's modest — for a
    huge-huge skewed join, isolate the hot keys and union a broadcast
    join for just those). Results are exactly the plain join's.

    Only inner/left joins: the replicated small side would emit one
    unmatched copy per salt under right/full semantics.
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(f"salted_join supports inner/left joins, got {how!r}")
    salted_big = big.withColumn("_salt", _salt(n_salts))
    replicated = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)])))
    out = salted_big.join(replicated, [*on, "_salt"], how)
    return out.drop("_salt")
