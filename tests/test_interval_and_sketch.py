"""Banded interval join equivalence + HLL sketch accuracy."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from dht11_data_pipeline_spark.operators.interval_join import (
    interval_join_aggregate)
from dht11_data_pipeline_spark.plans import queries as Q


def test_interval_join_equals_theta_join(spark, sf_dir):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    banded = interval_join_aggregate(
        o.select("o_custkey", "o_orderkey", "o_orderdate"),
        o.select("o_custkey", "o_orderdate", "o_totalprice"),
        key="o_custkey", left_date="o_orderdate", right_date="o_orderdate",
        gap_days=90,
        aggs=[F.count(F.lit(1)).alias("n")], left_id="o_orderkey")
    a, b = o.alias("a"), o.alias("b")
    theta = (
        a.join(b, (F.col("a.o_custkey") == F.col("b.o_custkey"))
               & (F.col("b.o_orderdate").cast("date") > F.col("a.o_orderdate").cast("date"))
               & (F.col("b.o_orderdate").cast("date")
                  <= F.date_add(F.col("a.o_orderdate").cast("date"), 90)))
        .groupBy(F.col("a.o_orderkey").alias("o_orderkey"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert banded.exceptAll(theta).count() == 0
    assert theta.exceptAll(banded).count() == 0
    assert banded.count() > 0


def test_interval_join_bucket_boundary_rows(spark):
    """Rows exactly at the gap edge and across a bucket boundary."""
    d = dt.datetime
    rows = [(1, 10, d(2024, 1, 1)),     # left anchor
            (1, 11, d(2024, 1, 1)),     # same day -> excluded (strict >)
            (1, 12, d(2024, 3, 31)),    # day 90 -> included (<=)
            (1, 13, d(2024, 4, 1)),     # day 91 -> excluded
            (2, 20, d(2024, 2, 27)),    # different key
            (1, 14, d(2024, 1, 2))]     # day 1 -> included
    df = spark.createDataFrame(rows, "k long, oid long, ts timestamp")
    out = {r["oid"]: r["n"] for r in interval_join_aggregate(
        df.select("k", "oid", "ts"), df.select("k", "ts"),
        key="k", left_date="ts", right_date="ts", gap_days=90,
        aggs=[F.count(F.lit(1)).alias("n")], left_id="oid").collect()}
    assert out[10] == 2 and out[11] == 2   # days 1 and 90 follow both
    assert 13 not in out                   # nothing after day 91
    assert out[14] == 2                    # Mar 31 (+89) and Apr 1 (+90 exactly)


def test_hll_sketch_accuracy_and_determinism(spark, sf_dir):
    rows_a = Q.a_approx_distinct_sketch(spark, sf_dir).collect()
    rows_b = Q.a_approx_distinct_sketch(spark, sf_dir).collect()
    assert sorted(map(tuple, rows_a)) == sorted(map(tuple, rows_b))
    for r in rows_a:
        assert r["n_users_exact"] > 0
        assert r["hll_within_2pct"] is True, r["event_type"]
        assert r["approx_within_10pct"] is True, r["event_type"]


def test_quantile_sketch_within_rank_bound(spark, sf_dir):
    rows_a = Q.a_quantile_sketch(spark, sf_dir).collect()
    rows_b = Q.a_quantile_sketch(spark, sf_dir).collect()
    assert sorted(map(tuple, rows_a)) == sorted(map(tuple, rows_b))
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    for r in rows_a:
        # in-query rank-bound verdicts hold for every group
        for p in (50, 90, 99):
            assert r[f"p{p}_in_rank_bound"] is True, (r["event_type"], p)
        # exact percentiles agree with a driver-side recomputation
        vals = sorted(v["value"] for v in
                      ev.filter(F.col("event_type") == r["event_type"])
                      .select("value").collect())
        n = len(vals)
        for p in (50, 90, 99):
            rank = (n - 1) * p / 100
            lo, frac = int(rank), rank - int(rank)
            exact = vals[lo] + (vals[min(lo + 1, n - 1)] - vals[lo]) * frac
            assert abs(r[f"p{p}_exact"] - round(exact, 2)) <= 0.011, (
                r["event_type"], p, r[f"p{p}_exact"], exact)


def test_sketch_negative_key_refused(spark):
    """pmod and the oracles' plain % agree only at key >= 0 — a
    negative key must ERROR, not silently hash-mismatch (r5 ADVICE)."""
    import pytest

    from dht11_data_pipeline_spark.operators.sketches import (
        countmin_frequencies)
    df = spark.createDataFrame([(5,), (-3,)], "key long")
    with pytest.raises(Exception, match="non-negative"):
        countmin_frequencies(df, "key").collect()
    ok = spark.createDataFrame([(5,), (3,)], "key long")
    assert countmin_frequencies(ok, "key").count() > 0


def test_sketch_null_key_passes_through(spark):
    """NULL keys must NOT trip the negative-key guard (NULL >= 0 is
    NULL, not False): they propagate NULL hashes and drop out of the
    bucket counts, the pre-guard behavior (r6 ADVICE). The sketch over
    [5, NULL, 5] equals the sketch over [5, 5]."""
    from dht11_data_pipeline_spark.operators.sketches import (
        countmin_frequencies)

    with_null = spark.createDataFrame([(5,), (None,), (5,)], "key long")
    no_null = spark.createDataFrame([(5,), (5,)], "key long")
    got = sorted(map(tuple, countmin_frequencies(
        with_null, "key").collect()))
    want = sorted(map(tuple, countmin_frequencies(
        no_null, "key").collect()))
    assert got == want
