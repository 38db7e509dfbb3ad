"""Plan-level proof of the bucketing scale story: co-bucketed joins and
bucket-key aggregations run with no Exchange (no shuffle), and results
match the unbucketed equivalents.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dht11_data_pipeline_spark.operators.bucketing import (
    cobucketed_join, write_bucketed,
)

pytestmark = pytest.mark.usefixtures("bucket_warehouse")


@pytest.fixture(scope="module")
def bucket_warehouse(spark, sf_dir, tmp_path_factory):
    spark.sql("CREATE DATABASE IF NOT EXISTS buckets")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    write_bucketed(o.withColumnRenamed("o_orderkey", "okey"),
                   "buckets.orders_b", ["okey"], n_buckets=8)
    write_bucketed(li.withColumnRenamed("l_orderkey", "okey"),
                   "buckets.lineitem_b", ["okey"], n_buckets=8)
    yield
    spark.sql("DROP TABLE IF EXISTS buckets.orders_b")
    spark.sql("DROP TABLE IF EXISTS buckets.lineitem_b")
    spark.sql("DROP DATABASE IF EXISTS buckets")


def _physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_cobucketed_join_has_no_shuffle(spark):
    # disable auto-broadcast: at test scale the dim fits in a broadcast
    # (which also bypasses bucketing); the bucketed-SMJ plan is the one
    # that matters at 100 TB where neither side broadcasts
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = cobucketed_join(spark, "buckets.lineitem_b", "buckets.orders_b",
                            ["okey"])
        plan = _physical_plan(j)
        assert "Exchange hashpartitioning" not in plan, plan
        assert "SortMergeJoin" in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
                       str(64 * 1024 * 1024))


def test_unbucketed_join_does_shuffle(spark, sf_dir):
    # control: same join over plain parquet needs exchanges (broadcast
    # disabled to force the comparison the bucketing avoids)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        o = spark.read.parquet(f"{sf_dir}/orders.parquet")
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        j = li.join(o, li.l_orderkey == o.o_orderkey)
        assert "Exchange" in _physical_plan(j)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
                       str(64 * 1024 * 1024))


def test_bucket_key_aggregation_has_no_shuffle(spark):
    agg = (spark.table("buckets.lineitem_b")
           .groupBy("okey").agg(F.sum("l_quantity").alias("q")))
    assert "Exchange" not in _physical_plan(agg)


def test_cobucketed_join_matches_unbucketed(spark, sf_dir):
    j = cobucketed_join(spark, "buckets.lineitem_b", "buckets.orders_b",
                        ["okey"]).groupBy().agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("l_quantity").alias("q")).first()
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    plain = li.join(o, li.l_orderkey == o.o_orderkey).groupBy().agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("l_quantity").alias("q")).first()
    assert j["n"] == plain["n"] and j["q"] == plain["q"]
