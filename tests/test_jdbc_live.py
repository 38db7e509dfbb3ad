"""LIVE JDBC round-trip against embedded Derby (bundled with Spark):
the partitioned-read planner (sources/jdbc.read_table) driving a real
database, not just predicate-set algebra — write via spark.write.jdbc,
read back through range- and mod-striped predicates, verify exact
content and the planned parallelism."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dht11_data_pipeline_spark.sources.jdbc import read_table

DRIVER = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}


@pytest.fixture(scope="module")
def derby_url(tmp_path_factory):
    return f"jdbc:derby:{tmp_path_factory.mktemp('derby')}/db;create=true"


@pytest.fixture(scope="module")
def seeded(spark, derby_url):
    df = (spark.range(0, 1000).withColumnRenamed("id", "k")
          .withColumn("v", F.col("k") * 2))
    df.write.jdbc(derby_url, "t1", mode="overwrite", properties=DRIVER)
    return df


def test_single_stream_read(spark, derby_url, seeded):
    back = read_table(spark, derby_url, "t1", properties=DRIVER)
    assert back.count() == 1000
    assert back.agg(F.sum("v")).first()[0] == sum(2 * k for k in range(1000))


def test_range_partitioned_read(spark, derby_url, seeded):
    back = read_table(spark, derby_url, "t1", properties=DRIVER,
                      partition_col='"k"', bounds=(0, 999), num_partitions=4)
    # one JDBC stream per predicate, content exactly once
    assert back.rdd.getNumPartitions() == 4
    assert back.count() == 1000
    assert back.select("k").distinct().count() == 1000


def test_range_partitioned_stale_bounds(spark, derby_url, seeded):
    """Rows outside the sampled bounds land in the open end stripes."""
    back = read_table(spark, derby_url, "t1", properties=DRIVER,
                      partition_col='"k"', bounds=(400, 600), num_partitions=3)
    assert back.count() == 1000


def test_mod_striped_read(spark, derby_url, seeded):
    back = read_table(spark, derby_url, "t1", properties=DRIVER,
                      partition_col='"k"', mod_stripes=True, num_partitions=5)
    assert back.rdd.getNumPartitions() == 5
    assert back.count() == 1000
    assert back.agg(F.sum("k")).first()[0] == sum(range(1000))
