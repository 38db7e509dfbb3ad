"""JDBC partitioned-read planning (S3): the generated predicate sets
must partition the key domain exactly — every row in exactly one
stripe, even with stale sampled bounds. Verified by applying the
predicates as filters to a real relation (parquet stand-in for the
remote table; the SQL text is engine-agnostic)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dht11_data_pipeline_spark.sources.jdbc import (
    mod_partition_predicates, range_partition_predicates)
from dht11_data_pipeline_spark.sources.tables import load_table


def _assert_exact_partition(df, preds):
    total = df.count()
    covered = sum(df.filter(F.expr(p)).count() for p in preds)
    assert covered == total, (covered, total, preds)


@pytest.mark.parametrize("n", [1, 3, 8])
def test_range_predicates_partition_exactly(spark, sf_dir, n):
    o = load_table(spark, sf_dir, "orders")
    lo, hi = o.agg(F.min("o_orderkey"), F.max("o_orderkey")).first()
    _assert_exact_partition(o, range_partition_predicates("o_orderkey", lo, hi, n))


def test_range_predicates_survive_stale_bounds(spark, sf_dir):
    """Rows outside the sampled [lo, hi] (new inserts since sampling)
    still land in the open-ended first/last stripes."""
    o = load_table(spark, sf_dir, "orders")
    _assert_exact_partition(o, range_partition_predicates("o_orderkey", 100, 200, 4))


def test_mod_predicates_partition_exactly(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    _assert_exact_partition(o, mod_partition_predicates("o_orderkey", 5))


def test_mod_predicates_cover_negative_keys(spark):
    """SQL MOD keeps the dividend's sign; the stripes must still form
    an exact partition when keys go negative."""
    df = spark.range(-50, 50).withColumnRenamed("id", "k")
    _assert_exact_partition(df, mod_partition_predicates("k", 7))


def test_degenerate_domains():
    assert range_partition_predicates("k", 5, 5, 4) == ["1=1"]
    assert range_partition_predicates("k", 0, 10, 1) == ["1=1"]
    assert mod_partition_predicates("k", 1) == ["1=1"]
    with pytest.raises(ValueError):
        range_partition_predicates("k", 0, 10, 0)
    with pytest.raises(ValueError):
        mod_partition_predicates("k", 0)


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=200, deadline=None)
    @given(lo=st.integers(-10**9, 10**9), width=st.integers(0, 10**9),
           n=st.integers(1, 64), probe=st.integers(-2 * 10**9, 2 * 10**9))
    def test_range_predicates_cover_any_value(lo, width, n, probe):
        """Property: for ANY bounds/partition-count, every integer key
        value satisfies exactly one generated predicate."""
        preds = range_partition_predicates("k", lo, lo + width, n)
        hits = 0
        for p in preds:
            if p == "1=1":
                hits += 1
                continue
            clauses = p.split(" AND ")
            ok = True
            for c in clauses:
                col, op, val = c.split(" ", 2)
                v = int(val)
                ok = ok and (probe >= v if op == ">=" else probe < v)
            hits += ok
        assert hits == 1, (preds, probe, hits)
except ImportError:  # pragma: no cover - hypothesis is baked in
    pass
