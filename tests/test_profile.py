"""Profiler is metadata-driven: works on any schema without per-table
code, with native ordering semantics for min/max."""

from __future__ import annotations

from dht11_data_pipeline_spark.operators.profile import profile
from dht11_data_pipeline_spark.sources.tables import load_table


def test_profile_any_table(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    out = {r["column_name"]: r for r in profile(ev).collect()}
    assert set(out) == {"event_id", "ts", "user_id", "event_type", "value", "props"}
    n = ev.count()
    assert all(r["n_rows"] == n for r in out.values())
    assert out["event_type"]["n_distinct"] == 5
    # numeric min is numeric, not lexicographic ("9.00" > "10.00" lexically)
    assert float(out["value"]["min_value"]) <= float(out["value"]["max_value"])


def test_profile_counts_nulls(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, None)], "id int, s string")
    out = {r["column_name"]: r for r in profile(df).collect()}
    assert out["s"]["n_nulls"] == 2
    assert out["s"]["n_distinct"] == 1
    assert out["id"]["n_nulls"] == 0
    assert out["id"]["min_value"] == "1.00" and out["id"]["max_value"] == "3.00"
