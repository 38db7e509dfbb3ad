"""Incremental rollup maintenance: merge-of-partials must equal full
recompute (the continuous-aggregate safety property), in any merge
order, including the HLL distinct sketch."""

from __future__ import annotations

from pyspark.sql import functions as F

from dht11_data_pipeline_spark.operators import rollup as R
from dht11_data_pipeline_spark.sources.tables import load_table

KEYS = ["day", "event_type"]


def _events(spark, sf_dir):
    return load_table(spark, sf_dir, "events").withColumn(
        "day", F.date_trunc("day", "ts").cast("date").cast("string")
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_incremental_equals_recompute(spark, sf_dir):
    ev = _events(spark, sf_dir)
    full = R.read_rollup(R.rollup_batch(ev, KEYS))
    state = R.rollup_batch(ev.filter(F.col("event_id") % 3 == 0), KEYS)
    for i in (1, 2):
        state = R.merge_rollups(state, R.rollup_batch(ev.filter(F.col("event_id") % 3 == i), KEYS), KEYS)
    assert _rows(R.read_rollup(state)) == _rows(full)


def test_merge_order_independent(spark, sf_dir):
    ev = _events(spark, sf_dir)
    parts = [R.rollup_batch(ev.filter(F.col("event_id") % 3 == i), KEYS) for i in range(3)]
    fwd = R.merge_rollups(R.merge_rollups(parts[0], parts[1], KEYS), parts[2], KEYS)
    rev = R.merge_rollups(R.merge_rollups(parts[2], parts[0], KEYS), parts[1], KEYS)
    assert _rows(R.read_rollup(fwd)) == _rows(R.read_rollup(rev))


def test_hll_sketch_tracks_exact_distincts(spark, sf_dir):
    ev = _events(spark, sf_dir)
    got = {
        (r["day"], r["event_type"]): r["approx_users"]
        for r in R.read_rollup(R.rollup_batch(ev, KEYS)).collect()
    }
    exact = {
        (r["day"], r["event_type"]): r["n"]
        for r in ev.groupBy(*KEYS).agg(F.countDistinct("user_id").alias("n")).collect()
    }
    assert got.keys() == exact.keys()
    for k, est in got.items():
        assert abs(est - exact[k]) <= max(2, 0.1 * exact[k]), (k, est, exact[k])


def test_step_cost_does_not_rescan_history(spark, sf_dir):
    """Plan evidence: one maintenance step scans ONE batch + the
    grain-sized state — events.parquet appears exactly once."""
    ev = _events(spark, sf_dir)
    state = R.rollup_batch(ev.filter(F.col("event_id") % 3 == 0), KEYS)
    # materialize state so the next step's plan can't reach back into it
    state = spark.createDataFrame(state.collect(), state.schema)
    step = R.merge_rollups(state, R.rollup_batch(ev.filter(F.col("event_id") % 3 == 1), KEYS), KEYS)
    plan = step._jdf.queryExecution().executedPlan().toString()
    assert plan.count("events.parquet") == 1, plan
