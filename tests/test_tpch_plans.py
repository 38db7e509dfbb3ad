"""Plan-shape evidence for the TPC-H subquery wave: the decorrelated
DataFrame plans must pick the physical strategies the scale notes
claim — broadcast joins for dim sides, semi/anti joins for EXISTS /
NOT EXISTS, pushed parquet filters for the date cuts. Value
correctness is covered by the DuckDB diff; these tests pin the
*plans* so a refactor can't silently regress to a shuffle."""

from __future__ import annotations

from dht11_data_pipeline_spark.plans import tpch_queries as T


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_q4_exists_is_semi_join_with_pushed_date(spark, sf_dir):
    plan = _plan(T.q4_priority_with_late_ship(spark, sf_dir))
    assert "LeftSemi" in plan, plan
    # the 1997-H1 cut must reach the orders parquet scan
    assert "PushedFilters" in plan and "o_orderdate" in plan.split("PushedFilters", 1)[1][:400], plan


def test_q22_not_exists_is_anti_join(spark, sf_dir):
    plan = _plan(T.q22_idle_wealthy_customers(spark, sf_dir))
    assert "LeftAnti" in plan, plan


def test_q14_q19_broadcast_the_part_dim(spark, sf_dir):
    for q in (T.q14_promo_revenue_share, T.q19_disjunctive_revenue):
        plan = _plan(q(spark, sf_dir))
        assert "BroadcastHashJoin" in plan, plan
        assert "SortMergeJoin" not in plan, plan


def test_q17_no_sort_merge_anywhere(spark, sf_dir):
    """Both the brand filter and the per-part aggregate joined back are
    dim-sized → the whole plan must stay broadcast-only."""
    plan = _plan(T.q17_small_quantity_revenue(spark, sf_dir))
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_q21_reads_fact_once(spark, sf_dir):
    """The EXISTS + NOT EXISTS self-correlations are folded into one
    pair-grain aggregate with window-derived order counts — lineitem
    must appear in the scan list exactly once, never the naive three
    times (or the groupBy-and-join-back shape's two)."""
    plan = _plan(T.q21_sole_late_supplier(spark, sf_dir))
    assert plan.count("lineitem.parquet") == 1, plan


def test_q15_max_is_broadcast_back(spark, sf_dir):
    plan = _plan(T.q15_top_revenue_supplier(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, plan
