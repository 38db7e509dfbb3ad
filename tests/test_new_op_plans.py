"""Plan-shape evidence for the round-2 operators: fuzzy linkage must
stay a block equi-join with pushed scans, prototype pruning must
broadcast the centroid table, DSIR must broadcast the bucket stats,
and the reservoir sample must keep its two-window (salted) shape.
Value correctness is covered by the DuckDB diff; these pin the plans.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dht11_data_pipeline_spark.operators import (
    curation, linkage, similarity, textops)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_fuzzy_pairs_is_single_equi_join_no_cartesian(spark, sf_dir):
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    plan = _plan(linkage.blocked_fuzzy_pairs(
        part, ["p_brand"], "p_name", "p_partkey", max_dist=2))
    assert "CartesianProduct" not in plan, plan
    assert "NestedLoop" not in plan, plan
    # levenshtein must be a post-join filter, never a join condition
    # that forces a nested loop
    assert "levenshtein" in plan, plan


def test_prototype_prune_broadcasts_centroids(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    plan = _plan(similarity.prototype_prune(emb))
    assert "BroadcastHashJoin" in plan, plan
    # the corpus side must not sort-merge against |labels| rows
    assert "SortMergeJoin" not in plan, plan


def test_dsir_broadcasts_bucket_stats(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = _plan(textops.dsir_weights(docs))
    assert "BroadcastHashJoin" in plan, plan


def test_reservoir_two_phase_has_two_windows(spark, sf_dir):
    """The salted plan ranks twice: per (group, sub) then per group —
    a refactor collapsing it to one global window would re-create the
    hot-stratum bottleneck the operator exists to avoid."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = _plan(curation.reservoir_salted(docs, group_col="source", k=10))
    assert plan.count("Window [row_number()") == 2, plan
    # rank-limit pushdown engaged: each window gets a partial+final
    # WindowGroupLimit so only k rows per key survive to the sort
    assert plan.count("WindowGroupLimit") == 4, plan


def test_span_coverage_single_gram_scan_shape(spark, sf_dir):
    """The duplicated-gram side is a filtered aggregate of the same
    gram stream; no cartesian anywhere."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = _plan(textops.span_coverage(docs, k=8))
    assert "CartesianProduct" not in plan, plan


def test_fuzzy_join_keeps_length_prefilter(spark, sf_dir):
    """The cheap length-difference lower bound must survive into the
    physical plan so most candidates skip the quadratic DP."""
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    plan = _plan(linkage.blocked_fuzzy_pairs(
        part, ["p_brand"], "p_name", "p_partkey", max_dist=2))
    assert "abs(" in plan and "length(" in plan, plan
