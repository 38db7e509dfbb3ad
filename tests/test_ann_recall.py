"""Recall of the approximate similarity paths vs exact brute force —
quantifies the accuracy/cost trade the LSH/IVF docstrings claim."""

from __future__ import annotations

from pyspark.sql import functions as F

from dht11_data_pipeline_spark.operators import similarity
from dht11_data_pipeline_spark.sources.tables import load_table


def _topk_sets(df):
    out = {}
    for r in df.collect():
        out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    return out


def _recall(exact: dict, approx: dict) -> float:
    hits = total = 0
    for q, ns in exact.items():
        total += len(ns)
        hits += len(ns & approx.get(q, set()))
    return hits / total


def test_ann_recall_floor(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    exact = _topk_sets(similarity.cosine_topk(emb, queries, k=5))
    lsh = _topk_sets(similarity.lsh_ann_topk(emb, queries, k=5,
                                             n_planes=4, dim=64))
    ivf = _topk_sets(similarity.ivf_topk(emb, queries, k=5, centroid_mod=40))
    r_lsh, r_ivf = _recall(exact, lsh), _recall(exact, ivf)
    # synthetic near-uniform vectors are the worst case for both (no
    # cluster structure: true neighbors sit barely above ambient
    # similarity) — measured ~0.10 / ~0.38 here; floors guard collapse,
    # they are not production targets
    assert r_lsh >= 0.05, f"LSH recall collapsed: {r_lsh:.2f}"
    assert r_ivf >= 0.20, f"IVF recall collapsed: {r_ivf:.2f}"
    # fewer planes -> bigger buckets -> recall must not decrease
    lsh2 = _topk_sets(similarity.lsh_ann_topk(emb, queries, k=5,
                                              n_planes=2, dim=64))
    assert _recall(exact, lsh2) >= r_lsh


def _pair_set(df):
    return {(r["id_a"], r["id_b"]) for r in df.collect()}


def test_multiprobe_near_dup_recall_and_exactness(spark, sf_dir):
    """Multi-probe OR-amplification: every emitted pair is a TRUE
    near-dup (verified cosine), and more tables strictly widen recall
    vs a single LSH table."""
    emb = load_table(spark, sf_dir, "embeddings")
    brute = _pair_set(similarity.embedding_near_duplicates(
        emb, threshold=0.4))
    one_table = _pair_set(similarity.embedding_near_duplicates_multiprobe(
        emb, threshold=0.4, n_tables=1))
    three_tables = _pair_set(similarity.embedding_near_duplicates_multiprobe(
        emb, threshold=0.4, n_tables=3))
    # no false positives: candidates are cosine-verified
    assert three_tables <= brute
    # OR-amplification: recall is monotone in table count
    assert one_table <= three_tables
    if brute:
        assert len(three_tables) >= len(one_table)


def test_brute_near_dup_refuses_past_limit(spark):
    import pytest
    rows = [(i, [float(i % 7)] * 4) for i in range(10)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    with pytest.raises(ValueError, match="cartesian"):
        similarity.embedding_near_duplicates(emb, threshold=0.4,
                                             brute_limit=5)
