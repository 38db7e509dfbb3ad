"""Round-3 operators: triangle counts, containment dedup, bigram
rarity, attribution. Hand-checkable fixtures pin the semantics the
DuckDB oracles then verify at corpus scale."""

from __future__ import annotations

from pyspark.sql import functions as F

from dht11_data_pipeline_spark.operators.dedup import containment_pairs
from dht11_data_pipeline_spark.operators.graph import triangle_counts
from dht11_data_pipeline_spark.operators.textops import bigram_rarity


def test_triangle_counts_known_graph(spark):
    # K4 on {1,2,3,4} (4 triangles, 3 per node), plus a pendant edge
    # 4-5 and an isolated edge 6-7 (no triangles).
    k4 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    pairs = spark.createDataFrame(
        k4 + [(4, 5), (6, 7)], "id_a long, id_b long")
    out = {r["node"]: r["n_triangles"] for r in triangle_counts(pairs).collect()}
    assert out == {1: 3, 2: 3, 3: 3, 4: 3}


def test_triangle_counts_orientation_insensitive(spark):
    # duplicate + reversed edges must not change counts
    pairs = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (1, 3), (3, 1)], "id_a long, id_b long")
    out = {r["node"]: r["n_triangles"] for r in triangle_counts(pairs).collect()}
    assert out == {1: 1, 2: 1, 3: 1}


def test_containment_asymmetry(spark):
    # doc 1 is a strict prefix of doc 2: every 3-shingle of 1 appears
    # in 2 (containment 1.0) but 2 is NOT contained in 1.
    short = "alpha beta gamma delta"
    long_ = short + " epsilon zeta eta theta iota kappa"
    docs = spark.createDataFrame(
        [(1, short), (2, long_)], "doc_id long, text string")
    rows = {(r["doc_a"], r["doc_b"]): r["containment"]
            for r in containment_pairs(docs, threshold=0.5).collect()}
    assert rows[(1, 2)] == 1.0
    assert (2, 1) not in rows  # 2/8 shingles shared < 0.5


def test_bigram_rarity_prefers_repetitive_text(spark):
    # "aaaa..." repeats one bigram -> near-floor rarity; doc 2's all-
    # distinct bigrams are corpus-rare -> strictly higher. Model is
    # CORPUS-trained: C1('a') = 9 (doc 1) + 1 (doc 2's "ab") = 10, so
    # rarity(aa) = 10*1e6//9 = 1111111 for each of doc 1's 9 bigrams.
    docs = spark.createDataFrame(
        [(1, "aaaaaaaaaa"), (2, "abcdefghij")], "doc_id long, text string")
    out = {r["doc_id"]: r for r in bigram_rarity(docs).collect()}
    assert out[1]["n_bigrams"] == 9 and out[2]["n_bigrams"] == 9
    assert out[1]["rarity_score"] == 1_111_111
    assert out[2]["rarity_score"] > out[1]["rarity_score"]


def test_bigram_rarity_integer_model(spark):
    # "abab": bigrams ab,ba,ab -> C2(ab)=2, C2(ba)=1; C1(a)=2, C1(b)=1.
    # rarity(ab) = 2*1e6//2 = 1e6 (x2), rarity(ba) = 1*1e6//1 = 1e6.
    # score = 3e6 // 3 = 1e6.
    docs = spark.createDataFrame([(1, "abab")], "doc_id long, text string")
    row = bigram_rarity(docs).collect()[0]
    assert (row["n_bigrams"], row["rarity_score"]) == (3, 1_000_000)


def test_attribution_first_last_touch(spark, sf_dir):
    """Every purchase with >=1 qualifying touch credits exactly one
    first-touch and one last-touch row, so both models sum to the same
    total conversions and the same credited revenue."""
    from dht11_data_pipeline_spark.plans.ext_queries import t_attribution
    out = t_attribution(spark, sf_dir).collect()
    by_model = {}
    for r in out:
        m = by_model.setdefault(r["model"], [0, 0.0])
        m[0] += r["n_conversions"]
        m[1] += r["credited_value"]
    assert by_model["first_touch"][0] == by_model["last_touch"][0]
    assert abs(by_model["first_touch"][1] - by_model["last_touch"][1]) < 1e-6
