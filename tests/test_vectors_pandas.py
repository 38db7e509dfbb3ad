"""The Arrow/numpy cosine pandas_udf agrees with the higher-order-
function implementation (rounded to the 4 decimals every similarity
operator ranks on), and is exercised end-to-end through a join."""

from __future__ import annotations

from pyspark.sql import functions as F

from dht11_data_pipeline_spark.functions.vectors import cosine, cosine_pandas_udf
from dht11_data_pipeline_spark.sources.tables import load_table


def test_pandas_cosine_matches_hof(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv"))
    c = emb.select(F.col("vec_id").alias("cid"), F.col("embedding").alias("cv"))
    pairs = F.broadcast(q).crossJoin(c).filter(F.col("qid") != F.col("cid"))
    cos_udf = cosine_pandas_udf()
    both = pairs.select(
        "qid", "cid",
        F.round(cosine(F.col("qv"), F.col("cv")), 4).alias("hof"),
        F.round(cos_udf(F.col("qv"), F.col("cv")), 4).alias("np"),
    )
    assert both.filter(F.col("hof") != F.col("np")).count() == 0
    assert both.count() > 0


def test_multimodal_embed_feeds_similarity(spark, sf_dir):
    """Composition: binary payload -> stub embedding (mapInPandas) ->
    exact cosine top-k. Verifies the multimodal plumbing emits vectors
    the similarity operators consume unchanged, deterministically."""
    from pyspark.sql import functions as F

    from dht11_data_pipeline_spark.operators import multimodal, similarity

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(200)
    emb = multimodal.embed_payloads(multimodal.attach_binary_payload(docs))
    emb = emb.withColumnRenamed("doc_id", "vec_id")
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    topk = similarity.cosine_topk(emb, queries, k=3)
    rows = topk.collect()
    n_queries = queries.count()
    assert len(rows) == 3 * n_queries
    assert all(0.0 <= r["sim"] <= 1.0 for r in rows)  # unit-norm vectors
    again = {(r["query_id"], r["rank"]): r["neighbor_id"]
             for r in topk.collect()}
    for r in rows:
        assert again[(r["query_id"], r["rank"])] == r["neighbor_id"]
