"""Streaming weighted_keep twin: fed the true corpus max as the
declared ceiling, the stream keeps the IDENTICAL subset the batch
operator keeps (exact row parity), restarts are idempotent, and the
ceiling precondition is enforced."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from dht11_data_pipeline_spark.operators import curation
from dht11_data_pipeline_spark.streaming.curation import (
    start_weighted_keep_stream, weighted_keep_stream)


def _write_feed(tmp_path, rows, n_batches=3):
    src = str(tmp_path / "feed")
    os.makedirs(src)
    per = (len(rows) + n_batches - 1) // n_batches
    for i in range(n_batches):
        with open(os.path.join(src, f"b{i}.json"), "w") as f:
            for r in rows[i * per:(i + 1) * per]:
                f.write(json.dumps(r) + "\n")
    return src


def test_weighted_keep_stream_matches_batch(spark, tmp_path, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    batch = curation.weighted_keep(docs, F.length("text"),
                                   rate_ppm=500_000)
    expected = {tuple(r) for r in batch.collect()}
    w_max = max(w for (_, w, *_rest) in expected)

    rows = [{"doc_id": r["doc_id"], "weight": len(r["text"])}
            for r in docs.select("doc_id", "text").collect()]
    src = _write_feed(tmp_path, rows)
    out = str(tmp_path / "out")
    q = start_weighted_keep_stream(
        spark, src, out_dir=out,
        checkpoint_dir=str(tmp_path / "ckpt"), w_max=w_max)
    q.awaitTermination(300)

    got = {tuple(r) for r in spark.read.parquet(out).collect()}
    assert got == expected

    # restart over the fully-consumed feed: no duplicate emission
    q2 = start_weighted_keep_stream(
        spark, src, out_dir=out,
        checkpoint_dir=str(tmp_path / "ckpt"), w_max=w_max)
    q2.awaitTermination(300)
    assert {tuple(r) for r in spark.read.parquet(out).collect()} == expected


def test_weighted_keep_stream_is_pure_projection(spark):
    """The same transform applied to a BATCH frame equals the batch
    operator when the ceiling is the true max — the drift-proofing
    contract behind the shared gate projection."""
    df = spark.createDataFrame(
        [(i, (i * 7) % 23 + 1) for i in range(200)],
        "doc_id long, weight long")
    via_stream_form = weighted_keep_stream(df, w_max=23, rate_ppm=300_000)
    via_batch = curation.weighted_keep(df, F.col("weight"),
                                       rate_ppm=300_000)
    assert ({tuple(r) for r in via_stream_form.collect()}
            == {tuple(r) for r in via_batch.collect()})


def test_weighted_keep_stream_enforces_ceiling(spark):
    df = spark.createDataFrame([(1, 10), (2, 99)],
                               "doc_id long, weight long")
    with pytest.raises(Exception, match="weighted_keep_stream"):
        weighted_keep_stream(df, w_max=50).collect()
    with pytest.raises(ValueError, match="ceiling"):
        weighted_keep_stream(df, w_max=0)


def test_cluster_balanced_stream_matches_batch(spark, tmp_path, sf_dir):
    """Fed the batch pass's own centroids and quota map, the stateless
    stream gate keeps the identical subset (true stream run over a
    JSON-lines feed, then the pure-projection form)."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from dht11_data_pipeline_spark.operators.kmeans import (
        select_centroids)
    from dht11_data_pipeline_spark.streaming.curation import (
        cluster_balanced_stream)

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    batch = curation.cluster_balanced_sample(emb, k=20,
                                             budget_ppm=400_000)
    expected = {(r["vec_id"], r["cluster_id"], r["keep_ppm"],
                 r["keep_flag"]) for r in batch.collect()}
    quotas = {r["cluster_id"]: r["keep_ppm"] for r in
              batch.select("cluster_id", "keep_ppm").distinct().collect()}
    cents = select_centroids(emb, 20)

    # pure-projection parity on the batch frame
    got = {tuple(r) for r in
           cluster_balanced_stream(emb, cents, quotas).collect()}
    assert got == expected

    # true micro-batched stream over a parquet feed
    feed = str(tmp_path / "feed")
    emb.repartition(3).write.parquet(feed)
    schema = T.StructType([
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        T.StructField("label", T.IntegerType()),
    ])
    src = (spark.readStream.schema(schema)
           .option("maxFilesPerTrigger", 1).parquet(feed))
    out = str(tmp_path / "out")
    q = (cluster_balanced_stream(src, cents, quotas)
         .writeStream.format("parquet")
         .option("path", out)
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(300)
    got_stream = {tuple(r) for r in spark.read.parquet(out).collect()}
    assert got_stream == expected


def test_cluster_balanced_stream_rejects_uncovered_cluster(spark):
    import pytest

    from dht11_data_pipeline_spark.streaming.curation import (
        cluster_balanced_stream)

    df = spark.createDataFrame([(1, [0.9, 0.9]), (2, [-0.9, -0.9])],
                               "vec_id long, embedding array<float>")
    cents = [(1, [1.0, 1.0]), (2, [-1.0, -1.0])]
    with pytest.raises(Exception, match="no quota"):
        cluster_balanced_stream(df, cents, {1: 500_000}).collect()
    with pytest.raises(ValueError, match="quota map"):
        cluster_balanced_stream(df, cents, {})


def test_oov_rate_stream_matches_batch(spark, tmp_path, sf_dir):
    """Fed the batch pass's own top-V vocabulary, the stateless stream
    audit emits the identical per-doc rows — projection parity AND a
    true availableNow stream run."""
    from pyspark.sql import types as T

    from dht11_data_pipeline_spark.operators.ranking import (
        global_row_number)
    from dht11_data_pipeline_spark.operators.textops import oov_rate
    from dht11_data_pipeline_spark.streaming.textops import (
        oov_rate_stream)

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    batch = oov_rate(docs, vocab_size=20)
    expected = {tuple(r) for r in batch.collect()}

    # reproduce the batch vocab cut exactly (count DESC, token)
    toks = docs.selectExpr(
        "explode(filter(split(text, ' '), t -> t != '')) AS token")
    types = toks.groupBy("token").count()
    vocab = [r["token"] for r in
             global_row_number(types, [F.col("count").desc(),
                                       F.col("token")], "rk")
             .filter("rk <= 20").collect()]

    got = {tuple(r) for r in
           oov_rate_stream(docs.select("doc_id", "text"), vocab)
           .collect()}
    assert got == expected

    feed = str(tmp_path / "feed")
    docs.select("doc_id", "text").repartition(3).write.parquet(feed)
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ])
    src = (spark.readStream.schema(schema)
           .option("maxFilesPerTrigger", 1).parquet(feed))
    out = str(tmp_path / "out")
    q = (oov_rate_stream(src, vocab)
         .writeStream.format("parquet")
         .option("path", out)
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(300)
    assert {tuple(r) for r in spark.read.parquet(out).collect()} == expected


def test_oov_rate_stream_rejects_empty_vocab(spark):
    import pytest

    from dht11_data_pipeline_spark.streaming.textops import (
        oov_rate_stream)

    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError, match="vocabulary"):
        oov_rate_stream(df, [])
