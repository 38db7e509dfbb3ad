"""Streaming incremental dedup: union of per-batch pairs == one-shot
full-corpus run (each pair reported exactly once, by its later member's
batch)."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from dht11_data_pipeline_spark.operators import dedup
from dht11_data_pipeline_spark.streaming.dedup import start_minhash_dedup_stream


def test_streamed_pairs_equal_full_run(spark, tmp_path, sf_dir):
    docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id", "text").orderBy("doc_id").collect())
    src = str(tmp_path / "feed")
    os.makedirs(src)
    third = len(docs) // 3
    for i, chunk in enumerate([docs[:third], docs[third:2 * third],
                               docs[2 * third:]]):
        with open(os.path.join(src, f"b{i}.json"), "w") as f:
            for r in chunk:
                f.write(json.dumps({"doc_id": r["doc_id"], "text": r["text"]}) + "\n")

    pairs_dir = str(tmp_path / "pairs")
    q = start_minhash_dedup_stream(
        spark, src, state_dir=str(tmp_path / "state"), pairs_dir=pairs_dir,
        checkpoint_dir=str(tmp_path / "ckpt"), threshold=0.5)
    q.awaitTermination(300)

    streamed = spark.read.parquet(pairs_dir).select("doc_a", "doc_b", "jaccard")
    full = dedup.minhash_near_duplicates(
        spark.read.parquet(f"{sf_dir}/documents.parquet"), threshold=0.5)
    assert streamed.count() > 0
    assert streamed.exceptAll(full).count() == 0
    assert full.exceptAll(streamed).count() == 0
    # no pair reported twice across batches
    assert streamed.groupBy("doc_a", "doc_b").count().filter("count > 1").count() == 0


def test_streamed_clusters_equal_one_shot(spark, tmp_path, sf_dir):
    """The continuous cluster-label store equals cluster_documents over
    the full corpus after all batches drain."""
    from dht11_data_pipeline_spark.operators.graph import cluster_documents
    from dht11_data_pipeline_spark.streaming.dedup import (
        current_labels, start_cluster_stream)

    full_docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs = full_docs.select("doc_id", "text").orderBy("doc_id").collect()
    src = str(tmp_path / "feed")
    os.makedirs(src)
    half = len(docs) // 2
    for i, chunk in enumerate([docs[:half], docs[half:]]):
        with open(os.path.join(src, f"b{i}.json"), "w") as f:
            for r in chunk:
                f.write(json.dumps({"doc_id": r["doc_id"],
                                    "text": r["text"]}) + "\n")

    labels_dir = str(tmp_path / "labels")
    q = start_cluster_stream(
        spark, src, state_dir=str(tmp_path / "state"),
        labels_dir=labels_dir, checkpoint_dir=str(tmp_path / "ckpt"),
        threshold=0.5)
    q.awaitTermination(300)

    got = {r["node"]: r["cluster_id"]
           for r in current_labels(spark, labels_dir).collect()}
    want = {r["doc_id"]: r["cluster_id"]
            for r in cluster_documents(
                full_docs,
                dedup.minhash_near_duplicates(full_docs, threshold=0.5)
            ).collect()}
    assert got == want
