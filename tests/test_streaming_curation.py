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
