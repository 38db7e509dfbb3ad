"""Bloom-filter incremental-dedup operator: invariants the probability
math guarantees, pinned as exact tests.

- No false negatives: every batch doc whose text IS in the store must
  probe as a hit (bloom bits are a superset of every inserted key's
  positions).
- Verdict split: hits partition exactly into true dups (content hash in
  store) and false positives; misses are always 'clean'.
- Mergeability: the filter is a bitwise-OR monoid — building words on
  the union of two store halves equals OR-merging words built per half
  (this is what makes the filter maintainable per ingestion batch at
  100 TB without rebuilding).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dht11_data_pipeline_spark.operators.dedup import (
    bloom_build_words,
    bloom_probe_new_docs,
)
from dht11_data_pipeline_spark.sources.tables import load_table


def _split(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    store = docs.filter(F.col("doc_id") % 3 != 0)
    batch = docs.filter(F.col("doc_id") % 2 == 0)
    return docs, store, batch


def test_no_false_negatives(spark, sf_dir):
    _, store, batch = _split(spark, sf_dir)
    out = bloom_probe_new_docs(store, batch)
    # every true dup must be a bloom hit with verdict 'dup'
    sh = store.select(F.sha2("text", 256).alias("ch")).distinct()
    true_dups = (
        batch.select("doc_id", F.sha2("text", 256).alias("ch"))
        .join(sh, "ch").select("doc_id")
    )
    missed = true_dups.join(
        out.filter(F.col("verdict") == "dup"), "doc_id", "left_anti")
    assert missed.count() == 0
    assert out.filter((F.col("bloom_hit") == "N")
                      & (F.col("verdict") != "clean")).count() == 0


def test_tiny_filter_forces_false_positives(spark, sf_dir):
    """With a 64-bit filter the store saturates every word, so every
    non-dup batch doc becomes a false positive — and the exact-verify
    stage must still separate them from true dups."""
    _, store, batch = _split(spark, sf_dir)
    out = bloom_probe_new_docs(store, batch, num_bits=64, num_hashes=2)
    rows = {r["verdict"]: r["cnt"]
            for r in out.groupBy("verdict").agg(
                F.count(F.lit(1)).alias("cnt")).collect()}
    assert rows.get("false_positive", 0) > 0
    assert rows.get("clean", 0) == 0  # saturated filter: nothing provably new
    # true-dup count unchanged by filter size
    big = bloom_probe_new_docs(store, batch)
    assert (out.filter(F.col("verdict") == "dup").count()
            == big.filter(F.col("verdict") == "dup").count())


def test_words_or_merge_equals_full_build(spark, sf_dir):
    _, store, _ = _split(spark, sf_dir)
    half_a = store.filter(F.col("doc_id") % 2 == 0)
    half_b = store.filter(F.col("doc_id") % 2 != 0)
    merged = (
        bloom_build_words(half_a).unionByName(bloom_build_words(half_b))
        .groupBy("word_idx").agg(F.bit_or("word").alias("word"))
    )
    full = bloom_build_words(store)
    assert merged.exceptAll(full).count() == 0
    assert full.exceptAll(merged).count() == 0


def test_filter_is_broadcast_size(spark, sf_dir):
    _, store, _ = _split(spark, sf_dir)
    words = bloom_build_words(store, num_bits=65536)
    assert words.count() <= 65536 // 64
