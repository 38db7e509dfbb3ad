"""Durable signature store (operators/sigstore): the deployment form
of incremental dedup. The invariants:

1. Batch N+1 probes batch N's COMMITTED store (never re-sketches the
   corpus) and the union of all batches' pairs equals the one-shot
   ``minhash_near_duplicates`` over the full corpus.
2. One update over a pre-built store emits pairs identical to the
   stateless ``dedup_incremental`` form (the driver query twin).
3. A replayed batch key is idempotent — same pairs, no duplicate
   signatures in the store.
4. Parameter / hash-family mismatches refuse loudly.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dht11_data_pipeline_spark.operators import dedup, sigstore, txlog
from dht11_data_pipeline_spark.sources.tables import load_table


def _pairs_set(df):
    return {(r["doc_a"], r["doc_b"], round(r["jaccard"], 6))
            for r in df.collect()}


def _sig_map(df):
    return {r["doc_id"]: tuple(r["signature"]) for r in df.collect()}


def test_batchwise_union_equals_oneshot(spark, sf_dir, tmp_path):
    """Empty store + three ingestion batches == the one-shot run.
    Every batch reuses the previous batches' committed signatures;
    nothing is ever re-sketched."""
    docs = load_table(spark, sf_dir, "documents")
    store = str(tmp_path / "store")
    assert sigstore.init_signature_store(spark, store) == 1

    got = set()
    seen = docs.limit(0)
    for b in range(3):
        batch = docs.filter(F.col("doc_id") % 3 == b)
        seen = seen.unionByName(batch)
        v, pairs = sigstore.update_signature_store(
            spark, store, corpus=seen, new_docs=batch,
            batch_key=f"b{b}", threshold=0.5)
        assert v == b + 2  # init was v1
        got |= _pairs_set(pairs)

    want = _pairs_set(dedup.minhash_near_duplicates(docs, threshold=0.5))
    assert got == want and want  # non-vacuous

    # the committed store holds exactly one signature per doc, equal
    # to a fresh sketch of the full corpus (no drift across batches)
    stored = _sig_map(sigstore.read_signature_store(spark, store))
    fresh = _sig_map(dedup.minhash_signature(docs))
    assert stored == fresh


def test_matches_stateless_driver_form(spark, sf_dir, tmp_path):
    """Pre-built store + one batch == plans/ext_queries.dedup_incremental
    (which builds the same store in-line because the driver contract is
    stateless). This is the amortization claim, pinned."""
    docs = load_table(spark, sf_dir, "documents")
    new = docs.filter(F.col("doc_id") % 4 == 0)
    old = docs.filter(F.col("doc_id") % 4 != 0)

    store = str(tmp_path / "store")
    sigstore.init_signature_store(spark, store, docs=old)
    _, pairs = sigstore.update_signature_store(
        spark, store, corpus=docs, new_docs=new, batch_key="b0",
        threshold=0.5)

    stateless = dedup.minhash_incremental_pairs(
        docs, dedup.minhash_signature(old), new, threshold=0.5)
    assert _pairs_set(pairs) == _pairs_set(stateless) != set()


def test_replay_is_idempotent(spark, sf_dir, tmp_path):
    """Re-running a batch key emits the identical pairs and leaves the
    store without duplicate signatures (the replayed batch probes the
    store WITHOUT its own previous entry)."""
    docs = load_table(spark, sf_dir, "documents")
    b0 = docs.filter(F.col("doc_id") % 3 == 0)
    b1 = docs.filter(F.col("doc_id") % 3 != 0)

    store = str(tmp_path / "store")
    sigstore.init_signature_store(spark, store, docs=b0)
    _, first = sigstore.update_signature_store(
        spark, store, corpus=docs, new_docs=b1, batch_key="b1")
    first_set = _pairs_set(first)
    before = _sig_map(sigstore.read_signature_store(spark, store))

    _, replay = sigstore.update_signature_store(
        spark, store, corpus=docs, new_docs=b1, batch_key="b1")
    assert _pairs_set(replay) == first_set
    after = _sig_map(sigstore.read_signature_store(spark, store))
    assert after == before  # one signature per doc, values unchanged

    # the superseded dir is unreferenced -> reclaimable
    removed = txlog.vacuum(store, retain_versions=1)
    assert any(p.startswith("data/") for p in removed)
    assert _sig_map(sigstore.read_signature_store(spark, store)) == before


def test_param_mismatch_refuses(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents").limit(20)
    store = str(tmp_path / "store")
    sigstore.init_signature_store(spark, store, docs=docs)
    with pytest.raises(ValueError, match="hash famil"):
        sigstore.update_signature_store(
            spark, store, corpus=docs, new_docs=docs.limit(5),
            batch_key="b0", num_hashes=4)
    with pytest.raises(ValueError, match="not a minhash"):
        other = str(tmp_path / "notastore")
        import os

        os.makedirs(other + "/_txlog", exist_ok=True)
        txlog._commit(other, {"kind": "other", "buckets": {}},
                      base_version=0)
        sigstore.update_signature_store(
            spark, other, corpus=docs, new_docs=docs.limit(5),
            batch_key="b0")

def test_duplicate_doc_id_across_batch_keys_refuses(spark, sf_dir, tmp_path):
    """Batch keys must PARTITION doc ids: the same id arriving under a
    DIFFERENT key would leave two signatures in the store (reads never
    dedupe) and silently break pair-completeness on later updates — so
    the update refuses loudly, while a replay under the ORIGINAL key
    stays allowed (its old entry is excluded from the probe), and the
    documented opt-out skips the scan (ADVICE r10)."""
    docs = load_table(spark, sf_dir, "documents").limit(30)
    b0 = docs.filter(F.col("doc_id") % 2 == 0)
    overlap = docs.filter(F.col("doc_id") % 4 == 0)  # subset of b0

    store = str(tmp_path / "store")
    sigstore.init_signature_store(spark, store)
    sigstore.update_signature_store(
        spark, store, corpus=b0, new_docs=b0, batch_key="b0")

    with pytest.raises(ValueError, match="already committed"):
        sigstore.update_signature_store(
            spark, store, corpus=b0, new_docs=overlap, batch_key="b1")
    # replaying the original key is the sanctioned re-ingest path
    v, _ = sigstore.update_signature_store(
        spark, store, corpus=b0, new_docs=b0, batch_key="b0")
    assert v >= 3
    # opt-out for callers whose keying already partitions ids
    sigstore.update_signature_store(
        spark, store, corpus=b0, new_docs=overlap, batch_key="b2",
        check_duplicate_ids=False)
