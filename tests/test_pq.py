"""Product quantization: compression contract, determinism, and recall
vs exact brute force (the third ANN tier next to LSH and IVF)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dht11_data_pipeline_spark.operators import pq, similarity
from dht11_data_pipeline_spark.sources.tables import load_table

SF = "/root/testdata/sf0.01"
M = 8


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF, "embeddings")


@pytest.fixture(scope="module")
def codebooks(spark, emb):
    return pq.train_pq(spark, emb, m=M, code_mod=25, iters=2)


def test_codebook_shape(codebooks, emb):
    d = len(emb.select("embedding").first()[0])
    assert sorted(codebooks) == list(range(M))
    for s, cb in codebooks.items():
        assert len(cb) >= 2
        for _, vec in cb:
            assert len(vec) == d // M


def test_encode_contract(emb, codebooks):
    codes = pq.encode_pq(emb, codebooks, m=M)
    assert codes.count() == emb.count()
    row = codes.first()
    assert len(row["codes"]) == M
    valid = {s: {c for c, _ in cb} for s, cb in codebooks.items()}
    for r in codes.limit(50).collect():
        for s, c in enumerate(r["codes"]):
            assert c in valid[s], (s, c)


def test_encoding_deterministic(emb, codebooks):
    c1 = pq.encode_pq(emb, codebooks, m=M)
    c2 = pq.encode_pq(emb, codebooks, m=M)
    assert c1.exceptAll(c2).count() == 0


def test_training_on_sample_matches_shape(spark, emb):
    cbs = pq.train_pq(spark, emb, m=M, code_mod=25, iters=1, train_mod=2)
    assert sorted(cbs) == list(range(M))


def test_recall_floor_vs_exact(spark, emb, codebooks):
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    exact: dict[int, set] = {}
    for r in similarity.cosine_topk(emb, queries, k=5).collect():
        exact.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    approx: dict[int, set] = {}
    for r in pq.pq_topk(emb, queries, codebooks, m=M, k=5).collect():
        approx.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    hits = sum(len(v & approx.get(q, set())) for q, v in exact.items())
    total = sum(len(v) for v in exact.values())
    recall = hits / total
    # near-uniform synthetic vectors are ANN's worst case (cf.
    # test_ann_recall): measured ~0.36 — the floor guards collapse
    assert recall >= 0.2, f"PQ recall collapsed: {recall:.2f}"


def test_topk_output_contract(emb, codebooks):
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    out = pq.pq_topk(emb, queries, codebooks, m=M, k=3)
    rows = out.collect()
    nq = queries.count()
    assert len(rows) == 3 * nq
    for r in rows:
        assert r["query_id"] != r["neighbor_id"]
        assert 1 <= r["rank"] <= 3
        assert -1.001 <= r["approx_cos"] <= 1.001


def test_ivfpq_recall_improves_with_nprobe(spark, emb, codebooks):
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    exact: dict[int, set] = {}
    for r in similarity.cosine_topk(emb, queries, k=5).collect():
        exact.setdefault(r["query_id"], set()).add(r["neighbor_id"])

    def recall(nprobe):
        approx: dict[int, set] = {}
        out = pq.ivfpq_topk(emb, queries, codebooks, m=M, k=5,
                            centroid_mod=40, nprobe=nprobe)
        for r in out.collect():
            approx.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        hits = sum(len(v & approx.get(q, set())) for q, v in exact.items())
        return hits / sum(len(v) for v in exact.values())

    r1, r4 = recall(1), recall(4)
    assert r1 >= 0.05, f"IVF-PQ nprobe=1 collapsed: {r1:.2f}"
    # widening the probe must not lose neighbors
    assert r4 >= r1, (r1, r4)


def test_ivfpq_output_contract(emb, codebooks):
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    rows = pq.ivfpq_topk(emb, queries, codebooks, m=M, k=3,
                         centroid_mod=40, nprobe=2).collect()
    assert rows
    per_q: dict[int, list] = {}
    for r in rows:
        assert r["query_id"] != r["neighbor_id"]
        per_q.setdefault(r["query_id"], []).append(r["rank"])
    for q, ranks in per_q.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1)), q
        assert len(ranks) <= 3
