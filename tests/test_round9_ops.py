"""Round-9 operators: hard-negative mining, per-doc trigram-LM scoring,
curriculum staging."""

from __future__ import annotations

from pyspark.sql import functions as F

from dht11_data_pipeline_spark.operators.similarity import (
    cosine_topk, hard_negative_topk)
from dht11_data_pipeline_spark.operators.textops import doc_lm_score


def test_hard_negatives_exclude_same_label(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    out = hard_negative_topk(emb, queries, k=3)
    labels = {r["vec_id"]: r["label"] for r in
              emb.select("vec_id", "label").collect()}
    rows = out.collect()
    assert rows
    for r in rows:
        assert labels[r["query_id"]] != r["n_label"]
        assert r["n_label"] == labels[r["neighbor_id"]]
        assert 1 <= r["rank"] <= 3
    # a hard negative is never MORE similar than the best unrestricted
    # neighbor: the top-1 overall sim bounds the top-1 negative sim
    best_any = {r["query_id"]: r["sim"] for r in
                cosine_topk(emb, queries, k=1).collect()}
    best_neg = {r["query_id"]: r["sim"] for r in rows if r["rank"] == 1}
    for qid, s in best_neg.items():
        assert s <= best_any[qid]


def test_doc_lm_score_hand_example(spark):
    # corpus: "a b c" twice and "a b d" once.
    #   c3(a,b,c)=2, c3(a,b,d)=1, c2(a,b)=3
    #   doc 1/2 score = (1e6*2)//3 = 666666; doc 3 = (1e6*1)//3 = 333333
    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c"), (3, "a b d"), (4, "too short")],
        "doc_id long, text string")
    got = {r["doc_id"]: (r["n_trigrams"], r["lm_score_ppm"])
           for r in doc_lm_score(docs).collect()}
    assert got == {1: (1, 666666), 2: (1, 666666), 3: (1, 333333)}
    # doc 4 has < 3 tokens -> absent


def test_doc_lm_score_repeated_trigram_weighting(spark):
    # one doc with trigram (x x x) twice via "x x x x": trigrams
    # (x,x,x) at positions 1..2 -> k=2; corpus-unique context so
    # p=1e6; mean = 1e6
    docs = spark.createDataFrame([(1, "x x x x")],
                                 "doc_id long, text string")
    [r] = doc_lm_score(docs).collect()
    assert (r["n_trigrams"], r["lm_score_ppm"]) == (2, 1000000)


def test_curriculum_order_stages_balanced(spark, sf_dir):
    import sys
    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as E

    out = E.queries()["cur_curriculum_order"](spark, sf_dir).collect()
    n = len(out)
    assert n > 0
    sizes = {}
    for r in out:
        sizes[r["stage"]] = sizes.get(r["stage"], 0) + 1
    assert set(sizes) == {1, 2, 3, 4}
    assert max(sizes.values()) - min(sizes.values()) <= 1
    # staging is monotone in ttr: every stage-1 doc has ttr <= every
    # stage-4 doc
    max_s1 = max(r["ttr_ppm"] for r in out if r["stage"] == 1)
    min_s4 = min(r["ttr_ppm"] for r in out if r["stage"] == 4)
    assert max_s1 <= min_s4


def test_knn_label_audit_majority_and_ties(spark):
    from dht11_data_pipeline_spark.operators.similarity import (
        knn_label_audit)

    # 2D unit-ish vectors: qid 0 labelled 9 sits among three label-1
    # vectors and one label-2 -> predicted 1, votes 3, mismatch.
    rows = [
        (0, [1.0, 0.0], 9),
        (1, [0.99, 0.01], 1),
        (2, [0.98, 0.02], 1),
        (3, [0.97, 0.03], 1),
        (4, [0.96, 0.04], 2),
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int")
    out = knn_label_audit(emb, emb.filter("vec_id = 0"), k=4)
    [r] = out.collect()
    assert (r["true_label"], r["predicted_label"], r["votes"],
            r["label_match"]) == (9, 1, 3, False)

    # vote tie (2 vs 2) elects the SMALLEST label: corpus without the
    # third label-1 vector, backfilled with a second label-2 one
    emb2 = spark.createDataFrame(
        [r for r in rows if r[0] != 3] + [(5, [0.95, 0.05], 2)],
        "vec_id long, embedding array<float>, label int")
    out2 = knn_label_audit(emb2, emb2.filter("vec_id = 0"), k=4)
    [r2] = out2.collect()
    assert r2["predicted_label"] == 1 and r2["votes"] == 2


def test_oov_rate_hand_example(spark):
    from dht11_data_pipeline_spark.operators.textops import oov_rate

    # counts: a=4, b=3, c=2 -> vocab_size=2 keeps {a, b}; c is OOV
    docs = spark.createDataFrame(
        [(1, "a a b c"), (2, "a a b b c")],
        "doc_id long, text string")
    got = {r["doc_id"]: (r["n_tokens"], r["n_oov"], r["oov_ppm"])
           for r in oov_rate(docs, vocab_size=2).collect()}
    assert got == {1: (4, 1, 250000), 2: (5, 1, 200000)}

    # count tie at the cut breaks on token order: vocab_size=1 with
    # equal counts keeps the lexicographically first token
    docs2 = spark.createDataFrame([(1, "x y x y")],
                                  "doc_id long, text string")
    [r] = oov_rate(docs2, vocab_size=1).collect()
    assert (r["n_tokens"], r["n_oov"]) == (4, 2)


def test_semantic_contamination_hand_example(spark):
    from dht11_data_pipeline_spark.operators.similarity import (
        semantic_contamination)

    probes = spark.createDataFrame(
        [(100, [1.0, 0.0])], "vec_id long, embedding array<float>")
    corpus = spark.createDataFrame(
        [(1, [0.9, 0.1]),    # cosine ~0.994 -> drop
         (2, [0.0, 1.0]),    # cosine 0 -> keep
         (3, [-1.0, 0.0])],  # cosine -1 -> keep
        "vec_id long, embedding array<float>")
    got = {r["vec_id"]: (r["n_hits"], r["verdict"])
           for r in semantic_contamination(corpus, probes,
                                           threshold=0.4).collect()}
    assert got == {1: (1, "drop"), 2: (0, "keep"), 3: (0, "keep")}


def test_training_order_is_permutation_with_balanced_shards(spark, sf_dir):
    import sys
    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as E

    out = E.queries()["cur_training_order"](spark, sf_dir).collect()
    n = len(out)
    assert sorted(r["position"] for r in out) == list(range(1, n + 1))
    shards = {}
    for r in out:
        assert r["shard"] == (r["position"] - 1) % 8
        shards[r["shard"]] = shards.get(r["shard"], 0) + 1
    assert max(shards.values()) - min(shards.values()) <= 1
    # deterministic: identical permutation on a re-run
    again = {r["doc_id"]: r["position"]
             for r in E.queries()["cur_training_order"](spark, sf_dir)
             .collect()}
    assert again == {r["doc_id"]: r["position"] for r in out}
