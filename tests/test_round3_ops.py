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


def test_clustering_coefficient_k4_pendant(spark):
    from dht11_data_pipeline_spark.operators.graph import clustering_coefficient
    k4 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    pairs = spark.createDataFrame(
        k4 + [(4, 5), (6, 7)], "id_a long, id_b long")
    out = {r["node"]: (r["deg"], r["n_triangles"], r["cc_ppm"])
           for r in clustering_coefficient(pairs).collect()}
    # inner K4 nodes: deg 3, all 3 neighbor pairs closed -> cc = 1e6
    for n in (1, 2, 3):
        assert out[n] == (3, 3, 1_000_000)
    # node 4 carries the pendant: deg 4, still 3 triangles -> 6/12
    assert out[4] == (4, 3, 500_000)
    # deg-1 nodes (5, 6, 7) are excluded — cc undefined
    assert 5 not in out and 6 not in out and 7 not in out


def test_ewma_fixed_point_closed_form(spark, sf_dir):
    """The window closed form must equal the sequential recurrence
    floored once at the end: y_t = (sum c_i * 2^(i-1)) >> t."""
    from dht11_data_pipeline_spark.plans.ext_queries import ts_ewma_user_value
    rows = ts_ewma_user_value(spark, sf_dir).collect()
    by_user = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    checked = 0
    for user, seq in list(by_user.items())[:20]:
        seq.sort(key=lambda r: r["rn"])
        acc = 0
        for t, r in enumerate(seq, start=1):
            assert r["rn"] == t
            acc += r["cents"] << (t - 1)
            assert r["ewma_cents"] == acc >> t
            checked += 1
    assert checked > 0


def test_phash_identical_images_group(spark):
    from dht11_data_pipeline_spark.operators import multimodal
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window
    docs = spark.createDataFrame(
        [(1, "the same payload text"), (2, "the same payload text"),
         (3, "a completely different and much longer document body here")],
        "doc_id long, text string")
    ph = multimodal.phash_payloads(
        multimodal.attach_image_payload(docs, width=32))
    w = Window.partitionBy("phash_hi", "phash_lo")
    out = {r["doc_id"]: r for r in ph.select(
        "doc_id", "phash_hi", "phash_lo",
        F.count(F.lit(1)).over(w).alias("n"),
        F.min("doc_id").over(w).alias("canon")).collect()}
    assert out[1]["phash_hi"] == out[2]["phash_hi"]
    assert out[1]["phash_lo"] == out[2]["phash_lo"]
    assert out[1]["n"] == 2 and out[2]["canon"] == 1
    # hashes stay in unsigned-32 range (positive in signed int64)
    for r in out.values():
        assert 0 <= r["phash_hi"] < 2**32 and 0 <= r["phash_lo"] < 2**32


def test_phash_grid_guard_and_derived_split(spark):
    import pytest
    from dht11_data_pipeline_spark.operators import multimodal
    docs = spark.createDataFrame(
        [(1, "some document body"), (2, "a different body entirely")],
        "doc_id long, text string")
    imgs = multimodal.attach_image_payload(docs, width=32)
    # > 64 cells overflows the two-halves packing: rejected up front
    with pytest.raises(ValueError):
        multimodal.phash_payloads(imgs, hash_w=9, hash_h=8)
    with pytest.raises(ValueError):
        multimodal.phash_payloads(imgs, hash_w=0, hash_h=8)
    # 16 cells: all bits land in phash_hi, lo must be 0 (no IndexError)
    out = multimodal.phash_payloads(imgs, hash_w=4, hash_h=4).collect()
    assert len(out) == 2
    for r in out:
        assert 0 <= r["phash_hi"] < 2**16 and r["phash_lo"] == 0
    # 40 cells: split straddles — hi gets 32 bits, lo the other 8
    out = multimodal.phash_payloads(imgs, hash_w=8, hash_h=5).collect()
    for r in out:
        assert 0 <= r["phash_hi"] < 2**32 and 0 <= r["phash_lo"] < 2**8


def test_phash_hamming_pairs_and_guard(spark):
    import pytest
    from dht11_data_pipeline_spark.operators.dedup import phash_hamming_pairs
    ph = spark.createDataFrame(
        [(1, 100, 200), (2, 100, 200),      # identical -> hamming 0
         (3, 100, 201),                     # 1 bit off doc 1 in lo
         (4, 0xFFFFFFFF, 0xFFFFFFFF)],      # far from everything
        "doc_id long, phash_hi long, phash_lo long")
    out = {(r["doc_a"], r["doc_b"]): r["hamming"]
           for r in phash_hamming_pairs(ph).collect()}
    assert out[(1, 2)] == 0
    assert out[(1, 3)] == 1 and out[(2, 3)] == 1
    assert not any(4 in p for p in out)
    with pytest.raises(ValueError):
        phash_hamming_pairs(ph, max_hamming=4)


def test_neighbor_jaccard_path_and_cap(spark):
    from dht11_data_pipeline_spark.operators.graph import neighbor_jaccard
    # path 1-2-3-4: (1,3) share {2}, (2,4) share {3}; 1 and 4 share none
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4)], "id_a long, id_b long")
    out = {(r["id_a"], r["id_b"]): r for r in neighbor_jaccard(pairs).collect()}
    assert set(out) == {(1, 3), (2, 4)}
    r = out[(1, 3)]
    # deg(1)=1, deg(3)=2, cn=1 -> 1e6 // 2
    assert (r["n_common"], r["deg_a"], r["deg_b"], r["jaccard_ppm"],
            r["is_edge"]) == (1, 1, 2, 500_000, "N")


def test_neighbor_jaccard_capped_equals_exact(spark, sf_dir):
    """The default hub cap is far above organic near-dup degrees, so on
    the fixture capped == uncapped — the cooccur-cap contract."""
    from dht11_data_pipeline_spark.operators import graph, similarity
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    pairs = similarity.embedding_near_duplicates_multiprobe(
        emb, threshold=0.25)
    capped = {tuple(r) for r in graph.neighbor_jaccard(
        pairs, assume_canonical=True).collect()}
    exact = {tuple(r) for r in graph.neighbor_jaccard(
        pairs, assume_canonical=True, max_center_degree=None).collect()}
    assert capped == exact and len(capped) > 0


def test_ngram_novelty_order_semantics(spark):
    from dht11_data_pipeline_spark.operators.textops import ngram_novelty
    base = "alpha beta gamma delta epsilon"
    docs = spark.createDataFrame(
        [(1, base), (2, base),                       # exact re-crawl
         (3, base + " zeta eta theta")],             # half old, half new
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in ngram_novelty(docs).collect()}
    assert out[1]["novelty_ppm"] == 1_000_000
    assert out[2]["novelty_ppm"] == 0                # all grams seen in doc 1
    # doc 3: 6 grams, 3 new ("delta epsilon zeta" onward)
    assert (out[3]["n_grams"], out[3]["n_novel"]) == (6, 3)
    assert out[3]["novelty_ppm"] == 500_000


def test_survivorship_prefers_richer_member(spark, sf_dir):
    from dht11_data_pipeline_spark.plans.ext_queries import cur_survivorship
    rows = cur_survivorship(spark, sf_dir).collect()
    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r["cluster_id"], []).append(r)
    assert len(rows) > 0
    for cid, members in by_cluster.items():
        survivors = [m for m in members if m["is_survivor"] == "Y"]
        assert len(survivors) == 1                   # exactly one per cluster
        s = survivors[0]
        best = max(members, key=lambda m: (m["n_unique_tokens"], m["n_chars"],
                                           -m["doc_id"]))
        assert (s["n_unique_tokens"], s["n_chars"]) == (
            best["n_unique_tokens"], best["n_chars"])
