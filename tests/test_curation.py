"""Unit tests for the training-data curation operators."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from dht11_data_pipeline_spark.operators import curation, dedup


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_hash_split_deterministic_and_exhaustive(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = curation.hash_split(docs)
    counts = {r["split"]: r["n"] for r in
              a.groupBy("split").agg(F.count("*").alias("n")).collect()}
    n = docs.count()
    assert sum(counts.values()) == n
    # 90/5/5 within loose tolerance at ~1k docs
    assert counts["train"] / n > 0.8
    assert 0 < counts.get("validation", 0) < 0.15 * n
    assert 0 < counts.get("test", 0) < 0.15 * n
    # per-row determinism: re-run matches exactly
    b = curation.hash_split(docs)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_hash_split_membership_independent_of_other_rows(spark, sf_dir):
    """Adding/removing rows never moves an existing doc across splits —
    the leakage-safety property seeds/sampling cannot give."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    full = {r["doc_id"]: r["split"] for r in curation.hash_split(docs).collect()}
    half = docs.filter(F.col("doc_id") % 2 == 0)
    for r in curation.hash_split(half).collect():
        assert full[r["doc_id"]] == r["split"]


def test_stratified_quota_caps_and_uniformity(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = curation.stratified_quota(docs, ["lang", "source"], k=5)
    per = out.groupBy("lang", "source").agg(F.count("*").alias("n"),
                                            F.max("sample_rank").alias("mx"))
    for r in per.collect():
        assert r["n"] <= 5 and r["mx"] <= 5
    # strata smaller than k keep everything
    sizes = {(r["lang"], r["source"]): r["n"] for r in
             docs.groupBy("lang", "source").agg(F.count("*").alias("n")).collect()}
    kept = {(r["lang"], r["source"]): r["n"] for r in per.collect()}
    for key, total in sizes.items():
        assert kept.get(key, 0) == min(total, 5)


def test_chunk_tokens_cover_and_overlap(spark):
    text = " ".join(f"t{i}" for i in range(50))
    df = _docs(spark, [(1, text, "s")])
    out = curation.chunk_tokens(df, chunk_size=32, stride=24).collect()
    # starts at 0 and 24 and 48 (48 <= 49 so a third short chunk exists)
    assert [r["chunk_idx"] for r in out] == [0, 1, 2]
    assert [r["n_chunk_tokens"] for r in out] == [32, 26, 2]
    # chunk hash is the sha256 prefix of the space-joined slice
    toks = text.split(" ")
    first = " ".join(toks[0:32])
    assert out[0]["chunk_hash"] == hashlib.sha256(first.encode()).hexdigest()[:16]


def test_pack_sequences_bins_are_sequential_prefix_sums(spark):
    rows = [(i, " ".join(["w"] * 100), "s") for i in range(10)]
    df = _docs(spark, rows)
    out = {r["doc_id"]: r for r in
           curation.pack_sequences(df, budget=256, group_col="source").collect()}
    # doc i starts at 100*i tokens -> bin floor(100*i/256)
    for i in range(10):
        assert out[i]["bin_id"] == (100 * i) // 256
        assert out[i]["n_tokens"] == 100


def test_pii_scrub_counts_and_hash(spark):
    df = _docs(spark, [
        (1, "mail me at bob@example.com or +1 (555) 123-4567 now", "s"),
        (2, "server 10.0.0.1 and 192.168.1.255 up", "s"),
        (3, "clean text only", "s"),
    ])
    out = {r["doc_id"]: r for r in curation.pii_scrub(df).collect()}
    assert out[1]["n_email"] == 1 and out[1]["n_phone"] == 1
    assert out[2]["n_ipv4"] == 2 and out[2]["n_email"] == 0
    assert out[3]["n_email"] == out[3]["n_phone"] == out[3]["n_ipv4"] == 0
    expected = hashlib.sha256(
        "mail me at <EMAIL> or <PHONE> now".encode()).hexdigest()
    assert out[1]["scrubbed_hash"] == expected
    # clean doc passes through byte-identical
    assert out[3]["scrubbed_hash"] == hashlib.sha256(b"clean text only").hexdigest()


def test_dedup_cascade_verdicts(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    near = "alpha beta gamma delta epsilon zeta eta theta iota lambda"
    df = _docs(spark, [
        (1, base, "s"),
        (2, base, "s"),          # exact dup of 1
        (3, near, "s"),          # near dup of 1 (high shingle overlap)
        (4, "completely different words entirely here now", "s"),
    ])
    out = {r["doc_id"]: (r["reason"], r["keep_flag"]) for r in
           dedup.cascade_keep_decision(df, threshold=0.5).collect()}
    assert out[1] == ("kept", "Y")
    assert out[2] == ("exact_dup", "N")
    assert out[3] == ("near_dup", "N")
    assert out[4] == ("kept", "Y")


def test_chunk_tokens_property_full_coverage(spark):
    """Property (hypothesis-driven dims): for any doc length, every
    token position is covered by >=1 chunk, chunk starts advance by
    exactly `stride`, and every chunk's length is exactly
    min(chunk_size, n_tokens - start)."""
    from hypothesis import given, settings, strategies as st

    @given(n_tokens=st.integers(min_value=1, max_value=200),
           chunk_size=st.integers(min_value=2, max_value=50),
           stride_frac=st.floats(min_value=0.3, max_value=1.0))
    @settings(max_examples=12, deadline=None)
    def check(n_tokens, chunk_size, stride_frac):
        stride = max(1, int(chunk_size * stride_frac))
        text = " ".join(f"t{i}" for i in range(n_tokens))
        df = _docs(spark, [(1, text, "s")])
        rows = sorted(
            curation.chunk_tokens(df, chunk_size=chunk_size, stride=stride)
            .collect(), key=lambda r: r["chunk_idx"])
        starts = [r["chunk_idx"] * stride for r in rows]
        assert starts[0] == 0 and all(
            b - a == stride for a, b in zip(starts, starts[1:]))
        covered = set()
        for r, s in zip(rows, starts):
            assert r["n_chunk_tokens"] == min(chunk_size, n_tokens - s)
            covered.update(range(s, s + r["n_chunk_tokens"]))
        assert covered == set(range(n_tokens))

    check()


def test_reservoir_salted_matches_single_window(spark, sf_dir):
    """The two-phase salted plan must be bit-identical to the plain
    one-window hash-ordered top-k (containment argument in the
    docstring) — for several k and salt-count settings."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    from pyspark.sql.window import Window
    from dht11_data_pipeline_spark.functions.hashing import SEP

    for k, n_salts in ((5, 4), (100, 16), (1, 2)):
        two = curation.reservoir_salted(docs, group_col="source", k=k,
                                        n_salts=n_salts)
        rank_key = F.substring(
            F.sha2(F.concat_ws(SEP, F.lit("res1"),
                               F.col("doc_id").cast("string")), 256), 1, 16)
        w = Window.partitionBy("source").orderBy(rank_key, F.col("doc_id"))
        one = (docs.select("source", "doc_id")
               .withColumn("sample_rank", F.row_number().over(w).cast("int"))
               .filter(F.col("sample_rank") <= k))
        assert two.exceptAll(one).count() == 0
        assert one.exceptAll(two).count() == 0


def test_reservoir_salted_quota_and_determinism(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = curation.reservoir_salted(docs, group_col="source", k=10)
    per = out.groupBy("source").agg(F.count("*").alias("n"),
                                    F.max("sample_rank").alias("mx")).collect()
    for r in per:
        assert r["n"] <= 10 and r["mx"] == r["n"]  # dense ranks 1..n
    again = curation.reservoir_salted(docs, group_col="source", k=10)
    assert out.exceptAll(again).count() == 0


def test_dsir_weights_target_scores_higher(spark, sf_dir):
    """Importance scoring must separate the target slice: the mean
    score of lang='en' docs exceeds the corpus mean, and every score
    is a valid ppm in [0, 1e6]."""
    from dht11_data_pipeline_spark.operators import textops

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    w = textops.dsir_weights(docs, target_col="lang", target_value="en")
    joined = w.join(docs.select("doc_id", "lang"), "doc_id")
    rows = joined.filter(F.col("n_bigrams") > 0).groupBy(
        (F.col("lang") == "en").alias("is_en")
    ).agg(F.avg("score_ppm").alias("avg_score")).collect()
    scores = {r["is_en"]: r["avg_score"] for r in rows}
    assert scores[True] > scores[False]
    bad = w.filter((F.col("score_ppm") < 0) | (F.col("score_ppm") > 1000000))
    assert bad.count() == 0


def test_prototype_prune_flags_bottom_decile(spark, sf_dir):
    from dht11_data_pipeline_spark.operators import similarity

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = similarity.prototype_prune(emb, prune_pct=10)
    assert out.count() == emb.count()
    per = out.groupBy("label").agg(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("keep_flag") == "Y", 1).otherwise(0)).alias("kept"),
    ).collect()
    for r in per:
        assert r["kept"] == (r["n"] * 90) // 100
    # the most prototypical row in each label is always kept
    top = out.filter(F.col("rank") == 1)
    assert top.filter(F.col("keep_flag") == "N").count() == 0


def test_dup_aware_sample_expected_one_copy(spark):
    """Clusters of size n keep each member with probability 1/n: for a
    size-1 cluster the member always survives; keep decisions are
    deterministic and cluster sizes exact."""
    rows = [(i, "unique text %d" % i, "s") for i in range(10)]
    rows += [(100 + i, "same text", "s") for i in range(5)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r["doc_id"]: r for r in curation.dup_aware_sample(docs).collect()}
    for i in range(10):
        assert out[i]["cluster_size"] == 1 and out[i]["keep_flag"] == "Y"
    assert all(out[100 + i]["cluster_size"] == 5 for i in range(5))
    again = {r["doc_id"]: r["keep_flag"]
             for r in curation.dup_aware_sample(docs).collect()}
    assert again == {k: v["keep_flag"] for k, v in out.items()}


def test_cluster_balanced_sample_properties(spark, sf_dir):
    """The balanced gate equalizes expected per-cluster contribution:
    quota arithmetic, flag/threshold agreement, determinism, and the
    exact-assignment invariants (every vector assigned, clusters within
    the seeded prototype ids)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = curation.cluster_balanced_sample(emb, k=20, budget_ppm=400_000)
    rows = out.collect()
    n = emb.count()
    assert len(rows) == n  # every vector got exactly one gate row

    from dht11_data_pipeline_spark.operators.kmeans import select_centroids
    seed_ids = {cid for cid, _ in select_centroids(emb, 20)}
    assert {r["cluster_id"] for r in rows} <= seed_ids

    sizes = {}
    for r in rows:
        sizes.setdefault(r["cluster_id"], set()).add(
            (r["n_in_cluster"], r["keep_ppm"]))
    k_used = len(sizes)
    for cid, consts in sizes.items():
        assert len(consts) == 1  # size and quota constant per cluster
        n_c, ppm = next(iter(consts))
        assert ppm == min(1_000_000, (400_000 * n) // (k_used * n_c))
    assert sum(next(iter(c))[0] for c in sizes.values()) == n

    # determinism: identical subset on a re-run
    again = {r[0]: r[4] for r in
             curation.cluster_balanced_sample(
                 emb, k=20, budget_ppm=400_000).collect()}
    assert again == {r[0]: r[4] for r in rows}


def test_cluster_balanced_sample_rejects_bad_budget(spark):
    import pytest

    emb = spark.createDataFrame(
        [(1, [0.1, 0.2]), (2, [0.3, 0.4])],
        "vec_id long, embedding array<float>")
    with pytest.raises(ValueError, match="budget_ppm"):
        curation.cluster_balanced_sample(emb, k=1, budget_ppm=2_000_000)


def test_assign_clusters_exact_integer_ties(spark):
    """Quantized-L2 argmin matches a hand computation, including the
    tie rule (equal distance -> lowest centroid id)."""
    from dht11_data_pipeline_spark.operators.kmeans import (
        assign_clusters_exact)

    corpus = spark.createDataFrame(
        [(10, [0.0005, 0.0]),   # quantizes to [0,0]: tie between both
         (11, [1.0, 1.0]),      # clearly nearest centroid 7
         (12, [-1.0, -1.0])],   # clearly nearest centroid 3
        "vec_id long, embedding array<float>")
    cents = [(7, [1.0, 1.0]), (3, [-1.0, -1.0])]
    got = {r["vec_id"]: r["cluster_id"]
           for r in assign_clusters_exact(corpus, cents).collect()}
    assert got == {10: 3, 11: 7, 12: 3}


def test_weighted_keep_raises_on_empty_corpus(spark):
    """F.max over zero rows is NULL and NULL <= 0 is NULL, so the
    empty-corpus raise needs the explicit isNull arm (ADVICE r9) —
    without it the operator silently returned an empty frame while
    its docstring promised a loud failure."""
    from dht11_data_pipeline_spark.operators.curation import weighted_keep

    df = spark.createDataFrame([], "doc_id bigint, w bigint")
    with pytest.raises(Exception, match="weighted_keep"):
        weighted_keep(df, F.col("w")).collect()


def test_source_temperature_rates_and_anchoring(spark, sf_dir):
    """τ=2: smallest source keeps at the full rate; larger sources are
    scaled by exact isqrt ratio; τ=0 equalizes expected counts; τ=1 is
    the natural mix. Rates must be reproducible from the per-source
    sizes by pure integer arithmetic."""
    import math

    from dht11_data_pipeline_spark.operators.curation import (
        source_temperature_sample)
    from dht11_data_pipeline_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    sizes = {r["source"]: r["n"] for r in
             docs.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
             .collect()}
    min_n = min(sizes.values())

    out = source_temperature_sample(docs, tau=2, rate_ppm=500_000)
    rows = out.collect()
    assert len(rows) == sum(sizes.values())  # per-doc frame, no drops
    got = {(r["source"], r["n_docs"], r["keep_ppm"]) for r in rows}
    want = {(g, n, min(10**6, (500_000 * math.isqrt(min_n))
                       // math.isqrt(n))) for g, n in sizes.items()}
    assert got == want
    # the smallest source keeps at the full rate
    small = min(sizes, key=sizes.get)
    assert {r["keep_ppm"] for r in rows if r["source"] == small} \
        == {500_000}

    # determinism: membership is a pure function of (id, sizes)
    again = source_temperature_sample(docs, tau=2, rate_ppm=500_000)
    assert {tuple(r) for r in again.collect()} == {tuple(r) for r in rows}

    # τ=0: expected kept counts equalized — keep_ppm * n_docs within
    # one rounding step of rate * min_n for every source
    uni = {(r["source"], r["keep_ppm"], r["n_docs"])
           for r in source_temperature_sample(docs, tau=0).collect()}
    for _, ppm, n in uni:
        assert 0 <= 500_000 * min_n - ppm * n < n
    # τ=1: natural mix — every source at the base rate
    nat = source_temperature_sample(docs, tau=1)
    assert {r["keep_ppm"] for r in nat.collect()} == {500_000}

    with pytest.raises(ValueError, match="tau"):
        source_temperature_sample(docs, tau=3)


def test_exact_isqrt_boundaries(spark):
    """Perfect squares and their neighbours — exactly where a pure
    floor(sqrt(double)) can round across the integer boundary."""
    import math

    from dht11_data_pipeline_spark.operators.curation import _exact_isqrt

    vals = []
    for k in (1, 2, 3, 10, 1000, 10**6, 10**9):
        vals += [k * k - 1, k * k, k * k + 1]
    vals += [0, 10**12, 10**15, 4 * 10**18]
    df = spark.createDataFrame([(v,) for v in vals], "n bigint")
    got = {r["n"]: r["s"] for r in
           df.select("n", _exact_isqrt(F.col("n")).alias("s")).collect()}
    assert got == {v: math.isqrt(v) for v in vals}


def _epoch_plan_reference(tokens_by_src, budget_ppm, max_epochs_ppm):
    """Pure-Python water-filling twin of curation.epoch_plan."""
    caps = {g: (max_epochs_ppm * t) // 10**6
            for g, t in tokens_by_src.items()}
    t_tot = sum(tokens_by_src.values())
    b = (budget_ppm * t_tot) // 10**6
    order = sorted(caps, key=lambda g: (caps[g], g))
    k = len(order)
    alloc, cum, capped = {}, 0, set()
    for i, g in enumerate(order, start=1):
        if caps[g] * (k - i + 1) <= b - cum:
            capped.add(g)
        cum += caps[g]
    cap_a = sum(caps[g] for g in capped)
    uncapped = [g for g in order if g not in capped]
    if uncapped:
        share, rem = divmod(b - cap_a, len(uncapped))
        for j, g in enumerate(uncapped, start=1):
            alloc[g] = share + (1 if j <= rem else 0)
    for g in capped:
        alloc[g] = caps[g]
    return {g: (tokens_by_src[g], caps[g], alloc[g],
                (alloc[g] * 10**6) // tokens_by_src[g]
                if tokens_by_src[g] else 0,
                "Y" if g in capped else "N")
            for g in tokens_by_src}


def test_epoch_plan_matches_reference_and_invariants(spark, sf_dir):
    from dht11_data_pipeline_spark.operators.curation import epoch_plan
    from dht11_data_pipeline_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    tokens_by_src = {r["source"]: r["t"] for r in
                     docs.groupBy("source")
                     .agg(F.sum(F.size(F.split("text", " "))).alias("t"))
                     .collect()}
    for budget_ppm, cap_ppm in ((1_500_000, 4_000_000),
                                (500_000, 2_000_000),
                                (10_000_000, 4_000_000),  # all capped
                                (0, 1_000_000)):
        got = {r["source"]: (r["tokens"], r["absorb_cap"],
                             r["alloc_tokens"], r["epochs_ppm"],
                             r["capped_flag"])
               for r in epoch_plan(docs, budget_ppm, cap_ppm).collect()}
        want = _epoch_plan_reference(tokens_by_src, budget_ppm, cap_ppm)
        assert got == want, (budget_ppm, cap_ppm)
        # invariants: sum(alloc) == min(budget, sum(caps)); cap respected
        t_tot = sum(tokens_by_src.values())
        b = (budget_ppm * t_tot) // 10**6
        caps_sum = sum(v[1] for v in want.values())
        assert sum(v[2] for v in got.values()) == min(b, caps_sum)
        for _, cap, alloc, ep, _fl in got.values():
            assert alloc <= cap and ep <= cap_ppm


def test_epoch_plan_water_filling_property(spark):
    """Hypothesis sweep over synthetic skewed source mixes: Spark plan
    == pure-Python reference on every draw, budget exactly exhausted
    (or all sources capped)."""
    from hypothesis import given, settings, strategies as st

    from dht11_data_pipeline_spark.operators.curation import epoch_plan

    @given(sizes=st.lists(st.integers(min_value=1, max_value=400),
                          min_size=1, max_size=8),
           budget=st.integers(min_value=0, max_value=8_000_000),
           cap=st.integers(min_value=100_000, max_value=6_000_000))
    @settings(max_examples=8, deadline=None)
    def check(sizes, budget, cap):
        rows = []
        doc_id = 0
        for s_i, n_toks in enumerate(sizes):
            # one doc per source with exactly n_toks tokens
            rows.append((doc_id, " ".join(["w"] * n_toks), f"s{s_i}"))
            doc_id += 1
        df = _docs(spark, rows)
        got = {r["source"]: (r["tokens"], r["absorb_cap"],
                             r["alloc_tokens"], r["epochs_ppm"],
                             r["capped_flag"])
               for r in epoch_plan(df, budget, cap).collect()}
        want = _epoch_plan_reference(
            {f"s{i}": t for i, t in enumerate(sizes)}, budget, cap)
        assert got == want

    check()

def test_epoch_plan_overflow_guard_raises(spark):
    """The ppm × token-sum products wrap int64 silently under non-ANSI
    Spark once ΣT exceeds (2^63−1)/max(ppm factors) — and DuckDB errors
    on overflow, so the wrap would surface exactly where the oracle
    can't run. The bound is ENFORCED: a corpus past it raises at
    runtime instead of returning wrapped allocations (ADVICE r10). A
    huge max_epochs_ppm shrinks the bound to ~1 token so a 4-token
    corpus trips it without materializing 2.3e12 real tokens."""
    from dht11_data_pipeline_spark.operators.curation import epoch_plan

    df = _docs(spark, [(1, "a b c d", "s0"), (2, "e f", "s1")])
    with pytest.raises(Exception, match="int64-safe"):
        epoch_plan(df, budget_ppm=1_000_000, max_epochs_ppm=2**62).collect()
    # same corpus, sane knobs: inside the bound, plans fine
    assert epoch_plan(df, 1_500_000, 4_000_000).count() == 2
