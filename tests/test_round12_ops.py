"""Round-12 degenerate-input fixes (round-11 ADVICE) and the new
forensics / packing operators."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from dht11_data_pipeline_spark.operators import curation, textops


# ---------------------------------------------------------------------------
# ADVICE fixes: degenerate inputs defined identically on both engines
# ---------------------------------------------------------------------------

def test_quality_classifier_null_text_matches_oracle_semantics(spark):
    """NULL text must score like the empty document on BOTH engines:
    Spark's size(split(NULL)) is -1 with NULL score while DuckDB's is
    NULL with 0 — coalescing to '' first pins the row to
    (n_tokens=1, score=bias) identically (round-11 ADVICE)."""
    # NB "data" (bucket 51) does not collide with '' (bucket 36) —
    # "good" DOES (both bucket 36), which would be engine-consistent
    # but muddy the assertion
    w = textops.declared_weight_buckets({"data": 100})
    df = spark.createDataFrame(
        [(1, None), (2, "data")], "doc_id long, text string")
    got = {r["doc_id"]: (r["n_tokens"], r["score_sum"], r["keep_flag"])
           for r in textops.quality_classifier_score(
               df, w, threshold_milli=25).collect()}
    # the NULL row is the single-empty-token doc: 0*1000 >= 25*1 fails
    assert got[1] == (1, 0, "N")
    assert got[2] == (1, 100, "Y")
    # DuckDB twin of the same coalesce reads the row identically
    null_twin = duckdb.sql(
        "SELECT len(string_split(coalesce(NULL, ''), ' ')) AS n, "
        "0 AS s").fetchone()
    assert (null_twin[0], null_twin[1]) == (got[1][0], got[1][1])


def test_weighted_keep_on_empty_modes(spark):
    """on_empty='empty' returns an empty frame with the gate schema
    (what the SQL twin does — its FROM g, mx cross join has no left
    rows); the default still raises; all-zero weights on a NONEMPTY
    corpus raise under BOTH modes (genuinely undefined probability)."""
    empty = spark.createDataFrame([], "doc_id long, w long")
    out = curation.weighted_keep(empty, F.col("w"), on_empty="empty")
    assert out.columns == ["doc_id", "weight", "bucket", "keep_ppm",
                           "keep_flag"]
    assert out.count() == 0
    with pytest.raises(Exception, match="weighted_keep"):
        curation.weighted_keep(empty, F.col("w")).collect()
    zeros = spark.createDataFrame([(1, 0), (2, 0)], "doc_id long, w long")
    for mode in ("raise", "empty"):
        with pytest.raises(Exception, match="all weights are zero"):
            curation.weighted_keep(zeros, F.col("w"),
                                   on_empty=mode).collect()
    with pytest.raises(ValueError, match="on_empty"):
        curation.weighted_keep(empty, F.col("w"), on_empty="bogus")


def test_quality_gate_empty_kept_set_returns_empty(spark):
    """The full gate (classifier -> weighted_keep) over a corpus where
    NO document clears the threshold must return an empty set like its
    oracle, not raise (round-11 ADVICE)."""
    docs = spark.createDataFrame(
        [(1, "junk junk"), (2, "junk")], "doc_id long, text string")
    w = textops.declared_weight_buckets(textops.QUALITY_WORD_WEIGHTS_V1)
    kept = (textops.quality_classifier_score(docs, w, threshold_milli=25)
            .filter(F.col("keep_flag") == "Y")
            .select("doc_id", "score_sum"))
    out = curation.weighted_keep(kept, F.col("score_sum"),
                                 rate_ppm=500_000, on_empty="empty")
    assert out.count() == 0


def test_epoch_plan_division_compare_matches_product_form(spark):
    """The water-filling capped test rewritten as a division-compare
    must pick the identical capped set as the product form on an
    adversarial mix (ties, a dominant source, zero-token sources) —
    A*n <= R  <=>  R >= 0 and A <= R DIV n, for A >= 0, n >= 1."""
    rows = [("s%02d" % i, " ".join(["w"] * n))
            for i, n in enumerate([1, 1, 1, 3, 3, 7, 50, 400, 400, 9000])]
    df = spark.createDataFrame(rows, "source string, text string")
    got = {r["source"]: (r["alloc_tokens"], r["capped_flag"])
           for r in curation.epoch_plan(df).collect()}
    # replay the PRODUCT form in python on the same sorted order
    # (python ''.split(' ') == [''] matches Spark's split, so the
    # token counts agree by construction)
    caps = sorted(((4_000_000 * len(t.split(" "))) // 1_000_000, s)
                  for s, t in rows)
    k = len(caps)
    t_tot = sum(len(t.split(" ")) for _, t in rows)
    b = (1_500_000 * t_tot) // 1_000_000
    cum = 0
    expect = {}
    for i, (a, s) in enumerate(caps, start=1):
        capped = a * (k - i + 1) <= b - cum
        if capped:
            cum += a
        expect[s] = capped
    for s, capped in expect.items():
        assert (got[s][1] == "Y") == capped, s
    # allocation identity: sum(alloc) == min(budget, sum(caps))
    assert sum(got[s][0] for s in expect) == min(
        b, sum(a for a, _ in caps))


# ---------------------------------------------------------------------------
# contamination drill-down
# ---------------------------------------------------------------------------

def test_contamination_pairs_exact(spark):
    """Hand-checked doc pairs: two sources sharing one 2-gram through
    specific docs; a third source with no overlap never appears."""
    df = spark.createDataFrame(
        [(1, "alpha beta gamma", "s1"),
         (2, "alpha beta delta", "s2"),
         (3, "zeta eta theta", "s2"),
         (4, "iota kappa mu", "s3")],
        "doc_id long, text string, source string")
    got = textops.contamination_pairs(df, n=2, top_k=3).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["source_a"], r["source_b"], r["doc_a"], r["doc_b"],
            r["shared_grams"], r["pair_rank"]) == ("s1", "s2", 1, 2, 1, 1)


def test_contamination_pairs_topk_and_caps(spark):
    """top_k bounds per-source-pair output with deterministic
    tie-break; the doc hub cap drops grams in too many documents."""
    rows = [(i, "copy gram here", "s1") for i in range(1, 4)]
    rows += [(10 + i, "copy gram here", "s2") for i in range(1, 4)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, source string")
    # 3x3 doc pairs share both 2-grams; top_k=2 keeps the first two by
    # (shared desc, doc_a, doc_b)
    got = textops.contamination_pairs(df, n=2, top_k=2).collect()
    assert len(got) == 2
    assert [(r["doc_a"], r["doc_b"], r["pair_rank"]) for r in
            sorted(got, key=lambda r: r["pair_rank"])] == [
        (1, 11, 1), (1, 12, 2)]
    assert all(r["shared_grams"] == 2 for r in got)
    # doc cap: the same gram in >cap docs is boilerplate -> dropped
    assert textops.contamination_pairs(
        df, n=2, top_k=2, max_docs_per_gram=5).count() == 0
    with pytest.raises(ValueError, match="top_k"):
        textops.contamination_pairs(df, top_k=0)


# ---------------------------------------------------------------------------
# budget-exact packing
# ---------------------------------------------------------------------------

def test_pack_budgeted_properties(spark):
    """The packer's contract: (1) no pack exceeds the budget and every
    non-tail pack is EXACTLY the budget; (2) weight is conserved;
    (3) packing is deterministic (two runs identical)."""
    rows = [(i, "g%d" % (i % 3), 1 + (i * 7) % 40) for i in range(1, 60)]
    df = spark.createDataFrame(rows, "doc_id long, source string, w long")
    out = curation.pack_budgeted(df, weight_col="w", budget=50)
    pandas = out.toPandas()
    per_bin = pandas.groupby(["source", "bin_id"])["sym_in_bin"].sum()
    assert (per_bin <= 50).all()
    # every bin except each source's max bin is exactly full
    for src, grp in pandas.groupby("source"):
        last = grp["bin_id"].max()
        sums = grp.groupby("bin_id")["sym_in_bin"].sum()
        assert (sums[sums.index != last] == 50).all(), src
    # conservation: split slices re-sum to each doc's weight
    per_doc = pandas.groupby("doc_id")["sym_in_bin"].sum()
    for i, _, w in rows:
        assert per_doc[i] == w, i
    again = curation.pack_budgeted(df, weight_col="w", budget=50).toPandas()
    assert sorted(map(tuple, pandas.values.tolist())) == sorted(
        map(tuple, again.values.tolist()))


def test_pack_budgeted_rejects_degenerate_weights(spark):
    df = spark.createDataFrame([(1, "s", 0)],
                               "doc_id long, source string, w long")
    with pytest.raises(Exception, match="pack_budgeted"):
        curation.pack_budgeted(df, weight_col="w").collect()
    with pytest.raises(ValueError, match="budget"):
        curation.pack_budgeted(df, weight_col="w", budget=0)


def test_pack_budgeted_splits_straddling_doc(spark):
    """A doc crossing a boundary appears in every pack its span
    touches, with slice sizes matching the window overlaps."""
    df = spark.createDataFrame(
        [(1, "s", 30), (2, "s", 45), (3, "s", 120)],
        "doc_id long, source string, w long")
    got = {(r["doc_id"], r["bin_id"]): r["sym_in_bin"]
           for r in curation.pack_budgeted(df, weight_col="w",
                                           budget=50).collect()}
    # stream offsets: d1 [0,30) d2 [30,75) d3 [75,195)
    assert got == {(1, 0): 30, (2, 0): 20, (2, 1): 25,
                   (3, 1): 25, (3, 2): 50, (3, 3): 45}


# ---------------------------------------------------------------------------
# declared-profile divergence
# ---------------------------------------------------------------------------

def test_source_divergence_declared_exact(spark):
    """Hand-computed TV vs a declared profile, including the
    declared-only tail and an undeclared word's full mass."""
    ref = {"the": 500_000, "rare": 100_000}
    df = spark.createDataFrame(
        [(1, "the the other", "s1"),
         (2, "the rare", "s2")],
        "doc_id long, text string, source string")
    got = {r["source"]: (r["n_tokens"], r["vocab_size"], r["tv_ppm"])
           for r in textops.source_divergence_declared(df, ref).collect()}
    # s1: p(the)=666666 p(other)=333333; |666666-500000| + |333333-0|
    #     + (600000 - 500000) = 599999 -> DIV 2 = 299999
    assert got["s1"] == (3, 2, 299_999)
    # s2: p(the)=500000 p(rare)=500000; 0 + 400000 + (600000-600000)
    #     -> 200000
    assert got["s2"] == (2, 2, 200_000)


def test_source_divergence_declared_validation(spark):
    df = spark.createDataFrame([(1, "x", "s")],
                               "doc_id long, text string, source string")
    with pytest.raises(ValueError, match="non-empty"):
        textops.source_divergence_declared(df, {})
    with pytest.raises(ValueError, match="ppm"):
        textops.source_divergence_declared(df, {"w": -1})
    with pytest.raises(ValueError, match="sum"):
        textops.source_divergence_declared(df, {"w": 900_000,
                                                "v": 200_000})


def test_source_divergence_declared_matches_full_monitor(spark, sf_dir):
    """Fed the full monitor's OWN corpus profile as the declared
    table, the declared form reproduces the full monitor's tv_ppm
    per source — the refresh loop is closed."""
    from dht11_data_pipeline_spark.sources.tables import load_table
    docs = load_table(spark, sf_dir, "documents")
    sw = (docs.selectExpr("source", "explode(split(text, ' ')) AS word")
          .filter("word <> ''"))
    tot = sw.count()
    prof = {r["word"]: (r["c"] * 1_000_000) // tot
            for r in sw.groupBy("word")
            .agg(F.count(F.lit(1)).alias("c")).collect()}
    prof = {w: p for w, p in prof.items() if p > 0}
    full = {r["source"]: r["tv_ppm"]
            for r in textops.source_divergence(docs).collect()}
    decl = {r["source"]: r["tv_ppm"]
            for r in textops.source_divergence_declared(
                docs, prof).collect()}
    assert decl == full


# ---------------------------------------------------------------------------
# tokenizer fertility
# ---------------------------------------------------------------------------

def test_bpe_fertility_consistent_with_encode(spark):
    """Per-source fertility must be exactly the source-grouped sums of
    bpe_encode's per-doc stats (same merge chain, same integer DIV)."""
    import collections
    df = spark.createDataFrame(
        [(1, "aa aa ab", "s1"), (2, "aa b", "s2"), (3, "ab ab aa", "s1")],
        "doc_id long, text string, source string")
    enc = textops.bpe_encode(df, k=2).collect()
    fert = {r["source"]: r
            for r in textops.bpe_fertility(df, k=2).collect()}
    src = {1: "s1", 2: "s2", 3: "s1"}
    agg = collections.defaultdict(lambda: [0, 0, 0])
    for r in enc:
        a = agg[src[r["doc_id"]]]
        a[0] += r["n_tokens"]
        a[1] += r["n_symbols"]
        a[2] += r["n_chars"]
    for s, (nt, ns, nc) in agg.items():
        fr = fert[s]
        assert (fr["n_tokens"], fr["n_symbols"]) == (nt, ns), s
        assert fr["fertility_ppm"] == ns * 1_000_000 // nt, s
        assert fr["compression_ppm"] == ns * 1_000_000 // nc, s
    assert fert["s1"]["n_docs"] == 2 and fert["s2"]["n_docs"] == 1


def test_contamination_spans_exact(spark):
    """Span extraction names the literal shared grams, lexicographic,
    only for flagged pairs, capped per pair."""
    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta", "s1"),
         (2, "alpha beta gamma zeta", "s2"),
         (3, "iota kappa mu nu", "s3")],
        "doc_id long, text string, source string")
    got = textops.contamination_spans(df, n=2, top_k=3,
                                      grams_per_pair=10).collect()
    rows = sorted((r["source_a"], r["source_b"], r["doc_a"], r["doc_b"],
                   r["pair_rank"], r["gram_rank"], r["gram"]) for r in got)
    assert rows == [("s1", "s2", 1, 2, 1, 1, "alpha beta"),
                    ("s1", "s2", 1, 2, 1, 2, "beta gamma")]
    # per-pair gram cap
    capped = textops.contamination_spans(df, n=2, grams_per_pair=1)
    assert [r["gram"] for r in capped.collect()] == ["alpha beta"]
    with pytest.raises(ValueError, match="grams_per_pair"):
        textops.contamination_spans(df, grams_per_pair=0)
