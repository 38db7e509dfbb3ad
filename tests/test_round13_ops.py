"""Round-13 additions: the one-pass contamination drill-down
(shared ``contamination_index``), positional span extraction, and the
supporting invariants the round-12 verdict asked to pin."""

from __future__ import annotations

from pyspark.sql import functions as F

from dht11_data_pipeline_spark.operators import textops

SF0001 = "/root/testdata/sf0.001"


def _plan(df) -> str:
    """Optimized logical plan as text — parquet sources show up as
    `Relation ... parquet`, a localCheckpointed frame as LogicalRDD,
    so counting 'parquet' counts corpus scans."""
    return df._jdf.queryExecution().optimizedPlan().toString()


def _docs(spark):
    return spark.read.parquet(f"{SF0001}/documents.parquet")


# ---------------------------------------------------------------------------
# one-pass drill-down (round-12 verdict item 4)
# ---------------------------------------------------------------------------

def test_drilldown_shares_one_corpus_scan(spark):
    """A user running the natural matrix→pairs→spans sequence used to
    pay three corpus shingle scans; with a pre-built index the ONLY
    corpus scan is the index build — each consumer's plan must read
    the pinned index (LogicalRDD), never the parquet source."""
    docs = _docs(spark)
    index = textops.contamination_index(docs)
    # the index build itself is the one corpus scan (already executed
    # by its localCheckpoint); every consumer plan below is parquet-free
    for consumer in (
            textops.contamination_matrix(docs, index=index),
            textops.contamination_pairs(docs, index=index),
            textops.contamination_spans(docs, index=index)):
        assert "parquet" not in _plan(consumer).lower(), (
            "drill-down consumer re-scanned the corpus despite being "
            "handed the shared index")


def test_pos_spans_rescan_is_flagged_docs_only(spark):
    """contamination_pos_spans is the documented exception: positions
    were dropped at the index's first shuffle, so it re-reads the
    corpus once — but that re-read is broadcast-filtered to the
    flagged docs and PINNED (it feeds both match-join sides), so the
    returned plan must consume only checkpointed frames: zero parquet
    scans left downstream."""
    docs = _docs(spark)
    index = textops.contamination_index(docs)
    out = textops.contamination_pos_spans(docs, index=index)
    plan = _plan(out).lower()
    assert plan.count("parquet") == 0, (
        f"unpinned corpus re-read leaked into the final plan:\n{plan}")


def test_index_and_standalone_paths_agree(spark):
    """Handing the shared index to each level must not change a single
    row vs the standalone path (the refactor's hash-stability claim,
    checked at the row level here and by the 3-SF diffcheck mirrors)."""
    docs = _docs(spark)
    index = textops.contamination_index(docs)
    for with_idx, solo in (
            (textops.contamination_matrix(docs, index=index),
             textops.contamination_matrix(docs)),
            (textops.contamination_pairs(docs, index=index),
             textops.contamination_pairs(docs)),
            (textops.contamination_spans(docs, index=index),
             textops.contamination_spans(docs))):
        a = {tuple(r) for r in with_idx.collect()}
        b = {tuple(r) for r in solo.collect()}
        assert a == b


# ---------------------------------------------------------------------------
# positional span extraction (round-12 verdict item 3)
# ---------------------------------------------------------------------------

def test_pos_spans_extracts_known_copied_run(spark):
    """A planted 8-token copy between two sources must come back as
    one maximal run with exact 1-based offsets: 8 tokens = 2
    consecutive 7-grams, starting at token 3 of doc 1 and token 2 of
    doc 2."""
    copy = "c1 c2 c3 c4 c5 c6 c7 c8"
    df = spark.createDataFrame(
        [(1, "A", f"x1 x2 {copy} y1"),
         (2, "B", f"z1 {copy} w1 w2")],
        "doc_id long, source string, text string")
    rows = textops.contamination_pos_spans(df).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.source_a, r.source_b, r.doc_a, r.doc_b) == ("A", "B", 1, 2)
    assert (r.start_a, r.start_b) == (3, 2)
    assert r.run_tokens == 8
    assert (r.pair_rank, r.run_rank) == (1, 1)


def test_pos_spans_splits_runs_at_gaps(spark):
    """Two copied stretches separated by divergent text must surface
    as two runs, ranked longest-first."""
    long_copy = "a1 a2 a3 a4 a5 a6 a7 a8 a9"   # 9 tokens → 3 grams
    short_copy = "b1 b2 b3 b4 b5 b6 b7"        # 7 tokens → 1 gram
    df = spark.createDataFrame(
        [(1, "A", f"{long_copy} gapA {short_copy}"),
         (2, "B", f"{long_copy} gapB {short_copy} tail")],
        "doc_id long, source string, text string")
    rows = {r.run_rank: r for r in
            textops.contamination_pos_spans(df).collect()}
    assert set(rows) == {1, 2}
    assert rows[1].run_tokens == 9 and rows[1].start_a == 1
    assert rows[2].run_tokens == 7 and rows[2].start_a == 11
    assert rows[2].start_b == 11


def test_pos_spans_uses_raw_grams_for_runs(spark):
    """Run extraction deliberately ignores the doc cap once a pair is
    flagged: a gram shared by MANY docs (boilerplate inside the copied
    span) must not split the run. Here the middle gram also appears in
    60 other single-source docs — over MAX_DOCS_PER_GRAM — yet the
    run comes back whole."""
    copy = "c1 c2 c3 c4 c5 c6 c7 c8 c9"  # 3 grams; middle = c2..c8
    filler = [(100 + i, "C", "c2 c3 c4 c5 c6 c7 c8")
              for i in range(60)]
    df = spark.createDataFrame(
        [(1, "A", copy), (2, "B", copy)] + filler,
        "doc_id long, source string, text string")
    rows = textops.contamination_pos_spans(df).collect()
    ab = [r for r in rows if r.source_a == "A" and r.source_b == "B"]
    assert len(ab) == 1
    assert ab[0].run_tokens == 9


# ---------------------------------------------------------------------------
# broadcast-scalar vocab totals (round-12 verdict item 6)
# ---------------------------------------------------------------------------

def test_source_divergence_has_no_unpartitioned_window(spark):
    """The corpus-total scalars must be 1-row broadcast crossJoins,
    never whole-frame windows: an unpartitioned window funnels the
    entire vocabulary through one task at scale. The only windows
    left in the plan are the per-source ones (partitioned)."""
    docs = _docs(spark)
    out = textops.source_divergence(docs)
    plan = _plan(out)
    for line in plan.splitlines():
        if "windowspecdefinition(" in line.lower():
            # every window spec must carry at least one partition expr:
            # an unpartitioned spec renders windowspecdefinition(ROWS..
            # / windowspecdefinition(word#...  only with the ORDER part
            assert "windowspecdefinition(specifiedwindowframe" \
                not in line.lower().replace(" ", ""), (
                    f"unpartitioned window in plan line: {line}")
    got = {tuple(r) for r in out.collect()}
    # and the broadcast-scalar rewrite is value-identical to the
    # windowed form it replaced (the 3-SF diffcheck mirrors pin the
    # oracle equivalence; this pins self-consistency on live data)
    assert len(got) > 1


# ---------------------------------------------------------------------------
# fertility-aware epoch planning (round-12 verdict item 7)
# ---------------------------------------------------------------------------

def test_epoch_plan_from_sizes_conserves_symbol_budget(spark):
    """The unit-agnostic water-filling core must conserve the budget
    to the unit: Σ alloc == min(B, ΣA) with B = budget_ppm·ΣT DIV 1e6
    and A_g = max_epochs_ppm·T_g DIV 1e6 — checked in SYMBOL units on
    a skewed synthetic sizes frame (tiny sources capped, surplus
    water-filled) and per-source alloc never exceeding its cap."""
    from dht11_data_pipeline_spark.operators import curation

    sizes = spark.createDataFrame(
        [("tiny", 3, 40), ("small", 9, 700), ("mid", 50, 9_000),
         ("big", 400, 250_000), ("huge", 2_000, 4_000_000)],
        "source string, n_docs long, tokens long")
    budget_ppm, cap_ppm = 1_500_000, 4_000_000
    rows = curation.epoch_plan_from_sizes(
        sizes, budget_ppm=budget_ppm, max_epochs_ppm=cap_ppm).collect()
    t_sum = sum(r.tokens for r in rows)
    b = budget_ppm * t_sum // 1_000_000
    a_sum = sum(cap_ppm * r.tokens // 1_000_000 for r in rows)
    assert sum(r.alloc_tokens for r in rows) == min(b, a_sum)
    for r in rows:
        assert r.alloc_tokens <= cap_ppm * r.tokens // 1_000_000
        assert r.epochs_ppm <= cap_ppm
    assert any(r.capped_flag == "Y" for r in rows)
    assert any(r.capped_flag == "N" for r in rows)


def test_fertility_plan_budget_conserved_on_corpus(spark):
    """End-to-end fertility→budget closure on real data: the registry
    composition (bpe_fertility sizes → epoch_plan_from_sizes) must
    conserve the SYMBOL budget exactly, and its symbol totals must be
    bpe_fertility's own."""
    from dht11_data_pipeline_spark.operators import curation

    docs = _docs(spark)
    fert = {r.source: r.n_symbols
            for r in textops.bpe_fertility(docs, k=6).collect()}
    sizes = (textops.bpe_fertility(docs, k=6)
             .select("source", "n_docs",
                     F.col("n_symbols").alias("tokens")))
    rows = curation.epoch_plan_from_sizes(sizes).collect()
    assert {r.source: r.tokens for r in rows} == fert
    t_sum = sum(fert.values())
    b = 1_500_000 * t_sum // 1_000_000
    a_sum = sum(4_000_000 * t // 1_000_000 for t in fert.values())
    assert sum(r.alloc_tokens for r in rows) == min(b, a_sum)


def test_pack_budgeted_rejects_duplicate_ids(spark):
    """Duplicate (group, id) makes pack boundaries engine-
    nondeterministic (the cum-sum order among duplicates is
    unspecified) — round-12 ADVICE: the precondition is now enforced,
    not documented-only. Clean inputs still pack identically."""
    import pytest
    from dht11_data_pipeline_spark.operators import curation

    dup = spark.createDataFrame(
        [("s", 1, 10), ("s", 1, 20), ("s", 2, 30)],
        "source string, doc_id long, n_symbols long")
    with pytest.raises(Exception, match="duplicate id"):
        curation.pack_budgeted(dup, budget=16).collect()
    clean = spark.createDataFrame(
        [("s", 1, 10), ("s", 2, 20), ("t", 1, 30)],
        "source string, doc_id long, n_symbols long")
    rows = curation.pack_budgeted(clean, budget=16).collect()
    assert sum(r.sym_in_bin for r in rows) == 60


# ---------------------------------------------------------------------------
# surgical span cut (drill-down completion: matrix→pairs→spans→gate→cut)
# ---------------------------------------------------------------------------

def _cut_corpus(spark):
    copy = "c1 c2 c3 c4 c5 c6 c7 c8"
    return spark.createDataFrame(
        [(1, "A", f"x1 x2 {copy} y1"),
         (2, "B", f"z1 {copy} w1 w2")],
        "doc_id long, source string, text string"), copy


def test_contamination_cut_default_policy_cuts_later_source(spark):
    """With no protected sources, the lexicographically later source
    (B) pays: doc 2 loses exactly the 8 copied tokens, doc 1 passes
    through verbatim."""
    df, copy = _cut_corpus(spark)
    rows = {r.doc_id: r for r in
            textops.contamination_cut(df).collect()}
    assert rows[1].n_removed == 0
    assert rows[1].clean_text == f"x1 x2 {copy} y1"
    assert rows[2].n_removed == 8
    assert rows[2].clean_text == "z1 w1 w2"
    assert rows[2].n_tokens == 11


def test_contamination_cut_protected_reverses_victim(spark):
    """Declaring B protected (it is the benchmark) flips the cut onto
    A's doc; protecting BOTH keeps every span (config error surfaced
    by zero removals, not silent mutilation)."""
    df, copy = _cut_corpus(spark)
    rows = {r.doc_id: r for r in
            textops.contamination_cut(df, protected=["B"]).collect()}
    assert rows[2].n_removed == 0
    assert rows[1].n_removed == 8
    assert rows[1].clean_text == "x1 x2 y1"
    both = {r.doc_id: r for r in textops.contamination_cut(
        df, protected=["A", "B"]).collect()}
    assert both[1].n_removed == 0 and both[2].n_removed == 0


def test_contamination_cut_fully_cut_doc_yields_empty_text(spark):
    """A doc that IS the copied span comes back with clean_text = ''
    and n_removed = n_tokens."""
    copy = "c1 c2 c3 c4 c5 c6 c7"
    df = spark.createDataFrame(
        [(1, "A", f"pre {copy} post"),
         (2, "B", copy)],
        "doc_id long, source string, text string")
    rows = {r.doc_id: r for r in
            textops.contamination_cut(df).collect()}
    assert rows[2].clean_text == "" and rows[2].n_removed == 7
    assert rows[1].n_removed == 0
