"""Training-data curation operators: deterministic splits, stratified
sampling, token chunking, sequence packing, PII scrubbing.

These are the ops a 100 TB LLM-data pipeline runs after dedup and
before tokenization. Design rules:

- Determinism over randomness: every "sample" is a pure function of a
  content/id hash, so re-runs (and the DuckDB oracle) reproduce the
  exact same subset — the same idempotency-by-content discipline the
  reference's SCD2 hash gives it (Delta_detection_query_gen.py:42-44).
  No rand()/sample(): those are seed- and partitioning-dependent.
- Narrow where possible: hash_split / chunk_tokens / pii_scrub are
  per-row expressions (no shuffle, whole-stage codegen). The only
  shuffles are the per-stratum window in stratified_quota and the
  per-group running sum in pack_sequences — both key on the column
  the semantics demand.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dht11_data_pipeline_spark.functions.hashing import SEP


def _hash_bucket(col: Column, salt: str, buckets: int) -> Column:
    """Engine-portable uniform bucket: first 8 hex chars of
    sha256(salt <US> value) read as an integer, mod buckets. DuckDB
    reproduces it as ('0x' || substr(sha256(...),1,8))::BIGINT."""
    h = F.sha2(F.concat_ws(SEP, F.lit(salt), col.cast("string")), 256)
    return (F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint") % buckets)


def hash_split(df: DataFrame, id_col: str = "doc_id", salt: str = "split1",
               train_pct: int = 90, val_pct: int = 5) -> DataFrame:
    """Deterministic train/validation/test assignment by id-hash bucket.

    The standard leakage-safe split: membership depends only on the id,
    never on partitioning, row order, or a seed — so adding data later
    never moves an existing doc across splits. Narrow op, no shuffle.
    """
    bucket = _hash_bucket(F.col(id_col), salt, 100)
    split = (
        F.when(bucket < train_pct, "train")
        .when(bucket < train_pct + val_pct, "validation")
        .otherwise("test")
    )
    return df.select(
        F.col(id_col),
        bucket.cast("int").alias("bucket"),
        split.alias("split"),
    )


def weighted_keep(df: DataFrame, weight: Column, rate_ppm: int = 500_000,
                  id_col: str = "doc_id",
                  salt: str = "wkeep1",
                  on_empty: str = "raise") -> DataFrame:
    """Deterministic importance-sampling gate: keep each row with
    probability ``rate_ppm/1e6 × w/w_max`` — higher-quality documents
    survive proportionally more often, the sampling step that turns a
    DSIR-style weight column into an actual curated subset (weights
    alone don't shrink a corpus; the gate does).

    Entirely integer arithmetic, so the decision is engine-exact:
    keep iff ``bucket × w_max < rate_ppm × w`` with ``bucket`` the
    portable sha256 hash bucket in [0, 1e6) — no float probability,
    no RNG, no seed; re-runs, replays, and the SQL oracle all keep
    the identical subset, and membership depends only on (id, weight),
    never on partitioning or row order (the hash_split discipline).

    Scale: w_max is a 1-row aggregate broadcast back (the global-
    scalar rule — never a window over the corpus); everything else is
    a narrow projection. Weights must be non-negative integers;
    products stay far under 2^63 (1e6 × w_max with bigint weights of
    realistic magnitude).

    The precondition is ENFORCED, not just documented: a NULL or
    negative weight, or an all-zero corpus (w_max = 0, which would
    divide by zero), raises at run time instead of silently diverging
    from the SQL twin — Spark's ``least()`` skips NULLs and its DIV
    returns NULL on /0 where DuckDB's ``//`` throws, so degenerate
    inputs are exactly where the two engines would disagree.

    ``on_empty`` splits the EMPTY-corpus degenerate from all-zero
    (round-11 ADVICE): a SQL gate over an empty input returns an
    empty result (the ``FROM g, mx`` cross join has no left rows and
    the ``// w_max`` never evaluates), while the raise here fires
    eagerly because the broadcast w_max aggregate is built before the
    probe side is known empty — an engine-behavior divergence for
    callers whose upstream filter can legitimately keep nothing.
    ``on_empty="empty"`` lets the NULL w_max pass through, and the
    cross join with the empty left yields zero rows with the correct
    schema, exactly matching the oracle; the all-zero-on-nonempty
    raise (a genuinely undefined keep probability) fires either way.
    """
    if on_empty not in ("raise", "empty"):
        raise ValueError(f"weighted_keep: on_empty must be 'raise' or "
                         f"'empty', got {on_empty!r}")
    w_checked = (F.when(weight.isNull() | (weight.cast("bigint") < 0),
                        F.raise_error(F.format_string(
                            "weighted_keep: weight must be a "
                            "non-negative integer, got %s for id %s",
                            weight.cast("string"),
                            F.col(id_col).cast("string")))
                        .cast("bigint"))
                 .otherwise(weight.cast("bigint")))
    # isNull covers the empty corpus: F.max over zero rows is NULL and
    # `NULL <= 0` is NULL (falls to otherwise), so without the explicit
    # null test the documented empty-corpus raise would never fire.
    # Under on_empty="empty" the NULL max instead passes through: the
    # broadcast cross join against the (empty) input produces zero
    # rows, so the NULL _w_max is never consumed by DIV.
    empty_arm = (F.raise_error(F.lit(
        "weighted_keep: the corpus is empty — keep probability is "
        "undefined")).cast("bigint")
        if on_empty == "raise" else F.lit(None).cast("bigint"))
    w_max = df.agg(
        F.when(F.max(w_checked).isNull(), empty_arm)
        .when(F.max(w_checked) <= 0,
              F.raise_error(F.lit(
                  "weighted_keep: all weights are zero — keep "
                  "probability is undefined"))
              .cast("bigint"))
        .otherwise(F.max(w_checked)).alias("_w_max"))
    bucket = _hash_bucket(F.col(id_col), salt, 1_000_000)
    staged = (df.crossJoin(F.broadcast(w_max))
              .select(F.col(id_col),
                      w_checked.alias("weight"),
                      bucket.cast("bigint").alias("bucket"),
                      "_w_max"))
    return weighted_gate_projection(staged, id_col, rate_ppm)


def weighted_gate_projection(staged: DataFrame, id_col: str,
                             rate_ppm: int) -> DataFrame:
    """The weighted_keep decision itself, over a staged frame with
    columns (id, weight, bucket, _w_max) — shared by the batch
    operator (which computes ``_w_max`` as the corpus max) and the
    streaming twin (which takes it as the scorer's declared ceiling),
    so the two forms cannot drift. Integer DIV (not /): Spark DIV ==
    DuckDB ``//`` on non-negative operands, keeping the emitted ppm
    engine-exact."""
    return staged.select(
        id_col, "weight",
        F.col("bucket").cast("int").alias("bucket"),
        F.least(F.lit(1_000_000).cast("bigint"),
                F.expr(f"({rate_ppm} * weight) DIV _w_max"))
        .cast("bigint").alias("keep_ppm"),
        F.when(F.col("bucket") * F.col("_w_max")
               < F.lit(rate_ppm) * F.col("weight"), "Y")
        .otherwise("N").alias("keep_flag"))


def cluster_balanced_sample(df: DataFrame, k: int = 50,
                            budget_ppm: int = 200_000,
                            id_col: str = "vec_id",
                            vec_col: str = "embedding",
                            salt: str = "cbal1",
                            quant: int = 1000) -> DataFrame:
    """Embedding-space mixture balancing: assign every vector to its
    nearest of k deterministic prototype centroids, then gate each
    cluster at a rate inversely proportional to its size — so the kept
    corpus contributes (approximately) EQUALLY from every semantic
    cluster instead of letting the dominant topic swamp the training
    mix. This is the standard "balance the mix across clusters"
    curation stage: k-means-style assignment × the weighted_keep
    integer-hash gate, composed.

    Exactness chain (every step engine-portable, so a SQL oracle
    replays the identical subset):
      prototypes : ``select_centroids`` — k vectors first in
                   multiplicative-hash order (O(k) collect, constant)
      assignment : ``assign_clusters_exact`` — int64-quantized L2
                   argmin, tie → lowest centroid id (never float)
      gate       : keep iff bucket(id) < keep_ppm_c where
                   keep_ppm_c = min(1e6, (budget_ppm·N) DIV (k_used·n_c))
                   — expected kept per cluster ≈ N·budget/1e6/k_used,
                   uniform across clusters, capped at n_c for clusters
                   smaller than their quota.

    All-integer arithmetic: bucket < 1e6, budget_ppm·N ≤ 1e6·N stays
    inside int64 up to N ~ 9e12 rows; DIV == DuckDB ``//`` on the
    non-negative operands.

    Scale: the assignment's Arrow pass is localCheckpointed so its two
    consumers (the k-row sizes aggregate and the final probe side) do
    not re-execute the Python stage (Python stages re-run per consumer
    otherwise); sizes ≤ k rows and the totals row are broadcast — no
    corpus-wide shuffle anywhere after the checkpoint write.

    Returns (id, cluster_id, n_in_cluster, keep_ppm, keep_flag).
    """
    from dht11_data_pipeline_spark.operators.kmeans import (
        assign_clusters_exact, select_centroids)

    if not 0 <= budget_ppm <= 1_000_000:
        raise ValueError("budget_ppm must be in [0, 1e6]")
    cents = select_centroids(df, k, id_col, vec_col)
    assigned = assign_clusters_exact(df, cents, id_col, vec_col,
                                     quant).localCheckpoint(eager=True)
    sizes = (assigned.groupBy("cluster_id")
             .agg(F.count(F.lit(1)).cast("bigint").alias("n_in_cluster")))
    tot = sizes.agg(F.sum("n_in_cluster").cast("bigint").alias("_n"),
                    F.count(F.lit(1)).cast("bigint").alias("_k_used"))
    quotas = (sizes.crossJoin(F.broadcast(tot))
              .select("cluster_id", "n_in_cluster",
                      F.least(
                          F.lit(1_000_000).cast("bigint"),
                          F.expr(f"({budget_ppm} * _n) "
                                 "DIV (_k_used * n_in_cluster)"))
                      .cast("bigint").alias("keep_ppm")))
    bucket = _hash_bucket(F.col(id_col), salt, 1_000_000)
    return (assigned.join(F.broadcast(quotas), "cluster_id")
            .select(id_col, "cluster_id", "n_in_cluster", "keep_ppm",
                    F.when(bucket < F.col("keep_ppm"), "Y")
                    .otherwise("N").alias("keep_flag")))


def _exact_isqrt(n: Column) -> Column:
    """floor(sqrt(n)) made engine-exact: the double-precision candidate
    is within ±1 of the true integer root for any bigint n, so one
    Newton-style correction pins it — no reliance on two engines'
    sqrt/floor rounding agreeing at perfect-square boundaries. Mirrored
    verbatim in the DuckDB oracle (plans/ext_oracles)."""
    c = F.floor(F.sqrt(n.cast("double"))).cast("bigint")
    return (F.when((c + 1) * (c + 1) <= n, c + 1)
            .when(c * c > n, c - 1)
            .otherwise(c))


def source_temperature_sample(df: DataFrame, group_col: str = "source",
                              tau: int = 2, rate_ppm: int = 500_000,
                              id_col: str = "doc_id",
                              salt: str = "stemp1") -> DataFrame:
    """Per-source temperature mixing: down-weight large sources so the
    kept corpus is τ-temperature-flattened across domains — the
    standard training-mix stage alongside cluster balancing
    (cluster_balanced_sample) and DSIR resampling. With per-source
    sizes n_g, temperature sampling keeps source g at a rate
    ∝ n_g^(1/τ − 1), so expected kept counts go as n_g^(1/τ): τ=1 is
    the natural mix, τ=2 the classic sqrt-flattening (multilingual
    pretraining's default), τ=0 (sentinel for τ→∞) the uniform mix —
    every source contributes the same expected count.

    Integer-exact so the SQL oracle replays the identical subset:
    rates are anchored at the SMALLEST source (which keeps at the full
    ``rate_ppm``) and scaled down by exact integer arithmetic —
      τ=1: keep_ppm_g = rate_ppm
      τ=2: keep_ppm_g = (rate_ppm · isqrt(min_n)) DIV isqrt(n_g)
      τ=0: keep_ppm_g = (rate_ppm · min_n) DIV n_g
    with isqrt the Newton-corrected exact floor sqrt (_exact_isqrt) —
    no float pow, whose last-ulp rounding the two engines need not
    share. Overflow-safe: isqrt ≤ 1e6 for n ≤ 1e12, so the τ=2 product
    ≤ 1e12; the τ=0 product rate_ppm·min_n ≤ 1e6·n stays inside int64
    to ~9e12 rows per source.

    Scale: ONE shuffle builds the per-source sizes (map-side partials,
    #sources rows out); min_n is a window over that tiny frame (single
    lineage — never agg-and-join-back, which would re-scan the corpus);
    the rates broadcast back onto the docs. The gate itself is the
    weighted_keep hash discipline: keep iff bucket(id) < keep_ppm_g,
    so membership depends only on (id, source sizes) — replay- and
    partitioning-independent.

    Returns (id, group, n_docs, keep_ppm, keep_flag).
    """
    if tau not in (0, 1, 2):
        raise ValueError(
            f"source_temperature_sample: tau must be 0 (uniform mix), "
            f"1 (natural mix) or 2 (sqrt flattening) — fractional "
            f"powers are not engine-exact; got {tau}")
    if not 0 <= rate_ppm <= 1_000_000:
        raise ValueError("rate_ppm must be in [0, 1e6]")
    sizes = df.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    # global scalar as a window over the aggregated (tiny) frame
    all_rows = Window.rowsBetween(Window.unboundedPreceding,
                                  Window.unboundedFollowing)
    sizes = sizes.withColumn("_min_n", F.min("n_docs").over(all_rows))
    if tau == 1:
        keep = F.lit(rate_ppm).cast("bigint")
    elif tau == 2:
        sizes = (sizes
                 .withColumn("_isq_min", _exact_isqrt(F.col("_min_n")))
                 .withColumn("_isq_g", _exact_isqrt(F.col("n_docs"))))
        keep = F.expr(f"({rate_ppm} * _isq_min) DIV _isq_g")
    else:  # tau == 0: uniform expected count per source
        keep = F.expr(f"({rate_ppm} * _min_n) DIV n_docs")
    rates = sizes.select(
        group_col, "n_docs",
        F.least(F.lit(1_000_000).cast("bigint"), keep)
        .cast("bigint").alias("keep_ppm"))
    bucket = _hash_bucket(F.col(id_col), salt, 1_000_000)
    return (df.join(F.broadcast(rates), group_col)
            .select(id_col, group_col, "n_docs", "keep_ppm",
                    F.when(bucket < F.col("keep_ppm"), "Y")
                    .otherwise("N").alias("keep_flag")))


def epoch_plan(df: DataFrame, budget_ppm: int = 1_500_000,
               max_epochs_ppm: int = 4_000_000,
               group_col: str = "source",
               text_col: str = "text") -> DataFrame:
    """Data-constrained epoch planning: how many EPOCHS of each source
    to train on under a global token budget, when small high-value
    sources may be repeated but only up to a cap (the "repeat data up
    to ~4 epochs, then reallocate" recipe from data-constrained LM
    scaling). The target mix is UNIFORM per source — every source gets
    an equal slice of the budget — but a source can absorb at most
    ``max_epochs_ppm`` epochs of itself; surplus from capped (small)
    sources water-fills into the uncapped (large) ones.

    Exact integer water-filling, so the SQL oracle replays the plan
    bit-for-bit: with A_g = (max_epochs_ppm · T_g) DIV 1e6 the
    absorption cap and B = (budget_ppm · ΣT_g) DIV 1e6 the budget,
    sources sorted by (A_g, g) ascending are capped while
    A_g · (k − i + 1) ≤ B − cumA_{i−1} (the capped set is provably a
    prefix of that order); the uncapped then split the remainder
    exactly — floor share each, +1 token to the first ``rem`` in the
    same order, so Σ alloc == min(B, ΣA) to the token. epochs_ppm_g =
    (alloc_g · 1e6) DIV T_g ≤ max_epochs_ppm by construction.

    Overflow envelope (enforced, not just documented): every REMAINING
    product is ppm × token-count, so the corpus token sum must satisfy
    ΣT ≤ (2^63−1) / max(budget_ppm, max_epochs_ppm, 1e6) — ≈2.3e12
    tokens at the defaults. Beyond it the plan raises at runtime
    instead of wrapping silently under non-ANSI Spark (DuckDB errors
    on overflow, so the wrap would be exactly oracle-invisible). The
    one product whose safety did NOT follow directly from that guard —
    the water-filling test's absorb_cap × remaining-source-count
    (round-11 ADVICE) — was in fact bounded by a subtler argument
    (ascending sort ⇒ A_i·(k−i+1) ≤ Σ_suffix A ≤ ppm·ΣT/1e6), but a
    bound that takes a proof is a bound that breaks under maintenance:
    it is rewritten as a division-compare so the product is never
    formed at all and the envelope needs no source-count term.

    Scale: ONE shuffle (per-source token sums, map-side partials);
    everything after runs on the #sources-row frame — the window sorts
    and prefix sums are over that tiny frame, never the corpus (the
    global-scalar discipline). Returns one row per source:
    (group, n_docs, tokens, absorb_cap, alloc_tokens, epochs_ppm,
    capped_flag).

    The budget unit here is whitespace TOKENS (the corpus aggregate
    this operator computes itself). To plan in any other cost unit —
    e.g. tokenizer SYMBOLS corrected by per-source fertility, the
    round-13 fertility→budget closure — aggregate the per-source
    sizes yourself and call ``epoch_plan_from_sizes``, the
    unit-agnostic core this function delegates to.
    """
    from dht11_data_pipeline_spark.functions.text import token_count

    sizes = df.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(token_count(text_col)).cast("bigint").alias("tokens"))
    return epoch_plan_from_sizes(sizes, budget_ppm=budget_ppm,
                                 max_epochs_ppm=max_epochs_ppm,
                                 group_col=group_col)


def epoch_plan_from_sizes(sizes: DataFrame,
                          budget_ppm: int = 1_500_000,
                          max_epochs_ppm: int = 4_000_000,
                          group_col: str = "source") -> DataFrame:
    """Unit-agnostic core of ``epoch_plan``: exact integer
    water-filling over a pre-aggregated per-source sizes frame
    (``group_col``, n_docs, tokens) where ``tokens`` is ANY
    non-negative integer cost unit — whitespace tokens (what
    ``epoch_plan`` feeds it), tokenizer symbols (the fertility-aware
    plan: ``bpe_fertility``'s n_symbols makes the budget respect that
    an over-segmented source costs more symbols per word), bytes,
    compute estimates. All semantics, the overflow envelope and the
    conservation invariant Σ alloc == min(B, ΣA) are documented on
    ``epoch_plan``; they hold per unit since nothing below ever mixes
    units. The frame is #sources-sized — every window below is over
    that tiny frame, never a corpus.
    """
    if budget_ppm < 0:
        raise ValueError("budget_ppm must be non-negative")
    if max_epochs_ppm <= 0:
        raise ValueError("max_epochs_ppm must be positive")
    # int64-overflow envelope, ENFORCED not just documented: every
    # product in the plan is (ppm factor) × (token count) with the
    # token count bounded by the corpus sum ΣT — budget_ppm·ΣT for the
    # budget, max_epochs_ppm·T_g for the caps, alloc·1e6 ≤
    # max(budget_ppm, max_epochs_ppm)·ΣT for epochs_ppm. Under
    # non-ANSI Spark these wrap silently (DuckDB would error, so the
    # drift appears exactly where the oracle can't run); guard ΣT at
    # runtime via the _b arm below. At defaults (max_epochs_ppm=4e6)
    # the bound is ΣT ≤ ~2.3e12 tokens — INSIDE the 100 TB envelope,
    # which is why this is a loud raise and not a docstring note;
    # callers at that scale should plan per-shard or rescale units.
    _ppm_factor = max(budget_ppm, max_epochs_ppm, 1_000_000)
    _safe_token_sum = (2**63 - 1) // _ppm_factor

    def _guarded(count_col: str, product_sql: str) -> Column:
        # CaseWhen evaluates branches lazily, so putting the raise in
        # the when-arm means the otherwise-product only ever runs on
        # in-bound counts: under ANSI Spark this named error wins over
        # the generic ARITHMETIC_OVERFLOW, and under non-ANSI it turns
        # the silent wrap into a loud failure.
        return (F.when(
            F.col(count_col) > F.lit(_safe_token_sum),
            F.raise_error(F.format_string(
                "epoch_plan: token count %s exceeds the int64-safe "
                f"bound {_safe_token_sum} for ppm factor {_ppm_factor} "
                "— the budget/cap/epoch products would overflow; "
                "rescale token units or lower the ppm parameters",
                F.col(count_col).cast("string"))).cast("bigint"))
            .otherwise(F.expr(product_sql)))

    sizes = sizes.withColumn(
        "absorb_cap",
        _guarded("tokens", f"({max_epochs_ppm} * tokens) DIV 1000000"))
    all_rows = Window.rowsBetween(Window.unboundedPreceding,
                                  Window.unboundedFollowing)
    order = Window.orderBy("absorb_cap", group_col)
    prefix = order.rowsBetween(Window.unboundedPreceding, -1)
    s = (sizes
         .withColumn("_t_tot", F.sum("tokens").over(all_rows))
         .withColumn("_k", F.count(F.lit(1)).over(all_rows))
         .withColumn("_i", F.row_number().over(order))
         .withColumn("_cum_a",
                     F.coalesce(F.sum("absorb_cap").over(prefix),
                                F.lit(0).cast("bigint")))
         .withColumn("_b", _guarded(
             "_t_tot", f"({budget_ppm} * _t_tot) DIV 1000000"))
         # the water-filling test is A·(k−i+1) ≤ B−cum_a, but the
         # PRODUCT form can wrap when the source COUNT is large even
         # with every token product in-bound (round-11 ADVICE: absorb_
         # cap reaches ~2^63/1e6 near the ΣT envelope, so ~1e6 sources
         # overflow it). Division-compare instead: for A ≥ 0, n ≥ 1,
         # A·n ≤ R ⟺ R ≥ 0 ∧ A ≤ R DIV n (Spark DIV == floor on the
         # non-negative remainder) — no product is ever formed, so no
         # source count can wrap it; the oracle mirrors the same form.
         .withColumn("capped",
                     (F.col("_b") >= F.col("_cum_a"))
                     & (F.col("absorb_cap")
                        <= F.expr("(_b - _cum_a) DIV (_k - _i + 1)"))))
    # remainder pool: budget minus everything the capped prefix absorbs
    caps = (s.withColumn("_cap_a",
                         F.sum(F.when(F.col("capped"), F.col("absorb_cap"))
                               .otherwise(0)).over(all_rows))
            .withColumn("_n_cap",
                        F.sum(F.when(F.col("capped"), 1).otherwise(0))
                        .over(all_rows)))
    n_uncap = F.col("_k") - F.col("_n_cap")
    # Correctness notes (both provable from the sorted order):
    # (1) the capped set is a PREFIX — if i is uncapped then any j > i
    #     has A_j ≥ A_i, so A_j·(k−j+1) ≥ A_i·(k−j+1) > remaining
    #     budget after j−1 and the condition stays false;
    # (2) for every uncapped source, share + 1 ≤ absorb_cap (the first
    #     uncapped m has A_m·n_uncap > pool ⇒ share = pool DIV n_uncap
    #     < A_m, and later uncapped caps only grow) — so the +1
    #     remainder spread can never overshoot a cap, and
    #     Σ alloc == min(B, ΣA) holds to the token.
    share = F.when(n_uncap > 0,
                   F.expr("(_b - _cap_a) DIV (_k - _n_cap)")) \
        .otherwise(F.lit(0).cast("bigint"))
    rem = F.when(n_uncap > 0,
                 F.expr("(_b - _cap_a) % (_k - _n_cap)")) \
        .otherwise(F.lit(0).cast("bigint"))
    # rank among the uncapped, in the same (absorb_cap, group) order
    uncap_rank = F.sum(F.when(~F.col("capped"), 1).otherwise(0)).over(
        Window.orderBy("absorb_cap", group_col)
        .rowsBetween(Window.unboundedPreceding, 0))
    alloc = F.when(F.col("capped"), F.col("absorb_cap")).otherwise(
        share + F.when(uncap_rank <= rem, 1).otherwise(0))
    out = caps.withColumn("alloc_tokens", alloc.cast("bigint"))
    return out.select(
        group_col, "n_docs", "tokens", "absorb_cap", "alloc_tokens",
        F.when(F.col("tokens") > 0,
               F.expr("(alloc_tokens * 1000000) DIV tokens"))
        .otherwise(F.lit(0)).cast("bigint").alias("epochs_ppm"),
        F.when(F.col("capped"), "Y").otherwise("N").alias("capped_flag"))


def stratified_quota(df: DataFrame, strata: list[str], k: int,
                     id_col: str = "doc_id",
                     salt: str = "quota1") -> DataFrame:
    """Keep at most ``k`` rows per stratum, chosen by deterministic
    hash order (uniform within the stratum, stable across runs).

    One shuffle on the strata columns. Rank-within-group is inherently
    a per-stratum ordering; the hash sort key means the winners are a
    uniform sample, not "first k by id". At scale a hot stratum ranks
    on one reducer — if strata are few and huge, pre-filter with a
    hash-threshold pass (keep hash < k/count quantile) to cut the
    sorted volume; semantics here are the exact-quota version.
    """
    rank_key = F.substring(
        F.sha2(F.concat_ws(SEP, F.lit(salt), F.col(id_col).cast("string")), 256),
        1, 16)
    w = Window.partitionBy(*strata).orderBy(rank_key, F.col(id_col))
    return (
        df.select(id_col, *strata, rank_key.alias("rank_key"))
        .withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= k)
        .select(id_col, *strata, F.col("sample_rank").cast("int").alias("sample_rank"))
    )


def reservoir_salted(df: DataFrame, group_col: str = "source", k: int = 100,
                     id_col: str = "doc_id", salt: str = "res1",
                     n_salts: int = 16) -> DataFrame:
    """Deterministic per-group uniform sample of ``k`` rows — the
    hot-group-safe two-phase physical plan for stratified_quota's
    semantics (A-Res reservoir with a content hash as the priority).

    Phase 1 ranks within (group, hash-salt) sub-strata, so ``n_salts``
    reducers share one giant group's sort and each keeps only its local
    top-k; phase 2 ranks the ≤ n_salts*k survivors per group. The global
    top-k per group is always contained in the union of per-sub-stratum
    top-k, so output is bit-identical to the single-window form — the
    oracle is the plain ROW_NUMBER() query. At 100 TB the first window
    sees |group|/n_salts rows per task and the second sees O(k·n_salts).
    """
    rank_key = F.substring(
        F.sha2(F.concat_ws(SEP, F.lit(salt), F.col(id_col).cast("string")), 256),
        1, 16)
    sub = _hash_bucket(F.col(id_col), salt + "~sub", n_salts)
    w1 = Window.partitionBy(group_col, "sub").orderBy("rank_key", id_col)
    w2 = Window.partitionBy(group_col).orderBy("rank_key", id_col)
    return (
        df.select(group_col, id_col, rank_key.alias("rank_key"),
                  sub.alias("sub"))
        .withColumn("r1", F.row_number().over(w1))
        .filter(F.col("r1") <= k)
        .withColumn("sample_rank", F.row_number().over(w2))
        .filter(F.col("sample_rank") <= k)
        .select(group_col, id_col,
                F.col("sample_rank").cast("int").alias("sample_rank"))
    )


def chunk_tokens(df: DataFrame, chunk_size: int = 32, stride: int = 24,
                 text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Split each document's token stream into fixed-size overlapping
    chunks (context-window preparation). Chunk i covers tokens
    [i*stride, i*stride + chunk_size); the final chunk may be short.

    Pure narrow fan-out: split → sequence of starts → posexplode of
    pre-sliced arrays. No shuffle, no Python. Emits a content hash per
    chunk (not the text) so downstream exact-dedup of chunks is a
    groupBy on a 16-char key.
    """
    toks = F.split(F.col(text_col), " ")
    starts = F.sequence(F.lit(0), F.size(toks) - 1, F.lit(stride))
    chunks = F.transform(starts, lambda s: F.slice(toks, s + 1, chunk_size))
    return (
        df.select(F.col(id_col), F.posexplode(chunks).alias("chunk_idx", "chunk"))
        .select(
            F.col(id_col),
            F.col("chunk_idx").cast("int").alias("chunk_idx"),
            F.size("chunk").cast("int").alias("n_chunk_tokens"),
            F.substring(F.sha2(F.concat_ws(" ", F.col("chunk")), 256), 1, 16)
            .alias("chunk_hash"),
        )
    )


def pack_sequences(df: DataFrame, budget: int = 256,
                   group_col: str = "source", text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """Sequential sequence-packing: concatenate documents in id order
    within each group and cut at every ``budget`` tokens; a document
    lands in the bin where its first token falls.

    This is the concat-then-split packing LLM trainers use (docs are
    not reordered — locality within a shard is preserved). One shuffle
    on the group column; each group packs independently, which is
    exactly how shard-parallel packing runs at 100 TB (no global
    coordination). Bin boundaries are deterministic in (group, id).

    Skew note (r12 verdict watch item): the per-group window is one
    task per GROUP — fine for many comparable sources, serialized on
    a single giant one. The standard fix preserves these exact
    boundaries: pre-shard the giant group into deterministic id
    ranges (e.g. ``doc_id DIV shard_span``), window per (group,
    shard) to get shard-local cum-sums, then add each shard's total
    offset (a tiny #shards-row prefix frame, the ``epoch_plan``
    global-scalar discipline) before cutting bins — same arithmetic,
    parallelism = #shards. Applies identically to ``pack_budgeted``.
    """
    n_tokens = F.size(F.split(F.col(text_col), " "))
    w = (Window.partitionBy(group_col).orderBy(id_col)
         .rowsBetween(Window.unboundedPreceding, -1))
    cum_before = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return (
        df.select(group_col, id_col, n_tokens.alias("n_tokens"))
        .withColumn("bin_id", F.floor(cum_before / budget).cast("int"))
        .select(group_col, id_col, F.col("n_tokens").cast("int").alias("n_tokens"),
                "bin_id")
    )


def pack_budgeted(df: DataFrame, weight_col: str = "n_symbols",
                  budget: int = 256, group_col: str = "source",
                  id_col: str = "doc_id") -> DataFrame:
    """Budget-EXACT concat-then-split packing: within each group,
    documents concatenate in id order into one weight stream, and
    packs are consecutive ``budget``-sized windows of that stream — a
    document whose span crosses a boundary is SPLIT across the packs
    it touches, so every pack except each group's last holds exactly
    ``budget`` units and none ever exceeds it (the invariant
    ``pack_sequences`` deliberately trades away — there a doc lands
    wholly in its first token's bin, so bins can overflow; here the
    training-batch shape is guaranteed). This is the packing an LLM
    trainer actually materializes once a tokenizer fixes the unit:
    weight = ``bpe_encode``'s n_symbols closes the loop tokenizer →
    budget → packed sequences (round-11 verdict item 6).

    Shape: one window cum-sum per group (partitioned — never a global
    window), then a NARROW per-row explode of the ceil(w/budget)+1
    packs each doc can touch; zero joins, zero collects. Boundaries
    are deterministic in (group, id) alone, so replays and backfills
    cut identical packs — which makes unique (group, id) a hard
    PRECONDITION: with duplicate ids the cum-sum order among the
    duplicates is engine-nondeterministic and pack boundaries could
    silently differ between runs (round-12 ADVICE item 2). Enforced
    with an engine-side raise: a lag over the same sort detects
    adjacent equal ids at zero extra shuffle (duplicates are adjacent
    in the window order by construction). Weights must be >= 1 (a
    zero-weight doc has no span to place) — enforced with an
    engine-side raise, since a negative weight would silently corrupt
    every later boundary in its group.

    Returns one row per (pack, document-slice):
    (group, bin_id, id, <weight_col>, sym_in_bin) where sym_in_bin is
    the portion of the doc's weight landing in that pack; per-pack
    sums = budget except the group tail (pinned by property test).
    """
    if budget < 1:
        raise ValueError(f"pack_budgeted: budget must be >= 1, got {budget}")
    wt = (F.when(F.col(weight_col).isNull()
                 | (F.col(weight_col).cast("bigint") < 1),
                 F.raise_error(F.format_string(
                     "pack_budgeted: weight must be a positive integer, "
                     "got %s for id %s",
                     F.col(weight_col).cast("string"),
                     F.col(id_col).cast("string"))).cast("bigint"))
          .otherwise(F.col(weight_col).cast("bigint")))
    win = (Window.partitionBy(group_col).orderBy(id_col)
           .rowsBetween(Window.unboundedPreceding, -1))
    # duplicate-(group, id) guard: lag over the SAME partition+order
    # (one sort serves both window functions), equal adjacent ids ⇒
    # raise. Folded into _start (+0 on the clean path) so column
    # pruning can never drop the check; NULL lag (first row) compares
    # to null → otherwise-branch → 0.
    ordw = Window.partitionBy(group_col).orderBy(id_col)
    dup_guard = (F.when(
        F.lag(F.col(id_col)).over(ordw) == F.col(id_col),
        F.raise_error(F.format_string(
            "pack_budgeted: duplicate id %s in group %s — pack "
            "boundaries would be nondeterministic; deduplicate or "
            "re-key the input",
            F.col(id_col).cast("string"),
            F.col(group_col).cast("string"))).cast("bigint"))
        .otherwise(F.lit(0).cast("bigint")))
    staged = (df.select(group_col, id_col, wt.alias("_w"))
              .withColumn("_start",
                          F.coalesce(F.sum("_w").over(win),
                                     F.lit(0).cast("bigint"))
                          + dup_guard))
    bins = F.sequence(F.expr(f"_start DIV {int(budget)}"),
                      F.expr(f"(_start + _w - 1) DIV {int(budget)}"))
    b = F.col("bin_id")
    return (staged.select(group_col, id_col, "_w", "_start",
                          F.explode(bins).alias("bin_id"))
            .select(group_col,
                    b.cast("int").alias("bin_id"),
                    id_col,
                    F.col("_w").alias(weight_col),
                    (F.least((b + 1) * budget, F.col("_start") + F.col("_w"))
                     - F.greatest(b * budget, F.col("_start")))
                    .cast("bigint").alias("sym_in_bin")))


# PII patterns kept RE2-compatible (no backrefs/lookaround) so the
# DuckDB oracle runs the identical regexes.
_PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\+?\d[\d() .-]{7,}\d",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}


def pii_scrub(df: DataFrame, text_col: str = "text",
              id_col: str = "doc_id") -> DataFrame:
    """Redact emails / phone numbers / IPv4 addresses with typed
    placeholder tokens; report per-kind match counts and the scrubbed
    content hash. Narrow regexp pass, whole-stage codegen."""
    scrubbed = F.col(text_col)
    counts = []
    for kind, pat in _PII_PATTERNS.items():
        counts.append(
            F.size(F.regexp_extract_all(F.col(text_col), F.lit(pat), F.lit(0)))
            .cast("int").alias(f"n_{kind}"))
        scrubbed = F.regexp_replace(scrubbed, pat, f"<{kind.upper()}>")
    return df.select(
        F.col(id_col), *counts,
        F.sha2(scrubbed, 256).alias("scrubbed_hash"),
    )


def dup_aware_sample(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id",
                     salt: str = "dupsample1") -> DataFrame:
    """Duplication-aware sampling: each doc keeps with probability
    1/|its exact-duplicate cluster|, so every distinct CONTENT
    contributes one expected copy to the sample regardless of how many
    times it was crawled (the down-weight-don't-drop alternative to
    hard dedup). Deterministic: the keep decision is a content+id hash
    against the cluster-size threshold, so re-runs and the SQL oracle
    reproduce the same subset.

    One shuffle: the content-hash window that sizes each cluster.
    The hash bucket is uniform in [0, 1e6); keep iff bucket * size <
    1e6 — integer arithmetic, exactly probability 1/size for sizes
    that divide 1e6 and within 1ppm otherwise."""
    h = F.sha2(F.col(text_col), 256)
    w = Window.partitionBy(h)
    bucket = _hash_bucket(F.col(id_col), salt, 1000000)
    return df.select(
        F.col(id_col),
        F.count(F.lit(1)).over(w).cast("int").alias("cluster_size"),
        bucket.cast("int").alias("bucket"),
        F.when(bucket * F.count(F.lit(1)).over(w) < 1000000, "Y")
        .otherwise("N").alias("keep_flag"),
    )
