"""Similarity search over embedding columns (array<float>).

Two paths:
- brute-force cosine top-k: queries × corpus cross join — exact,
  O(Q·N). Right answer for small Q (the reranker / eval path). The
  corpus side streams; only Q rows broadcast.
- LSH-bucketed ANN: random-hyperplane signs → bucket id; candidates =
  same-bucket rows; top-k within candidates. Sub-linear scan at scale:
  the bucket join shuffles on the bucket id; with p planes, expected
  bucket population is N/2^p. Planes are deterministic ±1 literals
  (functions/vectors.make_planes) so results are engine-reproducible.

Embedding near-duplicate detection (dedup tier 5) = brute-force pairs
with cosine ≥ threshold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dht11_data_pipeline_spark.functions.vectors import (
    dot, hyperplane_sign_bits, make_planes, norm,
)
from dht11_data_pipeline_spark.functions.partitioning import right_size


def cosine_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
                id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact top-k neighbors per query vector (excluding self).

    Similarity is rounded to 4 decimals *for the ranking* so that
    cross-engine float jitter can't reorder near-ties; rank ties break
    on neighbor id — fully deterministic output.

    Norms are projected ON EACH SIDE before the pair join (r13): a
    row's norm does not depend on the pair, so evaluating
    ``cosine(qv, cv)`` per pair paid 3 interpreted array folds per
    candidate where one (the dot) suffices — the O(Q·N) stage now does
    1/3 the vector math, and the emitted double is the IDENTICAL
    expression ``dot/(norm_q · norm_c)`` in the identical order, so
    results are bit-for-bit unchanged (oracle-verified at 3 SFs).
    """
    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).alias("qv"),
                       norm(F.col(vec_col)).alias("_qn"))
    c = right_size(corpus).select(F.col(id_col).alias("neighbor_id"),
                                  F.col(vec_col).alias("cv"),
                                  norm(F.col(vec_col)).alias("_cn"))
    scored = (
        F.broadcast(q).crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("sim", F.round(
            dot(F.col("qv"), F.col("cv"))
            / (F.col("_qn") * F.col("_cn")), 4))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "sim", "rank")
    )


def hard_negative_topk(corpus: DataFrame, queries: DataFrame, k: int = 3,
                       id_col: str = "vec_id", vec_col: str = "embedding",
                       label_col: str = "label") -> DataFrame:
    """Hard-negative mining for contrastive training: per query, the
    top-k most-similar vectors with a DIFFERENT label — the examples a
    retrieval/embedding model learns the most from (near the query in
    embedding space, but semantically wrong).

    Same determinism contract as ``cosine_topk`` (similarity rounded to
    4 decimals for ranking, ties on neighbor id); the label exclusion
    is null-safe (``NOT (a <=> b)`` ≡ SQL ``IS DISTINCT FROM``), so a
    NULL-labelled row is a valid negative for every labelled query.

    Scale: identical to the brute top-k path — queries broadcast, the
    corpus side streams; swap in the LSH/IVF candidate generator when
    Q grows past broadcast size.
    """
    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).alias("qv"),
                       F.col(label_col).alias("q_label"),
                       norm(F.col(vec_col)).alias("_qn"))
    c = right_size(corpus).select(F.col(id_col).alias("neighbor_id"),
                                  F.col(vec_col).alias("cv"),
                                  F.col(label_col).alias("n_label"),
                                  norm(F.col(vec_col)).alias("_cn"))
    scored = (
        F.broadcast(q).crossJoin(c)
        .filter((F.col("query_id") != F.col("neighbor_id"))
                & ~F.col("q_label").eqNullSafe(F.col("n_label")))
        # side-projected norms (see cosine_topk): identical expression,
        # 1/3 the per-pair array folds
        .withColumn("sim", F.round(
            dot(F.col("qv"), F.col("cv"))
            / (F.col("_qn") * F.col("_cn")), 4))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(),
                                               F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "n_label", "sim", "rank")
    )


def knn_label_audit(corpus: DataFrame, queries: DataFrame, k: int = 5,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    label_col: str = "label") -> DataFrame:
    """Mislabeled-example detection: predict each query's label by
    MAJORITY VOTE of its k nearest neighbors (exact cosine top-k), and
    surface the disagreements — the standard dataset-QA sweep before a
    classifier train (a doc whose neighborhood consistently out-votes
    its label is a labeling error or a genuinely hard boundary case).

    Deterministic end-to-end: the top-k inherits cosine_topk's
    rounded-sim/id-tiebreak contract, and a vote tie elects the
    SMALLEST label. Output per query: (query_id, true_label,
    predicted_label, votes, label_match).

    Scale: neighbor labels come from the corpus frame, which streams —
    the Q·k top-k frame is the broadcast side of the label join; the
    vote/argmax windows partition by query_id (never global).
    """
    topk = cosine_topk(corpus, queries, k, id_col, vec_col)
    nb_labels = right_size(corpus).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(label_col).alias("n_label"))
    votes = (F.broadcast(topk).join(nb_labels, "neighbor_id")
             .groupBy("query_id", "n_label")
             .agg(F.count(F.lit(1)).cast("bigint").alias("votes")))
    w = Window.partitionBy("query_id").orderBy(F.col("votes").desc(),
                                               F.col("n_label").asc())
    pred = (votes.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1))
    truth = queries.select(F.col(id_col).alias("query_id"),
                           F.col(label_col).alias("true_label"))
    return (pred.join(F.broadcast(truth), "query_id")
            .select("query_id", "true_label",
                    F.col("n_label").alias("predicted_label"), "votes",
                    (F.col("true_label") == F.col("n_label"))
                    .alias("label_match")))


def semantic_contamination(corpus: DataFrame, probes: DataFrame,
                           threshold: float = 0.4,
                           id_col: str = "vec_id",
                           vec_col: str = "embedding") -> DataFrame:
    """EMBEDDING-space eval decontamination: drop any training vector
    whose cosine to ANY eval probe reaches ``threshold`` — the
    semantic sibling of the n-gram ``curation.decontaminate`` (an eval
    answer paraphrased into different words escapes n-gram overlap but
    not its embedding neighborhood).

    Per corpus row: (id, n_hits, max_sim, verdict keep|drop), with the
    cosine rounded to 4 decimals before both the threshold test and
    the max (the cosine_topk determinism contract), so the verdicts
    hash-match across engines.

    Scale: eval sets are small by nature (10³–10⁵ rows) — the probe
    side broadcasts and the corpus streams through one narrow
    O(N·Q) scoring pass; the per-doc aggregate combines map-side
    (each corpus row's Q scores sit in one partition). If Q ever
    outgrows broadcast, swap the probe side into the multiprobe-LSH
    candidate generator (embedding_near_duplicates) and aggregate the
    verified pairs the same way.
    """
    p = probes.select(F.col(id_col).alias("probe_id"),
                      F.col(vec_col).alias("pv"),
                      norm(F.col(vec_col)).alias("_pn"))
    c = right_size(corpus).select(F.col(id_col), F.col(vec_col).alias("cv"),
                                  norm(F.col(vec_col)).alias("_cn"))
    # side-projected norms (see cosine_topk): identical expression,
    # 1/3 the per-pair array folds in the O(N·Q) scoring pass
    scored = (c.crossJoin(F.broadcast(p))
              .select(id_col,
                      F.round(dot(F.col("cv"), F.col("pv"))
                              / (F.col("_cn") * F.col("_pn")), 4)
                      .alias("sim")))
    hit = F.when(F.col("sim") >= threshold, 1).otherwise(0)
    return (scored.groupBy(id_col)
            .agg(F.sum(hit).cast("bigint").alias("n_hits"),
                 F.max("sim").alias("max_sim"))
            .select(id_col, "n_hits", "max_sim",
                    F.when(F.col("n_hits") > 0, "drop")
                    .otherwise("keep").alias("verdict")))


def lsh_ann_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
                 n_planes: int = 4, dim: int = 64,
                 id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Approximate top-k: only candidates in the query's LSH bucket are
    scored. Recall is tunable via n_planes (fewer planes → bigger
    buckets → higher recall, more compute)."""
    planes = make_planes(n_planes, dim)
    c = right_size(corpus).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"),
        hyperplane_sign_bits(F.col(vec_col), planes).alias("bucket"),
        norm(F.col(vec_col)).alias("_cn"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"),
        hyperplane_sign_bits(F.col(vec_col), planes).alias("bucket"),
        norm(F.col(vec_col)).alias("_qn"),
    )
    # side-projected norms (see cosine_topk): identical expression,
    # 1/3 the per-candidate array folds
    scored = (
        q.join(c, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("sim", F.round(
            dot(F.col("qv"), F.col("cv"))
            / (F.col("_qn") * F.col("_cn")), 4))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "bucket", "neighbor_id", "sim", "rank")
    )


def _normalized(corpus: DataFrame, id_col: str, vec_col: str,
                out_id: str, out_vec: str) -> DataFrame:
    """Pre-normalize once per row so the pair loop is a single dot
    product instead of dot + two norms (3× less array work — the pair
    stage is the O(N²) part, the normalize pass is O(N)).

    The divisor rides an ``array_repeat`` (r13): the previous
    ``transform(_v, x -> x / _n)`` form let CollapseProject inline the
    norm AGGREGATE into the per-element lambda, where the interpreted
    HOF path re-evaluates it for EVERY element — an O(d²)-per-row trap
    (measured 20.8 s/1M rows at d=64 vs 0.7 s for this form).
    ``array_repeat``'s argument is a plain row-level expression, so the
    norm computes once per row however the optimizer collapses the
    projections; the per-element division (same operands, same order)
    is bit-identical."""
    with_norm = right_size(corpus).select(
        F.col(id_col).alias(out_id), F.col(vec_col).alias("_v"),
        norm(F.col(vec_col)).alias("_n"),
    )
    return with_norm.select(
        out_id,
        F.zip_with("_v", F.array_repeat(F.col("_n"), F.size("_v")),
                   lambda x, n: x.cast("double") / n).alias(out_vec),
    )


def embedding_near_duplicates(corpus: DataFrame, threshold: float = 0.95,
                              id_col: str = "vec_id",
                              vec_col: str = "embedding",
                              brute_limit: int | None = 200_000) -> DataFrame:
    """Embedding-cosine near-dup pairs by EXHAUSTIVE pair scan — the
    oracle/verify path only. O(N²): refuses to run past ``brute_limit``
    rows (pass None to override) and points to the scale paths —
    ``embedding_near_duplicates_multiprobe`` (high recall, the
    canonical near-dup query) or ``embedding_near_duplicates_lsh``
    (single-table)."""
    if brute_limit is not None:
        n = corpus.count()
        if n > brute_limit:
            raise ValueError(
                f"brute-force near-dup over {n} rows is a corpus-squared "
                f"cartesian (limit {brute_limit}); use "
                "embedding_near_duplicates_multiprobe / _lsh instead, or "
                "pass brute_limit=None to force")
    a = _normalized(corpus, id_col, vec_col, "id_a", "va")
    b = _normalized(corpus, id_col, vec_col, "id_b", "vb")
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("sim", F.round(dot(F.col("va"), F.col("vb")), 4))
        .filter(F.col("sim") >= threshold)
        .select("id_a", "id_b", "sim")
    )


def embedding_near_duplicates_multiprobe(
        corpus: DataFrame, threshold: float = 0.95, n_planes: int = 4,
        n_tables: int = 3, dim: int = 64, id_col: str = "vec_id",
        vec_col: str = "embedding") -> DataFrame:
    """The canonical near-dup query: OR-amplified LSH. Candidates =
    pairs agreeing on ALL sign bits of ANY of ``n_tables`` independent
    plane sets; each candidate is verified with the exact cosine. For a
    pair at similarity s, P(bucket agreement per table) = (1-acos(s)/π)^p,
    so recall = 1-(1-(1-acos(s)/π)^p)^L — more tables buy recall at
    linear cost, vs the N² cartesian the brute scan pays.

    Shape: per table one self-equi-join on the bucket id (hash-random →
    no skew), then a union + distinct to dedupe pairs caught by several
    tables. The normalized corpus is persisted once and feeds all 2L
    join sides. Deterministic planes per table (seeded LCG) keep the
    result engine-reproducible — the DuckDB oracle mirrors the exact
    same plane literals.

    Round-12 note (measured): a distinct-candidates-first variant
    (id-only bucket joins, one verify per distinct pair) was A/B'd and
    REJECTED — its extra distinct shuffle + two vector join-backs cost
    more than the ~L× duplicate verifies they save (4.0-4.3 s vs this
    form's 2.4-2.7 s steady at sf0.1). This key's occasional 12 s
    readings are JIT-state variance of the interpreted zip_with dot
    (higher-order lambdas never codegen), addressed at the session
    level (ReservedCodeCacheSize — see session.py), not by re-planning.

    Round-13 restructure (measured, results identical): the L
    per-table self-joins are ONE self-join keyed on (table, bucket) —
    each row posexplodes its L bucket ids, so the same candidate
    multiset comes out of a single exchange pair instead of 2L
    exchanges and L AQE-planned joins (plan: 6 Exchange → 2, and the
    two join children are canonically identical so one ReusedExchange
    serves both). Verify count, sims and the final distinct are
    unchanged — this is NOT the rejected distinct-first variant (the
    vectors still ride the join; there are no join-backs).
    """
    base = _normalized(corpus, id_col, vec_col, "id", "v").persist()
    buckets = F.array(*[
        hyperplane_sign_bits(F.col("v"),
                             make_planes(n_planes, dim, seed=123456789 + t))
        for t in range(n_tables)
    ])
    side = base.select("id", "v", F.posexplode(buckets).alias("t", "bucket"))
    a = side.select(F.col("id").alias("id_a"), F.col("v").alias("va"),
                    "t", "bucket")
    b = side.select(F.col("id").alias("id_b"), F.col("v").alias("vb"),
                    "t", "bucket")
    out = (
        a.join(b, ["t", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("sim", F.round(dot(F.col("va"), F.col("vb")), 4))
        .filter(F.col("sim") >= threshold)
        .select("id_a", "id_b", "sim")
    )
    # eager checkpoint of the REDUCED pair list releases the normalized
    # corpus cache immediately (a lazy return leaked one pinned cache
    # entry per call — six graph queries each call this generator)
    out = out.distinct().localCheckpoint(eager=True)
    base.unpersist()
    return out


def ivf_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
             n_centroids: int = 50, centroid_mod: int | None = None,
             nprobe: int = 1,
             id_col: str = "vec_id", vec_col: str = "embedding",
             queries_from_corpus: bool = False) -> DataFrame:
    """IVF-flavored ANN: inverted file over a deterministic FIXED-SIZE
    centroid sample (the ``n_centroids`` vectors first in the portable
    multiplicative-hash order — IVF with random-sample centroids and no
    Lloyd refinement, kept deterministic so the SQL oracle reproduces
    it bit-for-bit via ``ORDER BY hash, id LIMIT n``).

    Build: every vector is assigned to its nearest centroid (argmax
    cosine) — one broadcast pass over the corpus, N x C dot products.
    Probe: a query searches its ``nprobe`` nearest cells' inverted
    lists — expected nprobe·N/C candidates instead of N. nprobe is the
    standard recall-vs-cost knob: a true neighbor assigned to the
    query's SECOND-closest cell is invisible at nprobe=1 and found at
    nprobe=2, at exactly 2× probe cost.

    Scale: C is CONSTANT (n_centroids), so the build is O(N·C) with a
    C-row broadcast and probes read nprobe·N/C candidates; the inverted
    lists are a plain DataFrame keyed by centroid id — at 100 TB you
    persist them bucketed by cent_id and probes become pruned scans.
    The legacy ``centroid_mod`` seeding (k = N/mod, grows with the
    corpus) is kept only for oracle twins / back-compat — not the
    scale path.
    """
    from dht11_data_pipeline_spark.operators.kmeans import CENTROID_HASH_SQL
    base = right_size(corpus).select(
        F.col(id_col).alias("cent_id"), F.col(vec_col).alias("cent_v"))
    if centroid_mod is not None:
        cent = base.filter(F.col("cent_id") % centroid_mod == 0)
    else:
        h = F.expr(CENTROID_HASH_SQL.format(id="cent_id"))
        cent = base.orderBy(h, F.col("cent_id")).limit(n_centroids)
    # centroid norms once per centroid (C rows), row norms once per row:
    # the O(N·C) assign pass then pays one dot per pair instead of
    # dot + two norms — identical expression/order, bit-identical sims
    # (the cosine_topk side-norm discipline)
    cent = cent.select("cent_id", "cent_v", norm(F.col("cent_v")).alias("_cn"))

    def nearest_centroid(df: DataFrame, out_id: str, n: int = 1) -> DataFrame:
        scored = (
            right_size(df).select(F.col(id_col).alias(out_id),
                                  F.col(vec_col).alias("_v"),
                                  norm(F.col(vec_col)).alias("_vn"))
            .crossJoin(F.broadcast(cent))
            .withColumn("_csim", F.round(
                dot(F.col("_v"), F.col("cent_v"))
                / (F.col("_vn") * F.col("_cn")), 4))
        )
        w = Window.partitionBy(out_id).orderBy(
            F.col("_csim").desc(), F.col("cent_id"))
        return (scored.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") <= n)
                .select(out_id, "cent_id", "_v", "_vn"))

    lists = nearest_centroid(corpus, "neighbor_id")
    if queries_from_corpus and nprobe == 1:
        # queries are corpus rows: reuse the build-side assignment via a
        # semi-join on id instead of re-running Q x C centroid scoring —
        # one broadcast filter, and assignment stays computed exactly once
        # (also what a persisted IVF index gives you in production)
        lists = lists.persist()
        qids = queries.select(F.col(id_col).alias("neighbor_id"))
        probes = (lists.join(F.broadcast(qids), "neighbor_id", "left_semi")
                  .withColumnRenamed("neighbor_id", "query_id"))
    else:
        probes = nearest_centroid(queries, "query_id", n=nprobe)
    scored = (
        probes.select("query_id", "cent_id", F.col("_v").alias("qv"),
                      F.col("_vn").alias("_qn"))
        .join(lists.select("neighbor_id", "cent_id", F.col("_v").alias("cv"),
                           F.col("_vn").alias("_nn")),
              "cent_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("sim", F.round(
            dot(F.col("qv"), F.col("cv"))
            / (F.col("_qn") * F.col("_nn")), 4))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    out = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cent_id", "neighbor_id", "sim", "rank")
        .localCheckpoint(eager=True))  # top-k rows; releases lists
    lists.unpersist()
    return out


def embedding_near_duplicates_lsh(corpus: DataFrame, threshold: float = 0.95,
                                  n_planes: int = 4, dim: int = 64,
                                  id_col: str = "vec_id",
                                  vec_col: str = "embedding") -> DataFrame:
    """The 100 TB near-dup path: LSH-bucket first, pair-compare only
    within buckets — candidate generation drops from N² to Σ bucket².
    Approximate by design (a pair split across buckets is missed; with
    p planes the recall for similarity s is (1 - acos(s)/π)^p, ~0.95+
    for true near-dups at p=4), deterministic given the fixed planes."""
    planes = make_planes(n_planes, dim)
    a = _normalized(corpus, id_col, vec_col, "id_a", "va").withColumn(
        "bucket", hyperplane_sign_bits(F.col("va"), planes))
    b = _normalized(corpus, id_col, vec_col, "id_b", "vb").withColumn(
        "bucket", hyperplane_sign_bits(F.col("vb"), planes))
    return (
        a.join(b, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("sim", F.round(dot(F.col("va"), F.col("vb")), 4))
        .filter(F.col("sim") >= threshold)
        .select("id_a", "id_b", "bucket", "sim")
    )


def prototype_prune(corpus: DataFrame, group_col: str = "label",
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    prune_pct: int = 10) -> DataFrame:
    """Prototypicality pruning (SSL-prototypes / SemDeDup-style data
    pruning): each group's centroid is the exact mean embedding;
    vectors rank by cosine-to-centroid (rounded to 4 decimals, id
    tiebreak) and the farthest ``prune_pct`` percent of each group are
    flagged drop — the "remove the outliers / keep the prototypical
    core" curation signal for embedding-clustered corpora.

    Scale: the centroid build is a dim-exploded two-level aggregate —
    map-side partials reduce each partition to (group, dim) sums before
    the ONE shuffle, and the post-shuffle table is groups x dim rows;
    the assembled centroid table is |groups| rows -> broadcast back.
    Scoring is a narrow per-row expression; the rank is one window
    shuffle on the group key. Integer rank/count math for the flag —
    no float ever decides membership.
    """
    e = corpus.select(F.col(group_col).alias("g"),
                      F.col(id_col).alias("vid"),
                      F.col(vec_col).alias("v"))
    dims = right_size(e).select("g", F.posexplode("v").alias("i", "x"))
    cent = (
        dims.groupBy("g", "i").agg(F.avg(F.col("x").cast("double")).alias("m"))
        .groupBy("g")
        .agg(F.array_sort(F.collect_list(F.struct("i", "m"))).alias("sm"))
        .select("g", F.transform("sm", lambda s: s["m"]).alias("cv"))
        # centroid norm once per GROUP (broadcast side), not once per
        # corpus row — the cosine_topk side-norm discipline
        .select("g", "cv", norm(F.col("cv")).alias("_gn"))
    )
    scored = (
        e.join(F.broadcast(cent), "g")
        .withColumn("sim", F.round(
            dot(F.col("v"), F.col("cv"))
            / (norm(F.col("v")) * F.col("_gn")), 4))
    )
    w = Window.partitionBy("g").orderBy(F.col("sim").desc(), F.col("vid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .withColumn("n", F.count("*").over(Window.partitionBy("g")))
        .select(
            F.col("vid").alias(id_col), F.col("g").alias(group_col), "sim",
            F.col("rank").cast("int").alias("rank"),
            F.when(F.col("rank") * 100 <= F.col("n") * (100 - prune_pct), "Y")
            .otherwise("N").alias("keep_flag"),
        )
    )


def matryoshka_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
                    prefix_dim: int = 16, overfetch: int = 4,
                    id_col: str = "vec_id",
                    vec_col: str = "embedding") -> DataFrame:
    """Matryoshka (prefix-dimension) two-stage ANN: candidates are the
    top ``k * overfetch`` neighbors by cosine over only the FIRST
    ``prefix_dim`` coordinates, then that short list is re-ranked with
    the exact full-dimension cosine — the standard cheap-filter /
    exact-rerank cascade for MRL-trained embeddings, where prefix
    slices are themselves usable embeddings.

    Scale shape: stage 1 pays the broadcast query scan at prefix_dim/dim
    of the full-width cost (and at 100 TB it is the stage you'd swap
    for the IVF/PQ index paths in this module); stage 2 touches only
    k·overfetch rows per query. Both stages rank on ROUND(sim, 4) with
    neighbor-id tie-breaks, so the output is engine-exact — the DuckDB
    oracle mirrors both windows bit-for-bit.

    Output: (query_id, neighbor_id, prefix_sim, sim, rank <= k)."""
    # prefix and full norms are per-ROW quantities: project them on
    # each side once (the cosine_topk side-norm discipline) so the
    # O(Q·N) stage-1 scan pays one prefix dot per pair instead of
    # dot + two prefix norms, and stage 2 reuses the carried full
    # norms — identical expressions/order, bit-identical sims
    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).alias("qv"),
                       norm(F.slice(vec_col, 1, prefix_dim)).alias("_qpn"),
                       norm(F.col(vec_col)).alias("_qn"))
    c = right_size(corpus).select(F.col(id_col).alias("neighbor_id"),
                                  F.col(vec_col).alias("cv"),
                                  norm(F.slice(vec_col, 1, prefix_dim))
                                  .alias("_cpn"),
                                  norm(F.col(vec_col)).alias("_cn"))
    staged = (
        F.broadcast(q).crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("prefix_sim", F.round(
            dot(F.slice("qv", 1, prefix_dim), F.slice("cv", 1, prefix_dim))
            / (F.col("_qpn") * F.col("_cpn")), 4))
    )
    wp = Window.partitionBy("query_id").orderBy(
        F.col("prefix_sim").desc(), F.col("neighbor_id"))
    cand = (staged.withColumn("_prk", F.row_number().over(wp))
            .filter(F.col("_prk") <= k * overfetch))
    wf = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id"))
    return (
        cand.withColumn("sim", F.round(
            dot(F.col("qv"), F.col("cv"))
            / (F.col("_qn") * F.col("_cn")), 4))
        .withColumn("rank", F.row_number().over(wf))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "prefix_sim", "sim", "rank")
    )
