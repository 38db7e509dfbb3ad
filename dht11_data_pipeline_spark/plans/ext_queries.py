"""LLM-pipeline extension queries (dedup / similarity / text analysis /
multimodal / sessionization) — DataFrame side. Oracles in ext_oracles.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dht11_data_pipeline_spark.operators import (
    curation, dedup, graph, multimodal, similarity, textops)
from dht11_data_pipeline_spark.functions.text import tokens
from dht11_data_pipeline_spark.operators.profile import profile
from dht11_data_pipeline_spark.operators.skew import salted_aggregate
from dht11_data_pipeline_spark.sources.tables import load_table


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: sha256 content groups, canonical id + multiplicity."""
    docs = load_table(spark, sf_dir, "documents")
    return dedup.exact_duplicates(docs)


def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact pairwise word-3-gram Jaccard ≥ 0.2 via inverted-index join."""
    docs = load_table(spark, sf_dir, "documents")
    return dedup.jaccard_pairs(docs, n=3, threshold=0.2)


def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(8) → 4 bands of 2 → bucket-join candidates → Jaccard ≥ 0.5."""
    docs = load_table(spark, sf_dir, "documents")
    return dedup.minhash_near_duplicates(docs, num_hashes=8, band_size=2, threshold=0.5)


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash sketch pairs within Hamming distance 3."""
    docs = load_table(spark, sf_dir, "documents")
    return dedup.simhash_near_duplicates(docs, max_hamming=3)


def dedup_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined-chunking dedup: shift-immune cut points from a
    16-char rolling window hash, chunk-hash share across documents,
    per-doc duplicated-char ratio — the file-store dedup primitive
    applied to a training corpus."""
    docs = load_table(spark, sf_dir, "documents")
    return dedup.cdc_chunk_stats(docs)


def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return textops.quality_metrics(docs)


def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return textops.language_id(docs)


def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return textops.fingerprint(docs)


def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return textops.token_stats(docs)


def text_sentence_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sentence segmentation statistics per document — the readability
    / chunk-boundary signals a curation pipeline cuts on: sentence
    count, total words, longest sentence, avg words per sentence (x100
    integer so the cross-engine compare is exact).

    Scale: pure row-local array lambdas (split → filter → transform →
    aggregate), whole-row narrow projection — zero shuffles; the split
    arrays never leave the row."""
    docs = load_table(spark, sf_dir, "documents")
    with_sents = docs.withColumn(
        "_sents", F.filter(F.split("text", r"[.!?]+"),
                           lambda s: F.trim(s) != ""))
    with_words = with_sents.withColumn(
        "_wc", F.transform("_sents",
                           lambda s: F.size(F.split(F.trim(s), " "))))
    return with_words.select(
        "doc_id",
        F.size("_sents").alias("n_sentences"),
        F.coalesce(F.aggregate("_wc", F.lit(0), lambda acc, x: acc + x),
                   F.lit(0)).alias("total_words"),
        F.coalesce(F.array_max("_wc"), F.lit(0)).alias("max_sentence_words"),
        F.when(F.size("_sents") > 0,
               F.expr("aggregate(_wc, 0, (acc, x) -> acc + x) * 100 DIV size(_sents)"))
         .otherwise(F.lit(0)).cast("bigint").alias("avg_words_x100"),
    )


def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-repetition quality signals (the C4/Gopher 'repetitive
    document' gates): token count, distinct count, distinct ratio (ppm
    integer), and the dominant token with its count and share —
    documents dominated by one token or with low distinct ratios are
    SEO spam / boilerplate candidates.

    Scale: explode → partial-agg (doc, token) → one shuffle at doc
    grain; the per-doc top-1 is a window over the already-reduced
    (doc, token) frame ordered by (count desc, token) — deterministic
    tie-break, no second pass over raw tokens."""
    docs = load_table(spark, sf_dir, "documents")
    tf = (docs.select("doc_id", F.explode(tokens("text")).alias("token"))
          .groupBy("doc_id", "token")
          .agg(F.count(F.lit(1)).alias("cnt")))
    w = Window.partitionBy("doc_id").orderBy(F.desc("cnt"), "token")
    per_doc = (tf.withColumn("rk", F.row_number().over(w))
               .groupBy("doc_id")
               .agg(F.sum("cnt").alias("n_tokens"),
                    F.count(F.lit(1)).alias("n_distinct"),
                    F.max(F.when(F.col("rk") == 1, F.col("token")))
                    .alias("top_token"),
                    F.max(F.when(F.col("rk") == 1, F.col("cnt")))
                    .alias("top_count")))
    return per_doc.select(
        "doc_id", "n_tokens", "n_distinct",
        F.expr("n_distinct * 1000000 DIV n_tokens").alias("distinct_ppm"),
        "top_token", "top_count",
        F.expr("top_count * 1000000 DIV n_tokens").alias("top_share_ppm"),
    )


def text_winnowing(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return textops.winnowing_fingerprint(docs, k=3, w=4)


def sim_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force exact cosine top-5 for query vectors (vec_id%50==0)."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    return similarity.cosine_topk(emb, queries, k=5)


def sim_lsh_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed approximate top-5 for the same query set."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    return similarity.lsh_ann_topk(emb, queries, k=5, n_planes=4, dim=64)


def sim_ivf_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-bucketed approximate top-5 (nprobe=1, deterministic
    random-sample centroids) for the same query set."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    return similarity.ivf_topk(emb, queries, k=5, n_centroids=50,
                               queries_from_corpus=True)


def sim_ivf_ann_nprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN with multi-cell probing (nprobe=2) — the production
    recall knob: each query scans its TWO nearest cells' inverted
    lists, recovering neighbors that fell just across a cell boundary
    at exactly 2x probe cost. Fully deterministic (fixed-k hash-ordered
    centroids, rounded cosines, id tiebreaks), so the oracle reproduces
    the whole index bit-for-bit."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    return similarity.ivf_topk(emb, queries, k=5, n_centroids=50, nprobe=2)


def sim_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (sim ≥ 0.4) via OR-
    amplified multi-probe LSH (3 independent plane tables + exact
    cosine verify) — the canonical near-dup path; no corpus×corpus
    cartesian anywhere in the plan. The brute pair scan survives only
    as the recall oracle in tests (test_ann_recall)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.embedding_near_duplicates_multiprobe(
        emb, threshold=0.4, n_planes=4, n_tables=3, dim=64)


def sim_embedding_near_dup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed near-dup pairs (the N²→Σbucket² scale path;
    approximate recall, deterministic buckets)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.embedding_near_duplicates_lsh(
        emb, threshold=0.4, n_planes=4, dim=64)


def sim_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic (embedding-level) dedup: multiprobe-LSH near-dup pairs
    become edges, connected components pick one canonical vector per
    semantic cluster (min id), every vector gets a keep/drop verdict —
    the embedding twin of dedup_clusters' lexical closure, and the
    production shape for 'train on one copy of each meaning'.

    Scale: pairs come from the OR-amplified bucket joins (no cartesian,
    operators/similarity.py:126); the closure is iterative min-label
    propagation over edges only (O(E) per round, components here are
    tiny); singleton vectors never enter the propagation at all."""
    emb = load_table(spark, sf_dir, "embeddings")
    pairs = similarity.embedding_near_duplicates_multiprobe(
        emb, threshold=0.4, n_planes=4, n_tables=3, dim=64)
    edges = pairs.select(F.col("id_a").alias("doc_a"),
                         F.col("id_b").alias("doc_b"))
    return graph.cluster_documents(emb, edges, id_col="vec_id")


def mm_binary_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing: binary payload column → Arrow-batched
    mapInPandas feature extraction (stubbed decoder)."""
    docs = load_table(spark, sf_dir, "documents")
    return multimodal.extract_features(multimodal.attach_binary_payload(docs))


def mm_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1:1 binary transform plumbing (resize/resample shape, stubbed)."""
    docs = load_table(spark, sf_dir, "documents")
    return multimodal.resize_payloads(
        multimodal.attach_binary_payload(docs), target=64)


def mm_image_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL multimodal decode, no stub: each document's bytes are
    packed into an actual P6 PPM image (vendored pure-Python codec),
    then header+pixels are parsed back, nearest-neighbor-resized to
    16x16 and re-encoded — encode -> decode -> resize -> decode, all
    inside Arrow batches. The checksum column is dropped here because
    the zero-padding bytes aren't expressible to the SQL oracle; the
    full byte-level roundtrip is pinned in tests/test_formats_and_stats
    / test_imagecodec."""
    docs = load_table(spark, sf_dir, "documents")
    return multimodal.decode_resize_payloads(
        multimodal.attach_image_payload(docs, width=32),
        out_w=16, out_h=16,
    ).select("doc_id", "width", "height",
             "out_width", "out_height", "out_n_bytes")


def mm_png_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL compressed-image decode (PNG via stdlib zlib): document
    bytes → 8-bit RGB PNG → chunk/CRC/inflate/unfilter parse →
    byte-exact roundtrip verdict. Dims and pixel-byte counts are
    arithmetic over the text length, so the oracle checks them exactly;
    the byte-level equality surfaces as a boolean the oracle pins TRUE
    (the full codec including Sub/Up/Average/Paeth reconstruction is
    property-tested in tests/test_imagecodec.py)."""
    docs = load_table(spark, sf_dir, "documents")
    return multimodal.png_roundtrip(docs, width=32)


def mm_jpeg_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL lossy-image decode (baseline JPEG, functions/jpegcodec):
    document bytes → one constant 8x8 block per byte → spec-conformant
    grayscale JFIF → full baseline decode (canonical Huffman,
    dequantize, batched IDCT).  Constant blocks make the lossy
    reconstruction a closed form, so the decoded pixel_sum and the
    max |decoded − original| error BOTH hit the oracle's value hash —
    a stronger check than the PNG roundtrip's pinned-TRUE verdict."""
    docs = load_table(spark, sf_dir, "documents")
    return multimodal.jpeg_roundtrip(docs, blocks_per_row=8)


def mm_cross_modal_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-modal dedup disagreement audit: full outer of the TEXT
    near-dup pairs (minhash-LSH, jaccard >= 0.5) and the IMAGE near-dup
    pairs (perceptual-hash hamming <= 3) over the same corpus.
    TEXT_ONLY rows are same-words/different-rendering; IMAGE_ONLY rows
    are near-identical images over different text (template
    screenshots) — exactly the rows a multimodal curation pass
    re-examines before trusting either modality's verdict alone. Both
    pair generators are the existing bucketed paths (banded LSH,
    pigeonhole chunks); the audit adds one outer join on the pair key.

    The two branches materialize CONCURRENTLY (one submitting thread
    each; Spark schedules jobs from separate threads side by side):
    they are independent, and run serially the text branch's eager
    candidate checkpoint blocks the driver while the image branch's
    Arrow codec stages wait — measured round 11, serial ≈ text+image
    to within 0.1 s (the audit join itself is free) while overlapped
    runs at ~65% of the sum, the driver-side planning/collect bubbles
    of one branch filling with the other's compute. Results are
    unaffected: each branch is checkpointed whole, the join stays
    lazy."""
    from concurrent.futures import ThreadPoolExecutor

    docs = load_table(spark, sf_dir, "documents")

    def _text():
        return (dedup.minhash_near_duplicates(docs, threshold=0.5)
                .select("doc_a", "doc_b", "jaccard").localCheckpoint())

    def _image():
        ph = multimodal.phash_payloads(
            multimodal.attach_image_payload(docs, width=32))
        return (dedup.phash_hamming_pairs(ph, max_hamming=3)
                .select("doc_a", "doc_b", "hamming").localCheckpoint())

    with ThreadPoolExecutor(2) as ex:
        ft, fi = ex.submit(_text), ex.submit(_image)
        t, i = ft.result(), fi.result()
    return (
        t.join(i, ["doc_a", "doc_b"], "full_outer")
        .select(
            "doc_a", "doc_b",
            F.coalesce(F.col("jaccard"), F.lit(-1.0)).alias("text_jaccard"),
            F.coalesce(F.col("hamming"), F.lit(-1)).cast("int")
            .alias("image_hamming"),
            F.when(F.col("jaccard").isNotNull()
                   & F.col("hamming").isNotNull(), "BOTH")
            .when(F.col("jaccard").isNotNull(), "TEXT_ONLY")
            .otherwise("IMAGE_ONLY").alias("modality")))


def mm_gif_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL compressed-format decode #2 (GIF87a, functions/gifcodec):
    document bytes → palette-indexed pixels → real variable-width LZW
    compression → full container walk + LZW decompression.  Lossless,
    so pixel_sum replays the byte sum exactly and n_mismatch pins the
    roundtrip at 0 — the value hash certifies the entire LZW path."""
    docs = load_table(spark, sf_dir, "documents")
    return multimodal.gif_roundtrip(docs, width=64)


def mm_qoi_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL compressed-format decode #3 (QOI, functions/qoicodec):
    document bytes → grayscale RGB pixels → run/index/diff/luma op
    stream → full decode.  Lossless, so pixel_sum replays 3× the byte
    sum exactly and n_mismatch pins the roundtrip at 0."""
    docs = load_table(spark, sf_dir, "documents")
    return multimodal.qoi_roundtrip(docs, width=64)


def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1:N frame-sampling plumbing (video/audio keyframe shape):
    256-byte frames, every 4th."""
    docs = load_table(spark, sf_dir, "documents")
    return multimodal.sample_frames(
        multimodal.attach_binary_payload(docs), frame_size=256, every=4)


def meta_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-driven one-pass column profiler over orders — the query
    is GENERATED from df.schema at runtime (the reference's
    all_tab_cols pattern, re-expressed)."""
    return profile(load_table(spark, sf_dir, "orders"))


def a_salted_event_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe two-phase (salted) aggregation — results identical to
    the plain groupBy (decimal sums are association-order exact), but a
    hot event_type spreads over 16 reducers instead of one."""
    ev = load_table(spark, sf_dir, "events")
    prepped = ev.select("event_type", "event_id",
                        F.col("value").cast("decimal(18,2)").alias("value"))
    agg = salted_aggregate(prepped, ["event_type"],
                           {"value": "sum", "event_id": "count"}, n_salts=16)
    return agg.select("event_type",
                      F.col("value_sum").cast("double").alias("value_sum"),
                      "event_id_count")


def dedup_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus-dedup verdict: exact (sha256) then
    minhash-LSH near-dup (J ≥ 0.5); one keep/drop row per document."""
    docs = load_table(spark, sf_dir, "documents")
    return dedup.cascade_keep_decision(docs, threshold=0.5)


def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive near-dup closure: minhash pairs as edges → connected
    components by iterative min-label propagation (operators/graph.py);
    every doc gets a cluster id (own id for singletons) + canonical
    flag. The oracle states the same fixpoint as a recursive CTE."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup.minhash_near_duplicates(docs, threshold=0.5)
    return graph.cluster_documents(docs, pairs)


def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingestion-batch dedup: docs with id % 4 == 0 arrive as the new
    batch; the rest are the existing corpus whose signature store is
    already built. Emits near-dup pairs touching a new doc — verified
    by re-shingling only candidate rows (point lookups, not a corpus
    pass).

    Bench note: this query BUILDS the signature store in-line (the
    driver contract is stateless), so its wall-clock includes the
    one-time store construction a deployment amortizes across batches;
    the recurring per-batch cost is new-sigs + band-join + verify."""
    docs = load_table(spark, sf_dir, "documents")
    new = docs.filter(F.col("doc_id") % 4 == 0)
    old = docs.filter(F.col("doc_id") % 4 != 0)
    store = dedup.minhash_signature(old)
    return dedup.minhash_incremental_pairs(docs, store, new, threshold=0.5)


def cur_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 90/5/5 train/validation/test split by id hash."""
    docs = load_table(spark, sf_dir, "documents")
    return curation.hash_split(docs)


def cur_stratified_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """≤ 40 docs per (lang, source) stratum, hash-ordered uniform pick."""
    docs = load_table(spark, sf_dir, "documents")
    return curation.stratified_quota(docs, ["lang", "source"], k=40)


def cur_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mix planning: per (lang, source) token accounting with
    a proportional allocation of a 10M-token training budget — the
    table a data-mixture decision is made from. share_ppm and the
    per-stratum quota are integer cross-multiplications (exact across
    engines); the global total is an empty-partition window over the
    tiny per-stratum frame (single lineage — the documents scan runs
    once).

    Scale: one shuffle at (lang, source) grain with map-side partials;
    token counting is a row-local split. At 100 TB the stratum frame is
    O(langs x sources) rows — the window input is KBs."""
    budget = 10_000_000
    docs = load_table(spark, sf_dir, "documents")
    per = (docs.select("lang", "source",
                       F.size(tokens("text")).alias("_tok"))
           .groupBy("lang", "source")
           .agg(F.count(F.lit(1)).alias("n_docs"),
                F.sum("_tok").alias("stratum_tokens")))
    with_total = per.withColumn(
        "_total", F.sum("stratum_tokens").over(Window.partitionBy()))
    return with_total.select(
        "lang", "source", "n_docs", "stratum_tokens",
        F.expr("stratum_tokens * 1000000 DIV _total").alias("share_ppm"),
        F.expr(f"CAST({budget} AS BIGINT) * stratum_tokens DIV _total")
        .alias("token_quota"),
    )


def cur_sample_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Budgeted mixture sampling — the step after cur_token_budget in a
    training-mix pipeline: each (lang, source) stratum gets its
    proportional share of a 10k-token budget, then docs are taken in
    deterministic hash order (uniform, seed-free, append-stable) until
    the stratum quota is exhausted. A doc is kept iff the tokens taken
    BEFORE it (exclusive prefix sum in hash order) are still under
    quota — greedy with at most one overshooting doc, identical in any
    engine.

    Scale: stratum quotas come from a tiny aggregate frame (empty-
    partition window over strata, broadcast back); the per-doc prefix
    sum is a window partitioned BY STRATUM — no global ordering
    anywhere."""
    budget = 10_000
    docs = load_table(spark, sf_dir, "documents")
    per_doc = docs.select(
        "doc_id", "lang", "source",
        F.size(tokens("text")).alias("n_tokens"),
        F.sha2(F.concat_ws("\x1f", F.lit("mix1"),
                           F.col("doc_id").cast("string")), 256).alias("_h"),
    )
    strata = (per_doc.groupBy("lang", "source")
              .agg(F.sum("n_tokens").alias("_stratum_tokens")))
    quotas = (strata.withColumn(
        "_total", F.sum("_stratum_tokens").over(Window.partitionBy()))
        .select("lang", "source",
                F.expr(f"CAST({budget} AS BIGINT) * _stratum_tokens DIV _total")
                .alias("token_quota")))
    w = (Window.partitionBy("lang", "source").orderBy("_h", "doc_id")
         .rowsBetween(Window.unboundedPreceding, -1))
    return (per_doc.join(F.broadcast(quotas), ["lang", "source"])
            .withColumn("_before", F.coalesce(F.sum("n_tokens").over(w),
                                              F.lit(0)))
            .select("doc_id", "lang", "source", "n_tokens", "token_quota",
                    F.when(F.col("_before") < F.col("token_quota"), "Y")
                    .otherwise("N").alias("sampled")))


def cur_chunk_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-token chunks, stride 24 (8-token overlap), hashed content."""
    docs = load_table(spark, sf_dir, "documents")
    return curation.chunk_tokens(docs, chunk_size=32, stride=24)


def cur_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-split sequence packing: 256-token bins per source."""
    docs = load_table(spark, sf_dir, "documents")
    return curation.pack_sequences(docs, budget=256)


def cur_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Email/phone/IPv4 redaction with per-kind counts."""
    docs = load_table(spark, sf_dir, "documents")
    return curation.pii_scrub(docs)


def t_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization of the events stream (30-min timeout) —
    the batch twin of streaming session_window (SURVEY §2.9 T5).
    Integer microsecond arithmetic → engine-exact."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ts_utc = F.col("ts").cast("timestamp")
    gap_us = F.unix_micros(ts_utc) - F.unix_micros(F.lag(ts_utc).over(w))
    is_new = F.when(gap_us.isNull() | (gap_us > 1800 * 1_000_000), 1).otherwise(0)
    sessioned = ev.withColumn(
        "session_seq",
        F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        sessioned.groupBy("user_id", "session_seq")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
    )


def ts_user_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series similarity: Pearson correlation between users' daily
    value series (users with user_id % 30 == 0), exact-integer
    co-moments.

    Engine-portability trick: corr() aggregates accumulate doubles in
    partition order, so two engines disagree in the last ulps. Instead
    the five co-moment sums run in integer cents (exact, associative);
    the closed-form correlation is then ONE double expression over
    identical integers in any engine — deterministic to the bit, then
    rounded to 4dp. Scale: daily pre-aggregation shrinks each user to
    ≤ n_days rows; the pair join keys on the day bucket; co-moment
    sums are map-side partial. At 100 TB swap the long sums for
    decimal(38,0) (same plan).
    """
    ev = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    daily = (
        ev.filter(F.col("user_id") % 30 == 0)
        .groupBy("user_id", F.date_trunc("day", "ts").alias("day"))
        .agg(F.sum(cents).alias("c"))
    )
    a = daily.select(F.col("user_id").alias("user_a"), "day", F.col("c").alias("x"))
    b = daily.select(F.col("user_id").alias("user_b"), "day", F.col("c").alias("y"))
    m = (
        a.join(b, "day").filter(F.col("user_a") < F.col("user_b"))
        .groupBy("user_a", "user_b")
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum("x").alias("sx"), F.sum("y").alias("sy"),
             F.sum(F.col("x") * F.col("y")).alias("sxy"),
             F.sum(F.col("x") * F.col("x")).alias("sxx"),
             F.sum(F.col("y") * F.col("y")).alias("syy"))
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    cov_n = (n * F.col("sxy") - sx * sy).cast("double")
    var_x = (n * F.col("sxx") - sx * sx)
    var_y = (n * F.col("syy") - sy * sy)
    return (
        m.filter((var_x > 0) & (var_y > 0) & (n >= 5))
        .select("user_a", "user_b", n.alias("n_days"),
                F.round(cov_n / (F.sqrt(var_x.cast("double"))
                                 * F.sqrt(var_y.cast("double"))), 4).alias("corr"))
    )



def sim_kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lloyd k-means refinement of the IVF coarse quantizer
    (operators/kmeans): 3 rounds from the deterministic FIXED-k
    hash-ordered sample init (k=50 — constant as the corpus grows, so
    the centroid collect/broadcast and the per-row assignment cost are
    corpus-size-independent; the oracle reproduces k exactly as
    LEAST(50, COUNT(*))).

    Raw assignments aren't portable across engines (distributed float
    means shift boundary points with partitioning), so the query
    surfaces DETERMINISTIC invariant verdicts the DuckDB oracle checks
    exactly: the corpus size, the seeded cluster count, and booleans
    asserting (a) every vector got a cluster, (b) every cluster id is
    one of the seeded centroid ids, and (c) Lloyd's objective did not
    increase versus the initial assignment (monotonicity — the
    mathematical guarantee tests/test_kmeans.py also pins)."""
    from dht11_data_pipeline_spark.functions.partitioning import right_size
    from dht11_data_pipeline_spark.operators.kmeans import (
        assign_clusters, inertia, lloyd_kmeans, select_centroids)

    # Driver-round-trip economy (round-11 verdict item 1: this key is
    # the registry's most driver-latency-sensitive — the Lloyd loop is
    # inherently a chain of sequential jobs, so every AVOIDABLE job and
    # every per-job parquet re-scan is pure wall-clock): (a) pin the
    # projected corpus ONCE and run all ~7 jobs against the cached
    # blocks instead of re-scan+re-shuffle per round; (b) hand the
    # deterministic init back to lloyd_kmeans instead of letting it
    # recompute the identical sample; (c) fold final inertia into the
    # stats aggregate — one job and no persist instead of two+persist.
    emb = load_table(spark, sf_dir, "embeddings")
    base = (right_size(emb.select("vec_id", "embedding"))
            .localCheckpoint(eager=True))
    init = select_centroids(base, k=50)
    seed_ids = {cid for cid, _ in init}
    # (d) r13: the round-0 assignment serves BOTH the initial-inertia
    # aggregate and Lloyd round 1 — assign_clusters is deterministic
    # given (corpus, centroids), so handing the persisted frame to
    # lloyd_kmeans saves one full N×k Arrow scoring pass per run with
    # bit-identical results
    assigned0 = assign_clusters(base, init).persist()
    init_inertia = inertia(assigned0)

    assigned, _ = lloyd_kmeans(spark, base, k=50, max_iter=3,
                               init_centroids=init,
                               init_assigned=assigned0)
    assigned0.unpersist()
    stats = assigned.agg(
        F.count(F.lit(1)).alias("n_assigned"),
        F.sum(F.when(F.col("cluster_id").isNull(), 1).otherwise(0)).alias("n_null"),
        F.sum(F.when(F.col("cluster_id").isin(list(seed_ids)), 0).otherwise(1))
        .alias("n_foreign"),
        F.sum("sq_dist").alias("final_inertia"),
    ).first()
    n_points = emb.count()
    return spark.createDataFrame(
        [(n_points, len(seed_ids),
          bool(stats["n_assigned"] == n_points and stats["n_null"] == 0),
          bool(stats["n_foreign"] == 0),
          bool(float(stats["final_inertia"])
               <= init_inertia * (1 + 1e-9)))],
        "n_points bigint, k bigint, all_assigned boolean, "
        "clusters_within_seeds boolean, inertia_decreased boolean")


def text_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rare-term extraction per document — tf-idf-style scoring with a
    deterministic integer surrogate for idf: score = tf * 1e6 DIV
    (df + 1), ranked per doc, top 3. Integer arithmetic end-to-end so
    the DuckDB hash-compare is exact (ln()-based idf differs in the
    last ulp across libm implementations); the *ranking* is what the
    operator delivers and monotone-decreasing-in-df is preserved.

    Scale: the explode is the only row fan-out; partial aggregation on
    (doc_id, token) reduces it map-side before the one term-frame
    shuffle. Document frequency is a window over the already-reduced
    (doc, term) frame — no second pass over the raw token stream and no
    join-back (cf. the decorrelation-window rule in SCALE.md).
    """
    docs = load_table(spark, sf_dir, "documents")
    tf = (
        docs.select("doc_id", F.explode(tokens("text")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    scored = tf.withColumn(
        "df", F.count(F.lit(1)).over(Window.partitionBy("token"))
    ).withColumn("score", F.expr("tf * 1000000 DIV (df + 1)"))
    rk = F.row_number().over(
        Window.partitionBy("doc_id").orderBy(F.desc("score"), "token")
    )
    return (
        scored.withColumn("rk", rk)
        .filter(F.col("rk") <= 3)
        .select("doc_id", "token", "tf", "df", "score", "rk")
    )


def _ann_invariants(spark: SparkSession, emb: DataFrame, queries: DataFrame,
                    approx: DataFrame, k: int, recall_floor: float) -> DataFrame:
    """Deterministic per-query verdicts over an approximate top-k
    result, exactly checkable by a literal-TRUE DuckDB oracle:
    structural invariants (k neighbors, dense ranks 1..k, distinct
    non-self neighbors) plus ONE global recall-vs-exact floor set far
    below measured recall (≥2× margin at every fixture SF) so float
    jitter in training can never flip it."""
    from dht11_data_pipeline_spark.operators.similarity import cosine_topk

    # both frames have two consumers (recall join + invariant agg /
    # count); persist or the PQ encode+ADC and the exact scan run twice
    approx = approx.persist()
    exact = cosine_topk(emb, queries, k=k).select(
        F.col("query_id").alias("e_q"), F.col("neighbor_id").alias("e_n")
    ).persist()
    hits = approx.join(
        exact, (approx["query_id"] == F.col("e_q"))
        & (approx["neighbor_id"] == F.col("e_n"))).count()
    total = exact.count()
    floor_ok = bool(total > 0 and hits / total >= recall_floor)

    return (approx.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_neighbors"),
        F.count_distinct("rank").alias("_nrk"),
        F.max("rank").alias("_maxrk"),
        F.count_distinct("neighbor_id").alias("_nn"),
        F.sum(F.when(F.col("neighbor_id") == F.col("query_id"), 1)
              .otherwise(0)).alias("_self"),
    ).select(
        "query_id", "n_neighbors",
        ((F.col("_nrk") == F.col("n_neighbors"))
         & (F.col("_maxrk") == F.col("n_neighbors"))).alias("ranks_dense"),
        (F.col("_nn") == F.col("n_neighbors")).alias("neighbors_distinct"),
        (F.col("_self") == 0).alias("no_self"),
        F.lit(floor_ok).alias("recall_floor_ok"),
    ))


def sim_pq_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (operators/pq): codebooks trained on
    the deterministic half sample (1 Lloyd round, FIXED 32-code
    codebooks — constant size as the corpus grows), corpus encoded to
    m=8 byte codes, queries scored via ADC table lookups.

    ADC scores aren't portable across engines, so the query surfaces
    deterministic invariant verdicts (see _ann_invariants): structure
    of the top-k result plus a recall-vs-exact floor of 0.10 (measured
    0.175–0.30 across fixture SFs with the fixed-k seeds; exact ranking
    pinned in tests/test_pq.py)."""
    from dht11_data_pipeline_spark.operators import pq

    emb = load_table(spark, sf_dir, "embeddings")
    cbs = pq.train_pq(spark, emb, m=8, n_codes=32, iters=1, train_mod=2)
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    approx = pq.pq_topk(emb, queries, cbs, m=8, k=5)
    return _ann_invariants(spark, emb, queries, approx, k=5,
                           recall_floor=0.10)


def sim_ivfpq_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ composition (operators/pq.ivfpq_topk): coarse inverted
    cells restrict each probe to nprobe lists; PQ codes make every
    scored row m table lookups instead of a d-dim dot product. The
    production shape for billion-vector search.

    Surfaced as deterministic invariant verdicts (see _ann_invariants)
    with a recall floor of 0.05 (measured 0.105–0.24 across fixture
    SFs with the fixed-k seeds; recall-vs-nprobe monotonicity pinned in
    tests/test_pq.py)."""
    from dht11_data_pipeline_spark.operators import pq

    emb = load_table(spark, sf_dir, "embeddings")
    cbs = pq.train_pq(spark, emb, m=8, n_codes=32, iters=1, train_mod=2)
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    approx = pq.ivfpq_topk(emb, queries, cbs, m=8, k=5,
                           n_centroids=50, nprobe=2)
    return _ann_invariants(spark, emb, queries, approx, k=5,
                           recall_floor=0.05)


def cur_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-data decontamination: find training documents that
    share ≥ 5 word-3-gram shingles with any document of the held-out
    benchmark set (docs with id % 10 == 7 stand in for the eval
    suite). The standard pre-training hygiene pass — n-gram collision
    against eval benchmarks — as a bipartite inverted-index join.

    Scale: the join fans out by shared-shingle frequency; at 100 TB
    hash the shingle to 8 bytes and drop stop-shingles above a
    document-frequency cap before joining (same discipline as
    jaccard_pairs). The benchmark side is tiny relative to the corpus
    — it broadcasts, so the training side never shuffles.
    """
    docs = load_table(spark, sf_dir, "documents")
    sh = dedup._doc_shingles(docs, "text", "doc_id", 3)
    inv = sh.select(F.col("doc_id"), F.explode("shingle_set").alias("shingle"))
    bench = (inv.filter(F.col("doc_id") % 10 == 7)
             .select(F.col("doc_id").alias("bench_id"), "shingle"))
    train = (inv.filter(F.col("doc_id") % 10 != 7)
             .select(F.col("doc_id").alias("train_id"), "shingle"))
    return (
        train.join(F.broadcast(bench), "shingle")
        .groupBy("train_id", "bench_id")
        .agg(F.count(F.lit(1)).alias("n_common"))
        .filter(F.col("n_common") >= 5)
    )


def t_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel (view → click → purchase): per user, each stage
    counts only if it happens strictly AFTER the previous stage's
    first occurrence; output is users-reached per stage.

    Plan: three chained window mins over ONE user_id partitioning —
    Catalyst stacks the Window nodes behind a single exchange+sort of
    the fact (inspect: one Exchange, consecutive Window operators) —
    then a user-grain reduce. No self-joins, no per-stage scans.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    staged = (
        ev.select("user_id", "event_type", "ts")
        .withColumn("t1", F.min(F.when(F.col("event_type") == "view",
                                       F.col("ts"))).over(w))
        .withColumn("t2", F.min(F.when((F.col("event_type") == "click")
                                       & (F.col("ts") > F.col("t1")),
                                       F.col("ts"))).over(w))
        .withColumn("t3", F.min(F.when((F.col("event_type") == "purchase")
                                       & (F.col("ts") > F.col("t2")),
                                       F.col("ts"))).over(w))
    )
    per_user = staged.groupBy("user_id").agg(
        F.min("t1").alias("t1"), F.min("t2").alias("t2"), F.min("t3").alias("t3"))
    agg = per_user.agg(*[
        # coalesce: SUM over an empty frame is NULL, the funnel answer is 0
        F.coalesce(
            F.sum(F.when(F.col(t).isNotNull(), 1).otherwise(0)), F.lit(0)
        ).alias(f"n{i}")
        for i, t in ((1, "t1"), (2, "t2"), (3, "t3"))
    ])
    return agg.select(F.expr(
        "stack(3, 'view', n1, 'click_after_view', n2,"
        " 'purchase_after_click', n3) AS (stage, n_users)"
    )).select("stage", F.col("n_users").cast("bigint").alias("n_users"))


def t_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-seen day;
    for each (cohort_day, week_offset) the distinct active users.
    Integer week arithmetic (floor of day diff / 7) so the DuckDB
    compare is exact and week-truncation conventions can't drift.

    Scale: one shuffle on user_id for first-seen, one on the
    (cohort, offset) grain for the count-distinct — the second input
    is already user-grain-reduced per day, so the distinct is cheap.
    """
    ev = load_table(spark, sf_dir, "events")
    days = ev.select(
        "user_id", F.col("ts").cast("timestamp").cast("date").alias("day"))
    first_seen = days.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    return (
        days.join(first_seen, "user_id")
        .select(
            F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
            F.floor(F.datediff("day", "cohort_day") / 7)
             .cast("int").alias("week_offset"),
            "user_id",
        )
        .groupBy("cohort_day", "week_offset")
        .agg(F.countDistinct("user_id").alias("n_active"))
    )


def t_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: recency / frequency / monetary quintiles per
    user, then a rule segment — the classic lifecycle cut of a user
    base. Monetary goes through DECIMAL(18,2) (the _money discipline)
    so the quintile ordering is exact; every ntile ties on user_id so
    the tiling is deterministic on both engines.

    Scale: one shuffle to the user grain, then NO unbudgeted
    single-partition stage: the anchor date is a 1-row aggregate
    broadcast back (the global-scalar rule, J3 shape), and the three
    quintiles go through ``operators.ranking.global_ntile_auto`` —
    the window form when the user frame provably fits one task (the
    100k-row budget tier, graph.small_edge_limit convention), the
    range-partitioned distributed exact NTILE beyond it — so the
    oracle's plain ``NTILE(5) OVER (ORDER BY ...)`` stays the
    verbatim twin at every size while a billion-user frame never
    funnels through one task. The user frame is localCheckpointed
    ONCE (no persist to leak; it feeds the anchor aggregate, the
    cardinality probe that picks the tier, and the scored frame)."""
    from dht11_data_pipeline_spark.operators.ranking import global_ntile_auto

    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.max(F.col("ts").cast("timestamp").cast("date")).alias("last_day"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(F.col("value").cast("decimal(18,2)")).alias("monetary_d"),
    ).localCheckpoint(eager=True)
    n_users = per_user.count()  # cached-read metadata job, picks the tier
    anchor = per_user.agg(F.max("last_day").alias("anchor"))
    scored = (per_user.crossJoin(F.broadcast(anchor))
              .select(
                  "user_id",
                  F.datediff("anchor", "last_day").cast("int")
                  .alias("recency_days"),
                  F.col("frequency").cast("bigint").alias("frequency"),
                  F.col("monetary_d").cast("double").alias("monetary")))
    tiled = scored
    for out_col, order in [
            ("r_score", [F.col("recency_days").asc(), F.col("user_id")]),
            ("f_score", [F.col("frequency").desc(), F.col("user_id")]),
            ("m_score", [F.col("monetary").desc(), F.col("user_id")])]:
        tiled = global_ntile_auto(tiled, 5, order, out_col, n_rows=n_users)
    return tiled.withColumn(
        "segment",
        F.when((F.col("r_score") == 1) & (F.col("f_score") == 1),
               "champion")
        .when((F.col("r_score") >= 4) & (F.col("f_score") >= 4),
              "hibernating")
        .when(F.col("r_score") >= 4, "at_risk")
        .when(F.col("f_score") <= 2, "loyal")
        .otherwise("regular"))


_BM25_TERMS = ["spark", "stream", "merge"]


def text_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranked retrieval: BM25-style scoring of the corpus against a
    fixed term query, top 10 documents. k1=1.2 and b=0.75 are kept as
    exact rationals and the whole per-term score is assembled from
    integer-exact inputs (tf, dl, df, corpus totals), so the two IEEE
    divisions + product + floor are bit-identical in any engine — the
    idf factor is the linear surrogate (2(N-df)+1)/(2df+1) (Robertson-
    Sparck-Jones numerator without the log; ln() differs across libm
    in the last ulp and would break the differential hash).

    tf_norm = tf(k1+1) / (tf + k1(1-b+b·dl/avgdl)) with avgdl = T/N
    is multiplied through by 20·T: (44·tf·T) / (20·tf·T + 6(T+3·dl·N)).

    Scale: one explode pass over documents pre-filtered to query terms
    (the filter prunes the fan-out before the shuffle); per-term df via
    a window over the already-reduced (doc, term) frame; corpus totals
    (N, T) are a 1-row broadcast cross join. Per-term integer scores
    sum exactly — no float-association drift across partitions.
    """
    docs = load_table(spark, sf_dir, "documents")
    with_dl = docs.select(
        "doc_id", F.size(tokens("text")).cast("bigint").alias("dl"),
        tokens("text").alias("tok"))
    totals = with_dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("total_dl"))
    tf = (
        with_dl.select("doc_id", "dl", F.explode("tok").alias("term"))
        .filter(F.col("term").isin(_BM25_TERMS))
        .groupBy("doc_id", "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    scored = (
        tf.withColumn("df", F.count(F.lit(1)).over(Window.partitionBy("term")))
        .crossJoin(F.broadcast(totals))
        .withColumn("tf_norm",
                    (F.lit(44) * F.col("tf") * F.col("total_dl")).cast("double")
                    / (F.lit(20) * F.col("tf") * F.col("total_dl")
                       + F.lit(6) * (F.col("total_dl")
                                     + F.lit(3) * F.col("dl") * F.col("n_docs"))).cast("double"))
        .withColumn("idf_lin",
                    (F.lit(2) * (F.col("n_docs") - F.col("df")) + F.lit(1)).cast("double")
                    / (F.lit(2) * F.col("df") + F.lit(1)).cast("double"))
        .withColumn("term_score",
                    F.floor(F.col("tf_norm") * F.col("idf_lin") * F.lit(1e9)).cast("bigint"))
    )
    # global top-10 via sort+limit (TakeOrderedAndProject: per-partition
    # heaps, k rows to the driver merge — no full sort, no whole-corpus
    # single-partition window); the rank window then runs over just the
    # 10 surviving rows
    top = (scored.groupBy("doc_id").agg(F.sum("term_score").alias("score"))
           .orderBy(F.desc("score"), "doc_id").limit(10))
    # constant partition key: the frame is already capped at 10 rows by
    # the LIMIT, so the single-partition rank is O(k), not O(corpus)
    return top.withColumn("rk", F.row_number().over(
        Window.partitionBy(F.lit(1)).orderBy(F.desc("score"), "doc_id"))
    ).select("doc_id", "score", "rk")


def text_inverted_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index materialization: one row per term with document
    frequency and a bounded, sorted posting sample (first 20 doc ids) —
    the build side of index-backed term lookup.

    Scale: distinct (doc, term) is the partial-agg-friendly reduction;
    the posting collect is bounded (20 ids/term) so row width is capped
    no matter the corpus — full posting lists at 100 TB would be
    bucketed by term hash and stored delta-encoded, same plan shape.
    The global top-k note: the final window is per-term (no single-
    partition global sort anywhere).

    The posting sample is emitted comma-joined (a string, not an
    array column): the external compare canonicalizes via pandas
    sort_values, which cannot hash list-valued cells.
    """
    docs = load_table(spark, sf_dir, "documents")
    pairs = (
        docs.select("doc_id", F.explode(F.array_distinct(tokens("text"))).alias("term"))
        .filter(F.col("term") != "")
    )
    return (
        pairs.groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("df"),
            F.array_join(
                F.transform(
                    F.slice(F.sort_array(F.collect_list("doc_id")), 1, 20),
                    lambda x: x.cast("string"),
                ),
                ",",
            ).alias("postings"),
        )
    )


def ts_anomaly_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anomaly detection: days whose per-type total deviates more than
    2 standard deviations from that event type's daily mean. The
    variance is assembled from DECIMAL-exact sums (Σx, Σx², n) rather
    than stddev_samp(), so every engine computes the identical doubles
    (two correctly-rounded divisions + sqrt) — stddev's streaming
    accumulation order would drift in the last ulp across engines.

    Scale: daily partial-agg first (map-side to day×type grain), then
    the mean/σ come from a window over the tiny aggregated frame —
    the fact is scanned once, no join-back (SCALE.md decorrelation
    rule).
    """
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.select(
            "event_type",
            F.col("ts").cast("timestamp").cast("date").alias("day"),
            F.col("value").cast("decimal(18,2)").alias("v"),
        )
        .groupBy("event_type", "day")
        .agg(F.sum("v").alias("day_total_d"))
    )
    w = Window.partitionBy("event_type")
    n = F.count(F.lit(1)).over(w)
    s = F.sum("day_total_d").over(w).cast("double")
    ss = F.sum((F.col("day_total_d") * F.col("day_total_d"))
               .cast("decimal(38,4)")).over(w).cast("double")
    x = F.col("day_total_d").cast("double")
    mean = s / n
    var = (ss - s * s / n) / (n - F.lit(1))
    z = (x - mean) / F.sqrt(var)
    return (
        daily.withColumn("z", z)
        .filter(F.abs("z") > 2.0)
        .select("event_type", F.date_format("day", "yyyy-MM-dd").alias("day"),
                x.alias("day_total"), "z")
    )


def cur_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style document quality gate: one verdict row per document
    with the FIRST failing rule (rule order fixed), or 'kept'. Rules —
    all integer/rational arithmetic, so the differential hash is exact:
    too_short (< 20 tokens), too_repetitive (distinct/total tokens
    <= 0.5 — boilerplate/loop detector), low_stopword (< 2% stopword
    tokens — the C4 naturalness heuristic).

    Scale: shuffle-free row-local codegen (token counts via size/
    array_distinct/filter on the token array, no explode) — streams at
    scan speed like the rest of the curation family.
    """
    from dht11_data_pipeline_spark.functions.text import STOPWORDS

    docs = load_table(spark, sf_dir, "documents")
    tok = tokens("text")
    stop = F.array([F.lit(s) for s in STOPWORDS])
    n_tok = F.size(tok)
    n_unique = F.size(F.array_distinct(tok))
    n_stop = F.size(F.filter(tok, lambda t: F.array_contains(stop, t)))
    reason = (
        F.when(n_tok < 20, "too_short")
        .when(n_unique * 2 <= n_tok, "too_repetitive")
        .when(n_stop * 50 < n_tok, "low_stopword")
        .otherwise("kept")
    )
    return docs.select(
        "doc_id",
        n_tok.cast("int").alias("n_tokens"),
        n_unique.cast("int").alias("n_unique"),
        n_stop.cast("int").alias("n_stopwords"),
        reason.alias("reason"),
        F.when(reason == "kept", "Y").otherwise("N").alias("keep_flag"),
    )


def dedup_bloom_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter front door for incremental dedup: an ingestion
    batch (even doc_ids) probed against a filter built from the store
    (doc_id % 3 != 0). The splits overlap on purpose — ids ≡ 2,4 mod 6
    are replayed documents already in the store (the reference's
    late/duplicate idempotency case, SURVEY §2.9 T2) and must come back
    ``dup``; ids ≡ 0 mod 6 are genuinely new and come back ``clean``
    (or ``false_positive`` on a bloom collision). Hits are
    exact-verified; misses are provably unseen — the 100 TB shape where
    each batch pays a broadcast-size bit-array probe instead of a full
    store join."""
    docs = load_table(spark, sf_dir, "documents")
    store = docs.filter(F.col("doc_id") % 3 != 0)
    batch = docs.filter(F.col("doc_id") % 2 == 0)
    return dedup.bloom_probe_new_docs(store, batch)


def cur_gopher_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style quality rules (Rae et al. 2021, adapted thresholds)
    with a first-failing-rule verdict per document. All integer /
    rational arithmetic → exact differential hash:

    - too_few_tokens:  n_tokens < 25
    - word_length:     mean token length outside [3, 10]  (compared as
      (n_chars - n_tokens + 1) vs 3·n_tokens / 10·n_tokens — chars
      minus separators over tokens, exact for the space-joined corpus)
    - low_alpha:       < 80% of tokens contain an alphabetic character
    - low_stopword:    < 2 distinct stopwords present

    Shuffle-free row-local codegen (array ops, no explode), like the
    rest of the curation family."""
    from dht11_data_pipeline_spark.functions.text import STOPWORDS

    docs = load_table(spark, sf_dir, "documents")
    tok = tokens("text")
    n_tok = F.size(tok)
    n_chars = F.length("text")
    sum_len = n_chars - n_tok + 1
    n_alpha = F.size(F.filter(tok, lambda t: t.rlike("[a-z]")))
    stop = F.array([F.lit(s) for s in STOPWORDS])
    n_stop_distinct = F.size(F.array_intersect(F.array_distinct(tok), stop))
    reason = (
        F.when(n_tok < 25, "too_few_tokens")
        .when((sum_len < 3 * n_tok) | (sum_len > 10 * n_tok), "word_length")
        .when(n_alpha * 5 < n_tok * 4, "low_alpha")
        .when(n_stop_distinct < 2, "low_stopword")
        .otherwise("kept")
    )
    return docs.select(
        "doc_id",
        n_tok.cast("int").alias("n_tokens"),
        sum_len.cast("int").alias("sum_token_len"),
        n_alpha.cast("int").alias("n_alpha_tokens"),
        n_stop_distinct.cast("int").alias("n_stop_distinct"),
        reason.alias("reason"),
        F.when(reason == "kept", "Y").otherwise("N").alias("keep_flag"),
    )


def dedup_common_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-level dedup signal: verbatim 8-token spans shared by
    ≥ 2 distinct documents (boilerplate document-level dedup misses).
    One shuffle on the gram; row-local gram construction."""
    docs = load_table(spark, sf_dir, "documents")
    return textops.duplicated_spans(docs, k=8)


def dedup_span_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc fraction of tokens inside cross-document duplicated
    8-token spans, with a drop flag at ≥ 50% coverage."""
    docs = load_table(spark, sf_dir, "documents")
    return textops.span_coverage(docs, k=8)


def j_fuzzy_part_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution over the part catalog: brand-blocked fuzzy
    self-join, edit distance <= 2, graded exact/near."""
    from dht11_data_pipeline_spark.operators import linkage
    part = load_table(spark, sf_dir, "part")
    return linkage.blocked_fuzzy_pairs(
        part, ["p_brand"], "p_name", "p_partkey", max_dist=2)


def t_event_type_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item collaborative-filtering affinity: cosine between
    event-type interaction-count vectors indexed by user."""
    from dht11_data_pipeline_spark.operators import cooccur
    events = load_table(spark, sf_dir, "events")
    return cooccur.item_affinity(events, "user_id", "event_type")


def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer-arithmetic PageRank (5 iterations, damping 850/1000)
    over the semantic near-dup graph — the centrality/quality signal
    attached to every vector; isolated vectors settle at the 150000
    ppm baseline."""
    emb = load_table(spark, sf_dir, "embeddings")
    pairs = similarity.embedding_near_duplicates_multiprobe(
        emb, threshold=0.4)
    return graph.pagerank_integer(
        emb.select(F.col("vec_id")), pairs, iters=5, node_col="vec_id",
    ).withColumnRenamed("node", "vec_id")


def mm_audio_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode, no stub: each document's bytes synthesize an
    actual mono 16-bit PCM WAV (vendored RIFF codec), whose container
    is then chunk-walked back into integer signal features — synthesize
    -> decode, all inside Arrow batches. All-integer features, so the
    oracle reproduces the decode arithmetic from the text bytes."""
    docs = load_table(spark, sf_dir, "documents")
    return multimodal.audio_features(
        multimodal.attach_audio_payload(docs, rate=8000))


def mm_audio_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL decode + nearest-neighbor resample (8 kHz -> 3 kHz) +
    re-encode of the WAV column. The checksum column is dropped here
    (raw bytes aren't expressible to the SQL oracle); the byte-level
    roundtrip is pinned in tests/test_audiocodec."""
    docs = load_table(spark, sf_dir, "documents")
    return multimodal.resample_audio(
        multimodal.attach_audio_payload(docs, rate=8000), out_rate=3000,
    ).select("doc_id", "rate_in", "rate_out", "n_in", "n_out")


def j_entity_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Master-data entity resolution end to end: brand-blocked fuzzy
    pairs -> transitive closure -> every part labeled with its entity
    (min member key), canonical flag, and entity size. The golden-
    record pipeline: linkage.blocked_fuzzy_pairs feeds
    graph.cluster_documents unchanged."""
    from dht11_data_pipeline_spark.operators import linkage
    part = load_table(spark, sf_dir, "part")
    pairs = linkage.blocked_fuzzy_pairs(
        part, ["p_brand"], "p_name", "p_partkey", max_dist=2
    ).select(F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b"))
    labeled = graph.cluster_documents(part, pairs, id_col="p_partkey")
    w = Window.partitionBy("cluster_id")
    return labeled.select(
        "p_partkey",
        F.col("cluster_id").alias("entity_id"),
        "is_canonical",
        F.count(F.lit(1)).over(w).cast("int").alias("n_members"),
    )


def t_journey_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CEP-style journey analysis: each user's event-type initials in
    time order, with non-overlapping adjacency-pattern counts and
    first-purchase position."""
    from dht11_data_pipeline_spark.operators import sequence
    events = load_table(spark, sf_dir, "events")
    return sequence.journey_patterns(events, {
        "n_view_click": "vc",
        "n_click_purchase": "cp",
        "n_error_after_signup": "se",
    })


def ts_trend_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer-exact least-squares trend of daily spend (cents) per
    event type over the day-of-month axis."""
    from dht11_data_pipeline_spark.operators import sequence
    events = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.dayofmonth(F.col("ts").cast("timestamp")).alias("day_x"),
        F.col("value").cast("decimal(18,2)").alias("v"))
    return sequence.linear_trend(
        events, "event_type", "day_x",
        (F.sum("v") * 100).cast("bigint"))


def ts_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical seasonal decomposition of daily spend per event type:
    trend = centered 7-day moving average, seasonal = day-of-week mean
    of the detrended series, residual = the rest.

    Float discipline so both engines agree bit-for-bit: the moving-sum
    runs over DECIMAL(18,2) day totals (exact, associative — immune to
    DuckDB's segment-tree frame evaluation reordering a double sum),
    the detrended values are rounded to 6 places and re-decimalized
    before the day-of-week average, and every emitted float is a
    single division or rounding of identical inputs. Seasonal means
    are WINDOWS over the daily frame — no join back through the fact
    scan. Edge days (incomplete 7-day window) emit NULL trend/resid
    and are excluded from the seasonal means."""
    ev = load_table(spark, sf_dir, "events")
    daily = (ev.groupBy(
        "event_type",
        F.col("ts").cast("timestamp").cast("date").alias("day"))
        .agg(F.sum(F.col("value").cast("decimal(18,2)"))
             .alias("total_d")))
    w7 = (Window.partitionBy("event_type").orderBy("day")
          .rowsBetween(-3, 3))
    t = (daily
         .withColumn("sum7", F.sum("total_d").over(w7))
         .withColumn("cnt7", F.count("total_d").over(w7))
         .withColumn("trend", F.when(
             F.col("cnt7") == 7,
             F.col("sum7").cast("double") / F.lit(7.0)))
         .withColumn("dow", F.expr("weekday(day)").cast("int"))
         .withColumn("detr", F.when(
             F.col("trend").isNotNull(),
             F.round(F.col("total_d").cast("double") - F.col("trend"), 6)
             .cast("decimal(18,6)"))))
    w_dow = Window.partitionBy("event_type", "dow")
    out = (t
           .withColumn("seasonal", F.sum("detr").over(w_dow).cast("double")
                       / F.count("detr").over(w_dow))
           .select(
               "event_type",
               F.date_format("day", "yyyy-MM-dd").alias("day"),
               "dow",
               F.col("total_d").cast("double").alias("day_total"),
               F.round("trend", 4).alias("trend"),
               F.round("seasonal", 4).alias("seasonal"),
               F.round(F.col("total_d").cast("double") - F.col("trend")
                       - F.col("seasonal"), 4).alias("resid")))
    return out


def cur_dup_aware_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplication-aware sampling: keep each doc with probability
    1/|its exact-dup cluster| — every distinct content contributes one
    expected copy, deterministically."""
    docs = load_table(spark, sf_dir, "documents")
    return curation.dup_aware_sample(docs)


def ts_changepoint_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer-exact CUSUM change-point of daily spend per event type:
    the day where the cumulative deviation from the series mean peaks."""
    from dht11_data_pipeline_spark.operators import sequence
    events = load_table(spark, sf_dir, "events")
    daily = (events.groupBy(
        "event_type",
        F.dayofmonth(F.col("ts").cast("timestamp")).alias("day_x"))
        .agg((F.sum(F.col("value").cast("decimal(18,2)")) * 100)
             .cast("bigint").alias("cents")))
    return sequence.cusum_changepoint(daily, "event_type", "day_x", "cents")


def mm_audio_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full multimodal retrieval pipeline in one plan: synthesize
    WAV -> REAL decode -> amplitude-class histogram embedding -> exact
    cosine top-3 for every 100th document. Integer-count embeddings
    keep both engines' scores bit-identical."""
    docs = load_table(spark, sf_dir, "documents")
    emb = multimodal.audio_embed(
        multimodal.attach_audio_payload(docs, rate=8000), dim=16).persist()
    # persist: the corpus and query sides would otherwise each re-run
    # the synthesize->decode->embed Python chain; checkpoint the
    # (small) top-k result and release the embedding cache
    queries = emb.filter(F.col("doc_id") % 100 == 0)
    out = similarity.cosine_topk(emb, queries, k=3, id_col="doc_id",
                                 vec_col="embedding").localCheckpoint(eager=True)
    emb.unpersist()
    return out


def cur_reservoir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 100-doc-per-source uniform sample via the salted
    two-phase reservoir (hot-source-safe top-k plan)."""
    docs = load_table(spark, sf_dir, "documents")
    return curation.reservoir_salted(docs, group_col="source", k=100)


def sim_prototype_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prototypicality pruning: rank every embedding by cosine to its
    label centroid; flag the farthest 10% of each label for drop."""
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.prototype_prune(emb, prune_pct=10)


def text_dsir_weight(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR hashed-bigram importance score per document against the
    lang='en' target slice (integer ppm ratios)."""
    docs = load_table(spark, sf_dir, "documents")
    return textops.dsir_weights(docs, target_col="lang", target_value="en")


def cur_end_to_end(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole curation pipeline as ONE declarative plan — the
    composition a corpus run actually executes, with per-doc stage
    attribution. Stages in cost order (cheap row-local gates first so
    each expensive stage sees only survivors):

    1. quality:<reason> — C4-style gate (cur_quality_filter rules)
    2. exact_dup        — content-hash window among quality survivors
                          (later ids of each identical-content group)
    3. near_dup         — minhash-LSH verified Jaccard ≥ 0.5 among
                          exact survivors (later member of each pair)
    4. over_budget      — per-source greedy token budget (60% of the
                          surviving stratum's tokens, deterministic
                          hash order, exclusive prefix sum — the
                          cur_sample_mixture discipline)
    5. kept

    The verdict table is the disjoint union of the stage kill sets —
    every input doc appears exactly once. Scale: stage 1 is shuffle-
    free; stage 2 shuffles surviving (hash, id) pairs once; stage 3 is
    the sub-quadratic LSH pipeline on a reduced pool; stage 4 windows
    at source grain."""
    from dht11_data_pipeline_spark.functions.text import STOPWORDS

    docs = load_table(spark, sf_dir, "documents")
    tok = tokens("text")
    stop = F.array([F.lit(s) for s in STOPWORDS])
    n_tok = F.size(tok)
    n_unique = F.size(F.array_distinct(tok))
    n_stop = F.size(F.filter(tok, lambda t: F.array_contains(stop, t)))
    q_reason = (
        F.when(n_tok < 20, "too_short")
        .when(n_unique * 2 <= n_tok, "too_repetitive")
        .when(n_stop * 50 < n_tok, "low_stopword")
        .otherwise("kept")
    )
    base = docs.select("doc_id", "source", "text",
                       n_tok.cast("int").alias("n_tokens"),
                       q_reason.alias("q_reason"))
    q_failed = base.filter(F.col("q_reason") != "kept").select(
        "doc_id", "source", "n_tokens",
        F.concat(F.lit("quality:"), F.col("q_reason")).alias("verdict"))

    pool_q = base.filter(F.col("q_reason") == "kept")
    wh = Window.partitionBy(F.sha2("text", 256))
    marked = pool_q.withColumn("_min_id", F.min("doc_id").over(wh))
    exact_killed = marked.filter(F.col("doc_id") != F.col("_min_id")).select(
        "doc_id", "source", "n_tokens", F.lit("exact_dup").alias("verdict"))
    pool_e = marked.filter(F.col("doc_id") == F.col("_min_id")).drop("_min_id")

    near_ids = (dedup.minhash_near_duplicates(
        pool_e.select("doc_id", "text"), threshold=0.5)
        .select(F.col("doc_b").alias("doc_id")).distinct())
    near_killed = pool_e.join(near_ids, "doc_id").select(
        "doc_id", "source", "n_tokens", F.lit("near_dup").alias("verdict"))
    pool_n = pool_e.join(near_ids, "doc_id", "left_anti")

    hashed = pool_n.withColumn(
        "_h", F.sha2(F.concat_ws("\x1f", F.lit("e2e"),
                                 F.col("doc_id").cast("string")), 256))
    w_before = (Window.partitionBy("source").orderBy("_h", "doc_id")
                .rowsBetween(Window.unboundedPreceding, -1))
    w_total = Window.partitionBy("source")
    budgeted = (
        hashed
        .withColumn("_before", F.coalesce(
            F.sum("n_tokens").over(w_before), F.lit(0)))
        .withColumn("_total", F.sum("n_tokens").over(w_total))
        .select("doc_id", "source", "n_tokens",
                F.when(F.col("_before") * 10 >= F.col("_total") * 6,
                       "over_budget").otherwise("kept").alias("verdict"))
    )
    out = q_failed.unionByName(exact_killed).unionByName(
        near_killed).unionByName(budgeted)
    return out.withColumn(
        "keep_flag", F.when(F.col("verdict") == "kept", "Y").otherwise("N"))


def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector triangle counts over the multiprobe near-dup graph
    (threshold 0.25 — the same edge generator as graph_pagerank, opened
    up so closed triads exist at fixture scale). Triangle membership is
    the boilerplate-community signal: a clique of mutual near-dups is a
    far stronger removal candidate than a chain of pairwise matches.
    Degree-ordered wedge enumeration (operators/graph.triangle_counts)
    — each triangle found once at its rank-minimum corner, hub fan-out
    bounded O(sqrt(E))."""
    emb = load_table(spark, sf_dir, "embeddings")
    pairs = similarity.embedding_near_duplicates_multiprobe(
        emb, threshold=0.25)
    return (graph.triangle_counts(pairs, assume_canonical=True)
            .withColumnRenamed("node", "vec_id"))


def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc 3-gram novelty vs everything earlier in ingestion order
    (min-doc-id first occurrence): the dataset-growth signal — novelty
    collapsing toward 0 means the crawl is re-reading, not growing."""
    docs = load_table(spark, sf_dir, "documents")
    return textops.ngram_novelty(docs)


def cur_survivorship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-ranked survivorship over near-dup clusters: instead of
    keeping the minimum-id member, each minhash cluster keeps its BEST
    member by a deterministic integer policy (most distinct tokens,
    then longest, then lowest id) — the production answer to "which
    copy of the duplicate do we train on". One window pass over the
    cluster labels joined to codegen'd per-doc features."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup.minhash_near_duplicates(docs, threshold=0.5)
    clusters = graph.cluster_documents(docs, pairs)
    feats = docs.select(
        "doc_id",
        F.size(F.array_distinct(F.split(F.col("text"), " ")))
        .alias("n_unique_tokens"),
        F.length("text").alias("n_chars"))
    w = Window.partitionBy("cluster_id").orderBy(
        F.col("n_unique_tokens").desc(), F.col("n_chars").desc(),
        F.col("doc_id").asc())
    return (clusters.join(feats, "doc_id")
            .withColumn("_rn", F.row_number().over(w))
            .select("doc_id", "cluster_id", "n_unique_tokens", "n_chars",
                    F.when(F.col("_rn") == 1, "Y").otherwise("N")
                    .alias("is_survivor")))


def graph_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman degree assortativity of the near-dup graph (threshold
    0.25, same deterministic edge set as the triangle family): one
    exact-integer-moment row answering "is this dedup graph
    boilerplate cliques (r > 0) or template hubs (r < 0)"."""
    emb = load_table(spark, sf_dir, "embeddings")
    pairs = similarity.embedding_near_duplicates_multiprobe(
        emb, threshold=0.25)
    return graph.degree_assortativity(pairs, assume_canonical=True)


def graph_clustering_coeff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local clustering coefficient (ppm, exact integer) over the same
    near-dup graph as graph_triangle_count: cc ≈ 1e6 marks boilerplate
    FAMILIES (neighborhood is a clique — drop all but one member),
    cc ≈ 0 marks hub nodes whose matches are mutually unrelated (often
    a template false-positive worth auditing)."""
    emb = load_table(spark, sf_dir, "embeddings")
    pairs = similarity.embedding_near_duplicates_multiprobe(
        emb, threshold=0.25)
    return (graph.clustering_coefficient(pairs, assume_canonical=True)
            .withColumnRenamed("node", "vec_id"))


def ts_ewma_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average (α = 1/2) of each user's
    event values — time-series smoothing in EXACT fixed-point integer
    arithmetic: y_t = (Σ c_i·2^(i-1)) DIV 2^t over cents, so the
    sequential recurrence becomes ONE prefix sum any engine reproduces
    bit-for-bit (no float accumulation order to drift). Sequences are
    capped at the first 40 events per user (2^39·cents stays far inside
    int64); one shuffle on user_id, per-user sort reused by both the
    row-number and the prefix-sum window."""
    from dht11_data_pipeline_spark.operators.sequence import fixed_point_ewma
    ev = load_table(spark, sf_dir, "events")
    return fixed_point_ewma(ev, max_steps=40)


def mm_image_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash image dedup over the synthesized PPM column:
    REAL decode → 8×8 NN resample → integer grayscale → mean-threshold
    aHash, split into two positive 32-bit halves, then exact-hash
    grouping (count + canonical min doc id per hash). The oracle
    reproduces the hash bit-for-bit from the synthesis rule (ASCII
    corpus: char index == byte index)."""
    docs = load_table(spark, sf_dir, "documents")
    ph = multimodal.phash_payloads(
        multimodal.attach_image_payload(docs, width=32))
    w = Window.partitionBy("phash_hi", "phash_lo")
    return ph.select(
        "doc_id", "width", "height", "phash_hi", "phash_lo",
        F.count(F.lit(1)).over(w).alias("n_same_hash"),
        F.min("doc_id").over(w).alias("canonical_id"))


def mm_phash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-duplicate pairs: perceptual hashes within Hamming
    distance 3, found via the 16-bit-chunk pigeonhole join (the
    simhash trick applied to the image modality) and verified with
    exact bit_count(xor) — never an N² scan."""
    docs = load_table(spark, sf_dir, "documents")
    ph = multimodal.phash_payloads(
        multimodal.attach_image_payload(docs, width=32))
    return dedup.phash_hamming_pairs(ph, max_hamming=3)


def text_kn_trigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-trained Kneser-Ney trigram LM statistics (integer ppm,
    D=0.75): top-100 trigrams with discounted probability and
    continuation counts — the full-strength n-gram fluency model next
    to the char-bigram proxy (text_bigram_rarity)."""
    docs = load_table(spark, sf_dir, "documents")
    return textops.kn_trigram(docs, top_n=100)


def text_rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyword extraction: stopword/punctuation-delimited
    candidate phrases scored by summed deg/freq of member words
    (integer ppm), top 3 per document — the unsupervised what-is-this-
    doc-about signal next to tf-idf (corpus-relative) and BM25
    (query-relative)."""
    docs = load_table(spark, sf_dir, "documents")
    return textops.rake_keywords(docs, top_n=3)


def graph_adamic_adar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adamic-Adar link prediction over the near-dup graph: common
    neighbors weighted by 1e6 DIV their degree (exact integers) — a
    low-degree shared neighbor certifies a template-family pair far
    more strongly than a hub, so high-aa_ppm is_edge='N' rows are the
    highest-precision re-probe candidates (sharper than the unweighted
    jaccard list graph_link_prediction emits)."""
    emb = load_table(spark, sf_dir, "embeddings")
    pairs = similarity.embedding_near_duplicates_multiprobe(
        emb, threshold=0.25)
    return graph.adamic_adar(pairs, assume_canonical=True)


def graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core decomposition (k=3, peel to fixpoint, 30-round cap) over the
    near-dup graph: the maximal subgraph where every member has >= 3
    mutual near-dup neighbors — the dense template FAMILY detector.
    in_kcore='Y' marks docs to dedup as a UNIT (keep one exemplar per
    core component); the oracle unrolls the identical 30 capped rounds
    while Spark exits early at the fixpoint (skipped rounds are exact
    no-ops — see graph.kcore_peel)."""
    emb = load_table(spark, sf_dir, "embeddings")
    pairs = similarity.embedding_near_duplicates_multiprobe(
        emb, threshold=0.25)
    return (graph.kcore_peel(pairs, k=3, max_rounds=30, assume_canonical=True)
            .withColumnRenamed("node", "vec_id"))


def sim_matryoshka_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka (prefix-dimension) two-stage ANN for the standard
    query set: top-20 candidates by 16-dim prefix cosine, exact 64-dim
    rerank to top-5 — the MRL cheap-filter/exact-rerank cascade, both
    ranking windows engine-exact (ROUND(sim,4) + id tie-breaks)."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    return similarity.matryoshka_topk(
        emb, queries, k=5, prefix_dim=16, overfetch=4)


def graph_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neighbor-set Jaccard over the near-dup graph: second-order dedup
    / link prediction. is_edge='N' rows with high jaccard_ppm are
    template-family pairs the direct LSH pass missed — the standard
    re-probe candidate list."""
    emb = load_table(spark, sf_dir, "embeddings")
    pairs = similarity.embedding_near_duplicates_multiprobe(
        emb, threshold=0.25)
    return graph.neighbor_jaccard(pairs, assume_canonical=True)


def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric n-gram containment ≥ 0.5: detects docs mostly
    EMBEDDED in another (quotes, excerpts, truncated re-crawls) that
    symmetric Jaccard under-scores. One a<b inverted-index join,
    emitted in both directions with per-direction denominators."""
    docs = load_table(spark, sf_dir, "documents")
    return dedup.containment_pairs(docs, n=3, threshold=0.5)


def text_bigram_rarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-trained character-bigram LM surprisal proxy (integer
    KenLM stand-in): rarity = 1e6 DIV p(b|a) summed per doc, DIV'd by
    bigram count. The cheap perplexity-style quality filter; gibberish
    and base64 blobs score high, fluent text low."""
    docs = load_table(spark, sf_dir, "documents")
    return textops.bigram_rarity(docs)


def t_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marketing-style conversion attribution over the event stream:
    every purchase credits its value to the SAME user's first and last
    non-purchase touch in the preceding 7 days (first-touch and
    last-touch models side by side). Range join on (user, 7-day
    window) then one per-conversion window pass computing BOTH row
    numbers — a touch that is simultaneously first and last (single
    touch) explodes into both model rows, so the union costs a
    projection, not a second join. Revenue sums go through
    DECIMAL(18,2) so accumulation is exact and engine-reproducible.
    At scale: pre-bucket events by user_id so the self-join is
    shuffle-free; the window is per-conversion (no global sort)."""
    ev = load_table(spark, sf_dir, "events")
    conv = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("c_user"), F.col("event_id").alias("conv_id"),
        F.col("ts").alias("conv_ts"), F.col("value").alias("conv_value"))
    touch = ev.filter(F.col("event_type") != "purchase").select(
        F.col("user_id").alias("t_user"), F.col("event_id").alias("touch_id"),
        F.col("ts").alias("touch_ts"), F.col("event_type").alias("touch_type"))
    j = conv.join(
        touch,
        (F.col("c_user") == F.col("t_user"))
        & (F.col("touch_ts") <= F.col("conv_ts"))
        & (F.col("touch_ts") >= F.col("conv_ts") - F.expr("INTERVAL 7 DAYS")))
    w_first = Window.partitionBy("conv_id").orderBy(
        F.col("touch_ts").asc(), F.col("touch_id").asc())
    w_last = Window.partitionBy("conv_id").orderBy(
        F.col("touch_ts").desc(), F.col("touch_id").desc())
    flagged = (j.withColumn("rn_f", F.row_number().over(w_first))
               .withColumn("rn_l", F.row_number().over(w_last))
               .filter((F.col("rn_f") == 1) | (F.col("rn_l") == 1)))
    credited = flagged.select(
        "touch_type", "conv_value",
        F.explode(F.filter(
            F.array(F.when(F.col("rn_f") == 1, F.lit("first_touch")),
                    F.when(F.col("rn_l") == 1, F.lit("last_touch"))),
            lambda x: x.isNotNull())).alias("model"))
    return (credited.groupBy("model", "touch_type")
            .agg(F.count(F.lit(1)).alias("n_conversions"),
                 F.sum(F.col("conv_value").cast("decimal(18,2)"))
                 .cast("double").alias("credited_value")))


def ts_holt_winters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt's linear-trend double exponential smoothing (α = β = ½)
    over each user's first 16 events, in exact 4^t-scaled integer
    arithmetic — the trend-aware upgrade of ts_ewma_user_value. The
    coupled recurrence is genuinely sequential, so this is the Arrow
    applyInPandas path (one shuffle on user_id, Python-integer fold);
    the oracle replays it with a recursive CTE. See
    operators/sequence.holt_winters_trend for the scaling proof."""
    from dht11_data_pipeline_spark.operators.sequence import (
        holt_winters_trend)
    ev = load_table(spark, sf_dir, "events")
    return holt_winters_trend(ev, max_steps=16)


def a_countmin_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch (d=4, w=64) over event user-ids, with the
    point estimate for every distinct user next to its true count —
    the mergeable frequency sketch a streaming rollup keeps instead of
    a full per-key map. The sketch is d·w cells regardless of corpus
    size; estimates are engine-exact because the bucket hashes are
    multiply-mod arithmetic, not an engine hash."""
    from dht11_data_pipeline_spark.operators.sketches import (
        countmin_frequencies)
    ev = load_table(spark, sf_dir, "events")
    return (countmin_frequencies(ev, "user_id")
            .withColumnRenamed("key", "user_id"))


def a_kmv_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (bottom-64) audience-overlap estimation between every pair
    of event types: estimated Jaccard of their distinct-user sets from
    64-hash sketches — the constant-space alternative to a full
    distinct-user self-join at 100 TB. Integer ppm estimates,
    bit-for-bit reproducible (multiply-mod member hash)."""
    from dht11_data_pipeline_spark.operators.sketches import (
        kmv_pairwise_jaccard)
    ev = load_table(spark, sf_dir, "events")
    return kmv_pairwise_jaccard(ev, "event_type", "user_id")


def t_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov model of user behavior: event-type transition
    counts and probabilities (integer ppm) over each user's
    time-ordered stream. One shuffle on user_id for the lag window,
    then a tiny groupBy on (prev, curr) — the per-prev normalizing
    total comes from a window over the aggregated frame (no join-back,
    SCALE.md decorrelation rule)."""
    ev = load_table(spark, sf_dir, "events")
    # raw ts ordering (nanos-exact) — same convention as the EWMA pair
    w = Window.partitionBy("user_id").orderBy(F.col("ts"), F.col("event_id"))
    trans = (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wt = Window.partitionBy("prev_type")
    return trans.select(
        "prev_type", "next_type", "n",
        F.sum("n").over(wt).alias("prev_total"),
        F.expr("n * 1000000 DIV sum(n) OVER (PARTITION BY prev_type)")
        .alias("p_ppm"),
    )


def mm_audio_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Energy-delta acoustic fingerprint over the synthesized WAV
    column: REAL RIFF decode → 8-sample frame energies → rising-energy
    bits packed into two positive 32-bit halves — the audio twin of
    mm_image_phash. Integer end to end; the oracle replays the bits
    from the synthesis rule (sample = (ascii−128)·256)."""
    docs = load_table(spark, sf_dir, "documents")
    return multimodal.audio_fingerprint(
        multimodal.attach_audio_payload(docs, rate=8000))


def mm_audio_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio near-duplicate pairs: fingerprints within Hamming
    distance 2, BLOCKED on n_frames (duration) — same pigeonhole
    16-bit-chunk join as the image path, with the duration block both
    tightening semantics (different-length fingerprints never pair)
    and shrinking buckets. Degenerate fingerprints are dropped before
    pairing (ADVICE r4): a doc with < 2 frames or an all-zero
    fingerprint carries no acoustic signal, and at scale every such
    doc in a length bucket pairs with every other — a quadratic
    blowup producing meaningless \"duplicates\"."""
    docs = load_table(spark, sf_dir, "documents")
    fp = (multimodal.audio_fingerprint(
              multimodal.attach_audio_payload(docs, rate=8000))
          .filter((F.col("n_frames") >= 2)
                  & ((F.col("fp_hi") != 0) | (F.col("fp_lo") != 0))))
    return dedup.phash_hamming_pairs(
        fp, hi_col="fp_hi", lo_col="fp_lo", max_hamming=2,
        block_cols=("n_frames",))


def o_revenue_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer revenue deciles: per-customer order revenue tiled into
    10 exact NTILE buckets, reported as one row per decile (count,
    total, min/max). Revenue goes through DECIMAL(18,2) (the _money
    discipline) so the tiling order is exact; the decile assignment
    ties on custkey so it is deterministic on both engines.

    Scale: the tiling is operators.ranking.global_ntile — a range-
    partitioned parallel sort plus an O(#partitions) offset frame —
    so unlike a plain NTILE window there is no single task sorting
    the whole customer base; the oracle's NTILE(10) OVER (ORDER BY)
    is the verbatim semantic twin."""
    from dht11_data_pipeline_spark.operators.ranking import global_ntile

    o = load_table(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev_d"))
    tiled = global_ntile(
        per_cust, 10, [F.col("rev_d").desc(), F.col("o_custkey")], "decile")
    return (tiled.groupBy("decile")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_customers"),
                 F.sum("rev_d").cast("double").alias("total_revenue"),
                 F.min("rev_d").cast("double").alias("min_revenue"),
                 F.max("rev_d").cast("double").alias("max_revenue")))


def o_customer_revenue_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full customer revenue leaderboard: every customer's exact
    ROW_NUMBER by total order revenue (DECIMAL-exact), descending,
    custkey tiebreak — plus their cumulative share of total revenue
    expressed in exact basis points (the 'what fraction of revenue do
    the top N customers hold' curve).

    Scale: rank AND running total come from
    operators.ranking.global_rank_cumsum in one distributed pass —
    range-partitioned parallel sort, O(#partitions) count/value prefix
    frame, within-partition running totals — never the single-task
    SUM-OVER-(ORDER BY) window the oracle uses as its semantic twin.
    Revenue is integer cents end-to-end; total revenue is a 1-row
    broadcast aggregate (global-scalar rule); the share is one integer
    DIV at the end."""
    from dht11_data_pipeline_spark.operators.ranking import global_rank_cumsum

    o = load_table(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev_d"))
    # cents: BIGINT-exact revenue so the cumulative sum is integer math
    cents = per_cust.select(
        "o_custkey", (F.col("rev_d") * 100).cast("bigint").alias("rev_cents"))
    ranked = global_rank_cumsum(
        cents, [F.col("rev_cents").desc(), F.col("o_custkey")],
        "rev_cents", "rank", "cum_cents")
    # total revenue == the last rank's running total; aggregating the
    # (checkpointed) ranked frame reads cached partitions instead of
    # re-scanning orders through the groupBy a cents.agg() would cost
    total = ranked.agg(F.max("cum_cents").alias("_total_cents"))
    return (ranked.crossJoin(F.broadcast(total))
            .select(
                "o_custkey", "rank", "rev_cents",
                F.expr("CAST((10000 * cum_cents) DIV _total_cents AS BIGINT)")
                .alias("cum_share_bp")))


_XCORR_LAGS = (0, 1, 2, 3)


def ts_cross_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lead/lag cross-correlation: for every non-purchase event type,
    Pearson r between its daily total on day d and the PURCHASE daily
    total on day d+L, L = 0..3 calendar days — the "does engagement
    today predict revenue in L days" probe that decides attribution
    windows. Same DECIMAL-exact-moments discipline as
    ts_autocorrelation (identical five double ops + sqrt on both
    engines, NULL on constant series); the lag is a calendar-day
    equi-join (day+L), so date gaps drop pairs identically on both
    engines rather than silently sliding rows.

    Scale: one partial agg to day×type, then joins and moments over
    the tiny daily frame; the purchase series broadcasts."""
    ev = load_table(spark, sf_dir, "events")
    daily = (ev.select(
        "event_type",
        F.col("ts").cast("timestamp").cast("date").alias("day"),
        F.col("value").cast("decimal(18,2)").alias("v"))
        .groupBy("event_type", "day")
        .agg(F.sum("v").alias("total_d")))
    purch = (daily.filter(F.col("event_type") == "purchase")
             .select(F.col("day").alias("p_day"),
                     F.col("total_d").alias("y_d")))
    lead = daily.filter(F.col("event_type") != "purchase").select(
        "event_type", "total_d",
        F.explode(F.array(*[F.struct(
            F.lit(lag).alias("lag"),
            F.date_add("day", lag).alias("p_day"))
            for lag in _XCORR_LAGS])).alias("l")
    ).select("event_type", F.col("l.lag").alias("lag"),
             F.col("l.p_day").alias("p_day"),
             F.col("total_d").alias("x_d"))
    pairs = lead.join(F.broadcast(purch), "p_day")
    m = pairs.groupBy("event_type", "lag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.sum("x_d").cast("double").alias("sx"),
        F.sum("y_d").cast("double").alias("sy"),
        F.sum((F.col("x_d") * F.col("y_d")).cast("decimal(38,4)"))
        .cast("double").alias("sxy"),
        F.sum((F.col("x_d") * F.col("x_d")).cast("decimal(38,4)"))
        .cast("double").alias("sxx"),
        F.sum((F.col("y_d") * F.col("y_d")).cast("decimal(38,4)"))
        .cast("double").alias("syy"))
    n = F.col("n_pairs")
    num = n * F.col("sxy") - F.col("sx") * F.col("sy")
    den = (F.sqrt(n * F.col("sxx") - F.col("sx") * F.col("sx"))
           * F.sqrt(n * F.col("syy") - F.col("sy") * F.col("sy")))
    return m.select(
        "event_type", F.col("lag").cast("int").alias("lag"), "n_pairs",
        F.when(den > 0, F.round(num / den, 4)).alias("xcorr"))


def text_bigram_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation extraction: corpus-wide lift of adjacent word pairs
    — lift = p(xy) / (p(x)·p(y)) with p(xy)=c_xy/M (bigram frequency)
    and p(x)=c_x/N (unigram frequency). The PMI-without-the-log form:
    every input to the final expression is an exact integer count, so
    both engines perform the identical multiplications and one
    division on identical doubles (no ln(), whose last ulp is libm-
    dependent). Bigrams below 5 occurrences are noise-filtered.

    Scale: two explodes (tokens, bigrams) into two counting
    aggregations; N and M are 1-row broadcast aggregates; the two
    unigram joins hash on the word — vocabulary-sized, not
    corpus-sized."""
    from dht11_data_pipeline_spark.functions.text import shingles

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(tokens("text").alias("w"))
    uni = (toks.select(F.explode("w").alias("word"))
           .groupBy("word").agg(F.count(F.lit(1)).alias("c")))
    big = (toks.select(F.explode(shingles(F.col("w"), 2)).alias("bg"))
           .groupBy("bg").agg(F.count(F.lit(1)).alias("c_xy"))
           .filter(F.col("c_xy") >= 5))
    n_tok = uni.agg(F.sum("c").alias("n_tok"))
    m_big = (toks.select((F.greatest(F.size("w") - 1, F.lit(0)))
                         .alias("nb"))
             .agg(F.sum("nb").alias("m_big")))
    split = big.select(
        "bg", "c_xy",
        F.split("bg", " ").getItem(0).alias("w1"),
        F.split("bg", " ").getItem(1).alias("w2"))
    joined = (split
              .join(uni.select(F.col("word").alias("w1"),
                               F.col("c").alias("c_x")), "w1")
              .join(uni.select(F.col("word").alias("w2"),
                               F.col("c").alias("c_y")), "w2")
              .crossJoin(F.broadcast(n_tok))
              .crossJoin(F.broadcast(m_big)))
    lift = ((F.col("c_xy").cast("double") * F.col("n_tok").cast("double")
             * F.col("n_tok").cast("double"))
            / (F.col("m_big").cast("double") * F.col("c_x").cast("double")
               * F.col("c_y").cast("double")))
    return joined.select(
        "w1", "w2",
        F.col("c_xy").cast("bigint").alias("c_xy"),
        F.col("c_x").cast("bigint").alias("c_x"),
        F.col("c_y").cast("bigint").alias("c_y"),
        F.round(lift, 4).alias("lift"))


def cur_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Importance-sampling gate: keep with probability proportional to
    document length (the weight a DSIR-style scorer would emit) at a
    50% base rate — deterministic integer-hash decision, so the kept
    subset is identical across runs, replays, and engines (no RNG).
    Completes the curation family: text_dsir_weight computes weights,
    this turns weights into an actual subset."""
    docs = load_table(spark, sf_dir, "documents")
    return curation.weighted_keep(docs, F.length("text"),
                                  rate_ppm=500_000)


def cur_cluster_balanced(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space mixture balancing (operators/curation.
    cluster_balanced_sample): assign every embedding to its nearest of
    50 deterministic prototype centroids under INTEGER-quantized L2
    (engine-exact — floor(x*1000) int64 distances, tie → lowest id),
    then keep each cluster at a rate ∝ 1/cluster_size so every semantic
    cluster contributes the same expected count to the curated mix.

    Unlike sim_kmeans_clusters (whose float Lloyd assignment is only
    invariant-checkable), the whole chain here is integer arithmetic,
    so the oracle replays the EXACT per-cluster sizes, quotas and kept
    counts — a full hash-match on the balanced-mixture summary."""
    emb = load_table(spark, sf_dir, "embeddings")
    gated = curation.cluster_balanced_sample(emb, k=50,
                                             budget_ppm=200_000)
    return (gated.groupBy("cluster_id")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_in_cluster"),
                 F.max("keep_ppm").cast("bigint").alias("keep_ppm"),
                 F.sum(F.when(F.col("keep_flag") == "Y", 1).otherwise(0))
                 .cast("bigint").alias("n_kept")))


def cur_source_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source temperature mixing (operators/curation.
    source_temperature_sample, τ=2): each source kept at a rate
    ∝ 1/isqrt(source_size), anchored so the smallest source keeps at
    the full 500k ppm — sqrt-flattening the domain mix, the standard
    training-mix stage alongside cluster balancing and DSIR. The whole
    chain (exact Newton-corrected isqrt, integer DIV, sha256 hash gate)
    is engine-portable, so the oracle replays the EXACT per-source
    sizes, rates and kept counts — a full hash-match."""
    docs = load_table(spark, sf_dir, "documents")
    gated = curation.source_temperature_sample(docs, tau=2,
                                               rate_ppm=500_000)
    return (gated.groupBy("source")
            .agg(F.max("n_docs").cast("bigint").alias("n_docs"),
                 F.max("keep_ppm").cast("bigint").alias("keep_ppm"),
                 F.sum(F.when(F.col("keep_flag") == "Y", 1).otherwise(0))
                 .cast("bigint").alias("n_kept")))


def cur_epoch_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-constrained epoch planning (operators/curation.epoch_plan):
    a 1.5×-corpus token budget split UNIFORMLY per source, each source
    repeatable up to 4 epochs — capped (small) sources absorb their
    maximum and the surplus water-fills into the large ones, the
    repetition schedule a data-constrained training run plans with.
    Exact integer water-filling over the per-source frame, so the
    oracle replays the plan to the token — a full hash-match."""
    docs = load_table(spark, sf_dir, "documents")
    return curation.epoch_plan(docs, budget_ppm=1_500_000,
                               max_epochs_ppm=4_000_000)


def sim_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining (operators/similarity.hard_negative_topk):
    per query vector, the 3 most-similar vectors with a DIFFERENT
    label — the contrastive-training pairs an embedding model learns
    the most from. Same determinism contract as sim_cosine_topk
    (rounded sims, id tiebreaks); label exclusion is null-safe."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    return similarity.hard_negative_topk(emb, queries, k=3)


def text_doc_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document fluency under the corpus's own trigram LM
    (operators/textops.doc_lm_score): integer-ppm trigram MLE averaged
    over each doc's trigrams — the LM-filtering quality signal, exact
    in both engines (no logs, no floats)."""
    docs = load_table(spark, sf_dir, "documents")
    return textops.doc_lm_score(docs)


def cur_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum staging: every document assigned to one of 4 training
    stages by lexical-diversity quantile (type-token ratio in exact
    integer ppm, doc_id tiebreak) — easy/repetitive text first, diverse
    text last. The quantile is the DISTRIBUTED exact NTILE
    (operators/ranking.global_ntile_auto): no single-partition sort at
    any corpus size; the oracle states the same assignment as
    NTILE(4) OVER (ORDER BY ttr_ppm, doc_id)."""
    from dht11_data_pipeline_spark.operators.ranking import (
        global_ntile_auto)

    docs = load_table(spark, sf_dir, "documents")
    toks = F.expr("filter(split(text, ' '), t -> t != '')")
    scored = (docs
              .select("doc_id", toks.alias("tk"))
              .filter(F.size("tk") >= 1)
              .select("doc_id",
                      F.expr("(1000000 * CAST(size(array_distinct(tk)) "
                             "AS BIGINT)) DIV size(tk)")
                      .cast("bigint").alias("ttr_ppm")))
    staged = global_ntile_auto(
        scored, 4, [F.col("ttr_ppm"), F.col("doc_id")], "stage",
        n_rows=None)
    return staged.select("doc_id", "ttr_ppm",
                         F.col("stage").cast("int").alias("stage"))


def sim_label_knn_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN mislabel audit (operators/similarity.knn_label_audit):
    majority vote of each query's 5 nearest neighbors vs its own
    label — disagreements flag labeling errors. Vote ties elect the
    smallest label; the neighbor set inherits cosine_topk's
    determinism contract, so the oracle replays the votes exactly."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 10 == 0)
    return similarity.knn_label_audit(emb, queries, k=5)


def text_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary-coverage audit (operators/textops.oov_rate): per-doc
    share of tokens outside the corpus's top-20 vocabulary, in exact
    integer ppm. The vocab cut ranks the token-TYPE frame with the
    distributed global_row_number (a real vocabulary is 1e9 types at
    100 TB — never a single-partition window); the synthetic corpus
    has 31 types, so top-20 leaves real OOV mass to measure."""
    docs = load_table(spark, sf_dir, "documents")
    return textops.oov_rate(docs, vocab_size=20)


def cur_semantic_decontaminate(spark: SparkSession, sf_dir: str
                               ) -> DataFrame:
    """Embedding-space eval decontamination (operators/similarity.
    semantic_contamination): vectors vec_id % 50 == 0 act as the eval
    set; every other vector is dropped if its rounded cosine to any
    probe reaches 0.4. Complements the n-gram cur_decontaminate — a
    paraphrased eval answer escapes token overlap but not its
    embedding neighborhood."""
    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") % 50 == 0)
    corpus = emb.filter(F.col("vec_id") % 50 != 0)
    return similarity.semantic_contamination(corpus, probes,
                                             threshold=0.4)


def cur_training_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global training-order shuffle + sharding — the
    last stage of every corpus pipeline: a reproducible corpus-wide
    permutation (position = rank in sha-bucket order, doc_id tiebreak;
    no RNG, so re-runs and the oracle emit the identical order) and a
    round-robin shard assignment over it. The rank is the DISTRIBUTED
    global_row_number — a corpus-wide ORDER BY with no single-partition
    sort at any scale. Salt change ⇒ fresh epoch permutation."""
    from dht11_data_pipeline_spark.operators.curation import _hash_bucket
    from dht11_data_pipeline_spark.operators.ranking import (
        global_row_number)

    docs = load_table(spark, sf_dir, "documents")
    keyed = docs.select(
        "doc_id",
        _hash_bucket(F.col("doc_id"), "epoch1", 1_000_000)
        .cast("bigint").alias("shuffle_key"))
    ordered = global_row_number(
        keyed, [F.col("shuffle_key"), F.col("doc_id")], "position")
    return ordered.select(
        "doc_id", "shuffle_key",
        F.col("position").cast("bigint").alias("position"),
        F.expr("(position - 1) % 8").cast("int").alias("shard"))


def cur_dsir_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full DSIR stage end-to-end (Xie et al. 2023): hashed-bigram
    importance scores against the lang='en' target slice
    (textops.dsir_weights, integer ppm) fed straight into the
    deterministic importance-sampling gate (curation.weighted_keep) —
    score the corpus, then actually resample it. Both halves are
    driver-green on their own; this is the composition a training-mix
    build runs, with keep probability ∝ score/score_max at a 50% base
    rate and zero RNG anywhere."""
    docs = load_table(spark, sf_dir, "documents")
    w = (textops.dsir_weights(docs, target_col="lang",
                              target_value="en")
         .select("doc_id", "score_ppm"))
    return curation.weighted_keep(w, F.col("score_ppm"),
                                  rate_ppm=500_000)


_ACF_LAGS = (1, 2, 3, 7)


def ts_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation of the per-type daily total at lags 1/2/3/7
    observations — the seasonality probe a forecasting pipeline runs
    before choosing a model (lag-7 high → weekly cycle). Pearson r is
    assembled from DECIMAL-exact moments (n, Σx, Σy, Σxy, Σx², Σy²)
    cast to double at the very end, so both engines perform the
    identical five double operations + sqrt on identical inputs —
    never a streaming corr() whose accumulation order drifts.

    Scale: one map-side partial agg to the day×type grain; the lag
    window, the unpivot, and the moment aggregation all run over the
    tiny daily frame partitioned by event_type — the fact table is
    scanned once."""
    ev = load_table(spark, sf_dir, "events")
    daily = (ev.select(
        "event_type",
        F.col("ts").cast("timestamp").cast("date").alias("day"),
        F.col("value").cast("decimal(18,2)").alias("v"))
        .groupBy("event_type", "day")
        .agg(F.sum("v").alias("x_d")))
    w = Window.partitionBy("event_type").orderBy("day")
    lagged = daily.select(
        "event_type", "x_d",
        *[F.lag("x_d", lag).over(w).alias(f"lag{lag}")
          for lag in _ACF_LAGS])
    stack_args = ", ".join(f"{lag}, lag{lag}" for lag in _ACF_LAGS)
    pairs = (lagged.select(
        "event_type", "x_d",
        F.expr(f"stack({len(_ACF_LAGS)}, {stack_args}) AS (lag, y_d)"))
        .filter(F.col("y_d").isNotNull()))
    m = pairs.groupBy("event_type", "lag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.sum("x_d").cast("double").alias("sx"),
        F.sum("y_d").cast("double").alias("sy"),
        F.sum((F.col("x_d") * F.col("y_d")).cast("decimal(38,4)"))
        .cast("double").alias("sxy"),
        F.sum((F.col("x_d") * F.col("x_d")).cast("decimal(38,4)"))
        .cast("double").alias("sxx"),
        F.sum((F.col("y_d") * F.col("y_d")).cast("decimal(38,4)"))
        .cast("double").alias("syy"))
    n = F.col("n_pairs")
    num = n * F.col("sxy") - F.col("sx") * F.col("sy")
    den = (F.sqrt(n * F.col("sxx") - F.col("sx") * F.col("sx"))
           * F.sqrt(n * F.col("syy") - F.col("sy") * F.col("sy")))
    return m.select(
        "event_type", F.col("lag").cast("int").alias("lag"), "n_pairs",
        F.when(den > 0, F.round(num / den, 4)).alias("acf"))


def text_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declared-weights linear quality classifier (fastText-style):
    hashed-unigram feature buckets score each document against the
    shipped v1 weight table, and the mean-token-weight threshold
    (25 milli) gates it. Pure per-row projection — zero shuffles at
    any corpus size; the streaming twin
    (streaming/curation.quality_gate_stream) is the same expression."""
    docs = load_table(spark, sf_dir, "documents")
    w = textops.declared_weight_buckets(textops.QUALITY_WORD_WEIGHTS_V1)
    return textops.quality_classifier_score(docs, w, threshold_milli=25)


def cur_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full quality-filter stage a corpus build runs: the declared
    -weights classifier verdict (text_quality_classifier) feeding the
    deterministic importance-sampling gate (curation.weighted_keep) —
    survivors are sampled with probability ∝ score/score_max at a 50%
    base rate, so the kept corpus tilts toward the highest-quality
    documents with zero RNG anywhere. Classifier scores are positive
    on every Y-flagged doc by construction (1000·score ≥ 25·n_tokens
    > 0), satisfying weighted_keep's non-negative precondition.
    on_empty="empty" (round-11 ADVICE): when NO document clears the
    threshold — reachable on a tiny SF or after a weight-table change
    — the SQL twin returns an empty set, so the gate must too, rather
    than raising weighted_keep's undefined-probability error (that
    raise covers all-zero weights on a NONEMPTY corpus, impossible
    here by the positivity argument above)."""
    docs = load_table(spark, sf_dir, "documents")
    w = textops.declared_weight_buckets(textops.QUALITY_WORD_WEIGHTS_V1)
    kept = (textops.quality_classifier_score(docs, w, threshold_milli=25)
            .filter(F.col("keep_flag") == "Y")
            .select("doc_id", "score_sum"))
    return curation.weighted_keep(kept, F.col("score_sum"),
                                  rate_ppm=500_000, on_empty="empty")


def text_bpe_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capped-round distributed BPE vocabulary induction: 6 merge
    rounds over the corpus word-frequency table, each one pair-count
    aggregate + a 1-row collect, deterministic ties (count desc, pair
    lexicographic). The oracle replays the same 6 merges as an
    unrolled materialized-CTE chain."""
    docs = load_table(spark, sf_dir, "documents")
    return textops.bpe_vocab(docs, k=6)


def text_source_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source unigram distribution drift vs the whole corpus:
    integer-ppm total-variation distance (no log, no float), absent
    words closed via the global-scalar tail — one corpus shuffle,
    everything after on the vocab frame."""
    docs = load_table(spark, sf_dir, "documents")
    return textops.source_divergence(docs)


def cur_contamination_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source leakage matrix: distinct shared 7-gram counts per
    source pair (hub-capped inverted-index self-join) — which sources
    copy from which, before per-source stats are trusted."""
    docs = load_table(spark, sf_dir, "documents")
    return textops.contamination_matrix(docs)


def text_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The encode half of the tokenizer pair: apply the 6 learned BPE
    merges to the corpus and report per-doc symbol statistics
    (n_tokens, n_chars, n_symbols, integer compression_ppm) — merge
    application is vocabulary-sized work broadcast onto one exploded
    corpus pass."""
    docs = load_table(spark, sf_dir, "documents")
    return textops.bpe_encode(docs, k=6)


def cur_contamination_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Doc-level drill-down of the contamination matrix: per flagged
    source pair, the top-5 cross-source document pairs by distinct
    shared 7-grams — the concrete leaked documents to eyeball or feed
    the dedup cascade. Hub-capped twice (≤50 sources AND ≤50 docs per
    gram, both mirrored in the oracle); per-pair top-k is a window
    over the bounded doc-pair aggregate."""
    docs = load_table(spark, sf_dir, "documents")
    return textops.contamination_pairs(docs)


def cur_contamination_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The last drill-down level (matrix -> pairs -> spans): for each
    flagged doc pair, the first 10 shared 7-grams lexicographically —
    the literal leaked text a reviewer adjudicates. Same double
    hub-capped inverted index as cur_contamination_pairs; the span
    join touches only the flagged pairs, never the corpus."""
    docs = load_table(spark, sf_dir, "documents")
    return textops.contamination_spans(docs)


def cur_bpe_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget packing under the LEARNED vocabulary: bpe_encode's
    per-doc n_symbols feeds the budget-exact concat-then-split packer
    (curation.pack_budgeted, budget 256) — tokenizer → budget → packed
    training sequences, closed loop. Every pack except each source's
    last holds exactly 256 symbols; none ever exceeds it (property-
    pinned in tests/test_round12_ops.py)."""
    docs = load_table(spark, sf_dir, "documents")
    enc = textops.bpe_encode(docs, k=6).select("doc_id", "n_symbols")
    sd = docs.select("source", "doc_id").join(enc, "doc_id")
    return curation.pack_budgeted(sd, weight_col="n_symbols", budget=256)


def cur_contamination_pos_spans(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """POSITIONAL contamination spans (operators/textops.
    contamination_pos_spans): for each doc pair the pair ranking
    flags, the maximal runs of consecutively shared 7-grams with
    1-based token offsets in BOTH documents — (start_a, start_b,
    run_tokens) is the literal copied span, the reviewer-facing form
    the lexicographic gram list (cur_contamination_spans)
    approximates. Positions are recovered by broadcast-semi-joining
    the tiny flagged-doc set back to the corpus (a scan with a
    broadcast filter, never a second corpus shuffle) and runs fall
    out of gaps-and-islands on the diagonal start_a − start_b."""
    docs = load_table(spark, sf_dir, "documents")
    return textops.contamination_pos_spans(docs)


def cur_contamination_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Surgical span-level decontamination (operators/textops.
    contamination_cut): remove exactly the copied token runs the
    positional drill-down located (cut falls on the lexicographically
    later source under the default no-protected-sources policy) and
    return the FULL cleaned corpus — (doc_id, source, n_tokens,
    n_removed, clean_text), untouched docs passing through verbatim.
    Flagged runs and affected docs are tiny pinned frames; no
    corpus-sized shuffle anywhere."""
    docs = load_table(spark, sf_dir, "documents")
    return textops.contamination_cut(docs)


def cur_epoch_plan_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fertility-aware epoch planning: the budget unit is tokenizer
    SYMBOLS, not words — per-source costs come from text_bpe_fertility
    (the learned 6-merge vocabulary's per-source n_symbols), so a
    source the tokenizer over-segments is charged what it actually
    costs in sequence length; the water-filling itself is the same
    unit-agnostic integer core as cur_epoch_plan
    (curation.epoch_plan_from_sizes — conservation Σ alloc ==
    min(B, ΣA) holds per unit, property-pinned in
    tests/test_round13_ops.py). Closes fertility → budget the way
    round 12 closed tokenizer → packing (round-12 verdict item 7)."""
    docs = load_table(spark, sf_dir, "documents")
    sizes = (textops.bpe_fertility(docs, k=6)
             .select("source", "n_docs",
                     F.col("n_symbols").alias("tokens")))
    plan = curation.epoch_plan_from_sizes(sizes, budget_ppm=1_500_000,
                                          max_epochs_ppm=4_000_000)
    return plan.select("source", "n_docs",
                       F.col("tokens").alias("n_symbols"),
                       "absorb_cap",
                       F.col("alloc_tokens").alias("alloc_symbols"),
                       "epochs_ppm", "capped_flag")


def cur_contamination_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audit-time contamination gate (operators/textops.
    contamination_gate): every document flagged by how many
    cross-source-band 7-grams it carries (the drill-down index's
    flagged set), QUARANTINE at >= 1 hit else PASS — the enforcement
    half of the contamination audit, flag-don't-drop. Per-doc hits
    read straight off the shared index (no second shingle pass),
    left-joined onto a column-pruned (doc_id, source) corpus
    projection so clean docs appear with 0."""
    docs = load_table(spark, sf_dir, "documents")
    return textops.contamination_gate(docs)


def text_bpe_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source tokenizer fertility under the learned 6-merge BPE
    vocabulary: integer symbols-per-token and symbols-per-character —
    the fairness audit that catches a vocabulary over-segmenting an
    under-represented source before token budgets and packing trust
    it. Merge chain is vocabulary-sized work; one corpus explode +
    one source-keyed aggregate."""
    docs = load_table(spark, sf_dir, "documents")
    return textops.bpe_fertility(docs, k=6)


def text_source_divergence_declared(spark: SparkSession,
                                    sf_dir: str) -> DataFrame:
    """Per-source TV drift against the DECLARED v1 reference profile —
    the between-audits monitor form of text_source_divergence: one
    (source, word) shuffle plus a literal map lookup, no corpus-wide
    second aggregate, so the streaming twin
    (streaming/curation.start_source_divergence_stream) runs the
    identical expression per micro-batch."""
    docs = load_table(spark, sf_dir, "documents")
    return textops.source_divergence_declared(
        docs, textops.REFERENCE_UNIGRAM_PPM_V1)


EXT_QUERIES = {
    # newest first: the external correctness harness verifies keys in
    # declaration order and has a bounded per-round budget
    "cur_contamination_pos_spans": cur_contamination_pos_spans,
    "cur_contamination_cut": cur_contamination_cut,
    "cur_contamination_gate": cur_contamination_gate,
    "cur_epoch_plan_fertility": cur_epoch_plan_fertility,
    "cur_contamination_pairs": cur_contamination_pairs,
    "cur_contamination_spans": cur_contamination_spans,
    "cur_bpe_pack": cur_bpe_pack,
    "text_bpe_fertility": text_bpe_fertility,
    "text_source_divergence_declared": text_source_divergence_declared,
    "text_quality_classifier": text_quality_classifier,
    "cur_quality_gate": cur_quality_gate,
    "text_bpe_vocab": text_bpe_vocab,
    "text_bpe_encode": text_bpe_encode,
    "text_source_divergence": text_source_divergence,
    "cur_contamination_matrix": cur_contamination_matrix,
    "cur_epoch_plan": cur_epoch_plan,
    "cur_source_temperature": cur_source_temperature,
    "cur_dsir_resample": cur_dsir_resample,
    "cur_training_order": cur_training_order,
    "cur_semantic_decontaminate": cur_semantic_decontaminate,
    "sim_label_knn_audit": sim_label_knn_audit,
    "text_oov_rate": text_oov_rate,
    "sim_hard_negatives": sim_hard_negatives,
    "text_doc_lm_score": text_doc_lm_score,
    "cur_curriculum_order": cur_curriculum_order,
    "cur_cluster_balanced": cur_cluster_balanced,
    "o_revenue_deciles": o_revenue_deciles,
    "ts_autocorrelation": ts_autocorrelation,
    "cur_weighted_sample": cur_weighted_sample,
    "o_customer_revenue_rank": o_customer_revenue_rank,
    "ts_cross_correlation": ts_cross_correlation,
    "text_bigram_lift": text_bigram_lift,
    "mm_audio_fingerprint": mm_audio_fingerprint,
    "mm_audio_near_dup": mm_audio_near_dup,
    "ts_holt_winters": ts_holt_winters,
    "a_countmin_freq": a_countmin_freq,
    "a_kmv_jaccard": a_kmv_jaccard,
    "t_markov_transitions": t_markov_transitions,
    "cur_dup_aware_sample": cur_dup_aware_sample,
    "ts_changepoint_per_type": ts_changepoint_per_type,
    "j_entity_resolution": j_entity_resolution,
    "t_journey_patterns": t_journey_patterns,
    "ts_trend_per_type": ts_trend_per_type,
    "ts_seasonal_decompose": ts_seasonal_decompose,
    "mm_audio_ann": mm_audio_ann,
    "j_fuzzy_part_match": j_fuzzy_part_match,
    "t_event_type_affinity": t_event_type_affinity,
    "graph_pagerank": graph_pagerank,
    "mm_audio_decode": mm_audio_decode,
    "mm_audio_resample": mm_audio_resample,
    "cur_reservoir_sample": cur_reservoir_sample,
    "sim_prototype_prune": sim_prototype_prune,
    "text_dsir_weight": text_dsir_weight,
    "cur_end_to_end": cur_end_to_end,
    "dedup_span_coverage": dedup_span_coverage,
    "dedup_common_spans": dedup_common_spans,
    "dedup_bloom_probe": dedup_bloom_probe,
    "cur_gopher_filter": cur_gopher_filter,
    "sim_semantic_dedup": sim_semantic_dedup,
    "text_sentence_stats": text_sentence_stats,
    "cur_token_budget": cur_token_budget,
    "text_repetition": text_repetition,
    "cur_sample_mixture": cur_sample_mixture,
    "dedup_exact": dedup_exact,
    "dedup_ngram_jaccard": dedup_ngram_jaccard,
    "dedup_minhash_lsh": dedup_minhash_lsh,
    "dedup_simhash": dedup_simhash,
    "dedup_cdc_chunks": dedup_cdc_chunks,
    "text_quality": text_quality,
    "text_lang_id": text_lang_id,
    "text_fingerprint": text_fingerprint,
    "text_token_stats": text_token_stats,
    "text_winnowing": text_winnowing,
    "sim_cosine_topk": sim_cosine_topk,
    "sim_lsh_ann": sim_lsh_ann,
    "sim_ivf_ann": sim_ivf_ann,
    "sim_ivf_ann_nprobe": sim_ivf_ann_nprobe,
    "graph_triangle_count": graph_triangle_count,
    "graph_clustering_coeff": graph_clustering_coeff,
    "graph_degree_assortativity": graph_degree_assortativity,
    "dedup_containment": dedup_containment,
    "text_bigram_rarity": text_bigram_rarity,
    "t_attribution": t_attribution,
    "ts_ewma_user_value": ts_ewma_user_value,
    "mm_image_phash": mm_image_phash,
    "mm_phash_near_dup": mm_phash_near_dup,
    "graph_link_prediction": graph_link_prediction,
    "graph_adamic_adar": graph_adamic_adar,
    "text_kn_trigram": text_kn_trigram,
    "text_rake_keywords": text_rake_keywords,
    "graph_kcore": graph_kcore,
    "sim_matryoshka_rerank": sim_matryoshka_rerank,
    "text_ngram_novelty": text_ngram_novelty,
    "cur_survivorship": cur_survivorship,
    "sim_embedding_near_dup": sim_embedding_near_dup,
    "sim_embedding_near_dup_lsh": sim_embedding_near_dup_lsh,
    "mm_binary_features": mm_binary_features,
    "mm_resize": mm_resize,
    "mm_image_decode": mm_image_decode,
    "mm_png_decode": mm_png_decode,
    "mm_jpeg_decode": mm_jpeg_decode,
    "mm_gif_decode": mm_gif_decode,
    "mm_qoi_decode": mm_qoi_decode,
    "mm_cross_modal_audit": mm_cross_modal_audit,
    "mm_frame_sample": mm_frame_sample,
    "meta_profile_orders": meta_profile_orders,
    "a_salted_event_totals": a_salted_event_totals,
    "t_sessionize": t_sessionize,
    "dedup_cascade": dedup_cascade,
    "dedup_clusters": dedup_clusters,
    "dedup_incremental": dedup_incremental,
    "cur_hash_split": cur_hash_split,
    "cur_stratified_quota": cur_stratified_quota,
    "cur_chunk_tokens": cur_chunk_tokens,
    "cur_pack_sequences": cur_pack_sequences,
    "cur_pii_scrub": cur_pii_scrub,
    "ts_user_correlation": ts_user_correlation,
    "sim_kmeans_clusters": sim_kmeans_clusters,
    "text_tfidf_topk": text_tfidf_topk,
    "text_bm25_search": text_bm25_search,
    "text_inverted_postings": text_inverted_postings,
    "sim_pq_ann": sim_pq_ann,
    "sim_ivfpq_ann": sim_ivfpq_ann,
    "cur_decontaminate": cur_decontaminate,
    "t_funnel_conversion": t_funnel_conversion,
    "t_cohort_retention": t_cohort_retention,
    "t_rfm_segmentation": t_rfm_segmentation,
    "ts_anomaly_days": ts_anomaly_days,
    "cur_quality_filter": cur_quality_filter,
}
