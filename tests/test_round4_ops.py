"""Round-4 operators: Holt-Winters fixed-point trend, count-min
sketch, KMV Jaccard, Markov transitions — property checks against
plain-Python references on tiny fixtures."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from dht11_data_pipeline_spark.operators.sequence import holt_winters_trend
from dht11_data_pipeline_spark.operators.sketches import (
    HASH_P, KMV_A, KMV_B, countmin_frequencies, kmv_pairwise_jaccard)


def _hw_reference(values: list[float]):
    """Float Holt's method, alpha=beta=0.5 — the scaled integers must
    equal it exactly (dyadic coefficients, exact arithmetic)."""
    out = []
    s = b = 0.0
    for t, x in enumerate(values, start=1):
        c = round(x * 100)
        if t == 1:
            s, b = float(c), 0.0
        else:
            s_new = (c + s + b) / 2
            b = (s_new - s + b) / 2
            s = s_new
        out.append((t, c, s, b))
    return out


def test_holt_winters_matches_float_reference(spark):
    vals = [10.0, 12.5, 11.25, 20.0, 3.75, 8.0, 8.0, 0.25]
    rows = [(1, i, f"2024-01-01 00:00:{i:02d}", v)
            for i, v in enumerate(vals, start=1)]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = {r["rn"]: r for r in holt_winters_trend(df).collect()}
    for t, c, s, b in _hw_reference(vals):
        r = got[t]
        assert r["cents"] == c
        # S_t = s_t * 4^t exactly (dyadic values -> float is exact here)
        assert r["level_q4"] == int(s * 4 ** t)
        assert r["trend_q4"] == int(b * 4 ** t)


def test_holt_winters_trend_sign(spark):
    # strictly increasing series -> positive trend; decreasing -> negative
    rows = [(1, i, f"2024-01-01 00:00:{i:02d}", float(i)) for i in range(1, 8)]
    rows += [(2, i, f"2024-01-01 00:00:{i:02d}", float(10 - i))
             for i in range(1, 8)]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = holt_winters_trend(df).collect()
    for r in out:
        if r["rn"] >= 3:
            if r["user_id"] == 1:
                assert r["trend_q4"] > 0
            else:
                assert r["trend_q4"] < 0


def test_holt_winters_max_steps_guard(spark):
    df = spark.createDataFrame([], "user_id long, event_id long, "
                               "ts timestamp, value double")
    with pytest.raises(ValueError):
        holt_winters_trend(df, max_steps=17)


def test_countmin_never_undercounts(spark):
    rows = [(k,) for k in [1, 1, 1, 2, 2, 3] * 10 + list(range(100, 140))]
    df = spark.createDataFrame(rows, "user_id long")
    out = countmin_frequencies(df, "user_id").collect()
    assert len(out) == 43  # 3 hot keys + 40 singletons
    truth = {1: 30, 2: 20, 3: 10}
    for r in out:
        assert r["overcount"] >= 0
        assert r["cm_est"] == r["true_n"] + r["overcount"]
        assert r["true_n"] == truth.get(r["key"], 1)


def test_kmv_exact_when_sets_fit_in_k(spark):
    # audiences smaller than k=64: the sketch IS the set, the union
    # sample IS the union -> estimate equals the true Jaccard floor
    a_users = set(range(0, 30))
    b_users = set(range(20, 50))
    rows = [("a", u) for u in a_users] + [("b", u) for u in b_users]
    df = spark.createDataFrame(rows, "event_type string, user_id long")
    [r] = kmv_pairwise_jaccard(df, "event_type", "user_id").collect()
    true_j = len(a_users & b_users) / len(a_users | b_users)
    assert r["sk_a"] == 30 and r["sk_b"] == 30
    assert r["used_k"] == len(a_users | b_users)
    assert r["overlap"] == len(a_users & b_users)
    assert r["jaccard_ppm"] == math.floor(true_j * 1_000_000)


def test_kmv_hash_is_injective_on_fixture(spark):
    # sanity: multiply-mod hash mod P collides only by pigeonhole
    us = list(range(1000))
    hs = {(u % HASH_P * KMV_A + KMV_B) % HASH_P for u in us}
    assert len(hs) == len(us)


def _fp_reference(text: str, frame_len: int = 8):
    samples = [(b - 128) * 256 for b in text.encode()]
    nf = len(samples) // frame_len
    e = [sum(s * s for s in samples[f * frame_len:(f + 1) * frame_len])
         for f in range(nf)]
    ks = [k for k in range(min(64, nf - 1)) if e[k + 1] > e[k]]
    hi = sum(1 << k for k in ks if k < 32)
    lo = sum(1 << (k - 32) for k in ks if k >= 32)
    return nf, hi, lo


def test_audio_fingerprint_matches_reference(spark):
    from dht11_data_pipeline_spark.operators import multimodal
    texts = ["quiet then LOUD THEN QUIET again and some more words here",
             "aaaaaaaabbbbbbbbaaaaaaaacccccccc" * 4,
             "short", ""]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    fp = multimodal.audio_fingerprint(
        multimodal.attach_audio_payload(docs, rate=8000))
    got = {r["doc_id"]: r for r in fp.collect()}
    for i, t in enumerate(texts):
        nf, hi, lo = _fp_reference(t)
        assert (got[i]["n_frames"], got[i]["fp_hi"], got[i]["fp_lo"]) == \
            (nf, hi, lo), t


def test_audio_near_dup_blocks_on_duration(spark):
    from dht11_data_pipeline_spark.operators import dedup, multimodal
    # two identical long docs (pair), one identical-prefix but LONGER
    # doc (same leading bits, different n_frames -> must NOT pair)
    base = "some moderately long sentence with energy variation 0123456789"
    docs = spark.createDataFrame(
        [(1, base), (2, base), (3, base + " trailing extra words")],
        "doc_id long, text string")
    fp = multimodal.audio_fingerprint(
        multimodal.attach_audio_payload(docs, rate=8000))
    pairs = dedup.phash_hamming_pairs(
        fp, hi_col="fp_hi", lo_col="fp_lo", max_hamming=2,
        block_cols=("n_frames",)).collect()
    assert {(r["doc_a"], r["doc_b"], r["hamming"]) for r in pairs} == {(1, 2, 0)}


def test_holt_winters_numpy_fold_equals_python_twin(spark):
    """The vectorized numpy fold (production path) must match the
    arbitrary-precision Python fold bit-for-bit on multi-user data
    with negatives and ties — VERDICT r5 item 3."""
    import random

    from dht11_data_pipeline_spark.operators.sequence import _hw_fold_py

    rng = random.Random(42)
    rows, expected = [], {}
    for uid in range(1, 30):
        n = rng.randint(1, 20)  # some users exceed max_steps=16
        vals = [rng.randint(-10_000_000, 10_000_000) / 100 for _ in range(n)]
        rows += [(uid, i, f"2024-01-01 00:{i // 60:02d}:{i % 60:02d}", v)
                 for i, v in enumerate(vals, start=1)]
        cents = [round(v * 100) for v in vals]
        expected[uid] = _hw_fold_py(cents, max_steps=16)
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = holt_winters_trend(df, max_steps=16).collect()
    assert len(got) == sum(len(v) for v in expected.values())
    for r in got:
        s, b = expected[r["user_id"]][r["rn"] - 1]
        assert (r["level_q4"], r["trend_q4"]) == (s, b), (
            r["user_id"], r["rn"])


def test_holt_winters_python_twin_asserts_overflow():
    from dht11_data_pipeline_spark.operators.sequence import _hw_fold_py

    with pytest.raises(AssertionError):
        _hw_fold_py([1 << 55] * 16, max_steps=16)


def test_kmv_pairwise_refusal_leaves_no_cache(spark):
    """The max_sets refusal path must leave no cached DataFrame behind
    (ADVICE r5). The guard now rides the sizes aggregate (one job over
    the persisted sketch instead of a separate distinct-count pass),
    so the contract is enforced by a blocking unpersist in the raise
    branch — this asserts the observable: storage is clean after."""
    import pytest

    from dht11_data_pipeline_spark.operators.sketches import (
        kmv_pairwise_jaccard)

    def _rdd_ids():
        return {info.id() for info in
                spark.sparkContext._jsc.sc().getRDDStorageInfo()}

    # compare ID SETS, not counts: the ContextCleaner may concurrently
    # release another test's cached RDD between the two snapshots
    # (observed as after < before), which is not this contract's
    # concern — only that the refusal path added nothing
    before = _rdd_ids()
    df = spark.createDataFrame(
        [(s, m) for s in range(5) for m in range(10)], "s long, m long")
    with pytest.raises(ValueError, match="pre-filter"):
        kmv_pairwise_jaccard(df, "s", "m", max_sets=2)
    assert _rdd_ids() - before == set()
