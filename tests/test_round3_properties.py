"""Property tests for the round-3 text/dedup/multimodal operators
against brute-force Python references."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from dht11_data_pipeline_spark.operators.dedup import containment_pairs
from dht11_data_pipeline_spark.operators.textops import bigram_rarity

_slow = settings(max_examples=5, deadline=None,
                 suppress_health_check=[HealthCheck.function_scoped_fixture])

WORD = st.text(alphabet="abcde", min_size=1, max_size=3)
DOC = st.lists(WORD, min_size=3, max_size=10).map(" ".join)
TEXT = st.text(alphabet="abcd efg", min_size=2, max_size=30)


def _py_shingle_set(text: str, n: int = 3) -> set:
    toks = text.split(" ")
    return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}


@_slow
@given(docs=st.lists(DOC, min_size=2, max_size=6))
def test_containment_matches_bruteforce(spark, docs):
    sets = {i: _py_shingle_set(t) for i, t in enumerate(docs)}
    expect = {}
    for a, sa in sets.items():
        for b, sb in sets.items():
            if a == b or not sa:
                continue
            common = len(sa & sb)
            if common and common / len(sa) >= 0.5:
                expect[(a, b)] = (common, len(sa), common / len(sa))
    df = spark.createDataFrame(list(enumerate(docs)), "doc_id long, text string")
    got = {(r["doc_a"], r["doc_b"]): (r["n_common"], r["size_a"], r["containment"])
           for r in containment_pairs(df, threshold=0.5).collect()}
    assert got == expect


@_slow
@given(texts=st.lists(TEXT, min_size=1, max_size=5))
def test_bigram_rarity_matches_bruteforce(spark, texts):
    c2, c1 = {}, {}
    for t in texts:
        for i in range(len(t) - 1):
            bg = t[i:i + 2]
            c2[bg] = c2.get(bg, 0) + 1
            c1[bg[0]] = c1.get(bg[0], 0) + 1
    expect = {}
    for did, t in enumerate(texts):
        if len(t) < 2:
            continue
        rarities = [c1[t[i]] * 1_000_000 // c2[t[i:i + 2]]
                    for i in range(len(t) - 1)]
        expect[did] = (len(rarities), sum(rarities) // len(rarities))
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = {r["doc_id"]: (r["n_bigrams"], r["rarity_score"])
           for r in bigram_rarity(df).collect()}
    assert got == expect


def _py_phash(text: str, width: int = 32) -> tuple:
    raw = text.encode("utf-8")
    h = max(1, -(-len(raw) // (width * 3)))
    padded = raw.ljust(width * h * 3, b"\x00")
    gs = []
    for k in range(64):
        x, y = k % 8, k // 8
        p = (y * h // 8) * width + x * (width // 8)
        gs.append((padded[3 * p] + padded[3 * p + 1] + padded[3 * p + 2]) // 3)
    mean = sum(gs) // 64
    hi = sum(1 << k for k in range(32) if gs[k] >= mean)
    lo = sum(1 << (k - 32) for k in range(32, 64) if gs[k] >= mean)
    return hi, lo


@_slow
@given(texts=st.lists(st.text(alphabet="abcdefgh ", min_size=0, max_size=200),
                      min_size=1, max_size=4))
def test_phash_matches_python_reference(spark, texts):
    from dht11_data_pipeline_spark.operators import multimodal
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    ph = multimodal.phash_payloads(multimodal.attach_image_payload(df, width=32))
    got = {r["doc_id"]: (r["phash_hi"], r["phash_lo"]) for r in ph.collect()}
    for did, t in enumerate(texts):
        assert got[did] == _py_phash(t), (did, t)
