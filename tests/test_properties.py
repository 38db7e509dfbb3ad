"""Property-based tests (hypothesis) for core invariants:
shingling matches a Python reference, and SCD2 re-apply is a no-op for
arbitrary data — the idempotency the whole pipeline leans on."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from dht11_data_pipeline_spark.functions.text import distinct_shingles
from dht11_data_pipeline_spark.operators.scd2 import SCD2Config, apply_scd2, detect_delta

WORD = st.text(alphabet="abcdef", min_size=1, max_size=4)
DOC = st.lists(WORD, min_size=0, max_size=12)

_slow = settings(max_examples=5, deadline=None,
                 suppress_health_check=[HealthCheck.function_scoped_fixture])


def _py_shingles(words: list[str], n: int = 3) -> list[str]:
    seen, out = set(), []
    for i in range(len(words) - n + 1):
        s = " ".join(words[i:i + n])
        if s not in seen:
            seen.add(s)
            out.append(s)
    return out


@_slow
@given(docs=st.lists(DOC, min_size=1, max_size=8))
def test_shingles_match_python_reference(spark, docs):
    df = spark.createDataFrame(
        [(i, " ".join(w)) for i, w in enumerate(docs)], "doc_id int, text string")
    got = {r["doc_id"]: list(r["s"]) for r in
           df.select("doc_id", distinct_shingles("text", 3).alias("s")).collect()}
    for i, words in enumerate(docs):
        # split(" ") on "" yields [""], matching " ".join([]) round-trip
        tokens = " ".join(words).split(" ")
        assert got[i] == _py_shingles(tokens), (i, words)


CFG = SCD2Config(natural_keys=["k"], ak_col="ak", key_col="key")

ROWS = st.dictionaries(st.integers(0, 50), st.integers(0, 5),
                       min_size=1, max_size=20)


@_slow
@given(batch=ROWS)
def test_scd2_reapply_is_noop(spark, batch):
    rows = [(k, str(v)) for k, v in batch.items()]
    df = spark.createDataFrame(rows, "k bigint, v string")
    empty = spark.createDataFrame(
        [], "k bigint, v string, ak decimal(18,0), key decimal(18,0),"
        " da_current_flag string, da_deleted_flag string,"
        " da_valid_from_date timestamp, da_valid_to_date timestamp,"
        " da_inserted_datetime timestamp, da_updated_datetime timestamp")
    t1 = apply_scd2(df, empty, CFG, load_ts="2024-01-01 00:00:00",
                    deterministic_keys=True)
    # re-apply the identical batch: everything classifies NC...
    delta = detect_delta(df, t1.filter(F.col("da_current_flag") == "Y"), CFG)
    assert {r["upsert_cd"] for r in delta.collect()} == {"NC"}
    # ...and the applied state is bit-identical
    t2 = apply_scd2(df, t1, CFG, load_ts="2024-02-02 00:00:00",
                    deterministic_keys=True)
    assert ({tuple(r) for r in t1.collect()} == {tuple(r) for r in t2.collect()})
