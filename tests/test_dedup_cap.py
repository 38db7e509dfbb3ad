"""Stop-shingle df-cap in jaccard_pairs: exactness when the cap doesn't
trigger, bounded fan-out (with documented underestimate) when it does."""

from __future__ import annotations

from pyspark.sql import functions as F

from dht11_data_pipeline_spark.operators import dedup


def _pairs_set(df):
    return {(r["doc_a"], r["doc_b"], round(r["jaccard"], 9))
            for r in df.collect()}


def test_default_cap_matches_uncapped_on_fixtures(spark, sf_dir):
    """With the default cap (100k) no fixture shingle is hot, so capped
    and uncapped runs must emit identical pairs — pins that the cap
    path is a no-op until it actually has to trigger."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    capped = dedup.jaccard_pairs(docs, n=3, threshold=0.2)
    uncapped = dedup.jaccard_pairs(docs, n=3, threshold=0.2,
                                   max_shingle_df=None)
    assert _pairs_set(capped) == _pairs_set(uncapped)


def test_cap_drops_hot_shingle_fanout_keeps_true_dups(spark):
    """One boilerplate shingle shared by every doc + two real near-dups.
    With the cap at 3: the boilerplate-only pairs disappear (their only
    overlap is the stop shingle), while the genuinely-similar pair
    survives with its Jaccard computed over surviving shingles."""
    boiler = "click here to subscribe"
    rows = [(i, f"{boiler} unique{i} filler{i} pad{i}") for i in range(10)]
    rows.append((100, "alpha beta gamma delta epsilon zeta"))
    rows.append((101, "alpha beta gamma delta epsilon eta"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    uncapped = dedup.jaccard_pairs(docs, n=3, threshold=0.01,
                                   max_shingle_df=None)
    capped = dedup.jaccard_pairs(docs, n=3, threshold=0.01,
                                 max_shingle_df=3)

    unc = {(r["doc_a"], r["doc_b"]) for r in uncapped.collect()}
    cap = {(r["doc_a"], r["doc_b"]) for r in capped.collect()}
    # boilerplate-only pairs exist uncapped, vanish under the cap
    assert (0, 1) in unc and (0, 1) not in cap
    # the real near-dup pair survives the cap
    assert (100, 101) in cap
    # the capped run emits strictly fewer pairs (bounded fan-out)
    assert len(cap) < len(unc)
