"""UDTF extension seam: the Python lateral-join template must produce
bit-identical results to the codegen'd built-in it mirrors, and its
plan must show the Python evaluation boundary (so a user can SEE when
they are on the slow path)."""

from __future__ import annotations

from dht11_data_pipeline_spark.functions.udtf_ext import chunk_tokens_udtf
from dht11_data_pipeline_spark.operators.curation import chunk_tokens
from dht11_data_pipeline_spark.sources.tables import load_table


def test_udtf_parity_with_builtin(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(100)
    via_udtf = chunk_tokens_udtf(spark, docs, chunk_size=32, stride=24)
    via_builtin = chunk_tokens(docs, chunk_size=32, stride=24)
    cols = via_udtf.columns
    assert sorted(cols) == sorted(via_builtin.columns)
    a, b = via_udtf.select(*sorted(cols)), via_builtin.select(*sorted(cols))
    assert a.count() == b.count() > 0
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_udtf_short_doc_and_null(spark):
    from dht11_data_pipeline_spark.functions.udtf_ext import ChunkTokens

    # direct eval: short doc -> one short chunk; null -> no rows
    rows = list(ChunkTokens.func().eval("a b c", 32, 24))
    assert len(rows) == 1 and rows[0][1] == 3
    assert list(ChunkTokens.func().eval(None, 32, 24)) == []


def test_udtf_plan_shows_python_boundary(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(5)
    plan = chunk_tokens_udtf(spark, docs) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "UDTF" in plan or "EvalPython" in plan, plan
