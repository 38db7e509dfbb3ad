"""Differential test: every queries() entry vs its DuckDB oracle at
sf0.001 (fast; the driver runs the same compare at sf0.01)."""

from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

import __spark_entry__ as E  # noqa: E402
from tests.diffcheck import compare_one  # noqa: E402

_QUERIES = E.queries()
_ORACLES = E.oracle_sql()


def test_every_query_has_callable_signature():
    assert _QUERIES, "queries() must not be empty"
    for name, fn in _QUERIES.items():
        assert callable(fn), name


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_query_matches_oracle(spark, sf_dir, name):
    if name not in _ORACLES:
        pytest.skip(f"{name}: no SQL oracle (rows-only check by driver)")
    problems = compare_one(spark, name, _QUERIES[name], _ORACLES[name], sf_dir)
    assert not problems, "\n".join(problems)


def test_entry_smoke(spark):
    df = E.entry(spark)
    assert df.count() >= 0
    assert df.columns
