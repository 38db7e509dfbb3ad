"""Arrow-dtype audit of every DuckDB oracle (VERDICT r5 item 2).

The driver fetches oracle results through Arrow.  DuckDB types an
uncast ``SUM(bigint)`` as HUGEINT, which surfaces as
``decimal128(38, 0)`` on the Arrow path and canonicalizes differently
from Spark's ``bigint`` — the exact mechanism behind the round-5
hash failures of ``mm_audio_fingerprint`` and ``t_markov_transitions``
(uncast SUMs at ext_oracles.py, since fixed with ``CAST(... AS
BIGINT)``).  DuckDB's *native* ``fetchall`` hands HUGEINT back as a
plain Python int, so the local mirror could not see the divergence.

This test closes the gap at the class level: no oracle may produce a
decimal column, ever.  Every Spark twin emits integral or float
columns, never DecimalType, so any decimal here is an uncast
aggregate waiting to hash-mismatch on the driver.  Reverting either
round-6 cast makes this test fail.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pyarrow as pa
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TINY", "/root/testdata/sf0.001")
TABLES = ("region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings")


def _oracle_items():
    import __spark_entry__ as E

    return sorted(E.oracle_sql().items())


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield c
    c.close()


def test_no_decimal_columns_in_any_oracle(con):
    offenders: list[str] = []
    for name, sql in _oracle_items():
        schema = con.execute(sql).arrow().schema
        for field in schema:
            if pa.types.is_decimal(field.type):
                offenders.append(f"{name}.{field.name}: {field.type}")
    assert not offenders, (
        "oracle columns that DuckDB types as decimal on the Arrow path "
        "(add CAST(... AS BIGINT) / AS DOUBLE around the aggregate): "
        + "; ".join(offenders)
    )


def test_oracle_count_matches_queries():
    import __spark_entry__ as E

    qs, oracles = E.queries(), E.oracle_sql()
    # every oracle key must be a registered query key
    assert set(oracles) <= set(qs)
