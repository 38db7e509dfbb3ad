"""SQL-front-end parity: the ANSI oracle texts for the TPC-H family run
through spark.sql() against registered views and must produce exactly
what the DataFrame plans produce — one engine, two APIs (the driver's
DuckDB compare already proves DataFrame == oracle; this closes the
triangle Spark-SQL == DataFrame, i.e. a SQL user gets identical
results to a DataFrame user)."""

from __future__ import annotations

import math

import pytest

import __spark_entry__ as E
from dht11_data_pipeline_spark.sources.tables import TABLES, load_table

# oracle texts that are ANSI enough for Spark's parser (no DuckDB-only
# list_* / generate_series / IGNORE NULLS syntax)
PARITY_KEYS = [
    "q4_priority_with_late_ship",
    "q6_forecast_revenue",
    "q10_returned_item_customers",
    "q12_late_ship_priority_mix",
    "q13_customer_order_distribution",
    "q14_promo_revenue_share",
    "q16_supplier_part_counts",
    "q19_disjunctive_revenue",
    "q20_heavy_promo_suppliers",
    "q22_idle_wealthy_customers",
    # extension queries whose oracle texts are also valid Spark SQL
    "j_fuzzy_part_match",
    "t_event_type_affinity",
]


def _canon(rows):
    out = []
    for r in rows:
        out.append(tuple(
            round(v, 6) if isinstance(v, float) and math.isfinite(v) else v
            for v in r))
    return sorted(out, key=repr)


@pytest.fixture(scope="module", autouse=True)
def _views(spark, sf_dir):
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)


@pytest.mark.parametrize("key", PARITY_KEYS)
def test_sql_text_matches_dataframe_plan(spark, sf_dir, key):
    sql_rows = spark.sql(E.oracle_sql()[key]).collect()
    df_rows = E.queries()[key](spark, sf_dir).collect()
    assert _canon(sql_rows) == _canon(df_rows), key
