"""Metadata-driven column profiler — the engine's version of the
reference's defining move: introspect the catalog at runtime and
GENERATE the query from it (all_tab_cols scans,
Delta_detection_query_gen.py:22-29,161-167,217-245). Here the catalog
is ``df.schema`` and the generated artifact is a single one-pass
aggregation, not SQL text.

Works on ANY DataFrame: numeric columns are normalized through
DECIMAL(18,2) (exact, engine-portable strings), timestamps/dates cast
to string, strings kept as-is. One job computes every column's stats
(count/nulls/distinct/min/max) — a full profile of a 100 TB table is
one scan + one exchange of a single row per distinct-count.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

NUMERIC = (T.ByteType, T.ShortType, T.IntegerType, T.LongType,
           T.FloatType, T.DoubleType, T.DecimalType)


def _norm(field: T.StructField, agg: Column) -> Column:
    """Normalize an aggregated min/max to an engine-portable string —
    AFTER the aggregation, so ordering semantics stay native (numeric
    min, not lexicographic)."""
    if isinstance(field.dataType, NUMERIC):
        return agg.cast("decimal(18,2)").cast("string")
    return agg.cast("string")


def profile(df: DataFrame) -> DataFrame:
    """One row per column: n_rows, n_nulls, n_distinct, min/max (as
    normalized strings). Columns discovered from the schema at runtime.

    Two passes, deliberately: Spark rewrites C distinct aggregates in
    one Aggregate via EXPAND — (C+1) copies of every input row — and a
    combined agg drags the min/max/count columns through that blowup.
    Splitting plain aggs (pass 1) from the multi-distinct agg (pass 2)
    and cross-joining the two 1-row results measured 3x faster at
    sf0.1, and at 100 TB two plain scans always beat one (C+1)-fold
    expanded scan."""
    plain: list[Column] = [F.count(F.lit(1)).alias("_total")]
    distinct: list[Column] = []
    for f in df.schema.fields:
        c = F.col(f.name)
        plain += [
            F.count(c).alias(f"_nn_{f.name}"),
            _norm(f, F.min(c)).alias(f"_min_{f.name}"),
            _norm(f, F.max(c)).alias(f"_max_{f.name}"),
        ]
        distinct.append(F.countDistinct(c).alias(f"_nd_{f.name}"))
    one = df.agg(*plain).crossJoin(df.agg(*distinct))
    entries = F.array(*[
        F.struct(
            F.lit(f.name).alias("column_name"),
            F.col("_total").alias("n_rows"),
            (F.col("_total") - F.col(f"_nn_{f.name}")).alias("n_nulls"),
            F.col(f"_nd_{f.name}").alias("n_distinct"),
            F.col(f"_min_{f.name}").alias("min_value"),
            F.col(f"_max_{f.name}").alias("max_value"),
        )
        for f in df.schema.fields
    ])
    return one.select(F.explode(entries).alias("s")).select("s.*")
