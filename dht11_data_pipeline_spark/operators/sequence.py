"""Sequence analytics over event logs: per-entity journey encoding and
pattern counting (the MATCH_RECOGNIZE / complex-event-processing
shape), plus integer-exact linear trend fits per key.

Journey encoding: each entity's events, ordered by (ts, tiebreak id),
become one character string (one char per event type). Pattern counts
are then plain non-overlapping literal-substring scans — identical
semantics in every regex engine, so the SQL oracle matches exactly.

Scale: ONE shuffle on the entity key; the per-entity state is the
journey string (bounded by that entity's activity — cap with a
window-limit before collecting for power users). The pattern scan is a
row-local codegen'd pass over strings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def journey_patterns(df: DataFrame, patterns: dict[str, str],
                     user_col: str = "user_id",
                     type_col: str = "event_type", ts_col: str = "ts",
                     order_col: str = "event_id") -> DataFrame:
    """Per-user journey string (event-type initials in time order) with
    a non-overlapping occurrence count per named literal pattern.

    ``patterns`` maps an output column name to a literal initial
    sequence, e.g. {"n_view_click": "vc"} counts immediate view->click
    adjacencies. Literals only — regex alternation/backtracking
    semantics differ across engines; adjacency literals do not."""
    enc = df.select(
        F.col(user_col),
        F.struct(
            F.col(ts_col).cast("timestamp").alias("t"),
            F.col(order_col).alias("o"),
            F.substring(F.col(type_col), 1, 1).alias("c"),
        ).alias("s"),
    )
    j = (
        enc.groupBy(user_col)
        .agg(F.array_sort(F.collect_list("s")).alias("arr"))
        .select(
            F.col(user_col),
            F.array_join(F.transform("arr", lambda s: s["c"]), "")
            .alias("journey"),
        )
    )
    counts = [
        F.size(F.regexp_extract_all("journey", F.lit(pat), F.lit(0)))
        .cast("int").alias(name)
        for name, pat in patterns.items()
    ]
    return j.select(
        user_col,
        F.length("journey").cast("int").alias("journey_len"),
        *counts,
        F.when(F.instr(F.col("journey"), "p") > 0, "Y").otherwise("N")
        .alias("converted"),
        F.instr(F.col("journey"), "p").cast("int").alias("first_purchase_pos"),
    )


def linear_trend(df: DataFrame, key_col: str, x_col: str, y_cents: F.Column,
                 scale: int = 1000000) -> DataFrame:
    """Least-squares slope per key over integer (x, y) points, in exact
    integer arithmetic: slope = (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2),
    emitted as sign * (|num| * scale DIV den) so truncation direction
    is engine-independent (Spark DIV truncates toward zero; SQL floor
    division floors — they agree only on non-negative operands).

    Two-level aggregate: the (key, x) grain reduces first (map-side
    partials), then key-level sums — the same partial-aggregation
    economics as every rollup here. No float enters the slope."""
    pts = (df.groupBy(key_col, x_col)
           .agg(y_cents.alias("y"))
           .select(key_col, F.col(x_col).cast("bigint").alias("x"),
                   F.col("y").cast("bigint").alias("y")))
    agg = pts.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    slope = F.when(den == 0, F.lit(0)).otherwise(
        F.signum(num).cast("bigint")
        * F.expr(f"abs(n * sxy - sx * sy) * {scale} DIV "
                 "(n * sxx - sx * sx)"))
    return agg.select(
        key_col,
        F.col("n").cast("int").alias("n_points"),
        F.col("sy").alias("total_y"),
        slope.cast("bigint").alias("slope_ppm"),
        F.when(num > 0, "up").when(num < 0, "down").otherwise("flat")
        .alias("trend"),
    )


def cusum_changepoint(df: DataFrame, key_col: str, x_col: str,
                      y_col: str) -> DataFrame:
    """Integer-exact CUSUM change-point per key: over points (x, y) in
    x order, S_k = n * prefix_sum(y)_k - k * total(y) — the cumulative
    deviation from the mean, scaled by n so no division ever happens.
    The change point is the x maximizing |S_k| (earliest x on ties);
    its sign says whether the series ran above ('high-then-drop') or
    below ('low-then-rise') its mean up to that point.

    One shuffle on the key; the prefix/total sums are one window pass
    over the (key, x) grain (pre-aggregate to that grain first — the
    windows never see raw fact rows)."""
    from pyspark.sql.window import Window

    w_all = Window.partitionBy(key_col)
    pts = df.select(key_col, F.col(x_col).cast("bigint").alias("x"),
                    F.col(y_col).cast("bigint").alias("y"))
    scored = pts.select(
        key_col, "x",
        (F.count(F.lit(1)).over(w_all) * F.sum("y").over(
            Window.partitionBy(key_col).orderBy("x")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
         - F.row_number().over(Window.partitionBy(key_col).orderBy("x"))
         * F.sum("y").over(w_all)).alias("s"),
        F.count(F.lit(1)).over(w_all).alias("n"),
    )
    pick = Window.partitionBy(key_col).orderBy(F.abs(F.col("s")).desc(), "x")
    return (
        scored.withColumn("rk", F.row_number().over(pick))
        .filter(F.col("rk") == 1)
        .select(
            key_col,
            F.col("n").cast("int").alias("n_points"),
            F.col("x").alias("change_x"),
            F.abs("s").cast("bigint").alias("cusum_abs"),
            F.when(F.col("s") > 0, "high-then-drop")
            .when(F.col("s") < 0, "low-then-rise")
            .otherwise("none").alias("shape"),
        )
    )
