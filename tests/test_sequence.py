"""Unit tests for journey pattern matching and integer trend fits."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from dht11_data_pipeline_spark.operators import sequence


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, event_id long, event_type string, ts timestamp")


def test_journey_encoding_and_patterns(spark):
    t = datetime(2024, 1, 1)
    df = _events(spark, [
        (1, 1, "view", t), (1, 2, "click", t.replace(hour=1)),
        (1, 3, "purchase", t.replace(hour=2)),
        (2, 4, "view", t), (2, 5, "view", t.replace(hour=1)),
        (3, 6, "signup", t), (3, 7, "error", t.replace(hour=1)),
    ])
    out = {r["user_id"]: r for r in sequence.journey_patterns(
        df, {"n_view_click": "vc", "n_click_purchase": "cp",
             "n_signup_error": "se"}).collect()}
    assert out[1]["journey_len"] == 3
    assert out[1]["n_view_click"] == 1 and out[1]["n_click_purchase"] == 1
    assert out[1]["converted"] == "Y" and out[1]["first_purchase_pos"] == 3
    assert out[2]["n_view_click"] == 0 and out[2]["converted"] == "N"
    assert out[2]["first_purchase_pos"] == 0
    assert out[3]["n_signup_error"] == 1


def test_journey_ordering_uses_ts_then_id(spark):
    t = datetime(2024, 1, 1)
    # same timestamp: event_id breaks the tie deterministically
    df = _events(spark, [(1, 2, "click", t), (1, 1, "view", t)])
    row = sequence.journey_patterns(df, {"n_vc": "vc"}).collect()[0]
    assert row["n_vc"] == 1  # view (id 1) sorts before click (id 2)


def test_linear_trend_exact_slopes(spark):
    # key "up": y = 100x -> slope 100 * 1e6 ppm; "down": y = -50x;
    # "flat": constant; "single": one point -> degenerate den=0
    rows = []
    for x in range(1, 6):
        rows.append(("up", x, 100 * x))
        rows.append(("down", x, 1000 - 50 * x))
        rows.append(("flat", x, 7))
    rows.append(("single", 3, 42))
    df = spark.createDataFrame(rows, "k string, x int, y long")
    out = {r["k"]: r for r in sequence.linear_trend(
        df, "k", "x", F.sum("y")).collect()}
    assert out["up"]["slope_ppm"] == 100 * 1000000
    assert out["up"]["trend"] == "up"
    assert out["down"]["slope_ppm"] == -50 * 1000000
    assert out["down"]["trend"] == "down"
    assert out["flat"]["slope_ppm"] == 0 and out["flat"]["trend"] == "flat"
    assert out["single"]["slope_ppm"] == 0


def test_linear_trend_truncation_sign_symmetry(spark):
    """slope(-data) == -slope(data) exactly — the sign-factored
    division truncates identically for rising and falling series."""
    rows = [("a", x, 7 * x + 3) for x in range(1, 8)]
    rows += [("b", x, -(7 * x + 3)) for x in range(1, 8)]
    df = spark.createDataFrame(rows, "k string, x int, y long")
    out = {r["k"]: r["slope_ppm"] for r in sequence.linear_trend(
        df, "k", "x", F.sum("y")).collect()}
    assert out["a"] == -out["b"]


def test_cusum_changepoint_step_series(spark):
    """A step series (low then high) peaks |CUSUM| at the step; sign
    says it ran below its mean first."""
    rows = [("step", x, 10 if x <= 5 else 110) for x in range(1, 11)]
    rows += [("const", x, 50) for x in range(1, 11)]
    df = spark.createDataFrame(rows, "k string, x int, y long")
    out = {r["k"]: r for r in sequence.cusum_changepoint(
        df, "k", "x", "y").collect()}
    assert out["step"]["change_x"] == 5
    assert out["step"]["shape"] == "low-then-rise"
    assert out["const"]["cusum_abs"] == 0 and out["const"]["shape"] == "none"
