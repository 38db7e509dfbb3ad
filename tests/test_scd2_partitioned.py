"""Partition-selective SCD2: results identical to the full apply, and
untouched bucket partitions are physically NOT rewritten."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from dht11_data_pipeline_spark.operators.scd2 import SCD2Config, apply_scd2
from dht11_data_pipeline_spark.operators.scd2_partitioned import (
    BUCKET_COL, apply_scd2_partitioned, init_partitioned_target,
    read_partitioned_target,
)
from tests.test_scd2 import B1, B2, CFG, _df, _empty_target


def _mtimes(path: str) -> dict[str, float]:
    out = {}
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                p = os.path.join(root, f)
                out[p] = os.path.getmtime(p)
    return out


def test_partitioned_apply_matches_full(spark, tmp_path):
    target_path = str(tmp_path / "hist_part")
    t1 = apply_scd2(_df(spark, B1), _empty_target(spark), CFG,
                    load_ts="2024-05-05 12:00:00", deterministic_keys=True)
    init_partitioned_target(t1, target_path, CFG, n_buckets=16)

    # incremental batch: one U + one I
    batch = _df(spark, [B2[1], B2[3]])
    touched = apply_scd2_partitioned(
        spark, batch, target_path, CFG, n_buckets=16,
        load_ts="2024-05-06 12:00:00", deterministic_keys=True)
    assert 0 < len(touched) <= 2

    got = read_partitioned_target(spark, target_path)
    want = apply_scd2(batch, t1, CFG, load_ts="2024-05-06 12:00:00",
                      deterministic_keys=True, incremental=True)
    # bit-identical including surrogate keys: the partitioned apply uses
    # GLOBAL high-water marks, so deterministic minting agrees exactly
    cols = want.columns
    assert ({tuple(r) for r in got.select(*cols).collect()}
            == {tuple(r) for r in want.select(*cols).collect()})


def test_untouched_partitions_not_rewritten(spark, tmp_path):
    target_path = str(tmp_path / "hist_part2")
    t1 = apply_scd2(_df(spark, B1), _empty_target(spark), CFG,
                    load_ts="2024-05-05 12:00:00", deterministic_keys=True)
    init_partitioned_target(t1, target_path, CFG, n_buckets=16)
    before = _mtimes(target_path)

    batch = _df(spark, [B2[3]])  # single new key -> exactly one bucket
    touched = apply_scd2_partitioned(
        spark, batch, target_path, CFG, n_buckets=16,
        load_ts="2024-05-06 12:00:00", deterministic_keys=True)
    assert len(touched) == 1

    after = _mtimes(target_path)
    touched_dir = f"{BUCKET_COL}={touched[0]}"
    for path, mtime in before.items():
        if touched_dir not in path:
            assert path in after and after[path] == mtime, \
                f"untouched partition file rewritten: {path}"
    # total rows grew by exactly the insert
    assert read_partitioned_target(spark, target_path).count() == 5
